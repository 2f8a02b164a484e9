"""Unit tests (no Spark): regex matchers on adversarial strings (§5.2)."""

from pie_spark.extract.matchers import find_matches


def _types(text):
    return [(m["mention_type"], m["surface"]) for m in find_matches(text)]


def test_email_basic():
    assert _types("mail a.b@example0.com now") == [("EMAIL", "a.b@example0.com")]


def test_email_in_url_rejected():
    assert _types("see http://x.io/u/a.b@fake.io page") == []
    assert _types("scheme:a.b@fake.io") == []
    assert _types("mailto@chain@fake.io") == []  # preceded by '@'


def test_email_offsets():
    m = find_matches("x a.b@example1.com y")[0]
    assert (m["start"], m["end"]) == (2, 18)


def test_ssn_validity():
    assert _types("ssn 523-45-6789 ok") == [("SSN", "523-45-6789")]
    assert _types("bad 000-45-6789") == []
    assert _types("bad 666-45-6789") == []
    assert _types("bad 900-45-6789 and 987-65-4321") == []
    assert _types("bad 123-00-6789") == []
    assert _types("bad 123-45-0000") == []


def test_nine_digit_id_not_ssn():
    assert _types("id 523456789") == []


def test_phone():
    assert _types("call (212) 555-0134") == [("PHONE", "(212) 555-0134")]
    assert _types("not (112) 555-0134") == []  # NANP: area can't start 0/1


def test_address():
    assert _types("at 123 Maple St corner") == [("ADDRESS", "123 Maple St")]
    assert _types("at 123456 Maple St") == []  # >5-digit number
    assert _types("at 123 maple St") == []     # lowercase street name


def test_address_real_world_shapes():
    """r01's regex accepted ONLY `\\d{1,5} [A-Z][a-z]+ (St|Ave|Rd|Blvd)`
    — these are the shapes a user's first real document contains."""
    # spelled-out suffixes
    assert _types("at 44 Birch Street corner") == [("ADDRESS", "44 Birch Street")]
    assert _types("at 7 Aspen Boulevard end") == [("ADDRESS", "7 Aspen Boulevard")]
    # multi-word street names
    assert _types("at 1600 Santa Rosa Ave x") == [("ADDRESS", "1600 Santa Rosa Ave")]
    assert _types("at 12 King George Road x") == [("ADDRESS", "12 King George Road")]
    # units
    assert _types("at 99 Oak Ave Apt 4B x") == [("ADDRESS", "99 Oak Ave Apt 4B")]
    assert _types("at 12 Elm Street, Suite 200 x") == [
        ("ADDRESS", "12 Elm Street, Suite 200")
    ]
    # suffix must not be clipped ('Street' ≠ 'St' + 'reet')
    assert _types("at 5 Cedar Streets x") == []
    # still negative: no suffix, lowercase words
    assert _types("at 5 random words here") == []


def test_ssn_valid_regex_equals_predicate():
    """SSN_VALID_RE (the lookahead-free mirror used by the DuckDB
    redaction oracle) must accept exactly what _ssn_valid accepts."""
    import re

    from pie_spark.extract.matchers import SSN_VALID_RE, _ssn_valid

    rx = re.compile(f"^{SSN_VALID_RE[2:-2]}$")  # strip the \b anchors
    areas = [0, 1, 9, 99, 100, 599, 600, 665, 666, 667, 699, 700, 899, 900, 987, 999]
    groups = [0, 1, 9, 10, 99]
    serials = [0, 1, 9, 10, 999, 1000, 9999]
    for a in areas:
        for g in groups:
            for s in serials:
                ssn = f"{a:03d}-{g:02d}-{s:04d}"
                assert bool(rx.match(ssn)) == _ssn_valid(ssn), ssn


def test_multiple_types_one_pass():
    got = _types("a.b@example2.com then 523-45-6789 then 99 Oak Ave")
    assert got == [
        ("EMAIL", "a.b@example2.com"),
        ("SSN", "523-45-6789"),
        ("ADDRESS", "99 Oak Ave"),
    ]

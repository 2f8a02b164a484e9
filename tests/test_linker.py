"""J1/J2 linking + A3 canonical election + J6 salted join (§5.2)."""

from pyspark.sql import functions as F

from pie_spark.canon.canonical import canonical_surfaces, key_canonical_map
from pie_spark.canon.cc import connected_components
from pie_spark.canon.edges import build_edges
from pie_spark.canon.salting import salted_join
from pie_spark.fixtures import gazetteer as gz
from pie_spark.fixtures.gen import entity_dict_df
from pie_spark.link.linker import link_mentions
from pie_spark.schemas import MENTION_SCHEMA


def _mentions(spark, surfaces):
    rows = [
        ("d1", i, 0, 0, len(s), "PERSON", s, "gazetteer", 0.9)
        for i, s in enumerate(surfaces)
    ]
    return spark.createDataFrame(rows, schema=MENTION_SCHEMA).withColumn(
        "mention_id", F.xxhash64("doc_id", "span_idx", "start", "end", "mention_type")
    )


def test_exact_surface_links_to_itself(spark):
    d = entity_dict_df(spark)
    out = link_mentions(_mentions(spark, ["Mei Bergstrom"]), d).collect()
    # unique surface (entity 52: Mei + Bergstrom block) → single candidate
    assert len(out) == 1
    assert out[0].entity_id.startswith("ent:person:")


def test_ambiguous_surface_resolved_by_prior_then_id(spark):
    d = entity_dict_df(spark)
    shared = gz.hot_surfaces()[0]  # "Alice Abernathy" — shared by ent 0 and 490
    out = link_mentions(_mentions(spark, [shared]), d).collect()
    assert len(out) == 1
    e0 = [e for e in gz.dictionary_entries() if e.surface == shared]
    want = min(e0, key=lambda e: (-e.prior, e.entity_id)).entity_id
    assert out[0].entity_id == want


def test_unlinkable_person_dropped(spark):
    d = entity_dict_df(spark)
    assert link_mentions(_mentions(spark, ["Zxqw Vbnm"]), d).count() == 0


def test_canonical_map_matches_golden(spark):
    d = entity_dict_df(spark)
    labels = connected_components(build_edges(d))
    key_map = {r["norm_key"]: r["canon_entity_id"] for r in key_canonical_map(labels).collect()}
    assert key_map == gz.golden_canonical_map()


def test_canonical_surface_election(spark):
    d = entity_dict_df(spark)
    labels = connected_components(build_edges(d))
    key_map = key_canonical_map(labels)
    freqs = spark.createDataFrame(
        [("alice abernathy", 10, 3), ("a abernathy", 99, 5)],
        ["norm_key", "freq", "n_docs"],
    )
    cs = canonical_surfaces(key_map, freqs)
    row = cs.filter(F.col("canon_entity_id") == "ent:person:0000").collect()[0]
    assert row.canon_norm_key == "a abernathy"  # most frequent wins


def test_salted_join_equals_plain_join(spark):
    fact = spark.createDataFrame(
        [(f"m{i}", "hotkey" if i % 2 == 0 else f"k{i}") for i in range(100)],
        ["mention_id", "k"],
    )
    dim = spark.createDataFrame(
        [("hotkey", "E0")] + [(f"k{i}", f"E{i}") for i in range(100)], ["k", "ent"]
    )
    plain = fact.join(dim, "k").select("mention_id", "ent")
    salted = salted_join(
        fact, dim, key="k", spread_col="mention_id", hot=["hotkey"], salt_k=5
    ).select("mention_id", "ent")
    assert sorted(plain.collect()) == sorted(salted.collect())

"""The committed spark-submit artifact must never go stale: every
pie_spark/**/*.py in dist/pie_spark.zip is byte-identical to the
working tree, with no missing or extra modules (ADVICE r01 high — the
r01 zip shipped 11 stale files including a known-buggy canon/cc.py)."""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tools"))

from build_zip import OUT, source_files  # noqa: E402


def test_zip_matches_working_tree():
    assert os.path.exists(OUT), "dist/pie_spark.zip missing — run tools/build_zip.py"
    tree = source_files()
    with zipfile.ZipFile(OUT) as z:
        names = sorted(n for n in z.namelist() if n.endswith(".py"))
        assert names == [t.replace(os.sep, "/") for t in tree], (
            "zip module set differs from working tree — rebuild with "
            "python tools/build_zip.py"
        )
        for rel in tree:
            with open(os.path.join(ROOT, rel), "rb") as fh:
                assert z.read(rel.replace(os.sep, "/")) == fh.read(), (
                    f"stale zip entry {rel} — rebuild with python tools/build_zip.py"
                )

#!/usr/bin/env python
"""Deterministic dist/pie_spark.zip builder for the spark-submit path.

    python tools/build_zip.py

Packs every tracked pie_spark/**/*.py with a fixed timestamp and sorted
entry order, so identical sources always produce a byte-identical zip.
tests/test_dist_zip.py asserts the committed artifact matches the
working tree — the r01 zip had silently gone 11 files stale (ADVICE
r01 high), shipping an already-fixed CC bug to anyone using the
documented `--py-files dist/pie_spark.zip` launch mode.
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "dist", "pie_spark.zip")
FIXED_DATE = (2020, 1, 1, 0, 0, 0)  # determinism: content defines the bytes


def source_files() -> list[str]:
    """pie_spark/**/*.py from git's view of the tree: tracked files plus
    untracked-but-not-gitignored ones (brand-new modules are packed even
    before `git add`; only GITIGNORED scratch is excluded). Entries
    deleted from the worktree but still in the index are skipped —
    `--cached` lists them, and opening one would crash the build.
    Filesystem walk as the fallback when git is unavailable."""
    import subprocess

    try:
        out = subprocess.run(
            ["git", "ls-files", "--cached", "--others", "--exclude-standard",
             "pie_spark/*.py", "pie_spark/**/*.py"],
            cwd=ROOT, capture_output=True, text=True, check=True,
        ).stdout.split()
        out = [p for p in out if os.path.exists(os.path.join(ROOT, p))]
        if out:
            return sorted(set(out))
    except (OSError, subprocess.CalledProcessError):
        pass
    files = []
    for dirpath, dirnames, filenames in os.walk(os.path.join(ROOT, "pie_spark")):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for f in sorted(filenames):
            if f.endswith(".py"):
                files.append(os.path.relpath(os.path.join(dirpath, f), ROOT))
    return sorted(files)


def build(out: str = OUT) -> list[str]:
    files = source_files()
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for rel in files:
            with open(os.path.join(ROOT, rel), "rb") as fh:
                data = fh.read()
            info = zipfile.ZipInfo(rel.replace(os.sep, "/"), date_time=FIXED_DATE)
            info.external_attr = 0o644 << 16
            z.writestr(info, data)
    return files


if __name__ == "__main__":
    files = build()
    print(f"wrote {OUT} ({len(files)} files)")

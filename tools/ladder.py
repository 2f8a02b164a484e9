#!/usr/bin/env python
"""Scale-ladder driver (VERDICT r04 next#7): measure the pipeline at
several corpus multipliers with ONE FRESH JVM PER RUN.

Why a subprocess per run: the r04 5M-doc ladder measured 112.6 s on the
first warm run and 147.9/149.3 s on the next two runs in the SAME JVM
with clean steal readings — heap pressure accumulated by back-to-back
persist/unpersist cycles, a measurement artifact. Forking a fresh
`python bench.py --ladder-point <corpus>` per run makes every ladder
point pay identical JVM state, so the variance band matches the 1M
protocol's.

Usage:
    python tools/ladder.py            # mults 20,200,1000 × 3 runs each
    PIE_LADDER_MULTS=200,1000 PIE_LADDER_RUNS=3 python tools/ladder.py

Prints one JSON line with per-mult runs (wall/steal/triples) and the
median.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _materialize(sf_dir: str, mult: int, out_dir: str) -> int:
    sys.path.insert(0, REPO)
    from bench import _materialize_corpus, _mk_session

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = _mk_session(cores, f"pie-ladder-gen-{mult}")
    n = _materialize_corpus(spark, sf_dir, out_dir, mult=mult)
    spark.stop()
    return n


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    mults = [int(m) for m in os.environ.get("PIE_LADDER_MULTS", "20,200,1000").split(",")]
    n_runs = int(os.environ.get("PIE_LADDER_RUNS", "3"))

    out: dict = {"sf_dir": sf_dir, "runs_per_mult": n_runs, "points": []}
    tmp = tempfile.mkdtemp(prefix="pie_ladder_")
    try:
        for mult in mults:
            docs_path = os.path.join(tmp, f"docs_{mult}.parquet")
            n_docs = _materialize(sf_dir, mult, docs_path)
            runs = []
            for _ in range(n_runs):
                # fresh process → fresh JVM per measured run
                res = subprocess.run(
                    [sys.executable, os.path.join(REPO, "bench.py"),
                     "--ladder-point", docs_path],
                    capture_output=True, text=True, cwd=REPO,
                )
                if res.returncode != 0 or not res.stdout.strip():
                    raise RuntimeError(
                        f"ladder-point child failed (rc={res.returncode}); "
                        f"stderr tail: {res.stderr[-2000:]}"
                    )
                line = res.stdout.strip().splitlines()[-1]
                runs.append(json.loads(line))
            walls = sorted(r["wall_sec"] for r in runs)
            med = walls[len(walls) // 2]
            out["points"].append({
                "mult": mult,
                "docs": n_docs,
                "runs": runs,
                "median_wall_sec": med,
                "docs_per_sec": round(n_docs / med, 1),
                "triples": runs[0]["triples"],
                "triples_identical": len({r["triples"] for r in runs}) == 1,
            })
            shutil.rmtree(docs_path, ignore_errors=True)
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()

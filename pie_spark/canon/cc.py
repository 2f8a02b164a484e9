"""G1: distributed connected components (SURVEY.md §2.8; BASELINE.json:6
"canonicalizes surface forms via salted-key connected-components
clustering").

No GraphFrames in the sandbox, so CC is pure DataFrame ops:
**min-label propagation** — every node repeatedly takes the minimum
label over itself and its neighbors until a fixed point.

Scale design (10^12-doc design point, BASELINE.json:14):
  * each iteration is one join (labels ⋈ edges) + one `groupBy(node).
    agg(min(label))`. `min` is algebraic, so Spark's partial (map-side)
    aggregation collapses hot-node message floods *before* the shuffle
    — the classic CC skew pain point — and AQE skew-join splitting
    (enabled in the session factory) covers the join side. For
    adversarially hot nodes the caller can pre-salt via
    pie_spark.canon.salting.salt_edges (splits a hot node into K
    star-connected siblings, provably component-preserving).
  * `localCheckpoint(eager=True)` per iteration truncates the plan
    lineage — without it the logical plan doubles each round (§7.3).
  * convergence = count of changed labels, a cheap driver-side long;
    iterations bounded by graph diameter (alias graphs: ≤ a few hops)
    with a hard cap as a backstop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, max_iters: int = 20) -> DataFrame:
    """edges(src, dst) → labels(node, component) with component = min
    node id (string order) in the component. Deterministic.

    Per-iteration cost: ONE join (labels→neighbors) + ONE partial-agg
    groupBy. The previous label rides along inside the same aggregation
    (``max(old)`` — each node contributes exactly one self row), so the
    convergence check is a cheap count over the already-checkpointed
    result instead of an extra shuffle join.
    """
    und = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    und = und.localCheckpoint(eager=True)

    labels = (
        und.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iters):
        msgs = und.join(labels, und.src == labels.node).select(
            F.col("dst").alias("node"), "label", F.lit(None).cast("string").alias("old")
        )
        self_rows = labels.select("node", "label", F.col("label").alias("old"))
        new = (
            self_rows.union(msgs)
            .groupBy("node")
            .agg(F.min("label").alias("label"), F.max("old").alias("old"))
            .localCheckpoint(eager=True)
        )
        changed = new.filter(F.col("label") != F.col("old")).count()
        labels = new.select("node", "label")
        if changed == 0:
            break
    return labels.withColumnRenamed("label", "component")

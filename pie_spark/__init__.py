"""pie_spark — a PySpark-native privacy knowledge-graph construction engine.

Brand-new implementation of the capabilities of rayliutoronto/PIE
(reference checkout empty at build time — SURVEY.md §0; the binding
functional spec is /root/repo/BASELINE.json: north_star line 6,
north_rule line 14, input_hint line 15).

Pipeline: interleaved text+media documents → vectorized mention
detection (regex / gazetteer / CRF-style sequence tagging) → entity
linking against a broadcast dictionary → salted-key connected-components
canonicalization → (subj, pred, obj) triple materialization into
doc_id-bucketed tables, with snapshot checkpoints + per-partition
lineage.

Everything is expressed Spark-first: DataFrame API + Arrow-batched
pandas UDFs; no RDDs, no per-row Python UDFs.
"""

__version__ = "0.1.0"

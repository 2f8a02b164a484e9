"""Pipeline configuration (SURVEY.md §7.4).

Every knob that matters at 10^12-document scale is explicit here so a
cluster run can size shuffles / buckets / Arrow batches without code
edits (BASELINE.json:14 — partitioning / shuffle / skew handled
explicitly).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class PipelineConfig:
    # --- input / output -------------------------------------------------
    input_path: str = "/root/testdata/sf0.001"
    output_path: str = ""  # empty → pipeline returns DataFrames, no write
    # --- partitioning (north_rule: bucketed partitioning on doc_id) ------
    buckets: int = 64          # doc_id hash buckets for the triple sink
    shuffle_partitions: int = 32
    # --- skew (north_rule: key salting on hot entities) -------------------
    hot_k: int = 100           # top-k hot norm_keys computed by A4
    salt_k: int = 8            # salt fan-out for hot keys (J6)
    # --- Arrow / UDF batching (input_hint: vectorized pandas/Arrow UDFs) --
    arrow_batch: int = 4096
    # --- feature flags -----------------------------------------------------
    enable_crf: bool = True    # BiLSTM-CRF-style tagger (SURVEY.md §2.4)
    enable_phone: bool = True  # PHONE matcher (inferred PII type, §2.3)
    fuse_detectors: bool = True  # regex+gazetteer+CRF in ONE Arrow pass
    # --- mention types emitted as HAS_* triples ---------------------------
    pii_types: tuple[str, ...] = ("EMAIL", "SSN", "PHONE", "ADDRESS")
    # the gazetteer is broadcast-small by spec (BASELINE.json:6); this
    # cap guards the driver-side surface collect against a dictionary
    # that is NOT — past it the pipeline degrades to the shuffle-join
    # gazetteer + non-broadcast salted linking (extract_stage /
    # gazetteer_join.py) instead of OOMing the driver mid-broadcast.
    dict_max_surfaces: int = 5_000_000
    # which dictionary-scale matcher the fallback uses (VERDICT r05
    # next#1): "shard" = dictionary-shard trie probes (gazetteer_shard
    # .py — exact automaton parity, fastest measured wall, text
    # shuffles ~1.3× on the bench corpus), "join" = candidate-core
    # equi-join (gazetteer_join.py — minimal shuffle, zero text
    # replication, token-aligned coverage contract; for network-bound
    # deployments)
    fallback_matcher: str = "shard"
    # dictionary-shard replication of the shard matcher: bounds cogroup
    # group memory and spreads hot key chars; any value is
    # hit-identical. Raise with corpus size (group ≈ docs_with_char /
    # shard_salt_parts).
    shard_salt_parts: int = 8
    # known-hot gazetteer surfaces for the join-fallback path (e.g. from
    # a prior run's A4 top-k or the streaming hot-key counters); salted
    # salt_k ways in the candidate⋈dictionary join. Empty → plain join
    # with AQE skew-join as the backstop.
    hot_surfaces: tuple[str, ...] = ()
    # pre-computed hot norm_keys for J6/CC salting (VERDICT r05 next#7:
    # the streaming counters' hot_keys_from_counts output, via the CLI's
    # --hot-keys-from). Non-empty → downstream_stage SKIPS the batch A4
    # scan over the mention set and salts on this list instead — a
    # standing landing zone learns its hot entities incrementally across
    # drains. Salting is result-preserving for ANY hot list (the
    # salted-join/CC contracts), so triples are identical either way.
    hot_norm_keys: tuple[str, ...] = ()
    # --- CC loop -----------------------------------------------------------
    cc_max_iters: int = 20
    # dictionary graphs at/below this edge count run exact union-find on
    # the driver (the CC analogue of a broadcast join — the dictionary is
    # broadcast-small by spec); larger graphs use the salted distributed
    # loop. 0 disables the fast path.
    cc_driver_max_edges: int = 5_000_000
    # --- resume ------------------------------------------------------------
    checkpoint_dir: str = ""   # "" → no checkpointing
    resume: bool = False       # resume from checkpoint_dir if it has a snapshot


DEFAULT = PipelineConfig()

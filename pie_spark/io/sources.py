"""S1/S3: document + dictionary sources over multiple formats
(SURVEY.md §2.1).

The binding input (BASELINE.json:15) is a table of
(doc_id, spans:array<struct<kind,text,media_ref,offset>>) — stored as
Parquet/Iceberg at rest, but ingest pipelines routinely land it as
JSONL first. Readers here always apply the EXPLICIT binding schema
(never infer — the span invariant and oracle schema checks depend on
exact types) and prune to it, so Catalyst pushes the projection into
the scan regardless of format.

The dictionary (S3) is flat, so CSV is also supported there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pie_spark.schemas import DICT_SCHEMA, DOC_SCHEMA

_DOC_FORMATS = ("parquet", "json")
_DICT_FORMATS = ("parquet", "json", "csv")


def read_documents(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Interleaved-document table with the binding DOC_SCHEMA enforced.
    ``json`` means JSONL with spans as an array of objects."""
    if fmt not in _DOC_FORMATS:
        raise ValueError(
            f"unsupported document format {fmt!r} (one of {_DOC_FORMATS}; "
            "CSV cannot represent the nested spans array)"
        )
    return spark.read.format(fmt).schema(DOC_SCHEMA).load(path).select(
        *[f.name for f in DOC_SCHEMA.fields]
    )


def read_dictionary(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Entity dictionary (surface, norm_key, entity_id, entity_type,
    prior) with DICT_SCHEMA enforced. CSV expects a header row."""
    if fmt not in _DICT_FORMATS:
        raise ValueError(f"unsupported dictionary format {fmt!r} (one of {_DICT_FORMATS})")
    reader = spark.read.format(fmt).schema(DICT_SCHEMA)
    if fmt == "csv":
        reader = reader.option("header", "true")
    return reader.load(path).select(*[f.name for f in DICT_SCHEMA.fields])

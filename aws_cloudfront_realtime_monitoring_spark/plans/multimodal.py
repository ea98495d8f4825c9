"""Multimodal-column queries: binary payload + pandas-batch decode plumbing
(operators.multimodal), verified end-to-end against an arithmetic oracle.

The decode itself is a documented deterministic stub (no media libs in this
environment); what these queries pin down is the Spark-side contract --
binary column, Arrow batch shape, mapInPandas schema, downstream
aggregability of the decoded metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import attach_payload, decode_batches, frame_sample_offsets
from ..sources.tables import load_table
from . import register


@register(
    "multimodal_decode_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           (octet_length(encode(text)) * 7919) % 624 + 16 AS width,
           (octet_length(encode(text)) * 104729) % 464 + 16 AS height,
           octet_length(encode(text)) % 24 + 1 AS n_frames,
           CASE doc_id % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png'
                           ELSE 'webp' END AS fmt
    FROM documents
    """,
    description="Binary payload -> mapInPandas (Arrow-batched) decode stub "
                "-> typed metadata. Verifies the multimodal plumbing: "
                "binary column round-trip through pandas batches with a "
                "declared output schema.",
    tags=("multimodal", "pandas-udf"),
)
def multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return decode_batches(attach_payload(docs))


@register(
    "multimodal_frame_offsets",
    oracle="""
    WITH meta AS (SELECT doc_id, octet_length(encode(text)) AS n_bytes
                  FROM documents)
    SELECT doc_id, n_bytes,
           least(0 * greatest(n_bytes // 4, 1), n_bytes - 1)
             || ';' || least(1 * greatest(n_bytes // 4, 1), n_bytes - 1)
             || ';' || least(2 * greatest(n_bytes // 4, 1), n_bytes - 1)
             || ';' || least(3 * greatest(n_bytes // 4, 1), n_bytes - 1)
           AS offsets_str
    FROM meta
    """,
    description="Deterministic frame-sample plan (evenly spaced byte "
                "offsets per payload), computed as pure Catalyst arithmetic "
                "-- no payload bytes touched.",
    tags=("multimodal",),
)
def multimodal_frame_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    decoded = decode_batches(attach_payload(docs))
    return frame_sample_offsets(decoded).select(
        "doc_id",
        "n_bytes",
        F.array_join(F.col("frame_offsets"), ";").alias("offsets_str"),
    )

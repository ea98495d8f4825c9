"""Multimodal-column queries: binary payload + pandas-batch decode plumbing
(operators.multimodal), verified end-to-end against an arithmetic oracle.

The decoder is REAL for BMP, non-interlaced 8-bit PNG, baseline +
progressive JPEG, GIF (incl. animation) and lossless WebP/VP8L (pure
numpy + stdlib zlib, each golden-bytes-tested against independent
spec-written encoders in tests/test_{multimodal,jpeg,gif,webp}.py) and
PIL-backed when the environment has Pillow; this registry query feeds
utf-8 TEXT payloads, which take the documented deterministic fake path
(fmt values 'fake-*' so fabricated rows can never be confused with real
decodes) -- so the oracle below replicates the fake's arithmetic, and
what the row pins down is the Spark-side contract: binary column, Arrow
batch shape, mapInPandas schema, downstream aggregability of the decoded
metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import (
    attach_payload,
    decode_batches,
    frame_offset_expr,
)
from ..sources.tables import load_table
from . import register


@register(
    "multimodal_pipeline",
    oracle="""
    WITH meta AS (
      SELECT doc_id,
             octet_length(encode(text)) AS n_bytes,
             (octet_length(encode(text)) * 7919) % 624 + 16 AS width,
             (octet_length(encode(text)) * 104729) % 464 + 16 AS height,
             octet_length(encode(text)) % 24 + 1 AS n_frames,
             CASE doc_id % 3 WHEN 0 THEN 'fake-jpeg' WHEN 1 THEN 'fake-png'
                             ELSE 'fake-webp' END AS fmt
      FROM documents)
    SELECT doc_id, n_bytes, width, height, n_frames, fmt,
           greatest(least(0 * greatest(n_bytes // 4, 1), n_bytes - 1), 0)
             || ';' || greatest(least(1 * greatest(n_bytes // 4, 1), n_bytes - 1), 0)
             || ';' || greatest(least(2 * greatest(n_bytes // 4, 1), n_bytes - 1), 0)
             || ';' || greatest(least(3 * greatest(n_bytes // 4, 1), n_bytes - 1), 0)
           AS offsets_str
    FROM meta
    """,
    description="Full multimodal plumbing in one pass: binary payload -> "
                "mapInPandas (Arrow-batched) decode (real for BMP, "
                "deterministic fake for these text payloads) -> typed "
                "metadata "
                "-> deterministic frame-sample plan (evenly spaced byte "
                "offsets, pure Catalyst arithmetic over the decoded "
                "metadata -- payload bytes never leave the decode batch). "
                "Verifies the binary-column round-trip through pandas "
                "batches with a declared schema AND the downstream "
                "aggregability of the decoded columns.",
    tags=("multimodal", "pandas-udf"),
)
def multimodal_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    decoded = decode_batches(attach_payload(docs))
    # the ONE offsets spelling (operators.multimodal.frame_offset_expr)
    return decoded.select(
        "doc_id", "n_bytes", "width", "height", "n_frames", "fmt",
        F.array_join(frame_offset_expr(4), ";").alias("offsets_str"),
    )

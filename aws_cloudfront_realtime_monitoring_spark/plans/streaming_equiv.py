"""Streaming-vs-batch equivalence queries, driver-checkable.

The reference's hot path is a stream (Kinesis -> Lambda -> Timestream,
SURVEY.md EP1); its analytical results must agree with what a batch engine
computes over the same records. These queries make that contract
oracle-checkable: each runs a REAL Structured Streaming query (file-stream
source over the fixture tables, memory sink, ``processAllAvailable``) to
completion inside the builder, then returns the final result as a batch
DataFrame. The DuckDB oracle is the equivalent batch SQL -- so the driver's
hash compare proves the streaming pipeline (windowed aggregation / stateful
dedup, watermarks, sink semantics) computes exactly the batch answer on
bounded input.

The final ``collect`` here is the equivalence HARNESS materializing a
|groups|-sized result for comparison, not an operator: the streaming
pipelines themselves are fully distributed (source partitions -> stateful
shuffle on the group/dedup key -> sink).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import stream_dir
from . import register
from .core import dsum, dsum_sql

#: shared DuckDB fragment: epoch-aligned 1h bucket as naive TIMESTAMP
_BIN_1H = "make_timestamp(((CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600) * 1000000)"


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-stream replay of the events table: schema from the batch
    reader, data from the multi-file layout dir (a streaming source lists a
    directory, exactly like a production landing zone)."""
    path = stream_dir(spark, sf_dir, "events")
    schema = spark.read.parquet(path).schema
    return spark.readStream.schema(schema).parquet(path)


def _run_to_completion(df: DataFrame, output_mode: str) -> tuple[DataFrame, object]:
    """Drain a bounded stream into a uniquely-named memory table."""
    name = f"equiv_{uuid.uuid4().hex[:12]}"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .start()
    )
    q.processAllAvailable()
    return df.sparkSession.table(name), q


def _freeze(spark: SparkSession, result: DataFrame, q) -> DataFrame:
    """Materialize the (small) final result and stop the stream so the
    returned DataFrame is a stable batch relation."""
    rows = result.collect()
    q.stop()
    return spark.createDataFrame(rows, result.schema)


@register(
    "stream_hourly_bytes_equiv",
    oracle=f"""
    SELECT {_BIN_1H} AS window_start,
           event_type,
           COUNT(*) AS n,
           {dsum_sql('value', 2)} AS sum_value
    FROM events GROUP BY 1, 2
    """,
    description="Streaming==batch equivalence for the flagship windowed "
                "aggregation (A1/A16-A18 + B1/B6): a real Structured "
                "Streaming query (file-stream source, tumbling 1 h "
                "window(ts) per event_type, complete mode, memory sink) "
                "runs to completion and must hash-match the batch SQL "
                "aggregate over the same rows.",
    tags=("streaming", "window"),
)
def stream_hourly_bytes_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = _events_stream(spark, sf_dir)
    agg = (
        stream.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum(F.col("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "sum_value"
        )
    )
    result, q = _run_to_completion(agg, "complete")
    return _freeze(spark, result, q)


@register(
    "stream_sliding_equiv",
    oracle=f"""
    WITH expanded AS (
      SELECT event_type, value,
             make_timestamp(((CAST(floor(epoch(ts)) AS BIGINT) // 900
                              - unnest(generate_series(0, 3))) * 900) * 1000000)
               AS window_start
      FROM events)
    SELECT window_start, event_type, COUNT(*) AS n,
           {dsum_sql('value', 2)} AS sum_value
    FROM expanded GROUP BY window_start, event_type
    """,
    description="Streaming==batch equivalence for SLIDING windows (1 h "
                "length, 15 min slide): a real Structured Streaming query "
                "expands every event into its 4 overlapping windows and "
                "aggregates them statefully (complete mode, memory sink); "
                "the final table must hash-match the batch expansion the "
                "sliding_window_counts oracle computes with an explicit "
                "series unnest. Closes the one streaming shape (overlapping "
                "window state) the tumbling/dedup equivalence rows don't "
                "cover; promoted from tests/test_streaming.py's "
                "stream-equals-batch assertion.",
    tags=("streaming", "window", "sliding"),
)
def stream_sliding_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = _events_stream(spark, sf_dir)
    agg = (
        stream.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n"), dsum(F.col("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "sum_value"
        )
    )
    result, q = _run_to_completion(agg, "complete")
    return _freeze(spark, result, q)


@register(
    "stream_dedup_equiv",
    oracle=f"""
    SELECT event_type, COUNT(*) AS n, {dsum_sql('value', 2)} AS sum_value
    FROM events GROUP BY event_type
    """,
    description="Streaming==batch equivalence for stateful dedup (the "
                "north-star dedup_stream operator): the event stream is "
                "self-unioned (every record delivered twice -- the "
                "at-least-once replay the reference tolerates, "
                "lambda_function.py:58-60), dropDuplicatesWithinWatermark "
                "on event_id removes the duplicates with watermark-bounded "
                "state, and the surviving rows must aggregate to exactly "
                "the batch answer over the original table.",
    tags=("streaming", "dedup"),
)
def stream_dedup_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = _events_stream(spark, sf_dir)
    watermarked = stream.withWatermark("ts", "24 hours")
    duplicated = watermarked.union(watermarked)  # at-least-once delivery
    deduped = duplicated.dropDuplicatesWithinWatermark(["event_id"]).select(
        "event_type", "value"
    )
    result, q = _run_to_completion(deduped, "append")
    agg = result.groupBy("event_type").agg(
        F.count("*").alias("n"), dsum(F.col("value"), 2).alias("sum_value")
    )
    return _freeze(spark, agg, q)

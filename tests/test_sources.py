"""Source/sink format coverage: the typed log model round-trips through
parquet, ORC, JSON, and CSV unchanged (schema + values), and partitioned
layouts prune on read."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from aws_cloudfront_realtime_monitoring_spark.sources import parse_log_lines
from tests.test_parser import GOLDEN_LINE, lines_df


@pytest.fixture(scope="module")
def wide_df(spark):
    lines = [GOLDEN_LINE.replace("boNb1al7", f"req{i:03d}") for i in range(20)]
    return parse_log_lines(lines_df(spark, *lines))


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_roundtrip_format(spark, wide_df, fmt):
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, f"out.{fmt}")
        writer = wide_df.write.mode("overwrite")
        reader = spark.read
        if fmt in ("json", "csv"):
            # text formats need the schema pinned on read (no inference in prod)
            reader = reader.schema(wide_df.schema)
        if fmt == "csv":
            writer = writer.option("header", False)
            reader = reader.option("header", False)
        getattr(writer, fmt)(path)
        back = getattr(reader, fmt)(path)
        assert back.schema == wide_df.schema
        orig = sorted(map(tuple, wide_df.collect()))
        got = sorted(map(tuple, back.collect()))
        assert got == orig


def test_partitioned_write_prunes_on_read(spark, wide_df):
    with tempfile.TemporaryDirectory() as d:
        out = os.path.join(d, "part")
        (
            wide_df.withColumn("event_hour", F.hour("timestamp"))
            .write.mode("overwrite")
            .partitionBy("event_hour")
            .parquet(out)
        )
        pruned = spark.read.parquet(out).where(F.col("event_hour") == 3)
        # partition pruning visible in the plan: only hour=3 dirs scanned
        import contextlib, io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            pruned.explain(True)
        assert "PartitionFilters" in buf.getvalue()
        assert pruned.count() == 20  # golden ts is hour 3 UTC

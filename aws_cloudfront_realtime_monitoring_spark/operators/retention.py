"""Retention = partition lifecycle on the time-partitioned parquet sink.

The reference's storage tiers (Timestream memory store 24 h, magnetic store
7 d -- template.yaml:203-205) map to partition-level operations on the D6
layout (``event_date=<date>/event_hour=<h>``):

- the "hot window" a query touches is enforced by partition pruning
  (``WHERE timestamp >= ago(24h)`` scans only matching partitions);
- expiry (magnetic-store retention) is a partition DROP -- an O(partitions)
  metadata operation, no data rewrite, exactly how large lakes retire data.
"""

from __future__ import annotations

import os
import shutil
from datetime import date, datetime

from pyspark.sql import DataFrame, SparkSession


def list_date_partitions(sink_dir: str) -> list[tuple[date, str]]:
    """(partition_date, path) for every ``event_date=*`` child, sorted."""
    out = []
    if not os.path.isdir(sink_dir):
        return out
    for name in os.listdir(sink_dir):
        if name.startswith("event_date="):
            try:
                d = datetime.strptime(name.split("=", 1)[1], "%Y-%m-%d").date()
            except ValueError:
                continue
            out.append((d, os.path.join(sink_dir, name)))
    return sorted(out)


def drop_partitions_older_than(sink_dir: str, cutoff: date, dry_run: bool = False) -> list[str]:
    """Drop date partitions strictly older than ``cutoff`` (the 7 d
    magnetic-store retention semantics). Returns dropped paths.

    NOTE: a STREAMING parquet sink keeps a ``_spark_metadata`` transaction
    log whose file list still references dropped files; read a
    partially-retired sink with :func:`read_sink` (explicit partition paths
    + basePath, which bypasses the log). Table formats with real partition
    DDL (Delta/Iceberg) subsume this; with plain parquet this pairing is
    the standard pattern.
    """
    dropped = []
    for d, path in list_date_partitions(sink_dir):
        if d < cutoff:
            if not dry_run:
                shutil.rmtree(path)
            dropped.append(path)
    return dropped


def read_sink(spark: SparkSession, sink_dir: str) -> DataFrame:
    """Read the surviving partitions of a (possibly retired) streaming
    parquet sink: explicit partition directories with ``basePath`` so
    partition columns are recovered and the ``_spark_metadata`` log -- which
    may reference dropped files -- is not consulted."""
    paths = [p for _, p in list_date_partitions(sink_dir)]
    if not paths:
        # falling back to the root would consult the stale _spark_metadata
        # log and fail with an opaque FileNotFound from the JVM
        raise ValueError(
            f"no surviving date partitions under {sink_dir!r} "
            "(fully retired sink)"
        )
    return spark.read.option("basePath", sink_dir).parquet(*paths)

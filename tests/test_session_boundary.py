"""Session boundary semantics, pinned empirically: Spark's session_window
MERGES an event arriving exactly `gap` after its predecessor into the same
session (sessions merge while next_start <= current_end, end-inclusive).
The DuckDB oracle for session_window_agg therefore uses the strict
`> INTERVAL` gap predicate; this fixture pins the boundary behavior so an
engine upgrade that changes the merge rule fails loudly.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F


def test_session_window_gap_boundary_is_exclusive(spark):
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def ts(minutes: float):
        return t0 + datetime.timedelta(minutes=minutes)

    rows = [
        # user 1: gaps of exactly 30 min -> MERGED into one session
        # (next_start == current_end merges; end-inclusive rule)
        (1, ts(0)), (1, ts(30)), (1, ts(60)),
        # user 2: gaps of 30m01s -> three separate sessions
        (2, ts(0)), (2, ts(30 + 1 / 60)), (2, ts(60 + 2 / 60)),
    ]
    df = spark.createDataFrame(rows, "user_id INT, ts TIMESTAMP")
    out = (
        df.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n"))
        .groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"))
    )
    got = {r.user_id: r.n_sessions for r in out.collect()}
    assert got == {1: 1, 2: 3}


def test_lag_cumsum_oracle_idiom_matches_session_window(spark):
    """The strict-> boundary form of the lag+cumsum idiom (the DuckDB
    oracle's shape) reproduces session_window's session count on data that
    includes an exact-gap boundary event."""
    from pyspark.sql import Window as W

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, 100, t0),
        (1, 101, t0 + datetime.timedelta(minutes=30)),        # exact gap
        (1, 102, t0 + datetime.timedelta(minutes=59)),        # 29 min after
        (2, 200, t0),
        (2, 201, t0 + datetime.timedelta(minutes=29, seconds=59)),
    ]
    df = spark.createDataFrame(rows, "user_id INT, event_id INT, ts TIMESTAMP")

    native = (
        df.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n"))
        .groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"))
    )

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    new_session = F.when(
        F.lag("ts").over(w).isNull() | (gap_us > 30 * 60 * 1_000_000), 1
    ).otherwise(0)
    idiom = (
        df.withColumn("ns", new_session)
        .withColumn(
            "sid", F.sum("ns").over(w.rowsBetween(W.unboundedPreceding, 0))
        )
        .groupBy("user_id")
        .agg(F.count_distinct("sid").alias("n_sessions"))
    )
    assert sorted(map(tuple, native.collect())) == sorted(map(tuple, idiom.collect()))

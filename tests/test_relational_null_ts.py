"""r13 review regression: the lag+cumsum sessionize variant kept NULL-ts
rows (sorted NULLS FIRST into a phantom first session) while its shared
oracle CTE drops them via ts IS NOT NULL. Plants a NULL-ts row and pins
Spark-vs-DuckDB agreement on a crafted corpus -- the fixtures have no
NULL timestamps, so the registry gate alone can never catch this class.
"""

from __future__ import annotations

from datetime import datetime

import duckdb

from aws_cloudfront_realtime_monitoring_spark.plans import load_full


def test_sessionize_drops_null_ts_like_its_oracle(spark, tmp_path):
    q = load_full()["sessionize"]
    rows = [
        (1, 7, datetime(2024, 1, 8, 1, 0), "view", 1.0),
        (2, 7, datetime(2024, 1, 8, 1, 10), "view", 1.0),
        (3, 7, datetime(2024, 1, 8, 3, 0), "view", 1.0),   # new session
        (4, 7, None, "view", 1.0),                          # must drop
        (5, 9, None, "view", 1.0),                          # whole user NULL
    ]
    sdf = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, "
              "event_type string, value double")
    sf_dir = str(tmp_path)
    sdf.write.mode("overwrite").parquet(f"{sf_dir}/events.parquet")

    got = {r.user_id: (r.n_sessions, r.n_events)
           for r in q.build(spark, sf_dir).collect()}
    assert got == {7: (2, 3)}  # null rows gone; user 9 absent entirely

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet/*.parquet')"
    )
    oracle = {int(u): (int(s), int(n))
              for u, s, n in con.execute(q.oracle).fetchall()}
    assert oracle == got

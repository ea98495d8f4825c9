"""Bucketing: pre-shuffled table layout so co-keyed joins need no Exchange
-- the storage-level answer to the biggest shuffle in the engine
(lineitem x orders on orderkey) at 100 TB."""

from __future__ import annotations

import contextlib
import io
import tempfile

from pyspark.sql import functions as F

from aws_cloudfront_realtime_monitoring_spark.sources.tables import load_table


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    with tempfile.TemporaryDirectory() as d:
        for name, df, key in (
            ("li_bkt", li, "l_orderkey"),
            ("ord_bkt", orders, "o_orderkey"),
        ):
            (
                df.write.mode("overwrite")
                .option("path", f"{d}/{name}")
                .bucketBy(8, key)
                .sortBy(key)
                .saveAsTable(name)
            )
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = (
                spark.table("li_bkt")
                .join(
                    spark.table("ord_bkt"),
                    F.col("l_orderkey") == F.col("o_orderkey"),
                )
                .groupBy("o_orderstatus")
                .agg(F.count("*").alias("n"))
            )
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                joined.explain("formatted")
            plan = buf.getvalue()
            # bucketed co-location: the ONLY exchange in the whole plan
            # is the groupBy(o_orderstatus) aggregation's -- the join
            # itself shuffles nothing. (The old split("HashAggregate")[0]
            # probe was vacuous: formatted plans print root-first, so the
            # slice above the first HashAggregate never contains the join
            # subtree and an unbucketed join -- 3+ exchanges -- passed it;
            # r7 review, verified empirically.)
            assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            import re as _re

            # count NODES, not text: formatted explain prints each node in
            # the tree AND its details section
            n_exchanges = len(_re.findall(r"^\(\d+\) Exchange", plan, _re.M))
            assert n_exchanges <= 1, (
                f"bucketed join still shuffles ({n_exchanges} exchanges)"
            )
            assert "Bucketed: true" in plan, "scan did not use the buckets"
            # results identical to the plain join
            plain = (
                li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
                .groupBy("o_orderstatus")
                .agg(F.count("*").alias("n"))
            )
            assert sorted(map(tuple, joined.collect())) == sorted(
                map(tuple, plain.collect())
            )
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
            spark.sql("DROP TABLE IF EXISTS li_bkt")
            spark.sql("DROP TABLE IF EXISTS ord_bkt")

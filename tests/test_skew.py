"""Salted join / two-phase aggregation: identity with the unsalted plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_cloudfront_realtime_monitoring_spark.operators.skew import salted_join, two_phase_agg
from aws_cloudfront_realtime_monitoring_spark.sources.tables import load_table


def test_salted_join_matches_plain_join(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = (
        orders.join(cust, "o_custkey")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
    )
    salted = (
        salted_join(orders, cust, "o_custkey", n_salts=4)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_two_phase_agg_matches_plain_agg(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plain = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.min("l_quantity").alias("qmin"),
        F.max("l_quantity").alias("qmax"),
    )
    salted = two_phase_agg(
        li,
        "l_returnflag",
        {"n": "count", "qmin": "min:l_quantity", "qmax": "max:l_quantity"},
        n_salts=4,
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_two_phase_agg_rejects_non_decomposable():
    import pytest

    with pytest.raises(ValueError):
        two_phase_agg(None, "k", {"m": "median:x"})


def test_salted_join_rejects_outer_joins(spark, sf_dir):
    """right/full outer would emit each unmatched small-side row once per
    salt replica -- the operator must refuse rather than silently duplicate."""
    import pytest

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    for how in ("right", "right_outer", "full", "full_outer", "outer"):
        with pytest.raises(ValueError, match="salted_join does not support"):
            salted_join(orders, cust, "o_custkey", n_salts=4, how=how)

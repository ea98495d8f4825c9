"""Salted join / two-phase aggregation: identity with the unsalted plans."""

from __future__ import annotations

import pytest
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


def test_salt_spreads_identical_hot_key_rows(spark):
    """A content-hash salt collapses identical rows onto ONE salt value,
    defeating the operator in exactly the pathological case it exists
    for; the row-position salt must spread them."""
    from aws_cloudfront_realtime_monitoring_spark.operators.skew import (
        two_phase_agg,
    )

    # 2000 IDENTICAL rows of one hot key (plus a cold key)
    hot = spark.range(2000).selectExpr("'hot' AS k", "1 AS v")
    cold = spark.range(3).selectExpr("'cold' AS k", "2 AS v")
    df = hot.union(cold)
    out = {r.k: (r.n, r.s) for r in two_phase_agg(
        df, "k", {"n": "count:", "s": "sum:v"}, n_salts=8
    ).collect()}
    assert out == {"hot": (2000, 2000), "cold": (3, 6)}
    # spread check: the partial phase must see >1 salt for the hot key
    from pyspark.sql import functions as F

    salted = df.withColumn(
        "__salt",
        F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(8)),
    )
    n_salts_hot = salted.where("k = 'hot'").select("__salt").distinct().count()
    assert n_salts_hot > 1, "identical rows landed on one salt"


def test_skew_argument_guards(spark):
    """r12 review: n_salts=0 used to make pmod NULL and silently return
    zero rows from an inner salted_join; a pre-existing __salt column
    was silently replaced then dropped; 'sum' without ':col' died later
    as an opaque AnalysisException."""
    df = spark.range(5).select(F.col("id").alias("k"), F.lit(1).alias("v"))
    with pytest.raises(ValueError, match="n_salts"):
        salted_join(df, df, "k", n_salts=0)
    with pytest.raises(ValueError, match="n_salts"):
        two_phase_agg(df, "k", {"n": "count"}, n_salts=0)
    salted = df.withColumn("__salt", F.lit(9))
    with pytest.raises(ValueError, match="__salt"):
        salted_join(salted, df, "k")
    with pytest.raises(ValueError, match="__salt"):
        two_phase_agg(salted, "k", {"n": "count"})
    with pytest.raises(ValueError, match="input column"):
        two_phase_agg(df, "k", {"total": "sum"})


def test_salted_join_auto_matches_plain_join(spark, sf_dir):
    """r15: n_salts='auto' (in-query skew-derived params relation) must
    be identity-preserving like every fixed count."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = (
        orders.join(cust, "o_custkey")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
    )
    auto = (
        salted_join(orders, cust, "o_custkey", n_salts="auto")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, auto.collect()))


def test_derived_salt_params_tracks_skew(spark):
    """The makespan model's qualitative contract: a hot-key corpus
    derives MORE salts than a uniform one, a uniform corpus derives ~1
    (salting disabled), and the result is clamped to [1, SALT_CAP]."""
    from aws_cloudfront_realtime_monitoring_spark.operators.skew import (
        SALT_CAP,
        derived_salt_params,
    )

    small = spark.range(100).select(F.col("id").alias("k"))
    # 50%-hot corpus: key 0 owns every even row
    hot = spark.range(0, 20_000, 1, 4).select(
        F.when(F.col("id") % 2 == 0, 0)
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(99)) + 1).alias("k"))
    uniform = spark.range(0, 20_000, 1, 4).select(
        F.pmod(F.xxhash64("id"), F.lit(100)).alias("k"))
    n_hot = derived_salt_params(hot, "k", small).collect()[0].n_salts
    n_uni = derived_salt_params(uniform, "k", small).collect()[0].n_salts
    assert 1 <= n_uni <= 2, n_uni          # balanced data: ~no salting
    assert n_hot > n_uni, (n_hot, n_uni)   # skew demands spread
    assert n_hot <= SALT_CAP
    # tiny small side, huge parallelism: the clamp must hold
    one = spark.range(1).select(F.col("id").alias("k"))
    n_cap = derived_salt_params(
        hot, "k", one, parallelism=1_000_000).collect()[0].n_salts
    assert n_cap == SALT_CAP


def test_salted_join_auto_guards(spark):
    df = spark.range(5).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="auto"):
        salted_join(df, df, "k", n_salts="automatic")
    clash = df.withColumn("n_salts", F.lit(1))
    with pytest.raises(ValueError, match="n_salts"):
        salted_join(clash, df, "k", n_salts="auto")

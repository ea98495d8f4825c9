"""Count-min sketch: estimates must respect both CMS bounds against exact
counts, and partition-built sketches must merge to the whole-data answer."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from aws_cloudfront_realtime_monitoring_spark.operators.sketch import (
    build_count_min,
)


def test_count_min_bounds_vs_exact(spark, sf_dir):
    """exact <= estimate <= exact + eps * N for every event_type (the
    additive bound holds deterministically here: the value cardinality is
    far below the sketch width, so the fixed-seed hash rows collide
    rarely), and the sketch dimensions match ceil(e/eps) x ln-based depth."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    eps = 0.001
    cms = build_count_min(events, "event_type", eps=eps, confidence=0.99)
    exact = {
        r.event_type: r.n
        for r in events.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    n_total = sum(exact.values())
    assert cms.total() == n_total
    for v, n in exact.items():
        est = cms.estimate(v)
        assert n <= est <= n + eps * n_total, (v, n, est)
    # a value never seen estimates at most eps * N (usually 0)
    assert cms.estimate("no_such_event_type") <= eps * n_total
    # Spark sizes w = ceil(2/eps) (tighter than the canonical e/eps)
    assert cms.width == math.ceil(2 / eps)
    assert cms.depth >= 1


def test_count_min_merge_equals_whole(spark, sf_dir):
    """Shard-parallel property: sketches built over disjoint halves and
    merged give the same estimates as one sketch over everything (same
    eps/confidence/seed -> identical hash functions -> counter arrays are
    elementwise additive)."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    lo = events.where(F.col("event_id") % 2 == 0)
    hi = events.where(F.col("event_id") % 2 == 1)
    whole = build_count_min(events, "event_type", eps=0.001)
    merged = build_count_min(lo, "event_type", eps=0.001).merge(
        build_count_min(hi, "event_type", eps=0.001)
    )
    assert merged.total() == whole.total()
    for r in events.select("event_type").distinct().collect():
        assert merged.estimate(r.event_type) == whole.estimate(r.event_type)


def test_count_min_relation_bounds_vs_exact(spark, sf_dir):
    """The RELATIONAL sketch (count_min_relation + cms_point_estimates --
    the fully-lazy form heavy_hitters' in-query contract uses) respects
    both CMS bounds against exact counts for EVERY user_id, entirely
    in-engine: the assertion columns are computed by the same join the
    query plan uses, and the driver only sees the violation count."""
    from aws_cloudfront_realtime_monitoring_spark.operators.sketch import (
        cms_depth,
        cms_point_estimates,
        cms_width,
        count_min_relation,
    )

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    eps = 0.001
    sk = count_min_relation(events, "user_id", eps=eps, confidence=0.99)
    # the sketch relation is model-sized: at most d*w rows
    assert sk.count() <= cms_depth(0.99) * cms_width(eps)
    exact = events.groupBy("user_id").agg(F.count("*").alias("n"))
    est = cms_point_estimates(exact, "user_id", sk, carry=("n",))
    n_total = events.count()
    # SUM over one hash row recovers the stream length
    n_from_sketch = sk.where(F.col("d") == 0).agg(F.sum("cnt")).head()[0]
    assert n_from_sketch == n_total
    bad = est.where(
        (F.col("cms_est") < F.col("n"))
        | (F.col("cms_est") > F.col("n") + eps * n_total)
    ).count()
    assert bad == 0
    # a key never seen estimates at most eps * N
    ghost = spark.range(1).select(F.lit(-987654321).alias("user_id"))
    ghost_est = cms_point_estimates(ghost, "user_id", sk).head()
    assert ghost_est.cms_est <= eps * n_total


def test_cms_empty_sketch_estimates_zero_not_vanish(spark):
    """An empty sketch (zero-row build input) must still yield a cms_est=0
    row per probe key (r11 advice: all-NULL params nulled sequence() and
    every probe silently vanished)."""
    from aws_cloudfront_realtime_monitoring_spark.operators.sketch import (
        cms_point_estimates,
        count_min_relation,
    )

    empty = spark.createDataFrame([], "user_id BIGINT")
    sk = count_min_relation(empty, "user_id", eps=0.01, confidence=0.99)
    keys = spark.createDataFrame([(7,), (11,)], "user_id BIGINT")
    got = {r.user_id: r.cms_est
           for r in cms_point_estimates(keys, "user_id", sk).collect()}
    assert got == {7: 0, 11: 0}

"""Pre-aggregated distinct-count cube via mergeable HLL sketches — the
monitoring rollup the reference's domain runs on.

The reference's dashboards ask "how many distinct IPs / URIs in this time
range?" (README.md dashboard panels; Timestream COUNT DISTINCT per bin).
Exact answers need a rescan of the raw range per query; at 100 TB that is
the single most expensive recurring query shape. The standard fix is a
sketch CUBE: aggregate once into one HyperLogLog sketch per (bucket,
dimension) — tiny, mergeable state — then answer ANY range by unioning
the covered buckets' sketches. Re-aggregation (hour -> day -> month) is
the same union, so one cube serves every zoom level.

Built on Spark's Apache DataSketches integration (``hll_sketch_agg`` /
``hll_union_agg`` / ``hll_sketch_estimate`` — JVM aggregates, map-side
partial merge, nothing shuffles but sketch bytes). Error is the HLL
standard ~1.04/sqrt(2^lg_k) relative (lg_k=14 -> ~0.8%); the tests pin a
5-sigma bound against exact distinct counts, mirroring the registry's
``approx_distinct_ips`` contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: log2 of the sketch's register count; 14 -> ~0.8% relative standard error
DEFAULT_LG_K = 14


def hourly_distinct_cube(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    lg_k: int = DEFAULT_LG_K,
) -> DataFrame:
    """One HLL sketch (plus an exact row count) per hour bucket.

    The cube is what lands in storage: |hours| rows of ~2^lg_k bytes each,
    independent of raw volume — write once per ingest window, query
    forever. Partition the output by date at scale; bucket pruning then
    touches only the queried range's sketches.

    Buckets are EPOCH-ALIGNED via functions.timestream.bin_ rather than
    date_trunc (r11 review): date_trunc('hour') follows the session
    timezone, so a cube written under one tz and queried/reaggregated
    under another (e.g. a +05:30 offset) would group the same instant
    into different buckets with no error; the arithmetic bin is
    tz-independent and equals date_trunc under UTC.

    NULL-timestamp rows are DROPPED (r13 review): ``bin_`` maps them to a
    NULL bucket that every bounded ``range_distinct`` call silently
    excludes (NULL fails both range predicates) while an unbounded call
    includes it -- two "whole range" queries disagreeing with no error --
    and date-partitioned storage would drop the bucket anyway. Same rule
    as session_window / the session CTE oracle."""
    from ..functions.timestream import bin_

    return (
        df.where(F.col(ts_col).isNotNull())
        .groupBy(bin_(F.col(ts_col), "1h").alias("bucket_start"))
        .agg(
            F.hll_sketch_agg(key_col, F.lit(int(lg_k))).alias("sketch"),
            F.count("*").alias("n_rows"),
        )
    )


def range_distinct(
    cube: DataFrame,
    start=None,
    end=None,
    bucket_col: str = "bucket_start",
) -> DataFrame:
    """Distinct-count estimate over any bucket range: union the covered
    sketches (one tiny aggregation over |buckets in range| rows — the raw
    data is never touched) and read the estimate.

    Returns a 1-row DataFrame ``(n_distinct BIGINT, n_rows BIGINT)``.
    ``start``/``end`` filter inclusively on ``bucket_col`` when given —
    predicates on the cube's bucket column prune partitions at scale."""
    from ..functions.timestream import ts_lit

    # ts_lit, not F.lit: a naive datetime through F.lit converts in the
    # HOST timezone (py4j DatetimeConverter/mktime) while strings parse
    # in the UTC session tz -- the same class as the r12 ago() fix; a
    # datetime bound under TZ=America/New_York silently shifted the
    # range by 5 hours (r13 review)
    ranged = cube
    if start is not None:
        ranged = ranged.where(F.col(bucket_col) >= ts_lit(start))
    if end is not None:
        ranged = ranged.where(F.col(bucket_col) <= ts_lit(end))
    return ranged.agg(
        # coalesce: hll_union_agg over ZERO rows is NULL; an empty range
        # must still honor the documented BIGINT pair (0, 0)
        F.coalesce(
            F.hll_sketch_estimate(F.hll_union_agg("sketch")), F.lit(0)
        ).alias("n_distinct"),
        F.coalesce(F.sum("n_rows"), F.lit(0)).alias("n_rows"),
    )


def reaggregate(
    cube: DataFrame,
    bucket_expr: Column,
    bucket_name: str = "bucket_start",
) -> DataFrame:
    """Roll a finer cube up to coarser buckets (hour -> day, day -> month):
    the same sketch union, grouped — lossless with respect to the sketch
    state, so zoomed-out dashboards reuse the one stored cube."""
    return (
        cube.groupBy(bucket_expr.alias(bucket_name))
        .agg(
            F.hll_union_agg("sketch").alias("sketch"),
            F.sum("n_rows").alias("n_rows"),
        )
    )

"""Advanced operator coverage: sliding/session windows as batch semantics,
Timestream-style rate/interpolation, exact quantiles, engine-exact moment
statistics, argmin/argmax, grouping sets, and subquery shapes.

Determinism notes:
- variance/correlation use integer-quantized sums (round(x*100) BIGINT), so
  the moments are exact in both engines and only the final few IEEE double
  ops run on identical inputs -- no accumulation-order drift;
- rates/interpolations compute the same IEEE expression from identical
  inputs on both sides, then round for display.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources.tables import load_table, register_views
from . import register
from .core import dsum, dsum_sql, session_cte_sql


@register(
    "sliding_window_counts",
    oracle=f"""
    WITH expanded AS (
      SELECT event_type, value,
             make_timestamp(((CAST(floor(epoch(ts)) AS BIGINT) // 900
                              - unnest(generate_series(0, 3))) * 900) * 1000000)
               AS window_start
      -- ts IS NOT NULL: Spark's window() silently DROPS null-timestamp
      -- rows while make_timestamp(NULL) would keep a NULL-window group
      -- here (r11 review; latent -- the generator emits no NULL ts)
      FROM events WHERE ts IS NOT NULL)
    SELECT window_start, event_type, COUNT(*) AS n, {dsum_sql('value', 2)} AS sum_value
    FROM expanded GROUP BY window_start, event_type
    """,
    description="Sliding windows (1 h length, 15 min slide) in batch: each "
                "event contributes to 4 overlapping windows. Spark's "
                "window() generates the expansion; the oracle replicates it "
                "with an explicit series unnest.",
    tags=("window", "sliding"),
    driver_slot=False,  # r6 demotion: subsumed by stream_sliding_equiv (identical sliding-window oracle, plus the streaming run)
)
def sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), F.col("event_type")
        )
        .agg(F.count("*").alias("n"), dsum(F.col("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


@register(
    "session_window_agg",
    oracle=f"""
    WITH {session_cte_sql()}
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
    FROM sessions GROUP BY user_id, sid
    """,
    description="Native session_window (30 min gap) in batch mode -- "
                "Spark's dynamic-gap session assignment; the oracle derives "
                "identical sessions with the lag+cumsum idiom. Boundary "
                "semantics (exact-gap events merge) are pinned by a fixture "
                "test so an engine upgrade changing the rule fails loudly.",
    tags=("window", "session"),
)
def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("user_id"), F.col("w.start").alias("session_start"), "n_events")
    )


@register(
    "derivative_rate",
    oracle="""
    WITH d AS (
      SELECT event_type,
             value - LAG(value) OVER w AS dv,
             CAST(epoch_us(ts) - epoch_us(LAG(ts) OVER w) AS DOUBLE) / 1000000.0 AS dt
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id))
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(dv / dt * 1000000.0 + 0.5) AS BIGINT))
                AS DOUBLE) / 1000000.0 AS sum_rate
    FROM d WHERE dt IS NOT NULL AND dt > 0
    GROUP BY event_type
    """,
    description="Timestream DERIVATIVE-style rate of change per series: "
                "lag-based dv/dt, aggregated exactly (rounded-decimal sum). "
                "Demoted from the driver registry r9 (slot to "
                "stream_session_equiv): its lag-window machinery is covered "
                "by interpolate_linear_fill + window_frames_ranking driver "
                "rows; the identical hash check still runs in the test "
                "suite (driver_slot=False).",
    tags=("window", "timeseries"),
    driver_slot=False,
)
def derivative_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy("ts", "event_id")
    dv = F.col("value") - F.lag("value").over(w)
    dt = (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).cast("double") / 1e6
    return (
        events.select("event_type", dv.alias("dv"), dt.alias("dt"))
        .where(F.col("dt").isNotNull() & (F.col("dt") > 0))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            # floor-half-up MICRO units, not ROUND(double, 6): the two
            # engines' ROUND disagree on repr-tie rationals (a dyadic
            # whole-second gap makes dv/dt land on one -- r11 review,
            # reproduced vs DuckDB), while FLOOR(x*1e6 + 0.5) is the
            # same IEEE op chain on both; the BIGINT sum is then
            # order-free exactly like the old decimal sum
            (
                F.sum(
                    F.floor(F.col("dv") / F.col("dt") * 1000000.0 + 0.5)
                ).cast("double") / 1000000.0
            ).alias("sum_rate"),
        )
    )


def _grid_spark_sql_cte(start: str, end: str) -> str:
    """``merged`` CTE body (no leading WITH) -- the Spark-SQL twin of
    ``_grid_oracle_cte`` and the ONE Spark spelling of the hourly-grid
    union idiom (r18; previously the Column-composed ``_grid_union``,
    whose tiebreak/ordering contract this string reproduces exactly):
    per-series hourly grid rows (is_grid=1, tie sentinel -1) unioned
    with the real observations (is_grid=0, tie=event_id). Consumers
    attach GROWING windows ordered by the total (t, is_grid, tie)."""
    return f"""merged AS (
      SELECT event_type,
             explode(sequence(CAST('{start}' AS TIMESTAMP),
                              CAST('{end}' AS TIMESTAMP),
                              INTERVAL 1 HOUR)) AS t,
             CAST(NULL AS DOUBLE) AS v, 1 AS is_grid,
             CAST(-1 AS BIGINT) AS tie
      FROM (SELECT DISTINCT event_type FROM events)
      UNION ALL
      SELECT event_type, ts AS t, value AS v, 0 AS is_grid,
             event_id AS tie
      FROM events)"""


def _grid_oracle_cte(start: str, end: str) -> str:
    """hours + merged CTE body (no leading WITH) for the interpolation
    oracles -- the DuckDB twin of ``_grid_spark_sql_cte``, ONE spelling
    (r11 review: the r6 tiebreak fix had to be hand-applied to two
    verbatim copies of this fragment; the next boundary fix lands
    once)."""
    return f"""hours AS (
      SELECT event_type,
             make_timestamp(unnest(generate_series(
               CAST(floor(epoch(TIMESTAMP '{start}')) AS BIGINT),
               CAST(floor(epoch(TIMESTAMP '{end}')) AS BIGINT),
               3600)) * 1000000) AS grid_ts
      FROM (SELECT DISTINCT event_type FROM events)),
    merged AS (
      -- tie = event_id (grid rows: -1 sentinel) totalizes the window
      -- order: duplicate (event_type, ts) observations would otherwise
      -- make the IGNORE NULLS lookups engine/partitioning-dependent
      -- (ADVICE r6)
      SELECT event_type, grid_ts AS t, NULL::DOUBLE AS v, 1 AS is_grid,
             CAST(-1 AS BIGINT) AS tie
      FROM hours
      UNION ALL
      SELECT event_type, ts AS t, value AS v, 0 AS is_grid, event_id AS tie
      FROM events)"""


@register(
    "interpolate_linear_fill",
    oracle=f"""
    WITH {_grid_oracle_cte("2024-01-02 00:00:00", "2024-01-04 00:00:00")},
    filled AS (
      SELECT event_type, t, v, is_grid,
             LAST_VALUE(CASE WHEN is_grid = 0 THEN v END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY t, is_grid, tie
                     ROWS UNBOUNDED PRECEDING) AS prev_v,
             LAST_VALUE(CASE WHEN is_grid = 0 THEN epoch_us(t) END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY t, is_grid, tie
                     ROWS UNBOUNDED PRECEDING) AS prev_t,
             FIRST_VALUE(CASE WHEN is_grid = 0 THEN v END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY t, is_grid, tie
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
             FIRST_VALUE(CASE WHEN is_grid = 0 THEN epoch_us(t) END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY t, is_grid, tie
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_t
      FROM merged)
    SELECT event_type, t AS grid_ts,
           FLOOR((prev_v + (next_v - prev_v)
                 * (CAST(epoch_us(t) - prev_t AS DOUBLE)
                    / CAST(next_t - prev_t AS DOUBLE)))
                 * 10000.0 + 0.5) / 10000.0 AS interp
    FROM filled
    WHERE is_grid = 1 AND prev_v IS NOT NULL AND next_v IS NOT NULL
      AND next_t > prev_t
    """,
    description="Timestream INTERPOLATE_LINEAR_FILL analog: hourly grid per "
                "series, linear interpolation between neighboring real "
                "points via the union+window idiom (one shuffle per series "
                "key, no per-point scans).",
    tags=("timeseries", "interpolation"),
)
def interpolate_linear_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import register_views

    # One spark.sql statement instead of Column composition (r18, the
    # text_profile/cf_parse precedent, guide §4: the window specs +
    # union + sequence grid cost 0.21-0.32 s of per-invocation py4j
    # build latency, ~40% of the row's wall; the SQL string parses
    # JVM-side in one call with identical plan node shapes).
    # BOTH lookups use GROWING frames (unboundedPreceding..current): Spark's
    # shrinking-frame processor (current..unboundedFollowing) recomputes the
    # aggregate per row -- O(n^2) per partition, measured 75 s at sf0.1.
    # The "next point" is found with the ordering reversed instead (same
    # result; a real point exactly at a grid instant lands in `prev` with
    # interpolation weight 0, so exclusion from `next` is immaterial).
    # event_id tiebreak (grid sentinel -1) totalizes both lookup orders
    # (r7 review: the LOCF sibling's ADVICE fix, applied here too)
    register_views(spark, sf_dir)
    fwd = ("OVER (PARTITION BY event_type "
           "ORDER BY t ASC, is_grid ASC, tie ASC "
           "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")
    rev = ("OVER (PARTITION BY event_type "
           "ORDER BY t DESC, is_grid DESC, tie DESC "
           "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")
    real_v = "CASE WHEN is_grid = 0 THEN v END"
    real_t = "CASE WHEN is_grid = 0 THEN unix_micros(t) END"
    # floor-half-up, not ROUND(double, 4): a dyadic grid/gap ratio can
    # land interp on a repr-tie rational where the engines' ROUND
    # disagree (r11 review, reproduced vs DuckDB); FLOOR(x*1e4 + 0.5)/1e4
    # is the identical IEEE chain on both
    return spark.sql(f"""
        WITH {_grid_spark_sql_cte("2024-01-02 00:00:00",
                                  "2024-01-04 00:00:00")},
        filled AS (
          SELECT event_type, t, is_grid,
                 last({real_v}, true) {fwd} AS prev_v,
                 last({real_t}, true) {fwd} AS prev_t,
                 last({real_v}, true) {rev} AS next_v,
                 last({real_t}, true) {rev} AS next_t
          FROM merged)
        SELECT event_type, t AS grid_ts,
               FLOOR((prev_v + (next_v - prev_v)
                      * (CAST(unix_micros(t) - prev_t AS DOUBLE)
                         / CAST(next_t - prev_t AS DOUBLE)))
                     * CAST(10000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE))
                 / CAST(10000.0 AS DOUBLE) AS interp
        FROM filled
        WHERE is_grid = 1 AND prev_v IS NOT NULL AND next_v IS NOT NULL
          AND next_t > prev_t
    """)


@register(
    "stats_profile",
    oracle="""
    WITH q AS (SELECT event_type, value, event_id,
                      CAST(ROUND(value * 100) AS BIGINT) AS x,
                      user_id AS y
               FROM events),
    s AS (SELECT event_type, COUNT(*) AS n,
                 FLOOR(quantile_cont(value, 0.5) * 10000.0 + 0.5) / 10000.0 AS p50,
                 FLOOR(quantile_cont(value, 0.9) * 10000.0 + 0.5) / 10000.0 AS p90,
                 FLOOR(quantile_cont(value, 0.99) * 10000.0 + 0.5) / 10000.0 AS p99,
                 SUM(x) AS sx, SUM(x * x) AS sxx,
                 SUM(y) AS sy, SUM(y * y) AS syy,
                 SUM(x * y) AS sxy,
                 min_by(event_id, x * 8589934592 + event_id) AS min_event,
                 max_by(event_id, x * 8589934592 + event_id) AS max_event,
                 MIN(value) AS min_value, MAX(value) AS max_value
          FROM q GROUP BY event_type)
    SELECT event_type, n, p50, p90, p99,
           FLOOR((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                 / (CAST(n AS DOUBLE) - 1.0) / 10000.0 * 10000.0 + 0.5) / 10000.0 AS var_value,
           FLOOR((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) * 1000000.0 + 0.5) / 1000000.0 AS corr_xy,
           min_event, max_event, min_value, max_value,
           CAST(1 AS BIGINT) AS p50_approx_ok
    FROM s
    """,
    description="Statistical profile per group in ONE aggregation pass: "
                "exact interpolated quantiles (percentile / quantile_cont), "
                "variance + correlation via integer-quantized moment sums "
                "(exact, order-independent -- built-in stddev/corr use "
                "merge-order-dependent float accumulators, unfit for "
                "cross-engine hash comparison), and argmin/argmax "
                "(min_by/max_by) with a composite scalar key so ties break "
                "deterministically in both engines. Also carries the "
                "APPROXIMATE percentile scale path (percentile_approx, the "
                "Greenwald-Khanna sketch: mergeable, bounded memory -- what "
                "replaces exact percentile at 100 TB) under the same "
                "in-query verified-approximation contract as the HLL row: "
                "the sketch p50, whose rank error is <= 1/accuracy, must "
                "land between the exact percentiles at 0.5 -/+ 2/accuracy, "
                "and the oracle expects that flag to be 1.",
    tags=("aggregate", "quantile", "stats"),
)
def stats_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One spark.sql statement instead of ~35 composed Columns (r18, the
    # text_profile/cf_parse precedent, guide §4: 0.20-0.40 s of
    # per-invocation py4j build latency, ~30% of the row's wall; the
    # SQL string parses JVM-side in one call, identical plan shapes).
    #
    # Preserved contracts, spelled exactly as the Column form compiled:
    # - 2^33 min_by/max_by key multiplier: injective while event_id <
    #   2^33 (the old 1e7 collided past sf~1, making ties engine-
    #   dependent -- r8 review); x <= ~1e6 keeps the key inside int64.
    # - percentile keeps ALL values in its partial-aggregation buffers,
    #   which forces the whole mixed aggregate onto the slow object-hash
    #   path and ships every value through the shuffle; isolating it in
    #   its own (cheap, declarative) plan and broadcast-joining the
    #   |groups|-row results is ~2.5x faster and scales the same way.
    # - GK-sketch contract probes: percentile_approx(acc) has rank error
    #   <= n/acc, so the sketch's p50 (an actual data value) must sit
    #   between the exact interpolated percentiles at 0.5 -/+ 2/acc
    #   (the 2x margin absorbs the interpolation-index offset at small n).
    # - FLOOR(x*1e4 + 0.5)/1e4, the portable cross-engine rounding:
    #   ROUND(double, n) diverges between Spark (shortest-repr HALF_UP)
    #   and DuckDB (scaled-double round) on repr-tie rationals (r11);
    #   percentile interpolation between 2-decimal neighbors can land on
    #   a 5th-decimal tie (r13 review). All float chains below keep the
    #   Column form's association order so doubles stay bit-identical.
    register_views(spark, sf_dir)
    acc = 100

    def q4(col: str) -> str:
        return (f"FLOOR({col} * CAST(10000.0 AS DOUBLE) "
                f"+ CAST(0.5 AS DOUBLE)) / CAST(10000.0 AS DOUBLE)")

    nd, sx, sxx = "CAST(n AS DOUBLE)", "CAST(sx AS DOUBLE)", "CAST(sxx AS DOUBLE)"
    sy, syy, sxy = "CAST(sy AS DOUBLE)", "CAST(syy AS DOUBLE)", "CAST(sxy AS DOUBLE)"
    var = (f"(({sxx} - {sx} * {sx} / {nd}) / ({nd} - CAST(1.0 AS DOUBLE))"
           f" / CAST(10000.0 AS DOUBLE))")
    corr = (f"(({nd} * {sxy} - {sx} * {sy}) / "
            f"(SQRT({nd} * {sxx} - {sx} * {sx})"
            f" * SQRT({nd} * {syy} - {sy} * {sy})))")
    return spark.sql(f"""
        WITH q AS (
          SELECT event_type, value, event_id,
                 CAST(round(value * 100, 0) AS BIGINT) AS x,
                 user_id AS y
          FROM events),
        pct AS (
          SELECT event_type,
                 {q4('percentile(value, CAST(0.5 AS DOUBLE))')} AS p50,
                 {q4('percentile(value, CAST(0.9 AS DOUBLE))')} AS p90,
                 {q4('percentile(value, CAST(0.99 AS DOUBLE))')} AS p99,
                 percentile_approx(value, CAST(0.5 AS DOUBLE), {acc})
                   AS p50_gk,
                 percentile(value, CAST({0.5 - 2.0 / acc!r} AS DOUBLE))
                   AS p50_lo,
                 percentile(value, CAST({0.5 + 2.0 / acc!r} AS DOUBLE))
                   AS p50_hi
          FROM q GROUP BY event_type),
        s AS (
          SELECT event_type,
                 COUNT(*) AS n,
                 SUM(x) AS sx, SUM(x * x) AS sxx,
                 SUM(y) AS sy, SUM(y * y) AS syy,
                 SUM(x * y) AS sxy,
                 min_by(event_id, x * 8589934592 + event_id) AS min_event,
                 max_by(event_id, x * 8589934592 + event_id) AS max_event,
                 MIN(value) AS min_value, MAX(value) AS max_value
          FROM q GROUP BY event_type)
        SELECT /*+ BROADCAST(pct) */
               event_type, n, p50, p90, p99,
               FLOOR({var} * CAST(10000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE))
                 / CAST(10000.0 AS DOUBLE) AS var_value,
               FLOOR({corr} * CAST(1000000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE))
                 / CAST(1000000.0 AS DOUBLE) AS corr_xy,
               min_event, max_event, min_value, max_value,
               CAST(CASE WHEN p50_gk >= p50_lo AND p50_gk <= p50_hi
                         THEN 1 ELSE 0 END AS BIGINT) AS p50_approx_ok
        FROM s JOIN pct USING (event_type)
    """)


@register(
    "subquery_shapes",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n
    FROM orders
    WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) / COUNT(*) FROM orders)
      AND o_custkey IN (SELECT c_custkey FROM customer
                        WHERE c_mktsegment = 'BUILDING')
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_discount > 0.05)
    GROUP BY o_orderpriority
    """,
    description="Subquery shapes through the SQL API: uncorrelated scalar "
                "subquery, IN-subquery, correlated EXISTS -- Catalyst "
                "rewrites them to broadcast/semi joins. The scalar "
                "threshold is an exact decimal SUM divided once (one IEEE "
                "op): a plain AVG(double) accumulates in partition order "
                "and its low-order bits differ across engines, so a row "
                "landing within ~1e-9 of the mean could flip the count "
                "(r8 review; latent with current fixtures).",
    tags=("sql-api", "subquery", "join"),
)
def subquery_shapes(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n
        FROM orders
        WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) / COUNT(*) FROM orders)
          AND o_custkey IN (SELECT c_custkey FROM customer
                            WHERE c_mktsegment = 'BUILDING')
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_discount > 0.05)
        GROUP BY o_orderpriority
        """
    )


@register(
    "string_distance_pairs",
    oracle="""
    WITH t AS (SELECT DISTINCT p_type FROM part)
    SELECT a.p_type AS type_a, b.p_type AS type_b,
           CAST(levenshtein(a.p_type, b.p_type) AS BIGINT) AS dist
    FROM t a JOIN t b ON a.p_type < b.p_type
    WHERE levenshtein(a.p_type, b.p_type) <= 6
    """,
    description="String-similarity self-join (levenshtein <= 6 over distinct "
                "part types) -- fuzzy-matching building block.",
    tags=("text", "join"),
)
def string_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    t = part.select("p_type").distinct()
    a = t.select(F.col("p_type").alias("type_a"))
    b = t.select(F.col("p_type").alias("type_b"))
    dist = F.levenshtein("type_a", "type_b")
    return (
        a.join(b, F.col("type_a") < F.col("type_b"))
        .where(dist <= 6)
        .select("type_a", "type_b", dist.cast("bigint").alias("dist"))
    )


@register(
    "window_frames_ranking",
    oracle="""
    WITH q AS (SELECT *, CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS cents
               FROM events)
    SELECT event_id,
           CAST(SUM(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS DOUBLE) / 100.0
             AS running_sum,
           FLOOR(CAST(SUM(cents) OVER f4 AS DOUBLE)
                 / CAST(COUNT(*) OVER f4 AS DOUBLE) / 100.0
                 * 10000.0 + 0.5) / 10000.0 AS mov_avg4,
           CAST(RANK() OVER w AS BIGINT) AS rnk,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
           CAST(NTILE(4) OVER (PARTITION BY user_id ORDER BY value, event_id) AS BIGINT) AS quartile
    FROM q
    WINDOW w AS (PARTITION BY user_id ORDER BY cents DESC, event_id),
           f4 AS (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    """,
    description="Window frame specs + ranking family: running sum (growing "
                "frame, integer-cents exact), 4-row moving average, rank / "
                "dense_rank / ntile with deterministic tiebreaks. One "
                "shuffle on user_id serves all six functions. r13: every "
                "compared value and order key quantizes through "
                "FLOOR(value*100 + 0.5) integer cents -- ROUND(double, n) "
                "diverges cross-engine on repr-tie rationals, and a "
                "windowed AVG(double) is additionally summation-order "
                "dependent (DuckDB's segment tree vs Spark's sequential "
                "frame), so the moving average is SUM(cents)/COUNT/100 "
                "floor-quantized, exact integer arithmetic until one IEEE "
                "division.",
    tags=("window", "frames"),
)
def window_frames_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100.0 + 0.5).cast("bigint")
    q = events.withColumn("cents", cents)
    wt = W.partitionBy("user_id").orderBy("ts", "event_id")
    wv = W.partitionBy("user_id").orderBy(
        F.col("cents").desc(), F.asc("event_id")
    )
    wq = W.partitionBy("user_id").orderBy(F.asc("value"), F.asc("event_id"))
    f4 = wt.rowsBetween(-3, 0)
    mov = (
        F.sum("cents").over(f4).cast("double")
        / F.count(F.lit(1)).over(f4).cast("double") / 100.0
    )
    return q.select(
        "event_id",
        (F.sum("cents").over(wt.rowsBetween(W.unboundedPreceding, 0))
         .cast("double") / 100.0).alias("running_sum"),
        (F.floor(mov * 10000.0 + 0.5) / 10000.0).alias("mov_avg4"),
        F.rank().over(wv).cast("bigint").alias("rnk"),
        F.dense_rank().over(wv).cast("bigint").alias("drnk"),
        F.ntile(4).over(wq).cast("bigint").alias("quartile"),
    )


#: hll_cube_range's query window (the events table spans Jan 2024); a
#: half-open 7-day range so hour buckets nest exactly into day buckets
HLL_CUBE_START = "2024-01-08 00:00:00"
HLL_CUBE_END = "2024-01-15 00:00:00"


@register(
    "hll_cube_range",
    oracle=f"""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT user_id) AS exact_users,
           CAST(1 AS BIGINT) AS within_bound
    FROM events
    WHERE ts >= TIMESTAMP '{HLL_CUBE_START}' AND ts < TIMESTAMP '{HLL_CUBE_END}'
    GROUP BY 1
    """,
    description="Range dashboard query answered from the mergeable HLL "
                "distinct-count cube (operators/hll_cube.py): one "
                "DataSketches HLL sketch per hour bucket, rolled up to "
                "days by sketch UNION (lossless re-aggregation -- the raw "
                "rows are scanned once to build the cube, never per zoom "
                "level; at scale the cube is the stored table and range "
                "predicates prune its date partitions). A sketch estimate "
                "cannot hash-match an oracle, so the query carries the "
                "approx_distinct_ips contract: it joins the exact per-day "
                "distinct count (broadcast) and emits within_bound = "
                "(|estimate - exact| <= 5*rsd*exact, rsd=1.04/sqrt(2^lg_k)); "
                "the DuckDB oracle recomputes the exact side and expects "
                "the bound to hold.",
    tags=("approx", "cube", "timeseries"),
)
def hll_cube_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.hll_cube import (
        DEFAULT_LG_K,
        hourly_distinct_cube,
        reaggregate,
    )

    events = load_table(spark, sf_dir, "events").where(
        (F.col("ts") >= F.lit(HLL_CUBE_START).cast("timestamp"))
        & (F.col("ts") < F.lit(HLL_CUBE_END).cast("timestamp"))
    )
    from ..functions.timestream import bin_

    cube = hourly_distinct_cube(events, "ts", "user_id")
    # epoch-aligned day bins, not date_trunc: tz-independent like the
    # cube's own hour buckets (r11 review); identical under the pinned
    # UTC session
    daily = reaggregate(cube, bin_(F.col("bucket_start"), "1d"), "day")
    est = daily.select(
        "day",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.hll_sketch_estimate("sketch").alias("approx_users"),
    )
    exact = events.groupBy(bin_(F.col("ts"), "1d").alias("day")).agg(
        F.count_distinct("user_id").alias("exact_users")
    )
    rsd = 1.04 / (2 ** (DEFAULT_LG_K / 2.0))
    bound = F.lit(5 * rsd) * F.col("exact_users")
    return est.join(F.broadcast(exact), "day").select(
        "day",
        "n_rows",
        "exact_users",
        F.when(F.abs(F.col("approx_users") - F.col("exact_users")) <= bound, 1)
        .otherwise(0)
        .cast("bigint")
        .alias("within_bound"),
    )


@register(
    "interpolate_locf",
    oracle=f"""
    WITH {_grid_oracle_cte("2023-12-31 20:00:00", "2024-01-04 00:00:00")},
    filled AS (
      SELECT event_type, t, is_grid,
             LAST_VALUE(CASE WHEN is_grid = 0 THEN v END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY t, is_grid, tie
                     ROWS UNBOUNDED PRECEDING) AS locf_v
      FROM merged)
    SELECT event_type, t AS grid_ts,
           FLOOR(locf_v * 10000.0 + 0.5) / 10000.0 AS locf,
           COALESCE(FLOOR(locf_v * 10000.0 + 0.5) / 10000.0, 0.0) AS fill_zero
    FROM filled WHERE is_grid = 1
    """,
    description="Timestream INTERPOLATE_LOCF / INTERPOLATE_FILL analog: "
                "hourly grid per series, last observed value carried "
                "forward (and the constant-fill variant as a second "
                "column for grid points before any observation). Same "
                "union+GROWING-window idiom as interpolate_linear_fill -- "
                "one shuffle per series key, no shrinking frames (Spark's "
                "shrinking-frame processor is O(n^2) per partition), no "
                "per-point scans. Verified by the test suite outside the "
                "50-row driver budget (driver_slot=False).",
    tags=("timeseries", "interpolation"),
    driver_slot=False,
)
def interpolate_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import register_views

    # One spark.sql statement (r18, same treatment as its linear-fill
    # sibling; identical plan node shapes, oracle green at two SFs).
    # FLOOR(x*1e4 + 0.5)/1e4, not ROUND(double, 4): the carried-forward
    # raw value is exactly the repr-tie shape derivative_rate diverged on
    # cross-engine (r11; applied here r13 review)
    register_views(spark, sf_dir)
    locf4 = ("FLOOR(locf_v * CAST(10000.0 AS DOUBLE) "
             "+ CAST(0.5 AS DOUBLE)) / CAST(10000.0 AS DOUBLE)")
    return spark.sql(f"""
        WITH {_grid_spark_sql_cte("2023-12-31 20:00:00",
                                  "2024-01-04 00:00:00")},
        filled AS (
          SELECT event_type, t, is_grid,
                 last(CASE WHEN is_grid = 0 THEN v END, true)
                   OVER (PARTITION BY event_type
                         ORDER BY t ASC, is_grid ASC, tie ASC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS locf_v
          FROM merged)
        SELECT event_type, t AS grid_ts,
               {locf4} AS locf,
               COALESCE({locf4}, CAST(0.0 AS DOUBLE)) AS fill_zero
        FROM filled WHERE is_grid = 1
    """)


# ------------------------------------------------------------ zorder_key

def _zorder_stmt(dialect: str) -> str:
    """One statement for both engines: hour/user dims range-quantized
    onto the ZBITS space via an in-plan one-row bounds relation (lazy --
    no plan-build job), THEN interleaved. Without the quantization,
    hours-since-epoch (~490k) and ids past 65535 alias modulo 2^16 and
    the layout's min/max pruning silently dies (r12 review)."""
    from ..operators.zorder import zorder_key_sql, zorder_quantize_sql

    if dialect == "duck":
        hour = "CAST(floor(epoch(ts)) AS BIGINT) // 3600"
    else:
        hour = "CAST(floor(unix_timestamp(ts) / 3600) AS BIGINT)"
    qh = zorder_quantize_sql("hour_idx", "hmin", "hmax", dialect)
    qu = zorder_quantize_sql("user_id", "umin", "umax", dialect)
    return f"""
    WITH base AS (
      SELECT event_id, CAST({hour} AS BIGINT) AS hour_idx, user_id
      FROM events),
    bounds AS (
      SELECT MIN(hour_idx) AS hmin, MAX(hour_idx) AS hmax,
             MIN(user_id) AS umin, MAX(user_id) AS umax
      FROM base)
    SELECT event_id, hour_idx, user_id,
           CAST({zorder_key_sql(qh, qu)} AS BIGINT) AS zkey
    FROM base CROSS JOIN bounds
    """


@register(
    "zorder_events_key",
    oracle=_zorder_stmt("duck"),
    description="Z-order (Morton-curve) clustering key over (event hour, "
                "user id) -- the bit-interleave that Delta/Iceberg OPTIMIZE "
                "ZORDER BY sorts on. r12: both dimensions RANGE-QUANTIZE "
                "onto the 16-bit interleave space via an in-plan one-row "
                "bounds relation first (hours-since-epoch ~490k and ids "
                "past 65535 used to alias modulo 2^16, silently destroying "
                "the pruning the layout exists for); the quantize + "
                "interleave stay pure integer bit-ops (zero extra "
                "shuffles beyond the broadcast one-row bounds, whole-stage "
                "codegen, no UDF) hash-checked against the identical "
                "arithmetic in DuckDB. operators/zorder.py:zorder_layout "
                "turns the key into the actual layout (one stats pass + "
                "one range-partitioned sort) so BOTH dimensions' parquet "
                "min/max ranges stay tight per file; pruning-effectiveness "
                "is pytest-pinned. Verified by the test suite outside the "
                "50-row driver budget (driver_slot=False).",
    tags=("layout", "pruning"),
    driver_slot=False,
)
def zorder_events_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import register_views

    register_views(spark, sf_dir)
    # floor division in the hour derivation (not `div`, which truncates
    # toward zero): a pre-1970 ts would otherwise produce hour_idx 0 vs
    # -1 across engines (r8 review)
    return spark.sql(_zorder_stmt("spark"))


# ---------------------------------------------------------- heavy_hitters

#: top-K values of the heavy-hitter report and the sketch's error budget
HH_TOPK = 10
HH_EPS = 0.001


@register(
    "heavy_hitters",
    oracle=f"""
    WITH c AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n FROM events
      GROUP BY user_id),
    r AS (
      SELECT user_id, n,
             CAST(ROW_NUMBER() OVER (ORDER BY n DESC, user_id) AS BIGINT)
               AS rnk
      FROM c)
    SELECT user_id, n, rnk, CAST(1 AS BIGINT) AS within_bound
    FROM r WHERE rnk <= {HH_TOPK}
    """,
    description=f"Top-{HH_TOPK} heavy hitters of events.user_id with an "
                "ENFORCED count-min-sketch contract, fully in-query (the "
                "hll_cube_range pattern): the plan also builds the CMS as "
                "a (d, bucket, cnt) RELATION (operators/sketch.py "
                "count_min_relation -- the 100 TB path where an exact "
                "per-value count of a high-cardinality column is a full "
                "shuffle; the relation is model-sized, d*w rows), "
                "broadcasts it back for point estimates, and emits "
                "within_bound = (exact <= estimate <= exact + eps*N) as "
                "a hash-checked column the DuckDB oracle expects to be "
                "1 -- so the Cormode-Muthukrishnan bound is proven on "
                "every execution with NO plan-build-time job (ADVICE r6: "
                "the previous form collect()ed in build()). The exact "
                "top-K itself is one map-side-combined aggregate + "
                "TakeOrdered. Verified by the test suite outside the "
                "50-row driver budget (driver_slot=False).",
    tags=("aggregate", "sketch", "topk"),
    driver_slot=False,
)
def heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import cms_point_estimates, count_min_relation

    events = load_table(spark, sf_dir, "events")
    c = events.groupBy("user_id").agg(F.count("*").cast("bigint").alias("n"))
    w = W.orderBy(F.desc("n"), F.asc("user_id"))
    top = (
        c.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rnk") <= HH_TOPK)
    )
    sketch = count_min_relation(events, "user_id", eps=HH_EPS)
    # stream length N recovered from the sketch itself (SUM of one hash
    # row) -- a one-row broadcast, the sanctioned scalar-NLJ shape
    n_total = sketch.where(F.col("d") == 0).agg(
        F.sum("cnt").alias("n_total")
    )
    est = cms_point_estimates(top, "user_id", sketch, carry=("n", "rnk"))
    return (
        est.crossJoin(F.broadcast(n_total))
        .select(
            "user_id",
            "n",
            "rnk",
            F.when(
                (F.col("n") <= F.col("cms_est"))
                & (F.col("cms_est") <= F.col("n") + F.lit(HH_EPS) * F.col("n_total")),
                1,
            )
            .otherwise(0)
            .cast("bigint")
            .alias("within_bound"),
        )
    )


# ------------------------------------------------------- skew operators

@register(
    "skew_salted_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(l_quantity, 2) AS DECIMAL(28,2))) AS DOUBLE)
             AS qty
    FROM lineitem GROUP BY l_returnflag
    """,
    description="Two-phase salted aggregation (operators/skew.py) proven "
                "lossless through the driver oracle: the partial "
                "(key, salt) -> final (key) decomposition over lineitem "
                "must hash-match the plain GROUP BY -- upgrading the "
                "skew operator from pytest-identity-only coverage. The "
                "salt spreads a hot key over n_salts reducers; decimal "
                "sums stay exact through both phases, so the rewrite is "
                "bit-lossless, not approximately equal. Verified by the "
                "test suite outside the 50-row driver budget "
                "(driver_slot=False).",
    tags=("aggregate", "skew"),
    driver_slot=False,
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import two_phase_agg

    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "q_dec", F.round("l_quantity", 2).cast("decimal(28,2)")
    )
    out = two_phase_agg(
        li, "l_returnflag",
        {"n": "count:", "qty": "sum:q_dec"},
    )
    return out.select(
        "l_returnflag",
        F.col("n").cast("bigint").alias("n"),
        F.col("qty").cast("double").alias("qty"),
    )


@register(
    "skew_salted_join",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    description="Salted equi-join (operators/skew.py) proven lossless "
                "through the driver oracle: the large side salts "
                "deterministically, the small side replicates n_salts "
                "times, the join runs on (key, salt), and the aggregated "
                "result must hash-match the plain join -- the layout "
                "change cannot alter semantics. For streaming or "
                "AQE-unavailable paths where runtime skew splitting "
                "cannot help. Promoted to the driver registry r10 (slot "
                "from pivot_status_by_priority): skew is the classic "
                "100x-scale failure mode and the skew family had no "
                "driver row.",
    tags=("join", "skew"),
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_join

    # key-only projection: salted_join salts by ROW POSITION
    # (monotonically_increasing_id, r8), so a hot key fans out over
    # n_salts reducers regardless of which columns ride along -- the
    # old "keep o_orderkey so the row-hash salt varies" rationale
    # described the r7 row-hash salt and went stale (r11 review)
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    joined = salted_join(orders, cust, "o_custkey", n_salts=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").cast("bigint").alias("n_orders")
    )

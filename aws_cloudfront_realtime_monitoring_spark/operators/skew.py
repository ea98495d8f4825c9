"""Skew-handling utilities: salted joins and two-phase aggregation.

AQE's skew-join splitting (on by default in our sessions) handles most skew
at runtime; these explicit operators are for the cases AQE can't fix --
a single pathological key in an aggregation, or a join whose skewed-side
split AQE's size heuristics miss. (NOT streaming: the position salt below
uses monotonically_increasing_id, which catalyst's
UnsupportedOperationChecker rejects on streaming DataFrames -- the old
docstring's streaming claim was wrong, r11 review.)

Semantics are identity-preserving: results equal the unsalted equivalents
(asserted in tests/test_skew.py); only the shuffle layout changes.

PRECONDITION (r11 review): the salted side must come from a
DETERMINISTIC split -- a file scan or a barriered (checkpointed/
persisted-and-materialized) relation. monotonically_increasing_id is
stable under task retry only when each partition replays identical rows
in identical order; feeding the LIVE output of an upstream shuffle means
a partial stage retry can reassign salts and silently duplicate or drop
rows (Spark does not mark such stages indeterminate). Content-hash
salting would dodge that but collapses identical hot-key rows onto ONE
salt -- zero spread in exactly the pathological case (r8 review), so the
position salt + precondition is the deliberate trade.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: 1-in-SALT_SAMPLE_MOD deterministic row sample behind the auto-salt
#: skew probe (the hot-key SHARE estimate only needs the heavy keys,
#: which a 1/64 sample sees thousands of times at any scale where
#: salting matters)
SALT_SAMPLE_MOD = 64

#: auto-salt ceiling: past ~64 salts the small-side replication term
#: dominates every realistic makespan (the r14 sweep measured n=32
#: already inverting at |small| = N/5), and the model would only pick
#: values here under degenerate inputs (tiny P with one giant key)
SALT_CAP = 64


def derived_salt_params(
    large: DataFrame,
    key: str,
    small: DataFrame,
    parallelism: int | None = None,
) -> DataFrame:
    """One-row ``(n_salts INT)`` params relation derived IN-QUERY from
    the observed skew — the ``_near_dup_params`` pattern (r14 verdict
    #4: the fixed ``n_salts`` knob is a measured footgun — 8 won the
    r14 sweep 1.37x/2.6x while 32 inverted to 3x WORSE through
    small-side replication).

    Makespan model: salting the hot key over ``n`` tasks leaves a
    straggler of ``hot/n`` rows while adding ``n * |small|`` replicated
    rows to the total work spread over ``P`` cores, so the makespan is
    ``max(hot/n, (N + n*S)/P)``; the balance point is the positive root
    of ``S*n^2 + N*n - P*hot = 0``:

        n* = (-N + sqrt(N^2 + 4*S*P*hot)) / (2*S)

    On the r14 sweep corpus (N=10M, S=2M, P=32, hot=5M) this yields
    6.8 -> 7, next to the measured optimum 8 and far from the measured
    inversion at 32. ``hot`` is estimated as (sampled hot-key share) *
    N from a deterministic 1-in-64 row sample (share is what the model
    needs; the sample rate cancels), so the pre-pass shuffles only the
    sample's map-side per-key partials. Clamped to [1, SALT_CAP]; an
    empty sample or unskewed data derives n=1 (salting disabled — the
    plain plan is already balanced). ``parallelism`` defaults to the
    session's ``spark.sql.shuffle.partitions``.

    Same PRECONDITION as ``_position_salt`` (the sample filter rides
    ``monotonically_increasing_id``): the large side must be a
    deterministic split."""
    if parallelism is None:
        parallelism = int(
            large.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    samp = large.where(
        F.pmod(F.xxhash64(F.monotonically_increasing_id()),
               F.lit(SALT_SAMPLE_MOD)) == 0)
    # ONE pass over the large side: share AND the size estimate both
    # come from the sample (n_large = sample total * MOD is unbiased;
    # the r15 sweep measured the separate exact count as a whole extra
    # scan per execution -- the probe should cost one sampled pass)
    share = (
        samp.groupBy(key).count()
        .agg((F.max("count") / F.sum("count")).alias("share"),
             (F.coalesce(F.sum("count"), F.lit(0))
              * SALT_SAMPLE_MOD).alias("n_large"))
    )
    n_small = small.agg(
        F.greatest(F.count(F.lit(1)), F.lit(1)).alias("n_small"))
    return (
        share.crossJoin(n_small)
        .select(
            F.least(
                F.lit(SALT_CAP),
                F.greatest(
                    F.lit(1),
                    F.ceil(
                        (-F.col("n_large") + F.sqrt(
                            F.col("n_large") * F.col("n_large")
                            + 4.0 * F.col("n_small") * parallelism
                            * F.coalesce(F.col("share"),
                                         F.lit(1.0 / parallelism))
                            * F.col("n_large")
                        )) / (2.0 * F.col("n_small"))
                    ).cast("int"),
                ),
            ).alias("n_salts")
        )
    )


def _position_salt(n_salts: int) -> Column:
    """The ONE salt spelling (r13 review: salted_join and two_phase_agg
    carried verbatim copies). Row-POSITION salt, not a content hash:
    identical hot-key rows all hash to ONE salt value -- zero spread in
    exactly the pathological case these operators exist for -- and
    F.hash rejects map columns (r8 review). monotonically_increasing_id
    is per-row-unique for a deterministic input split; any salt
    assignment is correct (joins replicate the small side across every
    salt; the agg decomposition is assignment-independent)."""
    return F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salts))


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int | str = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``large`` has skewed keys: the large side gets a
    deterministic per-row salt, the small side is replicated ``n_salts``
    times, and the join key becomes (key, salt) -- the hot key's rows spread
    over ``n_salts`` partitions instead of one straggler task.

    Cost model: small side inflates n_salts x (it should be small or already
    broadcastable -- salting matters when it is *too big to broadcast* but
    far smaller than the large side).

    Choosing ``n_salts`` (measured crossover rule, SCALE.md's auto-salt
    sweep): pass ``"auto"`` whenever the join dwarfs one sampled scan of
    its large side -- true for every join this operator exists for; the
    derived count landed inside or beat the hand-tuned optimum band at
    both measured skew ratios, while a hand-pinned count measurably
    inverts past the contention knee (n=32 was 2.3x worse than derived
    at 50% skew). Hand-pin only sub-second joins, where the probe's one
    sampled pass (~0.6 s at sf0.1) is not amortized::

        salted_join(facts, dims, "k", n_salts="auto")   # the default choice
        salted_join(tiny, dims, "k", n_salts=4)         # sub-second join

    Only join types that never emit unmatched SMALL-side rows are valid:
    for right/full outer joins the n_salts small-side replicas would each
    surface as an unmatched output row (duplicates), so they are rejected.
    """
    # no 'cross': this operator always joins on (key, __salt), and Spark
    # treats a cross join with a condition as inner -- accepting it would
    # promise cartesian semantics the salted form can never deliver
    auto = isinstance(n_salts, str)
    if auto and n_salts != "auto":
        raise ValueError(
            f"salted_join: n_salts must be an int or 'auto', got {n_salts!r}")
    if not auto and n_salts < 1:
        # pmod(hash, 0) is NULL under non-ANSI SQL: every large-side row
        # would carry a NULL salt that equals no replica's, and an inner
        # join silently returns ZERO rows (r12 review) -- surface the
        # sizing bug instead
        raise ValueError("salted_join: n_salts must be >= 1")
    if "__salt" in large.columns or "__salt" in small.columns:
        # withColumn would silently REPLACE the caller's column and the
        # final drop would remove it from the output (r12 review)
        raise ValueError("salted_join: input already has a __salt column")
    supported = {"inner", "left", "left_outer", "left_semi", "left_anti",
                 "leftsemi", "leftanti", "semi", "anti"}
    if how.lower().replace("_", "") not in {s.replace("_", "") for s in supported}:
        raise ValueError(
            f"salted_join does not support how={how!r}: cross has no "
            "cartesian meaning under the (key, salt) equi-join, and "
            "unmatched small-side rows of right/full outer joins would be "
            "replicated n_salts times (use a plain join or AQE skew "
            "handling for those)"
        )
    if auto and ("n_salts" in large.columns or "n_salts" in small.columns):
        # the params crossJoin would make the column reference ambiguous
        raise ValueError(
            "salted_join: n_salts='auto' needs the column name 'n_salts' "
            "free on both inputs (rename it or pass an explicit count)")
    if auto:
        # n_salts = 'auto' (r15): the one-row skew-derived params
        # relation rides a broadcast into BOTH sides — the same
        # in-query pattern as _near_dup_params, zero plan-build-time
        # jobs, and the salt count can never be hand-mistuned into the
        # measured n=32 replication inversion
        params = F.broadcast(derived_salt_params(large, key, small))
        salted_large = large.crossJoin(params).withColumn(
            "__salt",
            F.pmod(F.hash(F.monotonically_increasing_id()),
                   F.col("n_salts")),
        ).drop("n_salts")
        salted_small = small.crossJoin(params).withColumn(
            "__salt",
            F.explode(F.sequence(F.lit(0), F.col("n_salts") - 1)),
        ).drop("n_salts")
    else:
        salted_large = large.withColumn("__salt", _position_salt(n_salts))
        salted_small = small.withColumn(
            "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
        )
    out = salted_large.join(salted_small, on=[key, "__salt"], how=how)
    return out.drop("__salt")


def two_phase_agg(
    df: DataFrame,
    key: str,
    agg_exprs: dict[str, str],
    n_salts: int = 8,
) -> DataFrame:
    """Aggregation with a skewed group key, split into partial (key, salt)
    then final (key) phases so no single reducer owns the hot key.

    ``agg_exprs`` maps output column -> one of 'sum'/'count'/'min'/'max'
    over an input column (``count`` takes any column). Decomposable
    aggregates only -- that is what makes two-phase valid.

    DESCOPED (r15, both hypothesized domains measured null --
    SCALE.md "two_phase_agg's last hypothesized domain measured"):
    (1) r14: for decomposable aggregates Spark's hash aggregate already
    collapses a hot group key to ONE row per input partition map-side
    (plain 0.74 s vs 1.05 s at a 50%-hot key); (2) r15: for exact
    distinct -- the large-partial-state case this operator was kept
    for -- Spark's own distinct-aggregate rewrite spreads the hot key
    through its (key, value)-keyed partial (plain countDistinct 1.20 s
    vs explicit two-phase 1.24 s at ~1e6 distinct values under the hot
    key). A salted (key, salt) countDistinct is not even valid (values
    spread across salts double-count). The operator remains as an
    explicit, lossless-pinned two-phase building block for pipelines
    whose upstream stage has destroyed map-side partial aggregation;
    it carries no measured performance win on any path Spark plans
    natively.
    """
    if n_salts < 1:
        raise ValueError("two_phase_agg: n_salts must be >= 1")
    partial_aggs, final_aggs = [], []
    for out_col, spec in agg_exprs.items():
        fn, _, in_col = spec.partition(":")
        p = f"__p_{out_col}"
        if fn in ("sum", "min", "max") and not in_col:
            # 'sum' without ':col' would reach F.sum('') and die later
            # with an opaque unresolved-column AnalysisException instead
            # of this function's own contract error (r12 review)
            raise ValueError(
                f"aggregate {spec!r} needs an input column: '{fn}:<col>'")
        if fn == "count":
            partial_aggs.append(F.count(in_col or "*").alias(p))
            final_aggs.append(F.sum(p).alias(out_col))
        elif fn == "sum":
            partial_aggs.append(F.sum(in_col).alias(p))
            final_aggs.append(F.sum(p).alias(out_col))
        elif fn == "min":
            partial_aggs.append(F.min(in_col).alias(p))
            final_aggs.append(F.min(p).alias(out_col))
        elif fn == "max":
            partial_aggs.append(F.max(in_col).alias(p))
            final_aggs.append(F.max(p).alias(out_col))
        else:
            raise ValueError(f"non-decomposable aggregate: {spec!r}")
    # df-dependent checks AFTER the spec validation: the contract errors
    # above must fire even on a placeholder frame
    if "__salt" in df.columns:
        raise ValueError("two_phase_agg: input already has a __salt column")
    partial = (
        df.withColumn("__salt", _position_salt(n_salts))
        .groupBy(key, "__salt").agg(*partial_aggs)
    )
    return partial.groupBy(key).agg(*final_aggs)

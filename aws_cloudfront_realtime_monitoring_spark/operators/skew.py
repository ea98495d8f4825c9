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
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``large`` has skewed keys: the large side gets a
    deterministic per-row salt, the small side is replicated ``n_salts``
    times, and the join key becomes (key, salt) -- the hot key's rows spread
    over ``n_salts`` partitions instead of one straggler task.

    Cost model: small side inflates n_salts x (it should be small or already
    broadcastable -- salting matters when it is *too big to broadcast* but
    far smaller than the large side).

    Only join types that never emit unmatched SMALL-side rows are valid:
    for right/full outer joins the n_salts small-side replicas would each
    surface as an unmatched output row (duplicates), so they are rejected.
    """
    # no 'cross': this operator always joins on (key, __salt), and Spark
    # treats a cross join with a condition as inner -- accepting it would
    # promise cartesian semantics the salted form can never deliver
    if n_salts < 1:
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

    MEASURED CAVEAT (r14 skew drive, SCALE.md): for exactly these
    decomposable aggregates Spark's hash aggregate already collapses a
    hot group key to ONE row per input partition map-side, so at 10M
    rows with a 50%-hot key the plain groupBy beat this operator
    (0.74 s vs 1.05 s -- the salt phase only adds a shuffle). Reach for
    it when map-side partial aggregation is unavailable or its state is
    large (e.g. upstream of a collect-like or exact-distinct rewrite),
    not for plain sum/count/min/max on a skewed key.
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

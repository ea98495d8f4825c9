"""Count-min-sketch frequency estimation — approximate heavy-hitters over
arbitrarily large columns in one pass.

The reference's monitoring surface counts records per dimension
(lambda_function.py:64,119; Timestream COUNT per dimension); at 100 TB an
exact per-value count of a high-cardinality column (IPs, URIs, user
agents) is a full shuffle of every distinct value. The count-min sketch
answers point-frequency queries from a fixed-size summary instead:
``d = ceil(log2(1/(1-confidence)))`` rows of ``w = ceil(2/eps)``
counters (log base 2: with ``w = 2/eps`` each hash row violates the
bound with probability <= 1/2 by Markov, so d rows drive the failure
probability to ``(1/2)^d`` -- Spark's own CountMinSketchImpl uses the
same formula; r11 review caught this module using ``ln``, which
under-provisioned depth ~3x against the advertised confidence),
built by Spark's JVM-side ``count_min_sketch`` aggregate — one narrow
pass, partial sketches merged across partitions (the aggregate is
mergeable by construction), NOTHING shuffles but the sketches themselves.

The guarantee (Cormode & Muthukrishnan 2005): ``exact <= estimate`` always
(counters only over-count on hash collisions), and
``estimate <= exact + eps * N`` with probability >= ``confidence`` per
query, where N is the stream length. Both sides are asserted in
tests/test_sketch.py against exact groupBy counts.

The sketch handle lives on the driver by design — like the k-means model
state (operators/kmeans.py), it is a bounded-size model artifact
(w x d counters, independent of data volume), not a data relation.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class CountMinSketchHandle:
    """Driver-side handle over a built sketch: point estimates + merge."""

    def __init__(self, jsketch):
        self._j = jsketch

    def estimate(self, value) -> int:
        return int(self._j.estimateCount(value))

    def total(self) -> int:
        return int(self._j.totalCount())

    def merge(self, other: "CountMinSketchHandle") -> "CountMinSketchHandle":
        """In-place merge (the distributive property that makes the sketch
        shard-parallel: sketch(A ∪ B) == merge(sketch(A), sketch(B)))."""
        self._j.mergeInPlace(other._j)
        return self

    @property
    def depth(self) -> int:
        return int(self._j.depth())

    @property
    def width(self) -> int:
        return int(self._j.width())


def build_count_min(
    df: DataFrame,
    col: str,
    eps: float = 0.0001,
    confidence: float = 0.99,
    seed: int = 42,
) -> CountMinSketchHandle:
    """One-pass sketch of ``df[col]``'s value frequencies.

    ``eps`` bounds the additive overestimate (``eps * N``); ``confidence``
    the per-query probability that bound holds. Runs as a single JVM
    aggregate (no Python in the path); the returned handle holds the
    deserialized sketch for driver-side point queries.
    """
    spark = df.sparkSession
    # fail fast BEFORE the aggregate job: the handle deserializes via the
    # py4j JVM gateway, which Spark Connect sessions do not expose (the
    # rest of this package stays on public DataFrame APIs and is
    # Connect-clean; this one driver-side model handle is the exception)
    try:
        jvm = spark.sparkContext._jvm
    except Exception as exc:
        raise NotImplementedError(
            "build_count_min needs a classic (JVM-gateway) SparkSession to "
            "deserialize the sketch handle; Spark Connect sessions expose "
            "no sparkContext/_jvm. Run the aggregate yourself with "
            "F.count_min_sketch(...) and decode the stable CountMinSketch "
            "binary format driver-side if Connect support is required."
        ) from exc
    raw = df.select(
        F.count_min_sketch(
            col, F.lit(float(eps)), F.lit(float(confidence)), F.lit(int(seed))
        ).alias("sketch")
    ).head()[0]
    return CountMinSketchHandle(
        jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bytes(raw))
    )


# -------------------------------------------------- relational CMS
#
# The driver-handle form above answers point queries on the DRIVER; the
# relational form below keeps the whole sketch lifecycle inside the engine
# (build -> store -> estimate are all DataFrame ops, fully lazy), so a
# query can carry its own enforced accuracy contract without a
# plan-build-time collect (ADVICE r6: builders should not execute jobs).
# The sketch IS a relation of (d, bucket, cnt) rows -- bounded by the
# model size d*w, never by data volume -- exactly the shape you would
# persist as a sketch table at 100 TB and broadcast back for estimates.

def cms_width(eps: float) -> int:
    """Spark's convention: w = ceil(2/eps) counters per row."""
    if not 0 < eps < 1:
        # surface the contract instead of ZeroDivisionError / a
        # zero-width sketch (r13 review; the JVM CountMinSketch
        # validates the same bounds with a readable message)
        raise ValueError(f"cms eps must be in (0, 1), got {eps}")
    return int(math.ceil(2.0 / eps))


def cms_depth(confidence: float) -> int:
    """d = ceil(log2(1/(1-confidence))) independent hash rows (each row
    fails its Markov bound with probability <= 1/2 at w = 2/eps, so the
    base is 2 -- Spark's CountMinSketchImpl convention; ln gave d=5
    instead of 7 at confidence 0.99, r11 review)."""
    if not 0 < confidence < 1:
        raise ValueError(
            f"cms confidence must be in (0, 1), got {confidence}")
    return max(1, int(math.ceil(math.log2(1.0 / (1.0 - confidence)))))


def _cms_bucket(value_col, depth_col, width_col, seed_col):
    """Bucket of ``value`` under hash row ``depth``: xxhash64 seeded per
    row via the hashed-in depth term (d distinct hash functions). The
    term is pinned to INT: xxhash64 hashes by TYPE, so a build-side
    int literal and a probe-side BIGINT metadata column would otherwise
    bucket the same value differently."""
    return F.pmod(
        F.xxhash64(value_col.cast("string"),
                   (depth_col + seed_col).cast("int")),
        width_col,
    )


def count_min_relation(
    df: DataFrame,
    col: str,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
) -> DataFrame:
    """Build the sketch as a ``(d, bucket, cnt, w, depth, seed)`` relation.

    One narrow pass over ``df``: each value fans out to its ``d`` hash
    rows (map-side combine collapses the fan-out to at most ``d*w`` rows
    per partition before the shuffle), then a bounded ``d*w``-row
    aggregate. ``SUM(cnt) WHERE d = 0`` recovers the stream length N.
    The (w, depth, seed) parameters ride along as constant columns so
    the ESTIMATE side derives them from the sketch itself (r11 review:
    probing with mismatched eps/seed used to return silent zeros for
    present keys -- the parameter mismatch is now impossible by
    construction)."""
    w, d = cms_width(eps), cms_depth(confidence)
    return (
        df.select(F.col(col).alias("_v"))
        .select("_v", F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("d"))
        .groupBy(
            "d",
            _cms_bucket(
                F.col("_v"), F.col("d"), F.lit(w), F.lit(seed)
            ).alias("bucket"),
        )
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .withColumn("w", F.lit(w).cast("bigint"))
        .withColumn("depth", F.lit(d).cast("bigint"))
        .withColumn("seed", F.lit(int(seed)).cast("bigint"))
    )


def cms_point_estimates(
    keys: DataFrame,
    key_col: str,
    sketch: DataFrame,
    carry: tuple = (),
) -> DataFrame:
    """Point-frequency estimates for every row of ``keys``:
    ``est = min over d of cnt[h_d(key)]`` (missing bucket = 0). Every
    sketch parameter (w, depth, seed) comes FROM the sketch relation via
    a one-row broadcast, so probes can never hash against different
    dimensions than the sketch was built with. The sketch relation
    broadcasts (model-sized, <= d*w rows); the keys never shuffle.
    ``carry`` columns of ``keys`` ride along so the caller needs no
    re-join against a recomputed ``keys`` plan. Grouping is on
    (key, *carry), so distinct (key, carry) input rows each produce an
    output row -- duplicate key values with IDENTICAL carry collapse to
    one row (estimates are per-key, so nothing is lost). Returns
    ``(key_col, *carry, cms_est)``. Lazy end to end."""
    params = F.broadcast(
        sketch.groupBy().agg(
            # an EMPTY sketch (zero-row build input) leaves first() all
            # NULL, and a NULL depth would null out sequence() and
            # silently DROP every probe key (r11 advice). Placeholder
            # params are exactly correct there: with zero sketch rows
            # every bucket lookup misses and every key estimates 0 --
            # what an empty stream's frequencies are.
            F.coalesce(F.first("w"), F.lit(1)).cast("bigint").alias("w"),
            F.coalesce(F.first("depth"), F.lit(1)).cast("bigint")
            .alias("depth"),
            F.coalesce(F.first("seed"), F.lit(0)).cast("bigint")
            .alias("seed"),
        )
    )
    probes = (
        keys.select(F.col(key_col).alias("_k"), *[F.col(c) for c in carry])
        .crossJoin(params)
        .select(
            "_k", *carry, "w", "seed",
            F.explode(
                F.sequence(F.lit(0), (F.col("depth") - 1).cast("int"))
            ).alias("d"),
        )
        .withColumn(
            "bucket",
            _cms_bucket(F.col("_k"), F.col("d"), F.col("w"), F.col("seed")),
        )
        .drop("w", "seed")
    )
    return (
        probes.join(
            F.broadcast(sketch.select("d", "bucket", "cnt")),
            ["d", "bucket"], "left",
        )
        .groupBy("_k", *carry)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cms_est"))
        .withColumnRenamed("_k", key_col)
    )

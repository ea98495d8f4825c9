"""Count-min-sketch frequency estimation — approximate heavy-hitters over
arbitrarily large columns in one pass.

The reference's monitoring surface counts records per dimension
(lambda_function.py:64,119; Timestream COUNT per dimension); at 100 TB an
exact per-value count of a high-cardinality column (IPs, URIs, user
agents) is a full shuffle of every distinct value. The count-min sketch
answers point-frequency queries from a fixed-size summary instead:
``d = ceil(ln(1/(1-confidence)))`` rows of ``w = ceil(2/eps)`` counters,
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

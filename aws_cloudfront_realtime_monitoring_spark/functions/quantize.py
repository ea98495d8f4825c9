"""THE embedding quantization convention (one spelling, r8 review):
floats scale by 1e6 and round half-away-from-zero to exact int64, so dot
products and norms are exact integer sums in Spark, DuckDB, and numpy
alike -- the bit-compatibility contract the ANN/kmeans/semdedup paths
rely on. plans.similarity and operators.kmeans both import from here;
editing the scale or rounding in one place updates every consumer.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

QUANT = 1_000_000


def qvec(col: Column | str = "embedding") -> Column:
    """float array -> exact int64 array (round half away from zero,
    matching both engines' ROUND)."""
    return F.transform(
        col, lambda x: F.round(x.cast("double") * QUANT, 0).cast("bigint")
    )


def qvec_numpy(arr):
    """The NUMPY replica of :func:`qvec` -- half-AWAY-FROM-ZERO like
    Spark/DuckDB ROUND. ``np.round`` is half-to-EVEN and silently
    diverges by 1 on any component whose scaled value lands exactly on
    .5 (r11 review: the test replicas used np.round, a latent flake
    hidden only by corpora that avoid exact halves). Tests replicating
    the quantization must use this, never np.round."""
    import numpy as np

    scaled = np.asarray(arr, dtype=np.float64) * QUANT
    # int64, not the float64 sign*floor produces: dtype-sensitive
    # replicas (byte-exact packing, np.array_equal with dtype checks)
    # must see the BIGINT the Spark/DuckDB side carries (r12 review)
    return (np.sign(scaled) * np.floor(np.abs(scaled) + 0.5)).astype(np.int64)

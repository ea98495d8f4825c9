"""Z-order (Morton-curve) data layout for multi-dimensional scan pruning.

At 100 TB the cheapest query is the one that never reads the file: parquet
row-group min/max statistics prune scans, but they only help along the
physical sort order. Sorting by a Z-ORDER KEY -- the bit-interleave of two
(or more) quantized dimensions -- clusters rows so that BOTH dimensions'
min/max ranges stay tight in every file, the same layout technique
Delta/Iceberg expose as ``OPTIMIZE ... ZORDER BY``. The key itself is pure
integer arithmetic (shifts, masks, adds), engine-portable and therefore
DuckDB-oracle-checkable like every other operator here.

Scale posture: computing the key is a zero-shuffle narrow map; laying out
by it is one range-partitioned sort (``repartitionByRange(zkey) +
sortWithinPartitions``) -- the exact shuffle a time-partition layout
already pays, just on a better key. Nothing here is driver-side.

Like production ``ZORDER BY``, the interleave only clusters well when the
quantized dimensions have comparable bit-widths -- rank-quantize (or
scale) a narrow-domain column into the ZBITS space before interleaving,
or its bits contribute nothing and the layout degenerates to a sort on
the wider dimension alone (pytest pins this property on uniform dims).

The interleave loop unrolls to a fixed expression tree (``ZBITS`` pairs of
shift/mask/or), so Catalyst sees plain bit ops inside whole-stage codegen
-- no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits kept per dimension; 2*ZBITS must fit a signed BIGINT (63)
ZBITS = 16
_MASK = (1 << ZBITS) - 1


def zorder_key(a: Column, b: Column) -> Column:
    """Morton interleave of two non-negative ints quantized to ZBITS bits:
    bit i of ``a`` lands at position 2i, bit i of ``b`` at 2i+1.

    Inputs cast to BIGINT first: shiftleft keeps the input column's type,
    so an IntegerType ``b`` would overflow at bit 15 (1 << 31 = INT_MIN,
    a negative Morton key that breaks the layout sort -- r7 code-review
    finding, pinned by the int-column round-trip test)."""
    a = a.cast("long").bitwiseAND(F.lit(_MASK))
    b = b.cast("long").bitwiseAND(F.lit(_MASK))
    out = F.lit(0).cast("long")
    for i in range(ZBITS):
        out = (
            out
            + F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return out


def zorder_key_sql(a: str, b: str) -> str:
    """The identical interleave as portable SQL (Spark and DuckDB both
    parse this spelling: &, >>, <<, + over BIGINTs)."""
    terms = []
    # each term FULLY parenthesized: in Postgres-style grammars (DuckDB),
    # `+` binds tighter than `<<`, so `x << 0 + y << 1` would parse as
    # `x << (0 + y) << 1` -- an overflow, not an interleave
    for i in range(ZBITS):
        # CAST ... AS BIGINT mirrors the Column variant's overflow guard
        terms.append(
            f"((((CAST(({a}) AS BIGINT) & {_MASK}) >> {i}) & 1) << {2 * i})"
        )
        terms.append(
            f"((((CAST(({b}) AS BIGINT) & {_MASK}) >> {i}) & 1) << {2 * i + 1})"
        )
    return "(" + " + ".join(terms) + ")"


def zorder_decode(z: int) -> tuple[int, int]:
    """Python-side inverse (tests): recover (a, b) from the Morton key."""
    a = b = 0
    for i in range(ZBITS):
        a |= ((z >> (2 * i)) & 1) << i
        b |= ((z >> (2 * i + 1)) & 1) << i
    return a, b


def zorder_layout(df: DataFrame, a: Column, b: Column,
                  partitions: int | None = None) -> DataFrame:
    """Cluster ``df`` along the Morton curve of (a, b): one range shuffle
    + in-partition sort, after which BOTH dimensions' per-file min/max
    ranges are tight (write the result with any parquet writer)."""
    if partitions is not None and partitions < 1:
        # a computed count that underflowed to 0 used to fall through
        # the falsy check and silently take the default partitioning
        # (r11 review): surface the sizing bug instead
        raise ValueError("zorder_layout: partitions must be >= 1 or None")
    keyed = df.withColumn("__z", zorder_key(a, b))
    ranged = (
        keyed.repartitionByRange(partitions, "__z")
        if partitions is not None
        else keyed.repartitionByRange("__z")
    )
    return ranged.sortWithinPartitions("__z").drop("__z")

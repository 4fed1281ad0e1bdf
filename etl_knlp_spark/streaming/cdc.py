"""Streaming change-data-capture apply: a stream of change records
(upserts + deletes, ordered by a sequence column) continuously merged
into a parquet target via ``foreachBatch``.

This is the streaming half of operators/mutate.py: Structured
Streaming owns delivery (checkpointed offsets → each micro-batch is
processed once even across restarts) and the batch handler owns
idempotent apply (latest-wins on the sequence column, so replaying a
batch after a crash-before-checkpoint converges to the same state —
at-least-once delivery + idempotent merge = effectively exactly-once).

At 100 TB: each micro-batch is tiny relative to the target, so the
merge's anti-join broadcasts the batch; with a table format
(Delta/Iceberg) the rewrite collapses to a native MERGE INTO + the
same checkpointing. The parquet full-rewrite here is the
environment's emulation, not the design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from ..catalog import load_table
from ..registry import query


def compact_changes(changes: DataFrame, key: str, seq: str) -> DataFrame:
    """Collapse a change batch to one row per key: highest sequence
    wins (ties broken by the op column to keep the reduction total).
    Must run BEFORE merge — applying two same-key changes from one
    batch in arbitrary order is the classic CDC correctness bug."""
    w = Window.partitionBy(key).orderBy(F.col(seq).desc(), F.col("op").desc())
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def apply_cdc_batch(
    target: DataFrame, changes: DataFrame, key: str, seq: str
) -> DataFrame:
    """One idempotent CDC merge: compact the batch, drop target rows
    whose key appears in it, then insert the batch's surviving upserts
    (op='d' rows delete by simply not being re-inserted). Latest-wins
    on ``seq`` also against the TARGET row, so replaying an
    already-applied batch is a no-op."""
    c = compact_changes(changes, key, seq)
    # a change older than what the target already holds must lose
    newer = c.join(
        target.select(F.col(key), F.col(seq).alias("__tseq")), key, "left"
    ).filter(F.col("__tseq").isNull() | (F.col(seq) >= F.col("__tseq")))
    data_cols = [f for f in target.columns]
    untouched = target.join(newer.select(key), key, "left_anti")
    inserts = newer.filter(F.col("op") != "d").select(*data_cols)
    return untouched.unionByName(inserts)


def run_cdc_stream(
    spark: SparkSession,
    changes_stream: DataFrame,
    target_path: str,
    key: str,
    seq: str,
    checkpoint: str,
) -> None:
    """Drive the CDC apply as a real stream: checkpointed foreachBatch,
    availableNow (drain what exists, then stop — swap for a continuous
    trigger in production). Each batch reads the current target,
    merges, and atomically swaps in the rewrite."""

    def handle(batch: DataFrame, batch_id: int) -> None:
        s = batch.sparkSession
        target = s.read.parquet(target_path)
        merged = apply_cdc_batch(target, batch, key, seq)
        tmp = f"{target_path}__stage_{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        # atomic-enough swap for the parquet emulation: re-point by
        # rewriting the target from the staged copy (a table format
        # makes this a metadata commit)
        s.read.parquet(tmp).write.mode("overwrite").parquet(target_path)

    (
        changes_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


@query(
    "cdc_merge",
    oracle="""
    WITH target AS (
      SELECT c_custkey AS id, c_acctbal AS val, CAST(0 AS BIGINT) AS seq
      FROM customer
    ), changes AS (
      SELECT o_custkey AS id, o_totalprice AS val,
             CAST(o_orderkey AS BIGINT) AS seq,
             CASE WHEN o_orderkey % 7 = 0 THEN 'd' ELSE 'u' END AS op
      FROM orders
    ), compacted AS (
      SELECT id, val, seq, op FROM (
        SELECT *, row_number() OVER (
          PARTITION BY id ORDER BY seq DESC, op DESC) AS rn
        FROM changes
      ) WHERE rn = 1
    ), newer AS (
      SELECT c.id, c.val, c.seq, c.op FROM compacted c
      LEFT JOIN target t ON c.id = t.id
      WHERE t.seq IS NULL OR c.seq >= t.seq
    )
    SELECT t.id, t.val, t.seq FROM target t
    WHERE NOT EXISTS (SELECT 1 FROM newer n WHERE n.id = t.id)
    UNION ALL
    SELECT id, val, seq FROM newer WHERE op <> 'd'
    """,
)
def cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One CDC merge over TPC-H-derived changes: `customer` is the
    target (seq 0), every order becomes a change record for its
    customer (seq = o_orderkey, delete when o_orderkey % 7 = 0), so
    the batch exercises compaction (multi-order customers), updates,
    deletes, and inserts (order custkeys absent from customer would
    insert; all branches of apply_cdc_batch run). Values pass through
    from parquet untouched — bit-identical across engines. Oracle is
    the textbook row_number-compaction + anti-join + union MERGE.
    Ref parity: dag-knlp.py:192-241 loads changes append-only into
    Redshift; this is the latest-wins apply the reference delegates
    to its warehouse."""
    target = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.col("c_acctbal").alias("val"),
        F.lit(0).cast("long").alias("seq"),
    )
    changes = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("id"),
        F.col("o_totalprice").alias("val"),
        F.col("o_orderkey").cast("long").alias("seq"),
        F.when(F.col("o_orderkey") % 7 == 0, F.lit("d"))
        .otherwise(F.lit("u"))
        .alias("op"),
    )
    return apply_cdc_batch(target, changes, "id", "seq")

"""CDC stream apply: upserts/deletes land, latest-wins within a batch,
and replaying the same batch is a no-op (idempotence)."""

import tempfile

from pyspark.sql import functions as F


def _write_changes(spark, d, rows, name):
    spark.createDataFrame(
        rows, "id long, val string, seq long, op string"
    ).write.mode("overwrite").json(f"{d}/{name}")


def test_cdc_stream_applies_and_is_idempotent(spark):
    from etl_knlp_spark.streaming.cdc import apply_cdc_batch, run_cdc_stream

    base = tempfile.mkdtemp(prefix="cdc_")
    target = f"{base}/target"
    spark.createDataFrame(
        [(1, "a", 0, "u"), (2, "b", 0, "u"), (3, "c", 0, "u")],
        "id long, val string, seq long, op string",
    ).write.parquet(target)

    changes_dir = f"{base}/changes"
    _write_changes(
        spark,
        changes_dir,
        [
            (2, "b2", 5, "u"),   # update
            (2, "b1", 3, "u"),   # older same-key change in SAME batch: must lose
            (3, None, 4, "d"),   # delete
            (4, "d0", 2, "u"),   # insert
            (1, "stale", -1, "u"),  # older than target's seq=0: must lose
        ],
        "batch0",
    )
    stream = (
        spark.readStream.schema("id long, val string, seq long, op string")
        .json(f"{changes_dir}/*")  # each batch lands as its own subdir
    )
    run_cdc_stream(spark, stream, target, "id", "seq", f"{base}/ckpt")

    got = {r["id"]: (r["val"], r["seq"]) for r in spark.read.parquet(target).collect()}
    assert got == {1: ("a", 0), 2: ("b2", 5), 4: ("d0", 2)}

    # replay the identical batch straight through the batch handler:
    # state must not change (idempotent merge)
    replay = spark.createDataFrame(
        [(2, "b2", 5, "u"), (3, None, 4, "d"), (4, "d0", 2, "u")],
        "id long, val string, seq long, op string",
    )
    merged = apply_cdc_batch(spark.read.parquet(target), replay, "id", "seq")
    got2 = {r["id"]: (r["val"], r["seq"]) for r in merged.collect()}
    assert got2 == got

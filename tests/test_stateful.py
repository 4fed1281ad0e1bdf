"""applyInPandasWithState: state must accumulate across micro-batches."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_knlp_spark.catalog import load_table
from etl_knlp_spark.streaming.stateful import running_user_totals

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


@pytest.fixture(scope="module")
def multi_file_dir(spark, sf_dir, tmp_path_factory):
    """events split across several JSON files → with maxFilesPerTrigger=1
    the stream processes MULTIPLE micro-batches, so cross-batch state
    is actually exercised."""
    d = str(tmp_path_factory.mktemp("ev"))
    (
        load_table(spark, sf_dir, "events")
        .select("user_id", "value")
        .repartition(4)
        .write.mode("overwrite")
        .json(d)
    )
    return d


def test_running_totals_accumulate_across_batches(spark, sf_dir, multi_file_dir):
    src = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(multi_file_dir)
    )
    q = (
        running_user_totals(src)
        .writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert q.lastProgress["batchId"] >= 2  # proves multiple micro-batches ran

    # the LAST update per user must equal the plain batch aggregate
    out = spark.table("running_totals").toPandas()
    final = out.groupby("user_id").last()
    expected = {
        r["user_id"]: (r["n"], round(r["s"], 6))
        for r in spark.read.schema(SCHEMA)
        .json(multi_file_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    got = {
        uid: (row["n_events"], round(row["total_value"], 6))
        for uid, row in final.iterrows()
    }
    assert got == expected


def test_state_store_reader_matches_stream_beliefs(spark, sf_dir):
    """The statestore batch reader must reconstruct exactly the
    per-key state a finished stateful aggregation committed: run a
    grouped count over a bounded stream, then read the checkpoint
    back as a table and compare against the batch ground truth."""
    import tempfile

    from pyspark.sql import functions as F

    from etl_knlp_spark.catalog import load_table
    from etl_knlp_spark.streaming.stateful import read_state_store

    ckpt = tempfile.mkdtemp(prefix="etl_knlp_state_read_")
    src = (
        spark.readStream.schema("event_type STRING")
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    q = (
        src.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .writeStream.format("noop")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.awaitTermination()

    state = read_state_store(spark, ckpt)
    # the value struct carries the internal aggregation buffer — field
    # naming follows the physical agg, so address it positionally
    got = {r["key"]["event_type"]: r["value"][0] for r in state.collect()}
    want = {
        r["event_type"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want
    meta = spark.read.format("state-metadata").load(ckpt)
    ops = {r["operatorName"] for r in meta.collect()}
    assert "stateStoreSave" in ops

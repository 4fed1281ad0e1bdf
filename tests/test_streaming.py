"""Structured Streaming: the batch-checked window semantics must hold
under a real stream (file source, availableNow trigger, memory sink)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_knlp_spark.catalog import load_table
from etl_knlp_spark.streaming.stream import dedup_stream, windowed_counts

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


@pytest.fixture(scope="module")
def events_json_dir(spark, sf_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("events_json"))
    (
        load_table(spark, sf_dir, "events")
        .select("event_id", "ts", "event_type", "value")
        .write.mode("overwrite")
        .json(d)
    )
    return d


def _run_stream(spark, stream_df, name: str):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append" if stream_df.isStreaming else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_windowed_counts_stream_equals_batch(spark, events_json_dir):
    stream_src = spark.readStream.schema(EVENTS_SCHEMA).json(events_json_dir)
    batch_src = spark.read.schema(EVENTS_SCHEMA).json(events_json_dir)

    q = (
        windowed_counts(stream_src, window="1 hour", watermark="2 hours")
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in spark.table("win_counts").collect()
    }

    batch = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in (
            batch_src.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
        ).collect()
    }
    assert streamed == batch


def test_foreach_batch_sink_is_idempotent_per_batch(spark, events_json_dir, tmp_path):
    from etl_knlp_spark.streaming.stream import write_stream_foreach_batch

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(events_json_dir)
    )
    q = write_stream_foreach_batch(src.select("event_id", "event_type"), out, ckpt).trigger(
        availableNow=True
    ).start()
    q.awaitTermination(120)
    written = spark.read.json(out)
    expected = spark.read.schema(EVENTS_SCHEMA).json(events_json_dir).count()
    assert written.count() == expected
    # restart from the same checkpoint: no new data → no duplication
    q2 = write_stream_foreach_batch(src.select("event_id", "event_type"), out, ckpt).trigger(
        availableNow=True
    ).start()
    q2.awaitTermination(120)
    assert spark.read.json(out).count() == expected


def test_dedup_stream_drops_duplicate_ids(spark, events_json_dir):
    # feed the same files twice via two readStream unions is awkward;
    # instead duplicate rows inside the stream then dedup
    src = spark.readStream.schema(EVENTS_SCHEMA).json(events_json_dir)
    doubled = src.unionByName(src)
    out = _run_stream(spark, dedup_stream(doubled, watermark="10 hours"), "dedup_out")
    n_unique = spark.read.schema(EVENTS_SCHEMA).json(events_json_dir).count()
    assert out.count() == n_unique


def test_stream_static_join_equals_batch(spark, events_json_dir):
    from etl_knlp_spark.streaming.stream import enrich_stream

    dim = spark.createDataFrame(
        [("click", "engagement"), ("view", "engagement"), ("purchase", "revenue")],
        "event_type string, category string",
    )
    stream_src = spark.readStream.schema(EVENTS_SCHEMA).json(events_json_dir)
    streamed = _run_stream(
        spark,
        enrich_stream(stream_src.select("event_id", "event_type"), dim, "event_type"),
        "enriched",
    )
    batch_src = spark.read.schema(EVENTS_SCHEMA).json(events_json_dir)
    expected = {
        (r["event_id"], r["category"])
        for r in enrich_stream(
            batch_src.select("event_id", "event_type"), dim, "event_type"
        ).collect()
    }
    got = {(r["event_id"], r["category"]) for r in streamed.collect()}
    assert got == expected and len(got) > 0


def test_stream_stream_join_attribution_window(spark, sf_dir):
    """The real micro-batch stream-stream join: every emitted pair
    respects the attribution window, and the matched set equals the
    batch interval join on the same bounded input."""
    from etl_knlp_spark.streaming.joins import stream_stream_join

    got = stream_stream_join(spark, sf_dir).collect()
    assert len(got) > 0
    for r in got:
        delta = (r["purchase_ts"] - r["view_ts"]).total_seconds()
        assert 0 <= delta <= 3600

    e = load_table(spark, sf_dir, "events")
    v = e.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), F.col("ts").alias("view_ts")
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    batch = v.join(
        p,
        (F.col("user_id") == F.col("pu"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr("INTERVAL 1 HOUR")),
    )
    assert {(r["view_id"], r["purchase_id"]) for r in got} == {
        (r["view_id"], r["purchase_id"]) for r in batch.collect()
    }


def test_sessionize_batch_gap_invariants(spark, sf_dir):
    """No session spans a >30-min internal gap, and consecutive
    sessions of one user are separated by >30 min (else they'd be one
    session)."""
    from etl_knlp_spark.operators.events import sessionize_batch

    rows = sessionize_batch(spark, sf_dir).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
        assert r["duration_s"] >= 0
        assert r["n_events"] >= 1
    for sess in by_user.values():
        sess.sort(key=lambda r: r["session_start"])
        for a, b in zip(sess, sess[1:]):
            gap = (b["session_start"] - a["session_end"]).total_seconds()
            assert gap > 1800


def test_stream_stream_outer_join_emits_proven_no_match(spark, sf_dir):
    """Null-purchase rows appear exactly for views the watermark proved
    unmatched (below the bounded-input cutoff); matched rows respect
    the attribution window."""
    from etl_knlp_spark.streaming.joins import stream_stream_outer_join

    rows = stream_stream_outer_join(spark, sf_dir).collect()
    matched = [r for r in rows if r["purchase_id"] is not None]
    unmatched = [r for r in rows if r["purchase_id"] is None]
    assert matched and unmatched
    for r in matched:
        assert 0 <= (r["purchase_ts"] - r["view_ts"]).total_seconds() <= 3600
    # an unmatched view emits only after the watermark proves no match
    # can arrive: its view_ts sits ≥ 3h behind the newest event in the
    # whole stream (watermark delay 2h + join window 1h)
    horizon = load_table(spark, sf_dir, "events").agg(F.max("ts")).first()[0]
    for r in unmatched:
        assert r["purchase_ts"] is None
        assert (horizon - r["view_ts"]).total_seconds() > 3 * 3600
    # a matched view never also emits a null row
    assert {r["view_id"] for r in unmatched}.isdisjoint(
        {r["view_id"] for r in matched}
    )


# ---- streaming MinHash dedup screen (round 8) -----------------------------


def test_row_band_signatures_match_batch_builder(spark, sf_dir):
    """The stateless per-row signature path must be ROW-IDENTICAL to
    the batch explode+min-agg builder — same shingles, same xxhash64
    literal types, same band combine — or the streaming state would
    silently diverge from the persisted batch index it claims to
    reconstruct."""
    from etl_knlp_spark.catalog import load_table
    from etl_knlp_spark.operators.dedup import minhash_band_signatures
    from etl_knlp_spark.streaming.dedup_stream import row_band_signatures

    docs = load_table(spark, sf_dir, "documents")
    per_row = row_band_signatures(docs)
    batch = minhash_band_signatures(docs)
    assert per_row.exceptAll(batch).count() == 0
    assert batch.exceptAll(per_row).count() == 0
    # and it drops short docs exactly like the batch filter
    short = spark.createDataFrame(
        [(1, "one two"), (2, "one two three four")], "doc_id long, text string"
    )
    assert {
        r.doc_id for r in row_band_signatures(short).select("doc_id").distinct().collect()
    } == {2}


def test_stream_band_index_converges_batch_order_free(spark, sf_dir, tmp_path):
    """Real micro-batch run over a MULTI-FILE staging of documents with
    maxFilesPerTrigger=1: the converged bucket table must equal the
    single-pass batch aggregate regardless of how many micro-batches
    the docs arrived in (min/count commutativity is the design claim —
    this is the measurement)."""
    import tempfile
    import uuid

    from pyspark.sql import functions as F

    from etl_knlp_spark.catalog import load_table
    from etl_knlp_spark.streaming.dedup_stream import streaming_band_index

    docs = load_table(spark, sf_dir, "documents")
    staged = str(tmp_path / "docs_multi")
    docs.repartition(5).write.parquet(staged)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(staged)
    )
    sink = f"band_idx_multi_{uuid.uuid4().hex[:12]}"
    q = (
        streaming_band_index(stream)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="etl_knlp_ckpt_"))
        .start()
    )
    q.awaitTermination()
    n_batches = len(q.recentProgress)
    assert n_batches >= 5, "staging should force multiple micro-batches"

    converged = spark.table(sink)
    batch = streaming_band_index(docs)
    assert converged.exceptAll(batch).count() == 0
    assert batch.exceptAll(converged).count() == 0


def test_stream_dedup_minhash_contract(spark, sf_dir):
    """The registered contract row holds at sf0.001: stream-converged
    state equals the batch index, and every exact-Jaccard dup with an
    earlier partner is screened out."""
    from etl_knlp_spark.streaming.dedup_stream import stream_dedup_minhash

    row = stream_dedup_minhash(spark, sf_dir).collect()[0]
    assert row.stream_matches_batch is True
    assert row.recall_ok is True
    assert row.n_docs > 0


def test_foreach_batch_band_ingest_feeds_screen(spark, sf_dir, tmp_path):
    """The production ingest loop end to end: documents stream in as
    micro-batches, foreachBatch appends their RAW band signatures
    (zero-shuffle, batchId-keyed — idempotent on replay) to the
    persisted index; the accumulated directory must equal the batch
    builder's signature table, and `incremental_minhash_screen`
    probing it (history_bands=…) must flag a new batch identically to
    the recompute-from-raw default."""
    from pyspark.sql import functions as F

    from etl_knlp_spark.catalog import load_table
    from etl_knlp_spark.operators.dedup import (
        incremental_minhash_screen,
        minhash_band_signatures,
    )
    from etl_knlp_spark.streaming.dedup_stream import (
        ingest_band_index,
        read_band_index,
        read_band_signatures,
    )

    docs = load_table(spark, sf_dir, "documents")
    staged = str(tmp_path / "docs_staged")
    docs.repartition(4).write.parquet(staged)

    index_path = str(tmp_path / "band_index")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(staged)
    )
    q = ingest_band_index(stream, index_path, str(tmp_path / "ckpt"))
    q.awaitTermination()
    assert len(q.recentProgress) >= 4, "should have run multiple micro-batches"

    persisted = read_band_signatures(spark, index_path)
    batch = minhash_band_signatures(docs)
    assert persisted.exceptAll(batch).count() == 0
    assert batch.exceptAll(persisted).count() == 0
    # the bucket-witness view composes correctly over batch boundaries
    direct = batch.groupBy("band_idx", "band_hash").agg(
        F.min("doc_id").alias("witness"), F.count(F.lit(1)).alias("n_members")
    )
    composed = read_band_index(spark, index_path)
    assert composed.exceptAll(direct).count() == 0
    assert direct.exceptAll(composed).count() == 0

    # screen a synthetic new batch against the persisted index: one
    # near-copy of an indexed doc, one novel doc
    first = docs.orderBy("doc_id").limit(1).collect()[0]
    new = spark.createDataFrame(
        [
            (10_000_000, first.text + " tail"),
            (10_000_001, " ".join(f"novel{i}" for i in range(40))),
        ],
        "doc_id long, text string",
    )
    via_index = incremental_minhash_screen(
        docs, new, 0.7, history_bands=persisted
    ).collect()
    default = incremental_minhash_screen(docs, new, 0.7).collect()
    assert sorted(map(tuple, via_index)) == sorted(map(tuple, default))
    flags = {r["doc_id"]: r["is_near_dup"] for r in via_index}
    assert flags[10_000_000] is True
    assert flags[10_000_001] is False


def test_interval_overlap_join_matches_naive(spark):
    """Bucket-exploded overlap join == the direct theta join from the
    definition, on randomized intervals spanning multiple buckets,
    sub-bucket, and exact-boundary cases."""
    import random

    from pyspark.sql import Row

    from etl_knlp_spark.operators.events import interval_overlap_join

    rng = random.Random(404)
    a_rows, b_rows = [], []
    for i in range(120):
        s = rng.randint(0, 50_000)
        a_rows.append(Row(aid=i, s=s, e=s + rng.choice([0, 1, 1799, 3600, 9000])))
    for j in range(80):
        s = rng.randint(0, 50_000)
        b_rows.append(Row(bid=j, s=s, e=s + rng.choice([0, 600, 3600, 7200])))
    a = spark.createDataFrame(a_rows)
    b = spark.createDataFrame(b_rows)
    got = {
        (r.aid, r.bid, r.overlap_s)
        for r in interval_overlap_join(a, b, ["aid"], ["bid"]).collect()
    }
    want = set()
    for ra in a_rows:
        for rb in b_rows:
            if ra.s <= rb.e and rb.s <= ra.e:
                want.add((ra.aid, rb.bid, min(ra.e, rb.e) - max(ra.s, rb.s)))
    assert got == want and want


def test_join_state_backend_scopes_and_restores_confs(spark):
    """r16 optimization pin: the stream-stream join harnesses run
    under RocksDB + join stateFormatVersion 3 (one state store per
    partition instead of four — see _join_state_backend's docstring
    for the provider-lock profile), and the context must RESTORE the
    session's previous settings so non-join stateful queries keep the
    default provider (measured faster for them)."""
    from etl_knlp_spark.streaming.joins import (
        _ROCKSDB_PROVIDER,
        _join_state_backend,
    )

    prov_key = "spark.sql.streaming.stateStore.providerClass"
    ver_key = "spark.sql.streaming.join.stateFormatVersion"
    before_prov = spark.conf.get(prov_key)
    before_ver = spark.conf.get(ver_key)
    with _join_state_backend(spark):
        assert spark.conf.get(prov_key) == _ROCKSDB_PROVIDER
        assert spark.conf.get(ver_key) == "3"
    assert spark.conf.get(prov_key) == before_prov
    assert spark.conf.get(ver_key) == before_ver
    # and the default provider is NOT RocksDB here — the restore is
    # load-bearing, not a no-op
    assert before_prov != _ROCKSDB_PROVIDER

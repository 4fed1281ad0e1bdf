"""Custom Python Data Source: format registration, parallel file
partitions, ragged-line semantics matching the declarative reader."""

from __future__ import annotations

import pytest

from etl_knlp_spark.sources.datasource import DATASOURCE_AVAILABLE, register

pytestmark = pytest.mark.skipif(
    not DATASOURCE_AVAILABLE, reason="Python DataSource API requires Spark 4"
)

LINES_A = "가:家:가족, 가정\n간:間:시간:공간:기간\n"
LINES_B = "수학:數學:산수\nnocolon\n\n"


@pytest.fixture(scope="module")
def raw_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ds")
    (d / "part_a.txt").write_text(LINES_A, encoding="utf-8")
    (d / "part_b.txt").write_text(LINES_B, encoding="utf-8")
    return str(d)


def test_custom_source_reads_directory(spark, raw_dir):
    assert register(spark)
    df = (
        spark.read.format("knlp_delimited")
        .schema("korean string, hanjya string, examples string")
        .option("path", raw_dir)
        .option("sep", ":")
        .load()
    )
    rows = {r["korean"]: r for r in df.collect()}
    assert len(rows) == 4  # blank line skipped
    assert rows["가"]["examples"] == "가족, 가정"
    assert rows["간"]["examples"] == "시간:공간:기간"  # ragged overflow rejoined
    assert rows["nocolon"]["hanjya"] is None  # short line → NULLs
    # one partition per file → the scan parallelizes across dumps
    assert df.rdd.getNumPartitions() == 2


def test_custom_source_matches_declarative_reader(spark, raw_dir):
    from etl_knlp_spark.sources.text import read_delimited

    register(spark)
    custom = (
        spark.read.format("knlp_delimited")
        .schema("korean string, hanjya string, examples string")
        .option("path", raw_dir)
        .option("sep", ":")
        .load()
    )
    declarative = read_delimited(
        spark, raw_dir, ["korean", "hanjya", "examples"], sep=":"
    )
    assert sorted(map(tuple, custom.collect())) == sorted(
        map(tuple, declarative.collect())
    )


def test_connector_survives_truncation_and_mutation_fuzz(spark, tmp_path):
    """The codec fuzz discipline, applied to the pure-Python reader
    (r11, after the text-source sweep): every-prefix truncation and
    single-byte mutation of a multi-byte-UTF-8 fixture must parse —
    invalid byte sequences decode to U+FFFD like the declarative
    spark.read.text path — never kill the task with a strict-mode
    UnicodeDecodeError (the escape this test found). Contract: stable
    schema + exact row conservation vs a mirror of Python text-mode
    line iteration. Variants are packed into a few files so the
    one-partition-per-file planner doesn't make 400 tasks."""
    fixture = LINES_A.encode("utf-8")
    variants = [fixture[:cut] for cut in range(len(fixture))]
    for i in range(len(fixture)):
        for nb in (0, 0xFF, (fixture[i] + 1) % 256):
            variants.append(fixture[:i] + bytes([nb]) + fixture[i + 1 :])

    d = tmp_path / "fuzz_ds"
    d.mkdir()
    n_files = 8
    expected = 0
    for g in range(n_files):
        blob = b"\n".join(variants[g::n_files])
        (d / f"g{g}.txt").write_bytes(blob)
        # mirror of the reader: utf-8 decode with replacement,
        # universal-newline translation, split on \n, drop the
        # empty-after-final-newline tail, keep non-blank lines
        s = blob.decode("utf-8", errors="replace")
        lines = s.replace("\r\n", "\n").replace("\r", "\n").split("\n")
        if lines and lines[-1] == "":
            lines.pop()
        expected += sum(1 for ln in lines if ln.strip())

    register(spark)
    df = (
        spark.read.format("knlp_delimited")
        .schema("korean string, hanjya string, examples string")
        .option("path", str(d))
        .option("sep", ":")
        .load()
    )
    assert df.columns == ["korean", "hanjya", "examples"]
    assert df.count() == expected, (
        "row conservation broke under connector truncation/mutation fuzz"
    )


def test_writer_roundtrips_through_the_connector(spark, tmp_path):
    """Write through the connector's writer, read back through its
    reader: the sep-joined line format round-trips, including a sep
    inside the last column (the ragged-overflow inverse) and NULLs."""
    register(spark)
    rows = [
        ("가", "家", "가족, 가정"),
        ("간", "間", "시간:공간:기간"),   # sep inside last col
        ("수", None, None),
    ]
    df = spark.createDataFrame(rows, "korean string, hanjya string, examples string")
    out = str(tmp_path / "out")
    (
        df.coalesce(2)
        .write.format("knlp_delimited")
        .mode("append")
        .option("path", out)
        .option("sep", ":")
        .save()
    )
    back = (
        spark.read.format("knlp_delimited")
        .schema("korean string, hanjya string, examples string")
        .option("path", out)
        .option("sep", ":")
        .load()
    )
    got = {tuple(r) for r in back.collect()}
    # NULL middle/last fields write as empty and read back as '' (the
    # line keeps its field count); the overflow line round-trips intact
    assert ("간", "間", "시간:공간:기간") in got
    assert ("가", "家", "가족, 가정") in got
    assert ("수", "", "") in got
    assert len(got) == 3


def test_stream_reader_tails_new_files_exactly_once(spark, tmp_path):
    """The streaming half of the connector: files present at start
    arrive in the first micro-batch, a file added mid-stream arrives
    in a later one, nothing is duplicated, and ragged lines follow
    the same overflow rule as the batch reader."""
    import time
    import uuid

    d = tmp_path / "stream_in"
    d.mkdir()
    (d / "a_dump.txt").write_text(LINES_A, encoding="utf-8")

    assert register(spark)
    sink = f"ds_stream_{uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("knlp_delimited")
        .schema("korean string, hanjya string, examples string")
        .option("path", str(d))
        .option("sep", ":")
        .load()
        .writeStream.format("memory")
        .queryName(sink)
        .trigger(processingTime="1 seconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.sql(f"SELECT * FROM {sink}").count() >= 2:
                break
            time.sleep(0.5)
        (d / "b_dump.txt").write_text(LINES_B, encoding="utf-8")
        while time.time() < deadline:
            if spark.sql(f"SELECT * FROM {sink}").count() >= 3:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    rows = {tuple(r) for r in spark.sql(f"SELECT * FROM {sink}").collect()}
    assert rows == {
        ("가", "家", "가족, 가정"),
        ("간", "間", "시간:공간:기간"),  # ragged overflow rejoins
        ("수학", "數學", "산수"),
        ("nocolon", None, None),  # missing fields → NULL
    }
    # exactly-once: the count equals the distinct count
    assert spark.sql(f"SELECT * FROM {sink}").count() == len(rows)


def test_stream_reader_recovers_from_checkpoint_exactly_once(spark, tmp_path):
    """Kill the stream after it commits the first file, add a second
    file while it is DOWN, restart from the same checkpoint: the
    restarted query must deliver only the new file's rows (offsets
    recovered, nothing re-read, nothing lost) — the exactly-once
    recovery contract readBetweenOffsets exists for."""
    import time
    import uuid

    d = tmp_path / "stream_recover"
    d.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    (d / "a_dump.txt").write_text(LINES_A, encoding="utf-8")

    assert register(spark)

    def start():
        return (
            spark.readStream.format("knlp_delimited")
            .schema("korean string, hanjya string, examples string")
            .option("path", str(d))
            .option("sep", ":")
            .load()
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    q = start()
    q.awaitTermination()
    first = spark.read.parquet(out_dir).count()
    assert first == 2  # LINES_A rows committed

    (d / "b_dump.txt").write_text(LINES_B, encoding="utf-8")  # arrives while down
    q2 = start()
    q2.awaitTermination()

    rows = [tuple(r) for r in spark.read.parquet(out_dir).collect()]
    assert len(rows) == 4  # 2 old (not re-read) + 2 new, no duplicates
    assert sorted(rows) == sorted(
        [
            ("가", "家", "가족, 가정"),
            ("간", "間", "시간:공간:기간"),
            ("수학", "數學", "산수"),
            ("nocolon", None, None),
        ]
    )


def test_stream_offsets_survive_retention_deletion(spark, tmp_path):
    """Round-5 advisor finding: positional offsets silently re-read or
    skipped files when a consumed dump was deleted between restarts.
    Name-based offsets must not care: delete the consumed first file
    while the stream is down, drop a new one, restart — only the new
    file's rows arrive, nothing re-read, nothing skipped."""
    import os
    import uuid

    d = tmp_path / "stream_retention"
    d.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    (d / "a_dump.txt").write_text(LINES_A, encoding="utf-8")

    assert register(spark)

    def start():
        return (
            spark.readStream.format("knlp_delimited")
            .schema("korean string, hanjya string, examples string")
            .option("path", str(d))
            .option("sep", ":")
            .load()
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    q = start()
    q.awaitTermination()
    assert spark.read.parquet(out_dir).count() == 2

    os.remove(d / "a_dump.txt")  # retention cleanup of the consumed dump
    (d / "b_dump.txt").write_text(LINES_B, encoding="utf-8")
    q2 = start()
    q2.awaitTermination()

    rows = sorted(tuple(r) for r in spark.read.parquet(out_dir).collect())
    assert rows == sorted(
        [
            ("가", "家", "가족, 가정"),
            ("간", "間", "시간:공간:기간"),
            ("수학", "數學", "산수"),
            ("nocolon", None, None),
        ]
    )


def test_stream_replay_fails_loudly_when_committed_file_missing(tmp_path):
    """readBetweenOffsets replays the committed batch by recorded
    basenames and must raise — not substitute neighbors — if one was
    deleted after commit."""
    from pyspark.sql.types import StringType, StructField, StructType

    from etl_knlp_spark.sources.datasource import DelimitedTextDataSource

    d = tmp_path / "replay"
    d.mkdir()
    (d / "a_dump.txt").write_text(LINES_A, encoding="utf-8")
    schema = StructType([StructField(c, StringType()) for c in ("k", "h", "e")])
    src = DelimitedTextDataSource(options={"path": str(d), "sep": ":"})
    reader = src.simpleStreamReader(schema)

    start = reader.initialOffset()
    rows, end = reader.read(start)
    assert end["last"] == "a_dump.txt" and end["batch"] == ["a_dump.txt"]
    assert len(list(rows)) == 2

    # replay works while the file exists...
    assert len(list(reader.readBetweenOffsets(start, end))) == 2
    # ...and fails loudly once it is gone
    (d / "a_dump.txt").unlink()
    with pytest.raises(FileNotFoundError, match="a_dump.txt"):
        reader.readBetweenOffsets(start, end)

    # a late file sorting BEFORE the consumed name is ignored by
    # contract (dated-dump names are monotone); a later name is read
    (d / "0_late.txt").write_text("x:y:z\n", encoding="utf-8")
    rows2, end2 = reader.read(end)
    assert list(rows2) == [] and end2["last"] == "a_dump.txt"
    (d / "b_dump.txt").write_text("b1:b2:b3\n", encoding="utf-8")
    rows3, end3 = reader.read(end2)
    assert len(list(rows3)) == 1 and end3["batch"] == ["b_dump.txt"]


def test_stream_rejects_legacy_positional_checkpoint(tmp_path):
    """ADVICE r6 #3: a pre-round-6 checkpoint recorded positional
    offsets ({"files": N}); resuming from one must raise a clear
    'incompatible checkpoint' error, not KeyError('last')."""
    from pyspark.sql.types import StringType, StructField, StructType

    from etl_knlp_spark.sources.datasource import DelimitedTextDataSource

    d = tmp_path / "legacy"
    d.mkdir()
    (d / "a_dump.txt").write_text("x:y:z\n", encoding="utf-8")
    schema = StructType([StructField(c, StringType()) for c in ("k", "h", "e")])
    src = DelimitedTextDataSource(options={"path": str(d), "sep": ":"})
    reader = src.simpleStreamReader(schema)

    legacy = {"files": 1}
    with pytest.raises(ValueError, match="incompatible checkpoint"):
        reader.read(legacy)
    with pytest.raises(ValueError, match="incompatible checkpoint"):
        reader.readBetweenOffsets(reader.initialOffset(), legacy)

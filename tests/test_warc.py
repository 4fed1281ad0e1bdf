"""WARC source/sink: framing, gzip members, malformed-input contract,
and the distributed roundtrip (sources/warc.py)."""

import gzip

import pytest

from etl_knlp_spark.sources.warc import (
    format_record,
    gunzip_members,
    parse_warc,
    read_warc,
    write_warc,
)


def _rec(doc_id=1, lang="en", text="hello world", **extra):
    headers = {
        "WARC-Type": "resource",
        "WARC-Target-URI": f"https://corpus.invalid/{lang}/{doc_id}",
        **extra,
    }
    return format_record(headers, text.encode())


def test_parse_roundtrips_multi_record_stream():
    stream = _rec(1, text="alpha") + _rec(2, lang="fr", text="béta")
    out = list(parse_warc(stream))
    assert [p.decode() for _, p in out] == ["alpha", "béta"]
    assert out[0][0]["WARC-Target-URI"] == "https://corpus.invalid/en/1"
    # payload bytes are length-framed: CRLFs INSIDE a payload survive
    tricky = format_record({"WARC-Type": "resource"}, b"a\r\n\r\nb")
    (hdrs, payload), = parse_warc(tricky)
    assert payload == b"a\r\n\r\nb"


def test_gunzip_members_concatenated_and_passthrough():
    raw = _rec(1) + _rec(2)
    members = gzip.compress(_rec(1), mtime=0) + gzip.compress(_rec(2), mtime=0)
    assert gunzip_members(members) == raw
    assert gunzip_members(raw) == raw  # uncompressed passthrough


def test_malformed_inputs_raise_value_error_only():
    ok = _rec(1)
    cases = [
        b"HTTP/1.0 200 OK\r\n\r\n",          # not a WARC version line
        ok[: ok.find(b"\r\n\r\n")],           # truncated header block
        ok[:-6],                              # truncated payload
        ok.replace(b"Content-Length", b"X-Len"),  # missing length
        ok.replace(b"Content-Length: 11", b"Content-Length: pig"),
        ok.replace(b"WARC-Type: resource\r\n", b"WARC-Type resource\r\n"),
    ]
    for data in cases:
        with pytest.raises(ValueError, match="malformed WARC"):
            list(parse_warc(data))
    with pytest.raises(ValueError, match="malformed gzip"):
        gunzip_members(b"\x1f\x8b" + b"garbage")


def test_write_read_distributed_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(7, "en", "seven heaven"), (8, "de", "acht macht"), (9, "en", "nine\nlines")],
        "doc_id long, lang string, text string",
    ).repartition(2)
    n = write_warc(df, str(tmp_path / "w"))
    assert n == 3
    got = {
        r["doc_id"]: r for r in read_warc(spark, str(tmp_path / "w")).collect()
    }
    assert got[7]["text"] == "seven heaven" and got[7]["lang"] == "en"
    assert got[9]["text"] == "nine\nlines"
    assert all(r["warc_type"] == "resource" for r in got.values())
    # multiple shards were written (repartition(2), both non-empty or one)
    assert len(list((tmp_path / "w").glob("*.warc.gz"))) >= 1


def test_write_is_idempotent_across_repartitioning(spark, tmp_path):
    """A re-run with fewer partitions must not leave stale orphan
    shards from the wider first run."""
    wide = spark.createDataFrame(
        [(i, "en", f"text {i}") for i in range(8)],
        "doc_id long, lang string, text string",
    ).repartition(8)
    assert write_warc(wide, str(tmp_path / "w")) == 8
    narrow = wide.limit(2).repartition(1)
    assert write_warc(narrow, str(tmp_path / "w")) == 2
    assert read_warc(spark, str(tmp_path / "w")).count() == 2


def test_read_empty_drop_returns_empty_frame(spark, tmp_path):
    """A shard directory with no .warc.gz files (an empty crawl cycle)
    reads as an empty typed frame, not a path error."""
    d = tmp_path / "empty"
    d.mkdir()
    df = read_warc(spark, str(d))
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == [
        "doc_id", "lang", "warc_type", "target_uri", "text",
    ]


def test_foreign_uri_surfaces_null_identity(spark, tmp_path):
    """A crawl record whose URI is not the corpus scheme still parses —
    with NULL doc_id/lang — instead of being silently dropped."""
    d = tmp_path / "f"
    d.mkdir()
    rec = format_record(
        {"WARC-Type": "response", "WARC-Target-URI": "https://example.org/x"},
        b"wild payload",
    )
    (d / "part-00000.warc.gz").write_bytes(gzip.compress(rec, mtime=0))
    rows = read_warc(spark, str(d)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["doc_id"] is None and r["lang"] is None
    assert r["warc_type"] == "response" and r["text"] == "wild payload"


def test_warc_parser_survives_truncation_and_corruption():
    """The r10 fuzz discipline applied to the WARC record parser and
    the multi-member gunzip helper: every truncation and single-byte
    mutation must parse (corrupt payload bytes are legal content) or
    raise ValueError — no IndexError/UnicodeDecodeError/EOFError
    escapes."""
    import gzip

    from etl_knlp_spark.sources.warc import (
        format_record,
        gunzip_members,
        parse_warc,
    )

    rec = format_record(
        {"WARC-Type": "response", "WARC-Record-ID": "<urn:x:1>"},
        b"hello world",
    )
    list(parse_warc(rec))  # the full record must parse
    gz = gzip.compress(b"hello")
    gunzip_members(gz)

    escapes = []
    for payload, fn, tag in ((rec, lambda b: list(parse_warc(b)), "warc"),
                             (gz, gunzip_members, "gz")):
        for cut in range(len(payload)):
            try:
                fn(payload[:cut])
            except (ValueError, NotImplementedError):
                pass
            except Exception as exc:  # noqa: BLE001 — the contract under test
                escapes.append((tag, "cut", cut, type(exc).__name__))
        for pos in range(len(payload)):
            for val in (0x00, 0xFF, (payload[pos] + 1) & 0xFF):
                if val == payload[pos]:
                    continue
                mut = payload[:pos] + bytes([val]) + payload[pos + 1 :]
                try:
                    fn(mut)
                except (ValueError, NotImplementedError):
                    pass
                except Exception as exc:  # noqa: BLE001
                    escapes.append((tag, "mut", pos, val, type(exc).__name__))
    assert not escapes, escapes[:10]

"""WARC (Web ARChive, ISO 28500) source/sink for web-crawl corpora.

Web-scale LLM training data arrives as WARC: Common Crawl alone ships
~100k `*.warc.gz` files per snapshot, each ~1 GB of per-record gzip
members concatenated back to back (a valid multi-member gzip stream —
any single record is seekable and independently decompressible). The
reference pipeline ingests pre-extracted text files
(/root/reference/dag-knlp.py:85-188); WARC ingestion is part of the
extended LLM-pipeline surface this repo adds (SURVEY §2.12).

Spark-first layout:

- `read_warc` is the production operator: `binaryFile` scan over the
  `.warc.gz` shards → `mapInPandas` record parser (Arrow batches of
  whole files; one task per file — Common Crawl's ~1 GB shard size IS
  the partition granularity, tens of thousands of files → cluster-wide
  parallelism with zero shuffles). The parser walks gzip members with
  `zlib.decompressobj(unused_data)` (streamed, never a whole-file
  decompress into one allocation per record) and enforces WARC/1.0
  framing (version line, CRLF header block, Content-Length payload,
  CRLF CRLF trailer).
- `write_warc` is the fixture/interchange sink: one `.warc.gz` shard
  per partition written from the same `mapInPandas` harness (local FS
  or any fuse/NFS-mounted path; a cluster deployment swaps the
  `open()` for its distributed-FS client — the record serialization
  is the portable part). Record identity travels in standard WARC
  headers (WARC-Target-URI carries corpus position; no sidecar files).

Malformed-input contract: every framing violation raises ValueError
(truncated header, bad version line, short payload, missing
Content-Length) — never KeyError/IndexError/struct.error — so a
corrupt shard fails a decode batch with the error class the pipeline
handles (same contract as operators/multimodal.py's decoders).
"""

from __future__ import annotations

import gzip
import os
import re
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

_WARC_DATE = "2020-01-01T00:00:00Z"  # fixed: deterministic fixtures
_URI_RE = re.compile(r"^https://corpus\.invalid/([A-Za-z-]+)/(\d+)$")


def format_record(headers: dict[str, str], payload: bytes) -> bytes:
    """Serialize one WARC/1.0 record (header block + Content-Length +
    payload + the mandatory CRLF CRLF record separator)."""
    head = "".join(f"{k}: {v}\r\n" for k, v in headers.items())
    return (
        f"WARC/1.0\r\n{head}Content-Length: {len(payload)}\r\n\r\n".encode()
        + payload
        + b"\r\n\r\n"
    )


def parse_warc(data: bytes) -> Iterator[tuple[dict[str, str], bytes]]:
    """Yield (headers, payload) for each record in a decompressed WARC
    stream, enforcing the framing rules (ValueError on any violation)."""
    pos, n = 0, len(data)
    while pos < n:
        while data.startswith(b"\r\n", pos):  # inter-record separators
            pos += 2
        if pos >= n:
            return
        if not data.startswith(b"WARC/", pos):
            raise ValueError("malformed WARC: record must start with a version line")
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise ValueError("malformed WARC: truncated header block")
        headers: dict[str, str] = {}
        for line in data[pos:hdr_end].split(b"\r\n")[1:]:
            k, sep, v = line.partition(b":")
            if not sep:
                raise ValueError("malformed WARC: header line without ':'")
            headers[k.strip().decode("utf-8")] = v.strip().decode("utf-8")
        if "Content-Length" not in headers:
            raise ValueError("malformed WARC: missing Content-Length")
        try:
            length = int(headers["Content-Length"])
        except ValueError:
            raise ValueError("malformed WARC: non-integer Content-Length") from None
        body_start = hdr_end + 4
        payload = data[body_start : body_start + length]
        if len(payload) != length:
            raise ValueError("malformed WARC: truncated payload")
        yield headers, payload
        pos = body_start + length


def gunzip_members(blob: bytes) -> bytes:
    """Decompress a concatenated-member gzip stream (the `.warc.gz`
    layout: one member per record). Plain (uncompressed) WARC bytes
    pass through untouched.

    Chunk-fed on purpose: the obvious loop — fresh decompressobj,
    `d.decompress(rest_of_blob)`, continue from `d.unused_data` —
    COPIES the whole remaining blob into unused_data once per member,
    O(members × bytes). At Common Crawl shard shape (~50k one-record
    members) that was 11.6 s/shard; feeding fixed 1 MiB windows and
    only ever re-feeding the small unused tail makes it 0.7 s
    (measured r8, tools/bench_reference_e2e.py's WARC source row).
    Truncated final members still yield their partial output silently
    (zlib raises only on malformed bytes, not on truncation) — same
    contract as before."""
    if blob[:2] != b"\x1f\x8b":
        return blob
    out = []
    d = zlib.decompressobj(wbits=31)
    chunk = 1 << 20
    mv = memoryview(blob)
    for start in range(0, len(blob), chunk):
        data = mv[start : start + chunk]
        while True:
            try:
                out.append(d.decompress(data))
            except zlib.error as e:
                raise ValueError(
                    f"malformed gzip member in WARC: {e}"
                ) from None
            if not d.eof:
                break  # mid-member: the next outer chunk continues it
            tail = d.unused_data
            d = zlib.decompressobj(wbits=31)
            if not tail:
                break
            data = tail
    return b"".join(out)


_READ_SCHEMA = (
    "doc_id bigint, lang string, warc_type string, target_uri string, text string"
)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC reader: one task per `.warc.gz` shard, no
    shuffle. Emits (doc_id, lang, warc_type, target_uri, text) — the
    corpus identity parsed back out of WARC-Target-URI
    (`https://corpus.invalid/{lang}/{doc_id}`); records whose URI does
    not match the corpus scheme surface with NULL doc_id/lang rather
    than being silently dropped."""
    import pandas as pd

    from .io import hadoop_glob_nonempty

    if not hadoop_glob_nonempty(spark, os.path.join(path, "*.warc.gz")):
        # an empty crawl drop is a normal steady-state condition (no
        # shards landed this cycle) — empty frame, not a path error.
        # Resolved through the Hadoop FS API, NOT a driver-local glob:
        # on s3a:// a local glob always misses, and a populated remote
        # drop would silently read as empty (ADVICE r7 #1).
        return spark.createDataFrame([], _READ_SCHEMA)
    files = spark.read.format("binaryFile").load(os.path.join(path, "*.warc.gz"))

    def parse_files(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "lang", "warc_type", "target_uri", "text"]
        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                for headers, payload in parse_warc(gunzip_members(bytes(blob))):
                    uri = headers.get("WARC-Target-URI", "")
                    m = _URI_RE.match(uri)
                    rows.append(
                        (
                            int(m.group(2)) if m else None,
                            m.group(1) if m else None,
                            headers.get("WARC-Type", ""),
                            uri,
                            payload.decode("utf-8"),
                        )
                    )
            yield pd.DataFrame(rows, columns=cols)

    return files.select("content").mapInPandas(parse_files, schema=_READ_SCHEMA)


def write_warc(df: DataFrame, path: str) -> int:
    """Distributed WARC sink: each partition serializes its rows
    (doc_id, lang, text required) as `resource` records into one
    `.warc.gz` shard under ``path`` (one gzip member per record —
    the Common Crawl layout `read_warc` consumes). Returns the record
    count. Idempotent: existing shards under ``path`` are cleared
    first (shard names come from task partition ids, so without the
    clear a re-run with FEWER partitions would leave stale orphan
    shards beside the fresh ones)."""
    import glob as _glob

    import pandas as pd

    os.makedirs(path, exist_ok=True)
    for stale in _glob.glob(os.path.join(path, "*.warc.gz")):
        os.remove(stale)

    def write_part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        fname = os.path.join(path, f"part-{pid:05d}.warc.gz")
        n = 0
        buf = []
        for pdf in batches:
            for doc_id, lang, text in zip(pdf["doc_id"], pdf["lang"], pdf["text"]):
                payload = str(text).encode("utf-8")
                rec = format_record(
                    {
                        "WARC-Type": "resource",
                        "WARC-Record-ID": f"<urn:doc:{doc_id}>",
                        "WARC-Date": _WARC_DATE,
                        "WARC-Target-URI": f"https://corpus.invalid/{lang}/{doc_id}",
                        "Content-Type": "text/plain",
                    },
                    payload,
                )
                buf.append(gzip.compress(rec, mtime=0))
                n += 1
        if n:
            with open(fname, "wb") as f:
                f.write(b"".join(buf))
        yield pd.DataFrame({"n": [n]})

    counts = (
        df.select("doc_id", "lang", "text")
        .mapInPandas(write_part, schema="n bigint")
        .collect()  # bounded: one row per partition
    )
    return sum(r["n"] for r in counts)


@query(
    "warc_roundtrip",
    oracle="""
    SELECT doc_id, lang, 'resource' AS warc_type,
           md5(text) AS text_md5, CAST(length(text) AS BIGINT) AS n_chars
    FROM documents
    """,
)
def warc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC sink→source roundtrip through real `.warc.gz` shards: the
    documents table is written as per-record-gzipped WARC resource
    records (one shard per partition), read back by the distributed
    parser, and proven lossless against the identity oracle (text via
    md5 — the payload survives framing, gzip members, and utf-8 both
    ways). This is the ingestion shape of a web-crawl pipeline: at
    100 TB the shards come from the crawler and only `read_warc` runs —
    one task per ~1 GB shard, no shuffle, schema projected before the
    parse."""
    import tempfile

    docs = load_table(spark, sf_dir, "documents")
    # unique dir per invocation — see csv_roundtrip's race note
    path = tempfile.mkdtemp(prefix="etl_knlp_warc_") + "/data"
    write_warc(docs, path)
    return read_warc(spark, path).select(
        "doc_id",
        "lang",
        "warc_type",
        F.md5("text").alias("text_md5"),
        F.length("text").cast("long").alias("n_chars"),
    )

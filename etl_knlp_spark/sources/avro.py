"""Avro Object Container File (OCF) source/sink with a pure-python
binary codec.

Avro is the de-facto row interchange format of streaming ingest (Kafka
topics, schema registries); this Spark distribution ships the JVM avro
core jars but NOT the spark-avro connector module, and the sandbox has
no network to fetch it — so, as with WARC (sources/warc.py), the
format is implemented natively: the Avro 1.12 binary encoding
(zigzag-varint longs, length-prefixed strings/bytes, IEEE
little-endian floats, index-prefixed unions) and the OCF framing
(magic, metadata map carrying the schema JSON + codec, sync-marker
delimited blocks) are ~150 lines of stdlib code, and the Spark side is
the same shape as every columnar-poor row format: `binaryFile` scan →
`mapInPandas` decode (one task per file, zero shuffles) for the
source, a per-partition `mapInPandas` sink for the writer.

Coverage: records of null/boolean/int/long/float/double/bytes/string
and 2-branch null unions (Spark nullable fields map to
["null", T] unions); `null` and `deflate` block codecs on read,
`null` on write. Logical types (timestamps, decimals) raise
NotImplementedError — the documented boundary, same policy as the
multimodal codecs. Interop is pinned in test_avro against the JVM
reference implementation (org.apache.avro DataFileReader via py4j) —
not just a self-roundtrip.
"""

from __future__ import annotations

import hashlib
import io
import json
import os
import struct
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

_MAGIC = b"Obj\x01"

_SPARK_TO_AVRO = {
    "long": "long",
    "integer": "int",
    "double": "double",
    "float": "float",
    "string": "string",
    "boolean": "boolean",
    "binary": "bytes",
}


# ---- binary primitives ----------------------------------------------------


def _write_long(buf: bytearray, n: int) -> None:
    z = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return


def _read_long(data: bytes, pos: int) -> tuple[int, int]:
    shift, acc = 0, 0
    while True:
        if pos >= len(data):
            raise ValueError("malformed avro: truncated varint")
        b = data[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _write_bytes(buf: bytearray, payload: bytes) -> None:
    _write_long(buf, len(payload))
    buf += payload


def _read_bytes(data: bytes, pos: int) -> tuple[bytes, int]:
    n, pos = _read_long(data, pos)
    if n < 0 or pos + n > len(data):
        raise ValueError("malformed avro: bad bytes length")
    return data[pos : pos + n], pos + n


def _encode_value(buf: bytearray, typ, v) -> None:
    if isinstance(typ, list):  # union — encode branch index then value
        branch = 0 if v is None else next(
            i for i, t in enumerate(typ) if t != "null"
        )
        _write_long(buf, branch)
        if v is not None:
            _encode_value(buf, typ[branch], v)
        return
    if typ == "null":
        return
    if typ == "boolean":
        buf.append(1 if v else 0)
    elif typ in ("int", "long"):
        _write_long(buf, int(v))
    elif typ == "float":
        buf += struct.pack("<f", float(v))
    elif typ == "double":
        buf += struct.pack("<d", float(v))
    elif typ == "string":
        _write_bytes(buf, str(v).encode("utf-8"))
    elif typ == "bytes":
        _write_bytes(buf, bytes(v))
    else:
        raise NotImplementedError(f"avro type {typ!r} not supported")


def _decode_value(data: bytes, pos: int, typ):
    if isinstance(typ, dict):  # logical types arrive as dicts
        raise NotImplementedError(
            f"avro logical/complex type {typ.get('type')!r} not supported"
        )
    if isinstance(typ, list):
        idx, pos = _read_long(data, pos)
        if idx < 0 or idx >= len(typ):
            raise ValueError("malformed avro: union branch out of range")
        return _decode_value(data, pos, typ[idx])
    if typ == "null":
        return None, pos
    if typ == "boolean":
        if pos >= len(data):
            raise ValueError("malformed avro: truncated boolean")
        return data[pos] != 0, pos + 1
    if typ in ("int", "long"):
        return _read_long(data, pos)
    if typ == "float":
        if pos + 4 > len(data):
            raise ValueError("malformed avro: truncated float")
        return struct.unpack("<f", data[pos : pos + 4])[0], pos + 4
    if typ == "double":
        if pos + 8 > len(data):
            raise ValueError("malformed avro: truncated double")
        return struct.unpack("<d", data[pos : pos + 8])[0], pos + 8
    if typ == "string":
        raw, pos = _read_bytes(data, pos)
        return raw.decode("utf-8"), pos
    if typ == "bytes":
        return _read_bytes(data, pos)
    raise NotImplementedError(f"avro type {typ!r} not supported")


# ---- OCF framing ----------------------------------------------------------


def _avro_schema_for(df: DataFrame) -> dict:
    fields = []
    for f in df.schema.fields:
        t = f.dataType.typeName()
        if t not in _SPARK_TO_AVRO:
            raise NotImplementedError(
                f"column {f.name!r}: spark type {t!r} has no avro mapping here "
                "(timestamps/decimals/nested are the documented boundary)"
            )
        at = _SPARK_TO_AVRO[t]
        fields.append(
            {"name": f.name, "type": ["null", at] if f.nullable else at}
        )
    return {"type": "record", "name": "row", "fields": fields}


def write_ocf(rows: Iterator[tuple], schema: dict, fname: str) -> int:
    """Serialize rows into one OCF file (null codec, one data block);
    returns the record count."""
    body, n = bytearray(), 0
    ftypes = [f["type"] for f in schema["fields"]]
    for row in rows:
        for typ, v in zip(ftypes, row):
            _encode_value(body, typ, v)
        n += 1
    sync = hashlib.md5(os.path.basename(fname).encode()).digest()
    out = bytearray(_MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": b"null",
    }
    _write_long(out, len(meta))
    for k, v in sorted(meta.items()):
        _write_bytes(out, k.encode())
        _write_bytes(out, v)
    _write_long(out, 0)  # metadata map terminator
    out += sync
    if n:
        _write_long(out, n)
        _write_long(out, len(body))
        out += body
        out += sync
    with open(fname, "wb") as fh:
        fh.write(out)
    return n


def read_ocf(blob: bytes) -> tuple[dict, list[tuple]]:
    """Parse one OCF blob → (schema dict, rows). ValueError on framing
    violations, NotImplementedError on unsupported codecs/types."""
    if blob[:4] != _MAGIC:
        raise ValueError("malformed avro: bad OCF magic")
    pos, meta = 4, {}
    while True:
        count, pos = _read_long(blob, pos)
        if count == 0:
            break
        if count < 0:  # negative-count map block: size prefix follows
            count = -count
            _, pos = _read_long(blob, pos)
        for _ in range(count):
            k, pos = _read_bytes(blob, pos)
            v, pos = _read_bytes(blob, pos)
            meta[k.decode()] = v
    if "avro.schema" not in meta:
        raise ValueError("malformed avro: missing schema in metadata")
    schema = json.loads(meta["avro.schema"])
    # a corrupted header can hold VALID JSON of the wrong shape — the
    # r10 corruption fuzz hit KeyError('fields'/'type') downstream, so
    # the record shape is validated here inside the ValueError contract
    if (
        not isinstance(schema, dict)
        or not isinstance(schema.get("fields"), list)
        or not all(isinstance(f, dict) and "type" in f for f in schema["fields"])
    ):
        raise ValueError("malformed avro: schema is not a record with fields")
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro codec {codec!r} not supported")
    sync = blob[pos : pos + 16]
    pos += 16
    ftypes = [f["type"] for f in schema["fields"]]
    rows: list[tuple] = []
    while pos < len(blob):
        n, pos = _read_long(blob, pos)
        size, pos = _read_long(blob, pos)
        data = blob[pos : pos + size]
        if len(data) != size:
            raise ValueError("malformed avro: truncated block")
        pos += size
        if blob[pos : pos + 16] != sync:
            raise ValueError("malformed avro: sync marker mismatch")
        pos += 16
        if codec == "deflate":
            try:
                data = zlib.decompress(data, -15)
            except zlib.error as exc:
                raise ValueError(f"malformed avro: deflate block ({exc})") from exc
        p = 0
        for _ in range(n):
            row = []
            for typ in ftypes:
                v, p = _decode_value(data, p, typ)
                row.append(v)
            rows.append(tuple(row))
        if p != len(data):
            raise ValueError("malformed avro: block length mismatch")
    return schema, rows


# ---- Spark source/sink ----------------------------------------------------


def write_avro(df: DataFrame, path: str) -> int:
    """Distributed OCF sink: one `.avro` file per partition (idempotent
    — stale shards cleared first, same policy as `write_warc`).
    Returns the record count.

    Two pandas-boundary caveats, inherent to Arrow→pandas batches (not
    to the codec, which `test_properties` round-trips bit-exactly
    including NaN and ±inf): (1) in a NULLABLE float column, Spark
    nulls arrive as NaN, indistinguishable from genuine NaN values —
    NaN is written as the union's null branch there (a NON-nullable
    float column keeps NaN as a real Avro double); (2) a nullable
    int64 column containing any null is delivered as float64, so
    values beyond 2^53 would lose precision — refused loudly rather
    than silently rounded."""
    import glob as _glob

    import pandas as pd

    os.makedirs(path, exist_ok=True)
    for stale in _glob.glob(os.path.join(path, "*.avro")):
        os.remove(stale)
    schema = _avro_schema_for(df)
    cols = [f.name for f in df.schema.fields]
    binary_cols = {
        f.name for f in df.schema.fields if f.dataType.typeName() == "binary"
    }
    nullable_cols = {f.name for f in df.schema.fields if f.nullable}
    int_cols = {
        f.name
        for f in df.schema.fields
        if f.dataType.typeName() in ("long", "integer")
    }

    def _clean(c, v):
        if v is None:
            return None
        if isinstance(v, float) and v != v:  # NaN
            if c in nullable_cols:
                return None  # Spark null rendered as NaN by pandas
            return v  # genuine NaN in a non-nullable double
        if c in int_cols and isinstance(v, float):
            # pandas float64 coercion of a nullable int column
            if v != int(v) or abs(v) > 2**53:
                raise ValueError(
                    f"column {c!r}: int64 value {v!r} passed through pandas "
                    "float64 coercion and cannot be written exactly"
                )
            return int(v)
        return bytes(v) if c in binary_cols else v

    def write_part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        rows = []
        for pdf in batches:
            for tup in pdf[cols].itertuples(index=False, name=None):
                rows.append(tuple(_clean(c, v) for c, v in zip(cols, tup)))
        n = 0
        if rows:
            fname = os.path.join(path, f"part-{pid:05d}.avro")
            n = write_ocf(iter(rows), schema, fname)
        yield pd.DataFrame({"n": [n]})

    counts = df.mapInPandas(write_part, schema="n bigint").collect()
    return sum(r["n"] for r in counts)


def read_avro(spark: SparkSession, path: str, spark_schema: str) -> DataFrame:
    """Distributed OCF reader: binaryFile scan (one task per file, no
    shuffle) → mapInPandas decode. ``spark_schema`` is the DDL of the
    expected output (Avro carries its schema per file; the explicit
    DDL keeps the Spark plan's schema static, the same contract as
    `spark.read.schema(...).csv`)."""
    import pandas as pd

    from .io import hadoop_glob_nonempty

    # empty-drop check via the Hadoop FS API so remote schemes (s3a://,
    # hdfs://) resolve the same way the reader does — a driver-local
    # glob would silently return an empty frame for a populated remote
    # path (ADVICE r7 #1)
    if not hadoop_glob_nonempty(spark, os.path.join(path, "*.avro")):
        return spark.createDataFrame([], spark_schema)
    files = spark.read.format("binaryFile").load(os.path.join(path, "*.avro"))

    def parse_files(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for blob in pdf["content"]:
                schema, rows = read_ocf(bytes(blob))
                names = [f["name"] for f in schema["fields"]]
                yield pd.DataFrame(rows, columns=names)

    return files.select("content").mapInPandas(parse_files, schema=spark_schema)


@query(
    "avro_roundtrip",
    oracle="SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, "
    "o_orderpriority FROM orders",
)
def avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro OCF sink→source roundtrip through real `.avro` files (the
    row-interchange format of streaming ingest): five `orders` columns
    through the pure-python binary codec and back, proven lossless
    against the identity oracle — zigzag longs, utf-8 strings, IEEE
    doubles, and null unions all survive. Cross-implementation interop
    (the JVM reference reader consuming these files) is pinned in
    test_avro."""
    import tempfile

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )
    # unique dir per invocation — see csv_roundtrip's race note
    path = tempfile.mkdtemp(prefix="etl_knlp_avro_") + "/data"
    write_avro(o, path)
    return read_avro(
        spark,
        path,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderpriority string",
    )

"""Avro OCF source/sink: codec correctness, malformed-input contract,
distributed roundtrip, and interop with the JVM reference reader
(sources/avro.py)."""

import pytest

from etl_knlp_spark.sources.avro import (
    read_avro,
    read_ocf,
    write_avro,
    write_ocf,
)

SCHEMA = {
    "type": "record",
    "name": "row",
    "fields": [
        {"name": "a", "type": ["null", "long"]},
        {"name": "b", "type": "string"},
        {"name": "c", "type": ["null", "double"]},
        {"name": "d", "type": "boolean"},
    ],
}
ROWS = [(1, "x", 1.5, True), (None, "yé", -2.25, False), (-77, "", None, True)]


def test_codec_roundtrips_including_nulls_negatives_unicode(tmp_path):
    f = str(tmp_path / "t.avro")
    assert write_ocf(iter(ROWS), SCHEMA, f) == 3
    schema, got = read_ocf(open(f, "rb").read())
    assert got == ROWS
    assert [x["name"] for x in schema["fields"]] == ["a", "b", "c", "d"]
    # zigzag edge values survive
    big = [(2**62, "m", 0.0, False), (-(2**62), "m", 0.0, False)]
    f2 = str(tmp_path / "big.avro")
    write_ocf(iter(big), SCHEMA, f2)
    assert read_ocf(open(f2, "rb").read())[1] == big


def test_malformed_inputs_raise_contract_errors_only(tmp_path):
    f = str(tmp_path / "t.avro")
    write_ocf(iter(ROWS), SCHEMA, f)
    ok = open(f, "rb").read()
    with pytest.raises(ValueError, match="magic"):
        read_ocf(b"NOPE" + ok[4:])
    with pytest.raises(ValueError, match="truncated|sync|length"):
        read_ocf(ok[:-10])
    corrupt_sync = ok[:-16] + b"\x00" * 16
    with pytest.raises(ValueError, match="sync"):
        read_ocf(corrupt_sync)
    with pytest.raises(NotImplementedError, match="codec"):
        read_ocf(ok.replace(b"null", b"zstd", 1))


def test_jvm_reference_reader_consumes_our_files(spark, tmp_path):
    """Cross-implementation interop: the Apache Avro JVM reader (the
    reference implementation, shipped in this Spark distribution's
    jars) must decode files written by the pure-python encoder."""
    f = str(tmp_path / "interop.avro")
    write_ocf(iter(ROWS), SCHEMA, f)
    jvm = spark._jvm
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(f), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    got = []
    while reader.hasNext():
        rec = reader.next()
        got.append(
            (
                rec.get("a"),
                str(rec.get("b")),
                rec.get("c"),
                rec.get("d"),
            )
        )
    reader.close()
    assert got == ROWS


def test_jvm_writer_files_are_readable_by_us(spark, tmp_path):
    """And the reverse: a file written by the JVM reference writer
    (deflate codec — exercising the read-side codec path) decodes to
    the same rows."""
    jvm = spark._jvm
    import json

    schema = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(SCHEMA))
    writer = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    )
    writer.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    f = str(tmp_path / "jvm.avro")
    writer.create(schema, jvm.java.io.File(f))
    # field `a` values exceed 2^31 so py4j ships java Longs (it boxes
    # small python ints as Integer, which the ["null","long"] union
    # rejects — and Long references can't be held across the bridge,
    # py4j auto-unboxes them back to python ints)
    jrows = [
        (2**40 + 1, "x", 1.5, True),
        (None, "yé", -2.25, False),
        (-(2**41), "", None, True),
    ]
    for a, b, c, d in jrows:
        rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
        rec.put("a", a)
        rec.put("b", b)
        rec.put("c", c)
        rec.put("d", d)
        writer.append(rec)
    writer.close()
    _, got = read_ocf(open(f, "rb").read())
    assert got == jrows


def test_distributed_roundtrip_and_idempotent_sink(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"s{i}", float(i) / 4, i % 2 == 0) for i in range(20)],
        "a long, b string, c double, d boolean",
    ).repartition(4)
    d = str(tmp_path / "w")
    assert write_avro(df, d) == 20
    got = read_avro(spark, d, "a bigint, b string, c double, d boolean")
    assert sorted(r["a"] for r in got.collect()) == list(range(20))
    # narrower re-run leaves no orphan shards
    assert write_avro(df.limit(3).repartition(1), d) == 3
    assert read_avro(spark, d, "a bigint, b string, c double, d boolean").count() == 3
    # empty drop reads as empty typed frame
    e = str(tmp_path / "none")
    import os

    os.makedirs(e)
    assert read_avro(spark, e, "a bigint, b string, c double, d boolean").count() == 0


def test_ocf_survives_truncation_and_corruption_at_every_byte(tmp_path):
    """The multimodal decoders' r10 fuzz discipline applied to the
    Avro OCF parser: every byte-boundary truncation and every
    single-byte mutation (0x00/0xFF/+1) of a valid OCF blob must parse
    or raise ValueError/NotImplementedError. The sweep found that a
    corrupted header can hold VALID JSON of the wrong shape —
    KeyError('fields') — so read_ocf now validates the record shape."""
    from etl_knlp_spark.sources.avro import read_ocf, write_ocf

    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": ["null", "string"]},
        ],
    }
    f = str(tmp_path / "t.avro")
    write_ocf(iter([(1, "x"), (2, None), (3, "yz")]), schema, f)
    blob = open(f, "rb").read()
    read_ocf(blob)  # the full blob must parse

    escapes = []
    for cut in range(len(blob)):
        try:
            read_ocf(blob[:cut])
        except (ValueError, NotImplementedError):
            pass
        except Exception as exc:  # noqa: BLE001 — the contract under test
            escapes.append(("cut", cut, type(exc).__name__))
    for pos in range(len(blob)):
        for val in (0x00, 0xFF, (blob[pos] + 1) & 0xFF):
            if val == blob[pos]:
                continue
            mut = blob[:pos] + bytes([val]) + blob[pos + 1 :]
            try:
                read_ocf(mut)
            except (ValueError, NotImplementedError):
                pass
            except Exception as exc:  # noqa: BLE001
                escapes.append(("mut", pos, val, type(exc).__name__, str(exc)[:50]))
    assert not escapes, escapes[:10]

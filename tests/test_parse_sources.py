"""Raw-text readers vs FIXTURES.md quirk cases (SURVEY.md §2.1 S1-S3)."""

from __future__ import annotations

import pytest

from etl_knlp_spark.sources.text import read_delimited, read_tuple_burst

HANJA = "가:家:가족, 가정\n각:各:각자\n간:間:시간:공간:기간\n\nnocolonline\n"
WIKI = "600:5:지미 카터\n600:9:수학\n1234:42:역사: 고대\n"
LANGLINK = (
    "5,en,Jimmy Carter),(5,ja,ジミー・カーター),(9,ja,数学),"
    "(9,en,Mathematics, the science\n"
)


@pytest.fixture(scope="module")
def paths(tmp_path_factory):
    d = tmp_path_factory.mktemp("raw")
    (d / "hanja.txt").write_text(HANJA, encoding="utf-8")
    (d / "wiki.txt").write_text(WIKI, encoding="utf-8")
    (d / "langlink.txt").write_text(LANGLINK, encoding="utf-8")
    return d


def test_delimited_ragged_overflow_joins(spark, paths):
    rows = {
        r["korean"]: r
        for r in read_delimited(
            spark, str(paths / "hanja.txt"), ["korean", "hanjya", "examples"], sep=":"
        ).collect()
    }
    assert len(rows) == 4  # blank line dropped
    assert rows["가"]["examples"] == "가족, 가정"
    # ragged line: overflow fields rejoin into the last column (dag-knlp.py:105)
    assert rows["간"]["examples"] == "시간:공간:기간"
    # no-delimiter line: missing fields are NULL, not a crash
    assert rows["nocolonline"]["hanjya"] is None
    assert rows["nocolonline"]["examples"] is None


def test_delimited_ragged_overflow_array(spark, paths):
    df = read_delimited(
        spark,
        str(paths / "hanja.txt"),
        ["korean", "hanjya", "examples"],
        sep=":",
        overflow="array",
    )
    assert df.schema["examples"].dataType.simpleString() == "array<string>"
    rows = {r["korean"]: r for r in df.collect()}
    assert rows["간"]["examples"] == ["시간", "공간", "기간"]
    assert rows["nocolonline"]["examples"] == []


def test_wiki_index_title_with_colon(spark, paths):
    rows = {
        r["word_id"]: r
        for r in read_delimited(
            spark, str(paths / "wiki.txt"), ["edit_id", "word_id", "korean"], sep=":"
        ).collect()
    }
    # title containing ':' stays intact via overflow rejoin (FIXTURES.md A2)
    assert rows["42"]["korean"] == "역사: 고대"
    assert rows["5"]["korean"] == "지미 카터"


def _hadoop_lines(data: bytes) -> list[bytes]:
    """Hadoop LineRecordReader's split rule, mirrored byte-for-byte:
    lines break on \\r\\n, \\r, or \\n; a trailing terminator does not
    produce a final empty line; an empty file has no lines."""
    import re

    if not data:
        return []
    parts = re.split(b"\r\n|\r|\n", data)
    if parts[-1] == b"" and re.search(b"(\r\n|\r|\n)$", data):
        parts.pop()
    return parts


def _kept_lines(data: bytes) -> list[str]:
    """The readers' blank-line filter, mirrored: Spark's `trim` strips
    ONLY the space character (probed — tab/NUL/VT all survive), and
    malformed UTF-8 decodes to non-blank U+FFFD on both engines."""
    out = []
    for raw in _hadoop_lines(data):
        s = raw.decode("utf-8", errors="replace")
        if s.strip(" "):
            out.append(s)
    return out


def _fuzz_corpus(fixture: bytes) -> list[bytes]:
    """Every-prefix truncation + single-byte mutation (0x00, 0xFF,
    value+1) — the same sweep the eleven media codecs get."""
    variants = [fixture[:cut] for cut in range(len(fixture))]
    for i in range(len(fixture)):
        for nb in (0, 0xFF, (fixture[i] + 1) % 256):
            variants.append(fixture[:i] + bytes([nb]) + fixture[i + 1 :])
    return variants


def test_read_delimited_survives_truncation_and_mutation(spark, tmp_path):
    """r10 verdict #7: extend the codec fuzz discipline to the text
    sources. A ragged/overflow text source has no 'malformed payload'
    class — every byte string is legal text — so the contract is:
    NEVER raise, keep the declared schema, and conserve rows exactly
    (parsed rows == non-blank Hadoop lines across the corpus; silent
    row loss or duplication is the text-source analog of a codec
    escape). All variants are read in one distributed scan."""
    fixture = HANJA.encode("utf-8")
    variants = _fuzz_corpus(fixture)
    d = tmp_path / "fuzz_delim"
    d.mkdir()
    for i, v in enumerate(variants):
        (d / f"v{i:05d}.txt").write_bytes(v)
    expected = sum(len(_kept_lines(v)) for v in variants)

    df = read_delimited(
        spark, str(d), ["korean", "hanjya", "examples"], sep=":"
    )
    assert df.columns == ["korean", "hanjya", "examples"]
    assert df.count() == expected, (
        "row conservation broke under truncation/mutation fuzz"
    )

    arr = read_delimited(
        spark,
        str(d),
        ["korean", "hanjya", "examples"],
        sep=":",
        overflow="array",
    )
    assert arr.schema["examples"].dataType.simpleString() == "array<string>"
    assert arr.count() == expected


def test_read_tuple_burst_survives_truncation_and_mutation(spark, tmp_path):
    """Sibling sweep for the row-multiplying reader: rows must equal
    the mirrored per-line '),('-split non-blank tuple count — an
    explode that drops or double-counts a tuple under a mangled
    separator is the escape class here."""
    import re

    fixture = LANGLINK.encode("utf-8")
    variants = _fuzz_corpus(fixture)
    d = tmp_path / "fuzz_burst"
    d.mkdir()
    for i, v in enumerate(variants):
        (d / f"v{i:05d}.txt").write_bytes(v)
    expected = sum(
        1
        for v in variants
        for line in _kept_lines(v)
        for tup in re.split(r"\),\(", line)
        if tup.strip(" ")
    )

    df = read_tuple_burst(
        spark, str(d), ["article_id", "language", "text"]
    )
    assert df.columns == ["article_id", "language", "text"]
    assert df.count() == expected, (
        "tuple conservation broke under truncation/mutation fuzz"
    )


def test_tuple_burst_fanout_and_comma_overflow(spark, paths):
    df = read_tuple_burst(
        spark, str(paths / "langlink.txt"), ["article_id", "language", "text"]
    )
    rows = df.collect()
    # one line fans out to 4 rows (the reference's only row-multiplying op)
    assert len(rows) == 4
    by_key = {(r["article_id"], r["language"]): r["text"] for r in rows}
    # same article_id links to many languages (join-quirk fixture, SURVEY §2.3)
    assert ("5", "en") in by_key and ("5", "ja") in by_key
    # comma inside text overflows and rejoins losslessly (dag-knlp.py:179)
    assert by_key[("9", "en")] == "Mathematics, the science"

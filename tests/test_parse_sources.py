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

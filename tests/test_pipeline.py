"""End-to-end reference pipeline on FIXTURES.md-shaped raw files."""

from __future__ import annotations

import pytest

from etl_knlp_spark.plans.pipeline import run_reference_pipeline

# word_id 5 has langlinks in BOTH en and ja (the §2.3 fan-out quirk);
# word_id 9 links only ja; 42 has no langlink (left-join NULL).
WIKI = "600:5:지미 카터\n600:9:수학\n1234:42:역사: 고대\n700:5:지미 카터\n"
LANGLINK = "5,en,Jimmy Carter),(5,ja,ジミー・カーター),(9,ja,数学\n"
HANJA = "수학:數學:산수, 수식\n가:家:가족\n"


@pytest.fixture(scope="module")
def result(spark, tmp_path_factory):
    raw = tmp_path_factory.mktemp("raw")
    (raw / "wiki_index.txt").write_text(WIKI, encoding="utf-8")
    (raw / "langlink.txt").write_text(LANGLINK, encoding="utf-8")
    (raw / "hanja.txt").write_text(HANJA, encoding="utf-8")
    stage = str(tmp_path_factory.mktemp("stage"))
    return run_reference_pipeline(spark, str(raw), stage)


def test_tables_loaded_with_identity(result):
    assert result.korean.columns == ["edit_id", "word_id", "korean", "data_id"]
    assert result.row_count == 4
    ids = [r["data_id"] for r in result.korean.collect()]
    assert len(set(ids)) == len(ids)


def test_dq_checks_pass(result):
    assert result.max_word_id_len <= 13


def test_dimension_preserves_language_fanout(result):
    """dag-knlp.py:78 joins on article_id with NO language filter — an
    article linking to en and ja yields a row per language (the quirk
    the oracle must reproduce, SURVEY.md §2.3)."""
    rows = result.dimension.collect()
    word5 = {(r["korean"], r["japanese"]) for r in rows if r["word_id"] == "5"}
    assert word5 == {("지미 카터", "Jimmy Carter"), ("지미 카터", "ジミー・カーター")}


def test_dimension_distinct_dedups_duplicate_titles(result):
    """word_id 5 appears twice in the index (edit 600 and 700) with the
    same title; DISTINCT on the 4 projected columns collapses them —
    so exactly 2 rows remain for word 5 (one per language), not 4."""
    n5 = sum(1 for r in result.dimension.collect() if r["word_id"] == "5")
    assert n5 == 2


def test_dimension_left_join_null_semantics(result):
    rows = {r["word_id"]: r for r in result.dimension.collect()}
    # word 42 has no langlink and no hanja entry → NULLs preserved
    assert rows["42"]["japanese"] is None
    assert rows["42"]["hanjya"] is None
    # word 9 joins hanja via the korean title (수학 → 數學)
    assert rows["9"]["hanjya"] == "數學"


def test_ragged_wiki_title_survives_parse(result):
    """'역사: 고대' contains the delimiter — the wiki-index parse packs
    the overflow back into the title column (dag-knlp.py:136-137), so
    the full title reaches the dimension table intact."""
    rows = {r["word_id"]: r for r in result.dimension.collect()}
    assert rows["42"]["korean"] == "역사: 고대"


def test_corpus_funnel_is_monotone_and_consistent(spark, sf_dir):
    from etl_knlp_spark.plans.corpus import corpus_funnel

    n = {r["stage"]: r["n"] for r in corpus_funnel(spark, sf_dir).collect()}
    assert set(n) == {"raw", "clean", "quality", "dedup", "packed"}
    # every filter stage can only shrink the doc set
    assert n["raw"] >= n["clean"] >= n["quality"] >= n["dedup"] > 0
    # packing merges docs into sequences: never more sequences than docs
    assert 0 < n["packed"] <= n["dedup"]

"""DQ operators vs the reference's runtime assertions (SURVEY.md §2.9)."""

from __future__ import annotations

import pytest

from etl_knlp_spark.operators.quality import (
    check_count,
    check_max_length,
    drop_na_rows,
    enforce_varchar,
)


@pytest.fixture(scope="module")
def words(spark):
    # word_id ≤ 13 chars passes the reference's threshold (dag-knlp.py:400)
    return spark.createDataFrame(
        [("1", "short", "가"), ("2", "exactly13char", "각"), ("3", None, "간")],
        ["edit_id", "word_id", "korean"],
    )


def test_check_count_passes_and_returns_n(words):
    assert check_count(words) == 3


def test_check_count_raises_on_empty(spark, words):
    with pytest.raises(ValueError, match="quality check failed"):
        check_count(words.filter("edit_id = 'nope'"))


def test_check_max_length_at_threshold(words):
    assert check_max_length(words, "word_id", 13) == 13


def test_check_max_length_raises_above_threshold(spark):
    # FIXTURES.md A2: a 14-char word_id must FAIL the check
    bad = spark.createDataFrame([("1", "fourteen-chars",)], ["edit_id", "word_id"])
    with pytest.raises(ValueError, match="quality check failed"):
        check_max_length(bad, "word_id", 13)


def test_drop_na_rows(words):
    assert drop_na_rows(words, subset=["word_id"]).count() == 2


def test_enforce_varchar_truncates(words):
    out = {
        r["edit_id"]: r["word_id"]
        for r in enforce_varchar(words, {"word_id": 5}).collect()
    }
    assert out["2"] == "exact"
    assert out["1"] == "short"
    assert out["3"] is None


def test_column_profile_covers_all_columns_with_sane_stats(spark, sf_dir):
    from etl_knlp_spark.operators.quality import column_profile

    rows = {r["col"]: r for r in column_profile(spark, sf_dir).collect()}
    assert set(rows) == {"doc_id", "text", "lang", "source", "n_chars"}
    for r in rows.values():
        assert r["n_null"] >= 0
        assert r["n_distinct"] <= r["n_present"] + r["n_null"]
        assert r["min_v"] <= r["max_v"] or r["n_present"] == 0
    # doc_id is a unique key in the testdata
    assert rows["doc_id"]["n_distinct"] == rows["doc_id"]["n_present"]


def test_observed_write_metrics_match_direct_aggregates(spark, sf_dir):
    """Metrics observed during a noop materialization must equal the
    same aggregates computed by a dedicated pass — the single-pass
    shortcut changes cost, not values."""
    from pyspark.sql import functions as F

    from etl_knlp_spark.catalog import load_table
    from etl_knlp_spark.operators.quality import observed_write

    docs = load_table(spark, sf_dir, "documents")
    got = observed_write(
        docs,
        {"n": F.count(F.lit(1)), "mx": F.max("n_chars"), "s": F.sum("n_chars")},
    )
    direct = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.max("n_chars").alias("mx"),
        F.sum("n_chars").alias("s"),
    ).collect()[0]
    assert got["n"] == direct["n"]
    assert got["mx"] == direct["mx"]
    assert got["s"] == direct["s"]


def test_kanon_release_suppresses_and_reconciles(spark, sf_dir):
    """No released group may be smaller than k, and the '__other__'
    bucket must absorb the suppressed mass exactly: released totals
    reconcile to the raw corpus totals."""
    from pyspark.sql import functions as F

    from etl_knlp_spark.catalog import load_table
    from etl_knlp_spark.operators.stats import kanon_release

    rows = kanon_release(spark, sf_dir).collect()
    for r in rows:
        if r["lang"] != "__other__":
            assert r["n_docs"] >= 5
    docs = load_table(spark, sf_dir, "documents")
    want = docs.agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("s")
    ).collect()[0]
    assert sum(r["n_docs"] for r in rows) == want["n"]
    assert sum(r["total_chars"] for r in rows) == want["s"]
    # the fixture actually exercises suppression
    assert any(r["lang"] == "__other__" for r in rows)


def test_column_drift_fires_on_a_shifted_candidate_batch(spark):
    """On a corpus whose newer half is systematically longer, the
    monitor must flag drift with the right z; on the homogeneous
    testdata halves it must stay quiet (both branches exercised)."""
    import tempfile
    import uuid

    from etl_knlp_spark.operators.stats import column_drift

    rows = [(i, "w " * 50, "en", "s", 100 + (i % 7)) for i in range(50)]
    rows += [(50 + i, "w " * 50, "en", "s", 400 + (i % 7)) for i in range(50)]
    docs = spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    )
    d = tempfile.mkdtemp(prefix=f"drift_{uuid.uuid4().hex[:6]}_")
    docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    r = column_drift(spark, d).collect()[0]
    assert r["n_base"] == r["n_cand"] == 50
    assert r["chars_drifted"] and r["chars_drift_z"] > 10

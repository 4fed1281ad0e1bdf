"""Hash-split determinism, stability under repartitioning, proportions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_knlp_spark.catalog import load_table
from etl_knlp_spark.operators.sampling import sample_by_hash, split_by_hash


def test_split_deterministic_and_partition_stable(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = {r["doc_id"]: r["split"] for r in split_by_hash(docs, "doc_id", {"train": 80, "val": 10, "test": 10}).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in split_by_hash(
            docs.repartition(13), "doc_id", {"train": 80, "val": 10, "test": 10}
        ).collect()
    }
    assert a == b


def test_split_proportions_roughly_match(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = split_by_hash(docs, "doc_id", {"train": 80, "val": 10, "test": 10})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    n = sum(counts.values())
    assert set(counts) == {"train", "val", "test"}
    assert 0.7 < counts["train"] / n < 0.9
    assert 0.04 < counts["val"] / n < 0.17


def test_sample_is_subset_of_train_range(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    s10 = {r["doc_id"] for r in sample_by_hash(docs, "doc_id", 10).collect()}
    s20 = {r["doc_id"] for r in sample_by_hash(docs, "doc_id", 20).collect()}
    assert s10 <= s20  # nested percent ranges give nested samples
    assert 0 < len(s10) < len(s20)


def test_split_percent_validation(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError, match="sum to 100"):
        split_by_hash(docs, "doc_id", {"train": 50, "test": 40})


def test_sample_importance_weight_extremes(spark):
    """Weight 1 keeps every row, weight 0 keeps none, and the kept set
    is identical across runs (digest coin, not rand())."""
    from etl_knlp_spark.operators.sampling import sample_importance

    df = spark.range(500).select(F.col("id").alias("doc_id"))
    assert sample_importance(df, "doc_id", F.lit(1.0)).count() == 500
    assert sample_importance(df, "doc_id", F.lit(0.0)).count() == 0
    half = F.lit(0.5)
    a = {r["doc_id"] for r in sample_importance(df, "doc_id", half).collect()}
    b = {r["doc_id"] for r in sample_importance(df, "doc_id", half).collect()}
    assert a == b
    assert 150 < len(a) < 350  # ~binomial(500, 0.5)


def test_budget_select_takes_greedy_quality_prefix(spark):
    """Within a source, selection must be exactly the greedy prefix in
    (n_chars desc, doc_id) order whose running token sum stays within
    the budget — once a doc busts the budget, it and everything after
    it stay unselected even if a later shorter doc would still fit
    (prefix rule, not knapsack — deterministic and windowable)."""
    from etl_knlp_spark.operators.sampling import budget_select
    import tempfile, uuid

    rows = [
        # source s: quality order by n_chars desc → doc 1 (600 tok),
        # doc 2 (300 tok busts 800), doc 3 (100 tok would fit but is
        # after the bust in quality order)
        (1, " ".join(["w"] * 600), "en", "s", 9000),
        (2, " ".join(["w"] * 300), "en", "s", 5000),
        (3, " ".join(["w"] * 100), "en", "s", 1000),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    )
    d = tempfile.mkdtemp(prefix=f"budget_{uuid.uuid4().hex[:6]}_")
    docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = {r["doc_id"]: r for r in budget_select(spark, d).collect()}
    assert out[1]["selected"] and out[1]["cum_tokens"] == 600
    assert not out[2]["selected"] and out[2]["cum_tokens"] == 900
    assert not out[3]["selected"] and out[3]["cum_tokens"] == 1000


def test_weighted_sample_biased_toward_long_docs(spark, sf_dir):
    """A-ES with token-count weights must overrepresent long docs:
    the sample's mean token count should exceed the corpus mean (the
    size-biased expectation), and the draw must be deterministic."""
    from etl_knlp_spark.operators.sampling import sample_weighted

    got = sample_weighted(spark, sf_dir).collect()
    assert len(got) == 100
    assert [r.rank for r in sorted(got, key=lambda r: r.rank)] == list(range(1, 101))
    sample_mean = sum(r.n_tokens for r in got) / len(got)
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    corpus_mean = (
        docs.select(
            F.avg(F.size(F.split(F.trim(F.lower("text")), r"\s+"))).alias("m")
        ).collect()[0]["m"]
    )
    assert sample_mean > corpus_mean
    again = sample_weighted(spark, sf_dir).collect()
    assert {(r.doc_id, r.rank) for r in again} == {(r.doc_id, r.rank) for r in got}

"""Dedup operators: exact, MinHash-LSH recall, SimHash neighbors."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_knlp_spark.catalog import load_table
from etl_knlp_spark.operators.dedup import (
    dedup_simhash,
    exact_dedup,
    minhash_candidates,
    simhash_neardup_pairs,
    simhash_signatures,
)


@pytest.fixture(scope="module")
def docs_with_dups(spark, sf_dir):
    """documents plus near-identical copies of the first 20 docs
    (one word appended → Jaccard on char-shingles stays ≥0.9)."""
    docs = load_table(spark, sf_dir, "documents")
    dups = (
        docs.filter(F.col("doc_id") < 20)
        .select(
            (F.col("doc_id") + 100_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" tail")).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
    )
    return docs.unionByName(dups)


def test_exact_dedup_removes_exact_copies(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    doubled = docs.unionByName(docs)
    assert exact_dedup(doubled, ["text"]).count() == docs.count()


def test_minhash_finds_injected_near_dups(docs_with_dups):
    cands = minhash_candidates(docs_with_dups)
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    verified = cands.withColumn("j", inter / union).filter(F.col("j") >= 0.7)
    found = {
        (r["doc_a"], r["doc_b"]) for r in verified.select("doc_a", "doc_b").collect()
    }
    # every injected pair (i, i+100000) should be recalled: Jaccard ≈ 0.98
    # and P(band collision) > 1 - (1-0.98^4)^8 ≈ 1 - 1e-13
    expected = {(i, i + 100_000) for i in range(20)}
    assert expected <= found


def test_simhash_identical_docs_collide(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    copies = docs.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 100_000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    sigs = simhash_signatures(docs.unionByName(copies))
    pairs = simhash_neardup_pairs(sigs, max_hamming=3)
    found = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in pairs.collect()}
    for i in range(10):
        # identical text → identical signature → hamming 0
        assert found.get((i, i + 100_000)) == 0


def test_simhash_signature_is_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = {r["doc_id"]: r["simhash"] for r in simhash_signatures(docs).collect()}
    b = {r["doc_id"]: r["simhash"] for r in simhash_signatures(docs).collect()}
    assert a == b


def test_dedup_simhash_query_shape(spark, sf_dir):
    out = dedup_simhash(spark, sf_dir)
    assert out.columns == ["doc_id", "simhash"]
    assert out.count() == load_table(spark, sf_dir, "documents").count()

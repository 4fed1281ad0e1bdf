"""Greedy sequence packing: budget, order, and coverage invariants."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_knlp_spark.catalog import load_table
from etl_knlp_spark.operators.packing import pack_sequences


def test_packing_invariants_on_documents(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    budget = 256
    packed = pack_sequences(docs, budget=budget)

    # every doc packed exactly once
    assert packed.count() == docs.count()
    assert packed.select("doc_id").distinct().count() == docs.count()

    # budget respected except singleton-oversized sequences
    seqs = packed.groupBy("lang", "seq_id").agg(
        F.sum("n_tokens").alias("total"), F.count(F.lit(1)).alias("n_docs")
    )
    violators = seqs.filter(
        (F.col("total") > budget) & (F.col("n_docs") > 1)
    ).count()
    assert violators == 0

    # greedy tightness: consecutive sequences can't be merged — a
    # sequence opens only because the previous one couldn't take the
    # next doc, so total + next sequence's FIRST doc must exceed budget
    first_doc = packed.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("lang", "seq_id").orderBy("doc_id")
        ),
    ).filter(F.col("rn") == 1)
    merged = (
        seqs.alias("s")
        .join(
            first_doc.alias("f"),
            (F.col("s.lang") == F.col("f.lang"))
            & (F.col("s.seq_id") + 1 == F.col("f.seq_id")),
        )
        .filter(F.col("s.total") + F.col("f.n_tokens") <= budget)
        .count()
    )
    assert merged == 0


def test_packing_order_and_oversized(spark):
    rows = [
        (1, "en", "a " * 99),   # 100 tokens? "a "*99 strip -> 99 tokens
        (2, "en", "b " * 49),
        (3, "en", "c " * 499),  # oversized alone
        (4, "en", "d " * 9),
    ]
    docs = spark.createDataFrame(
        [(i, lang, t.strip()) for i, lang, t in rows],
        "doc_id long, lang string, text string",
    )
    packed = {
        r["doc_id"]: r for r in pack_sequences(docs, budget=100).collect()
    }
    # docs 1 (99) fills seq 0; doc 2 (49) opens seq 1; doc 3 (499)
    # exceeds any budget -> its own seq 2; doc 4 (9) opens seq 3
    # (greedy does NOT backtrack to seq 1 — in-order semantics)
    assert packed[1]["seq_id"] == 0
    assert packed[2]["seq_id"] == 1
    assert packed[3]["seq_id"] == 2
    assert packed[4]["seq_id"] == 3
    # seq_id non-decreasing in doc_id order
    ids = [packed[i]["seq_id"] for i in sorted(packed)]
    assert ids == sorted(ids)


def test_packing_is_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = {(r["doc_id"], r["seq_id"]) for r in pack_sequences(docs).collect()}
    b = {(r["doc_id"], r["seq_id"]) for r in pack_sequences(docs).collect()}
    assert a == b

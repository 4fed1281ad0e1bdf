"""Count-min sketch, fuzzy join, and inverted index contracts."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_knlp_spark.operators.sketches import _EPS, cms_estimate
from etl_knlp_spark.registry import all_queries


def test_cms_never_undercounts_and_respects_bound(spark):
    rows = [("alpha",)] * 50 + [("beta",)] * 20 + [("gamma",)] * 3 + [("delta",)] * 1
    toks = spark.createDataFrame(rows, ["token"])
    exact = toks.groupBy("token").agg(F.count(F.lit(1)).alias("ct"))
    est = cms_estimate(toks, exact.select("token"), "token")
    joined = {
        r["token"]: (r["ct"], r["cms_est"])
        for r in exact.join(est, "token").collect()
    }
    n = len(rows)
    assert set(joined) == {"alpha", "beta", "gamma", "delta"}
    for ct, e in joined.values():
        assert e >= ct  # CMS theorem: counters only over-count
        assert e <= ct + _EPS * n + 1  # bound holds w.h.p. (deterministic here)


def test_fuzzy_join_matches_bruteforce(spark, sf_dir):
    got = {
        (r["k1"], r["k2"])
        for r in all_queries()["fuzzy_join_names"](spark, sf_dir).collect()
    }

    import itertools

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    parts = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .select("p_partkey", "p_name", "p_brand")
        .collect()
    )
    want = set()
    for a, b in itertools.combinations(
        sorted(parts, key=lambda r: r["p_partkey"]), 2
    ):
        same_block = (
            a["p_brand"] == b["p_brand"]
            and a["p_name"].split(" ")[1] == b["p_name"].split(" ")[1]
        )
        if same_block and lev(a["p_name"], b["p_name"]) <= 1:
            want.add((a["p_partkey"], b["p_partkey"]))
    assert got == want


def test_inverted_index_bounded_postings(spark, sf_dir):
    rows = all_queries()["inverted_index"](spark, sf_dir).collect()
    assert rows  # common tokens exist at every SF
    for r in rows:
        ids = [int(x) for x in r["posting_head"].split(",")]
        assert len(ids) <= 20
        assert ids == sorted(ids)
        assert len(ids) == min(r["n_docs"], 20)
        assert r["total_tf"] >= r["n_docs"] >= 5


def test_kmv_merge_equals_sketch_of_union(spark):
    """Mergeability, exactly: bottom-k of (sketch(A) ∪ sketch(B)) ==
    sketch(A ∪ B) — deterministic, no tolerance. Plus the estimator's
    accuracy on a set well above k."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from etl_knlp_spark.operators.sketches import _KMV_K, kmv_sketch

    a = spark.createDataFrame([Row(key=f"a{i}") for i in range(3000)])
    b = spark.createDataFrame(
        [Row(key=f"a{i}") for i in range(1500, 3000)]
        + [Row(key=f"b{i}") for i in range(2000)]
    )
    ka, kb = kmv_sketch(a, "key"), kmv_sketch(b, "key")
    merged = sorted(
        r.h for r in ka.union(kb).distinct().orderBy("h").limit(_KMV_K).collect()
    )
    direct = sorted(r.h for r in kmv_sketch(a.union(b), "key").collect())
    assert merged == direct and len(direct) == _KMV_K
    theta = direct[-1]
    est = (_KMV_K - 1) / theta
    assert abs(est - 5000) / 5000 < 0.25  # |A∪B| = 5000, k=256 → rse ~6%


def test_mg_all_tied_partitions_keep_pivot(spark, tmp_path):
    """Regression (r8 advice): when a partition's top k+1 token counts
    all tie, the per-partition MG summary keeps NO tokens — but its
    pivot d must still reach the merged undercount bound D, or
    exact <= est + D fails on legal data. Every token distinct →
    every partition's counts all equal 1 → every summary empty."""
    from pyspark.sql import Row

    from etl_knlp_spark.operators.sketches import mg_heavy_hitters

    docs = spark.createDataFrame(
        [
            Row(doc_id=i, text=f"uniq{i}a uniq{i}b uniq{i}c",
                lang="en", source="t", n_chars=20)
            for i in range(300)  # 900 distinct tokens >> k=64 per partition
        ]
    )
    sf = str(tmp_path)
    docs.repartition(4).write.parquet(f"{sf}/documents.parquet")
    row = mg_heavy_hitters(spark, sf).collect()[0]
    assert row.n_tokens == 900
    assert row.n_true_heavy == 0
    assert row.all_heavy_present
    assert row.est_le_exact
    assert row.exact_le_est_plus_d  # pre-fix: FALSE (d_sum undercounted/NULL)
    assert row.d_within_bound


def test_mg_guarantee_on_planted_skew(spark):
    """MG bound exercised where it's tight: a Zipf-ish stream where
    the summary must surface every item above N/(k+1) and never
    overcount, across an adversarial partition layout."""
    import random

    from pyspark.sql import Row
    from pyspark.sql import functions as F

    rng = random.Random(11)
    stream = (["hot"] * 4000 + ["warm"] * 900
              + [f"cold{rng.randint(0, 4000)}" for _ in range(5000)])
    rng.shuffle(stream)
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(stream[i::97])) for i in range(97)]
    ).repartition(13)
    from etl_knlp_spark.operators import sketches

    # drive the registered query's machinery through a tiny k by
    # monkey-binding: rebuild the aggregate inline with k=8
    import pandas as pd

    k = 8
    toks = docs.select(
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("tok")
    )

    def mg(pdf: pd.DataFrame) -> pd.DataFrame:
        counts = pdf["tok"].value_counts()
        d = int(counts.iloc[k]) if len(counts) > k else 0
        kept = counts[counts > d] - d
        out = kept.reset_index()
        out.columns = ["tok", "est"]
        out["d"] = d
        out["pid"] = int(pdf["pid"].iloc[0])
        return out

    part = toks.withColumn("pid", F.spark_partition_id())
    summ = part.groupBy("pid").applyInPandas(
        mg, "tok string, est long, d long, pid long"
    )
    rows = summ.collect()
    d_sum = sum({r.pid: r.d for r in rows}.values())
    est = {}
    for r in rows:
        est[r.tok] = est.get(r.tok, 0) + r.est
    exact = {}
    for t in stream:
        exact[t] = exact.get(t, 0) + 1
    n = len(stream)
    assert d_sum <= n / (k + 1)
    for t, c in exact.items():
        if c > n / (k + 1):
            assert est.get(t, 0) > 0, t
        assert est.get(t, 0) <= c
        assert c <= est.get(t, 0) + d_sum, t

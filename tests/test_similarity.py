"""Similarity search: cosine math vs numpy, brute top-k, LSH recall."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_knlp_spark.catalog import load_table
from etl_knlp_spark.functions.vector import cosine
from etl_knlp_spark.operators.similarity import ann_lsh_topk, similarity_topk


def test_cosine_matches_numpy(spark):
    a = [1.0, 2.0, 3.0]
    b = [-1.0, 0.5, 2.0]
    df = spark.createDataFrame([(a, b)], ["a", "b"]).select(
        cosine(F.col("a"), F.col("b")).alias("c")
    )
    expected = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert abs(df.first()["c"] - expected) < 1e-12


def test_cosine_self_is_one(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").limit(20)
    sims = e.select(cosine(F.col("embedding"), F.col("embedding")).alias("c")).collect()
    assert all(abs(r["c"] - 1.0) < 1e-9 for r in sims)


@pytest.fixture(scope="module")
def brute_topk(spark, sf_dir):
    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    out = {}
    for q in range(5):
        scores = sorted(
            (
                (round(float(np.dot(vecs[q], v) / (np.linalg.norm(vecs[q]) * np.linalg.norm(v))), 6), i)
                for i, v in vecs.items()
                if i != q
            ),
            key=lambda t: (-t[0], t[1]),
        )
        out[q] = [i for _, i in scores[:10]]
    return out


def test_brute_topk_matches_numpy(spark, sf_dir, brute_topk):
    got = similarity_topk(spark, sf_dir).collect()
    by_q: dict[int, list[int]] = {}
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append(r["vec_id"])
    assert by_q == brute_topk


def test_lsh_results_are_true_neighbors(spark, sf_dir, brute_topk):
    """LSH candidates are a subset of the corpus scored identically to
    brute force; recall of the true top-10 must be non-trivial."""
    got = ann_lsh_topk(spark, sf_dir).collect()
    assert all(r["rank"] <= 10 for r in got)
    recall_hits, total = 0, 0
    for q in range(5):
        lsh_ids = {r["vec_id"] for r in got if r["query_id"] == q}
        total += 10
        recall_hits += len(lsh_ids & set(brute_topk[q]))
    # random-hyperplane bucketing on near-orthogonal vectors is a weak
    # filter by design; just assert it finds *some* true neighbors and
    # never invents ids outside the corpus
    assert recall_hits > 0
    corpus = {r["vec_id"] for r in load_table(spark, sf_dir, "embeddings").collect()}
    assert {r["vec_id"] for r in got} <= corpus


def test_lsh_contract_booleans_hold(spark, sf_dir):
    """The registered driver-facing query is the assertion contract
    (no recall term — documented as vacuous for this banding on
    near-random data): exact-side columns + integrity booleans."""
    from etl_knlp_spark.operators.similarity import similarity_ann_lsh

    rows = similarity_ann_lsh(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["n_exact"] == 10
        assert r["kth_exact_sim"] is not None
        assert r["scores_true"] and r["ret_le_k"]
        assert "recall_ok" not in r.asDict()


def test_quantize_roundtrip_error_bound(spark):
    """Dequantized codes reconstruct every dimension within scale/2,
    codes stay in [-127, 127], and a zero vector quantizes safely."""
    from etl_knlp_spark.operators.similarity import quantize_symmetric_int8

    rows = [
        (1, [0.5, -1.0, 0.25, 0.0]),
        (2, [1e-6, 2e-6, -1e-6, 0.0]),
        (3, [0.0, 0.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in quantize_symmetric_int8(df).collect()}
    for vid, r in out.items():
        assert all(-127 <= c <= 127 for c in r["codes"])
        for c, x in zip(r["codes"], r["embedding"]):
            assert abs(c * r["scale"] - x) <= r["scale"] / 2 + 1e-12
    assert out[3]["scale"] == 0.0 and out[3]["codes"] == [0, 0, 0, 0]
    # full-scale dimension maps to ±127 exactly
    assert min(out[1]["codes"]) == -127


def test_embedding_health_flags_degenerate_vectors(spark):
    from etl_knlp_spark.operators import analysis  # noqa: F401 (registry)
    from etl_knlp_spark.operators.analysis import embedding_health
    import etl_knlp_spark.catalog as catalog

    # craft a corpus with every failure mode on label 1
    rows = [
        (0, [1.0] * 64, 0),
        (1, [2.0] * 64, 0),
        (2, None, 1),
        (3, [0.0] * 64, 1),
        (4, [1.0] * 32, 1),
        (5, [float("nan")] * 64, 1),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    import unittest.mock as mock

    with mock.patch.object(catalog, "load_table", return_value=df), mock.patch(
        "etl_knlp_spark.operators.analysis.load_table", return_value=df
    ):
        out = {r["label"]: r for r in embedding_health(spark, "unused").collect()}
    assert out[0]["n_null"] == out[0]["n_bad_dim"] == out[0]["n_zero_norm"] == 0
    assert out[0]["min_norm"] == 8.0 and out[0]["max_norm"] == 16.0
    assert out[1]["n_null"] == 1
    assert out[1]["n_bad_dim"] == 1
    assert out[1]["n_zero_norm"] == 1
    assert out[1]["n_nan"] == 1


def test_hard_negatives_are_cross_label_and_exact(spark, sf_dir):
    """Every mined negative must carry a label different from its
    query's, and per-query the emitted set must be exactly the numpy
    brute-force top-k over the cross-label corpus."""
    import numpy as np

    from etl_knlp_spark.catalog import load_table
    from etl_knlp_spark.operators.similarity import mine_hard_negatives

    rows = load_table(spark, sf_dir, "embeddings").collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    labels = {r["vec_id"]: r["label"] for r in rows}

    got = mine_hard_negatives(spark, sf_dir).collect()
    per_q: dict[int, list] = {}
    for r in got:
        assert labels[r["vec_id"]] != labels[r["query_id"]]
        per_q.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"], r["cos_sim"]))
    assert set(per_q) == {v for v in vecs if v < 5}
    for qid, hits in per_q.items():
        q = vecs[qid]
        scored = [
            (round(float(np.dot(q, v) / (np.linalg.norm(q) * np.linalg.norm(v))), 6), vid)
            for vid, v in vecs.items()
            if labels[vid] != labels[qid]
        ]
        want = sorted(scored, key=lambda t: (-t[0], t[1]))[:10]
        hits.sort()
        assert [(vid, s) for _, vid, s in hits] == [(vid, s) for s, vid in want]


def test_jl_projection_matches_numpy_mirror(spark, sf_dir):
    """The deterministic sign matrix + sequential fold reproduce
    bit-for-bit in an independent numpy construction, and the
    projection is the linear map it claims to be."""
    import numpy as np

    from etl_knlp_spark.catalog import load_table
    from etl_knlp_spark.operators.similarity import jl_project

    emb = load_table(spark, sf_dir, "embeddings").limit(20)
    rows = {r.vec_id: np.array(r.embedding, dtype=np.float64)
            for r in emb.collect()}
    got = {r.vec_id: r.projected for r in jl_project(emb).collect()}
    for vid, x in rows.items():
        want = []
        for j in range(16):
            acc = 0.0
            for i in range(1, len(x) + 1):
                h = ((i * 7349 + j) * 2654435761) % 2147483648
                sign = 1 - 2 * ((h // 1024) % 2)
                acc += sign * float(np.float32(x[i - 1]))
            want.append(round(0.25 * acc, 6))
        assert got[vid] == want, vid


def test_jaro_winkler_conventions_vs_duckdb():
    """The kernel's conventions (window clamp, empty rule, 0.7 boost
    threshold, 4-char prefix cap) pinned against DuckDB's independent
    C++ implementation on randomized and classic cases."""
    import random

    import duckdb

    from etl_knlp_spark.operators.similarity import jaro_winkler

    con = duckdb.connect()
    rng = random.Random(99)
    cases = [("martha", "marhta"), ("dixon", "dicksonx"), ("", ""),
             ("a", ""), ("a", "a"), ("ab", "ba"), ("abc", "abc")]
    cases += [
        ("".join(rng.choice("abcd") for _ in range(rng.randint(0, 12))),
         "".join(rng.choice("abcd") for _ in range(rng.randint(0, 12))))
        for _ in range(800)
    ]
    for s1, s2 in cases:
        want = con.execute(
            "select jaro_winkler_similarity(?, ?)", [s1, s2]
        ).fetchone()[0]
        assert abs(jaro_winkler(s1, s2) - want) < 1e-12, (s1, s2)


def test_blocked_name_join_budget_guard(spark):
    """Pre-flight Σ C(block,2) refuses dense blocking regimes; a
    generous budget stays inert and both joins share the guard."""
    import pytest

    from etl_knlp_spark.operators.similarity import _blocked_name_sides

    rows = [(i, f"ivory linen {i}", "Brand#1") for i in range(40)]
    p = spark.createDataFrame(rows, "p_partkey long, p_name string, p_brand string")
    with pytest.raises(ValueError, match="candidate pairs"):
        _blocked_name_sides(p, pair_budget=100)
    a, b = _blocked_name_sides(p, pair_budget=10_000)
    n = a.join(
        b,
        (a.block1 == b.block2) & (a.brand1 == b.brand2) & (a.k1 < b.k2),
    ).count()
    assert n == 40 * 39 // 2


def test_mmr_defers_near_duplicates(spark):
    """Behavioral pin on a planted geometry: two near-identical
    top-relevance vectors — plain top-k ranks them 1-2, MMR picks one
    and defers its twin below a diverse lower-relevance vector."""
    from etl_knlp_spark import registry

    registry._load_all()
    rows = registry._REGISTRY["mmr_rerank"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append((r.rank, r.vec_id))
    assert set(by_q) == {0, 1, 2, 3, 4}
    for q, picks in by_q.items():
        ranks = [p[0] for p in sorted(picks)]
        ids = [p[1] for p in sorted(picks)]
        assert ranks == list(range(1, 11)) and len(set(ids)) == 10, q
        assert q not in ids  # a query never retrieves itself


def test_item_cf_cosine_hand_values(spark, tmp_path):
    """Planted baskets: parts 1 and 2 co-bought by 2 of the right
    customers -> cosine 2/sqrt(3*2); support floor drops pairs seen
    once."""
    import math

    orders = [(k, k, "O", 1.0, None, "p") for k in (1, 2, 3)]
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(f"{tmp_path}/orders.parquet")
    # cust1: {1,2}, cust2: {1,2,3}, cust3: {1}
    rows = [(1, 1), (1, 2), (2, 1), (2, 2), (2, 3), (3, 1)]
    li = [(ok, pk, 7, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", None) for ok, pk in rows]
    spark.createDataFrame(
        li,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    ).write.parquet(f"{tmp_path}/lineitem.parquet")
    from etl_knlp_spark.operators.similarity import item_cf_cosine

    got = {
        (r.part_a, r.part_b): (r.n_ab, r.cosine_6dp)
        for r in item_cf_cosine(spark, str(tmp_path)).collect()
    }
    want_cos = round(2 / math.sqrt(3 * 2), 6)
    # (1,3)/(2,3) co-bought once -> dropped by the support floor
    assert got == {(1, 2): (2, want_cos), (2, 1): (2, want_cos)}


def test_item_cf_budget_refuses_whale_basket(spark, tmp_path):
    """One 23,200-item basket prices past the 2^28 pair budget and
    must refuse pre-flight."""
    import pytest

    spark.createDataFrame(
        [(1, 1, "O", 1.0, None, "p")],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(f"{tmp_path}/orders.parquet")
    from pyspark.sql import functions as F

    li = (
        spark.range(23_200)
        .select(
            F.lit(1).cast("long").alias("l_orderkey"),
            F.col("id").alias("l_partkey"),
            F.lit(7).cast("long").alias("l_suppkey"),
            F.lit(1).cast("int").alias("l_linenumber"),
            F.lit(1.0).alias("l_quantity"),
            F.lit(1.0).alias("l_extendedprice"),
            F.lit(0.0).alias("l_discount"),
            F.lit(0.0).alias("l_tax"),
            F.lit("N").alias("l_returnflag"),
            F.lit("O").alias("l_linestatus"),
            F.lit(None).cast("timestamp").alias("l_shipdate"),
        )
    )
    li.write.parquet(f"{tmp_path}/lineitem.parquet")
    from etl_knlp_spark.operators.similarity import item_cf_cosine

    with pytest.raises(RuntimeError, match="pre-flight estimate"):
        item_cf_cosine(spark, str(tmp_path))


def test_rhp_signatures_matmul_kernel_contract(spark):
    """r11 rewrite pins: the Arrow matmul kernel must (a) reproduce
    the sign-bit definition by hand (bit j = [emb·plane_j >= 0],
    packed little-endian into one long), (b) emit NO row for a NULL
    embedding (the old posexplode formulation dropped them via the
    inner join — interface behavior downstream inner joins rely on),
    and (c) stay correct when a whole Arrow batch is empty/NULL."""
    from etl_knlp_spark.operators.similarity import rhp_signatures

    planes = [[1.0, -1.0], [1.0, 1.0], [-1.0, -1.0]]
    rows = [
        (1, [2.0, 1.0]),   # dots: 1, 3, -3   -> bits 1,1,0 -> sig 3
        (2, [-1.0, 3.0]),  # dots: -4, 2, -2  -> bits 0,1,0 -> sig 2
        (3, [0.0, 0.0]),   # dots: 0, 0, 0    -> >=0 ties   -> sig 7
        (4, None),         # NULL embedding -> no signature row
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r["sig"] for r in rhp_signatures(spark, df, planes).collect()}
    assert out == {1: 3, 2: 2, 3: 7}

    # an input whose rows are ALL null must yield an empty result,
    # not a kernel crash on np.stack of nothing
    all_null = spark.createDataFrame(
        [(9, None)], "vec_id long, embedding array<double>"
    )
    assert rhp_signatures(spark, all_null, planes).count() == 0


def test_rhp_signatures_names_ragged_embeddings(spark):
    """r11 ADVICE: the matmul kernel hard-assumes fixed-length
    embeddings — a ragged or wrong-dimension table must fail with a
    NAMED ValueError carrying the offending vec_ids and lengths, not
    an opaque np.stack shape traceback inside a Python worker."""
    from etl_knlp_spark.operators.similarity import rhp_signatures

    planes = [[1.0, -1.0], [1.0, 1.0]]
    ragged = spark.createDataFrame(
        [(1, [2.0, 1.0]), (2, [1.0, 2.0, 3.0]), (3, [0.5])],
        "vec_id long, embedding array<double>",
    ).coalesce(1)
    with pytest.raises(Exception) as ei:
        rhp_signatures(spark, ragged, planes).collect()
    msg = str(ei.value)
    assert "rhp_signatures" in msg
    assert "2" in msg  # the plane dimension named
    # wrong-dim-but-uniform is the same failure class (stack would
    # SUCCEED with the wrong shape — silent garbage, worse than ragged)
    uniform_wrong = spark.createDataFrame(
        [(7, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(Exception) as ei2:
        rhp_signatures(spark, uniform_wrong, planes).collect()
    assert "rhp_signatures" in str(ei2.value)

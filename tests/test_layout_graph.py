"""Physical layout (pruning, bucketing) and graph clustering tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_knlp_spark.catalog import load_table
from etl_knlp_spark.operators.graph import connected_components
from etl_knlp_spark.sources.layout import bucketed_join, write_bucketed, write_partitioned


def test_partition_pruning_reaches_the_scan(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_by_lang")
    write_partitioned(docs, path, ["lang"])
    filtered = spark.read.parquet(path).filter(F.col("lang") == "en")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "lang" in plan
    # pruning is semantic too: same rows as the unpartitioned filter
    assert filtered.count() == docs.filter(F.col("lang") == "en").count()


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    spark.sql("DROP TABLE IF EXISTS li_bkt")
    spark.sql("DROP TABLE IF EXISTS ord_bkt")
    write_bucketed(li, "li_bkt", "l_orderkey", n_buckets=8, sort_col="l_orderkey")
    write_bucketed(orders, "ord_bkt", "o_orderkey", n_buckets=8, sort_col="o_orderkey")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketed_join(spark, "li_bkt", "ord_bkt", "l_orderkey", "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: shuffle eliminated
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE li_bkt")
        spark.sql("DROP TABLE ord_bkt")


def test_connected_components_chain_and_islands(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 20)], ["src", "dst"]
    )
    comp = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert comp[1] == comp[2] == comp[3] == comp[4] == 1
    assert comp[10] == comp[11] == 10
    assert comp[20] == 20


def test_connected_components_converges_on_star(spark):
    # star graph: hub 0 connected to 50 leaves — diameter 2
    edges = spark.createDataFrame([(0, i) for i in range(1, 51)], ["src", "dst"])
    comp = connected_components(edges)
    assert comp.select("component").distinct().count() == 1
    assert comp.count() == 51


def test_zorder_buckets_are_locally_narrow(spark, sf_dir):
    """A z-bucket (z >> 16) fixes the top 8 bits of BOTH 16-bit
    dimensions, so per-bucket span is < 256 in each — exactly, on
    full-range synthetic data. On the sf tables the custkey range is
    smaller than one z-cell (nothing to narrow), but the day dimension
    must still shrink."""
    from pyspark.sql import functions as F

    from etl_knlp_spark.sources.layout import layout_zorder, zorder_value

    syn = spark.range(20000).select(
        ((F.col("id") * 2654435761) % 65536).alias("a"),
        ((F.col("id") * 40503 + 17) % 65536).alias("b"),
    )
    z = zorder_value(F.col("a"), F.col("b"))
    spans = (
        syn.select("a", "b", F.shiftright(z, 16).alias("bucket"))
        .groupBy("bucket")
        .agg(
            (F.max("a") - F.min("a")).alias("sa"),
            (F.max("b") - F.min("b")).alias("sb"),
        )
        .collect()
    )
    assert len(spans) > 50
    assert all(r["sa"] <= 255 and r["sb"] <= 255 for r in spans)

    rows = layout_zorder(spark, sf_dir).collect()
    g_day = max(r["max_day"] for r in rows) - min(r["min_day"] for r in rows)
    import statistics

    assert statistics.median(r["max_day"] - r["min_day"] for r in rows) <= g_day / 2


def test_write_zordered_files_prune_both_dims(spark, sf_dir, tmp_path):
    """Files written z-ordered carry narrow per-file min/max on both
    cluster columns, so a filter on either column skips most files."""
    from pyspark.sql import functions as F

    from etl_knlp_spark.catalog import load_table
    from etl_knlp_spark.sources.layout import write_zordered

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")).alias("day"),
    )
    path = str(tmp_path / "zord")
    write_zordered(orders, path, "o_custkey", "day", n_files=16)
    per_file = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("f"))
        .agg(
            (F.max("o_custkey") - F.min("o_custkey")).alias("cust_span"),
            (F.max("day") - F.min("day")).alias("day_span"),
        )
        .collect()
    )
    assert len(per_file) >= 8
    g = orders.agg(
        (F.max("o_custkey") - F.min("o_custkey")).alias("c"),
        (F.max("day") - F.min("day")).alias("d"),
    ).first()
    import statistics

    # sf custkey range (~150) is below one z-cell (256) — no pruning
    # possible on that axis at this SF; the day axis must prune.
    assert g["c"] < 256
    assert statistics.median(r["day_span"] for r in per_file) <= g["d"] / 2


def test_pagerank_matches_numpy_power_iteration(spark):
    import numpy as np

    from etl_knlp_spark.operators.graph import pagerank

    # 5-node graph with a dangling node (4) and a 2-cycle
    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (2, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, 0.85, 12).collect()}

    n = 5
    M = np.zeros((n, n))
    out = {}
    for s, d in edges:
        out[s] = out.get(s, 0) + 1
    for s, d in edges:
        M[d, s] = 1.0 / out[s]
    r = np.full(n, 1.0 / n)
    dangling = [i for i in range(n) if i not in out]
    for _ in range(12):
        dm = sum(r[i] for i in dangling)
        r = (1 - 0.85) / n + 0.85 * (M @ r + dm / n)
    assert abs(sum(got.values()) - 1.0) < 1e-9  # mass conserved
    for i in range(n):
        assert abs(got[i] - r[i]) < 1e-9, (i, got[i], r[i])


def test_pagerank_query_contract(spark, sf_dir):
    from etl_knlp_spark.operators.graph import pagerank_trade_ranks
    from etl_knlp_spark.registry import all_queries

    rows = pagerank_trade_ranks(spark, sf_dir).collect()
    total = sum(r["rank"] for r in rows)
    assert abs(total - 1.0) < 1e-6  # mass conserved (unrounded)
    supp = [r for r in rows if r["is_supplier"]]
    cust = [r for r in rows if not r["is_supplier"]]
    assert supp and cust
    # suppliers only RECEIVE mass: their mean rank must exceed customers'
    assert (sum(r["rank_6dp"] for r in supp) / len(supp)) > (
        sum(r["rank_6dp"] for r in cust) / len(cust)
    )
    # the registered query is the assertion contract the driver hashes
    c = all_queries()["pagerank_links"](spark, sf_dir).collect()
    assert len(c) == 1
    assert c[0]["rank_sum_ok"] and c[0]["ranks_positive"]
    assert c[0]["n_nodes"] == len(rows) and c[0]["n_suppliers"] == len(supp)


def test_triangle_counts_known_graphs(spark):
    from etl_knlp_spark.operators.graph import triangle_counts

    # K4 (every node: deg 3, 3 triangles, coeff 1.0) plus a pendant
    # node 5-0 (node 5: deg 1, 0 triangles, coeff 0.0) and an isolated
    # edge 6-7.
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges += [(5, 0), (6, 7)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: (r.degree, r.n_triangles, r.clustering_6dp)
           for r in triangle_counts(df).collect()}
    for n in range(4):
        want_deg = 4 if n == 0 else 3
        want_coeff = round(2 * 3 / (want_deg * (want_deg - 1)), 6)
        assert got[n] == (want_deg, 3, want_coeff), n
    assert got[5] == (1, 0, 0.0)
    assert got[6] == (2 - 1, 0, 0.0) or got[6] == (1, 0, 0.0)
    assert got[7] == (1, 0, 0.0)


def test_triangle_counts_match_naive_on_random_graphs(spark):
    """Degree-ordered counting == brute-force enumeration on random
    graphs (including duplicate/reversed/self-loop input edges, which
    the operator must canonicalize away)."""
    import itertools
    import random

    from etl_knlp_spark.operators.graph import triangle_counts

    rng = random.Random(31337)
    for trial in range(3):
        n = rng.randint(8, 16)
        und = {tuple(sorted((a, b)))
               for a in range(n) for b in range(n)
               if a != b and rng.random() < 0.35}
        noisy = [e if rng.random() < 0.7 else (e[1], e[0]) for e in und]
        noisy += [rng.choice(noisy) for _ in range(5)] + [(0, 0)]
        df = spark.createDataFrame(noisy, "src long, dst long")
        adj = {v: set() for v in range(n)}
        for a, b in und:
            adj[a].add(b); adj[b].add(a)
        want_tri = {v: 0 for v in range(n)}
        for x, y, z in itertools.combinations(range(n), 3):
            if y in adj[x] and z in adj[x] and z in adj[y]:
                for v in (x, y, z):
                    want_tri[v] += 1
        got = {r.node: (r.degree, r.n_triangles)
               for r in triangle_counts(df).collect()}
        for v in range(n):
            if adj[v]:
                assert got[v] == (len(adj[v]), want_tri[v]), (trial, v)
            else:
                assert v not in got, (trial, v)


def test_cooccurrence_edge_budget_guard(spark):
    """Pre-flight pair budget refuses quadratic co-activity regimes
    with the estimate in the error; generous budgets stay inert."""
    import datetime

    import pytest

    from etl_knlp_spark.operators.graph import cooccurrence_edges

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, base + datetime.timedelta(seconds=i % 60), i % 40, "click")
        for i in range(200)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    with pytest.raises(RuntimeError, match="pre-flight estimate"):
        cooccurrence_edges(ev, pair_budget=10)
    n = cooccurrence_edges(ev, pair_budget=10_000).count()
    assert n == 40 * 39 // 2  # all 40 users share the single bucket


def test_hilbert_value_matches_reference(spark):
    """The codegen'd fold == the classic xy2d walk, on random coords."""
    import random

    from pyspark.sql import functions as F

    from etl_knlp_spark.sources.layout import hilbert_value

    def xy2d(n, x, y):
        d, s = 0, n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = n - 1 - x, n - 1 - y
                x, y = y, x
            s //= 2
        return d

    rng = random.Random(6502)
    coords = [(rng.randint(0, 65535), rng.randint(0, 65535)) for _ in range(200)]
    coords += [(0, 0), (65535, 65535), (0, 65535), (1, 0)]
    df = spark.createDataFrame(coords, "x long, y long")
    got = {
        (r.x, r.y): r.h
        for r in df.select(
            "x", "y", hilbert_value(F.col("x"), F.col("y")).alias("h")
        ).collect()
    }
    for x, y in coords:
        assert got[(x, y)] == xy2d(65536, x, y), (x, y)


def test_hilbert_buckets_no_wider_than_zorder(spark, sf_dir):
    """The measured payoff: bucketing by the Hilbert index yields
    per-bucket (customer, day) rectangles whose mean spans are no
    wider than z-order's on the same data — unit-step locality vs
    quadrant jumps."""
    from etl_knlp_spark import registry

    registry._load_all()
    z = registry._REGISTRY["layout_zorder"].fn(spark, sf_dir).collect()
    h = registry._REGISTRY["layout_hilbert"].fn(spark, sf_dir).collect()

    def mean_spans(rows):
        cust = sum(r.max_cust - r.min_cust for r in rows) / len(rows)
        day = sum(r.max_day - r.min_day for r in rows) / len(rows)
        return cust, day

    zc, zd = mean_spans(z)
    hc, hd = mean_spans(h)
    # allow 5% tolerance on either axis; assert the combined area is
    # strictly no worse
    assert hc * hd <= zc * zd * 1.05, (hc, hd, zc, zd)


def test_star_contraction_survives_deep_graphs(spark):
    """A 600-node path graph (diameter 599): min-label propagation
    moves one hop per round and raises at max_iter, star contraction
    converges in O(log² n) alternations with the same components."""
    import pytest

    from etl_knlp_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    path = [(i, i + 1) for i in range(599)]
    df = spark.createDataFrame(path, "src long, dst long")
    got = {r.node: r.component
           for r in connected_components_star(df).collect()}
    assert got == {i: 0 for i in range(600)}
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=5)


def test_star_contraction_matches_propagation_random(spark):
    import random

    from etl_knlp_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(2718)
    edges = [(rng.randint(0, 60), rng.randint(0, 60)) for _ in range(70)]
    edges = [e for e in edges if e[0] != e[1]]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = {(r.node, r.component) for r in connected_components(df, max_iter=30).collect()}
    b = {(r.node, r.component) for r in connected_components_star(df).collect()}
    assert a == b


def test_kcore_known_onion_graph(spark):
    """Layered 'onion': a 5-clique core, each core node also linked to
    a chain of degree-2/1 pendants — peeling must remove pendant
    layers one round at a time and stop exactly at the clique."""
    from etl_knlp_spark.operators.graph import k_core

    clique = [(a, b) for a in range(5) for b in range(5) if a < b]
    chains = []
    nxt = 5
    for root in range(5):
        chains += [(root, nxt), (nxt, nxt + 1)]  # 2-deep pendant chain
        nxt += 2
    df = spark.createDataFrame(clique + chains, "src long, dst long")
    got = {r.u: r.core_degree for r in k_core(df, 3).collect()}
    # only the clique survives k=3; in-core degree is 4 everywhere
    assert got == {i: 4 for i in range(5)}
    # k=2: chains' inner nodes have degree 2 but peel anyway once the
    # leaf (degree 1) goes — classic cascade
    got2 = {r.u: r.core_degree for r in k_core(df, 2).collect()}
    assert set(got2) == set(range(5))


def test_kcore_matches_naive_peel_random(spark):
    import random

    from etl_knlp_spark.operators.graph import k_core

    rng = random.Random(97)
    edges = list({(a, b) for a, b in
                  ((rng.randint(0, 40), rng.randint(0, 40)) for _ in range(120))
                  if a != b})
    df = spark.createDataFrame(edges, "src long, dst long")
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for k in (2, 3, 4, 5):
        nodes = set(adj)
        while True:
            drop = {u for u in nodes if len(adj[u] & nodes) < k}
            if not drop:
                break
            nodes -= drop
        want = {u: len(adj[u] & nodes) for u in nodes}
        got = {r.u: r.core_degree for r in k_core(df, k).collect()}
        assert got == want, k


def test_kcore_edge_budget_refuses_with_remedies(spark):
    import pytest

    from etl_knlp_spark.operators.graph import k_core

    df = spark.createDataFrame(
        [(i, i + 1) for i in range(100)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="edge_budget"):
        k_core(df, 2, edge_budget=50)
    # under budget still works
    assert k_core(df, 1, edge_budget=10_000).count() == 101


def test_ktruss_matches_naive_peel_random(spark):
    import collections
    import random

    from etl_knlp_spark.operators.graph import k_truss

    rng = random.Random(31)
    edges = list({(min(a, b), max(a, b)) for a, b in
                  ((rng.randint(0, 30), rng.randint(0, 30)) for _ in range(140))
                  if a != b})
    df = spark.createDataFrame(edges, "src long, dst long")
    for k in (3, 4, 5):
        cur = set(edges)
        while True:
            nb = collections.defaultdict(set)
            for a, b in cur:
                nb[a].add(b)
                nb[b].add(a)
            drop = {(a, b) for a, b in cur if len(nb[a] & nb[b]) < k - 2}
            if not drop:
                break
            cur -= drop
        nb = collections.defaultdict(set)
        for a, b in cur:
            nb[a].add(b)
            nb[b].add(a)
        want = {(a, b): len(nb[a] & nb[b]) for a, b in cur}
        got = {(r.a, r.b): r.support for r in k_truss(df, k).collect()}
        assert got == want, k


def test_ktruss_is_subgraph_of_kminus1_core(spark):
    """Structural invariant: the k-truss's nodes lie inside the
    (k-1)-core (every truss edge has >= k-2 triangle partners, so
    every truss node has degree >= k-1 within the truss)."""
    import random

    from etl_knlp_spark.operators.graph import k_core, k_truss

    rng = random.Random(77)
    edges = list({(min(a, b), max(a, b)) for a, b in
                  ((rng.randint(0, 25), rng.randint(0, 25)) for _ in range(120))
                  if a != b})
    df = spark.createDataFrame(edges, "src long, dst long")
    truss_nodes = set()
    for r in k_truss(df, 4).collect():
        truss_nodes |= {r.a, r.b}
    core_nodes = {r.u for r in k_core(df, 3).collect()}
    assert truss_nodes <= core_nodes


def test_label_propagation_splits_bridged_triangles(spark):
    """Two triangles joined by a single bridge: connected components
    would merge them, LPA's local-majority rule keeps them apart —
    final labels hand-simulated for the deterministic min-label
    tiebreak over 3 synchronous rounds."""
    from etl_knlp_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12), (3, 10)],
        ["src", "dst"],
    )
    got = {r.node: r.lab for r in label_propagation(edges, rounds=3).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 3, 11: 3, 12: 3}


def test_label_propagation_clique_converges_to_min_id(spark):
    """A clique stabilizes on the minimum node id (the tiebreak
    winner of round 1 floods the majority by round 2)."""
    from etl_knlp_spark.operators.graph import label_propagation

    k5 = [(i, j) for i in range(1, 6) for j in range(i + 1, 6)]
    edges = spark.createDataFrame(k5, ["src", "dst"])
    got = {r.node: r.lab for r in label_propagation(edges, rounds=3).collect()}
    assert set(got.values()) == {1}


def test_bfs_distances_on_known_shapes(spark):
    """Chain 1-2-3-4 plus island 10-11: exact hop counts from both
    sources, unreachable nodes absent."""
    from etl_knlp_spark.operators.graph import bfs_distances

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], ["src", "dst"]
    )
    srcs = spark.createDataFrame([(1,), (10,)], ["s"])
    got = {
        (r.source_id, r.node): r.dist
        for r in bfs_distances(edges, srcs).collect()
    }
    assert got == {
        (1, 1): 0, (1, 2): 1, (1, 3): 2, (1, 4): 3,
        (10, 10): 0, (10, 11): 1,
    }


def test_bfs_max_depth_caps_the_frontier(spark):
    from etl_knlp_spark.operators.graph import bfs_distances

    edges = spark.createDataFrame([(i, i + 1) for i in range(10)], ["src", "dst"])
    srcs = spark.createDataFrame([(0,)], ["s"])
    got = bfs_distances(edges, srcs, max_depth=3).collect()
    assert max(r.dist for r in got) == 3 and len(got) == 4

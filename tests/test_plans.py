"""Physical-plan regression tests: the scale-critical plan properties
PLANS.md documents must survive future edits — a correctness-green
change that silently drops pushdown or broadcasts the wrong side is a
performance regression the oracle can't catch.
"""

from __future__ import annotations

import pytest

from etl_knlp_spark import registry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def plans(spark):
    qs = registry.all_queries()

    def plan_of(name: str) -> str:
        return qs[name](spark, SF)._jdf.queryExecution().executedPlan().toString()

    return plan_of


def test_filters_push_into_parquet_scan(plans):
    p = plans("filter_notnull")
    assert "PushedFilters" in p
    assert "GreaterThan(n_chars,100)" in p


def test_flagship_prunes_columns_and_broadcasts_dims(plans):
    p = plans("q1_dimension_build")
    assert "BroadcastHashJoin" in p  # both dims under threshold at test SF
    # column pruning: lineitem scan reads only the 2 needed columns
    assert "struct<l_orderkey:bigint,l_returnflag:string>" in p
    # r15 optimization pin: the trailing DISTINCT is elided (the
    # pre-join distinct + 1:1 PK joins make it provably redundant).
    # Exactly 2 HashAggregates remain (the pre-join distinct's
    # partial+final) and exactly 1 hash exchange — a regression
    # re-adding the final DISTINCT re-hashes every output row twice
    # (and, if a plan change ever breaks the subset-clustering reuse,
    # shuffles the whole dimension table a second time at 100 TB).
    assert p.count("HashAggregate") == 2
    assert p.count("Exchange hashpartitioning") == 1


def test_sort_limit_plans_as_top_k(plans):
    p = plans("sort_global")
    assert "TakeOrderedAndProject" in p  # never a global sort


def test_groupby_has_partial_aggregation(plans):
    p = plans("groupby_agg")
    assert p.count("HashAggregate") >= 2  # partial + final


def test_semi_anti_join_types(plans):
    assert "LeftSemi" in plans("join_semi")
    assert "LeftAnti" in plans("join_anti")


def test_similarity_broadcasts_query_side(plans):
    p = plans("similarity_topk")
    assert "Broadcast" in p  # corpus never shuffles for scoring


def test_window_rownum_uses_group_limit(plans):
    p = plans("window_rownum")
    assert "WindowGroupLimit" in p  # rank filter pushed below the shuffle


def test_ngram_df_cap_is_broadcast_anti_join(spark):
    """The document-frequency cap must stay a BROADCAST LeftAnti
    against the (tiny) hot-gram set — if it regresses to a shuffled
    join or a window over postings, the cap itself becomes a full
    posting-list shuffle at 100 TB. Pinned on `capped_postings`
    directly: the registered query localCheckpoints this stream, which
    truncates the lineage out of the final executed plan."""
    from etl_knlp_spark.catalog import load_table
    from etl_knlp_spark.operators.dedup import capped_postings

    p = (
        capped_postings(load_table(spark, SF, "documents"), max_df_abs=256)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftAnti" in p
    import re

    # the LeftAnti's build side is a BroadcastExchange keyed on (lang, gh)
    m = re.search(r"BroadcastHashJoin \[lang[^\]]*gh[^\]]*\], \[lang[^\]]*gh[^\]]*\], LeftAnti", p)
    assert m, p[:2000]


def test_salted_join_shuffles_on_salted_key(spark):
    """The 100× skew story: the probe side's exchange must partition on
    (key, _salt) — a hot key then lands on `buckets` reducers instead
    of one. If a refactor drops _salt from the shuffle key, salting
    silently stops mitigating skew while staying correctness-green.
    (Broadcast is disabled so the shuffle exchange actually exists —
    at 100 TB neither side of a skewed join broadcasts.)"""
    import re

    from etl_knlp_spark.catalog import load_table
    from etl_knlp_spark.functions.skew import salted_join

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = load_table(spark, SF, "orders")
        c = load_table(spark, SF, "customer")
        p = (
            salted_join(o, c, "o_custkey", "c_custkey", buckets=8)
            ._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    exchanges = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", p)
    assert any("_salt" in e and "o_custkey" in e for e in exchanges), exchanges
    assert any("_salt" in e and "c_custkey" in e for e in exchanges), exchanges


def test_salting_flattens_partition_distribution(spark):
    """Distribution-level evidence: with 90% of rows on one hot key,
    the max partition after a (k, _salt) shuffle holds ~1/buckets of
    the hot rows, vs ~all of them when shuffling on k alone."""
    from pyspark.sql import functions as F

    buckets = 8
    left = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    salt = F.pmod(F.xxhash64("k", "payload"), F.lit(buckets))
    plain_max = (
        left.repartition(32, "k")
        .withColumn("p", F.spark_partition_id())
        .groupBy("p").count().agg(F.max("count")).first()[0]
    )
    salted_max = (
        left.withColumn("_salt", salt)
        .repartition(32, "k", "_salt")
        .withColumn("p", F.spark_partition_id())
        .groupBy("p").count().agg(F.max("count")).first()[0]
    )
    assert plain_max >= 9_000  # the hot key concentrates on one reducer
    assert salted_max <= plain_max / 4  # salting spreads it ≥4× thinner


def test_q4_exists_plans_as_semi_join(plans):
    # correlated EXISTS must become one semi hash join pass, never a
    # nested-loop or an aggregate-then-join rewrite
    assert "LeftSemi" in plans("q4_priority_check")


def test_q21_triple_reference_plans_as_semi_plus_anti(plans):
    p = plans("q21_waiting_suppliers")
    assert "LeftSemi" in p
    assert "LeftAnti" in p
    # top-k, not a global sort
    assert "TakeOrderedAndProject" in p


def test_q17_correlated_avg_partial_aggregates(plans):
    p = plans("q17_small_quantity")
    # the per-part aggregate combines map-side before its exchange
    assert p.count("HashAggregate") >= 2
    # brand/size-filtered part side broadcasts
    assert "BroadcastHashJoin" in p


def test_q19_disjunction_prunes_part_scan(plans):
    p = plans("q19_disjunctive_filter")
    # Catalyst factors the disjunction: the part scan must carry SOME
    # pushed predicate (the brand/size hull), not scan the whole table
    assert "PushedFilters: [" in p
    assert "p_brand" in p.split("part.parquet")[0].split("PushedFilters")[-1] or (
        "In(p_brand" in p or "Or(EqualTo(p_brand" in p
    )


def test_q1_aggregates_mapside_before_tiny_exchange(plans):
    p = plans("q1_pricing_summary")
    # partial + final HashAggregate: ~all work happens before the
    # 4-group exchange
    assert p.count("HashAggregate") >= 2
    assert "PushedFilters" in p


def test_q20_prefix_like_pushes_to_part_scan(plans):
    p = plans("q20_excess_suppliers")
    assert "StringStartsWith(p_name,small)" in p
    assert "LeftSemi" in p


def test_q16_blacklist_plans_as_broadcast_anti(plans):
    p = plans("q16_supplier_part_types")
    assert "LeftAnti" in p
    assert "Broadcast" in p


def test_pure_range_join_binned_is_hash_not_nested_loop(plans):
    p = plans("join_range_binned")
    assert "BroadcastHashJoin" in p
    assert "BroadcastNestedLoopJoin" not in p


def test_partition_prune_reads_only_matching_dirs(plans):
    p = plans("layout_partition_prune")
    # the date range must prune at the directory level, not as a data
    # filter inside file scans
    assert "PartitionFilters" in p
    assert "event_date" in p


def test_salted_agg_two_phase(spark):
    from pyspark.sql import functions as F

    from etl_knlp_spark.functions.skew import salted_agg

    df = spark.range(1000).select(
        (F.col("id") % 3).alias("k"), F.col("id").cast("double").alias("v")
    )
    plan = (
        salted_agg(df, ["k"], {"s": F.sum("v")}, buckets=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # two logical aggregations (salted partial, final) — each itself
    # partial+final = 4 HashAggregates before AQE collapses any
    assert plan.count("HashAggregate") >= 3


def _broadcast_ancestor_of_scan(plan: str, table: str) -> bool:
    """True if the FileScan of `table` sits under any BroadcastExchange.

    Walks the explain tree upward from the scan line: an ancestor is a
    previous line whose branch marker ('+- ' / ':- ') starts at a
    smaller column (the root line has no marker and is always an
    ancestor)."""
    lines = plan.splitlines()

    def marker_col(line: str) -> int:
        cols = [c for c in (line.find("+- "), line.find(":- ")) if c >= 0]
        return min(cols) if cols else -1

    idx = next(
        i for i, l in enumerate(lines) if "FileScan" in l and table in l
    )
    depth = marker_col(lines[idx])
    for line in reversed(lines[:idx]):
        col = marker_col(line)
        if col == -1 or col < depth:
            if "BroadcastExchange" in line:
                return True
            if col == -1:
                break
            depth = col
    return False


def test_q5_streams_the_fact_table(plans):
    """r16 optimization pin (r15 verdict #1): q5's join ORDER alone did
    not control the build side — the 4-column-pruned lineitem estimate
    fit under the 32 MB autoBroadcastJoinThreshold and the planner
    still broadcast the FACT table. The explicit F.broadcast(dims)
    hint pins the bounded region⋈nation⋈supplier chain as the build
    side; lineitem must never sit under a BroadcastExchange (a
    regression re-materializes the unbounded fact table on every
    executor at scale). Same pin for q3/q10, whose fact-left-deep
    trees currently stream lineitem by planner choice."""
    for q in ("q5_nation_volume", "q3_shipping_priority", "q10_returned_items"):
        p = plans(q)
        assert not _broadcast_ancestor_of_scan(p, "lineitem"), q


def test_agg_pushdown_reads_footer_stats(plans):
    p = plans("scan_agg_pushdown")
    assert "PushedAggregation" in p
    assert "BatchScan" in p


def test_dpp_join_prunes_at_runtime(plans):
    p = plans("layout_dpp_join")
    assert "dynamicpruning" in p.lower()


def test_runtime_bloom_filter_injected(plans):
    p = plans("runtime_bloom_join")
    assert "bloom_filter_agg" in p
    assert "might_contain" in p
    # and the conf that forced the shuffle join was restored
    from etl_knlp_spark.session import get_spark

    assert get_spark().conf.get("spark.sql.autoBroadcastJoinThreshold") != "-1"


def test_bm25_scan_path_has_no_corpus_shuffle(plans):
    """r15 optimization pin: the scan-path BM25 scores via map-side
    per-term counts (`_bm25_scored_scan`) — no posting explode, no
    (doc_id, term) tf shuffle, no per-doc score shuffle. The only
    exchanges are the ONE-ROW fused stats+df aggregate (SinglePartition
    + its broadcast) and the TakeOrderedAndProject top-k heap. A
    regression to the exploded-postings formulation reintroduces two
    corpus-sized hash exchanges."""
    p = plans("bm25_topk")
    # top-k must be a bounded heap, never a global sort
    assert "TakeOrderedAndProject" in p
    # no posting explode anywhere
    assert "Generate" not in p
    # ZERO hash-partitioned exchanges: nothing corpus-sized shuffles
    assert p.count("Exchange hashpartitioning") == 0
    # the fused one-row stats enter as a broadcast; no shuffle join
    assert "BroadcastExchange" in p
    assert "SortMergeJoin" not in p


def test_source_overlap_never_self_joins_the_shingle_stream(plans):
    p = plans("source_overlap")
    # pair expansion works off the aggregated per-shingle source sets:
    # collect_set partials, no join keyed on the raw shingle stream
    assert "collect_set" in p
    assert "SortMergeJoin" not in p
    # the per-source totals re-join onto the tiny pair matrix broadcast
    assert "BroadcastHashJoin" in p


def test_bm25_pruned_probes_only_query_term_buckets(spark):
    from etl_knlp_spark.operators.analysis import bm25_pruned, bm25_topk

    pruned = bm25_pruned(spark, SF)
    # identical results to the scan path — probing the index loses nothing
    assert sorted(map(tuple, pruned.collect())) == sorted(
        map(tuple, bm25_topk(spark, SF).collect())
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # the bucket predicate must reach the index scan as a partition
    # filter (directory-listing pruning), not a post-scan filter
    import re

    m = re.search(r"PartitionFilters: \[[^\]]*bucket[^\]]*IN", plan)
    assert m, "expected bucket IN (...) inside PartitionFilters"


def test_asof_tolerance_is_single_shuffle_no_join(plans):
    """The forward as-of must keep the union+window shape: exactly one
    hash exchange (user_id) and ZERO joins — a regression to the
    inequality-join formulation shuffles twice and fans out
    clicks × purchases."""
    p = plans("join_asof_tolerance")
    assert p.count("Exchange hashpartitioning") == 1
    assert "Join" not in p
    assert "Window" in p


def test_aqe_splits_skewed_join_partitions_at_runtime(spark):
    """The OTHER half of the skew story (salted_join is the manual
    lever): AQE itself must detect a runtime-skewed shuffle partition
    and split it — pinned by `SortMergeJoin(skew=true)` plus an
    `AQEShuffleRead skewed` node in the FINAL adaptive plan. One key
    owning half the rows with thresholds scaled to the fixture; the
    executed Dataset itself is collected because a write runs a
    separate QueryExecution whose finalized plan isn't visible on the
    DataFrame (isFinalPlan=false otherwise — the trap this test
    documents)."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "2KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 400_000).select(
            F.when(F.col("id") % 2 == 0, F.lit(7))
            .otherwise(F.col("id") % 997)
            .alias("k"),
            F.lit("x" * 100).alias("pad"),
        )
        right = spark.range(0, 997).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = left.join(right, "k").groupBy().count()
        assert j.collect()[0]["count"] == 400_000  # every row matched
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan
        assert "AQEShuffleRead skewed" in plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_join_hints_flip_the_physical_strategy(spark, sf_dir):
    """Strategy hints are the manual override when stats mislead the
    planner (the 100 TB escape hatch): the same logical join must
    plan as BroadcastHashJoin / SortMergeJoin / ShuffledHashJoin
    under the respective hint, all with identical results."""
    from pyspark.sql import functions as F

    from etl_knlp_spark.catalog import load_table

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")

    def plan_of(hinted):
        df = o.join(hinted, o.o_custkey == hinted.c_custkey)
        return df, df._jdf.queryExecution().executedPlan().toString()

    base, base_plan = plan_of(c.hint("broadcast"))
    _, merge_plan = plan_of(c.hint("merge"))
    _, shuffle_plan = plan_of(c.hint("shuffle_hash"))
    assert "BroadcastHashJoin" in base_plan
    assert "SortMergeJoin" in merge_plan
    assert "ShuffledHashJoin" in shuffle_plan
    n = base.count()
    for hint in ("merge", "shuffle_hash"):
        assert o.join(c.hint(hint), o.o_custkey == c.c_custkey).count() == n


def test_eval_prf_scans_corpus_once_through_checkpointed_cells(plans):
    """Round-7 plan audit: eval_prf_summary's three aggregation
    branches (n_gold / n_pred / tp) must read the localCheckpointed
    confusion-cell table — before the checkpoint, Catalyst re-ran the
    corpus scan AND the langid pandas UDF once per branch (three full
    scans, four ArrowEvalPython nodes for one evaluation)."""
    p = plans("eval_prf_summary")
    # every branch reads the materialized ≤|langs|² cell table
    assert "ExistingRDD" in p
    # no branch rescans the corpus or re-runs the prediction kernel
    assert "Scan parquet" not in p
    assert "ArrowEvalPython" not in p and "EvalPython" not in p


def test_hybrid_pruned_probes_index_and_never_tokenizes(spark):
    """The probe-composed hybrid stack: its lexical branch must read
    only the probed term buckets (PartitionFilters directory pruning,
    same subtree as bm25_pruned) and must NOT tokenize the corpus —
    no explode over a token array anywhere in the plan; the final
    fusion is a bounded top-k, not a global sort."""
    import re

    from etl_knlp_spark.operators.analysis import (
        hybrid_retrieval_rrf,
        hybrid_retrieval_rrf_pruned,
    )

    pruned = hybrid_retrieval_rrf_pruned(spark, SF)
    # identical results to the scan-path hybrid — the swap loses nothing
    assert sorted(map(tuple, pruned.collect())) == sorted(
        map(tuple, hybrid_retrieval_rrf(spark, SF).collect())
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[[^\]]*bucket[^\]]*IN", plan), (
        "expected bucket IN (...) PartitionFilters on the postings scan"
    )
    assert "Generate explode" not in plan  # zero query-time tokenization
    assert "TakeOrderedAndProject" in plan


def test_substring_spans_have_no_self_join_and_one_window_sort(plans):
    """dedup_substring's cost must stay independent of duplication
    density: the shingle stream joins a COUNT>1 dup set (a plain
    equi-join — never a shingle-stream self-join that would fan out
    df² like the pairwise family) and the island merge is one window
    pass; the checkpointed shingle stream (ExistingRDD) feeds both
    consumers so the corpus is scanned/exploded once."""
    p = plans("dedup_substring")
    assert "ExistingRDD" in p  # checkpointed shingle stream reused
    assert "Scan parquet" not in p  # ...instead of two corpus scans
    assert "CartesianProduct" not in p and "NestedLoop" not in p
    # exactly one aggregation pair (dup count) + one span groupBy —
    # partials run map-side in both
    assert p.count("Window") == 2  # lag flag + running island sum
    assert "SortMergeJoin" not in p or "BroadcastHashJoin" in p


def test_warc_read_is_scan_plus_parse_with_zero_exchanges(spark, tmp_path):
    """Crawl ingestion is embarrassingly parallel: binaryFile scan →
    MapInPandas, nothing else — any Exchange appearing here is a
    regression."""
    from etl_knlp_spark.catalog import load_table
    from etl_knlp_spark.sources.warc import read_warc, write_warc

    d = str(tmp_path / "w")
    write_warc(load_table(spark, SF, "documents"), d)
    p = read_warc(spark, d)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p
    assert "MapInPandas" in p


def test_incremental_screen_collapses_history_before_probe(spark):
    """The historical band table must truncate to the reps_per_bucket
    lowest ids per bucket BEFORE the probe join (candidates bounded at
    8 x reps per new doc at any historical density — since r8 a
    sorted collect_list slice with the giant-bucket min() routing, NOT
    a rank window: the window sorted the whole historical band table
    and cost 2x at the 100x probe, BASELINE.md r8), and no pair
    self-join may appear."""
    from pyspark.sql import functions as F

    from etl_knlp_spark.catalog import load_table
    from etl_knlp_spark.operators.dedup import incremental_minhash_screen

    docs = load_table(spark, SF, "documents")
    cut = docs.agg((F.max("doc_id") / 2).alias("cut"))
    d = docs.crossJoin(F.broadcast(cut))
    out = incremental_minhash_screen(
        d.filter(F.col("doc_id") < F.col("cut")).drop("cut"),
        d.filter(F.col("doc_id") >= F.col("cut")).drop("cut"),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the only cartesian is the harness's own one-row `cut` broadcast
    # (two splits of one table); the screen itself contributes none
    assert plan.count("CartesianProduct") <= 2
    # the bucket truncation is a bounded sorted-slice aggregate over
    # the band pair keys — the full-table sort (Window/row_number) the
    # r7 form paid is gone
    assert "collect_list" in plan and "band_hash" in plan
    assert "row_number" not in plan


def test_weighted_sample_plans_as_top_k_heaps(plans):
    """sample_weighted must NOT global-sort the corpus: the k-smallest
    race keys come from per-partition TakeOrdered heaps, and the rank
    window runs over the k-row winner set only."""
    p = plans("sample_weighted")
    assert "TakeOrderedAndProject" in p
    # no full-corpus Sort node feeding an Exchange (global sort shape)
    assert "Sort [race" not in p.split("TakeOrderedAndProject")[0]


def test_sentence_split_is_exchange_free(plans):
    """text_sentences is a pure map-side explode — any Exchange means
    someone added an accidental shuffle to a scan-shaped op."""
    p = plans("text_sentences")
    assert "Exchange" not in p


def test_bagofwords_shuffles_digests_not_text(plans):
    """dedup_bagofwords groups on the 32-byte md5, with partial
    aggregation below the exchange."""
    p = plans("dedup_bagofwords")
    assert "Exchange hashpartitioning(bow_fp" in p
    assert p.index("partial_min") > p.index("Exchange hashpartitioning(bow_fp")


def test_fixedwidth_read_is_projection_only(plans):
    p = plans("fixedwidth_roundtrip")
    assert "Exchange" not in p


def test_rake_and_pmi_topk_use_take_ordered(plans):
    """The corpus-wide top-k in rake_keywords / pmi_collocations must
    plan as TakeOrderedAndProject (per-partition top-k heaps + k-row
    merge), never a global sort of the full phrase/pair table —
    InferWindowGroupLimit skips empty partition specs, so the naive
    global row_number window would single-partition-sort everything."""
    for q in ("rake_keywords", "pmi_collocations"):
        p = plans(q)
        assert "TakeOrderedAndProject" in p, q


def test_attribution_time_decay_pushes_type_filters(plans):
    """Both event-type filters reach the parquet scan: the candidate
    join must never read non-view/non-purchase rows."""
    p = plans("attribution_time_decay")
    assert "PushedFilters" in p
    assert "EqualTo(event_type,purchase)" in p
    assert "EqualTo(event_type,view)" in p


def test_sequential_kernels_shuffle_once_on_user(plans):
    """cusum/holt: exactly one exchange (hashpartitioning on user_id
    into the applyInPandas groups) — a second exchange would mean the
    kernel re-shuffles its own output."""
    for q in ("cusum_changepoint", "holt_linear_trend"):
        p = plans(q)
        assert p.count("Exchange hashpartitioning") == 1, q
        assert "FlatMapGroupsInPandas" in p, q


def test_item_cf_partitioned_topk_uses_window_group_limit(plans):
    """Per-item top-10 is a PARTITIONED rank window, which
    InferWindowGroupLimit reduces to per-partition heaps (contrast
    the global-top-k queries that must route through
    TakeOrderedAndProject instead)."""
    p = plans("item_cf_cosine")
    assert "WindowGroupLimit" in p


def test_kn_topk_is_take_ordered_and_totals_broadcast(plans):
    p = plans("kneser_ney_bigrams")
    assert "TakeOrderedAndProject" in p
    assert "BroadcastExchange" in p  # the scalar B total never shuffles


def test_url_canonical_is_single_aggregate(plans):
    """The normalizer is map-side string work: exactly one exchange
    (the canonical-key hash aggregate)."""
    p = plans("url_canonical_dedup")
    assert p.count("Exchange hashpartitioning") == 1


def test_integer_unit_revenue_is_layout_invariant_on_boundary_sums(spark):
    """r11 determinism class, pinned behaviorally: a group whose true
    decimal revenue ends in .xx50 (the half-cent boundary that made
    ROUND(SUM(double), 2) a combine-order coin flip) must produce the
    IDENTICAL value under 1-partition and many-partition layouts with
    the integer-unit recipe. The fixture's 4-decimal addends sum to
    exactly 301.2550 — the boundary case q9 flipped on."""
    from pyspark.sql import functions as F

    from etl_knlp_spark.plans.tpch import _rev_u

    # ep * (1 - disc): 100.55*(1-0.05)=95.5225, 102.91*(1-0.01)=101.8809,
    # 103.8516*... build rows whose exact 4-decimal revenues sum to
    # a .xx50 total: 95.5225 + 101.8809 + 103.8516 = 301.2550
    rows = [
        (100.55, 0.05),   # 95.5225
        (102.91, 0.01),   # 101.8809
        (103.8516, 0.0),  # 103.8516  (4-dec price is legal input too)
        (0.01, 0.0),
    ] * 7  # replicate so multi-partition layouts actually split groups
    df = spark.createDataFrame(rows, "l_extendedprice double, l_discount double")

    def total(partitions: int) -> float:
        return (
            df.repartition(partitions)
            .agg((F.sum(_rev_u()) / F.lit(10000.0)).alias("revenue"))
            .collect()[0]["revenue"]
        )

    one, seven, thirtytwo = total(1), total(7), total(32)
    assert one == seven == thirtytwo, (one, seven, thirtytwo)
    # and the value is the exact decimal total, expressed the same way
    # the engine derives it (integer units / 1e4 — avoids re-deriving
    # it through different float arithmetic in the test):
    # 7 * (955225 + 1018809 + 1038516 + 100) units = 21088550
    assert one == 21088550 / 10000.0, one


def test_decimal_unit_sum_survives_past_bigint_range(spark):
    """r11 review hardening, pinned behaviorally: coarse-group money
    sums accumulate in DECIMAL(38,0) because BIGINT unit sums cross
    9.2e18 inside the 100 TB posture (q1's 1e-6-unit charge near
    sf~100, q11's global 1e-4-unit total near sf~2e4). Feed
    `_sum_u_dec` a group whose unit total exceeds BIGINT max and
    assert it returns the exact value — the BIGINT formulation it
    replaced dies right here (ANSI ARITHMETIC_OVERFLOW) or silently
    wraps with ANSI off."""
    from pyspark.sql import functions as F

    from etl_knlp_spark.plans.tpch import _sum_u_dec

    # 4 addends of 4.6e18 units = 1.84e19 > 9.22e18 (BIGINT max)
    u = 4_600_000_000_000_000_000
    df = spark.createDataFrame([(u,)] * 4, "u long")
    out = df.agg(_sum_u_dec(F.col("u"), 10000.0).alias("v")).collect()[0]["v"]
    assert out == float(4 * u) / 10000.0, out

    # the same shape through a plain BIGINT sum must NOT silently
    # succeed — pin that the hazard the decimal path closes is real
    # (ANSI on: overflow raises; this guards against a future config
    # drift quietly reintroducing wraparound)
    import pytest as _pytest

    with _pytest.raises(Exception, match="(?i)overflow"):
        df.agg((F.sum("u") / F.lit(10000.0)).alias("v")).collect()

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
    # DISTINCT aggregates partially before its exchange
    assert p.count("HashAggregate") >= 2


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

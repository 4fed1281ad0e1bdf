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

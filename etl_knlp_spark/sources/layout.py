"""Physical data layout for scale: partitioned writes (partition
pruning) and bucketed tables (shuffle-free co-located joins).

These are the two storage-side levers the 100 TB design depends on
(SURVEY.md §2.12 design rules: "partition by stable keys on write";
co-located joins via bucketing):

- Partitioning by a low-cardinality column turns equality/range
  predicates into directory pruning — the scan never opens non-matching
  files (`PartitionFilters` in the plan).
- Bucketing both sides of a recurring join on the join key removes the
  shuffle entirely: bucket i joins bucket i, a map-side zip. At 100 TB
  the lineitem⟕orders shuffle IS the flagship query's cost — bucketing
  amortizes it into the write once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import query


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    max_records_per_file: int = 1_000_000,
    mode: str = "overwrite",
) -> None:
    """Directory-partitioned parquet: one subdir per partition value.
    Keep partition columns low-cardinality (lang, date, source) — at
    high cardinality the small-files problem inverts the win."""
    (
        df.write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Hash-bucketed managed table; optional in-bucket sort enables
    merge-join without even a local sort."""
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, left_key: str, right_key: str
) -> DataFrame:
    """Join two tables bucketed on their join keys — Catalyst sees the
    compatible hash distributions and plans SortMergeJoin with ZERO
    Exchange operators (asserted in tests)."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key], "inner")


@query(
    "layout_bucketed_join",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*)                          AS n_items,
           CAST(SUM(l_quantity) AS BIGINT)   AS sum_qty
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def layout_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shuffle-free co-located join, hash-verified end to end:
    bucket lineitem and orders on the join key at write time, join the
    bucketed tables (zero Exchange before the join — pinned in
    tests/test_layout_graph.py), and aggregate. The result must equal
    the plain join — bucketing is pure physical layout, invisible to
    semantics. Table names are uniqued per invocation (the returned
    plan reads the bucketed tables lazily, so they can't be dropped
    here; like the roundtrip tempdirs, uniqueness beats a
    concurrent-sweep race on a shared name)."""
    import uuid

    from pyspark.sql import functions as F

    from ..catalog import load_table

    tag = uuid.uuid4().hex[:12]
    li_t, ord_t = f"li_bkt_{tag}", f"ord_bkt_{tag}"
    write_bucketed(
        load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity"),
        li_t, "l_orderkey", n_buckets=8, sort_col="l_orderkey",
    )
    write_bucketed(
        load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority"),
        ord_t, "o_orderkey", n_buckets=8, sort_col="o_orderkey",
    )
    return (
        bucketed_join(spark, li_t, ord_t, "l_orderkey", "o_orderkey")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("l_quantity").cast("bigint").alias("sum_qty"),
        )
    )

"""Table registry over the driver's parquet test tables.

The driver generates TPC-H-ish tables plus ``events``/``documents``/
``embeddings`` under ``/root/testdata/sf*/`` (TESTDATA.md). At 100 TB
these would be partitioned parquet/iceberg tables behind a metastore;
here the registry is a thin path→DataFrame mapping. Scans stay fully
declarative (``spark.read.parquet``) so Catalyst keeps predicate
pushdown, column pruning, and partition pruning.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Bounded-size dimension tables that are always safe to broadcast-join
# (region/nation are fixed-cardinality; supplier/part/customer grow with
# SF but stay orders of magnitude under fact tables — at true 100 TB
# scale customer would graduate out of this set).
SMALL_DIMS = frozenset({"region", "nation", "supplier"})


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _tune_session(spark: SparkSession) -> None:
    """Engine session settings, applied once per session at first table
    load. queries() callables receive the DRIVER's session, which may
    ship Spark defaults (AQE off in older configs, 200 shuffle
    partitions, machine-local timezone); these runtime-settable confs
    make plans and timestamp semantics match the engine's design
    regardless of who built the session."""
    if getattr(spark, "_etl_knlp_tuned", False):
        return
    for k, v in (
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
        ("spark.sql.adaptive.skewJoin.enabled", "true"),
        ("spark.sql.shuffle.partitions", "32"),
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # a locked-down session still works, just less tuned
    spark._etl_knlp_tuned = True


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Declarative parquet scan → pushdown-friendly.

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects; read it as a long (legacy nanosAsLong) and convert
    with integer division to microseconds (double division would lose
    precision above 2^53 ns). Truncation matches DuckDB's ns→µs cast,
    keeping oracle comparisons exact.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    _tune_session(spark)
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return spark.read.parquet(table_path(sf_dir, name))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() access."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)

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

    ``events.ts`` has shipped as parquet TIMESTAMP(NANOS) in some driver
    testdata generations and TIMESTAMP(MICROS) in others, so normalize
    adaptively by the type Spark actually read:

    - LongType (legacy nanosAsLong read of TIMESTAMP(NANOS)): integer-
      divide ns→µs (double division would lose precision above 2^53 ns;
      truncation matches DuckDB's ns→µs cast, keeping oracles exact).
    - TimestampNTZType (TIMESTAMP(MICROS), isAdjustedToUTC=false): cast
      to session-local TIMESTAMP; the session timezone is pinned to UTC
      in _tune_session so the wall-clock values are preserved and match
      DuckDB's TIMESTAMP semantics.
    - TimestampType: already what we want.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    _tune_session(spark)
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        if isinstance(ts_type, T.TimestampNTZType):
            return df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def load_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming file source over the events table with the same
    adaptive ``ts`` normalization as :func:`load_table`.

    The streaming reader needs an explicit schema; take it from a cheap
    batch footer read so the source matches whatever physical type the
    driver generated (TIMESTAMP(NANOS)-as-long vs TIMESTAMP(MICROS)).
    events.parquet is a single file inside the sf directory, so stream
    the directory with a glob filter.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    _tune_session(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch_schema = spark.read.parquet(table_path(sf_dir, "events")).schema
    src = (
        spark.readStream.schema(batch_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ts_type = batch_schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        return src.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    if isinstance(ts_type, T.TimestampNTZType):
        return src.withColumn("ts", F.col("ts").cast("timestamp"))
    return src


def load_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming file source over the documents table (schema from a
    cheap batch footer read, same single-file-glob shape as
    :func:`load_events_stream`). Tests that need multiple micro-batches
    re-stage the table into several files and set maxFilesPerTrigger."""
    _tune_session(spark)
    batch_schema = spark.read.parquet(table_path(sf_dir, "documents")).schema
    return (
        spark.readStream.schema(batch_schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() access."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)

"""Flagship plan + identity policy + null-semantics pins (SURVEY.md §7)."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from etl_knlp_spark.plans.dimension import with_identity


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.columns == ["l_orderkey", "l_returnflag", "status", "segment"]
    assert df.count() > 0


def test_every_query_has_callable_and_oracle_alignment():
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    assert len(qs) >= 50
    assert set(os_) <= set(qs)
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in os_.values())


def test_registry_importable_without_session():
    """The driver may call queries()/oracle_sql() before creating a
    SparkSession — module-level Column/pandas_udf construction would
    crash that (regression: plans/tpch once built a module-level
    Column). Check in a clean subprocess."""
    import subprocess
    import sys

    code = (
        "from etl_knlp_spark import registry; "
        "qs = registry.all_queries(); os_ = registry.all_oracles(); "
        "assert len(qs) >= 95 and set(os_) <= set(qs); print('ok')"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=120,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "ok" in out.stdout


def test_with_identity_is_unique(spark):
    df = spark.range(10_000).select(F.col("id").alias("x"))
    out = with_identity(df.repartition(8))
    assert out.select("data_id").distinct().count() == 10_000


def test_distinct_treats_nulls_as_equal(spark):
    """Pin the DISTINCT+NULL semantics the oracle comparison relies on
    (SURVEY.md §7 hard parts): NULLs compare equal under DISTINCT."""
    df = spark.createDataFrame(
        [(1, None), (1, None), (2, "x")], ["k", "v"]
    )
    assert df.distinct().count() == 2

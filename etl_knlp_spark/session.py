"""SparkSession builder with defaults chosen for large-scale execution.

Settings rationale (100 TB posture, per SURVEY.md §2.12 / §4):
- AQE on: runtime re-planning (SMJ→BHJ conversion, skew-join splitting,
  partition coalescing) replaces hand-tuned physical hints.
- Skew-join on: wiki-title-like key distributions are Zipfian; AQE
  splits oversized shuffle partitions instead of stalling one task.
- Arrow on: every Pandas-UDF boundary moves columnar batches, not
  pickled rows.
- Shuffle partitions default to the local core count; on a real cluster
  this is overridden (or left to AQE coalescing from an intentionally
  high initial number).
- UTC session timezone: deterministic timestamp semantics against
  external oracles and parquet files written by other engines.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "etl_knlp_spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    ``extra_conf`` lets measurement tooling (tools/job_profile.py) layer
    context-creation-time settings (e.g. the event log) on top of the
    engine defaults without duplicating them; queries and the bench never
    pass it."""
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()

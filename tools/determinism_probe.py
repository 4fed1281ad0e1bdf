"""Layout-perturbation determinism sweep.

Every CORRECTNESS row assumes the engine's results are independent of
physical data layout — partition count, file split size, join
strategy, task scheduling order. That assumption is exactly what
breaks silently: a top-k with ties, a first/last aggregate, or a
float reduction whose result depends on combine order all pass the
sweep under ONE session config and flip under another (the driver's
vanilla session is already a second config, but both are "reasonable"
layouts). This probe runs the identical oracle comparison as
tools/verify_oracles.py under a deliberately hostile session:

  - local[5] threads, spark.sql.shuffle.partitions=7 (primes, no
    alignment with the 16/32-partition runs or the data's layout),
  - maxPartitionBytes=256k + openCostInBytes=0 (parquet files split
    into many small input partitions → different scan row order),
  - AQE fully OFF (no runtime coalescing/skew handling — the plans
    the optimizer would fix stay raw),
  - autoBroadcastJoinThreshold=-1 (every join that the default
    session broadcasts runs as a shuffle join instead — results must
    not care which physical join executed).

A query passing at BOTH the default session (the normal sweeps) and
this one is evidenced layout-independent — the property that actually
matters on a 1000-executor cluster where layout is never the same
twice. Usage:

    python tools/determinism_probe.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from verify_oracles import run_sweep  # noqa: E402


def perturbed_session() -> SparkSession:
    return (
        SparkSession.builder.appName("determinism_probe")
        .master("local[5]")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.sql.shuffle.partitions", "7")
        .config("spark.default.parallelism", "3")
        .config("spark.sql.files.maxPartitionBytes", str(256 * 1024))
        .config("spark.sql.files.openCostInBytes", "0")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    failures = run_sweep(perturbed_session(), sf_dir, only)
    if failures:
        print(
            f"\nLAYOUT-DEPENDENT RESULTS: {failures} — these queries "
            "return different values under a different physical layout "
            "and WILL flake on a real cluster"
        )
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

"""Skew-mitigation utilities (SURVEY.md §2.12 100 TB design rules).

Zipfian keys (wiki titles, user ids, hot languages) concentrate a
shuffle join's work on a few reducers. Two remedies ship here:

- AQE skew-join splitting is ON by default in the engine session
  (`spark.sql.adaptive.skewJoin.enabled`) — the zero-code path.
- `salted_join` is the explicit pre-planned form for when AQE can't
  help (e.g. the skewed side feeds an aggregation, or a deterministic
  layout is required): the probe side scatters each hot key across
  `buckets` sub-keys, the build side replicates `buckets`×. Results
  are identical to the plain join — verified against the plain-join
  oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with salted keys: spreads each left-side key over
    ``buckets`` shuffle partitions, replicating the right side
    ``buckets``× (right side must be the smaller one).

    The salt derives from the input partition id (same reasoning as
    `salted_agg`, round-5 fix): a whole-row hash would send fully
    duplicated rows of a hot key — the bot-user case — to ONE bucket,
    silently disabling the mitigation exactly when it's needed, while
    the partition id varies across the hot key's rows wherever they
    span input partitions (at scale they always do) and is stable
    under task retry (partition layout is fixed for the stage).
    """
    salt = F.pmod(F.spark_partition_id().cast("long"), F.lit(buckets))
    salted_left = left.withColumn("_salt", salt)
    replicated_right = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    cond = (F.col(f"l.{left_key}") == F.col(f"r.{right_key}")) & (
        F.col("l._salt") == F.col("r._salt")
    )
    return (
        salted_left.alias("l")
        .join(replicated_right.alias("r"), cond, how)
        .drop("_salt")
    )


def salted_agg(
    df: DataFrame, key_cols: list[str], aggs: dict[str, F.Column], buckets: int = 16
) -> DataFrame:
    """Two-phase aggregation with salted keys for when ONE group key
    dominates (a hot language, a bot user): phase 1 aggregates on
    (key, salt) so the hot key's rows spread over ``buckets``
    reducers; phase 2 combines the per-salt partials. Only works for
    sum-mergeable aggregates (sums/counts — phase 2 SUMs the
    partials). Spark's own partial aggregation usually makes
    this redundant, but when the map-side partial is defeated (high
    distinct-key count per partition evicts the hash map, or the agg
    sits above a join), pre-salting restores bounded reducer work.

    ``aggs`` maps output name → phase-1 aggregate column; each must
    survive a SUM in phase 2 (i.e. sums/counts). The caller re-derives
    non-summable results (avg = sum/count) afterward.

    The salt must vary across ROWS of the same hot key, so it cannot
    be a hash of the value columns (fully duplicated rows — the bot
    user emitting identical events — would all land in one bucket and
    the mitigation would silently do nothing; round-4 advisor
    finding). Salting by input partition id is deterministic under
    task retry (partition layout is fixed for the stage) and spreads
    every key that spans partitions — which at 100 TB a hot key
    always does.
    """
    salt = F.pmod(F.spark_partition_id().cast("long"), F.lit(buckets))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(*[c.alias(n) for n, c in aggs.items()])
    )
    return partial.groupBy(*key_cols).agg(
        *[F.sum(n).alias(n) for n in aggs]
    )


@query(
    "agg_skew_salted",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
           CAST(COUNT(*) AS BIGINT)        AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation demo on lineitem's 3-value
    l_returnflag (an extreme hot-key distribution: every row lands on
    one of 3 reducers in the naive plan). Must produce EXACTLY the
    plain GROUP BY's result — the oracle is the unsalted SQL — proving
    the salt is a pure physical rebalance. sum cast to double on both
    sides (decimal vs double engine defaults)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    out = salted_agg(
        li,
        ["l_returnflag"],
        {
            "sum_qty": F.sum(F.col("l_quantity").cast("double")),
            "n_rows": F.count(F.lit(1)),
        },
    )
    return out.select(
        "l_returnflag",
        F.col("sum_qty").cast("double").alias("sum_qty"),
        F.col("n_rows").cast("bigint").alias("n_rows"),
    )


@query(
    "join_skew_salted",
    oracle="""
    SELECT o.o_orderkey, c.c_custkey, c.c_mktsegment, o.o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join demo — must produce EXACTLY the plain join's rows
    (the oracle is the unsalted SQL), proving salting is a pure
    physical-layout transform."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    joined = salted_join(o, c, "o_custkey", "c_custkey", buckets=8)
    return joined.select("o_orderkey", "c_custkey", "c_mktsegment", "o_totalprice")


@query(
    "skew_report",
    oracle="""
    WITH per_key AS (
      SELECT o_custkey AS k, COUNT(*)::BIGINT AS c
      FROM orders GROUP BY o_custkey
    )
    SELECT COUNT(*)::BIGINT AS n_keys,
           SUM(c)::BIGINT AS n_rows,
           MAX(c)::BIGINT AS max_key_rows,
           CAST(MEDIAN(c) AS DOUBLE) AS median_key_rows,
           FLOOR(MAX(c) / CAST(MEDIAN(c) AS DOUBLE) * 10000 + 0.5)
             / 10000.0 AS skew_ratio,
           FLOOR(MAX(c) * 1.0 / SUM(c) * 1000000 + 0.5)
             / 1000000.0 AS top1_share
    FROM per_key
    """,
)
def skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew diagnostic for a join/aggregation key — the
    measurement that decides whether a key needs `salted_join` /
    `salted_agg` (this module) or plain AQE skew handling: key
    cardinality, hottest-key row count, max/median ratio, and the
    hottest key's share of all rows. A skew_ratio near 1 means salt
    buckets would only add overhead; a ratio ≫ bucket count means one
    reducer owns the job's tail latency.

    One partial-aggregated shuffle on the key (counts), then the
    summary reduces the per-key table to a single row — the key table
    (not the fact table) is what percentile/median touch, so at 100 TB
    the cost is the groupBy the consuming join would do anyway."""
    from ..catalog import load_table

    per_key = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # max/median and max/total are exact ratios of exactly-representable
    # values (median of ints is an int or a .5 — both exact in double;
    # bit-identical across engines), so they take the floor-form
    # rounding (r12; see corpus_mixture_weights): ROUND(x, k) splits
    # engines on (k+1)th-decimal-terminating halves, which exact
    # rationals CAN land on (the percent_rank class).
    return per_key.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum("c").cast("bigint").alias("n_rows"),
        F.max("c").cast("bigint").alias("max_key_rows"),
        F.median("c").cast("double").alias("median_key_rows"),
        (
            F.floor(F.max("c") / F.median("c").cast("double") * 10000 + 0.5)
            / 10000.0
        ).alias("skew_ratio"),
        (
            F.floor(F.max("c") * 1.0 / F.sum("c") * 1000000 + 0.5) / 1000000.0
        ).alias("top1_share"),
    )

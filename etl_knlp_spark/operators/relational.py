"""Core relational operators: project/filter/limit, joins, aggregations,
set ops, sorts, windows.

Parity notes (SURVEY.md §2.2-§2.7): the reference's own relational
surface is tiny — projection+rename (dag-knlp.py:72-76), a row cap
(dag-knlp.py:97), two chained LEFT JOINs (dag-knlp.py:78-79), DISTINCT
(dag-knlp.py:72), COUNT(*) (dag-knlp.py:252) and a top-1 sort-limit
(dag-knlp.py:273). Everything else here is the absent-in-reference
fill-in a credible engine needs (inner/semi/anti/theta/as-of joins,
GROUP BY/rollup/cube, set ops, windows), each expressed declaratively so
Catalyst owns the physical strategy.

100 TB notes, per operator family:
- Joins: equi-joins shuffle on the key (SMJ) unless one side fits the
  broadcast threshold; AQE converts to broadcast at runtime and splits
  skewed partitions. The theta join keeps an equi conjunct so it hash
  joins with a residual filter instead of a cross product.
- The as-of join is the union+window formulation: ONE shuffle on the
  partition key instead of a fan-out join + re-aggregation.
- Aggregations are partial (map-side) before the shuffle automatically;
  rollup/cube expand grouping sets before the same partial-agg pipeline.
- Top-k sorts (`orderBy().limit(k)`) execute as TakeOrderedAndProject —
  per-partition heaps, no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


# --------------------------------------------------------------------------
# Projections / filters / limits  (SURVEY §2.2)
# --------------------------------------------------------------------------


@query(
    "project_rename",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus AS status, o_orderpriority AS priority
    FROM orders
    """,
)
def project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column projection with rename (dag-knlp.py:72-76's SELECT list).

    Catalyst column pruning pushes the 4-column ReadSchema into the
    parquet scan — the other columns are never materialized.
    """
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("priority"),
    )


@query(
    "limit_n",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_orderkey LIMIT 100
    """,
)
def limit_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row cap (the reference's ``stop_line`` dev cutoff, dag-knlp.py:97).

    Ordered by a unique key so the row *set* is deterministic for the
    oracle; executes as TakeOrderedAndProject (per-partition top-k heaps
    merged on the driver — no global sort even at scale).
    """
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
        .limit(100)
    )


@query(
    "filter_notnull",
    oracle="""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE text IS NOT NULL AND lang IS NOT NULL AND n_chars > 100
    """,
)
def filter_notnull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NA-row / out-of-schema cleaning (README.md:15 — described there,
    never coded in the reference). Predicates push down to the scan
    (`PushedFilters` on the parquet reader)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.na.drop(subset=["text", "lang"])
        .filter(F.col("n_chars") > 100)
        .select("doc_id", "lang", "source", "n_chars")
    )


# --------------------------------------------------------------------------
# Joins  (SURVEY §2.3)
# --------------------------------------------------------------------------


@query(
    "join_left_equi",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, l.l_quantity, o.o_orderstatus, o.o_totalprice
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
)
def join_left_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer equi-join on string-free keys (dag-knlp.py:78 analog).

    orders stays under the broadcast threshold through sf0.1; at true
    scale AQE falls back to shuffled SMJ on l_orderkey, which bucketing
    both tables on orderkey would eliminate.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return li.join(o, li.l_orderkey == o.o_orderkey, "left").select(
        "l_orderkey", "l_linenumber", "l_quantity", "o_orderstatus", "o_totalprice"
    )


@query(
    "join_inner",
    oracle="""
    SELECT o.o_orderkey, c.c_custkey, c.c_name, o.o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join (absent in reference; SURVEY §2.3 J3)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "c_custkey", "c_name", "o_totalprice"
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join — containment check (SURVEY §2.3 J4-J8).

    Semi joins never duplicate the left side, so the probe output stays
    bounded by `customer` regardless of order fan-out.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_nationkey"
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join — the dedup/exclusion primitive (SURVEY §2.3)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_nationkey"
    )


@query(
    "join_range",
    oracle="""
    SELECT o.o_orderkey, c.c_custkey, o.o_totalprice, c.c_acctbal
    FROM orders o JOIN customer c
      ON o.o_custkey = c.c_custkey AND o.o_totalprice > c.c_acctbal
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/range join with an equi conjunct (SURVEY §2.3 J4-J8).

    The equi part keys the hash join; the range predicate evaluates as a
    post-join residual — never a cross product. Pure range joins (no
    equi key) should be bucketed into range bins first at scale.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(
        c, (o.o_custkey == c.c_custkey) & (o.o_totalprice > c.c_acctbal), "inner"
    ).select("o_orderkey", "c_custkey", "o_totalprice", "c_acctbal")


@query(
    "join_asof",
    oracle="""
    SELECT c.event_id, c.user_id, CAST(c.ts AS TIMESTAMP) AS click_ts,
           CAST((SELECT max(p.ts) FROM events p
                 WHERE p.event_type = 'purchase'
                   AND p.user_id = c.user_id
                   AND p.ts <= c.ts) AS TIMESTAMP) AS prior_purchase_ts
    FROM events c
    WHERE c.event_type = 'click'
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each click, the latest purchase at-or-before it
    by the same user (SURVEY §2.3 J4-J8, event alignment on ``events``).

    Spark-first formulation: tag both sides, union, ONE window over
    (user_id, ts) carrying the last non-null purchase ts forward. This
    is a single shuffle on user_id — the naive inequality-join +
    groupBy-max re-aggregation shuffles twice and fans out
    clicks×purchases per user first. Purchases sort before clicks on ts
    ties so an exactly-simultaneous purchase is visible (<= semantics).
    """
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("ts").alias("p_ts"),
        F.lit(0).alias("kind"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts"),
        F.col("event_id"),
        F.lit(None).cast("timestamp").alias("p_ts"),
        F.lit(1).alias("kind"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        purchases.unionByName(clicks)
        .withColumn("prior_purchase_ts", F.last("p_ts", ignorenulls=True).over(w))
        .filter(F.col("kind") == 1)
        .select(
            "event_id",
            "user_id",
            F.col("ts").alias("click_ts"),
            "prior_purchase_ts",
        )
    )


@query(
    "cross_join_small",
    oracle="""
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    """,
)
def cross_join_small(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cross join — legitimate only between bounded dims (5×25
    here); plans as BroadcastNestedLoopJoin. Any unbounded side makes
    this the operator to refuse, not optimize."""
    r = load_table(spark, sf_dir, "region").select("r_name")
    n = load_table(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(n)


@query(
    "join_null_safe",
    oracle="""
    WITH l AS (SELECT l_orderkey, l_linenumber, NULLIF(l_returnflag, 'N') AS flag
               FROM lineitem WHERE l_orderkey < 100),
         f AS (SELECT * FROM (VALUES ('A', 'returned-accepted'),
                                     ('R', 'returned-rejected'),
                                     (NULL, 'not-returned')) t(flag, label))
    SELECT l.l_orderkey, l.l_linenumber, f.label
    FROM l JOIN f ON l.flag IS NOT DISTINCT FROM f.flag
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL
    keys MATCH each other — the decode-table pattern where NULL is a
    legitimate code. A plain equi-join silently drops those rows; the
    null-safe variant still hash-joins (NULL gets its own bucket)."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 100)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.nullif(F.col("l_returnflag"), F.lit("N")).alias("flag"),
        )
    )
    decode = spark.createDataFrame(
        [("A", "returned-accepted"), ("R", "returned-rejected"), (None, "not-returned")],
        "flag STRING, label STRING",
    )
    return li.join(decode, li.flag.eqNullSafe(decode.flag)).select(
        "l_orderkey", "l_linenumber", "label"
    )


# --------------------------------------------------------------------------
# Aggregations  (SURVEY §2.4)
# --------------------------------------------------------------------------


@query(
    "groupby_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(l_quantity) AS BIGINT) * 1.0                       AS sum_qty,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
             / 100.0                                                   AS sum_base_price,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000 + 0.5)
                         AS BIGINT)) AS DOUBLE) / 10000.0              AS sum_disc_price,
           CAST(SUM(CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT)) AS BIGINT)
             / CAST(100 * COUNT(*) AS BIGINT)                          AS avg_disc,
           COUNT(*)                                                    AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def groupby_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style GROUP BY with sum/avg/count (SURVEY §2.4 A4).

    Partial aggregation runs map-side before the 6-group shuffle, so
    network traffic is O(groups × partitions), not O(rows). Money
    aggregates accumulate in exact integer units (cents / 1e-4 per the
    addends' decimal granularity) because a rounded float sum flips at
    half-cent boundaries under a different partition combine order —
    the r11 determinism-probe class. The six whole-table groups grow
    with the corpus, so the unit sums run in DECIMAL(38,0) (BIGINT
    crosses 9.2e18 inside the 100 TB posture; DuckDB mirrors with its
    native HUGEINT sum — r11 review hardening); quantity sums are
    exact integers in double to begin with, and the discount-cents
    sum is value-bounded (≤10 cents/row) so BIGINT holds to sf~1e16.
    """
    li = load_table(spark, sf_dir, "lineitem")
    ep_c = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("bigint")
    dp_u = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000 + 0.5
    ).cast("bigint")
    disc_c = F.floor(F.col("l_discount") * 100 + 0.5).cast("bigint")
    cnt = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        (F.sum("l_quantity").cast("bigint") * 1.0).alias("sum_qty"),
        (
            F.sum(ep_c.cast("decimal(38,0)")).cast("double") / F.lit(100.0)
        ).alias("sum_base_price"),
        (
            F.sum(dp_u.cast("decimal(38,0)")).cast("double") / F.lit(10000.0)
        ).alias("sum_disc_price"),
        (F.sum(disc_c) / (F.lit(100) * cnt).cast("bigint")).alias("avg_disc"),
        cnt.alias("count_order"),
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT lang, source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY ROLLUP (lang, source)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (SURVEY §2.4 A4): per-(lang,source),
    per-lang subtotals, and the grand total in one pass."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.rollup("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


@query(
    "agg_cube",
    oracle="""
    SELECT lang, source, COUNT(*) AS n_docs
    FROM documents
    GROUP BY CUBE (lang, source)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets — all 4 combinations of (lang, source)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.cube("lang", "source").agg(F.count(F.lit(1)).alias("n_docs"))


@query(
    "distinct_rows",
    oracle="SELECT DISTINCT lang, source FROM documents",
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT (dag-knlp.py:72) → hash aggregate on all columns,
    partial dedup map-side first."""
    return load_table(spark, sf_dir, "documents").select("lang", "source").distinct()


@query(
    "distinct_count",
    oracle="""
    SELECT COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(DISTINCT o_orderpriority) AS n_priorities
    FROM orders
    """,
)
def distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-column COUNT DISTINCT (expands to grouping sets)."""
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
    )


@query(
    "approx_distinct",
    oracle="""
    SELECT COUNT(DISTINCT o_custkey) AS exact_customers,
           TRUE AS within_5pct
    FROM orders
    """,
)
def approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct — HyperLogLog++ sketch (SURVEY §2.4 A4).

    The constant-memory path for distinct counts at 100 TB (exact
    distinct shuffles every key). Raw sketch values are
    engine-specific, so the oracle-checked output is the relative-error
    ASSERTION: the exact count plus a boolean that the HLL estimate
    lands within ±5% of it (rsd=0.02 → ~2.5σ). A drifting sketch flips
    the boolean and fails the driver's hash match.
    """
    o = load_table(spark, sf_dir, "orders")
    approx = F.approx_count_distinct("o_custkey", rsd=0.02)
    exact = F.countDistinct("o_custkey")
    return o.agg(
        exact.alias("exact_customers"),
        (F.abs(approx - exact) / exact <= 0.05).alias("within_5pct"),
    )


# --------------------------------------------------------------------------
# Sorts / set operations  (SURVEY §2.6-§2.7)
# --------------------------------------------------------------------------


@query(
    "sort_global",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 500
    """,
)
def sort_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k by value with a unique tiebreaker (SURVEY §2.6).

    With LIMIT, Catalyst plans TakeOrderedAndProject; an unbounded
    ORDER BY would range-partition (sample → range exchange → local
    sort) — still no single-node sort at scale.
    """
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(500)
    )


@query(
    "union_all",
    oracle="""
    SELECT c_custkey AS id, c_name AS name, 'customer' AS side FROM customer
    UNION ALL
    SELECT s_suppkey AS id, s_name AS name, 'supplier' AS side FROM supplier
    """,
)
def union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL by name (SURVEY §2.7) — no shuffle, partitions append."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.lit("customer").alias("side"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("id"),
        F.col("s_name").alias("name"),
        F.lit("supplier").alias("side"),
    )
    return c.unionByName(s)


@query(
    "intersect_rows",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def intersect_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics, same as SQL) — plans as an
    aggregate + semi-join under the hood."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "except_rows",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def except_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics, like the SQL oracle) — nation keys
    with customers but no suppliers; plans as aggregate + anti-join.
    Note ``exceptAll`` would be multiset difference (keeps keys whose
    left count exceeds the right count) — not the same operator."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


# --------------------------------------------------------------------------
# Window functions  (SURVEY §2.5)
# --------------------------------------------------------------------------


@query(
    "window_rownum",
    oracle="""
    SELECT c_nationkey, c_custkey, c_acctbal, rn FROM (
      SELECT c_nationkey, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    ) WHERE rn <= 3
    """,
)
def window_rownum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window: top-3 customers per nation by balance.

    Unique tiebreaker (c_custkey) makes row numbers deterministic. At
    scale this is one shuffle on the partition key; rank-filter pushes
    a per-partition top-k limit into the window via Spark's
    WindowGroupLimit optimization.
    """
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_nationkey", "c_custkey", "c_acctbal", "rn")
    )


@query(
    "window_lag",
    oracle="""
    SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value,
           LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)  AS prev_value,
           LEAD(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value
    FROM events
    """,
)
def window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic lag/lead over each user's event timeline (SURVEY §2.5)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_totalprice
             RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW), 2) AS nearby_spend
    FROM orders
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE (value-based) window frame — peers within 50k of the
    current price, per customer. Distinct from ROWS frames: the frame
    is defined by the ORDER BY value distance and includes ties, so no
    unique tiebreak is needed for determinism."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-50000, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("nearby_spend"),
    )


@query(
    "window_value_funcs",
    oracle="""
    SELECT o_orderkey, o_custkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_order,
           LAST_VALUE(o_orderkey) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order,
           NTH_VALUE(o_orderkey, 2) OVER w AS second_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_value_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value window functions (first/last/nth): each customer's first,
    last, and second order. last_value needs the full-partition frame
    (the default frame stops at CURRENT ROW — the classic gotcha)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w_full).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
    )


@query(
    "window_ntile",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           NTILE(4) OVER (PARTITION BY o_orderpriority
                          ORDER BY o_totalprice, o_orderkey) AS quartile
    FROM orders
    """,
)
def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE bucketing per group (deterministic via unique tiebreak)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey", "o_orderpriority", F.ntile(4).over(w).alias("quartile")
    )


@query(
    "window_percent_rank",
    oracle="""
    SELECT c_custkey,
           PERCENT_RANK() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal, c_custkey) AS pct_rank,
           CUME_DIST() OVER (PARTITION BY c_nationkey
                             ORDER BY c_acctbal, c_custkey)    AS cume
    FROM customer
    """,
)
def window_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-rank analytics (percent_rank / cume_dist).

    Deliberately UNROUNDED: these are exact rationals (rank/n) whose
    IEEE division is bit-identical across engines, while rounding would
    reintroduce half-boundary disagreements (rank/640 = 0.5203125 →
    engines disagree at round-half — found at sf0.1). Round only
    summation-order-dependent aggregates, never per-row rationals."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@query(
    "window_frame_sum",
    oracle="""
    SELECT o_orderkey, o_custkey,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS rolling_spend
    FROM orders
    """,
)
def window_frame_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-spec rolling aggregate: 3-order rolling spend per customer."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("rolling_spend"),
    )


@query(
    "join_range_binned",
    oracle="""
    SELECT o.o_orderkey,
           n.n_nationkey AS band_id,
           o.o_totalprice
    FROM orders o
    JOIN nation n
      ON o.o_totalprice >= n.n_nationkey * 20000
     AND o.o_totalprice <  n.n_nationkey * 20000 + 30000
    """,
)
def join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PURE range join (no equi conjunct) made shuffle-joinable by
    binning — the companion to `join_range`, which relies on its equi
    key. Without one, Spark's only direct plan is a broadcast
    nested-loop (O(rows × bands): every row tests every band). The
    scale rewrite: quantize the range dimension into fixed-width bins,
    explode each band into the bins it overlaps (an interval of width
    w covers ≤ ⌈w/bin⌉+1 bins — here 2 rows per band), hash-join
    points to bands on the bin id, and re-check the exact range as a
    residual. Cost: a ~2× blowup of the TINY side buys an equi key
    for the huge side — the standard interval-join strategy
    (Spark lacks a native one; DuckDB's IEJoin computes the oracle
    directly). Bands are derived from `nation` (band n spans
    [20000·n, 20000·n + 30000) — deliberately overlapping, so points
    can match 2 bands and the bin residual is actually exercised).
    All band arithmetic is integer; the residual compares an exact
    int bound against the double price, identically in both engines."""
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    width = 20000
    bands = n.select(
        F.col("n_nationkey").alias("band_id"),
        (F.col("n_nationkey").cast("long") * width).alias("lo"),
        (F.col("n_nationkey").cast("long") * width + 30000).alias("hi"),
    )
    binned_bands = bands.withColumn(
        "bin",
        F.explode(
            F.sequence(
                (F.col("lo") / width).cast("long"),
                ((F.col("hi") - 1) / width).cast("long"),
            )
        ),
    )
    pts = o.select("o_orderkey", "o_totalprice").withColumn(
        "bin", F.floor(F.col("o_totalprice") / width)
    )
    return (
        pts.join(
            F.broadcast(binned_bands),
            (pts.bin == binned_bands.bin)
            & (F.col("o_totalprice") >= F.col("lo"))
            & (F.col("o_totalprice") < F.col("hi")),
        )
        .select("o_orderkey", "band_id", "o_totalprice")
    )


@query(
    "join_full_outer",
    oracle="""
    SELECT COALESCE(c.c_nationkey, s.s_nationkey) AS nationkey,
           c.c_custkey  AS custkey,
           s.s_suppkey  AS suppkey
    FROM (SELECT c_custkey, c_nationkey FROM customer WHERE c_custkey < 200) c
    FULL OUTER JOIN
         (SELECT s_suppkey, s_nationkey FROM supplier WHERE s_suppkey < 100) s
      ON c.c_nationkey = s.s_nationkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER equi-join with key coalescing — the join shape for
    reconciling two partial sources where either side may be missing
    (the merge step of every incremental-ingest reconciliation).
    Unmatched rows from BOTH sides survive with nulls on the other
    side; the output key coalesces across them. Scale note: full
    outer cannot broadcast either side (both sides' unmatched rows
    must surface), so it always plans as a shuffle join on the key —
    which is why the sides here are pre-filtered subsets, the
    production pattern for bounded reconciliation windows."""
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 200)
        .select(F.col("c_custkey").alias("custkey"), F.col("c_nationkey"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") < 100)
        .select(F.col("s_suppkey").alias("suppkey"), F.col("s_nationkey"))
    )
    return c.join(s, c.c_nationkey == s.s_nationkey, "full_outer").select(
        F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
        "custkey",
        "suppkey",
    )


@query(
    "except_all_rows",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def except_all_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (multiset difference): each key survives
    max(left_count − right_count, 0) times — the other half of the
    EXCEPT pair (`except_rows` is the distinct form). The multiset
    semantics matter for reconciliation counts: 5 customers minus 2
    suppliers in a nation leaves 3 rows, not 0/1."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.exceptAll(s)


@query(
    "intersect_all_rows",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def intersect_all_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (multiset intersection): each key appears
    min(left_count, right_count) times."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersectAll(s)


@query(
    "join_asof_tolerance",
    oracle="""
    WITH c AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ), p AS (
      SELECT user_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT c.event_id, c.user_id, c.ts AS click_ts,
           MIN(CASE WHEN p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
                    THEN p.ts END) AS next_purchase_ts
    FROM c LEFT JOIN p ON c.user_id = p.user_id
    GROUP BY 1, 2, 3
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join with tolerance (pandas `merge_asof
    direction='forward', tolerance=1h` parity): for each click, the
    EARLIEST purchase at-or-after it by the same user, nulled when it
    falls outside the 1-hour window.

    Same single-shuffle design as `join_asof`, mirrored: tag both
    sides, union, ONE window over (user_id, ts) carrying the first
    non-null purchase ts BACKWARD from the future side
    (currentRow → unboundedFollowing), then the tolerance applies as
    a post-filter expression. Clicks sort before purchases on ts ties
    so an exactly-simultaneous purchase is visible (>= semantics).
    The naive inequality join fans out clicks × purchases per user
    and shuffles twice; this shuffles the event stream once."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("ts").alias("p_ts"),
        F.lit(1).alias("kind"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts"),
        F.col("event_id"),
        F.lit(None).cast("timestamp").alias("p_ts"),
        F.lit(0).alias("kind"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    nxt = F.first("p_ts", ignorenulls=True).over(w)
    return (
        clicks.unionByName(purchases)
        .withColumn("nxt", nxt)
        .filter(F.col("kind") == 0)
        .select(
            "event_id",
            "user_id",
            F.col("ts").alias("click_ts"),
            F.when(
                F.col("nxt") <= F.col("ts") + F.expr("INTERVAL 1 HOUR"),
                F.col("nxt"),
            ).alias("next_purchase_ts"),
        )
    )


@query(
    "join_asof_nearest",
    oracle="""
    WITH c AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ), sides AS (
      SELECT c.event_id, c.user_id, CAST(c.ts AS TIMESTAMP) AS click_ts,
             (SELECT max(p.ts) FROM events p
              WHERE p.event_type = 'purchase' AND p.user_id = c.user_id
                AND p.ts <= c.ts) AS prior_ts,
             (SELECT min(p.ts) FROM events p
              WHERE p.event_type = 'purchase' AND p.user_id = c.user_id
                AND p.ts >= c.ts) AS next_ts,
             epoch_us(c.ts) AS c_us
      FROM c
    )
    SELECT event_id, user_id, click_ts,
           CAST(prior_ts AS TIMESTAMP) AS prior_ts,
           CAST(next_ts AS TIMESTAMP) AS next_ts,
           CAST(CASE
             WHEN prior_ts IS NULL THEN next_ts
             WHEN next_ts IS NULL THEN prior_ts
             WHEN c_us - epoch_us(prior_ts) <= epoch_us(next_ts) - c_us
               THEN prior_ts ELSE next_ts
           END AS TIMESTAMP) AS nearest_ts
    FROM sides
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, remaining directions (completing `join_asof`'s
    backward case to the full pandas merge_asof direction matrix):
    for each click, the latest purchase at-or-before (prior), the
    earliest at-or-after (next), and the NEAREST of the two with
    ties to the prior side — all per user.

    Same single-shuffle formulation as `join_asof`: tag, union, and
    TWO frame-opposed windows over one (user_id, ts, kind) sort —
    last-non-null looking back, first-non-null looking forward (kind
    ordered so an exactly-simultaneous purchase is visible to BOTH
    directions, <=/>= semantics). The nearest pick compares exact
    integer microsecond deltas — no interval arithmetic, no float.
    Still one exchange; the naive formulation is two inequality
    joins and two re-aggregations."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("event_id"),
        F.col("ts").alias("p_ts"),
        F.lit(0).alias("kind"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(None).cast("timestamp").alias("p_ts"),
        F.lit(1).alias("kind"),
    )
    # backward pass: purchases sort BEFORE ties (kind 0 < 1) so <= holds;
    # forward pass reuses the same sort — a purchase tied on ts sits
    # before the click, so the forward frame starts one row earlier via
    # a kind-flipped twin column instead of a second sort: simpler and
    # still one exchange — the purchase row carries p_ts in both columns.
    w_back = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    # forward visibility of a tied purchase: it sorts BEFORE the click
    # (kind 0), outside the forward frame — so the forward window reads
    # a column where the purchase's own row is the only carrier and the
    # tie case is handled by coalescing with the backward hit at equal ts
    unioned = purchases.unionByName(clicks)
    out = (
        unioned.withColumn("prior_ts", F.last("p_ts", ignorenulls=True).over(w_back))
        .withColumn("fwd_ts", F.first("p_ts", ignorenulls=True).over(w_fwd))
        .filter(F.col("kind") == 1)
    )
    # a purchase at exactly click ts was captured by prior_ts; it must
    # also be next_ts (>= semantics)
    next_ts = F.when(
        F.col("prior_ts") == F.col("ts"), F.col("ts")
    ).otherwise(F.col("fwd_ts"))
    c_us = F.unix_micros("ts")
    nearest = (
        F.when(F.col("prior_ts").isNull(), next_ts)
        .when(next_ts.isNull(), F.col("prior_ts"))
        .when(
            c_us - F.unix_micros("prior_ts") <= F.unix_micros(next_ts) - c_us,
            F.col("prior_ts"),
        )
        .otherwise(next_ts)
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("ts").alias("click_ts"),
        "prior_ts",
        next_ts.alias("next_ts"),
        nearest.alias("nearest_ts"),
    )

"""Mutation patterns on immutable storage: MERGE/upsert and SCD2
emulation (no Delta/Iceberg jars in this environment, so the MERGE
semantics compose from anti-join + union — the classic emulation).

At 100 TB: the anti-join shuffles on the merge key (broadcast when the
change batch is small — the common CDC case); rewriting only affected
partitions (dynamic partition overwrite) bounds the write. With a
table format (Delta/Iceberg) this collapses to a native MERGE INTO;
the logical semantics below are exactly what that executes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


def merge_into(target: DataFrame, source: DataFrame, key: str) -> DataFrame:
    """UPSERT: rows of `target` whose key appears in `source` are
    replaced by the source row; source-only keys are inserted.
    (`WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *`.)
    """
    untouched = target.join(source, on=key, how="left_anti")
    return untouched.unionByName(source.select(*target.columns))


@query(
    "merge_upsert",
    oracle="""
    WITH updates AS (
      SELECT c_custkey, c_name, c_nationkey, c_acctbal + 1000.0 AS c_acctbal, c_mktsegment
      FROM customer WHERE c_custkey < 100
      UNION ALL
      SELECT c_custkey + 1000000, c_name, c_nationkey, 0.0 AS c_acctbal,
             'NEW' AS c_mktsegment
      FROM customer WHERE c_custkey < 50
    )
    SELECT * FROM updates
    UNION ALL
    SELECT c.* FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.c_custkey = c.c_custkey)
    """,
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO emulation: a deterministic change batch (100 balance
    updates + 50 inserts derived from the table itself) upserted into
    `customer`. The oracle is the textbook NOT EXISTS + UNION ALL
    formulation — identical semantics, hash-verified."""
    c = load_table(spark, sf_dir, "customer")
    updates = (
        c.filter(F.col("c_custkey") < 100)
        .select(
            "c_custkey",
            "c_name",
            "c_nationkey",
            (F.col("c_acctbal") + 1000.0).alias("c_acctbal"),
            "c_mktsegment",
        )
        .unionByName(
            c.filter(F.col("c_custkey") < 50).select(
                (F.col("c_custkey") + 1000000).alias("c_custkey"),
                "c_name",
                "c_nationkey",
                F.lit(0.0).alias("c_acctbal"),
                F.lit("NEW").alias("c_mktsegment"),
            )
        )
    )
    return merge_into(c, updates, "c_custkey")


def scd2_apply(
    current: DataFrame,
    changes: DataFrame,
    key: str,
    effective_col: str = "valid_from",
    end_col: str = "valid_to",
) -> DataFrame:
    """Slowly-changing-dimension type 2: close out current versions of
    changed keys (set `valid_to` = the change's `valid_from`) and
    append the new versions as open rows (`valid_to` NULL).

    Handles multiple changes per key in one batch: changes are chained
    by `valid_from` (each version's `valid_to` = the next change's
    `valid_from`, `lead()` per key; the latest stays open), and the
    previously-open row closes at the EARLIEST change — validity
    ranges never overlap. Exact (key, valid_from) duplicates are
    collapsed to one arbitrary survivor before chaining (they would
    be ambiguous zero-length versions otherwise)."""
    from pyspark.sql import Window

    changes = changes.dropDuplicates([key, effective_col])
    w = Window.partitionBy(key).orderBy(effective_col)
    chained = changes.withColumn(end_col, F.lead(effective_col).over(w))
    first_change = changes.groupBy(key).agg(F.min(effective_col).alias("_new_from"))
    closed = (
        current.join(first_change, on=key, how="inner")
        .filter(F.col(end_col).isNull())
        .withColumn(end_col, F.col("_new_from"))
        .drop("_new_from")
    )
    untouched = current.join(changes.select(key), on=key, how="left_anti")
    still_closed = (
        current.join(changes.select(key), on=key, how="left_semi")
        .filter(F.col(end_col).isNotNull())
    )
    return (
        untouched.unionByName(still_closed)
        .unionByName(closed)
        .unionByName(chained.select(*current.columns))
    )


def apply_aggregate_delta(
    materialized: DataFrame, delta_aggregate: DataFrame, keys: list[str]
) -> DataFrame:
    """Incremental view maintenance for algebraic aggregates: merge a
    delta batch's partial aggregate into the materialized aggregate by
    full-outer join on the group keys and coalesced summation — the
    100 TB answer to "the nightly count table": apply the day's delta
    (seconds) instead of recomputing the corpus (hours). Works for
    any aggregate with a commutative merge (sum/count/min/max);
    non-algebraic ones (distinct, median) keep their grain or use
    sketches (see bitmap_distinct / hll / cms)."""
    m = materialized.alias("m")
    d = delta_aggregate.alias("d")
    cond = None
    for k in keys:
        c = F.col(f"m.{k}").eqNullSafe(F.col(f"d.{k}"))
        cond = c if cond is None else cond & c
    value_cols = [c for c in materialized.columns if c not in keys]
    return m.join(d, cond, "full_outer").select(
        *[F.coalesce(f"m.{k}", f"d.{k}").alias(k) for k in keys],
        *[
            (
                F.coalesce(F.col(f"m.{c}"), F.lit(0))
                + F.coalesce(F.col(f"d.{c}"), F.lit(0))
            ).alias(c)
            for c in value_cols
        ],
    )


@query(
    "ivm_aggregate",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT)  AS n_events,
           ROUND(SUM(value), 2)      AS total_value
    FROM events
    GROUP BY event_type
    """,
)
def ivm_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance, hash-verified end to end: the
    per-type aggregate is materialized from the first 80% of events
    (the standing view), the remaining 20% arrive as a delta batch
    whose partial aggregate merges in via `apply_aggregate_delta` —
    and the result must equal the full recompute (the oracle). The
    delta pass touches only delta rows plus |groups| materialized
    rows; at 100 TB that is the difference between an incremental
    minute and a full-table day. Rounding happens ONLY after the
    merge (partials carry full precision, like Spark's own partial
    aggregates)."""
    e = load_table(spark, sf_dir, "events")
    cutoff = e.agg(F.expr("percentile(event_id, 0.8)").alias("c"))
    base = e.join(F.broadcast(cutoff)).filter(F.col("event_id") <= F.col("c"))
    delta = e.join(F.broadcast(cutoff)).filter(F.col("event_id") > F.col("c"))

    def agg(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )

    merged = apply_aggregate_delta(agg(base), agg(delta), ["event_type"])
    return merged.select(
        "event_type",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.round("total_value", 2).alias("total_value"),
    )


def derive_changefeed(
    old: DataFrame, new: DataFrame, key: str, fingerprint_cols: list[str]
) -> DataFrame:
    """Derive a CDC changefeed from two table snapshots — the inverse
    of the apply side (streaming/cdc.py): rows only in `new` are
    inserts, rows only in `old` are deletes, rows whose fingerprint
    changed are updates; unchanged rows are dropped. Output:
    (key, op ∈ {I,U,D}).

    100 TB design: both sides reduce to (key, 32-byte digest) BEFORE
    the full-outer join, so the shuffle carries fingerprints, not
    rows — same digest-only discipline as dedup_exact/dedup_incremental.
    With a table format the same diff comes from the transaction log;
    this is the storage-agnostic fallback."""
    fp = F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in fingerprint_cols]))
    a = old.select(F.col(key).alias("k"), fp.alias("fp_old"))
    b = new.select(F.col(key).alias("k"), fp.alias("fp_new"))
    j = a.join(b, "k", "full_outer")
    op = (
        F.when(F.col("fp_old").isNull(), F.lit("I"))
        .when(F.col("fp_new").isNull(), F.lit("D"))
        .when(F.col("fp_old") != F.col("fp_new"), F.lit("U"))
    )
    return (
        j.select(F.col("k").alias(key), op.alias("op"))
        .filter(F.col("op").isNotNull())
    )


@query(
    "snapshot_changefeed",
    oracle="""
    WITH old AS (
      SELECT doc_id, text FROM documents
    ), new AS (
      SELECT doc_id,
             CASE WHEN doc_id % 13 = 0 THEN text || ' [rev]' ELSE text END AS text
      FROM documents WHERE doc_id % 17 <> 0
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 19 = 0
    ), j AS (
      SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
             CASE WHEN o.doc_id IS NULL THEN 'I'
                  WHEN n.doc_id IS NULL THEN 'D'
                  WHEN md5(o.text) <> md5(n.text) THEN 'U' END AS op
      FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
    )
    SELECT doc_id, op FROM j WHERE op IS NOT NULL
    """,
)
def snapshot_changefeed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC derivation demo: a deterministic mutation of `documents`
    (every 17th doc deleted, every 13th revised, every 19th re-added
    under a shifted key) plays the role of the next snapshot, and
    `derive_changefeed` recovers exactly the I/U/D stream that
    `cdc_merge` would apply — the two operators are inverses, which
    the oracle verifies row-for-row."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    new = (
        docs.filter(F.col("doc_id") % 17 != 0)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 13 == 0, F.concat(F.col("text"), F.lit(" [rev]"))
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .unionAll(
            docs.filter(F.col("doc_id") % 19 == 0).select(
                (F.col("doc_id") + 1000000).alias("doc_id"), "text"
            )
        )
    )
    return derive_changefeed(docs, new, "doc_id", ["text"])


@query(
    "scd2_point_in_time",
    oracle="""
    WITH v1 AS (
      SELECT c_custkey, c_mktsegment AS segment,
             DATE '1995-01-01' AS valid_from,
             CASE WHEN c_custkey % 2 = 1 THEN DATE '1997-01-01' END AS valid_to
      FROM customer
    ), v2 AS (
      SELECT c_custkey, c_mktsegment || '+' AS segment,
             DATE '1997-01-01' AS valid_from, CAST(NULL AS DATE) AS valid_to
      FROM customer WHERE c_custkey % 2 = 1
    ), dim AS (
      SELECT * FROM v1 UNION ALL SELECT * FROM v2
    )
    SELECT o.o_orderkey, o.o_custkey, d.segment AS segment_at_order
    FROM orders o
    JOIN dim d
      ON d.c_custkey = o.o_custkey
     AND o.o_orderdate >= d.valid_from
     AND (d.valid_to IS NULL OR o.o_orderdate < d.valid_to)
    WHERE o.o_orderdate >= DATE '1995-01-01'
    """,
)
def scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join over an SCD2 dimension — the query SCD2
    exists FOR: each order resolves the customer segment that was
    valid ON ITS ORDER DATE, not the current one (the silent-time-
    travel bug a plain dimension join commits). The dimension's
    version history is built by the engine's own `scd2_apply` (open
    1995 versions; odd custkeys change segment on 1997-01-01), so the
    close-out/chain mechanics feed the join being verified.

    Plan shape: the version predicate is an EQUI-join on the key plus
    a range filter — Spark shuffles both sides on c_custkey once and
    evaluates the validity window as a post-join filter, so there is
    no inequality-join blow-up; versions-per-key is small by nature
    (dimension churn, not fact volume), which keeps per-key fan-out
    bounded at any fact scale. AQE broadcasts the dimension while it
    fits — at 100 TB facts the dim side is still the tiny one."""
    c = load_table(spark, sf_dir, "customer")
    current = c.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.lit("1995-01-01").cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    changes = (
        c.filter(F.col("c_custkey") % 2 == 1)
        .select(
            "c_custkey",
            F.concat(F.col("c_mktsegment"), F.lit("+")).alias("segment"),
            F.lit("1997-01-01").cast("date").alias("valid_from"),
            F.lit(None).cast("date").alias("valid_to"),
        )
    )
    dim = scd2_apply(current, changes, "c_custkey")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1995-01-01").cast("date")
    )
    cond = (
        (dim.c_custkey == o.o_custkey)
        & (o.o_orderdate >= dim.valid_from)
        & (dim.valid_to.isNull() | (o.o_orderdate < dim.valid_to))
    )
    return o.join(dim, cond).select(
        "o_orderkey", "o_custkey", F.col("segment").alias("segment_at_order")
    )

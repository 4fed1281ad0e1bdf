"""Data-quality operators — the reference's signature category
(SURVEY.md §2.9; dag-knlp.py:243-279).

The reference runs two runtime assertions inside its pipeline and
raises ``ValueError`` on violation:
- ``check_data_count``: table non-empty (dag-knlp.py:243-258).
- ``check_data_length``: top-1 ``length(field)`` ≤ threshold
  (dag-knlp.py:260-279; threshold 13 for korean.word_id at :400).
Plus cleaning described-but-never-coded in README.md:15 (NA rows
removed, out-of-schema data removed).

Here each check is an engine op that returns its measurement as a
DataFrame (composable, no driver collect until the caller asserts) with
a raising wrapper that reproduces the reference's fail-the-pipeline
behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


# ---- engine API -----------------------------------------------------------


def check_count(df: DataFrame, min_rows: int = 1) -> int:
    """Row-count check (dag-knlp.py:243-258): raise if < min_rows.

    ``df.count()`` is a distributed partial+final count — the only value
    crossing to the driver is one long.
    """
    n = df.count()
    if n < min_rows:
        raise ValueError(f"Data quality check failed. Rows {n} < {min_rows}")
    return n


def check_max_length(df: DataFrame, column: str, max_length_th: int) -> int:
    """Max-string-length check (dag-knlp.py:260-279).

    The reference writes this as ``ORDER BY length(f) DESC LIMIT 1``;
    semantically it is ``max(length(f))``, which aggregates map-side and
    avoids even the top-k heap. Raise if the max exceeds the threshold.
    """
    row = df.select(F.max(F.length(F.col(column))).alias("max_len")).first()
    max_len = row["max_len"] if row is not None else None
    if max_len is not None and max_len > max_length_th:
        raise ValueError(
            f"Data quality check failed. length {max_len} > {max_length_th} for {column}"
        )
    return max_len if max_len is not None else 0


def drop_na_rows(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """README.md:15's 'NA rows are removed' as a real operator."""
    return df.na.drop(subset=subset)


def enforce_varchar(df: DataFrame, widths: dict[str, int]) -> DataFrame:
    """Out-of-schema cleaning: truncate strings to declared VARCHAR(n)
    widths (the reference declares widths in DDL, dag-knlp.py:24-63, but
    relies on Redshift to enforce them)."""
    out = df
    for col_name, width in widths.items():
        out = out.withColumn(col_name, F.substring(F.col(col_name), 1, width))
    return out


# ---- oracle-checked query demos ------------------------------------------


@query("agg_count", oracle="SELECT COUNT(*) AS cnt FROM lineitem")
def agg_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-table COUNT(*) (dag-knlp.py:252, Q-DQ1)."""
    return load_table(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("cnt"))


@query(
    "max_length_toplimit",
    oracle="SELECT length(c_name) AS len FROM customer ORDER BY length(c_name) DESC LIMIT 1",
)
def max_length_toplimit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max-as-top-1-sort-limit, the reference's exact shape
    (dag-knlp.py:273, Q-DQ2). Only the length is selected, so ordering
    ties cannot make the result nondeterministic. Catalyst executes the
    sort-limit as TakeOrderedAndProject (per-partition heap, no global
    sort)."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.select(F.length("c_name").alias("len"))
        .orderBy(F.col("len").desc())
        .limit(1)
    )


_PROFILE_COLS = ("doc_id", "text", "lang", "source", "n_chars")


@query(
    "column_profile",
    oracle="""
    SELECT 'doc_id' AS col, COUNT(doc_id)::BIGINT AS n_present,
           SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
           COUNT(DISTINCT doc_id)::BIGINT AS n_distinct,
           CAST(MIN(doc_id) AS VARCHAR) AS min_v,
           CAST(MAX(doc_id) AS VARCHAR) AS max_v
    FROM documents
    UNION ALL
    SELECT 'text', COUNT(text)::BIGINT,
           SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END)::BIGINT,
           COUNT(DISTINCT text)::BIGINT,
           CAST(MIN(text) AS VARCHAR), CAST(MAX(text) AS VARCHAR)
    FROM documents
    UNION ALL
    SELECT 'lang', COUNT(lang)::BIGINT,
           SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END)::BIGINT,
           COUNT(DISTINCT lang)::BIGINT,
           CAST(MIN(lang) AS VARCHAR), CAST(MAX(lang) AS VARCHAR)
    FROM documents
    UNION ALL
    SELECT 'source', COUNT(source)::BIGINT,
           SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END)::BIGINT,
           COUNT(DISTINCT source)::BIGINT,
           CAST(MIN(source) AS VARCHAR), CAST(MAX(source) AS VARCHAR)
    FROM documents
    UNION ALL
    SELECT 'n_chars', COUNT(n_chars)::BIGINT,
           SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END)::BIGINT,
           COUNT(DISTINCT n_chars)::BIGINT,
           CAST(MIN(n_chars) AS VARCHAR), CAST(MAX(n_chars) AS VARCHAR)
    FROM documents
    """,
)
def column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column table profile (count / nulls / exact distinct /
    min / max) — the generalization of the reference's two DQ checks
    into the profiling pass data-quality systems (Deequ-style) run
    before setting constraints.

    One branch per column rather than one wide multi-distinct
    aggregate: each branch's scan prunes to a SINGLE column (Catalyst
    column pruning per union arm), and none of them pays the Expand
    blow-up Spark uses for several COUNT(DISTINCT)s in one aggregate
    — at 100 TB each branch reads one column's pages, the cheapest
    exact formulation. Swap COUNT(DISTINCT) for approx_count_distinct
    per column when estimates suffice; exact is kept here so the
    oracle is engine-independent."""
    docs = load_table(spark, sf_dir, "documents")

    def branch(c: str) -> DataFrame:
        return docs.agg(
            F.lit(c).alias("col"),
            F.count(c).cast("bigint").alias("n_present"),
            F.sum(F.col(c).isNull().cast("int")).cast("bigint").alias("n_null"),
            F.countDistinct(c).cast("bigint").alias("n_distinct"),
            F.min(c).cast("string").alias("min_v"),
            F.max(c).cast("string").alias("max_v"),
        )

    out = branch(_PROFILE_COLS[0])
    for c in _PROFILE_COLS[1:]:
        out = out.unionAll(branch(c))
    return out


def observed_write(df: DataFrame, metrics: dict[str, F.Column]):
    """Materialize ``df`` through the noop sink while collecting
    ``metrics`` from the SAME pass via `DataFrame.observe` — the
    Spark-native way to get DQ measurements without a second scan
    (the accumulator-backed answer to Deequ's "metrics repository"
    pass). Returns the observed metrics dict.

    At 100 TB this is the difference between one pass and two: every
    pipeline stage can publish row counts / null counts / max widths
    as a side effect of the write it was doing anyway. Observed
    metrics are exact for deterministic aggregates (task retries
    re-observe, Spark reconciles per-task results).
    """
    from pyspark.sql import Observation

    obs = Observation()
    df.observe(obs, *[c.alias(n) for n, c in metrics.items()]).write.mode(
        "overwrite"
    ).format("noop").save()
    return obs.get


@query(
    "observed_metrics",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) FILTER (WHERE text IS NULL) AS BIGINT) AS n_null_text,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    """,
)
def observed_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass observed DQ metrics on the documents table: the
    reference's count/length checks (dag-knlp.py:243-279) plus null
    and total-width tallies, collected BY the materializing action
    via `observe` — no dedicated metrics scan. The returned one-row
    DataFrame is rebuilt from the observation payload; the oracle
    recomputes every metric from the raw table, so a lost/duplicated
    observation (the failure mode of accumulator-style metrics under
    retries) hash-mismatches."""
    docs = load_table(spark, sf_dir, "documents")
    got = observed_write(
        docs,
        {
            "n_rows": F.count(F.lit(1)),
            "n_null_text": F.count_if(F.col("text").isNull()),
            "max_chars": F.max("n_chars"),
            "total_chars": F.sum("n_chars"),
        },
    )
    return spark.createDataFrame(
        [
            (
                int(got["n_rows"]),
                int(got["n_null_text"]),
                int(got["max_chars"]),
                int(got["total_chars"]),
            )
        ],
        "n_rows LONG, n_null_text LONG, max_chars LONG, total_chars LONG",
    )


@query(
    "fk_orphans",
    oracle="""
    SELECT * FROM (
      SELECT 'orders.o_custkey->customer' AS relationship,
             CAST(COUNT(*) AS BIGINT) AS n_child_rows,
             CAST(COUNT(*) FILTER (WHERE c.c_custkey IS NULL) AS BIGINT)
               AS n_orphans
      FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      UNION ALL
      SELECT 'lineitem.l_orderkey->orders',
             CAST(COUNT(*) AS BIGINT),
             CAST(COUNT(*) FILTER (WHERE o.o_orderkey IS NULL) AS BIGINT)
      FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
      UNION ALL
      SELECT 'lineitem.l_partkey->part',
             CAST(COUNT(*) AS BIGINT),
             CAST(COUNT(*) FILTER (WHERE p.p_partkey IS NULL) AS BIGINT)
      FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
      UNION ALL
      SELECT 'lineitem.l_suppkey->supplier',
             CAST(COUNT(*) AS BIGINT),
             CAST(COUNT(*) FILTER (WHERE s.s_suppkey IS NULL) AS BIGINT)
      FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
      UNION ALL
      SELECT 'customer.c_nationkey->nation',
             CAST(COUNT(*) AS BIGINT),
             CAST(COUNT(*) FILTER (WHERE n.n_nationkey IS NULL) AS BIGINT)
      FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    )
    """,
)
def fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the star schema: per foreign
    key, child rows and orphan rows (children whose parent key is
    missing) — the DQ check a warehouse runs after every load, and
    the one the reference's IDENTITY-keyed staging cannot express
    (its keys are generated, never validated; dag-knlp.py:243-279
    checks counts and lengths only). Each relationship is one left
    join counted: at scale the parent side's distinct keys broadcast
    when bounded (nation/supplier) and shuffle-hash otherwise —
    counts aggregate map-side either way, so the audit's output is
    five rows regardless of corpus size."""
    def audit(child: DataFrame, ck: str, parent: DataFrame, pk: str,
              name: str) -> DataFrame:
        j = child.select(F.col(ck)).join(
            parent.select(F.col(pk)), child[ck] == parent[pk], "left"
        )
        return j.agg(
            F.lit(name).alias("relationship"),
            F.count(F.lit(1)).cast("bigint").alias("n_child_rows"),
            F.count_if(F.col(pk).isNull()).cast("bigint").alias("n_orphans"),
        )

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    parts = [
        audit(o, "o_custkey", c, "c_custkey", "orders.o_custkey->customer"),
        audit(li, "l_orderkey", o, "o_orderkey", "lineitem.l_orderkey->orders"),
        audit(li, "l_partkey", p, "p_partkey", "lineitem.l_partkey->part"),
        audit(li, "l_suppkey", s, "s_suppkey", "lineitem.l_suppkey->supplier"),
        audit(c, "c_nationkey", n, "n_nationkey", "customer.c_nationkey->nation"),
    ]
    out = parts[0]
    for q in parts[1:]:
        out = out.unionByName(q)
    return out


_GAP_BUCKET = 1024


@query(
    "id_gaps",
    oracle=f"""
    WITH b AS (
      SELECT o_orderkey // {_GAP_BUCKET} AS bucket, COUNT(*) AS n_present
      FROM orders GROUP BY 1
    ), bounds AS (
      SELECT MIN(o_orderkey) // {_GAP_BUCKET} AS lo,
             MAX(o_orderkey) // {_GAP_BUCKET} AS hi
      FROM orders
    ), all_buckets AS (
      SELECT unnest(generate_series(lo, hi)) AS bucket FROM bounds
    )
    SELECT a.bucket AS bucket,
           CAST(COALESCE(b.n_present, 0) AS BIGINT) AS n_present,
           CAST({_GAP_BUCKET} - COALESCE(b.n_present, 0) AS BIGINT)
             AS n_missing
    FROM all_buckets a LEFT JOIN b ON a.bucket = b.bucket
    """,
)
def id_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-completeness audit WITHOUT a global sort: the classic
    gap-detection query (lag over ORDER BY id) funnels every row
    through one partition — unrunnable at scale — so this buckets the
    key space ({_GAP_BUCKET} ids per bucket), counts presence per
    bucket (one map-side-partial groupBy), and joins against the full
    bucket range so fully-empty buckets surface too. TPC-H orderkeys
    are sparse by construction (the key space is ~4× the row count),
    so the audit fires on real structure, not a synthetic hole.
    Output is keyspace/{_GAP_BUCKET} rows — an aggregate, not a scan."""
    o = load_table(spark, sf_dir, "orders")
    b = o.groupBy(
        (F.col("o_orderkey") / _GAP_BUCKET).cast("bigint").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n_present"))
    bounds = o.agg(
        (F.min("o_orderkey") / _GAP_BUCKET).cast("bigint").alias("lo"),
        (F.max("o_orderkey") / _GAP_BUCKET).cast("bigint").alias("hi"),
    )
    all_buckets = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("bucket")
    )
    return all_buckets.join(b, "bucket", "left").select(
        "bucket",
        F.coalesce("n_present", F.lit(0)).cast("bigint").alias("n_present"),
        (F.lit(_GAP_BUCKET) - F.coalesce("n_present", F.lit(0)))
        .cast("bigint")
        .alias("n_missing"),
    )


@query(
    "benford_digits",
    oracle="""
    WITH d AS (
      SELECT substr(CAST(CAST(floor(l_extendedprice) AS BIGINT) AS VARCHAR),
                    1, 1) AS digit
      FROM lineitem WHERE l_extendedprice >= 1
    ), tot AS (SELECT COUNT(*) AS n FROM d)
    SELECT digit,
           CAST(COUNT(*) AS BIGINT) AS n,
           FLOOR(COUNT(*) * 1.0 / MAX(tot.n) * 1000000 + 0.5) / 1000000.0
             AS observed_p,
           ROUND(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS benford_p
    FROM d, tot GROUP BY digit
    """,
)
def benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law digit profile of `l_extendedprice` — the
    fraud/synthetic-data smell test: naturally-occurring multiplicative
    quantities put ~30.1% of leading digits at 1, and a column that
    deviates hard was generated, capped, or tampered with (TPC-H
    prices, being uniform-ish products, deviate — that's the point of
    profiling rather than asserting). Leading digit extraction goes
    through EXACT integer-to-string (substr of the floored BIGINT) —
    never log10-of-value, whose float boundary at powers of ten
    misclassifies; the Benford reference column is log10(1+1/d) at
    6dp, far from any rounding boundary for all nine digits. One scan,
    one 9-row aggregate."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_extendedprice") >= 1
    )
    d = li.select(
        F.substring(
            F.floor("l_extendedprice").cast("bigint").cast("string"), 1, 1
        ).alias("digit")
    )
    counts = d.groupBy("digit").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    tot = d.agg(F.count(F.lit(1)).alias("tot_n"))
    return counts.crossJoin(F.broadcast(tot)).select(
        "digit",
        "n",
        # observed_p is an exact int ratio → floor-form rounding (r12;
        # see corpus_mixture_weights); benford_p keeps ROUND — log10
        # output is irrational, no terminating-half mass, and its 6dp
        # values sit far from boundaries for all nine digits
        (
            F.floor(F.col("n") * 1.0 / F.col("tot_n") * 1000000 + 0.5)
            / 1000000.0
        ).alias("observed_p"),
        F.round(F.log10(1.0 + 1.0 / F.col("digit").cast("double")), 6).alias(
            "benford_p"
        ),
    )

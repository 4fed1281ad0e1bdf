"""Scalar-function surface (SURVEY.md §2.8).

The reference's own scalar usage is just `length` and `split`
(dag-knlp.py:102, 273); the engine exposes the full
`pyspark.sql.functions` surface. Correctness-checked representatives
over the driver tables cover date/time, arithmetic, string, and array
families. Everything here is JVM-side whole-stage-codegen — no Python
in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


@query(
    "date_extract",
    oracle="""
    SELECT o_orderkey,
           EXTRACT(YEAR FROM o_orderdate)::BIGINT    AS order_year,
           EXTRACT(MONTH FROM o_orderdate)::BIGINT   AS order_month,
           EXTRACT(QUARTER FROM o_orderdate)::BIGINT AS order_quarter,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start
    FROM orders
    """,
)
def date_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date part extraction + truncation on `orders.o_orderdate`."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("order_year"),
        F.month("o_orderdate").cast("bigint").alias("order_month"),
        F.quarter("o_orderdate").cast("bigint").alias("order_quarter"),
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month_start"),
    )


@query(
    "math_expr",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
           CAST(CEIL(l_quantity) AS BIGINT)  AS qty_ceil,
           CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
           ABS(l_discount - 0.05)            AS disc_dev,
           l_orderkey % 7                    AS key_mod
    FROM lineitem
    """,
)
def math_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic expression family on lineitem prices (SURVEY §2.8).

    Per-row double arithmetic is order-deterministic (unlike aggregated
    sums) so no rounding is needed for the oracle; ceil/floor cast to
    BIGINT explicitly because engines disagree on the return type.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))).alias(
            "charge"
        ),
        F.ceil("l_quantity").cast("bigint").alias("qty_ceil"),
        F.floor("l_quantity").cast("bigint").alias("qty_floor"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
    )


@query(
    "string_funcs",
    oracle="""
    SELECT c_custkey,
           UPPER(c_name)                        AS name_upper,
           LOWER(c_mktsegment)                  AS seg_lower,
           substr(c_name, 1, 8)                 AS name_prefix,
           length(c_name)::BIGINT               AS name_len,
           TRIM(c_name)                         AS name_trim,
           c_name || '#' || c_mktsegment        AS name_tagged,
           replace(c_name, 'Customer', 'Cust')  AS name_short
    FROM customer
    """,
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family (reference uses only length/split —
    dag-knlp.py:102, 273; this covers the standard surface)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").cast("bigint").alias("name_len"),
        F.trim(F.col("c_name")).alias("name_trim"),
        F.concat(F.col("c_name"), F.lit("#"), F.col("c_mktsegment")).alias("name_tagged"),
        F.regexp_replace("c_name", "Customer", "Cust").alias("name_short"),
    )


@query(
    "interval_arith",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE)         AS due_date,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '1998-01-01') AS BIGINT)
                                                               AS days_to_cutoff,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE)   AS month_end
    FROM orders
    """,
)
def interval_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/interval arithmetic: offsets, day differences, month ends."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
        F.datediff(F.lit("1998-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("bigint")
        .alias("days_to_cutoff"),
        F.last_day(F.col("o_orderdate").cast("date")).alias("month_end"),
    )


@query(
    "regexp_ops",
    oracle="""
    SELECT c_custkey,
           CAST(regexp_extract(c_name, 'Customer#([0-9]+)', 1) AS BIGINT) AS name_num,
           len(regexp_extract_all(c_name, '0'))::INT                      AS n_zeros,
           (regexp_matches(c_name, '1$'))                                 AS ends_in_one
    FROM customer
    """,
)
def regexp_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex family: capture-group extraction, match counting,
    boolean match — all JVM-side (no UDF)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", "Customer#([0-9]+)", 1).cast("bigint").alias("name_num"),
        F.size(F.regexp_extract_all(F.col("c_name"), F.lit("0"), 0)).alias("n_zeros"),
        F.col("c_name").rlike("1$").alias("ends_in_one"),
    )


@query(
    "coalesce_null",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           COALESCE(NULLIF(l_discount, 0.0), -1.0) AS disc_or_flag,
           (l_discount = 0.0)                      AS is_zero_disc,
           IFNULL(NULLIF(l_returnflag, 'N'), 'none') AS flag_or_none
    FROM lineitem
    """,
)
def coalesce_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling family: NULLIF / COALESCE / IFNULL and NULL-safe
    boolean logic (README.md:15's cleaning semantics, SURVEY §2.2 P3)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.coalesce(F.nullif(F.col("l_discount"), F.lit(0.0)), F.lit(-1.0)).alias(
            "disc_or_flag"
        ),
        (F.col("l_discount") == 0.0).alias("is_zero_disc"),
        F.ifnull(F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("none")).alias(
            "flag_or_none"
        ),
    )


@query(
    "case_when",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 300000 THEN 'large'
                WHEN o_totalprice >= 100000 THEN 'medium'
                ELSE 'small' END AS size_class,
           CASE o_orderstatus WHEN 'F' THEN 'finished'
                              WHEN 'O' THEN 'open'
                              ELSE 'partial' END AS status_name
    FROM orders
    """,
)
def case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE expression family — searched and simple forms."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000, "large")
        .when(F.col("o_totalprice") >= 100000, "medium")
        .otherwise("small")
        .alias("size_class"),
        F.when(F.col("o_orderstatus") == "F", "finished")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("partial")
        .alias("status_name"),
    )


@query(
    "array_ops",
    oracle="""
    SELECT vec_id,
           len(embedding)::INT                       AS dim,
           CAST(embedding[1] AS DOUBLE)              AS first_val,
           CAST(embedding[-1] AS DOUBLE)             AS last_val,
           len(list_filter(embedding, x -> x > 0))::INT AS n_positive
    FROM embeddings
    """,
)
def array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-column functions over `embeddings.embedding`
    (array<float> — the engine's vector-column capability, SURVEY
    §2.12): size, element access, higher-order filter. All JVM-side
    (`F.filter` is a Catalyst lambda, not a Python UDF)."""
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        F.size(emb).alias("dim"),
        F.element_at(emb, 1).cast("double").alias("first_val"),
        F.element_at(emb, -1).cast("double").alias("last_val"),
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_positive"),
    )


@query(
    "map_ops",
    oracle="""
    SELECT event_id,
           2                                              AS n_keys,
           CAST(json_extract(props, '$.k') AS BIGINT)     AS k_val,
           CAST(json_extract(props, '$.k') AS BIGINT)
             + user_id                                    AS sum_vals,
           TRUE                                           AS has_uid,
           CAST(json_extract(props, '$.k') AS BIGINT) * 2 AS k_doubled
    FROM events
    WHERE event_id < 2000
    """,
)
def map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface (the one Spark complex type the registry didn't
    yet demonstrate): build a map<string,bigint> per event from the
    JSON props plus a typed column, then exercise the map function
    family — map_keys / element_at / map_values folding /
    transform_values — reducing everything to scalar outputs (the
    driver canonicalizer contract). The oracle mirrors the SEMANTIC
    results from the same JSON, since map mechanics are engine-side.
    All map expressions are codegen'd column ops, map-side only."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    k_val = F.get_json_object("props", "$.k").cast("bigint")
    m = F.create_map(
        F.lit("k"), k_val, F.lit("uid"), F.col("user_id").cast("bigint")
    )
    doubled = F.transform_values(m, lambda _, v: v * 2)
    return e.select(
        "event_id",
        F.size(F.map_keys(m)).alias("n_keys"),
        F.element_at(m, F.lit("k")).alias("k_val"),
        F.aggregate(
            F.map_values(m), F.lit(0).cast("bigint"), lambda a, v: a + v
        ).alias("sum_vals"),
        F.array_contains(F.map_keys(m), "uid").alias("has_uid"),
        F.element_at(doubled, F.lit("k")).alias("k_doubled"),
    )


@query(
    "try_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 10 = 0 THEN NULL
                ELSE o_totalprice / (o_orderkey % 10) END AS safe_div,
           CASE WHEN o_orderkey % 10 = 0 THEN NULL
                ELSE CAST(o_custkey % (o_orderkey % 10) AS BIGINT) END AS safe_mod,
           NULL::INT AS overflow_add,
           CASE WHEN o_orderpriority LIKE '%-%'
                THEN TRY_CAST(substr(o_orderpriority, 1, 1) AS INT)
                ELSE NULL END AS parsed_prio
    FROM orders
    WHERE o_orderkey < 500
    """,
)
def try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe `try_` family: division by a sometimes-zero divisor,
    modulo behind the same guard, a deliberately overflowing int add,
    and a TRY_CAST over dirty text — each yields NULL instead of a
    task-killing exception. Under ANSI mode (Spark 4's default) a
    single bad row otherwise fails its whole task → stage retries →
    job death at 100 TB scale; `try_` keeps the plan codegen'd while
    quarantining bad rows as NULLs you can route to a DQ side
    channel. Oracle mirrors with CASE guards (DuckDB division by zero
    on HUGEINT/DOUBLE returns inf, not NULL — the guard normalizes
    both engines). The quotient ships UNrounded: IEEE double division
    is correctly-rounded and bit-identical in both engines, while a
    decimal ROUND on top straddles half-way binary boundaries
    differently (caught by the sf0.1 sweep: 267076.97/8)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    div = F.col("o_orderkey") % 10
    max_int = F.lit(2147483647).cast("int")
    return o.select(
        "o_orderkey",
        F.try_divide(F.col("o_totalprice"), div).alias("safe_div"),
        F.try_mod(F.col("o_custkey"), div).cast("bigint").alias("safe_mod"),
        F.try_add(max_int, F.lit(1).cast("int")).alias("overflow_add"),
        F.when(
            F.col("o_orderpriority").contains("-"),
            F.expr("try_cast(substr(o_orderpriority, 1, 1) AS INT)"),
        ).alias("parsed_prio"),
    )


@query(
    "xml_roundtrip",
    oracle="""
    SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars_rt,
           len(text) > 0 AS has_text
    FROM documents
    WHERE doc_id < 200
    """,
)
def xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML surface (Spark 4 to_xml/from_xml): serialize each doc's
    typed fields to an XML fragment, parse it back with an explicit
    schema, and emit the recovered values — the lossless-roundtrip
    contract a feed exchanging XML with legacy systems depends on.
    The oracle recomputes the same values straight from the table, so
    any serialization loss (escaping, whitespace, type coercion)
    hash-mismatches. Both directions are JVM expressions in one
    scan-project; no UDFs."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    xml = F.to_xml(
        F.struct("doc_id", "lang", "n_chars", "text"), {"rowTag": "doc"}
    )
    parsed = F.from_xml(
        xml, "doc_id BIGINT, lang STRING, n_chars BIGINT, text STRING", {"rowTag": "doc"}
    )
    return d.select(parsed.alias("p")).select(
        F.col("p.doc_id").alias("doc_id"),
        F.col("p.lang").alias("lang"),
        F.col("p.n_chars").alias("n_chars_rt"),
        (F.length("p.text") > 0).alias("has_text"),
    )


@query(
    "soundex_names",
    oracle="""
    WITH RECURSIVE src AS (
      SELECT p_partkey, upper(p_name) AS s FROM part
    ), walk AS (
      SELECT p_partkey, s, 1 AS i,
             substr(s, 1, 1) AS out,
             CASE WHEN translate(substr(s, 1, 1),
                                 'BFPVCGJKQSXZDTLMNR',
                                 '111122222222334556')
                       BETWEEN '1' AND '6'
                  THEN translate(substr(s, 1, 1),
                                 'BFPVCGJKQSXZDTLMNR',
                                 '111122222222334556')
                  ELSE '' END AS last
      FROM src WHERE substr(s, 1, 1) BETWEEN 'A' AND 'Z'
      UNION ALL
      SELECT p_partkey, s, i + 1,
             CASE WHEN substr(s, i + 1, 1) BETWEEN 'A' AND 'Z'
                       AND substr(s, i + 1, 1) NOT IN ('H', 'W')
                       AND translate(substr(s, i + 1, 1),
                                     'BFPVCGJKQSXZDTLMNR',
                                     '111122222222334556')
                           BETWEEN '1' AND '6'
                       AND translate(substr(s, i + 1, 1),
                                     'BFPVCGJKQSXZDTLMNR',
                                     '111122222222334556') <> last
                       AND length(out) < 4
                  THEN out || translate(substr(s, i + 1, 1),
                                        'BFPVCGJKQSXZDTLMNR',
                                        '111122222222334556')
                  ELSE out END,
             CASE WHEN NOT substr(s, i + 1, 1) BETWEEN 'A' AND 'Z' THEN ''
                  WHEN substr(s, i + 1, 1) IN ('H', 'W') THEN last
                  WHEN translate(substr(s, i + 1, 1),
                                 'BFPVCGJKQSXZDTLMNR',
                                 '111122222222334556')
                       BETWEEN '1' AND '6'
                  THEN translate(substr(s, i + 1, 1),
                                 'BFPVCGJKQSXZDTLMNR',
                                 '111122222222334556')
                  ELSE '' END
      FROM walk WHERE i < length(s)
    )
    SELECT p_partkey, rpad(out, 4, '0') AS sx
    FROM walk WHERE i = length(s)
    """,
)
def soundex_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soundex phonetic codes of part names — a CROSS-IMPLEMENTATION
    oracle like `jaro_winkler_names`: Spark evaluates its JVM builtin
    (`F.soundex`, whole-stage codegen), DuckDB replays the EXACT
    convention as a recursive-CTE character walk, and every code
    hash-verifies. The convention was pinned empirically (0 mismatches
    on 1,015 adversarial strings, regression-tested in
    test_skew_sql): the first letter's code seeds the duplicate-run
    state, H/W are transparent (the run survives them), any non-alpha
    RESETS the run, vowels break it — the variant American Soundex
    most implementations document loosely and implement differently.
    Part names contain spaces, so the reset path runs on graded data,
    not just in the pytest."""
    from ..catalog import load_table

    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey", F.soundex(F.upper(F.col("p_name"))).alias("sx")
    )

"""Text-parsing operators — the reference's preprocess stage re-expressed
as vectorized column expressions (SURVEY.md §2.1 S1-S3).

The reference parses three raw text formats with per-line Python loops
and O(n²) pandas row appends (dag-knlp.py:85-188 — the code that "waits
for hours"). Here the same parses are declarative `split`/`explode`
expressions that run inside whole-stage codegen; file-backed variants
live in ``sources.text``. The oracle-checked demos below reconstruct
delimited/tuple-burst lines from the ``documents`` table and parse them
back, proving the parse is lossless against the identity oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table
from ..registry import query


def split_delimited(
    df: DataFrame,
    input_col: str,
    sep: str,
    field_names: list[str],
    overflow: str = "join",
    join_sep: str | None = None,
) -> DataFrame:
    """Split ``input_col`` on ``sep`` into ``field_names``.

    Reference semantics (dag-knlp.py:94-107): lines may be ragged; when
    a line has more fields than columns, the overflow packs into the
    LAST column — as a rejoined string (``overflow='join'``) or an
    honest ``array<string>`` (``overflow='array'``, the de-facto type
    hiding in the reference's staged JSON, SURVEY.md §1.2).

    Short lines (fewer fields than columns — e.g. a line with no
    delimiter at all) yield NULLs in the missing trailing fields:
    ``F.get`` is the null-tolerant indexer (``getItem`` throws under
    ANSI mode).

    ``F.split`` takes a regex where Python's ``str.split`` is literal —
    callers pass a pre-escaped pattern (e.g. ``\\),\\(`` for ``),(``)
    and, when the pattern isn't the literal text, the literal
    ``join_sep`` to rejoin overflow with.
    """
    n = len(field_names)
    join_sep = sep if join_sep is None else join_sep
    parts = F.split(F.col(input_col), sep)
    cols = [F.get(parts, i).alias(field_names[i]) for i in range(n - 1)]
    tail = F.slice(parts, n, F.greatest(F.size(parts) - (n - 1), F.lit(0)))
    if overflow == "array":
        cols.append(tail.alias(field_names[n - 1]))
    else:
        cols.append(
            F.when(F.size(parts) >= n, F.array_join(tail, join_sep))
            .otherwise(F.get(parts, n - 1))
            .alias(field_names[n - 1])
        )
    return df.select(*[c for c in df.columns if c != input_col], *cols)


@query(
    "parse_delimited",
    oracle="""
    WITH raw AS (
      SELECT source || ':' || lang || ':' || CAST(doc_id AS VARCHAR)
             || ':' || substr(text, 1, 20) AS line
      FROM documents
    ), parts AS (SELECT string_split(line, ':') AS p FROM raw)
    SELECT p[1] AS f1, p[2] AS f2, array_to_string(p[3:], ':') AS rest
    FROM parts
    """,
)
def parse_delimited(spark: SparkSession, sf_dir: str) -> DataFrame:
    """':'-delimited parse with ragged-overflow-into-last-column
    (dag-knlp.py:94-107, S1/S2). Lines are built with 4 fields and
    parsed into 3, so the overflow path is always exercised; the tail
    rejoins with the original separator, matching the reference's
    list-in-last-column then re-serialize behavior.
    """
    docs = load_table(spark, sf_dir, "documents")
    lines = docs.select(
        F.concat_ws(
            ":",
            F.col("source"),
            F.col("lang"),
            F.col("doc_id").cast("string"),
            F.substring(F.col("text"), 1, 20),
        ).alias("line")
    )
    return split_delimited(lines, "line", ":", ["f1", "f2", "rest"], overflow="join")


@query(
    "explode_tuples",
    oracle="SELECT CAST(doc_id AS VARCHAR) AS article_id, lang AS language FROM documents",
)
def explode_tuples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tuple-burst parse (dag-knlp.py:160-179, S3): one input line holds
    many '),('-separated tuples; each explodes to a row, then splits on
    ','. The reference's only row-multiplying operator → `explode` of a
    split array. Lines are reconstructed per-source from `documents`,
    so the identity oracle proves the roundtrip is lossless. Note the
    regex-escaped separator ``\\),\\(`` (F.split is regex; Python's
    str.split at dag-knlp.py:173 is literal).
    """
    docs = load_table(spark, sf_dir, "documents")
    lines = docs.groupBy("source").agg(
        F.concat_ws(
            "),(",
            F.collect_list(F.concat_ws(",", F.col("doc_id").cast("string"), F.col("lang"))),
        ).alias("line")
    )
    tuples = lines.select(F.explode(F.split(F.col("line"), r"\),\(")).alias("tup"))
    parts = F.split(F.col("tup"), ",")
    return tuples.select(
        parts.getItem(0).alias("article_id"), parts.getItem(1).alias("language")
    )


@query(
    "json_roundtrip",
    oracle="SELECT event_id, event_type, value FROM events",
)
def json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines encode→decode roundtrip (S4+S6: the reference stages
    pandas `to_json(orient='records', lines=True)` files to S3 and loads
    them with `COPY ... JSON 'auto'` name-binding, dag-knlp.py:109-111,
    202-205). `to_json(struct(...))` → `from_json` with explicit schema
    reproduces the name-bound roundtrip; the identity oracle proves it
    lossless (doubles included — Jackson emits shortest-roundtrip
    literals)."""
    e = load_table(spark, sf_dir, "events")
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    encoded = e.select(
        F.to_json(F.struct("event_id", "event_type", "value")).alias("js")
    )
    return encoded.select(F.from_json("js", schema).alias("r")).select("r.*")


@query(
    "posexplode_array",
    oracle="""
    SELECT vec_id,
           generate_subscripts(embedding[1:3], 1)      AS pos,
           CAST(unnest(embedding[1:3]) AS DOUBLE)      AS val
    FROM embeddings
    """,
)
def posexplode_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode (UNNEST WITH ORDINALITY) over an array slice —
    the lateral-view/flatten operator with position tracking."""
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.select("vec_id", F.posexplode(F.slice("embedding", 1, 3)).alias("p", "v"))
        .select("vec_id", (F.col("p") + 1).alias("pos"), F.col("v").cast("double").alias("val"))
    )


@query(
    "variant_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_variant
    FROM events
    """,
)
def variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT path (Spark 4): `parse_json` →
    binary-encoded variant → typed `variant_get` extraction. At scale
    variant decode beats per-query string re-parsing (shredded storage
    + typed access); falls back to `get_json_object` when the variant
    API is unavailable."""
    e = load_table(spark, sf_dir, "events")
    try:
        return e.select(
            "event_id",
            F.variant_get(F.parse_json(F.col("props")), "$.k", "bigint").alias(
                "k_variant"
            ),
        )
    except AttributeError:  # pre-4.0 Spark without the variant API
        return e.select(
            "event_id", F.get_json_object("props", "$.k").cast("bigint").alias("k_variant")
        )


@query(
    "json_extract",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    """,
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar JSON field extraction from the `events.props` JSON column
    (SURVEY §2.8) — `get_json_object` stays JVM-side, no UDF."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
    )


@query(
    "csv_roundtrip",
    oracle="SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer",
)
def csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink→source roundtrip through real files (SURVEY §2.1 source
    coverage): write `customer` as headered CSV, read it back with an
    explicit schema, prove losslessness against the identity oracle
    (doubles survive via shortest-roundtrip literals). At scale CSV is
    the interchange format, not the storage format — no pushdown, no
    column pruning — which is exactly why the roundtrip, not the
    analytics, is the demo."""
    import tempfile

    c = load_table(spark, sf_dir, "customer")
    # Unique dir per invocation: a fixed predictable path races with a
    # concurrent sweep's overwrite (and could collide with another
    # user's /tmp entry); mkdtemp is created 0700 and owned by us. The
    # returned DataFrame reads the path lazily, so it must outlive this
    # call — never cleaned up here by design.
    path = tempfile.mkdtemp(prefix="etl_knlp_io_csv_") + "/data"
    c.write.option("header", True).csv(path)
    return spark.read.schema(
        "c_custkey BIGINT, c_name STRING, c_nationkey INT, "
        "c_acctbal DOUBLE, c_mktsegment STRING"
    ).option("header", True).csv(path)


@query(
    "orc_roundtrip",
    oracle="SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, "
           "o_orderdate, o_orderpriority FROM orders",
)
def orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink→source roundtrip (the columnar alternative to parquet —
    same predicate pushdown/column pruning story, different ecosystem).
    Identity oracle over all six `orders` columns including the
    timestamp proves bit-level losslessness."""
    import tempfile

    o = load_table(spark, sf_dir, "orders")
    # Unique per invocation — see csv_roundtrip's race note.
    path = tempfile.mkdtemp(prefix="etl_knlp_io_orc_") + "/data"
    o.write.orc(path)
    return spark.read.orc(path)


@query(
    "schema_evolution",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           CAST(NULL AS VARCHAR) AS o_orderpriority
    FROM orders WHERE o_orderkey % 2 = 0
    UNION ALL
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
    FROM orders WHERE o_orderkey % 2 = 1
    """,
)
def schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution read (mergeSchema): two parquet batches written
    at different times with different schemas — the second batch added
    an `o_orderpriority` column — read back as ONE table, with the
    missing column NULL-filled for old files. This is how a long-lived
    100 TB dataset actually grows columns: no rewrite of historical
    files, the reader reconciles per-file footers (mergeSchema pays a
    footer-read per file at planning; a table-format catalog amortizes
    it). The oracle reconstructs the same union shape from the source
    table."""
    import tempfile

    o = load_table(spark, sf_dir, "orders")
    path = tempfile.mkdtemp(prefix="etl_knlp_io_evo_") + "/data"
    # batch 1: the original 3-column schema (even keys)
    o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    ).write.parquet(path + "/batch=1")
    # batch 2: schema grew a column (odd keys)
    o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    ).write.parquet(path + "/batch=2")
    return (
        spark.read.option("mergeSchema", True)
        .parquet(path)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
    )


def read_fixed_width(
    spark: SparkSession, path: str, fields: list[tuple[str, int, str]]
) -> DataFrame:
    """Fixed-width text source: `fields` is (name, width, cast-type)
    in record order. One `spark.read.text` scan + substring/trim/cast
    projections — whole-stage-codegen'd, no UDF, no shuffle; the
    classic mainframe/warehouse staging format Spark has no built-in
    reader for."""
    raw = spark.read.text(path)
    cols, pos = [], 1
    for name, width, typ in fields:
        c = F.trim(F.substring("value", pos, width))
        cols.append((c.cast(typ) if typ != "string" else c).alias(name))
        pos += width
    return raw.select(*cols)


@query(
    "fixedwidth_roundtrip",
    oracle="SELECT c_custkey, c_name, c_nationkey, c_mktsegment FROM customer",
)
def fixedwidth_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width sink→source roundtrip: `customer` rendered as
    padded fixed-width records (format_string, JVM-side), read back by
    `read_fixed_width`'s substring projections, identity-oracled.
    Fixed-width survives where delimiters can't (values containing
    the delimiter — the reference's `:`-split corruption class by
    construction cannot happen) at the cost of a widths contract;
    TPC-H string values carry no trailing spaces, so trim is
    lossless here."""
    import tempfile

    c = load_table(spark, sf_dir, "customer")
    lines = c.select(
        F.format_string(
            "%-12d%-28s%-6d%-12s",
            "c_custkey", "c_name", "c_nationkey", "c_mktsegment",
        ).alias("value")
    )
    # Unique per invocation — see csv_roundtrip's race note.
    path = tempfile.mkdtemp(prefix="etl_knlp_io_fw_") + "/data"
    lines.write.text(path)
    return read_fixed_width(
        spark,
        path,
        [
            ("c_custkey", 12, "bigint"),
            ("c_name", 28, "string"),
            ("c_nationkey", 6, "int"),
            ("c_mktsegment", 12, "string"),
        ],
    )

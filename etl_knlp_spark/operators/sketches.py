"""Count-min sketch: fixed-memory frequency estimation, built and
merged entirely with DataFrame aggregates (no UDFs, no driver state).

The 100 TB story is the POINT of this operator: exact per-token counts
need a shuffle keyed on every distinct token (vocabulary-sized state),
while the sketch is a constant d×w counter grid that (a) builds
map-side — each partition's partial HashAggregate over (row, col) IS
the partial sketch, (b) merges by elementwise sum — which is exactly
what the final HashAggregate does, and (c) answers any point query
with d lookups. Hashes are seeded xxhash64 columns, so the whole build
stays inside whole-stage codegen.

Estimate guarantees (Cormode & Muthukrishnan 2005): est >= true count
always (counters only over-count), and est <= true + (e/w)·N with
probability 1 - e^-d. Both are emitted as boolean contract columns and
checked by the oracle — the estimate itself is engine-specific and
never hash-compared (same assertion-oracle pattern as
approx_distinct).

Ref parity: the reference has no sketches; its exact GROUP BY counts
(dag-knlp.py:65-80 style) are what the sketch replaces when the key
cardinality itself is the scale problem.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

_D = 4  # hash rows
_W = 1024  # counters per row
_EPS = 2.7182818 / _W  # CMS over-count bound factor


def _cells(tokens: DataFrame, col: str) -> DataFrame:
    """d×w sketch cells from a token column: explode each token into
    its d (row, bucket) coordinates, then count per cell. The result
    is at most d·w rows regardless of input size — the fixed-size
    mergeable summary."""
    coords = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                F.pmod(F.xxhash64(F.col(col), F.lit(i)), F.lit(_W)).alias("bucket"),
            )
            for i in range(_D)
        ]
    )
    return (
        tokens.select(F.explode(coords).alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cell_ct"))
    )


def cms_estimate(tokens: DataFrame, candidates: DataFrame, col: str) -> DataFrame:
    """Point-query ``candidates[col]`` against the sketch of
    ``tokens[col]``: join each candidate's d coordinates to the cells,
    take the min. Candidates is small (broadcast); cells is ≤ d·w rows
    (also broadcast) — estimation is shuffle-free."""
    cells = _cells(tokens, col)
    probes = candidates.select(
        col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        F.pmod(F.xxhash64(F.col(col), F.lit(i)), F.lit(_W)).alias(
                            "bucket"
                        ),
                    )
                    for i in range(_D)
                ]
            )
        ).alias("p"),
    ).select(col, F.col("p.row").alias("row"), F.col("p.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(cells), ["row", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce("cell_ct", F.lit(0))).alias("cms_est"))
    )


@query(
    "cms_heavy_hitters",
    oracle="""
    WITH t AS (
      SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token
      FROM documents
    ), top AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS exact_ct
      FROM t GROUP BY token
      ORDER BY exact_ct DESC, token LIMIT 20
    )
    SELECT token, exact_ct,
           TRUE AS est_ge_exact, TRUE AS est_within_eps
    FROM top
    """,
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters under a count-min sketch: estimate the top-20
    tokens' frequencies from the fixed d×w grid and emit the CMS
    contract — est >= exact (always true: counters only over-count)
    and est <= exact + (e/w)·N (true w.h.p.; deterministic here since
    the hashes are seeded). The oracle recomputes the exact counts and
    expects both booleans TRUE, so a broken sketch (under-count = bad
    merge, blown bound = bad hashing) hash-mismatches. The exact
    top-20 is computed alongside as ground truth — at 100 TB you'd
    keep ONLY the sketch and a candidate stream."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("token")
    )
    exact = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_ct"))
        .orderBy(F.col("exact_ct").desc(), "token")
        .limit(20)
    )
    n_total = toks.count()  # one scalar action: the bound needs N
    est = cms_estimate(toks, exact.select("token"), "token")
    return (
        exact.join(est, "token")
        .select(
            "token",
            "exact_ct",
            (F.col("cms_est") >= F.col("exact_ct")).alias("est_ge_exact"),
            (F.col("cms_est") <= F.col("exact_ct") + F.lit(_EPS * n_total)).alias(
                "est_within_eps"
            ),
        )
    )


@query(
    "hll_distinct_by_source",
    oracle="""
    SELECT source,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS exact_distinct,
           TRUE AS hll_ok
    FROM documents GROUP BY source
    UNION ALL
    SELECT '__ALL__' AS source,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS exact_distinct,
           TRUE AS hll_ok
    FROM documents
    """,
)
def hll_distinct_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-counting with Spark 4's native HyperLogLog
    sketches: one `hll_sketch_agg` pass builds a per-source sketch,
    and the GLOBAL estimate comes from `hll_union_agg` over those
    sketches — never a second scan. That union-of-partials is the
    100 TB property: per-partition/per-day sketches are a few KB
    each, persist beside the data, and any rollup (per source, per
    month, whole corpus) is a sketch merge instead of a re-scan —
    COUNT(DISTINCT) over raw data re-shuffles every id every time.
    The oracle pins the contract (estimate within 5% of exact at
    default lgConfigK=12, whose theoretical RSE is ~1.6%); estimates
    themselves are engine-specific, the same assertion-oracle pattern
    as approx_distinct."""
    docs = load_table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.hll_sketch_agg("doc_id").alias("sk"),
        F.countDistinct("doc_id").alias("exact_distinct"),
    )
    src_rows = per_src.select(
        "source",
        "exact_distinct",
        (
            F.abs(F.hll_sketch_estimate("sk") - F.col("exact_distinct"))
            <= F.col("exact_distinct") * 0.05
        ).alias("hll_ok"),
    )
    merged = per_src.agg(
        F.hll_union_agg("sk").alias("u"),
        F.sum("exact_distinct").alias("exact_distinct"),  # doc_id unique per source
    ).select(
        F.lit("__ALL__").alias("source"),
        "exact_distinct",
        (
            F.abs(F.hll_sketch_estimate("u") - F.col("exact_distinct"))
            <= F.col("exact_distinct") * 0.05
        ).alias("hll_ok"),
    )
    return src_rows.unionByName(merged)


@query(
    "bitmap_distinct",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY event_type
    """,
)
def bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via bitmap aggregation (the Spark 3.5+
    bitmap function family): user ids bucket into 32k-bit bitmaps
    (bitmap_bucket_number / bitmap_bit_position), per-(group, bucket)
    bitmaps OR-merge associatively, and the distinct count is the sum
    of per-bucket popcounts. Unlike COUNT(DISTINCT) — whose exact form
    must shuffle every distinct key to a single reducer per group —
    bitmap partials are fixed-size (4 KB per bucket) and merge
    map-side, so the exact count scales like an approximate sketch
    while staying exact. The oracle is the plain COUNT(DISTINCT):
    results must be identical, proving the bitmap path is exact."""
    e = load_table(spark, sf_dir, "events")
    per_bucket = e.groupBy(
        "event_type",
        F.bitmap_bucket_number(F.col("user_id")).alias("bucket"),
    ).agg(
        F.bitmap_construct_agg(F.bitmap_bit_position(F.col("user_id"))).alias("bm")
    )
    return per_bucket.groupBy("event_type").agg(
        F.sum(F.bitmap_count("bm")).cast("bigint").alias("n_users")
    )

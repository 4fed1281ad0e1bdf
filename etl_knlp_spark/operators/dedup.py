"""Deduplication operators for training-data pipelines (SURVEY.md §2.12).

Five strategies, all expressed as DataFrame plans (no driver-side
loops, no row-at-a-time Python):

- exact:          hash-groupBy on the text (or fingerprint) key.
- n-gram Jaccard: inverted-index self-join on shared n-grams — the
                  exact-but-blocked fuzzy dedup; oracle-checkable.
- embedding:      cosine-over-threshold pairs with label blocking.
- MinHash+LSH:    shingle → minhash signature → banded bucket join →
                  verify exact Jaccard. The 100 TB path: candidate
                  generation touches only docs sharing a band bucket.
- SimHash:        64-bit signature, computed entirely in per-row
                  higher-order expressions (one projection, no shuffle).

At 100 TB: exact dedup is one shuffle on the digest key; MinHash
banding keys the shuffle on (band_idx, band_hash) whose cardinality is
tunable via bands×rows; the brute-force n-gram/cosine joins exist as
verifiers and small-blocking-group paths — LSH variants are the scale
story.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.vector import cosine
from ..registry import query

# word 2-grams of the lowercased, whitespace-split text, deduplicated.
_GRAMS_EXPR = """
array_distinct(transform(
  sequence(1, size(toks) - 1),
  i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1))
))
"""


def exact_dedup(df: DataFrame, subset: list[str]) -> DataFrame:
    """Keep one row per key — `dropDuplicates` = hash aggregate with
    map-side partial dedup (the first duplicate dies before shuffle)."""
    return df.dropDuplicates(subset)


@query(
    "dedup_exact",
    oracle="""
    SELECT MIN(doc_id) AS doc_id, COUNT(*) AS dup_count
    FROM documents
    GROUP BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on the normalized-text fingerprint: one surviving
    doc_id (deterministic: the minimum) + group size per distinct text.
    Grouping on the md5 digest instead of the full text keeps shuffle
    rows ~32 bytes wide regardless of document length — the difference
    between shuffling 100 TB of text and 100 GB of digests."""
    docs = load_table(spark, sf_dir, "documents")
    normalized = F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
    return (
        docs.select(F.md5(normalized).alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("dup_count"))
        .select("doc_id", "dup_count")
    )


@query(
    "dedup_ngram_jaccard",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang, string_split_regex(trim(lower(text)), '\\s+') AS t
      FROM documents
    ), grams AS (
      SELECT doc_id, lang,
             list_distinct(list_transform(generate_series(1, len(t) - 1),
                                          i -> t[i] || ' ' || t[i + 1])) AS g
      FROM toks WHERE len(t) >= 2
    ), inv AS (
      SELECT doc_id, lang, len(g) AS n, unnest(g) AS gram FROM grams
    ), shared AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.n AS n_a, b.n AS n_b, COUNT(*) AS n_shared
      FROM inv a JOIN inv b ON a.gram = b.gram AND a.lang = b.lang
                           AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4
    )
    SELECT doc_a, doc_b,
           ROUND(n_shared * 1.0 / (n_a + n_b - n_shared), 6) AS jaccard
    FROM shared
    WHERE n_shared * 1.0 / (n_a + n_b - n_shared) >= 0.05
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-bigram Jaccard near-dup pairs via inverted-index self-join
    (SURVEY §2.12 fuzzy dedup, exact variant).

    Candidate pairs come from the inverted index (docs sharing ≥1 gram
    within the same language block) — never a cross join. Jaccard is a
    ratio of exact integers, so engine/oracle agree bit-for-bit. At
    scale, hot grams need a document-frequency cap (drop grams in >p%
    of docs, standard in dedup pipelines) or the MinHash path below.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    grams = (
        docs.select("doc_id", "lang", toks.alias("toks"))
        .filter(F.size("toks") >= 2)
        .select("doc_id", "lang", F.expr(_GRAMS_EXPR).alias("g"))
    )
    inv = grams.select(
        "doc_id", "lang", F.size("g").alias("n"), F.explode("g").alias("gram")
    )
    a, b = inv.alias("a"), inv.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n").alias("n_a"),
            F.col("b.n").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    jac = F.col("n_shared") * 1.0 / (F.col("n_a") + F.col("n_b") - F.col("n_shared"))
    return shared.filter(jac >= 0.05).select(
        "doc_a", "doc_b", F.round(jac, 6).alias("jaccard")
    )


@query(
    "dedup_embedding",
    oracle="""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND(list_cosine_similarity(a.emb, b.emb), 6) AS cos_sim
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.emb, b.emb) >= 0.35
    """,
)
def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs with label blocking
    (SURVEY §2.12). The equi conjunct on `label` keys the join — cosine
    evaluates only within blocks, a stand-in for the LSH/IVF bucketing
    that bounds pair counts at 100 TB. Cosine is a pure Catalyst
    higher-order expression (functions.vector), no UDF."""
    e = load_table(spark, sf_dir, "embeddings")
    a = e.select(
        F.col("vec_id").alias("vec_a"), F.col("label").alias("label_a"), F.col("embedding").alias("emb_a")
    )
    b = e.select(
        F.col("vec_id").alias("vec_b"), F.col("label").alias("label_b"), F.col("embedding").alias("emb_b")
    )
    sim = cosine(F.col("emb_a"), F.col("emb_b"))
    return (
        a.join(b, (F.col("label_a") == F.col("label_b")) & (F.col("vec_a") < F.col("vec_b")))
        .withColumn("cos_sim_raw", sim)
        .filter(F.col("cos_sim_raw") >= 0.35)
        .select("vec_a", "vec_b", F.round("cos_sim_raw", 6).alias("cos_sim"))
    )


# ---- MinHash + LSH --------------------------------------------------------

_SHINGLES_EXPR = """
array_distinct(transform(
  sequence(1, greatest(length(norm) - 4, 1)),
  i -> substr(norm, i, 5)
))
"""

# 32 minhash permutations via seeded xxhash64; banded 8×4 for LSH.
_N_HASHES = 32
_BAND_ROWS = 4

_SIG_EXPR = f"""
transform(
  sequence(0, {_N_HASHES - 1}),
  j -> array_min(transform(shingles, s -> xxhash64(concat(cast(j AS string), s))))
)
"""

_BANDS_EXPR = f"""
transform(
  sequence(0, {_N_HASHES // _BAND_ROWS - 1}),
  b -> named_struct(
    'band_idx', b,
    'band_hash', xxhash64(concat_ws(',', transform(
      slice(sig, b * {_BAND_ROWS} + 1, {_BAND_ROWS}), h -> cast(h AS string))))
  )
)
"""


def minhash_candidates(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Candidate near-dup pairs via MinHash banding (the scalable path).

    char-5-shingles → 32 seeded-xxhash64 minhashes → 8 bands of 4 →
    docs colliding on any (band_idx, band_hash) become candidates. The
    only shuffle is the groupBy on band buckets; signature computation
    is a per-row projection. Probability of candidacy ≈
    1-(1-j^4)^8 for true Jaccard j (≥0.9 dups are caught w.p. >99.9%).
    """
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    sigs = (
        docs.select(F.col(id_col).alias("doc_id"), norm.alias("norm"))
        .filter(F.length("norm") >= 5)
        .withColumn("shingles", F.expr(_SHINGLES_EXPR))
        .withColumn("sig", F.expr(_SIG_EXPR))
        .withColumn("band", F.explode(F.expr(_BANDS_EXPR)))
        .select("doc_id", "shingles", F.col("band.band_idx").alias("band_idx"), F.col("band.band_hash").alias("band_hash"))
    )
    a = sigs.select(
        F.col("band_idx"), F.col("band_hash"), F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a")
    )
    b = sigs.select(
        F.col("band_idx"),
        F.col("band_hash"),
        F.col("doc_id").alias("doc_b"),
        F.col("shingles").alias("sh_b"),
    )
    return (
        a.join(b, ["band_idx", "band_hash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sh_a", "sh_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )


@query("dedup_minhash", oracle=None)  # seeded-hash signatures are engine-specific
def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup detection on `documents` (SURVEY §2.12):
    banded candidate generation + exact-Jaccard verification on the
    char-shingle sets. Rows-only driver check (hash seeds are
    engine-specific); tests verify recall on injected duplicates."""
    docs = load_table(spark, sf_dir, "documents")
    cands = minhash_candidates(docs)
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = inter * 1.0 / union
    return (
        cands.withColumn("jaccard_raw", jac)
        .filter(F.col("jaccard_raw") >= 0.7)
        .select("doc_a", "doc_b", F.round("jaccard_raw", 6).alias("jaccard"))
    )


_SIMHASH_EXPR = """
aggregate(
  sequence(0, 63),
  0L,
  (acc, k) -> acc + shiftleft(
    if(aggregate(toks, 0L,
         (s, t) -> s + if((shiftright(xxhash64(t), k) & 1L) = 1L, 1L, -1L)) >= 0L,
       1L, 0L),
    k)
)
"""


@query("dedup_simhash", oracle=None)  # xxhash64 bit-patterns are engine-specific
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash signature per document (SURVEY §2.12).

    Each token's xxhash64 votes ±1 on every bit position; the sign
    vector packs into one long. Computed entirely in per-row
    higher-order expressions — a pure projection, zero shuffles; near-dup
    search then joins on 16-bit sub-bands of the signature (tests)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.array_distinct(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
    return (
        docs.select("doc_id", toks.alias("toks"))
        .select("doc_id", F.expr(_SIMHASH_EXPR).alias("simhash"))
    )


def simhash_neardup_pairs(sigs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs from simhash signatures: join on any equal 16-bit
    band (pigeonhole: hamming ≤ 3 ⇒ at least one of 4 bands equal),
    then verify exact hamming distance via bit_count(xor)."""
    banded = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.expr(
                "transform(sequence(0,3), b -> named_struct("
                "'band_idx', b, 'band_val', (shiftright(simhash, b * 16) & 65535L)))"
            )
        ).alias("band"),
    ).select("doc_id", "simhash", "band.band_idx", "band.band_val")
    a = banded.select(
        F.col("band_idx"), F.col("band_val"), F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sig_a")
    )
    b = banded.select(
        F.col("band_idx"), F.col("band_val"), F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sig_b")
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        a.join(b, ["band_idx", "band_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )

"""IVF (inverted-file) similarity index: k-means coarse quantization +
cluster-probed search (SURVEY.md §2.12 — the scale path alternative to
random-hyperplane LSH in `similarity.py`).

Build: Lloyd's k-means over DataFrames. Assignment and distance are
distributed column expressions; only the k×dim centroid table (bounded,
~16×64 doubles here) syncs through the driver per iteration — the same
bounded-aggregate pattern MLlib's k-means uses. Deterministic: seeded
init (first k vec_ids), min-struct tie-breaks.

Search: a query probes the `nprobe` nearest centroids and brute-forces
only those clusters — at 100 TB the corpus is stored partitioned by
cluster_id, so a probe reads nprobe/k of the data (partition pruning
does the rest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.vector import as_double, dot, l2_norm
from ..registry import query
from . import similarity as _sim

_K = 16
_N_PROBE = 4
_TOP_K = 10
_N_QUERIES = 5
_TRAIN_CAP = 1024


def training_sample(vectors: DataFrame, cap: int = _TRAIN_CAP) -> DataFrame:
    """Deterministic bounded training set for Lloyd's iterations: keep
    rows whose xxhash64(vec_id) lands in one of ``ceil(n/cap)`` residue
    classes. One cheap count pass up front; after that, every training
    iteration touches ≤ ~cap rows no matter how large the corpus is —
    the full corpus is read exactly once more, by the final assignment
    pass. (Without this, k-means training is max_iter full-corpus
    passes; at 100 TB that is the dominant cost and the sample changes
    centroid quality only marginally — the standard IVF/PQ recipe.)
    Deterministic given the data: no RNG, hash-residue selection."""
    n = vectors.count()
    if n <= cap:
        return vectors
    denom = -(-n // cap)  # ceil
    picked = vectors.filter(F.pmod(F.xxhash64(F.col("vec_id")), F.lit(denom)) == 0)
    if not picked.limit(1).count():
        # degenerate small-n case: every id hashed outside residue
        # class 0 — fall back to the cap lowest ids (TakeOrdered,
        # driver-bounded) so training always has data
        return vectors.orderBy("vec_id").limit(cap)
    return picked


def _ordered_sum(key_col: str, val_col: str):
    """Aggregate expression: sum ``val_col`` over the group in
    ascending ``key_col`` order — a LAYOUT-INDEPENDENT float sum (the
    r13 pq.py review class: a plain F.sum(double) folds in
    shuffle-arrival order, so two layouts of the same rows can differ
    in the last ulp; wherever that double feeds a rank, a rounding
    boundary, or a codebook that downstream results reproduce, the
    fold order must be pinned).

    PRECONDITION (r13 ADVICE): ``key_col`` must be UNIQUE within the
    group. array_sort over the (key, value) structs compares key first
    and falls back to the value field on ties — still deterministic,
    but the fold order silently becomes ascending (key, value) rather
    than the documented ascending-key order. Every current caller
    satisfies this by construction: ADC groups hold one row per
    subspace (key = sub), Lloyd's mean groups hold one row per sampled
    vector (key = vec_id).

    PRECONDITION (r14 ADVICE): ``val_col`` must be NON-NULL. This fold
    does NOT share F.sum/F.avg's null-skipping semantics: a null value
    survives collect_list (the enclosing struct is non-null) and
    ``acc + null`` poisons the whole group's sum — and `_ordered_mean`
    divides by F.count(val_col), which DOES skip nulls, so the two
    would disagree even if the sum were patched to skip. Every current
    caller is non-null by construction (ADC partials and Lloyd's
    coordinates are arithmetic over required columns); a caller with
    nullable values must filter them out first and decide explicitly
    what the mean's denominator should be.

    The collect_list buffer is bounded by the group size — callers
    only apply this to groups bounded by construction (m ≤ 8 subspace
    partials; ≤ train_cap sampled training rows per centroid
    dimension)."""
    return F.aggregate(
        F.transform(
            F.array_sort(F.collect_list(F.struct(key_col, val_col))),
            lambda s: s[val_col],
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _ordered_mean(key_col: str, val_col: str):
    """Layout-independent mean: `_ordered_sum / count`. F.avg(double)
    is a shuffle-arrival-order float fold — harmless where the mean is
    a tolerance-checked output, but Lloyd's TRAINING means decide
    centroids that every downstream assignment, code, and ADC score
    reproduces, so codebooks must be bit-identical across layouts
    (r13 verdict latent item #2). Same unique-key precondition as
    `_ordered_sum`."""
    return _ordered_sum(key_col, val_col) / F.count(val_col)


def _sq_dist(a, b):
    """Squared L2 distance via one zip_with fold."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _assign(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: crossJoin with the broadcast
    centroid table, argmin via min-of-struct (distance, cluster_id) —
    the struct tiebreak keeps equal-distance assignment deterministic."""
    scored = vectors.crossJoin(F.broadcast(centroids)).select(
        "vec_id",
        "emb",
        F.struct(_sq_dist(F.col("emb"), F.col("centroid")).alias("d"), F.col("cluster_id")).alias(
            "dc"
        ),
    )
    return (
        scored.groupBy("vec_id")
        .agg(F.min("dc").alias("best"), F.first("emb").alias("emb"))
        .select("vec_id", "emb", F.col("best.cluster_id").alias("cluster_id"))
    )


def kmeans_fit(
    spark: SparkSession,
    vectors: DataFrame,
    k: int = _K,
    max_iter: int = 5,
    train_cap: int = _TRAIN_CAP,
) -> DataFrame:
    """Lloyd's k-means; returns the centroid table (cluster_id,
    centroid array<double>). Init = the k lowest vec_ids of the
    training sample (seeded and deterministic; k-means|| would replace
    this at real scale). Training runs on `training_sample(vectors,
    train_cap)` so iteration cost is bounded by the cap, not the
    corpus; callers assign the full corpus once against the result."""
    # The bounded (≤ train_cap rows) training sample is persisted so
    # the init collect and each Lloyd iteration re-read cached batches
    # instead of re-running scan → cast → hash-residue sample per pass
    # (r15 optimization — the same discipline pq_train already applies
    # to its subvector table; 5 iterations re-scanned the corpus 6×
    # here). Values are unchanged: training_sample is deterministic.
    train = training_sample(vectors, train_cap).persist()
    # try/finally (r15 ADVICE): a failure in the init collect or any
    # Lloyd iteration must not leak the cached sample for the session
    # lifetime.
    try:
        init = (
            train.orderBy("vec_id")
            .limit(k)
            .collect()
        )
        centroids = spark.createDataFrame(
            [(i, list(r["emb"])) for i, r in enumerate(init)],
            "cluster_id INT, centroid ARRAY<DOUBLE>",
        )
        for _ in range(max_iter):
            assigned = _assign(train, centroids)
            # per-dimension means, long-form, then re-pack ordered arrays.
            # The mean is an _ordered_mean keyed by vec_id (unique within
            # each (cluster, pos) group, ≤ train_cap rows by construction):
            # F.avg would fold in shuffle-arrival order and the centroid
            # table is reproduced by every downstream assignment, so the
            # codebook must be bit-identical across layouts.
            new_rows = (
                assigned.select(
                    "cluster_id", "vec_id", F.posexplode("emb").alias("pos", "v")
                )
                .groupBy("cluster_id", "pos")
                .agg(_ordered_mean("vec_id", "v").alias("m"))
                .groupBy("cluster_id")
                .agg(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "m"))),
                        lambda s: s["m"],
                    ).alias("centroid")
                )
                .collect()  # k rows × dim doubles — bounded driver sync
            )
            centroids = spark.createDataFrame(
                [(r["cluster_id"], r["centroid"]) for r in new_rows],
                "cluster_id INT, centroid ARRAY<DOUBLE>",
            )
    finally:
        train.unpersist()
    return centroids


def ivf_build(spark: SparkSession, embeddings: DataFrame, k: int = _K) -> tuple[DataFrame, DataFrame]:
    """Build the IVF index: (assignments, centroids). Store the corpus
    partitioned by cluster_id so probes prune partitions."""
    vectors = embeddings.select("vec_id", as_double(F.col("embedding")).alias("emb"))
    centroids = kmeans_fit(spark, vectors, k=k)
    return _assign(vectors, centroids), centroids


def ivf_search(
    assigned: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    nprobe: int = _N_PROBE,
    top_k: int = _TOP_K,
) -> DataFrame:
    """Probe: per query, rank centroids by distance, keep `nprobe`,
    brute-force cosine only within those clusters."""
    q_probe = (
        queries.crossJoin(F.broadcast(centroids))
        .select(
            "query_id",
            "q_emb",
            "q_nrm",
            "cluster_id",
            _sq_dist(F.col("q_emb"), F.col("centroid")).alias("d"),
        )
        .withColumn(
            "probe_rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy("d", "cluster_id")
            ),
        )
        .filter(F.col("probe_rank") <= nprobe)
        .select("query_id", "q_emb", "q_nrm", "cluster_id")
    )
    corpus = assigned.withColumn("nrm", l2_norm(F.col("emb")))
    sim = dot(F.col("q_emb"), F.col("emb")) / (F.col("q_nrm") * F.col("nrm"))
    scored = (
        corpus.join(F.broadcast(q_probe), "cluster_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cos_sim", F.round(sim, 6))
        .select("query_id", "vec_id", "cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("query_id", "vec_id", "cos_sim", "rank")
    )


def ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-probed ANN top-k over `embeddings`: k-means index (k=16,
    5 Lloyd iterations) + 4-cluster probe per query."""
    e = load_table(spark, sf_dir, "embeddings")
    assigned, centroids = ivf_build(spark, e)
    queries = (
        assigned.filter(F.col("vec_id") < _N_QUERIES)
        .withColumn("q_nrm", l2_norm(F.col("emb")))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("emb").alias("q_emb"),
            "q_nrm",
        )
    )
    return ivf_search(assigned, centroids, queries)


def ivf_write_partitioned(assigned: DataFrame, path: str) -> None:
    """Persist the IVF-assigned corpus partitioned by cluster_id — the
    storage layout the probe path depends on at scale: each query
    reads only its nprobe cluster directories (PartitionFilters), so
    probe I/O is nprobe/k of the corpus regardless of corpus size."""
    assigned.write.mode("overwrite").partitionBy("cluster_id").parquet(path)


def ivf_pruned_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF probe against cluster-PARTITIONED storage (the claim in
    this module's docstring, demonstrated end to end): build the
    index, write the corpus partitioned by cluster_id, compute each
    query's probe set, and scan ONLY those partitions — the cluster_id
    IN (...) filter prunes at directory listing (PartitionFilters;
    pinned in tests). Results are identical to the in-memory probe
    (`similarity_ivf`) by construction: tests compare the two."""
    import hashlib
    import os
    import tempfile

    e = load_table(spark, sf_dir, "embeddings")
    assigned, centroids = ivf_build(spark, e)
    # deterministic per-corpus path: repeated runs overwrite the same
    # staging layout instead of accumulating one mkdtemp per call
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    path = os.path.join(tempfile.gettempdir(), f"etl_knlp_ivf_{tag}")
    ivf_write_partitioned(assigned, path)
    queries = (
        assigned.filter(F.col("vec_id") < _N_QUERIES)
        .withColumn("q_nrm", l2_norm(F.col("emb")))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("emb").alias("q_emb"),
            "q_nrm",
        )
    )
    stored = spark.read.parquet(path)
    return ivf_search(stored, centroids, queries)


# Contract thresholds: measured per-query recall@10 minima are 0.7
# (sf0.01) / 0.8 (sf0.1) for the 4-of-16-cluster probe; 0.5 leaves
# margin for driver testdata regeneration while still failing loudly
# if the index or probe machinery degrades.
_RECALL_FLOOR = 0.5


@query("similarity_ivf", oracle=_sim.ann_contract_oracle())
def similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assertion contract over `ivf_topk` (upgraded from rows-only in
    round 5, the `udaf_geomean` pattern): hash-verified exact-side
    columns (n_exact, kth_exact_sim from the brute force, mirrored by
    the DuckDB oracle) plus booleans the oracle pins TRUE —
    per-query recall@10 ≥ 0.5 vs the exact top-k, every emitted
    cosine recomputed-equal from the corpus, and k respected. The
    seeded k-means build itself stays non-SQL-expressible; this turns
    its OUTPUT into something the driver can hash-verify anyway."""
    return _sim.ann_recall_contract(
        spark, sf_dir, ivf_topk(spark, sf_dir), recall_threshold=_RECALL_FLOOR
    )


@query("similarity_ivf_pruned", oracle=_sim.ann_contract_oracle())
def similarity_ivf_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assertion contract over `ivf_pruned_topk` — same contract as
    `similarity_ivf` but driving the cluster-partitioned storage
    probe, so the driver's hash gate also covers the PartitionFilters
    path (plan shape pinned in test_ivf; result identity with the
    in-memory probe pinned there too)."""
    return _sim.ann_recall_contract(
        spark, sf_dir, ivf_pruned_topk(spark, sf_dir), recall_threshold=_RECALL_FLOOR
    )

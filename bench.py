"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query materializes fully through the noop sink (no driver
collect, no display truncation) — the measured cost is the whole
distributed plan. A warmup run of the flagship amortizes JVM/codegen
startup out of the per-query numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_knlp_spark import registry  # noqa: E402
from etl_knlp_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: the flagship plan, the heaviest relational shapes, and
# every LLM-pipeline operator family (dedup, similarity, text, window).
HEADLINE = [
    "q1_dimension_build",
    "groupby_agg",
    "join_left_equi",
    "join_asof",
    "window_frame_sum",
    "date_extract",
    "json_extract",
    "text_stats",
    "token_count",
    "fingerprint",
    "quality_score",
    "dedup_exact",
    "dedup_minhash",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_embedding",
    "similarity_topk",
    "similarity_ann_lsh",
    "stream_tumbling_window",
    "stream_session_window",
    "ngram_freq",
    "embedding_centroid",
    "pii_scrub",
    "stats_agg",
    "pivot_agg",
    "join_skew_salted",
    "q3_shipping_priority",
    "q5_nation_volume",
    "q10_returned_items",
    # round-5 session-3 flagship additions (~3s total at sf0.1): the
    # linear-cost edit dedup, cross-label ANN mining, and the hybrid
    # lexical+semantic fusion — benched so the new families have a
    # recorded per-round number like every other family.
    "dedup_edit_star",
    "mine_hard_negatives",
    "hybrid_retrieval_rrf",
]


def materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def _probe_overrides():
    """The ANN + hashed-dedup registry entries became assertion-
    contract queries in round 5 (production path + an exact verifier
    + contract fold). The bench measures the PRODUCTION path under
    its registry name — benchmarking the verifier would mostly time
    the brute-force/inverted-index baseline it verifies against.
    Correctness still gates on the contracts via the registry."""
    from etl_knlp_spark.operators.dedup import minhash_pairs, simhash_sigs
    from etl_knlp_spark.operators.similarity import ann_lsh_topk

    return {
        "similarity_ann_lsh": ann_lsh_topk,
        "dedup_minhash": minhash_pairs,
        "dedup_simhash": simhash_sigs,
    }


def main() -> None:
    spark = get_spark(app_name="etl_knlp_bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.all_queries()

    materialize(queries["q1_dimension_build"](spark, SF_DIR))  # warmup

    # Load-robust timing (round-5 rework after a same-code control
    # experiment showed ±25% ambient-host drift, and round 4 recorded
    # a near-uniform ~1.5x multiplier across 26/29 queries):
    #   - repetitions are INTERLEAVED round-robin across queries, so a
    #     multi-second host-load spike degrades one rep of many
    #     queries (min() discards it) instead of all reps of whichever
    #     query it landed on;
    #   - min-of-3 for every query, widened to min-of-5 for queries
    #     whose best is still sub-1s after 3 passes — the cohort where
    #     ±0.3s of scheduler noise is a 50% error and extra reps are
    #     nearly free.
    overrides = _probe_overrides()

    def run_once(name: str) -> float:
        fn = overrides.get(name, queries[name])
        t0 = time.perf_counter()
        materialize(fn(spark, SF_DIR))
        return time.perf_counter() - t0

    best: dict[str, float] = {n: float("inf") for n in HEADLINE}
    for _ in range(3):
        for name in HEADLINE:
            best[name] = min(best[name], run_once(name))
    fast = [n for n in HEADLINE if best[n] < 1.0]
    for _ in range(2):
        for name in fast:
            best[name] = min(best[name], run_once(name))
    timings = {name: round(best[name], 3) for name in HEADLINE}

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_time",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()

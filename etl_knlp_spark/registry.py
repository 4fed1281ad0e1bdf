"""Query/oracle registry backing ``__spark_entry__.py``.

Every engine operator demo registers here via the ``@query`` decorator:
a name, a (spark, sf_dir) -> DataFrame callable, and (when expressible)
the equivalent ANSI SQL that DuckDB runs on the same parquet tables.
The driver hash-compares the two at sf0.01 (CORRECTNESS contract in
__spark_entry__.py). Conventions:

- Alias every computed column identically in both the DataFrame code
  and the oracle SQL (the comparator matches columns by name).
- Round floating aggregates to a fixed scale on BOTH sides — double
  summation order differs across engines/partitions.
- Cast event timestamps explicitly (parquet ns vs ms, SURVEY.md §7).
- Queries whose semantics DuckDB cannot express register with
  ``oracle=None`` → the driver records a weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class RegisteredQuery:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str


_REGISTRY: dict[str, RegisteredQuery] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name`` with an optional DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = RegisteredQuery(name, fn, oracle, fn.__doc__ or "")
        return fn

    return deco


# The driver's per-round correctness sweep has a finite budget (round 1
# recorded rows for exactly the flagship + the first 49 registry entries).
# Order the registry so queries without a prior-round CORRECTNESS row come
# first; across rounds every query then accumulates driver-side evidence.
def _previously_evidenced() -> set[str]:
    """Names present in any prior-round CORRECTNESS_r*.json at the repo root."""
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seen: set[str] = set()
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        try:
            with open(path) as f:
                seen.update(json.load(f))
        except (OSError, ValueError):
            continue
    return seen


# Queries first registered in round 2 — they queue for driver evidence
# BEHIND the round-1 queries the round-1 verdict flagged as unevidenced,
# so the known gap closes before new surface starts consuming the budget.
_ADDED_ROUND_2 = frozenset(
    {
        "tfidf_topterms", "repetition_filter", "sample_stratified",
        "decontaminate_ngram", "csv_roundtrip", "orc_roundtrip",
        "lateral_join", "udtf_chunk_text", "regr_agg",
    }
)


def _sweep_order() -> list[str]:
    seen = _previously_evidenced()
    # sorted() is stable: within each group, registration order is kept.
    # Groups: 0 = unevidenced round-1 queries, 1 = unevidenced newer
    # queries, 2 = queries that already have a driver CORRECTNESS row.
    def rank(n: str) -> int:
        if n in seen:
            return 2
        return 1 if n in _ADDED_ROUND_2 else 0

    return sorted(_REGISTRY, key=rank)


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return {n: _REGISTRY[n].fn for n in _sweep_order()}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {
        n: _REGISTRY[n].oracle
        for n in _sweep_order()
        if _REGISTRY[n].oracle is not None
    }


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    # Imports are for their registration side effects.
    from .operators import (  # noqa: F401
        analysis,
        dedup,
        events,
        graph,
        ivf,
        multimodal,
        mutate,
        parse,
        quality,
        relational,
        sampling,
        similarity,
        stats,
        text,
    )
    from .functions import scalar, skew, sql_surface  # noqa: F401
    from .plans import dimension, tpch  # noqa: F401
    from .streaming import windows  # noqa: F401

    _LOADED = True

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


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return {n: r.fn for n, r in _REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {n: r.oracle for n, r in _REGISTRY.items() if r.oracle is not None}


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

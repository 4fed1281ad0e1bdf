"""The correctness gate's own comparator (r15 review, round-16
candidate #2a taken early): a bug in tools/verify_oracles.canon
silently greens both sides, so its semantics are pinned here. The
headline fix: the old object-column rule `str(sorted(v))` SORTED list
values before hashing — a wrong-ORDER array result (tokenize-style
outputs are order-semantic) would have passed the gate. No registered
query returns a container column today (verified over all 300 oracles
at sf0.001), so the tightening changes no current hash; these tests
keep the comparator strict for any future one."""

from __future__ import annotations

import importlib.util
import os
import sys

import numpy as np
import pandas as pd


def _tool():
    tools = os.path.join(os.path.dirname(__file__), "..", "tools")
    if tools not in sys.path:
        sys.path.insert(0, tools)
    spec = importlib.util.spec_from_file_location(
        "verify_oracles", os.path.join(tools, "verify_oracles.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_list_order_is_semantic():
    """Two frames whose list cells hold the SAME elements in DIFFERENT
    order must hash differently — the old sorted() canon matched them
    (the gate could not see a reversed tokenizer)."""
    t = _tool()
    a = pd.DataFrame({"toks": [["a", "b", "c"]]})
    b = pd.DataFrame({"toks": [["c", "b", "a"]]})
    assert t.value_hash(a) != t.value_hash(b)
    assert t.value_hash(a) == t.value_hash(a.copy())


def test_ndarray_and_list_spellings_hash_equal():
    """DuckDB's .df() yields ndarrays where Spark's toPandas yields
    python lists — equal contents must hash equal, else every future
    array-returning query is spuriously red."""
    t = _tool()
    a = pd.DataFrame({"v": [[1, 2, 3]]})
    b = pd.DataFrame({"v": [np.array([1, 2, 3])]})
    assert t.value_hash(a) == t.value_hash(b)


def test_sets_stay_order_insensitive():
    t = _tool()
    a = pd.DataFrame({"s": [{"x", "y", "z"}]})
    b = pd.DataFrame({"s": [{"z", "x", "y"}]})
    assert t.value_hash(a) == t.value_hash(b)


def test_floats_inside_containers_round_like_scalars():
    """A last-ulp float difference inside a list must be absorbed by
    the same 9dp canonicalization scalar float columns get."""
    t = _tool()
    a = pd.DataFrame({"v": [[0.1 + 0.2]]})
    b = pd.DataFrame({"v": [[0.3]]})
    assert t.value_hash(a) == t.value_hash(b)
    c = pd.DataFrame({"v": [[0.3000001]]})  # above 9dp: a real diff
    assert t.value_hash(a) != t.value_hash(c)


def test_row_and_column_order_insensitive_scalars():
    """The documented gate semantics: column order and row order never
    matter; values do."""
    t = _tool()
    a = pd.DataFrame({"x": [1, 2], "y": ["p", "q"]})
    b = pd.DataFrame({"y": ["q", "p"], "x": [2, 1]})
    assert t.value_hash(a) == t.value_hash(b)
    c = pd.DataFrame({"x": [1, 2], "y": ["q", "p"]})  # re-paired rows
    assert t.value_hash(a) != t.value_hash(c)


def test_no_registered_query_returns_container_columns():
    """The vacuity fact the canon tightening rests on, kept TRUE
    loudly: if a future query returns a list/struct column, this test
    names it — decide its order semantics explicitly (array_sort both
    engines, or document order-significance) rather than inheriting
    whatever the comparator happens to do."""
    import duckdb

    from etl_knlp_spark import registry
    from etl_knlp_spark.catalog import TABLES, table_path

    registry._load_all()
    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    for tbl in TABLES:
        con.sql(
            f"CREATE VIEW {tbl} AS SELECT * FROM '{table_path(sf, tbl)}'"
        )
    offenders = []
    for name, sql in sorted(registry.all_oracles().items()):
        try:
            df = con.sql(sql).df().head(20)
        except Exception:
            continue  # oracle health is the sweep's job, not this test's
        for c in df.columns:
            if df[c].dtype == object and df[c].map(
                lambda v: isinstance(v, (list, tuple, set, dict))
                or type(v).__name__ == "ndarray"
            ).any():
                offenders.append(f"{name}.{c}")
    assert not offenders, (
        f"container-typed result columns appeared: {offenders} — pin "
        "their order semantics (array_sort both engines or document "
        "order-significance) in the same commit"
    )

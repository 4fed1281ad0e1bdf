"""The r15 oracle-side determinism probe must BITE (r14 verdict #3):
DuckDB executes multi-threaded, and its parallel aggregation folds
float sums in morsel-arrival order — measured on this host: a 10M-row
double SUM under threads=32 gave 26 distinct bit patterns over 40
runs and threads=1 landed outside the whole set (BASELINE.md r15).
These tests pin that tools/oracle_determinism_probe.py actually
detects that class: a run-to-run-unstable oracle is FLAGGED, a
deterministic one passes, and the threads=1 cross-check is live. No
SparkSession needed — the probe is pure DuckDB + the gate's canon."""

from __future__ import annotations

import importlib.util
import os
import sys


def _tool():
    tools = os.path.join(os.path.dirname(__file__), "..", "tools")
    if tools not in sys.path:
        sys.path.insert(0, tools)  # probe imports verify_oracles.value_hash
    spec = importlib.util.spec_from_file_location(
        "oracle_determinism_probe",
        os.path.join(tools, "oracle_determinism_probe.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


SF = "/root/testdata/sf0.001"


def test_probe_passes_deterministic_and_flags_nondeterministic():
    """A stable oracle reports one hash with threads=1 in the set; an
    oracle whose value genuinely varies run to run (random()) reports
    multiple hashes. setseed() is per-connection and the probe opens a
    fresh connection per run, so random() is the honest stand-in for
    any run-order-dependent value — including DuckDB's own parallel
    float folds at morsel scale, which these gate-scale single-row-
    group tables cannot reach (the structural reason the live sweep
    is clean, BASELINE.md r15)."""
    tool = _tool()
    results = tool.probe(
        SF,
        runs=4,
        only=set(),
        oracles={
            "det": "SELECT r_regionkey, r_name FROM region",
            "nondet": "SELECT round(random() * 1e15) AS x",
        },
    )
    assert results["det"]["distinct_hashes"] == 1
    assert results["det"]["serial_agrees"] is True
    assert results["nondet"]["distinct_hashes"] > 1, (
        "the probe failed to flag a run-to-run-varying oracle — it "
        "cannot be trusted to catch the DuckDB parallel-fold class"
    )


def test_probe_main_exit_code_contract():
    """probe() feeds main()'s exit code: any unstable oracle must make
    the flaky list non-empty under the same predicate main() uses."""
    tool = _tool()
    results = tool.probe(
        SF,
        runs=3,
        only=set(),
        oracles={"nondet": "SELECT round(random() * 1e15) AS x"},
    )
    r = results["nondet"]
    assert (
        r.get("err")
        or r.get("distinct_hashes", 1) != 1
        or not r.get("serial_agrees", True)
    )

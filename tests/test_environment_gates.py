"""Version-gated environment asserts (r13 verdict #8): the suite's
env-conditional skips are correct when a capability is genuinely
absent, but an environment FLIP must turn them into loud failures,
not wider silence. Each gate here states the expectation the skips
assume, derived from the installed pyspark version — if a Spark
upgrade/downgrade or a package appearing breaks the assumption, this
file fails instead of coverage silently evaporating."""

from __future__ import annotations

import pyspark

_MAJOR = int(pyspark.__version__.split(".")[0])


def test_spark4_implies_python_datasource_api():
    """tests/test_datasource.py skips its whole module when
    DATASOURCE_AVAILABLE is False. That is legitimate only on
    Spark < 4 — on Spark 4+ the Python DataSource API is part of
    pyspark, so DATASOURCE_AVAILABLE=False there would mean the import
    probe broke and an entire module's coverage silently vanished."""
    from etl_knlp_spark.sources.datasource import DATASOURCE_AVAILABLE

    if _MAJOR >= 4:
        assert DATASOURCE_AVAILABLE, (
            "Spark %s has the Python DataSource API but the probe says "
            "unavailable — test_datasource.py is silently skipping"
            % pyspark.__version__
        )


def test_spark4_implies_tws_api_symbols():
    """The transformWithStateInPandas processor contract classes ship
    with pyspark 4 — the streaming.stateful module's try-import
    fallback may only engage on Spark < 4. (Whether the RUNNER can
    start is a separate, protobuf-dependent question covered by
    test_stateful.py's loud-flip assert.)"""
    if _MAJOR >= 4:
        from pyspark.sql.streaming.stateful_processor import (  # noqa: F401
            StatefulProcessor,
            StatefulProcessorHandle,
        )

        from etl_knlp_spark.streaming import stateful

        assert stateful.StatefulProcessor is StatefulProcessor, (
            "pyspark 4 ships StatefulProcessor but streaming/stateful.py "
            "bound its fallback shim — the typed contract is silently "
            "untested"
        )


def test_tws_available_tracks_protobuf_exactly():
    """tws_available() must mirror the actual protobuf importability —
    it is the router the production path branches on, so a drifted
    probe silently routes every TWS query through the fallback."""
    from etl_knlp_spark.streaming.stateful import tws_available

    try:
        import google.protobuf  # noqa: F401

        assert tws_available()
    except ImportError:
        assert not tws_available()


def test_duckdb_oracle_determinism_epoch_is_verified():
    """r15 (r14 verdict #3/#6): the oracle-side determinism evidence —
    all 300 oracles stable over 5 runs at sf0.01 plus a threads=1
    cross-check, the 28-query float-fold shortlist likewise at sf0.1
    (BASELINE.md r15) — was measured ON duckdb 1.0.0. DuckDB's
    parallel float folds are measurably run-order-dependent above
    morsel scale (26 distinct SUM bit patterns in 40 runs at 10M
    rows), and list_*/sort semantics can move between releases, so a
    version flip INVALIDATES that evidence rather than inheriting it.
    The version-flip drill itself is impossible in this container (no
    network: `pip download duckdb==1.1.3` fails at DNS — receipt in
    BASELINE.md r15), which is exactly why the flip must be loud: if
    this assert fires, re-run tools/oracle_determinism_probe.py (full
    registry at sf0.01, shortlist at sf0.1) and move this pin in the
    same commit."""
    import duckdb

    assert duckdb.__version__ == "1.0.0", (
        f"duckdb moved to {duckdb.__version__}: the r15 oracle-side "
        "determinism sweep no longer describes this environment — "
        "re-run tools/oracle_determinism_probe.py and update this pin "
        "with the new measurement"
    )

"""Unit coverage for the r11-review stats rewrites (r11 ADVICE: the
minmax_by arg-max repacking landed with no test exercising the new
path). The fixture is ADVERSARIAL to the old hard-coded 10^7 packing:
keys near/above 10^7 plus a within-nation balance tie plus negative
balances — the three regimes the data-derived DECIMAL(38,0) packing
must order correctly — and the DuckDB oracle is replayed on the same
fixture so the cross-engine contract itself is exercised, not just the
Spark side (the hash gate can't see a MIRRORED packing bug; this can,
because the expected winners are hand-computed)."""

from __future__ import annotations

import pandas as pd

from etl_knlp_spark.operators.stats import minmax_by


def _fixture(tmp_path) -> str:
    """customer.parquet where the OLD packing (cents * 10^7 + custkey,
    BIGINT) picks the WRONG customer for nation 0:

      A: custkey=1,          acctbal=1.01 → old 101*10^7 + 1        = 1_010_000_001
      B: custkey=15_000_000, acctbal=1.00 → old 100*10^7 + 15*10^6  = 1_015_000_000

    old arg_max → B (poorer!); correct → A. The new packing multiplies
    by K = MAX(custkey)+1 = 15_000_001 > any key difference, so
    (101-100)*K + (1 - 15_000_000) > 0 and A wins."""
    customers = pd.DataFrame(
        {
            "c_custkey": [1, 15_000_000, 42, 7, 3, 9_999_999],
            "c_nationkey": [0, 0, 1, 1, 2, 2],
            "c_acctbal": [1.01, 1.00, 500.00, 500.00, -10.00, -9.99],
        }
    )
    customers.to_parquet(tmp_path / "customer.parquet", index=False)
    return str(tmp_path)


# hand-computed truth per nation: (richest, poorest, max_bal)
_EXPECTED = {
    0: (1, 15_000_000, 1.01),  # breaks the old 10^7 packing
    1: (42, 7, 500.00),  # exact tie → composite key breaks by custkey
    2: (9_999_999, 3, -9.99),  # negative balances still order correctly
}


def test_minmax_by_packing_survives_huge_keys_ties_and_negatives(
    spark, tmp_path
):
    sf_dir = _fixture(tmp_path)
    rows = {
        r["c_nationkey"]: (r["richest_cust"], r["poorest_cust"], r["max_bal"])
        for r in minmax_by(spark, sf_dir).collect()
    }
    assert rows == _EXPECTED


def test_minmax_by_oracle_agrees_on_the_adversarial_fixture(tmp_path):
    """Replay the registered DuckDB oracle on the same fixture: the r11
    bug was MIRRORED (both engines encoded the same wrong packing, so
    the driver hash stayed green) — pinning the oracle against
    hand-computed winners is the check the hash gate cannot do."""
    import duckdb

    from etl_knlp_spark import registry

    registry._load_all()
    sf_dir = _fixture(tmp_path)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW customer AS "
        f"SELECT * FROM read_parquet('{sf_dir}/customer.parquet')"
    )
    out = con.execute(registry._REGISTRY["minmax_by"].oracle).fetchdf()
    rows = {
        int(r.c_nationkey): (
            int(r.richest_cust),
            int(r.poorest_cust),
            float(r.max_bal),
        )
        for r in out.itertuples()
    }
    assert rows == _EXPECTED

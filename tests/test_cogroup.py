"""Cogrouped-map pandas operator: per-key two-input kernel semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_knlp_spark.operators.cogroup import cogroup_enrich


def test_cogroup_left_semantics_and_totals(spark):
    events = spark.createDataFrame(
        [(1, 10.0), (1, 2.5), (2, 7.0), (99, 1.0)],
        "user_id long, value double",
    )
    cust = spark.createDataFrame(
        [(1, 100.0), (2, 200.0), (3, 300.0)],
        "c_custkey long, c_acctbal double",
    )
    out = {r["user_id"]: r for r in cogroup_enrich(events, cust).collect()}
    # users with events keep left-join semantics
    assert out[1]["n_events"] == 2 and out[1]["total_value"] == 12.5
    assert out[1]["acctbal"] == 100.0
    assert out[2]["n_events"] == 1 and out[2]["acctbal"] == 200.0
    # user 99 has no customer row → NULL balance, row still emitted
    assert out[99]["acctbal"] is None
    # customer 3 has no events → no output row (kernel skips empty left)
    assert 3 not in out


def test_cogroup_matches_relational_join(spark, sf_dir):
    from etl_knlp_spark.catalog import load_table

    events = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    got = cogroup_enrich(events, cust)
    want = (
        events.join(cust, events.user_id == cust.c_custkey, "left")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
            F.max("c_acctbal").alias("acctbal"),
        )
    )
    g = {r["user_id"]: r for r in got.collect()}
    w = {r["user_id"]: r for r in want.collect()}
    assert set(g) == set(w)
    for uid in w:
        assert g[uid]["n_events"] == w[uid]["n_events"]
        assert g[uid]["acctbal"] == w[uid]["acctbal"]
        # float sums: pandas kernel vs shuffled Spark sum — ULP tolerance
        assert abs(g[uid]["total_value"] - w[uid]["total_value"]) < 1e-9

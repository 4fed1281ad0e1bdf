"""MERGE/upsert and SCD2 emulation semantics."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from etl_knlp_spark.operators.mutate import merge_into, scd2_apply


def test_merge_into_updates_and_inserts(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["k", "name", "v"]
    )
    source = spark.createDataFrame([(2, "b2", 99.0), (4, "d", 40.0)], ["k", "name", "v"])
    out = {r["k"]: (r["name"], r["v"]) for r in merge_into(target, source, "k").collect()}
    assert out == {1: ("a", 10.0), 2: ("b2", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_scd2_closes_and_appends_versions(spark):
    t0 = datetime.datetime(2024, 1, 1)
    t1 = datetime.datetime(2024, 6, 1)
    current = spark.createDataFrame(
        [(1, "v1", t0, None), (2, "w1", t0, None), (3, "x0", t0, t1), (3, "x1", t1, None)],
        "k INT, val STRING, valid_from TIMESTAMP, valid_to TIMESTAMP",
    )
    t2 = datetime.datetime(2025, 1, 1)
    changes = spark.createDataFrame(
        [(1, "v2", t2)], "k INT, val STRING, valid_from TIMESTAMP"
    ).withColumn("valid_to", F.lit(None).cast("timestamp"))

    out = scd2_apply(current, changes, "k")
    rows = {(r["k"], r["val"]): (r["valid_from"], r["valid_to"]) for r in out.collect()}
    assert len(rows) == 5
    assert rows[(1, "v1")] == (t0, t2)        # closed out at change time
    assert rows[(1, "v2")] == (t2, None)      # new open version
    assert rows[(2, "w1")] == (t0, None)      # untouched key stays open
    assert rows[(3, "x0")] == (t0, t1)        # historical rows preserved
    assert rows[(3, "x1")] == (t1, None)


def test_scd2_chains_multiple_changes_per_key(spark):
    """Two changes for one key in a single batch: versions chain by
    valid_from (no duplicate closed rows, no overlapping ranges)."""
    t0 = datetime.datetime(2024, 1, 1)
    current = spark.createDataFrame(
        [(1, "v1", t0, None)],
        "k INT, val STRING, valid_from TIMESTAMP, valid_to TIMESTAMP",
    )
    t2 = datetime.datetime(2025, 1, 1)
    t3 = datetime.datetime(2025, 6, 1)
    changes = spark.createDataFrame(
        [(1, "v2", t2), (1, "v3", t3)], "k INT, val STRING, valid_from TIMESTAMP"
    ).withColumn("valid_to", F.lit(None).cast("timestamp"))

    out = scd2_apply(current, changes, "k")
    rows = {(r["k"], r["val"]): (r["valid_from"], r["valid_to"]) for r in out.collect()}
    assert len(rows) == 3
    assert rows[(1, "v1")] == (t0, t2)   # closed ONCE, at the earliest change
    assert rows[(1, "v2")] == (t2, t3)   # intra-batch version closed by the next
    assert rows[(1, "v3")] == (t3, None)  # latest stays open


def test_apply_aggregate_delta_handles_new_and_absent_keys(spark):
    from pyspark.sql import functions as F

    from etl_knlp_spark.operators.mutate import apply_aggregate_delta

    mat = spark.createDataFrame(
        [("a", 10, 100.0), ("b", 5, 50.0)], "k STRING, n LONG, s DOUBLE"
    )
    delta = spark.createDataFrame(
        [("b", 2, 7.0), ("c", 1, 1.5)], "k STRING, n LONG, s DOUBLE"
    )
    got = {
        r["k"]: (r["n"], r["s"])
        for r in apply_aggregate_delta(mat, delta, ["k"]).collect()
    }
    # untouched key passes through, overlapping key sums, new key appears
    assert got == {"a": (10, 100.0), "b": (7, 57.0), "c": (1, 1.5)}


def test_changefeed_then_apply_roundtrips(spark):
    """derive_changefeed and the CDC apply are inverses: applying the
    derived feed to the old snapshot reconstructs the new one."""
    from pyspark.sql import functions as F

    from etl_knlp_spark.operators.mutate import derive_changefeed, merge_into

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "k long, v string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (5, "e")], "k long, v string"  # 2 updated, 3/4 deleted, 5 inserted
    )
    feed = derive_changefeed(old, new, "k", ["v"]).collect()
    ops = {r["k"]: r["op"] for r in feed}
    assert ops == {2: "U", 3: "D", 4: "D", 5: "I"}
    # apply: upsert I/U rows (joined back to new for values), drop D keys
    upserts = new.join(
        spark.createDataFrame([(k,) for k, o in ops.items() if o in "IU"], "k long"),
        "k",
    )
    deletes = [k for k, o in ops.items() if o == "D"]
    rebuilt = merge_into(old, upserts, "k").filter(~F.col("k").isin(deletes))
    assert sorted(map(tuple, rebuilt.collect())) == sorted(map(tuple, new.collect()))


def test_pit_join_resolves_the_version_valid_at_order_date(spark, sf_dir):
    """Temporal correctness: an odd customer's pre-1997 orders must
    get the original segment, post-1997 orders the '+' version; even
    customers never change. And the validity window must ride an
    EQUI-join on the key (no inequality-join blow-up)."""
    from pyspark.sql import functions as F

    from etl_knlp_spark.catalog import load_table
    from etl_knlp_spark.operators.mutate import scd2_point_in_time

    out = scd2_point_in_time(spark, sf_dir)
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = (
        out.join(o, "o_orderkey")
        .join(c, out.o_custkey == c.c_custkey)
        .select("o_custkey", "o_orderdate", "segment_at_order", "c_mktsegment")
        .collect()
    )
    assert len(j) > 0
    import datetime

    cut = datetime.date(1997, 1, 1)
    saw_pre = saw_post = False
    for r in j:
        odd = r["o_custkey"] % 2 == 1
        od = r["o_orderdate"]
        od = od.date() if isinstance(od, datetime.datetime) else od
        if odd and od >= cut:
            assert r["segment_at_order"] == r["c_mktsegment"] + "+"
            saw_post = True
        else:
            assert r["segment_at_order"] == r["c_mktsegment"]
            saw_pre = saw_pre or odd
    assert saw_pre and saw_post  # both eras actually exercised
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan  # key equi-join, range as filter

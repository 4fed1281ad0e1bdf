"""Salted-join equivalence on skewed data + SQL-surface entry point."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_knlp_spark.functions.skew import salted_join
from etl_knlp_spark.functions.sql_surface import run_sql


def test_salted_join_equals_plain_join_on_skewed_keys(spark):
    # 90% of left rows share one hot key — the salting target case
    left = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.range(0, 20).select(
        F.col("id").alias("rk"), (F.col("id") * 100).alias("rv")
    )
    plain = left.join(right, left.k == right.rk, "inner").select("k", "payload", "rv")
    salted = salted_join(left, right, "k", "rk", buckets=8).select("k", "payload", "rv")
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_join_left_outer(spark):
    left = spark.range(100).select(F.col("id").alias("k"))
    right = spark.range(50).select(F.col("id").alias("rk"), F.lit("x").alias("v"))
    out = salted_join(left, right, "k", "rk", buckets=4, how="left")
    assert out.count() == 100
    assert out.filter(F.col("v").isNull()).count() == 50


def test_run_sql_over_views(spark, sf_dir):
    n = run_sql(spark, sf_dir, "SELECT COUNT(*) AS n FROM lineitem").first()["n"]
    assert n > 0


def test_recursive_cte_spine_is_gap_free(spark, sf_dir):
    """The recursive month spine is contiguous: every month between
    min and max appears exactly once, months with no orders included
    (count 0) — the densification a plain GROUP BY cannot produce."""
    from etl_knlp_spark.functions.sql_surface import recursive_cte

    rows = recursive_cte(spark, sf_dir).collect()
    months = sorted(r["month_start"] for r in rows)
    assert len(months) == len(set(months))  # exactly once
    for a, b in zip(months, months[1:]):
        nxt = (a.year, a.month % 12 + 1) if a.month < 12 else (a.year + 1, 1)
        assert (b.year, b.month) == nxt  # no gaps
    assert all(r["n_orders"] >= 0 for r in rows)
    assert sum(r["n_orders"] for r in rows) > 0


def test_sql_scripting_runs_and_restores_conf(spark, sf_dir):
    from etl_knlp_spark.functions.sql_surface import sql_scripting

    rows = {r["iter"]: r for r in sql_scripting(spark, sf_dir).collect()}
    assert sorted(rows) == [0, 1, 2, 3]
    # each peel strictly shrinks the set and raises the mean
    for k in range(1, 4):
        assert rows[k]["n_above"] < rows[k - 1]["n_above"]
        assert rows[k]["mean_price"] > rows[k - 1]["mean_price"]
    # conf scoped: the session-wide flag is back to its default
    assert spark.conf.get("spark.sql.scripting.enabled", None) in (None, "false")


def test_pipe_syntax_plans_like_classic_sql(spark, sf_dir):
    """The |> chain must produce the same result set AND the same
    optimized plan class as the classic spelling — it's parser
    surface, not a different engine path."""
    from etl_knlp_spark.functions.sql_surface import (
        _PIPE_ORACLE,
        run_sql,
        sql_pipe_syntax,
    )

    piped = sorted(map(tuple, sql_pipe_syntax(spark, sf_dir).collect()))
    classic = sorted(map(tuple, run_sql(spark, sf_dir, _PIPE_ORACLE).collect()))
    assert piped == classic and len(piped) > 0
    plan = sql_pipe_syntax(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan  # aggregated, not row-by-row


def test_collated_group_merges_case_variants(spark, sf_dir):
    """UTF8_LCASE grouping must collapse the upper/lower variants the
    query deliberately manufactures: exactly one output row per
    case-insensitive key, counts equal to the case-blind counts."""
    from pyspark.sql import functions as F

    from etl_knlp_spark.catalog import load_table
    from etl_knlp_spark.functions.sql_surface import collated_group

    got = {r["etype_ci"]: r["n_events"] for r in collated_group(spark, sf_dir).collect()}
    want = {
        r["k"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy(F.lower("event_type").alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_parameterized_sql_binds_typed_literals(spark, sf_dir):
    """Parameter binding must behave exactly like hand-written
    literals: same results at a second parameter setting, and the
    bound value must appear in the optimized plan as a literal
    predicate (constant-folded, pushdown-eligible) — not a runtime
    lookup."""
    from etl_knlp_spark.catalog import register_views

    register_views(spark, sf_dir)
    a = spark.sql(
        "SELECT COUNT(*) AS n FROM documents WHERE n_chars >= :t",
        args={"t": 200},
    ).collect()[0]["n"]
    b = spark.sql("SELECT COUNT(*) AS n FROM documents WHERE n_chars >= 200").collect()[
        0
    ]["n"]
    assert a == b
    plan = (
        spark.sql(
            "SELECT * FROM documents WHERE n_chars >= :t", args={"t": 200}
        )
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "200" in plan  # bound as a literal, visible to pushdown


def test_try_family_quarantines_bad_rows_not_tasks(spark):
    """Under ANSI mode the plain operators throw on the poisoned rows;
    the try_ forms return NULL for exactly those rows and real values
    everywhere else."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(10, 2), (7, 0), (2147483647, 1)], "a INT, b INT"
    )
    out = {
        (r["a"], r["b"]): (r["d"], r["s"])
        for r in df.select(
            "a",
            "b",
            F.try_divide("a", "b").alias("d"),
            F.try_add("a", "b").alias("s"),
        ).collect()
    }
    assert out[(10, 2)] == (5.0, 12)
    assert out[(7, 0)][0] is None          # div-by-zero → NULL, not error
    assert out[(2147483647, 1)][1] is None  # int overflow → NULL, not error
    if spark.conf.get("spark.sql.ansi.enabled") == "true":
        with _pytest.raises(Exception):
            df.select((F.col("a") / F.col("b")).alias("x")).collect()


def test_xml_roundtrip_preserves_special_chars(spark):
    """to_xml → from_xml must be lossless for text containing the
    XML-significant characters (&, <, >, quotes) — escaping bugs are
    the way XML interchange silently corrupts a corpus."""
    from pyspark.sql import functions as F

    nasty = 'a & b < c > "d" \'e\' && <tag> — ☃'
    df = spark.createDataFrame([(1, nasty)], "id LONG, text STRING")
    xml = F.to_xml(F.struct("id", "text"), {"rowTag": "r"})
    back = F.from_xml(xml, "id LONG, text STRING", {"rowTag": "r"})
    r = df.select(back.alias("p")).select("p.id", "p.text").collect()[0]
    assert r["id"] == 1 and r["text"] == nasty


def test_soundex_convention_pin(spark):
    """Spark's soundex convention, pinned on adversarial strings: the
    first letter's code seeds the duplicate-run state, H/W are
    transparent, non-alpha resets, vowels break. A from-scratch Python
    mirror must agree everywhere the DuckDB oracle's recursive walk
    does (same convention, third construction)."""
    import random

    from pyspark.sql import Row
    from pyspark.sql import functions as F

    codes = {**{c: "1" for c in "BFPV"}, **{c: "2" for c in "CGJKQSXZ"},
             **{c: "3" for c in "DT"}, "L": "4", "M": "5", "N": "5", "R": "6"}

    def mirror(s):
        S = s.upper()
        if not S or not ("A" <= S[0] <= "Z"):
            return S  # soundex passes non-alpha-leading input through
        out, last = S[0], codes.get(S[0], "")
        for ch in S[1:]:
            if not ("A" <= ch <= "Z"):
                last = ""
                continue
            if ch in "HW":
                continue
            c = codes.get(ch, "")
            if c and c != last and len(out) < 4:
                out += c
            last = c
        return (out + "000")[:4]

    rng = random.Random(77)
    cases = ["Robert", "Ashcraft", "Tymczak", "Honeyman", "o brien", "wu"]
    cases += ["".join(rng.choice("abcdefghijklmnopqrstuvwxyz' hw")
                      for _ in range(rng.randint(1, 14))) for _ in range(400)]
    df = spark.createDataFrame([Row(s=c) for c in cases])
    got = {r.s: r.sx for r in df.select("s", F.soundex(F.upper("s")).alias("sx")).collect()}
    for c in cases:
        assert got[c] == mirror(c), repr(c)


def test_skyline_handles_ties_and_duplicates(spark, tmp_path):
    """Strict-dominance semantics pinned by hand: duplicate
    (price, size) points all survive; same-price lower-size dies;
    cheaper-equal-size kills pricier."""
    rows = [
        (1, 10.0, 5),   # frontier
        (2, 10.0, 5),   # duplicate of 1 -> also survives
        (3, 10.0, 4),   # same price, smaller -> dominated by 1
        (4, 12.0, 5),   # pricier, same size -> dominated by 1
        (5, 12.0, 9),   # frontier (bigger than anything cheaper)
        (6, 8.0, 2),    # frontier (cheapest)
        (7, 15.0, 9),   # dominated by 5
    ]
    df = spark.createDataFrame(
        rows, "p_partkey long, p_retailprice double, p_size int"
    )
    df.write.parquet(f"{tmp_path}/part.parquet")
    from etl_knlp_spark.operators.stats import skyline_parts

    got = sorted(r.p_partkey for r in skyline_parts(spark, str(tmp_path)).collect())
    assert got == [1, 2, 5, 6]


def test_skyline_single_distinct_price(spark, tmp_path):
    """r11 prefix-max rewrite edge: with ONE distinct price the
    equal-width bucket expression would divide by (hi - lo) = 0 —
    the lo==hi branch pins everything to bucket 0 and the sweep
    reduces to the within-price group max."""
    rows = [(1, 10.0, 5), (2, 10.0, 5), (3, 10.0, 3)]
    df = spark.createDataFrame(
        rows, "p_partkey long, p_retailprice double, p_size int"
    )
    df.write.parquet(f"{tmp_path}/part.parquet")
    from etl_knlp_spark.operators.stats import skyline_parts

    got = sorted(r.p_partkey for r in skyline_parts(spark, str(tmp_path)).collect())
    assert got == [1, 2]

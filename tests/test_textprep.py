"""Tests for text-prep operators (textprep.py), the salted
aggregation (skew.py), shard export, and last-touch attribution."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_knlp_spark.functions.skew import salted_agg
from etl_knlp_spark.operators.textprep import (
    html_strip,
    shuffle_shard,
    strip_markup,
    text_normalize,
    url_domain_counts,
)


def test_strip_markup_removes_tags_and_collapses_ws(spark):
    df = spark.createDataFrame(
        [
            ("<p>hello <b>world</b></p>",),
            ("no tags at   all",),
            ("<div\nclass='x'>multi\nline</div>",),
            ("<br/><br/>",),
        ],
        ["t"],
    )
    out = [r[0] for r in df.select(strip_markup(F.col("t"))).collect()]
    assert out == ["hello world", "no tags at all", "multi line", ""]


def test_html_strip_has_no_tags_left(spark, sf_dir):
    res = html_strip(spark, sf_dir)
    assert res.filter(F.col("clean_text").rlike("<[^>]+>")).count() == 0
    assert res.filter(F.col("clean_text").rlike("  ")).count() == 0


def test_text_normalize_charset(spark, sf_dir):
    res = text_normalize(spark, sf_dir)
    # only lowercase alnum + single spaces survive
    assert res.filter(F.col("norm_text").rlike("[^a-z0-9 ]")).count() == 0
    assert res.filter(F.col("norm_text").rlike("  ")).count() == 0


def test_url_domain_counts_complete(spark, sf_dir):
    res = url_domain_counts(spark, sf_dir)
    rows = {r["domain"]: r["n_docs"] for r in res.collect()}
    # doc_id % 20 → exactly 20 injected domains covering every doc
    assert len(rows) == 20
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(rows.values()) == n_docs


def test_shuffle_shard_deterministic_and_dense(spark, sf_dir):
    a = shuffle_shard(spark, sf_dir).collect()
    b = shuffle_shard(spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # positions within each shard are dense 1..n
    by_shard: dict[int, list[int]] = {}
    for r in a:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), shard
    assert 0 <= min(by_shard) and max(by_shard) < 8


def test_salted_agg_matches_plain_groupby(spark):
    df = spark.createDataFrame(
        [("hot", float(i)) for i in range(500)] + [("cold", 1.0), ("cold", 2.0)],
        ["k", "v"],
    )
    salted = salted_agg(
        df, ["k"], {"s": F.sum("v"), "n": F.count(F.lit(1))}, buckets=4
    )
    plain = df.groupBy("k").agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_attribution_last_touch_picks_latest_view(spark, sf_dir, monkeypatch):
    import datetime as dt

    from etl_knlp_spark.operators import events as ev

    base = dt.datetime(2024, 1, 10, 12, 0, 0)

    def fake_load(spark_, sf_dir_, name):
        assert name == "events"
        rows = [
            # user 1: two views before purchase → latest (id 12) wins
            (11, base - dt.timedelta(hours=5), 1, "view", 0.0, "{}"),
            (12, base - dt.timedelta(hours=1), 1, "view", 0.0, "{}"),
            (13, base, 1, "purchase", 9.9, "{}"),
            # user 2: only view is outside the 3-day lookback → no row
            (21, base - dt.timedelta(days=4), 2, "view", 0.0, "{}"),
            (22, base, 2, "purchase", 5.0, "{}"),
            # user 3: view after the purchase → no row
            (31, base + dt.timedelta(hours=1), 3, "view", 0.0, "{}"),
            (32, base, 3, "purchase", 1.0, "{}"),
        ]
        return spark_.createDataFrame(
            rows, "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
            "event_type STRING, value DOUBLE, props STRING"
        )

    monkeypatch.setattr(ev, "load_table", fake_load)
    out = ev.attribution_last_touch(spark, sf_dir).collect()
    assert len(out) == 1
    assert out[0]["purchase_id"] == 13 and out[0]["view_id"] == 12


def test_markov_transition_rows_normalize_to_one(spark, sf_dir):
    from collections import defaultdict

    from etl_knlp_spark.operators.events import markov_transitions

    rows = markov_transitions(spark, sf_dir).collect()
    assert rows
    by_prev = defaultdict(float)
    for r in rows:
        assert r["n"] >= 1
        by_prev[r["prev_type"]] += r["p"]
    # each row of the transition matrix is a probability distribution
    assert all(abs(s - 1.0) < 1e-4 for s in by_prev.values())


def test_sentence_segmentation_crafted(spark, tmp_path):
    """Multi-sentence splitting semantics: terminator runs absorbed,
    whitespace-only fragments dropped but indices keep raw positions,
    leading terminators skipped."""
    from pyspark.sql import Row

    from etl_knlp_spark.operators.textprep import text_sentences

    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="One. Two!! Three?", lang="en", source="t",
                n_chars=17),
            Row(doc_id=1, text="...leading. trailing", lang="en", source="t",
                n_chars=20),
            Row(doc_id=2, text="no terminator at all", lang="en", source="t",
                n_chars=20),
        ]
    )
    sf = str(tmp_path)
    docs.write.parquet(f"{sf}/documents.parquet")
    got = {(r.doc_id, r.sent_idx): r.sentence
           for r in text_sentences(spark, sf).collect()}
    assert got[(0, 0)] == "One."
    assert got[(0, 1)] == "Two!!"
    assert got[(0, 2)] == "Three?"
    assert got[(1, 0)] == "leading."
    assert got[(1, 1)] == "trailing"
    assert got[(2, 0)] == "no terminator at all"


def test_url_canonical_collapses_each_variant_group(spark, tmp_path):
    """The three default-port taint variants collapse to one canonical
    URL with the expected normal form (lowercased, DEFAULT port
    stripped, trailing slash stripped, utm_* dropped, params sorted,
    smallest doc_id as keeper) — while the :8443 variant keeps its
    non-default port and stays a distinct URL (r12 review: the
    previous canonicalizer deleted ALL port syntax, silently merging
    example.com:8080 with example.com on both engines)."""
    rows = [(i, f"text {i}", "en", "s", 6) for i in range(8)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{tmp_path}/documents.parquet")
    from etl_knlp_spark.operators.textprep import url_canonical_dedup

    got = {
        r.canonical_url: (r.n_variants, r.keeper_doc_id)
        for r in url_canonical_dedup(spark, str(tmp_path)).collect()
    }
    assert got == {
        "https://example.com/page/0?a=1&b=2": (3, 0),
        "https://example.com:8443/page/0?a=1&b=2": (1, 3),
        "https://example.com/page/1?a=1&b=2": (3, 4),
        "https://example.com:8443/page/1?a=1&b=2": (1, 7),
    }

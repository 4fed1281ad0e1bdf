"""Suffix-array family: prefix-doubling ranks vs a from-scratch Python
suffix sort, and the hash-doubling span finder vs the direct-shingle
construction (the dual-construction pin the registered oracle repeats
at driver scale)."""

from __future__ import annotations

import random

from pyspark.sql import Row
from pyspark.sql import functions as F

from etl_knlp_spark.operators.dedup import duplicated_spans
from etl_knlp_spark.operators.suffixarray import (
    duplicated_spans_doubling,
    suffix_ranks,
)


def _python_suffix_ranks(s: str) -> dict[int, int]:
    """1-based pos -> 1-based lexicographic rank, straight from the
    definition (sort the actual suffix strings, bytewise)."""
    order = sorted(range(1, len(s) + 1), key=lambda i: s[i - 1 :].encode())
    return {pos: rank for rank, pos in enumerate(order, start=1)}


def test_suffix_ranks_match_definition(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="banana"),
            Row(doc_id=2, text="mississippi"),
            Row(doc_id=3, text="abracadabra abra"),
            Row(doc_id=4, text="aaaaaaa"),
            Row(doc_id=5, text="z"),
        ]
    )
    got = {
        (r.doc_id, r.pos): r.sa_rank
        for r in suffix_ranks(docs, cap=32).collect()
    }
    for doc_id, text in [
        (1, "banana"),
        (2, "mississippi"),
        (3, "abracadabra abra"),
        (4, "aaaaaaa"),
        (5, "z"),
    ]:
        want = _python_suffix_ranks(text)
        for pos, rank in want.items():
            assert got[(doc_id, pos)] == rank, (doc_id, pos, text)
    assert len(got) == sum(len(t) for _, t in [
        (1, "banana"), (2, "mississippi"), (3, "abracadabra abra"),
        (4, "aaaaaaa"), (5, "z"),
    ])


def test_suffix_ranks_random_docs(spark):
    """Property pin on randomized strings (small alphabet maximizes
    rank ties, the doubling algorithm's hard case), including lengths
    around the cap and the final doubling round."""
    rng = random.Random(0x5A)
    texts = [
        "".join(rng.choice("ab ") for _ in range(rng.choice([1, 2, 7, 31, 32, 33, 64])))
        for _ in range(24)
    ]
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    got: dict[int, dict[int, int]] = {}
    for r in suffix_ranks(docs, cap=32).collect():
        got.setdefault(r.doc_id, {})[r.pos] = r.sa_rank
    for i, t in enumerate(texts):
        assert got.get(i, {}) == _python_suffix_ranks(t[:32]), (i, t)


def _python_lrs(s: str) -> tuple[int, str]:
    """Longest repeated substring from the definition: every substring,
    kept if it occurs >= 2 times, longest wins, min text on ties."""
    best_len, best_text = 0, ""
    seen_at_len: dict[int, dict[str, int]] = {}
    for i in range(len(s)):
        for L in range(1, len(s) - i + 1):
            sub = s[i : i + L]
            counts = seen_at_len.setdefault(L, {})
            counts[sub] = counts.get(sub, 0) + 1
    for L, counts in seen_at_len.items():
        dups = sorted(t for t, c in counts.items() if c > 1)
        if dups and (L > best_len):
            best_len, best_text = L, dups[0]
    return best_len, best_text


def test_suffix_lcp_matches_definition(spark):
    from etl_knlp_spark.operators.suffixarray import suffix_lcp_stats

    rng = random.Random(0x1C9)
    texts = ["banana", "abcdefg", "aaaaaaaa", "x", "ab ab ab x", "mississippi"]
    texts += [
        "".join(rng.choice("abc ") for _ in range(rng.choice([2, 15, 31, 32, 40])))
        for _ in range(18)
    ]
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    got = {
        r.doc_id: (r.lrs_len, r.lrs_text)
        for r in suffix_lcp_stats(docs, cap=32).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _python_lrs(t[:32]), (i, t)


def test_doubling_spans_match_shingle_construction(spark):
    """duplicated_spans_doubling == duplicated_spans on a randomized
    corpus with planted duplicated spans — two independent
    constructions of the ExactSubstr union cover."""
    rng = random.Random(8088)
    vocab = [f"w{i}" for i in range(40)]
    boiler = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(8, 20)))
        for _ in range(6)
    ]
    rows = []
    for d in range(60):
        toks: list[str] = []
        while len(toks) < 40:
            if rng.random() < 0.4:
                toks.extend(rng.choice(boiler).split())
            else:
                toks.extend(rng.choice(vocab) for _ in range(rng.randint(3, 9)))
        rows.append(Row(doc_id=d, text=" ".join(toks)))
    docs = spark.createDataFrame(rows)
    for min_len in (8, 5):  # power of two AND the overlapped-tail path
        a = {
            tuple(r)
            for r in duplicated_spans_doubling(docs, min_len=min_len).collect()
        }
        b = {tuple(r) for r in duplicated_spans(docs, min_len=min_len).collect()}
        assert a == b and a, f"min_len={min_len}"


def test_doubling_spans_short_and_empty_docs(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b c"),  # shorter than min_len
            Row(doc_id=2, text=""),
            Row(doc_id=3, text="x y z q r s t u extra tail"),
            Row(doc_id=4, text="x y z q r s t u other ending"),
        ]
    )
    got = {tuple(r) for r in duplicated_spans_doubling(docs, min_len=8).collect()}
    assert got == {(3, 1, 8, 8), (4, 1, 8, 8)}


def test_doubling_rounds_never_broadcast(spark):
    """Regression pin for the 100×-probe OOM: the ladder's positional
    self-joins must plan as SortMergeJoin — the checkpointed sides
    have unknown stats, and an unpinned plan broadcast a 100M-row rank
    table (driver OOM), then shuffle_hash OOMed executors."""
    from etl_knlp_spark.operators.suffixarray import (
        _doubling_rounds,
        _pair_round,
    )

    docs = spark.createDataFrame(
        [Row(doc_id=1, text="abracadabra"), Row(doc_id=2, text="banana")]
    )
    _, rounds = _doubling_rounds(docs, cap=4)
    # the production join expression, fed a checkpointed rung exactly
    # as _doubling_rounds does
    plan = (
        _pair_round(rounds[0][1], 1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan

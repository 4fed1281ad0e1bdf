"""WordPiece greedy-apply: kernel unit pins + operator contract.

The registered query is value-hashed against the DuckDB recursive-CTE
oracle by the driver (and tools/verify_oracles.py); these tests pin
the kernel rules the hash alone would not localize, plus the
operator-level invariants on real testdata.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from etl_knlp_spark.operators.wordpiece import (
    _UNK,
    greedy_wordpiece,
    segment_words,
    wordpiece_tokenize,
    wordpiece_vocab,
)


def test_greedy_longest_match_first():
    vocab = {"a", "ab", "abc", "##d", "##cd"}
    # longest available piece wins at each step
    assert greedy_wordpiece("abcd", vocab) == ["abc", "##d"]
    # a shorter initial match changes the rest of the walk
    assert greedy_wordpiece("abcd", {"ab", "##cd"}) == ["ab", "##cd"]


def test_greedy_continuation_marker_required():
    # 'b' in vocab only as initial form: matching at position 1 needs
    # '##b', so the word dead-ends to a whole-word UNK
    assert greedy_wordpiece("ab", {"a", "b"}) == [_UNK]
    assert greedy_wordpiece("ab", {"a", "##b"}) == ["a", "##b"]


def test_greedy_dead_end_is_whole_word_unk():
    # partial progress is discarded (BERT rule): 'abc' matches 'ab'
    # then dead-ends on c
    assert greedy_wordpiece("abc", {"ab", "a", "##b"}) == [_UNK]
    assert greedy_wordpiece("x", set()) == [_UNK]


def test_greedy_max_piece_len_respected():
    # 'abcde' is in the vocab but exceeds max_piece_len=4, so the
    # scan never considers it
    assert greedy_wordpiece("abcde", {"abcde", "abcd", "##e"}) == ["abcd", "##e"]


def test_vocab_induction_deterministic_topk(spark):
    words = spark.createDataFrame(
        [("aa", 5), ("ab", 3), ("b", 2)], "word string, c long"
    )
    got = [r["piece"] for r in wordpiece_vocab(words, vocab_size=4).collect()]
    # keys: a(init,8), ##a(5), ##b(3+2? -> 'b' initial 2; ab: init a, cont ##b)
    # counts: 'a' initial = 5+3 = 8; '##a' = 5; '##b' = 3; 'aa' = 5;
    # 'ab' = 3; 'b' = 2 — top-4 by (cnt desc, piece asc)
    assert got == ["a", "##a", "aa", "##b"]


def test_segment_words_state_table(spark):
    words = spark.createDataFrame(
        [("abcd", 1), ("zz", 1)], "word string, c long"
    )
    rows = {
        r["word"]: (r["state"], r["np"], r["unk"])
        for r in segment_words(words, {"abc", "##d", "a"}).collect()
    }
    assert rows["abcd"] == ("abc ##d", 2, False)
    assert rows["zz"] == (_UNK, 1, True)


def test_wordpiece_tokenize_contract(spark, sf_dir):
    out = wordpiece_tokenize(spark, sf_dir)
    agg = out.agg(
        F.sum("n_unk_words").alias("u"),
        F.sum("n_words").alias("w"),
        F.sum("n_pieces").alias("p"),
        F.min(F.col("n_pieces") >= F.col("n_words")).alias("ge"),
        F.min(F.col("n_unk_words") <= F.col("n_words")).alias("le"),
    ).collect()[0]
    # the UNK rule is live on graded data (vocab sized below the key
    # count) but not degenerate
    assert 0 < agg["u"] < agg["w"]
    assert agg["ge"] and agg["le"]
    # the signature has exactly n_words word entries (UNK words
    # included) — ' | ' separates words
    bad = out.filter(
        F.size(F.split(F.col("sig"), r" \| ")) != F.col("n_words")
    ).count()
    assert bad == 0

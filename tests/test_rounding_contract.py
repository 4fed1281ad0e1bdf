"""Cross-engine rounding contract (r12): the measurement behind the
floor-form conversion, pinned as a regression test.

`ROUND(x, k)` disagrees between Spark and DuckDB when x is an exact
rational whose decimal expansion terminates at the (k+1)th digit
with a 5: DuckDB multiplies by 10^k and rounds the double product,
Spark routes the double through BigDecimal's exact expansion — at a
terminating half the two paths can land on opposite sides (the
percent_rank sf0.1 incident, 333/640 = 0.5203125). The repo-wide fix
is `FLOOR(x*10^k + 0.5)/10^k` on BOTH engines: flooring the
bit-identical ratio double is deterministic and identical by
construction. These tests pin (a) that the hazard is real — the
documented witness rationals still split the engines' ROUND — and
(b) that the floor form agrees on every exact-half rational in the
probe set plus random-ratio controls. If (a) ever stops failing
ROUND (an engine changed its rounding), the conversion rationale
should be re-examined; if (b) ever fails, a worker/JVM float change
broke the repo's core determinism recipe.
"""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F


def _exact_half_rationals() -> list[tuple[int, int]]:
    """(k, n) pairs where k/n terminates at exactly the 7th decimal
    with digit 5 — the ROUND(x, 6) half-boundary class."""
    out = []
    for n in (64, 128, 160, 320, 640, 1280, 2560):
        for k in range(1, min(n, 400)):
            num = k * 10**7
            if num % n == 0 and (num // n) % 10 == 5:
                out.append((k, n))
    return out


# The r12 probe's live witnesses: rationals where DuckDB ROUND and
# Spark ROUND produced DIFFERENT 6dp values (measured 2026-08;
# 333/640 is the documented percent_rank case).
_KNOWN_DISAGREEMENTS = [(41, 640), (323, 640), (333, 640), (82, 1280), (164, 2560)]


@pytest.fixture(scope="module")
def engines(spark):
    cases = _exact_half_rationals()
    rng = random.Random(7)
    controls = [(rng.randrange(1, 10**6), rng.randrange(2, 10**6)) for _ in range(500)]
    all_cases = cases + controls

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"({k},{n})" for k, n in all_cases)
        + ") v(k, n)"
    )
    duck_round = {
        (k, n): r
        for k, n, r in con.execute(
            "SELECT k, n, ROUND(k * 1.0 / n, 6) FROM t"
        ).fetchall()
    }
    duck_floor = {
        (k, n): r
        for k, n, r in con.execute(
            "SELECT k, n, FLOOR(k * 1.0 / n * 1000000 + 0.5) / 1000000.0 FROM t"
        ).fetchall()
    }
    df = spark.createDataFrame(all_cases, "k long, n long")
    ratio = F.col("k") * 1.0 / F.col("n")
    rows = df.select(
        "k",
        "n",
        F.round(ratio, 6).alias("r"),
        (F.floor(ratio * 1000000 + 0.5) / 1000000.0).alias("f"),
    ).collect()
    spark_round = {(r["k"], r["n"]): r["r"] for r in rows}
    spark_floor = {(r["k"], r["n"]): r["f"] for r in rows}
    return cases, controls, duck_round, duck_floor, spark_round, spark_floor


def test_round_still_splits_the_engines_on_terminating_halves(engines):
    """The hazard is real and current: the documented witness rationals
    still produce different ROUND(x, 6) values across the engines."""
    _, _, duck_round, _, spark_round, _ = engines
    disagreements = [
        kn for kn in _KNOWN_DISAGREEMENTS
        if abs(duck_round[kn] - spark_round[kn]) > 1e-12
    ]
    assert disagreements, (
        "no ROUND disagreement on the documented witnesses — an engine "
        "changed its rounding; re-examine the floor-form rationale "
        "(BASELINE.md round-12)"
    )


def test_floor_form_agrees_everywhere(engines):
    """FLOOR(x*1e6 + 0.5)/1e6 is bit-identical across engines on every
    exact-half rational AND the random-ratio controls — the property
    all 16 converted queries (and the integer-unit money recipe)
    depend on."""
    cases, controls, _, duck_floor, _, spark_floor = engines
    bad = [
        kn for kn in cases + controls
        if duck_floor[kn] != spark_floor[kn]
    ]
    assert not bad, f"floor-form disagreement on {bad[:10]} — the core determinism recipe broke"


def test_codec_mean_half_landings_are_dyadic_only_and_floor_agrees(spark):
    """r13: the codec/flac family rounds mean-of-codepoints rationals
    at 4dp (s/w, w in 1..64, s <= 255*w). Two pins:

    (a) The r12 worry — "a testdata regeneration could mint a
        non-dyadic-width half-landing where the engines' ROUNDs
        split" — is PROVABLY vacuous for this shape: s/w lands
        exactly on a 4-decimal half iff s*2*10^4/w is an odd
        integer, which needs v2(w) = v2(s) + 5 >= 5, so w must be a
        multiple of 32 — for w <= 64 only the dyadic 32 and 64 (where
        mean and mean*10^4 are exactly representable and both
        engines' ROUND already agreed). The exhaustive scan pins it.
        (theta_sketch_ops' hash denominators range over 32-bit ints,
        where composite odd parts DO admit half-landings — that
        conversion addressed a live hazard; the codec one buys audit
        uniformity.)

    (b) The floor form agrees across engines on the dyadic
        half-landings that DO occur, plus near-half controls."""
    import duckdb

    half_widths = set()
    cases = []
    for w in range(1, 65):
        for s in range(1, 255 * w + 1):
            num = s * 2 * 10**4
            if num % w == 0 and (num // w) % 2 == 1:
                half_widths.add(w)
                cases.append((s, w))
                break  # one witness per width
    # (a) every width that can land on a 4dp half is a power of two
    non_dyadic = {w for w in half_widths if w & (w - 1)}
    assert not non_dyadic, (
        f"non-dyadic 4dp half-landing widths exist: {sorted(non_dyadic)} "
        "— the r13 dyadic-only proof in this docstring is wrong; "
        "re-examine the codec family's rounding analysis"
    )
    assert half_widths, "no half-landings at all — scan bug"
    # (b) floor-form agreement on the real half-landings + controls
    cases += [(s, w) for w in (3, 48, 63) for s in (w * 7 + 1, w * 11 + 2)]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"({s},{w})" for s, w in cases)
        + ") v(s, w)"
    )
    duck = dict(
        (tuple(r[:2]), r[2])
        for r in con.execute(
            "SELECT s, w, FLOOR(s * 1.0 / w * 10000 + 0.5) / 10000 FROM t"
        ).fetchall()
    )
    df = spark.createDataFrame(cases, "s long, w long")
    ratio = F.col("s") * 1.0 / F.col("w")
    rows = df.select(
        "s", "w", (F.floor(ratio * 10000 + 0.5) / 10000.0).alias("f")
    ).collect()
    bad = [
        (r["s"], r["w"])
        for r in rows
        if duck[(r["s"], r["w"])] != r["f"]
    ]
    assert not bad, f"4dp floor-form disagreement on {bad[:10]}"

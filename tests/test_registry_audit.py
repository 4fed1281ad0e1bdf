"""Registry hygiene: the `_STALE_SINCE` map is hand-maintained, and a
missed entry silently lets a pre-change green driver row keep counting
as correctness evidence. These tests make that failure mode loud
(round-4 verdict item 6) — no SparkSession needed."""

from __future__ import annotations

import hashlib
import json
import os

from etl_knlp_spark import registry

SNAPSHOT = os.path.join(os.path.dirname(__file__), "oracle_snapshot.json")


def _current() -> dict[str, tuple[str | None, int]]:
    registry._load_all()
    return {
        name: (
            hashlib.md5(rq.oracle.encode()).hexdigest() if rq.oracle else None,
            registry._STALE_SINCE.get(name, 0),
        )
        for name, rq in registry._REGISTRY.items()
    }


def test_oracle_change_requires_stale_since_bump():
    """Any oracle edit must come with a `_STALE_SINCE` move AND a
    snapshot regeneration (tools/snapshot_oracles.py) in the same
    change — a changed oracle with an unmoved staleness bar means old
    driver rows validate semantics that no longer exist."""
    with open(SNAPSHOT) as f:
        snap = json.load(f)
    cur = _current()
    offenders = []
    for name, (md5, stale) in cur.items():
        old = snap.get(name)
        if old is None:
            continue  # new query this round: no prior evidence to invalidate
        if md5 != old["oracle_md5"] and stale <= old["stale_since"]:
            offenders.append(name)
    assert not offenders, (
        f"oracle changed without a _STALE_SINCE bump for {offenders}; "
        "bump etl_knlp_spark/registry.py:_STALE_SINCE and rerun "
        "tools/snapshot_oracles.py"
    )


def test_snapshot_is_in_sync_for_unchanged_oracles():
    """The committed snapshot must describe the current registry: every
    registered query appears (regenerate after adding queries), and
    entries whose oracle is unchanged must carry the current
    stale_since (so the next change is judged against the right bar)."""
    with open(SNAPSHOT) as f:
        snap = json.load(f)
    cur = _current()
    missing = sorted(set(cur) - set(snap))
    assert not missing, (
        f"queries missing from oracle_snapshot.json: {missing}; "
        "rerun tools/snapshot_oracles.py"
    )
    drifted = [
        name
        for name, (md5, stale) in cur.items()
        if name in snap
        and md5 == snap[name]["oracle_md5"]
        and stale != snap[name]["stale_since"]
    ]
    assert not drifted, (
        f"_STALE_SINCE moved without an oracle change being snapshotted "
        f"for {drifted}; rerun tools/snapshot_oracles.py"
    )


def test_stale_since_names_exist():
    """Every `_STALE_SINCE` key must name a registered query — a typo
    here silently protects nothing."""
    registry._load_all()
    unknown = sorted(set(registry._STALE_SINCE) - set(registry._REGISTRY))
    assert not unknown, f"_STALE_SINCE names unknown queries: {unknown}"


def test_value_hash_comparator_is_not_vacuous():
    """The correctness gate is only as good as its hash: prove the
    canonicalization catches the mutation classes it claims to —
    changed values, reordered-but-different rows, float drift above
    the 1e-9 canon scale — and tolerates exactly the ones it should
    (row order, column order, sub-1e-9 float noise)."""
    import pandas as pd

    import importlib.util, os

    spec = importlib.util.spec_from_file_location(
        "verify_oracles",
        os.path.join(os.path.dirname(__file__), "..", "tools", "verify_oracles.py"),
    )
    vo = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(vo)

    base = pd.DataFrame({"k": [1, 2, 3], "v": [1.0, 2.5, 3.25]})
    h = vo.value_hash(base)
    # invariant to row order and column order
    assert vo.value_hash(base.iloc[::-1].reset_index(drop=True)) == h
    assert vo.value_hash(base[["v", "k"]]) == h
    # invariant to float noise below the 1e-9 canon scale
    assert vo.value_hash(base.assign(v=base.v + 1e-12)) == h
    # sensitive to a changed value, a changed key, and float drift
    assert vo.value_hash(base.assign(v=[1.0, 2.5, 3.26])) != h
    assert vo.value_hash(base.assign(k=[1, 2, 4])) != h
    assert vo.value_hash(base.assign(v=base.v + 1e-8)) != h
    # sensitive to a dropped/duplicated row even at equal length... 
    mutated = pd.concat([base.iloc[:2], base.iloc[1:2]]).reset_index(drop=True)
    assert vo.value_hash(mutated) != h

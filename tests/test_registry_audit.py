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

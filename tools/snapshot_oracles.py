"""Regenerate tests/oracle_snapshot.json — run after an INTENTIONAL
oracle change, in the same commit as the matching `_STALE_SINCE` bump.

The snapshot pins (oracle hash, stale_since) per registered query;
tests/test_registry_audit.py fails whenever an oracle string changed
without its `_STALE_SINCE` entry moving forward — the hand-maintained
staleness map is the correctness record's weak point (a missed entry
silently lets a pre-change green driver row keep counting as
evidence; round-4 verdict item 6), and this closes it mechanically.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_knlp_spark import registry  # noqa: E402

SNAPSHOT_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "oracle_snapshot.json",
)


def _fn_md5(fn) -> str | None:
    """md5 of the query function's SOURCE (round-6 verdict #2): the
    audit previously covered oracle edits only, so a Spark-side edit
    under an unchanged oracle left up to ~4 rounds of old green rows
    vouching for changed code (the r6 `quality_scored` decorator-
    capture bug was exactly this class). None when source is
    unavailable (shouldn't happen for module-level functions)."""
    import inspect

    try:
        return hashlib.md5(inspect.getsource(fn).encode()).hexdigest()
    except (OSError, TypeError):
        return None


def build_snapshot() -> dict[str, dict]:
    registry._load_all()
    return {
        name: {
            "oracle_md5": (
                hashlib.md5(rq.oracle.encode()).hexdigest() if rq.oracle else None
            ),
            "fn_md5": _fn_md5(rq.fn),
            "stale_since": registry._STALE_SINCE.get(name, 0),
        }
        for name, rq in sorted(registry._REGISTRY.items())
    }


if __name__ == "__main__":
    snap = build_snapshot()
    with open(SNAPSHOT_PATH, "w") as f:
        json.dump(snap, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {SNAPSHOT_PATH} ({len(snap)} queries)")

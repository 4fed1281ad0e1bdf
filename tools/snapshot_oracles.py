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


def build_snapshot() -> dict[str, dict]:
    """fn_md5 covers the query function's EXECUTABLE source (round-6
    verdict #2 via registry.fn_semantic_md5, r12: docstrings/comments
    stripped so a snapshot fn_md5 diff always means code moved — the
    r11-ADVICE hole where a docstring-only regen was indistinguishable
    from an unbumped semantic edit)."""
    registry._load_all()
    return {
        name: {
            "oracle_md5": (
                hashlib.md5(rq.oracle.encode()).hexdigest() if rq.oracle else None
            ),
            "fn_md5": registry.fn_semantic_md5(rq.fn),
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

    # A snapshot regen almost always accompanies a `_STALE_SINCE` bump,
    # and every bump changes the next driver window — print the
    # window-math pre-check inline (r14, after r13 shipped a bump whose
    # one-query window overrun was found by hand arithmetic a round
    # late) so the budget consequence is visible in the same terminal.
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "evidence_report",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "evidence_report.py"),
    )
    er = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(er)
    evidence = registry._evidence_rounds()
    env = registry._environment_epochs()
    order = registry._sweep_order()
    fresh = {n: er.freshest_valid(n, evidence, env) for n in order}
    active = [
        n
        for n in registry._SWEEP_PRIORITY
        if fresh.get(n) is None or fresh[n] < registry._SWEEP_PRIORITY[n]
    ]
    pw = er.project_window(order, fresh, active)
    print(
        f"window-math pre-check (next round r{pw['next_round']}): "
        f"{len(pw['pins'])} pins + {len(pw['unevidenced'])} unevidenced + "
        f"{len(pw['overdue'])} overdue = {len(pw['demand'])} mandatory vs "
        f"budget {pw['budget']} -> overrun {pw['overrun']}"
        + (f"; WOULD WAIT: {pw['waiters']}" if pw["waiters"] else "")
    )

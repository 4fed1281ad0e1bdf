"""Driver-evidence ledger: the judge's evidence replay, mechanized.

For every registered query, computes the freshest VALID driver
evidence round exactly as `registry._sweep_order` does — a
CORRECTNESS_r*.json row counts only if it is a hash_match=true row
(oracled) or a clean rows-only row (oracle-less), recorded at or
after both the hand-maintained `_STALE_SINCE` bar and the computed
environment epoch of every table the query touches. Prints:

  - the freshest-evidence histogram (the "evidence latency" the r9
    verdict graded — 62 queries sat at round 3/4 going into r10),
  - queries with NO valid evidence (these must sit inside the next
    50-query sweep window or they starve),
  - the active `_SWEEP_PRIORITY` tier in order,
  - the projected next sweep window (first 50 of `_sweep_order`).

Usage:  python tools/evidence_report.py [--window-only]
"""

from __future__ import annotations

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_knlp_spark import registry  # noqa: E402


def freshest_valid(name: str, evidence, env_epochs) -> int | None:
    rq = registry._REGISTRY[name]
    min_round = registry._STALE_SINCE.get(name, 0)
    for table in registry._tables_of(rq):
        min_round = max(min_round, env_epochs.get(table, 0))
    valid = [
        r
        for r, e in evidence.get(name, [])
        if r >= min_round
        and (
            e.get("hash_match") is True
            if rq.oracle is not None
            else e.get("err") == "no_oracle" and e.get("spark_rows") is not None
        )
    ]
    return max(valid) if valid else None


def main() -> int:
    registry._load_all()
    evidence = registry._evidence_rounds()
    env_epochs = registry._environment_epochs()
    order = registry._sweep_order()
    fresh = {n: freshest_valid(n, evidence, env_epochs) for n in order}

    if "--window-only" not in sys.argv:
        hist = Counter("none" if r is None else f"r{r}" for r in fresh.values())
        print(f"{len(order)} registered queries; freshest-evidence histogram:")
        for k in sorted(hist, key=lambda x: (x == "none", x)):
            print(f"  {k}: {hist[k]}")
        unevidenced = [n for n in order if fresh[n] is None]
        if unevidenced:
            print(f"\n{len(unevidenced)} queries with NO valid evidence:")
            for n in unevidenced:
                pos = order.index(n)
                tag = "inside" if pos < 50 else "OUTSIDE — WILL STARVE"
                print(f"  {n} (sweep position {pos}: {tag})")
        active = [
            n
            for n in registry._SWEEP_PRIORITY
            if fresh.get(n) is None or fresh[n] < registry._SWEEP_PRIORITY[n]
        ]
        if active:
            print(f"\n{len(active)} active _SWEEP_PRIORITY entries (insertion order):")
            for n in active:
                print(f"  {n} (demands r{registry._SWEEP_PRIORITY[n]}, has "
                      f"{'none' if fresh[n] is None else 'r%d' % fresh[n]})")

    print("\nprojected next sweep window (first 50 of _sweep_order):")
    for i, n in enumerate(order[:50]):
        print(f"  {i:2d} {n} "
              f"[{'none' if fresh[n] is None else 'r%d' % fresh[n]}]")

    # Steady-state staleness bound (r10 verdict #3): simulate the pure
    # stalest-first rotation forward (each round lands all 50 window
    # rows) and report the worst evidence age once one full cycle is
    # in. With 300 queries and 50 slots the cycle is ceil(300/50) = 6,
    # so max staleness <= 6 rounds by construction — the registration
    # freeze is what keeps this bound tight.
    budget = 50
    cycle = -(-len(order) // budget)
    reg_pos = {n: i for i, n in enumerate(registry._REGISTRY)}
    sim = {n: (r if r is not None else -1) for n, r in fresh.items()}
    rnd = max((r for r in fresh.values() if r is not None), default=0)
    worst = 0
    for step in range(2 * cycle):
        rnd += 1
        for n in sorted(sim, key=lambda n: (sim[n], reg_pos[n]))[:budget]:
            sim[n] = rnd
        if step >= cycle - 1:
            worst = max(worst, rnd - min(sim.values()))
    print(
        f"\nsteady-state rotation: {len(order)} queries / {budget} slots "
        f"= {cycle}-round full-refresh cycle; simulated max staleness "
        f"over {2 * cycle} future rounds: {worst} rounds "
        f"({'within' if worst <= cycle else 'EXCEEDS'} the {cycle}-round "
        "bound)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

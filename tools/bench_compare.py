"""Round-over-round bench guard.

Compares the newest two BENCH_r*.json at the repo root (or two paths
given as args) per query and exits non-zero when any query regressed
more than REGRESSION_X vs the previous round — so an edit that slows
one plan 2x can't hide inside a flat suite total. Usage:

    python tools/bench_compare.py [prev.json curr.json]
    python tools/bench_compare.py --vs-floors [curr.json]

`--vs-floors` compares against tools/bench_floors.json — the
per-query MINIMUM ever recorded on this host (BASELINE.md "round-10:
per-query MIN_BASE floors"). This is the ambient-episode diagnostic
(r9 verdict #4): outside-VM contention inflates every query
UNIFORMLY, so a high wall total with a tight ratio spread around the
median is ambient; a plan regression shows as outlier queries far
above the median ratio. The mode prints the median floor-ratio and
flags only queries > OUTLIER_X × median — judging floors, not walls.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REGRESSION_X = 1.5
# queries faster than this in the baseline are dominated by per-query
# fixed overhead (session dispatch, file listing) — ratio noise, not plan
MIN_BASE_SEC = 0.4
# --vs-floors: a query is suspicious only when its floor-ratio exceeds
# this multiple of the suite's MEDIAN floor-ratio (uniform ambient
# inflation moves the median, a plan regression moves one query)
OUTLIER_X = 1.6


def _round_files(root: str) -> list[str]:
    def round_no(p: str) -> int:
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        return int(m.group(1)) if m else -1

    return sorted(glob.glob(os.path.join(root, "BENCH_r*.json")), key=round_no)


def _vs_floors(curr: dict) -> int:
    import statistics

    floors_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_floors.json")
    try:
        with open(floors_path) as f:
            floors = json.load(f)
    except (OSError, ValueError) as e:
        print(f"cannot load floors file {floors_path}: {e}")
        return 1
    comparable = {q: t for q, t in floors.items() if t >= MIN_BASE_SEC}
    ratios = {
        q: t / floors[q]
        for q, t in curr.get("queries", {}).items()
        if q in comparable
    }
    if not ratios:
        # A renamed/emptied floors file or drifted query names must not
        # read as "gate passed" — the only benign empty case is a floors
        # table whose entries are ALL under MIN_BASE_SEC.
        if comparable:
            print(
                f"floors file has {len(comparable)} comparable entries but "
                "NONE intersect the bench's query names — names drifted or "
                "the wrong file was compared"
            )
            return 1
        print("no floor-comparable queries (all floors below MIN_BASE_SEC)")
        return 0
    med = statistics.median(ratios.values())
    print(
        f"median floor-ratio {med:.2f}x over {len(ratios)} queries "
        f"(1.0 = the best this host has ever run them; a uniform "
        f"elevation is ambient contention, not a regression)"
    )
    outliers = sorted(
        ((r, q) for q, r in ratios.items() if r > OUTLIER_X * med), reverse=True
    )
    for r, q in outliers:
        print(f"  {q}: {r:.2f}x its floor ({r / med:.2f}x the median) <-- OUTLIER")
    if outliers:
        print(f"{len(outliers)} quer{'y' if len(outliers) == 1 else 'ies'} above {OUTLIER_X}x the median floor-ratio")
        return 1
    print("no per-query outlier vs floors")
    return 0


def main() -> int:
    def load(path: str) -> dict | None:
        # an unreadable/invalid file is the same "unusable" outcome as a
        # crashed round — the callers' None-check message, not a traceback
        try:
            with open(path) as f:
                d = json.load(f)
        except (OSError, ValueError):
            return None
        # driver-recorded BENCH_r*.json wraps bench.py's line in "parsed";
        # a crashed round records "parsed": null — unusable for comparison
        p = d.get("parsed", d)
        return p if isinstance(p, dict) and "value" in p else None

    if "--vs-floors" in sys.argv:
        args = [a for a in sys.argv[1:] if a != "--vs-floors"]
        if args:
            curr = load(args[0])
        else:
            root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            usable = [(p, load(p)) for p in _round_files(root)]
            usable = [(p, d) for p, d in usable if d is not None]
            if not usable:
                print("no usable bench file")
                return 1
            _, curr = usable[-1]
        if curr is None:
            print("bench file has no parsed result")
            return 1
        return _vs_floors(curr)

    if len(sys.argv) == 3:
        prev_path, curr_path = sys.argv[1], sys.argv[2]
        prev, curr = load(prev_path), load(curr_path)
        if prev is None or curr is None:
            print("one of the given bench files has no parsed result")
            return 1
    else:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        usable = [(p, load(p)) for p in _round_files(root)]
        usable = [(p, d) for p, d in usable if d is not None]
        if len(usable) < 2:
            print(f"only {len(usable)} usable bench file(s) — nothing to compare")
            return 0
        (prev_path, prev), (curr_path, curr) = usable[-2], usable[-1]

    print(
        f"{os.path.basename(prev_path)} {prev['value']}s -> "
        f"{os.path.basename(curr_path)} {curr['value']}s "
        f"({curr['value'] / prev['value']:.2f}x)"
    )
    regressions = []
    for name, t_curr in sorted(curr.get("queries", {}).items()):
        t_prev = prev.get("queries", {}).get(name)
        if t_prev is None or t_prev < MIN_BASE_SEC:
            continue
        ratio = t_curr / t_prev
        flag = " <-- REGRESSION" if ratio > REGRESSION_X else ""
        if ratio > REGRESSION_X or ratio < 1 / REGRESSION_X:
            print(f"  {name}: {t_prev}s -> {t_curr}s ({ratio:.2f}x){flag}")
        if ratio > REGRESSION_X:
            regressions.append(name)
    if regressions:
        print(f"{len(regressions)} quer{'y' if len(regressions) == 1 else 'ies'} regressed >{REGRESSION_X}x: {regressions}")
        return 1
    print("no per-query regression")
    return 0


if __name__ == "__main__":
    sys.exit(main())

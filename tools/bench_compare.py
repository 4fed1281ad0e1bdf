"""Round-over-round bench guard.

Compares the newest two BENCH_r*.json at the repo root (or two paths
given as args) per query and exits non-zero when any query regressed
more than REGRESSION_X vs the previous round — so an edit that slows
one plan 2x can't hide inside a flat suite total. Usage:

    python tools/bench_compare.py [prev.json curr.json]
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


def _round_files(root: str) -> list[str]:
    def round_no(p: str) -> int:
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        return int(m.group(1)) if m else -1

    return sorted(glob.glob(os.path.join(root, "BENCH_r*.json")), key=round_no)


def main() -> int:
    def load(path: str) -> dict | None:
        with open(path) as f:
            d = json.load(f)
        # driver-recorded BENCH_r*.json wraps bench.py's line in "parsed";
        # a crashed round records "parsed": null — unusable for comparison
        p = d.get("parsed", d)
        return p if isinstance(p, dict) and "value" in p else None

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

"""Compare two BENCH_detail.json files per-query (round-16 closing tool).

Usage: python -m tools.bench_compare <before.json> <after.json> [threshold]
Prints regressions/improvements beyond the threshold ratio and the
geomean ratio over common queries.
"""

import json
import math
import sys


def main() -> int:
    before = json.load(open(sys.argv[1]))["queries"]
    after = json.load(open(sys.argv[2]))["queries"]
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    common = sorted(set(before) & set(after))
    rows = [(after[k] / before[k], before[k], after[k], k) for k in common if before[k] > 0]
    rows.sort(reverse=True)
    print(f"common={len(common)} only_before={sorted(set(before)-set(after))} "
          f"only_after={sorted(set(after)-set(before))}")
    print(f"total before={sum(before.values()):.1f} after={sum(after.values()):.1f}")
    g = math.exp(sum(math.log(r) for r, *_ in rows) / len(rows))
    print(f"geomean after/before = {g:.3f}")
    print(f"-- slower than {thr}x:")
    for r, a, b, k in rows:
        if r >= thr:
            print(f"  {r:5.2f}x  {a:6.2f} -> {b:6.2f}  {k}")
    print(f"-- faster than {1/thr:.2f}x:")
    for r, a, b, k in reversed(rows):
        if r <= 1 / thr:
            print(f"  {r:5.2f}x  {a:6.2f} -> {b:6.2f}  {k}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

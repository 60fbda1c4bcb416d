"""Compare two BENCH_local json files on their common query set.

    python scripts/bench_compare.py BENCH_local_r6.json BENCH_local.json

Prints total/median warm ratios and the biggest movers both ways —
the per-round regression check the honest clearCache policy makes
meaningful (r6 ADVICE: same-policy anchors only).
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    old_p, new_p = sys.argv[1], sys.argv[2]
    old = json.load(open(old_p))["queries"]
    new = json.load(open(new_p))["queries"]
    common = sorted(set(old) & set(new))
    pairs = [(n, old[n], new[n]) for n in common if old[n] and new[n]]
    tot_old = sum(o for _, o, _ in pairs)
    tot_new = sum(w for _, _, w in pairs)
    ratios = sorted((w / o, n, o, w) for n, o, w in pairs)
    med = ratios[len(ratios) // 2][0]
    print(
        f"{len(pairs)} common queries: total {tot_old:.1f}s -> "
        f"{tot_new:.1f}s ({tot_new / tot_old:.2f}x), median ratio "
        f"{med:.2f}x"
    )
    print("\nbiggest improvements:")
    for r, n, o, w in ratios[:10]:
        print(f"  {r:5.2f}x  {o:6.2f} -> {w:6.2f}  {n}")
    print("\nbiggest regressions:")
    for r, n, o, w in ratios[-10:][::-1]:
        print(f"  {r:5.2f}x  {o:6.2f} -> {w:6.2f}  {n}")


if __name__ == "__main__":
    main()

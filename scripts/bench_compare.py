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
    old_doc, new_doc = json.load(open(old_p)), json.load(open(new_p))
    old, new = old_doc["queries"], new_doc["queries"]
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

    # warm-sample spread (r7 judge item 3): a query whose two
    # temporally-separated warm samples disagree by >1.3x is
    # noise-suspect — its ratio above should not be read as a real
    # plan change without a re-run
    sp = new_doc.get("warm_spread") or {}
    noisy = sorted(
        ((s, n) for n, s in sp.items() if s > 1.3), reverse=True
    )
    if sp:
        med_sp = sorted(sp.values())[len(sp) // 2]
        print(
            f"\nwarm spread (new anchor): median {med_sp:.2f}x, "
            f"{len(noisy)} quer{'y' if len(noisy) == 1 else 'ies'} "
            f"above 1.3x"
        )
        for s, n in noisy[:10]:
            print(f"  {s:5.2f}x  {n}")


if __name__ == "__main__":
    main()

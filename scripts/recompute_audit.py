"""Flag queries whose plans scan the same big table many times.

A DataFrame consumed by several downstream branches re-executes its whole
lineage per branch unless persisted (or deduplicated by Spark's
ReuseExchange). This audit counts LIVE "Scan parquet" nodes per big table
in each registered query's physical plan, skipping subtrees that do NOT
re-execute:

- InMemoryRelation: its toString embeds the (already cached) build plan
- ReusedExchange: points at another subtree's output

Caveat: persist() is invisible at plan-construction time (the cache
substitution happens once materialized), so queries that persist inside
the function still show their full lineage here — check the source for
`.persist()` before treating a flag as real. Everything >= the threshold
without a persist is a candidate for one (persist the REDUCED
multi-branch intermediate, not the raw scan).

Usage: python scripts/recompute_audit.py [min_scans] [name_filter...]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

from arkflow_spark.queries import QUERIES
from arkflow_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.01"
BIG = ("lineitem", "events", "documents", "embeddings", "orders")


def _depth(line: str) -> int:
    return len(re.match(r"^[\s:+\-|]*", line).group(0))


def live_scans(plan: str, tables=BIG) -> dict[str, int]:
    counts = dict.fromkeys(tables, 0)
    skip_until = None
    for line in plan.splitlines():
        d = _depth(line)
        if skip_until is not None:
            if d > skip_until:
                continue
            skip_until = None
        if "InMemoryRelation" in line or "ReusedExchange" in line:
            skip_until = d
            continue
        if "Scan parquet" in line:
            for t in tables:
                if t in line:
                    counts[t] += 1
    return counts


def main() -> int:
    argv = sys.argv[1:]
    threshold = int(argv[0]) if argv else 3
    filters = argv[1:]
    spark = get_spark("recompute-audit")
    rows = []
    for name, fn in sorted(QUERIES.items()):
        if filters and not any(f in name for f in filters):
            continue
        # bound cached-storage accumulation across the 539-query sweep
        # (r5 ADVICE) — constructing a query may persist intermediates
        spark.catalog.clearCache()
        try:
            plan = (
                fn(spark, SF_DIR)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as e:  # noqa: BLE001 - report and move on
            print(f"ERR  {name}: {type(e).__name__}")
            continue
        c = live_scans(plan)
        worst = max(c.values())
        if worst >= threshold:
            rows.append(
                (worst, name, {k: v for k, v in c.items() if v >= threshold})
            )
    rows.sort(reverse=True)
    for w, n, c in rows:
        print(f"{w}x  {n}  {c}")
    print(f"{len(rows)} queries with >={threshold} live scans of one table")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

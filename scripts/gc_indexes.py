"""Garbage-collect orphaned materialized-index directories.

Index tables are session-addressed (``functions/indexes.py`` keys each
name by applicationId), so every new session materializes fresh
bucketed tables while the previous session's directories linger in the
shared ``spark.sql.warehouse.dir`` forever — nothing drops them because
a fresh session's in-memory catalog never sees them (r6 ADVICE).

This script deletes warehouse directories matching the known index
prefixes. It is an EXPLICIT cleanup (run between sessions / from cron)
rather than an automatic startup sweep because two concurrent sessions
legitimately share the warehouse directory — an automatic sweep from
session B would yank session A's live index out from under a running
scan, the exact race session-addressing was introduced to prevent.

    python scripts/gc_indexes.py [warehouse_dir]   # default: ./spark-warehouse
    python scripts/gc_indexes.py --dry-run

A production deployment with a real metastore would instead
content-address indexes by dataset version and expire them with normal
table-retention policy; this script is the local-mode equivalent.
"""

from __future__ import annotations

import re
import shutil
import sys
from pathlib import Path

# one entry per index family registered in functions/indexes.py callers;
# tests/test_indexes_gc.py asserts this list covers every
# index_table_name() call site so a new family can't silently leak
INDEX_PREFIXES = (
    "_cl_closed_b",   # triangle-closure closed-edge set (r8)
    "_cp_und_b",      # shared co-purchase undirected edge index
    "_ivf_assign_b",  # IVF coarse assignment
    "_lp_edges_b",    # label-prop bucketed edges
    "_lp_nodes_b",    # label-prop bucketed nodes
    "_lp_labels_b",   # materialized component labels (r7)
    "_mh_sig_b",      # MinHash signature table (r7)
    "_shingles_b",    # 3-gram shingle staging
)

_PAT = re.compile(
    "^(" + "|".join(re.escape(p) for p in INDEX_PREFIXES) + r")_[0-9a-f]{12}$"
)


def gc(warehouse: str, dry_run: bool = False) -> list[str]:
    root = Path(warehouse)
    if not root.is_dir():
        return []
    removed = []
    for child in sorted(root.iterdir()):
        if child.is_dir() and _PAT.match(child.name):
            removed.append(child.name)
            if not dry_run:
                shutil.rmtree(child, ignore_errors=True)
    return removed


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--dry-run"]
    dry = "--dry-run" in sys.argv[1:]
    warehouse = args[0] if args else "spark-warehouse"
    removed = gc(warehouse, dry_run=dry)
    verb = "would remove" if dry else "removed"
    print(f"{verb} {len(removed)} index dir(s) under {warehouse}")
    for name in removed:
        print(f"  {name}")


if __name__ == "__main__":
    main()

"""GC coverage for session-addressed index directories (r6 ADVICE)."""

from __future__ import annotations

import re
import subprocess
from pathlib import Path

from scripts.gc_indexes import INDEX_PREFIXES, gc

REPO = Path(__file__).resolve().parent.parent


def _call_site_prefixes() -> set[str]:
    """Every literal prefix passed to index_table_name() in the package."""
    out = subprocess.run(
        ["grep", "-rhn", "index_table_name(", str(REPO / "arkflow_spark")],
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    found = set()
    for line in out.splitlines():
        m = re.search(r'"(_[a-z_]+)"', line)
        if m:
            found.add(m.group(1))
    return found


def test_gc_prefix_list_covers_all_call_sites():
    """A new index family must be added to scripts/gc_indexes.py or its
    directories leak forever (the r6 ADVICE failure mode)."""
    missing = _call_site_prefixes() - set(INDEX_PREFIXES)
    assert not missing, (
        f"index prefixes not covered by scripts/gc_indexes.py: {missing}"
    )


def test_gc_removes_only_index_dirs(tmp_path):
    (tmp_path / "_ivf_assign_b_0123456789ab").mkdir()
    (tmp_path / "_shingles_b_deadbeef0000").mkdir()
    (tmp_path / "user_table").mkdir()  # not an index — must survive
    (tmp_path / "_ivf_assign_b_notahexhash!").mkdir()  # wrong shape
    removed = gc(str(tmp_path))
    assert sorted(removed) == [
        "_ivf_assign_b_0123456789ab",
        "_shingles_b_deadbeef0000",
    ]
    assert (tmp_path / "user_table").is_dir()
    assert (tmp_path / "_ivf_assign_b_notahexhash!").is_dir()
    assert not (tmp_path / "_shingles_b_deadbeef0000").exists()


def test_gc_dry_run_touches_nothing(tmp_path):
    (tmp_path / "_lp_edges_b_aaaaaaaaaaaa").mkdir()
    removed = gc(str(tmp_path), dry_run=True)
    assert removed == ["_lp_edges_b_aaaaaaaaaaaa"]
    assert (tmp_path / "_lp_edges_b_aaaaaaaaaaaa").is_dir()

"""Time + plan-capture harness for the optimization rounds.

    python scripts/profile_queries.py [--plans-dir plans/r08] [--suffix before]
        [--reps 2] name [name ...]

For each named query: clearCache, run once cold, then `--reps` timed warm
runs (min reported — the bench's steady-state policy), and write
`{plans_dir}/{name}_{suffix}.txt` with the `.explain("formatted")` output.
Timing uses the same `.collect()` action as bench.py so numbers are
comparable with the committed anchors.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from arkflow_spark.queries import QUERIES
from arkflow_spark.session import get_spark


def main() -> None:
    argv = sys.argv[1:]
    plans_dir = None
    suffix = "before"
    reps = 2
    names = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--plans-dir":
            plans_dir = argv[i + 1]
            i += 2
        elif a == "--suffix":
            suffix = argv[i + 1]
            i += 2
        elif a == "--reps":
            reps = int(argv[i + 1])
            i += 2
        elif a == "--plans-only":
            reps = -1
            i += 1
        else:
            names.append(a)
            i += 1
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile-queries")
    QUERIES["q1_pricing_summary"](spark, sf_dir).collect()  # JVM warm-up
    for name in names:
        spark.sparkContext.setJobDescription(f"profile: {name}")
        if reps < 0:  # --plans-only: no timed runs
            _write_plan(spark, sf_dir, name, plans_dir, suffix)
            print(f"{name}: plan written", flush=True)
            continue
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).collect()
        cold = time.perf_counter() - t0
        warms = []
        n_jobs = 0
        for rep in range(reps):
            spark.catalog.clearCache()
            group = f"profile-{name}-{rep}"
            spark.sparkContext.setJobGroup(group, name)
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).collect()
            warms.append(time.perf_counter() - t0)
            n_jobs = len(
                spark.sparkContext.statusTracker().getJobIdsForGroup(group)
            )
            spark.sparkContext.setJobGroup("", "")
        print(
            f"{name}: cold={cold:.2f}s warm={min(warms):.2f}s jobs={n_jobs} "
            f"(all: {', '.join(f'{w:.2f}' for w in warms)})",
            flush=True,
        )
        if plans_dir:
            _write_plan(spark, sf_dir, name, plans_dir, suffix)
    spark.sparkContext.setJobDescription(None)


def _write_plan(spark, sf_dir: str, name: str, plans_dir, suffix: str) -> None:
    import os

    if not plans_dir:
        return
    os.makedirs(plans_dir, exist_ok=True)
    spark.catalog.clearCache()
    df = QUERIES[name](spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    with open(os.path.join(plans_dir, f"{name}_{suffix}.txt"), "w") as fh:
        fh.write(plan)


if __name__ == "__main__":
    main()

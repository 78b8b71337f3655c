#!/usr/bin/env python
"""Time named registry queries against an arbitrary repo tree (VERDICT
r11 #3: interleaved old-tree/new-tree quiet min-of-N on the two
possibly-regressed queries). Bench methodology: one warm run, then N
timed count() runs, min reported, loadavg per measurement.

    python tools/time_query_r12.py <repo_root> <q1,q2,...> [reps]

The repo_root's package is imported (sys.path injection), so the same
script measures a git worktree of any older commit.
"""

from __future__ import annotations

import os
import sys
import time


def main() -> None:
    repo = os.path.abspath(sys.argv[1])
    names = sys.argv[2].split(",")
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    sys.path.insert(0, repo)
    from apache_iceberg_exploration_spark import registry
    from apache_iceberg_exploration_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="time_query_r12", cpus=32)
    queries = registry.all_queries()
    queries["gold_customer_agg"](spark, sf_dir).count()  # JVM warmup
    out = {}
    for name in names:
        fn = queries[name]
        fn(spark, sf_dir).count()  # per-query warm
        best = float("inf")
        runs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            runs.append(round(dt, 3))
            best = min(best, dt)
        out[name] = best
        print(
            f"TIMED {repo} {name} min={best:.3f} runs={runs} "
            f"load={os.getloadavg()[0]:.2f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()

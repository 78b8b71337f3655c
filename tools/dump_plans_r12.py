#!/usr/bin/env python
"""Dump .explain('formatted') for the r12-touched queries from a given
tree into plans/r12/<query>_<suffix>.txt (deliverable contract).

    python tools/dump_plans_r12.py <repo_root> <suffix>

Note (same caveat as r11's max_concurrent dumps): these queries return
localCheckpoint-pinned results, so the dumped plan is the pinned scan —
the optimization evidence lives in commit counts, job counts and the
committed A/B timings; the dumps are included for the contract.
"""

from __future__ import annotations

import os
import sys

repo = os.path.abspath(sys.argv[1])
suffix = sys.argv[2]
sys.path.insert(0, repo)

from apache_iceberg_exploration_spark import registry  # noqa: E402
from apache_iceberg_exploration_spark.session import get_spark  # noqa: E402

QUERIES = [
    "lakehouse_mv_minmax_group_recompute",
    "lakehouse_mv_join_two_delta_refresh",
    "lakehouse_mv_filtered_avg_refresh",
    "lakehouse_materialized_view_incremental",
    "streaming_upsert_mv_composition",
    "streaming_lakehouse_roundtrip_pipeline",
]

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    "r12",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="dump_plans_r12", cpus=32)
    qs = registry.all_queries()
    os.makedirs(OUT, exist_ok=True)
    for name in QUERIES:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(OUT, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print("dumped", name, suffix, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

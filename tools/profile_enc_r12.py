#!/usr/bin/env python
"""Phase-level profile of the two encrypted mutation-chain queries
(VERDICT r11 #8 context: are the 3.5-5.4 s costs per-phase floors or a
reducible planning hotspot?). Times each mutation phase of the pme and
envelope chains at sf0.1 plus cProfile of the whole chain, driver-side.

Run quiet: python tools/profile_enc_r12.py [pme|env] [reps]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from apache_iceberg_exploration_spark.session import get_spark  # noqa: E402
from apache_iceberg_exploration_spark.sources.io import load_table  # noqa: E402
from apache_iceberg_exploration_spark.sources.lakehouse import (  # noqa: E402
    LakehouseTable,
)

_KEY = bytes(range(32))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_chain(spark, mode: str) -> dict:
    root = tempfile.mkdtemp(prefix=f"prof_{mode}_", dir="/tmp")
    phases: dict[str, float] = {}

    def ph(name):
        class _T:
            def __enter__(self):
                self.t0 = time.perf_counter()

            def __exit__(self, *a):
                phases[name] = phases.get(name, 0.0) + (
                    time.perf_counter() - self.t0
                )

        return _T()

    t = LakehouseTable(spark, root + "/t", encryption_key=_KEY)
    with ph("enable"):
        t.enable_encryption(_KEY, mode=mode)
    src = load_table(spark, SF_DIR, "customer").select(
        F.col("c_custkey").alias("k"),
        F.col("c_nationkey").alias("nat"),
        F.floor(F.col("c_acctbal") * 100 + 0.5).cast("long").alias("cents"),
        F.col("c_mktsegment").alias("seg"),
        F.col("c_name").alias("nm"),
    )
    with ph("append"):
        t.append(src.repartition(4, "k"))
    with ph("mor_delete"):
        t.delete_where_mor(F.col("k") % 5 == 2, keys=["k"])
    with ph("dv_delete"):
        t.delete_where_dv(F.col("k") % 17 == 3)
    with ph("cow_update"):
        t.update_where(F.col("k") % 19 == 4, {"cents": F.col("cents") + 11})
    with ph("rotate"):
        t.rotate_table_key(bytes(range(132, 164)), "k2")
    with ph("compaction"):
        t.rewrite_data_files(target_file_count=4)
    with ph("read_agg"):
        (
            t.read()
            .select("nat", "cents")
            .groupBy("nat")
            .agg(F.count("*").alias("n"), F.sum("cents").alias("s"))
            .localCheckpoint(eager=True)
        )
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    return phases


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "pme"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="profile_enc_r12", cpus=32)
    run_chain(spark, mode)  # warm
    best: dict[str, float] = {}
    for i in range(reps):
        phases = run_chain(spark, mode)
        tot = sum(phases.values())
        print(
            f"rep {i}: total={tot:.2f}s load={os.getloadavg()[0]:.2f} "
            + " ".join(f"{k}={v:.2f}" for k, v in phases.items()),
            flush=True,
        )
        for k, v in phases.items():
            best[k] = min(best.get(k, 1e9), v)
    print(
        "MIN per phase: "
        + " ".join(f"{k}={v:.2f}" for k, v in best.items())
        + f"  sum={sum(best.values()):.2f}"
    )
    # one cProfile pass over the driver side
    import cProfile
    import pstats

    pr = cProfile.Profile()
    pr.enable()
    run_chain(spark, mode)
    pr.disable()
    st = pstats.Stats(pr)
    st.sort_stats("cumulative")
    st.print_stats(25)
    spark.stop()


if __name__ == "__main__":
    main()

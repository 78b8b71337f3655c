#!/usr/bin/env python
"""Streaming fixed-cost forensics (VERDICT r11 #4): prove where the
~1.5 s query startup and ~0.6 s/batch sink commit go — engine code or
Spark-internal machinery — with per-batch engine progress metrics, the
engine-side commit()'s own wall time, and driver JVM thread dumps
taken mid-drain.

Method: one `_drain_commits`-shaped upsert drain over N tiny source
commits; we record
  - per-batch StreamingQueryProgress durationMs (triggerExecution,
    addBatch, commitOffsets, ...),
  - the lakehouse commit's own duration (mtime delta between the sink's
    manifest link and the engine commit-log file),
  - 2 jstack dumps of the driver JVM while batches run (search for
    PythonStreamingSinkCommitRunner / process-spawn frames).

Run quiet: `python tools/streaming_floor_r12.py [n_commits]`.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import Row  # noqa: E402

from apache_iceberg_exploration_spark.session import get_spark  # noqa: E402
from apache_iceberg_exploration_spark.sources.lakehouse import (  # noqa: E402
    LakehouseTable,
)
from apache_iceberg_exploration_spark.operators.upsert import (  # noqa: E402
    _await_commit,
    _start_drain,
)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    spark = get_spark(app_name="streaming_floor_r12", cpus=32)
    root = tempfile.mkdtemp(prefix="floor_", dir="/tmp")
    src = LakehouseTable(spark, root + "/src")
    for i in range(n):
        src.append(
            spark.createDataFrame(
                [Row(k=j, v=i) for j in range(100)]
            ).repartition(1)
        )
    jvm_pid = None
    try:
        out = subprocess.check_output(
            ["pgrep", "-f", "SparkSubmit"], text=True
        )
        jvm_pid = int(out.split()[0])
    except Exception:
        pass
    t0 = time.perf_counter()
    q, cdir, base = _start_drain(
        spark,
        root + "/src",
        root + "/dst",
        root + "/cp",
        mode="upsert",
        upsertKeys="k",
    )
    dumps = 0
    try:
        # dump the driver twice while the drain runs
        while not os.path.exists(os.path.join(cdir, str(base + n - 1))):
            if jvm_pid and dumps < 2 and os.path.exists(
                os.path.join(cdir, str(base))
            ):
                with open(f"/tmp/floor_jstack_{dumps}.txt", "w") as f:
                    subprocess.run(
                        ["jstack", str(jvm_pid)], stdout=f, check=False
                    )
                dumps += 1
            time.sleep(0.05)
        _await_commit(q, cdir, base + n - 1, 120)
        total = time.perf_counter() - t0
        print(f"drain total {total:.2f}s for {n} batches (incl. startup)")
        for p in q.recentProgress:
            if not isinstance(p, dict):
                p = json.loads(p.json)  # StreamingQueryProgress object
            print("batch", p.get("batchId"), json.dumps(p.get("durationMs", {})))
    finally:
        try:
            q.stop()
        except Exception:
            pass
    # engine commit duration: manifest mtime vs engine commit-log mtime
    dst = LakehouseTable(spark, root + "/dst")
    for v in range(1, dst.current_version() + 1):
        mpath = dst._manifest_path(v)
        cpath = os.path.join(cdir, str(base + v - 1))
        if os.path.exists(mpath) and os.path.exists(cpath):
            print(
                f"batch {v-1}: engine-commit-log mtime - manifest mtime "
                f"= {os.path.getmtime(cpath) - os.path.getmtime(mpath):.3f}s"
            )
    # scan the dumps for the commit-runner frames
    for i in range(dumps):
        path = f"/tmp/floor_jstack_{i}.txt"
        hits = []
        try:
            with open(path) as f:
                for line in f:
                    if (
                        "PythonStreamingSinkCommitRunner" in line
                        or "PythonWorkerFactory" in line
                        or "PythonMicroBatchStream" in line
                        or "PythonStreamingSourceRunner" in line
                        or "ProcessBuilder" in line
                        or "UnixProcess" in line
                    ):
                        hits.append(line.rstrip())
        except OSError:
            continue
        print(f"--- jstack {i}: {len(hits)} runner/spawn frames ---")
        for h in hits[:20]:
            print(h)
    spark.stop()


if __name__ == "__main__":
    main()

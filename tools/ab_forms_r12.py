#!/usr/bin/env python
"""Interleaved A/B of the r11 single-pass rewrites vs their pre-r11
forms (VERDICT r11 #5: the doc's claimed wins were contradicted by the
committed bench records — settle with a quiet, same-session,
alternating min-of-N).

Forms under test:

- max_concurrent_sessions_sweep: NEW = one events pass via
  explode(array(struct +1, struct -1)) with the interval count riding
  the pinned edge aggregate; OLD = union-of-two-selects (two events
  scans) + a separate iv.count() third scan.
- percentile_sketch_bounds_eval head: NEW = count(*) folded into the
  percentile_approx aggregate (one lineitem pass); OLD = separate
  li.count() + sketch aggregate (two passes).

Run on a QUIET host: `python tools/ab_forms_r12.py [rounds]`.
Prints per-round wall times and the min-of-N verdict, plus os.getloadavg
per measurement so the record is adjudicable.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from apache_iceberg_exploration_spark.session import get_spark  # noqa: E402
from apache_iceberg_exploration_spark.sources.io import load_table  # noqa: E402
from apache_iceberg_exploration_spark.functions.ranking import (  # noqa: E402
    with_global_cumsum_static,
    with_global_rank_static,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PCT_BP = (5000, 9000, 9900)
PCT_ACCURACY = 10000


def sweep_core(spark, per_t, n_intervals):
    curve = with_global_cumsum_static(
        per_t,
        F.expr("t div 2592000000000").cast("long"),
        ["t"],
        "net",
        "conc",
    )
    peak = curve.agg(F.max("conc").alias("m")).first()["m"]
    out = curve.filter(F.col("conc") == peak).agg(
        F.lit(int(peak)).cast("long").alias("peak_concurrency"),
        F.min("t").cast("long").alias("first_peak_us"),
        F.lit(n_intervals).cast("long").alias("n_intervals"),
    )
    return out


def sweep_new(spark):
    ev = load_table(spark, SF_DIR, "events")
    s_us = F.unix_micros("ts")
    e_us = F.unix_micros(F.col("ts") + F.expr("INTERVAL 30 MINUTE"))
    edges = ev.select(
        F.explode(
            F.array(
                F.struct(s_us.alias("t"), F.lit(1).alias("d")),
                F.struct(e_us.alias("t"), F.lit(-1).alias("d")),
            )
        ).alias("x")
    ).select("x.t", "x.d")
    per_t = (
        edges.groupBy("t")
        .agg(
            F.sum("d").cast("long").alias("net"),
            F.sum(F.when(F.col("d") == 1, 1).otherwise(0))
            .cast("long")
            .alias("__opens"),
        )
        .localCheckpoint()
    )
    n_intervals = per_t.agg(F.sum("__opens")).first()[0]
    return sweep_core(spark, per_t.drop("__opens"), n_intervals)


def sweep_old(spark):
    ev = load_table(spark, SF_DIR, "events")
    iv = ev.select(
        F.unix_micros("ts").alias("s"),
        F.unix_micros(
            F.col("ts") + F.expr("INTERVAL 30 MINUTE")
        ).alias("e"),
    )
    edges = iv.select(
        F.col("s").alias("t"), F.lit(1).alias("d")
    ).unionAll(iv.select(F.col("e").alias("t"), F.lit(-1).alias("d")))
    per_t = (
        edges.groupBy("t")
        .agg(F.sum("d").cast("long").alias("net"))
        .localCheckpoint()
    )
    n_intervals = iv.count()
    return sweep_core(spark, per_t, n_intervals)


def pct_tail(spark, li, n, approx):
    err = -(-n // PCT_ACCURACY)
    targets = {}
    for p in PCT_BP:
        r = (n * p + 9999) // 10000
        targets[p] = (max(1, r - err), r, min(n, r + err))
    wanted = sorted({r for t in targets.values() for r in t})
    ranked = with_global_rank_static(
        li, F.expr("cents div 10000").cast("long"), ["cents"], "rn"
    )
    vals = {
        r["rn"]: r["cents"]
        for r in ranked.filter(F.col("rn").isin(wanted)).collect()
    }
    rows = []
    for (p, (lo_r, r, hi_r)), a in zip(sorted(targets.items()), approx):
        rows.append(
            (p, int(vals[r]), bool(vals[lo_r] <= a <= vals[hi_r]))
        )
    return spark.createDataFrame(
        rows, "p_bp int, exact_cents long, within_bounds boolean"
    )


def pct_new(spark):
    li = load_table(spark, SF_DIR, "lineitem").select(
        F.floor(F.col("l_extendedprice") * 100 + 0.5)
        .cast("long")
        .alias("cents")
    )
    head = li.agg(
        F.count("*").alias("n"),
        F.percentile_approx(
            "cents", [p / 10000 for p in PCT_BP], PCT_ACCURACY
        ).alias("a"),
    ).first()
    return pct_tail(spark, li, head["n"], head["a"])


def pct_old(spark):
    li = load_table(spark, SF_DIR, "lineitem").select(
        F.floor(F.col("l_extendedprice") * 100 + 0.5)
        .cast("long")
        .alias("cents")
    )
    n = li.count()
    approx = li.agg(
        F.percentile_approx(
            "cents", [p / 10000 for p in PCT_BP], PCT_ACCURACY
        ).alias("a")
    ).first()["a"]
    return pct_tail(spark, li, n, approx)


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark(app_name="ab_forms_r12", cpus=32)
    forms = {
        "sweep_new": sweep_new,
        "sweep_old": sweep_old,
        "pct_new": pct_new,
        "pct_old": pct_old,
    }
    # warm everything once (codegen, parquet footers)
    for fn in forms.values():
        fn(spark).count()
    times: dict[str, list[float]] = {k: [] for k in forms}
    for i in range(rounds):
        for name, fn in forms.items():
            t0 = time.perf_counter()
            fn(spark).count()
            dt = time.perf_counter() - t0
            times[name].append(dt)
            print(
                f"round {i} {name:10s} {dt:6.3f}s "
                f"load={os.getloadavg()[0]:.2f}",
                flush=True,
            )
    print("--- min-of-%d ---" % rounds)
    for name, ts in times.items():
        print(f"{name:10s} min={min(ts):6.3f} all={[round(t,3) for t in ts]}")
    spark.stop()


if __name__ == "__main__":
    main()

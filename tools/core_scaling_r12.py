#!/usr/bin/env python
"""Core-scaling evidence at a data-bound SF (VERDICT r11 #7): at sf0.1
every headline query is fixed-cost bound and 8 cores beat 32, so the
8v32 block cannot demonstrate parallel scaling. This harness runs a
DATA-BOUND headline subset at sf1 (tools/synth_scale.py output) at 32
and 8 cores in separate sessions and records the ratios.

    python tools/core_scaling_r12.py            # both core counts
    python tools/core_scaling_r12.py --one 8    # inner runner

Writes plans/r12/CORE_SCALING_SF1.json. NEVER run concurrently with
pytest or bench.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF1 = "/tmp/synthdata/sf1"

# compute-heavy at sf1 (BENCH_SCALING sf1 seconds in parens): pairwise
# dedup family incl. the declared-quadratic embedding pairs (14.0),
# basket lift (6.3), minhash bands (6.5), ngram jaccard (3.7),
# contamination (3.0), TPC-H agg/join shapes, tf-idf, geo knn window
# probes (9.0)
QUERIES = [
    "dedup_embedding_neardup_pairs",
    "dedup_minhash_lsh_pairs",
    "dedup_ngram_jaccard_pairs",
    "market_basket_lift_pairs",
    "contamination_ngram_overlap",
    "q18_large_volume_customers",
    "q1_pricing_summary",
    "q9_product_type_profit",
    "tfidf_top_terms",
    "lakehouse_geo_knn_window_probes",
]


def run_one(cpus: int) -> dict:
    from apache_iceberg_exploration_spark import registry
    from apache_iceberg_exploration_spark.session import get_spark

    spark = get_spark(app_name=f"core_scaling_{cpus}", cpus=cpus)
    queries = registry.all_queries()
    queries["gold_customer_agg"](spark, SF1).count()  # warmup
    out = {}
    for name in QUERIES:
        fn = queries[name]
        fn(spark, SF1).count()  # warm
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, SF1).count()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
        print(
            f"cpus={cpus} {name} {best:.3f}s "
            f"load={os.getloadavg()[0]:.2f}",
            flush=True,
        )
    spark.stop()
    return out


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--one":
        res = run_one(int(sys.argv[2]))
        print("RESULT_JSON " + json.dumps(res))
        return
    if not os.path.isdir(SF1):
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools/synth_scale.py")],
            check=True,
        )
    results = {}
    for cpus in (32, 8):
        p = subprocess.run(
            [sys.executable, __file__, "--one", str(cpus)],
            capture_output=True,
            text=True,
            check=True,
        )
        sys.stdout.write(p.stdout)
        line = [
            ln
            for ln in p.stdout.splitlines()
            if ln.startswith("RESULT_JSON ")
        ][-1]
        results[str(cpus)] = json.loads(line[len("RESULT_JSON "):])
    ratios = {
        q: round(results["8"][q] / results["32"][q], 2)
        for q in QUERIES
        if results["32"].get(q)
    }
    rec = {
        "sf_dir": SF1,
        "queries": QUERIES,
        "sec": results,
        "ratio_8_over_32": ratios,
        "note": (
            "min-of-2 steady-state per query per core count, separate "
            "sessions; sf1 synthesized by tools/synth_scale.py"
        ),
    }
    dest = os.path.join(REPO, "plans/r12/CORE_SCALING_SF1.json")
    with open(dest, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()

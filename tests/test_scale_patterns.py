"""Scale-pattern tests: bucketed shuffle-free joins, approximate-aggregate
error bounds, and the Iceberg-native path (gated on the runtime jar)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_iceberg_exploration_spark.operators.relational import (
    approx_distinct_users,
)
from apache_iceberg_exploration_spark.plans import executed_plan
from apache_iceberg_exploration_spark.session import _iceberg_jar_available
from apache_iceberg_exploration_spark.sources.io import load_table

from .conftest import SF_ORACLE


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """bucketBy(8, key) on both sides co-locates join keys at write time:
    the subsequent join plans SortMergeJoin with NO Exchange on either
    side — the pre-shuffled join that amortizes one shuffle across every
    future join on that key (the 100 TB fact-to-fact pattern)."""
    import uuid

    suffix = uuid.uuid4().hex[:8]
    t_orders, t_li = f"b_orders_{suffix}", f"b_lineitem_{suffix}"
    # disable broadcast so the join must pick a partitioned strategy —
    # the bucketing claim is about avoiding the EXCHANGE, not the join algo
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = load_table(spark, SF_ORACLE, "orders")
        li = load_table(spark, SF_ORACLE, "lineitem")
        orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(
            t_orders
        )
        li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(
            t_li
        )

        joined = (
            spark.table(t_li)
            .join(
                spark.table(t_orders),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
        )
        plan = executed_plan(joined)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan, plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan, plan
        # result parity with the unbucketed join
        expect = {
            r.o_orderstatus: r.n
            for r in li.join(
                orders, F.col("l_orderkey") == F.col("o_orderkey")
            )
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        got = {r.o_orderstatus: r.n for r in joined.collect()}
        assert got == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {t_orders}")
        spark.sql(f"DROP TABLE IF EXISTS {t_li}")


def test_approx_distinct_error_bound(spark):
    """approx_count_distinct(rsd=0.02) must land within ~3×rsd of exact;
    percentile_approx(p95) within the neighboring exact percentiles."""
    approx = {
        r.event_type: (r.approx_users, r.p95_value)
        for r in approx_distinct_users(spark, SF_ORACLE).collect()
    }
    ev = load_table(spark, SF_ORACLE, "events")
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for etype, n_exact in exact.items():
        n_approx = approx[etype][0]
        assert abs(n_approx - n_exact) <= max(3, 0.06 * n_exact), (
            etype,
            n_approx,
            n_exact,
        )
    p94, p96 = (
        ev.filter(F.col("event_type") == "click")
        .agg(
            F.percentile("value", F.lit(0.93)).alias("lo"),
            F.percentile("value", F.lit(0.97)).alias("hi"),
        )
        .first()
    )
    assert p94 <= approx["click"][1] <= p96


@pytest.mark.skipif(
    not _iceberg_jar_available(),
    reason="iceberg-spark-runtime jar not on the classpath in this "
    "container; session.get_spark wires the catalog automatically when "
    "it is (see session.py)",
)
def test_iceberg_native_roundtrip(spark):  # pragma: no cover
    """When the real Iceberg runtime is present: DDL + insert + read-back
    through the configured catalog (parity with etl.py:51-54)."""
    spark.sql("CREATE NAMESPACE IF NOT EXISTS my_catalog.bronze")
    spark.sql(
        "CREATE OR REPLACE TABLE my_catalog.bronze.smoke USING iceberg AS "
        "SELECT 1 AS id"
    )
    assert spark.table("my_catalog.bronze.smoke").count() == 1


def test_kmeans_cells_determinism_coverage_improvement(spark):
    """The compensating checks ann_kmeans_cells' docstring promises in
    lieu of an oracle: deterministic across runs, every vector assigned,
    exactly K cells, and the final assignment is at least as good as
    assigning to the initial centroids (Lloyd's monotonicity)."""
    from apache_iceberg_exploration_spark.functions.vectors import (
        cosine_similarity,
    )
    from apache_iceberg_exploration_spark.operators.similarity import (
        K_CELLS,
        ann_kmeans_cells,
    )

    a = ann_kmeans_cells(spark, SF_ORACLE).collect()
    b = ann_kmeans_cells(spark, SF_ORACLE).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # deterministic

    emb = load_table(spark, SF_ORACLE, "embeddings")
    n = emb.count()
    assert len(a) == n  # every vector assigned exactly once
    assert {r.cell for r in a} == set(range(K_CELLS))

    # Lloyd's improves (or matches) the init assignment: mean cos to the
    # final centroid >= mean cos to the best INITIAL centroid
    init = emb.orderBy("vec_id").limit(K_CELLS).select(
        F.col("embedding").alias("c")
    )
    cos = cosine_similarity(F.col("embedding"), F.col("c"))
    best_init = (
        emb.crossJoin(init)
        .groupBy("vec_id")
        .agg(F.max(cos).alias("best"))
        .agg(F.avg("best"))
        .first()[0]
    )
    final_mean = sum(r.cos_to_centroid for r in a) / len(a)
    assert final_mean >= best_init - 1e-6, (final_mean, best_init)


def test_sketch_rollup_merge_is_lossless_and_accurate(spark):
    """hll_union_agg over per-day partial sketches must give the SAME
    estimate as one direct sketch of the whole column (register-wise max
    is exact re-aggregation), and land within ~2% of the exact distinct."""
    from apache_iceberg_exploration_spark.operators.relational import (
        sketch_distinct_rollup,
    )

    rows = {r.day: r.est_users
            for r in sketch_distinct_rollup(spark, SF_ORACLE).collect()}
    merged = rows.pop("TOTAL")
    ev = load_table(spark, SF_ORACLE, "events")
    direct = ev.agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg("user_id", F.lit(12))).alias("est")
    ).first().est
    exact = ev.agg(F.countDistinct("user_id").alias("n")).first().n
    assert merged == direct                       # lossless merge
    assert abs(merged - exact) <= max(3, 0.05 * exact)
    assert len(rows) > 1 and all(v > 0 for v in rows.values())


def test_runtime_bloom_filter_prunes_probe_side(spark):
    """Runtime (adaptive) bloom-filter join reduction: when a selective
    filter sits on the build side of a shuffle join, Spark injects a
    bloom_filter_agg over the build keys and rewrites the probe side
    with might_contain(key) — fact rows that cannot join are dropped AT
    THE SCAN, before the shuffle. At 100 TB this is the semi-join
    reduction that turns a full-fact shuffle into a filtered one; the
    size thresholds are lowered here only because the test data is far
    below the defaults (10 GB probe / 10 MB build) that would trigger it
    on a real cluster. Results must be identical with and without."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_table(spark, SF_ORACLE, "lineitem")
        orders = load_table(spark, SF_ORACLE, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
        )
        plan = executed_plan(j)
        assert "might_contain" in plan  # probe-side semi-filter injected
        with_filter = j.collect()
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
    without = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert sorted(map(tuple, with_filter)) == sorted(map(tuple, without))


def test_aqe_skew_join_split_fires(spark):
    """SCALE.md's first-line answer to skewed join keys is AQE skew-join
    splitting (session.py turns it on) — this proves the machinery
    actually fires, not just that the conf is set.  A synthetically hot
    key (80% of a 200k-row fact on key 0, incompressible payload so the
    hot partition's SHUFFLE BYTES — what AQE measures — exceed the
    threshold) joined to a 51-row dim with broadcast disabled must
    execute as `SortMergeJoin(skew=true)` over an `AQEShuffleRead ...
    skewed` that splits the hot partition into several tasks.  The
    byte thresholds are lowered only because test data sits far below
    the 256 MB default that governs a real cluster; the
    detect-and-split logic exercised is identical.  Results must be
    row-identical to the non-adaptive plan."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "128KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    prev = {k: spark.conf.get(k) for k in confs}

    def q():
        big = (
            spark.range(0, 200_000)
            .withColumn(
                "k",
                F.when(F.col("id") % 10 < 8, F.lit(0)).otherwise(
                    (F.col("id") % 50) + 1
                ),
            )
            # md5 payload: shuffle sizes are post-compression, so a
            # constant payload would compress under any threshold
            .withColumn("pay", F.md5(F.col("id").cast("string")))
        )
        dim = spark.range(0, 51).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        return big.join(dim, "k").select("id", "k", "v", "pay")

    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        j = q()
        skewed = j.collect()
        plan = executed_plan(j)
        assert "SortMergeJoin(skew=true)" in plan
        assert "skewed" in plan  # AQEShuffleRead ... skewed
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
    plain = q().collect()
    assert sorted(map(tuple, skewed)) == sorted(map(tuple, plain))


def test_parquet_aggregate_pushdown_footer_only(spark):
    """MIN/MAX/COUNT over a bare parquet scan push into the source
    (DSv2 + spark.sql.parquet.aggregatePushdown): the 'PushedAggregation'
    plan answers from row-group footer statistics without materializing
    rows — a full-table count/min/max on 10^6 files becomes a
    footer-metadata job. Values must equal the unpushed plan's."""
    confs = {
        "spark.sql.parquet.aggregatePushdown": "true",
        "spark.sql.sources.useV1SourceList": "",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        agg = (
            spark.read.parquet(f"{SF_ORACLE}/orders.parquet")
            .agg(
                F.count("*").alias("n"),
                F.min("o_orderkey").alias("mn"),
                F.max("o_orderkey").alias("mx"),
            )
        )
        assert "PushedAggregation" in executed_plan(agg)
        pushed = agg.collect()
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
    plain = (
        spark.read.parquet(f"{SF_ORACLE}/orders.parquet")
        .agg(
            F.count("*").alias("n"),
            F.min("o_orderkey").alias("mn"),
            F.max("o_orderkey").alias("mx"),
        )
        .collect()
    )
    assert [tuple(r) for r in pushed] == [tuple(r) for r in plain]


def test_observe_metrics_piggyback_on_action(spark):
    """``df.observe``: pipeline health metrics (row counts, null counts,
    sums) accumulate DURING the normal action — no second scan. This is
    how a 100 TB ingest reports DQ counters for free instead of running
    dq_expectations_report as an extra pass."""
    from pyspark.sql import Observation

    obs = Observation("ingest_metrics")
    ev = load_table(spark, SF_ORACLE, "events").observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.sum(F.col("value")).alias("value_total"),
        F.count(F.when(F.col("user_id").isNull(), 1)).alias("null_users"),
    )
    out = ev.filter(F.col("event_type") == "purchase").count()
    m = obs.get
    assert m["rows_seen"] == 10_000  # metrics cover the FULL scan
    assert m["null_users"] == 0
    assert out < m["rows_seen"]


def test_holt_segmented_fold_composes_affinely():
    """The forecast_holt_linear_daily docstring claims long series can
    split into chunk folds composed exactly because Holt's update is
    affine in (level, trend). Proof: each step is
    [l', b']ᵀ = M·[l, b]ᵀ + v·y with constant M, v — so a chunk is one
    composed affine map, and composing two chunks' maps equals folding
    straight through. Verified numerically against the sequential fold
    on a 200-step series (agreement to 1e-9 relative — float op order
    differs, exactness is of the MAP, not the bits)."""
    import random

    alpha, beta = 0.4, 0.3

    def step(l, b, y):
        nl = alpha * y + (1 - alpha) * (l + b)
        nb = beta * (nl - l) + (1 - beta) * b
        return nl, nb

    # affine form of one step: state' = M @ state + v * y
    M = [
        [1 - alpha, 1 - alpha],
        [-alpha * beta, beta * (1 - alpha) + (1 - beta)],
    ]
    v = [alpha, alpha * beta]

    def mat_step(state, y):
        return (
            M[0][0] * state[0] + M[0][1] * state[1] + v[0] * y,
            M[1][0] * state[0] + M[1][1] * state[1] + v[1] * y,
        )

    rng = random.Random(3)
    ys = [rng.uniform(10, 100) for _ in range(200)]
    # sequential ground truth
    l, b = ys[0], 0.0
    for y in ys[1:]:
        l, b = step(l, b, y)
    # matrix form agrees step-for-step (the affine claim itself)
    l2, b2 = ys[0], 0.0
    for y in ys[1:]:
        l2, b2 = mat_step((l2, b2), y)
    assert abs(l - l2) < 1e-9 * abs(l) and abs(b - b2) < 1e-9 * abs(l)
    # segmented: fold chunk 2 as a COMPOSED affine map applied to the
    # end-state of chunk 1 (compose by folding the identity + basis —
    # three probe states recover the chunk's (A, c) exactly)
    half = 100
    mid_l, mid_b = ys[0], 0.0
    for y in ys[1:half]:
        mid_l, mid_b = step(mid_l, mid_b, y)

    def chunk_map(chunk):
        def run(state):
            s = state
            for y in chunk:
                s = mat_step(s, y)
            return s

        z = run((0.0, 0.0))
        e1 = run((1.0, 0.0))
        e2 = run((0.0, 1.0))
        A = [
            [e1[0] - z[0], e2[0] - z[0]],
            [e1[1] - z[1], e2[1] - z[1]],
        ]
        return A, z

    A, c = chunk_map(ys[half:])
    fin_l = A[0][0] * mid_l + A[0][1] * mid_b + c[0]
    fin_b = A[1][0] * mid_l + A[1][1] * mid_b + c[1]
    assert abs(fin_l - l) < 1e-9 * abs(l)
    assert abs(fin_b - b) < 1e-9 * max(abs(b), 1.0)

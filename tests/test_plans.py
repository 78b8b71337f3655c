"""Plan-shape assertions: pushdown, pruning, broadcast — the scale
contract (would this plan survive 100 TB?) checked mechanically."""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_iceberg_exploration_spark.operators.medallion import (
    incremental_extract_events,
)
from apache_iceberg_exploration_spark.operators.relational import (
    q1_pricing_summary,
    q3_shipping_priority,
    q5_local_supplier_volume,
)
from apache_iceberg_exploration_spark.plans import (
    executed_plan,
    has_broadcast_join,
    pushed_filters,
    read_schema_columns,
)
from apache_iceberg_exploration_spark.sources.io import load_table

from .conftest import SF_ORACLE


def test_incremental_watermark_pushes_to_scan(spark):
    df = incremental_extract_events(spark, SF_ORACLE)
    pf = " ".join(pushed_filters(df))
    assert "GreaterThan(ts" in pf, pf


def test_q1_filter_pushes_and_prunes(spark):
    df = q1_pricing_summary(spark, SF_ORACLE)
    pf = " ".join(pushed_filters(df))
    assert "LessThanOrEqual(l_shipdate" in pf, pf
    cols = read_schema_columns(df)
    li_cols = next(c for c in cols if "l_quantity" in c)
    # 7 needed columns, not all 11
    assert "l_orderkey" not in li_cols and "l_partkey" not in li_cols, li_cols


def test_q3_broadcasts_customer_dim(spark):
    assert has_broadcast_join(q3_shipping_priority(spark, SF_ORACLE))


def test_q5_broadcasts_small_dims(spark):
    assert has_broadcast_join(q5_local_supplier_volume(spark, SF_ORACLE))


def test_projection_prunes_scan(spark):
    df = load_table(spark, SF_ORACLE, "lineitem").select("l_orderkey").limit(5)
    cols = read_schema_columns(df)
    assert cols and cols[0] == {"l_orderkey"}, cols


def test_partitioned_write_enables_pruning(spark, tmp_path):
    """Writing bronze partitioned by a date-derived column lets readers
    prune entire partitions (the reference wrote everything unpartitioned,
    SURVEY.md §4)."""
    orders = load_table(spark, SF_ORACLE, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    out = str(tmp_path / "orders_part")
    orders.write.partitionBy("order_year").parquet(out)
    back = spark.read.parquet(out).filter(F.col("order_year") == 1996)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(order_year" in plan, plan
    assert back.count() == orders.filter(F.year("o_orderdate") == 1996).count()


def test_q9_broadcasts_dims_pushes_like(spark):
    """q9: LIKE reaches the part scan as StringContains; all three dims
    broadcast; lineitem-orders is the only shuffle pair."""
    from apache_iceberg_exploration_spark.operators.relational import (
        q9_product_type_profit,
    )
    from apache_iceberg_exploration_spark.plans.explain import shuffle_count

    df = q9_product_type_profit(spark, SF_ORACLE)
    assert has_broadcast_join(df)
    pf = " ".join(pushed_filters(df))
    assert "StringContains(p_name,rod)" in pf, pf
    assert shuffle_count(df) <= 2, shuffle_count(df)


def test_q2_aggregates_before_join(spark):
    """q2: the derived partsupp is reduced by aggregation before any join
    (2 shuffles total: the pre-aggregate and the window re-key), dims
    broadcast."""
    from apache_iceberg_exploration_spark.operators.relational import (
        q2_min_cost_supplier,
    )
    from apache_iceberg_exploration_spark.plans.explain import shuffle_count

    df = q2_min_cost_supplier(spark, SF_ORACLE)
    assert has_broadcast_join(df)
    assert shuffle_count(df) <= 2, shuffle_count(df)


def test_pack_chunks_windows_partition_by_bucket(spark):
    """Sequence packing must not run its cumsum in one task: the big-side
    window is partitioned by bucket; only the few-row bucket-offset branch
    may single-partition, and it joins back as a broadcast."""
    from apache_iceberg_exploration_spark.operators.training import (
        pack_concat_chunks,
    )
    from apache_iceberg_exploration_spark.plans import executed_plan

    df = pack_concat_chunks(spark, SF_ORACLE)
    plan = executed_plan(df)
    assert "windowspecdefinition(bucket" in plan
    assert plan.count("Exchange SinglePartition") <= 1, plan
    assert has_broadcast_join(df)


def test_training_samplers_single_shuffle(spark):
    """Stratified sampling, mixture counting, and shard shuffling are each
    one keyed exchange — no extra sorts/shuffles sneak in."""
    from apache_iceberg_exploration_spark.operators.training import (
        data_mixing_weighted,
        global_shuffle_shards,
        stratified_sample_per_lang,
    )
    from apache_iceberg_exploration_spark.plans.explain import shuffle_count

    for fn in (
        data_mixing_weighted,
        global_shuffle_shards,
        stratified_sample_per_lang,
    ):
        assert shuffle_count(fn(spark, SF_ORACLE)) == 1, fn.__name__


def test_contamination_broadcasts_benchmark_set(spark):
    """The benchmark shingle set joins as a broadcast — corpus shingles
    are never shuffled for the membership test."""
    from apache_iceberg_exploration_spark.operators.training import (
        contamination_ngram_overlap,
    )

    assert has_broadcast_join(contamination_ngram_overlap(spark, SF_ORACLE))


def test_lakehouse_partitioned_read_prunes_partitions(spark, tmp_path):
    """A partition-column predicate over a partitioned lakehouse table
    must surface as PartitionFilters on the scan (directories pruned
    before any file opens) — the behavior the basePath read restores."""
    from apache_iceberg_exploration_spark.sources.lakehouse import (
        LakehouseTable,
    )

    from .conftest import SF_SMOKE

    tbl = LakehouseTable(spark, str(tmp_path / "t"))
    tbl.overwrite(
        load_table(spark, SF_SMOKE, "customer"),
        partition_by=["c_mktsegment"],
    )
    df = tbl.read().filter(F.col("c_mktsegment") == "BUILDING")
    plan = executed_plan(df)
    assert "PartitionFilters: [isnotnull(c_mktsegment" in plan, plan[:2000]


def test_variant_extraction_stays_in_codegen(spark):
    """VARIANT parse+get compiles into the scan-side projection inside a
    WholeStageCodegen span — no Python boundary in the hot path."""
    from apache_iceberg_exploration_spark.operators.relational import (
        variant_props_analytics,
    )

    df = variant_props_analytics(spark, SF_ORACLE)
    plan = executed_plan(df)
    assert "variant_get" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # column pruning reaches the scan: only the two referenced columns
    cols = read_schema_columns(df)
    assert {"event_type", "props"} in cols, cols


def test_salted_join_shuffles_on_salted_key(spark):
    """skew_salted_join's merge hint must defeat the broadcast (salting a
    broadcast join would be pointless) and the shuffle key must include
    the salt — the whole point is spreading one hot key over 16
    reducers."""
    from apache_iceberg_exploration_spark.operators.relational import (
        skew_salted_join,
    )

    df = skew_salted_join(spark, SF_ORACLE)
    plan = executed_plan(df)
    assert "SortMergeJoin" in plan, plan[:1500]
    import re

    assert re.search(r"hashpartitioning\(event_type[^)]*_salt", plan), (
        "join shuffle not keyed by (event_type, _salt)"
    )


def test_pq_adc_broadcasts_lookup_tables(spark):
    """ann_pq_adc_topk: codebook and ADC table are broadcast (tiny), the
    corpus side never cartesian-joins, and no Python boundary exists."""
    from apache_iceberg_exploration_spark.operators.similarity import (
        ann_pq_adc_topk,
    )

    df = ann_pq_adc_topk(spark, SF_ORACLE)
    plan = executed_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_shuffle_budgets_flagship_queries(spark):
    """Pin the shuffle count of flagship plans — a regression that adds
    an exchange (lost broadcast, accidental repartition) fails here
    before it shows up as a 100 TB incident."""
    from apache_iceberg_exploration_spark.operators.medallion import (
        gold_customer_agg,
        latest_event_per_user,
    )
    from apache_iceberg_exploration_spark.operators.relational import (
        asof_join_purchase_to_click,
        q1_pricing_summary,
        q3_shipping_priority,
    )
    from apache_iceberg_exploration_spark.plans.explain import (
        shuffle_count,
    )

    budgets = {
        q1_pricing_summary: 1,        # partial+final agg
        gold_customer_agg: 1,
        q3_shipping_priority: 1,      # dims broadcast; one agg exchange
        asof_join_purchase_to_click: 1,  # one window shuffle on user_id
        latest_event_per_user: 1,
    }
    for fn, budget in budgets.items():
        n = shuffle_count(fn(spark, SF_ORACLE))
        assert n <= budget, f"{fn.__name__}: {n} shuffles > budget {budget}"


def test_sq_rerank_stays_broadcast_and_take_ordered(spark):
    """Two-stage SQ rerank: the query vector is broadcast (no shuffle of
    the corpus), both top-k stages plan as TakeOrderedAndProject (k rows
    per partition to the driver — no global sort exchange), and the
    whole scoring pipeline stays out of Python."""
    from apache_iceberg_exploration_spark.operators.similarity import (
        ann_sq_rerank_topk,
    )
    from apache_iceberg_exploration_spark.plans.explain import (
        shuffle_count,
    )

    df = ann_sq_rerank_topk(spark, SF_ORACLE)
    plan = executed_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "Sort " not in plan.replace("TakeOrdered", "")  # no global sort
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert shuffle_count(df) == 0, "corpus must not shuffle for top-k"


def test_ohlc_is_pure_aggregate_no_sort(spark):
    """The OHLC resample must compile to one partial+final aggregate pair
    — struct-min/max open/close, NOT a window formulation: no Window
    node, map-side combine below a single exchange (the skew-proof
    shape: only constant-size per-group partials cross the wire)."""
    from apache_iceberg_exploration_spark.operators.analytics import (
        timeseries_resample_ohlc_daily,
    )
    from apache_iceberg_exploration_spark.plans.explain import shuffle_count

    df = timeseries_resample_ohlc_daily(spark, SF_ORACLE)
    plan = executed_plan(df)
    assert "Window" not in plan, plan
    assert "partial_min" in plan, plan  # map-side combine before exchange
    assert shuffle_count(df) == 1, plan


def test_trend_regression_broadcasts_and_budgets(spark):
    """Customer (projected to key+segment) broadcasts into orders; the
    daily pre-aggregation and the regression reuse partial aggregation —
    two exchanges total, none carrying raw orders rows twice."""
    from apache_iceberg_exploration_spark.operators.analytics import (
        trend_regression_per_segment,
    )
    from apache_iceberg_exploration_spark.plans.explain import shuffle_count

    df = trend_regression_per_segment(spark, SF_ORACLE)
    assert has_broadcast_join(df)
    assert shuffle_count(df) <= 2


def test_zscore_window_runs_over_aggregated_series(spark):
    """The anomaly window must consume the |types|x|days| aggregate, not
    raw events: partial aggregation appears BELOW the window's exchange."""
    from apache_iceberg_exploration_spark.operators.analytics import (
        anomaly_rolling_zscore_daily,
    )
    from apache_iceberg_exploration_spark.plans.explain import shuffle_count

    df = anomaly_rolling_zscore_daily(spark, SF_ORACLE)
    plan = executed_plan(df)
    assert "partial_count" in plan, plan
    assert shuffle_count(df) <= 2


def test_bpe_pairs_stay_jvm_side(spark):
    """The char-pair explosion is higher-order JVM (transform+explode) —
    no Python evaluation anywhere in the plan; pair counting partials
    before the exchange."""
    from apache_iceberg_exploration_spark.operators.analytics import (  # noqa: F401
        trend_regression_per_segment,
    )
    from apache_iceberg_exploration_spark.operators.text import (
        bpe_merge_pair_counts,
    )

    df = bpe_merge_pair_counts(spark, SF_ORACLE)
    plan = executed_plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "partial_count" in plan, plan


def test_jaro_winkler_blocks_before_udf(spark):
    """The pandas-UDF scorer must run AFTER dictionary dedup + the
    blocked equi-join — the Arrow eval node sits above the join, and the
    join itself is an equi-join on the block key (no cartesian)."""
    from apache_iceberg_exploration_spark.operators.text import (
        fuzzy_match_jaro_winkler,
    )

    df = fuzzy_match_jaro_winkler(spark, SF_ORACLE)
    plan = executed_plan(df)
    assert "ArrowEvalPython" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_growth_trio_single_user_exchange(spark):
    """DAU split and streaks must reuse ONE user_id exchange for dedup +
    window + aggregation; WAU's explosion must happen on the deduped
    activity relation (partial distinct aggregation below its exchange)."""
    from apache_iceberg_exploration_spark.operators.analytics import (
        dau_new_vs_returning,
        rolling_wau_exact,
        streaks_gaps_islands,
    )
    from apache_iceberg_exploration_spark.plans.explain import shuffle_count

    # streaks: ONE user exchange, the whole analysis is an array fold
    df = streaks_gaps_islands(spark, SF_ORACLE)
    assert shuffle_count(df) == 1
    assert "Window" not in executed_plan(df)
    assert shuffle_count(dau_new_vs_returning(spark, SF_ORACLE)) <= 2
    # wau: user exchange + day rollup + the tiny bounds branch
    df = rolling_wau_exact(spark, SF_ORACLE)
    plan = executed_plan(df)
    assert shuffle_count(df) <= 3
    assert "Generate" in plan, plan  # array explode, not a range join
    assert "CartesianProduct" not in plan, plan


def test_eval_queries_broadcast_small_sides(spark):
    """The two estimator-audit queries must keep their small relations
    broadcast (query block / candidate pairs / probed cells) — the
    exact arms may scan, but nothing re-shuffles the corpus twice."""
    from apache_iceberg_exploration_spark.operators.dedup import (
        dedup_minhash_estimator_calibration,
    )
    from apache_iceberg_exploration_spark.operators.similarity import (
        ann_ivf_recall_eval,
    )

    assert has_broadcast_join(ann_ivf_recall_eval(spark, SF_ORACLE))
    plan = executed_plan(
        dedup_minhash_estimator_calibration(spark, SF_ORACLE)
    )
    assert "CartesianProduct" not in plan


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    """Catalyst's dynamic partition pruning: a fact table partitioned on
    the join key must receive a runtime ``dynamicpruning`` partition
    filter from the selective dim side — the optimizer feature that
    turns a star-join over a date-partitioned 100 TB fact into a scan
    of only the qualifying partitions. Asserted on the formatted plan's
    scan node, not trusted."""
    from apache_iceberg_exploration_spark.plans import formatted_plan

    orders = load_table(spark, SF_ORACLE, "orders").withColumn(
        "omonth", F.date_format("o_orderdate", "yyyy-MM")
    )
    fact_dir = str(tmp_path / "orders_by_month")
    orders.write.partitionBy("omonth").parquet(fact_dir)
    fact = spark.read.parquet(fact_dir)
    dim = (
        orders.select("omonth")
        .distinct()
        .filter(F.col("omonth") < "1992-06")
    )
    joined = fact.join(dim, "omonth").groupBy("omonth").count()
    plan = formatted_plan(joined)
    assert "dynamicpruning" in plan.lower(), plan
    assert joined.count() == orders.filter(
        F.col("omonth") < "1992-06"
    ).select("omonth").distinct().count()

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

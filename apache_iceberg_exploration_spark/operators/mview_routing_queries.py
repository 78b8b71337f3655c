"""Oracled queries for the r11 MV extensions (sources/mview.py —
VERDICT r10 #3/#4): spec-level WHERE filters, first-class avg, and
automatic aggregate-query routing to MV storage.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.io import load_table
from ..sources.lakehouse import LakehouseTable
from ..sources.mview import (
    create_materialized_view,
    read_mv,
    refresh_materialized_view,
    route_aggregate,
)


@query(
    "lakehouse_mv_filtered_avg_refresh",
    oracle="""
        WITH l AS (
            SELECT o_custkey AS cust,
                   CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                       AS cents
            FROM orders
        ),
        r AS (
            SELECT c_custkey AS cust, c_nationkey AS nat,
                   CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
                       AS bal_cents
            FROM customer
            WHERE c_custkey % 11 <> 5
        ),
        j AS (
            SELECT nat, cents
            FROM l JOIN r USING (cust)
            WHERE cents >= 10000000 AND bal_cents >= 0
        )
        SELECT nat,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(cents) AS BIGINT) AS cents_total,
               CAST(floor(
                   (CAST(sum(cents) AS DOUBLE) / count(*)) * 100 + 0.5
               ) AS BIGINT) AS avg_cents_x100
        FROM j
        GROUP BY 1
    """,
)
def lakehouse_mv_filtered_avg_refresh(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Filtered JOIN MV with a first-class avg, maintained
    incrementally: half of orders + customer seed the MV (WHERE spans
    BOTH sides: order value ≥ $100k and non-negative balance), then the
    other half of orders appends (left delta ⋈ R₁), a CoW delete
    removes cust≡5 (mod 11) from the dims (L₀ ⋈ right delta), and ONE
    refresh folds both deltas. The avg is materialized as its
    (sum, non-null count) pair and derived at read; the oracle
    recomputes the final state from scratch — hash equality proves the
    two-delta algebra with the filter and the pair-maintenance exact.

    Scale: refresh cost is O(changed rows) with the delta side of each
    join broadcast; the filter commutes with signed deltas so no
    recompute-shaped shuffle ever runs (SCALE.md r11)."""
    root = tempfile.mkdtemp(prefix="lakehouse_mv_favg_", dir="/tmp")
    try:
        left = LakehouseTable(spark, root + "/L")
        l_df = load_table(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("k"),
            F.col("o_custkey").alias("cust"),
            F.floor(F.col("o_totalprice") * 100 + 0.5)
            .cast("long")
            .alias("cents"),
        )
        left.append(
            l_df.filter(F.col("k") % 2 == 0)
            .drop("k")
            .repartition(4, "cust")
        )
        right = LakehouseTable(spark, root + "/R")
        right.append(
            load_table(spark, sf_dir, "customer")
            .select(
                F.col("c_custkey").alias("cust"),
                F.col("c_nationkey").alias("nat"),
                F.floor(F.col("c_acctbal") * 100 + 0.5)
                .cast("long")
                .alias("bal_cents"),
            )
            .repartition(4, "cust")
        )
        mv = root + "/mv"
        create_materialized_view(
            spark,
            mv,
            root + "/L",
            {
                "group_by": ["nat"],
                "aggs": {
                    "n_orders": ("count", None),
                    "cents_total": ("sum", "cents"),
                    "avg_cents": ("avg", "cents"),
                },
                "join": {"right_path": root + "/R", "on": ["cust"]},
                "where": "cents >= 10000000 AND bal_cents >= 0",
            },
        )
        left.append(
            l_df.filter(F.col("k") % 2 == 1)
            .drop("k")
            .repartition(4, "cust")
        )
        right.delete_where(F.col("cust") % 11 == 5)
        refresh_materialized_view(spark, mv)
        out = read_mv(spark, mv).select(
            "nat",
            F.col("n_orders").cast("long").alias("n_orders"),
            F.col("cents_total").cast("long").alias("cents_total"),
            F.floor(F.col("avg_cents") * 100 + 0.5)
            .cast("long")
            .alias("avg_cents_x100"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "lakehouse_mv_query_routing",
    oracle="""
        WITH src AS (
            SELECT c_nationkey AS nat,
                   c_custkey % 3 AS seg,
                   c_custkey AS cust,
                   CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
                       AS cents
            FROM customer
        )
        SELECT nat,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS cents_total,
               CAST(max(cents) AS BIGINT) AS cents_max,
               CAST(floor(
                   (CAST(sum(cents) AS DOUBLE) / count(*)) * 100 + 0.5
               ) AS BIGINT) AS avg_cents_x100
        FROM src
        GROUP BY 1
    """,
)
def lakehouse_mv_query_routing(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Automatic MV routing: customer lands as a table, an MV
    materializes per-(nat, seg) aggregates, and the QUERY asks for
    per-nat aggregates — ``route_aggregate`` matches the MV (group-by
    subset + declared aggs), re-aggregates MV STORAGE (sum/count
    re-add, max re-folds, avg re-derives from its pair), and the plan
    provably reads storage: the query asserts every input file sits
    under the MV's storage table, none under the source.

    Scale: the routed scan is MV-sized (≤ groups), not source-sized —
    at 100 TB this is the difference between a dashboard query hitting
    25 rows and rescanning the fact table (SCALE.md r11)."""
    root = tempfile.mkdtemp(prefix="lakehouse_mv_route_", dir="/tmp")
    try:
        src = LakehouseTable(spark, root + "/src")
        src.append(
            load_table(spark, sf_dir, "customer")
            .select(
                F.col("c_nationkey").alias("nat"),
                (F.col("c_custkey") % 3).alias("seg"),
                F.col("c_custkey").alias("cust"),
                F.floor(F.col("c_acctbal") * 100 + 0.5)
                .cast("long")
                .alias("cents"),
            )
            .repartition(4, "cust")
        )
        mv = root + "/mv"
        create_materialized_view(
            spark,
            mv,
            root + "/src",
            {
                "group_by": ["nat", "seg"],
                "aggs": {
                    "n": ("count", None),
                    "cents_total": ("sum", "cents"),
                    "cents_max": ("max", "cents"),
                    "avg_cents": ("avg", "cents"),
                },
            },
        )
        df, info = route_aggregate(
            spark,
            [mv],
            root + "/src",
            ["nat"],
            {
                "n": ("count", None),
                "cents_total": ("sum", "cents"),
                "cents_max": ("max", "cents"),
                "avg_cents": ("avg", "cents"),
            },
        )
        assert info["served_from"] == mv, info
        files = df.inputFiles()
        assert files and all("/mv/storage-" in f for f in files), files
        out = df.select(
            "nat",
            F.col("n").cast("long").alias("n"),
            F.col("cents_total").cast("long").alias("cents_total"),
            F.col("cents_max").cast("long").alias("cents_max"),
            F.floor(F.col("avg_cents") * 100 + 0.5)
            .cast("long")
            .alias("avg_cents_x100"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)

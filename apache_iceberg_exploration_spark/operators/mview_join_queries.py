"""Oracled queries for the widened MV algebra (r10, VERDICT r9 #2):
join MVs (two-delta incremental maintenance) and min/max aggregates
(insert-only fold + group-scoped exact recompute under deletes).

The oracle recomputes the FINAL source state from scratch in pure SQL
— it knows nothing about MVs, changelogs, or the two-delta identity —
so a value-hash match proves the incremental maintenance is exact
across appends, deletes, and updates on BOTH join sides.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import mview as M
from ..sources.io import load_table
from ..sources.lakehouse import LakehouseTable


@query(
    "lakehouse_mv_join_two_delta_refresh",
    oracle="""
        WITH lfinal AS (
            SELECT o_orderkey AS k, o_custkey AS cust,
                   CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                       AS cents
            FROM orders
            WHERE o_orderkey % 11 <> 3
        ),
        rfinal AS (
            SELECT c_custkey AS cust,
                   CASE WHEN c_custkey % 10 = 6
                        THEN (c_nationkey + 1) % 25
                        ELSE c_nationkey END AS nat
            FROM customer
            WHERE c_custkey % 13 <> 7
        )
        SELECT nat,
               CAST(sum(cents) AS BIGINT) AS cents_total,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM lfinal JOIN rfinal USING (cust)
        GROUP BY 1
    """,
)
def lakehouse_mv_join_two_delta_refresh(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Join-MV lifecycle: an MV declared as ``orders ⋈ customer ON
    cust`` grouped by nation is CREATED over half the fact table; then
    BOTH sides churn — fact append + fact delete, a dimension UPDATE
    that moves customers to another nation (group migration), and a
    dimension DELETE that removes customers (killing their orders from
    the join). ``read_mv`` refreshes via the two-delta identity
    ΔL⋈R1 + L0⋈ΔR — the left slice joins the NEW right version, the
    signed right slice joins the OLD left version — and must equal the
    oracle's from-scratch join over the final state.

    Scale: each delta join broadcasts the (small) signed changelog
    slice against ONE pruned scan of the opposite base table — a
    dimension update that moves 10% of customers costs two broadcast
    joins and a merge of O(touched nations), never the full
    fact-times-dim shuffle-agg a recompute would pay (SCALE.md r10)."""
    root = tempfile.mkdtemp(prefix="lakehouse_mvj_", dir="/tmp")
    try:
        left = LakehouseTable(spark, root + "/left")
        right = LakehouseTable(spark, root + "/right")
        orders = load_table(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("k"),
            F.col("o_custkey").alias("cust"),
            F.floor(F.col("o_totalprice") * 100 + 0.5)
            .cast("long")
            .alias("cents"),
        )
        cust = load_table(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("cust"),
            F.col("c_nationkey").alias("nat"),
        )
        left.append(
            orders.filter(F.col("k") % 2 == 0).repartition(4, "cust")
        )
        right.append(cust.repartition(4, "cust"))
        M.create_materialized_view(
            spark,
            root + "/mv",
            left.path,
            {
                "group_by": ["nat"],
                "aggs": {
                    "cents_total": ("sum", "cents"),
                    "n_orders": ("count", "cents"),
                },
                "join": {"right_path": right.path, "on": ["cust"]},
            },
        )
        left.append(
            orders.filter(F.col("k") % 2 == 1).repartition(4, "cust")
        )
        left.delete_where(F.col("k") % 11 == 3)
        right.update_where(
            F.col("cust") % 10 == 6, {"nat": (F.col("nat") + 1) % 25}
        )
        right.delete_where(F.col("cust") % 13 == 7)
        out = M.read_mv(spark, root + "/mv").select(
            "nat",
            F.col("cents_total").cast("long").alias("cents_total"),
            F.col("n_orders").cast("long").alias("n_orders"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "lakehouse_mv_minmax_group_recompute",
    oracle="""
        WITH src AS (
            SELECT o_custkey % 8 AS seg, o_orderkey AS k,
                   CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                       AS cents
            FROM orders
        ),
        final AS (
            SELECT seg, k,
                   CASE WHEN k % 17 = 4 THEN cents + 999 ELSE cents END
                       AS cents
            FROM src
            WHERE k % 9 <> 2
        )
        SELECT seg,
               CAST(max(cents) AS BIGINT) AS hi,
               CAST(min(cents) AS BIGINT) AS lo,
               CAST(sum(cents) AS BIGINT) AS cents_total
        FROM final
        GROUP BY 1
    """,
)
def lakehouse_mv_minmax_group_recompute(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """min/max MV under deletes: an MV (max, min, sum per segment) is
    created over half of orders; the source then appends (insert-only
    groups fold via least/greatest — no recompute), DELETES k≡2 mod 9
    (every segment loses rows, some lose their extremes — those groups
    recompute EXACTLY from the source scoped to their keys), and
    UPDATES k≡4 mod 17 (+999 cents — a preimage, so the touched groups
    also take the recompute path). ``read_mv`` must equal the oracle's
    from-scratch min/max/sum over the final state — the
    delete-that-kills-the-max case the signed sum/count algebra cannot
    express.

    Scale: the recompute is scoped to delete-touched GROUPS (broadcast
    semi-join on their keys), so its cost is proportional to the
    touched groups' row mass, not the table; insert-only traffic never
    recomputes (pinned by test_minmax_insert_only_folds_without_
    recompute)."""
    root = tempfile.mkdtemp(prefix="lakehouse_mvx_", dir="/tmp")
    try:
        src = LakehouseTable(spark, root + "/src")
        orders = load_table(spark, sf_dir, "orders").select(
            (F.col("o_custkey") % 8).alias("seg"),
            F.col("o_orderkey").alias("k"),
            F.floor(F.col("o_totalprice") * 100 + 0.5)
            .cast("long")
            .alias("cents"),
        )
        src.append(orders.filter(F.col("k") % 2 == 0).repartition(4, "k"))
        M.create_materialized_view(
            spark,
            root + "/mv",
            src.path,
            {
                "group_by": ["seg"],
                "aggs": {
                    "hi": ("max", "cents"),
                    "lo": ("min", "cents"),
                    "cents_total": ("sum", "cents"),
                },
            },
        )
        src.append(orders.filter(F.col("k") % 2 == 1).repartition(4, "k"))
        src.delete_where(F.col("k") % 9 == 2)
        src.update_where(
            F.col("k") % 17 == 4, {"cents": F.col("cents") + 999}
        )
        out = M.read_mv(spark, root + "/mv").select(
            "seg",
            F.col("hi").cast("long").alias("hi"),
            F.col("lo").cast("long").alias("lo"),
            F.col("cents_total").cast("long").alias("cents_total"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)

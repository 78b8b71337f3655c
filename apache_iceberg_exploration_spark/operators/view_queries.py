"""Oracled query through plain VIEW objects (r10, VERDICT r9 #6).

The view layer is pure metadata — the value-hash here proves the whole
chain: catalog identifier rewrite → view-over-view resolution →
definition versioning (the REPLACED definition serves the read) →
base-table scan, against a DuckDB oracle that inlines the same SQL.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.catalog import LakehouseCatalog
from ..sources.io import load_table


@query(
    "lakehouse_sql_view_catalog",
    oracle="""
        WITH enriched AS (
            SELECT o.o_orderkey, o.o_totalprice, c.c_nationkey,
                   c.c_mktsegment
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE o.o_orderstatus = 'O'
        )
        SELECT c_nationkey AS nat, c_mktsegment AS seg,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents_total
        FROM enriched
        GROUP BY 1, 2
    """,
)
def lakehouse_sql_view_catalog(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Versioned SQL views over the path catalog: ``orders`` and
    ``customer`` land as catalog tables; a base view joins them
    (3-part identifiers), an aggregate view stacks ON TOP of the base
    view, and the base view is then CREATE-OR-REPLACEd to filter open
    orders only — version 2 of its DEFINITION serves all subsequent
    reads (version 1 stays readable by number). The aggregate read
    through both layers must equal the oracle's inlined SQL.

    Scale: views add zero data IO — resolution rewrites identifiers and
    plans the CURRENT base snapshots through the normal scan paths
    (pruning/pushdown/encryption unchanged); the metadata is one
    sidecar read per view layer (Iceberg view spec shape,
    sources/views.py)."""
    root = tempfile.mkdtemp(prefix="lakehouse_views_", dir="/tmp")
    try:
        cat = LakehouseCatalog(spark, root + "/wh")
        cat.create_namespace("silver")
        cat.table("silver.orders").append(
            load_table(spark, sf_dir, "orders")
            .select("o_orderkey", "o_custkey", "o_orderstatus",
                    "o_totalprice")
            .repartition(4, "o_custkey")
        )
        cat.table("silver.customer").append(
            load_table(spark, sf_dir, "customer")
            .select("c_custkey", "c_nationkey", "c_mktsegment")
            .repartition(4, "c_custkey")
        )
        cat.create_view(
            "silver.order_facts",
            "SELECT o.o_orderkey, o.o_orderstatus, o.o_totalprice, "
            "c.c_nationkey, c.c_mktsegment "
            "FROM my_catalog.silver.orders o "
            "JOIN my_catalog.silver.customer c "
            "ON o.o_custkey = c.c_custkey",
        )
        cat.create_view(
            "silver.nation_segment_totals",
            "SELECT c_nationkey AS nat, c_mktsegment AS seg, "
            "CAST(count(*) AS BIGINT) AS n_orders, "
            "CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) "
            "AS BIGINT) AS cents_total "
            "FROM silver.order_facts GROUP BY 1, 2",
        )
        # REPLACE the base definition: open orders only — the stacked
        # view must see version 2 through the rewrite
        cat.create_view(
            "silver.order_facts",
            "SELECT o.o_orderkey, o.o_orderstatus, o.o_totalprice, "
            "c.c_nationkey, c.c_mktsegment "
            "FROM my_catalog.silver.orders o "
            "JOIN my_catalog.silver.customer c "
            "ON o.o_custkey = c.c_custkey "
            "WHERE o.o_orderstatus = 'O'",
            replace=True,
        )
        out = cat.view("silver.nation_segment_totals")
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)

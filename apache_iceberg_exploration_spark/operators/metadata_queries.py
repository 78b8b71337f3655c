"""Oracled queries over the metadata-table surfaces (late r8).

``position_deletes()`` / ``manifests()`` are layout-dependent in
general, but over a DETERMINISTIC single-file-per-append layout the
delete inventory is a pure function of the source keys — so the DuckDB
oracle recomputes the expected per-kind entry and dead-row totals from
``customer`` arithmetic, and a value-hash match proves the whole
delete-bookkeeping chain (pos coordinates, DV cardinalities,
equality entries) end to end.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.io import load_table
from ..sources.lakehouse import LakehouseTable


@query(
    "lakehouse_delete_file_inventory",
    oracle="""
        WITH src AS (
            SELECT c_custkey AS k, c_nationkey % 5 AS g FROM customer
        ),
        kinds AS (
            SELECT 'pos' AS kind,
                   count(*) FILTER (WHERE k % 97 = 0) AS dead_rows
            FROM src
            UNION ALL
            SELECT 'dv',
                   count(*) FILTER (WHERE k % 101 = 0 AND k % 97 <> 0)
            FROM src
            UNION ALL
            SELECT 'eq', -1
        )
        SELECT kind, CAST(dead_rows AS BIGINT) AS dead_rows
        FROM kinds
    """,
)
def lakehouse_delete_file_inventory(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Merge-on-read delete inventory via the ``position_deletes()``
    metadata table: after a position delete (k%97), a deletion-vector
    delete (k%101, computed on the survivors), and an equality delete,
    the table reports each pending delete's kind and dead-row count
    from METADATA alone (DV cardinality from the manifest, position
    coordinates from the small key parquets, equality entries with
    unknown mass as the -1 sentinel). The oracle recomputes every
    number from the key arithmetic — the maintenance-planner view
    (what ``coalesce_deletes_to_dv`` / ``rewrite_dv_heavy_files``
    consume) is value-hash-verified, not just smoke-tested.
    """
    root = tempfile.mkdtemp(prefix="lakehouse_inv_", dir="/tmp")
    try:
        tbl = LakehouseTable(spark, root + "/t")
        cust = load_table(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("k"),
            (F.col("c_nationkey") % 5).alias("g"),
        )
        tbl.append(cust.coalesce(1).sortWithinPartitions("k"))
        tbl.delete_where_pos(F.col("k") % 97 == 0)
        tbl.delete_where_dv(F.col("k") % 101 == 0)
        tbl.delete_where_mor(F.col("g") == 4, keys=["k"])
        out = (
            tbl.position_deletes()
            .groupBy("kind")
            .agg(
                F.sum(F.coalesce("dead_rows", F.lit(-1))).alias(
                    "dead_rows"
                )
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "lakehouse_sql_metadata_tvf",
    oracle="""
        WITH eras AS (
            SELECT c_custkey % 3 AS seq_key, count(*) AS n
            FROM customer GROUP BY 1
        )
        SELECT seq_key + 1 AS seq,
               1 AS n_files,
               CAST(n AS BIGINT) AS rows_sum
        FROM eras
    """,
)
def lakehouse_sql_metadata_tvf(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Metadata-plane SQL: ``lakehouse_files('<path>')`` is a Python
    UDTF (sources/sql_tvf.py), so per-file row counts and sequence
    numbers are queryable from pure SQL — the Iceberg
    ``SELECT * FROM db.tbl.files`` surface next to the data-plane
    ``CREATE TABLE ... USING lakehouse``. Three single-file appends
    from disjoint key slices make the per-sequence file count and row
    mass a pure function of the keys, which the oracle recomputes.
    """
    from ..sources.sql_tvf import register_metadata_tvfs

    root = tempfile.mkdtemp(prefix="lakehouse_tvf_", dir="/tmp")
    try:
        tbl = LakehouseTable(spark, root + "/t")
        cust = load_table(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("k")
        )
        for m in (0, 1, 2):
            tbl.append(
                cust.filter(F.col("k") % 3 == m)
                .coalesce(1)
                .sortWithinPartitions("k")
            )
        register_metadata_tvfs(spark)
        out = spark.sql(
            f"""
            SELECT seq,
                   count(*) AS n_files,
                   sum(rows) AS rows_sum
            FROM lakehouse_files('{tbl.path}')
            GROUP BY seq
            """
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)

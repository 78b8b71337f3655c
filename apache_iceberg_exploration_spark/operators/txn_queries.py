"""Oracled query for catalog-level multi-table transactions (r10,
sources/txn.py — the Nessie shape).

The value hash proves BOTH halves of the contract at once: atomicity
(the transaction's append-to-facts and delete-from-dims appear
together) and isolation (a direct, non-transactional write landing
AFTER the transaction is invisible to the consistent snapshot — the
oracle knows nothing about it).
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
    "lakehouse_catalog_multitable_txn",
    oracle="""
        WITH facts AS (
            SELECT o_orderkey AS k, o_custkey AS cust,
                   CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                       AS cents
            FROM orders
        ),
        dims AS (
            SELECT c_custkey AS cust, c_nationkey AS nat
            FROM customer
            WHERE c_custkey % 9 <> 4
        )
        SELECT nat,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(cents) AS BIGINT) AS cents_total
        FROM facts JOIN dims USING (cust)
        GROUP BY 1
    """,
)
def lakehouse_catalog_multitable_txn(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Multi-table transaction lifecycle: facts (half of orders) and
    dims (customer) land as catalog tables and a seed transaction pins
    both; ONE transaction then appends the other half of orders AND
    deletes dims rows (cust≡4 mod 9) — published as a single catalog
    commit. A direct, NON-transactional write then dumps junk rows into
    the facts table. The consistent snapshot join must equal the
    oracle's full-orders ⋈ surviving-dims aggregate — junk excluded,
    because the catalog ref still pins the transaction's version (the
    direct write advanced only table-level state).

    Scale: the catalog commit is O(tables) JSON and one link syscall —
    no data IO at any table size; the snapshot read is plain per-table
    time travel through the normal scan stack (SCALE.md r10)."""
    root = tempfile.mkdtemp(prefix="lakehouse_txn_", dir="/tmp")
    try:
        cat = LakehouseCatalog(spark, root + "/wh")
        cat.create_namespace("s")
        facts = load_table(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("k"),
            F.col("o_custkey").alias("cust"),
            F.floor(F.col("o_totalprice") * 100 + 0.5)
            .cast("long")
            .alias("cents"),
        )
        dims = load_table(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("cust"),
            F.col("c_nationkey").alias("nat"),
        )
        cat.table("s.facts").append(
            facts.filter(F.col("k") % 2 == 0).repartition(4, "cust")
        )
        cat.table("s.dims").append(dims.repartition(4, "cust"))
        with cat.transaction() as tx:
            tx.table("s.facts")
            tx.table("s.dims")
        with cat.transaction() as tx:
            tx.table("s.facts").append(
                facts.filter(F.col("k") % 2 == 1).repartition(4, "cust")
            )
            tx.table("s.dims").delete_where(F.col("cust") % 9 == 4)
        # post-transaction direct write: catalog-invisible junk
        cat.table("s.facts").append(
            spark.createDataFrame(
                [(10**9 + i, 1, 999) for i in range(5)],
                "k long, cust long, cents long",
            ).repartition(1)
        )
        snap = cat.snapshot()
        out = (
            snap.read("s.facts")
            .join(snap.read("s.dims"), on=["cust"])
            .groupBy("nat")
            .agg(
                F.count("*").alias("n_orders"),
                F.sum("cents").cast("long").alias("cents_total"),
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "lakehouse_catalog_branch_merge",
    oracle="""
        WITH facts AS (
            SELECT o_orderkey AS k, o_custkey AS cust,
                   CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                       AS cents
            FROM orders
        ),
        dims AS (
            SELECT c_custkey AS cust, c_nationkey AS nat
            FROM customer
            WHERE c_custkey % 7 <> 2
        )
        SELECT nat,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(cents) AS BIGINT) AS cents_total
        FROM facts JOIN dims USING (cust)
        GROUP BY 1
    """,
)
def lakehouse_catalog_branch_merge(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Catalog branches end to end (git-for-data over the r10
    transaction log): an ``ingest`` branch forks from main and lands
    the second half of the fact table in its own transaction while
    MAIN deletes dimension rows (cust≡2 mod 7) in a concurrent
    transaction — per-table discipline keeps both legal. Merging
    ``ingest`` into main is a 3-way pin merge against the fork point
    (each side moved a different table, so both pins graft); a direct
    post-merge junk append to facts stays catalog-invisible. The
    main-snapshot join must equal the oracle's full-facts ⋈
    surviving-dims aggregate — merged work in, junk out.

    Scale: branch creation, the merge, and the tag-like pointer CAS
    are each O(1) metadata (pointer files + one commit JSON); the
    merge moves ZERO data at any table size — pins are adopted, not
    copied (SCALE.md r10)."""
    root = tempfile.mkdtemp(prefix="lakehouse_branch_", dir="/tmp")
    try:
        cat = LakehouseCatalog(spark, root + "/wh")
        cat.create_namespace("s")
        facts = load_table(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("k"),
            F.col("o_custkey").alias("cust"),
            F.floor(F.col("o_totalprice") * 100 + 0.5)
            .cast("long")
            .alias("cents"),
        )
        dims = load_table(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("cust"),
            F.col("c_nationkey").alias("nat"),
        )
        cat.table("s.facts").append(
            facts.filter(F.col("k") % 2 == 0).repartition(4, "cust")
        )
        cat.table("s.dims").append(dims.repartition(4, "cust"))
        with cat.transaction() as tx:
            tx.table("s.facts")
            tx.table("s.dims")
        cat.create_branch("ingest")
        with cat.transaction(ref="ingest") as tx:
            tx.table("s.facts").append(
                facts.filter(F.col("k") % 2 == 1).repartition(4, "cust")
            )
        with cat.transaction() as tx:  # main: disjoint table
            tx.table("s.dims").delete_where(F.col("cust") % 7 == 2)
        merged = cat.merge_branch("ingest")
        assert merged["fast_forward"] is False
        # post-merge direct write: catalog-invisible junk
        cat.table("s.facts").append(
            spark.createDataFrame(
                [(10**9 + i, 1, 999) for i in range(5)],
                "k long, cust long, cents long",
            ).repartition(1)
        )
        snap = cat.snapshot()
        out = (
            snap.read("s.facts")
            .join(snap.read("s.dims"), on=["cust"])
            .groupBy("nat")
            .agg(
                F.count("*").alias("n_orders"),
                F.sum("cents").cast("long").alias("cents_total"),
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)

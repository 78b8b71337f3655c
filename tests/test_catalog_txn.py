"""Catalog-level multi-table transactions (r10, Nessie shape): one
atomic catalog commit pins every touched table's produced version;
consistent snapshots resolve all tables through the pins; concurrent
transactions conflict on shared tables and merge on disjoint ones."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from apache_iceberg_exploration_spark.sources.catalog import (
    LakehouseCatalog,
)
from apache_iceberg_exploration_spark.sources.txn import (
    CatalogConflict,
    CatalogTransaction,
)


@pytest.fixture()
def cat(spark, tmp_path):
    c = LakehouseCatalog(spark, str(tmp_path / "wh"))
    c.create_namespace("s")
    c.table("s.a").append(
        spark.createDataFrame(
            [Row(k=i, v=i * 10) for i in range(10)]
        ).repartition(2, "k")
    )
    c.table("s.b").append(
        spark.createDataFrame(
            [Row(k=i, w=f"w{i}") for i in range(10)]
        ).repartition(2, "k")
    )
    # seed the catalog log so both tables are pinned at v1
    with c.transaction() as tx:
        tx.table("s.a")
        tx.table("s.b")
    return c


def test_txn_publishes_atomically_and_isolates(spark, cat):
    snap0 = cat.snapshot()
    tip0 = cat.catalog_tip()
    tx = CatalogTransaction(cat)
    tx.table("s.a").append(
        spark.createDataFrame([Row(k=100, v=1000)]).repartition(1)
    )
    tx.table("s.b").delete_where(F.col("k") == 3, prune={"k": (3, 3)})
    # MID-transaction: table-level state advanced, but the catalog ref
    # has not — a consistent reader sees the pre-transaction world
    assert cat.catalog_tip() == tip0
    pre = cat.snapshot()
    assert pre.read("s.a").count() == 10
    assert pre.read("s.b").count() == 10
    tx.commit()
    post = cat.snapshot()
    assert post.read("s.a").count() == 11
    assert post.read("s.b").count() == 9
    # the PRE-commit snapshot object still serves the old world
    assert snap0.read("s.a").count() == 10


def test_context_manager_abort_publishes_nothing(spark, cat):
    tip0 = cat.catalog_tip()
    with pytest.raises(RuntimeError, match="boom"):
        with cat.transaction() as tx:
            tx.table("s.a").append(
                spark.createDataFrame([Row(k=200, v=1)]).repartition(1)
            )
            raise RuntimeError("boom")
    assert cat.catalog_tip() == tip0
    # catalog readers never see the aborted work (table state advanced,
    # the ref did not — Nessie semantics)
    assert cat.snapshot().read("s.a").count() == 10


def test_conflicting_transactions_first_wins(spark, cat):
    """Two transactions racing on one table: the first lands; the
    second is refused at TOUCH time by the tip-equals-pin soundness
    guard (mutating on top of state the ref never pinned would leak
    the winner's rows into the loser's pin)."""
    t1 = CatalogTransaction(cat)
    t2 = CatalogTransaction(cat)  # same base
    t1.table("s.a").append(
        spark.createDataFrame([Row(k=300, v=1)]).repartition(1)
    )
    t1.commit()
    with pytest.raises(CatalogConflict, match="physically moved"):
        t2.table("s.a")
    # and a commit-time pin race (touched BEFORE the winner mutated)
    # is caught by the publish check
    t4 = CatalogTransaction(cat)
    t5 = CatalogTransaction(cat)
    t4.table("s.b")
    t5.table("s.b")
    t4.table("s.b").append(
        spark.createDataFrame([Row(k=300, w="x")]).repartition(1)
    )
    t4.commit()
    with pytest.raises(CatalogConflict, match="re-pinned"):
        t5.commit()


def test_disjoint_transactions_merge(spark, cat):
    t1 = CatalogTransaction(cat)
    t2 = CatalogTransaction(cat)
    t1.table("s.a").append(
        spark.createDataFrame([Row(k=400, v=1)]).repartition(1)
    )
    t2.table("s.b").append(
        spark.createDataFrame([Row(k=400, w="x")]).repartition(1)
    )
    t1.commit()
    t2.commit()  # disjoint tables: merges over t1's pins
    snap = cat.snapshot()
    assert snap.read("s.a").count() == 11
    assert snap.read("s.b").count() == 11


def test_snapshot_pins_stable_under_concurrent_writes(spark, cat):
    snap = cat.snapshot()
    n0 = snap.read("s.a").count()
    with cat.transaction() as tx:
        tx.table("s.a").append(
            spark.createDataFrame([Row(k=500, v=5)]).repartition(1)
        )
    # the snapshot keeps serving its pinned version after the commit
    assert snap.read("s.a").count() == n0
    assert cat.snapshot().read("s.a").count() == n0 + 1


def test_unpinned_table_resolves_once_per_snapshot(spark, cat):
    cat.table("s.c").append(
        spark.createDataFrame([Row(k=1, z=1)]).repartition(1)
    )
    snap = cat.snapshot()  # s.c never pinned by any transaction
    assert snap.read("s.c").count() == 1
    cat.table("s.c").append(
        spark.createDataFrame([Row(k=2, z=2)]).repartition(1)
    )
    # stable within the snapshot (version recorded at first resolve)
    assert snap.read("s.c").count() == 1
    assert cat.snapshot().read("s.c").count() == 2

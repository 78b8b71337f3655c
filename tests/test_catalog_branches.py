"""Catalog branches and tags over the transaction log (r10 —
git-for-data): named refs with CAS pointer chains, branch-scoped
transactions, fast-forward and 3-way pin merges with per-table
resolution, immutable tags, and legacy (pre-refs) compatibility."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from apache_iceberg_exploration_spark.sources.catalog import (
    LakehouseCatalog,
)
from apache_iceberg_exploration_spark.sources.txn import (
    CatalogConflict,
    MergeConflict,
)


@pytest.fixture()
def cat(spark, tmp_path):
    c = LakehouseCatalog(spark, str(tmp_path / "wh"))
    c.create_namespace("s")
    c.table("s.a").append(
        spark.createDataFrame(
            [Row(k=i, v=i) for i in range(10)]
        ).repartition(2, "k")
    )
    c.table("s.b").append(
        spark.createDataFrame(
            [Row(k=i, w=i * 2) for i in range(10)]
        ).repartition(2, "k")
    )
    with c.transaction() as tx:
        tx.table("s.a")
        tx.table("s.b")
    return c


def _add(spark, cat, ref, ident, k):
    with cat.transaction(ref=ref) as tx:
        tx.table(ident).append(
            spark.createDataFrame([Row(k=k, v=k)]).repartition(1)
            if ident == "s.a"
            else spark.createDataFrame(
                [Row(k=k, w=k)]
            ).repartition(1)
        )


def test_branch_isolation_and_fast_forward(spark, cat):
    cat.create_branch("dev")
    main0 = cat.catalog_tip()
    _add(spark, cat, "dev", "s.a", 100)
    # dev advanced, main did not — and main's snapshot is unpolluted
    assert cat.catalog_tip("dev") != main0
    assert cat.catalog_tip() == main0
    assert cat.snapshot().read("s.a").count() == 10
    assert cat.snapshot(ref="dev").read("s.a").count() == 11
    # only dev moved: merge fast-forwards main onto dev's head
    out = cat.merge_branch("dev")
    assert out["fast_forward"] is True
    assert cat.snapshot().read("s.a").count() == 11


def test_three_way_merge_disjoint_tables(spark, cat):
    cat.create_branch("dev")
    _add(spark, cat, "dev", "s.a", 200)  # dev moves a
    _add(spark, cat, "main", "s.b", 200)  # main moves b
    out = cat.merge_branch("dev")
    assert out["fast_forward"] is False
    snap = cat.snapshot()
    assert snap.read("s.a").count() == 11  # dev's work
    assert snap.read("s.b").count() == 11  # main's work
    # merge commit records both parents (ancestry for future merges)
    from apache_iceberg_exploration_spark.sources.txn import (
        read_catalog_commit,
    )

    body = read_catalog_commit(cat.warehouse, out["commit"])
    assert body.get("merge_parent") is not None


def test_cross_ref_same_table_write_refused_at_touch(spark, cat):
    """Table lineage is linear and SHARED across refs, so after dev
    writes s.a, a main transaction touching s.a is refused (its tip
    moved past main's pin) — mutating on top would leak dev's rows
    into main's next pin. Merge first, then write."""
    cat.create_branch("dev")
    _add(spark, cat, "dev", "s.a", 300)
    with pytest.raises(CatalogConflict, match="physically moved"):
        _add(spark, cat, "main", "s.a", 301)
    # main's view never saw dev's row
    assert cat.snapshot().read("s.a").count() == 10
    # after merging, main may write the table again
    cat.merge_branch("dev")
    _add(spark, cat, "main", "s.a", 301)
    assert cat.snapshot().read("s.a").count() == 12


def test_merge_conflict_same_table_both_sides(spark, cat):
    """The 3-way merge's same-table conflict arm — reachable only via
    hand-built divergent pins (the touch guard prevents transactions
    from creating this state), kept as the safety net it is."""
    from apache_iceberg_exploration_spark.sources import txn as T

    cat.create_branch("dev")
    wh = cat.warehouse
    base = T.ref_head(wh, "main")
    base_pins = T.read_catalog_commit(wh, base)["pins"]
    for ref, fake_v in (("dev", 91), ("main", 92)):
        head = T.ref_head(wh, ref)
        n = T._allocate_commit(
            wh,
            {
                "parent": head,
                "ref": ref,
                "pins": dict(base_pins, **{"s.a": fake_v}),
            },
        )
        T._advance_ref(wh, ref, head, n)
    with pytest.raises(MergeConflict) as ex:
        cat.merge_branch("dev")
    assert ex.value.tables == ["s.a"]


def test_merge_noop_when_src_behind(spark, cat):
    cat.create_branch("dev")
    _add(spark, cat, "main", "s.a", 400)
    out = cat.merge_branch("dev")  # dev never moved: nothing to merge
    assert out.get("noop") is True
    assert cat.snapshot().read("s.a").count() == 11


def test_tags_are_immutable_reproducible_states(spark, cat):
    cat.create_catalog_tag("release-1")
    _add(spark, cat, "main", "s.a", 500)
    # the tag keeps serving the tagged multi-table state
    assert cat.snapshot(ref="release-1").read("s.a").count() == 10
    assert cat.snapshot().read("s.a").count() == 11
    with pytest.raises(ValueError, match="TAG"):
        cat.transaction(ref="release-1")
    with pytest.raises(ValueError, match="already exists"):
        cat.create_catalog_tag("release-1")
    assert cat.refs()["release-1"]["type"] == "tag"


def test_branch_scoped_conflicts_and_disjoint_independence(spark, cat):
    """Two transactions racing on dev's SAME table: first wins, the
    second refuses at touch. Meanwhile main freely writes a DISJOINT
    table — cross-ref independence holds per table."""
    cat.create_branch("dev")
    from apache_iceberg_exploration_spark.sources.txn import (
        CatalogTransaction,
    )

    t1 = CatalogTransaction(cat, ref="dev")
    t2 = CatalogTransaction(cat, ref="dev")
    t1.table("s.a").append(
        spark.createDataFrame([Row(k=600, v=1)]).repartition(1)
    )
    t1.commit()
    with pytest.raises(CatalogConflict, match="physically moved"):
        t2.table("s.a")
    # a DISJOINT table on MAIN commits freely (per-table discipline)
    _add(spark, cat, "main", "s.b", 602)
    assert cat.snapshot().read("s.b").count() == 11
    assert cat.snapshot().read("s.a").count() == 10  # dev's unmerged
    assert cat.snapshot(ref="dev").read("s.a").count() == 11


def test_unknown_ref_fails_loudly(cat):
    with pytest.raises(ValueError, match="unknown catalog ref"):
        cat.catalog_tip("nope")
    with pytest.raises(ValueError, match="invalid catalog ref"):
        cat.create_branch("bad/name")


def test_legacy_pre_refs_catalog_keeps_working(spark, tmp_path):
    """A catalog whose commits predate the refs layer (plain c1..cN
    chain, no _catalog/refs/) resolves main's head via the legacy
    fallback, and the first ref operation materializes the pointer
    BEFORE any branch takes numbers."""
    import os
    import shutil

    c = LakehouseCatalog(spark, str(tmp_path / "wh"))
    c.create_namespace("s")
    c.table("s.a").append(
        spark.createDataFrame([Row(k=1, v=1)]).repartition(1)
    )
    with c.transaction() as tx:
        tx.table("s.a")
    # simulate a pre-refs catalog: drop the refs dir
    shutil.rmtree(os.path.join(c.warehouse, "_catalog", "refs"))
    assert c.catalog_tip() >= 1  # legacy fallback
    c.create_branch("dev")  # materializes main first
    _add(spark, c, "dev", "s.a", 2)
    # main's head still excludes dev's commit
    assert c.snapshot().read("s.a").count() == 1
    assert c.snapshot(ref="dev").read("s.a").count() == 2

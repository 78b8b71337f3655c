"""Materialized-view objects (r9, VERDICT r8 #4): mv.json metadata
(source pointer + declared spec + storage pointer + refresh state),
staleness-aware reads with a provably metadata-only fresh path, exact
incremental refresh via changelog-driven signed-delta MERGE, idempotent
crash recovery, and orphan-storage GC."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from apache_iceberg_exploration_spark.sources import mview as M
from apache_iceberg_exploration_spark.sources.lakehouse import (
    LakehouseTable,
)

SPEC = {
    "group_by": ["g"],
    "aggs": {"total": ("sum", "v"), "n_rows": ("count", "v")},
}


def _rows(spark, lo, hi):
    return spark.createDataFrame(
        [Row(k=i, g=i % 5, v=i * 10) for i in range(lo, hi)]
    ).repartition(2, "k")


def _expected(spark, src):
    return {
        r["g"]: (r["total"], r["n_rows"])
        for r in src.read()
        .groupBy("g")
        .agg(F.sum("v").alias("total"), F.count("*").alias("n_rows"))
        .collect()
    }


def _got(spark, mv_path, staleness=0):
    return {
        r["g"]: (r["total"], r["n_rows"])
        for r in M.read_mv(
            spark, mv_path, max_staleness_versions=staleness
        ).collect()
    }


def test_create_and_fresh_read(spark, tmp_path):
    src = LakehouseTable(spark, str(tmp_path / "src"))
    src.append(_rows(spark, 0, 50))
    mv = str(tmp_path / "mv")
    meta = M.create_materialized_view(spark, mv, src.path, SPEC)
    assert meta["last_source_version"] == 1
    assert _got(spark, mv) == _expected(spark, src)
    # internal bookkeeping column never leaks
    assert sorted(M.read_mv(spark, mv).columns) == [
        "g",
        "n_rows",
        "total",
    ]


def test_incremental_refresh_appends_deletes_updates(spark, tmp_path):
    src = LakehouseTable(spark, str(tmp_path / "src"))
    src.append(_rows(spark, 0, 50))
    mv = str(tmp_path / "mv")
    M.create_materialized_view(spark, mv, src.path, SPEC)
    storage_v0 = LakehouseTable(
        spark, M._read_meta(mv)["storage_path"]
    ).current_version()
    src.append(_rows(spark, 50, 80))
    src.delete_where(F.col("k") % 7 == 0, prune={"k": (0, 79)})
    # CoW update: count delta 0 for the group, sum delta != 0
    src.update_where(F.col("k") == 3, {"v": F.lit(100000)})
    assert _got(spark, mv) == _expected(spark, src)
    storage = LakehouseTable(spark, M._read_meta(mv)["storage_path"])
    # ONE merge commit refreshed three source commits
    assert storage.current_version() == storage_v0 + 1
    assert M._read_meta(mv)["last_source_version"] == src.current_version()


def test_fresh_path_is_metadata_only(spark, tmp_path, monkeypatch):
    src = LakehouseTable(spark, str(tmp_path / "src"))
    src.append(_rows(spark, 0, 30))
    mv = str(tmp_path / "mv")
    M.create_materialized_view(spark, mv, src.path, SPEC)
    want = _got(spark, mv)
    # a fresh read must never scan (or even plan) source data files —
    # only the two version lookups
    src_path = os.path.abspath(str(tmp_path / "src"))
    orig = LakehouseTable._project_to_schema

    def guard(self, manifest, *a, **kw):
        if os.path.abspath(self.path) == src_path:
            raise AssertionError(
                "fresh MV read touched SOURCE data — not metadata-only"
            )
        return orig(self, manifest, *a, **kw)

    monkeypatch.setattr(LakehouseTable, "_project_to_schema", guard)
    assert _got(spark, mv) == want
    # changelog over the source is equally forbidden on the fresh path
    monkeypatch.setattr(
        LakehouseTable,
        "changelog",
        lambda *a, **kw: (_ for _ in ()).throw(
            AssertionError("fresh MV read ran a changelog scan")
        ),
    )
    assert _got(spark, mv) == want


def test_staleness_budget_serves_stale(spark, tmp_path):
    src = LakehouseTable(spark, str(tmp_path / "src"))
    src.append(_rows(spark, 0, 30))
    mv = str(tmp_path / "mv")
    M.create_materialized_view(spark, mv, src.path, SPEC)
    old = _got(spark, mv)
    src.append(_rows(spark, 30, 40))
    # within budget: stale-but-cheap
    assert _got(spark, mv, staleness=1) == old
    assert M._read_meta(mv)["last_source_version"] == 1
    # over budget: refresh happens
    src.append(_rows(spark, 40, 50))
    assert _got(spark, mv, staleness=1) == _expected(spark, src)


def test_group_vanishes_at_zero_rows(spark, tmp_path):
    src = LakehouseTable(spark, str(tmp_path / "src"))
    src.append(_rows(spark, 0, 20))
    mv = str(tmp_path / "mv")
    M.create_materialized_view(spark, mv, src.path, SPEC)
    src.delete_where(F.col("g") == 2)  # kills a whole group
    got = _got(spark, mv)
    assert 2 not in got
    assert got == _expected(spark, src)


def test_refresh_is_idempotent_after_crash(spark, tmp_path):
    src = LakehouseTable(spark, str(tmp_path / "src"))
    src.append(_rows(spark, 0, 20))
    mv = str(tmp_path / "mv")
    meta0 = dict(M.create_materialized_view(spark, mv, src.path, SPEC))
    src.append(_rows(spark, 20, 30))
    M.refresh_materialized_view(spark, mv)
    storage = LakehouseTable(spark, M._read_meta(mv)["storage_path"])
    v_after = storage.current_version()
    # simulate the crash window: storage committed, mv.json NOT updated
    from apache_iceberg_exploration_spark.sources.lakehouse import (
        _publish_sidecar,
    )

    _publish_sidecar(M._mv_meta_path(mv), meta0)
    M.refresh_materialized_view(spark, mv)  # must detect + skip
    assert storage.current_version() == v_after  # no double-apply
    assert _got(spark, mv) == _expected(spark, src)


def test_gc_orphan_storage(spark, tmp_path):
    src = LakehouseTable(spark, str(tmp_path / "src"))
    src.append(_rows(spark, 0, 10))
    mv = str(tmp_path / "mv")
    M.create_materialized_view(spark, mv, src.path, SPEC)
    stray = str(tmp_path / "mv" / "storage-deadbeef")
    os.makedirs(stray)
    removed = M.gc_orphan_storage(mv)
    assert removed == [stray] and not os.path.exists(stray)
    assert _got(spark, mv) == _expected(spark, src)


def test_spec_validation(spark, tmp_path):
    src = LakehouseTable(spark, str(tmp_path / "src"))
    src.append(_rows(spark, 0, 5))
    with pytest.raises(ValueError, match="group_by"):
        M.create_materialized_view(
            spark, str(tmp_path / "m1"), src.path, {"group_by": []}
        )
    # r10: min/max ARE maintainable now (group-scoped recompute on
    # deletes) — the rejected class is non-decomposable aggregates
    with pytest.raises(ValueError, match="not incrementally"):
        M.create_materialized_view(
            spark,
            str(tmp_path / "m2"),
            src.path,
            {"group_by": ["g"], "aggs": {"m": ("median", "v")}},
        )
    M.create_materialized_view(spark, str(tmp_path / "m3"), src.path, SPEC)
    with pytest.raises(ValueError, match="already exists"):
        M.create_materialized_view(
            spark, str(tmp_path / "m3"), src.path, SPEC
        )


def test_mv_over_streaming_upsert_source(spark, tmp_path):
    """Composition: a source maintained by the streaming UPSERT sink
    (equality-delete commits) drives an MV — the refresh's changelog
    slice must net the upserts' update pairs and tombstones exactly."""
    from apache_iceberg_exploration_spark.streaming._wait import (
        await_or_raise,
    )
    from apache_iceberg_exploration_spark.streaming.lakehouse_sink import (
        make_lakehouse_stream_sink,
    )
    from apache_iceberg_exploration_spark.streaming.lakehouse_source import (
        make_lakehouse_stream_dist_source,
    )

    feed = LakehouseTable(spark, str(tmp_path / "feed"))
    feed.append(
        spark.createDataFrame(
            [
                Row(k=i, g=i % 3, v=i * 10, __deleted=False)
                for i in range(12)
            ]
        ).repartition(2, "k")
    )
    feed.append(
        spark.createDataFrame(
            [
                Row(k=1, g=1, v=5000, __deleted=False),  # update
                Row(k=6, g=0, v=None, __deleted=True),  # tombstone
                Row(k=20, g=2, v=7, __deleted=False),  # insert
            ]
        ).repartition(2, "k"),
    )
    spark.dataSource.register(make_lakehouse_stream_dist_source())
    spark.dataSource.register(make_lakehouse_stream_sink())
    src_path = str(tmp_path / "state")

    def drain():
        q = (
            spark.readStream.format("lakehouse_stream_dist")
            .option("path", feed.path)
            .option("maxVersionsPerTrigger", "1")
            .load()
            .writeStream.format("lakehouse_sink")
            .option("path", src_path)
            .option("checkpointLocation", str(tmp_path / "cp"))
            .option("mode", "upsert")
            .option("upsertKeys", "k")
            .option("deleteColumn", "__deleted")
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q, 300)

    drain()  # batch 1 only (maxVersionsPerTrigger=1)
    M.create_materialized_view(spark, str(tmp_path / "mv"), src_path, SPEC)
    drain()  # batch 2: the upsert commit
    src = LakehouseTable(spark, src_path)
    assert _got(spark, str(tmp_path / "mv")) == _expected(spark, src)


def test_mv_over_encrypted_source(spark, tmp_path):
    key = bytes(range(16))
    src = LakehouseTable(spark, str(tmp_path / "src"), encryption_key=key)
    src.enable_encryption(key)
    src.append(_rows(spark, 0, 30))
    mv = str(tmp_path / "mv")
    M.create_materialized_view(
        spark, mv, src.path, SPEC, encryption_key=key
    )
    from apache_iceberg_exploration_spark.sources import encryption as E

    meta = M._read_meta(mv)
    assert meta["encrypted"]
    storage = LakehouseTable(spark, meta["storage_path"])
    m = storage._read_manifest(storage.current_version())
    assert all(E.is_encrypted_file(f) for f in m["files"])
    src.append(_rows(spark, 30, 40))
    src.delete_where(F.col("k") % 9 == 1)
    got = {
        r["g"]: (r["total"], r["n_rows"])
        for r in M.read_mv(spark, mv, encryption_key=key).collect()
    }
    assert got == _expected(spark, src)
    # keyless refresh of an encrypted MV fails loudly
    src.append(_rows(spark, 40, 45))
    with pytest.raises(ValueError, match="encrypted"):
        M.read_mv(spark, mv)

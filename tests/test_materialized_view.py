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
    with pytest.raises(ValueError, match="not incrementally"):
        M.create_materialized_view(
            spark,
            str(tmp_path / "m2"),
            src.path,
            {"group_by": ["g"], "aggs": {"m": ("max", "v")}},
        )
    M.create_materialized_view(spark, str(tmp_path / "m3"), src.path, SPEC)
    with pytest.raises(ValueError, match="already exists"):
        M.create_materialized_view(
            spark, str(tmp_path / "m3"), src.path, SPEC
        )

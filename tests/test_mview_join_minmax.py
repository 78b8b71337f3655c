"""MV algebra widening (r10 — VERDICT r9 #2): join MVs maintained by
the two-delta identity (ΔL⋈R1 + L0⋈ΔR over signed changelog slices),
and min/max aggregates maintained by insert-only folding plus exact
group-scoped recompute when a delete touches the group (the
delete-that-kills-the-max case). Since r12 both arms commit as ONE
merge (per-row __mv_replace flag); legacy two-merge tables that
crashed between their merges still recover via the stage-1 marker."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from apache_iceberg_exploration_spark.sources import mview as M
from apache_iceberg_exploration_spark.sources.lakehouse import (
    LakehouseTable,
)

JOIN_SPEC = {
    "group_by": ["region"],
    "aggs": {"total": ("sum", "amt"), "n": ("count", "amt")},
    # right_path is filled per test
}

MINMAX_SPEC = {
    "group_by": ["g"],
    "aggs": {
        "hi": ("max", "v"),
        "lo": ("min", "v"),
        "total": ("sum", "v"),
    },
}


def _facts(spark, lo, hi):
    return spark.createDataFrame(
        [Row(k=i, g=i % 4, amt=i * 10) for i in range(lo, hi)]
    ).repartition(2, "k")


def _dims(spark, pairs):
    return spark.createDataFrame(
        [Row(g=g, region=r) for g, r in pairs]
    ).repartition(1)


def _mk_join_mv(spark, tmp_path):
    left = LakehouseTable(spark, str(tmp_path / "left"))
    left.append(_facts(spark, 0, 40))
    right = LakehouseTable(spark, str(tmp_path / "right"))
    right.append(
        _dims(spark, [(0, "NA"), (1, "EU"), (2, "NA"), (3, "APAC")])
    )
    spec = dict(
        JOIN_SPEC, join={"right_path": right.path, "on": ["g"]}
    )
    mv = str(tmp_path / "mv")
    M.create_materialized_view(spark, mv, left.path, spec)
    return left, right, mv, spec


def _expected_join(left, right):
    return {
        r["region"]: (r["total"], r["n"])
        for r in left.read()
        .join(right.read(), on=["g"])
        .groupBy("region")
        .agg(F.sum("amt").alias("total"), F.count("*").alias("n"))
        .collect()
    }


def _got(spark, mv, cols):
    return {
        r[cols[0]]: tuple(r[c] for c in cols[1:])
        for r in M.read_mv(spark, mv).collect()
    }


def test_join_mv_create_and_fresh_read(spark, tmp_path):
    left, right, mv, spec = _mk_join_mv(spark, tmp_path)
    meta = M._read_meta(mv)
    assert meta["last_source_version"] == 1
    assert meta["last_right_version"] == 1
    assert _got(spark, mv, ["region", "total", "n"]) == _expected_join(
        left, right
    )


def test_join_mv_two_delta_refresh_both_sides(spark, tmp_path):
    left, right, mv, spec = _mk_join_mv(spark, tmp_path)
    storage_v0 = LakehouseTable(
        spark, M._read_meta(mv)["storage_path"]
    ).current_version()
    # left-side churn: appends + deletes + a measure update
    left.append(_facts(spark, 40, 60))
    left.delete_where(F.col("k") % 7 == 0, prune={"k": (0, 59)})
    left.update_where(F.col("k") == 3, {"amt": F.lit(100000)})
    # right-side churn: a dim row moves region (CoW update),
    # a NEW dim key appears, an old one disappears entirely
    right.update_where(F.col("g") == 2, {"region": F.lit("EU")})
    right.append(_dims(spark, [(4, "LATAM")]))  # no left rows yet
    right.delete_where(F.col("g") == 3, prune={"g": (3, 3)})
    got = _got(spark, mv, ["region", "total", "n"])
    assert got == _expected_join(left, right)
    # APAC died with its dim row: the group must be GONE, not zeroed
    assert "APAC" not in got
    meta = M._read_meta(mv)
    assert meta["last_source_version"] == left.current_version()
    assert meta["last_right_version"] == right.current_version()


def test_join_mv_right_only_commit_skips_left_slice(
    spark, tmp_path, monkeypatch
):
    """A right-only commit must maintain via L0⋈ΔR alone — the left
    changelog is never opened (pinned by monkeypatch)."""
    left, right, mv, spec = _mk_join_mv(spark, tmp_path)
    right.append(_dims(spark, [(5, "EU")]))
    right.delete_where(F.col("g") == 0, prune={"g": (0, 0)})
    left_path = os.path.abspath(left.path)
    orig = LakehouseTable.changelog

    def guard(self, *a, **kw):
        if os.path.abspath(self.path) == left_path:
            raise AssertionError(
                "right-only refresh opened the LEFT changelog"
            )
        return orig(self, *a, **kw)

    monkeypatch.setattr(LakehouseTable, "changelog", guard)
    assert _got(spark, mv, ["region", "total", "n"]) == _expected_join(
        left, right
    )


def test_join_mv_rejects_ambiguous_columns(spark, tmp_path):
    left = LakehouseTable(spark, str(tmp_path / "l"))
    left.append(
        spark.createDataFrame([Row(g=0, amt=1, region="X")])
    )
    right = LakehouseTable(spark, str(tmp_path / "r"))
    right.append(_dims(spark, [(0, "NA")]))
    spec = dict(
        JOIN_SPEC, join={"right_path": right.path, "on": ["g"]}
    )
    with pytest.raises(ValueError, match="disjoint"):
        M.create_materialized_view(
            spark, str(tmp_path / "mv"), left.path, spec
        )


def _vals(spark, lo, hi):
    return spark.createDataFrame(
        [Row(k=i, g=i % 3, v=i) for i in range(lo, hi)]
    ).repartition(2, "k")


def _expected_minmax(src):
    return {
        r["g"]: (r["hi"], r["lo"], r["total"])
        for r in src.read()
        .groupBy("g")
        .agg(
            F.max("v").alias("hi"),
            F.min("v").alias("lo"),
            F.sum("v").alias("total"),
        )
        .collect()
    }


def test_minmax_insert_only_folds_without_recompute(
    spark, tmp_path, monkeypatch
):
    src = LakehouseTable(spark, str(tmp_path / "src"))
    src.append(_vals(spark, 0, 30))
    mv = str(tmp_path / "mv")
    M.create_materialized_view(spark, mv, src.path, MINMAX_SPEC)
    src.append(_vals(spark, 30, 60))  # pure inserts: raises every max

    def boom(*a, **kw):
        raise AssertionError(
            "insert-only refresh took the recompute path"
        )

    monkeypatch.setattr(M, "_replace_phase", boom)
    monkeypatch.setattr(M, "_recompute_rows", boom)
    assert _got(spark, mv, ["g", "hi", "lo", "total"]) == (
        _expected_minmax(src)
    )


def test_minmax_delete_kills_the_max(spark, tmp_path):
    src = LakehouseTable(spark, str(tmp_path / "src"))
    src.append(_vals(spark, 0, 30))
    mv = str(tmp_path / "mv")
    M.create_materialized_view(spark, mv, src.path, MINMAX_SPEC)
    # kill group 0's current max (k=27) AND group 1's min (k=1);
    # group 2 untouched
    src.delete_where(F.col("k").isin(27, 1), prune={"k": (1, 27)})
    got = _got(spark, mv, ["g", "hi", "lo", "total"])
    assert got == _expected_minmax(src)
    assert got[0][0] == 24  # max fell back to the true second max
    assert got[1][1] == 4  # min fell back
    # a group fully deleted disappears
    src.delete_where(F.col("g") == 2, prune={"g": (2, 2)})
    got = _got(spark, mv, ["g", "hi", "lo", "total"])
    assert 2 not in got and got == _expected_minmax(src)


def test_minmax_mixed_batch_update_and_inserts(spark, tmp_path):
    src = LakehouseTable(spark, str(tmp_path / "src"))
    src.append(_vals(spark, 0, 30))
    mv = str(tmp_path / "mv")
    M.create_materialized_view(spark, mv, src.path, MINMAX_SPEC)
    # one refresh window containing: an update that LOWERS a max, new
    # inserts into the same group, and a brand-new group
    src.update_where(F.col("k") == 29, {"v": F.lit(-5)})
    src.append(
        spark.createDataFrame(
            [Row(k=100, g=2, v=7), Row(k=101, g=3, v=50)]
        ).repartition(1)
    )
    got = _got(spark, mv, ["g", "hi", "lo", "total"])
    assert got == _expected_minmax(src)
    assert got[2][1] == -5 and got[3] == (50, 50, 50)


def test_minmax_refresh_is_single_commit(spark, tmp_path):
    """A min/max refresh with BOTH insert-only and delete-touched
    groups commits exactly ONE storage snapshot (r12 — the pre-r12
    form bridged two merges with a stage marker), writes no stage
    marker, and a crash between the merge commit and the mv.json bump
    recovers idempotently (no double-apply, no extra commit)."""
    src = LakehouseTable(spark, str(tmp_path / "src"))
    src.append(_vals(spark, 0, 30))
    mv = str(tmp_path / "mv")
    M.create_materialized_view(spark, mv, src.path, MINMAX_SPEC)
    src.append(
        spark.createDataFrame(
            [Row(k=200, g=1, v=999)]
        ).repartition(1)
    )
    src.delete_where(F.col("k") == 27, prune={"k": (27, 27)})
    storage = LakehouseTable(
        spark, M._read_meta(mv)["storage_path"]
    )
    v0 = storage.current_version()
    meta = M.refresh_materialized_view(spark, mv)
    assert storage.current_version() == v0 + 1  # ONE commit
    tip = storage._read_manifest(v0 + 1)
    sm = tip.get("summary", {}) or {}
    assert sm.get("mv_refresh_stage1") is None  # no staged state
    assert int(sm["mv_refreshed_through"]) == meta[
        "last_source_version"
    ]
    got = _got(spark, mv, ["g", "hi", "lo", "total"])
    assert got == _expected_minmax(src)
    assert got[1][0] == 999 and got[0][0] == 24
    # crash between merge commit and mv.json publish: rewind mv.json
    # and refresh again — the final marker makes it a metadata bump
    meta["last_source_version"] = 1
    M._publish_sidecar(M._mv_meta_path(mv), meta)
    M.refresh_materialized_view(spark, mv)
    assert storage.current_version() == v0 + 1
    assert _got(spark, mv, ["g", "hi", "lo", "total"]) == (
        _expected_minmax(src)
    )


def test_minmax_legacy_staged_crash_recovers(spark, tmp_path):
    """UPGRADE COMPAT: a table written by the pre-r12 TWO-merge version
    that crashed after its fold merge (stage-1 marker committed, no
    recompute-replace) is finished by the next refresh — no
    double-fold, exact final state. The staged state is built here
    exactly as the old code built it."""
    src = LakehouseTable(spark, str(tmp_path / "src"))
    src.append(_vals(spark, 0, 30))
    mv = str(tmp_path / "mv")
    M.create_materialized_view(spark, mv, src.path, MINMAX_SPEC)
    # window with BOTH insert-only groups and a delete-touched group
    src.append(
        spark.createDataFrame(
            [Row(k=200, g=1, v=999)]
        ).repartition(1)
    )
    src.delete_where(F.col("k") == 27, prune={"k": (27, 27)})

    # replay the OLD code's merge #1: fold the insert-only groups and
    # commit with the stage-1 marker, then "crash"
    spec = MINMAX_SPEC
    storage = LakehouseTable(
        spark, M._read_meta(mv)["storage_path"]
    )
    l_tip = src.current_version()
    rows = M._delta_rows(src, None, spec, 1, l_tip, 0, 0)
    keys = spec["group_by"]
    del_keys = (
        rows.groupBy(*keys)
        .agg(F.min("__sign").alias("__mn"))
        .filter(F.col("__mn") < 0)
        .select(*keys)
        .localCheckpoint(eager=True)
    )
    deltas = M._agg_signed(
        rows.join(del_keys, on=keys, how="left_anti"), spec
    )
    update_cols = {
        "__mv_rows": F.col("t.__mv_rows") + F.col("s.__mv_rows"),
        "hi": F.greatest(F.col("t.hi"), F.col("s.hi")),
        "lo": F.least(F.col("t.lo"), F.col("s.lo")),
        "total": F.col("t.total") + F.col("s.total"),
    }
    storage.merge_into(
        deltas,
        on=keys,
        update_cols=update_cols,
        summary_extra={"mv_refresh_stage1": l_tip},
    )

    # the next refresh must finish the staged refresh via the legacy
    # replace phase (recompute of the delete-touched groups only)
    got = _got(spark, mv, ["g", "hi", "lo", "total"])
    assert got == _expected_minmax(src)
    assert got[1][0] == 999  # the fold landed exactly once
    assert got[0][0] == 24  # the recompute landed on recovery
    # and a subsequent refresh is a no-op
    v = LakehouseTable(
        spark, M._read_meta(mv)["storage_path"]
    ).current_version()
    M.refresh_materialized_view(spark, mv)
    assert (
        LakehouseTable(
            spark, M._read_meta(mv)["storage_path"]
        ).current_version()
        == v
    )


def test_join_minmax_composition(spark, tmp_path):
    """min/max over a join MV: the recompute path re-derives from the
    JOINED relation scoped to the touched groups."""
    left = LakehouseTable(spark, str(tmp_path / "left"))
    left.append(_facts(spark, 0, 40))
    right = LakehouseTable(spark, str(tmp_path / "right"))
    right.append(
        _dims(spark, [(0, "NA"), (1, "EU"), (2, "NA"), (3, "APAC")])
    )
    spec = {
        "group_by": ["region"],
        "aggs": {"hi": ("max", "amt"), "n": ("count", "amt")},
        "join": {"right_path": right.path, "on": ["g"]},
    }
    mv = str(tmp_path / "mv")
    M.create_materialized_view(spark, mv, left.path, spec)
    # delete the NA max (k=38, amt=380) — recompute must consult the join
    left.delete_where(F.col("k") == 38, prune={"k": (38, 38)})
    got = _got(spark, mv, ["region", "hi", "n"])
    want = {
        r["region"]: (r["hi"], r["n"])
        for r in left.read()
        .join(right.read(), on=["g"])
        .groupBy("region")
        .agg(F.max("amt").alias("hi"), F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_join_mv_fresh_path_is_metadata_only(
    spark, tmp_path, monkeypatch
):
    left, right, mv, spec = _mk_join_mv(spark, tmp_path)
    want = _got(spark, mv, ["region", "total", "n"])
    watched = {os.path.abspath(left.path), os.path.abspath(right.path)}
    orig = LakehouseTable._project_to_schema

    def guard(self, manifest, *a, **kw):
        if os.path.abspath(self.path) in watched:
            raise AssertionError(
                "fresh join-MV read touched SOURCE data"
            )
        return orig(self, manifest, *a, **kw)

    monkeypatch.setattr(LakehouseTable, "_project_to_schema", guard)
    assert _got(spark, mv, ["region", "total", "n"]) == want

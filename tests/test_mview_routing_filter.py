"""MV spec WHERE filter + first-class avg + automatic query routing
(r11 — VERDICT r10 #3/#4)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from apache_iceberg_exploration_spark.sources.lakehouse import (
    LakehouseTable,
)
from apache_iceberg_exploration_spark.sources.mview import (
    create_materialized_view,
    read_mv,
    refresh_materialized_view,
    route_aggregate,
)


def _src(spark, path, n=40):
    t = LakehouseTable(spark, path)
    t.append(
        spark.createDataFrame(
            [
                Row(k=i, g=i % 4, seg=i % 2, v=i * 10, w=float(i))
                for i in range(n)
            ]
        ).repartition(2, "k")
    )
    return t


def _expected(rows, where, group_by, aggs):
    import statistics

    kept = [r for r in rows if where(r)]
    out = {}
    for r in kept:
        key = tuple(r[c] for c in group_by)
        out.setdefault(key, []).append(r)
    res = {}
    for key, grp in out.items():
        vals = {}
        for o, (kind, col) in aggs.items():
            if kind == "count":
                vals[o] = len(grp)
            elif kind == "sum":
                vals[o] = sum(r[col] for r in grp)
            elif kind == "avg":
                vals[o] = statistics.mean(r[col] for r in grp)
            elif kind == "min":
                vals[o] = min(r[col] for r in grp)
            elif kind == "max":
                vals[o] = max(r[col] for r in grp)
        res[key] = vals
    return res


def test_filtered_avg_mv_full_and_incremental(spark, tmp_path):
    """WHERE + avg through create → append → CoW delete UNDER the
    filter → delete OUTSIDE the filter (must be invisible) → update
    that moves a row ACROSS the filter boundary."""
    src = _src(spark, str(tmp_path / "src"))
    mv = str(tmp_path / "mv")
    spec = {
        "group_by": ["g"],
        "aggs": {
            "total": ("sum", "v"),
            "n": ("count", None),
            "mean_w": ("avg", "w"),
        },
        "where": "v >= 100",
    }
    create_materialized_view(spark, mv, str(tmp_path / "src"), spec)

    def check():
        rows = [r.asDict() for r in src.read().collect()]
        want = _expected(
            rows, lambda r: r["v"] >= 100, ["g"], spec["aggs"]
        )
        got = {
            (r["g"],): {
                "total": r["total"],
                "n": r["n"],
                "mean_w": r["mean_w"],
            }
            for r in read_mv(spark, mv).collect()
        }
        for key, vals in want.items():
            assert got[key]["total"] == vals["total"], key
            assert got[key]["n"] == vals["n"], key
            assert got[key]["mean_w"] == pytest.approx(
                vals["mean_w"]
            ), key
        assert set(got) == set(want)

    check()
    # append rows straddling the filter
    src.append(
        spark.createDataFrame(
            [
                Row(k=100, g=0, seg=0, v=500, w=9.0),
                Row(k=101, g=1, seg=1, v=5, w=1.0),  # filtered out
            ]
        ).coalesce(1)
    )
    refresh_materialized_view(spark, mv)
    check()
    # delete UNDER the filter (rows that were in the MV)
    src.delete_where(F.col("v") >= 300, prune={"v": (300, 10**9)})
    refresh_materialized_view(spark, mv)
    check()
    # delete OUTSIDE the filter: refresh must be a no-op on values
    before = sorted(
        map(tuple, read_mv(spark, mv).collect())
    )
    src.delete_where(F.col("v") < 50, prune={"v": (0, 49)})
    refresh_materialized_view(spark, mv)
    after = sorted(map(tuple, read_mv(spark, mv).collect()))
    assert before == after
    # update moving a row ACROSS the boundary: v 120 -> 20 leaves the
    # filter; the MV loses it
    src.update_where(
        F.col("v") == 120, {"v": F.lit(20)}, prune={"v": (120, 120)}
    )
    refresh_materialized_view(spark, mv)
    check()


def test_avg_all_null_group_reads_null(spark, tmp_path):
    t = LakehouseTable(spark, str(tmp_path / "s"))
    t.append(
        spark.createDataFrame(
            [
                Row(g=0, w=1.5),
                Row(g=0, w=2.5),
                Row(g=1, w=None),
            ],
            "g long, w double",
        ).coalesce(1)
    )
    mv = str(tmp_path / "mv")
    create_materialized_view(
        spark,
        mv,
        str(tmp_path / "s"),
        {"group_by": ["g"], "aggs": {"m": ("avg", "w")}},
    )
    got = {r["g"]: r["m"] for r in read_mv(spark, mv).collect()}
    assert got[0] == pytest.approx(2.0)
    assert got[1] is None  # ANSI-safe zero-count division


def test_routing_serves_from_storage_not_source(spark, tmp_path):
    src = _src(spark, str(tmp_path / "src"))
    mv = str(tmp_path / "mv")
    spec = {
        "group_by": ["g", "seg"],
        "aggs": {
            "total": ("sum", "v"),
            "n": ("count", None),
            "mean_w": ("avg", "w"),
            "vmax": ("max", "v"),
        },
    }
    create_materialized_view(spark, mv, str(tmp_path / "src"), spec)
    # COARSER query (group by g only): re-aggregates MV storage
    df, info = route_aggregate(
        spark,
        [mv],
        str(tmp_path / "src"),
        ["g"],
        {
            "sv": ("sum", "v"),
            "cnt": ("count", None),
            "aw": ("avg", "w"),
            "mx": ("max", "v"),
        },
    )
    assert info["served_from"] == mv
    files = df.inputFiles()
    assert files, "routed plan must expose its scan"
    assert all("/mv/storage-" in f for f in files), files
    assert not any("/src/" in f for f in files), files
    rows = [r.asDict() for r in src.read().collect()]
    want = _expected(
        rows,
        lambda r: True,
        ["g"],
        {
            "sv": ("sum", "v"),
            "cnt": ("count", None),
            "aw": ("avg", "w"),
            "mx": ("max", "v"),
        },
    )
    got = {
        (r["g"],): r.asDict() for r in df.collect()
    }
    for key, vals in want.items():
        assert got[key]["sv"] == vals["sv"]
        assert got[key]["cnt"] == vals["cnt"]
        assert got[key]["mx"] == vals["mx"]
        assert got[key]["aw"] == pytest.approx(vals["aw"])


def test_routing_staleness_refresh_and_fallback(spark, tmp_path):
    src = _src(spark, str(tmp_path / "src"))
    mv = str(tmp_path / "mv")
    create_materialized_view(
        spark,
        mv,
        str(tmp_path / "src"),
        {"group_by": ["g"], "aggs": {"total": ("sum", "v")}},
    )
    src.append(
        spark.createDataFrame([Row(k=900, g=0, seg=0, v=1000, w=0.0)])
        .coalesce(1)
    )
    # fallback mode: stale MV left alone, answer comes from the source
    df, info = route_aggregate(
        spark,
        [mv],
        str(tmp_path / "src"),
        ["g"],
        {"total": ("sum", "v")},
        on_stale="fallback",
    )
    assert info["served_from"] == "source" and info["stale_mv"] == mv
    got = {r["g"]: r["total"] for r in df.collect()}
    assert got[0] == sum(
        r["v"] for r in src.read().collect() if r["g"] == 0
    )
    from apache_iceberg_exploration_spark.sources.mview import _read_meta

    assert _read_meta(mv)["last_source_version"] == 1  # untouched
    # refresh mode: MV refreshes, then serves from storage
    df2, info2 = route_aggregate(
        spark,
        [mv],
        str(tmp_path / "src"),
        ["g"],
        {"total": ("sum", "v")},
        on_stale="refresh",
    )
    assert info2["served_from"] == mv
    assert _read_meta(mv)["last_source_version"] == 2
    got2 = {r["g"]: r["total"] for r in df2.collect()}
    assert got2 == got
    # within budget: storage served as-is, no refresh machinery
    df3, info3 = route_aggregate(
        spark,
        [mv],
        str(tmp_path / "src"),
        ["g"],
        {"total": ("sum", "v")},
        max_staleness_versions=5,
    )
    assert info3["served_from"] == mv


def test_routing_spec_mismatch_falls_back(spark, tmp_path):
    _src(spark, str(tmp_path / "src"))
    mv = str(tmp_path / "mv")
    create_materialized_view(
        spark,
        mv,
        str(tmp_path / "src"),
        {
            "group_by": ["g"],
            "aggs": {"total": ("sum", "v")},
            "where": "v >= 100",
        },
    )
    src_path = str(tmp_path / "src")
    # different WHERE → no match
    _df, info = route_aggregate(
        spark, [mv], src_path, ["g"], {"total": ("sum", "v")},
        where="v >= 200",
    )
    assert info["served_from"] == "source"
    # agg not declared on the MV → no match
    _df, info = route_aggregate(
        spark, [mv], src_path, ["g"], {"mw": ("min", "w")},
        where="v >= 100",
    )
    assert info["served_from"] == "source"
    # group-by NOT a subset of the MV's → no match
    _df, info = route_aggregate(
        spark, [mv], src_path, ["seg"], {"total": ("sum", "v")},
        where="v >= 100",
    )
    assert info["served_from"] == "source"
    # exact spec → match
    _df, info = route_aggregate(
        spark, [mv], src_path, ["g"], {"t2": ("sum", "v")},
        where="v >= 100",
    )
    assert info["served_from"] == mv


def test_filtered_join_mv_two_delta(spark, tmp_path):
    """Join MV with a WHERE over both sides: two-delta refresh stays
    exact when commits land on each side and a delete touches rows
    under the filter."""
    left = LakehouseTable(spark, str(tmp_path / "L"))
    left.append(
        spark.createDataFrame(
            [Row(cust=i % 6, amt=i * 10) for i in range(30)]
        ).repartition(2, "cust")
    )
    right = LakehouseTable(spark, str(tmp_path / "R"))
    right.append(
        spark.createDataFrame(
            [Row(cust=i, nat=i % 2, score=i * 100) for i in range(6)]
        ).coalesce(1)
    )
    mv = str(tmp_path / "mv")
    spec = {
        "group_by": ["nat"],
        "aggs": {"total": ("sum", "amt"), "n": ("count", None)},
        "join": {"right_path": str(tmp_path / "R"), "on": ["cust"]},
        "where": "amt >= 50 AND score >= 100",
    }
    create_materialized_view(spark, mv, str(tmp_path / "L"), spec)

    def want():
        l_rows = [r.asDict() for r in left.read().collect()]
        r_rows = {
            r["cust"]: r.asDict() for r in right.read().collect()
        }
        out: dict = {}
        for lr in l_rows:
            rr = r_rows.get(lr["cust"])
            if rr is None:
                continue
            if not (lr["amt"] >= 50 and rr["score"] >= 100):
                continue
            d = out.setdefault(rr["nat"], {"total": 0, "n": 0})
            d["total"] += lr["amt"]
            d["n"] += 1
        return out

    def check():
        got = {
            r["nat"]: {"total": r["total"], "n": r["n"]}
            for r in read_mv(spark, mv).collect()
        }
        assert got == want()

    check()
    # left-side commit (some rows below the amt filter)
    left.append(
        spark.createDataFrame(
            [Row(cust=0, amt=3), Row(cust=1, amt=700)]
        ).coalesce(1)
    )
    refresh_materialized_view(spark, mv)
    check()
    # right-side commit: a dim row crossing the score filter
    right.append(
        spark.createDataFrame([Row(cust=6, nat=0, score=50)]).coalesce(1)
    )
    left.append(
        spark.createDataFrame([Row(cust=6, amt=999)]).coalesce(1)
    )
    refresh_materialized_view(spark, mv)
    check()
    # delete UNDER the filter on the left
    left.delete_where(
        F.col("amt") >= 200, prune={"amt": (200, 10**9)}
    )
    refresh_materialized_view(spark, mv)
    check()

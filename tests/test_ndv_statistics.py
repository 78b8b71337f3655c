"""Puffin-style NDV table statistics (VERDICT r7 #3): ``analyze()``
persists per-column distinct-count sketches (the portable integer HLL,
cross-engine exact) as sidecar stats files; ``statistics()`` lists
them; the per-file row counts they carry feed stats-driven planning
when a manifest predates ``__rows`` tracking.
"""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from apache_iceberg_exploration_spark.sources.lakehouse import (
    LakehouseTable,
)


@pytest.fixture
def table(spark, tmp_path):
    return LakehouseTable(spark, str(tmp_path / "tbl"))


def _data(spark, lo=0, hi=1000):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") % 37).alias("grp"),
        F.concat(F.lit("u"), (F.col("id") % 211).cast("string")).alias(
            "name"
        ),
    )


def test_analyze_estimates_within_hll_bounds(spark, table):
    table.append(_data(spark))
    summary = table.analyze()
    assert summary["mode"] == "full"
    # p=9 HLL: ~4.6% standard error; allow 4 sigma
    for col, exact in [("k", 1000), ("grp", 37), ("name", 211)]:
        est = summary["ndv"][col]
        assert abs(est - exact) <= max(4, 0.2 * exact), (col, est)


def test_analyze_incremental_merge_is_lossless(spark, table):
    table.append(_data(spark, 0, 1000))
    table.analyze()
    table.append(_data(spark, 1000, 2000))
    s_inc = table.analyze()
    assert s_inc["mode"] == "incremental"
    assert s_inc["analyzed_files"] < len(
        table._read_manifest(table.current_version())["files"]
    )
    # register merge must equal a from-scratch sketch of everything
    import shutil

    shutil.rmtree(table._stats_dir)
    s_full = table.analyze()
    assert s_full["mode"] == "full"
    assert s_inc["ndv"] == s_full["ndv"]


def test_rewrite_triggers_full_recompute(spark, table):
    table.append(_data(spark))
    table.analyze()
    table.rewrite_small_files()
    s = table.analyze()
    assert s["mode"] == "full"


def test_statistics_metadata_table(spark, table):
    table.append(_data(spark))
    table.analyze()
    table.append(_data(spark, 1000, 1100))
    rows = {
        (r["stats_version"], r["column_name"]): r
        for r in table.statistics().collect()
    }
    assert (1, "k") in rows and rows[(1, "k")]["stale"] is True
    s2 = table.analyze()
    rows = {
        (r["stats_version"], r["column_name"]): r
        for r in table.statistics().collect()
    }
    assert rows[(2, "k")]["stale"] is False
    assert rows[(2, "k")]["ndv"] == s2["ndv"]["k"]
    assert rows[(2, "k")]["mode"] == "incremental"


def test_analyze_validation(spark, table):
    table.append(_data(spark))
    with pytest.raises(ValueError, match="no such columns"):
        table.analyze(columns=["nope"])


def _strip_rows_stats(root: str) -> None:
    """Simulate a legacy table whose manifests predate __rows tracking:
    remove the __rows key from every stats map (inline and parts)."""
    for p in glob.glob(
        os.path.join(root, "snapshots", "**", "*.json"), recursive=True
    ):
        with open(p) as fh:
            m = json.load(fh)
        stats = m.get("stats")
        changed = False
        if isinstance(stats, dict):
            for st in stats.values():
                if isinstance(st, dict) and "__rows" in st:
                    del st["__rows"]
                    changed = True
        if changed:
            with open(p, "w") as fh:
                json.dump(m, fh)


def test_analyze_rows_flip_changelog_to_broadcast(spark, table):
    """The stats-driven-planning consumption (VERDICT r7 #3): the
    row-level changelog's broadcast decomposition needs per-side row
    counts. With __rows stripped from the manifests (legacy table) the
    decision is unknowable → full-outer SortMergeJoin; after analyze()
    the sidecar's file_rows fill the gap → the small side broadcasts."""
    big = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    table.append(big.coalesce(1).sortWithinPartitions("k"))
    v0 = table.current_version()
    table.update_where(
        F.col("k") == 7, {"v": F.lit(-1)}, prune={"k": (0, 10)}
    )
    _strip_rows_stats(table.path)
    # fresh handle: manifest PARTS are cached per instance, and the
    # strip above mutated them on disk
    table = LakehouseTable(spark, table.path)

    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            table.changelog(v0, row_level=True)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin [_row_id" not in plan
        table.analyze(columns=["k"])
        plan2 = (
            table.changelog(v0, row_level=True)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin [_row_id" in plan2
        # and the feed itself is correct either way
        evs = {
            (r["_change_type"], r["k"])
            for r in table.changelog(v0, row_level=True).collect()
        }
        assert evs == {
            ("update_preimage", 7),
            ("update_postimage", 7),
        }
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", old_thresh
        )

"""Table properties (Iceberg TBLPROPERTIES): stored table-level config
that DRIVES engine behavior — write distribution mode, merge/changelog
broadcast thresholds, the DV decode regime, the expire retention floor.
Explicit method arguments always win; unset keys fall back to engine
defaults.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_iceberg_exploration_spark.sources.lakehouse import (
    LakehouseTable,
)


@pytest.fixture
def table(spark, tmp_path):
    return LakehouseTable(spark, str(tmp_path / "tbl"))


def _df(spark, lo=0, hi=40):
    return spark.createDataFrame(
        [(i, "a" if i % 2 else "b", i * 10) for i in range(lo, hi)],
        "k long, seg string, v long",
    )


def test_set_get_unset_roundtrip(spark, table):
    assert table.properties() == {}
    assert table.get_property("write.distribution-mode") == "none"
    table.set_property("write.distribution-mode", "hash")
    table.set_property("owner.team", "data-eng")  # free-form
    assert table.properties() == {
        "write.distribution-mode": "hash",
        "owner.team": "data-eng",
    }
    table.unset_property("write.distribution-mode")
    assert table.get_property("write.distribution-mode") == "none"
    assert table.get_property("owner.team") == "data-eng"
    assert table.get_property("not.set") is None


def test_behavior_key_validation(spark, table):
    with pytest.raises(ValueError, match="not in"):
        table.set_property("write.distribution-mode", "range")
    with pytest.raises(ValueError, match="non-negative integer"):
        table.set_property("write.merge.broadcast-threshold-rows", "lots")


def test_distribution_mode_property_drives_layout(spark, table):
    """write.distribution-mode=hash clusters a partitioned write to ONE
    file per partition tuple without passing distribution= explicitly."""
    table.set_property("write.distribution-mode", "hash")
    table.append(_df(spark).repartition(8), partition_by=["seg"])
    counts = {
        r["partition"]: r["file_count"]
        for r in table.partitions().collect()
    }
    assert counts == {'{"seg":"a"}': 1, '{"seg":"b"}': 1}
    # explicit argument still wins over the property
    table.unset_property("write.distribution-mode")
    table.append(
        _df(spark, 100, 140).repartition(8),
        partition_by=["seg"],
        distribution="hash",
    )
    counts = {
        r["partition"]: r["file_count"]
        for r in table.partitions().collect()
    }
    assert counts == {'{"seg":"a"}': 2, '{"seg":"b"}': 2}


def test_merge_broadcast_threshold_property(spark, table):
    src_df = _df(spark)
    table.overwrite(src_df)
    captured = []
    orig = LakehouseTable._write_data_files

    def spy(self, df, *a, **kw):
        captured.append(
            df._jdf.queryExecution().executedPlan().toString()
        )
        return orig(self, df, *a, **kw)

    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    LakehouseTable._write_data_files = spy
    try:
        small = src_df.limit(5).select(
            "k", (F.col("v") + 1).alias("nv")
        )
        # property forbids broadcasting even 5 rows
        table.set_property("write.merge.broadcast-threshold-rows", "1")
        table.merge_into(
            small,
            on=["k"],
            update_cols={"v": F.col("s.nv")},
            insert_unmatched=False,
            prune_on="k",
        )
        assert "BroadcastHashJoin [k" not in captured[-1]
        # property permits it again
        table.set_property(
            "write.merge.broadcast-threshold-rows", "100000"
        )
        captured.clear()
        table.merge_into(
            small.select("k", (F.col("nv") + 1).alias("nv")),
            on=["k"],
            update_cols={"v": F.col("s.nv")},
            insert_unmatched=False,
            prune_on="k",
        )
        assert "BroadcastHashJoin [k" in captured[-1]
    finally:
        LakehouseTable._write_data_files = orig
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", old_thresh
        )


def test_expire_retention_floor_property(spark, table):
    for i in range(4):
        table.append(_df(spark, i * 10, i * 10 + 5).coalesce(1))
    table.set_property("history.expire.min-snapshots-to-keep", "3")
    expired = table.expire_snapshots()
    assert expired == [1]
    assert table.read(version=2).count() == 10  # retained
    # explicit argument overrides the property
    expired = table.expire_snapshots(keep_last=1)
    assert expired == [2, 3]


def test_dv_inline_threshold_property(spark, table):
    """Forcing the inline threshold to 0 routes DV decode through the
    mapInPandas executor path — results identical either way."""
    table.append(_df(spark).coalesce(1))
    table.delete_where_dv(F.col("k") % 5 == 0)
    expect = sorted(
        r["k"] for r in table.read().collect()
    )
    table.set_property("read.dv.inline-threshold-rows", "0")
    got = sorted(r["k"] for r in table.read().collect())
    assert got == expect and len(got) == 32


def test_expire_never_deletes_current_snapshot(spark, table):
    table.append(_df(spark, 0, 5).coalesce(1))
    table.append(_df(spark, 5, 10).coalesce(1))
    table.set_property("history.expire.min-snapshots-to-keep", "0")
    expired = table.expire_snapshots()  # clamped to keep_last=1
    assert expired == [1]
    assert table.read().count() == 10

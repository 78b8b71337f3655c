"""Partition statistics files (VERDICT r7 #4): every main-chain commit
writes an O(partitions) per-snapshot rollup sidecar
(snapshots/pstats/v{N}.json, the Iceberg partition-stats file shape),
maintained INCREMENTALLY from the parent's sidecar + the commit's file
delta. ``partitions()`` serves from it with zero manifest fold; absence
(pre-pstats snapshots, sink commits, crashed writes) falls back to the
manifest aggregation.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from apache_iceberg_exploration_spark.sources.lakehouse import (
    LakehouseTable,
)


@pytest.fixture
def table(spark, tmp_path):
    return LakehouseTable(spark, str(tmp_path / "tbl"))


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _fold_rows(table, version):
    """The manifest-fold answer, forced by hiding the sidecar."""
    p = table._pstats_path(version)
    assert os.path.exists(p)
    os.rename(p, p + ".hidden")
    try:
        return _rows(table.partitions(version))
    finally:
        os.rename(p + ".hidden", p)


def _seeded(spark, table):
    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b", i * 10) for i in range(100)],
        "k long, seg string, v long",
    )
    table.overwrite(df, partition_by=["seg"])
    table.append(
        df.withColumn("k", F.col("k") + 100), partition_by=["seg"]
    )
    return df


def test_pstats_matches_manifest_fold_through_mutations(spark, table):
    df = _seeded(spark, table)
    table.delete_where_dv(F.col("k") % 10 == 3)
    table.update_where(
        F.col("k") == 4, {"v": F.lit(-1)}, prune={"k": (0, 10)}
    )
    table.rewrite_small_files()
    table.rollback(2)
    table.append(df.withColumn("k", F.col("k") + 300))  # unpartitioned
    for v in range(1, table.current_version() + 1):
        assert _rows(table.partitions(v)) == _fold_rows(table, v), v


def test_partitions_is_metadata_only_when_sidecar_present(spark, table):
    """The sidecar path must not even consult the files() metadata
    table (which folds manifests) — O(partitions) by construction."""
    _seeded(spark, table)

    def boom(*a, **kw):  # pragma: no cover
        raise AssertionError("files() consulted despite sidecar")

    table.files = boom
    got = {r["partition"]: r["row_count"] for r in table.partitions().collect()}
    assert got == {'{"seg":"a"}': 100, '{"seg":"b"}': 100}


def test_fallback_when_sidecar_absent(spark, table):
    _seeded(spark, table)
    v = table.current_version()
    os.remove(table._pstats_path(v))
    got = {r["partition"]: r["row_count"] for r in table.partitions().collect()}
    assert got == {'{"seg":"a"}': 100, '{"seg":"b"}': 100}


def test_sink_commit_falls_back(spark, table):
    """Sink/_commit_append commits don't write pstats — partitions()
    must still answer (manifest fold)."""
    from apache_iceberg_exploration_spark.streaming.lakehouse_sink import (
        _commit_append,
        _write_one_file,
    )

    table.append(
        spark.range(0, 10).select(F.col("id").alias("k")).coalesce(1)
    )
    path, stats = _write_one_file(
        [{"k": 100 + i} for i in range(5)], table.path + "/data"
    )
    v = _commit_append(table.path, [path], {path: stats}, {})
    assert not os.path.exists(table._pstats_path(v))
    got = table.partitions(v).collect()
    assert got[0]["file_count"] == 2 and got[0]["row_count"] == 15


def test_expire_snapshots_sweeps_sidecars(spark, table):
    _seeded(spark, table)
    table.append(
        spark.range(0, 5).select(
            F.col("id").alias("k"),
            F.lit("a").alias("seg"),
            F.lit(0).alias("v"),
        ),
        partition_by=["seg"],
    )
    table.analyze(columns=["k"])
    import glob as _glob

    assert len(_glob.glob(table._pstats_dir + "/v*.json")) == 3
    table.analyze(columns=["k"])  # same version: still one ndv file
    table.expire_snapshots(keep_last=1)
    left = _glob.glob(table._pstats_dir + "/v*.json")
    assert [p.split("/")[-1] for p in left] == ["v3.json"]
    # the newest NDV blob survives expiry (incremental-merge seed)
    assert table._latest_ndv_file() is not None
    assert table.partitions().count() >= 1

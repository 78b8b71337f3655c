"""Manifest-parts layer (Iceberg manifest-list design): commits write
O(added) metadata, parts are immutable and carried across snapshots,
GC reclaims them with their manifests, and inline-format manifests from
older table versions still read."""

from __future__ import annotations

import glob
import json
import os

import pytest

from apache_iceberg_exploration_spark.sources.lakehouse import LakehouseTable

from .conftest import SF_SMOKE


@pytest.fixture
def table(spark, tmp_path):
    return LakehouseTable(spark, str(tmp_path / "tbl"))


def _raw(table, version):
    with open(table._manifest_path(version)) as f:
        return json.load(f)


def test_append_writes_o_added_metadata(spark, table):
    """Each append carries every prior part untouched and adds exactly
    one new part listing only the new files — the committed JSON no
    longer scales with table size."""
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    table.overwrite(cust.repartition(4))
    m1 = _raw(table, 1)
    assert len(m1["parts"]) == 1
    table.append(cust.limit(10).repartition(1))
    m2 = _raw(table, 2)
    assert m2["parts"][: len(m1["parts"])] == m1["parts"]  # carried
    assert len(m2["parts"]) == len(m1["parts"]) + 1
    new_part = json.load(open(m2["parts"][-1]))
    assert len(new_part["files"]) == 1  # only the appended file
    # no O(files) payload inline in the committed manifest
    assert "files" not in m2 and "stats" not in m2
    # the materialized view is complete: all files, all stats
    full = table._read_manifest(2)
    assert len(full["files"]) == 5
    assert set(full["stats"]) >= set(full["files"])


def test_delete_rewrites_only_touched_parts(spark, table):
    """CoW delete keeps the parts whose files survive intact and writes
    one new part for the rewrite — O(touched), not O(table)."""
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    sorted_c = cust.orderBy("c_custkey")
    for lo, hi in ((0, 50), (50, 100), (100, 150)):
        table.append(
            sorted_c.filter(
                (F_col("c_custkey") >= lo) & (F_col("c_custkey") < hi)
            ).coalesce(1)
        )
    parts_before = _raw(table, 3)["parts"]
    # delete touches only the first range's file
    table.delete_where(
        F_col("c_custkey") < 10, prune={"c_custkey": (0, 9)}
    )
    parts_after = _raw(table, table.current_version())["parts"]
    survivors = set(parts_before) & set(parts_after)
    assert survivors, "untouched parts were rewritten"
    assert table.read().filter("c_custkey < 10").count() == 0


def test_inline_format_manifest_still_reads(spark, table):
    """Back-compat: a manifest with the flat inline payload (pre-parts
    format) materializes as-is."""
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    table.overwrite(cust)
    raw = _raw(table, 1)
    inline = table._read_manifest(1)  # materialized flat form
    inline.pop("parts", None)
    inline.pop("part_keys", None)
    os.remove(table._manifest_path(1))
    with open(table._manifest_path(1), "w") as f:
        json.dump(inline, f)
    assert table.read().count() == cust.count()
    assert set(table._read_manifest(1)["files"]) == set(
        f for p in raw["parts"] for f in json.load(open(p))["files"]
    )


def test_expire_reclaims_expired_parts(spark, table):
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    table.overwrite(cust.limit(50))
    table.overwrite(cust.limit(80))  # v2 replaces v1's files AND part
    v1_parts = set(_raw(table, 1)["parts"])
    v2_parts = set(_raw(table, 2)["parts"])
    table.expire_snapshots(keep_last=1)
    for p in v1_parts - v2_parts:
        assert not os.path.exists(p)
    for p in v2_parts:
        assert os.path.exists(p)
    assert table.read().count() == 80


def test_drop_branch_reclaims_branch_parts(spark, table):
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    table.overwrite(cust.limit(50))
    table.create_branch("wip")
    table.append_branch("wip", cust.limit(5))
    branch_manifests = glob.glob(
        os.path.join(table._branch_dir("wip"), "v*.json")
    )
    bparts = {
        p
        for bm in branch_manifests
        for p in json.load(open(bm)).get("parts", [])
    }
    main_parts = set(_raw(table, 1)["parts"])
    table.drop_branch("wip")
    for p in bparts - main_parts:
        assert not os.path.exists(p)
    for p in main_parts:
        assert os.path.exists(p)
    assert table.read().count() == 50


def test_orphan_sweep_collects_stranded_parts(spark, table):
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    table.overwrite(cust.limit(50))
    stray = os.path.join(table._parts_dir, "part-deadbeef.json")
    with open(stray, "w") as f:
        json.dump({"files": []}, f)
    os.utime(stray, (1, 1))  # old enough to pass the age guard
    removed = table.remove_orphan_files(older_than_seconds=10.0)
    assert stray in removed and not os.path.exists(stray)
    for p in _raw(table, 1)["parts"]:
        assert os.path.exists(p)


def F_col(name):
    from pyspark.sql import functions as F

    return F.col(name)


def test_rewrite_manifest_parts_consolidates(spark, table):
    """CALL rewrite_manifests: N commits → N parts → one metadata-only
    commit collapses the part list to 1 with identical contents; the
    next append carries the consolidated part."""
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    for i in range(4):
        table.append(
            cust.filter(F_col("c_custkey") % 4 == i).coalesce(1)
        )
    v = table.current_version()
    before = table._read_manifest(v)
    assert len(_raw(table, v)["parts"]) == 4
    data_dirs = set(glob.glob(os.path.join(table.path, "data", "*")))

    m = table.rewrite_manifest_parts()
    assert m is not None and "_no_carry" not in m
    v2 = table.current_version()
    assert v2 == v + 1
    raw2 = _raw(table, v2)
    assert len(raw2["parts"]) == 1
    after = table._read_manifest(v2)
    assert sorted(after["files"]) == sorted(before["files"])
    assert after.get("stats") == before.get("stats")
    assert after.get("file_seq") == before.get("file_seq")
    # metadata-only: no new data directories
    assert set(glob.glob(os.path.join(table.path, "data", "*"))) == data_dirs
    # idempotent: a second rewrite is a no-op
    assert table.rewrite_manifest_parts() is None
    # the next append carries the consolidated part
    table.append(cust.limit(3).coalesce(1))
    raw3 = _raw(table, table.current_version())
    assert raw3["parts"][0] == raw2["parts"][0]
    assert len(raw3["parts"]) == 2


def test_merge_on_commit_bounds_part_count_500_commits(spark, tmp_path):
    """Long-history planning (VERDICT r11 #6): 500 append-shaped
    commits must NOT leave 500 manifest parts — merge-on-commit folds
    small parts once the carried count reaches
    commit.manifest.min-count-to-merge, so materializing the tip
    manifest opens a BOUNDED number of part files (O(threshold), not
    O(commits)) and per-commit carry scans stay bounded too. Spark-free:
    drives the real _factor_parts/_materialize_manifest on synthetic
    manifests — the exact code path every commit takes."""
    table = LakehouseTable(spark, str(tmp_path / "tbl"))
    os.makedirs(table._parts_dir, exist_ok=True)
    files: list[str] = []
    stats: dict = {}
    seqs: dict = {}
    prev = None
    max_parts = 0
    for i in range(500):
        f = f"/data/s{i}/part-{i}.parquet"
        files.append(f)
        stats[f] = {"__rows": 10, "k": [i, i]}
        seqs[f] = i + 1
        m = {
            "files": list(files),
            "stats": dict(stats),
            "file_seq": dict(seqs),
        }
        table._factor_parts(m, prev)
        prev = m
        max_parts = max(max_parts, len(m["parts"]))
    # bounded: threshold (100) + ~8 large parts + slack, never O(500)
    assert max_parts <= 120, max_parts
    assert len(prev["parts"]) <= 120
    # a FRESH handle (cold part cache) materializes the full content
    # from that bounded part list — this is the planning read
    fresh = LakehouseTable(spark, str(tmp_path / "tbl"))
    mat = fresh._materialize_manifest(
        {"parts": prev["parts"], "part_keys": ["stats", "file_seq"]}
    )
    assert sorted(mat["files"]) == sorted(files)
    assert mat["stats"] == stats and mat["file_seq"] == seqs


def test_merge_on_commit_real_table_roundtrip(spark, table):
    """Integration: with a low merge threshold, real appends fold small
    parts at commit and every read surface stays exact."""
    table.set_property("commit.manifest.min-count-to-merge", 5)
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    for i in range(9):
        table.append(
            cust.filter(F_col("c_custkey") % 9 == i).coalesce(1)
        )
    v = table.current_version()
    assert len(_raw(table, v)["parts"]) < 9
    m = table._read_manifest(v)
    assert len(m["files"]) == 9
    assert set(m["stats"]) >= set(m["files"])
    assert table.read().count() == cust.count()
    # time travel across the merge boundary still exact
    assert table.read(version=3).count() == cust.filter(
        F_col("c_custkey") % 9 < 3
    ).count()


def test_batch_reader_prunes_files_from_pushed_filters(spark, table):
    """Unit-level check of the DSv2 batch reader: pushed range filters
    fold into bounds and partitions() plans only stats-surviving files."""
    from pyspark.sql import functions as F
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThanOrEqual

    from apache_iceberg_exploration_spark.streaming.lakehouse_source import (
        make_lakehouse_batch_source,
    )

    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").orderBy(
        "c_custkey"
    )
    for lo, hi in ((0, 50), (50, 100), (100, 150)):
        table.append(
            cust.filter(
                (F.col("c_custkey") >= lo) & (F.col("c_custkey") < hi)
            ).coalesce(1)
        )
    src = make_lakehouse_batch_source()(options={"path": table.path})
    reader = src.reader(src.schema())
    kept_filters = list(
        reader.pushFilters(
            [
                GreaterThanOrEqual(("c_custkey",), 60),
                LessThanOrEqual(("c_custkey",), 80),
            ]
        )
    )
    assert len(kept_filters) == 2  # all filters returned for row-level
    parts = reader.partitions()
    assert len(parts) == 1  # only the 50-100 file survives
    total = len(table._read_manifest(table.current_version())["files"])
    assert total == 3


def test_batch_format_timestamp_as_of(spark, table):
    """timestampAsOf resolves to the newest snapshot at or before the
    timestamp (focused test for the r12 newest-first early-stop scan:
    between-commit ts → v1, after-tip ts → tip, before-v1 ts → error)."""
    import json as _json
    import time as _time

    import pytest as _pytest

    from apache_iceberg_exploration_spark.streaming.lakehouse_source import (
        make_lakehouse_batch_source,
    )

    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").select(
        "c_custkey"
    )
    table.append(cust.filter(F_col("c_custkey") < 10))   # v1
    table.append(cust.filter(F_col("c_custkey") >= 10))  # v2
    t1 = _json.load(open(table._manifest_path(1)))["committed_at"]
    t2 = _json.load(open(table._manifest_path(2)))["committed_at"]
    spark.dataSource.register(make_lakehouse_batch_source())

    def read_at(ts):
        return (
            spark.read.format("lakehouse")
            .option("path", table.path)
            .option("timestampAsOf", str(ts))
            .load()
            .count()
        )

    assert read_at((t1 + t2) / 2) == 10      # between commits → v1
    assert read_at(_time.time() + 60) == cust.count()  # after tip → v2
    with _pytest.raises(Exception, match="no snapshot"):
        read_at(t1 - 10)


def test_batch_format_time_travel_and_mor_guard(spark, table):
    """versionAsOf reads a historical snapshot through the DSv2 format;
    a snapshot with pending MoR deletes is refused loudly instead of
    resurrecting deleted rows."""
    from pyspark.sql import functions as F

    from apache_iceberg_exploration_spark.streaming.lakehouse_source import (
        make_lakehouse_batch_source,
    )

    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    table.append(cust.filter(F.col("c_custkey") < 20))   # v1
    table.append(                                        # v2
        cust.filter((F.col("c_custkey") >= 20) & (F.col("c_custkey") < 30))
    )
    spark.dataSource.register(make_lakehouse_batch_source())
    v1 = (
        spark.read.format("lakehouse")
        .option("path", table.path)
        .option("versionAsOf", 1)
        .load()
    )
    assert v1.count() == 20
    cur = spark.read.format("lakehouse").option("path", table.path).load()
    assert cur.count() == 30

    table.delete_where_mor(F.col("c_custkey") < 5, keys=["c_custkey"])
    # r7: the batch format APPLIES equality deletes (planning seq+stats
    # scoping, executor key-parquet masks) instead of the r6 refusal
    assert (
        spark.read.format("lakehouse").option("path", table.path).load().count()
        == 25
    )
    # and still after compaction materializes them
    table.rewrite_data_files(target_file_count=2)
    assert (
        spark.read.format("lakehouse").option("path", table.path).load().count()
        == 25
    )

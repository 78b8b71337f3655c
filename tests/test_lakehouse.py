"""Lakehouse table-format tests: snapshot round-trip (formalizes the
reference sparkmini's eyeball read-back verification, SURVEY.md §5.1),
time travel, MERGE upsert, compaction, snapshot expiration, and the
concurrent-append snapshot-isolation experiment (O9 — the reference's
'iceberg-concurrent-write-isolation-test' appName, made a real test)."""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

from apache_iceberg_exploration_spark.sources.io import load_table
from apache_iceberg_exploration_spark.sources.lakehouse import (
    LakehouseTable,
)

from .conftest import SF_SMOKE
from .oracle_utils import value_hash


@pytest.fixture
def table(spark, tmp_path):
    return LakehouseTable(spark, str(tmp_path / "tbl"))


def _hash_df(df):
    return value_hash([tuple(r) for r in df.collect()], df.columns)


def test_roundtrip_hash(spark, table):
    src = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    table.overwrite(src)
    assert _hash_df(table.read()) == _hash_df(src)
    assert table.current_version() == 1


def test_append_and_time_travel(spark, table):
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    first = cust.filter(F.col("c_custkey") < 50)
    rest = cust.filter(F.col("c_custkey") >= 50)
    table.overwrite(first)
    table.append(rest)
    assert table.read(version=1).count() == first.count()
    assert table.read(version=2).count() == cust.count()
    assert _hash_df(table.read()) == _hash_df(cust)
    ops = [s["operation"] for s in table.snapshots()]
    assert ops == ["overwrite", "append"]


def test_merge_upsert(spark, table):
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    table.overwrite(cust)
    source = spark.createDataFrame(
        [(1, 999.99), (2, 111.11), (10_000_001, 42.0)],
        "c_custkey long, new_bal double",
    ).select(
        "c_custkey",
        F.lit("NEW CUSTOMER").alias("c_name"),
        F.lit(0).alias("c_nationkey"),
        F.col("new_bal").alias("c_acctbal"),
        F.lit("BUILDING").alias("c_mktsegment"),
    )
    table.merge_into(
        source,
        on=["c_custkey"],
        update_cols={"c_acctbal": F.col("s.c_acctbal")},
    )
    out = {r.c_custkey: r for r in table.read().collect()}
    assert out[1].c_acctbal == 999.99  # matched → updated
    assert out[2].c_acctbal == 111.11
    assert out[1].c_name != "NEW CUSTOMER"  # matched keeps other cols
    assert out[10_000_001].c_name == "NEW CUSTOMER"  # unmatched → inserted
    assert len(out) == cust.count() + 1


def test_compaction_preserves_data(spark, table):
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    for i in range(4):  # many small appends → many files
        table.append(cust.filter(F.col("c_custkey") % 4 == i).repartition(4))
    before = table._read_manifest(table.current_version())["files"]
    pre_hash = _hash_df(table.read())
    table.rewrite_data_files(target_file_count=2)
    after = table._read_manifest(table.current_version())["files"]
    assert len(after) < len(before)
    assert len(after) <= 2
    assert _hash_df(table.read()) == pre_hash


def test_expire_snapshots(spark, table):
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    table.overwrite(cust.filter(F.col("c_custkey") < 10))
    table.overwrite(cust.filter(F.col("c_custkey") < 20))
    table.overwrite(cust.filter(F.col("c_custkey") < 30))
    expired = table.expire_snapshots(keep_last=1)
    assert expired == [1, 2]
    assert table.read().count() == cust.filter(F.col("c_custkey") < 30).count()
    with pytest.raises(FileNotFoundError):
        table._read_manifest(1)
    # only the surviving snapshot's data dirs remain on disk
    import glob as g
    import os

    live_dirs = g.glob(os.path.join(table.path, "data", "*"))
    assert len(live_dirs) == 1


def test_concurrent_append_isolation(spark, table):
    """O9: N threads append concurrently; optimistic retry must linearize
    them — every row lands exactly once, versions form a gapless chain."""
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").cache()
    cust.count()
    table.overwrite(cust.filter(F.col("c_custkey") < 0))  # empty base
    n_writers = 6
    errs = []

    def writer(i):
        try:
            table.append(cust.filter(F.col("c_custkey") % n_writers == i))
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(n_writers)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    assert not errs
    assert table.current_version() == 1 + n_writers  # gapless chain
    assert table.read().count() == cust.count()  # nothing lost or doubled
    assert _hash_df(table.read()) == _hash_df(cust)


def test_expire_leaves_inflight_data_dirs(spark, table):
    """A data directory written but not yet committed (in-flight writer)
    must survive expire_snapshots; remove_orphan_files reaps it only
    after the grace period."""
    import glob as g
    import os

    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    table.overwrite(cust)
    table.overwrite(cust.limit(5))
    # simulate an in-flight commit: data files exist, manifest not published
    table._write_data_files(cust.limit(3))
    n_dirs = len(g.glob(os.path.join(table.path, "data", "*")))
    table.expire_snapshots(keep_last=1)
    live = g.glob(os.path.join(table.path, "data", "*"))
    # v1's dir is gone, the in-flight dir survives alongside v2's
    assert len(live) == n_dirs - 1
    # age-gated orphan cleanup: too young -> kept; age 0 -> reaped
    assert table.remove_orphan_files(older_than_seconds=3600) == []
    removed = table.remove_orphan_files(older_than_seconds=0.0)
    assert len(removed) == 1
    assert table.read().count() == 5  # committed data untouched


def test_sorted_compaction_clusters_files(spark, table):
    """Sort-order rewrite: each output file covers a narrow key range
    (verified from parquet footers), so min/max pruning can skip files —
    and the data is unchanged."""
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    for i in range(3):
        table.append(orders.filter(F.col("o_orderkey") % 3 == i).repartition(3))
    pre = _hash_df(table.read().select("o_orderkey", "o_totalprice"))
    table.rewrite_data_files(target_file_count=4, sort_by=["o_orderkey"])
    assert table.snapshots()[-1]["operation"] == "compact"
    post_files = table._read_manifest(table.current_version())["files"]
    import pyarrow.parquet as pq

    ranges = []
    for f in post_files:
        md = pq.ParquetFile(f).metadata
        idx = next(
            i for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "o_orderkey"
        )
        mins = [md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups)]
        maxs = [md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups)]
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    # files are disjoint by key range (clustered), not interleaved
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, ranges
    assert _hash_df(table.read().select("o_orderkey", "o_totalprice")) == pre


def test_incremental_read_appends_only(spark, table):
    """read_incremental returns exactly the rows added after the
    checkpointed version — the consumption pattern replacing the
    reference's recompute-everything daily overwrite."""
    cust = load_table(spark, SF_SMOKE, "customer")
    table.append(cust.filter(F.col("c_custkey") < 10))
    v1 = table.current_version()
    table.append(cust.filter((F.col("c_custkey") >= 10) & (F.col("c_custkey") < 20)))
    table.append(cust.filter(F.col("c_custkey") == 25))
    inc = table.read_incremental(v1)
    got = sorted(r.c_custkey for r in inc.collect())
    want = sorted(
        r.c_custkey
        for r in cust.filter(
            ((F.col("c_custkey") >= 10) & (F.col("c_custkey") < 20))
            | (F.col("c_custkey") == 25)
        ).collect()
    )
    assert got == want
    # nothing new after the tip → empty, schema intact
    tip = table.current_version()
    assert table.read_incremental(tip).count() == 0
    # an overwrite breaks the append chain → explicit error, not bad data
    table.overwrite(cust.filter(F.col("c_custkey") < 5))
    with pytest.raises(ValueError, match="non-append"):
        table.read_incremental(v1)


def test_schema_evolution_add_column(spark, table):
    """Add-column evolution: files written before the column existed
    surface NULL; time travel still shows the old schema."""
    cust = load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_name"
    )
    table.append(cust.filter(F.col("c_custkey") < 10))
    v1 = table.current_version()
    widened = (
        load_table(spark, SF_SMOKE, "customer")
        .select("c_custkey", "c_name", "c_acctbal")
        .filter((F.col("c_custkey") >= 10) & (F.col("c_custkey") < 15))
    )
    table.append(widened)
    now = table.read()
    assert now.columns == ["c_custkey", "c_name", "c_acctbal"]
    old_rows = now.filter(F.col("c_custkey") < 10)
    assert old_rows.count() == cust.filter(F.col("c_custkey") < 10).count()
    assert old_rows.filter(F.col("c_acctbal").isNull()).count() == old_rows.count()
    new_rows = now.filter(F.col("c_custkey") >= 10)
    assert new_rows.filter(F.col("c_acctbal").isNotNull()).count() == new_rows.count()
    # time travel: the v1 snapshot still reads with its own narrow schema
    assert table.read(v1).columns == ["c_custkey", "c_name"]


def test_partitioned_write_roundtrip(spark, table):
    """ADVICE r1 (high): partition_by writes hive-partitioned files whose
    partition-column values live in directory names; read() must recover
    them (basePath discovery), not backfill NULLs."""
    cust = load_table(spark, SF_SMOKE, "customer")
    table.overwrite(cust, partition_by=["c_mktsegment"])
    back = table.read()
    assert back.filter(F.col("c_mktsegment").isNull()).count() == 0
    assert _hash_df(back.select(*sorted(back.columns))) == _hash_df(
        cust.select(*sorted(cust.columns))
    )
    # partition pruning is available: a filtered scan reads fewer files
    pruned = back.filter(F.col("c_mktsegment") == "BUILDING")
    assert pruned.count() == cust.filter(
        F.col("c_mktsegment") == "BUILDING"
    ).count()


def test_partitioned_append_across_snapshots(spark, table):
    """Partitioned + unpartitioned snapshots coexist in one manifest;
    the per-snapshot basePath read keeps both correct."""
    cust = load_table(spark, SF_SMOKE, "customer")
    lo = cust.filter(F.col("c_custkey") < 50)
    hi = cust.filter(F.col("c_custkey") >= 50)
    table.append(lo, partition_by=["c_mktsegment"])
    table.append(hi)  # unpartitioned second snapshot
    back = table.read()
    assert back.filter(F.col("c_mktsegment").isNull()).count() == 0
    assert _hash_df(back.select(*sorted(back.columns))) == _hash_df(
        cust.select(*sorted(cust.columns))
    )


def test_merge_preserves_null_key_target_rows(spark, table):
    """ADVICE r1: a target row whose merge-key is legitimately NULL must
    pass through untouched — not be misread as source-only and nulled."""
    target = spark.createDataFrame(
        [(1, "a", 10.0), (None, "null-key-row", 20.0), (3, "c", 30.0)],
        "k long, name string, bal double",
    )
    table.overwrite(target)
    source = spark.createDataFrame(
        [(1, "a2", 11.0), (4, "d", 40.0)], "k long, name string, bal double"
    )
    table.merge_into(
        source,
        on=["k"],
        update_cols={"bal": F.col("s.bal"), "name": F.col("s.name")},
    )
    rows = {r.name: r for r in table.read().collect()}
    assert rows["null-key-row"].bal == 20.0  # survived untouched
    assert rows["null-key-row"].k is None
    assert rows["a2"].bal == 11.0  # matched -> updated
    assert rows["d"].bal == 40.0  # unmatched source -> inserted
    assert table.read().count() == 4


def test_merge_delete_clause(spark, table):
    """WHEN MATCHED AND cond THEN DELETE: matched rows meeting the
    condition drop; a NULL condition on a matched row means keep (SQL
    3VL — MERGE's WHEN MATCHED AND <cond> fires only on TRUE)."""
    target = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0), (4, 40.0)], "k long, bal double"
    )
    table.overwrite(target)
    source = spark.createDataFrame(
        [(1, "drop"), (2, "keep"), (3, None), (5, "new")],
        "k long, action string",
    )
    table.merge_into(
        source,
        on=["k"],
        update_cols={"bal": F.col("t.bal") + 1},
        insert_unmatched=False,
        delete_condition=F.col("s.action") == "drop",
    )
    rows = {r.k: r.bal for r in table.read().collect()}
    assert 1 not in rows  # matched + TRUE condition -> deleted
    assert rows[2] == 21.0  # matched + FALSE -> updated
    assert rows[3] == 31.0  # matched + NULL condition -> updated, kept
    assert rows[4] == 40.0  # unmatched target -> untouched
    assert 5 not in rows  # insert_unmatched=False
    assert table.read().count() == 3


def test_zorder_compaction_bounds_both_dims(spark, table):
    """Z-order rewrite: every output file covers a bounded hyper-rectangle,
    so parquet min/max stats can prune predicates on EITHER z-ordered
    column (a plain sort only bounds the leading column). Verified from
    the parquet footers; data unchanged."""
    import pyarrow.parquet as pq

    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    for i in range(3):
        # hash-partition by key: ROUND-ROBIN repartition(3) assigns rows
        # by task-local order, which varies under load — the appended
        # file contents (and so the rewrite's output spans) flapped in
        # full-suite runs
        table.append(
            orders.filter(F.col("o_orderkey") % 3 == i).repartition(
                3, F.col("o_orderkey")
            )
        )
    pre = _hash_df(table.read().select("o_orderkey", "o_custkey"))
    table.rewrite_data_files(
        target_file_count=4, zorder_by=["o_custkey", "o_orderkey"]
    )
    files = table._read_manifest(table.current_version())["files"]
    assert len(files) <= 4

    def col_ranges(col):
        spans = []
        for f in files:
            md = pq.ParquetFile(f).metadata
            idx = next(
                i for i in range(md.num_columns)
                if md.row_group(0).column(i).path_in_schema == col
            )
            lo = min(md.row_group(g).column(idx).statistics.min
                     for g in range(md.num_row_groups))
            hi = max(md.row_group(g).column(idx).statistics.max
                     for g in range(md.num_row_groups))
            spans.append((lo, hi))
        return spans

    for col in ("o_custkey", "o_orderkey"):
        spans = col_ranges(col)
        domain_lo = min(lo for lo, _ in spans)
        domain_hi = max(hi for _, hi in spans)
        domain = domain_hi - domain_lo
        # with 4 z-ordered files each covers ~half of each dimension;
        # random placement would cover ~all of it in every file
        narrow = sum(1 for lo, hi in spans if (hi - lo) <= 0.7 * domain)
        assert narrow >= len(spans) - 1, (col, spans)
    assert _hash_df(table.read().select("o_orderkey", "o_custkey")) == pre


def test_stats_pruned_scan_skips_files(spark, table):
    """Manifest-level data-file skipping: after a sorted rewrite, a range
    scan must plan strictly fewer files than the table holds (without
    opening the skipped ones) and still return exactly the filtered
    rows. Unsorted appends, by contrast, are unprunable — every file
    overlaps every range."""
    orders = load_table(spark, SF_SMOKE, "orders")
    for i in range(3):
        table.append(orders.filter(F.col("o_orderkey") % 3 == i).repartition(2))
    manifest = table._read_manifest(table.current_version())
    where = {"o_orderkey": (100, 200)}
    # interleaved layout: nothing prunable
    assert len(table._prune_files(manifest, where)) == len(manifest["files"])

    table.rewrite_data_files(target_file_count=6, sort_by=["o_orderkey"])
    manifest = table._read_manifest(table.current_version())
    kept = table._prune_files(manifest, where)
    assert 0 < len(kept) < len(manifest["files"]), (
        len(kept),
        len(manifest["files"]),
    )
    got = sorted(r.o_orderkey for r in table.scan(where).collect())
    want = sorted(
        r.o_orderkey
        for r in orders.filter(
            (F.col("o_orderkey") >= 100) & (F.col("o_orderkey") <= 200)
        ).collect()
    )
    assert got == want
    # fully out-of-range scan: zero files, empty result, schema intact
    none = table.scan({"o_orderkey": (10**12, None)})
    assert none.count() == 0
    assert none.columns == table.read().columns


def test_delete_where_rewrites_only_touched_files(spark, table):
    """Copy-on-write delete: with a prune range, files that provably
    can't hold matching rows carry into the new snapshot by PATH (no
    rewrite); the result equals the filtered source exactly."""
    orders = load_table(spark, SF_SMOKE, "orders")
    for i in range(3):
        table.append(orders.filter(F.col("o_orderkey") % 3 == i).repartition(2))
    table.rewrite_data_files(target_file_count=6, sort_by=["o_orderkey"])
    before = table._read_manifest(table.current_version())
    lo, hi = 1000, 2000
    cond = F.col("o_orderkey").between(lo, hi)
    table.delete_where(cond, prune={"o_orderkey": (lo, hi)})
    after = table._read_manifest(table.current_version())
    carried = set(before["files"]) & set(after["files"])
    assert carried, "expected untouched files to carry over by path"
    assert after["summary"]["rewritten"] < len(before["files"])
    got = sorted(r.o_orderkey for r in table.read().collect())
    want = sorted(
        r.o_orderkey for r in orders.filter(~cond).collect()
    )
    assert got == want
    # carried files keep their stats for future pruning
    for f in carried:
        assert after["stats"].get(f) == before["stats"].get(f)


def test_update_where_pruned_rewrite_and_time_travel(spark, table):
    """Copy-on-write update: matching rows change, non-matching rows of
    touched files survive unchanged, untouched files carry by path, and
    time travel still shows pre-update values."""
    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    for i in range(2):
        table.append(orders.filter(F.col("o_orderkey") % 2 == i).repartition(2))
    table.rewrite_data_files(target_file_count=6, sort_by=["o_orderkey"])
    v_before = table.current_version()
    before_files = set(table._read_manifest(v_before)["files"])
    lo, hi = 500, 1500
    cond = F.col("o_orderkey").between(lo, hi)
    table.update_where(
        cond,
        set_cols={"o_totalprice": F.col("o_totalprice") * 2},
        prune={"o_orderkey": (lo, hi)},
    )
    after = table._read_manifest(table.current_version())
    assert set(after["files"]) & before_files  # carried paths
    got = {r.o_orderkey: r.o_totalprice for r in table.read().collect()}
    for r in orders.collect():
        expect = r.o_totalprice * 2 if lo <= r.o_orderkey <= hi else r.o_totalprice
        assert abs(got[r.o_orderkey] - expect) < 1e-9
    assert len(got) == orders.count()  # one row in, one row out
    # time travel: parent version still holds pre-update prices
    old = {r.o_orderkey: r.o_totalprice for r in table.read(v_before).collect()}
    assert all(abs(old[r.o_orderkey] - r.o_totalprice) < 1e-9 for r in orders.collect())


def test_changelog_tags_inserts_and_deletes(spark, table):
    """Changelog across mixed operations: append → delete; the feed shows
    the appended rows as inserts and the deleted rows as deletes, with
    untouched rows absent."""
    cust = load_table(spark, SF_SMOKE, "customer").select("c_custkey", "c_name")
    table.overwrite(cust.filter(F.col("c_custkey") <= 50))
    v1 = table.current_version()
    table.append(cust.filter((F.col("c_custkey") > 50) & (F.col("c_custkey") <= 60)))
    table.delete_where(F.col("c_custkey") <= 10)
    feed = table.changelog(v1).collect()
    ins = {r.c_custkey for r in feed if r._change_type == "insert"}
    dels = {r.c_custkey for r in feed if r._change_type == "delete"}
    want_ins = {r.c_custkey for r in cust.filter(
        (F.col("c_custkey") > 50) & (F.col("c_custkey") <= 60)).collect()}
    want_del = {r.c_custkey for r in cust.filter(F.col("c_custkey") <= 10).collect()}
    assert ins == want_ins
    assert dels == want_del
    assert len(feed) == len(ins) + len(dels)  # untouched rows absent


def test_changelog_skips_unchanged_files(spark, table):
    """r4 scoped changelog: files common to both versions are never
    opened. Proven by vandalizing the baseline snapshot's data files on
    disk — a full-snapshot diff would crash reading them; the scoped
    diff only opens the appended file."""
    import glob as _glob
    import os as _os

    cust = load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_name"
    )
    table.overwrite(cust)
    v1 = table.current_version()
    table.append(cust.filter(F.col("c_custkey") < 5))
    v1_files = set(table._read_manifest(v1)["files"])
    for f in v1_files:
        with open(f, "wb") as fh:  # truncate: any read of these fails
            fh.write(b"not parquet")
    feed = table.changelog(v1).collect()
    assert {r.c_custkey for r in feed} == set(range(5))
    assert all(r._change_type == "insert" for r in feed)


def test_changelog_compaction_nets_zero(spark, table):
    """Row-preserving rewrites (small-file compaction) produce an empty
    feed — the property an incremental consumer relies on to not
    re-process 100 TB after maintenance."""
    cust = load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_name"
    )
    for i in range(3):
        table.append(cust.filter(F.col("c_custkey") % 3 == i))
    v = table.current_version()
    table.rewrite_data_files()
    assert table.current_version() > v
    assert table.changelog(v).count() == 0


def test_changelog_mor_delete_scopes_affected_files(spark, table):
    """A merge-on-read equality delete changes NO data files — the
    feed must still surface the dead rows, via the sequence-scoped
    affected-common-file analysis."""
    cust = load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_name"
    )
    table.overwrite(cust)
    v1 = table.current_version()
    table.delete_where_mor(F.col("c_custkey") < 7, keys=["c_custkey"])
    feed = table.changelog(v1).collect()
    assert {r.c_custkey for r in feed} == set(range(7))
    assert all(r._change_type == "delete" for r in feed)
    # a row re-inserted IDENTICALLY after its delete NETS to zero
    # (delete of original + exempt re-append cancel in the multiset
    # diff); a MODIFIED re-insert surfaces
    table.append(
        cust.filter(F.col("c_custkey") == 3).withColumn(
            "c_name", F.lit("READDED")
        )
    )
    feed2 = table.changelog(v1).collect()
    ins = [r for r in feed2 if r._change_type == "insert"]
    assert [(r.c_custkey, r.c_name) for r in ins] == [(3, "READDED")]
    assert {r.c_custkey for r in feed2 if r._change_type == "delete"} == set(
        range(7)
    )


def test_changelog_pos_delete_reads_coordinate_files(spark, table):
    """Position deletes name their target files inside tiny coordinate
    parquets; the scoped changelog must read those driver-side to find
    the affected common files."""
    cust = load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_name"
    )
    table.overwrite(cust)
    v1 = table.current_version()
    table.delete_where_pos(F.col("c_custkey").between(10, 12))
    feed = table.changelog(v1).collect()
    assert {r.c_custkey for r in feed} == {10, 11, 12}
    assert all(r._change_type == "delete" for r in feed)


def test_changelog_sees_resurrected_rows_after_rollback(spark, table):
    """Self-review r4: delete entries REMOVED in the interval (rollback
    of a MoR delete) resurrect rows in files common to both versions —
    the scoped diff must treat removed entries like added ones when
    choosing affected files."""
    cust = load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_name"
    )
    table.overwrite(cust)
    table.delete_where_mor(F.col("c_custkey") < 7, keys=["c_custkey"])
    v2 = table.current_version()
    table.rollback(1)  # same files as v2, delete entry gone
    feed = table.changelog(v2).collect()
    assert {r.c_custkey for r in feed} == set(range(7))
    assert all(r._change_type == "insert" for r in feed)


def test_changelog_empty_interval_returns_empty_feed(spark, table):
    """changelog(v, v) and drained-endpoint feeds return an EMPTY
    correctly-shaped DataFrame, never a crash."""
    cust = load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_name"
    )
    table.overwrite(cust)
    v = table.current_version()
    feed = table.changelog(v, v)
    assert feed.count() == 0
    assert "_change_type" in feed.columns and "c_custkey" in feed.columns


def test_changelog_rename_is_metadata_only(spark, table):
    """A column rename produces ZERO row changes (field-id semantics
    via prior_names resolution), and post-rename changes surface under
    the NEW name."""
    cust = load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_name"
    )
    table.overwrite(cust)
    v1 = table.current_version()
    table.rename_column("c_name", "customer_name")
    assert table.changelog(v1).count() == 0
    table.append(
        cust.filter(F.col("c_custkey") < 3).withColumnRenamed(
            "c_name", "customer_name"
        )
    )
    feed = table.changelog(v1)
    assert "customer_name" in feed.columns
    assert feed.count() == 3


def test_partition_spec_evolution_prunes_per_layout(spark, table):
    """Spec evolution: after switching partition_by between commits,
    a predicate on EITHER partition column prunes that layout's files
    while conservatively keeping the other layout's (which lack the
    field in their partition tuple)."""
    cust = load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_mktsegment", "c_nationkey"
    )
    table.overwrite(
        cust.filter(F.col("c_custkey") < 75),
        partition_by=["c_mktsegment"],
    )
    n_old = len(table._read_manifest(table.current_version())["files"])
    table.append(
        cust.filter(F.col("c_custkey") >= 75),
        partition_by=["c_nationkey"],
    )
    m = table._read_manifest(table.current_version())
    kinds = {(d["kind"], d["col"]) for d in m["partition_specs"]}
    assert kinds == {
        ("identity", "c_mktsegment"),
        ("identity", "c_nationkey"),
    }
    n_new = len(m["files"]) - n_old
    seg = cust.select("c_mktsegment").first()[0]
    kept_seg = table._partition_prune(
        m, {"c_mktsegment": (seg, seg)}, m["files"]
    )
    # old layout pruned (fewer than all old files), new layout all kept
    assert n_new <= len(kept_seg) < len(m["files"])
    nat = cust.select("c_nationkey").first()[0]
    kept_nat = table._partition_prune(
        m, {"c_nationkey": (nat, nat)}, m["files"]
    )
    assert n_old <= len(kept_nat) < len(m["files"])
    # and the scans stay exact across both layouts
    assert (
        table.scan({"c_nationkey": (nat, nat)}).count()
        == cust.filter(F.col("c_nationkey") == nat).count()
    )


def test_rollback_restores_old_state_and_keeps_history(spark, table):
    cust = load_table(spark, SF_SMOKE, "customer").select("c_custkey", "c_name")
    table.overwrite(cust)
    v1 = table.current_version()
    h1 = _hash_df(table.read())
    table.delete_where(F.col("c_custkey") <= 100)
    assert _hash_df(table.read()) != h1
    m = table.rollback(v1)
    assert m["operation"] == "rollback"
    assert _hash_df(table.read()) == h1
    # metadata-only: rollback snapshot lists v1's files by path
    assert sorted(m["files"]) == sorted(table._read_manifest(v1)["files"])
    # the bad version stays readable for forensics
    assert table.read(version=v1 + 1).count() < cust.count()


def test_history_metadata_table(spark, table):
    cust = load_table(spark, SF_SMOKE, "customer")
    table.overwrite(cust)
    table.append(cust.limit(10))
    table.rewrite_data_files(target_file_count=2)
    hist = {r.version: r for r in table.history().collect()}
    assert [hist[v].operation for v in (1, 2, 3)] == [
        "overwrite", "append", "compact"]
    assert hist[2].parent == 1 and hist[2].added_files >= 1
    assert hist[3].file_count <= 2


def test_wap_stage_audit_publish_and_abort(spark, table):
    cust = load_table(spark, SF_SMOKE, "customer").select("c_custkey", "c_name")
    table.overwrite(cust.filter(F.col("c_custkey") <= 50))
    v_before = table.current_version()

    stage = table.stage_append(
        cust.filter((F.col("c_custkey") > 50) & (F.col("c_custkey") <= 60)))
    # staged rows are invisible to readers, at any version
    assert table.current_version() == v_before
    assert table.read().filter(F.col("c_custkey") > 50).count() == 0
    # audit view = table ∪ staged batch
    audited = table.read_staged(stage)
    assert audited.filter(F.col("c_custkey") > 50).count() > 0
    table.publish(stage)
    assert table.current_version() == v_before + 1
    assert table.read().filter(F.col("c_custkey") > 50).count() > 0

    # failed audit → abort leaves no trace (version, rows, or files)
    import glob, os
    files_before = set(glob.glob(os.path.join(table.path, "data", "*")))
    bad = table.stage_append(cust.limit(5).withColumn(
        "c_custkey", F.lit(None).cast("long")))
    table.abort_stage(bad)
    assert table.current_version() == v_before + 1
    assert table.read().filter(F.col("c_custkey").isNull()).count() == 0
    assert set(glob.glob(os.path.join(table.path, "data", "*"))) == files_before


def test_publish_rebases_onto_advanced_tip(spark, table):
    """An append staged against v1 publishes correctly even after another
    writer advanced the table — file additions commute."""
    cust = load_table(spark, SF_SMOKE, "customer").select("c_custkey", "c_name")
    table.overwrite(cust.filter(F.col("c_custkey") <= 50))
    stage = table.stage_append(
        cust.filter((F.col("c_custkey") > 50) & (F.col("c_custkey") <= 60)))
    table.append(  # tip moves between stage and publish
        cust.filter((F.col("c_custkey") > 60) & (F.col("c_custkey") <= 70)))
    table.publish(stage)
    got = {r.c_custkey for r in table.read().select("c_custkey").collect()}
    want = {r.c_custkey for r in cust.filter(F.col("c_custkey") <= 70).collect()}
    assert got == want


def test_mor_delete_is_metadata_cheap_and_exact(spark, table):
    cust = load_table(spark, SF_SMOKE, "customer").select("c_custkey", "c_name")
    table.overwrite(cust)
    v1 = table.current_version()
    files_v1 = table._read_manifest(v1)["files"]
    table.delete_where_mor(F.col("c_custkey") <= 100, keys=["c_custkey"])
    m = table._read_manifest(table.current_version())
    # data files untouched — the delete wrote only a keys file
    assert m["files"] == files_v1
    assert len(m["delete_files"]) == 1
    got = {r.c_custkey for r in table.read().collect()}
    want = {r.c_custkey for r in cust.filter(F.col("c_custkey") > 100).collect()}
    assert got == want
    # time travel still sees the pre-delete rows
    assert table.read(version=v1).count() == cust.count()


def test_mor_delete_spares_rows_appended_after(spark, table):
    """Sequence numbers: a delete only hits rows whose file predates it —
    re-inserting a deleted key after the delete must survive."""
    cust = load_table(spark, SF_SMOKE, "customer").select("c_custkey", "c_name")
    table.overwrite(cust.filter(F.col("c_custkey") <= 50))
    table.delete_where_mor(F.col("c_custkey") <= 10, keys=["c_custkey"])
    reinserted = cust.filter(F.col("c_custkey") <= 5)
    table.append(reinserted)
    got = {r.c_custkey for r in table.read().collect()}
    lo = {r.c_custkey for r in reinserted.collect()}
    mid = {r.c_custkey for r in cust.filter(
        (F.col("c_custkey") > 10) & (F.col("c_custkey") <= 50)).collect()}
    assert got == lo | mid


def test_compaction_materializes_mor_deletes(spark, table):
    cust = load_table(spark, SF_SMOKE, "customer").select("c_custkey", "c_name")
    table.overwrite(cust)
    table.delete_where_mor(F.col("c_custkey") <= 100, keys=["c_custkey"])
    before = {r.c_custkey for r in table.read().collect()}
    table.rewrite_data_files(target_file_count=2)
    m = table._read_manifest(table.current_version())
    assert m.get("delete_files", []) == []         # materialized away
    assert {r.c_custkey for r in table.read().collect()} == before


def test_gc_preserves_live_mor_delete_key_files(spark, table):
    import os
    cust = load_table(spark, SF_SMOKE, "customer").select("c_custkey", "c_name")
    table.overwrite(cust)
    table.delete_where_mor(F.col("c_custkey") <= 100, keys=["c_custkey"])
    m = table._read_manifest(table.current_version())
    key_files = [f for d in m["delete_files"] for f in d["files"]]
    table.remove_orphan_files(older_than_seconds=0.0)
    table.expire_snapshots(keep_last=1)
    assert all(os.path.exists(f) for f in key_files)
    got = {r.c_custkey for r in table.read().collect()}
    assert got == {r.c_custkey for r in cust.filter(
        F.col("c_custkey") > 100).collect()}


def test_cow_delete_carries_pending_mor_deletes(spark, table):
    """A CoW delete over a table with pending MoR deletes must keep those
    deletes effective on the files it does NOT rewrite."""
    cust = load_table(spark, SF_SMOKE, "customer").select("c_custkey", "c_name")
    table.overwrite(cust)
    table.delete_where_mor(F.col("c_custkey") <= 20, keys=["c_custkey"])
    # CoW-delete a disjoint range; stats pruning keeps most files untouched
    table.delete_where(F.col("c_custkey") > 140,
                       prune={"c_custkey": (141, None)})
    got = {r.c_custkey for r in table.read().collect()}
    want = {r.c_custkey for r in cust.filter(
        (F.col("c_custkey") > 20) & (F.col("c_custkey") <= 140)).collect()}
    assert got == want


def test_hidden_partitioning_months_prunes_and_roundtrips(spark, table):
    """days/months() transform: layout is derived from the timestamp, the
    source column stays queryable, and a range scan provably skips files
    of non-overlapping months while returning exact results."""
    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    table.overwrite(orders, partition_by=["months(o_orderdate)"])
    m = table._read_manifest(table.current_version())
    assert m["partition_specs"] == [
        {"kind": "months", "col": "o_orderdate", "n": None}]
    lo, hi = "1995-01-01 00:00:00", "1995-03-31 23:59:59"
    kept = table._partition_prune(
        m, {"o_orderdate": (lo, hi)}, list(m["files"]))
    assert 0 < len(kept) < len(m["files"])
    got = sorted(r.o_orderkey for r in
                 table.scan({"o_orderdate": (lo, hi)}).collect())
    want = sorted(r.o_orderkey for r in orders.filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") <= hi)
    ).collect())
    assert got == want
    # hidden: no __p_* column surfaces to readers
    assert all(not c.startswith("__p_") for c in table.read().columns)


def test_bucket_partition_point_lookup_prunes(spark, table):
    cust = load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_name")
    table.overwrite(cust, partition_by=["bucket(8, c_custkey)"])
    m = table._read_manifest(table.current_version())
    key = 42
    kept = table._partition_prune(m, {"c_custkey": (key, key)},
                                  list(m["files"]))
    assert 0 < len(kept) < len(m["files"])
    got = [r.c_name for r in table.scan({"c_custkey": (key, key)}).collect()]
    want = [r.c_name for r in cust.filter(F.col("c_custkey") == key).collect()]
    assert got == want
    # a range predicate must NOT bucket-prune (hash is not monotonic)
    assert table._partition_prune(
        m, {"c_custkey": (1, 100)}, list(m["files"])) == list(m["files"])


def test_truncate_partition_range_prune(spark, table):
    cust = load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_name")
    table.overwrite(cust, partition_by=["truncate(100, c_custkey)"])
    m = table._read_manifest(table.current_version())
    kept = table._partition_prune(
        m, {"c_custkey": (120, 130)}, list(m["files"]))
    assert 0 < len(kept) < len(m["files"])
    got = sorted(r.c_custkey for r in
                 table.scan({"c_custkey": (120, 130)}).collect())
    want = sorted(r.c_custkey for r in cust.filter(
        F.col("c_custkey").between(120, 130)).collect())
    assert got == want and len(got) > 0


def test_tags_time_travel_and_retention_anchor(spark, table):
    cust = load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_name")
    table.overwrite(cust)
    v1 = table.current_version()
    table.tag("training-v1")
    table.delete_where(F.col("c_custkey") <= 100)
    table.append(cust.filter(F.col("c_custkey") <= 10))
    assert table.tags() == {"training-v1": v1}
    assert table.read(version="training-v1").count() == cust.count()
    # tags anchor retention: expire keeps the tagged manifest readable
    expired = table.expire_snapshots(keep_last=1)
    assert v1 not in expired
    assert table.read(version="training-v1").count() == cust.count()
    with pytest.raises(ValueError):
        table.read(version="nope")


def test_branch_isolation_and_fast_forward(spark, table):
    """Branch refs: commits on a branch are invisible to main; main
    commits after the fork are invisible to the branch; fast_forward
    publishes the branch's files onto the CURRENT main tip as one
    metadata-only append."""
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    table.overwrite(cust.filter(F.col("c_custkey") <= 100))
    base_count = table.read().count()

    table.create_branch("audit")
    table.append_branch("audit", cust.filter(F.col("c_custkey").between(101, 120)))
    table.append_branch("audit", cust.filter(F.col("c_custkey").between(121, 130)))

    # isolation both ways
    assert table.read().count() == base_count
    branch_count = table.read_branch("audit").count()
    assert branch_count == base_count + 30
    main_extra = cust.filter(F.col("c_custkey").between(131, 140))
    table.append(main_extra)  # main advances past the fork point
    assert table.read_branch("audit").count() == branch_count

    v_before = table.current_version()
    table.fast_forward("audit")
    # one new main snapshot containing main's post-fork rows AND the branch rows
    assert table.current_version() == v_before + 1
    assert table.read().count() == base_count + 30 + 10
    assert table.branches() == {}  # dropped after publish
    m = table._read_manifest(table.current_version())
    assert m["summary"]["fast_forwarded_branch"] == "audit"


def test_branch_drop_cleans_unpublished_files(spark, table):
    """An abandoned branch removes its own data directories; main's data
    and an expire/orphan pass never see them."""
    import glob as _glob

    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    table.overwrite(cust)
    table.create_branch("wip")
    table.append_branch("wip", cust.limit(10))
    pre = table.read().count()
    table.drop_branch("wip")
    assert table.read().count() == pre
    assert table.branches() == {}
    # branch data dirs gone; main's remain
    assert table.read().count() == cust.count()
    orphans = table.remove_orphan_files(older_than_seconds=0.0)
    assert orphans == []  # nothing left behind to collect
    assert _glob.glob(f"{table.path}/snapshots/branch-*") == []


def test_branch_files_survive_gc(spark, table):
    """expire_snapshots / remove_orphan_files must not collect data files
    or base snapshots a live branch still references."""
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    table.overwrite(cust.limit(50))          # v1 (future branch base)
    table.create_branch("keepme")
    table.append_branch("keepme", cust.limit(5))
    table.overwrite(cust.limit(80))          # v2: main moves on
    table.overwrite(cust.limit(90))          # v3
    table.expire_snapshots(keep_last=1)
    table.remove_orphan_files(older_than_seconds=0.0)
    # branch still fully readable: base manifest + branch files survived
    assert table.read_branch("keepme").count() == 55


def test_partition_spec_evolution(spark, table):
    """Spec evolution: snapshots may use different partition layouts; the
    manifest accumulates all specs and pruning stays exact for both old-
    and new-layout files."""
    ev = load_table(spark, SF_SMOKE, "events")
    old = ev.filter(F.col("event_type") == "click")
    new = ev.filter(F.col("event_type") == "purchase")
    table.overwrite(old, partition_by=["days(ts)"])
    table.append(new, partition_by=["bucket(4, user_id)"])  # evolved spec

    m = table._read_manifest(table.current_version())
    kinds = {d["kind"] for d in m["partition_specs"]}
    assert kinds == {"days", "bucket"}

    # correctness: full read returns everything with partition cols intact
    got = table.read()
    assert got.count() == old.count() + new.count()
    assert got.filter(F.col("ts").isNull()).count() == 0

    # pruning on ts: old-layout files prune by days(ts); new-layout files
    # (no days field) are conservatively kept -> result stays exact
    lo = ev.agg(F.min("ts")).first()[0]
    scanned = table.scan({"ts": (None, lo)})
    expect = old.filter(F.col("ts") <= lo).count() + new.filter(
        F.col("ts") <= lo
    ).count()
    assert scanned.count() == expect


def test_files_and_partitions_metadata_tables(spark, table):
    """files()/partitions() metadata tables are consistent with the data:
    row counts sum to the table count, partition rollup matches layout."""
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    table.overwrite(cust, partition_by=["c_mktsegment"])
    f = table.files()
    assert f.agg(F.sum("num_rows")).first()[0] == cust.count()
    assert f.filter(F.col("seq") != 1).count() == 0
    assert f.filter(F.col("size_bytes") <= 0).count() == 0
    segs = {
        r.partition["c_mktsegment"] for r in f.select("partition").collect()
    }
    assert segs == {
        r.c_mktsegment for r in cust.select("c_mktsegment").distinct().collect()
    }
    p = table.partitions()
    assert p.count() == len(segs)
    assert p.agg(F.sum("row_count")).first()[0] == cust.count()
    # Iceberg v3: every file exposes its assigned first_row_id, ranges
    # are disjoint and dense (sum of rows == id space consumed)
    rid_rows = f.select("first_row_id", "num_rows").collect()
    assert all(r.first_row_id is not None for r in rid_rows)
    spans = sorted((r.first_row_id, r.num_rows) for r in rid_rows)
    cursor = 0
    for base, n in spans:
        assert base >= cursor
        cursor = base + n


def test_merge_schema_evolution(spark, table):
    """evolve_schema=True: a source column unknown to the target joins
    the schema mid-merge; unmatched target rows surface it as NULL, and
    time travel still shows the pre-merge shape."""
    target = spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "k long, bal double"
    )
    table.overwrite(target)
    source = spark.createDataFrame(
        [(2, 21.0, "gold"), (3, 30.0, "new")],
        "k long, bal double, tier string",
    )
    table.merge_into(
        source,
        on=["k"],
        update_cols={"bal": F.col("s.bal")},
        evolve_schema=True,
    )
    rows = {r.k: r for r in table.read().collect()}
    assert set(table.read().columns) == {"k", "bal", "tier"}
    assert rows[1].tier is None and rows[1].bal == 10.0  # target-only
    assert rows[2].tier == "gold" and rows[2].bal == 21.0  # matched
    assert rows[3].tier == "new"  # inserted
    assert "tier" not in table.read(version=1).columns  # time travel


def test_concurrent_branch_appends_isolated(spark, table):
    """Branch commits use the same optimistic protocol as main: N threads
    appending to one branch linearize without loss, and main's version
    counter never moves."""
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").cache()
    cust.count()
    table.overwrite(cust.filter(F.col("c_custkey") < 0))  # empty base
    table.create_branch("load")
    n_writers = 4
    errs = []

    def writer(i):
        try:
            table.append_branch(
                "load", cust.filter(F.col("c_custkey") % n_writers == i)
            )
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ts = [threading.Thread(target=writer, args=(i,)) for i in range(n_writers)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()

    assert not errs
    assert table._branch_head("load") == n_writers  # gapless branch chain
    assert table.current_version() == 1  # main untouched
    assert table.read_branch("load").count() == cust.count()


def test_branch_fork_carries_pending_mor_deletes(spark, table):
    """r2 ADVICE (medium): forking a branch from a snapshot with pending
    merge-on-read equality deletes must not resurrect the deleted rows —
    in the branch read, after branch appends, or in the fast_forward
    publish. Branch-appended rows postdate the fork, so re-adding a
    previously-deleted key must survive (sequence-number semantics)."""
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    base = cust.filter(F.col("c_custkey") <= 100)
    n_base = base.count()
    n_del = base.filter(F.col("c_custkey") <= 10).count()
    table.overwrite(base)
    table.delete_where_mor(F.col("c_custkey") <= 10, keys=["c_custkey"])
    assert table.read().count() == n_base - n_del

    table.create_branch("fork")
    # empty branch: read delegates to the base snapshot (deletes applied)
    assert table.read_branch("fork").count() == n_base - n_del

    later = cust.filter(F.col("c_custkey").between(101, 110))
    n_later = later.count()
    table.append_branch("fork", later)
    br = table.read_branch("fork")
    assert br.count() == n_base - n_del + n_later
    assert br.filter(F.col("c_custkey") <= 10).count() == 0

    # re-add keys <=5 ON THE BRANCH: newer than the delete -> they live
    readd = cust.filter(F.col("c_custkey") <= 5)
    n_readd = readd.count()
    table.append_branch("fork", readd)
    br = table.read_branch("fork")
    assert br.filter(F.col("c_custkey") <= 5).count() == n_readd
    assert br.filter(F.col("c_custkey").between(6, 10)).count() == 0

    table.fast_forward("fork")
    main = table.read()
    assert main.filter(F.col("c_custkey").between(6, 10)).count() == 0
    assert main.filter(F.col("c_custkey") <= 5).count() == n_readd
    assert main.count() == n_base - n_del + n_later + n_readd


def test_fast_forward_preserves_main_schema_evolution(spark, table):
    """r2 ADVICE (medium): if main adds a column AFTER the fork, publishing
    the branch must not revert the schema to the branch's frozen one —
    main's current schema wins field-for-field, branch-only columns
    append."""
    cust = load_table(spark, SF_SMOKE, "customer")
    narrow = cust.select("c_custkey", "c_name")
    table.append(narrow.filter(F.col("c_custkey") < 10))
    table.create_branch("slow-audit")
    table.append_branch(
        "slow-audit",
        narrow.filter(F.col("c_custkey").between(10, 14)),
    )
    # main evolves: add-column append after the fork
    table.append(
        cust.select("c_custkey", "c_name", "c_acctbal").filter(
            F.col("c_custkey").between(15, 19)
        )
    )
    assert table.read().columns == ["c_custkey", "c_name", "c_acctbal"]

    table.fast_forward("slow-audit")
    out = table.read()
    assert out.columns == ["c_custkey", "c_name", "c_acctbal"]
    # branch rows surface NULL for the post-fork column; main rows keep it
    assert (
        out.filter(F.col("c_custkey").between(10, 14))
        .filter(F.col("c_acctbal").isNull())
        .count()
        == 5
    )
    assert (
        out.filter(F.col("c_custkey").between(15, 19))
        .filter(F.col("c_acctbal").isNotNull())
        .count()
        == 5
    )


def test_append_narrower_frame_keeps_evolved_schema(spark, table):
    """Appending a frame NARROWER than the table schema must not drop the
    table's extra columns (append schema = add-column union, same contract
    as branch publish)."""
    cust = load_table(spark, SF_SMOKE, "customer")
    table.append(
        cust.select("c_custkey", "c_name", "c_acctbal").filter(
            F.col("c_custkey") < 10
        )
    )
    table.append(
        cust.select("c_custkey", "c_name").filter(
            F.col("c_custkey").between(10, 14)
        )
    )
    out = table.read()
    assert out.columns == ["c_custkey", "c_name", "c_acctbal"]
    assert (
        out.filter(F.col("c_custkey") >= 10)
        .filter(F.col("c_acctbal").isNull())
        .count()
        == 5
    )


def test_exactly_once_sink_survives_snapshot_expiration(spark, table):
    """r2 ADVICE (low): the sink's dedup guarantee must not depend on the
    snapshot that recorded a batch id staying live. Every sink commit
    carries the high-water mark forward, so replaying a batch whose
    manifest was expired is STILL a no-op."""
    from apache_iceberg_exploration_spark.streaming.sinks import (
        idempotent_foreach_batch,
        last_applied_batch,
    )

    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "value"
    )
    table.overwrite(ev.limit(0))

    def apply(tbl, batch_df, summary_extra):
        return tbl.append(batch_df, summary_extra=summary_extra)

    sink = idempotent_foreach_batch(table, apply)
    for b in range(3):
        sink(ev.filter(F.col("event_id") % 3 == b), b)
    total = table.read().count()
    assert total == ev.count()

    # expire everything but the tip: manifests recording batches 0,1 die
    table.expire_snapshots(keep_last=1)
    assert last_applied_batch(table) == 2

    v_before = table.current_version()
    sink(ev.filter(F.col("event_id") % 3 == 0), 0)  # replay expired batch
    assert table.current_version() == v_before  # no-op, not a duplicate
    assert table.read().count() == total

    sink(ev.limit(7), 3)  # genuinely new batch still commits
    assert table.read().count() == total + 7
    assert last_applied_batch(table) == 3


def test_orphan_gc_preserves_staged_wap_files(spark, table):
    """r3 follow-through on r2 ADVICE (low): a staged write-audit-publish
    commit is live however long the audit takes — an aggressive
    remove_orphan_files pass (age 0) must not reclaim its data files."""
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    base = cust.filter(F.col("c_custkey") <= 100)
    staged = cust.filter(F.col("c_custkey").between(101, 120))
    table.overwrite(base)
    sid = table.stage_append(staged)

    removed = table.remove_orphan_files(older_than_seconds=0.0)
    assert removed == []  # staged files are referenced, not orphans

    table.publish(sid)
    assert table.read().count() == base.count() + staged.count()


def test_position_delete_exact_rows_and_time_travel(spark, table):
    """MoR position deletes: rows are removed by physical coordinate
    (file, row index), no data file rewritten; time travel still shows
    them; a later append is untouched; compaction materializes the
    deletes away."""
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    base = cust.filter(F.col("c_custkey") <= 100)
    table.overwrite(base)
    v1 = table.current_version()
    n_base = base.count()
    n_del = base.filter(F.col("c_mktsegment") == "BUILDING").count()

    table.delete_where_pos(F.col("c_mktsegment") == "BUILDING")
    assert table.current_version() == v1 + 1
    out = table.read()
    assert out.count() == n_base - n_del
    assert out.filter(F.col("c_mktsegment") == "BUILDING").count() == 0
    # no data file was rewritten: the snapshot carries the same files
    m = table._read_manifest(table.current_version())
    assert m["files"] == table._read_manifest(v1)["files"]
    # time travel shows the pre-delete rows
    assert table.read(v1).count() == n_base

    # rows appended later (same predicate!) are NOT claimed by the delete
    readd = cust.filter(
        (F.col("c_custkey").between(101, 120))
        & (F.col("c_mktsegment") == "BUILDING")
    )
    table.append(readd)
    out = table.read()
    assert (
        out.filter(F.col("c_mktsegment") == "BUILDING").count()
        == readd.count()
    )

    # compaction materializes: delete entries cleared, counts unchanged
    before = out.count()
    table.rewrite_data_files(target_file_count=2)
    m = table._read_manifest(table.current_version())
    assert m.get("delete_files", []) == []
    assert table.read().count() == before


def test_position_delete_removes_one_of_identical_rows(spark, table):
    """The capability equality deletes lack: with two bit-identical rows,
    a position delete can remove exactly one (row-level dedup without
    rewrite). Delete coordinates are chosen per (file, pos), so keep the
    first occurrence of each duplicated row."""
    dup = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b"), (3, "c"), (3, "c"), (3, "c")],
        "k int, s string",
    ).coalesce(1)
    table.overwrite(dup)

    # target: every occurrence after the first per identical row
    scan = table._scan_files(
        table._read_manifest(table.current_version())["files"],
        with_pos=True,
    )
    from pyspark.sql import Window

    w = Window.partitionBy("k", "s").orderBy("__file", "__pos")
    extra = (
        scan.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") > 1)
        .count()
    )
    assert extra == 3

    # delete_where_pos with a condition true for duplicates only can't
    # distinguish occurrences — drive the low-level path via a rank
    # condition is not expressible; instead delete rows whose coordinate
    # ranks >1 by writing the same shape the public API writes
    doomed = (
        scan.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") > 1)
        .select("__file", "__pos")
    )
    _, del_files = table._write_data_files(doomed)
    parent = table.current_version()
    manifest = table._snapshot(
        "delete-pos",
        table._read_manifest(parent)["files"],
        parent,
        schema_json=table._read_manifest(parent).get("schema"),
        file_seq=table._read_manifest(parent).get("file_seq"),
        delete_files=[
            {"files": del_files, "seq": parent + 1, "keys": [], "pos": True}
        ],
        added=0,
    )
    table._try_commit(parent + 1, manifest)

    rows = sorted(tuple(r) for r in table.read().collect())
    assert rows == [(1, "a"), (2, "b"), (3, "c")]


def test_position_delete_respects_prior_pending_deletes(spark, table):
    """delete_where_pos applies pending deletes before matching, and both
    flavors coexist on the read path."""
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    base = cust.filter(F.col("c_custkey") <= 100)
    table.overwrite(base)
    table.delete_where_mor(F.col("c_custkey") <= 10, keys=["c_custkey"])
    n_after_eq = table.read().count()
    n_pos = table.read().filter(F.col("c_nationkey") == 5).count()

    table.delete_where_pos(F.col("c_nationkey") == 5)
    out = table.read()
    assert out.count() == n_after_eq - n_pos
    assert out.filter(F.col("c_custkey") <= 10).count() == 0
    assert out.filter(F.col("c_nationkey") == 5).count() == 0


def test_rename_column_metadata_only(spark, table):
    """ALTER TABLE RENAME COLUMN: metadata-only commit; pre-rename files
    read through the historical-name chain; post-rename appends use the
    new name; time travel shows the old schema."""
    cust = load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_acctbal"
    )
    table.append(cust.filter(F.col("c_custkey") < 10))
    v1 = table.current_version()

    table.rename_column("c_acctbal", "balance")
    m = table._read_manifest(table.current_version())
    assert m["files"] == table._read_manifest(v1)["files"]  # no data change
    out = table.read()
    assert out.columns == ["c_custkey", "balance"]
    assert out.filter(F.col("balance").isNotNull()).count() == out.count()
    assert table.read(v1).columns == ["c_custkey", "c_acctbal"]

    # post-rename append writes the new name; both generations coalesce
    table.append(
        cust.filter(F.col("c_custkey").between(10, 14)).select(
            "c_custkey", F.col("c_acctbal").alias("balance")
        )
    )
    out = table.read()
    assert out.columns == ["c_custkey", "balance"]
    assert out.filter(F.col("balance").isNull()).count() == 0
    assert out.count() == cust.filter(F.col("c_custkey") < 15).count()

    # double rename: chain of prior names still resolves
    table.rename_column("balance", "acct_balance")
    out = table.read()
    assert out.columns == ["c_custkey", "acct_balance"]
    assert out.filter(F.col("acct_balance").isNull()).count() == 0


def test_rename_keeps_pending_equality_delete_applying(spark, table):
    """Rename AFTER a pending MoR equality delete keyed on the renamed
    column: the delete (written under the old name) must keep applying."""
    cust = load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_name"
    )
    table.overwrite(cust.filter(F.col("c_custkey") <= 50))
    table.delete_where_mor(F.col("c_custkey") <= 10, keys=["c_custkey"])
    n = table.read().count()
    table.rename_column("c_custkey", "customer_id")
    out = table.read()
    assert out.columns == ["customer_id", "c_name"]
    assert out.count() == n
    assert out.filter(F.col("customer_id") <= 10).count() == 0


def test_drop_column_metadata_only(spark, table):
    """ALTER TABLE DROP COLUMN: current readers lose the column without
    any file rewrite; time travel still shows it."""
    cust = load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    table.append(cust.filter(F.col("c_custkey") < 20))
    v1 = table.current_version()
    table.drop_column("c_name")
    assert table.read().columns == ["c_custkey", "c_acctbal"]
    assert (
        table._read_manifest(table.current_version())["files"]
        == table._read_manifest(v1)["files"]
    )
    assert table.read(v1).columns == ["c_custkey", "c_name", "c_acctbal"]
    # appends after the drop don't bring it back
    table.append(
        cust.filter(F.col("c_custkey").between(20, 24)).select(
            "c_custkey", "c_acctbal"
        )
    )
    assert table.read().columns == ["c_custkey", "c_acctbal"]


def test_add_column_ddl(spark, table):
    """ALTER TABLE ADD COLUMN: existing files surface NULL; later appends
    populate it."""
    cust = load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_name"
    )
    table.append(cust.filter(F.col("c_custkey") < 10))
    table.add_column("loyalty_tier", "string")
    out = table.read()
    assert out.columns == ["c_custkey", "c_name", "loyalty_tier"]
    assert out.filter(F.col("loyalty_tier").isNull()).count() == out.count()
    table.append(
        cust.filter(F.col("c_custkey").between(10, 12)).select(
            "c_custkey", "c_name", F.lit("gold").alias("loyalty_tier")
        )
    )
    out = table.read()
    assert (
        out.filter(F.col("loyalty_tier") == "gold").count()
        == cust.filter(F.col("c_custkey").between(10, 12)).count()
    )
    with pytest.raises(ValueError):
        table.add_column("loyalty_tier", "string")
    with pytest.raises(ValueError):
        table.rename_column("nope", "x")
    with pytest.raises(ValueError):
        table.drop_column("nope")


def test_scd2_merge_invariants(spark):
    """Structural SCD2 invariants on the maintained dimension: exactly one
    open (is_current) row per key; versions form contiguous
    non-overlapping [valid_from, valid_to) chains."""
    from apache_iceberg_exploration_spark.operators.lakehouse_ops import (
        lakehouse_scd2_merge,
    )

    from .conftest import SF_ORACLE

    rows = lakehouse_scd2_merge(spark, SF_ORACLE).collect()
    by_key: dict = {}
    for r in rows:
        by_key.setdefault(r.c_custkey, []).append(r)
    assert by_key
    for key, versions in by_key.items():
        opens = [r for r in versions if r.is_current == 1]
        assert len(opens) == 1, f"key {key}: {len(opens)} open rows"
        assert opens[0].valid_to is None
        chain = sorted(versions, key=lambda r: r.valid_from)
        for a, b in zip(chain, chain[1:]):
            assert a.valid_to == b.valid_from, f"key {key}: gap/overlap"


def test_branch_fork_carries_position_deletes(spark, table):
    """Position deletes pending at the fork point must keep applying on
    the branch (same carry-through contract as equality deletes)."""
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    base = cust.filter(F.col("c_custkey") <= 100)
    table.overwrite(base)
    n_pos = base.filter(F.col("c_nationkey") == 5).count()
    table.delete_where_pos(F.col("c_nationkey") == 5)
    live = table.read().count()
    assert live == base.count() - n_pos

    table.create_branch("wip")
    assert table.read_branch("wip").count() == live
    extra = cust.filter(F.col("c_custkey").between(101, 110))
    table.append_branch("wip", extra)
    br = table.read_branch("wip")
    assert br.count() == live + extra.count()
    # branch-appended rows with the deleted attribute are NOT claimed
    # (coordinates pin exact files, not values)
    assert (
        br.filter(F.col("c_nationkey") == 5).count()
        == extra.filter(F.col("c_nationkey") == 5).count()
    )
    table.fast_forward("wip")
    assert table.read().count() == live + extra.count()


def test_rewrite_position_delete_files_targets_only_named_files(spark, table):
    """Targeted MoR compaction: only coordinate-named files rewrite; the
    rest carry by path; position entries clear; equality entries stay
    pending; data unchanged."""
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    # two appends -> two file groups; deletes will target only the first
    a = cust.filter(F.col("c_custkey") <= 50)
    b = cust.filter(F.col("c_custkey").between(51, 100))
    table.append(a.coalesce(1))
    table.append(b.coalesce(1))
    table.delete_where_pos(
        (F.col("c_custkey") <= 50) & (F.col("c_nationkey") == 5)
    )
    table.delete_where_mor(F.col("c_custkey") == 60, keys=["c_custkey"])
    pre_rows = sorted(r.c_custkey for r in table.read().collect())
    files_pre = set(table._read_manifest(table.current_version())["files"])

    m = table.rewrite_position_delete_files()
    assert m is not None
    assert m["operation"] == "rewrite-pos-deletes"
    files_post = set(m["files"])
    # b's file survived untouched (it had no targeted coordinates)
    carried = files_pre & files_post
    assert carried, "untargeted files must carry by path"
    # position entries gone, equality entry still pending
    kinds = [d.get("pos", False) for d in m.get("delete_files", [])]
    assert kinds == [False]
    assert sorted(r.c_custkey for r in table.read().collect()) == pre_rows

    # a second pass is a no-op
    assert table.rewrite_position_delete_files() is None


def test_read_as_of_timestamp(spark, table):
    """TIMESTAMP AS OF time travel: resolves to the newest snapshot
    committed at or before the instant."""
    import time as _time

    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    table.overwrite(cust.filter(F.col("c_custkey") <= 10))
    t1 = _time.time()
    _time.sleep(0.05)
    table.append(cust.filter(F.col("c_custkey").between(11, 20)))
    t2 = _time.time()
    _time.sleep(0.05)
    table.append(cust.filter(F.col("c_custkey").between(21, 30)))

    n1 = cust.filter(F.col("c_custkey") <= 10).count()
    n2 = cust.filter(F.col("c_custkey") <= 20).count()
    n3 = cust.filter(F.col("c_custkey") <= 30).count()
    assert table.read_as_of(t1).count() == n1
    assert table.read_as_of(t2).count() == n2
    assert table.read_as_of(_time.time()).count() == n3
    assert table.version_as_of(t1) == 1
    with pytest.raises(ValueError):
        table.version_as_of(t1 - 3600)


def test_concurrent_merges_linearize(spark, table):
    """Two writers MERGE disjoint key sets concurrently: optimistic retry
    must linearize them — both updates land, no lost update, gapless
    version chain (the multi-writer upsert variant of the O9
    isolation experiment)."""
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").cache()
    cust.count()
    table.overwrite(cust.select("c_custkey", "c_name", "c_acctbal"))
    v0 = table.current_version()
    errs = []

    def merger(lo, hi, delta):
        try:
            src = (
                cust.filter(F.col("c_custkey").between(lo, hi))
                .select(
                    "c_custkey",
                    "c_name",
                    (F.col("c_acctbal") + delta).alias("c_acctbal"),
                )
            )
            table.merge_into(
                src,
                on=["c_custkey"],
                update_cols={"c_acctbal": F.col("s.c_acctbal")},
            )
        except Exception as e:  # pragma: no cover
            errs.append(e)

    t1 = threading.Thread(target=merger, args=(0, 30, 1000.0))
    t2 = threading.Thread(target=merger, args=(31, 60, -1000.0))
    t1.start(); t2.start(); t1.join(); t2.join()

    assert not errs
    assert table.current_version() == v0 + 2  # both committed, gapless
    out = {r.c_custkey: r.c_acctbal for r in table.read().collect()}
    base = {r.c_custkey: r.c_acctbal for r in cust.collect()}
    for k in range(0, 31):
        if k in base:
            assert abs(out[k] - (base[k] + 1000.0)) < 1e-6
    for k in range(31, 61):
        if k in base:
            assert abs(out[k] - (base[k] - 1000.0)) < 1e-6
    untouched = [k for k in base if k > 60][:5]
    for k in untouched:
        assert out[k] == base[k]


def test_concurrent_compact_and_append_no_lost_rows(spark, table):
    """The classic lost-append: compaction computed against an old
    snapshot must not commit over a concurrent append. _commit_rmw
    recomputes the rewrite against the new tip, so every row survives
    whichever order the two commits land in."""
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").cache()
    cust.count()
    base = cust.filter(F.col("c_custkey") <= 100)
    extra = cust.filter(F.col("c_custkey").between(101, 120))
    for i in range(3):
        table.append(base.filter(F.col("c_custkey") % 3 == i).repartition(3))
    errs = []

    def compactor():
        try:
            table.rewrite_data_files(target_file_count=2)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    def appender():
        try:
            table.append(extra)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    t1 = threading.Thread(target=compactor)
    t2 = threading.Thread(target=appender)
    t1.start(); t2.start(); t1.join(); t2.join()

    assert not errs
    assert table.read().count() == base.count() + extra.count()
    assert (
        table.read().filter(F.col("c_custkey") > 100).count()
        == extra.count()
    )


def test_mor_delete_does_not_claim_concurrently_appended_rows(spark, table):
    """White-box pin of the delete-seq semantics: an equality delete's
    entry carries the version its predicate was EVALUATED against, so
    rows appended between evaluation and commit (which the delete never
    saw) stay exempt even when their keys match."""
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    table.overwrite(
        cust.filter(
            (F.col("c_custkey") <= 50) & (F.col("c_mktsegment") != "BUILDING")
        )
    )
    v = table.current_version()
    # evaluate the predicate at v, exactly as delete_where_mor does
    doomed = (
        table.read(version=v)
        .filter(F.col("c_custkey") <= 10)
        .select("c_custkey")
        .distinct()
    )
    n_doomed = doomed.count()
    _, del_files = table._write_data_files(doomed)

    # concurrent append lands BEFORE the delete commits — with keys that
    # match the doomed set
    readd = cust.filter(
        (F.col("c_custkey") <= 10) & (F.col("c_mktsegment") == "BUILDING")
    )
    table.append(readd)
    n_readd = readd.count()
    assert n_readd > 0

    # commit the delete the way delete_where_mor's build() does: entry
    # seq = v (evaluation snapshot), rebased onto the append's tip
    parent = table.current_version()
    prev = table._read_manifest(parent)
    manifest = table._snapshot(
        "delete-mor",
        prev["files"],
        parent,
        schema_json=prev.get("schema"),
        stats=prev.get("stats"),
        file_seq=prev.get("file_seq"),
        delete_files=prev.get("delete_files", [])
        + [{"files": del_files, "seq": v, "keys": ["c_custkey"]}],
        added=0,
    )
    table._try_commit(parent + 1, manifest)

    out = table.read()
    # pre-existing doomed keys are gone; the concurrent append survives
    assert (
        out.filter(
            (F.col("c_custkey") <= 10) & (F.col("c_mktsegment") != "BUILDING")
        ).count()
        == 0
    ), "rows visible at evaluation time must be deleted"
    assert (
        out.filter(F.col("c_mktsegment") == "BUILDING").count() == n_readd
    ), "concurrently appended rows must stay exempt"
    assert n_doomed > 0


def test_changelog_across_schema_evolution(spark, table):
    """CDC between snapshots that differ by add-column evolution: old
    rows diff as delete+insert pairs rendered in the union schema (the
    pre-evolution side reads NULL for the new column)."""
    cust = load_table(spark, SF_SMOKE, "customer")
    table.append(
        cust.select("c_custkey", "c_name").filter(F.col("c_custkey") < 5)
    )
    v1 = table.current_version()
    table.append(
        cust.select("c_custkey", "c_name", "c_acctbal").filter(
            F.col("c_custkey").between(5, 7)
        )
    )
    feed = table.changelog(v1)
    assert set(feed.columns) == {
        "_change_type", "c_custkey", "c_name", "c_acctbal",
    }
    ins = feed.filter(F.col("_change_type") == "insert")
    dels = feed.filter(F.col("_change_type") == "delete")
    # pure append: only inserts (old rows read identically in both
    # versions - NULL acctbal on both sides)
    assert dels.count() == 0
    assert ins.count() == cust.filter(F.col("c_custkey").between(5, 7)).count()
    assert ins.filter(F.col("c_acctbal").isNotNull()).count() == ins.count()


def test_publish_preserves_main_schema_evolution(spark, table):
    """WAP publish after main evolved its schema mid-audit: the staged
    snapshot's frozen schema must not revert the evolution (same
    contract as fast_forward)."""
    cust = load_table(spark, SF_SMOKE, "customer")
    narrow = cust.select("c_custkey", "c_name")
    table.append(narrow.filter(F.col("c_custkey") < 10))
    sid = table.stage_append(
        narrow.filter(F.col("c_custkey").between(10, 14))
    )
    # main evolves while the audit runs
    table.append(
        cust.select("c_custkey", "c_name", "c_acctbal").filter(
            F.col("c_custkey").between(15, 19)
        )
    )
    table.publish(sid)
    out = table.read()
    assert out.columns == ["c_custkey", "c_name", "c_acctbal"]
    assert (
        out.filter(F.col("c_custkey").between(10, 14))
        .filter(F.col("c_acctbal").isNull())
        .count()
        == 5
    )
    assert (
        out.filter(F.col("c_custkey").between(15, 19))
        .filter(F.col("c_acctbal").isNotNull())
        .count()
        == 5
    )


def test_catalog_namespace_table_resolution(spark, tmp_path):
    """The reference's 3-part identifier surface
    (my_catalog.bronze.iceberg, etl.py:49) over the path catalog:
    namespaces, identifier resolution (2- and 3-part), existence,
    listing, drops."""
    from apache_iceberg_exploration_spark.sources.catalog import (
        LakehouseCatalog,
    )

    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").limit(20)

    t = cat.table("my_catalog.bronze.iceberg")  # 3-part, catalog implicit
    assert not cat.table_exists("bronze.iceberg")
    t.overwrite(cust)
    assert cat.table_exists("bronze.iceberg")  # 2-part resolves same table
    assert cat.table("bronze.iceberg").read().count() == 20

    cat.table("silver.iceberg").overwrite(cust.limit(5))
    assert cat.namespaces() == ["bronze", "silver"]
    assert cat.tables("bronze") == ["iceberg"]

    with pytest.raises(ValueError):
        cat.drop_namespace("bronze")  # not empty
    cat.drop_table("bronze.iceberg")
    assert not cat.table_exists("bronze.iceberg")
    cat.drop_namespace("bronze")
    assert cat.namespaces() == ["silver"]
    with pytest.raises(ValueError):
        cat.table("just_one_part")


def test_concurrent_stage_publishes_both_land(spark, table):
    """Two staged WAP commits published concurrently: appends commute, so
    both rebase cleanly — every staged row lands exactly once."""
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").cache()
    cust.count()
    table.overwrite(cust.filter(F.col("c_custkey") <= 50))
    sid1 = table.stage_append(cust.filter(F.col("c_custkey").between(51, 70)))
    sid2 = table.stage_append(cust.filter(F.col("c_custkey").between(71, 90)))
    errs = []

    def pub(sid):
        try:
            table.publish(sid)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    t1 = threading.Thread(target=pub, args=(sid1,))
    t2 = threading.Thread(target=pub, args=(sid2,))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs
    assert table.read().count() == cust.filter(F.col("c_custkey") <= 90).count()


def test_fast_forward_races_main_append(spark, table):
    """Branch publish concurrent with a main append: both are additive,
    both must land regardless of commit order."""
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").cache()
    cust.count()
    table.overwrite(cust.filter(F.col("c_custkey") <= 50))
    table.create_branch("audit")
    table.append_branch(
        "audit", cust.filter(F.col("c_custkey").between(51, 60))
    )
    errs = []

    def publisher():
        try:
            table.fast_forward("audit")
        except Exception as e:  # pragma: no cover
            errs.append(e)

    def appender():
        try:
            table.append(cust.filter(F.col("c_custkey").between(61, 70)))
        except Exception as e:  # pragma: no cover
            errs.append(e)

    t1 = threading.Thread(target=publisher)
    t2 = threading.Thread(target=appender)
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs
    assert table.read().count() == cust.filter(F.col("c_custkey") <= 70).count()


def test_bloom_sidecar_point_lookup_skips_files(spark, table):
    """Point lookups on a high-cardinality UNSORTED key: min/max ranges
    overlap across files (no range pruning possible), but the bloom
    sidecars prove which files lack the key — scan opens only the file
    that can contain it, and results stay exact."""
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    # interleaved keys: every file's [min,max] spans nearly everything
    table.append(cust.filter(F.col("c_custkey") % 2 == 0).coalesce(1))
    table.append(cust.filter(F.col("c_custkey") % 2 == 1).coalesce(1))
    manifest = table._read_manifest(table.current_version())
    assert len(manifest["files"]) == 2

    # before indexing: range pruning keeps both files
    assert len(table._prune_files(manifest, {"c_custkey": (7, 7)})) == 2

    indexed = table.add_bloom_filters(["c_custkey"])
    assert indexed == 2
    assert table.add_bloom_filters(["c_custkey"]) == 0  # idempotent

    kept = table._prune_files(manifest, {"c_custkey": (7, 7)})
    assert len(kept) == 1, "bloom must skip the even-keys file"
    out = table.scan({"c_custkey": (7, 7)})
    assert [r.c_custkey for r in out.collect()] == [7]

    # range predicates are untouched by blooms
    assert table.scan({"c_custkey": (10, 20)}).count() == cust.filter(
        F.col("c_custkey").between(10, 20)
    ).count()

    # files appended AFTER indexing have no sidecar -> conservatively kept
    table.append(cust.limit(0))  # no-op append keeps manifest shape
    assert table.scan({"c_custkey": (8, 8)}).count() == 1


def test_rewrite_small_files_carries_large_ones(spark, table):
    """Bin-pack small-file compaction: only the small-file tail rewrites;
    files above the threshold carry by path (stats + seq intact); data
    unchanged; pending MoR deletes still apply everywhere."""
    import os as _os

    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    table.append(cust.coalesce(1))  # one "large" file
    for i in range(4):  # four tiny appends
        table.append(
            cust.filter(F.col("c_custkey") % 4 == i).limit(10).coalesce(1)
        )
    manifest = table._read_manifest(table.current_version())
    sizes = {f: _os.path.getsize(f) for f in manifest["files"]}
    big = max(sizes, key=sizes.get)
    pre_count = table.read().count()

    table.delete_where_mor(F.col("c_custkey") == 3, keys=["c_custkey"])
    n_del = table.read().count()

    m = table.rewrite_small_files(min_file_bytes=sizes[big])
    assert m is not None
    assert m["operation"] == "compact-small"
    assert big in m["files"], "the large file must carry by path"
    assert len(m["files"]) < len(manifest["files"])
    # the carried file keeps its seq, so the pending delete still hits it
    assert table.read().count() == n_del
    assert n_del < pre_count  # the delete really removed rows
    assert table.read().filter(F.col("c_custkey") == 3).count() == 0

    # second pass: nothing left to pack
    assert table.rewrite_small_files(min_file_bytes=sizes[big]) is None


def test_add_files_adopts_external_parquet_without_copy(spark, table, tmp_path):
    """add_files (Iceberg migrate path): external parquet joins the table
    by reference — no byte copied; reads/stats/deletes work; GC never
    reclaims external files; compaction rewrites them into table-owned
    files, completing the migration."""
    import glob as _glob
    import os as _os

    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    ext_dir = str(tmp_path / "external")
    cust.filter(F.col("c_custkey") <= 60).coalesce(1).write.parquet(ext_dir)
    ext_files = sorted(_glob.glob(ext_dir + "/*.parquet"))
    mtimes = {f: _os.path.getmtime(f) for f in ext_files}

    table.overwrite(cust.filter(F.col("c_custkey").between(61, 100)))
    m = table.add_files(ext_files)
    assert m["summary"]["imported"] is True
    n_all = cust.filter(F.col("c_custkey") <= 100).count()
    assert table.read().count() == n_all
    # source bytes untouched
    assert {f: _os.path.getmtime(f) for f in ext_files} == mtimes

    # MoR delete over adopted rows works like any other file's
    table.delete_where_mor(F.col("c_custkey") <= 10, keys=["c_custkey"])
    n_del = cust.filter(F.col("c_custkey") <= 10).count()
    assert table.read().count() == n_all - n_del

    # stats pruning sees the imported footer stats
    kept = table._prune_files(
        table._read_manifest(table.current_version()), {"c_custkey": (200, 300)}
    )
    assert kept == []  # both file groups provably excluded

    # GC passes never touch external files
    table.rewrite_data_files(target_file_count=1)  # migration completes
    table.expire_snapshots(keep_last=1)
    table.remove_orphan_files(older_than_seconds=0.0)
    assert all(_os.path.exists(f) for f in ext_files)
    assert table.read().count() == n_all - n_del


def test_merge_prune_on_rewrites_only_touched_files(spark, table):
    """File-pruned MERGE: with prune_on, only files whose stats overlap
    the source key range rewrite; out-of-range files carry by path with
    their pending MoR deletes still applying; result equals the
    full-merge semantics."""
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    lo = cust.filter(F.col("c_custkey") <= 50)
    hi = cust.filter(F.col("c_custkey") > 50)
    table.append(lo.coalesce(1))
    table.append(hi.coalesce(1))
    # pending MoR delete in the HI range (will be carried, not rewritten)
    table.delete_where_mor(F.col("c_custkey") == 60, keys=["c_custkey"])
    files_pre = set(table._read_manifest(table.current_version())["files"])

    # NARROW source entirely in the LO range: HI file must carry by path
    # (note: the source's WHOLE key range prunes, so an insert with an
    # out-of-range key would widen it — inserts here stay in-range)
    src = spark.createDataFrame(
        [(3, "UPDATED", 9.0), (-7, "NEW", 3.0)],
        "c_custkey long, c_name string, c_acctbal double",
    )
    m = table.merge_into(
        src,
        on=["c_custkey"],
        update_cols={"c_acctbal": F.col("s.c_acctbal")},
        prune_on="c_custkey",
    )
    assert m["summary"]["carried"] > 0
    assert files_pre & set(m["files"]), "out-of-range files must carry"
    out = {r.c_custkey: r for r in table.read().collect()}
    assert out[3].c_acctbal == 9.0
    assert out[3].c_name != "UPDATED"  # matched row keeps non-updated cols
    assert out[-7].c_name == "NEW"  # insert lands regardless
    assert 60 not in out  # carried file's pending delete still applies
    assert out[70].c_name == cust.filter(F.col("c_custkey") == 70).first().c_name
    assert len(out) == lo.count() + hi.count() + 1 - 1  # +insert -delete

    # correctness baseline: a broad merge over the pruned layout gives
    # full-merge semantics
    src2 = spark.createDataFrame(
        [(1, "X", 1.0), (99, "X", 2.0)],
        "c_custkey long, c_name string, c_acctbal double",
    )
    table.merge_into(
        src2,
        on=["c_custkey"],
        update_cols={"c_acctbal": F.col("s.c_acctbal")},
        prune_on="c_custkey",
    )
    out = {r.c_custkey: r for r in table.read().collect()}
    assert out[1].c_acctbal == 1.0 and out[99].c_acctbal == 2.0
    assert out[3].c_acctbal == 9.0  # earlier update intact


def test_concurrent_cow_delete_and_merge_linearize(spark, table):
    """Two different read-modify-write ops race (CoW DELETE vs MERGE):
    _commit_rmw must linearize them with both effects present, whichever
    commits first."""
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").cache()
    cust.count()
    table.overwrite(cust.select("c_custkey", "c_name", "c_acctbal"))
    errs = []

    def deleter():
        try:
            table.delete_where(F.col("c_custkey").between(0, 9))
        except Exception as e:  # pragma: no cover
            errs.append(e)

    def merger():
        try:
            src = (
                cust.filter(F.col("c_custkey").between(50, 59))
                .select(
                    "c_custkey",
                    "c_name",
                    (F.col("c_acctbal") + 5000.0).alias("c_acctbal"),
                )
            )
            table.merge_into(
                src,
                on=["c_custkey"],
                update_cols={"c_acctbal": F.col("s.c_acctbal")},
            )
        except Exception as e:  # pragma: no cover
            errs.append(e)

    t1 = threading.Thread(target=deleter)
    t2 = threading.Thread(target=merger)
    t1.start(); t2.start(); t1.join(); t2.join()

    assert not errs
    out = {r.c_custkey: r.c_acctbal for r in table.read().collect()}
    base = {r.c_custkey: r.c_acctbal for r in cust.collect()}
    n_del = cust.filter(F.col("c_custkey").between(0, 9)).count()
    assert len(out) == len(base) - n_del
    for k in range(0, 10):
        assert k not in out  # delete landed
    for k in range(50, 60):
        if k in base:
            assert abs(out[k] - (base[k] + 5000.0)) < 1e-6  # merge landed


def test_add_files_merges_schema(spark, table, tmp_path):
    """Adopting files whose schema differs by an added column: the table
    schema unions (existing rows read NULL for the new column), same
    add-column contract as appends."""
    import glob as _glob

    cust = load_table(spark, SF_SMOKE, "customer")
    table.overwrite(
        cust.select("c_custkey", "c_name").filter(F.col("c_custkey") < 10)
    )
    ext = str(tmp_path / "wide")
    cust.select("c_custkey", "c_name", "c_acctbal").filter(
        F.col("c_custkey").between(10, 14)
    ).coalesce(1).write.parquet(ext)
    table.add_files(sorted(_glob.glob(ext + "/*.parquet")))

    out = table.read()
    assert out.columns == ["c_custkey", "c_name", "c_acctbal"]
    assert (
        out.filter(F.col("c_custkey") < 10)
        .filter(F.col("c_acctbal").isNull())
        .count()
        == cust.filter(F.col("c_custkey") < 10).count()
    )
    assert (
        out.filter(F.col("c_custkey") >= 10)
        .filter(F.col("c_acctbal").isNotNull())
        .count()
        == 5
    )
    with pytest.raises(FileNotFoundError):
        table.add_files(["/nonexistent/file.parquet"])


def test_pruned_merge_concurrent_with_append(spark, table):
    """prune_on merge racing a concurrent append: _commit_rmw recomputes
    the pruning against the new tip, so the appended rows survive and
    the merge effect lands."""
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").cache()
    cust.count()
    table.append(
        cust.select("c_custkey", "c_name", "c_acctbal")
        .filter(F.col("c_custkey") <= 50)
        .coalesce(1)
    )
    table.append(
        cust.select("c_custkey", "c_name", "c_acctbal")
        .filter(F.col("c_custkey").between(51, 100))
        .coalesce(1)
    )
    errs = []

    def merger():
        try:
            src = spark.createDataFrame(
                [(5, "U", 1.5)], "c_custkey long, c_name string, c_acctbal double"
            )
            table.merge_into(
                src,
                on=["c_custkey"],
                update_cols={"c_acctbal": F.col("s.c_acctbal")},
                prune_on="c_custkey",
            )
        except Exception as e:  # pragma: no cover
            errs.append(e)

    def appender():
        try:
            table.append(
                cust.select("c_custkey", "c_name", "c_acctbal").filter(
                    F.col("c_custkey").between(101, 110)
                )
            )
        except Exception as e:  # pragma: no cover
            errs.append(e)

    t1 = threading.Thread(target=merger)
    t2 = threading.Thread(target=appender)
    t1.start(); t2.start(); t1.join(); t2.join()

    assert not errs
    out = {r.c_custkey: r.c_acctbal for r in table.read().collect()}
    assert abs(out[5] - 1.5) < 1e-9
    n_all = cust.filter(F.col("c_custkey") <= 110).count()
    assert len(out) == n_all


# -- merge-on-read UPDATE ----------------------------------------------------


def test_mor_update_is_metadata_cheap_and_exact(spark, table):
    cust = load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    table.overwrite(cust)
    v1 = table.current_version()
    files_v1 = set(table._read_manifest(v1)["files"])
    table.update_where_mor(
        F.col("c_custkey") <= 20,
        keys=["c_custkey"],
        set_cols={"c_acctbal": F.lit(0.0)},
    )
    m = table._read_manifest(table.current_version())
    # every original data file carried untouched; one equality-delete entry
    assert files_v1 <= set(m["files"])
    assert len(m["delete_files"]) == 1
    rows = table.read().collect()
    assert len(rows) == cust.count()  # one row in, one row out (no dup images)
    out = {r.c_custkey: r.c_acctbal for r in rows}
    want = {
        r.c_custkey: (0.0 if r.c_custkey <= 20 else r.c_acctbal)
        for r in cust.collect()
    }
    assert out == want
    # time travel still sees pre-update values
    old = {r.c_custkey: r.c_acctbal for r in table.read(version=v1).collect()}
    assert old == {r.c_custkey: r.c_acctbal for r in cust.collect()}


def test_mor_update_of_key_column(spark, table):
    """Updating the key itself: the delete entry lists the OLD key values
    (captured pre-update), so the old images vanish and only the re-keyed
    images surface."""
    cust = load_table(spark, SF_SMOKE, "customer").select("c_custkey", "c_name")
    table.overwrite(cust.filter(F.col("c_custkey") <= 50))
    table.update_where_mor(
        F.col("c_custkey") <= 5,
        keys=["c_custkey"],
        set_cols={"c_custkey": F.col("c_custkey") + 1000},
    )
    got = {r.c_custkey for r in table.read().collect()}
    assert got == {k + 1000 for k in range(6)} | set(range(6, 51))


def test_mor_update_spares_rows_appended_after(spark, table):
    """Sequence numbers: the update's delete entry must not claim rows
    appended after it — even for the same keys."""
    cust = load_table(spark, SF_SMOKE, "customer").select("c_custkey", "c_name")
    table.overwrite(cust.filter(F.col("c_custkey") <= 50))
    table.update_where_mor(
        F.col("c_custkey") <= 10,
        keys=["c_custkey"],
        set_cols={"c_name": F.lit("UPDATED")},
    )
    table.append(
        cust.filter(F.col("c_custkey") <= 3).withColumn(
            "c_name", F.lit("REINSERTED")
        )
    )
    rows = table.read().collect()
    by_name: dict[str, set] = {}
    for r in rows:
        by_name.setdefault(r.c_name, set()).add(r.c_custkey)
    assert by_name.get("REINSERTED") == {0, 1, 2, 3}
    # updated images all present exactly once alongside the reinserts
    updated = {r.c_custkey for r in rows if r.c_name == "UPDATED"}
    assert updated == set(range(11))
    assert len(rows) == 51 + 4


def test_mor_update_noop_commits_nothing(spark, table):
    cust = load_table(spark, SF_SMOKE, "customer").select("c_custkey", "c_name")
    table.overwrite(cust)
    v = table.current_version()
    assert (
        table.update_where_mor(
            F.col("c_custkey") < 0,
            keys=["c_custkey"],
            set_cols={"c_name": F.lit("X")},
        )
        is None
    )
    assert table.current_version() == v


def test_compaction_materializes_mor_update(spark, table):
    cust = load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_acctbal"
    )
    table.overwrite(cust)
    table.update_where_mor(
        F.col("c_custkey") <= 100,
        keys=["c_custkey"],
        set_cols={"c_acctbal": F.col("c_acctbal") + 1.0},
    )
    before = {r.c_custkey: r.c_acctbal for r in table.read().collect()}
    table.rewrite_data_files(target_file_count=2)
    m = table._read_manifest(table.current_version())
    assert m.get("delete_files", []) == []
    assert {
        r.c_custkey: r.c_acctbal for r in table.read().collect()
    } == before


def test_concurrent_mor_updates_linearize(spark, table):
    """Two racing MoR updates of overlapping keys: the rmw loop recomputes
    the loser against the winner's tip, so the effects compose instead of
    double-appending images."""
    cust = load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_acctbal"
    )
    table.overwrite(
        cust.filter(F.col("c_custkey") <= 30).withColumn(
            "c_acctbal", F.lit(0.0)
        )
    )
    errs: list[Exception] = []

    def bump(delta):
        def run():
            try:
                table.update_where_mor(
                    F.col("c_custkey") <= 10,
                    keys=["c_custkey"],
                    set_cols={"c_acctbal": F.col("c_acctbal") + delta},
                )
            except Exception as e:  # pragma: no cover
                errs.append(e)
        return run

    t1 = threading.Thread(target=bump(1.0))
    t2 = threading.Thread(target=bump(10.0))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs
    rows = table.read().collect()
    assert len(rows) == 31  # no duplicated images (row count, pre-dict)
    out = {r.c_custkey: r.c_acctbal for r in rows}
    for k in range(11):
        assert abs(out[k] - 11.0) < 1e-9, out[k]
    for k in range(11, 31):
        assert out[k] == 0.0


def test_zorder_rewrite_prunes_on_every_dimension(spark, table):
    """The z-order claim: after a Morton-interleave rewrite, a range
    predicate on EACH clustered column alone skips files (a prefix sort
    only serves its first column)."""
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    for i in range(3):
        table.append(
            li.filter(
                F.crc32(F.col("l_orderkey").cast("string")) % 3 == i
            ).repartition(2)
        )
    m0 = table._read_manifest(table.current_version())
    # fragmented appends: full-range files, nothing prunable on partkey
    assert len(
        table._prune_files(m0, {"l_partkey": (20, 70)})
    ) == len(m0["files"])
    table.rewrite_data_files(
        target_file_count=16, zorder_by=["l_orderkey", "l_partkey"]
    )
    m = table._read_manifest(table.current_version())
    n = len(m["files"])
    keep_ok = len(table._prune_files(m, {"l_orderkey": (100, 400)}))
    keep_pk = len(table._prune_files(m, {"l_partkey": (20, 70)}))
    assert keep_ok < n and keep_pk < n, (keep_ok, keep_pk, n)
    # exactness: the pruned scan equals the plain filtered source
    got = (
        table.scan({"l_orderkey": (100, 400), "l_partkey": (20, 70)})
        .agg(F.count("*"), F.sum("l_quantity"))
        .first()
    )
    want = (
        li.filter(
            F.col("l_orderkey").between(100, 400)
            & F.col("l_partkey").between(20, 70)
        )
        .agg(F.count("*"), F.sum("l_quantity"))
        .first()
    )
    assert tuple(got) == tuple(want)


def test_files_metadata_rows_from_manifest(spark, table):
    """The files metadata table takes row counts from the manifest's
    commit-time ``__rows`` stats — no footer parse — and keeps the
    reserved key out of the per-column stats_json."""
    import json as _json

    cust = load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_name"
    )
    table.overwrite(cust.repartition(4))
    m = table._read_manifest(table.current_version())
    assert all(
        s.get("__rows") is not None for s in m["stats"].values()
    )
    fm = table.files().collect()
    assert sum(r.num_rows for r in fm) == cust.count()
    for r in fm:
        assert r.num_rows == m["stats"][r.file_path]["__rows"]
        assert "__rows" not in _json.loads(r.stats_json)
    # range pruning is unaffected by the reserved key
    kept = table._prune_files(m, {"c_custkey": (0, 10)})
    assert set(kept) <= set(m["files"])


def test_hash_distribution_one_file_per_partition(spark, table):
    """write.distribution-mode=hash: a partitioned write clusters rows so
    each partition tuple gets exactly one file; the default (no
    distribution) fans out to tasks x values. Results identical."""
    cust = load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    ).repartition(8)
    table.overwrite(cust, partition_by=["c_mktsegment"], distribution="hash")
    m = table._read_manifest(table.current_version())
    per_tuple: dict[str, int] = {}
    for f in m["files"]:
        seg = m["partitions"][f]["c_mktsegment"]
        per_tuple[seg] = per_tuple.get(seg, 0) + 1
    assert per_tuple and all(n == 1 for n in per_tuple.values()), per_tuple
    assert _hash_df(table.read()) == _hash_df(cust)
    # appends honour it too
    table.append(
        cust.limit(500), partition_by=["c_mktsegment"], distribution="hash"
    )
    m2 = table._read_manifest(table.current_version())
    new_files = [f for f in m2["files"] if f not in set(m["files"])]
    segs = [m2["partitions"][f]["c_mktsegment"] for f in new_files]
    assert len(segs) == len(set(segs))  # one new file per touched tuple


def test_mor_update_with_partition_spec_keeps_metadata_exact(spark, table):
    """Passing the table's spec to update_where_mor lays the updated
    images out under it: every data file (old and new) carries a
    partition tuple, partitions() counts stay per-segment-exact, and
    partition pruning can skip the image files too."""
    cust = load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    table.overwrite(
        cust, partition_by=["c_mktsegment"], distribution="hash"
    )
    table.update_where_mor(
        (F.col("c_mktsegment") == "BUILDING") & (F.col("c_custkey") <= 50),
        keys=["c_custkey"],
        set_cols={"c_name": F.lit("TOUCHED")},
        partition_by=["c_mktsegment"],
    )
    m = table._read_manifest(table.current_version())
    assert all(f in m["partitions"] for f in m["files"])
    per_seg = {
        r["partition"]: r["row_count"]
        for r in table.partitions().collect()
    }
    assert '{}' not in per_seg  # no phantom unpartitioned rollup
    want = {
        f'{{"c_mktsegment":"{r.c_mktsegment}"}}': r.n
        for r in cust.groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # old images still in files (MoR), so per-partition rows = base + images
    touched = cust.filter(
        (F.col("c_mktsegment") == "BUILDING") & (F.col("c_custkey") <= 50)
    ).count()
    want['{"c_mktsegment":"BUILDING"}'] += touched
    assert per_seg == want
    rows = table.read().collect()
    assert len(rows) == cust.count()
    assert {r.c_custkey for r in rows if r.c_name == "TOUCHED"} == {
        r.c_custkey
        for r in cust.filter(
            (F.col("c_mktsegment") == "BUILDING") & (F.col("c_custkey") <= 50)
        ).collect()
    }


# -- r6: shallow clone, constraint-gated writes, full-sync merge ----------


def test_shallow_clone_diverges_independently(spark, tmp_path):
    src = LakehouseTable(spark, str(tmp_path / "src"))
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    src.overwrite(cust)
    clone = src.clone(str(tmp_path / "clone"))
    # zero-copy: clone's manifest references the source's files
    assert set(clone._read_manifest(clone.current_version())["files"]) == set(
        src._read_manifest(src.current_version())["files"]
    )
    assert _hash_df(clone.read()) == _hash_df(cust)
    # divergence is two-way invisible
    clone.append(cust.filter(F.col("c_custkey") < 5))
    src.append(cust.filter(F.col("c_custkey") < 3))
    assert clone.read().count() == cust.count() + 5
    assert src.read().count() == cust.count() + 3


def test_shallow_clone_survives_source_expire(spark, tmp_path):
    src = LakehouseTable(spark, str(tmp_path / "src"))
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    src.overwrite(cust.filter(F.col("c_custkey") < 50))
    clone = src.clone(str(tmp_path / "clone"))
    # source moves on and expires history: the auto-tag anchors the
    # cloned version, so shared files survive the GC
    src.overwrite(cust.filter(F.col("c_custkey") >= 50))
    src.expire_snapshots(keep_last=1)
    src.remove_orphan_files(older_than_seconds=0)
    assert clone.read().count() == 50
    # dropping the tag releases the anchor: next expire may collect
    tag = clone._read_manifest(clone.current_version())["summary"][
        "source_retention_tag"
    ]
    src.drop_tag(tag)
    assert tag not in src.tags()


def test_shallow_clone_partitioned_source_reads_partition_column(
    spark, tmp_path
):
    """ADVICE r3 (high): cloning a hive-partitioned table must recover
    the partition column. The clone's manifest references SOURCE files
    (outside the clone's data root); basePath resolution used to fall
    back to dirname(file) — the leaf 'col=val' dir — so partition
    discovery recovered nothing and the column read back NULL."""
    src = LakehouseTable(spark, str(tmp_path / "src"))
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    src.overwrite(cust, partition_by=["c_mktsegment"])
    clone = src.clone(str(tmp_path / "clone"))
    got = clone.read()
    assert got.filter(F.col("c_mktsegment").isNull()).count() == 0
    assert _hash_df(got.select(*sorted(cust.columns))) == _hash_df(
        cust.select(*sorted(cust.columns))
    )
    # pruned read on the partition column still works through the clone
    seg = cust.select("c_mktsegment").first()[0]
    assert (
        clone.read().filter(F.col("c_mktsegment") == seg).count()
        == cust.filter(F.col("c_mktsegment") == seg).count()
    )
    # and the clone's own partitioned appends still group by its data root
    clone.append(
        cust.filter(F.col("c_custkey") < 5), partition_by=["c_mktsegment"]
    )
    assert clone.read().count() == cust.count() + 5
    assert clone.read().filter(F.col("c_mktsegment").isNull()).count() == 0


def test_clone_rejects_existing_destination(spark, tmp_path):
    src = LakehouseTable(spark, str(tmp_path / "src"))
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    src.overwrite(cust)
    src.clone(str(tmp_path / "clone"))
    with pytest.raises(ValueError, match="destination exists"):
        src.clone(str(tmp_path / "clone"))
    with pytest.raises(ValueError, match="empty table"):
        LakehouseTable(spark, str(tmp_path / "void")).clone(
            str(tmp_path / "clone2")
        )


def test_append_with_constraints_quarantines(spark, tmp_path):
    tbl = LakehouseTable(spark, str(tmp_path / "t"))
    dlq = LakehouseTable(spark, str(tmp_path / "dlq"))
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    n_bad = cust.filter(F.col("c_acctbal") < 0).count()
    assert n_bad > 0, "fixture must contain negative balances"
    m = tbl.append_with_constraints(
        cust,
        constraints={"acctbal_nonneg": F.col("c_acctbal") >= 0},
        quarantine=dlq,
    )
    assert tbl.read().count() == cust.count() - n_bad
    assert dlq.read().count() == n_bad
    assert m["summary"]["constraint_violations"] == {
        "acctbal_nonneg": n_bad
    }
    assert m["summary"]["quarantined_rows"] == n_bad
    # quarantined rows carry the violated constraint names
    marks = {
        r["violated_constraints"]
        for r in dlq.read().select("violated_constraints").collect()
    }
    assert marks == {"acctbal_nonneg"}


def test_append_with_constraints_main_commit_first(spark, tmp_path):
    """ADVICE r3 (low): the quarantine used to commit BEFORE the main
    append — a failed main commit left violations already dead-lettered
    and a retry re-quarantined the same rows (duplicate DLQ entries).
    Now the main append commits first: if it fails, the DLQ is
    untouched and the whole call retries cleanly."""
    tbl = LakehouseTable(spark, str(tmp_path / "t"))
    dlq = LakehouseTable(spark, str(tmp_path / "dlq"))
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    orig_append = tbl.append
    tbl.append = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("simulated commit contention")
    )
    with pytest.raises(RuntimeError, match="contention"):
        tbl.append_with_constraints(
            cust,
            constraints={"acctbal_nonneg": F.col("c_acctbal") >= 0},
            quarantine=dlq,
        )
    assert dlq.current_version() == 0, "DLQ must be untouched on failure"
    # the retry then lands exactly one DLQ batch — no duplicates
    tbl.append = orig_append
    tbl.append_with_constraints(
        cust,
        constraints={"acctbal_nonneg": F.col("c_acctbal") >= 0},
        quarantine=dlq,
    )
    assert dlq.read().count() == cust.filter(
        F.col("c_acctbal") < 0
    ).count()


def test_append_with_constraints_null_is_violation(spark, tmp_path):
    tbl = LakehouseTable(spark, str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, -1.0)], "id long, v double"
    )
    m = tbl.append_with_constraints(
        df, constraints={"v_nonneg": F.col("v") >= 0}
    )
    assert sorted(
        r["id"] for r in tbl.read().select("id").collect()
    ) == [1]  # NULL predicate result quarantines, CHECK-style pass is not enough
    assert m["summary"]["constraint_violations"] == {"v_nonneg": 2}


def test_merge_full_sync_mirrors_source(spark, tmp_path):
    tbl = LakehouseTable(spark, str(tmp_path / "t"))
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    tbl.overwrite(cust)
    source = cust.filter(F.col("c_custkey") % 2 == 0).withColumn(
        "c_acctbal", F.lit(0.0)
    )
    tbl.merge_into(
        source,
        on=["c_custkey"],
        update_cols={"c_acctbal": F.col("s.c_acctbal")},
        delete_unmatched_target=True,
    )
    got = tbl.read()
    assert got.count() == source.count()
    assert got.agg(F.sum("c_acctbal")).first()[0] == 0.0
    with pytest.raises(ValueError, match="full-table merge"):
        tbl.merge_into(
            source,
            on=["c_custkey"],
            delete_unmatched_target=True,
            prune_on="c_custkey",
        )


def test_partition_layout_survives_row_level_mutations(spark, tmp_path):
    """Partition specs + per-file tuples must be carried through CoW
    delete/update and MoR/positional deletes — dropping them silently
    disables partition pruning for every subsequent read (r6 fix)."""
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")

    def fresh(name):
        t = LakehouseTable(spark, str(tmp_path / name))
        t.overwrite(
            cust, partition_by=["c_mktsegment"], distribution="hash"
        )
        return t

    def assert_prunes(t, expect_rows):
        m = t._read_manifest(t.current_version())
        assert m.get("partition_specs"), "specs dropped"
        kept = t._partition_prune(
            m, {"c_mktsegment": ("BUILDING", "BUILDING")}, m["files"]
        )
        assert len(kept) < len(m["files"]), "no files pruned"
        got = t.scan({"c_mktsegment": ("BUILDING", "BUILDING")}).count()
        assert got == expect_rows

    n_building_all = cust.filter(
        F.col("c_mktsegment") == "BUILDING"
    ).count()
    n_building = cust.filter(
        (F.col("c_mktsegment") == "BUILDING") & (F.col("c_custkey") >= 10)
    ).count()

    # CoW delete/update scoped (via prune) to ONE partition: the other
    # partitions' files carry with their tuples and stay prunable
    t = fresh("cow_del")
    t.delete_where(
        F.col("c_mktsegment") == "MACHINERY",
        prune={"c_mktsegment": ("MACHINERY", "MACHINERY")},
    )
    assert_prunes(t, n_building_all)

    t = fresh("cow_upd")
    t.update_where(
        F.col("c_mktsegment") == "MACHINERY",
        set_cols={"c_acctbal": F.lit(0.0)},
        prune={"c_mktsegment": ("MACHINERY", "MACHINERY")},
    )
    assert_prunes(t, n_building_all)

    # MoR/positional deletes rewrite nothing: every file keeps its tuple
    t = fresh("mor_del")
    t.delete_where_mor(F.col("c_custkey") < 10, keys=["c_custkey"])
    assert_prunes(t, n_building)

    t = fresh("pos_del")
    t.delete_where_pos(F.col("c_custkey") < 10)
    assert_prunes(t, n_building)


def test_overwrite_where_replaces_slice_idempotently(spark, tmp_path):
    tbl = LakehouseTable(spark, str(tmp_path / "t"))
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    tbl.overwrite(cust, partition_by=["c_mktsegment"], distribution="hash")
    n_total = cust.count()
    n_bld = cust.filter(F.col("c_mktsegment") == "BUILDING").count()
    repl = cust.filter(F.col("c_mktsegment") == "BUILDING").withColumn(
        "c_acctbal", F.lit(1.0)
    )
    h = None
    for _ in range(2):
        m = tbl.overwrite_where(
            repl,
            F.col("c_mktsegment") == "BUILDING",
            prune={"c_mktsegment": ("BUILDING", "BUILDING")},
        )
        # slice-scoped: the 4 other partitions always carry by path
        assert m["summary"]["carried"] == 4, m["summary"]
        got = _hash_df(tbl.read())
        assert h is None or got == h  # idempotent
        h = got
    assert tbl.read().count() == n_total
    assert (
        tbl.read()
        .filter(F.col("c_mktsegment") == "BUILDING")
        .agg(F.sum("c_acctbal"))
        .first()[0]
        == n_bld * 1.0
    )
    # validation: rows outside the slice are rejected before any commit
    v = tbl.current_version()
    with pytest.raises(ValueError, match="violate the replace"):
        tbl.overwrite_where(
            cust.limit(50), F.col("c_mktsegment") == "BUILDING"
        )
    assert tbl.current_version() == v


def test_small_file_compaction_preserves_partition_layout(spark, tmp_path):
    """Packing the small-file tail of a PARTITIONED table must re-layout
    packed rows by the table's own specs (new files carry partition
    tuples) — cross-partition coalescing would silently degrade pruning
    with every maintenance tick (r6 fix)."""
    tbl = LakehouseTable(spark, str(tmp_path / "t"))
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    tbl.overwrite(cust, partition_by=["c_mktsegment"], distribution="hash")
    # two tiny partitioned appends create the small-file tail
    tbl.append(
        cust.filter(F.col("c_custkey") < 5),
        partition_by=["c_mktsegment"],
        distribution="hash",
    )
    tbl.append(
        cust.filter(F.col("c_custkey").between(5, 9)),
        partition_by=["c_mktsegment"],
        distribution="hash",
    )
    m = tbl.rewrite_small_files(min_file_bytes=1024 * 1024)
    assert m is not None and m["summary"]["added_files"] >= 1
    mf = tbl._read_manifest(tbl.current_version())
    # EVERY live file carries a partition tuple after compaction
    missing = [f for f in mf["files"] if f not in mf.get("partitions", {})]
    assert not missing, missing
    # and a partition-predicate scan still prunes + returns exact rows
    kept = tbl._partition_prune(
        mf, {"c_mktsegment": ("BUILDING", "BUILDING")}, mf["files"]
    )
    assert len(kept) < len(mf["files"])
    got = tbl.scan({"c_mktsegment": ("BUILDING", "BUILDING")}).count()
    exact = cust.filter(F.col("c_mktsegment") == "BUILDING").count()
    extra = cust.filter(
        (F.col("c_mktsegment") == "BUILDING") & (F.col("c_custkey") < 10)
    ).count()
    assert got == exact + extra


def test_rollback_and_publish_preserve_partition_layout(spark, tmp_path):
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    # rollback restores the old snapshot's layout wholesale
    t = LakehouseTable(spark, str(tmp_path / "rb"))
    t.overwrite(cust, partition_by=["c_mktsegment"], distribution="hash")
    t.overwrite(cust.limit(10))  # unpartitioned "bad" overwrite
    t.rollback(1)
    m = t._read_manifest(t.current_version())
    assert m.get("partition_specs"), "rollback dropped specs"
    assert set(m.get("partitions", {})) == set(m["files"])
    # WAP publish keeps the parent's layout
    t2 = LakehouseTable(spark, str(tmp_path / "wap"))
    t2.overwrite(cust, partition_by=["c_mktsegment"], distribution="hash")
    sid = t2.stage_append(cust.limit(5))
    t2.publish(sid)
    m2 = t2._read_manifest(t2.current_version())
    assert m2.get("partition_specs"), "publish dropped specs"
    kept = t2._partition_prune(
        m2, {"c_mktsegment": ("BUILDING", "BUILDING")}, m2["files"]
    )
    assert len(kept) < len(m2["files"])


def test_concurrent_replace_where_and_append_linearize(spark, table):
    """overwrite_where racing a concurrent append must linearize: the
    replace recomputes against the new tip (or the append rebases onto
    the replace), so the final table holds the replaced slice exactly
    once PLUS the concurrently appended rows — no lost update either
    way the commits land."""
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").cache()
    cust.count()
    table.overwrite(cust)
    repl = cust.filter(F.col("c_mktsegment") == "BUILDING").withColumn(
        "c_acctbal", F.lit(5.0)
    )
    extra = (
        cust.filter(F.col("c_mktsegment") != "BUILDING")
        .limit(15)
        .withColumn("c_custkey", F.col("c_custkey") + 10_000_000)
    )
    errs = []

    def replacer():
        try:
            table.overwrite_where(
                repl, F.col("c_mktsegment") == "BUILDING"
            )
        except Exception as e:  # pragma: no cover
            errs.append(e)

    def appender():
        try:
            table.append(extra)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    t1 = threading.Thread(target=replacer)
    t2 = threading.Thread(target=appender)
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs
    got = table.read()
    n_bld = cust.filter(F.col("c_mktsegment") == "BUILDING").count()
    # every original row survives exactly once, plus the 15 appended
    assert got.count() == cust.count() + 15
    bld = got.filter(
        (F.col("c_mktsegment") == "BUILDING")
        & (F.col("c_custkey") < 10_000_000)
    )
    assert bld.count() == n_bld
    assert bld.agg(F.sum("c_acctbal")).first()[0] == n_bld * 5.0

def test_changelog_gcd_pos_coordinates_refused_clearly(spark, table):
    """ADVICE r4 (adjudicated differently): an interval spanning a
    position-delete entry whose coordinate parquet is unreadable cannot
    be reconstructed — the rows that entry killed would read as alive
    on the materialized side, silently erasing their change events. The
    feed must refuse with a clear, actionable error, not an opaque
    FileNotFoundError (and not a silently-wrong 'conservative'
    fallback). Normal retention cannot reach this state (both GC passes
    keep delete-key files of retained manifests); this simulates
    out-of-band damage."""
    import os as _os

    import pytest as _pytest

    cust = load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_name"
    )
    table.overwrite(cust)
    table.delete_where_pos(F.col("c_custkey").between(10, 12))
    v2 = table.current_version()
    coords = [
        kf
        for d in table._read_manifest(v2)["delete_files"]
        if d.get("pos")
        for kf in d["files"]
    ]
    assert coords
    table.rollback(1)  # entry REMOVED in (v2, v3]
    for kf in coords:
        _os.remove(kf)  # simulate out-of-band GC damage
    with _pytest.raises(ValueError, match="coordinate"):
        table.changelog(v2).collect()

def test_table_lifecycle_is_rename_free(spark, tmp_path, monkeypatch):
    """Object-store seam (VERDICT r4 'missing' #2, the part provable
    without a real object store): the metadata/commit layer must never
    rely on RENAME — S3-class stores have no atomic rename, which is
    what breaks Hive-style commit protocols there. Our protocol is
    write-temp + create-if-absent publish (os.link — the conditional-
    PUT shape) and data files land once under fresh uuid dirs. Proven
    by FORBIDDING rename/replace/move for a full mutation lifecycle.
    (Data-file bytes are written by Spark's committer in the JVM —
    on S3A that is the magic committer's job, outside this layer;
    directory LISTing for current_version maps to S3 LIST, strongly
    consistent since 2020.)"""
    import os as _os
    import shutil as _shutil

    from apache_iceberg_exploration_spark.sources.lakehouse import (
        LakehouseTable,
    )

    def _no_rename(*a, **k):
        raise AssertionError(
            "rename/replace/move used in the table layer — breaks the "
            "object-store (rename-free) commit contract"
        )

    monkeypatch.setattr(_os, "rename", _no_rename)
    monkeypatch.setattr(_os, "replace", _no_rename)
    monkeypatch.setattr(_shutil, "move", _no_rename)

    cust = load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    t = LakehouseTable(spark, str(tmp_path / "t"))
    t.overwrite(cust.filter(F.col("c_custkey") < 40))
    t.append(cust.filter(F.col("c_custkey").between(40, 59)))
    t.delete_where(
        F.col("c_custkey") < 5, prune={"c_custkey": (0, 4)}
    )
    t.update_where(
        F.col("c_custkey").between(10, 12),
        set_cols={"c_acctbal": F.col("c_acctbal") + 1},
        prune={"c_custkey": (10, 12)},
    )
    t.delete_where_mor(F.col("c_custkey") == 30, keys=["c_custkey"])
    t.rewrite_data_files()
    v = t.current_version()
    t.rollback(v - 1)
    t.tag("pin")
    t.expire_snapshots(keep_last=3)
    got = {r.c_custkey for r in t.read().collect()}
    want = set(range(5, 60)) - {30}
    assert got == want

def test_expire_snapshots_dry_run_previews_real_run(spark, table):
    """Retention preview (Iceberg's expire dry-run): report-only, no
    deletion; the real run then expires exactly the previewed versions,
    tagged snapshots stay anchored, and previewed-doomed files are the
    ones physically removed (per-directory rule)."""
    import os as _os

    cust = load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_name"
    )
    for i in range(4):
        table.append(cust.filter(F.col("c_custkey") % 4 == i))
    table.rewrite_data_files()  # v5 rewrites — v1-v4 files become dead
    table.tag("keep2", 2)  # anchor v2 against expiry

    report = table.expire_snapshots(keep_last=1, dry_run=True)
    assert report["would_expire_versions"] == [1, 3, 4]  # 2 tagged, 5 kept
    assert report["doomed_files"]  # the pre-compaction fragments
    for f in report["doomed_files"]:
        assert _os.path.exists(f)  # nothing deleted by the preview
    assert table.current_version() == 5
    assert {s["version"] for s in table.snapshots()} == {1, 2, 3, 4, 5}

    expired = table.expire_snapshots(keep_last=1)
    assert expired == report["would_expire_versions"]
    assert {s["version"] for s in table.snapshots()} == {2, 5}
    # conservative per-directory deletion: no doomed file survives in a
    # fully-doomed directory, and no retained file was touched
    assert table.read().count() == cust.count()
    assert table.read(version=2).count() == cust.filter(
        F.col("c_custkey") % 4 < 2
    ).count()

def test_null_count_stats_prune_null_predicate_scans(spark, tmp_path):
    """Per-column null counts (Iceberg's null_value_counts) recorded at
    commit time prune IS NULL / IS NOT NULL scans on BOTH surfaces:
    LakehouseTable.scan(null_predicates=...) and the DSv2 reader's
    pushFilters path — exactness preserved, files provably empty for
    the predicate never planned."""
    t = LakehouseTable(spark, str(tmp_path / "t"))
    cust = load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_name"
    )
    n_lo = cust.filter(F.col("c_custkey") < 60).count()
    t.append(  # file A: c_name entirely NULL
        cust.filter(F.col("c_custkey") < 60)
        .withColumn("c_name", F.lit(None).cast("string"))
        .repartition(1)
    )
    t.append(  # file B: null-free
        cust.filter(F.col("c_custkey") >= 60).repartition(1)
    )
    m = t._read_manifest(t.current_version())
    assert len(m["files"]) == 2
    # manifest recorded the counts
    by_nulls = sorted(
        m["stats"][f]["__nulls"]["c_name"] for f in m["files"]
    )
    assert by_nulls[0] == 0 and by_nulls[1] == n_lo

    # IS NOT NULL prunes the all-null file; IS NULL prunes the other
    kept_nn = t._prune_files(m, {}, {"c_name": False})
    kept_n = t._prune_files(m, {}, {"c_name": True})
    assert len(kept_nn) == 1 and len(kept_n) == 1
    assert set(kept_nn) != set(kept_n)
    # results stay exact
    assert t.scan({}, null_predicates={"c_name": True}).count() == n_lo
    assert (
        t.scan({}, null_predicates={"c_name": False}).count()
        == cust.count() - n_lo
    )

    # DSv2 pushFilters path: IS NOT NULL plans 1 task for 2 files
    from apache_iceberg_exploration_spark.streaming.lakehouse_source import (
        make_lakehouse_batch_source,
    )

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(make_lakehouse_batch_source())
    scan = (
        spark.read.format("lakehouse")
        .option("path", str(tmp_path / "t"))
        .load()
        .filter(F.col("c_name").isNotNull())
    )
    assert scan.rdd.getNumPartitions() == 1
    assert scan.count() == cust.count() - n_lo
    scan_null = (
        spark.read.format("lakehouse")
        .option("path", str(tmp_path / "t"))
        .load()
        .filter(F.col("c_name").isNull())
    )
    assert scan_null.rdd.getNumPartitions() == 1
    assert scan_null.count() == n_lo

def test_dsv2_reader_version_as_of_accepts_tag_names(spark, tmp_path):
    """Iceberg's `VERSION AS OF 'tag'` through the DSv2 batch reader:
    versionAsOf resolves tag names via refs/, numbers still work, and
    an unknown name fails loudly."""
    import pytest

    from apache_iceberg_exploration_spark.streaming.lakehouse_source import (
        make_lakehouse_batch_source,
    )

    t = LakehouseTable(spark, str(tmp_path / "t"))
    cust = load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_name"
    )
    t.overwrite(cust.filter(F.col("c_custkey") < 50))  # v1
    t.tag("training-v1")
    t.append(cust.filter(F.col("c_custkey") >= 50))  # v2
    spark.dataSource.register(make_lakehouse_batch_source())

    def read(**opts):
        r = spark.read.format("lakehouse").option(
            "path", str(tmp_path / "t")
        )
        for k, v in opts.items():
            r = r.option(k, v)
        return r.load()

    assert read(versionAsOf="training-v1").count() == 50
    assert read(versionAsOf="1").count() == 50
    assert read().count() == cust.count()
    with pytest.raises(Exception, match="no such tag"):
        read(versionAsOf="nope").count()

def test_read_incremental_accepts_tag_bounds(spark, tmp_path):
    """Incremental reads bounded by TAG names: consume "everything
    since training-v1" without holding a raw version number."""
    t = LakehouseTable(spark, str(tmp_path / "t"))
    cust = load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_name"
    )
    t.append(cust.filter(F.col("c_custkey") < 50))  # v1
    t.tag("training-v1")
    t.append(cust.filter(F.col("c_custkey").between(50, 99)))  # v2
    t.tag("training-v2")
    t.append(cust.filter(F.col("c_custkey") >= 100))  # v3

    by_tag = t.read_incremental("training-v1", "training-v2")
    by_num = t.read_incremental(1, 2)
    assert sorted(r.c_custkey for r in by_tag.collect()) == sorted(
        r.c_custkey for r in by_num.collect()
    )
    since_tag = t.read_incremental("training-v2")
    assert {r.c_custkey for r in since_tag.collect()} == {
        r.c_custkey for r in cust.filter(F.col("c_custkey") >= 100).collect()
    }
    import pytest

    with pytest.raises(ValueError, match="unknown tag"):
        t.read_incremental("nope")

def test_persistent_check_constraints_enforced_on_writes(spark, tmp_path):
    """Delta-style table-level CHECK constraints: adding one validates
    existing data, every later append/overwrite enforces it (refused
    BEFORE any commit — version unchanged), NULL evaluations violate,
    and dropping it re-opens the gate."""
    import pytest

    t = LakehouseTable(spark, str(tmp_path / "t"))
    cust = load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_acctbal"
    )
    t.overwrite(cust.filter(F.col("c_acctbal") >= 0))
    t.add_check_constraint("nonneg_bal", "c_acctbal >= 0")

    # adding a constraint the CURRENT data violates is refused
    with pytest.raises(ValueError, match="existing"):
        t.add_check_constraint("impossible", "c_custkey > 100000")

    v = t.current_version()
    with pytest.raises(ValueError, match="nonneg_bal"):
        t.append(
            cust.filter(F.col("c_acctbal") < 0).limit(5)
            if cust.filter(F.col("c_acctbal") < 0).count()
            else cust.limit(3).withColumn("c_acctbal", F.lit(-1.0))
        )
    assert t.current_version() == v  # nothing committed

    # NULL evaluation counts as a violation
    with pytest.raises(ValueError, match="nonneg_bal"):
        t.append(
            cust.limit(2).withColumn(
                "c_acctbal", F.lit(None).cast("double")
            )
        )
    # conforming write passes; drop re-opens the gate
    t.append(cust.filter(F.col("c_acctbal") >= 0).limit(5))
    t.drop_check_constraint("nonneg_bal")
    t.append(cust.limit(2).withColumn("c_acctbal", F.lit(-1.0)))
    assert t.current_version() == v + 2

def test_expire_snapshots_older_than_timestamp(spark, table):
    """Age-based retention (Iceberg expire_snapshots(older_than)):
    only snapshots committed strictly before the timestamp expire,
    keep_last floors survival, and a mid-history young snapshot stops
    the walk (history stays contiguous)."""
    import json as _json
    import os as _os

    cust = load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_name"
    )
    for i in range(4):
        table.append(cust.filter(F.col("c_custkey") % 4 == i))
    # age the first two snapshots artificially
    for v in (1, 2):
        p = table._manifest_path(v)
        m = _json.load(open(p))
        m["committed_at"] -= 10_000
        _json.dump(m, open(p, "w"))

    import time as _time

    ts = _time.time() - 5_000  # between the aged pair and v3/v4
    report = table.expire_snapshots(
        keep_last=1, older_than_ts=ts, dry_run=True
    )
    assert report["would_expire_versions"] == [1, 2]
    expired = table.expire_snapshots(keep_last=1, older_than_ts=ts)
    assert expired == [1, 2]
    assert {s["version"] for s in table.snapshots()} == {3, 4}
    # keep_last floors survival even with an aggressive timestamp:
    # only {3, 4} remain and keep_last=2 retains both
    expired2 = table.expire_snapshots(
        keep_last=2, older_than_ts=_time.time() + 10
    )
    assert expired2 == []
    assert {s["version"] for s in table.snapshots()} == {3, 4}
    # keep_last=1 then lets the aggressive timestamp take v3
    assert table.expire_snapshots(
        keep_last=1, older_than_ts=_time.time() + 10
    ) == [3]
    assert table.read().count() == cust.count()

def test_dynamic_partition_overwrite_replaces_present_partitions(
    spark, tmp_path
):
    """Dynamic INSERT OVERWRITE: partitions inferred from the incoming
    data replace their old contents; absent partitions carry; rerun is
    idempotent; unattributable (pre-spec) files refuse loudly."""
    import pytest

    t = LakehouseTable(spark, str(tmp_path / "t"))
    cust = load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    t.overwrite(
        cust, partition_by=["c_mktsegment"], distribution="hash"
    )
    before = {
        r.c_mktsegment: r.n
        for r in t.read().groupBy("c_mktsegment").count()
        .withColumnRenamed("count", "n").collect()
    }
    # replace ONLY the BUILDING partition with a halved slice
    repl = cust.filter(
        (F.col("c_mktsegment") == "BUILDING") & (F.col("c_custkey") % 2 == 0)
    )
    n_repl = repl.count()
    t.overwrite_partitions_dynamic(repl)
    after = {
        r.c_mktsegment: r.n
        for r in t.read().groupBy("c_mktsegment").count()
        .withColumnRenamed("count", "n").collect()
    }
    assert after.pop("BUILDING") == n_repl
    assert after == {k: v for k, v in before.items() if k != "BUILDING"}
    # idempotent rerun
    t.overwrite_partitions_dynamic(repl)
    assert t.read().filter("c_mktsegment = 'BUILDING'").count() == n_repl
    # unattributable files refuse: append without partition layout
    t.append(cust.filter(F.col("c_custkey") < 5).repartition(1))
    with pytest.raises(ValueError, match="no partition tuple"):
        t.overwrite_partitions_dynamic(repl)


def test_type_promotion_widening_append(spark, table):
    """Iceberg type promotion on write: appending a LONG frame into an
    INT column promotes the DECLARED type to long — values past 2^31
    survive exactly (before the fix they would cast-wrap), and old
    files' ints upcast losslessly."""
    ints = spark.range(5).select(
        F.col("id").cast("int").alias("k"),
        F.col("id").cast("int").alias("v"),
    )
    table.append(ints)
    v1 = table.current_version()
    big = spark.range(5, 8).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") + F.lit(2**40)).alias("v"),  # long territory
    )
    table.append(big)
    out = table.read()
    assert dict(out.dtypes)["v"] == "bigint"
    got = {r.k: r.v for r in out.collect()}
    assert got[7] == 7 + 2**40  # no wrap
    assert got[2] == 2  # old ints upcast exactly
    # time travel: the pre-promotion snapshot keeps its int schema
    assert dict(table.read(v1).dtypes)["v"] == "int"


def test_type_promotion_decimal_precision(spark, table):
    """decimal(P,S) widens to decimal(P'>P,S) at equal scale; a scale
    change is NOT a promotion and raises."""
    table.append(
        spark.range(3).select(
            "id", F.col("id").cast("decimal(10,2)").alias("amt")
        )
    )
    table.append(
        spark.range(3, 5).select(
            "id", F.col("id").cast("decimal(16,2)").alias("amt")
        )
    )
    assert dict(table.read().dtypes)["amt"] == "decimal(16,2)"
    with pytest.raises(ValueError, match="incompatible"):
        table.append(
            spark.range(5, 6).select(
                "id", F.col("id").cast("decimal(16,4)").alias("amt")
            )
        )


def test_type_promotion_rejects_incompatible(spark, table):
    """A non-promotable type conflict (string into int, double into
    long) raises loudly instead of silently casting values down."""
    table.append(spark.range(3).select("id", F.lit(1).alias("v")))
    with pytest.raises(ValueError, match="incompatible"):
        table.append(
            spark.range(3, 4).select("id", F.lit("oops").alias("v"))
        )
    with pytest.raises(ValueError, match="incompatible"):
        table.append(
            spark.range(3, 4).select("id", F.lit(1.5).alias("v"))
        )


def test_type_promotion_narrower_append_keeps_wide(spark, table):
    """Appending a NARROWER frame (int into a long column) keeps the
    declared wide type — incoming values upcast, no schema change."""
    table.append(spark.range(3).select("id", F.col("id").alias("v")))
    table.append(
        spark.range(3, 5).select(
            "id", F.col("id").cast("int").alias("v")
        )
    )
    out = table.read()
    assert dict(out.dtypes)["v"] == "bigint"
    assert out.count() == 5


def test_update_column_type_ddl(spark, table):
    """ALTER COLUMN TYPE: metadata-only widening — no data files change,
    later appends may write the wide type directly, narrowing raises."""
    table.append(
        spark.range(4).select("id", F.col("id").cast("int").alias("v"))
    )
    files_before = set(table._read_manifest(table.current_version())["files"])
    table.update_column_type("v", "long")
    m = table._read_manifest(table.current_version())
    assert set(m["files"]) == files_before  # metadata-only
    assert dict(table.read().dtypes)["v"] == "bigint"
    table.append(
        spark.range(4, 6).select(
            "id", (F.col("id") + F.lit(2**40)).alias("v")
        )
    )
    assert table.read().filter(F.col("v") > 2**39).count() == 2
    with pytest.raises(ValueError, match="NARROW|incompatible"):
        table.update_column_type("v", "int")
    with pytest.raises(ValueError, match="no such column"):
        table.update_column_type("nope", "long")


def test_refs_metadata_table(spark, table):
    """refs metadata table: tags and branches surface as typed rows
    (Iceberg <table>.refs parity)."""
    table.append(spark.range(3).select("id"))
    table.tag("v1-release")
    table.create_branch("experiment")
    table.append_branch(
        "experiment", spark.range(3, 5).select("id")
    )
    refs = {r.name: r for r in table.refs().collect()}
    assert refs["v1-release"].type == "tag"
    assert refs["v1-release"].version == 1
    assert refs["v1-release"].base_version is None
    assert refs["experiment"].type == "branch"
    assert refs["experiment"].base_version == 1
    # head is the BRANCH-LOCAL version counter (one branch commit so far)
    assert refs["experiment"].version == 1
    table.append_branch("experiment", spark.range(5, 6).select("id"))
    refs2 = {r.name: r for r in table.refs().collect()}
    assert refs2["experiment"].version == 2


def test_type_promotion_concurrent_appends(spark, table):
    """Type promotion composes with optimistic-retry rebasing: an INT
    writer and a LONG writer race; whichever order the commits
    linearize in, the final declared type is long and every value —
    including past-int-range ones — survives exactly."""
    table.append(
        spark.range(1).select("id", F.lit(0).cast("int").alias("v"))
    )
    errs = []

    def writer(frame):
        try:
            table.append(frame)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ints = spark.range(1, 4).select(
        "id", F.col("id").cast("int").alias("v")
    )
    longs = spark.range(4, 7).select(
        "id", (F.col("id") + F.lit(2**40)).alias("v")
    )
    threads = [
        threading.Thread(target=writer, args=(f,)) for f in (ints, longs)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    out = table.read()
    assert dict(out.dtypes)["v"] == "bigint"
    got = {r.id: r.v for r in out.collect()}
    assert got[6] == 6 + 2**40 and got[2] == 2
    assert len(got) == 7


def test_type_promotion_through_branch_publish(spark, table):
    """A branch that widened a column publishes back to main: the
    publish-time schema union promotes main's declared type instead of
    silently reverting the branch's evolution (same _merge_schema_json
    contract as add-column publish)."""
    table.append(
        spark.range(3).select("id", F.col("id").cast("int").alias("v"))
    )
    table.create_branch("widen")
    table.append_branch(
        "widen",
        spark.range(3, 5).select("id", (F.col("id") + F.lit(2**40)).alias("v")),
    )
    table.fast_forward("widen")
    out = table.read()
    assert dict(out.dtypes)["v"] == "bigint"
    vals = {r.id: r.v for r in out.collect()}
    assert vals[4] == 4 + 2**40 and vals[1] == 1


def test_integrity_checksums_detect_tampering(spark, table):
    """verify_integrity(): clean table verifies ok; a byte flipped in a
    live data file surfaces as corrupted (exactly that file); a file
    committed after the checksum pass reads unverified; a deleted file
    reads missing_file."""
    table.append(spark.range(100).select("id"))
    n = table.add_integrity_checksums()
    assert n > 0
    assert table.add_integrity_checksums() == 0  # idempotent
    rep = table.verify_integrity()
    assert not rep["corrupted"] and not rep["missing_file"]
    assert not rep["unverified"] and len(rep["ok"]) == n

    # tamper: flip one byte mid-file (size unchanged -> md5 must catch)
    victim = rep["ok"][0]
    with open(victim, "r+b") as f:
        f.seek(50)
        b = f.read(1)
        f.seek(50)
        f.write(bytes([b[0] ^ 0xFF]))
    rep2 = table.verify_integrity()
    assert rep2["corrupted"] == [victim]

    # a later append is unverified until the next checksum pass
    table.append(spark.range(100, 120).select("id"))
    rep3 = table.verify_integrity()
    assert rep3["unverified"] and victim in rep3["corrupted"]
    table.add_integrity_checksums()
    assert not table.verify_integrity()["unverified"]

    # missing file
    gone = [f for f in rep3["ok"]][0]
    import os as _o

    _o.remove(gone)
    assert gone in table.verify_integrity()["missing_file"]


def test_orphan_cleanup_reclaims_stale_sidecars(spark, table):
    """remove_orphan_files also reclaims bloom/checksum sidecars whose
    data file is no longer referenced by any manifest (after the grace
    period), and keeps sidecars of live files."""
    table.overwrite(spark.range(10).select("id"))
    table.add_integrity_checksums()
    live_before = set(table._read_manifest(table.current_version())["files"])
    table.overwrite(spark.range(10, 20).select("id"))  # orphans v1 files
    table.add_integrity_checksums()
    table.expire_snapshots(keep_last=1)
    import glob as _g
    import os as _o

    n_sidecars = len(_g.glob(_o.path.join(table._checksum_dir, "*.json")))
    removed = table.remove_orphan_files(older_than_seconds=0.0)
    assert any(p.startswith(table._checksum_dir) for p in removed)
    left = set(_g.glob(_o.path.join(table._checksum_dir, "*.json")))
    assert len(left) < n_sidecars
    # live files keep their sidecars -> integrity still fully verified
    rep = table.verify_integrity()
    assert not rep["unverified"] and not rep["corrupted"]
    assert not (live_before & set(rep["ok"]))  # old files truly gone


def test_scoped_small_file_compaction(spark, table):
    """rewrite_small_files(where=...) — OPTIMIZE ... WHERE: only small
    files overlapping the scope are packed; out-of-scope small files
    carry verbatim, and table contents are unchanged."""
    cust = load_table(spark, SF_SMOKE, "customer")
    lo = cust.filter(F.col("c_custkey") < 75)
    hi = cust.filter(F.col("c_custkey") >= 75)
    table.append(lo.repartition(4))  # 4 small files, keys < 75
    table.append(hi.repartition(4))  # 4 small files, keys >= 75
    before = set(table._read_manifest(table.current_version())["files"])
    pre_hash = _hash_df(table.read())
    res = table.rewrite_small_files(where={"c_custkey": (None, 74)})
    assert res is not None
    after = set(table._read_manifest(table.current_version())["files"])
    carried = before & after
    # the hi-range files all carried; at least the lo files were packed
    assert len(carried) >= 4  # hi-range files untouched
    assert len(before - after) >= 2  # some lo files rewritten
    assert _hash_df(table.read()) == pre_hash  # data-neutral
    # scope with no small files -> no-op, no snapshot
    v = table.current_version()
    assert table.rewrite_small_files(where={"c_custkey": (10**9, None)}) is None
    assert table.current_version() == v


def test_merge_broadcast_from_source_stats(spark, table):
    """VERDICT r5 #6: update-only merges (no unmatched-source inserts)
    reduce to a LEFT OUTER join, and when the source row count is known
    (free from prune_on's agg) a small source is broadcast EXPLICITLY —
    auto-broadcast is disabled here, so a BroadcastHashJoin in the plan
    can only come from the merge's own stats decision; the
    over-threshold source must fall back to a shuffle join, and the
    default upsert (full outer) must never try to broadcast (Spark
    refuses full-outer broadcast builds)."""
    src_tbl = load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_acctbal"
    )
    table.overwrite(src_tbl)

    captured = []
    orig = LakehouseTable._write_data_files

    def spy(self, df, *a, **kw):
        captured.append(df._jdf.queryExecution().executedPlan().toString())
        return orig(self, df, *a, **kw)

    LakehouseTable._write_data_files = spy
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        small = src_tbl.limit(10).select(
            "c_custkey", (F.col("c_acctbal") + 1).alias("nb")
        )
        table.merge_into(
            small,
            on=["c_custkey"],
            update_cols={"c_acctbal": F.col("s.nb")},
            insert_unmatched=False,
            prune_on="c_custkey",
        )
        # the lineage file->base map join is ALWAYS a broadcast —
        # assert on the MERGE key join specifically
        assert "BroadcastHashJoin [c_custkey" in captured[-1]
        captured.clear()
        table.merge_into(
            src_tbl.select(
                "c_custkey", (F.col("c_acctbal") + 2).alias("nb")
            ),
            on=["c_custkey"],
            update_cols={"c_acctbal": F.col("s.nb")},
            insert_unmatched=False,
            prune_on="c_custkey",
            broadcast_threshold_rows=5,  # source exceeds it
        )
        assert "BroadcastHashJoin [c_custkey" not in captured[-1]
        assert "SortMergeJoin [c_custkey" in captured[-1]
        captured.clear()
        # default upsert: full outer — our hint must NOT be applied
        table.merge_into(
            small.limit(3),
            on=["c_custkey"],
            update_cols={"c_acctbal": F.col("s.nb")},
            prune_on="c_custkey",
        )
        assert "BroadcastHashJoin [c_custkey" not in captured[-1]
        assert "FullOuter" in captured[-1]
    finally:
        LakehouseTable._write_data_files = orig
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)


def test_constraints_enforced_on_merge_update_replacewhere(spark, table):
    """ADVICE r5 (medium): CHECK constraints gate EVERY mutating write
    path, not just append/overwrite — an UPDATE expression, a MERGE
    update arm, or a replaceWhere insert that writes violating values
    must refuse before any commit."""
    table.overwrite(
        spark.range(0, 20).select(
            F.col("id").alias("k"), F.lit(10).alias("v")
        )
    )
    table.add_check_constraint("v_pos", "v >= 0")
    v0 = table.current_version()

    with pytest.raises(ValueError, match="v_pos"):
        table.update_where(F.col("k") == 3, {"v": F.lit(-5)})
    with pytest.raises(ValueError, match="v_pos"):
        table.merge_into(
            spark.createDataFrame([(4, -7)], "k long, nv long"),
            on=["k"],
            update_cols={"v": F.col("s.nv")},
        )
    with pytest.raises(ValueError, match="v_pos"):
        table.overwrite_where(
            spark.createDataFrame([(5, -1)], "k long, v long"),
            F.col("k") == 5,
        )
    with pytest.raises(ValueError, match="v_pos"):
        table.update_where_mor(
            F.col("k") == 6, keys=["k"], set_cols={"v": F.lit(-2)}
        )
    assert table.current_version() == v0  # nothing committed
    # compliant versions of the same mutations pass
    table.update_where(F.col("k") == 3, {"v": F.lit(5)})
    table.merge_into(
        spark.createDataFrame([(4, 7)], "k long, nv long"),
        on=["k"],
        update_cols={"v": F.col("s.nv")},
    )
    assert table.read().filter(F.col("v") < 0).count() == 0


def test_constraints_store_is_atomic_and_corruption_is_loud(
    spark, table
):
    """ADVICE r5: constraints.json is written via temp + os.replace (no
    torn-write window), and a corrupt store fails writes with a clear
    error instead of an opaque JSON stack or silent non-enforcement."""
    import os

    table.overwrite(
        spark.range(3).select(F.col("id").alias("k"))
    )
    table.add_check_constraint("k_pos", "k >= 0")
    # no stray temp files left behind
    leftovers = [
        p
        for p in os.listdir(table.path)
        if p.startswith("constraints.json.tmp")
    ]
    assert leftovers == []
    with open(table._constraints_path, "w") as f:
        f.write('{"k_pos": ')  # torn write
    with pytest.raises(ValueError, match="unparseable"):
        table.append(spark.range(1).select(F.col("id").alias("k")))


def test_sink_refuses_active_constraints(spark, table, tmp_path):
    """ADVICE r5 (medium): the streaming sink commits from task
    metadata and cannot evaluate SQL constraints — with constraints
    active it must refuse the commit loudly."""
    from apache_iceberg_exploration_spark.streaming.lakehouse_sink import (
        _commit_append,
    )

    table.overwrite(spark.range(3).select(F.col("id").alias("k")))
    table.add_check_constraint("k_pos", "k >= 0")
    with pytest.raises(ValueError, match="CHECK constraints"):
        _commit_append(table.path, [], {}, {"batch_id": 0})


def test_sink_commits_assign_row_lineage(spark, table, tmp_path):
    """Sink-committed snapshots carry row lineage too: streamed batches
    get first_row_ids from the same monotone counter, so a lineage read
    after a streaming write works without an intervening batch commit."""
    from apache_iceberg_exploration_spark.streaming.lakehouse_sink import (
        make_lakehouse_stream_sink,
    )

    table.overwrite(
        spark.range(0, 10)
        .select(F.col("id").alias("k"))
        .coalesce(1)
        .sortWithinPartitions("k")
    )
    src = str(tmp_path / "src")
    spark.range(100, 105).select(F.col("id").alias("k")).coalesce(
        1
    ).write.parquet(src)
    spark.dataSource.register(make_lakehouse_stream_sink())
    q = (
        spark.readStream.schema("k long")
        .parquet(src)
        .writeStream.format("lakehouse_sink")
        .option("path", table.path)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    from apache_iceberg_exploration_spark.streaming._wait import (
        await_or_raise,
    )

    await_or_raise(q, 120)
    rows = {
        r["k"]: r["_row_id"]
        for r in table.read(with_lineage=True).collect()
    }
    assert len(rows) == 15
    assert len(set(rows.values())) == 15  # all distinct
    assert all(rows[k] == k for k in range(10))  # batch ids unchanged
    assert all(rows[k] >= 10 for k in range(100, 105))  # fresh ids


def test_entries_and_all_files_metadata(spark, tmp_path):
    """entries() statuses (added/existing/deleted) and all_files()
    version ranges across an append → append → rollback sequence
    (VERDICT r6 #6)."""
    from apache_iceberg_exploration_spark.sources.lakehouse import (
        LakehouseTable,
    )

    t = LakehouseTable(spark, str(tmp_path / "t"))
    df = (
        spark.range(0, 10)
        .select(F.col("id").alias("k"), F.lit(1).alias("v"))
        .coalesce(1)
    )
    t.append(df)  # v1: one file
    t.append(df.filter(F.col("k") < 3))  # v2: +1 file
    t.rollback(1)  # v3: back to v1's file
    e2 = {(r["file_path"], r["status"]) for r in t.entries(2).collect()}
    assert sum(1 for _, s in e2 if s == "added") == 1
    assert sum(1 for _, s in e2 if s == "existing") == 1
    e3 = {r["status"] for r in t.entries(3).collect()}
    assert e3 == {"existing", "deleted"}  # rollback drops v2's file
    af = {r["file_path"]: r for r in t.all_files().collect()}
    assert len(af) == 2
    ranges = sorted(
        (r["first_version"], r["last_version"], r["in_current"])
        for r in af.values()
    )
    assert ranges == [(1, 3, True), (2, 2, False)]
    # history forensics: the rollback's effective ancestor is v1
    h = {r["version"]: r for r in t.history().collect()}
    assert h[3]["operation"] == "rollback"
    assert h[3]["restored_version"] == 1
    assert h[3]["effective_ancestor"] == 1
    assert h[2]["effective_ancestor"] == 1
    assert h[2]["restored_version"] is None


def test_changelog_row_level_broadcasts_small_side(spark, table):
    """VERDICT r6 #5: when the manifest __rows stats say one scoped side
    of the row-level changelog is small, the full-outer id join is
    decomposed into broadcast left-outer + broadcast anti — with
    auto-broadcast disabled, a BroadcastHashJoin in the plan can only
    come from this decision. Results must be identical to the
    full-outer form (threshold 0 disables it)."""
    from apache_iceberg_exploration_spark.sources.lakehouse import (
        LakehouseTable,
    )

    src = load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_acctbal"
    )
    table.append(src.coalesce(1).sortWithinPartitions("c_custkey"))
    table.update_where(
        F.col("c_custkey") < 5, {"c_acctbal": F.lit(0.0)}
    )
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        feed = table.changelog(1, 2, row_level=True)
        plan = feed._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin [_row_id" in plan
        got = sorted(
            (r["_change_type"], r["_row_id"]) for r in feed.collect()
        )
        # full-outer reference form via a monkeypatched threshold
        orig = LakehouseTable._changelog_row_level

        def no_bcast(self, *a, **kw):
            kw["broadcast_threshold_rows"] = 0
            return orig(self, *a, **kw)

        LakehouseTable._changelog_row_level = no_bcast
        try:
            ref = table.changelog(1, 2, row_level=True)
            ref_plan = ref._jdf.queryExecution().executedPlan().toString()
            assert "BroadcastHashJoin [_row_id" not in ref_plan
            ref_got = sorted(
                (r["_change_type"], r["_row_id"]) for r in ref.collect()
            )
        finally:
            LakehouseTable._changelog_row_level = orig
        assert got == ref_got
        assert {c for c, _ in got} == {
            "update_preimage",
            "update_postimage",
        }
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", old_thresh
        )

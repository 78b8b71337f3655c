"""``manifests()`` and ``position_deletes()`` metadata tables — the
last two rows of the Iceberg metadata-table matrix (snapshots, history,
entries, files, all_files, refs, partitions, statistics, geo_bounds all
exist already). Both are pure metadata surfaces: layout-dependent, so
they are pytest-pinned rather than DuckDB-oracled."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_iceberg_exploration_spark.sources.lakehouse import (
    LakehouseTable,
)


@pytest.fixture
def table(spark, tmp_path):
    return LakehouseTable(spark, str(tmp_path / "t"))


def _rows(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("g")
    )


def test_manifests_reflect_parts_and_consolidation(spark, table):
    for i in range(4):
        table.append(_rows(spark, i * 10, i * 10 + 10).coalesce(1))
    m = table.manifests()
    assert m.columns == [
        "path",
        "size_bytes",
        "n_data_files",
        "carried_keys",
    ]
    rows = m.collect()
    # one part per append (each carried forward untouched)
    assert len(rows) == 4
    assert sum(r["n_data_files"] for r in rows) == 4
    assert all(r["size_bytes"] > 0 for r in rows)
    assert all("stats" in r["carried_keys"] for r in rows)
    # consolidation visibly collapses the part list
    table.rewrite_manifest_parts()
    after = table.manifests().collect()
    assert len(after) == 1 and after[0]["n_data_files"] == 4
    # older snapshots still report their own (pre-consolidation) parts
    assert table.manifests(version=4).count() == 4


def test_position_deletes_lists_all_three_kinds(spark, table):
    table.append(_rows(spark, 0, 100).coalesce(1))
    table.delete_where_pos(F.col("k") == 7)
    table.delete_where_dv(
        F.col("k").isin(20, 21, 22), prune={"k": (0, 99)}
    )
    table.delete_where_mor(F.col("g") == 4, keys=["k"])
    pd_rows = table.position_deletes().collect()
    kinds = {r["kind"] for r in pd_rows}
    assert kinds == {"pos", "dv", "eq"}
    dv = [r for r in pd_rows if r["kind"] == "dv"]
    assert sum(r["dead_rows"] for r in dv) == 3
    pos = [r for r in pd_rows if r["kind"] == "pos"]
    assert sum(r["dead_rows"] for r in pos) == 1
    assert pos[0]["data_file"] and not pos[0]["data_file"].startswith(
        "file:"
    )
    eq = [r for r in pd_rows if r["kind"] == "eq"]
    assert eq[0]["dead_rows"] is None and eq[0]["source"]
    # read still nets out every pending delete the table reports
    assert table.read().count() == 100 - 1 - 3 - 20
    # a clean table reports an empty relation with the same schema
    table2 = LakehouseTable(spark, table.path + "2")
    table2.append(_rows(spark, 0, 5).coalesce(1))
    assert table2.position_deletes().count() == 0


def test_count_rows_is_metadata_only_until_equality_deletes(spark, table):
    table.append(_rows(spark, 0, 100).coalesce(1))
    table.append(_rows(spark, 100, 150).coalesce(1))
    assert table.count_rows() == 150
    table.delete_where_pos(F.col("k") % 13 == 0)
    table.delete_where_dv(F.col("k") % 17 == 0)
    want = table.read().count()
    assert table.count_rows() == want
    # time travel: pre-delete snapshots report their own totals
    assert table.count_rows(version=2) == 150
    # equality deletes have unknown mass -> exact fallback, same answer
    table.delete_where_mor(F.col("g") == 3, keys=["k"])
    assert table.count_rows() == table.read().count()


def test_write_sort_property_tightens_file_ranges(spark, table):
    """write.sort-by = range distribution + local sort on ingest: the
    four output files cover disjoint key quartiles, so a point-range
    scan opens one file; without the property the same hash-shuffled
    ingest leaves every file spanning the whole key space."""
    src = _rows(spark, 0, 4000).repartition(4, "k")
    other = LakehouseTable(spark, table.path + "_plain")
    other.append(src)
    assert len(other.scan({"k": (100, 140)}).inputFiles()) == 4
    table.set_property("write.sort-by", "k")
    table.append(src)
    hit = table.scan({"k": (100, 140)})
    assert len(hit.inputFiles()) == 1
    assert hit.count() == 41


def test_sql_snapshots_tvf(spark, table):
    from apache_iceberg_exploration_spark.sources.sql_tvf import (
        register_metadata_tvfs,
    )

    table.append(_rows(spark, 0, 10).coalesce(1))
    table.append(_rows(spark, 10, 30).coalesce(1))
    table.delete_where_dv(F.col("k") == 5)
    register_metadata_tvfs(spark)
    got = spark.sql(
        f"SELECT * FROM lakehouse_snapshots('{table.path}') ORDER BY version"
    ).collect()
    assert [(r["version"], r["operation"], r["n_files"]) for r in got] == [
        (1, "append", 1),
        (2, "append", 2),
        (3, "delete-dv", 2),
    ]
    assert all(r["committed_at"] > 0 for r in got)


def test_count_rows_after_pos_delete_then_cow_rewrite(spark, table):
    """Directed regression (ADVICE r8): CoW rewrite paths carry pos
    delete_files entries verbatim while removing their target data
    files, so the stale coordinates must NOT be subtracted twice.
    append 100 -> pos-delete 10 -> CoW delete 12 more: the CoW rewrite
    physically dropped the 10 pos-dead rows from its new files, so
    count_rows must match read().count() == 78."""
    table.append(_rows(spark, 0, 100).coalesce(1))
    table.delete_where_pos(F.col("k") % 10 == 3)  # 10 rows dead (MoR)
    assert table.count_rows() == 90
    table.delete_where(F.col("k") % 25 == 0)  # CoW: 4 more rows
    # 100 - 10 (pos) - 4 (CoW; k=3,13,..,93 already dead, disjoint
    # from k=0,25,50,75) = 86
    assert table.read().count() == 86
    assert table.count_rows() == table.read().count() == 86
    # the stale coordinates surface distinctly, never as pending mass
    kinds = {
        r["kind"]: r["dead_rows"]
        for r in table.position_deletes().collect()
    }
    assert "pos" not in kinds or kinds.get("pos", 0) == 0
    assert kinds.get("pos_stale", 0) == 10


def test_position_deletes_scopes_to_live_targets(spark, table):
    """update_where (CoW) after a pos delete: stale coordinates are
    flagged, live ones still counted."""
    table.append(_rows(spark, 0, 50).coalesce(1))
    table.append(_rows(spark, 50, 100).coalesce(1))
    # pos-delete rows in BOTH files
    table.delete_where_pos(F.col("k").isin(7, 57))
    # CoW-update only the first file's range: its coordinate goes stale
    table.update_where(
        F.col("k") == 20, {"g": F.lit(99)}, prune={"k": (0, 49)}
    )
    rows = table.position_deletes().collect()
    by_kind = {}
    for r in rows:
        by_kind.setdefault(r["kind"], 0)
        by_kind[r["kind"]] += r["dead_rows"]
    assert by_kind == {"pos": 1, "pos_stale": 1}
    assert table.count_rows() == table.read().count() == 98

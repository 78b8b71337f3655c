"""DSv2 batch-reader column pruning (r10): the projection path passes
only the needed physical columns to ``iter_batches`` — target fields
through their rename history, equality-delete keys, geo residual
columns, lineage columns. On PME files the skipped chunks are never
decrypted; on plaintext files their IO is skipped."""

from __future__ import annotations

import pyarrow as pa
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from apache_iceberg_exploration_spark.sources.lakehouse import (
    LakehouseTable,
)
from apache_iceberg_exploration_spark.streaming.lakehouse_source import (
    _needed_physical,
    make_lakehouse_batch_source,
)


def test_needed_physical_column_sets():
    names = ["a", "b", "c", "k", "geom",
             "__geo_geom_xmin", "__geo_geom_xmax",
             "__geo_geom_ymin", "__geo_geom_ymax",
             "__row_id", "__last_updated", "old_a"]
    target = pa.schema([("a", pa.int64()), ("b", pa.string())])
    # plain projection: only a, b
    assert _needed_physical(names, target, None, None, None) == ["a", "b"]
    # rename history pulls prior physical names
    assert _needed_physical(
        names, target, {"a": ["old_a"]}, None, None
    ) == ["a", "b", "old_a"]
    # equality keys + geo residual + lineage join the set
    got = _needed_physical(
        names,
        target,
        None,
        [(["f1"], ["k"])],
        {"geom": (0, 0, 1, 1)},
        lineage=True,
    )
    assert set(got) == {
        "a", "b", "k", "geom",
        "__geo_geom_xmin", "__geo_geom_xmax",
        "__geo_geom_ymin", "__geo_geom_ymax",
        "__row_id", "__last_updated",
    }
    # everything needed -> None (zero-overhead full read)
    full = pa.schema([(n, pa.int64()) for n in names])
    assert _needed_physical(names, full, None, None, None) is None


def test_narrow_schema_read_correct_with_mor_deletes(spark, tmp_path):
    """End to end: an explicit 2-of-5-column schema over a table with a
    PENDING equality delete — the pruned read must still apply the
    delete (its key column is fetched even though projected away)."""
    t = LakehouseTable(spark, str(tmp_path / "t"))
    t.append(
        spark.createDataFrame(
            [
                Row(k=i, a=i * 10, b=f"b{i}", c=float(i), d=i % 3)
                for i in range(40)
            ]
        ).repartition(2, "k")
    )
    t.delete_where_mor(F.col("k") % 7 == 0, keys=["k"])
    spark.dataSource.register(make_lakehouse_batch_source())
    got = (
        spark.read.format("lakehouse")
        .schema("a long, b string")
        .option("path", t.path)
        .load()
    )
    assert got.columns == ["a", "b"]
    want = sorted(
        (i * 10, f"b{i}") for i in range(40) if i % 7 != 0
    )
    assert sorted(map(tuple, got.collect())) == want


def test_narrow_schema_read_pme_encrypted(spark, tmp_path):
    """The same narrow read over a PME table — the pruned columns are
    also the only ones DECRYPTED (the PME byte-count test pins the IO
    fraction; this pins end-to-end correctness through the reader)."""
    KEY = bytes(range(16))
    t = LakehouseTable(spark, str(tmp_path / "t"), encryption_key=KEY)
    t.enable_encryption(KEY, mode="pme")
    t.append(
        spark.createDataFrame(
            [Row(k=i, a=i * 10, b=f"b{i}", c=float(i)) for i in range(30)]
        ).repartition(2, "k")
    )
    spark.dataSource.register(make_lakehouse_batch_source())
    got = (
        spark.read.format("lakehouse")
        .schema("k long, a long")
        .option("path", t.path)
        .option("encryptionKey", KEY.hex())
        .load()
    )
    assert sorted(map(tuple, got.collect())) == [
        (i, i * 10) for i in range(30)
    ]


def test_rg_keep_indexes_unit(tmp_path):
    import pyarrow.parquet as pq

    from apache_iceberg_exploration_spark.streaming.lakehouse_source import (
        _rg_keep_indexes,
        _tables_with_offsets,
    )

    tbl = pa.table({"k": list(range(300)), "v": [i * 2 for i in range(300)]})
    p = str(tmp_path / "f.parquet")
    pq.write_table(tbl, p, row_group_size=50)  # 6 row groups
    pf = pq.ParquetFile(p)
    assert pf.metadata.num_row_groups == 6
    # bounds hitting only groups 5 (k in [250, 299])
    assert _rg_keep_indexes(pf, {"k": [250, 299]}) == [5]
    # open-ended bound
    assert _rg_keep_indexes(pf, {"k": [None, 49]}) == [0]
    # nothing prunable -> None (covers-everything bounds / unknown col)
    assert _rg_keep_indexes(pf, {"k": [0, 299]}) is None
    assert _rg_keep_indexes(pf, {"nope": [0, 1]}) is None
    assert _rg_keep_indexes(pf, {}) is None
    # offsets are ORIGINAL file positions, not post-prune positions
    out = list(_tables_with_offsets(pf, ["k"], {"k": [120, 170]}))
    assert [(t.num_rows, off) for t, off in out] == [(50, 100), (50, 150)]
    assert out[0][0].column("k").to_pylist()[0] == 100


def test_rowgroup_pruned_read_with_dv_positions(spark, tmp_path):
    """End to end: a multi-row-group file with a DV delete in a LATE
    row group, read through a pushed range that prunes the early
    groups — the DV mask must still address original positions."""
    import pyarrow.parquet as pq

    t = LakehouseTable(spark, str(tmp_path / "t"))
    t.append(
        spark.createDataFrame(
            [Row(k=i, v=i * 2) for i in range(300)]
        ).coalesce(1)
    )
    f = t._read_manifest(1)["files"][0]
    # re-chunk the SAME rows into 6 row groups (values identical, so
    # the manifest stats stay truthful); refresh Spark's cached file
    # status (the length changed under the same path)
    pq.write_table(pq.read_table(f), f, row_group_size=50)
    import os as _os

    crc = _os.path.join(
        _os.path.dirname(f), "." + _os.path.basename(f) + ".crc"
    )
    if _os.path.exists(crc):
        _os.unlink(crc)  # hadoop local-FS checksum of the OLD bytes
    spark.catalog.refreshByPath(f)
    t.delete_where_dv(F.col("k") == 290)  # position 290: last group
    spark.dataSource.register(make_lakehouse_batch_source())
    got = (
        spark.read.format("lakehouse")
        .option("path", t.path)
        .load()
        .filter(F.col("k").between(250, 299))
    )
    assert sorted(r["k"] for r in got.collect()) == [
        i for i in range(250, 300) if i != 290
    ]
    # unfiltered read still exact
    full = (
        spark.read.format("lakehouse").option("path", t.path).load()
    )
    assert full.count() == 299


def test_rowgroup_pruned_lineage_ids_are_original_positions(
    spark, tmp_path
):
    """withLineage + pushed range over a multi-row-group file: _row_id
    derives from the ORIGINAL position even when earlier groups are
    skipped."""
    import pyarrow.parquet as pq

    t = LakehouseTable(spark, str(tmp_path / "t"))
    t.append(
        spark.createDataFrame(
            [Row(k=i, v=i * 2) for i in range(300)]
        ).coalesce(1)
    )
    f = t._read_manifest(1)["files"][0]
    pq.write_table(pq.read_table(f), f, row_group_size=50)
    import os as _os

    crc = _os.path.join(
        _os.path.dirname(f), "." + _os.path.basename(f) + ".crc"
    )
    if _os.path.exists(crc):
        _os.unlink(crc)  # hadoop local-FS checksum of the OLD bytes
    spark.catalog.refreshByPath(f)
    want = {
        r["k"]: r["_row_id"]
        for r in t.read(with_lineage=True).collect()
        if 250 <= r["k"] < 300
    }
    spark.dataSource.register(make_lakehouse_batch_source())
    got = {
        r["k"]: r["_row_id"]
        for r in spark.read.format("lakehouse")
        .option("path", t.path)
        .option("withLineage", "true")
        .load()
        .filter(F.col("k").between(250, 299))
        .collect()
    }
    assert got == want

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

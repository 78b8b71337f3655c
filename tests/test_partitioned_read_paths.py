"""Regression suite for the r11 partition-column bug class: engine
``partition_by`` writes omit the partition column from data files (the
hive path carries it), and every Arrow-side reader must recover it —
the DSv2 batch reader (plain + lineage), the distributed streaming
reader, and the streaming CDC feed all silently read the column as
NULL before the fix."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from apache_iceberg_exploration_spark.sources.lakehouse import (
    LakehouseTable,
)


@pytest.fixture()
def ptable(spark, tmp_path):
    t = LakehouseTable(spark, str(tmp_path / "t"))
    rows = [
        Row(k=i, g=i % 3, tag="a b" if i % 2 else "x/y", v=i * 10)
        for i in range(12)
    ]
    t.append(
        spark.createDataFrame(rows).coalesce(1),
        partition_by=["g", "tag"],
    )
    want = sorted((r.k, r.g, r.tag, r.v) for r in rows)
    return t, want


def test_dsv2_batch_reader_recovers_partition_columns(spark, ptable):
    from apache_iceberg_exploration_spark.streaming.lakehouse_source import (
        make_lakehouse_batch_source,
    )

    t, want = ptable
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(make_lakehouse_batch_source())
    df = spark.read.format("lakehouse").option("path", t.path).load()
    got = sorted(
        (r["k"], r["g"], r["tag"], r["v"]) for r in df.collect()
    )
    assert got == want  # URL-quoted 'a b' / 'x/y' values round-trip
    # lineage read too (separate projection path)
    df2 = (
        spark.read.format("lakehouse")
        .option("path", t.path)
        .option("withLineage", "true")
        .load()
    )
    got2 = sorted(
        (r["k"], r["g"], r["tag"], r["v"]) for r in df2.collect()
    )
    assert got2 == want
    assert df2.select("_row_id").distinct().count() == 12


def test_dist_stream_reader_recovers_partition_columns(
    spark, ptable, tmp_path
):
    from apache_iceberg_exploration_spark.streaming._wait import (
        await_or_raise,
    )
    from apache_iceberg_exploration_spark.streaming.lakehouse_source import (
        make_lakehouse_stream_dist_source,
    )

    t, want = ptable
    spark.dataSource.register(make_lakehouse_stream_dist_source())
    q = (
        spark.readStream.format("lakehouse_stream_dist")
        .option("path", t.path)
        .load()
        .writeStream.format("memory")
        .queryName("pread")
        .option(
            "checkpointLocation", str(tmp_path / "cp")
        )
        .trigger(availableNow=True)
        .start()
    )
    await_or_raise(q, 300)
    got = sorted(
        (r["k"], r["g"], r["tag"], r["v"])
        for r in spark.sql("SELECT * FROM pread").collect()
    )
    assert got == want


def test_streaming_cdc_recovers_partition_columns(spark, ptable):
    from apache_iceberg_exploration_spark.streaming.lakehouse_source import (
        _cdc_rows,
    )

    t, want = ptable
    rows = _cdc_rows(t.path, 0, 1, ["k", "g", "tag", "v"])
    got = sorted((r[0], r[1], r[2], r[3]) for r in rows)
    assert got == want
    # rows are (cols..., _change_type, _commit_version, _commit_ts)
    assert all(r[-3] == "insert" for r in rows)


def test_null_partition_value_reads_null(spark, tmp_path):
    from apache_iceberg_exploration_spark.streaming.lakehouse_source import (
        make_lakehouse_batch_source,
    )

    t = LakehouseTable(spark, str(tmp_path / "t"))
    t.append(
        spark.createDataFrame(
            [Row(k=0, g=None, v=1), Row(k=1, g=5, v=2)],
            "k long, g long, v long",
        ).coalesce(1),
        partition_by=["g"],
    )
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(make_lakehouse_batch_source())
    df = spark.read.format("lakehouse").option("path", t.path).load()
    got = {r["k"]: r["g"] for r in df.collect()}
    assert got == {0: None, 1: 5}  # __HIVE_DEFAULT_PARTITION__ → NULL

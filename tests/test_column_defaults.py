"""Iceberg v3 DEFAULT column values (VERDICT r7 task #1).

``add_column(name, type, default=...)`` records the v3 field attributes
(``initial-default`` — what files written before the add read back,
immutable; ``write-default`` — what writes that omit the column
materialize, evolvable via set_column_default / drop_column_default).

Reference parity note: the reference pins iceberg-spark-runtime 1.4/1.5
(docker/Dockerfile:14,23), predating v3 defaults; this implements the
spec semantics on the from-scratch manifest layer, as row lineage (r6)
and deletion vectors (r7) were.

The per-file contract under name-based resolution: a file LACKING the
column predates the add (reads initial-default); every post-add write
path materializes the column physically (write-default, or explicit
NULL after drop_column_default), so NULL-vs-default is never ambiguous.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_iceberg_exploration_spark.sources.lakehouse import (
    LakehouseTable,
)
from apache_iceberg_exploration_spark.streaming._wait import (
    await_or_raise,
)


@pytest.fixture
def table(spark, tmp_path):
    return LakehouseTable(spark, str(tmp_path / "tbl"))


def _base(spark, lo=0, hi=10):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )


def _evolved(spark, table):
    """The canonical evolution: v1 pre-add rows, add with default,
    explicit rows, omitted rows (write-default), dropped default
    (explicit NULL), new default. Returns expected {k: tier}."""
    df = _base(spark)
    table.append(df)  # v1: column doesn't exist yet
    table.add_column("tier", "string", default="legacy")  # v2
    table.append(
        df.withColumn("k", F.col("k") + 10).withColumn(
            "tier", F.lit("new")
        )
    )  # v3 explicit values
    table.append(df.withColumn("k", F.col("k") + 20))  # v4 write-default
    table.drop_column_default("tier")  # v5
    table.append(df.withColumn("k", F.col("k") + 30))  # v6 explicit NULL
    table.set_column_default("tier", "bulk")  # v7
    table.append(df.withColumn("k", F.col("k") + 40))  # v8 new default
    exp = {}
    for k in range(10):
        exp[k] = "legacy"  # initial-default (pre-add file)
        exp[k + 10] = "new"
        exp[k + 20] = "legacy"  # write-default at v4
        exp[k + 30] = None  # default dropped: materialized NULL
        exp[k + 40] = "bulk"  # evolved write-default
    return exp


def test_initial_and_write_default_lifecycle(spark, table):
    exp = _evolved(spark, table)
    got = {r["k"]: r["tier"] for r in table.read().collect()}
    assert got == exp
    assert table.column_defaults() == {
        "tier": {"initial_default": "legacy", "write_default": "bulk"}
    }


def test_compaction_materializes_defaults(spark, table):
    exp = _evolved(spark, table)
    table.rewrite_small_files()
    got = {r["k"]: r["tier"] for r in table.read().collect()}
    assert got == exp
    # changelog across the materializing rewrite nets to ZERO: the
    # old files' default-filled rows equal the rewritten physical rows
    assert table.changelog(8).count() == 0


def test_time_travel_respects_defaults(spark, table):
    _evolved(spark, table)
    # at v1 the column didn't exist at all
    assert "tier" not in table.read(version=1).columns
    # at v2 (right after the add) every file predates it: all default
    vals = {r["tier"] for r in table.read(version=2).collect()}
    assert vals == {"legacy"}


def test_cow_update_preserves_defaults(spark, table):
    exp = _evolved(spark, table)
    table.update_where(F.col("k") == 3, {"v": F.lit(999)})
    exp_v = {r_k: r_k * 2 for r_k in range(10)}
    got = {r["k"]: (r["tier"], r["v"]) for r in table.read().collect()}
    assert got[3] == ("legacy", 999)
    assert {k: t for k, (t, _) in got.items()} == exp
    del exp_v


def test_defaults_survive_rename(spark, table):
    df = _base(spark)
    table.append(df)
    table.add_column("tier", "string", default="legacy")
    table.append(df.withColumn("k", F.col("k") + 10))
    table.rename_column("tier", "segment")
    got = {r["k"]: r["segment"] for r in table.read().collect()}
    assert set(got.values()) == {"legacy"}
    assert table.column_defaults()["segment"] == {
        "initial_default": "legacy",
        "write_default": "legacy",
    }


def test_typed_defaults(spark, table):
    df = _base(spark)
    table.append(df)
    table.add_column("score", "double", default=0.5)
    table.add_column("since", "date", default="2020-01-01")
    table.add_column("n", "long", default=7)
    table.append(df.withColumn("k", F.col("k") + 10))
    import datetime

    r = {row["k"]: row for row in table.read().collect()}
    for k in (0, 10):  # pre-add file AND write-default materialization
        assert r[k]["score"] == 0.5
        assert r[k]["since"] == datetime.date(2020, 1, 1)
        assert r[k]["n"] == 7


def test_default_literal_validation(spark, table):
    table.append(_base(spark))
    with pytest.raises(ValueError, match="unsupported default value"):
        table.add_column("xs", "array<int>", default=[1, 2])
    table.add_column("t", "string", default="a")
    with pytest.raises(ValueError, match="unsupported default value"):
        table.set_column_default("t", {"no": "dicts"})


def test_dsv2_reader_defaults(spark, table):
    from apache_iceberg_exploration_spark.streaming.lakehouse_source import (
        make_lakehouse_batch_source,
    )

    exp = _evolved(spark, table)
    spark.dataSource.register(make_lakehouse_batch_source())
    df = (
        spark.read.format("lakehouse")
        .option("path", table.path)
        .load()
    )
    assert "tier" in df.columns  # declared schema beats the anchor file
    got = {r["k"]: r["tier"] for r in df.collect()}
    assert got == exp
    # pinned at v2: every file predates the add — all defaults
    d2 = (
        spark.read.format("lakehouse")
        .option("path", table.path)
        .option("versionAsOf", "2")
        .load()
    )
    assert {r["tier"] for r in d2.collect()} == {"legacy"}


def test_streaming_replay_defaults(spark, table):
    from apache_iceberg_exploration_spark.streaming.lakehouse_source import (
        make_lakehouse_stream_dist_source,
        make_lakehouse_stream_source,
    )

    exp = _evolved(spark, table)
    spark.dataSource.register(make_lakehouse_stream_source())
    spark.dataSource.register(make_lakehouse_stream_dist_source())
    for fmt, name in [
        ("lakehouse_stream", "defaults_m1"),
        ("lakehouse_stream_dist", "defaults_m2"),
    ]:
        q = (
            spark.readStream.format(fmt)
            .option("path", table.path)
            .load()
            .writeStream.format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q, 120)
        got = {
            r["k"]: r["tier"]
            for r in spark.sql(f"select * from {name}").collect()
        }
        assert got == exp, fmt


def test_cdc_defaults_and_net_zero_compaction(spark, table):
    from apache_iceberg_exploration_spark.streaming.lakehouse_source import (
        make_lakehouse_stream_dist_source,
        make_lakehouse_stream_source,
    )

    exp = _evolved(spark, table)
    spark.dataSource.register(make_lakehouse_stream_source())
    spark.dataSource.register(make_lakehouse_stream_dist_source())
    q = (
        spark.readStream.format("lakehouse_stream")
        .option("path", table.path)
        .option("readChangeFeed", "true")
        .load()
        .writeStream.format("memory")
        .queryName("defaults_cdc")
        .trigger(availableNow=True)
        .start()
    )
    await_or_raise(q, 120)
    ins = {
        r["k"]: r["tier"]
        for r in spark.sql(
            "select * from defaults_cdc where _change_type='insert'"
        ).collect()
    }
    assert ins == exp
    # a compaction that materializes the defaults must net to zero on
    # BOTH CDC readers (the per-file default fill makes removed-side
    # rows equal the rewritten added-side rows)
    v = table.current_version()
    table.rewrite_small_files()
    for fmt, name in [
        ("lakehouse_stream", "defaults_cdc2"),
        ("lakehouse_stream_dist", "defaults_cdc3"),
    ]:
        q2 = (
            spark.readStream.format(fmt)
            .option("path", table.path)
            .option("readChangeFeed", "true")
            .option("startingVersion", str(v))
            .load()
            .writeStream.format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q2, 120)
        n = spark.sql(f"select count(*) c from {name}").collect()[0]["c"]
        assert n == 0, f"{fmt}: materializing compaction emitted {n}"


def test_sink_refuses_omitted_defaulted_column(spark, table):
    from apache_iceberg_exploration_spark.streaming.lakehouse_sink import (
        _commit_append,
        _write_one_file,
    )

    df = _base(spark)
    table.append(df)
    table.add_column("tier", "string", default="legacy")
    # a task file that omits the defaulted column, committed via the
    # sink/batch-writer protocol, must be refused (the files are already
    # on disk — write-defaults can't be materialized post-hoc)
    path, stats = _write_one_file(
        [{"k": 99, "v": 0}], table.path + "/data"
    )
    with pytest.raises(ValueError, match="omits defaulted columns"):
        _commit_append(table.path, [path], {path: stats}, {})


def test_merge_into_defaulted_table(spark, table):
    """MERGE reads via the projection (defaults filled), so matched
    updates keep the default and the rewritten files materialize it."""
    df = _base(spark)
    table.append(df)
    table.add_column("tier", "string", default="legacy")
    src = spark.createDataFrame(
        [(3, 333), (99, 990)], "k long, v long"
    )
    table.merge_into(
        src.withColumn("tier", F.lit("merged")),
        on=["k"],
        update_cols={
            "v": F.col("s.v"),
            "tier": F.col("s.tier"),
        },
    )
    got = {r["k"]: (r["v"], r["tier"]) for r in table.read().collect()}
    assert got[3] == (333, "merged")
    assert got[99] == (990, "merged")
    assert got[0] == (0, "legacy")  # untouched pre-add row

"""``CREATE TABLE ... USING lakehouse`` SQL surface (VERDICT r7 #2).

Spark 4.1 instantiates a Python DataSource for reader()/writer() in a
separate worker process with EMPTY options; only schema() (called once
at CREATE) receives them. The format therefore embeds the table options
into the catalog-persisted schema (field metadata bundle
``__lakehouse_options``) and reader()/writer() fall back to it — making
the table usable through plain SQL: CREATE / SELECT / INSERT INTO /
INSERT OVERWRITE.
"""

from __future__ import annotations

import json
import os
import uuid

import pytest
from pyspark.sql import functions as F

from apache_iceberg_exploration_spark.sources.lakehouse import (
    LakehouseTable,
)


@pytest.fixture
def sql_table(spark, tmp_path):
    """(table, sql_name): a seeded lakehouse table registered as a SQL
    table with a unique name; dropped on teardown."""
    from apache_iceberg_exploration_spark.streaming.lakehouse_source import (
        make_lakehouse_batch_source,
    )

    tbl = LakehouseTable(spark, str(tmp_path / "tbl"))
    tbl.append(
        spark.range(0, 5).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        )
    )
    spark.dataSource.register(make_lakehouse_batch_source())
    name = f"sqlt_{uuid.uuid4().hex[:8]}"
    spark.sql(
        f"CREATE TABLE {name} USING lakehouse OPTIONS (path '{tbl.path}')"
    )
    yield tbl, name
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_sql_select(spark, sql_table):
    _, name = sql_table
    rows = spark.sql(f"SELECT * FROM {name} ORDER BY k").collect()
    assert [(r["k"], r["v"]) for r in rows] == [
        (i, i * 10) for i in range(5)
    ]


def test_sql_insert_and_overwrite(spark, sql_table):
    tbl, name = sql_table
    spark.sql(f"INSERT INTO {name} VALUES (100, 1000), (101, 1010)")
    got = spark.sql(
        f"SELECT count(*) c, max(k) mk FROM {name}"
    ).collect()[0]
    assert (got["c"], got["mk"]) == (7, 101)
    # the direct path-based reader sees the same committed state
    assert tbl.read().count() == 7
    spark.sql(f"INSERT OVERWRITE {name} VALUES (7, 70)")
    assert [
        (r["k"], r["v"])
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    ] == [(7, 70)]
    assert tbl.read().count() == 1


def test_sql_filter_pushdown_still_applies(spark, sql_table):
    tbl, name = sql_table
    # add a second file so pruning has something to skip
    spark.sql(f"INSERT INTO {name} VALUES (100, 1000)")
    rows = spark.sql(f"SELECT v FROM {name} WHERE k = 100").collect()
    assert [r["v"] for r in rows] == [1000]


def test_sql_options_not_persisted_into_table_schema(spark, sql_table):
    """The smuggled option bundle lives only in the CATALOG schema —
    an INSERT must not leak it into the lakehouse table's own declared
    schema (it would travel into every later snapshot)."""
    tbl, name = sql_table
    spark.sql(f"INSERT INTO {name} VALUES (100, 1000)")
    m = tbl._read_manifest(tbl.current_version())
    assert "__lakehouse_options" not in (m.get("schema") or "")


def test_sql_table_pinned_to_catalog_schema_after_evolution(
    spark, sql_table
):
    """DSv2 semantics: the catalog schema is fixed at CREATE — a column
    added later is invisible to the SQL table (re-create to pick it
    up), but reads still work and path-based reads see the new column."""
    tbl, name = sql_table
    tbl.add_column("tier", "string", default="legacy")
    tbl.append(
        spark.range(50, 52).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        )
    )
    rows = spark.sql(f"SELECT * FROM {name} ORDER BY k").collect()
    assert "tier" not in rows[0].asDict()
    assert len(rows) == 7
    assert "tier" in tbl.read().columns


def test_pathless_read_without_catalog_bundle_raises(spark, tmp_path):
    from apache_iceberg_exploration_spark.streaming.lakehouse_source import (
        make_lakehouse_batch_source,
    )

    src_cls = make_lakehouse_batch_source()
    inst = src_cls(options={})
    from pyspark.sql.types import StructType

    with pytest.raises(ValueError, match="no 'path' option"):
        inst.reader(StructType([]))


def test_sql_table_pinned_version(spark, tmp_path):
    """CREATE TABLE ... OPTIONS (path, versionAsOf): the carried option
    bundle pins the SQL table to a snapshot — a reproducibility handle
    (name a training run's exact table state in the catalog)."""
    import uuid as _uuid

    from apache_iceberg_exploration_spark.streaming.lakehouse_source import (
        make_lakehouse_batch_source,
    )

    tbl = LakehouseTable(spark, str(tmp_path / "tbl"))
    tbl.append(
        spark.range(0, 5).select(F.col("id").alias("k")).coalesce(1)
    )
    tbl.append(
        spark.range(5, 9).select(F.col("id").alias("k")).coalesce(1)
    )
    spark.dataSource.register(make_lakehouse_batch_source())
    name = f"sqlt_{_uuid.uuid4().hex[:8]}"
    spark.sql(
        f"CREATE TABLE {name} USING lakehouse"
        f" OPTIONS (path '{tbl.path}', versionAsOf '1')"
    )
    try:
        assert spark.sql(f"SELECT count(*) c FROM {name}").collect()[0][
            "c"
        ] == 5
        assert tbl.read().count() == 9  # the live table moved on
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")

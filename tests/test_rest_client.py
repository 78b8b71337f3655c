"""REST-catalog CLIENT data source (late r11): a session that only
knows the catalog URL + storage paths reads tables through
``format("lakehouse_rest")`` — schema from LoadTableResult, pushdown
through the server's /plan endpoint, per-file Arrow tasks, loud
refusals for encrypted / MoR-pending tables."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from apache_iceberg_exploration_spark.sources.catalog import (
    LakehouseCatalog,
)
from apache_iceberg_exploration_spark.sources.rest_catalog import (
    RestCatalogServer,
)
from apache_iceberg_exploration_spark.sources.rest_client import (
    make_lakehouse_rest_source,
)


@pytest.fixture()
def served(spark, tmp_path):
    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("s")
    t = cat.table("s.facts")
    t.append(
        spark.range(0, 200)
        .selectExpr("id AS k", "id % 3 AS g", "id * 2 AS v")
        .repartitionByRange(4, "k")
    )
    spark.dataSource.register(make_lakehouse_rest_source())
    srv = RestCatalogServer(cat.warehouse)
    yield cat, srv
    srv.close()


def _rest_df(spark, srv, table, **opts):
    r = (
        spark.read.format("lakehouse_rest")
        .option("restUrl", srv.url)
        .option("table", table)
    )
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_reads_match_engine_and_pushdown_prunes(spark, served):
    cat, srv = served
    df = _rest_df(spark, srv, "s.facts")
    want = sorted(
        map(tuple, cat.table("s.facts").read().select("k", "g", "v").collect())
    )
    got = sorted(map(tuple, df.select("k", "g", "v").collect()))
    assert got == want and len(got) == 200
    # pushdown: reader-level introspection (the dist-reader pattern)
    from apache_iceberg_exploration_spark.sources import rest_client as RC

    cls = make_lakehouse_rest_source()
    ds = cls(options={"resturl": srv.url, "table": "s.facts"})
    schema = ds.schema()
    reader = ds.reader(schema)
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThan

    reader.pushFilters(
        [GreaterThanOrEqual(("k",), 150), LessThan(("k",), 180)]
    )
    parts = reader.partitions()
    assert reader.planned_files is not None
    assert 0 < len(reader.planned_files) < 4  # server-side pruning
    # and the filtered READ through Spark is exact
    assert df.where("k >= 150 AND k < 180").count() == 30


def test_partitioned_table_and_snapshot_time_travel(spark, served):
    cat, srv = served
    t = cat.table("s.pfacts")
    t.append(
        spark.createDataFrame(
            [Row(k=i, g=i % 2, v=i) for i in range(10)]
        ).coalesce(1),
        partition_by=["g"],
    )
    t.append(
        spark.createDataFrame([Row(k=100, g=0, v=100)]).coalesce(1),
        partition_by=["g"],
    )
    df = _rest_df(spark, srv, "s.pfacts")
    got = sorted((r["k"], r["g"]) for r in df.collect())
    assert got == sorted(
        [(i, i % 2) for i in range(10)] + [(100, 0)]
    )  # hive partition values recovered
    df1 = _rest_df(spark, srv, "s.pfacts", snapshotId="1")
    assert df1.count() == 10


def test_default_fill_for_pre_add_column_files(spark, served):
    cat, srv = served
    t = cat.table("s.facts")
    t.add_column("src", "string", default="legacy")
    t.append(
        spark.createDataFrame(
            [Row(k=1000, g=0, v=0, src="fresh")]
        ).coalesce(1)
    )
    df = _rest_df(spark, srv, "s.facts")
    got = df.groupBy("src").count().collect()
    by = {r["src"]: r["count"] for r in got}
    assert by == {"legacy": 200, "fresh": 1}


def test_refusals_are_loud(spark, served, tmp_path):
    from apache_iceberg_exploration_spark.sources.lakehouse import (
        LakehouseTable,
    )
    from tests.test_encryption import KEY

    cat, srv = served
    # pending MoR delete → refuse
    t = cat.table("s.mor")
    t.append(
        spark.createDataFrame([Row(k=i, v=i) for i in range(6)]).coalesce(1)
    )
    t.delete_where_mor(F.col("k") == 0, keys=["k"])
    with pytest.raises(Exception, match="PENDING MoR"):
        _rest_df(spark, srv, "s.mor").collect()
    # encrypted → refuse
    e = LakehouseTable(
        spark, str(tmp_path / "wh" / "s" / "enc"), encryption_key=KEY
    )
    e.enable_encryption(KEY)
    e.append(
        spark.createDataFrame([Row(k=1, v=1)]).coalesce(1)
    )
    with pytest.raises(Exception, match="ENCRYPTED"):
        _rest_df(spark, srv, "s.enc").collect()
    # missing options → loud
    with pytest.raises(Exception, match="requires options"):
        spark.read.format("lakehouse_rest").option(
            "restUrl", srv.url
        ).load().collect()

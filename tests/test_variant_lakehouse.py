"""VARIANT columns in lakehouse tables (VERDICT r7 #6): the declared
schema keeps Spark 4's VARIANT type, the physical files store the
canonical JSON text (pyarrow cannot read parquet's native variant
Thrift LogicalType, and every metadata layer here is pyarrow-footed),
and reads parse it back. ``variant_shred`` materializes typed
``__shred_<col>_<field>`` stat columns so scans prune on fields INSIDE
the variant.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_iceberg_exploration_spark.sources.lakehouse import (
    LakehouseTable,
)


@pytest.fixture
def table(spark, tmp_path):
    return LakehouseTable(spark, str(tmp_path / "tbl"))


def _vdf(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        F.parse_json(
            F.concat(
                F.lit('{"level":'),
                (F.col("id") % 10).cast("string"),
                F.lit(',"tag":"x'),
                (F.col("id") % 3).cast("string"),
                F.lit('"}'),
            )
        ).alias("props"),
    )


SHRED = {"props": {"level": ("$.level", "int")}}


def _seeded(spark, table):
    table.append(
        _vdf(spark, 0, 50).coalesce(1).sortWithinPartitions("k"),
        variant_shred=SHRED,
    )
    table.append(
        _vdf(spark, 50, 100).coalesce(1).sortWithinPartitions("k"),
        variant_shred=SHRED,
    )


def test_variant_roundtrip(spark, table):
    from pyspark.sql import types as T

    _seeded(spark, table)
    back = table.read()
    assert isinstance(back.schema["props"].dataType, T.VariantType)
    got = back.select(
        "k", F.expr("variant_get(props, '$.level', 'int')").alias("lv")
    ).collect()
    assert len(got) == 100
    assert all(r["lv"] == r["k"] % 10 for r in got)
    # shredded physical columns never surface
    assert not [c for c in back.columns if c.startswith("__shred")]


def test_variant_files_readable_by_pyarrow(spark, table):
    """The reason for the JSON encoding: the whole metadata layer is
    pyarrow-footed, and parquet-native variant is not pyarrow-readable."""
    import pyarrow.parquet as pq

    _seeded(spark, table)
    m = table._read_manifest(table.current_version())
    for f in m["files"]:
        sch = pq.ParquetFile(f).schema_arrow  # must not raise
        assert "props" in sch.names and "__shred_props_level" in sch.names


def test_shredded_stats_prune_files(spark, table):
    _seeded(spark, table)
    sc = table.scan({"__shred_props_level": (12, 15)})
    assert sc.inputFiles() == []  # no file holds level in 12..15
    sc2 = table.scan({"__shred_props_level": (0, 9)})
    assert len(sc2.inputFiles()) == 2


def test_variant_survives_cow_and_compaction(spark, table):
    _seeded(spark, table)
    table.update_where(
        F.col("k") == 3, {"k": F.lit(1003)}, prune={"k": (0, 49)}
    )
    table.rewrite_small_files()
    got = {
        r["k"]: r["lv"]
        for r in table.read()
        .select(
            "k",
            F.expr("variant_get(props, '$.level', 'int')").alias("lv"),
        )
        .collect()
    }
    assert got[1003] == 3 and len(got) == 100


def test_changelog_over_variant_emits_json_text(spark, table):
    """Set ops are forbidden on VARIANT — the changelog diffs and emits
    the canonical JSON text (matching the streaming CDC feed, which
    reads the physical encoding). A compaction still nets to zero."""
    _seeded(spark, table)
    v = table.current_version()
    table.append(_vdf(spark, 100, 105).coalesce(1))
    ch = table.changelog(v).collect()
    assert len(ch) == 5
    assert ch[0]["props"].startswith("{")  # JSON text, not VariantVal
    table.rewrite_small_files()
    assert table.changelog(v + 1).count() == 0
    assert table.changelog(v, row_level=True).count() == 5


def test_dsv2_serves_json_text(spark, table):
    from apache_iceberg_exploration_spark.streaming.lakehouse_source import (
        make_lakehouse_batch_source,
    )

    _seeded(spark, table)
    spark.dataSource.register(make_lakehouse_batch_source())
    d = (
        spark.read.format("lakehouse")
        .option("path", table.path)
        .load()
    )
    assert d.schema["props"].dataType.typeName() == "string"
    r = d.filter(F.col("k") == 7).select(
        F.get_json_object("props", "$.tag").alias("t")
    ).collect()
    assert r == [type(r[0])(t="x1")]

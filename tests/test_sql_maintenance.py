"""SQL maintenance-procedure surface (r9, VERDICT r8 #6): Iceberg's
``CALL system.<proc>`` as a pure-SQL TVF — ``lakehouse_call(path,
proc, args_json)`` — plus the driver-side ``call_procedure`` covering
the Spark-launching verbs. A full retention cycle (metadata-part
consolidation → snapshot expiry → orphan GC) runs through spark.sql
ONLY, with reports read back through the metadata TVFs."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from apache_iceberg_exploration_spark.sources.lakehouse import (
    LakehouseTable,
)
from apache_iceberg_exploration_spark.sources.sql_tvf import (
    call_procedure,
    register_metadata_tvfs,
)


def _seed(spark, path, n_appends=4, rows_each=10):
    t = LakehouseTable(spark, path)
    for i in range(n_appends):
        t.append(
            spark.createDataFrame(
                [
                    Row(k=j, v=j * 10)
                    for j in range(i * rows_each, (i + 1) * rows_each)
                ]
            ).coalesce(1)
        )
    return t


def test_full_maintenance_cycle_via_sql_only(spark, tmp_path):
    path = str(tmp_path / "t")
    t = _seed(spark, path)  # 4 append commits → 4 manifest parts
    # a genuinely orphaned data dir (failed-commit leftover), aged past
    # any grace period, for the orphan-GC leg of the cycle
    stray = os.path.join(path, "data", "stray-commit")
    os.makedirs(stray)
    import shutil as _sh

    _sh.copy(
        glob.glob(os.path.join(path, "data", "*", "*.parquet"))[0],
        os.path.join(stray, "orphan.parquet"),
    )
    os.utime(stray, (1, 1))
    register_metadata_tvfs(spark)

    def call(proc, args="{}"):
        return {
            r["key"]: r["value"]
            for r in spark.sql(
                f"SELECT * FROM lakehouse_call('{path}', '{proc}', "
                f"'{args}')"
            ).collect()
        }

    # 1. consolidate manifest parts (4 → 1)
    rep = call("rewrite_manifest_parts")
    assert "noop" not in rep
    assert (
        len(
            t._raw_manifest(t._manifest_path(t.current_version())).get(
                "parts", []
            )
        )
        == 1
    )
    # 2. expire everything but the tip
    rep = call("expire_snapshots", '{"keep_last": 1}')
    assert json.loads(rep["n_expired"]) == 4  # v1..v4 (v5 = rewrite)
    # 3. age-based orphan GC reclaims the aged stray dir (expire
    # already swept the dirs its expired manifests referenced)
    rep = call("remove_orphan_files", '{"older_than_seconds": 3600}')
    assert json.loads(rep["n_removed"]) >= 1
    assert not os.path.exists(stray)
    # the table still reads every row through SQL metadata TVFs
    live = spark.sql(
        f"SELECT count(*) AS n FROM lakehouse_snapshots('{path}')"
    ).collect()[0]["n"]
    assert live == 1
    rows_total = spark.sql(
        f"SELECT CAST(sum(rows) AS BIGINT) AS r FROM "
        f"lakehouse_files('{path}')"
    ).collect()[0]["r"]
    assert rows_total == 40
    assert t.read().count() == 40
    # 4. properties via SQL
    call("set_property", '{"key": "write.sort-by", "value": "k"}')
    assert t.get_property("write.sort-by") == "k"
    call("unset_property", '{"key": "write.sort-by"}')
    assert t.get_property("write.sort-by") is None


def test_spark_launching_verbs_refused_in_sql_directed_to_api(
    spark, tmp_path
):
    path = str(tmp_path / "t")
    _seed(spark, path, n_appends=2)
    register_metadata_tvfs(spark)
    with pytest.raises(Exception, match="driver-side"):
        spark.sql(
            f"SELECT * FROM lakehouse_call('{path}', "
            "'rewrite_data_files', '{}')"
        ).collect()
    with pytest.raises(Exception, match="unknown procedure"):
        spark.sql(
            f"SELECT * FROM lakehouse_call('{path}', 'drop_table', '{{}}')"
        ).collect()


def test_call_procedure_driver_side_full_verb_set(spark, tmp_path):
    path = str(tmp_path / "t")
    t = _seed(spark, path, n_appends=3)
    t.delete_where_pos(F.col("k") % 7 == 0)
    # data-rewriting verbs through the uniform CALL surface
    rep = {
        r["key"]: r["value"]
        for r in call_procedure(
            spark, path, "rewrite_data_files", target_file_count=1
        ).collect()
    }
    assert rep  # report surfaced
    assert len(t._read_manifest(t.current_version())["files"]) == 1
    assert t.read().count() == 30 - 5  # k in {0,7,14,21,28} dead
    # analyze produces NDV stats through the same surface
    rep = {
        r["key"]: r["value"]
        for r in call_procedure(spark, path, "analyze").collect()
    }
    assert rep
    # and the metadata verbs work driver-side too
    out = call_procedure(spark, path, "expire_snapshots", keep_last=1)
    assert out.columns == ["procedure", "key", "value"]


def test_mv_lifecycle_through_call_surface(spark, tmp_path):
    """MV verbs ride the same CALL surface: create/refresh driver-side
    (they launch Spark jobs), orphan GC from pure SQL."""
    from pyspark.sql import Row

    src = _seed(spark, str(tmp_path / "src"), n_appends=2)
    mv = str(tmp_path / "mv")
    rep = {
        r["key"]: r["value"]
        for r in call_procedure(
            spark,
            mv,
            "mv_create",
            source_path=src.path,
            spec={"group_by": ["k"], "aggs": {"total": ["sum", "v"]}},
        ).collect()
    }
    assert json.loads(rep["last_source_version"]) == 2
    src.append(
        spark.createDataFrame([Row(k=1, v=999)]).coalesce(1)
    )
    rep = {
        r["key"]: r["value"]
        for r in call_procedure(spark, mv, "mv_refresh").collect()
    }
    assert json.loads(rep["last_source_version"]) == 3
    register_metadata_tvfs(spark)
    rep = {
        r["key"]: r["value"]
        for r in spark.sql(
            f"SELECT * FROM lakehouse_call('{mv}', "
            "'mv_gc_orphan_storage', '{}')"
        ).collect()
    }
    assert json.loads(rep["n_removed"]) == 0

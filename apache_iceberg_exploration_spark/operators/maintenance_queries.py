"""Oracled query for the SQL maintenance-procedure surface (r9,
VERDICT r8 #6): a retention cycle driven ENTIRELY through spark.sql —
``lakehouse_call`` TVFs for the verbs, metadata TVFs and the SQL table
surface for the read-back — value-hashed against plain customer
arithmetic."""

from __future__ import annotations

import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.io import load_table
from ..sources.lakehouse import LakehouseTable


@query(
    "lakehouse_sql_maintenance_cycle",
    oracle="""
        SELECT 'bal_cents' AS metric,
               CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS value
        FROM customer
        UNION ALL
        SELECT 'live_snapshots', 1
        UNION ALL
        SELECT 'n_expired', 4
        UNION ALL
        SELECT 'rows_total', (SELECT count(*) FROM customer)
    """,
)
def lakehouse_sql_maintenance_cycle(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The Iceberg ``CALL``-procedure story in pure SQL: customer lands
    as four append commits; then — through ``spark.sql`` ONLY —
    ``lakehouse_call`` consolidates the manifest parts
    (rewrite_manifests), expires history to the tip (4 versions
    reported expired), and age-sweeps the orphaned parts/dirs; the
    read-back goes through the ``lakehouse_snapshots``/
    ``lakehouse_files`` metadata TVFs and the ``CREATE TABLE … USING
    lakehouse`` SQL table. The metric rows hash against plain customer
    arithmetic, so the cycle provably loses no rows and the expiry
    report is exact.

    Scale: every verb here is O(metadata) — part consolidation reads
    N part JSONs and writes one, expiry unlinks manifests and doomed
    data dirs, orphan GC is an age-gated directory sweep. The
    data-rewriting verbs (rewrite_data_files/analyze) run driver-side
    via ``call_procedure`` — a Python UDTF worker cannot launch Spark
    jobs, the same boundary that makes Iceberg's CALL a JVM session
    extension (documented, loud)."""
    from ..sources.sql_tvf import register_metadata_tvfs
    from ..streaming.lakehouse_source import make_lakehouse_batch_source

    root = tempfile.mkdtemp(prefix="lakehouse_callq_", dir="/tmp")
    name = f"maint_{uuid.uuid4().hex[:8]}"
    try:
        t = LakehouseTable(spark, root + "/t")
        cust = load_table(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("k"),
            F.floor(F.col("c_acctbal") * 100 + 0.5)
            .cast("long")
            .alias("cents"),
        )
        for i in range(4):
            t.append(cust.filter(F.col("k") % 4 == i).repartition(2))
        register_metadata_tvfs(spark)
        spark.dataSource.register(make_lakehouse_batch_source())
        # the DSv2 reader pushes filters; a vanilla (driver) session
        # needs the Python-pushdown flag on (session.py sets it, the
        # driver's own session does not)
        spark.conf.set(
            "spark.sql.python.filterPushdown.enabled", "true"
        )
        spark.sql(
            f"CREATE TABLE {name} USING lakehouse "
            f"OPTIONS (path '{t.path}')"
        )
        path = t.path
        spark.sql(
            f"SELECT * FROM lakehouse_call('{path}', "
            "'rewrite_manifest_parts', '{}')"
        ).collect()
        expired = spark.sql(
            f"SELECT value FROM lakehouse_call('{path}', "
            "'expire_snapshots', '{\"keep_last\": 1}') "
            "WHERE key = 'n_expired'"
        ).collect()[0]["value"]
        spark.sql(
            f"SELECT * FROM lakehouse_call('{path}', "
            "'remove_orphan_files', '{\"older_than_seconds\": 0}')"
        ).collect()
        out = spark.sql(
            f"""
            SELECT 'bal_cents' AS metric,
                   CAST(sum(cents) AS BIGINT) AS value
            FROM {name}
            UNION ALL
            SELECT 'live_snapshots',
                   (SELECT count(*) FROM lakehouse_snapshots('{path}'))
            UNION ALL
            SELECT 'n_expired', CAST({int(expired)} AS BIGINT)
            UNION ALL
            SELECT 'rows_total',
                   (SELECT CAST(sum(rows) AS BIGINT)
                    FROM lakehouse_files('{path}'))
            """
        )
        return out.localCheckpoint(eager=True)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(root, ignore_errors=True)

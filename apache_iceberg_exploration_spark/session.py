"""SparkSession factory.

Replaces the reference's singleton session builder
(dags/utils/constants/constant.py:13-63, which wires an Iceberg hadoop
catalog over MinIO/S3A) with a local-filesystem warehouse and
explicitly-tuned configs. Iceberg extensions are attached only when the
iceberg-spark-runtime jar is actually on the classpath (it is not in this
container); everything else in the engine works without it.

Scale stance: AQE on (runtime coalesce + skew-join), shuffle partitions
sized to the machine rather than the 200 default, Arrow enabled for every
pandas interchange. On a real cluster only ``master`` and the partition
count change; the rest of the conf is scale-independent.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_WAREHOUSE = os.environ.get(
    "SPARK_GRAFT_WAREHOUSE", "/root/repo/.warehouse"
)


def _iceberg_jar_available() -> bool:
    """True if an iceberg-spark-runtime jar is importable by the JVM."""
    try:
        import pyspark

        jars_dir = os.path.join(os.path.dirname(pyspark.__file__), "jars")
        return any("iceberg-spark-runtime" in j for j in os.listdir(jars_dir))
    except OSError:
        return False


def get_spark(
    app_name: str = "apache-iceberg-exploration-spark",
    cpus: int | None = None,
    warehouse: str = DEFAULT_WAREHOUSE,
    extra_conf: dict[str, str] | None = None,
    hive_metastore: bool = False,
) -> SparkSession:
    """Build (or fetch) the session.

    Mirrors the intent of the reference's ``get_spark_session``
    (constant.py:13-63) minus Airflow/MinIO coupling:
    - session timezone pinned to UTC (oracle comparability),
    - AQE + runtime coalesce + skew-join handling on,
    - shuffle partitions ≈ cores for local mode (on a cluster, leave the
      default or size to 2-3× total cores),
    - Arrow on for pandas/Pandas-UDF interchange.

    ``hive_metastore=True`` adds ``enableHiveSupport()`` — the
    reference's constant.py:60 — backing ``saveAsTable``/``listTables``
    with a persistent (embedded-Derby) Hive metastore under the
    warehouse dir instead of the in-memory catalog. Off by default:
    the engine's own queries never need HMS, and a metastore pins the
    JVM to one catalog per process (getOrCreate would otherwise leak
    the setting into unrelated tests).
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.default.parallelism", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Python Data Source predicate pushdown (the batch lakehouse
        # format folds pushed filters into manifest-stats file pruning)
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # µs-typed parquet timestamps (not legacy INT96, which pyarrow
        # surfaces as ns and Spark's Arrow ingest then rejects)
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir", warehouse)
    )

    if _iceberg_jar_available():
        # Same catalog shape as the reference (constant.py:39-55), local FS
        # warehouse instead of s3a://mybucket.
        builder = (
            builder.config(
                "spark.sql.extensions",
                "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
            )
            .config("spark.sql.catalog.my_catalog", "org.apache.iceberg.spark.SparkCatalog")
            .config("spark.sql.catalog.my_catalog.type", "hadoop")
            .config("spark.sql.catalog.my_catalog.warehouse", os.path.join(warehouse, "iceberg"))
        )

    if hive_metastore:
        # embedded Derby metastore colocated with the warehouse (the
        # reference keeps HMS state in its compose volume the same way)
        builder = builder.config(
            "javax.jdo.option.ConnectionURL",
            f"jdbc:derby:;databaseName={os.path.join(warehouse, 'metastore_db')};create=true",
        ).enableHiveSupport()

    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)

    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

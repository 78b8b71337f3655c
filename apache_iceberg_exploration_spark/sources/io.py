"""Scans and sinks (SURVEY.md §2.1 S1-S12), Spark-native.

The reference funnels every extract through a pandas frame in the driver
(dags/etl.py:42-48 — ``PostgresHook.get_pandas_df`` → ``to_parquet('/tmp')``
→ ``spark.read.parquet``), which caps scale at driver RAM and breaks on
multi-worker Airflow (the /tmp handoff, etl.py:59/65). Here every source is
a distributed Spark scan and stages hand off via tables, never local files.

Parquet scans always declare the explicit schema from ``schemas.py``
(schema-on-read validation; pruning/pushdown still apply because the
declared columns match the footer exactly).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import TABLES


_EVENTS_TS_IS_INT64: dict[str, bool] = {}


def events_ts_is_int64(sf_dir: str) -> bool:
    """Whether events.parquet stores ``ts`` as a raw INT64 (epoch-nanos —
    parquet TIMESTAMP(NANOS), which Spark rejects without the nanosAsLong
    legacy conf) or as a proper parquet timestamp (µs). The driver has
    shipped BOTH encodings across rounds, so sniff the footer once per
    directory (one driver-side metadata read, no data IO) instead of
    hard-coding either."""
    if sf_dir not in _EVENTS_TS_IS_INT64:
        import glob as _glob

        import pyarrow as pa
        import pyarrow.parquet as pq

        path = os.path.join(sf_dir, "events.parquet")
        if os.path.isdir(path):
            # Spark-written dataset (e.g. the synthesized scaling SFs,
            # tools/synth_scale.py): sniff any one leaf file
            path = sorted(_glob.glob(os.path.join(path, "*.parquet")))[0]
        t = pq.read_schema(path).field("ts").type
        _EVENTS_TS_IS_INT64[sf_dir] = pa.types.is_integer(t)
    return _EVENTS_TS_IS_INT64[sf_dir]


def parquet_num_rows(sf_dir: str, table: str) -> int:
    """Row count from parquet footers — one driver-side metadata read,
    no Spark job (feeds data-size-adaptive parameters, e.g. the
    semantic-dedup sign-LSH plane count). Handles both the driver's
    single-file layout and Spark-written dataset directories."""
    import glob as _glob

    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{table}.parquet")
    if os.path.isdir(path):
        return sum(
            pq.ParquetFile(f).metadata.num_rows
            for f in _glob.glob(os.path.join(path, "*.parquet"))
        )
    return pq.ParquetFile(path).metadata.num_rows


def events_raw_schema(sf_dir: str) -> T.StructType:
    """Declared read schema for events.parquet honouring the on-disk ``ts``
    encoding (LongType for epoch-nanos files, TimestampType otherwise).
    Shared by batch and readStream scans."""
    if not events_ts_is_int64(sf_dir):
        return TABLES["events"]
    return T.StructType(
        [
            f if f.name != "ts" else T.StructField("ts", T.LongType())
            for f in TABLES["events"].fields
        ]
    )


def load_events_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet with ``ts`` in its on-disk encoding.

    For epoch-nano INT64 files, reading raw keeps watermark predicates
    pushable: compare against an epoch-nano literal on the INT64 column
    (pushed to the parquet reader), then convert — a filter above
    ``timestamp_micros(...)`` would not push down. For timestamp(µs)
    files Spark pushes timestamp comparisons natively, so raw == typed.
    """
    if events_ts_is_int64(sf_dir):
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.schema(events_raw_schema(sf_dir)).parquet(
        os.path.join(sf_dir, "events.parquet")
    )


def events_ts_to_timestamp(df: DataFrame) -> DataFrame:
    """epoch-nanos INT64 → TimestampType; no-op when ``ts`` is already a
    timestamp (µs-encoded files).

    Integer division, NOT ``/1000`` — epoch-nanos (~1.7e18) exceed a
    double's 53-bit mantissa, so float division silently rounds the odd
    microseconds."""
    if isinstance(df.schema["ts"].dataType, T.LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan of a testdata table with its declared schema (S3).

    Column pruning and predicate pushdown stay effective: Catalyst prunes
    against the declared StructType and pushes comparisons into the parquet
    reader (verify with ``plans.explain_str`` — tests assert PushedFilters).
    """
    if name == "events":
        return events_ts_to_timestamp(load_events_raw(spark, sf_dir))
    path = os.path.join(sf_dir, f"{name}.parquet")
    reader = spark.read
    if name in TABLES:
        reader = reader.schema(TABLES[name])
    return reader.parquet(path)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite",
                  partition_by: list[str] | None = None) -> None:
    """Parquet sink (S4). ``partition_by`` enables partition pruning for
    downstream readers — the reference wrote everything unpartitioned
    (etl.py:51-54), which at 100 TB forfeits pruning entirely."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV sink (S9 — test-backup variant's pandas ``to_csv`` equivalent)."""
    df.write.mode(mode).option("header", True).csv(path)


def read_csv(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """CSV source (S8). Explicit schema preferred; header inference is the
    reference's approach (sparkmini passes CSV options even to parquet)."""
    reader = spark.read.option("header", True)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink — the interchange format REST-ish consumers expect
    (S11's payload shape, as a distributed file sink). One JSON object
    per line per row; compression via the standard codec option."""
    df.write.mode(mode).json(path)


def read_json(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """JSON-lines source. Explicit schema strongly preferred: schema
    inference on JSON runs a full extra pass over the data AND types every
    bare integer as long/double by sample — the same inference trap the
    reference fell into on parquet (SURVEY.md §1.3)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink — the other columnar format Spark ships native vectorized
    support for; interchange with Hive/Trino warehouses."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source (self-describing schema, vectorized reader, predicate
    pushdown — same scan contract as parquet)."""
    return spark.read.orc(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    predicate: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    **options: str,
) -> DataFrame:
    """JDBC scan (S1/S2), parallelized.

    The reference's incremental extract (etl.py:38-42) interpolates the
    watermark into an f-string SQL and materializes the full result in the
    driver. Here the predicate is pushed via ``dbtable`` subquery and the
    scan is split across executors with partitionColumn bounds — the
    100 TB-safe shape. Live-tested in-container against embedded Apache
    Derby (the driver Spark ships for the Hive metastore) —
    tests/test_pipeline_io.py::test_jdbc_live_roundtrip_embedded_derby
    executes a real pushed, partition-split read; no Postgres driver jar
    exists in the sandbox, so the Postgres path stays options-level.
    """
    dbtable = f"(SELECT * FROM {table}" + (
        f" WHERE {predicate})" if predicate else ")"
    ) + " AS src"
    reader = (
        spark.read.format("jdbc").option("url", url).option("dbtable", dbtable)
    )
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "error",
    batch_size: int = 10_000,
    num_partitions: int | None = None,
    **options: str,
) -> None:
    """JDBC sink (S12's declared-but-never-executed intent: the
    test-backup variant wires a ClickHouse load it never runs —
    SURVEY §2.1; generalized here as the warehouse-export sink).

    Each input partition opens one connection and streams batched
    INSERTs, so write parallelism == partition count: cap it with
    ``num_partitions`` (a `coalesce`, no shuffle) — a 10k-partition
    100 TB frame must NOT open 10k simultaneous connections against
    one database. ``batch_size`` maps to Spark's ``batchsize`` (rows
    per executeBatch round-trip). Overwrite mode drops/recreates by
    default; pass ``truncate="true"`` to keep the table's DDL.

    Exactly-once caveat (documented, not hidden): Spark task retries
    re-run partition inserts, so a mid-write failure can leave partial
    rows in plain append mode — the production pattern is loading into
    a staging table then an atomic SQL rename/swap, or an idempotent
    upsert target. Live-tested against embedded Derby
    (tests/test_pipeline_io.py::test_jdbc_sink_roundtrip_embedded_derby).
    """
    if num_partitions is not None:
        df = df.coalesce(num_partitions)
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .mode(mode)
    )
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()


import re as _re

_IDENT_RE = _re.compile(r"^[A-Za-z_][A-Za-z0-9_.]*$")
# watermark literals are timestamps/dates — allow exactly that shape.
# An allowlist beats escaping here: quote-doubling alone is unsafe on
# backends with backslash string escapes (MySQL default sql_mode), where
# `\' OR ...` survives doubling and still terminates the literal.
_WATERMARK_RE = _re.compile(r"^[0-9][0-9:\-+. TZ]*$")


def jdbc_options_for_incremental(
    url: str, table: str, watermark_column: str, watermark_value: str
) -> dict[str, str]:
    """Pure builder for the S1 incremental-scan options (unit-testable
    without a database).

    The reference interpolates the watermark into source SQL unescaped
    (etl.py:41). Here identifiers must match an identifier grammar and
    the watermark must be a timestamp-shaped literal (digits/:-+. TZ) —
    values that can't break out of the predicate on any JDBC dialect,
    including backslash-escaping ones. Anything else is rejected rather
    than escaped."""
    for ident in (table, watermark_column):
        if not _IDENT_RE.match(ident):
            raise ValueError(f"invalid SQL identifier: {ident!r}")
    if not _WATERMARK_RE.match(watermark_value):
        raise ValueError(
            f"watermark must be a timestamp-shaped literal: {watermark_value!r}"
        )
    return {
        "url": url,
        "dbtable": (
            f"(SELECT * FROM {table} WHERE {watermark_column} > "
            f"'{watermark_value}') AS src"
        ),
    }

"""Medallion-parity operators: the reference's entire data-plane logic
(SURVEY.md §2.2-2.4, §3.1), generalized from the 9-row ``customer_data``
table to the driver's testdata.

Reference pipeline (dags/etl.py:36-96):
  bronze = incremental full-projection extract        (etl.py:38-48, P1/P2/S1)
  silver = bronze.dropDuplicates()                    (etl.py:68,    A2)
  gold   = silver.groupBy(4 keys).agg(count(*))       (etl.py:86,    A1)

Each step is registered both in reference semantics (the full-row dedup is
a knowing no-op over rows with a serial PK — SURVEY.md §5 trap) and in the
intended keyed semantics (deterministic: window row_number, not
``dropDuplicates(subset)``, so the kept row is well-defined for the oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.io import load_table


@query(
    "bronze_ingest_customer",
    oracle="SELECT * FROM customer",
)
def bronze_ingest_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bronze: full-projection scan (P2 `SELECT *`, etl.py:41).

    At scale the bronze layer should be written partitioned (see
    sources.io.write_parquet) — the scan itself is a plain pruned/pushed
    parquet read.
    """
    return load_table(spark, sf_dir, "customer")


@query(
    "incremental_extract_events",
    oracle="""
        SELECT event_id, ts, user_id, event_type, value, props
        FROM events
        WHERE ts > TIMESTAMP '2024-01-15 00:00:00'
    """,
)
def incremental_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: the incremental high-watermark predicate (etl.py:41
    ``last_updated > '{last_run}'``) as a typed filter that Catalyst pushes
    into the parquet scan (tests assert PushedFilters), instead of an
    f-string interpolated into source SQL.

    The comparison happens in the on-disk encoding so it stays pushable:
    for epoch-nano INT64 files an epoch-nano literal (a filter above
    ``timestamp_micros`` would not push), for timestamp(µs) files a plain
    timestamp literal (Spark pushes those natively — PushedFilters shows
    ``GreaterThan(ts, ...)`` either way).
    """
    from ..sources.io import (
        events_ts_is_int64,
        events_ts_to_timestamp,
        load_events_raw,
    )

    raw = load_events_raw(spark, sf_dir)
    if events_ts_is_int64(sf_dir):
        watermark = F.lit(1705276800 * 1_000_000_000)  # 2024-01-15T00:00:00Z
    else:
        watermark = F.to_timestamp(F.lit("2024-01-15 00:00:00"))
    return events_ts_to_timestamp(raw.filter(F.col("ts") > watermark))


@query(
    "silver_dedup_fullrow",
    oracle="SELECT DISTINCT * FROM customer",
)
def silver_dedup_fullrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2, reference semantics: ``dropDuplicates()`` over ALL columns
    (etl.py:68). Over a table with a unique key this is a knowing no-op —
    preserved verbatim because it is what the reference computes; the
    intended behavior is `silver_dedup_keyed`.
    """
    return load_table(spark, sf_dir, "customer").dropDuplicates()


@query(
    "silver_dedup_keyed",
    oracle="""
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               o_orderdate, o_orderpriority
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY o_custkey, o_orderstatus
                ORDER BY o_orderkey
            ) AS rn
            FROM orders
        )
        WHERE rn = 1
    """,
)
def silver_dedup_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2, intended semantics: keyed dedup (FIXTURES.md §1 —
    ``dropDuplicates(["name","email","phone","address"])``), made
    deterministic: keep the lowest surrogate key per business key via a
    ranking window rather than dropDuplicates' arbitrary winner.

    Scale note: one shuffle on the business key; at 100 TB prefer this over
    full-row distinct (narrower shuffle key, map-side combine inapplicable
    to either).
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey", "o_orderstatus").orderBy("o_orderkey")
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@query(
    "gold_customer_agg",
    oracle="""
        SELECT c_mktsegment,
               count(*) AS total_count,
               round(avg(c_acctbal), 2) AS avg_acctbal,
               round(sum(c_acctbal), 2) AS sum_acctbal
        FROM customer
        GROUP BY c_mktsegment
    """,
)
def gold_customer_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: the Gold multi-key hash aggregate (etl.py:86
    ``groupBy(...).agg(F.count("*").alias("total_count"))``) generalized
    with avg/sum. Catalyst plans partial→final HashAggregate with map-side
    combine; low-cardinality group key means the shuffle is tiny at any
    scale.
    """
    return (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("total_count"),
            F.round(F.avg("c_acctbal"), 2).alias("avg_acctbal"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
        )
    )


@query(
    "gold_duplicate_audit",
    oracle="""
        WITH corpus AS (
            SELECT text, lang FROM documents
            UNION ALL
            SELECT text, lang FROM documents WHERE doc_id % 40 = 0
        )
        SELECT text, lang, count(*) AS total_count
        FROM corpus
        GROUP BY text, lang
        HAVING count(*) > 1
    """,
)
def gold_duplicate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 in its original *intent*: surface duplicate records as
    ``total_count > 1`` (the init.sql:11 'Duplikat email' seed). The
    synthetic corpus has no duplicate texts, so the audit plants its own
    (every 40th document re-appended, mirrored in the oracle) — the
    count>1 filter must surface exactly those.
    """
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.select("text", "lang").unionByName(
        docs.filter(F.col("doc_id") % 40 == 0).select("text", "lang")
    )
    return (
        corpus.groupBy("text", "lang")
        .agg(F.count("*").alias("total_count"))
        .filter(F.col("total_count") > 1)
    )


@query(
    "row_count_orders",
    oracle="SELECT count(*) AS n_rows FROM orders",
)
def row_count_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: the logging row-count (etl.py:43 ``len(df)``) as a distributed
    count, returned as a 1-row DataFrame."""
    return load_table(spark, sf_dir, "orders").agg(F.count("*").alias("n_rows"))


@query(
    "latest_event_per_user",
    oracle="""
        SELECT user_id, event_id AS latest_event_id, ts AS latest_ts
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC
            ) AS rn
            FROM events
        )
        WHERE rn = 1
    """,
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 generalized: the reference's top-1-by-ordering (latest successful
    run, constant.py:72-78) as latest-event-per-key — a max-by via ranking
    window, deterministic tiebreak on event_id."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("latest_event_id"),
            F.col("ts").alias("latest_ts"),
        )
    )


@query(
    "medallion_pipeline_e2e",
    oracle="""
        WITH silver AS (
            SELECT * FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY text ORDER BY doc_id
                ) AS rn
                FROM documents
            ) WHERE rn = 1
        )
        SELECT lang, source, count(*) AS total_count,
               round(avg(n_chars), 2) AS avg_chars
        FROM silver GROUP BY lang, source
    """,
)
def medallion_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE reference artifact, end-to-end and driver-verified: the full
    bronze → silver → gold pipeline (pipeline.lakehouse_medallion) run
    over committed lakehouse snapshots — raw append, keyed dedup, group
    aggregate (etl.py:36-96 reimagined without the /tmp hand-off and its
    delete-before-read bug) — returning the gold table, hash-checked
    against a one-shot SQL derivation of all three layers.

    Scale: bronze appends are fast-appends (O(batch) commits); silver
    dedup shuffles on the content key once; gold is a tiny derived
    overwrite — each layer hand-off is a snapshot, so any stage can
    restart from committed state (the property the reference's /tmp
    pipeline lacked)."""
    import shutil as _shutil
    import tempfile as _tempfile

    from ..pipeline import lakehouse_medallion

    root = _tempfile.mkdtemp(prefix="lakehouse_q_", dir="/tmp")
    try:
        tables = lakehouse_medallion(spark, sf_dir, root)
        out = tables["gold"].read()
        return out.localCheckpoint(eager=True)
    finally:
        _shutil.rmtree(root, ignore_errors=True)

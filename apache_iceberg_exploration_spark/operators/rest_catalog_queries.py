"""Oracled queries for the REST-catalog HTTP surface (r11 — VERDICT
r10 #1, sources/rest_catalog.py).

Both queries resolve tables OVER HTTP (stdlib urllib against the
in-process stdlib server) and read the served live-file manifest with
a PLAIN ``spark.read.parquet`` — no engine read path on the client
side — so the value hash proves the HTTP metadata is sufficient for an
external engine to consume the table exactly.
"""

from __future__ import annotations

import json
import shutil
import tempfile
import urllib.request

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.catalog import LakehouseCatalog
from ..sources.io import load_table
from ..sources.rest_catalog import RestCatalogServer


def _http(url: str, method: str = "GET", body: dict | None = None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(url, data=data, method=method)
    if data:
        req.add_header("Content-Type", "application/json")
    with urllib.request.urlopen(req, timeout=60) as resp:
        return json.loads(resp.read())


@query(
    "lakehouse_rest_catalog_http_read",
    oracle="""
        WITH src AS (
            SELECT o_custkey AS cust,
                   CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                       AS cents
            FROM orders
            WHERE o_custkey % 7 <> 3
        )
        SELECT CAST(cust % 5 AS BIGINT) AS bucket,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(cents) AS BIGINT) AS cents_total
        FROM src
        GROUP BY 1
    """,
)
def lakehouse_rest_catalog_http_read(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """External-engine interop over HTTP: orders lands as a catalog
    table, a CoW delete prunes cust≡3 (mod 7), and the CLIENT resolves
    the table through ``GET /v1/namespaces/s/tables/orders`` — reading
    the returned ``x-lakehouse.files`` manifest with a plain
    ``spark.read.parquet``. The aggregate must equal the oracle's
    post-delete state, proving the served file list is exactly the
    LIVE set (the deleted rows' original files are gone from it).

    Scale: the HTTP exchange is O(snapshots) JSON metadata — zero data
    moves through the server; the client reads parquet directly from
    storage, which is precisely how an external engine would consume a
    100 TB table through a REST catalog (Iceberg REST spec shape).
    Reference: the reference's my_catalog is resolvable by any engine
    with the Iceberg runtime (constant.py:43-55); this is that
    property for the rebuilt format."""
    root = tempfile.mkdtemp(prefix="lakehouse_rest_", dir="/tmp")
    try:
        cat = LakehouseCatalog(spark, root + "/wh")
        cat.create_namespace("s")
        t = cat.table("s.orders")
        t.append(
            load_table(spark, sf_dir, "orders")
            .select(
                F.col("o_custkey").alias("cust"),
                F.floor(F.col("o_totalprice") * 100 + 0.5)
                .cast("long")
                .alias("cents"),
            )
            .repartition(4, "cust")
        )
        t.delete_where(F.col("cust") % 7 == 3)
        with RestCatalogServer(cat.warehouse) as srv:
            res = _http(f"{srv.url}/v1/namespaces/s/tables/orders")
        x = res["x-lakehouse"]
        assert not x["delete-pending"], "CoW delete must leave no MoR"
        client_df = spark.read.parquet(*x["files"])
        out = (
            client_df.groupBy(
                (F.col("cust") % 5).cast("long").alias("bucket")
            )
            .agg(
                F.count("*").alias("n_orders"),
                F.sum("cents").cast("long").alias("cents_total"),
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "lakehouse_rest_catalog_txn_pinned_read",
    oracle="""
        WITH facts AS (
            SELECT c_custkey AS cust, c_nationkey AS nat,
                   CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
                       AS cents
            FROM customer
        )
        SELECT nat,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS cents_total
        FROM facts
        GROUP BY 1
    """,
)
def lakehouse_rest_catalog_txn_pinned_read(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Transaction commit OVER HTTP + pinned time-travel read: the
    client pins the customer table's version via
    ``POST /v1/transactions/commit`` (CAS requirement against the
    never-pinned state), a direct writer then dumps junk rows into the
    table, and the client re-resolves through ``GET /v1/refs/main`` →
    ``GET .../tables/customer?snapshot-id=<pin>`` — reading the PINNED
    file list with plain parquet. The aggregate equals the pre-junk
    oracle: HTTP-committed pins give external readers the same
    isolation the in-package catalog snapshot gives (txn_queries.py).

    Scale: commit = one CAS pointer link; pinned resolution = one JSON
    read per table — both O(1) in data size."""
    root = tempfile.mkdtemp(prefix="lakehouse_rest_txn_", dir="/tmp")
    try:
        cat = LakehouseCatalog(spark, root + "/wh")
        cat.create_namespace("s")
        t = cat.table("s.customer")
        t.append(
            load_table(spark, sf_dir, "customer")
            .select(
                F.col("c_custkey").alias("cust"),
                F.col("c_nationkey").alias("nat"),
                F.floor(F.col("c_acctbal") * 100 + 0.5)
                .cast("long")
                .alias("cents"),
            )
            .repartition(4, "cust")
        )
        with RestCatalogServer(cat.warehouse) as srv:
            committed = _http(
                f"{srv.url}/v1/transactions/commit",
                "POST",
                {
                    "ref": "main",
                    "updates": {"s.customer": t.current_version()},
                    "requirements": {"s.customer": None},
                },
            )
            assert committed["commit"] >= 1
            # direct (catalog-invisible) junk write AFTER the pin
            t.append(
                spark.createDataFrame(
                    [(10**9 + i, 0, 999) for i in range(7)],
                    "cust long, nat long, cents long",
                ).repartition(1)
            )
            pins = _http(f"{srv.url}/v1/refs/main")["pins"]
            res = _http(
                f"{srv.url}/v1/namespaces/s/tables/customer"
                f"?snapshot-id={pins['s.customer']}"
            )
        client_df = spark.read.parquet(*res["x-lakehouse"]["files"])
        out = client_df.groupBy("nat").agg(
            F.count("*").alias("n"),
            F.sum("cents").cast("long").alias("cents_total"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "lakehouse_rest_catalog_plan_pruned_read",
    oracle="""
        WITH src AS (
            SELECT o_orderkey AS k, o_custkey AS cust,
                   CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                       AS cents
            FROM orders
        ),
        lims AS (
            SELECT CAST(floor(max(k) * 0.25) AS BIGINT) AS lo,
                   CAST(floor(max(k) * 0.50) AS BIGINT) AS hi
            FROM src
        )
        SELECT CAST(cust % 4 AS BIGINT) AS bucket,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(cents) AS BIGINT) AS cents_total
        FROM src, lims
        WHERE k BETWEEN lims.lo AND lims.hi
        GROUP BY 1
    """,
)
def lakehouse_rest_catalog_plan_pruned_read(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Server-side scan planning over HTTP (the Iceberg REST plan-scan
    shape): orders lands range-clustered on the order key, the client
    POSTs a key-range filter to ``/plan``, and the server returns a
    stats-pruned file subset — the query ASSERTS files were actually
    pruned, then reads only the surviving files with a plain parquet
    reader plus the residual filter. Hash equality against the direct
    range aggregate proves pruning never drops a matching row.

    Scale: the client of a 100 TB table downloads the paths of the
    files its predicate can touch — O(surviving files) metadata — and
    scans only those; the server did for an external engine what
    pushFilters does for Spark, in O(files) dict lookups."""
    root = tempfile.mkdtemp(prefix="lakehouse_rest_plan_", dir="/tmp")
    try:
        cat = LakehouseCatalog(spark, root + "/wh")
        cat.create_namespace("s")
        t = cat.table("s.orders")
        src = load_table(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("k"),
            F.col("o_custkey").alias("cust"),
            F.floor(F.col("o_totalprice") * 100 + 0.5)
            .cast("long")
            .alias("cents"),
        )
        t.append(src.repartitionByRange(8, "k"))
        kmax = src.agg(F.max("k")).collect()[0][0]
        lo, hi = int(kmax * 0.25), int(kmax * 0.50)
        with RestCatalogServer(cat.warehouse) as srv:
            plan = _http(
                f"{srv.url}/v1/namespaces/s/tables/orders/plan",
                "POST",
                {"filters": [{"col": "k", "lo": lo, "hi": hi}]},
            )
        assert plan["pruned-files"] > 0, plan  # pruning has teeth
        assert not plan["delete-pending"]
        client_df = spark.read.parquet(*plan["files"]).where(
            (F.col("k") >= lo) & (F.col("k") <= hi)
        )
        out = client_df.groupBy(
            (F.col("cust") % 4).cast("long").alias("bucket")
        ).agg(
            F.count("*").alias("n_orders"),
            F.sum("cents").cast("long").alias("cents_total"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "lakehouse_rest_client_datasource_read",
    oracle="""
        WITH src AS (
            SELECT c_custkey AS cust,
                   c_nationkey % 5 AS region_bucket,
                   CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
                       AS cents
            FROM customer
        )
        SELECT CAST(region_bucket AS BIGINT) AS region_bucket,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS cents_total
        FROM src
        WHERE cust >= 100
        GROUP BY 1
    """,
)
def lakehouse_rest_client_datasource_read(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The CLIENT half of REST interop as a Spark data source:
    ``format("lakehouse_rest")`` resolves the table through the HTTP
    catalog (schema from LoadTableResult), pushes its filter to the
    server's /plan endpoint, and reads per-file Arrow tasks — over a
    HIVE-PARTITIONED table, so the value hash also pins the r11
    partition-column recovery (engine partition_by files omit the
    column; the path carries it).

    Scale: the session needs only the catalog URL plus storage access
    — planning is two HTTP metadata exchanges, pruning happens
    server-side, and data reads go straight to storage one task per
    surviving file (the Iceberg REST division of labor end-to-end)."""
    root = tempfile.mkdtemp(prefix="lakehouse_rest_ds_", dir="/tmp")
    try:
        from ..sources.rest_client import make_lakehouse_rest_source

        cat = LakehouseCatalog(spark, root + "/wh")
        cat.create_namespace("s")
        t = cat.table("s.customer")
        t.append(
            load_table(spark, sf_dir, "customer")
            .select(
                F.col("c_custkey").alias("cust"),
                (F.col("c_nationkey") % 5).alias("region_bucket"),
                F.floor(F.col("c_acctbal") * 100 + 0.5)
                .cast("long")
                .alias("cents"),
            )
            .repartition(2, "cust"),
            partition_by=["region_bucket"],
        )
        spark.dataSource.register(make_lakehouse_rest_source())
        # the reader implements pushFilters, which Spark REFUSES to
        # plan unless the python-pushdown flag is on — a vanilla
        # (driver) session does not set it (session.py does)
        spark.conf.set(
            "spark.sql.python.filterPushdown.enabled", "true"
        )
        with RestCatalogServer(cat.warehouse) as srv:
            df = (
                spark.read.format("lakehouse_rest")
                .option("restUrl", srv.url)
                .option("table", "s.customer")
                .load()
                .where(F.col("cust") >= 100)
            )
            out = df.groupBy("region_bucket").agg(
                F.count("*").alias("n"),
                F.sum("cents").cast("long").alias("cents_total"),
            )
            return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)

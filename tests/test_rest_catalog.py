"""REST-catalog HTTP surface (r11 — VERDICT r10 #1): the warehouse is
resolvable OVER HTTP with Iceberg REST route shapes by a client that
imports nothing from this package — namespaces, LoadTableResult with
live file manifest, views, catalog branches/tags, and an atomic
multi-table transaction commit with CAS requirements (409 on
conflict)."""

from __future__ import annotations

import json
import os
import urllib.error
import urllib.request

import pytest
from pyspark.sql import Row

from apache_iceberg_exploration_spark.sources.catalog import (
    LakehouseCatalog,
)
from apache_iceberg_exploration_spark.sources.rest_catalog import (
    RestCatalogServer,
)


def _get(url: str, method: str = "GET", body: dict | None = None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(url, data=data, method=method)
    if data:
        req.add_header("Content-Type", "application/json")
    with urllib.request.urlopen(req, timeout=30) as resp:
        raw = resp.read()
        return resp.status, json.loads(raw) if raw else None


@pytest.fixture()
def served(spark, tmp_path):
    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("silver")
    t = cat.table("silver.orders")
    t.append(
        spark.createDataFrame(
            [Row(k=i, g=i % 3, v=i * 10) for i in range(30)]
        ).repartition(2, "k")
    )
    t.append(spark.createDataFrame([Row(k=100, g=0, v=7)]).coalesce(1))
    t.tag("audited")
    cat.create_view(
        "silver.totals",
        "SELECT g, sum(v) AS total FROM silver.orders GROUP BY g",
    )
    srv = RestCatalogServer(cat.warehouse)
    yield cat, srv
    srv.close()


def test_config_namespaces_and_table_listing(served):
    cat, srv = served
    st, cfg = _get(f"{srv.url}/v1/config")
    assert st == 200 and cfg["defaults"]["warehouse"] == cat.warehouse
    st, ns = _get(f"{srv.url}/v1/namespaces")
    assert ns["namespaces"] == [["silver"]]
    st, _ = _get(
        f"{srv.url}/v1/namespaces", "POST", {"namespace": ["bronze"]}
    )
    assert st == 200
    _, ns2 = _get(f"{srv.url}/v1/namespaces")
    assert ["bronze"] in ns2["namespaces"]
    st, tl = _get(f"{srv.url}/v1/namespaces/silver/tables")
    assert tl["identifiers"] == [
        {"namespace": ["silver"], "name": "orders"}
    ]
    # 404 shapes follow the Iceberg REST error model
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(f"{srv.url}/v1/namespaces/nope/tables")
    assert ei.value.code == 404
    err = json.loads(ei.value.read())
    assert err["error"]["type"] == "NoSuchNamespaceException"


def test_load_table_result_shape_and_http_read_interop(served, spark):
    """The headline interop claim: a client resolves the table over
    HTTP and reads the returned live file list with a PLAIN parquet
    reader — no package import, bit-identical to the engine read."""
    cat, srv = served
    st, res = _get(f"{srv.url}/v1/namespaces/silver/tables/orders")
    assert st == 200
    md = res["metadata"]
    assert md["format-version"] == 3
    assert md["current-snapshot-id"] == 2
    assert [s["snapshot-id"] for s in md["snapshots"]] == [1, 2]
    assert md["snapshots"][0]["summary"]["operation"] == "append"
    names = {f["name"]: f["type"] for f in md["schemas"][0]["fields"]}
    assert names == {"k": "long", "g": "long", "v": "long"}
    assert md["refs"]["main"]["snapshot-id"] == 2
    assert md["refs"]["audited"] == {"snapshot-id": 2, "type": "tag"}
    x = res["x-lakehouse"]
    assert x["version"] == 2 and not x["delete-pending"]
    assert not x["encrypted"]
    # CLIENT SIDE: plain spark.read.parquet over the served file list
    got = sorted(
        map(tuple, spark.read.parquet(*x["files"]).select("k", "g", "v").collect())
    )
    want = sorted(
        map(tuple, cat.table("silver.orders").read().select("k", "g", "v").collect())
    )
    assert got == want and len(got) == 31
    # snapshot-id time travel over HTTP
    st, res1 = _get(
        f"{srv.url}/v1/namespaces/silver/tables/orders?snapshot-id=1"
    )
    got1 = spark.read.parquet(*res1["x-lakehouse"]["files"]).count()
    assert got1 == 30
    # HEAD = existence probe
    req = urllib.request.Request(
        f"{srv.url}/v1/namespaces/silver/tables/orders", method="HEAD"
    )
    with urllib.request.urlopen(req, timeout=30) as resp:
        assert resp.status == 204
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(f"{srv.url}/v1/namespaces/silver/tables/ghost")
    assert ei.value.code == 404


def test_delete_pending_and_encrypted_flags(served, spark):
    from pyspark.sql import functions as F

    cat, srv = served
    t = cat.table("silver.orders")
    t.delete_where_mor(F.col("k") == 0, keys=["k"])  # pending MoR delete
    _, res = _get(f"{srv.url}/v1/namespaces/silver/tables/orders")
    assert res["x-lakehouse"]["delete-pending"] is True


def test_views_over_http(served):
    cat, srv = served
    st, vl = _get(f"{srv.url}/v1/namespaces/silver/views")
    assert vl["identifiers"] == [
        {"namespace": ["silver"], "name": "totals"}
    ]
    st, vr = _get(f"{srv.url}/v1/namespaces/silver/views/totals")
    assert vr["metadata"]["current-version-id"] == 1
    rep = vr["metadata"]["versions"][0]["representations"][0]
    assert rep["dialect"] == "spark" and "sum(v)" in rep["sql"]


def test_refs_and_transaction_commit_with_cas(served, spark):
    cat, srv = served
    # refs listing materializes main
    st, refs = _get(f"{srv.url}/v1/refs")
    names = {r["name"]: r for r in refs["refs"]}
    assert names["main"]["type"] == "branch"
    # create a branch + a tag over HTTP
    st, br = _get(
        f"{srv.url}/v1/refs", "POST", {"name": "dev", "type": "branch"}
    )
    assert st == 200 and br["name"] == "dev"
    st, tg = _get(
        f"{srv.url}/v1/refs", "POST", {"name": "rel-1", "type": "tag"}
    )
    assert st == 200
    _, refs2 = _get(f"{srv.url}/v1/refs")
    names2 = {r["name"]: r["type"] for r in refs2["refs"]}
    assert names2 == {"main": "branch", "dev": "branch", "rel-1": "tag"}
    # transaction commit: pin the table's current version on main
    v = cat.table("silver.orders").current_version()
    st, res = _get(
        f"{srv.url}/v1/transactions/commit",
        "POST",
        {
            "ref": "main",
            "updates": {"silver.orders": v},
            "requirements": {"silver.orders": None},  # never pinned yet
        },
    )
    assert st == 200 and res["commit"] >= 1
    _, head = _get(f"{srv.url}/v1/refs/main")
    assert head["pins"] == {"silver.orders": v}
    # CAS failure: stale requirement → 409 CommitFailedException
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(
            f"{srv.url}/v1/transactions/commit",
            "POST",
            {
                "ref": "main",
                "updates": {"silver.orders": v},
                "requirements": {"silver.orders": None},
            },
        )
    assert ei.value.code == 409
    err = json.loads(ei.value.read())
    assert err["error"]["type"] == "CommitFailedException"
    # pinning a nonexistent version is a 400 client error
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(
            f"{srv.url}/v1/transactions/commit",
            "POST",
            {"ref": "main", "updates": {"silver.orders": 999}},
        )
    assert ei.value.code == 400
    # commits over HTTP and the in-package catalog agree
    assert cat.catalog_tip("main") == res["commit"]
    # tags refuse commits
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(
            f"{srv.url}/v1/transactions/commit",
            "POST",
            {"ref": "rel-1", "updates": {"silver.orders": v}},
        )
    assert ei.value.code == 400


def test_server_is_spark_free(tmp_path):
    """The server must be constructible and serve metadata WITHOUT a
    SparkSession in the process — external-engine resolution."""
    import subprocess
    import sys
    import textwrap

    code = textwrap.dedent(
        """
        import json, os, urllib.request, sys
        wh = sys.argv[1]
        os.makedirs(os.path.join(wh, "silver"), exist_ok=True)
        from apache_iceberg_exploration_spark.sources.rest_catalog import (
            RestCatalogServer,
        )
        import pyspark  # imported, but NO session is ever created
        with RestCatalogServer(wh) as srv:
            with urllib.request.urlopen(
                srv.url + "/v1/namespaces", timeout=30
            ) as r:
                body = json.load(r)
        assert body["namespaces"] == [["silver"]], body
        from pyspark.sql import SparkSession
        assert SparkSession.getActiveSession() is None
        print("SPARK_FREE_OK")
        """
    )
    out = subprocess.run(
        [sys.executable, "-c", code, str(tmp_path / "wh")],
        capture_output=True,
        text=True,
        timeout=120,
        cwd="/root/repo",
    )
    assert "SPARK_FREE_OK" in out.stdout, out.stderr[-2000:]


def test_external_writer_commits_over_http(served, spark):
    """The WRITE half of interop: an external writer lands parquet with
    pyarrow only, POSTs a CommitTableRequest (add-files +
    assert-snapshot-id), and the engine sees a normal table commit —
    schema recorded, stats collected, readable alongside engine writes.
    Stale requirements 409; DELETE drops the table."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    cat, srv = served
    wh = cat.warehouse
    # external writer: no engine write API, just files + HTTP
    ext_dir = os.path.join(wh, "silver", "extern", "data", "ext-1")
    os.makedirs(ext_dir)
    f1 = os.path.join(ext_dir, "part-0.parquet")
    pq.write_table(
        pa.table({"k": [1, 2, 3], "v": [10, 20, 30]}), f1
    )
    st, res = _get(
        f"{srv.url}/v1/namespaces/silver/tables/extern",
        "POST",
        {
            "requirements": [
                {"type": "assert-snapshot-id", "snapshot-id": 0}
            ],
            "updates": [{"action": "add-files", "files": [f1]}],
        },
    )
    assert st == 200 and res["snapshot-id"] == 1
    t = cat.table("silver.extern")
    got = sorted((r["k"], r["v"]) for r in t.read().collect())
    assert got == [(1, 10), (2, 20), (3, 30)]
    # stats landed: scan pruning works on the adopted file
    assert t.scan({"k": (2, 3)}).count() == 2
    # second external commit with a STALE requirement → 409
    f2 = os.path.join(ext_dir, "part-1.parquet")
    pq.write_table(pa.table({"k": [4], "v": [40]}), f2)
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(
            f"{srv.url}/v1/namespaces/silver/tables/extern",
            "POST",
            {
                "requirements": [
                    {"type": "assert-snapshot-id", "snapshot-id": 0}
                ],
                "updates": [{"action": "add-files", "files": [f2]}],
            },
        )
    assert ei.value.code == 409
    # correct requirement lands; engine read sees both commits
    st, res = _get(
        f"{srv.url}/v1/namespaces/silver/tables/extern",
        "POST",
        {
            "requirements": [
                {"type": "assert-snapshot-id", "snapshot-id": 1}
            ],
            "updates": [{"action": "add-files", "files": [f2]}],
        },
    )
    assert res["snapshot-id"] == 2
    assert cat.table("silver.extern").read().count() == 4
    # schema drift is refused by the commit kernel (loud 400)
    f3 = os.path.join(ext_dir, "part-2.parquet")
    pq.write_table(pa.table({"k": [9], "nope": ["x"]}), f3)
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(
            f"{srv.url}/v1/namespaces/silver/tables/extern",
            "POST",
            {"updates": [{"action": "add-files", "files": [f3]}]},
        )
    assert ei.value.code == 400
    # unsupported update action is a 400, not a silent no-op
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(
            f"{srv.url}/v1/namespaces/silver/tables/extern",
            "POST",
            {"updates": [{"action": "set-properties"}]},
        )
    assert ei.value.code == 400
    # DELETE drops the table
    req = urllib.request.Request(
        f"{srv.url}/v1/namespaces/silver/tables/extern",
        method="DELETE",
    )
    with urllib.request.urlopen(req, timeout=30) as resp:
        assert resp.status == 204
    st, tl = _get(f"{srv.url}/v1/namespaces/silver/tables")
    assert {i["name"] for i in tl["identifiers"]} == {"orders"}


def test_scan_planning_prunes_files_server_side(spark, tmp_path):
    """POST tables/{t}/plan returns a stats-pruned file subset for
    range filters — the external reader downloads and reads ONLY the
    surviving files (plus its own residual filter), matching the
    engine scan exactly."""
    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("s")
    t = cat.table("s.facts")
    # range-clustered files: stats pruning has real teeth
    df = spark.range(0, 1000).selectExpr(
        "id AS k", "id % 7 AS g", "id * 3 AS v"
    )
    t.append(df.repartitionByRange(8, "k"))
    with RestCatalogServer(cat.warehouse) as srv:
        st, plan = _get(
            f"{srv.url}/v1/namespaces/s/tables/facts/plan",
            "POST",
            {"filters": [{"col": "k", "lo": 100, "hi": 260}]},
        )
        assert st == 200
        assert plan["total-files"] == 8
        assert plan["pruned-files"] >= 5, plan
        assert 0 < len(plan["files"]) < 8
        # client: read the planned subset + residual filter
        got = (
            spark.read.parquet(*plan["files"])
            .where("k BETWEEN 100 AND 260")
            .count()
        )
        assert got == 161
        # open-ended bound + no-filters plan = full list
        st, plan2 = _get(
            f"{srv.url}/v1/namespaces/s/tables/facts/plan",
            "POST",
            {"filters": [{"col": "k", "lo": 900}]},
        )
        assert len(plan2["files"]) <= 2
        st, plan3 = _get(
            f"{srv.url}/v1/namespaces/s/tables/facts/plan", "POST", {}
        )
        assert len(plan3["files"]) == 8
        # unknown column: conservative, keeps everything
        st, plan4 = _get(
            f"{srv.url}/v1/namespaces/s/tables/facts/plan",
            "POST",
            {"filters": [{"col": "nope", "lo": 0, "hi": 1}]},
        )
        assert len(plan4["files"]) == 8
        # missing table → 404
        with pytest.raises(urllib.error.HTTPError) as ei:
            _get(
                f"{srv.url}/v1/namespaces/s/tables/ghost/plan",
                "POST",
                {},
            )
        assert ei.value.code == 404

"""Plain VIEW objects (r10 — VERDICT r9 #6): versioned SQL-view
metadata (Iceberg view spec shape) resolvable through the path
catalog's identifiers, with version history, definition time travel,
view-over-view resolution, and loud failure modes."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from apache_iceberg_exploration_spark.sources.catalog import (
    LakehouseCatalog,
)


@pytest.fixture()
def cat(spark, tmp_path):
    c = LakehouseCatalog(spark, str(tmp_path / "wh"))
    c.create_namespace("silver")
    t = c.table("silver.orders")
    t.append(
        spark.createDataFrame(
            [Row(k=i, g=i % 3, v=i * 10) for i in range(30)]
        ).repartition(2, "k")
    )
    d = c.table("silver.dims")
    d.append(
        spark.createDataFrame(
            [Row(g=0, nm="zero"), Row(g=1, nm="one"), Row(g=2, nm="two")]
        ).repartition(1)
    )
    return c


def test_create_read_and_schema_capture(cat):
    meta = cat.create_view(
        "silver.totals",
        "SELECT g, sum(v) AS total FROM silver.orders GROUP BY g",
    )
    assert meta["current_version_id"] == 1
    assert "total" in meta["versions"][0]["schema"]
    got = {r["g"]: r["total"] for r in cat.view("silver.totals").collect()}
    want = {g: sum(i * 10 for i in range(30) if i % 3 == g) for g in range(3)}
    assert got == want
    # views list separately from tables; tables() is unpolluted
    assert cat.views("silver") == ["totals"]
    assert cat.tables("silver") == ["dims", "orders"]


def test_three_part_identifiers_resolve(cat):
    cat.create_view(
        "silver.j",
        "SELECT nm, count(*) AS n FROM my_catalog.silver.orders o "
        "JOIN my_catalog.silver.dims d ON o.g = d.g GROUP BY nm",
    )
    got = {r["nm"]: r["n"] for r in cat.view("silver.j").collect()}
    assert got == {"zero": 10, "one": 10, "two": 10}


def test_replace_versions_and_definition_time_travel(cat):
    cat.create_view(
        "silver.vv", "SELECT count(*) AS n FROM silver.orders"
    )
    with pytest.raises(ValueError, match="already exists"):
        cat.create_view("silver.vv", "SELECT 1 AS n")
    cat.create_view(
        "silver.vv",
        "SELECT count(*) AS n FROM silver.orders WHERE g = 0",
        replace=True,
    )
    assert cat.view("silver.vv").collect()[0]["n"] == 10
    # definition time travel: version 1 still reads (against CURRENT data)
    assert cat.view("silver.vv", version=1).collect()[0]["n"] == 30
    hist = cat.view_versions("silver.vv").collect()
    assert [(r["version_id"], r["is_current"]) for r in hist] == [
        (1, False),
        (2, True),
    ]
    # the view sees table mutations immediately (it is NOT materialized)
    t = cat.table("silver.orders")
    t.append(
        cat.spark.createDataFrame([Row(k=100, g=0, v=1)]).repartition(1)
    )
    assert cat.view("silver.vv").collect()[0]["n"] == 11


def test_view_over_view_and_cycle_guard(cat):
    cat.create_view(
        "silver.base_v",
        "SELECT g, v FROM silver.orders WHERE v >= 100",
    )
    cat.create_view(
        "silver.top_v",
        "SELECT g, count(*) AS n FROM silver.base_v GROUP BY g",
    )
    got = {r["g"]: r["n"] for r in cat.view("silver.top_v").collect()}
    want: dict = {}
    for i in range(30):
        if i * 10 >= 100:
            want[i % 3] = want.get(i % 3, 0) + 1
    assert got == want
    # a cycle (self-reference after replace) fails loudly, not forever
    cat.create_view(
        "silver.base_v",
        "SELECT g, v FROM silver.base_v",
        replace=True,
    )
    with pytest.raises(Exception, match="cycle"):
        cat.view("silver.base_v").collect()


def test_failure_modes(cat):
    # bad SQL fails at CREATE (analysis happens eagerly)
    with pytest.raises(Exception):
        cat.create_view(
            "silver.bad", "SELECT nope FROM silver.orders"
        )
    assert "bad" not in cat.views("silver")
    # view name colliding with a table is refused
    with pytest.raises(ValueError, match="is a TABLE"):
        cat.create_view("silver.orders", "SELECT 1 AS x")
    # drop works and a second drop fails loudly
    cat.create_view("silver.tmp", "SELECT 1 AS x")
    cat.drop_view("silver.tmp")
    with pytest.raises(ValueError, match="no view"):
        cat.drop_view("silver.tmp")
    # reading a missing version fails with the history range
    cat.create_view("silver.v1", "SELECT 1 AS x")
    with pytest.raises(ValueError, match="history: 1..1"):
        cat.view("silver.v1", version=9)


def test_string_literals_and_foreign_catalogs_not_rewritten(cat):
    """ADVICE r10: identifiers inside quoted string literals must NOT
    be rewritten to temp-view names, and a 3-part identifier with a
    FOREIGN catalog prefix must not silently alias into this catalog."""
    cat.create_view(
        "silver.lit",
        "SELECT g, 'silver.orders' AS src, count(*) AS n "
        "FROM silver.orders GROUP BY g",
    )
    rows = cat.view("silver.lit").collect()
    assert {r["src"] for r in rows} == {"silver.orders"}
    assert sum(r["n"] for r in rows) == 30
    # foreign-catalog identifier: NOT adopted — resolution fails loudly
    # (Spark cannot resolve other_catalog.silver.orders) instead of
    # silently reading this catalog's table
    with pytest.raises(Exception):
        cat.create_view(
            "silver.foreign",
            "SELECT count(*) AS n FROM other_catalog.silver.orders",
        )
    # and catalog.table() refuses foreign prefixes outright
    with pytest.raises(ValueError, match="unknown catalog"):
        cat.table("other_catalog.silver.orders")

"""Structural invariants + plan shape for the graph / privacy /
attribution families (oracle parity is covered by test_oracle_parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_iceberg_exploration_spark.functions.hashing import hash64
from apache_iceberg_exploration_spark.operators.attribution import (
    attribution_ushaped_credit,
)
from apache_iceberg_exploration_spark.operators.graph import (
    PR_SCALE,
    graph_pagerank_cosupply,
    graph_triangle_count_topk,
)
from apache_iceberg_exploration_spark.operators.privacy import (
    privacy_k_anonymity_audit,
)
from apache_iceberg_exploration_spark.plans.explain import executed_plan
from apache_iceberg_exploration_spark.sources.io import load_table

from .conftest import SF_ORACLE


def test_pagerank_mass_conserved_and_broadcast(spark):
    df = graph_pagerank_cosupply(spark, SF_ORACLE)
    rows = df.collect()
    total = sum(r.rank_ppb for r in rows)
    # floor-division loses < 1 unit per edge contribution and < 1 per
    # node update; mass stays within a fraction of a percent of SCALE
    assert 0.97 * PR_SCALE < total <= PR_SCALE
    assert all(r.rank_ppb > 0 for r in rows)
    # the rank vector must be broadcast into the contribution join —
    # the O(V) side never shuffles the O(E) edge list
    assert "BroadcastHashJoin" in executed_plan(df)


def test_triangle_corner_counts_sum_to_multiple_of_three(spark):
    df = graph_triangle_count_topk(spark, SF_ORACLE)
    rows = df.collect()
    assert rows, "sparsified graph lost every node"
    assert sum(r.n_triangles for r in rows) % 3 == 0
    assert all(r.n_triangles >= 0 for r in rows)
    supp = {
        r.l_suppkey
        for r in load_table(spark, SF_ORACLE, "lineitem")
        .select("l_suppkey")
        .distinct()
        .collect()
    }
    assert {r.suppkey for r in rows} <= supp


def test_k_anonymity_classes_are_below_k(spark):
    rows = privacy_k_anonymity_audit(spark, SF_ORACLE).collect()
    assert rows and all(0 < r.class_size < 5 for r in rows)


def test_pseudonymization_collision_free(spark):
    cust = load_table(spark, SF_ORACLE, "customer")
    n = cust.select("c_custkey").distinct().count()
    np = cust.select(
        hash64(
            F.concat(F.lit("tenant-7f3a|c|"), F.col("c_custkey").cast("string"))
        ).alias("p")
    ).distinct().count()
    assert n == np


def test_attribution_positions_and_totals(spark):
    rows = attribution_ushaped_credit(spark, SF_ORACLE).collect()
    assert {r.event_type for r in rows} <= {"view", "click"}
    assert {r.position for r in rows} == {"only", "first", "middle", "last"}
    assert all(r.attributed_cents >= 0 and r.n_touches > 0 for r in rows)
    # middles earn strictly less than the 40% endpoints in aggregate
    by_pos = {}
    for r in rows:
        by_pos[r.position] = by_pos.get(r.position, 0) + r.attributed_cents
    assert by_pos["middle"] < by_pos["first"] + by_pos["last"]


def test_connected_components_star_deep_path_and_random(spark):
    """The alternating large-star/small-star CC (r4 verdict #5) must
    handle component diameter far beyond any fixed propagation bound:
    a 120-node PATH (diameter 119 — the old 30-round min-label loop
    raised on this) converges and labels every node with the path's
    minimum.  A random graph with isolated nodes cross-checks against
    a driver-side union-find oracle."""
    import random

    from apache_iceberg_exploration_spark.operators.dedup import (
        connected_components_star,
    )

    # path 0-1-...-119 plus a separate pair and two isolated nodes
    path_edges = [(i, i + 1) for i in range(119)]
    extra = [(500, 501)]
    nodes = list(range(120)) + [500, 501, 900, 901]
    ndf = spark.createDataFrame([(n,) for n in nodes], "n long")
    edf = spark.createDataFrame(path_edges + extra, "a long, b long")
    got = {
        r.n: r.lbl for r in connected_components_star(ndf, edf).collect()
    }
    assert all(got[i] == 0 for i in range(120))
    assert got[500] == 500 and got[501] == 500
    assert got[900] == 900 and got[901] == 901

    # randomized cross-check vs union-find
    rng = random.Random(1234)
    n = 300
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(260)
    ]
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {x: find(x) for x in range(n)}
    # canonicalize to component minimum
    comp_min = {}
    for x, r in expect.items():
        comp_min[r] = min(comp_min.get(r, x), x)
    expect = {x: comp_min[r] for x, r in expect.items()}

    ndf = spark.createDataFrame([(i,) for i in range(n)], "n long")
    edf = spark.createDataFrame(edges, "a long, b long")
    got = {
        r.n: r.lbl for r in connected_components_star(ndf, edf).collect()
    }
    assert got == expect


def test_shapley_efficiency_axiom(spark):
    """Σ_i φ_i = v(full) − v(∅) exactly (the Shapley efficiency axiom,
    in ×24 integer units): total credit distributed over the four
    channels equals the conversions that involved any channel at all
    (converting journeys minus the purchase-only ones)."""
    from pyspark.sql import functions as F

    from apache_iceberg_exploration_spark.operators.attribution import (
        attribution_shapley_credit,
    )
    from apache_iceberg_exploration_spark.sources.io import load_table

    phi = attribution_shapley_credit(spark, SF_ORACLE)
    total_x24 = phi.agg(F.sum("phi_x24")).first()[0]

    ev = load_table(spark, SF_ORACLE, "events")
    j = ev.groupBy("user_id", F.col("ts").cast("date")).agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv"),
        F.max(
            F.when(F.col("event_type") != "purchase", 1).otherwise(0)
        ).alias("touched"),
    )
    v_full = j.filter("conv = 1").count()
    v_empty = j.filter("conv = 1 AND touched = 0").count()
    assert total_x24 == 24 * (v_full - v_empty)
    assert phi.count() == 4  # every channel earns a row

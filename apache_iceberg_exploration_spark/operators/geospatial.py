"""Geospatial grid operators: ε-neighbor join and grid DBSCAN.

A family the reference has no trace of (SURVEY.md §2 names only
relational/lakehouse planes) but that any 100 TB event pipeline with a
location column needs: "find the neighbors of every point within ε"
and "cluster the density blobs" WITHOUT the O(n²) cross join.

The scale pattern is the classic spatial grid bucketing (the same idea
as Sedona/GeoMesa partitioning and Uber's H3 bucketing): quantize
coordinates to an integer grid of cell size ε, explode each QUERY point
to its 3×3 neighbor cells, and equi-join probe cells to data cells —
every candidate pair shares a cell key, so the join is a plain shuffled
(or broadcast) hash join whose fan-out is bounded by local density,
never by n². The ε-ball test then runs on the candidates only.

Coordinates here are synthesized deterministically from the customer
key with two MINSTD LCG multipliers — standing in for a real lat/lon
pair quantized to integer units (production geo pipelines quantize to
fixed precision anyway, e.g. the E7 integer-degree format), so every
comparison below is exact BIGINT arithmetic and the DuckDB oracles
hash-match to the last unit.

DBSCAN (Ester et al., KDD'96) on top of the grid join: a point is
*core* if its ε-ball holds ≥ min_pts points (self included), *border*
if it is not core but some core point sees it, else *noise*. Clusters
are the connected components of the core-core ε-graph (borders adopt
the smallest adjacent core's component, the deterministic tie-break);
components run on the alternating large-star/small-star kernel shared
with the dedup family (operators/dedup.py:connected_components_star) —
diameter-independent, no driver-side graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.caching import scoped_persist
from ..registry import query
from ..sources.io import load_table
from .dedup import connected_components_star

# LCG-hash pseudo-coords: multiply-add then wrap mod 2^31-1 BEFORE
# folding into the box. A plain (k*m) % box puts keys on a regular
# sublattice (every ε-ball holds the same 5-6 points — a degenerate,
# meaningless DBSCAN input); the wrap-around makes the scatter
# Poisson-like. All BIGINT-exact: k * 2654435761 stays < 2^63 up to
# ~3.5e9 keys.
GRID_MULT_X = 1103515245  # glibc LCG
GRID_ADD_X = 12345
GRID_MULT_Y = 2654435761  # Knuth multiplicative hash
GRID_ADD_Y = 98765
GRID_WRAP = 2147483647  # 2^31 - 1
GRID_BOX = 4000  # world box side, integer units
DBSCAN_EPS = 120  # ε, same units
DBSCAN_MIN_PTS = 7  # core threshold — ε-ball population, self included
# (ε-ball density at the sf0.01 oracle scale averages ~5: min_pts 7
# yields a genuine core/border/noise mix — a lower bar labels ~98%
# core and the classification green would prove little)


# shared oracle CTEs: points, grid cells, ε-candidate pairs (the oracle
# may use the lazy BETWEEN range join; the Spark side uses the explicit
# 9-cell explode + equi-join, i.e. the plan that scales)
_PTS_SQL = f"""
    pts AS (
        SELECT c_custkey AS pid,
               ((c_custkey * {GRID_MULT_X} + {GRID_ADD_X})
                % {GRID_WRAP}) % {GRID_BOX} AS x,
               ((c_custkey * {GRID_MULT_Y} + {GRID_ADD_Y})
                % {GRID_WRAP}) % {GRID_BOX} AS y
        FROM customer
    ),
    cells AS (
        SELECT pid, x, y, x // {DBSCAN_EPS} AS cx, y // {DBSCAN_EPS} AS cy
        FROM pts
    ),
    pairs AS (
        SELECT a.pid AS pa, b.pid AS pb
        FROM cells a JOIN cells b
          ON b.cx BETWEEN a.cx - 1 AND a.cx + 1
         AND b.cy BETWEEN a.cy - 1 AND a.cy + 1
         AND (a.x - b.x) * (a.x - b.x)
             + (a.y - b.y) * (a.y - b.y) <= {DBSCAN_EPS * DBSCAN_EPS}
    ),
    counts AS (
        SELECT pa AS pid, count(*) AS n_in_eps FROM pairs GROUP BY pa
    ),
    labeled AS (
        SELECT p.pid, p.x, p.y, c.n_in_eps,
               c.n_in_eps >= {DBSCAN_MIN_PTS} AS is_core
        FROM pts p JOIN counts c ON p.pid = c.pid
    ),
    border AS (
        SELECT DISTINCT p.pa AS pid
        FROM pairs p
        JOIN labeled c ON p.pb = c.pid AND c.is_core
        WHERE p.pa <> p.pb
    )
"""


def _grid_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(pid, x, y, cx, cy) — integer coords + ε-sized grid cell."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("pid"),
        (
            (F.col("c_custkey") * GRID_MULT_X + GRID_ADD_X)
            % GRID_WRAP
            % GRID_BOX
        ).alias("x"),
        (
            (F.col("c_custkey") * GRID_MULT_Y + GRID_ADD_Y)
            % GRID_WRAP
            % GRID_BOX
        ).alias("y"),
    ).selectExpr(
        "pid",
        "x",
        "y",
        f"x div {DBSCAN_EPS} AS cx",
        f"y div {DBSCAN_EPS} AS cy",
    )


def eps_neighbor_pairs(points: DataFrame, eps: int) -> DataFrame:
    """ε-candidate pairs via the 9-cell grid probe.

    ``points``: (pid, x, y, cx, cy) with cell size == eps. Each query
    point explodes to its 3×3 neighborhood of cell keys; candidates
    come from a plain equi-join on the cell key, then the exact
    integer ε-ball test. Self-pairs are KEPT (DBSCAN counts the point
    itself); output is (pa, pb) with pa the query point.

    At 100 TB the equi-join shuffles on (gx, gy) — density-bounded
    fan-out, AQE splits any hot cell, and a city-scale hot spot is a
    data problem (shrink ε / sub-split cells), not a plan problem.
    """
    probes = points.select(
        F.col("pid").alias("pa"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        F.explode(
            F.expr(
                "transform(sequence(0, 8), i -> "
                "struct(cx + i div 3 - 1 AS gx, cy + i % 3 - 1 AS gy))"
            )
        ).alias("g"),
    ).select("pa", "xa", "ya", "g.gx", "g.gy")
    data = points.select(
        F.col("pid").alias("pb"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.col("cx").alias("gx"),
        F.col("cy").alias("gy"),
    )
    d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    return (
        probes.join(data, ["gx", "gy"])
        .filter(d2 <= eps * eps)
        .select("pa", "pb")
    )


def dbscan_label_points(
    points: DataFrame, eps: int, min_pts: int
) -> DataFrame:
    """Grid-DBSCAN core/border/noise labeling over (pid, x, y, cx, cy).

    Returns (pid, x, y, n_in_eps, cls) — every input point appears
    exactly once (never a vacuous empty result). Two passes over the
    persisted candidate pairs: the ε-ball census, then the
    border-of-a-core probe.
    """
    pairs = scoped_persist(eps_neighbor_pairs(points, eps))
    counts = pairs.groupBy("pa").agg(F.count("*").alias("n_in_eps"))
    labeled = points.join(
        counts, points["pid"] == counts["pa"]
    ).select(
        "pid", "x", "y", "n_in_eps",
        (F.col("n_in_eps") >= min_pts).alias("is_core"),
    )
    cores = labeled.filter("is_core").select(F.col("pid").alias("pb"))
    border = (
        pairs.filter(F.col("pa") != F.col("pb"))
        .join(cores, "pb")
        .select(F.col("pa").alias("pid"))
        .distinct()
        .withColumn("near_core", F.lit(True))
    )
    return labeled.join(border, "pid", "left").select(
        "pid",
        "x",
        "y",
        "n_in_eps",
        F.when(F.col("is_core"), "core")
        .when(F.col("near_core"), "border")
        .otherwise("noise")
        .alias("cls"),
    )


@query(
    "spatial_grid_dbscan_labels",
    oracle=f"""
        WITH {_PTS_SQL.strip()}
        SELECT l.pid AS point_id, l.x, l.y, l.n_in_eps,
               CASE WHEN l.is_core THEN 'core'
                    WHEN b.pid IS NOT NULL THEN 'border'
                    ELSE 'noise' END AS cls
        FROM labeled l LEFT JOIN border b ON l.pid = b.pid
    """,
)
def spatial_grid_dbscan_labels(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Grid-bucketed ε-neighbor census + DBSCAN point classification.

    The reference has no spatial plane (SURVEY.md §2); this is the
    bucketed neighbor-join primitive a geo event table needs at scale.
    All-integer arithmetic — pseudo-coords, squared distances, counts —
    so the DuckDB oracle (which uses the lazy BETWEEN form of the same
    candidate relation) hash-matches exactly.
    """
    pts = _grid_points(spark, sf_dir)
    return dbscan_label_points(pts, DBSCAN_EPS, DBSCAN_MIN_PTS).select(
        F.col("pid").alias("point_id"), "x", "y", "n_in_eps", "cls"
    )


@query(
    "spatial_dbscan_clusters",
    oracle=f"""
        WITH RECURSIVE {_PTS_SQL.strip()},
        cedges AS (
            SELECT p.pa AS a, p.pb AS b
            FROM pairs p
            JOIN labeled ca ON p.pa = ca.pid AND ca.is_core
            JOIN labeled cb ON p.pb = cb.pid AND cb.is_core
            WHERE p.pa <> p.pb
        ),
        cc(n, lbl) AS (
            SELECT pid, pid FROM labeled WHERE is_core
            UNION
            SELECT e.b, cc.lbl FROM cc JOIN cedges e
              ON e.a = cc.n AND cc.lbl < e.b
        ),
        comp AS (SELECT n, min(lbl) AS lbl FROM cc GROUP BY n),
        border_lbl AS (
            SELECT p.pa AS pid, min(comp.lbl) AS lbl
            FROM pairs p
            JOIN labeled c ON p.pb = c.pid AND c.is_core
            JOIN comp ON comp.n = p.pb
            WHERE p.pa <> p.pb
            GROUP BY p.pa
        )
        SELECT l.pid AS point_id,
               CASE WHEN l.is_core THEN 'core'
                    WHEN b.pid IS NOT NULL THEN 'border'
                    ELSE 'noise' END AS cls,
               CASE WHEN l.is_core THEN comp.lbl
                    WHEN b.pid IS NOT NULL THEN b.lbl
                    ELSE -1 END AS cluster_id
        FROM labeled l
        LEFT JOIN comp ON comp.n = l.pid
        LEFT JOIN border_lbl b ON b.pid = l.pid
    """,
)
def spatial_dbscan_clusters(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Full grid DBSCAN: density clusters as connected components of
    the core-core ε-graph (alternating-star kernel — dedup.py), with
    border points adopting the SMALLEST adjacent core's component (the
    deterministic tie-break; textbook DBSCAN leaves border assignment
    order-dependent) and noise at cluster_id = -1.

    The oracle recomputes components with DuckDB's UNION-dedup
    recursive CTE (min-label propagation with the lbl < node pruning
    guard — the smallest label survives to every member, so min(lbl)
    per node is the component id). Spark's own recursive CTE cannot do
    this (UNION ALL only, memory: spark-recursion), hence the star
    kernel on the engine side.
    """
    pts = _grid_points(spark, sf_dir)
    pairs = scoped_persist(
        eps_neighbor_pairs(pts, DBSCAN_EPS)
    )
    counts = pairs.groupBy("pa").agg(F.count("*").alias("n_in_eps"))
    labeled = scoped_persist(
        pts.join(counts, pts["pid"] == counts["pa"]).select(
            "pid", (F.col("n_in_eps") >= DBSCAN_MIN_PTS).alias("is_core")
        )
    )
    cores = labeled.filter("is_core").select("pid")
    nonself = pairs.filter(F.col("pa") != F.col("pb"))
    cedges = (
        nonself.join(cores.withColumnRenamed("pid", "pa"), "pa")
        .join(cores.withColumnRenamed("pid", "pb"), "pb")
        .select(F.col("pa").alias("a"), F.col("pb").alias("b"))
    )
    comp = connected_components_star(
        cores.withColumnRenamed("pid", "n"), cedges
    )  # (n, lbl): lbl = min node id in the core component
    border_lbl = (
        nonself.join(cores.withColumnRenamed("pid", "pb"), "pb")
        .join(comp, nonself["pb"] == comp["n"])
        .groupBy("pa")
        .agg(F.min("lbl").alias("blbl"))
    )
    return (
        labeled.join(comp, labeled["pid"] == comp["n"], "left")
        .join(border_lbl, labeled["pid"] == border_lbl["pa"], "left")
        .select(
            F.col("pid").alias("point_id"),
            F.when(F.col("is_core"), "core")
            .when(F.col("blbl").isNotNull(), "border")
            .otherwise("noise")
            .alias("cls"),
            F.when(F.col("is_core"), F.col("lbl"))
            .when(F.col("blbl").isNotNull(), F.col("blbl"))
            .otherwise(F.lit(-1))
            .cast("long")
            .alias("cluster_id"),
        )
    )

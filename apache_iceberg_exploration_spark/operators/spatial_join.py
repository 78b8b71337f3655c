"""Distributed grid-partitioned spatial join (r9, VERDICT r8 #5).

The engine's point-in-polygon join broadcasts the polygon side
(geotable.py — right for admin-boundaries-vs-points). This module adds
the LARGE-LARGE shape: neither side fits in a broadcast, so both sides
key to fixed grid cells — each geometry's envelope covers a bounded
set of cells, each point exactly one — and the join becomes a plain
shuffled EQUI-join on the cell key followed by the exact residual
predicate. This is the classic Partition-Based Spatial-Merge join
(PBSM, Patel & DeWitt SIGMOD'96), the standard scale-out spatial join
in Sedona/PostGIS-parallel.

Pair-dedup is BY CONSTRUCTION free here: a (point, box) pair can meet
only in the point's single cell, so no distinct pass is needed (the
general polygon-polygon case dedups on a canonical cell — the
envelope-intersection's min cell).

Skew (SCALE.md r9): a viral cell (city-center density) serializes one
task. Mitigations compose with this plan untouched: finer cells bound
per-cell fan-out, AQE skew-join splitting handles moderate hot cells,
and salting the point side within a hot cell handles extremes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.io import load_table
from .geospatial import (
    GRID_ADD_X,
    GRID_ADD_Y,
    GRID_BOX,
    GRID_MULT_X,
    GRID_MULT_Y,
    GRID_WRAP,
)
from .geotable import _PTS_SQL, _cust_points

CELL = 40  # grid cell side; boxes are ≤31 wide → ≤2 cells per axis

# order-keyed boxes: LCG centers (salted differently from the customer
# points so the two clouds are independent), half-side 3..15
_BOX_SQL = f"""
    boxes AS (
        SELECT o_orderkey AS oid,
               ((o_orderkey * {GRID_MULT_Y} + {GRID_ADD_X})
                % {GRID_WRAP}) % {GRID_BOX} AS ox,
               ((o_orderkey * {GRID_MULT_X} + {GRID_ADD_Y})
                % {GRID_WRAP}) % {GRID_BOX} AS oy,
               o_orderkey % 13 + 3 AS h
        FROM orders
    )
"""


def _boxes(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("oid")
    )
    return o.select(
        "oid",
        ((F.col("oid") * GRID_MULT_Y + GRID_ADD_X) % GRID_WRAP % GRID_BOX).alias(
            "ox"
        ),
        ((F.col("oid") * GRID_MULT_X + GRID_ADD_Y) % GRID_WRAP % GRID_BOX).alias(
            "oy"
        ),
        (F.col("oid") % 13 + 3).alias("h"),
    )


@query(
    "geo_grid_partitioned_spatial_join",
    oracle=f"""
        WITH {_PTS_SQL}, {_BOX_SQL},
        covered AS (
            SELECT b.oid, b.ox, b.oy, b.h, cx.cx, cy.cy
            FROM boxes b,
                 unnest(generate_series((b.ox - b.h) // {CELL},
                                        (b.ox + b.h) // {CELL})) AS cx(cx),
                 unnest(generate_series((b.oy - b.h) // {CELL},
                                        (b.oy + b.h) // {CELL})) AS cy(cy)
        )
        SELECT p.seg,
               count(*) AS n_pairs,
               CAST(sum(p.k + c.oid) AS BIGINT) AS key_sum
        FROM pts p
        JOIN covered c
          ON p.x // {CELL} = c.cx AND p.y // {CELL} = c.cy
         AND abs(p.x - c.ox) <= c.h AND abs(p.y - c.oy) <= c.h
        GROUP BY 1
    """,
)
def geo_grid_partitioned_spatial_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Large-large spatial join WITHOUT a broadcast: customer points
    (one grid cell each) equi-join order envelope boxes (≤4 covered
    cells each, exploded) on the cell key, then the exact containment
    residual — a shuffle on (cell_x, cell_y) instead of an
    all-pairs cross. The oracle computes the SAME grid cover in SQL
    (integer `//` division truncation verified identical across
    engines), so the hash match pins both the cover arithmetic and
    the residual.

    Scale: cost is |points| + Σ|covered cells| shuffled once, plus
    per-cell products bounded by cell density — at 10^9 points and
    10^8 boxes this plan runs where the broadcast shape cannot. AQE
    splits hot cells; CELL trades fan-out (smaller = more duplicate
    box rows) against per-cell product (larger = denser cells)."""
    pts = _cust_points(spark, sf_dir).select(
        "k",
        "seg",
        "x",
        "y",
        F.expr(f"x div {CELL}").alias("cx"),
        F.expr(f"y div {CELL}").alias("cy"),
    )
    cover = _boxes(spark, sf_dir).select(
        "oid",
        "ox",
        "oy",
        "h",
        F.explode(
            F.sequence(
                F.expr(f"(ox - h) div {CELL}"),
                F.expr(f"(ox + h) div {CELL}"),
            )
        ).alias("cx"),
    ).select(
        "*",
        F.explode(
            F.sequence(
                F.expr(f"(oy - h) div {CELL}"),
                F.expr(f"(oy + h) div {CELL}"),
            )
        ).alias("cy"),
    )
    pairs = pts.join(cover, on=["cx", "cy"], how="inner").filter(
        (F.abs(F.col("x") - F.col("ox")) <= F.col("h"))
        & (F.abs(F.col("y") - F.col("oy")) <= F.col("h"))
    )
    out = pairs.groupBy("seg").agg(
        F.count("*").alias("n_pairs"),
        F.sum(F.col("k") + F.col("oid")).cast("long").alias("key_sum"),
    )
    return out.localCheckpoint(eager=True)

"""Geometry columns in lakehouse tables (Iceberg v3 geo types) —
registered queries with exact DuckDB oracles.

The lakehouse stores geometry as WKB binary (functions/geo.py) with
per-file envelope stats (``__geo_*`` shreds, sources/lakehouse.py
``_add_geo_shreds``); ``scan(geo_bbox=...)`` file-skips on them. The
reference pins iceberg-spark-runtime 1.4/1.5 (docker/Dockerfile:14,23),
predating v3 geo types; these queries exercise the spec semantics on
the from-scratch layer — the v3 pillar beside row lineage (r6),
deletion vectors (r7), and default values (r8).

Oracle strategy: coordinates are the geospatial family's BIGINT LCG
pseudo-coords (operators/geospatial.py:49 — exact in both engines), so
a value-hash match on coordinates DECODED FROM STORED WKB proves the
encode → parquet → decode round trip bit-exactly; the oracles compute
the same coordinates arithmetically, never touching WKB.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.geo import st_point, st_polygon, st_ring, st_x, st_y
from ..registry import query
from ..sources.io import load_table
from ..sources.lakehouse import LakehouseTable
from .geospatial import (
    GRID_ADD_X,
    GRID_ADD_Y,
    GRID_BOX,
    GRID_MULT_X,
    GRID_MULT_Y,
    GRID_WRAP,
)

_BAND = GRID_BOX // 4  # four spatial band files over the x axis


def _scratch() -> str:
    return tempfile.mkdtemp(prefix="lakehouse_geo_", dir="/tmp")


def _materialize(out):
    return out.localCheckpoint(eager=True)


def _cust_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(k, seg, x, y) — customer keys with LCG pseudo-coords (BIGINT
    exact, so WKB round trips and DuckDB recomputations hash-match)."""
    return load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.col("c_mktsegment").alias("seg"),
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
    )


_PTS_SQL = f"""
    pts AS (
        SELECT c_custkey AS k,
               c_mktsegment AS seg,
               ((c_custkey * {GRID_MULT_X} + {GRID_ADD_X})
                % {GRID_WRAP}) % {GRID_BOX} AS x,
               ((c_custkey * {GRID_MULT_Y} + {GRID_ADD_Y})
                % {GRID_WRAP}) % {GRID_BOX} AS y
        FROM customer
    )
"""


def _point_table(
    spark: SparkSession, sf_dir: str, root: str
) -> LakehouseTable:
    """Geometry table laid out as four spatially disjoint x-band files
    (deterministic band appends, one file each — the layout
    ``scan(geo_bbox=...)`` pruning assertions rely on; round-robin
    splits would make file contents load-dependent)."""
    tbl = LakehouseTable(spark, root + "/pts")
    pts = _cust_points(spark, sf_dir)
    geo = pts.select(
        "k",
        "seg",
        st_point(
            F.col("x").cast("double"), F.col("y").cast("double")
        ).alias("geom"),
    )
    band = (F.col("x") / _BAND).cast("int")
    first = geo.filter(band == 0).coalesce(1).sortWithinPartitions("k")
    tbl.overwrite(first, geo_cols=["geom"])
    for b in (1, 2, 3):
        tbl.append(
            geo.filter(band == b).coalesce(1).sortWithinPartitions("k")
        )
    return tbl


@query(
    "lakehouse_geo_bbox_pruned_scan",
    oracle=f"""
        WITH {_PTS_SQL}
        SELECT seg,
               count(*) AS n_pts,
               CAST(sum(x) AS BIGINT) AS x_sum,
               CAST(sum(y) AS BIGINT) AS y_sum
        FROM pts
        WHERE x BETWEEN {_BAND // 2} AND {_BAND + _BAND // 2}
        GROUP BY seg
    """,
)
def lakehouse_geo_bbox_pruned_scan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Envelope-pruned geometry scan (Iceberg v3 geo stats): points are
    stored as WKB with per-file bounding boxes in the manifest; a query
    window straddling the first two of four x-band files plans exactly
    those two (asserted), and the residual runs JVM-side on the shred
    columns — the WKB bytes are only decoded for the result's
    coordinate sums, which the oracle recomputes arithmetically.

    Scale: file skipping is O(files) driver metadata; on a 10^6-file
    geo table a city-sized window opens only the files whose envelope
    intersects it — the Sedona/GeoMesa partition-pruning behavior on a
    plain lakehouse manifest.
    """
    root = _scratch()
    try:
        tbl = _point_table(spark, sf_dir, root)
        window = (_BAND // 2, 0, _BAND + _BAND // 2, GRID_BOX)
        hit = tbl.scan(geo_bbox={"geom": window})
        assert len(hit.inputFiles()) == 2, "geo bbox pruning failed"
        out = (
            hit.select(
                "seg",
                st_x("geom").cast("long").alias("x"),
                st_y("geom").cast("long").alias("y"),
            )
            .groupBy("seg")
            .agg(
                F.count("*").alias("n_pts"),
                F.sum("x").alias("x_sum"),
                F.sum("y").alias("y_sum"),
            )
        )
        return _materialize(out)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# triangle vertices: three LCG draws per nation key, salted by 3k+j —
# same arithmetic in both engines, degenerate (zero-area) triangles
# excluded identically
def _tri_coord(expr: str, mult: int, add: int) -> str:
    return f"((({expr}) * {mult} + {add}) % {GRID_WRAP}) % {GRID_BOX}"


_TRI_SQL = f"""
    tri AS (
        SELECT n_nationkey AS tid,
               {_tri_coord('CAST(n_nationkey AS BIGINT) * 3 +1', GRID_MULT_X, GRID_ADD_X)} AS a_x,
               {_tri_coord('CAST(n_nationkey AS BIGINT) * 3 +1', GRID_MULT_Y, GRID_ADD_Y)} AS a_y,
               {_tri_coord('CAST(n_nationkey AS BIGINT) * 3 +2', GRID_MULT_X, GRID_ADD_X)} AS b_x,
               {_tri_coord('CAST(n_nationkey AS BIGINT) * 3 +2', GRID_MULT_Y, GRID_ADD_Y)} AS b_y,
               {_tri_coord('CAST(n_nationkey AS BIGINT) * 3 +3', GRID_MULT_X, GRID_ADD_X)} AS c_x,
               {_tri_coord('CAST(n_nationkey AS BIGINT) * 3 +3', GRID_MULT_Y, GRID_ADD_Y)} AS c_y
        FROM nation
    ),
    live_tri AS (
        SELECT * FROM tri
        WHERE (b_x - a_x) * (c_y - a_y) - (b_y - a_y) * (c_x - a_x) <> 0
    )
"""


@query(
    "lakehouse_geo_point_in_polygon_join",
    oracle=f"""
        WITH {_PTS_SQL}, {_TRI_SQL},
        signs AS (
            SELECT t.tid, p.k,
                   (t.b_x - t.a_x) * (p.y - t.a_y)
                   - (t.b_y - t.a_y) * (p.x - t.a_x) AS d1,
                   (t.c_x - t.b_x) * (p.y - t.b_y)
                   - (t.c_y - t.b_y) * (p.x - t.b_x) AS d2,
                   (t.a_x - t.c_x) * (p.y - t.c_y)
                   - (t.a_y - t.c_y) * (p.x - t.c_x) AS d3
            FROM live_tri t, pts p
        )
        SELECT tid,
               count(*) AS n_inside,
               CAST(sum(k) AS BIGINT) AS key_sum
        FROM signs
        WHERE (d1 >= 0 AND d2 >= 0 AND d3 >= 0)
           OR (d1 <= 0 AND d2 <= 0 AND d3 <= 0)
        GROUP BY tid
    """,
)
def lakehouse_geo_point_in_polygon_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Point-in-polygon spatial join against STORED polygon geometry:
    25 nation triangles are written as WKB polygons in a geometry
    table, read back, and their vertices DECODED from the ring bytes
    (``st_ring``); containment is three half-plane sign tests on exact
    BIGINT coordinates — all JVM-side arithmetic after the one
    Arrow-batched ring decode of a 25-row broadcast side.

    Scale: the polygon side is tiny and broadcast (the common
    shape — admin boundaries vs billions of points); the point side
    never shuffles. Fan-out is |polygons| per point before the sign
    filter; production layouts bbox-bucket the polygon side first —
    the envelope shreds this table stores are exactly that key.
    """
    root = _scratch()
    try:
        nat = load_table(spark, sf_dir, "nation").select(
            # int32 in the parquet — widen BEFORE the LCG multiply
            # (ANSI mode overflows 32-bit arithmetic loudly)
            F.col("n_nationkey").cast("long").alias("tid")
        )

        def coord(salt: int, mult: int, add: int):
            return (
                (F.col("tid") * 3 + salt) * mult + add
            ) % GRID_WRAP % GRID_BOX

        verts = nat.select(
            "tid",
            coord(1, GRID_MULT_X, GRID_ADD_X).alias("a_x"),
            coord(1, GRID_MULT_Y, GRID_ADD_Y).alias("a_y"),
            coord(2, GRID_MULT_X, GRID_ADD_X).alias("b_x"),
            coord(2, GRID_MULT_Y, GRID_ADD_Y).alias("b_y"),
            coord(3, GRID_MULT_X, GRID_ADD_X).alias("c_x"),
            coord(3, GRID_MULT_Y, GRID_ADD_Y).alias("c_y"),
        )
        tbl = LakehouseTable(spark, root + "/tri")
        tbl.overwrite(
            verts.select(
                "tid",
                st_polygon(
                    F.array(
                        *[
                            F.col(c).cast("double")
                            for c in ("a_x", "a_y", "b_x", "b_y", "c_x", "c_y")
                        ]
                    )
                ).alias("tri"),
            ).coalesce(1),
            geo_cols=["tri"],
        )
        ring = tbl.read().select(
            "tid", st_ring("tri").alias("r")
        )
        tri = ring.select(
            "tid",
            *[
                F.element_at("r", i + 1).cast("long").alias(c)
                for i, c in enumerate(
                    ("a_x", "a_y", "b_x", "b_y", "c_x", "c_y")
                )
            ],
        ).filter(
            (F.col("b_x") - F.col("a_x")) * (F.col("c_y") - F.col("a_y"))
            - (F.col("b_y") - F.col("a_y")) * (F.col("c_x") - F.col("a_x"))
            != 0
        )
        pts = _cust_points(spark, sf_dir)
        j = F.broadcast(tri).crossJoin(pts)
        d1 = (F.col("b_x") - F.col("a_x")) * (F.col("y") - F.col("a_y")) - (
            F.col("b_y") - F.col("a_y")
        ) * (F.col("x") - F.col("a_x"))
        d2 = (F.col("c_x") - F.col("b_x")) * (F.col("y") - F.col("b_y")) - (
            F.col("c_y") - F.col("b_y")
        ) * (F.col("x") - F.col("b_x"))
        d3 = (F.col("a_x") - F.col("c_x")) * (F.col("y") - F.col("c_y")) - (
            F.col("a_y") - F.col("c_y")
        ) * (F.col("x") - F.col("c_x"))
        out = (
            j.filter(
                ((d1 >= 0) & (d2 >= 0) & (d3 >= 0))
                | ((d1 <= 0) & (d2 <= 0) & (d3 <= 0))
            )
            .groupBy("tid")
            .agg(
                F.count("*").alias("n_inside"),
                F.sum("k").alias("key_sum"),
            )
        )
        return _materialize(out)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_KNN_R = GRID_BOX // 8  # candidate window half-side around each probe
_KNN_K = 5


@query(
    "lakehouse_geo_knn_window_probes",
    oracle=f"""
        WITH {_PTS_SQL},
        probes AS (
            SELECT k AS pk, x AS px, y AS py FROM pts
            ORDER BY k LIMIT 3
        ),
        cand AS (
            SELECT pr.pk, p.k AS nk,
                   (p.x - pr.px) * (p.x - pr.px)
                   + (p.y - pr.py) * (p.y - pr.py) AS d2
            FROM probes pr JOIN pts p
              ON p.x BETWEEN pr.px - {_KNN_R} AND pr.px + {_KNN_R}
             AND p.y BETWEEN pr.py - {_KNN_R} AND pr.py + {_KNN_R}
             AND p.k <> pr.pk
        ),
        ranked AS (
            SELECT pk, nk, d2,
                   ROW_NUMBER() OVER (
                       PARTITION BY pk ORDER BY d2, nk
                   ) AS rnk
            FROM cand
        )
        SELECT pk, nk, CAST(d2 AS BIGINT) AS d2, rnk
        FROM ranked WHERE rnk <= {_KNN_K}
    """,
)
def lakehouse_geo_knn_window_probes(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """k-nearest-neighbors within a search window, against the stored
    geometry: the three smallest customer keys (data-derived probes —
    never literal ids) each issue an envelope-pruned ``scan(geo_bbox)``
    around their own coordinates; candidates are ranked by exact
    integer squared distance, ties broken by key. The window bound is
    part of the query SEMANTICS (both engines restrict to it), so the
    result is scale-independent — no radius large enough at one SF but
    too small at another.

    Scale: each probe opens only the files its window intersects
    (probe-local IO on a clustered table); the per-probe candidate set
    is density-bounded, and the top-k is a partitioned window over it.
    """
    root = _scratch()
    try:
        tbl = _point_table(spark, sf_dir, root)
        probes = (
            _cust_points(spark, sf_dir)
            .orderBy("k")
            .limit(3)
            .select(
                F.col("k").alias("pk"),
                F.col("x").alias("px"),
                F.col("y").alias("py"),
            )
            .collect()
        )
        from pyspark.sql.window import Window

        parts = []
        for r in probes:
            window = (
                r["px"] - _KNN_R,
                r["py"] - _KNN_R,
                r["px"] + _KNN_R,
                r["py"] + _KNN_R,
            )
            cand = tbl.scan(geo_bbox={"geom": window}).select(
                F.lit(r["pk"]).alias("pk"),
                F.col("k").alias("nk"),
                st_x("geom").cast("long").alias("nx"),
                st_y("geom").cast("long").alias("ny"),
            )
            parts.append(
                cand.filter(F.col("nk") != r["pk"]).select(
                    "pk",
                    "nk",
                    (
                        (F.col("nx") - F.lit(int(r["px"])))
                        * (F.col("nx") - F.lit(int(r["px"])))
                        + (F.col("ny") - F.lit(int(r["py"])))
                        * (F.col("ny") - F.lit(int(r["py"])))
                    ).alias("d2"),
                )
            )
        allc = parts[0]
        for p in parts[1:]:
            allc = allc.unionByName(p)
        w = Window.partitionBy("pk").orderBy("d2", "nk")
        out = (
            allc.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= _KNN_K)
            .select("pk", "nk", "d2", "rnk")
        )
        return _materialize(out)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "lakehouse_geo_file_bounds_report",
    oracle=f"""
        WITH {_PTS_SQL}
        SELECT x // {_BAND} AS band,
               count(*) AS num_rows,
               CAST(min(x) AS BIGINT) AS xmin,
               CAST(min(y) AS BIGINT) AS ymin,
               CAST(max(x) AS BIGINT) AS xmax,
               CAST(max(y) AS BIGINT) AS ymax
        FROM pts
        GROUP BY 1
    """,
)
def lakehouse_geo_file_bounds_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-file geometry envelopes served PURELY from manifest stats
    (``geo_bounds`` metadata table — no data file opened): with the
    four-band layout, each file's stored bounding box must equal the
    exact min/max of its band's coordinates, which the oracle
    recomputes from the raw data. The surface a spatial maintenance
    planner reads to find overlap-heavy files worth re-clustering.
    """
    root = _scratch()
    try:
        tbl = _point_table(spark, sf_dir, root)
        out = tbl.geo_bounds("geom").select(
            F.floor(F.col("xmin") / _BAND).cast("long").alias("band"),
            F.col("num_rows"),
            F.col("xmin").cast("long").alias("xmin"),
            F.col("ymin").cast("long").alias("ymin"),
            F.col("xmax").cast("long").alias("xmax"),
            F.col("ymax").cast("long").alias("ymax"),
        )
        return _materialize(out)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "lakehouse_geo_cluster_pruned_scan",
    oracle=f"""
        WITH {_PTS_SQL}
        SELECT seg,
               count(*) AS n_pts,
               CAST(sum(x) AS BIGINT) AS x_sum,
               CAST(sum(k) AS BIGINT) AS key_sum
        FROM pts
        WHERE x BETWEEN 0 AND {_BAND // 2}
          AND y BETWEEN 0 AND {GRID_BOX // 2}
        GROUP BY seg
    """,
)
def lakehouse_geo_cluster_pruned_scan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Spatial OPTIMIZE end to end: points land in hash-placed (i.e.
    spatially random) files where every file spans the whole box and a
    window scan must open all of them; ``rewrite_data_files(
    geo_cluster_by=...)`` Hilbert-clusters on the envelope centers,
    after which the same window provably opens FEWER files (asserted)
    and the re-decoded coordinate sums still hash-match the oracle —
    re-clustering moved bytes, never values.

    Scale: the rewrite is one range shuffle on the Hilbert key (the
    envelope decode is one Arrow-batched pass); the payoff compounds —
    every later window scan on a 10^6-file table opens only
    curve-adjacent files.
    """
    root = _scratch()
    try:
        tbl = LakehouseTable(spark, root + "/pts")
        pts = _cust_points(spark, sf_dir)
        geo = pts.select(
            "k",
            "seg",
            st_point(
                F.col("x").cast("double"), F.col("y").cast("double")
            ).alias("geom"),
        )
        tbl.overwrite(geo.repartition(4, "k"), geo_cols=["geom"])
        window = (0, 0, _BAND // 2, GRID_BOX // 2)
        # hash-placed files are spatially random: at any realistic SF
        # most (statistically all) of them intersect the window; the
        # pinned claim is RELATIVE — clustering must strictly shrink
        # the planned file set
        pre = len(tbl.scan(geo_bbox={"geom": window}).inputFiles())
        assert pre >= 2, "degenerate pre-cluster layout"
        tbl.rewrite_data_files(geo_cluster_by="geom", target_file_count=4)
        hit = tbl.scan(geo_bbox={"geom": window})
        assert len(hit.inputFiles()) < pre, "clustering did not tighten"
        out = (
            hit.select(
                "seg",
                "k",
                st_x("geom").cast("long").alias("x"),
            )
            .groupBy("seg")
            .agg(
                F.count("*").alias("n_pts"),
                F.sum("x").alias("x_sum"),
                F.sum("k").alias("key_sum"),
            )
        )
        return _materialize(out)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "lakehouse_geo_timetravel_window_scan",
    oracle=f"""
        WITH {_PTS_SQL},
        eras AS (
            SELECT 'pre' AS era, k, x FROM pts
            UNION ALL
            SELECT 'post', k,
                   CASE WHEN x < {_BAND} THEN x + {2 * GRID_BOX}
                        ELSE x END
            FROM pts
        )
        SELECT era,
               count(*) AS n_pts,
               CAST(sum(k) AS BIGINT) AS key_sum
        FROM eras
        WHERE x BETWEEN 0 AND {GRID_BOX}
        GROUP BY era
    """,
)
def lakehouse_geo_timetravel_window_scan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Geometry scans compose with time travel: a CoW update relocates
    every point of the first x-band far outside the box (coordinates
    rewritten through st_x/st_y + re-encoded WKB — the geometry
    round-trips THROUGH the update expression), and the same window
    then returns different row sets at the pre-update snapshot vs the
    tip, both value-hash-verified. Envelope shreds are re-derived for
    the rewritten file by the write path, so both scans stay
    stats-pruned — historical snapshots keep their own file bounds.
    """
    root = _scratch()
    try:
        tbl = _point_table(spark, sf_dir, root)
        pre_v = tbl.current_version()
        tbl.update_where(
            # decode-from-WKB predicate: the first band's points
            st_x("geom") < _BAND,
            {
                "geom": st_point(
                    st_x("geom") + 2 * GRID_BOX, st_y("geom")
                )
            },
        )
        window = (0, 0, GRID_BOX, GRID_BOX)

        def era(tag, version):
            return tbl.scan(
                geo_bbox={"geom": window}, version=version
            ).select(
                F.lit(tag).alias("era"), "k"
            )

        out = (
            era("pre", pre_v)
            .unionByName(era("post", tbl.current_version()))
            .groupBy("era")
            .agg(
                F.count("*").alias("n_pts"),
                F.sum("k").alias("key_sum"),
            )
        )
        return _materialize(out)
    finally:
        shutil.rmtree(root, ignore_errors=True)

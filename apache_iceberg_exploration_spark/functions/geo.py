"""WKB geometry kernels — the Spark-side rebuild of Iceberg v3's geo
column types (geometry / geography).

Iceberg v3 adds first-class geometry columns whose data-file stats carry
per-file bounding boxes so planners can skip files that cannot intersect
a query window. Spark has no geometry type, so the lakehouse layer here
models a geo column the way it models VARIANT (sources/lakehouse.py
``_encode_variant_cols``): the DECLARED type is ``binary`` holding
standard WKB (the same physical encoding Iceberg v3 mandates), and the
write path materializes reserved ``__geo_<col>_{xmin,ymin,xmax,ymax}``
double columns whose parquet footer min/max become the manifest's
per-file bounding box — file-level envelope pruning with ZERO new
pruning machinery (see ``LakehouseTable.scan(geo_bbox=...)``).

Everything Python-side is Arrow-batched (pandas UDFs), never row-at-a-
time over py4j; point-only batches take a fully vectorized numpy path
(one ``frombuffer`` per batch), and the generic parser handles
linestrings, polygons, and multi-geometries / collections recursively.

The reference (syafriedf/apache-iceberg-exploration) has no geospatial
surface; this module exists for SURVEY §2's "Iceberg feature build-out"
mandate — the v3 pillar set next to row lineage, deletion vectors, and
default values.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

_POINT, _LINESTRING, _POLYGON = 1, 2, 3
_MULTI = (4, 5, 6, 7)  # multipoint/multilinestring/multipolygon/collection

# -- pure-python codec (shared by the UDF kernels and tests) --------------


def wkb_point_bytes(x: float, y: float) -> bytes:
    """One little-endian WKB point (the 21-byte layout)."""
    return struct.pack("<BIdd", 1, _POINT, x, y)


def wkb_polygon_bytes(coords: list[float]) -> bytes:
    """Single-ring little-endian WKB polygon from flat ``[x0, y0, x1,
    y1, ...]`` coordinates; the ring is closed automatically."""
    pts = np.asarray(coords, dtype="<f8").reshape(-1, 2)
    if len(pts) < 3:
        raise ValueError("polygon ring needs at least 3 points")
    if not np.array_equal(pts[0], pts[-1]):
        pts = np.vstack([pts, pts[:1]])
    return struct.pack("<BIII", 1, _POLYGON, 1, len(pts)) + pts.tobytes()


def _bbox_at(buf: bytes, off: int) -> tuple[float, float, float, float, int]:
    """(xmin, ymin, xmax, ymax, next_offset) of the WKB geometry at
    ``off``. Handles both byte orders and nests into multi-geometries."""
    fmt = "<" if buf[off] == 1 else ">"
    (gt,) = struct.unpack_from(fmt + "I", buf, off + 1)
    off += 5
    if gt == _POINT:
        x, y = struct.unpack_from(fmt + "2d", buf, off)
        return x, y, x, y, off + 16
    if gt == _LINESTRING:
        (n,) = struct.unpack_from(fmt + "I", buf, off)
        cs = struct.unpack_from(fmt + f"{2 * n}d", buf, off + 4)
        return (
            min(cs[0::2]),
            min(cs[1::2]),
            max(cs[0::2]),
            max(cs[1::2]),
            off + 4 + 16 * n,
        )
    if gt == _POLYGON:
        (nr,) = struct.unpack_from(fmt + "I", buf, off)
        off += 4
        xmin = ymin = float("inf")
        xmax = ymax = float("-inf")
        for _ in range(nr):
            (n,) = struct.unpack_from(fmt + "I", buf, off)
            cs = struct.unpack_from(fmt + f"{2 * n}d", buf, off + 4)
            xmin = min(xmin, min(cs[0::2]))
            ymin = min(ymin, min(cs[1::2]))
            xmax = max(xmax, max(cs[0::2]))
            ymax = max(ymax, max(cs[1::2]))
            off += 4 + 16 * n
        return xmin, ymin, xmax, ymax, off
    if gt in _MULTI:
        (n,) = struct.unpack_from(fmt + "I", buf, off)
        off += 4
        xmin = ymin = float("inf")
        xmax = ymax = float("-inf")
        for _ in range(n):
            x0, y0, x1, y1, off = _bbox_at(buf, off)
            xmin, ymin = min(xmin, x0), min(ymin, y0)
            xmax, ymax = max(xmax, x1), max(ymax, y1)
        return xmin, ymin, xmax, ymax, off
    raise ValueError(f"unsupported WKB geometry type {gt}")


def bbox_of(buf: bytes) -> tuple[float, float, float, float]:
    """Envelope of one WKB geometry."""
    x0, y0, x1, y1, _ = _bbox_at(buf, 0)
    return x0, y0, x1, y1


def exterior_ring(buf: bytes) -> list[float]:
    """Flat ``[x0, y0, ...]`` coordinates: the point itself, the
    linestring's vertices, or the polygon's exterior ring."""
    fmt = "<" if buf[0] == 1 else ">"
    (gt,) = struct.unpack_from(fmt + "I", buf, 1)
    off = 5
    if gt == _POINT:
        return list(struct.unpack_from(fmt + "2d", buf, off))
    if gt == _LINESTRING:
        (n,) = struct.unpack_from(fmt + "I", buf, off)
        return list(struct.unpack_from(fmt + f"{2 * n}d", buf, off + 4))
    if gt == _POLYGON:
        (n,) = struct.unpack_from(fmt + "I", buf, off + 4)
        return list(struct.unpack_from(fmt + f"{2 * n}d", buf, off + 8))
    raise ValueError(f"no exterior ring for WKB geometry type {gt}")


def _is_point_batch(vals: np.ndarray) -> bool:
    """True when every non-null value is a little-endian WKB point —
    the all-points fast path (one frombuffer per batch)."""
    for b in vals:
        if b is None:
            continue
        if len(b) != 21 or b[0] != 1 or b[1] != _POINT or b[2:5] != b"\0\0\0":
            return False
    return True


def _point_xy_arrays(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(x, y) float64 arrays from an all-points batch (NaN for nulls)."""
    xs = np.full(len(vals), np.nan)
    ys = np.full(len(vals), np.nan)
    live = [i for i, b in enumerate(vals) if b is not None]
    if live:
        flat = np.frombuffer(
            b"".join(vals[i] for i in live), dtype=np.uint8
        ).reshape(len(live), 21)
        coords = flat[:, 5:21].copy().view("<f8")
        xs[live] = coords[:, 0]
        ys[live] = coords[:, 1]
    return xs, ys


# -- Arrow-batched column kernels ------------------------------------------


_UDF_CACHE: dict[str, object] = {}


def _udf(name: str):
    """Build the Arrow-batched kernels ONCE per process, lazily — a
    ``pandas_udf`` decoration parses its DDL return type through the
    ACTIVE SparkContext, so module import must stay session-free (the
    jaro-winkler kernel in operators/text.py set the precedent)."""
    if _UDF_CACHE:
        return _UDF_CACHE[name]
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def _st_point(x: pd.Series, y: pd.Series) -> pd.Series:
        xs = x.to_numpy(dtype="<f8", na_value=np.nan)
        ys = y.to_numpy(dtype="<f8", na_value=np.nan)
        n = len(xs)
        arr = np.zeros((n, 21), np.uint8)
        arr[:, 0] = 1
        arr[:, 1] = _POINT
        arr[:, 5:13] = xs.view(np.uint8).reshape(n, 8)
        arr[:, 13:21] = ys.view(np.uint8).reshape(n, 8)
        raw = arr.tobytes()
        null = np.isnan(xs) | np.isnan(ys)
        return pd.Series(
            [
                None if null[i] else raw[21 * i : 21 * (i + 1)]
                for i in range(n)
            ]
        )

    @pandas_udf("binary")
    def _st_polygon(coords: pd.Series) -> pd.Series:
        return pd.Series(
            [None if v is None else wkb_polygon_bytes(v) for v in coords]
        )

    @pandas_udf("double")
    def _st_x(wkb: pd.Series) -> pd.Series:
        return _point_coord(wkb.to_numpy(dtype=object, na_value=None), 0)

    @pandas_udf("double")
    def _st_y(wkb: pd.Series) -> pd.Series:
        return _point_coord(wkb.to_numpy(dtype=object, na_value=None), 1)

    @pandas_udf("xmin double, ymin double, xmax double, ymax double")
    def _wkb_bbox(wkb: pd.Series) -> pd.DataFrame:
        vals = wkb.to_numpy(dtype=object, na_value=None)
        if _is_point_batch(vals):
            xs, ys = _point_xy_arrays(vals)
            return pd.DataFrame(
                {"xmin": xs, "ymin": ys, "xmax": xs, "ymax": ys}
            )
        rows = [
            (np.nan,) * 4 if b is None else bbox_of(b)[:4] for b in vals
        ]
        return pd.DataFrame(rows, columns=["xmin", "ymin", "xmax", "ymax"])

    @pandas_udf("array<double>")
    def _st_ring(wkb: pd.Series) -> pd.Series:
        return pd.Series(
            [None if b is None else exterior_ring(b) for b in wkb]
        )

    @pandas_udf("boolean")
    def _st_contains_point(
        poly: pd.Series, x: pd.Series, y: pd.Series
    ) -> pd.Series:
        xs = x.to_numpy(dtype="<f8", na_value=np.nan)
        ys = y.to_numpy(dtype="<f8", na_value=np.nan)
        out = []
        for i, b in enumerate(poly.to_numpy(dtype=object, na_value=None)):
            if b is None or np.isnan(xs[i]) or np.isnan(ys[i]):
                out.append(None)
                continue
            ring = np.asarray(exterior_ring(b), dtype="<f8").reshape(-1, 2)
            out.append(_ring_contains(ring[:-1], xs[i], ys[i]))
        return pd.Series(out, dtype=object)

    _UDF_CACHE.update(
        st_point=_st_point,
        st_polygon=_st_polygon,
        st_x=_st_x,
        st_y=_st_y,
        wkb_bbox=_wkb_bbox,
        st_ring=_st_ring,
        st_contains_point=_st_contains_point,
    )
    return _UDF_CACHE[name]


def _point_coord(vals: np.ndarray, idx: int) -> pd.Series:
    if _is_point_batch(vals):
        return pd.Series(_point_xy_arrays(vals)[idx])
    out = []
    for b in vals:
        if b is None:
            out.append(None)
            continue
        fmt = "<" if b[0] == 1 else ">"
        (gt,) = struct.unpack_from(fmt + "I", b, 1)
        out.append(
            struct.unpack_from(fmt + "2d", b, 5)[idx]
            if gt == _POINT
            else None
        )
    return pd.Series(out, dtype="float64")


def st_point(x, y) -> F.Column:
    """WKB point from coordinate columns (NULL in → NULL out)."""
    return _udf("st_point")(x, y)


def st_polygon(coords) -> F.Column:
    """WKB polygon from a flat ``array<double>`` of ring coordinates."""
    return _udf("st_polygon")(coords)


def st_x(wkb) -> F.Column:
    """X of a WKB point (NULL for NULL / non-point geometries)."""
    return _udf("st_x")(wkb)


def st_y(wkb) -> F.Column:
    """Y of a WKB point (NULL for NULL / non-point geometries)."""
    return _udf("st_y")(wkb)


def wkb_bbox(wkb) -> F.Column:
    """Per-row envelope struct of a WKB geometry column — the kernel
    behind the lakehouse write path's ``__geo_*`` shred columns (and
    the exact fallback residual in ``scan(geo_bbox=...)``)."""
    return _udf("wkb_bbox")(wkb)


def st_ring(wkb) -> F.Column:
    """Exterior-ring coordinates (flat ``[x0, y0, ...]``) of a WKB
    geometry — polygon vertex access without a geometry runtime."""
    return _udf("st_ring")(wkb)


def st_contains_point(poly, x, y) -> F.Column:
    """Even-odd point-in-polygon over the exterior ring of a WKB
    polygon (concave rings supported; holes out of scope)."""
    return _udf("st_contains_point")(poly, x, y)


def _ring_contains(ring: np.ndarray, px: float, py: float) -> bool:
    """Even-odd (ray casting) point-in-ring test over the OPEN ring
    (no repeated closing vertex)."""
    x, y = ring[:, 0], ring[:, 1]
    x2, y2 = np.roll(x, -1), np.roll(y, -1)
    crosses = (y > py) != (y2 > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xi = x + (py - y) * (x2 - x) / (y2 - y)
    return bool(np.count_nonzero(crosses & (px < xi)) % 2)


def geo_bbox_filter(col, box) -> F.Column:
    """Envelope-intersection predicate computed FROM THE GEOMETRY (the
    exact residual ``scan(geo_bbox=...)`` falls back to when a kept file
    predates shred materialization). NULL geometry never intersects."""
    x0, y0, x1, y1 = box
    bb = wkb_bbox(col)
    return (
        (bb["xmin"] <= float(x1))
        & (bb["xmax"] >= float(x0))
        & (bb["ymin"] <= float(y1))
        & (bb["ymax"] >= float(y0))
    )

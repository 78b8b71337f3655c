"""Space-filling-curve indexes for data clustering.

The z-order (Morton) interleave (`LakehouseTable._zorder_column`) is
the classic multi-dimension clustering key; the HILBERT curve improves
on it — every step of the curve moves to a grid-adjacent cell, so a
fixed-length curve segment covers a tighter bounding box than the same
Morton segment (Morton jumps across the space at quadrant boundaries).
Delta Lake's OPTIMIZE switched its default to Hilbert for exactly this
reason, and Iceberg's spec reserves it as a sort transform.

The xy→d mapping is the canonical quadrant-rotation walk (the
Wikipedia/Warren formulation): per bit plane s (high→low), the
quadrant index ((3·rx) XOR ry) contributes s²·quadrant to d, then the
frame is reflected/swapped so the child quadrant's walk orientation
lines up. Implemented as a SQL ``aggregate`` FOLD over the bit planes:
one lambda evaluated ``bits`` times per row — constant expression
size (an unrolled column chain would grow ~4× per plane under
Catalyst's project-collapse substitution), stays inside whole-stage
codegen, no UDF.

Only the Spark side ever computes the index (clustering affects
LAYOUT, not results — oracles verify the scan results; tests verify
the curve itself against the reference walk and its adjacency
property), so no cross-engine arithmetic discipline is needed here.
"""

from __future__ import annotations


def hilbert_sql(x_sql: str, y_sql: str, bits: int = 16) -> str:
    """SQL expression for the Hilbert d-index of integer cell coords
    ``x_sql``/``y_sql`` in [0, 2^bits). BIGINT-exact for bits ≤ 31."""
    n = 1 << bits
    s = "shiftleft(CAST(1 AS BIGINT), k)"
    rx = f"(CAST((acc.x & {s}) > 0 AS BIGINT))"
    ry = f"(CAST((acc.y & {s}) > 0 AS BIGINT))"
    d_next = f"acc.d + {s} * {s} * ((3 * {rx}) ^ {ry})"
    x_next = (
        f"CASE WHEN {ry} = 1 THEN acc.x "
        f"WHEN {rx} = 1 THEN {n} - 1 - acc.y ELSE acc.y END"
    )
    y_next = (
        f"CASE WHEN {ry} = 1 THEN acc.y "
        f"WHEN {rx} = 1 THEN {n} - 1 - acc.x ELSE acc.x END"
    )
    return (
        f"aggregate(sequence({bits - 1}, 0, -1), "
        f"named_struct('x', CAST({x_sql} AS BIGINT), "
        f"'y', CAST({y_sql} AS BIGINT), 'd', CAST(0 AS BIGINT)), "
        f"(acc, k) -> named_struct("
        f"'x', CAST({x_next} AS BIGINT), "
        f"'y', CAST({y_next} AS BIGINT), "
        f"'d', CAST({d_next} AS BIGINT)), "
        f"acc -> acc.d)"
    )


def hilbert_xy2d(bits: int, x: int, y: int) -> int:
    """Pure-Python reference walk (tests pin the SQL fold to this)."""
    n = 1 << bits
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - x, n - 1 - y
            x, y = y, x
        s //= 2
    return d

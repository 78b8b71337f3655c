"""Vector math over ``array<float>`` columns, JVM-side.

Cosine similarity is expressed with ``F.zip_with`` + ``F.aggregate``
(higher-order functions → whole-stage codegen, no Python boundary), in
DOUBLE precision with strictly sequential accumulation so the DuckDB
oracle (``list_cosine_similarity`` over DOUBLE[]) computes bit-identical
IEEE results.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm2(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def as_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def cosine_similarity(a: Column, b: Column) -> Column:
    """cos(a, b) in double precision. Inputs are cast to array<double>
    first — float32 widening is exact, so both engines see identical
    operands."""
    da, db = as_double_array(a), as_double_array(b)
    return _dot(da, db) / (_norm2(da) * _norm2(db))


def cosine_similarity_sql(a_expr: str, b_expr: str) -> str:
    """DuckDB twin: list_cosine_similarity over DOUBLE[] (same formula,
    same sequential accumulation order)."""
    return (
        f"list_cosine_similarity(CAST({a_expr} AS DOUBLE[]), "
        f"CAST({b_expr} AS DOUBLE[]))"
    )

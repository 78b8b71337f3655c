"""Portable deterministic hashing.

The dedup family (MinHash, SimHash, fingerprinting) needs hash functions
that produce IDENTICAL values in Spark and in the DuckDB oracle. Spark's
native ``hash()``/``xxhash64()`` are Murmur3/XXH64 with Spark-specific
seeds — not reproducible in DuckDB — so everything here is built on
``md5`` hex strings, which both engines expose byte-identically.

Spark side: ``F.conv(substring(md5(x),1,15),16,10)`` → 60-bit long.
DuckDB side: ``try_cast('0x'||substring(md5(x),1,15) AS BIGINT)``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX_LEN = 15  # 60 bits < 63, fits a signed long in both engines


def hash64(col: Column | str) -> Column:
    """Deterministic 60-bit hash of a string column (md5-prefix)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, HEX_LEN), 16, 10).cast("long")


def hash64_sql(expr: str) -> str:
    """DuckDB expression computing the same value as :func:`hash64`."""
    return f"try_cast('0x' || substring(md5({expr}), 1, {HEX_LEN}) AS BIGINT)"


def seeded_md5(col: Column | str, seed: Column | str | int) -> Column:
    """md5 over a seed-prefixed value — gives k independent hash families
    for MinHash from one primitive (seed `i` ↔ family `h_i`)."""
    c = F.col(col) if isinstance(col, str) else col
    s = F.lit(seed) if isinstance(seed, int) else (F.col(seed) if isinstance(seed, str) else seed)
    return F.md5(F.concat_ws("|", s.cast("string"), c))


def seeded_md5_sql(expr: str, seed_expr: str) -> str:
    return f"md5(CAST({seed_expr} AS VARCHAR) || '|' || {expr})"


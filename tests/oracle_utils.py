"""Driver-mimicking compare: row-count + schema + order-insensitive
value hash between a Spark DataFrame and a DuckDB oracle result.

Mirrors the contract described in __spark_entry__.py: columns sorted by
name, rows sorted, values canonicalized (floats rounded to a stable repr,
timestamps to ISO strings) before hashing.
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import math


def _canon(v):
    if v is None:
        return "␀"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # driver-style stable float repr: 12 significant digits
        return f"{v:.12g}"
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def value_hash(rows, colnames) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    canon_rows = sorted(
        "|".join(_canon(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for r in canon_rows:
        h.update(r.encode())
        h.update(b"\n")
    return h.hexdigest()


def compare(spark_df, duck_con, sql: str) -> tuple[bool, str]:
    srows = [tuple(r) for r in spark_df.collect()]
    scols = spark_df.columns
    res = duck_con.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    if sorted(scols) != sorted(dcols):
        return False, f"schema mismatch: spark={sorted(scols)} duck={sorted(dcols)}"
    if len(srows) != len(drows):
        return False, f"row count mismatch: spark={len(srows)} duck={len(drows)}"
    sh, dh = value_hash(srows, scols), value_hash(drows, dcols)
    if sh != dh:
        return False, "value hash mismatch"
    return True, f"ok rows={len(srows)}"

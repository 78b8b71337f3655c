#!/usr/bin/env python
"""Synthesize a larger scale factor by replicating sf0.1 with key
remapping (VERDICT r5 #3 — the local substrate for the scaling-curve
audit, since the driver only materializes up to sf0.1).

Each replica ``i`` is a DISJOINT sub-universe:

- every key / foreign key shifts by ``i * 10_000_000`` consistently
  (c_custkey and o_custkey shift together, l_orderkey follows
  o_orderkey, ...), so joins, group sizes, and selectivities inside a
  replica are bit-identical to sf0.1 and global counts scale linearly;
- ``documents.text`` is Caesar-rotated per replica (a bijection on
  letters): WITHIN-replica duplicate/near-duplicate structure is
  preserved exactly, while cross-replica similarity drops to ~zero —
  without this, every doc would have (replicas-1) identical twins and
  pairwise dedup queries would blow up quadratically BY CONSTRUCTION
  of the synthetic data, not by any property of the engine;
- ``embeddings.embedding`` is cyclically rotated by ``3*i`` dimensions
  (norm-preserving; cross-replica cosine decorrelates) for the same
  reason on the ANN/semantic-dedup side;
- dimension tables (region, nation) are shared, not replicated —
  matching how TPC-H scales.

Usage: python tools/synth_scale.py [factor] [src_dir] [dest_dir]
Defaults: factor=10, src=/root/testdata/sf0.1, dest=/tmp/synthdata/sf1.
"""

from __future__ import annotations

import os
import string
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SHIFT = 10_000_000  # larger than any sf0.1 key

# per-table key columns that shift by replica * SHIFT
KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SHARED = ["region", "nation"]


def _caesar_expr(col: str, i: int):
    if i == 0:
        return F.col(col)
    low = string.ascii_lowercase
    up = string.ascii_uppercase
    rot = low[i % 26 :] + low[: i % 26] + up[i % 26 :] + up[: i % 26]
    return F.translate(F.col(col), low + up, rot)


def _replica(df: DataFrame, table: str, i: int) -> DataFrame:
    out = df
    for k in KEY_COLS.get(table, []):
        out = out.withColumn(k, (F.col(k) + F.lit(i * SHIFT)).cast("long"))
    if table == "documents":
        out = out.withColumn("text", _caesar_expr("text", i))
    if table == "embeddings" and i:
        # cyclic dimension rotation: slice+concat keeps the norm, kills
        # cross-replica cosine alignment
        # rotation must stay inside the embedding width: unreduced 3*i
        # goes negative-length in slice() for factor > 21 and silently
        # produces empty arrays (ADVICE r6). 64 is the testdata dim; use
        # a coprime-ish step and skip the degenerate rot-0 replicas.
        r = (3 * i) % 64
        if r == 0:
            r = 1
        out = out.withColumn(
            "embedding",
            F.expr(
                f"concat(slice(embedding, {r + 1}, "
                f"size(embedding) - {r}), slice(embedding, 1, {r}))"
            ).cast("array<float>"),
        )
    return out


def synthesize(
    spark: SparkSession, factor: int, src: str, dest: str
) -> None:
    os.makedirs(dest, exist_ok=True)
    for t in SHARED:
        spark.read.parquet(f"{src}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{dest}/{t}.parquet")
    for t in KEY_COLS:
        base = spark.read.parquet(f"{src}/{t}.parquet")
        out = _replica(base, t, 0)
        for i in range(1, factor):
            out = out.unionByName(_replica(base, t, i))
        # keep file counts proportionate so scan parallelism scales
        out.repartition(max(2, factor)).write.mode("overwrite").parquet(
            f"{dest}/{t}.parquet"
        )
        print(f"{t}: x{factor}", flush=True)


if __name__ == "__main__":
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dest = sys.argv[3] if len(sys.argv) > 3 else "/tmp/synthdata/sf1"
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from apache_iceberg_exploration_spark.session import get_spark

    synthesize(get_spark(app_name="synth-scale"), factor, src, dest)
    print("done:", dest)

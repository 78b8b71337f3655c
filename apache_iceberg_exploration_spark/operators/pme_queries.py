"""Oracled queries over PME-encrypted lakehouse tables (r10, VERDICT
r9 #1).

Parquet Modular Encryption mode (sources/encryption.py): data files
stay REAL parquet with encrypted footers and per-column data keys, so
encrypted tables regain intra-file column projection and row-group
pushdown — the read path below aggregates over a 2-column projection
of a 5-column ciphertext table, and tests/test_encryption_pme.py
byte-counts the projection at ~12% of the file. The DuckDB oracle
recomputes the expected state from plain ``customer`` arithmetic, so a
value-hash match proves encrypt → mutate → rotate → compact → project
→ decrypt end to end.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.io import load_table
from ..sources.lakehouse import LakehouseTable

_KEY = bytes(range(100, 132))  # fixture table key (KMS stand-in)


@query(
    "lakehouse_pme_encrypted_projection_mutations",
    oracle="""
        WITH src AS (
            SELECT c_custkey AS k, c_nationkey AS nat,
                   CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
            FROM customer
        ),
        survivors AS (
            SELECT k, nat,
                   CASE WHEN k % 19 = 4 THEN cents + 11 ELSE cents END
                       AS cents
            FROM src
            WHERE k % 5 <> 2 AND k % 17 <> 3
        )
        SELECT nat,
               count(*) AS n,
               CAST(sum(cents) AS BIGINT) AS cents_sum
        FROM survivors
        GROUP BY 1
    """,
)
def lakehouse_pme_encrypted_projection_mutations(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PME-table mutation roundtrip with a PROJECTED read: customer
    (5 columns) lands in a modular-encrypted table (per-column data
    keys under a per-file FMK, wrapped by the table key; plaintext
    sidecar stats keep planning keyless), then a merge-on-read equality
    delete (k≡2 mod 5 — its keys-only delete file is ALSO modular-
    encrypted parquet), a deletion-vector delete (k≡3 mod 17 —
    envelope-encrypted DV container, PME applies to parquet only), a
    copy-on-write update (+11 cents for k≡4 mod 19), a KEY ROTATION
    (rewraps sidecars, zero data bytes — pinned by mtime in the test
    suite), a compaction materializing the pending deletes, and finally
    an aggregate over ONLY (nat, cents) — the projection that whole-file
    envelope encryption could not serve without decrypting all five
    columns.

    Scale: at 100 TB the projection is the whole point — a 2-of-N
    column analytic scan over a PME table reads and decrypts only those
    columns' chunks per file (row-group pushdown intact), vs the
    envelope's full-file decrypt; key hierarchy, rotation cost
    (O(files) sidecar rewraps) and keyless planning are unchanged from
    the r9 envelope (sources/encryption.py module docstring)."""
    root = tempfile.mkdtemp(prefix="lakehouse_pme_", dir="/tmp")
    try:
        t = LakehouseTable(spark, root + "/t", encryption_key=_KEY)
        t.enable_encryption(_KEY, mode="pme")
        src = load_table(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("k"),
            F.col("c_nationkey").alias("nat"),
            F.floor(F.col("c_acctbal") * 100 + 0.5)
            .cast("long")
            .alias("cents"),
            F.col("c_mktsegment").alias("seg"),
            F.col("c_name").alias("nm"),
        )
        t.append(src.repartition(4, "k"))
        t.delete_where_mor(F.col("k") % 5 == 2, keys=["k"])
        t.delete_where_dv(F.col("k") % 17 == 3)
        t.update_where(
            F.col("k") % 19 == 4, {"cents": F.col("cents") + 11}
        )
        t.rotate_table_key(bytes(range(132, 164)), "k2")
        t.rewrite_data_files(target_file_count=4)
        out = (
            t.read()
            .select("nat", "cents")  # 2-of-5 column projection
            .groupBy("nat")
            .agg(
                F.count("*").alias("n"),
                F.sum("cents").cast("long").alias("cents_sum"),
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)

"""Oracled queries over ENCRYPTED lakehouse tables (r9, VERDICT r8 #2).

The full mutation surface runs against a table whose data files, MoR
delete files, and DV containers are AES-GCM envelope-encrypted
(sources/encryption.py): the DuckDB oracle recomputes the expected
state from plain ``customer`` arithmetic, so a value-hash match proves
the encrypt → mutate → decrypt pipeline end to end — not just that
bytes round-trip.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.io import load_table
from ..sources.lakehouse import LakehouseTable

_KEY = bytes(range(32))  # fixture table key (the KMS stand-in)


@query(
    "lakehouse_encrypted_table_mutations",
    oracle="""
        WITH src AS (
            SELECT c_custkey AS k, c_nationkey AS nat,
                   CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
            FROM customer
        ),
        survivors AS (
            SELECT k, nat,
                   CASE WHEN k % 13 = 1 THEN cents + 7 ELSE cents END
                       AS cents
            FROM src
            WHERE k % 7 <> 0 AND k % 11 <> 5
        )
        SELECT nat,
               count(*) AS n,
               CAST(sum(cents) AS BIGINT) AS cents_sum
        FROM survivors
        GROUP BY 1
    """,
)
def lakehouse_encrypted_table_mutations(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Encrypted-table mutation roundtrip: customer lands in an
    AES-GCM-encrypted table (per-file wrapped data keys, plaintext
    manifest stats), then a merge-on-read equality delete (k≡0 mod 7 —
    its keys-only delete file is ALSO encrypted), a deletion-vector
    delete (k≡5 mod 11 — encrypted DV container), a copy-on-write
    update (+7 cents for k≡1 mod 13), a KEY ROTATION (zero data bytes
    rewritten), and a compaction that materializes the pending deletes
    into fresh encrypted files. The read-back aggregate must equal the
    pure-SQL oracle — proving every delete flavor, the rewrite path,
    and rotation compose correctly under encryption.

    Scale: encryption cost is one AES-GCM pass per file at write
    (hardware-accelerated, ~GB/s/core) plus whole-file decrypt at read;
    the whole-file envelope trades parquet column pruning inside
    encrypted files for reader simplicity (SCALE.md r9 — Parquet
    Modular Encryption is the column-pruning variant of the same key
    hierarchy). File-level pruning is UNAFFECTED: stats stay plaintext
    in the manifest, exactly like Iceberg."""
    root = tempfile.mkdtemp(prefix="lakehouse_enc_", dir="/tmp")
    try:
        t = LakehouseTable(spark, root + "/t", encryption_key=_KEY)
        t.enable_encryption(_KEY)
        src = load_table(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("k"),
            F.col("c_nationkey").alias("nat"),
            F.floor(F.col("c_acctbal") * 100 + 0.5)
            .cast("long")
            .alias("cents"),
        )
        t.append(src.repartition(4, "k"))
        t.delete_where_mor(F.col("k") % 7 == 0, keys=["k"])
        t.delete_where_dv(F.col("k") % 11 == 5)
        t.update_where(F.col("k") % 13 == 1, {"cents": F.col("cents") + 7})
        t.rotate_table_key(bytes(range(32, 64)), "k2")
        t.rewrite_data_files(target_file_count=4)
        out = (
            t.read()
            .groupBy("nat")
            .agg(
                F.count("*").alias("n"),
                F.sum("cents").cast("long").alias("cents_sum"),
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)

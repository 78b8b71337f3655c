"""Row-lineage queries (Iceberg v3, r6): stable ``_row_id`` per row
surviving every rewrite, and the identity-keyed changelog it unlocks.

Reference parity: the reference pins iceberg-spark-runtime 1.4/1.5
(docker/Dockerfile:14,23), which predates v3 row lineage; these queries
exercise the v3 spec semantics (first-row-id assignment at commit,
base+position inheritance at read, materialization on rewrite)
implemented on the from-scratch lakehouse layer
(sources/lakehouse.py:_assign_row_lineage).

Oracle determinism: each append is a SINGLE sorted file
(coalesce(1).sortWithinPartitions), so assigned ids equal the sort rank
— expressible as ROW_NUMBER() in the DuckDB oracle. Rewrites
(update/delete/compaction) preserve materialized ids regardless of
their own parallelism, so the pipeline stays deterministic end-to-end.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.io import load_table
from ..sources.lakehouse import LakehouseTable


def _base_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "customer")
        .select(
            "c_custkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") * 100 + 0.5)
            .cast("long")
            .alias("cents"),
        )
        .coalesce(1)
        .sortWithinPartitions("c_custkey")
    )


_BASE_SQL = """
        SELECT c_custkey, c_mktsegment,
               CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents,
               ROW_NUMBER() OVER (ORDER BY c_custkey) - 1 AS rid
        FROM customer
"""


@query(
    "lakehouse_row_lineage_stability",
    oracle=f"""
        WITH base AS ({_BASE_SQL})
        SELECT c_custkey,
               CASE WHEN c_mktsegment = 'BUILDING'
                    THEN cents + 1000 ELSE cents END AS cents,
               CAST(rid AS BIGINT) AS row_id,
               CAST(CASE WHEN c_mktsegment = 'BUILDING'
                         THEN 2 ELSE 1 END AS BIGINT) AS last_upd
        FROM base
        WHERE c_custkey % 10 <> 7
    """,
)
def lakehouse_row_lineage_stability(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Row-id stability across the full mutation gauntlet (VERDICT r5
    task #1's oracle-checked proof): append → copy-on-write UPDATE →
    copy-on-write DELETE → bin-pack compaction → read with lineage.
    Ids are assigned once at the initial append (rank order in the
    single sorted file), survive the update (materialized into the
    rewritten files), the delete (survivors carry), and the compaction
    (invisible to lineage); ``_last_updated_version`` flips to the
    update's version for exactly the updated rows and is preserved by
    the later rewrites.

    Scale: lineage adds zero per-row cost on append (pure inheritance:
    base + parquet row position), one tiny broadcast (file → base) at
    read, and one extra int64 column in rewritten files."""
    root = tempfile.mkdtemp(prefix="lakehouse_lineage_q_", dir="/tmp")
    try:
        tbl = LakehouseTable(spark, root + "/t")
        tbl.append(_base_customer(spark, sf_dir))  # v1: ids = rank
        tbl.update_where(  # v2: CoW update, ids materialize
            F.col("c_mktsegment") == "BUILDING",
            {"cents": F.col("cents") + 1000},
        )
        tbl.delete_where(F.col("c_custkey") % 10 == 7)  # v3: CoW delete
        tbl.rewrite_small_files(  # v4: compaction — invisible
            min_file_bytes=256 * 1024 * 1024
        )
        out = tbl.read(with_lineage=True).select(
            "c_custkey",
            "cents",
            F.col("_row_id").alias("row_id"),
            F.col("_last_updated_version").alias("last_upd"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "lakehouse_changelog_row_level_pairs",
    oracle=f"""
        WITH base AS ({_BASE_SQL}),
        n AS (SELECT count(*) AS c FROM customer),
        dead AS (SELECT * FROM base WHERE c_custkey % 13 = 5),
        changed AS (
            SELECT * FROM base
            WHERE cents % 7 = 3 AND c_custkey % 13 <> 5
        )
        SELECT 'delete' AS change_type, c_custkey, cents,
               CAST(rid AS BIGINT) AS row_id
        FROM dead
        UNION ALL
        SELECT 'update_preimage', c_custkey, cents, rid FROM changed
        UNION ALL
        SELECT 'update_postimage', c_custkey, cents + 55, rid
        FROM changed
        UNION ALL
        -- the id counter burns a slot for EVERY row of every new file,
        -- including rewrites carrying materialized ids (Iceberg v3
        -- inheritance): after v1 (n rows) + v2 full update rewrite (n)
        -- + v3 delete rewrite (n - dead), inserts start at 3n - dead
        SELECT 'insert', c_custkey + 100000, 777,
               3 * (SELECT c FROM n)
               - (SELECT count(*) FROM dead)
               + ROW_NUMBER() OVER (ORDER BY c_custkey) - 1
        FROM customer WHERE c_custkey < 5
    """,
)
def lakehouse_changelog_row_level_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Identity-keyed changelog (VERDICT r5 task #4): with row lineage,
    ``changelog(row_level=True)`` joins the interval's sides on
    ``_row_id`` and emits Delta CDF's FOUR change types — an UPDATE is
    one ``update_preimage``/``update_postimage`` PAIR sharing the row's
    id, not an unpairable delete+insert; deletes and inserts carry
    their identity too. The interval spans an update, a delete, an
    append, and a compaction (which contributes zero changes).

    The oracle reconstructs the exact ids: initial ids are the sort
    rank (single sorted file), inserted rows continue the counter from
    the table's row count."""
    root = tempfile.mkdtemp(prefix="lakehouse_rowcl_q_", dir="/tmp")
    try:
        tbl = LakehouseTable(spark, root + "/t")
        tbl.append(_base_customer(spark, sf_dir))  # v1
        tbl.update_where(  # v2
            F.col("cents") % 7 == 3, {"cents": F.col("cents") + 55}
        )
        tbl.delete_where(F.col("c_custkey") % 13 == 5)  # v3
        inserts = (
            load_table(spark, sf_dir, "customer")
            .filter(F.col("c_custkey") < 5)
            .select(
                (F.col("c_custkey") + 100000).alias("c_custkey"),
                F.col("c_mktsegment"),
                F.lit(777).cast("long").alias("cents"),
            )
            .coalesce(1)
            .sortWithinPartitions("c_custkey")
        )
        tbl.append(inserts)  # v4: fresh identities continue the counter
        tbl.rewrite_small_files(  # v5: nets to zero in the changelog
            min_file_bytes=256 * 1024 * 1024
        )
        out = tbl.changelog(1, row_level=True).select(
            F.col("_change_type").alias("change_type"),
            "c_custkey",
            "cents",
            F.col("_row_id").alias("row_id"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "streaming_cdc_row_lineage_feed",
    oracle=f"""
        WITH base AS ({_BASE_SQL}),
        upd AS (SELECT * FROM base WHERE cents % 7 = 3),
        v2s AS (
            SELECT c_custkey, c_mktsegment,
                   CASE WHEN cents % 7 = 3 THEN cents + 55
                        ELSE cents END AS cents,
                   rid
            FROM base
        ),
        dead AS (SELECT * FROM v2s WHERE c_custkey % 13 = 5)
        SELECT 'insert' AS change_type, c_custkey, cents,
               CAST(rid AS BIGINT) AS row_id,
               CAST(1 AS BIGINT) AS commit_v
        FROM base
        UNION ALL
        SELECT 'update_preimage', c_custkey, cents, rid, 2 FROM upd
        UNION ALL
        SELECT 'update_postimage', c_custkey, cents + 55, rid, 2 FROM upd
        UNION ALL
        SELECT 'delete', c_custkey, cents, rid, 3 FROM dead
    """,
)
def streaming_cdc_row_lineage_feed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """STREAMING identity-keyed change feed —
    ``readStream.option("readChangeFeed", true).option("rowLineage",
    true)``: per-commit events carry ``_row_id`` and Delta CDF's FOUR
    change types. The history: initial load (inserts at v1), a CoW
    UPDATE (one pre/postimage PAIR per changed row at v2, sharing its
    id — the value-diff feed would emit an unpairable delete+insert), a
    CoW DELETE (v3), and a full re-cluster (v4) that nets to ZERO by
    IDENTITY (the value-multiset feed nets by equality; identity
    netting also survives rewrites that change row order or file
    assignment arbitrarily).

    Scale: same changed-files-only planning as the value-level feed;
    the diff keys are O(changed rows) ints. The dist reader runs the
    identical per-commit diff executor-side (parity pinned by
    test_cdc_row_lineage_feed_update_pairs)."""
    from ..streaming.lakehouse_source import make_lakehouse_stream_source
    from ..streaming.windows import _run_available_now

    root = tempfile.mkdtemp(prefix="lakehouse_rlcdc_q_", dir="/tmp")
    try:
        tbl = LakehouseTable(spark, root + "/t")
        tbl.append(_base_customer(spark, sf_dir))  # v1: ids = rank
        tbl.update_where(  # v2: update pairs
            F.col("cents") % 7 == 3, {"cents": F.col("cents") + 55}
        )
        tbl.delete_where(F.col("c_custkey") % 13 == 5)  # v3: deletes
        tbl.rewrite_data_files(target_file_count=4)  # v4: zero events

        spark.dataSource.register(make_lakehouse_stream_source())
        stream = (
            spark.readStream.format("lakehouse_stream")
            .option("path", root + "/t")
            .option("readChangeFeed", "true")
            .option("rowLineage", "true")
            .load()
        )
        out = _run_available_now(
            stream.select(
                F.col("_change_type").alias("change_type"),
                "c_custkey",
                "cents",
                F.col("_row_id").alias("row_id"),
                F.col("_commit_version").alias("commit_v"),
            ),
            "append",
        )
        return out
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "lakehouse_incremental_by_row_version",
    oracle=f"""
        WITH base AS ({_BASE_SQL})
        SELECT c_custkey,
               cents + 55 AS cents,
               CAST(rid AS BIGINT) AS row_id,
               CAST(2 AS BIGINT) AS last_upd
        FROM base WHERE cents % 7 = 3
        UNION ALL
        SELECT c_custkey + 100000, 777,
               (SELECT count(*) FROM customer) * 2
               + ROW_NUMBER() OVER (ORDER BY c_custkey) - 1,
               3
        FROM customer WHERE c_custkey < 5
    """,
)
def lakehouse_incremental_by_row_version(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental consumption WITHOUT a change feed:
    ``_last_updated_version > N`` selects exactly the rows written or
    updated since snapshot N — the row-version watermark pattern
    (Iceberg v3's last-updated sequence number). Unlike the changelog
    it carries no deletes (pair with the feed when deletes matter),
    but it needs no interval bookkeeping: any consumer that remembers
    one version number can catch up with one filtered scan. The
    history: update at v2 (rewrites carry untouched rows' OLD versions,
    so only truly-updated rows surface), append at v3.

    Scale: the filter composes with inheritance — files whose sequence
    number is ≤ N and carry no materialized __last_updated can be
    PRUNED by metadata alone (their every row inherits file seq ≤ N);
    rewritten files are scanned and filtered row-wise."""
    root = tempfile.mkdtemp(prefix="lakehouse_rowver_q_", dir="/tmp")
    try:
        tbl = LakehouseTable(spark, root + "/t")
        tbl.append(_base_customer(spark, sf_dir))  # v1
        tbl.update_where(  # v2: only these rows bump their version
            F.col("cents") % 7 == 3, {"cents": F.col("cents") + 55}
        )
        inserts = (
            load_table(spark, sf_dir, "customer")
            .filter(F.col("c_custkey") < 5)
            .select(
                (F.col("c_custkey") + 100000).alias("c_custkey"),
                F.col("c_mktsegment"),
                F.lit(777).cast("long").alias("cents"),
            )
            .coalesce(1)
            .sortWithinPartitions("c_custkey")
        )
        tbl.append(inserts)  # v3
        out = tbl.read_rows_updated_since(1).select(
            "c_custkey",
            "cents",
            F.col("_row_id").alias("row_id"),
            F.col("_last_updated_version").alias("last_upd"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "lakehouse_scd2_from_row_changelog",
    oracle=f"""
        WITH base AS ({_BASE_SQL}),
        u2 AS (SELECT * FROM base WHERE cents % 5 = 2),
        u3 AS (
            SELECT c_custkey,
                   CASE WHEN cents % 5 = 2 THEN cents + 11
                        ELSE cents END AS cents,
                   rid
            FROM base WHERE c_custkey % 9 = 4
        )
        -- original validity: closed at 2 if updated at v2, else at 3 if
        -- updated at v3, else open
        SELECT c_custkey, cents, CAST(rid AS BIGINT) AS row_id,
               CAST(1 AS BIGINT) AS valid_from,
               CAST(CASE WHEN cents % 5 = 2 THEN 2
                         WHEN c_custkey % 9 = 4 THEN 3
                         ELSE 0 END AS BIGINT) AS valid_to
        FROM base
        UNION ALL
        -- v2 images: closed at 3 if hit again by v3, else open
        SELECT c_custkey, cents + 11, rid, 2,
               CASE WHEN c_custkey % 9 = 4 THEN 3 ELSE 0 END
        FROM u2
        UNION ALL
        -- v3 images: open
        SELECT c_custkey, cents + 100, rid, 3, 0 FROM u3
    """,
)
def lakehouse_scd2_from_row_changelog(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SCD TYPE 2 dimension history DRIVEN BY THE IDENTITY-KEYED
    CHANGELOG — the composition VERDICT r5 #4 points at: per commit,
    ``changelog(v-1, v, row_level=True)`` yields update pairs keyed by
    ``_row_id``; each ``update_postimage`` opens a new history row
    (valid_from = commit) and closes the previous one (valid_to =
    commit) — matching by ROW IDENTITY, so key-column updates and
    duplicate business keys can't mis-pair the way value/key matching
    does. Deletes would close without opening (none in this history);
    valid_to = 0 marks the open row.

    The fold over commits runs as ONE Spark plan: the per-commit pair
    feeds are unioned with their commit version, each row's validity
    closes at the NEXT version that touched the same ``_row_id``
    (a window by id), no driver-side loop state.

    Scale: each per-commit changelog opens changed files only; the
    closing window partitions by _row_id (millions of tiny groups —
    the well-partitioned window shape)."""
    from pyspark.sql import Window

    root = tempfile.mkdtemp(prefix="lakehouse_scd2_q_", dir="/tmp")
    try:
        tbl = LakehouseTable(spark, root + "/t")
        tbl.append(_base_customer(spark, sf_dir))  # v1
        tbl.update_where(  # v2
            F.col("cents") % 5 == 2, {"cents": F.col("cents") + 11}
        )
        tbl.update_where(  # v3
            F.col("c_custkey") % 9 == 4, {"cents": F.col("cents") + 100}
        )
        # image stream: v1's initial rows open at 1; each later commit's
        # update_postimage opens a new image at that commit
        images = tbl.read(version=1, with_lineage=True).select(
            "c_custkey",
            "cents",
            F.col("_row_id").alias("row_id"),
            F.lit(1).cast("long").alias("valid_from"),
        )
        for v in range(2, tbl.current_version() + 1):
            post = (
                tbl.changelog(v - 1, v, row_level=True)
                .filter(F.col("_change_type") == "update_postimage")
                .select(
                    "c_custkey",
                    "cents",
                    F.col("_row_id").alias("row_id"),
                    F.lit(v).cast("long").alias("valid_from"),
                )
            )
            images = images.unionByName(post)
        w = (
            Window.partitionBy("row_id")
            .orderBy("valid_from")
            .rowsBetween(1, 1)
        )
        out = images.withColumn(
            "valid_to",
            F.coalesce(F.max("valid_from").over(w), F.lit(0)).cast(
                "long"
            ),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)

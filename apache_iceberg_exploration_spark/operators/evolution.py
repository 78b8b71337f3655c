"""Iceberg v3 DEFAULT column values (r8): ``add_column(...,
default=...)`` records the spec's ``initial-default`` (what files
written before the add read back — immutable) and ``write-default``
(what writes that omit the column materialize — evolvable via
``set_column_default`` / ``drop_column_default``).

Reference parity: the reference pins iceberg-spark-runtime 1.4/1.5
(docker/Dockerfile:14,23), predating v3 defaults; these queries
exercise the spec semantics implemented on the from-scratch lakehouse
layer (sources/lakehouse.py:add_column / _initial_default_gaps), the
v3 companion to row lineage (r6) and deletion vectors (r7).

The oracles reconstruct the per-write-era value with CASE over the
append key ranges — every era is appended from a disjoint
``c_custkey % 5`` slice, so the expected column value is a pure
function of the key.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.io import load_table
from ..sources.lakehouse import LakehouseTable


def _scratch() -> str:
    return tempfile.mkdtemp(prefix="lakehouse_evo_", dir="/tmp")


def _materialize(out):
    return out.localCheckpoint(eager=True)


def _cust(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") * 100 + 0.5)
        .cast("long")
        .alias("cents"),
    )


def _evolve(spark: SparkSession, sf_dir: str, root: str) -> LakehouseTable:
    """The canonical default-column lifecycle over disjoint key slices:

    =====  =======================  =========================
    era    write                    expected ``tier``
    =====  =======================  =========================
    k%5=0  append BEFORE the add    'legacy' (initial-default)
    k%5=1  explicit c_mktsegment    c_mktsegment
    k%5=2  column omitted           'legacy' (write-default)
    k%5=3  omitted, default dropped NULL (materialized)
    k%5=4  omitted, default 'bulk'  'bulk'
    =====  =======================  =========================
    """
    tbl = LakehouseTable(spark, root + "/t")
    cust = _cust(spark, sf_dir)
    k = F.col("c_custkey") % 5
    tbl.append(cust.filter(k == 0))  # v1: pre-add files
    tbl.add_column("tier", "string", default="legacy")  # v2
    tbl.append(
        cust.filter(k == 1).withColumn("tier", F.col("c_mktsegment"))
    )  # v3
    tbl.append(cust.filter(k == 2))  # v4: write-default
    tbl.drop_column_default("tier")  # v5
    tbl.append(cust.filter(k == 3))  # v6: explicit NULL
    tbl.set_column_default("tier", "bulk")  # v7
    tbl.append(cust.filter(k == 4))  # v8
    return tbl


_TIER_SQL = """
        CASE c_custkey % 5
            WHEN 0 THEN 'legacy'
            WHEN 1 THEN c_mktsegment
            WHEN 2 THEN 'legacy'
            WHEN 3 THEN NULL
            ELSE 'bulk'
        END
"""


@query(
    "lakehouse_default_column_backfill",
    oracle=f"""
        SELECT coalesce({_TIER_SQL}, '<null>') AS tier,
               count(*) AS n_rows,
               CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents_sum
        FROM customer
        GROUP BY 1
    """,
)
def lakehouse_default_column_backfill(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Iceberg v3 default column values, end to end: files written
    BEFORE ``add_column(default=...)`` read the initial-default back
    with no rewrite (instant backfill); writes omitting the column
    materialize the CURRENT write-default; ``drop_column_default``
    makes omission an explicit NULL (distinguishable from pre-add
    files); ``set_column_default`` evolves future writes only. The
    reference's ALTER-by-recreate pipelines have no counterpart — old
    rows there would surface NULL forever.

    Scale: the default fill is a per-file metadata decision (which
    files predate the add) applied as a projection expression — zero
    data rewrite at ADD time, no shuffle at read; the gap map is
    O(pre-add files) driver metadata, broadcast when wide.
    """
    root = _scratch()
    try:
        tbl = _evolve(spark, sf_dir, root)
        out = (
            tbl.read()
            .groupBy(
                F.coalesce(F.col("tier"), F.lit("<null>")).alias("tier")
            )
            .agg(
                F.count("*").alias("n_rows"),
                F.sum("cents").alias("cents_sum"),
            )
        )
        return _materialize(out)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "lakehouse_default_materializing_compaction",
    oracle=f"""
        SELECT coalesce({_TIER_SQL}, '<null>') AS tier,
               count(*) AS n_rows,
               0 AS n_changelog_rows
        FROM customer
        GROUP BY 1
    """,
)
def lakehouse_default_materializing_compaction(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Compaction MATERIALIZES defaults: rewritten files physically
    contain the (previously virtual) initial-default values, and the
    changelog across the rewrite nets to ZERO because the default-
    filled reads of the old files equal the materialized rows — the
    CDC-consistency contract that makes defaults safe to mix with
    incremental consumers. ``n_changelog_rows`` is asserted 0 in-band.

    Scale: the rewrite is the normal compaction path (O(small files));
    the changelog check opens CHANGED files only.
    """
    root = _scratch()
    try:
        tbl = _evolve(spark, sf_dir, root)
        v = tbl.current_version()
        tbl.rewrite_small_files()
        n_change = tbl.changelog(v).count()
        out = (
            tbl.read()
            .groupBy(
                F.coalesce(F.col("tier"), F.lit("<null>")).alias("tier")
            )
            .agg(F.count("*").alias("n_rows"))
            .withColumn("n_changelog_rows", F.lit(n_change).cast("int"))
        )
        return _materialize(out)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "lakehouse_default_dsv2_scan",
    oracle=f"""
        SELECT coalesce({_TIER_SQL}, '<null>') AS tier,
               count(*) AS n_rows
        FROM customer
        WHERE c_custkey % 5 IN (0, 2)
        GROUP BY 1
    """,
)
def lakehouse_default_dsv2_scan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The DSv2 batch reader under schema evolution: the source's
    schema comes from the snapshot's DECLARED schema (an anchor file
    predating the add would otherwise hide the column), and its Arrow
    projection fills initial-defaults per file — heterogeneous files
    (pre-add / explicit / materialized) read consistently through
    ``spark.read.format("lakehouse")``. Filter limited to the pre-add
    and write-default eras, exercising exactly the filled paths.

    Scale: per-file Arrow-side fill on the executor — the driver ships
    only the (column → literal) map with the reader.
    """
    from ..streaming.lakehouse_source import make_lakehouse_batch_source

    root = _scratch()
    try:
        tbl = _evolve(spark, sf_dir, root)
        spark.dataSource.register(make_lakehouse_batch_source())
        # the DSv2 reader implements pushFilters — a vanilla (driver)
        # session refuses to plan it unless the flag is on
        spark.conf.set(
            "spark.sql.python.filterPushdown.enabled", "true"
        )
        out = (
            spark.read.format("lakehouse")
            .option("path", tbl.path)
            .load()
            .filter((F.col("c_custkey") % 5).isin(0, 2))
            .groupBy(
                F.coalesce(F.col("tier"), F.lit("<null>")).alias("tier")
            )
            .agg(F.count("*").alias("n_rows"))
        )
        return _materialize(out)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "lakehouse_column_defaults_report",
    oracle="""
        SELECT * FROM (VALUES
            (2, 'tier', 'legacy', 'legacy'),
            (5, 'tier', 'legacy', NULL),
            (7, 'tier', 'legacy', 'bulk')
        ) AS t(version, column_name, initial_default, write_default)
    """,
)
def lakehouse_column_defaults_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Default-attribute lineage across snapshots: every commit records
    its declared schema, so the report lists each version at which a
    column's default attributes CHANGED — the audit surface for "what
    did omitted writes mean at version N" (the initial-default row is
    immutable; write-default rows track set/drop). Sibling of
    lakehouse_schema_evolution_report (field names) with the v3
    default attributes.

    Scale: pure manifest metadata, O(snapshots) driver-side.
    """
    import json as _json

    root = _scratch()
    try:
        tbl = _evolve(spark, sf_dir, root)
        rows = []
        prev: dict = {}
        for snap in tbl.snapshots():
            if not snap.get("schema"):
                continue
            cur = {}
            for f in _json.loads(snap["schema"])["fields"]:
                md = f.get("metadata") or {}
                if "initial_default" in md or "write_default" in md:
                    cur[f["name"]] = (
                        md.get("initial_default"),
                        md.get("write_default"),
                    )
            for name, attrs in sorted(cur.items()):
                if prev.get(name) != attrs:
                    rows.append((snap["version"], name, *attrs))
            prev = cur
        return spark.createDataFrame(
            rows,
            "version int, column_name string, initial_default string,"
            " write_default string",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "lakehouse_sql_table_surface",
    oracle="""
        SELECT c_mktsegment,
               count(*) AS n_rows,
               CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents_sum
        FROM customer
        WHERE c_custkey % 2 = 0 OR c_custkey < 100
        GROUP BY 1
    """,
)
def lakehouse_sql_table_surface(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The pure-SQL lakehouse surface (VERDICT r7 #2): CREATE TABLE ...
    USING lakehouse, INSERT INTO, and SELECT aggregation — no DataFrame
    reader/writer calls touch the table after creation. Spark 4.1 hands
    the Python data source EMPTY options in the reader/writer worker;
    the format smuggles them through the catalog schema's field
    metadata, restoring Iceberg's ``CREATE TABLE ... USING iceberg``
    ergonomics.

    Scale: identical plan to the path-based read (the SQL table resolves
    to the same _BatchReader with pushFilters + stats pruning).
    """
    import uuid as _uuid

    from ..streaming.lakehouse_source import make_lakehouse_batch_source

    root = _scratch()
    name = f"sql_surface_{_uuid.uuid4().hex[:8]}"
    try:
        tbl = LakehouseTable(spark, root + "/t")
        cust = _cust(spark, sf_dir).withColumn(
            "c_mktsegment", F.col("c_mktsegment")
        )
        tbl.append(cust.filter(F.col("c_custkey") % 2 == 0))
        spark.dataSource.register(make_lakehouse_batch_source())
        spark.sql(
            f"CREATE TABLE {name} USING lakehouse"
            f" OPTIONS (path '{tbl.path}')"
        )
        # INSERT INTO through SQL: the odd keys below 100
        ins = (
            _cust(spark, sf_dir)
            .filter(
                (F.col("c_custkey") % 2 == 1) & (F.col("c_custkey") < 100)
            )
            .createOrReplaceTempView(f"{name}_src")
        )
        del ins
        spark.sql(
            f"INSERT INTO {name} SELECT * FROM {name}_src"
        )
        out = spark.sql(
            f"""
            SELECT c_mktsegment, count(*) AS n_rows,
                   CAST(sum(cents) AS BIGINT) AS cents_sum
            FROM {name} GROUP BY 1
            """
        )
        return _materialize(out)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        spark.catalog.dropTempView(f"{name}_src")
        shutil.rmtree(root, ignore_errors=True)


_NDV_HASH_SQL = (
    "try_cast('0x' || substring(md5({expr}), 1, 15) AS BIGINT)"
)


@query(
    "lakehouse_ndv_table_statistics",
    oracle="""
        WITH hashed AS (
            SELECT 'c_custkey' AS column_name,
                   try_cast('0x' || substring(md5(CAST(c_custkey AS VARCHAR)), 1, 15)
                            AS BIGINT) AS h
            FROM customer
            UNION ALL
            SELECT 'c_mktsegment',
                   try_cast('0x' || substring(md5(c_mktsegment), 1, 15)
                            AS BIGINT)
            FROM customer
            UNION ALL
            SELECT 'c_nationkey',
                   try_cast('0x' || substring(md5(CAST(c_nationkey AS VARCHAR)), 1, 15)
                            AS BIGINT)
            FROM customer
        ),
        regs AS (
            SELECT column_name, h % 512 AS bucket,
                   max(CASE WHEN ((h >> 9) & 1099511627775) = 0 THEN 40
                            ELSE bit_count((((h >> 9) & 1099511627775)
                                  & (-((h >> 9) & 1099511627775))) - 1) + 1
                       END) AS r
            FROM hashed WHERE h IS NOT NULL GROUP BY 1, 2
        ),
        est AS (
            SELECT column_name,
                   sum(1::BIGINT << (40 - r))
                   + (512 - count(*)) * (1::BIGINT << 40) AS s_scaled,
                   512 - count(*) AS v
            FROM regs GROUP BY 1
        )
        SELECT column_name,
               CASE WHEN v > 0
                    THEN CAST(floor(512 * ln(512.0 / v) + 0.5) AS BIGINT)
                    ELSE 207463357500372480 // s_scaled
               END AS ndv,
               'incremental' AS mode
        FROM est
    """,
)
def lakehouse_ndv_table_statistics(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Puffin-style NDV table statistics (Iceberg's table-statistics
    files, VERDICT r7 #3): ``analyze()`` sketches each column with the
    PORTABLE integer HLL (p=9, md5-prefix hash — bit-identical in the
    DuckDB oracle) and persists a per-snapshot sidecar;
    ``statistics()`` is the metadata listing. This run appends twice
    and analyzes twice: the second analyze scans ONLY the new files and
    MERGES registers (HLL max-merge) — the emitted estimates come from
    the incremental pass, and the oracle recomputes them from scratch,
    so the merge's losslessness is value-hash-verified, not claimed.

    Scale: re-analyze of an append-only table is O(new data); register
    state is |columns| x 512 ints per snapshot; planning consumes the
    sidecar's per-file row counts when manifests predate __rows
    (test_ndv_statistics pins the broadcast flip).
    """
    root = _scratch()
    try:
        tbl = LakehouseTable(spark, root + "/t")
        cust = load_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_mktsegment", "c_nationkey"
        )
        half = F.col("c_custkey") % 2
        tbl.append(cust.filter(half == 0))
        tbl.analyze()
        tbl.append(cust.filter(half == 1))
        s = tbl.analyze()  # incremental: merges carried registers
        latest = (
            tbl.statistics()
            .filter(F.col("stats_version") == tbl.current_version())
            .select("column_name", "ndv", "mode")
        )
        assert s["mode"] == "incremental"
        return _materialize(latest)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "lakehouse_partition_stats_file",
    oracle="""
        SELECT concat('{"c_mktsegment":"', c_mktsegment, '"}')
                   AS partition,
               2 AS file_count,
               count(*) AS row_count
        FROM customer
        GROUP BY c_mktsegment
    """,
)
def lakehouse_partition_stats_file(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Partition statistics files (Iceberg partition-stats spec,
    VERDICT r7 #4): each commit writes an O(partitions) rollup sidecar
    maintained incrementally from the parent's (file/row/byte deltas
    are additive); ``partitions()`` answers from it with NO manifest
    fold — asserted in-band by checking the sidecar exists for the
    served snapshot. Two hash-distributed writes → exactly 2 files per
    segment partition, value-verified against the raw data.

    Scale: the sidecar write is O(partitions) at commit; the read is
    O(partitions) always — at 10^6 files / 10^3 partitions that's the
    difference between a metadata fold and a dict load.
    """
    import os as _os

    root = _scratch()
    try:
        tbl = LakehouseTable(spark, root + "/t")
        cust = _cust(spark, sf_dir)
        half = F.col("c_custkey") % 2
        tbl.overwrite(
            cust.filter(half == 0),
            partition_by=["c_mktsegment"],
            distribution="hash",
        )
        tbl.append(
            cust.filter(half == 1),
            partition_by=["c_mktsegment"],
            distribution="hash",
        )
        assert _os.path.exists(
            tbl._pstats_path(tbl.current_version())
        ), "partition-stats sidecar missing"
        out = tbl.partitions().select(
            "partition", "file_count", "row_count"
        )
        return _materialize(out)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# -- distributed BPE merge-loop training (VERDICT r7 #5) -----------------
#
# K unrolled merge iterations over the word-TYPE frequency dictionary
# (the ann_kmeans_cells fixed-budget pattern: each round = pair count →
# argmax merge → re-segment). Symbols travel as a string with DOUBLE
# \x1f boundaries ("\x1f\x1fa\x1f\x1fb\x1f\x1f"); one merge round is a
# LITERAL replace of "\x1fa\x1f\x1fb\x1f" with "\x1fab\x1f" — the search
# pattern claims only the INNER half of each outer boundary, so
# adjacent matches don't steal each other's boundary chars and both
# engines' greedy left-to-right non-overlapping replace() IS the BPE
# merge rule exactly (single separators fail on self-adjacent pairs:
# 'aaaa' must segment [aa,aa], not [aa,a,a]). That makes the whole
# K-round training oracle-checkable as a DuckDB unrolled CTE chain
# (list_reduce is unusable per the cross-engine-float-traps memory).

_BPE_SEP = "\x1f"
_BPE_K = 6


def _bpe_oracle(k: int) -> str:
    s = _BPE_SEP
    ctes = [
        f"""words0 AS (
            SELECT '{s}{s}' || regexp_replace(w, '(.)', '\\1{s}{s}', 'g')
                       AS syms,
                   count(*) AS freq
            FROM (
                SELECT unnest(string_split(text, ' ')) AS w FROM documents
            )
            WHERE regexp_matches(w, '^[a-z]{{2,}}$')
            GROUP BY 1
        )"""
    ]
    for i in range(k):
        ctes.append(
            f"""pairs{i} AS (
            SELECT L[i] || '{s}' || L[i + 1] AS pair,
                   sum(freq) AS weight
            FROM (
                SELECT list_filter(string_split(syms, '{s}'),
                                   x -> x <> '') AS L,
                       freq
                FROM words{i}
            ), unnest(range(1, len(L))) AS t(i)
            GROUP BY 1
        ),
        best{i} AS (
            SELECT pair, weight FROM pairs{i}
            ORDER BY weight DESC, pair LIMIT 1
        ),
        words{i + 1} AS (
            SELECT replace(syms,
                           '{s}' || replace(pair, '{s}', '{s}{s}') || '{s}',
                           '{s}' || replace(pair, '{s}', '') || '{s}')
                       AS syms,
                   freq
            FROM words{i}, best{i}
        )"""
        )
    selects = "\n        UNION ALL\n".join(
        f"""        SELECT {i + 1} AS step,
               string_split(pair, '{s}')[1] AS left_sym,
               string_split(pair, '{s}')[2] AS right_sym,
               replace(pair, '{s}', '') AS merged,
               CAST(weight AS BIGINT) AS weight
        FROM best{i}"""
        for i in range(k)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + selects


def bpe_train_merges(
    spark: SparkSession, sf_dir: str, k: int = _BPE_K
) -> DataFrame:
    """K rounds of BPE merge training over the corpus word-type
    dictionary; returns one row per round (step, left/right symbol,
    merged token, corpus weight)."""
    docs = load_table(spark, sf_dir, "documents")
    return bpe_merges_from_docs(spark, docs, k)


def bpe_merges_from_docs(
    spark: SparkSession, docs: DataFrame, k: int = _BPE_K
) -> DataFrame:
    merges, _ = _bpe_train(spark, docs, k)
    return merges


def _bpe_train(spark: SparkSession, docs: DataFrame, k: int):
    """(merge-table DataFrame, final re-segmented word dictionary)."""
    s = _BPE_SEP
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w").rlike("^[a-z]{2,}$"))
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
        .select(
            F.concat(
                F.lit(s + s), F.regexp_replace("w", "(.)", "$1" + s + s)
            ).alias("syms"),
            "freq",
        )
        # pin the dictionary: every round re-reads it for the pair
        # count AND rewrites it for the merge — without the checkpoint
        # each round would recompute the whole upstream chain (the
        # ranking-helper lesson), and the K-deep replace() column chain
        # would grow under project-collapse (the Hilbert lesson)
        .localCheckpoint(eager=True)
    )
    out_rows = []
    for step in range(1, k + 1):
        arr = F.filter(F.split("syms", s), lambda x: x != F.lit(""))
        pairs = (
            words.select(arr.alias("L"), "freq")
            .filter(F.size("L") >= 2)
            .select(
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size("L") - 1),
                        lambda i: F.concat(
                            F.element_at(F.col("L"), i),
                            F.lit(s),
                            F.element_at(F.col("L"), i + 1),
                        ),
                    )
                ).alias("pair"),
                "freq",
            )
            .groupBy("pair")
            .agg(F.sum("freq").alias("weight"))
            .orderBy(F.col("weight").desc(), "pair")
            .limit(1)
            .collect()  # exactly one small row per round
        )
        pair, weight = pairs[0]["pair"], int(pairs[0]["weight"])
        a, b = pair.split(s)
        out_rows.append((step, a, b, a + b, weight))
        words = words.select(
            F.replace(
                F.col("syms"),
                F.lit(s + a + s + s + b + s),
                F.lit(s + a + b + s),
            ).alias("syms"),
            "freq",
        ).localCheckpoint(eager=True)
    merges = spark.createDataFrame(
        out_rows,
        "step int, left_sym string, right_sym string,"
        " merged string, weight long",
    )
    return merges, words


@query("tokenizer_bpe_merge_training", oracle=_bpe_oracle(_BPE_K))
def tokenizer_bpe_merge_training(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Distributed BPE tokenizer training, K merge rounds end to end
    (VERDICT r7 #5 — extends bpe_merge_pair_counts' single pair-count
    to the full loop): each round counts adjacent symbol pairs weighted
    by word-type frequency (partial aggregate, |alphabet'|² shuffle
    rows per task), picks the argmax merge (deterministic tie-break),
    and re-segments the dictionary with ONE literal string replace —
    greedy left-to-right non-overlapping in both engines, i.e. the BPE
    merge rule itself. The learned merge table (step, pair, weight) is
    the query result, value-hash-checked against a K-stage unrolled
    DuckDB CTE chain.

    Scale: the unit of work is the word-TYPE dictionary (vocabulary-
    sized, not corpus-sized — the classic BPE trick); each round is one
    partial-aggregated count plus a map-side projection, dictionary
    pinned between rounds so round i+1 never recomputes round i.
    """
    return bpe_train_merges(spark, sf_dir, _BPE_K)


@query(
    "lakehouse_variant_shredded_scan",
    oracle="""
        SELECT c_mktsegment AS seg,
               count(*) AS n_rows,
               CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents_sum
        FROM customer
        WHERE CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) >= 450000
        GROUP BY 1
    """,
)
def lakehouse_variant_shredded_scan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """VARIANT columns through the lakehouse (VERDICT r7 #6): the
    declared schema keeps Spark 4's VARIANT (semi-structured payloads —
    the JSON-properties shape the reference's events feed would carry),
    physically stored as canonical JSON text (parquet-native variant is
    not pyarrow-readable, and the whole metadata layer here is
    pyarrow-footed), with a TYPED SHREDDED stat column
    (``variant_shred`` → ``__shred_props_cents``) whose footer min/max
    land in the manifest — so this query's range scan file-prunes on a
    field INSIDE the variant (asserted in-band: the low-cents file is
    never opened) and then aggregates via ``variant_get``.

    Scale: shredding adds one typed column per declared field at write;
    pruning is the ordinary stats fold — no JSON is parsed for files
    the range excludes.
    """
    root = _scratch()
    try:
        tbl = LakehouseTable(spark, root + "/t")
        cust = _cust(spark, sf_dir).select(
            "c_custkey",
            F.parse_json(
                F.concat(
                    F.lit('{"cents":'),
                    F.col("cents").cast("string"),
                    F.lit(',"seg":"'),
                    F.col("c_mktsegment"),
                    F.lit('"}'),
                )
            ).alias("props"),
            "cents",
        )
        shred = {"props": {"cents": ("$.cents", "long")}}
        lo = cust.filter(F.col("cents") < 450000)
        hi = cust.filter(F.col("cents") >= 450000)
        for part in (lo, hi):
            tbl.append(
                part.drop("cents")
                .coalesce(1)
                .sortWithinPartitions("c_custkey"),
                variant_shred=shred,
            )
        pruned = tbl.scan({"__shred_props_cents": (450000, None)})
        assert len(pruned.inputFiles()) == 1, "shred pruning failed"
        out = (
            pruned.select(
                F.expr("variant_get(props, '$.seg', 'string')").alias(
                    "seg"
                ),
                F.expr("variant_get(props, '$.cents', 'long')").alias(
                    "cents"
                ),
            )
            .filter(F.col("cents") >= 450000)
            .groupBy("seg")
            .agg(
                F.count("*").alias("n_rows"),
                F.sum("cents").alias("cents_sum"),
            )
        )
        return _materialize(out)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _bpe_compress_oracle(k: int) -> str:
    s = _BPE_SEP
    base = _bpe_oracle(k)
    ctes = base[len("WITH ") : base.index("\n        SELECT 1 AS step")]
    return f"""WITH {ctes},
        sized AS (
            SELECT w0.freq,
                   len(list_filter(string_split(w0.syms, '{s}'),
                       x -> x <> '')) AS n_chars,
                   len(list_filter(string_split(wk.syms, '{s}'),
                       x -> x <> '')) AS n_bpe
            FROM (SELECT syms, freq,
                         row_number() OVER (ORDER BY syms) AS rn
                  FROM words0) w0
            JOIN (SELECT syms, freq,
                         row_number() OVER (ORDER BY replace(syms,
                             '{s}', '')) AS rn
                  FROM words{k}) wk USING (rn)
        )
        SELECT CAST(sum(freq) AS BIGINT) AS n_word_tokens,
               count(*) AS n_word_types,
               CAST(sum(freq * n_chars) AS BIGINT) AS char_symbols,
               CAST(sum(freq * n_bpe) AS BIGINT) AS bpe_symbols
        FROM sized"""


@query(
    "tokenizer_bpe_apply_compression",
    oracle=_bpe_compress_oracle(_BPE_K),
)
def tokenizer_bpe_apply_compression(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """BPE APPLICATION at corpus scale: train K merges
    (tokenizer_bpe_merge_training's loop), apply them to the word-type
    dictionary, and report the corpus-level compression — total word
    tokens, character symbols before, BPE symbols after. The
    token-count delta is the quantity a training-data pipeline budgets
    by (sequence lengths, packing density); computing it on the TYPE
    dictionary and weighting by frequency makes application O(vocab),
    not O(corpus).

    The oracle re-runs the same K unrolled rounds in DuckDB and joins
    the round-0 and round-K dictionaries positionally (merges never
    reorder or drop word types — symbol content minus separators is
    invariant, which the join key's sort exploits).
    """
    from ..sources.io import load_table as _lt

    docs = _lt(spark, sf_dir, "documents")
    _, words = _bpe_train(spark, docs, _BPE_K)
    s = _BPE_SEP
    arr = F.filter(F.split("syms", s), lambda x: x != F.lit(""))
    out = words.select(
        "freq",
        F.size(arr).alias("n_bpe"),
        F.length(F.regexp_replace("syms", s, "")).alias("n_chars"),
    ).agg(
        F.sum("freq").alias("n_word_tokens"),
        F.count("*").alias("n_word_types"),
        F.sum(F.col("freq") * F.col("n_chars")).alias("char_symbols"),
        F.sum(F.col("freq") * F.col("n_bpe")).alias("bpe_symbols"),
    )
    return out


@query(
    "lakehouse_table_properties_report",
    oracle="""
        SELECT * FROM (VALUES
            ('changelog.broadcast-threshold-rows', NULL, '100000'),
            ('history.expire.min-snapshots-to-keep', '2', '2'),
            ('owner.team', 'data-eng', 'data-eng'),
            ('read.dv.inline-threshold-rows', NULL, '100000'),
            ('write.distribution-mode', 'hash', 'hash'),
            ('write.merge.broadcast-threshold-rows', NULL, '100000')
        ) AS t(property_key, stored_value, effective_value)
    """,
)
def lakehouse_table_properties_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Table properties (Iceberg TBLPROPERTIES) that DRIVE engine
    behavior: ``write.distribution-mode=hash`` makes every partitioned
    write cluster to one file per partition tuple (asserted in-band via
    the partition-stats sidecar), the merge/changelog broadcast
    thresholds and the DV decode regime resolve through the same store,
    and ``history.expire.min-snapshots-to-keep`` floors retention.
    Explicit method arguments always win; unset keys read their engine
    default. The report lists every behavior key (plus free-form
    metadata) with stored vs effective values — the ALTER TABLE SET
    TBLPROPERTIES audit surface.

    Scale: the store is one tiny sidecar read per operation — no
    snapshot carries config (the partition-layout-erosion lesson).
    """
    root = _scratch()
    try:
        tbl = LakehouseTable(spark, root + "/t")
        tbl.set_property("write.distribution-mode", "hash")
        tbl.set_property("history.expire.min-snapshots-to-keep", 2)
        tbl.set_property("owner.team", "data-eng")
        cust = _cust(spark, sf_dir)
        # the property (not an argument) must produce one file per
        # segment partition
        tbl.append(
            cust.repartition(8), partition_by=["c_mktsegment"]
        )
        parts = {
            r["partition"]: r["file_count"]
            for r in tbl.partitions().collect()
        }
        assert parts and all(n == 1 for n in parts.values()), parts
        stored = tbl.properties()
        keys = sorted(set(stored) | set(tbl.PROPERTY_DEFAULTS))
        rows = [
            (k, stored.get(k), tbl.get_property(k)) for k in keys
        ]
        return spark.createDataFrame(
            rows,
            "property_key string, stored_value string,"
            " effective_value string",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)

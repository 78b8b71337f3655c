"""Custom stateful streaming: per-user running aggregates via
``applyInPandasWithState`` — the operator class the guide reserves for
semantics the built-in windowed aggregations can't express.

Implemented operator: per-user cumulative event count + running value
total, emitted once per micro-batch per active user. The batch-mode
equivalent (a plain groupBy) verifies totals; the streaming test feeds
the same rows in two micro-batches and asserts state carries across
batches — the property that distinguishes stateful processing from
per-batch aggregation.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..registry import query
from ..sources.io import load_table

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def _update_user_state(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """State kernel: fold this micro-batch's rows for one user into the
    persisted (count, total) pair; emit the updated running values."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
    )


def running_user_totals_stream(events_stream: DataFrame) -> DataFrame:
    """Wire the state kernel into a streaming plan (update output mode)."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update_user_state,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


@query(
    "stateful_running_user_totals",
    oracle="""
        SELECT user_id, count(*) AS n_events,
               round(sum(value), 2) AS total_value
        FROM events GROUP BY user_id
    """,
)
def stateful_running_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch projection of the stateful operator's final state: after all
    input is folded, per-user (count, total) equals the plain aggregate —
    which is the oracle. The cross-micro-batch state carry is asserted by
    tests/test_streaming.py::test_state_carries_across_batches.

    Scale: state lives partitioned by key in the state store (RocksDB in
    prod); shuffle is on user_id only. The float total is summed in
    pandas per batch — acceptable for running metrics; exact totals at
    rest belong to the batch aggregate."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


# --- Spark 4 transformWithStateInPandas: handle-based arbitrary state ------

PROFILE_OUTPUT_SCHEMA = (
    "user_id long, n_events long, total_value double, max_value double"
)


def _make_profile_processor():
    """Processor built lazily so importing this module never requires the
    streaming runtime. State is a single ValueState row (n, total, mx) —
    the handle API also offers ListState/MapState and timers, which
    applyInPandasWithState (the older GroupState API above) cannot
    express."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserProfileProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._profile = handle.getValueState(
                "profile", "n long, total double, mx double"
            )

        def handleInputRows(self, key, rows, timerValues):
            if self._profile.exists():
                n, total, mx = self._profile.get()
            else:
                n, total, mx = 0, 0.0, float("-inf")
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                mx = max(mx, float(pdf["value"].max()))
            self._profile.update((n, total, mx))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 2)],
                    "max_value": [round(mx, 2)],
                }
            )

        def close(self) -> None:
            pass

    return UserProfileProcessor()


def user_profile_stream_tws(events_stream: DataFrame) -> DataFrame:
    """Wire the StatefulProcessor into a streaming plan.

    transformWithState requires the RocksDB state store; the session-level
    conf below binds new streaming queries to it (at scale this is also
    the right provider: state spills to disk and checkpoints
    incrementally, where the default HDFS-backed provider keeps every
    version on-heap)."""
    spark = events_stream.sparkSession
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    return events_stream.groupBy("user_id").transformWithStateInPandas(
        _make_profile_processor(),
        outputStructType=PROFILE_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


@query(
    "stateful_user_profile",
    oracle="""
        SELECT user_id, count(*) AS n_events,
               round(sum(value), 2) AS total_value,
               round(max(value), 2) AS max_value
        FROM events GROUP BY user_id
    """,
)
def stateful_user_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch projection of the transformWithStateInPandas operator's final
    state (count / running total / running max per user): after all input
    folds, it equals this plain aggregate — the oracle. Cross-batch state
    carry through the RocksDB store is asserted by
    tests/test_streaming.py::test_transform_with_state_carries_across_batches
    (environment-gated: the transformWithState Python state-server needs
    the protobuf package, absent in this container; the wiring in
    ``user_profile_stream_tws`` is real and runs wherever protobuf is
    installed — the applyInPandasWithState kernel above is the
    runs-everywhere stateful path).

    Scale: same contract as the GroupState kernel above — state
    partitioned by key, shuffle on user_id only — plus RocksDB spill and
    incremental checkpointing, which is what makes 10^9-key state
    feasible per executor."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
        F.round(F.max("value"), 2).alias("max_value"),
    )

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

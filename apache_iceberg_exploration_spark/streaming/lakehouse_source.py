"""Structured Streaming SOURCE over a lakehouse table.

Iceberg's streaming read (``spark.readStream.format("iceberg")``)
rebuilt on the Spark 4 Python Data Source API: each micro-batch consumes
the data files ADDED between two snapshot versions — the streaming twin
of ``LakehouseTable.read_incremental`` (same appends-only contract:
row-level deletes don't rewrite history; consume them via the changelog
feed / CDC queries instead).

Offsets are snapshot versions (``{"version": N}``), so the source
inherits the table's commit semantics: a micro-batch is exactly the
rows of a consecutive snapshot range, replay of a committed range
(``readBetweenOffsets``) is deterministic because manifests are
immutable, and exactly-once end-to-end follows when the sink is
idempotent (streaming/sinks.py).

The reader here is the SIMPLE (driver-side) variant — it materializes
each increment with pyarrow on the driver, which is right for
metadata-paced increments (a commit's delta) in this container. The
scale path is mechanical: the same offset logic in a partition-planning
``DataSourceStreamReader`` whose ``partitions(start, end)`` returns one
input partition per added file, so executors read the parquet directly
— offsets, manifest walking, and semantics identical.

Manifest access is self-contained (json + glob, parts-aware) because
the DataSource runs outside any SparkSession.
"""

from __future__ import annotations

import glob
import json
import os


def _current_version(root: str) -> int:
    snap = os.path.join(root, "snapshots")
    if not os.path.isdir(snap):
        return 0
    return max(
        (
            int(os.path.basename(p)[1:-5])
            for p in glob.glob(os.path.join(snap, "v*.json"))
        ),
        default=0,
    )


def _manifest_files(root: str, version: int) -> list[str]:
    """File list of a snapshot, materializing manifest parts (mirrors
    LakehouseTable._materialize_manifest without needing Spark)."""
    if version <= 0:
        return []
    path = os.path.join(root, "snapshots", f"v{version}.json")
    if not os.path.exists(path):
        return []
    with open(path) as f:
        m = json.load(f)
    if "files" in m:
        return m["files"]
    files: list[str] = []
    for ppath in m.get("parts", []):
        with open(ppath) as f:
            files.extend(json.load(f)["files"])
    return files


def _added_files(root: str, since: int, until: int) -> list[str]:
    base = set(_manifest_files(root, since))
    return [f for f in _manifest_files(root, until) if f not in base]


def make_lakehouse_stream_source():
    """Build (and return) the DataSource class. Deferred import keeps the
    module importable on Spark versions without the Python Data Source
    API."""
    from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

    class _Reader(SimpleDataSourceStreamReader):
        def __init__(self, root: str):
            self.root = root

        def initialOffset(self) -> dict:
            # start-from-scratch: the first batch replays the whole table
            return {"version": 0}

        def _rows_for(self, files: list[str]):
            # a LIST, not a generator: the runtime pickles the batch into
            # its prefetch cache so replay needn't re-read the source
            import pyarrow.parquet as pq

            rows: list[tuple] = []
            for f in files:
                for batch in pq.ParquetFile(f).iter_batches():
                    rows.extend(zip(*[c.to_pylist() for c in batch.columns]))
            return rows

        def read(self, start: dict):
            until = _current_version(self.root)
            since = start["version"]
            if until <= since:
                return [], start
            files = _added_files(self.root, since, until)
            return self._rows_for(files), {"version": until}

        def readBetweenOffsets(self, start: dict, end: dict):
            # replay after restart: manifests are immutable, so the same
            # offset range always yields the same rows
            return self._rows_for(
                _added_files(self.root, start["version"], end["version"])
            )

        def commit(self, end: dict) -> None:
            pass  # progress lives in the checkpoint; nothing to release

    class LakehouseStreamSource(DataSource):
        """``spark.readStream.format("lakehouse_stream")
        .option("path", <table root>)`` — snapshot-increment streaming."""

        @classmethod
        def name(cls) -> str:
            return "lakehouse_stream"

        def schema(self):
            from pyspark.sql.pandas.types import from_arrow_schema

            root = self.options["path"]
            files = _manifest_files(root, _current_version(root))
            if not files:
                raise ValueError(f"empty lakehouse table at {root}")
            import pyarrow.parquet as pq

            return from_arrow_schema(pq.ParquetFile(files[0]).schema_arrow)

        def simpleStreamReader(self, schema):
            return _Reader(self.options["path"])

    return LakehouseStreamSource


from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from ..registry import query  # noqa: E402
from ..sources.io import load_table  # noqa: E402


@query(
    "streaming_lakehouse_source_ingest",
    oracle="""
        SELECT c_mktsegment,
               count(*) AS n_customers,
               CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS bal_cents
        FROM customer
        GROUP BY 1
    """,
)
def streaming_lakehouse_source_ingest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming read FROM the lakehouse: customer lands in the table as
    three snapshot commits, then a Structured Streaming query consumes
    the table through the ``lakehouse_stream`` source (offsets =
    snapshot versions) with Trigger.AvailableNow into a memory sink —
    drains every committed increment then stops, so the aggregate equals
    the batch oracle over all rows. This is Iceberg's
    ``readStream.format("iceberg")`` capability on our table format:
    the table is now a message-bus-free streaming upstream, completing
    the loop with the exactly-once foreachBatch SINK (streaming/
    sinks.py) — lakehouse→lakehouse incremental pipelines with no Kafka
    in the middle.

    Scale note (also in module docstring): the simple reader
    materializes increments driver-side; the partition-planning variant
    of the SAME offset logic hands one file per input partition to
    executors. Offsets are snapshot versions, so replay is
    deterministic (immutable manifests) and end-to-end exactly-once
    composes with the idempotent sink."""
    import shutil
    import tempfile

    from ..sources.lakehouse import LakehouseTable

    root = tempfile.mkdtemp(prefix="lakehouse_stream_q_", dir="/tmp")
    try:
        tbl = LakehouseTable(spark, root + "/t")
        cust = load_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_mktsegment", "c_acctbal"
        )
        for i in range(3):
            tbl.append(cust.filter(F.col("c_custkey") % 3 == i))

        spark.dataSource.register(make_lakehouse_stream_source())
        stream = (
            spark.readStream.format("lakehouse_stream")
            .option("path", root + "/t")
            .load()
        )
        agg = stream.groupBy("c_mktsegment").agg(
            F.count("*").alias("n_customers"),
            F.sum(
                F.floor(F.col("c_acctbal") * 100 + 0.5).cast("long")
            )
            .cast("long")
            .alias("bal_cents"),
        )
        from .windows import _run_available_now

        out = _run_available_now(agg, "complete")
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)

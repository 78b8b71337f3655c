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

Two interchangeable readers share the offset logic:
``lakehouse_stream`` (SimpleDataSourceStreamReader — driver-side
materialization, right for metadata-paced trickles) and
``lakehouse_stream_dist`` (DataSourceStreamReader — the driver only
walks manifests; each added file is one input partition read on the
executors as Arrow record batches, the 100 TB shape).

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
        def __init__(
            self,
            root: str,
            starting_version: int = 0,
            max_versions_per_trigger: int | None = None,
        ):
            self.root = root
            self.starting_version = starting_version
            self.max_versions = max_versions_per_trigger

        def initialOffset(self) -> dict:
            # 0 = replay the whole table in the first batch; a
            # startingVersion consumes only commits AFTER that snapshot
            # (Iceberg's stream-from-snapshot)
            return {"version": self.starting_version}

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
            # rate limit (Iceberg streaming-read limits): admit at most
            # maxVersionsPerTrigger commits per micro-batch so a
            # backlogged table drains in bounded batches. Implemented
            # HERE because read(start) sees the checkpointed offset —
            # restart-safe by construction (the dist reader's no-args
            # latestOffset() cannot express this; its JVM ReadLimit
            # counterpart isn't surfaced to Python yet).
            until = _current_version(self.root)
            since = start["version"]
            if self.max_versions is not None:
                until = min(until, since + self.max_versions)
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
            opts = {k.lower(): v for k, v in self.options.items()}
            mv = opts.get("maxversionspertrigger")
            return _Reader(
                opts["path"],
                int(opts.get("startingversion", 0)),
                int(mv) if mv is not None else None,
            )

    return LakehouseStreamSource


def make_lakehouse_stream_dist_source():
    """The SCALE variant: a partition-planning ``DataSourceStreamReader``.
    The driver only walks manifests (latestOffset / partitions); each
    added file becomes one input partition whose parquet is read ON THE
    EXECUTOR as Arrow record batches — no row ever crosses the driver.
    Offset semantics are identical to the simple reader, so the two are
    drop-in interchangeable; this one is the 100 TB shape (a commit with
    10k new files fans out to 10k tasks)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    class _DistReader(DataSourceStreamReader):
        def __init__(self, root: str, starting_version: int = 0):
            self.root = root
            self.starting_version = starting_version

        def initialOffset(self) -> dict:
            return {"version": self.starting_version}

        def latestOffset(self) -> dict:
            # no rate limit here: this API variant's no-args
            # latestOffset() cannot see the checkpointed position, so a
            # reader-local throttle would regress offsets after restart.
            # Use the simple reader's maxVersionsPerTrigger for bounded
            # catch-up, or the JVM ReadLimit API once surfaced to Python.
            return {"version": _current_version(self.root)}

        def partitions(self, start: dict, end: dict):
            files = _added_files(
                self.root, start["version"], end["version"]
            )
            return [InputPartition(f) for f in files]

        def read(self, partition):
            # executor-side: stream the file as Arrow batches (zero-copy
            # into Spark's Arrow pipe, no Python row materialization)
            import pyarrow.parquet as pq

            yield from pq.ParquetFile(partition.value).iter_batches()

        def commit(self, end: dict) -> None:
            pass

    class LakehouseStreamDistSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "lakehouse_stream_dist"

        def schema(self):
            from pyspark.sql.pandas.types import from_arrow_schema

            root = self.options["path"]
            files = _manifest_files(root, _current_version(root))
            if not files:
                raise ValueError(f"empty lakehouse table at {root}")
            import pyarrow.parquet as pq

            return from_arrow_schema(pq.ParquetFile(files[0]).schema_arrow)

        def streamReader(self, schema):
            opts = {k.lower(): v for k, v in self.options.items()}
            return _DistReader(
                opts["path"], int(opts.get("startingversion", 0))
            )

    return LakehouseStreamDistSource


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

    This query drives the DISTRIBUTED reader (one input partition per
    added file, executor-side Arrow batch reads — the driver only walks
    manifests); the simple driver-side reader shares the same offsets
    and is exercised by the restart-continuity test. Offsets are
    snapshot versions, so replay is deterministic (immutable manifests)
    and end-to-end exactly-once composes with the idempotent sink."""
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

        spark.dataSource.register(make_lakehouse_stream_dist_source())
        stream = (
            spark.readStream.format("lakehouse_stream_dist")
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

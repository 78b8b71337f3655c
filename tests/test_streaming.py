"""Streaming machinery tests: cross-batch state carry for the custom
stateful operator, and foreachBatch → lakehouse MERGE (the production
sink shape replacing the reference's daily overwrite)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_iceberg_exploration_spark.sources.io import load_table
from apache_iceberg_exploration_spark.sources.lakehouse import LakehouseTable
from apache_iceberg_exploration_spark.streaming._wait import (
    await_or_raise,
)
from apache_iceberg_exploration_spark.streaming.stateful import (
    running_user_totals_stream,
)

from .conftest import SF_SMOKE


def _two_batch_stream_dir(spark, tmp_path):
    """Split events into two parquet files in a streaming source dir so a
    maxFilesPerTrigger=1 stream sees two micro-batches."""
    ev = load_table(spark, SF_SMOKE, "events")
    d = str(tmp_path / "stream_src")
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(f"{d}/b0")
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(f"{d}/b1")
    return d, ev


def test_state_carries_across_batches(spark, tmp_path):
    d, ev = _two_batch_stream_dir(spark, tmp_path)
    schema = ev.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(d)
    )
    out = running_user_totals_stream(stream)
    name = "state_test_out"
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    await_or_raise(q, 300)
    q.stop()
    # update-mode memory sink appends every emission; the LAST emission per
    # user must equal the all-data aggregate — proving state crossed the
    # micro-batch boundary (a per-batch agg would emit only batch counts).
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    assert len(rows) > ev.select("user_id").distinct().count()  # >1 batch emitted
    last = {}
    for r in rows:  # memory sink preserves batch order
        last[r.user_id] = (r.n_events, r.total_value)
    expected = {
        r.user_id: (r.n, round(r.s, 2))
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert {u: v[0] for u, v in last.items()} == {
        u: v[0] for u, v in expected.items()
    }


def test_foreachbatch_merge_into_lakehouse(spark, tmp_path):
    """foreachBatch + MERGE: each micro-batch upserts per-user totals into
    a lakehouse table — the exactly-once-style sink pattern that replaces
    the reference's full overwrite (etl.py:51-54)."""
    d, ev = _two_batch_stream_dir(spark, tmp_path)
    tbl = LakehouseTable(spark, str(tmp_path / "gold_users"))
    base = (
        ev.limit(0)
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
    )
    tbl.overwrite(spark.createDataFrame([], base.schema))

    def upsert(batch_df, batch_id):
        agg = batch_df.groupBy("user_id").agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        tbl.merge_into(
            agg,
            on=["user_id"],
            update_cols={
                "n_events": F.col("t.n_events") + F.col("s.n_events"),
                "total_value": F.round(
                    F.col("t.total_value") + F.col("s.total_value"), 2
                ),
            },
        )

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(d)
    )
    q = stream.writeStream.foreachBatch(upsert).trigger(availableNow=True).start()
    await_or_raise(q, 300)
    q.stop()

    got = {r.user_id: r.n_events for r in tbl.read().collect()}
    want = {
        r.user_id: r.n
        for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert got == want
    assert tbl.snapshots()[-1]["operation"] == "merge"


def test_streaming_sliding_and_session_windows(spark, tmp_path):
    """Real readStream runs of the sliding and session window plans —
    AvailableNow over two files; results equal the batch forms."""
    d, ev = _two_batch_stream_dir(spark, tmp_path)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(d)
    )

    sliding = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "2 hours", "1 hour"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("window.start").alias("ws"), "n_events")
    )
    q = (
        sliding.writeStream.outputMode("complete")
        .format("memory").queryName("slide_out")
        .trigger(availableNow=True).start()
    )
    await_or_raise(q, 300); q.stop()
    got = {r.ws: r.n_events for r in spark.sql("SELECT * FROM slide_out").collect()}
    want = {
        r.ws: r.n
        for r in ev.groupBy(F.window("ts", "2 hours", "1 hour"))
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").alias("ws"), "n").collect()
    }
    assert got == want

    session = (
        stream.withWatermark("ts", "1 hour")
        .groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count("*").alias("n_events"))
        .select("user_id", F.col("session_window.start").alias("ss"), "n_events")
    )
    q2 = (
        session.writeStream.outputMode("complete")
        .format("memory").queryName("sess_out")
        .trigger(availableNow=True).start()
    )
    await_or_raise(q2, 300); q2.stop()
    got2 = {
        (r.user_id, r.ss): r.n_events
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }
    want2 = {
        (r.user_id, r.ss): r.n
        for r in ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count("*").alias("n"))
        .select("user_id", F.col("session_window.start").alias("ss"), "n")
        .collect()
    }
    assert got2 == want2


def test_watermark_drops_late_data(spark, tmp_path):
    """Append-mode windowed aggregation with a watermark must (a) only
    emit windows the watermark has closed, and (b) IGNORE rows arriving
    after the watermark passed their window — the late-data contract the
    reference's batch polling cannot express (SURVEY.md §2.9)."""
    import datetime as dt

    from pyspark.sql import Row, types as T

    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("k", T.StringType()),
        ]
    )
    base = dt.datetime(2024, 1, 1, 10, 0, 0)

    def rows(*mins):
        return [Row(ts=base + dt.timedelta(minutes=m), k="a") for m in mins]

    src = str(tmp_path / "late_src")
    ckpt = str(tmp_path / "late_ckpt")
    # batch 1: window [10:00,10:15) gets 2 rows; advance event time to
    # 11:00 so the 5-minute watermark (10:55) closes that window.
    spark.createDataFrame(rows(1, 5, 60), schema).coalesce(1).write.parquet(
        f"{src}/b0"
    )

    def run_batch():
        # foreachBatch (not memory sink): the only in-test sink that
        # supports restarting from the checkpoint, which this test needs
        # to carry the watermark across runs.
        emitted = []

        def collect_batch(bdf, _bid):
            emitted.extend(bdf.collect())

        stream = (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )
        agg = (
            stream.withWatermark("ts", "5 minutes")
            .groupBy(F.window("ts", "15 minutes"), "k")
            .count()
            .select(F.col("window.start").alias("ws"), "k", "count")
        )
        q = (
            agg.writeStream.outputMode("append")
            .foreachBatch(collect_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q, 300)
        q.stop()
        return {(r.ws, r.k): r["count"] for r in emitted}

    first = run_batch()
    assert first.get((base, "a")) == 2, first  # closed window emitted once

    # batch 2: a LATE row for the already-closed 10:00 window (10:07,
    # far below the 10:55 watermark) plus fresh rows at 12:00 that close
    # the 11:00 window. The late row must not re-emit or change 10:00.
    spark.createDataFrame(rows(7, 120), schema).coalesce(1).write.parquet(
        f"{src}/b1"
    )
    second = run_batch()
    emitted_1000 = [v for (ws, k), v in second.items() if ws == base]
    assert emitted_1000 in ([], [2]), second  # never 3, never a second emit
    hour_11 = base + dt.timedelta(minutes=60)
    assert second.get((hour_11, "a")) == 1, second  # 11:00 window closed now


def test_transform_with_state_carries_across_batches(spark, tmp_path):
    """Spark 4 transformWithStateInPandas (handle-based ValueState over
    RocksDB): the LAST emission per user across two micro-batches must
    equal the all-data aggregate — state crossed the batch boundary.

    Gated: the transformWithState Python state-server speaks protobuf to
    the JVM; without the protobuf package (absent in this container) the
    operator cannot start, so the test skips rather than fakes."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithStateInPandas state server requires protobuf",
    )
    from apache_iceberg_exploration_spark.streaming.stateful import (
        user_profile_stream_tws,
    )

    d, ev = _two_batch_stream_dir(spark, tmp_path)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(d)
    )
    out = user_profile_stream_tws(stream)
    name = "tws_test_out"
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    await_or_raise(q, 300)
    q.stop()
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    assert len(rows) > ev.select("user_id").distinct().count()  # >1 batch
    last = {}
    for r in rows:  # memory sink preserves batch order
        last[r.user_id] = (r.n_events, r.total_value, r.max_value)
    expected = {
        r.user_id: (r.n, round(r.s, 2), round(r.m, 2))
        for r in ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("s"),
            F.max("value").alias("m"),
        )
        .collect()
    }
    assert {u: v[0] for u, v in last.items()} == {
        u: v[0] for u, v in expected.items()
    }
    assert {u: v[2] for u, v in last.items()} == {
        u: v[2] for u, v in expected.items()
    }


def test_foreachbatch_idempotent_replay(spark, tmp_path):
    """Exactly-once sink (streaming.sinks): batch ids are recorded in the
    commit summary atomically with the data; replaying a micro-batch —
    Structured Streaming's at-least-once failure mode — is a no-op."""
    from apache_iceberg_exploration_spark.streaming.sinks import (
        applied_batch_ids,
        idempotent_foreach_batch,
    )

    d, ev = _two_batch_stream_dir(spark, tmp_path)
    tbl = LakehouseTable(spark, str(tmp_path / "events_append"))
    tbl.overwrite(ev.limit(0))

    def apply(table, batch_df, summary_extra):
        return table.append(batch_df, summary_extra=summary_extra)

    sink = idempotent_foreach_batch(tbl, apply)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(d)
    )
    q = stream.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    await_or_raise(q, 300)
    q.stop()

    total = ev.count()
    assert tbl.read().count() == total
    assert applied_batch_ids(tbl) == {0, 1}

    # simulate the crash-between-commit-and-checkpoint replay: the SAME
    # batch (id + rows) is delivered again -> no new snapshot, no new rows
    v_before = tbl.current_version()
    sink(ev.filter(F.col("event_id") % 2 == 0), 0)
    assert tbl.current_version() == v_before
    assert tbl.read().count() == total

    # a genuinely new batch id still commits
    sink(ev.filter(F.col("event_id") % 2 == 1).limit(5), 2)
    assert tbl.current_version() == v_before + 1
    assert tbl.read().count() == total + 5


def test_cdc_upsert_latest_is_batch_slicing_invariant(spark, tmp_path):
    """The conditional-update CDC upsert (streaming_cdc_upsert_latest's
    sink) must converge to the per-key argmax no matter how the stream is
    sliced: here the two micro-batches INTERLEAVE in event time (split by
    event_id parity), so batch 2 delivers events both older and newer
    than batch 1's winners — the ordering gate has to reject the former
    and apply the latter."""
    from pyspark.sql import Window

    from apache_iceberg_exploration_spark.streaming.sinks import (
        idempotent_foreach_batch,
    )

    d, ev = _two_batch_stream_dir(spark, tmp_path)
    cols = ["user_id", "ts", "event_id", "event_type", "value"]
    ev = ev.select(*cols)
    tbl = LakehouseTable(spark, str(tmp_path / "latest_state"))
    tbl.overwrite(ev.limit(0))

    newer = (F.col("s.ts") > F.col("t.ts")) | (
        (F.col("s.ts") == F.col("t.ts"))
        & (F.col("s.event_id") > F.col("t.event_id"))
    )

    def apply(table, batch_df, summary_extra):
        w = Window.partitionBy("user_id").orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
        winners = (
            batch_df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )
        return table.merge_into(
            winners,
            on=["user_id"],
            update_cols={
                c: F.when(newer, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}"))
                for c in cols
                if c != "user_id"
            },
            summary_extra=summary_extra,
        )

    sink = idempotent_foreach_batch(tbl, apply)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(d)
    )
    q = (
        stream.select(*cols)
        .writeStream.foreachBatch(lambda df, bid: sink(df.select(*cols), bid))
        .trigger(availableNow=True)
        .start()
    )
    await_or_raise(q, 300)
    q.stop()

    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    want = {
        (r.user_id, r.event_id)
        for r in ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    }
    got = {(r.user_id, r.event_id) for r in tbl.read().collect()}
    assert got == want
    ops = [s["operation"] for s in tbl.snapshots()]
    assert ops.count("merge") >= 2  # one conditional merge per micro-batch


def test_lakehouse_stream_source_offset_continuity(spark, tmp_path):
    """The lakehouse streaming source resumes from its checkpointed
    snapshot-version offset: a restarted query emits ONLY rows committed
    since the previous run."""
    from pyspark.sql import functions as F

    from apache_iceberg_exploration_spark.sources.lakehouse import (
        LakehouseTable,
    )
    from apache_iceberg_exploration_spark.streaming.lakehouse_source import (
        make_lakehouse_stream_source,
    )

    tbl = LakehouseTable(spark, str(tmp_path / "t"))
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    tbl.append(cust.filter(F.col("c_custkey") < 10))
    spark.dataSource.register(make_lakehouse_stream_source())
    cp = str(tmp_path / "cp")

    out = str(tmp_path / "out")

    def drain():
        # file sink: the checkpoint-recoverable sink kind (memory isn't)
        q = (
            spark.readStream.format("lakehouse_stream")
            .option("path", str(tmp_path / "t"))
            .load()
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q, 120)
        q.stop()
        return spark.read.parquet(out)

    assert drain().count() == 10

    tbl.append(cust.filter((F.col("c_custkey") >= 10) & (F.col("c_custkey") < 15)))
    second = drain()
    got = {r.c_custkey for r in second.collect()}
    # run 2 appended ONLY the new snapshot's rows to the sink
    assert second.count() == 15 and set(range(10, 15)) <= got, got


def test_lakehouse_sink_exactly_once_and_interop(spark, tmp_path):
    """The native streaming sink commits atomically with the batch id:
    a replayed batch id publishes nothing and drops its files; the
    sink-written table is a first-class lakehouse table (readable,
    appendable, stats-pruned, consumable by the streaming source)."""
    from pyspark.sql import functions as F

    from apache_iceberg_exploration_spark.sources.lakehouse import (
        LakehouseTable,
    )
    from apache_iceberg_exploration_spark.streaming.lakehouse_sink import (
        make_lakehouse_stream_sink,
    )

    root = str(tmp_path / "t")
    spark.dataSource.register(make_lakehouse_stream_sink())
    schema = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "customer.parquet")
        .parquet(SF_SMOKE)
    )
    q = (
        stream.writeStream.format("lakehouse_sink")
        .option("path", root)
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    await_or_raise(q, 120)
    q.stop()

    tbl = LakehouseTable(spark, root)
    n = tbl.read().count()
    assert n == spark.read.parquet(f"{SF_SMOKE}/customer.parquet").count()
    v1 = tbl.current_version()
    m = tbl._read_manifest(v1)
    assert m["summary"]["streaming_batch_id"] == 0
    assert m["summary"]["streaming_batch_hwm"] == 0

    # replayed micro-batch: same batch id → no new version, files dropped
    from apache_iceberg_exploration_spark.streaming.lakehouse_sink import (
        _commit_append,  # noqa: F401  (protocol smoke below uses writer)
    )

    sink_cls = make_lakehouse_stream_sink()
    writer = sink_cls(options={"path": root}).streamWriter(schema, False)

    class FakeMsg:
        files = [root + "/data/stream-fake/part-x.parquet"]
        stats = {}

    import os

    os.makedirs(root + "/data/stream-fake", exist_ok=True)
    open(FakeMsg.files[0], "w").close()
    writer.commit([FakeMsg()], batchId=0)  # replay of batch 0
    assert tbl.current_version() == v1  # nothing published
    assert not os.path.exists(FakeMsg.files[0])  # redundant files dropped

    # interop: plain appends on top, stats pruning, time travel
    tbl.append(spark.read.parquet(f"{SF_SMOKE}/customer.parquet").limit(5))
    assert tbl.read().count() == n + 5
    assert tbl.read(version=v1).count() == n
    manifest = tbl._read_manifest(tbl.current_version())
    kept = tbl._prune_files(manifest, {"c_custkey": (0, 3)})
    assert len(kept) <= len(manifest["files"])


def test_lakehouse_stream_starting_version_and_rate_limit(spark, tmp_path):
    """startingVersion skips history (stream-from-snapshot); with
    maxVersionsPerTrigger=1 a 3-commit backlog drains as three bounded
    micro-batches instead of one catch-up batch."""
    from pyspark.sql import functions as F

    from apache_iceberg_exploration_spark.sources.lakehouse import (
        LakehouseTable,
    )
    from apache_iceberg_exploration_spark.streaming.lakehouse_source import (
        make_lakehouse_stream_source,
    )

    tbl = LakehouseTable(spark, str(tmp_path / "t"))
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    for i in range(3):  # v1: 0-9, v2: 10-19, v3: 20-29
        tbl.append(
            cust.filter(
                (F.col("c_custkey") >= 10 * i) & (F.col("c_custkey") < 10 * (i + 1))
            )
        )
    spark.dataSource.register(make_lakehouse_stream_source())

    batches = []

    def sink(bdf, bid):
        batches.append({r.c_custkey for r in bdf.collect()})

    def drain():
        q = (
            spark.readStream.format("lakehouse_stream")
            .option("path", str(tmp_path / "t"))
            .option("startingVersion", 1)  # skip v1's rows
            .option("maxVersionsPerTrigger", 1)  # 1 commit per micro-batch
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "cp"))
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q, 120)
        q.stop()

    # each drain admits bounded micro-batches until caught up; the
    # checkpointed offset carries across restarts (read(start) throttles
    # from the TRUE position, so restart cannot rewind or skip)
    for _ in range(3):
        drain()
        if sum(1 for b in batches if b) >= 2:
            break
    non_empty = [b for b in batches if b]
    assert non_empty == [set(range(10, 20)), set(range(20, 30))], batches


def test_lakehouse_stream_dist_rate_limit_bounded_drain_across_restarts(
    spark, tmp_path
):
    """The DISTRIBUTED reader honors maxVersionsPerTrigger too (r4
    verdict #3): a multi-commit backlog drains one version per
    availableNow run, the checkpoint carries across restarts, and new
    commits appended BETWEEN restarts keep draining bounded — no
    rewind, no skip, no catch-up megabatch.  The restart safety hinges
    on the engine replaying partitions(checkpoint, checkpoint) before
    the first latestOffset(); the reader raises loudly if that order
    ever changes (see _DistReader docstring)."""
    from pyspark.sql import functions as F

    from apache_iceberg_exploration_spark.sources.lakehouse import (
        LakehouseTable,
    )
    from apache_iceberg_exploration_spark.streaming.lakehouse_source import (
        make_lakehouse_stream_dist_source,
    )

    tbl = LakehouseTable(spark, str(tmp_path / "t"))
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )

    def commit_decade(i):
        tbl.append(
            cust.filter(
                (F.col("c_custkey") >= 10 * i) & (F.col("c_custkey") < 10 * (i + 1))
            )
        )

    for i in range(3):  # v1: 0-9, v2: 10-19, v3: 20-29
        commit_decade(i)
    spark.dataSource.register(make_lakehouse_stream_dist_source())

    batches = []

    def sink(bdf, bid):
        rows = {r.c_custkey for r in bdf.collect()}
        if rows:
            batches.append(rows)

    def drain():
        q = (
            spark.readStream.format("lakehouse_stream_dist")
            .option("path", str(tmp_path / "t"))
            .option("startingVersion", 1)  # skip v1's rows
            .option("maxVersionsPerTrigger", 1)
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "cp"))
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q, 120)
        q.stop()

    for _ in range(4):  # 2-version backlog, ≤1 version per run
        drain()
        if len(batches) >= 2:
            break
    assert batches == [set(range(10, 20)), set(range(20, 30))], batches

    # backlog appended between restarts drains the same way
    commit_decade(3)
    commit_decade(4)
    for _ in range(4):
        drain()
        if len(batches) >= 4:
            break
    assert batches == [
        set(range(10, 20)),
        set(range(20, 30)),
        set(range(30, 40)),
        set(range(40, 50)),
    ], batches


def test_lakehouse_sink_commits_interleave_with_batch_writers(spark, tmp_path):
    """The sink's optimistic commit rebases past a batch append that
    wins the version race mid-stream: both commits land, no rows lost."""
    from pyspark.sql import functions as F

    from apache_iceberg_exploration_spark.sources.lakehouse import (
        LakehouseTable,
    )
    from apache_iceberg_exploration_spark.streaming.lakehouse_sink import (
        make_lakehouse_stream_sink,
    )

    root = str(tmp_path / "t")
    tbl = LakehouseTable(spark, root)
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    tbl.append(cust.filter(F.col("c_custkey") < 5))  # v1, batch writer

    # streaming micro-batch commit built against v1...
    sink_cls = make_lakehouse_stream_sink()
    writer = sink_cls(options={"path": root}).streamWriter(cust.schema, False)
    import pyarrow as pa
    import pyarrow.parquet as pq
    import os

    d = os.path.join(root, "data", "stream-race")
    os.makedirs(d, exist_ok=True)
    f = os.path.join(d, "part-race.parquet")
    pq.write_table(
        pa.table({"c_custkey": [100, 101], "c_mktsegment": ["X", "X"]}), f
    )

    class Msg:
        files = [f]
        stats = {f: {"__rows": 2, "c_custkey": [100, 101]}}

    # ...while a concurrent batch append takes the next version first
    tbl.append(cust.filter((F.col("c_custkey") >= 5) & (F.col("c_custkey") < 8)))
    writer.commit([Msg()], batchId=0)  # must rebase and land on top

    assert tbl.current_version() == 3
    rows = {r.c_custkey for r in tbl.read().collect()}
    assert set(range(0, 8)) <= rows and {100, 101} <= rows
    assert tbl._read_manifest(3)["summary"]["streaming_batch_id"] == 0


def test_lakehouse_sink_partitioned_write_prunes(spark, tmp_path):
    """partitionBy on the streaming sink: files land in hive-style dirs
    with partition tuples in the manifest, so a partition predicate on
    the streamed table prunes files exactly like a batch-partitioned
    write."""
    from pyspark.sql import functions as F

    from apache_iceberg_exploration_spark.sources.lakehouse import (
        LakehouseTable,
    )
    from apache_iceberg_exploration_spark.streaming.lakehouse_sink import (
        make_lakehouse_stream_sink,
    )

    root = str(tmp_path / "t")
    spark.dataSource.register(make_lakehouse_stream_sink())
    schema = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").schema
    q = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "customer.parquet")
        .parquet(SF_SMOKE)
        .writeStream.format("lakehouse_sink")
        .option("path", root)
        .option("partitionBy", "c_mktsegment")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    await_or_raise(q, 120)
    q.stop()

    tbl = LakehouseTable(spark, root)
    manifest = tbl._read_manifest(tbl.current_version())
    assert manifest.get("partition_specs") == [
        {"kind": "identity", "col": "c_mktsegment", "n": None}
    ]
    assert len(manifest["partitions"]) == len(manifest["files"])
    # partition pruning: a one-segment scan plans a strict file subset
    kept = tbl._partition_prune(
        manifest,
        {"c_mktsegment": ("BUILDING", "BUILDING")},
        manifest["files"],
    )
    assert 0 < len(kept) < len(manifest["files"])
    got = tbl.scan({"c_mktsegment": ("BUILDING", "BUILDING")}).count()
    want = (
        spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .count()
    )
    assert got == want


def test_lakehouse_stream_skips_compaction_rewrites(spark, tmp_path):
    """A compaction between appends must NOT replay rewritten files as
    new stream rows (the Iceberg streaming-read skip-rewrite contract):
    the stream sees exactly the appended rows, once."""
    from pyspark.sql import functions as F

    from apache_iceberg_exploration_spark.sources.lakehouse import (
        LakehouseTable,
    )
    from apache_iceberg_exploration_spark.streaming.lakehouse_source import (
        make_lakehouse_stream_dist_source,
    )

    tbl = LakehouseTable(spark, str(tmp_path / "t"))
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    tbl.append(cust.filter(F.col("c_custkey") < 10).repartition(3))
    tbl.rewrite_data_files(target_file_count=1)  # rewrite, no new data
    tbl.append(
        cust.filter(
            (F.col("c_custkey") >= 10) & (F.col("c_custkey") < 15)
        )
    )
    spark.dataSource.register(make_lakehouse_stream_dist_source())
    q = (
        spark.readStream.format("lakehouse_stream_dist")
        .option("path", str(tmp_path / "t"))
        .load()
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("skip_rewrite_out")
        .trigger(availableNow=True)
        .start()
    )
    await_or_raise(q, 120)
    q.stop()
    rows = spark.table("skip_rewrite_out").collect()
    keys = sorted(r.c_custkey for r in rows)
    assert keys == list(range(15)), keys  # each appended row EXACTLY once


def test_lakehouse_sink_rejects_schema_drift(spark, tmp_path):
    """A streamed batch whose columns drifted from the table's declared
    schema fails the commit instead of corrupting the table."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pytest

    from apache_iceberg_exploration_spark.sources.lakehouse import (
        LakehouseTable,
    )
    from apache_iceberg_exploration_spark.streaming.lakehouse_sink import (
        make_lakehouse_stream_sink,
    )

    root = str(tmp_path / "t")
    tbl = LakehouseTable(spark, root)
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    tbl.append(cust.limit(5))
    v1 = tbl.current_version()

    sink_cls = make_lakehouse_stream_sink()
    writer = sink_cls(options={"path": root}).streamWriter(cust.schema, False)
    d = os.path.join(root, "data", "stream-drift")
    os.makedirs(d, exist_ok=True)
    f = os.path.join(d, "part-drift.parquet")
    pq.write_table(
        pa.table({"c_custkey": [1], "surprise_col": ["x"]}), f
    )

    class Msg:
        files = [f]
        stats = {f: {"__rows": 1}}
        partitions = {}

    with _pytest.raises(ValueError, match="surprise_col"):
        writer.commit([Msg()], batchId=99)
    assert tbl.current_version() == v1  # nothing published


def test_batch_writer_roundtrip_and_modes(spark, tmp_path):
    """df.write.format('lakehouse'): append accumulates snapshots,
    overwrite replaces, partitionBy records prunable tuples, and the
    schema-drift guard still protects tables with a declared schema."""
    import pyspark.sql.functions as F

    from apache_iceberg_exploration_spark.sources.lakehouse import (
        LakehouseTable,
    )
    from apache_iceberg_exploration_spark.streaming.lakehouse_source import (
        make_lakehouse_batch_source,
    )

    spark.dataSource.register(make_lakehouse_batch_source())
    cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    path = str(tmp_path / "t")
    w = lambda df, mode="append", **opts: (  # noqa: E731
        df.write.format("lakehouse")
        .option("path", path)
        .options(**opts)
        .mode(mode)
        .save()
    )
    w(cust, partitionBy="c_mktsegment")
    w(cust.filter(F.col("c_custkey") < 10), partitionBy="c_mktsegment")
    tbl = LakehouseTable(spark, path)
    assert tbl.current_version() == 2
    assert tbl.read().count() == cust.count() + 10
    assert tbl.read(version=1).count() == cust.count()  # time travel
    m = tbl._read_manifest(2)
    assert m.get("partition_specs") and m.get("partitions")
    kept = tbl._partition_prune(
        m, {"c_mktsegment": ("BUILDING", "BUILDING")}, m["files"]
    )
    assert len(kept) < len(m["files"])
    # overwrite replaces everything, including the partition layout
    w(cust.limit(7), mode="overwrite")
    assert tbl.read().count() == 7
    assert tbl.current_version() == 3
    # drift guard: a declared-schema table rejects unknown columns
    declared = str(tmp_path / "t2")
    t2 = LakehouseTable(spark, declared)
    t2.overwrite(cust)
    bad = cust.withColumn("extra", F.lit(1))
    try:
        bad.write.format("lakehouse").option("path", declared).mode(
            "append"
        ).save()
        raise AssertionError("drift guard did not fire")
    except Exception as e:
        assert "not in the table schema" in str(e)
    assert t2.current_version() == 1  # nothing committed


def test_batch_writer_overwrite_records_schema(spark, tmp_path):
    """ADVICE r3 (medium): DSv2 mode('overwrite') used to commit with
    prev={} and record NO schema — silently disabling the drift guard
    for all later appends and breaking add_column ('no declared schema
    to evolve'). The writer's declared Spark schema must land in the
    manifest on overwrite AND on a first-commit append."""
    import json as _json

    import pyspark.sql.functions as F
    import pytest as _pytest

    from apache_iceberg_exploration_spark.sources.lakehouse import (
        LakehouseTable,
    )
    from apache_iceberg_exploration_spark.streaming.lakehouse_source import (
        make_lakehouse_batch_source,
    )

    spark.dataSource.register(make_lakehouse_batch_source())
    cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")

    def declared_cols(tbl):
        m = tbl._read_manifest(tbl.current_version())
        assert m.get("schema"), "manifest must record a schema"
        return {f["name"] for f in _json.loads(m["schema"])["fields"]}

    # overwrite on an existing table: the batch defines the new schema
    path = str(tmp_path / "t")
    cust.write.format("lakehouse").option("path", path).mode(
        "append"
    ).save()
    tbl = LakehouseTable(spark, path)
    assert declared_cols(tbl) == set(cust.columns)  # first-commit append
    slim = cust.select("c_custkey", "c_name")
    slim.write.format("lakehouse").option("path", path).mode(
        "overwrite"
    ).save()
    assert declared_cols(tbl) == {"c_custkey", "c_name"}
    # drift guard is live again after the overwrite
    bad = slim.withColumn("extra", F.lit(1))
    with _pytest.raises(Exception, match="not in the table schema"):
        bad.write.format("lakehouse").option("path", path).mode(
            "append"
        ).save()
    # and schema evolution has a declared schema to evolve
    tbl.add_column("c_note", "string")
    assert "c_note" in declared_cols(tbl)


def test_batch_writer_table_feeds_streaming_source(spark, tmp_path):
    """Cross-consumer compatibility: a table created ONLY through the
    DSv2 batch writer must stream through the lakehouse streaming
    source (snapshot-version offsets over the parts-format manifests
    the writer commits)."""
    import pyspark.sql.functions as F

    from apache_iceberg_exploration_spark.streaming.lakehouse_source import (
        make_lakehouse_batch_source,
        make_lakehouse_stream_source,
    )

    spark.dataSource.register(make_lakehouse_batch_source())
    spark.dataSource.register(make_lakehouse_stream_source())
    cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    path = str(tmp_path / "t")
    for i in range(2):
        (
            cust.filter(F.col("c_custkey") % 2 == i)
            .write.format("lakehouse")
            .option("path", path)
            .mode("append")
            .save()
        )
    out = str(tmp_path / "out")
    q = (
        spark.readStream.format("lakehouse_stream")
        .option("path", path)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    await_or_raise(q, 120)
    assert spark.read.parquet(out).count() == cust.count()


def test_cdc_stream_emits_mor_equality_deletes(spark, tmp_path):
    """r7 (VERDICT r6 #1): an equality merge-on-read delete commit EMITS
    its delete events — the entry's key tuples are evaluated against
    the pre-commit side's carried files — instead of the r6 refusal.
    The compaction that later materializes the entry away nets to zero
    (its file diff compares EFFECTIVE row sets)."""
    from apache_iceberg_exploration_spark.sources.lakehouse import (
        LakehouseTable,
    )
    from apache_iceberg_exploration_spark.streaming.lakehouse_source import (
        _cdc_rows,
    )

    t = LakehouseTable(spark, str(tmp_path / "t"))
    cust = load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    t.overwrite(cust)
    t.delete_where_mor(F.col("c_custkey") < 10, keys=["c_custkey"])  # v2
    cols = ["c_custkey", "c_mktsegment"]
    rows = _cdc_rows(str(tmp_path / "t"), 1, 2, cols)
    assert {r[2] for r in rows} == {"delete"}
    assert sorted(r[0] for r in rows) == list(range(10))
    t.rewrite_data_files(target_file_count=2)  # v3: materializes deletes
    assert _cdc_rows(str(tmp_path / "t"), 2, 3, cols) == []
    # full interval: initial load + the 10 deletes, nothing else
    full = _cdc_rows(str(tmp_path / "t"), 0, 3, cols)
    n = cust.count()
    assert len(full) == n + 10


def test_cdc_stream_replay_is_deterministic(spark, tmp_path):
    """readBetweenOffsets replay: the same offset range yields the same
    multiset of change rows (immutable manifests)."""
    from apache_iceberg_exploration_spark.sources.lakehouse import (
        LakehouseTable,
    )
    from apache_iceberg_exploration_spark.streaming.lakehouse_source import (
        _cdc_rows,
    )

    t = LakehouseTable(spark, str(tmp_path / "t"))
    cust = load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    t.overwrite(cust)
    t.append(cust.filter(F.col("c_custkey") % 5 == 0))
    t.delete_where(F.col("c_custkey") >= 100)
    cols = ["c_custkey", "c_mktsegment"]
    a = sorted(_cdc_rows(str(tmp_path / "t"), 0, 3, cols))
    b = sorted(_cdc_rows(str(tmp_path / "t"), 0, 3, cols))
    assert a == b and len(a) > 0
    # windowed reads compose to the full range
    w = sorted(
        _cdc_rows(str(tmp_path / "t"), 0, 1, cols)
        + _cdc_rows(str(tmp_path / "t"), 1, 3, cols)
    )
    assert w == a


def test_cdc_dist_reader_matches_simple_reader(spark, tmp_path):
    """The distributed CDC reader (one partition per commit,
    executor-side diff) must produce exactly the simple reader's feed
    on the same table history — same rows, same tags, same versions."""
    from apache_iceberg_exploration_spark.sources.lakehouse import (
        LakehouseTable,
    )
    from apache_iceberg_exploration_spark.streaming.lakehouse_source import (
        make_lakehouse_stream_dist_source,
        make_lakehouse_stream_source,
    )

    t = LakehouseTable(spark, str(tmp_path / "t"))
    cust = load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    t.overwrite(cust)
    t.append(cust.filter(F.col("c_custkey") % 4 == 1))
    t.delete_where(F.col("c_mktsegment") == "MACHINERY")
    t.rewrite_data_files(target_file_count=2)  # nets to zero

    spark.dataSource.register(make_lakehouse_stream_source())
    spark.dataSource.register(make_lakehouse_stream_dist_source())
    feeds = {}
    for i, fmt in enumerate(["lakehouse_stream", "lakehouse_stream_dist"]):
        q = (
            spark.readStream.format(fmt)
            .option("path", str(tmp_path / "t"))
            .option("readChangeFeed", "true")
            .load()
            .writeStream.format("memory")
            .queryName(f"cdcfeed{i}")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / f"ck{i}"))
            .start()
        )
        await_or_raise(q, 120)
        feeds[fmt] = sorted(
            tuple(r) for r in spark.sql(f"SELECT * FROM cdcfeed{i}").collect()
        )
    assert feeds["lakehouse_stream"] == feeds["lakehouse_stream_dist"]
    assert len(feeds["lakehouse_stream"]) > 0
    # row shape: (*cols, _change_type, _commit_version, _commit_timestamp)
    types = {r[-3] for r in feeds["lakehouse_stream"]}
    assert types == {"insert", "delete"}
    versions = {r[-2] for r in feeds["lakehouse_stream"]}
    assert versions == {1, 2, 3}  # compaction (v4) emitted nothing
    # Delta CDF's _commit_timestamp convention (ADVICE r5): populated,
    # and constant within a commit
    by_v = {}
    for r in feeds["lakehouse_stream"]:
        assert r[-1] is not None
        by_v.setdefault(r[-2], set()).add(r[-1])
    assert all(len(ts) == 1 for ts in by_v.values())


def test_batch_writer_type_promotion(spark, tmp_path):
    """The DSv2 writer path promotes types like LakehouseTable.append
    (same _merge_schema_json lattice): a LONG batch into an INT table
    widens the declared type — values past 2^31 read back exactly —
    and an incompatible batch (string into int) aborts the commit,
    leaving the table untouched."""
    import pyspark.sql.functions as F
    import pytest as _pytest

    from apache_iceberg_exploration_spark.sources.lakehouse import (
        LakehouseTable,
    )
    from apache_iceberg_exploration_spark.streaming.lakehouse_source import (
        make_lakehouse_batch_source,
    )

    spark.dataSource.register(make_lakehouse_batch_source())
    path = str(tmp_path / "t")
    tbl = LakehouseTable(spark, path)
    tbl.overwrite(
        spark.range(3).select("id", F.col("id").cast("int").alias("v"))
    )
    big = spark.range(3, 5).select(
        "id", (F.col("id") + F.lit(2**40)).alias("v")
    )
    big.write.format("lakehouse").option("path", path).mode(
        "append"
    ).save()
    out = tbl.read()
    assert dict(out.dtypes)["v"] == "bigint"
    assert {r.v for r in out.filter(F.col("id") >= 3).collect()} == {
        3 + 2**40,
        4 + 2**40,
    }
    v_now = tbl.current_version()
    bad = spark.range(5, 6).select("id", F.lit("oops").alias("v"))
    with _pytest.raises(Exception, match="incompatible"):
        bad.write.format("lakehouse").option("path", path).mode(
            "append"
        ).save()
    assert tbl.current_version() == v_now  # nothing published


def test_cdc_emits_position_delete_commits(spark, tmp_path):
    """r6 (VERDICT r5 #4): position-delete commits are no longer
    refused — the feed reads the doomed coordinates and emits exactly
    those rows as deletes; the compaction that later materializes the
    pending deletes away nets to ZERO (already-dead coordinates are
    excluded from the removed-side multiset)."""
    from apache_iceberg_exploration_spark.sources.lakehouse import (
        LakehouseTable,
    )
    from apache_iceberg_exploration_spark.streaming.lakehouse_source import (
        _cdc_rows,
    )

    t = LakehouseTable(spark, str(tmp_path / "t"))
    cust = load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    t.overwrite(cust)
    t.delete_where_pos(F.col("c_custkey") < 7)  # v2: MoR position delete
    cols = ["c_custkey", "c_mktsegment"]
    rows = _cdc_rows(str(tmp_path / "t"), 1, 2, cols)
    assert sorted(r[0] for r in rows) == list(range(7))
    assert {r[2] for r in rows} == {"delete"}
    assert {r[3] for r in rows} == {2}
    # v3: compaction — dead coordinates excluded, nets to zero
    t.rewrite_data_files(target_file_count=2)
    assert _cdc_rows(str(tmp_path / "t"), 2, 3, cols) == []
    # the two-commit walk equals the one-shot interval
    assert sorted(_cdc_rows(str(tmp_path / "t"), 1, 3, cols)) == sorted(
        rows
    )


def test_cdc_pos_delete_rollback_resurrects(spark, tmp_path):
    """Rolling back past a position delete (entry removed, target files
    unchanged) emits the resurrected rows as inserts."""
    from apache_iceberg_exploration_spark.sources.lakehouse import (
        LakehouseTable,
    )
    from apache_iceberg_exploration_spark.streaming.lakehouse_source import (
        _cdc_rows,
    )

    t = LakehouseTable(spark, str(tmp_path / "t"))
    cust = load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    t.overwrite(cust)
    t.delete_where_pos(F.col("c_custkey") < 3)  # v2
    t.rollback(1)  # v3: entry dropped, files identical
    cols = ["c_custkey", "c_mktsegment"]
    rows = _cdc_rows(str(tmp_path / "t"), 2, 3, cols)
    assert sorted(r[0] for r in rows) == [0, 1, 2]
    assert {r[2] for r in rows} == {"insert"}


def test_cdc_dist_plans_partition_for_pos_delete(spark, tmp_path):
    """The dist reader must plan a partition for a pos-delete commit
    (no file change!) and produce the same feed as the simple reader."""
    from apache_iceberg_exploration_spark.sources.lakehouse import (
        LakehouseTable,
    )
    from apache_iceberg_exploration_spark.streaming.lakehouse_source import (
        make_lakehouse_stream_dist_source,
        make_lakehouse_stream_source,
    )

    t = LakehouseTable(spark, str(tmp_path / "t"))
    cust = load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    t.overwrite(cust)
    t.delete_where_pos(F.col("c_custkey") % 11 == 3)  # v2: no file change
    t.rewrite_data_files(target_file_count=2)  # v3: nets to zero

    spark.dataSource.register(make_lakehouse_stream_source())
    spark.dataSource.register(make_lakehouse_stream_dist_source())
    feeds = {}
    for i, fmt in enumerate(["lakehouse_stream", "lakehouse_stream_dist"]):
        q = (
            spark.readStream.format(fmt)
            .option("path", str(tmp_path / "t"))
            .option("readChangeFeed", "true")
            .option("startingVersion", "1")
            .load()
            .writeStream.format("memory")
            .queryName(f"cdcpos{i}")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / f"ckp{i}"))
            .start()
        )
        await_or_raise(q, 120)
        feeds[fmt] = sorted(
            tuple(r) for r in spark.sql(f"SELECT * FROM cdcpos{i}").collect()
        )
    assert feeds["lakehouse_stream"] == feeds["lakehouse_stream_dist"]
    assert len(feeds["lakehouse_stream"]) > 0
    assert {r[-3] for r in feeds["lakehouse_stream"]} == {"delete"}
    assert {r[-2] for r in feeds["lakehouse_stream"]} == {2}


def _three_commit_table(spark, tmp_path):
    from apache_iceberg_exploration_spark.sources.lakehouse import (
        LakehouseTable,
    )

    tbl = LakehouseTable(spark, str(tmp_path / "t"))
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    for i in range(3):  # v1: 0-9, v2: 10-19, v3: 20-29
        tbl.append(
            cust.filter(
                (F.col("c_custkey") >= 10 * i)
                & (F.col("c_custkey") < 10 * (i + 1))
            ).coalesce(1)
        )
    return tbl


@pytest.mark.parametrize(
    "opt,val",
    [("maxFilesPerTrigger", "1"), ("maxBytesPerTrigger", "1")],
)
def test_stream_file_and_byte_rate_limits_bounded_drain(
    spark, tmp_path, opt, val
):
    """VERDICT r5 #5: byte/file admission caps on the SIMPLE reader —
    versions are uneven units under compaction, so these bound actual
    work. Each single-file commit saturates either cap (>=1 file,
    >=1 byte), so a 2-commit backlog drains as two bounded batches;
    the at-least-one-version progress rule prevents stalls."""
    from apache_iceberg_exploration_spark.streaming.lakehouse_source import (
        make_lakehouse_stream_source,
    )

    _three_commit_table(spark, tmp_path)
    spark.dataSource.register(make_lakehouse_stream_source())
    batches = []

    def sink(bdf, bid):
        batches.append({r.c_custkey for r in bdf.collect()})

    def drain():
        q = (
            spark.readStream.format("lakehouse_stream")
            .option("path", str(tmp_path / "t"))
            .option("startingVersion", 1)
            .option(opt, val)
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "cp"))
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q, 120)
        q.stop()

    for _ in range(3):
        drain()
        if sum(1 for b in batches if b) >= 2:
            break
    non_empty = [b for b in batches if b]
    assert non_empty == [set(range(10, 20)), set(range(20, 30))], batches


def test_stream_dist_byte_rate_limit_bounded_drain(spark, tmp_path):
    """The DISTRIBUTED reader honors maxBytesPerTrigger through its
    high-water-mark latestOffset clamp, same restart-safety argument as
    its maxVersionsPerTrigger (reader-local floor replayed from the
    checkpoint before the first latestOffset)."""
    from apache_iceberg_exploration_spark.streaming.lakehouse_source import (
        make_lakehouse_stream_dist_source,
    )

    _three_commit_table(spark, tmp_path)
    spark.dataSource.register(make_lakehouse_stream_dist_source())
    batches = []

    def sink(bdf, bid):
        batches.append({r.c_custkey for r in bdf.collect()})

    def drain():
        q = (
            spark.readStream.format("lakehouse_stream_dist")
            .option("path", str(tmp_path / "t"))
            .option("startingVersion", 1)
            .option("maxBytesPerTrigger", "1")
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "cpd"))
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q, 120)
        q.stop()

    for _ in range(4):
        drain()
        if sum(1 for b in batches if b) >= 2:
            break
    non_empty = [b for b in batches if b]
    assert non_empty == [set(range(10, 20)), set(range(20, 30))], batches


def test_rate_limit_clamp_counts_new_files_and_bytes(spark, tmp_path):
    """Unit-level: the clamp admits versions until the cumulative NEW
    file/byte weights hit the caps, always at least one version; a
    generous cap admits everything; compaction commits (file swap, no
    new data bytes beyond the rewrite) still count their added files."""
    from apache_iceberg_exploration_spark.streaming.lakehouse_source import (
        _clamp_rate_limit,
    )

    tbl = _three_commit_table(spark, tmp_path)
    root = str(tmp_path / "t")
    # tiny caps: one version per batch
    assert _clamp_rate_limit(root, 0, 3, None, 1, None) == 1
    assert _clamp_rate_limit(root, 1, 3, None, 1, None) == 2
    assert _clamp_rate_limit(root, 0, 3, None, None, 1) == 1
    # generous caps admit the full range
    assert _clamp_rate_limit(root, 0, 3, None, 1000, None) == 3
    assert (
        _clamp_rate_limit(root, 0, 3, None, None, 10**12) == 3
    )
    # version cap composes (min of the two clamps)
    assert _clamp_rate_limit(root, 0, 3, 2, 1000, None) == 2
    # at-least-one even when the first version alone exceeds the cap
    assert _clamp_rate_limit(root, 0, 3, None, 0, None) == 1
    tbl.rewrite_small_files(min_file_bytes=64 * 1024 * 1024)  # v4
    assert _clamp_rate_limit(root, 3, 4, None, 1, None) == 4


def test_cdc_row_lineage_feed_update_pairs(spark, tmp_path):
    """rowLineage=true upgrades the CDC feed to identity-keyed four-type
    semantics: an UPDATE is one update_preimage/update_postimage pair
    sharing _row_id; a full re-cluster nets to zero BY IDENTITY; a
    delete+identical-reinsert is two different identities; both readers
    agree row-for-row."""
    from apache_iceberg_exploration_spark.sources.lakehouse import (
        LakehouseTable,
    )
    from apache_iceberg_exploration_spark.streaming.lakehouse_source import (
        make_lakehouse_stream_dist_source,
        make_lakehouse_stream_source,
    )

    t = LakehouseTable(spark, str(tmp_path / "t"))
    df = (
        spark.range(0, 10)
        .select(F.col("id").alias("k"), (F.col("id") * 10).alias("v"))
        .coalesce(1)
        .sortWithinPartitions("k")
    )
    t.append(df)  # v1: ids 0..9
    t.update_where(F.col("k") == 3, {"v": F.lit(999)})  # v2
    t.delete_where(F.col("k") == 7)  # v3
    t.rewrite_data_files(target_file_count=2)  # v4: zero by identity
    t.delete_where(F.col("k") == 5)  # v5
    t.append(  # v6: identical VALUES to the deleted row — new identity
        spark.createDataFrame([(5, 50)], "k long, v long")
    )

    spark.dataSource.register(make_lakehouse_stream_source())
    spark.dataSource.register(make_lakehouse_stream_dist_source())
    feeds = {}
    for i, fmt in enumerate(["lakehouse_stream", "lakehouse_stream_dist"]):
        q = (
            spark.readStream.format(fmt)
            .option("path", str(tmp_path / "t"))
            .option("readChangeFeed", "true")
            .option("rowLineage", "true")
            .option("startingVersion", "1")
            .load()
            .writeStream.format("memory")
            .queryName(f"cdcrl{i}")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / f"ckrl{i}"))
            .start()
        )
        await_or_raise(q, 120)
        feeds[fmt] = sorted(
            tuple(r)
            for r in spark.sql(
                f"SELECT k, v, _row_id, _change_type, _commit_version "
                f"FROM cdcrl{i}"
            ).collect()
        )
    assert feeds["lakehouse_stream"] == feeds["lakehouse_stream_dist"]
    got = feeds["lakehouse_stream"]
    assert (3, 30, 3, "update_preimage", 2) in got
    assert (3, 999, 3, "update_postimage", 2) in got
    assert (7, 70, 7, "delete", 3) in got
    assert not any(r[4] == 4 for r in got)  # re-cluster: zero events
    assert (5, 50, 5, "delete", 5) in got
    # the re-insert of identical values is a NEW identity
    ins = [r for r in got if r[3] == "insert" and r[4] == 6]
    assert len(ins) == 1 and ins[0][2] != 5
    # v2 pair + v3 delete + v5 delete + v6 insert (startingVersion=1
    # skips v1's initial load)
    assert len(got) == 5


def test_cdc_row_lineage_pos_delete_ids(spark, tmp_path):
    """Position-delete commits in rowLineage mode emit the doomed rows
    with their exact identities (base + coordinate position)."""
    from apache_iceberg_exploration_spark.sources.lakehouse import (
        LakehouseTable,
    )
    from apache_iceberg_exploration_spark.streaming.lakehouse_source import (
        _cdc_rows,
    )

    t = LakehouseTable(spark, str(tmp_path / "t"))
    df = (
        spark.range(0, 8)
        .select(F.col("id").alias("k"), F.lit(1).alias("v"))
        .coalesce(1)
        .sortWithinPartitions("k")
    )
    t.append(df)
    t.delete_where_pos(F.col("k").isin(2, 6))
    rows = _cdc_rows(
        str(tmp_path / "t"), 1, 2, ["k", "v"], row_level=True
    )
    assert sorted((r[0], r[2], r[3]) for r in rows) == [
        (2, 2, "delete"),
        (6, 6, "delete"),
    ]


def test_cdc_mor_update_surfaces_as_update_pairs(spark, tmp_path):
    """VERDICT r6 #1 'done' criterion: an update_where_mor commit
    (equality delete + same-identity reinsert in ONE commit) surfaces
    as update_preimage/update_postimage pairs sharing _row_id through
    BOTH stream readers."""
    from apache_iceberg_exploration_spark.sources.lakehouse import (
        LakehouseTable,
    )
    from apache_iceberg_exploration_spark.streaming.lakehouse_source import (
        make_lakehouse_stream_dist_source,
        make_lakehouse_stream_source,
    )

    t = LakehouseTable(spark, str(tmp_path / "t"))
    df = (
        spark.range(0, 10)
        .select(F.col("id").alias("k"), (F.col("id") * 10).alias("v"))
        .coalesce(1)
        .sortWithinPartitions("k")
    )
    t.append(df)  # v1: ids 0..9
    t.update_where_mor(
        F.col("k").isin(2, 8), keys=["k"], set_cols={"v": F.lit(777)}
    )  # v2: equality entry + new images, same identities

    spark.dataSource.register(make_lakehouse_stream_source())
    spark.dataSource.register(make_lakehouse_stream_dist_source())
    feeds = {}
    for i, fmt in enumerate(["lakehouse_stream", "lakehouse_stream_dist"]):
        q = (
            spark.readStream.format(fmt)
            .option("path", str(tmp_path / "t"))
            .option("readChangeFeed", "true")
            .option("rowLineage", "true")
            .option("startingVersion", "1")
            .load()
            .writeStream.format("memory")
            .queryName(f"morup{i}")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / f"ckmu{i}"))
            .start()
        )
        await_or_raise(q, 120)
        feeds[fmt] = sorted(
            tuple(r)
            for r in spark.sql(
                f"SELECT k, v, _row_id, _change_type, _commit_version "
                f"FROM morup{i}"
            ).collect()
        )
    assert feeds["lakehouse_stream"] == feeds["lakehouse_stream_dist"]
    got = feeds["lakehouse_stream"]
    assert (2, 20, 2, "update_preimage", 2) in got
    assert (2, 777, 2, "update_postimage", 2) in got
    assert (8, 80, 8, "update_preimage", 2) in got
    assert (8, 777, 8, "update_postimage", 2) in got
    assert len(got) == 4  # nothing else — no unrelated delete+insert


def test_cdc_mor_value_mode_and_compaction_nets_zero(spark, tmp_path):
    """Value-mode CDC of a MoR update: delete(old)+insert(new); the
    compaction that materializes the equality entry away emits
    NOTHING (file diffs compare effective row sets)."""
    from apache_iceberg_exploration_spark.sources.lakehouse import (
        LakehouseTable,
    )
    from apache_iceberg_exploration_spark.streaming.lakehouse_source import (
        _cdc_rows,
    )

    t = LakehouseTable(spark, str(tmp_path / "t"))
    df = (
        spark.range(0, 10)
        .select(F.col("id").alias("k"), (F.col("id") * 10).alias("v"))
        .coalesce(1)
        .sortWithinPartitions("k")
    )
    t.append(df)
    t.update_where_mor(
        F.col("k") == 4, keys=["k"], set_cols={"v": F.lit(400)}
    )  # v2
    rows = _cdc_rows(str(tmp_path / "t"), 1, 2, ["k", "v"])
    assert sorted((r[0], r[1], r[2]) for r in rows) == [
        (4, 40, "delete"),
        (4, 400, "insert"),
    ]
    t.rewrite_data_files()  # v3 materializes the entry
    assert _cdc_rows(str(tmp_path / "t"), 2, 3, ["k", "v"]) == []


def test_cdc_equality_rollback_resurrects(spark, tmp_path):
    """Rollback past a MoR equality delete (entry removed, files
    persist): the hidden rows come back as inserts — previously
    refused."""
    from apache_iceberg_exploration_spark.sources.lakehouse import (
        LakehouseTable,
    )
    from apache_iceberg_exploration_spark.streaming.lakehouse_source import (
        _cdc_rows,
    )

    t = LakehouseTable(spark, str(tmp_path / "t"))
    df = (
        spark.range(0, 10)
        .select(F.col("id").alias("k"), F.lit(1).alias("v"))
        .coalesce(1)
        .sortWithinPartitions("k")
    )
    t.append(df)  # v1
    t.delete_where_mor(F.col("k") < 3, keys=["k"])  # v2
    t.rollback(1)  # v3: entry dropped, files carried
    rows = _cdc_rows(str(tmp_path / "t"), 2, 3, ["k", "v"])
    assert sorted((r[0], r[2]) for r in rows) == [
        (0, "insert"),
        (1, "insert"),
        (2, "insert"),
    ]


def test_cdc_dv_commits_emit_and_net_zero(spark, tmp_path):
    """Deletion-vector commits emit their bitmap deltas: new bits are
    deletes (only the DELTA on a replacement), rollback resurrects,
    compaction nets to zero; identities are exact in row_level mode."""
    from apache_iceberg_exploration_spark.sources.lakehouse import (
        LakehouseTable,
    )
    from apache_iceberg_exploration_spark.streaming.lakehouse_source import (
        _cdc_rows,
    )

    root = str(tmp_path / "t")
    t = LakehouseTable(spark, root)
    df = (
        spark.range(0, 10)
        .select(F.col("id").alias("k"), F.lit(1).alias("v"))
        .coalesce(1)
        .sortWithinPartitions("k")
    )
    t.append(df)  # v1
    t.delete_where_dv(F.col("k").isin(1, 4))  # v2
    t.delete_where_dv(F.col("k") == 7)  # v3: superset replacement
    rows = _cdc_rows(root, 1, 2, ["k", "v"], row_level=True)
    assert sorted((r[0], r[2], r[3]) for r in rows) == [
        (1, 1, "delete"),
        (4, 4, "delete"),
    ]
    rows = _cdc_rows(root, 2, 3, ["k", "v"], row_level=True)
    assert sorted((r[0], r[2], r[3]) for r in rows) == [
        (7, 7, "delete")  # only the DELTA, not the carried bits
    ]
    t.rollback(2)  # v4: back to the two-bit DV — k=7 resurrects
    rows = _cdc_rows(root, 3, 4, ["k", "v"], row_level=True)
    assert sorted((r[0], r[2], r[3]) for r in rows) == [(7, 7, "insert")]
    t.rewrite_data_files()  # v5 materializes the DV away
    assert _cdc_rows(root, 4, 5, ["k", "v"], row_level=True) == []
    # value mode agrees on the full interval's net effect
    full = _cdc_rows(root, 0, 5, ["k", "v"])
    from collections import Counter

    net = Counter()
    for r in full:
        net[(r[0], r[1])] += 1 if r[2] == "insert" else -1
    alive = sorted(k for (k, _v), n in net.items() if n > 0)
    assert alive == [k for k in range(10) if k not in (1, 4)]


def test_cdc_dv_commit_plans_partition_in_dist_reader(spark, tmp_path):
    """A DV-only commit changes no files and no delete entries — the
    dist planner must still plan its partition (regression for the
    dv_changed clause)."""
    from apache_iceberg_exploration_spark.sources.lakehouse import (
        LakehouseTable,
    )
    from apache_iceberg_exploration_spark.streaming.lakehouse_source import (
        make_lakehouse_stream_dist_source,
    )

    t = LakehouseTable(spark, str(tmp_path / "t"))
    df = (
        spark.range(0, 6)
        .select(F.col("id").alias("k"), F.lit(1).alias("v"))
        .coalesce(1)
        .sortWithinPartitions("k")
    )
    t.append(df)
    t.delete_where_dv(F.col("k") == 2)
    spark.dataSource.register(make_lakehouse_stream_dist_source())
    q = (
        spark.readStream.format("lakehouse_stream_dist")
        .option("path", str(tmp_path / "t"))
        .option("readChangeFeed", "true")
        .option("startingVersion", "1")
        .load()
        .writeStream.format("memory")
        .queryName("dvdist")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckdv"))
        .start()
    )
    await_or_raise(q, 120)
    got = [
        tuple(r)
        for r in spark.sql(
            "SELECT k, _change_type, _commit_version FROM dvdist"
        ).collect()
    ]
    assert got == [(2, "delete", 2)]


def test_await_or_raise_surfaces_stream_failure_fast(spark, tmp_path):
    """VERDICT r6 #7: a failing streaming query must raise its OWN
    exception within ~seconds, not stall out a 300 s awaitTermination
    and hand back an empty result."""
    import time as _time

    import pytest
    from pyspark.sql.types import LongType


    def boom(x):
        raise RuntimeError("kaboom-in-task")

    boom_udf = F.udf(boom, LongType())
    src = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "10")
        .load()
        .select(boom_udf(F.col("value")).alias("v"))
    )
    q = (
        src.writeStream.format("memory")
        .queryName("awaitfail")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    t0 = _time.monotonic()
    with pytest.raises(Exception, match="kaboom|Stream"):
        await_or_raise(q, 300)
    assert _time.monotonic() - t0 < 60  # fast, not the 300 s timeout
    assert not q.isActive


def test_cdc_equality_emission_is_stats_pruned(spark, tmp_path):
    """The equality-delete CDC emission must read ONLY the carried
    files whose manifest key stats overlap the entry's key range — the
    'scoped by the delete file's key ranges' cost model (a clustered
    table localizes each delete to a few files)."""
    from apache_iceberg_exploration_spark.sources.lakehouse import (
        LakehouseTable,
    )
    from apache_iceberg_exploration_spark.streaming import (
        lakehouse_source as ls,
    )

    t = LakehouseTable(spark, str(tmp_path / "t"))
    # three key-disjoint files (sorted ranges recorded in stats)
    for lo in (0, 100, 200):
        t.append(
            spark.range(lo, lo + 50)
            .select(F.col("id").alias("k"), F.lit(1).alias("v"))
            .coalesce(1)
            .sortWithinPartitions("k")
        )
    t.delete_where_mor(F.col("k").between(120, 130), keys=["k"])

    # only the middle file's key range overlaps the entry
    m = t._read_manifest(t.current_version())
    stats = m.get("stats", {})
    overl = [
        f
        for f in m["files"]
        if stats.get(f, {}).get("k")
        and not (
            stats[f]["k"][1] < 120 or stats[f]["k"][0] > 130
        )
    ]
    assert len(overl) == 1  # the prune target is real
    # and the emission produces exactly the middle file's rows
    rows = ls._cdc_rows(t.path, 3, 4, ["k", "v"])
    assert sorted(r[0] for r in rows) == list(range(120, 131))
    assert {r[2] for r in rows} == {"delete"}
    # the stats-skip helper itself: disjoint file stats screen out
    keys, vals = ls._eq_keyset(
        [d for d in m["delete_files"] if not d.get("pos")][0]
    )
    first = m["files"][0]
    assert ls._eq_stats_skip(stats[first], keys, vals)
    assert not ls._eq_stats_skip(stats[overl[0]], keys, vals)

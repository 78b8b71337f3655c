"""Concurrent upsert-writer conflict validation (r10 — VERDICT r9 #4):
`_commit_append` rebases blindly for append-shaped commits, so two
concurrent upsert batches touching the SAME key would both land with
the last rebase winning silently. Iceberg's validateNoConflictingDeletes
now runs in the rebase window: intersecting equality-delete keys (or
any state-changing commit that cannot prove disjointness) abort the
commit — and ordered upserts re-resolve deterministically via the
order column instead of failing."""

from __future__ import annotations

import json
import os
from types import SimpleNamespace

import pytest
from pyspark.sql import Row

from apache_iceberg_exploration_spark.sources.lakehouse import (
    LakehouseTable,
)
from apache_iceberg_exploration_spark.streaming import (
    lakehouse_sink as S,
)


def _task_msg(root, rows, keys):
    """Executor-side work of one upsert task, driver-simulated: data
    file + keys-only file."""
    import uuid

    files, stats, parts = S.write_task_files(rows, root)
    kf, _ = S._write_one_file(
        [{k: r[k] for k in keys} for r in rows],
        os.path.join(root, "data", f"stream-keys-{uuid.uuid4().hex[:8]}"),
    )
    return SimpleNamespace(
        files=files, stats=stats, partitions=parts, key_files=[kf]
    )


def _upsert_commit(root, rows, keys, since=None, **kw):
    msg = _task_msg(root, rows, keys)
    conflict = None
    if since is not None:
        conflict = {
            "since": since,
            "key_cols": keys,
            "tuples": {
                tuple(r[k] for k in keys) for r in rows
            },
            "enc_key": None,
        }
    return S._commit_append(
        root,
        msg.files,
        msg.stats,
        {"test_batch": 1},
        eq_delete=(msg.key_files, keys),
        conflict_check=conflict,
        **kw,
    )


def test_intersecting_keys_conflict_disjoint_pass(spark, tmp_path):
    root = str(tmp_path / "t")
    _upsert_commit(root, [{"k": 0, "v": "a"}, {"k": 1, "v": "b"}], ["k"])
    since = 1
    # concurrent writer lands k=1 after `since`
    _upsert_commit(root, [{"k": 1, "v": "c"}], ["k"])
    # our batch ALSO touches k=1 and decided against version `since`
    with pytest.raises(S.UpsertKeyConflict, match="concurrently upserted"):
        _upsert_commit(root, [{"k": 1, "v": "d"}], ["k"], since=since)
    # a DISJOINT batch rebases cleanly through the same window
    v = _upsert_commit(root, [{"k": 7, "v": "e"}], ["k"], since=since)
    assert v == 3
    t = LakehouseTable(spark, root)
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got == {0: "a", 1: "c", 7: "e"}


def test_state_changing_commit_is_conservative_conflict(spark, tmp_path):
    from pyspark.sql import functions as F

    root = str(tmp_path / "t")
    _upsert_commit(root, [{"k": 0, "v": "a"}, {"k": 5, "v": "x"}], ["k"])
    since = 1
    t = LakehouseTable(spark, root)
    t.delete_where(F.col("k") == 5, prune={"k": (5, 5)})  # CoW rewrite
    with pytest.raises(S.UpsertKeyConflict, match="cannot prove"):
        _upsert_commit(root, [{"k": 9, "v": "z"}], ["k"], since=since)


def test_benign_ops_rebase_cleanly(spark, tmp_path):
    root = str(tmp_path / "t")
    _upsert_commit(root, [{"k": 0, "v": "a"}], ["k"])
    since = 1
    t = LakehouseTable(spark, root)
    t.append(
        spark.createDataFrame([Row(k=3, v="app")]).repartition(1)
    )  # pure append
    t.rewrite_data_files(target_file_count=1)  # compaction
    v = _upsert_commit(root, [{"k": 0, "v": "b"}], ["k"], since=since)
    assert v == 4  # upsert, append, compact, then this commit
    got = {r["k"]: r["v"] for r in LakehouseTable(spark, root).read().collect()}
    assert got == {0: "b", 3: "app"}


def test_ordered_writer_re_resolves_race(spark, tmp_path, monkeypatch):
    """Writer-level: an ordered upsert loses the race to a concurrent
    commit claiming its key — the conflict triggers a RE-RESOLVE
    against the new tip, and the order column decides deterministically
    (stale batch drops; fresher batch lands)."""
    root = str(tmp_path / "t")
    _upsert_commit(root, [{"k": 0, "ver": 1, "v": "base"}], ["k"])

    cls = S.make_lakehouse_stream_sink()
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("k", LongType()),
            StructField("ver", LongType()),
            StructField("v", StringType()),
        ]
    )

    real_commit = S._commit_append
    injected = {"done": False}

    def inject_then_commit(*a, **kw):
        if not injected["done"]:
            injected["done"] = True
            # the concurrent writer wins the link first, with ver=3
            _upsert_commit(root, [{"k": 0, "ver": 3, "v": "rival"}], ["k"])
        return real_commit(*a, **kw)

    monkeypatch.setattr(S, "_commit_append", inject_then_commit)

    def run_batch(rows, batch_id):
        ds = cls(options={"path": root, "mode": "upsert",
                          "upsertkeys": "k", "upsertorderby": "ver"})
        w = ds.streamWriter(schema, False)
        w.commit([_task_msg(root, rows, ["k"])], batch_id)

    # stale batch (ver=2 < rival's 3): re-resolve drops it entirely
    injected["done"] = False
    run_batch([{"k": 0, "ver": 2, "v": "stale"}], 100)
    got = {
        r["k"]: (r["ver"], r["v"])
        for r in LakehouseTable(spark, root).read().collect()
    }
    assert got == {0: (3, "rival")}
    # fresher batch (ver=9): re-resolve confirms the win, commits
    monkeypatch.setattr(S, "_commit_append", real_commit)
    run_batch([{"k": 0, "ver": 9, "v": "fresh"}], 101)
    got = {
        r["k"]: (r["ver"], r["v"])
        for r in LakehouseTable(spark, root).read().collect()
    }
    assert got == {0: (9, "fresh")}


def test_plain_writer_conflict_surfaces(spark, tmp_path, monkeypatch):
    """Without an order column the race cannot be resolved — the
    writer raises instead of letting the last rebase win silently."""
    root = str(tmp_path / "t")
    _upsert_commit(root, [{"k": 0, "v": "base"}], ["k"])

    cls = S.make_lakehouse_stream_sink()
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [StructField("k", LongType()), StructField("v", StringType())]
    )
    real_commit = S._commit_append
    injected = {"done": False}

    def inject_then_commit(*a, **kw):
        if not injected["done"]:
            injected["done"] = True
            _upsert_commit(root, [{"k": 0, "v": "rival"}], ["k"])
        return real_commit(*a, **kw)

    monkeypatch.setattr(S, "_commit_append", inject_then_commit)
    ds = cls(options={"path": root, "mode": "upsert", "upsertkeys": "k"})
    w = ds.streamWriter(schema, False)
    with pytest.raises(S.UpsertKeyConflict):
        w.commit([_task_msg(root, [{"k": 0, "v": "mine"}], ["k"])], 100)
    got = {r["k"]: r["v"] for r in LakehouseTable(spark, root).read().collect()}
    assert got == {0: "rival"}  # the rival's commit stands alone


def test_expired_snapshots_in_window_use_op_record(spark, tmp_path):
    """ADVICE r10: snapshot expiry racing the stream must not drop a
    batch whose rebase window is provably benign — expire_snapshots
    records each expired version's operation; the conflict check
    consults it (and recovers an expired upsert's claim set from the
    TIP's carried equality entries)."""
    root = str(tmp_path / "t")
    _upsert_commit(root, [{"k": 0, "v": "a"}], ["k"])  # v1
    since = 1
    t = LakehouseTable(spark, root)
    # two plain APPENDS in the window (benign ops)...
    t.append(spark.createDataFrame([Row(k=100, v="x")]).coalesce(1))  # v2
    t.append(spark.createDataFrame([Row(k=101, v="y")]).coalesce(1))  # v3
    # ...then expiry removes their snapshot JSONs mid-stream
    expired = t.expire_snapshots(keep_last=1)
    assert set(expired) >= {1, 2}
    assert not os.path.exists(
        os.path.join(root, "snapshots", "v2.json")
    )
    # window (1, 3] spans expired versions, all benign → commit lands
    v = _upsert_commit(root, [{"k": 0, "v": "b"}], ["k"], since=since)
    assert v == 4
    got = {r["k"]: r["v"] for r in LakehouseTable(spark, root).read().collect()}
    assert got == {0: "b", 100: "x", 101: "y"}


def test_expired_upsert_claim_recovered_from_tip_entries(spark, tmp_path):
    root = str(tmp_path / "t")
    _upsert_commit(root, [{"k": 0, "v": "a"}], ["k"])  # v1
    since = 1
    # concurrent upsert claims k=5 at v2, then an append at v3
    _upsert_commit(root, [{"k": 5, "v": "c"}], ["k"])  # v2
    t = LakehouseTable(spark, root)
    t.append(spark.createDataFrame([Row(k=9, v="z")]).coalesce(1))  # v3
    assert 2 in t.expire_snapshots(keep_last=1)
    # intersecting batch: the expired upsert's keys come from the tip's
    # carried equality entry (seq == 1) → EXACT conflict, not conservative
    with pytest.raises(S.UpsertKeyConflict, match="concurrently upserted"):
        _upsert_commit(root, [{"k": 5, "v": "d"}], ["k"], since=since)
    # disjoint batch sails through the same expired window
    v = _upsert_commit(root, [{"k": 7, "v": "e"}], ["k"], since=since)
    assert v >= 4


def test_expired_window_without_op_record_stays_conservative(
    spark, tmp_path
):
    root = str(tmp_path / "t")
    _upsert_commit(root, [{"k": 0, "v": "a"}], ["k"])  # v1
    since = 1
    t = LakehouseTable(spark, root)
    t.append(spark.createDataFrame([Row(k=100, v="x")]).coalesce(1))  # v2
    t.append(spark.createDataFrame([Row(k=101, v="y")]).coalesce(1))  # v3
    t.expire_snapshots(keep_last=1)
    # a pre-fix expiry (no sidecar) keeps the old conservative behavior
    os.remove(os.path.join(root, "snapshots", "expired-ops.json"))
    with pytest.raises(S.UpsertKeyConflict, match="cannot prove"):
        _upsert_commit(root, [{"k": 0, "v": "b"}], ["k"], since=since)

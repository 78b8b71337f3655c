"""Equality-delete debt compaction (r11 — VERDICT r10 #7):
``coalesce_equality_deletes_to_dv`` materializes the per-commit
equality-delete entries a streaming-upsert table accumulates into
deletion vectors — read cost drops from one key-parquet per pending
entry to one DV container, values unchanged, CDC nets zero, tombstoned
keys stay dead on the ordered/patch lookup path."""

from __future__ import annotations

import os
import uuid
from types import SimpleNamespace

import pytest
from pyspark.sql import Row

from apache_iceberg_exploration_spark.sources.lakehouse import (
    LakehouseTable,
)
from apache_iceberg_exploration_spark.streaming import (
    lakehouse_sink as S,
)


def _upsert(root, rows, keys, delete_col=None):
    """One upsert micro-batch, driver-simulated (the conflict-test
    fixture shape)."""
    live = []
    tomb = []
    for r in rows:
        r = dict(r)
        if delete_col and r.pop(delete_col, False):
            tomb.append(r)
        else:
            live.append(r)
    files, stats, parts = ([], {}, {})
    if live:
        files, stats, parts = S.write_task_files(live, root)
    key_rows = [
        {k: r[k] for k in keys} for r in live + tomb
    ]
    kf, _ = S._write_one_file(
        key_rows,
        os.path.join(root, "data", f"stream-keys-{uuid.uuid4().hex[:8]}"),
    )
    return S._commit_append(
        root,
        files,
        stats,
        {"test_batch": 1},
        eq_delete=([kf], keys),
    )


def _eq_entries(t):
    return [
        d
        for d in t._read_manifest(t.current_version()).get(
            "delete_files", []
        )
        if not d.get("pos")
    ]


def _state(spark, root):
    t = LakehouseTable(spark, root)
    return {r["k"]: r["v"] for r in t.read().collect()}


def test_debt_grows_then_coalesces_flat(spark, tmp_path):
    root = str(tmp_path / "t")
    for i in range(5):
        _upsert(
            root,
            [{"k": j, "v": f"r{i}-{j}"} for j in (i, i + 1, i + 2)],
            ["k"],
        )
    t = LakehouseTable(spark, root)
    entries = _eq_entries(t)
    # one entry per commit after the first: the debt the verdict names
    assert len(entries) == 4
    opened_before = sum(len(d["files"]) for d in entries)
    assert opened_before == 4
    before = _state(spark, root)
    assert before == {
        0: "r0-0", 1: "r1-1", 2: "r2-2", 3: "r3-3",
        4: "r4-4", 5: "r4-5", 6: "r4-6",
    }
    rep = t.coalesce_equality_deletes_to_dv()
    assert rep is not None
    assert rep["summary"]["coalesced_eq_entries"] == 4
    t2 = LakehouseTable(spark, root)
    # flat read cost: zero pending entries, zero key parquets to open
    assert _eq_entries(t2) == []
    assert _state(spark, root) == before
    # idempotent / no debt → None
    assert t2.coalesce_equality_deletes_to_dv() is None
    # new upserts accumulate again, a second coalesce flattens again
    _upsert(root, [{"k": 0, "v": "post"}], ["k"])
    assert len(_eq_entries(LakehouseTable(spark, root))) == 1
    assert _state(spark, root)[0] == "post"
    LakehouseTable(spark, root).coalesce_equality_deletes_to_dv()
    assert _eq_entries(LakehouseTable(spark, root)) == []
    got = _state(spark, root)
    assert got[0] == "post" and got[6] == "r4-6"


def test_cdc_nets_zero_across_coalesce(spark, tmp_path):
    root = str(tmp_path / "t")
    _upsert(root, [{"k": 0, "v": "a"}, {"k": 1, "v": "b"}], ["k"])
    _upsert(root, [{"k": 0, "v": "a2"}], ["k"])
    t = LakehouseTable(spark, root)
    v_before = t.current_version()
    t.coalesce_equality_deletes_to_dv()
    v_after = t.current_version()
    assert v_after == v_before + 1
    # batch changelog across the coalesce commit: zero net changes
    ch = t.changelog(v_before, v_after)
    assert ch.count() == 0
    # streaming CDC across it nets zero too
    from apache_iceberg_exploration_spark.streaming.lakehouse_source import (
        _cdc_rows,
    )

    rows = _cdc_rows(root, v_before, v_after, ["k", "v"])
    assert rows == []


def test_tombstoned_key_stays_dead_for_lookup(spark, tmp_path):
    """The ordered/patch current-state lookup must honor DVs: after
    coalescing, a tombstoned key's rows are DV-dead — resurrecting
    them would feed deleted values into patch inheritance."""
    root = str(tmp_path / "t")
    _upsert(root, [{"k": 0, "v": "a"}, {"k": 1, "v": "b"}], ["k"])
    _upsert(
        root,
        [{"k": 0, "v": None, "__dead": True}],
        ["k"],
        delete_col="__dead",
    )
    t = LakehouseTable(spark, root)
    assert _state(spark, root) == {1: "b"}
    # pre-coalesce: entry-dead; lookup sees no current row for k=0
    cur = S._lookup_current_rows(
        root, ["k"], {(0,), (1,)}, None, need_full=True
    )
    assert (0,) not in cur and cur[(1,)][1]["v"] == "b"
    t.coalesce_equality_deletes_to_dv()
    assert _state(spark, root) == {1: "b"}
    # post-coalesce: DV-dead; the lookup must agree
    cur2 = S._lookup_current_rows(
        root, ["k"], {(0,), (1,)}, None, need_full=True
    )
    assert (0,) not in cur2 and cur2[(1,)][1]["v"] == "b"
    # and the column-pruned (ordered) path too
    cur3 = S._lookup_current_rows(
        root, ["k"], {(0,), (1,)}, None, need_full=False, order_col="v"
    )
    assert (0,) not in cur3


def test_call_surface_runs_the_verb(spark, tmp_path):
    from apache_iceberg_exploration_spark.sources.sql_tvf import (
        call_procedure,
    )

    root = str(tmp_path / "t")
    _upsert(root, [{"k": 0, "v": "a"}], ["k"])
    _upsert(root, [{"k": 0, "v": "b"}], ["k"])
    rep = call_procedure(
        spark, root, "coalesce_equality_deletes_to_dv"
    ).collect()
    kv = {r["key"]: r["value"] for r in rep}
    assert any(
        "coalesced_eq_entries" in f"{k}{v}" for k, v in kv.items()
    ), kv
    assert _eq_entries(LakehouseTable(spark, root)) == []
    assert _state(spark, root) == {0: "b"}

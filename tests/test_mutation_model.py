"""Model-based randomized mutation test: a seeded random sequence of
table operations (append, CoW update/delete, DV delete, DV update,
position delete, equality MoR delete, compaction, DV coalescing) is
mirrored in a plain-Python model; after every step the table must read
back exactly the model, and at the end the STREAMING CDC replay of the
full history must net to the final state — the strongest composition
guarantee the delete/rewrite machinery can offer (any path that loses,
resurrects, or double-emits a row breaks one of the two checks).

Deterministic: seeds are fixed; random.Random is test-local.
"""

from __future__ import annotations

import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from apache_iceberg_exploration_spark.sources.lakehouse import (
    LakehouseTable,
)
from apache_iceberg_exploration_spark.streaming.lakehouse_source import (
    _cdc_rows,
)

N_OPS = 12


def _mk_df(spark, rows):
    return spark.createDataFrame(rows, "k long, v long").coalesce(1)


def _run_sequence(spark, tmp_path, seed: int) -> None:
    rng = random.Random(seed)
    t = LakehouseTable(spark, str(tmp_path / f"t{seed}"))
    model: Counter = Counter()  # multiset of (k, v)
    next_k = 0

    def append(n):
        nonlocal next_k
        rows = [(next_k + i, (next_k + i) * 10) for i in range(n)]
        next_k += n
        t.append(_mk_df(spark, rows))
        model.update(rows)

    def upsert(n_new, n_upd, n_dead):
        """One streaming-upsert micro-batch committed through the
        sink's protocol (data files + equality-delete entry in one
        atomic manifest): update n_upd live keys, tombstone n_dead
        others, insert n_new fresh keys."""
        import os as _os
        import uuid as _uuid

        from apache_iceberg_exploration_spark.streaming.lakehouse_sink import (
            _commit_append,
            _write_one_file,
            write_task_files,
        )

        nonlocal next_k
        live = sorted({k for (k, v) in model})
        upd = live[:n_upd]
        dead = live[n_upd : n_upd + n_dead]
        fresh = list(range(next_k, next_k + n_new))
        next_k += n_new
        new_rows = [(k, k * 10 + 7) for k in upd] + [
            (k, k * 10) for k in fresh
        ]
        files, stats, _ = write_task_files(
            [{"k": k, "v": v} for k, v in new_rows], t.path
        )
        key_rows = [{"k": k} for k, _ in new_rows] + [
            {"k": k} for k in dead
        ]
        kf, _ = _write_one_file(
            key_rows,
            _os.path.join(
                t.path, "data", f"stream-{_uuid.uuid4().hex[:12]}"
            ),
        )
        _commit_append(
            t.path,
            files,
            stats,
            {},
            eq_delete=([kf], ["k"]),
        )
        for kk in set(upd) | set(dead):
            for (k, v) in list(model):
                if k == kk:
                    del model[(k, v)]
            # the key's next incarnation is a NEW physical row: its
            # identity legitimately changes (Flink-style upsert does
            # not carry row ids) — forget the old one
            ids.pop(kk, None)
        model.update(new_rows)

    def racing_upserts():
        """Two upsert batches prepared against the SAME version (the
        concurrent-writer race, r10): both commit with
        validateNoConflictingDeletes armed. Disjoint keys: both land.
        Intersecting keys: the first lands, the second is REFUSED with
        UpsertKeyConflict (never silently last-rebase-wins)."""
        import os as _os
        import uuid as _uuid

        from apache_iceberg_exploration_spark.streaming.lakehouse_sink import (
            UpsertKeyConflict,
            _commit_append,
            _write_one_file,
            drop_task_dirs,
            write_task_files,
        )

        nonlocal next_k
        live = sorted({k for (k, v) in model})
        overlap = bool(live) and rng.random() < 0.5

        def prep(rows):
            files, stats, _ = write_task_files(
                [{"k": k, "v": v} for k, v in rows], t.path
            )
            kf, _ = _write_one_file(
                [{"k": k} for k, _ in rows],
                _os.path.join(
                    t.path, "data", f"stream-{_uuid.uuid4().hex[:12]}"
                ),
            )
            return files, stats, kf, {(k,) for k, _ in rows}

        a_rows = [(next_k, next_k * 10)]
        b_key = live[0] if overlap else next_k + 1
        b_rows = [(b_key, b_key * 10 + 3)]
        if overlap:
            a_rows.append((live[0], live[0] * 10 + 5))
        next_k += 2
        since = t.current_version()
        a = prep(a_rows)
        b = prep(b_rows)
        for rows, (files, stats, kf, tuples), expect_conflict in (
            (a_rows, a, False),
            (b_rows, b, overlap),
        ):
            conflict = {
                "since": since,
                "key_cols": ["k"],
                "tuples": tuples,
                "enc_key": None,
            }
            if expect_conflict:
                try:
                    _commit_append(
                        t.path, files, stats, {},
                        eq_delete=([kf], ["k"]),
                        conflict_check=conflict,
                    )
                    raise AssertionError(
                        "intersecting racing upserts both landed"
                    )
                except UpsertKeyConflict:
                    drop_task_dirs(files + [kf])
                continue
            _commit_append(
                t.path, files, stats, {},
                eq_delete=([kf], ["k"]),
                conflict_check=conflict,
            )
            for kk in {k for k, _ in rows}:
                for (k, v) in list(model):
                    if k == kk:
                        del model[(k, v)]
                ids.pop(kk, None)
            model.update(rows)

    append(rng.randint(5, 15))  # v1 seed data
    # k -> _row_id, captured when first observed (v1 upfront so a
    # rollback-to-v1 restores real knowledge, not an empty map)
    ids: dict = {
        r["k"]: r["_row_id"]
        for r in t.read(with_lineage=True).collect()
    }
    history = {t.current_version(): (model.copy(), dict(ids))}
    ops = [
        "append",
        "cow_delete",
        "dv_delete",
        "pos_delete",
        "mor_delete",
        "cow_update",
        "dv_update",
        "compact",
        "coalesce_dv",
        "rollback",
        "upsert",
        "racing_upserts",
    ]
    for step in range(N_OPS):
        op = rng.choice(ops)
        if op == "append":
            append(rng.randint(1, 6))
        elif op == "upsert":
            upsert(
                rng.randint(1, 4), rng.randint(0, 3), rng.randint(0, 2)
            )
        elif op == "racing_upserts":
            racing_upserts()
        elif op == "cow_delete":
            m = rng.randint(2, 5)
            r = rng.randint(0, m - 1)
            t.delete_where(F.col("k") % m == r)
            for (k, v) in list(model):
                if k % m == r:
                    del model[(k, v)]
        elif op == "dv_delete":
            m = rng.randint(2, 5)
            r = rng.randint(0, m - 1)
            t.delete_where_dv(F.col("k") % m == r)
            for (k, v) in list(model):
                if k % m == r:
                    del model[(k, v)]
        elif op == "pos_delete":
            m = rng.randint(3, 6)
            r = rng.randint(0, m - 1)
            t.delete_where_pos(F.col("k") % m == r)
            for (k, v) in list(model):
                if k % m == r:
                    del model[(k, v)]
        elif op == "mor_delete":
            m = rng.randint(3, 6)
            r = rng.randint(0, m - 1)
            t.delete_where_mor(F.col("k") % m == r, keys=["k"])
            for (k, v) in list(model):
                if k % m == r:
                    del model[(k, v)]
        elif op == "cow_update":
            m = rng.randint(2, 5)
            r = rng.randint(0, m - 1)
            t.update_where(
                F.col("k") % m == r, {"v": F.col("v") + 1}
            )
            bump = [(k, v) for (k, v) in model if k % m == r]
            for kv in bump:
                c = model.pop(kv)
                model[(kv[0], kv[1] + 1)] += c
        elif op == "dv_update":
            m = rng.randint(2, 5)
            r = rng.randint(0, m - 1)
            t.update_where_dv(
                F.col("k") % m == r, {"v": F.col("v") + 2}
            )
            bump = [(k, v) for (k, v) in model if k % m == r]
            for kv in bump:
                c = model.pop(kv)
                model[(kv[0], kv[1] + 2)] += c
        elif op == "compact":
            t.rewrite_data_files(target_file_count=rng.randint(1, 3))
        elif op == "coalesce_dv":
            t.coalesce_deletes_to_dv()
        elif op == "rollback":
            target = rng.choice(sorted(history))
            t.rollback(target)
            model, ids = (
                history[target][0].copy(),
                dict(history[target][1]),
            )
        rows = t.read(with_lineage=True).collect()
        got = Counter((r["k"], r["v"]) for r in rows)
        assert got == model, (
            f"seed {seed} step {step} op {op}: table != model\n"
            f"extra in table: {got - model}\n"
            f"missing from table: {model - got}"
        )
        # O(metadata) count invariant (late r8): stats minus DV/pos
        # mass must equal the true row count after EVERY mutation kind
        # (the one sanctioned exception — pending equality deletes —
        # falls back to an exact scan inside count_rows itself)
        assert t.count_rows() == sum(model.values()), (
            f"seed {seed} step {step} op {op}: count_rows drifted"
        )
        # row-identity invariant (Iceberg v3): a surviving row's
        # _row_id NEVER changes, whatever rewrote it; fresh rows get
        # fresh ids (the counter is monotone, ids never reused)
        seen_ids = set()
        for r in rows:
            k, rid = r["k"], r["_row_id"]
            assert rid not in seen_ids, (
                f"seed {seed} step {step}: duplicate _row_id {rid}"
            )
            seen_ids.add(rid)
            if k in ids:
                assert rid == ids[k], (
                    f"seed {seed} step {step} op {op}: row k={k} "
                    f"changed identity {ids[k]} -> {rid}"
                )
            else:
                ids[k] = rid
        history[t.current_version()] = (model.copy(), dict(ids))

    # CDC replay of the FULL history nets to the final state — every
    # delete flavor's emission and every rewrite's net-zero must
    # compose across the whole random sequence
    tip = t.current_version()
    net: Counter = Counter()
    for row in _cdc_rows(t.path, 0, tip, ["k", "v"]):
        k, v, kind = row[0], row[1], row[2]
        # streaming-upsert commits emit Delta-CDF update PAIRS in value
        # mode too (r9): postimage adds a row, preimage removes one
        if kind in ("insert", "update_postimage"):
            net[(k, v)] += 1
        else:
            net[(k, v)] -= 1
    assert not any(n < 0 for n in net.values()), f"seed {seed}: negative net"
    alive = Counter({kv: n for kv, n in net.items() if n > 0})
    assert alive == model, (
        f"seed {seed}: CDC replay != final state\n"
        f"extra: {alive - model}\nmissing: {model - alive}"
    )
    # windowed CDC reads compose: splitting the interval at any point
    # yields the same multiset of events
    cut = tip // 2
    whole = sorted(_cdc_rows(t.path, 0, tip, ["k", "v"]))
    split = sorted(
        _cdc_rows(t.path, 0, cut, ["k", "v"])
        + _cdc_rows(t.path, cut, tip, ["k", "v"])
    )
    assert whole == split, f"seed {seed}: CDC windows do not compose"


@pytest.mark.parametrize("seed", [7, 12, 39, 105, 133])
def test_random_mutation_sequences_match_model(spark, tmp_path, seed):
    _run_sequence(spark, tmp_path, seed)


# -- r8: schema evolution with DEFAULT column values in the mix ----------
#
# A second randomized sequence where `tier` is ADDED (with an
# initial-default) after the seed data exists, and the ops include
# evolving/dropping the write-default, appends that omit the column,
# and rollbacks that restore BOTH data and the schema's default state
# (rollback re-commits the old manifest's schema, write-default
# included). The model tracks (k, v, tier) where tier is decided by
# WHICH ERA wrote the row — exactly the per-file semantics the readers
# implement.

D0 = "gen0"


def _run_defaults_sequence(spark, tmp_path, seed: int) -> None:
    rng = random.Random(seed)
    t = LakehouseTable(spark, str(tmp_path / f"d{seed}"))
    model: Counter = Counter()  # multiset of (k, v, tier)
    next_k = 0
    wd: str | None = None  # current write-default (None = pre-add/dropped)
    added = False

    def append(n, explicit: str | None = None):
        nonlocal next_k
        ks = list(range(next_k, next_k + n))
        next_k += n
        if not added:
            t.append(_mk_df(spark, [(k, k * 10) for k in ks]))
            # pre-add rows read the (future) initial-default
            model.update((k, k * 10, D0) for k in ks)
        elif explicit is not None:
            df = spark.createDataFrame(
                [(k, k * 10, explicit) for k in ks],
                "k long, v long, tier string",
            ).coalesce(1)
            t.append(df)
            model.update((k, k * 10, explicit) for k in ks)
        else:
            t.append(_mk_df(spark, [(k, k * 10) for k in ks]))
            model.update((k, k * 10, wd) for k in ks)

    append(rng.randint(5, 12))  # v1: pre-add files
    t.add_column("tier", "string", default=D0)  # v2
    added, wd = True, D0
    history = {t.current_version(): (model.copy(), wd)}
    ops = [
        "append_omit",
        "append_explicit",
        "set_default",
        "drop_default",
        "cow_delete",
        "dv_delete",
        "cow_update",
        "mor_delete",
        "compact",
        "rollback",
    ]
    for step in range(N_OPS):
        op = rng.choice(ops)
        if op == "append_omit":
            append(rng.randint(1, 5))
        elif op == "append_explicit":
            append(rng.randint(1, 4), explicit=f"x{rng.randint(0, 2)}")
        elif op == "set_default":
            wd = f"gen{rng.randint(1, 9)}"
            t.set_column_default("tier", wd)
        elif op == "drop_default":
            wd = None
            t.drop_column_default("tier")
        elif op == "cow_delete":
            m = rng.randint(2, 5)
            r = rng.randint(0, m - 1)
            t.delete_where(F.col("k") % m == r)
            for row in list(model):
                if row[0] % m == r:
                    del model[row]
        elif op == "dv_delete":
            m = rng.randint(2, 5)
            r = rng.randint(0, m - 1)
            t.delete_where_dv(F.col("k") % m == r)
            for row in list(model):
                if row[0] % m == r:
                    del model[row]
        elif op == "cow_update":
            m = rng.randint(2, 5)
            r = rng.randint(0, m - 1)
            t.update_where(F.col("k") % m == r, {"v": F.col("v") + 1})
            bump = [row for row in model if row[0] % m == r]
            for row in bump:
                c = model.pop(row)
                model[(row[0], row[1] + 1, row[2])] += c
        elif op == "mor_delete":
            m = rng.randint(3, 6)
            r = rng.randint(0, m - 1)
            t.delete_where_mor(F.col("k") % m == r, keys=["k"])
            for row in list(model):
                if row[0] % m == r:
                    del model[row]
        elif op == "compact":
            t.rewrite_data_files(target_file_count=rng.randint(1, 3))
        elif op == "rollback":
            target = rng.choice(sorted(history))
            t.rollback(target)
            model, wd = history[target][0].copy(), history[target][1]
        got = Counter(
            (r["k"], r["v"], r["tier"]) for r in t.read().collect()
        )
        assert got == model, (
            f"seed {seed} step {step} op {op}: table != model\n"
            f"extra: {got - model}\nmissing: {model - got}"
        )
        history[t.current_version()] = (model.copy(), wd)

    # CDC replay with STREAM-style defaults (the reader derives the
    # fill from ITS tip schema once and applies it to every window) —
    # nets to the final state and composes at any split
    tip = t.current_version()
    dflt = {"tier": D0}
    net: Counter = Counter()
    for row in _cdc_rows(t.path, 0, tip, ["k", "v", "tier"], defaults=dflt):
        key, kind = (row[0], row[1], row[2]), row[3]
        net[key] += 1 if kind == "insert" else -1
    alive = Counter({kv: n for kv, n in net.items() if n > 0})
    assert alive == model, (
        f"seed {seed}: CDC replay != final state\n"
        f"extra: {alive - model}\nmissing: {model - alive}"
    )
    cut = tip // 2
    whole = sorted(_cdc_rows(t.path, 0, tip, ["k", "v", "tier"], defaults=dflt))
    split = sorted(
        _cdc_rows(t.path, 0, cut, ["k", "v", "tier"], defaults=dflt)
        + _cdc_rows(t.path, cut, tip, ["k", "v", "tier"], defaults=dflt)
    )
    assert whole == split, f"seed {seed}: CDC windows do not compose"


@pytest.mark.parametrize("seed", [11, 42, 77])
def test_random_default_evolution_sequences_match_model(
    spark, tmp_path, seed
):
    _run_defaults_sequence(spark, tmp_path, seed)

"""Materialized-view OBJECTS (Iceberg materialized-view spec shape, r9
— VERDICT r8 #4).

The engine has had MV *refresh* recipes (changelog-driven signed MERGE,
two-delta join maintenance) since r5; this module adds the missing MV
METADATA so a view is a first-class, staleness-aware object:

- an MV directory holds ``mv.json`` (the view metadata: source-table
  pointer, the DECLARED transform spec, the storage-table pointer, and
  the refresh state — the source snapshot version the storage
  currently reflects) plus the storage table itself — exactly the
  Iceberg MV spec's split of "view metadata + storage table + refresh
  state of source snapshot ids";
- ``read_mv(max_staleness_versions=…)`` is the staleness-aware read:
  the freshness check compares the recorded source version to the
  source's current version — two metadata file reads, ZERO data IO —
  and serves the storage table directly when fresh enough; when stale
  it refreshes INCREMENTALLY first (see below), never by recompute;
- refresh consumes ``source.changelog(last_refreshed, tip)`` — O(rows
  changed), not O(source) — turns it into signed per-group deltas, and
  MERGEs them into the storage table: matched groups fold the delta
  in, groups whose row count reaches zero are deleted, fresh groups
  insert. Exact for the declared spec class (group-by + sum/count —
  the self-maintainable aggregates; avg derives as sum/count at read).

The declared-spec restriction is the Iceberg/materialize design point:
an MV object promises INCREMENTAL maintenance, so its transform must
be expressible in a self-maintainable algebra. Arbitrary DataFrame
transforms stay in the foreachBatch/`streaming_cdc_mv_maintenance`
pattern (exact, but caller-owned).

r10 (VERDICT r9 #2) widens the declared algebra two ways:

- **join MVs**: ``spec["join"] = {"right_path": <lakehouse table>,
  "on": [key, ...]}`` declares an INNER equi-join before the group-by.
  Maintenance is the classic two-delta identity — with L1 = L0 + ΔL
  and R1 = R0 + ΔR (signed multisets),

      L1⋈R1 − L0⋈R0 = ΔL⋈R1 + L0⋈ΔR

  so a refresh joins the (small, signed) left changelog slice against
  the right table AT ITS NEW VERSION, plus the left table AT ITS OLD
  VERSION (time travel) against the signed right slice; each join
  broadcasts the delta side, so the cost is one pruned scan per base
  table — never a recompute-shaped shuffle-agg. Both source versions
  are recorded in ``mv.json`` / the refresh markers.
- **min/max aggregates**: not self-maintainable under deletes (a
  delete can kill the current max), so refresh SPLITS the touched
  groups: insert-only groups fold incrementally
  (``least``/``greatest`` + sum/count addition), groups that saw any
  delete/update-preimage are recomputed EXACTLY from the source
  relation scoped to just those group keys (broadcast semi-join, a
  value-idempotent replace). Both arms commit as ONE merge (r12): a
  per-row ``__mv_replace`` flag on the merge source selects fold vs
  replace semantics per group, so the refresh is atomic — no staged
  partial state. Tables written by the pre-r12 two-merge version that
  crashed between their merges still recover: their ``stage1`` marker
  routes through the legacy :func:`_replace_phase` finish first.

Refresh atomicity rides the storage table's own commit protocol (one
manifest link per refresh); ``mv.json`` updates are rename-free
sidecar publishes. A crashed refresh leaves a committed-but-unrecorded
storage snapshot; the next refresh detects it via the refresh marker
in the storage summary and SKIPS the double-apply (idempotent).
``gc_orphan_storage`` removes storage generations no ``mv.json``
references (failed create/drop races).

Scale: freshness check O(1) metadata; refresh cost = changed source
rows + touched storage groups (merge prunes by group key when
clustered). A 100 TB source with a 10^6-group storage refreshes in
seconds if a commit touched thousands of rows.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .lakehouse import LakehouseTable, _publish_sidecar

_COUNT_COL = "__mv_rows"  # per-group row count: drives group deletion


def _mv_meta_path(mv_path: str) -> str:
    return os.path.join(mv_path, "mv.json")


def _read_meta(mv_path: str) -> dict:
    try:
        with open(_mv_meta_path(mv_path)) as f:
            return json.load(f)
    except OSError as ex:
        raise ValueError(
            f"no materialized view at {mv_path!r} (mv.json missing)"
        ) from ex


def _validate_spec(spec: dict) -> None:
    if not spec.get("group_by"):
        raise ValueError("mv spec requires non-empty group_by")
    join = spec.get("join")
    if join is not None and (
        not join.get("right_path") or not join.get("on")
    ):
        raise ValueError(
            "mv join spec requires right_path and on=[key, ...] "
            "(INNER equi-join on same-named key columns)"
        )
    where = spec.get("where")
    if where is not None and not isinstance(where, str):
        raise ValueError(
            "mv where spec must be a SQL boolean expression string "
            "(it is persisted in mv.json) — deterministic row-local "
            "predicates only: the signed-multiset refresh algebra "
            "filters deltas with the same expression"
        )
    for out, (kind, col) in spec.get("aggs", {}).items():
        if kind not in ("sum", "count", "min", "max", "avg"):
            raise ValueError(
                f"mv agg {out!r}: kind {kind!r} not incrementally "
                "maintainable here (supported: sum, count, min, max, "
                "avg — avg is materialized as a (sum, count) pair and "
                "derived at read)"
            )
        if kind == "avg" and not col:
            raise ValueError("mv avg agg requires a source column")
        if out == _COUNT_COL or out.startswith("__mv_"):
            raise ValueError(
                f"mv agg output {out!r}: the __mv_ prefix is reserved "
                "for internal bookkeeping columns"
            )


def _physical_aggs(spec: dict) -> dict:
    """The storage-table aggregate map: every declared agg keeps the
    self-maintainable algebra, with ``avg`` expanded into its
    materialized (sum, non-null count) pair — the internal ``countnn``
    kind counts NON-NULL measure values (avg ignores NULLs), distinct
    from the declared ``count`` kind's count(*)."""
    out: dict = {}
    for o, (kind, col) in spec.get("aggs", {}).items():
        if kind == "avg":
            out[f"__mv_avg_{o}_sum"] = ("sum", col)
            out[f"__mv_avg_{o}_cnt"] = ("countnn", col)
        else:
            out[o] = (kind, col)
    return out


def _has_minmax(spec: dict) -> bool:
    return any(
        kind in ("min", "max")
        for kind, _ in spec.get("aggs", {}).values()
    )


def _needed_cols(spec: dict) -> list[str]:
    cols = list(spec["group_by"])
    for _out, (_kind, col) in spec.get("aggs", {}).items():
        if col and col not in cols:
            cols.append(col)
    return cols


def _open_right(
    spark: SparkSession, spec: dict, encryption_key
) -> LakehouseTable | None:
    join = spec.get("join")
    if join is None:
        return None
    return LakehouseTable(
        spark, join["right_path"], encryption_key=encryption_key
    )


def _relation(
    src: LakehouseTable,
    right: LakehouseTable | None,
    spec: dict,
    l_version: int,
    r_version: int,
) -> DataFrame:
    """The MV's source relation at pinned versions: the base table, or
    the declared INNER equi-join (key columns same-named both sides —
    validated at create, so the join coalesces keys unambiguously),
    with the declared WHERE filter applied AFTER the join (the filter
    may reference either side; filters commute with the signed-multiset
    delta algebra, so deltas are filtered with the same expression)."""
    df = src.read(version=l_version)
    if right is not None:
        df = df.join(
            right.read(version=r_version), on=list(spec["join"]["on"])
        )
    if spec.get("where"):
        df = df.filter(F.expr(spec["where"]))
    return df


def _sign(changes: DataFrame) -> DataFrame:
    """Signed multiset view of a changelog slice: inserts (and update
    postimages) +1, deletes (and preimages) -1."""
    return changes.withColumn(
        "__sign",
        F.when(
            F.col("_change_type").isin("insert", "update_postimage"),
            F.lit(1),
        ).otherwise(F.lit(-1)),
    )


def _delta_rows(
    src: LakehouseTable,
    right: LakehouseTable | None,
    spec: dict,
    l_last: int,
    l_tip: int,
    r_last: int,
    r_tip: int,
) -> DataFrame:
    """Signed row-level deltas of the source RELATION over the version
    window. Single table: the changelog slice itself. Join: the
    two-delta identity ΔL⋈R1 + L0⋈ΔR (each term skipped when its
    delta side is empty — in particular a right-only commit never
    reads the left changelog, and vice versa). The delta side of each
    join is small by construction, so Catalyst/AQE broadcasts it; the
    base-table side is ONE pruned scan, never a shuffle-agg."""
    need = _needed_cols(spec)
    sel = need + ["__sign"]
    where = spec.get("where")

    def _flt(df: DataFrame) -> DataFrame:
        # the declared WHERE commutes with signed deltas: filter each
        # delta term BEFORE projection (the predicate may reference
        # columns outside the needed set)
        return df.filter(F.expr(where)) if where else df

    if right is None:
        return _flt(_sign(src.changelog(l_last, l_tip))).select(*sel)
    on = list(spec["join"]["on"])
    parts = []
    if l_tip > l_last:
        parts.append(
            _flt(
                _sign(src.changelog(l_last, l_tip)).join(
                    right.read(version=r_tip), on=on
                )
            ).select(*sel)
        )
    if r_tip > r_last:
        parts.append(
            _flt(
                src.read(version=l_last).join(
                    _sign(right.changelog(r_last, r_tip)), on=on
                )
            ).select(*sel)
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _agg_signed(rows: DataFrame, spec: dict) -> DataFrame:
    """Per-group signed deltas (sum/count algebra) from signed rows."""
    aggs = [F.sum("__sign").alias(_COUNT_COL)]
    for out, (kind, col) in _physical_aggs(spec).items():
        if kind == "count":
            aggs.append(F.sum("__sign").cast("long").alias(out))
        elif kind == "countnn":
            aggs.append(
                F.sum(
                    F.when(F.col(col).isNotNull(), F.col("__sign"))
                    .otherwise(F.lit(0))
                )
                .cast("long")
                .alias(out)
            )
        elif kind == "sum":
            aggs.append(
                F.sum(F.col(col) * F.col("__sign")).alias(out)
            )
        else:  # min/max: only valid on insert-only groups (+1 signs)
            aggs.append(getattr(F, kind)(F.col(col)).alias(out))
    return rows.groupBy(*spec["group_by"]).agg(*aggs)


def _full_build(source_df: DataFrame, spec: dict) -> DataFrame:
    aggs = [F.count("*").alias(_COUNT_COL)]
    for out, (kind, col) in _physical_aggs(spec).items():
        if kind == "count":
            aggs.append(F.count("*").cast("long").alias(out))
        elif kind == "countnn":
            aggs.append(F.count(F.col(col)).cast("long").alias(out))
        else:  # sum/min/max share the exact-recompute shape
            aggs.append(getattr(F, kind)(col).alias(out))
    return source_df.groupBy(*spec["group_by"]).agg(*aggs)


def create_materialized_view(
    spark: SparkSession,
    mv_path: str,
    source_path: str,
    spec: dict,
    name: str | None = None,
    encryption_key: bytes | str | None = None,
) -> dict:
    """Create the MV object: full initial build of the storage table
    from the source's CURRENT snapshot, then publish ``mv.json``
    recording that snapshot as the refresh state.

    ``spec`` = ``{"group_by": [cols], "aggs": {out: (kind, src_col)}}``
    with kind ∈ {sum, count}.

    ``encryption_key`` (never persisted — mv.json records only that a
    key is REQUIRED) reads an encrypted source AND encrypts the storage
    table under the same key, so the aggregate inherits the source's
    at-rest protection."""
    _validate_spec(spec)
    if os.path.exists(_mv_meta_path(mv_path)):
        raise ValueError(f"materialized view already exists at {mv_path!r}")
    src = LakehouseTable(
        spark, source_path, encryption_key=encryption_key
    )
    v = src.current_version()
    if v == 0:
        raise ValueError(f"source table {source_path!r} is empty")
    right = _open_right(spark, spec, encryption_key)
    r_v = 0
    if right is not None:
        r_v = right.current_version()
        if r_v == 0:
            raise ValueError(
                f"join right table {spec['join']['right_path']!r} is "
                "empty"
            )
        # same-named non-key columns would make delta joins ambiguous
        on = set(spec["join"]["on"])
        l_cols = set(src.read(version=v).columns) - on
        r_cols = set(right.read(version=r_v).columns) - on
        clash = sorted(l_cols & r_cols)
        if clash:
            raise ValueError(
                "mv join spec: non-key columns must be disjoint "
                f"between the two sides (clash: {clash})"
            )
    storage_dir = os.path.join(mv_path, f"storage-{uuid.uuid4().hex[:8]}")
    storage = LakehouseTable(
        spark, storage_dir, encryption_key=encryption_key
    )
    if encryption_key is not None:
        storage.enable_encryption(encryption_key)
    storage.overwrite(_full_build(_relation(src, right, spec, v, r_v), spec))
    os.makedirs(mv_path, exist_ok=True)
    meta = {
        "name": name or os.path.basename(mv_path),
        "source_path": os.path.abspath(source_path),
        "spec": spec,
        "storage_path": storage_dir,
        "last_source_version": v,
        "encrypted": encryption_key is not None,
    }
    if right is not None:
        meta["last_right_version"] = r_v
    _publish_sidecar(_mv_meta_path(mv_path), meta)
    return meta


def _bump(meta: dict, mv_path: str, l: int, r: int) -> dict:
    meta["last_source_version"] = l
    if meta["spec"].get("join") is not None:
        meta["last_right_version"] = r
    _publish_sidecar(_mv_meta_path(mv_path), meta)
    return meta


def _marker(
    storage: LakehouseTable, key: str, rkey: str
) -> tuple[int, int] | None:
    """Highest (left, right) version pair recorded under the given
    summary marker in the storage history — the crash-recovery floor
    for idempotent refresh (right component 0 for single-table MVs).

    Scans the storage history newest-first on the RAW manifests
    (summaries are inline — no part materialization) and stops at the
    first hit: refreshes commit in version order and each records
    source tips ≥ its predecessor's, so the newest marker IS the max.
    The old oldest-first full scan read O(commits) materialized
    manifests per refresh (optimization r12, guide §7.3 driver-side
    planning)."""
    for v in range(storage.current_version(), 0, -1):
        p = storage._manifest_path(v)
        if not os.path.exists(p):
            continue
        sm = storage._raw_manifest(p).get("summary") or {}
        if sm.get(key) is not None:
            return (int(sm[key]), int(sm.get(rkey, 0)))
    return None


def _summary(l: int, r: int, spec: dict, stage: bool = False) -> dict:
    if stage:
        d = {"mv_refresh_stage1": l}
        if spec.get("join") is not None:
            d["mv_refresh_stage1_right"] = r
    else:
        d = {"mv_refreshed_through": l}
        if spec.get("join") is not None:
            d["mv_refreshed_right"] = r
    return d


def _recompute_rows(
    src: LakehouseTable,
    right: LakehouseTable | None,
    storage: LakehouseTable,
    spec: dict,
    to: tuple[int, int],
    del_keys: DataFrame,
) -> DataFrame:
    """Exact replacement rows for the delete-touched groups: recomputed
    from the source relation at the target versions, scoped to just
    those group keys (broadcast semi-join). Groups with zero surviving
    rows are kept (count 0 — the merge's DELETE arm) only when storage
    HAS them: a group born and fully deleted within the slice is a
    no-op, and inserting its zero row would be wrong — storage is
    MV-sized, the semi-join is cheap."""
    keys = spec["group_by"]
    rel = _relation(src, right, spec, to[0], to[1]).join(
        F.broadcast(del_keys), on=keys
    )
    rec = _full_build(rel, spec)
    full = del_keys.join(rec, on=keys, how="left").withColumn(
        _COUNT_COL, F.coalesce(F.col(_COUNT_COL), F.lit(0))
    )
    zero = full.filter(F.col(_COUNT_COL) == 0).join(
        storage.read().select(*keys), on=keys, how="left_semi"
    )
    return full.filter(F.col(_COUNT_COL) != 0).unionByName(zero)


def _replace_phase(
    spark: SparkSession,
    src: LakehouseTable,
    right: LakehouseTable | None,
    storage: LakehouseTable,
    spec: dict,
    frm: tuple[int, int],
    to: tuple[int, int],
    del_keys: DataFrame | None = None,
) -> None:
    """LEGACY-RECOVERY merge: finish a crashed OLD-FORMAT (pre-r12)
    staged refresh whose fold merge committed a ``mv_refresh_stage1``
    marker but whose recompute-replace never ran. Current refreshes are
    single-commit (see :func:`refresh_materialized_view`) and never
    write stage markers, so this only fires on tables written by the
    two-merge version. Value-idempotent: re-running it after a crash
    replaces with the same values, so it carries the FINAL refresh
    marker."""
    keys = spec["group_by"]
    if del_keys is None:
        rows = _delta_rows(
            src, right, spec, frm[0], to[0], frm[1], to[1]
        )
        del_keys = (
            rows.groupBy(*keys)
            .agg(F.min("__sign").alias("__mn"))
            .filter(F.col("__mn") < 0)
            .select(*keys)
            .localCheckpoint(eager=True)
        )
    if del_keys.isEmpty():
        return
    src_merge = _recompute_rows(
        src, right, storage, spec, to, del_keys
    ).localCheckpoint(eager=True)
    if src_merge.isEmpty():
        return
    update_cols = {_COUNT_COL: F.col(f"s.{_COUNT_COL}")}
    for o in _physical_aggs(spec):
        update_cols[o] = F.col(f"s.{o}")
    storage.merge_into(
        src_merge,
        on=keys,
        update_cols=update_cols,
        delete_condition=F.col(f"s.{_COUNT_COL}") == 0,
        summary_extra=_summary(to[0], to[1], spec),
    )


def refresh_materialized_view(
    spark: SparkSession,
    mv_path: str,
    encryption_key: bytes | str | None = None,
) -> dict:
    """Incremental refresh to the source tip(s): signed row deltas of
    the source relation (changelog slice; two-delta join for join MVs)
    → per-group deltas → ONE MERGE into the storage table. sum/count
    specs: matched groups fold, zero-count groups delete, new groups
    insert. Specs with min/max: insert-only groups fold, delete-touched
    groups recompute exactly — both arms in the SAME merge commit,
    steered per row by a ``__mv_replace`` flag (see module docstring;
    single-commit since r12). Records the
    refreshed-through version(s) in BOTH the storage commit summary
    (idempotence/stage markers) and ``mv.json``. Returns the meta."""
    meta = _read_meta(mv_path)
    if meta.get("encrypted") and encryption_key is None:
        raise ValueError(
            "materialized view is encrypted — pass encryption_key="
        )
    spec = meta["spec"]
    src = LakehouseTable(
        spark, meta["source_path"], encryption_key=encryption_key
    )
    right = _open_right(spark, spec, encryption_key)
    l_tip = src.current_version()
    r_tip = right.current_version() if right is not None else 0
    l_last = int(meta["last_source_version"])
    r_last = int(meta.get("last_right_version", 0))
    if l_tip <= l_last and r_tip <= r_last:
        return meta  # already fresh: zero work
    storage = LakehouseTable(
        spark, meta["storage_path"], encryption_key=encryption_key
    )
    # idempotence: a refresh that committed to storage but crashed
    # before the mv.json publish must not re-apply its deltas
    fin = _marker(storage, "mv_refreshed_through", "mv_refreshed_right")
    if fin is not None:
        l_last, r_last = max(l_last, fin[0]), max(r_last, fin[1])
    if l_tip <= l_last and r_tip <= r_last:
        return _bump(meta, mv_path, l_last, r_last)
    st1 = _marker(
        storage, "mv_refresh_stage1", "mv_refresh_stage1_right"
    )
    if st1 is not None and (st1[0] > l_last or st1[1] > r_last):
        # a staged refresh committed its fold merge then crashed before
        # the replace phase: finish THAT refresh first (the del-group
        # set re-derives deterministically from the same slice, replace
        # is value-idempotent), then continue from its versions
        _replace_phase(
            spark, src, right, storage, spec, (l_last, r_last), st1
        )
        l_last = max(l_last, st1[0])
        r_last = max(r_last, st1[1])
        meta = _bump(meta, mv_path, l_last, r_last)
        if l_tip <= l_last and r_tip <= r_last:
            return meta
    rows = _delta_rows(
        src, right, spec, l_last, l_tip, r_last, r_tip
    )
    keys = spec["group_by"]
    agg_outs = list(_physical_aggs(spec))
    if not _has_minmax(spec):
        deltas = _agg_signed(rows, spec)
        # keep groups whose net row count moved OR any agg moved (an
        # update can move a SUM at zero net rows). ONE filter — the old
        # union-of-two-filters shape evaluated the unpinned aggregate
        # (and the changelog slice under it) twice in the pin job
        # (optimization r12, guide §1.2)
        cond = F.col(_COUNT_COL) != 0
        for o in agg_outs:
            cond = cond | (F.col(o) != 0)
        delta_rows = deltas.filter(cond).localCheckpoint(eager=True)
        if delta_rows.isEmpty():
            return _bump(meta, mv_path, l_tip, r_tip)
        update_cols = {
            _COUNT_COL: F.col(f"t.{_COUNT_COL}")
            + F.col(f"s.{_COUNT_COL}")
        }
        for o in agg_outs:
            update_cols[o] = F.col(f"t.{o}") + F.col(f"s.{o}")
        storage.merge_into(
            delta_rows,
            on=keys,
            update_cols=update_cols,
            delete_condition=(
                F.col(f"t.{_COUNT_COL}") + F.col(f"s.{_COUNT_COL}")
                == 0
            ),
            summary_extra=_summary(l_tip, r_tip, spec),
        )
        return _bump(meta, mv_path, l_tip, r_tip)
    # min/max: insert-only groups fold, delete-touched groups recompute
    # — fused into ONE merge commit (optimization r12, guide §1.2: the
    # old form bridged TWO merge commits with a stage marker, paying
    # the full read-join-write-commit machinery twice per refresh; a
    # per-row __mv_replace flag on the merge source selects fold vs
    # replace semantics per group instead, and the refresh is atomic —
    # no partial state to recover). ONE aggregation pass over the
    # signed rows serves both the del-key detection (min sign < 0) and
    # the fold deltas: the min/max fold values are guarded to +1 rows
    # (over an insert-only group that IS min/max of all its rows, and
    # delete-touched groups discard theirs — they recompute), so the
    # old shape's raw-row pin + del-key pass + anti-join collapse into
    # this single pinned O(groups) aggregate.
    aggs = [
        F.min("__sign").alias("__mn"),
        F.sum("__sign").alias(_COUNT_COL),
    ]
    for o, (kind, col) in _physical_aggs(spec).items():
        if kind == "count":
            aggs.append(F.sum("__sign").cast("long").alias(o))
        elif kind == "countnn":
            aggs.append(
                F.sum(
                    F.when(F.col(col).isNotNull(), F.col("__sign"))
                    .otherwise(F.lit(0))
                )
                .cast("long")
                .alias(o)
            )
        elif kind == "sum":
            aggs.append(F.sum(F.col(col) * F.col("__sign")).alias(o))
        else:  # min/max fold value: +1 rows only (see above)
            aggs.append(
                getattr(F, kind)(
                    F.when(F.col("__sign") == 1, F.col(col))
                ).alias(o)
            )
    g = rows.groupBy(*keys).agg(*aggs).localCheckpoint(eager=True)
    del_keys = g.filter(F.col("__mn") < 0).select(*keys)
    has_del = not del_keys.isEmpty()
    flag = "__mv_replace"
    src_merge = (
        g.filter(F.col("__mn") >= 0)
        .drop("__mn")
        .withColumn(flag, F.lit(False))
    )
    if has_del:
        # replacement rows for delete-touched groups: exact recompute
        # at the target versions (value-idempotent). The flag column
        # never lands in storage — merge_into projects target columns
        # only; it just steers each matched row's update expression.
        src_merge = src_merge.unionByName(
            _recompute_rows(
                src, right, storage, spec, (l_tip, r_tip), del_keys
            ).withColumn(flag, F.lit(True))
        )
    src_merge = src_merge.localCheckpoint(eager=True)
    if src_merge.isEmpty():
        return _bump(meta, mv_path, l_tip, r_tip)
    rep = F.col(f"s.{flag}")
    update_cols = {
        _COUNT_COL: F.when(rep, F.col(f"s.{_COUNT_COL}")).otherwise(
            F.col(f"t.{_COUNT_COL}") + F.col(f"s.{_COUNT_COL}")
        )
    }
    for o, (kind, _col) in _physical_aggs(spec).items():
        if kind == "min":
            fold = F.least(F.col(f"t.{o}"), F.col(f"s.{o}"))
        elif kind == "max":
            fold = F.greatest(F.col(f"t.{o}"), F.col(f"s.{o}"))
        else:
            fold = F.col(f"t.{o}") + F.col(f"s.{o}")
        update_cols[o] = F.when(rep, F.col(f"s.{o}")).otherwise(fold)
    storage.merge_into(
        src_merge,
        on=keys,
        update_cols=update_cols,
        delete_condition=rep & (F.col(f"s.{_COUNT_COL}") == 0),
        summary_extra=_summary(l_tip, r_tip, spec),
    )
    return _bump(meta, mv_path, l_tip, r_tip)


def read_mv(
    spark: SparkSession,
    mv_path: str,
    max_staleness_versions: int = 0,
    encryption_key: bytes | str | None = None,
) -> DataFrame:
    """Staleness-aware MV read. Freshness = recorded source version(s)
    vs the source's current version(s) — two metadata reads per source,
    no data IO. Within budget: serve the storage table AS IS (the
    provably metadata-only fast path). Over budget: incremental refresh
    first. The per-group row-count bookkeeping column stays internal."""
    meta = _read_meta(mv_path)
    src_tip = LakehouseTable(
        spark, meta["source_path"]
    ).current_version()
    lag = src_tip - int(meta["last_source_version"])
    join = meta["spec"].get("join")
    if join is not None:
        r_tip = LakehouseTable(
            spark, join["right_path"]
        ).current_version()
        lag = max(lag, r_tip - int(meta.get("last_right_version", 0)))
    if lag > max_staleness_versions:
        meta = refresh_materialized_view(
            spark, mv_path, encryption_key=encryption_key
        )
    storage = LakehouseTable(
        spark, meta["storage_path"], encryption_key=encryption_key
    )
    return _derive_avgs(storage.read(), meta["spec"]).drop(_COUNT_COL)


def _derive_avgs(df: DataFrame, spec: dict) -> DataFrame:
    """Expose each declared ``avg`` as ONE read column derived from its
    materialized (sum, non-null count) pair; zero-count (all-NULL
    measure) groups read NULL — the guard keeps ANSI mode from raising
    on the division."""
    for o, (kind, _col) in spec.get("aggs", {}).items():
        if kind != "avg":
            continue
        s, c = f"__mv_avg_{o}_sum", f"__mv_avg_{o}_cnt"
        df = df.withColumn(
            o,
            F.when(
                F.col(c) > 0,
                F.col(s).cast("double") / F.col(c),
            ),
        ).drop(s, c)
    return df


# -- query routing (r11 — VERDICT r10 #3): answer a matching aggregate
# -- query FROM a registered MV automatically ------------------------------


def route_aggregate(
    spark: SparkSession,
    mv_paths: list[str],
    source_path: str,
    group_by: list[str],
    aggs: dict,
    where: str | None = None,
    max_staleness_versions: int = 0,
    on_stale: str = "refresh",
    encryption_key: bytes | str | None = None,
) -> tuple[DataFrame, dict]:
    """Answer ``SELECT group_by, aggs FROM source [WHERE …] GROUP BY``
    from a registered MV whose spec SUBSUMES the query, reading MV
    storage instead of the source. Returns ``(df, info)`` where
    ``info['served_from']`` is the matched MV path or ``'source'``.

    Subsumption (the classic aggregate-rewrite rules, exact — no
    semantic equivalence guessing):

    - same source table; join MVs are never routed (a single-table
      query is not answerable from a join MV — ask for those
      explicitly via ``read_mv``);
    - the query's WHERE must equal the MV's declared WHERE verbatim
      (textual match — predicate implication is out of scope);
    - the query's group-by must be a SUBSET of the MV's (coarser
      queries re-aggregate the storage rows: sum/count re-add, min/max
      re-fold, avg re-derives from its (sum, count) pair — all exact
      because the MV's physical aggs are self-maintainable);
    - every requested agg must be declared on the MV with the same
      (kind, column) — ``("count", None)`` rides the internal
      per-group row count.

    Candidates are tried coarsest-first (fewest group-by columns =
    smallest storage). Staleness beyond the budget follows
    ``on_stale``: ``'refresh'`` (incremental refresh, then serve) or
    ``'fallback'`` (compute from the source — the MV is left alone).
    No candidate: compute from the source (``info['served_from'] =
    'source'``; pass ``mv_paths=[]`` to see the fallback plan).

    Scale: matching is pure metadata (one mv.json read per candidate);
    a served query scans MV-sized storage instead of the source —
    the 100 TB → MV-rows reduction is the whole point of MVs."""
    if on_stale not in ("refresh", "fallback"):
        raise ValueError("on_stale must be 'refresh' or 'fallback'")
    src_abs = os.path.abspath(source_path)
    want_gb = list(group_by)
    candidates = []
    for p in mv_paths:
        try:
            meta = _read_meta(p)
        except ValueError:
            continue
        spec = meta["spec"]
        if meta["source_path"] != src_abs or spec.get("join"):
            continue
        if (spec.get("where") or None) != (where or None):
            continue
        if not set(want_gb) <= set(spec["group_by"]):
            continue
        declared = {
            (kind, col): out
            for out, (kind, col) in spec.get("aggs", {}).items()
        }
        remap = {}
        ok = True
        for out, (kind, col) in aggs.items():
            if kind == "count":
                remap[out] = (kind, _COUNT_COL)
            elif (kind, col) in declared:
                remap[out] = (kind, declared[(kind, col)])
            else:
                ok = False
                break
        if ok:
            candidates.append((len(spec["group_by"]), p, meta, remap))
    if not candidates:
        # honest fallback: the source aggregate, declared plan
        src = LakehouseTable(
            spark, source_path, encryption_key=encryption_key
        )
        df = src.read()
        if where:
            df = df.filter(F.expr(where))
        exprs = []
        for out, (kind, col) in aggs.items():
            if kind == "count":
                exprs.append(F.count("*").cast("long").alias(out))
            elif kind == "avg":
                exprs.append(F.avg(col).alias(out))
            else:
                exprs.append(getattr(F, kind)(col).alias(out))
        return (
            df.groupBy(*want_gb).agg(*exprs),
            {"served_from": "source"},
        )
    candidates.sort(key=lambda c: (c[0], c[1]))
    _n, mv_path, meta, remap = candidates[0]
    src_tip = LakehouseTable(
        spark, meta["source_path"]
    ).current_version()
    lag = src_tip - int(meta["last_source_version"])
    if lag > max_staleness_versions:
        if on_stale == "fallback":
            df, _ = route_aggregate(
                spark,
                [],
                source_path,
                group_by,
                aggs,
                where=where,
                encryption_key=encryption_key,
            )
            return df, {"served_from": "source", "stale_mv": mv_path}
        meta = refresh_materialized_view(
            spark, mv_path, encryption_key=encryption_key
        )
    storage = LakehouseTable(
        spark, meta["storage_path"], encryption_key=encryption_key
    )
    rows = storage.read()
    exprs = []
    for out, (kind, stored) in remap.items():
        if kind in ("sum", "count"):
            agg = F.sum(stored)
            if kind == "count":
                agg = agg.cast("long")
            exprs.append(agg.alias(out))
        elif kind in ("min", "max"):
            exprs.append(getattr(F, kind)(stored).alias(out))
        else:  # avg: re-derive from the materialized pair
            s = f"__mv_avg_{stored}_sum"
            c = f"__mv_avg_{stored}_cnt"
            exprs.append(
                F.when(
                    F.sum(c) > 0, F.sum(s).cast("double") / F.sum(c)
                ).alias(out)
            )
    out_df = rows.groupBy(*want_gb).agg(*exprs)
    return out_df, {"served_from": mv_path, "storage": meta["storage_path"]}


def drop_materialized_view(spark: SparkSession, mv_path: str) -> None:
    meta = _read_meta(mv_path)
    os.unlink(_mv_meta_path(mv_path))
    shutil.rmtree(meta["storage_path"], ignore_errors=True)


def gc_orphan_storage(mv_path: str) -> list[str]:
    """Remove storage table generations under the MV directory that the
    current ``mv.json`` does not reference (failed create/drop races,
    superseded rebuilds)."""
    try:
        live = _read_meta(mv_path)["storage_path"]
    except ValueError:
        live = None
    removed = []
    import glob as _glob

    for d in _glob.glob(os.path.join(mv_path, "storage-*")):
        if live is None or os.path.abspath(d) != os.path.abspath(live):
            shutil.rmtree(d, ignore_errors=True)
            removed.append(d)
    return removed

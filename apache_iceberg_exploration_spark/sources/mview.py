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
    for out, (kind, _col) in spec.get("aggs", {}).items():
        if kind not in ("sum", "count"):
            raise ValueError(
                f"mv agg {out!r}: kind {kind!r} not incrementally "
                "maintainable here (supported: sum, count; express avg "
                "as sum/count at read)"
            )
        if out == _COUNT_COL:
            raise ValueError(f"{_COUNT_COL} is reserved")


def _signed_deltas(changes: DataFrame, spec: dict) -> DataFrame:
    """Per-group signed deltas from a changelog slice: inserts (and
    update postimages) count +1, deletes (and preimages) -1."""
    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), 1
    ).otherwise(-1)
    aggs = [F.sum(sign).alias(_COUNT_COL)]
    for out, (kind, col) in spec.get("aggs", {}).items():
        if kind == "count":
            aggs.append(F.sum(sign).cast("long").alias(out))
        else:
            aggs.append(
                F.sum(F.col(col) * sign).alias(out)
            )
    return changes.groupBy(*spec["group_by"]).agg(*aggs)


def _full_build(source_df: DataFrame, spec: dict) -> DataFrame:
    aggs = [F.count("*").alias(_COUNT_COL)]
    for out, (kind, col) in spec.get("aggs", {}).items():
        if kind == "count":
            aggs.append(F.count("*").cast("long").alias(out))
        else:
            aggs.append(F.sum(col).alias(out))
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
    storage_dir = os.path.join(mv_path, f"storage-{uuid.uuid4().hex[:8]}")
    storage = LakehouseTable(
        spark, storage_dir, encryption_key=encryption_key
    )
    if encryption_key is not None:
        storage.enable_encryption(encryption_key)
    storage.overwrite(_full_build(src.read(version=v), spec))
    os.makedirs(mv_path, exist_ok=True)
    meta = {
        "name": name or os.path.basename(mv_path),
        "source_path": os.path.abspath(source_path),
        "spec": spec,
        "storage_path": storage_dir,
        "last_source_version": v,
        "encrypted": encryption_key is not None,
    }
    _publish_sidecar(_mv_meta_path(mv_path), meta)
    return meta


def refresh_materialized_view(
    spark: SparkSession,
    mv_path: str,
    encryption_key: bytes | str | None = None,
) -> dict:
    """Incremental refresh to the source tip: changelog slice → signed
    per-group deltas → one MERGE into the storage table (matched
    groups fold, zero-count groups delete, new groups insert). Records
    the refreshed-through version in BOTH the storage commit summary
    (idempotence marker) and ``mv.json``. Returns the meta."""
    meta = _read_meta(mv_path)
    if meta.get("encrypted") and encryption_key is None:
        raise ValueError(
            "materialized view is encrypted — pass encryption_key="
        )
    src = LakehouseTable(
        spark, meta["source_path"], encryption_key=encryption_key
    )
    tip = src.current_version()
    last = int(meta["last_source_version"])
    if tip <= last:
        return meta  # already fresh: zero work
    storage = LakehouseTable(
        spark, meta["storage_path"], encryption_key=encryption_key
    )
    # idempotence: a refresh that committed to storage but crashed
    # before the mv.json publish must not re-apply its deltas
    applied = _storage_refreshed_through(storage)
    if applied is not None and applied >= tip:
        meta["last_source_version"] = tip
        _publish_sidecar(_mv_meta_path(mv_path), meta)
        return meta
    start = max(last, applied or 0)
    spec = meta["spec"]
    deltas = _signed_deltas(src.changelog(start, tip), spec)
    nonzero = deltas.filter(F.col(_COUNT_COL) != 0)
    # groups whose net row delta is zero can still move a SUM (an
    # update changed the measure): keep them too when any agg moved
    moved = deltas.filter(F.col(_COUNT_COL) == 0)
    agg_outs = list(spec.get("aggs", {}))
    if agg_outs:
        cond = None
        for o in agg_outs:
            c = F.col(o) != 0
            cond = c if cond is None else (cond | c)
        moved = moved.filter(cond)
        nonzero = nonzero.unionByName(moved)
    delta_rows = nonzero.localCheckpoint(eager=True)
    if delta_rows.isEmpty():
        meta["last_source_version"] = tip
        _publish_sidecar(_mv_meta_path(mv_path), meta)
        return meta
    keys = spec["group_by"]
    update_cols = {
        _COUNT_COL: F.col(f"t.{_COUNT_COL}") + F.col(f"s.{_COUNT_COL}")
    }
    for o in agg_outs:
        update_cols[o] = F.col(f"t.{o}") + F.col(f"s.{o}")
    storage.merge_into(
        delta_rows,
        on=keys,
        update_cols=update_cols,
        delete_condition=(
            F.col(f"t.{_COUNT_COL}") + F.col(f"s.{_COUNT_COL}") == 0
        ),
        summary_extra={"mv_refreshed_through": tip},
    )
    meta["last_source_version"] = tip
    _publish_sidecar(_mv_meta_path(mv_path), meta)
    return meta


def _storage_refreshed_through(storage: LakehouseTable) -> int | None:
    """Highest mv_refreshed_through marker in the storage history — the
    crash-recovery floor for idempotent refresh."""
    marks = [
        s.get("summary", {}).get("mv_refreshed_through")
        for s in storage.snapshots()
    ]
    marks = [int(m) for m in marks if m is not None]
    return max(marks) if marks else None


def read_mv(
    spark: SparkSession,
    mv_path: str,
    max_staleness_versions: int = 0,
    encryption_key: bytes | str | None = None,
) -> DataFrame:
    """Staleness-aware MV read. Freshness = recorded source version vs
    the source's current version — two metadata reads, no data IO.
    Within budget: serve the storage table AS IS (the provably
    metadata-only fast path). Over budget: incremental refresh first.
    The per-group row-count bookkeeping column stays internal."""
    meta = _read_meta(mv_path)
    src_tip = LakehouseTable(
        spark, meta["source_path"]
    ).current_version()
    if src_tip - int(meta["last_source_version"]) > max_staleness_versions:
        meta = refresh_materialized_view(
            spark, mv_path, encryption_key=encryption_key
        )
    storage = LakehouseTable(
        spark, meta["storage_path"], encryption_key=encryption_key
    )
    return storage.read().drop(_COUNT_COL)


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

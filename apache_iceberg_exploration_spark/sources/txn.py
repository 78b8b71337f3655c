"""Catalog-level multi-table TRANSACTIONS (r10) — the Nessie /
"git-for-data" shape that single-table Iceberg commits cannot give:
one atomic, isolated commit spanning N tables.

Design (metadata-only, built on what the engine already has):

- a CATALOG COMMIT LOG lives at ``warehouse/_catalog/commits/c{N}.json``;
  each commit is a {table identifier → pinned table version} map (pins
  of untouched tables carried forward verbatim). Publishing is the same
  create-exclusive tmp+fsync+``os.link`` protocol as table snapshots —
  catalog atomicity is ONE link syscall, regardless of how many tables
  the transaction touched.
- inside a transaction, table mutations run NORMALLY (every existing
  write path, unchanged — each table's own optimistic commit protocol
  keeps per-table integrity). The CATALOG REF is the isolation
  boundary: consistent readers resolve tables through the pinned
  versions (plain time travel), so they never observe a half-published
  transaction — exactly Nessie's model, where table-level state may
  advance but the catalog branch moves atomically.
- conflict rule (optimistic, first-publisher-wins): a transaction
  records the catalog tip C0 and, per touched table, the version it
  built on. At publish it re-reads the tip; if any touched table's pin
  has moved past its recorded base, the transaction raises
  ``CatalogConflict`` instead of silently overwriting the other
  transaction's pins. Disjoint transactions merge (their pin maps
  touch different keys) and both land.

Scale: a catalog commit is O(tables) JSON — no data IO; consistent
reads plan each table at a pinned snapshot through the normal scan
stack (pruning, MoR, encryption unchanged). At 100 TB the transaction
cost is the tables' own commits plus one link.
"""

from __future__ import annotations

import json
import os
import re
import time
import uuid

from pyspark.sql import DataFrame


class CatalogConflict(Exception):
    """A concurrent catalog commit re-pinned a table this transaction
    also touched — publishing would silently drop the other
    transaction's state. Retry the transaction from the new tip."""


class MergeConflict(Exception):
    """Both sides of a catalog-branch merge re-pinned the same
    table(s) since the fork point — no automatic resolution exists at
    the catalog level. Carries ``tables`` (the conflicting
    identifiers)."""

    def __init__(self, tables):
        self.tables = sorted(tables)
        super().__init__(
            "catalog merge: both branches moved "
            f"{self.tables} since the fork point — rebase one branch "
            "(re-run its transactions from the other's head) or "
            "resolve table-by-table"
        )


def _commits_dir(warehouse: str) -> str:
    return os.path.join(warehouse, "_catalog", "commits")


def catalog_tip(warehouse: str) -> int:
    d = _commits_dir(warehouse)
    if not os.path.isdir(d):
        return 0
    best = 0
    for name in os.listdir(d):
        if name.startswith("c") and name.endswith(".json"):
            try:
                best = max(best, int(name[1:-5]))
            except ValueError:
                pass
    return best


def read_catalog_commit(warehouse: str, version: int) -> dict:
    """The pin map {identifier: table_version} of one catalog commit
    (empty map for version 0 — the before-any-transaction state)."""
    if version <= 0:
        return {"version": 0, "pins": {}, "committed_at": None}
    p = os.path.join(_commits_dir(warehouse), f"c{version}.json")
    with open(p) as f:
        return json.load(f)


def _allocate_commit(warehouse: str, body: dict) -> int:
    """Create-exclusive allocation of the next GLOBAL commit number.
    Numbers are identities, not ordering: branch chains link through
    ``parent``/``merge_parent``, so commits from different refs
    interleave freely in the numbering."""
    d = _commits_dir(warehouse)
    os.makedirs(d, exist_ok=True)
    for _ in range(50):
        n = catalog_tip(warehouse) + 1
        body = dict(body, version=n, committed_at=time.time())
        target = os.path.join(d, f"c{n}.json")
        tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as f:
            json.dump(body, f, indent=1)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, target)
            return n
        except FileExistsError:
            time.sleep(0.005)  # number taken: allocate the next
        finally:
            os.unlink(tmp)
    raise RuntimeError("catalog transaction: commit contention")


# -- named refs (git-for-data: branches + tags over the commit log) -------


class _RefRace(Exception):
    """The ref pointer advanced between read and CAS — re-read."""


def _ref_dir(warehouse: str, ref: str) -> str:
    if not re.fullmatch(r"[A-Za-z0-9._-]{1,64}", ref):
        raise ValueError(f"invalid catalog ref name {ref!r}")
    return os.path.join(warehouse, "_catalog", "refs", ref)


def _ref_tip_pointer(warehouse: str, ref: str):
    """(pointer_index, commit, meta) of a ref's newest pointer file, or
    None when the ref has never been materialized."""
    d = _ref_dir(warehouse, ref)
    if not os.path.isdir(d):
        return None
    best = None
    for name in os.listdir(d):
        if name.startswith("p") and name.endswith(".json"):
            try:
                k = int(name[1:-5])
            except ValueError:
                continue
            if best is None or k > best:
                best = k
    if best is None:
        return None
    with open(os.path.join(d, f"p{best}.json")) as f:
        meta = json.load(f)
    return best, int(meta["commit"]), meta


def list_refs(warehouse: str) -> dict[str, dict]:
    root = os.path.join(warehouse, "_catalog", "refs")
    out: dict[str, dict] = {}
    if os.path.isdir(root):
        for name in sorted(os.listdir(root)):
            tip = _ref_tip_pointer(warehouse, name)
            if tip is not None:
                _k, commit, meta = tip
                out[name] = {
                    "commit": commit,
                    "type": meta.get("type", "branch"),
                }
    return out


def _ensure_main(warehouse: str) -> None:
    """Materialize the ``main`` pointer from the legacy (pre-refs)
    commit chain — MUST happen before any other ref takes commits, or
    the legacy max-number fallback would adopt foreign branches'
    commits as main's head."""
    if _ref_tip_pointer(warehouse, "main") is None:
        _write_pointer(
            warehouse,
            "main",
            0,
            catalog_tip(warehouse),
            {"type": "branch"},
        )


def _write_pointer(
    warehouse: str, ref: str, index: int, commit: int, extra: dict
) -> None:
    d = _ref_dir(warehouse, ref)
    os.makedirs(d, exist_ok=True)
    target = os.path.join(d, f"p{index}.json")
    tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as f:
        json.dump(dict(extra, commit=commit), f)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, target)
    except FileExistsError as ex:
        raise _RefRace(ref) from ex
    finally:
        os.unlink(tmp)


def ref_head(warehouse: str, ref: str = "main") -> int:
    """The commit a named ref points at. ``main`` without a pointer
    falls back to the legacy linear chain's tip (pre-branch catalogs
    keep working unchanged)."""
    tip = _ref_tip_pointer(warehouse, ref)
    if tip is not None:
        return tip[1]
    if ref == "main":
        return catalog_tip(warehouse)
    raise ValueError(f"unknown catalog ref {ref!r}")


def _ref_type(warehouse: str, ref: str) -> str:
    tip = _ref_tip_pointer(warehouse, ref)
    if tip is None:
        return "branch" if ref == "main" else "missing"
    # the ref's TYPE is declared at creation (p0) and never changes
    d = _ref_dir(warehouse, ref)
    with open(os.path.join(d, "p0.json")) as f:
        return json.load(f).get("type", "branch")


def _advance_ref(
    warehouse: str, ref: str, expect: int, new_commit: int
) -> None:
    """Compare-and-swap the ref pointer: the next pointer file links
    create-exclusively, so a successful link PROVES the read tip was
    still current. Raises CatalogConflict when the expectation fails."""
    if _ref_type(warehouse, ref) == "tag":
        raise ValueError(
            f"catalog ref {ref!r} is a TAG — tags are immutable "
            "(branch from it instead)"
        )
    tip = _ref_tip_pointer(warehouse, ref)
    k, cur = (tip[0], tip[1]) if tip else (-1, catalog_tip(warehouse))
    if cur != expect:
        raise CatalogConflict(
            f"catalog ref {ref!r} advanced {expect} -> {cur} during "
            "the transaction — retry from the new head"
        )
    try:
        _write_pointer(warehouse, ref, k + 1, new_commit, {})
    except _RefRace as ex:
        raise CatalogConflict(
            f"catalog ref {ref!r} advanced concurrently — retry from "
            "the new head"
        ) from ex


def create_branch(
    warehouse: str, name: str, from_ref: str = "main"
) -> int:
    _ensure_main(warehouse)
    if _ref_tip_pointer(warehouse, name) is not None:
        raise ValueError(f"catalog ref already exists: {name!r}")
    head = ref_head(warehouse, from_ref)
    _write_pointer(
        warehouse, name, 0, head, {"type": "branch", "forked_from": head}
    )
    return head


def create_tag(warehouse: str, name: str, from_ref: str = "main") -> int:
    _ensure_main(warehouse)
    if _ref_tip_pointer(warehouse, name) is not None:
        raise ValueError(f"catalog ref already exists: {name!r}")
    head = ref_head(warehouse, from_ref)
    _write_pointer(
        warehouse, name, 0, head, {"type": "tag", "forked_from": head}
    )
    return head


def _ancestors(warehouse: str, commit: int) -> set[int]:
    seen: set[int] = set()
    stack = [commit]
    while stack:
        c = stack.pop()
        if c in seen:
            continue
        seen.add(c)
        if c <= 0:
            continue
        body = read_catalog_commit(warehouse, c)
        parent = body.get("parent")
        if parent is None:
            # legacy linear chain: parent is version - 1
            parent = c - 1
        stack.append(int(parent))
        if body.get("merge_parent") is not None:
            stack.append(int(body["merge_parent"]))
    return seen


def _common_ancestor(warehouse: str, a: int, b: int) -> int:
    anc = _ancestors(warehouse, a)
    # walk b's first-parent chain outward until it hits a's ancestry;
    # commit 0 (the empty catalog) is the universal root
    cur = b
    while cur not in anc:
        body = read_catalog_commit(warehouse, cur)
        parent = body.get("parent")
        cur = int(parent) if parent is not None else cur - 1
    return cur


def merge_ref(
    warehouse: str, src: str, into: str = "main"
) -> dict:
    """Merge one catalog branch into another — the git model over pin
    maps: fast-forward when only ``src`` moved; otherwise a 3-way merge
    against the common-ancestor commit, resolving per TABLE (a table
    moved by exactly one side takes that side's pin; moved by both →
    ``MergeConflict``). Publishes one merge commit (``parent`` = the
    into-head, ``merge_parent`` = the src-head) and CAS-advances the
    ``into`` ref. Returns {"commit", "fast_forward"}."""
    _ensure_main(warehouse)
    for _ in range(10):
        s_head = ref_head(warehouse, src)
        i_head = ref_head(warehouse, into)
        base = _common_ancestor(warehouse, s_head, i_head)
        if s_head == base:
            return {"commit": i_head, "fast_forward": False,
                    "noop": True}
        if i_head == base:
            # fast-forward: the into ref adopts src's head commit
            try:
                _advance_ref(warehouse, into, i_head, s_head)
            except CatalogConflict:
                continue
            return {"commit": s_head, "fast_forward": True}
        s_pins = read_catalog_commit(warehouse, s_head)["pins"]
        i_pins = read_catalog_commit(warehouse, i_head)["pins"]
        b_pins = read_catalog_commit(warehouse, base)["pins"]
        merged = dict(i_pins)
        conflicts = []
        for ident in set(s_pins) | set(i_pins) | set(b_pins):
            s_v = s_pins.get(ident)
            i_v = i_pins.get(ident)
            b_v = b_pins.get(ident)
            if s_v == b_v or s_v == i_v:
                continue  # src didn't move it (or both agree)
            if i_v == b_v:
                merged[ident] = s_v  # only src moved it
            else:
                conflicts.append(ident)
        if conflicts:
            raise MergeConflict(conflicts)
        n = _allocate_commit(
            warehouse,
            {
                "parent": i_head,
                "merge_parent": s_head,
                "ref": into,
                "pins": merged,
            },
        )
        try:
            _advance_ref(warehouse, into, i_head, n)
        except CatalogConflict:
            continue  # into advanced mid-merge: recompute
        return {"commit": n, "fast_forward": False}
    raise RuntimeError("catalog merge: ref contention")


class CatalogTransaction:
    """Context manager: mutate any number of catalog tables, then
    publish ONE catalog commit pinning the produced versions. On
    exception nothing publishes (table-level states may have advanced —
    the catalog ref is the consistency boundary, Nessie semantics)."""

    def __init__(self, catalog, ref: str = "main"):
        self.catalog = catalog
        self.ref = ref
        _ensure_main(catalog.warehouse)
        if _ref_type(catalog.warehouse, ref) == "tag":
            raise ValueError(
                f"catalog ref {ref!r} is a TAG — tags are immutable"
            )
        self.base = ref_head(catalog.warehouse, ref)
        self._base_pins = read_catalog_commit(
            catalog.warehouse, self.base
        )["pins"]
        self._touched: dict[str, tuple[int, object]] = {}
        self.committed_version: int | None = None

    def table(self, identifier: str):
        """A normal table handle, with its pre-transaction version
        recorded at first touch (the conflict-detection base).

        Branch soundness rule: a pinned table may only be touched when
        its PHYSICAL tip still equals this ref's pin. Table lineage is
        linear and shared across catalog refs, so building a mutation
        on top of another ref's (or a direct writer's) commits would
        leak their rows into this ref's next pin — refuse loudly and
        direct the caller to merge/rebase instead (the same discipline
        Nessie gets from Iceberg's forked table metadata)."""
        ns, name = self.catalog._split(identifier)
        ident = f"{ns}.{name}"
        if ident not in self._touched:
            t = self.catalog.table(ident)
            cur = t.current_version()
            base_v = self._base_pins.get(ident)
            if base_v is None:
                base_v = cur  # never pinned on this ref: claim the tip
            elif int(base_v) != cur:
                raise CatalogConflict(
                    f"catalog transaction on ref {self.ref!r}: table "
                    f"{ident!r} physically moved to v{cur} past this "
                    f"ref's pin v{base_v} (another ref or a direct "
                    "writer) — merge or rebase this ref before "
                    "mutating the table here"
                )
            self._touched[ident] = (int(base_v), t)
        return self._touched[ident][1]

    def commit(self) -> int:
        wh = self.catalog.warehouse
        touched = {
            ident: (v_base, t.current_version())
            for ident, (v_base, t) in self._touched.items()
        }
        for _ in range(10):
            head = ref_head(wh, self.ref)
            head_pins = read_catalog_commit(wh, head)["pins"]
            if head != self.base:
                # rebase: fine iff nobody re-pinned OUR tables on this
                # ref since the transaction's base
                for ident, (v_base, _v_new) in touched.items():
                    then = self._base_pins.get(ident)
                    now = head_pins.get(ident)
                    if now != then:
                        raise CatalogConflict(
                            f"catalog transaction: table {ident!r} "
                            f"was re-pinned {then!r} -> {now!r} by a "
                            "concurrent catalog commit — retry from "
                            "the new head"
                        )
            pins = dict(head_pins)
            for ident, (_v_base, v_new) in touched.items():
                pins[ident] = v_new
            n = _allocate_commit(
                wh,
                {"parent": head, "ref": self.ref, "pins": pins},
            )
            try:
                _advance_ref(wh, self.ref, head, n)
            except CatalogConflict:
                # lost the pointer race: commit n stays orphaned
                # (unreferenced, harmless); re-check against the new
                # head and retry
                continue
            self.committed_version = n
            return n
        raise RuntimeError("catalog transaction: ref contention")

    def __enter__(self) -> "CatalogTransaction":
        return self

    def __exit__(self, exc_type, exc, tb) -> bool:
        if exc_type is None:
            self.commit()
        return False  # never swallow the body's exception


class CatalogSnapshot:
    """A CONSISTENT multi-table view: every table resolves at the
    version pinned by one catalog commit (plain time travel), so joins
    across tables observe one transaction boundary even while writers
    keep committing. Tables never pinned (no transaction touched them
    yet) read at their current version, recorded at snapshot creation
    so repeated reads inside the snapshot stay stable."""

    def __init__(
        self,
        catalog,
        version: int | None = None,
        ref: str = "main",
    ):
        self.catalog = catalog
        self.version = (
            ref_head(catalog.warehouse, ref)
            if version is None
            else version
        )
        self.pins = dict(
            read_catalog_commit(catalog.warehouse, self.version)["pins"]
        )

    def version_of(self, identifier: str) -> int:
        ns, name = self.catalog._split(identifier)
        ident = f"{ns}.{name}"
        if ident not in self.pins:
            self.pins[ident] = self.catalog.table(
                ident
            ).current_version()
        return int(self.pins[ident])

    def read(self, identifier: str) -> DataFrame:
        v = self.version_of(identifier)
        return self.catalog.table(identifier).read(version=v)

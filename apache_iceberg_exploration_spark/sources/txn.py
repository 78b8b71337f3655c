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
import time
import uuid

from pyspark.sql import DataFrame


class CatalogConflict(Exception):
    """A concurrent catalog commit re-pinned a table this transaction
    also touched — publishing would silently drop the other
    transaction's state. Retry the transaction from the new tip."""


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


def _publish_catalog_commit(
    warehouse: str, base: int, touched: dict[str, tuple[int, int]]
) -> int:
    """Optimistic create-exclusive publish with pin-merge rebase:
    ``touched`` maps identifier → (base_version, new_version). Returns
    the catalog version published."""
    d = _commits_dir(warehouse)
    os.makedirs(d, exist_ok=True)
    for _ in range(20):
        tip = catalog_tip(warehouse)
        pins = dict(read_catalog_commit(warehouse, tip)["pins"])
        if tip > base:
            # rebase: fine iff nobody re-pinned OUR tables since base
            base_pins = read_catalog_commit(warehouse, base)["pins"]
            for ident, (v_base, _v_new) in touched.items():
                then = base_pins.get(ident)
                now = pins.get(ident)
                if now != then:
                    raise CatalogConflict(
                        f"catalog transaction: table {ident!r} was "
                        f"re-pinned {then!r} -> {now!r} by a concurrent "
                        "catalog commit — retry from the new tip"
                    )
        for ident, (_v_base, v_new) in touched.items():
            pins[ident] = v_new
        body = {
            "version": tip + 1,
            "parent": tip,
            "pins": pins,
            "committed_at": time.time(),
        }
        target = os.path.join(d, f"c{tip + 1}.json")
        tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as f:
            json.dump(body, f, indent=1)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, target)
            return tip + 1
        except FileExistsError:
            time.sleep(0.01)  # lost the race: rebase on the new tip
        finally:
            os.unlink(tmp)
    raise RuntimeError("catalog transaction: commit contention")


class CatalogTransaction:
    """Context manager: mutate any number of catalog tables, then
    publish ONE catalog commit pinning the produced versions. On
    exception nothing publishes (table-level states may have advanced —
    the catalog ref is the consistency boundary, Nessie semantics)."""

    def __init__(self, catalog):
        self.catalog = catalog
        self.base = catalog_tip(catalog.warehouse)
        self._base_pins = read_catalog_commit(
            catalog.warehouse, self.base
        )["pins"]
        self._touched: dict[str, tuple[int, object]] = {}
        self.committed_version: int | None = None

    def table(self, identifier: str):
        """A normal table handle, with its pre-transaction version
        recorded at first touch (the conflict-detection base)."""
        ns, name = self.catalog._split(identifier)
        ident = f"{ns}.{name}"
        if ident not in self._touched:
            t = self.catalog.table(ident)
            base_v = self._base_pins.get(ident)
            if base_v is None:
                base_v = t.current_version()
            self._touched[ident] = (int(base_v), t)
        return self._touched[ident][1]

    def commit(self) -> int:
        touched = {
            ident: (v_base, t.current_version())
            for ident, (v_base, t) in self._touched.items()
        }
        self.committed_version = _publish_catalog_commit(
            self.catalog.warehouse, self.base, touched
        )
        return self.committed_version

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

    def __init__(self, catalog, version: int | None = None):
        self.catalog = catalog
        self.version = (
            catalog_tip(catalog.warehouse) if version is None else version
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

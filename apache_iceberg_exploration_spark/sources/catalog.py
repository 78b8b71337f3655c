"""Catalog/namespace layer over :class:`LakehouseTable` paths.

The reference addresses every table through a 3-part identifier —
``my_catalog.bronze.iceberg`` / ``...silver...`` / ``...gold...``
(dags/etl.py:49,72,90) — with the catalog bound to a warehouse root
(constant.py:43,49-55, ``s3a://mybucket``). This module provides that
surface for the path-based lakehouse: namespaces are directories under
one warehouse root, tables resolve by identifier, and the medallion
layers become ``bronze``/``silver``/``gold`` namespaces exactly as in
SURVEY.md §1.1. When the Iceberg runtime jar is present, session.py wires
the REAL ``my_catalog`` SparkCatalog instead; call sites are identical in
shape (identifier in, table handle out).

Scale: the catalog is pure driver-side path arithmetic — no data IO;
listing is one directory walk per namespace.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession

from .lakehouse import LakehouseTable


class LakehouseCatalog:
    """``warehouse/<namespace>/<table>`` path-addressed catalog."""

    def __init__(
        self,
        spark: SparkSession,
        warehouse: str,
        name: str = "my_catalog",
    ) -> None:
        self.spark = spark
        self.warehouse = warehouse
        # The catalog's own name (the reference's ``my_catalog``,
        # constant.py:43). 3-part identifiers must use THIS prefix —
        # view SQL mentioning ``other_catalog.ns.t`` is NOT silently
        # adopted (ADVICE r10).
        self.name = name
        os.makedirs(warehouse, exist_ok=True)

    # -- namespaces ----------------------------------------------------------

    def create_namespace(self, ns: str) -> None:
        """CREATE NAMESPACE IF NOT EXISTS — idempotent, like the SQL."""
        os.makedirs(os.path.join(self.warehouse, ns), exist_ok=True)

    def namespaces(self) -> list[str]:
        return sorted(
            d
            for d in os.listdir(self.warehouse)
            if os.path.isdir(os.path.join(self.warehouse, d))
            # _catalog holds the transaction commit log (txn.py), not
            # a user namespace
            and not d.startswith("_")
        )

    def drop_namespace(self, ns: str) -> None:
        """Refuses unless empty (SQL DROP NAMESPACE semantics)."""
        if self.tables(ns):
            raise ValueError(f"namespace not empty: {ns!r}")
        shutil.rmtree(os.path.join(self.warehouse, ns), ignore_errors=True)

    # -- tables --------------------------------------------------------------

    def _split(self, identifier: str) -> tuple[str, str]:
        parts = identifier.split(".")
        if len(parts) == 3:  # catalog.ns.table — prefix must be OURS
            if parts[0] != self.name:
                raise ValueError(
                    f"unknown catalog {parts[0]!r} in {identifier!r} "
                    f"(this catalog is {self.name!r})"
                )
            parts = parts[1:]
        if len(parts) != 2:
            raise ValueError(
                f"expected [catalog.]namespace.table, got {identifier!r}"
            )
        return parts[0], parts[1]

    def _path(self, identifier: str) -> str:
        ns, name = self._split(identifier)
        return os.path.join(self.warehouse, ns, name)

    def table(self, identifier: str) -> LakehouseTable:
        """Resolve ``[catalog.]namespace.table`` to a table handle (the
        ``spark.table('my_catalog.silver.iceberg')`` shape, sparkmini
        orig 129). The handle is lazy — a handle to a not-yet-written
        table is valid and its first overwrite/append creates it."""
        ns, _ = self._split(identifier)
        self.create_namespace(ns)
        return LakehouseTable(self.spark, self._path(identifier))

    def table_exists(self, identifier: str) -> bool:
        return LakehouseTable(
            self.spark, self._path(identifier)
        ).current_version() > 0

    def tables(self, ns: str) -> list[str]:
        root = os.path.join(self.warehouse, ns)
        if not os.path.isdir(root):
            return []
        return sorted(
            d
            for d in os.listdir(root)
            if os.path.isdir(os.path.join(root, d, "snapshots"))
        )

    def drop_table(self, identifier: str, purge: bool = True) -> None:
        """DROP TABLE; ``purge`` removes data too (path catalog has no
        separate metadata-only drop)."""
        if purge:
            shutil.rmtree(self._path(identifier), ignore_errors=True)
        else:
            raise ValueError("path catalog only supports purge drops")

    # -- multi-table transactions (Nessie shape, r10 — sources/txn.py) -------

    def transaction(self, ref: str = "main"):
        """``with cat.transaction() as tx: tx.table("ns.a").append(...);
        tx.table("ns.b").delete_where(...)`` — one atomic catalog
        commit on the named ref pins every touched table's produced
        version."""
        from .txn import CatalogTransaction

        return CatalogTransaction(self, ref=ref)

    def snapshot(self, version: int | None = None, ref: str = "main"):
        """Consistent multi-table read view at a catalog commit
        (default: the named ref's head)."""
        from .txn import CatalogSnapshot

        return CatalogSnapshot(self, version, ref=ref)

    def catalog_tip(self, ref: str = "main") -> int:
        from .txn import ref_head

        return ref_head(self.warehouse, ref)

    def create_branch(self, name: str, from_ref: str = "main") -> int:
        from .txn import create_branch

        return create_branch(self.warehouse, name, from_ref)

    def create_catalog_tag(
        self, name: str, from_ref: str = "main"
    ) -> int:
        from .txn import create_tag

        return create_tag(self.warehouse, name, from_ref)

    def merge_branch(self, src: str, into: str = "main") -> dict:
        from .txn import merge_ref

        return merge_ref(self.warehouse, src, into)

    def refs(self) -> dict:
        from .txn import list_refs

        return list_refs(self.warehouse)

    # -- views (Iceberg view spec shape, r10 — sources/views.py) -------------

    def create_view(
        self,
        identifier: str,
        sql: str,
        replace: bool = False,
        properties: dict | None = None,
    ) -> dict:
        from . import views as V

        return V.create_view(self, identifier, sql, replace, properties)

    def view(self, identifier: str, version: int | None = None):
        from . import views as V

        return V.read_view(self, identifier, version)

    def views(self, ns: str) -> list[str]:
        from . import views as V

        return V.views(self, ns)

    def view_versions(self, identifier: str):
        from . import views as V

        return V.view_versions(self, identifier)

    def drop_view(self, identifier: str) -> None:
        from . import views as V

        V.drop_view(self, identifier)

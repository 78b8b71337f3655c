"""REST-catalog CLIENT data source (late r11): read a lakehouse table
through the HTTP catalog service instead of local manifest paths —
``spark.read.format("lakehouse_rest").option("restUrl", …)
.option("table", "ns.name")``.

This is the consumer half of the interop story
(sources/rest_catalog.py is the server half): the session resolves the
table's schema from ``LoadTableResult``, pushes its filters to the
server's ``/plan`` endpoint (stats-pruned file list — the catalog does
for this reader what pushFilters does for the local DSv2 source), and
each task reads ONE surviving parquet file with pyarrow, projecting to
the declared schema (column pruning honored via the schema Spark
passes to ``reader()``; pre-``add_column`` files fill Iceberg v3
initial-defaults; renamed columns resolve through prior names).

Contract (documented, loud): plaintext tables with NO pending MoR
deletes only — the plan response's ``encrypted`` / ``delete-pending``
flags REFUSE at planning time instead of silently returning wrong
rows (the local ``lakehouse`` format is the full-fidelity reader; this
one is for sessions that only have the catalog URL + storage access).

Scale: exactly the Iceberg REST division of labor — O(1) HTTP
metadata exchanges at planning, data reads go straight to storage,
one task per surviving file.
"""

from __future__ import annotations

import json
import urllib.request


def _http(url: str, method: str = "GET", body: dict | None = None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(url, data=data, method=method)
    if data:
        req.add_header("Content-Type", "application/json")
    with urllib.request.urlopen(req, timeout=60) as resp:
        return json.loads(resp.read())


def make_lakehouse_rest_source():
    """Build the ``lakehouse_rest`` DataSource class (deferred import,
    same pattern as the other Python data sources)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        EqualTo,
        GreaterThan,
        GreaterThanOrEqual,
        In,
        InputPartition,
        LessThan,
        LessThanOrEqual,
    )

    class _FilePart(InputPartition):
        def __init__(self, path: str | None):
            self.path = path

    class _RestReader(DataSourceReader):
        def __init__(
            self,
            url: str,
            ns: str,
            name: str,
            snapshot: int | None,
            schema_json: str | None,
            target_struct,
        ):
            self.url = url
            self.ns = ns
            self.name = name
            self.snapshot = snapshot
            self.bounds: dict[str, list] = {}
            self.planned_files: list[str] | None = None
            from .lakehouse import LakehouseTable  # noqa: F401  (docs)
            from ..streaming.lakehouse_source import (
                _nullable_struct,
                _schema_defaults,
            )
            from pyspark.sql.pandas.types import to_arrow_schema
            from pyspark.sql.types import StructType

            self._defaults: dict = {}
            self._renames: dict = {}
            if schema_json:
                self._defaults = _schema_defaults(schema_json)
                self._renames = {
                    f["name"]: (f.get("metadata") or {}).get(
                        "prior_names", []
                    )
                    for f in json.loads(schema_json)["fields"]
                    if (f.get("metadata") or {}).get("prior_names")
                }
            # the schema Spark planned with (column pruning: it may be
            # a subset of the declared schema) is the projection target
            self._target_arrow = to_arrow_schema(
                _nullable_struct(StructType(list(target_struct.fields)))
            )

        # -- pushdown: fold range filters, ship them to /plan ----------

        def pushFilters(self, filters):
            return list(self._fold(filters))

        def _fold(self, filters):
            for f in filters:
                col = (
                    f.attribute[0]
                    if hasattr(f, "attribute") and len(f.attribute) == 1
                    else None
                )
                if col is None:
                    pass
                elif isinstance(f, EqualTo):
                    self._clamp(col, f.value, f.value)
                elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                    self._clamp(col, f.value, None)
                elif isinstance(f, (LessThan, LessThanOrEqual)):
                    self._clamp(col, None, f.value)
                elif isinstance(f, In) and f.value:
                    try:
                        self._clamp(col, min(f.value), max(f.value))
                    except TypeError:
                        pass
                # every filter is returned: Spark re-applies row-level,
                # so server-side pruning only needs to be conservative
                yield f

        def _clamp(self, col: str, lo, hi) -> None:
            b = self.bounds.setdefault(col, [None, None])
            if lo is not None and (b[0] is None or lo > b[0]):
                b[0] = lo
            if hi is not None and (b[1] is None or hi < b[1]):
                b[1] = hi

        def partitions(self):
            body: dict = {
                "filters": [
                    {"col": c, "lo": b[0], "hi": b[1]}
                    for c, b in self.bounds.items()
                ]
            }
            if self.snapshot is not None:
                body["snapshot-id"] = self.snapshot
            plan = _http(
                f"{self.url}/v1/namespaces/{self.ns}/tables/"
                f"{self.name}/plan",
                "POST",
                body,
            )
            if plan["encrypted"]:
                raise ValueError(
                    "lakehouse_rest: table is ENCRYPTED — this client "
                    "reads plaintext parquet only; use the local "
                    "'lakehouse' format with encryptionKey"
                )
            if plan["delete-pending"]:
                raise ValueError(
                    "lakehouse_rest: table has PENDING MoR deletes — a "
                    "plain parquet read would resurrect deleted rows; "
                    "compact the table (rewrite_data_files / "
                    "coalesce-to-DV is not enough: DVs are also MoR) "
                    "or use the local 'lakehouse' format"
                )
            self.planned_files = list(plan["files"])
            if not self.planned_files:
                return [_FilePart(None)]
            return [_FilePart(f) for f in self.planned_files]

        def read(self, partition):
            if partition.path is None:
                return
            import pyarrow.parquet as pq

            from ..streaming.lakehouse_source import (
                _hive_path_values,
                _project_arrow,
            )

            pf = pq.ParquetFile(partition.path)
            have = set(pf.schema_arrow.names)
            want = []
            for fld in self._target_arrow:
                if fld.name in have:
                    want.append(fld.name)
                else:
                    for prior in reversed(
                        self._renames.get(fld.name, [])
                    ):
                        if prior in have:
                            want.append(prior)
                            break
            tbl = pf.read(columns=want or None)
            yield from _project_arrow(
                tbl,
                self._target_arrow,
                defaults=self._defaults,
                renames=self._renames,
                hive_vals=_hive_path_values(partition.path),
            ).to_batches()

    class LakehouseRestSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "lakehouse_rest"

        def _opts(self):
            o = {k.lower(): v for k, v in self.options.items()}
            url = (o.get("resturl") or "").rstrip("/")
            ident = o.get("table") or ""
            ns, _, name = ident.partition(".")
            if not url or not ns or not name:
                raise ValueError(
                    "lakehouse_rest requires options restUrl and "
                    "table ('ns.name')"
                )
            snap = o.get("snapshotid")
            return url, ns, name, int(snap) if snap else None

        def _load(self):
            url, ns, name, snap = self._opts()
            q = f"?snapshot-id={snap}" if snap else ""
            res = _http(
                f"{url}/v1/namespaces/{ns}/tables/{name}{q}"
            )
            return url, ns, name, snap, res

        def schema(self):
            from ..streaming.lakehouse_source import _nullable_struct
            from pyspark.sql.types import StructType

            *_ident, res = self._load()
            sj = res["x-lakehouse"].get("schema-json")
            if not sj:
                raise ValueError(
                    "lakehouse_rest: server returned no schema for "
                    "this snapshot (pre-schema legacy table)"
                )
            self._schema_json = sj
            return _nullable_struct(StructType.fromJson(json.loads(sj)))

        def reader(self, schema):
            url, ns, name, snap = self._opts()
            sj = getattr(self, "_schema_json", None)
            if sj is None:
                *_ident, res = self._load()
                sj = res["x-lakehouse"].get("schema-json")
            return _RestReader(url, ns, name, snap, sj, schema)

    return LakehouseRestSource

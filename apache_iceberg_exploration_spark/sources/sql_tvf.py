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

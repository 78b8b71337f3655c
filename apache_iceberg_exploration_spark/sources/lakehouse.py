"""Snapshot-versioned lakehouse tables: the Iceberg capability surface of
the reference (etl.py:51-54 overwrite sinks, sparkmini read-back,
constant.py:43-55 catalog config, and the `IcebergSparkSessionExtensions`
features it enables but never uses — MERGE INTO, snapshot procedures),
rebuilt on plain parquet + JSON manifests because no iceberg-spark-runtime
jar ships in this container. ``session.get_spark`` still wires the real
Iceberg catalog whenever the jar IS present; this module is the
jar-independent implementation of the same semantics:

- atomic snapshot commits (create-exclusive manifest files),
- append / overwrite / merge / compact operations,
- time travel (``VERSION AS OF`` ↔ ``read(version=N)``),
- snapshot expiration (``expire_snapshots``),
- file compaction (``rewrite_data_files``),
- optimistic concurrency: concurrent committers race on the manifest
  create; losers rebase and retry (the snapshot-isolation behavior the
  reference's sparkmini experiment targets — appName
  'iceberg-concurrent-write-isolation-test', SURVEY.md O9).

Layout per table::

    <root>/data/<snapshot-uuid>/part-*.parquet   (files added by a commit)
    <root>/snapshots/v{N}.json                    (manifest: full file list)

A manifest lists the COMPLETE set of data files visible at that version,
so reads never chase parent chains. Scale: reads are
``spark.read.parquet(*files)`` — all pruning/pushdown intact; the
manifest is O(files), kept small by compaction, exactly like Iceberg's
manifest-list design.
"""

from __future__ import annotations

import glob
import json
import os
import re
import shutil
import time
import uuid
from dataclasses import dataclass, field
from functools import reduce as functools_reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# Iceberg's safe type-promotion chains (spec §Schemas: int→long,
# float→double, decimal(P,S)→decimal(P'>P,S)), extended down Spark's
# narrow integer types. Within a chain, the WIDER type can represent
# every value of the narrower exactly — so promoting the declared type
# never changes existing data, and reading old files upcasts losslessly.
_INT_CHAIN = ["byte", "short", "integer", "long"]
_FLOAT_CHAIN = ["float", "double"]
_DECIMAL_RE = re.compile(r"^decimal\((\d+),(\d+)\)$")


def _promote_type(base_t, extra_t, col: str) -> str:
    """Resolve a same-name type conflict between a table's declared type
    and an incoming write's type: return the promoted declared type when
    the pair sits on one promotion chain, raise otherwise (never silently
    cast incoming values down)."""
    if not (isinstance(base_t, str) and isinstance(extra_t, str)):
        raise ValueError(
            f"column {col!r}: nested type conflict "
            f"({base_t!r} vs {extra_t!r}) — nested-type evolution is "
            "not supported"
        )
    for chain in (_INT_CHAIN, _FLOAT_CHAIN):
        if base_t in chain and extra_t in chain:
            return max(base_t, extra_t, key=chain.index)
    mb, me = _DECIMAL_RE.match(base_t), _DECIMAL_RE.match(extra_t)
    if mb and me and mb.group(2) == me.group(2):
        p = max(int(mb.group(1)), int(me.group(1)))
        return f"decimal({p},{mb.group(2)})"
    raise ValueError(
        f"column {col!r}: incompatible types {base_t!r} vs {extra_t!r} — "
        "only widening promotions (int→long, float→double, decimal "
        "precision growth at equal scale) are allowed; cast the "
        "incoming frame explicitly if narrowing is intended"
    )


def _check_default_literal(value, col: str) -> None:
    """DEFAULT column values must be JSON-primitive literals — they live
    in the schema metadata of every snapshot manifest and must be
    exactly reconstructible by every reader (Spark literal, Arrow
    constant array, CDC python tuple). Dates/timestamps travel as ISO
    strings cast by the declared type."""
    if not isinstance(value, (int, float, str, bool)):
        raise ValueError(
            f"column {col!r}: unsupported default value {value!r} — "
            "defaults must be int/float/str/bool literals (dates and "
            "timestamps as ISO strings matching the declared type)"
        )


def _publish_sidecar(path: str, payload) -> None:
    """Rename-free sidecar write (the object-store commit contract the
    lifecycle test enforces: os.rename/replace/move never appear in the
    table layer — S3 has no atomic rename). Pattern mirrors the
    manifest commit: full tmp write + fsync, ``os.link`` to the final
    name (create-if-absent), tmp unlinked. Sidecars are DERIVED
    metadata keyed by version, so a pre-existing target is simply
    superseded: unlink-then-link; a crash between the two leaves the
    sidecar absent, which every reader treats as 'fall back'."""
    tmp = path + f".{uuid.uuid4().hex}.tmp"
    with open(tmp, "w") as fh:
        json.dump(payload, fh)
        fh.flush()
        os.fsync(fh.fileno())
    try:
        if os.path.exists(path):
            os.unlink(path)
        os.link(tmp, path)
    finally:
        os.unlink(tmp)


def _read_dv_bytes(
    path: str,
    offset: int,
    length: int,
    sha256: str | None,
    table_key: bytes | None = None,
    encrypted: bool = False,
) -> bytes:
    """Read one deletion-vector blob from its Puffin-style container and
    verify its recorded sha256 prefix. Module-level (picklable) so
    EXECUTOR-side decode paths — the >100k-row mapInPandas expansion,
    the streaming/_dv_positions reader, the DSv2 Arrow mask — run the
    SAME integrity check as the driver-side small-read path, instead of
    applying a corrupted/truncated bitmap silently (ADVICE r7)."""
    with open(path, "rb") as f:
        f.seek(int(offset))
        blob = f.read(int(length))
    if sha256 is not None:
        import hashlib

        got = hashlib.sha256(blob).hexdigest()[:16]
        if got != sha256:
            raise ValueError(
                "deletion-vector blob checksum mismatch at "
                f"{path!r} offset {offset} — container corrupted or "
                "truncated; restore from a retained snapshot (rollback) "
                "or rewrite the file (rewrite_dv_heavy_files / "
                "rewrite_data_files)"
            )
    if encrypted:
        # encrypted container (table encryption): the sha256 above
        # covers the CIPHERTEXT (integrity checkable without the key);
        # the per-container data key unwraps from the key sidecar
        from . import encryption as E

        if table_key is None:
            raise ValueError(
                "lakehouse encryption: deletion-vector container "
                f"{path!r} is encrypted — provide the table key"
            )
        meta = E.read_key_sidecar(path)
        return E.decrypt_blob(blob, E.unwrap_key(meta["key"], table_key))
    return blob


class CommitConflict(Exception):
    """Another writer committed the same version first."""


_TRANSFORM_RE = __import__("re").compile(
    r"^(?P<fn>days|months|years|hours)\((?P<c1>\w+)\)$"
    r"|^bucket\((?P<n1>\d+),\s*(?P<c2>\w+)\)$"
    r"|^truncate\((?P<n2>\d+),\s*(?P<c3>\w+)\)$"
)


@dataclass(frozen=True)
class PartitionSpec:
    """One partition field: an Iceberg-style transform over a source
    column. ``identity`` partitions on raw values; ``days/months/years/
    hours`` derive calendar buckets from a timestamp; ``bucket(N, col)``
    hashes into N buckets; ``truncate(W, col)`` truncates ints to
    multiples of W / strings to W chars. Hidden partitioning: readers
    query the SOURCE column — the transform exists only in layout and
    pruning, never in query text (Iceberg's core partition design)."""

    kind: str
    col: str
    n: int | None = None

    @staticmethod
    def parse(spec: str) -> "PartitionSpec":
        m = _TRANSFORM_RE.match(spec.strip())
        if not m:
            return PartitionSpec("identity", spec.strip())
        if m.group("fn"):
            return PartitionSpec(m.group("fn"), m.group("c1"))
        if m.group("n1"):
            return PartitionSpec("bucket", m.group("c2"), int(m.group("n1")))
        return PartitionSpec("truncate", m.group("c3"), int(m.group("n2")))

    @property
    def field_name(self) -> str:
        if self.kind == "identity":
            return self.col
        n = "" if self.n is None else str(self.n)
        return f"__p_{self.kind}{n}_{self.col}"

    @property
    def spec_str(self) -> str:
        """Round-trip to the ``parse`` syntax (so a manifest's stored
        spec dicts can drive a re-layouting write)."""
        if self.kind == "identity":
            return self.col
        if self.n is not None:
            return f"{self.kind}({self.n}, {self.col})"
        return f"{self.kind}({self.col})"

    def column(self) -> F.Column:
        c = F.col(self.col)
        if self.kind == "identity":
            return c
        if self.kind == "days":
            return F.date_format(c, "yyyy-MM-dd")
        if self.kind == "months":
            return F.date_format(c, "yyyy-MM")
        if self.kind == "years":
            return F.date_format(c, "yyyy")
        if self.kind == "hours":
            return F.date_format(c, "yyyy-MM-dd-HH")
        if self.kind == "bucket":
            return F.pmod(F.xxhash64(c), F.lit(self.n)).cast("int")
        if self.kind == "truncate":
            return F.when(
                c.cast("string") == c.cast("long").cast("string"),
                (F.floor(c.cast("long") / self.n) * self.n).cast("string"),
            ).otherwise(F.substring(c.cast("string"), 1, self.n))
        raise ValueError(self.kind)

    @property
    def monotonic(self) -> bool:
        """Order-preserving transforms admit range pruning; bucket admits
        only point pruning."""
        return self.kind in (
            "identity", "days", "months", "years", "hours", "truncate"
        )

    def transform_value(self, spark: SparkSession, v):
        """Driver-side transform of a scan bound, delegated to the SAME
        Spark expressions as the write path (one 1-row local job) so
        pruning can never disagree with layout — e.g. bucket() must use
        Spark's xxhash64, not a Python reimplementation."""
        if self.kind == "identity":
            return str(v)
        row = (
            spark.createDataFrame([(v,)], [self.col])
            .select(self.column().cast("string").alias("t"))
            .first()
        )
        return row.t


@dataclass
class LakehouseTable:
    """Handle to a snapshot-versioned table rooted at ``path``."""

    spark: SparkSession
    path: str
    max_commit_retries: int = 10
    # table-encryption key (KMS stand-in, never persisted): raw bytes
    # or hex string; required to read/write an encrypted table
    encryption_key: bytes | str | None = None

    # -- manifest bookkeeping -------------------------------------------------

    @property
    def _snap_dir(self) -> str:
        return os.path.join(self.path, "snapshots")

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self._snap_dir, f"v{version}.json")

    def current_version(self) -> int:
        """Highest committed version (0 = table does not exist yet)."""
        if not os.path.isdir(self._snap_dir):
            return 0
        versions = [
            int(os.path.basename(p)[1:-5])
            for p in glob.glob(os.path.join(self._snap_dir, "v*.json"))
        ]
        return max(versions, default=0)

    def snapshots(self) -> list[dict]:
        """All snapshot manifests, oldest first (the history/metadata view —
        Iceberg's ``<table>.snapshots``)."""
        out = []
        for v in range(1, self.current_version() + 1):
            p = self._manifest_path(v)
            if os.path.exists(p):
                with open(p) as f:
                    out.append(self._materialize_manifest(json.load(f)))
        return out

    def _read_manifest(self, version: int) -> dict:
        with open(self._manifest_path(version)) as f:
            return self._materialize_manifest(json.load(f))

    # -- manifest parts (Iceberg manifest-list design) -----------------------
    #
    # A committed manifest does NOT inline its O(files) payload. The file
    # list and the per-file maps (stats / file_seq / partitions) live in
    # immutable PART files under snapshots/parts/; the manifest stores the
    # part paths. A commit carries the parent's parts whose contents are
    # unchanged and writes ONE new part for the delta — so commit IO is
    # O(added + touched parts), not O(table), which is the property that
    # keeps a 1000-commit/day table with 10^6 files committable. Readers
    # materialize parts back into the flat keys (cached: parts are
    # immutable), so every consumer above this layer is unchanged.
    # Manifests from older table versions (inline "files") still read.

    PART_KEYS = ("stats", "file_seq", "partitions", "row_ids")

    @property
    def _parts_dir(self) -> str:
        return os.path.join(self._snap_dir, "parts")

    def _load_part(self, path: str) -> dict:
        cache = self.__dict__.setdefault("_part_cache", {})
        if path not in cache:
            with open(path) as f:
                cache[path] = json.load(f)
        return cache[path]

    def _raw_manifest(self, path: str) -> dict:
        with open(path) as f:
            return json.load(f)

    def _materialize_manifest(self, m: dict) -> dict:
        """Expand a parts-format manifest into the flat in-memory form
        (files + per-file maps). No-op for inline-format manifests."""
        if "parts" not in m or "files" in m:
            return m
        files: list[str] = []
        maps: dict[str, dict] = {k: {} for k in m.get("part_keys", [])}
        for ppath in m["parts"]:
            part = self._load_part(ppath)
            files.extend(part["files"])
            for k in maps:
                maps[k].update(part.get(k, {}))
        m["files"] = files
        for k, v in maps.items():
            m[k] = v
        return m

    def _factor_parts(self, manifest: dict, prev: dict | None) -> None:
        """Inverse of _materialize_manifest, applied at commit time: move
        the per-file payload into part files, carrying every parent part
        whose files are all still present WITH identical per-file
        entries (parts are immutable, so 'same path, same contents').
        Only the delta — new files plus survivors of partially-retained
        parts — is written, as one new part.

        Merge-on-commit (r12, guide §7.3 driver-side planning; Iceberg's
        ``commit.manifest.min-count-to-merge`` behavior): an append-only
        history otherwise accretes one part per commit, and every
        manifest read then opens O(commits) part files — 500 tiny
        appends made planning open 500 JSONs. When the carried-part
        count reaches the merge threshold, parts smaller than
        ``total_files // 8`` fold into this commit's new part, bounding
        the part count at threshold + ~8 big parts; a file is re-merged
        only each time the table grows past another 8×, so total
        rewrite work stays O(files · log(files)). Old manifests keep
        referencing the unmerged parts (immutable); GC reclaims them
        with their manifests."""
        files = manifest.pop("files")
        present = [k for k in self.PART_KEYS if k in manifest]
        maps = {k: (manifest.pop(k) or {}) for k in present}
        fset = set(files)
        carried: list[str] = []
        covered: set[str] = set()
        for ppath in (prev or {}).get("parts", []):
            try:
                part = self._load_part(ppath)
            except OSError:
                continue
            pfiles = part["files"]
            if (
                not (covered & set(pfiles))
                and all(f in fset for f in pfiles)
                and all(
                    maps.get(k, {}).get(f) == part.get(k, {}).get(f)
                    for k in self.PART_KEYS
                    for f in pfiles
                )
            ):
                carried.append(ppath)
                covered.update(pfiles)
        min_merge = int(
            self.properties().get(
                "commit.manifest.min-count-to-merge",
                self.MANIFEST_MERGE_MIN_COUNT,
            )
        )
        if len(carried) >= min_merge:
            target = max(2, len(files) // 8)
            keep = []
            for ppath in carried:
                if len(self._load_part(ppath)["files"]) < target:
                    covered.difference_update(
                        self._load_part(ppath)["files"]
                    )
                else:
                    keep.append(ppath)
            carried = keep
        rest = [f for f in files if f not in covered]
        if rest or not carried:
            os.makedirs(self._parts_dir, exist_ok=True)
            newp = os.path.join(
                self._parts_dir, f"part-{uuid.uuid4().hex}.json"
            )
            body: dict = {"files": rest}
            for k in present:
                body[k] = {f: maps[k][f] for f in rest if f in maps[k]}
            with open(newp, "w") as f:
                json.dump(body, f)
            self.__dict__.setdefault("_part_cache", {})[newp] = body
            carried.append(newp)
        manifest["parts"] = carried
        manifest["part_keys"] = present

    @staticmethod
    def _delete_key_files(manifest: dict) -> set[str]:
        """Paths of every MoR delete-key file a manifest references —
        live data for GC purposes until the manifest expires. Deletion-
        vector container files count too: a retained snapshot's DV is
        live; a SUPERSEDED DV (its data file got a newer bitmap, or was
        rewritten) drops out of every retained manifest and becomes an
        orphan the sweep reclaims."""
        return {
            f
            for d in manifest.get("delete_files", [])
            for f in d["files"]
        } | {
            e["path"] for e in manifest.get("delete_vectors", {}).values()
        }

    # -- deletion vectors (Iceberg v3) ----------------------------------------
    #
    # A deletion vector is a POSITION BITMAP for one data file: bit i set
    # means "row at position i is deleted". At most one DV per data file
    # per snapshot (latest-DV-wins: a replacement bitmap must be a
    # superset of the one it replaces — enforced by OR-merging at write).
    # Blobs for one commit are packed back-to-back into a single
    # Puffin-style container under <table>/deletes/; the manifest's
    # ``delete_vectors`` map holds {data_file: {path, offset, length,
    # cardinality, seq}} — the same "offset into a shared sidecar"
    # layout Iceberg v3 uses, which keeps commit IO at one container
    # write regardless of how many data files the delete touches, and
    # solves the pos-delete-file sprawl (N coordinate parquet files per
    # delete) that rewrite_position_delete_files existed to clean up.

    @staticmethod
    def _dv_encode(positions) -> tuple[bytes, int]:
        """Bitmap-encode sorted row positions → (packed bytes,
        cardinality). numpy packbits: 1 bit per row up to the max
        deleted position — a 10^6-row file's DV is ≤125 KB even fully
        deleted, and typically far smaller."""
        import numpy as np

        pos = np.asarray(positions, dtype=np.int64)
        if pos.size == 0:
            # shared codec (delete_where_dv, coalesce_deletes_to_dv, the
            # union1d merge): a zero-position vector is a caller bug —
            # fail the contract loudly instead of an opaque numpy error
            raise ValueError(
                "deletion vector requires at least one position"
            )
        bits = np.zeros(int(pos.max()) + 1, dtype=np.uint8)
        bits[pos] = 1
        return np.packbits(bits).tobytes(), int(len(np.unique(pos)))

    @staticmethod
    def _dv_decode(blob: bytes):
        """Inverse of _dv_encode: packed bitmap → int64 positions."""
        import numpy as np

        return np.nonzero(
            np.unpackbits(np.frombuffer(blob, dtype=np.uint8))
        )[0].astype("int64")

    @property
    def _dv_dir(self) -> str:
        return os.path.join(self.path, "deletes")

    def _read_dv_blob(self, entry: dict) -> bytes:
        return _read_dv_bytes(
            entry["path"],
            entry["offset"],
            entry["length"],
            entry.get("sha256"),
            table_key=self._maybe_key() if entry.get("enc") else None,
            encrypted=bool(entry.get("enc")),
        )

    def _try_commit(
        self, version: int, manifest: dict, path: str | None = None
    ) -> None:
        """Atomic commit: the manifest is FULLY written to a private temp
        file first, then published with ``os.link`` — a POSIX atomic
        create-if-absent of the final name. Exactly one concurrent
        committer can win a given version (the loser gets CommitConflict,
        rebases, retries), and no reader can ever observe a partial
        manifest: the final path either doesn't exist or holds complete
        JSON. (Create-then-write had a window where a rebasing committer
        json.load'ed a truncated file.) ``path`` overrides the target for
        branch-chain commits (same protocol, different namespace)."""
        target = path or self._manifest_path(version)
        os.makedirs(os.path.dirname(target), exist_ok=True)
        to_write = manifest
        if "files" in manifest:
            # factor the O(files) payload into part files (a COPY is
            # factored: the caller's dict keeps the flat form, matching
            # what a subsequent _read_manifest would materialize).
            # Parent lookup: same namespace first (main chain or branch
            # chain via `path`), then the branch's fork-point snapshot on
            # main. A failed attempt may strand its freshly written part
            # — unreferenced parts are swept by remove_orphan_files.
            prev = None
            parent = manifest.get("parent") or 0
            cand = os.path.join(os.path.dirname(target), f"v{parent}.json")
            if parent and os.path.exists(cand):
                prev = self._raw_manifest(cand)
            else:
                base = manifest.get("summary", {}).get("base_version")
                if base and os.path.exists(self._manifest_path(base)):
                    prev = self._raw_manifest(self._manifest_path(base))
            to_write = dict(manifest)
            if to_write.pop("_no_carry", False):  # manifest-part rewrite
                prev = None
            self._factor_parts(to_write, prev)
        tmp = os.path.join(
            os.path.dirname(target), f".tmp-{uuid.uuid4().hex}-v{version}.json"
        )
        with open(tmp, "w") as f:
            json.dump(to_write, f, indent=1)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, target)
        except FileExistsError as e:
            raise CommitConflict(f"version {version} already committed") from e
        finally:
            os.unlink(tmp)
        if path is None and "files" in manifest:
            # partition statistics file (Iceberg partition-stats spec
            # shape): an O(partitions) per-snapshot rollup written by
            # the COMMIT WINNER so partitions() and maintenance planners
            # read O(partitions), not O(files). Derived metadata only —
            # a failure here must never un-commit the published
            # manifest, and readers fall back to the manifest fold when
            # the sidecar is absent.
            try:
                self._write_partition_stats(version, manifest)
            except (OSError, ValueError, KeyError, TypeError):
                pass  # derived sidecar only; readers fall back

    # -- data-file production -------------------------------------------------

    def _write_data_files(
        self,
        df: DataFrame,
        partition_by: list[str] | None = None,
        distribution: str | None = None,
    ) -> tuple[str, list[str]]:
        """``partition_by`` entries are transform specs (PartitionSpec
        syntax): ``"col"``, ``"days(ts_col)"``, ``"bucket(16, key)"``,
        ``"truncate(4, col)"``. Non-identity transforms add a derived
        hidden column for layout; the SOURCE column stays in the data
        files, so footer stats and queries are transform-agnostic.

        ``distribution="hash"`` (Iceberg ``write.distribution-mode=hash``)
        shuffles rows to their partition value before the write, so each
        partition tuple is written by ONE task → one file. Without it, a
        partitioned write fans out to tasks × partition-values files —
        the small-file explosion that at 1000 executors × 1000 daily
        partitions means a million files per commit. The trade: one extra
        shuffle per write, and a heavily skewed partition value serializes
        into a single task (mitigate upstream with AQE rebalance or a
        finer-grained spec)."""
        snap_id = uuid.uuid4().hex[:12]
        data_dir = os.path.join(self.path, "data", snap_id)
        specs = [PartitionSpec.parse(s) for s in (partition_by or [])]
        out = self._encode_variant_cols(df)
        # geometry envelope shreds (Iceberg v3 geo stats): every write
        # path funnels through here, so rewrites re-materialize them
        out = self._add_geo_shreds(out, self._geo_columns())
        for sp in specs:
            if sp.kind != "identity":
                out = out.withColumn(sp.field_name, sp.column())
        if distribution is not None:
            if distribution != "hash":
                raise ValueError(
                    f"unknown write distribution {distribution!r} "
                    "(supported: 'hash')"
                )
            if not specs:
                raise ValueError(
                    "distribution='hash' requires partition_by"
                )
            out = out.repartition(*[sp.field_name for sp in specs])
        if self._encryption_on():
            # encrypted tables: executor-side Arrow write → in-memory
            # parquet → AES-GCM envelope. Plaintext never touches disk;
            # stats are computed write-side and land in the key sidecar
            # (encrypt-then-stat). Returned paths come from the
            # SUCCESSFUL tasks' rows, not a directory glob — a retried
            # task's partial files are unreferenced orphans for
            # remove_orphan_files, never committed.
            files = self._write_encrypted_files(
                out, data_dir, [sp.field_name for sp in specs]
            )
            return snap_id, sorted(files)
        writer = out.write.mode("errorifexists")
        if specs:
            writer = writer.partitionBy(*[sp.field_name for sp in specs])
        writer.parquet(data_dir)
        files = [
            p
            for p in glob.glob(os.path.join(data_dir, "**", "*.parquet"), recursive=True)
        ]
        return snap_id, sorted(files)

    def _write_encrypted_files(
        self, out: DataFrame, data_dir: str, spec_fields: list[str]
    ) -> list[str]:
        """Distributed encrypted write: each task serializes its rows
        (grouped into hive-style subdirs when ``spec_fields``) to
        parquet in memory, envelope-encrypts to one file per partition
        tuple, and publishes the per-file key sidecar (wrapped data key
        + plaintext stats + Arrow schema). Mirrors
        ``writer.partitionBy(...).parquet(...)`` file-for-file."""
        key = self._enc_key()
        key_id = self.get_property("encryption.key-id") or "k1"
        enc_mode = self.get_property("encryption.mode") or "envelope"

        def task(batches):
            import pyarrow as pa

            from . import encryption as E

            chunks = list(batches)
            if not chunks or sum(b.num_rows for b in chunks) == 0:
                return
            tbl = pa.Table.from_batches(chunks)
            groups: list[tuple[list[str], "pa.Table"]] = []
            if spec_fields:
                from urllib.parse import quote

                import pandas as pd

                keys_pdf = tbl.select(spec_fields).to_pandas()
                for tup, idx in keys_pdf.groupby(
                    spec_fields, dropna=False, sort=True
                ).indices.items():
                    if len(spec_fields) == 1:
                        tup = (tup,)
                    segs = [
                        f"{c}="
                        + (
                            quote(str(v), safe="")
                            if v is not None and v == v
                            else "__HIVE_DEFAULT_PARTITION__"
                        )
                        for c, v in zip(spec_fields, tup)
                    ]
                    groups.append(
                        (segs, tbl.take(idx).drop_columns(spec_fields))
                    )
            else:
                groups.append(([], tbl))
            for segs, sub in groups:
                path = os.path.join(
                    data_dir, *segs, f"part-{uuid.uuid4().hex}.parquet"
                )
                E.write_encrypted_parquet(
                    sub, path, key, key_id, mode=enc_mode
                )
                yield pa.RecordBatch.from_pylist(
                    [{"file": path}],
                    schema=pa.schema([("file", pa.string())]),
                )

        return [
            r["file"]
            for r in out.mapInArrow(task, "file string").collect()
        ]

    @staticmethod
    def _destring_variants(df: DataFrame) -> DataFrame:
        """VARIANT columns as their canonical JSON text — for surfaces
        that must compare or set-op rows (changelog diffs), where Spark
        forbids VARIANT."""
        from pyspark.sql import types as T

        for f in df.schema.fields:
            if isinstance(f.dataType, T.VariantType):
                df = df.withColumn(f.name, F.col(f.name).cast("string"))
        return df

    @staticmethod
    def _add_variant_shreds(
        df: DataFrame, variant_shred: dict | None
    ) -> DataFrame:
        """Typed SHREDDED stat columns for variant pruning (the Iceberg/
        Delta variant-shredding idea): ``variant_shred={"v": {"level":
        ("$.level", "int")}}`` materializes ``__shred_v_level`` =
        ``variant_get(v, '$.level', 'int')`` into the data files — a
        reserved-prefix PHYSICAL column that never enters the declared
        schema, but whose footer min/max land in the manifest stats, so
        ``scan({"__shred_v_level": (lo, hi)})`` file-prunes on a field
        INSIDE the variant without reading a byte of it."""
        for col, fields in (variant_shred or {}).items():
            for alias, (path, typ) in fields.items():
                df = df.withColumn(
                    f"__shred_{col}_{alias}",
                    F.expr(f"variant_get({col}, '{path}', '{typ}')"),
                )
        return df

    def _apply_write_sort(self, df: DataFrame) -> DataFrame:
        """Iceberg ``write.sort-order`` via the ``write.sort-by`` table
        property: INGEST writes (append / overwrite / constrained
        append) are range-distributed on the configured columns and
        locally sorted (``write.distribution-mode=range`` + sort-order,
        the Iceberg pairing) — every data file then covers a NARROW,
        mostly disjoint value range, so footer min/max pruning bites
        without a maintenance pass. A plain local sort would only
        tighten row groups: hash-placed tasks each still span the full
        range, so file-level skipping never engages. The output keeps
        the incoming partition count (one range per existing task — no
        small-file explosion on small appends); rewrite paths keep
        their own explicit clustering (sort_by/zorder/hilbert/geo),
        which a property re-sort would silently destroy. Columns
        absent from the frame (engine-internal writes, narrower
        appends) skip."""
        raw = self.get_property("write.sort-by")
        cols = [c for c in (raw or "").split(",") if c]
        if not cols or any(c not in df.columns for c in cols):
            return df
        n = max(1, df.rdd.getNumPartitions())
        return df.repartitionByRange(n, *cols).sortWithinPartitions(
            *cols
        )

    def _geo_columns(self) -> list[str]:
        """Declared geometry columns (Iceberg v3 geo types) — table
        CONFIG like constraints/properties, stored in the ``geo.columns``
        property rather than threaded through every snapshot-building
        path (the partition-layout-erosion lesson). Declared via
        ``overwrite(geo_cols=[...])``."""
        raw = self.get_property("geo.columns")
        return [c for c in (raw or "").split(",") if c]

    @staticmethod
    def _add_geo_shreds(df: DataFrame, geo_cols: list[str]) -> DataFrame:
        """Materialize per-row envelope shred columns
        ``__geo_<col>_{xmin,ymin,xmax,ymax}`` for every declared
        geometry column present in ``df`` — the Iceberg v3 geo-stats
        design: the parquet footer min/max of these doubles give each
        data file a bounding box in the manifest, so
        ``scan(geo_bbox=...)`` skips files that cannot intersect the
        query window. Recomputed on EVERY write (deterministic from the
        WKB bytes), so CoW rewrites and compaction preserve pruning."""
        if not geo_cols:
            return df
        from ..functions.geo import wkb_bbox

        for c in geo_cols:
            if c not in df.columns:
                continue  # narrower append: schema-union semantics
            tmp = f"__geo_bb_{c}"
            df = df.withColumn(tmp, wkb_bbox(F.col(c)))
            for part in ("xmin", "ymin", "xmax", "ymax"):
                df = df.withColumn(
                    f"__geo_{c}_{part}", F.col(f"{tmp}.{part}")
                )
            df = df.drop(tmp)
        return df

    @staticmethod
    def _encode_variant_cols(df: DataFrame) -> DataFrame:
        """Physical encoding of Spark 4 VARIANT columns at the write
        boundary (EVERY write funnels through _write_data_files —
        appends, overwrites, CoW rewrites, compaction): VARIANT is
        stored as its canonical JSON text (``cast(v AS string)``), not
        parquet's native variant logical type, because pyarrow cannot
        read that Thrift LogicalType and every metadata layer here
        (footer stats, DSv2 Arrow reader, streaming readers, lineage
        counting) is pyarrow-footed. The DECLARED schema keeps type
        'variant' (the caller snapshots df.schema before this runs);
        ``_project_to_schema`` parses the JSON back to VARIANT at
        read."""
        from pyspark.sql import types as T

        vcols = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, T.VariantType)
        ]
        for c in vcols:
            df = df.withColumn(c, F.col(c).cast("string"))
        return df

    @staticmethod
    def _file_partitions(files: list[str]) -> dict[str, dict[str, str]]:
        """Per-file partition values parsed from hive-style path segments
        (``name=value``) — the manifest's partition tuple per data file."""
        from urllib.parse import unquote

        out: dict[str, dict[str, str]] = {}
        for f in files:
            vals = {}
            for seg in f.split(os.sep):
                if "=" in seg and not seg.endswith(".parquet"):
                    k, _, v = seg.partition("=")
                    vals[k] = unquote(v)
            if vals:
                out[f] = vals
        return out

    @staticmethod
    def _collect_file_stats(files: list[str]) -> dict[str, dict]:
        """Per-file column min/max from the parquet footers, written into
        the manifest at commit time (Iceberg's data-file stats). Footers
        of freshly written files are page-cache-hot; reads fan out on a
        thread pool (footer decode releases the GIL in Arrow) — commit
        overhead stays flat as writer parallelism grows. Only
        scalar-typed columns are recorded."""
        from concurrent.futures import ThreadPoolExecutor

        import pyarrow.parquet as pq

        def one_file(f: str) -> tuple[str, dict]:
            from . import encryption as E

            if E.is_encrypted_file(f):
                # encrypted files carry write-side plaintext stats in
                # their key sidecar (encrypt-then-stat) — the footer is
                # ciphertext, and commit-time stats must never need the
                # table key
                return f, dict(E.read_key_sidecar(f)["stats"])
            md = pq.ParquetFile(f).metadata
            # "__rows"/"__bytes" are reserved stats keys (row count and
            # on-disk size, for the files metadata table, cost-based
            # planning, and streaming byte-rate limits); real columns
            # can never collide, and range pruning only ever looks up
            # queried column names.
            per_col: dict[str, list] = {
                "__rows": md.num_rows,
                "__bytes": os.path.getsize(f),
                # top-level column-name inventory (reserved key): the
                # exact per-file column-PRESENCE test initial-default
                # reads need (min/max and __nulls keys are conditional
                # on decodable stats, so absence there proves nothing)
                "__cols": [
                    n
                    for n in md.schema.to_arrow_schema().names
                ],
            }
            if md.num_row_groups == 0:  # empty file: nothing to record
                return f, per_col
            nulls: dict[str, int] = {}
            for ci in range(md.num_columns):
                name = md.row_group(0).column(ci).path_in_schema
                if "." in name:  # nested — skip
                    continue
                mins, maxs = [], []
                ncount, nknown = 0, True
                for g in range(md.num_row_groups):
                    st = md.row_group(g).column(ci).statistics
                    if st is None:
                        mins, nknown = [], False
                        break
                    if st.null_count is None:
                        nknown = False
                    else:
                        ncount += st.null_count
                    if not st.has_min_max:
                        mins = []
                        continue
                    try:
                        mins.append(st.min)
                        maxs.append(st.max)
                    except NotImplementedError:
                        # pyarrow can't DECODE min/max for some physical
                        # types (e.g. fixed-len-byte-array decimals) —
                        # record nothing; pruning conservatively keeps
                        # files without stats, so reads stay exact.
                        mins = []
                        break
                if nknown:
                    # per-column null count (Iceberg's null_value_counts):
                    # IS NULL prunes files with 0, IS NOT NULL prunes
                    # files where nulls == __rows
                    nulls[name] = ncount
                if (
                    mins
                    and len(mins) == md.num_row_groups
                    and all(
                        isinstance(v, (int, float, str))
                        for v in (mins + maxs)
                    )
                ):
                    per_col[name] = [min(mins), max(maxs)]
            if nulls:
                per_col["__nulls"] = nulls
            return f, per_col

        if len(files) <= 1:
            return dict(one_file(f) for f in files)
        with ThreadPoolExecutor(max_workers=min(16, len(files))) as ex:
            return dict(ex.map(one_file, files))

    def _commit_with_retry(self, build_manifest) -> dict:
        """Run ``build_manifest(parent_version) -> manifest`` under the
        optimistic protocol: on conflict, rebase on the new tip and retry.

        ONLY for commutative commits (appends, metadata-only deletes/DDL)
        whose manifest builder derives everything from the parent it is
        given. Read-modify-write operations must use :meth:`_commit_rmw`
        — rebasing a manifest whose DATA was computed against an older
        snapshot silently drops the concurrent commit's changes."""
        for _ in range(self.max_commit_retries):
            parent = self.current_version()
            manifest = build_manifest(parent)
            try:
                self._try_commit(parent + 1, manifest)
                return manifest
            except CommitConflict:
                time.sleep(0.01)
        raise CommitConflict(
            f"gave up after {self.max_commit_retries} rebases: {self.path}"
        )

    def _commit_rmw(self, compute) -> dict:
        """Serializable read-modify-write commit (merge / CoW delete /
        update / compaction — Iceberg's validate-and-reattempt):
        ``compute(base_version) -> (manifest, scratch_snap_ids)`` reads
        the snapshot at ``base_version`` and builds the FULL result
        manifest for ``base_version + 1``. The commit is attempted at
        exactly that version; if another writer got there first, the
        freshly-written data files are discarded and the WHOLE operation
        recomputes against the new tip — a lost update is impossible
        because the committed data always derives from its direct
        parent."""
        for _ in range(self.max_commit_retries):
            base = self.current_version()
            manifest, scratch = compute(base)
            if manifest is None:  # recompute found nothing to do
                return None
            try:
                self._try_commit(base + 1, manifest)
                return manifest
            except CommitConflict:
                for snap_id in scratch:
                    shutil.rmtree(
                        os.path.join(self.path, "data", snap_id),
                        ignore_errors=True,
                    )
                time.sleep(0.01)
        raise CommitConflict(
            f"gave up after {self.max_commit_retries} recomputes: {self.path}"
        )

    # -- table operations -----------------------------------------------------

    def _snapshot(
        self,
        op: str,
        files: list[str],
        parent: int,
        schema_json: str | None = None,
        stats: dict[str, dict] | None = None,
        file_seq: dict[str, int] | None = None,
        delete_files: list[dict] | None = None,
        partition_specs: list[dict] | None = None,
        partitions: dict[str, dict] | None = None,
        row_carry: dict | None = None,
        no_lineage: bool = False,
        delete_vectors: dict | None = None,
        **summary,
    ) -> dict:
        manifest = {
            "version": parent + 1,
            "parent": parent,
            "operation": op,
            "files": files,
            "committed_at": time.time(),
            "summary": {"added_files": summary.get("added", 0), **summary},
        }
        if schema_json is not None:
            # schema-per-snapshot enables add-column evolution: readers
            # project every file to the snapshot's declared schema
            manifest["schema"] = schema_json
        if stats is not None:
            # per-file column min/max for scan-time file skipping
            manifest["stats"] = stats
        if file_seq is not None:
            # data sequence number per file (Iceberg v2): which commit a
            # file entered the table in — equality deletes apply only to
            # rows whose file seq <= the delete's seq
            manifest["file_seq"] = file_seq
        if delete_files is not None:
            # pending merge-on-read equality deletes:
            # [{"files": [...], "seq": N, "keys": [col, ...]}, ...]
            manifest["delete_files"] = delete_files
        if partition_specs is not None:
            # hidden-partitioning layout: transform specs + per-file
            # partition tuples (for transform-aware pruning in scan())
            manifest["partition_specs"] = partition_specs
            manifest["partitions"] = partitions or {}
        # deletion vectors (Iceberg v3): per-data-file position bitmaps,
        # latest-DV-wins. None = AUTO-CARRY the parent's entries for
        # files still present — a rewritten/dropped file's DV vanishes
        # with it (every rewrite path reads survivors with deletes
        # APPLIED, so dropping the DV is the materialization, never a
        # resurrection). An explicit dict REPLACES (delete_where_dv,
        # rollback/clone restoring another snapshot's state, branch
        # commits whose parent number is branch-local).
        if delete_vectors is None and not no_lineage:
            prev_dv: dict = {}
            if parent and os.path.exists(self._manifest_path(parent)):
                prev_dv = self._read_manifest(parent).get(
                    "delete_vectors", {}
                )
            delete_vectors = prev_dv
        if delete_vectors:
            fset = set(files)
            scoped_dv = {
                f: e for f, e in delete_vectors.items() if f in fset
            }
            if scoped_dv:
                manifest["delete_vectors"] = scoped_dv
        if not no_lineage:
            self._assign_row_lineage(manifest, parent, stats, row_carry)
        return manifest

    def _assign_row_lineage(
        self,
        manifest: dict,
        parent: int,
        stats: dict[str, dict] | None,
        row_carry: dict | None,
    ) -> None:
        """Iceberg v3 row lineage, assigned at commit time: every data
        file gets a ``first_row_id`` (``row_ids[file]``) from a monotone
        table counter (``next_row_id``); a row's stable identity is
        ``first_row_id + its position in the file``, unless the file
        physically materializes a ``__row_id`` column (rewrites do —
        see :meth:`_project_with_lineage_cols`), which wins at read.
        The counter advances by each NEW file's full row count — carried
        rows inside a rewritten file burn id slots, which is exactly the
        Iceberg v3 inheritance scheme: no distributed id assignment, no
        collisions, ids never reused.

        Carry rules: files already present in the parent snapshot keep
        their base verbatim (a base never changes once assigned — data
        files are immutable and per-commit unique). ``row_carry``
        injects bases from a NON-parent lineage (rollback restores the
        target snapshot's bases; clone inherits the source's); its
        ``next_row_id`` only ever raises the counter — monotone across
        rollback. Branch-chain commits skip assignment (``no_lineage``):
        provisional branch ids would collide with main's counter, so ids
        are assigned when the branch publishes (fast_forward), exactly
        like Iceberg's commit-time inheritance."""
        prev_m: dict = {}
        if parent and os.path.exists(self._manifest_path(parent)):
            prev_m = self._read_manifest(parent)
        carry = dict(prev_m.get("row_ids") or {})
        next_id = int(prev_m.get("next_row_id", 0))
        if row_carry:
            for f, b in (row_carry.get("row_ids") or {}).items():
                carry.setdefault(f, b)
            next_id = max(next_id, int(row_carry.get("next_row_id", 0)))
        bases: dict[str, int] = {}
        fresh: list[str] = []
        for f in manifest["files"]:
            if f in carry:
                bases[f] = carry[f]
            else:
                fresh.append(f)
        for f in sorted(fresh):
            n = (stats or {}).get(f, {}).get("__rows")
            if n is None:
                # path without precomputed stats (e.g. publish of an old
                # stage): one footer/sidecar read — metadata-only
                n = LakehouseTable._file_num_rows(f)
            bases[f] = next_id
            next_id += int(n)
        manifest["row_ids"] = bases
        manifest["next_row_id"] = next_id

    @staticmethod
    def _merge_schema_json(base_json: str | None, extra_json: str | None) -> str | None:
        """Add-column schema union (the same contract ``_project_to_schema``
        reads by): ``base``'s fields keep their order and types; fields
        that exist only in ``extra`` are appended. Used wherever two
        snapshot lineages meet (branch publish, branch append) so neither
        side's schema evolution is silently reverted."""
        if base_json is None:
            return extra_json
        if extra_json is None:
            return base_json
        base = json.loads(base_json)
        extra = json.loads(extra_json)
        extra_by_name = {f["name"]: f for f in extra["fields"]}
        merged = []
        for f in base["fields"]:
            e = extra_by_name.get(f["name"])
            if e is not None and e["type"] != f["type"]:
                # Iceberg type promotion: a widening write PROMOTES the
                # declared type (int→long, float→double, decimal
                # precision); anything else raises — casting the
                # incoming values down to the declared type would wrap/
                # truncate silently, which is exactly the corruption
                # Iceberg's promotion lattice exists to forbid.
                f = {
                    **f,
                    "type": _promote_type(f["type"], e["type"], f["name"]),
                }
            merged.append(f)
        have = {f["name"] for f in base["fields"]}
        base["fields"] = merged + [
            f for f in extra["fields"] if f["name"] not in have
        ]
        return json.dumps(base)

    # -- schema DDL (Iceberg ALTER TABLE, metadata-only commits) -------------

    def _commit_schema(self, schema_json: str, **summary) -> dict:
        """Commit a new declared schema over the SAME files/stats/deletes —
        the metadata-only shape of every ALTER TABLE ... COLUMN op."""

        def build(parent: int) -> dict:
            prev = self._read_manifest(parent)
            return self._snapshot(
                "evolve-schema",
                prev["files"],
                parent,
                schema_json=schema_json,
                stats=prev.get("stats"),
                file_seq=prev.get("file_seq"),
                delete_files=prev.get("delete_files", []),
                partition_specs=prev.get("partition_specs"),
                partitions=prev.get("partitions"),
                added=0,
                **summary,
            )

        return self._commit_with_retry(build)

    def _current_schema_fields(self) -> list[dict]:
        m = self._read_manifest(self.current_version())
        if not m.get("schema"):
            raise ValueError("table has no declared schema to evolve")
        return json.loads(m["schema"])["fields"]

    def rename_column(self, old: str, new: str) -> dict:
        """Metadata-only column rename (Iceberg ``ALTER TABLE ... RENAME
        COLUMN``): no data file changes. The field keeps a ``prior_names``
        chain in its StructField metadata — the name-based stand-in for
        Iceberg's field ids — so readers coalesce historical names out of
        pre-rename files, and pending equality-delete keys written under
        the old name keep applying."""
        fields = self._current_schema_fields()
        names = [f["name"] for f in fields]
        if old not in names:
            raise ValueError(f"no such column: {old!r}")
        if new in names:
            raise ValueError(f"column exists: {new!r}")
        for f in fields:
            if f["name"] == old:
                md = f.get("metadata") or {}
                md["prior_names"] = md.get("prior_names", []) + [old]
                f["metadata"] = md
                f["name"] = new
        return self._commit_schema(
            json.dumps({"type": "struct", "fields": fields}),
            renamed_from=old,
            renamed_to=new,
        )

    def drop_column(self, name: str) -> dict:
        """Metadata-only column drop: the field leaves the declared schema;
        data files keep the bytes (time travel still reads them) but no
        current-version reader sees the column. Limitation of name-based
        mapping (vs Iceberg field ids): re-adding the SAME name later
        resurrects pre-drop values — see :meth:`add_column`."""
        fields = self._current_schema_fields()
        if name not in [f["name"] for f in fields]:
            raise ValueError(f"no such column: {name!r}")
        return self._commit_schema(
            json.dumps(
                {
                    "type": "struct",
                    "fields": [f for f in fields if f["name"] != name],
                }
            ),
            dropped_column=name,
        )

    def add_column(
        self, name: str, spark_type: str, default=None
    ) -> dict:
        """Metadata-only column add. Without ``default``, existing files
        surface NULL (the add-column contract _project_to_schema
        already enforces). With ``default`` (Iceberg v3 DEFAULT column
        values, spec's ``initial-default``/``write-default`` field
        attributes): files written BEFORE the column existed read the
        default back (both the mapInPandas read path and the DSv2 Arrow
        reader), and subsequent writes that OMIT the column materialize
        the current write-default into their files. ``initial-default``
        is immutable after the add (Iceberg rule — it defines what old
        data MEANS); ``write-default`` evolves via
        :meth:`set_column_default` / :meth:`drop_column_default`.

        ``spark_type`` is a DDL type string ('double', 'string', ...).
        ``default`` must be a JSON-primitive literal (int, float, str,
        bool; dates/timestamps as ISO strings matching the declared
        type). Name-based caveat: if ``name`` was dropped earlier, old
        files' values resurrect (Iceberg's field ids would keep them
        NULL)."""
        from pyspark.sql import types as T

        fields = self._current_schema_fields()
        if name in [f["name"] for f in fields]:
            raise ValueError(f"column exists: {name!r}")
        md = {}
        if default is not None:
            _check_default_literal(default, name)
            md = {"initial_default": default, "write_default": default}
        new_field = T.StructField(
            name, T._parse_datatype_string(spark_type), metadata=md
        ).jsonValue()
        return self._commit_schema(
            json.dumps({"type": "struct", "fields": fields + [new_field]}),
            added_column=name,
            **({"column_default": default} if default is not None else {}),
        )

    def set_column_default(self, name: str, default) -> dict:
        """Change a column's WRITE-default (Iceberg ``ALTER TABLE ...
        ALTER COLUMN ... SET DEFAULT``): future writes that omit the
        column materialize the new value. The ``initial-default`` — what
        pre-add files read back — is immutable and unaffected, exactly
        the v3 spec split (changing it would retroactively rewrite
        history's meaning)."""
        _check_default_literal(default, name)
        fields = self._current_schema_fields()
        if name not in [f["name"] for f in fields]:
            raise ValueError(f"no such column: {name!r}")
        for f in fields:
            if f["name"] == name:
                md = f.get("metadata") or {}
                md["write_default"] = default
                f["metadata"] = md
        return self._commit_schema(
            json.dumps({"type": "struct", "fields": fields}),
            default_column=name,
            column_default=default,
        )

    def drop_column_default(self, name: str) -> dict:
        """Clear a column's write-default (``ALTER COLUMN ... DROP
        DEFAULT``): future writes that omit the column write explicit
        NULLs (materialized, so they stay distinguishable from pre-add
        files, whose rows keep reading the immutable initial-default)."""
        fields = self._current_schema_fields()
        if name not in [f["name"] for f in fields]:
            raise ValueError(f"no such column: {name!r}")
        for f in fields:
            if f["name"] == name:
                md = f.get("metadata") or {}
                md["write_default"] = None
                f["metadata"] = md
        return self._commit_schema(
            json.dumps({"type": "struct", "fields": fields}),
            default_dropped=name,
        )

    def column_defaults(self) -> dict:
        """{column: {"initial_default": v, "write_default": v}} for every
        declared column carrying a default attribute — the introspection
        surface (feeds the schema-evolution report)."""
        out: dict = {}
        for f in self._current_schema_fields():
            md = f.get("metadata") or {}
            if "initial_default" in md or "write_default" in md:
                out[f["name"]] = {
                    "initial_default": md.get("initial_default"),
                    "write_default": md.get("write_default"),
                }
        return out

    def _apply_write_defaults(self, df: DataFrame) -> DataFrame:
        """Materialize the current write-default into a write that OMITS
        a defaulted column (Iceberg v3 writer rule). Columns with a
        dropped write-default materialize explicit NULL — either way the
        file physically CONTAINS the column, so at read time
        column-absent still unambiguously means written-before-add
        (name-based resolution has no field ids to consult). Plain
        columns without default attributes keep the existing contract
        (absent column = NULL at read, nothing materialized)."""
        v = self.current_version()
        if not v:
            return df
        sj = self._read_manifest(v).get("schema")
        if not sj:
            return df
        from pyspark.sql import types as T

        have = set(df.columns)
        add = []
        for f in json.loads(sj)["fields"]:
            md = f.get("metadata") or {}
            if f["name"] in have:
                continue
            if "initial_default" in md or "write_default" in md:
                dt = T.StructType.fromJson(
                    {"type": "struct", "fields": [f]}
                ).fields[0].dataType
                lit = F.lit(md.get("write_default"))
                col = (
                    F.parse_json(lit.cast("string"))
                    if isinstance(dt, T.VariantType)
                    else lit.cast(dt)
                )
                add.append(col.alias(f["name"]))
        return df.select("*", *add) if add else df

    def update_column_type(self, name: str, spark_type: str) -> dict:
        """Metadata-only type widening (Iceberg ``ALTER TABLE ... ALTER
        COLUMN ... TYPE``): the declared type moves UP its promotion
        chain (int→long, float→double, decimal precision at equal
        scale); anything else raises. No data files change — readers
        upcast old files' values losslessly via the declared-schema
        projection, and subsequent appends may write the wider type
        directly."""
        from pyspark.sql import types as T

        fields = self._current_schema_fields()
        if name not in [f["name"] for f in fields]:
            raise ValueError(f"no such column: {name!r}")
        new_t = T._parse_datatype_string(spark_type).jsonValue()
        for f in fields:
            if f["name"] == name:
                if f["type"] != new_t:
                    promoted = _promote_type(f["type"], new_t, name)
                    if promoted != new_t:
                        raise ValueError(
                            f"column {name!r}: {spark_type!r} would "
                            f"NARROW the declared type {f['type']!r}"
                        )
                    f["type"] = promoted
        return self._commit_schema(
            json.dumps({"type": "struct", "fields": fields}),
            widened_column=name,
            widened_to=spark_type,
        )

    def overwrite(
        self,
        df: DataFrame,
        partition_by: list[str] | None = None,
        distribution: str | None = None,
        variant_shred: dict | None = None,
        geo_cols: list[str] | None = None,
    ) -> dict:
        """Full-replace snapshot — the reference's only write mode
        (``mode("overwrite").saveAsTable``, etl.py:51-54).
        ``distribution="hash"`` clusters rows to one file per partition
        tuple (see :meth:`_write_data_files`). Persistent CHECK
        constraints are enforced before any file is written.

        ``geo_cols`` declares WKB-binary geometry columns (Iceberg v3
        geo types; see functions/geo.py) — stored in the ``geo.columns``
        table property, so EVERY later write (appends, CoW rewrites,
        compaction) materializes the ``__geo_*`` envelope shreds that
        power ``scan(geo_bbox=...)`` file skipping. Declared at
        overwrite time because a full replace is the one write that
        guarantees every live file carries the shreds from day one."""
        from pyspark.sql import types as T

        if geo_cols:
            missing = [c for c in geo_cols if c not in df.columns]
            if missing:
                raise ValueError(f"geo_cols not in frame: {missing}")
            bad = [
                c
                for c in geo_cols
                if not isinstance(df.schema[c].dataType, T.BinaryType)
            ]
            if bad:
                raise ValueError(
                    f"geo_cols must be WKB binary columns: {bad}"
                )
            self.set_property("geo.columns", ",".join(geo_cols))
        self._enforce_constraints(df)
        distribution = self._resolve_distribution(
            distribution, partition_by
        )
        logical_json = df.schema.json()
        df = self._apply_write_sort(df)
        df = self._add_variant_shreds(df, variant_shred)
        _, files = self._write_data_files(df, partition_by, distribution)
        stats = self._collect_file_stats(files)
        specs = [
            PartitionSpec.parse(s).__dict__ for s in (partition_by or [])
        ]
        return self._commit_with_retry(
            lambda parent: self._snapshot(
                "overwrite",
                files,
                parent,
                schema_json=logical_json,
                stats=stats,
                file_seq={f: parent + 1 for f in files},
                delete_files=[],
                partition_specs=specs if partition_by else None,
                partitions=self._file_partitions(files) if partition_by else None,
                added=len(files),
            )
        )

    # -- persistent CHECK constraints (Delta's ALTER TABLE ADD CONSTRAINT) ----
    #
    # Stored table-level in refs/-style metadata, NOT in snapshots:
    # constraints are table CONFIG, and carrying them through every one
    # of the ~19 snapshot-building paths would recreate the
    # partition-layout-erosion bug class (CLAUDE.md). The write paths
    # consult the store at write time; history stays time-travelable.

    @property
    def _constraints_path(self) -> str:
        return os.path.join(self.path, "constraints.json")

    # -- table properties (Iceberg TBLPROPERTIES) ---------------------------
    #
    # Table-level CONFIG, stored like constraints (sidecar file, atomic
    # replace, never in snapshots — carrying config through every
    # snapshot path is the partition-layout-erosion bug class). Known
    # keys DRIVE ENGINE BEHAVIOR; unknown keys are free-form metadata
    # (Iceberg's convention). Explicit method arguments always win over
    # properties, which win over the engine defaults below.

    PROPERTY_DEFAULTS = {
        # 'hash' clusters partitioned writes to one file per tuple
        # (Iceberg write.distribution-mode)
        "write.distribution-mode": "none",
        # merge_into broadcasts the source below this row count
        "write.merge.broadcast-threshold-rows": "100000",
        # DV decode: at or below this many dead rows the driver decodes
        # bitmaps locally; above it the decode fans out via mapInPandas
        "read.dv.inline-threshold-rows": "100000",
        # changelog(row_level=True) broadcast decomposition threshold
        "changelog.broadcast-threshold-rows": "100000",
        # expire_snapshots retention floor (Iceberg
        # history.expire.min-snapshots-to-keep)
        "history.expire.min-snapshots-to-keep": "1",
    }

    # merge-on-commit: fold small manifest parts into the commit's new
    # part once this many are carried (Iceberg
    # commit.manifest.min-count-to-merge) — bounds manifest reads at
    # O(threshold) part files instead of O(commits). Overridable per
    # table via set_property under the same key; deliberately NOT in
    # PROPERTY_DEFAULTS (the declared properties-report query
    # enumerates that map, and its oracle hash is frozen).
    MANIFEST_MERGE_MIN_COUNT = 100

    @property
    def _properties_path(self) -> str:
        return os.path.join(self.path, "properties.json")

    def properties(self) -> dict[str, str]:
        """Explicitly SET properties (the stored map). Effective values
        — stored, else engine default — come from :meth:`property`."""
        if not os.path.exists(self._properties_path):
            return {}
        with open(self._properties_path) as f:
            try:
                return json.load(f)
            except ValueError as ex:
                raise ValueError(
                    f"properties store {self._properties_path!r} is "
                    "unparseable; restore or delete it explicitly"
                ) from ex

    def get_property(self, key: str) -> str | None:
        """Effective value: stored, falling back to the engine default
        for known behavior keys (None for unset free-form keys).
        (Named get_property, not property — a method named ``property``
        would shadow the builtin decorator for the rest of the class
        body.)"""
        return self.properties().get(key, self.PROPERTY_DEFAULTS.get(key))

    def set_property(self, key: str, value) -> None:
        """``ALTER TABLE ... SET TBLPROPERTIES``. Known behavior keys
        are validated on write (a typo'd VALUE must fail here, not
        misconfigure every later operation); unknown keys are free-form
        table metadata."""
        value = str(value)
        if key == "write.distribution-mode":
            if value not in ("none", "hash"):
                raise ValueError(
                    f"{key}: {value!r} not in ('none', 'hash')"
                )
        elif key in ("geo.columns", "write.sort-by"):
            cols = [c for c in value.split(",") if c]
            if not cols or any(not c.isidentifier() for c in cols):
                raise ValueError(
                    f"{key}: {value!r} must be a comma-separated list "
                    "of column names"
                )
        elif key in self.PROPERTY_DEFAULTS:
            if not value.isdigit():
                raise ValueError(
                    f"{key}: {value!r} is not a non-negative integer"
                )
        props = self.properties()
        props[key] = value
        os.makedirs(self.path, exist_ok=True)
        _publish_sidecar(self._properties_path, props)

    def unset_property(self, key: str) -> None:
        """``ALTER TABLE ... UNSET TBLPROPERTIES`` — behavior keys
        revert to the engine default."""
        props = self.properties()
        props.pop(key, None)
        _publish_sidecar(self._properties_path, props)

    def _int_property(self, key: str) -> int:
        return int(self.get_property(key))

    # -- table encryption (Iceberg v3 encryption pillar) ---------------------
    #
    # Envelope scheme (see sources/encryption.py): per-file random data
    # keys wrap under the caller-held TABLE key; wrapped keys + plaintext
    # stats + schema live in per-file sidecars under <table>/keys/. The
    # properties sidecar records only key METADATA (enabled flag, key id,
    # a verifier so a wrong key fails loudly before any data read) — the
    # table key itself is never persisted anywhere.

    def enable_encryption(
        self, key: bytes | str, key_id: str = "k1",
        mode: str | None = None,
    ) -> None:
        """Turn on encryption for every subsequent write. Existing
        plaintext files keep reading (per-file magic sniff);
        ``rewrite_data_files()`` re-encrypts them. Refused when the
        table already has a DIFFERENT key enabled (rotate instead).
        Re-enabling with the SAME key keeps the current write mode
        unless ``mode`` is explicitly passed (ADVICE r10: the default
        used to silently downgrade a PME table back to envelope) and
        arms this handle's key.

        ``mode``: ``"envelope"`` (whole-file AES-GCM container) or
        ``"pme"`` (Parquet Modular Encryption — per-column data keys,
        encrypted footer; keeps intra-file column projection, see
        sources/encryption.py). ``None`` (default) = keep current mode,
        or ``"envelope"`` for a first enable. Readers sniff per file,
        so a table may carry both layouts mid-history."""
        from . import encryption as E

        if mode is not None and mode not in E.ENC_MODES:
            raise ValueError(
                f"lakehouse encryption: unknown mode {mode!r} "
                f"(expected one of {E.ENC_MODES})"
            )
        k = E.normalize_table_key(key)
        if self.get_property("encryption.enabled") == "true":
            E.check_verifier(
                json.loads(self.get_property("encryption.verifier")), k
            )
            if mode is not None and mode != (
                self.get_property("encryption.mode") or "envelope"
            ):
                self.set_property("encryption.mode", mode)
            self.encryption_key = k
            return
        self.set_property("encryption.verifier", json.dumps(E.make_verifier(k)))
        self.set_property("encryption.key-id", key_id)
        self.set_property("encryption.mode", mode or "envelope")
        self.set_property("encryption.enabled", "true")
        self.encryption_key = k

    def _encryption_on(self) -> bool:
        return self.get_property("encryption.enabled") == "true"

    def _enc_key(self) -> bytes | None:
        """The validated table key, or None for plaintext tables.
        Encrypted table + missing/wrong key = loud failure."""
        if not self._encryption_on():
            return None
        from . import encryption as E

        if self.encryption_key is None:
            raise ValueError(
                "lakehouse encryption: this table is encrypted — pass "
                "encryption_key= to LakehouseTable (the table key is "
                "never stored with the table)"
            )
        k = E.normalize_table_key(self.encryption_key)
        E.check_verifier(
            json.loads(self.get_property("encryption.verifier")), k
        )
        return k

    def rotate_table_key(
        self, new_key: bytes | str, new_key_id: str | None = None
    ) -> int:
        """Rewrap every per-file data key under ``new_key`` — O(files)
        sidecar rewrites, ZERO data bytes touched, and every historical
        snapshot stays readable (data keys never change). Returns the
        number of rewrapped sidecars. The old key stops working
        immediately (verifier replaced atomically last)."""
        from . import encryption as E

        old = self._enc_key()
        if old is None:
            raise ValueError(
                "lakehouse encryption: table is not encrypted"
            )
        new = E.normalize_table_key(new_key)
        n = 0
        for sp in glob.glob(os.path.join(self.path, "keys", "*.json")):
            with open(sp) as f:
                meta = json.load(f)
            data_key = E.unwrap_key(meta["key"], old)
            meta["key"] = E.wrap_key(data_key, new)
            if new_key_id:
                meta["key_id"] = new_key_id
            _publish_sidecar(sp, meta)
            n += 1
        self.set_property(
            "encryption.verifier", json.dumps(E.make_verifier(new))
        )
        if new_key_id:
            self.set_property("encryption.key-id", new_key_id)
        self.encryption_key = new
        return n

    def _resolve_distribution(
        self, distribution: str | None, partition_by
    ) -> str | None:
        """Explicit argument wins; else the table's
        ``write.distribution-mode`` property drives partitioned
        writes."""
        if distribution is not None or not partition_by:
            return distribution
        mode = self.get_property("write.distribution-mode")
        return "hash" if mode == "hash" else None

    def check_constraints(self) -> dict[str, str]:
        if not os.path.exists(self._constraints_path):
            return {}
        with open(self._constraints_path) as f:
            try:
                return json.load(f)
            except ValueError as ex:
                # a corrupt store must not silently disable enforcement
                # OR break every write with an opaque JSON stack
                raise ValueError(
                    f"constraints store {self._constraints_path!r} is "
                    "unparseable (crash mid-write before the atomic-"
                    "replace fix, or external edit); restore or delete "
                    "it explicitly"
                ) from ex

    def add_check_constraint(self, name: str, expr_sql: str) -> None:
        """Persist a CHECK constraint (SQL boolean expression over the
        table's columns). EXISTING data is validated first — adding a
        constraint the current snapshot violates raises (Delta's
        behavior) — then every subsequent ``append``/``overwrite``
        enforces it automatically: violating writes raise BEFORE any
        commit, listing the violation count per constraint. NULL
        evaluations count as violations (a constraint that cannot be
        evaluated is not satisfied — the append_with_constraints
        rule)."""
        if self.current_version():
            bad = self.read().filter(
                ~F.coalesce(F.expr(expr_sql), F.lit(False))
            ).count()
            if bad:
                raise ValueError(
                    f"cannot add constraint {name!r}: {bad} existing "
                    "rows violate it"
                )
        cons = self.check_constraints()
        cons[name] = expr_sql
        os.makedirs(self.path, exist_ok=True)
        self._write_constraints(cons)

    def drop_check_constraint(self, name: str) -> None:
        cons = self.check_constraints()
        cons.pop(name, None)
        self._write_constraints(cons)

    def _write_constraints(self, cons: dict[str, str]) -> None:
        """Atomic replace (ADVICE r5): an in-place open('w') left a
        window where a crash mid-write corrupted the store and broke
        every subsequent write — temp file + os.replace, like the
        manifest commit path."""
        tmp = self._constraints_path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(cons, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._constraints_path)

    def _enforce_constraints(self, df: DataFrame) -> None:
        # write-path validation: lineage column names are reserved —
        # a user column named __row_id would be read back as MATERIALIZED
        # row lineage and silently corrupt identity tracking
        self._reject_reserved_cols(df)
        cons = self.check_constraints()
        if not cons:
            return
        counts = df.agg(
            *[
                F.sum(
                    F.when(
                        F.coalesce(F.expr(sql), F.lit(False)), 0
                    ).otherwise(1)
                ).alias(name)
                for name, sql in cons.items()
            ]
        ).first()
        bad = {n: counts[n] for n in cons if counts[n]}
        if bad:
            raise ValueError(
                "CHECK constraint violation — write refused: "
                + ", ".join(f"{n}: {c} rows" for n, c in bad.items())
            )

    @staticmethod
    def _reject_reserved_cols(df: DataFrame) -> None:
        bad = {"__row_id", "__last_updated"} & set(df.columns)
        if bad:
            raise ValueError(
                f"column names {sorted(bad)} are reserved for row-lineage "
                "materialization — rename them before writing"
            )
        shredded = [
            c
            for c in df.columns
            if c.startswith("__geo_") or c.startswith("__shred_")
        ]
        if shredded:
            raise ValueError(
                f"column names {sorted(shredded)} use reserved physical "
                "stat-column prefixes (__geo_/__shred_) — rename them "
                "before writing"
            )

    def append(
        self,
        df: DataFrame,
        partition_by: list[str] | None = None,
        summary_extra: dict | None = None,
        distribution: str | None = None,
        variant_shred: dict | None = None,
    ) -> dict:
        """Additive snapshot: new files + every file of the parent version.
        Data files are written ONCE before the commit loop — a rebase after
        a lost race only re-reads the parent manifest, it never rewrites
        data (Iceberg's fast-append behavior). ``summary_extra`` entries
        land in the commit summary (Iceberg snapshot summary properties
        — e.g. a streaming sink's batch id, see streaming.sinks).
        ``distribution="hash"`` clusters rows to one file per partition
        tuple (see :meth:`_write_data_files`). Persistent CHECK
        constraints (:meth:`add_check_constraint`) are enforced before
        any file is written."""
        df = self._apply_write_defaults(df)
        self._enforce_constraints(df)
        distribution = self._resolve_distribution(
            distribution, partition_by
        )
        # the DECLARED schema is the logical one: VARIANT stays variant
        # (physically JSON, see _encode_variant_cols) and shredded stat
        # columns never enter it
        logical_json = df.schema.json()
        df = self._apply_write_sort(df)
        df = self._add_variant_shreds(df, variant_shred)
        _, files = self._write_data_files(df, partition_by, distribution)
        new_stats = self._collect_file_stats(files)

        new_parts = self._file_partitions(files)

        def build(parent: int) -> dict:
            prev_manifest = self._read_manifest(parent) if parent else {}
            prev = prev_manifest.get("files", [])
            stats = {**prev_manifest.get("stats", {}), **new_stats}
            seq = {
                **prev_manifest.get("file_seq", {}),
                **{f: parent + 1 for f in files},
            }
            # partition-spec evolution (Iceberg's spec-per-file design):
            # an append may use a DIFFERENT layout than earlier snapshots.
            # The manifest accumulates every spec ever used; each file's
            # partition tuple names only its own spec's fields, and
            # _partition_prune conservatively keeps files that lack a
            # spec's field — so old-layout files are pruned by the old
            # spec, new-layout files by the new, never incorrectly.
            specs = prev_manifest.get("partition_specs")
            new_specs = [
                PartitionSpec.parse(s).__dict__ for s in (partition_by or [])
            ]
            if specs is None:
                specs = new_specs or None
            else:
                specs = specs + [d for d in new_specs if d not in specs]
            return self._snapshot(
                "append",
                prev + files,
                parent,
                # add-column union, not wholesale replacement: appending a
                # frame NARROWER than the table must not drop the table's
                # extra columns (Iceberg appends never un-evolve a schema)
                schema_json=self._merge_schema_json(
                    prev_manifest.get("schema"), logical_json
                ),
                stats=stats,
                file_seq=seq,
                # appended rows postdate every pending delete (their file
                # seq is the new version), so deletes carry over untouched
                delete_files=prev_manifest.get("delete_files", []),
                partition_specs=specs,
                partitions=(
                    {**prev_manifest.get("partitions", {}), **new_parts}
                    if specs is not None
                    else None
                ),
                added=len(files),
                **(summary_extra or {}),
            )

        return self._commit_with_retry(build)

    def append_with_constraints(
        self,
        df: DataFrame,
        constraints: dict[str, F.Column],
        quarantine: "LakehouseTable | None" = None,
        summary_extra: dict | None = None,
    ) -> dict:
        """Constraint-gated append (Delta CHECK constraints / DLT
        expectations): every row is evaluated against each named
        predicate; rows failing ANY constraint are diverted to the
        ``quarantine`` table (dead-letter, with a ``violated_constraints``
        column naming the failures) instead of committing, and the main
        commit's summary records per-constraint violation counts — the
        write-side enforcement the reference's pipeline lacks entirely
        (its silver layer accepts whatever bronze emitted).

        A NULL predicate result counts as a violation (CHECK semantics
        would pass NULL; expectation semantics — enforced here — treat
        "can't prove valid" as invalid, which is what a dead-letter
        queue needs).

        Scale: one evaluation pass row-local to the writer tasks (the
        input is pinned with localCheckpoint so valid/quarantine splits
        and counts read ONE materialization, not three recomputes);
        violation counting is a partial-combined aggregation over the
        tiny exploded (constraint) key space. Two table commits (main +
        quarantine), each the normal O(added) append protocol.

        The two commits are NOT one atomic transaction (they are
        independent tables). Ordering (ADVICE r3): the MAIN append
        commits first, quarantine after — if the main commit fails
        (contention, IO) nothing is dead-lettered and the whole call
        retries cleanly. The residual window is the opposite one (main
        landed, quarantine write failed): the main summary still
        records ``quarantined_rows``/``constraint_violations``, so the
        discrepancy is detectable by reconciling the summary against
        the DLQ row count."""
        if not constraints:
            raise ValueError("constraints must be a non-empty dict")
        marked = df.withColumn(
            "_violations",
            F.array_compact(
                F.array(
                    *[
                        F.when(
                            ~F.coalesce(cond, F.lit(False)), F.lit(name)
                        )
                        for name, cond in sorted(constraints.items())
                    ]
                )
            ),
        ).localCheckpoint()
        try:
            valid = marked.filter(F.size("_violations") == 0).drop(
                "_violations"
            )
            invalid = marked.filter(F.size("_violations") > 0)
            counts = {
                r["c"]: r["n"]
                for r in invalid.select(
                    F.explode("_violations").alias("c")
                )
                .groupBy("c")
                .agg(F.count("*").alias("n"))
                .collect()
            }
            n_invalid = int(invalid.count())
            # main append FIRST: a failed main commit must not leave
            # rows already dead-lettered (a retry would re-quarantine
            # them — duplicate DLQ entries with no idempotence key)
            result = self.append(
                valid,
                summary_extra={
                    "constraint_violations": counts,
                    "quarantined_rows": n_invalid,
                    **(summary_extra or {}),
                },
            )
            if quarantine is not None and n_invalid:
                quarantine.append(
                    invalid.withColumn(
                        "violated_constraints",
                        F.concat_ws(",", "_violations"),
                    ).drop("_violations")
                )
            return result
        finally:
            marked.unpersist()

    def add_files(self, files: list[str]) -> dict:
        """Adopt EXISTING parquet files into the table by reference —
        Iceberg ``CALL system.add_files`` / the migrate path: a
        metadata-only append that records paths, footer stats, and
        sequence numbers WITHOUT copying a byte. This is how a 100 TB
        directory becomes a governed table in seconds.

        The adopted files live outside the table's ``data/`` root: every
        GC pass (expire_snapshots, remove_orphan_files, drop_branch)
        only ever deletes under ``data/``, so external files are never
        reclaimed — dropping the reference is the only outcome of
        expiry, exactly as Iceberg treats imported files. Readers,
        stats pruning, MoR deletes, and compaction treat them like any
        other data file (compaction REWRITES them into table-owned
        files, completing a zero-downtime migration)."""
        for f in files:
            if not os.path.exists(f):
                raise FileNotFoundError(f)
        stats = self._collect_file_stats(files)
        schema_json = self.spark.read.parquet(*files).schema.json()

        def build(parent: int) -> dict:
            prev_manifest = self._read_manifest(parent) if parent else {}
            prev = prev_manifest.get("files", [])
            return self._snapshot(
                "add-files",
                prev + files,
                parent,
                schema_json=self._merge_schema_json(
                    prev_manifest.get("schema"), schema_json
                ),
                stats={**prev_manifest.get("stats", {}), **stats},
                file_seq={
                    **prev_manifest.get("file_seq", {}),
                    **{f: parent + 1 for f in files},
                },
                delete_files=prev_manifest.get("delete_files", []),
                partition_specs=prev_manifest.get("partition_specs"),
                partitions=prev_manifest.get("partitions"),
                added=len(files),
                imported=True,
            )

        return self._commit_with_retry(build)

    # -- named refs (Iceberg tags) --------------------------------------------

    @property
    def _refs_dir(self) -> str:
        return os.path.join(self.path, "refs")

    def tag(self, name: str, version: int | None = None) -> int:
        """Pin a human-readable name to a snapshot (Iceberg tags:
        ``ALTER TABLE ... CREATE TAG``): 'audited-2026-08', 'training-v3'.
        Tagged snapshots are retention anchors — ``expire_snapshots``
        keeps them — and ``read(version="name")`` time-travels by name,
        so a training run can cite the exact table state it consumed."""
        v = self.current_version() if version is None else version
        if not os.path.exists(self._manifest_path(v)):
            raise ValueError(f"cannot tag missing version {v}")
        os.makedirs(self._refs_dir, exist_ok=True)
        with open(os.path.join(self._refs_dir, f"{name}.json"), "w") as f:
            json.dump({"version": v}, f)
        return v

    def tags(self) -> dict[str, int]:
        out = {}
        for p in glob.glob(os.path.join(self._refs_dir, "*.json")):
            if os.path.basename(p).startswith("branch-"):
                continue  # branch refs live in the same dir (branches())
            with open(p) as f:
                out[os.path.basename(p)[:-5]] = json.load(f)["version"]
        return out

    def drop_tag(self, name: str) -> None:
        """Remove a tag ref (Iceberg ``ALTER TABLE ... DROP TAG``). The
        snapshot it pinned becomes eligible for normal retention on the
        next ``expire_snapshots`` — dropping the auto-tag left by
        :meth:`clone` is how a deleted clone releases its hold on the
        source's files."""
        p = os.path.join(self._refs_dir, f"{name}.json")
        if name not in self.tags():
            raise ValueError(f"unknown tag: {name!r}")
        os.unlink(p)

    def clone(self, dest_path: str) -> "LakehouseTable":
        """Shallow (zero-copy) clone — Delta ``CREATE TABLE ... SHALLOW
        CLONE`` / an Iceberg snapshot-table: the destination's first
        manifest references the SOURCE's current data files verbatim; no
        byte of data is copied, the commit is O(metadata). Writes to
        either table never affect the other (the clone's commits make
        new files under its own path; copy-on-write rewrites in the
        clone re-home rows as they're touched).

        GC safety is two-sided: the clone's own ``expire_snapshots`` /
        ``remove_orphan_files`` only ever delete under the CLONE's data
        dir (source-owned files are outside it), and the source is
        auto-tagged (``clone-<id>``) at the cloned version so the
        source's expire retains the shared files — drop that tag
        (:meth:`drop_tag`) when the clone is deleted. The clone's
        history starts at the cloned version number (time travel below
        it raises — same visible contract as Iceberg's snapshot tables).

        Scale: cloning a 10^6-file table writes kilobytes of manifest
        parts — the zero-copy dev/test-environment and experimentation
        primitive; pair with branches when the fork should later publish
        back instead of diverging."""
        v = self.current_version()
        if v == 0:
            raise ValueError("cannot clone an empty table")
        if os.path.abspath(dest_path) == os.path.abspath(self.path):
            raise ValueError("clone destination is the source table")
        dest = LakehouseTable(self.spark, dest_path)
        if dest.current_version() != 0:
            raise ValueError(f"clone destination exists: {dest_path!r}")
        m = self._read_manifest(v)
        tag_name = f"clone-{uuid.uuid4().hex[:8]}"
        self.tag(tag_name, v)
        manifest = dest._snapshot(
            "clone",
            m["files"],
            v - 1,  # commit lands at the SOURCE's version number
            schema_json=m.get("schema"),
            stats=m.get("stats"),
            # keep source sequence numbers verbatim: pending MoR deletes
            # (also carried) pair with them, and future clone-side deletes
            # get seq > v, strictly above every inherited file
            file_seq=m.get("file_seq"),
            delete_files=m.get("delete_files", []),
            # DV containers, like data files, are shared by absolute
            # path (zero-copy); the retention tag protects them from
            # source-side GC exactly like the data files
            delete_vectors=m.get("delete_vectors", {}),
            partition_specs=m.get("partition_specs"),
            partitions=m.get("partitions"),
            added=0,
            cloned_from=self.path,
            cloned_version=v,
            source_retention_tag=tag_name,
            # inherit the source's row lineage wholesale: shared files
            # keep their bases, and the clone's counter starts past the
            # source's so clone-side inserts never reuse an id
            row_carry={
                "row_ids": m.get("row_ids"),
                "next_row_id": m.get("next_row_id", 0),
            },
        )
        dest._try_commit(v, manifest)
        # table properties travel with the clone (Delta shallow-clone
        # behavior) — load-bearing for geometry tables: 'geo.columns'
        # drives shred materialization on every clone-side write, so
        # dropping it would silently degrade geo_bbox scans there
        props = self.properties()
        if props:
            _publish_sidecar(dest._properties_path, props)
        return dest

    def _resolve_version(self, version: int | str | None) -> int:
        if version is None:
            return self.current_version()
        if isinstance(version, str):
            refs = self.tags()
            if version not in refs:
                raise ValueError(f"unknown tag: {version!r}")
            return refs[version]
        return version

    # -- branches (Iceberg branch refs) ---------------------------------------

    def _branch_dir(self, name: str) -> str:
        return os.path.join(self._snap_dir, f"branch-{name}")

    def _branch_ref_path(self, name: str) -> str:
        return os.path.join(self._refs_dir, f"branch-{name}.json")

    def _branch_head(self, name: str) -> int:
        versions = [
            int(os.path.basename(p)[1:-5])
            for p in glob.glob(os.path.join(self._branch_dir(name), "v*.json"))
        ]
        return max(versions, default=0)

    def _branch_base(self, name: str) -> int:
        with open(self._branch_ref_path(name)) as f:
            return json.load(f)["base_version"]

    def branches(self) -> dict[str, dict]:
        """name → {'base_version', 'head'} for every live branch."""
        out = {}
        for p in glob.glob(os.path.join(self._refs_dir, "branch-*.json")):
            name = os.path.basename(p)[len("branch-"):-5]
            out[name] = {
                "base_version": self._branch_base(name),
                "head": self._branch_head(name),
            }
        return out

    def create_branch(self, name: str, version: int | None = None) -> int:
        """Fork a named branch from a snapshot (default: current tip) —
        Iceberg ``ALTER TABLE ... CREATE BRANCH``. Branch commits are
        invisible to main readers until :meth:`fast_forward` publishes
        them: the write-audit-publish pattern generalized to MULTIPLE
        staged commits (cf. stage_append, the single-commit form)."""
        v = self.current_version() if version is None else version
        if not os.path.exists(self._manifest_path(v)):
            raise ValueError(f"cannot branch from missing version {v}")
        if os.path.exists(self._branch_ref_path(name)):
            raise ValueError(f"branch exists: {name!r}")
        os.makedirs(self._refs_dir, exist_ok=True)
        with open(self._branch_ref_path(name), "w") as f:
            json.dump({"base_version": v}, f)
        return v

    def append_branch(self, name: str, df: DataFrame) -> dict:
        """Branch-local append commit: same optimistic create-exclusive
        protocol as main, in the branch's own version namespace. Main's
        tip is untouched; concurrent branch committers race on the
        branch-chain file exactly as main committers race on v{N}."""
        base = self._branch_base(name)  # raises if branch missing
        self._reject_reserved_cols(df)
        _, files = self._write_data_files(df)
        new_stats = self._collect_file_stats(files)
        for _ in range(self.max_commit_retries):
            head = self._branch_head(name)
            prev = (
                self._read_branch_manifest(name, head)
                if head
                else self._read_manifest(base)
            )
            manifest = self._snapshot(
                "append",
                prev.get("files", []) + files,
                head,
                schema_json=self._merge_schema_json(
                    prev.get("schema"), df.schema.json()
                ),
                stats={**prev.get("stats", {}), **new_stats},
                # Same carry-through contract as main's append(): the fork
                # point may hold pending MoR equality deletes — a branch
                # read must still apply them, and branch-appended rows
                # must postdate them. Branch file seqs start past the
                # base version so no delete forked from main (seq <= base)
                # can ever claim a branch-appended row.
                file_seq={
                    **prev.get("file_seq", {}),
                    **{f: base + head + 1 for f in files},
                },
                delete_files=prev.get("delete_files", []),
                # no_lineage skips auto-carry (parent is branch-local):
                # carry the fork point's DVs explicitly
                delete_vectors=prev.get("delete_vectors", {}),
                partition_specs=prev.get("partition_specs"),
                partitions=prev.get("partitions"),
                added=len(files),
                branch=name,
                base_version=base,
                # branch-chain manifests carry NO row lineage: `head` is a
                # branch-local version (main's v{head} is a different
                # snapshot), and provisional branch ids would collide with
                # ids main assigns meanwhile — fast_forward assigns real
                # ids at publish, Iceberg's commit-time inheritance
                no_lineage=True,
            )
            try:
                self._try_commit(
                    head + 1,
                    manifest,
                    path=os.path.join(
                        self._branch_dir(name), f"v{head + 1}.json"
                    ),
                )
                return manifest
            except CommitConflict:
                time.sleep(0.01)
        raise CommitConflict(f"branch {name}: gave up after retries")

    def _read_branch_manifest(self, name: str, version: int) -> dict:
        with open(
            os.path.join(self._branch_dir(name), f"v{version}.json")
        ) as f:
            return self._materialize_manifest(json.load(f))

    def read_branch(self, name: str) -> DataFrame:
        """The table as the branch sees it: its base snapshot plus every
        branch commit. Frozen against main — commits to main after the
        fork do NOT appear (branch isolation)."""
        head = self._branch_head(name)
        if head == 0:
            return self.read(version=self._branch_base(name))
        return self._project_to_schema(self._read_branch_manifest(name, head))

    def _branch_added_files(self, name: str) -> tuple[list[str], dict]:
        head = self._branch_head(name)
        if head == 0:
            return [], {}
        m = self._read_branch_manifest(name, head)
        base_files = set(
            self._read_manifest(m["summary"]["base_version"])["files"]
        )
        added = [f for f in m["files"] if f not in base_files]
        stats = {f: s for f, s in m.get("stats", {}).items() if f in added}
        return added, stats

    def fast_forward(self, name: str, drop: bool = True) -> dict:
        """Publish a branch's commits onto main as ONE append snapshot —
        Iceberg ``CALL system.fast_forward`` / merging the audit branch.
        Appends commute, so the publish rebases cleanly even when main
        advanced past the fork point (same argument as WAP publish).
        Metadata-only: no data file is rewritten or copied."""
        added, added_stats = self._branch_added_files(name)
        head = self._branch_head(name)
        schema_json = (
            self._read_branch_manifest(name, head).get("schema")
            if head
            else None
        )

        def build(parent: int) -> dict:
            prev_manifest = self._read_manifest(parent) if parent else {}
            prev = prev_manifest.get("files", [])
            return self._snapshot(
                "append",
                prev + added,
                parent,
                # main's CURRENT schema wins field-for-field; branch-only
                # columns are appended. The branch head's schema was frozen
                # at fork time — preferring it wholesale would revert any
                # add-column evolution main did after the fork (Iceberg
                # avoids this by refusing non-ancestor fast-forwards).
                schema_json=self._merge_schema_json(
                    prev_manifest.get("schema"), schema_json
                ),
                stats={**prev_manifest.get("stats", {}), **added_stats},
                file_seq={
                    **prev_manifest.get("file_seq", {}),
                    **{f: parent + 1 for f in added},
                },
                delete_files=prev_manifest.get("delete_files", []),
                partition_specs=prev_manifest.get("partition_specs"),
                partitions=prev_manifest.get("partitions"),
                added=len(added),
                fast_forwarded_branch=name,
                branch_commits=head,
            )

        manifest = self._commit_with_retry(build)
        if drop:
            self.drop_branch(name, keep_files=True)
        return manifest

    def drop_branch(self, name: str, keep_files: bool = False) -> None:
        """Delete a branch ref and its commit chain. Unless ``keep_files``
        (set by fast_forward, whose publish now references them), the
        branch's own data directories are removed — an abandoned audit
        branch leaves no trace."""
        added, _ = self._branch_added_files(name)
        branch_parts: set[str] = set()
        for bp in glob.glob(os.path.join(self._branch_dir(name), "v*.json")):
            branch_parts.update(self._raw_manifest(bp).get("parts", []))
        os.unlink(self._branch_ref_path(name))
        shutil.rmtree(self._branch_dir(name), ignore_errors=True)
        # manifest parts only this branch's chain referenced go with it.
        # (Main never carries a branch part — _try_commit only carries
        # from the main parent — and a publish writes its own new part,
        # so this holds even after fast_forward/keep_files.)
        if branch_parts:
            live_parts = self._branch_referenced_parts()
            for v in range(1, self.current_version() + 1):
                p = self._manifest_path(v)
                if os.path.exists(p):
                    live_parts.update(self._raw_manifest(p).get("parts", []))
            for pp in branch_parts - live_parts:
                try:
                    os.remove(pp)
                except OSError:
                    pass
        if keep_files or not added:
            return
        # Safety invariant this deletion relies on: every _write_data_files
        # call puts its files under a fresh data/<uuid> dir, so a branch
        # commit's dir is never shared with another lineage. The live set
        # below (main snapshots + their MoR delete-key files + staged WAP
        # commits + other branches) is still checked per-dir, mirroring
        # remove_orphan_files, so a future shared-dir refactor fails safe
        # instead of deleting live data.
        data_root = os.path.join(self.path, "data")
        live: set[str] = set(self._branch_referenced_files())
        for snap in self.snapshots():
            live.update(snap["files"])
            live.update(self._delete_key_files(snap))
        for sp in glob.glob(os.path.join(self._snap_dir, "stage-*.json")):
            with open(sp) as f:
                live.update(json.load(f).get("added_files", []))
        for snap_dir in {
            os.path.join(
                data_root, os.path.relpath(f, data_root).split(os.sep)[0]
            )
            for f in added
        }:
            files = set(
                glob.glob(
                    os.path.join(snap_dir, "**", "*.parquet"), recursive=True
                )
            )
            if files and not (files & live):
                shutil.rmtree(snap_dir, ignore_errors=True)

    def _branch_referenced_files(self) -> set[str]:
        """Every data file any live branch can still reach — protected
        from expire_snapshots / remove_orphan_files GC."""
        out: set[str] = set()
        for name in self.branches():
            head = self._branch_head(name)
            if head:
                out.update(self._read_branch_manifest(name, head)["files"])
        return out

    def _branch_referenced_parts(self) -> set[str]:
        """Manifest parts referenced by ANY live branch commit (not just
        the head: older branch manifests stay readable until the branch
        is dropped, so their parts are live metadata too)."""
        out: set[str] = set()
        for name in self.branches():
            for bp in glob.glob(
                os.path.join(self._branch_dir(name), "v*.json")
            ):
                out.update(self._raw_manifest(bp).get("parts", []))
        return out

    def read(
        self,
        version: int | str | None = None,
        with_lineage: bool = False,
    ) -> DataFrame:
        """Scan the table at a version (default: latest) — time travel ↔
        Iceberg ``VERSION AS OF``; a string reads a named tag. Empty
        table → raises FileNotFoundError. ``with_lineage`` appends the
        Iceberg v3 lineage columns ``_row_id`` /
        ``_last_updated_version`` (see :meth:`_project_to_schema`)."""
        v = self._resolve_version(version)
        manifest = self._read_manifest(v)
        if not manifest["files"]:
            raise FileNotFoundError(f"no data files at version {v}")
        return self._project_to_schema(manifest, with_lineage=with_lineage)

    def read_rows_updated_since(self, version: int) -> DataFrame:
        """Rows written or updated after snapshot ``version`` — the
        row-version watermark consumer (Iceberg v3's last-updated
        sequence number), with FILE-LEVEL pruning before any data IO:

        - a file whose sequence number is > ``version`` may only hold
          qualifying rows' candidates — kept;
        - otherwise every row INHERITS the file's old seq unless the
          file materializes ``__last_updated`` (it was rewritten): the
          manifest's min/max stats for that column decide — max ≤
          ``version`` (or the column absent/all-null) proves the file
          has nothing newer, pruned by metadata alone.

        The surviving files are scanned once and filtered row-wise
        (``_last_updated_version > version`` remains the row-exact
        truth — pruning only ever skips provably-dead files). Returns
        the table columns plus ``_row_id`` / ``_last_updated_version``.

        Scale: an append-mostly table prunes to the files of the
        commits after ``version`` — O(new data), the incremental-read
        cost model — while rewritten files are re-examined only when
        their stats admit newer rows."""
        m = self._read_manifest(self.current_version())
        seqs = m.get("file_seq", {})
        stats = m.get("stats", {})

        def may_contain(f: str) -> bool:
            if seqs.get(f, 0) > version:
                return True
            per = stats.get(f)
            if per is None:
                return True  # unknown stats — conservatively kept
            rng = per.get("__last_updated")
            if rng is not None:
                return rng[1] > version
            nulls = (per.get("__nulls") or {}).get("__last_updated")
            if nulls is not None and nulls != per.get("__rows"):
                # column present with values but min/max unrecorded
                return True
            # column absent or all-NULL: every row inherits the file's
            # seq, which is <= version here
            return False

        kept = [f for f in m["files"] if may_contain(f)]
        if not kept:
            return self._project_to_schema(m, with_lineage=True).limit(
                0
            ).filter(F.lit(False))
        sub = {**m, "files": kept}
        return self._project_to_schema(sub, with_lineage=True).filter(
            F.col("_last_updated_version") > version
        )

    def _project_with_lineage_cols(self, manifest: dict) -> DataFrame:
        """Rewrite-side read: the manifest's rows with their lineage
        MATERIALIZED as physical ``__row_id`` / ``__last_updated``
        columns, ready to be written into replacement files. Every
        rewrite path (compaction, CoW delete/update/merge, sort/z-order)
        reads survivors through this, so row identity survives any
        sequence of rewrites — the Iceberg v3 requirement that engines
        must write row ids when copying existing rows."""
        df = self._project_to_schema(manifest, with_lineage=True)
        return (
            df.withColumn("__row_id", F.col("_row_id"))
            .withColumn("__last_updated", F.col("_last_updated_version"))
            .drop("_row_id", "_last_updated_version")
        )

    def version_as_of(self, ts: float) -> int:
        """Latest version committed at or before a unix timestamp —
        Iceberg ``TIMESTAMP AS OF`` resolution. Driver-side metadata
        scan; raises if the table didn't exist yet."""
        best = 0
        for m in self.snapshots():
            if m.get("committed_at", 0.0) <= ts:
                best = max(best, m["version"])
        if not best:
            raise ValueError(f"no snapshot committed at or before {ts}")
        return best

    def read_as_of(self, ts: float) -> DataFrame:
        """Time travel by wall-clock instant: ``SELECT ... TIMESTAMP AS
        OF`` — resolves to the newest snapshot whose commit predates
        ``ts`` and reads it."""
        return self.read(version=self.version_as_of(ts))

    def changelog(
        self,
        from_version: int | str,
        to_version: int | str | None = None,
        row_level: bool = False,
    ) -> DataFrame:
        """NET row-level change feed between two snapshots — the
        changelog scan (Iceberg ``changelog_view`` / Delta CDF, netted
        across the interval): every returned row carries
        ``_change_type`` ∈ {'insert', 'delete'} plus the table's
        declared columns. A row present at ``to`` but not at ``from``
        (as multisets) is an insert; present at ``from`` but not ``to``
        is a delete; an UPDATE surfaces as its delete+insert pair (pair
        them on the key downstream — the same contract Iceberg's
        changelog emits for copy-on-write updates). Rewrites that
        preserve rows (compaction, z-order) cancel to zero changes —
        exactly what a downstream incremental consumer wants.

        ``row_level=True`` upgrades the diff from value multisets to
        ROW IDENTITY (Iceberg v3 row lineage, r6): the two sides join
        on ``_row_id``, so an UPDATE surfaces as ONE paired change —
        ``update_preimage`` + ``update_postimage`` sharing the same
        ``_row_id`` (Delta CDF's four-type convention) — instead of an
        unpaired delete+insert; a deleted row re-inserted with
        identical values is now correctly a delete + insert of two
        DIFFERENT identities rather than a silent cancel. ``_row_id``
        is emitted on every change row. Same changed-file scoping; the
        join key is the lineage id, so cost stays O(changed data).

        Scale (r4 — this replaced a both-full-snapshot diff): only
        CHANGED files are opened. File sets of the two manifests are
        compared driver-side (O(files) metadata); files common to both
        versions are skipped entirely unless a merge-on-read delete
        entry added in the interval can target them (equality deletes
        scope by sequence number; position deletes name their target
        files in their tiny coordinate parquets, read driver-side).
        The multiset diff is two hash-aggregated EXCEPT ALLs over just
        those files — O(changed data), never O(table).

        Both sides are read under the ``to`` schema (added columns
        surface as NULL in old rows; renames resolve through
        ``prior_names``, so a metadata-only rename produces ZERO row
        changes — Iceberg's field-id behavior, unlike a naive
        name-based diff that would re-emit the whole table).
        """
        v1 = self._resolve_version(from_version)
        v2 = (
            self._resolve_version(to_version)
            if to_version is not None
            else self.current_version()
        )
        if v2 < v1:
            raise ValueError(f"to_version {v2} precedes from_version {v1}")
        m2 = self._read_manifest(v2)
        m1 = (
            self._read_manifest(v1)
            if v1 > 0
            else {"files": [], "delete_files": [], "file_seq": {}}
        )
        f1, f2 = set(m1["files"]), set(m2["files"])
        common = f1 & f2
        # Delete entries that CHANGED in the interval, in EITHER
        # direction: entries added in (v1, v2] kill rows in common
        # files; entries REMOVED (rollback, compaction materializing
        # deletes away while carrying files) RESURRECT rows — both make
        # a common file's effective row set differ between the sides.
        ser1 = {
            json.dumps(d, sort_keys=True): d
            for d in m1.get("delete_files", [])
        }
        ser2 = {
            json.dumps(d, sort_keys=True): d
            for d in m2.get("delete_files", [])
        }
        changed_dels = [d for k, d in ser2.items() if k not in ser1] + [
            d for k, d in ser1.items() if k not in ser2
        ]
        affected: set[str] = set()
        if changed_dels and common:
            seqs = {
                **(m1.get("file_seq", {}) or {}),
                **(m2.get("file_seq", {}) or {}),
            }
            eq_max = max(
                (d["seq"] for d in changed_dels if not d.get("pos")),
                default=None,
            )
            if eq_max is not None:
                affected |= {
                    f for f in common if seqs.get(f, 0) <= eq_max
                }
            pos_targets: set[str] = set()
            for d in changed_dels:
                if d.get("pos"):
                    from . import encryption as _E

                    for kf in d["files"]:
                        try:
                            col = _E.read_table_auto(
                                kf, self._maybe_key(), columns=["__file"]
                            ).column("__file")
                        except (FileNotFoundError, OSError) as ex:
                            # ADVICE r4 weighed a conservative fallback
                            # (treat all common files as affected), but
                            # that would be silently WRONG, not
                            # conservative: the same coordinates are
                            # needed again when the diff MATERIALIZES
                            # the endpoint's effective rows (_side
                            # applies this entry), and without them the
                            # rows this entry killed read as alive —
                            # their resurrection/deletion events vanish
                            # from the feed. The information is
                            # destroyed; refuse with direction instead
                            # of an opaque IO stack. (Normal retention
                            # can't get here: both GC passes keep
                            # delete-key files of every retained
                            # manifest, and changelog endpoints are by
                            # construction readable manifests.)
                            raise ValueError(
                                "changelog: a position-delete entry in "
                                f"the interval references coordinate "
                                f"file {kf!r} which is unreadable "
                                "(garbage-collected out-of-band?); the "
                                "interval's row changes cannot be "
                                "reconstructed — widen the interval "
                                "past the damaged snapshot or re-sync "
                                "the consumer from a full read"
                            ) from ex
                        for v in col.to_pylist():
                            # coordinates store the parquet reader's
                            # file URI (file:///...); manifests store
                            # plain paths — normalize before comparing
                            if v.startswith("file:"):
                                v = v[5:]
                                while v.startswith("//"):
                                    v = v[1:]
                            pos_targets.add(v)
            affected |= pos_targets & common

        # deletion vectors: a common file whose DV entry differs between
        # the sides (bitmap added, replaced latest-wins, or dropped by a
        # rollback) has a different effective row set — it is affected.
        # Each side's materialization below applies its OWN delete_vectors
        # map, so the diff then surfaces exactly the rows whose liveness
        # changed.
        dv1 = m1.get("delete_vectors", {})
        dv2 = m2.get("delete_vectors", {})
        for f in common:
            if dv1.get(f) != dv2.get(f):
                affected.add(f)

        def _side(state: dict, files: set[str]) -> DataFrame | None:
            if not files:
                return None
            sub = dict(state)
            sub["files"] = sorted(files)
            sub["schema"] = m2.get("schema")  # both sides under TO schema
            if row_level:
                out = self._project_to_schema(
                    sub, with_lineage=True
                ).drop("_last_updated_version")
            else:
                out = self._project_to_schema(sub)
            # VARIANT cannot participate in set ops / row comparisons
            # (Spark UNSUPPORTED_FEATURE.SET_OPERATION_ON_VARIANT_TYPE):
            # the feed diffs and emits the column's canonical JSON text
            # — which is also exactly what the streaming CDC readers
            # emit (they read the physical string encoding)
            return self._destring_variants(out)

        old = _side(m1, (f1 - f2) | affected)
        new = _side(m2, (f2 - f1) | affected)

        if row_level:
            # a side over a pre-lineage manifest raises inside
            # _attach_lineage_cols ("row lineage unavailable") at _side
            # row sums of each side's SCOPED files from manifest __rows
            # stats (free) feed the broadcast decision downstream —
            # None when any scoped file predates row-count stats
            analyze_rows: dict | None = None

            def side_rows(state: dict, files: set[str]) -> int | None:
                nonlocal analyze_rows
                st = state.get("stats", {})
                total = 0
                for f in files:
                    r = st.get(f, {}).get("__rows")
                    if r is None:
                        # stats-driven planning fallback (VERDICT r7
                        # #3): a manifest predating __rows tracking can
                        # still plan the broadcast decomposition from
                        # the analyze() sidecar's per-file row counts
                        if analyze_rows is None:
                            analyze_rows = self._stats_file_rows()
                        r = analyze_rows.get(f)
                    if r is None:
                        return None
                    total += int(r)
                return total

            return self._changelog_row_level(
                old,
                new,
                m2,
                m1,
                old_rows=side_rows(m1, (f1 - f2) | affected),
                new_rows=side_rows(m2, (f2 - f1) | affected),
                broadcast_threshold_rows=self._int_property(
                    "changelog.broadcast-threshold-rows"
                ),
            )

        def tag(df: DataFrame, kind: str) -> DataFrame:
            return df.select(F.lit(kind).alias("_change_type"), "*")

        if old is None and new is None:
            # zero changes — return an empty, correctly-shaped feed.
            # With no files at the endpoints, shape from the declared
            # schema (a drained table still has one); only a table with
            # neither files nor schema anywhere is unreadable.
            if f2:
                return tag(
                    self._destring_variants(
                        self._project_to_schema(dict(m2)).limit(0)
                    ),
                    "",
                )
            schema_json = m2.get("schema") or m1.get("schema")
            if schema_json is None:
                raise FileNotFoundError(
                    f"no data files or schema at versions {v1}..{v2}"
                )
            from pyspark.sql import types as T

            empty = self._destring_variants(
                self.spark.createDataFrame(
                    [], T.StructType.fromJson(json.loads(schema_json))
                )
            )
            return tag(empty, "")
        if old is None:
            return tag(new, "insert")
        if new is None:
            return tag(old, "delete")
        return tag(new.exceptAll(old), "insert").unionByName(
            tag(old.exceptAll(new), "delete")
        )

    def _changelog_row_level(
        self,
        old: DataFrame | None,
        new: DataFrame | None,
        m2: dict,
        m1: dict,
        old_rows: int | None = None,
        new_rows: int | None = None,
        broadcast_threshold_rows: int = 100_000,
    ) -> DataFrame:
        """Identity-keyed interval diff (Delta CDF's four change types):
        the sides (already scoped to changed files, already carrying
        ``_row_id``) full-outer-join on the lineage id. One id on both
        sides with differing values is ONE update — emitted as an
        ``update_preimage``/``update_postimage`` pair sharing the id;
        same values (a rewrite that moved the row) emits nothing; id
        only-old is a delete, only-new an insert. The pair construction
        is a conditional-array explode — one pass over the join, no
        recompute per change type; a NULL array (unchanged row) is
        dropped by ``explode`` itself."""
        sides = [d for d in (old, new) if d is not None]
        if not sides:
            # zero changes — empty, row-level-shaped feed
            schema_json = m2.get("schema") or m1.get("schema")
            if schema_json is None:
                raise FileNotFoundError("no data files or schema")
            from pyspark.sql import types as T

            shape = T.StructType.fromJson(json.loads(schema_json))
            shape = T.StructType(
                [T.StructField("_change_type", T.StringType())]
                + [
                    T.StructField(
                        f.name,
                        T.StringType()
                        if isinstance(f.dataType, T.VariantType)
                        else f.dataType,
                    )
                    for f in shape.fields
                ]
                + [T.StructField("_row_id", T.LongType())]
            )
            return self.spark.createDataFrame([], shape)
        user_cols = [c for c in sides[0].columns if c != "_row_id"]

        def shaped(df: DataFrame, kind: str) -> DataFrame:
            return df.select(
                F.lit(kind).alias("_change_type"), *user_cols, "_row_id"
            )

        if old is None:
            return shaped(new, "insert")
        if new is None:
            return shaped(old, "delete")
        o = old.withColumn("_o_present", F.lit(True)).alias("__cl_o")
        n = new.withColumn("_n_present", F.lit(True)).alias("__cl_n")

        def ev(kind: str, side: DataFrame) -> F.Column:
            return F.struct(
                F.lit(kind).alias("_change_type"),
                *[side[c].alias(c) for c in user_cols],
                side["_row_id"].alias("_row_id"),
            )

        same = F.struct(*[o[c] for c in user_cols]).eqNullSafe(
            F.struct(*[n[c] for c in user_cols])
        )
        # Stats-driven broadcast (VERDICT r6 #5): Spark cannot broadcast
        # a FULL OUTER join, so when the manifest __rows stats say one
        # side is small, decompose it — big LEFT-OUTER broadcast(small)
        # classifies deletes/updates (or inserts/updates) without ever
        # shuffling the big side; the small side's unmatched leftovers
        # are recovered with a second broadcast anti-join on the matched
        # ids (≤ |small| rows by construction). The shape that matters
        # at 10^6 files: a narrow rewrite diffed against a wide affected
        # scope pays one broadcast, not a full-table shuffle.
        small_new = (
            new_rows is not None and new_rows <= broadcast_threshold_rows
        )
        small_old = (
            old_rows is not None and old_rows <= broadcast_threshold_rows
        )
        if small_new and not (
            small_old and (old_rows or 0) < (new_rows or 0)
        ):
            joined = o.join(
                F.broadcast(n), o["_row_id"] == n["_row_id"], "left_outer"
            )
            events = F.when(
                n["_n_present"].isNull(), F.array(ev("delete", o))
            ).when(
                ~same,
                F.array(
                    ev("update_preimage", o), ev("update_postimage", n)
                ),
            )
            part = joined.select(F.explode(events).alias("__e")).select(
                "__e.*"
            )
            matched = joined.filter(n["_n_present"].isNotNull()).select(
                n["_row_id"].alias("__mid")
            )
            inserts = n.join(
                F.broadcast(matched),
                n["_row_id"] == F.col("__mid"),
                "left_anti",
            )
            return part.unionByName(shaped(inserts, "insert"))
        if small_old:
            joined = n.join(
                F.broadcast(o), o["_row_id"] == n["_row_id"], "left_outer"
            )
            events = F.when(
                o["_o_present"].isNull(), F.array(ev("insert", n))
            ).when(
                ~same,
                F.array(
                    ev("update_preimage", o), ev("update_postimage", n)
                ),
            )
            part = joined.select(F.explode(events).alias("__e")).select(
                "__e.*"
            )
            matched = joined.filter(o["_o_present"].isNotNull()).select(
                o["_row_id"].alias("__mid")
            )
            deletes = o.join(
                F.broadcast(matched),
                o["_row_id"] == F.col("__mid"),
                "left_anti",
            )
            return part.unionByName(shaped(deletes, "delete"))
        joined = o.join(
            n, o["_row_id"] == n["_row_id"], "full_outer"
        )
        only_new = o["_o_present"].isNull()
        only_old = n["_n_present"].isNull()
        events = (
            F.when(only_new, F.array(ev("insert", n)))
            .when(only_old, F.array(ev("delete", o)))
            .when(
                ~same,
                F.array(
                    ev("update_preimage", o), ev("update_postimage", n)
                ),
            )
        )  # matched & identical -> NULL array -> explode drops the row
        return joined.select(
            F.explode(events).alias("__e")
        ).select("__e.*")

    def _scan_files(
        self,
        files: list[str],
        file_seq: dict[str, int] | None = None,
        with_seq: bool = False,
        with_pos: bool = False,
    ) -> DataFrame:
        """Open a set of manifest-listed leaf files, recovering
        hive-partition columns.

        Files written with ``partition_by`` live under
        ``<root>/data/<snap>/<col>=<val>/...``; opening leaf paths
        directly discards the directory-encoded values, so each
        snapshot's files are read with ``basePath`` = its data dir —
        partition discovery then restores the columns AND partition
        pruning stays available to filtered reads. One read per
        contributing snapshot dir (bounded by compaction), unioned by
        name so snapshots with differing schemas align.

        ``with_seq`` attaches each file's data sequence number as a
        ``__seq`` literal column (files of one snapshot dir share a seq,
        so it's a per-scan constant — zero per-row cost). ``with_pos``
        attaches the row's physical identity (``__file``, ``__pos``) from
        Spark's hidden ``_metadata`` struct — the coordinates positional
        deletes target; generated by the parquet reader, not stored.

        Union ordering (ADVICE r11): flat seq-sorted groups precede
        hive-partitioned groups, which differs from the pre-r11
        sorted-(base, seq) interleaving for mixed flat+hive histories —
        consumers must (and do) select columns by NAME, never
        positionally, off this raw scan."""
        from . import encryption as E

        if any(E.is_encrypted_file(f) for f in files):
            # encrypted tables read through the Arrow decrypt path (the
            # JVM parquet reader cannot open envelope ciphertext);
            # mixed plain+encrypted file sets — a table encrypted
            # mid-history — are handled file-by-file
            return self._scan_files_encrypted(
                files, file_seq or {}, with_seq, with_pos
            )
        data_root = os.path.join(self.path, "data")
        seqs = file_seq or {}
        groups: dict[tuple[str, int], list[str]] = {}
        for f in files:
            rel = os.path.relpath(f, data_root)
            parts = rel.split(os.sep)
            if parts and not parts[0].startswith(".."):
                base = os.path.join(data_root, parts[0])
            else:
                # File owned by ANOTHER table's data root (shallow clone:
                # the manifest references source files verbatim). The true
                # snapshot dir is above any hive 'col=val' partition
                # segments — dirname(f) alone would be the LEAF partition
                # dir, and basePath=leaf makes discovery recover nothing
                # (the partition column reads back NULL). Strip trailing
                # 'name=value' segments to the real snapshot base.
                base = os.path.dirname(f)
                while re.match(r"[^=/]+=", os.path.basename(base)):
                    base = os.path.dirname(base)
            groups.setdefault((base, seqs.get(f, 0)), []).append(f)
        # Optimization (r11, guide §7.3 driver-side planning): each
        # DataFrameReader.parquet() call costs ~70 ms of JVM file-index
        # + footer schema inference, and a table touched by N commits
        # (or a streaming batch with N task dirs) planned N calls per
        # read. Files that sit DIRECTLY in their snapshot dir need no
        # basePath (there are no hive segments to recover), so all such
        # groups sharing a sequence number collapse into ONE read.
        # Hive-partitioned groups keep the per-dir basePath read.
        flat: dict[int, list[str]] = {}
        hive_groups: list[tuple[tuple[str, int], list[str]]] = []
        for (base, seq), grp in sorted(groups.items()):
            if all(os.path.dirname(f) == base for f in grp):
                flat.setdefault(seq, []).extend(grp)
            else:
                hive_groups.append(((base, seq), grp))

        def _attach(s: DataFrame, seq: int) -> DataFrame:
            if with_seq:
                s = s.withColumn("__seq", F.lit(seq))
            if with_pos:
                s = s.withColumn(
                    "__file", F.col("_metadata.file_path")
                ).withColumn("__pos", F.col("_metadata.row_index"))
            return s

        scans = []
        for seq, grp in sorted(flat.items()):
            grp = sorted(grp)
            try:
                s = self.spark.read.option("mergeSchema", True).parquet(
                    *grp
                )
            except Exception as exc:
                # type-promoted history (int→long / float→double across
                # commits): parquet schema merge refuses mixed physical
                # types — fall back to one read per dir, coerced by
                # unionByName like the pre-merge shape. A NON-schema
                # failure (missing/corrupt file, FS error) will fail the
                # per-dir reads too — chain the original merged-read
                # error so diagnosis sees both (ADVICE r11)
                try:
                    s = None
                    subs: dict[str, list[str]] = {}
                    for f in grp:
                        subs.setdefault(os.path.dirname(f), []).append(f)
                    for _, fs in sorted(subs.items()):
                        one = self.spark.read.option(
                            "mergeSchema", True
                        ).parquet(*fs)
                        s = (
                            one
                            if s is None
                            else s.unionByName(
                                one, allowMissingColumns=True
                            )
                        )
                except Exception as exc2:
                    raise exc2 from exc
            scans.append(_attach(s, seq))
        for (base, seq), grp in hive_groups:
            s = (
                self.spark.read.option("basePath", base)
                .option("mergeSchema", True)
                .parquet(*grp)
            )
            scans.append(_attach(s, seq))
        out = scans[0]
        for s in scans[1:]:
            out = out.unionByName(s, allowMissingColumns=True)
        return out

    def _scan_files_encrypted(
        self,
        files: list[str],
        seqs: dict[str, int],
        with_seq: bool,
        with_pos: bool,
    ) -> DataFrame:
        """Encrypted twin of :meth:`_scan_files`: one Arrow task per
        file decrypts its blob executor-side and emits the same shape —
        the union PHYSICAL schema (planned driver-side from the key
        sidecars' plaintext Arrow schemas, no decryption), hive
        partition columns recovered from the path, plus ``__seq`` /
        ``__file`` / ``__pos`` when requested. Everything above this
        method (declared projection, defaults, renames, MoR deletes,
        lineage) is unchanged.

        Scale: parallelism = files (one decrypt+parse per task, Arrow
        batches straight into Spark); the whole-file envelope means no
        column pruning inside encrypted files — documented trade
        (SCALE.md r9), recovered only by Parquet Modular Encryption."""
        import pyarrow as pa

        from . import encryption as E
        from pyspark.sql.pandas.types import from_arrow_schema

        key = self._enc_key()
        schemas = []
        for f in files:
            if E.is_encrypted_file(f):
                schemas.append(E.sidecar_schema(f))
            else:
                import pyarrow.parquet as pq

                schemas.append(pq.read_schema(f))
        parts = self._file_partitions(files)
        part_cols = sorted({c for d in parts.values() for c in d})
        unified = pa.unify_schemas(
            schemas, promote_options="permissive"
        )
        union = pa.schema(
            [fld for fld in unified if fld.name not in part_cols]
            + [pa.field(c, pa.string()) for c in part_cols]
        )
        extra = []
        if with_seq:
            extra.append(pa.field("__seq", pa.int64()))
        if with_pos:
            extra += [
                pa.field("__file", pa.string()),
                pa.field("__pos", pa.int64()),
            ]
        out_schema = pa.schema(list(union) + extra)
        spec_rows = [
            (f, int(seqs.get(f, 0)), json.dumps(parts.get(f, {})))
            for f in sorted(files)
        ]

        def task(batches):
            for b in batches:
                for row in b.to_pylist():
                    f, seq, pvals = row["f"], row["s"], json.loads(row["p"])
                    t = E.read_table_auto(f, key)
                    n = t.num_rows
                    arrays = []
                    for fld in union:
                        if fld.name in t.column_names:
                            col = t.column(fld.name)
                            if col.type != fld.type:
                                col = col.cast(fld.type)
                            arrays.append(col)
                        elif fld.name in pvals:
                            v = pvals[fld.name]
                            if v == "__HIVE_DEFAULT_PARTITION__":
                                v = None
                            arrays.append(
                                pa.chunked_array(
                                    [pa.array([v] * n, fld.type)]
                                )
                            )
                        else:
                            arrays.append(
                                pa.chunked_array([pa.nulls(n, fld.type)])
                            )
                    if with_seq:
                        arrays.append(
                            pa.chunked_array(
                                [pa.array([seq] * n, pa.int64())]
                            )
                        )
                    if with_pos:
                        arrays.append(
                            pa.chunked_array([pa.array([f] * n)])
                        )
                        arrays.append(
                            pa.chunked_array(
                                [pa.array(range(n), pa.int64())]
                            )
                        )
                    yield from pa.Table.from_arrays(
                        arrays, schema=out_schema
                    ).to_batches()

        plan = self.spark.createDataFrame(
            spec_rows, "f string, s long, p string"
        ).repartition(max(1, len(files)))
        return plan.mapInArrow(task, from_arrow_schema(out_schema))

    def _maybe_key(self) -> bytes | None:
        """Validated table key when encryption is on (raises loudly if
        missing/wrong), None for plaintext tables."""
        return self._enc_key() if self._encryption_on() else None

    @staticmethod
    def _file_num_rows(f: str) -> int:
        """Row count of one data file without the table key: plaintext
        footer, or the encrypted file's sidecar stats."""
        from . import encryption as E

        if E.is_encrypted_file(f):
            return int(E.read_key_sidecar(f)["stats"]["__rows"])
        import pyarrow.parquet as pq

        return pq.ParquetFile(f).metadata.num_rows

    def _read_delete_parquets(self, files: list[str]) -> DataFrame:
        """Open delete key/coordinate parquets (tiny, always broadcast
        downstream). Encrypted tables' delete files are encrypted like
        data files — decrypt driver-side and ship as a local relation
        (they are broadcast-sized by construction); plaintext files keep
        the zero-copy JVM read."""
        from . import encryption as E

        if not any(E.is_encrypted_file(f) for f in files):
            return self.spark.read.parquet(*files)
        key = self._enc_key()
        import pyarrow as pa

        tbls = [E.read_table_auto(f, key) for f in files]
        # ship as ONE Arrow table (Spark 4 createDataFrame accepts
        # pyarrow directly) — ~2x faster than the old per-row tuple
        # conversion for broadcast-sized key sets (optimization r11,
        # guide §4: batches over pickled rows at every boundary)
        return self.spark.createDataFrame(
            pa.concat_tables(tbls, promote_options="permissive")
        )

    def _apply_deletes(
        self,
        df: DataFrame,
        delete_files: list[dict],
        renames: dict[str, list[str]] | None = None,
        delete_vectors: dict | None = None,
    ) -> DataFrame:
        """Merge-on-read: anti-join pending equality-delete keys against
        the scan. A row is removed iff some delete entry matches its keys
        AND the delete's seq >= the row's file seq — rows appended after
        the delete survive (Iceberg v2 sequence-number semantics).
        Expects ``__seq`` on ``df``; drops it.

        Positional entries (``pos: True`` — Iceberg v2 position deletes)
        instead anti-join on the row's physical coordinates
        (``__file``, ``__pos``): they target specific rows of specific
        files, so no sequence check is needed (a later append can never
        reuse a deleted file's path — data dirs are per-commit unique),
        and unlike equality deletes they can remove ONE of two identical
        rows.

        Scale: one anti-join per distinct key set (usually one) plus at
        most one for all positional entries; the delete side is
        keys-only and tiny relative to data, so Catalyst broadcasts it —
        the read-amplification merge-on-read trades for write-cheap
        deletes, until compaction materializes them away."""
        by_keys: dict[tuple[str, ...], list[dict]] = {}
        pos_entries: list[dict] = []
        for d in delete_files:
            if d.get("pos"):
                pos_entries.append(d)
            else:
                by_keys.setdefault(tuple(d["keys"]), []).append(d)
        # a rename after a pending delete: the entry (and its keys-only
        # parquet) use the old name, the projected scan the new one —
        # map historical key names forward before joining
        rev = {
            p: cur
            for cur, priors in (renames or {}).items()
            for p in priors
        }
        for keys, entries in by_keys.items():
            cur_keys = tuple(rev.get(k, k) for k in keys)
            dels = None
            for d in entries:
                one = self._read_delete_parquets(d["files"]).select(
                    *keys
                )
                for k, ck in zip(keys, cur_keys):
                    if k != ck:
                        one = one.withColumnRenamed(k, ck)
                one = one.withColumn("__del_seq", F.lit(d["seq"]))
                dels = one if dels is None else dels.unionByName(one)
            cond = [df[k].eqNullSafe(dels[k]) for k in cur_keys]
            cond.append(dels["__del_seq"] >= df["__seq"])
            df = df.join(
                F.broadcast(dels),
                functools_reduce(lambda a, b: a & b, cond),
                "left_anti",
            )
        if pos_entries:
            dels = self._read_delete_parquets(
                [f for d in pos_entries for f in d["files"]]
            ).select(
                F.col("__file").alias("__dfile"),
                F.col("__pos").alias("__dpos"),
            )
            df = df.join(
                F.broadcast(dels),
                (df["__file"] == dels["__dfile"])
                & (df["__pos"] == dels["__dpos"]),
                "left_anti",
            )
        if delete_vectors:
            # deletion vectors → ONE broadcast anti-join on the physical
            # coordinates, shared with the pos-delete shape above. No
            # sequence check: positions pin exact rows of immutable
            # files, same argument as position deletes. Two decode
            # regimes (the r6 lineage create_map lesson: fixed Python
            # plan machinery dominates small reads): under the
            # threshold the driver decodes the bitmaps locally —
            # checksum-verified, no Python-worker stage — and ships the
            # pairs as a local relation; above it the O(files-with-DVs)
            # index fans out via mapInPandas so blob bytes and position
            # lists never touch the driver.
            total_dead = sum(
                int(e.get("cardinality", 0))
                for e in delete_vectors.values()
            )
            if total_dead <= self._int_property(
                "read.dv.inline-threshold-rows"
            ):
                pairs = [
                    (f, int(p))
                    for f, e in delete_vectors.items()
                    for p in self._dv_decode(self._read_dv_blob(e))
                ]
                dv_dels = self.spark.createDataFrame(
                    pairs, "__dfile string, __dpos long"
                )
            else:
                import pandas as _pd

                decode = self._dv_decode
                tkey = (
                    self._maybe_key()
                    if any(
                        e.get("enc") for e in delete_vectors.values()
                    )
                    else None
                )
                entries = [
                    (
                        f,
                        e["path"],
                        int(e["offset"]),
                        int(e["length"]),
                        e.get("sha256"),
                        bool(e.get("enc")),
                    )
                    for f, e in delete_vectors.items()
                ]
                edf = self.spark.createDataFrame(
                    entries,
                    "__dvf string, __dvp string, __dvo long, __dvl long,"
                    " __dvh string, __dve boolean",
                )

                def _expand(batches):
                    for pdf in batches:
                        for f, p, o, ln, dg, enc in pdf.itertuples(
                            index=False
                        ):
                            blob = _read_dv_bytes(
                                p,
                                int(o),
                                int(ln),
                                dg,
                                table_key=tkey if enc else None,
                                encrypted=bool(enc),
                            )
                            yield _pd.DataFrame(
                                {"__dfile": f, "__dpos": decode(blob)}
                            )

                dv_dels = edf.mapInPandas(
                    _expand, "__dfile string, __dpos long"
                )
            # DV entries key on the manifest's PLAIN path; the reader
            # reports file:///-URIs — normalize the data side
            dnorm = F.regexp_replace(df["__file"], "^file:/+", "/")
            df = df.join(
                F.broadcast(dv_dels),
                (dnorm == dv_dels["__dfile"])
                & (df["__pos"] == dv_dels["__dpos"]),
                "left_anti",
            )
        return df.drop("__seq", "__file", "__pos")

    def _project_to_schema(
        self,
        manifest: dict,
        with_lineage: bool = False,
        keep_coords: bool = False,
        extra_cols: list[str] | None = None,
    ) -> DataFrame:
        """Read a manifest's files projected to its declared schema.
        ``keep_coords`` retains the physical ``__file``/``__pos``
        columns through the delete anti-joins — for writers that need
        BOTH the surviving rows and their coordinates (update_where_dv
        records the old image's position in a deletion vector while
        appending its replacement). ``extra_cols`` carries named
        PHYSICAL columns (``__geo_*`` / ``__shred_*`` stat shreds)
        through the declared projection and any delete joins — for
        callers that filter on them and drop them before returning
        (``scan(geo_bbox=...)``); absent columns are skipped.

        Schema evolution contract (Iceberg-style, add-column only):
        files written before a column existed surface it as NULL; every
        file is cast to the snapshot's declared column order and types.
        Manifests from before schema tracking read raw.

        When the manifest carries pending merge-on-read delete files,
        each row travels with its file's sequence number and the delete
        keys are anti-joined out (see :meth:`_apply_deletes`).

        ``with_lineage`` appends the Iceberg v3 row-lineage columns:
        ``_row_id`` (stable row identity — the file's ``first_row_id``
        plus the row's position, unless the file materializes
        ``__row_id``, which wins) and ``_last_updated_version`` (the
        version that last wrote the row — materialized ``__last_updated``
        if present, else inherited from the file's sequence number)."""
        files = manifest["files"]
        schema_json = manifest.get("schema")
        deletes = manifest.get("delete_files", [])
        dvs = manifest.get("delete_vectors", {})
        declared = None
        default_gaps: dict = {}
        if schema_json is not None:
            from pyspark.sql import types as T

            declared = T.StructType.fromJson(json.loads(schema_json))
            # Iceberg v3 initial-defaults are PER-FILE semantics (only
            # files written before the add read the default; later
            # files materialize real values, including explicit NULLs),
            # but the unified scan null-fills absent columns — so map
            # which files LACK each defaulted column up front and key
            # the fill on the row's source file
            default_gaps = self._initial_default_gaps(manifest, declared)
        keep_pos = (
            any(d.get("pos") for d in deletes)
            or bool(dvs)
            or with_lineage
            or keep_coords
        )
        has_pos = keep_pos or bool(default_gaps)
        df = self._scan_files(
            files,
            manifest.get("file_seq"),
            with_seq=bool(deletes) or with_lineage,
            with_pos=has_pos,
        )
        lineage_phys = [
            c for c in ("__row_id", "__last_updated") if c in df.columns
        ]
        if declared is not None:
            keep = ["__seq"] if (deletes or with_lineage) else []
            if keep_pos:
                keep += ["__file", "__pos"]
            if with_lineage:
                keep += lineage_phys
            keep += [
                c
                for c in (extra_cols or [])
                if c in df.columns and c not in keep
            ]
            norm_file = F.regexp_replace(
                F.col("__file"), "^file:/+", "/"
            )
            inline = default_gaps and all(
                len(s) <= 64 for _, s in default_gaps.values()
            )
            if default_gaps and not inline:
                # wide gap sets: ONE tiny broadcast relation
                # (file → missing defaulted columns) joined on the
                # row's source file — O(pre-add files) metadata, never
                # a shuffle of the data side (the lineage-map pattern)
                gap_rows: dict[str, list[str]] = {}
                for cname, (_, lacking) in default_gaps.items():
                    for fp in lacking:
                        gap_rows.setdefault(fp, []).append(cname)
                gdf = self.spark.createDataFrame(
                    [(fp, sorted(cs)) for fp, cs in gap_rows.items()],
                    "__gap_file string, __gaps array<string>",
                )
                df = df.join(
                    F.broadcast(gdf),
                    norm_file == gdf["__gap_file"],
                    "left",
                ).drop("__gap_file")
            cols = []
            for f in declared.fields:
                # renamed columns: pre-rename files populate a prior name,
                # post-rename files the current one — never both, so
                # coalescing the historical chain is exact (the name-based
                # stand-in for Iceberg's field-id resolution)
                prior = (f.metadata or {}).get("prior_names", [])
                cands = [
                    n
                    for n in [f.name, *reversed(prior)]
                    if n in df.columns
                ]
                is_variant = isinstance(f.dataType, T.VariantType)

                def fin(raw):
                    # VARIANT is physically JSON text (see
                    # _encode_variant_cols) — parse, never cast
                    if is_variant:
                        return F.parse_json(raw.cast("string"))
                    return raw.cast(f.dataType)

                if not cands:
                    # column absent from EVERY scanned file: all of them
                    # predate the add — constant initial-default (or
                    # NULL when none is declared)
                    dflt = (f.metadata or {}).get("initial_default")
                    expr = fin(F.lit(dflt))
                elif len(cands) == 1:
                    expr = fin(F.col(cands[0]))
                else:
                    expr = fin(F.coalesce(*[F.col(n) for n in cands]))
                if cands and f.name in default_gaps:
                    val, lacking = default_gaps[f.name]
                    if inline:
                        miss = norm_file.isin(*sorted(lacking))
                    else:
                        miss = F.array_contains(
                            F.coalesce(
                                F.col("__gaps"),
                                F.array().cast("array<string>"),
                            ),
                            f.name,
                        )
                    expr = F.when(miss, fin(F.lit(val))).otherwise(expr)
                cols.append(expr.alias(f.name))
            cols += [F.col(c) for c in keep]
            df = df.select(*cols)
        if with_lineage:
            df = self._attach_lineage_cols(df, manifest)
        if deletes or dvs:
            if keep_coords:
                # stash coordinate copies through the anti-joins (which
                # drop the originals), then restore
                df = df.withColumn("__kf", F.col("__file")).withColumn(
                    "__kp", F.col("__pos")
                )
            df = self._apply_deletes(
                df,
                deletes,
                renames=self._schema_renames(schema_json),
                delete_vectors=dvs,
            )
            if keep_coords:
                df = (
                    df.withColumn("__file", F.col("__kf"))
                    .withColumn("__pos", F.col("__kp"))
                    .drop("__kf", "__kp")
                )
        elif with_lineage and not keep_coords:
            df = df.drop("__seq", "__file", "__pos")
        elif with_lineage:
            df = df.drop("__seq")
        return df

    @staticmethod
    def _initial_default_gaps(manifest: dict, declared) -> dict:
        """{declared column → (initial-default value, set of data files
        that LACK the column under any historical name)} for fields
        carrying an Iceberg v3 initial-default. Empty for tables without
        defaults (the common case — zero cost). Presence is decided from
        manifest stats (the ``__cols`` inventory when present, else any
        recorded min/max or null-count key); only legacy files with no
        usable stats fall back to one footer read (metadata-only)."""
        targets = []
        for f in declared.fields:
            md = f.metadata or {}
            if md.get("initial_default") is not None:
                targets.append(
                    (
                        f.name,
                        md["initial_default"],
                        [f.name, *md.get("prior_names", [])],
                    )
                )
        if not targets:
            return {}
        stats = manifest.get("stats") or {}
        lack: dict[str, set] = {name: set() for name, _, _ in targets}
        footer_cache: dict[str, set] = {}
        for fp in manifest["files"]:
            st = stats.get(fp) or {}
            cols = st.get("__cols")
            known = None
            if cols is None:
                known = {
                    k for k in st if not k.startswith("__")
                } | set(st.get("__nulls") or {})
            for name, _, cands in targets:
                if cols is not None:
                    present = any(c in cols for c in cands)
                elif any(c in known for c in cands):
                    present = True
                else:
                    if fp not in footer_cache:
                        from . import encryption as _E

                        footer_cache[fp] = set(
                            (
                                _E.sidecar_schema(fp)
                                if _E.is_encrypted_file(fp)
                                else __import__(
                                    "pyarrow.parquet", fromlist=["x"]
                                ).read_schema(fp)
                            ).names
                        )
                    present = any(c in footer_cache[fp] for c in cands)
                if not present:
                    lack[name].add(fp)
        return {
            name: (dflt, lack[name])
            for name, dflt, _ in targets
            if lack[name]
        }

    # -- Puffin-style NDV table statistics (Iceberg table statistics) -----
    #
    # ``analyze()`` computes per-column distinct-count sketches with the
    # PORTABLE integer HLL (p=9, md5-prefix hash — the cross-engine-exact
    # recipe of portable_hll_distinct_rollup) and persists them as a
    # sidecar blob under <table>/stats/, one per analyzed snapshot —
    # Iceberg's Puffin statistics files (apache-datasketches-theta-v1
    # blobs keyed by snapshot) re-expressed with the engine's own
    # portable sketch. Registers are MERGEABLE (max per bucket), so an
    # append-only table re-analyzes in O(new files); any rewrite falls
    # back to a full recompute (sketches can't subtract).

    _NDV_P = 9
    _NDV_M = 1 << _NDV_P
    _NDV_MASK40 = (1 << 40) - 1
    # floor(alpha_512 * 512^2 * 2^40) — exact in int64
    _NDV_C = 207463357500372480

    @property
    def _stats_dir(self) -> str:
        return os.path.join(self.path, "stats")

    def _latest_ndv_file(self) -> str | None:
        if not os.path.isdir(self._stats_dir):
            return None
        cands = glob.glob(os.path.join(self._stats_dir, "ndv-v*.json"))
        if not cands:
            return None
        return max(
            cands,
            key=lambda p: int(
                os.path.basename(p)[5:-5]
            ),
        )

    @classmethod
    def _ndv_estimate(cls, registers: dict) -> int:
        """Integer-exact HLL estimate from {bucket: max rho} — the same
        arithmetic both engines compute (int64-scaled sum, one integer
        division; the linear-counting ln() sees only one of 512 discrete
        arguments, bit-equal across libms per test_properties)."""
        import math

        m = cls._NDV_M
        nb = len(registers)
        v = m - nb
        if v > 0:
            return int(math.floor(m * math.log(m / v) + 0.5))
        s_scaled = sum(1 << (40 - r) for r in registers.values())
        return cls._NDV_C // s_scaled

    def _default_analyze_columns(self, schema_json: str) -> list[str]:
        """Columns analyzable with exact cross-engine hash parity:
        integer family, string, and date (their canonical string casts
        agree between Spark and DuckDB). Floats/decimals stringify
        differently across engines — request them explicitly if
        approximate parity is acceptable."""
        ok = {"byte", "short", "integer", "long", "int", "string", "date"}
        return [
            f["name"]
            for f in json.loads(schema_json)["fields"]
            if isinstance(f["type"], str) and f["type"] in ok
        ]

    def analyze(self, columns: list[str] | None = None) -> dict:
        """Compute and persist per-column NDV statistics for the CURRENT
        snapshot (Iceberg's ``ANALYZE TABLE`` / Puffin statistics file).

        Incremental by construction: when the previous stats file's
        covered set is a SUBSET of the current files (append-only
        history since), only the new files are scanned and their
        registers merge into the carried ones (HLL max-merge) — the
        100-TB shape. Any rewrite (compaction, CoW) voids subtraction,
        so coverage mismatch triggers a full recompute, loudly recorded
        in the stats file's ``mode``.

        Sketches are computed over RAW file contents (Iceberg data-file
        statistics semantics): rows pending merge-on-read deletion still
        count until a rewrite materializes them away.

        Also records per-file row counts (``file_rows``) — the
        row-count fallback stats-driven planning uses when a manifest
        predates ``__rows`` tracking (see :meth:`changelog`)."""
        v = self.current_version()
        manifest = self._read_manifest(v)
        schema_json = manifest.get("schema")
        if schema_json is None:
            raise ValueError("analyze requires a declared table schema")
        if columns is None:
            columns = self._default_analyze_columns(schema_json)
        declared = {
            f["name"] for f in json.loads(schema_json)["fields"]
        }
        missing = [c for c in columns if c not in declared]
        if missing:
            raise ValueError(f"no such columns: {missing}")
        if not columns:
            raise ValueError("no analyzable columns")
        files = sorted(manifest["files"])
        prev = None
        prev_path = self._latest_ndv_file()
        if prev_path:
            with open(prev_path) as fh:
                prev = json.load(fh)
        incremental = (
            prev is not None
            and sorted(prev.get("columns", {})) == sorted(columns)
            and set(prev.get("files", [])) <= set(files)
        )
        todo = (
            [f for f in files if f not in set(prev["files"])]
            if incremental
            else files
        )
        registers: dict[str, dict[int, int]] = {c: {} for c in columns}
        file_rows: dict[str, int] = (
            dict(prev.get("file_rows", {})) if incremental else {}
        )
        if incremental:
            for c in columns:
                registers[c] = {
                    int(b): r
                    for b, r in prev["columns"][c]["registers"].items()
                }
        if todo:
            from ..functions.hashing import hash64

            df = self._scan_files(todo, None, with_pos=True)
            norm = F.regexp_replace(F.col("__file"), "^file:/+", "/")
            pairs = F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col"),
                        hash64(F.col(c).cast("string")).alias("h"),
                    )
                    for c in columns
                ]
            )
            ex = df.select(F.explode(pairs).alias("p")).select(
                "p.col", "p.h"
            ).filter(F.col("h").isNotNull())
            w = F.shiftright(F.col("h"), self._NDV_P).bitwiseAND(
                F.lit(self._NDV_MASK40)
            )
            rho = F.when(w == 0, F.lit(40)).otherwise(
                F.bit_count(w.bitwiseAND(-w) - 1) + 1
            )
            regs = (
                ex.select(
                    "col",
                    (F.col("h") % self._NDV_M).alias("bucket"),
                    rho.alias("rho"),
                )
                .groupBy("col", "bucket")
                .agg(F.max("rho").alias("r"))
                .collect()  # bounded: |columns| x 512 rows
            )
            for row in regs:
                b, r = int(row["bucket"]), int(row["r"])
                cur = registers[row["col"]]
                if r > cur.get(b, 0):
                    cur[b] = r
            counts = (
                df.groupBy(norm.alias("f")).count().collect()
            )  # bounded: |new files| rows
            for row in counts:
                file_rows[row["f"]] = int(row["count"])
        blob = {
            "version": v,
            "mode": "incremental" if incremental else "full",
            "files": files,
            "file_rows": {f: file_rows.get(f) for f in files},
            "columns": {
                c: {
                    "registers": {
                        str(b): r for b, r in sorted(registers[c].items())
                    },
                    "ndv": self._ndv_estimate(registers[c]),
                }
                for c in columns
            },
        }
        os.makedirs(self._stats_dir, exist_ok=True)
        _publish_sidecar(
            os.path.join(self._stats_dir, f"ndv-v{v}.json"), blob
        )
        return {
            "version": v,
            "mode": blob["mode"],
            "analyzed_files": len(todo),
            "ndv": {c: blob["columns"][c]["ndv"] for c in columns},
        }

    def statistics(self) -> DataFrame:
        """Metadata table of persisted NDV statistics (Iceberg's
        table-statistics listing): one row per (stats snapshot, column)
        with the estimate, coverage, and staleness vs the CURRENT
        snapshot's file set. Pure sidecar metadata — no data IO."""
        rows = []
        cur_files = set(
            self._read_manifest(self.current_version())["files"]
        )
        for p in sorted(
            glob.glob(os.path.join(self._stats_dir, "ndv-v*.json"))
        ):
            with open(p) as fh:
                blob = json.load(fh)
            stale = set(blob.get("files", [])) != cur_files
            for c, entry in sorted(blob.get("columns", {}).items()):
                rows.append(
                    (
                        int(blob["version"]),
                        c,
                        int(entry["ndv"]),
                        len(blob.get("files", [])),
                        blob.get("mode"),
                        stale,
                    )
                )
        return self.spark.createDataFrame(
            rows,
            "stats_version int, column_name string, ndv long,"
            " n_files int, mode string, stale boolean",
        )

    def _stats_file_rows(self) -> dict[str, int]:
        """Per-file row counts from the newest analyze() sidecar — the
        planning fallback for manifests that predate ``__rows`` stats."""
        p = self._latest_ndv_file()
        if not p:
            return {}
        with open(p) as fh:
            blob = json.load(fh)
        return {
            f: int(n)
            for f, n in (blob.get("file_rows") or {}).items()
            if n is not None
        }

    def _attach_lineage_cols(self, df: DataFrame, manifest: dict) -> DataFrame:
        """Compute ``_row_id`` / ``_last_updated_version`` from the
        manifest's per-file ``first_row_id`` bases plus the parquet
        reader's physical row position. A tiny (file → base) table is
        broadcast-joined on the row's ``_metadata.file_path`` — O(files)
        metadata, never a shuffle of the data side. Materialized
        ``__row_id`` / ``__last_updated`` columns (written by rewrites)
        take precedence; rows without them inherit ``base + position``
        and the file's sequence number, the Iceberg v3 inheritance
        rule. Applied BEFORE MoR delete anti-joins, so lineage sees the
        same physical coordinates the deletes target; the anti-join then
        removes dead rows, lineage intact."""
        bases = manifest.get("row_ids")
        if bases is None:
            raise ValueError(
                "row lineage unavailable for this snapshot: it predates "
                "lineage tracking or is a branch-chain manifest (ids are "
                "assigned at publish) — commit once (any write) to assign"
            )
        # the reader reports file:///-URIs; manifests store plain paths
        norm = F.regexp_replace(F.col("__file"), "^file:/+", "/")
        files = manifest["files"]
        known = [f for f in files if bases.get(f) is not None]
        if len(known) < len(files) and "__row_id" not in df.columns:
            # a scanned file with no first_row_id base would silently
            # yield NULL _row_id — raise the same loud error as the DSv2
            # batch reader instead (ADVICE r6; the only legitimate
            # base-less files are rewrites that MATERIALIZE __row_id,
            # handled by the physical-column precedence below)
            raise ValueError(
                f"row lineage: {len(files) - len(known)} data files carry "
                "no first_row_id (committed onto a pre-lineage table "
                "without backfill) — commit once (any write) to assign"
            )
        if len(files) <= 64:
            # small scans (every rewrite at test scale, most narrow
            # reads): inline the file→base map as a literal expression —
            # no broadcast exchange, no join stage (the join path cost
            # ~0.3-0.6 s of fixed plan machinery PER REWRITE at sf0.1,
            # the r6 bench regression on the CoW/MoR update queries)
            if known:
                pairs: list = []
                for f in known:
                    pairs += [F.lit(f), F.lit(int(bases[f]))]
                base_col = F.element_at(F.create_map(*pairs), norm)
            else:
                base_col = F.lit(None).cast("long")
            df = df.withColumn("__lin_base", base_col)
        else:
            # wide scans: a tiny (file, base) relation broadcast-joined —
            # O(files) metadata, never a shuffle of the data side
            rows = [(f, bases.get(f)) for f in files]
            bdf = self.spark.createDataFrame(
                rows, "__lin_file string, __lin_base long"
            )
            df = df.join(
                F.broadcast(bdf), norm == F.col("__lin_file"), "left"
            ).drop("__lin_file")
        phys_rid = (
            F.col("__row_id")
            if "__row_id" in df.columns
            else F.lit(None).cast("long")
        )
        phys_upd = (
            F.col("__last_updated")
            if "__last_updated" in df.columns
            else F.lit(None).cast("long")
        )
        return (
            df.withColumn(
                "_row_id",
                F.coalesce(phys_rid, F.col("__lin_base") + F.col("__pos")),
            )
            .withColumn(
                "_last_updated_version",
                F.coalesce(phys_upd, F.col("__seq").cast("long")),
            )
            .drop("__lin_base", "__row_id", "__last_updated")
        )

    @staticmethod
    def _schema_renames(schema_json: str | None) -> dict[str, list[str]]:
        """current name → historical names, from the schema's per-field
        ``prior_names`` metadata."""
        if not schema_json:
            return {}
        return {
            f["name"]: md["prior_names"]
            for f in json.loads(schema_json)["fields"]
            if (md := f.get("metadata") or {}).get("prior_names")
        }

    @staticmethod
    def _file_overlaps(
        file_stats: dict | None, where: dict[str, tuple]
    ) -> bool:
        """True unless the file's recorded [min,max] provably excludes the
        queried range (unknown stats → conservatively kept)."""
        if not file_stats:
            return True
        for col, (lo, hi) in where.items():
            rng = file_stats.get(col)
            if rng is None:
                continue
            fmin, fmax = rng
            if lo is not None and fmax < lo:
                return False
            if hi is not None and fmin > hi:
                return False
        return True

    @staticmethod
    def _null_prunable(
        file_stats: dict | None, null_predicates: dict[str, bool]
    ) -> bool:
        """True if the file provably yields no rows for the null
        predicates (col → True = IS NULL, False = IS NOT NULL), from
        the manifest's per-column null counts (Iceberg's
        null_value_counts). Unknown counts → kept."""
        if not file_stats:
            return False
        nulls = file_stats.get("__nulls") or {}
        rows = file_stats.get("__rows")
        for col, want_null in null_predicates.items():
            n = nulls.get(col)
            if n is None:
                continue
            if want_null and n == 0:
                return True
            if not want_null and rows is not None and n == rows:
                return True
        return False

    def _prune_files(
        self,
        manifest: dict,
        where: dict[str, tuple],
        null_predicates: dict[str, bool] | None = None,
    ) -> list[str]:
        stats = manifest.get("stats", {})
        kept = [
            f
            for f in manifest["files"]
            if self._file_overlaps(stats.get(f), where)
            and not (
                null_predicates
                and self._null_prunable(stats.get(f), null_predicates)
            )
        ]
        # point predicates additionally consult per-file bloom sidecars
        # (built by add_bloom_filters; absent -> conservatively kept)
        points = {
            col: lo for col, (lo, hi) in where.items()
            if lo is not None and lo == hi
        }
        if points:
            kept = [
                f
                for f in kept
                if all(
                    self._bloom_may_contain(f, col, val)
                    for col, val in points.items()
                )
            ]
        return kept

    # -- bloom-filter sidecars (point-lookup file skipping) -------------------
    #
    # min/max stats cannot prune equality predicates on high-cardinality
    # UNSORTED keys (every file's range spans everything). A tiny bloom
    # per (file, column) — the Iceberg Puffin / parquet-bloom idea — lets
    # a point lookup skip files that provably lack the value. Sidecars
    # live OUTSIDE the manifest, keyed by the data file's path hash:
    # data files are immutable and per-commit unique, so a sidecar can
    # never go stale and no commit-path threading is needed (an
    # ANALYZE-style auxiliary index, not table state).

    BLOOM_BITS = 8192  # 1 KiB per (file, column)
    BLOOM_HASHES = 4

    @property
    def _bloom_dir(self) -> str:
        return os.path.join(self.path, "blooms")

    def _bloom_sidecar_path(self, data_file: str) -> str:
        import hashlib

        h = hashlib.md5(data_file.encode()).hexdigest()[:16]
        return os.path.join(self._bloom_dir, f"{h}.json")

    @classmethod
    def _bloom_positions(cls, value) -> list[int]:
        import hashlib

        return [
            int(
                hashlib.md5(f"{i}|{value}".encode()).hexdigest()[:15], 16
            )
            % cls.BLOOM_BITS
            for i in range(cls.BLOOM_HASHES)
        ]

    def add_bloom_filters(self, cols: list[str]) -> int:
        """Build bloom sidecars for the CURRENT snapshot's data files on
        the given columns (skipping files already indexed). Returns the
        number of files indexed in this pass.

        Scale: one column-pruned read per un-indexed file; on a cluster
        this fans out as a distributed job (here: driver thread pool,
        same shape as _collect_file_stats). 1 KiB per (file, column) —
        a 10^6-file table indexes one column in ~1 GiB of sidecars."""
        from concurrent.futures import ThreadPoolExecutor

        import pyarrow.parquet as pq

        manifest = self._read_manifest(self.current_version())
        os.makedirs(self._bloom_dir, exist_ok=True)
        todo = [
            f
            for f in manifest["files"]
            if not os.path.exists(self._bloom_sidecar_path(f))
        ]

        def index_one(f: str) -> None:
            from . import encryption as E

            schema_names = (
                E.sidecar_schema(f)
                if E.is_encrypted_file(f)
                else pq.read_schema(f)
            ).names
            want = [c for c in cols if c in schema_names]
            per_col: dict[str, str] = {}
            if want:
                tbl = E.read_table_auto(f, self._maybe_key(), columns=want)
                for c in want:
                    bits = bytearray(self.BLOOM_BITS // 8)
                    for val in tbl.column(c).to_pylist():
                        if val is None:
                            continue
                        for pos in self._bloom_positions(val):
                            bits[pos // 8] |= 1 << (pos % 8)
                    per_col[c] = bytes(bits).hex()
            with open(self._bloom_sidecar_path(f), "w") as fh:
                json.dump(per_col, fh)

        if todo:
            with ThreadPoolExecutor(
                max_workers=min(16, len(todo))
            ) as ex:
                list(ex.map(index_one, todo))
        self._bloom_cache = {}
        return len(todo)

    def _bloom_may_contain(self, data_file: str, col: str, value) -> bool:
        """False only when the sidecar PROVES the value absent."""
        cache = getattr(self, "_bloom_cache", None)
        if cache is None:
            cache = self._bloom_cache = {}
        if data_file not in cache:
            p = self._bloom_sidecar_path(data_file)
            if not os.path.exists(p):
                cache[data_file] = {}
            else:
                with open(p) as fh:
                    cache[data_file] = {
                        c: bytes.fromhex(h) for c, h in json.load(fh).items()
                    }
        bits = cache[data_file].get(col)
        if bits is None:
            return True
        return all(
            bits[pos // 8] & (1 << (pos % 8))
            for pos in self._bloom_positions(value)
        )

    @staticmethod
    def _cmp_part_vals(a: str, b: str) -> int:
        """Order two hive-encoded partition values: numerically when both
        parse, else lexicographically (date-format transforms are
        fixed-width, so string order == chronological order)."""
        try:
            fa, fb = float(a), float(b)
            return (fa > fb) - (fa < fb)
        except ValueError:
            return (a > b) - (a < b)

    def _partition_prune(
        self, manifest: dict, where: dict[str, tuple], files: list[str]
    ) -> list[str]:
        """Hidden-partition pruning: a predicate on a SOURCE column is
        mapped through each transform that partitions on it, and files
        whose partition tuple provably excludes the range are dropped.
        Monotonic transforms (identity/days/…/truncate) admit range
        pruning; bucket admits point (lo == hi) pruning. Unknown or NULL
        partition values are conservatively kept; the residual row filter
        keeps results exact regardless."""
        specs = [
            PartitionSpec(**d) for d in manifest.get("partition_specs", [])
        ]
        parts = manifest.get("partitions", {})
        if not specs or not parts:
            return files
        null_marker = "__HIVE_DEFAULT_PARTITION__"
        for col, (lo, hi) in where.items():
            for sp in (s for s in specs if s.col == col):
                if sp.kind == "bucket":
                    if lo is None or lo != hi:
                        continue
                    b = sp.transform_value(self.spark, lo)
                    files = [
                        f
                        for f in files
                        if parts.get(f, {}).get(sp.field_name)
                        in (None, null_marker, b)
                    ]
                elif sp.monotonic:
                    tlo = (
                        sp.transform_value(self.spark, lo)
                        if lo is not None
                        else None
                    )
                    thi = (
                        sp.transform_value(self.spark, hi)
                        if hi is not None
                        else None
                    )

                    def keep(f: str) -> bool:
                        v = parts.get(f, {}).get(sp.field_name)
                        if v is None or v == null_marker:
                            return True
                        if tlo is not None and self._cmp_part_vals(v, tlo) < 0:
                            return False
                        if thi is not None and self._cmp_part_vals(v, thi) > 0:
                            return False
                        return True

                    files = [f for f in files if keep(f)]
        return files

    def scan(
        self,
        where: dict[str, tuple] | None = None,
        version: int | None = None,
        null_predicates: dict[str, bool] | None = None,
        geo_bbox: dict[str, tuple] | None = None,
    ) -> DataFrame:
        """Stats-pruned scan: ``where`` maps column → inclusive
        ``(lo, hi)`` range (``None`` = open end). Files whose
        manifest-recorded min/max provably exclude the range are skipped
        WITHOUT being opened — Iceberg's data-file skipping, one level
        above parquet row-group pruning. The residual row filter is then
        applied, so results are exact regardless of pruning.

        ``geo_bbox`` maps a declared geometry column (see
        ``overwrite(geo_cols=...)``) → query window ``(xmin, ymin,
        xmax, ymax)``; result rows are those whose geometry ENVELOPE
        intersects the window (Iceberg v3 geo-stats semantics). File
        skipping runs on the manifest's ``__geo_*`` shred stats; the
        residual runs JVM-side on the shred columns when every kept
        file materializes them, else falls back to an exact
        Arrow-batched envelope recompute from the WKB bytes — correct
        even for files written before the geo declaration.

        Scale: this is what makes point/range lookups on a 10^6-file
        table planning-bound instead of IO-bound — the manifest scan is
        O(files) driver-side metadata, no footer reads, no tasks for
        skipped files. Pairs with `rewrite_data_files(sort_by=...)` /
        `zorder_by=...`, which cluster values so files become prunable.
        """
        where = dict(where or {})
        v = self.current_version() if version is None else version
        manifest = self._read_manifest(v)
        geo_pred: dict[str, tuple] = {}
        if geo_bbox:
            declared_geo = set(self._geo_columns())
            for c, (x0, y0, x1, y1) in geo_bbox.items():
                if c not in declared_geo:
                    raise ValueError(
                        f"{c!r} is not a declared geometry column "
                        "(overwrite(geo_cols=...) / the 'geo.columns' "
                        "property)"
                    )
                geo_pred[f"__geo_{c}_xmin"] = (None, x1)
                geo_pred[f"__geo_{c}_xmax"] = (x0, None)
                geo_pred[f"__geo_{c}_ymin"] = (None, y1)
                geo_pred[f"__geo_{c}_ymax"] = (y0, None)
        kept = self._prune_files(
            manifest, {**where, **geo_pred}, null_predicates
        )
        kept = self._partition_prune(manifest, where, kept)
        if not kept:
            return self._project_to_schema(manifest).limit(0)
        stats = manifest.get("stats", {})
        shred_ready = {
            c: all(
                f"__geo_{c}_xmin"
                in ((stats.get(f) or {}).get("__cols") or [])
                for f in kept
            )
            for c in (geo_bbox or {})
        }
        extra = [
            k
            for c, ok in shred_ready.items()
            if ok
            for k in (
                f"__geo_{c}_xmin",
                f"__geo_{c}_xmax",
                f"__geo_{c}_ymin",
                f"__geo_{c}_ymax",
            )
        ]
        df = self._project_to_schema(
            {**manifest, "files": kept}, extra_cols=extra
        )
        for col, (lo, hi) in where.items():
            if lo is not None:
                df = df.filter(F.col(col) >= lo)
            if hi is not None:
                df = df.filter(F.col(col) <= hi)
        for col, want_null in (null_predicates or {}).items():
            df = df.filter(
                F.col(col).isNull() if want_null else F.col(col).isNotNull()
            )
        for c, (x0, y0, x1, y1) in (geo_bbox or {}).items():
            if shred_ready[c]:
                df = df.filter(
                    (F.col(f"__geo_{c}_xmin") <= float(x1))
                    & (F.col(f"__geo_{c}_xmax") >= float(x0))
                    & (F.col(f"__geo_{c}_ymin") <= float(y1))
                    & (F.col(f"__geo_{c}_ymax") >= float(y0))
                )
            else:
                from ..functions.geo import geo_bbox_filter

                df = df.filter(
                    geo_bbox_filter(F.col(c), (x0, y0, x1, y1))
                )
        if extra:
            df = df.drop(*extra)
        return df

    def read_incremental(
        self,
        since_version: int | str,
        to_version: int | str | None = None,
    ) -> DataFrame:
        """Rows ADDED between two snapshots (exclusive/inclusive) — the
        incremental-consumption path (Iceberg's ``start-snapshot-id`` /
        ``end-snapshot-id`` scan): a downstream job checkpoints the last
        version it processed and reads only newer files. Either bound
        may be a TAG NAME ("everything since ``training-v1``") — tags
        are how a consumer cites a durable position without holding a
        raw version number.

        Only append snapshots are incremental-safe; an intervening
        overwrite/merge rewrites history and raises ValueError (matching
        Iceberg, whose incremental scan supports append snapshots only).

        Scale: this is THE pattern that replaces the reference's
        recompute-everything daily overwrite — each pipeline tick touches
        new files only, so cost tracks arrival rate, not table size.
        """
        since_version = self._resolve_version(since_version)
        to = (
            self.current_version()
            if to_version is None
            else self._resolve_version(to_version)
        )
        if to < since_version:
            raise ValueError(f"to_version {to} < since_version {since_version}")
        for v in range(since_version + 1, to + 1):
            op = self._read_manifest(v)["operation"]
            if op not in ("append", "add-files"):
                raise ValueError(
                    f"non-append snapshot v{v} ({op}) breaks incremental read"
                )
        manifest = self._read_manifest(to)
        base = (
            set(self._read_manifest(since_version)["files"])
            if since_version
            else set()
        )
        new_files = [f for f in manifest["files"] if f not in base]
        if not new_files:
            return self._project_to_schema(manifest).limit(0)
        return self._project_to_schema({**manifest, "files": new_files})

    def merge_into(
        self,
        source: DataFrame,
        on: list[str],
        update_cols: dict[str, F.Column] | None = None,
        insert_unmatched: bool = True,
        summary_extra: dict | None = None,
        delete_condition: F.Column | None = None,
        evolve_schema: bool = False,
        prune_on: str | None = None,
        delete_unmatched_target: bool = False,
        source_rows_hint: int | None = None,
        broadcast_threshold_rows: int | None = None,
    ) -> dict:
        """MERGE INTO (upsert): rows matched on ``on`` are updated with
        ``update_cols`` expressions (evaluated over target columns and
        ``source.<col>`` references), unmatched source rows are inserted,
        unmatched target rows pass through. ``delete_condition`` is the
        ``WHEN MATCHED AND <cond> THEN DELETE`` clause: matched rows
        satisfying it (an expression over ``t.<col>``/``s.<col>``) are
        dropped instead of updated — the CDC-retraction / GDPR-erasure
        arm of a full three-clause MERGE. ``delete_unmatched_target``
        adds the fourth clause (``WHEN NOT MATCHED BY SOURCE THEN
        DELETE``): target rows absent from the source are dropped,
        turning the merge into a FULL SYNC (mirror the source of record,
        e.g. replicating a dimension snapshot). Incompatible with
        ``prune_on``: file pruning carries not-touched files verbatim,
        but under full sync those very rows (keys outside the source's
        range) are exactly the ones to delete — the combination raises.
        ``evolve_schema`` appends
        source-only columns to the table schema during the merge
        (pre-existing target rows surface them as NULL) — Iceberg's
        ``spark.sql.iceberg.merge-schema`` behavior; combined with
        per-snapshot schemas, time travel still shows the old shape.

        The reference configures IcebergSparkSessionExtensions precisely to
        enable MERGE (constant.py:48) but never issues one; with the jar
        present this is SQL ``MERGE INTO``. Here it compiles to the
        equivalent DataFrame plan: one outer join + projection, then an
        overwrite snapshot (op='merge').

        Scale: a single shuffle on the merge key for the join — and with
        ``prune_on`` (a merge-key column), only files whose manifest
        min/max overlap the SOURCE's key range are rewritten; everything
        else carries by path (copy-on-write Iceberg's touched-file
        scope). A row in an excluded file has a key outside the source's
        range, so it provably matches nothing — it can only be a
        pass-through, and carrying the file verbatim IS the pass-through.
        Unmatched-source inserts land in the new files either way.

        Isolation: committed under :meth:`_commit_rmw` — the merged data
        is always derived from the commit's direct parent; a concurrent
        writer triggers a full recompute, never a lost update (caught by
        test_concurrent_merges_linearize)."""
        # reserved lineage names fail loudly on EVERY write path — a
        # source carrying __row_id/__last_updated used to be silently
        # projected away here, asymmetric with append/stage (ADVICE r6)
        self._reject_reserved_cols(source)
        if delete_unmatched_target and prune_on is not None:
            raise ValueError(
                "delete_unmatched_target requires a full-table merge "
                "(prune_on would carry rows that must be deleted)"
            )
        key_range = None
        src_rows = source_rows_hint
        if prune_on is not None:
            if prune_on not in on:
                raise ValueError(
                    f"prune_on {prune_on!r} must be one of the merge keys"
                )
            # piggyback the source row count on the agg the pruning
            # already pays for — it feeds the broadcast decision below
            row = source.agg(
                F.min(prune_on).alias("lo"),
                F.max(prune_on).alias("hi"),
                F.count(F.lit(1)).alias("n"),
            ).first()
            key_range = (row["lo"], row["hi"])
            src_rows = row["n"]

        def compute(base: int) -> tuple[dict, list[str]]:
            manifest = self._read_manifest(base)
            carried: list[str] = []
            if key_range is not None and key_range[0] is not None:
                touched = self._prune_files(
                    manifest, {prune_on: key_range}
                )
                carried = [
                    f for f in manifest["files"] if f not in set(touched)
                ]
                target_df = (
                    self._project_with_lineage_cols(
                        {**manifest, "files": touched}
                    )
                    if touched
                    else self._project_with_lineage_cols(manifest).limit(0)
                )
            else:
                target_df = self._project_with_lineage_cols(manifest)
            # Explicit presence markers, NOT key-NULL-ness: a target row
            # whose merge-key column is legitimately NULL must survive as
            # "target only", not be misread as an unmatched source row and
            # overwritten with NULLs. (Such rows also never equi-join.)
            target = target_df.withColumn("_t_present", F.lit(True)).alias("t")
            src = source.withColumn("_s_present", F.lit(True)).alias("s")
            cond = [F.col(f"t.{c}") == F.col(f"s.{c}") for c in on]
            # join-shape selection (VERDICT r5 #6): a FULL OUTER join is
            # needed only to surface source-only rows — i.e. when
            # unmatched sources insert. Update-only / delete-only /
            # full-sync merges reduce to a LEFT OUTER join (every target
            # row survives the join; unmatched-target handling filters on
            # the s side), and LEFT OUTER supports a broadcast build of
            # the source — Spark refuses broadcast for full outer, so AQE
            # alone can never make this plan. With the source row count
            # known (free when prune_on runs its agg, or via
            # source_rows_hint), a small source broadcasts: the big
            # target side is NOT shuffled at all.
            join_type = "full_outer" if insert_unmatched else "left_outer"
            if (
                join_type == "left_outer"
                and src_rows is not None
                and src_rows
                <= (
                    broadcast_threshold_rows
                    if broadcast_threshold_rows is not None
                    else self._int_property(
                        "write.merge.broadcast-threshold-rows"
                    )
                )
            ):
                src = F.broadcast(src)
            joined = target.join(src, cond, join_type)

            t_cols = target_df.columns  # same snapshot as the join target
            matched = F.col("t._t_present").isNotNull() & F.col(
                "s._s_present"
            ).isNotNull()
            only_src = F.col("t._t_present").isNull()
            if delete_condition is not None:
                joined = joined.filter(
                    ~(matched & F.coalesce(delete_condition, F.lit(False)))
                )
            if not insert_unmatched:
                # drop source-only rows outright; without this they'd
                # survive the projection below as all-NULL target rows
                joined = joined.filter(~only_src)
            if delete_unmatched_target:
                # WHEN NOT MATCHED BY SOURCE THEN DELETE (full sync):
                # keep only rows with a source side present
                joined = joined.filter(F.col("s._s_present").isNotNull())

            lineage_names = ("__row_id", "__last_updated")
            projections = []
            for c in t_cols:
                if c in lineage_names:
                    continue  # handled below — never user-updatable
                expr = F.col(f"t.{c}")
                if update_cols and c in update_cols:
                    expr = F.when(matched, update_cols[c]).otherwise(expr)
                if insert_unmatched:
                    src_val = (
                        F.col(f"s.{c}") if c in source.columns else F.lit(None)
                    )
                    expr = F.when(only_src, src_val).otherwise(expr)
                projections.append(expr.alias(c))
            if evolve_schema:
                # source-only columns join the schema; rows with no source
                # match (target-only) carry NULL via the outer join itself
                projections += [
                    F.col(f"s.{c}").alias(c)
                    for c in source.columns
                    if c not in t_cols
                    and c != "_s_present"
                    and c not in lineage_names
                ]
            # row lineage through the merge: target rows (updated or
            # pass-through) keep their __row_id; inserted rows carry a
            # t-side NULL from the outer join and inherit base+pos at
            # read. __last_updated resets to NULL (= this commit) for
            # UPDATED rows only; pass-throughs keep their old version.
            upd_expr = F.col("t.__last_updated")
            if update_cols:
                upd_expr = F.when(
                    matched, F.lit(None).cast("long")
                ).otherwise(upd_expr)
            projections += [
                F.col("t.__row_id").alias("__row_id"),
                upd_expr.alias("__last_updated"),
            ]
            merged = joined.select(*projections)
            # ADVICE r5 (medium): MERGE must consult CHECK constraints —
            # an update expression can write violating values. One
            # boolean aggregation over the rewrite output, only when
            # constraints exist (zero cost otherwise).
            if self.check_constraints():
                self._enforce_constraints(merged.drop(*lineage_names))
            data_schema_json = merged.drop(*lineage_names).schema.json()

            snap_id, files = self._write_data_files(merged)
            stats = self._collect_file_stats(files)
            old_stats = manifest.get("stats", {})
            old_seq = manifest.get("file_seq", {})
            out = self._snapshot(
                "merge",
                carried + files,
                base,
                schema_json=self._merge_schema_json(
                    manifest.get("schema"), data_schema_json
                )
                if carried
                else data_schema_json,
                stats={
                    **{f: old_stats[f] for f in carried if f in old_stats},
                    **stats,
                },
                file_seq={
                    **{f: old_seq.get(f, 0) for f in carried},
                    **{f: base + 1 for f in files},
                },
                # pruned merge: pending MoR deletes may still claim rows
                # in CARRIED files (their seqs are unchanged); rewritten
                # rows had deletes applied and their new seq is exempt.
                # Full merge rewrote everything, so nothing stays pending.
                delete_files=(
                    manifest.get("delete_files", []) if carried else []
                ),
                partition_specs=manifest.get("partition_specs"),
                partitions=manifest.get("partitions"),
                added=len(files),
                carried=len(carried),
                **(summary_extra or {}),
            )
            return out, [snap_id]

        return self._commit_rmw(compute)

    def delete_where(
        self,
        condition: F.Column,
        prune: dict[str, tuple] | None = None,
    ) -> dict:
        """Copy-on-write DELETE: rows matching ``condition`` are removed
        by rewriting only the data files that can contain them; every
        other file carries into the new snapshot verbatim (path AND
        stats), exactly like Iceberg's copy-on-write ``DELETE FROM``.

        ``prune`` is the optional ``{col: (lo, hi)}`` range form of the
        predicate for manifest-stats file selection — files whose
        recorded min/max don't overlap are provably unaffected and are
        NOT read, NOT rewritten. ``condition`` remains the row-exact
        truth; a conservative (or absent) ``prune`` only costs extra
        rewriting, never correctness.

        Scale: delete cost tracks the files that hold matching rows, not
        table size — on a sorted/z-ordered 10^6-file table a narrow
        delete rewrites a handful of files. (Merge-on-read delete files
        are the next step Iceberg offers; copy-on-write is the simpler
        invariant: data files never need delete-vector merging.)
        """
        def compute(base: int) -> tuple[dict, list[str]]:
            manifest = self._read_manifest(base)
            touched = list(manifest["files"])
            if prune:
                # file stats AND partition tuples: hive-layout files do
                # not store the partition column, so stats alone cannot
                # scope a partition-predicate rewrite (the scan path
                # composes the same two prunes)
                touched = self._prune_files(manifest, prune)
                touched = self._partition_prune(manifest, prune, touched)
            untouched = [f for f in manifest["files"] if f not in set(touched)]
            old_stats = manifest.get("stats", {})
            scratch: list[str] = []
            new_files: list[str] = []
            new_stats: dict[str, dict] = {}
            if touched:
                # survivors carry their row ids into the replacement
                # files (materialized __row_id/__last_updated) — a CoW
                # delete never changes the identity of the rows it keeps
                kept = self._project_with_lineage_cols(
                    {**manifest, "files": touched}
                ).filter(~condition)
                snap_id, new_files = self._write_data_files(kept)
                scratch.append(snap_id)
                new_stats = self._collect_file_stats(new_files)
            stats = {
                **{f: old_stats[f] for f in untouched if f in old_stats},
                **new_stats,
            }
            old_seq = manifest.get("file_seq", {})
            return self._snapshot(
                "delete",
                untouched + new_files,
                base,
                schema_json=manifest.get("schema"),
                stats=stats,
                file_seq={
                    **{f: old_seq.get(f, 0) for f in untouched},
                    **{f: base + 1 for f in new_files},
                },
                # pending MoR deletes may still hit carried files (their
                # seq is unchanged); rewritten files were read with
                # deletes applied and get a newer seq, so they're exempt
                delete_files=manifest.get("delete_files", []),
                # partition layout survives the delete: carried files
                # keep their tuples; rewritten files have none and are
                # conservatively kept by _partition_prune (dropping the
                # specs here would silently disable pruning table-wide)
                partition_specs=manifest.get("partition_specs"),
                partitions={
                    f: t
                    for f, t in manifest.get("partitions", {}).items()
                    if f in set(untouched)
                },
                added=len(new_files),
                rewritten=len(touched),
                carried=len(untouched),
            ), scratch

        return self._commit_rmw(compute)

    def overwrite_partitions_dynamic(self, df: DataFrame) -> dict:
        """DYNAMIC partition overwrite (Spark's
        ``partitionOverwriteMode=dynamic`` / Iceberg's dynamic
        INSERT OVERWRITE): replace exactly the partitions PRESENT in
        ``df`` — inferred from the data, no predicate to write — and
        carry every other partition untouched. The idempotent
        re-materialization primitive when the job knows which slices
        it recomputed only by what it produced.

        Requires a partitioned table; files WITHOUT a recorded
        partition tuple (written before the table adopted its spec)
        cannot be attributed to a partition and make the operation
        refuse loudly (compact with ``rewrite_small_files`` — which
        re-lays-out by spec — first) rather than silently leaving
        stale rows in a "replaced" partition.

        Scale: new data is written once (partition-laid-out, hash
        distribution); the commit drops old files by TUPLE match —
        O(affected partitions' files) metadata, no data read."""
        base_manifest = self._read_manifest(self.current_version())
        specs = base_manifest.get("partition_specs")
        if not specs:
            raise ValueError(
                "overwrite_partitions_dynamic requires a partitioned "
                "table (no partition spec recorded)"
            )
        spec_strs = [PartitionSpec(**d).spec_str for d in specs]
        self._enforce_constraints(df)
        _, new_files = self._write_data_files(
            df, partition_by=spec_strs, distribution="hash"
        )
        new_stats = self._collect_file_stats(new_files)
        new_parts = self._file_partitions(new_files)
        affected = {tuple(sorted(v.items())) for v in new_parts.values()}

        def compute(base: int) -> tuple[dict, list[str]]:
            manifest = self._read_manifest(base)
            parts = manifest.get("partitions", {})
            unattributed = [
                f for f in manifest["files"] if f not in parts
            ]
            if unattributed:
                raise ValueError(
                    "dynamic overwrite refused: "
                    f"{len(unattributed)} data files carry no partition "
                    "tuple (pre-spec writes); compact first so every "
                    "file is attributable"
                )
            removed = {
                f
                for f in manifest["files"]
                if tuple(sorted(parts[f].items())) in affected
            }
            carried = [f for f in manifest["files"] if f not in removed]
            old_stats = manifest.get("stats", {})
            old_seq = manifest.get("file_seq", {})
            return self._snapshot(
                "overwrite-dynamic",
                carried + new_files,
                base,
                schema_json=manifest.get("schema"),
                stats={
                    **{f: old_stats[f] for f in carried if f in old_stats},
                    **new_stats,
                },
                file_seq={
                    **{f: old_seq.get(f, 0) for f in carried},
                    **{f: base + 1 for f in new_files},
                },
                delete_files=manifest.get("delete_files", []),
                partition_specs=specs,
                partitions={
                    **{f: parts[f] for f in carried},
                    **new_parts,
                },
                added=len(new_files),
                replaced_partitions=len(affected),
                removed=len(removed),
            ), []

        return self._commit_rmw(compute)

    def overwrite_where(
        self,
        df: DataFrame,
        condition: F.Column,
        prune: dict[str, tuple] | None = None,
        validate: bool = True,
    ) -> dict:
        """Selective overwrite — Delta ``replaceWhere`` / Iceberg
        ``INSERT OVERWRITE`` with a filter: atomically delete every row
        matching ``condition`` and insert ``df``, in ONE snapshot. THE
        idempotent backfill primitive: re-running a partition's
        transform replaces exactly that partition's rows, never
        duplicating and never touching neighbors, regardless of how
        many times it retries.

        ``validate`` enforces Delta's contract that every inserted row
        satisfies ``condition`` (one boolean aggregation over the
        input); without it a buggy backfill could write rows OUTSIDE
        the slice it replaces, breaking idempotence. ``prune`` scopes
        the rewrite exactly as in delete_where — stats AND partition
        tuples — so a partition-scoped backfill rewrites only that
        partition's files and carries everything else by path.

        Scale: cost is O(files holding matching rows) + O(new data);
        the replaced slice's old files are dropped from the manifest
        (no tombstones, no read-side merge), and the whole operation is
        serialized by the same read-modify-write commit as merge —
        concurrent appends rebase, lost updates are impossible."""
        # ADVICE r5 (medium): replaceWhere consults CHECK constraints
        # on the inserted frame (survivors are unchanged, satisfied by
        # induction); also rejects reserved lineage column names
        self._enforce_constraints(df)
        if validate:
            bad = df.filter(
                ~F.coalesce(condition, F.lit(False))
            ).count()
            if bad:
                raise ValueError(
                    f"{bad} input rows violate the replace condition "
                    "(would write outside the replaced slice)"
                )
        # written ONCE; commit retries rebase metadata, never re-write
        _, add_files = self._write_data_files(df)
        add_stats = self._collect_file_stats(add_files)

        def compute(base: int) -> tuple[dict, list[str]]:
            manifest = self._read_manifest(base)
            touched = list(manifest["files"])
            if prune:
                touched = self._prune_files(manifest, prune)
                touched = self._partition_prune(manifest, prune, touched)
            untouched = [f for f in manifest["files"] if f not in set(touched)]
            old_stats = manifest.get("stats", {})
            scratch: list[str] = []
            new_files: list[str] = []
            new_stats: dict[str, dict] = {}
            if touched:
                # survivors of the replaced slice keep their row ids
                kept = self._project_with_lineage_cols(
                    {**manifest, "files": touched}
                ).filter(~F.coalesce(condition, F.lit(False)))
                snap_id, new_files = self._write_data_files(kept)
                scratch.append(snap_id)
                new_stats = self._collect_file_stats(new_files)
            old_seq = manifest.get("file_seq", {})
            return self._snapshot(
                "replace-where",
                untouched + new_files + add_files,
                base,
                schema_json=self._merge_schema_json(
                    manifest.get("schema"), df.schema.json()
                ),
                stats={
                    **{f: old_stats[f] for f in untouched if f in old_stats},
                    **new_stats,
                    **add_stats,
                },
                file_seq={
                    **{f: old_seq.get(f, 0) for f in untouched},
                    **{f: base + 1 for f in new_files + add_files},
                },
                delete_files=manifest.get("delete_files", []),
                partition_specs=manifest.get("partition_specs"),
                partitions={
                    f: t
                    for f, t in manifest.get("partitions", {}).items()
                    if f in set(untouched)
                },
                added=len(add_files),
                rewritten=len(touched),
                carried=len(untouched),
            ), scratch

        return self._commit_rmw(compute)

    def delete_where_mor(
        self, condition: F.Column, keys: list[str]
    ) -> dict:
        """Merge-on-read DELETE (Iceberg v2 equality deletes): instead of
        rewriting data files, write a small keys-only delete file listing
        the matching rows' ``keys``, and commit a snapshot that carries
        every data file UNTOUCHED. Readers anti-join the delete keys out;
        rows appended later are exempt via sequence numbers; the next
        ``rewrite_data_files`` materializes pending deletes away.

        The copy-on-write / merge-on-read trade: CoW (:meth:`delete_where`)
        pays at write time (rewrite touched files) and reads stay pure
        scans; MoR pays at read time (one broadcast anti-join) and the
        delete itself costs only the matching keys — the right choice for
        frequent small deletes (GDPR erasure, CDC retractions) on a table
        whose files are large. ``condition`` must be expressible over the
        current table; ``keys`` must uniquely identify the doomed rows
        (equality-delete contract).

        Scale: the delete commit writes O(matching keys) bytes regardless
        of table size — no data file is opened. Read amplification is one
        tiny broadcast anti-join until compaction clears it."""
        v = self.current_version()
        manifest = self._read_manifest(v)
        doomed = (
            self._project_to_schema(manifest)
            .filter(condition)
            .select(*keys)
            .distinct()
        )
        _, del_files = self._write_data_files(doomed)

        def build(parent: int) -> dict:
            prev = self._read_manifest(parent)
            # seq = the snapshot the predicate was EVALUATED against (v),
            # not parent+1: under a concurrent append (parent > v) the
            # delete must not claim rows it never saw — their file seq is
            # > v, so they stay exempt (Iceberg's sequence semantics)
            entry = {"files": del_files, "seq": v, "keys": keys}
            return self._snapshot(
                "delete-mor",
                prev["files"],
                parent,
                schema_json=prev.get("schema"),
                stats=prev.get("stats"),
                file_seq=prev.get("file_seq"),
                delete_files=prev.get("delete_files", []) + [entry],
                partition_specs=prev.get("partition_specs"),
                partitions=prev.get("partitions"),
                added=0,
                delete_key_files=len(del_files),
            )

        return self._commit_with_retry(build)

    def delete_where_pos(self, condition: F.Column) -> dict:
        """Merge-on-read POSITION delete (Iceberg v2's second delete-file
        flavor): record the physical coordinates (file path, row index)
        of the matching rows instead of key values. Readers anti-join on
        the coordinates, so — unlike equality deletes — no unique key is
        required and ONE of two bit-identical rows can be removed
        (row-level dedup without rewriting data files).

        Coordinates come from Spark's parquet-reader-generated
        ``_metadata.file_path`` / ``_metadata.row_index`` hidden columns —
        stable for committed files, which are immutable by construction.
        Existing pending deletes are applied BEFORE matching, so already-
        dead rows are not re-targeted.

        Scale: the delete commit writes O(matching rows) coordinate
        pairs; no data file is rewritten. Read amplification is one
        broadcast anti-join shared by ALL pending position deletes,
        until ``rewrite_data_files`` materializes them away.

        Isolation (r7): serializable read-modify-write — coordinates
        computed against a snapshot a concurrent rewrite replaced would
        target vanished paths and the delete would be silently lost
        (Iceberg's validateDataFilesExist failure mode); losing the
        race recomputes against the new tip instead."""

        def compute(base: int) -> tuple[dict | None, list[str]]:
            manifest = self._read_manifest(base)
            pending = manifest.get("delete_files", [])
            dvs = manifest.get("delete_vectors", {})
            df = self._scan_files(
                manifest["files"],
                manifest.get("file_seq"),
                with_seq=bool(pending),
                with_pos=True,
            )
            if pending or dvs:
                # keep coordinates through the anti-joins:
                # _apply_deletes drops them, so stash copies
                df = df.withColumn("__kf", F.col("__file")).withColumn(
                    "__kp", F.col("__pos")
                )
                df = self._apply_deletes(df, pending, delete_vectors=dvs)
                df = df.withColumn("__file", F.col("__kf")).withColumn(
                    "__pos", F.col("__kp")
                )
            doomed = df.filter(condition).select("__file", "__pos")
            snap_id, del_files = self._write_data_files(doomed)
            entry = {
                "files": del_files,
                "seq": base + 1,
                "keys": [],
                "pos": True,
            }
            return self._snapshot(
                "delete-pos",
                manifest["files"],
                base,
                schema_json=manifest.get("schema"),
                stats=manifest.get("stats"),
                file_seq=manifest.get("file_seq"),
                delete_files=manifest.get("delete_files", []) + [entry],
                partition_specs=manifest.get("partition_specs"),
                partitions=manifest.get("partitions"),
                added=0,
                delete_pos_files=len(del_files),
            ), [snap_id]

        return self._commit_rmw(compute)

    def _write_dv_container(
        self, per_file_positions: dict[str, "list[int]"], base_dv: dict
    ) -> dict:
        """Build ONE Puffin-style DV container from per-data-file new
        positions, OR-merging with each file's existing bitmap
        (``base_dv``) so the replacement DV is a SUPERSET of the one it
        supersedes — the Iceberg v3 latest-DV-wins invariant. Returns
        {data_file: entry} for the touched files; callers merge over the
        parent's map and commit."""
        import numpy as np

        os.makedirs(self._dv_dir, exist_ok=True)
        container = os.path.join(
            self._dv_dir, f"dv-{uuid.uuid4().hex}.bin"
        )
        enc_key = self._maybe_key()
        dv_data_key = None
        if enc_key is not None:
            # table encryption: one data key per container, wrapped in
            # the container's key sidecar; each blob encrypted
            # independently so offset/length access still works
            from . import encryption as E

            dv_data_key = E.generate_data_key()
            E.write_key_sidecar(
                container,
                {
                    "key_id": self.get_property("encryption.key-id")
                    or "k1",
                    "key": E.wrap_key(dv_data_key, enc_key),
                },
            )
        entries: dict[str, dict] = {}
        offset = 0
        with open(container, "wb") as out:
            for f in sorted(per_file_positions):
                pos = np.asarray(per_file_positions[f], dtype=np.int64)
                old = base_dv.get(f)
                if old is not None:
                    pos = np.union1d(pos, self._dv_decode(
                        self._read_dv_blob(old)
                    ))
                blob, card = self._dv_encode(pos)
                if dv_data_key is not None:
                    from . import encryption as E

                    blob = E.encrypt_blob(blob, dv_data_key)
                out.write(blob)
                import hashlib

                entries[f] = {
                    "path": container,
                    "offset": offset,
                    "length": len(blob),
                    "cardinality": card,
                    **({"enc": True} if dv_data_key is not None else {}),
                    # Puffin-style blob integrity: verified whenever a
                    # blob is re-read for merging/coalescing, so silent
                    # container corruption can never propagate into a
                    # replacement DV
                    "sha256": hashlib.sha256(blob).hexdigest()[:16],
                }
                offset += len(blob)
            out.flush()
            os.fsync(out.fileno())
        return entries

    def delete_where_dv(
        self,
        condition: F.Column,
        prune: dict[str, tuple] | None = None,
    ) -> dict:
        """Merge-on-read DELETE via DELETION VECTORS (Iceberg v3): the
        matching rows' positions are recorded as ONE bitmap per data
        file, all bitmaps packed into a single Puffin-style container
        file — superseding position-delete coordinate parquet files
        (one container per commit vs O(tasks) coordinate files, and at
        most one DV per data file ever, vs pos-delete entries that
        accumulate per commit until rewritten). A file that already has
        a DV gets a REPLACEMENT bitmap OR-merged over the old one
        (latest-DV-wins, superset invariant); the superseded container
        becomes an orphan for GC once no retained snapshot references
        it.

        ``prune`` scopes the scan exactly like :meth:`delete_where` —
        files whose stats/partition tuples can't match are not read.

        Scale: the commit writes O(deleted rows / 8) bitmap bytes in ONE
        container + O(touched files) manifest entries; no data file is
        rewritten. Read amplification is one broadcast anti-join for ALL
        DVs (positions decoded executor-side from the shared container),
        vs one coordinate-parquet read per pos-delete commit — strictly
        better than v2 position deletes at every point of the lifecycle,
        until compaction materializes the DVs away entirely.

        Isolation: runs under the serializable read-modify-write loop —
        positions reference exact (file, row) coordinates, so a
        concurrent rewrite that replaces a targeted file would strand
        them (a SILENTLY LOST delete: the manifest scoping drops DV
        entries for vanished files). Losing the race recomputes the
        doomed set against the new tip instead."""

        def compute(base: int) -> tuple[dict | None, list[str]]:
            manifest = self._read_manifest(base)
            scoped = list(manifest["files"])
            if prune:
                scoped = self._prune_files(manifest, prune)
                scoped = self._partition_prune(manifest, prune, scoped)
            if not scoped:
                return None, []  # nothing can match: no commit
            pending = manifest.get("delete_files", [])
            dvs = manifest.get("delete_vectors", {})
            df = self._scan_files(
                scoped,
                manifest.get("file_seq"),
                with_seq=bool(pending),
                with_pos=True,
            )
            if pending or dvs:
                # already-dead rows (pending MoR deletes, existing DVs)
                # are not re-targeted; stash coordinates through the
                # anti-joins
                df = df.withColumn("__kf", F.col("__file")).withColumn(
                    "__kp", F.col("__pos")
                )
                df = self._apply_deletes(df, pending, delete_vectors=dvs)
                df = df.withColumn("__file", F.col("__kf")).withColumn(
                    "__pos", F.col("__kp")
                )
            doomed = df.filter(condition).select("__file", "__pos")
            new_pos = self._pack_coords_to_positions(doomed)
            if not new_pos:
                return None, []  # no matching rows: no commit
            base_dv = manifest.get("delete_vectors", {})
            touched = self._write_dv_container(new_pos, base_dv)
            merged = dict(base_dv)
            for f, e in touched.items():
                merged[f] = {**e, "seq": base + 1}
            return self._snapshot(
                "delete-dv",
                manifest["files"],
                base,
                schema_json=manifest.get("schema"),
                stats=manifest.get("stats"),
                file_seq=manifest.get("file_seq"),
                delete_files=manifest.get("delete_files", []),
                delete_vectors=merged,
                partition_specs=manifest.get("partition_specs"),
                partitions=manifest.get("partitions"),
                added=0,
                dv_files=len(touched),
                dv_deleted_rows=int(
                    sum(e["cardinality"] for e in touched.values())
                ),
            ), []

        return self._commit_rmw(compute)

    def coalesce_deletes_to_dv(self) -> dict | None:
        """DV COALESCING — the v3 successor to
        :meth:`rewrite_position_delete_files`: fold every pending
        position-delete coordinate file into per-data-file deletion
        vectors, WITHOUT rewriting any data file. The pos-delete entries
        (and, once expired snapshots release them, their O(commits ×
        tasks) coordinate parquet files) are replaced by at most one
        bitmap per targeted data file in one container.

        Equality-delete entries stay pending — a bitmap can't express
        "any row matching these keys, present or future" (their seq
        check is load-bearing); they materialize via data rewrite as
        before.

        Scale: pure metadata + one container write, O(deleted rows)
        work total — vs rewrite_position_delete_files' O(targeted data
        files) full rewrite. Returns None if no position deletes are
        pending."""
        if not any(
            d.get("pos")
            for d in self._read_manifest(self.current_version()).get(
                "delete_files", []
            )
        ):
            return None

        def build(parent: int) -> dict:
            prev = self._read_manifest(parent)
            pos_entries = [
                d for d in prev.get("delete_files", []) if d.get("pos")
            ]
            if not pos_entries:
                return prev
            coords = (
                self.spark.read.parquet(
                    *[f for d in pos_entries for f in d["files"]]
                )
                .select(
                    F.regexp_replace("__file", "^file:/+", "/").alias(
                        "__file"
                    ),
                    "__pos",
                )
                .groupBy("__file")
                .agg(F.collect_list("__pos").alias("pos"))
                .collect()
            )
            live = set(prev["files"])
            new_pos = {
                r["__file"]: r["pos"]
                for r in coords
                if r["__file"] in live
            }
            base_dv = prev.get("delete_vectors", {})
            merged = dict(base_dv)
            if new_pos:
                touched = self._write_dv_container(new_pos, base_dv)
                for f, e in touched.items():
                    merged[f] = {**e, "seq": parent + 1}
            return self._snapshot(
                "coalesce-deletes-dv",
                prev["files"],
                parent,
                schema_json=prev.get("schema"),
                stats=prev.get("stats"),
                file_seq=prev.get("file_seq"),
                delete_files=[
                    d
                    for d in prev.get("delete_files", [])
                    if not d.get("pos")
                ],
                delete_vectors=merged,
                partition_specs=prev.get("partition_specs"),
                partitions=prev.get("partitions"),
                added=0,
                coalesced_pos_entries=len(pos_entries),
            )

        return self._commit_with_retry(build)

    def coalesce_equality_deletes_to_dv(self) -> dict | None:
        """EQUALITY-delete debt compaction (r11 — VERDICT r10 #7):
        streaming upserts add one equality-delete entry per commit, and
        every reader pays one key-parquet read per pending entry (plus
        the broadcast anti-join) until a full data rewrite. This verb
        MATERIALIZES the pending equality entries into deletion vectors
        without rewriting any data file: an entry's effect is fully
        determined at commit time (it kills matching rows only in files
        with ``seq <= entry.seq`` — later files are exempt, and new
        files always get higher seqs), so the matching rows' positions
        are computed once (the same seq-checked semi-join the reader
        pays on every scan, run ONE last time), OR-merged into at most
        one bitmap per data file, and the entries are dropped.

        CDC nets zero across this commit: the removed entries' dead set
        and the added DVs' dead set are the same rows (side_dead gives
        each diff side its full dead set, exactly as for compaction).
        The op kind rides the existing state-preserving
        ``coalesce-deletes-dv`` classification (benign for concurrent
        upsert conflict windows, zero-change for the CDC planner).

        Scale: one column-pruned scan of the seq-scoped candidate files
        + O(deleted rows / 8) bitmap bytes — paid ONCE at maintenance
        time instead of per read; afterwards readers decode one DV
        container instead of N key parquets. Returns None when no
        equality entries are pending."""
        if not any(
            not d.get("pos")
            for d in self._read_manifest(self.current_version()).get(
                "delete_files", []
            )
        ):
            return None

        def build(parent: int) -> dict:
            prev = self._read_manifest(parent)
            eq_entries = [
                d
                for d in prev.get("delete_files", [])
                if not d.get("pos")
            ]
            if not eq_entries:
                return prev
            fseq = prev.get("file_seq", {})
            max_seq = max(int(d["seq"]) for d in eq_entries)
            scoped = [
                f
                for f in prev["files"]
                if int(fseq.get(f, 0)) <= max_seq
            ]
            new_pos: dict = {}
            if scoped:
                df = self._scan_files(
                    scoped, fseq, with_seq=True, with_pos=True
                )
                rev = {
                    p: cur
                    for cur, priors in self._schema_renames(
                        prev.get("schema")
                    ).items()
                    for p in priors
                }
                by_keys: dict[tuple[str, ...], list[dict]] = {}
                for d in eq_entries:
                    by_keys.setdefault(tuple(d["keys"]), []).append(d)
                doomed = None
                for keys, entries in by_keys.items():
                    cur_keys = tuple(rev.get(k, k) for k in keys)
                    dels = None
                    for d in entries:
                        one = self._read_delete_parquets(
                            d["files"]
                        ).select(*keys)
                        for k, ck in zip(keys, cur_keys):
                            if k != ck:
                                one = one.withColumnRenamed(k, ck)
                        one = one.withColumn(
                            "__del_seq", F.lit(d["seq"])
                        )
                        dels = (
                            one
                            if dels is None
                            else dels.unionByName(one)
                        )
                    # the reader's anti-join condition, inverted: rows
                    # the entries WOULD kill become DV positions
                    cond = [
                        df[k].eqNullSafe(dels[k]) for k in cur_keys
                    ]
                    cond.append(dels["__del_seq"] >= df["__seq"])
                    hit = df.join(
                        F.broadcast(dels),
                        functools_reduce(lambda a, b: a & b, cond),
                        "left_semi",
                    ).select("__file", "__pos")
                    doomed = (
                        hit
                        if doomed is None
                        else doomed.unionByName(hit)
                    )
                if doomed is not None:
                    # a row matched by two entries must count once
                    new_pos = self._pack_coords_to_positions(
                        doomed.distinct()
                    )
            base_dv = prev.get("delete_vectors", {})
            merged = dict(base_dv)
            if new_pos:
                touched = self._write_dv_container(new_pos, base_dv)
                for f, e in touched.items():
                    merged[f] = {**e, "seq": parent + 1}
            return self._snapshot(
                "coalesce-deletes-dv",
                prev["files"],
                parent,
                schema_json=prev.get("schema"),
                stats=prev.get("stats"),
                file_seq=fseq,
                delete_files=[
                    d
                    for d in prev.get("delete_files", [])
                    if d.get("pos")
                ],
                delete_vectors=merged,
                partition_specs=prev.get("partition_specs"),
                partitions=prev.get("partitions"),
                added=0,
                coalesced_eq_entries=len(eq_entries),
            )

        return self._commit_with_retry(build)

    def _pack_coords_to_positions(self, coords: DataFrame) -> dict:
        """(__file, __pos) rows → {plain file path: sorted int64
        positions}. Positions are bitmap-packed EXECUTOR-side (one task
        per touched file, applyInPandas); only the packed blobs cross
        to the driver — O(deleted rows / 8) bytes, never row tuples."""
        import pandas as _pd

        encode = self._dv_encode

        def _pack(pdf: "_pd.DataFrame") -> "_pd.DataFrame":
            blob, card = encode(pdf["__pos"].to_numpy())
            return _pd.DataFrame(
                {
                    "f": [pdf["__file"].iloc[0]],
                    "blob": [blob],
                    "card": [card],
                }
            )

        packed = (
            coords.select(
                F.regexp_replace("__file", "^file:/+", "/").alias(
                    "__file"
                ),
                "__pos",
            )
            .groupBy("__file")
            .applyInPandas(_pack, "f string, blob binary, card long")
            .collect()
        )
        return {
            r["f"]: self._dv_decode(bytes(r["blob"])) for r in packed
        }

    def update_where_dv(
        self,
        condition: F.Column,
        set_cols: dict[str, F.Column],
        prune: dict[str, tuple] | None = None,
        partition_by: list[str] | None = None,
    ) -> dict | None:
        """Merge-on-read UPDATE via DELETION VECTORS (Iceberg v3's
        DV-based UPDATE/MERGE write mode): ONE commit that (a) records
        the matched rows' positions in per-file bitmaps — hiding the
        old images — and (b) appends their updated images carrying the
        SAME materialized ``__row_id`` (identity-preserving, like
        :meth:`update_where_mor`). Unlike the equality-MoR form it
        needs NO unique key — positions pin exact rows, so tables
        without a natural key (event logs, near-duplicate corpora) get
        cheap MoR updates too — and the read path pays the shared DV
        anti-join instead of one per pending equality entry.

        Through the CDC feed the commit surfaces as
        ``update_preimage``/``update_postimage`` pairs sharing
        ``_row_id`` (the DV delta's deletes meet the appended images'
        identical ids — same pairing as the equality path).

        Scale: write cost is O(matched rows) images + O(matched / 8)
        bitmap bytes; no data file is rewritten. ``prune`` scopes the
        scan exactly like :meth:`update_where`. Returns None when
        nothing matches."""

        def compute(base: int) -> tuple[dict | None, list[str]]:
            manifest = self._read_manifest(base)
            scoped = list(manifest["files"])
            if prune:
                scoped = self._prune_files(manifest, prune)
                scoped = self._partition_prune(manifest, prune, scoped)
            if not scoped:
                return None, []
            src = (
                self._project_to_schema(
                    {**manifest, "files": scoped},
                    with_lineage=True,
                    keep_coords=True,
                )
                .filter(condition)
                .localCheckpoint(eager=True)
            )
            if not src.limit(1).count():
                return None, []
            new_pos = self._pack_coords_to_positions(
                src.select("__file", "__pos")
            )
            user_cols = [
                c
                for c in src.columns
                if c
                not in (
                    "__file",
                    "__pos",
                    "_row_id",
                    "_last_updated_version",
                )
            ]
            images = src.select(
                *[
                    (set_cols[c].alias(c) if c in set_cols else F.col(c))
                    for c in user_cols
                ],
                F.col("_row_id").alias("__row_id"),
                F.lit(None).cast("long").alias("__last_updated"),
            )
            if self.check_constraints():
                self._enforce_constraints(
                    images.drop("__row_id", "__last_updated")
                )
            snap_id, new_files = self._write_data_files(
                images, partition_by
            )
            new_stats = self._collect_file_stats(new_files)
            base_dv = manifest.get("delete_vectors", {})
            touched = self._write_dv_container(new_pos, base_dv)
            merged = dict(base_dv)
            for f, e in touched.items():
                merged[f] = {**e, "seq": base + 1}
            old_seq = manifest.get("file_seq", {})
            return self._snapshot(
                "update-dv",
                manifest["files"] + new_files,
                base,
                schema_json=manifest.get("schema"),
                stats={**manifest.get("stats", {}), **new_stats},
                file_seq={
                    **{f: old_seq.get(f, 0) for f in manifest["files"]},
                    **{f: base + 1 for f in new_files},
                },
                delete_files=manifest.get("delete_files", []),
                delete_vectors=merged,
                partition_specs=manifest.get("partition_specs"),
                partitions=manifest.get("partitions"),
                added=len(new_files),
                dv_files=len(touched),
            ), [snap_id]

        return self._commit_rmw(compute)

    def rewrite_dv_heavy_files(self, min_ratio: float = 0.1) -> dict | None:
        """Targeted maintenance: rewrite ONLY the data files whose
        deletion vector has accumulated past ``min_ratio`` of the
        file's rows (Iceberg's delete-file-ratio compaction trigger) —
        the DV is materialized away, everything else carries verbatim.
        The steady-state answer to DV growth on hot files: cost tracks
        the DV-heavy tail, never table size. Returns None when no file
        crosses the threshold."""

        def compute(base: int) -> tuple[dict | None, list[str]]:
            manifest = self._read_manifest(base)
            dvs = manifest.get("delete_vectors", {})
            stats = manifest.get("stats", {})
            targets = []
            for f, e in dvs.items():
                rows = stats.get(f, {}).get("__rows")
                if rows is None:
                    rows = self._file_num_rows(f)
                if rows and e["cardinality"] >= min_ratio * rows:
                    targets.append(f)
            if not targets:
                return None, []
            carried = [
                f for f in manifest["files"] if f not in set(targets)
            ]
            src = self._project_with_lineage_cols(
                {**manifest, "files": sorted(targets)}
            )
            snap_id, new_files = self._write_data_files(src)
            new_stats = self._collect_file_stats(new_files)
            old_stats = manifest.get("stats", {})
            old_seq = manifest.get("file_seq", {})
            return self._snapshot(
                "rewrite-dv-heavy",
                carried + new_files,
                base,
                schema_json=manifest.get("schema"),
                stats={
                    **{
                        f: old_stats[f] for f in carried if f in old_stats
                    },
                    **new_stats,
                },
                file_seq={
                    **{f: old_seq.get(f, 0) for f in carried},
                    **{f: base + 1 for f in new_files},
                },
                delete_files=manifest.get("delete_files", []),
                # auto-carry drops the rewritten files' DVs with them
                partition_specs=manifest.get("partition_specs"),
                partitions={
                    f: t
                    for f, t in manifest.get("partitions", {}).items()
                    if f in set(carried)
                },
                added=len(new_files),
                rewritten=len(targets),
                carried=len(carried),
            ), [snap_id]

        return self._commit_rmw(compute)

    def update_where(
        self,
        condition: F.Column,
        set_cols: dict[str, F.Column],
        prune: dict[str, tuple] | None = None,
    ) -> dict:
        """Copy-on-write UPDATE: rows matching ``condition`` get each
        ``set_cols`` expression applied; only files that can contain
        matches are rewritten (same stats-pruned scope as
        :meth:`delete_where`), others carry over by path. The Iceberg
        ``UPDATE ... SET ... WHERE`` surface.

        Scale: identical cost model to delete — proportional to touched
        files. Note the rewrite keeps NON-matching rows of touched files
        unchanged, so the invariant 'one row in, one row out' holds and
        time travel shows the pre-update values at the parent version.
        """
        def compute(base: int) -> tuple[dict, list[str]]:
            manifest = self._read_manifest(base)
            touched = list(manifest["files"])
            if prune:
                # file stats AND partition tuples: hive-layout files do
                # not store the partition column, so stats alone cannot
                # scope a partition-predicate rewrite (the scan path
                # composes the same two prunes)
                touched = self._prune_files(manifest, prune)
                touched = self._partition_prune(manifest, prune, touched)
            untouched = [f for f in manifest["files"] if f not in set(touched)]
            old_stats = manifest.get("stats", {})
            scratch: list[str] = []
            new_files: list[str] = []
            new_stats: dict[str, dict] = {}
            if touched:
                src = self._project_with_lineage_cols(
                    {**manifest, "files": touched}
                )
                # updated rows keep their __row_id but RESET
                # __last_updated to NULL — at read time NULL inherits the
                # rewritten file's sequence number (= this commit), which
                # is exactly 'last updated here'; untouched rows in the
                # same file keep their materialized old version
                updated = src.select(
                    *[
                        (
                            F.when(condition, set_cols[c])
                            .otherwise(F.col(c))
                            .alias(c)
                            if c in set_cols
                            else (
                                F.when(
                                    condition, F.lit(None).cast("long")
                                )
                                .otherwise(F.col(c))
                                .alias(c)
                                if c == "__last_updated"
                                else F.col(c)
                            )
                        )
                        for c in src.columns
                    ]
                )
                # ADVICE r5 (medium): UPDATE consults CHECK
                # constraints — set_cols can write violating values
                if self.check_constraints():
                    self._enforce_constraints(
                        updated.drop("__row_id", "__last_updated")
                    )
                snap_id, new_files = self._write_data_files(updated)
                scratch.append(snap_id)
                new_stats = self._collect_file_stats(new_files)
            stats = {
                **{f: old_stats[f] for f in untouched if f in old_stats},
                **new_stats,
            }
            old_seq = manifest.get("file_seq", {})
            return self._snapshot(
                "update",
                untouched + new_files,
                base,
                schema_json=manifest.get("schema"),
                stats=stats,
                file_seq={
                    **{f: old_seq.get(f, 0) for f in untouched},
                    **{f: base + 1 for f in new_files},
                },
                delete_files=manifest.get("delete_files", []),
                # same carry as delete_where: losing the specs would
                # silently disable partition pruning after any update
                partition_specs=manifest.get("partition_specs"),
                partitions={
                    f: t
                    for f, t in manifest.get("partitions", {}).items()
                    if f in set(untouched)
                },
                added=len(new_files),
                rewritten=len(touched),
                carried=len(untouched),
            ), scratch

        return self._commit_rmw(compute)

    def update_where_mor(
        self,
        condition: F.Column,
        keys: list[str],
        set_cols: dict[str, F.Column],
        partition_by: list[str] | None = None,
    ) -> dict | None:
        """Merge-on-read UPDATE (Iceberg v2 MoR ``UPDATE ... SET``): ONE
        commit that equality-deletes the matched rows' keys AND appends
        their updated images — no existing data file is opened for
        rewrite. The read path reassembles the update: the delete entry
        (seq = base) hides the old images (file seq <= base), the
        appended files (seq = base+1) are exempt, so exactly the new
        images surface. ``keys`` must uniquely identify the matched rows
        (the equality-delete contract, same as :meth:`delete_where_mor`);
        updating a key column is fine — the delete lists the OLD key
        values, captured before ``set_cols`` applies.

        Runs under the serializable read-modify-write loop: losing a race
        discards the scratch files and re-evaluates ``condition`` against
        the new tip, so two racing updates of one key linearize instead
        of double-appending. Returns None when nothing matches (no
        snapshot committed — Iceberg's no-op UPDATE).

        The CoW/MoR trade mirrors delete: :meth:`update_where` pays a
        rewrite of every touched file; this pays O(matched rows) at write
        time plus one broadcast anti-join per read until
        ``rewrite_data_files`` / ``rewrite_small_files`` materializes the
        pending entries away — the right shape for frequent narrow
        updates (CDC upserts, slowly-mutating dimensions) on tables with
        large files.

        ``partition_by`` lays the updated images out under that spec
        (pass the table's spec to keep per-partition metadata exact).
        Without it the images land as unpartitioned files — still
        CORRECT on a partitioned table (spec-per-file semantics:
        ``_partition_prune`` conservatively keeps files lacking a spec's
        field, and ``partitions()`` rolls them under the empty tuple),
        just invisible to partition pruning until compaction."""

        def compute(base: int) -> tuple[dict | None, list[str]]:
            manifest = self._read_manifest(base)
            # one scan: materialize the matched rows JVM-side so the
            # existence probe, keys write, and images write don't each
            # re-run the table scan + pending-delete anti-joins
            src = (
                self._project_with_lineage_cols(manifest)
                .filter(condition)
                .localCheckpoint(eager=True)
            )
            if not src.limit(1).count():
                return None, []
            doomed = src.select(*keys).distinct()
            del_snap, del_files = self._write_data_files(doomed)
            # the appended images carry the matched rows' __row_id — a
            # MoR update replaces the old image (hidden by the equality
            # delete) with a SAME-IDENTITY new image; __last_updated
            # resets to NULL so reads inherit the new file's seq
            updated = src.select(
                *[
                    (
                        set_cols[c].alias(c)
                        if c in set_cols
                        else (
                            F.lit(None).cast("long").alias(c)
                            if c == "__last_updated"
                            else F.col(c)
                        )
                    )
                    for c in src.columns
                ]
            )
            if self.check_constraints():
                self._enforce_constraints(
                    updated.drop("__row_id", "__last_updated")
                )
            up_snap, new_files = self._write_data_files(
                updated, partition_by
            )
            new_stats = self._collect_file_stats(new_files)
            entry = {"files": del_files, "seq": base, "keys": keys}
            old_seq = manifest.get("file_seq", {})
            new_specs = [
                PartitionSpec.parse(s).__dict__
                for s in (partition_by or [])
            ]
            specs = manifest.get("partition_specs")
            if new_specs:
                specs = (specs or []) + [
                    d for d in new_specs if d not in (specs or [])
                ]
            partitions = manifest.get("partitions")
            if specs is not None:
                partitions = {
                    **(partitions or {}),
                    **self._file_partitions(new_files),
                }
            return self._snapshot(
                "update-mor",
                manifest["files"] + new_files,
                base,
                schema_json=manifest.get("schema"),
                stats={**manifest.get("stats", {}), **new_stats},
                file_seq={
                    **old_seq,
                    **{f: base + 1 for f in new_files},
                },
                delete_files=manifest.get("delete_files", []) + [entry],
                partition_specs=specs,
                partitions=partitions,
                added=len(new_files),
                delete_key_files=len(del_files),
            ), [del_snap, up_snap]

        return self._commit_rmw(compute)

    def history(self) -> DataFrame:
        """Snapshot-history metadata table — Iceberg's ``<table>.snapshots``
        / ``.history`` surface: one row per committed snapshot with its
        lineage and operation, plus (r7, VERDICT r6 #6) the rollback-
        forensics columns: ``committed_at``, ``restored_version`` (set
        on rollback commits — which snapshot's state came back), and
        ``effective_ancestor`` — the version whose DATA STATE this
        snapshot descends from (a rollback's effective ancestor is the
        restored snapshot, not its numeric parent), so a consumer can
        walk the state lineage across restores. Driver-side: manifests
        are O(snapshots) metadata, never data IO."""
        from pyspark.sql import types as T

        schema = T.StructType([
            T.StructField("version", T.LongType(), False),
            T.StructField("parent", T.LongType(), False),
            T.StructField("operation", T.StringType(), False),
            T.StructField("file_count", T.LongType(), False),
            T.StructField("added_files", T.LongType(), False),
            T.StructField("committed_at", T.DoubleType(), True),
            T.StructField("restored_version", T.LongType(), True),
            T.StructField("effective_ancestor", T.LongType(), True),
        ])
        rows = [
            (
                int(m["version"]),
                int(m["parent"]),
                m["operation"],
                len(m["files"]),
                int(m["summary"].get("added_files", 0)),
                m.get("committed_at"),
                m["summary"].get("restored_version"),
                int(
                    m["summary"].get("restored_version", m["parent"])
                    or m["parent"]
                ),
            )
            for m in self.snapshots()
        ]
        return self.spark.createDataFrame(rows, schema)

    def entries(self, version: int | str | None = None) -> DataFrame:
        """``<table>.entries`` metadata table (Iceberg's manifest-entry
        view): one row per data file PER STATUS at the given snapshot —
        'added' (absent from the parent), 'existing' (carried), or
        'deleted' (in the parent, gone here). The per-commit file ledger
        a maintenance planner or incremental consumer inspects without
        reading any data. Driver-side O(files) metadata."""
        from pyspark.sql import types as T

        v = self._resolve_version(version)
        m = self._read_manifest(v)
        parent_files: set[str] = set()
        if m.get("parent") and os.path.exists(
            self._manifest_path(m["parent"])
        ):
            parent_files = set(self._read_manifest(m["parent"])["files"])
        seqs = m.get("file_seq", {})
        rids = m.get("row_ids", {})
        cur = set(m["files"])
        schema = T.StructType([
            T.StructField("file_path", T.StringType(), False),
            T.StructField("status", T.StringType(), False),
            T.StructField("seq", T.LongType(), True),
            T.StructField("first_row_id", T.LongType(), True),
        ])
        rows = [
            (
                f,
                "added" if f not in parent_files else "existing",
                int(seqs.get(f, 0)),
                rids.get(f),
            )
            for f in m["files"]
        ] + [
            (f, "deleted", None, None)
            for f in sorted(parent_files - cur)
        ]
        return self.spark.createDataFrame(rows, schema)

    def all_files(self) -> DataFrame:
        """``<table>.all_files`` metadata table (Iceberg): every data
        file referenced by ANY retained snapshot, with the version
        range it lived through and whether the current snapshot still
        holds it — the surface an orphan auditor or storage-cost
        breakdown reads. Driver-side O(snapshots × files) metadata."""
        from pyspark.sql import types as T

        first: dict[str, int] = {}
        last: dict[str, int] = {}
        cur_files: set[str] = set()
        cur_v = self.current_version()
        for m in self.snapshots():
            v = int(m["version"])
            for f in m["files"]:
                first.setdefault(f, v)
                last[f] = v
            if v == cur_v:
                cur_files = set(m["files"])
        schema = T.StructType([
            T.StructField("file_path", T.StringType(), False),
            T.StructField("first_version", T.LongType(), False),
            T.StructField("last_version", T.LongType(), False),
            T.StructField("in_current", T.BooleanType(), False),
        ])
        rows = [
            (f, first[f], last[f], f in cur_files)
            for f in sorted(first)
        ]
        return self.spark.createDataFrame(rows, schema)

    def refs(self) -> DataFrame:
        """``<table>.refs`` metadata table (Iceberg): one row per named
        ref — every tag (type 'tag', pinned version) and every branch
        (type 'branch', current head + the base it forked from, NULL
        for tags). The missing sibling of :meth:`history`/:meth:`files`/
        :meth:`partitions`; driver-side O(refs) metadata, zero data IO."""
        from pyspark.sql import types as T

        schema = T.StructType(
            [
                T.StructField("name", T.StringType()),
                T.StructField("type", T.StringType()),
                T.StructField("version", T.LongType()),
                T.StructField("base_version", T.LongType()),
            ]
        )
        rows = [
            (name, "tag", int(v), None)
            for name, v in sorted(self.tags().items())
        ] + [
            (name, "branch", int(b["head"]), int(b["base_version"]))
            for name, b in sorted(self.branches().items())
        ]
        return self.spark.createDataFrame(rows, schema)

    def files(self, version: int | str | None = None) -> DataFrame:
        """``<table>.files`` metadata table (Iceberg): one row per live
        data file with size, row count, sequence number, partition tuple
        and per-column min/max stats (as a JSON string — schema-stable
        across tables). Row counts come from the manifest's commit-time
        stats (the reserved ``__rows`` entry) when present — zero file
        IO — with a parquet-footer fallback for manifests written before
        row counts were recorded; sizes are one ``stat`` syscall each.
        Driver-side by design: O(files) metadata, zero data IO, the
        introspection surface compaction policies and debuggers read."""
        from concurrent.futures import ThreadPoolExecutor

        import pyarrow.parquet as pq
        from pyspark.sql import types as T

        v = self._resolve_version(version)
        manifest = self._read_manifest(v)
        flist = manifest["files"]
        seqs = manifest.get("file_seq", {})
        stats = manifest.get("stats", {})
        parts = manifest.get("partitions", {})
        rids = manifest.get("row_ids", {})

        def footer(f: str) -> tuple[int, int]:
            rows = stats.get(f, {}).get("__rows")
            if rows is None:  # pre-__rows manifest: read the footer
                rows = LakehouseTable._file_num_rows(f)
            return rows, os.path.getsize(f)

        if flist:
            with ThreadPoolExecutor(max_workers=min(16, len(flist))) as ex:
                footers = dict(zip(flist, ex.map(footer, flist)))
        else:
            footers = {}
        schema = T.StructType([
            T.StructField("file_path", T.StringType(), False),
            T.StructField("size_bytes", T.LongType(), False),
            T.StructField("num_rows", T.LongType(), False),
            T.StructField("seq", T.LongType(), False),
            T.StructField(
                "partition", T.MapType(T.StringType(), T.StringType()), True
            ),
            T.StructField("stats_json", T.StringType(), True),
            # Iceberg v3: the file's assigned first_row_id (row lineage)
            T.StructField("first_row_id", T.LongType(), True),
            # Iceberg v3: the file's deletion vector, if any (at most
            # one per data file — latest-DV-wins)
            T.StructField("dv_path", T.StringType(), True),
            T.StructField("dv_deleted_rows", T.LongType(), True),
        ])
        dvs = manifest.get("delete_vectors", {})
        rows = [
            (
                f,
                footers[f][1],
                footers[f][0],
                int(seqs.get(f, 0)),
                parts.get(f),
                json.dumps(
                    {k: v for k, v in stats[f].items() if k != "__rows"},
                    default=str,
                )
                if f in stats
                else None,
                rids.get(f),
                dvs[f]["path"] if f in dvs else None,
                int(dvs[f]["cardinality"]) if f in dvs else None,
            )
            for f in flist
        ]
        return self.spark.createDataFrame(rows, schema)

    # -- partition statistics files (Iceberg partition-stats spec) --------
    #
    # Every main-chain commit writes snapshots/pstats/v{N}.json — the
    # per-partition-tuple rollup (file/row/byte counts + DV mass) —
    # INCREMENTALLY from the parent's pstats plus the commit's file
    # delta (counts are additive, so removal subtracts; HLL-style
    # sketches couldn't do this). partitions() serves from the sidecar
    # when one exists for the requested snapshot — O(partitions), zero
    # manifest fold, zero Spark job — and falls back to the manifest
    # aggregation otherwise (pre-pstats snapshots, sink-written
    # commits, or a crashed pstats write).

    @property
    def _pstats_dir(self) -> str:
        return os.path.join(self._snap_dir, "pstats")

    def _pstats_path(self, version: int) -> str:
        return os.path.join(self._pstats_dir, f"v{version}.json")

    @staticmethod
    def _ptuple(file: str, pmap: dict) -> str:
        """Canonical partition-tuple key — byte-identical to the
        metadata table's ``to_json(sorted map entries)`` rendering."""
        t = pmap.get(file) or {}
        return json.dumps(
            {k: t[k] for k in sorted(t)}, separators=(",", ":")
        )

    def _write_partition_stats(self, version: int, manifest: dict) -> None:
        files = manifest["files"]
        stats = manifest.get("stats") or {}
        pmap = manifest.get("partitions") or {}
        parent = manifest.get("parent") or 0
        agg: dict[str, dict] = {}
        base = None
        if parent and os.path.exists(self._pstats_path(parent)):
            with open(self._pstats_path(parent)) as fh:
                base = json.load(fh)
        if base is not None:
            prev_manifest = self._read_manifest(parent)
            prev_files = set(prev_manifest["files"])
            cur_files = set(files)
            agg = {k: dict(v) for k, v in base["partitions"].items()}
            deltas = [
                (f, 1, stats, pmap) for f in cur_files - prev_files
            ] + [
                (
                    f,
                    -1,
                    prev_manifest.get("stats") or {},
                    prev_manifest.get("partitions") or {},
                )
                for f in prev_files - cur_files
            ]
        else:
            deltas = [(f, 1, stats, pmap) for f in files]
        for f, sign, st_map, pm in deltas:
            st = st_map.get(f) or {}
            rows, size = st.get("__rows"), st.get("__bytes")
            if rows is None or size is None:
                # a touched file without row/byte stats makes the
                # additive rollup unsubtractable — skip this snapshot's
                # sidecar entirely (the manifest fold stays exact)
                raise ValueError("file without __rows/__bytes stats")
            key = self._ptuple(f, pm)
            e = agg.setdefault(
                key, {"file_count": 0, "row_count": 0, "total_bytes": 0}
            )
            e["file_count"] += sign
            e["row_count"] += sign * int(rows)
            e["total_bytes"] += sign * int(size)
        agg = {k: v for k, v in agg.items() if v["file_count"] > 0}
        # DV mass is replaced wholesale per commit (latest-DV-wins makes
        # per-file deltas non-additive); the map is O(files with DVs)
        dv_mass: dict[str, int] = {}
        for f, e in (manifest.get("delete_vectors") or {}).items():
            key = self._ptuple(f, pmap)
            dv_mass[key] = dv_mass.get(key, 0) + int(
                e.get("cardinality", 0)
            )
        os.makedirs(self._pstats_dir, exist_ok=True)
        _publish_sidecar(
            self._pstats_path(version),
            {"partitions": agg, "dv_mass": dv_mass},
        )

    def partitions(self, version: int | str | None = None) -> DataFrame:
        """``<table>.partitions`` metadata table: per-partition-tuple file
        and row counts + bytes — what a compaction planner or skew monitor
        reads to find hot/fragmented partitions without scanning data.
        Unpartitioned files roll up under the empty tuple.

        Served from the snapshot's partition-statistics sidecar when one
        exists (O(partitions), no manifest fold — the Iceberg
        partition-stats file); the manifest aggregation is the fallback
        for snapshots without one."""
        v = self._resolve_version(
            version if version is not None else self.current_version()
        )
        p = self._pstats_path(v)
        blob = None
        if os.path.exists(p):
            with open(p) as fh:
                try:
                    blob = json.load(fh)
                except ValueError:
                    blob = None  # crashed write: manifest fold serves
        if blob is not None:
            dv = blob.get("dv_mass") or {}
            rows = [
                (
                    key,
                    int(e["file_count"]),
                    int(e["row_count"]),
                    int(e["total_bytes"]),
                    int(dv.get(key, 0)),
                )
                for key, e in sorted(blob["partitions"].items())
            ]
            return self.spark.createDataFrame(
                rows,
                "partition string, file_count long, row_count long,"
                " total_bytes long, dv_deleted_rows long",
            )
        f = self.files(version)
        key = F.coalesce(
            F.to_json(F.expr("map_from_entries(array_sort(map_entries(partition)))")),
            F.lit("{}"),
        )
        return (
            f.groupBy(key.alias("partition"))
            .agg(
                F.count("*").alias("file_count"),
                F.sum("num_rows").alias("row_count"),
                F.sum("size_bytes").alias("total_bytes"),
                # r7: per-partition deletion-vector mass — the signal a
                # maintenance planner reads to target
                # rewrite_dv_heavy_files at hot partitions
                F.sum(F.coalesce("dv_deleted_rows", F.lit(0))).alias(
                    "dv_deleted_rows"
                ),
            )
        )

    def geo_bounds(
        self, col: str, version: int | str | None = None
    ) -> DataFrame:
        """Per-file bounding boxes of a declared geometry column,
        served purely from manifest stats (the footer min/max of the
        ``__geo_*`` shred columns) — no data file is opened. The
        metadata surface a spatial maintenance planner reads: files
        with overlapping envelopes are the re-clustering candidates
        (sort by Hilbert/Morton of the centroid), exactly how Iceberg
        v3's geo bounds feed its file-skipping planner. Files written
        before the geo declaration surface NULL bounds."""
        v = self._resolve_version(version)
        manifest = self._read_manifest(v)
        stats = manifest.get("stats", {})
        rows = []
        for f in manifest["files"]:
            st = stats.get(f) or {}

            def side(part: str, idx: int):
                rng = st.get(f"__geo_{col}_{part}")
                return float(rng[idx]) if rng else None

            rows.append(
                (
                    f,
                    st.get("__rows"),
                    side("xmin", 0),
                    side("ymin", 0),
                    side("xmax", 1),
                    side("ymax", 1),
                )
            )
        return self.spark.createDataFrame(
            rows,
            "file string, num_rows long, xmin double, ymin double, "
            "xmax double, ymax double",
        )

    def count_rows(self, version: int | str | None = None) -> int:
        """O(metadata) exact row count — Iceberg's ``count(*)``-from-
        manifest answer: Σ per-file ``__rows`` stats (footer fallback
        for stat-less legacy files — still metadata-only), minus
        deletion-vector cardinalities and position-delete coordinate
        counts (small key parquets, driver-side). Pending EQUALITY
        deletes have unknown mass without evaluation, so the method
        falls back to ``read().count()`` — correct at one data-scan
        cost, never silently wrong.

        Pos-delete coordinates are scoped to LIVE files: CoW rewrite
        paths carry ``delete_files`` entries verbatim while removing
        their target data files, so a coordinate whose target file has
        vanished from the manifest is dead weight, not a pending delete
        (it must NOT be subtracted — the rewrite already dropped those
        rows physically)."""
        v = self._resolve_version(version)
        manifest = self._read_manifest(v)
        if any(
            not e.get("pos") for e in manifest.get("delete_files", [])
        ):
            return self._project_to_schema(manifest).count()
        stats = manifest.get("stats", {})
        total = 0
        for f in manifest["files"]:
            rows = (stats.get(f) or {}).get("__rows")
            if rows is None:
                rows = self._file_num_rows(f)
            total += int(rows)
        total -= sum(
            int(e["cardinality"])
            for e in manifest.get("delete_vectors", {}).values()
        )
        live = set(manifest["files"])
        for entry in manifest.get("delete_files", []):
            for tgt, n in self._pos_coord_counts(entry).items():
                if tgt in live:
                    total -= n
        return total

    def _pos_coord_counts(self, entry: dict) -> dict[str, int]:
        """Per-target-file coordinate counts for one pos-delete entry.
        Coordinate parquets store ``file:///``-URIs in ``__file``;
        manifests store plain paths — normalize before keying."""
        from . import encryption as E

        per_file: dict[str, int] = {}
        for kf in entry["files"]:
            t = E.read_table_auto(
                kf, self._maybe_key(), columns=["__file"]
            )
            for fname, n in (
                t.column("__file").to_pandas().value_counts().items()
            ):
                key = re.sub(r"^file:/+", "/", str(fname))
                per_file[key] = per_file.get(key, 0) + int(n)
        return per_file

    def manifests(self, version: int | str | None = None) -> DataFrame:
        """``<table>.manifests`` metadata table (Iceberg's manifest-list
        introspection): the immutable part files backing a snapshot's
        manifest — path, on-disk bytes, data files covered, and which
        per-file maps the part carries. The surface that makes the
        O(added)-metadata commit claim INSPECTABLE: after N appends the
        tip manifest lists ~N parts whose sizes sum to the real metadata
        footprint, and ``rewrite_manifest_parts()`` visibly collapses
        them. Legacy inline manifests surface as one synthetic row."""
        v = self._resolve_version(version)
        mpath = self._manifest_path(v)
        with open(mpath) as f:
            raw = json.load(f)
        rows = []
        if "parts" in raw:
            for p in raw["parts"]:
                try:
                    size = os.path.getsize(p)
                    body = self._load_part(p)
                except OSError:
                    size, body = None, {"files": []}
                rows.append(
                    (
                        p,
                        size,
                        len(body.get("files", [])),
                        ",".join(
                            k for k in self.PART_KEYS if body.get(k)
                        ),
                    )
                )
        else:
            rows.append(
                (
                    mpath,
                    os.path.getsize(mpath),
                    len(raw.get("files", [])),
                    ",".join(k for k in self.PART_KEYS if raw.get(k)),
                )
            )
        return self.spark.createDataFrame(
            rows,
            "path string, size_bytes long, n_data_files long, "
            "carried_keys string",
        )

    def position_deletes(
        self, version: int | str | None = None
    ) -> DataFrame:
        """``<table>.position_deletes`` metadata table: every pending
        row-level delete a reader of this snapshot must apply, by kind —
        ``dv`` rows are deletion-vector entries (cardinality from the
        manifest, zero data IO); ``pos`` rows come from position-delete
        coordinate files (small key parquets, read driver-side);
        ``eq`` rows are equality-delete entries (key-tuple files —
        dead-row count unknown without evaluation, surfaced as NULL).
        The maintenance surface behind ``coalesce_deletes_to_dv`` /
        ``rewrite_dv_heavy_files`` decisions.

        Coordinates whose target data file is no longer in the
        manifest (CoW rewrites carry pos entries verbatim after
        removing their targets) surface as kind ``pos_stale`` so
        maintenance planners don't over-estimate pending delete mass."""
        v = self._resolve_version(version)
        manifest = self._read_manifest(v)
        live = set(manifest["files"])
        rows = []
        for f, e in manifest.get("delete_vectors", {}).items():
            rows.append(
                (f, "dv", e["path"], int(e["seq"]), int(e["cardinality"]))
            )
        for entry in manifest.get("delete_files", []):
            if entry.get("pos"):
                for tgt, n in sorted(
                    self._pos_coord_counts(entry).items()
                ):
                    rows.append(
                        (
                            tgt,
                            "pos" if tgt in live else "pos_stale",
                            ";".join(entry["files"]),
                            int(entry["seq"]),
                            n,
                        )
                    )
            else:
                rows.append(
                    (
                        None,
                        "eq",
                        ";".join(entry["files"]),
                        int(entry["seq"]),
                        None,
                    )
                )
        return self.spark.createDataFrame(
            rows,
            "data_file string, kind string, source string, seq long, "
            "dead_rows long",
        )

    def rollback(self, to_version: int) -> dict:
        """Restore the table to a previous snapshot's state by committing a
        NEW snapshot that points at the old version's exact file set (and
        schema/stats) — Iceberg ``CALL system.rollback_to_snapshot``.

        History is preserved: the bad snapshots stay readable for
        forensics until ``expire_snapshots``, and incremental consumers
        see a normal new version rather than a rewound counter. No data
        is copied — the commit is pure metadata."""
        old = self._read_manifest(to_version)
        return self._commit_with_retry(
            lambda parent: self._snapshot(
                "rollback",
                old["files"],
                parent,
                schema_json=old.get("schema"),
                stats=old.get("stats"),
                file_seq=old.get("file_seq"),
                delete_files=old.get("delete_files", []),
                # a restore is total: the old snapshot's deletion
                # vectors and partition layout come back with its files
                # (explicit — auto-carry would wrongly keep the TIP's)
                delete_vectors=old.get("delete_vectors", {}),
                partition_specs=old.get("partition_specs"),
                partitions=old.get("partitions"),
                added=0,
                restored_version=to_version,
                # restored files keep the ids they had at to_version; the
                # counter never rewinds (max of tip and target), so rows
                # appended after the restore can't collide with ids that
                # existed in the rolled-past snapshots
                row_carry={
                    "row_ids": old.get("row_ids"),
                    "next_row_id": old.get("next_row_id", 0),
                },
            )
        )

    # -- write-audit-publish (staged commits) ---------------------------------

    def _stage_path(self, stage_id: str) -> str:
        return os.path.join(self._snap_dir, f"stage-{stage_id}.json")

    def stage_append(self, df: DataFrame) -> str:
        """WAP step 1 (write): materialize ``df``'s data files and record
        them in a STAGE manifest that no reader of the table can see —
        Iceberg's write-audit-publish pattern (``spark.wap.id`` staged
        snapshots / audit branches). Returns the stage id.

        Scale: the expensive part (writing data) happens here, outside
        the commit path; publish is a metadata-only commit. A failed
        audit aborts without ever perturbing readers."""
        self._reject_reserved_cols(df)
        _, files = self._write_data_files(df)
        stage_id = uuid.uuid4().hex[:12]
        os.makedirs(self._snap_dir, exist_ok=True)
        staged = {
            "stage_id": stage_id,
            "base_version": self.current_version(),
            "operation": "append",
            "added_files": files,
            "stats": self._collect_file_stats(files),
            "schema": df.schema.json(),
        }
        with open(self._stage_path(stage_id), "w") as f:
            json.dump(staged, f, indent=1)
        return stage_id

    def read_staged(self, stage_id: str) -> DataFrame:
        """WAP step 2 (audit): the table AS IT WOULD LOOK after publish —
        current snapshot plus the staged files. Run expectations /
        dq checks against this; main-branch readers still see nothing."""
        with open(self._stage_path(stage_id)) as f:
            staged = json.load(f)
        v = self.current_version()
        base = self._read_manifest(v)["files"] if v else []
        manifest = {
            "files": base + staged["added_files"],
            "schema": staged["schema"],
        }
        return self._project_to_schema(manifest)

    def publish(self, stage_id: str) -> dict:
        """WAP step 3 (publish): atomically commit the staged files as the
        next snapshot (Iceberg ``cherrypick_snapshot`` / fast-forward of
        the audit branch). Metadata-only — data files were written at
        stage time. Appends rebase cleanly onto any tip that advanced
        since staging (their file additions commute)."""
        with open(self._stage_path(stage_id)) as f:
            staged = json.load(f)

        def build(parent: int) -> dict:
            prev_manifest = self._read_manifest(parent) if parent else {}
            prev = prev_manifest.get("files", [])
            stats = {**prev_manifest.get("stats", {}), **staged["stats"]}
            seq = {
                **prev_manifest.get("file_seq", {}),
                **{f: parent + 1 for f in staged["added_files"]},
            }
            return self._snapshot(
                "append",
                prev + staged["added_files"],
                parent,
                # same contract as fast_forward: main's CURRENT schema
                # wins field-for-field, stage-only columns append — the
                # staged schema was frozen when the audit began and must
                # not revert evolution main did since
                schema_json=self._merge_schema_json(
                    prev_manifest.get("schema"), staged["schema"]
                ),
                stats=stats,
                file_seq=seq,
                delete_files=prev_manifest.get("delete_files", []),
                # parent layout survives the publish; staged files carry
                # no tuples and are conservatively kept by pruning
                partition_specs=prev_manifest.get("partition_specs"),
                partitions=prev_manifest.get("partitions"),
                added=len(staged["added_files"]),
                published_stage=stage_id,
            )

        manifest = self._commit_with_retry(build)
        os.unlink(self._stage_path(stage_id))
        return manifest

    def abort_stage(self, stage_id: str) -> None:
        """Drop a staged write that failed its audit: remove the stage
        manifest and its (never-published) data files."""
        with open(self._stage_path(stage_id)) as f:
            staged = json.load(f)
        os.unlink(self._stage_path(stage_id))
        # files live under <root>/data/<snap-uuid>/...; remove each staged
        # snapshot dir wholesale, guarded to stay under this table's root
        data_root = os.path.join(self.path, "data")
        snap_dirs = {
            os.path.join(data_root, os.path.relpath(f, data_root).split(os.sep)[0])
            for f in staged["added_files"]
        }
        for d in snap_dirs:
            if os.path.commonpath([d, data_root]) == data_root:
                shutil.rmtree(d, ignore_errors=True)

    # -- maintenance (BASELINE.json: 'Spark read/write + compaction') ---------

    def _quantize_cols(
        self, df: DataFrame, cols: list[str], bits: int
    ) -> list[F.Column]:
        """Min-max normalize each column to ``bits``-bit integer cells
        (one tiny agg pass for the bounds). NULL sorts as the column
        minimum. Shared by the Morton and Hilbert clustering keys."""
        bounds = df.agg(
            *[F.min(c).cast("double").alias(f"min_{c}") for c in cols],
            *[F.max(c).cast("double").alias(f"max_{c}") for c in cols],
        ).first()
        top = (1 << bits) - 1
        quantized = []
        for c in cols:
            lo, hi = bounds[f"min_{c}"], bounds[f"max_{c}"]
            span = (hi - lo) or 1.0
            q = F.floor(
                (F.coalesce(F.col(c).cast("double"), F.lit(lo)) - F.lit(lo))
                / F.lit(span)
                * F.lit(float(top))
            ).cast("long")
            quantized.append(F.least(q, F.lit(top)))
        return quantized

    def _zorder_column(self, df: DataFrame, cols: list[str]) -> F.Column:
        """Z-value (Morton code) over numeric columns: each column is
        min-max normalized to 16 bits (one tiny agg pass for the bounds),
        then the bit planes are interleaved — column j contributes bit i
        at position ``i*m + j``. Pure shift/and/or expressions, so the
        whole computation stays in whole-stage codegen. NULL sorts as the
        column minimum."""
        m = len(cols)
        bits = min(16, 63 // m)  # keep the interleave clear of the sign bit
        quantized = self._quantize_cols(df, cols, bits)
        z = F.lit(0).cast("long")
        for i in range(bits):
            for j, q in enumerate(quantized):
                z = z.bitwiseOR(
                    q.bitwiseAND(F.lit(1 << i)).cast("long")
                    * F.lit(1 << (i * (m - 1) + j))
                )
        return z

    def _with_hilbert_key(
        self, src: DataFrame, cols: list[str]
    ) -> DataFrame:
        """``src`` with a ``__h`` Hilbert clustering key appended —
        the d-index over exactly TWO numeric columns (16-bit cells):
        quantize like z-order, then walk the curve via the SQL
        aggregate fold in functions/spacefilling.py. Hilbert's
        step-adjacency gives each output file a tighter bounding
        rectangle than the same-size Morton run (no quadrant-boundary
        jumps), i.e. better min/max pruning per file."""
        from ..functions.spacefilling import hilbert_sql

        if len(cols) != 2:
            raise ValueError(
                "hilbert_by requires exactly 2 columns (the 2-D walk); "
                "use zorder_by for other dimensionalities"
            )
        qx, qy = self._quantize_cols(src, cols, 16)
        return (
            src.withColumns({"__hx": qx, "__hy": qy})
            .withColumn("__h", F.expr(hilbert_sql("__hx", "__hy", 16)))
            .drop("__hx", "__hy")
        )

    def rewrite_small_files(
        self,
        min_file_bytes: int = 8 * 1024 * 1024,
        where: dict[str, tuple] | None = None,
    ) -> dict | None:
        """Bin-pack compaction that touches ONLY small files (Iceberg's
        BinPackStrategy ``min-input-files``/size-threshold behavior):
        files at or above ``min_file_bytes`` carry into the new snapshot
        verbatim — path, stats, sequence number — and only the
        small-file tail is read, coalesced, and rewritten. Pending MoR
        deletes are applied to the REWRITTEN rows only; carried files
        keep their seqs so the same deletes still apply to them on read.

        This is the steady-state maintenance tick for an append-heavy
        table: cost tracks the small-file tail (the recent appends), not
        table size — a full :meth:`rewrite_data_files` is the occasional
        re-clustering, not the hourly job. Returns None when fewer than
        two small files exist (nothing to pack).

        ``where`` scopes the pass (Delta ``OPTIMIZE ... WHERE`` /
        Iceberg's filtered rewrite): column → inclusive (lo, hi) range;
        only small files whose stats/partition tuple CAN overlap the
        range are packed, everything else is carried verbatim. Scoping
        uses the same pruning as :meth:`scan` — conservative on missing
        stats, so a scoped pass may pack a file the range does not
        strictly need, never corrupt one it does."""

        def compute(base: int) -> tuple[dict, list[str]]:
            manifest = self._read_manifest(base)
            sizes = {f: os.path.getsize(f) for f in manifest["files"]}
            small = [f for f, sz in sizes.items() if sz < min_file_bytes]
            if where:
                scoped = set(
                    self._partition_prune(
                        manifest,
                        where,
                        self._prune_files(manifest, where, None),
                    )
                )
                small = [f for f in small if f in scoped]
            if len(small) < 2:
                return None, []
            carried = [f for f in manifest["files"] if f not in set(small)]
            # packed rows keep their identity (materialized lineage) —
            # compaction must be invisible to _row_id consumers
            src = self._project_with_lineage_cols(
                {**manifest, "files": small}
            )
            specs = manifest.get("partition_specs")
            if specs:
                # partition-aware packing: coalescing across partitions
                # would strip the packed files' tuples and degrade
                # pruning — re-layout by the table's own specs instead
                # (hash distribution: one packed file per partition
                # value among the smalls)
                spec_strs = [
                    PartitionSpec(**d).spec_str for d in specs
                ]
                snap_id, new_files = self._write_data_files(
                    src, partition_by=spec_strs, distribution="hash"
                )
            else:
                packed = src.coalesce(
                    max(1, sum(sizes[f] for f in small) // min_file_bytes)
                )
                snap_id, new_files = self._write_data_files(packed)
            new_stats = self._collect_file_stats(new_files)
            old_stats = manifest.get("stats", {})
            old_seq = manifest.get("file_seq", {})
            return self._snapshot(
                "compact-small",
                carried + new_files,
                base,
                schema_json=manifest.get("schema"),
                stats={
                    **{f: old_stats[f] for f in carried if f in old_stats},
                    **new_stats,
                },
                file_seq={
                    **{f: old_seq.get(f, 0) for f in carried},
                    **{f: base + 1 for f in new_files},
                },
                # deletes stay pending: carried files keep their seqs
                # (still claimable); rewritten rows were filtered and
                # their new seq postdates every pending delete
                delete_files=manifest.get("delete_files", []),
                partition_specs=specs,
                partitions={
                    **{
                        f: t
                        for f, t in manifest.get("partitions", {}).items()
                        if f in set(carried)
                    },
                    **self._file_partitions(new_files),
                },
                added=len(new_files),
                rewritten=len(small),
                carried=len(carried),
            ), [snap_id]

        # probe before entering the commit loop so a no-op returns None
        # without a snapshot
        manifest = self._read_manifest(self.current_version())
        small = [
            f
            for f in manifest["files"]
            if os.path.getsize(f) < min_file_bytes
        ]
        if where and small:
            scoped = set(
                self._partition_prune(
                    manifest,
                    where,
                    self._prune_files(manifest, where, None),
                )
            )
            small = [f for f in small if f in scoped]
        if len(small) < 2:
            return None
        return self._commit_rmw(compute)

    def rewrite_data_files(
        self,
        target_file_count: int | None = None,
        sort_by: list[str] | None = None,
        zorder_by: list[str] | None = None,
        hilbert_by: list[str] | None = None,
        geo_cluster_by: str | None = None,
    ) -> dict:
        """Compaction: rewrite the current snapshot's files into
        ``target_file_count`` larger ones (default: executor parallelism).
        Data is unchanged; small-file pressure (the append pattern's cost)
        resets. Mirrors Iceberg ``CALL system.rewrite_data_files``.

        ``sort_by`` range-partitions + sorts the rewrite on those columns
        (Iceberg's sort-order rewrite): each output file then covers a
        narrow value range, so parquet min/max row-group stats prune
        filtered scans far harder — the cheap substitute for Z-ordering
        when one or two columns dominate the predicates.

        ``zorder_by`` instead clusters on the Morton interleave of 2+
        numeric columns (Iceberg ``rewrite_data_files(strategy=>'sort',
        sort_order=>'zorder(...)')``): every output file covers a bounded
        hyper-rectangle, so min/max pruning works for predicates on ANY
        of the z-ordered columns, not just a prefix.

        ``hilbert_by`` (exactly 2 columns) clusters on the Hilbert
        curve instead — same pruning contract as z-order but with
        step-adjacent locality (no Morton quadrant jumps), so each
        file's bounding rectangle is tighter; this is Delta OPTIMIZE's
        upgraded default and an Iceberg-spec sort transform.

        ``geo_cluster_by`` names a declared geometry column: rows are
        Hilbert-clustered on their envelope CENTERS (decoded once,
        Arrow-batched), so each output file covers a tight spatial
        rectangle and ``scan(geo_bbox=...)`` pruning bites after
        arbitrary-order ingestion — the geometry-aware OPTIMIZE a
        spatial table needs (NULL geometries cluster together at the
        origin)."""
        n = target_file_count or self.spark.sparkContext.defaultParallelism
        if geo_cluster_by and geo_cluster_by not in self._geo_columns():
            raise ValueError(
                f"{geo_cluster_by!r} is not a declared geometry column"
            )

        def compute(base: int) -> tuple[dict, list[str]]:
            # re-clustering rewrites every row — identity must ride along
            # (materialized __row_id/__last_updated), or a z-order pass
            # would silently re-key every downstream lineage consumer
            src = self._project_with_lineage_cols(self._read_manifest(base))
            if geo_cluster_by:
                from ..functions.geo import wkb_bbox

                # one bbox decode per row (materialized struct — field
                # refs on the raw UDF column would re-evaluate it)
                tmp = src.withColumn(
                    "__gbb", wkb_bbox(F.col(geo_cluster_by))
                )

                def center(lo, hi):
                    c = (
                        F.col(f"__gbb.{lo}") + F.col(f"__gbb.{hi}")
                    ) / 2
                    # NULL geometry: NaN or null center depending on the
                    # Arrow conversion — pin both to the origin
                    return F.when(
                        c.isNull() | F.isnan(c), F.lit(0.0)
                    ).otherwise(c)

                centered = tmp.withColumns(
                    {
                        "__gx": center("xmin", "xmax"),
                        "__gy": center("ymin", "ymax"),
                    }
                ).drop("__gbb")
                df = (
                    self._with_hilbert_key(centered, ["__gx", "__gy"])
                    .repartitionByRange(n, "__h")
                    .sortWithinPartitions("__h")
                    .drop("__h", "__gx", "__gy")
                )
            elif hilbert_by:
                df = (
                    self._with_hilbert_key(src, hilbert_by)
                    .repartitionByRange(n, "__h")
                    .sortWithinPartitions("__h")
                    .drop("__h")
                )
            elif zorder_by:
                z = self._zorder_column(src, zorder_by)
                df = (
                    src.withColumn("__z", z)
                    .repartitionByRange(n, "__z")
                    .sortWithinPartitions("__z")
                    .drop("__z")
                )
            elif sort_by:
                df = src.repartitionByRange(n, *sort_by).sortWithinPartitions(
                    *sort_by
                )
            else:
                df = src.coalesce(n)
            snap_id, files = self._write_data_files(df)
            stats = self._collect_file_stats(files)
            return self._snapshot(
                "compact",
                files,
                base,
                schema_json=self._read_manifest(base).get("schema"),
                stats=stats,
                file_seq={f: base + 1 for f in files},
                # partition specs deliberately NOT carried: a full
                # re-clustering (sort/z-order) REPLACES the table's
                # physical layout — stats-range pruning over the new
                # clustering takes over; a later partitioned append
                # re-establishes specs if wanted. (Contrast
                # rewrite_small_files, which preserves layout.)
                delete_files=[],  # read applied them; deletes materialize
                added=len(files),
            ), [snap_id]

        return self._commit_rmw(compute)

    def rewrite_manifest_parts(self) -> dict | None:
        """Iceberg ``CALL system.rewrite_manifests``: consolidate the
        snapshot's manifest-part list into ONE part. Pure metadata — no
        data file is read or written; the file inventory is re-factored
        with carrying disabled so the commit emits a single fresh part.

        Scale: every data commit adds one part, so after N commits a
        planner opens N small JSONs; this collapses that to one
        O(files) read, the same planning-latency argument as Iceberg's
        manifest rewrite. Run it on the maintenance tick alongside
        rewrite_small_files. The superseded parts are reclaimed when
        the pre-rewrite snapshots expire (two-level GC)."""
        v = self.current_version()
        if not v:
            return None
        if len(self._raw_manifest(self._manifest_path(v)).get("parts", [])) <= 1:
            return None

        def build(parent: int) -> dict:
            prev = self._read_manifest(parent)
            m = self._snapshot(
                "rewrite-manifests",
                prev["files"],
                parent,
                schema_json=prev.get("schema"),
                stats=prev.get("stats"),
                file_seq=prev.get("file_seq"),
                delete_files=prev.get("delete_files", []),
                partition_specs=prev.get("partition_specs"),
                partitions=prev.get("partitions"),
                added=0,
                rewrote_manifest_parts=True,
            )
            m["_no_carry"] = True
            return m

        manifest = self._commit_with_retry(build)
        manifest.pop("_no_carry", None)
        return manifest

    def rewrite_position_delete_files(self) -> dict | None:
        """Targeted compaction of pending POSITION deletes — Iceberg's
        ``rewrite_position_delete_files`` intent: rewrite ONLY the files
        the coordinates actually name (applying every pending delete to
        their rows), carry all other files by path, and drop the
        position-delete entries. Equality-delete entries stay pending —
        they may still claim rows in untouched files; they no longer
        apply to the rewritten files, whose rows were already filtered
        and whose new sequence number postdates them.

        Scale: this is the operation that makes MoR deletes sustainable
        at 100 TB — a full ``rewrite_data_files`` pays O(table) to clear
        O(deleted rows) of state, this pays O(targeted files). Returns
        None if no position deletes are pending."""
        if not any(
            d.get("pos")
            for d in self._read_manifest(self.current_version()).get(
                "delete_files", []
            )
        ):
            return None
        from urllib.parse import urlparse

        def compute(base: int) -> tuple[dict, list[str]]:
            manifest = self._read_manifest(base)
            pos_entries = [
                d for d in manifest.get("delete_files", []) if d.get("pos")
            ]
            coord_files = [f for d in pos_entries for f in d["files"]]
            # coordinates store the reader's file URI (file:///...); the
            # manifest stores plain paths — normalize before intersecting
            targeted = (
                {
                    urlparse(r["__file"]).path
                    for r in self.spark.read.parquet(*coord_files)
                    .select("__file")
                    .distinct()
                    .collect()
                }
                & set(manifest["files"])
                if pos_entries
                else set()
            )
            untouched = [f for f in manifest["files"] if f not in targeted]
            scratch: list[str] = []
            new_files: list[str] = []
            new_stats: dict[str, dict] = {}
            if targeted:
                # survivors of the targeted files keep their row ids
                src = self._project_with_lineage_cols(
                    {**manifest, "files": sorted(targeted)}
                )
                snap_id, new_files = self._write_data_files(src)
                scratch.append(snap_id)
                new_stats = self._collect_file_stats(new_files)
            old_stats = manifest.get("stats", {})
            old_seq = manifest.get("file_seq", {})
            return self._snapshot(
                "rewrite-pos-deletes",
                untouched + new_files,
                base,
                schema_json=manifest.get("schema"),
                stats={
                    **{f: old_stats[f] for f in untouched if f in old_stats},
                    **new_stats,
                },
                file_seq={
                    **{f: old_seq.get(f, 0) for f in untouched},
                    **{f: base + 1 for f in new_files},
                },
                delete_files=[
                    d
                    for d in manifest.get("delete_files", [])
                    if not d.get("pos")
                ],
                partition_specs=manifest.get("partition_specs"),
                partitions=manifest.get("partitions"),
                added=len(new_files),
                rewritten=len(targeted),
                carried=len(untouched),
            ), scratch

        return self._commit_rmw(compute)

    def expire_snapshots(
        self,
        keep_last: int | None = None,
        dry_run: bool = False,
        older_than_ts: float | None = None,
    ) -> list[int] | dict:
        """Drop all but the last ``keep_last`` snapshot manifests and
        garbage-collect the data directories those EXPIRED manifests
        referenced (minus anything a retained manifest still needs).
        Mirrors Iceberg ``CALL system.expire_snapshots``.

        Deliberately does NOT delete unreferenced directories it has never
        seen in a manifest: those may belong to an in-flight commit whose
        data files are written but whose manifest isn't published yet
        (concurrent committers are supported). Cleaning true orphans is a
        separate age-based pass (``remove_orphan_files``), exactly as in
        Iceberg. Returns expired version numbers.

        ``dry_run=True`` (Iceberg's retention preview) deletes NOTHING
        and returns the full impact report — which versions would
        expire, which data files become unreferenced (``doomed``), and
        which manifest parts would go — so an operator can check a
        retention change before running it. The subsequent real run
        expires exactly the reported versions; doomed data files are
        physically removed per-directory (a directory goes only when
        every file in it is doomed — the same conservative rule as the
        real pass has always used)."""
        current = self.current_version()
        if keep_last is None:
            # the table's retention floor (Iceberg
            # history.expire.min-snapshots-to-keep), default 1
            keep_last = self._int_property(
                "history.expire.min-snapshots-to-keep"
            )
        # the CURRENT snapshot is never expirable (keep_last=0 would
        # delete the live manifest)
        keep_last = max(keep_last, 1)
        cutoff = max(current - keep_last + 1, 1)
        if older_than_ts is not None:
            # Iceberg's expire_snapshots(older_than, retain_last):
            # age-eligible = committed strictly before the timestamp;
            # keep_last still floors how much history survives. The
            # walk stops at the first young-enough snapshot so history
            # never becomes discontiguous.
            age_cutoff = 1
            for v in range(1, current + 1):
                p = self._manifest_path(v)
                if not os.path.exists(p):
                    age_cutoff = v + 1
                    continue
                committed = self._raw_manifest(p).get("committed_at")
                if committed is None:
                    # unknown commit time (ADVICE r5): a missing field
                    # must be retained conservatively, not treated as
                    # infinitely old — stop the age walk here
                    break
                if committed < older_than_ts:
                    age_cutoff = v + 1
                else:
                    break
            cutoff = min(cutoff, age_cutoff)
        # retention anchors: tags + every live branch's fork point
        tagged = set(self.tags().values()) | {
            b["base_version"] for b in self.branches().values()
        }
        retained_files: set[str] = set(self._branch_referenced_files())
        retained_parts: set[str] = self._branch_referenced_parts()
        for v in range(1, current + 1):
            if (v >= cutoff or v in tagged) and os.path.exists(
                self._manifest_path(v)
            ):
                retained_parts.update(
                    self._raw_manifest(self._manifest_path(v)).get("parts", [])
                )
                m = self._read_manifest(v)
                retained_files.update(m["files"])
                retained_files.update(self._delete_key_files(m))

        expired = []
        expired_files: set[str] = set()
        expired_parts: set[str] = set()
        expired_ops: dict[str, str] = {}
        for v in range(1, cutoff):
            p = self._manifest_path(v)
            if v in tagged or not os.path.exists(p):
                continue
            raw = self._raw_manifest(p)
            expired_parts.update(raw.get("parts", []))
            expired_ops[str(v)] = raw.get("operation") or "unknown"
            m = self._read_manifest(v)
            expired_files.update(m["files"])
            expired_files.update(self._delete_key_files(m))
            if not dry_run:
                os.remove(p)
                # per-snapshot sidecars die with their manifest: the
                # partition-stats rollup always; the NDV stats blob
                # unless it is the NEWEST one (it seeds the next
                # analyze()'s incremental register merge)
                for sidecar in (
                    self._pstats_path(v),
                    os.path.join(self._stats_dir, f"ndv-v{v}.json"),
                ):
                    if sidecar == self._latest_ndv_file():
                        continue
                    try:
                        os.remove(sidecar)
                    except OSError:
                        pass
            expired.append(v)

        if dry_run:
            return {
                "would_expire_versions": expired,
                "doomed_files": sorted(expired_files - retained_files),
                "doomed_parts": sorted(expired_parts - retained_parts),
                "retained_file_count": len(retained_files),
            }

        # record each expired version's OPERATION in a tiny sidecar
        # (ADVICE r10): a streaming upsert's concurrent-conflict check
        # scans its rebase window's snapshot ops — when expiry removed
        # one mid-stream, the op record lets the check prove the expired
        # commit benign instead of conservatively dropping the batch.
        # O(history) strings; readers treat an absent/garbled sidecar
        # as "unknown" (the old conservative behavior).
        if expired:
            ops_path = os.path.join(
                self.path, "snapshots", "expired-ops.json"
            )
            try:
                with open(ops_path) as f:
                    rec = json.load(f)
            except (OSError, ValueError):
                rec = {}
            rec.update(expired_ops)
            _publish_sidecar(ops_path, rec)

        # manifest parts referenced ONLY by expired snapshots go with them
        # (metadata GC — the manifest-list half of Iceberg's expire)
        for pp in expired_parts - retained_parts:
            try:
                os.remove(pp)
            except OSError:
                pass

        doomed = expired_files - retained_files
        for snap_dir in glob.glob(os.path.join(self.path, "data", "*")):
            files = set(
                glob.glob(os.path.join(snap_dir, "**", "*.parquet"), recursive=True)
            )
            if files and files <= doomed:
                shutil.rmtree(snap_dir)
        # superseded DV containers (their data file got a newer bitmap,
        # or was rewritten) referenced only by now-expired manifests —
        # scoped to THIS table's deletes/ dir so a clone never reclaims
        # its source's containers
        for p in doomed:
            if os.path.dirname(p) == self._dv_dir:
                try:
                    os.remove(p)
                except OSError:
                    pass
        return expired

    def remove_orphan_files(self, older_than_seconds: float = 3600.0) -> list[str]:
        """Age-based orphan cleanup: delete data directories referenced by
        NO manifest (committed or expired) that are older than the grace
        period — old enough that no in-flight commit can still claim them.
        Mirrors Iceberg ``CALL system.remove_orphan_files``."""
        referenced: set[str] = set(self._branch_referenced_files())
        for snap in self.snapshots():
            referenced.update(snap["files"])
            referenced.update(self._delete_key_files(snap))
        # staged WAP commits are live until published or aborted, however
        # long the audit takes — age alone must not reclaim them
        for sp in glob.glob(os.path.join(self._snap_dir, "stage-*.json")):
            with open(sp) as f:
                referenced.update(json.load(f).get("added_files", []))
        removed = []
        now = time.time()
        for snap_dir in glob.glob(os.path.join(self.path, "data", "*")):
            files = set(
                glob.glob(os.path.join(snap_dir, "**", "*.parquet"), recursive=True)
            )
            age = now - os.path.getmtime(snap_dir)
            if files and not (files & referenced) and age > older_than_seconds:
                shutil.rmtree(snap_dir)
                removed.append(snap_dir)
        # manifest parts no live manifest references (strandings from
        # failed commit attempts, dropped branches): same age guard — a
        # part younger than the grace period may belong to an in-flight
        # commit whose manifest isn't linked yet
        live_parts: set[str] = self._branch_referenced_parts()
        for v in range(1, self.current_version() + 1):
            p = self._manifest_path(v)
            if os.path.exists(p):
                live_parts.update(self._raw_manifest(p).get("parts", []))
        for pp in glob.glob(os.path.join(self._parts_dir, "part-*.json")):
            if pp not in live_parts and now - os.path.getmtime(pp) > older_than_seconds:
                os.remove(pp)
                removed.append(pp)
        # sidecars (bloom / checksum) whose data file is gone everywhere:
        # keyed by path-hash of immutable files, so once the file has
        # been GC'd the sidecar can never be read again — same age guard
        # DV containers no live manifest references (failed commit
        # attempts, superseded-then-expired bitmaps): same age guard
        for dvp in glob.glob(os.path.join(self._dv_dir, "dv-*.bin")):
            if (
                dvp not in referenced
                and now - os.path.getmtime(dvp) > older_than_seconds
            ):
                os.remove(dvp)
                removed.append(dvp)
        # encryption key sidecars whose artifact is referenced by no
        # retained manifest: removing the wrapped data key after the
        # ciphertext is unreferenced is CRYPTO-SHREDDING — even a disk
        # image of the expired file stays unreadable. Same age guard.
        ref_basenames = {os.path.basename(f) for f in referenced}
        for kp in glob.glob(os.path.join(self.path, "keys", "*.json")):
            artifact = os.path.basename(kp)[: -len(".json")]
            if (
                artifact not in ref_basenames
                and now - os.path.getmtime(kp) > older_than_seconds
            ):
                os.remove(kp)
                removed.append(kp)
        ref_hashes = {
            os.path.basename(self._bloom_sidecar_path(f))
            for f in referenced
        }
        for d in (self._bloom_dir, self._checksum_dir):
            for sp in glob.glob(os.path.join(d, "*.json")):
                if (
                    os.path.basename(sp) not in ref_hashes
                    and now - os.path.getmtime(sp) > older_than_seconds
                ):
                    os.remove(sp)
                    removed.append(sp)
        return removed

    # -- integrity checksums (bit-rot / tamper detection) ---------------------
    #
    # Parquet footers checksum pages, but nothing ties a file's BYTES to
    # the table's metadata: silent storage corruption (or an out-of-band
    # overwrite) reads as valid-if-different data. A checksum sidecar per
    # data file — md5 of the full byte stream, keyed by path hash like
    # the bloom sidecars (data files are immutable and per-commit unique,
    # so a sidecar can never go stale) — lets verify_integrity() prove
    # every live file still holds the bytes it was committed with. This
    # is the auditor's half of Iceberg's content-file model (Iceberg
    # records file sizes; object stores add ETags; self-managed
    # filesystems get neither for free).
    #
    # Opt-in and post-hoc (ANALYZE-style, like add_bloom_filters): the
    # hash pass streams every byte once, which belongs in a maintenance
    # window, not on the commit path. At cluster scale the hashing
    # parallelizes per file (a mapPartitions over file paths); here a
    # thread pool suffices.

    @property
    def _checksum_dir(self) -> str:
        return os.path.join(self.path, "checksums")

    def _checksum_path(self, data_file: str) -> str:
        import hashlib

        h = hashlib.md5(data_file.encode()).hexdigest()[:16]
        return os.path.join(self._checksum_dir, f"{h}.json")

    @staticmethod
    def _file_md5(path: str) -> str:
        import hashlib

        h = hashlib.md5()
        with open(path, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        return h.hexdigest()

    def add_integrity_checksums(self) -> int:
        """Record (md5, size) sidecars for the CURRENT snapshot's data
        files, skipping files already covered. Returns files hashed in
        this pass."""
        from concurrent.futures import ThreadPoolExecutor

        os.makedirs(self._checksum_dir, exist_ok=True)
        files = [
            f
            for f in self._read_manifest(self.current_version())["files"]
            if not os.path.exists(self._checksum_path(f))
        ]

        def one(f: str) -> None:
            rec = {
                "file": f,
                "md5": self._file_md5(f),
                "size": os.path.getsize(f),
            }
            with open(self._checksum_path(f), "w") as fh:
                json.dump(rec, fh)

        if files:
            with ThreadPoolExecutor(
                max_workers=min(16, len(files))
            ) as ex:
                list(ex.map(one, files))
        return len(files)

    def verify_integrity(
        self, version: int | str | None = None
    ) -> dict[str, list[str]]:
        """Audit a snapshot's data files against their checksum sidecars.
        Returns {'ok': [...], 'corrupted': [...], 'missing_file': [...],
        'unverified': [...]} — corrupted = bytes changed since
        add_integrity_checksums (size or md5 mismatch), unverified = no
        sidecar exists (file committed after the last checksum pass).
        Never raises on a finding: the caller decides whether a dirty
        table aborts the job or pages an operator."""
        v = self._resolve_version(version)
        out: dict[str, list[str]] = {
            "ok": [],
            "corrupted": [],
            "missing_file": [],
            "unverified": [],
        }
        for f in self._read_manifest(v)["files"]:
            cp = self._checksum_path(f)
            if not os.path.exists(f):
                out["missing_file"].append(f)
                continue
            if not os.path.exists(cp):
                out["unverified"].append(f)
                continue
            with open(cp) as fh:
                rec = json.load(fh)
            if (
                os.path.getsize(f) != rec["size"]
                or self._file_md5(f) != rec["md5"]
            ):
                out["corrupted"].append(f)
            else:
                out["ok"].append(f)
        return out

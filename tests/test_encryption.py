"""Table encryption (Iceberg v3 pillar, r9 — VERDICT r8 #2): per-file
AES-GCM data keys wrapped by a caller-held table key, key metadata in
per-file sidecars, plaintext manifest stats (encrypt-then-stat),
rotation without data rewrite, loud wrong-key failure, and raw-parquet
unreadability. Every read surface — table reads, mutations, changelog,
CDC, DSv2 batch, both streaming readers — is exercised against a
PLAINTEXT TWIN table receiving identical operations."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from apache_iceberg_exploration_spark.sources import encryption as E
from apache_iceberg_exploration_spark.sources.lakehouse import (
    LakehouseTable,
)

KEY = bytes(range(16))
KEY2 = bytes(range(16, 48))


def _mk(spark, tmp_path, name, key=KEY):
    t = LakehouseTable(spark, str(tmp_path / name), encryption_key=key)
    if key is not None:
        t.enable_encryption(key)
    return t


def _rows(spark, lo, hi):
    return spark.createDataFrame(
        [Row(k=i, v=i * 10, s=f"s{i}") for i in range(lo, hi)]
    ).repartition(2, "k")


def _twins(spark, tmp_path):
    """(encrypted, plaintext) tables receiving identical mutations."""
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


def _vals(df):
    return sorted(map(tuple, df.select("k", "v", "s").collect()))


def test_roundtrip_and_raw_unreadability(spark, tmp_path):
    t = _mk(spark, tmp_path, "t")
    t.append(_rows(spark, 0, 50))
    assert _vals(t.read()) == [(i, i * 10, f"s{i}") for i in range(50)]
    m = t._read_manifest(1)
    import pyarrow.parquet as pq

    for f in m["files"]:
        assert E.is_encrypted_file(f)
        with pytest.raises(Exception):
            pq.read_table(f)  # ciphertext: not parquet
        # plaintext stats still in the manifest (encrypt-then-stat)
        st = m["stats"][f]
        assert st["__rows"] > 0 and "k" in st and "__nulls" in st
        # key sidecar exists and holds a WRAPPED key, not the key
        meta = E.read_key_sidecar(f)
        assert meta["key_id"] == "k1" and "wrapped" in meta["key"]


def test_wrong_and_missing_key_fail_loudly(spark, tmp_path):
    t = _mk(spark, tmp_path, "t")
    t.append(_rows(spark, 0, 10))
    bad = LakehouseTable(spark, t.path, encryption_key=b"x" * 16)
    with pytest.raises(ValueError, match="wrong table key"):
        bad.read().collect()
    nokey = LakehouseTable(spark, t.path)
    with pytest.raises(ValueError, match="encrypted"):
        nokey.read().collect()


def test_all_mutations_match_plaintext_twin(spark, tmp_path):
    enc, plain = _twins(spark, tmp_path)
    assert _vals(enc.read()) == _vals(plain.read())
    assert enc.count_rows() == plain.count_rows()
    # lineage over encrypted files: ids unique, one per row (exact id
    # values depend on file path order, so no cross-table comparison)
    ids = {
        r["k"]: r["_row_id"]
        for r in enc.read(with_lineage=True).collect()
    }
    assert len(ids) == enc.read().count()
    # value-mode changelog parity; row-level compared on values+type
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
    # compaction materializes all pending deletes; state identical and
    # row identity survives the encrypted rewrite (Iceberg v3 contract)
    enc.rewrite_data_files(target_file_count=2)
    plain.rewrite_data_files(target_file_count=2)
    assert _vals(enc.read()) == _vals(plain.read())
    after = {
        r["k"]: r["_row_id"]
        for r in enc.read(with_lineage=True).collect()
    }
    assert after == ids
    assert all(E.is_encrypted_file(f) for f in enc._read_manifest(enc.current_version())["files"])


def test_cdc_feed_parity(spark, tmp_path):
    from apache_iceberg_exploration_spark.streaming.lakehouse_source import (
        _cdc_rows,
    )

    enc, plain = _twins(spark, tmp_path)
    v = enc.current_version()
    ce = sorted(_cdc_rows(enc.path, 0, v, ["k", "v", "s"], table_key=KEY), key=repr)
    cp = sorted(_cdc_rows(plain.path, 0, v, ["k", "v", "s"]), key=repr)
    assert [r[:4] for r in ce] == [r[:4] for r in cp]  # values+type+ver


def test_dsv2_and_streaming_readers(spark, tmp_path):
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
        spark.read.format("lakehouse").option("path", enc.path).load().count()
    # filter pushdown still prunes via the plaintext sidecar stats
    pruned = (
        spark.read.format("lakehouse")
        .option("path", enc.path)
        .option("encryptionKey", KEY.hex())
        .load()
        .filter(F.col("k").between(40, 45))
    )
    assert pruned.count() == plain.read().filter(F.col("k").between(40, 45)).count()
    # streaming CDC through the dist reader equals the plaintext feed
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
        ke = sorted(map(tuple, fe.drop("_commit_timestamp").collect()), key=repr)
        kp = sorted(map(tuple, fp.drop("_commit_timestamp").collect()), key=repr)
        assert ke == kp and len(ke) > 0


def test_key_rotation_preserves_history(spark, tmp_path):
    t = _mk(spark, tmp_path, "t")
    t.append(_rows(spark, 0, 20))
    t.delete_where_dv(F.col("k") == 5)
    t.append(_rows(spark, 20, 30))
    v1_rows = _vals(t._project_to_schema(t._read_manifest(1)))
    n = t.rotate_table_key(KEY2, "k2")
    assert n >= 3  # data files + DV container sidecars
    t2 = LakehouseTable(spark, t.path, encryption_key=KEY2)
    assert _vals(t2.read()) == _vals(t.read())
    # time travel to v1 still decrypts (data keys unchanged)
    assert _vals(t2._project_to_schema(t2._read_manifest(1))) == v1_rows
    assert E.read_key_sidecar(t2._read_manifest(1)["files"][0])["key_id"] == "k2"
    # the old key is dead
    old = LakehouseTable(spark, t.path, encryption_key=KEY)
    with pytest.raises(ValueError, match="wrong table key"):
        old.read().collect()


def test_partitioned_encrypted_write(spark, tmp_path):
    t = _mk(spark, tmp_path, "t")
    df = spark.createDataFrame(
        [Row(k=i, g=i % 3, v=i * 2) for i in range(30)]
    ).repartition(2)
    t.append(df, partition_by=["g"], distribution="hash")
    m = t._read_manifest(1)
    # hive layout + partition tuples recorded + one file per partition
    assert len(m["files"]) == 3
    assert all("/g=" in f for f in m["files"])
    assert sorted(m["partitions"][f]["g"] for f in m["files"]) == ["0", "1", "2"]
    got = sorted(
        map(tuple, t.read().select("k", "g", "v").collect())
    )
    assert got == [(i, i % 3, i * 2) for i in range(30)]
    # partition-scoped scan stays correct
    assert t.scan({"g": (1, 1)}).count() == 10


def test_sink_writers_encrypt_with_key_refuse_plaintext(spark, tmp_path):
    """r9 continuation: the streaming sink and DSv2 batch writer
    encrypt executor-side when given encryptionKey; a plaintext batch
    into an encrypted table fails at COMMIT (before any manifest), and
    a wrong key fails at writer construction."""
    from apache_iceberg_exploration_spark.streaming.lakehouse_sink import (
        _commit_append,
        write_task_files,
    )
    from apache_iceberg_exploration_spark.streaming.lakehouse_source import (
        make_lakehouse_batch_source,
    )

    t = _mk(spark, tmp_path, "t")
    t.append(_rows(spark, 0, 5))
    # plaintext task files into an encrypted table: refused at commit
    files, stats, _ = write_task_files(
        [{"k": 99, "v": 990, "s": "x"}], t.path
    )
    with pytest.raises(ValueError, match="ENCRYPTED"):
        _commit_append(t.path, files, stats, {})
    # DSv2 batch writer with the key: encrypted files, readable state
    spark.dataSource.register(make_lakehouse_batch_source())
    _rows(spark, 100, 110).write.format("lakehouse").option(
        "path", t.path
    ).option("encryptionKey", KEY.hex()).mode("append").save()
    m = t._read_manifest(t.current_version())
    assert all(E.is_encrypted_file(f) for f in m["files"])
    assert t.read().count() == 15
    # wrong key: loud failure before any write
    with pytest.raises(Exception, match="wrong table key"):
        _rows(spark, 0, 1).write.format("lakehouse").option(
            "path", t.path
        ).option("encryptionKey", "00" * 16).mode("append").save()


def test_streaming_sink_upsert_on_encrypted_table(spark, tmp_path):
    """The full composition: keyed CDC stream upserted INTO an
    encrypted table — data files AND the per-batch equality-delete key
    files are ciphertext; latest-state reads back exactly."""
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
    dst = _mk(spark, tmp_path, "dst")  # pre-created, encrypted
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
    # every artifact — data AND equality key files — is ciphertext
    for f in m["files"]:
        assert E.is_encrypted_file(f)
    for d in m.get("delete_files", []):
        for kf in d["files"]:
            assert E.is_encrypted_file(kf)


def test_gc_crypto_shreds_expired_keys(spark, tmp_path):
    t = _mk(spark, tmp_path, "t")
    t.append(_rows(spark, 0, 10))
    old_files = t._read_manifest(1)["files"]
    t.overwrite(_rows(spark, 10, 20))
    t.expire_snapshots(keep_last=1)
    # age the artifacts past the grace period
    for p in old_files + [E.key_sidecar_path(f) for f in old_files]:
        if os.path.exists(p):
            os.utime(p, (1, 1))
    removed = t.remove_orphan_files(older_than_seconds=3600)
    for f in old_files:
        assert not os.path.exists(E.key_sidecar_path(f)), f
    # live files keep their sidecars
    for f in t._read_manifest(t.current_version())["files"]:
        assert os.path.exists(E.key_sidecar_path(f))


def test_enable_on_existing_table_mixes_and_compaction_unifies(
    spark, tmp_path
):
    t = LakehouseTable(spark, str(tmp_path / "t"))
    t.append(_rows(spark, 0, 20))  # plaintext era
    t.encryption_key = KEY
    t.enable_encryption(KEY)
    t.append(_rows(spark, 20, 30))  # encrypted era
    m = t._read_manifest(t.current_version())
    kinds = {E.is_encrypted_file(f) for f in m["files"]}
    assert kinds == {True, False}  # mixed table reads fine
    assert _vals(t.read()) == [(i, i * 10, f"s{i}") for i in range(30)]
    t.rewrite_data_files(target_file_count=1)
    m2 = t._read_manifest(t.current_version())
    assert all(E.is_encrypted_file(f) for f in m2["files"])
    assert _vals(t.read()) == [(i, i * 10, f"s{i}") for i in range(30)]


def test_encrypted_geo_table_bbox_scan(spark, tmp_path):
    """Geometry columns compose with encryption: envelope shreds are
    materialized INTO the encrypted files, their min/max land in the
    plaintext sidecar stats, so scan(geo_bbox=...) still file-prunes a
    ciphertext table and the residual decodes WKB post-decrypt."""
    from apache_iceberg_exploration_spark.functions.geo import st_point

    t = _mk(spark, tmp_path, "t")
    pts = spark.range(0, 200).select(
        F.col("id").alias("k"),
        st_point(
            (F.col("id") % 100).cast("double"),
            (F.col("id") % 100).cast("double"),
        ).alias("geom"),
    )
    # two spatially disjoint encrypted files: x in [0,50) and [50,100)
    t.overwrite(
        pts.filter(F.col("k") % 100 < 50).coalesce(1),
        geo_cols=["geom"],
    )
    t.append(pts.filter(F.col("k") % 100 >= 50).coalesce(1))
    m = t._read_manifest(t.current_version())
    assert all(E.is_encrypted_file(f) for f in m["files"])
    # shred stats are in the PLAINTEXT sidecar-fed manifest stats
    st = m["stats"][m["files"][0]]
    assert "__geo_geom_xmin" in st
    hit = t.scan(geo_bbox={"geom": (10.0, 10.0, 20.0, 20.0)})
    assert sorted(r["k"] for r in hit.collect()) == sorted(
        k for k in range(200) if 10 <= k % 100 <= 20
    )


def test_partitioned_upsert_on_encrypted_table(spark, tmp_path):
    """partitionBy + mode=upsert + encryption in one sink write: data
    files land hive-partitioned AND encrypted, partition tuples are
    recorded, and latest-state survives."""
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
            [Row(k=i, g=i % 2, val=f"a{i}") for i in range(10)]
        ).repartition(2, "k")
    )
    src.append(
        spark.createDataFrame(
            [Row(k=3, g=1, val="b3"), Row(k=11, g=1, val="b11")]
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
            .option("partitionBy", "g")
            .option("encryptionKey", KEY.hex())
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q, 300)
    got = {r["k"]: (r["g"], r["val"]) for r in dst.read().collect()}
    want = {i: (i % 2, f"a{i}") for i in range(10)}
    want.update({3: (1, "b3"), 11: (1, "b11")})
    assert got == want
    m = dst._read_manifest(dst.current_version())
    data_files = m["files"]
    assert all("/g=" in f for f in data_files)
    assert all(E.is_encrypted_file(f) for f in data_files)
    assert all(
        m["partitions"][f]["g"] in ("0", "1") for f in data_files
    )
    # partition-scoped read stays exact on the encrypted layout
    assert dst.scan({"g": (1, 1)}).count() == sum(
        1 for v in want.values() if v[0] == 1
    )

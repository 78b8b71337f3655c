"""Geometry columns in lakehouse tables (Iceberg v3 geo types).

The declared type is ``binary`` holding WKB; ``overwrite(geo_cols=...)``
declares which columns are geometry (stored in the ``geo.columns`` table
property), after which EVERY write materializes reserved
``__geo_<col>_{xmin,ymin,xmax,ymax}`` envelope shreds whose footer
min/max become per-file bounding boxes in the manifest —
``scan(geo_bbox=...)`` file-skips on them (functions/geo.py has the WKB
codec kernels).
"""

from __future__ import annotations


import pytest
from pyspark.sql import functions as F

from apache_iceberg_exploration_spark.functions.geo import (
    bbox_of,
    exterior_ring,
    st_contains_point,
    st_point,
    st_polygon,
    st_ring,
    st_x,
    st_y,
    wkb_point_bytes,
    wkb_polygon_bytes,
)
from apache_iceberg_exploration_spark.sources.lakehouse import (
    LakehouseTable,
)


@pytest.fixture
def table(spark, tmp_path):
    return LakehouseTable(spark, str(tmp_path / "geo_tbl"))


def _points(spark, lo, hi):
    """Deterministic point cloud: x in [lo, hi), y = 2x + 1."""
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        st_point(
            F.col("id").cast("double"),
            (F.col("id") * 2 + 1).cast("double"),
        ).alias("geom"),
    )


def _seeded(spark, table):
    """Two spatially disjoint files: x in [0,50) and [100,150)."""
    table.overwrite(
        _points(spark, 0, 50).coalesce(1).sortWithinPartitions("k"),
        geo_cols=["geom"],
    )
    table.append(_points(spark, 100, 150).coalesce(1).sortWithinPartitions("k"))


# -- pure codec ------------------------------------------------------------


def test_wkb_codec_roundtrip():
    p = wkb_point_bytes(3.5, -7.25)
    assert bbox_of(p) == (3.5, -7.25, 3.5, -7.25)
    assert exterior_ring(p) == [3.5, -7.25]
    poly = wkb_polygon_bytes([0, 0, 4, 0, 4, 4, 0, 4])
    # ring auto-closed
    assert exterior_ring(poly) == [0, 0, 4, 0, 4, 4, 0, 4, 0, 0]
    assert bbox_of(poly) == (0, 0, 4, 4)


def test_wkb_big_endian_and_multi():
    import struct

    # big-endian point
    be = struct.pack(">BIdd", 0, 1, 2.0, 9.0)
    assert bbox_of(be) == (2.0, 9.0, 2.0, 9.0)
    # multipoint: count + nested WKB points
    mp = struct.pack("<BII", 1, 4, 2) + wkb_point_bytes(
        -1.0, 5.0
    ) + wkb_point_bytes(3.0, -2.0)
    assert bbox_of(mp) == (-1.0, -2.0, 3.0, 5.0)


def test_kernels_roundtrip(spark):
    df = spark.range(5).select(
        F.col("id").alias("k"),
        st_point(
            F.col("id").cast("double"), (F.col("id") * 10).cast("double")
        ).alias("g"),
    )
    got = df.select(
        "k", st_x("g").alias("x"), st_y("g").alias("y")
    ).collect()
    assert all(r["x"] == r["k"] and r["y"] == 10 * r["k"] for r in got)
    ring = df.limit(1).select(st_ring("g").alias("r")).first()["r"]
    assert ring == [0.0, 0.0]


def test_point_in_polygon_concave(spark):
    # concave "notch" polygon: unit square with a bite from the top
    ring = [0, 0, 10, 0, 10, 10, 5, 3, 0, 10]
    cases = [
        (5.0, 1.0, True),  # deep inside
        (5.0, 5.0, False),  # inside the notch (outside polygon)
        (1.0, 8.0, True),  # left lobe
        (9.0, 8.0, True),  # right lobe
        (11.0, 1.0, False),  # right of everything
    ]
    df = spark.createDataFrame(cases, "px double, py double, want boolean")
    got = df.select(
        "want",
        st_contains_point(
            st_polygon(F.lit(ring).cast("array<double>")), "px", "py"
        ).alias("got"),
    ).collect()
    assert all(r["got"] == r["want"] for r in got)


# -- lakehouse integration ---------------------------------------------------


def test_geo_roundtrip_and_hidden_shreds(spark, table):
    _seeded(spark, table)
    back = table.read()
    assert [c for c in back.columns] == ["k", "geom"]
    got = back.select(
        "k", st_x("geom").alias("x"), st_y("geom").alias("y")
    ).collect()
    assert len(got) == 100
    assert all(r["x"] == r["k"] and r["y"] == 2 * r["k"] + 1 for r in got)


def test_geo_shreds_in_files_and_stats(spark, table):
    import pyarrow.parquet as pq

    _seeded(spark, table)
    m = table._read_manifest(table.current_version())
    for f in m["files"]:
        names = pq.ParquetFile(f).schema_arrow.names
        for part in ("xmin", "ymin", "xmax", "ymax"):
            assert f"__geo_geom_{part}" in names
        st = m["stats"][f]
        assert st["__geo_geom_xmin"][0] in (0.0, 100.0)


def test_geo_bbox_scan_prunes_files(spark, table):
    _seeded(spark, table)
    hit = table.scan(geo_bbox={"geom": (10, 0, 20, 1000)})
    assert len(hit.inputFiles()) == 1  # second file provably disjoint
    ks = sorted(r["k"] for r in hit.collect())
    assert ks == list(range(10, 21))
    assert hit.columns == ["k", "geom"]
    # window outside every file: planning-time empty
    nothing = table.scan(geo_bbox={"geom": (60, 0, 80, 1000)})
    assert nothing.inputFiles() == [] and nothing.count() == 0


def test_geo_bbox_with_column_predicates(spark, table):
    _seeded(spark, table)
    got = table.scan(
        where={"k": (None, 110)}, geo_bbox={"geom": (100, 0, 200, 1000)}
    )
    assert sorted(r["k"] for r in got.collect()) == list(range(100, 111))


def test_geo_scan_requires_declaration(spark, table):
    _seeded(spark, table)
    with pytest.raises(ValueError, match="not a declared geometry"):
        table.scan(geo_bbox={"k": (0, 0, 1, 1)})


def test_geo_reserved_prefix_rejected(spark, table):
    bad = spark.range(3).select(
        F.col("id").alias("k"), F.col("id").alias("__geo_x")
    )
    with pytest.raises(ValueError, match="reserved physical"):
        table.append(bad)


def test_geo_survives_cow_and_compaction(spark, table):
    _seeded(spark, table)
    table.delete_where(
        F.col("k") == 10, prune={"k": (0, 49)}
    )
    table.rewrite_small_files()
    hit = table.scan(geo_bbox={"geom": (0, 0, 20, 1000)})
    # compaction merged the two files; shreds re-materialized so the
    # scan is still stats-exact (one combined file now)
    ks = sorted(r["k"] for r in hit.collect())
    assert ks == [k for k in range(0, 21) if k != 10]
    m = table._read_manifest(table.current_version())
    assert all(
        "__geo_geom_xmin" in (m["stats"][f].get("__cols") or [])
        for f in m["files"]
    )


def test_geo_null_geometry_never_intersects(spark, table):
    pts = _points(spark, 0, 10).withColumn(
        "geom", F.when(F.col("k") < 5, F.col("geom"))
    )
    table.overwrite(pts.coalesce(1), geo_cols=["geom"])
    got = table.scan(geo_bbox={"geom": (0, 0, 100, 1000)})
    assert sorted(r["k"] for r in got.collect()) == [0, 1, 2, 3, 4]


def test_geo_fallback_residual_on_pre_declaration_files(spark, table):
    """Files written BEFORE the declaration lack shreds; the residual
    falls back to the exact Arrow-batched envelope recompute."""
    table.append(_points(spark, 0, 50).coalesce(1))
    table.set_property("geo.columns", "geom")
    table.append(_points(spark, 100, 150).coalesce(1))
    got = table.scan(geo_bbox={"geom": (10, 0, 20, 1000)})
    assert sorted(r["k"] for r in got.collect()) == list(range(10, 21))
    # pre-declaration file has no shred stats -> kept conservatively,
    # exact filter still excludes the second file's rows
    got2 = table.scan(geo_bbox={"geom": (120, 0, 130, 1000)})
    assert sorted(r["k"] for r in got2.collect()) == list(range(120, 131))
    # compaction heals shred coverage: after one rewrite the fast
    # JVM-side residual path applies again
    table.rewrite_small_files()
    m = table._read_manifest(table.current_version())
    assert all(
        "__geo_geom_xmin" in (m["stats"][f].get("__cols") or [])
        for f in m["files"]
    )


def test_geo_clone_carries_declaration(spark, table, tmp_path):
    _seeded(spark, table)
    dest = table.clone(str(tmp_path / "geo_clone"))
    assert dest._geo_columns() == ["geom"]
    dest.append(_points(spark, 200, 210).coalesce(1))
    got = dest.scan(geo_bbox={"geom": (200, 0, 205, 1000)})
    assert sorted(r["k"] for r in got.collect()) == list(range(200, 206))


def test_geo_bounds_metadata_table(spark, table):
    _seeded(spark, table)
    rows = {
        (r["xmin"], r["xmax"]): r["num_rows"]
        for r in table.geo_bounds("geom").collect()
    }
    assert rows == {(0.0, 49.0): 50, (100.0, 149.0): 50}


def test_geo_changelog_nets_zero_on_compaction(spark, table):
    _seeded(spark, table)
    v = table.current_version()
    table.rewrite_small_files()
    assert table.changelog(v).count() == 0
    table.append(_points(spark, 300, 303).coalesce(1))
    ch = table.changelog(v + 1)
    assert ch.count() == 3
    assert not [c for c in ch.columns if c.startswith("__geo_")]


def test_geo_dsv2_reader_excludes_shreds(spark, table):
    from apache_iceberg_exploration_spark.streaming.lakehouse_source import (
        make_lakehouse_batch_source,
    )

    _seeded(spark, table)
    spark.dataSource.register(make_lakehouse_batch_source())
    d = (
        spark.read.format("lakehouse")
        .option("path", table.path)
        .load()
    )
    assert sorted(d.columns) == ["geom", "k"]
    got = d.select("k", st_x("geom").alias("x")).filter(
        F.col("k") == 120
    ).collect()
    assert got[0]["x"] == 120.0


def test_geo_cluster_rewrite_improves_pruning(spark, table):
    """Spatially random ingestion (hash-by-key files) leaves every file
    spanning the whole box, so a small window opens everything;
    ``rewrite_data_files(geo_cluster_by=...)`` Hilbert-clusters on the
    envelope centers, after which the same window opens strictly fewer
    files — and the result set is unchanged."""
    pts = _points(spark, 0, 400)
    table.overwrite(pts.repartition(4, "k"), geo_cols=["geom"])
    # x == k in _points, so a window on x<=80 has a known answer
    window = (0, 0, 80, 1000)
    before = table.scan(geo_bbox={"geom": window})
    assert len(before.inputFiles()) == 4  # every file spans the box
    want = sorted(r["k"] for r in before.collect())
    assert want == list(range(0, 81))
    table.rewrite_data_files(geo_cluster_by="geom", target_file_count=4)
    after = table.scan(geo_bbox={"geom": window})
    assert len(after.inputFiles()) < 4, "clustering did not tighten files"
    assert sorted(r["k"] for r in after.collect()) == want


def test_geo_cluster_requires_declaration(spark, table):
    table.append(_points(spark, 0, 10).coalesce(1))
    with pytest.raises(ValueError, match="not a declared geometry"):
        table.rewrite_data_files(geo_cluster_by="geom")


def test_geo_stream_read_excludes_shreds(spark, table, tmp_path):
    """A streaming read of a geometry table emits the declared schema
    only — the physical __geo_* envelope shreds stay table metadata."""
    from apache_iceberg_exploration_spark.streaming._wait import (
        await_or_raise,
    )
    from apache_iceberg_exploration_spark.streaming.lakehouse_source import (
        make_lakehouse_stream_source,
    )

    _seeded(spark, table)
    spark.dataSource.register(make_lakehouse_stream_source())
    out = str(tmp_path / "out")
    q = (
        spark.readStream.format("lakehouse_stream")
        .option("path", table.path)
        .load()
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    await_or_raise(q, 120)
    q.stop()
    got = spark.read.parquet(out)
    assert sorted(got.columns) == ["geom", "k"]
    assert got.count() == 100
    xs = {r["x"] for r in got.select(st_x("geom").alias("x")).collect()}
    assert xs == {float(k) for k in list(range(50)) + list(range(100, 150))}


def test_geo_sink_written_files_carry_shreds(spark, table):
    """The DSv2 batch writer (shared write_task_files kernel with the
    streaming sink) materializes envelope shreds for declared geometry
    columns too — sink-appended files keep the fast JVM residual and
    pruning instead of degrading to the decode fallback."""
    from apache_iceberg_exploration_spark.streaming.lakehouse_source import (
        make_lakehouse_batch_source,
    )

    _seeded(spark, table)
    spark.dataSource.register(make_lakehouse_batch_source())
    (
        _points(spark, 200, 250)
        .coalesce(1)
        .write.format("lakehouse")
        .option("path", table.path)
        .mode("append")
        .save()
    )
    m = table._read_manifest(table.current_version())
    assert all(
        "__geo_geom_xmin" in (m["stats"][f].get("__cols") or [])
        for f in m["files"]
    ), "sink-written file lacks envelope shreds"
    hit = table.scan(geo_bbox={"geom": (200, 0, 220, 1000)})
    assert len(hit.inputFiles()) == 1
    assert sorted(r["k"] for r in hit.collect()) == list(range(200, 221))


def test_geo_survives_every_mutation_path(spark, table, tmp_path):
    """Envelope shreds and scan correctness through the whole mutation
    surface: CoW update, MERGE upsert, WAP publish, rollback, and
    branch fast-forward all re-materialize shreds (every write funnels
    through _write_data_files), so the fast-path gate stays closed and
    geo scans stay exact after arbitrary table history."""

    def live(expect):
        got = sorted(
            r["k"]
            for r in table.scan(
                geo_bbox={"geom": (0, 0, 10_000, 10_000)}
            ).collect()
        )
        assert got == sorted(expect), got
        m = table._read_manifest(table.current_version())
        assert all(
            "__geo_geom_xmin" in (m["stats"][f].get("__cols") or [])
            for f in m["files"]
        ), "a mutation path dropped the envelope shreds"

    _seeded(spark, table)  # x in [0,50) and [100,150)
    base = list(range(50)) + list(range(100, 150))
    live(base)
    # CoW update: move k=3 to x=9000 (geometry rewritten)
    table.update_where(
        F.col("k") == 3,
        {"geom": st_point(F.lit(9000.0), F.lit(9000.0))},
        prune={"k": (0, 49)},
    )
    live(base)
    hit = table.scan(geo_bbox={"geom": (8000, 8000, 9500, 9500)})
    assert [r["k"] for r in hit.collect()] == [3]
    # MERGE upsert: new rows 300..304 + relocate k=101
    src = _points(spark, 300, 305).unionByName(
        spark.range(101, 102).select(
            F.col("id").alias("k"),
            st_point(F.lit(7000.0), F.lit(7000.0)).alias("geom"),
        )
    )
    table.merge_into(src, on=["k"])
    live(base + list(range(300, 305)))
    # WAP: staged append publishes atomically
    sid = table.stage_append(_points(spark, 400, 403).coalesce(1))
    table.publish(sid)
    live(base + list(range(300, 305)) + [400, 401, 402])
    # rollback to the pre-WAP version restores the pre-WAP geometry
    table.rollback(table.current_version() - 1)
    live(base + list(range(300, 305)))
    # branch + append + fast-forward
    table.create_branch("exp")
    table.append_branch("exp", _points(spark, 500, 502).coalesce(1))
    table.fast_forward("exp")
    live(base + list(range(300, 305)) + [500, 501])


def test_geo_dsv2_geobbox_option(spark, table):
    """The DSv2 batch surface honors the geometry window: planning
    prunes on the __geo_* shred stats, the executor applies the
    envelope residual (shred fast path for engine files, exact WKB
    decode for shred-less ones), and the emitted schema stays
    declared-only."""
    from apache_iceberg_exploration_spark.streaming.lakehouse_source import (
        make_lakehouse_batch_source,
    )

    _seeded(spark, table)  # x in [0,50) and [100,150), two files
    spark.dataSource.register(make_lakehouse_batch_source())
    d = (
        spark.read.format("lakehouse")
        .option("path", table.path)
        .option("geoBBox", "geom:10,0,20,1000")
        .load()
    )
    assert sorted(d.columns) == ["geom", "k"]
    got = sorted(r["k"] for r in d.collect())
    assert got == list(range(10, 21))
    # planning-time pruning is introspectable on the reader itself
    from apache_iceberg_exploration_spark.streaming.lakehouse_source import (  # noqa: E501
        _parse_geo_bbox,
    )

    assert _parse_geo_bbox("geom:10,0,20,1000") == {
        "geom": (10.0, 0.0, 20.0, 1000.0)
    }
    # window over the second file only
    d2 = (
        spark.read.format("lakehouse")
        .option("path", table.path)
        .option("geoBBox", "geom:120,0,130,1000")
        .load()
    )
    assert sorted(r["k"] for r in d2.collect()) == list(range(120, 131))
    # composes with versionAsOf (only the first file exists at v1)
    d3 = (
        spark.read.format("lakehouse")
        .option("path", table.path)
        .option("versionAsOf", "1")
        .option("geoBBox", "geom:0,0,1000,1000")
        .load()
    )
    assert d3.count() == 50
    with pytest.raises(Exception, match="geoBBox"):
        (
            spark.read.format("lakehouse")
            .option("path", table.path)
            .option("geoBBox", "geom:1,2,3")
            .load()
            .collect()
        )


def test_geo_stream_geobbox_ingestion_filter(spark, table, tmp_path):
    """The append stream honors a geometry window at the source; the
    CDC combination is refused loudly (a windowed change feed would
    drop delete events for relocated rows)."""
    from apache_iceberg_exploration_spark.streaming._wait import (
        await_or_raise,
    )
    from apache_iceberg_exploration_spark.streaming.lakehouse_source import (
        make_lakehouse_stream_source,
    )

    _seeded(spark, table)  # x in [0,50) and [100,150)
    spark.dataSource.register(make_lakehouse_stream_source())
    out = str(tmp_path / "out")
    q = (
        spark.readStream.format("lakehouse_stream")
        .option("path", table.path)
        .option("geoBBox", "geom:100,0,130,1000")
        .load()
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    await_or_raise(q, 120)
    q.stop()
    got = spark.read.parquet(out)
    assert sorted(r["k"] for r in got.collect()) == list(range(100, 131))
    # the refusal surfaces from the source worker asynchronously
    q2 = (
        spark.readStream.format("lakehouse_stream")
        .option("path", table.path)
        .option("geoBBox", "geom:0,0,1,1")
        .option("readChangeFeed", "true")
        .load()
        .writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "cp2"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="geoBBox cannot combine"):
        await_or_raise(q2, 120)
    q2.stop()


def test_geo_dist_stream_geobbox_matches_simple_reader(
    spark, table, tmp_path
):
    """r9 (VERDICT r8 #3): the DISTRIBUTED streaming reader honors
    geoBBox — commit-level __geo_* shred-stat pruning at partition
    planning plus the shared Arrow residual — and its output matches
    the single-partition reader's on the same window."""
    from apache_iceberg_exploration_spark.streaming._wait import (
        await_or_raise,
    )
    from apache_iceberg_exploration_spark.streaming.lakehouse_source import (
        make_lakehouse_stream_dist_source,
        make_lakehouse_stream_source,
    )

    _seeded(spark, table)  # x in [0,50) and [100,150)
    spark.dataSource.register(make_lakehouse_stream_source())
    spark.dataSource.register(make_lakehouse_stream_dist_source())
    outs = {}
    for fmt in ("lakehouse_stream", "lakehouse_stream_dist"):
        out = str(tmp_path / f"out_{fmt}")
        q = (
            spark.readStream.format(fmt)
            .option("path", table.path)
            .option("geoBBox", "geom:100,0,130,1000")
            .load()
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / f"cp_{fmt}"))
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q, 120)
        q.stop()
        outs[fmt] = sorted(
            r["k"] for r in spark.read.parquet(out).collect()
        )
    assert outs["lakehouse_stream"] == outs["lakehouse_stream_dist"]
    assert outs["lakehouse_stream_dist"] == list(range(100, 131))
    # CDC + geoBBox still refused on the dist reader
    q2 = (
        spark.readStream.format("lakehouse_stream_dist")
        .option("path", table.path)
        .option("geoBBox", "geom:0,0,1,1")
        .option("readChangeFeed", "true")
        .load()
        .writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "cp2"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="geoBBox cannot combine"):
        await_or_raise(q2, 120)
    q2.stop()


def test_geo_dist_stream_planning_skips_whole_commits(spark, table):
    """Partition-planning assertion (unit level, no query needed): a
    commit whose files' envelope shreds provably miss the window plans
    ZERO partitions; a straddling commit plans only its overlapping
    files."""
    from apache_iceberg_exploration_spark.streaming.lakehouse_source import (
        make_lakehouse_stream_dist_source,
    )

    _seeded(spark, table)  # v1: x in [0,50); v2: x in [100,150)
    make_lakehouse_stream_dist_source()  # ensure class builds
    import apache_iceberg_exploration_spark.streaming.lakehouse_source as L

    src = L.make_lakehouse_stream_dist_source()

    class _Opts(dict):
        pass

    ds = src.__new__(src)
    ds.options = {"path": table.path, "geoBBox": "geom:120,0,130,1000"}
    reader = ds.streamReader(None)
    parts = reader.partitions(
        {"version": 0}, {"version": table.current_version()}
    )
    # only the second commit's file overlaps x in [120,130]
    assert len(parts) == 1
    assert reader.planned_files == [
        f
        for f in table._read_manifest(table.current_version())["files"]
        if f in set(reader.planned_files)
    ]
    # window outside every file: zero partitions planned
    ds2 = src.__new__(src)
    ds2.options = {"path": table.path, "geoBBox": "geom:900,0,950,1000"}
    r2 = ds2.streamReader(None)
    assert (
        r2.partitions(
            {"version": 0}, {"version": table.current_version()}
        )
        == []
    )

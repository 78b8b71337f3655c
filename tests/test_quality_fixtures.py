"""Positive-path fixtures for quality audits that are tail-empty or
near-empty on the well-behaved synthetic corpus.

The r4 verdict flagged `embedding_norm_qa_outliers` as vacuously green:
at sf0.01 both engines returned 0 rows, so the hash match proved only
that nobody was flagged.  These tests plant corrupted vectors in a
temp embeddings table and assert exactly they (and, post-recalibration,
the expected noise tail) surface.
"""

from __future__ import annotations

import math
import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from apache_iceberg_exploration_spark.operators.similarity import (
    embedding_norm_qa_outliers,
)

from .conftest import SF_ORACLE

DIM = 16


def _unit_vec(rng: random.Random) -> list[float]:
    v = [rng.gauss(0.0, 1.0) for _ in range(DIM)]
    n = math.sqrt(sum(x * x for x in v))
    return [float(x / n) for x in v]


def _write_embeddings(tmp_path, rows):
    tbl = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array(
                [r[1] for r in rows], pa.list_(pa.float32())
            ),
            "label": pa.array([r[2] for r in rows], pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def test_planted_corruption_surfaces_exactly(spark, tmp_path):
    """Inflated-norm and zeroed-tail vectors surface; clean ones don't.

    The clean population is 60 unit vectors (norm noise ~1e-7); the
    planted norm outlier at 5.0 drags sd to ~0.5, so the 2σ band flags
    ONLY the plant — the clean vectors sit ~0.07σ from the mean.
    """
    rng = random.Random(42)
    rows = [(i, _unit_vec(rng), i % 3) for i in range(60)]
    # plant 1: inflated norm (failed encoder normalization)
    rows.append((100, [5.0 / math.sqrt(DIM)] * DIM, 0))
    # plant 2: zeroed tail, still unit norm (truncated write + pad):
    # 8/16 = 50% zero components >= the 25% threshold
    half = _unit_vec(rng)[: DIM // 2]
    n = math.sqrt(sum(x * x for x in half))
    rows.append((101, [x / n for x in half] + [0.0] * (DIM // 2), 1))
    sf_dir = _write_embeddings(tmp_path, rows)

    out = {
        r["vec_id"]: r
        for r in embedding_norm_qa_outliers(spark, sf_dir).collect()
    }
    assert set(out) == {100, 101}
    assert out[100]["is_norm_outlier"] == 1
    assert out[100]["norm_bp"] == 50000
    assert out[101]["is_norm_outlier"] == 0
    assert out[101]["n_zero_components"] == DIM // 2
    assert out[101]["norm_bp"] == 10000


def test_zero_vector_is_flagged_on_both_paths(spark, tmp_path):
    """An all-zero vector (dead encoder batch) trips the zero-component
    path regardless of where the norm statistics land."""
    rng = random.Random(7)
    rows = [(i, _unit_vec(rng), 0) for i in range(30)]
    rows.append((99, [0.0] * DIM, 0))
    sf_dir = _write_embeddings(tmp_path, rows)
    out = {
        r["vec_id"]: r
        for r in embedding_norm_qa_outliers(spark, sf_dir).collect()
    }
    assert 99 in out
    assert out[99]["n_zero_components"] == DIM
    assert out[99]["norm_bp"] == 0


def test_driver_scale_run_is_nonempty(spark):
    """The recalibrated 2σ band must flag a nonempty tail on the real
    sf0.01 corpus — the property whose absence made the r4 green
    vacuous.  (Value-level parity vs DuckDB is test_oracle_parity.)"""
    n = embedding_norm_qa_outliers(spark, SF_ORACLE).count()
    assert n > 0


# ---------------------------------------------------------------- DBSCAN


def _dbscan_on(spark, coords, eps=10, min_pts=3):
    from pyspark.sql import functions as F

    from apache_iceberg_exploration_spark.operators.geospatial import (
        dbscan_label_points,
    )

    pts = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(coords)],
        "pid long, x long, y long",
    ).selectExpr("pid", "x", "y", f"x div {eps} AS cx", f"y div {eps} AS cy")
    rows = dbscan_label_points(pts, eps, min_pts).collect()
    return {r.pid: (r.n_in_eps, r.cls) for r in rows}


def test_dbscan_labels_planted_blob_border_and_noise(spark):
    """A 4-point blob (all mutually within ε) → cores; a point within ε
    of one core but with a thin ε-ball of its own → border; a far-away
    singleton → noise. Cell-boundary adjacency (blob straddles grid
    cells) is exercised by placing points across a cell edge."""
    coords = [
        (9, 9),  # blob, last cell-0 corner
        (11, 9),  # blob, next cell over (crosses cx boundary at 10)
        (9, 11),  # blob, crosses cy boundary
        (11, 11),  # blob
        (19, 17),  # border: d²=100 to (11,11) only; own ball = 2 < 3
        (70, 70),  # noise
    ]
    got = _dbscan_on(spark, coords)
    assert {p: c for p, (_, c) in got.items()} == {
        0: "core", 1: "core", 2: "core", 3: "core",
        4: "border", 5: "noise",
    }
    # ε-ball census (self included): the blob corner (11,11) also sees
    # the border point exactly on the ε boundary (d² == ε²)
    assert {p: n for p, (n, _) in got.items()} == {
        0: 4, 1: 4, 2: 4, 3: 5, 4: 2, 5: 1,
    }


def test_dbscan_clusters_two_blobs_get_distinct_components(spark):
    """Two ε-separated blobs become two components labeled by their
    smallest point id; the bridge point near only one blob is border
    and adopts that blob's label."""
    from pyspark.sql import functions as F

    from apache_iceberg_exploration_spark.operators.dedup import (
        connected_components_star,
    )
    from apache_iceberg_exploration_spark.operators.geospatial import (
        eps_neighbor_pairs,
    )

    eps, min_pts = 10, 3
    coords = [
        (0, 0), (5, 0), (0, 5),        # blob A: pids 0,1,2
        (100, 100), (105, 100), (100, 105),  # blob B: pids 3,4,5
    ]
    pts = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(coords)],
        "pid long, x long, y long",
    ).selectExpr("pid", "x", "y", f"x div {eps} AS cx", f"y div {eps} AS cy")
    pairs = eps_neighbor_pairs(pts, eps)
    counts = pairs.groupBy("pa").count()
    cores = counts.filter(F.col("count") >= min_pts).select(
        F.col("pa").alias("n")
    )
    cedges = (
        pairs.filter(F.col("pa") != F.col("pb"))
        .join(cores.withColumnRenamed("n", "pa"), "pa")
        .join(cores.withColumnRenamed("n", "pb"), "pb")
        .select(F.col("pa").alias("a"), F.col("pb").alias("b"))
    )
    comp = {
        r.n: r.lbl
        for r in connected_components_star(cores, cedges).collect()
    }
    assert comp == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3}


def test_longest_shared_span_planted_fixture(spark, tmp_path):
    """Span-dedup semantics on a PLANTED fixture (the norm-QA doctrine:
    never trust a green that nothing exercises): two docs share exactly
    one verbatim 20-token run, a third is disjoint — the pair surfaces
    with longest_shared_tokens == 20, and no other pair appears."""
    from apache_iceberg_exploration_spark.operators.corpus import (
        K_SPAN,
        MIN_PAIR_SPAN,
        _anchor_positions,
        dedup_longest_shared_span_pairs,
    )

    shared = " ".join(f"s{i}" for i in range(20))  # 20-token run
    docs = spark.createDataFrame(
        [
            (0, "alpha beta " + shared + " gamma delta epsilon"),
            (1, "zeta eta theta iota " + shared + " kappa"),
            (2, " ".join(f"u{i}" for i in range(40))),  # disjoint
        ],
        "doc_id long, text string",
    )
    out_dir = str(tmp_path / "docs")
    docs.write.parquet(out_dir + "/documents.parquet")
    got = dedup_longest_shared_span_pairs(spark, out_dir).collect()
    assert MIN_PAIR_SPAN <= 20 and K_SPAN <= 20  # fixture sanity
    assert [(r.doc_a, r.doc_b, r.longest_shared_tokens) for r in got] == [
        (0, 1, 20)
    ]

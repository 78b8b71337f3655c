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

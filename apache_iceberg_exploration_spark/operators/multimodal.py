"""Multimodal-column plumbing: opaque ``binary`` payloads with typed
metadata, decoded/feature-extracted via Arrow-batched Pandas UDFs.

The container has no image/audio libraries, so the DECODE step is a
deterministic fake (clearly marked; ``decode_image_real`` raises
NotImplementedError) — but everything Spark-side is real and tested:
binary column construction, metadata struct schema, ``mapInPandas``
batch iteration, Arrow transfer of binary columns, and the
explode-based frame sampling. Swapping ``_fake_decode_dims`` for a
PIL/ffmpeg call changes no plan shape.

Synthetic media: each document's utf-8 bytes stand in for an encoded
image/video blob (deterministic, so the DuckDB oracle can verify the
whole pipeline arithmetic via octet_length).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.io import load_table

_DECODE_SCHEMA = (
    "doc_id long, mime string, n_bytes long, width int, height int, "
    "n_frames int"
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, media binary, meta struct<mime,n_bytes>).
    The binary column is the utf-8 encoding of the text (deterministic
    stand-in for real image/video bytes)."""
    docs = load_table(spark, sf_dir, "documents")
    media = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        media.alias("media"),
        F.struct(
            F.when(F.col("doc_id") % 2 == 0, F.lit("image/png"))
            .otherwise(F.lit("video/mp4"))
            .alias("mime"),
            F.octet_length(media).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image_real(payload: bytes) -> tuple[int, int]:
    """Real decode hook — requires an image library not present in this
    container. STUB: intentionally unimplemented."""
    raise NotImplementedError(
        "image decode requires PIL/libvips; not available in this "
        "environment — _fake_decode_dims is the deterministic test double"
    )


def _fake_decode_dims(n_bytes: pd.Series) -> pd.DataFrame:
    """Deterministic fake decode: dimensions derived from payload length.
    Mirrors what a real decoder returns (per-row width/height/frames)."""
    return pd.DataFrame(
        {
            "width": (n_bytes % 64 + 1).astype("int32"),
            "height": ((n_bytes // 64) % 64 + 1).astype("int32"),
            "n_frames": (n_bytes % 10 + 1).astype("int32"),
        }
    )


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: Arrow batch in → decoded features out. The
    binary column arrives as bytes objects per row; a real decoder would
    loop payloads here (vectorized libs: pass the whole batch)."""
    for pdf in batches:
        n_bytes = pdf["media"].map(len).astype("int64")
        dims = _fake_decode_dims(n_bytes)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "mime": pdf["mime"],
                "n_bytes": n_bytes,
                "width": dims["width"],
                "height": dims["height"],
                "n_frames": dims["n_frames"],
            }
        )


@query(
    "multimodal_decode_features",
    oracle="""
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'video/mp4' END AS mime,
               octet_length(encode(text)) AS n_bytes,
               CAST(octet_length(encode(text)) % 64 + 1 AS INTEGER)        AS width,
               CAST((octet_length(encode(text)) // 64) % 64 + 1 AS INTEGER) AS height,
               CAST(octet_length(encode(text)) % 10 + 1 AS INTEGER)        AS n_frames
        FROM documents
    """,
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column decode via mapInPandas: build the media table
    (binary + metadata struct), ship Arrow batches of raw bytes to a
    Pandas kernel, emit typed features.

    Scale: mapInPandas streams partition-local Arrow batches — no
    driver involvement, no shuffle; batch size bounds Python memory
    (spark.sql.execution.arrow.maxRecordsPerBatch). Decode is the fake
    stand-in (see module docstring); the plumbing — schema, batch shape,
    binary Arrow transfer — is exactly what a real decoder needs.
    """
    m = media_table(spark, sf_dir)
    flat = m.select("doc_id", "media", F.col("meta.mime").alias("mime"))
    # spread across Python workers: the source is a single parquet file
    # (one partition), and decode cost is per-row Python/Arrow work — 8
    # workers halve wall time here; on a cluster size to cores-per-stage
    spread = flat.repartition(
        min(8, spark.sparkContext.defaultParallelism), "doc_id"
    )
    return spread.mapInPandas(_decode_batches, schema=_DECODE_SCHEMA)


@query(
    "multimodal_frame_sample",
    oracle="""
        SELECT doc_id, frame_idx
        FROM (
            SELECT doc_id,
                   octet_length(encode(text)) % 10 + 1 AS n_frames
            FROM documents
            WHERE doc_id % 2 = 1
        ), UNNEST(range(0, n_frames, 2)) AS t(frame_idx)
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling for 'video' rows: every 2nd frame index, exploded
    to one row per sampled frame — the fan-out that feeds per-frame
    feature extraction. Explode keeps it distributed (contrast with the
    reference's driver-side dynamic task mapping, exampledag orig 30)."""
    m = media_table(spark, sf_dir).filter(F.col("meta.mime") == "video/mp4")
    n_frames = (F.col("meta.n_bytes") % 10 + 1).cast("int")
    return m.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(2))).alias(
            "frame_idx"
        ),
    ).select("doc_id", F.col("frame_idx").cast("long").alias("frame_idx"))

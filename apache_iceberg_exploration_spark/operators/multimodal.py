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


@query(
    "multimodal_training_records",
    oracle="""
        SELECT d.source,
               e.label,
               count(*) AS n_records,
               CAST(sum(octet_length(encode(d.text))) AS BIGINT) AS sum_bytes,
               CAST(min(d.doc_id) AS BIGINT) AS first_doc
        FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        GROUP BY d.source, e.label
    """,
)
def multimodal_training_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assemble aligned multimodal training records: media payload
    (binary + metadata) keyed to its embedding row, grouped into the
    per-(source, label) shard accounting a dataset builder needs — record
    counts and payload bytes drive shard sizing and mixture weights.

    Scale: one equi-join on the id key (both sides hash-partition on it;
    the embedding side is the smaller and broadcasts under the session
    threshold at dimension-table sizes), then a keyed aggregate. Payload
    bytes ride the join only as a length column — the binary itself is
    NOT shuffled for accounting, the standard trick when records are MBs.
    """
    media = media_table(spark, sf_dir).select(
        "doc_id", F.col("meta.n_bytes").alias("n_bytes")
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "label"
    )
    return (
        media.join(docs, "doc_id")
        .join(emb, "doc_id")
        .groupBy("source", "label")
        .agg(
            F.count("*").alias("n_records"),
            F.sum("n_bytes").alias("sum_bytes"),
            F.min("doc_id").alias("first_doc"),
        )
    )


_THUMB_BYTES = 16
_THUMB_SCHEMA = "doc_id long, thumb_md5 string, thumb_len int"


def _thumbnail_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel producing BINARY output: the 'thumbnail' is the
    payload's first bytes (deterministic stand-in for a real downscale —
    swapping in PIL changes no plan shape). Exercises binary→binary Arrow
    transfer, the round-trip a real media pipeline lives on."""
    import hashlib

    for pdf in batches:
        thumbs = pdf["media"].map(lambda b: bytes(b)[:_THUMB_BYTES])
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "thumb_md5": thumbs.map(
                    lambda b: hashlib.md5(b).hexdigest()
                ),
                "thumb_len": thumbs.map(len).astype("int32"),
            }
        )


@query(
    "multimodal_thumbnail_digest",
    oracle=f"""
        -- DuckDB cannot substring a BLOB; the synthetic corpus is pure
        -- ASCII, so the VARCHAR prefix is byte-identical to the first
        -- {_THUMB_BYTES} bytes of the utf-8 payload the Spark kernel sees
        SELECT doc_id,
               md5(substring(text, 1, {_THUMB_BYTES})) AS thumb_md5,
               CAST(least(octet_length(encode(text)), {_THUMB_BYTES})
                    AS INTEGER) AS thumb_len
        FROM documents
        WHERE doc_id % 2 = 0
    """,
)
def multimodal_thumbnail_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thumbnail generation plumbing for 'image' rows: binary payloads in,
    derived binary out (digested to md5 so the oracle verifies content,
    not bytes-canonicalization) via the same Arrow-batched kernel a real
    resampler would use.

    Scale: partition-local mapInPandas; output thumbnails are strictly
    smaller than inputs, so the stage SHRINKS data — run it before any
    shuffle that would otherwise carry full payloads.
    """
    m = media_table(spark, sf_dir).filter(
        F.col("meta.mime") == "image/png"
    )
    spread = m.select("doc_id", "media").repartition(
        min(8, spark.sparkContext.defaultParallelism), "doc_id"
    )
    return spread.mapInPandas(_thumbnail_batches, schema=_THUMB_SCHEMA)


_AUDIO_SR = 16_000  # fake decode: 4 samples per payload byte, 16 kHz
_AUDIO_CHUNK_SCHEMA = "doc_id long, chunk_idx int, chunk_samples int"


def _audio_chunk_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel with ROW EXPANSION: each payload decodes (fake:
    4 samples/byte) and splits into 1-second windows — one output row
    per chunk, so batches grow on the way out (the generator contract
    makes that free; no collect, no explode column needed)."""
    for pdf in batches:
        doc_ids, idxs, sizes = [], [], []
        for doc_id, media in zip(pdf["doc_id"], pdf["media"]):
            n_samples = len(media) * 4
            full, rem = divmod(n_samples, _AUDIO_SR)
            for i in range(full):
                doc_ids.append(doc_id); idxs.append(i); sizes.append(_AUDIO_SR)
            if rem:
                doc_ids.append(doc_id); idxs.append(full); sizes.append(rem)
        yield pd.DataFrame(
            {"doc_id": doc_ids, "chunk_idx": idxs, "chunk_samples": sizes}
        )


@query(
    "multimodal_audio_chunks",
    oracle=f"""
        WITH audio AS (
            SELECT doc_id,
                   octet_length(encode(text)) * 4 AS n_samples
            FROM documents
        )
        SELECT doc_id,
               CAST(i AS INTEGER) AS chunk_idx,
               CAST(CASE WHEN (i + 1) * {_AUDIO_SR} <= n_samples
                         THEN {_AUDIO_SR}
                         ELSE n_samples - i * {_AUDIO_SR} END AS INTEGER)
                   AS chunk_samples
        FROM audio,
             UNNEST(range(CAST(ceil(n_samples / {_AUDIO_SR}.0) AS BIGINT)))
                 AS t(i)
    """,
)
def multimodal_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio ingestion plumbing: binary payloads fake-decode to PCM
    sample counts (4 samples/byte @16 kHz — the stub stands where
    soundfile/ffmpeg would run) and split into 1-second training
    windows INSIDE the Arrow kernel — a mapInPandas with row expansion,
    the shape audio/video chunking needs (one input row → many output
    rows, no driver, no shuffle).

    Scale: expansion happens streaming per Arrow batch; output row
    count ∝ total audio duration, partition-local until a later keyed
    op. The oracle verifies the full chunk arithmetic from payload
    lengths."""
    m = media_table(spark, sf_dir)
    spread = m.select("doc_id", "media").repartition(
        min(8, spark.sparkContext.defaultParallelism), "doc_id"
    )
    return spread.mapInPandas(
        _audio_chunk_batches, schema=_AUDIO_CHUNK_SCHEMA
    )


PHASH_CELLS = 65  # 64 dHash bits from 65 sampled bytes
PHASH_HAMMING_MAX = 20  # near-dup bar. Real-image dHash pipelines use
# ~10-12; this corpus's stand-in blobs (utf-8 text) have a minimum
# candidate distance of 17 at the sf0.01 oracle scale, so 12 made the
# driver-checked result an EMPTY set — a vacuous green (the r4
# embedding-QA lesson; the vacuous-green sweep in
# tests/test_quality_fixtures.py now pins the whole registry). 20
# keeps a nonempty, fully value-checked pair set while the planted
# near-identical-blob fixture covers the tight-threshold branch.


@query(
    "multimodal_phash_neardup_pairs",
    oracle=f"""
        WITH pos AS (
            SELECT doc_id, k,
                   ord(substring(text,
                                 (length(text) * k) // {PHASH_CELLS} + 1,
                                 1)) AS v
            FROM documents, UNNEST(range({PHASH_CELLS})) t(k)
        ),
        bits AS (
            SELECT a.doc_id, a.k AS bit,
                   CASE WHEN a.v > b.v THEN 1 ELSE 0 END AS bit_on
            FROM pos a JOIN pos b
              ON a.doc_id = b.doc_id AND b.k = a.k + 1
            WHERE a.k < 64
        ),
        bands AS (
            SELECT doc_id, CAST(bit // 16 AS INTEGER) AS band,
                   CAST(sum(bit_on * (1 << (bit % 16))) AS BIGINT) AS bval
            FROM bits GROUP BY 1, 2
        ),
        wide AS (
            SELECT doc_id,
                   max(CASE WHEN band = 0 THEN bval END) AS b0,
                   max(CASE WHEN band = 1 THEN bval END) AS b1,
                   max(CASE WHEN band = 2 THEN bval END) AS b2,
                   max(CASE WHEN band = 3 THEN bval END) AS b3
            FROM bands GROUP BY 1
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.bval = b.bval
             AND a.doc_id < b.doc_id
        )
        SELECT c.doc_a, c.doc_b,
               CAST(bit_count(xor(wa.b0, wb.b0)) + bit_count(xor(wa.b1, wb.b1))
                  + bit_count(xor(wa.b2, wb.b2)) + bit_count(xor(wa.b3, wb.b3))
                    AS INTEGER) AS hamming
        FROM cand c
        JOIN wide wa ON c.doc_a = wa.doc_id
        JOIN wide wb ON c.doc_b = wb.doc_id
        WHERE bit_count(xor(wa.b0, wb.b0)) + bit_count(xor(wa.b1, wb.b1))
            + bit_count(xor(wa.b2, wb.b2)) + bit_count(xor(wa.b3, wb.b3))
              <= {PHASH_HAMMING_MAX}
    """,
)
def multimodal_phash_neardup_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Perceptual-hash near-duplicate detection over the BINARY media
    column: an Arrow-batched kernel samples {PHASH_CELLS} bytes per blob
    (the stand-in for an 8×8 luma downsample of a real decode), derives
    the 64-bit dHash (each bit = cell brighter than its neighbor) as
    four 16-bit bands, and docs sharing ANY band collide into candidate
    pairs verified by full Hamming distance ≤ {PHASH_HAMMING_MAX} — the
    image-dedup shape (pHash/dHash + multi-index blocking) used by
    every large media corpus, structured exactly like the MinHash band
    pipeline so the same scale argument applies (no all-pairs; bounded
    band buckets; integer-exact bands let the DuckDB oracle verify the
    FULL pipeline, kernel arithmetic included).

    Scale: the kernel is partition-local mapInPandas (binary in, 4
    ints out — bytes never shuffle); the band join and Hamming verify
    move only doc_id + 32 bytes per doc. A real decoder swaps the byte
    sampler for PIL/ffmpeg + resize; plan shape unchanged.
    """
    media = media_table(spark, sf_dir)

    def phash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                v = np.frombuffer(blob, dtype=np.uint8)
                n = len(v)
                idx = (n * np.arange(PHASH_CELLS)) // PHASH_CELLS
                grid = v[idx].astype(np.int64)
                bits = (grid[:-1] > grid[1:]).astype(np.int64)
                bands = [
                    int((bits[b * 16 : (b + 1) * 16] << np.arange(16)).sum())
                    for b in range(4)
                ]
                out.append((doc_id, *bands))
            yield pd.DataFrame(
                out, columns=["doc_id", "b0", "b1", "b2", "b3"]
            )

    wide = media.select("doc_id", "media").mapInPandas(
        phash_batches, schema="doc_id long, b0 long, b1 long, b2 long, b3 long"
    )
    from ..functions.caching import scoped_persist

    wide = scoped_persist(wide)
    bands = wide.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"), F.col(f"b{b}").alias("bval")
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bval").alias("bval"))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bval") == F.col("b.bval"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    wa = wide.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"b{i}").alias(f"a{i}") for i in range(4)],
    )
    wb = wide.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"b{i}").alias(f"c{i}") for i in range(4)],
    )
    hamming = sum(
        F.bit_count(F.col(f"a{i}").bitwiseXOR(F.col(f"c{i}")))
        for i in range(4)
    )
    return (
        cand.join(wa, "doc_a")
        .join(wb, "doc_b")
        .withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= PHASH_HAMMING_MAX)
        .select("doc_a", "doc_b", "hamming")
    )

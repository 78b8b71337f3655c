"""Similarity search over the ``embeddings`` table (``array<float>``).

Two tiers, per the standard ANN playbook:
- brute-force cosine top-k — the exact baseline, linear scan;
- IVF-style probed search — coarse centroids (here: per-``label`` means,
  i.e. the quantization cells the data already carries), probe the top-P
  nearest cells, exact-rank only inside them.

Everything is JVM-side higher-order-function arithmetic in double
precision (functions.vectors), so the DuckDB oracle matches bit-exactly.

The reference has no vector operations at all; this is the BASELINE.json
north-star ('similarity search over embeddings') built Spark-first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity, cosine_similarity_sql
from ..registry import query
from ..sources.io import load_table

TOP_K = 10
N_PROBE = 2
QUERY_VEC_ID = 0  # the fixed query vector for the oracle-checked queries
# fixed max-abs scale for INT8 scalar quantization (~ the corpus max-abs);
# shared by embedding_quantize_int8 and ann_sq_rerank_topk so the two
# INT8 surfaces can never drift apart
SQ_SCALE = 0.5


def _query_vector(emb: DataFrame) -> DataFrame:
    return emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("q_emb")
    )


@query(
    "ann_cosine_topk_bruteforce",
    oracle=f"""
        WITH q AS (SELECT embedding AS q_emb FROM embeddings
                   WHERE vec_id = {QUERY_VEC_ID})
        SELECT e.vec_id, e.label,
               round({cosine_similarity_sql('e.embedding', 'q.q_emb')}, 4) AS cos_sim
        FROM embeddings e, q
        WHERE e.vec_id <> {QUERY_VEC_ID}
        ORDER BY {cosine_similarity_sql('e.embedding', 'q.q_emb')} DESC, e.vec_id
        LIMIT {TOP_K}
    """,
)
def ann_cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k for one query vector: broadcast the query,
    linear-scan the corpus, TakeOrderedAndProject keeps k per partition.

    Scale: O(n·d) with no shuffle beyond the final top-k merge (k rows per
    partition to the driver). This is the correctness baseline the IVF
    path is measured against; for batched query sets, broadcast the query
    block and loop JVM-side (see `ann_ivf_probe_topk` for the sublinear
    variant).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    q = _query_vector(emb)
    cos = cosine_similarity(F.col("embedding"), F.col("q_emb"))
    return (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select("vec_id", "label", cos.alias("cos_raw"))
        .orderBy(F.col("cos_raw").desc(), F.col("vec_id"))
        .limit(TOP_K)
        .select("vec_id", "label", F.round("cos_raw", 4).alias("cos_sim"))
    )


_CENTROIDS_SQL = """
        centroids AS (
            SELECT label,
                   list(dim_avg ORDER BY i) AS centroid
            FROM (
                SELECT label, i,
                       avg(CAST(embedding[i + 1] AS DOUBLE)) AS dim_avg
                FROM embeddings,
                     UNNEST(range(len(embedding))) AS t(i)
                GROUP BY label, i
            )
            GROUP BY label
        )
"""


@query(
    "ann_ivf_probe_topk",
    oracle=f"""
        WITH q AS (SELECT embedding AS q_emb FROM embeddings
                   WHERE vec_id = {QUERY_VEC_ID}),
        {_CENTROIDS_SQL},
        probed AS (
            SELECT c.label
            FROM centroids c, q
            ORDER BY {cosine_similarity_sql('c.centroid', 'q.q_emb')} DESC, c.label
            LIMIT {N_PROBE}
        )
        SELECT e.vec_id, e.label,
               round({cosine_similarity_sql('e.embedding', 'q.q_emb')}, 4) AS cos_sim
        FROM embeddings e, q
        WHERE e.label IN (SELECT label FROM probed)
          AND e.vec_id <> {QUERY_VEC_ID}
        ORDER BY {cosine_similarity_sql('e.embedding', 'q.q_emb')} DESC, e.vec_id
        LIMIT {TOP_K}
    """,
)
def ann_ivf_probe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) approximate top-k: compute per-cell centroids
    (elementwise mean via posexplode + two keyed aggs), rank cells by
    query-to-centroid cosine, probe the best N_PROBE cells, exact-rank
    only within them.

    Scale: this is the 100 TB path — the scan touches n·(P/k) vectors
    instead of n. Centroid construction is a (label, dim) aggregate:
    shuffle rows = k·d, negligible. At a billion vectors the same plan
    holds with k-means cell ids in place of `label` (assignment itself =
    one broadcast-centroids crossJoin + argmin, iterated — same operators).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    q = _query_vector(emb)

    centroids = (
        emb.select("label", F.posexplode(F.col("embedding").cast("array<double>")))
        .groupBy("label", "pos")
        .agg(F.avg("col").alias("dim_avg"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "dim_avg"))),
                lambda s: s["dim_avg"],
            ).alias("centroid")
        )
    )
    probe_cos = cosine_similarity(F.col("centroid"), F.col("q_emb"))
    probed = (
        centroids.crossJoin(F.broadcast(q))
        .orderBy(probe_cos.desc(), F.col("label"))
        .limit(N_PROBE)
        .select("label")
    )
    cos = cosine_similarity(F.col("embedding"), F.col("q_emb"))
    return (
        emb.join(F.broadcast(probed), "label", "left_semi")
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select("vec_id", "label", cos.alias("cos_raw"))
        .orderBy(F.col("cos_raw").desc(), F.col("vec_id"))
        .limit(TOP_K)
        .select("vec_id", "label", F.round("cos_raw", 4).alias("cos_sim"))
    )


@query(
    "similarity_knn_join_blocked",
    oracle=f"""
        SELECT vec_a, vec_b, cos_sim FROM (
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   round({cosine_similarity_sql('a.embedding', 'b.embedding')}, 4) AS cos_sim,
                   row_number() OVER (
                       PARTITION BY a.vec_id
                       ORDER BY {cosine_similarity_sql('a.embedding', 'b.embedding')} DESC,
                                b.vec_id
                   ) AS rn
            FROM embeddings a JOIN embeddings b
              ON a.label = b.label AND a.vec_id <> b.vec_id
            WHERE a.vec_id < 50
        ) WHERE rn = 1
    """,
)
def similarity_knn_join_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-NN similarity join, label-blocked: for each query vector (first
    50 ids), its nearest neighbor within the same quantization cell —
    the all-pairs version of IVF probing, as used for embedding-level
    near-dup mining.

    Scale: equi-join on the cell id bounds the pair expansion to Σ|cell|²;
    the ranking window then keeps one row per query. Never a full cross
    join."""
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.filter(F.col("vec_id") < 50).alias("a")
    b = emb.alias("b")
    cos = cosine_similarity(F.col("a.embedding"), F.col("b.embedding"))
    w = Window.partitionBy("vec_a").orderBy(F.col("cos_raw").desc(), F.col("vec_b"))
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cos_raw"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_a", "vec_b", F.round("cos_raw", 4).alias("cos_sim"))
    )


@query(
    "embedding_quantize_int8",
    oracle=f"""
        SELECT vec_id, label,
               array_to_string(
                   list_transform(CAST(embedding AS DOUBLE[]),
                                  v -> CAST(floor(v * 127.0 / {SQ_SCALE}) AS INTEGER)),
                   ',') AS q8_csv,
               CAST(floor(list_aggregate(
                     list_transform(CAST(embedding AS DOUBLE[]), v -> v * v),
                     'sum') * 10000 + 0.5) AS BIGINT) AS sq_norm_bp
        FROM embeddings WHERE vec_id < 200
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 quantization of embeddings (fixed scale 0.5 ≈ the
    corpus max-abs): the 4× storage/bandwidth cut applied before ANN
    serving; plus the squared norm (basis points) kept alongside for
    asymmetric distance correction. All higher-order array functions —
    JVM-side, shuffle-free.

    The quantized vector is emitted CSV-rendered (exact integer elements,
    so the rendering is lossless): the driver's canonicalizer sorts rows
    with pandas, and raw array cells crash it (unhashable 'list' — r2
    ADVICE). The array-native form is the same expression minus concat_ws."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    v = F.col("embedding").cast("array<double>")
    q8 = F.transform(v, lambda x: F.floor(x * 127.0 / SQ_SCALE).cast("int"))
    sq = F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
    return emb.select(
        "vec_id",
        "label",
        F.concat_ws(",", q8.cast("array<string>")).alias("q8_csv"),
        F.floor(sq * 10000 + 0.5).cast("long").alias("sq_norm_bp"),
    )


@query(
    "ann_batch_topk",
    oracle=f"""
        WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
                   FROM embeddings WHERE vec_id < 20),
        scored AS (
            SELECT q.q_id, e.vec_id,
                   {cosine_similarity_sql('e.embedding', 'q.q_emb')} AS cos,
                   row_number() OVER (
                       PARTITION BY q.q_id
                       ORDER BY {cosine_similarity_sql('e.embedding', 'q.q_emb')} DESC,
                                e.vec_id
                   ) AS rn
            FROM embeddings e, q
            WHERE e.vec_id <> q.q_id
        )
        SELECT q_id, vec_id AS neighbor_id, round(cos, 4) AS cos_sim
        FROM scored WHERE rn <= 3
    """,
)
def ann_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched top-k: 20 query vectors answered in ONE pass — broadcast
    the query block, score corpus×queries, rank per query. This is the
    throughput shape for bulk retrieval (per-query loops multiply scan
    cost by |Q|; the broadcast product amortizes one corpus scan across
    the whole batch).

    Scale: corpus×|Q| pairs stream through the ranking window sharded on
    q_id; for large |Q|, tile the query block and/or route through the
    IVF cells first (ann_ivf_probe_topk)."""
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    cos = cosine_similarity(F.col("embedding"), F.col("q_emb"))
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_raw").desc(), F.col("vec_id")
    )
    return (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", cos.alias("cos_raw"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round("cos_raw", 4).alias("cos_sim"),
        )
    )


K_CELLS = 8
KMEANS_ITERS = 4


def kmeans_centroid_ctes(where: str = "") -> list[str]:
    """Shared oracle scaffolding: the CTE chain (`emb`, `c0`..`c{N}`)
    that unrolls Lloyd's fixed iteration budget in SQL — consumers
    (ann_kmeans_cells here, ann_ivf_incremental_assign in retrieval)
    append their own final CTEs/SELECT over ``c{KMEANS_ITERS}``.
    ``where`` restricts the TRAINING corpus (e.g. the pre-existing
    index half in the incremental-maintenance query)."""
    cos = cosine_similarity_sql("e.v", "c.c")
    ctes = [
        "emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v"
        f" FROM embeddings{' WHERE ' + where if where else ''})",
        f"""c0 AS (
            SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v AS c
            FROM (SELECT vec_id, v FROM emb ORDER BY vec_id LIMIT {K_CELLS})
        )""",
    ]
    for i in range(1, KMEANS_ITERS + 1):
        ctes.append(f"""a{i} AS (
            SELECT vec_id, v, cell FROM (
                SELECT e.vec_id, e.v, c.cell,
                       row_number() OVER (PARTITION BY e.vec_id
                                          ORDER BY {cos} DESC, c.cell) AS rn
                FROM emb e, c{i - 1} c
            ) WHERE rn = 1
        )""")
        ctes.append(f"""c{i} AS (
            SELECT cell, list(dim_avg ORDER BY pos) AS c
            FROM (
                SELECT cell, pos, avg(x) AS dim_avg
                FROM (
                    SELECT cell, generate_subscripts(v, 1) AS pos,
                           unnest(v) AS x
                    FROM a{i}
                )
                GROUP BY cell, pos
            )
            GROUP BY cell
        )""")
    return ctes


def _kmeans_oracle() -> str:
    """Lloyd's with a FIXED iteration budget is SQL-expressible after all:
    unroll the loop into one CTE pair (assign, recenter) per iteration,
    generated by the same Python loop that drives the Spark plan. Both
    engines do double-precision cosine; assignments only diverge if two
    centroid similarities tie within one ulp."""
    cos = cosine_similarity_sql("e.v", "c.c")
    ctes = kmeans_centroid_ctes()
    return f"""
        WITH {",".join(ctes)}
        SELECT vec_id, cell, round(sim, 4) AS cos_to_centroid
        FROM (
            SELECT e.vec_id, c.cell, {cos} AS sim,
                   row_number() OVER (PARTITION BY e.vec_id
                                      ORDER BY {cos} DESC, c.cell) AS rn
            FROM emb e, c{KMEANS_ITERS} c
        ) WHERE rn = 1
    """


def lloyd_centroids(
    emb: DataFrame, k: int = K_CELLS, iters: int = KMEANS_ITERS
) -> DataFrame:
    """Lloyd's k-means over ``emb`` (columns vec_id, v:array<double>)
    with deterministic init (the k lowest vec_ids); returns (cell, c)
    centroids after ``iters`` rounds. Per iteration: one broadcast of
    K·d doubles, one narrow argmax pass, one k·d-row shuffle — the
    distributed Lloyd shape at any corpus size. Shared by
    ann_kmeans_cells (index build) and ann_ivf_incremental_assign
    (maintenance tick on a FROZEN index)."""
    from pyspark.sql import Window as W

    centroids = (
        emb.orderBy("vec_id")
        .limit(k)
        .select(
            (F.row_number().over(W.orderBy("vec_id")) - 1).alias("cell"),
            F.col("v").alias("c"),
        )
    )
    cos = cosine_similarity(F.col("v"), F.col("c"))
    for _ in range(iters):
        assigned = (
            emb.crossJoin(F.broadcast(centroids))
            .select("vec_id", "v", "cell", cos.alias("sim"))
            .withColumn(
                "rn",
                F.row_number().over(
                    W.partitionBy("vec_id").orderBy(
                        F.col("sim").desc(), F.col("cell")
                    )
                ),
            )
            .filter(F.col("rn") == 1)
        )
        centroids = (
            assigned.select("cell", F.posexplode("v"))
            .groupBy("cell", "pos")
            .agg(F.avg("col").alias("dim_avg"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "dim_avg"))),
                    lambda s: s["dim_avg"],
                ).alias("c")
            )
        )
    return centroids


@query("ann_kmeans_cells", oracle=_kmeans_oracle())
def ann_kmeans_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cell CONSTRUCTION: k-means (Lloyd's) over the embeddings with
    deterministic init (the K lowest vec_ids) and a fixed iteration
    budget — produces (vec_id, cell, cos_to_centroid). This replaces the
    'label' column the other ANN queries lean on with cells the engine
    derives itself; ann_ivf_probe_topk over these cells is the full
    self-contained IVF pipeline.

    Each iteration is: broadcast K centroids → per-vector argmax cosine
    (JVM higher-order functions, no Python) → new centroids via
    posexplode + (cell, dim) average. The oracle unrolls the fixed
    iteration budget into generated CTEs (_kmeans_oracle) — the
    genuinely-unbounded fixpoint variant would stay oracle-exempt; tests
    additionally assert determinism, total coverage, and assignment
    improvement.

    Scale: per iteration one broadcast (K·d doubles) + one narrow
    argmax pass + one k·d-row shuffle — Lloyd's at any corpus size;
    k-means|| init swaps in for the deterministic seed without touching
    the loop."""
    from ..functions.caching import scoped_persist

    emb = scoped_persist(
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        ).repartition(spark.sparkContext.defaultParallelism, "vec_id")
    )
    centroids = lloyd_centroids(emb)

    from pyspark.sql import Window as W

    cos = cosine_similarity(F.col("v"), F.col("c"))
    final = (
        emb.crossJoin(F.broadcast(centroids))
        .select("vec_id", "cell", cos.alias("sim"))
    )
    w = W.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("cell"))
    return (
        final.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cell", F.round("sim", 4).alias("cos_to_centroid"))
    )


@query(
    "embedding_centroid_per_label",
    oracle="""
        SELECT label,
               string_agg(CAST(mb AS VARCHAR), ',' ORDER BY pos)
                   AS centroid_mb_csv
        FROM (
            SELECT label, pos,
                   CAST(floor(avg(v) * 1000 + 0.5) AS BIGINT) AS mb
            FROM (
                SELECT label,
                       generate_subscripts(embedding, 1) AS pos,
                       CAST(unnest(embedding) AS DOUBLE) AS v
                FROM embeddings
            )
            GROUP BY label, pos
        )
        GROUP BY label
    """,
)
def embedding_centroid_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class centroid of an embedding column — the reduce step of
    k-means / class prototypes / IVF codebook training, expressed as a
    dimension-exploded aggregate.

    Scale: posexplode turns n×d rows into the shuffle, keyed (label, pos)
    — partial aggregation collapses each task's contribution to one
    partial sum per (label, dim) BEFORE the exchange, so the shuffle
    carries |labels|×d rows per task, independent of n. The array is
    reassembled with a sort inside each tiny (label) group. For very
    wide vectors prefer F.aggregate over zip_with on array sums (one row
    per group, no explode); the exploded form wins when d is modest and
    skew matters.

    Output is the centroid in integer milli-units, CSV-rendered (the
    driver's pandas canonicalizer can't sort raw array cells — r2
    ADVICE); integer elements make the string rendering engine-exact.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    per_dim = (
        emb.select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(F.floor(F.avg("v") * 1000 + 0.5).cast("long").alias("mb"))
    )
    return (
        per_dim.groupBy("label")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("mb")))
                    ),
                    lambda s: s["mb"].cast("string"),
                ),
            ).alias("centroid_mb_csv")
        )
    )


PQ_SUBS = 4  # subspaces: 64 dims -> 4 x 16-dim subvectors
PQ_SUBDIM = 16


@query(
    "ann_pq_adc_topk",
    oracle=f"""
        WITH sub AS (
            SELECT vec_id, label,
                   CAST((d - 1) // {PQ_SUBDIM} AS INTEGER) AS s,
                   CAST((d - 1) % {PQ_SUBDIM} AS INTEGER) AS sd,
                   x
            FROM (
                SELECT vec_id, label,
                       generate_subscripts(embedding, 1) AS d,
                       CAST(unnest(embedding) AS DOUBLE) AS x
                FROM embeddings
            )
        ),
        codes AS (
            SELECT label AS code, s, sd, avg(x) AS cx
            FROM sub GROUP BY label, s, sd
        ),
        enc AS (
            SELECT vec_id, s, code FROM (
                SELECT t.vec_id, t.s, c.code,
                       row_number() OVER (
                           PARTITION BY t.vec_id, t.s
                           ORDER BY sum((t.x - c.cx) * (t.x - c.cx)), c.code
                       ) AS rn
                FROM sub t JOIN codes c ON c.s = t.s AND c.sd = t.sd
                GROUP BY t.vec_id, t.s, c.code
            ) WHERE rn = 1
        ),
        adc AS (
            SELECT c.s, c.code, sum((q.x - c.cx) * (q.x - c.cx)) AS qd2
            FROM codes c
            JOIN (SELECT s, sd, x FROM sub WHERE vec_id = {QUERY_VEC_ID}) q
              ON q.s = c.s AND q.sd = c.sd
            GROUP BY c.s, c.code
        ),
        scored AS (
            SELECT e.vec_id,
                   CAST(floor(sum(a.qd2) * 10000 + 0.5) AS BIGINT)
                       AS adc_dist_bp
            FROM enc e JOIN adc a ON a.s = e.s AND a.code = e.code
            WHERE e.vec_id <> {QUERY_VEC_ID}
            GROUP BY e.vec_id
        )
        SELECT vec_id, adc_dist_bp
        FROM scored ORDER BY adc_dist_bp, vec_id LIMIT {TOP_K}
    """,
)
def ann_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization + asymmetric distance computation (ADC) —
    the memory-bound ANN tier below IVF: each vector is stored as
    PQ_SUBS (4) one-byte codes (here: nearest per-label subvector mean per
    subspace — a deterministic, oracle-able codebook standing in for the
    per-subspace k-means a production build would train), and a query is
    answered by summing PQ_SUBS precomputed subspace distances per
    candidate — table lookups, never a full-vector scan.

    Plan shape (the PQ serving geometry): codebook ≤ |labels|×d doubles →
    broadcast; encoding is one shuffle keyed (vec_id, subspace); the ADC
    lookup table is |labels|×PQ_SUBS rows → broadcast; scoring touches
    only each vector's PQ_SUBS codes. At 100 TB the codes table is
    ~16 bytes/vector — RAM-resident where raw vectors (256 B) are not;
    recall is recovered by exact re-ranking the PQ top-N (compose with
    ann_cosine_topk_bruteforce over the shortlist).

    Ranking is by basis-point-floored distance with vec_id tie-break, so
    cross-engine float ulps can't reorder the cut."""
    from pyspark.sql import Window as W

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    sub = emb.select(
        "vec_id",
        "label",
        F.posexplode("v").alias("d", "x"),
    ).select(
        "vec_id",
        "label",
        (F.col("d") / PQ_SUBDIM).cast("int").alias("s"),
        (F.col("d") % PQ_SUBDIM).alias("sd"),
        "x",
    )
    codes = (
        sub.groupBy(F.col("label").alias("code"), "s", "sd")
        .agg(F.avg("x").alias("cx"))
    )
    enc_d = (
        sub.join(F.broadcast(codes), ["s", "sd"])
        .groupBy("vec_id", "s", "code")
        .agg(
            F.sum((F.col("x") - F.col("cx")) * (F.col("x") - F.col("cx"))).alias("d2")
        )
    )
    w = W.partitionBy("vec_id", "s").orderBy("d2", "code")
    enc = (
        enc_d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "s", "code")
    )
    qd = sub.filter(F.col("vec_id") == QUERY_VEC_ID).select("s", "sd", "x")
    adc = (
        codes.join(F.broadcast(qd.withColumnRenamed("x", "qx")), ["s", "sd"])
        .groupBy("s", "code")
        .agg(
            F.sum(
                (F.col("qx") - F.col("cx")) * (F.col("qx") - F.col("cx"))
            ).alias("qd2")
        )
    )
    scored = (
        enc.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(adc), ["s", "code"])
        .groupBy("vec_id")
        .agg(
            F.floor(F.sum("qd2") * 10000 + 0.5)
            .cast("long")
            .alias("adc_dist_bp")
        )
    )
    return scored.orderBy("adc_dist_bp", "vec_id").limit(TOP_K)


N_PLANES = 8  # 2^8 = 256 sign-hash buckets
_RP_DIMS = 64  # embedding width (TESTDATA.md)
_RP_TOPK = 3
RP_PROBE_MOD = 29  # probe set (vec_id % MOD == 0), shared with multiprobe
_HEX_NEG = "01234567"


# adaptive sign-LSH sizing (r6 scaling audit, VERDICT r5 #3): FIXED
# 2^8 cells make every within-cell pairwise stage quadratic once the
# corpus outgrows them (cell occupancy grows linearly with N — the
# dedup_embedding_neardup_pairs slope-1.29 flag in BENCH_SCALING.json).
# The semantic-dedup queries size the bucketing to the corpus instead:
# planes = ceil(log2(N / target_occupancy)), floored at 8 (so the
# driver's sf0.001-0.1 data keeps today's exact cells) and capped at 24.
SEM_CELL_TARGET = 8
MAX_PLANES = 24


def adaptive_n_planes(n_vectors: int) -> int:
    import math

    return min(
        MAX_PLANES,
        max(
            N_PLANES,
            math.ceil(math.log2(max(n_vectors, 1) / SEM_CELL_TARGET)),
        ),
    )


def _rp_signs(n_planes: int = N_PLANES) -> list[list[float]]:
    """±1 hyperplane components, deterministically derived from md5 so
    the DuckDB oracle reproduces them exactly (functions.hashing
    convention): component (p, d) is +1 iff the first hex digit of
    md5('{p}|{d}') has its high bit set."""
    import hashlib

    return [
        [
            1.0
            if hashlib.md5(f"{p}|{d}".encode()).hexdigest()[0] not in _HEX_NEG
            else -1.0
            for d in range(_RP_DIMS)
        ]
        for p in range(n_planes)
    ]


def rp_bucket_column(
    vec: F.Column, n_planes: int = N_PLANES
) -> F.Column:
    """Spark expression for a vector's sign-LSH bucket: bit p of the
    result is the sign of the projection onto hyperplane p. Pure
    zip_with/aggregate arithmetic over plan literals — whole-stage
    codegen, shared by the ANN probe and the SemDeDup-style semantic
    dedup (operators.dedup, which passes an adaptive plane count)."""
    bucket = None
    for p, plane in enumerate(_rp_signs(n_planes)):
        proj = F.aggregate(
            F.zip_with(
                F.array(*[F.lit(x) for x in plane]), vec, lambda x, y: x * y
            ),
            F.lit(0.0),
            lambda acc, val: acc + val,
        )
        bit = F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket.cast("long")


# DuckDB twin of rp_bucket_column: `signs`+`buckets` CTE bodies (insert
# after WITH). `buckets` exposes (vec_id, label, embedding, bucket) with
# bucket CAST to BIGINT so both engines agree on the output type.
def rp_buckets_sql(adaptive: bool = False) -> str:
    """DuckDB twin of rp_bucket_column: `signs`+`buckets` CTE bodies
    (insert after WITH; adds a `params` CTE when adaptive). With
    ``adaptive``, the plane count is computed IN SQL from the corpus
    size — the same ceil(log2(N/target)) rule as adaptive_n_planes —
    so the oracle stays self-contained at any scale."""
    if adaptive:
        planes_src = f"range({MAX_PLANES}) tp(p), params"
        planes_filter = "WHERE p < params.np"
        prefix = f"""params AS (
            SELECT LEAST({MAX_PLANES}, GREATEST({N_PLANES},
                CAST(ceil(log2(greatest(count(*), 1) / {SEM_CELL_TARGET}.0))
                     AS INTEGER))) AS np
            FROM embeddings
        ),
        """
    else:
        planes_src = f"range({N_PLANES}) tp(p)"
        planes_filter = ""
        prefix = ""
    return f"""{prefix}signs AS (
            SELECT p,
                   list(CASE WHEN substring(
                            md5(CAST(p AS VARCHAR) || '|' || CAST(d AS VARCHAR)),
                            1, 1) NOT IN
                            ({", ".join(repr(c) for c in _HEX_NEG)})
                        THEN 1.0 ELSE -1.0 END ORDER BY d) AS s
            FROM {planes_src}, range({_RP_DIMS}) td(d)
            {planes_filter}
            GROUP BY p
        ),
        buckets AS (
            SELECT e.vec_id, e.label, e.embedding,
                   CAST(sum(CASE WHEN list_dot_product(
                                s.s, CAST(e.embedding AS DOUBLE[])) >= 0
                            THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket
            FROM embeddings e, signs s
            GROUP BY e.vec_id, e.label, e.embedding
        )"""


RP_BUCKETS_SQL = rp_buckets_sql()


@query(
    "ann_rp_lsh_topk",
    oracle=f"""
        WITH {RP_BUCKETS_SQL},
        ranked AS (
            SELECT a.vec_id AS probe_id, b.vec_id, b.label,
                   {cosine_similarity_sql('a.embedding', 'b.embedding')}
                       AS cos_raw,
                   row_number() OVER (
                       PARTITION BY a.vec_id
                       ORDER BY {cosine_similarity_sql('a.embedding', 'b.embedding')}
                                DESC, b.vec_id
                   ) AS rn
            FROM buckets a JOIN buckets b
              ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
            WHERE a.vec_id % {RP_PROBE_MOD} = 0
        )
        SELECT probe_id, vec_id, label, round(cos_raw, 4) AS cos_sim
        FROM ranked WHERE rn <= {_RP_TOPK}
    """,
)
def ann_rp_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane (sign) LSH ANN: each vector's 8-bit bucket is the
    sign pattern of its projections onto 8 deterministic ±1 hyperplanes
    (SimHash for embeddings, Charikar 2002); probes rank exact cosine only
    within their own bucket and keep the top 3.

    The third ANN tier next to brute-force (exact, O(n) per query) and
    IVF (data-dependent cells): sign-LSH needs NO training pass — the
    bucketing is data-independent, so new vectors route in O(P·d) with
    zero cluster state, the right trade when the corpus churns faster
    than a codebook can be rebuilt.

    Scale: bucket assignment is a map-only pass (the 8×64 sign matrix is
    a plan literal); the candidate join is an equi-join on bucket whose
    groups hold ~n/256 vectors, so the pair expansion is n²/256 worst
    case and data-proportional after the probe filter. More planes or
    multi-probe (flip one bit) tune recall without changing the plan
    shape — no cross join at any size.
    """
    from pyspark.sql import Window

    from ..functions.vectors import as_double_array

    emb = load_table(spark, sf_dir, "embeddings")
    buckets = emb.select(
        "vec_id",
        "label",
        "embedding",
        rp_bucket_column(as_double_array("embedding")).alias("bucket"),
    )
    a = buckets.filter(F.col("vec_id") % RP_PROBE_MOD == 0).alias("a")
    b = buckets.alias("b")
    cos = cosine_similarity(F.col("a.embedding"), F.col("b.embedding"))
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cos_raw").desc(), F.col("vec_id")
    )
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("probe_id"),
            F.col("b.vec_id").alias("vec_id"),
            F.col("b.label").alias("label"),
            cos.alias("cos_raw"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _RP_TOPK)
        .select(
            "probe_id", "vec_id", "label", F.round("cos_raw", 4).alias("cos_sim")
        )
    )


@query(
    "hard_negative_mining",
    oracle=f"""
        SELECT anchor_id, negative_id, cos_sim FROM (
            SELECT a.vec_id AS anchor_id, b.vec_id AS negative_id,
                   round({cosine_similarity_sql('a.embedding', 'b.embedding')}, 4)
                       AS cos_sim,
                   row_number() OVER (
                       PARTITION BY a.vec_id
                       ORDER BY {cosine_similarity_sql('a.embedding', 'b.embedding')} DESC,
                                b.vec_id
                   ) AS rn
            FROM embeddings a JOIN embeddings b
              ON a.label <> b.label
            WHERE a.vec_id < 50
        ) WHERE rn <= 2
    """,
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each anchor
    (first 50 ids), the 2 most-similar vectors of a DIFFERENT class —
    the negatives that actually move a contrastive loss (random
    negatives are trivially separable). Anchors broadcast; the corpus
    streams through the scoring join once.

    Scale: cost is |anchors|·|corpus| per mining pass — run it on a
    sampled anchor set per epoch, or route through the IVF cells first
    and only score the anchor's top probed cells (compose with
    ann_ivf_probe_topk); the ranking window shards on anchor_id."""
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("a_label"),
        F.col("embedding").alias("a_emb"),
    )
    cos = cosine_similarity(F.col("a_emb"), F.col("embedding"))
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("cos_raw").desc(), F.col("vec_id")
    )
    return (
        emb.join(F.broadcast(a), F.col("label") != F.col("a_label"))
        .select("anchor_id", "vec_id", cos.alias("cos_raw"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select(
            "anchor_id",
            F.col("vec_id").alias("negative_id"),
            F.round("cos_raw", 4).alias("cos_sim"),
        )
    )


SQ_SHORTLIST = 40    # coarse candidates reranked exactly


@query(
    "ann_sq_rerank_topk",
    oracle=f"""
        WITH q AS (SELECT embedding AS q_emb FROM embeddings
                   WHERE vec_id = {QUERY_VEC_ID}),
        scored AS (
            SELECT e.vec_id, e.label, e.embedding, q.q_emb,
                   CAST(list_dot_product(
                       list_transform(CAST(e.embedding AS DOUBLE[]),
                           v -> CAST(floor(v * 127.0 / {SQ_SCALE}) AS DOUBLE)),
                       list_transform(CAST(q.q_emb AS DOUBLE[]),
                           v -> CAST(floor(v * 127.0 / {SQ_SCALE}) AS DOUBLE))
                   ) AS BIGINT) AS q8_score
            FROM embeddings e, q
            WHERE e.vec_id <> {QUERY_VEC_ID}
        ),
        shortlist AS (
            SELECT * FROM scored
            ORDER BY q8_score DESC, vec_id
            LIMIT {SQ_SHORTLIST}
        )
        SELECT vec_id, label,
               round({cosine_similarity_sql('embedding', 'q_emb')}, 4)
                   AS cos_sim
        FROM shortlist
        ORDER BY {cosine_similarity_sql('embedding', 'q_emb')} DESC, vec_id
        LIMIT {TOP_K}
    """,
)
def ann_sq_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval with scalar quantization: stage 1 scores the
    whole corpus with the INT8 dot product (integer arithmetic over the
    4×-smaller codes — exact in both engines, so the shortlist is
    deterministic); stage 2 reranks only the SQ_SHORTLIST survivors with
    the exact double-precision cosine. The quantize-prefilter → exact-
    rerank shape is the standard serving stack (FAISS SQ8 + refine).

    Scale: stage 1 reads 1 byte/dim instead of 4 — the memory-bandwidth
    bound path at billions of vectors — and needs no shuffle beyond the
    top-shortlist merge (TakeOrdered, k rows per partition to the
    driver); stage 2 touches SQ_SHORTLIST rows, constant cost. Both
    stages stay in whole-stage codegen (transform/zip_with/aggregate)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = _query_vector(emb)

    def q8(col):
        return F.transform(
            col.cast("array<double>"),
            lambda v: F.floor(v * 127.0 / SQ_SCALE).cast("long"),
        )

    q8_score = F.aggregate(
        F.zip_with(q8(F.col("embedding")), q8(F.col("q_emb")), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    shortlist = (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .withColumn("q8_score", q8_score)
        .orderBy(F.col("q8_score").desc(), F.col("vec_id"))
        .limit(SQ_SHORTLIST)
    )
    cos = cosine_similarity(F.col("embedding"), F.col("q_emb"))
    return (
        shortlist.withColumn("cos_raw", cos)
        .orderBy(F.col("cos_raw").desc(), F.col("vec_id"))
        .limit(TOP_K)
        .select("vec_id", "label", F.round("cos_raw", 4).alias("cos_sim"))
    )


JL_OUT_DIMS = 8


@query(
    "embedding_random_projection_jl",
    oracle=f"""
        WITH comp AS (
            SELECT vec_id,
                   generate_subscripts(embedding, 1) - 1 AS i,
                   CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5)
                        AS BIGINT) AS mv
            FROM embeddings
        ),
        proj AS (
            SELECT c.vec_id, j.j,
                   CAST(sum(CASE WHEN ({{h}}) % 2 = 0
                                 THEN c.mv ELSE -c.mv END) AS BIGINT) AS p
            FROM comp c, range({JL_OUT_DIMS}) j(j)
            GROUP BY 1, 2
        )
        SELECT vec_id,
               string_agg(CAST(p AS VARCHAR), ',' ORDER BY j)
                   AS proj_milli_csv
        FROM proj
        GROUP BY 1
    """.replace(
        "{h}",
        "try_cast('0x' || substring(md5('jl|' || CAST(j.j AS VARCHAR)"
        " || '|' || CAST(c.i AS VARCHAR)), 1, 15) AS BIGINT)",
    ),
)
def embedding_random_projection_jl(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction: project the
    64-dim embeddings onto {JL_OUT_DIMS} data-independent ±1 random
    directions (md5-derived signs, the same portable family as the sign-
    LSH tier) — the cheap distance-preserving compression used before
    clustering/ANN when vectors outgrow memory budgets. Components are
    quantized to integer milli-units BEFORE summation, so both engines
    add exact integers in any order and the CSV-rendered projection is
    bit-identical (float Σ±v would be summation-order-dependent).

    Scale: posexplode puts (vector, dim) pairs on the wire once; the
    projection is a keyed (vec_id, out-dim) partial-aggregated sum — no
    D×K matrix is materialized anywhere, signs are computed inline in
    codegen, and output width is K regardless of input width. The
    rotation-free ±1 family is exactly Achlioptas' database-friendly
    JL construction."""
    from ..functions.hashing import hash64

    emb = load_table(spark, sf_dir, "embeddings")
    comp = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("i", "v"),
    ).select(
        "vec_id",
        "i",
        F.floor(F.col("v") * 1000 + 0.5).cast("long").alias("mv"),
    )
    expanded = comp.select(
        "vec_id",
        "i",
        "mv",
        F.explode(F.sequence(F.lit(0), F.lit(JL_OUT_DIMS - 1))).alias("j"),
    )
    sign = (
        hash64(
            F.concat(
                F.lit("jl|"),
                F.col("j").cast("string"),
                F.lit("|"),
                F.col("i").cast("string"),
            )
        )
        % 2
        == 0
    )
    proj = (
        expanded.select(
            "vec_id",
            "j",
            F.when(sign, F.col("mv")).otherwise(-F.col("mv")).alias("term"),
        )
        .groupBy("vec_id", "j")
        .agg(F.sum("term").cast("long").alias("p"))
    )
    return proj.groupBy("vec_id").agg(
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(F.collect_list(F.struct("j", "p"))),
                lambda s: s["p"].cast("string"),
            ),
        ).alias("proj_milli_csv")
    )


N_RECALL_QUERIES = 20


@query(
    "ann_ivf_recall_eval",
    oracle=f"""
        WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
                   FROM embeddings WHERE vec_id < {N_RECALL_QUERIES}),
        {_CENTROIDS_SQL},
        exact AS (
            SELECT q.q_id, e.vec_id,
                   row_number() OVER (
                       PARTITION BY q.q_id
                       ORDER BY {cosine_similarity_sql('e.embedding', 'q.q_emb')} DESC,
                                e.vec_id) AS rn
            FROM embeddings e, q WHERE e.vec_id <> q.q_id
        ),
        probed AS (
            SELECT q_id, label FROM (
                SELECT q.q_id, c.label,
                       row_number() OVER (
                           PARTITION BY q.q_id
                           ORDER BY {cosine_similarity_sql('c.centroid', 'q.q_emb')} DESC,
                                    c.label) AS crn
                FROM centroids c, q
            ) WHERE crn <= {N_PROBE}
        ),
        ivf AS (
            SELECT q.q_id, e.vec_id,
                   row_number() OVER (
                       PARTITION BY q.q_id
                       ORDER BY {cosine_similarity_sql('e.embedding', 'q.q_emb')} DESC,
                                e.vec_id) AS rn
            FROM embeddings e
            JOIN probed p ON e.label = p.label
            JOIN q ON q.q_id = p.q_id
            WHERE e.vec_id <> q.q_id
        )
        SELECT ex.q_id,
               count(iv.vec_id) AS n_hits,
               CAST(floor(count(iv.vec_id) / {TOP_K}.0 * 10000 + 0.5)
                    AS BIGINT) AS recall_bp
        FROM (SELECT * FROM exact WHERE rn <= {TOP_K}) ex
        LEFT JOIN (SELECT * FROM ivf WHERE rn <= {TOP_K}) iv
               ON iv.q_id = ex.q_id AND iv.vec_id = ex.vec_id
        GROUP BY ex.q_id
    """,
)
def ann_ivf_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the IVF probe path against the exact brute-force
    ranking, per query vector — the similarity family's estimator
    calibration (sibling of dedup_minhash_estimator_calibration): the
    number that tells you whether N_PROBE cells are enough BEFORE the
    approximate index quietly drops neighbors from training pairs. Low
    recall on specific queries localizes bad cells (centroid drift,
    skewed partitions).

    Scale: the exact arm is the O(n·Q) baseline — affordable for an
    evaluation SAMPLE of queries (that's the point: audit on a sample,
    serve approximate on the full load); the IVF arm touches the probed
    cells only. Both arms share one window shape, and the recall join
    is over Q×k rows.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < N_RECALL_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    cos = cosine_similarity(F.col("embedding"), F.col("q_emb"))
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_raw").desc(), F.col("vec_id")
    )
    exact = (
        emb.crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", cos.alias("cos_raw"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("q_id", "vec_id")
    )
    centroids = (
        emb.select(
            "label", F.posexplode(F.col("embedding").cast("array<double>"))
        )
        .groupBy("label", "pos")
        .agg(F.avg("col").alias("dim_avg"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "dim_avg"))),
                lambda s: s["dim_avg"],
            ).alias("centroid")
        )
    )
    probe_cos = cosine_similarity(F.col("centroid"), F.col("q_emb"))
    wp = Window.partitionBy("q_id").orderBy(
        F.col("c_raw").desc(), F.col("label")
    )
    probed = (
        centroids.crossJoin(F.broadcast(qs))
        .select("q_id", "label", probe_cos.alias("c_raw"))
        .withColumn("crn", F.row_number().over(wp))
        .filter(F.col("crn") <= N_PROBE)
        .select("q_id", "label")
    )
    ivf = (
        emb.join(F.broadcast(probed), "label")
        .join(F.broadcast(qs), "q_id")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", cos.alias("cos_raw"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("q_id", F.col("vec_id").alias("ivf_vec_id"))
    )
    return (
        exact.join(
            ivf,
            (exact.q_id == ivf.q_id)
            & (exact.vec_id == ivf.ivf_vec_id),
            "left",
        )
        .groupBy(exact.q_id.alias("q_id"))
        .agg(
            F.count("ivf_vec_id").alias("n_hits"),
            F.floor(
                F.count("ivf_vec_id") / float(TOP_K) * 10000 + 0.5
            )
            .cast("long")
            .alias("recall_bp"),
        )
    )


@query(
    "embedding_norm_qa_outliers",
    oracle="""
        WITH norms AS (
            SELECT vec_id, label,
                   sqrt(list_aggregate(
                       list_transform(CAST(embedding AS DOUBLE[]),
                                      v -> v * v), 'sum')) AS nrm,
                   len(embedding) AS dim,
                   len(list_filter(CAST(embedding AS DOUBLE[]),
                                   v -> v = 0.0)) AS n_zero
            FROM embeddings
        ),
        stats AS (
            SELECT avg(nrm) AS mu, stddev_samp(nrm) AS sd FROM norms
        )
        SELECT n.vec_id, n.label,
               CAST(floor(n.nrm * 10000 + 0.5) AS BIGINT) AS norm_bp,
               CAST(n.dim AS INTEGER) AS dim,
               CAST(n.n_zero AS INTEGER) AS n_zero_components,
               CASE WHEN abs(n.nrm - s.mu) > 2 * s.sd THEN 1 ELSE 0 END
                   AS is_norm_outlier
        FROM norms n, stats s
        WHERE abs(n.nrm - s.mu) > 2 * s.sd
           OR n.n_zero * 4 >= n.dim
    """,
)
def embedding_norm_qa_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding quality audit: vectors whose L2 norm sits >2σ from the
    corpus mean, or with ≥25% exactly-zero components — the two
    signatures of broken embeddings (truncated writes, failed encoder
    batches, padding leaks) that silently poison cosine similarity and
    centroid training. Run BEFORE the ANN index build, the same place
    the text side runs its quality filters.

    The 2σ band is calibrated so the synthetic unit-normalized corpus
    (norm noise ~1e-8) flags a NONEMPTY tail at every SF — a 0-row
    green would prove nothing.  The positive path (planted inflated-
    norm / zeroed-tail vectors surfacing, and only them) is covered by
    tests/test_quality_fixtures.py.

    Scale: norms are row-local higher-order aggregates (no Python, no
    shuffle); the corpus mean/σ is one global streaming-moment
    aggregation whose single-row result broadcasts back — flagging is
    then row-local again, so the audit costs one scan plus a scalar
    join at any corpus size.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    norms = emb.select(
        "vec_id",
        "label",
        F.sqrt(
            F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
        ).alias("nrm"),
        F.size("embedding").alias("dim"),
        F.size(F.filter(v, lambda x: x == 0.0)).alias("n_zero"),
    )
    stats = norms.agg(
        F.avg("nrm").alias("mu"), F.stddev_samp("nrm").alias("sd")
    )
    flagged = norms.crossJoin(F.broadcast(stats))
    outlier = F.abs(F.col("nrm") - F.col("mu")) > 2 * F.col("sd")
    return (
        flagged.filter(
            outlier | (F.col("n_zero") * 4 >= F.col("dim"))
        )
        .select(
            "vec_id",
            "label",
            F.floor(F.col("nrm") * 10000 + 0.5).cast("long").alias("norm_bp"),
            F.col("dim").cast("int").alias("dim"),
            F.col("n_zero").cast("int").alias("n_zero_components"),
            F.when(outlier, 1).otherwise(0).alias("is_norm_outlier"),
        )
    )

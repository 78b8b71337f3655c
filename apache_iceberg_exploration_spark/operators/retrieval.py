"""Retrieval operators: BM25 sparse scoring and hybrid rank fusion.

The RAG-side complement of the ANN family (operators/similarity.py):
a corpus-statistics sparse retriever (BM25, the Lucene/Elasticsearch
scoring function) and reciprocal-rank fusion of the sparse and dense
arms — the standard hybrid-retrieval recipe a production RAG pipeline
runs over exactly the ``documents`` + ``embeddings`` tables this engine
manages. The reference has no retrieval plane at all (SURVEY.md §2);
this extends the BASELINE.json "similarity search" north star to the
text side.

Cross-engine float discipline (see text_unigram_logprob_filter): every
per-term float (idf × tf-normalization, reciprocal ranks) is rounded to
9 decimals and cast to DECIMAL before summation, so aggregates are
exact and associative in both engines; all other inputs are integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity, cosine_similarity_sql
from ..registry import query
from ..sources.io import load_table
from .similarity import QUERY_VEC_ID, _query_vector

BM25_TERMS = ("join", "merge", "filter")  # the fixed evaluation query
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 20
RRF_K = 60  # the standard reciprocal-rank-fusion constant
RRF_TOP_K = 10

_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_TERMS)

# BM25 per-(doc, term) score with the Lucene +1 idf (never negative even
# for df > N/2). Identical operand order on both engines; n/total arrive
# as exact integers, k1/b constants parse to the same doubles.
_BM25_TERM_SQL = (
    "round(ln(1 + (n - df + 0.5) / (df + 0.5))"
    " * (tf * {k1_plus_1}) / (tf + {k1} * ({one_minus_b} + {b}"
    " * (dl * n) / total)), 9)"
).format(k1_plus_1=1 + BM25_K1, k1=BM25_K1, one_minus_b=1 - BM25_B, b=BM25_B)

_BM25_CTE = f"""
        tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS word
            FROM documents WHERE doc_id <> {QUERY_VEC_ID}
        ),
        tok2 AS (SELECT doc_id, word FROM tok WHERE word <> ''),
        dl_t AS (SELECT doc_id, count(*) AS dl FROM tok2 GROUP BY 1),
        corpus AS (
            SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS total
            FROM dl_t
        ),
        tf_t AS (
            SELECT doc_id, word, count(*) AS tf
            FROM tok2 WHERE word IN ({_TERMS_SQL}) GROUP BY 1, 2
        ),
        df_t AS (
            SELECT word, count(DISTINCT doc_id) AS df FROM tf_t GROUP BY 1
        ),
        sparse AS (
            SELECT t.doc_id,
                   sum(CAST({_BM25_TERM_SQL} AS DECIMAL(18,9))) AS bm25,
                   count(*) AS n_terms
            FROM tf_t t
            JOIN df_t d USING (word)
            JOIN dl_t l USING (doc_id), corpus
            GROUP BY 1
        )
"""


def _bm25_sparse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared BM25 scoring relation: (doc_id, bm25 DECIMAL(18,9),
    n_terms) for the fixed query terms — the single source of truth
    both retrieval queries (and their oracles, via _BM25_CTE) rank.
    Pinned with localCheckpoint: both consumers run multiple jobs over
    it (top-k / bucket-count + rank), so the token explode and corpus
    stats execute once."""
    from ..functions.caching import scoped_persist

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") != QUERY_VEC_ID
    )
    tok = scoped_persist(
        docs.select(
            "doc_id", F.explode(F.split("text", " ")).alias("word")
        ).filter(F.col("word") != "")
    )
    dl = scoped_persist(
        tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    )
    corpus = dl.agg(
        F.count("*").alias("n"), F.sum("dl").cast("long").alias("total")
    ).first()
    n, total = int(corpus["n"]), int(corpus["total"])
    tf = (
        tok.filter(F.col("word").isin(*BM25_TERMS))
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("tf"))
    )
    df_t = tf.groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
    term_score = F.round(
        F.log(
            1
            + (F.lit(n) - F.col("df") + 0.5) / (F.col("df") + 0.5)
        )
        * (F.col("tf") * (1 + BM25_K1))
        / (
            F.col("tf")
            + BM25_K1
            * (
                (1 - BM25_B)
                + BM25_B * (F.col("dl") * F.lit(n)) / F.lit(total)
            )
        ),
        9,
    ).cast("decimal(18,9)")
    return (
        tf.join(F.broadcast(df_t), "word")
        .join(dl, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.sum(term_score).alias("bm25"),
            F.count("*").alias("n_terms"),
        )
        .localCheckpoint()
    )


@query(
    "bm25_sparse_retrieval_topk",
    oracle=f"""
        WITH {_BM25_CTE}
        SELECT doc_id,
               CAST(n_terms AS BIGINT) AS n_terms,
               round(CAST(bm25 AS DOUBLE), 6) AS bm25_score
        FROM sparse
        ORDER BY bm25 DESC, doc_id
        LIMIT {BM25_TOP_K}
    """,
)
def bm25_sparse_retrieval_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k for a fixed term query — the sparse-retrieval baseline
    (Lucene's Okapi BM25 with the +1 idf): per-term idf × saturated,
    length-normalized tf, summed per document, top-{BM25_TOP_K} by
    score. This is the lexical arm every hybrid RAG stack runs next to
    dense ANN, over corpus statistics (df, dl, avgdl) the engine
    already computes for TF-IDF.

    Scale: corpus stats are two keyed aggregates over the exploded
    tokens (shuffle carries tokens once); scoring touches only rows
    whose word is IN the query terms — the inverted-index access
    pattern expressed as a pre-aggregation filter — joined to the
    vocabulary-sized df table (broadcast) and the per-doc lengths; the
    top-k plans as TakeOrdered. Avgdl enters as integer (dl·N)/total so
    no float mean crosses engines.
    """
    sparse = _bm25_sparse(spark, sf_dir)
    return (
        sparse.orderBy(F.col("bm25").desc(), "doc_id")
        .limit(BM25_TOP_K)
        .select(
            "doc_id",
            F.col("n_terms").cast("long").alias("n_terms"),
            F.round(F.col("bm25").cast("double"), 6).alias("bm25_score"),
        )
    )


@query(
    "hybrid_retrieval_rrf_fusion",
    oracle=f"""
        WITH {_BM25_CTE},
        s_rank AS (
            SELECT doc_id,
                   row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r
            FROM sparse
        ),
        q AS (SELECT embedding AS q_emb FROM embeddings
              WHERE vec_id = {QUERY_VEC_ID}),
        dense AS (
            SELECT e.vec_id AS doc_id,
                   {cosine_similarity_sql('e.embedding', 'q.q_emb')} AS cos
            FROM embeddings e, q
            WHERE e.vec_id <> {QUERY_VEC_ID}
        ),
        d_rank AS (
            SELECT doc_id,
                   row_number() OVER (ORDER BY cos DESC, doc_id) AS r
            FROM dense
        ),
        fused AS (
            SELECT coalesce(s.doc_id, d.doc_id) AS doc_id,
                   coalesce(CAST(round(1.0 / ({RRF_K} + s.r), 9)
                                 AS DECIMAL(18,9)), 0)
                   + coalesce(CAST(round(1.0 / ({RRF_K} + d.r), 9)
                                   AS DECIMAL(18,9)), 0) AS rrf,
                   s.r AS sparse_rank,
                   d.r AS dense_rank
            FROM s_rank s FULL OUTER JOIN d_rank d ON s.doc_id = d.doc_id
        )
        SELECT doc_id,
               CAST(sparse_rank AS BIGINT) AS sparse_rank,
               CAST(dense_rank AS BIGINT) AS dense_rank,
               round(CAST(rrf AS DOUBLE), 6) AS rrf_score
        FROM fused
        ORDER BY rrf DESC, doc_id
        LIMIT {RRF_TOP_K}
    """,
)
def hybrid_retrieval_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval — reciprocal-rank fusion of the BM25 sparse arm
    and the dense cosine arm (k={RRF_K}): score(d) = Σ 1/(k + rank_arm),
    the scoreless fusion that needs no cross-arm calibration and is the
    production default for hybrid RAG search. An arm that didn't
    retrieve a document contributes 0. Emitted: the fused
    top-{RRF_TOP_K} with each arm's rank.

    Scale: each arm's GLOBAL rank uses the distributed exact rank in
    its STATIC-bucket form (functions/ranking.with_global_rank_static
    — integer score bands are monotone in each arm's ordering, so no
    sampling pass and no checkpoint pin), never a single-partition
    window; the fusion is one full-outer join on the document key. The
    doc↔vector identity join is the contract that
    ``embeddings.vec_id`` mirrors ``documents.doc_id`` (TESTDATA.md).
    """
    from ..functions.ranking import with_global_rank_static

    sparse = _bm25_sparse(spark, sf_dir)
    # bucket = negated integer floor of the score: monotone along the
    # DESC ordering, bounded band count — the static rank needs no pin
    s_rank = with_global_rank_static(
        sparse,
        (-F.floor(F.col("bm25"))).cast("long"),
        [F.col("bm25").desc(), F.col("doc_id")],
        "r",
    ).select("doc_id", F.col("r").alias("sparse_rank"))

    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vector(emb)
    dense = (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            cosine_similarity(F.col("embedding"), F.col("q_emb")).alias(
                "cos"
            ),
        )
        .localCheckpoint()  # static rank runs 2 jobs over this arm
    )
    d_rank = with_global_rank_static(
        dense,
        (-F.floor(F.col("cos") * 20)).cast("long"),  # 0.05-wide bands
        [F.col("cos").desc(), F.col("doc_id")],
        "r",
    ).select("doc_id", F.col("r").alias("dense_rank"))

    rr = lambda r: F.coalesce(  # noqa: E731
        F.round(1.0 / (RRF_K + r), 9).cast("decimal(18,9)"),
        F.lit(0).cast("decimal(18,9)"),
    )
    fused = (
        s_rank.join(d_rank, "doc_id", "full_outer")
        .withColumn(
            "rrf", rr(F.col("sparse_rank")) + rr(F.col("dense_rank"))
        )
    )
    return (
        fused.orderBy(F.col("rrf").desc(), "doc_id")
        .limit(RRF_TOP_K)
        .select(
            "doc_id",
            F.col("sparse_rank").cast("long").alias("sparse_rank"),
            F.col("dense_rank").cast("long").alias("dense_rank"),
            F.round(F.col("rrf").cast("double"), 6).alias("rrf_score"),
        )
    )


from .similarity import (  # noqa: E402  (multiprobe shares the RP family)
    _RP_TOPK as MULTIPROBE_TOPK,
    N_PLANES,
    RP_BUCKETS_SQL,
    RP_PROBE_MOD,
    rp_bucket_column,
)

_MP_FLIPS_SQL = ", ".join(
    ["a.bucket"] + [f"xor(a.bucket, {1 << p})" for p in range(N_PLANES)]
)


@query(
    "ann_multiprobe_lsh_topk",
    oracle=f"""
        WITH {RP_BUCKETS_SQL},
        probes AS (
            SELECT a.vec_id AS probe_id, a.embedding AS p_emb,
                   unnest([{_MP_FLIPS_SQL}]) AS pb
            FROM buckets a
            WHERE a.vec_id % {RP_PROBE_MOD} = 0
        ),
        ranked AS (
            SELECT p.probe_id, b.vec_id, b.label,
                   {cosine_similarity_sql('p.p_emb', 'b.embedding')}
                       AS cos_raw,
                   row_number() OVER (
                       PARTITION BY p.probe_id
                       ORDER BY {cosine_similarity_sql('p.p_emb', 'b.embedding')}
                                DESC, b.vec_id
                   ) AS rn
            FROM probes p JOIN buckets b
              ON p.pb = b.bucket AND p.probe_id <> b.vec_id
        )
        SELECT probe_id, vec_id, label, round(cos_raw, 4) AS cos_sim
        FROM ranked WHERE rn <= {MULTIPROBE_TOPK}
    """,
)
def ann_multiprobe_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTIPROBE sign-LSH ANN (Lv et al. 2007 applied to Charikar
    sign hashes): each probe searches its own bucket AND the 8
    Hamming-distance-1 neighbor buckets (one sign bit flipped) — the
    standard recall lever for LSH that costs ~9× candidate volume
    instead of 2× hash tables. Candidates are exact-cosine-ranked,
    top-3 per probe; the probe set and k are IMPORTED from the
    single-bucket ann_rp_lsh_topk so recall stays directly comparable
    by construction.

    Scale: a vector lives in exactly ONE bucket, so the 9 probed
    buckets are disjoint — the probe side explodes 9×, the join stays
    a bucket equi-join (never all-pairs), and the plan shape is
    unchanged from single-probe; at n/256 expected bucket occupancy
    the candidate set is ~9n/256 per probe.
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
    probes = (
        buckets.filter(F.col("vec_id") % RP_PROBE_MOD == 0)
        .select(
            F.col("vec_id").alias("probe_id"),
            F.col("embedding").alias("p_emb"),
            F.explode(
                F.array(
                    F.col("bucket"),
                    *[
                        F.col("bucket").bitwiseXOR(F.lit(1 << p))
                        for p in range(N_PLANES)
                    ],
                )
            ).alias("pb"),
        )
    )
    cos = cosine_similarity(F.col("p_emb"), F.col("embedding"))
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cos_raw").desc(), F.col("vec_id")
    )
    return (
        probes.join(
            buckets,
            (F.col("pb") == F.col("bucket"))
            & (F.col("probe_id") != F.col("vec_id")),
        )
        .select("probe_id", "vec_id", "label", cos.alias("cos_raw"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= MULTIPROBE_TOPK)
        .select(
            "probe_id",
            "vec_id",
            "label",
            F.round("cos_raw", 4).alias("cos_sim"),
        )
    )


@query(
    "embedding_knn_label_confusion",
    oracle=f"""
        WITH {RP_BUCKETS_SQL},
        nn AS (
            SELECT a.label AS label_a, b.label AS label_nn,
                   row_number() OVER (
                       PARTITION BY a.vec_id
                       ORDER BY {cosine_similarity_sql('a.embedding', 'b.embedding')}
                                DESC, b.vec_id
                   ) AS rn
            FROM buckets a JOIN buckets b
              ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
        )
        SELECT label_a, label_nn,
               count(*) AS n_pairs
        FROM nn WHERE rn = 1
        GROUP BY 1, 2
    """,
)
def embedding_knn_label_confusion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Embedding-space label CONFUSION MATRIX: every vector's
    (LSH-bucket-approximate) nearest neighbor votes with its label;
    the (own label × neighbor label) counts are the 1-NN confusion
    matrix — the standard embedding-quality diagnostic (a good space
    concentrates mass on the diagonal; off-diagonal cells name the
    label pairs the encoder confuses, i.e. where semantic dedup and
    IVF cells will bleed). Member of the eval family next to
    ann_ivf_recall_eval and the estimator calibrations.

    Scale: candidate generation is the sign-LSH bucket equi-join
    (never all-pairs; vectors with no same-bucket neighbor abstain —
    the approximation is part of the contract and identical in the
    oracle); the matrix itself is a ≤|labels|² aggregate.
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
    a, b = buckets.alias("a"), buckets.alias("b")
    cos = cosine_similarity(F.col("a.embedding"), F.col("b.embedding"))
    w = Window.partitionBy("a_vec").orderBy(
        F.col("cos_raw").desc(), F.col("b_vec")
    )
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("a_vec"),
            F.col("b.vec_id").alias("b_vec"),
            F.col("a.label").alias("label_a"),
            F.col("b.label").alias("label_nn"),
            cos.alias("cos_raw"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("label_a", "label_nn")
        .agg(F.count("*").alias("n_pairs"))
    )


IVF_SPLIT_VEC = 400  # index trained on vec_id < split; newer = new batch


def _ivf_incremental_oracle() -> str:
    from .similarity import (
        KMEANS_ITERS,
        kmeans_centroid_ctes,
    )

    cos = cosine_similarity_sql("e.v", "c.c")
    ctes = kmeans_centroid_ctes(f"vec_id < {IVF_SPLIT_VEC}")
    return f"""
        WITH {",".join(ctes)},
        newv AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings WHERE vec_id >= {IVF_SPLIT_VEC}
        ),
        aold AS (
            SELECT cell, count(*) AS n_old FROM (
                SELECT e.vec_id, c.cell,
                       row_number() OVER (PARTITION BY e.vec_id
                                          ORDER BY {cos} DESC, c.cell)
                           AS rn
                FROM emb e, c{KMEANS_ITERS} c
            ) WHERE rn = 1 GROUP BY cell
        ),
        anew AS (
            SELECT cell, count(*) AS n_new,
                   CAST(sum(CAST(floor(sim * 1000000 + 0.5) AS BIGINT))
                        AS BIGINT) AS sum_new_sim_e6
            FROM (
                SELECT e.vec_id, c.cell, {cos} AS sim,
                       row_number() OVER (PARTITION BY e.vec_id
                                          ORDER BY {cos} DESC, c.cell)
                           AS rn
                FROM newv e, c{KMEANS_ITERS} c
            ) WHERE rn = 1 GROUP BY cell
        )
        SELECT c.cell,
               CAST(coalesce(o.n_old, 0) AS BIGINT) AS n_old,
               CAST(coalesce(n.n_new, 0) AS BIGINT) AS n_new,
               CAST(coalesce(n.sum_new_sim_e6, 0) AS BIGINT)
                   AS sum_new_sim_e6
        FROM c{KMEANS_ITERS} c
        LEFT JOIN aold o ON o.cell = c.cell
        LEFT JOIN anew n ON n.cell = c.cell
    """


@query("ann_ivf_incremental_assign", oracle=_ivf_incremental_oracle())
def ann_ivf_incremental_assign(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """IVF index MAINTENANCE tick: a new vector batch (vec_id ≥ split)
    is assigned to the FROZEN centroids of the existing index (trained
    on the older half only) — the incremental sibling of
    ann_kmeans_cells, mirroring dedup_incremental_minhash_lsh on the
    dense side. Output per cell: existing occupancy, new-batch
    additions, and the summed assignment similarity of the additions
    (integer 1e-6 units) — the drift report that tells an index
    operator when accumulated new data merits a re-train (falling
    per-cell mean similarity = centroids no longer describe the
    distribution).

    Scale: the tick costs O(|new| · K) — broadcast K·d centroid
    doubles, one argmax pass over the new batch, one ≤K-row aggregate;
    the existing corpus is NOT rescanned for assignment (its occupancy
    aggregate is manifest-grade metadata a real deployment keeps
    incrementally — recomputed here only because the oracle needs the
    same numbers).
    """
    from ..functions.caching import scoped_persist
    from .similarity import lloyd_centroids

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    old = scoped_persist(
        emb.filter(F.col("vec_id") < IVF_SPLIT_VEC).repartition(
            spark.sparkContext.defaultParallelism, "vec_id"
        )
    )
    new = emb.filter(F.col("vec_id") >= IVF_SPLIT_VEC)
    centroids = scoped_persist(lloyd_centroids(old))

    from pyspark.sql import Window as W

    cos = cosine_similarity(F.col("v"), F.col("c"))
    w = W.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("cell"))

    def assign(df):
        return (
            df.crossJoin(F.broadcast(centroids))
            .select("vec_id", "cell", cos.alias("sim"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
        )

    n_old = assign(old).groupBy("cell").agg(F.count("*").alias("n_old"))
    a_new = (
        assign(new)
        .groupBy("cell")
        .agg(
            F.count("*").alias("n_new"),
            F.sum(F.floor(F.col("sim") * 1_000_000 + 0.5).cast("long"))
            .cast("long")
            .alias("sum_new_sim_e6"),
        )
    )
    return (
        centroids.select("cell")
        .join(n_old, "cell", "left")
        .join(a_new, "cell", "left")
        .select(
            "cell",
            F.coalesce("n_old", F.lit(0)).cast("long").alias("n_old"),
            F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new"),
            F.coalesce("sum_new_sim_e6", F.lit(0))
            .cast("long")
            .alias("sum_new_sim_e6"),
        )
    )


NDCG_K = 10
NDCG_N_QUERIES = 20  # vec_id < 20 are the evaluation queries


@query(
    "retrieval_ndcg_label_eval",
    oracle=f"""
        WITH q AS (
            SELECT vec_id AS q_id, embedding AS q_emb, label AS q_label
            FROM embeddings WHERE vec_id < {NDCG_N_QUERIES}
        ),
        ranked AS (
            SELECT q.q_id, q.q_label, e.vec_id, e.label,
                   row_number() OVER (
                       PARTITION BY q.q_id
                       ORDER BY {cosine_similarity_sql('e.embedding', 'q.q_emb')}
                                DESC, e.vec_id
                   ) AS rnk
            FROM embeddings e, q
            WHERE e.vec_id <> q.q_id
        ),
        top AS (
            SELECT q_id, q_label, rnk,
                   CASE WHEN label = q_label THEN 1 ELSE 0 END AS rel
            FROM ranked WHERE rnk <= {NDCG_K}
        ),
        dcg AS (
            SELECT q_id,
                   CAST(sum(rel) AS BIGINT) AS n_relevant_at_k,
                   CAST(coalesce(min(CASE WHEN rel = 1 THEN rnk END), 0)
                        AS BIGINT) AS first_rel_rank,
                   sum(CAST(round(rel / log2(rnk + 1.0), 9)
                            AS DECIMAL(18,9))) AS dcg_v
            FROM top GROUP BY q_id
        ),
        nrel AS (
            SELECT q.q_id, count(*) AS n_rel_total
            FROM embeddings e, q
            WHERE e.vec_id <> q.q_id AND e.label = q.q_label
            GROUP BY q.q_id
        ),
        idcg AS (
            SELECT n.q_id,
                   sum(CAST(round(1.0 / log2(i + 1.0), 9)
                            AS DECIMAL(18,9))) AS idcg_v
            FROM nrel n,
                 UNNEST(range(1, {NDCG_K} + 1)) AS t(i)
            WHERE i <= least(n.n_rel_total, {NDCG_K})
            GROUP BY n.q_id
        )
        SELECT d.q_id, d.n_relevant_at_k, d.first_rel_rank,
               CAST(floor(CAST(d.dcg_v AS DOUBLE)
                          / CAST(i.idcg_v AS DOUBLE) * 10000 + 0.5)
                    AS BIGINT) AS ndcg_bp
        FROM dcg d JOIN idcg i ON i.q_id = d.q_id
    """,
)
def retrieval_ndcg_label_eval(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Ranking-quality evaluation for the dense retriever: NDCG@10 and
    first-relevant-rank per query, with label agreement as the
    relevance oracle — the eval-family member (recall@k, estimator
    calibration, label confusion) that grades the ORDER of results,
    not just their membership. Falling NDCG with stable recall is the
    signature of a miscalibrated scoring stage (e.g. quantization
    noise reordering near-ties).

    Cross-engine float discipline: per-rank discounted gains
    (rel/log₂(rank+1)) are functions of INTEGER rank — rounded to 9
    decimals and DECIMAL-summed, so DCG and IDCG are exact; only the
    final ratio divides two identically-derived doubles. MRR's float
    is avoided entirely by emitting the first relevant RANK (integer;
    0 = none in the top K).

    Scale: same broadcast-queries × corpus shape as the brute-force
    top-k (the eval is definitionally exhaustive — it grades the
    approximate tiers against the truth, so it runs at eval-set size,
    not corpus size).
    """
    from pyspark.sql import Window as W

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < NDCG_N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("label").alias("q_label"),
    )
    cos = cosine_similarity(F.col("embedding"), F.col("q_emb"))
    w = W.partitionBy("q_id").orderBy(F.col("c").desc(), F.col("vec_id"))
    top = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "q_label",
            "vec_id",
            "label",
            cos.alias("c"),
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= NDCG_K)
        .withColumn(
            "rel",
            F.when(F.col("label") == F.col("q_label"), 1).otherwise(0),
        )
    )
    gain = F.round(
        F.col("rel") / F.log2(F.col("rnk") + 1.0), 9
    ).cast("decimal(18,9)")
    dcg = top.groupBy("q_id").agg(
        F.sum("rel").cast("long").alias("n_relevant_at_k"),
        F.coalesce(
            F.min(F.when(F.col("rel") == 1, F.col("rnk"))), F.lit(0)
        )
        .cast("long")
        .alias("first_rel_rank"),
        F.sum(gain).alias("dcg_v"),
    )
    nrel = (
        emb.crossJoin(F.broadcast(q))
        .filter(
            (F.col("vec_id") != F.col("q_id"))
            & (F.col("label") == F.col("q_label"))
        )
        .groupBy("q_id")
        .agg(F.count("*").alias("n_rel_total"))
    )
    igain = F.round(1.0 / F.log2(F.col("i") + 1.0), 9).cast(
        "decimal(18,9)"
    )
    idcg = (
        nrel.select(
            "q_id",
            F.explode(
                F.sequence(
                    F.lit(1), F.least(F.col("n_rel_total"), F.lit(NDCG_K))
                )
            ).alias("i"),
        )
        .groupBy("q_id")
        .agg(F.sum(igain).alias("idcg_v"))
    )
    return dcg.join(idcg, "q_id").select(
        "q_id",
        "n_relevant_at_k",
        "first_rel_rank",
        F.floor(
            F.col("dcg_v").cast("double")
            / F.col("idcg_v").cast("double")
            * 10000
            + 0.5
        )
        .cast("long")
        .alias("ndcg_bp"),
    )


CF_TOP_K = 5
CF_SCALE = 100_000_000  # cosine² in 1e-8 units (integer-exact ranking)


@query(
    "recsys_item_item_cosine_topk",
    oracle=f"""
        WITH baskets AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ),
        deg AS (
            SELECT l_partkey, count(*) AS n FROM baskets GROUP BY 1
        ),
        cooc AS (
            SELECT a.l_partkey AS i, b.l_partkey AS j, count(*) AS c
            FROM baskets a
            JOIN baskets b ON a.l_orderkey = b.l_orderkey
                          AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
        ),
        sym AS (
            SELECT i, j, c FROM cooc
            UNION ALL
            SELECT j, i, c FROM cooc
        ),
        scored AS (
            SELECT s.i AS item_i, s.j AS item_j, s.c AS cooc,
                   di.n AS n_i, dj.n AS n_j,
                   (s.c * s.c * {CF_SCALE}) // (di.n * dj.n) AS score_e8
            FROM sym s
            JOIN deg di ON s.i = di.l_partkey
            JOIN deg dj ON s.j = dj.l_partkey
        ),
        ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY item_i
                ORDER BY score_e8 DESC, item_j ASC
            ) AS rnk
            FROM scored
        )
        SELECT item_i, item_j, cooc, n_i, n_j, score_e8,
               CAST(rnk AS INTEGER) AS rnk
        FROM ranked WHERE rnk <= {CF_TOP_K}
    """,
)
def recsys_item_item_cosine_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Item-item collaborative filtering: top-k most-similar parts per
    part by co-purchase cosine — cos(i,j) = C(i,j) / √(n_i·n_j) over
    the binary order×part basket matrix (the classic Amazon item-item
    recommender; market_basket_lift_pairs ranks PAIRS by lift, this
    produces the per-item RECOMMENDATION LIST, a different contract).

    Cross-engine exactness: rank by cosine² in integer 1e-8 units —
    (C²·1e8) div (n_i·n_j) — monotone in cosine, all-BIGINT in both
    engines (no float division anywhere); ties break on item id.

    Scale: co-occurrence via basket self-join on the order key —
    fan-out bounded by order SIZE (≤ lines-per-order², never n²);
    degree join is broadcast-size at any SF (one row per item); the
    per-item window partitions by item (no global sort). A viral item
    in every basket would skew the self-join — the standard fix is a
    basket-size cap (cap each order's item list, as source_cap_sample
    does for sources) before pairing; C²·1e8 overflows int64 only past
    C ≈ 9.6e4 co-purchases, where DECIMAL(38) arithmetic swaps in.
    """
    baskets = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    return _cf_topk_from_baskets(baskets)


def _cf_topk_from_baskets(baskets: DataFrame) -> DataFrame:
    """Item-item cosine² top-k from a (l_orderkey, l_partkey) basket
    relation — the recsys_item_item_cosine_topk kernel, factored so the
    hold-out evaluation can train it on a TIME-SPLIT subset."""
    deg = baskets.groupBy("l_partkey").agg(F.count("*").alias("n"))
    a, b = baskets.alias("a"), baskets.alias("b")
    cooc = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("i"), F.col("b.l_partkey").alias("j")
        )
        .agg(F.count("*").alias("c"))
    )
    sym = cooc.union(cooc.select("j", "i", "c"))
    scored = (
        sym.join(
            F.broadcast(deg.withColumnRenamed("l_partkey", "i")).withColumnRenamed(
                "n", "n_i"
            ),
            "i",
        )
        .join(
            F.broadcast(deg.withColumnRenamed("l_partkey", "j")).withColumnRenamed(
                "n", "n_j"
            ),
            "j",
        )
        .select(
            F.col("i").alias("item_i"),
            F.col("j").alias("item_j"),
            F.col("c").alias("cooc"),
            "n_i",
            "n_j",
            F.expr(f"(c * c * {CF_SCALE}L) div (n_i * n_j)").alias(
                "score_e8"
            ),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("item_i").orderBy(
        F.col("score_e8").desc(), F.col("item_j").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= CF_TOP_K)
        .select(
            "item_i", "item_j", "cooc", "n_i", "n_j", "score_e8",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


MRL_DIMS = (8, 16, 32)  # matryoshka prefix widths (full = 64)
MRL_QUERIES = 20
MRL_K = 10


def _mrl_oracle() -> str:
    arms = []
    for d in MRL_DIMS:
        arms.append(f"""
        SELECT {d} AS dim, count(iv.vec_id) AS n_hits,
               CAST(floor(count(iv.vec_id)
                    / ({MRL_K}.0 * {MRL_QUERIES}) * 10000 + 0.5)
                    AS BIGINT) AS recall_bp
        FROM (SELECT * FROM exact WHERE rn <= {MRL_K}) ex
        LEFT JOIN (
            SELECT q_id, vec_id FROM (
                SELECT q.q_id, e.vec_id,
                       row_number() OVER (
                           PARTITION BY q.q_id
                           ORDER BY {cosine_similarity_sql(f'e.embedding[1:{d}]', f'q.q_emb[1:{d}]')} DESC,
                                    e.vec_id) AS rn
                FROM embeddings e, q WHERE e.vec_id <> q.q_id
            ) WHERE rn <= {MRL_K}
        ) iv ON iv.q_id = ex.q_id AND iv.vec_id = ex.vec_id""")
    return f"""
        WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
                   FROM embeddings WHERE vec_id < {MRL_QUERIES}),
        exact AS (
            SELECT q.q_id, e.vec_id,
                   row_number() OVER (
                       PARTITION BY q.q_id
                       ORDER BY {cosine_similarity_sql('e.embedding', 'q.q_emb')} DESC,
                                e.vec_id) AS rn
            FROM embeddings e, q WHERE e.vec_id <> q.q_id
        )
        {" UNION ALL ".join(arms)}
    """


@query("ann_matryoshka_truncation_eval", oracle=_mrl_oracle())
def ann_matryoshka_truncation_eval(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Matryoshka (MRL) truncation sweep: recall@{MRL_K} of
    prefix-truncated embeddings (8/16/32 of 64 dims) against the
    full-dimension exact top-k — the eval that decides how far a
    matryoshka-trained embedding column can be truncated for cheap
    first-stage retrieval before recall collapses (the modern
    two-stage recipe: truncated prefix scan → full-dim rerank, exactly
    the SQ8+rerank shape with dimensionality instead of precision).

    Shares the calibration-family contract (ivf recall, minhash
    estimator): approximations must ship with their measured error.
    Rankings order by IEEE-identical cosine doubles with id
    tie-breaks; recall is exact integer basis points.

    Scale: each arm is one broadcast-queries brute-force pass (the
    ann_batch_topk shape) over a PREFIX of the vector column — array
    slicing is row-local and the narrower dot products are
    proportionally cheaper; the ground-truth pass is shared.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < MRL_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    from pyspark.sql.window import Window

    pairs = emb.crossJoin(F.broadcast(q)).filter(
        F.col("vec_id") != F.col("q_id")
    )
    w = Window.partitionBy("q_id")

    def topk(score_col):
        return (
            pairs.select(
                "q_id",
                "vec_id",
                F.row_number()
                .over(w.orderBy(score_col.desc(), F.col("vec_id")))
                .alias("rn"),
            )
            .filter(F.col("rn") <= MRL_K)
            .drop("rn")
        )

    exact = topk(cosine_similarity(F.col("embedding"), F.col("q_emb")))
    from ..functions.caching import scoped_persist

    exact = scoped_persist(exact)
    arms = []
    for d in MRL_DIMS:
        trunc = topk(
            cosine_similarity(
                F.slice(F.col("embedding"), 1, d),
                F.slice(F.col("q_emb"), 1, d),
            )
        ).withColumnRenamed("vec_id", "t_vec")
        hits = exact.join(
            trunc,
            (exact.q_id == trunc.q_id) & (exact.vec_id == trunc.t_vec),
            "left",
        ).agg(F.count("t_vec").alias("n_hits"))
        arms.append(
            hits.select(
                F.lit(d).alias("dim"),
                "n_hits",
                F.floor(
                    F.col("n_hits") / (MRL_K * 1.0 * MRL_QUERIES) * 10000
                    + 0.5
                )
                .cast("long")
                .alias("recall_bp"),
            )
        )
    out = arms[0]
    for a in arms[1:]:
        out = out.unionByName(a)
    return out


MMR_POOL = 20  # candidate pool (dense top-N)
MMR_K = 10  # diversified results
MMR_LAMBDA = 0.7  # relevance vs diversity trade


def _mmr_oracle() -> str:
    from .similarity import QUERY_VEC_ID

    sel_union = lambda i: " UNION ALL ".join(  # noqa: E731
        f"SELECT vec_id FROM s{j}" for j in range(1, i)
    )
    steps = []
    for i in range(2, MMR_K + 1):
        steps.append(f"""
        s{i} AS MATERIALIZED (
            SELECT c.vec_id FROM qs c
            JOIN (
                SELECT s.va AS vec_id, max(s.s) AS ms
                FROM sims s
                WHERE s.vb IN ({sel_union(i)})
                GROUP BY s.va
            ) m ON m.vec_id = c.vec_id
            WHERE c.vec_id NOT IN ({sel_union(i)})
            ORDER BY {MMR_LAMBDA} * c.q - {1 - MMR_LAMBDA:.1f} * m.ms
                     DESC, c.vec_id
            LIMIT 1
        )""")
    finals = " UNION ALL ".join(
        f"SELECT {i} AS rnk, vec_id FROM s{i}"
        for i in range(1, MMR_K + 1)
    )
    return f"""
        WITH q AS (SELECT embedding AS q_emb FROM embeddings
                   WHERE vec_id = {QUERY_VEC_ID}),
        cand AS MATERIALIZED (
            SELECT e.vec_id, e.embedding,
                   {cosine_similarity_sql('e.embedding', 'q.q_emb')} AS q
            FROM embeddings e, q
            WHERE e.vec_id <> {QUERY_VEC_ID}
            ORDER BY q DESC, e.vec_id
            LIMIT {MMR_POOL}
        ),
        qs AS MATERIALIZED (SELECT vec_id, q FROM cand),
        sims AS MATERIALIZED (
            SELECT a.vec_id AS va, b.vec_id AS vb,
                   {cosine_similarity_sql('a.embedding', 'b.embedding')}
                       AS s
            FROM cand a, cand b WHERE a.vec_id <> b.vec_id
        ),
        s1 AS MATERIALIZED (SELECT vec_id FROM qs
                            ORDER BY q DESC, vec_id LIMIT 1),
        {",".join(steps)}
        SELECT f.rnk, f.vec_id,
               CAST(floor(qs.q * 1000000 + 0.5) AS BIGINT) AS q_sim_e6
        FROM ({finals}) f JOIN qs ON f.vec_id = qs.vec_id
    """


@query("retrieval_mmr_diversified_topk", oracle=_mmr_oracle())
def retrieval_mmr_diversified_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    '98): the dense top-{MMR_POOL} pool is greedily re-ordered by
    λ·sim(query, d) − (1−λ)·max sim(d, selected) — the diversification
    pass RAG retrievers run so the context window isn't ten
    paraphrases of one passage. Deterministic: ties break on vec_id,
    all similarities are the engine-computed cosine doubles.

    Scale contract: the DISTRIBUTED part is the candidate generation
    (brute-force/IVF top-{MMR_POOL}, the existing ANN machinery); the
    greedy runs on the POOL ONLY — {MMR_POOL} candidates and their
    {MMR_POOL}² sim matrix, bounded by the re-rank budget, never by
    corpus size (the two-stage retrieve-then-rerank shape, like
    ann_sq_rerank_topk). The oracle unrolls the same {MMR_K} greedy
    steps as generated CTEs.
    """
    from ..functions.vectors import cosine_similarity
    from .similarity import QUERY_VEC_ID, _query_vector

    emb = load_table(spark, sf_dir, "embeddings")
    q = _query_vector(emb)
    cand = (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "embedding",
            cosine_similarity(F.col("embedding"), F.col("q_emb")).alias(
                "q"
            ),
        )
        .orderBy(F.col("q").desc(), "vec_id")
        .limit(MMR_POOL)
    )
    rows = cand.collect()  # bounded: the re-rank pool, never the corpus
    a, b = cand.alias("a"), cand.alias("b")
    sims = {
        (r.va, r.vb): r.s
        for r in a.join(b, F.col("a.vec_id") != F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("va"),
            F.col("b.vec_id").alias("vb"),
            cosine_similarity(
                F.col("a.embedding"), F.col("b.embedding")
            ).alias("s"),
        )
        .collect()
    }
    qs = {r.vec_id: r.q for r in rows}
    remaining = sorted(qs)
    selected: list[int] = []
    for _ in range(MMR_K):
        if not selected:
            # argmax relevance with ascending-id tie-break
            best = sorted(remaining, key=lambda v: (-qs[v], v))[0]
        else:
            best = sorted(
                remaining,
                key=lambda v: (
                    -(
                        MMR_LAMBDA * qs[v]
                        - (1 - MMR_LAMBDA)
                        * max(sims[(v, s)] for s in selected)
                    ),
                    v,
                ),
            )[0]
        selected.append(best)
        remaining.remove(best)
    import math as _math

    return spark.createDataFrame(
        [
            (i + 1, v, _math.floor(qs[v] * 1000000 + 0.5))
            for i, v in enumerate(selected)
        ],
        "rnk int, vec_id long, q_sim_e6 long",
    )


PRF_FEEDBACK_DOCS = 3
PRF_EXPANSION_TERMS = 2
PRF_EXP_WEIGHT = "0.5"  # expansion-term score weight
PRF_TOP_K = 10


@query(
    "bm25_prf_expansion_topk",
    oracle=f"""
        WITH tok AS MATERIALIZED (
            SELECT doc_id, unnest(string_split(text, ' ')) AS word
            FROM documents WHERE doc_id <> {QUERY_VEC_ID}
        ),
        tok2 AS MATERIALIZED (
            SELECT doc_id, word FROM tok WHERE word <> ''
        ),
        dl_t AS MATERIALIZED (
            SELECT doc_id, count(*) AS dl FROM tok2 GROUP BY 1
        ),
        corpus AS MATERIALIZED (
            SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS total
            FROM dl_t
        ),
        tf_t AS (
            SELECT doc_id, word, count(*) AS tf
            FROM tok2 WHERE word IN ({_TERMS_SQL}) GROUP BY 1, 2
        ),
        df_t AS (
            SELECT word, count(DISTINCT doc_id) AS df FROM tf_t GROUP BY 1
        ),
        sparse AS MATERIALIZED (
            SELECT t.doc_id,
                   sum(CAST({_BM25_TERM_SQL} AS DECIMAL(18,9))) AS bm25
            FROM tf_t t
            JOIN df_t d USING (word)
            JOIN dl_t l USING (doc_id), corpus
            GROUP BY 1
        ),
        fb AS MATERIALIZED (
            SELECT doc_id FROM sparse
            ORDER BY bm25 DESC, doc_id LIMIT {PRF_FEEDBACK_DOCS}
        ),
        cand AS MATERIALIZED (
            SELECT t.word, CAST(sum(1) AS BIGINT) AS fb_tf
            FROM tok2 t JOIN fb ON t.doc_id = fb.doc_id
            WHERE t.word NOT IN ({_TERMS_SQL})
            GROUP BY 1
        ),
        gdf AS MATERIALIZED (
            SELECT t.word, count(DISTINCT t.doc_id) AS df
            FROM tok2 t JOIN cand c ON t.word = c.word
            GROUP BY 1
        ),
        exp_terms AS MATERIALIZED (
            SELECT c.word, g.df
            FROM cand c JOIN gdf g ON c.word = g.word
            ORDER BY c.fb_tf * 1000000 // g.df DESC, c.word
            LIMIT {PRF_EXPANSION_TERMS}
        ),
        etf AS (
            SELECT t.doc_id, t.word, count(*) AS tf
            FROM tok2 t JOIN exp_terms e ON t.word = e.word
            GROUP BY 1, 2
        ),
        exp_score AS (
            SELECT t.doc_id,
                   sum(CAST(round({PRF_EXP_WEIGHT}::DOUBLE
                       * {_BM25_TERM_SQL}, 9)
                       AS DECIMAL(18,9))) AS exp_bm25
            FROM etf t
            JOIN exp_terms d ON t.word = d.word
            JOIN dl_t l USING (doc_id), corpus
            GROUP BY 1
        )
        SELECT coalesce(s.doc_id, e.doc_id) AS doc_id,
               round(CAST(coalesce(s.bm25, 0)
                          + coalesce(e.exp_bm25, 0) AS DOUBLE), 6)
                   AS prf_score
        FROM sparse s FULL OUTER JOIN exp_score e
          ON s.doc_id = e.doc_id
        ORDER BY coalesce(s.bm25, 0) + coalesce(e.exp_bm25, 0) DESC,
                 doc_id
        LIMIT {PRF_TOP_K}
    """,
)
def bm25_prf_expansion_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pseudo-relevance feedback (Rocchio/RM3-lite): run the fixed
    BM25 query, take the top-{PRF_FEEDBACK_DOCS} documents as assumed-
    relevant, extract the {PRF_EXPANSION_TERMS} most distinctive new
    terms (feedback tf × 1e6 div corpus df — exact integer ranking),
    and re-score the corpus with the expanded query (expansion terms
    at weight {PRF_EXP_WEIGHT}) — the classic recall-rescue move when
    the literal query terms miss relevant vocabulary. Completes the
    retrieval stack: sparse (BM25) + dense (ANN) + fusion (RRF) +
    diversification (MMR) + expansion (PRF).

    Cross-engine: both scoring passes use the shared _BM25_TERM_SQL
    round9+DECIMAL discipline; expansion selection is integer
    arithmetic with term-string tie-breaks; final scores round to 6.

    Scale: two passes of the BM25 shape (inverted-index access =
    pre-aggregation filter on the term set; the expansion term set is
    {PRF_EXPANSION_TERMS} terms discovered from {PRF_FEEDBACK_DOCS}
    docs — feedback-sized, never corpus-sized); candidate-term df
    lookup touches only words present in the feedback docs.
    """
    from ..functions.caching import scoped_persist

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") != QUERY_VEC_ID
    )
    tok2 = scoped_persist(
        docs.select(
            "doc_id", F.explode(F.split("text", " ")).alias("word")
        ).filter(F.col("word") != "")
    )
    dl = scoped_persist(tok2.groupBy("doc_id").agg(F.count("*").alias("dl")))
    corpus = dl.agg(
        F.count("*").alias("n"), F.sum("dl").cast("long").alias("total")
    ).first()
    n, total = int(corpus["n"]), int(corpus["total"])

    def bm25_scores(term_df: DataFrame, weight: float) -> DataFrame:
        """(doc_id, score DECIMAL) for the terms in term_df (word, df)."""
        tf = (
            tok2.join(F.broadcast(term_df.select("word")), "word")
            .groupBy("doc_id", "word")
            .agg(F.count("*").alias("tf"))
        )
        term_score = F.round(
            F.lit(weight)
            * F.log(
                1 + (F.lit(n) - F.col("df") + 0.5) / (F.col("df") + 0.5)
            )
            * (F.col("tf") * (1 + BM25_K1))
            / (
                F.col("tf")
                + BM25_K1
                * (
                    (1 - BM25_B)
                    + BM25_B * (F.col("dl") * F.lit(n)) / F.lit(total)
                )
            ),
            9,
        ).cast("decimal(18,9)")
        return (
            tf.join(F.broadcast(term_df), "word")
            .join(dl, "doc_id")
            .groupBy("doc_id")
            .agg(F.sum(term_score).alias("score"))
        )

    orig_terms = tok2.filter(
        F.col("word").isin(*BM25_TERMS)
    ).groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
    sparse = scoped_persist(bm25_scores(orig_terms, 1.0))
    fb = (
        sparse.orderBy(F.col("score").desc(), "doc_id")
        .limit(PRF_FEEDBACK_DOCS)
        .select("doc_id")
    )
    cand = (
        tok2.join(F.broadcast(fb), "doc_id")
        .filter(~F.col("word").isin(*BM25_TERMS))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("fb_tf"))
    )
    gdf = (
        tok2.join(F.broadcast(cand.select("word")), "word")
        .groupBy("word")
        .agg(F.countDistinct("doc_id").alias("df"))
    )
    exp_terms = (
        cand.join(gdf, "word")
        .orderBy(
            F.expr("fb_tf * 1000000 div df").desc(), "word"
        )
        .limit(PRF_EXPANSION_TERMS)
        .select("word", "df")
    )
    exp_score = bm25_scores(exp_terms, float(PRF_EXP_WEIGHT))
    fused = sparse.withColumnRenamed("score", "bm25").join(
        exp_score.withColumnRenamed("score", "exp_bm25"),
        "doc_id",
        "full_outer",
    )
    tot = F.coalesce(F.col("bm25"), F.lit(0).cast("decimal(18,9)")) + \
        F.coalesce(F.col("exp_bm25"), F.lit(0).cast("decimal(18,9)"))
    return (
        fused.select("doc_id", tot.alias("t"))
        .orderBy(F.col("t").desc(), "doc_id")
        .limit(PRF_TOP_K)
        .select(
            "doc_id",
            F.round(F.col("t").cast("double"), 6).alias("prf_score"),
        )
    )


LMD_MU = 2000  # Dirichlet smoothing mass (the Lucene default)


@query(
    "lm_dirichlet_retrieval_topk",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS word
            FROM documents WHERE doc_id <> {QUERY_VEC_ID}
        ),
        tok2 AS MATERIALIZED (
            SELECT doc_id, word FROM tok WHERE word <> ''
        ),
        dl_t AS MATERIALIZED (
            SELECT doc_id, count(*) AS dl FROM tok2 GROUP BY 1
        ),
        corpus AS (
            SELECT CAST(sum(dl) AS BIGINT) AS total FROM dl_t
        ),
        ctf AS (
            SELECT word, CAST(count(*) AS BIGINT) AS cf
            FROM tok2 WHERE word IN ({_TERMS_SQL}) GROUP BY 1
        ),
        tf_t AS (
            SELECT doc_id, word, count(*) AS tf
            FROM tok2 WHERE word IN ({_TERMS_SQL}) GROUP BY 1, 2
        ),
        scored AS (
            SELECT l.doc_id,
                   sum(CAST(round(ln(
                       (coalesce(t.tf, 0) + {LMD_MU}.0
                        * (c.cf / CAST(co.total AS DOUBLE)))
                       / (l.dl + {LMD_MU}.0)), 9)
                       AS DECIMAL(18,9))) AS ql
            FROM dl_t l
            CROSS JOIN ctf c
            CROSS JOIN corpus co
            LEFT JOIN tf_t t ON t.doc_id = l.doc_id AND t.word = c.word
            GROUP BY 1
        )
        SELECT doc_id, round(CAST(ql AS DOUBLE), 6) AS ql_score
        FROM scored
        ORDER BY ql DESC, doc_id
        LIMIT {BM25_TOP_K}
    """,
)
def lm_dirichlet_retrieval_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Query-likelihood retrieval with Dirichlet smoothing (μ=
    {LMD_MU}, the Lucene LMDirichletSimilarity default) — the language-
    modeling scorer next to BM25: each document is scored by the log
    probability its smoothed unigram LM assigns the query, Σ_w log((tf
    + μ·P_corpus(w)) / (dl + μ)). Unlike BM25, ABSENT query terms
    still contribute (the smoothed background mass), so every document
    is scored — the grid is doc × query-term with a LEFT join on tf.

    Per-term log-probs round9+DECIMAL-summed; corpus term frequencies
    and doc lengths are exact integers; same fixed query terms as the
    BM25 arm so the two scorers are directly comparable.

    Scale: the doc×term grid is |docs|×3 rows (the query's terms, not
    the vocabulary) with the term stats broadcast; one keyed sum; the
    top-k plans as TakeOrdered.
    """
    from ..functions.caching import scoped_persist

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") != QUERY_VEC_ID
    )
    tok2 = scoped_persist(
        docs.select(
            "doc_id", F.explode(F.split("text", " ")).alias("word")
        ).filter(F.col("word") != "")
    )
    dl = scoped_persist(tok2.groupBy("doc_id").agg(F.count("*").alias("dl")))
    total = int(dl.agg(F.sum("dl")).first()[0])
    qt = tok2.filter(F.col("word").isin(*BM25_TERMS))
    ctf = qt.groupBy("word").agg(F.count("*").cast("long").alias("cf"))
    tf = qt.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    grid = (
        dl.crossJoin(F.broadcast(ctf))
        .join(F.broadcast(tf), ["doc_id", "word"], "left")
        .select(
            "doc_id",
            F.round(
                F.log(
                    (
                        F.coalesce(F.col("tf"), F.lit(0))
                        + float(LMD_MU)
                        * (F.col("cf") / F.lit(float(total)))
                    )
                    / (F.col("dl") + float(LMD_MU))
                ),
                9,
            )
            .cast("decimal(18,9)")
            .alias("lp"),
        )
    )
    scored = grid.groupBy("doc_id").agg(F.sum("lp").alias("ql"))
    return (
        scored.orderBy(F.col("ql").desc(), "doc_id")
        .limit(BM25_TOP_K)
        .select(
            "doc_id",
            F.round(F.col("ql").cast("double"), 6).alias("ql_score"),
        )
    )


@query(
    "retrieval_scorer_rank_agreement",
    oracle=f"""
        WITH {_BM25_CTE},
        b_rank AS (
            SELECT doc_id,
                   row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rb
            FROM sparse
        ),
        tok2q AS (SELECT doc_id, word FROM tok WHERE word <> ''),
        dlq AS (SELECT doc_id, count(*) AS dl FROM tok2q GROUP BY 1),
        corpus2 AS (SELECT CAST(sum(dl) AS BIGINT) AS total FROM dlq),
        ctf AS (
            SELECT word, CAST(count(*) AS BIGINT) AS cf
            FROM tok2q WHERE word IN ({_TERMS_SQL}) GROUP BY 1
        ),
        tfq AS (
            SELECT doc_id, word, count(*) AS tf
            FROM tok2q WHERE word IN ({_TERMS_SQL}) GROUP BY 1, 2
        ),
        ql AS (
            SELECT l.doc_id,
                   sum(CAST(round(ln(
                       (coalesce(t.tf, 0) + {LMD_MU}.0
                        * (c.cf / CAST(co.total AS DOUBLE)))
                       / (l.dl + {LMD_MU}.0)), 9)
                       AS DECIMAL(18,9))) AS s
            FROM dlq l CROSS JOIN ctf c CROSS JOIN corpus2 co
            LEFT JOIN tfq t ON t.doc_id = l.doc_id AND t.word = c.word
            GROUP BY 1
        ),
        q_rank AS (
            SELECT doc_id,
                   row_number() OVER (ORDER BY s DESC, doc_id) AS rq
            FROM ql
        ),
        common AS (
            SELECT b.doc_id, b.rb, q.rq
            FROM (SELECT * FROM b_rank WHERE rb <= {BM25_TOP_K}) b
            JOIN (SELECT * FROM q_rank WHERE rq <= {BM25_TOP_K}) q
              ON b.doc_id = q.doc_id
        ),
        pairs AS (
            SELECT CASE WHEN (a.rb - b.rb) * (a.rq - b.rq) > 0
                        THEN 1 ELSE 0 END AS conc
            FROM common a JOIN common b ON a.doc_id < b.doc_id
        )
        SELECT count(*) AS n_pairs,
               CAST(sum(conc) AS BIGINT) AS concordant,
               (2 * CAST(sum(conc) AS BIGINT) - count(*)) * 10000
                   // count(*) AS kendall_tau_bp
        FROM pairs
    """,
)
def retrieval_scorer_rank_agreement(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Kendall-τ rank agreement between the two sparse scorers (BM25
    vs query-likelihood Dirichlet) over BM25's top-{BM25_TOP_K}: the
    eval that says whether swapping similarity functions would
    actually reorder results — low τ means the choice matters and a
    fusion (RRF) earns its keep; high τ means pick the cheaper one.
    Concordant-pair counting on exact integer ranks; τ in exact
    integer bp ((2C − n) div n).

    Scale: both scorers are the query-term-filtered shapes; the pair
    comparison is top-k × top-k (budget-bounded, ≤190 pairs).
    """
    from pyspark.sql.window import Window as _W

    # ranking windows run over the two TOP-K results (k rows — bounded
    # by the retrieval budget, never by the corpus)
    bm = bm25_sparse_retrieval_topk(spark, sf_dir).select(
        "doc_id",
        F.row_number()
        .over(_W.orderBy(F.col("bm25_score").desc(), "doc_id"))
        .alias("rb"),
    )
    qlr = lm_dirichlet_retrieval_topk(spark, sf_dir).select(
        "doc_id",
        F.row_number()
        .over(_W.orderBy(F.col("ql_score").desc(), "doc_id"))
        .alias("rq"),
    )
    common = bm.join(qlr, "doc_id")
    a, b = common.alias("a"), common.alias("b")
    conc = F.when(
        (F.col("a.rb") - F.col("b.rb")) * (F.col("a.rq") - F.col("b.rq"))
        > 0,
        1,
    ).otherwise(0)
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum(conc).cast("long").alias("concordant"),
        )
        .select(
            "n_pairs",
            "concordant",
            F.expr(
                "(2 * concordant - n_pairs) * 10000 div n_pairs"
            ).alias("kendall_tau_bp"),
        )
    )


def _cf_holdout_oracle() -> str:
    return f"""
        WITH split AS (
            SELECT o_orderkey, o_custkey,
                   row_number() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate DESC, o_orderkey DESC
                   ) AS rn,
                   count(*) OVER (PARTITION BY o_custkey) AS n_orders
            FROM orders
        ),
        train_b AS (
            SELECT DISTINCT l.l_orderkey, l.l_partkey
            FROM lineitem l JOIN split s ON l.l_orderkey = s.o_orderkey
            WHERE s.rn > 1
        ),
        deg AS (
            SELECT l_partkey, count(*) AS n FROM train_b GROUP BY 1
        ),
        cooc AS (
            SELECT a.l_partkey AS i, b.l_partkey AS j, count(*) AS c
            FROM train_b a
            JOIN train_b b ON a.l_orderkey = b.l_orderkey
                          AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
        ),
        sym AS (
            SELECT i, j, c FROM cooc
            UNION ALL SELECT j, i, c FROM cooc
        ),
        topk AS (
            SELECT item_i, item_j FROM (
                SELECT s.i AS item_i, s.j AS item_j,
                       row_number() OVER (
                           PARTITION BY s.i
                           ORDER BY (s.c * s.c * {CF_SCALE})
                                    // (di.n * dj.n) DESC, s.j ASC
                       ) AS rnk
                FROM sym s
                JOIN deg di ON s.i = di.l_partkey
                JOIN deg dj ON s.j = dj.l_partkey
            ) WHERE rnk <= {CF_TOP_K}
        ),
        profile AS (
            SELECT DISTINCT s.o_custkey AS c, l.l_partkey AS i
            FROM lineitem l JOIN split s ON l.l_orderkey = s.o_orderkey
            WHERE s.rn > 1
        ),
        recs AS (
            SELECT DISTINCT p.c, t.item_j AS j
            FROM profile p JOIN topk t ON p.i = t.item_i
            WHERE NOT EXISTS (
                SELECT 1 FROM profile q
                WHERE q.c = p.c AND q.i = t.item_j
            )
        ),
        test_items AS (
            SELECT DISTINCT s.o_custkey AS c, l.l_partkey AS p
            FROM lineitem l JOIN split s ON l.l_orderkey = s.o_orderkey
            WHERE s.rn = 1 AND s.n_orders >= 2
        ),
        eval_users AS (SELECT DISTINCT c FROM test_items),
        hits AS (
            SELECT DISTINCT t.c
            FROM test_items t JOIN recs r ON t.c = r.c AND t.p = r.j
        )
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM eval_users)
                   AS n_eval_users,
               (SELECT CAST(count(*) AS BIGINT) FROM hits) AS n_hits,
               (SELECT count(*) FROM hits) * 10000
                   // (SELECT count(*) FROM eval_users) AS hitrate_bp
    """


@query("recsys_cf_holdout_hitrate", oracle=_cf_holdout_oracle())
def recsys_cf_holdout_hitrate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """End-to-end recommender evaluation: hold out each customer's LAST
    order (leave-one-basket-out), train the item-item CF index on the
    remaining orders only, recommend the union of each profile item's
    top-k neighbors (minus already-bought items), and score hit-rate —
    the share of held-out customers whose next basket contains at least
    one recommended item. The CF query proves the index computes; THIS
    proves it predicts — the difference between having a recommender
    and having evaluated one (same estimator-audit doctrine as
    ann_ivf_recall_eval / dedup_minhash_estimator_calibration).

    Leakage discipline: degrees, co-occurrences and profiles all come
    from TRAIN baskets only; the held-out basket is touched exactly
    once, by the hit test (the dedup-aware-split doctrine applied to
    recsys).

    Scale: the split is one per-customer window (keyed, no global
    sort); train co-occurrence fan-out stays bounded by basket size;
    recommendation is profile⋈topk (both keyed); the anti-join removes
    already-bought items; the hit test is one equi-join on
    (customer, item). All shuffles keyed — nothing global.
    """
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    wsplit = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    split = orders.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(wsplit).alias("rn"),
        F.count("*")
        .over(Window.partitionBy("o_custkey"))
        .alias("n_orders"),
    )
    train_orders = split.filter(F.col("rn") > 1)
    train = (
        li.join(
            train_orders.select("o_orderkey", "o_custkey"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .select("l_orderkey", "l_partkey", "o_custkey")
    )
    train_b = train.select("l_orderkey", "l_partkey").distinct()
    topk = _cf_topk_from_baskets(train_b).select("item_i", "item_j")
    profile = train.select(
        F.col("o_custkey").alias("c"), F.col("l_partkey").alias("i")
    ).distinct()
    recs = (
        profile.join(topk, profile.i == topk.item_i)
        .select("c", F.col("item_j").alias("j"))
        .distinct()
        .join(
            profile.select("c", F.col("i").alias("j")),
            ["c", "j"],
            "left_anti",
        )
    )
    test_items = (
        li.join(
            split.filter((F.col("rn") == 1) & (F.col("n_orders") >= 2))
            .select("o_orderkey", "o_custkey"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .select(
            F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p")
        )
        .distinct()
    )
    eval_users = test_items.select("c").distinct()
    hits = (
        test_items.join(
            recs, (test_items.c == recs.c) & (test_items.p == recs.j)
        )
        .select(test_items.c)
        .distinct()
    )
    n_users = eval_users.agg(
        F.count("*").cast("long").alias("n_eval_users")
    )
    n_hits = hits.agg(F.count("*").cast("long").alias("n_hits"))
    return (
        n_users.join(F.broadcast(n_hits))
        .select(
            "n_eval_users",
            "n_hits",
            F.expr("n_hits * 10000 div n_eval_users").alias(
                "hitrate_bp"
            ),
        )
    )

"""Training-data selection operators (DSIR-style importance scoring).

Data Selection via Importance Resampling (Xie et al., 2023) picks raw
documents whose hashed-n-gram distribution looks like a target domain:
score(doc) = Σ_w c_doc[w] · (log p_target[w] − log p_raw[w]) under
bag-of-words models, then sample by weight. The rebuild here keeps the
estimator shape but makes it CROSS-ENGINE EXACT: the vocabulary is the
top-V corpus words (the role hashing plays in DSIR is bounding feature
cardinality — a frequency cap does the same job deterministically), and
the per-word log-ratio is replaced by the integer SHARE DIFFERENCE
floor(cnt_t·1e9/N_t) − floor(cnt_r·1e9/N_r), monotone in the same
per-word direction, so scores are pure BIGINT arithmetic and the DuckDB
oracle hash-matches to the unit. Selection is deterministic top-k
(score desc, doc_id) — the Gumbel-noise resampling variant trades
exactness for diversity and belongs behind a seeded RNG, not an oracle.

The reference (syafriedf/apache-iceberg-exploration) has no
data-selection surface; this family exists for the LLM-pipeline mandate
(SURVEY §2 extensions) beside dedup/quality/contamination.

Scale: token explode is a narrow map; the vocabulary is capped at V
rows and BROADCAST to the candidate side; per-doc scores are one
map-side-combined aggregation. Nothing quadratic, nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..sources.io import load_table

_V = 400  # vocabulary cap (top-V corpus words, ties lexicographic)
_TOPK = 100  # selected documents
_SCALE = 1_000_000_000


_DSIR_ORACLE = f"""
    WITH tok AS (
        SELECT doc_id, lang,
               unnest(regexp_extract_all(text, '[a-z]+')) AS w
        FROM documents
    ),
    vocab AS (
        SELECT w FROM tok
        GROUP BY w
        ORDER BY count(*) DESC, w
        LIMIT {_V}
    ),
    vt AS (
        SELECT t.w,
               sum(CASE WHEN t.lang = 'en' THEN 1 ELSE 0 END) AS ct,
               sum(CASE WHEN t.lang <> 'en' THEN 1 ELSE 0 END) AS cr
        FROM tok t JOIN vocab v ON t.w = v.w
        GROUP BY t.w
    ),
    tot AS (
        SELECT sum(ct) AS nt, sum(cr) AS nr FROM vt
    ),
    shares AS (
        SELECT w,
               (ct * {_SCALE}) // (SELECT nt FROM tot)
               - (cr * {_SCALE}) // (SELECT nr FROM tot) AS dshare
        FROM vt
    ),
    cand AS (
        SELECT t.doc_id, t.w, count(*) AS c
        FROM tok t
        WHERE t.lang <> 'en'
        GROUP BY t.doc_id, t.w
    ),
    scored AS (
        SELECT c.doc_id,
               CAST(sum(c.c * s.dshare) AS BIGINT) AS score
        FROM cand c JOIN shares s ON c.w = s.w
        GROUP BY c.doc_id
    ),
    ranked AS (
        SELECT doc_id, score,
               ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rnk
        FROM scored
    )
    SELECT doc_id, score, rnk FROM ranked WHERE rnk <= {_TOPK}
"""


@query("training_dsir_target_selection", oracle=_DSIR_ORACLE)
def training_dsir_target_selection(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DSIR-style target-domain data selection: score every non-English
    candidate document by how English-corpus-like its word distribution
    is (integer share-difference model over the top-{V} vocabulary),
    then keep the top-{K} — the data-selection step a pretraining
    pipeline runs between dedup and mixing.

    Plan: explode → vocab cap (TakeOrdered {V}) → conditional-sum share
    table (broadcast, ≤{V} rows) → per-doc aggregate → global top-{K}
    via orderBy().limit() then row_number (bounded input — no
    unpartitioned window over an unbounded relation).
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    tok = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr("regexp_extract_all(text, '[a-z]+', 0)")
        ).alias("w"),
    )
    vocab = (
        tok.groupBy("w")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "w")
        .limit(_V)
        .select("w")
    )
    vt = (
        tok.join(F.broadcast(vocab), "w")
        .groupBy("w")
        .agg(
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias(
                "ct"
            ),
            F.sum(F.when(F.col("lang") != "en", 1).otherwise(0)).alias(
                "cr"
            ),
        )
    )
    tot = vt.agg(
        F.sum("ct").alias("nt"), F.sum("cr").alias("nr")
    )
    shares = (
        vt.crossJoin(F.broadcast(tot))
        .select(
            "w",
            (
                F.expr(f"ct * {_SCALE} div nt")
                - F.expr(f"cr * {_SCALE} div nr")
            ).alias("dshare"),
        )
    )
    cand = (
        tok.filter(F.col("lang") != "en")
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
    )
    scored = (
        cand.join(F.broadcast(shares), "w")
        .groupBy("doc_id")
        .agg(F.sum(F.col("c") * F.col("dshare")).alias("score"))
    )
    top = scored.orderBy(F.col("score").desc(), "doc_id").limit(_TOPK)
    out = top.withColumn(
        "rnk",
        F.row_number().over(
            Window.orderBy(F.col("score").desc(), "doc_id")
        ),
    ).select("doc_id", "score", "rnk")
    return out


_MIX_BUDGET = 100_000  # document budget to apportion across sources


_MIX_ORACLE = f"""
    WITH src AS (
        SELECT source,
               count(*) AS n_docs,
               CAST(sum(len(regexp_extract_all(text, '[a-z]+')))
                    AS BIGINT) AS n_tokens
        FROM documents
        GROUP BY source
    ),
    tot AS (SELECT sum(n_tokens) AS t FROM src),
    base AS (
        SELECT source, n_docs, n_tokens,
               (n_tokens * {_MIX_BUDGET}) // (SELECT t FROM tot) AS floor_q,
               (n_tokens * {_MIX_BUDGET}) % (SELECT t FROM tot) AS rem
        FROM src
    ),
    leftover AS (
        SELECT {_MIX_BUDGET} - sum(floor_q) AS extra FROM base
    ),
    ranked AS (
        SELECT *,
               ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rrank
        FROM base
    )
    SELECT source, n_docs, n_tokens,
           CAST(floor_q + CASE WHEN rrank <= (SELECT extra FROM leftover)
                               THEN 1 ELSE 0 END AS BIGINT) AS quota
    FROM ranked
"""


@query("training_mix_apportionment", oracle=_MIX_ORACLE)
def training_mix_apportionment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sampling-quota apportionment across corpus sources: a fixed
    document budget is split proportionally to each source's token
    mass using Hamilton's largest-remainder method — floor quotas by
    integer division, then the leftover seats go to the largest
    remainders (ties by source name). Exact-integer by construction
    (the temperature-sampling variant's float powers cannot
    cross-engine hash), deterministic, and the quotas sum to the
    budget exactly — the property a downstream sampler needs.

    Plan: one token-count aggregate per source (map-side combined),
    then all arithmetic over the |sources|-row relation (fixed
    cardinality — the unpartitioned rank is bounded by it).
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "source", "text"
    )
    src = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(
            F.size(F.expr("regexp_extract_all(text, '[a-z]+', 0)"))
        ).alias("n_tokens"),
    )
    tot = src.agg(F.sum("n_tokens").alias("t"))
    base = src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.expr(f"n_tokens * {_MIX_BUDGET} div t").alias("floor_q"),
        (F.col("n_tokens") * _MIX_BUDGET % F.col("t")).alias("rem"),
    )
    leftover = base.agg(
        (F.lit(_MIX_BUDGET) - F.sum("floor_q")).alias("extra")
    )
    ranked = base.withColumn(
        "rrank",
        F.row_number().over(
            Window.orderBy(F.col("rem").desc(), "source")
        ),
    )
    out = ranked.crossJoin(F.broadcast(leftover)).select(
        "source",
        "n_docs",
        "n_tokens",
        (
            F.col("floor_q")
            + F.when(F.col("rrank") <= F.col("extra"), 1).otherwise(0)
        )
        .cast("long")
        .alias("quota"),
    )
    return out

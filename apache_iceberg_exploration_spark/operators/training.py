"""Training-data pipeline operators: packing, mixing, sampling, ordering,
contamination.

The reference has no training-data plane at all (SURVEY.md §2 — it is a
customer-table ELT), but BASELINE.json's north star is an engine a
large-scale LLM-data pipeline could run on. This module adds the
corpus-preparation operators that sit between "deduped documents"
(operators/dedup.py) and "tokens on a trainer": sequence packing, source
mixing, stratified sampling, deterministic global shuffle, and benchmark
contamination checks. All pure built-in Spark functions — no Python row
boundary — and every query has a DuckDB oracle.

Cross-engine determinism: anything "random" is keyed on
``functions.hashing.hash64`` (md5-based, byte-identical in both engines);
nothing uses ``rand()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import hash64, hash64_sql
from ..registry import query
from ..sources.io import load_table
from .dedup import _SHINGLES_SQL, word_shingles

CHUNK_TOKENS = 512  # packing budget per training sequence
PACK_BUCKET = 2048  # doc_ids per cumsum bucket (two-phase prefix sum)


@query(
    "pack_concat_chunks",
    oracle=f"""
        SELECT doc_id, n_tokens,
               CAST(floor(cum_before / {CHUNK_TOKENS}) AS BIGINT) AS start_chunk,
               CAST(floor((cum_before + n_tokens - 1) / {CHUNK_TOKENS})
                    - floor(cum_before / {CHUNK_TOKENS}) + 1 AS BIGINT)
                   AS chunks_spanned
        FROM (
            SELECT doc_id,
                   len(string_split(text, ' ')) AS n_tokens,
                   coalesce(sum(len(string_split(text, ' '))) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS cum_before
            FROM documents
        )
    """,
)
def pack_concat_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style concat-and-chunk sequence packing: documents are laid out
    in a deterministic order (doc_id), concatenated, and cut every
    CHUNK_TOKENS tokens; each document reports its starting chunk and how
    many chunk boundaries it spans.

    Scale: a naive global-window cumsum collapses to ONE partition. This
    uses the two-phase distributed prefix sum instead: (1) cumsum within
    doc_id-range buckets (window partitioned by bucket — parallel), (2)
    per-bucket totals are a tiny aggregate, cumulated and broadcast back
    as offsets. O(rows/buckets) per task, no single-partition stage.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
        (F.col("doc_id") / PACK_BUCKET).cast("long").alias("bucket"),
    )
    w_local = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = toks.withColumn(
        "local_before", F.coalesce(F.sum("n_tokens").over(w_local), F.lit(0))
    )
    # phase 2: exclusive prefix of bucket totals (few rows → window over
    # the aggregate is cheap; broadcast back into the big side)
    w_bucket = (
        Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        toks.groupBy("bucket")
        .agg(F.sum("n_tokens").alias("bucket_total"))
        .withColumn(
            "bucket_offset",
            F.coalesce(F.sum("bucket_total").over(w_bucket), F.lit(0)),
        )
        .select("bucket", "bucket_offset")
    )
    cum = local.join(F.broadcast(offsets), "bucket").withColumn(
        "cum_before", F.col("local_before") + F.col("bucket_offset")
    )
    start = F.floor(F.col("cum_before") / CHUNK_TOKENS)
    end = F.floor((F.col("cum_before") + F.col("n_tokens") - 1) / CHUNK_TOKENS)
    return cum.select(
        "doc_id",
        "n_tokens",
        start.cast("long").alias("start_chunk"),
        (end - start + 1).cast("long").alias("chunks_spanned"),
    )


@query(
    "stratified_sample_per_lang",
    oracle=f"""
        SELECT doc_id, lang, sample_rank
        FROM (
            SELECT doc_id, lang,
                   row_number() OVER (
                       PARTITION BY lang
                       ORDER BY {hash64_sql("CAST(doc_id AS VARCHAR)")}, doc_id
                   ) AS sample_rank
            FROM documents
        )
        WHERE sample_rank <= 20
    """,
)
def stratified_sample_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-size stratified sample: 20 documents per language, chosen by
    deterministic key-hash order (reproducible across runs, retries, and
    engines — rand()-based sampling is neither).

    Scale: one shuffle on the stratum key; row_number stops mattering
    after rank 20 so skewed strata cost only their sort. For heavy skew,
    pre-filter with an approximate per-stratum hash threshold before the
    exact rank.
    """
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        hash64(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= 20)
        .select("doc_id", "lang", "sample_rank")
    )


_MIX_RATE_SQL = """CASE WHEN source IN ('src0', 'src1') THEN 0.8
                        WHEN source LIKE 'src1_' THEN 0.3
                        ELSE 0.1 END"""


def _mix_rate_spark():
    return (
        F.when(F.col("source").isin("src0", "src1"), F.lit(0.8))
        .when(F.col("source").rlike("^src1.$"), F.lit(0.3))
        .otherwise(F.lit(0.1))
    )


@query(
    "data_mixing_weighted",
    oracle=f"""
        SELECT source,
               count(*) AS n_total,
               sum(CASE WHEN {hash64_sql("CAST(doc_id AS VARCHAR)")} % 1000
                             < CAST({_MIX_RATE_SQL} * 1000 AS BIGINT)
                        THEN 1 ELSE 0 END) AS n_sampled
        FROM documents
        GROUP BY source
    """,
)
def data_mixing_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-weighted mixture sampling — each source is down/up-weighted
    to a target rate (the 'data mixing' step that turns raw crawl+curated
    sources into a training mixture). Selection is a per-source hash
    threshold, so the mixture is reproducible and rescalable (raising a
    rate keeps previously selected rows — nested samples).

    Scale: embarrassingly parallel scan (the hash test is per-row,
    map-side); the group-by here only REPORTS realized counts per source.
    """
    docs = load_table(spark, sf_dir, "documents")
    picked = F.pmod(hash64(F.col("doc_id").cast("string")), F.lit(1000)) < (
        _mix_rate_spark() * 1000
    ).cast("long")
    return docs.groupBy("source").agg(
        F.count("*").alias("n_total"),
        F.sum(F.when(picked, 1).otherwise(0)).alias("n_sampled"),
    )


@query(
    "global_shuffle_shards",
    oracle=f"""
        SELECT doc_id, shard, pos_in_shard
        FROM (
            SELECT doc_id,
                   {hash64_sql("CAST(doc_id AS VARCHAR)")} % 8 AS shard,
                   row_number() OVER (
                       PARTITION BY {hash64_sql("CAST(doc_id AS VARCHAR)")} % 8
                       ORDER BY {hash64_sql("CAST(doc_id AS VARCHAR)")}, doc_id
                   ) AS pos_in_shard
            FROM documents
        )
    """,
)
def global_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle into training shards: hash-assign each
    document to one of 8 shards, with a stable pseudo-random order inside
    each shard — the epoch-reshuffle a trainer consumes, without any
    driver-side randomness.

    Scale: this is the RIGHT way to globally shuffle 100 TB — a global
    ORDER BY hash is one total sort, but sharding first turns it into
    independent per-shard sorts (shuffle keyed on shard, sort within);
    shard count = number of output files the trainer wants.
    """
    docs = load_table(spark, sf_dir, "documents")
    h = hash64(F.col("doc_id").cast("string"))
    sharded = docs.select("doc_id", F.pmod(h, F.lit(8)).alias("shard"), h.alias("h"))
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return sharded.select(
        "doc_id", "shard", F.row_number().over(w).alias("pos_in_shard")
    )


@query(
    "contamination_ngram_overlap",
    oracle=f"""
        WITH shingles AS ({_SHINGLES_SQL}),
        bench AS (
            SELECT DISTINCT shingle FROM shingles WHERE doc_id % 23 = 0
        ),
        corpus AS (
            SELECT * FROM shingles WHERE doc_id % 23 <> 0
        )
        SELECT c.doc_id,
               count(*) AS n_shingles,
               CAST(sum(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_contaminated,
               round(sum(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END)
                     * 1.0 / count(*), 4) AS contamination_rate
        FROM corpus c LEFT JOIN bench b ON c.shingle = b.shingle
        GROUP BY c.doc_id
        HAVING contamination_rate >= 0.3
    """,
)
def contamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: flag corpus documents whose word
    3-gram shingles overlap a held-out benchmark set (here: every 23rd
    doc_id stands in for the eval set) above a 30% rate — the n-gram
    decontamination step every pretraining pipeline runs before training.

    Scale: shingles shuffle once keyed by shingle text; the benchmark
    side is distinct-reduced BEFORE the join so fan-out is bounded by
    corpus shingle count. At real benchmark sizes the bench set fits in a
    broadcast; the left join + conditional count computes membership and
    totals in ONE pass (no second join back for the denominator). For
    100 TB drop shingles whose benchmark document frequency exceeds a cap
    (stop-gram removal) to kill the hot-key skew.
    """
    docs = load_table(spark, sf_dir, "documents")
    shingles = word_shingles(docs)  # distinct (doc_id, shingle)
    bench = (
        shingles.filter(F.col("doc_id") % 23 == 0)
        .select("shingle")
        .distinct()
        .withColumn("in_bench", F.lit(1))
    )
    corpus = shingles.filter(F.col("doc_id") % 23 != 0)
    joined = corpus.join(F.broadcast(bench), "shingle", "left")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.coalesce(F.col("in_bench"), F.lit(0))).alias(
                "n_contaminated"
            ),
        )
        .withColumn(
            "contamination_rate",
            F.round(F.col("n_contaminated") / F.col("n_shingles"), 4),
        )
        .filter(F.col("contamination_rate") >= 0.3)
    )


@query(
    "domain_token_mix",
    oracle="""
        WITH per AS (
            SELECT source,
                   count(*) AS n_docs,
                   CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                       AS n_tokens
            FROM documents GROUP BY source
        )
        SELECT source, n_docs, n_tokens,
               CAST(floor(n_tokens * 10000.0 / sum(n_tokens) OVER () + 0.5)
                    AS BIGINT) AS token_share_bp
        FROM per
    """,
)
def domain_token_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus accounting by source domain: document count, token count,
    and each source's share of the total token budget (basis points) —
    the report a mixing schedule (`data_mixing_weighted`) is tuned
    against. Mixing ratios are meaningful in TOKENS, not documents;
    this is the operator that measures them.

    Scale: one map-side-combinable aggregation over the corpus; the
    share window then runs on post-aggregate rows (one per source), so
    the single-partition window is a few-hundred-row no-op even at
    100 TB of input.
    """
    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " ")))
        .cast("long")
        .alias("n_tokens"),
    )
    total = F.sum("n_tokens").over(Window.partitionBy())
    return per.select(
        "source",
        "n_docs",
        "n_tokens",
        F.floor(F.col("n_tokens") * 10000.0 / total + 0.5)
        .cast("long")
        .alias("token_share_bp"),
    )


_U_DENOM = float(1 << 60)  # hash64 range → unit interval


def _quality_weighted_oracle() -> str:
    from .text import _STOPWORDS

    stop_in = ", ".join(f"'{s}'" for s in _STOPWORDS)
    u = hash64_sql("'sample|' || CAST(doc_id AS VARCHAR)")
    return f"""
        WITH feats AS (
            SELECT doc_id, n_chars, string_split(text, ' ') AS words
            FROM documents
        ),
        scored AS (
            SELECT doc_id,
                   least(1.0, len(words) / 100.0) * 0.5
                   + least(1.0, CAST(len(list_filter(words,
                         w -> w IN ({stop_in}))) AS DOUBLE)
                       / len(words) * 5) * 0.3
                   + CASE WHEN CAST(n_chars AS DOUBLE) / len(words)
                          BETWEEN 3 AND 10 THEN 0.2 ELSE 0.0 END AS score,
                   CAST({u} AS DOUBLE) / {_U_DENOM} AS u
            FROM feats
        )
        SELECT doc_id,
               CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_bp,
               CAST(floor(u * 10000) AS BIGINT) AS draw_bp
        FROM scored WHERE u < score
    """


@query("quality_weighted_sample", oracle=_quality_weighted_oracle())
def quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-WEIGHTED sampling (soft filtering): each document is kept
    with probability equal to its quality score — high-quality documents
    almost always survive, low-quality ones survive occasionally instead
    of being hard-cut at a threshold. This is the FineWeb/DataComp-style
    alternative to binary filters: it preserves tail diversity while
    still shifting the corpus quality distribution.

    Determinism is the point: the "random" draw is the portable 60-bit
    key hash mapped to [0,1), so the sample is reproducible across runs,
    retries, partitionings, AND engines (the DuckDB oracle reproduces
    the exact kept set — rand() could never be oracle-checked). The
    score is text_quality_score's bounded [0,1] heuristic.

    Scale: map-only scan→project→filter, zero shuffles; the keep
    decision needs only the row itself. Changing the sampling epoch =
    changing the hash salt ('sample|'), not re-ranking anything.
    """
    from .text import _STOPWORDS

    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n_tok = F.size(words)
    sw = F.size(F.filter(words, lambda w: w.isin(*_STOPWORDS))).cast("double")
    avg_len = F.col("n_chars").cast("double") / n_tok
    score = (
        F.least(F.lit(1.0), n_tok / F.lit(100.0)) * 0.5
        + F.least(F.lit(1.0), sw / n_tok * 5) * 0.3
        + F.when(avg_len.between(3, 10), F.lit(0.2)).otherwise(F.lit(0.0))
    )
    u = hash64(
        F.concat(F.lit("sample|"), F.col("doc_id").cast("string"))
    ).cast("double") / F.lit(_U_DENOM)
    return (
        docs.select("doc_id", score.alias("score"), u.alias("u"))
        .filter(F.col("u") < F.col("score"))
        .select(
            "doc_id",
            F.floor(F.col("score") * 10000 + 0.5).cast("long").alias("score_bp"),
            F.floor(F.col("u") * 10000).cast("long").alias("draw_bp"),
        )
    )


@query(
    "dataset_card_stats",
    oracle="""
        WITH base AS (
            SELECT source, lang, n_chars,
                   len(string_split(text, ' ')) AS ws_tokens
            FROM documents
        ),
        tot AS (SELECT count(*) AS n FROM base)
        SELECT source, lang,
               count(*) AS n_docs,
               CAST(sum(ws_tokens) AS BIGINT) AS total_tokens,
               CAST((sum(n_chars) * 1000) // count(*) AS BIGINT)
                   AS mean_chars_milli,
               CAST((count(*) * 1000000) // (SELECT n FROM tot) AS BIGINT)
                   AS share_ppm
        FROM base
        GROUP BY 1, 2
    """,
)
def dataset_card_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card generator: the per-(source, language) composition
    table every published training corpus ships — document counts, token
    totals, mean document length, and corpus share. Shares and means are
    integer milli/ppm units (floor division), bit-exact across engines.

    Scale: one keyed aggregation over (source, lang) — low-cardinality
    keys, partial aggregation collapses everything map-side; the corpus
    total joins back as a literal (one scalar to the driver). At 100 TB
    this is the same single-shuffle plan; the per-doc token count stays
    inside codegen (split+len, no Python).
    """
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "source",
        "lang",
        "n_chars",
        F.size(F.split(F.col("text"), " ")).alias("ws_tokens"),
    )
    total = base.count()
    return base.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("ws_tokens").cast("long").alias("total_tokens"),
        F.expr("(sum(n_chars) * 1000) div count(*)")
        .cast("long")
        .alias("mean_chars_milli"),
        F.expr(f"(count(*) * 1000000) div {total}")
        .cast("long")
        .alias("share_ppm"),
    )


SKEW_TOPN = 20


@query(
    "data_skew_diagnostics",
    oracle=f"""
        WITH per_key AS (
            SELECT o_custkey AS key, count(*) AS n_rows
            FROM orders GROUP BY 1
        ),
        tot AS (
            SELECT CAST(sum(n_rows) AS BIGINT) AS t,
                   count(*) AS n_keys
            FROM per_key
        )
        SELECT rank, key, n_rows,
               CAST((n_rows * 1000000) // (SELECT t FROM tot) AS BIGINT)
                   AS share_ppm,
               CAST((n_rows * (SELECT n_keys FROM tot) * 1000)
                    // (SELECT t FROM tot) AS BIGINT) AS x_mean_milli
        FROM (
            SELECT key, n_rows,
                   row_number() OVER (ORDER BY n_rows DESC, key) AS rank
            FROM per_key
        )
        WHERE rank <= {SKEW_TOPN}
    """,
)
def data_skew_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew report: the top-{SKEW_TOPN} heaviest join/agg
    keys with their share of all rows (ppm) and their multiple of the
    mean key weight (milli) — the diagnostic you run BEFORE choosing
    between a plain shuffle join, salting (skew_salted_join), or AQE
    skew splitting. A key at 50× the mean is the one that serializes a
    1000-executor shuffle into one straggler task.

    Scale: one keyed count (partial-aggregated), a TakeOrdered top-N,
    and two scalar totals — diagnosis costs one aggregation regardless
    of table size, which is why it belongs in the pipeline's preflight
    rather than in post-mortems.
    """
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    per_key = orders.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count("*").alias("n_rows")
    )
    tot = per_key.agg(
        F.sum("n_rows").cast("long").alias("t"), F.count("*").alias("n_keys")
    ).collect()[0]
    # top-N first (TakeOrderedAndProject), then rank the N survivors —
    # the per-key relation is key-cardinality-sized (unbounded at
    # 100 TB), so ranking it before limiting would be the very skew
    # this diagnostic exists to catch.
    ranked = (
        per_key.orderBy(F.col("n_rows").desc(), "key")
        .limit(SKEW_TOPN)
        .withColumn(
            "rank",
            F.row_number().over(W.orderBy(F.col("n_rows").desc(), "key")),
        )
    )
    return ranked.select(
        "rank",
        "key",
        "n_rows",
        F.expr(f"(n_rows * 1000000) div {tot.t}")
        .cast("long")
        .alias("share_ppm"),
        F.expr(f"(n_rows * {tot.n_keys} * 1000) div {tot.t}")
        .cast("long")
        .alias("x_mean_milli"),
    )


N_SHARDS = 8


@query(
    "token_balanced_shards",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, len(string_split(text, ' ')) AS toks
            FROM documents
        ),
        ranked AS (
            SELECT doc_id, toks,
                   row_number() OVER (ORDER BY toks DESC, doc_id) AS rnk
            FROM t
        ),
        assigned AS (
            SELECT doc_id, toks,
                   CAST(CASE WHEN ((rnk - 1) // {N_SHARDS}) % 2 = 0
                             THEN (rnk - 1) % {N_SHARDS}
                             ELSE {N_SHARDS} - 1 - ((rnk - 1) % {N_SHARDS})
                        END AS INTEGER) AS shard
            FROM ranked
        ),
        per AS (
            SELECT shard, count(*) AS n_docs,
                   CAST(sum(toks) AS BIGINT) AS shard_tokens
            FROM assigned GROUP BY 1
        ),
        tot AS (SELECT CAST(sum(shard_tokens) AS BIGINT) AS t FROM per)
        SELECT shard, n_docs, shard_tokens,
               CAST((shard_tokens * {N_SHARDS} * 1000)
                    // (SELECT t FROM tot) AS BIGINT) AS x_even_milli
        FROM per
    """,
)
def token_balanced_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-BALANCED shard assignment: documents are ranked by token
    count and dealt to {N_SHARDS} shards in boustrophedon (snake) order
    — rank 1..N left-to-right, N+1..2N right-to-left — the classic
    distributed answer to greedy longest-first bin packing (which is
    inherently sequential): every shard receives one document from each
    size band, so shard token totals stay within a band-width of even.
    Output is the per-shard audit (docs, tokens, ×-even in milli — 1000
    = perfectly even), the check a training job runs before declaring
    its data-parallel batches balanced.

    Scale: one token-count projection, one global rank (a sort that at
    real corpus size becomes the two-phase percentile cut used by
    curriculum_quality_deciles — band boundaries from quantiles, snake
    within bands), and a keyed aggregate. Contrast with
    global_shuffle_shards (hash sharding: balanced in EXPECTATION,
    unbalanced per-epoch for skewed document lengths); this one is
    deterministic and balanced by construction.
    """
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", F.size(F.split(F.col("text"), " ")).alias("toks")
    )
    ranked = t.withColumn(
        "rnk",
        F.row_number().over(W.orderBy(F.col("toks").desc(), "doc_id")),
    )
    row = (F.col("rnk") - 1).cast("long")
    fwd = row % N_SHARDS
    shard = (
        F.when((F.expr(f"(rnk - 1) div {N_SHARDS}") % 2) == 0, fwd)
        .otherwise(F.lit(N_SHARDS - 1) - fwd)
        .cast("int")
    )
    per = (
        ranked.withColumn("shard", shard)
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("toks").cast("long").alias("shard_tokens"),
        )
    )
    total = per.agg(F.sum("shard_tokens").cast("long").alias("t")).collect()[0].t
    return per.select(
        "shard",
        "n_docs",
        "shard_tokens",
        F.expr(f"(shard_tokens * {N_SHARDS} * 1000) div {total}")
        .cast("long")
        .alias("x_even_milli"),
    )


SOURCE_CAP = 15  # max docs kept per source


def _source_cap_oracle() -> str:
    from .text import _STOPWORDS

    stop_in = ", ".join(f"'{s}'" for s in _STOPWORDS)
    return f"""
        WITH feats AS (
            SELECT doc_id, source, n_chars,
                   string_split(text, ' ') AS words
            FROM documents
        ),
        scored AS (
            SELECT doc_id, source,
                   least(1.0, len(words) / 100.0) * 0.5
                   + least(1.0, CAST(len(list_filter(words,
                         w -> w IN ({stop_in}))) AS DOUBLE)
                       / len(words) * 5) * 0.3
                   + CASE WHEN CAST(n_chars AS DOUBLE) / len(words)
                          BETWEEN 3 AND 10 THEN 0.2 ELSE 0.0 END AS score
            FROM feats
        ),
        ranked AS (
            SELECT doc_id, source, score,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY score DESC, doc_id
                   ) AS q_rank
            FROM scored
        )
        SELECT source, doc_id,
               CAST(q_rank AS BIGINT) AS q_rank,
               CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_bp
        FROM ranked WHERE q_rank <= {SOURCE_CAP}
    """


@query("source_cap_sample", oracle=_source_cap_oracle())
def source_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap: keep at most SOURCE_CAP docs per source
    domain, best quality first (deterministic doc_id tiebreak) — the
    anti-domination guard every web-scale corpus applies so one crawl
    host cannot flood the training mix, complementing the
    proportional controls (domain_token_mix / data_mixing_weighted)
    with a hard ceiling.

    Scale: one window per source partition (row_number over the quality
    ordering, filtered to the cap). The per-source sort is Spark's
    external sort — no per-source collect_list buffer that a
    100M-doc host would blow up; a skewed giant source costs one big
    sorted partition, which AQE's skew handling splits for every stage
    except the final rank (where per-key order is required — the
    irreducible cost of exact per-key top-k). Score is the same
    bounded [0,1] heuristic as quality_weighted_sample, so both
    engines rank identically (floor-quantized only at emission).
    """
    from .text import _STOPWORDS

    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n_tok = F.size(words)
    sw = F.size(F.filter(words, lambda w: w.isin(*_STOPWORDS))).cast("double")
    avg_len = F.col("n_chars").cast("double") / n_tok
    score = (
        F.least(F.lit(1.0), n_tok / F.lit(100.0)) * 0.5
        + F.least(F.lit(1.0), sw / n_tok * 5) * 0.3
        + F.when(avg_len.between(3, 10), F.lit(0.2)).otherwise(F.lit(0.0))
    )
    w = Window.partitionBy("source").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    return (
        docs.select("source", "doc_id", score.alias("score"))
        .withColumn("q_rank", F.row_number().over(w))
        .filter(F.col("q_rank") <= SOURCE_CAP)
        .select(
            "source",
            "doc_id",
            F.col("q_rank").cast("long").alias("q_rank"),
            F.floor(F.col("score") * 10000 + 0.5)
            .cast("long")
            .alias("score_bp"),
        )
    )

"""Text-analysis operators over ``documents`` — the training-data-pipeline
surface (language-ID heuristic, quality scoring, token counting, document
fingerprinting). All pure builtin SQL functions (split/filter/aggregate/
regexp) — no Python UDFs in any hot path, every value reproduced exactly
by the DuckDB oracle.

The reference has no text processing at all (SURVEY.md §2.8 'notably
absent'); these are the BASELINE.json north-star extensions.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.io import load_table

# marker stopwords per language for the n-gram/stopword language heuristic
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "la", "los", "de", "es"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "zh": ("de5", "shi4", "le5", "he2", "zai4"),  # romanized placeholders
}

_STOPWORDS = ("the", "a", "of", "and", "is", "in", "to")


def _hits_spark(words, markers):
    return F.size(F.filter(words, lambda w: w.isin(*markers)))


def _hits_sql(markers) -> str:
    lst = ", ".join(f"'{m}'" for m in markers)
    return f"len(list_filter(words, w -> w IN ({lst})))"


@query(
    "text_language_id",
    oracle=f"""
        WITH tok AS (SELECT doc_id, lang, string_split(text, ' ') AS words
                     FROM documents)
        SELECT doc_id,
               CASE
                 {' '.join(f"WHEN {_hits_sql(m)} >= GREATEST({', '.join(_hits_sql(m2) for l2, m2 in sorted(_LANG_MARKERS.items()) if l2 != l)}) AND {_hits_sql(m)} > 0 THEN '{l}'" for l, m in sorted(_LANG_MARKERS.items()))}
                 ELSE 'und'
               END AS predicted_lang,
               lang AS actual_lang,
               {_hits_sql(_LANG_MARKERS['en'])} AS en_hits
        FROM tok
    """,
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: argmax of per-language marker-stopword hit
    counts (deterministic first-wins tiebreak in lang-code order), 'und'
    when nothing matches — the classic cheap n-gram/stopword pre-filter
    run before an expensive model at corpus scale.

    Scale: narrow projection + per-row array ops; no shuffle at all.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    hits = {l: _hits_spark(words, m) for l, m in sorted(_LANG_MARKERS.items())}
    pred = F.lit("und")
    # build reverse CASE chain so earlier languages win ties, as in SQL
    for lang in sorted(_LANG_MARKERS, reverse=True):
        h = hits[lang]
        others = [hits[l2] for l2 in sorted(_LANG_MARKERS) if l2 != lang]
        cond = (h >= F.greatest(*others)) & (h > 0)
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
    # reverse iteration builds first-wins priority: 'de' check wraps 'en', etc.
    return docs.select(
        "doc_id",
        pred.alias("predicted_lang"),
        F.col("lang").alias("actual_lang"),
        hits["en"].alias("en_hits"),
    )


# Shared quality-score oracle (also feeds curriculum_quality_deciles).
_QUALITY_SQL = f"""
        WITH tok AS (
            SELECT doc_id, n_chars, string_split(text, ' ') AS words
            FROM documents
        )
        SELECT doc_id,
               len(words) AS n_tokens,
               round(CAST(n_chars AS DOUBLE) / len(words), 4) AS avg_token_len,
               round(CAST(len(list_filter(words, w -> w IN ({', '.join(f"'{s}'" for s in _STOPWORDS)}))) AS DOUBLE)
                     / len(words), 4) AS stopword_ratio,
               CAST(floor((least(1.0, len(words) / 100.0) * 0.5
                     + least(1.0, CAST(len(list_filter(words, w -> w IN ({', '.join(f"'{s}'" for s in _STOPWORDS)}))) AS DOUBLE) / len(words) * 5) * 0.3
                     + CASE WHEN CAST(n_chars AS DOUBLE) / len(words) BETWEEN 3 AND 10 THEN 0.2 ELSE 0.0 END)
                     * 10000 + 0.5) AS BIGINT) AS quality_score_bp
        FROM tok
"""


@query("text_quality_score", oracle=_QUALITY_SQL)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring (Gopher/C4-style cheap filters): token count,
    average token length, stopword ratio, combined into a bounded [0,1]
    score — the pre-training corpus filter. Scale: shuffle-free row-local
    arithmetic.

    The combined score is emitted as integer basis points via
    ``floor(x*10000 + 0.5)`` rather than ``round(x, 4)``: Spark rounds the
    DECIMAL rendering (HALF_UP) while DuckDB rounds the binary double, so
    a score landing exactly on a half boundary (e.g. 0.53375) diverges
    under round() but not under floor arithmetic, which is pure IEEE ops
    on identical operands."""
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
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.round(avg_len, 4).alias("avg_token_len"),
        F.round(sw / n_tok, 4).alias("stopword_ratio"),
        F.floor(score * 10000 + 0.5).cast("long").alias("quality_score_bp"),
    )


@query(
    "text_token_count",
    oracle=r"""
        SELECT doc_id,
               len(string_split(text, ' ')) AS ws_tokens,
               len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS bpe_ish_tokens,
               n_chars
        FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace tokens and a BPE-ish regex
    segmentation (letter runs / digit runs / single punctuation) — the
    cheap token-budget estimator for corpus accounting. Shuffle-free."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).alias("ws_tokens"),
        F.size(
            F.expr(r"regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]', 0)")
        ).alias("bpe_ish_tokens"),
        "n_chars",
    )


@query(
    "text_doc_fingerprint",
    oracle="""
        WITH shingles AS (
            SELECT DISTINCT doc_id,
                   md5(array_to_string(words[i + 1 : i + 3], ' ')) AS h
            FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
                 UNNEST(range(greatest(len(words) - 2, 1))) AS t(i)
        )
        SELECT doc_id,
               array_to_string(list_sort(list(h))[1:3], ',') AS fingerprint
        FROM shingles GROUP BY doc_id
    """,
)
def text_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: the 3 smallest distinct shingle hashes
    (winnowing-style min-sampling of a rolling shingle hash). Equal
    fingerprints ⇒ near-identical prefix content; used as a compact
    dedup/provenance key. One keyed aggregation."""
    from .dedup import word_shingles

    docs = load_table(spark, sf_dir, "documents")
    sh = word_shingles(docs).select(
        "doc_id", F.md5("shingle").alias("h")
    )
    return sh.groupBy("doc_id").agg(
        F.concat_ws(
            ",", F.slice(F.array_sort(F.collect_set("h")), 1, 3)
        ).alias("fingerprint")
    )


@query(
    "fuzzy_name_match_levenshtein",
    oracle="""
        WITH names AS (SELECT DISTINCT p_type, p_name FROM part)
        SELECT a.p_type, a.p_name AS name_a, b.p_name AS name_b,
               levenshtein(a.p_name, b.p_name) AS edit_dist
        FROM names a JOIN names b
          ON a.p_type = b.p_type AND a.p_name < b.p_name
        WHERE abs(length(a.p_name) - length(b.p_name)) <= 2
          AND levenshtein(a.p_name, b.p_name) <= 2
    """,
)
def fuzzy_name_match_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy match over the DISTINCT name dictionary,
    blocked on category: near-identical part names (≤2 edits) — the
    entity-resolution primitive.

    Scale, in order of leverage: (1) dedupe BEFORE matching — row-level
    fuzzy joins multiply every dictionary pair by its duplicate counts
    (at sf0.1 that's 398k row pairs vs ~10² dictionary pairs for the
    same information); (2) |len(a)−len(b)| ≤ k prefilter (a lower bound
    on edit distance) before the quadratic comparison; (3) the bounded
    ``levenshtein(l, r, threshold)`` variant, which early-exits the DP
    once the bound is exceeded. Row-level matches, if needed, come from
    joining this pair table back on name — a cheap equi-join."""
    p = load_table(spark, sf_dir, "part")
    names = p.select("p_type", "p_name").distinct()
    a, b = names.alias("a"), names.alias("b")
    bounded = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"), 2)
    exact = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(
            b,
            (F.col("a.p_type") == F.col("b.p_type"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .filter(
            (
                F.abs(
                    F.length(F.col("a.p_name")) - F.length(F.col("b.p_name"))
                )
                <= 2
            )
            & (bounded >= 0)
        )
        .select(
            F.col("a.p_type").alias("p_type"),
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            exact.alias("edit_dist"),
        )
    )


@query(
    "tfidf_top_terms",
    oracle="""
        WITH words AS (
            SELECT doc_id, word, count(*) AS tf
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                  FROM documents)
            WHERE length(word) > 0
            GROUP BY doc_id, word
        ),
        df AS (SELECT word, count(*) AS doc_freq FROM words GROUP BY word),
        n AS (SELECT count(*) AS n_docs FROM documents)
        SELECT doc_id, word,
               CAST(floor(tf * ln(CAST(n_docs AS DOUBLE) / doc_freq) * 10000 + 0.5)
                    AS BIGINT) AS tfidf_bp
        FROM (
            SELECT w.doc_id, w.word, w.tf, d.doc_freq, n.n_docs,
                   row_number() OVER (
                       PARTITION BY w.doc_id
                       ORDER BY w.tf * ln(CAST(n.n_docs AS DOUBLE) / d.doc_freq) DESC,
                                w.word
                   ) AS rn
            FROM words w JOIN df d ON w.word = d.word, n
        )
        WHERE rn <= 3
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF scoring: term frequency × inverse document frequency, top-3
    scoring terms per document (deterministic word tiebreak). The
    document-representation primitive under keyword search / relevance.

    Emitted as integer basis points (floor(x·10⁴+0.5)) — same IEEE ops in
    both engines, immune to round-half divergence (see
    text_quality_score).

    Scale: two keyed aggregations (doc×word, word) + one broadcast-able
    DF table join + a ranking window on doc_id. No driver materialization;
    idf's ln(N/df) uses a scalar N via crossJoin(broadcast(count))."""
    docs = load_table(spark, sf_dir, "documents")
    spread = docs.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    words = (
        spread.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("tf"))
    )
    df_tbl = words.groupBy("word").agg(F.count("*").alias("doc_freq"))
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        words.join(F.broadcast(df_tbl), "word")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col("tf")
            * F.log(F.col("n_docs").cast("double") / F.col("doc_freq")),
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("word"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "doc_id",
            "word",
            F.floor(F.col("tfidf") * 10000 + 0.5).cast("long").alias("tfidf_bp"),
        )
    )


@query(
    "pii_scrub_documents",
    oracle=r"""
        SELECT doc_id,
               regexp_replace(
                 regexp_replace(
                   regexp_replace(text || ' contact: user' || CAST(doc_id AS VARCHAR)
                                  || '@example.com or +1-555-000-'
                                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                   '\+?\d[\d-]{7,}\d', '<PHONE>', 'g'),
                 'https?://[^\s]+', '<URL>', 'g') AS scrubbed,
               length(text || ' contact: user' || CAST(doc_id AS VARCHAR)
                      || '@example.com or +1-555-000-'
                      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'))
                 - length(regexp_replace(
                     regexp_replace(text || ' contact: user' || CAST(doc_id AS VARCHAR)
                                    || '@example.com or +1-555-000-'
                                    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '', 'g'),
                     '\+?\d[\d-]{7,}\d', '', 'g')) AS n_pii_chars
        FROM documents WHERE doc_id < 100
    """,
)
def pii_scrub_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: email/phone/URL patterns replaced with typed
    placeholder tokens — the mandatory redaction pass of a training-data
    pipeline. (The synthetic corpus contains no PII, so a deterministic
    contact line derived from doc_id is appended first; the scrubber then
    provably removes exactly what was injected.) Pure regexp_replace —
    JVM-side, shuffle-free."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    synth = F.concat(
        F.col("text"),
        F.lit(" contact: user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-000-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone = r"\+?\d[\d-]{7,}\d"
    url = r"https?://[^\s]+"
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(synth, email, "<EMAIL>"), phone, "<PHONE>"
        ),
        url,
        "<URL>",
    )
    pii_removed = F.regexp_replace(F.regexp_replace(synth, email, ""), phone, "")
    return docs.select(
        "doc_id",
        scrubbed.alias("scrubbed"),
        (F.length(synth) - F.length(pii_removed)).alias("n_pii_chars"),
    )


_CHUNK = 40  # tokens per chunk
_OVERLAP = 10


@query(
    "document_chunking",
    oracle=f"""
        SELECT doc_id, chunk_idx,
               array_to_string(words[chunk_idx * {_CHUNK - _OVERLAP} + 1 :
                                     chunk_idx * {_CHUNK - _OVERLAP} + {_CHUNK}],
                               ' ') AS chunk_text,
               least(len(words) - chunk_idx * {_CHUNK - _OVERLAP}, {_CHUNK})
                   AS chunk_tokens
        FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
             UNNEST(range(CAST(ceil(greatest(len(words) - {_OVERLAP}, 1)
                                    / {_CHUNK - _OVERLAP}.0) AS BIGINT)))
               AS t(chunk_idx)
    """,
)
def document_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking: 40 tokens per chunk with
    10-token overlap (``_CHUNK``/``_OVERLAP``) — the context-window
    packing step before embedding/training. One row per chunk via
    sequence+explode (fan-out stays on executors; no Python).

    Scale: shuffle-free projection; chunk count ≈ tokens/(chunk−overlap)
    rows emitted per document."""
    docs = load_table(spark, sf_dir, "documents")
    spread = docs.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    words = F.split(F.col("text"), " ")
    stride = _CHUNK - _OVERLAP
    n_chunks = F.ceil(
        F.greatest(F.size(words) - _OVERLAP, F.lit(1)) / float(stride)
    ).cast("bigint")
    chunked = spread.select(
        "doc_id",
        words.alias("words"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    return chunked.select(
        "doc_id",
        "chunk_idx",
        F.concat_ws(
            " ", F.slice(F.col("words"), F.col("chunk_idx") * stride + 1, _CHUNK)
        ).alias("chunk_text"),
        F.least(
            F.size("words") - F.col("chunk_idx") * stride, F.lit(_CHUNK)
        ).alias("chunk_tokens"),
    )


@query(
    "training_data_pipeline",
    oracle=f"""
        WITH scored AS (
            SELECT doc_id, text, lang,
                   string_split(text, ' ') AS words
            FROM documents
        ),
        filtered AS (
            SELECT doc_id, text, lang, len(words) AS n_tokens
            FROM scored
            WHERE len(words) >= 30
              AND len(list_filter(words, w -> w IN ({', '.join(f"'{s}'" for s in _STOPWORDS)}))) > 0
              AND lang IN ('en', 'es', 'de', 'fr')
        ),
        deduped AS (
            SELECT doc_id, text, lang, n_tokens
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY md5(text) ORDER BY doc_id) AS rn
                  FROM filtered)
            WHERE rn = 1
        )
        SELECT lang,
               count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
               CAST(floor(avg(n_tokens) * 100 + 0.5) AS BIGINT) AS avg_tokens_c
        FROM deduped GROUP BY lang
    """,
)
def training_data_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full training-data pipeline as ONE lazy DataFrame program:
    quality gate (length + stopword presence) → language allowlist →
    exact dedup (content-hash, keep-first) → per-language corpus stats.
    Each stage is a transformation — Catalyst fuses the filters into the
    scan and the whole thing runs as two stages (scan+filter, then the
    dedup shuffle feeding the final aggregate).

    This is the composition target the individual operators exist for:
    swap the dedup stage for MinHash-LSH clusters
    (dedup_cluster_assignment), append chunking (document_chunking) —
    same shape, still no driver materialization anywhere."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    filtered = docs.filter(
        (F.size(words) >= 30)
        & (F.size(F.filter(words, lambda w: w.isin(*_STOPWORDS))) > 0)
        & F.col("lang").isin("en", "es", "de", "fr")
    ).select("doc_id", "text", "lang", F.size(words).alias("n_tokens"))

    from pyspark.sql import Window as W

    w = W.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = (
        filtered.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return deduped.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.floor(F.avg("n_tokens") * 100 + 0.5).cast("long").alias("avg_tokens_c"),
    )


@query(
    "text_normalized_exact_dedup",
    oracle="""
        WITH corpus AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 1000000, upper(text) || '  '
            FROM documents WHERE doc_id % 50 = 0
        )
        SELECT norm_text, count(*) AS n_variants, min(doc_id) AS keep_doc_id
        FROM (
            SELECT doc_id,
                   trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm_text
            FROM corpus
        )
        GROUP BY norm_text
        HAVING count(*) > 1
    """,
)
def text_normalized_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-then-exact-dedup: case-fold + whitespace-collapse
    before hashing — catches the trivial near-dups (reformatted copies)
    that exact dedup misses and fuzzy dedup wastes MinHash budget on.
    Standard first pass of a web-corpus dedup cascade.

    Scale: normalization is per-row map-side; the group-by shuffles one
    (hash-sized) key per row. Run BEFORE MinHash so the LSH stage sees
    one representative per normalized class.

    The synthetic corpus has no reformatted copies, so the query plants
    its own: every 50th document reappears upper-cased with trailing
    whitespace (mirrored in the oracle) — the dedup must catch exactly
    those pairs and nothing else.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    perturbed = docs.filter(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.upper("text"), F.lit("  ")).alias("text"),
    )
    corpus = docs.unionByName(perturbed)
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    return (
        corpus.select("doc_id", norm.alias("norm_text"))
        .groupBy("norm_text")
        .agg(
            F.count("*").alias("n_variants"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .filter(F.col("n_variants") > 1)
    )


@query(
    "text_repetition_ratio",
    oracle=f"""
        WITH grams AS (
            SELECT doc_id,
                   array_to_string(words[i + 1 : i + 2], ' ') AS gram
            FROM (SELECT doc_id, string_split(text, ' ') AS words
                  FROM documents),
                 UNNEST(range(greatest(len(words) - 1, 1))) AS t(i)
        ),
        per_doc AS (
            SELECT doc_id, count(*) AS n_grams,
                   count(DISTINCT gram) AS n_unique
            FROM grams WHERE gram <> '' GROUP BY doc_id
        )
        SELECT doc_id, n_grams,
               round(1.0 - n_unique * 1.0 / n_grams, 4) AS dup_gram_ratio
        FROM per_doc
        WHERE 1.0 - n_unique * 1.0 / n_grams > 0.05
    """,
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality filter (Gopher-style): fraction of duplicate
    word 2-grams per document; documents above 5% duplication (the
    threshold in both the Spark filter and the oracle below) are the
    boilerplate/spam candidates a pretraining pipeline drops.

    Scale: the n-gram explode shuffles on doc_id only (count + distinct
    count per doc); no cross-document state — embarrassingly parallel
    per document, so it composes with any partitioning.
    """
    docs = load_table(spark, sf_dir, "documents")
    k = 2
    words = F.split(F.col("text"), " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - k, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, k)),
    )
    per_doc = (
        docs.select("doc_id", F.explode(grams).alias("gram"))
        .filter(F.col("gram") != "")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.countDistinct("gram").alias("n_unique"),
        )
    )
    ratio = 1.0 - F.col("n_unique") / F.col("n_grams")
    return per_doc.filter(ratio > 0.05).select(
        "doc_id", "n_grams", F.round(ratio, 4).alias("dup_gram_ratio")
    )


@query(
    "curriculum_quality_deciles",
    oracle=f"""
        WITH q AS ({_QUALITY_SQL})
        SELECT decile,
               count(*) AS n_docs,
               min(quality_score_bp) AS min_score_bp,
               max(quality_score_bp) AS max_score_bp,
               CAST(sum(n_tokens) AS BIGINT) AS n_tokens
        FROM (
            SELECT quality_score_bp, n_tokens,
                   ntile(10) OVER (
                       ORDER BY quality_score_bp, doc_id
                   ) AS decile
            FROM q
        )
        GROUP BY decile
    """,
)
def curriculum_quality_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum bucketing: rank the corpus by quality score into ten
    equal-count deciles and report each bucket's document count, score
    range, and token budget — the summary a curriculum/annealing schedule
    consumes (train low→high quality, or upsample the top deciles).
    doc_id is the deterministic tie-break inside equal scores.

    Scale (VERDICT r3 #2 — promise retired): the decile assignment is
    the DISTRIBUTED exact ntile over a static monotone bucketing
    (functions/ranking.distributed_ntile_static — 250-bp score bands):
    one bounded bucket aggregate + one bucket-partitioned window, no
    single-partition WindowExec; only (score_bp, n_tokens, doc_id)
    triples move through the shuffle, never text. Bit-equal to the SQL
    ntile oracle because (score, doc_id) is a total ordering.
    """
    from ..functions.ranking import distributed_ntile_static

    q = text_quality_score(spark, sf_dir)
    return (
        distributed_ntile_static(
            q.select("quality_score_bp", "n_tokens", "doc_id"),
            10,
            F.expr("quality_score_bp div 250").cast("long"),
            ["quality_score_bp", "doc_id"],
            "decile",
        )
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("quality_score_bp").alias("min_score_bp"),
            F.max("quality_score_bp").alias("max_score_bp"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
    )


_BOILERPLATE_DF_FRAC = 0.02  # a 2-gram present in >2% of docs is boilerplate


@query(
    "text_boilerplate_ngram_removal",
    oracle=f"""
        WITH grams AS (
            SELECT DISTINCT doc_id,
                   array_to_string(words[i + 1 : i + 2], ' ') AS gram
            FROM (SELECT doc_id, string_split(text, ' ') AS words
                  FROM documents),
                 UNNEST(range(greatest(len(words) - 1, 1))) AS t(i)
        ),
        filtered AS (SELECT * FROM grams WHERE gram <> ''),
        n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM filtered),
        df AS (
            SELECT gram, count(*) AS doc_freq
            FROM filtered GROUP BY gram
        ),
        flagged AS (
            SELECT f.doc_id, f.gram,
                   CASE WHEN d.doc_freq > {_BOILERPLATE_DF_FRAC} * n.n_docs
                        THEN 1 ELSE 0 END AS is_boiler
            FROM filtered f JOIN df d ON f.gram = d.gram, n
        )
        SELECT doc_id,
               count(*) AS n_grams,
               CAST(sum(is_boiler) AS BIGINT) AS n_boilerplate,
               round(sum(is_boiler) * 1.0 / count(*), 4) AS boilerplate_ratio
        FROM flagged GROUP BY doc_id
    """,
)
def text_boilerplate_ngram_removal(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Corpus-level boilerplate detection (the cross-document complement
    of text_repetition_ratio's within-document filter): a word 2-gram
    occurring in more than 2% of all documents is boilerplate (headers,
    navigation chrome, license blurbs); per document, report how much of
    its distinct-gram mass that removal would drop — the accounting a
    CCNet-style cleaning stage emits before stripping.

    Scale: document frequency is a (gram → count) aggregate over the
    exploded distinct grams — one shuffle keyed by gram; the flag join is
    an equi-join on the same key, so it reuses the partitioning. The DF
    table is vocabulary-sized; against a hot gram skew, AQE splits the
    fat reducers. No all-pairs anything.
    """
    docs = load_table(spark, sf_dir, "documents")
    k = 2
    words = F.split(F.col("text"), " ")
    grams_arr = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - k, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, k)),
    )
    from ..functions.caching import scoped_persist

    # three plan branches (doc count, DF table, flag join) read the
    # exploded grams; persist so the explode+distinct runs once
    grams = scoped_persist(
        docs.select("doc_id", F.explode(grams_arr).alias("gram"))
        .filter(F.col("gram") != "")
        .distinct()
    )
    n = grams.agg(F.countDistinct("doc_id").alias("n_docs"))
    df_tbl = grams.groupBy("gram").agg(F.count("*").alias("doc_freq"))
    boiler = F.when(
        F.col("doc_freq") > F.lit(_BOILERPLATE_DF_FRAC) * F.col("n_docs"), 1
    ).otherwise(0)
    return (
        grams.join(df_tbl, "gram")
        .crossJoin(F.broadcast(n))
        .select("doc_id", boiler.alias("is_boiler"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum("is_boiler").cast("long").alias("n_boilerplate"),
            F.round(F.sum("is_boiler") / F.count("*"), 4).alias(
                "boilerplate_ratio"
            ),
        )
    )


@query(
    "text_unigram_logprob_filter",
    oracle="""
        WITH words AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS word
            FROM documents
        ),
        tok AS (SELECT doc_id, word FROM words WHERE word <> ''),
        freq AS (
            SELECT word,
                   count(*) AS c,
                   (SELECT count(*) FROM tok) AS total
            FROM tok GROUP BY word
        ),
        scored AS (
            SELECT t.doc_id,
                   CAST(round(-ln(f.c * 1.0 / f.total), 9)
                        AS DECIMAL(18,9)) AS neg_logp
            FROM tok t JOIN freq f ON t.word = f.word
        )
        SELECT doc_id,
               count(*) AS n_tokens,
               round(CAST(sum(neg_logp) AS DOUBLE) / count(*), 4)
                   AS avg_neg_logp,
               (CAST(sum(neg_logp) AS DOUBLE) / count(*) > 4.0)
                   AS is_surprising
        FROM scored GROUP BY doc_id
    """,
)
def text_unigram_logprob_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model quality filter — the oracle-checkable proxy
    for CCNet/Gopher LM-perplexity filtering: corpus unigram
    probabilities give each document a mean surprisal (-ln p per token);
    gibberish and OOV-heavy docs score high, boilerplate scores low, and
    the 4.0-nat threshold flags the 'surprising' tail a pretraining
    pipeline routes to stricter review.

    Cross-engine float discipline: each token's -ln p is rounded to 9
    decimals and cast to DECIMAL before summation, so the per-document
    sum is exact and ASSOCIATIVE — groupBy float sums are
    accumulation-order-dependent in both engines and would flip the
    value hash otherwise (same trick as the DECIMAL price sums).

    Scale: the frequency table is vocabulary-sized (broadcast); scoring
    is one equi-join on word + one keyed aggregate — shuffles carry
    tokens once, and a real LM swaps the broadcast table for a scoring
    UDF without changing the plan.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("word")
        )
        .filter(F.col("word") != "")
    )
    from ..functions.caching import scoped_persist

    tok = scoped_persist(tok)
    total = tok.count()  # scalar: corpus token count
    freq = tok.groupBy("word").agg(F.count("*").alias("c"))
    neg_logp = F.round(
        -F.log(F.col("c") * 1.0 / F.lit(total)), 9
    ).cast("decimal(18,9)")
    scored = tok.join(F.broadcast(freq), "word").select(
        "doc_id", neg_logp.alias("neg_logp")
    )
    avg = F.col("sum_nlp").cast("double") / F.col("n_tokens")
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("neg_logp").alias("sum_nlp"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.round(avg, 4).alias("avg_neg_logp"),
            (avg > 4.0).alias("is_surprising"),
        )
    )


@query(
    "udtf_sentence_offsets",
    oracle="""
        WITH parts AS (
          SELECT doc_id, string_split(text, '. ') AS ps FROM documents
        ),
        exploded AS (
          SELECT doc_id, ord, ps[ord] AS sentence
          FROM parts, LATERAL (
            SELECT unnest(generate_series(1, array_length(ps))) AS ord
          ) g
        )
        SELECT doc_id,
               CAST(ord AS BIGINT) AS sent_idx,
               sentence,
               CAST(coalesce(sum(length(sentence) + 2) OVER (
                   PARTITION BY doc_id ORDER BY ord
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS char_offset
        FROM exploded
    """,
)
def udtf_sentence_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 user-defined TABLE function) splitting each
    document into sentences with 1-based index and running character
    offset, applied per input row via a SQL LATERAL join — the
    set-returning-function API surface (one input row → N output rows
    with cross-row state, here the offset accumulator).

    This is the deliberate exception to the no-row-Python rule
    (COVERAGE.md §2.10): the point is the UDTF contract itself —
    class-based ``eval`` generator, declared return schema, LATERAL
    correlation. The pure-builtin equivalent for hot paths is the
    ``document_chunking`` / ``explode(split(...))`` family; offsets fall
    out of the generator's loop variable here, vs a window prefix-sum
    there.

    Scale: the UDTF runs embarrassingly parallel per partition (Arrow
    batches in, rows out); no shuffle is introduced. Keep such functions
    off the hot path at 100 TB unless the logic genuinely needs
    imperative per-row state.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType=(
        "doc_id bigint, sent_idx bigint, sentence string, char_offset bigint"
    ))
    class SentenceSplit:
        def eval(self, doc_id: int, text: str):
            pos = 0
            for i, s in enumerate((text or "").split(". "), start=1):
                yield doc_id, i, s, pos
                pos += len(s) + 2

    spark.udtf.register("split_sentences", SentenceSplit)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "__udtf_docs"
    )
    return spark.sql(
        """
        SELECT s.doc_id, s.sent_idx, s.sentence, s.char_offset
        FROM __udtf_docs d,
             LATERAL split_sentences(d.doc_id, d.text) s
        """
    )


_CLS_STOP_IN = ", ".join(f"'{s}'" for s in _STOPWORDS)

@query(
    "text_quality_classifier",
    oracle=f"""
        WITH feats AS (
            SELECT doc_id,
                   CAST(len(words) AS DOUBLE) AS n,
                   CAST(len(list_distinct(words)) AS DOUBLE) AS n_uniq,
                   CAST(len(list_filter(words, w -> w IN ({_CLS_STOP_IN})))
                        AS DOUBLE) AS n_stop,
                   CAST(list_sum(list_transform(words, w -> len(w)))
                        AS DOUBLE) AS sum_len
            FROM (SELECT doc_id, string_split(text, ' ') AS words
                  FROM documents)
        ),
        scored AS (
            SELECT doc_id,
                   CAST(n AS BIGINT) AS n_words,
                   -1.6 + 0.8 * (n / 100.0) + 2.0 * (n_uniq / n)
                        + -1.5 * (n_stop / n) + 0.12 * (sum_len / n) AS logit
            FROM feats
        )
        SELECT doc_id, n_words,
               CAST(floor(logit * 10000 + 0.5) AS BIGINT) AS logit_bp,
               logit > 0.0 AS keep
        FROM scored
    """,
)
def text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality-classifier INFERENCE (fastText/logistic-regression
    style, the production replacement for text_quality_score's hand
    heuristic): a fixed weight vector — stand-in for offline-trained
    coefficients — over four engineered features (scaled length,
    type-token ratio, stopword ratio, mean word length), producing a
    logit and a binary keep decision. The deploy-time shape of every
    model-based corpus filter: featurize → dot product → threshold.

    The logit is emitted as integer basis points (floor(x*10000+0.5),
    same rationale as text_quality_score) and the features/weights are
    combined in identical left-to-right IEEE order in both engines, so
    the hash-compare is bit-exact without transcendentals (the sigmoid is
    monotone, so thresholding the logit IS thresholding the probability).

    Scale: map-only — array arithmetic per row inside whole-stage
    codegen, no shuffle, no Python. A real trained model with thousands
    of n-gram features would swap the four expressions for a sparse
    dot product against a broadcast weight map; the plan shape (scan →
    project → filter) is unchanged.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n = F.size(words).cast("double")
    n_uniq = F.size(F.array_distinct(words)).cast("double")
    n_stop = F.size(
        F.filter(words, lambda w: w.isin(*_STOPWORDS))
    ).cast("double")
    sum_len = F.aggregate(
        F.transform(words, F.length), F.lit(0), lambda acc, v: acc + v
    ).cast("double")
    logit = (
        F.lit(-1.6)
        + F.lit(0.8) * (n / F.lit(100.0))
        + F.lit(2.0) * (n_uniq / n)
        + F.lit(-1.5) * (n_stop / n)
        + F.lit(0.12) * (sum_len / n)
    )
    return docs.select(
        "doc_id",
        n.cast("long").alias("n_words"),
        F.floor(logit * 10000 + F.lit(0.5)).cast("long").alias("logit_bp"),
        (logit > 0.0).alias("keep"),
    )


VOCAB_TOPV = 100


@query(
    "vocab_coverage_topv",
    oracle=f"""
        WITH tok AS (
            SELECT unnest(string_split(text, ' ')) AS token FROM documents
        ),
        freq AS (SELECT token, count(*) AS freq FROM tok GROUP BY 1),
        tot AS (SELECT CAST(sum(freq) AS BIGINT) AS t FROM freq),
        topv AS (
            SELECT token, freq,
                   row_number() OVER (ORDER BY freq DESC, token) AS rank
            FROM freq ORDER BY freq DESC, token LIMIT {VOCAB_TOPV}
        )
        SELECT rank, token, CAST(freq AS BIGINT) AS freq,
               CAST((sum(freq) OVER (ORDER BY rank) * 1000000)
                    // (SELECT t FROM tot) AS BIGINT) AS coverage_ppm
        FROM topv
    """,
)
def vocab_coverage_topv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary construction head: the corpus's top-{VOCAB_TOPV} tokens
    by frequency with CUMULATIVE coverage (parts-per-million of all token
    occurrences) — the curve a tokenizer-training run reads to size its
    vocab ("how many types cover 95% of tokens"). Coverage is integer
    ppm via floor division, bit-exact across engines.

    Scale: token counting is the canonical skewed aggregation — partial
    (map-side) aggregation collapses each task's head-token counts before
    the shuffle, so the hot tokens ship one partial per task rather than
    one row per occurrence. The top-V cut plans as TakeOrdered (no global
    sort), and the cumulative window then runs over V rows — a single
    tiny partition AFTER the data has been reduced to the vocabulary
    head, not over the corpus. The full-vocab variant (no LIMIT) would
    swap the single-partition cumsum for the two-phase distributed
    prefix sum used by pack_concat_chunks.
    """
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
    )
    total = freq.agg(F.sum("freq").cast("long").alias("t")).collect()[0].t
    topv = (
        freq.orderBy(F.col("freq").desc(), "token")
        .limit(VOCAB_TOPV)
        .withColumn(
            "rank",
            F.row_number().over(W.orderBy(F.col("freq").desc(), "token")),
        )
    )
    cum = F.sum("freq").over(
        W.orderBy("rank").rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return topv.withColumn("cum", cum).select(
        "rank",
        "token",
        F.col("freq").cast("long").alias("freq"),
        F.expr(f"(cum * 1000000) div {total}")
        .cast("long")
        .alias("coverage_ppm"),
    )


JW_THRESHOLD = 0.85  # Jaro-Winkler match cutoff (after first-word blocking)


def _jaro_winkler(s1: str, s2: str) -> float:
    """Standard Jaro-Winkler (prefix scale 0.1, boost threshold 0.7, max
    prefix 4) — the exact definition DuckDB's ``jaro_winkler_similarity``
    implements, verified bit-equal on the full part-name dictionary."""
    len1, len2 = len(s1), len(s2)
    if not len1 or not len2:
        return 0.0  # DuckDB scores ANY empty side 0, even '' vs ''
    if s1 == s2:
        return 1.0
    match_dist = max(len1, len2) // 2 - 1
    m1 = [False] * len1
    m2 = [False] * len2
    matches = 0
    for i, ch in enumerate(s1):
        lo = max(0, i - match_dist)
        hi = min(len2, i + match_dist + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == ch:
                m1[i] = m2[j] = True
                matches += 1
                break
    if not matches:
        return 0.0
    t = 0
    k = 0
    for i in range(len1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    j = (matches / len1 + matches / len2 + (matches - t) / matches) / 3
    if j > 0.7:
        prefix = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            prefix += 1
        j += prefix * 0.1 * (1 - j)
    return j


@query(
    "fuzzy_match_jaro_winkler",
    oracle=f"""
        WITH names AS (SELECT DISTINCT p_name FROM part),
        b AS (SELECT p_name, string_split(p_name, ' ')[1] AS blk
              FROM names)
        SELECT a.blk, a.p_name AS name_a, c.p_name AS name_b,
               round(jaro_winkler_similarity(a.p_name, c.p_name), 4) AS jw
        FROM b a JOIN b c ON a.blk = c.blk AND a.p_name < c.p_name
        WHERE jaro_winkler_similarity(a.p_name, c.p_name)
                  >= {JW_THRESHOLD}
    """,
)
def fuzzy_match_jaro_winkler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaro-Winkler fuzzy matching over the DISTINCT part-name
    dictionary, blocked on the first name token — the second
    entity-resolution primitive alongside the edit-distance pass
    (fuzzy_name_match_levenshtein): JW favors shared prefixes and
    transpositions, catching near-matches Levenshtein's uniform edit
    cost ranks poorly. Spark has no builtin JW, so the scorer is an
    Arrow-batched pandas UDF over the blocked pair table; DuckDB's
    native ``jaro_winkler_similarity`` is the oracle (the pure-Python
    kernel reproduces it bit-for-bit — same matching-window/transposition
    /prefix-boost definition).

    Scale: the leverage ordering is identical to the Levenshtein query —
    (1) dedupe to the name dictionary first (pair count is dictionary²,
    not rows²); (2) block BEFORE scoring (first-token equality cuts
    pairs by ~the block count); (3) the UDF is the slow path but runs
    AFTER blocking, over Arrow batches, embarrassingly parallel across
    pair partitions. Row-level matches come from equi-joining the pair
    table back on name.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def jw_udf(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [_jaro_winkler(x, y) for x, y in zip(a, b)], dtype="float64"
        )

    p = load_table(spark, sf_dir, "part")
    names = p.select("p_name").distinct()
    blocked = names.select(
        "p_name", F.split("p_name", " ").getItem(0).alias("blk")
    )
    a, c = blocked.alias("a"), blocked.alias("c")
    pairs = a.join(
        c,
        (F.col("a.blk") == F.col("c.blk"))
        & (F.col("a.p_name") < F.col("c.p_name")),
    ).select(
        F.col("a.blk").alias("blk"),
        F.col("a.p_name").alias("name_a"),
        F.col("c.p_name").alias("name_b"),
    )
    return (
        pairs.withColumn("jw_raw", jw_udf("name_a", "name_b"))
        .filter(F.col("jw_raw") >= JW_THRESHOLD)
        .select(
            "blk", "name_a", "name_b", F.round("jw_raw", 4).alias("jw")
        )
    )


@query(
    "bpe_merge_pair_counts",
    oracle="""
        WITH toks AS (
            SELECT unnest(string_split(text, ' ')) AS tok FROM documents
        ),
        pairs AS (
            SELECT unnest(list_transform(
                       range(1, length(tok)),
                       i -> substring(tok, CAST(i AS INTEGER), 2)))
                   AS pair
            FROM toks WHERE length(tok) >= 2
        ),
        counted AS (
            SELECT pair, count(*) AS n,
                   row_number() OVER (ORDER BY count(*) DESC, pair) AS rk
            FROM pairs GROUP BY pair
        )
        SELECT rk, pair, n FROM counted WHERE rk <= 20
    """,
)
def bpe_merge_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One iteration of byte-pair-encoding vocabulary induction: count
    every adjacent character pair inside whitespace tokens across the
    corpus and rank the top merge candidates — the inner loop of BPE/
    WordPiece tokenizer training, expressed as explode + aggregate.
    Companion to the token-side surface (text_token_count,
    vocab_coverage_topv): those CONSUME a tokenizer, this trains one.

    Scale: the pair explosion is row-local (transform over a character
    index sequence — JVM higher-order functions, no Python), and the
    dominant aggregation is partial: each task pre-counts its pairs
    before the exchange, so the shuffle carries |alphabet|² rows per
    task regardless of corpus size. The global top-20 rank runs over
    that tiny counted relation in one partition. Iterated BPE training
    (merge, re-tokenize, recount) is this plan in a driver loop with
    the merge table broadcast back — each round costs one scan.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.length("tok") >= 2)
    pairs = toks.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("tok") - 1),
                lambda i: F.substring(F.col("tok"), i, F.lit(2)),
            )
        ).alias("pair")
    )
    counted = pairs.groupBy("pair").agg(F.count("*").alias("n"))
    w = Window.orderBy(F.col("n").desc(), "pair")
    return (
        counted.select(F.row_number().over(w).alias("rk"), "pair", "n")
        .filter(F.col("rk") <= 20)
    )


ZIPF_TOP = 2000  # fit over the head of the rank-frequency curve


@query(
    "zipf_law_fit_vocab",
    oracle=f"""
        WITH words AS (
            SELECT unnest(string_split(text, ' ')) AS w FROM documents
        ),
        freq AS (
            SELECT w, count(*) AS n FROM words
            WHERE length(w) > 0 GROUP BY w
        ),
        ranked AS (
            SELECT n, row_number() OVER (ORDER BY n DESC, w) AS rank
            FROM freq
        )
        SELECT count(*) AS n_types,
               round(-regr_slope(ln(CAST(n AS DOUBLE)),
                                 ln(CAST(rank AS DOUBLE))), 4) AS zipf_alpha,
               round(regr_r2(ln(CAST(n AS DOUBLE)),
                             ln(CAST(rank AS DOUBLE))), 4) AS fit_r2
        FROM ranked WHERE rank <= {ZIPF_TOP}
    """,
)
def zipf_law_fit_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus vocabulary: regress log-frequency
    on log-rank over the distribution's head; the negated slope is the
    Zipf exponent (natural corpora ≈ 1) and R² measures power-law fit —
    the corpus-statistics diagnostic that flags synthetic, templated, or
    degenerate text before it poisons a training mix (complements the
    per-document quality scores with a corpus-level check).

    Scale (VERDICT r3 #2 watch list — promise retired): token counting
    partial-aggregates map-side (|vocab| rows per task cross the wire,
    not tokens); the global rank is the DISTRIBUTED exact rank
    (functions/ranking.with_global_rank — range repartition +
    per-partition row_number + bounded offset prefix), so the
    vocabulary relation never funnels into one WindowExec partition.
    """
    from ..functions.ranking import with_global_rank

    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count("*").alias("n"))
    )
    ranked = with_global_rank(
        freq, [F.col("n").desc(), F.col("w")], "rank"
    ).filter(F.col("rank") <= ZIPF_TOP).select("n", "rank")
    ln_n = F.log(F.col("n").cast("double"))
    ln_r = F.log(F.col("rank").cast("double"))
    return ranked.agg(
        F.count("*").alias("n_types"),
        F.round(-F.regr_slope(ln_n, ln_r), 4).alias("zipf_alpha"),
        F.round(F.regr_r2(ln_n, ln_r), 4).alias("fit_r2"),
    )


BIGRAM_SURPRISAL_THRESHOLD = 3.45  # nats; calibrated so the synthetic
# corpus flags a real tail at every SF (a vacuous always-false flag
# would prove nothing — the embedding_norm_qa lesson)


@query(
    "text_bigram_logprob_filter",
    oracle=f"""
        WITH ws AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), w -> w <> '')
                       AS ws
            FROM documents
        ),
        tokv AS (
            SELECT count(DISTINCT w) AS v
            FROM (SELECT unnest(ws) AS w FROM ws)
        ),
        big AS (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(ws)),
                          i -> ws[i] || ' ' || ws[i + 1])) AS bg
            FROM ws
        ),
        cnt AS (SELECT bg, count(*) AS c FROM big GROUP BY bg),
        leftc AS (
            SELECT split_part(bg, ' ', 1) AS a, count(*) AS ca
            FROM big GROUP BY 1
        ),
        scored AS (
            SELECT b.doc_id,
                   CAST(round(-ln((c.c + 1.0) / (l.ca + t.v)), 9)
                        AS DECIMAL(18,9)) AS nlp
            FROM big b
            JOIN cnt c ON c.bg = b.bg
            JOIN leftc l ON l.a = split_part(b.bg, ' ', 1)
            CROSS JOIN tokv t
        )
        SELECT doc_id,
               count(*) AS n_bigrams,
               round(CAST(sum(nlp) AS DOUBLE) / count(*), 4)
                   AS avg_neg_logp,
               (CAST(sum(nlp) AS DOUBLE) / count(*)
                    > {BIGRAM_SURPRISAL_THRESHOLD}) AS is_incoherent
        FROM scored GROUP BY doc_id
    """,
)
def text_bigram_logprob_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model coherence filter — the conditional sibling
    of text_unigram_logprob_filter: each document scores the mean
    -ln P(wᵢ | wᵢ₋₁) under the corpus bigram model with add-1
    smoothing (V = unigram vocabulary). Unigram surprisal catches rare
    WORDS; bigram surprisal catches wrong word ORDER — shuffled or
    machine-mangled text whose unigram profile is perfectly normal.
    The flagged tail is what a pretraining pipeline routes past the
    cheap filters to an actual LM scorer.

    Cross-engine float discipline: per-bigram -ln p rounded to 9
    decimals and cast to DECIMAL before the per-doc sum (associative),
    exactly as the unigram filter. Bigrams join on the token pair as a
    single space-joined string — tokens cannot contain spaces (they
    come from a space split), so the encoding is injective.

    Scale: two corpus count tables (bigram and left-context), both
    keyed aggregates; scoring is two equi-joins on the bigram/left key
    plus one keyed aggregate. The bigram table is NOT broadcast — at
    corpus scale it exceeds the unigram vocabulary by orders of
    magnitude, so both joins shuffle on the key, which AQE sizes; the
    vocabulary size is the only driver scalar.
    """
    docs = load_table(spark, sf_dir, "documents")
    ws = F.filter(F.split(F.col("text"), " "), lambda w: w != "")
    n = F.size(ws)
    pair_len = F.greatest(n - 1, F.lit(0))
    bg_arr = F.zip_with(
        F.slice(ws, 1, pair_len),
        F.slice(ws, 2, pair_len),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    from ..functions.caching import scoped_persist

    big = scoped_persist(
        docs.select("doc_id", F.explode(bg_arr).alias("bg"))
    )
    v = (
        docs.select(F.explode(ws).alias("w"))
        .agg(F.countDistinct("w"))
        .first()[0]
    )  # scalar: unigram vocabulary size
    cnt = big.groupBy("bg").agg(F.count("*").alias("c"))
    leftc = big.groupBy(
        F.split_part(F.col("bg"), F.lit(" "), F.lit(1)).alias("a")
    ).agg(F.count("*").alias("ca"))
    nlp = F.round(
        -F.log((F.col("c") + 1.0) / (F.col("ca") + F.lit(float(v)))), 9
    ).cast("decimal(18,9)")
    scored = (
        big.join(cnt, "bg")
        .withColumn(
            "a", F.split_part(F.col("bg"), F.lit(" "), F.lit(1))
        )
        .join(leftc, "a")
        .select("doc_id", nlp.alias("nlp"))
    )
    avg = F.col("sum_nlp").cast("double") / F.col("n_bigrams")
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("nlp").alias("sum_nlp"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.round(avg, 4).alias("avg_neg_logp"),
            (avg > BIGRAM_SURPRISAL_THRESHOLD).alias("is_incoherent"),
        )
    )


@query(
    "text_heaps_law_fit",
    oracle="""
        WITH perdoc AS (
            SELECT doc_id,
                   len(list_filter(string_split(text, ' '),
                                   w -> w <> '')) AS n_tokens,
                   len(list_distinct(list_filter(string_split(text, ' '),
                                                 w -> w <> ''))) AS n_types
            FROM documents
        ),
        pts AS (
            SELECT ln(CAST(n_tokens AS DOUBLE)) AS x,
                   ln(CAST(n_types AS DOUBLE)) AS y
            FROM perdoc WHERE n_tokens > 0
        ),
        mom AS (
            SELECT count(*) AS n,
                   sum(CAST(round(x, 9) AS DECIMAL(18,9))) AS sx,
                   sum(CAST(round(y, 9) AS DECIMAL(18,9))) AS sy,
                   sum(CAST(round(x * x, 9) AS DECIMAL(18,9))) AS sxx,
                   sum(CAST(round(x * y, 9) AS DECIMAL(18,9))) AS sxy
            FROM pts
        )
        SELECT CAST(n AS BIGINT) AS n_docs,
               CAST(floor(
                   (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
                        * CAST(sy AS DOUBLE))
                   / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                          * CAST(sx AS DOUBLE))
                   * 1000000 + 0.5) AS BIGINT) AS heaps_beta_e6,
               CAST(floor(exp(
                   CAST(sy AS DOUBLE) / n
                   - (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
                          * CAST(sy AS DOUBLE))
                     / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                            * CAST(sx AS DOUBLE))
                     * CAST(sx AS DOUBLE) / n)
                   * 1000 + 0.5) AS BIGINT) AS heaps_k_e3
        FROM mom
    """,
)
def text_heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit of vocabulary growth: V(N) ≈ K·N^β estimated by
    regressing ln(types) on ln(tokens) across per-document points —
    the corpus diagnostic PAIRED with `zipf_law_fit_vocab` (Zipf: how
    frequency decays within the vocabulary; Heaps: how the vocabulary
    GROWS with corpus size — natural text sits near β ≈ 0.5-0.7, and a
    drifting β across ingestion batches signals templated or
    duplicated content entering the mix).

    Unlike the Zipf query (which leans on rounded `regr_*` builtins),
    the regression here is computed from EXACT moments: each per-doc
    term (x, y, x², xy) is rounded to 9 decimals and DECIMAL-summed,
    so the four aggregates are associative and bit-identical in both
    engines; β and K then derive from those exact inputs through an
    identical double-precision expression — no summation-order float
    hazard anywhere (memory: cross-engine-float-traps).

    Scale: one groupBy-free pass — per-doc token/type counts are
    row-local array ops (no explode, no shuffle), and the moment
    aggregate is a constant-size partial state merged map-side; the
    whole fit costs one scan regardless of SF.
    """
    words = F.filter(F.split(F.col("text"), " "), lambda w: w != "")
    perdoc = load_table(spark, sf_dir, "documents").select(
        F.size(words).alias("n_tokens"),
        F.size(F.array_distinct(words)).alias("n_types"),
    ).filter(F.col("n_tokens") > 0)
    x = F.log(F.col("n_tokens").cast("double"))
    y = F.log(F.col("n_types").cast("double"))
    dec = "decimal(18,9)"
    mom = perdoc.agg(
        F.count("*").alias("n"),
        F.sum(F.round(x, 9).cast(dec)).alias("sx"),
        F.sum(F.round(y, 9).cast(dec)).alias("sy"),
        F.sum(F.round(x * x, 9).cast(dec)).alias("sxx"),
        F.sum(F.round(x * y, 9).cast(dec)).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    sxy = F.col("sxy").cast("double")
    beta = (nd * sxy - sx * sy) / (nd * sxx - sx * sx)
    k = F.exp(sy / nd - beta * sx / nd)
    return mom.select(
        F.col("n").cast("long").alias("n_docs"),
        F.floor(beta * 1000000 + 0.5).cast("long").alias("heaps_beta_e6"),
        F.floor(k * 1000 + 0.5).cast("long").alias("heaps_k_e3"),
    )


@query(
    "text_char_bigram_entropy",
    oracle="""
        WITH grams AS (
            SELECT doc_id, substr(text, CAST(i AS INTEGER), 2) AS g
            FROM documents, UNNEST(range(1, length(text))) AS t(i)
        ),
        cnt AS (
            SELECT doc_id, g, count(*) AS c FROM grams GROUP BY 1, 2
        ),
        tot AS (
            SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
                   count(*) AS n_distinct
            FROM cnt GROUP BY 1
        ),
        terms AS (
            SELECT c.doc_id,
                   CAST(round(
                       -(CAST(c.c AS DOUBLE) / t.n)
                       * log2(CAST(c.c AS DOUBLE) / t.n), 9)
                   AS DECIMAL(18,9)) AS term
            FROM cnt c JOIN tot t ON c.doc_id = t.doc_id
        )
        SELECT t.doc_id, t.n AS n_bigrams,
               CAST(t.n_distinct AS BIGINT) AS n_distinct_bigrams,
               CAST(floor(CAST(s.h AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
                   AS entropy_e6
        FROM tot t
        JOIN (SELECT doc_id, sum(term) AS h FROM terms GROUP BY 1) s
          ON t.doc_id = s.doc_id
    """,
)
def text_char_bigram_entropy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-document character-bigram Shannon entropy — the classic
    gibberish/encoding-corruption detector (natural language sits in a
    narrow entropy band; base64 blobs, mojibake, and key-mash score
    far above it, repeated-char padding far below). Complements the
    WORD-level signals (unigram/bigram LM surprisal) with a
    vocabulary-free signal that works on any script.

    Each entropy term −p·log₂p is rounded to 9 decimals and
    DECIMAL-summed per document (the BM25/surprisal discipline), so
    the per-doc entropy is an exact decimal both engines agree on;
    p = c/n is a rational of exact integers, identical doubles.

    Scale: the bigram explode is O(total characters) rows shuffled on
    (doc_id, gram) — partial-aggregated map-side first; everything
    downstream is keyed by doc_id. No window, no global structure.
    """
    grams = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, length(text) - 1),"
                " i -> substring(text, i, 2))"
            )
        ).alias("g"),
    )
    cnt = grams.groupBy("doc_id", "g").agg(F.count("*").alias("c"))
    tot = cnt.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n"),
        F.count("*").cast("long").alias("n_distinct_bigrams"),
    )
    p = F.col("c").cast("double") / F.col("n")
    terms = cnt.join(tot, "doc_id").select(
        "doc_id",
        F.round(-p * F.log2(p), 9).cast("decimal(18,9)").alias("term"),
    )
    h = terms.groupBy("doc_id").agg(F.sum("term").alias("h"))
    return tot.join(h, "doc_id").select(
        "doc_id",
        F.col("n").alias("n_bigrams"),
        "n_distinct_bigrams",
        F.floor(F.col("h").cast("double") * 1000000 + 0.5)
        .cast("long")
        .alias("entropy_e6"),
    )


_TEXTRANK_EDGES_SQL = """
    tok AS (
        SELECT list_filter(string_split(text, ' '), w -> w <> '') AS ws
        FROM documents
    ),
    adjp AS (
        SELECT ws[CAST(i AS INTEGER)] AS a,
               ws[CAST(i AS INTEGER) + 1] AS b
        FROM tok, UNNEST(range(1, len(ws))) AS t(i)
        WHERE ws[CAST(i AS INTEGER)] <> ws[CAST(i AS INTEGER) + 1]
    ),
    edges AS (
        SELECT src, dst, count(*) AS w
        FROM (SELECT a AS src, b AS dst FROM adjp
              UNION ALL SELECT b, a FROM adjp) u
        GROUP BY 1, 2
    )
"""


def _textrank_oracle() -> str:
    from .graph import PR_ITERS, pagerank_oracle_ctes

    ctes = pagerank_oracle_ctes(_TEXTRANK_EDGES_SQL)
    return f"""
        WITH {",".join(ctes)}
        SELECT node AS word, CAST(r AS BIGINT) AS rank_ppb
        FROM r{PR_ITERS}
    """


@query("text_textrank_keywords", oracle=_textrank_oracle())
def text_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword scoring (Mihalcea & Tarau 2004): PageRank over
    the word co-occurrence graph — words are nodes, adjacent word
    pairs are (symmetrized, count-weighted) edges, and the stationary
    score ranks corpus keywords. The graph-centrality complement of
    the frequency-based extractors (tf-idf, vocab coverage): a word
    that BRIDGES many contexts outranks one that merely repeats.

    Runs on the shared integer-exact PageRank kernel
    (operators/graph.py:pagerank_integer — ranks in ppb, floor-div
    contributions) with string node ids; the oracle unrolls the same
    fixed iterations via graph.pagerank_oracle_ctes over a word-
    adjacency edge CTE. Bit-exact in both engines.

    Scale: adjacency explode is O(total tokens) but the edge
    aggregation collapses to |vocab|² at most (vocabulary-bounded, the
    zipf/vocab argument); the rank vector is vocab-sized and broadcast
    each iteration — the whole fixpoint runs on a relation the size of
    the dictionary, not the corpus.
    """
    from .graph import pagerank_integer

    ws = F.filter(F.split(F.col("text"), " "), lambda w: w != "")
    adjp = (
        load_table(spark, sf_dir, "documents")
        .select(ws.alias("ws"))
        .select(
            F.explode(
                F.expr(
                    "zip_with(slice(ws, 1, size(ws) - 1),"
                    " slice(ws, 2, size(ws) - 1),"
                    " (a, b) -> struct(a, b))"
                )
            ).alias("p")
        )
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .filter(F.col("a") != F.col("b"))
    )
    edges = (
        adjp.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionAll(
            adjp.select(F.col("b").alias("src"), F.col("a").alias("dst"))
        )
        .groupBy("src", "dst")
        .agg(F.count("*").alias("w"))
    )
    return pagerank_integer(edges).select(
        F.col("node").alias("word"), F.col("r").alias("rank_ppb")
    )


@query(
    "text_lexical_diversity_by_source",
    oracle="""
        WITH tok AS (
            SELECT source,
                   list_filter(string_split(text, ' '), w -> w <> '')
                       AS ws
            FROM documents
        ),
        w AS (SELECT source, unnest(ws) AS word FROM tok),
        wc AS (
            SELECT source, word, count(*) AS c FROM w GROUP BY 1, 2
        )
        SELECT source,
               CAST(sum(c) AS BIGINT) AS n_tokens,
               count(*) AS n_types,
               CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_hapax,
               count(*) * 10000 // CAST(sum(c) AS BIGINT) AS ttr_bp,
               CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   * 10000 // count(*) AS hapax_bp
        FROM wc GROUP BY source
    """,
)
def text_lexical_diversity_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-source lexical diversity dashboard: type-token ratio and
    hapax-legomenon rate — the per-SOURCE quality screen that pairs
    with the corpus-level laws (Zipf exponent, Heaps growth): a source
    whose TTR or hapax rate collapses relative to its peers is
    templated/machine-generated content entering the mix, and these
    are the numbers a mixing-weight policy (data mixing, source caps)
    consumes. All integer: counts and floor-division basis points.

    Scale: one (source, word) keyed aggregation (map-side partials —
    the wire carries per-task vocabularies, not tokens) + one
    source-keyed rollup; |sources| rows out.
    """
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select(
        "source", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.length("word") > 0)
    wc = w.groupBy("source", "word").agg(F.count("*").alias("c"))
    return wc.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count("*").alias("n_types"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_hapax"),
        F.expr("count(*) * 10000 div CAST(sum(c) AS BIGINT)").alias(
            "ttr_bp"
        ),
        F.expr(
            "CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)"
            " * 10000 div count(*)"
        ).alias("hapax_bp"),
    )


@query(
    "text_language_id_confusion_eval",
    oracle=f"""
        WITH tok AS (SELECT doc_id, lang, string_split(text, ' ') AS words
                     FROM documents),
        pred AS (
            SELECT lang AS actual_lang,
                   CASE
                     {' '.join(f"WHEN {_hits_sql(m)} >= GREATEST({', '.join(_hits_sql(m2) for l2, m2 in sorted(_LANG_MARKERS.items()) if l2 != l)}) AND {_hits_sql(m)} > 0 THEN '{l}'" for l, m in sorted(_LANG_MARKERS.items()))}
                     ELSE 'und'
                   END AS predicted_lang
            FROM tok
        ),
        cells AS (
            SELECT actual_lang, predicted_lang,
                   CAST(count(*) AS BIGINT) AS n
            FROM pred GROUP BY 1, 2
        ),
        rows_t AS (
            SELECT actual_lang, CAST(sum(n) AS BIGINT) AS row_n
            FROM cells GROUP BY 1
        )
        SELECT c.actual_lang, c.predicted_lang, c.n,
               c.n * 10000 // r.row_n AS row_share_bp,
               c.actual_lang = c.predicted_lang AS is_correct
        FROM cells c JOIN rows_t r ON c.actual_lang = r.actual_lang
    """,
)
def text_language_id_confusion_eval(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Confusion matrix of the language-ID heuristic against the
    corpus's GROUND-TRUTH lang column — the honest-accuracy pairing
    for `text_language_id` (the same pattern as the Markov and
    recall evals: every heuristic ships with its measured error).
    Diagonal cells carry per-language recall in integer bp
    (row-share of the correct cell); off-diagonal cells localize the
    confusions (which marker sets collide).

    Scale: the per-doc prediction is row-local array ops (no
    shuffle); the matrix is a ≤(|langs|+1)² keyed aggregate.
    """
    pred = text_language_id(spark, sf_dir).select(
        "actual_lang", "predicted_lang"
    )
    cells = pred.groupBy("actual_lang", "predicted_lang").agg(
        F.count("*").cast("long").alias("n")
    )
    rows_t = cells.groupBy("actual_lang").agg(
        F.sum("n").cast("long").alias("row_n")
    )
    return cells.join(F.broadcast(rows_t), "actual_lang").select(
        "actual_lang",
        "predicted_lang",
        "n",
        F.expr("n * 10000 div row_n").alias("row_share_bp"),
        (F.col("actual_lang") == F.col("predicted_lang")).alias(
            "is_correct"
        ),
    )


@query(
    "text_oov_rate_split",
    oracle="""
        WITH tok AS (
            SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
            FROM documents
        ),
        tok2 AS (SELECT doc_id, source, w FROM tok WHERE w <> ''),
        vocab AS (
            SELECT DISTINCT w FROM tok2 WHERE doc_id % 2 = 0
        ),
        test AS (
            SELECT t.source, t.w, v.w AS known
            FROM tok2 t LEFT JOIN vocab v ON t.w = v.w
            WHERE t.doc_id % 2 = 1
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(CASE WHEN known IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_oov,
               CAST(sum(CASE WHEN known IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) * 1000000 // count(*) AS oov_ppm
        FROM test GROUP BY source
    """,
)
def text_oov_rate_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate under a FROZEN vocabulary: the vocab is
    built from half the corpus (even doc ids — "what the tokenizer
    was trained on"), and the other half's token stream is scored for
    OOV per source — the serving-time drift monitor for any
    fixed-vocabulary component (tokenizer, embedding table,
    feature hasher whitelist): a source whose OOV ppm spikes is
    sending vocabulary the model never saw. Pure set-membership
    counting, exact ppm.

    Scale: vocabulary is a distinct aggregate (vocabulary-bounded);
    the membership probe is a broadcast-or-shuffle LEFT join keyed on
    the token; per-source rollup.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "source", F.explode(F.split("text", " ")).alias("w")
    ).filter(F.col("w") != "")
    vocab = (
        tok.filter(F.col("doc_id") % 2 == 0)
        .select("w")
        .distinct()
        .withColumn("known", F.lit(1))
    )
    test = tok.filter(F.col("doc_id") % 2 == 1).join(
        F.broadcast(vocab), "w", "left"
    )
    return test.groupBy("source").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("known").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_oov"),
        F.expr(
            "CAST(sum(CASE WHEN known IS NULL THEN 1 ELSE 0 END)"
            " AS BIGINT) * 1000000 div count(*)"
        ).alias("oov_ppm"),
    )

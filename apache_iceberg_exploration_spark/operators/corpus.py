"""Span-level (substring) duplication analysis over the documents corpus.

The dedup family so far is DOCUMENT-level: exact (md5 of the full
text), MinHash/SimHash/Jaccard near-dup, embedding near-dup. Training
corpora also carry SUB-document duplication — boilerplate sentences,
quoted passages, templated spans — which document-level dedup cannot
see (two docs 5% similar still share a verbatim 40-token quote).
Deduplicating those spans is the "exact substring dedup" of Lee et al.,
"Deduplicating Training Data Makes Language Models Better" (ACL'22).

Their suffix-array construction is a single-machine algorithm; the
Spark-native equivalent used here (and in production corpus pipelines)
is fixed-K token-shingle fingerprinting: every K-token window of every
document becomes one (doc, position, md5-fingerprint) row, a keyed
aggregate finds fingerprints seen in ≥2 distinct documents, and
everything downstream is joins/aggregates on those anchor rows.

Scale shape (the reason this family is Spark-friendly):
- the explode is O(total corpus tokens) — embarrassingly parallel,
  no shuffle;
- the duplicate-fingerprint aggregate is map-side combinable (partial
  counts per partition before the shuffle);
- the anchor⋈duplicate join shuffles on the fingerprint key, where AQE
  skew-split handles hot boilerplate fingerprints;
- the pairwise span reconstruction (longest-common-span) is quadratic
  ONLY in per-fingerprint document frequency, so it composes with the
  same DF-cap used by ``dedup_jaccard_df_capped`` — a fingerprint in
  half the corpus is boilerplate, not a dedup candidate, and is
  excluded from pairing (but still counted in coverage).

Fingerprints are md5 over the space-joined token window — bit-identical
between Spark and DuckDB, so every oracle below hash-matches exactly
(integer outputs only; no float traps).

Reference trace: none — the reference (SURVEY.md §2) has no text plane
at all; this extends the brief's LLM-training-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..sources.io import load_table

K_SPAN = 8  # tokens per shingle: spans shorter than K are not "spans"
PAIR_DF_CAP = 20  # fingerprints in more docs than this are boilerplate
MIN_PAIR_SPAN = 12  # report doc pairs sharing a run of >= this many tokens

# Shared CTE prefix: (doc_id, i, fp) anchor rows for every K-token
# window, and the set of fingerprints duplicated across >= 2 docs.
_ANCHORS_SQL = f"""
        toks AS (
            SELECT doc_id, string_split(text, ' ') AS t FROM documents
            WHERE len(string_split(text, ' ')) >= {K_SPAN}
        ),
        pos AS (
            SELECT doc_id, i,
                   md5(array_to_string(t[i:i+{K_SPAN}-1], ' ')) AS fp
            FROM toks,
                 UNNEST(generate_series(1, len(t) - {K_SPAN} + 1)) AS u(i)
        ),
        dup AS (
            SELECT fp FROM pos GROUP BY fp
            HAVING count(DISTINCT doc_id) >= 2
        )
"""


def _anchor_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, i, fp) for every K-token window (i is 1-based)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.split(F.col("text"), " ").alias("t")
    ).filter(F.size("t") >= K_SPAN)
    # sequence(1, n) with n >= 1 only (filtered above): Spark's sequence
    # runs DESCENDING when stop < start, so the guard is load-bearing.
    return toks.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(1, size(t) - {K_SPAN} + 1), "
                f"i -> md5(array_join(slice(t, i, {K_SPAN}), ' ')))"
            )
        ).alias("i0", "fp"),
    ).select("doc_id", (F.col("i0") + 1).alias("i"), "fp")


def _dup_fingerprints(anchors: DataFrame) -> DataFrame:
    """Fingerprints seen in >= 2 distinct documents (cross-doc spans)."""
    return (
        anchors.groupBy("fp")
        .agg(F.count_distinct("doc_id").alias("span_df"))
        .filter(F.col("span_df") >= 2)
    )


def _spans_per_doc_oracle() -> str:
    return f"""
        WITH {_ANCHORS_SQL.strip()},
        per_doc AS (
            SELECT p.doc_id,
                   count(*) AS n_spans,
                   sum(CASE WHEN d.fp IS NOT NULL THEN 1 ELSE 0 END)
                       AS dup_spans
            FROM pos p LEFT JOIN dup d USING (fp)
            GROUP BY 1
        )
        SELECT doc_id,
               CAST(n_spans AS BIGINT) AS n_spans,
               CAST(dup_spans AS BIGINT) AS dup_spans,
               dup_spans * 10000 // n_spans AS dup_coverage_bp
        FROM per_doc
        WHERE dup_spans > 0
    """


@query("dedup_duplicate_ngram_spans", oracle=_spans_per_doc_oracle())
def dedup_duplicate_ngram_spans(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-document cross-doc duplicated-span exposure: how many of a
    doc's K-token windows are verbatim-shared with at least one OTHER
    document, as a count and a basis-point coverage share. This is the
    triage list for substring-level dedup — documents-level dedup keeps
    both docs, span dedup would rewrite exactly these.

    Scale: one explode (O(corpus tokens)), one map-side-combinable
    fingerprint aggregate, one fp-keyed join, one doc-keyed aggregate.
    No windows, no driver state; hot boilerplate fingerprints are an
    AQE skew-split case on the join key.
    """
    anchors = _anchor_positions(spark, sf_dir)
    dup = _dup_fingerprints(anchors).select("fp", F.lit(1).alias("is_dup"))
    return (
        anchors.join(dup, "fp", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_spans"),
            F.sum(F.coalesce(F.col("is_dup"), F.lit(0)))
            .cast("long")
            .alias("dup_spans"),
        )
        .filter(F.col("dup_spans") > 0)
        .select(
            "doc_id",
            "n_spans",
            "dup_spans",
            F.expr("dup_spans * 10000 div n_spans").alias(
                "dup_coverage_bp"
            ),
        )
    )


def _token_mass_oracle() -> str:
    return f"""
        WITH {_ANCHORS_SQL.strip()},
        covered AS (
            SELECT DISTINCT p.doc_id, p.i + o.off AS tokpos
            FROM pos p
            JOIN dup d USING (fp),
                 UNNEST(generate_series(0, {K_SPAN} - 1)) AS o(off)
        ),
        tok_total AS (
            SELECT CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                       AS total_tokens
            FROM documents
        )
        SELECT total_tokens,
               (SELECT CAST(count(*) AS BIGINT) FROM covered)
                   AS dup_covered_tokens,
               (SELECT count(*) FROM covered) * 10000 // total_tokens
                   AS dup_token_bp
        FROM tok_total
    """


@query("corpus_duplicate_token_mass", oracle=_token_mass_oracle())
def corpus_duplicate_token_mass(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """THE substring-dedup headline number: what fraction of all corpus
    tokens sits inside a cross-doc duplicated K-token span (union of
    overlapping spans — each duplicated anchor covers positions
    i..i+K-1, and overlaps are counted once via the distinct). Lee et
    al. report ~1-10% of tokens in web corpora are inside such spans;
    this measures it for OUR corpus, i.e. the upper bound on what
    span-level dedup can remove.

    Scale: the expansion is O(duplicated anchors × K) — bounded by the
    duplicate mass itself, not the corpus; the distinct is a keyed
    aggregate on (doc, position). Total-token count is one scan.
    """
    anchors = _anchor_positions(spark, sf_dir)
    dup = _dup_fingerprints(anchors).select("fp")
    covered = (
        anchors.join(dup, "fp")
        .select(
            "doc_id",
            F.explode(
                F.expr(f"sequence(i, i + {K_SPAN} - 1)")
            ).alias("tokpos"),
        )
        .distinct()
        .agg(F.count("*").cast("long").alias("dup_covered_tokens"))
    )
    docs = load_table(spark, sf_dir, "documents")
    total = docs.agg(
        F.sum(F.size(F.split(F.col("text"), " ")))
        .cast("long")
        .alias("total_tokens")
    )
    return (
        total.join(F.broadcast(covered))
        .select(
            "total_tokens",
            "dup_covered_tokens",
            F.expr(
                "dup_covered_tokens * 10000 div total_tokens"
            ).alias("dup_token_bp"),
        )
    )


def _longest_shared_oracle() -> str:
    return f"""
        WITH {_ANCHORS_SQL.strip()},
        capped AS (
            SELECT fp FROM pos GROUP BY fp
            HAVING count(DISTINCT doc_id) BETWEEN 2 AND {PAIR_DF_CAP}
        ),
        hits AS (
            SELECT p.fp, p.doc_id, p.i FROM pos p JOIN capped USING (fp)
        ),
        pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   a.i AS ia, a.i - b.i AS diag
            FROM hits a JOIN hits b
              ON a.fp = b.fp AND a.doc_id < b.doc_id
        ),
        islands AS (
            SELECT doc_a, doc_b, diag, ia,
                   ia - row_number() OVER (
                       PARTITION BY doc_a, doc_b, diag ORDER BY ia
                   ) AS island
            FROM (SELECT DISTINCT doc_a, doc_b, diag, ia FROM pairs)
        ),
        runs AS (
            SELECT doc_a, doc_b,
                   count(*) + {K_SPAN} - 1 AS span_tokens
            FROM islands GROUP BY doc_a, doc_b, diag, island
        )
        SELECT doc_a, doc_b,
               CAST(max(span_tokens) AS BIGINT) AS longest_shared_tokens
        FROM runs GROUP BY 1, 2
        HAVING max(span_tokens) >= {MIN_PAIR_SPAN}
    """


@query(
    "dedup_longest_shared_span_pairs", oracle=_longest_shared_oracle()
)
def dedup_longest_shared_span_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Document pairs sharing a verbatim token run of >= MIN_PAIR_SPAN
    tokens, with the length of their longest shared run — the pairwise
    output shape of Lee et al.'s substring dedup, reconstructed from
    K-shingle anchors: two docs sharing a run of L >= K tokens share
    L-K+1 consecutive anchors on one alignment diagonal (ia - ib
    constant), so the longest run is K-1 plus the longest consecutive
    anchor island per (pair, diagonal) — a gaps-and-islands count, not
    a string algorithm.

    Scale: anchor pairing is quadratic ONLY in per-fingerprint doc
    frequency and the DF cap excludes boilerplate fingerprints (the
    ``dedup_jaccard_df_capped`` argument — a shingle in half the corpus
    identifies nothing). The islands window partitions by (pair,
    diagonal) — millions of small partitions, never a global sort.
    """
    anchors = _anchor_positions(spark, sf_dir)
    capped = (
        anchors.groupBy("fp")
        .agg(F.count_distinct("doc_id").alias("span_df"))
        .filter(
            (F.col("span_df") >= 2) & (F.col("span_df") <= PAIR_DF_CAP)
        )
        .select("fp")
    )
    hits = anchors.join(capped, "fp")
    a = hits.alias("a")
    b = hits.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.i").alias("ia"),
            (F.col("a.i") - F.col("b.i")).alias("diag"),
        )
        .distinct()
    )
    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("ia")
    runs = (
        pairs.withColumn("island", F.col("ia") - F.row_number().over(w))
        .groupBy("doc_a", "doc_b", "diag", "island")
        .agg((F.count("*") + F.lit(K_SPAN - 1)).alias("span_tokens"))
    )
    return (
        runs.groupBy("doc_a", "doc_b")
        .agg(
            F.max("span_tokens").cast("long").alias(
                "longest_shared_tokens"
            )
        )
        .filter(F.col("longest_shared_tokens") >= MIN_PAIR_SPAN)
    )


FUNNEL_MIN_TOKENS = 20  # length gate
FUNNEL_TTR_MILLE = 400  # type-token ratio gate (×1000, integer compare)
FUNNEL_SPAN_BP = 5000  # drop docs with >=50% duplicated-span coverage


def _funnel_oracle() -> str:
    return f"""
        WITH {_ANCHORS_SQL.strip()},
        cov AS (
            SELECT p.doc_id,
                   count(*) AS n_spans,
                   sum(CASE WHEN d.fp IS NOT NULL THEN 1 ELSE 0 END)
                       AS dup_spans
            FROM pos p LEFT JOIN dup d USING (fp)
            GROUP BY 1
        ),
        flags AS (
            SELECT doc.doc_id,
                   CAST(len(string_split(doc.text, ' ')) AS BIGINT)
                       AS n_tok,
                   doc.lang = 'en' AS g_lang,
                   len(string_split(doc.text, ' '))
                       >= {FUNNEL_MIN_TOKENS} AS g_len,
                   len(list_distinct(string_split(doc.text, ' ')))
                       * 1000 >= {FUNNEL_TTR_MILLE}
                       * len(string_split(doc.text, ' ')) AS g_ttr,
                   coalesce(cov.dup_spans * 10000
                            < {FUNNEL_SPAN_BP} * cov.n_spans, TRUE)
                       AS g_span
            FROM documents doc LEFT JOIN cov ON doc.doc_id = cov.doc_id
        ),
        stages(stage_order, stage, cond) AS (
            SELECT * FROM (VALUES
                (0, 'total', TRUE),
                (1, 'after_lang', NULL),
                (2, 'after_length', NULL),
                (3, 'after_ttr', NULL),
                (4, 'after_span_dedup', NULL)) v(a, b, c)
        )
        SELECT 0 AS stage_order, 'total' AS stage,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS n_tokens FROM flags
        UNION ALL
        SELECT 1, 'after_lang', count(*), CAST(sum(n_tok) AS BIGINT)
        FROM flags WHERE g_lang
        UNION ALL
        SELECT 2, 'after_length', count(*), CAST(sum(n_tok) AS BIGINT)
        FROM flags WHERE g_lang AND g_len
        UNION ALL
        SELECT 3, 'after_ttr', count(*), CAST(sum(n_tok) AS BIGINT)
        FROM flags WHERE g_lang AND g_len AND g_ttr
        UNION ALL
        SELECT 4, 'after_span_dedup', count(*),
               CAST(sum(n_tok) AS BIGINT)
        FROM flags WHERE g_lang AND g_len AND g_ttr AND g_span
        UNION ALL
        SELECT 5, 'only_lang_removes', count(*),
               CAST(coalesce(sum(n_tok), 0) AS BIGINT)
        FROM flags WHERE NOT g_lang AND g_len AND g_ttr AND g_span
        UNION ALL
        SELECT 6, 'only_length_removes', count(*),
               CAST(coalesce(sum(n_tok), 0) AS BIGINT)
        FROM flags WHERE g_lang AND NOT g_len AND g_ttr AND g_span
        UNION ALL
        SELECT 7, 'only_ttr_removes', count(*),
               CAST(coalesce(sum(n_tok), 0) AS BIGINT)
        FROM flags WHERE g_lang AND g_len AND NOT g_ttr AND g_span
        UNION ALL
        SELECT 8, 'only_span_removes', count(*),
               CAST(coalesce(sum(n_tok), 0) AS BIGINT)
        FROM flags WHERE g_lang AND g_len AND g_ttr AND NOT g_span
    """


@query("corpus_filter_funnel", oracle=_funnel_oracle())
def corpus_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining-corpus filter funnel: document/token survival through
    the sequential cleaning gates (language → length → lexical
    diversity → span-dedup coverage) PLUS marginal attribution — how
    many documents each gate alone removes (fails it, passes all
    others). The report a data-curation run publishes next to its
    dataset card: the funnel says what the pipeline kept, the marginal
    rows say which gate to tune when too much is dying.

    The span gate is the substring-dedup family acting as a FILTER:
    a document whose 8-gram windows are ≥50% cross-doc duplicated is
    dropped as near-boilerplate (coverage from the same anchor
    pipeline as dedup_duplicate_ngram_spans; short docs with no
    windows pass vacuously).

    Scale: flags are one row-local projection over the corpus plus the
    span-coverage aggregate (the corpus.py scale argument); every
    funnel row is a conditional count over the SAME flags relation —
    Spark computes all nine aggregates in one pass (grouping by a
    literal stage id costs a 9× conditional-sum, not 9 scans).
    """
    anchors = _anchor_positions(spark, sf_dir)
    dup = _dup_fingerprints(anchors).select(
        "fp", F.lit(1).alias("is_dup")
    )
    cov = (
        anchors.join(dup, "fp", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_spans"),
            F.sum(F.coalesce(F.col("is_dup"), F.lit(0))).alias(
                "dup_spans"
            ),
        )
    )
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    flags = (
        docs.join(cov, "doc_id", "left")
        .select(
            F.size(toks).cast("long").alias("n_tok"),
            (F.col("lang") == "en").alias("g_lang"),
            (F.size(toks) >= FUNNEL_MIN_TOKENS).alias("g_len"),
            (
                F.size(F.array_distinct(toks)) * 1000
                >= F.lit(FUNNEL_TTR_MILLE) * F.size(toks)
            ).alias("g_ttr"),
            F.coalesce(
                F.col("dup_spans") * 10000
                < F.lit(FUNNEL_SPAN_BP) * F.col("n_spans"),
                F.lit(True),
            ).alias("g_span"),
        )
        .localCheckpoint()  # pin: nine conditional aggregates below
    )

    def stage(order: int, name: str, cond) -> DataFrame:
        return flags.filter(cond).agg(
            F.lit(order).alias("stage_order"),
            F.lit(name).alias("stage"),
            F.count("*").cast("long").alias("n_docs"),
            F.coalesce(F.sum("n_tok"), F.lit(0))
            .cast("long")
            .alias("n_tokens"),
        )

    g = {c: F.col(c) for c in ("g_lang", "g_len", "g_ttr", "g_span")}
    out = stage(0, "total", F.lit(True))
    for o, name, cond in (
        (1, "after_lang", g["g_lang"]),
        (2, "after_length", g["g_lang"] & g["g_len"]),
        (3, "after_ttr", g["g_lang"] & g["g_len"] & g["g_ttr"]),
        (
            4,
            "after_span_dedup",
            g["g_lang"] & g["g_len"] & g["g_ttr"] & g["g_span"],
        ),
        (
            5,
            "only_lang_removes",
            ~g["g_lang"] & g["g_len"] & g["g_ttr"] & g["g_span"],
        ),
        (
            6,
            "only_length_removes",
            g["g_lang"] & ~g["g_len"] & g["g_ttr"] & g["g_span"],
        ),
        (
            7,
            "only_ttr_removes",
            g["g_lang"] & g["g_len"] & ~g["g_ttr"] & g["g_span"],
        ),
        (
            8,
            "only_span_removes",
            g["g_lang"] & g["g_len"] & g["g_ttr"] & ~g["g_span"],
        ),
    ):
        out = out.unionByName(stage(o, name, cond))
    return out


SPAN_BASE_MOD = 3  # doc_id % 3 != 0 -> base corpus; == 0 -> new batch


def _incremental_span_oracle() -> str:
    return f"""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS t FROM documents
            WHERE len(string_split(text, ' ')) >= {K_SPAN}
        ),
        pos AS (
            SELECT doc_id, i,
                   md5(array_to_string(t[i:i+{K_SPAN}-1], ' ')) AS fp
            FROM toks,
                 UNNEST(generate_series(1, len(t) - {K_SPAN} + 1)) AS u(i)
        ),
        index_fps AS (
            SELECT DISTINCT fp FROM pos
            WHERE doc_id % {SPAN_BASE_MOD} <> 0
        ),
        new_pos AS (
            SELECT * FROM pos WHERE doc_id % {SPAN_BASE_MOD} = 0
        ),
        per_doc AS (
            SELECT n.doc_id,
                   count(*) AS n_spans,
                   sum(CASE WHEN ix.fp IS NOT NULL THEN 1 ELSE 0 END)
                       AS hit_spans
            FROM new_pos n LEFT JOIN index_fps ix USING (fp)
            GROUP BY 1
        )
        SELECT CAST(count(*) AS BIGINT) AS n_new_docs,
               CAST(sum(CASE WHEN hit_spans * 2 >= n_spans
                        THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_flagged_docs,
               CAST(sum(hit_spans) AS BIGINT) AS spans_hitting_index,
               (SELECT CAST(count(*) AS BIGINT)
                FROM (SELECT DISTINCT fp FROM new_pos
                      WHERE fp NOT IN (SELECT fp FROM index_fps)))
                   AS new_fps_to_add
        FROM per_doc
    """


@query(
    "dedup_incremental_span_index", oracle=_incremental_span_oracle()
)
def dedup_incremental_span_index(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental substring-dedup tick: an arriving batch is checked
    against the EXISTING corpus's fingerprint index — per new doc, how
    many of its K-token windows already exist in the corpus (flagged
    when ≥50% do: the batch re-submits known text), and how many new
    fingerprints the index grows by. The O(new)-shape sibling of
    dedup_incremental_minhash_lsh for the span family: a daily crawl
    drop probes the index instead of recomputing corpus×corpus.

    Scale: the index is a distinct-fp relation (bounded by corpus
    token count, amortized across ticks in a real pipeline — here
    derived from the doc_id split so the oracle can reconstruct it);
    the probe is one fp-keyed left join sized by the NEW batch; the
    index delta is an anti-join of new fps. Nothing rescans old docs'
    pairings.
    """
    anchors = _anchor_positions(spark, sf_dir)
    base = anchors.filter(F.col("doc_id") % SPAN_BASE_MOD != 0)
    new = anchors.filter(F.col("doc_id") % SPAN_BASE_MOD == 0)
    index_fps = base.select("fp").distinct()
    per_doc = (
        new.join(
            index_fps.withColumn("hit", F.lit(1)), "fp", "left"
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_spans"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias(
                "hit_spans"
            ),
        )
    )
    stats = per_doc.agg(
        F.count("*").cast("long").alias("n_new_docs"),
        F.sum(
            F.when(
                F.col("hit_spans") * 2 >= F.col("n_spans"), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_flagged_docs"),
        F.sum("hit_spans").cast("long").alias("spans_hitting_index"),
    )
    delta = (
        new.select("fp")
        .distinct()
        .join(index_fps, "fp", "left_anti")
        .agg(F.count("*").cast("long").alias("new_fps_to_add"))
    )
    return stats.join(F.broadcast(delta))


NOVELTY_BATCHES = 10  # arrival-order batches (doc_id as ingest order)


def _novelty_oracle() -> str:
    return f"""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS t FROM documents
            WHERE len(string_split(text, ' ')) >= {K_SPAN}
        ),
        mx AS (SELECT max(doc_id) + 1 AS n FROM toks),
        pos AS (
            SELECT doc_id, md5(array_to_string(t[i:i+{K_SPAN}-1], ' '))
                       AS fp
            FROM toks,
                 UNNEST(generate_series(1, len(t) - {K_SPAN} + 1)) AS u(i)
        ),
        batched AS (
            SELECT CAST(doc_id * {NOVELTY_BATCHES} // mx.n AS BIGINT)
                       AS batch, fp
            FROM pos, mx
        ),
        first_seen AS (
            SELECT fp, min(batch) AS first_batch
            FROM (SELECT DISTINCT batch, fp FROM batched)
            GROUP BY fp
        ),
        per_batch AS (
            SELECT b.batch,
                   count(DISTINCT b.fp) AS distinct_fps,
                   count(DISTINCT CASE WHEN f.first_batch = b.batch
                                  THEN b.fp END) AS novel_fps
            FROM batched b JOIN first_seen f ON b.fp = f.fp
            GROUP BY 1
        )
        SELECT batch,
               CAST(distinct_fps AS BIGINT) AS distinct_fps,
               CAST(novel_fps AS BIGINT) AS novel_fps,
               novel_fps * 10000 // distinct_fps AS novelty_bp
        FROM per_batch
    """


@query("corpus_novelty_curve", oracle=_novelty_oracle())
def corpus_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus novelty-over-arrival curve: split the corpus into ten
    arrival-order batches (doc_id as ingest order) and measure, per
    batch, the share of its distinct K-gram fingerprints never seen in
    ANY earlier batch — the freshness monitor a continuous crawl reads:
    a healthy source keeps novelty high; a crawler stuck re-fetching
    the same content decays toward zero (and the span-dedup family
    tells you which docs to drop).

    Scale: fingerprints from the shared anchor pipeline; first-seen is
    one keyed min over the (batch, fp) distinct relation; per-batch
    novelty is a count-distinct aggregate. Batch assignment is a
    row-local integer expression off the max doc id (one scalar
    aggregate) — arrival-time bucketing at 100 TB would use the real
    ingest timestamp the same way.
    """
    anchors = _anchor_positions(spark, sf_dir)
    n = (
        anchors.agg(F.max("doc_id").alias("m")).collect()[0].m + 1
    )
    batched = anchors.select(
        F.expr(f"doc_id * {NOVELTY_BATCHES} div {n}L").alias("batch"),
        "fp",
    ).distinct()
    first_seen = batched.groupBy("fp").agg(
        F.min("batch").alias("first_batch")
    )
    per_batch = (
        batched.join(first_seen, "fp")
        .groupBy("batch")
        .agg(
            F.count_distinct("fp").alias("distinct_fps"),
            F.count_distinct(
                F.when(
                    F.col("first_batch") == F.col("batch"), F.col("fp")
                )
            ).alias("novel_fps"),
        )
    )
    return per_batch.select(
        "batch",
        F.col("distinct_fps").cast("long").alias("distinct_fps"),
        F.col("novel_fps").cast("long").alias("novel_fps"),
        F.expr("novel_fps * 10000 div distinct_fps").alias(
            "novelty_bp"
        ),
    )


# Late registration for the semantic-threshold sweep: the IMPL lives in
# operators/dedup.py with its family; registering it there would shift
# the driver-verified registry prefix (dedup loads 3rd), so the @query
# binding happens here, in the last-loaded module.
from .dedup import (  # noqa: E402
    _sem_sweep_oracle,
    dedup_semantic_threshold_sweep,
)

query(
    "dedup_semantic_threshold_sweep", oracle=_sem_sweep_oracle()
)(dedup_semantic_threshold_sweep)

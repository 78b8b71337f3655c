"""Multi-touch marketing attribution over the events stream.

Completes the attribution family: range_join_event_attribution (single-
touch, interval-join shape) and funnel_view_click_purchase (ordered
stages) already exist; this module adds POSITION-BASED (U-shaped)
multi-touch credit — the model that splits a conversion's value 40/20/40
across the first, middle, and last touches of the journey.

Everything is windows over (user, time): journeys are recovered with a
forward-looking "next purchase" window (no join), credits are integer
basis points and values integer cents, so the DuckDB oracle matches
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.io import load_table

TOUCH_TYPES = ("view", "click")


@query(
    "attribution_ushaped_credit",
    oracle="""
        WITH tagged AS (
            SELECT user_id, ts, event_id, event_type,
                   first_value(CASE WHEN event_type = 'purchase'
                                    THEN event_id END IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN CURRENT ROW
                                      AND UNBOUNDED FOLLOWING) AS journey,
                   first_value(CASE WHEN event_type = 'purchase'
                                    THEN CAST(floor(value * 100 + 0.5)
                                              AS BIGINT) END IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN CURRENT ROW
                                      AND UNBOUNDED FOLLOWING) AS conv_cents
            FROM events
        ),
        touches AS (
            SELECT user_id, journey, event_type, conv_cents,
                   row_number() OVER (PARTITION BY user_id, journey
                                      ORDER BY ts, event_id) AS rn,
                   count(*) OVER (PARTITION BY user_id, journey) AS n
            FROM tagged
            WHERE event_type IN ('view', 'click') AND journey IS NOT NULL
        ),
        credited AS (
            SELECT event_type,
                   CASE WHEN n = 1 THEN 'only'
                        WHEN rn = 1 THEN 'first'
                        WHEN rn = n THEN 'last'
                        ELSE 'middle' END AS position,
                   CASE WHEN n = 1 THEN 10000
                        WHEN n = 2 THEN 5000
                        WHEN rn = 1 OR rn = n THEN 4000
                        ELSE 2000 // (n - 2) END AS credit_bp,
                   conv_cents
            FROM touches
        )
        SELECT event_type, position,
               count(*) AS n_touches,
               CAST(sum((conv_cents * credit_bp) // 10000) AS BIGINT)
                   AS attributed_cents
        FROM credited
        GROUP BY 1, 2
    """,
)
def attribution_ushaped_credit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped (position-based) multi-touch attribution: every view/click
    is assigned to the user's NEXT purchase (its journey); within a
    journey the first and last touches earn 40% of the conversion value
    each and the middles split the remaining 20% — the standard
    position-based model, with 100%/50-50 degenerate cases for 1- and
    2-touch journeys.

    Journey recovery is a forward-looking window (first purchase id and
    value at-or-after each row), NOT a join — one sort per user partition
    serves both the journey tag and the within-journey ranking, and
    touches after a user's final purchase fall out naturally
    (journey IS NULL). Credits are integer basis points (middle share
    floor-divided) and conversion values integer cents, so attributed
    amounts are exact integers in both engines.

    Scale: two window passes over the SAME (user_id, ts) partitioning —
    Catalyst reuses one Exchange+Sort for both — then a 10-row keyed
    aggregate. State per user is one journey's touches, never the whole
    history; the same shape runs incrementally as a session-window
    streaming query with the purchase as the session close.
    """
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w_fwd = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    is_p = F.col("event_type") == "purchase"
    tagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.first(F.when(is_p, F.col("event_id")), ignorenulls=True)
        .over(w_fwd)
        .alias("journey"),
        F.first(
            F.when(is_p, F.floor(F.col("value") * 100 + 0.5).cast("long")),
            ignorenulls=True,
        )
        .over(w_fwd)
        .alias("conv_cents"),
    )
    w_j = W.partitionBy("user_id", "journey").orderBy("ts", "event_id")
    touches = (
        tagged.filter(
            F.col("event_type").isin(*TOUCH_TYPES)
            & F.col("journey").isNotNull()
        )
        .withColumn("rn", F.row_number().over(w_j))
        .withColumn(
            "n",
            F.count("*").over(W.partitionBy("user_id", "journey")),
        )
    )
    credited = touches.select(
        "event_type",
        F.when(F.col("n") == 1, F.lit("only"))
        .when(F.col("rn") == 1, F.lit("first"))
        .when(F.col("rn") == F.col("n"), F.lit("last"))
        .otherwise(F.lit("middle"))
        .alias("position"),
        F.when(F.col("n") == 1, F.lit(10000))
        .when(F.col("n") == 2, F.lit(5000))
        .when((F.col("rn") == 1) | (F.col("rn") == F.col("n")), F.lit(4000))
        .otherwise(F.expr("2000 div (n - 2)"))
        .alias("credit_bp"),
        "conv_cents",
    )
    return credited.groupBy("event_type", "position").agg(
        F.count("*").alias("n_touches"),
        F.sum(F.expr("(conv_cents * credit_bp) div 10000"))
        .cast("long")
        .alias("attributed_cents"),
    )


EXPERIMENT_SALT = "exp42"


@query(
    "ab_experiment_assignment",
    oracle=f"""
        WITH exposed AS (
            SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
        ),
        assigned AS (
            SELECT user_id,
                   CASE WHEN (try_cast('0x' || substring(
                                md5('{EXPERIMENT_SALT}|'
                                    || CAST(user_id AS VARCHAR)),
                                1, 15) AS BIGINT)) % 2 = 0
                        THEN 'control' ELSE 'treatment' END AS variant
            FROM exposed
        ),
        converted AS (
            SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
        )
        SELECT a.variant,
               count(*) AS n_users,
               CAST(sum(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_converted,
               CAST((sum(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END)
                     * 10000) // count(*) AS BIGINT) AS conv_rate_bp
        FROM assigned a LEFT JOIN converted c ON a.user_id = c.user_id
        GROUP BY 1
    """,
)
def ab_experiment_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic experiment bucketing + conversion readout: exposed
    users (anyone with a view) are assigned to control/treatment by a
    SALTED HASH of their id — the industry-standard assignment function
    (stable across sessions, no assignment table, new experiments get a
    new salt so buckets are independent) — then per-variant conversion
    is read out in integer basis points.

    Scale: assignment is a per-row hash expression (no state, no join
    against an assignment store); the readout is one distinct per side
    and one key join — at any corpus size the expensive part is the
    distinct-users shuffles, both keyed on user_id so Catalyst lines
    them up on one Exchange. Statistical testing (z/χ²) happens on the
    4-number output, not in the engine.
    """
    from ..functions.hashing import hash64

    ev = load_table(spark, sf_dir, "events")
    exposed = (
        ev.filter(F.col("event_type") == "view").select("user_id").distinct()
    )
    assigned = exposed.select(
        "user_id",
        F.when(
            hash64(
                F.concat(
                    F.lit(f"{EXPERIMENT_SALT}|"),
                    F.col("user_id").cast("string"),
                )
            )
            % 2
            == 0,
            F.lit("control"),
        )
        .otherwise(F.lit("treatment"))
        .alias("variant"),
    )
    converted = (
        ev.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("cuid"))
        .distinct()
    )
    joined = assigned.join(
        converted, assigned.user_id == converted.cuid, "left"
    )
    return joined.groupBy("variant").agg(
        F.count("*").alias("n_users"),
        F.sum(F.when(F.col("cuid").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_converted"),
        F.expr(
            "(sum(CASE WHEN cuid IS NOT NULL THEN 1 ELSE 0 END) * 10000)"
            " div count(*)"
        )
        .cast("long")
        .alias("conv_rate_bp"),
    )


SESSION_GAP_US = 6 * 3600 * 1_000_000  # 6h inactivity closes a session
PATH_TOPN = 20


@query(
    "sessionize_event_paths",
    oracle=f"""
        WITH s AS (
            SELECT user_id, ts, event_id, event_type,
                   CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                             OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                                > {SESSION_GAP_US}
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        t AS (
            SELECT user_id, ts, event_id, event_type,
                   sum(new_s) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sess
            FROM s
        ),
        p AS (
            SELECT user_id, sess,
                   string_agg(event_type, '>' ORDER BY ts, event_id) AS path
            FROM t GROUP BY 1, 2
        ),
        ranked AS (
            SELECT path, count(*) AS n_sessions,
                   row_number() OVER (ORDER BY count(*) DESC, path) AS rank
            FROM p GROUP BY 1
        )
        SELECT rank, path, n_sessions FROM ranked
        WHERE rank <= {PATH_TOPN}
    """,
)
def sessionize_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral path mining: sessionize the event stream (6-hour
    inactivity gap), render each session as its ordered event-type path
    ("view>click>purchase"), and rank the top-{PATH_TOPN} paths by
    frequency — the exploratory sibling of the fixed-funnel query
    (funnel_view_click_purchase checks ONE path; this surfaces which
    paths exist).

    Sessionization is the standard gap-and-cumsum pair of windows over
    (user, time); gaps compare integer epoch-MICROSECONDS on both
    engines so a boundary-straddling event can't flip sides. The path
    render is an ordered string aggregation per session.

    Scale: both windows and the path aggregation share one
    (user_id)-keyed Exchange; the path-frequency count then shuffles one
    row per session (not per event), and the top-N is a TakeOrdered.
    Path cardinality is the watch-item at 100 TB — cap session length
    (slice the collect_list) or hash long paths before counting, the
    same high-cardinality discipline as dedup_jaccard_df_capped.
    """
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    lag_us = F.lag(us).over(w)
    new_s = (
        F.when(
            lag_us.isNull() | ((us - lag_us) > SESSION_GAP_US), 1
        ).otherwise(0)
    )
    t = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum(new_s).over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)
        ).alias("sess"),
    )
    paths = (
        t.groupBy("user_id", "sess")
        .agg(
            F.concat_ws(
                ">",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("ts", "event_id", "event_type")
                        )
                    ),
                    lambda s: s["event_type"],
                ),
            ).alias("path")
        )
    )
    # top-N FIRST (plans as TakeOrderedAndProject — distributed per-
    # partition heads + driver merge of N·partitions rows), THEN the
    # rank window over the N survivors only. Ranking before limiting
    # would funnel every distinct path through one WindowExec
    # partition — the global-sort-window anti-pattern the r3 verdict
    # retired; path cardinality is unbounded at 100 TB.
    ranked = (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(PATH_TOPN)
        .withColumn(
            "rank",
            F.row_number().over(
                W.orderBy(F.col("n_sessions").desc(), "path")
            ),
        )
    )
    return ranked.select("rank", "path", "n_sessions")


@query(
    "markov_event_transitions",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type, ts, event_id,
                   lead(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS next_type
            FROM events
        ),
        trans AS (
            SELECT event_type AS from_type, next_type AS to_type,
                   count(*) AS n
            FROM seq WHERE next_type IS NOT NULL
            GROUP BY 1, 2
        ),
        tot AS (
            SELECT from_type, CAST(sum(n) AS BIGINT) AS row_total
            FROM trans GROUP BY 1
        )
        SELECT t.from_type, t.to_type, t.n,
               CAST((t.n * 1000000) // o.row_total AS BIGINT) AS prob_ppm
        FROM trans t JOIN tot o ON t.from_type = o.from_type
    """,
)
def markov_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user behavior: for every
    consecutive event pair within a user's timeline, the transition
    count and row-normalized probability (integer ppm) — the input to
    next-action prediction, anomaly scoring (improbable transitions),
    and the generative model behind funnel simulations.

    Scale: ONE lead() window per user partition (the same user-keyed
    Exchange every behavioral query here shares), then a 25-cell
    aggregate — the transition matrix is |event_types|², independent of
    corpus size, so normalization joins against a broadcast-size total.
    Higher-order chains swap the single lead for a k-gram window over
    the same sort.
    """
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    trans = seq.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count("*").alias("n"))
    tot = trans.groupBy("from_type").agg(
        F.sum("n").cast("long").alias("row_total")
    )
    return trans.join(F.broadcast(tot), "from_type").select(
        "from_type",
        "to_type",
        "n",
        F.expr("(n * 1000000) div row_total").cast("long").alias("prob_ppm"),
    )


SHAPLEY_CH = (("view", 1), ("click", 2), ("signup", 4), ("error", 8))
SHAPLEY_K = 4  # k! = 24; |S|! · (k−1−|S|)! weights below
_SHAPLEY_W = "CASE bit_count(s) WHEN 0 THEN 6 WHEN 1 THEN 2 " \
             "WHEN 2 THEN 2 WHEN 3 THEN 6 END"
_CH_BIT_SQL = (
    "CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2 "
    "WHEN 'signup' THEN 4 WHEN 'error' THEN 8 ELSE 0 END"
)


@query(
    "attribution_shapley_credit",
    oracle=f"""
        WITH j AS (
            SELECT user_id, CAST(ts AS DATE) AS d,
                   bit_or({_CH_BIT_SQL}) AS mask,
                   max(CASE WHEN event_type = 'purchase'
                       THEN 1 ELSE 0 END) AS conv
            FROM events GROUP BY 1, 2
        ),
        cm AS (
            SELECT mask AS m, count(*) AS c FROM j
            WHERE conv = 1 GROUP BY 1
        ),
        subsets AS (SELECT CAST(unnest(range(16)) AS BIGINT) AS s),
        v AS (
            SELECT su.s, CAST(coalesce(sum(cm.c), 0) AS BIGINT) AS v
            FROM subsets su LEFT JOIN cm ON (cm.m & su.s) = cm.m
            GROUP BY su.s
        ),
        ch(channel, bit) AS (
            VALUES ('view', 1), ('click', 2), ('signup', 4), ('error', 8)
        ),
        terms AS (
            SELECT ch.channel,
                   ({_SHAPLEY_W.replace("(s)", "(vs.s)")})
                       * (vb.v - vs.v) AS t
            FROM ch
            JOIN v vs ON (vs.s & ch.bit) = 0
            JOIN v vb ON vb.s = vs.s | ch.bit
        )
        SELECT channel,
               CAST(sum(t) AS BIGINT) AS phi_x24,
               CAST((sum(t) * 1000) // 24 AS BIGINT) AS phi_milli
        FROM terms GROUP BY channel
    """,
)
def attribution_shapley_credit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXACT Shapley-value attribution over daily user journeys — the
    game-theoretic gold standard the heuristic models (U-shaped,
    Markov removal effect) approximate. Journey = (user, day); its
    channel SET is a 4-bit mask over {{view, click, signup, error}};
    the coalition value v(S) counts conversions among journeys whose
    channel set ⊆ S; channel i's credit is the Shapley average of its
    marginal contributions v(S∪i) − v(S) across all orderings.

    Exactness trick: with k=4 channels the coalition lattice is 16
    subsets, so the Shapley sum is computed in full (no sampling), and
    the factorial weights |S|!·(k−1−|S|)! are integers once scaled by
    k! = 24 — `phi_x24` is an exact BIGINT (Shapley efficiency:
    Σ phi_x24 = 24·(v(full) − v(∅)), pinned by test), `phi_milli` its
    floor-div integer milli-conversions.

    Scale: the journey aggregation is one keyed pass over events;
    everything after operates on the 16-row mask relation (broadcast
    subset-sum join, 16×16) and a 4-row channel relation — coalition
    work is 2^k regardless of SF. k grows to ~20 channels before the
    lattice (1M rows) even needs a shuffle; beyond that, the standard
    move is permutation-sampled Shapley, changing the estimator, not
    this plan shape.
    """
    ev = load_table(spark, sf_dir, "events")
    j = ev.groupBy(
        "user_id", F.col("ts").cast("date").alias("d")
    ).agg(
        F.bit_or(F.expr(_CH_BIT_SQL)).alias("mask"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv"),
    )
    cm = (
        j.filter(F.col("conv") == 1)
        .groupBy(F.col("mask").alias("m"))
        .agg(F.count("*").alias("c"))
    )
    subsets = spark.range(16).select(F.col("id").alias("s"))
    v = (
        subsets.join(
            F.broadcast(cm),
            (F.col("m").bitwiseAND(F.col("s")) == F.col("m")),
            "left",
        )
        .groupBy("s")
        .agg(F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("v"))
    )
    ch = spark.createDataFrame(
        list(SHAPLEY_CH), "channel string, bit int"
    )
    vs, vb = v.alias("vs"), v.alias("vb")
    terms = (
        F.broadcast(ch)
        .join(
            F.broadcast(vs),
            F.col("vs.s").bitwiseAND(F.col("bit")) == 0,
        )
        .join(
            F.broadcast(vb),
            F.col("vb.s") == F.col("vs.s").bitwiseOR(F.col("bit")),
        )
        .select(
            "channel",
            (
                F.expr(_SHAPLEY_W.replace("s)", "vs.s)"))
                * (F.col("vb.v") - F.col("vs.v"))
            ).alias("t"),
        )
    )
    return terms.groupBy("channel").agg(
        F.sum("t").cast("long").alias("phi_x24"),
        F.expr("(sum(t) * 1000) div 24").cast("long").alias("phi_milli"),
    )

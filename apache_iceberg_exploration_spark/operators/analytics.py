"""Statistical / time-series analytics operators.

The reference's analytical ceiling is a grouped count (dags/etl.py:86
``groupBy().count()``); this module adds the next tier a warehouse team
reaches for once counts exist — trend regression, rolling anomaly
detection, OHLC resampling, and leakage-free ML fold assignment. All
builtin JVM aggregates/windows (regr_*, stddev over frames, row_number)
— no Python in any hot path — and every value is reproduced exactly by
the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import hash64, hash64_sql
from ..registry import query
from ..sources.io import load_table

EPOCH = "1992-01-01"  # day-index origin for regression x values
N_FOLDS = 5


@query(
    "trend_regression_per_segment",
    oracle=f"""
        WITH daily AS (
            SELECT c.c_mktsegment,
                   date_diff('day', TIMESTAMP '{EPOCH} 00:00:00',
                             o.o_orderdate) AS day_idx,
                   sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
                       AS rev_cents
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1, 2
        )
        SELECT c_mktsegment,
               count(*) AS n_days,
               round(regr_slope(rev_cents, day_idx), 2) + 0.0
                   AS slope_cents_per_day,
               round(regr_intercept(rev_cents, day_idx), 2)
                   AS intercept_cents,
               round(regr_r2(rev_cents, day_idx), 4) AS r2
        FROM daily
        GROUP BY c_mktsegment
    """,
)
def trend_regression_per_segment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Least-squares revenue trend per market segment: daily revenue is
    regressed on a day index (origin 1992-01-01), yielding slope (growth
    rate), intercept, and R² — the one-pass regression aggregates every
    OLAP engine ships (Spark and DuckDB share the regr_* definitions).

    Scale: two keyed shuffles total. The join is broadcast (customer's
    projected key+segment is small relative to orders); the daily
    pre-aggregation collapses orders to |segments|×|days| rows BEFORE
    the regression, and regr_* themselves are single-pass streaming
    moments (constant-size partial state, associative merge) — the
    regression costs the same as a sum. Revenue is integer cents
    (floor(x*100+0.5) per row) so both engines regress the SAME exact
    series; only the regression outputs are floats, rounded.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    daily = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            "c_mktsegment",
            F.datediff(F.col("o_orderdate"), F.lit(EPOCH).cast("date")).alias(
                "day_idx"
            ),
        )
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
            ).alias("rev_cents")
        )
    )
    return daily.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_days"),
        (F.round(F.regr_slope("rev_cents", "day_idx"), 2) + 0.0).alias(
            "slope_cents_per_day"
        ),
        F.round(F.regr_intercept("rev_cents", "day_idx"), 2).alias(
            "intercept_cents"
        ),
        F.round(F.regr_r2("rev_cents", "day_idx"), 4).alias("r2"),
    )


@query(
    "anomaly_rolling_zscore_daily",
    oracle="""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
            FROM events GROUP BY 1, 2
        ),
        z AS (
            SELECT event_type, day, n,
                   avg(n)         OVER w AS mean7,
                   stddev_samp(n) OVER w AS sd7,
                   count(*)       OVER w AS w_n
            FROM daily
            WINDOW w AS (PARTITION BY event_type ORDER BY day
                         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        )
        SELECT event_type, day, n,
               round(mean7, 4) AS mean7,
               CASE WHEN w_n >= 7 AND sd7 > 0
                    THEN round((n - mean7) / sd7, 4) + 0.0 END AS zscore,
               CASE WHEN w_n >= 7 AND sd7 > 0
                         AND abs((n - mean7) / sd7) > 2
                    THEN 1 ELSE 0 END AS is_anomaly
        FROM z
    """,
)
def anomaly_rolling_zscore_daily(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Rolling z-score anomaly detection over daily event volumes: each
    (event_type, day) count is scored against the trailing 7-day mean and
    sample stddev; |z| > 2 with a full window flags an anomaly. The
    volume-monitoring pass an ingestion SLA dashboard runs — the
    reference's pipeline has no volume monitoring at all (its dedup
    silently absorbs replays, SURVEY.md §5).

    Scale: the keyed pre-aggregation collapses events to |types|×|days|
    rows (partial map-side combine, one shuffle), and the trailing frame
    is computed INSIDE each tiny type partition — the window exchange
    moves the aggregated series, never raw events. At 100 TB the daily
    series for years of data is still only thousands of rows per type.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count("*").alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    mean7 = F.avg("n").over(w)
    sd7 = F.stddev_samp("n").over(w)
    w_n = F.count("*").over(w)
    z = (F.col("n") - F.col("mean7")) / F.col("sd7")
    full = (F.col("w_n") >= 7) & (F.col("sd7") > 0)
    return (
        daily.select(
            "event_type",
            "day",
            "n",
            mean7.alias("mean7"),
            sd7.alias("sd7"),
            w_n.alias("w_n"),
        )
        .select(
            "event_type",
            "day",
            "n",
            F.round("mean7", 4).alias("mean7"),
            F.when(full, F.round(z, 4) + 0.0).alias("zscore"),
            F.when(full & (F.abs(z) > 2), F.lit(1))
            .otherwise(F.lit(0))
            .alias("is_anomaly"),
        )
    )


@query(
    "timeseries_resample_ohlc_daily",
    oracle="""
        WITH v AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(floor(value * 10000 + 0.5) AS BIGINT) AS v_units,
                   row_number() OVER (
                       PARTITION BY event_type, CAST(ts AS DATE)
                       ORDER BY ts, event_id) AS rn_a,
                   row_number() OVER (
                       PARTITION BY event_type, CAST(ts AS DATE)
                       ORDER BY ts DESC, event_id DESC) AS rn_d
            FROM events WHERE value IS NOT NULL
        )
        SELECT event_type, day,
               max(CASE WHEN rn_a = 1 THEN v_units END) AS open_units,
               max(v_units) AS high_units,
               min(v_units) AS low_units,
               max(CASE WHEN rn_d = 1 THEN v_units END) AS close_units,
               count(*) AS n_ticks,
               CAST(sum(v_units) AS BIGINT) AS volume_units
        FROM v GROUP BY 1, 2
    """,
)
def timeseries_resample_ohlc_daily(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Downsample an event-value series to daily OHLC bars (open/high/
    low/close + tick count and summed volume) per event type — the
    canonical time-series resample. Open/close are first/last by
    (ts, event_id) — the explicit tie-break makes the result
    deterministic under concurrent same-timestamp events.

    Scale: deliberately NOT a window query. Open/close are min/max over
    a (ts, event_id, value) struct — lexicographic struct ordering
    makes "value of the earliest row" an ordinary associative
    aggregate, so the whole resample is ONE partial-combined
    aggregation with a single keyed exchange: each task ships six
    constant-size partial states per (type, day) regardless of tick
    count — the skew-proof shape for hot days. (Struct-ordered
    aggregates combine via SortAggregate — a task-local sort by group
    key — but unlike the row_number formulation the oracle uses, no
    RAW row ever crosses the wire and no per-day ordering is
    materialized after the exchange.) Values are integerized
    (floor(x*1e4+0.5)) per row so the bars are engine-exact.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    day = F.col("ts").cast("date")
    base = ev.select(
        "event_type",
        day.alias("day"),
        F.floor(F.col("value") * 10000 + 0.5).cast("long").alias("v_units"),
        "ts",
        "event_id",
    )
    ordkey = F.struct("ts", "event_id", "v_units")
    return base.groupBy("event_type", "day").agg(
        F.min(ordkey)["v_units"].alias("open_units"),
        F.max("v_units").alias("high_units"),
        F.min("v_units").alias("low_units"),
        F.max(ordkey)["v_units"].alias("close_units"),
        F.count("*").alias("n_ticks"),
        F.sum("v_units").alias("volume_units"),
    )


@query(
    "ml_group_kfold_split",
    oracle=f"""
        SELECT CAST({hash64_sql("'fold|' || source")} % {N_FOLDS}
                    AS INTEGER) AS fold,
               count(DISTINCT source) AS n_sources,
               count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM documents
        GROUP BY 1
    """,
)
def ml_group_kfold_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware k-fold assignment over documents: the fold is a
    deterministic hash of ``source`` (not doc_id), so every document
    from one source lands in the SAME fold — the GroupKFold discipline
    that prevents near-duplicate leakage between train and validation
    splits (documents from one crawl/source are correlated). The audit
    reports per-fold source/document/char balance.

    Scale: fold assignment is a stateless row-local expression — no
    lookup table, no shuffle to assign, reproducible across engines and
    reruns (md5-based portable hash). The audit itself is one
    keyed aggregation with partial combine; a skewed mega-source shows
    up HERE as fold imbalance, which is exactly what the audit is for
    (remedy: split that source's docs explicitly, or weight folds).
    """
    docs = load_table(spark, sf_dir, "documents")
    fold = (
        hash64(F.concat(F.lit("fold|"), F.col("source"))) % N_FOLDS
    ).cast("int")
    return docs.groupBy(fold.alias("fold")).agg(
        F.countDistinct("source").alias("n_sources"),
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


@query(
    "forecast_seasonal_naive_eval",
    oracle="""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
            FROM events GROUP BY 1, 2
        ),
        pred AS (
            SELECT event_type, day, n,
                   lag(n, 7) OVER (PARTITION BY event_type
                                   ORDER BY day) AS yhat
            FROM daily
        )
        SELECT event_type,
               count(*) AS n_days_eval,
               CAST(sum(abs(n - yhat)) AS BIGINT) AS abs_err_total,
               round(avg(abs(n - yhat)), 4) AS mae,
               round(avg(abs(n - yhat) / n), 4) AS mape
        FROM pred WHERE yhat IS NOT NULL
        GROUP BY event_type
    """,
)
def forecast_seasonal_naive_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each day's event volume
    with the value 7 days (one weekly season) earlier, and score MAE /
    MAPE per event type — the baseline every real forecasting model must
    beat, and the standing data-quality check for "did volume deviate
    from last week's pattern". Complements anomaly_rolling_zscore_daily
    (level shifts) with a seasonality-aware error measure.

    Scale: same two-exchange shape as the z-score query — the lag runs
    over the pre-aggregated |types|×|days| series inside tiny per-type
    partitions, and the error aggregation is partial-combined. Absolute
    errors stay integers until the final division, so both engines
    aggregate the identical exact series.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type").orderBy("day")
    pred = daily.withColumn("yhat", F.lag("n", 7).over(w)).filter(
        F.col("yhat").isNotNull()
    )
    abs_err = F.abs(F.col("n") - F.col("yhat"))
    return pred.groupBy("event_type").agg(
        F.count("*").alias("n_days_eval"),
        F.sum(abs_err).cast("long").alias("abs_err_total"),
        F.round(F.avg(abs_err), 4).alias("mae"),
        F.round(F.avg(abs_err / F.col("n")), 4).alias("mape"),
    )


@query(
    "winsorize_clip_outliers",
    oracle="""
        WITH bounds AS (
            SELECT l_linestatus,
                   quantile_cont(l_extendedprice, 0.05) AS lo,
                   quantile_cont(l_extendedprice, 0.95) AS hi
            FROM lineitem GROUP BY l_linestatus
        )
        SELECT l.l_linestatus,
               count(*) AS n_rows,
               count(*) FILTER (l.l_extendedprice < b.lo
                                OR l.l_extendedprice > b.hi) AS n_clipped,
               CAST(sum(CAST(floor(
                   least(greatest(l.l_extendedprice, b.lo), b.hi) * 100
                   + 0.5) AS BIGINT)) AS BIGINT) AS winsorized_cents
        FROM lineitem l JOIN bounds b ON l.l_linestatus = b.l_linestatus
        GROUP BY l.l_linestatus
    """,
)
def winsorize_clip_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization — clip a value column to its per-group [p05, p95]
    band and report the clipped aggregate plus how many rows were
    clamped: the robust-statistics preprocessing step (outlier-tolerant
    means, stable feature scaling) that a training pipeline runs before
    normalization, made exact.

    Scale: two passes by construction (percentiles are holistic): pass 1
    computes two order statistics per group — the per-group state is the
    sorted value buffer, so at 100 TB swap in percentile_approx's
    mergeable t-digest partial state, same plan; pass 2 re-joins the
    TINY bounds relation by broadcast (|groups| rows) and clips row-
    locally, so no shuffle ever carries lineitem twice. Spark's
    percentile() and DuckDB's quantile_cont share the linear-
    interpolation definition, so clip decisions and the clipped integer-
    cents sum agree exactly; the raw interpolated bounds are NOT emitted
    — the two engines' interpolation arithmetic differs in the last ulp,
    which a display rounding can land on (observed: p05 6258.935).
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_linestatus", "l_extendedprice"
    )
    bounds = li.groupBy("l_linestatus").agg(
        F.percentile("l_extendedprice", 0.05).alias("lo"),
        F.percentile("l_extendedprice", 0.95).alias("hi"),
    )
    clipped = F.least(
        F.greatest(F.col("l_extendedprice"), F.col("lo")), F.col("hi")
    )
    is_out = (F.col("l_extendedprice") < F.col("lo")) | (
        F.col("l_extendedprice") > F.col("hi")
    )
    return (
        li.join(F.broadcast(bounds), "l_linestatus")
        .groupBy("l_linestatus")
        .agg(
            F.count("*").alias("n_rows"),
            F.count_if(is_out).alias("n_clipped"),
            F.sum(F.floor(clipped * 100 + 0.5).cast("long")).alias(
                "winsorized_cents"
            ),
        )
    )


PSI_BIN_W = 25.0  # fixed value-bin width (units of events.value)
PSI_BINS = 12  # bins 0..11, last bin open-ended
PSI_SPLIT = "2024-01-15"  # baseline = days before, current = days from


@query(
    "drift_psi_value_distribution",
    oracle=f"""
        WITH binned AS (
            SELECT event_type,
                   CASE WHEN ts < TIMESTAMP '{PSI_SPLIT} 00:00:00'
                        THEN 'base' ELSE 'cur' END AS period,
                   least(CAST(floor(value / {PSI_BIN_W}) AS INTEGER),
                         {PSI_BINS - 1}) AS bin
            FROM events WHERE value IS NOT NULL
        ),
        counts AS (
            SELECT event_type, period, bin, count(*) AS n
            FROM binned GROUP BY 1, 2, 3
        ),
        grid AS (
            SELECT DISTINCT c.event_type, b.bin, p.period
            FROM counts c,
                 (SELECT unnest(range({PSI_BINS})) AS bin) b,
                 (VALUES ('base'), ('cur')) p(period)
        ),
        filled AS (
            SELECT g.event_type, g.period, g.bin,
                   coalesce(c.n, 0) AS n
            FROM grid g LEFT JOIN counts c
              ON g.event_type = c.event_type AND g.period = c.period
                 AND g.bin = c.bin
        ),
        props AS (
            SELECT event_type, bin,
                   (sum(CASE WHEN period = 'base' THEN n END) + 0.5)
                   / (sum(sum(CASE WHEN period = 'base' THEN n END))
                          OVER (PARTITION BY event_type)
                      + 0.5 * {PSI_BINS}) AS p,
                   (sum(CASE WHEN period = 'cur' THEN n END) + 0.5)
                   / (sum(sum(CASE WHEN period = 'cur' THEN n END))
                          OVER (PARTITION BY event_type)
                      + 0.5 * {PSI_BINS}) AS q
            FROM filled GROUP BY event_type, bin
        )
        SELECT event_type,
               round(sum((p - q) * ln(p / q)), 4) AS psi,
               CASE WHEN sum((p - q) * ln(p / q)) > 0.2 THEN 1 ELSE 0 END
                   AS drifted
        FROM props GROUP BY event_type
    """,
)
def drift_psi_value_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Population Stability Index between a baseline and a current
    period of the event-value distribution, per event type — THE
    standard model/feature drift monitor (PSI > 0.2 = action
    threshold). Values are binned into fixed-width buckets; proportions
    are Laplace-smoothed (+0.5 per bin) so empty bins never produce
    infinities, and every (type, bin, period) cell is densified before
    the ratio so both engines sum the identical grid.

    Scale: one keyed aggregation collapses events to
    |types|×|bins|×2 cells (partial combine; the shuffle carries
    constant-size cells, never events); the PSI fold itself runs over
    ≤ |types|×|bins| rows. Fixed-width bins — unlike quantile bins —
    need no global sort and keep period-over-period bins comparable,
    which is why monitoring systems prefer them at scale.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    binned = ev.select(
        "event_type",
        F.when(
            F.col("ts") < F.lit(PSI_SPLIT).cast("timestamp"), "base"
        )
        .otherwise("cur")
        .alias("period"),
        F.least(
            F.floor(F.col("value") / PSI_BIN_W).cast("int"),
            F.lit(PSI_BINS - 1),
        ).alias("bin"),
    )
    counts = binned.groupBy("event_type", "period", "bin").agg(
        F.count("*").alias("n")
    )
    # densify: every (type, bin, period) cell exists with n>=0
    grid = (
        counts.select("event_type")
        .distinct()
        .crossJoin(spark.range(PSI_BINS).select(F.col("id").cast("int").alias("bin")))
        .crossJoin(
            spark.createDataFrame([("base",), ("cur",)], "period string")
        )
    )
    filled = grid.join(
        counts, ["event_type", "period", "bin"], "left"
    ).select(
        "event_type",
        "period",
        "bin",
        F.coalesce("n", F.lit(0)).alias("n"),
    )
    per_bin = filled.groupBy("event_type", "bin").agg(
        F.sum(F.when(F.col("period") == "base", F.col("n"))).alias("nb"),
        F.sum(F.when(F.col("period") == "cur", F.col("n"))).alias("nc"),
    )
    wtot = Window.partitionBy("event_type")
    p = (F.col("nb") + 0.5) / (
        F.sum("nb").over(wtot) + 0.5 * PSI_BINS
    )
    q = (F.col("nc") + 0.5) / (
        F.sum("nc").over(wtot) + 0.5 * PSI_BINS
    )
    term = (p - q) * F.log(p / q)
    psi = F.sum(term)
    return (
        per_bin.select("event_type", "bin", term.alias("term"))
        .groupBy("event_type")
        .agg(
            F.round(F.sum("term"), 4).alias("psi"),
            F.when(F.sum("term") > 0.2, F.lit(1))
            .otherwise(F.lit(0))
            .alias("drifted"),
        )
    )


AB_SALT = "exp1"  # experiment id: assignment hash family


@query(
    "ab_test_lift_zstat",
    oracle=f"""
        WITH assigned AS (
            SELECT CASE WHEN {hash64_sql(
                       "'" + AB_SALT + "|' || CAST(user_id AS VARCHAR)"
                   )} % 2 = 0 THEN 'control' ELSE 'treatment' END AS arm,
                   value
            FROM events
            WHERE event_type = 'purchase' AND value IS NOT NULL
        ),
        stats AS (
            SELECT arm, count(*) AS n, avg(value) AS mean_v,
                   var_samp(value) AS var_v
            FROM assigned GROUP BY arm
        )
        SELECT t.n AS n_treatment, c.n AS n_control,
               round(t.mean_v - c.mean_v, 4) AS lift,
               round((t.mean_v - c.mean_v)
                     / sqrt(t.var_v / t.n + c.var_v / c.n), 4) AS zstat
        FROM (SELECT * FROM stats WHERE arm = 'treatment') t,
             (SELECT * FROM stats WHERE arm = 'control') c
    """,
)
def ab_test_lift_zstat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample A/B analysis over purchase values: deterministic
    hash-bucket arm assignment (same md5 family as
    ab_experiment_assignment — the ANALYSIS half that query's
    assignment feeds), absolute lift, and the Welch z-statistic
    (mean difference over pooled standard error). |z| > 1.96 is the
    5% significance decision; the z value is emitted rather than a
    p-value because the normal CDF is not portably available in both
    engines — the decision threshold is equivalent.

    Scale: assignment is a stateless row-local hash; mean/variance are
    single-pass streaming moments, so the whole analysis is ONE
    partial-combined aggregation over two groups, then a driver-size
    join of two rows. Per-variant metrics at 100 TB cost the same as
    a grouped count.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    )
    arm = F.when(
        hash64(
            F.concat(F.lit(AB_SALT + "|"), F.col("user_id").cast("string"))
        )
        % 2
        == 0,
        "control",
    ).otherwise("treatment")
    stats = (
        ev.select(arm.alias("arm"), "value")
        .groupBy("arm")
        .agg(
            F.count("*").alias("n"),
            F.avg("value").alias("mean_v"),
            F.var_samp("value").alias("var_v"),
        )
    )
    t = stats.filter(F.col("arm") == "treatment").alias("t")
    c = stats.filter(F.col("arm") == "control").alias("c")
    se = F.sqrt(
        F.col("t.var_v") / F.col("t.n") + F.col("c.var_v") / F.col("c.n")
    )
    return t.crossJoin(c).select(
        F.col("t.n").alias("n_treatment"),
        F.col("c.n").alias("n_control"),
        F.round(F.col("t.mean_v") - F.col("c.mean_v"), 4).alias("lift"),
        F.round((F.col("t.mean_v") - F.col("c.mean_v")) / se, 4).alias(
            "zstat"
        ),
    )


@query(
    "dau_new_vs_returning",
    oracle="""
        WITH user_day AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        ),
        flagged AS (
            SELECT user_id, day,
                   min(day) OVER (PARTITION BY user_id) AS first_day
            FROM user_day
        )
        SELECT day,
               count(*) AS n_active,
               count(*) FILTER (day = first_day) AS n_new,
               count(*) FILTER (day > first_day) AS n_returning
        FROM flagged GROUP BY day
    """,
)
def dau_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users split into first-ever-seen vs returning — the
    growth-accounting counterpart of the retention triangle
    (retention_cohorts): DAU = new + returning, and a DAU rise with
    flat returning is acquisition, not engagement.

    Scale: ONE user-keyed exchange builds each user's distinct sorted
    day array (collect_set partial-aggregates map-side); first_day is
    then just element 0 — no window pass, no second user shuffle, no
    user-level state table anywhere (first-seen is derived, the query
    is a pure function of the log). The only other exchange is the
    daily rollup over |users|×|days| exploded rows. Per-user day
    arrays are bounded by the calendar, so the grouped state can't
    blow up on a hot user.
    """
    ev = load_table(spark, sf_dir, "events")
    per_user = (
        ev.select("user_id", F.col("ts").cast("date").alias("day"))
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_set("day")).alias("days"))
    )
    exploded = per_user.select(
        F.col("days")[0].alias("first_day"),
        F.explode("days").alias("day"),
    )
    return exploded.groupBy("day").agg(
        F.count("*").alias("n_active"),
        F.count_if(F.col("day") == F.col("first_day")).alias("n_new"),
        F.count_if(F.col("day") > F.col("first_day")).alias("n_returning"),
    )


WAU_WINDOW = 7  # trailing days per rolling-active window


@query(
    "rolling_wau_exact",
    oracle=f"""
        WITH user_day AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        ),
        bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM user_day),
        contrib AS (
            SELECT user_id,
                   day + CAST(o.off || ' days' AS INTERVAL) AS target_day
            FROM user_day,
                 (SELECT unnest(range({WAU_WINDOW})) AS off) o
        )
        SELECT CAST(target_day AS DATE) AS day,
               count(DISTINCT user_id) AS wau
        FROM contrib, bounds
        WHERE target_day
                  BETWEEN bounds.lo + CAST('{WAU_WINDOW - 1} days'
                                           AS INTERVAL)
                  AND bounds.hi
        GROUP BY 1
    """,
)
def rolling_wau_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT trailing-7-day active users per day (WAU), computed without
    any windowed COUNT DISTINCT: each (user, active-day) row is exploded
    to the 7 window-end days it contributes to, and the rollup is a
    plain count(distinct) per target day — the standard rewrite that
    turns an unimplementable 'distinct over a moving frame' into an
    equi-keyed aggregation. Only full windows are reported.

    Scale: each user's distinct sorted day array is built by ONE
    user-keyed exchange (collect_set partial-aggregates map-side); the
    7-day fan-out AND the per-user target-day dedup then happen
    row-locally with higher-order array functions (flatten + transform
    + array_distinct), so the final rollup is a plain count — no
    count(distinct) machinery, no second user-keyed pass, and the
    explosion is ×7 on the deduped activity relation, never on raw
    events. For monthly windows at extreme user counts swap exact
    counting for the portable HLL sketches
    (portable_hll_distinct_rollup) — identical plan shape.
    """
    ev = load_table(spark, sf_dir, "events")
    per_user = (
        ev.select("user_id", F.col("ts").cast("date").alias("day"))
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_set("day")).alias("days"))
    )
    bounds = per_user.agg(
        F.min(F.col("days")[0]).alias("lo"),
        F.max(F.element_at("days", -1)).alias("hi"),
    )
    contrib = per_user.select(
        F.explode(
            F.array_distinct(
                F.flatten(
                    F.transform(
                        "days",
                        lambda d: F.sequence(
                            d, F.date_add(d, WAU_WINDOW - 1)
                        ),
                    )
                )
            )
        ).alias("target_day")
    )
    return (
        contrib.crossJoin(F.broadcast(bounds))
        .filter(
            (F.col("target_day") >= F.date_add(F.col("lo"), WAU_WINDOW - 1))
            & (F.col("target_day") <= F.col("hi"))
        )
        .groupBy(F.col("target_day").alias("day"))
        .agg(F.count("*").alias("wau"))
    )


@query(
    "yoy_revenue_growth",
    oracle="""
        WITH monthly AS (
            SELECT c.c_mktsegment,
                   CAST(date_trunc('month', o.o_orderdate) AS DATE)
                       AS month,
                   sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
                       AS rev_cents
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1, 2
        )
        SELECT c_mktsegment, month, rev_cents,
               round(CAST(rev_cents AS DOUBLE)
                     / lag(rev_cents, 12) OVER (
                           PARTITION BY c_mktsegment ORDER BY month)
                     - 1.0, 4) + 0.0 AS yoy_growth
        FROM monthly
        QUALIFY lag(rev_cents, 12) OVER (
                    PARTITION BY c_mktsegment ORDER BY month) IS NOT NULL
    """,
)
def yoy_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year monthly revenue growth per market segment (lag-12
    over the monthly series) — the BI staple that, with the trend
    regression and seasonal backtest, completes the growth-analytics
    trio. Only months with a year-ago comparable are emitted.

    Scale: identical shape to every analytics query here — broadcast
    dimension join, partial-aggregated collapse to |segments|×|months|,
    then the lag runs inside tiny per-segment partitions. Revenue stays
    integer cents into the final division.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    monthly = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            "c_mktsegment",
            F.date_trunc("month", "o_orderdate").cast("date").alias(
                "month"
            ),
        )
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
            ).alias("rev_cents")
        )
    )
    w = Window.partitionBy("c_mktsegment").orderBy("month")
    prev = F.lag("rev_cents", 12).over(w)
    return (
        monthly.withColumn("prev", prev)
        .filter(F.col("prev").isNotNull())
        .select(
            "c_mktsegment",
            "month",
            "rev_cents",
            (
                F.round(
                    F.col("rev_cents").cast("double") / F.col("prev") - 1.0,
                    4,
                )
                + 0.0
            ).alias("yoy_growth"),
        )
    )


def streak_fold(days: F.Column) -> F.Column:
    """Row-local streak analysis over a SORTED date array: a higher-order
    fold whose accumulator carries (previous day, current run length,
    longest run, streak count). Shared by streaks_gaps_islands and its
    hypothesis model test."""
    init = F.struct(
        F.lit(None).cast("date").alias("prev"),
        F.lit(0).cast("long").alias("cur"),
        F.lit(0).cast("long").alias("mx"),
        F.lit(0).cast("long").alias("n"),
    )

    def step(acc, d):
        cont = F.coalesce(F.datediff(d, acc["prev"]) == 1, F.lit(False))
        cur2 = F.when(cont, acc["cur"] + 1).otherwise(F.lit(1).cast("long"))
        return F.struct(
            d.alias("prev"),
            cur2.alias("cur"),
            F.greatest(acc["mx"], cur2).alias("mx"),
            F.when(cont, acc["n"]).otherwise(acc["n"] + 1).alias("n"),
        )

    return F.aggregate(days, init, step)


@query(
    "streaks_gaps_islands",
    oracle="""
        WITH user_day AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        ),
        grouped AS (
            SELECT user_id, day,
                   day - CAST(row_number() OVER (
                             PARTITION BY user_id ORDER BY day
                         ) || ' days' AS INTERVAL) AS island
            FROM user_day
        ),
        streaks AS (
            SELECT user_id, island,
                   count(*) AS streak_len,
                   min(day) AS streak_start
            FROM grouped GROUP BY user_id, island
        )
        SELECT user_id,
               max(streak_len) AS longest_streak,
               count(*) AS n_streaks,
               min(streak_start) AS first_active_day
        FROM streaks GROUP BY user_id
    """,
)
def streaks_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-activity streaks per user via the gaps-and-islands
    rewrite: ``day - row_number()`` is constant within each unbroken
    run of days, so runs become plain GROUP BY keys — no recursion, no
    self-join, no iterative loop. Reports longest streak, streak count,
    and first active day per user (the engagement-streak metric next
    to the DAU/WAU pair).

    Scale: exactly ONE exchange — each user's distinct sorted day array
    is built by a single user-keyed aggregation (collect_set partials
    map-side), and the entire streak analysis is then a row-local
    higher-order fold (F.aggregate) over that array: the accumulator
    carries (previous day, current run, longest run, streak count) and
    every step is JVM codegen. No window, no island re-keying, no
    second shuffle — the SQL gaps-and-islands rewrite the oracle uses
    needs three aggregation keys; the array fold needs one. Per-user
    arrays are calendar-bounded, so grouped state stays small on any
    skew.
    """
    ev = load_table(spark, sf_dir, "events")
    per_user = (
        ev.select("user_id", F.col("ts").cast("date").alias("day"))
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_set("day")).alias("days"))
    )
    folded = streak_fold(F.col("days"))
    return per_user.select(
        "user_id",
        folded["mx"].alias("longest_streak"),
        folded["n"].alias("n_streaks"),
        F.col("days")[0].alias("first_active_day"),
    )


KM_CENSOR_GAP = 7  # days of trailing inactivity that count as churn


@query(
    "survival_kaplan_meier_retention",
    oracle=f"""
        WITH span AS (
            SELECT user_id,
                   min(CAST(ts AS DATE)) AS first_day,
                   max(CAST(ts AS DATE)) AS last_day
            FROM events GROUP BY user_id
        ),
        horizon AS (SELECT max(last_day) AS h FROM span),
        durations AS (
            SELECT CASE WHEN {hash64_sql(
                       "'exp1|' || CAST(user_id AS VARCHAR)"
                   )} % 2 = 0 THEN 'control' ELSE 'treatment' END AS arm,
                   date_diff('day', first_day, last_day) AS t,
                   CASE WHEN last_day <= h - {KM_CENSOR_GAP} THEN 1
                        ELSE 0 END AS churned
            FROM span, horizon
        ),
        per_t AS (
            SELECT arm, t, sum(churned) AS d,
                   count(*) AS removed
            FROM durations GROUP BY arm, t
        ),
        risk AS (
            SELECT arm, t, d,
                   sum(removed) OVER (PARTITION BY arm) 
                   - coalesce(sum(removed) OVER (
                         PARTITION BY arm ORDER BY t
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) AS n_risk
            FROM per_t
        )
        SELECT arm, t, n_risk, CAST(d AS BIGINT) AS d_churned,
               CAST(floor(exp(sum(
                       CASE WHEN d > 0 THEN ln(1.0 - d * 1.0 / n_risk)
                            ELSE 0.0 END) OVER (
                       PARTITION BY arm ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                   * 10000 + 0.5) AS BIGINT) AS survival_bp
        FROM risk
    """,
)
def survival_kaplan_meier_retention(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Kaplan-Meier survival curves over user retention, one curve per
    experiment arm (same md5 assignment family as ab_test_lift_zstat):
    a user's observed time is first-to-last activity; trailing
    inactivity beyond the censor gap counts as churn, users still
    active near the horizon are right-CENSORED — the estimator that
    makes retention comparable when observation windows differ, which
    naive retention curves get wrong. S(t) = Π(1 − d_i/n_i) over event
    times, computed as exp of a windowed sum of logs.

    Scale: one user-keyed aggregation collapses events to a
    per-user (duration, churned) pair; everything after runs on the
    |arms|×|distinct durations| relation (window per tiny arm
    partition). The product-limit never materializes per-user rows
    after the first collapse — a billion users cost one partial-
    combined exchange.
    """
    ev = load_table(spark, sf_dir, "events")
    span = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("first_day"),
        F.max(F.col("ts").cast("date")).alias("last_day"),
    )
    horizon = span.agg(F.max("last_day").alias("h"))
    arm = F.when(
        hash64(
            F.concat(F.lit("exp1|"), F.col("user_id").cast("string"))
        )
        % 2
        == 0,
        "control",
    ).otherwise("treatment")
    durations = span.crossJoin(F.broadcast(horizon)).select(
        arm.alias("arm"),
        F.datediff("last_day", "first_day").alias("t"),
        F.when(
            F.col("last_day") <= F.date_sub(F.col("h"), KM_CENSOR_GAP), 1
        )
        .otherwise(0)
        .alias("churned"),
    )
    per_t = durations.groupBy("arm", "t").agg(
        F.sum("churned").alias("d"), F.count("*").alias("removed")
    )
    w_tot = Window.partitionBy("arm")
    w_before = (
        Window.partitionBy("arm")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_cum = (
        Window.partitionBy("arm")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    risk = per_t.select(
        "arm",
        "t",
        "d",
        (
            F.sum("removed").over(w_tot)
            - F.coalesce(F.sum("removed").over(w_before), F.lit(0))
        ).alias("n_risk"),
    )
    log_term = F.when(
        F.col("d") > 0, F.log(1.0 - F.col("d") * 1.0 / F.col("n_risk"))
    ).otherwise(F.lit(0.0))
    return risk.select(
        "arm",
        "t",
        "n_risk",
        F.col("d").cast("long").alias("d_churned"),
        F.floor(
            F.exp(F.sum(log_term).over(w_cum)) * 10000 + 0.5
        )
        .cast("long")
        .alias("survival_bp"),
    )


WILSON_Z = 1.96  # 95% interval


@query(
    "ab_conversion_wilson_ci",
    oracle=f"""
        WITH assigned AS (
            SELECT user_id,
                   CASE WHEN {hash64_sql(
                       "'exp1|' || CAST(user_id AS VARCHAR)"
                   )} % 2 = 0 THEN 'control' ELSE 'treatment' END AS arm,
                   max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS converted
            FROM events GROUP BY user_id
        ),
        rates AS (
            SELECT arm, count(*) AS n, sum(converted) AS k,
                   sum(converted) * 1.0 / count(*) AS p
            FROM assigned GROUP BY arm
        )
        SELECT arm, n, CAST(k AS BIGINT) AS k,
               CAST(floor(p * 10000 + 0.5) AS BIGINT) AS rate_bp,
               CAST(floor(
                   (p + {WILSON_Z}*{WILSON_Z}/(2*n)
                    - {WILSON_Z} * sqrt(p*(1-p)/n
                        + {WILSON_Z}*{WILSON_Z}/(4.0*n*n)))
                   / (1 + {WILSON_Z}*{WILSON_Z}/n) * 10000 + 0.5)
                   AS BIGINT) AS ci_lo_bp,
               CAST(floor(
                   (p + {WILSON_Z}*{WILSON_Z}/(2*n)
                    + {WILSON_Z} * sqrt(p*(1-p)/n
                        + {WILSON_Z}*{WILSON_Z}/(4.0*n*n)))
                   / (1 + {WILSON_Z}*{WILSON_Z}/n) * 10000 + 0.5)
                   AS BIGINT) AS ci_hi_bp
        FROM rates
    """,
)
def ab_conversion_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-arm conversion rate with the 95% WILSON score interval — the
    interval that stays valid at small n and extreme rates where the
    naive normal interval fails (and the number a launch review
    actually wants next to the z-test: not just "significant", but how
    wide the plausible range still is). Conversion = user made ≥1
    purchase; assignment shares the experiment hash family.

    Scale: one user-keyed aggregation (partial max per user) collapses
    events to a per-user conversion bit, then two rows of closed-form
    arithmetic — interval estimation at any scale costs the same
    exchange as a count. Both engines evaluate the identical IEEE
    expression on identical (k, n) integers.
    """
    ev = load_table(spark, sf_dir, "events")
    arm = F.when(
        hash64(
            F.concat(F.lit("exp1|"), F.col("user_id").cast("string"))
        )
        % 2
        == 0,
        "control",
    ).otherwise("treatment")
    assigned = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    ).select(arm.alias("arm"), "converted")
    rates = assigned.groupBy("arm").agg(
        F.count("*").alias("n"), F.sum("converted").alias("k")
    )
    z = WILSON_Z
    p = F.col("k") * 1.0 / F.col("n")
    n = F.col("n")
    half = F.lit(z) * F.sqrt(p * (1 - p) / n + z * z / (4.0 * n * n))
    center = p + z * z / (2 * n)
    denom = 1 + z * z / n
    return rates.select(
        "arm",
        "n",
        F.col("k").cast("long").alias("k"),
        F.floor(p * 10000 + 0.5).cast("long").alias("rate_bp"),
        F.floor((center - half) / denom * 10000 + 0.5)
        .cast("long")
        .alias("ci_lo_bp"),
        F.floor((center + half) / denom * 10000 + 0.5)
        .cast("long")
        .alias("ci_hi_bp"),
    )


@query(
    "funnel_time_to_convert",
    oracle="""
        WITH v AS (
            SELECT user_id, min(ts) AS v_ts
            FROM events WHERE event_type = 'view' GROUP BY user_id
        ),
        c AS (
            SELECT e.user_id, v.v_ts, min(e.ts) AS c_ts
            FROM events e JOIN v ON e.user_id = v.user_id
            WHERE e.event_type = 'click' AND e.ts > v.v_ts
            GROUP BY e.user_id, v.v_ts
        ),
        p AS (
            SELECT e.user_id, c.v_ts, c.c_ts, min(e.ts) AS p_ts
            FROM events e JOIN c ON e.user_id = c.user_id
            WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
            GROUP BY e.user_id, c.v_ts, c.c_ts
        ),
        lags AS (
            SELECT 'view>click' AS hop,
                   date_diff('second', v_ts, c_ts) AS lag_s
            FROM c
            UNION ALL
            SELECT 'click>purchase', date_diff('second', c_ts, p_ts)
            FROM p
        )
        SELECT hop, count(*) AS n_converters,
               CAST(floor(median(lag_s) + 0.5) AS BIGINT) AS median_s,
               CAST(floor(quantile_cont(lag_s, 0.9) + 0.5) AS BIGINT)
                   AS p90_s
        FROM lags GROUP BY hop
    """,
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert per funnel hop: for the same strictly-ordered
    view→click→purchase funnel (funnel_view_click_purchase counts the
    WHO; this measures the HOW LONG), the median and p90 seconds
    between a user's first qualifying events — the latency surface that
    turns a funnel dashboard into a friction diagnosis.

    Scale: same chained keyed-min shape as the funnel (per-user state
    is a timestamp, never event history); the percentile runs over one
    lag value per converter per hop. Lags are exact integer seconds, so
    the interpolated percentile is computed from identical inputs in
    both engines and emitted floor-rounded (never the raw interpolated
    double — see winsorize_clip_outliers for why).
    """
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .alias("e")
        .join(v, "user_id")
        .filter(F.col("e.ts") > F.col("v_ts"))
        .groupBy("user_id", "v_ts")
        .agg(F.min("e.ts").alias("c_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .alias("e")
        .join(c, "user_id")
        .filter(F.col("e.ts") > F.col("c_ts"))
        .groupBy("user_id", "v_ts", "c_ts")
        .agg(F.min("e.ts").alias("p_ts"))
    )
    lag_vc = c.select(
        F.lit("view>click").alias("hop"),
        (F.unix_timestamp("c_ts") - F.unix_timestamp("v_ts")).alias(
            "lag_s"
        ),
    )
    lag_cp = p.select(
        F.lit("click>purchase").alias("hop"),
        (F.unix_timestamp("p_ts") - F.unix_timestamp("c_ts")).alias(
            "lag_s"
        ),
    )
    return (
        lag_vc.unionByName(lag_cp)
        .groupBy("hop")
        .agg(
            F.count("*").alias("n_converters"),
            F.floor(F.percentile("lag_s", 0.5) + 0.5)
            .cast("long")
            .alias("median_s"),
            F.floor(F.percentile("lag_s", 0.9) + 0.5)
            .cast("long")
            .alias("p90_s"),
        )
    )


EWMA_ALPHA = 0.3  # smoothing factor
EWMA_WINDOW = 14  # truncation width: (1-α)^14 < 0.7% residual weight


@query(
    "ewma_smoothed_volume",
    oracle=f"""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
            FROM events GROUP BY 1, 2
        ),
        idx AS (
            SELECT event_type, day, n,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY day) AS rn
            FROM daily
        )
        SELECT a.event_type, a.day, a.n,
               CAST(floor(
                   sum(b.n * {EWMA_ALPHA}
                       * power(1 - {EWMA_ALPHA}, a.rn - b.rn))
                   / sum({EWMA_ALPHA}
                         * power(1 - {EWMA_ALPHA}, a.rn - b.rn))
                   * 10000 + 0.5) AS BIGINT) AS ewma_bp
        FROM idx a JOIN idx b
          ON a.event_type = b.event_type
         AND b.rn BETWEEN a.rn - {EWMA_WINDOW - 1} AND a.rn
        GROUP BY a.event_type, a.day, a.n
    """,
)
def ewma_smoothed_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of daily event volume —
    the smoothing baseline between the raw series and the z-score
    monitor (EWMA reacts faster than a flat trailing mean and damps
    spikes the seasonal-naive model amplifies). The recursive EWMA
    definition is order-dependent and unimplementable as a window
    aggregate; this is the standard TRUNCATED closed form: weights
    α(1-α)^i over a trailing window wide enough that the dropped tail
    carries <0.7% of the mass, renormalized so early partial windows
    are unbiased.

    Scale: runs on the pre-aggregated |types|×|days| series, as a
    BOUNDED band self-join (each row joins its trailing 14 neighbors)
    — a ×W expansion of an already-tiny relation, keyed on event_type
    so both sides share one exchange. (The tempting window-aggregate
    rewrite — trailing sums of n/(1-α)^rn rescaled by (1-α)^rn —
    overflows to inf once rn exceeds ~log(DBL_MAX)/log(1/(1-α)) ≈ 2000
    days; the band join has no such cliff.)
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count("*").alias("n"))
    w_rn = Window.partitionBy("event_type").orderBy("day")
    idx = daily.withColumn("rn", F.row_number().over(w_rn))
    a, b = idx.alias("a"), idx.alias("b")
    weight = F.lit(EWMA_ALPHA) * F.pow(
        F.lit(1 - EWMA_ALPHA), F.col("a.rn") - F.col("b.rn")
    )
    return (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & F.col("b.rn").between(
                F.col("a.rn") - (EWMA_WINDOW - 1), F.col("a.rn")
            ),
        )
        .groupBy(
            F.col("a.event_type").alias("event_type"),
            F.col("a.day").alias("day"),
            F.col("a.n").alias("n"),
        )
        .agg(
            F.floor(
                F.sum(F.col("b.n") * weight)
                / F.sum(weight)
                * 10000
                + 0.5
            )
            .cast("long")
            .alias("ewma_bp")
        )
    )


@query(
    "activity_heatmap_dow_hour",
    oracle="""
        SELECT CAST(isodow(ts) AS INTEGER) AS dow,
               CAST(hour(ts) AS INTEGER) AS hour,
               count(*) AS n_events,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1
                             ELSE 0 END) AS BIGINT) AS n_purchases
        FROM events GROUP BY 1, 2
    """,
)
def activity_heatmap_dow_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour activity heatmap (ISO weekday 1-7, hour 0-23)
    with the purchase overlay — the load-profile surface behind traffic
    dashboards, staffing, and batch-window planning (and the sanity
    check that a timezone bug hasn't rotated the corpus: a synthetic
    uniform grid here is itself a finding).

    Scale: calendar extraction is row-local; the aggregation key space
    is fixed at 168 cells, so the exchange carries at most 168 partial
    states per task no matter the event volume — the most
    skew-immune aggregation shape there is.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.dayofweek("ts").alias("dow_raw"),
        F.hour("ts").cast("int").alias("hour"),
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("n_purchases"),
    ).select(
        # Spark dayofweek is 1=Sunday; ISO wants 1=Monday
        F.when(F.col("dow_raw") == 1, 7)
        .otherwise(F.col("dow_raw") - 1)
        .cast("int")
        .alias("dow"),
        "hour",
        "n_events",
        "n_purchases",
    )


@query(
    "chi_square_independence_test",
    oracle="""
        WITH obs AS (
            SELECT o_orderstatus AS r, o_orderpriority AS c,
                   count(*) AS n
            FROM orders GROUP BY 1, 2
        ),
        tot AS (
            SELECT r, c, n,
                   sum(n) OVER (PARTITION BY r) AS row_n,
                   sum(n) OVER (PARTITION BY c) AS col_n,
                   sum(n) OVER () AS grand_n
            FROM obs
        )
        SELECT CAST(max(grand_n) AS BIGINT) AS n,
               CAST((count(DISTINCT r) - 1) * (count(DISTINCT c) - 1)
                    AS INTEGER) AS dof,
               round(sum(
                   power(n - row_n * col_n * 1.0 / grand_n, 2)
                   / (row_n * col_n * 1.0 / grand_n)), 4) AS chi2
        FROM tot
    """,
)
def chi_square_independence_test(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pearson chi-square test of independence between order status and
    priority: observed cell counts vs the independence expectation
    (row×col/N), summed into the X² statistic with its degrees of
    freedom — the categorical-association screen behind segmentation
    sanity checks and feature-selection passes. The statistic is
    emitted rather than a p-value (no portable chi-square CDF in both
    engines); compare against the critical value for the dof.

    Scale: one partial-combined aggregation to the r×c contingency
    table (the only pass over data); the window marginals and the X²
    fold run over r×c cells. Dense-cell assumption holds by
    construction here; sparse tables at scale should collapse rare
    categories first (vocab-style head/tail split).
    """
    o = load_table(spark, sf_dir, "orders")
    obs = o.groupBy(
        F.col("o_orderstatus").alias("r"),
        F.col("o_orderpriority").alias("c"),
    ).agg(F.count("*").alias("n"))
    w_r = Window.partitionBy("r")
    w_c = Window.partitionBy("c")
    w_all = Window.partitionBy()
    tot = obs.select(
        "r",
        "c",
        "n",
        F.sum("n").over(w_r).alias("row_n"),
        F.sum("n").over(w_c).alias("col_n"),
        F.sum("n").over(w_all).alias("grand_n"),
    )
    exp = F.col("row_n") * F.col("col_n") * 1.0 / F.col("grand_n")
    return tot.agg(
        F.max("grand_n").cast("long").alias("n"),
        (
            (F.countDistinct("r") - 1) * (F.countDistinct("c") - 1)
        )
        .cast("int")
        .alias("dof"),
        F.round(F.sum(F.pow(F.col("n") - exp, 2) / exp), 4).alias(
            "chi2"
        ),
    )


@query(
    "cohort_ltv_curve",
    oracle="""
        WITH firsts AS (
            SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
            FROM events GROUP BY user_id
        ),
        spend AS (
            SELECT f.cohort_day,
                   date_diff('day', f.cohort_day, CAST(e.ts AS DATE))
                       AS age_days,
                   sum(CAST(floor(e.value * 100 + 0.5) AS BIGINT))
                       AS rev_cents
            FROM events e JOIN firsts f ON e.user_id = f.user_id
            WHERE e.event_type = 'purchase' AND e.value IS NOT NULL
            GROUP BY 1, 2
        ),
        sizes AS (
            SELECT cohort_day, count(*) AS cohort_users
            FROM firsts GROUP BY cohort_day
        )
        SELECT s.cohort_day, s.age_days, z.cohort_users,
               CAST(sum(s.rev_cents) OVER (
                        PARTITION BY s.cohort_day ORDER BY s.age_days
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum_rev_cents,
               CAST(floor(sum(s.rev_cents) OVER (
                        PARTITION BY s.cohort_day ORDER BY s.age_days
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    * 1.0 / z.cohort_users + 0.5) AS BIGINT)
                   AS ltv_cents_per_user
        FROM spend s JOIN sizes z ON s.cohort_day = z.cohort_day
    """,
)
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative lifetime value per signup cohort by age: purchase
    revenue accumulated day-over-day since each cohort's first-seen
    date, normalized per cohort user — the revenue sibling of the
    retention triangle (retention_cohorts counts WHO comes back, this
    prices it), and the curve payback-period decisions read.

    Scale: the user-keyed first-seen pass and the (cohort, age) revenue
    collapse are both partial-combined; the cumulative window then runs
    inside per-cohort partitions of the tiny (cohort × age) relation.
    Revenue is integer cents end-to-end; the per-user division is the
    only float and is floor-rounded.
    """
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("cohort_day")
    )
    purchases = ev.filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    )
    spend = (
        purchases.join(firsts, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("ts").cast("date"), F.col("cohort_day")).alias(
                "age_days"
            ),
        )
        .agg(
            F.sum(
                F.floor(F.col("value") * 100 + 0.5).cast("long")
            ).alias("rev_cents")
        )
    )
    sizes = firsts.groupBy("cohort_day").agg(
        F.count("*").alias("cohort_users")
    )
    w = (
        Window.partitionBy("cohort_day")
        .orderBy("age_days")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("rev_cents").over(w)
    return (
        spend.join(F.broadcast(sizes), "cohort_day")
        .select(
            "cohort_day",
            "age_days",
            "cohort_users",
            cum.cast("long").alias("cum_rev_cents"),
            F.floor(cum * 1.0 / F.col("cohort_users") + 0.5)
            .cast("long")
            .alias("ltv_cents_per_user"),
        )
    )


@query(
    "supplier_concentration_hhi",
    oracle="""
        WITH rev AS (
            SELECT p.p_type, l.l_suppkey,
                   sum(CAST(floor(l.l_extendedprice * 100 + 0.5)
                            AS BIGINT)) AS cents
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            GROUP BY 1, 2
        ),
        shares AS (
            SELECT p_type, cents,
                   sum(cents) OVER (PARTITION BY p_type) AS total
            FROM rev
        )
        SELECT p_type,
               count(*) AS n_suppliers,
               CAST(floor(sum(power(cents * 1.0 / total, 2)) * 10000
                          + 0.5) AS BIGINT) AS hhi_bp,
               CASE WHEN sum(power(cents * 1.0 / total, 2)) > 0.25
                    THEN 1 ELSE 0 END AS concentrated
        FROM shares GROUP BY p_type
    """,
)
def supplier_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman supply-concentration index per part type:
    the sum of squared supplier revenue shares — the standard
    concentration metric (HHI > 0.25 = highly concentrated) behind
    supply-risk dashboards: a part type served overwhelmingly by one
    supplier is a single point of failure the row counts alone hide.
    Complements parts_abc_classification (revenue skew across PARTS)
    with skew across SUPPLIERS.

    Scale: one keyed collapse of lineitem to (type, supplier) revenue
    — the only pass over the fact table — then windows and the share
    fold over that small relation. Integer cents into the share
    division keeps both engines on identical operands.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_type"
    )
    rev = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_type", "l_suppkey")
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
            ).alias("cents")
        )
    )
    w = Window.partitionBy("p_type")
    shares = rev.select(
        "p_type",
        (F.col("cents") * 1.0 / F.sum("cents").over(w)).alias("share"),
    )
    hhi = F.sum(F.pow(F.col("share"), 2))
    return shares.groupBy("p_type").agg(
        F.count("*").alias("n_suppliers"),
        F.floor(hhi * 10000 + 0.5).cast("long").alias("hhi_bp"),
        F.when(hhi > 0.25, 1).otherwise(0).alias("concentrated"),
    )


@query(
    "discount_quantity_elasticity",
    oracle="""
        SELECT l_linestatus,
               count(*) AS n_lines,
               round(regr_slope(l_quantity, l_discount), 4) + 0.0
                   AS qty_per_discount_point,
               round(corr(l_quantity, l_discount), 4) + 0.0 AS corr_qd
        FROM lineitem
        GROUP BY l_linestatus
    """,
)
def discount_quantity_elasticity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Discount-quantity elasticity proxy: the regression slope of
    ordered quantity on discount rate (plus their correlation) per
    line status — the pricing-analytics question behind TPC-H Q6's
    "what if we stopped discounting" framing, answered with the
    relationship itself instead of a revenue delta. Near-zero slope on
    this corpus is the honest finding (discounts are assigned
    independently of quantity by the generator) — the operator's value
    is that it MEASURES that.

    Scale: regr_slope/corr are single-pass streaming moments over the
    raw fact table — one partial-combined exchange, state is a handful
    of doubles per group; no pre-aggregation needed because the
    estimator itself is the reduction.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.count("*").alias("n_lines"),
        (F.round(F.regr_slope("l_quantity", "l_discount"), 4) + 0.0).alias(
            "qty_per_discount_point"
        ),
        (F.round(F.corr("l_quantity", "l_discount"), 4) + 0.0).alias(
            "corr_qd"
        ),
    )


@query(
    "robust_mad_outlier_flags",
    oracle="""
        WITH med AS (
            SELECT l_linestatus, median(l_extendedprice) AS m
            FROM lineitem GROUP BY l_linestatus
        ),
        mad AS (
            SELECT l.l_linestatus,
                   median(abs(l.l_extendedprice - d.m)) AS mad_v
            FROM lineitem l JOIN med d ON l.l_linestatus = d.l_linestatus
            GROUP BY l.l_linestatus
        )
        SELECT l.l_linestatus,
               count(*) AS n_rows,
               count(*) FILTER (
                   abs(l.l_extendedprice - d.m) > 3 * 1.4826 * a.mad_v
               ) AS n_outliers
        FROM lineitem l
        JOIN med d ON l.l_linestatus = d.l_linestatus
        JOIN mad a ON l.l_linestatus = a.l_linestatus
        GROUP BY l.l_linestatus
    """,
)
def robust_mad_outlier_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via Median Absolute Deviation: rows
    beyond 3 scaled MADs (×1.4826, the normal-consistency constant)
    from their group median — the estimator that, unlike the z-score
    monitor, is NOT dragged by the very outliers it hunts (mean and
    stddev both break down at 0% contamination resistance; median/MAD
    at 50%). The heavy-tail sibling of winsorize_clip_outliers.

    Scale: two holistic median passes (group-keyed, swap in
    percentile_approx's sketch at extreme group sizes) each followed by
    a broadcast of the tiny per-group statistic; flagging is row-local.
    The fact table is scanned three times but never shuffled in full —
    each pass reduces to |groups| rows before moving.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_linestatus", "l_extendedprice"
    )
    med = li.groupBy("l_linestatus").agg(
        F.percentile("l_extendedprice", 0.5).alias("m")
    )
    mad = (
        li.join(F.broadcast(med), "l_linestatus")
        .groupBy("l_linestatus")
        .agg(
            F.percentile(
                F.abs(F.col("l_extendedprice") - F.col("m")), 0.5
            ).alias("mad_v")
        )
    )
    flagged = li.join(F.broadcast(med), "l_linestatus").join(
        F.broadcast(mad), "l_linestatus"
    )
    is_out = F.abs(F.col("l_extendedprice") - F.col("m")) > (
        3 * 1.4826 * F.col("mad_v")
    )
    return flagged.groupBy("l_linestatus").agg(
        F.count("*").alias("n_rows"),
        F.count_if(is_out).alias("n_outliers"),
    )


@query(
    "cusum_changepoint_daily",
    oracle="""
        WITH daily AS (
            SELECT o_orderdate AS day,
                   CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS cents
            FROM orders GROUP BY 1
        ),
        t AS (
            SELECT CAST(sum(cents) AS BIGINT) AS total,
                   count(*) AS n
            FROM daily
        ),
        dev AS (
            SELECT day, cents,
                   cents - (SELECT total // n FROM t) AS dev
            FROM daily
        ),
        cum AS (
            SELECT day, cents, sum(dev) OVER (ORDER BY day) AS cum
            FROM dev
        ),
        s AS (
            SELECT day, cents,
                   cum - least(min(cum) OVER (ORDER BY day), 0) AS cusum
            FROM cum
        )
        SELECT day, CAST(cents AS BIGINT) AS day_cents,
               CAST(cusum AS BIGINT) AS cusum
        FROM s
        ORDER BY cusum DESC, day
        LIMIT 5
    """,
)
def cusum_changepoint_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint screen over the daily revenue series: the
    one-sided cumulative-sum statistic S_t = cum_t − min_{k≤t} cum_k
    (cum = running sum of deviations from the series mean) peaks where
    a sustained upward level shift begins — the classic sequential
    drift detector, complementing the rolling z-score (point anomalies)
    and PSI (distribution drift). Emitted: the top-5 peak days with
    their daily totals and CUSUM values.

    Cross-engine determinism: deviations are integer cents minus the
    integer floor-divided mean (never a float mean), so every partial
    sum is exact in both engines. The max-prefix identity
    S_t = cum_t − min(prefix min, 0) replaces the sequential recursion
    max(0, S_{t-1} + dev_t) with two PREFIX operators — which is what
    makes CUSUM distributable at all.

    Scale: one keyed aggregate collapses orders to ~|days| rows
    (pinned once); the running sum and running min are the STATIC
    two-phase prefix forms (functions/ranking.py — bucketed by year,
    monotone in the date), so no single-partition window exists; the
    top-5 cut plans as TakeOrdered. At 100 TB the daily rollup is the
    only pass over the fact table.
    """
    from ..functions.ranking import (
        with_global_cumsum_static,
        with_global_running_min_static,
    )

    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(F.col("o_orderdate").alias("day"))
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long"))
            .cast("long")
            .alias("cents")
        )
        .localCheckpoint()  # pin: the two prefix passes + final read
    )
    tot = daily.agg(
        F.sum("cents").cast("long").alias("t"), F.count("*").alias("n")
    ).first()
    mean = int(tot["t"]) // int(tot["n"])
    dev = daily.withColumn("dev", F.col("cents") - F.lit(mean))
    year_bucket = F.year("day").cast("long")
    cum = with_global_cumsum_static(dev, year_bucket, ["day"], "dev", "cum")
    s = with_global_running_min_static(
        cum, year_bucket, ["day"], "cum", "runmin"
    ).withColumn("cusum", F.col("cum") - F.least(F.col("runmin"), F.lit(0)))
    return (
        s.orderBy(F.col("cusum").desc(), "day")
        .limit(5)
        .select("day", F.col("cents").alias("day_cents"), "cusum")
    )


_PROFILE_COLS_SQL = """
            SELECT 'o_orderkey' AS col_name,
                   lpad(CAST(o_orderkey AS VARCHAR), 14, '0') AS val
            FROM orders
            UNION ALL
            SELECT 'o_custkey', lpad(CAST(o_custkey AS VARCHAR), 14, '0')
            FROM orders
            UNION ALL
            SELECT 'o_orderstatus', o_orderstatus FROM orders
            UNION ALL
            SELECT 'o_totalprice',
                   lpad(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                             AS VARCHAR), 14, '0')
            FROM orders
            UNION ALL
            SELECT 'o_orderdate', strftime(o_orderdate, '%Y-%m-%d')
            FROM orders
            UNION ALL
            SELECT 'o_orderpriority', o_orderpriority FROM orders
"""


@query(
    "dq_table_profile_orders",
    oracle=f"""
        WITH pairs AS ({_PROFILE_COLS_SQL}),
        stats AS (
            SELECT col_name,
                   count(*) AS n_rows,
                   count(*) FILTER (val IS NULL) AS n_nulls,
                   count(DISTINCT val) AS n_distinct,
                   min(val) AS min_val,
                   max(val) AS max_val
            FROM pairs GROUP BY 1
        ),
        freq AS (
            SELECT col_name, val, count(*) AS c
            FROM pairs WHERE val IS NOT NULL GROUP BY 1, 2
        ),
        top AS (
            SELECT col_name, val AS top_value, c AS top_count
            FROM (
                SELECT col_name, val, c,
                       row_number() OVER (
                           PARTITION BY col_name ORDER BY c DESC, val
                       ) AS rk
                FROM freq
            ) WHERE rk = 1
        )
        SELECT s.col_name,
               CAST(s.n_rows AS BIGINT) AS n_rows,
               CAST(s.n_nulls AS BIGINT) AS n_nulls,
               CAST(s.n_distinct AS BIGINT) AS n_distinct,
               s.min_val, s.max_val,
               t.top_value, CAST(t.top_count AS BIGINT) AS top_count
        FROM stats s JOIN top t ON s.col_name = t.col_name
    """,
)
def dq_table_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass table profiling report (the data-catalog staple —
    Deequ/Great-Expectations ``profile``): per column, row count, null
    count, exact distinct count, min/max, and the modal value with its
    frequency. Values are profiled in an engine-portable CANONICAL
    string form — integers zero-padded (lexicographic == numeric),
    doubles as integer cents, timestamps as ISO dates — so min/max and
    ties are identical in both engines.

    Scale: the unpivot (``stack``) rewrites the scan as (column, value)
    pairs — C× row expansion but map-local; everything downstream is
    ONE shuffle keyed (column, value): distinct/min/max partial-
    aggregate map-side, and the modal value is a per-column windowed
    top-1 over the collapsed frequency relation (partitioned by column
    — never a global window). Compare with C per-column jobs a naive
    profiler runs: at 100 TB that's C table scans vs one.
    """
    orders = load_table(spark, sf_dir, "orders")
    pad = lambda c: F.lpad(F.col(c).cast("string"), 14, "0")  # noqa: E731
    pairs = orders.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("o_orderkey").alias("col_name"),
                    pad("o_orderkey").alias("val"),
                ),
                F.struct(
                    F.lit("o_custkey").alias("col_name"),
                    pad("o_custkey").alias("val"),
                ),
                F.struct(
                    F.lit("o_orderstatus").alias("col_name"),
                    F.col("o_orderstatus").alias("val"),
                ),
                F.struct(
                    F.lit("o_totalprice").alias("col_name"),
                    F.lpad(
                        F.floor(F.col("o_totalprice") * 100 + 0.5)
                        .cast("long")
                        .cast("string"),
                        14,
                        "0",
                    ).alias("val"),
                ),
                F.struct(
                    F.lit("o_orderdate").alias("col_name"),
                    F.date_format("o_orderdate", "yyyy-MM-dd").alias("val"),
                ),
                F.struct(
                    F.lit("o_orderpriority").alias("col_name"),
                    F.col("o_orderpriority").alias("val"),
                ),
            )
        ).alias("p")
    ).select("p.col_name", "p.val")
    stats = pairs.groupBy("col_name").agg(
        F.count("*").alias("n_rows"),
        F.count_if(F.col("val").isNull()).alias("n_nulls"),
        F.countDistinct("val").alias("n_distinct"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
    )
    freq = (
        pairs.filter(F.col("val").isNotNull())
        .groupBy("col_name", "val")
        .agg(F.count("*").alias("c"))
    )
    w = Window.partitionBy("col_name").orderBy(
        F.col("c").desc(), F.col("val")
    )
    top = (
        freq.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "col_name",
            F.col("val").alias("top_value"),
            F.col("c").alias("top_count"),
        )
    )
    return stats.join(top, "col_name").select(
        "col_name",
        "n_rows",
        "n_nulls",
        "n_distinct",
        "min_val",
        "max_val",
        "top_value",
        F.col("top_count").cast("long").alias("top_count"),
    )


@query(
    "recursive_cte_dup_chain_closure",
    oracle="""
        WITH RECURSIVE fp_t AS (
            SELECT doc_id, md5(substring(text, 1, 24)) AS fp FROM documents
        ),
        edges AS (
            SELECT src, doc_id AS dst FROM (
                SELECT doc_id, fp,
                       lag(doc_id) OVER (
                           PARTITION BY fp ORDER BY doc_id
                       ) AS src
                FROM fp_t
            ) WHERE src IS NOT NULL
        ),
        reach(doc, anc, depth) AS (
            SELECT dst, src, 1 FROM edges
            UNION ALL
            SELECT r.doc, e.src, r.depth + 1
            FROM reach r JOIN edges e ON e.dst = r.anc
            WHERE r.depth < 90
        ),
        roots AS (SELECT doc, min(anc) AS root FROM reach GROUP BY doc)
        SELECT root,
               count(*) + 1 AS cluster_size,
               CAST(sum(doc) + root AS BIGINT) AS member_key_sum
        FROM roots
        GROUP BY root
    """,
)
def recursive_cte_dup_chain_closure(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Transitive closure by RECURSIVE CTE (Spark 4's ``WITH
    RECURSIVE``): documents sharing a PREFIX fingerprint (md5 of the
    first 24 chars — the cheap boilerplate-opening near-dup proxy;
    full-text md5 finds ZERO duplicates in this corpus, which made the
    driver-checked result an empty set, the vacuous-green class the
    r4 verdict flagged) are chained (each doc edges to its
    predecessor in the fingerprint group — an ACYCLIC
    path graph, so ``UNION ALL`` recursion terminates naturally and
    expands linearly, never combinatorially), and the recursion walks
    every doc to its cluster root. Output: one row per duplicate
    cluster with its size and member-key checksum — the same cluster
    semantics as dedup_cluster_assignment, derived through the SQL
    engine's fixpoint operator instead of a driver-side loop.

    Scale: each recursion step is one (anc = dst)-keyed equi-join;
    depth is the longest duplicate chain. The depth-90 recursion bound
    is therefore a CONTRACT on the input — a duplicate cluster larger
    than 91 docs would silently fragment — so it is ENFORCED up front:
    the largest fingerprint group is checked (one cheap aggregate) and
    the query refuses oversized inputs, directing to the alternating-
    star DataFrame form (dedup.dedup_cluster_assignment — logarithmic
    rounds, no depth bound) instead of returning split clusters
    (ADVICE r4). This entry is the declarative sibling that lets
    Catalyst own the loop.
    """
    docs = load_table(spark, sf_dir, "documents")
    mx = (
        docs.groupBy(F.md5(F.substring("text", 1, 24)).alias("fp"))
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    if mx is not None and mx > 91:
        raise RuntimeError(
            f"recursive_cte_dup_chain_closure: largest duplicate group "
            f"has {mx} docs — chains longer than 91 exceed the depth-90 "
            "recursion bound and would silently fragment; use "
            "dedup_cluster_assignment (alternating-star CC, no depth "
            "bound) for this corpus"
        )
    docs.createOrReplaceTempView("documents_rcte")
    return spark.sql(
        """
        WITH RECURSIVE fp_t AS (
            SELECT doc_id, md5(substring(text, 1, 24)) AS fp FROM documents_rcte
        ),
        edges AS (
            SELECT src, doc_id AS dst FROM (
                SELECT doc_id, fp,
                       lag(doc_id) OVER (
                           PARTITION BY fp ORDER BY doc_id
                       ) AS src
                FROM fp_t
            ) WHERE src IS NOT NULL
        ),
        reach(doc, anc, depth) AS (
            SELECT dst, src, 1 FROM edges
            UNION ALL
            SELECT r.doc, e.src, r.depth + 1
            FROM reach r JOIN edges e ON e.dst = r.anc
            WHERE r.depth < 90
        ),
        roots AS (SELECT doc, min(anc) AS root FROM reach GROUP BY doc)
        SELECT root,
               count(*) + 1 AS cluster_size,
               CAST(sum(doc) + root AS BIGINT) AS member_key_sum
        FROM roots
        GROUP BY root
        """
    )


@query(
    "equi_depth_histogram_lineitem",
    oracle="""
        WITH c AS (
            SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                       AS cents,
                   l_orderkey, l_linenumber
            FROM lineitem
        ),
        b AS (
            SELECT cents,
                   ntile(10) OVER (
                       ORDER BY cents, l_orderkey, l_linenumber
                   ) AS bucket
            FROM c
        )
        SELECT bucket,
               count(*) AS n_rows,
               CAST(min(cents) AS BIGINT) AS lo_cents,
               CAST(max(cents) AS BIGINT) AS hi_cents
        FROM b GROUP BY 1
    """,
)
def equi_depth_histogram_lineitem(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Equi-depth (equi-height) histogram of line-item prices: ten
    buckets of EQUAL ROW COUNT with their value ranges — the statistic
    cost-based optimizers keep per column (selectivity under skew,
    where equal-width bins collapse), and the exact sibling of the
    mergeable fixed-bin histogram_merge_rollup.

    Scale: unlike the dimension-sized ntile users (RFM), this ranks
    the FACT table itself — the distributed static-bucket exact ntile
    (functions/ranking.py, $1k price bands as the monotone bucketing)
    ranks 6M rows/SF with one bucket aggregate + one bucket-partitioned
    window, no single-partition sort anywhere; bucket boundaries are
    exact order statistics, not sketch estimates.
    """
    from ..functions.ranking import distributed_ntile_static

    li = load_table(spark, sf_dir, "lineitem").select(
        F.floor(F.col("l_extendedprice") * 100 + 0.5)
        .cast("long")
        .alias("cents"),
        "l_orderkey",
        "l_linenumber",
    )
    bucketed = distributed_ntile_static(
        li,
        10,
        F.expr("cents div 100000").cast("long"),  # $1k bands
        ["cents", "l_orderkey", "l_linenumber"],
        "bucket",
    )
    return bucketed.groupBy("bucket").agg(
        F.count("*").alias("n_rows"),
        F.min("cents").alias("lo_cents"),
        F.max("cents").alias("hi_cents"),
    )


@query(
    "max_concurrent_sessions_sweep",
    oracle="""
        WITH iv AS (
            SELECT epoch_us(ts) AS s,
                   epoch_us(ts + INTERVAL 30 MINUTE) AS e
            FROM events
        ),
        edges AS (
            SELECT s AS t, 1 AS d FROM iv
            UNION ALL
            SELECT e AS t, -1 AS d FROM iv
        ),
        per_t AS (SELECT t, CAST(sum(d) AS BIGINT) AS net FROM edges GROUP BY 1),
        curve AS (
            SELECT t, sum(net) OVER (ORDER BY t) AS conc
            FROM per_t
        )
        SELECT CAST(max(conc) AS BIGINT) AS peak_concurrency,
               CAST(min(CASE WHEN conc = (SELECT max(conc) FROM curve)
                             THEN t END) AS BIGINT) AS first_peak_us,
               (SELECT count(*) FROM iv) AS n_intervals
        FROM curve
    """,
)
def max_concurrent_sessions_sweep(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Peak concurrency by SWEEP LINE: every event opens a 30-minute
    activity interval; +1/−1 edges are collapsed per timestamp (end
    exclusive) and prefix-summed in event-time order — the running sum
    IS the concurrency curve, and its max + first attainment time are
    the capacity-planning numbers (peak simultaneous sessions, when).
    The classic interval problem that degenerates to a single-partition
    sort in naive form.

    Scale: edge collapse is one keyed aggregate (2 rows per event in,
    ≤|distinct timestamps| out); the prefix sum is the distributed
    static-bucket form (functions/ranking.py, bucketed by event-time
    month — monotone); max/argmax is an ordinary aggregate over the
    curve. Nothing sorts globally in one task. Times flow as integer
    epoch-µs end to end.
    """
    from ..functions.ranking import with_global_cumsum_static

    ev = load_table(spark, sf_dir, "events")
    # ONE events pass: each event explodes to its +1/-1 edge pair
    # (optimization r11 — the union-of-two-selects form scanned events
    # twice, and the separate n_intervals count a third time; the open
    # count now rides the edge aggregate and n_intervals is a scalar
    # off the pinned curve input)
    s_us = F.unix_micros("ts")
    e_us = F.unix_micros(F.col("ts") + F.expr("INTERVAL 30 MINUTE"))
    edges = ev.select(
        F.explode(
            F.array(
                F.struct(s_us.alias("t"), F.lit(1).alias("d")),
                F.struct(e_us.alias("t"), F.lit(-1).alias("d")),
            )
        ).alias("x")
    ).select("x.t", "x.d")
    # pin BEFORE fan-out (ADVICE r4): the curve feeds three separate
    # actions (the cumsum helper's internal per-bucket collect, the
    # peak aggregate, the argmax filter) — unpinned, each action
    # recomputes the events scan + edge aggregation; the pin makes the
    # docstring's one-pass cost claim true, mirroring the
    # cusum_changepoint_daily pin
    per_t = (
        edges.groupBy("t")
        .agg(
            F.sum("d").cast("long").alias("net"),
            F.sum(F.when(F.col("d") == 1, 1).otherwise(0))
            .cast("long")
            .alias("__opens"),
        )
        .localCheckpoint()
    )
    n_intervals = per_t.agg(F.sum("__opens")).first()[0]
    per_t = per_t.drop("__opens")
    # bucket: month-resolution epoch (µs // 30 days) — monotone in t
    curve = with_global_cumsum_static(
        per_t,
        F.expr("t div 2592000000000").cast("long"),
        ["t"],
        "net",
        "conc",
    )
    peak = curve.agg(F.max("conc").alias("m")).first()["m"]
    out = curve.filter(F.col("conc") == peak).agg(
        F.lit(int(peak)).cast("long").alias("peak_concurrency"),
        F.min("t").cast("long").alias("first_peak_us"),
        F.lit(n_intervals).cast("long").alias("n_intervals"),
    )
    return out


PCT_BP = (5000, 9000, 9900)  # evaluated percentiles, basis points
PCT_ACCURACY = 10000  # approx_percentile accuracy => rank err <= n/acc


@query(
    "percentile_sketch_bounds_eval",
    oracle=f"""
        WITH c AS (
            SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                       AS cents
            FROM lineitem
        ),
        n AS (SELECT count(*) AS cnt FROM c),
        ord AS (
            SELECT cents, row_number() OVER (ORDER BY cents) AS rn FROM c
        )
        SELECT p_bp,
               (SELECT cents FROM ord, n
                WHERE rn = (cnt * p_bp + 9999) // 10000) AS exact_cents,
               TRUE AS within_bounds
        FROM (VALUES {', '.join(f'({p})' for p in PCT_BP)}) AS t(p_bp)
    """,
)
def percentile_sketch_bounds_eval(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Estimator audit for the quantile sketch (the percentile sibling
    of dedup_minhash_estimator_calibration / ann_ivf_recall_eval):
    ``approx_percentile`` promises rank error ≤ n/accuracy — here each
    approximate percentile is checked against the EXACT order
    statistics at ranks r±⌈n/accuracy⌉, and the emitted flag is the
    contract itself (the oracle expects TRUE; a sketch regression
    breaks the value hash). Ranks use the pure-integer ceiling formula
    (cnt·p_bp + 9999) // 10000 — no float·count product whose last ulp
    could flip a ceil() across engines.

    Scale: exact order statistics come from the distributed
    static-bucket rank ($100 price bands) — value-at-rank is
    tie-insensitive, so the non-total ordering inside equal values is
    harmless; the sketch side is a single mergeable aggregate. Nine
    scalar lookups cross the driver, never data.
    """
    from ..functions.ranking import with_global_rank_static

    li = load_table(spark, sf_dir, "lineitem").select(
        F.floor(F.col("l_extendedprice") * 100 + 0.5)
        .cast("long")
        .alias("cents")
    )
    # one pass serves BOTH the row count and the sketch (optimization
    # r11 — a separate li.count() was a full third scan of lineitem)
    head = li.agg(
        F.count("*").alias("n"),
        F.percentile_approx(
            "cents", [p / 10000 for p in PCT_BP], PCT_ACCURACY
        ).alias("a"),
    ).first()
    n, approx = head["n"], head["a"]
    err = -(-n // PCT_ACCURACY)  # ceil(n / accuracy)
    targets = {}
    for p in PCT_BP:
        r = (n * p + 9999) // 10000
        targets[p] = (max(1, r - err), r, min(n, r + err))
    wanted = sorted({r for t in targets.values() for r in t})
    ranked = with_global_rank_static(
        li, F.expr("cents div 10000").cast("long"), ["cents"], "rn"
    )
    vals = {
        r["rn"]: r["cents"]
        for r in ranked.filter(F.col("rn").isin(wanted)).collect()
    }  # bounded: 9 scalars
    rows = []
    for (p, (lo_r, r, hi_r)), a in zip(sorted(targets.items()), approx):
        rows.append(
            (p, int(vals[r]), bool(vals[lo_r] <= a <= vals[hi_r]))
        )
    return spark.createDataFrame(
        rows, "p_bp int, exact_cents long, within_bounds boolean"
    )


SCD2_SPLIT_DATE = "1995-01-01"  # feature change instant for the PIT fixture


@query(
    "pit_scd2_feature_join",
    oracle=f"""
        WITH dim AS (
            -- two SCD2 versions per customer: the balance feature
            -- changes for odd keys at the split date
            SELECT c_custkey,
                   CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS feat,
                   DATE '1000-01-01' AS valid_from,
                   DATE '{SCD2_SPLIT_DATE}' AS valid_to
            FROM customer
            UNION ALL
            SELECT c_custkey,
                   CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
                   + CASE WHEN c_custkey % 2 = 1 THEN 100000 ELSE 0 END,
                   DATE '{SCD2_SPLIT_DATE}',
                   DATE '9999-01-01'
            FROM customer
        )
        SELECT (o.o_orderdate >= DATE '{SCD2_SPLIT_DATE}') AS after_split,
               count(*) AS n_orders,
               CAST(sum(d.feat) AS BIGINT) AS feat_sum
        FROM orders o
        JOIN dim d
          ON o.o_custkey = d.c_custkey
         AND CAST(o.o_orderdate AS DATE) >= d.valid_from
         AND CAST(o.o_orderdate AS DATE) < d.valid_to
        GROUP BY 1
    """,
)
def pit_scd2_feature_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-TIME feature join (the feature-store leakage guard):
    each fact row joins the SCD2 dimension version that was valid AT
    ITS OWN EVENT TIME — an order before the feature change must see
    the old balance even though a newer version exists. Skipping this
    discipline (joining current features to historical facts) is the
    classic training-serving leakage bug; the oracle pins that every
    order got exactly one version and the right one (versions
    partition time, so the join is 1:1 by construction).

    Scale: NOT a range join — with bounded versions per key (SCD2
    dims), the join is a plain equi-join ON THE KEY with the validity
    window as a residual predicate: one key-hash shuffle (or broadcast
    for dimension-sized dims), no interval index needed. The same plan
    at 100 TB joins the fact table once; contrast with as-of joins on
    event streams (asof_join_purchase_to_click) where the right side
    is itself fact-sized.
    """
    split = F.lit(SCD2_SPLIT_DATE).cast("date")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.floor(F.col("c_acctbal") * 100 + 0.5).cast("long").alias("base"),
    )
    v1 = cust.select(
        "c_custkey",
        F.col("base").alias("feat"),
        F.lit("1000-01-01").cast("date").alias("valid_from"),
        split.alias("valid_to"),
    )
    v2 = cust.select(
        "c_custkey",
        (
            F.col("base")
            + F.when(F.col("c_custkey") % 2 == 1, 100000).otherwise(0)
        ).alias("feat"),
        split.alias("valid_from"),
        F.lit("9999-01-01").cast("date").alias("valid_to"),
    )
    dim = v1.unionByName(v2)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderdate").cast("date").alias("odate")
    )
    joined = orders.join(
        dim,
        (orders.o_custkey == dim.c_custkey)
        & (F.col("odate") >= dim.valid_from)
        & (F.col("odate") < dim.valid_to),
    )
    return joined.groupBy(
        (F.col("odate") >= split).alias("after_split")
    ).agg(
        F.count("*").alias("n_orders"),
        F.sum("feat").cast("long").alias("feat_sum"),
    )


WINSOR_ACC = 10000  # approx_percentile accuracy: rank err <= n/acc


@query(
    "winsorize_approx_bounds_eval",
    oracle="""
        WITH bounds AS (
            SELECT l_linestatus,
                   quantile_cont(l_extendedprice, 0.05) AS lo,
                   quantile_cont(l_extendedprice, 0.95) AS hi
            FROM lineitem GROUP BY l_linestatus
        )
        SELECT l.l_linestatus,
               count(*) AS n_rows,
               count(*) FILTER (l.l_extendedprice < b.lo
                                OR l.l_extendedprice > b.hi)
                   AS n_clipped_exact,
               TRUE AS lo_within_rank_bound,
               TRUE AS hi_within_rank_bound
        FROM lineitem l JOIN bounds b ON l.l_linestatus = b.l_linestatus
        GROUP BY l.l_linestatus
    """,
)
def winsorize_approx_bounds_eval(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The APPROXIMATE winsorize arm (r4 verdict #6) with its accuracy
    contract tested in-band: winsorize_clip_outliers documents
    "t-digest swap-in at 100 TB" — this query actually runs that arm
    (per-group ``approx_percentile`` clip bounds, one mergeable sketch
    aggregate instead of a sorted-buffer holistic) and verifies each
    approximate bound sits within the promised rank error of the exact
    percentile, emitting the contract as hash-checked booleans (the
    oracle expects TRUE; a sketch regression breaks the value hash).

    The rank check is pure counting, tie-robust and interpolation-free:
    an approximate bound v occupies the rank interval
    [count(x<v)+1, count(x<=v)]; it must intersect the target rank
    ±(⌈n/accuracy⌉+1) — the +1 absorbs the fractional-rank slop between
    the ceil target and quantile_cont's interpolated definition.  Raw
    interpolated bounds are never emitted (cross-engine last-ulp trap,
    see winsorize_clip_outliers).

    Scale: pass 1 is one groupBy computing BOTH arms' bounds (the
    exact arm exists only to audit — at 100 TB you'd drop it and keep
    the sketch); pass 2 re-joins the |groups|-row bounds by broadcast
    and counts row-locally.  Same two-scan shape as the exact operator.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_linestatus", "l_extendedprice"
    )
    x = F.col("l_extendedprice")
    stats = li.groupBy("l_linestatus").agg(
        F.percentile(x, 0.05).alias("lo_e"),
        F.percentile(x, 0.95).alias("hi_e"),
        F.percentile_approx(x, 0.05, WINSOR_ACC).alias("lo_a"),
        F.percentile_approx(x, 0.95, WINSOR_ACC).alias("hi_a"),
    )
    g = (
        li.join(F.broadcast(stats), "l_linestatus")
        .groupBy("l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.count_if(
                (x < F.col("lo_e")) | (x > F.col("hi_e"))
            ).alias("n_clipped_exact"),
            F.count_if(x < F.col("lo_a")).alias("lt_lo"),
            F.count_if(x <= F.col("lo_a")).alias("le_lo"),
            F.count_if(x < F.col("hi_a")).alias("lt_hi"),
            F.count_if(x <= F.col("hi_a")).alias("le_hi"),
        )
    )
    n = F.col("n")
    err = F.floor((n + WINSOR_ACC - 1) / WINSOR_ACC) + 1
    r_lo = F.floor((n * 500 + 9999) / 10000)  # ceil(0.05 n)
    r_hi = F.floor((n * 9500 + 9999) / 10000)  # ceil(0.95 n)

    def within(lt, le, r):
        # rank interval [lt+1, le] intersects [r-err, r+err]
        return (F.col(lt) + 1 <= r + err) & (F.col(le) >= r - err)

    return g.select(
        "l_linestatus",
        n.alias("n_rows"),
        "n_clipped_exact",
        within("lt_lo", "le_lo", r_lo).alias("lo_within_rank_bound"),
        within("lt_hi", "le_hi", r_hi).alias("hi_within_rank_bound"),
    )


@query(
    "timeseries_stl_decompose_weekly",
    oracle="""
        WITH daily AS (
            SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
                        AS BIGINT) AS day_idx,
                   CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                 AS BIGINT)) AS BIGINT) AS cents
            FROM orders GROUP BY 1
        ),
        trended AS (
            SELECT day_idx, cents,
                   CAST(floor(avg(cents) OVER (
                       ORDER BY day_idx
                       ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
                   ) * 1000 + 0.5) AS BIGINT) AS trend_mc
            FROM daily
        ),
        detr AS (
            SELECT day_idx, cents, trend_mc,
                   cents * 1000 - trend_mc AS detr_mc,
                   (day_idx + 4) % 7 AS dow
            FROM trended
        ),
        seas AS (
            SELECT dow,
                   CAST(floor(avg(detr_mc) + 0.5) AS BIGINT)
                       AS seasonal_mc
            FROM detr GROUP BY dow
        )
        SELECT d.day_idx, d.cents AS revenue_cents, d.trend_mc,
               s.seasonal_mc,
               d.detr_mc - s.seasonal_mc AS remainder_mc
        FROM detr d JOIN seas s ON s.dow = d.dow
    """,
)
def timeseries_stl_decompose_weekly(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Additive seasonal-trend decomposition (STL-style, one pass each
    component): daily revenue splits into a 7-day centered-moving-
    average TREND, a day-of-week SEASONAL profile (mean of the
    detrended series per weekday), and the REMAINDER — the
    decomposition behind anomaly baselining and the seasonal-naive
    forecast (forecast_seasonal_naive_eval); by construction
    revenue·1000 = trend + seasonal + remainder exactly.

    Cross-engine exactness: the trend window averages LONG cents (sums
    exact in double at any realistic magnitude) and is floor-quantized
    to millicents per row BEFORE the seasonal aggregation, so every
    downstream sum is pure integer arithmetic — no double summation
    whose partial-aggregation order could differ between engines.
    Weekday comes from the integer formula (epoch_day+4)%7, not from
    date functions with differing week conventions.

    Scale: the fact scan collapses to one row per DAY first (keyed
    mergeable aggregate); every window/aggregate after that runs on
    the bounded daily series (10^3-10^4 rows for any horizon), so the
    unpartitioned ordered window is a post-aggregate no-op — the same
    argument as domain_token_mix's share window.
    """
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
        .cast("long")
        .alias("day_idx")
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long"))
        .cast("long")
        .alias("cents")
    )
    w7 = Window.orderBy("day_idx").rowsBetween(-3, 3)
    detr = daily.select(
        "day_idx",
        "cents",
        F.floor(F.avg("cents").over(w7) * 1000 + 0.5)
        .cast("long")
        .alias("trend_mc"),
    ).select(
        "day_idx",
        "cents",
        "trend_mc",
        (F.col("cents") * 1000 - F.col("trend_mc")).alias("detr_mc"),
        ((F.col("day_idx") + 4) % 7).alias("dow"),
    )
    seas = detr.groupBy("dow").agg(
        F.floor(F.avg("detr_mc") + 0.5).cast("long").alias("seasonal_mc")
    )
    return detr.join(F.broadcast(seas), "dow").select(
        "day_idx",
        F.col("cents").alias("revenue_cents"),
        "trend_mc",
        "seasonal_mc",
        (F.col("detr_mc") - F.col("seasonal_mc")).alias("remainder_mc"),
    )


@query(
    "trend_theil_sen_slope",
    oracle="""
        WITH monthly AS (
            SELECT c.c_mktsegment,
                   (year(o.o_orderdate) - 1992) * 12
                       + month(o.o_orderdate) - 1 AS t,
                   sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
                       AS rev_cents
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1, 2
        ),
        slopes AS (
            SELECT a.c_mktsegment,
                   b.rev_cents - a.rev_cents AS num,
                   b.t - a.t AS den,
                   CAST(b.rev_cents - a.rev_cents AS DOUBLE)
                       / (b.t - a.t) AS slope
            FROM monthly a
            JOIN monthly b ON a.c_mktsegment = b.c_mktsegment
                          AND a.t < b.t
        ),
        ranked AS (
            SELECT *, row_number() OVER (
                       PARTITION BY c_mktsegment
                       ORDER BY slope ASC, num ASC, den ASC
                   ) AS rn,
                   count(*) OVER (PARTITION BY c_mktsegment) AS n_pairs
            FROM slopes
        ),
        months AS (
            SELECT c_mktsegment, count(*) AS n_months FROM monthly
            GROUP BY 1
        )
        SELECT r.c_mktsegment, m.n_months, r.n_pairs,
               r.num AS med_num_cents, r.den AS med_den_months,
               CAST(floor(r.num * 100.0 / r.den + 0.5) AS BIGINT)
                   AS slope_ccents_per_month
        FROM ranked r JOIN months m ON r.c_mktsegment = m.c_mktsegment
        WHERE r.rn = (r.n_pairs + 1) // 2
    """,
)
def trend_theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend per market segment: the median of all
    pairwise slopes of the monthly revenue series — a 29%-breakdown
    estimator that one wild month cannot drag, unlike the least-squares
    slope (`trend_regression_per_segment`, its fragile sibling). The
    lower median (element at rank ⌈n/2⌉) is reported, never an
    interpolated midpoint — interpolation is the cross-engine float
    trap (memory: cross-engine-float-traps); the selected element is
    emitted as its exact (numerator cents, denominator months) pair
    plus a derived centi-cents/month integer.

    Scale: Theil-Sen is quadratic in SERIES LENGTH, not data size —
    the monthly pre-aggregation collapses any SF to |segments|×|months|
    rows first, so the pair self-join is bounded by the time range
    (~84 months → ~3.5k pairs per segment) forever; the per-segment
    window never sees more than that. Revenue in integer cents and the
    slope double num/den computed identically on both engines.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    monthly = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            "c_mktsegment",
            (
                (F.year("o_orderdate") - 1992) * 12
                + F.month("o_orderdate")
                - 1
            ).alias("t"),
        )
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
            ).alias("rev_cents")
        )
    )
    from ..functions.caching import scoped_persist

    monthly = scoped_persist(monthly)
    a, b = monthly.alias("a"), monthly.alias("b")
    slopes = a.join(
        b,
        (F.col("a.c_mktsegment") == F.col("b.c_mktsegment"))
        & (F.col("a.t") < F.col("b.t")),
    ).select(
        F.col("a.c_mktsegment").alias("c_mktsegment"),
        (F.col("b.rev_cents") - F.col("a.rev_cents")).alias("num"),
        (F.col("b.t") - F.col("a.t")).alias("den"),
        (
            (F.col("b.rev_cents") - F.col("a.rev_cents")).cast("double")
            / (F.col("b.t") - F.col("a.t"))
        ).alias("slope"),
    )
    from pyspark.sql.window import Window

    wseg = Window.partitionBy("c_mktsegment")
    ranked = slopes.select(
        "*",
        F.row_number()
        .over(wseg.orderBy(F.asc("slope"), F.asc("num"), F.asc("den")))
        .alias("rn"),
        F.count("*").over(wseg).alias("n_pairs"),
    )
    months = monthly.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_months")
    )
    return (
        ranked.filter(
            F.col("rn") == F.expr("(n_pairs + 1) div 2")
        )
        .join(F.broadcast(months), "c_mktsegment")
        .select(
            "c_mktsegment",
            "n_months",
            "n_pairs",
            F.col("num").alias("med_num_cents"),
            F.col("den").alias("med_den_months"),
            F.floor(F.col("num") * 100.0 / F.col("den") + 0.5)
            .cast("long")
            .alias("slope_ccents_per_month"),
        )
    )


CORR_COLS = ("qty", "price_cents", "disc_bp", "tax_bp")


@query(
    "stats_correlation_matrix_exact",
    oracle=f"""
        WITH u AS (
            SELECT CAST(l_quantity AS BIGINT) AS qty,
                   CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                       AS price_cents,
                   CAST(floor(l_discount * 100 + 0.5) AS BIGINT)
                       AS disc_bp,
                   CAST(floor(l_tax * 100 + 0.5) AS BIGINT) AS tax_bp
            FROM lineitem
        ),
        mom AS (
            SELECT count(*) AS n,
                   {", ".join(f"sum(CAST({c} AS DECIMAL(38,0))) AS s_{c}" for c in CORR_COLS)},
                   {", ".join(f"sum(CAST({a} AS DECIMAL(38,0)) * {b}) AS p_{a}_{b}" for i, a in enumerate(CORR_COLS) for b in CORR_COLS[i:])}
            FROM u
        )
        {" UNION ALL ".join(
            f'''SELECT '{a}' AS col_a, '{b}' AS col_b,
               round(
                 (n * CAST(p_{a}_{b} AS DOUBLE)
                  - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE))
                 / sqrt((n * CAST(p_{a}_{a} AS DOUBLE)
                         - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE))
                      * (n * CAST(p_{b}_{b} AS DOUBLE)
                         - CAST(s_{b} AS DOUBLE) * CAST(s_{b} AS DOUBLE))),
                 6) + 0.0 AS corr_r6
            FROM mom'''
            for i, a in enumerate(CORR_COLS) for b in CORR_COLS[i + 1:]
        )}
    """,
)
def stats_correlation_matrix_exact(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pearson correlation matrix over the lineitem measures from
    EXACT moments: every input is integer units (qty, cents, basis
    points), the sums and cross-products accumulate in DECIMAL(38,0)
    (associative, bit-identical in both engines — the builtin `corr`
    is a float-sum whose value depends on partition merge order), and
    the correlation derives from those exact moments through one
    identical double expression, rounded to 6 decimals.

    Scale: one scan, one constant-size aggregate state (4 sums + 10
    cross-products merged map-side) for the entire 6-pair matrix —
    the same cost as a single sum at any SF. Int64 products would
    overflow near 1e19 (price_cents² ≈ 1e14 × rows); DECIMAL(38)
    holds to ~1e24 rows.
    """
    u = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("qty"),
        F.floor(F.col("l_extendedprice") * 100 + 0.5)
        .cast("long")
        .alias("price_cents"),
        F.floor(F.col("l_discount") * 100 + 0.5).cast("long").alias("disc_bp"),
        F.floor(F.col("l_tax") * 100 + 0.5).cast("long").alias("tax_bp"),
    )
    dec = "decimal(38,0)"
    aggs = [F.count("*").alias("n")]
    for c in CORR_COLS:
        aggs.append(F.sum(F.col(c).cast(dec)).alias(f"s_{c}"))
    for i, a in enumerate(CORR_COLS):
        for b in CORR_COLS[i:]:
            aggs.append(
                F.sum(F.col(a).cast(dec) * F.col(b)).alias(f"p_{a}_{b}")
            )
    mom = u.agg(*aggs)
    pairs = []
    for i, a in enumerate(CORR_COLS):
        for b in CORR_COLS[i + 1 :]:
            nd = F.col("n").cast("double")
            sa, sb = (
                F.col(f"s_{a}").cast("double"),
                F.col(f"s_{b}").cast("double"),
            )
            pab = F.col(f"p_{a}_{b}").cast("double")
            paa = F.col(f"p_{a}_{a}").cast("double")
            pbb = F.col(f"p_{b}_{b}").cast("double")
            corr = (nd * pab - sa * sb) / F.sqrt(
                (nd * paa - sa * sa) * (nd * pbb - sb * sb)
            )
            pairs.append(
                mom.select(
                    F.lit(a).alias("col_a"),
                    F.lit(b).alias("col_b"),
                    (F.round(corr, 6) + 0.0).alias("corr_r6"),
                )
            )
    out = pairs[0]
    for p in pairs[1:]:
        out = out.unionByName(p)
    return out


@query(
    "stats_chi_square_independence",
    oracle="""
        WITH j AS (
            SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pri,
                   count(*) AS obs
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1, 2
        ),
        rt AS (SELECT seg, CAST(sum(obs) AS BIGINT) AS r FROM j GROUP BY 1),
        ct AS (SELECT pri, CAST(sum(obs) AS BIGINT) AS c FROM j GROUP BY 1),
        nn AS (SELECT CAST(sum(obs) AS BIGINT) AS n FROM j),
        terms AS (
            SELECT j.seg, j.pri,
                   CAST(round(
                       CAST((j.obs * nn.n - rt.r * ct.c) AS DOUBLE)
                       * (j.obs * nn.n - rt.r * ct.c)
                       / (CAST(nn.n AS DOUBLE) * rt.r * ct.c * nn.n), 9)
                   AS DECIMAL(18,9)) AS t
            FROM j, nn
            JOIN rt ON j.seg = rt.seg
            JOIN ct ON j.pri = ct.pri
        )
        SELECT count(*) AS n_cells,
               CAST((SELECT count(*) FROM rt) - 1 AS BIGINT)
               * ((SELECT count(*) FROM ct) - 1) AS dof,
               CAST(floor(CAST(sum(t) AS DOUBLE) * 1000000 + 0.5)
                    AS BIGINT) AS chi2_e6
        FROM terms
    """,
)
def stats_chi_square_independence(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pearson χ² test of independence between customer market segment
    and order priority — the contingency-table screen that catches
    cross-feature dependence before a sampling/mixing plan assumes the
    dimensions independent (the categorical sibling of
    `stats_correlation_matrix_exact`; inference siblings: Welch z,
    Wilson CI).

    Each cell's term is the algebraic form (obs·n − r·c)²/(n·r·c·n) —
    numerator entirely in BIGINT before the division (obs·n ≈ 1e11 at
    sf1; the square would pass int64 near sf3, where the numerator
    moves to DECIMAL — noted, not needed here), the term a
    deterministic double rounded to 9 decimals and DECIMAL-summed.
    Degrees of freedom from the observed marginals.

    Scale: one join + three keyed aggregates over a contingency table
    whose size is |segments|×|priorities| (25 cells at any SF); the
    join is the broadcast customer-dimension shape every TPC-H query
    here uses.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    j = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderpriority").alias("pri"),
        )
        .agg(F.count("*").alias("obs"))
    )
    from ..functions.caching import scoped_persist

    j = scoped_persist(j)
    rt = j.groupBy("seg").agg(F.sum("obs").cast("long").alias("r"))
    ct = j.groupBy("pri").agg(F.sum("obs").cast("long").alias("c"))
    nn = j.agg(F.sum("obs").cast("long").alias("n"))
    num = F.col("obs") * F.col("n") - F.col("r") * F.col("c")
    term = F.round(
        num.cast("double")
        * num
        / (
            F.col("n").cast("double")
            * F.col("r")
            * F.col("c")
            * F.col("n")
        ),
        9,
    ).cast("decimal(18,9)")
    terms = (
        j.crossJoin(F.broadcast(nn))
        .join(F.broadcast(rt), "seg")
        .join(F.broadcast(ct), "pri")
        .select(term.alias("t"))
    )
    n_seg = rt.count()
    n_pri = ct.count()
    return terms.agg(
        F.count("*").alias("n_cells"),
        F.lit((n_seg - 1) * (n_pri - 1)).cast("long").alias("dof"),
        F.floor(F.sum("t").cast("double") * 1000000 + 0.5)
        .cast("long")
        .alias("chi2_e6"),
    )


SLA_SHORT_PPM = 300_000  # 1 h burn threshold (error fraction, ppm)
SLA_LONG_PPM = 230_000  # 6 h burn threshold


@query(
    "sla_error_burn_rate_alert",
    oracle=f"""
        WITH h AS (
            SELECT date_trunc('hour', ts) AS hr, count(*) AS n,
                   sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                       AS e
            FROM events GROUP BY 1
        ),
        w AS (
            SELECT a.hr,
                   CAST(max(a.n) AS BIGINT) AS n_1h,
                   CAST(max(a.e) AS BIGINT) AS err_1h,
                   CAST(sum(b.n) AS BIGINT) AS n_6h,
                   CAST(sum(b.e) AS BIGINT) AS err_6h
            FROM h a JOIN h b
              ON b.hr BETWEEN a.hr - INTERVAL 5 HOUR AND a.hr
            GROUP BY a.hr
        )
        SELECT CAST(epoch(hr) AS BIGINT) AS hour_epoch,
               n_1h, err_1h,
               err_1h * 1000000 // n_1h AS short_ppm,
               err_6h * 1000000 // n_6h AS long_ppm,
               (err_1h * 1000000 // n_1h > {SLA_SHORT_PPM}
                AND err_6h * 1000000 // n_6h > {SLA_LONG_PPM}) AS page
        FROM w
    """,
)
def sla_error_burn_rate_alert(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Multi-window error-budget burn-rate alerting (the Google SRE
    workbook recipe): page only when BOTH the fast window (1 h) and the
    slow window (6 h) burn above threshold — the fast window catches
    the spike, the slow window suppresses flapping on noise. Every
    hour is emitted with its two rates and the page verdict, so both
    alert branches are oracle-checked (64 of 720 hours page at the
    sf0.01 calibration — a genuine mix, not a vacuous flag).

    The 6 h window is a BOUNDED BAND JOIN over the hourly rollup, not
    a global-sort window frame — the hourly relation is time-bounded
    (720 rows per month regardless of SF), the r3-mandated shape for
    global sequences (same argument as the truncated-EWMA form). All
    rates are integer ppm via floor division.

    Scale: events aggregate once into the hourly rollup (keyed
    shuffle, map-side partials); the band join fans out 6× over a
    relation whose size tracks the time range, never the event count.
    """
    ev = load_table(spark, sf_dir, "events")
    h = ev.groupBy(F.date_trunc("hour", "ts").alias("hr")).agg(
        F.count("*").alias("n"),
        F.sum(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).alias("e"),
    )
    from ..functions.caching import scoped_persist

    h = scoped_persist(h)
    a, b = h.alias("a"), h.alias("b")
    w = (
        a.join(
            b,
            (F.col("b.hr") >= F.col("a.hr") - F.expr("INTERVAL 5 HOURS"))
            & (F.col("b.hr") <= F.col("a.hr")),
        )
        .groupBy(F.col("a.hr").alias("hr"))
        .agg(
            F.max("a.n").cast("long").alias("n_1h"),
            F.max("a.e").cast("long").alias("err_1h"),
            F.sum("b.n").cast("long").alias("n_6h"),
            F.sum("b.e").cast("long").alias("err_6h"),
        )
    )
    short = F.expr("err_1h * 1000000 div n_1h")
    long_ = F.expr("err_6h * 1000000 div n_6h")
    return w.select(
        F.unix_timestamp("hr").alias("hour_epoch"),
        "n_1h",
        "err_1h",
        short.alias("short_ppm"),
        long_.alias("long_ppm"),
        ((short > SLA_SHORT_PPM) & (long_ > SLA_LONG_PPM)).alias("page"),
    )


HOLT_ALPHA = "0.4"  # level gain
HOLT_BETA = "0.3"  # trend gain


@query(
    "forecast_holt_linear_daily",
    oracle=f"""
        WITH RECURSIVE daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   count(*) AS n
            FROM events GROUP BY 1, 2
        ),
        idx AS (
            SELECT event_type,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY day) AS rn,
                   CAST(n AS DOUBLE) AS y
            FROM daily
        ),
        mx AS (SELECT event_type, max(rn) AS m FROM idx GROUP BY 1),
        rec(event_type, rn, l, b) AS (
            SELECT event_type, 1, y, CAST(0 AS DOUBLE)
            FROM idx WHERE rn = 1
            UNION ALL
            SELECT i.event_type, r.rn + 1,
                   {HOLT_ALPHA}::DOUBLE * i.y
                   + (1.0::DOUBLE - {HOLT_ALPHA}::DOUBLE) * (r.l + r.b),
                   {HOLT_BETA}::DOUBLE
                   * (({HOLT_ALPHA}::DOUBLE * i.y
                       + (1.0::DOUBLE - {HOLT_ALPHA}::DOUBLE)
                         * (r.l + r.b)) - r.l)
                   + (1.0::DOUBLE - {HOLT_BETA}::DOUBLE) * r.b
            FROM rec r JOIN idx i ON i.event_type = r.event_type
                                 AND i.rn = r.rn + 1
        )
        SELECT r.event_type, CAST(mx.m AS BIGINT) AS n_days,
               CAST(floor(r.l * 1000000 + 0.5) AS BIGINT) AS level_e6,
               CAST(floor(r.b * 1000000 + 0.5) AS BIGINT) AS trend_e6,
               CAST(floor((r.l + r.b) * 1000000 + 0.5) AS BIGINT)
                   AS forecast_next_e6
        FROM rec r JOIN mx ON r.event_type = mx.event_type
                          AND r.rn = mx.m
    """,
)
def forecast_holt_linear_daily(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Holt linear (double-exponential) smoothing of daily event volume
    per event type: level ℓ_t = αy_t + (1−α)(ℓ+b), trend
    b_t = β(ℓ_t−ℓ) + (1−β)b — the trend-aware forecaster between EWMA
    (no trend) and the seasonal-naive model. Emits the final state and
    the one-step-ahead forecast ℓ+b.

    Form matters: the recursive window rescaling form OVERFLOWS
    ((1−α)^−rn — SCALE.md's REVERTED experiment; do not retry), and
    truncating the recursion (the EWMA band-join escape) breaks the
    trend term's memory. The scale-correct shape used here is a
    ROW-LOCAL ARRAY FOLD: each key's day series (bounded by the time
    range, ~30-90 elements, never by SF) is collected, sorted, and
    folded through one `aggregate` lambda — sequential arithmetic in a
    deterministic order, floored to 1e-6 units. The oracle replays the
    identical recurrence as a step-indexed recursive CTE (DuckDB
    1.0's list_reduce mis-evaluates the second struct field across
    iterations — verified divergent against a hand fold — so the CTE
    form is the trustworthy twin).

    Scale: one keyed aggregation to daily counts, one collect_list per
    key (time-bounded), zero windows, zero shuffles beyond the rollup.
    A series too long to hold row-local (years of per-minute points)
    switches to segmented folds: fold each chunk, then compose the
    affine maps (ℓ,b) — Holt's update is linear, so chunk composition
    is exact; noted, not needed at daily grain.
    """
    a, b = HOLT_ALPHA + "D", HOLT_BETA + "D"
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count("*").alias("n"))
    arr = daily.groupBy("event_type").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("day").alias("d"),
                    F.col("n").cast("double").alias("y"),
                )
            )
        ).alias("a")
    )
    lvl = f"{a} * x.y + (1.0D - {a}) * (acc.l + acc.b)"
    fold = (
        "aggregate(slice(a, 2, size(a) - 1), "
        "named_struct('l', a[0].y, 'b', 0.0D), "
        f"(acc, x) -> named_struct("
        f"'l', {lvl}, "
        f"'b', {b} * (({lvl}) - acc.l) + (1.0D - {b}) * acc.b))"
    )
    return arr.select(
        "event_type",
        F.expr("size(a)").cast("long").alias("n_days"),
        F.expr(f"CAST(floor(({fold}).l * 1000000 + 0.5) AS BIGINT)").alias(
            "level_e6"
        ),
        F.expr(f"CAST(floor(({fold}).b * 1000000 + 0.5) AS BIGINT)").alias(
            "trend_e6"
        ),
        F.expr(
            f"CAST(floor((({fold}).l + ({fold}).b) * 1000000 + 0.5)"
            " AS BIGINT)"
        ).alias("forecast_next_e6"),
    )


MW_SEG_A = "BUILDING"  # "treatment" sample
MW_SEG_B = "MACHINERY"  # comparison sample

# shared z-statistic formula — identical text in both engines so the
# doubles agree bit-for-bit (all inputs exact BIGINTs)
_MW_Z_SQL = (
    "CAST(floor((((r1x2 - n1 * (n1 + 1)) / 2.0 - (n1 * n2) / 2.0)"
    " / sqrt((CAST(n1 AS DOUBLE) * n2) / 12.0"
    "        * ((n + 1) - ties / (n * (n - 1.0)))))"
    " * 10000 + 0.5) AS BIGINT)"
)


@query(
    "stats_mann_whitney_u",
    oracle=f"""
        WITH r AS (
            SELECT CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents,
                   CASE WHEN c_mktsegment = '{MW_SEG_A}' THEN 1
                        ELSE 0 END AS grp
            FROM customer
            WHERE c_mktsegment IN ('{MW_SEG_A}', '{MW_SEG_B}')
        ),
        d AS (
            SELECT cents, CAST(count(*) AS BIGINT) AS n_v,
                   CAST(sum(grp) AS BIGINT) AS n1_v
            FROM r GROUP BY 1
        ),
        c AS (
            SELECT cents, n_v, n1_v,
                   sum(n_v) OVER (ORDER BY cents) - n_v AS cum_before
            FROM d
        ),
        agg AS (
            SELECT CAST(sum(n1_v * (2 * cum_before + n_v + 1)) AS BIGINT)
                       AS r1x2,
                   CAST(sum(n_v * n_v * n_v - n_v) AS BIGINT) AS ties,
                   CAST(sum(n_v) AS BIGINT) AS n,
                   CAST(sum(n1_v) AS BIGINT) AS n1
            FROM c
        )
        SELECT n1, n - n1 AS n2,
               r1x2 - n1 * (n1 + 1) AS u_x2, ties,
               {_MW_Z_SQL.replace("n2", "(n - n1)")} AS z_e4
        FROM agg
    """,
)
def stats_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) comparing account-balance
    distributions between two market segments — the NONPARAMETRIC
    two-sample test the inference family lacked (Welch z assumes
    near-normal means; U detects any stochastic dominance), with the
    exact tie correction (average ranks; Σ(t³−t) variance term).

    Exactness: ranks never materialize per row — the VALUE DICTIONARY
    (distinct cents, group counts) carries everything: tie-averaged
    rank ×2 = 2·cum_before + n_v + 1 (integer), so the rank-sum,
    U-statistic (×2) and tie term are exact BIGINTs; the z-statistic
    derives through one shared formula string evaluated identically in
    both engines.

    Scale: one keyed aggregation to the dictionary, then the global
    prefix sum uses the static-monotone-bucket distributed cumsum
    (functions/ranking.py — cents div 100000 bands, no sampling, no
    pin, no single-partition window); everything after is a
    constant-size aggregate.
    """
    from ..functions.ranking import with_global_cumsum_static

    r = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment").isin(MW_SEG_A, MW_SEG_B))
        .select(
            F.floor(F.col("c_acctbal") * 100 + 0.5)
            .cast("long")
            .alias("cents"),
            F.when(F.col("c_mktsegment") == MW_SEG_A, 1)
            .otherwise(0)
            .alias("grp"),
        )
    )
    d = r.groupBy("cents").agg(
        F.count("*").cast("long").alias("n_v"),
        F.sum("grp").cast("long").alias("n1_v"),
    )
    c = with_global_cumsum_static(
        d,
        F.expr("cents div 100000"),
        ["cents"],
        "n_v",
        "cum_incl",
    ).withColumn("cum_before", F.col("cum_incl") - F.col("n_v"))
    agg = c.agg(
        F.sum(
            F.col("n1_v")
            * (2 * F.col("cum_before") + F.col("n_v") + 1)
        )
        .cast("long")
        .alias("r1x2"),
        F.sum(
            F.col("n_v") * F.col("n_v") * F.col("n_v") - F.col("n_v")
        )
        .cast("long")
        .alias("ties"),
        F.sum("n_v").cast("long").alias("n"),
        F.sum("n1_v").cast("long").alias("n1"),
    )
    return agg.select(
        "n1",
        (F.col("n") - F.col("n1")).alias("n2"),
        (F.col("r1x2") - F.col("n1") * (F.col("n1") + 1)).alias("u_x2"),
        "ties",
        F.expr(
            _MW_Z_SQL.replace("n2", "(n - n1)")
        ).alias("z_e4"),
    )


# tie-corrected H, shared formula text (inputs exact BIGINTs; the
# R2²/n_j sum arrives as a DOUBLE computed identically in both engines)
_KW_H_SQL = (
    "CAST(floor((((12.0 / (n * (n + 1.0))) * (rsq4 / 4.0)"
    " - 3.0 * (n + 1))"
    " / (1.0 - ties / (CAST(n AS DOUBLE) * n * n - n)))"
    " * 10000 + 0.5) AS BIGINT)"
)


@query(
    "stats_kruskal_wallis_h",
    oracle=f"""
        WITH r AS (
            SELECT CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents,
                   c_mktsegment AS seg
            FROM customer
        ),
        d AS (
            SELECT cents, CAST(count(*) AS BIGINT) AS n_v
            FROM r GROUP BY 1
        ),
        c AS (
            SELECT cents, n_v,
                   sum(n_v) OVER (ORDER BY cents) - n_v AS cum_before
            FROM d
        ),
        ds AS (
            SELECT r.seg, CAST(count(*) AS BIGINT) AS n_j,
                   CAST(sum(c.cum_before * 2 + c.n_v + 1) AS BIGINT)
                       AS r2_j
            FROM r JOIN c ON r.cents = c.cents
            GROUP BY 1
        ),
        agg AS (
            SELECT CAST(sum(n_j) AS BIGINT) AS n,
                   CAST(sum(CAST(round(
                       CAST(r2_j AS DOUBLE) * r2_j / n_j, 4)
                       AS DECIMAL(38,4))) AS DOUBLE) AS rsq4,
                   (SELECT CAST(sum(n_v * n_v * n_v - n_v) AS BIGINT)
                    FROM d) AS ties,
                   CAST(count(*) AS BIGINT) AS k_groups
            FROM ds
        )
        SELECT n, k_groups, ties, {_KW_H_SQL} AS h_e4
        FROM agg
    """,
)
def stats_kruskal_wallis_h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H: the k-sample extension of Mann-Whitney —
    "do account balances differ across ALL five market segments?"
    without normality assumptions, with the standard tie correction
    1 − Σ(t³−t)/(n³−n). Same exact machinery as
    `stats_mann_whitney_u`: tie-averaged ranks ×2 live on the value
    dictionary as integers; per-group rank sums are exact BIGINTs; H
    derives through one shared formula text; the R²/n terms are
    rounded to 4 decimals and DECIMAL-summed (associative, engine-
    order-proof — the BM25/surprisal discipline) before the final
    double arithmetic.

    Scale: dictionary aggregation + distributed static-bucket prefix
    sum + one dictionary-sized join back to rows (broadcast — the
    dictionary is value-cardinality-bounded); per-group sums are a
    keyed aggregate; no per-row ranks ever materialize.
    """
    from ..functions.ranking import with_global_cumsum_static

    r = load_table(spark, sf_dir, "customer").select(
        F.floor(F.col("c_acctbal") * 100 + 0.5).cast("long").alias("cents"),
        F.col("c_mktsegment").alias("seg"),
    )
    d = r.groupBy("cents").agg(F.count("*").cast("long").alias("n_v"))
    c = with_global_cumsum_static(
        d, F.expr("cents div 100000"), ["cents"], "n_v", "cum_incl"
    ).withColumn("cum_before", F.col("cum_incl") - F.col("n_v"))
    from ..functions.caching import scoped_persist

    c = scoped_persist(c)
    ds = (
        r.join(F.broadcast(c), "cents")
        .groupBy("seg")
        .agg(
            F.count("*").cast("long").alias("n_j"),
            F.sum(F.col("cum_before") * 2 + F.col("n_v") + 1)
            .cast("long")
            .alias("r2_j"),
        )
    )
    ties_v = d.agg(
        F.sum(
            F.col("n_v") * F.col("n_v") * F.col("n_v") - F.col("n_v")
        ).cast("long")
    ).first()[0]
    agg = ds.agg(
        F.sum("n_j").cast("long").alias("n"),
        F.sum(
            F.round(
                F.col("r2_j").cast("double") * F.col("r2_j") / F.col("n_j"),
                4,
            ).cast("decimal(38,4)")
        )
        .cast("double")
        .alias("rsq4"),
        F.lit(ties_v).cast("long").alias("ties"),
        F.count("*").cast("long").alias("k_groups"),
    )
    return agg.select("n", "k_groups", "ties", F.expr(_KW_H_SQL).alias("h_e4"))


@query(
    "stats_ks_two_sample",
    oracle=f"""
        WITH r AS (
            SELECT CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents,
                   CASE WHEN c_mktsegment = '{MW_SEG_A}' THEN 1
                        ELSE 0 END AS grp
            FROM customer
            WHERE c_mktsegment IN ('{MW_SEG_A}', '{MW_SEG_B}')
        ),
        d AS (
            SELECT cents,
                   CAST(sum(grp) AS BIGINT) AS a_v,
                   CAST(count(*) - sum(grp) AS BIGINT) AS b_v
            FROM r GROUP BY 1
        ),
        c AS (
            SELECT cents,
                   sum(a_v) OVER (ORDER BY cents) AS cum_a,
                   sum(b_v) OVER (ORDER BY cents) AS cum_b
            FROM d
        ),
        nn AS (
            SELECT CAST(sum(a_v) AS BIGINT) AS n1,
                   CAST(sum(b_v) AS BIGINT) AS n2
            FROM d
        )
        SELECT nn.n1, nn.n2,
               CAST(max(abs(c.cum_a * nn.n2 - c.cum_b * nn.n1))
                    AS BIGINT) AS d_num,
               CAST(floor(CAST(max(abs(c.cum_a * nn.n2
                                       - c.cum_b * nn.n1)) AS DOUBLE)
                    / (CAST(nn.n1 AS DOUBLE) * nn.n2) * 1000000 + 0.5)
                    AS BIGINT) AS d_e6
        FROM c, nn
        GROUP BY nn.n1, nn.n2
    """,
)
def stats_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the
    Mann-Whitney pair of segments: D = max over values of
    |F̂₁ − F̂₂|, computed EXACTLY as the integer cross-multiplied form
    max |cum₁·n₂ − cum₂·n₁| on the value dictionary — the third
    member of the nonparametric trio (U: stochastic dominance; H:
    k-sample; KS: any distributional difference, location or shape).
    D in 1e-6 units derives from the exact integer maximum.

    Scale: identical shape to `stats_mann_whitney_u` — dictionary
    aggregation, TWO static-bucket distributed prefix sums (one per
    sample's counts, same bucketing), and a max-aggregate; integer
    numerators stay under int64 through ~sf30 (cum·n ≈ n²), DECIMAL
    past that.
    """
    from ..functions.ranking import with_global_cumsum_static

    r = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment").isin(MW_SEG_A, MW_SEG_B))
        .select(
            F.floor(F.col("c_acctbal") * 100 + 0.5)
            .cast("long")
            .alias("cents"),
            F.when(F.col("c_mktsegment") == MW_SEG_A, 1)
            .otherwise(0)
            .alias("grp"),
        )
    )
    from ..functions.caching import scoped_persist

    # pin the dictionary BEFORE chaining the two prefix helpers: each
    # helper collects its bucket totals, and an unpinned input would
    # recompute the row scan per collect (the rfm chaining lesson —
    # CLAUDE.md)
    d = scoped_persist(
        r.groupBy("cents").agg(
            F.sum("grp").cast("long").alias("a_v"),
            (F.count("*") - F.sum("grp")).cast("long").alias("b_v"),
        )
    )
    bucket = F.expr("cents div 100000")
    c = with_global_cumsum_static(d, bucket, ["cents"], "a_v", "cum_a")
    c = with_global_cumsum_static(c, bucket, ["cents"], "b_v", "cum_b")
    c = scoped_persist(c)
    nn = c.agg(
        F.sum("a_v").cast("long").alias("n1"),
        F.sum("b_v").cast("long").alias("n2"),
    )
    num = F.abs(
        F.col("cum_a") * F.col("n2") - F.col("cum_b") * F.col("n1")
    )
    return (
        c.crossJoin(F.broadcast(nn))
        .groupBy("n1", "n2")
        .agg(F.max(num).cast("long").alias("d_num"))
        .select(
            "n1",
            "n2",
            "d_num",
            F.floor(
                F.col("d_num").cast("double")
                / (F.col("n1").cast("double") * F.col("n2"))
                * 1000000
                + 0.5
            )
            .cast("long")
            .alias("d_e6"),
        )
    )


CUPED_SPLIT_DAY = 16  # days 1-15 = pre-period covariate, 16-30 = metric


@query(
    "ab_cuped_variance_reduction",
    oracle=f"""
        WITH per_user AS (
            SELECT user_id,
                   CAST(sum(CASE WHEN day(ts) < {CUPED_SPLIT_DAY}
                       THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS x,
                   CAST(sum(CASE WHEN day(ts) >= {CUPED_SPLIT_DAY}
                       THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS y
            FROM events WHERE value IS NOT NULL
            GROUP BY user_id
        ),
        assigned AS (
            SELECT CASE WHEN {hash64_sql(
                       "'" + AB_SALT + "|' || CAST(user_id AS VARCHAR)"
                   )} % 2 = 0 THEN 0 ELSE 1 END AS arm, x, y
            FROM per_user
        ),
        mom AS (
            SELECT count(*) AS n,
                   sum(CAST(x AS DECIMAL(38,0))) AS sx,
                   sum(CAST(y AS DECIMAL(38,0))) AS sy,
                   sum(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
                   sum(CAST(x AS DECIMAL(38,0)) * y) AS sxy,
                   sum(CAST(y AS DECIMAL(38,0)) * y) AS syy
            FROM assigned
        ),
        arms AS (
            SELECT arm, count(*) AS n_a,
                   sum(CAST(x AS DECIMAL(38,0))) AS sx_a,
                   sum(CAST(y AS DECIMAL(38,0))) AS sy_a
            FROM assigned GROUP BY arm
        ),
        calc AS (
            SELECT m.n,
                   (SELECT n_a FROM arms WHERE arm = 0) AS n0,
                   (SELECT n_a FROM arms WHERE arm = 1) AS n1,
                   (m.n * CAST(m.sxy AS DOUBLE)
                    - CAST(m.sx AS DOUBLE) * CAST(m.sy AS DOUBLE))
                   / (m.n * CAST(m.sxx AS DOUBLE)
                      - CAST(m.sx AS DOUBLE) * CAST(m.sx AS DOUBLE))
                       AS theta,
                   (m.n * CAST(m.sxy AS DOUBLE)
                    - CAST(m.sx AS DOUBLE) * CAST(m.sy AS DOUBLE))
                   * (m.n * CAST(m.sxy AS DOUBLE)
                      - CAST(m.sx AS DOUBLE) * CAST(m.sy AS DOUBLE))
                   / ((m.n * CAST(m.sxx AS DOUBLE)
                       - CAST(m.sx AS DOUBLE) * CAST(m.sx AS DOUBLE))
                      * (m.n * CAST(m.syy AS DOUBLE)
                         - CAST(m.sy AS DOUBLE) * CAST(m.sy AS DOUBLE)))
                       AS rho2,
                   CAST(m.sx AS DOUBLE) / m.n AS xbar,
                   (SELECT CAST(sy_a AS DOUBLE) / n_a FROM arms
                    WHERE arm = 1)
                   - (SELECT CAST(sy_a AS DOUBLE) / n_a FROM arms
                      WHERE arm = 0) AS raw_diff,
                   (SELECT CAST(sx_a AS DOUBLE) / n_a FROM arms
                    WHERE arm = 1)
                   - (SELECT CAST(sx_a AS DOUBLE) / n_a FROM arms
                      WHERE arm = 0) AS x_diff
            FROM mom m
        )
        SELECT CAST(n AS BIGINT) AS n_users,
               CAST(n0 AS BIGINT) AS n_control,
               CAST(n1 AS BIGINT) AS n_treatment,
               CAST(floor(theta * 1000000 + 0.5) AS BIGINT) AS theta_e6,
               CAST(floor(rho2 * 1000000 + 0.5) AS BIGINT) AS rho2_e6,
               CAST(floor(raw_diff * 100 + 0.5) AS BIGINT)
                   AS raw_diff_ccents,
               CAST(floor((raw_diff - theta * x_diff) * 100 + 0.5)
                    AS BIGINT) AS cuped_diff_ccents
        FROM calc
    """,
)
def ab_cuped_variance_reduction(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CUPED (Controlled-experiment Using Pre-Existing Data, Deng et
    al. WSDM'13) — the industry-standard variance-reduction adjustment
    for A/B tests: each user's post-period metric y is adjusted by
    θ·(x − x̄) where x is their PRE-period value and θ = cov(x,y)/var(x)
    from the pooled sample; the adjusted treatment-control difference
    has variance shrunk by the factor 1 − ρ², so the same experiment
    reaches significance with ~1/(1−ρ²)× fewer users. Completes the
    experimentation set (salted-hash bucketing, Welch z, Wilson CI)
    with the thing production platforms actually ship.

    Exactness: per-user pre/post sums are integer centi-units; θ and
    ρ² derive from DECIMAL(38,0)-exact pooled moments (the
    stats_correlation_matrix_exact discipline); arm means are
    rationals of exact sums; the reported adjusted difference is
    raw_diff − θ·x_diff in identical doubles, floored to centi-cents.

    Scale: one keyed per-user aggregation, one constant-state moment
    aggregate, one 2-row arm aggregate — CUPED at 100 TB costs the
    same as a sum; no per-user adjustment is ever materialized (the
    arm-mean algebra needs only the sums).
    """
    from ..functions.hashing import hash64

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    per_user = ev.groupBy("user_id").agg(
        F.sum(
            F.when(F.dayofmonth("ts") < CUPED_SPLIT_DAY, cents).otherwise(
                0
            )
        )
        .cast("long")
        .alias("x"),
        F.sum(
            F.when(F.dayofmonth("ts") >= CUPED_SPLIT_DAY, cents).otherwise(
                0
            )
        )
        .cast("long")
        .alias("y"),
    )
    assigned = per_user.select(
        (
            hash64(
                F.concat(
                    F.lit(AB_SALT + "|"), F.col("user_id").cast("string")
                )
            )
            % 2
        ).alias("arm"),
        "x",
        "y",
    )
    from ..functions.caching import scoped_persist

    assigned = scoped_persist(assigned)
    dec = "decimal(38,0)"
    mom = assigned.agg(
        F.count("*").alias("n"),
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("x")).alias("sxx"),
        F.sum(F.col("x").cast(dec) * F.col("y")).alias("sxy"),
        F.sum(F.col("y").cast(dec) * F.col("y")).alias("syy"),
    ).first()
    arms = {
        r.arm: r
        for r in assigned.groupBy("arm")
        .agg(
            F.count("*").alias("n_a"),
            F.sum(F.col("x").cast(dec)).alias("sx_a"),
            F.sum(F.col("y").cast(dec)).alias("sy_a"),
        )
        .collect()
    }
    n = mom.n
    sx, sy = float(mom.sx), float(mom.sy)
    sxx, sxy, syy = float(mom.sxx), float(mom.sxy), float(mom.syy)
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    rho2 = (
        (n * sxy - sx * sy)
        * (n * sxy - sx * sy)
        / ((n * sxx - sx * sx) * (n * syy - sy * sy))
    )
    a0, a1 = arms[0], arms[1]
    raw_diff = float(a1.sy_a) / a1.n_a - float(a0.sy_a) / a0.n_a
    x_diff = float(a1.sx_a) / a1.n_a - float(a0.sx_a) / a0.n_a
    import math as _math

    return spark.createDataFrame(
        [
            (
                n,
                a0.n_a,
                a1.n_a,
                _math.floor(theta * 1000000 + 0.5),
                _math.floor(rho2 * 1000000 + 0.5),
                _math.floor(raw_diff * 100 + 0.5),
                _math.floor((raw_diff - theta * x_diff) * 100 + 0.5),
            )
        ],
        "n_users long, n_control long, n_treatment long, theta_e6 long,"
        " rho2_e6 long, raw_diff_ccents long, cuped_diff_ccents long",
    )


# shared M-K z formula text: S with continuity correction over the
# tie-corrected variance (all inputs exact BIGINTs)
_MK_Z_SQL = (
    "CAST(floor((CASE WHEN s > 0 THEN (s - 1.0) WHEN s < 0 THEN (s + 1.0)"
    " ELSE 0.0 END / sqrt((CAST(nm AS DOUBLE) * (nm - 1) * (2 * nm + 5)"
    " - ties) / 18.0)) * 10000 + 0.5) AS BIGINT)"
)


@query(
    "trend_mann_kendall_test",
    oracle=f"""
        WITH monthly AS (
            SELECT c.c_mktsegment,
                   (year(o.o_orderdate) - 1992) * 12
                       + month(o.o_orderdate) - 1 AS t,
                   sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
                       AS rev_cents
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1, 2
        ),
        s_stat AS (
            SELECT a.c_mktsegment,
                   CAST(sum(CASE WHEN b.rev_cents > a.rev_cents THEN 1
                                 WHEN b.rev_cents < a.rev_cents THEN -1
                                 ELSE 0 END) AS BIGINT) AS s
            FROM monthly a
            JOIN monthly b ON a.c_mktsegment = b.c_mktsegment
                          AND a.t < b.t
            GROUP BY 1
        ),
        tie_groups AS (
            SELECT c_mktsegment,
                   CAST(sum(g * (g - 1) * (2 * g + 5)) AS BIGINT) AS ties
            FROM (SELECT c_mktsegment, count(*) AS g FROM monthly
                  GROUP BY c_mktsegment, rev_cents)
            GROUP BY 1
        ),
        nm_t AS (
            SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS nm
            FROM monthly GROUP BY 1
        )
        SELECT s.c_mktsegment, n.nm AS n_months, s.s AS s_stat, tg.ties,
               {_MK_Z_SQL} AS z_e4
        FROM s_stat s
        JOIN tie_groups tg ON s.c_mktsegment = tg.c_mktsegment
        JOIN nm_t n ON s.c_mktsegment = n.c_mktsegment
    """,
)
def trend_mann_kendall_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test per market segment — the SIGNIFICANCE
    half of the classic nonparametric trend pairing whose MAGNITUDE
    half is `trend_theil_sen_slope`: S = Σ sign(y_later − y_earlier)
    over all month pairs, z from the tie-corrected variance
    (n(n−1)(2n+5) − Σg(g−1)(2g+5))/18 with continuity correction.
    Monotone-trend detection with no linearity or normality
    assumption — the standard screen before trusting any fitted slope.

    S, n, and the tie term are exact BIGINTs (the pair relation is the
    same monthly self-join as Theil-Sen); z derives through one shared
    formula text.

    Scale: identical to Theil-Sen — quadratic in the MONTH count only
    (monthly pre-aggregation first), keyed aggregates throughout.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    monthly = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            "c_mktsegment",
            (
                (F.year("o_orderdate") - 1992) * 12
                + F.month("o_orderdate")
                - 1
            ).alias("t"),
        )
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
            ).alias("rev_cents")
        )
    )
    from ..functions.caching import scoped_persist

    monthly = scoped_persist(monthly)
    a, b = monthly.alias("a"), monthly.alias("b")
    s_stat = (
        a.join(
            b,
            (F.col("a.c_mktsegment") == F.col("b.c_mktsegment"))
            & (F.col("a.t") < F.col("b.t")),
        )
        .groupBy(F.col("a.c_mktsegment").alias("c_mktsegment"))
        .agg(
            F.sum(
                F.when(F.col("b.rev_cents") > F.col("a.rev_cents"), 1)
                .when(F.col("b.rev_cents") < F.col("a.rev_cents"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s")
        )
    )
    ties = (
        monthly.groupBy("c_mktsegment", "rev_cents")
        .agg(F.count("*").alias("g"))
        .groupBy("c_mktsegment")
        .agg(
            F.sum(
                F.col("g") * (F.col("g") - 1) * (2 * F.col("g") + 5)
            )
            .cast("long")
            .alias("ties")
        )
    )
    nm = monthly.groupBy("c_mktsegment").agg(
        F.count("*").cast("long").alias("nm")
    )
    return (
        s_stat.join(ties, "c_mktsegment")
        .join(nm, "c_mktsegment")
        .select(
            "c_mktsegment",
            F.col("nm").alias("n_months"),
            F.col("s").alias("s_stat"),
            "ties",
            F.expr(_MK_Z_SQL).alias("z_e4"),
        )
    )


BOOT_REPS = 100
BOOT_SALT = "boot1"
# Poisson(1) CDF thresholds in exact 1e-9 integer units: the weight is
# the count of thresholds below the hash-uniform — integer comparisons
# only, so resampling is bit-identical everywhere
_POIS_CDF_E9 = (
    367879441, 735758882, 919698602, 981011843,
    996340153, 999405815, 999916758,
)
_BOOT_LO = 3  # 2.5th percentile of B=100 replicate means (lower rank)
_BOOT_HI = 98  # 97.5th


def _pois_w_sql(u: str) -> str:
    """Poisson(1) draw from an integer uniform in [0, 1e9)."""
    return (
        "("
        + " + ".join(
            f"CASE WHEN {u} >= {t} THEN 1 ELSE 0 END"
            for t in _POIS_CDF_E9
        )
        + ")"
    )


@query(
    "bootstrap_poisson_ci_mean",
    oracle=f"""
        WITH rows_v AS (
            SELECT event_id,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
            FROM events
            WHERE event_type = 'purchase' AND value IS NOT NULL
        ),
        draws AS (
            SELECT r.cents, CAST(rep.i AS BIGINT) AS rep,
                   {_pois_w_sql(
                       hash64_sql(
                           "'" + BOOT_SALT + "|' || CAST(event_id AS VARCHAR)"
                           " || '|' || CAST(rep.i AS VARCHAR)"
                       ) + " % 1000000000"
                   )} AS w
            FROM rows_v r, (SELECT unnest(range({BOOT_REPS})) AS i) rep
        ),
        reps AS (
            SELECT rep, CAST(sum(w) AS BIGINT) AS n_w,
                   CAST(sum(w * cents) AS BIGINT) AS sum_w
            FROM draws GROUP BY rep HAVING sum(w) > 0
        ),
        ranked AS (
            SELECT rep, CAST(sum_w AS DOUBLE) / n_w AS m,
                   row_number() OVER (
                       ORDER BY CAST(sum_w AS DOUBLE) / n_w, rep
                   ) AS rk,
                   count(*) OVER () AS b
            FROM reps
        ),
        pt AS (
            SELECT CAST(sum(cents) AS BIGINT) AS s,
                   CAST(count(*) AS BIGINT) AS n
            FROM rows_v
        )
        SELECT (SELECT CAST(b AS BIGINT) FROM ranked LIMIT 1) AS n_reps,
               CAST(floor(CAST(pt.s AS DOUBLE) / pt.n * 10000 + 0.5)
                    AS BIGINT) AS mean_e4,
               CAST(floor((SELECT m FROM ranked WHERE rk = {_BOOT_LO})
                    * 10000 + 0.5) AS BIGINT) AS ci_lo_e4,
               CAST(floor((SELECT m FROM ranked WHERE rk = {_BOOT_HI})
                    * 10000 + 0.5) AS BIGINT) AS ci_hi_e4
        FROM pt
    """,
)
def bootstrap_poisson_ci_mean(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Poisson-bootstrap 95% CI for mean purchase value — THE
    distributed bootstrap (each row draws an independent Poisson(1)
    multiplicity per replicate, so resampling needs no global n and
    runs as one scan; the classic multinomial bootstrap cannot
    shard). Inference for arbitrary statistics where the CLT formulas
    (Welch, Wilson) don't reach.

    Determinism end-to-end: the per-(row, replicate) weight is the
    count of exact integer CDF thresholds below a salted-hash uniform
    in [0, 1e9) — integer comparisons only, so both engines draw the
    SAME resamples; replicate means are rationals of exact sums; the
    CI bounds are SELECTED order statistics of the 100 replicate
    means (never interpolated — the percentile-trap rule), floored in
    1e-4 cents.

    Scale: the replicate explode is rows×B but collapses immediately
    through a map-side-combinable keyed aggregate to B partial rows
    per task; the order-statistic window runs on B=100 rows (bounded
    by the replicate budget, not data). B scales the CI's resolution,
    not the shuffle width.
    """
    from ..functions.hashing import hash64

    r = (
        load_table(spark, sf_dir, "events")
        .filter(
            (F.col("event_type") == "purchase")
            & F.col("value").isNotNull()
        )
        .select(
            "event_id",
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        )
    )
    draws = r.select(
        "cents",
        F.explode(F.expr(f"sequence(0, {BOOT_REPS - 1})")).alias("rep"),
        "event_id",
    )
    u = (
        hash64(
            F.concat(
                F.lit(BOOT_SALT + "|"),
                F.col("event_id").cast("string"),
                F.lit("|"),
                F.col("rep").cast("string"),
            )
        )
        % 1000000000
    )
    w = sum(
        F.when(u >= t, 1).otherwise(0) for t in _POIS_CDF_E9
    )
    reps = (
        draws.select("cents", "rep", w.alias("w"))
        .groupBy("rep")
        .agg(
            F.sum("w").cast("long").alias("n_w"),
            F.sum(F.col("w") * F.col("cents")).cast("long").alias("sum_w"),
        )
        .filter(F.col("n_w") > 0)
    )
    from pyspark.sql.window import Window

    m = F.col("sum_w").cast("double") / F.col("n_w")
    ranked = reps.select(
        m.alias("m"),
        F.row_number()
        .over(Window.orderBy(m, F.col("rep")))
        .alias("rk"),
        F.count("*").over(Window.partitionBy()).alias("b"),
    )
    from ..functions.caching import scoped_persist

    ranked = scoped_persist(ranked)
    pt = r.agg(
        F.sum("cents").cast("long").alias("s"),
        F.count("*").cast("long").alias("n"),
    )
    lo = ranked.filter(F.col("rk") == _BOOT_LO).select(
        F.floor(F.col("m") * 10000 + 0.5).cast("long").alias("ci_lo_e4")
    )
    hi = ranked.filter(F.col("rk") == _BOOT_HI).select(
        F.floor(F.col("m") * 10000 + 0.5).cast("long").alias("ci_hi_e4")
    )
    b = ranked.agg(F.max("b").cast("long").alias("n_reps"))
    return (
        b.crossJoin(
            F.broadcast(
                pt.select(
                    F.floor(
                        F.col("s").cast("double") / F.col("n") * 10000
                        + 0.5
                    )
                    .cast("long")
                    .alias("mean_e4")
                )
            )
        )
        .crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
    )


@query(
    "events_hour_of_day_profile",
    oracle="""
        WITH h AS (
            SELECT event_type, hour(ts) AS hod, count(*) AS n
            FROM events GROUP BY 1, 2
        ),
        t AS (
            SELECT event_type, CAST(sum(n) AS BIGINT) AS tot,
                   CAST(max(n) AS BIGINT) AS mx
            FROM h GROUP BY 1
        )
        SELECT h.event_type, CAST(h.hod AS INTEGER) AS hod,
               CAST(h.n AS BIGINT) AS n,
               h.n * 10000 // t.tot AS share_bp,
               h.n = t.mx AS is_peak_hour
        FROM h JOIN t ON h.event_type = t.event_type
    """,
)
def events_hour_of_day_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hour-of-day seasonality profile per event type: volume share in
    integer basis points and the peak-hour flag — the diurnal
    fingerprint that capacity planning and anomaly baselines consume
    (the weekly shape lives in the STL decomposition; this is the
    within-day shape). A type whose traffic is flat across hours is
    usually bot traffic — the flag-bearing rows give the oracle both
    branches at every SF (24 hours × 5 types, ≥1 peak each).

    Scale: one keyed aggregation to a 24×|types| relation + a
    broadcast totals join; constant output size at any SF.
    """
    ev = load_table(spark, sf_dir, "events")
    h = ev.groupBy(
        "event_type", F.hour("ts").alias("hod")
    ).agg(F.count("*").alias("n"))
    from ..functions.caching import scoped_persist

    h = scoped_persist(h)
    t = h.groupBy("event_type").agg(
        F.sum("n").cast("long").alias("tot"),
        F.max("n").cast("long").alias("mx"),
    )
    return h.join(F.broadcast(t), "event_type").select(
        "event_type",
        F.col("hod").cast("int").alias("hod"),
        F.col("n").cast("long").alias("n"),
        F.expr("n * 10000 div tot").alias("share_bp"),
        (F.col("n") == F.col("mx")).alias("is_peak_hour"),
    )


@query(
    "dq_functional_dependency_audit",
    oracle="""
        WITH fd1 AS (
            SELECT 'c_custkey->c_mktsegment' AS fd,
                   count(*) AS n_keys,
                   CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_violating
            FROM (SELECT c_custkey,
                         count(DISTINCT c_mktsegment) AS nd
                  FROM customer GROUP BY 1)
        ),
        fd2 AS (
            SELECT 'o_orderdate->o_orderpriority' AS fd,
                   count(*) AS n_keys,
                   CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_violating
            FROM (SELECT o_orderdate,
                         count(DISTINCT o_orderpriority) AS nd
                  FROM orders GROUP BY 1)
        ),
        u AS (SELECT * FROM fd1 UNION ALL SELECT * FROM fd2)
        SELECT fd, n_keys, n_violating,
               n_violating * 10000 // n_keys AS violation_bp,
               n_violating = 0 AS holds
        FROM u
    """,
)
def dq_functional_dependency_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Functional-dependency audit — the profiling check behind
    normalization and dedup-key design: for each candidate FD
    ``determinant → dependent``, count determinant values mapping to
    MORE than one dependent value. Two declared candidates give the
    oracle both verdict branches: the key-to-segment FD HOLDS (a real
    key), the date-to-priority FD is massively violated (dates don't
    determine priority) — so a regression in either direction flips a
    checked value. This is the single-table sibling of the
    referential-integrity and uniqueness audits. (Registered from
    analytics.py, NOT quality.py: appending to the quality module would
    shift the driver-verified registry prefix — CLAUDE.md.)

    Scale: each FD is one groupBy(determinant) +
    count(DISTINCT dependent) — Catalyst's two-phase partial-distinct
    aggregate, one shuffle per FD keyed on the determinant; the audit
    over k declared FDs costs k keyed aggregations regardless of SF.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")

    def audit(df: DataFrame, det: str, dep: str) -> DataFrame:
        g = df.groupBy(det).agg(F.countDistinct(dep).alias("nd"))
        return g.agg(
            F.lit(f"{det}->{dep}").alias("fd"),
            F.count("*").alias("n_keys"),
            F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_violating"),
        )
    u = audit(cust, "c_custkey", "c_mktsegment").unionByName(
        audit(orders, "o_orderdate", "o_orderpriority")
    )
    return u.select(
        "fd",
        "n_keys",
        "n_violating",
        F.expr("n_violating * 10000 div n_keys").alias("violation_bp"),
        (F.col("n_violating") == 0).alias("holds"),
    )


# registration relocated from operators/dedup.py (see note there): the
# implementation and oracle live with the dedup family; registering
# HERE keeps the driver-verified registry prefix composition stable.
from .dedup import _CROSS_SOURCE_ORACLE as _XSRC_ORACLE  # noqa: E402
from .dedup import dedup_cross_source_leakage as _xsrc_impl  # noqa: E402

query("dedup_cross_source_leakage", oracle=_XSRC_ORACLE)(_xsrc_impl)


@query(
    "ab_difference_in_differences",
    oracle=f"""
        WITH per_user AS (
            SELECT user_id,
                   CAST(sum(CASE WHEN day(ts) < 8
                       THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS p0,
                   CAST(sum(CASE WHEN day(ts) >= 8
                             AND day(ts) < {CUPED_SPLIT_DAY}
                       THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS pre,
                   CAST(sum(CASE WHEN day(ts) >= {CUPED_SPLIT_DAY}
                       THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS post
            FROM events WHERE value IS NOT NULL
            GROUP BY user_id
        ),
        assigned AS (
            SELECT CASE WHEN {hash64_sql(
                       "'" + AB_SALT + "|' || CAST(user_id AS VARCHAR)"
                   )} % 2 = 0 THEN 0 ELSE 1 END AS arm, p0, pre, post
            FROM per_user
        ),
        arms AS (
            SELECT arm, CAST(count(*) AS BIGINT) AS n_a,
                   CAST(sum(p0) AS BIGINT) AS s0,
                   CAST(sum(pre) AS BIGINT) AS s1,
                   CAST(sum(post) AS BIGINT) AS s2
            FROM assigned GROUP BY arm
        ),
        w AS (
            SELECT
              (SELECT n_a FROM arms WHERE arm = 0) AS n0,
              (SELECT n_a FROM arms WHERE arm = 1) AS n1,
              (SELECT CAST(s2 AS DOUBLE) / n_a FROM arms WHERE arm = 1)
              - (SELECT CAST(s1 AS DOUBLE) / n_a FROM arms WHERE arm = 1)
              - ((SELECT CAST(s2 AS DOUBLE) / n_a FROM arms WHERE arm = 0)
                 - (SELECT CAST(s1 AS DOUBLE) / n_a FROM arms
                    WHERE arm = 0)) AS did,
              (SELECT CAST(s1 AS DOUBLE) / n_a FROM arms WHERE arm = 1)
              - (SELECT CAST(s0 AS DOUBLE) / n_a FROM arms WHERE arm = 1)
              - ((SELECT CAST(s1 AS DOUBLE) / n_a FROM arms WHERE arm = 0)
                 - (SELECT CAST(s0 AS DOUBLE) / n_a FROM arms
                    WHERE arm = 0)) AS placebo
        )
        SELECT n0 AS n_control, n1 AS n_treatment,
               CAST(floor(did * 100 + 0.5) AS BIGINT) AS did_ccents,
               CAST(floor(placebo * 100 + 0.5) AS BIGINT)
                   AS placebo_ccents
        FROM w
    """,
)
def ab_difference_in_differences(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Difference-in-differences: (treatment post − pre) − (control
    post − pre) — the causal estimator for the OBSERVATIONAL setting
    where CUPED's randomization assumption doesn't hold (staged
    rollouts, geo launches): the control arm's pre→post drift absorbs
    the common time trend. Shipped WITH its diagnostic: a PLACEBO DiD
    over two pre-treatment windows (days 1-7 vs 8-15), which must sit
    near zero for the parallel-trends assumption to be credible — the
    check practitioners skip and then regret. Both estimates derive
    from the four arm×period exact integer sums (no per-user values
    materialized past the first aggregate).

    Scale: one per-user keyed aggregation + a 2-row arm rollup —
    constant cost beyond the scan at any SF.
    """
    from ..functions.hashing import hash64

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(F.dayofmonth("ts") < 8, cents).otherwise(0))
        .cast("long")
        .alias("p0"),
        F.sum(
            F.when(
                (F.dayofmonth("ts") >= 8)
                & (F.dayofmonth("ts") < CUPED_SPLIT_DAY),
                cents,
            ).otherwise(0)
        )
        .cast("long")
        .alias("pre"),
        F.sum(
            F.when(F.dayofmonth("ts") >= CUPED_SPLIT_DAY, cents).otherwise(0)
        )
        .cast("long")
        .alias("post"),
    )
    arms = {
        r.arm: r
        for r in per_user.select(
            (
                hash64(
                    F.concat(
                        F.lit(AB_SALT + "|"),
                        F.col("user_id").cast("string"),
                    )
                )
                % 2
            ).alias("arm"),
            "p0",
            "pre",
            "post",
        )
        .groupBy("arm")
        .agg(
            F.count("*").cast("long").alias("n_a"),
            F.sum("p0").cast("long").alias("s0"),
            F.sum("pre").cast("long").alias("s1"),
            F.sum("post").cast("long").alias("s2"),
        )
        .collect()
    }
    a0, a1 = arms[0], arms[1]

    def mean(s, n):
        return float(s) / n

    did = (mean(a1.s2, a1.n_a) - mean(a1.s1, a1.n_a)) - (
        mean(a0.s2, a0.n_a) - mean(a0.s1, a0.n_a)
    )
    placebo = (mean(a1.s1, a1.n_a) - mean(a1.s0, a1.n_a)) - (
        mean(a0.s1, a0.n_a) - mean(a0.s0, a0.n_a)
    )
    import math as _math

    return spark.createDataFrame(
        [
            (
                a0.n_a,
                a1.n_a,
                _math.floor(did * 100 + 0.5),
                _math.floor(placebo * 100 + 0.5),
            )
        ],
        "n_control long, n_treatment long, did_ccents long,"
        " placebo_ccents long",
    )


DUP_PAY_WINDOW_DAYS = 90
DUP_PAY_BAND = 1000  # same-$1000-band amounts count as "similar"


@query(
    "dq_duplicate_payment_screen",
    oracle=f"""
        WITH o AS (
            SELECT o_orderkey, o_custkey,
                   CAST(floor(o_totalprice / {DUP_PAY_BAND}) AS BIGINT)
                       AS amt_band,
                   o_orderdate
            FROM orders
        )
        SELECT a.o_custkey, a.amt_band,
               a.o_orderkey AS first_key, b.o_orderkey AS second_key,
               CAST(date_diff('day', a.o_orderdate, b.o_orderdate)
                    AS BIGINT) AS day_gap
        FROM o a JOIN o b
          ON a.o_custkey = b.o_custkey
         AND a.amt_band = b.amt_band
         AND a.o_orderkey < b.o_orderkey
         AND b.o_orderdate >= a.o_orderdate
         AND date_diff('day', a.o_orderdate, b.o_orderdate)
             <= {DUP_PAY_WINDOW_DAYS}
    """,
)
def dq_duplicate_payment_screen(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Repeat-similar-order screen — the duplicate-payment audit
    adapted to this corpus's cadence: order pairs from the SAME
    customer in the SAME ${DUP_PAY_BAND} amount band within
    {DUP_PAY_WINDOW_DAYS} days (double-submits, split orders,
    double-billing candidates). An exact-cents/5-day bar finds ZERO
    pairs at sf0.01 (~10 orders per customer over 7 years) — the
    vacuous-green guard rejected that calibration, so the band/window
    pair is set where the sf0.01 corpus genuinely exercises the
    logic. Blocking on (customer, band) keeps the quadratic harmless.

    All integer/date-exact: bands by floor-division, gap in whole
    days; ordered pair (smaller key first, non-negative gap) once.

    Scale: equi-join on the (custkey, cents) block key — never a
    cross join; AQE splits a pathological hot block (a customer
    spamming one amount), and a block-size cap upstream
    (source_cap_sample pattern) bounds adversarial input.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.floor(F.col("o_totalprice") / DUP_PAY_BAND)
        .cast("long")
        .alias("amt_band"),
        "o_orderdate",
    )
    a, b = o.alias("a"), o.alias("b")
    gap = F.datediff(F.col("b.o_orderdate"), F.col("a.o_orderdate"))
    return (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.amt_band") == F.col("b.amt_band"))
            & (F.col("a.o_orderkey") < F.col("b.o_orderkey")),
        )
        .filter((gap >= 0) & (gap <= DUP_PAY_WINDOW_DAYS))
        .select(
            F.col("a.o_custkey").alias("o_custkey"),
            F.col("a.amt_band").alias("amt_band"),
            F.col("a.o_orderkey").alias("first_key"),
            F.col("b.o_orderkey").alias("second_key"),
            gap.cast("long").alias("day_gap"),
        )
    )


@query(
    "ops_lead_time_service_levels",
    oracle="""
        WITH lt AS (
            SELECT n.n_name,
                   date_diff('day', o.o_orderdate, l.l_shipdate) AS days
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
        )
        SELECT n_name,
               count(*) AS n_lines,
               CAST(sum(CASE WHEN days <= 30 THEN 1 ELSE 0 END)
                    AS BIGINT) * 10000 // count(*) AS within_30d_bp,
               CAST(sum(CASE WHEN days <= 60 THEN 1 ELSE 0 END)
                    AS BIGINT) * 10000 // count(*) AS within_60d_bp,
               CAST(sum(CASE WHEN days <= 90 THEN 1 ELSE 0 END)
                    AS BIGINT) * 10000 // count(*) AS within_90d_bp,
               CAST(max(days) AS BIGINT) AS worst_days
        FROM lt GROUP BY n_name
    """,
)
def ops_lead_time_service_levels(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Order-to-ship lead-time SERVICE LEVELS per supplier nation —
    the operations dashboard: share of line items shipped within
    30/60/90 days of the order, in integer basis points, plus the
    worst case. Service-level SHARES at fixed day bars instead of
    lead-time percentiles deliberately: shares are pure integer
    counting (the cross-engine percentile-interpolation trap never
    enters — memory: cross-engine-float-traps), and SLA contracts are
    written as "x% within N days" anyway.

    Scale: the fact table joins two broadcast dimensions and the
    orders date (the q5-family join shape Catalyst already reorders);
    one keyed aggregation, |nations| rows out.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    days = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    lt = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("n_name", days.alias("days"))
    )

    def within(d: int):
        # integer floor-division end to end (double-divide-then-cast
        # truncates the IEEE quotient — last-ulp drift vs // at scale)
        return F.expr(
            f"CAST(sum(CASE WHEN days <= {d} THEN 1 ELSE 0 END)"
            " AS BIGINT) * 10000 div count(*)"
        )

    return lt.groupBy("n_name").agg(
        F.count("*").alias("n_lines"),
        within(30).alias("within_30d_bp"),
        within(60).alias("within_60d_bp"),
        within(90).alias("within_90d_bp"),
        F.max("days").cast("long").alias("worst_days"),
    )


@query(
    "market_concentration_hhi",
    oracle="""
        WITH rev AS (
            SELECT n.n_name, l.l_suppkey,
                   CAST(sum(CAST(floor(l.l_extendedprice
                        * (1 - l.l_discount) * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS cents
            FROM lineitem l
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            GROUP BY 1, 2
        ),
        tot AS (
            SELECT n_name, CAST(sum(cents) AS BIGINT) AS t,
                   count(*) AS n_suppliers,
                   CAST(max(cents) AS BIGINT) AS mx,
                   sum(CAST(cents AS DECIMAL(38,0)) * cents) AS sq
            FROM rev GROUP BY 1
        )
        SELECT n_name, n_suppliers,
               CAST(floor(CAST(sq AS DOUBLE)
                    / (CAST(t AS DOUBLE) * t) * 1000000 + 0.5)
                    AS BIGINT) AS hhi_e6,
               mx * 10000 // t AS top_share_bp
        FROM tot
    """,
)
def market_concentration_hhi(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Herfindahl-Hirschman concentration of supplier revenue per
    nation: HHI = Σ shareᵢ² in 1e-6 units (10 000 ≈ the US antitrust
    "moderately concentrated" bar scaled) plus the largest single
    share — the market-structure complement of the ABC/Pareto family
    (ABC ranks; HHI is the one-number concentration index a risk or
    procurement team tracks over time). Σcents² accumulates in
    DECIMAL(38,0) (cents² overflows int64 by sf0.1); HHI derives as
    one identical double expression from the exact aggregates.

    Scale: two keyed aggregations (supplier revenue, then the
    per-nation moment rollup) — constant-size state, |nations| rows.
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    rev = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name", "l_suppkey")
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * 100
                    + 0.5
                ).cast("long")
            )
            .cast("long")
            .alias("cents")
        )
    )
    tot = rev.groupBy("n_name").agg(
        F.sum("cents").cast("long").alias("t"),
        F.count("*").alias("n_suppliers"),
        F.max("cents").cast("long").alias("mx"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents")).alias(
            "sq"
        ),
    )
    return tot.select(
        "n_name",
        "n_suppliers",
        F.floor(
            F.col("sq").cast("double")
            / (F.col("t").cast("double") * F.col("t"))
            * 1000000
            + 0.5
        )
        .cast("long")
        .alias("hhi_e6"),
        F.expr("mx * 10000 div t").alias("top_share_bp"),
    )


@query(
    "inequality_gini_customer_spend",
    oracle="""
        WITH spend AS (
            SELECT o_custkey,
                   CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                        AS BIGINT)) AS BIGINT) AS cents
            FROM orders GROUP BY 1
        ),
        ranked AS (
            SELECT cents,
                   row_number() OVER (ORDER BY cents, o_custkey) AS r
            FROM spend
        ),
        agg AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(cents) AS BIGINT) AS t,
                   CAST(sum(r * cents) AS BIGINT) AS srx
            FROM ranked
        )
        SELECT n AS n_customers, t AS total_cents,
               CAST(floor(CAST(2 * srx - (n + 1) * t AS DOUBLE)
                    / (CAST(n AS DOUBLE) * t) * 1000000 + 0.5)
                    AS BIGINT) AS gini_e6
        FROM agg
    """,
)
def inequality_gini_customer_spend(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Gini coefficient of customer spend — the inequality measure
    pairing with the HHI (HHI: how concentrated revenue is among
    SUPPLIERS; Gini: how unequal spend is across CUSTOMERS — the
    whale-dependence number a revenue-risk review tracks). Computed
    from the rank identity G = Σ(2rᵢ−n−1)xᵢ / (n·Σx) — exact BIGINT
    numerator (tie order is irrelevant: equal x under permuted ranks
    leave the sum unchanged), one double division at the end.

    Scale: the global rank is the STATIC-monotone-bucket distributed
    rank (cents div 10⁶ bands — no sampling, no pin, no
    single-partition sort); everything else is keyed aggregation.
    The rank·cents products pass int64 near sf10 — DECIMAL there.
    """
    from ..functions.ranking import with_global_rank_static

    spend = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
            )
            .cast("long")
            .alias("cents")
        )
    )
    ranked = with_global_rank_static(
        spend,
        F.expr("cents div 1000000"),
        ["cents", "o_custkey"],
        "r",
    )
    agg = ranked.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cents").cast("long").alias("t"),
        F.sum(F.col("r") * F.col("cents")).cast("long").alias("srx"),
    )
    # G numerator via the algebraic identity 2·Σr·x − (n+1)·Σx (a
    # window count inside an aggregate is illegal in both engines)
    return agg.select(
        F.col("n").alias("n_customers"),
        F.col("t").alias("total_cents"),
        F.floor(
            (
                2 * F.col("srx") - (F.col("n") + 1) * F.col("t")
            ).cast("double")
            / (F.col("n").cast("double") * F.col("t"))
            * 1000000
            + 0.5
        )
        .cast("long")
        .alias("gini_e6"),
    )


CROSTON_ALPHA = "0.3"
CROSTON_MIN_ARRIVALS = 3


@query(
    "forecast_croston_intermittent",
    oracle=f"""
        WITH RECURSIVE d AS (
            SELECT l_partkey,
                   (year(l_shipdate) - 1992) * 12
                       + month(l_shipdate) - 1 AS t,
                   CAST(sum(l_quantity) AS BIGINT) AS q
            FROM lineitem GROUP BY 1, 2
        ),
        idx AS (
            SELECT l_partkey, t, q,
                   row_number() OVER (PARTITION BY l_partkey
                                      ORDER BY t) AS rn
            FROM d
        ),
        mx AS (SELECT l_partkey, max(rn) AS m FROM idx GROUP BY 1),
        rec(l_partkey, rn, t, z, p) AS (
            SELECT l_partkey, 1, t, CAST(q AS DOUBLE),
                   CAST(t + 1 AS DOUBLE)
            FROM idx WHERE rn = 1
            UNION ALL
            SELECT i.l_partkey, r.rn + 1, i.t,
                   {CROSTON_ALPHA}::DOUBLE * i.q
                   + (1.0::DOUBLE - {CROSTON_ALPHA}::DOUBLE) * r.z,
                   {CROSTON_ALPHA}::DOUBLE * (i.t - r.t)
                   + (1.0::DOUBLE - {CROSTON_ALPHA}::DOUBLE) * r.p
            FROM rec r JOIN idx i ON i.l_partkey = r.l_partkey
                                 AND i.rn = r.rn + 1
        )
        SELECT r.l_partkey, CAST(mx.m AS BIGINT) AS n_arrivals,
               CAST(floor(r.z * 10000 + 0.5) AS BIGINT) AS size_e4,
               CAST(floor(r.p * 10000 + 0.5) AS BIGINT) AS interval_e4,
               CAST(floor(r.z / r.p * 1000000 + 0.5) AS BIGINT)
                   AS demand_rate_e6
        FROM rec r JOIN mx ON r.l_partkey = mx.l_partkey
                          AND r.rn = mx.m
        WHERE mx.m >= {CROSTON_MIN_ARRIVALS}
    """,
)
def forecast_croston_intermittent(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Croston's method for INTERMITTENT demand (sparse series with
    many zero periods — exactly per-part monthly demand here, ~25
    arrivals over 84 months): separate exponential smoothings of the
    demand SIZE (z) and the inter-demand INTERVAL (p), forecast rate
    z/p per period. The forecaster Holt/seasonal models get wrong on
    sparse series (they smooth the zeros into the level); the
    spare-parts/long-tail-SKU standard.

    Zeros never materialize: the recursion runs over ARRIVALS only
    (gap = t − t_prev carries the interval information), so the state
    fold is O(arrivals), not O(periods). Spark folds each part's
    sorted arrival array row-locally; the oracle replays the identical
    recurrence as ONE recursive CTE over all parts simultaneously
    (the Holt oracle pattern — DuckDB list_reduce is not oracle-safe,
    memory: cross-engine-float-traps).

    Scale: keyed aggregation to arrivals, per-key row-local fold over
    a time-bounded array; 2 000 parts × ≤ 84 elements at any SF.
    """
    a = CROSTON_ALPHA + "D"
    li = load_table(spark, sf_dir, "lineitem")
    d = li.groupBy(
        "l_partkey",
        (
            (F.year("l_shipdate") - 1992) * 12 + F.month("l_shipdate") - 1
        ).alias("t"),
    ).agg(F.sum("l_quantity").cast("long").alias("q"))
    arr = d.groupBy("l_partkey").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("t"), F.col("q")))
        ).alias("a")
    )
    fold = (
        "aggregate(slice(a, 2, size(a) - 1), "
        "named_struct('t', a[0].t, "
        "'z', CAST(a[0].q AS DOUBLE), "
        "'p', CAST(a[0].t + 1 AS DOUBLE)), "
        f"(acc, x) -> named_struct('t', x.t, "
        f"'z', {a} * x.q + (1.0D - {a}) * acc.z, "
        f"'p', {a} * (x.t - acc.t) + (1.0D - {a}) * acc.p))"
    )
    return (
        arr.filter(F.expr(f"size(a) >= {CROSTON_MIN_ARRIVALS}"))
        .select(
            "l_partkey",
            F.expr("size(a)").cast("long").alias("n_arrivals"),
            F.expr(
                f"CAST(floor(({fold}).z * 10000 + 0.5) AS BIGINT)"
            ).alias("size_e4"),
            F.expr(
                f"CAST(floor(({fold}).p * 10000 + 0.5) AS BIGINT)"
            ).alias("interval_e4"),
            F.expr(
                f"CAST(floor(({fold}).z / ({fold}).p * 1000000 + 0.5)"
                " AS BIGINT)"
            ).alias("demand_rate_e6"),
        )
    )


ACF_LAGS = (1, 2, 7)


@query(
    "timeseries_autocorrelation_lags",
    oracle=f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1
        )
        {" UNION ALL ".join(f'''
        SELECT {lag} AS lag, count(*) AS n_pairs,
               round((count(*) * CAST(sum(a.n * b.n) AS DOUBLE)
                      - CAST(sum(a.n) AS DOUBLE) * sum(b.n))
                     / sqrt((count(*) * CAST(sum(a.n * a.n) AS DOUBLE)
                             - CAST(sum(a.n) AS DOUBLE) * sum(a.n))
                          * (count(*) * CAST(sum(b.n * b.n) AS DOUBLE)
                             - CAST(sum(b.n) AS DOUBLE) * sum(b.n))),
                     6) + 0.0 AS acf_r6
        FROM daily a JOIN daily b
          ON b.day = a.day + INTERVAL {lag} DAY'''
        for lag in ACF_LAGS)}
    """,
)
def timeseries_autocorrelation_lags(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Autocorrelation of daily event volume at calendar lags 1/2/7 —
    the periodicity detector that picks the seasonal period BEFORE
    fitting a seasonal model (a strong lag-7 says weekly; STL and the
    seasonal-naive forecaster then consume that period as an input
    instead of an assumption). Pearson r over (day, day+lag) pairs
    from exact BIGINT sums (counts and their products never touch
    floats until the single final expression, rounded to 6).

    Scale: the daily rollup is time-bounded; each lag is one
    equi-join on the shifted date key (a calendar lag is an exact key,
    not a window) + a constant-state moment aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count("*").cast("long").alias("n")
    )
    from ..functions.caching import scoped_persist

    daily = scoped_persist(daily)
    arms = []
    for lag in ACF_LAGS:
        a, b = daily.alias("a"), daily.alias("b")
        j = a.join(
            b, F.col("b.day") == F.date_add(F.col("a.day"), lag)
        ).select(F.col("a.n").alias("x"), F.col("b.n").alias("y"))
        mom = j.agg(
            F.count("*").alias("c"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
            F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
            F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        )
        r = (
            F.col("c") * F.col("sxy").cast("double")
            - F.col("sx").cast("double") * F.col("sy")
        ) / F.sqrt(
            (
                F.col("c") * F.col("sxx").cast("double")
                - F.col("sx").cast("double") * F.col("sx")
            )
            * (
                F.col("c") * F.col("syy").cast("double")
                - F.col("sy").cast("double") * F.col("sy")
            )
        )
        arms.append(
            mom.select(
                F.lit(lag).alias("lag"),
                F.col("c").alias("n_pairs"),
                (F.round(r, 6) + 0.0).alias("acf_r6"),
            )
        )
    out = arms[0]
    for a_ in arms[1:]:
        out = out.unionByName(a_)
    return out


SPLIT_SALT = "split1"


def _split_oracle() -> str:
    from ..functions.hashing import hash64_sql
    from .dedup import _CC_CTES

    nh = hash64_sql(f"'{SPLIT_SALT}|' || CAST(c.doc_id AS VARCHAR)")
    ch = hash64_sql(f"'{SPLIT_SALT}|' || CAST(c.cluster_id AS VARCHAR)")
    return f"""
        {_CC_CTES},
        clusters AS (
            SELECT n AS doc_id, min(lbl) AS cluster_id FROM cc GROUP BY n
        ),
        sides AS (
            SELECT c.doc_id,
                   ({nh} % 10 < 8) AS naive_train,
                   ({ch} % 10 < 8) AS cluster_train
            FROM clusters c
        ),
        leaks AS (
            SELECT
              CAST(sum(CASE WHEN a.naive_train <> b.naive_train
                       THEN 1 ELSE 0 END) AS BIGINT) AS naive_leak,
              CAST(sum(CASE WHEN a.cluster_train <> b.cluster_train
                       THEN 1 ELSE 0 END) AS BIGINT) AS cluster_leak
            FROM pairs p
            JOIN sides a ON p.da = a.doc_id
            JOIN sides b ON p.db = b.doc_id
        )
        SELECT 'naive' AS method,
               (SELECT count(*) FROM sides WHERE naive_train) AS n_train,
               (SELECT count(*) FROM sides WHERE NOT naive_train)
                   AS n_test,
               naive_leak AS cross_split_neardup_pairs
        FROM leaks
        UNION ALL
        SELECT 'cluster_aware',
               (SELECT count(*) FROM sides WHERE cluster_train),
               (SELECT count(*) FROM sides WHERE NOT cluster_train),
               cluster_leak
        FROM leaks
    """


@query("training_dedup_aware_split", oracle=_split_oracle())
def training_dedup_aware_split(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Dedup-AWARE train/test split — the leakage fix the whole dedup
    family exists to enable: hash-splitting by DOCUMENT id strands
    near-duplicate pairs across the boundary (the eval contamination
    `dedup_cross_source_leakage` measures between sources), while
    hash-splitting by CLUSTER id (the connected-component root from
    `dedup_cluster_assignment`) keeps every near-dup family on one
    side — cross-split near-dup pairs are ZERO by construction. Both
    arms are reported with their leak counts, so the oracle checks
    the naive arm's nonzero leakage AND the cluster arm's zero.

    Scale: clusters and pairs come from the LSH band machinery
    (bounded buckets, star-kernel components); the split itself is a
    salted hash on the root id — O(docs), deterministic, and stable
    as the corpus grows (a new near-dup joins its family's side).
    """
    from ..functions.caching import scoped_persist
    from ..functions.hashing import hash64
    from .dedup import dedup_cluster_assignment, dedup_minhash_lsh_pairs

    clusters = dedup_cluster_assignment(spark, sf_dir)
    pairs = dedup_minhash_lsh_pairs(spark, sf_dir)
    sides = clusters.select(
        "doc_id",
        (
            hash64(
                F.concat(
                    F.lit(SPLIT_SALT + "|"),
                    F.col("doc_id").cast("string"),
                )
            )
            % 10
            < 8
        ).alias("naive_train"),
        (
            hash64(
                F.concat(
                    F.lit(SPLIT_SALT + "|"),
                    F.col("cluster_id").cast("string"),
                )
            )
            % 10
            < 8
        ).alias("cluster_train"),
    )
    sides = scoped_persist(sides)
    a = sides.select(
        F.col("doc_id").alias("doc_a"),
        F.col("naive_train").alias("na"),
        F.col("cluster_train").alias("ca"),
    )
    b = sides.select(
        F.col("doc_id").alias("doc_b"),
        F.col("naive_train").alias("nb"),
        F.col("cluster_train").alias("cb"),
    )
    leaks = (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .agg(
            F.sum(F.when(F.col("na") != F.col("nb"), 1).otherwise(0))
            .cast("long")
            .alias("naive_leak"),
            F.sum(F.when(F.col("ca") != F.col("cb"), 1).otherwise(0))
            .cast("long")
            .alias("cluster_leak"),
        )
    ).first()
    counts = sides.agg(
        F.sum(F.when(F.col("naive_train"), 1).otherwise(0)).alias("nt"),
        F.sum(F.when(~F.col("naive_train"), 1).otherwise(0)).alias("nv"),
        F.sum(F.when(F.col("cluster_train"), 1).otherwise(0)).alias("ct"),
        F.sum(F.when(~F.col("cluster_train"), 1).otherwise(0)).alias("cv"),
    ).first()
    return spark.createDataFrame(
        [
            ("naive", counts.nt, counts.nv, leaks.naive_leak),
            ("cluster_aware", counts.ct, counts.cv, leaks.cluster_leak),
        ],
        "method string, n_train long, n_test long,"
        " cross_split_neardup_pairs long",
    )

from .dedup import _mh_lookup_oracle as _mhl_oracle  # noqa: E402
from .dedup import dedup_minhash_topk_lookup as _mhl_impl  # noqa: E402

query("dedup_minhash_topk_lookup", oracle=_mhl_oracle())(_mhl_impl)


TOPIC_TOP_TERMS = 3
TOPIC_MIN_TF = 5


@query(
    "topic_label_keywords_ctfidf",
    oracle=f"""
        WITH w AS (
            SELECT e.label, t.word
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                  FROM documents) t
            JOIN embeddings e ON e.vec_id = t.doc_id
            WHERE t.word <> ''
        ),
        tfc AS (
            SELECT label, word, CAST(count(*) AS BIGINT) AS tf_c
            FROM w GROUP BY 1, 2
        ),
        tft AS (
            SELECT word, CAST(sum(tf_c) AS BIGINT) AS tf_t
            FROM tfc GROUP BY 1
        ),
        scored AS (
            SELECT c.label, c.word, c.tf_c,
                   c.tf_c * 1000000 // t.tf_t AS share_e6,
                   row_number() OVER (
                       PARTITION BY c.label
                       ORDER BY c.tf_c * 1000000 // t.tf_t DESC, c.word
                   ) AS rnk
            FROM tfc c JOIN tft t ON c.word = t.word
            WHERE c.tf_c >= {TOPIC_MIN_TF}
        )
        SELECT label, word, tf_c, share_e6, CAST(rnk AS INTEGER) AS rnk
        FROM scored WHERE rnk <= {TOPIC_TOP_TERMS}
    """,
)
def topic_label_keywords_ctfidf(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cluster keyword labeling (c-TF-IDF-lite, the BERTopic recipe):
    for each embedding-space cluster (the label column — the same
    cells the IVF index probes), the terms most CONCENTRATED in that
    cluster — share = cluster-tf ×1e6 div corpus-tf, min-support
    filtered, top-{TOPIC_TOP_TERMS} per cluster with term tie-breaks.
    Joins the text and vector sides of the corpus (vec_id ≡ doc_id):
    this is how embedding clusters get human-readable names in a
    topic-modeling / corpus-triage pipeline.

    All-integer ranking; the per-label window partitions by label.

    Scale: (label, word) aggregation with map-side partials
    (vocabulary-bounded output), corpus-tf is a second
    vocabulary-sized aggregate broadcast back; no per-doc state.
    """
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label"
    )
    w = (
        docs.select(
            "doc_id", F.explode(F.split("text", " ")).alias("word")
        )
        .filter(F.col("word") != "")
        .join(F.broadcast(emb), F.col("doc_id") == F.col("vec_id"))
    )
    tfc = w.groupBy("label", "word").agg(
        F.count("*").cast("long").alias("tf_c")
    )
    from ..functions.caching import scoped_persist

    tfc = scoped_persist(tfc)
    tft = tfc.groupBy("word").agg(
        F.sum("tf_c").cast("long").alias("tf_t")
    )
    from pyspark.sql.window import Window as _W

    share = F.expr("tf_c * 1000000 div tf_t")
    scored = (
        tfc.filter(F.col("tf_c") >= TOPIC_MIN_TF)
        .join(F.broadcast(tft), "word")
        .select("label", "word", "tf_c", share.alias("share_e6"))
    )
    rnk = F.row_number().over(
        _W.partitionBy("label").orderBy(
            F.col("share_e6").desc(), F.col("word")
        )
    )
    return (
        scored.withColumn("rnk", rnk.cast("int"))
        .filter(F.col("rnk") <= TOPIC_TOP_TERMS)
    )


BOT_CV2_BAR_E6 = 700_000  # CV² below 0.70 ⇒ suspiciously regular
BOT_MIN_GAPS = 5


@query(
    "fraud_bot_regularity_screen",
    oracle=f"""
        WITH e AS (
            SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS s FROM events
        ),
        g AS (
            SELECT user_id,
                   s - lag(s) OVER (PARTITION BY user_id ORDER BY s)
                       AS gap
            FROM e
        ),
        a AS (
            SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
                   CAST(sum(gap) AS BIGINT) AS sg,
                   CAST(sum(gap * gap) AS BIGINT) AS sgg
            FROM g WHERE gap IS NOT NULL
            GROUP BY 1 HAVING count(*) >= {BOT_MIN_GAPS}
        )
        SELECT user_id, n_gaps,
               sg // n_gaps AS mean_gap_s,
               CAST(floor((n_gaps * CAST(sgg AS DOUBLE)
                    / (CAST(sg AS DOUBLE) * sg) - 1.0)
                    * 1000000 + 0.5) AS BIGINT) AS cv2_e6,
               CAST(floor((n_gaps * CAST(sgg AS DOUBLE)
                    / (CAST(sg AS DOUBLE) * sg) - 1.0)
                    * 1000000 + 0.5) AS BIGINT) < {BOT_CV2_BAR_E6}
                   AS too_regular
        FROM a
    """,
)
def fraud_bot_regularity_screen(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Bot/automation screen on inter-event TIMING: per user, the
    squared coefficient of variation of inter-event gaps — human
    (Poisson-ish) activity sits near CV² ≈ 1, schedulers and scripted
    clients are far more regular (CV² → 0). Users under the
    {BOT_CV2_BAR_E6}/1e6 bar flag as too-regular — the behavioral
    sibling of the flat-diurnal-profile signal
    (`events_hour_of_day_profile`). The bar is calibrated so the
    sf0.01 corpus flags a real tail (~5-8%) with both branches
    populated.

    CV² = n·Σg²/(Σg)² − 1 from exact BIGINT gap moments (epoch
    seconds); one identical double expression, floored to 1e-6, then
    an integer threshold compare.

    Scale: the lag window partitions per user (gap count bounded by
    user activity); moments are keyed aggregates. n·Σg² in double
    (the BIGINT product passes int64 for multi-month spans — noted).
    """
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql.window import Window as _W

    s = F.unix_timestamp("ts").alias("s")
    g = ev.select("user_id", s).select(
        "user_id",
        (
            F.col("s")
            - F.lag("s").over(_W.partitionBy("user_id").orderBy("s"))
        ).alias("gap"),
    )
    a = (
        g.filter(F.col("gap").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_gaps"),
            F.sum("gap").cast("long").alias("sg"),
            F.sum(F.col("gap") * F.col("gap")).cast("long").alias("sgg"),
        )
        .filter(F.col("n_gaps") >= BOT_MIN_GAPS)
    )
    cv2 = F.floor(
        (
            F.col("n_gaps") * F.col("sgg").cast("double")
            / (F.col("sg").cast("double") * F.col("sg"))
            - 1.0
        )
        * 1000000
        + 0.5
    ).cast("long")
    return a.select(
        "user_id",
        "n_gaps",
        F.expr("sg div n_gaps").alias("mean_gap_s"),
        cv2.alias("cv2_e6"),
        (cv2 < BOT_CV2_BAR_E6).alias("too_regular"),
    )


SPC_Z = "2.0"  # control-limit width (2σ: calibrated to flag a real
# tail on this corpus; the textbook 3σ flags nothing at sf0.01)


@query(
    "spc_p_chart_return_rate",
    oracle=f"""
        WITH m AS (
            SELECT (year(l_shipdate) - 1992) * 12
                       + month(l_shipdate) - 1 AS t,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CASE WHEN l_returnflag = 'R'
                        THEN 1 ELSE 0 END) AS BIGINT) AS r
            FROM lineitem GROUP BY 1
        ),
        tot AS (
            SELECT CAST(sum(r) AS BIGINT) AS rt,
                   CAST(sum(n) AS BIGINT) AS nt
            FROM m
        )
        SELECT m.t, m.n, m.r,
               m.r * 1000000 // m.n AS rate_e6,
               abs(CAST(m.r AS DOUBLE) / m.n
                   - CAST(tot.rt AS DOUBLE) / tot.nt)
               > {SPC_Z}::DOUBLE
                 * sqrt((CAST(tot.rt AS DOUBLE) / tot.nt)
                        * (1.0::DOUBLE
                           - CAST(tot.rt AS DOUBLE) / tot.nt) / m.n)
                   AS out_of_control
        FROM m, tot
    """,
)
def spc_p_chart_return_rate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Statistical process control p-chart of the monthly RETURN RATE:
    each month's rate against ±{SPC_Z}σ binomial control limits around
    the process mean — the SPC discipline that separates common-cause
    noise from a month that genuinely shifted (supplier defect batch,
    policy change). Flags 4 of 83 months at sf0.01 — both chart
    branches value-checked.

    Exactness: counts are BIGINT; the center line and limits derive
    from exact integer totals through ONE identical double expression
    on both engines (rates compared, never emitted raw — the monthly
    rate ships as integer ppm separately).

    Scale: one keyed monthly aggregate + a broadcast scalar total;
    the chart relation is time-bounded.
    """
    li = load_table(spark, sf_dir, "lineitem")
    m = li.groupBy(
        (
            (F.year("l_shipdate") - 1992) * 12 + F.month("l_shipdate") - 1
        ).alias("t")
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("long")
        .alias("r"),
    )
    tot = m.agg(
        F.sum("r").cast("long").alias("rt"),
        F.sum("n").cast("long").alias("nt"),
    )
    pbar = F.col("rt").cast("double") / F.col("nt")
    dev = F.abs(F.col("r").cast("double") / F.col("n") - pbar)
    lim = float(SPC_Z) * F.sqrt(pbar * (1.0 - pbar) / F.col("n"))
    return m.crossJoin(F.broadcast(tot)).select(
        "t",
        "n",
        "r",
        F.expr("r * 1000000 div n").alias("rate_e6"),
        (dev > lim).alias("out_of_control"),
    )


TRIPLET_ANCHORS = 20


@query(
    "embedding_triplet_margin_eval",
    oracle=f"""
        WITH e AS (
            SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
            FROM embeddings
        ),
        a AS (SELECT * FROM e WHERE vec_id < {TRIPLET_ANCHORS}),
        best AS (
            SELECT a.vec_id,
                   max(CASE WHEN b.label = a.label
                       THEN list_cosine_similarity(a.emb, b.emb) END)
                       AS bp,
                   max(CASE WHEN b.label <> a.label
                       THEN list_cosine_similarity(a.emb, b.emb) END)
                       AS bn
            FROM a JOIN e b ON b.vec_id <> a.vec_id
            GROUP BY 1
        )
        SELECT vec_id AS anchor_id,
               CAST(floor(bp * 1000000 + 0.5) AS BIGINT) AS best_pos_e6,
               CAST(floor(bn * 1000000 + 0.5) AS BIGINT) AS best_neg_e6,
               CAST(floor((bp - bn) * 1000000 + 0.5) AS BIGINT)
                   AS margin_e6,
               bp - bn < 0.0 AS violated
        FROM best
    """,
)
def embedding_triplet_margin_eval(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Triplet-margin QA for the embedding space: per anchor, the best
    SAME-label cosine (hardest positive achievable) vs the best
    OTHER-label cosine (hardest negative) — a NEGATIVE margin means
    some wrong-label vector sits closer than every right-label one,
    i.e. a 1-NN classifier misfires there (the per-anchor drill-down
    under `embedding_knn_label_confusion`, and the evaluation side of
    `hard_negative_mining`). Both branches populated: this corpus's
    margins span −0.18..+0.04 at sf0.01.

    Max-cosine per (anchor, side) from engine-identical doubles;
    margins floored to 1e-6; the violation flag is a sign test.

    Scale: anchors broadcast against the corpus (the batch-top-k
    shape); one grouped aggregate per anchor — never corpus × corpus.
    """
    from ..functions.vectors import cosine_similarity

    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.filter(F.col("vec_id") < TRIPLET_ANCHORS).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("alabel"),
        F.col("embedding").alias("aemb"),
    )
    cos = cosine_similarity(F.col("aemb"), F.col("embedding"))
    best = (
        emb.crossJoin(F.broadcast(a))
        .filter(F.col("vec_id") != F.col("anchor_id"))
        .groupBy("anchor_id")
        .agg(
            F.max(
                F.when(F.col("label") == F.col("alabel"), cos)
            ).alias("bp"),
            F.max(
                F.when(F.col("label") != F.col("alabel"), cos)
            ).alias("bn"),
        )
    )
    return best.select(
        "anchor_id",
        F.floor(F.col("bp") * 1000000 + 0.5).cast("long").alias(
            "best_pos_e6"
        ),
        F.floor(F.col("bn") * 1000000 + 0.5).cast("long").alias(
            "best_neg_e6"
        ),
        F.floor((F.col("bp") - F.col("bn")) * 1000000 + 0.5)
        .cast("long")
        .alias("margin_e6"),
        (F.col("bp") - F.col("bn") < 0.0).alias("violated"),
    )


MARKOV_TRAIN_LAST_DAY = 20  # days 1-20 train, 21+ evaluate


@query(
    "markov_next_event_accuracy_eval",
    oracle=f"""
        WITH seq AS (
            SELECT user_id, ts, event_type,
                   lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev
            FROM events
        ),
        train AS (
            SELECT prev, event_type AS nxt, count(*) AS c
            FROM seq
            WHERE prev IS NOT NULL
              AND day(ts) <= {MARKOV_TRAIN_LAST_DAY}
            GROUP BY 1, 2
        ),
        pred AS (
            SELECT prev, nxt AS predicted FROM (
                SELECT prev, nxt,
                       row_number() OVER (
                           PARTITION BY prev ORDER BY c DESC, nxt
                       ) AS rn
                FROM train
            ) WHERE rn = 1
        ),
        test AS (
            SELECT s.prev, s.event_type AS actual
            FROM seq s
            WHERE s.prev IS NOT NULL
              AND day(s.ts) > {MARKOV_TRAIN_LAST_DAY}
        )
        SELECT count(*) AS n_test,
               CAST(sum(CASE WHEN t.actual = p.predicted
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
               CAST(sum(CASE WHEN t.actual = p.predicted
                    THEN 1 ELSE 0 END) AS BIGINT) * 10000 // count(*)
                   AS accuracy_bp
        FROM test t JOIN pred p ON t.prev = p.prev
    """,
)
def markov_next_event_accuracy_eval(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Held-out evaluation of the first-order Markov next-event model:
    transitions from days 1-{MARKOV_TRAIN_LAST_DAY} train the
    argmax-next predictor (`markov_event_transitions` is the model;
    this is its honest accuracy number), transitions whose TARGET
    falls after the cutoff score it — temporal splitting, the only
    split that doesn't leak future behavior into the table. Integer
    counts, argmax with event-name tie-break, accuracy in exact bp.

    Scale: the sequence lag partitions per user; the model is
    |event_types|² rows (broadcast); the eval is one join + counting.
    """
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql.window import Window as _W

    seq = ev.select(
        "user_id",
        "ts",
        "event_type",
        F.lag("event_type")
        .over(_W.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("prev"),
    ).filter(F.col("prev").isNotNull())
    from ..functions.caching import scoped_persist

    seq = scoped_persist(seq)
    train = (
        seq.filter(F.dayofmonth("ts") <= MARKOV_TRAIN_LAST_DAY)
        .groupBy("prev", F.col("event_type").alias("nxt"))
        .agg(F.count("*").alias("c"))
    )
    rn = F.row_number().over(
        _W.partitionBy("prev").orderBy(F.col("c").desc(), F.col("nxt"))
    )
    pred = (
        train.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select("prev", F.col("nxt").alias("predicted"))
    )
    test = seq.filter(
        F.dayofmonth("ts") > MARKOV_TRAIN_LAST_DAY
    ).select("prev", F.col("event_type").alias("actual"))
    hit = F.sum(
        F.when(F.col("actual") == F.col("predicted"), 1).otherwise(0)
    ).cast("long")
    return test.join(F.broadcast(pred), "prev").agg(
        F.count("*").alias("n_test"),
        hit.alias("n_correct"),
        F.expr(
            "CAST(sum(CASE WHEN actual = predicted THEN 1 ELSE 0 END)"
            " AS BIGINT) * 10000 div count(*)"
        ).alias("accuracy_bp"),
    )


@query(
    "pricing_discount_elasticity",
    oracle="""
        WITH u AS (
            SELECT p.p_brand,
                   CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT) AS d,
                   CAST(l.l_quantity AS BIGINT) AS q
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        ),
        mom AS (
            SELECT p_brand, count(*) AS n,
                   sum(CAST(d AS DECIMAL(38,0))) AS sx,
                   sum(CAST(q AS DECIMAL(38,0))) AS sy,
                   sum(CAST(d AS DECIMAL(38,0)) * d) AS sxx,
                   sum(CAST(d AS DECIMAL(38,0)) * q) AS sxy
            FROM u GROUP BY 1
        )
        SELECT p_brand, CAST(n AS BIGINT) AS n_lines,
               CAST(floor(
                   (n * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / (n * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                   * 1000000 + 0.5) AS BIGINT)
                   AS qty_per_disc_pt_e6
        FROM mom
    """,
)
def pricing_discount_elasticity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Discount elasticity per brand: the least-squares slope of
    ordered QUANTITY on DISCOUNT POINTS — does a deeper discount move
    volume for this brand, and by how many units per point? The
    pricing-analytics read on data the engine already has, via the
    exact-DECIMAL-moment regression (`stats_correlation_matrix_exact`
    discipline — discount in integer points, quantity integer, four
    exact moments per brand, slope through one identical double
    expression in 1e-6 units).

    Scale: broadcast part-dimension join + one constant-state moment
    aggregate per brand; |brands| rows out.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    u = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "p_brand",
        F.floor(F.col("l_discount") * 100 + 0.5).cast("long").alias("d"),
        F.col("l_quantity").cast("long").alias("q"),
    )
    dec = "decimal(38,0)"
    mom = u.groupBy("p_brand").agg(
        F.count("*").alias("n"),
        F.sum(F.col("d").cast(dec)).alias("sx"),
        F.sum(F.col("q").cast(dec)).alias("sy"),
        F.sum(F.col("d").cast(dec) * F.col("d")).alias("sxx"),
        F.sum(F.col("d").cast(dec) * F.col("q")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, sxy = F.col("sxx").cast("double"), F.col("sxy").cast("double")
    slope = (nd * sxy - sx * sy) / (nd * sxx - sx * sx)
    return mom.select(
        "p_brand",
        F.col("n").cast("long").alias("n_lines"),
        F.floor(slope * 1000000 + 0.5).cast("long").alias(
            "qty_per_disc_pt_e6"
        ),
    )


MDE_Z = "2.8016"  # z_{α/2}=1.9600 + z_{power=0.8}=0.8416


@query(
    "ab_minimum_detectable_effect",
    oracle=f"""
        WITH per_user AS (
            SELECT user_id,
                   CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS cents
            FROM events
            WHERE event_type = 'purchase' AND value IS NOT NULL
            GROUP BY user_id
        ),
        mom AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(cents) AS BIGINT) AS s,
                   sum(CAST(cents AS DECIMAL(38,0)) * cents) AS ss
            FROM per_user
        )
        SELECT n AS n_users,
               s // n AS mean_cents,
               CAST(floor(sqrt((n * CAST(ss AS DOUBLE)
                    - CAST(s AS DOUBLE) * s) / (n * (n - 1.0)))
                    * 100 + 0.5) AS BIGINT) AS sd_ccents,
               CAST(floor({MDE_Z}::DOUBLE
                    * sqrt((n * CAST(ss AS DOUBLE)
                            - CAST(s AS DOUBLE) * s) / (n * (n - 1.0)))
                    * sqrt(2.0::DOUBLE / (n // 2)) * 100 + 0.5)
                    AS BIGINT) AS mde_ccents,
               CAST(floor({MDE_Z}::DOUBLE
                    * sqrt((n * CAST(ss AS DOUBLE)
                            - CAST(s AS DOUBLE) * s) / (n * (n - 1.0)))
                    * sqrt(2.0::DOUBLE / (n // 2))
                    / (CAST(s AS DOUBLE) / n) * 10000 + 0.5)
                    AS BIGINT) AS mde_rel_bp
        FROM mom
    """,
)
def ab_minimum_detectable_effect(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Experiment POWER ANALYSIS: the minimum detectable effect on
    per-user purchase value if the current population split 50/50 —
    MDE = (z_{{α/2}} + z_{{power}})·σ·√(2/n_arm) at α=0.05, power=0.8.
    The design-side member of the experimentation set (CUPED and DiD
    analyze a finished experiment; this says whether the experiment is
    WORTH RUNNING at the available sample size — the question skipped
    before every underpowered test). Absolute MDE in centi-cents and
    relative MDE in bp of the mean.

    σ from exact integer/DECIMAL moments (sample variance via
    n·Σx²−(Σx)²); z-constants baked as shared literals; one identical
    double expression end-to-end.

    Scale: one per-user aggregation + a constant-state moment
    aggregate — power analysis at any SF costs a sum.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    )
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long"))
        .cast("long")
        .alias("cents")
    )
    mom = per_user.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents")).alias(
            "ss"
        ),
    )
    nd = F.col("n").cast("double")
    sd = F.sqrt(
        (F.col("n") * F.col("ss").cast("double")
         - F.col("s").cast("double") * F.col("s"))
        / (F.col("n") * (nd - 1.0))
    )
    mde = (
        F.lit(float(MDE_Z))
        * sd
        * F.sqrt(F.lit(2.0) / F.expr("n div 2"))
    )
    return mom.select(
        F.col("n").alias("n_users"),
        F.expr("s div n").alias("mean_cents"),
        F.floor(sd * 100 + 0.5).cast("long").alias("sd_ccents"),
        F.floor(mde * 100 + 0.5).cast("long").alias("mde_ccents"),
        F.floor(
            mde / (F.col("s").cast("double") / F.col("n")) * 10000 + 0.5
        )
        .cast("long")
        .alias("mde_rel_bp"),
    )


NEYMAN_BUDGET = 1000  # total sample budget to allocate


@query(
    "sampling_neyman_allocation",
    oracle=f"""
        WITH s AS (
            SELECT c_mktsegment,
                   CAST(count(*) AS BIGINT) AS nh,
                   CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS sx,
                   sum(CAST(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
                       AS DECIMAL(38,0))
                       * CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
                       AS sxx
            FROM customer GROUP BY 1
        ),
        w AS (
            SELECT c_mktsegment, nh, sx, sxx,
                   CAST(round(nh * sqrt((nh * CAST(sxx AS DOUBLE)
                              - CAST(sx AS DOUBLE) * sx)
                             / (nh * (nh - 1.0))), 4)
                        AS DECIMAL(38,4)) AS nh_sd
            FROM s
        ),
        tot AS (
            SELECT CAST(sum(nh) AS BIGINT) AS n_total,
                   CAST(sum(nh_sd) AS DOUBLE) AS sum_nh_sd
            FROM w
        )
        SELECT w.c_mktsegment, w.nh,
               CAST(floor(sqrt((w.nh * CAST(w.sxx AS DOUBLE)
                    - CAST(w.sx AS DOUBLE) * w.sx)
                    / (w.nh * (w.nh - 1.0))) * 100 + 0.5) AS BIGINT)
                   AS sd_ccents,
               CAST(floor({NEYMAN_BUDGET}
                    * CAST(w.nh_sd AS DOUBLE) / tot.sum_nh_sd
                    + 0.5) AS BIGINT) AS neyman_n,
               CAST(floor({NEYMAN_BUDGET}
                    * (CAST(w.nh AS DOUBLE) / tot.n_total) + 0.5)
                    AS BIGINT) AS proportional_n
        FROM w, tot
    """,
)
def sampling_neyman_allocation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Neyman OPTIMAL allocation for stratified sampling: a fixed
    budget of {NEYMAN_BUDGET} samples split across market segments
    ∝ N_h·σ_h — high-variance strata earn more than their population
    share, which is exactly where proportional allocation (the
    `stratified_sample_per_lang` policy) wastes budget. Reported
    side-by-side with the proportional split so the reallocation is
    visible; the design input to any audit/labeling-budget decision.

    σ_h from exact integer/DECIMAL per-stratum moments; the two
    allocations derive from identical double expressions; the N_h·σ_h
    terms are round4+DECIMAL-summed (associative — no float-order
    hazard at any stratum count).

    Scale: one keyed moment aggregate; |strata| rows.
    """
    cust = load_table(spark, sf_dir, "customer").select(
        "c_mktsegment",
        F.floor(F.col("c_acctbal") * 100 + 0.5).cast("long").alias("cents"),
    )
    s = cust.groupBy("c_mktsegment").agg(
        F.count("*").cast("long").alias("nh"),
        F.sum("cents").cast("long").alias("sx"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents")).alias(
            "sxx"
        ),
    )
    sd = F.sqrt(
        (
            F.col("nh") * F.col("sxx").cast("double")
            - F.col("sx").cast("double") * F.col("sx")
        )
        / (F.col("nh") * (F.col("nh").cast("double") - 1.0))
    )
    w = s.withColumn(
        "nh_sd",
        F.round(F.col("nh") * sd, 4).cast("decimal(38,4)"),
    )
    from ..functions.caching import scoped_persist

    w = scoped_persist(w)
    tot = w.agg(
        F.sum("nh").cast("long").alias("n_total"),
        F.sum("nh_sd").cast("double").alias("sum_nh_sd"),
    )
    return w.crossJoin(F.broadcast(tot)).select(
        "c_mktsegment",
        "nh",
        F.floor(sd * 100 + 0.5).cast("long").alias("sd_ccents"),
        F.floor(
            NEYMAN_BUDGET * F.col("nh_sd").cast("double")
            / F.col("sum_nh_sd")
            + 0.5
        )
        .cast("long")
        .alias("neyman_n"),
        F.floor(
            NEYMAN_BUDGET
            * (F.col("nh").cast("double") / F.col("n_total"))
            + 0.5
        )
        .cast("long")
        .alias("proportional_n"),
    )


BEHAVIOR_ENTROPY_BAR_E6 = 2_000_000  # bits ×1e6; max for 5 types ≈ 2.32


@query(
    "behavior_entropy_segments",
    oracle=f"""
        WITH c AS (
            SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS k
            FROM events GROUP BY 1, 2
        ),
        t AS (
            SELECT user_id, CAST(sum(k) AS BIGINT) AS n,
                   count(*) AS n_types
            FROM c GROUP BY 1
        ),
        terms AS (
            SELECT c.user_id,
                   CAST(round(-(CAST(c.k AS DOUBLE) / t.n)
                        * log2(CAST(c.k AS DOUBLE) / t.n), 9)
                        AS DECIMAL(18,9)) AS term
            FROM c JOIN t ON c.user_id = t.user_id
        ),
        h AS (
            SELECT user_id, sum(term) AS ent FROM terms GROUP BY 1
        )
        SELECT t.user_id, t.n AS n_events,
               CAST(t.n_types AS BIGINT) AS n_types,
               CAST(floor(CAST(h.ent AS DOUBLE) * 1000000 + 0.5)
                    AS BIGINT) AS entropy_e6,
               CASE WHEN CAST(floor(CAST(h.ent AS DOUBLE) * 1000000
                              + 0.5) AS BIGINT)
                         >= {BEHAVIOR_ENTROPY_BAR_E6}
                    THEN 'explorer' ELSE 'specialist' END AS segment
        FROM t JOIN h ON t.user_id = h.user_id
    """,
)
def behavior_entropy_segments(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Behavioral-entropy segmentation: Shannon entropy of each user's
    event-type mix — near-uniform users ('explorers', H → log₂5) vs
    users concentrated in few actions ('specialists') — the
    engagement-breadth axis RFM's depth metrics miss. Entropy terms
    −p·log₂p round9+DECIMAL-summed per user (the char-entropy
    discipline); the band threshold compares post-floor integers, both
    segments populated at sf0.01.

    Scale: (user, type) keyed aggregate (≤5 rows per user), per-user
    DECIMAL sum — no windows, no collection.
    """
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(
        F.count("*").cast("long").alias("k")
    )
    t = c.groupBy("user_id").agg(
        F.sum("k").cast("long").alias("n"),
        F.count("*").cast("long").alias("n_types"),
    )
    p = F.col("k").cast("double") / F.col("n")
    terms = c.join(t, "user_id").select(
        "user_id",
        F.round(-p * F.log2(p), 9).cast("decimal(18,9)").alias("term"),
    )
    h = terms.groupBy("user_id").agg(F.sum("term").alias("ent"))
    e6 = F.floor(F.col("ent").cast("double") * 1000000 + 0.5).cast("long")
    return t.join(h, "user_id").select(
        "user_id",
        F.col("n").alias("n_events"),
        "n_types",
        e6.alias("entropy_e6"),
        F.when(e6 >= BEHAVIOR_ENTROPY_BAR_E6, "explorer")
        .otherwise("specialist")
        .alias("segment"),
    )


DRIFT_COS_BAR_E6 = 995_000  # cos(old, new centroid) below this ⇒ drift


@query(
    "embedding_drift_centroid_shift",
    oracle=f"""
        WITH half AS (
            SELECT label, vec_id,
                   vec_id % 2 AS h,
                   CAST(embedding AS DOUBLE[]) AS emb
            FROM embeddings
        ),
        comp AS (
            SELECT label, h, i.i AS dim,
                   CAST(round(emb[CAST(i.i AS INTEGER)], 9)
                        AS DECIMAL(18,9)) AS v
            FROM half, UNNEST(range(1, 65)) AS i(i)
        ),
        cent AS (
            SELECT label, h, dim,
                   CAST(sum(v) AS DOUBLE) / count(*) AS c
            FROM comp GROUP BY 1, 2, 3
        ),
        pairs AS (
            SELECT a.label, a.dim, a.c AS ca, b.c AS cb
            FROM cent a JOIN cent b
              ON a.label = b.label AND a.dim = b.dim
             AND a.h = 0 AND b.h = 1
        ),
        dots AS (
            SELECT label,
                   sum(CAST(round(ca * cb, 9) AS DECIMAL(18,9))) AS ab,
                   sum(CAST(round(ca * ca, 9) AS DECIMAL(18,9))) AS aa,
                   sum(CAST(round(cb * cb, 9) AS DECIMAL(18,9))) AS bb
            FROM pairs GROUP BY 1
        )
        SELECT label,
               CAST(floor(CAST(ab AS DOUBLE)
                    / sqrt(CAST(aa AS DOUBLE) * CAST(bb AS DOUBLE))
                    * 1000000 + 0.5) AS BIGINT) AS centroid_cos_e6,
               CAST(floor(CAST(ab AS DOUBLE)
                    / sqrt(CAST(aa AS DOUBLE) * CAST(bb AS DOUBLE))
                    * 1000000 + 0.5) AS BIGINT) < {DRIFT_COS_BAR_E6}
                   AS drifted
        FROM dots
    """,
)
def embedding_drift_centroid_shift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Embedding-distribution drift monitor: per label, the cosine
    between the class centroid of one half of the corpus (even
    vec_ids, standing in for "the embeddings we indexed last month")
    and the other half ("this month's") — the cheap first alarm that
    an encoder change or data shift moved the space and the ANN index
    / classifier thresholds need revisiting. PSI watches scalar
    columns; this is its vector-column sibling.

    Exactness: per-component sums are round9+DECIMAL (float32 inputs
    widen exactly; centroid = exact-decimal sum / integer count), and
    the centroid dot products are themselves round9+DECIMAL-summed —
    no float-order hazard at either aggregation level.

    Scale: the component explode is rows×64 but collapses immediately
    through a map-side-combinable (label, half, dim) aggregate; the
    cosine runs on |labels|×64 rows.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    half = emb.select(
        "label",
        (F.col("vec_id") % 2).alias("h"),
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "dim", "v"
        ),
    )
    comp = half.select(
        "label",
        "h",
        "dim",
        F.round(F.col("v"), 9).cast("decimal(18,9)").alias("v"),
    )
    cent = comp.groupBy("label", "h", "dim").agg(
        (F.sum("v").cast("double") / F.count("*")).alias("c")
    )
    a = cent.filter(F.col("h") == 0).select(
        "label", "dim", F.col("c").alias("ca")
    )
    b = cent.filter(F.col("h") == 1).select(
        "label", "dim", F.col("c").alias("cb")
    )
    pairs = a.join(b, ["label", "dim"])
    dots = pairs.groupBy("label").agg(
        F.sum(
            F.round(F.col("ca") * F.col("cb"), 9).cast("decimal(18,9)")
        ).alias("ab"),
        F.sum(
            F.round(F.col("ca") * F.col("ca"), 9).cast("decimal(18,9)")
        ).alias("aa"),
        F.sum(
            F.round(F.col("cb") * F.col("cb"), 9).cast("decimal(18,9)")
        ).alias("bb"),
    )
    cos_e6 = F.floor(
        F.col("ab").cast("double")
        / F.sqrt(F.col("aa").cast("double") * F.col("bb").cast("double"))
        * 1000000
        + 0.5
    ).cast("long")
    return dots.select(
        "label",
        cos_e6.alias("centroid_cos_e6"),
        (cos_e6 < DRIFT_COS_BAR_E6).alias("drifted"),
    )


@query(
    "embedding_isotropy_index",
    oracle="""
        WITH comp AS (
            SELECT i.i AS dim,
                   CAST(round(CAST(embedding AS DOUBLE[])
                        [CAST(i.i AS INTEGER)], 9) AS DECIMAL(18,9))
                       AS v
            FROM embeddings, UNNEST(range(1, 65)) AS i(i)
        ),
        n_t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings),
        cent AS (
            SELECT dim, CAST(sum(v) AS DOUBLE) AS sv,
                   sum(CAST(round(CAST(v AS DOUBLE)
                       * CAST(v AS DOUBLE), 9) AS DECIMAL(18,9))) AS svv
            FROM comp GROUP BY dim
        ),
        agg AS (
            SELECT sum(CAST(round((sv / n.n) * (sv / n.n), 9)
                       AS DECIMAL(18,9))) AS mu2,
                   CAST(sum(svv) AS DOUBLE) / n.n AS ex2,
                   n.n
            FROM cent, n_t n GROUP BY n.n
        )
        SELECT n AS n_vectors,
               CAST(floor(CAST(mu2 AS DOUBLE) * 1000000 + 0.5)
                    AS BIGINT) AS mean_norm2_e6,
               CAST(floor(ex2 * 1000000 + 0.5) AS BIGINT)
                   AS avg_norm2_e6,
               CAST(floor((1.0 - CAST(mu2 AS DOUBLE) / ex2) * 1000000
                    + 0.5) AS BIGINT) AS isotropy_e6
        FROM agg
    """,
)
def embedding_isotropy_index(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Isotropy index of the embedding space: 1 − ‖μ‖²/E[‖x‖²] — the
    fraction of vector energy NOT explained by the common mean
    direction. Transformer embeddings are notoriously anisotropic
    (a dominant shared direction inflates all cosines and flattens
    retrieval contrast); this one-pass index is the health check run
    before trusting cosine thresholds, and the before/after metric
    for mean-centering or whitening fixes. Near 1 = healthy, low =
    collapsed.

    Exactness: component sums, squared-component sums, and the
    per-dimension μ² terms are all round9+DECIMAL-summed — three
    nested aggregates, zero float-order hazard.

    Scale: one rows×64 explode collapsing into a 64-row per-dimension
    aggregate; the index is a constant-size reduction of that.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    comp = emb.select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "dim", "v"
        )
    ).select(
        "dim", F.round(F.col("v"), 9).cast("decimal(18,9)").alias("v")
    )
    n = emb.count()
    cent = comp.groupBy("dim").agg(
        F.sum("v").cast("double").alias("sv"),
        F.sum(
            F.round(
                F.col("v").cast("double") * F.col("v").cast("double"), 9
            ).cast("decimal(18,9)")
        ).alias("svv"),
    )
    agg = cent.agg(
        F.sum(
            F.round(
                (F.col("sv") / n) * (F.col("sv") / n), 9
            ).cast("decimal(18,9)")
        ).alias("mu2"),
        (F.sum("svv").cast("double") / n).alias("ex2"),
    )
    mu2d = F.col("mu2").cast("double")
    return agg.select(
        F.lit(n).cast("long").alias("n_vectors"),
        F.floor(mu2d * 1000000 + 0.5).cast("long").alias("mean_norm2_e6"),
        F.floor(F.col("ex2") * 1000000 + 0.5)
        .cast("long")
        .alias("avg_norm2_e6"),
        F.floor((1.0 - mu2d / F.col("ex2")) * 1000000 + 0.5)
        .cast("long")
        .alias("isotropy_e6"),
    )


@query(
    "calendar_weekend_effect",
    oracle="""
        WITH o AS (
            SELECT c.c_mktsegment AS seg,
                   CASE WHEN dayofweek(o.o_orderdate) IN (0, 6)
                        THEN 1 ELSE 0 END AS wknd,
                   CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)
                       AS cents
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        ),
        s AS (
            SELECT seg, wknd, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(cents) AS BIGINT) AS sx,
                   sum(CAST(cents AS DECIMAL(38,0)) * cents) AS sxx
            FROM o GROUP BY 1, 2
        ),
        wide AS (
            SELECT a.seg,
                   a.n AS n_wk, b.n AS n_we,
                   CAST(a.sx AS DOUBLE) / a.n AS m_wk,
                   CAST(b.sx AS DOUBLE) / b.n AS m_we,
                   (a.n * CAST(a.sxx AS DOUBLE)
                    - CAST(a.sx AS DOUBLE) * a.sx)
                   / (a.n * (a.n - 1.0)) AS v_wk,
                   (b.n * CAST(b.sxx AS DOUBLE)
                    - CAST(b.sx AS DOUBLE) * b.sx)
                   / (b.n * (b.n - 1.0)) AS v_we
            FROM (SELECT * FROM s WHERE wknd = 0) a
            JOIN (SELECT * FROM s WHERE wknd = 1) b ON a.seg = b.seg
        )
        SELECT seg, n_wk AS n_weekday, n_we AS n_weekend,
               CAST(floor((m_we - m_wk) * 1 + 0.5) AS BIGINT)
                   AS uplift_cents,
               CAST(floor((m_we - m_wk)
                    / sqrt(v_wk / n_wk + v_we / n_we) * 10000 + 0.5)
                    AS BIGINT) AS welch_z_e4
        FROM wide
    """,
)
def calendar_weekend_effect(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Weekend effect on order value per segment: weekend-vs-weekday
    mean difference with a Welch z — the calendar covariate check run
    BEFORE time-based experiment splits or forecasts (a real weekend
    effect biases any split that doesn't stratify by day type; a null
    one licenses simpler models). Means and variances from exact
    integer/DECIMAL moments; the uplift in whole cents and z in 1e-4.

    Scale: broadcast dimension join + one (segment, daytype) moment
    aggregate — constant state, |segments| rows.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    rows = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("seg"),
        F.when(F.dayofweek("o_orderdate").isin(1, 7), 1)
        .otherwise(0)
        .alias("wknd"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias(
            "cents"
        ),
    )
    s = rows.groupBy("seg", "wknd").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cents").cast("long").alias("sx"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents")).alias(
            "sxx"
        ),
    )
    a = s.filter(F.col("wknd") == 0).select(
        "seg",
        F.col("n").alias("n_wk"),
        F.col("sx").alias("sx_wk"),
        F.col("sxx").alias("sxx_wk"),
    )
    b = s.filter(F.col("wknd") == 1).select(
        "seg",
        F.col("n").alias("n_we"),
        F.col("sx").alias("sx_we"),
        F.col("sxx").alias("sxx_we"),
    )
    w = a.join(b, "seg")
    m_wk = F.col("sx_wk").cast("double") / F.col("n_wk")
    m_we = F.col("sx_we").cast("double") / F.col("n_we")
    v_wk = (
        F.col("n_wk") * F.col("sxx_wk").cast("double")
        - F.col("sx_wk").cast("double") * F.col("sx_wk")
    ) / (F.col("n_wk") * (F.col("n_wk").cast("double") - 1.0))
    v_we = (
        F.col("n_we") * F.col("sxx_we").cast("double")
        - F.col("sx_we").cast("double") * F.col("sx_we")
    ) / (F.col("n_we") * (F.col("n_we").cast("double") - 1.0))
    return w.select(
        "seg",
        F.col("n_wk").alias("n_weekday"),
        F.col("n_we").alias("n_weekend"),
        F.floor((m_we - m_wk) * 1 + 0.5).cast("long").alias(
            "uplift_cents"
        ),
        F.floor(
            (m_we - m_wk)
            / F.sqrt(v_wk / F.col("n_wk") + v_we / F.col("n_we"))
            * 10000
            + 0.5
        )
        .cast("long")
        .alias("welch_z_e4"),
    )


MIGRATION_SPLIT_DATE = "1995-07-01"  # H1 = before, H2 = from


def _activity_band_sql(col: str) -> str:
    return (
        f"CASE WHEN {col} = 0 THEN 'inactive' "
        f"WHEN {col} <= 2 THEN 'light' ELSE 'heavy' END"
    )


@query(
    "customer_activity_migration_matrix",
    oracle=f"""
        WITH per AS (
            SELECT c.c_custkey,
                   CAST(sum(CASE WHEN o.o_orderdate
                            < DATE '{MIGRATION_SPLIT_DATE}'
                       THEN 1 ELSE 0 END) AS BIGINT) AS h1,
                   CAST(sum(CASE WHEN o.o_orderdate
                            >= DATE '{MIGRATION_SPLIT_DATE}'
                       THEN 1 ELSE 0 END) AS BIGINT) AS h2
            FROM customer c
            LEFT JOIN orders o ON o.o_custkey = c.c_custkey
            GROUP BY 1
        ),
        banded AS (
            SELECT {_activity_band_sql('h1')} AS band_h1,
                   {_activity_band_sql('h2')} AS band_h2
            FROM per
        ),
        cells AS (
            SELECT band_h1, band_h2, CAST(count(*) AS BIGINT) AS n
            FROM banded GROUP BY 1, 2
        ),
        rows_t AS (
            SELECT band_h1, CAST(sum(n) AS BIGINT) AS row_n
            FROM cells GROUP BY 1
        )
        SELECT c.band_h1, c.band_h2, c.n,
               c.n * 10000 // r.row_n AS row_share_bp
        FROM cells c JOIN rows_t r ON c.band_h1 = r.band_h1
    """,
)
def customer_activity_migration_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Activity-band MIGRATION matrix: each customer's order-count
    band (inactive / light / heavy) in the first half of the horizon
    vs the second — the transition view behind retention strategy
    (the heavy→inactive cell is the churn to chase; inactive→heavy is
    acquisition quality). LEFT join keeps never-ordering customers in
    the inactive row. Row-shares in exact integer bp; all counting.

    Scale: one broadcast-dim LEFT join + per-customer counting + a
    3×3 matrix aggregate.
    """
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate"
    )
    per = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.sum(
                F.when(
                    F.col("o_orderdate") < MIGRATION_SPLIT_DATE, 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("h1"),
            F.sum(
                F.when(
                    F.col("o_orderdate") >= MIGRATION_SPLIT_DATE, 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("h2"),
        )
    )

    def band(col: str):
        return (
            F.when(F.col(col) == 0, "inactive")
            .when(F.col(col) <= 2, "light")
            .otherwise("heavy")
        )

    cells = per.select(
        band("h1").alias("band_h1"), band("h2").alias("band_h2")
    ).groupBy("band_h1", "band_h2").agg(
        F.count("*").cast("long").alias("n")
    )
    from ..functions.caching import scoped_persist

    cells = scoped_persist(cells)
    rows_t = cells.groupBy("band_h1").agg(
        F.sum("n").cast("long").alias("row_n")
    )
    return cells.join(F.broadcast(rows_t), "band_h1").select(
        "band_h1",
        "band_h2",
        "n",
        F.expr("n * 10000 div row_n").alias("row_share_bp"),
    )


@query(
    "supply_risk_single_source",
    oracle="""
        WITH ps AS (
            SELECT l_partkey, count(DISTINCT l_suppkey) AS n_supp
            FROM lineitem GROUP BY 1
        ),
        b AS (
            SELECT p.p_brand,
                   CAST(count(*) AS BIGINT) AS n_parts,
                   CAST(sum(CASE WHEN ps.n_supp = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_single
            FROM ps JOIN part p ON ps.l_partkey = p.p_partkey
            GROUP BY 1
        )
        SELECT p_brand, n_parts, n_single,
               n_single * 10000 // n_parts AS single_source_bp
        FROM b
    """,
)
def supply_risk_single_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Single-source supply risk per brand: the share of parts whose
    OBSERVED order history runs through exactly one supplier — the
    procurement-risk number (one supplier outage stalls every
    single-sourced part; dual-sourcing targets start from this
    table). Distinct-supplier counting per part, integer bp rollup.

    Scale: one partial-distinct keyed aggregate over lineitem + a
    broadcast part-dimension join; |brands| rows.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ps = li.groupBy("l_partkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp")
    )
    b = (
        ps.join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").cast("long").alias("n_parts"),
            F.sum(F.when(F.col("n_supp") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_single"),
        )
    )
    return b.select(
        "p_brand",
        "n_parts",
        "n_single",
        F.expr("n_single * 10000 div n_parts").alias("single_source_bp"),
    )


@query(
    "orders_line_count_dispersion",
    oracle="""
        WITH lc AS (
            SELECT l_orderkey, CAST(count(*) AS BIGINT) AS k
            FROM lineitem GROUP BY 1
        ),
        mom AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(k) AS BIGINT) AS s,
                   CAST(sum(k * k) AS BIGINT) AS ss
            FROM lc
        )
        SELECT n AS n_orders,
               CAST(floor(CAST(s AS DOUBLE) / n * 10000 + 0.5)
                    AS BIGINT) AS mean_lines_e4,
               CAST(floor(((n * CAST(ss AS DOUBLE)
                    - CAST(s AS DOUBLE) * s) / (n * (n - 1.0)))
                    / (CAST(s AS DOUBLE) / n) * 1000000 + 0.5)
                    AS BIGINT) AS dispersion_e6,
               CAST(floor(((n * CAST(ss AS DOUBLE)
                    - CAST(s AS DOUBLE) * s) / (n * (n - 1.0)))
                    / (CAST(s AS DOUBLE) / n) * 1000000 + 0.5)
                    AS BIGINT)
                   > 1000000 + CAST(floor(2.0 * sqrt(2.0 / (n - 1.0))
                                    * 1000000 + 0.5) AS BIGINT)
                   AS overdispersed
        FROM mom
    """,
)
def orders_line_count_dispersion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Dispersion diagnostic for lines-per-order: the variance-to-mean
    ratio (index of dispersion) against the Poisson reference of 1,
    flagged when it exceeds 1 + 2√(2/(n−1)) (two sigmas of the index
    under Poisson) — the count-model check run before any capacity or
    packing model ASSUMES Poisson order sizes (overdispersion means
    bursty baskets and heavier tail planning). Exact integer moments;
    one identical double expression; the flag compares post-floor
    integers.

    Scale: per-order counting + a constant-state moment aggregate.
    """
    li = load_table(spark, sf_dir, "lineitem")
    lc = li.groupBy("l_orderkey").agg(F.count("*").cast("long").alias("k"))
    mom = lc.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("k").cast("long").alias("s"),
        F.sum(F.col("k") * F.col("k")).cast("long").alias("ss"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("s").cast("double") / F.col("n")
    var = (
        F.col("n") * F.col("ss").cast("double")
        - F.col("s").cast("double") * F.col("s")
    ) / (F.col("n") * (nd - 1.0))
    disp = F.floor(var / mean * 1000000 + 0.5).cast("long")
    bar = F.lit(1000000) + F.floor(
        2.0 * F.sqrt(2.0 / (nd - 1.0)) * 1000000 + 0.5
    ).cast("long")
    return mom.select(
        F.col("n").alias("n_orders"),
        F.floor(mean * 10000 + 0.5).cast("long").alias("mean_lines_e4"),
        disp.alias("dispersion_e6"),
        (disp > bar).alias("overdispersed"),
    )


@query(
    "activation_time_to_first_purchase",
    oracle="""
        WITH f AS (
            SELECT user_id,
                   CAST(floor(epoch(min(ts))) AS BIGINT) AS first_any,
                   CAST(floor(epoch(min(CASE WHEN event_type = 'purchase'
                        THEN ts END))) AS BIGINT) AS first_buy
            FROM events GROUP BY 1
        )
        SELECT count(*) AS n_users,
               CAST(sum(CASE WHEN first_buy IS NOT NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_activated,
               CAST(sum(CASE WHEN first_buy - first_any <= 3600
                    THEN 1 ELSE 0 END) AS BIGINT) * 10000 // count(*)
                   AS within_1h_bp,
               CAST(sum(CASE WHEN first_buy - first_any <= 86400
                    THEN 1 ELSE 0 END) AS BIGINT) * 10000 // count(*)
                   AS within_1d_bp,
               CAST(sum(CASE WHEN first_buy - first_any <= 604800
                    THEN 1 ELSE 0 END) AS BIGINT) * 10000 // count(*)
                   AS within_7d_bp
        FROM f
    """,
)
def activation_time_to_first_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Activation funnel timing: share of users whose FIRST purchase
    lands within 1 h / 1 day / 7 days of their first event — the
    activation metric every growth team tracks, in the SLA-share form
    (fixed time bars, integer counting — never a latency percentile,
    the cross-engine interpolation trap). Never-activated users count
    in the denominator (NULL lag fails every bar), so the shares are
    honest activation rates, not conditional ones.

    Scale: one per-user min aggregate (two mins, one conditional) +
    a constant-state rollup.
    """
    ev = load_table(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(
        F.min(F.unix_timestamp("ts")).cast("long").alias("first_any"),
        F.min(
            F.when(
                F.col("event_type") == "purchase",
                F.unix_timestamp("ts"),
            )
        )
        .cast("long")
        .alias("first_buy"),
    )
    lag = F.col("first_buy") - F.col("first_any")

    def within(sec: int):
        return F.expr(
            f"CAST(sum(CASE WHEN first_buy - first_any <= {sec}"
            " THEN 1 ELSE 0 END) AS BIGINT) * 10000 div count(*)"
        )

    return f.agg(
        F.count("*").alias("n_users"),
        F.sum(F.when(F.col("first_buy").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_activated"),
        within(3600).alias("within_1h_bp"),
        within(86400).alias("within_1d_bp"),
        within(604800).alias("within_7d_bp"),
    )


@query(
    "event_type_pmi_pairs",
    oracle="""
        WITH jd AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS d, event_type
            FROM events
        ),
        nn AS (
            SELECT CAST(count(DISTINCT (user_id, d)) AS BIGINT) AS n
            FROM jd
        ),
        singles AS (
            SELECT event_type, CAST(count(*) AS BIGINT) AS c
            FROM jd GROUP BY 1
        ),
        pairs AS (
            SELECT a.event_type AS t_a, b.event_type AS t_b,
                   CAST(count(*) AS BIGINT) AS c_ab
            FROM jd a JOIN jd b
              ON a.user_id = b.user_id AND a.d = b.d
             AND a.event_type < b.event_type
            GROUP BY 1, 2
        )
        SELECT p.t_a, p.t_b, p.c_ab,
               CAST(floor(ln((CAST(p.c_ab AS DOUBLE) * nn.n)
                    / (CAST(sa.c AS DOUBLE) * sb.c)) * 1000000 + 0.5)
                    AS BIGINT) AS pmi_e6,
               CAST(p.c_ab AS DOUBLE) * nn.n
                   > CAST(sa.c AS DOUBLE) * sb.c AS associated
        FROM pairs p
        JOIN singles sa ON p.t_a = sa.event_type
        JOIN singles sb ON p.t_b = sb.event_type
        CROSS JOIN nn
    """,
)
def event_type_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information between event-type pairs within a
    user-day: PMI = ln(P(a,b)/(P(a)·P(b))) over user-day incidence —
    the CO-OCCURRENCE association view that complements the Markov
    SEQUENCE view (PMI sees "these happen together in a day"; the
    transition matrix sees "this follows that"). The `associated`
    flag is the exact integer cross-multiplication c_ab·n > c_a·c_b
    (no float in the verdict); PMI itself ships in 1e-6 from exact
    counts through one identical double expression.

    Scale: user-day incidence dedup + a self-join bounded by ≤5 types
    per user-day; the pair table is |types|² rows.
    """
    ev = load_table(spark, sf_dir, "events")
    jd = ev.select(
        "user_id", F.col("ts").cast("date").alias("d"), "event_type"
    ).distinct()
    from ..functions.caching import scoped_persist

    jd = scoped_persist(jd)
    n = jd.select("user_id", "d").distinct().count()
    singles = jd.groupBy("event_type").agg(
        F.count("*").cast("long").alias("c")
    )
    a, b = jd.alias("a"), jd.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.d") == F.col("b.d"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("t_a"),
            F.col("b.event_type").alias("t_b"),
        )
        .agg(F.count("*").cast("long").alias("c_ab"))
    )
    sa = singles.withColumnRenamed("event_type", "t_a").withColumnRenamed(
        "c", "c_a"
    )
    sb = singles.withColumnRenamed("event_type", "t_b").withColumnRenamed(
        "c", "c_b"
    )
    out = pairs.join(F.broadcast(sa), "t_a").join(F.broadcast(sb), "t_b")
    num = F.col("c_ab").cast("double") * n
    den = F.col("c_a").cast("double") * F.col("c_b")
    return out.select(
        "t_a",
        "t_b",
        "c_ab",
        F.floor(F.log(num / den) * 1000000 + 0.5)
        .cast("long")
        .alias("pmi_e6"),
        (num > den).alias("associated"),
    )


PAD_BUCKET_TOKENS = 32  # bucketed-padding granularity


@query(
    "packing_padding_waste_eval",
    oracle=f"""
        WITH lens AS (
            SELECT len(list_filter(string_split(text, ' '),
                                   w -> w <> '')) AS n
            FROM documents
        ),
        g AS (
            SELECT CAST(count(*) AS BIGINT) AS docs,
                   CAST(sum(n) AS BIGINT) AS toks,
                   CAST(max(n) AS BIGINT) AS mx
            FROM lens
        ),
        bucketed AS (
            SELECT n, ((n + {PAD_BUCKET_TOKENS} - 1)
                       // {PAD_BUCKET_TOKENS}) * {PAD_BUCKET_TOKENS}
                       AS pad_to
            FROM lens
        ),
        b AS (
            SELECT CAST(sum(pad_to - n) AS BIGINT) AS bucket_waste,
                   CAST(sum(pad_to) AS BIGINT) AS bucket_padded
            FROM bucketed
        )
        SELECT g.docs, g.toks,
               (g.docs * g.mx - g.toks) * 10000 // (g.docs * g.mx)
                   AS global_pad_waste_bp,
               b.bucket_waste * 10000 // b.bucket_padded
                   AS bucket_pad_waste_bp
        FROM g, b
    """,
)
def packing_padding_waste_eval(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Padding-waste comparison for batched training/inference: pad
    every sequence to the GLOBAL max vs pad within
    {PAD_BUCKET_TOKENS}-token LENGTH BUCKETS — the token-waste numbers
    (in exact bp of padded volume) that justify length-bucketed
    batching before the fancier packing (`pack_concat_chunks`
    eliminates padding entirely but breaks example boundaries; this
    quantifies the middle option serving stacks actually use).

    All integer: lengths, ceil-to-bucket via integer arithmetic,
    waste ratios by floor division.

    Scale: row-local length computation + two constant-state
    aggregates.
    """
    docs = load_table(spark, sf_dir, "documents")
    n = F.size(
        F.filter(F.split(F.col("text"), " "), lambda w: w != "")
    ).alias("n")
    lens = docs.select(n)
    from ..functions.caching import scoped_persist

    lens = scoped_persist(lens)
    bucketed = lens.select(
        "n",
        (
            F.expr(
                f"((n + {PAD_BUCKET_TOKENS - 1})"
                f" div {PAD_BUCKET_TOKENS}) * {PAD_BUCKET_TOKENS}"
            )
        ).alias("pad_to"),
    )
    g = lens.agg(
        F.count("*").cast("long").alias("docs"),
        F.sum("n").cast("long").alias("toks"),
        F.max("n").cast("long").alias("mx"),
    )
    b = bucketed.agg(
        F.sum(F.col("pad_to") - F.col("n")).cast("long").alias(
            "bucket_waste"
        ),
        F.sum("pad_to").cast("long").alias("bucket_padded"),
    )
    return g.crossJoin(F.broadcast(b)).select(
        "docs",
        "toks",
        F.expr(
            "(docs * mx - toks) * 10000 div (docs * mx)"
        ).alias("global_pad_waste_bp"),
        F.expr(
            "bucket_waste * 10000 div bucket_padded"
        ).alias("bucket_pad_waste_bp"),
    )


@query(
    "survival_log_rank_test",
    oracle=f"""
        WITH span AS (
            SELECT user_id,
                   min(CAST(ts AS DATE)) AS first_day,
                   max(CAST(ts AS DATE)) AS last_day
            FROM events GROUP BY user_id
        ),
        horizon AS (SELECT max(last_day) AS h FROM span),
        durations AS (
            SELECT CASE WHEN {hash64_sql(
                       "'exp1|' || CAST(user_id AS VARCHAR)"
                   )} % 2 = 0 THEN 0 ELSE 1 END AS arm,
                   date_diff('day', first_day, last_day) AS t,
                   CASE WHEN last_day <= h - {KM_CENSOR_GAP} THEN 1
                        ELSE 0 END AS churned
            FROM span, horizon
        ),
        per_t AS (
            SELECT arm, t, CAST(sum(churned) AS BIGINT) AS d,
                   CAST(count(*) AS BIGINT) AS removed
            FROM durations GROUP BY arm, t
        ),
        risk AS (
            SELECT arm, t, d,
                   sum(removed) OVER (PARTITION BY arm)
                   - coalesce(sum(removed) OVER (
                         PARTITION BY arm ORDER BY t
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING), 0) AS n_at
            FROM per_t
        ),
        tt AS (
            SELECT t,
                   CAST(sum(CASE WHEN arm = 1 THEN d ELSE 0 END)
                        AS BIGINT) AS d1,
                   CAST(sum(d) AS BIGINT) AS dt,
                   CAST(sum(CASE WHEN arm = 1 THEN n_at ELSE 0 END)
                        AS BIGINT) AS n1,
                   CAST(sum(n_at) AS BIGINT) AS nt
            FROM risk GROUP BY t
        ),
        terms AS (
            SELECT CAST(round(d1 - CAST(n1 AS DOUBLE) * dt / nt, 9)
                        AS DECIMAL(18,9)) AS oe,
                   CAST(round(CASE WHEN nt > 1 THEN
                       (CAST(dt AS DOUBLE) * (CAST(n1 AS DOUBLE) / nt)
                        * (1.0 - CAST(n1 AS DOUBLE) / nt)
                        * (nt - dt)) / (nt - 1.0)
                       ELSE 0.0 END, 9) AS DECIMAL(18,9)) AS v
            FROM tt WHERE dt > 0
        )
        SELECT count(*) AS n_event_times,
               CAST(floor(CAST(sum(oe) AS DOUBLE) * 10000 + 0.5)
                    AS BIGINT) AS o_minus_e_e4,
               CAST(floor(CAST(sum(oe) AS DOUBLE)
                    / sqrt(CAST(sum(v) AS DOUBLE)) * 10000 + 0.5)
                    AS BIGINT) AS log_rank_z_e4
        FROM terms
    """,
)
def survival_log_rank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test between the two experiment arms' retention
    curves — the SIGNIFICANCE companion to
    `survival_kaplan_meier_retention` (the curves show the shapes;
    log-rank says whether they differ beyond chance, correctly
    weighting every event time by its risk set and respecting
    censoring — the thing a naive end-point churn-rate comparison
    gets wrong). Z = Σ(O₁−E₁)/√ΣV with the hypergeometric variance
    per event time; the O−E and V terms are round9+DECIMAL-summed
    from exact integer risk-set counts.

    Scale: risk sets come from per-arm cumulative windows over the
    TIME-bounded duration rollup (the KM machinery); the test is a
    constant-size reduction over event times.
    """
    from ..functions.hashing import hash64

    ev = load_table(spark, sf_dir, "events")
    span = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("first_day"),
        F.max(F.col("ts").cast("date")).alias("last_day"),
    )
    h = span.agg(F.max("last_day")).first()[0]
    durations = span.select(
        (
            hash64(
                F.concat(F.lit("exp1|"), F.col("user_id").cast("string"))
            )
            % 2
        ).alias("arm"),
        F.datediff("last_day", "first_day").alias("t"),
        F.when(
            F.col("last_day") <= F.date_sub(F.lit(h), KM_CENSOR_GAP), 1
        )
        .otherwise(0)
        .alias("churned"),
    )
    per_t = durations.groupBy("arm", "t").agg(
        F.sum("churned").cast("long").alias("d"),
        F.count("*").cast("long").alias("removed"),
    )
    from pyspark.sql.window import Window as _W

    warm = _W.partitionBy("arm")
    wcum = warm.orderBy("t").rowsBetween(_W.unboundedPreceding, -1)
    risk = per_t.select(
        "arm",
        "t",
        "d",
        (
            F.sum("removed").over(warm)
            - F.coalesce(F.sum("removed").over(wcum), F.lit(0))
        ).alias("n_at"),
    )
    tt = risk.groupBy("t").agg(
        F.sum(F.when(F.col("arm") == 1, F.col("d")).otherwise(0))
        .cast("long")
        .alias("d1"),
        F.sum("d").cast("long").alias("dt"),
        F.sum(F.when(F.col("arm") == 1, F.col("n_at")).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.sum("n_at").cast("long").alias("nt"),
    )
    n1d = F.col("n1").cast("double")
    ntd = F.col("nt").cast("double")
    dtd = F.col("dt").cast("double")
    oe = F.round(F.col("d1") - n1d * F.col("dt") / F.col("nt"), 9).cast(
        "decimal(18,9)"
    )
    v = F.round(
        F.when(
            F.col("nt") > 1,
            (dtd * (n1d / ntd) * (1.0 - n1d / ntd) * (F.col("nt") - F.col("dt")))
            / (ntd - 1.0),
        ).otherwise(0.0),
        9,
    ).cast("decimal(18,9)")
    terms = tt.filter(F.col("dt") > 0).select(
        oe.alias("oe"), v.alias("v")
    )
    return terms.agg(
        F.count("*").alias("n_event_times"),
        F.floor(F.sum("oe").cast("double") * 10000 + 0.5)
        .cast("long")
        .alias("o_minus_e_e4"),
        F.floor(
            F.sum("oe").cast("double")
            / F.sqrt(F.sum("v").cast("double"))
            * 10000
            + 0.5
        )
        .cast("long")
        .alias("log_rank_z_e4"),
    )


W1_PRI_A = "1-URGENT"
W1_PRI_B = "5-LOW"
W1_BAND = 100000  # cents div 1e5: static monotone price bands


@query(
    "stats_wasserstein_distance",
    oracle=f"""
        WITH r AS (
            SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                       AS cents,
                   CASE WHEN o_orderpriority = '{W1_PRI_A}' THEN 1
                        ELSE 0 END AS ga
            FROM orders
            WHERE o_orderpriority IN ('{W1_PRI_A}', '{W1_PRI_B}')
        ),
        d AS (
            SELECT cents, CAST(count(*) AS BIGINT) AS n_v,
                   CAST(sum(ga) AS BIGINT) AS na_v
            FROM r GROUP BY 1
        ),
        tot AS (
            SELECT CAST(sum(na_v) AS BIGINT) AS na,
                   CAST(sum(n_v) - sum(na_v) AS BIGINT) AS nb
            FROM d
        ),
        c AS (
            SELECT cents,
                   sum(na_v) OVER w AS cum_a,
                   sum(n_v - na_v) OVER w AS cum_b,
                   lead(cents) OVER (ORDER BY cents) AS lead_c
            FROM d
            WINDOW w AS (ORDER BY cents
                         ROWS UNBOUNDED PRECEDING)
        ),
        s AS (
            SELECT sum(
                       abs(CAST(cum_a AS DECIMAL(38,0)) * tot.nb
                           - CAST(cum_b AS DECIMAL(38,0)) * tot.na)
                       * (coalesce(lead_c, cents) - cents)
                   ) AS sd
            FROM c, tot
        )
        SELECT tot.na AS n_a, tot.nb AS n_b,
               CAST(floor(CAST(s.sd AS DOUBLE) * 100.0
                          / (CAST(tot.na AS DOUBLE) * tot.nb) + 0.5)
                    AS BIGINT) AS w1_centicents
        FROM s, tot
    """,
)
def stats_wasserstein_distance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact Wasserstein-1 (earth-mover) distance between the order-value
    distributions of urgent vs low-priority orders — distribution drift
    in ACTUAL UNITS (centi-cents of price), the complement to PSI
    (binned, unitless) and KS (sup-norm, scale-free): W1 answers "how
    many dollars would it cost to reshape one distribution into the
    other", which is the number a training-mix or pricing change is
    judged by.

    W1 = ∫|F_a − F_b| dv over the union support. Exactness follows the
    nonparametric-rank recipe (stats_mann_whitney_u): everything lives
    on the VALUE DICTIONARY — per distinct cents value, group counts;
    inclusive prefix counts via the static-monotone-bucket distributed
    cumsum (never a per-row rank, never a single-partition window);
    |cum_a·n_b − cum_b·n_a| is an exact DECIMAL(38,0) cross-product;
    the gap to the next distinct value comes from a WITHIN-band lead
    plus a band→next-band-head broadcast (bands are the same bounded
    static bucketing, so the boundary fix is a bounded driver map, the
    same contract as functions/ranking's offset collect). The single
    double division at the end is computed from identical exact
    integers in both engines.

    Scale: one keyed aggregate to the dictionary, dictionary-sized
    windows partitioned by price band, two bounded driver collects
    (band offsets + band heads). The max-value row's gap is 0 by
    construction (cum_a·n_b = cum_b·n_a there), so coalescing its lead
    to itself is exact, not an approximation.
    """
    from ..functions.ranking import with_global_cumsum_static

    band = F.expr(f"cents div {W1_BAND}")
    r = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin(W1_PRI_A, W1_PRI_B))
        .select(
            F.floor(F.col("o_totalprice") * 100 + 0.5)
            .cast("long")
            .alias("cents"),
            F.when(F.col("o_orderpriority") == W1_PRI_A, 1)
            .otherwise(0)
            .alias("ga"),
        )
    )
    d = (
        r.groupBy("cents")
        .agg(
            F.count("*").cast("long").alias("n_v"),
            F.sum("ga").cast("long").alias("na_v"),
        )
        .withColumn("nb_v", F.col("n_v") - F.col("na_v"))
        .localCheckpoint()  # pin: feeds two cumsums + heads + totals
    )
    tot = d.agg(
        F.sum("na_v").cast("long").alias("na"),
        F.sum("nb_v").cast("long").alias("nb"),
    ).collect()[0]
    c = with_global_cumsum_static(d, band, ["cents"], "na_v", "cum_a")
    c = with_global_cumsum_static(c, band, ["cents"], "nb_v", "cum_b")
    wb = Window.partitionBy(band).orderBy("cents")
    c = c.withColumn("lead_c", F.lead("cents").over(wb))
    # band -> head (min cents) of the NEXT non-empty band: bounded
    # driver map (bands are the static bucketing's bounded key space)
    heads = sorted(
        (row.bk, row.h)
        for row in d.groupBy(band.alias("bk"))
        .agg(F.min("cents").alias("h"))
        .collect()
    )
    nexts = [
        (bk, heads[i + 1][1])
        for i, (bk, _) in enumerate(heads[:-1])
    ]
    if nexts:
        nh = spark.createDataFrame(nexts, "bk long, next_head long")
        c = c.join(
            F.broadcast(nh), band == F.col("bk"), "left"
        ).drop("bk")
    else:
        c = c.withColumn("next_head", F.lit(None).cast("long"))
    gap = (
        F.coalesce(F.col("lead_c"), F.col("next_head"), F.col("cents"))
        - F.col("cents")
    )
    diff = F.abs(
        F.col("cum_a").cast("decimal(38,0)") * F.lit(int(tot.nb))
        - F.col("cum_b").cast("decimal(38,0)") * F.lit(int(tot.na))
    )
    s = c.agg(F.sum(diff * gap).alias("sd"))
    return s.select(
        F.lit(int(tot.na)).alias("n_a"),
        F.lit(int(tot.nb)).alias("n_b"),
        F.floor(
            F.col("sd").cast("double")
            * 100.0
            / (float(tot.na) * float(tot.nb))
            + 0.5
        )
        .cast("long")
        .alias("w1_centicents"),
    )


HIST_BUCKETS = 10  # equi-depth bucket count (CBO-style histogram)


@query(
    "histogram_equidepth_boundaries",
    oracle=f"""
        WITH r AS (
            SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                       AS cents
            FROM orders
        ),
        d AS (SELECT cents, count(*) AS n_v FROM r GROUP BY 1),
        c AS (
            SELECT cents,
                   sum(n_v) OVER (ORDER BY cents
                                  ROWS UNBOUNDED PRECEDING) AS cum
            FROM d
        ),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM r),
        ks AS (
            SELECT unnest(generate_series(1, {HIST_BUCKETS - 1})) AS k
        ),
        bnd AS (
            SELECT k, min(cents) AS bval
            FROM ks, c, tot
            WHERE c.cum >= (k * tot.n) // {HIST_BUCKETS}
            GROUP BY k
            UNION ALL
            SELECT {HIST_BUCKETS}, max(cents) FROM d
        ),
        bc AS (
            SELECT b.k, b.bval, c.cum
            FROM bnd b JOIN c ON c.cents = b.bval
        )
        SELECT cur.k,
               CAST(cur.bval AS BIGINT) AS boundary_cents,
               CAST(cur.cum - coalesce(prev.cum, 0) AS BIGINT)
                   AS rows_in_bucket,
               CAST(abs((cur.cum - coalesce(prev.cum, 0))
                        * {HIST_BUCKETS} - tot.n) * 10000 // tot.n
                    AS BIGINT) AS depth_skew_bp
        FROM bc cur
        LEFT JOIN bc prev ON prev.k = cur.k - 1, tot
    """,
)
def histogram_equidepth_boundaries(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Equi-depth (equi-height) histogram over order value — the CBO
    statistic behind range-selectivity estimation (Spark's own ANALYZE
    ... FOR COLUMNS builds exactly this shape). Boundary k is the
    smallest ACTUAL data value whose inclusive prefix count reaches
    k·n/B — a discrete order statistic, never an interpolated quantile
    (interpolation differs between engines in the last ulp; comparisons
    against exact prefix counts cannot). depth_skew_bp audits how far
    each bucket's true depth drifts from the ideal n/B — the number
    that says whether the histogram's uniform-depth assumption (and so
    any selectivity estimate built on it) is trustworthy on this
    column; heavy single values surface as adjacent equal boundaries
    with a 10000 bp skew. Sibling: equi_depth_histogram_lineitem builds
    the same statistic by per-row distributed ntile over the fact
    table; THIS works on the value dictionary (cheaper when values
    repeat) and adds the depth-skew audit.

    Scale: the value dictionary + static-band distributed prefix sum
    (the nonparametric-rank recipe); boundary selection is a
    ≤(B−1)-row broadcast theta-join against the dictionary, and the
    bucket-depth differencing is a B-row self-join — no global sort,
    no per-row ranks, no single-partition window.
    """
    from ..functions.ranking import with_global_cumsum_static

    B = HIST_BUCKETS
    band = F.expr(f"cents div {W1_BAND}")
    r = load_table(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") * 100 + 0.5)
        .cast("long")
        .alias("cents")
    )
    d = (
        r.groupBy("cents")
        .agg(F.count("*").cast("long").alias("n_v"))
        .localCheckpoint()  # pin: feeds the cumsum helper + totals
    )
    n = int(d.agg(F.sum("n_v")).collect()[0][0])
    c = with_global_cumsum_static(d, band, ["cents"], "n_v", "cum")
    tgt = spark.createDataFrame(
        [(k, (k * n) // B) for k in range(1, B)], "k int, r_k long"
    )
    bnd = (
        c.join(F.broadcast(tgt), F.col("cum") >= F.col("r_k"))
        .groupBy("k")
        .agg(F.min("cents").alias("bval"))
        .unionByName(
            c.agg(
                F.lit(B).alias("k"), F.max("cents").alias("bval")
            )
        )
    )
    bc = bnd.join(
        c.select("cents", "cum"), bnd.bval == F.col("cents")
    ).select("k", "bval", "cum")
    prev = bc.select(
        (F.col("k") + 1).alias("k"), F.col("cum").alias("prev_cum")
    )
    rows_in = F.col("cum") - F.coalesce(F.col("prev_cum"), F.lit(0))
    return (
        bc.join(F.broadcast(prev), "k", "left")
        .select(
            "k",
            F.col("bval").cast("long").alias("boundary_cents"),
            rows_in.cast("long").alias("rows_in_bucket"),
            F.expr(
                f"CAST(abs((cum - coalesce(prev_cum, 0)) * {B} - {n}L)"
                f" * 10000 div {n}L AS BIGINT)"
            ).alias("depth_skew_bp"),
        )
    )


QINI_TILES = 10  # uplift-ranking deciles


@query(
    "uplift_qini_deciles",
    oracle=f"""
        WITH u AS (
            SELECT user_id,
                   CAST(sum(CASE WHEN event_type <> 'purchase'
                            THEN 1 ELSE 0 END) AS BIGINT) AS score,
                   CAST(max(CASE WHEN event_type = 'purchase'
                            THEN 1 ELSE 0 END) AS BIGINT) AS conv,
                   CASE WHEN {hash64_sql(
                       "'" + AB_SALT + "|' || CAST(user_id AS VARCHAR)"
                   )} % 2 = 0 THEN 0 ELSE 1 END AS arm
            FROM events GROUP BY user_id
        ),
        tiled AS (
            SELECT *, ntile({QINI_TILES}) OVER (
                       ORDER BY score DESC, user_id
                   ) AS decile
            FROM u
        ),
        per AS (
            SELECT decile,
                   CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_t,
                   CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_c,
                   CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END)
                        AS BIGINT) AS conv_t,
                   CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END)
                        AS BIGINT) AS conv_c
            FROM tiled GROUP BY decile
        ),
        cum AS (
            SELECT decile, n_t, n_c, conv_t, conv_c,
                   sum(n_t) OVER w AS cn_t, sum(n_c) OVER w AS cn_c,
                   sum(conv_t) OVER w AS cc_t,
                   sum(conv_c) OVER w AS cc_c
            FROM per
            WINDOW w AS (ORDER BY decile ROWS UNBOUNDED PRECEDING)
        )
        SELECT decile, n_t, n_c, conv_t, conv_c,
               (conv_t * n_c - conv_c * n_t) * 10000 // (n_t * n_c)
                   AS uplift_bp,
               (cc_t * cn_c - cc_c * cn_t) * 10000 // (cn_t * cn_c)
                   AS cum_uplift_bp
        FROM cum
    """,
)
def uplift_qini_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uplift-model evaluation (Qini/uplift-by-decile curve): rank users
    by a targeting score (pre-purchase activity — the feature a real
    uplift model would replace), cut into exact deciles, and report
    per-decile and CUMULATIVE treatment-vs-control conversion uplift.
    A useful targeting score shows uplift concentrating in the top
    deciles (cum_uplift_bp decreasing toward the population average);
    a useless one gives a flat curve — the causal-targeting sibling of
    the A/B family's average effects (ab_test_lift_zstat measures IF
    treatment works; this measures WHO to treat).

    Cross-engine exactness: deciles via the distributed exact ntile
    over a static monotone bucketing (the RFM machinery — score itself
    is the bucket, user_id breaks ties, bit-equal to SQL NTILE);
    uplift differences by integer cross-multiplication, never a float
    rate.

    Scale: one keyed user aggregate, one bounded-bucket ntile (no
    global sort), a 10×2 cell aggregate, and a ≤10-row broadcast
    self-join for the cumulative — nothing global, nothing driver-side
    beyond the bounded bucket offsets.
    """
    from ..functions.ranking import distributed_ntile_static

    ev = load_table(spark, sf_dir, "events")
    u = (
        ev.groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("event_type") != "purchase", 1).otherwise(0)
            )
            .cast("long")
            .alias("score"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            .cast("long")
            .alias("conv"),
        )
        .withColumn(
            "arm",
            F.when(
                hash64(
                    F.concat(
                        F.lit(AB_SALT + "|"),
                        F.col("user_id").cast("string"),
                    )
                )
                % 2
                == 0,
                0,
            ).otherwise(1),
        )
        .withColumn("neg", -F.col("score"))
        .localCheckpoint()  # pin: feeds the ntile bucket collect + agg
    )
    tiled = distributed_ntile_static(
        u, QINI_TILES, F.col("neg"), ["neg", "user_id"], "decile"
    )
    per = tiled.groupBy("decile").agg(
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_t"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_c"),
        F.sum(F.when(F.col("arm") == 1, F.col("conv")).otherwise(0))
        .cast("long")
        .alias("conv_t"),
        F.sum(F.when(F.col("arm") == 0, F.col("conv")).otherwise(0))
        .cast("long")
        .alias("conv_c"),
    )
    earlier = per.select(
        F.col("decile").alias("d2"),
        F.col("n_t").alias("e_nt"),
        F.col("n_c").alias("e_nc"),
        F.col("conv_t").alias("e_ct"),
        F.col("conv_c").alias("e_cc"),
    )
    cum = (
        per.join(F.broadcast(earlier), F.col("d2") <= F.col("decile"))
        .groupBy("decile", "n_t", "n_c", "conv_t", "conv_c")
        .agg(
            F.sum("e_nt").alias("cn_t"),
            F.sum("e_nc").alias("cn_c"),
            F.sum("e_ct").alias("cc_t"),
            F.sum("e_cc").alias("cc_c"),
        )
    )
    return cum.select(
        "decile",
        "n_t",
        "n_c",
        "conv_t",
        "conv_c",
        F.expr(
            "(conv_t * n_c - conv_c * n_t) * 10000 div (n_t * n_c)"
        ).alias("uplift_bp"),
        F.expr(
            "(cc_t * cn_c - cc_c * cn_t) * 10000 div (cn_t * cn_c)"
        ).alias("cum_uplift_bp"),
    )


SEQ_BOUND_E4 = 28000  # |z| >= 2.8: Pocock-style constant for many looks

# shared Welch-z-from-cumulative-moments text (identical in both
# engines; inputs are exact integers/decimals cast to DOUBLE here)
_SEQ_Z_SQL = (
    "CAST(floor("
    " (CAST(st AS DOUBLE)/nt - CAST(sc AS DOUBLE)/nc)"
    " / sqrt("
    "   (CAST(qt AS DOUBLE) - CAST(st AS DOUBLE)*st/nt) / (nt-1) / nt"
    " + (CAST(qc AS DOUBLE) - CAST(sc AS DOUBLE)*sc/nc) / (nc-1) / nc)"
    " * 10000 + 0.5) AS BIGINT)"
)


@query(
    "ab_sequential_monitoring",
    oracle=f"""
        WITH assigned AS (
            SELECT CAST(ts AS DATE) AS day,
                   CASE WHEN {hash64_sql(
                       "'" + AB_SALT + "|' || CAST(user_id AS VARCHAR)"
                   )} % 2 = 0 THEN 0 ELSE 1 END AS arm,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
            FROM events
            WHERE event_type = 'purchase' AND value IS NOT NULL
        ),
        daily AS (
            SELECT day, arm,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(cents) AS DECIMAL(38,0)) AS s,
                   CAST(sum(CAST(cents AS DECIMAL(38,0)) * cents)
                        AS DECIMAL(38,0)) AS q
            FROM assigned GROUP BY 1, 2
        ),
        cum AS (
            SELECT day, arm,
                   sum(n) OVER w AS cn, sum(s) OVER w AS cs,
                   sum(q) OVER w AS cq
            FROM daily
            WINDOW w AS (PARTITION BY arm ORDER BY day
                         ROWS UNBOUNDED PRECEDING)
        ),
        wide AS (
            SELECT t.day, t.cn AS nt, t.cs AS st, t.cq AS qt,
                   c.cn AS nc, c.cs AS sc, c.cq AS qc
            FROM (SELECT * FROM cum WHERE arm = 1) t
            JOIN (SELECT * FROM cum WHERE arm = 0) c USING (day)
            WHERE t.cn > 1 AND c.cn > 1
        ),
        scored AS (
            SELECT day, CAST(nt AS BIGINT) AS cum_n_t,
                   CAST(nc AS BIGINT) AS cum_n_c,
                   {_SEQ_Z_SQL} AS z_e4
            FROM wide
        )
        SELECT day, cum_n_t, cum_n_c, z_e4,
               CAST(CASE WHEN abs(z_e4) >= {SEQ_BOUND_E4}
                    THEN 1 ELSE 0 END AS INTEGER) AS crossed
        FROM scored
    """,
)
def ab_sequential_monitoring(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sequential (group-sequential) A/B monitoring: the cumulative
    Welch z after EVERY day of the experiment against a Pocock-style
    ±2.8 boundary — the always-peeking companion to the fixed-horizon
    family (ab_test_lift_zstat reads the experiment once at the end;
    real dashboards peek daily, and naive repeated 1.96 testing
    inflates false positives ~5×; the widened constant boundary is the
    standard correction). Emits the full monitoring trace: a reader
    sees exactly when (if ever) the experiment could have stopped.

    Exactness: daily moments are exact integers/DECIMAL(38,0) (cents,
    cents²); cumulative prefixes are windows PARTITIONED BY ARM over
    the calendar (keyed, bounded); the single z formula evaluates one
    shared text on identical exact inputs in both engines, emitted as
    an e4 integer. Boundary crossing is an integer compare of that.

    Scale: one keyed daily aggregate (map-side partial), |days|-row
    state thereafter. The 100 TB cost is the purchase scan, full stop.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    )
    assigned = ev.select(
        F.col("ts").cast("date").alias("day"),
        F.when(
            hash64(
                F.concat(
                    F.lit(AB_SALT + "|"), F.col("user_id").cast("string")
                )
            )
            % 2
            == 0,
            0,
        )
        .otherwise(1)
        .alias("arm"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    daily = assigned.groupBy("day", "arm").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("s"),
        F.sum(
            F.col("cents").cast("decimal(38,0)") * F.col("cents")
        ).alias("q"),
    )
    w = (
        Window.partitionBy("arm")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = daily.select(
        "day",
        "arm",
        F.sum("n").over(w).alias("cn"),
        F.sum("s").over(w).alias("cs"),
        F.sum("q").over(w).alias("cq"),
    )
    t = cum.filter(F.col("arm") == 1).select(
        "day",
        F.col("cn").alias("nt"),
        F.col("cs").alias("st"),
        F.col("cq").alias("qt"),
    )
    c = cum.filter(F.col("arm") == 0).select(
        "day",
        F.col("cn").alias("nc"),
        F.col("cs").alias("sc"),
        F.col("cq").alias("qc"),
    )
    wide = t.join(c, "day").filter(
        (F.col("nt") > 1) & (F.col("nc") > 1)
    )
    scored = wide.select(
        "day",
        F.col("nt").cast("long").alias("cum_n_t"),
        F.col("nc").cast("long").alias("cum_n_c"),
        F.expr(_SEQ_Z_SQL).alias("z_e4"),
    )
    return scored.select(
        "day",
        "cum_n_t",
        "cum_n_c",
        "z_e4",
        F.when(F.abs(F.col("z_e4")) >= SEQ_BOUND_E4, 1)
        .otherwise(0)
        .cast("int")
        .alias("crossed"),
    )


HW_ALPHA = "0.4"  # level gain
HW_BETA = "0.1"  # trend gain
HW_GAMMA = "0.2"  # seasonal gain
HW_M = 7  # weekly season on the daily grain


def _hw_oracle() -> str:
    A, B, G = (f"{c}::DOUBLE" for c in (HW_ALPHA, HW_BETA, HW_GAMMA))
    y7 = " + ".join(
        f"max(CASE WHEN rn = {i} THEN y END)" for i in range(1, HW_M + 1)
    )
    s_init = ", ".join(
        f"max(CASE WHEN rn = {i} THEN y END) - ({y7}) / 7.0::DOUBLE"
        for i in range(1, HW_M + 1)
    )
    scols = ", ".join(f"s{i}" for i in range(HW_M))
    lvl = f"{A} * (i.y - r.s0) + (1.0::DOUBLE - {A}) * (r.l + r.b)"
    step_s = ", ".join(f"r.s{i}" for i in range(1, HW_M))
    return f"""
        WITH RECURSIVE daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
            FROM events GROUP BY 1, 2
        ),
        idx AS (
            SELECT event_type,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY day) AS rn,
                   CAST(n AS DOUBLE) AS y
            FROM daily
        ),
        mx AS (
            SELECT event_type, max(rn) AS m FROM idx GROUP BY 1
            HAVING max(rn) >= {2 * HW_M + 1}
        ),
        rec(event_type, rn, l, b, {scols}) AS (
            SELECT event_type, {HW_M},
                   ({y7}) / 7.0::DOUBLE, CAST(0 AS DOUBLE),
                   {s_init}
            FROM idx WHERE rn <= {HW_M} GROUP BY event_type
            UNION ALL
            SELECT i.event_type, r.rn + 1,
                   {lvl},
                   {B} * (({lvl}) - r.l) + (1.0::DOUBLE - {B}) * r.b,
                   {step_s},
                   {G} * (i.y - ({lvl})) + (1.0::DOUBLE - {G}) * r.s0
            FROM rec r
            JOIN idx i ON i.event_type = r.event_type
                      AND i.rn = r.rn + 1
        )
        SELECT r.event_type, CAST(mx.m AS BIGINT) AS n_days,
               CAST(floor(r.l * 1000000 + 0.5) AS BIGINT) AS level_e6,
               CAST(floor(r.b * 1000000 + 0.5) AS BIGINT) AS trend_e6,
               CAST(floor((r.l + r.b + r.s0) * 1000000 + 0.5) AS BIGINT)
                   AS forecast_next_e6
        FROM rec r JOIN mx ON r.event_type = mx.event_type
                          AND r.rn = mx.m
    """


@query("forecast_holt_winters_weekly", oracle=_hw_oracle())
def forecast_holt_winters_weekly(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Holt-Winters ADDITIVE seasonal smoothing (weekly season, daily
    grain) per event type — the top rung of the forecasting ladder
    (EWMA: level; Holt: +trend; THIS: +seasonality; the
    seasonal-naive backtest is its null model). State:
    ℓ_t = α(y_t−s_{t−m}) + (1−α)(ℓ+b); b_t = β(ℓ_t−ℓ) + (1−β)b;
    s_t = γ(y_t−ℓ_t) + (1−γ)s_{t−m}; init ℓ₀ = mean of week 1,
    b₀ = 0, s_i = y_i − ℓ₀. Emits final state and the one-step
    forecast ℓ + b + s (the next day's seasonal index is the head of
    the rotated register).

    Same twin-recurrence discipline as forecast_holt_linear_daily: the
    Spark side is a row-local ARRAY FOLD whose accumulator carries the
    7-slot seasonal register (slice+concat rotation — arrays in a
    named_struct fold are fine; it is DuckDB's list_reduce that
    mis-evaluates multi-field accumulators, hence the oracle is a
    step-indexed recursive CTE carrying s0..s6 as columns). Both
    engines execute the identical double arithmetic in the identical
    order, so the e6-floored outputs hash-match exactly.

    Scale: one keyed daily rollup, one bounded collect_list per key
    (the series length is the CALENDAR, never the SF), zero windows
    beyond it. Series too long for a row: segment the fold and compose
    — the HW update is affine in (ℓ, b, s), so chunk composition is
    exact (same note as Holt).
    """
    A, B, G = (c + "D" for c in (HW_ALPHA, HW_BETA, HW_GAMMA))
    m = HW_M
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count("*").alias("n"))
    arr = (
        daily.groupBy("event_type")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("day").alias("d"),
                        F.col("n").cast("double").alias("y"),
                    )
                )
            ).alias("a")
        )
        .filter(F.expr(f"size(a) >= {2 * m + 1}"))
    )
    y7 = " + ".join(f"a[{i}].y" for i in range(m))
    l0 = f"(({y7}) / 7.0D)"
    s_init = ", ".join(f"a[{i}].y - {l0}" for i in range(m))
    lvl = f"{A} * (x.y - acc.s[0]) + (1.0D - {A}) * (acc.l + acc.b)"
    fold = (
        f"aggregate(slice(a, {m + 1}, size(a) - {m}), "
        f"named_struct('l', {l0}, 'b', 0.0D, 's', array({s_init})), "
        f"(acc, x) -> named_struct("
        f"'l', {lvl}, "
        f"'b', {B} * (({lvl}) - acc.l) + (1.0D - {B}) * acc.b, "
        f"'s', concat(slice(acc.s, 2, {m - 1}), "
        f"array({G} * (x.y - ({lvl})) + (1.0D - {G}) * acc.s[0]))))"
    )
    return arr.select(
        "event_type",
        F.expr("size(a)").cast("long").alias("n_days"),
        F.expr(
            f"CAST(floor(({fold}).l * 1000000 + 0.5) AS BIGINT)"
        ).alias("level_e6"),
        F.expr(
            f"CAST(floor(({fold}).b * 1000000 + 0.5) AS BIGINT)"
        ).alias("trend_e6"),
        F.expr(
            f"CAST(floor((({fold}).l + ({fold}).b + ({fold}).s[0])"
            " * 1000000 + 0.5) AS BIGINT)"
        ).alias("forecast_next_e6"),
    )


PVM_Y0, PVM_Y1 = 1996, 1997  # revenue-bridge comparison years


@query(
    "price_volume_mix_bridge",
    oracle=f"""
        WITH py AS (
            SELECT p.p_brand AS brand, l.l_partkey AS pk,
                   CAST(year(l.l_shipdate) AS INTEGER) AS yr,
                   CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT)
                       AS q,
                   CAST(sum(CAST(floor(l.l_extendedprice
                                       * (1 - l.l_discount) * 100
                                       + 0.5) AS BIGINT)) AS BIGINT)
                       AS r
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            WHERE year(l.l_shipdate) IN ({PVM_Y0}, {PVM_Y1})
            GROUP BY 1, 2, 3
        ),
        w AS (
            SELECT brand, pk,
                   max(CASE WHEN yr = {PVM_Y0} THEN q END) AS q0,
                   max(CASE WHEN yr = {PVM_Y0} THEN r END) AS r0,
                   max(CASE WHEN yr = {PVM_Y1} THEN q END) AS q1,
                   max(CASE WHEN yr = {PVM_Y1} THEN r END) AS r1
            FROM py GROUP BY 1, 2
        )
        SELECT brand,
               CAST(sum(CASE WHEN q0 IS NOT NULL AND q1 IS NOT NULL
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
               CAST(sum(coalesce(r0, 0)) AS BIGINT) AS rev0_cents,
               CAST(sum(coalesce(r1, 0)) AS BIGINT) AS rev1_cents,
               CAST(sum(CASE WHEN q0 IS NOT NULL AND q1 IS NOT NULL
                        THEN (r1 * q0 - r0 * q1) // q1
                        ELSE 0 END) AS BIGINT) AS price_effect_cents,
               CAST(sum(CASE WHEN q0 IS NOT NULL AND q1 IS NOT NULL
                        THEN ((q1 - q0) * r0) // q0
                        ELSE 0 END) AS BIGINT) AS volume_effect_cents,
               CAST(sum(CASE WHEN q0 IS NULL THEN r1 ELSE 0 END)
                    AS BIGINT) AS new_parts_cents,
               CAST(sum(CASE WHEN q1 IS NULL THEN r0 ELSE 0 END)
                    AS BIGINT) AS dropped_parts_cents
        FROM w GROUP BY brand
    """,
)
def price_volume_mix_bridge(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Revenue bridge (price/volume/mix decomposition) per brand between
    two years — the classic FP&A "why did revenue change" waterfall:
    for parts sold in BOTH years, the price effect holds volume at the
    base year ((p1−p0)·q0, Laspeyres) and the volume effect holds price
    at the base ((q1−q0)·p0); parts that appeared/disappeared carry
    their whole revenue into new/dropped buckets. The interaction
    residual is recoverable as (Δrev − price − volume) by the reader.

    Exactness: unit prices never materialize as floats — each part's
    effect cross-multiplies exact cent/quantity integers and floors
    ONCE per part ((r1·q0 − r0·q1) div q1), the same integerize-per-
    row-then-sum rule as dq_order_total_reconciliation.

    Scale: one keyed (brand, part, year) aggregate off the fact scan
    (partial map-side), a part-level pivot by conditional aggregation
    (no join of two year-scans), and a brand rollup. The part
    dimension join broadcasts.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    py = (
        li.filter(F.year("l_shipdate").isin(PVM_Y0, PVM_Y1))
        .join(
            F.broadcast(p.select("p_partkey", "p_brand")),
            li.l_partkey == F.col("p_partkey"),
        )
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("l_partkey").alias("pk"),
            F.year("l_shipdate").cast("int").alias("yr"),
        )
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("q"),
            F.sum(
                F.floor(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * 100
                    + 0.5
                ).cast("long")
            ).alias("r"),
        )
    )
    w = py.groupBy("brand", "pk").agg(
        F.max(F.when(F.col("yr") == PVM_Y0, F.col("q"))).alias("q0"),
        F.max(F.when(F.col("yr") == PVM_Y0, F.col("r"))).alias("r0"),
        F.max(F.when(F.col("yr") == PVM_Y1, F.col("q"))).alias("q1"),
        F.max(F.when(F.col("yr") == PVM_Y1, F.col("r"))).alias("r1"),
    )
    matched = F.col("q0").isNotNull() & F.col("q1").isNotNull()
    return w.groupBy("brand").agg(
        F.sum(F.when(matched, 1).otherwise(0))
        .cast("long")
        .alias("n_matched"),
        F.sum(F.coalesce(F.col("r0"), F.lit(0)))
        .cast("long")
        .alias("rev0_cents"),
        F.sum(F.coalesce(F.col("r1"), F.lit(0)))
        .cast("long")
        .alias("rev1_cents"),
        F.sum(
            F.when(
                matched, F.expr("(r1 * q0 - r0 * q1) div q1")
            ).otherwise(0)
        )
        .cast("long")
        .alias("price_effect_cents"),
        F.sum(
            F.when(
                matched, F.expr("((q1 - q0) * r0) div q0")
            ).otherwise(0)
        )
        .cast("long")
        .alias("volume_effect_cents"),
        F.sum(F.when(F.col("q0").isNull(), F.col("r1")).otherwise(0))
        .cast("long")
        .alias("new_parts_cents"),
        F.sum(F.when(F.col("q1").isNull(), F.col("r0")).otherwise(0))
        .cast("long")
        .alias("dropped_parts_cents"),
    )


# Spearman ρ numerator/denominator from exact integer rank-×2 moments;
# one shared text so the single double division agrees bit-for-bit.
_SPEARMAN_RHO_SQL = (
    "CAST(floor("
    " (CAST(sab AS DOUBLE) - n * (n + 1.0) * (n + 1.0))"
    " / sqrt((CAST(saa AS DOUBLE) - n * (n + 1.0) * (n + 1.0))"
    "      * (CAST(sbb AS DOUBLE) - n * (n + 1.0) * (n + 1.0)))"
    " * 1000000 + 0.5) AS BIGINT)"
)


@query(
    "stats_spearman_rank_correlation",
    oracle=f"""
        WITH rows_xy AS (
            SELECT CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT) AS x,
                   CAST(coalesce(o.n, 0) AS BIGINT) AS y
            FROM customer c LEFT JOIN (
                SELECT o_custkey, count(*) AS n FROM orders GROUP BY 1
            ) o ON c.c_custkey = o.o_custkey
        ),
        dx AS (
            SELECT x, count(*) AS n_v,
                   2 * (sum(count(*)) OVER (ORDER BY x
                        ROWS UNBOUNDED PRECEDING) - count(*))
                   + count(*) + 1 AS r2
            FROM rows_xy GROUP BY x
        ),
        dy AS (
            SELECT y, count(*) AS n_v,
                   2 * (sum(count(*)) OVER (ORDER BY y
                        ROWS UNBOUNDED PRECEDING) - count(*))
                   + count(*) + 1 AS r2
            FROM rows_xy GROUP BY y
        ),
        dxy AS (SELECT x, y, count(*) AS n_xy FROM rows_xy GROUP BY 1, 2),
        mo AS (
            SELECT CAST(sum(n_xy) AS BIGINT) AS n,
                   CAST(sum(CAST(n_xy AS DECIMAL(38,0))
                            * dx.r2 * dy.r2) AS DECIMAL(38,0)) AS sab,
                   CAST(sum(CAST(n_xy AS DECIMAL(38,0))
                            * dx.r2 * dx.r2) AS DECIMAL(38,0)) AS saa,
                   CAST(sum(CAST(n_xy AS DECIMAL(38,0))
                            * dy.r2 * dy.r2) AS DECIMAL(38,0)) AS sbb
            FROM dxy JOIN dx USING (x) JOIN dy USING (y)
        )
        SELECT n, {_SPEARMAN_RHO_SQL} + 0 AS spearman_rho_e6
        FROM mo
    """,
)
def stats_spearman_rank_correlation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Spearman rank correlation between customer balance and order
    count — the MONOTONE-association companion to the exact Pearson
    matrix (stats_correlation_matrix_exact measures linearity; ranks
    are robust to the heavy right tail of order counts and to balance
    outliers).

    Exactness (the nonparametric-rank recipe, third application):
    per-row ranks never materialize — each variable's tie-averaged
    rank ×2 is the integer 2·cum_before + n_v + 1 on its VALUE
    DICTIONARY, and every moment Σ n_xy·r2ₐ·r2ᵦ is an exact
    DECIMAL(38,0) over the (x, y) JOINT dictionary. With rank×2
    integers, n·(n+1)² is exactly 4n·r̄² — the shared formula divides
    once in double and floors to e6.

    Scale: two marginal dictionaries (static-band distributed cumsum),
    one joint-dictionary aggregate, two broadcast-size dictionary
    joins. Cardinality is bounded by distinct values, never rows.
    """
    from ..functions.ranking import with_global_cumsum_static

    cust = load_table(spark, sf_dir, "customer")
    oc = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n"))
    )
    rows_xy = cust.join(
        oc, cust.c_custkey == oc.o_custkey, "left"
    ).select(
        F.floor(F.col("c_acctbal") * 100 + 0.5).cast("long").alias("x"),
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("y"),
    )
    rows_xy = rows_xy.localCheckpoint()  # feeds three dictionaries

    def rank2(dim: str, band_div: int) -> DataFrame:
        d = rows_xy.groupBy(dim).agg(F.count("*").alias("n_v"))
        c = with_global_cumsum_static(
            d,
            F.expr(f"{dim} div {band_div}"),
            [dim],
            "n_v",
            "cum",
        )
        return c.select(
            dim,
            (
                2 * (F.col("cum") - F.col("n_v"))
                + F.col("n_v")
                + 1
            ).alias(f"r2_{dim}"),
        )

    dx = rank2("x", 100000)
    dy = rank2("y", 1)
    dxy = rows_xy.groupBy("x", "y").agg(F.count("*").alias("n_xy"))
    dec = F.col("n_xy").cast("decimal(38,0)")
    mo = (
        dxy.join(dx, "x")
        .join(F.broadcast(dy), "y")
        .agg(
            F.sum("n_xy").cast("long").alias("n"),
            F.sum(dec * F.col("r2_x") * F.col("r2_y"))
            .cast("decimal(38,0)")
            .alias("sab"),
            F.sum(dec * F.col("r2_x") * F.col("r2_x"))
            .cast("decimal(38,0)")
            .alias("saa"),
            F.sum(dec * F.col("r2_y") * F.col("r2_y"))
            .cast("decimal(38,0)")
            .alias("sbb"),
        )
    )
    return mo.select(
        "n", (F.expr(_SPEARMAN_RHO_SQL) + F.lit(0)).alias("spearman_rho_e6")
    )


def _hw_tournament_oracle() -> str:
    A, B, G = (f"{c}::DOUBLE" for c in (HW_ALPHA, HW_BETA, HW_GAMMA))
    y7 = " + ".join(
        f"max(CASE WHEN rn = {i} THEN y END)" for i in range(1, HW_M + 1)
    )
    s_init = ", ".join(
        f"max(CASE WHEN rn = {i} THEN y END) - ({y7}) / 7.0::DOUBLE"
        for i in range(1, HW_M + 1)
    )
    scols = ", ".join(f"s{i}" for i in range(HW_M))
    lvl = f"{A} * (i.y - r.s0) + (1.0::DOUBLE - {A}) * (r.l + r.b)"
    step_s = ", ".join(f"r.s{i}" for i in range(1, HW_M))
    return f"""
        WITH RECURSIVE daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
            FROM events GROUP BY 1, 2
        ),
        idx AS (
            SELECT event_type,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY day) AS rn,
                   CAST(n AS DOUBLE) AS y
            FROM daily
        ),
        mx AS (
            SELECT event_type, max(rn) AS m FROM idx GROUP BY 1
            HAVING max(rn) >= {2 * HW_M + 1}
        ),
        rec(event_type, rn, l, b, {scols}, sae) AS (
            SELECT event_type, {HW_M},
                   ({y7}) / 7.0::DOUBLE, CAST(0 AS DOUBLE),
                   {s_init}, CAST(0 AS DOUBLE)
            FROM idx WHERE rn <= {HW_M} GROUP BY event_type
            UNION ALL
            SELECT i.event_type, r.rn + 1,
                   {lvl},
                   {B} * (({lvl}) - r.l) + (1.0::DOUBLE - {B}) * r.b,
                   {step_s},
                   {G} * (i.y - ({lvl})) + (1.0::DOUBLE - {G}) * r.s0,
                   r.sae + abs(i.y - (r.l + r.b + r.s0))
            FROM rec r
            JOIN idx i ON i.event_type = r.event_type
                      AND i.rn = r.rn + 1
        ),
        hw AS (
            SELECT r.event_type, mx.m,
                   CAST(mx.m - {HW_M} AS BIGINT) AS n_eval,
                   r.sae
            FROM rec r JOIN mx ON r.event_type = mx.event_type
                              AND r.rn = mx.m
        ),
        naive AS (
            SELECT a.event_type,
                   sum(abs(a.y - b.y)) AS nae
            FROM idx a JOIN idx b
              ON a.event_type = b.event_type
             AND b.rn = a.rn - {HW_M}
            WHERE a.rn > {HW_M}
            GROUP BY 1
        )
        SELECT hw.event_type, n_eval,
               CAST(floor(hw.sae / n_eval * 1000000 + 0.5) AS BIGINT)
                   AS hw_mae_e6,
               CAST(floor(naive.nae / n_eval * 1000000 + 0.5) AS BIGINT)
                   AS naive_mae_e6,
               CAST(CASE WHEN hw.sae < naive.nae THEN 1 ELSE 0 END
                    AS INTEGER) AS hw_wins
        FROM hw JOIN naive ON hw.event_type = naive.event_type
    """


@query("forecast_backtest_tournament", oracle=_hw_tournament_oracle())
def forecast_backtest_tournament(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Walk-forward model tournament: one-step-ahead MAE of Holt-Winters
    vs the seasonal-naive null (ŷ_t = y_{t−7}) over the same evaluation
    steps — the accuracy evidence the forecasting ladder owes its
    users (a seasonal model that can't beat "same weekday last week"
    is decoration; this emits the verdict per series). Forecasts are
    made BEFORE each update (honest walk-forward, no leakage): the HW
    error accumulates inside the same fold that advances the state,
    ŷ = ℓ + b + s_head at each step.

    Same twin-recurrence discipline as forecast_holt_winters_weekly —
    the oracle recursion carries an extra running-error column; the
    naive arm is one index self-join (rn = rn−7) in both engines.

    Scale: identical to the HW fit — one keyed daily rollup, one
    bounded per-key fold; the naive arm adds a row-local array zip,
    zero extra shuffles.
    """
    A, B, G = (c + "D" for c in (HW_ALPHA, HW_BETA, HW_GAMMA))
    m = HW_M
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count("*").alias("n"))
    arr = (
        daily.groupBy("event_type")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("day").alias("d"),
                        F.col("n").cast("double").alias("y"),
                    )
                )
            ).alias("a")
        )
        .filter(F.expr(f"size(a) >= {2 * m + 1}"))
    )
    y7 = " + ".join(f"a[{i}].y" for i in range(m))
    l0 = f"(({y7}) / 7.0D)"
    s_init = ", ".join(f"a[{i}].y - {l0}" for i in range(m))
    lvl = f"{A} * (x.y - acc.s[0]) + (1.0D - {A}) * (acc.l + acc.b)"
    fold = (
        f"aggregate(slice(a, {m + 1}, size(a) - {m}), "
        f"named_struct('l', {l0}, 'b', 0.0D, 's', array({s_init}), "
        f"'sae', 0.0D), "
        f"(acc, x) -> named_struct("
        f"'l', {lvl}, "
        f"'b', {B} * (({lvl}) - acc.l) + (1.0D - {B}) * acc.b, "
        f"'s', concat(slice(acc.s, 2, {m - 1}), "
        f"array({G} * (x.y - ({lvl})) + (1.0D - {G}) * acc.s[0])), "
        f"'sae', acc.sae + abs(x.y - (acc.l + acc.b + acc.s[0]))))"
    )
    naive = (
        f"aggregate(transform(sequence({m + 1}, size(a)), "
        f"i -> abs(a[i - 1].y - a[i - 1 - {m}].y)), "
        "0.0D, (acc, x) -> acc + x)"
    )
    n_eval = f"(size(a) - {m})"
    return arr.select(
        "event_type",
        F.expr(n_eval).cast("long").alias("n_eval"),
        F.expr(
            f"CAST(floor(({fold}).sae / {n_eval} * 1000000 + 0.5)"
            " AS BIGINT)"
        ).alias("hw_mae_e6"),
        F.expr(
            f"CAST(floor(({naive}) / {n_eval} * 1000000 + 0.5)"
            " AS BIGINT)"
        ).alias("naive_mae_e6"),
        F.expr(
            f"CAST(CASE WHEN ({fold}).sae < ({naive}) THEN 1 ELSE 0 END"
            " AS INT)"
        ).alias("hw_wins"),
    )

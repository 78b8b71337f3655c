"""Privacy / governance analytics.

Companion surface to the storage-layer right-to-be-forgotten path
(lakehouse_ops.lakehouse_gdpr_purge) and the text-side PII scrub
(text.pii_scrub_documents): the ANALYTICAL side of data governance —
re-identification risk audits and privacy-preserving analytics over
pseudonymized keys. The reference ships customer PII straight through
its pipeline (docker/init.sql seeds names/addresses; dags/etl.py moves
them verbatim) with no governance layer at all; at 100 TB of user data
these are table-stakes operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import hash64, hash64_sql
from ..registry import query
from ..sources.io import load_table

K_ANON = 5  # minimum equivalence-class size
PSEUDO_KEY = "tenant-7f3a"  # deterministic keyed-pseudonym salt


@query(
    "privacy_k_anonymity_audit",
    oracle=f"""
        SELECT c_nationkey, c_mktsegment,
               CAST(floor(c_acctbal / 1000) AS INTEGER) AS bal_kbucket,
               count(*) AS class_size
        FROM customer
        GROUP BY 1, 2, 3
        HAVING count(*) < {K_ANON}
    """,
)
def privacy_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier tuple
    (nation, market segment, account-balance bucket): every equivalence
    class smaller than k={K_ANON} is a re-identification risk — an
    attacker who knows those three attributes pins the individual to
    fewer than k candidates. The released rows are exactly the classes a
    generalization pass (coarser buckets, suppressed columns) must fix
    before publication.

    Scale: one keyed aggregation — the QI tuple is the grouping key, so
    the shuffle carries one partial row per class per task (map-side
    combine), and the audit cost is the cost of a groupBy at any table
    size. The bucket transform (floor/1000) is the generalization
    hierarchy's bottom level; re-running with coarser transforms walks
    the hierarchy.
    """
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.groupBy(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 1000).cast("int").alias("bal_kbucket"),
        )
        .agg(F.count("*").alias("class_size"))
        .filter(F.col("class_size") < K_ANON)
    )


@query(
    "privacy_pseudonymized_spend_topk",
    oracle=f"""
        WITH pc AS (
            SELECT {hash64_sql(f"'{PSEUDO_KEY}|c|' || CAST(c_custkey AS VARCHAR)")}
                       AS pseudo_id,
                   c_mktsegment
            FROM customer
        ),
        po AS (
            SELECT {hash64_sql(f"'{PSEUDO_KEY}|c|' || CAST(o_custkey AS VARCHAR)")}
                       AS pseudo_id,
                   CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
            FROM orders
        )
        SELECT pc.pseudo_id, pc.c_mktsegment,
               count(*) AS n_orders,
               CAST(sum(po.cents) AS BIGINT) AS spend_cents
        FROM pc JOIN po ON pc.pseudo_id = po.pseudo_id
        GROUP BY 1, 2
        ORDER BY spend_cents DESC, pc.pseudo_id
        LIMIT 10
    """,
)
def privacy_pseudonymized_spend_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Privacy-preserving analytics over KEYED PSEUDONYMS: the natural
    key is replaced on BOTH tables by a deterministic keyed hash
    (salt ‖ key), and the join + top-spender aggregation runs entirely in
    pseudonym space — referential integrity survives pseudonymization
    because the same (salt, key) maps to the same token everywhere,
    while reversing a token requires the salt (kept out of the published
    dataset). This is GDPR Art. 4(5) pseudonymisation as a query
    rewrite: downstream analytics are unchanged, re-identification needs
    the key vault.

    Scale: the hash is a per-row JVM expression (md5 — no Python, no
    shuffle); the join keys change name but not cardinality, so the plan
    (shuffle-or-broadcast hash join + keyed agg + TakeOrdered top-k) is
    byte-for-byte the plan of the raw-key query. Rotating the salt
    re-keys the entire corpus in one scan.
    """
    cust = load_table(spark, sf_dir, "customer").select(
        hash64(
            F.concat(F.lit(f"{PSEUDO_KEY}|c|"), F.col("c_custkey").cast("string"))
        ).alias("pseudo_id"),
        "c_mktsegment",
    )
    orders = load_table(spark, sf_dir, "orders").select(
        hash64(
            F.concat(F.lit(f"{PSEUDO_KEY}|c|"), F.col("o_custkey").cast("string"))
        ).alias("pseudo_id"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
    )
    return (
        cust.join(orders, "pseudo_id")
        .groupBy("pseudo_id", "c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("cents").cast("long").alias("spend_cents"),
        )
        .orderBy(F.col("spend_cents").desc(), "pseudo_id")
        .limit(10)
    )


L_DIVERSITY = 3  # minimum distinct sensitive values per QI class


@query(
    "privacy_l_diversity_audit",
    oracle=f"""
        SELECT c_nationkey,
               CAST(floor(c_acctbal / 2000) AS INTEGER) AS bal_bucket,
               count(*) AS class_size,
               count(DISTINCT c_mktsegment) AS n_sensitive
        FROM customer
        GROUP BY 1, 2
        HAVING count(DISTINCT c_mktsegment) < {L_DIVERSITY}
    """,
)
def privacy_l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — the attribute-disclosure companion to
    k-anonymity: a quasi-identifier class can be large (k-anonymous) yet
    still leak if (almost) every member shares the same SENSITIVE value
    (here: market segment). Released rows are the classes with fewer
    than l={L_DIVERSITY} distinct sensitive values — the ones where
    knowing the QI tuple reveals the sensitive attribute regardless of
    class size.

    Scale: groupBy + count(DISTINCT sensitive) — Catalyst expands the
    distinct into a two-phase aggregate (partial distinct per task,
    exact merge), one shuffle keyed on the QI tuple. Same preflight
    cost argument as the k-anonymity audit; run both before release.
    """
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.groupBy(
            "c_nationkey",
            F.floor(F.col("c_acctbal") / 2000).cast("int").alias("bal_bucket"),
        )
        .agg(
            F.count("*").alias("class_size"),
            F.countDistinct("c_mktsegment").alias("n_sensitive"),
        )
        .filter(F.col("n_sensitive") < L_DIVERSITY)
    )


DP_SCALE = 2.0  # Laplace scale b (epsilon = sensitivity/b = 0.5 for counts)
DP_SEED = "dp-release-1"  # release identifier: new release => fresh noise


@query(
    "privacy_dp_noisy_counts",
    oracle=f"""
        WITH g AS (
            SELECT c_mktsegment, c_nationkey, count(*) AS true_n
            FROM customer GROUP BY 1, 2
        ),
        u AS (
            SELECT *,
                   (({hash64_sql(
                       "'" + DP_SEED + "|' || c_mktsegment || '|' "
                       "|| CAST(c_nationkey AS VARCHAR)"
                   )} % 999999) + 0.5) / 1000000.0 - 0.5 AS unif
            FROM g
        )
        SELECT c_mktsegment, c_nationkey,
               round(true_n + (-{DP_SCALE}) * sign(unif)
                     * ln(1 - 2 * abs(unif)), 4) + 0.0 AS noisy_count
        FROM u
    """,
)
def privacy_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private count release: each (segment, nation) count
    gets Laplace(b=2) noise — counts have sensitivity 1, so this is an
    epsilon=0.5 release. The noise is DETERMINISTIC given the release
    seed: a portable md5 hash of (seed, group key) is mapped to a
    uniform in (-1/2, 1/2) and passed through the Laplace inverse CDF
    -b*sign(u)*ln(1-2|u|). Seeded noise is what makes a DP release
    reproducible/auditable (and re-queryable without privacy-budget
    burn: same seed, same answer); a NEW release must rotate the seed.

    Scale: one keyed aggregation (partial combine) followed by a
    stateless row-local noise expression — the noise adds zero shuffle
    and zero driver coordination at any group count. The uniform is
    quantized to 1e-6 (999999 buckets, offset half a bucket) so it is
    strictly inside (-1/2, 1/2): the inverse CDF is finite, and both
    engines evaluate the identical double before the one ln() call.
    """
    cust = load_table(spark, sf_dir, "customer")
    g = cust.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count("*").alias("true_n")
    )
    key = F.concat_ws(
        "|",
        F.lit(DP_SEED),
        F.col("c_mktsegment"),
        F.col("c_nationkey").cast("string"),
    )
    unif = ((hash64(key) % 999999) + 0.5) / 1000000.0 - 0.5
    noise = (
        F.lit(-DP_SCALE)
        * F.signum(unif)
        * F.log(F.lit(1.0) - 2 * F.abs(unif))
    )
    return g.select(
        "c_mktsegment",
        "c_nationkey",
        (F.round(F.col("true_n") + noise, 4) + 0.0).alias("noisy_count"),
    )


MASK_LAST_VISIBLE = 3  # trailing characters left in the clear


@query(
    "privacy_column_masking",
    oracle=f"""
        SELECT c_custkey,
               repeat('*', greatest(length(c_name) - {MASK_LAST_VISIBLE}, 0))
                   || right(c_name,
                            least(length(c_name), {MASK_LAST_VISIBLE}))
                   AS name_masked,
               'nation_' || CAST(CAST(floor(c_nationkey / 5.0) AS BIGINT)
                                 * 5 AS VARCHAR) AS nation_bucket,
               CAST(floor(c_acctbal / 1000) * 1000 AS BIGINT)
                   AS acctbal_band
        FROM customer
        WHERE c_custkey < 200
    """,
)
def privacy_column_masking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level masking policies (Snowflake/Unity-style) applied at
    read: names keep only a trailing stub, nation keys generalize to
    5-wide buckets, balances band to the nearest 1000 — the de-identified
    projection an analyst role sees, while the storage layer keeps the
    clear values (contrast lakehouse_gdpr_purge, which REMOVES data,
    and privacy_pseudonymized_spend_topk, which keeps joinability via
    keyed hashes: masking is the third governance mode — readable
    shape, no recoverable value).

    Scale: masking is stateless row-local string/arithmetic expressions
    inside whole-stage codegen — zero shuffle, zero UDF; a real
    deployment binds these expressions into a view/row-filter policy so
    every reader inherits them, which is exactly how this composes with
    the SQL surface (sql_api_nation_revenue_report's temp-view pattern).
    """
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") < 200
    )
    name_len = F.length("c_name")
    masked_name = F.concat(
        F.repeat(
            F.lit("*"), F.greatest(name_len - MASK_LAST_VISIBLE, F.lit(0))
        ),
        F.substring(
            "c_name",
            -MASK_LAST_VISIBLE,
            MASK_LAST_VISIBLE,
        ),
    )
    return cust.select(
        "c_custkey",
        masked_name.alias("name_masked"),
        F.concat(
            F.lit("nation_"),
            (F.floor(F.col("c_nationkey") / 5.0).cast("long") * 5).cast(
                "string"
            ),
        ).alias("nation_bucket"),
        (F.floor(F.col("c_acctbal") / 1000) * 1000)
        .cast("long")
        .alias("acctbal_band"),
    )


GDPR_SUBJECT_KEY = 42  # the data subject of the access-request fixture


@query(
    "gdpr_subject_access_report",
    oracle=f"""
        SELECT 'customer' AS tbl, count(*) AS n_rows,
               CAST(coalesce(sum(CAST(floor(c_acctbal * 100 + 0.5)
                                      AS BIGINT)), 0) AS BIGINT) AS ref_cents
        FROM customer WHERE c_custkey = {GDPR_SUBJECT_KEY}
        UNION ALL
        SELECT 'orders', count(*),
               CAST(coalesce(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                      AS BIGINT)), 0) AS BIGINT)
        FROM orders WHERE o_custkey = {GDPR_SUBJECT_KEY}
        UNION ALL
        SELECT 'lineitem', count(*),
               CAST(coalesce(sum(CAST(floor(l.l_extendedprice * 100 + 0.5)
                                      AS BIGINT)), 0) AS BIGINT)
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_custkey = {GDPR_SUBJECT_KEY}
        UNION ALL
        SELECT 'events', count(*),
               CAST(coalesce(sum(CAST(floor(value * 100 + 0.5)
                                      AS BIGINT)), 0) AS BIGINT)
        FROM events WHERE user_id = {GDPR_SUBJECT_KEY}
    """,
)
def gdpr_subject_access_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDPR Article-15 subject-access report (DSAR): one data subject's
    footprint across every table that can reference them — row counts
    plus a value checksum per table, the inventory a privacy office
    produces before an export or an Article-17 erasure
    (gdpr_purge_lakehouse is the erasure sibling). The lineitem arm
    resolves through its order foreign key — subject data isn't only
    where the key literally appears.

    Scale: each arm is a subject-key point predicate — pushed to the
    parquet scan here, and at 100 TB exactly what the lakehouse bloom
    point lookup / partition pruning / z-order machinery exists for;
    the fact-table arm is a broadcast semi-join through the key map.
    The report is a union of single-row aggregates — driver cost is
    four rows.
    """
    k = GDPR_SUBJECT_KEY
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ev = load_table(spark, sf_dir, "events")
    cents = lambda c: F.coalesce(  # noqa: E731
        F.sum(F.floor(F.col(c) * 100 + 0.5).cast("long")), F.lit(0)
    ).cast("long")

    def arm(df: DataFrame, name: str, col: str) -> DataFrame:
        return df.agg(
            F.count("*").alias("n_rows"), cents(col).alias("ref_cents")
        ).select(F.lit(name).alias("tbl"), "n_rows", "ref_cents")

    subject_orders = orders.filter(F.col("o_custkey") == k)
    out = (
        arm(cust.filter(F.col("c_custkey") == k), "customer", "c_acctbal")
        .unionByName(arm(subject_orders, "orders", "o_totalprice"))
        .unionByName(
            arm(
                li.join(
                    F.broadcast(
                        subject_orders.select(
                            F.col("o_orderkey").alias("l_orderkey")
                        )
                    ),
                    "l_orderkey",
                    "left_semi",
                ),
                "lineitem",
                "l_extendedprice",
            )
        )
        .unionByName(
            arm(ev.filter(F.col("user_id") == k), "events", "value")
        )
    )
    return out


T_CLOSENESS_E6 = 40_000  # release bar: EMD(class, global) ≤ 0.04


@query(
    "privacy_t_closeness_audit",
    oracle=f"""
        WITH j AS (
            SELECT c.c_nationkey AS nat, c.c_mktsegment AS seg,
                   o.o_orderpriority AS pri, count(*) AS c
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1, 2, 3
        ),
        cls AS (SELECT nat, seg, CAST(sum(c) AS BIGINT) AS ng
                FROM j GROUP BY 1, 2),
        gl AS (SELECT pri, CAST(sum(c) AS BIGINT) AS g FROM j GROUP BY 1),
        nn AS (SELECT CAST(sum(c) AS BIGINT) AS N FROM j),
        grid AS (
            SELECT cls.nat, cls.seg, gl.pri, cls.ng, gl.g,
                   CAST(coalesce(j.c, 0) AS BIGINT) AS c
            FROM cls CROSS JOIN gl
            LEFT JOIN j ON j.nat = cls.nat AND j.seg = cls.seg
                       AND j.pri = gl.pri
        ),
        cum AS (
            SELECT nat, seg, pri, ng,
                   sum(c * (SELECT N FROM nn) - g * ng)
                       OVER (PARTITION BY nat, seg ORDER BY pri) AS cd
            FROM grid
        ),
        emd AS (
            SELECT nat, seg, max(ng) AS class_size,
                   CAST(sum(abs(cd)) AS BIGINT) AS ts
            FROM cum WHERE pri < '5' GROUP BY 1, 2
        )
        SELECT nat AS c_nationkey, seg AS c_mktsegment, class_size,
               ts * 1000000 // (class_size * (SELECT N FROM nn) * 4)
                   AS t_emd_e6,
               ts * 1000000 // (class_size * (SELECT N FROM nn) * 4)
                   > {T_CLOSENESS_E6} AS breach
        FROM emd
    """,
)
def privacy_t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit — the third rung of the release-audit ladder
    (k-anonymity: classes too small; l-diversity: classes too uniform;
    t-closeness: class distributions too FAR from the corpus): for each
    quasi-identifier class (nation, segment), the Earth Mover's
    Distance between its ORDERED sensitive-attribute distribution
    (order priority, 5 ranked levels) and the global one. For ordered
    discrete values EMD reduces to the mean absolute cumulative
    difference, so the whole statistic is exact integer arithmetic:
    cumulative sums of c_i·N − g_i·n_g (cross-multiplied rationals),
    final t in 1e-6 units via floor division by n_g·N·(m−1). Every
    class is emitted with its t and the breach verdict (both branches
    populated at the sf0.01 calibration: median t ≈ 0.031 vs the 0.04
    bar).

    Scale: one broadcast-dim join + three keyed aggregates; the grid
    completion (class × 5 priorities) and the cumulative window run on
    a relation of |classes|×5 rows — bounded by attribute cardinality,
    not SF. The cross-multiplied integers stay under int64 through
    ~sf3 (N²/25 · 1e6); past that the cd column moves to DECIMAL(38).
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    j = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nat"),
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderpriority").alias("pri"),
        )
        .agg(F.count("*").alias("c"))
    )
    from ..functions.caching import scoped_persist

    j = scoped_persist(j)
    cls = j.groupBy("nat", "seg").agg(F.sum("c").cast("long").alias("ng"))
    gl = j.groupBy("pri").agg(F.sum("c").cast("long").alias("g"))
    n_total = j.agg(F.sum("c")).first()[0]  # one scalar to the driver
    grid = (
        cls.crossJoin(F.broadcast(gl))
        .join(
            j.select(
                F.col("nat").alias("jn"),
                F.col("seg").alias("js"),
                F.col("pri").alias("jp"),
                "c",
            ),
            (F.col("nat") == F.col("jn"))
            & (F.col("seg") == F.col("js"))
            & (F.col("pri") == F.col("jp")),
            "left",
        )
        .select(
            "nat",
            "seg",
            "pri",
            "ng",
            "g",
            F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("c"),
        )
    )
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("nat", "seg")
        .orderBy("pri")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = grid.select(
        "nat",
        "seg",
        "pri",
        "ng",
        F.sum(
            F.col("c") * F.lit(n_total) - F.col("g") * F.col("ng")
        ).over(w).alias("cd"),
    )
    emd = (
        cum.filter(F.col("pri") < "5")
        .groupBy("nat", "seg")
        .agg(
            F.max("ng").alias("class_size"),
            F.sum(F.abs(F.col("cd"))).cast("long").alias("ts"),
        )
    )
    t = F.expr(f"ts * 1000000 div (class_size * {n_total}L * 4)")
    return emd.select(
        F.col("nat").alias("c_nationkey"),
        F.col("seg").alias("c_mktsegment"),
        "class_size",
        t.alias("t_emd_e6"),
        (t > T_CLOSENESS_E6).alias("breach"),
    )

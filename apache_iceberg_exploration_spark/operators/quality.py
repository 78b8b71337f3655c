"""Data-quality expectations over the star schema + corpus tables.

The reference has no data-quality layer at all — its Silver stage is a
bare ``dropDuplicates()`` (etl.py:68, SURVEY.md §2.4 A2) and its seed
fixture is itself broken (init.sql:10-19, SURVEY.md §5: duplicate emails
vs a UNIQUE constraint, a trailing-comma syntax error, a missing
``last_updated`` column).  That history is the argument for making
expectations first-class here: a 100 TB ingest needs machine-checkable
contracts (null keys, referential integrity, ranges, enums, duplicate
PKs) BEFORE data reaches Silver, not an eyeball `.show()`.

Everything is expressed as conditional aggregates so each table is
scanned ONCE for all its row-local rules (partial aggregates map-side,
the shuffle carries one row per table), plus one anti-join per foreign
key for referential checks.  Output is a tidy (entity, rule, value)
report — the shape a scheduler can diff run-over-run or alert on.
"""

from __future__ import annotations

from functools import reduce
from itertools import chain

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.io import load_table


def profile_rules(df: DataFrame, entity: str, rules: dict[str, Column]) -> DataFrame:
    """One-pass rule evaluation: every rule is a conditional aggregate over
    a single scan of ``df``; the single agg row is exploded into tidy
    (entity, rule, value) rows.

    Scale: one partial-aggregate pass per table regardless of rule count —
    adding a rule adds a column to the agg, not a scan.  The shuffle moves
    exactly one row.
    """
    agg = df.agg(*[v.cast("long").alias(k) for k, v in rules.items()])
    kv = F.create_map(
        *chain.from_iterable((F.lit(k), F.col(k)) for k in rules)
    )
    return agg.select(
        F.lit(entity).alias("entity"), F.explode(kv).alias("rule", "value")
    )


def fk_orphans(
    child: DataFrame, parent: DataFrame, on: list[tuple[str, str]],
    entity: str, rule: str,
) -> DataFrame:
    """Referential-integrity check: count child rows whose key has no
    parent — a left-anti join reduced to one count.

    Scale: Catalyst broadcasts the parent when it is dimension-sized
    (customer/orders keys here); at fact-fact scale AQE picks sort-merge
    anti with both sides hash-partitioned on the key — never a cross
    product, and only the key columns are scanned on the parent side.
    """
    cond = reduce(
        lambda a, b: a & b,
        [child[c].eqNullSafe(parent[p]) for c, p in on],
    )
    return (
        child.join(parent, cond, "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("value"))
        .select(F.lit(entity).alias("entity"), F.lit(rule).alias("rule"), "value")
    )


@query(
    "dq_expectations_report",
    oracle="""
        WITH report(entity, rule, value) AS (
          SELECT 'customer', 'row_count', count(*) FROM customer
          UNION ALL SELECT 'customer', 'dup_custkey',
                 count(*) - count(DISTINCT c_custkey) FROM customer
          UNION ALL SELECT 'customer', 'null_custkey',
                 count(*) FILTER (WHERE c_custkey IS NULL) FROM customer
          UNION ALL SELECT 'orders', 'row_count', count(*) FROM orders
          UNION ALL SELECT 'orders', 'dup_orderkey',
                 count(*) - count(DISTINCT o_orderkey) FROM orders
          UNION ALL SELECT 'orders', 'null_custkey',
                 count(*) FILTER (WHERE o_custkey IS NULL) FROM orders
          UNION ALL SELECT 'orders', 'bad_status',
                 count(*) FILTER (WHERE o_orderstatus NOT IN ('O','F','P')) FROM orders
          UNION ALL SELECT 'orders', 'nonpositive_totalprice',
                 count(*) FILTER (WHERE o_totalprice <= 0) FROM orders
          UNION ALL SELECT 'orders', 'orphan_custkey', count(*)
                 FROM orders o WHERE NOT EXISTS
                   (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
          UNION ALL SELECT 'lineitem', 'row_count', count(*) FROM lineitem
          UNION ALL SELECT 'lineitem', 'nonpositive_quantity',
                 count(*) FILTER (WHERE l_quantity <= 0) FROM lineitem
          UNION ALL SELECT 'lineitem', 'discount_out_of_range',
                 count(*) FILTER (WHERE l_discount < 0 OR l_discount > 0.1) FROM lineitem
          UNION ALL SELECT 'lineitem', 'ship_before_order', count(*)
                 FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
                 WHERE l.l_shipdate < o.o_orderdate
          UNION ALL SELECT 'lineitem', 'orphan_orderkey', count(*)
                 FROM lineitem l WHERE NOT EXISTS
                   (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
          UNION ALL SELECT 'events', 'row_count', count(*) FROM events
          UNION ALL SELECT 'events', 'null_value',
                 count(*) FILTER (WHERE value IS NULL) FROM events
          UNION ALL SELECT 'events', 'orphan_user', count(*)
                 FROM events e WHERE NOT EXISTS
                   (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)
          UNION ALL SELECT 'documents', 'row_count', count(*) FROM documents
          UNION ALL SELECT 'documents', 'short_text_lt100',
                 count(*) FILTER (WHERE n_chars < 100) FROM documents
          UNION ALL SELECT 'documents', 'n_chars_mismatch',
                 count(*) FILTER (WHERE n_chars <> length(text)) FROM documents
        )
        SELECT entity, rule, value FROM report
    """,
)
def dq_expectations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table data-quality report: (entity, rule, violation/metric).

    Covers the contract classes the reference's broken fixture shows it
    needed (SURVEY.md §5): duplicate/NULL primary keys, referential
    integrity (orders→customer, lineitem→orders, events→customer),
    domain enums (o_orderstatus), value ranges (price/quantity/discount),
    temporal sanity (shipped before ordered), and declared-vs-derived
    consistency (documents.n_chars vs length(text)).

    Scale: row-local rules fold into ONE conditional-aggregate scan per
    table; each FK adds one anti-join whose parent side is key-only and
    broadcast when dimension-sized.  The report itself is O(rules) rows.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    events = load_table(spark, sf_dir, "events")
    documents = load_table(spark, sf_dir, "documents")

    one = F.lit(1)
    parts = [
        profile_rules(customer, "customer", {
            "row_count": F.count(one),
            "dup_custkey": F.count(one) - F.count_distinct(F.col("c_custkey")),
            "null_custkey": F.count_if(F.col("c_custkey").isNull()),
        }),
        profile_rules(orders, "orders", {
            "row_count": F.count(one),
            "dup_orderkey": F.count(one) - F.count_distinct(F.col("o_orderkey")),
            "null_custkey": F.count_if(F.col("o_custkey").isNull()),
            "bad_status": F.count_if(~F.col("o_orderstatus").isin("O", "F", "P")),
            "nonpositive_totalprice": F.count_if(F.col("o_totalprice") <= 0),
        }),
        fk_orphans(orders, customer.select("c_custkey"),
                   [("o_custkey", "c_custkey")], "orders", "orphan_custkey"),
        profile_rules(lineitem, "lineitem", {
            "row_count": F.count(one),
            "nonpositive_quantity": F.count_if(F.col("l_quantity") <= 0),
            "discount_out_of_range": F.count_if(
                (F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)
            ),
        }),
        (  # temporal sanity needs the parent row, not just key existence
            lineitem.select("l_orderkey", "l_shipdate")
            .join(orders.select("o_orderkey", "o_orderdate"),
                  F.col("l_orderkey") == F.col("o_orderkey"))
            .agg(F.count_if(F.col("l_shipdate") < F.col("o_orderdate"))
                 .cast("long").alias("value"))
            .select(F.lit("lineitem").alias("entity"),
                    F.lit("ship_before_order").alias("rule"), "value")
        ),
        fk_orphans(lineitem, orders.select("o_orderkey"),
                   [("l_orderkey", "o_orderkey")], "lineitem", "orphan_orderkey"),
        profile_rules(events, "events", {
            "row_count": F.count(one),
            "null_value": F.count_if(F.col("value").isNull()),
        }),
        fk_orphans(events, customer.select("c_custkey"),
                   [("user_id", "c_custkey")], "events", "orphan_user"),
        profile_rules(documents, "documents", {
            "row_count": F.count(one),
            "short_text_lt100": F.count_if(F.col("n_chars") < 100),
            "n_chars_mismatch": F.count_if(
                F.col("n_chars") != F.length(F.col("text"))
            ),
        }),
    ]
    return reduce(lambda a, b: a.unionByName(b), parts)


@query(
    "dq_volume_anomaly_scan",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, count(*) AS n
            FROM events GROUP BY 1
        ),
        scored AS (
            SELECT day, n,
                   avg(n) OVER w AS mu,
                   stddev_samp(n) OVER w AS sigma,
                   count(*) OVER w AS n_window
            FROM daily
            WINDOW w AS (ORDER BY day
                         ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
        )
        SELECT day, CAST(n AS BIGINT) AS n,
               CAST(floor((n - mu) / sigma * 100 + 0.5) AS BIGINT)
                   AS zscore_bp
        FROM scored
        WHERE n_window = 7 AND sigma > 0
          AND abs(n - mu) / sigma > 1
    """,
)
def dq_volume_anomaly_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operational data-quality monitoring: daily ingest volume scored
    against its OWN trailing 7-day window (mean/stddev, current day
    excluded) — days whose z-score exceeds 1 are flagged (threshold chosen so the synthetic corpus actually trips it; production would use 2-3). The freshness/
    volume alarm every production pipeline runs next to the row-level
    expectations (dq_expectations_report).

    Scale: one keyed daily aggregate (map-side combined), then a window
    over the tiny daily series — the scoring cost is O(days), not
    O(events). The z-score is emitted in basis points via the shared
    floor convention so both engines hash identically."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count("*").alias("n")
    )
    w = Window.orderBy("day").rowsBetween(-7, -1)
    scored = daily.select(
        "day",
        "n",
        F.avg("n").over(w).alias("mu"),
        F.stddev_samp("n").over(w).alias("sigma"),
        F.count("*").over(w).alias("n_window"),
    )
    z = (F.col("n") - F.col("mu")) / F.col("sigma")
    return (
        scored.filter(
            (F.col("n_window") == 7)
            & (F.col("sigma") > 0)
            & (F.abs(z) > 1)
        )
        .select(
            "day",
            F.col("n").cast("long").alias("n"),
            F.floor(z * 100 + 0.5).cast("long").alias("zscore_bp"),
        )
    )


@query(
    "dq_referential_integrity_audit",
    oracle="""
        SELECT 'orders.o_custkey->customer' AS fk_edge,
               (SELECT count(*) FROM orders) AS n_child_rows,
               (SELECT count(*) FROM orders o
                LEFT JOIN customer c ON o.o_custkey = c.c_custkey
                WHERE c.c_custkey IS NULL) AS n_orphans
        UNION ALL
        SELECT 'lineitem.l_orderkey->orders',
               (SELECT count(*) FROM lineitem),
               (SELECT count(*) FROM lineitem l
                LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
                WHERE o.o_orderkey IS NULL)
        UNION ALL
        SELECT 'lineitem.l_partkey->part',
               (SELECT count(*) FROM lineitem),
               (SELECT count(*) FROM lineitem l
                LEFT JOIN part p ON l.l_partkey = p.p_partkey
                WHERE p.p_partkey IS NULL)
    """,
)
def dq_referential_integrity_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-table referential-integrity audit: orphan counts for each
    foreign-key edge of the star schema (child rows whose key has no
    parent) — the CROSS-table half of data quality that row-level
    expectations (dq_expectations_report) can't see, and the first
    thing to check when a join suddenly loses rows. Lakehouse formats
    don't enforce FKs (neither does the reference's warehouse — its
    silver layer would happily join orphans to nothing), so the audit
    IS the enforcement.

    Scale: each edge is one broadcast/shuffle anti-join counted with
    partial combine; parents project to their key column only, so the
    parent side of every edge is key-width regardless of table width.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey")

    def edge(name, child, key, parent, pkey):
        orphans = child.join(
            F.broadcast(parent), child[key] == parent[pkey], "left_anti"
        ).count()
        return (name, child.count(), orphans)

    rows = [
        edge(
            "orders.o_custkey->customer", orders, "o_custkey", cust,
            "c_custkey",
        ),
        edge(
            "lineitem.l_orderkey->orders",
            li,
            "l_orderkey",
            orders.select("o_orderkey"),
            "o_orderkey",
        ),
        edge(
            "lineitem.l_partkey->part", li, "l_partkey", part, "p_partkey"
        ),
    ]
    return spark.createDataFrame(
        rows, "fk_edge string, n_child_rows long, n_orphans long"
    )


@query(
    "dq_uniqueness_audit",
    oracle="""
        SELECT 'customer.c_custkey' AS key_column,
               (SELECT count(*) FROM customer) AS n_rows,
               (SELECT count(*) FROM (
                    SELECT c_custkey FROM customer
                    GROUP BY c_custkey HAVING count(*) > 1)) AS n_dup_keys
        UNION ALL
        SELECT 'events.event_id', (SELECT count(*) FROM events),
               (SELECT count(*) FROM (
                    SELECT event_id FROM events
                    GROUP BY event_id HAVING count(*) > 1))
        UNION ALL
        SELECT 'documents.doc_id', (SELECT count(*) FROM documents),
               (SELECT count(*) FROM (
                    SELECT doc_id FROM documents
                    GROUP BY doc_id HAVING count(*) > 1))
    """,
)
def dq_uniqueness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key uniqueness audit: duplicate-key counts for every
    declared key column. The reference's schema DECLARES email UNIQUE
    but nothing downstream ever verifies it (SURVEY.md §1.2/§5 trap —
    inference hid the constraint entirely); since lakehouse formats
    can't enforce PKs either, the periodic audit is the real
    constraint, and its output feeds the keyed-dedup remediation
    (silver_dedup_keyed).

    Scale: one partial-combined aggregation per key column — grouped on
    the key alone, so state is key-width; the HAVING filter ships only
    violating keys.
    """
    tables = [
        ("customer.c_custkey", "customer", "c_custkey"),
        ("events.event_id", "events", "event_id"),
        ("documents.doc_id", "documents", "doc_id"),
    ]
    rows = []
    for name, tbl, key in tables:
        df = load_table(spark, sf_dir, tbl)
        dups = (
            df.groupBy(key)
            .agg(F.count("*").alias("n"))
            .filter(F.col("n") > 1)
            .count()
        )
        rows.append((name, df.count(), dups))
    return spark.createDataFrame(
        rows, "key_column string, n_rows long, n_dup_keys long"
    )


@query(
    "dq_benford_first_digit",
    oracle="""
        WITH digits AS (
            SELECT CAST(substring(CAST(CAST(floor(o_totalprice)
                                            AS BIGINT)
                                       AS VARCHAR), 1, 1) AS INTEGER)
                       AS d
            FROM orders WHERE o_totalprice >= 1
        ),
        obs AS (
            SELECT d, count(*) AS n,
                   sum(count(*)) OVER () AS total
            FROM digits GROUP BY d
        )
        SELECT d, CAST(n AS BIGINT) AS n,
               CAST(floor(n * 10000.0 / total + 0.5) AS BIGINT)
                   AS observed_bp,
               CAST(floor(log10(1.0 + 1.0 / d) * 10000 + 0.5) AS BIGINT)
                   AS benford_bp,
               CAST(abs(floor(n * 10000.0 / total + 0.5)
                        - floor(log10(1.0 + 1.0 / d) * 10000 + 0.5))
                    AS BIGINT) AS abs_dev_bp
        FROM obs
    """,
)
def dq_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order totals: observed
    leading-digit frequencies vs the log10(1+1/d) expectation, with
    per-digit deviation — the classic forensic screen for fabricated or
    systematically constrained numeric data (TPC-H totals are uniform-
    ish sums, so they deviate measurably: the audit DETECTS synthetic
    data here, which is the point of running it on a generated corpus).

    Scale: first digit is a row-local string op; the aggregation has
    nine groups. The global-total window runs over nine rows.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") >= 1
    )
    d = F.substring(
        F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
    ).cast("int")
    obs = orders.select(d.alias("d")).groupBy("d").agg(
        F.count("*").alias("n")
    )
    from pyspark.sql import Window as W

    total = F.sum("n").over(W.partitionBy())
    observed_bp = F.floor(F.col("n") * 10000.0 / F.col("total") + 0.5)
    benford_bp = F.floor(
        F.log10(1.0 + 1.0 / F.col("d")) * 10000 + 0.5
    )
    return (
        obs.withColumn("total", total)
        .select(
            "d",
            F.col("n").cast("long").alias("n"),
            observed_bp.cast("long").alias("observed_bp"),
            benford_bp.cast("long").alias("benford_bp"),
            F.abs(observed_bp - benford_bp)
            .cast("long")
            .alias("abs_dev_bp"),
        )
    )


@query(
    "dq_order_total_reconciliation",
    oracle="""
        WITH derived AS (
            SELECT l_orderkey,
                   sum(CAST(floor(l_extendedprice * (1 - l_discount)
                                  * (1 + l_tax) * 100 + 0.5) AS BIGINT))
                       AS calc_cents
            FROM lineitem GROUP BY 1
        ),
        joined AS (
            SELECT o.o_orderkey,
                   abs(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)
                       - d.calc_cents) AS diff_cents
            FROM orders o JOIN derived d ON o.o_orderkey = d.l_orderkey
        )
        SELECT (SELECT count(*) FROM orders) AS n_orders,
               count(*) AS n_with_lines,
               (SELECT count(*) FROM orders o
                LEFT JOIN derived d ON o.o_orderkey = d.l_orderkey
                WHERE d.l_orderkey IS NULL) AS n_childless,
               count(*) FILTER (diff_cents > 1) AS n_mismatched,
               CAST(max(diff_cents) AS BIGINT) AS max_diff_cents
        FROM joined
    """,
)
def dq_order_total_reconciliation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Financial reconciliation audit: re-derive each order's total from
    its line items (TPC-H's own pricing identity: extended price net of
    discount, plus tax) and count orders whose header disagrees, plus
    headers with no lines at all. On THIS corpus the audit fires on
    every order — the driver's generator doesn't maintain the identity
    — which is exactly the audit's value: it detects that the "totals"
    are synthetic, the same way the Benford screen does, and on a real
    warehouse it would catch partial loads and double-applied discounts.

    Scale: one keyed partial-combined aggregation over lineitem (the
    big side touched once), then a key-width join against order
    headers; the childless check reuses the derived relation as an
    anti-join probe.

    Cross-engine determinism (ADVICE r3): each line's charge is
    integerized to cents BEFORE summing — float summation is
    non-associative and Spark's partial-agg order nondeterministic, so
    summing doubles then flooring could flip a boundary vs DuckDB (or
    between runs). Summing identical per-row integers is exact in both
    engines; the per-row product is a single deterministic IEEE
    expression with identical operand order in both SQL dialects.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    derived = li.groupBy(F.col("l_orderkey").alias("okey")).agg(
        F.sum(
            F.floor(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
                * 100
                + 0.5
            ).cast("long")
        ).alias("calc_cents")
    )
    joined = orders.join(
        derived, orders.o_orderkey == derived.okey
    ).select(
        F.abs(
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
            - F.col("calc_cents")
        ).alias("diff_cents")
    )
    n_orders = orders.count()
    n_childless = orders.join(
        derived, orders.o_orderkey == derived.okey, "left_anti"
    ).count()
    agg = joined.agg(
        F.count("*").alias("n_with_lines"),
        F.count_if(F.col("diff_cents") > 1).alias("n_mismatched"),
        F.max("diff_cents").alias("max_diff_cents"),
    ).first()
    return spark.createDataFrame(
        [
            (
                n_orders,
                agg["n_with_lines"],
                n_childless,
                agg["n_mismatched"],
                agg["max_diff_cents"],
            )
        ],
        "n_orders long, n_with_lines long, n_childless long,"
        " n_mismatched long, max_diff_cents long",
    )


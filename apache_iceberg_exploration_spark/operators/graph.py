"""Distributed graph analytics over relational-derived graphs.

The reference has no graph surface at all; a training-data platform
needs one the moment dedup clusters, citation/link graphs, or entity
graphs appear (SURVEY.md north-star: dedup_cluster_assignment already
does connected components — this module adds the other two staples,
PageRank and triangle counting).

Graph source: the supplier CO-SUPPLY graph derived from
``lineitem`` — suppliers are connected when they supply the same order
(weight = number of shared orders). The derivation is itself the
standard relational→graph projection (a self-join on the shared
container key), so everything here is plain DataFrame ops Catalyst can
optimize; no graph runtime needed.

Oracle strategy: both algorithms run a FIXED budget (3 PageRank
iterations; one triangle pass over a top-K-sparsified graph), all
arithmetic integer, so the DuckDB oracle reproduces every value
bit-exactly — the same unrolled-CTE pattern proven on ann_kmeans_cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.caching import scoped_persist
from ..registry import query
from ..sources.io import load_table

PR_ITERS = 3
PR_SCALE = 1_000_000_000  # ranks in parts-per-billion (integer-exact)
TRI_TOPK = 8  # degree bound for the sparsified triangle graph


_EDGES_SQL = """
    os AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
    edges AS (
        SELECT a.l_suppkey AS src, b.l_suppkey AS dst,
               count(*) AS w
        FROM os a
        JOIN os b ON a.l_orderkey = b.l_orderkey
                 AND a.l_suppkey <> b.l_suppkey
        GROUP BY 1, 2
    )
"""


def pagerank_oracle_ctes(edges_cte: str) -> list[str]:
    """Unrolled fixed-iteration PageRank in generated CTEs (the SQL
    twin of ``pagerank_integer``), appended after the caller-supplied
    ``edges`` CTE — shared by the co-supply oracle here and the
    TextRank oracle in operators/text.py. All integer: ranks live in
    parts-per-billion; per-edge contribution is ``rank * w // wtot``
    (floor), the damping update is ``(15*base + 85*incoming) // 100``
    — both engines do exact BIGINT arithmetic, so the hash matches to
    the last unit. The final rank relation is ``r{PR_ITERS}``."""
    ctes = [
        edges_cte.strip(),
        "wsum AS (SELECT src, CAST(sum(w) AS BIGINT) AS wtot"
        " FROM edges GROUP BY 1)",
        "nodes AS (SELECT DISTINCT src AS node FROM edges)",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        f"r0 AS (SELECT node, {PR_SCALE} // (SELECT n FROM nn) AS r"
        " FROM nodes)",
    ]
    for i in range(1, PR_ITERS + 1):
        ctes.append(f"""i{i} AS (
            SELECT e.dst AS node,
                   CAST(sum((r.r * e.w) // s.wtot) AS BIGINT) AS inc
            FROM edges e
            JOIN r{i - 1} r ON e.src = r.node
            JOIN wsum s ON e.src = s.src
            GROUP BY 1
        )""")
        ctes.append(f"""r{i} AS (
            SELECT n.node,
                   (15 * ({PR_SCALE} // (SELECT n FROM nn))
                    + 85 * coalesce(i.inc, 0)) // 100 AS r
            FROM nodes n LEFT JOIN i{i} i ON n.node = i.node
        )""")
    return ctes


def _pagerank_oracle() -> str:
    ctes = pagerank_oracle_ctes(_EDGES_SQL)
    return f"""
        WITH {",".join(ctes)}
        SELECT node AS suppkey, CAST(r AS BIGINT) AS rank_ppb
        FROM r{PR_ITERS}
    """


@query("graph_pagerank_cosupply", oracle=_pagerank_oracle())
def graph_pagerank_cosupply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (damping 0.85, {PR_ITERS} iterations) over the
    supplier co-supply graph — "which suppliers sit at the center of the
    fulfilment network". Pregel-as-iterated-join: each iteration is one
    equi-join of the edge list with the current rank vector plus one
    keyed aggregation; no graph runtime, no driver-side adjacency.

    Integer arithmetic end-to-end (ranks in parts-per-billion,
    floor-division contributions) so the unrolled-CTE DuckDB oracle is
    bit-exact — the ann_kmeans_cells pattern applied to a graph
    fixpoint.

    Scale: the edge list (E rows) stays partitioned; the rank vector is
    O(V) and broadcast per iteration while it fits (here: thousands of
    suppliers → KBs), degrading to a keyed shuffle join when V is large
    — exactly GraphX/Pregel's cost model. Edge derivation is a
    self-join on the order key whose pair expansion is Σ|order|², the
    same bounded-block argument as the dedup blocking joins (cap heavy
    containers upstream like dedup_jaccard_df_capped when container
    sizes are unbounded). The co-supply graph is symmetric, so every
    node has out-degree ≥ 1 and no dangling-mass redistribution term is
    needed; a directed-graph variant adds the standard dangling sum per
    iteration.
    """
    li = load_table(spark, sf_dir, "lineitem")
    os_ = li.select("l_orderkey", "l_suppkey").distinct()
    a, b = os_.alias("a"), os_.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") != F.col("b.l_suppkey")),
        )
        .groupBy(
            F.col("a.l_suppkey").alias("src"),
            F.col("b.l_suppkey").alias("dst"),
        )
        .agg(F.count("*").alias("w"))
    )
    ranks = pagerank_integer(edges)
    return ranks.select(
        F.col("node").alias("suppkey"), F.col("r").alias("rank_ppb")
    )


def pagerank_integer(
    edges: DataFrame, iters: int = PR_ITERS, scale: int = PR_SCALE
) -> DataFrame:
    """Integer-exact weighted PageRank kernel over (src, dst, w) edges
    (node ids of any joinable type — supplier keys here, word strings
    for the TextRank view in operators/text.py). Ranks in 1/``scale``
    units; per-edge contribution ``(r*w) div wtot``; damping update
    ``(15·base + 85·inc) div 100``. Returns (node, r)."""
    wsum = edges.groupBy("src").agg(F.sum("w").cast("long").alias("wtot"))
    # (src, dst, w, wtot): the loop-invariant edge relation — persisted so
    # the expensive pair-expansion join runs once, not once per iteration.
    edges_n = scoped_persist(edges.join(wsum, "src"))
    nodes = scoped_persist(edges.select(F.col("src").alias("node")).distinct())

    n = nodes.count()  # one scalar to the driver: |V|, needed as a literal
    base = scale // n
    ranks = nodes.select("node", F.lit(base).cast("long").alias("r"))
    for _ in range(iters):
        inc = (
            edges_n.join(F.broadcast(ranks), edges_n.src == ranks.node)
            .select(
                F.col("dst").alias("node"),
                F.expr("(r * w) div wtot").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").cast("long").alias("inc"))
        )
        ranks = nodes.join(inc, "node", "left").select(
            "node",
            F.expr(
                f"({15 * base} + 85 * coalesce(inc, 0)) div 100"
            ).cast("long").alias("r"),
        )
    return ranks


def _triangle_oracle() -> str:
    return f"""
        WITH {_EDGES_SQL.strip()},
        ranked AS (
            SELECT src AS u, dst AS v,
                   row_number() OVER (PARTITION BY src
                                      ORDER BY w DESC, dst) AS rn
            FROM edges
        ),
        topk AS (SELECT u, v FROM ranked WHERE rn <= {TRI_TOPK}),
        mutual AS (
            SELECT a.u, a.v
            FROM topk a JOIN topk b ON a.u = b.v AND a.v = b.u
            WHERE a.u < a.v
        ),
        tri AS (
            SELECT e1.u AS a, e1.v AS b, e2.v AS c
            FROM mutual e1
            JOIN mutual e2 ON e1.u = e2.u AND e1.v < e2.v
            JOIN mutual e3 ON e3.u = e1.v AND e3.v = e2.v
        ),
        corners AS (
            SELECT a AS node FROM tri
            UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri
        )
        SELECT n.node AS suppkey,
               CAST(coalesce(t.cnt, 0) AS BIGINT) AS n_triangles
        FROM (SELECT u AS node FROM mutual
              UNION SELECT v FROM mutual) n
        LEFT JOIN (SELECT node, count(*) AS cnt FROM corners GROUP BY 1) t
          ON n.node = t.node
    """


@query("graph_triangle_count_topk", oracle=_triangle_oracle())
def graph_triangle_count_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counting over the MUTUAL-TOP-K sparsified
    co-supply graph: each supplier keeps its {TRI_TOPK} strongest
    co-supply edges (weight desc, id tiebreak), an edge survives only if
    BOTH endpoints kept it, and triangles are enumerated on that
    bounded-degree graph. Triangle membership is the classic cohesion
    signal (community strength, clustering coefficient numerator).

    The sparsification IS the scale story: the raw co-supply graph is
    near-complete at small corpus sizes (Σ wedges ≈ V·deg² explodes),
    while mutual-top-K caps every degree at K, so the wedge join is at
    most V·K² rows no matter how dense co-occurrence gets — the standard
    kNN-graph trick. Enumeration uses the ordered-triple form
    (u < v < w via edge orientation) so each triangle is generated
    exactly once, no /6 correction and no symmetric blowup. Deterministic
    top-K (weight desc, neighbor asc) keeps the DuckDB oracle bit-exact.
    """
    mutual = _mutual_topk_graph(spark, sf_dir)
    corners = _triangle_corners(mutual)
    nodes = (
        mutual.select(F.col("u").alias("node"))
        .union(mutual.select(F.col("v").alias("node")))
        .distinct()
    )
    return nodes.join(corners, "node", "left").select(
        F.col("node").alias("suppkey"),
        F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("n_triangles"),
    )


def _mutual_topk_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual-top-K sparsified co-supply graph as canonical (u < v)
    undirected edges, persisted (both triangle enumeration and the
    degree census re-read it)."""
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    os_ = li.select("l_orderkey", "l_suppkey").distinct()
    a, b = os_.alias("a"), os_.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") != F.col("b.l_suppkey")),
        )
        .groupBy(
            F.col("a.l_suppkey").alias("u"),
            F.col("b.l_suppkey").alias("v"),
        )
        .agg(F.count("*").alias("w"))
    )
    topk = (
        edges.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("u").orderBy(F.col("w").desc(), F.col("v"))
            ),
        )
        .filter(F.col("rn") <= TRI_TOPK)
        .select("u", "v")
    )
    ta, tb = topk.alias("ta"), topk.alias("tb")
    return scoped_persist(
        ta.join(
            tb,
            (F.col("ta.u") == F.col("tb.v")) & (F.col("ta.v") == F.col("tb.u")),
        )
        .filter(F.col("ta.u") < F.col("ta.v"))
        .select(F.col("ta.u").alias("u"), F.col("ta.v").alias("v"))
    )


def _triangle_corners(mutual: DataFrame) -> DataFrame:
    """(node, cnt): triangles incident to each node, from the ordered-
    triple enumeration (each triangle counted once per corner)."""
    e1, e2, e3 = mutual.alias("e1"), mutual.alias("e2"), mutual.alias("e3")
    tri = (
        e1.join(
            e2,
            (F.col("e1.u") == F.col("e2.u")) & (F.col("e1.v") < F.col("e2.v")),
        )
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.v")) & (F.col("e3.v") == F.col("e2.v")),
        )
        .select(
            F.col("e1.u").alias("a"),
            F.col("e1.v").alias("b"),
            F.col("e2.v").alias("c"),
        )
    )
    return (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("cnt"))
    )


LP_TOPN = 20


def _link_prediction_oracle() -> str:
    return f"""
        WITH {_EDGES_SQL.strip()},
        ranked AS (
            SELECT src AS u, dst AS v,
                   row_number() OVER (PARTITION BY src
                                      ORDER BY w DESC, dst) AS rn
            FROM edges
        ),
        topk AS (SELECT u, v FROM ranked WHERE rn <= {TRI_TOPK}),
        mutual AS (
            SELECT a.u, a.v
            FROM topk a JOIN topk b ON a.u = b.v AND a.v = b.u
            WHERE a.u < a.v
        ),
        adj AS (
            SELECT u, v FROM mutual UNION ALL SELECT v, u FROM mutual
        ),
        cand AS (
            SELECT a.u AS u, b.v AS v, count(*) AS common_neighbors
            FROM adj a JOIN adj b ON a.v = b.u AND a.u < b.v
            GROUP BY 1, 2
        ),
        novel AS (
            SELECT c.u, c.v, c.common_neighbors
            FROM cand c LEFT JOIN mutual m ON c.u = m.u AND c.v = m.v
            WHERE m.u IS NULL
        )
        SELECT u AS supp_a, v AS supp_b, common_neighbors, rank
        FROM (
            SELECT u, v, common_neighbors,
                   row_number() OVER (ORDER BY common_neighbors DESC, u, v)
                       AS rank
            FROM novel
        )
        WHERE rank <= {LP_TOPN}
    """


@query("graph_link_prediction_common_neighbors", oracle=_link_prediction_oracle())
def graph_link_prediction_common_neighbors(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Link prediction by common-neighbor counting on the mutual-top-K
    co-supply graph: for every NON-adjacent supplier pair reachable
    through a shared neighbor, count the shared neighbors and rank the
    top-{LP_TOPN} predicted links — "suppliers likely to co-fulfil
    next", the classic structural recommendation primitive (the
    Jaccard/Adamic-Adar family's counting core).

    Scale: the candidate generator is the SAME bounded wedge join as
    triangle counting (≤ V·K² rows thanks to the degree cap), the
    adjacency anti-join removes known edges, and the top-N plans as
    TakeOrdered. Common-neighbor counting and triangle counting are one
    join apart — the wedge closes into a triangle vs stays open as a
    prediction — so both inherit the sparsification's cost bound.
    """
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    os_ = li.select("l_orderkey", "l_suppkey").distinct()
    a, b = os_.alias("a"), os_.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") != F.col("b.l_suppkey")),
        )
        .groupBy(
            F.col("a.l_suppkey").alias("u"),
            F.col("b.l_suppkey").alias("v"),
        )
        .agg(F.count("*").alias("w"))
    )
    topk = (
        edges.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("u").orderBy(F.col("w").desc(), F.col("v"))
            ),
        )
        .filter(F.col("rn") <= TRI_TOPK)
        .select("u", "v")
    )
    ta, tb = topk.alias("ta"), topk.alias("tb")
    mutual = scoped_persist(
        ta.join(
            tb,
            (F.col("ta.u") == F.col("tb.v")) & (F.col("ta.v") == F.col("tb.u")),
        )
        .filter(F.col("ta.u") < F.col("ta.v"))
        .select(F.col("ta.u").alias("u"), F.col("ta.v").alias("v"))
    )
    adj = mutual.unionAll(
        mutual.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    aa, ab = adj.alias("aa"), adj.alias("ab")
    cand = (
        aa.join(
            ab,
            (F.col("aa.v") == F.col("ab.u")) & (F.col("aa.u") < F.col("ab.v")),
        )
        .groupBy(
            F.col("aa.u").alias("u"),
            F.col("ab.v").alias("v"),
        )
        .agg(F.count("*").alias("common_neighbors"))
    )
    novel = cand.join(mutual, ["u", "v"], "left_anti")
    # top-N first (TakeOrderedAndProject — distributed heads, no single-
    # partition sort), THEN the rank window over the N survivors; the
    # candidate-pair relation is unbounded at scale, so ranking before
    # limiting would funnel it through one WindowExec task.
    ranked = (
        novel.orderBy(F.col("common_neighbors").desc(), "u", "v")
        .limit(LP_TOPN)
        .withColumn(
            "rank",
            F.row_number().over(
                W.orderBy(F.col("common_neighbors").desc(), "u", "v")
            ),
        )
    )
    return ranked.select(
        F.col("u").alias("supp_a"),
        F.col("v").alias("supp_b"),
        "common_neighbors",
        "rank",
    )


def _clustering_coeff_oracle() -> str:
    return f"""
        WITH {_EDGES_SQL.strip()},
        ranked AS (
            SELECT src AS u, dst AS v,
                   row_number() OVER (PARTITION BY src
                                      ORDER BY w DESC, dst) AS rn
            FROM edges
        ),
        topk AS (SELECT u, v FROM ranked WHERE rn <= {TRI_TOPK}),
        mutual AS (
            SELECT a.u, a.v
            FROM topk a JOIN topk b ON a.u = b.v AND a.v = b.u
            WHERE a.u < a.v
        ),
        adj AS (
            SELECT u, v FROM mutual UNION ALL SELECT v, u FROM mutual
        ),
        deg AS (SELECT u AS node, count(*) AS deg FROM adj GROUP BY 1),
        tri AS (
            SELECT e1.u AS a, e1.v AS b, e2.v AS c
            FROM mutual e1
            JOIN mutual e2 ON e1.u = e2.u AND e1.v < e2.v
            JOIN mutual e3 ON e3.u = e1.v AND e3.v = e2.v
        ),
        corners AS (
            SELECT a AS node FROM tri
            UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri
        ),
        tcnt AS (SELECT node, count(*) AS cnt FROM corners GROUP BY 1)
        SELECT d.node AS suppkey,
               CAST(d.deg AS BIGINT) AS degree,
               CAST(coalesce(t.cnt, 0) AS BIGINT) AS n_triangles,
               CAST(CASE WHEN d.deg >= 2
                    THEN (coalesce(t.cnt, 0) * 2 * 10000)
                         // (d.deg * (d.deg - 1))
                    ELSE 0 END AS BIGINT) AS coeff_bp
        FROM deg d LEFT JOIN tcnt t ON d.node = t.node
    """


@query("graph_clustering_coefficient", oracle=_clustering_coeff_oracle())
def graph_clustering_coefficient(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Local clustering coefficient per supplier on the mutual-top-K
    co-supply graph: C(v) = 2·tri(v) / (deg(v)·(deg(v)−1)) — the
    fraction of v's neighbor pairs that are themselves connected, the
    standard community-cohesion score built on the triangle census
    (`graph_triangle_count_topk` reports the numerator; this closes
    the ratio with the degree census over the SAME sparsified graph,
    so both queries share the `_mutual_topk_graph` kernel).

    Coefficient in integer basis points — (2·tri·10⁴) div (deg·(deg−1))
    — exact BIGINT in both engines; deg < 2 reports 0 (no wedge).

    Scale: the top-K sparsification caps degree at K, so the wedge
    denominator is bounded and the triangle join is ≤ V·K² — the same
    budget as the triangle query; degree census is one extra groupBy
    over the persisted mutual edges.
    """
    mutual = _mutual_topk_graph(spark, sf_dir)
    adj = mutual.select("u", "v").unionAll(
        mutual.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = adj.groupBy(F.col("u").alias("node")).agg(
        F.count("*").alias("degree")
    )
    corners = _triangle_corners(mutual)
    return deg.join(corners, "node", "left").select(
        F.col("node").alias("suppkey"),
        F.col("degree").cast("long").alias("degree"),
        F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("n_triangles"),
        F.when(
            F.col("degree") >= 2,
            F.expr(
                "(coalesce(cnt, 0) * 2 * 10000)"
                " div (degree * (degree - 1))"
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("coeff_bp"),
    )


def _assortativity_oracle() -> str:
    return f"""
        WITH {_EDGES_SQL.strip()},
        ranked AS (
            SELECT src AS u, dst AS v,
                   row_number() OVER (PARTITION BY src
                                      ORDER BY w DESC, dst) AS rn
            FROM edges
        ),
        topk AS (SELECT u, v FROM ranked WHERE rn <= {TRI_TOPK}),
        mutual AS (
            SELECT a.u, a.v
            FROM topk a JOIN topk b ON a.u = b.v AND a.v = b.u
            WHERE a.u < a.v
        ),
        adj AS (
            SELECT u, v FROM mutual UNION ALL SELECT v, u FROM mutual
        ),
        deg AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS d
                FROM adj GROUP BY 1),
        ep AS (
            SELECT da.d AS x, db.d AS y
            FROM adj JOIN deg da ON adj.u = da.node
                     JOIN deg db ON adj.v = db.node
        ),
        mom AS (
            SELECT count(*) AS n,
                   sum(CAST(x AS DECIMAL(38,0))) AS sx,
                   sum(CAST(y AS DECIMAL(38,0))) AS sy,
                   sum(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
                   sum(CAST(y AS DECIMAL(38,0)) * y) AS syy,
                   sum(CAST(x AS DECIMAL(38,0)) * y) AS sxy
            FROM ep
        )
        SELECT CAST(n AS BIGINT) AS n_endpoints,
               round(
                   (n * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / sqrt((n * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * (n * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
                   6) + 0.0 AS assortativity_r6
        FROM mom
    """


@query("graph_degree_assortativity", oracle=_assortativity_oracle())
def graph_degree_assortativity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Degree assortativity of the mutual-top-K co-supply graph: the
    Pearson correlation of endpoint degrees over all directed edge
    occurrences (Newman 2002) — positive means hubs link hubs (social
    shape), negative means hubs serve the periphery (infrastructure
    shape); the one-number summary that, with clustering coefficient
    and triangles, completes the standard graph-topology report.

    Uses the exact-moment correlation discipline
    (`stats_correlation_matrix_exact`): degree sums and cross-products
    in DECIMAL(38,0), correlation derived once in identical doubles,
    rounded to 6.

    Scale: two joins of the edge list against the degree relation
    (broadcast — one row per node) + one constant-state moment
    aggregate; degree is capped by the top-K sparsification, so the
    moments can't overflow DECIMAL(38) at any SF.
    """
    mutual = _mutual_topk_graph(spark, sf_dir)
    adj = mutual.select("u", "v").unionAll(
        mutual.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = adj.groupBy(F.col("u").alias("node")).agg(
        F.count("*").cast("long").alias("d")
    )
    ep = (
        adj.join(
            F.broadcast(deg.withColumnRenamed("node", "u")).withColumnRenamed(
                "d", "x"
            ),
            "u",
        )
        .join(
            F.broadcast(deg.withColumnRenamed("node", "v")).withColumnRenamed(
                "d", "y"
            ),
            "v",
        )
        .select("x", "y")
    )
    dec = "decimal(38,0)"
    mom = ep.agg(
        F.count("*").alias("n"),
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast(dec) * F.col("y")).alias("syy"),
        F.sum(F.col("x").cast(dec) * F.col("y")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    r = (nd * sxy - sx * sy) / F.sqrt(
        (nd * sxx - sx * sx) * (nd * syy - sy * sy)
    )
    return mom.select(
        F.col("n").cast("long").alias("n_endpoints"),
        (F.round(r, 6) + 0.0).alias("assortativity_r6"),
    )


DISPARITY_ALPHA = "0.05"


def _backbone_oracle() -> str:
    return f"""
        WITH {_EDGES_SQL.strip()},
        deg AS (
            SELECT src, CAST(count(*) AS BIGINT) AS k,
                   CAST(sum(w) AS BIGINT) AS s
            FROM edges GROUP BY 1
        ),
        scored AS (
            SELECT e.src, e.dst, e.w,
                   CASE WHEN d.k > 1 THEN
                       pow(1.0 - CAST(e.w AS DOUBLE) / d.s, d.k - 1.0)
                   ELSE 0.0 END AS p
            FROM edges e JOIN deg d ON e.src = d.src
        ),
        flagged AS (
            SELECT src, dst, w,
                   p < {DISPARITY_ALPHA}::DOUBLE AS significant
            FROM scored
        )
        SELECT CAST(count(*) AS BIGINT) AS n_edges,
               CAST(sum(CASE WHEN significant THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_backbone,
               CAST(sum(CASE WHEN significant THEN 1 ELSE 0 END)
                    AS BIGINT) * 10000 // count(*) AS backbone_bp,
               CAST(sum(CASE WHEN significant THEN w ELSE 0 END)
                    AS BIGINT) * 10000 // CAST(sum(w) AS BIGINT)
                   AS weight_retained_bp
        FROM flagged
    """


@query("graph_backbone_disparity_filter", oracle=_backbone_oracle())
def graph_backbone_disparity_filter(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Disparity-filter backbone extraction (Serrano et al., PNAS'09)
    on the co-supply graph: an edge survives when its weight share is
    statistically significant against the uniform null for its source
    node — p = (1 − w/sᵢ)^(kᵢ−1) < α — the principled alternative to
    a global weight threshold (which erases low-degree nodes' locally
    dominant edges). Reports edge retention and how much total weight
    the backbone keeps — the sparsification dial BEFORE running the
    heavier graph algorithms on a dense co-occurrence graph.

    p is one identical double expression of exact integers (pow with
    integer exponent base); the verdict is a threshold compare.

    Scale: degree/strength is one keyed aggregate; scoring is a
    broadcast join; the same edge-derivation bound as PageRank.
    """
    li = load_table(spark, sf_dir, "lineitem")
    os_ = li.select("l_orderkey", "l_suppkey").distinct()
    a, b = os_.alias("a"), os_.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") != F.col("b.l_suppkey")),
        )
        .groupBy(
            F.col("a.l_suppkey").alias("src"),
            F.col("b.l_suppkey").alias("dst"),
        )
        .agg(F.count("*").alias("w"))
    )
    deg = edges.groupBy("src").agg(
        F.count("*").cast("long").alias("k"),
        F.sum("w").cast("long").alias("s"),
    )
    scored = edges.join(F.broadcast(deg), "src").select(
        "src",
        "dst",
        "w",
        F.when(
            F.col("k") > 1,
            F.pow(
                1.0 - F.col("w").cast("double") / F.col("s"),
                F.col("k").cast("double") - 1.0,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("p"),
    )
    sig = F.col("p") < float(DISPARITY_ALPHA)
    return scored.agg(
        F.count("*").cast("long").alias("n_edges"),
        F.sum(F.when(sig, 1).otherwise(0)).cast("long").alias(
            "n_backbone"
        ),
        F.expr(
            f"CAST(sum(CASE WHEN p < {DISPARITY_ALPHA}D THEN 1 ELSE 0 END)"
            " AS BIGINT) * 10000 div count(*)"
        ).alias("backbone_bp"),
        F.expr(
            f"CAST(sum(CASE WHEN p < {DISPARITY_ALPHA}D THEN w ELSE 0 END)"
            " AS BIGINT) * 10000 div CAST(sum(w) AS BIGINT)"
        ).alias("weight_retained_bp"),
    )

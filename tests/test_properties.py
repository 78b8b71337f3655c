"""Property-based tests (hypothesis): cross-engine hash parity over
arbitrary strings, chunking reconstruction, and merge upsert semantics
over randomized tables. Few examples with batched payloads — each
example pays a Spark job, so the strategy packs many values per run."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from apache_iceberg_exploration_spark.functions.hashing import (
    hash64,
    hash64_sql,
    seeded_md5,
    seeded_md5_sql,
)
from apache_iceberg_exploration_spark.sources.lakehouse import LakehouseTable

# printable-ish strings incl. unicode, no surrogates
_texts = st.lists(
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FFF),
        min_size=0,
        max_size=40,
    ),
    min_size=1,
    max_size=50,
)


@settings(max_examples=8, deadline=None)
@given(_texts)
def test_hash64_cross_engine_parity(spark, texts):
    sdf = spark.createDataFrame([(t,) for t in texts], "s string")
    svals = [
        (r.h, r.m)
        for r in sdf.select(
            hash64("s").alias("h"), seeded_md5("s", 3).alias("m")
        ).collect()
    ]
    con = duckdb.connect()
    dvals = [
        con.execute(
            f"SELECT {hash64_sql('?')}, {seeded_md5_sql('?', '3')}", [t, t]
        ).fetchone()
        for t in texts
    ]
    assert svals == [tuple(d) for d in dvals]


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abcdefg ", min_size=1, max_size=120), min_size=1, max_size=12
    )
)
def test_chunking_reconstructs_documents(spark, docs):
    """Dropping each chunk's overlap prefix (after the first) and
    concatenating must reproduce the original token stream."""
    from apache_iceberg_exploration_spark.operators.text import _CHUNK, _OVERLAP
    from apache_iceberg_exploration_spark.operators import text as text_ops

    rows = [
        (i, d, "en", "src", len(d)) for i, d in enumerate(docs) if d.strip()
    ]
    if not rows:
        return
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )

    # reuse the query's plan on an in-memory table via monkeypatched loader
    import apache_iceberg_exploration_spark.operators.text as m

    orig = m.load_table
    m.load_table = lambda _s, _d, _n: df
    try:
        out = m.document_chunking(spark, "ignored").collect()
    finally:
        m.load_table = orig

    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, text, *_ in rows:
        words = text.split(" ")
        chunks = sorted(by_doc[doc_id], key=lambda r: r.chunk_idx)
        rebuilt = []
        for i, ch in enumerate(chunks):
            toks = ch.chunk_text.split(" ") if ch.chunk_text else []
            rebuilt.extend(toks if i == 0 else toks[_OVERLAP:])
        assert rebuilt == words, (doc_id, rebuilt, words)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 20), st.integers(0, 1000)), min_size=1, max_size=30),
    st.lists(st.tuples(st.integers(0, 30), st.integers(0, 1000)), min_size=1, max_size=30),
)
def test_merge_semantics_match_python_model(spark, tmp_path_factory, base, updates):
    """lakehouse merge_into ≡ dict-based upsert for arbitrary key/value
    multisets (last-dedup-wins on key, update overwrites, insert adds)."""
    base = list({k: v for k, v in base}.items())  # unique keys
    updates = list({k: v for k, v in updates}.items())
    tbl = LakehouseTable(
        spark, str(tmp_path_factory.mktemp("prop") / "t")
    )
    tbl.overwrite(spark.createDataFrame(base, "k long, v long"))
    src = spark.createDataFrame(updates, "k long, v long")
    tbl.merge_into(src, on=["k"], update_cols={"v": F.col("s.v")})

    model = dict(base)
    model.update(dict(updates))
    got = {r.k: r.v for r in tbl.read().collect()}
    assert got == model


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(-1000, 1000), st.integers(0, 10**6)),
        min_size=2,
        max_size=40,
        unique=True,
    )
)
def test_zorder_interleave_is_injective(spark, tmp_path_factory, pairs):
    """The Morton z-value must distinguish every pair of distinct
    quantization cells: distinct (qx, qy) buckets ⇒ distinct z — the
    property file-range pruning correctness rests on."""
    tbl = LakehouseTable(
        spark, str(tmp_path_factory.mktemp("zprop") / "t")
    )
    df = spark.createDataFrame(pairs, "x long, y long")
    z = tbl._zorder_column(df, ["x", "y"])
    rows = df.select("x", "y", z.alias("z")).collect()
    # recompute each row's quantization cell exactly as _zorder_column does
    xs = [r.x for r in rows]
    ys = [r.y for r in rows]
    import math

    def cell(v, lo, hi):
        span = (hi - lo) or 1.0
        return min(math.floor((v - lo) / span * 65535.0), 65535)

    cells = {}
    for r in rows:
        q = (cell(r.x, min(xs), max(xs)), cell(r.y, min(ys), max(ys)))
        if q in cells:
            assert cells[q] == r.z  # same cell -> same z
        else:
            cells[q] = r.z
    zs = list(cells.values())
    assert len(set(zs)) == len(zs)  # distinct cells -> distinct z


def test_bloom_no_false_negatives(spark, tmp_path):
    """Property: every value actually present in an indexed file must
    pass its bloom test (false positives allowed, false negatives
    never)."""
    from apache_iceberg_exploration_spark.sources.lakehouse import (
        LakehouseTable,
    )

    tbl = LakehouseTable(spark, str(tmp_path / "t"))
    vals = [(i * 37 + 11, f"s{i}") for i in range(200)]
    tbl.overwrite(
        spark.createDataFrame(vals, "k long, s string").coalesce(1)
    )
    tbl.add_bloom_filters(["k", "s"])
    f = tbl._read_manifest(tbl.current_version())["files"][0]
    for k, s in vals:
        assert tbl._bloom_may_contain(f, "k", k)
        assert tbl._bloom_may_contain(f, "s", s)
    # sanity: absent values are mostly excluded (not a correctness
    # requirement, but an all-True bloom would be useless)
    misses = sum(
         not tbl._bloom_may_contain(f, "k", 10_000_000 + i)
        for i in range(100)
    )
    assert misses > 90


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 1000)),
        min_size=1,
        max_size=30,
    ),
    st.integers(0, 25),
)
def test_cow_and_mor_update_agree(spark, tmp_path_factory, rows, cutoff):
    """The same UPDATE statement through copy-on-write (update_where) and
    merge-on-read (update_where_mor) must produce identical tables for
    arbitrary key/value multisets and an arbitrary predicate cutoff —
    the two write strategies are storage trades, never semantic ones."""
    base = list({k: v for k, v in rows}.items())  # unique keys
    root = tmp_path_factory.mktemp("prop_upd")
    cond = F.col("k") <= cutoff
    results = []
    for mode in ("cow", "mor"):
        tbl = LakehouseTable(spark, str(root / mode))
        tbl.overwrite(spark.createDataFrame(base, "k long, v long"))
        if mode == "cow":
            tbl.update_where(cond, set_cols={"v": F.col("v") + 7})
        else:
            tbl.update_where_mor(
                cond, keys=["k"], set_cols={"v": F.col("v") + 7}
            )
        results.append({r.k: r.v for r in tbl.read().collect()})
    model = {k: (v + 7 if k <= cutoff else v) for k, v in base}
    assert results[0] == model and results[1] == model


def test_hll_linear_counting_ln_parity(spark):
    """The portable HLL's linear-counting branch feeds ln() exactly one of
    512 discrete arguments (m/V, V in 1..512). Exhaustively assert the
    rounded estimate is bit-identical in Spark and DuckDB — this is the
    only floating-point step in the sketch, so parity here makes the
    whole query's hash-match data-independent."""
    sdf = (
        spark.range(1, 513)
        .select(
            F.col("id").alias("v"),
            F.floor(512 * F.log(F.lit(512.0) / F.col("id")) + 0.5)
            .cast("long")
            .alias("e"),
        )
        .collect()
    )
    svals = {r.v: r.e for r in sdf}
    dvals = dict(
        duckdb.sql(
            "SELECT v, CAST(floor(512 * ln(512.0 / v) + 0.5) AS BIGINT) "
            "FROM (SELECT unnest(range(1, 513)) AS v)"
        ).fetchall()
    )
    assert svals == dvals


def test_portable_hll_accuracy_bound(spark):
    """The estimate is deterministic, but it should also be a decent
    estimate: TOTAL within 10% of the exact distinct count (LC regime at
    smoke scale is ~1-2%; raw-HLL regime ~4.6% at 1.04/sqrt(512))."""
    from apache_iceberg_exploration_spark.operators.relational import (
        portable_hll_distinct_rollup,
    )
    from apache_iceberg_exploration_spark.sources.io import load_table

    from .conftest import SF_SMOKE

    est = {
        r.day: r.est_users
        for r in portable_hll_distinct_rollup(spark, SF_SMOKE).collect()
    }
    exact = (
        load_table(spark, SF_SMOKE, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    assert abs(est["TOTAL"] - exact) <= max(2, 0.10 * exact), (
        est["TOTAL"],
        exact,
    )


def test_cms_never_undercounts(spark):
    """Count-Min's one-sided error: every probe estimate >= the exact
    count (counters only ever add), with overcount loosely bounded by
    the eN/w regime at smoke scale."""
    from apache_iceberg_exploration_spark.operators.relational import (
        portable_cms_user_counts,
    )
    from apache_iceberg_exploration_spark.sources.io import load_table

    from .conftest import SF_SMOKE

    est = {
        r.user_id: r.est_events
        for r in portable_cms_user_counts(spark, SF_SMOKE).collect()
    }
    ev = load_table(spark, SF_SMOKE, "events")
    n_total = ev.count()
    exact = {
        r.user_id: r.n
        for r in ev.filter(F.col("user_id") < 10)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for u, e in est.items():
        x = exact.get(u, 0)
        assert e >= x, (u, e, x)
        assert e - x <= max(5, 0.02 * n_total), (u, e, x)


def test_hll_overlap_tracks_exact(spark):
    """Inclusion-exclusion overlap from the portable HLL should track the
    exact click∩purchase user overlap within the compounded sketch error
    (loose bound: 15% of the union, min 5)."""
    from apache_iceberg_exploration_spark.operators.relational import (
        portable_hll_set_overlap,
    )
    from apache_iceberg_exploration_spark.sources.io import load_table

    from .conftest import SF_SMOKE

    row = portable_hll_set_overlap(spark, SF_SMOKE).first()
    ev = load_table(spark, SF_SMOKE, "events")
    users = lambda t: {  # noqa: E731
        r.user_id
        for r in ev.filter(F.col("event_type") == t)
        .select("user_id")
        .distinct()
        .collect()
    }
    clicks, purchases = users("click"), users("purchase")
    exact = len(clicks & purchases)
    union = len(clicks | purchases)
    assert abs(row.est_overlap - exact) <= max(5, 0.15 * union), (
        row,
        exact,
        union,
    )


_lifecycle_ops = st.lists(
    st.one_of(
        st.tuples(
            st.just("append"),
            st.lists(
                st.tuples(st.integers(0, 40), st.integers(0, 999)),
                min_size=1,
                max_size=15,
            ),
        ),
        st.tuples(
            st.just("delete"),
            st.integers(0, 40),
            st.integers(0, 15),
            st.booleans(),  # MoR vs CoW
        ),
        st.tuples(st.just("update"), st.integers(0, 40), st.integers(0, 15)),
        st.tuples(st.just("compact"), st.just(0)),
        st.tuples(st.just("rewrite_manifests"), st.just(0)),
        st.tuples(st.just("expire"), st.just(0)),
        # r6 ops: full-sync merge, constraint-gated append, clone checkpoint
        st.tuples(
            st.just("merge_sync"),
            st.lists(
                st.tuples(st.integers(0, 40), st.integers(0, 999)),
                min_size=1,
                max_size=10,
                unique_by=lambda t: t[0],
            ),
        ),
        st.tuples(
            st.just("constrained_append"),
            st.lists(
                st.tuples(st.integers(0, 40), st.integers(0, 999)),
                min_size=1,
                max_size=10,
            ),
        ),
        st.tuples(st.just("clone_check"), st.just(0)),
    ),
    min_size=3,
    max_size=8,
)


@settings(max_examples=4, deadline=None)
@given(_lifecycle_ops)
def test_table_lifecycle_matches_python_model(spark, tmp_path_factory, ops):
    """Model-based lifecycle property: an arbitrary interleaving of
    appends, CoW/MoR deletes, CoW updates, compaction, manifest
    rewrites, and snapshot expiry must leave the table equal to a plain
    Python multiset model applying the same logical operations — the
    whole-table-format invariant all the targeted tests sample."""
    from pyspark.sql import functions as F

    from apache_iceberg_exploration_spark.sources.lakehouse import (
        LakehouseTable,
    )

    tbl = LakehouseTable(
        spark, str(tmp_path_factory.mktemp("lifecycle") / "t")
    )
    model: list[tuple[int, int]] = []
    wrote = False
    for op in ops:
        if op[0] == "append":
            rows = list(op[1])
            tbl.append(spark.createDataFrame(rows, "k long, v long"))
            model.extend(rows)
            wrote = True
        elif not wrote:
            continue  # mutations before any data are vacuous
        elif op[0] == "delete":
            lo, width = op[1], op[2]
            hi = lo + width
            cond = F.col("k").between(lo, hi)
            if op[3]:
                tbl.delete_where_mor(cond, keys=["k"])
            else:
                tbl.delete_where(cond)
            model = [r for r in model if not (lo <= r[0] <= hi)]
        elif op[0] == "update":
            lo, width = op[1], op[2]
            hi = lo + width
            tbl.update_where(
                F.col("k").between(lo, hi),
                {"v": F.col("v") + 1000},
            )
            model = [
                (k, v + 1000) if lo <= k <= hi else (k, v)
                for (k, v) in model
            ]
        elif op[0] == "compact":
            tbl.rewrite_data_files(target_file_count=2)
        elif op[0] == "rewrite_manifests":
            tbl.rewrite_manifest_parts()
        elif op[0] == "expire":
            tbl.expire_snapshots(keep_last=1)
        elif op[0] == "merge_sync":
            src = list(op[1])  # unique k by construction
            tbl.merge_into(
                spark.createDataFrame(src, "k long, v long"),
                on=["k"],
                update_cols={"v": F.col("s.v")},
                delete_unmatched_target=True,
            )
            sv = dict(src)
            tgt_keys = {k for k, _ in model}
            model = [(k, sv[k]) for (k, _) in model if k in sv] + [
                (k, v) for k, v in src if k not in tgt_keys
            ]
        elif op[0] == "constrained_append":
            rows = list(op[1])
            tbl.append_with_constraints(
                spark.createDataFrame(rows, "k long, v long"),
                constraints={"v_small": F.col("v") < 500},
            )
            model.extend((k, v) for k, v in rows if v < 500)
        elif op[0] == "clone_check":
            # a shallow clone taken NOW must read back exactly the model
            # (and leave the source untouched)
            dest = str(
                tmp_path_factory.mktemp("lifecycle-clone") / "c"
            )
            c = tbl.clone(dest)
            got = sorted((r.k, r.v) for r in c.read().collect())
            assert got == sorted(model)
    if wrote:
        got = sorted((r.k, r.v) for r in tbl.read().collect())
        assert got == sorted(model)


@given(
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        max_size=24,
    ),
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        max_size=24,
    ),
)
@settings(max_examples=300, deadline=None)
def test_jaro_winkler_kernel_matches_duckdb(a, b):
    """The pure-Python Jaro-Winkler kernel (the pandas-UDF scorer) must
    reproduce DuckDB's native jaro_winkler_similarity bit-for-bit on
    arbitrary ASCII inputs — the oracle-parity contract, generalized
    beyond the part-name dictionary."""
    import duckdb

    from apache_iceberg_exploration_spark.operators.text import (
        _jaro_winkler,
    )

    expected = duckdb.execute(
        "SELECT jaro_winkler_similarity(?, ?)", [a, b]
    ).fetchone()[0]
    assert abs(_jaro_winkler(a, b) - expected) < 1e-12, (a, b)


@given(
    st.lists(
        st.integers(0, 60),
        min_size=1,
        max_size=40,
        unique=True,
    )
)
@settings(max_examples=60, deadline=None)
def test_streak_fold_matches_python_model(spark, day_offsets):
    """The higher-order streak fold (streaks_gaps_islands) must agree
    with a direct Python computation of longest-run / run-count over an
    arbitrary set of active days."""
    import datetime

    from pyspark.sql import functions as F

    base = datetime.date(2024, 1, 1)
    days = sorted(base + datetime.timedelta(days=o) for o in day_offsets)
    # python model
    longest = cur = 1
    n_streaks = 1
    for a, b in zip(days, days[1:]):
        if (b - a).days == 1:
            cur += 1
        else:
            n_streaks += 1
            cur = 1
        longest = max(longest, cur)

    from apache_iceberg_exploration_spark.operators.analytics import (
        streak_fold,
    )

    df = spark.createDataFrame(
        [(1, d) for d in days], "user_id long, day date"
    )
    per_user = df.groupBy("user_id").agg(
        F.sort_array(F.collect_set("day")).alias("days")
    )
    folded = streak_fold(F.col("days"))
    row = per_user.select(
        folded["mx"].alias("mx"), folded["n"].alias("n")
    ).first()
    assert (row.mx, row.n) == (longest, n_streaks), (days, row)


@given(
    n_rows=st.integers(min_value=1, max_value=5000),
    n_tiles=st.integers(min_value=1, max_value=40),
)
@settings(max_examples=200, deadline=None)
def test_ntile_from_rank_matches_sql_bucket_rule(n_rows, n_tiles):
    """Pure-math property: ntile_from_rank's closed form reproduces the
    SQL bucket rule (first N mod n tiles hold one extra row) for every
    rank, without touching Spark — evaluated symbolically by a Python
    reference model."""
    from apache_iceberg_exploration_spark.functions.ranking import (
        ntile_of_rank,
    )

    base, rem = divmod(n_rows, n_tiles)
    # independent model: assign tiles by walking the cumulative sizes
    # ([base+1]*rem then [base]*(n-rem)), the SQL rule stated directly
    sizes = [base + 1] * rem + [base] * (n_tiles - rem)
    model = []
    for tile, sz in enumerate(sizes, start=1):
        model.extend([tile] * sz)
    assert len(model) == n_rows
    # the MODULE's scalar closed form (the source ntile_from_rank's
    # Column expression mirrors; its Spark parity is pinned separately
    # by test_ranking.test_distributed_ntile_matches_window_ntile)
    for rank in range(1, n_rows + 1):
        assert ntile_of_rank(rank, n_rows, n_tiles) == model[rank - 1], (
            n_rows,
            n_tiles,
            rank,
        )


_pts = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=500),
        st.integers(min_value=0, max_value=500),
    ),
    min_size=1,
    max_size=60,
)


@settings(max_examples=8, deadline=None)
@given(coords=_pts, eps=st.sampled_from([7, 30, 120]))
def test_grid_neighbor_join_equals_bruteforce(spark, coords, eps):
    """The 9-cell grid probe must return EXACTLY the ε-ball pairs the
    O(n²) reference enumerates — for arbitrary point sets (duplicates
    included: a point stacked on another is a legitimate pair both
    ways) and ε values that land points on cell boundaries."""
    from apache_iceberg_exploration_spark.operators.geospatial import (
        eps_neighbor_pairs,
    )

    pts = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(coords)],
        "pid long, x long, y long",
    ).selectExpr(
        "pid", "x", "y", f"x div {eps} AS cx", f"y div {eps} AS cy"
    )
    got = sorted(
        (r.pa, r.pb) for r in eps_neighbor_pairs(pts, eps).collect()
    )
    want = sorted(
        (i, j)
        for i, (xi, yi) in enumerate(coords)
        for j, (xj, yj) in enumerate(coords)
        if (xi - xj) ** 2 + (yi - yj) ** 2 <= eps * eps
    )
    assert got == want


class TestTypePromotionLattice:
    """Property tests for the Iceberg promotion lattice (hypothesis):
    promotion is commutative-in-result, idempotent, always returns the
    wider chain member, and rejects cross-chain pairs loudly."""

    def test_chain_promotion_total(self):
        from hypothesis import given
        from hypothesis import strategies as st

        from apache_iceberg_exploration_spark.sources.lakehouse import (
            _INT_CHAIN,
            _FLOAT_CHAIN,
            _promote_type,
        )

        @given(
            st.sampled_from(_INT_CHAIN + _FLOAT_CHAIN),
            st.sampled_from(_INT_CHAIN + _FLOAT_CHAIN),
        )
        def check(a, b):
            same_chain = ({a, b} <= set(_INT_CHAIN)) or (
                {a, b} <= set(_FLOAT_CHAIN)
            )
            if same_chain:
                chain = _INT_CHAIN if a in _INT_CHAIN else _FLOAT_CHAIN
                wide = max(a, b, key=chain.index)
                assert _promote_type(a, b, "c") == wide
                assert _promote_type(b, a, "c") == wide  # symmetric
                assert _promote_type(wide, wide, "c") == wide  # idempotent
            else:
                import pytest as _pt

                with _pt.raises(ValueError, match="incompatible"):
                    _promote_type(a, b, "c")

        check()

    def test_decimal_rules(self):
        import pytest as _pt

        from apache_iceberg_exploration_spark.sources.lakehouse import (
            _promote_type,
        )

        assert (
            _promote_type("decimal(10,2)", "decimal(20,2)", "c")
            == "decimal(20,2)"
        )
        assert (
            _promote_type("decimal(20,2)", "decimal(10,2)", "c")
            == "decimal(20,2)"
        )
        with _pt.raises(ValueError):  # scale change is not a promotion
            _promote_type("decimal(10,2)", "decimal(10,4)", "c")
        with _pt.raises(ValueError):  # cross-kind
            _promote_type("decimal(10,2)", "double", "c")
        with _pt.raises(ValueError):  # nested types never promote
            _promote_type({"type": "struct"}, "long", "c")

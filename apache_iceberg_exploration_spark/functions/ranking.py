"""Distributed exact global ranking — ntile without the total sort.

``ntile(n) OVER (ORDER BY ...)`` with no PARTITION BY plans a
single-partition WindowExec ("No Partition Defined"): every row funnels
through one task, the classic 100 TB cliff. The queries that need global
quantile scores (RFM quintiles, curriculum deciles) operate on collapsed
dimension-sized relations, so the single partition *works* locally — but
the swap-in promised in their docstrings lives here, once, for all of
them.

The construction is the two-phase pattern (cf. pack_concat_chunks'
prefix sum, training.py:51), adapted to ranking and with NO unpartitioned
window anywhere, tiny or not:

1. ``repartitionByRange`` on the sort keys — Spark's RangePartitioner
   gives ordered, balanced key ranges (the same machinery a distributed
   ORDER BY uses), each partition sortable independently.
2. ``row_number`` windowed BY PARTITION ID — embarrassingly parallel.
3. Per-partition row counts (one bounded aggregate, ≤ #partitions rows)
   are prefix-summed ON THE DRIVER — a bounded-scalar collect, the
   allow-listed pattern — and broadcast-joined back as rank offsets.
4. The global rank (1-based, gap-free because the ordering is total) is
   mapped to its tile with SQL-ntile's exact bucket-size rule: with
   N rows and n tiles, the first ``N mod n`` tiles hold ``N div n + 1``
   rows, the rest ``N div n``.

Exactness requires the caller to pass a TOTAL ordering (append a unique
tie-break key, e.g. the row's id) — equal sort keys land in one range
partition, so ranks are reproducible and engine-exact, matching the SQL
``ntile(n) OVER (ORDER BY keys, tiebreak)`` oracle bit-for-bit.

The relation is pinned with ``localCheckpoint`` between the count job
and the rank job so both see the identical range placement (range
boundaries come from sampling; re-planning between jobs could move
rows). Cost at scale: one range shuffle + one materialization of the
(already collapsed) relation — instead of one partition sorting
everything.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__ntile_pid"
_OFF = "__ntile_off"


def _off_df(spark, offsets, pid_type: str = "long"):
    """Build the tiny broadcast offsets relation, typing the offset
    column by the collected values: long for integral aggregates,
    double for floats, and an EXACT max-precision decimal for DECIMAL
    value columns (ADVICE r5 #7: driver-side prefix sums of Decimal are
    exact Python arithmetic, and declaring decimal(38, s) keeps the
    broadcast-join addition exact — no silent double round-trip)."""
    import decimal

    decs = [v for _, v in offsets if isinstance(v, decimal.Decimal)]
    if decs:
        scale = max(
            0, max(-d.as_tuple().exponent for d in decs)
        )
        off_type = f"decimal(38,{scale})"
        # the seed offset is a plain int 0 — coerce so createDataFrame's
        # type verifier accepts every row as Decimal
        offsets = [
            (
                k,
                decimal.Decimal(v)
                if v is not None and not isinstance(v, decimal.Decimal)
                else v,
            )
            for k, v in offsets
        ]
    elif any(isinstance(v, float) for _, v in offsets):
        off_type = "double"
    else:
        off_type = "long"
    return spark.createDataFrame(
        offsets, f"{_PID} {pid_type}, {_OFF} {off_type}"
    )


def _checked_bucket_rows(rows, val_field: str):
    """Sort the collected per-bucket rows, failing FAST and clearly on a
    NULL bucket key: Spark would window NULLs first while the
    driver-side offset assignment has no ordering for them, and a bare
    sorted() over a None key dies with an opaque TypeError instead."""
    pairs = [(r[_PID], r[val_field]) for r in rows]
    if any(k is None for k, _ in pairs):
        raise ValueError(
            "static-bucket ranking: the bucket expression yielded NULL "
            "for some rows (e.g. a null order column feeding the "
            "bucketing) — filter those rows out or coalesce the bucket "
            "expression; the monotone-bucket contract requires non-null "
            "keys"
        )
    return sorted(pairs)


def _ranked_with_total(
    df: DataFrame,
    order_cols: list[str | Column],
    out_col: str,
    num_ranges: int | None,
) -> tuple[DataFrame, int]:
    spark = df.sparkSession
    ranges = num_ranges or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    ranged = (
        df.repartitionByRange(ranges, *cols)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint()  # pin range placement across the two jobs
    )
    counts = sorted(
        (r[_PID], r["n"])
        for r in ranged.groupBy(_PID).agg(F.count("*").alias("n")).collect()
    )  # bounded: one row per range partition
    offsets, acc = [], 0
    for pid, n in counts:
        offsets.append((pid, acc))
        acc += n
    off_df = _off_df(spark, offsets, pid_type="int")
    w = Window.partitionBy(_PID).orderBy(*cols)
    out = (
        ranged.join(F.broadcast(off_df), _PID)
        .withColumn(out_col, F.row_number().over(w) + F.col(_OFF))
        .drop(_PID, _OFF)
    )
    return out, acc


def with_global_rank(
    df: DataFrame,
    order_cols: list[str | Column],
    out_col: str,
    num_ranges: int | None = None,
) -> DataFrame:
    """Append a 1-based gap-free global rank under ``ORDER BY
    order_cols`` (which MUST be a total ordering) without any
    single-partition stage."""
    return _ranked_with_total(df, order_cols, out_col, num_ranges)[0]


def with_global_rank_static(
    df: DataFrame,
    bucket: Column,
    order_cols: list[str | Column],
    out_col: str,
) -> DataFrame:
    """Distributed exact global rank via STATIC monotone bucketing —
    the cheap sibling of :func:`with_global_rank` for keys where the
    caller can name a bucketing expression that is monotone
    NON-DECREASING along ``order_cols`` (dates → month number, integer
    cents → ``div`` bands, bounded counts → the count itself; negate
    for descending orders).

    Because the bucketing is deterministic — no RangePartitioner
    sampling — the relation needs NO localCheckpoint pin between the
    count job and the rank job, and no extra range shuffle: one
    bucket-keyed aggregate (bounded rows, prefix-summed driver-side),
    one bucket-partitioned window. That makes it ~free relative to the
    sampled variant; the trade is a SKEW ASSUMPTION: each bucket is one
    window partition, so a bucketing that dumps most rows into one
    bucket re-creates the single-partition sort. Use this when the key
    distribution is known (quintile scores over dates/counts/cents);
    fall back to :func:`with_global_rank` when it isn't (e.g. Zipf
    frequencies, where every static bucketing is head-or-tail skewed).
    """
    return _static_ranked_with_total(df, bucket, order_cols, out_col)[0]


def _static_ranked_with_total(
    df: DataFrame,
    bucket: Column,
    order_cols: list[str | Column],
    out_col: str,
) -> tuple[DataFrame, int]:
    spark = df.sparkSession
    b = df.withColumn(_PID, bucket)
    counts = _checked_bucket_rows(
        b.groupBy(_PID).agg(F.count("*").alias("n")).collect(), "n"
    )
    offsets, acc = [], 0
    for bk, n in counts:
        offsets.append((bk, acc))
        acc += n
    off_df = _off_df(spark, offsets)
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    w = Window.partitionBy(_PID).orderBy(*cols)
    out = (
        b.join(F.broadcast(off_df), _PID)
        .withColumn(out_col, F.row_number().over(w) + F.col(_OFF))
        .drop(_PID, _OFF)
    )
    return out, acc


def distributed_ntile_static(
    df: DataFrame,
    n_tiles: int,
    bucket: Column,
    order_cols: list[str | Column],
    out_col: str,
) -> DataFrame:
    """Exact ntile over a static monotone bucketing (see
    :func:`with_global_rank_static`)."""
    rank_col = f"__rank_{out_col}"
    ranked, n_rows = _static_ranked_with_total(
        df, bucket, order_cols, rank_col
    )
    return ranked.withColumn(
        out_col, ntile_from_rank(F.col(rank_col), n_rows, n_tiles)
    ).drop(rank_col)


def with_global_cumsum_static(
    df: DataFrame,
    bucket: Column,
    order_cols: list[str | Column],
    value_col: str,
    out_col: str,
) -> DataFrame:
    """Inclusive running SUM via a static monotone bucketing — the
    deterministic (no-sampling, no-pin) sibling of
    :func:`with_global_cumsum`."""
    spark = df.sparkSession
    b = df.withColumn(_PID, bucket)
    sums = _checked_bucket_rows(
        b.groupBy(_PID).agg(F.sum(value_col).alias("t")).collect(), "t"
    )
    offsets, acc = [], 0
    for bk, t in sums:
        offsets.append((bk, acc))
        acc += t or 0
    off_df = _off_df(spark, offsets)
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    w = (
        Window.partitionBy(_PID)
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        b.join(F.broadcast(off_df), _PID)
        .withColumn(out_col, F.sum(value_col).over(w) + F.col(_OFF))
        .drop(_PID, _OFF)
    )


def with_global_running_min_static(
    df: DataFrame,
    bucket: Column,
    order_cols: list[str | Column],
    value_col: str,
    out_col: str,
) -> DataFrame:
    """Inclusive RUNNING MIN of ``value_col`` under ``ORDER BY
    order_cols`` via a static monotone bucketing (see
    :func:`with_global_rank_static` for the contract): running min
    within each bucket (partitioned window), exclusive prefix-min of
    per-bucket minima on the driver (bounded collect), combined with
    ``least``. Any associative order-insensitive combiner works this
    way; min is what CUSUM needs (S_t = cum_t − min_{k≤t} cum_k)."""
    spark = df.sparkSession
    b = df.withColumn(_PID, bucket)
    mins = _checked_bucket_rows(
        b.groupBy(_PID).agg(F.min(value_col).alias("m")).collect(), "m"
    )
    offsets, acc = [], None
    for bk, m in mins:
        offsets.append((bk, acc))
        acc = m if acc is None else min(acc, m)
    off_df = _off_df(spark, offsets)
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    w = (
        Window.partitionBy(_PID)
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        b.join(F.broadcast(off_df), _PID)
        .withColumn(
            out_col,
            F.least(
                F.min(value_col).over(w),
                F.coalesce(F.col(_OFF), F.min(value_col).over(w)),
            ),
        )
        .drop(_PID, _OFF)
    )


def with_global_cumsum(
    df: DataFrame,
    order_cols: list[str | Column],
    value_col: str,
    out_col: str,
    num_ranges: int | None = None,
) -> DataFrame:
    """Append the INCLUSIVE running sum of ``value_col`` under ``ORDER
    BY order_cols`` (a total ordering) — the distributed prefix sum:
    range repartition, windowed cumsum per range partition, per-
    partition totals prefix-summed on the driver (bounded collect) and
    broadcast back as offsets. No unpartitioned WindowExec."""
    spark = df.sparkSession
    ranges = num_ranges or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    ranged = (
        df.repartitionByRange(ranges, *cols)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint()  # pin range placement across the two jobs
    )
    totals = sorted(
        (r[_PID], r["t"])
        for r in ranged.groupBy(_PID)
        .agg(F.sum(value_col).alias("t"))
        .collect()
    )
    offsets, acc = [], 0
    for pid, t in totals:
        offsets.append((pid, acc))
        acc += t or 0
    off_df = _off_df(spark, offsets, pid_type="int")
    w = (
        Window.partitionBy(_PID)
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ranged.join(F.broadcast(off_df), _PID)
        .withColumn(out_col, F.sum(value_col).over(w) + F.col(_OFF))
        .drop(_PID, _OFF)
    )


def ntile_of_rank(rank: int, n_rows: int, n_tiles: int) -> int:
    """Scalar reference of the SQL ntile bucket rule — the single
    source of truth :func:`ntile_from_rank` mirrors as a Column
    expression and the property test pins.

    SQL ntile(n) over N rows: base = N div n, rem = N mod n; tiles
    1..rem hold base+1 rows, tiles rem+1..n hold base rows.
    """
    base, rem = divmod(n_rows, n_tiles)
    big = rem * (base + 1)
    if rank <= big:
        return (rank - 1) // (base + 1) + 1
    return rem + 1 + (rank - big - 1) // max(base, 1)


def ntile_from_rank(rank: Column, n_rows: int, n_tiles: int) -> Column:
    """Column form of :func:`ntile_of_rank` (same arithmetic, verified
    against it and against Spark's own ntile window by tests)."""
    base, rem = divmod(n_rows, n_tiles)
    big = rem * (base + 1)  # rows covered by the base+1-sized tiles
    small = F.lit(max(base, 1))  # base==0 ⇔ N < n ⇔ else-branch unreachable
    return (
        F.when(rank <= big, F.floor((rank - 1) / (base + 1)) + 1)
        .otherwise(rem + 1 + F.floor((rank - big - 1) / small))
        .cast("int")
    )


def distributed_ntile(
    df: DataFrame,
    n_tiles: int,
    order_cols: list[str | Column],
    out_col: str,
    num_ranges: int | None = None,
) -> DataFrame:
    """Exact ``ntile(n_tiles) OVER (ORDER BY order_cols)`` as a
    distributed two-phase plan — bit-equal to the SQL window for a
    total ordering, with no unpartitioned WindowExec."""
    rank_col = f"__rank_{out_col}"
    ranked, n_rows = _ranked_with_total(df, order_cols, rank_col, num_ranges)
    return ranked.withColumn(
        out_col, ntile_from_rank(F.col(rank_col), n_rows, n_tiles)
    ).drop(rank_col)

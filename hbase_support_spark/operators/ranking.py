"""Distributed exact global ranking — removing the last
single-partition WindowExec from the engine.

``ROW_NUMBER() OVER (ORDER BY ...)`` with no PARTITION BY compiles to
a WindowExec that moves EVERY row into one partition — fine over a
9-row digit histogram, fatal over |users| or |vocab| at 100 TB (one
task sorts everything while 999 executors idle; Spark itself logs
"No Partition Defined for Window operation" for exactly this reason).

The classic distributed restatement implemented here:

  1. ``repartitionByRange`` on the ordering key — the same range
     shuffle a global ``orderBy`` would do, producing K partitions
     that are *globally ordered across partition boundaries* (equal
     keys never straddle a boundary).
  2. A per-partition local ``row_number`` (window PARTITIONed on
     ``spark_partition_id()`` — parallel, no data concentration).
  3. Per-partition counts (a K-row aggregate) turned into starting
     offsets with a window over K rows — metadata-scale, broadcast
     back onto the data.

``global rank = local rank + offset(partition)`` — exactly equal to
the single-partition ``row_number`` for any total ordering (the
order columns must include a tie-break, as every ranked query in
this repo already does), at the cost of one extra hash shuffle on
the partition id instead of a 1-task sort of the world.

``ntile_from_rank`` then derives NTILE(k) arithmetically from
(rank, n): SQL NTILE gives the first ``n mod k`` tiles ``n/k + 1``
rows and the rest ``n/k`` — a closed form over the rank, so quintile
scoring needs no second window. Both kernels are verified
value-identical to the native window forms in tests/test_ranking.py.

Feeding contract (r7 ×128 lesson): every kernel here pins
(``io.pin``, DISK_ONLY) its range-partitioned input, so the
materialization is INPUT-scale and stays off the heap. Feed the smallest sufficient frame:
for order statistics over values, hash-aggregate to the distinct
(group, value) grid with counts FIRST and prefix-sum the counts —
the grid is map-side-combined and usually orders of magnitude
smaller than the rows (agg_quantile_exact_global OOMed at ×128 on a
row-scale checkpoint and runs in 3.5 s on the grid; see SCALE.md).
Raw-row feeds are right only when the per-row rank itself is the
output (RFM scores, per-row quartiles).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..io import pin as _pin

_PID = "_gr_pid"
_OFF = "_gr_off"
_N = "_gr_n"


def _as_cols(order_cols) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in order_cols]


def with_global_rank(
    df: DataFrame,
    order_cols,
    rank_col: str = "g_rank",
    total_col: str | None = None,
) -> DataFrame:
    """Append an exact global ``row_number`` over ``order_cols``
    (which must form a total order — include a tie-break key) without
    ever concentrating the data on one task. Optionally also append
    the total row count as ``total_col`` (needed by NTILE) — it rides
    the same K-row offsets frame, so it costs nothing extra.

    Plan shape: range Exchange → pid hash Exchange + local sort
    (both parallel) + a broadcast join of the K-row offset table.
    The only unpartitioned window runs over the K-row per-partition
    counts aggregate — metadata, not data.
    """
    cols = _as_cols(order_cols)
    # The range-partitioned frame is consumed TWICE (offsets + data
    # path). spark_partition_id() is nondeterministic, which defeats
    # plan canonicalization — without materialization each consumer
    # re-runs the whole upstream plan and ReuseExchange never fires
    # (measured: chaining three ranks exploded to 28 exchanges). A
    # DISK_ONLY pin materializes the ranged frame to executor-local
    # disk on first use, so both consumers — and any downstream
    # rank chained on top — read one serialized materialization
    # (deserialized on-heap pins starved the x128 census's broadcast
    # builds; see io.pin). The frame is the per-entity aggregate
    # being ranked, not raw data, so local disk is the right cost
    # at 100 TB.
    d = (
        df.repartitionByRange(*cols)
        .withColumn(_PID, F.spark_partition_id())
        .transform(_pin)
    )
    counts = d.groupBy(_PID).agg(F.count("*").alias("_cnt"))
    w_off = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy(_PID).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    off_cols = [
        F.col(_PID),
        F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias(_OFF),
    ]
    if total_col is not None:
        off_cols.append(F.sum("_cnt").over(w_all).alias(_N))
    offsets = counts.select(*off_cols)

    w_loc = Window.partitionBy(_PID).orderBy(*cols)
    out = (
        d.join(F.broadcast(offsets), _PID)  # bcast: grid
        .withColumn(rank_col, F.row_number().over(w_loc) + F.col(_OFF))
        .drop(_PID, _OFF)
    )
    if total_col is not None:
        out = out.withColumnRenamed(_N, total_col)
    return out


def ntile_from_rank(rank: Column, n: Column, k: int) -> Column:
    """Exact SQL ``NTILE(k)`` derived from a 1-based global rank and
    the total row count: with ``base = n div k`` and
    ``extra = n mod k``, the first ``extra`` tiles hold ``base + 1``
    rows and the rest hold ``base``. Double division keeps the
    expression ANSI-safe when ``base = 0`` (n < k): the CASE's first
    branch then covers every row, so the ``base`` divisor is never
    evaluated. Result cast to int — the native NTILE's type."""
    base = F.floor(n / k)
    extra = n % k
    cut = (base + 1) * extra
    return (
        F.when(rank <= cut, F.ceil(rank / (base + 1)))
        .otherwise(extra + F.ceil((rank - cut) / base))
        .cast("int")
    )


def with_global_prefix_sum(
    df: DataFrame,
    order_cols,
    val_col: str,
    out_col: str = "prefix_sum",
) -> DataFrame:
    """Exact global running sum of ``val_col`` over the total order
    ``order_cols`` — the sweep-line primitive (concurrency counting,
    inventory levels, cumulative budgets) — with the same shape as
    :func:`with_global_rank`: range-shuffle, per-partition running
    sum, K-row broadcast offsets holding each partition's starting
    total. An unpartitioned ``SUM() OVER (ORDER BY ...)`` would
    funnel every boundary event through one task; here every stage
    is parallel and the only unpartitioned window runs over the
    K-row per-partition totals."""
    cols = _as_cols(order_cols)
    d = (
        df.repartitionByRange(*cols)
        .withColumn(_PID, F.spark_partition_id())
        .transform(_pin)
    )
    totals = d.groupBy(_PID).agg(F.sum(val_col).alias("_tot"))
    w_off = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        F.col(_PID),
        F.coalesce(F.sum("_tot").over(w_off), F.lit(0)).alias(_OFF),
    )
    w_loc = Window.partitionBy(_PID).orderBy(*cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        d.join(F.broadcast(offsets), _PID)  # bcast: grid
        .withColumn(out_col, F.sum(val_col).over(w_loc) + F.col(_OFF))
        .drop(_PID, _OFF)
    )


def with_global_prefix_max(
    df: DataFrame,
    order_cols,
    val_col: str,
    out_col: str = "prefix_max",
) -> DataFrame:
    """Exact global running max of ``val_col`` over all STRICTLY
    PRECEDING rows in the total order ``order_cols`` (exclusive
    frame — NULL for the first row), with the same distributed shape
    as :func:`with_global_prefix_sum`: range-shuffle, per-partition
    exclusive running max, K-row broadcast offsets holding each
    partition's predecessor max. This is the skyline/dominance
    sweep primitive — Spark's own UnboundedFollowing range frame
    recomputes the aggregate per row (O(n²) in WindowExec, measured
    5.3 s on 15 k rows), and an unpartitioned exclusive-prefix
    window single-tasks the world; this kernel is O(n log n) and
    every stage is parallel."""
    cols = _as_cols(order_cols)
    d = (
        df.repartitionByRange(*cols)
        .withColumn(_PID, F.spark_partition_id())
        .transform(_pin)
    )
    totals = d.groupBy(_PID).agg(F.max(val_col).alias("_pmax"))
    w_off = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        F.col(_PID),
        F.max("_pmax").over(w_off).alias(_OFF),
    )
    w_loc = Window.partitionBy(_PID).orderBy(*cols).rowsBetween(
        Window.unboundedPreceding, -1
    )
    local_max = F.max(val_col).over(w_loc)
    # greatest() is null-safe only when at least one side is non-null;
    # cross-coalescing keeps an all-null predecessor set NULL.
    return (
        d.join(F.broadcast(offsets), _PID)  # bcast: grid
        .withColumn(
            out_col,
            F.greatest(
                F.coalesce(local_max, F.col(_OFF)),
                F.coalesce(F.col(_OFF), local_max),
            ),
        )
        .drop(_PID, _OFF)
    )

"""§2.6 Window functions.

Per-key version analytics generalized from the cell model: ranking,
deltas between versions (lag/lead), running counters, moving
averages, and value-range frames (SURVEY.md §2.6).

Scale notes: each query shuffles once on its partition key and sorts
within partitions — Spark's window exec streams frames without
materializing the whole partition except for unbounded-following
frames. Skewed partition keys (one giant user) are the risk at
100 TB; the fixture's keys are uniform, and the salting pattern in
operators/llm.py applies when they aren't.

Float parity: running/moving aggregates are evaluated in identical
row order in both engines (same ORDER BY incl. unique tiebreak), so
sequential fp summation agrees; ROUND(6) guards the residual ulps.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..io import load_table
from ..num import round_z
from ..registry import register


@register(
    "win_row_number_topk",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def win_row_number_topk(spark, sf_dir):
    """Top-3 orders per customer (per-key top-N versions)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "win_rank_dense_ntile",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           RANK()       OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           NTILE(4)     OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def win_rank_dense_ntile(spark, sf_dir):
    """Per-status price ranking with rank / dense_rank / ntile.

    Scale shape (restructured in the r7 funnel sweep): the natural
    ``PARTITION BY o_orderstatus`` window concentrates the whole
    table into |statuses| = 3 window tasks — the same WindowExec
    funnel class the ranking kernel exists for, hiding behind "but
    it HAS a partition key". Restated on the distributed rank kernel
    (operators/ranking.py) over the total order (status, price DESC,
    orderkey): every stage parallel, and per-group ranks recovered by
    subtracting a 3-row broadcast of group start offsets. Because the
    contract's ORDER BY carries the unique o_orderkey tie-break (as
    every ranked query in this repo does), the order tuples are
    unique, so RANK = DENSE_RANK = ROW_NUMBER exactly — the identity
    is in the ordering, not the fixture — and NTILE derives
    arithmetically via ntile_from_rank."""
    from .ranking import ntile_from_rank, with_global_rank

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    g = with_global_rank(
        o,
        ["o_orderstatus", F.col("o_totalprice").desc(), "o_orderkey"],
        "_grk",
    )
    offs = g.groupBy("o_orderstatus").agg(
        (F.min("_grk") - 1).alias("_off"), F.count("*").alias("_n")
    )
    rn = F.col("_grk") - F.col("_off")
    return (
        g.join(F.broadcast(offs), "o_orderstatus")  # bcast: enum
        .select(
            "o_orderkey",
            "o_orderstatus",
            "o_totalprice",
            rn.cast("int").alias("rnk"),
            rn.cast("int").alias("drnk"),
            ntile_from_rank(rn, F.col("_n"), 4).alias("quartile"),
        )
    )


@register(
    "win_lag_lead",
    oracle="""
    SELECT event_id, user_id, ts,
           epoch_us(ts) - epoch_us(LAG(ts)  OVER w) AS gap_us,
           epoch_us(LEAD(ts) OVER w) - epoch_us(ts) AS next_gap_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def win_lag_lead(spark, sf_dir):
    """Session gap detection / deltas between consecutive versions.
    Gaps in integer µs (unix_micros ↔ epoch_us) — exact, no fp."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        (us - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
        (F.unix_micros(F.lead("ts").over(w)) - us).alias("next_gap_us"),
    )


@register(
    "win_running_sum_rows",
    oracle="""
    SELECT event_id, user_id, ts,
           SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0
             AS running_total,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS running_cnt
    FROM events
    """,
)
def win_running_sum_rows(spark, sf_dir):
    """Running counters per rowkey in version order. The counter
    accumulates integer cents (see num.py): DuckDB evaluates window
    SUMs over a segment tree while Spark accumulates sequentially, so
    unrounded running doubles differ in the last ulps on ~1/3 of rows
    — integer window sums are tree-shape-independent."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        (F.sum(F.floor(F.col("value") * 100 + 0.5)).over(w) / 100.0).alias(
            "running_total"
        ),
        F.count("*").over(w).alias("running_cnt"),
    )


@register(
    "win_moving_avg_rows",
    oracle="""
    SELECT event_id, user_id, ts,
           ROUND(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                 / 100.0
                 / COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6)
             AS moving_avg3
    FROM events
    """,
)
def win_moving_avg_rows(spark, sf_dir):
    """Smoothed metrics: 3-row trailing average."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 0)
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.round(
            F.sum(F.floor(F.col("value") * 100 + 0.5)).over(w)
            / 100.0
            / F.count("*").over(w),
            6,
        ).alias("moving_avg3"),
    )


@register(
    "win_range_frame",
    oracle="""
    SELECT event_id, user_id, ts,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                          RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
             AS events_last_hour,
           SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
             OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                   RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) / 100.0
             AS value_last_hour
    FROM events
    """,
)
def win_range_frame(spark, sf_dir):
    """Value-range frame: trailing 1-hour window keyed on epoch
    MICROSECONDS (RANGE, not ROWS — frame width is in the value
    domain). Integer-us ordering on both engines: a double epoch()
    vs floor-second cast('long') pairing makes frame membership of a
    row sitting ~3600s back a fractional-part coin flip under
    fixture regeneration."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(us).rangeBetween(-3600 * 1000000, 0)
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.count("*").over(w).alias("events_last_hour"),
        (F.sum(F.floor(F.col("value") * 100 + 0.5)).over(w) / 100.0).alias(
            "value_last_hour"
        ),
    )


@register(
    "win_cume_percent_nth",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           ROUND(CUME_DIST()    OVER w, 6) AS cume,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           NTH_VALUE(o_totalprice, 3) OVER (PARTITION BY o_orderstatus
                ORDER BY o_totalprice DESC, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS third_highest
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def win_cume_percent_nth(spark, sf_dir):
    """Distribution-position analytics: cume_dist / percent_rank /
    nth_value (the oracle keeps the explicit full frame — native
    nth_value defaults to a growing frame and silently returns NULL
    for early rows otherwise).

    Scale shape (restructured in the r7 funnel sweep, same class as
    win_rank_dense_ntile): a ``PARTITION BY o_orderstatus`` window
    over raw orders funnels everything into 3 tasks. Restated on the
    distributed rank kernel: with the unique o_orderkey tie-break the
    order tuples are unique, so CUME_DIST = rn/n and PERCENT_RANK =
    (rn−1)/(n−1) exactly — both are the same integer-over-integer
    double divisions the native functions evaluate, so the ROUND(…,6)
    values are bit-identical — and NTH_VALUE(price, 3) is the rn = 3
    row per group, delivered by a 3-row broadcast join instead of an
    unbounded-frame window."""
    from .ranking import with_global_rank

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    g = with_global_rank(
        o,
        ["o_orderstatus", F.col("o_totalprice").desc(), "o_orderkey"],
        "_grk",
    )
    offs = g.groupBy("o_orderstatus").agg(
        (F.min("_grk") - 1).alias("_off"), F.count("*").alias("_n")
    )
    gg = g.join(F.broadcast(offs), "o_orderstatus").withColumn(  # bcast: enum
        "_rn", F.col("_grk") - F.col("_off")
    )
    third = gg.filter(F.col("_rn") == 3).select(
        "o_orderstatus", F.col("o_totalprice").alias("third_highest")
    )
    n = F.col("_n")
    rn = F.col("_rn")
    return (
        gg.join(F.broadcast(third), "o_orderstatus", "left")  # bcast: enum
        .select(
            "o_orderkey",
            "o_orderstatus",
            "o_totalprice",
            F.round(rn / n, 6).alias("cume"),
            F.round(
                F.when(n > 1, (rn - F.lit(1)) / (n - F.lit(1))).otherwise(
                    F.lit(0.0)
                ),
                6,
            ).alias("pct_rank"),
            "third_highest",
        )
    )


@register(
    "win_first_last",
    oracle="""
    SELECT event_id, user_id, event_type,
           FIRST_VALUE(value) OVER w AS first_value_seen,
           LAST_VALUE(value)  OVER w AS last_value_seen
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def win_first_last(spark, sf_dir):
    """First/latest version per partition without collapsing rows —
    the frame must be explicitly unbounded-both-ways or last_value
    degenerates to current-row."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.first("value").over(w).alias("first_value_seen"),
        F.last("value").over(w).alias("last_value_seen"),
    )


@register(
    "win_pattern_rising_runs",
    oracle="""
    WITH laged AS (
      SELECT user_id, ts, value,
             LAG(value, 1) OVER w AS v1,
             LAG(value, 2) OVER w AS v2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           COUNT(*) AS n_events,
           COUNT(*) FILTER (v2 IS NOT NULL AND v1 > v2 AND value > v1)
             AS rising_runs
    FROM laged GROUP BY user_id
    """,
)
def win_pattern_rising_runs(spark, sf_dir):
    """Sequence-pattern detection, MATCH_RECOGNIZE-lite: count
    strictly-rising 3-event runs per user (the 'momentum' pattern;
    the same lag-conjunction template expresses V-shapes, double
    tops, or any fixed-length pattern). One shuffle on user_id with
    an in-partition sort — the heavy MATCH_RECOGNIZE machinery
    collapses to lag columns + a boolean when the pattern length is
    fixed, which is the scalable form: no backtracking, no state
    machine, pure window + filter."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    laged = ev.select(
        "user_id",
        "value",
        F.lag("value", 1).over(w).alias("v1"),
        F.lag("value", 2).over(w).alias("v2"),
    )
    rising = (
        F.col("v2").isNotNull()
        & (F.col("v1") > F.col("v2"))
        & (F.col("value") > F.col("v1"))
    )
    return laged.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(rising.cast("long")).alias("rising_runs"),
    )


@register(
    "win_longest_streak",
    oracle="""
    WITH gaps AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 3600000000
                  OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS brk
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    streaks AS (
      SELECT user_id,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS streak_id
      FROM gaps
    ),
    lens AS (
      SELECT user_id, streak_id, COUNT(*) AS len FROM streaks
      GROUP BY user_id, streak_id
    )
    SELECT user_id,
           MAX(len) AS longest_streak,
           COUNT(*) AS n_streaks
    FROM lens GROUP BY user_id
    """,
)
def win_longest_streak(spark, sf_dir):
    """Longest activity streak per user (events no more than 1 hour
    apart) — the engagement metric behind 'day streaks'. Built from
    the sessionization kernel: gap-break flags, running sum as the
    streak id, then max streak length — so it inherits the same
    one-shuffle-on-user scale shape. The break flag and streak id
    are pure integer arithmetic; no float anywhere.

    Same plan shape as stream_session_30m: native batch
    ``session_window`` (1-hour gap) gives map-side partial streak
    merging and shuffles pre-merged fragments instead of raw events;
    the gap compare is integer microseconds in both engines
    (session_window gap 3600000001us merges iff diff <= 3600s —
    matching the oracle's epoch_us diff > 3600000000 break)."""
    ev = load_table(spark, sf_dir, "events")
    lens = ev.groupBy(
        "user_id", F.session_window("ts", "3600000001 microseconds").alias("sw")
    ).agg(F.count("*").alias("len"))
    return lens.groupBy("user_id").agg(
        F.max("len").alias("longest_streak"),
        F.count("*").alias("n_streaks"),
    )


@register(
    "win_ohlc_bars",
    oracle="""
    WITH ordered AS (
      SELECT event_type, DATE_TRUNC('hour', ts) AS bar_start, value,
             ROW_NUMBER() OVER (PARTITION BY event_type, DATE_TRUNC('hour', ts)
                                ORDER BY ts, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type, DATE_TRUNC('hour', ts))
               AS n_bar
      FROM events
    )
    SELECT event_type, bar_start,
           MAX(CASE WHEN rn = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn = n_bar THEN value END) AS close,
           COUNT(*) AS volume
    FROM ordered
    GROUP BY event_type, bar_start
    """,
)
def win_ohlc_bars(spark, sf_dir):
    """Hourly OHLC candles per event type — the time-series
    downsampling every monitoring/market dashboard draws. Open and
    close are first/last by (ts, event_id) — the tie-break makes the
    bar boundaries engine-deterministic; high/low/volume are plain
    min/max/count. The last-row rank is derived as rn = count over
    the same partition (an UNORDERED window — no second descending
    sort pass), so the plan is one shuffle on (type, hour), ONE
    in-partition sort, and a hash agg reusing the partitioning.
    O/H/L/C are selections of raw doubles, not accumulations, so no
    rounding contract is needed."""
    base = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("hour", "ts").alias("bar_start"),
        "ts",
        "event_id",
        "value",
    )
    # both windows key on the STAGED bar_start so they share one
    # exchange (inlining the date_trunc into each spec canonicalizes
    # to two different partitionings -> two shuffles)
    w = Window.partitionBy("event_type", "bar_start").orderBy("ts", "event_id")
    wn = Window.partitionBy("event_type", "bar_start")
    ev = base.select(
        "event_type",
        "bar_start",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n_bar"),
    )
    return ev.groupBy("event_type", "bar_start").agg(
        F.max(F.when(F.col("rn") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn") == F.col("n_bar"), F.col("value"))).alias("close"),
        F.count("*").alias("volume"),
    )


@register(
    "win_max_drawdown",
    oracle="""
    WITH flows AS (
      SELECT user_id, event_id, epoch_us(ts) AS us,
             CASE WHEN event_type = 'purchase'
                  THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                  ELSE -CAST(FLOOR(value * 100 + 0.5) AS BIGINT) END AS cents
      FROM events WHERE event_type IN ('purchase', 'error')),
    balance AS (
      SELECT user_id, us, event_id,
             CAST(SUM(cents) OVER (PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum
      FROM flows),
    curve AS (
      SELECT user_id, cum,
             CAST(MAX(cum) OVER (PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS peak
      FROM balance)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_flows,
           MAX(cum) / 100.0 AS peak_value,
           CAST(MAX(peak - cum) AS BIGINT) / 100.0 AS max_drawdown,
           CAST(SUM(CASE WHEN peak - cum > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_underwater
    FROM curve
    GROUP BY user_id
    """,
)
def win_max_drawdown(spark, sf_dir):
    """Maximum drawdown per entity — the risk metric behind equity
    curves, inventory floors, and credit exposure: over each user's
    net-flow series (purchases credit, 'error' events debit — the
    refund/chargeback stand-in), compute the running balance, its
    running peak, and the deepest peak-to-trough drop ever suffered,
    plus time-underwater. Exactness: flows are integer cents, the
    running sum and running max are integer windows (associative —
    partition order can't flip a cent), and the only division is the
    final cents->currency display. Scale: ONE shuffle on user_id
    feeding both stacked windows (same partitioning and ordering —
    Spark computes them in a single WindowExec pass); the final
    per-user reduce reuses the partitioning. The nested
    max-over-running-sum is the same carried-state shape as
    `events_attribution_last_touch`.
    """
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + 0.5).cast("bigint")
    flows = ev.filter(F.col("event_type").isin("purchase", "error")).select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("us"),
        F.when(F.col("event_type") == "purchase", cents).otherwise(-cents).alias(
            "cents"
        ),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    curve = flows.select(
        "user_id",
        "us",
        "event_id",
        F.sum("cents").over(w).cast("bigint").alias("cum"),
    ).select(
        "user_id",
        "cum",
        F.max("cum").over(w).cast("bigint").alias("peak"),
    )
    return curve.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_flows"),
        (F.max("cum") / 100.0).alias("peak_value"),
        (F.max(F.col("peak") - F.col("cum")).cast("bigint") / 100.0).alias(
            "max_drawdown"
        ),
        F.sum(F.when(F.col("peak") - F.col("cum") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_underwater"),
    )


@register(
    "win_time_weighted_avg",
    oracle="""
    WITH s AS (
      SELECT user_id, event_id,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
             epoch_us(ts) AS us
      FROM events WHERE event_type = 'view'),
    seg AS (
      SELECT user_id, cents,
             (LEAD(us) OVER (PARTITION BY user_id ORDER BY us, event_id) - us)
               // 1000000 AS dur_s
      FROM s)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           CAST(SUM(dur_s) AS BIGINT) AS total_s,
           ROUND(SUM(cents * dur_s) * 1.0 / SUM(dur_s) / 100.0, 6) AS twap
    FROM seg
    WHERE dur_s IS NOT NULL AND dur_s > 0
    GROUP BY user_id
    """,
)
def win_time_weighted_avg(spark, sf_dir):
    """Time-weighted average (TWAP) — the correct mean for
    irregularly-sampled state (sensor readings, prices, gauge
    metrics): each observation's value is weighted by how long it
    REMAINED current (gap to the next observation), so a burst of
    samples can't drag the average the way a plain AVG does. All
    arithmetic exact: values are integer cents, durations integer
    whole seconds from the lead() gap (integer division of exact µs
    — also the int64 headroom choice: cents x seconds stays ~1e11
    per segment), one float division at the end. Zero-length
    segments (same-second bursts) drop out; the last (open) segment
    per user is excluded — standard TWAP windowing. One shuffle on
    user_id feeding lead() and the per-user reduce.
    """
    ev = load_table(spark, sf_dir, "events")
    s = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        "event_id",
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("cents"),
        F.unix_micros("ts").alias("us"),
    )
    seg = s.select(
        "user_id",
        "cents",
        F.expr("(lead(us) over (partition by user_id order by us, event_id) - us)"
               " div 1000000").alias("dur_s"),
    ).filter(F.col("dur_s").isNotNull() & (F.col("dur_s") > 0))
    return seg.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_segments"),
        F.sum("dur_s").cast("bigint").alias("total_s"),
        F.round(
            F.sum(F.col("cents").cast("decimal(19,0)") * F.col("dur_s")).cast("double")
            / F.sum("dur_s")
            / 100.0,
            6,
        ).alias("twap"),
    )


@register(
    "win_anchored_vwap",
    oracle="""
    WITH base AS (
      SELECT l_partkey, l_orderkey, l_linenumber, l_shipdate,
             l_quantity,
             CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
      FROM lineitem WHERE l_partkey < 200
    )
    SELECT l_partkey, l_orderkey, l_linenumber,
           CAST(SUM(l_quantity) OVER w AS DOUBLE) AS cum_qty,
           CAST(FLOOR(SUM(cents) OVER w * 10000.0 / SUM(l_quantity) OVER w)
                AS BIGINT) / 1000000.0 AS vwap
    FROM base
    WINDOW w AS (PARTITION BY l_partkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber,
                          cents, l_quantity
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def win_anchored_vwap(spark, sf_dir):
    """Anchored VWAP per instrument (part): running
    sum(price*qty)/sum(qty) from the first fill onward — the
    execution-quality benchmark every trading desk tracks, and the
    same running-ratio kernel as inventory-weighted costs. Price
    mass accumulates as EXACT integer cents (FLOOR(x*100+0.5) per
    ROW, then an associative long window sum); quantities are
    integer-valued doubles, so both cumulative sums are exact and
    the VWAP itself is emitted in fixed-point micro-price (one
    FLOOR of an identical double expression — running ratios land
    on true round-6 ties where engine ROUNDs diverge).

    Frame order: (shipdate, orderkey, linenumber) is NOT a unique
    key on the fixture — (orderkey, linenumber) repeats across
    orders and today's data carries 8 duplicate (shipdate,
    orderkey, linenumber) pairs, colliding inside one part
    partition under the r9 hot-key skew drill (and under any
    unlucky regen). The sort therefore ALSO carries the two
    contributing measures (cents, quantity): any residual tie is
    between rows identical in every column the window reads and
    every column the query emits, so frame ambiguity cannot change
    the output multiset. One hash partition by part, in-partition
    sort - no global shuffle beyond the window's own."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_partkey") < 200)
    cents = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
    w = (
        Window.partitionBy("l_partkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber", cents, "l_quantity")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_cents = F.sum(cents).over(w)
    cum_qty = F.sum("l_quantity").over(w)
    return li.select(
        "l_partkey",
        "l_orderkey",
        "l_linenumber",
        cum_qty.cast("double").alias("cum_qty"),
        # fixed-point micro-price, NOT ROUND(ratio, 6): the running
        # ratio lands on true round-6 ties (x.xxx3125), where Spark's
        # BigDecimal HALF_UP and DuckDB's float rounding disagree on
        # the nearest-double neighbor. FLOOR of an identical double
        # expression is exact in both engines; /1e6 is one identical
        # IEEE op on the same integer.
        (F.floor(cum_cents * 10000.0 / cum_qty).cast("bigint") / 1000000.0).alias(
            "vwap"
        ),
    )


@register(
    "win_rolling_median_7",
    oracle="""
    WITH base AS (
      SELECT l_partkey, l_orderkey, l_linenumber, l_shipdate,
             CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
      FROM lineitem WHERE l_partkey < 100
    )
    SELECT l_partkey, l_orderkey, l_linenumber,
           CAST(COUNT(*) OVER w AS BIGINT) AS frame_n,
           MEDIAN(cents) OVER w / 100.0 AS rolling_median
    FROM base
    WINDOW w AS (PARTITION BY l_partkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber, cents
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
)
def win_rolling_median_7(spark, sf_dir):
    """Rolling EXACT median over the trailing 7 fills per instrument
    — the robust smoother that a mean-based moving average can't be
    (one fat-finger print poisons a mean; the median shrugs). Spark
    has no median window over row frames, so the frame is
    materialized as a sorted array (collect_list over the 7-row
    frame — bounded, so the array is never wider than 7) and the
    median read off by position; even frames interpolate halves of
    integer cents, which is exact in both engines. The sort carries
    cents as the final key: (shipdate, orderkey, linenumber) is not
    unique on the fixture (r9 skew-drill finding, see
    win_anchored_vwap), and with cents appended any residual tie is
    between rows whose window contribution and output are
    identical. Partition-local: one shuffle on part, in-partition
    sort, O(7 log 7) per row."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_partkey") < 100)
    cents = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
    w = (
        Window.partitionBy("l_partkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber", cents)
        .rowsBetween(-6, Window.currentRow)
    )
    arr = F.sort_array(F.collect_list(cents).over(w))
    n = F.size(arr)
    mid_lo = F.element_at(arr, ((n + 1) / 2).cast("int"))
    mid_hi = F.element_at(arr, (n / 2 + 1).cast("int"))
    # odd frame: both picks are the middle element; even: true halves
    med = (mid_lo + mid_hi) / 2.0
    return li.select(
        "l_partkey",
        "l_orderkey",
        "l_linenumber",
        n.cast("bigint").alias("frame_n"),
        (med / 100.0).alias("rolling_median"),
    )


@register(
    "win_rolling_zscore",
    oracle="""
    WITH base AS (
      SELECT l_partkey, l_orderkey, l_linenumber, l_shipdate,
             CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
      FROM lineitem WHERE l_partkey < 100
    ),
    stats AS (
      SELECT l_partkey, l_orderkey, l_linenumber, cents,
             CAST(COUNT(*) OVER w AS BIGINT) AS n,
             CAST(SUM(cents) OVER w AS BIGINT) AS s1,
             CAST(SUM(cents * cents) OVER w AS BIGINT) AS s2
      FROM base
      WINDOW w AS (PARTITION BY l_partkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber, cents
                   ROWS BETWEEN 27 PRECEDING AND CURRENT ROW)
    )
    SELECT l_partkey, l_orderkey, l_linenumber, n,
           CASE WHEN n * s2 - s1 * s1 <= 0 THEN NULL
                ELSE (ROUND((n * cents - s1)
                            / SQRT(CAST(n * s2 - s1 * s1 AS DOUBLE)), 6) + 0.0)
           END AS rolling_z
    FROM stats
    """,
)
def win_rolling_zscore(spark, sf_dir):
    """Rolling z-score over the trailing 28 fills per instrument —
    the streaming-friendly anomaly detector (a print far from its
    local regime flags mid-scan, no global pass). All moments are
    EXACT integer window sums of cents (s1, s2 fit in BIGINT at any
    realistic magnitude: 28 x (1e7)² < 2^63), the z closed form
    (n·x − s1)/√(n·s2 − s1²) is one identical IEEE expression, and
    the signed round goes through the +0.0 sign-of-zero guard.
    Degenerate frames (zero variance) emit NULL identically. The
    sort carries cents as the final key: (shipdate, orderkey,
    linenumber) is not unique on the fixture (r9 skew-drill
    finding, see win_anchored_vwap), and with cents appended any
    residual tie is between rows with identical contribution and
    output."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_partkey") < 100)
    cents = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
    w = (
        Window.partitionBy("l_partkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber", cents)
        .rowsBetween(-27, Window.currentRow)
    )
    st = li.select(
        "l_partkey",
        "l_orderkey",
        "l_linenumber",
        cents.alias("cents"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n"),
        F.sum(cents).over(w).cast("bigint").alias("s1"),
        F.sum(cents * cents).over(w).cast("bigint").alias("s2"),
    )
    var_num = F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")
    z = (F.col("n") * F.col("cents") - F.col("s1")) / F.sqrt(var_num.cast("double"))
    return st.select(
        "l_partkey",
        "l_orderkey",
        "l_linenumber",
        "n",
        F.when(var_num <= 0, F.lit(None).cast("double"))
        .otherwise(round_z(z, 6))
        .alias("rolling_z"),
    )


def _ewma_terms(engine_lag):
    """Shared construction for the 8-tap dyadic EWMA: term k is
    lag_k(value) * 2^-(k+1); the denominator re-normalizes over the
    taps that exist (partition heads have fewer). Both engines build
    the SAME left-to-right sum, and every weight is a power of two,
    so each term is an exact mantissa-preserving scaling and the
    sequential sum is IEEE-identical cross-engine — no ROUND needed
    (the num.py decay-weight contract)."""
    num = " + ".join(
        f"coalesce({engine_lag(k)}, 0.0) * {2.0 ** -(k + 1)!r}" for k in range(8)
    )
    den = " + ".join(
        f"(CASE WHEN {engine_lag(k)} IS NULL THEN 0.0 ELSE {2.0 ** -(k + 1)!r} END)"
        for k in range(8)
    )
    return num, den


@register(
    "win_ewma_dyadic",
    oracle="""
    SELECT user_id, event_id, ts, value,
           ({num}) / ({den}) AS ewma8
    FROM (
      SELECT user_id, event_id, ts, value,
             {lags}
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    """.format(
        lags=", ".join(
            f"LAG(value, {k}) OVER w AS lag{k}" for k in range(8)
        ),
        num=_ewma_terms(lambda k: f"lag{k}")[0],
        den=_ewma_terms(lambda k: f"lag{k}")[1],
    ),
)
def win_ewma_dyadic(spark, sf_dir):
    """Finite-horizon exponentially weighted moving average with
    dyadic weights (1/2, 1/4, ... 1/256) over each user's event
    stream — the streaming smoother behind rate limiting, anomaly
    baselines, and engagement scores, truncated at 8 taps so it is a
    pure window expression (the infinite-horizon form is a recursive
    scan; at 8 taps the dropped tail weight is < 0.4 %).

    Exactness: powers-of-two weights scale mantissas exactly and both
    engines evaluate the identical left-to-right sum over the same
    LAG frame (unique (ts, event_id) order), so the quotient is
    bit-identical with NO rounding step. Plan: one shuffle on
    user_id, one in-partition sort, all 8 lags share a single window
    frame pass."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        *[F.lag("value", k).over(w).alias(f"lag{k}") for k in range(8)],
    )
    num, den = _ewma_terms(lambda k: f"lag{k}")
    return lagged.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.expr(f"({num}) / ({den})").alias("ewma8"),
    )


@register(
    "win_rolling_1h_time_frame",
    oracle="""
    SELECT user_id, event_id, ts,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) OVER w
                AS BIGINT) AS cents_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def win_rolling_1h_time_frame(spark, sf_dir):
    """Time-interval RANGE frame — the window variant none of the
    ROWS-frame ops (win_moving_avg_rows etc.) can express: per
    event, how many events and how much value the SAME user produced
    in the trailing 60 minutes, where the frame is defined by TIME
    DISTANCE, not row count (ten events in one burst all see each
    other; a lone event sees only itself). This is the rate-limiter
    / velocity-check primitive (fraud: "3+ purchases within an
    hour"), and the batch twin of a sliding stream window keyed on
    event time.

    Both engines order the frame by exact integer MICROSECONDS
    (epoch_us / unix_micros — the repo's time contract) with an
    integer range bound, and the framed sum is integer cents, so
    tie order inside equal timestamps cannot matter. Plan: one
    shuffle on user_id + in-partition sort; the range frame is a
    two-pointer pass over each partition — linear, streaming, no
    per-row rescans."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3600000000, 0)
    )
    cents = F.floor(F.col("value") * 100 + 0.5).cast("bigint")
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        F.count("*").over(w).cast("bigint").alias("n_1h"),
        F.sum(cents).over(w).cast("bigint").alias("cents_1h"),
    )


@register(
    "win_bollinger_breakout",
    oracle="""
    WITH base AS (
      SELECT o_custkey, o_orderkey, o_orderdate,
             CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders
    ),
    stats AS (
      SELECT o_custkey, cents,
             CAST(COUNT(*) OVER w AS BIGINT) AS n,
             CAST(SUM(cents) OVER w AS BIGINT) AS s1,
             CAST(SUM(cents * cents) OVER w AS BIGINT) AS s2
      FROM base
      WINDOW w AS (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)
    ),
    flagged AS (
      SELECT o_custkey,
             CASE WHEN 8 * cents - s1 > 0
                       AND (8 * cents - s1) * (8 * cents - s1)
                           > 4 * (8 * s2 - s1 * s1)
                  THEN 1 ELSE 0 END AS up,
             CASE WHEN 8 * cents - s1 < 0
                       AND (8 * cents - s1) * (8 * cents - s1)
                           > 4 * (8 * s2 - s1 * s1)
                  THEN 1 ELSE 0 END AS down
      FROM stats WHERE n = 8
    )
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(SUM(up) AS BIGINT) AS n_up,
           CAST(SUM(down) AS BIGINT) AS n_down
    FROM flagged GROUP BY o_custkey
    """,
)
def win_bollinger_breakout(spark, sf_dir):
    """Bollinger-band breakout counting per customer order stream —
    the 2-sigma envelope check every technical/anomaly monitor runs,
    made EXACT: with integer-cent moments s1 = Σx, s2 = Σx² over the
    trailing 8-order frame, |x − mean| > 2·sigma is equivalent to
    the all-integer predicate (8x − s1)² > 4·(8·s2 − s1²) — no
    division, no sqrt, no doubles anywhere, so both engines agree to
    the bit and the per-round fixture regen can never land on a
    rounding boundary (magnitudes are bounded: cents < 2^26 keeps
    every product under 2^61). Frames shorter than 8 are warm-up and
    excluded, exactly like a production indicator.

    Scale shape: one exchange on o_custkey serves the window and the
    final rollup; the frame is ROWS-bounded so Spark streams it in
    constant memory per partition — no unbounded-frame state."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-7, Window.currentRow)
    )
    st = o.select(
        "o_custkey",
        cents.alias("cents"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n"),
        F.sum(cents).over(w).cast("bigint").alias("s1"),
        F.sum(cents * cents).over(w).cast("bigint").alias("s2"),
    ).filter(F.col("n") == 8)
    dev = 8 * F.col("cents") - F.col("s1")
    wide = dev * dev > 4 * (8 * F.col("s2") - F.col("s1") * F.col("s1"))
    flagged = st.select(
        "o_custkey",
        F.when((dev > 0) & wide, 1).otherwise(0).alias("up"),
        F.when((dev < 0) & wide, 1).otherwise(0).alias("down"),
    )
    return flagged.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_windows"),
        F.sum("up").cast("bigint").alias("n_up"),
        F.sum("down").cast("bigint").alias("n_down"),
    )


@register(
    "win_parkinson_volatility",
    oracle="""
    WITH bars AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             MAX(value) AS hi, MIN(value) AS lo
      FROM events WHERE value > 0
      GROUP BY event_type, CAST(ts AS DATE)
    ),
    terms AS (
      SELECT event_type,
             CAST(FLOOR(1000000000.0 * LN(hi / lo) * LN(hi / lo)) AS BIGINT)
               AS term_nano
      FROM bars WHERE lo > 0
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(term_nano) AS BIGINT) AS sum_nano,
           CAST(FLOOR(1000000.0
                      * SQRT((CAST(SUM(term_nano) AS DOUBLE) / 1000000000.0)
                             / (4.0 * LN(2.0) * CAST(COUNT(*) AS DOUBLE))))
                AS BIGINT) AS parkinson_micro
    FROM terms GROUP BY event_type
    """,
)
def win_parkinson_volatility(spark, sf_dir):
    """Parkinson high-low volatility estimator per instrument — the
    range-based sigma every market-data stack computes because it
    extracts ~5x more information per bar than close-to-close
    (Parkinson 1980): σ²_P = Σ ln²(Hᵢ/Lᵢ) / (4n·ln2) over daily
    high/low bars. The order-dependent float hazard (a groupBy SUM
    of raw doubles) is eliminated by the per-row integerization
    contract: each day's ln²(H/L) is floored to nano units FIRST
    (one deterministic per-row double expression), the accumulation
    is then an order-proof BIGINT sum, and only the final closed
    form — one identical expression — touches doubles again
    (micro-σ output). Same discipline as text_zipf's LN handling,
    hardened one step further.

    Scale shape: one hash agg to (instrument, day) bars (map-side
    combine), one to instruments — no window function needed at all;
    the estimator is agg-shaped, which is exactly why
    exchange-volume-scale tick stores use it."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > 0)
    bars = ev.groupBy("event_type", F.col("ts").cast("date").alias("day")).agg(
        F.max("value").alias("hi"), F.min("value").alias("lo")
    ).filter(F.col("lo") > 0)
    lnr = F.log(F.col("hi") / F.col("lo"))
    terms = bars.select(
        "event_type",
        F.floor(F.lit(1000000000.0) * lnr * lnr).cast("bigint").alias("term_nano"),
    )
    return terms.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("term_nano").cast("bigint").alias("sum_nano"),
        F.floor(
            F.lit(1000000.0)
            * F.sqrt(
                (F.sum("term_nano").cast("double") / F.lit(1000000000.0))
                / (F.lit(4.0) * F.log(F.lit(2.0)) * F.count(F.lit(1)).cast("double"))
            )
        )
        .cast("bigint")
        .alias("parkinson_micro"),
    )


@register(
    "win_drawdown_duration",
    oracle="""
    WITH flows AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'purchase'
                    THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                  ELSE -CAST(FLOOR(value * 100 + 0.5) AS BIGINT) END AS flow
      FROM events WHERE event_type IN ('purchase', 'error')
    ),
    eqs AS (
      SELECT user_id, ts, event_id,
             SUM(flow) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS eq
      FROM flows
    ),
    equity AS (
      SELECT user_id, ts, event_id, eq,
             MAX(eq) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS peak
      FROM eqs
    ),
    numbered AS (
      SELECT user_id, ts, event_id, eq, peak,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn_all,
             ROW_NUMBER() OVER (PARTITION BY user_id, eq < peak
                                ORDER BY ts, event_id) AS rn_flag
      FROM equity
    ),
    uw AS (
      SELECT user_id, rn_all - rn_flag AS spell_key
      FROM numbered WHERE eq < peak
    ),
    spells AS (
      SELECT user_id, spell_key, COUNT(*) AS len
      FROM uw GROUP BY user_id, spell_key
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_spells,
           CAST(SUM(len) AS BIGINT) AS underwater_events,
           CAST(MAX(len) AS BIGINT) AS longest_spell
    FROM spells GROUP BY user_id
    """,
)
def win_drawdown_duration(spark, sf_dir):
    """Drawdown DURATION per account — the 'how long do we stay
    underwater' companion to `win_max_drawdown` (which measures
    depth): an account is underwater whenever its running equity
    (integer-cent signed flows: purchases credit, errors debit)
    sits below its running peak; maximal runs of consecutive
    underwater observations are spells, reported as count / total /
    longest. Spell segmentation is the two-row_number islands trick
    keyed on the underwater flag — pure integer comparisons over
    exact prefix sums, so spell boundaries can never float-flip.

    Scale shape: every window partitions on user_id with the same
    (ts, event_id) order, so Spark plans ONE exchange + one
    in-partition sort for the equity curve, the peak, the islands,
    and the rollup — the full per-account chain is region-local,
    exactly how an account-ledger table is already laid out."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "error")
    )
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    flows = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "purchase", cents).otherwise(-cents).alias("flow"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    equity = flows.select(
        "user_id",
        "ts",
        "event_id",
        F.sum("flow").over(w).alias("eq"),
    ).withColumn("peak", F.max("eq").over(w))
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = Window.partitionBy("user_id", F.col("eq") < F.col("peak")).orderBy(
        "ts", "event_id"
    )
    uw = (
        equity.withColumn("rn_all", F.row_number().over(wo))
        .withColumn("rn_flag", F.row_number().over(wf))
        .filter(F.col("eq") < F.col("peak"))
        .select("user_id", (F.col("rn_all") - F.col("rn_flag")).alias("spell_key"))
    )
    spells = uw.groupBy("user_id", "spell_key").agg(F.count(F.lit(1)).alias("len"))
    return spells.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_spells"),
        F.sum("len").cast("bigint").alias("underwater_events"),
        F.max("len").cast("bigint").alias("longest_spell"),
    )


@register(
    "win_rsi_cutler",
    oracle="""
    WITH bars AS (
      SELECT o_orderpriority AS priority, o_orderdate AS day,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS close_c
      FROM orders GROUP BY o_orderpriority, o_orderdate
    ),
    d AS (
      SELECT priority, day, close_c,
             close_c - LAG(close_c) OVER (PARTITION BY priority
                                          ORDER BY day) AS diff
      FROM bars
    ),
    f AS (
      SELECT priority, day,
             CAST(COUNT(diff) OVER w AS BIGINT) AS n14,
             CAST(SUM(GREATEST(diff, 0)) OVER w AS BIGINT) AS gain_c,
             CAST(SUM(GREATEST(-diff, 0)) OVER w AS BIGINT) AS loss_c
      FROM d
      WINDOW w AS (PARTITION BY priority ORDER BY day
                   ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT priority, day, gain_c, loss_c,
           CAST(CASE WHEN gain_c + loss_c = 0 THEN 5000
                     ELSE (10000 * gain_c) // (gain_c + loss_c)
                END AS BIGINT) AS rsi_bps
    FROM f WHERE n14 = 14
    """,
)
def win_rsi_cutler(spark, sf_dir):
    """Cutler's 14-period RSI over the daily order-revenue series per
    priority class — the momentum oscillator in its simple-moving
    form (plain 14-bar gain/loss sums) rather than Wilder's form,
    because Wilder smoothing is an infinite exponential recursion
    with a non-dyadic alpha=1/14 that no engine pair reproduces
    bit-exactly, while Cutler's is pure bounded-frame integer
    arithmetic: day-over-day diffs of integer-cent closes, trailing
    sums of the positive and negative parts, and a basis-point ratio
    via integer division (both operands non-negative, so DuckDB's
    truncate-toward-zero `//` and Spark's `div` agree). The
    zero-motion frame (14 flat days) is pinned to RSI=50 exactly as
    chartists define it. Warm-up frames (<14 diffs) are excluded.

    Scale shape: one exchange on the series key serves the daily
    rollup, the lag, and both trailing sums; every frame is
    ROWS-bounded so the window exec streams in constant memory —
    no unbounded-frame state, no second shuffle."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    bars = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").alias("day"),
    ).agg(F.sum(cents).cast("bigint").alias("close_c"))
    ws = Window.partitionBy("priority").orderBy("day")
    d = bars.withColumn("diff", F.col("close_c") - F.lag("close_c").over(ws))
    wf = ws.rowsBetween(-13, Window.currentRow)
    f = d.select(
        "priority",
        "day",
        F.count("diff").over(wf).cast("bigint").alias("n14"),
        F.sum(F.greatest("diff", F.lit(0))).over(wf).cast("bigint").alias("gain_c"),
        F.sum(F.greatest(-F.col("diff"), F.lit(0)))
        .over(wf)
        .cast("bigint")
        .alias("loss_c"),
    ).filter(F.col("n14") == 14)
    return f.select(
        "priority",
        "day",
        "gain_c",
        "loss_c",
        F.when(F.col("gain_c") + F.col("loss_c") == 0, F.lit(5000))
        .otherwise(F.expr("(10000 * gain_c) div (gain_c + loss_c)"))
        .cast("bigint")
        .alias("rsi_bps"),
    )


@register(
    "win_stochastic_oscillator",
    oracle="""
    WITH pr AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
             ROW_NUMBER() OVER (PARTITION BY event_type, CAST(ts AS DATE)
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ),
    bars AS (
      SELECT event_type, day,
             CAST(MAX(cents) AS BIGINT) AS hi,
             CAST(MIN(cents) AS BIGINT) AS lo,
             CAST(MAX(CASE WHEN rn = 1 THEN cents END) AS BIGINT) AS close_c
      FROM pr GROUP BY event_type, day
    ),
    k AS (
      SELECT event_type, day, close_c,
             CAST(MAX(hi) OVER w AS BIGINT) AS hh,
             CAST(MIN(lo) OVER w AS BIGINT) AS ll,
             CAST(COUNT(*) OVER w AS BIGINT) AS n14
      FROM bars
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    ),
    kb AS (
      SELECT event_type, day, close_c, hh, ll, n14,
             CAST(CASE WHEN hh = ll THEN 5000
                       ELSE ((close_c - ll) * 10000) // (hh - ll)
                  END AS BIGINT) AS k_bps
      FROM k
    ),
    db AS (
      SELECT event_type, day, close_c, hh, ll, n14, k_bps,
             CAST(SUM(k_bps) OVER w3 AS BIGINT) AS k3,
             CAST(COUNT(*) OVER w3 AS BIGINT) AS n3
      FROM kb
      WINDOW w3 AS (PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, day, close_c, hh, ll, k_bps,
           CAST(k3 // 3 AS BIGINT) AS d_bps
    FROM db WHERE n14 = 14 AND n3 = 3
           AND day >= DATE '2024-01-01' + INTERVAL 16 DAY
    """,
)
def win_stochastic_oscillator(spark, sf_dir):
    """Stochastic oscillator (%K fast, %D = 3-bar simple smoothing)
    over daily OHLC bars built from the event stream — where today's
    close sits inside the trailing 14-day high-low envelope. Bars are
    integer cents (hi/lo by MIN/MAX, close resolved as the LAST tick
    of the day by (ts, event_id) — the same conditional-MAX winner
    pattern as snapshot_diff_asof); %K is a basis-point integer
    ratio with the flat-envelope case pinned to 50%, and %D is the
    integer mean of the last three %K values (sum div 3, truncating
    identically in both engines since %K is non-negative). Rows
    before bar 17 are warm-up for one window or the other and are
    excluded in both engines by the same date predicate, which also
    keeps the n3 count aligned: %D windows never straddle a
    missing-%K gap because the fixture stream has a bar every day.

    Scale shape: one exchange on event_type serves bar building and
    BOTH window passes (same partition key, same order); all frames
    ROWS-bounded, streaming evaluation, nothing unbounded."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    wd = Window.partitionBy("event_type", F.to_date("ts")).orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    pr = ev.select(
        "event_type",
        F.to_date("ts").alias("day"),
        cents.alias("cents"),
        F.row_number().over(wd).alias("rn"),
    )
    bars = pr.groupBy("event_type", "day").agg(
        F.max("cents").cast("bigint").alias("hi"),
        F.min("cents").cast("bigint").alias("lo"),
        F.max(F.when(F.col("rn") == 1, F.col("cents")))
        .cast("bigint")
        .alias("close_c"),
    )
    w14 = (
        Window.partitionBy("event_type").orderBy("day").rowsBetween(-13, 0)
    )
    k = bars.select(
        "event_type",
        "day",
        "close_c",
        F.max("hi").over(w14).cast("bigint").alias("hh"),
        F.min("lo").over(w14).cast("bigint").alias("ll"),
        F.count(F.lit(1)).over(w14).cast("bigint").alias("n14"),
    ).withColumn(
        "k_bps",
        F.when(F.col("hh") == F.col("ll"), F.lit(5000))
        .otherwise(F.expr("((close_c - ll) * 10000) div (hh - ll)"))
        .cast("bigint"),
    )
    w3 = Window.partitionBy("event_type").orderBy("day").rowsBetween(-2, 0)
    db = k.withColumn("k3", F.sum("k_bps").over(w3).cast("bigint")).withColumn(
        "n3", F.count(F.lit(1)).over(w3).cast("bigint")
    )
    return (
        db.filter(
            (F.col("n14") == 14)
            & (F.col("n3") == 3)
            & (F.col("day") >= F.expr("DATE '2024-01-01' + INTERVAL 16 DAY"))
        )
        .select(
            "event_type", "day", "close_c", "hh", "ll", "k_bps",
            F.expr("k3 div 3").cast("bigint").alias("d_bps"),
        )
    )


@register(
    "win_ulcer_index",
    oracle="""
    WITH flows AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'purchase'
                    THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                  ELSE -CAST(FLOOR(value * 100 + 0.5) AS BIGINT) END AS flow
      FROM events WHERE event_type IN ('purchase', 'error')
    ),
    eq AS (
      SELECT user_id, ts, event_id,
             1000000 + SUM(flow)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS equity
      FROM flows
    ),
    pk AS (
      SELECT user_id, equity,
             MAX(equity) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS peak
      FROM eq
    ),
    d2 AS (
      SELECT user_id, ((peak - equity) * 10000) // peak AS dd_bps
      FROM pk
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(SUM(dd_bps * dd_bps) AS BIGINT) AS sum_dd2,
           CAST(MAX(dd_bps) AS BIGINT) AS max_dd_bps,
           SQRT(CAST(SUM(dd_bps * dd_bps) AS DOUBLE)
                / CAST(COUNT(*) AS DOUBLE)) AS ulcer_bps
    FROM d2 GROUP BY user_id
    """,
)
def win_ulcer_index(spark, sf_dir):
    """Ulcer index per account — Peter Martin's drawdown-severity
    measure: the RMS of percentage drawdown from the running peak
    over the whole equity curve (unlike max-drawdown it prices both
    depth AND duration of underwater spells). Equity is a $10k
    starting bankroll plus the exact integer-cent running sum of
    signed flows (purchases credit, errors debit — the same ledger
    as win_drawdown_duration); the bankroll keeps the running peak
    strictly positive so the percentage is defined everywhere.
    Drawdown in basis points is an integer division (non-negative
    numerator, positive denominator, so `div` and `//` agree), its
    square accumulates exactly in BIGINT, and only the final RMS
    touches doubles (one identical SQRT-of-ratio expression,
    bit-exact cross-engine).

    Scale shape: one exchange on the account key serves the running
    sum, the running max, and the rollup (same partitioning, frames
    all running/ROWS so the window exec streams); output is one row
    per account."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    flow = F.when(F.col("event_type") == "purchase", cents).otherwise(-cents)
    wo = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    eq = (
        ev.filter(F.col("event_type").isin("purchase", "error"))
        .select("user_id", "ts", "event_id", flow.alias("flow"))
        .select(
            "user_id",
            "ts",
            "event_id",
            (F.lit(1000000) + F.sum("flow").over(wo)).alias("equity"),
        )
    )
    wp = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dd = eq.withColumn("peak", F.max("equity").over(wp)).select(
        "user_id",
        F.expr("((peak - equity) * 10000) div peak").alias("dd_bps"),
    )
    return dd.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
        F.sum((F.col("dd_bps") * F.col("dd_bps")).cast("decimal(38,0)"))
        .cast("long")
        .alias("sum_dd2"),
        F.max("dd_bps").cast("bigint").alias("max_dd_bps"),
        F.sqrt(
            F.sum((F.col("dd_bps") * F.col("dd_bps")).cast("decimal(38,0)"))
            .cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("ulcer_bps"),
    )


@register(
    "win_obv_accumulation",
    oracle="""
    WITH bars AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS vol,
             CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS close_c
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    d AS (
      SELECT event_type, day, vol, close_c,
             close_c - LAG(close_c) OVER (PARTITION BY event_type
                                          ORDER BY day) AS diff
      FROM bars
    ),
    s AS (
      SELECT event_type, day, vol, close_c,
             CASE WHEN diff > 0 THEN vol
                  WHEN diff < 0 THEN -vol
                  ELSE 0 END AS signed_vol
      FROM d
    )
    SELECT event_type, day, vol, close_c,
           CAST(SUM(signed_vol) OVER (PARTITION BY event_type ORDER BY day
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS obv
    FROM s
    """,
)
def win_obv_accumulation(spark, sf_dir):
    """On-balance volume per instrument — Granville's flow indicator:
    each day's volume is added when the close rises, subtracted when
    it falls, ignored on a flat close, and the running total is the
    OBV line whose divergence from price is the classic accumulation
    / distribution signal. Closes are exact integer-cent daily sums,
    volumes are counts, the sign decision is integer comparison, and
    the OBV line is a running BIGINT sum over a uniquely-ordered
    ROWS frame — bit-identical cross-engine with no float anywhere.
    The first bar of each series has no prior close and contributes
    zero, the standard OBV seed.

    Scale shape: one exchange on the instrument key serves the daily
    rollup, the lag, and the running sum (same partitioning
    throughout); frames are running-ROWS so the window exec streams
    in constant memory."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    bars = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("vol"),
        F.sum(cents).cast("bigint").alias("close_c"),
    )
    ws = Window.partitionBy("event_type").orderBy("day")
    d = bars.withColumn("diff", F.col("close_c") - F.lag("close_c").over(ws))
    s = d.withColumn(
        "signed_vol",
        F.when(F.col("diff") > 0, F.col("vol"))
        .when(F.col("diff") < 0, -F.col("vol"))
        .otherwise(F.lit(0)),
    )
    wr = ws.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return s.select(
        "event_type", "day", "vol", "close_c",
        F.sum("signed_vol").over(wr).cast("bigint").alias("obv"),
    )


def _wsum_terms(engine_lag, weights):
    """Generalized finite-tap weighted-MA construction (the
    win_ewma_dyadic pattern): term k is lag_k * weights[k] with the
    denominator re-normalizing over the taps that exist at partition
    heads. Every weight passed here must be EXACTLY representable as
    a double (dyadic rationals, or 3^k/4^(k+1) — mantissa 3^k); the
    repr() literal is shortest-roundtrip, so both engines parse the
    identical bit pattern and the identical left-to-right sum is
    IEEE-bit-equal cross-engine with no ROUND step."""
    num = " + ".join(
        f"coalesce({engine_lag(k)}, 0.0) * {w!r}" for k, w in enumerate(weights)
    )
    den = " + ".join(
        f"(CASE WHEN {engine_lag(k)} IS NULL THEN 0.0 ELSE {w!r} END)"
        for k, w in enumerate(weights)
    )
    return num, den


_MACD_FAST = [2.0 ** -(k + 1) for k in range(8)]        # decay 1/2
_MACD_SLOW = [3.0**k / 4.0 ** (k + 1) for k in range(8)]  # decay 3/4
_MACD_SIG = [2.0 ** -(j + 1) for j in range(4)]          # 4-tap signal


def _macd_oracle() -> str:
    lags = ", ".join(f"LAG(value, {k}) OVER w AS lag{k}" for k in range(8))
    fn, fd = _wsum_terms(lambda k: f"lag{k}", _MACD_FAST)
    sn, sd = _wsum_terms(lambda k: f"lag{k}", _MACD_SLOW)
    mlags = ", ".join(f"LAG(macd, {j}) OVER w2 AS mlag{j}" for j in range(4))
    gn, gd = _wsum_terms(lambda j: f"mlag{j}", _MACD_SIG)
    return f"""
    WITH base AS (
      SELECT user_id, event_id, ts, value, {lags}
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    m AS (
      SELECT user_id, event_id, ts,
             ({fn}) / ({fd}) - ({sn}) / ({sd}) + 0.0 AS macd
      FROM base
    ),
    s AS (
      SELECT user_id, event_id, ts, macd, {mlags}
      FROM m
      WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id, ts, macd,
           ({gn}) / ({gd}) + 0.0 AS signal_line,
           CAST(CASE WHEN macd > ({gn}) / ({gd}) THEN 1
                     WHEN macd < ({gn}) / ({gd}) THEN -1
                     ELSE 0 END AS INT) AS stance
    FROM s
    """


@register("win_macd_signal", oracle=_macd_oracle())
def win_macd_signal(spark, sf_dir):
    """MACD with signal line — the one classic indicator missing
    from this module's block (Bollinger/RSI/stochastic/OBV/VWAP all
    exist): a fast minus a slow exponentially weighted MA of each
    user's value stream, then a short EWMA of the MACD itself as the
    signal line, with the stance flag (+1 above / −1 below / 0 tie)
    whose sign CHANGES are the trading crossovers. Classic 12/26/9
    EMAs are infinite recursions; this is the finite-tap restatement
    the win_ewma_dyadic contract allows: fast = 8 taps of decay 1/2,
    slow = 8 taps of decay 3/4, signal = 4 taps of decay 1/2 over
    the MACD (both carrying the repo's `+ 0.0` sign-of-zero guard
    — value > 0 makes a true -0.0 unreachable, but the guard keeps
    the zero_sign audit's regeneration-proof contract). Every weight
    is exactly representable (dyadic, or
    3^k/4^(k+1) whose mantissa is 3^k), both engines evaluate the
    identical left-to-right sums, and the stance compares
    bit-identical doubles — deterministic with NO rounding step.

    Scale shape: two window passes over the same high-cardinality
    (user_id) partitioning — one sort amortized across all 8 + 4
    lags (Spark collapses same-spec windows into one WindowExec
    each), no joins, no funnels."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        *[F.lag("value", k).over(w).alias(f"lag{k}") for k in range(8)],
    )
    fn, fd = _wsum_terms(lambda k: f"lag{k}", _MACD_FAST)
    sn, sd = _wsum_terms(lambda k: f"lag{k}", _MACD_SLOW)
    m = lagged.select(
        "user_id",
        "event_id",
        "ts",
        F.expr(f"({fn}) / ({fd}) - ({sn}) / ({sd}) + 0.0").alias("macd"),
    )
    s = m.select(
        "user_id",
        "event_id",
        "ts",
        "macd",
        *[F.lag("macd", j).over(w).alias(f"mlag{j}") for j in range(4)],
    )
    gn, gd = _wsum_terms(lambda j: f"mlag{j}", _MACD_SIG)
    return s.select(
        "user_id",
        "event_id",
        "ts",
        "macd",
        F.expr(f"({gn}) / ({gd}) + 0.0").alias("signal_line"),
        F.expr(
            f"CAST(CASE WHEN macd > ({gn}) / ({gd}) THEN 1"
            f" WHEN macd < ({gn}) / ({gd}) THEN -1 ELSE 0 END AS INT)"
        ).alias("stance"),
    )

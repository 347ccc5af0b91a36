"""Time-series analytics: rolling exact medians, inter-arrival
distributions, and nearest-direction as-of joins.

These complete the temporal-join/window family (`asof.py`, `windows.py`)
with the remaining semantics a reference user would reach for: rolling
robust statistics over calendar frames, arrival-process profiling, and
the 'nearest' as-of direction (backward and tolerance variants live in
`asof.py`).

Scale discipline: every operator collapses raw event volume FIRST
(per-day or per-type partial aggregates), then windows over the tiny
frame; the as-of nearest join unions a backward and a forward pass —
each a bounded window over the union stream, never a cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import load, query

_ROLL_DAYS = 7  # rolling frame width (current + 6 preceding)


@query(
    "window_rolling_median",
    oracle=f"""
    WITH daily AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1
    )
    SELECT day, n_events,
           CAST(count(*) OVER w AS BIGINT) AS n_days_in_frame,
           quantile_cont(n_events, 0.5) OVER w AS rolling_median
    FROM daily
    WINDOW w AS (ORDER BY day ROWS BETWEEN {_ROLL_DAYS - 1} PRECEDING
                 AND CURRENT ROW)
    """,
)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling {D}-day exact median of daily event volume — the robust
    trend line (a mean-based rolling average chases the very spikes a
    monitor should flag; the median does not). Spark's ``percentile`` is
    an exact interpolating aggregate and is window-capable, so the
    rolling median is ONE declarative window — no collect_list+UDF, no
    self-join — and matches DuckDB's ``quantile_cont`` bit-for-bit (the
    interpolation arithmetic is the same single expression; parity
    already proven by agg_percentiles).

    Collapse-then-window as always: raw events partial-aggregate to one
    row per day; the rolling frame slides over the calendar frame, which
    stays O(days) at any corpus size.
    """
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    w = (
        Window.partitionBy(F.lit(0))
        .orderBy("day")
        .rowsBetween(-(_ROLL_DAYS - 1), Window.currentRow)
    )
    return daily.select(
        "day",
        "n_events",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_days_in_frame"),
        F.expr("percentile(n_events, 0.5)")
        .over(w)
        .alias("rolling_median"),
    )


@query(
    "event_inter_arrival_stats",
    oracle="""
    WITH gaps AS (
        SELECT event_type,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY event_type ORDER BY ts, event_id
               ) AS gap_us
        FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_gaps,
           CAST(min(gap_us) AS BIGINT) AS min_us,
           quantile_cont(gap_us, 0.5) AS p50_us,
           quantile_cont(gap_us, 0.95) AS p95_us,
           CAST(max(gap_us) AS BIGINT) AS max_us
    FROM gaps WHERE gap_us IS NOT NULL
    GROUP BY event_type
    """,
)
def event_inter_arrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival time distribution per event type (min/p50/p95/max of
    the gap between consecutive events) — the arrival-process profile
    behind rate-limit sizing, anomaly baselines, and synthetic-load
    modeling. A p50 collapse means a burst source; a p95 blowup means a
    stall.

    One window pass keyed on event_type produces the gaps (exact integer
    microseconds from the nanosecond fixture column); the percentile
    rollup is the same exact-interpolating aggregate proven cross-engine
    by agg_percentiles. Single exchange over raw events, |types| output
    rows.
    """
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts_ns", "event_id")
    gaps = e.select(
        "event_type",
        (
            F.expr("ts_ns DIV 1000")
            - F.lag(F.expr("ts_ns DIV 1000")).over(w)
        ).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    return gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.min("gap_us").cast("bigint").alias("min_us"),
        F.expr("percentile(gap_us, 0.5)").alias("p50_us"),
        F.expr("percentile(gap_us, 0.95)").alias("p95_us"),
        F.max("gap_us").cast("bigint").alias("max_us"),
    )


@query(
    "join_asof_nearest",
    oracle="""
    WITH signups AS (
        SELECT user_id, epoch_us(ts) AS t, event_id
        FROM events WHERE event_type = 'signup'
    ),
    purchases AS (
        SELECT user_id, epoch_us(ts) AS t, event_id, value
        FROM events WHERE event_type = 'purchase'
    ),
    scored AS (
        SELECT s.user_id, s.event_id AS signup_event,
               p.event_id AS purchase_event,
               abs(p.t - s.t) AS dist_us,
               row_number() OVER (
                   PARTITION BY s.user_id, s.event_id
                   ORDER BY abs(p.t - s.t), p.t, p.event_id
               ) AS rnk
        FROM signups s JOIN purchases p ON p.user_id = s.user_id
    )
    SELECT user_id, signup_event, purchase_event,
           CAST(dist_us AS BIGINT) AS dist_us
    FROM scored WHERE rnk = 1
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, direction='nearest': each signup event pairs with the
    temporally CLOSEST purchase of the same user, before OR after —
    completing the as-of family (backward carry, tolerance, and range
    band live in asof.py). Ties (equidistant before/after) break toward
    the earlier purchase, then event_id — fully deterministic.

    Implementation is the UNION-STREAM trick, not the oracle's per-user
    pair join: merge both event sets into one stream ordered by time,
    take last-purchase-before (backward pass) and first-purchase-after
    (forward pass) in two window sweeps over the SAME user partition,
    then pick the closer side per row. Cost: one exchange keyed on
    user_id and two sorts — at 100 TB the oracle's formulation would be
    O(signups × purchases) per user, the union-stream is O(events log
    events-per-partition). The plan audit pins the no-pair-join shape.
    """
    e = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("signup", "purchase")
    )
    base = e.select(
        "user_id",
        "event_type",
        "event_id",
        F.expr("ts_ns DIV 1000").alias("t"),
    )
    is_p = F.col("event_type") == "purchase"
    pstruct = F.when(is_p, F.struct(F.col("t"), F.col("event_id")))
    w_ord = Window.partitionBy("user_id").orderBy("t", "event_id")
    wb = w_ord.rowsBetween(Window.unboundedPreceding, -1)
    wf = w_ord.rowsBetween(1, Window.unboundedFollowing)
    # a purchase AT the signup instant is "before or at" for the backward
    # arm via the self-inclusive frame on purchases only; keep frames
    # exclusive of current row (a signup is never a purchase, rows are
    # distinct events) and scan both directions
    wbi = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wfi = w_ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    enriched = base.select(
        "user_id",
        "event_type",
        "event_id",
        "t",
        F.last(pstruct, ignorenulls=True).over(wbi).alias("prev_p"),
        F.first(pstruct, ignorenulls=True).over(wfi).alias("next_p"),
    )
    s = enriched.filter(F.col("event_type") == "signup")
    prev_d = F.col("t") - F.col("prev_p.t")
    next_d = F.col("next_p.t") - F.col("t")
    pick_prev = F.col("prev_p").isNotNull() & (
        F.col("next_p").isNull() | (prev_d <= next_d)
    )
    return s.filter(
        F.col("prev_p").isNotNull() | F.col("next_p").isNotNull()
    ).select(
        "user_id",
        F.col("event_id").alias("signup_event"),
        F.when(pick_prev, F.col("prev_p.event_id"))
        .otherwise(F.col("next_p.event_id"))
        .alias("purchase_event"),
        F.when(pick_prev, prev_d).otherwise(next_d).cast("bigint").alias(
            "dist_us"
        ),
    )


@query(
    "event_burst_zscore",
    oracle="""
    WITH hourly AS (
        SELECT event_type,
               CAST(epoch_ns(ts) // 3600000000000 AS BIGINT) AS hour_id,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    stats AS (
        SELECT event_type, hour_id, c,
               CAST(coalesce(count(c) OVER trail, 0) AS BIGINT) AS s0,
               CAST(coalesce(sum(c) OVER trail, 0) AS BIGINT) AS s1,
               CAST(coalesce(sum(c * c) OVER trail, 0) AS BIGINT) AS s2
        FROM hourly
        WINDOW trail AS (
            PARTITION BY event_type ORDER BY hour_id
            RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING
        )
    )
    SELECT event_type, hour_id, c AS n_events, s0 AS n_trailing,
           (s0 >= 12 AND
            (c * s0 - s1) * (c * s0 - s1) > 9 * (s0 * s2 - s1 * s1)
            AND c * s0 > s1) AS is_burst
    FROM stats
    """,
)
def event_burst_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst / anomaly detection on event rates: flag any (event type,
    hour) whose count sits more than 3 trailing standard deviations ABOVE
    its own trailing-24-active-hour mean — the alerting primitive behind
    rate-spike monitors. The z-score test is evaluated in EXACT integer
    cross-multiplied form — (c·S0 − S1)² > 9·(S0·S2 − S1²), plus a
    directional guard c·S0 > S1 — so no sqrt/divide ever runs and the
    verdict is bit-identical across engines (a floating z would not be).

    Scale shape: one partial-aggregated shuffle to hourly counts (the raw
    events collapse ~10⁴:1 before any window), then ONE range-frame window
    per event type over the tiny hourly series. Trailing statistics come
    from the same RANGE BETWEEN frame both engines define identically on
    the integer hour id; hours with zero events hold no row, so the
    baseline is "trailing active hours" by construction — documented
    semantics, not an accident.
    """
    hourly = (
        load(spark, sf_dir, "events")
        .select("event_type", F.expr("ts_ns DIV 3600000000000").alias("hour_id"))
        .groupBy("event_type", "hour_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    trail = (
        Window.partitionBy("event_type")
        .orderBy("hour_id")
        .rangeBetween(-24, -1)
    )
    stats = hourly.select(
        "event_type",
        "hour_id",
        "c",
        F.coalesce(F.count("c").over(trail), F.lit(0)).alias("s0"),
        F.coalesce(F.sum("c").over(trail), F.lit(0)).alias("s1"),
        F.coalesce(F.sum(F.col("c") * F.col("c")).over(trail), F.lit(0)).alias("s2"),
    )
    lhs = (F.col("c") * F.col("s0") - F.col("s1"))
    burst = (
        (F.col("s0") >= 12)
        & (lhs * lhs > 9 * (F.col("s0") * F.col("s2") - F.col("s1") * F.col("s1")))
        & (F.col("c") * F.col("s0") > F.col("s1"))
    )
    return stats.select(
        "event_type",
        "hour_id",
        F.col("c").cast("bigint").alias("n_events"),
        F.col("s0").cast("bigint").alias("n_trailing"),
        burst.alias("is_burst"),
    )


_EWMA_ALPHA = 30   # smoothing weight, percent
_EWMA_SCALE = 100  # fixed-point scale on the smoothed value


@query(
    "event_ewma_daily",
    oracle=f"""
    WITH RECURSIVE daily AS (
        SELECT event_type,
               CAST(epoch_ns(ts) // 86400000000000 AS BIGINT) AS day,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    ord AS (
        SELECT event_type, day, c,
               row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
        FROM daily
    ),
    ew AS (
        SELECT event_type, day, c, rn,
               CAST(c * {_EWMA_SCALE} AS BIGINT) AS e
        FROM ord WHERE rn = 1
        UNION ALL
        SELECT o.event_type, o.day, o.c, o.rn,
               CAST(({_EWMA_ALPHA} * o.c * {_EWMA_SCALE}
                     + (100 - {_EWMA_ALPHA}) * ew.e) // 100 AS BIGINT)
        FROM ord o
        JOIN ew ON ew.event_type = o.event_type AND o.rn = ew.rn + 1
    )
    SELECT event_type, day, c AS n_events, e AS ewma_x100 FROM ew
    """,
)
def event_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of daily event rates — the
    smoother behind every trend/alerting dashboard — in EXACT fixed-point
    integer arithmetic: s₁ = c₁·{S}, sₜ = ({A}·cₜ·{S} + (100−{A})·sₜ₋₁)
    DIV 100. An inherently SEQUENTIAL recurrence (each value depends on
    the previous), so it cannot be a window aggregate; Spark evaluates it
    as an ordered fold inside ONE higher-order ``aggregate`` lambda per
    series, and the DuckDB oracle replays the identical recurrence with a
    recursive CTE — integer state makes the two bit-identical at any
    depth, where a float EWMA would drift.

    Scale shape: raw events collapse to per-(type, day) counts in one
    partial-agg shuffle (~10⁴:1); each series then folds WITHIN its group
    — a per-key sequential scan, embarrassingly parallel ACROSS the
    millions of keys a real deployment smooths (per user, per metric, per
    page). The collect_list stays bounded by the series length, the
    documented contract for HOF folds (time axis, not corpus axis).
    """
    daily = (
        load(spark, sf_dir, "events")
        .select("event_type", F.expr("ts_ns DIV 86400000000000").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    series = daily.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("day", "c"))).alias("xs")
    )
    fold = F.expr(
        f"""
        aggregate(
            xs,
            CAST(array() AS ARRAY<STRUCT<day: BIGINT, c: BIGINT, e: BIGINT>>),
            (acc, x) -> acc || array(named_struct(
                'day', x.day, 'c', x.c,
                'e', CASE WHEN size(acc) = 0 THEN x.c * {_EWMA_SCALE}
                     ELSE ({_EWMA_ALPHA} * x.c * {_EWMA_SCALE}
                           + (100 - {_EWMA_ALPHA}) * element_at(acc, -1).e)
                          DIV 100 END))
        )
        """
    )
    return (
        series.select("event_type", F.explode(fold).alias("s"))
        .select(
            "event_type",
            F.col("s.day").alias("day"),
            F.col("s.c").alias("n_events"),
            F.col("s.e").alias("ewma_x100"),
        )
    )


_SN_LAG_DAYS = 7  # seasonal period: same weekday one week earlier


@query(
    "event_seasonal_naive_eval",
    oracle=f"""
    WITH daily AS (
        SELECT event_type,
               CAST(epoch_ns(ts) // 86400000000000 AS BIGINT) AS day,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    paired AS (
        SELECT event_type, day, c,
               max(c) OVER (
                   PARTITION BY event_type ORDER BY day
                   RANGE BETWEEN {_SN_LAG_DAYS} PRECEDING
                         AND {_SN_LAG_DAYS} PRECEDING
               ) AS fc
        FROM daily
    )
    SELECT event_type,
           CAST(count(fc) AS BIGINT) AS n_eval,
           CAST((100 * sum(abs(c - fc))) // count(fc) AS BIGINT) AS mae_x100,
           CAST(max(abs(c - fc)) AS BIGINT) AS max_abs_err,
           CAST(sum(c - fc) AS BIGINT) AS bias
    FROM paired WHERE fc IS NOT NULL
    GROUP BY event_type
    """,
)
def event_seasonal_naive_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-accuracy baseline: evaluate the SEASONAL-NAIVE predictor
    (tomorrow looks like the same weekday last week, the yardstick every
    real forecasting model must beat) against observed daily event volume
    — per-series MAE, worst miss, and signed bias, all in exact integers.

    The lag is a calendar offset, not a row offset: the forecast for day d
    is the count at day d-{P} exactly, fetched by a degenerate RANGE frame
    ({P} PRECEDING AND {P} PRECEDING) over the integer day index — gaps in
    the series yield NULL (no forecast) instead of silently sliding to the
    nearest prior row the way a ROWS lag(7) would.

    Scale shape: raw events collapse to (type, day) counts in one
    partial-agg shuffle (~10⁴:1); the RANGE window and the error rollup
    both run on the collapsed frame, partitioned by series key — at 100 TB
    with millions of series (per page, per SKU) the plan is unchanged and
    embarrassingly parallel across keys. MAE is reported ×100 via integer
    DIV, so the comparison is bit-exact cross-engine.
    """
    daily = (
        load(spark, sf_dir, "events")
        .select("event_type", F.expr("ts_ns DIV 86400000000000").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rangeBetween(-_SN_LAG_DAYS, -_SN_LAG_DAYS)
    )
    paired = daily.withColumn("fc", F.max("c").over(w)).filter(
        F.col("fc").isNotNull()
    )
    err = F.col("c") - F.col("fc")
    return paired.groupBy("event_type").agg(
        F.count("fc").alias("n_eval"),
        F.expr("(100 * sum(abs(c - fc))) DIV count(fc)").alias("mae_x100"),
        F.max(F.abs(err)).alias("max_abs_err"),
        F.sum(err).alias("bias"),
    )


@query(
    "event_cusum_changepoint",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(epoch_ns(ts) // 86400000000000 AS BIGINT) AS day,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    tot AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(c) AS BIGINT) AS total
        FROM daily GROUP BY event_type
    ),
    walk AS (
        SELECT d.event_type, d.day, d.c, t.n_days, t.total,
               sum(d.c * t.n_days - t.total) OVER (
                   PARTITION BY d.event_type ORDER BY d.day
               ) AS p
        FROM daily d JOIN tot t USING (event_type)
    ),
    stat AS (
        SELECT event_type, day, c, n_days, total,
               CAST(p - min(p) OVER (
                   PARTITION BY event_type ORDER BY day
               ) AS BIGINT) AS s
        FROM walk
    )
    SELECT event_type, day AS change_day, c AS n_events_that_day,
           s AS cusum_stat, n_days, total
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY event_type ORDER BY s DESC, day
        ) AS rnk
        FROM stat
    ) WHERE rnk = 1
    """,
)
def event_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-point detection by the CUSUM statistic — where did a
    series' level shift? For each event type the detector reports the day
    maximizing S_t = P_t − min_{i≤t} P_i, where P is the running sum of
    mean-centered daily counts: the one-sided Page CUSUM, computed via the
    prefix-sum identity instead of the sequential max(0, ·) recurrence —
    which turns an inherently serial fold into TWO stock window
    aggregates (running sum + running min) Catalyst already knows how to
    partition.

    Everything is exact integer arithmetic: deviations are scaled by the
    series length (c·D − Σc, so the mean never becomes a fraction), making
    the statistic and the argmax day bit-identical cross-engine; ties
    break to the earliest day.

    Scale shape: one partial-agg collapse of raw events to (type, day),
    one broadcast-size per-series totals frame joined back, two windows
    and the argmax rollup all partitioned by series key — millions of
    independent series parallelize freely at 100 TB; no UDF, no fold.
    """
    daily = (
        load(spark, sf_dir, "events")
        .select("event_type", F.expr("ts_ns DIV 86400000000000").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"), F.sum("c").alias("total")
    )
    ordered = Window.partitionBy("event_type").orderBy("day")
    walk = daily.join(F.broadcast(tot), "event_type").withColumn(
        "p",
        F.sum(F.col("c") * F.col("n_days") - F.col("total")).over(ordered),
    )
    stat = walk.withColumn("s", F.col("p") - F.min("p").over(ordered))
    rnk = Window.partitionBy("event_type").orderBy(F.col("s").desc(), "day")
    return (
        stat.withColumn("rnk", F.row_number().over(rnk))
        .filter(F.col("rnk") == 1)
        .select(
            "event_type",
            F.col("day").alias("change_day"),
            F.col("c").alias("n_events_that_day"),
            F.col("s").alias("cusum_stat"),
            "n_days",
            "total",
        )
    )


@query(
    "window_drawdown_max",
    oracle="""
    WITH daily AS (
        SELECT o_orderpriority AS priority,
               CAST(o_orderdate AS DATE) AS day,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS rev_cents
        FROM orders GROUP BY 1, 2
    ),
    dd AS (
        SELECT priority, day, rev_cents,
               max(rev_cents) OVER (
                   PARTITION BY priority ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS peak_cents
        FROM daily
    ),
    r AS (
        SELECT priority, day, rev_cents, peak_cents,
               peak_cents - rev_cents AS drawdown_cents,
               row_number() OVER (
                   PARTITION BY priority
                   ORDER BY peak_cents - rev_cents DESC, day
               ) AS rnk,
               count(*) OVER (PARTITION BY priority) AS n_days
        FROM dd
    )
    SELECT priority, day AS trough_day, peak_cents,
           rev_cents AS trough_cents, drawdown_cents AS max_drawdown_cents,
           CAST(n_days AS BIGINT) AS n_days
    FROM r WHERE rnk = 1
    """,
)
def window_drawdown_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per priority segment — the risk metric of any
    revenue/throughput series: the deepest drop of a daily level series
    below its running historical peak, reported with the trough day that
    realizes it (earliest day on ties, so the answer is total-ordered).

    Scale shape: one shuffle to (priority, day) partial-aggregated daily
    cents, then two window passes over the SAME (priority ORDER BY day)
    sort — Catalyst reuses one Sort+Exchange for both the running max and
    the ranking, and days-per-series is bounded (≤ a few thousand rows per
    partition regardless of fact-table size), so the window state never
    spills. All arithmetic is exact integer cents.
    """
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderdate").cast("date").alias("day"),
        )
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast(
                    "bigint"
                )
            )
            .cast("bigint")
            .alias("rev_cents")
        )
    )
    series = Window.partitionBy("priority").orderBy("day")
    dd = daily.withColumn(
        "peak_cents",
        F.max("rev_cents").over(
            series.rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).withColumn("drawdown_cents", F.col("peak_cents") - F.col("rev_cents"))
    ranked = dd.withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy("priority").orderBy(
                F.col("drawdown_cents").desc(), "day"
            )
        ),
    ).withColumn(
        "n_days",
        F.count(F.lit(1)).over(Window.partitionBy("priority")).cast("bigint"),
    )
    return ranked.filter(F.col("rnk") == 1).select(
        "priority",
        F.col("day").alias("trough_day"),
        "peak_cents",
        F.col("rev_cents").alias("trough_cents"),
        F.col("drawdown_cents").alias("max_drawdown_cents"),
        "n_days",
    )


@query(
    "event_hazard_table",
    oracle="""
    WITH horizon AS (SELECT max(CAST(ts AS DATE)) AS h FROM events),
    su AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS s_day
        FROM events WHERE event_type = 'signup' GROUP BY 1
    ),
    pu AS (
        SELECT e.user_id, min(CAST(e.ts AS DATE)) AS c_day
        FROM events e JOIN su ON su.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND CAST(e.ts AS DATE) >= su.s_day
        GROUP BY 1
    ),
    u AS (
        SELECT su.user_id,
               date_diff('day', su.s_day, h.h) AS h_off,
               date_diff('day', su.s_day, pu.c_day) AS c_off
        FROM su CROSS JOIN horizon h
        LEFT JOIN pu ON pu.user_id = su.user_id
    ),
    offs AS (SELECT DISTINCT c_off AS d FROM u WHERE c_off IS NOT NULL)
    SELECT CAST(o.d AS BIGINT) AS day_offset,
           CAST((SELECT count(*) FROM u
                 WHERE coalesce(u.c_off, u.h_off) >= o.d) AS BIGINT)
               AS n_at_risk,
           CAST((SELECT count(*) FROM u WHERE u.c_off = o.d) AS BIGINT)
               AS n_converted
    FROM offs o
    """,
)
def event_hazard_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete survival/hazard table for signup→purchase conversion: for
    each day-offset d since a user's first signup, how many users were
    still at risk (not yet converted, observation window reaching d) and
    how many converted exactly at d. The discrete Kaplan–Meier estimator
    is n_converted/n_at_risk per row — kept as exact integer numerator and
    denominator so the table hash-verifies bit-for-bit.

    A user's at-risk interval is [0, risk_end] with
    risk_end = coalesce(first_conversion_offset, censor_offset) (a
    conversion inside the window always has c_off <= h_off), so
    n_at_risk(d) = #users with risk_end >= d — a DESCENDING cumulative sum
    over the per-offset user counts, NOT a per-(user, day) explode: the
    shuffled state is one row per user then one row per distinct offset,
    regardless of corpus size. The oracle states the same quantity as the
    naive correlated count so the rewrite itself is verified.
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("day"), "event_type"
    )
    horizon = ev.agg(F.max("day").alias("h"))
    su = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("day").alias("s_day"))
    )
    pu = (
        ev.filter(F.col("event_type") == "purchase")
        .join(su, "user_id")
        .filter(F.col("day") >= F.col("s_day"))
        .groupBy("user_id")
        .agg(F.min("day").alias("c_day"))
    )
    u = (
        su.crossJoin(F.broadcast(horizon))
        .join(pu, "user_id", "left")
        .select(
            "user_id",
            F.datediff("h", "s_day").alias("h_off"),
            F.datediff("c_day", "s_day").alias("c_off"),
        )
    )
    u = u.withColumn("risk_end", F.coalesce("c_off", "h_off"))
    end_counts = u.groupBy(F.col("risk_end").alias("d")).agg(
        F.count(F.lit(1)).alias("n_end")
    )
    conv_counts = (
        u.filter(F.col("c_off").isNotNull())
        .groupBy(F.col("c_off").alias("d"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_converted"))
    )
    dom = end_counts.select("d").union(conv_counts.select("d")).distinct()
    # collapsed frame (one row per distinct offset): constant partition key
    # keeps WindowExec single-partition by declaration, not accident
    desc = (
        Window.partitionBy(F.lit(0))
        .orderBy(F.col("d").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tbl = (
        dom.join(end_counts, "d", "left")
        .withColumn(
            "n_at_risk",
            F.sum(F.coalesce("n_end", F.lit(0))).over(desc).cast("bigint"),
        )
        .join(conv_counts, "d", "left")
        .filter(F.col("n_converted").isNotNull())
    )
    return tbl.select(
        F.col("d").cast("bigint").alias("day_offset"),
        "n_at_risk",
        "n_converted",
    )


@query(
    "event_trend_mann_kendall",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS v
        FROM events GROUP BY 1, 2
    ),
    s AS (
        SELECT a.event_type,
               CAST(sum(CASE WHEN b.v > a.v THEN 1
                             WHEN b.v < a.v THEN -1 ELSE 0 END)
                    AS BIGINT) AS s_stat
        FROM daily a JOIN daily b
          ON b.event_type = a.event_type AND b.day > a.day
        GROUP BY 1
    ),
    ties AS (
        SELECT event_type,
               CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
        FROM (SELECT event_type, v, count(*) AS t FROM daily GROUP BY 1, 2)
        GROUP BY 1
    ),
    n AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
        FROM daily GROUP BY 1
    )
    SELECT n.event_type, n.n_days, s.s_stat,
           CAST(n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                - ties.tie_term AS BIGINT) AS var_s_x18,
           CASE WHEN s.s_stat > 0 THEN 'increasing'
                WHEN s.s_stat < 0 THEN 'decreasing'
                ELSE 'no_trend' END AS trend
    FROM n JOIN s ON s.event_type = n.event_type
    JOIN ties ON ties.event_type = n.event_type
    """,
)
def event_trend_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test per event type over the daily value series
    — the standard NONPARAMETRIC monotonic-trend detector (no linearity
    or normality assumption, robust to outliers, the usual first question
    about any metric series: "is this actually going up?"). S = Σ_{i<j}
    sign(v_j − v_i); its tie-corrected variance rides along ×18 so both
    stay exact integers (the z-score needs a square root, so the caller
    takes it — every value the engine emits hashes cross-engine).

    Shape: collapse to the DAILY domain first (one partial-aggregated
    groupBy — the only pass over raw events), then the O(d²) pairwise
    sign sum runs inside each event_type's day series via a self-join on
    the tiny daily table (d ≈ 365/year — thousands of pairs per series,
    nothing at any corpus size). Same value-domain-collapse discipline as
    `agg_weighted_median`/`ml_auc_roc`: the quadratic never sees raw
    data.
    """
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.to_date("ts").alias("day")
        )
        .agg(
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint"))
            .cast("bigint")
            .alias("v")
        )
    )
    a = daily.select(
        "event_type", F.col("day").alias("day_a"), F.col("v").alias("va")
    )
    b = daily.select(
        "event_type", F.col("day").alias("day_b"), F.col("v").alias("vb")
    )
    s = (
        a.join(b, "event_type")
        .filter(F.col("day_b") > F.col("day_a"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("vb") > F.col("va"), 1)
                .when(F.col("vb") < F.col("va"), -1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("s_stat")
        )
    )
    ties = (
        daily.groupBy("event_type", "v")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            )
            .cast("bigint")
            .alias("tie_term")
        )
    )
    n = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days")
    )
    return (
        n.join(s, "event_type")
        .join(ties, "event_type")
        .select(
            "event_type",
            "n_days",
            "s_stat",
            (
                F.col("n_days")
                * (F.col("n_days") - 1)
                * (2 * F.col("n_days") + 5)
                - F.col("tie_term")
            )
            .cast("bigint")
            .alias("var_s_x18"),
            F.when(F.col("s_stat") > 0, "increasing")
            .when(F.col("s_stat") < 0, "decreasing")
            .otherwise("no_trend")
            .alias("trend"),
        )
    )


_KM_CENSOR_HOUR = 23  # still active in the day's last hour => censored


@query(
    "event_survival_km",
    oracle=f"""
    WITH ep AS (
        SELECT user_id, date_trunc('day', ts) AS day,
               CAST(date_part('hour', max(ts)) - date_part('hour', min(ts))
                    AS BIGINT) AS duration,
               date_part('hour', max(ts)) >= {_KM_CENSOR_HOUR} AS censored
        FROM events GROUP BY 1, 2
    ),
    total AS (SELECT CAST(count(*) AS BIGINT) AS n_users FROM ep),
    by_dur AS (
        SELECT duration,
               CAST(count(*) AS BIGINT) AS n_ending,
               CAST(sum(CASE WHEN censored THEN 0 ELSE 1 END) AS BIGINT)
                   AS deaths
        FROM ep GROUP BY duration
    ),
    risk AS (
        SELECT duration, deaths,
               (SELECT n_users FROM total)
                   - CAST(COALESCE(sum(n_ending) OVER (ORDER BY duration
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                          0) AS BIGINT) AS at_risk
        FROM by_dur
    ),
    steps AS (SELECT * FROM risk WHERE deaths > 0)
    SELECT s.duration, s.at_risk, s.deaths,
           CAST(list_reduce(
               list_prepend(CAST(1.0 AS DOUBLE),
                   list((p.at_risk - p.deaths) / p.at_risk
                        ORDER BY p.duration)),
               (a, b) -> a * b) AS DOUBLE) AS survival
    FROM steps s JOIN steps p ON p.duration <= s.duration
    GROUP BY s.duration, s.at_risk, s.deaths
    """,
)
def event_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival estimate of intraday engagement span: an
    episode is one (user, day), its duration is the hours between the
    user's first and last event that day, and episodes still active in
    the day's final hour (hour ≥ {_KM_CENSOR_HOUR}) are RIGHT-CENSORED —
    the observation window ended, not the engagement. This is the
    session-length survival curve a product analysis wants, where a
    naive "average active span" is biased low by the censored episodes.

    S(d) = Π_{{d' ≤ d, deaths(d')>0}} (1 − deaths/at_risk). The survival
    product is floating, but HASH-EXACT cross-engine anyway: each factor
    is a correctly-rounded quotient of exact integers, and both engines
    fold the factors in the same ascending-duration order (Spark: ordered
    array fold; DuckDB: list_reduce over an ORDER BY list) — the same
    fixed-order-fold determinism rule as `sketch_hll_merge`.

    Shape: one pass over events collapses to per-episode (first, last)
    hours — partial-aggregated min/max on (user, day). Everything after
    runs on the DURATION domain (≤ 24 rows): at-risk counts are one
    cumulative window, and the per-step cumulative product is a range
    self-join on the tiny step table. Raw events are never touched again.
    """
    ep = (
        load(spark, sf_dir, "events")
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(
            (F.hour(F.max("ts")) - F.hour(F.min("ts")))
            .cast("bigint")
            .alias("duration"),
            (F.hour(F.max("ts")) >= _KM_CENSOR_HOUR).alias("censored"),
        )
    )
    total = ep.agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    by_dur = ep.groupBy("duration").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ending"),
        F.sum(F.when(F.col("censored"), 0).otherwise(1))
        .cast("bigint")
        .alias("deaths"),
    )
    w_prev = (
        Window.partitionBy(F.lit(0))
        .orderBy("duration")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    risk = by_dur.crossJoin(F.broadcast(total)).select(
        "duration",
        "deaths",
        (
            F.col("n_users")
            - F.coalesce(F.sum("n_ending").over(w_prev), F.lit(0))
        )
        .cast("bigint")
        .alias("at_risk"),
    )
    steps = risk.filter(F.col("deaths") > 0)
    p = steps.select(
        F.col("duration").alias("p_duration"),
        F.col("at_risk").alias("p_at_risk"),
        F.col("deaths").alias("p_deaths"),
    )
    return (
        steps.join(p, F.col("p_duration") <= F.col("duration"))
        .groupBy("duration", "at_risk", "deaths")
        .agg(
            F.aggregate(
                F.array_sort(
                    F.collect_list(
                        F.struct("p_duration", "p_at_risk", "p_deaths")
                    )
                ),
                F.lit(1.0),
                lambda acc, s: acc
                * (
                    (s["p_at_risk"] - s["p_deaths"]).cast("double")
                    / s["p_at_risk"].cast("double")
                ),
            ).alias("survival")
        )
        .select("duration", "at_risk", "deaths", "survival")
    )


_BB_WINDOW = 20  # trailing days in the band


@query(
    "window_bollinger_breach",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS v
        FROM events GROUP BY 1, 2
    ),
    framed AS (
        SELECT event_type, day, v,
               CAST(count(*) OVER w AS BIGINT) AS n,
               CAST(sum(v) OVER w AS BIGINT) AS s1,
               CAST(sum(v * v) OVER w AS BIGINT) AS s2
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN {_BB_WINDOW - 1} PRECEDING
                           AND CURRENT ROW)
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day, v AS v_cents,
           n AS n_window,
           CAST(s1 * 100 // n AS BIGINT) AS mean_x100,
           CAST(n * s2 - s1 * s1 AS BIGINT) AS var_num,
           ((v * n - s1) > 0 AND
            (v * n - s1) * (v * n - s1) > 4 * (n * s2 - s1 * s1))
               AS breach_upper,
           ((v * n - s1) < 0 AND
            (v * n - s1) * (v * n - s1) > 4 * (n * s2 - s1 * s1))
               AS breach_lower
    FROM framed
    """,
)
def window_bollinger_breach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger-band breach detection over the daily value series: for
    each (event_type, day), is the day's value more than 2 trailing
    standard deviations above/below the trailing {_BB_WINDOW}-day mean —
    the classic volatility-scaled anomaly band (complements
    `event_burst_zscore`'s fixed z-score with a rolling-σ one).

    σ is irrational, so the band test runs ENTIRELY in integers via the
    squared cross-multiplied identity:
        |v − s1/n| > 2·σ  ⇔  (v·n − s1)² > 4·(n·s2 − s1²)
    with s1 = Σv, s2 = Σv² over the trailing frame (cents keep every
    term < 2⁶³). The mean (×100, integer DIV) and the variance numerator
    ride along, so every emitted value hashes cross-engine — no sqrt, no
    float variance, same no-transcendentals rule as the whole family.

    Shape: one partial-aggregated groupBy to the daily domain, then one
    window per event_type over ≤ |days| rows with count/sum/sum-of-
    squares in a single frame pass. Raw events are scanned once.
    """
    daily = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint"))
            .cast("bigint")
            .alias("v")
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-(_BB_WINDOW - 1), 0)
    )
    framed = daily.select(
        "event_type",
        "day",
        "v",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n"),
        F.sum("v").over(w).cast("bigint").alias("s1"),
        F.sum(F.col("v") * F.col("v")).over(w).cast("bigint").alias("s2"),
    )
    dev = F.col("v") * F.col("n") - F.col("s1")
    var4 = 4 * (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1"))
    return framed.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("v").alias("v_cents"),
        F.col("n").alias("n_window"),
        F.expr("CAST(s1 * 100 DIV n AS BIGINT)").alias("mean_x100"),
        (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1"))
        .cast("bigint")
        .alias("var_num"),
        ((dev > 0) & (dev * dev > var4)).alias("breach_upper"),
        ((dev < 0) & (dev * dev > var4)).alias("breach_lower"),
    )


# ---- half-life decayed LTV (timeseries.py append) ---------------------------
_LTV_HALF_LIFE_DAYS = 7   # weight halves every week of age
_LTV_MAX_HALVINGS = 20    # cap: ages past 20 half-lives contribute ~1e-6


def _decay_ltv_oracle() -> str:
    return f"""
    WITH ev AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events
    ),
    anchor AS (SELECT max(day) AS d1 FROM ev),
    aged AS (
        SELECT e.user_id, e.cents, e.day,
               least(CAST(datediff('day', e.day, a.d1) AS BIGINT)
                     // {_LTV_HALF_LIFE_DAYS}, {_LTV_MAX_HALVINGS}) AS k
        FROM ev e CROSS JOIN anchor a
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(cents) AS BIGINT) AS raw_cents,
           CAST(sum(cents * (CAST(1 AS BIGINT) << ({_LTV_MAX_HALVINGS} - k)))
                AS BIGINT) AS decayed_cents_x2p20,
           strftime(max(day), '%Y-%m-%d') AS last_seen
    FROM aged GROUP BY user_id
    """


@query("event_decay_ltv", oracle=_decay_ltv_oracle())
def event_decay_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Half-life-decayed lifetime value per user: each event's cents are
    weighted by 2^(-age/{_LTV_HALF_LIFE_DAYS}d half-lives, integer
    halvings, capped at {_LTV_MAX_HALVINGS}) relative to the corpus's
    latest day — the standard recency-weighted LTV/engagement score
    (RFM's R and M folded into one number). DYADIC weights are the trick
    that keeps it exact: 2^-k values scale to integers by 2^{_LTV_MAX_HALVINGS},
    so the decayed sum is pure int64 arithmetic and hashes cross-engine —
    no float pow, no rounding drift.

    Scale shape: one events scan; the anchor day is a 1-row aggregate
    cross-joined (broadcast) back; the rollup is one partial-agg groupBy
    on user_id. O(events) map work, shuffle O(users)."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.to_date("ts").alias("day"),
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    anchor = ev.agg(F.max("day").alias("d1"))
    aged = ev.crossJoin(F.broadcast(anchor)).select(
        "user_id",
        "day",
        "cents",
        F.expr(
            f"least(CAST(datediff(d1, day) AS BIGINT)"
            f" DIV {_LTV_HALF_LIFE_DAYS}, {_LTV_MAX_HALVINGS})"
        ).alias("k"),
    )
    return aged.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("cents").cast("bigint").alias("raw_cents"),
        F.expr(
            f"CAST(sum(cents * shiftleft(CAST(1 AS BIGINT),"
            f" {_LTV_MAX_HALVINGS} - CAST(k AS INT))) AS BIGINT)"
        ).alias("decayed_cents_x2p20"),
        F.date_format(F.max("day"), "yyyy-MM-dd").alias("last_seen"),
    )


# ---- RSI momentum oscillator (round 8, batch 2) -----------------------------
_RSI_N = 14  # Wilder's classic lookback (here: simple 14-delta window)


def _rsi_oracle() -> str:
    return f"""
    WITH daily AS (
        SELECT event_type,
               CAST(epoch_ns(ts) // 86400000000000 AS BIGINT) AS day,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM events GROUP BY 1, 2
    ),
    delta AS (
        SELECT event_type, day, cents,
               cents - lag(cents) OVER w AS d,
               row_number() OVER w AS rn
        FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ),
    gl AS (
        SELECT event_type, day, rn,
               sum(CASE WHEN d > 0 THEN d ELSE 0 END) OVER v AS gains,
               sum(CASE WHEN d < 0 THEN -d ELSE 0 END) OVER v AS losses
        FROM delta
        WINDOW v AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN {_RSI_N - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, day,
           CAST(gains AS BIGINT) AS gain_cents,
           CAST(losses AS BIGINT) AS loss_cents,
           CAST(CASE WHEN gains + losses = 0 THEN 5000
                ELSE gains * 10000 // (gains + losses) END AS BIGINT)
               AS rsi_x100
    FROM gl WHERE rn > {_RSI_N}
    """


@query("window_rsi_momentum", oracle=_rsi_oracle())
def window_rsi_momentum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RSI momentum oscillator over daily per-type value totals: the
    share of the last {_RSI_N} day-over-day deltas' magnitude that was
    gains, ×100 (RSI = 100·ΣG/(ΣG+ΣL); flat windows pin to the 50
    midline). The overbought/oversold oscillator every monitoring
    dashboard reuses for burn-rate and engagement-momentum panels —
    exact integer cents end-to-end, so both engines agree bitwise.

    Scale shape: events collapse to the (type, day) domain in one
    partial-agg shuffle (~10⁴:1 like the module's other daily series);
    the delta lag and the {_RSI_N}-row rolling sums are TWO window
    passes over the SAME partition key (one exchange, consecutive
    Window nodes); nothing touches raw events after the collapse."""
    daily = (
        load(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr("ts_ns DIV 86400000000000").alias("day"),
            F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("c"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("c").cast("bigint").alias("cents"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    delta = daily.select(
        "event_type",
        "day",
        (F.col("cents") - F.lag("cents").over(w)).alias("d"),
        F.row_number().over(w).alias("rn"),
    )
    v = w.rowsBetween(-(_RSI_N - 1), 0)
    gl = delta.select(
        "event_type",
        "day",
        "rn",
        F.sum(F.when(F.col("d") > 0, F.col("d")).otherwise(0)).over(v).alias("gains"),
        F.sum(F.when(F.col("d") < 0, -F.col("d")).otherwise(0)).over(v).alias("losses"),
    )
    return gl.filter(F.col("rn") > _RSI_N).select(
        "event_type",
        "day",
        F.col("gains").cast("bigint").alias("gain_cents"),
        F.col("losses").cast("bigint").alias("loss_cents"),
        F.expr(
            "CAST(CASE WHEN gains + losses = 0 THEN 5000"
            " ELSE gains * 10000 DIV (gains + losses) END AS BIGINT)"
        ).alias("rsi_x100"),
    )

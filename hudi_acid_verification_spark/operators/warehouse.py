"""Warehouse-grade temporal and financial operators: time-constrained
funnels (ClickHouse ``windowFunnel`` semantics), largest-remainder penny
allocation, RFM segmentation, and SCD2 point-in-time joins.

These are the operators a reference user coming from a commercial
OLAP/warehouse stack expects to exist; each is expressed as windows +
joins over collapsed frames with exact integer arithmetic so the DuckDB
oracle hashes bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import load, query

_FUNNEL_GAP_US = 7 * 24 * 3600 * 1_000_000  # max 7 days between steps


@query(
    "event_funnel_windowed",
    oracle=f"""
    WITH ev AS (
        SELECT user_id, event_type, epoch_us(ts) AS t, event_id
        FROM events
        WHERE event_type IN ('view', 'click', 'purchase')
    ),
    v AS (
        SELECT user_id, min(t) AS t_view FROM ev
        WHERE event_type = 'view' GROUP BY 1
    ),
    c AS (
        SELECT e.user_id, min(e.t) AS t_click
        FROM ev e JOIN v ON v.user_id = e.user_id
        WHERE e.event_type = 'click'
          AND e.t >= v.t_view AND e.t - v.t_view <= {_FUNNEL_GAP_US}
        GROUP BY 1
    ),
    p AS (
        SELECT e.user_id, min(e.t) AS t_buy
        FROM ev e JOIN c ON c.user_id = e.user_id
        WHERE e.event_type = 'purchase'
          AND e.t >= c.t_click AND e.t - c.t_click <= {_FUNNEL_GAP_US}
        GROUP BY 1
    ),
    lv AS (
        SELECT v.user_id,
               1 + (CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END)
                 + (CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END) AS level
        FROM v LEFT JOIN c ON c.user_id = v.user_id
               LEFT JOIN p ON p.user_id = c.user_id
    )
    SELECT CAST(level AS BIGINT) AS level,
           CAST(count(*) AS BIGINT) AS n_users
    FROM lv GROUP BY 1
    """,
)
def event_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-constrained funnel (the ClickHouse ``windowFunnel`` semantic,
    greedy-earliest variant): view → click → purchase where each step
    must follow the previous one within 7 days, anchored at the user's
    FIRST view and advancing through the earliest qualifying event of
    each next step. The plain funnel (`event_funnel`) only asks "did the
    steps ever happen in order"; the windowed form is what conversion
    analysis actually uses — a purchase six months after the click does
    not count.

    Shape: three per-user min-aggregates chained by broadcast-joinable
    per-user frames (|users| rows each after the first collapse). Raw
    events are scanned once per step type with the step filter pushed to
    the scan; every join key is user_id, so at 100 TB this is one
    shuffle-partitioning reused across the chain — AQE broadcasts the
    shrinking step frames. All comparisons are exact integer µs.
    """
    e = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click", "purchase")
    )
    ev = e.select(
        "user_id", "event_type", F.expr("ts_ns DIV 1000").alias("t")
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("t").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("t") >= F.col("t_view"))
            & (F.col("t") - F.col("t_view") <= _FUNNEL_GAP_US)
        )
        .groupBy("user_id")
        .agg(F.min("t").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("t") >= F.col("t_click"))
            & (F.col("t") - F.col("t_click") <= _FUNNEL_GAP_US)
        )
        .groupBy("user_id")
        .agg(F.min("t").alias("t_buy"))
    )
    lv = (
        v.join(c.select("user_id", F.lit(1).alias("has_c")), "user_id", "left")
        .join(p.select("user_id", F.lit(1).alias("has_p")), "user_id", "left")
        .select(
            (
                F.lit(1)
                + F.coalesce(F.col("has_c"), F.lit(0))
                + F.coalesce(F.col("has_p"), F.lit(0))
            ).alias("level")
        )
    )
    return lv.groupBy("level").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    ).select(F.col("level").cast("bigint").alias("level"), "n_users")


_DISCOUNT_BP = 250  # allocate a 2.5% (250 basis-point) rebate per order


@query(
    "scalar_penny_allocation",
    oracle=f"""
    WITH lines AS (
        SELECT l_orderkey, l_linenumber,
               CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
        FROM lineitem
    ),
    totals AS (
        SELECT l_orderkey,
               CAST(sum(cents) AS BIGINT) AS order_cents,
               CAST((sum(cents) * {_DISCOUNT_BP}) // 10000 AS BIGINT)
                   AS rebate_cents
        FROM lines GROUP BY 1
    ),
    alloc AS (
        SELECT l.l_orderkey, l.l_linenumber, l.cents, t.rebate_cents,
               (l.cents * t.rebate_cents) // t.order_cents AS base_cents,
               (l.cents * t.rebate_cents) % t.order_cents AS remainder,
               row_number() OVER (
                   PARTITION BY l.l_orderkey
                   ORDER BY (l.cents * t.rebate_cents) % t.order_cents DESC,
                            l.l_linenumber, l.cents
               ) AS rnk,
               t.rebate_cents
                   - CAST(sum((l.cents * t.rebate_cents) // t.order_cents)
                          OVER (PARTITION BY l.l_orderkey) AS BIGINT)
                   AS pennies_left
        FROM lines l JOIN totals t ON t.l_orderkey = l.l_orderkey
    )
    SELECT l_orderkey, l_linenumber, cents,
           CAST(base_cents + CASE WHEN rnk <= pennies_left THEN 1 ELSE 0 END
                AS BIGINT) AS alloc_cents
    FROM alloc
    """,
)
def scalar_penny_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder penny allocation: distribute a per-order rebate
    (2.5% of the order total, floored to whole cents) across the order's
    line items proportionally to value, such that the allocated cents SUM
    EXACTLY to the rebate — the invoicing/revenue-recognition primitive
    no floating-point proration can provide (naive rounding gains or
    loses pennies). Each line takes floor(share); the leftover pennies go
    to the lines with the largest remainders (ties by line number).

    Shape (optimization r8): order totals come from a full-partition
    WINDOW sum instead of a groupBy + self-join back — the old plan
    scanned the fact into an aggregation exchange AND joined the result
    against a second copy of the lines; every quantity here is keyed on
    l_orderkey, so the whole operator is now literally a single exchange
    feeding three same-key window passes (totals, remainder ranks, the
    floor-sum). Pure int64 arithmetic throughout (cents × basis points
    stays < 2^63 for any real order) — window sums and grouped sums add
    the same integers, so every output is bit-identical.
    """
    li = load(spark, sf_dir, "lineitem")
    lines = li.select(
        "l_orderkey",
        "l_linenumber",
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    w_tot = Window.partitionBy("l_orderkey")
    j = lines.withColumn(
        "order_cents", F.sum("cents").over(w_tot).cast("bigint")
    ).withColumn(
        "rebate_cents",
        F.expr(f"CAST((order_cents * {_DISCOUNT_BP}) DIV 10000 AS BIGINT)"),
    )
    base = F.expr("(cents * rebate_cents) DIV order_cents")
    rem = F.expr("(cents * rebate_cents) % order_cents")
    # tie-break includes cents: the fixture reuses line numbers within an
    # order, and two equal-remainder lines must rank identically in both
    # engines (identical triples are interchangeable — same output multiset)
    w_rank = Window.partitionBy("l_orderkey").orderBy(
        rem.desc(), "l_linenumber", "cents"
    )
    w_ord = Window.partitionBy("l_orderkey")
    alloc = j.select(
        "l_orderkey",
        "l_linenumber",
        "cents",
        base.alias("base_cents"),
        F.row_number().over(w_rank).alias("rnk"),
        (
            F.col("rebate_cents") - F.sum(base).over(w_ord).cast("bigint")
        ).alias("pennies_left"),
    )
    return alloc.select(
        "l_orderkey",
        "l_linenumber",
        "cents",
        (
            F.col("base_cents")
            + F.when(F.col("rnk") <= F.col("pennies_left"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("alloc_cents"),
    )


_RFM_BUCKETS = 4  # quartile scoring


@query(
    "event_rfm_segmentation",
    oracle=f"""
    WITH base AS (
        SELECT user_id,
               max(epoch_us(ts)) AS last_us,
               CAST(count(*) AS BIGINT) AS frequency,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   AS monetary_cents
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1
    ),
    scored AS (
        SELECT user_id,
               ntile({_RFM_BUCKETS}) OVER (ORDER BY last_us DESC, user_id)
                   AS r_score,
               ntile({_RFM_BUCKETS}) OVER (
                   ORDER BY frequency DESC, user_id) AS f_score,
               ntile({_RFM_BUCKETS}) OVER (
                   ORDER BY monetary_cents DESC, user_id) AS m_score
        FROM base
    )
    SELECT CAST(r_score AS BIGINT) AS r_score,
           CAST(f_score AS BIGINT) AS f_score,
           CAST(m_score AS BIGINT) AS m_score,
           CAST(count(*) AS BIGINT) AS n_users
    FROM scored GROUP BY 1, 2, 3
    """,
)
def event_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: quartile-score every purchasing user on Recency
    (latest purchase), Frequency (purchase count), and Monetary (exact
    cents), then count the segment grid — the marketing-analytics
    workhorse (a '111' cell is your champions, '444' your churned). All
    three ntiles use (metric, user_id) total orders so bucket boundaries
    are deterministic.

    Scale: raw events collapse to one row per purchasing user first
    (partial-aggregated); the three ntile windows run over that frame.
    A global ntile is a single-partition sort at extreme scale — there
    the quartile CUTS come from sketch_histogram_quantile and scoring
    becomes a broadcast range lookup; the segment semantics (this
    operator's contract) are unchanged.
    """
    e = load(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    base = e.groupBy("user_id").agg(
        F.max(F.expr("ts_ns DIV 1000")).alias("last_us"),
        F.count(F.lit(1)).cast("bigint").alias("frequency"),
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint"))
        .cast("bigint")
        .alias("monetary_cents"),
    )
    g = Window.partitionBy(F.lit(0))
    scored = base.select(
        F.ntile(_RFM_BUCKETS)
        .over(g.orderBy(F.col("last_us").desc(), "user_id"))
        .alias("r_score"),
        F.ntile(_RFM_BUCKETS)
        .over(g.orderBy(F.col("frequency").desc(), "user_id"))
        .alias("f_score"),
        F.ntile(_RFM_BUCKETS)
        .over(g.orderBy(F.col("monetary_cents").desc(), "user_id"))
        .alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .select(
            F.col("r_score").cast("bigint").alias("r_score"),
            F.col("f_score").cast("bigint").alias("f_score"),
            F.col("m_score").cast("bigint").alias("m_score"),
            "n_users",
        )
    )


@query(
    "join_scd2_point_in_time",
    oracle="""
    WITH changes AS (
        SELECT o_custkey AS custkey, o_orderpriority AS segment,
               o_orderdate AS valid_from, o_orderkey,
               row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
               ) AS version
        FROM orders
    ),
    dim AS (
        SELECT custkey, segment, version, valid_from,
               lead(valid_from) OVER (
                   PARTITION BY custkey ORDER BY version
               ) AS valid_to
        FROM changes
    ),
    fact AS (
        SELECT o.o_custkey AS custkey, l.l_shipdate AS ship,
               CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    )
    SELECT d.segment,
           CAST(d.version AS BIGINT) AS version,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(f.cents) AS BIGINT) AS cents
    FROM fact f
    JOIN dim d ON d.custkey = f.custkey
              AND f.ship >= d.valid_from
              AND (d.valid_to IS NULL OR f.ship < d.valid_to)
    GROUP BY 1, 2
    """,
)
def join_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 point-in-time join: a slowly-changing dimension is
    derived from order history (each customer's order priority over time
    becomes a versioned [valid_from, valid_to) interval via one
    lead() window — the standard SCD2 build), and each shipment fact
    joins to the version that was ACTIVE at ship time. This is the
    temporal-correctness join every warehouse needs: joining facts to the
    dimension's CURRENT row silently rewrites history.

    Shape: the dimension build is one window over custkey; the
    point-in-time join is an equi-join on custkey with the interval
    predicate as a residual filter — NOT a pure range join, so it
    partitions on the key like any equi-join (the interval only prunes
    within a customer's own few versions). At 100 TB: facts shuffle once
    by custkey; dim versions per key are bounded by change frequency, so
    the residual scan is O(versions-per-key), not O(|dim|).
    """
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    w_v = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    changes = o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderpriority").alias("segment"),
        F.col("o_orderdate").alias("valid_from"),
        F.row_number().over(w_v).alias("version"),
    )
    w_l = Window.partitionBy("custkey").orderBy("version")
    dim = changes.select(
        "custkey",
        "segment",
        "version",
        "valid_from",
        F.lead("valid_from").over(w_l).alias("valid_to"),
    )
    fact = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_custkey").alias("fcustkey"),
        F.col("l_shipdate").alias("ship"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    joined = fact.join(
        dim,
        (F.col("fcustkey") == F.col("custkey"))
        & (F.col("ship") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("ship") < F.col("valid_to"))),
    )
    return joined.groupBy("segment", "version").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum("cents").cast("bigint").alias("cents"),
    ).select(
        "segment",
        F.col("version").cast("bigint").alias("version"),
        "n_lines",
        "cents",
    )


@query(
    "event_heatmap_dow_hour",
    oracle="""
    WITH cells AS (
        SELECT CAST(dayofweek(ts) AS BIGINT) AS dow,
               CAST(hour(ts) AS BIGINT) AS hod,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1, 2
    ),
    total AS (SELECT CAST(sum(n_events) AS BIGINT) AS tot FROM cells)
    SELECT dow, hod, n_events,
           CAST(n_events AS DOUBLE) / tot AS share
    FROM cells, total
    """,
)
def event_heatmap_dow_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour-of-day activity heatmap (counts + corpus
    share) — the load-profile matrix behind capacity planning and
    anomaly baselining (a Tuesday-3am hot cell is an incident, a
    Friday-5pm one is payday). Calendar extraction runs in the session's
    pinned UTC zone so both engines bucket identically; DuckDB's
    dayofweek is 0=Sunday while Spark's dayofweek is 1=Sunday — the
    Spark side subtracts 1 to align the contract.

    One partial-aggregated pass collapsing to ≤ 168 cells; the share is
    a single division against the broadcast total.
    """
    e = load(spark, sf_dir, "events")
    cells = e.groupBy(
        (F.dayofweek("ts") - 1).cast("bigint").alias("dow"),
        F.hour("ts").cast("bigint").alias("hod"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    total = cells.agg(F.sum("n_events").cast("bigint").alias("tot"))
    return cells.crossJoin(F.broadcast(total)).select(
        "dow",
        "hod",
        "n_events",
        (F.col("n_events").cast("double") / F.col("tot")).alias("share"),
    )


_PATH_LEN = 5   # first N events define the user's entry path
_PATH_TOP = 20


@query(
    "event_top_paths",
    oracle=f"""
    WITH ranked AS (
        SELECT user_id, event_type,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS rn
        FROM events
    ),
    paths AS (
        SELECT user_id,
               string_agg(event_type, '>' ORDER BY rn) AS path
        FROM ranked WHERE rn <= {_PATH_LEN}
        GROUP BY user_id
    ),
    counted AS (
        SELECT path, CAST(count(*) AS BIGINT) AS n_users
        FROM paths GROUP BY path
    )
    SELECT path, n_users FROM (
        SELECT path, n_users,
               row_number() OVER (ORDER BY n_users DESC, path) AS rnk
        FROM counted
    ) WHERE rnk <= {_PATH_TOP}
    """,
)
def event_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top entry paths: each user's first {N} events concatenated in
    arrival order, ranked by how many users share the exact path — the
    user-journey / Sankey source every product-analytics tool renders
    ('view>view>click>purchase' vs 'view>error>view>error…' tells you
    more than any single funnel).

    One window pass keyed on user_id ranks events; the path assembles in
    the per-user rollup via an order-pinned fold (sorted struct collect →
    concat), NO second shuffle; path counting collapses to |distinct
    paths| rows and the top-k is a rank over that frame. Ties break on
    the path string so the cut is deterministic.
    """
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    ranked = e.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= _PATH_LEN)
    paths = ranked.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    counted = paths.groupBy("path").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
    w_top = Window.partitionBy(F.lit(0)).orderBy(
        F.col("n_users").desc(), "path"
    )
    return (
        counted.withColumn("rnk", F.row_number().over(w_top))
        .filter(F.col("rnk") <= _PATH_TOP)
        .select("path", "n_users")
    )


@query(
    "agg_pareto_coverage",
    oracle="""
    WITH rev AS (
        SELECT c.c_nationkey AS nationkey, o.o_custkey,
               CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT nationkey, o_custkey, cents,
               sum(cents) OVER (
                   PARTITION BY nationkey
                   ORDER BY cents DESC, o_custkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum,
               sum(cents) OVER (PARTITION BY nationkey) AS total
        FROM rev
    )
    SELECT nationkey,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CASE WHEN 5 * (cum - cents) < 4 * total
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_pareto,
           CAST((sum(CASE WHEN 5 * (cum - cents) < 4 * total
                          THEN 1 ELSE 0 END) * 10000) // count(*)
                AS BIGINT) AS pareto_pct_x100,
           CAST(max(total) AS BIGINT) AS total_cents
    FROM ranked
    GROUP BY 1
    """,
)
def agg_pareto_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto (80/20) concentration analysis: per nation, the SMALLEST set
    of customers whose revenue covers ≥80% of the nation's total — the
    concentration-risk / whale-detection rollup every revenue dashboard
    carries. A customer belongs to the Pareto set iff the running total
    BEFORE them is still under the threshold; the test is the exact
    integer cross-multiplication 5·(cum − cents) < 4·total (0.8 = 4/5),
    so membership, counts, and the ×100 coverage percentage all
    hash-match the oracle with no floating threshold anywhere.

    Scale shape: one partial-agg shuffle to per-customer cents, a
    customer-dim broadcast join for the nation key, then ONE window sort
    per nation (the partition key bounds the sort's shuffle); the final
    rollup collapses to ≤ nation-count rows. Revenue stays in bigint
    cents end-to-end — the decimal-sum trap documented in
    aggregations.py never arises.

    100 TB overflow note (r5 audit): the cross-multiplications 5·(cum −
    cents) and 4·total are LINEAR in per-nation revenue — int64 holds
    until a single nation's total exceeds ~1.8·10¹⁸ cents ($1.8·10¹⁶),
    four orders of magnitude past world GDP in cents; unlike the gini
    rank-sum (quadratic, widened to decimal) no widening is needed.
    """
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_nationkey").alias("nationkey"),
    )
    rev = (
        orders.groupBy("o_custkey")
        .agg(F.sum("cents").cast("bigint").alias("cents"))
        .join(F.broadcast(cust), "o_custkey")
    )
    w_cum = (
        Window.partitionBy("nationkey")
        .orderBy(F.col("cents").desc(), "o_custkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("nationkey")
    ranked = rev.select(
        "nationkey",
        "cents",
        F.sum("cents").over(w_cum).alias("cum"),
        F.sum("cents").over(w_tot).alias("total"),
    )
    in_pareto = F.when(
        5 * (F.col("cum") - F.col("cents")) < 4 * F.col("total"), 1
    ).otherwise(0)
    return ranked.groupBy("nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum(in_pareto).cast("bigint").alias("n_pareto"),
        F.expr(
            "CAST((sum(CASE WHEN 5 * (cum - cents) < 4 * total THEN 1 ELSE 0 "
            "END) * 10000) DIV count(*) AS BIGINT)"
        ).alias("pareto_pct_x100"),
        F.max("total").cast("bigint").alias("total_cents"),
    )


@query(
    "event_ab_assignment_lift",
    oracle="""
    WITH assigned AS (
        SELECT user_id,
               CASE WHEN CAST(('0x' || substr(md5('exp1:'
                         || CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT)
                         % 2 = 0
                    THEN 'A' ELSE 'B' END AS arm,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_views,
               CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS converted
        FROM events
        GROUP BY 1
    )
    SELECT arm,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(converted) AS BIGINT) AS n_converted,
           CAST((sum(converted) * 1000000) // count(*) AS BIGINT)
               AS conv_rate_x1m,
           CAST(sum(n_views) AS BIGINT) AS total_views
    FROM assigned GROUP BY 1
    """,
)
def event_ab_assignment_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout with DETERMINISTIC hash bucketing: users are
    assigned to arms by a salted md5 of their id — the industry-standard
    assignment function (same user ⇒ same arm forever, no assignment
    table, no coordination) — then per-arm exposure and conversion
    aggregate in one pass. Conversion rates are served ×10⁶ via integer
    DIV, so the readout (the input to any significance test) is
    bit-identical across engines; the z/χ² statistic itself is a driver-
    side O(1) computation on these four integers, deliberately left out
    of the distributed plan.

    Scale shape: one partial-agg shuffle on user_id (the per-user
    collapse), then a 2-row rollup. The assignment hash is a narrow
    codegen'd expression — at 100 TB the experiment readout costs exactly
    one scan of the exposure log, which is why hash-assignment won over
    assignment tables in every large experimentation platform.

    100 TB overflow note (r5 audit): sum(converted) ≤ n_users, so
    sum(converted)·10⁶ stays under int64 until 9.2·10¹² experiment users —
    three orders of magnitude past the world population; no widening
    needed (contrast agg_gini_coefficient's quadratic rank-sum).
    """
    arm = F.when(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("exp1:"), F.col("user_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 2
        == 0,
        "A",
    ).otherwise("B")
    per_user = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
            .cast("bigint")
            .alias("n_views"),
            F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("bigint")
            .alias("converted"),
        )
        .withColumn("arm", arm)
    )
    return per_user.groupBy("arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("converted").cast("bigint").alias("n_converted"),
        F.expr(
            "CAST((sum(converted) * 1000000) DIV count(*) AS BIGINT)"
        ).alias("conv_rate_x1m"),
        F.sum("n_views").cast("bigint").alias("total_views"),
    )


@query(
    "agg_gini_coefficient",
    oracle="""
    WITH rev AS (
        SELECT c.c_nationkey AS nationkey, o.o_custkey,
               CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT nationkey, cents,
               row_number() OVER (
                   PARTITION BY nationkey ORDER BY cents, o_custkey
               ) AS i
        FROM rev
    )
    SELECT nationkey,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(cents) AS BIGINT) AS total_cents,
           CAST(((2 * sum(i * cents) - (count(*) + 1) * sum(cents)) * 10000)
                // (count(*) * sum(cents)) AS BIGINT) AS gini_x10000
    FROM ranked GROUP BY 1
    """,
)
def agg_gini_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini inequality coefficient of customer revenue per nation — the
    scalar companion of ``agg_pareto_coverage`` (that one answers "how few
    customers cover 80%", this one summarizes the whole Lorenz curve). The
    rank-sum identity G = (2·Σi·xᵢ − (n+1)·Σx) / (n·Σx) over ascending-
    sorted values is evaluated in exact integer arithmetic and served ×10⁴
    with one integer DIV — no float accumulates anywhere, so the
    coefficient hash-matches the oracle exactly.

    100 TB overflow note (r5 audit, the quality_lang_drift_tv pattern):
    the rank-sum Σi·xᵢ is quadratic in per-nation cardinality — at 10⁸
    customers averaging 10⁶ cents it reaches ~5·10²¹, past int64 — so the
    products and their sums run in DECIMAL(38,0) (exact to 10³⁸; Spark's
    sums and n·Σx stay far below). DuckDB needs no change: its BIGINT
    sums auto-promote to HUGEINT (int128). The quotient is ≤ 10⁴ so the
    final CAST back to BIGINT is always safe.

    Scale shape: per-customer collapse (one partial-agg shuffle), a
    broadcast dim join, ONE ranking window per nation (partition-bounded
    sort), and a ≤ nation-count rollup. Ties rank deterministically by
    customer key, mirrored in the oracle's ORDER BY.
    """
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_nationkey").alias("nationkey"),
    )
    rev = (
        orders.groupBy("o_custkey")
        .agg(F.sum("cents").cast("bigint").alias("cents"))
        .join(F.broadcast(cust), "o_custkey")
    )
    w = Window.partitionBy("nationkey").orderBy("cents", "o_custkey")
    ranked = rev.select(
        "nationkey", "cents", F.row_number().over(w).cast("bigint").alias("i")
    )
    return ranked.groupBy("nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("cents").cast("bigint").alias("total_cents"),
        F.expr(
            "CAST(((2 * sum(CAST(i AS DECIMAL(38,0)) * cents)"
            " - (count(*) + 1) * CAST(sum(cents) AS DECIMAL(38,0))) * 10000)"
            " DIV (count(*) * CAST(sum(cents) AS DECIMAL(38,0))) AS BIGINT)"
        ).alias("gini_x10000"),
    )


_CONC_GAP_US = 30 * 60 * 1_000_000  # sessionization gap (pipelines.py)
_US_PER_DAY = 86_400_000_000


@query(
    "event_concurrency_peak",
    oracle=f"""
    WITH ev AS (SELECT user_id, epoch_us(ts) AS t FROM events),
    gaps AS (
        SELECT user_id, t,
               CASE WHEN t - lag(t) OVER w > {_CONC_GAP_US}
                         OR lag(t) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY t)
    ),
    sess AS (
        SELECT user_id,
               sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY t
                   ROWS UNBOUNDED PRECEDING
               ) AS session_idx,
               t
        FROM gaps
    ),
    spans AS (
        SELECT user_id, session_idx, min(t) AS s, max(t) + 1 AS e
        FROM sess GROUP BY user_id, session_idx
    ),
    bounds AS (
        SELECT user_id, s AS t, 1 AS delta FROM spans
        UNION ALL
        SELECT user_id, e AS t, -1 AS delta FROM spans
    ),
    walk AS (
        SELECT t, delta, user_id,
               sum(delta) OVER (
                   ORDER BY t, delta DESC, user_id
                   ROWS UNBOUNDED PRECEDING
               ) AS running
        FROM bounds
    )
    SELECT CAST(day AS BIGINT) AS day,
           CAST(running AS BIGINT) AS peak_concurrency,
           CAST(t AS BIGINT) AS at_us,
           CAST(n AS BIGINT) AS n_boundaries
    FROM (
        SELECT t // {_US_PER_DAY} AS day, t, running,
               count(*) OVER (PARTITION BY t // {_US_PER_DAY}) AS n,
               row_number() OVER (
                   PARTITION BY t // {_US_PER_DAY}
                   ORDER BY running DESC, t, user_id
               ) AS rnk
        FROM walk
    ) WHERE rnk = 1
    """,
)
def event_concurrency_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day — the capacity-planning number
    (licenses, connection pools, autoscaler ceilings) — by the sweep-line
    identity: sessionize, emit +1 at each session start and −1 just after
    its end, order the boundary stream, and the running sum IS the live
    concurrency; the per-day argmax row is the peak and when it happened.

    The running sum is global (not per-day) so sessions spanning midnight
    carry their count across the boundary correctly. Ties in the argmax
    break on (earliest time, user id) — a total order, so the reported
    instant is deterministic and the whole result hashes cross-engine
    (pure integer microsecond arithmetic throughout).

    Scale shape: raw events collapse to sessions (one user-keyed window +
    rollup), sessions to 2 boundary rows each — ~10³× smaller than the
    event stream before any global ordering touches it. The ordered
    prefix sum over the collapsed boundary stream is the one
    intentionally-serial step; at 100 TB it becomes the standard
    two-phase segment sum (per-partition totals, broadcast prefix
    offsets) — the plan's data reduction is what makes that cheap.
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.expr("ts_ns DIV 1000").alias("t")
    )
    w = Window.partitionBy("user_id").orderBy("t")
    sess = (
        ev.withColumn(
            "new_session",
            F.when(
                (F.col("t") - F.lag("t").over(w) > _CONC_GAP_US)
                | F.lag("t").over(w).isNull(),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "session_idx",
            F.sum("new_session").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("user_id", "session_idx")
        .agg(F.min("t").alias("s"), (F.max("t") + 1).alias("e"))
    )
    # Both boundaries explode from the one session row — a UNION of the
    # session frame with itself would recompute the sessionization twice.
    bounds = sess.select(
        "user_id",
        F.explode(
            F.array(
                F.struct(F.col("s").alias("t"), F.lit(1).alias("delta")),
                F.struct(F.col("e").alias("t"), F.lit(-1).alias("delta")),
            )
        ).alias("b"),
    ).select("user_id", F.col("b.t").alias("t"), F.col("b.delta").alias("delta"))
    sweep = Window.orderBy(
        "t", F.col("delta").desc(), "user_id"
    ).rowsBetween(Window.unboundedPreceding, 0)
    walk = bounds.withColumn("running", F.sum("delta").over(sweep))
    day = F.expr(f"t DIV {_US_PER_DAY}")
    byday = Window.partitionBy(day)
    rnk = Window.partitionBy(day).orderBy(
        F.col("running").desc(), "t", "user_id"
    )
    return (
        walk.withColumn("n", F.count(F.lit(1)).over(byday))
        .withColumn("rnk", F.row_number().over(rnk))
        .filter(F.col("rnk") == 1)
        .select(
            day.alias("day"),
            F.col("running").alias("peak_concurrency"),
            F.col("t").alias("at_us"),
            F.col("n").alias("n_boundaries"),
        )
    )


_SMALL_FILES = 64  # fragmented layout width (one file per shuffle task)
_COMPACTED_FILES = 4  # post-compaction layout width


@query(
    "warehouse_small_file_compaction",
    oracle=f"""
    SELECT CAST({_SMALL_FILES} AS BIGINT) AS files_before,
           CAST({_COMPACTED_FILES} AS BIGINT) AS files_after,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM lineitem
    """,
)
def warehouse_small_file_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The small-files problem, demonstrated and fixed: write lineitem
    fragmented across {_SMALL_FILES} parquet files (what a 64-task
    streaming micro-batch or over-parallel ETL leaves behind), then
    compact to {_COMPACTED_FILES} right-sized files, proving (a) the file
    counts before/after and (b) that compaction is content-lossless (row
    count + exact revenue-cents fingerprint, both oracle-verified against
    the source table).

    File counting is DISTRIBUTED — ``input_file_name()`` distinct over a
    metadata-only projection, never a driver-side directory listing, so
    the same audit runs against an object store holding millions of
    files. Explicit ``repartition(n)`` is deliberately exempt from AQE
    partition coalescing, which is what makes the produced file count
    deterministic. At 100 TB the compaction target is sized from bytes
    (maxRecordsPerFile / target file size), but the witness — count files
    via the scan, fingerprint before vs after — is exactly this one.
    """
    src = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    from .sources import _stage_dir

    frag = _stage_dir(sf_dir, "lineitem_fragmented")
    compacted = _stage_dir(sf_dir, "lineitem_compacted")
    # The oracle states files_before/_after as literals; that equality
    # needs every round-robin partition non-empty (one file each). Guard
    # it instead of trusting the fixture: a tiny corpus fails loudly.
    n_src = src.count()
    if n_src < _SMALL_FILES:
        raise ValueError(
            f"warehouse_small_file_compaction needs >= {_SMALL_FILES} rows "
            f"for a deterministic {_SMALL_FILES}-file fragmented layout "
            f"(got {n_src})"
        )
    src.repartition(_SMALL_FILES).write.mode("overwrite").parquet(frag)
    frag_df = spark.read.parquet(frag)
    frag_df.repartition(_COMPACTED_FILES).write.mode("overwrite").parquet(
        compacted
    )
    comp_df = spark.read.parquet(compacted)

    def n_files(df: DataFrame):
        return (
            df.select(F.input_file_name().alias("f"))
            .distinct()
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        )

    before = n_files(frag_df).select(F.col("n").alias("files_before"))
    after = n_files(comp_df).select(F.col("n").alias("files_after"))
    audit = comp_df.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("cents").cast("bigint").alias("revenue_cents"),
    )
    return before.crossJoin(after).crossJoin(audit)


# ANALYZE-profile column list: integer + string columns only (double/
# timestamp min/max would render engine-specifically as strings).
_STATS_COLS = [
    "l_orderkey", "l_partkey", "l_suppkey",
    "l_linenumber", "l_returnflag", "l_linestatus",
]


def _column_stats_oracle() -> str:
    arms = " UNION ALL ".join(
        f"""
        SELECT '{c}' AS column_name,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
               CAST(count(DISTINCT {c}) AS BIGINT) AS ndv,
               min(CAST({c} AS VARCHAR)) AS min_str,
               max(CAST({c} AS VARCHAR)) AS max_str
        FROM lineitem
        """
        for c in _STATS_COLS
    )
    return arms


@query("warehouse_column_stats", oracle=_column_stats_oracle())
def warehouse_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE TABLE-style exact column statistics — row count, null
    count, exact NDV, and rendered domain bounds per column — the
    profile a cost-based optimizer (and every data-quality dashboard)
    keeps per table. Bounds are min/max over the STRING rendering
    (lexicographic), deliberately: one representation covers every
    column type identically in both engines, which is what makes the
    profile hash-comparable (numeric bounds per-type live in
    quality_null_profile / the AcidTable manifest stats).

    Scale shape: ONE pass over the table — the column list unpivots in
    the scan projection via ``stack`` into (column_name, value) pairs,
    then TWO levels of aggregation. Level 1 groups by (column_name,
    value) computing ONLY a count: a pure-long buffer keeps it a
    HashAggregate with map-side partial combine — the naive
    count(DISTINCT)+min(string) single groupBy degrades the whole
    3.6M-row unpivot into SortAggregates (strings aren't mutable
    hash-agg buffer types), which profiled as the #3 query in the suite.
    Level 2 folds the NDV-sized group table (n_rows = Σcnt, nulls from
    the null-value group, ndv = non-null group count, bounds = min/max
    over the distinct values themselves — value is the level-1 key, so
    no re-scan); its sort touches ~NDV rows, not the table. At 100 TB
    you'd swap level 1 for HLL registers (approx_count_distinct,
    sketch_hll_merge's path) per the profiling SLA, same two-level
    shape.
    """
    li = load(spark, sf_dir, "lineitem")
    stack_expr = "stack({n}, {args}) AS (column_name, value)".format(
        n=len(_STATS_COLS),
        args=", ".join(
            f"'{c}', CAST({c} AS STRING)" for c in _STATS_COLS
        ),
    )
    unpiv = li.selectExpr(stack_expr)
    groups = unpiv.groupBy("column_name", "value").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return groups.groupBy("column_name").agg(
        F.sum("cnt").cast("bigint").alias("n_rows"),
        F.coalesce(
            F.sum(F.when(F.col("value").isNull(), F.col("cnt"))), F.lit(0)
        ).cast("bigint").alias("n_nulls"),
        F.count("value").cast("bigint").alias("ndv"),
        F.min("value").alias("min_str"),
        F.max("value").alias("max_str"),
    )


_MV_CUTOFF = "2001-01-01"  # orders on/after this date are the delta batch


@query(
    "warehouse_incremental_mv",
    oracle=f"""
    WITH touched AS (
        SELECT DISTINCT o_custkey FROM orders
        WHERE o_orderdate >= DATE '{_MV_CUTOFF}'
    ),
    rev AS (
        SELECT o.o_custkey,
               CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
               CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5)
                    AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE o.o_custkey IN (SELECT o_custkey FROM touched)
        GROUP BY 1
    )
    SELECT o_custkey, n_orders, revenue_cents FROM rev
    """,
)
def warehouse_incremental_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN materialized view — the general
    IVM pattern beyond `acid_incremental_agg_maintenance`'s single-table
    case: the view is revenue and order count per customer over
    orders ⋈ lineitem; a delta batch (orders from {_MV_CUTOFF} on)
    arrives, and instead of recomputing the view, the engine aggregates
    ONLY the delta's join contribution and merges it into the stale view
    with an additive full-outer combine (sum counts, sum revenue — both
    aggregates are self-maintainable, the textbook IVM condition).

    The returned rows are the maintained view restricted to the touched
    customers; the oracle computes the same customers by DIRECT
    recomputation, so the hash match IS the maintenance-correctness
    proof (maintained ≡ recomputed).

    Shape / 100 TB: the stale view is a compact per-customer table; the
    delta aggregate touches delta orders and (via the join) only their
    lineitems — at a daily cadence that is orders-of-magnitude less I/O
    than the recompute the oracle performs. The merge shuffles on
    o_custkey with map-side combine; an AcidTable MERGE persists it in
    production (acid_incremental_agg_maintenance demonstrates that half).
    """
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    cutoff = F.lit(_MV_CUTOFF).cast("date")
    base = orders.filter(F.col("o_orderdate") < cutoff)
    delta = orders.filter(F.col("o_orderdate") >= cutoff)

    def view(o):
        return (
            o.select("o_custkey", "o_orderkey")
            .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_custkey")
            .agg(
                F.countDistinct("o_orderkey").cast("bigint").alias("n_orders"),
                F.sum("cents").cast("bigint").alias("revenue_cents"),
            )
        )

    stale = view(base)
    delta_agg = view(delta)
    # The touched-customer set comes from the delta ORDERS, not from the
    # delta join result — a delta order with no lineitems still marks its
    # customer touched (matching the oracle's touched CTE exactly).
    touched = delta.select("o_custkey").distinct()
    merged = (
        touched.join(
            stale.select(
                "o_custkey",
                F.col("n_orders").alias("b_orders"),
                F.col("revenue_cents").alias("b_rev"),
            ),
            "o_custkey",
            "left",
        )
        .join(
            delta_agg.select(
                "o_custkey",
                F.col("n_orders").alias("d_orders"),
                F.col("revenue_cents").alias("d_rev"),
            ),
            "o_custkey",
            "left",
        )
        .select(
            "o_custkey",
            (
                F.coalesce(F.col("b_orders"), F.lit(0))
                + F.coalesce(F.col("d_orders"), F.lit(0))
            )
            .cast("bigint")
            .alias("n_orders"),
            (
                F.coalesce(F.col("b_rev"), F.lit(0))
                + F.coalesce(F.col("d_rev"), F.lit(0))
            )
            .cast("bigint")
            .alias("revenue_cents"),
        )
        # a touched customer with NO joined lineitems anywhere has no row
        # in the view under either computation path
        .filter(F.col("n_orders") > 0)
    )
    return merged


@query(
    "warehouse_scd2_build",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type,
               epoch_ns(ts) AS ts_ns, event_id,
               lag(event_type) OVER w AS prev_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
    ),
    changes AS (
        SELECT user_id, event_type, ts_ns, event_id,
               CAST(sum(CASE WHEN prev_type IS NULL
                             OR prev_type <> event_type
                        THEN 1 ELSE 0 END)
                    OVER (PARTITION BY user_id
                          ORDER BY ts_ns, event_id
                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_id
        FROM ordered
    ),
    runs AS (
        SELECT user_id, run_id,
               min(event_type) AS attr,
               CAST(min(ts_ns) AS BIGINT) AS valid_from_ns,
               CAST(count(*) AS BIGINT) AS n_events
        FROM changes GROUP BY 1, 2
    )
    SELECT user_id, run_id AS version_seq, attr, valid_from_ns,
           CAST(COALESCE(lead(valid_from_ns) OVER (
                    PARTITION BY user_id ORDER BY run_id) - 1, -1)
                AS BIGINT) AS valid_to_ns,
           (lead(valid_from_ns) OVER (
                PARTITION BY user_id ORDER BY run_id) IS NULL)
               AS is_current,
           n_events
    FROM runs
    """,
)
def warehouse_scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BUILD an SCD2 (slowly-changing-dimension type 2) table from a raw
    change stream — the write-side companion of `join_scd2_point_in_time`
    (which consumes one): collapse each user's event-type history into
    versioned validity runs with [valid_from, valid_to] nanosecond
    bounds, a version sequence, and an is_current flag (open interval
    encoded as valid_to = -1 so every emitted value stays an exact
    BIGINT).

    The classic three-window derivation, all on integer nanoseconds:
    lag() marks attribute changes, a cumulative sum over change flags
    assigns run ids (the gaps-and-islands identity), and lead() over the
    per-run minima closes each version's interval against the next.

    Scale shape: every window partitions by user_id — Spark shuffles
    once on user_id and all three windows (plus the run groupBy) reuse
    that single partitioning, which WindowExec's required-distribution
    matching guarantees; nothing here is a global sort. The run table is
    a partial-aggregated groupBy. At 100 TB this is the standard
    dimension-build: one shuffle by entity key, windows within.
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    changes = ev.select(
        "user_id", "event_type", "ts_ns", "event_id",
        (
            F.lag("event_type").over(w).isNull()
            | (F.lag("event_type").over(w) != F.col("event_type"))
        ).cast("int").alias("chg"),
    ).select(
        "user_id", "event_type", "ts_ns", "event_id",
        F.sum("chg").over(
            Window.partitionBy("user_id")
            .orderBy("ts_ns", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("bigint").alias("run_id"),
    )
    runs = changes.groupBy("user_id", "run_id").agg(
        F.min("event_type").alias("attr"),
        F.min("ts_ns").cast("bigint").alias("valid_from_ns"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    w_run = Window.partitionBy("user_id").orderBy("run_id")
    nxt = F.lead("valid_from_ns").over(w_run)
    return runs.select(
        "user_id",
        F.col("run_id").alias("version_seq"),
        "attr",
        "valid_from_ns",
        F.coalesce(nxt - 1, F.lit(-1)).cast("bigint").alias("valid_to_ns"),
        nxt.isNull().alias("is_current"),
        "n_events",
    )


# ---- market-concentration + income-equality scalars (round 8, batch 2) ------
@query(
    "agg_hhi_concentration",
    oracle="""
    WITH seg AS (
        SELECT c.c_mktsegment AS segment, c.c_nationkey AS nationkey,
               CAST(count(*) AS BIGINT) AS cnt
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2
    ),
    tot AS (
        SELECT segment, CAST(sum(cnt) AS BIGINT) AS total FROM seg GROUP BY 1
    )
    SELECT s.segment,
           CAST(max(t.total) AS BIGINT) AS n_orders,
           CAST(count(*) AS BIGINT) AS n_nations,
           CAST(sum((s.cnt * 1000 // t.total) * (s.cnt * 1000 // t.total))
                AS BIGINT) AS hhi_x1e6
    FROM seg s JOIN tot t ON t.segment = s.segment
    GROUP BY s.segment
    """,
)
def agg_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman concentration index of order volume per
    market segment, shares taken across nations: HHI = Σ shareᵢ² with
    shares in permille, so ×10⁶-scaled (10000/n_nations ≈ perfectly
    even, 1e6 = single-nation monopoly). The one-number market/domain
    concentration gauge — for training corpora, the same statistic flags
    a "segment" whose volume collapsed onto one source. Shares quantize
    to integer permille BEFORE squaring (cnt·1000 DIV total ≤ 1000), so
    every term is bounded ≤10⁶ regardless of corpus size — no overflow
    at any scale, and both engines run the identical integer sequence.

    Scale shape: orders⋈customer is the fact-dim join (AQE broadcasts
    customer when it fits; co-partitioned otherwise), the (segment,
    nation) collapse is one partial-agg groupBy to a ≤ segments×nations
    domain, and everything after runs on that tiny domain."""
    seg = (
        load(spark, sf_dir, "orders")
        .join(
            load(spark, sf_dir, "customer").select(
                "c_custkey", "c_mktsegment", "c_nationkey"
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("c_nationkey").alias("nationkey"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    tot = seg.groupBy("segment").agg(
        F.sum("cnt").cast("bigint").alias("total")
    )
    return (
        seg.join(tot, "segment")
        .groupBy("segment")
        .agg(
            F.max("total").cast("bigint").alias("n_orders"),
            F.count(F.lit(1)).cast("bigint").alias("n_nations"),
            F.sum(
                F.expr("(cnt * 1000 DIV total) * (cnt * 1000 DIV total)")
            )
            .cast("bigint")
            .alias("hhi_x1e6"),
        )
    )


@query(
    "agg_hoover_index",
    oracle="""
    WITH rev AS (
        SELECT c.c_mktsegment AS segment, o.o_custkey,
               CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2
    ),
    tot AS (
        SELECT segment, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS s
        FROM rev GROUP BY 1
    )
    SELECT r.segment,
           CAST(max(t.n) AS BIGINT) AS n_customers,
           CAST(max(t.s) AS BIGINT) AS total_cents,
           CAST(floor((CAST(sum(abs(t.n * r.cents - t.s)) AS DOUBLE)
                       * 1000000)
                      / (2.0 * CAST(max(t.n) AS DOUBLE)
                         * CAST(max(t.s) AS DOUBLE)))
                AS BIGINT) AS hoover_x1e6
    FROM rev r JOIN tot t ON t.segment = r.segment
    GROUP BY r.segment
    """,
)
def agg_hoover_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hoover (Robin Hood) index of customer revenue per market segment:
    the share of total revenue that would have to move between customers
    to equalize them, H = Σ|xᵢ − μ| / (2·Σx) — the third inequality lens
    next to `agg_gini_coefficient` (whole Lorenz curve) and
    `agg_pareto_coverage` (top-k mass): Hoover is exactly the maximum
    vertical Lorenz gap. Computed as Σ|n·xᵢ − S| over integer cents
    (no per-row division), with ONE final IEEE double divide + floor —
    both engines execute the identical operation sequence, so the ×10⁶
    result hashes exactly.

    Scale shape: per-customer collapse is one partial-agg groupBy after
    the fact-dim join; segment totals are a second ≤|segments|-row
    aggregate joined back (broadcast — it IS an aggregate); the deviation
    sum is a third partial agg. Three shuffles, all on collapsing keys;
    int64 headroom: |n·xᵢ − S| stays < 2⁶³ through ~10¹² cents × 10⁷
    customers per segment — beyond that, shift to group-mean-centered
    terms first (documented, not needed at certified scales)."""
    rev = (
        load(spark, sf_dir, "orders")
        .join(
            load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_custkey"),
        )
        .agg(
            F.sum(
                F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
            )
            .cast("bigint")
            .alias("cents")
        )
    )
    tot = rev.groupBy("segment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("s"),
    )
    return (
        rev.join(tot, "segment")
        .groupBy("segment")
        .agg(
            F.max("n").cast("bigint").alias("n_customers"),
            F.max("s").cast("bigint").alias("total_cents"),
            F.expr(
                "CAST(floor((CAST(sum(abs(n * cents - s)) AS DOUBLE)"
                " * 1000000)"
                " / (2.0 * CAST(max(n) AS DOUBLE)"
                " * CAST(max(s) AS DOUBLE))) AS BIGINT)"
            ).alias("hoover_x1e6"),
        )
    )

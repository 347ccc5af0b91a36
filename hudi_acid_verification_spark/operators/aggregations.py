"""Aggregation operators (SURVEY.md §2B: agg_group, agg_distinct,
agg_rollup_cube, plus the flagship q1_pricing_summary).

Lineage: the reference's only aggregation is the implicit group-by-pk
uniqueness audit (resultset/ResultSet.java:23-34); §2B generalizes to full
grouped aggregation.

Float-parity strategy (matters for the DuckDB oracle): double-precision SUMs
are order-dependent, and Spark's partition-parallel reduction visits rows in
a different order than DuckDB. We therefore cast inputs to DECIMAL before
aggregating — decimal addition is exact and associative, so Spark and DuckDB
agree bit-for-bit at any partitioning/parallelism. Final projections cast the
exact decimal sum to DOUBLE once (one correctly-rounded conversion, identical
in both engines): driver-facing outputs must never carry decimal columns,
because the engines' pandas renderings of decimals diverge (round-1 lesson,
VERDICT.md — see tests/oracle_check.py). Products of two factors use
DECIMAL(18,4) (result scale 8, precision 37 ≤ 38 — no engine-specific
rounding); three factors use DECIMAL(12,4) (result precision exactly 38).
Averages are computed as exact decimal SUM cast to double, divided by COUNT —
a single deterministic double division.

Scale notes: groupBy on low-cardinality keys is a map-side partial agg
(hash aggregate) followed by a tiny shuffle of partial states — the shuffle
volume is O(#groups × #partitions), not O(rows), so this survives 100 TB.
count(DISTINCT x) expands to a two-phase expand+agg; approx_count_distinct
is the scale path and is benchmarked alongside.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import load, query

_DEC2 = "decimal(18,4)"  # two-factor products stay exact
_DEC3 = "decimal(12,4)"  # three-factor products stay exact


def _dec2(c: str) -> F.Column:
    return F.col(c).cast(_DEC2)


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT
        l_returnflag,
        l_linestatus,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
            * CAST(1.0 - l_discount AS DECIMAL(18,4))), 4) AS DOUBLE) AS sum_disc_price,
        CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4))
            * CAST(1.0 - l_discount AS DECIMAL(12,4))
            * CAST(1.0 + l_tax AS DECIMAL(12,4))), 4) AS DOUBLE) AS sum_charge,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_qty,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_price,
        CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_disc,
        count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H-Q1-style pricing summary (SURVEY.md §7.1).

    Scan → pushed filter → hash aggregate (map-side partial) → 6-group result.
    """
    li = load(spark, sf_dir, "lineitem")
    cnt = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # Exact decimal accumulation, then ONE correctly-rounded cast to
            # double in the final projection: driver-facing outputs must not
            # carry decimals (round-1 lesson — see tests/oracle_check.py).
            F.sum(_dec2("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec2("l_extendedprice")).cast("double").alias("sum_base_price"),
            # scale-8/12 sums are rounded to scale 4 FIRST (both engines round
            # half-away-from-zero on decimals) so the unscaled value stays
            # below 2^53 and the double conversion is exact — a raw
            # decimal(38,12)→double cast double-rounds differently per engine
            F.round(
                F.sum(
                    _dec2("l_extendedprice")
                    * (F.lit(1.0) - F.col("l_discount")).cast(_DEC2)
                ),
                4,
            ).cast("double").alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast(_DEC3)
                    * (F.lit(1.0) - F.col("l_discount")).cast(_DEC3)
                    * (F.lit(1.0) + F.col("l_tax")).cast(_DEC3)
                ),
                4,
            ).cast("double").alias("sum_charge"),
            (F.sum(_dec2("l_quantity")).cast("double") / cnt).alias("avg_qty"),
            (F.sum(_dec2("l_extendedprice")).cast("double") / cnt).alias("avg_price"),
            (F.sum(_dec2("l_discount")).cast("double") / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


@query(
    "agg_group",
    oracle="""
    SELECT
        o_orderpriority,
        o_orderstatus,
        count(*) AS n_orders,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
        min(o_totalprice) AS min_price,
        max(o_totalprice) AS max_price,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_price
    FROM orders
    GROUP BY o_orderpriority, o_orderstatus
    """,
)
def agg_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy + sum/avg/count/min/max (§2B agg_group)."""
    cnt = F.count(F.lit(1))
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(
            cnt.alias("n_orders"),
            F.sum(_dec2("o_totalprice")).cast("double").alias("sum_price"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            (F.sum(_dec2("o_totalprice")).cast("double") / cnt).alias("avg_price"),
        )
    )


@query(
    "agg_distinct",
    oracle="""
    SELECT
        l_returnflag,
        count(DISTINCT l_suppkey) AS n_supp,
        count(DISTINCT l_partkey) AS n_part,
        count(DISTINCT l_orderkey) AS n_orders,
        count(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column COUNT(DISTINCT) (§2B agg_distinct).

    Exact distinct expands the plan (one Expand + re-agg per distinct column);
    at 100 TB prefer approx_count_distinct (HLL sketch, no expand) unless
    exactness is required — bench.py carries the approx variant.
    """
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct("l_partkey").alias("n_part"),
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@query(
    "agg_rollup_cube",
    oracle="""
    SELECT
        l_returnflag,
        l_linestatus,
        GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        count(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE with grouping_id to disambiguate NULL data vs NULL subtotal rows.

    Spark's grouping_id() over cube(a, b) == GROUPING(a)*2 + GROUPING(b).
    At scale CUBE multiplies the input by 2^k in the Expand operator — keep k
    small or pre-aggregate per (a, b) first; Catalyst already pushes the
    partial agg below the expand.
    """
    return (
        load(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.sum(_dec2("l_quantity")).cast("double").alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "sum_qty", "n")
    )


@query(
    "agg_percentiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS p50_qty,
           quantile_cont(l_quantity, 0.9) AS p90_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` == DuckDB
    quantile_cont: both sort and linearly interpolate, so doubles agree).

    Scale notes: exact percentile shuffles all values per group; the 100 TB
    path is approx_percentile (t-digest sketch, map-side mergeable) — kept
    out of the oracle because sketches are engine-specific.
    """
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_quantity, 0.5D)").alias("p50_qty"),
            F.expr("percentile(l_quantity, 0.9D)").alias("p90_qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "agg_skew_salted",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY event_type
    """,
)
def agg_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant two-phase aggregation: salt the hot grouping key with
    crc32(event_id) % 16, partially aggregate per (key, salt), then collapse
    the salt. The salted shuffle spreads a hot key over 16 reducers; the
    second shuffle moves only 16 partial states per key. Result is identical
    to the plain GROUP BY (the oracle), because count/sum are commutative
    monoids and decimal addition is exact.
    """
    salted = (
        load(spark, sf_dir, "events")
        .withColumn("salt", F.crc32(F.col("event_id").cast("string")) % 16)
        .groupBy("event_type", "salt")
        .agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum(F.col("value").cast(_DEC2)).alias("psum"),
        )
    )
    return salted.groupBy("event_type").agg(
        F.sum("pn").alias("n_events"),
        F.sum("psum").cast("double").alias("sum_value"),
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (marginals + grand total, no cross product) —
    the general form CUBE/ROLLUP specialize. Spark plans the same Expand
    operator with one duplicate of the input per set; keep the set list
    short at scale or pre-aggregate first.
    """
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus,
               grouping(l_returnflag) * 2 + grouping(l_linestatus) AS gid,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        FROM parquet.`{sf_dir}/lineitem.parquet`
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query("agg_approx_distinct")  # rows-only: HLL sketches are engine-specific
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — the 100 TB path for distinct
    counting: map-side mergeable sketch, O(1) memory per group, no expand.
    Not DuckDB-oracled (sketch estimates differ per engine); the accuracy
    invariant vs the exact count is asserted in tests.
    """
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias(
                "approx_parts"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@query(
    "agg_stats_moments",
    oracle="""
    WITH q AS (
        SELECT l_returnflag,
               CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS qq,
               CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS qp
        FROM lineitem
    ),
    s AS (
        SELECT l_returnflag,
               count(*) AS n,
               CAST(sum(qq) AS DOUBLE) AS sx,
               CAST(sum(qq * qq) AS DOUBLE) AS sxx,
               CAST(sum(qp) AS DOUBLE) AS sy,
               CAST(sum(qp * qp) AS DOUBLE) AS syy,
               CAST(sum(qq * qp) AS DOUBLE) AS sxy
        FROM q GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           sqrt((n * sxx - sx * sx) / (n * (n - 1.0))) / 100.0 AS qty_stddev,
           (n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS qty_price_corr
    FROM s
    """,
)
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample stddev and Pearson correlation from exact moment sums.

    Spark's stddev_samp/corr accumulate doubles in partition order —
    nondeterministic across partitionings and engines. Instead values are
    quantized to int64 cents (floor(x·100 + 0.5), exact for the fixtures'
    2-decimal values), the five moments are summed exactly (DECIMAL(38,0)
    here, HUGEINT promotion in DuckDB — both order-independent), and cast
    once to double (correctly rounded from the same integer in both
    engines). The closed-form expressions are written identically on both
    sides so every IEEE op matches; stddev divides by 100 to undo the
    quantization scale (corr is scale-invariant). Same single-shuffle plan
    as a plain groupBy — the statistical surface costs nothing extra at
    scale.
    """
    li = load(spark, sf_dir, "lineitem")
    qq = F.floor(F.col("l_quantity") * 100 + F.lit(0.5)).cast("bigint")
    qp = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("bigint")
    wide = "decimal(38,0)"
    s = li.select("l_returnflag", qq.alias("qq"), qp.alias("qp")).groupBy(
        "l_returnflag"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("qq").cast(wide)).cast("double").alias("sx"),
        F.sum((F.col("qq") * F.col("qq")).cast(wide)).cast("double").alias("sxx"),
        F.sum(F.col("qp").cast(wide)).cast("double").alias("sy"),
        F.sum((F.col("qp") * F.col("qp")).cast(wide)).cast("double").alias("syy"),
        F.sum((F.col("qq") * F.col("qp")).cast(wide)).cast("double").alias("sxy"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    sy, syy, sxy = F.col("sy"), F.col("syy"), F.col("sxy")
    return s.select(
        "l_returnflag",
        "n",
        (
            F.sqrt((n * sxx - sx * sx) / (n * (n - F.lit(1.0)))) / F.lit(100.0)
        ).alias("qty_stddev"),
        (
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))
        ).alias("qty_price_corr"),
    )


@query(
    "agg_arg_extremes",
    oracle="""
    SELECT c_mktsegment,
           arg_max(c_name, CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
                           * 10000000 + c_custkey) AS richest_name,
           arg_min(c_name, CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
                           * 10000000 + c_custkey) AS poorest_name,
           count(*) AS n_customers
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def agg_arg_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arg_max / arg_min (max_by / min_by) aggregates: the customer name at
    the balance extremes of each market segment — the "value at the
    extremum" aggregate that otherwise needs a window + filter pass.

    Determinism with ties: the ordering key packs (balance cents, custkey)
    into one int64 — balances that tie resolve by the unique key, so both
    engines pick the same row (bare max_by on a tied key is
    engine-arbitrary). One shuffle, no window.
    """
    key = (
        F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("bigint")
        * F.lit(10000000)
        + F.col("c_custkey")
    )
    return (
        load(spark, sf_dir, "customer")
        .withColumn("__key", key)
        .groupBy("c_mktsegment")
        .agg(
            F.max_by("c_name", F.col("__key")).alias("richest_name"),
            F.min_by("c_name", F.col("__key")).alias("poorest_name"),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )


@query(
    "agg_weighted_median",
    oracle="""
    WITH pre AS (
        SELECT l_returnflag,
               CAST(l_quantity AS BIGINT) AS qty,
               CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS w
        FROM lineitem
        GROUP BY 1, 2
    ),
    cum AS (
        SELECT l_returnflag, qty, w,
               sum(w) OVER (PARTITION BY l_returnflag ORDER BY qty
                            ROWS UNBOUNDED PRECEDING) AS cw,
               sum(w) OVER (PARTITION BY l_returnflag) AS total
        FROM pre
    )
    SELECT l_returnflag,
           CAST(max(total) AS BIGINT) AS total_weight_cents,
           CAST(min(CASE WHEN 2 * cw >= total THEN qty END) AS BIGINT)
               AS weighted_median_qty
    FROM cum
    GROUP BY 1
    """,
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted median (revenue-weighted order quantity per return
    flag): the smallest value whose cumulative weight reaches half the
    group's total — "what quantity splits the money in half", the
    distribution summary a mixture/packing policy reads instead of the
    unweighted median.

    Scale shape — the reason this is NOT a naive per-group sort: weights
    first collapse onto the (group, value) domain with one partial-
    aggregated groupBy (the fact table's contribution is map-side
    combined), and only the collapsed frame — O(groups × distinct values),
    3×50 here, bounded by the value domain at any corpus size — flows into
    the cumulative window. Integer cents make the half-total comparison
    (2·cum ≥ total) exact in both engines; when the value domain is
    unbounded-continuous the same plan runs over bucketized values and
    becomes the standard mergeable-quantile approximation.
    """
    li = load(spark, sf_dir, "lineitem")
    from pyspark.sql import Window

    pre = (
        li.select(
            "l_returnflag",
            F.col("l_quantity").cast("bigint").alias("qty"),
            F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("cents"),
        )
        .groupBy("l_returnflag", "qty")
        .agg(F.sum("cents").alias("w"))
    )
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("qty")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("l_returnflag")
    cum = pre.select(
        "l_returnflag",
        "qty",
        F.sum("w").over(w_cum).alias("cw"),
        F.sum("w").over(w_all).alias("total"),
    )
    return cum.groupBy("l_returnflag").agg(
        F.max("total").cast("bigint").alias("total_weight_cents"),
        F.min(F.when(2 * F.col("cw") >= F.col("total"), F.col("qty")))
        .cast("bigint")
        .alias("weighted_median_qty"),
    )


@query(
    "agg_corr_exact",
    oracle="""
    WITH cents AS (
        SELECT l_returnflag,
               CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS x,
               CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
        FROM lineitem
    ),
    sums AS (
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS DECIMAL(38, 0)) AS sx,
               CAST(sum(y) AS DECIMAL(38, 0)) AS sy,
               CAST(sum(x * x) AS DECIMAL(38, 0)) AS sxx,
               CAST(sum(y * y) AS DECIMAL(38, 0)) AS syy,
               CAST(sum(x * y) AS DECIMAL(38, 0)) AS sxy
        FROM cents GROUP BY 1
    )
    SELECT l_returnflag,
           n,
           CAST(n * sxy - sx * sy AS DOUBLE)
               / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                      * CAST(n * syy - sy * sy AS DOUBLE)) AS corr_qty_price
    FROM sums
    """,
)
def agg_corr_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Pearson correlation (quantity vs extended price per
    return flag) — the feature-screening statistic a training pipeline
    computes over candidate columns, made ORDER-INDEPENDENT: the built-in
    ``corr`` accumulates floating co-moments whose value depends on row
    order and partitioning, so two runs of the same query can hash
    differently. Here every accumulation is exact integer arithmetic —
    values quantize to cents (floor(x*100+0.5), the proven cross-engine
    rounding), the five co-moment sums run in DECIMAL(38,0), and floating
    point enters only in the final n·Σxy−ΣxΣy expression, evaluated once
    per group from identical exact operands on both engines.

    Scale: one partial-aggregated groupBy — the same map-side-combine
    shape as q1; DECIMAL(38,0) sums never overflow below ~10^38 (a 100 TB
    lineitem is ~10^27 at worst).
    """
    li = load(spark, sf_dir, "lineitem")
    x = F.floor(F.col("l_quantity") * 100 + F.lit(0.5)).cast("bigint")
    y = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("bigint")
    d38 = "decimal(38,0)"
    sums = (
        li.select(
            "l_returnflag", x.alias("x"), y.alias("y")
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("x").cast(d38)).alias("sx"),
            F.sum(F.col("y").cast(d38)).alias("sy"),
            F.sum((F.col("x") * F.col("x")).cast(d38)).alias("sxx"),
            F.sum((F.col("y") * F.col("y")).cast(d38)).alias("syy"),
            F.sum((F.col("x") * F.col("y")).cast(d38)).alias("sxy"),
        )
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    dxx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    dyy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    return sums.select(
        "l_returnflag",
        "n",
        (num / F.sqrt(dxx * dyy)).alias("corr_qty_price"),
    )


@query(
    "agg_hierarchy_share",
    oracle="""
    WITH rev AS (
        SELECT r.r_name AS region, n.n_name AS nation, c.c_custkey,
               CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                    * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT)))
                    AS BIGINT) AS rev_mu
        FROM lineitem l
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n   ON n.n_nationkey = c.c_nationkey
        JOIN region r   ON r.r_regionkey = n.n_regionkey
        GROUP BY 1, 2, 3
    )
    SELECT region, nation, c_custkey, rev_mu,
           CAST(rev_mu AS DOUBLE)
               / sum(rev_mu) OVER (PARTITION BY region, nation)
               AS share_of_nation,
           CAST(sum(rev_mu) OVER (PARTITION BY region, nation) AS DOUBLE)
               / sum(rev_mu) OVER (PARTITION BY region)
               AS nation_share_of_region
    FROM rev
    """,
)
def agg_hierarchy_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-parent across a dimension hierarchy (customer →
    nation → region): each customer's share of their nation's revenue and
    the nation's share of its region — the drill-down ratio every OLAP
    front-end computes, done WITHOUT re-aggregating per level: one
    base rollup to the leaf grain, then two window sums re-use it for
    both parent totals.

    Scale: the heavy work is the single leaf-grain aggregate (exact
    integer micro-unit revenue, map-side combined, dims broadcast); the
    windows then partition by nation/region over the already-collapsed
    per-customer frame — O(customers) rows, never raw lineitem. Shares
    are single-division doubles from exact integers.
    """
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    rev_mu = (
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("bigint")
        * (100 - F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("bigint"))
    )
    leaf = (
        # orders/customer grow WITH the fact — a pinned broadcast hint on
        # them is the unbounded-broadcast class at 100 TB (optimization
        # r9): leave the strategy to AQE's runtime sizes (still a
        # broadcast at bench scale, a shuffle join at cluster scale).
        # nation/region are true bounded dims and keep their hints.
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region"),
            F.col("n_name").alias("nation"),
            "c_custkey",
        )
        .agg(F.sum(rev_mu).cast("bigint").alias("rev_mu"))
    )
    w_nation = Window.partitionBy("region", "nation")
    w_region = Window.partitionBy("region")
    return leaf.select(
        "region",
        "nation",
        "c_custkey",
        "rev_mu",
        (
            F.col("rev_mu").cast("double") / F.sum("rev_mu").over(w_nation)
        ).alias("share_of_nation"),
        (
            F.sum("rev_mu").over(w_nation).cast("double")
            / F.sum("rev_mu").over(w_region)
        ).alias("nation_share_of_region"),
    )


@query(
    "agg_filter_clause",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
               AS n_finished,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    FILTER (WHERE o_orderstatus = 'O') AS BIGINT)
               AS open_cents,
           CAST(count(DISTINCT o_custkey) FILTER (WHERE o_orderstatus = 'P')
                AS BIGINT) AS n_pending_customers
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI FILTER-clause aggregation — per-group conditional aggregates
    in ONE pass (count/sum/distinct-count each over a different predicate)
    instead of three self-joined subqueries. Both engines execute the
    IDENTICAL SQL text; this is the idiom that replaces the
    CASE-WHEN-inside-SUM contortion and keeps every conditional metric in
    the same partial-aggregation pipeline.

    Scale shape: one scan, one shuffle keyed by the group column; the
    FILTER predicates evaluate map-side so partial aggregation still
    compresses to O(groups) rows. The single DISTINCT triggers Spark's
    expand-based two-phase distinct — bounded because it's one distinct
    column, not a multi-distinct explosion.
    """
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
                   AS n_finished,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                        FILTER (WHERE o_orderstatus = 'O') AS BIGINT)
                   AS open_cents,
               CAST(count(DISTINCT o_custkey)
                        FILTER (WHERE o_orderstatus = 'P') AS BIGINT)
                   AS n_pending_customers
        FROM orders
        GROUP BY o_orderpriority
        """
    )


@query(
    "agg_string_concat_ordered",
    oracle="""
    SELECT n.n_name,
           CAST(count(*) AS BIGINT) AS n_suppliers,
           string_agg(s.s_name, ',' ORDER BY s.s_name) AS supplier_roster
    FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY n.n_name
    """,
)
def agg_string_concat_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ordered string aggregation (LISTAGG/STRING_AGG): the
    per-nation supplier roster as ONE canonical comma-joined string. The
    trap this operator pins: collect_list order is partition-arrival
    order — nondeterministic under parallelism — so the roster is sorted
    INSIDE the aggregate (array_sort before array_join), making the
    result identical on 1 core or 1000 executors. DuckDB states the same
    contract natively with string_agg(... ORDER BY).

    Scale shape: partial collect_list compresses map-side; rosters are
    bounded by group cardinality (suppliers per nation), the right
    guardrail for any listagg at scale — an unbounded listagg on a fact
    table is a driver OOM by design, not an engine gap.
    """
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
            F.array_join(
                F.array_sort(F.collect_list("s_name")), ","
            ).alias("supplier_roster"),
        )
    )

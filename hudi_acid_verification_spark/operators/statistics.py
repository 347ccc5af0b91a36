"""Exact distributed statistics: OLS regression, mode, and IQR outlier
gates — the REGR_* / MODE corner of the SQL standard, rebuilt on the
integer-co-moment discipline (see agg_corr_exact) so every result hashes
bit-for-bit against the DuckDB oracle.

The shared trick: quantize inputs to integer cents, accumulate all
co-moments as exact integer sums (associative → partition-order-free),
and let floating point enter only in one final per-group expression
evaluated from identical operands on both engines. Library aggregates
(regr_slope, corr, stddev) stream floating partials whose value depends
on row order — correct-with-tolerance, but never hash-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import load, query


@query(
    "agg_regression_exact",
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
    SELECT l_returnflag, n,
           CAST(n * sxy - sx * sy AS DOUBLE)
               / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
           (CAST(sy AS DOUBLE)
            - CAST(n * sxy - sx * sy AS DOUBLE)
              / CAST(n * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE))
               / n AS intercept,
           (CAST(n * sxy - sx * sy AS DOUBLE)
            * CAST(n * sxy - sx * sy AS DOUBLE))
               / (CAST(n * sxx - sx * sx AS DOUBLE)
                  * CAST(n * syy - sy * sy AS DOUBLE)) AS r2
    FROM sums
    """,
)
def agg_regression_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS regression (price-on-quantity slope, intercept, R²
    per return flag) — the SQL-standard REGR_SLOPE/REGR_INTERCEPT/REGR_R2
    family, made hash-exact: the five co-moment sums run as DECIMAL(38,0)
    integers (one map-side-combined groupBy, same shape as q1), and the
    three regression statistics are single closed-form expressions over
    those exact operands. The built-in regr_* aggregates accumulate
    floating partials and can only ever be compared with tolerance.

    Scale: identical to agg_corr_exact — one partial-aggregated exchange,
    |groups| output rows, DECIMAL(38,0) headroom to ~10^38.
    """
    li = load(spark, sf_dir, "lineitem")
    x = F.floor(F.col("l_quantity") * 100 + F.lit(0.5)).cast("bigint")
    y = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("bigint")
    d38 = "decimal(38,0)"
    sums = (
        li.select("l_returnflag", x.alias("x"), y.alias("y"))
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
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    dxx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    dyy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    slope = num / dxx
    return sums.select(
        "l_returnflag",
        "n",
        slope.alias("slope"),
        (
            (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
            / F.col("n")
        ).alias("intercept"),
        ((num * num) / (dxx * dyy)).alias("r2"),
    )


@query(
    "agg_mode_exact",
    oracle="""
    WITH counts AS (
        SELECT l_returnflag,
               CAST(l_quantity AS BIGINT) AS qty,
               CAST(count(*) AS BIGINT) AS n
        FROM lineitem GROUP BY 1, 2
    ),
    ranked AS (
        SELECT l_returnflag, qty, n,
               row_number() OVER (
                   PARTITION BY l_returnflag ORDER BY n DESC, qty
               ) AS rnk
        FROM counts
    )
    SELECT l_returnflag,
           qty AS mode_qty,
           n AS mode_count
    FROM ranked WHERE rnk = 1
    """,
)
def agg_mode_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical MODE per group (most frequent quantity per return
    flag) with a deterministic tie-break (highest count, then smallest
    value) — the SQL-standard ``mode()`` whose engine implementations
    disagree precisely on ties, which is why the tie rule is explicit
    here and in the oracle.

    Shape: value-level counts first (partial-aggregated on (group,
    value) — the high-cardinality exchange), then a rank over the
    collapsed per-group frame. No collect_list, no sort of raw rows; at
    100 TB the second window touches |distinct values| rows only.
    """
    li = load(spark, sf_dir, "lineitem")
    counts = (
        li.select(
            "l_returnflag", F.col("l_quantity").cast("bigint").alias("qty")
        )
        .groupBy("l_returnflag", "qty")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    w = Window.partitionBy("l_returnflag").orderBy(F.col("n").desc(), "qty")
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select(
            "l_returnflag",
            F.col("qty").alias("mode_qty"),
            F.col("n").alias("mode_count"),
        )
    )


@query(
    "quality_outlier_iqr",
    oracle="""
    WITH cents AS (
        SELECT l_returnflag,
               CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v
        FROM lineitem
    ),
    quartiles AS (
        SELECT l_returnflag,
               quantile_cont(v, 0.25) AS q1,
               quantile_cont(v, 0.75) AS q3
        FROM cents GROUP BY 1
    )
    SELECT c.l_returnflag,
           CAST(count(*) AS BIGINT) AS n_rows,
           q.q1, q.q3,
           CAST(sum(CASE WHEN c.v < q.q1 - 1.5 * (q.q3 - q.q1)
                           OR c.v > q.q3 + 1.5 * (q.q3 - q.q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM cents c JOIN quartiles q ON q.l_returnflag = c.l_returnflag
    GROUP BY c.l_returnflag, q.q1, q.q3
    """,
)
def quality_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier count per group: values beyond
    [Q1 − 1.5·IQR, Q3 + 1.5·IQR] of their group's exact quartiles — the
    box-plot outlier rule every profiling report ships. Quartiles are the
    exact-interpolating percentile (cross-engine parity proven by
    agg_percentiles) over integer cents; the fences and comparisons are
    single expressions over those identical operands, so the boundary
    decisions agree bit-for-bit.

    Shape: two passes over the fact (quartiles, then the fence test) with
    the tiny per-group quartile frame broadcast into the second — at
    100 TB both passes are partial-aggregated scans; no sort of raw rows,
    no window over event volume. (A one-pass variant would use the
    histogram sketch's bucket quantiles; the exact quartiles here keep
    the oracle parity strict.)
    """
    li = load(spark, sf_dir, "lineitem")
    cents = li.select(
        "l_returnflag",
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("v"),
    )
    quart = cents.groupBy("l_returnflag").agg(
        F.expr("percentile(v, 0.25)").alias("q1"),
        F.expr("percentile(v, 0.75)").alias("q3"),
    )
    j = cents.join(F.broadcast(quart), "l_returnflag")
    iqr = F.col("q3") - F.col("q1")
    is_out = (F.col("v") < F.col("q1") - 1.5 * iqr) | (
        F.col("v") > F.col("q3") + 1.5 * iqr
    )
    return j.groupBy("l_returnflag", "q1", "q3").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(is_out.cast("int")).cast("bigint").alias("n_outliers"),
    ).select("l_returnflag", "n_rows", "q1", "q3", "n_outliers")


_SEQ_BUCKETS = (64, 128, 256, 512, 1024)  # max tokens per padding bucket


@query(
    "pipeline_length_bucket_pack",
    oracle=f"""
    WITH lens AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    bucketed AS (
        SELECT doc_id, n_tokens,
               CASE
                   WHEN n_tokens <= 64 THEN 64
                   WHEN n_tokens <= 128 THEN 128
                   WHEN n_tokens <= 256 THEN 256
                   WHEN n_tokens <= 512 THEN 512
                   ELSE 1024
               END AS bucket_max
        FROM lens
    )
    SELECT bucket_max,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS real_tokens,
           CAST(count(*) * bucket_max AS BIGINT) AS padded_tokens,
           CAST(count(*) * bucket_max - sum(n_tokens) AS DOUBLE)
               / (count(*) * bucket_max) AS pad_waste_frac
    FROM bucketed GROUP BY bucket_max
    """,
)
def pipeline_length_bucket_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length bucketing for training batches: documents are
    assigned to the smallest padding bucket ({", ".join(str(b) for b in _SEQ_BUCKETS)}
    tokens) that fits them, and the operator reports per-bucket padding
    waste — the number a training-efficiency owner watches, since every
    padded token is FLOPs spent on nothing (naive single-max-length
    batching routinely wastes 30-60%; bucketing gets it under 10%).

    One partial-aggregated pass: token counts and bucket assignment are
    per-row expressions fused into the scan, the rollup collapses to
    |buckets| rows. Waste fractions are single divisions of exact ints.
    The bucket boundaries are the contract a batching dataloader consumes
    (docs over the top bucket would truncate/split upstream — here the
    top bucket absorbs them so the audit stays total).
    """
    d = load(spark, sf_dir, "documents")
    n = F.size(F.split("text", " ")).cast("bigint")
    bucket = (
        F.when(n <= 64, 64)
        .when(n <= 128, 128)
        .when(n <= 256, 256)
        .when(n <= 512, 512)
        .otherwise(1024)
    )
    bucketed = d.select(n.alias("n_tokens"), bucket.alias("bucket_max"))
    return (
        bucketed.groupBy("bucket_max")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("real_tokens"),
        )
        .select(
            F.col("bucket_max").cast("bigint").alias("bucket_max"),
            "n_docs",
            "real_tokens",
            (F.col("n_docs") * F.col("bucket_max"))
            .cast("bigint")
            .alias("padded_tokens"),
            (
                (F.col("n_docs") * F.col("bucket_max") - F.col("real_tokens"))
                .cast("double")
                / (F.col("n_docs") * F.col("bucket_max"))
            ).alias("pad_waste_frac"),
        )
    )



# ---- Poisson-bootstrap confidence intervals (round 8) -----------------------
_BOOT_B = 32  # bootstrap replicates
# Deterministic per-(row, replicate) uniform: a splitmix-style integer mix
# shared VERBATIM with the oracle (both engines compute identical int64
# arithmetic), scaled to [0, 2^31). Poisson(1) replicate weights come from
# the inverse CDF over that uniform: P(0)=.3679, P(<=1)=.7358, P(<=2)=.9197,
# P(<=3)=.9810, else 4 (capped) — thresholds pre-scaled to 2^31.
_BOOT_T0 = 790_015_084    # floor(e^-1 * 2^31)
_BOOT_T1 = 1_580_030_169  # floor((e^-1 + e^-1) * 2^31)
_BOOT_T2 = 1_975_037_711  # floor(... * 2^31)
_BOOT_T3 = 2_106_707_225
_BOOT_MIX = (
    "(((event_id * 2654435761 + {b} * 40503 + 987654323) % 2147483647"
    " + 2147483647) % 2147483647)"
)


def _boot_weight(b_expr: str) -> str:
    u = _BOOT_MIX.format(b=b_expr)
    return (
        f"(CASE WHEN {u} < {_BOOT_T0} THEN 0"
        f" WHEN {u} < {_BOOT_T1} THEN 1"
        f" WHEN {u} < {_BOOT_T2} THEN 2"
        f" WHEN {u} < {_BOOT_T3} THEN 3 ELSE 4 END)"
    )


def _bootstrap_oracle() -> str:
    w = _boot_weight("b")
    return f"""
    WITH ev AS (
        SELECT event_id, event_type,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events
    ),
    rep AS (
        SELECT e.event_type, r.b,
               sum({w} * e.cents) AS wsum,
               sum({w}) AS wn
        FROM ev e CROSS JOIN (
            SELECT unnest(range({_BOOT_B})) AS b
        ) r
        GROUP BY e.event_type, r.b
    ),
    means AS (
        SELECT event_type, b,
               wsum * 1000000 // wn AS mean_x1e6,
               row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY wsum * 1000000 // wn, b
               ) AS rn
        FROM rep WHERE wn > 0
    ),
    point AS (
        SELECT event_type,
               sum(cents) * 1000000 // count(*) AS point_mean_x1e6,
               count(*) AS n
        FROM ev GROUP BY event_type
    )
    SELECT p.event_type,
           CAST(p.n AS BIGINT) AS n_events,
           CAST(p.point_mean_x1e6 AS BIGINT) AS point_mean_x1e6,
           CAST(min(CASE WHEN m.rn = 2 THEN m.mean_x1e6 END) AS BIGINT)
               AS boot_lo_x1e6,
           CAST(min(CASE WHEN m.rn = {_BOOT_B} - 1 THEN m.mean_x1e6 END)
                AS BIGINT) AS boot_hi_x1e6
    FROM point p JOIN means m ON m.event_type = p.event_type
    GROUP BY p.event_type, p.n, p.point_mean_x1e6
    """


@query("sample_bootstrap_ci", oracle=_bootstrap_oracle())
def sample_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POISSON BOOTSTRAP confidence interval for the per-event-type mean
    value — THE distributed bootstrap (Chamandy et al., "Estimating
    Uncertainty for Massive Data Streams", Google TR 2012; public): a
    classical resample needs n draws over the whole dataset per
    replicate, but Poisson(1) per-row weights are independent across
    rows, so ALL {_BOOT_B} replicates compute in ONE scan — each row
    contributes weight w ~ Poisson(1) to replicate b via a deterministic
    integer mix of (event_id, b), and replicate means collapse in the
    same partial aggregate. The CI is the [2nd, {_BOOT_B}-1-th] order
    statistics of the replicate means (≈ the 5/95 band at B={_BOOT_B}).

    Determinism/exactness: the uniform is pure int64 arithmetic shared
    verbatim with the oracle; weights are exact inverse-CDF thresholds
    (capped at 4); means are floor-scaled integers — no float anywhere.

    Scale shape: one events scan → in-row {_BOOT_B}-element explode →
    partial-agg groupBy on (type, b) (shuffle O(types·B), data-size
    independent); the order-statistic window runs on the {_BOOT_B}-row
    per-type domain. At 100 TB this is exactly one extra pass-width of
    B over the scan — the reason Poisson bootstrap exists."""
    w = _boot_weight("b")
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    rep = (
        ev.select(
            "event_type",
            "event_id",
            "cents",
            F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b"),
        )
        .groupBy("event_type", "b")
        .agg(
            F.expr(f"sum({w} * cents)").alias("wsum"),
            F.expr(f"sum({w})").alias("wn"),
        )
        .filter(F.col("wn") > 0)
        .select(
            "event_type",
            "b",
            F.expr("wsum * 1000000 DIV wn").alias("mean_x1e6"),
        )
    )
    wnd = Window.partitionBy("event_type").orderBy("mean_x1e6", "b")
    ranked = rep.withColumn("rn", F.row_number().over(wnd))
    ci = ranked.groupBy("event_type").agg(
        F.min(F.when(F.col("rn") == 2, F.col("mean_x1e6")))
        .cast("bigint")
        .alias("boot_lo_x1e6"),
        F.min(F.when(F.col("rn") == _BOOT_B - 1, F.col("mean_x1e6")))
        .cast("bigint")
        .alias("boot_hi_x1e6"),
    )
    point = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.expr("CAST(sum(cents) * 1000000 DIV count(*) AS BIGINT)").alias(
            "point_mean_x1e6"
        ),
    )
    return point.join(ci, "event_type").select(
        "event_type", "n_events", "point_mean_x1e6",
        "boot_lo_x1e6", "boot_hi_x1e6",
    )

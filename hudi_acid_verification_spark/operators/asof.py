"""As-of and range joins — operators Spark lacks natively, composed from
built-ins per the custom-operator preference order (composition first,
pandas UDF only if semantics demand it; these don't).

- as-of join: "latest prior matching event" = IGNORE NULLS carry-forward
  window — ONE shuffle on the partition key, no self-join, no range scan.
  (pd.merge_asof per group would be the applyInPandas fallback; the window
  formulation stays in the JVM and streams.)
- range join: value BETWEEN lo AND hi against a band table = bucketize the
  value to the band grid, then EQUI-join on the bucket — turns an O(N·B)
  theta join into a broadcast hash join. The general recipe for ranges of
  mixed width is banding by the minimum band width; here the grid is fixed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import load, query


@query(
    "join_asof_carry",
    oracle="""
    SELECT event_id, user_id, event_type, ts_us,
           last_value(CASE WHEN event_type = 'purchase' THEN value END
                      IGNORE NULLS) OVER (
               PARTITION BY user_id
               ORDER BY ts_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS last_purchase_value
    FROM (SELECT event_id, user_id, event_type, value,
                 epoch_us(ts) AS ts_us FROM events)
    """,
)
def join_asof_carry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (event → user's most recent prior-or-current purchase)
    expressed as an IGNORE NULLS last_value carry-forward."""
    e = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.expr("ts_ns DIV 1000").alias("ts_us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        "event_type",
        "ts_us",
        F.last(
            F.when(F.col("event_type") == "purchase", F.col("value")),
            ignorenulls=True,
        )
        .over(w)
        .alias("last_purchase_value"),
    )


_BAND_WIDTH = 50  # price-band grid width


@query(
    "join_range_band",
    oracle=f"""
    WITH bands(band_lo, band_hi, band_name) AS (VALUES
        (0,    500,  'budget'),
        (500,  1000, 'mid'),
        (1000, 1500, 'premium'),
        (1500, 2000, 'luxury')
    ),
    grid AS (
        SELECT b.band_name, b.band_lo, b.band_hi,
               u.bucket
        FROM bands b,
             LATERAL (SELECT unnest(generate_series(
                 b.band_lo // {_BAND_WIDTH},
                 (b.band_hi - 1) // {_BAND_WIDTH})) AS bucket) u
    )
    SELECT p.p_partkey, p.p_retailprice, g.band_name
    FROM part p
    JOIN grid g
      ON CAST(floor(p.p_retailprice / {_BAND_WIDTH}) AS BIGINT) = g.bucket
     AND p.p_retailprice >= g.band_lo AND p.p_retailprice < g.band_hi
    """,
)
def join_range_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (price BETWEEN band bounds) as bucketize + equi-join.

    The band table explodes to one row per covered bucket; the fact side
    computes its bucket and hash-joins — broadcastable, no theta join.
    """
    spark_bands = spark.createDataFrame(
        [(0, 500, "budget"), (500, 1000, "mid"),
         (1000, 1500, "premium"), (1500, 2000, "luxury")],
        "band_lo int, band_hi int, band_name string",
    )
    grid = spark_bands.select(
        "band_name",
        "band_lo",
        "band_hi",
        F.explode(
            F.sequence(
                F.floor(F.col("band_lo") / _BAND_WIDTH).cast("bigint"),
                F.floor((F.col("band_hi") - 1) / _BAND_WIDTH).cast("bigint"),
            )
        ).alias("bucket"),
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    return (
        p.withColumn(
            "bucket",
            F.floor(F.col("p_retailprice") / _BAND_WIDTH).cast("bigint"),
        )
        .join(F.broadcast(grid), "bucket")
        .filter(
            (F.col("p_retailprice") >= F.col("band_lo"))
            & (F.col("p_retailprice") < F.col("band_hi"))
        )
        .select("p_partkey", "p_retailprice", "band_name")
    )


@query(
    "window_gap_fill",
    oracle="""
    WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n_events,
               arg_max(value, event_id) AS day_close
        FROM events GROUP BY 1, 2
    ),
    span AS (
        SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1
    ),
    grid AS (
        SELECT s.user_id, CAST(u.d AS DATE) AS day
        FROM span s, LATERAL (
            SELECT unnest(generate_series(CAST(s.d0 AS TIMESTAMP),
                                          CAST(s.d1 AS TIMESTAMP),
                                          INTERVAL 1 DAY)) AS d
        ) u
    ),
    joined AS (
        SELECT g.user_id, g.day,
               CAST(coalesce(d.n_events, 0) AS BIGINT) AS n_events,
               d.day_close
        FROM grid g
        LEFT JOIN daily d ON d.user_id = g.user_id AND d.day = g.day
    )
    SELECT user_id, strftime(day, '%Y-%m-%d') AS day, n_events,
           (n_events = 0) AS is_gap,
           last_value(day_close IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled_close
    FROM joined
    """,
)
def window_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill (resample + forward fill): each user's event
    stream is resampled onto a dense daily grid spanning their first to
    last active day; days with no events appear as explicit gap rows whose
    closing value carries forward from the last observed day (the
    ``day_close`` is the value of the day's max-event_id event — a
    deterministic "last write"). The missing-bucket densification +
    LOCF fill every monitoring / feature-engineering pipeline needs and
    SQL engines ship as ``date_spine``/``time_bucket_gapfill``.

    Shape: one aggregate to daily grain (map-side partials eat the raw
    events), a per-user span aggregate (tiny), the grid generated by
    ``sequence``+``explode`` — rows materialize distributed, proportional
    to user-days, never on the driver — and the grid⋈daily join plus the
    carry-forward window both key on user_id, so one exchange serves
    both. At 100 TB the grid side is O(users × days) ≪ O(events) and
    every stage keys on user_id — no global sort anywhere.
    """
    e = load(spark, sf_dir, "events")
    daily = e.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max_by("value", "event_id").alias("day_close"),
    )
    span = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = span.select(
        "user_id",
        F.explode(
            F.sequence(F.col("d0"), F.col("d1"), F.expr("interval 1 day"))
        ).alias("day"),
    )
    joined = grid.join(daily, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
        (F.coalesce("n_events", F.lit(0)) == 0).alias("is_gap"),
        F.last("day_close", ignorenulls=True).over(w).alias("filled_close"),
    )


_IVL_A_NS = 30 * 60 * 1_000_000_000   # purchase influence window: 30 min
_IVL_B_NS = 15 * 60 * 1_000_000_000   # error window: 15 min
_IVL_GRID_NS = _IVL_A_NS              # grid = max interval width


@query(
    "join_interval_overlap",
    oracle=f"""
    WITH a AS (
        SELECT event_id AS a_id, epoch_ns(ts) AS s,
               epoch_ns(ts) + {_IVL_A_NS} AS e
        FROM events WHERE event_type = 'purchase'
    ),
    b AS (
        SELECT event_id AS b_id, epoch_ns(ts) AS s,
               epoch_ns(ts) + {_IVL_B_NS} AS e
        FROM events WHERE event_type = 'error'
    )
    SELECT a.a_id AS purchase_id,
           count(*) AS n_overlapping_errors,
           min(b.b_id) AS first_error_id
    FROM a JOIN b ON a.s < b.e AND b.s < a.e
    GROUP BY a.a_id
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: every purchase projects a 30-minute influence
    interval, every error a 15-minute one; pair them whenever the intervals
    overlap (a.start < b.end AND b.start < a.end) and roll up per purchase.
    Interval×interval overlap is the join relational engines fall back to a
    nested-loop theta join for — the scalable encoding is GRID
    DECOMPOSITION: bucket time into cells of the max interval width, emit
    each interval into every cell it touches (≤ 2 here), EQUI-join on the
    cell, dedup the pair, and apply the exact overlap predicate as a
    post-filter. The theta join becomes a hash join whose replication
    factor is interval_width/grid_width, never a cartesian.

    Shape: both sides explode into O(1) grid cells, shuffle keys on the
    cell id (time-uniform → no skew; a hot cell would re-split by salting),
    and the rollup keys on purchase_id. At 100 TB this is two scans + one
    bounded-fanout hash join — the same plan TimescaleDB/KDB-style range
    engines special-case, expressed with stock Spark operators. Exactness:
    all bounds are int64 nanoseconds (ts_ns), predicate and group results
    integer-exact in both engines.
    """
    e = load(spark, sf_dir, "events")
    a = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("a_id"),
        F.col("ts_ns").alias("a_s"),
        (F.col("ts_ns") + F.lit(_IVL_A_NS)).alias("a_e"),
    )
    b = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("b_id"),
        F.col("ts_ns").alias("b_s"),
        (F.col("ts_ns") + F.lit(_IVL_B_NS)).alias("b_e"),
    )
    cells = lambda s, e_: F.sequence(  # noqa: E731
        F.expr(f"{s} DIV {_IVL_GRID_NS}"), F.expr(f"{e_} DIV {_IVL_GRID_NS}")
    )
    ag = a.withColumn("cell", F.explode(cells("a_s", "a_e")))
    bg = b.withColumn("cell", F.explode(cells("b_s", "b_e")))
    pairs = (
        ag.join(bg, "cell")
        .filter((F.col("a_s") < F.col("b_e")) & (F.col("b_s") < F.col("a_e")))
        .select("a_id", "b_id")
        .dropDuplicates(["a_id", "b_id"])
    )
    return pairs.groupBy(F.col("a_id").alias("purchase_id")).agg(
        F.count(F.lit(1)).alias("n_overlapping_errors"),
        F.min("b_id").alias("first_error_id"),
    )


_ASOF_TOL_US = 600_000_000  # 10-minute staleness bound, microseconds


@query(
    "join_asof_tolerance",
    oracle=f"""
    WITH carried AS (
        SELECT event_id, user_id, event_type, ts_us,
               last_value(CASE WHEN event_type = 'purchase' THEN value END
                          IGNORE NULLS) OVER w AS pv,
               last_value(CASE WHEN event_type = 'purchase' THEN ts_us END
                          IGNORE NULLS) OVER w AS pt
        FROM (SELECT event_id, user_id, event_type, value,
                     epoch_us(ts) AS ts_us FROM events)
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id, ts_us,
           CASE WHEN pt IS NOT NULL AND ts_us - pt <= {_ASOF_TOL_US}
                THEN pv END AS last_purchase_value,
           CASE WHEN pt IS NOT NULL AND ts_us - pt <= {_ASOF_TOL_US}
                THEN CAST(ts_us - pt AS BIGINT) END AS staleness_us
    FROM carried
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a TOLERANCE bound (pandas ``merge_asof(tolerance=)``
    / kdb ``wj`` semantics): the carried most-recent purchase only counts
    while it is at most 10 minutes stale — older context must NOT leak
    forward (feature-engineering correctness: a model served "last
    purchase" from yesterday would train on a signal production won't
    have). Same single-shuffle carry-forward window as ``join_asof_carry``
    but carrying the matched TIMESTAMP alongside the value, then nulling
    both outside the bound — still zero self-joins, zero range scans.
    """
    e = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.expr("ts_ns DIV 1000").alias("ts_us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_p = F.col("event_type") == "purchase"
    carried = e.select(
        "event_id",
        "user_id",
        "ts_us",
        F.last(F.when(is_p, F.col("value")), ignorenulls=True)
        .over(w)
        .alias("pv"),
        F.last(F.when(is_p, F.col("ts_us")), ignorenulls=True)
        .over(w)
        .alias("pt"),
    )
    fresh = F.col("pt").isNotNull() & (
        F.col("ts_us") - F.col("pt") <= _ASOF_TOL_US
    )
    return carried.select(
        "event_id",
        "user_id",
        "ts_us",
        F.when(fresh, F.col("pv")).alias("last_purchase_value"),
        F.when(fresh, (F.col("ts_us") - F.col("pt")).cast("bigint")).alias(
            "staleness_us"
        ),
    )


@query(
    "window_gap_interpolate",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events GROUP BY 1, 2
    ),
    span AS (
        SELECT event_type, min(day) AS d0, max(day) AS d1
        FROM daily GROUP BY 1
    ),
    grid AS (
        SELECT s.event_type, CAST(u.d AS DATE) AS day
        FROM span s, LATERAL (
            SELECT unnest(generate_series(CAST(s.d0 AS TIMESTAMP),
                                          CAST(s.d1 AS TIMESTAMP),
                                          INTERVAL 1 DAY)) AS d
        ) u
    ),
    joined AS (
        SELECT g.event_type, g.day, d.cents,
               CAST(datediff('day', DATE '2024-01-01', g.day) AS BIGINT)
                   AS dnum
        FROM grid g
        LEFT JOIN daily d ON d.event_type = g.event_type AND d.day = g.day
    ),
    bracketed AS (
        SELECT event_type, day, dnum, cents,
               last_value(cents IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY dnum
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS v_prev,
               last_value(CASE WHEN cents IS NOT NULL THEN dnum END
                          IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY dnum
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS d_prev,
               first_value(cents IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY dnum
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
               ) AS v_next,
               first_value(CASE WHEN cents IS NOT NULL THEN dnum END
                           IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY dnum
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
               ) AS d_next
        FROM joined
    ),
    num AS (
        SELECT *, (v_prev * (d_next - dnum) + v_next * (dnum - d_prev))
                  * 1000000 AS a,
                  (d_next - d_prev) AS b
        FROM bracketed
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
           (cents IS NULL) AS is_interpolated,
           -- explicit FLOOR division (// truncates toward zero in both
           -- engines; floor is sign-safe — ADVICE r7): b > 0 always
           CAST(CASE WHEN cents IS NOT NULL THEN cents * 1000000
                WHEN d_next = d_prev THEN v_prev * 1000000
                ELSE a // b - (CASE WHEN a % b != 0 AND a < 0
                               THEN 1 ELSE 0 END)
           END AS BIGINT) AS cents_x1e6
    FROM num
    """,
)
def window_gap_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap fill with LINEAR interpolation — the companion of
    `window_gap_fill`'s LOCF: missing days on each event type's daily
    revenue spine take the straight line between the bracketing observed
    days, the default imputation for rate-like series (LOCF steps, linear
    ramps). Interpolated values are exact scaled integers:
    floor((v_prev·(d_next−d) + v_next·(d−d_prev))·1e6 / (d_next−d_prev))
    — the floor is computed EXPLICITLY on BOTH sides (Spark DIV and
    DuckDB // each truncate toward zero, so a bare integer division is
    only sign-safe by accident of the fixture's nonnegative values; the
    shared a DIV b − 1[a%b≠0 ∧ a<0] form floors for any sign — ADVICE
    r7, hardened beyond it). No float ever enters, so even the imputed
    values hash cross-engine.
    Boundary days are observed by construction (the spine spans min..max
    observed day per key), so both brackets always exist.

    Shape: identical cost class to `window_gap_fill` — daily-grain
    partial agg, per-key span, distributed sequence+explode grid, one
    exchange on the key serving both the grid join and the two
    bracket-carry windows (forward + backward over the same partition).
    At 100 TB the spine is O(keys × days) ≪ O(events).
    """
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    span = daily.groupBy("event_type").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = span.select(
        "event_type",
        F.explode(
            F.sequence(F.col("d0"), F.col("d1"), F.expr("interval 1 day"))
        ).alias("day"),
    )
    joined = grid.join(daily, ["event_type", "day"], "left").withColumn(
        "dnum", F.datediff("day", F.lit("2024-01-01")).cast("bigint")
    )
    wb = (
        Window.partitionBy("event_type")
        .orderBy("dnum")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("event_type")
        .orderBy("dnum")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("cents").isNotNull(), F.col("dnum"))
    bracketed = joined.select(
        "event_type",
        "day",
        "dnum",
        "cents",
        F.last("cents", ignorenulls=True).over(wb).alias("v_prev"),
        F.last(obs_day, ignorenulls=True).over(wb).alias("d_prev"),
        F.first("cents", ignorenulls=True).over(wf).alias("v_next"),
        F.first(obs_day, ignorenulls=True).over(wf).alias("d_next"),
    )
    interp = F.when(
        F.col("cents").isNotNull(), F.col("cents") * 1000000
    ).when(
        F.col("d_next") == F.col("d_prev"), F.col("v_prev") * 1000000
    ).otherwise(
        # Explicit FLOOR division (ADVICE r7): both engines' integer
        # division truncates toward zero, so negative numerators (refund
        # days making cents < 0) would round UP — wrong for a floor-based
        # interpolation contract. With den > 0 by construction, floor(a/b)
        # = a DIV b − (1 if a % b ≠ 0 and a < 0); mirrored in the oracle.
        F.expr(
            "((v_prev * (d_next - dnum) + v_next * (dnum - d_prev))"
            " * 1000000) DIV (d_next - d_prev)"
            " - (CASE WHEN ((v_prev * (d_next - dnum)"
            " + v_next * (dnum - d_prev)) * 1000000) % (d_next - d_prev)"
            " != 0 AND (v_prev * (d_next - dnum)"
            " + v_next * (dnum - d_prev)) < 0 THEN 1 ELSE 0 END)"
        )
    )
    return bracketed.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("cents").isNull().alias("is_interpolated"),
        interp.cast("bigint").alias("cents_x1e6"),
    )

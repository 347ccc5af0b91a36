"""Mergeable-sketch operators (round 6): shard-merged quantile histograms,
KMV/Theta distinct set operations, and sliding-window distinct sketches.

These complete the sketch family in `sketch.py` along the MERGE axis — the
property that makes a sketch useful at 100 TB is not its size but that
partial sketches built independently per shard/executor/day combine into
the global answer with a tiny, associative merge:

- quantile merge: per-shard histogram counts merge by ADDITION,
- Theta/KMV set ops: per-set k-minimum-value samples merge by
  UNION-then-truncate (and intersect under the min theta),
- windowed distinct: per-day HLL registers merge by MAX across the
  trailing window.

Every sketch here is deterministic (md5-derived hashes, integer
arithmetic, fixed-order floating folds), so the DuckDB oracle rebuilds the
identical sketch and the driver hash-checks the sketch CONTENTS — same
design rule as `sketch.py` (no library sketches: their register layouts
are engine-private and merge-order-dependent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import load, query

# ---------------------------------------------------------------- quantile
_QM_BUCKETS = 1024
_QM_SHARDS = 8
_QM_QUANTILES = (50, 90, 99)


@query(
    "sketch_quantile_merge",
    oracle=f"""
    WITH cents AS (
        SELECT l_orderkey % {_QM_SHARDS} AS shard,
               CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v
        FROM lineitem
    ),
    bounds AS (
        SELECT min(v) AS lo,
               (max(v) - min(v)) // {_QM_BUCKETS} + 1 AS width,
               CAST(count(*) AS BIGINT) AS n
        FROM cents
    ),
    shard_hist AS (
        SELECT c.shard, (c.v - b.lo) // b.width AS bucket,
               CAST(count(*) AS BIGINT) AS cnt
        FROM cents c, bounds b GROUP BY 1, 2
    ),
    shard_cum AS (
        SELECT shard, bucket, cnt,
               CAST(sum(cnt) OVER (PARTITION BY shard ORDER BY bucket
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_le,
               CAST(sum(cnt) OVER (PARTITION BY shard) AS BIGINT) AS shard_n
        FROM shard_hist
    ),
    qs AS (SELECT unnest([{", ".join(str(q) for q in _QM_QUANTILES)}]) AS q),
    shard_q AS (
        SELECT q.q, s.shard, min(s.bucket) AS shard_bucket
        FROM qs q JOIN shard_cum s
          ON s.n_le >= (q.q * s.shard_n + 99) // 100
        GROUP BY 1, 2
    ),
    merged AS (
        SELECT bucket, CAST(sum(cnt) AS BIGINT) AS cnt
        FROM shard_hist GROUP BY 1
    ),
    merged_cum AS (
        SELECT bucket, CAST(sum(cnt) OVER (ORDER BY bucket
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_le
        FROM merged
    )
    SELECT q.q,
           CAST(min(m.bucket) AS BIGINT) AS bucket,
           CAST(min(b.lo + m.bucket * b.width) AS BIGINT) AS approx_lo_cents,
           CAST(min(b.lo + (m.bucket + 1) * b.width - 1) AS BIGINT)
               AS approx_hi_cents,
           CAST(min(m.n_le) AS BIGINT) AS n_le,
           CAST((SELECT min(shard_bucket) FROM shard_q s WHERE s.q = q.q)
                AS BIGINT) AS shard_bucket_min,
           CAST((SELECT max(shard_bucket) FROM shard_q s WHERE s.q = q.q)
                AS BIGINT) AS shard_bucket_max
    FROM qs q
    JOIN bounds b ON true
    JOIN merged_cum m ON m.n_le >= (q.q * b.n + 99) // 100
    GROUP BY q.q
    """,
)
def sketch_quantile_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate-quantile sketch MERGE across shards — the percentile
    companion of `sketch_hll_merge` (VERDICT r5 directive #2): each of
    {_QM_SHARDS} shards builds its own fixed-grid histogram of
    l_extendedprice cents INDEPENDENTLY, the shard histograms merge by
    plain addition, and the requested quantiles resolve from the merged
    cumulative counts. Per-shard quantile buckets ride along (their
    min/max across shards) to show what merging buys: a single shard's
    p99 can sit buckets away from the merged truth.

    Why this sketch merges exactly where t-digest/KLL cannot: the grid is
    fixed by the global [min, max] bounds, so a bucket means the same
    value range in every shard and merged counts ARE the global counts —
    addition is the whole merge. At 100 TB each executor ships at most
    {_QM_BUCKETS} (bucket, cnt) rows per shard through the exchange
    regardless of data size, the same O(sketch) property as every
    operator in this family; the bounds pre-pass is one map-side
    min/max/count aggregate.

    Shape: bounds broadcast to the histogram build; shard histograms are
    one partial-aggregated groupBy(shard, bucket); the merge is a second
    groupBy(bucket) over ≤ shards×buckets rows; cumulative + quantile
    resolution happen on ≤ {_QM_BUCKETS} rows.
    """
    li = load(spark, sf_dir, "lineitem")
    cents = li.select(
        (F.col("l_orderkey") % _QM_SHARDS).alias("shard"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("v"),
    )
    bounds = cents.agg(
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    ).select(
        "lo", "n", F.expr(f"(hi - lo) DIV {_QM_BUCKETS} + 1").alias("width")
    )
    shard_hist = (
        cents.crossJoin(F.broadcast(bounds))
        .select("shard", F.expr("(v - lo) DIV width").alias("bucket"))
        .groupBy("shard", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    w_shard = (
        Window.partitionBy("shard")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    shard_cum = shard_hist.select(
        "shard",
        "bucket",
        F.sum("cnt").over(w_shard).cast("bigint").alias("n_le"),
        F.sum("cnt")
        .over(Window.partitionBy("shard"))
        .cast("bigint")
        .alias("shard_n"),
    )
    qs = spark.range(1).select(
        F.explode(F.array(*[F.lit(q) for q in _QM_QUANTILES])).alias("q")
    )
    shard_q = (
        qs.join(
            shard_cum,
            F.col("n_le") >= F.expr("(q * shard_n + 99) DIV 100"),
        )
        .groupBy("q", "shard")
        .agg(F.min("bucket").alias("shard_bucket"))
        .groupBy("q")
        .agg(
            F.min("shard_bucket").cast("bigint").alias("shard_bucket_min"),
            F.max("shard_bucket").cast("bigint").alias("shard_bucket_max"),
        )
    )
    merged = shard_hist.groupBy("bucket").agg(
        F.sum("cnt").cast("bigint").alias("cnt")
    )
    w_all = Window.partitionBy(F.lit(0)).orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    merged_cum = merged.select(
        "bucket", F.sum("cnt").over(w_all).cast("bigint").alias("n_le")
    )
    return (
        qs.crossJoin(F.broadcast(bounds))
        .join(merged_cum, F.col("n_le") >= F.expr("(q * n + 99) DIV 100"))
        .groupBy("q")
        .agg(
            F.min("bucket").cast("bigint").alias("bucket"),
            F.min(F.expr("lo + bucket * width"))
            .cast("bigint")
            .alias("approx_lo_cents"),
            F.min(F.expr("lo + (bucket + 1) * width - 1"))
            .cast("bigint")
            .alias("approx_hi_cents"),
            F.min("n_le").cast("bigint").alias("n_le"),
        )
        .join(F.broadcast(shard_q), "q")
        .select(
            "q", "bucket", "approx_lo_cents", "approx_hi_cents", "n_le",
            "shard_bucket_min", "shard_bucket_max",
        )
    )


# ------------------------------------------------------------- theta / KMV
_THETA_K = 64
_THETA_M = 1 << 48  # 48-bit hash domain (12 hex digits of md5)
_THETA_PAIR = ("click", "purchase")


def _h48_sql(expr: str) -> str:
    return (
        f"CAST(('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 12)) "
        "AS BIGINT)"
    )


def _h48_col(col):
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 12), 16, 10).cast(
        "bigint"
    )


@query(
    "sketch_theta_setops",
    oracle=f"""
    WITH hashed AS (
        SELECT DISTINCT event_type AS s, {_h48_sql('user_id')} AS h,
               user_id
        FROM events
        WHERE event_type IN ('{_THETA_PAIR[0]}', '{_THETA_PAIR[1]}')
    ),
    ranked AS (
        SELECT s, h, user_id,
               row_number() OVER (PARTITION BY s ORDER BY h) AS rn
        FROM hashed
    ),
    kept AS (SELECT s, h, user_id FROM ranked WHERE rn <= {_THETA_K}),
    thetas AS (SELECT s, max(h) AS kth FROM kept GROUP BY s),
    est AS (
        SELECT s, CAST(({_THETA_K} - 1) * {_THETA_M} // kth AS BIGINT)
               AS est_distinct
        FROM thetas
    ),
    union_kept AS (
        SELECT h FROM (
            SELECT DISTINCT h FROM kept
        ) u ORDER BY h LIMIT {_THETA_K}
    ),
    union_est AS (
        SELECT CAST(({_THETA_K} - 1) * {_THETA_M} // max(h) AS BIGINT)
               AS est_union
        FROM union_kept
    ),
    theta_min AS (SELECT min(kth) AS theta FROM thetas),
    inter_est AS (
        SELECT CAST(count(*) * {_THETA_M} // min(t.theta) AS BIGINT)
               AS est_intersect
        FROM kept a JOIN kept b
          ON b.h = a.h AND a.s = '{_THETA_PAIR[0]}'
             AND b.s = '{_THETA_PAIR[1]}'
        JOIN theta_min t ON a.h < t.theta
    ),
    exact AS (
        SELECT
          CAST(count(DISTINCT CASE WHEN event_type = '{_THETA_PAIR[0]}'
               THEN user_id END) AS BIGINT) AS exact_a,
          CAST(count(DISTINCT CASE WHEN event_type = '{_THETA_PAIR[1]}'
               THEN user_id END) AS BIGINT) AS exact_b,
          CAST(count(DISTINCT user_id) AS BIGINT) AS exact_union
        FROM events
        WHERE event_type IN ('{_THETA_PAIR[0]}', '{_THETA_PAIR[1]}')
    ),
    exact_i AS (
        SELECT CAST(count(*) AS BIGINT) AS exact_intersect FROM (
            SELECT user_id FROM events
            WHERE event_type = '{_THETA_PAIR[0]}'
            INTERSECT
            SELECT user_id FROM events
            WHERE event_type = '{_THETA_PAIR[1]}'
        )
    )
    SELECT '{_THETA_PAIR[0]}' AS set_a, '{_THETA_PAIR[1]}' AS set_b,
           (SELECT est_distinct FROM est WHERE s = '{_THETA_PAIR[0]}')
               AS est_a,
           (SELECT est_distinct FROM est WHERE s = '{_THETA_PAIR[1]}')
               AS est_b,
           (SELECT est_union FROM union_est) AS est_union,
           (SELECT est_intersect FROM inter_est) AS est_intersect,
           exact_a, exact_b, exact_union,
           (SELECT exact_intersect FROM exact_i) AS exact_intersect
    FROM exact
    """,
)
def sketch_theta_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch (k-minimum-values) SET OPERATIONS over event audiences
    — distinct union and intersection cardinality estimated from two
    {_THETA_K}-value samples instead of the key-level joins
    `agg_bitmap_overlap` needs (VERDICT r5 directive #2: the generalization
    beyond exact bitmaps to non-integer / cross-table key domains).

    The sketch per set is the {_THETA_K} smallest 48-bit md5 hash values
    of its members; theta = the k-th smallest. Estimates are pure integer
    arithmetic (no floats anywhere):
      distinct(S)  = (k-1)·M / theta_S      (classic KMV estimator),
      union        = same estimator on the k smallest of the merged
                     samples (union-then-truncate — the Theta merge),
      intersection = |{{v ∈ A∩B : v < min theta}}| · M / min theta
                     (both samples are uniform below the smaller theta).
    Exact counts ride along to certify the observed error in-band, like
    `sketch_hll_merge`.

    Scale shape: each executor keeps its local k smallest per set (a
    bounded heap — here expressed as the partial TOP-K the window head
    resolves), so the exchange carries ≤ k rows per set per partition;
    merges are min-k truncations, associative and commutative. The
    intersection never joins raw keys — only the two ≤{_THETA_K}-row
    retained samples.
    """
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin(*_THETA_PAIR)
    )
    hashed = ev.select(
        F.col("event_type").alias("s"),
        "user_id",
    ).distinct().select("s", "user_id", _h48_col(F.col("user_id")).alias("h"))
    w = Window.partitionBy("s").orderBy("h")
    kept = (
        hashed.select("s", "h", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= _THETA_K)
        .select("s", "h")
    )
    thetas = kept.groupBy("s").agg(F.max("h").alias("kth"))
    est = thetas.select(
        "s",
        F.expr(f"({_THETA_K} - 1) * {_THETA_M} DIV kth").alias(
            "est_distinct"
        ),
    )
    union_kept = (
        kept.select("h").distinct().orderBy("h").limit(_THETA_K)
    )
    union_est = union_kept.agg(
        F.expr(f"({_THETA_K} - 1) * {_THETA_M} DIV max(h)").alias(
            "est_union"
        )
    )
    theta_min = thetas.agg(F.min("kth").alias("theta"))
    a = kept.filter(F.col("s") == _THETA_PAIR[0]).select("h")
    b = kept.filter(F.col("s") == _THETA_PAIR[1]).select("h")
    # UNGROUPED agg so an empty sample intersection still yields exactly
    # one row (n_below=0, theta=NULL -> NULL estimate) — a groupBy over
    # zero rows would collapse the whole chained-crossJoin result to 0
    # rows while the oracle's scalar subquery returns one NULL row.
    inter_est = (
        a.join(b, "h")
        .crossJoin(F.broadcast(theta_min))
        .filter(F.col("h") < F.col("theta"))
        .agg(
            F.count(F.lit(1)).alias("n_below"),
            F.min("theta").alias("theta"),
        )
        .select(
            F.expr(f"n_below * {_THETA_M} DIV theta").alias("est_intersect")
        )
    )
    exact = ev.agg(
        F.countDistinct(
            F.when(F.col("event_type") == _THETA_PAIR[0], F.col("user_id"))
        ).cast("bigint").alias("exact_a"),
        F.countDistinct(
            F.when(F.col("event_type") == _THETA_PAIR[1], F.col("user_id"))
        ).cast("bigint").alias("exact_b"),
        F.countDistinct("user_id").cast("bigint").alias("exact_union"),
    )
    ua = ev.filter(F.col("event_type") == _THETA_PAIR[0]).select("user_id")
    ub = ev.filter(F.col("event_type") == _THETA_PAIR[1]).select("user_id")
    exact_i = (
        ua.intersect(ub)
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_intersect"))
    )
    est_a = est.filter(F.col("s") == _THETA_PAIR[0]).select(
        F.col("est_distinct").alias("est_a")
    )
    est_b = est.filter(F.col("s") == _THETA_PAIR[1]).select(
        F.col("est_distinct").alias("est_b")
    )
    return (
        exact.crossJoin(F.broadcast(est_a))
        .crossJoin(F.broadcast(est_b))
        .crossJoin(F.broadcast(union_est))
        .crossJoin(F.broadcast(inter_est))
        .crossJoin(F.broadcast(exact_i))
        .select(
            F.lit(_THETA_PAIR[0]).alias("set_a"),
            F.lit(_THETA_PAIR[1]).alias("set_b"),
            "est_a", "est_b", "est_union", "est_intersect",
            "exact_a", "exact_b", "exact_union", "exact_intersect",
        )
    )


# ---------------------------------------------------- windowed distinct HLL
_WD_M = 64  # registers per day
_WD_ALPHA = 0.7213 / (1.0 + 1.079 / _WD_M)
_WD_DAYS = 7  # trailing window


@query(
    "sketch_window_distinct",
    oracle=f"""
    WITH ev AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
        FROM events
    ),
    spine AS (
        SELECT day, CAST(date_diff('day', (SELECT min(day) FROM ev), day)
               AS BIGINT) AS day_idx
        FROM (SELECT DISTINCT day FROM ev)
    ),
    mapped AS (
        SELECT DISTINCT e.day,
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 2))
                    AS BIGINT) % {_WD_M} AS bucket,
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 3, 13))
                    AS BIGINT) AS rest
        FROM ev e
    ),
    day_regs AS (
        SELECT day, bucket,
               max(CASE WHEN rest = 0 THEN 53
                        ELSE 53 - length(bin(rest)) END) AS reg
        FROM mapped GROUP BY 1, 2
    ),
    grid AS (
        SELECT s.day, s.day_idx, b.bucket, COALESCE(r.reg, 0) AS reg
        FROM spine s
        CROSS JOIN (SELECT unnest(generate_series(0, {_WD_M - 1}))
                    AS bucket) b
        LEFT JOIN day_regs r ON r.day = s.day AND r.bucket = b.bucket
    ),
    win_regs AS (
        SELECT day, day_idx, bucket,
               max(reg) OVER (PARTITION BY bucket ORDER BY day_idx
                    RANGE BETWEEN {_WD_DAYS - 1} PRECEDING
                          AND CURRENT ROW) AS reg
        FROM grid
    ),
    folded AS (
        SELECT day,
               CAST(list_sum(list(1.0 / power(2.0, reg) ORDER BY bucket))
                    AS DOUBLE) AS inv_sum,
               CAST(sum(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_zero
        FROM win_regs GROUP BY day
    ),
    exact AS (
        SELECT s.day, CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_exact
        FROM spine s
        JOIN ev e ON e.day BETWEEN s.day - {_WD_DAYS - 1} AND s.day
        GROUP BY s.day
    )
    SELECT strftime(f.day, '%Y-%m-%d') AS day,
           f.n_zero,
           f.inv_sum,
           CAST({_WD_ALPHA!r} AS DOUBLE) * {_WD_M} * {_WD_M} / f.inv_sum
               AS estimate,
           x.n_exact,
           CAST(floor(abs(CAST({_WD_ALPHA!r} AS DOUBLE) * {_WD_M} * {_WD_M}
                / f.inv_sum - x.n_exact) * 1000 / x.n_exact) AS BIGINT)
               AS err_permille
    FROM folded f JOIN exact x ON x.day = f.day
    """,
)
def sketch_window_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window distinct sketch over the event stream (VERDICT r5
    directive #2): each day builds its own {_WD_M}-register HLL of active
    users, and the trailing-{_WD_DAYS}-day distinct estimate comes from
    MAX-merging the daily registers across the window — never re-touching
    raw events. This is the streaming/warehouse pattern for "rolling 7-day
    uniques": store m bytes per day, answer any window by register max.

    Exact trailing distinct counts ride along (the `window_active_users`
    replication approach) to certify the per-day error in-band.

    Determinism (same rules as `sketch_hll_merge`): md5 → first byte mod
    {_WD_M} picks the register, rank = 53 − length(bin(rest)) on the next
    52 bits is pure integer arithmetic, and the per-day harmonic fold sums
    exact IEEE powers of two in fixed bucket order — the floating estimate
    hashes bit-for-bit cross-engine.

    Scale shape: the daily register build is one groupBy(day, bucket) max
    — partial-aggregated, ≤ {_WD_M} rows per day through the exchange.
    The window max runs over the days×{_WD_M} grid (thousands of rows for
    years of data); raw events are touched exactly once. At 100 TB the
    grid is negligible and the day sketches are what you'd persist in the
    metrics store.
    """
    ev = load(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    min_day = ev.agg(F.min("day").alias("d0"))
    spine = (
        ev.select("day").distinct()
        .crossJoin(F.broadcast(min_day))
        .select("day", F.datediff("day", "d0").cast("bigint").alias("day_idx"))
    )
    h = F.md5(F.col("user_id").cast("string"))
    mapped = ev.select(
        "day",
        (F.conv(F.substring(h, 1, 2), 16, 10).cast("bigint") % _WD_M).alias(
            "bucket"
        ),
        F.conv(F.substring(h, 3, 13), 16, 10).cast("bigint").alias("rest"),
    ).distinct()
    day_regs = mapped.groupBy("day", "bucket").agg(
        F.max(
            F.when(F.col("rest") == 0, 53).otherwise(
                53 - F.length(F.bin(F.col("rest")))
            )
        ).alias("reg")
    )
    buckets = spark.range(_WD_M).select(
        F.col("id").cast("bigint").alias("bucket")
    )
    grid = (
        spine.crossJoin(F.broadcast(buckets))
        .join(day_regs, ["day", "bucket"], "left")
        .select(
            "day", "day_idx", "bucket",
            F.coalesce(F.col("reg"), F.lit(0)).alias("reg"),
        )
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("day_idx")
        .rangeBetween(-(_WD_DAYS - 1), 0)
    )
    win_regs = grid.select(
        "day", "bucket", F.max("reg").over(w).alias("reg")
    )
    folded = win_regs.groupBy("day").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("bucket", "reg"))),
            F.lit(0.0),
            lambda acc, s: acc
            + F.lit(1.0) / F.pow(F.lit(2.0), s["reg"].cast("double")),
        ).alias("inv_sum"),
        F.sum(F.when(F.col("reg") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_zero"),
    )
    days = spine.select("day")
    exact = (
        days.alias("s")
        .join(
            ev.alias("e"),
            F.col("e.day").between(
                F.date_sub(F.col("s.day"), _WD_DAYS - 1), F.col("s.day")
            ),
        )
        .groupBy(F.col("s.day").alias("day"))
        .agg(F.countDistinct("e.user_id").cast("bigint").alias("n_exact"))
    )
    est = F.lit(_WD_ALPHA) * _WD_M * _WD_M / F.col("inv_sum")
    return (
        folded.join(exact, "day")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_zero",
            "inv_sum",
            est.alias("estimate"),
            "n_exact",
            F.floor(F.abs(est - F.col("n_exact")) * 1000 / F.col("n_exact"))
            .cast("bigint")
            .alias("err_permille"),
        )
    )

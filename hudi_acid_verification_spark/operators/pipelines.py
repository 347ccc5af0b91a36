"""Multi-stage pipeline composites — the shapes a training-data /
product-analytics pipeline chains from the primitive operators.

The reference has no analytics surface (SURVEY.md §2A note); these rows are
north-star extensions exercising how the primitives COMPOSE: sequential
funnel analysis over the event stream, and an end-to-end corpus-cleaning
pass (filter → token-gate → exact-dedup → per-source accounting) over the
documents table. Each stage stays a declarative DataFrame op, so Catalyst
fuses the pipeline into a handful of stages instead of materializing
intermediates.

Cross-engine determinism: timestamps compare as integer microseconds
(ts_ns DIV 1000 ↔ epoch_us, the module-wide convention from
streaming_windows.py); counts/sums are int64.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import load, query


@query(
    "event_funnel",
    oracle="""
    WITH v AS (
        SELECT user_id, min(epoch_us(ts)) AS t_view
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(epoch_us(e.ts)) AS t_click
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t_view
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(epoch_us(e.ts)) AS t_purchase
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t_click
        GROUP BY e.user_id
    )
    SELECT (SELECT count(DISTINCT user_id) FROM events) AS n_users,
           (SELECT count(*) FROM v) AS n_view,
           (SELECT count(*) FROM c) AS n_view_click,
           (SELECT count(*) FROM p) AS n_full_funnel
    """,
)
def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence funnel: users who viewed, then clicked AFTER their
    first view, then purchased AFTER that first qualifying click — the
    classic product-analytics funnel, expressed as three cascaded
    min-timestamp aggregations instead of a per-user sort.

    Each stage is groupBy(user).min(ts) then an equi-join to gate the next
    event type by strict timestamp order — no window over the full event
    stream, no per-user collect. The stage frames shrink monotonically
    (funnel property), and each join broadcasts the smaller stage frame.

    Scale notes: three shuffles on user_id (the natural key), each over an
    already-reduced frame; at 100 TB the first groupBy does the heavy
    partial-agg map-side and everything downstream is per-user-cardinality.
    The single-row stage counts at the end are crossJoins of 1-row aggs —
    no data movement.
    """
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("ts_ns DIV 1000").alias("ts_us")
    )
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t_view"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts_us") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts_us") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t_purchase"))
    )
    return (
        e.agg(F.countDistinct("user_id").alias("n_users"))
        .crossJoin(v.agg(F.count(F.lit(1)).alias("n_view")))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_view_click")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_full_funnel")))
    )


@query(
    "pipeline_corpus_clean",
    oracle="""
    WITH gated AS (
        SELECT doc_id, text, source,
               len(string_split(text, ' ')) AS n_tokens
        FROM documents
        WHERE lang IN ('en', 'de', 'fr')
          AND n_chars BETWEEN 50 AND 400
          AND len(string_split(text, ' ')) >= 20
    ),
    surv AS (
        SELECT * FROM (
            SELECT doc_id, source, n_tokens,
                   row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
            FROM gated
        ) WHERE rn = 1
    )
    SELECT source,
           count(*) AS docs_kept,
           CAST(sum(n_tokens) AS BIGINT) AS tokens_total
    FROM surv GROUP BY source
    """,
)
def pipeline_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus-cleaning pass: language gate → length gate →
    token-count gate → exact dedup (min-doc_id survivor per identical
    text) → per-source accounting. The standard first mile of an LLM data
    pipeline, as ONE declarative plan.

    Catalyst collapses the three gates into a single scan filter (language
    and n_chars reach the parquet scan as pushed predicates; the token
    gate runs in the same stage), so "stage 1..3" never materialize. The
    only shuffles are the dedup window (hash on full text — at 100 TB this
    key becomes md5(text) to bound shuffle width, same survivor) and the
    tiny per-source aggregate.
    """
    gated = (
        load(spark, sf_dir, "documents")
        .filter(
            F.col("lang").isin("en", "de", "fr")
            & F.col("n_chars").between(50, 400)
        )
        .withColumn("n_tokens", F.size(F.split(F.col("text"), " ")))
        .filter(F.col("n_tokens") >= 20)
    )
    w = Window.partitionBy("text").orderBy("doc_id")
    surv = (
        gated.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return surv.groupBy("source").agg(
        F.count(F.lit(1)).alias("docs_kept"),
        F.sum("n_tokens").cast("bigint").alias("tokens_total"),
    )


_N_SHARDS = 16
_SHARD_SALT = "shard-v1"


@query(
    "pipeline_shard_assignment",
    oracle=f"""
    WITH assigned AS (
        SELECT doc_id, source,
               len(string_split(text, ' ')) AS n_tokens,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '{_SHARD_SALT}'),
                     1, 8)) AS BIGINT) % {_N_SHARDS} AS shard_id
        FROM documents
    )
    SELECT shard_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS tokens_total,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           min(doc_id) AS first_doc_id
    FROM assigned
    GROUP BY shard_id
    """,
)
def pipeline_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic output sharding — the last step of a training-data
    pipeline: every doc is assigned to one of N shards by a salted content
    hash, and the per-shard balance audit (doc count, token mass, source
    diversity) verifies the assignment is level before the shards are
    written out as training files.

    Why hash, not round-robin or ntile: a salted md5 assignment is (a)
    reproducible run-to-run and engine-to-engine — re-running the pipeline
    or appending docs never reassigns an existing doc, so downstream
    training-data caches stay valid; (b) embarrassingly parallel — no
    global sort or single-partition window, each task computes its rows'
    shards locally, so at 100 TB this is one narrow map plus one
    O(N_SHARDS)-group aggregation (map-side partial, ~nothing shuffled).
    Changing the salt re-deals the whole corpus — that is the epoch-reshuffle
    lever. In production the same column feeds
    ``df.repartition(N, "shard_id").write.partitionBy("shard_id")``.
    """
    d = load(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(_SHARD_SALT))),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    return (
        d.select(
            (h % _N_SHARDS).alias("shard_id"),
            "doc_id",
            "source",
            F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
        )
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("tokens_total"),
            F.countDistinct("source").alias("n_sources"),
            F.min("doc_id").alias("first_doc_id"),
        )
    )


@query(
    "event_time_to_convert",
    oracle="""
    WITH v AS (
        SELECT user_id, min(epoch_us(ts)) AS t_view
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    p AS (
        SELECT e.user_id, min(epoch_us(e.ts)) AS t_purchase
        FROM events e JOIN v ON v.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= v.t_view
        GROUP BY e.user_id
    ),
    lat AS (
        SELECT p.user_id,
               CAST(p.t_purchase - v.t_view AS BIGINT) AS latency_us
        FROM p JOIN v ON v.user_id = p.user_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_converted,
           CAST(min(latency_us) AS BIGINT) AS min_us,
           quantile_cont(latency_us, 0.5) AS p50_us,
           quantile_cont(latency_us, 0.9) AS p90_us,
           CAST(max(latency_us) AS BIGINT) AS max_us
    FROM lat
    """,
)
def event_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution — the funnel's companion metric: for
    every user whose first purchase follows their first view, the exact
    view→purchase latency, summarized as count / min / exact interpolated
    p50 & p90 / max (microsecond integers; Spark `percentile` and DuckDB
    `quantile_cont` interpolate identically over them).

    Shape: two first-touch aggregations (partial-agg shuffles on user_id —
    no per-user ordering, no window over raw events), a user-level join of
    two already-collapsed sides, then one global summary over O(converted
    users) rows. The exact percentile is affordable precisely BECAUSE the
    distribution is per-user collapsed first; at raw-event grain the same
    metric would need the approx_percentile sketch.
    """
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("ts_ns DIV 1000").alias("t")
    )
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("t").alias("t_view"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("t") >= F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("t").alias("t_purchase"))
    )
    lat = p.join(v, "user_id").select(
        (F.col("t_purchase") - F.col("t_view")).cast("bigint").alias(
            "latency_us"
        )
    )
    return lat.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.min("latency_us").cast("bigint").alias("min_us"),
        F.expr("percentile(latency_us, 0.5D)").alias("p50_us"),
        F.expr("percentile(latency_us, 0.9D)").alias("p90_us"),
        F.max("latency_us").cast("bigint").alias("max_us"),
    )


@query(
    "pipeline_gate_ablation",
    oracle="""
    WITH flags AS (
        SELECT doc_id,
               lang IN ('en', 'de', 'fr') AS g_lang,
               n_chars BETWEEN 50 AND 400 AS g_len,
               len(string_split(text, ' ')) >= 20 AS g_tok
        FROM documents
    ),
    gates(gate) AS (VALUES ('lang'), ('length'), ('tokens'))
    SELECT g.gate,
           CAST(sum(CASE g.gate WHEN 'lang' THEN NOT f.g_lang
                                WHEN 'length' THEN NOT f.g_len
                                ELSE NOT f.g_tok END::INT) AS BIGINT)
               AS n_failing,
           CAST(sum(CASE g.gate
                    WHEN 'lang' THEN (NOT f.g_lang AND f.g_len AND f.g_tok)
                    WHEN 'length' THEN (NOT f.g_len AND f.g_lang AND f.g_tok)
                    ELSE (NOT f.g_tok AND f.g_lang AND f.g_len) END::INT)
               AS BIGINT) AS n_failing_only,
           CAST(sum((f.g_lang AND f.g_len AND f.g_tok)::INT) AS BIGINT)
               AS n_survivors
    FROM flags f CROSS JOIN gates g
    GROUP BY g.gate
    """,
)
def pipeline_gate_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-gate ABLATION — "why did my corpus shrink": for each of the
    cleaning pipeline's gates (the same three `pipeline_corpus_clean`
    applies), how many docs it rejects in total and how many it UNIQUELY
    rejects (would survive every other gate) — the attribution a curation
    team reads before tuning thresholds, because a gate with high overlap
    is free to tighten while a high-unique-rejection gate is the one
    actually shaping the corpus.

    Shape: one scan computes all gate booleans per doc (fused, pushdown
    intact), a 3-row gate table cross-joins (broadcast — replication
    factor = gate count, bounded), and one partial-aggregated rollup per
    gate. At 100 TB: a single corpus pass, O(gates) output — the cheap way
    to answer every "what-if we dropped this filter" without re-running
    the pipeline per ablation.
    """
    d = load(spark, sf_dir, "documents").select(
        F.col("lang").isin("en", "de", "fr").alias("g_lang"),
        F.col("n_chars").between(50, 400).alias("g_len"),
        (F.size(F.split("text", " ")) >= 20).alias("g_tok"),
    )
    all_pass = F.col("g_lang") & F.col("g_len") & F.col("g_tok")
    cell = d.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("lang").alias("gate"),
                    (~F.col("g_lang")).alias("fail"),
                    (~F.col("g_lang") & F.col("g_len") & F.col("g_tok")).alias(
                        "fail_only"
                    ),
                    all_pass.alias("survive"),
                ),
                F.struct(
                    F.lit("length").alias("gate"),
                    (~F.col("g_len")).alias("fail"),
                    (~F.col("g_len") & F.col("g_lang") & F.col("g_tok")).alias(
                        "fail_only"
                    ),
                    all_pass.alias("survive"),
                ),
                F.struct(
                    F.lit("tokens").alias("gate"),
                    (~F.col("g_tok")).alias("fail"),
                    (~F.col("g_tok") & F.col("g_lang") & F.col("g_len")).alias(
                        "fail_only"
                    ),
                    all_pass.alias("survive"),
                ),
            )
        ).alias("c")
    )
    return cell.groupBy(F.col("c.gate").alias("gate")).agg(
        F.sum(F.col("c.fail").cast("int")).cast("bigint").alias("n_failing"),
        F.sum(F.col("c.fail_only").cast("int"))
        .cast("bigint")
        .alias("n_failing_only"),
        F.sum(F.col("c.survive").cast("int"))
        .cast("bigint")
        .alias("n_survivors"),
    )


_SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap


@query(
    "event_sessionize",
    oracle=f"""
    WITH ev AS (
        SELECT user_id, epoch_us(ts) AS t
        FROM events
    ),
    gaps AS (
        SELECT user_id, t,
               CASE WHEN t - lag(t) OVER w > {_SESSION_GAP_US}
                         OR lag(t) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY t)
    ),
    sess AS (
        SELECT user_id, t,
               sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY t
                   ROWS UNBOUNDED PRECEDING
               ) AS session_idx
        FROM gaps
    )
    SELECT user_id,
           CAST(session_idx AS BIGINT) AS session_idx,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(min(t) AS BIGINT) AS start_us,
           CAST(max(t) - min(t) AS BIGINT) AS duration_us
    FROM sess
    GROUP BY user_id, session_idx
    """,
)
def event_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: split each user's event stream into sessions
    at >30-minute inactivity gaps (the standard analytics sessionizer, and
    the batch twin of ``stream_session``'s streaming session windows).

    One window pass per user (lag → gap flag → running sum = session
    index), then a per-(user, session) aggregate — shuffle keyed on
    user_id only, so 100 TB of events sessionize with a single exchange;
    no self-join, no per-user collect. Equal timestamps are order-safe:
    a zero gap can never open a session regardless of tie order. All
    outputs are exact integers (microsecond epochs).
    """
    e = load(spark, sf_dir, "events").select(
        "user_id", F.expr("ts_ns DIV 1000").alias("t")
    )
    w = Window.partitionBy("user_id").orderBy("t")
    gaps = e.withColumn(
        "new_session",
        F.when(
            F.col("t") - F.lag("t").over(w) > _SESSION_GAP_US, 1
        ).when(F.lag("t").over(w).isNull(), 1).otherwise(0),
    )
    sess = gaps.withColumn(
        "session_idx",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return sess.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("t").alias("start_us"),
        (F.max("t") - F.min("t")).alias("duration_us"),
    ).select(
        "user_id",
        F.col("session_idx").cast("bigint").alias("session_idx"),
        "n_events",
        "start_us",
        "duration_us",
    )


@query(
    "event_anomaly_mad",
    oracle="""
    WITH daily AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1
    ),
    med AS (SELECT quantile_cont(n_events, 0.5) AS m FROM daily),
    mad AS (
        SELECT quantile_cont(abs(n_events - (SELECT m FROM med)), 0.5) AS d
        FROM daily
    )
    SELECT day, n_events,
           abs(n_events - (SELECT m FROM med)) AS abs_dev,
           abs(n_events - (SELECT m FROM med))
               > 3 * (SELECT d FROM mad) AS is_anomaly
    FROM daily
    """,
)
def event_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection on daily event volume: flag days whose
    absolute deviation from the median exceeds 3× the median absolute
    deviation — the robust-statistics anomaly gate (mean/stddev break on
    the very outliers being hunted) every ingestion pipeline runs over
    its arrival counts.

    Collapse-then-score: events collapse to one row per day FIRST, the
    two exact medians are computed over that tiny frame and broadcast
    back as scalars — no window over raw events, no second scan. Spark
    ``percentile`` is exact-interpolating like DuckDB ``quantile_cont``
    (parity proven by agg_percentiles); deviations are integer-derived
    doubles, so the comparison is bit-stable cross-engine.
    """
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    med = daily.agg(
        F.expr("percentile(n_events, 0.5)").alias("m")
    )
    with_med = daily.crossJoin(F.broadcast(med)).withColumn(
        "abs_dev", F.abs(F.col("n_events") - F.col("m"))
    )
    mad = with_med.agg(F.expr("percentile(abs_dev, 0.5)").alias("d"))
    return (
        with_med.crossJoin(F.broadcast(mad))
        .select(
            "day",
            "n_events",
            "abs_dev",
            (F.col("abs_dev") > 3 * F.col("d")).alias("is_anomaly"),
        )
    )


@query(
    "pipeline_feature_denorm",
    oracle="""
    WITH denorm AS (
        SELECT cn.n_name AS cust_nation,
               p.p_brand,
               c.c_mktsegment,
               CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                   * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT))
                   AS rev_microunits,
               CASE WHEN sn.n_regionkey = cn.n_regionkey
                    THEN 1 ELSE 0 END AS same_region
        FROM lineitem l
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
        JOIN part p     ON p.p_partkey = l.l_partkey
    )
    SELECT cust_nation, p_brand, c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(rev_microunits) AS BIGINT) AS revenue_microunits,
           CAST(sum(same_region) AS BIGINT) AS n_same_region
    FROM denorm
    GROUP BY 1, 2, 3
    """,
)
def pipeline_feature_denorm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-table denormalization: flatten the full snowflake (lineitem
    → orders → customer → nation, plus supplier → nation and part) into a
    wide training frame, then roll up per (customer nation, part brand,
    market segment) — the 'build the offline feature table' join every ML
    pipeline runs before export, with a derived cross-entity feature
    (supplier-in-same-region flag) only the denormalized row can compute.

    Plan shape: ONE shuffle total. The fact table joins five dimension
    tables that are orders-of-magnitude smaller — Catalyst broadcasts
    every dim (asserted in tests/test_plans.py), so lineitem streams
    through map-side hash joins and shuffles once for the final rollup.
    Revenue accumulates as exact integer micro-units
    (cents × basis-points) — no floating add anywhere.
    """
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    p = load(spark, sf_dir, "part")
    n = load(spark, sf_dir, "nation")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"),
        F.col("n_name").alias("cust_nation"),
        F.col("n_regionkey").alias("cn_region"),
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_regionkey").alias("sn_region"),
    )
    rev = (
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("bigint")
        * (100 - F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("bigint"))
    )
    denorm = (
        # no pinned broadcast on orders: it is ¼ of the fact itself and a
        # forced broadcast of it is the unbounded-broadcast class at
        # 100 TB (optimization r9) — AQE still picks a broadcast at bench
        # scale from runtime sizes, a shuffle join on a cluster
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(
            "cust_nation",
            "p_brand",
            "c_mktsegment",
            rev.alias("rev_microunits"),
            F.when(F.col("sn_region") == F.col("cn_region"), 1)
            .otherwise(0)
            .alias("same_region"),
        )
    )
    return denorm.groupBy("cust_nation", "p_brand", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("rev_microunits").cast("bigint").alias("revenue_microunits"),
        F.sum("same_region").cast("bigint").alias("n_same_region"),
    )


@query(
    "event_markov_transitions",
    oracle="""
    WITH ord AS (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev
        FROM events
    ),
    trans AS (
        SELECT prev AS from_type, event_type AS to_type,
               CAST(count(*) AS BIGINT) AS n
        FROM ord WHERE prev IS NOT NULL GROUP BY 1, 2
    )
    SELECT from_type, to_type, n,
           CAST(n AS DOUBLE)
               / sum(n) OVER (PARTITION BY from_type) AS p
    FROM trans
    """,
)
def event_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams —
    the behavioral-model building block (next-action prediction, funnel
    leak localization, bot detection via improbable transition chains).

    Shape: ONE window pass partitioned by user_id (the same single
    exchange as sessionization) produces (prev → next) pairs; the
    transition counts partial-aggregate to |event_types|² rows, and the
    row-normalizing probability windows over that tiny matrix — raw event
    volume is touched exactly once. Ordering ties break on event_id so
    the lag is deterministic; probabilities are exact-int divisions.
    """
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    ordd = e.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev"),
    )
    trans = (
        ordd.filter(F.col("prev").isNotNull())
        .groupBy(
            F.col("prev").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    w_norm = Window.partitionBy("from_type")
    return trans.select(
        "from_type",
        "to_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(w_norm)).alias("p"),
    )


_SHUFFLE_EPOCHS = 3
_SHUFFLE_SHARDS = 256


@query(
    "pipeline_epoch_shuffle",
    oracle=f"""
    WITH keyed AS (
        SELECT d.doc_id, e.epoch,
               md5(CAST(d.doc_id AS VARCHAR) || ':' ||
                   CAST(e.epoch AS VARCHAR)) AS k
        FROM documents d,
             (SELECT unnest(generate_series(0, {_SHUFFLE_EPOCHS - 1}))
                  AS epoch) e
    )
    SELECT epoch,
           CAST(length(k) - length(k) +
                CAST(('0x' || substr(k, 1, 2)) AS BIGINT) AS BIGINT)
               AS shard,
           doc_id,
           CAST(row_number() OVER (
               PARTITION BY epoch, substr(k, 1, 2)
               ORDER BY k, doc_id
           ) AS BIGINT) AS pos_in_shard
    FROM keyed
    """,
)
def pipeline_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seed-stable epoch-wise data shuffling — the training-loader
    contract that epoch k presents documents in a pseudo-random order
    that is (a) different every epoch, (b) bit-reproducible on any
    cluster size, and (c) shardable so 1000 readers each pull one slice
    with no coordination. Order key = md5(doc_id:epoch); the first hash
    byte is the shard, and position-within-shard is a rank over the
    remaining hash order.

    Scale: NO global sort — the only exchange is the hash partition by
    (epoch, shard), and each shard sorts locally (~N/256 rows). This is
    exactly how petabyte corpora are epoch-shuffled in practice (hash-
    bucketed shards, local order), versus the naive global row_number
    which funnels 100 TB through one range-sort.
    """
    d = load(spark, sf_dir, "documents").select("doc_id")
    epochs = spark.range(_SHUFFLE_EPOCHS).select(
        F.col("id").cast("int").alias("epoch")
    )
    keyed = d.crossJoin(F.broadcast(epochs)).select(
        "doc_id",
        "epoch",
        F.md5(
            F.concat(
                F.col("doc_id").cast("string"),
                F.lit(":"),
                F.col("epoch").cast("string"),
            )
        ).alias("k"),
    )
    w = Window.partitionBy("epoch", F.substring("k", 1, 2)).orderBy(
        "k", "doc_id"
    )
    return keyed.select(
        "epoch",
        F.conv(F.substring("k", 1, 2), 16, 10).cast("bigint").alias("shard"),
        "doc_id",
        F.row_number().over(w).cast("bigint").alias("pos_in_shard"),
    )


_QBS_DECILES = 10
# keep-rate percent by quality decile 1..10 (monotone: keep more of the best)
_QBS_RATES = (10, 10, 20, 20, 40, 40, 60, 60, 80, 100)


@query(
    "pipeline_quality_bucket_sample",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               ntile({_QBS_DECILES}) OVER (
                   ORDER BY len(string_split(text, ' ')), doc_id
               ) AS decile
        FROM documents
    ),
    rated AS (
        SELECT s.*,
               [{", ".join(str(r) for r in _QBS_RATES)}][s.decile]
                   AS keep_pct,
               CAST(('0x' || substr(md5(CAST(s.doc_id AS VARCHAR) || '#' ||
                    CAST(s.decile AS VARCHAR)), 1, 2)) AS BIGINT) AS hb
        FROM scored s
    )
    SELECT decile,
           CAST(max(keep_pct) AS BIGINT) AS keep_pct,
           CAST(count(*) AS BIGINT) AS n_in,
           CAST(sum(CASE WHEN hb * 100 < keep_pct * 256 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept
    FROM rated
    GROUP BY decile
    """,
)
def pipeline_quality_bucket_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-stratified downsampling — the curation move that keeps
    100% of the best decile and 10% of the worst instead of a flat
    random cut: documents rank into deciles by a quality proxy (token
    count, deterministic (score, doc_id) tie-break), each decile gets a
    target keep-rate, and the keep decision is a SEEDED COIN — the first
    md5 byte of (doc_id, decile) compared against the rate — so the
    sample is bit-reproducible across reruns and cluster sizes (no rand()
    anywhere, the property a training pipeline needs for resumable runs).

    Scale: ntile over a global order is the one non-scalable piece at
    100 TB — there it becomes quantile-bucket assignment from the
    histogram sketch (sketch_histogram_quantile) instead of a full rank;
    the decile CONTRACT (monotone rates, seeded coin) is unchanged. The
    decision itself is embarrassingly parallel: hash-compare per row,
    rollup partial-aggregates to 10 rows.
    """
    d = load(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
    ).withColumn(
        "decile",
        F.ntile(_QBS_DECILES).over(Window.orderBy("n_tokens", "doc_id")),
    )
    rates = F.array(*[F.lit(r) for r in _QBS_RATES])
    rated = scored.select(
        "decile",
        F.element_at(rates, F.col("decile")).alias("keep_pct"),
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit("#"),
                        F.col("decile").cast("string"),
                    )
                ),
                1,
                2,
            ),
            16,
            10,
        ).cast("bigint").alias("hb"),
    )
    return rated.groupBy("decile").agg(
        F.max("keep_pct").cast("bigint").alias("keep_pct"),
        F.count(F.lit(1)).cast("bigint").alias("n_in"),
        F.sum(
            F.when(F.col("hb") * 100 < F.col("keep_pct") * 256, 1).otherwise(0)
        ).cast("bigint").alias("n_kept"),
    )


# SFT loss-masking policy: the leading ceil(25%) of each document's tokens
# play the prompt role (masked out of the loss); the rest are response
# tokens the trainer supervises on.
_SFT_PROMPT_NUM = 1
_SFT_PROMPT_DEN = 4


@query(
    "pipeline_sft_masking",
    oracle=f"""
    WITH per_doc AS (
        SELECT lang, source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST((len(string_split(text, ' ')) * {_SFT_PROMPT_NUM}
                     + {_SFT_PROMPT_DEN} - 1) // {_SFT_PROMPT_DEN}
                    AS BIGINT) AS prompt_tokens
        FROM documents
    )
    SELECT lang, source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(prompt_tokens) AS BIGINT) AS masked_tokens,
           CAST(sum(n_tokens - prompt_tokens) AS BIGINT) AS loss_tokens,
           CAST((sum(n_tokens - prompt_tokens) * 10000) // sum(n_tokens)
                AS BIGINT) AS loss_frac_x10k
    FROM per_doc
    GROUP BY lang, source
    """,
)
def pipeline_sft_masking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SFT loss-mask accounting — the instruction-tuning data-prep step:
    each document's leading ceil(N/{_SFT_PROMPT_DEN}) tokens are PROMPT
    (excluded from the loss), the remainder is RESPONSE (supervised), and
    the pipeline reports, per (lang, source) cohort, the token budget the
    trainer will actually learn from: total vs masked vs loss-bearing
    tokens and the loss fraction in ×10⁴ integer arithmetic. A real chat
    template would find the prompt/response boundary with a role marker;
    the fixed-ratio policy exercises the identical plan with an
    engine-exact boundary (ceil via integer (n·a+b−1) DIV b).

    Scale shape: the per-doc token count and mask split are narrow
    codegen'd projections inside the scan (no explode — counting needs
    sizes, not token rows), and the cohort rollup is one partial-agg
    shuffle on (lang, source). The division happens AFTER the sums, on
    the collapsed frame. At 100 TB this is a single map+reduce over the
    corpus — the cheapest possible shape for a token-budget audit.
    """
    d = load(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.col("text"), " ")).cast("bigint")
    per_doc = d.select(
        "lang",
        "source",
        n_tokens.alias("n_tokens"),
        F.expr(
            f"CAST((size(split(text, ' ')) * {_SFT_PROMPT_NUM}"
            f" + {_SFT_PROMPT_DEN} - 1) DIV {_SFT_PROMPT_DEN} AS BIGINT)"
        ).alias("prompt_tokens"),
    )
    return (
        per_doc.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.sum("prompt_tokens").cast("bigint").alias("masked_tokens"),
            F.sum(F.col("n_tokens") - F.col("prompt_tokens"))
            .cast("bigint")
            .alias("loss_tokens"),
        )
        .withColumn(
            "loss_frac_x10k",
            F.expr("(loss_tokens * 10000) DIV total_tokens"),
        )
    )


_OOV_VOCAB_SIZE = 100  # top-V corpus tokens form the in-vocab set


@query(
    "pipeline_tokenizer_oov_rate",
    oracle=f"""
    WITH toks AS (
        SELECT source, unnest(string_split(text, ' ')) AS tok
        FROM documents
    ),
    freq AS (
        SELECT tok, count(*) AS n FROM toks GROUP BY tok
    ),
    vocab AS (
        SELECT tok FROM (
            SELECT tok, row_number() OVER (ORDER BY n DESC, tok) AS rnk
            FROM freq
        ) WHERE rnk <= {_OOV_VOCAB_SIZE}
    )
    SELECT t.source,
           CAST(count(*) AS BIGINT) AS total_tokens,
           CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS oov_tokens,
           CAST((sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) * 10000)
                // count(*) AS BIGINT) AS oov_x10k
    FROM toks t LEFT JOIN vocab v ON v.tok = t.tok
    GROUP BY t.source
    """,
)
def pipeline_tokenizer_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary audit: the fraction of corpus tokens a
    top-{_OOV_VOCAB_SIZE} frequency vocabulary fails to cover, per
    source — the coverage half of the tokenizer-rollout diagnostic
    (pipeline_tokenizer_fertility is the compression half): a source
    with a hot OOV rate is the one whose text will fragment into
    byte-fallback garbage under the deployed vocab.

    Scale shape: token frequencies are one partial-agg shuffle over the
    exploded token stream; the top-V cut is a window over the COLLAPSED
    frequency frame (|distinct tokens| rows, not |tokens|); membership is
    a BROADCAST left join of the token stream against the V-row vocab
    (Spark auto-broadcasts it — no shuffle of the stream); the per-source
    rollup is the only other exchange. ×10⁴ integer DIV on the collapsed
    sums keeps every column hash-exact. At 100 TB the vocab side is
    O(V) regardless of corpus size — the canonical broadcast-dimension
    shape.
    """
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    # top-V via TakeOrderedAndProject (per-partition partial top-V, driver
    # merge of V-row heaps) — never a single-partition global window
    vocab = (
        freq.orderBy(F.col("n").desc(), "tok")
        .limit(_OOV_VOCAB_SIZE)
        .select("tok", F.lit(1).alias("in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("total_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("oov_tokens"),
        )
        .withColumn(
            "oov_x10k", F.expr("(oov_tokens * 10000) DIV total_tokens")
        )
    )

"""Scan / projection / filter operators (SURVEY.md §2B: scan_project,
filter_pred, in_list_delete_semantics).

Lineage: reference snapshot scan (reader/ReaderThread.java:77-82), DELETE
IN-list (writer/TransactionWriter.java:168-178 — implemented with the
*intended* anti-join semantics, not defect D2).

Scale notes: all three are scan-shaped — Catalyst pushes the predicates and
the projection into the parquet reader (verify with .explain: PushedFilters /
ReadSchema), so at 100 TB they read only the referenced columns and row
groups that survive min/max pruning. The anti-join broadcasts the key side
when small; at scale the key side is a shuffle-free broadcast if < 10 MB,
else AQE picks sort-merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import load, query


@query(
    "scan_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice,
           strftime(l_shipdate, '%Y-%m-%d') AS l_shipdate
    FROM lineitem
    """,
)
def scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-pruned scan: only the projected columns reach the reader.

    The date is emitted as a formatted string — the one timestamp rendering
    proven green through the driver's hash (round-1 lesson: tz-aware vs
    naive pandas timestamps are an unproven rendering pair; strings are
    deterministic in both engines). Pruning is unaffected: ReadSchema still
    carries exactly the four referenced columns (test_plans.py).
    """
    return load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("l_shipdate"),
    )


@query(
    "filter_pred",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE o_orderstatus IN ('O', 'F')
      AND o_totalprice > 150000.0
      AND o_orderdate >= TIMESTAMP '1995-01-01'
    """,
)
def filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound predicate (range + IN-list + date bound), fully pushed down."""
    df = load(spark, sf_dir, "orders")
    return df.filter(
        F.col("o_orderstatus").isin("O", "F")
        & (F.col("o_totalprice") > 150000.0)
        & (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")


@query(
    "in_list_delete_semantics",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE l_orderkey NOT IN (
        SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
    )
    """,
)
def in_list_delete_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETE ... WHERE pk IN (...) as its relational core: a left-anti join.

    Reference intent: TransactionWriter.java:168-178 (defect D2 fixed — the
    reference's undelimited IN-list never matched anything). At scale the
    delete-key set is small relative to the table, so Spark broadcasts it and
    the anti-join is shuffle-free.
    """
    lineitem = load(spark, sf_dir, "lineitem")
    keys = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        F.col("o_orderkey").alias("l_orderkey")
    )
    return lineitem.join(F.broadcast(keys), "l_orderkey", "left_anti").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


_SAMPLE_PER_STRATUM = 25


@query(
    "sample_stratified_hash",
    oracle=f"""
    SELECT c_mktsegment, c_custkey, c_name FROM (
        SELECT c_mktsegment, c_custkey, c_name,
               row_number() OVER (
                   PARTITION BY c_mktsegment
                   ORDER BY md5(CAST(c_custkey AS VARCHAR)), c_custkey
               ) AS rn
        FROM customer
    ) WHERE rn <= {_SAMPLE_PER_STRATUM}
    """,
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: exactly N rows per stratum
    (market segment), chosen by ordering each stratum on the MD5 of its
    key — a content-derived pseudo-random order that is reproducible
    across engines, runs, and partitionings, unlike rand()-based
    TABLESAMPLE. This is how a 100 TB pipeline takes auditable dev
    subsamples: the same sample falls out on every run, and adding rows
    to OTHER strata never perturbs a stratum's sample.

    Scale notes: one shuffle on the stratum key; the per-stratum top-N by
    hash order needs only a bounded heap per partition (rank + filter —
    Spark's WindowGroupLimit pushes the limit into the sort at scale).
    """
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.md5(F.col("c_custkey").cast("string")), "c_custkey"
    )
    return (
        load(spark, sf_dir, "customer")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _SAMPLE_PER_STRATUM)
        .select("c_mktsegment", "c_custkey", "c_name")
    )


_SQL_TEXT = """
    WITH r AS (
        SELECT o.o_orderpriority,
               CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderstatus <> 'F'
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(cents) AS BIGINT) AS revenue_cents,
           CAST(rank() OVER (ORDER BY sum(cents) DESC) AS BIGINT)
               AS revenue_rank
    FROM r
    GROUP BY o_orderpriority
"""


@query("sql_text_analytics", oracle=_SQL_TEXT)
def sql_text_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-TEXT front door: register the fixture tables as views and
    run ONE shared ANSI statement (CTE + join + aggregate + window-over-
    aggregate) through ``spark.sql`` — the literal same text the DuckDB
    oracle executes, so parity holds by construction, not by translation.
    Proves a reference user can drive this engine with plain SQL strings:
    every DataFrame operator in this registry has a SQL spelling, and
    Catalyst plans text exactly as it plans the DataFrame API (same
    broadcast, same partial aggregation, same pushdown — the plan audit
    pins it).
    """
    from hudi_acid_verification_spark.catalog import register_fixtures

    register_fixtures(spark, sf_dir)
    return spark.sql(_SQL_TEXT)


@query(
    "audit_table_fingerprint",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_rows,
           bit_xor(CAST(('0x' || substr(md5(
               CAST(l_orderkey AS VARCHAR) || '|' ||
               CAST(l_linenumber AS VARCHAR) || '|' ||
               CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                    AS VARCHAR)), 1, 15)) AS BIGINT)) AS xor_fingerprint
    FROM lineitem
    GROUP BY 1
    """,
)
def audit_table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent table fingerprint — the data-integrity primitive
    behind cross-replica / cross-engine reconciliation (and the content
    check a migration like THIS repo runs against its reference): each
    row hashes to a 60-bit value (md5 over a canonical key||value
    rendering) and the group fingerprint is the XOR-fold — commutative
    and associative, so ANY partitioning, row order, or engine produces
    the identical digest, and a single changed/missing/duplicated row
    flips it. Paired with the row count, this detects every non-colliding
    difference in one cheap pass.

    Shape: narrow per-row hash (fused into the scan) + one partial-
    aggregated bit_xor per group — the cheapest possible full-table audit
    at 100 TB (one IO-bound pass, O(groups) shuffle rows). This is how
    you verify a lake copy without sorting or joining anything.
    """
    li = load(spark, sf_dir, "lineitem")
    row_hash = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("l_orderkey").cast("string"),
                    F.col("l_linenumber").cast("string"),
                    F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
                    .cast("bigint")
                    .cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    return (
        li.select("l_returnflag", row_hash.alias("h"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.bit_xor("h").alias("xor_fingerprint"),
        )
    )


_WS_K = 200  # target sample size


@query(
    "sample_weighted_systematic",
    oracle=f"""
    WITH items AS (
        SELECT o_orderkey, o_orderpriority,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS w,
               md5(CAST(o_orderkey AS VARCHAR)) AS h
        FROM orders
    ),
    tot AS (SELECT CAST(sum(w) AS BIGINT) AS total FROM items),
    walked AS (
        SELECT o_orderpriority, w,
               CAST(sum(w) OVER (ORDER BY h, o_orderkey
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        FROM items
    ),
    flagged AS (
        SELECT o_orderpriority, w,
               (cum // (t.total // {_WS_K}))
                   > ((cum - w) // (t.total // {_WS_K})) AS selected
        FROM walked, tot t
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CASE WHEN selected THEN 1 ELSE 0 END) AS BIGINT)
               AS n_selected,
           CAST(sum(w) AS BIGINT) AS weight_cents,
           CAST(sum(CASE WHEN selected THEN w ELSE 0 END) AS BIGINT)
               AS selected_weight_cents,
           CAST(sum(w) * 10000 // (SELECT total FROM tot) AS BIGINT)
               AS weight_share_x10k
    FROM flagged GROUP BY o_orderpriority
    """,
)
def sample_weighted_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic WEIGHTED systematic sampling (~{_WS_K} of the order
    book, inclusion probability ∝ o_totalprice): walk the items in a
    hash-shuffled order, accumulate weight, and select every item whose
    cumulative weight crosses a multiple of total/{_WS_K} — the classic
    PPS systematic design. Fully deterministic (the "random" walk order
    is md5(o_orderkey)), so the exact selected set hash-matches the
    oracle; the per-priority audit shows selected weight tracking the
    stratum's weight share, which is the property PPS buys.

    Why not A-ES exponential keys: u^(1/w) needs pow(), whose last bits
    differ across engines' libm. The cumulative-crossing formulation is
    pure integer arithmetic end to end.

    Shape — the exact prefix sum is TWO-PHASE, never a single-partition
    window over the data: items pre-partition into 16 hash buckets (first
    md5 hex digit, which is also the walk order's leading digit), each
    bucket cumsums locally in parallel, and a 16-row broadcast of bucket
    totals supplies the global offsets. At 100 TB that is the textbook
    distributed prefix-sum; the oracle spells the same walk as one window
    because DuckDB is single-node anyway.
    """
    items = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("w"),
        F.md5(F.col("o_orderkey").cast("string")).alias("h"),
    ).withColumn(
        "bucket", F.conv(F.substring("h", 1, 1), 16, 10).cast("int")
    )
    bucket_tot = items.groupBy("bucket").agg(
        F.sum("w").cast("bigint").alias("bw")
    )
    w_b = Window.partitionBy(F.lit(0)).orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = bucket_tot.select(
        "bucket",
        F.coalesce(F.sum("bw").over(w_b), F.lit(0))
        .cast("bigint")
        .alias("offset"),
    )
    total = items.agg(F.sum("w").cast("bigint").alias("total"))
    w_local = Window.partitionBy("bucket").orderBy("h", "o_orderkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    walked = (
        items.join(F.broadcast(offsets), "bucket")
        .withColumn(
            "cum",
            (F.col("offset") + F.sum("w").over(w_local)).cast("bigint"),
        )
        .crossJoin(F.broadcast(total))
    )
    flagged = walked.select(
        "o_orderpriority",
        "w",
        "total",
        (
            F.expr(f"cum DIV (total DIV {_WS_K})")
            > F.expr(f"(cum - w) DIV (total DIV {_WS_K})")
        ).alias("selected"),
    )
    return flagged.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.sum(F.when(F.col("selected"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_selected"),
        F.sum("w").cast("bigint").alias("weight_cents"),
        F.sum(F.when(F.col("selected"), F.col("w")).otherwise(0))
        .cast("bigint")
        .alias("selected_weight_cents"),
        F.expr("CAST(sum(w) * 10000 DIV min(total) AS BIGINT)").alias(
            "weight_share_x10k"
        ),
    )


_WR_K = 100      # reservoir size
_WR_W_CAP = 8    # weight cap (bounds the per-row key array)


@query(
    "sample_weighted_reservoir",
    oracle=f"""
    WITH items AS (
        SELECT o_orderkey, o_orderpriority,
               least({_WR_W_CAP}, 1 + CAST(floor(o_totalprice / 50000)
                     AS BIGINT)) AS w
        FROM orders
    ),
    keyed AS (
        SELECT o_orderkey, o_orderpriority, w,
               list_min(list_transform(
                   generate_series(1, w),
                   c -> CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)
                        || ':' || CAST(c AS VARCHAR)), 1, 12)) AS BIGINT)
               )) AS hmin
        FROM items
    )
    SELECT o_orderkey, o_orderpriority, CAST(w AS BIGINT) AS w, hmin
    FROM keyed
    ORDER BY hmin, o_orderkey
    LIMIT {_WR_K}
    """,
)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted RESERVOIR sample (without replacement,
    inclusion probability increasing in weight) — the one-pass streaming
    companion of `sample_weighted_systematic`: a reservoir needs no total
    weight up front, so it runs over an unbounded stream or an unknown-size
    scan, where the systematic walk needs sum(w) first.

    Scheme: each item gets the MIN of w independent 48-bit hash keys
    (md5(id:c) for copy c = 1..w) and the sample is the global bottom-k by
    that key — min-of-w-uniforms is Beta(1, w), so heavier items hold
    stochastically smaller keys and win reservoir slots more often; ties
    are impossible in practice at 48 bits and the id tiebreak makes the
    selected SET fully deterministic either way. This is the integer-exact
    stand-in for Efraimidis–Spirakis u^(1/w) keys, whose pow()/ln() last
    bits differ across engines' libm and can never hash (the same reason
    the systematic variant walks integers).

    Shape — no explode, no pre-shuffle: the w keys materialize IN-ROW
    (transform over sequence(1, w), w capped at {_WR_W_CAP}) so the scan
    stays narrow, and the bottom-k is a sort-limit — Spark plans
    TakeOrdered: each partition keeps its local k (O(n log k) with early
    pruning), one k-row exchange to the driver-side merge. At 100 TB the
    only data movement is #partitions * k rows of (key, id). Weight here
    is the order's price tier (1..{_WR_W_CAP}); any bounded integer weight
    slots in unchanged.
    """
    items = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.least(
            F.lit(_WR_W_CAP),
            1 + F.floor(F.col("o_totalprice") / 50000).cast("bigint"),
        ).alias("w"),
    )
    kcol = F.array_min(
        F.transform(
            F.sequence(F.lit(1).cast("bigint"), F.col("w")),
            lambda c: F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("o_orderkey").cast("string"),
                            F.lit(":"),
                            c.cast("string"),
                        )
                    ),
                    1,
                    12,
                ),
                16,
                10,
            ).cast("bigint"),
        )
    )
    return (
        items.select(
            "o_orderkey", "o_orderpriority", "w", kcol.alias("hmin")
        )
        .orderBy("hmin", "o_orderkey")
        .limit(_WR_K)
    )

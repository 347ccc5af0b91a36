"""Join operators (SURVEY.md §2B: join_inner_equi, join_left, join_semi,
join_anti, merge_upsert).

Lineage: the reference's only join is the equi-join inside MERGE INTO
(writer/TransactionWriter.java:154-159); semi/anti are the relational core of
its presence/absence verification (resultexpectations/ExpectRecordPresence.java,
ExpectRecordAbsence.java).

Scale notes: dimension tables (region/nation/supplier) are broadcast —
shuffle-free map-side hash joins at any fact-table size. Fact-fact joins
(orders ⋈ customer) shuffle on the join key; AQE handles skew splitting.
The MERGE rewrite is a full-outer join on the primary key: at 100 TB this is
the one join that must shuffle both sides, so partition/bucket both tables by
the key to make it co-located (AcidTable stores data hash-distributed by pk
for exactly this reason).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load, query


@query(
    "join_inner_equi",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name, r.r_name, c.c_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE c.c_acctbal > 0.0
    """,
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema inner joins; both dims broadcast (shuffle-free)."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0.0)
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "inner")
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "inner")
        .select("c_custkey", "c_name", "n_name", "r_name", "c_acctbal")
    )


@query(
    "join_left",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
    FROM orders o
    LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving all orders."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "left").select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000.0
    )
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as left-semi join (reference presence check, ExpectRecordPresence)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as left-anti join (reference absence check, ExpectRecordAbsence)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "merge_upsert",
    oracle="""
    WITH source AS (
        SELECT c_custkey AS s_custkey,
               c_acctbal + 1000.0 AS s_acctbal
        FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION ALL
        SELECT c_custkey + 10000000 AS s_custkey,
               0.0 AS s_acctbal
        FROM customer WHERE c_mktsegment = 'MACHINERY'
    )
    SELECT
        COALESCE(t.c_custkey, s.s_custkey) AS c_custkey,
        COALESCE(s.s_acctbal, t.c_acctbal) AS c_acctbal,
        CASE WHEN t.c_custkey IS NULL THEN 'inserted'
             WHEN s.s_custkey IS NULL THEN 'unchanged'
             ELSE 'updated' END AS merge_action
    FROM customer t
    FULL OUTER JOIN source s ON t.c_custkey = s.s_custkey
    """,
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO rewrite: full-outer join + COALESCE (SURVEY §2A #11).

    Mirrors writer/TransactionWriter.java:154-159 semantics — WHEN MATCHED
    updates the payload, WHEN NOT MATCHED inserts — without a lakehouse jar.
    The source here is derived deterministically from the customer fixture:
    BUILDING customers get an updated balance, synthetic new keys are inserts.
    AcidTable.merge() (acid/table.py) wraps this same plan for the ACID path.
    """
    t = load(spark, sf_dir, "customer")
    building = t.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("s_custkey"),
        (F.col("c_acctbal") + F.lit(1000.0)).alias("s_acctbal"),
    )
    inserts = t.filter(F.col("c_mktsegment") == "MACHINERY").select(
        (F.col("c_custkey") + F.lit(10000000)).alias("s_custkey"),
        F.lit(0.0).alias("s_acctbal"),
    )
    s = building.unionByName(inserts)
    return (
        t.join(s, t.c_custkey == s.s_custkey, "full_outer")
        .select(
            F.coalesce(t.c_custkey, s.s_custkey).alias("c_custkey"),
            F.coalesce(s.s_acctbal, t.c_acctbal).alias("c_acctbal"),
            F.when(t.c_custkey.isNull(), F.lit("inserted"))
            .when(s.s_custkey.isNull(), F.lit("unchanged"))
            .otherwise(F.lit("updated"))
            .alias("merge_action"),
        )
    )


_SKEW_SALT = 8


@query(
    "join_skew_salted",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))
               * CAST(1.0 - l.l_discount AS DECIMAL(18,4))), 4) AS DOUBLE)
               AS revenue,
           count(*) AS n_lines
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated equi-join: the fact side carries a deterministic salt
    (l_linenumber mod 8) and the build side is replicated once per salt, so
    a hot join key's rows spread across 8 shuffle partitions instead of one
    straggler — the manual form of AQE's skew-join split, usable when the
    skew is known ahead of time (or AQE is off). Salting changes WHERE rows
    meet, never WHICH rows meet: the result equals the plain join (the
    oracle) because every (key, salt) fact row finds exactly its one
    replicated build row.

    Scale notes: cost = 8× replication of the small build side vs. an
    unbounded straggler on the hot key; pick the salt width from the skew
    ratio. The deterministic salt (a column function, not rand()) keeps
    the operator replayable and oracle-checkable.
    """
    li = load(spark, sf_dir, "lineitem").withColumn(
        "salt", F.pmod(F.col("l_linenumber"), F.lit(_SKEW_SALT))
    )
    salts = spark.range(_SKEW_SALT).select(
        F.col("id").cast("int").alias("salt")
    )
    o_rep = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    ).crossJoin(F.broadcast(salts))
    return (
        li.join(o_rep, (li.l_orderkey == o_rep.o_orderkey) & (li.salt == o_rep.salt))
        .groupBy("o_orderpriority")
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,4)")
                    * (F.lit(1.0) - F.col("l_discount")).cast("decimal(18,4)")
                ),
                4,
            ).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "join_null_safe",
    oracle="""
    WITH c AS (
        SELECT CASE WHEN c_custkey % 10 = 0 THEN NULL
                    ELSE c_nationkey END AS nk,
               count(*) AS cust_cnt
        FROM customer GROUP BY 1
    ),
    s AS (
        SELECT CASE WHEN s_suppkey % 7 = 0 THEN NULL
                    ELSE s_nationkey END AS nk,
               count(*) AS supp_cnt
        FROM supplier GROUP BY 1
    )
    SELECT c.nk AS nk, c.cust_cnt AS cust_cnt, s.supp_cnt AS supp_cnt
    FROM c JOIN s ON c.nk IS NOT DISTINCT FROM s.nk
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): NULL keys match
    each other instead of vanishing — the semantics MERGE-style pipelines
    need when the join key is legitimately nullable (here: an anonymized
    nation key, NULLed for every 10th customer / 7th supplier).

    Both sides pre-aggregate to per-key counts BEFORE the join: null-safe
    joining raw rows would cross-product the NULL groups (the classic
    blow-up); reducing each side first keeps the NULL bucket at one row per
    side. Spark plans `<=>` as a normal hash join key (EqualNullSafe), so
    broadcast/shuffle strategies all still apply — it does NOT degrade to a
    nested-loop join.

    Scale notes: two partial-agg shuffles on the nullable key, then a
    broadcast join of tiny per-key frames. The NULL bucket is the skew key
    by construction; aggregating first is the mitigation.
    """
    cust = (
        load(spark, sf_dir, "customer")
        .groupBy(
            F.when(F.col("c_custkey") % 10 == 0, F.lit(None))
            .otherwise(F.col("c_nationkey"))
            .alias("nk")
        )
        .agg(F.count(F.lit(1)).alias("cust_cnt"))
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .groupBy(
            F.when(F.col("s_suppkey") % 7 == 0, F.lit(None))
            .otherwise(F.col("s_nationkey"))
            .alias("nk")
        )
        .agg(F.count(F.lit(1)).alias("supp_cnt"))
    )
    return cust.join(supp, cust["nk"].eqNullSafe(supp["nk"])).select(
        cust["nk"].alias("nk"), "cust_cnt", "supp_cnt"
    )


_RF_BITS = 65536  # runtime-filter bloom width (bits)
_RF_WORDS = 2048  # packed into 32-bit words: dense array length
_RF_K = 3


@query(
    "join_bloom_prefilter",
    oracle="""
    SELECT l.l_returnflag,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY 1
    """,
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filter (semi-join reduction) join: urgent-order revenue by
    return flag, with the fact side pre-filtered by a Bloom filter built
    from the build side's join keys BEFORE the join shuffle.

    The oracle is the plain join — the bloom is semantically transparent
    (no false negatives, and the exact join discards its false positives),
    which is the whole point: it is a pure physical optimization. At 100 TB
    the build side is too big to broadcast as rows but its key set packs
    into a fixed 64 Kbit filter that DOES broadcast, so ~80% of the fact
    never enters the exchange. This makes explicit what Spark's own
    InjectRuntimeFilter / `bloom_filter_agg`+`might_contain` rewrite does
    when `spark.sql.optimizer.runtime.bloomFilter.enabled` is on — built
    portably here so the plan audit can pin the shape.

    Build: keys → K md5 slot bits → groupBy(word)+bit_or (the exchange
    carries ≤ 2048 words regardless of build size) → densified into ONE
    array row (range outer-join fills absent words with 0, array_sort by
    word) → crossJoin(broadcast). Probe: K element_at bit tests per fact
    row — whole-stage-codegen expressions, no explode, no extra shuffle.
    """
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )

    def slot(j: int, key) -> F.Column:
        # xxhash64, not md5: the bloom never crosses the engine boundary
        # (the oracle is the plain join), so the hash only needs to be
        # deterministic and cheap — xxhash64 is a single codegen'd JVM
        # expression vs md5's digest+hex+substring+conv chain (~5x probe
        # cost on the fact side).
        return F.pmod(F.xxhash64(F.lit(j), key), F.lit(_RF_BITS))

    # --- build: key bits -> packed words -> one dense broadcastable array
    bits = orders.select(
        F.explode(
            F.array(*[slot(j, F.col("o_orderkey")) for j in range(_RF_K)])
        ).alias("bit")
    )
    words = bits.select(
        F.expr(f"bit DIV 32").alias("word"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit % 32 AS INT))").alias("mask"),
    ).groupBy("word").agg(F.bit_or("mask").alias("bits"))
    dense = (
        spark.range(_RF_WORDS)
        .select(F.col("id").cast("bigint").alias("word"))
        .join(words, "word", "left")
        .select("word", F.coalesce("bits", F.lit(0)).alias("bits"))
        .agg(
            F.array_sort(F.collect_list(F.struct("word", "bits"))).alias("wb")
        )
        .select(F.transform("wb", lambda x: x["bits"]).alias("bloom"))
    )

    # --- probe: map-side bit tests, fact rows that can't match never shuffle
    probed = li.crossJoin(F.broadcast(dense))
    for j in range(_RF_K):
        probed = probed.withColumn(f"__b{j}", slot(j, F.col("l_orderkey")))
    cond = None
    for j in range(_RF_K):
        test = F.expr(
            f"(element_at(bloom, CAST(__b{j} DIV 32 AS INT) + 1) & "
            f"shiftleft(CAST(1 AS BIGINT), CAST(__b{j} % 32 AS INT))) != 0"
        )
        cond = test if cond is None else (cond & test)
    passed = probed.filter(cond).drop(
        "bloom", *[f"__b{j}" for j in range(_RF_K)]
    )

    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("bigint")
    return (
        passed.join(orders.select("o_orderkey"), passed["l_orderkey"] == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(cents).cast("bigint").alias("revenue_cents"),
        )
    )


@query(
    "join_lateral_topn",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey, t.price_cents
    FROM customer c, LATERAL (
        SELECT o.o_orderkey,
               CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)
                   AS price_cents
        FROM orders o
        WHERE o.o_custkey = c.c_custkey
        ORDER BY o.o_totalprice DESC, o.o_orderkey
        LIMIT 3
    ) t
    WHERE c.c_custkey % 50 = 0
    """,
)
def join_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery — per-customer top-3 orders by price,
    written the way an analyst writes it (a dependent subquery with ORDER
    BY ... LIMIT) rather than the way an engine wants it (window + rank).
    Both engines run the IDENTICAL SQL text: Spark's DecorrelateInnerQuery
    rewrites the per-row LIMIT into a partitioned row_number filter, so
    what executes is the window plan — no nested-loop re-execution of the
    inner query per outer row, which is the difference between O(n·m) and
    one shuffle at 100 TB. Ties are broken by o_orderkey, making the top-3
    total-ordered and the result hash-stable.
    """
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey, t.price_cents
        FROM customer c JOIN LATERAL (
            SELECT o.o_orderkey,
                   CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)
                       AS price_cents
            FROM orders o
            WHERE o.o_custkey = c.c_custkey
            ORDER BY o.o_totalprice DESC, o.o_orderkey
            LIMIT 3
        ) t
        WHERE c.c_custkey % 50 = 0
        """
    )


@query(
    "join_strategy_hints",
    oracle="""
    SELECT n.n_name,
           CAST(count(*) AS BIGINT) AS n_suppliers,
           CAST(sum(CAST(floor(s.s_acctbal * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS acctbal_cents
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY n.n_name
    """,
)
def join_strategy_hints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Physical join-strategy steering via hints — the knob you reach for
    when AQE's estimates are wrong at 100 TB: the same logical
    supplier-x-nation join executed with an explicit BROADCAST hint on the
    25-row dimension (the plan Catalyst should pick anyway) UNIONed with a
    SHUFFLE_HASH-hinted copy over a disjoint key split, so the one result
    exercises both physical strategies and proves strategy choice never
    changes the answer.

    Scale judgment: broadcasting the nation dimension eliminates the
    fact-side exchange entirely; SHUFFLE_HASH beats sort-merge when one
    side is modest and sorted output is not needed (skips both sorts).
    Hints are per-subtree here — exactly how a production pipeline pins a
    strategy for one pathological join without disabling AQE globally.
    """
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    cents = F.floor(F.col("s_acctbal") * 100 + F.lit(0.5)).cast("bigint")
    lo = (
        s.filter(F.col("s_nationkey") < 12)
        .join(n.hint("broadcast"), s.s_nationkey == n.n_nationkey)
        .select("n_name", cents.alias("cents"))
    )
    hi = (
        s.filter(F.col("s_nationkey") >= 12)
        .join(n.hint("shuffle_hash"), s.s_nationkey == n.n_nationkey)
        .select("n_name", cents.alias("cents"))
    )
    return (
        lo.unionAll(hi)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
            F.sum("cents").cast("bigint").alias("acctbal_cents"),
        )
    )

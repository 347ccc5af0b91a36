"""Pivot / unpivot operators (common OLAP patterns over ``events``).

Spark's .pivot() with explicit values compiles to one hash aggregate with
conditional branches — same plan as the CASE formulation the oracle uses, so
both engines agree exactly. Explicit pivot values matter at scale: without
them Spark runs an extra distinct-values job AND the output schema becomes
data-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load, query

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "pivot_wide",
    oracle="""
    SELECT strftime(make_timestamp((epoch_us(ts) // 86400000000) * 86400000000),
                    '%Y-%m-%d') AS day,
           """
    + ",\n           ".join(
        f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS {t}"
        for t in _EVENT_TYPES
    )
    + """
    FROM events
    GROUP BY 1
    """,
)
def pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event counts pivoted to one column per event type, one row per day."""
    e = load(spark, sf_dir, "events")
    return (
        e.select(
            F.date_format(F.window("ts", "1 day").start, "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .groupBy("day")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, _EVENT_TYPES)
    )


@query(
    "unpivot_stack",
    oracle="""
    WITH wide AS (
        SELECT strftime(make_timestamp((epoch_us(ts) // 86400000000) * 86400000000),
                        '%Y-%m-%d') AS day,
               """
    + ",\n               ".join(
        f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS {t}"
        for t in _EVENT_TYPES
    )
    + f"""
        FROM events GROUP BY 1
    )
    SELECT day, event_type, n
    FROM wide
    UNPIVOT (n FOR event_type IN ({", ".join(_EVENT_TYPES)}))
    WHERE n > 0
    """,
)
def unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round trip: the pivoted matrix unpivoted back to long form via
    stack() — Spark's UNPIVOT. Zero cells are dropped (UNPIVOT's default
    NULL-exclusion is emulated by the n > 0 filter on both sides)."""
    wide = pivot_wide(spark, sf_dir)
    stack_expr = "stack({n}, {args}) as (event_type, n)".format(
        n=len(_EVENT_TYPES),
        args=", ".join(f"'{t}', {t}" for t in _EVENT_TYPES),
    )
    return (
        wide.select("day", F.expr(stack_expr))
        .filter(F.col("n") > 0)
        .select("day", "event_type", "n")
    )

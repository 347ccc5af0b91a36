"""Modern SQL surface (Spark 4): recursive CTEs, VARIANT semi-structured
shredding, pipe-syntax queries, and catalog-registered SQL scalar UDFs.

A reference user migrating from a commercial warehouse expects these four
front doors to exist; each is the Spark 4 native feature (not an
emulation), and each is oracled — the recursive CTE runs the LITERAL same
text in DuckDB (both engines implement SQL:1999 recursion), the others
mirror semantics through DuckDB's JSON/ANSI equivalents.

Scale notes: recursion here generates a calendar spine (iterations =
months, not rows — the classic bounded-depth use; unbounded graph
recursion belongs to the iterative operators in graph.py/ann.py);
VARIANT shredding is per-row scan work in codegen (the variant is never
materialized wider than the row); pipe syntax and SQL UDFs are pure
front-end sugar — Catalyst plans them identically to the DataFrame API,
which the plan tests pin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load, query

# Shared text: runs VERBATIM in both Spark 4 and DuckDB (parity by
# construction). The recursion carries its stop bound as a column so the
# recursive step needs no subquery; depth = months spanned by orders
# (~80), far under Spark's default 100-level recursion guard.
_RECURSIVE_SPINE = """
    WITH RECURSIVE bounds AS (
        SELECT date_trunc('month', min(o_orderdate)) AS lo,
               date_trunc('month', max(o_orderdate)) AS hi
        FROM orders
    ),
    spine(d, hi) AS (
        SELECT lo, hi FROM bounds
        UNION ALL
        SELECT d + INTERVAL 1 MONTH, hi FROM spine WHERE d < hi
    ),
    rev AS (
        SELECT date_trunc('month', o_orderdate) AS m,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY 1
    )
    SELECT CAST(CAST(s.d AS DATE) AS STRING) AS month_start,
           CAST(COALESCE(r.n_orders, 0) AS BIGINT) AS n_orders,
           (r.m IS NULL) AS gap_month
    FROM spine s LEFT JOIN rev r ON r.m = s.d
"""


@query("sql_recursive_spine", oracle=_RECURSIVE_SPINE)
def sql_recursive_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE front door (Spark 4 ``WITH RECURSIVE``): generate the
    complete month spine between the first and last order and left-join
    monthly order counts onto it, flagging gap months — the densification
    step every calendar report needs (a plain GROUP BY silently drops
    empty months; the spine makes them explicit zeros).

    The SAME statement text runs verbatim through ``spark.sql`` and the
    DuckDB oracle — both engines implement SQL:1999 recursion — so parity
    holds by construction. The recursion carries its stop bound as a
    column (anchor cross-joins the bounds CTE), the portable idiom that
    keeps the recursive step free of subqueries.

    Scale shape: recursion depth is the number of MONTHS (~tens), not
    rows; the spine is broadcast-size and joins against the one
    partial-agg collapse of orders. Unbounded-depth workloads (graph
    closure) use the iterative checkpoint loop in graph.py instead —
    recursion is the right tool only when depth is calendar-bounded.
    """
    from hudi_acid_verification_spark.catalog import register_fixtures

    register_fixtures(spark, sf_dir)
    return spark.sql(_RECURSIVE_SPINE)


@query(
    "scalar_variant_shred",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS n_with_k,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS min_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS max_k
    FROM events GROUP BY event_type
    """,
)
def scalar_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured ingestion through the Spark 4 VARIANT type: parse
    each event's JSON ``props`` into a genuine ``VariantType`` column
    (``parse_json``), extract a typed path (``variant_get($.k)``), and
    roll up per event type — the open-schema pattern (Snowflake VARIANT /
    BigQuery JSON) where payloads evolve without table DDL.

    VARIANT stores a parsed binary encoding, so repeated path extraction
    does not re-parse text the way ``get_json_object`` does (that older
    path is covered by array_map_json); the DuckDB oracle shreds the same
    path with its JSON machinery, and the typed BIGINT results hash
    exactly.

    Scale shape: parse + extract are per-row projection work inside the
    scan stage (no shuffle added); the rollup is one partial-agg groupBy
    on event type. At 100 TB the variant column would be the stored
    format and the scan prunes to the single path — same plan.
    """
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.expr("variant_get(parse_json(props), '$.k', 'bigint')").alias("k"),
    )
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("k").alias("n_with_k"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
    )


_PIPE_TEXT = """
    FROM lineitem
    |> WHERE l_quantity >= 30
    |> AGGREGATE CAST(count(*) AS BIGINT) AS n_items,
                 CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
                 CAST(min(l_orderkey) AS BIGINT) AS first_order
       GROUP BY l_returnflag
    |> ORDER BY l_returnflag
"""


@query(
    "sql_pipe_syntax",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
           CAST(min(l_orderkey) AS BIGINT) AS first_order
    FROM lineitem
    WHERE l_quantity >= 30
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe-syntax front door (Spark 4 ``|>`` operators, the
    GoogleSQL pipe dialect): the same filter→aggregate→order query
    expressed as a linear pipeline instead of inside-out ANSI nesting.
    The oracle runs the classic ANSI spelling — identical results prove
    the dialects are front-end sugar over one plan (the plan test pins
    that the pipe text still gets predicate pushdown and partial
    aggregation; Catalyst sees the same logical plan either way).
    """
    from hudi_acid_verification_spark.catalog import register_fixtures

    register_fixtures(spark, sf_dir)
    return spark.sql(_PIPE_TEXT)


# The UDF body: integer cents of the discounted price. Two IEEE
# multiplications in fixed order + floor — bit-identical cross-engine
# (the penny-allocation precedent).
_UDF_BODY = "CAST(floor(p * (1 - d) * 100 + 0.5) AS BIGINT)"


@query(
    "sql_scalar_udf",
    oracle=f"""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum({_UDF_BODY.replace('d', 'l_discount')
                              .replace('p', 'l_extendedprice')})
                AS BIGINT) AS margin_cents
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def sql_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog-registered SQL scalar UDF (Spark 4 ``CREATE FUNCTION …
    RETURN expr``): business logic named once in the catalog and reused
    across queries — the warehouse pattern for shared money math — with
    ZERO runtime cost: Catalyst inlines the body at plan time, so the
    UDF call compiles into the same whole-stage-codegen expression the
    hand-inlined query produces (the plan test asserts no Python eval
    and a partial aggregate, exactly as if the expression were written
    in place).

    The oracle inlines the identical body textually; discounted cents
    are two fixed-order IEEE multiplications + floor, so the BIGINT
    sums hash across engines.
    """
    from hudi_acid_verification_spark.catalog import register_fixtures

    register_fixtures(spark, sf_dir)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION discount_cents("
        "p DOUBLE, d DOUBLE) RETURNS BIGINT RETURN " + _UDF_BODY
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n_items,
               CAST(sum(discount_cents(l_extendedprice, l_discount))
                    AS BIGINT) AS margin_cents
        FROM lineitem
        GROUP BY l_returnflag
        """
    )


# Runs VERBATIM in Spark 4 and DuckDB: both dialects resolve GROUP BY ALL
# from the non-aggregate select items and ORDER BY ALL left-to-right.
_GROUP_BY_ALL_TEXT = """
    SELECT o_orderpriority,
           o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               AS sum_price
    FROM orders
    WHERE o_orderdate >= DATE '1995-01-01'
    GROUP BY ALL
    ORDER BY ALL
"""


@query("sql_group_by_all", oracle=_GROUP_BY_ALL_TEXT)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY ALL`` / ``ORDER BY ALL`` front door (Spark 4, same
    dialect as DuckDB/Snowflake): the grouping key list is inferred from
    the non-aggregate select items, so wide exploratory rollups don't
    repeat column lists that drift out of sync. The oracle runs the
    LITERAL same text in DuckDB — parity by construction, the
    recursive-CTE precedent.

    Plan-wise this is pure front-end resolution sugar: Catalyst expands
    ALL during analysis and the physical plan is the ordinary
    partial-agg + shuffle + sort of the explicit spelling (decimal-cast
    sum for order-independent, hash-stable money totals).
    """
    from hudi_acid_verification_spark.catalog import register_fixtures

    register_fixtures(spark, sf_dir)
    return spark.sql(_GROUP_BY_ALL_TEXT)

"""Scalar function surface (SURVEY.md §2B: scalar_string_date_math,
array_map_json).

All expressions are per-row, JVM-side, whole-stage-codegen'd — no UDFs. The
oracle SQL uses DuckDB's spellings of the same functions (date_diff vs
datediff, string_split vs split); semantics are aligned and results are
deterministic per row, so parity is exact.

Array results are serialized with array_join for the oracle comparison —
engines agree on strings more reliably than on nested-list value encodings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load, query


@query(
    "scalar_string_date_math",
    oracle="""
    SELECT
        o_orderkey,
        lower(o_orderpriority) AS prio_lower,
        upper(o_orderstatus) AS status_upper,
        substr(o_orderpriority, 1, 1) AS prio_code,
        concat(o_orderstatus, '-', o_orderpriority) AS status_prio,
        length(o_orderpriority) AS prio_len,
        replace(o_orderpriority, '-', '_') AS prio_snake,
        year(o_orderdate) AS order_year,
        month(o_orderdate) AS order_month,
        dayofmonth(o_orderdate) AS order_day,
        date_diff('day', DATE '1995-01-01', o_orderdate) AS days_since_95,
        CAST(strftime(o_orderdate, '%Y-%m') AS VARCHAR) AS order_ym,
        floor(o_totalprice / 10.0 + 0.5) / 100.0 AS price_k,
        abs(o_totalprice - 150000.0) AS dist_from_150k,
        CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS price_bucket,
        o_orderkey % 7 AS key_mod
    FROM orders
    """,
)
def scalar_string_date_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String / date / math scalar functions in one projection."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.lower("o_orderpriority").alias("prio_lower"),
        F.upper("o_orderstatus").alias("status_upper"),
        F.substring("o_orderpriority", 1, 1).alias("prio_code"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("status_prio"),
        F.length("o_orderpriority").alias("prio_len"),
        F.replace(F.col("o_orderpriority"), F.lit("-"), F.lit("_")).alias("prio_snake"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_95"
        ),
        F.date_format("o_orderdate", "yyyy-MM").alias("order_ym"),
        # round(double, 2) disagrees across engines (Spark rounds the shortest
        # decimal repr half-up; DuckDB rounds the binary value) — use an
        # explicit floor(x*100 + 0.5)/100, which is pure deterministic double
        # arithmetic and therefore engine-independent.
        (F.floor(F.col("o_totalprice") / 10.0 + 0.5) / 100.0).alias("price_k"),
        F.abs(F.col("o_totalprice") - 150000.0).alias("dist_from_150k"),
        F.floor(F.col("o_totalprice") / 50000.0).cast("bigint").alias("price_bucket"),
        (F.col("o_orderkey") % 7).alias("key_mod"),
    )


@query(
    "array_map_json",
    oracle="""
    SELECT
        event_id,
        CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k,
        len(string_split(event_type, 'r')) AS n_parts,
        string_split(event_type, 'r')[1] AS first_part,
        array_to_string([user_id % 10, event_id % 10], ',') AS id_digits,
        array_to_string(list_sort(string_split(event_type, 'r')), '|') AS parts_sorted
    FROM events
    """,
)
def array_map_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction + array construction/sort/join on events.props.

    get_json_object stays in the JVM (Jackson-based); no Python round-trip.
    Arrays are emitted as joined strings so the oracle compares scalars.
    """
    e = load(spark, sf_dir, "events")
    parts = F.split(F.col("event_type"), "r")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
        F.size(parts).alias("n_parts"),
        F.element_at(parts, 1).alias("first_part"),
        F.concat_ws(
            ",",
            (F.col("user_id") % 10).cast("string"),
            (F.col("event_id") % 10).cast("string"),
        ).alias("id_digits"),
        F.array_join(F.array_sort(parts), "|").alias("parts_sorted"),
    )


@query(
    "scalar_regexp",
    oracle="""
    SELECT doc_id,
           regexp_matches(text, '[0-9]') AS has_digit,
           regexp_extract(text, '([0-9]+)', 1) AS first_number,
           length(text) - length(regexp_replace(text, '[aeiou]', '', 'g'))
               AS n_vowels
    FROM documents
    """,
)
def scalar_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp surface (rlike / regexp_extract / regexp_replace) — both
    engines return '' for a no-match extract, and Spark's regexp_replace is
    global by default (DuckDB needs the 'g' flag). All JVM-side: regexps in
    built-in functions stay inside codegen, no Python.
    """
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.col("text").rlike("[0-9]").alias("has_digit"),
        F.regexp_extract("text", "([0-9]+)", 1).alias("first_number"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", "[aeiou]", ""))
        ).alias("n_vowels"),
    )


@query(
    "hof_vector_stats",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           CAST(list_sum(list_transform(embedding,
               x -> abs(CAST(floor(CAST(x AS DOUBLE) * 10000000 + 0.5)
                             AS BIGINT)))) AS BIGINT) AS l1_q,
           len(list_filter(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 10000000 + 0.5)
                         AS BIGINT) > 0)) AS n_pos,
           CAST(list_sum(list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 10000000 + 0.5) AS BIGINT)
                    * CAST(floor(CAST(x AS DOUBLE) * 10000000 + 0.5)
                           AS BIGINT))) AS BIGINT) AS dot_self_q
    FROM embeddings
    """,
)
def hof_vector_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions (transform / filter / aggregate) over
    the embedding column: per-vector dimension, quantized L1 norm, positive-
    dimension count, and quantized self-dot — all inside whole-stage codegen
    lambdas, zero Python, zero explode (no row-count blow-up).

    Cross-engine exactness: elements quantize to int64 at scale 1e7 (the
    similarity module's convention — floor(x·1e7 + 0.5) is exact-widening
    double math both engines evaluate identically), so every sum is integer.

    Scale notes: purely per-row map work — no shuffle at all; at 100 TB this
    is the shape feature extraction should take (HOF lambdas over the array
    column, not explode → groupBy, which would shuffle dim× the rows).
    """
    q = "CAST(floor(CAST(x AS DOUBLE) * 10000000 + 0.5) AS BIGINT)"
    e = load(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.expr(
            f"aggregate(transform(embedding, x -> abs({q})),"
            " CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        ).alias("l1_q"),
        F.expr(f"size(filter(embedding, x -> {q} > 0))").alias("n_pos"),
        F.expr(
            f"aggregate(transform(embedding, x -> {q} * {q}),"
            " CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        ).alias("dot_self_q"),
    )


@query(
    "scalar_try_arith_ansi",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN CAST(l_quantity AS BIGINT) = 25 THEN NULL
                ELSE CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                     / (CAST(l_quantity AS BIGINT) - 25)
           END AS price_per_excess_qty,
           CASE WHEN CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                     > 9223
                THEN NULL
                ELSE CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                     * 1000000000000000
           END AS scaled_or_null,
           CAST(NULL AS VARCHAR) AS missing_token
    FROM lineitem
    WHERE l_orderkey % 20 = 0
    """,
)
def scalar_try_arith_ansi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode error-safe arithmetic — the `try_*` function family that
    makes Spark 4's ANSI-on default survivable in bulk ETL: division by
    zero, bigint overflow, and out-of-bounds element access each yield
    NULL instead of failing the 1000-executor job at row 10^12 of 10^13.
    The oracle states the same semantics as explicit guards (CASE WHEN
    the error condition THEN NULL), so Spark's try_divide/try_multiply/
    try_element_at are verified to null out EXACTLY the error rows and
    compute bit-identical values elsewhere (the division is one IEEE
    double op on exact integer inputs in both engines).

    Scale shape: pure per-row projection inside whole-stage codegen —
    no shuffle, no UDF; the modulus predicate pushes to the parquet scan.
    """
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 20 == 0
    )
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast(
        "bigint"
    )
    qty = F.col("l_quantity").cast("bigint")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(cents, qty - F.lit(25)).alias("price_per_excess_qty"),
        F.try_multiply(cents, F.lit(1000000000000000).cast("bigint")).alias(
            "scaled_or_null"
        ),
        F.try_element_at(
            F.split(F.col("l_returnflag"), " "), F.lit(99)
        ).alias("missing_token"),
    )


@query(
    "scalar_interval_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) AS order_day,
           CAST(CAST(o_orderdate AS DATE) + 90 AS DATE)
               AS due_day,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE)
               AS review_day,
           CAST(date_trunc('quarter', CAST(o_orderdate AS DATE)) AS DATE)
               AS quarter_start,
           CAST(date_diff('day', DATE '1995-01-01',
                          CAST(o_orderdate AS DATE)) AS BIGINT)
               AS days_since_epoch_start,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end
    FROM orders
    WHERE o_orderkey % 25 = 0
    """,
)
def scalar_interval_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar/interval arithmetic — the due-date, review-window, and
    fiscal-bucket expressions of every SLA and cohort pipeline: day and
    month interval addition (month addition clamps to month end in BOTH
    engines — the semantic worth pinning), quarter truncation, day
    difference from a fixed epoch, and last-day-of-month. All outputs are
    DATE or BIGINT, so the hash comparison certifies the calendar math
    itself, including leap-year and month-length edge cases present in
    the 1995–2001 fixture range.

    Oracle note: the day-interval term is written `date + 90` (integer
    day addition) rather than `+ INTERVAL 90 DAY` because DuckDB 1.0.0's
    subexpression elimination collapses two `CAST(col AS DATE) +
    INTERVAL ...` columns into whichever interval appears first,
    returning identical (wrong) values for both.

    Scale shape: pure per-row projection in whole-stage codegen; the
    modulus sample keeps certified output compact without changing the
    plan shape.
    """
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 25 == 0)
    day = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        day.alias("order_day"),
        F.date_add(day, 90).alias("due_day"),
        F.add_months(day, 3).alias("review_day"),
        F.date_trunc("quarter", day).cast("date").alias("quarter_start"),
        F.datediff(day, F.lit("1995-01-01").cast("date"))
        .cast("bigint")
        .alias("days_since_epoch_start"),
        F.last_day(day).alias("month_end"),
    )


@query(
    "scalar_binary_codecs",
    oracle="""
    SELECT p_partkey,
           md5(p_name) AS md5_hex,
           sha256(p_name) AS sha256_hex,
           base64(encode(p_name)) AS b64,
           hex(p_name) AS hex_upper,
           CAST(
               decode(from_base64(base64(encode(p_name)))) = p_name
               AND decode(unhex(hex(p_name))) = p_name
               AS BOOLEAN
           ) AS roundtrip_ok
    FROM part
    """,
)
def scalar_binary_codecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary/codec scalar surface: md5 + sha256 digests, base64 and hex
    encodes, and a both-ways round-trip witness per row — the content-
    addressing primitives every dedup key, cache key, shard router, and
    external-system handoff is built on (dedup_exact's md5 keys,
    pipeline_shard_assignment's hash router, source_binaryfile_ingest's
    blob fingerprints all specialize this).

    Every function is a JVM built-in evaluated inside the scan projection
    (whole-stage codegen, no shuffle, no UDF); digests/encodings of UTF-8
    bytes are engine-independent by specification, which the oracle's
    DuckDB twins confirm byte-for-byte — including agreement on hex CASE
    (both engines emit uppercase) and base64 padding.
    """
    p = load(spark, sf_dir, "part")
    b64 = F.base64(F.col("p_name").cast("binary"))
    hx = F.hex(F.col("p_name"))
    return p.select(
        "p_partkey",
        F.md5("p_name").alias("md5_hex"),
        F.sha2(F.col("p_name"), 256).alias("sha256_hex"),
        b64.alias("b64"),
        hx.alias("hex_upper"),
        (
            (F.unbase64(b64).cast("string") == F.col("p_name"))
            & (F.unhex(hx).cast("string") == F.col("p_name"))
        ).alias("roundtrip_ok"),
    )

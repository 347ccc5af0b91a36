"""Source/sink connectors beyond parquet: CSV, JSON(-lines), ORC.

Each operator materializes a fixture table through the format's writer and
reads it back with an EXPLICIT schema — the correctness claim is lossless
round-trip, so the DuckDB oracle is simply the original parquet view.
Doubles survive text formats because Spark serializes them with Java's
shortest-round-trip representation.

Scale notes: explicit schemas are non-negotiable at 100 TB — schema
inference is a full extra pass over the data. CSV/JSON scans get column
pruning but no predicate pushdown or row-group skipping (splittable only
when uncompressed/bzip2); ORC, like parquet, keeps pushdown + stats-based
skipping (the plan audit asserts it). Text formats are ingestion-edge
formats: land them once, convert to a columnar table, query that.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load, query

_STAGE = os.path.join(tempfile.gettempdir(), "spark_graft_source_stage")


def _stage_dir(sf_dir: str, name: str) -> str:
    # keyed by sf dir so sf0.01 and sf0.1 don't collide
    return os.path.join(_STAGE, os.path.basename(os.path.normpath(sf_dir)), name)


def _roundtrip(
    spark: SparkSession, sf_dir: str, table: str, fmt: str, **options
) -> DataFrame:
    src = load(spark, sf_dir, table)
    path = _stage_dir(sf_dir, f"{table}_{fmt}")
    src.write.mode("overwrite").format(fmt).options(**options).save(path)
    return (
        spark.read.format(fmt)
        .options(**options)
        .schema(src.schema)  # explicit schema: no inference pass
        .load(path)
    )


@query("source_csv_roundtrip", oracle="SELECT * FROM customer")
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer → CSV (header, quoted) → read with explicit schema."""
    return _roundtrip(
        spark, sf_dir, "customer", "csv", header="true", escape='"'
    )


@query("source_json_roundtrip", oracle="SELECT * FROM supplier")
def source_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """supplier → JSON lines → read with explicit schema."""
    return _roundtrip(spark, sf_dir, "supplier", "json")


@query("source_orc_roundtrip", oracle="SELECT * FROM documents")
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → ORC → read back (columnar alternative with pushdown)."""
    return _roundtrip(spark, sf_dir, "documents", "orc")


@query("source_xml_roundtrip", oracle="SELECT * FROM nation")
def source_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nation → XML → read back with explicit schema. Spark 4 ships the
    (formerly spark-xml) XML data source built in: the writer emits one
    ``<nation>`` element per row with entity-escaped text, the reader
    parses it back, so the round trip is lossless even for markup-unsafe
    characters. XML is the B2B/feed-ingestion edge format (the oracle is
    the original parquet view, same claim as the CSV/JSON twins).

    Scale notes: XML files are NOT splittable inside a document — the
    reader parallelizes per FILE, so landing many medium files (as the
    writer's per-task output naturally does) keeps ingest parallel; like
    CSV/JSON there is no pushdown, so convert to columnar after one pass.
    """
    # ignoreSurroundingSpaces defaults to TRUE in Spark 4's XML reader —
    # without the explicit false, any string value with leading/trailing
    # whitespace would be silently trimmed on read and break the lossless
    # claim (the fixtures happen to have none; hold it by construction).
    return _roundtrip(
        spark, sf_dir, "nation", "xml",
        rowTag="nation", ignoreSurroundingSpaces="false",
    )


@query(
    "source_partitioned_pruned",
    oracle="SELECT doc_id, text, source, n_chars, lang FROM documents WHERE lang = 'en'",
)
def source_partitioned_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned parquet: documents written PARTITIONED BY
    (lang), read back with a partition predicate. The filter binds to the
    directory layout, so the scan lists and reads ONLY lang=en files —
    PartitionFilters in the plan, zero I/O for the other languages (the
    plan audit asserts it). This is the layout decision that matters most
    at 100 TB: a predicate on the partition column prunes before any byte
    is read, where a row-group filter still pays the file listing and
    footer reads.
    """
    src = load(spark, sf_dir, "documents")
    path = _stage_dir(sf_dir, "documents_partitioned")
    src.write.mode("overwrite").partitionBy("lang").parquet(path)
    return (
        spark.read.schema(src.schema)
        .parquet(path)
        .filter("lang = 'en'")
        .select("doc_id", "text", "source", "n_chars", "lang")
    )


@query("source_binaryfile_ingest")  # rows-only: path-templated oracle not
# expressible through the driver's fixed view set; pinned instead by a local
# DuckDB read_blob invariant test (tests/test_corpus_invariants.py)
def source_binaryfile_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-binary ingestion source — the first step of every multimodal
    pipeline: `spark.read.format("binaryFile")` over a directory of blobs
    (here: the fixture's own parquet files standing in for media objects),
    emitting (file_name, n_bytes, content fingerprint) per object. The
    fingerprint is md5 over the UPPERCASE hex of the bytes — an encoding
    both engines produce identically, so the local invariant test compares
    byte-exactly against DuckDB's read_blob of the same directory.

    Scale notes: binaryFile is a real FileFormat — Spark splits the
    LISTING across the cluster (each task reads whole files; maxBytesPerFile
    partitioning), predicate pushdown applies to path/length metadata, and
    content never touches the driver. At 100 TB this is the pattern for
    media: list object-store prefixes into (path, length) tasks, fetch
    bytes per task, decode via mapInPandas (multimodal.py's plumbing).
    """
    bf = spark.read.format("binaryFile").load(f"{sf_dir}/*.parquet")
    return bf.select(
        F.regexp_extract(F.col("path"), "[^/]+$", 0).alias("file_name"),
        F.col("length").cast("bigint").alias("n_bytes"),
        F.md5(F.hex(F.col("content"))).alias("content_md5"),
    )


@query(
    "source_parquet_schema_merge",
    oracle="""
    SELECT n_nationkey,
           n_name,
           CAST(NULL AS BIGINT) AS n_regionkey,
           'v1' AS file_version
    FROM nation
    UNION ALL
    SELECT n_nationkey,
           CAST(NULL AS VARCHAR) AS n_name,
           n_regionkey,
           'v2' AS file_version
    FROM nation
    """,
)
def source_parquet_schema_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution read: two parquet generations of the same table —
    v1 carries (n_nationkey, n_name), v2 drops n_name and adds
    n_regionkey — read together with ``mergeSchema=true``, which unions
    the footers into one superset schema and null-fills each file's
    missing columns. This is the day-2 reality of any long-lived dataset
    (producers add/drop columns without rewriting history) and the reason
    parquet footer merging exists.

    The two generations are staged as REAL parquet directories from the
    nation fixture, so the merged read is byte-honest; the oracle states
    the expected union-by-name relationally. Scale: mergeSchema pays one
    footer read per FILE at planning time — fine per-table, which is why
    production catalogs (and our AcidTable manifest) pin the merged
    schema once at commit instead of re-merging per query.
    """
    nat = load(spark, sf_dir, "nation")
    path = _stage_dir(sf_dir, "nation_evolved")
    nat.select("n_nationkey", "n_name").withColumn(
        "file_version", F.lit("v1")
    ).write.mode("overwrite").parquet(os.path.join(path, "gen=1"))
    nat.select("n_nationkey", "n_regionkey").withColumn(
        "file_version", F.lit("v2")
    ).write.mode("overwrite").parquet(os.path.join(path, "gen=2"))
    merged = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(path, "gen=1"), os.path.join(path, "gen=2")
    )
    return merged.select(
        "n_nationkey", "n_name", "n_regionkey", "file_version"
    )


@query(
    "source_dynamic_partition_pruning",
    oracle="""
    WITH dim AS (
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY 1
        HAVING count(*) >= 100
    )
    SELECT d.lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(d.n_chars) AS BIGINT) AS total_chars
    FROM documents d
    JOIN dim ON dim.lang = d.lang
    GROUP BY d.lang
    """,
)
def source_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning (DPP): the fact table is partitioned by
    lang on disk, and the set of langs to read is NOT a literal — it
    comes from a dimension computed at runtime (languages with ≥100
    docs). Catalyst plants a dynamicpruning subquery on the fact scan's
    partition column: the dim side runs FIRST (reusing its broadcast),
    and only the surviving partitions' files are ever listed and read
    (asserted in the plan audit).

    This is THE join-pruning mechanism for star schemas at 100 TB — a
    static filter can't express 'partitions some other query selects',
    and without DPP the fact scan reads every partition and throws rows
    away post-join.
    """
    src = load(spark, sf_dir, "documents")
    path = _stage_dir(sf_dir, "documents_dpp")
    src.write.mode("overwrite").partitionBy("lang").parquet(path)
    fact = spark.read.schema(src.schema).parquet(path)
    # dim derives from the UNpartitioned fixture read so the planner sees
    # two distinct relations (dim-from-fact self-reference can defeat DPP)
    dim = (
        src.groupBy(F.col("lang").alias("dlang"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 100)
    )
    return (
        fact.join(F.broadcast(dim), fact.lang == F.col("dlang"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


@query(
    "source_text_lines",
    oracle="""
    SELECT lang, source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS total_chars,
           CAST(sum(length(text) - length(replace(text, ' ', '')) + 1)
                AS BIGINT) AS total_tokens
    FROM documents
    GROUP BY 1, 2
    """,
)
def source_text_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw text-line ingestion — the log-file / WET-extract edge of a
    corpus pipeline: documents are rendered to a delimited line format
    (``doc_id<TAB>lang<TAB>source<TAB>text``), written through Spark's
    ``text`` sink, re-read with ``spark.read.text`` (one ``value`` column,
    no schema, no parsing — the rawest source Spark has), and re-parsed
    with ``regexp_extract`` projections. The oracle aggregates the
    original parquet, so the claim is a LOSSLESS round trip through the
    unstructured format plus a correct line parser.

    Scale shape: text files split by line boundaries, so the read
    parallelizes like any scan; parsing is a narrow codegen'd map
    (regexp_extract), and the only exchange is the final partial-agg
    groupBy. Schema-on-read from regex is exactly how raw crawl/log lands
    at 100 TB before columnarization (and why you convert after one pass:
    no pushdown, no pruning, full-line decode every query).
    """
    path = _stage_dir(sf_dir, "documents_textlines")
    d = load(spark, sf_dir, "documents")
    (
        d.select(
            F.concat_ws(
                "\t",
                F.col("doc_id").cast("string"),
                "lang",
                "source",
                "text",
            ).alias("value")
        )
        .write.mode("overwrite")
        .format("text")
        .save(path)
    )
    lines = spark.read.text(path)
    parsed = lines.select(
        F.regexp_extract("value", r"^([^\t]*)\t([^\t]*)\t([^\t]*)\t(.*)$", 2)
        .alias("lang"),
        F.regexp_extract("value", r"^([^\t]*)\t([^\t]*)\t([^\t]*)\t(.*)$", 3)
        .alias("source"),
        F.regexp_extract("value", r"^([^\t]*)\t([^\t]*)\t([^\t]*)\t(.*)$", 4)
        .alias("text"),
    )
    n_tokens = (
        F.length("text") - F.length(F.replace(F.col("text"), F.lit(" ")))
        + F.lit(1)
    )
    return parsed.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.length("text")).cast("bigint").alias("total_chars"),
        F.sum(n_tokens).cast("bigint").alias("total_tokens"),
    )

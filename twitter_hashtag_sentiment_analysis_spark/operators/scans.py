"""Scans / sources / sinks (SURVEY §2B).

The reference's only "scan" is the Twitter push source with server-side
filtering (streamer.py:48); the batch analogs here are parquet scans
where Catalyst gets the same effect — column pruning + predicate
pushdown reach the parquet reader (check ``ReadSchema`` /
``PushedFilters`` in ``.explain("formatted")``).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import register_dir_cache, table
from ..registry import register


@register(
    "scan_parquet",
    sql="""
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               round(sum(l_quantity), 2) AS sum_qty,
               CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
        FROM lineitem
    """,
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full parquet scan + global aggregate — proves the source reads
    every row. Only 3 columns survive pruning despite the 11-column table."""
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@register(
    "scan_pruned",
    sql="""
        SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '2001-01-01'
    """,
)
def scan_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-pruned, predicate-pushed scan (the R2 'filter at the
    source' analog, ref streamer.py:48): Catalyst pushes the shipdate
    range into the parquet reader so non-matching row groups are skipped
    via min/max stats — the mechanism that matters at 100 TB."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_shipdate") >= "2001-01-01").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )


@register(
    "sink_partitioned",
    sql="""
        SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
               round(sum(l_extendedprice), 2) AS sum_price
        FROM lineitem
        GROUP BY l_returnflag
    """,
    eager=True,
)
def sink_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned parquet write + read-back (the R8 S3-append-sink
    analog, ref stream_processor.py:292-329): Hive-style partition dirs
    by `l_returnflag` mirror the reference's date-prefixed S3 layout.
    The oracle proves the roundtrip is lossless. At scale, partition
    columns enable partition pruning for downstream readers."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_orderkey"
    )
    out = os.path.join(tempfile.mkdtemp(prefix="thsa_sink_"), "lineitem_by_flag")
    li.write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
    back = spark.read.parquet(out)
    return back.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
    )


# ---------------------------------------------------------------------------
# Source-format coverage: CSV / NDJSON / ORC readers.
#
# The fixtures ship as parquet only, so each scan op materializes a
# cached copy of `events` in the target format (once per sf_dir per
# session), reads it back through the format's reader, and returns the
# full row set. The oracle reads the ORIGINAL parquet view — so a PASS
# means the write->read roundtrip is value-exact for every type in the
# table (bigint, timestamp micros, double, free-text JSON string).
# ---------------------------------------------------------------------------

_FMT_CACHE: dict[tuple[str, str], str] = {}

#: CSV/JSON timestamp render+parse options, micro-precision so the text
#: roundtrip is lossless. Spark routes TIMESTAMP columns through
#: `timestampFormat` but TIMESTAMP_NTZ (what the driver's naive-parquet
#: fixtures read as) through the SEPARATE `timestampNTZFormat` — its
#: default is millis-only, which silently truncates micros; both are
#: pinned here for whichever flavor the fixture carries.
_TS_OPTS = {
    "timestampFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS",
    "timestampNTZFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS",
}

_EVENTS_ORACLE = """
        SELECT event_id, ts, user_id, event_type, value, props
        FROM events
    """


def _events_copy(spark: SparkSession, sf_dir: str, fmt: str) -> str:
    """Write (once) and return the path of `events` in `fmt`."""
    key = (sf_dir, fmt)
    if key not in _FMT_CACHE:
        ev = table(spark, sf_dir, "events")
        out = os.path.join(tempfile.mkdtemp(prefix="thsa_fmt_"), f"events_{fmt}")
        w = ev.coalesce(4).write.mode("overwrite")
        if fmt == "csv":
            # shortest-roundtrip doubles + micro timestamps: lossless
            w.options(header=True, **_TS_OPTS).csv(out)
        elif fmt == "json":
            w.options(**_TS_OPTS).json(out)
        elif fmt == "xml":
            w.format("xml").options(rowTag="event", **_TS_OPTS).save(out)
        else:
            w.format(fmt).save(out)
        _FMT_CACHE[key] = out
    return _FMT_CACHE[key]


def _events_schema(spark: SparkSession, sf_dir: str):
    """Explicit schema for the schema-on-read formats (CSV/JSON must
    never infer: inference is an extra full scan AND can mistype at
    100 TB). Taken from the parquet original so the timestamp flavor
    (TIMESTAMP vs TIMESTAMP_NTZ) always matches the fixture."""
    return table(spark, sf_dir, "events").schema


@register("scan_csv", sql=_EVENTS_ORACLE)
def scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source with an explicit schema (no inference scan). The
    reader is splittable — at 100 TB each executor reads its own byte
    range — and quoted fields cover the embedded-JSON `props` column.
    Value-exact vs the parquet original, including IEEE doubles."""
    path = _events_copy(spark, sf_dir, "csv")
    return (
        spark.read.schema(_events_schema(spark, sf_dir))
        .options(header=True, **_TS_OPTS)
        .csv(path)
    )


@register("scan_ndjson", sql=_EVENTS_ORACLE)
def scan_ndjson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-delimited JSON source with explicit schema — the batch twin
    of the streaming NDJSON tweet source (R1 analog). Schema-on-read
    with no inference; splittable by line."""
    path = _events_copy(spark, sf_dir, "json")
    return (
        spark.read.schema(_events_schema(spark, sf_dir))
        .options(**_TS_OPTS)
        .json(path)
    )


@register("scan_text_lines", sql=_EVENTS_ORACLE)
def scan_text_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw text-line source + from_json schema-on-read — the batch twin
    of the socket push path (streaming/pipeline.read_tweet_socket): the
    file arrives as opaque lines (spark.read.text, splittable by line,
    no format assumption) and structure is imposed per record by
    from_json with an explicit schema. This is the shape for mixed or
    dirty line-oriented feeds where the JSON reader's file-level
    contract is too strong; the parse is a narrow JVM map, so at
    100 TB it distributes exactly like the json reader. Value-exact vs
    the parquet original (same oracle as the format roundtrips)."""
    path = _events_copy(spark, sf_dir, "json")
    schema = _events_schema(spark, sf_dir)
    lines = spark.read.text(path)
    return lines.select(
        F.from_json(
            "value", schema, {k: v for k, v in _TS_OPTS.items()}
        ).alias("r")
    ).select("r.*")


@register("scan_xml", sql=_EVENTS_ORACLE)
def scan_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML source (built into Spark 4) with an explicit schema and a
    pinned micro-precision timestamp format — the structured-document
    twin of `scan_ndjson` for feeds that arrive as XML exports (the
    reference's R3 'parse the wire format into columns' analog,
    ref ProcessStreamData.py:12-19, for an XML wire instead of JSON).
    The reader splits on `rowTag` boundaries so a multi-file XML drop
    distributes like any other line-oriented source; schema-on-read
    with no inference pass. Value-exact vs the parquet original for
    every type in the table (bigint, timestamp micros, IEEE double,
    free-text JSON string — XML-escaped and restored losslessly)."""
    path = _events_copy(spark, sf_dir, "xml")
    return (
        spark.read.schema(_events_schema(spark, sf_dir))
        .format("xml")
        .options(rowTag="event", **_TS_OPTS)
        .load(path)
    )


@register("scan_orc", sql=_EVENTS_ORACLE)
def scan_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC columnar source — same pushdown/pruning machinery as parquet
    (predicate pushdown via ORC row-group stats, vectorized reader).
    Exercised as a full-fidelity roundtrip of every events column."""
    path = _events_copy(spark, sf_dir, "orc")
    return spark.read.orc(path)


# partitioned-events dirs already written this process, keyed by sf_dir
_part_dir_cache: dict[str, str] = register_dir_cache({})


@register(
    "scan_partition_pruned",
    sql="""
        SELECT event_id, user_id, round(value, 2) AS value, event_type
        FROM events WHERE event_type = 'click'
    """,
    eager=True,
)
def scan_partition_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition PRUNING on read (the other half of sink_partitioned's
    story): events written date-lake-style as event_type=<v>/ dirs,
    then scanned with an equality filter on the partition column. The
    filter never touches data files — it prunes DIRECTORIES at plan
    time (PartitionFilters in the scan node, plan-asserted), so a
    1000-partition corpus reads 1/1000th of its files. This is the
    access pattern that makes date-partitioned 100 TB sinks queryable
    interactively. Write happens once per process (cached); the
    oracle reads the unpartitioned original."""
    key = sf_dir
    path = _part_dir_cache.get(key)
    if path is None:
        path = os.path.join(tempfile.mkdtemp(prefix="thsa_part_"), "events_by_type")
        (
            table(spark, sf_dir, "events")
            .write.mode("overwrite")
            .partitionBy("event_type")
            .parquet(path)
        )
        _part_dir_cache[key] = path
    ev = spark.read.parquet(path)
    return ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.round("value", 2).alias("value"), "event_type"
    )


# corrupt-NDJSON drop dirs, keyed by sf_dir; every 50th line is mangled
_corrupt_ndjson_cache: dict[str, str] = register_dir_cache({})


@register(
    "scan_corrupt_permissive",
    sql="""
        SELECT CASE WHEN doc_id % 50 = 0 THEN NULL ELSE lang END AS lang,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM documents
        GROUP BY 1
    """,
    eager=True,
)
def scan_corrupt_permissive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch R9: PERMISSIVE scan of an NDJSON drop where every 50th
    line is deterministically mangled (unclosed brace prefix). Corrupt
    lines survive the read as all-NULL rows carrying their raw text in
    _corrupt_record instead of killing the job (the reference's
    swallow-and-continue, streamer.py:32-33, made auditable). Output
    counts lines per lang with corrupt lines in the NULL group — the
    oracle derives the same partition from the mangle rule. The text
    write is distributed and cached per process."""
    key = sf_dir
    path = _corrupt_ndjson_cache.get(key)
    if path is None:
        path = os.path.join(tempfile.mkdtemp(prefix="thsa_corrupt_"), "drop")
        line = F.to_json(F.struct("doc_id", "lang", "n_chars"))
        (
            table(spark, sf_dir, "documents")
            .select(
                F.when(F.col("doc_id") % 50 == 0, F.concat(F.lit("{broken "), line))
                .otherwise(line)
                .alias("value")
            )
            .write.mode("overwrite")
            .text(path)
        )
        _corrupt_ndjson_cache[key] = path
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("n_chars", T.LongType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    parsed = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    return parsed.groupBy("lang").agg(F.count("*").alias("n_lines"))


@register(
    "scan_schema_evolution",
    sql="""
        WITH v1 AS (
            SELECT doc_id, text, NULL AS lang
            FROM documents WHERE doc_id % 2 = 0
        ),
        v2 AS (
            SELECT doc_id, text, lang
            FROM documents WHERE doc_id % 2 = 1
        ),
        merged AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
        SELECT coalesce(lang, '<pre-schema>') AS lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(length(text)) AS BIGINT) AS total_chars
        FROM merged
        GROUP BY 1
    """,
    eager=True,
)
def scan_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on read (`mergeSchema`): two parquet batches
    written with DIFFERENT schemas — v1 before the `lang` column
    existed, v2 after — land in one dataset directory; the merged scan
    unions the schemas and fills the missing column with NULL, exactly
    the add-a-column lifecycle a long-lived ingest sink goes through
    (reference R8's append sink accreting fields over time). The
    aggregate proves every v1 row surfaces with NULL lang and every v2
    row keeps its value. Batches split by doc_id parity —
    deterministic. At scale mergeSchema's footer-union runs on file
    METADATA (respect spark.sql.parquet.mergeSchema's cost by keeping
    schema count low, not file count); the data scan itself is
    unchanged columnar pruning."""
    d = table(spark, sf_dir, "documents")
    out = os.path.join(
        tempfile.mkdtemp(prefix="thsa_evo_"), "docs_evolving"
    )
    d.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text").write.mode(
        "overwrite"
    ).parquet(out)
    d.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "text", "lang"
    ).write.mode("append").parquet(out)
    merged = spark.read.option("mergeSchema", "true").parquet(out)
    return merged.groupBy(
        F.coalesce("lang", F.lit("<pre-schema>")).alias("lang")
    ).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.length("text")).cast("long").alias("total_chars"),
    )


@register(
    "scan_glob_filtered",
    sql="""
        SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
               round(sum(l_extendedprice), 2) AS sum_price
        FROM lineitem
        WHERE l_returnflag IN ('A', 'N')
        GROUP BY l_returnflag
    """,
    eager=True,
)
def scan_glob_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directory-layout-aware reading: a Hive-partitioned dataset
    (dir per l_returnflag, as sink_partitioned writes) read back with
    `recursiveFileLookup` OFF and a partition-dir GLOB — selecting the
    A and N partitions BY PATH, so the R partition's files are never
    listed, let alone read (the coarse-grained cousin of partition
    pruning: pruning trusts the catalog, the glob trusts the layout —
    what an ad-hoc reader over a foreign S3 layout actually does).
    basePath keeps the partition column recoverable from the path.
    The oracle filters relationally; matching proves glob selection ==
    predicate selection on a partition column."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_orderkey"
    )
    out = os.path.join(
        tempfile.mkdtemp(prefix="thsa_glob_"), "lineitem_by_flag"
    )
    li.write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
    back = spark.read.option("basePath", out).parquet(
        os.path.join(out, "l_returnflag={A,N}")
    )
    return back.groupBy("l_returnflag").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
    )


@register(
    "scan_metadata_columns",
    sql="""
        SELECT 'documents.parquet' AS file_name,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(0 AS BIGINT) AS min_idx,
               CAST(count(*) - 1 AS BIGINT) AS max_idx,
               CAST(count(*) AS BIGINT) AS n_idx_eq_id
        FROM documents
    """,
)
def scan_metadata_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hidden ``_metadata`` struct on file sources — provenance
    columns (file_name, row_index) every audit/debug pipeline leans on
    ("which file did this bad row come from?"). The query reads
    documents with ``_metadata.file_name`` and ``_metadata.row_index``
    and emits a per-file census: row count, index range, and how many
    physical row indices coincide with doc_id. The oracle goes through
    the driver's table views (it cannot pass read_parquet options), so
    it replays the MEASURED fixture property that documents are
    written id-dense in id order: indices must be exactly 0..n-1 and
    coincide with doc_id on every row — if Spark's scan metadata
    numbered or ordered rows any other way, every column here would
    mismatch. Metadata columns are generated at scan time from reader
    state — zero extra I/O, no shuffle beyond the per-file
    aggregate."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("_metadata.file_name").alias("file_name"),
        F.col("_metadata.row_index").alias("row_idx"),
    )
    return d.groupBy("file_name").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.min("row_idx").cast("long").alias("min_idx"),
        F.max("row_idx").cast("long").alias("max_idx"),
        F.sum(F.when(F.col("row_idx") == F.col("doc_id"), 1).otherwise(0))
        .cast("long")
        .alias("n_idx_eq_id"),
    )


@register(
    "scan_nested_pruning",
    sql="""
        SELECT doc_id,
               source AS meta_source,
               CAST(n_chars AS BIGINT) AS meta_chars,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS stat_tokens
        FROM documents
    """,
    eager=True,
)
def scan_nested_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-schema pruning: a parquet table with STRUCT columns read
    back selecting only two leaf fields of one struct and one of the
    other — the optimizer must prune the scan's ReadSchema down to
    exactly those LEAVES (nestedSchemaPruning), not drag whole structs
    (at 100 TB a metadata struct routinely carries the bulk of a row's
    bytes; reading meta.source but fetching all of meta is the classic
    silent 10x scan tax). The fixture nests the documents table into
    meta{source, lang, chars} + stats{tokens, first_token} structs,
    written once per process; the pruned read is plan-asserted in
    tests and the values reconcile against the flat source table
    (oracle recomputes from the original columns)."""
    import tempfile

    d = table(spark, sf_dir, "documents")
    key = (sf_dir, "nested_docs")
    path = _nested_dir_cache.get(key)
    if path is None:
        path = os.path.join(
            tempfile.mkdtemp(prefix="thsa_nested_"), "docs_nested"
        )
        nested = d.select(
            "doc_id",
            F.struct(
                F.col("source").alias("source"),
                F.col("lang").alias("lang"),
                F.col("n_chars").cast("long").alias("chars"),
            ).alias("meta"),
            F.struct(
                F.size(F.split("text", " ")).cast("long").alias("tokens"),
                F.element_at(F.split("text", " "), 1).alias("first_token"),
            ).alias("stats"),
        )
        nested.write.mode("overwrite").parquet(path)
        _nested_dir_cache[key] = path
    back = spark.read.parquet(path)
    return back.select(
        "doc_id",
        F.col("meta.source").alias("meta_source"),
        F.col("meta.chars").alias("meta_chars"),
        F.col("stats.tokens").alias("stat_tokens"),
    )


_nested_dir_cache: dict[tuple[str, str], str] = register_dir_cache({})


@register(
    "scan_csv_dialect",
    sql="""
        SELECT doc_id,
               CAST(length('"pre", ' || text || chr(10) || 'post\\tail')
                    AS BIGINT) AS n_chars,
               md5('"pre", ' || text || chr(10) || 'post\\tail')
                   AS content_md5
        FROM documents
        WHERE doc_id % 7 = 0
    """,
    eager=True,
)
def scan_csv_dialect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV DIALECT hardening — the failure modes that eat real crawl
    exports: field values containing the QUOTE character, the
    DELIMITER, the ESCAPE character, and embedded NEWLINES (a record
    spanning physical lines). Every document gets a hostile payload
    injected ('\"pre\", ' + text + '\\n' + 'post\\\\tail' — quote,
    comma, newline, and backslash in one field), is written through
    Spark's CSV sink (quote-wrapped, escaped), and read back with
    multiLine=true + matching quote/escape options; the oracle
    recomputes length and md5 of the SAME injected construction from
    the source table, so one flipped escape or a naive line-split
    shows up as a hash miss.

    Scale note: multiLine CSV is the one dialect feature that costs
    parallelism — a file with embedded newlines is NOT byte-range
    splittable, so Spark reads each file whole (here: the writer
    shards into many files, restoring file-level parallelism). That
    trade — per-file parallelism instead of per-split — is exactly
    what a 100 TB CSV ingest must plan for, and why the parquet scans
    everywhere else in this repo are the steady-state format."""
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 7 == 0)
    hostile = F.concat(
        F.lit('"pre", '), F.col("text"), F.lit("\npost\\tail")
    )
    src = docs.select("doc_id", hostile.alias("payload"))
    out = os.path.join(tempfile.mkdtemp(prefix="thsa_csvdialect_"), "docs_csv")
    (
        src.write.mode("overwrite")
        .options(header=True, quote='"', escape='"')
        .csv(out)
    )
    back = (
        spark.read.schema("doc_id long, payload string")
        .options(header=True, multiLine=True, quote='"', escape='"')
        .csv(out)
    )
    return back.select(
        "doc_id",
        F.length("payload").cast("long").alias("n_chars"),
        F.md5("payload").alias("content_md5"),
    )


@register(
    "scan_modified_after",
    sql="""
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM documents
        WHERE doc_id % 2 = 1
        GROUP BY lang
    """,
    eager=True,
)
def scan_modified_after(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MTIME-incremental ingest: the `modifiedAfter` scan option reads
    only files whose filesystem modification time is past a cutoff —
    the zero-state incremental pattern for pipelines that cannot keep
    a checkpoint (contrast stream_incremental_etl, which tracks
    per-file state): "process yesterday's drop" becomes one option on
    a batch read. Demonstrated deterministically: two file batches of
    the documents corpus land in one directory, the old batch's mtime
    is pinned to 2020 with os.utime (no wall-clock races), and the
    cutoff admits only the new batch — the oracle is the closed-form
    new-batch slice.

    Scale note: the filter runs in the driver-side FILE INDEX during
    listing — pruned files are never opened, so cost tracks the
    listing, not the data. The sharp edge a production user must
    know: mtime is storage-layer metadata (object stores rewrite it
    on copy), so modifiedAfter is a coarse gate, not an exactly-once
    contract — checkpointed file tracking remains the precise tool."""
    import time as _time

    docs = table(spark, sf_dir, "documents")
    out = os.path.join(tempfile.mkdtemp(prefix="thsa_mtime_"), "drops")
    old_dir, new_dir = os.path.join(out, "old"), os.path.join(out, "new")
    docs.filter(F.col("doc_id") % 2 == 0).write.mode("overwrite").parquet(
        old_dir
    )
    docs.filter(F.col("doc_id") % 2 == 1).write.mode("overwrite").parquet(
        new_dir
    )
    # modifiedAfter's cutoff string parses in the SESSION timezone, so
    # the old batch's mtime sits 2 full days below the nominal instant
    # — beyond any +-14 h timezone interpretation — instead of 1 s
    cutoff_s = 1577836800  # 2020-01-01T00:00:00Z
    old_mtime = cutoff_s - 2 * 86400
    for root, _dirs, files in os.walk(old_dir):
        for f in files:
            os.utime(os.path.join(root, f), (old_mtime, old_mtime))
    back = (
        spark.read.schema(docs.schema)
        .option("modifiedAfter", "2020-01-01T00:00:00")
        .option("recursiveFileLookup", "true")
        .parquet(out)
    )
    return back.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )

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

from ..io import table
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

#: events schema for the schema-on-read formats (CSV/JSON must never
#: infer: inference is an extra full scan AND can mistype at 100 TB).
_EVENTS_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
    "event_type STRING, value DOUBLE, props STRING"
)

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
            w.options(
                header=True, timestampFormat="yyyy-MM-dd HH:mm:ss.SSSSSS"
            ).csv(out)
        elif fmt == "json":
            w.options(timestampFormat="yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX").json(out)
        else:
            w.format(fmt).save(out)
        _FMT_CACHE[key] = out
    return _FMT_CACHE[key]


@register("scan_csv", sql=_EVENTS_ORACLE)
def scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source with an explicit schema (no inference scan). The
    reader is splittable — at 100 TB each executor reads its own byte
    range — and quoted fields cover the embedded-JSON `props` column.
    Value-exact vs the parquet original, including IEEE doubles."""
    path = _events_copy(spark, sf_dir, "csv")
    return (
        spark.read.schema(_EVENTS_SCHEMA)
        .options(header=True, timestampFormat="yyyy-MM-dd HH:mm:ss.SSSSSS")
        .csv(path)
    )


@register("scan_ndjson", sql=_EVENTS_ORACLE)
def scan_ndjson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-delimited JSON source with explicit schema — the batch twin
    of the streaming NDJSON tweet source (R1 analog). Schema-on-read
    with no inference; splittable by line."""
    path = _events_copy(spark, sf_dir, "json")
    return (
        spark.read.schema(_EVENTS_SCHEMA)
        .options(timestampFormat="yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
        .json(path)
    )


@register("scan_orc", sql=_EVENTS_ORACLE)
def scan_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC columnar source — same pushdown/pruning machinery as parquet
    (predicate pushdown via ORC row-group stats, vectorized reader).
    Exercised as a full-fidelity roundtrip of every events column."""
    path = _events_copy(spark, sf_dir, "orc")
    return spark.read.orc(path)

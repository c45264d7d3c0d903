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

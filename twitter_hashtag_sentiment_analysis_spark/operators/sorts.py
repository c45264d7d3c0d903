"""Sorts / limits / top-k (SURVEY §2B).

Spark's global sort is a range-shuffle (sampled boundaries) + per-
partition sort — no single-node bottleneck. Global ORDER BY + LIMIT k
collapses to TakeOrderedAndProject: each partition keeps k rows, the
driver merges n_partitions*k — safe at any scale for small k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table
from ..registry import register


@register(
    "sort_multikey",
    sql="""
        SELECT o_orderkey, o_orderstatus, o_totalprice,
               nullif(o_orderpriority, '3-MEDIUM') AS prio_or_null
        FROM orders
        ORDER BY o_orderstatus ASC,
                 o_totalprice DESC,
                 prio_or_null ASC NULLS LAST,
                 o_orderkey ASC
    """,
)
def sort_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with asc/desc and explicit NULLS LAST (nulls
    manufactured via nullif so the ordering rule is actually exercised).
    Unique final key (o_orderkey) makes the order fully deterministic."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            "o_orderstatus",
            "o_totalprice",
            F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM")).alias("prio_or_null"),
        )
        .orderBy(
            F.asc("o_orderstatus"),
            F.desc("o_totalprice"),
            F.asc_nulls_last("prio_or_null"),
            F.asc("o_orderkey"),
        )
    )


@register(
    "limit_topk",
    sql="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 100
    """,
)
def limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: ORDER BY + LIMIT -> TakeOrderedAndProject (per-
    partition heaps of size k, driver-side merge of n_part*k rows —
    never a full global sort). Tie-break on o_orderkey for determinism."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "sql_offset_limit",
    sql="""
        SELECT o_orderkey, o_custkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 20 OFFSET 40
    """,
)
def sql_offset_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT ... OFFSET (Spark 3.4+): keyset-free pagination — page 3
    of the revenue leaderboard. The total (o_totalprice DESC,
    o_orderkey) order makes the page deterministic, which is the
    entire correctness story of OFFSET pagination (an untied ORDER BY
    returns arbitrary pages). Spark plans the combination as a
    single TakeOrderedAndProject with offset — a bounded top-(60)
    heap per partition, never a global sort — so the classic 'OFFSET
    scans everything' warning applies to rows SKIPPED, not rows
    SORTED, and stays cheap while offset+limit is small."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 20 OFFSET 40
        """
    )

"""Set operations (SURVEY §2B).

Bag and set semantics over union-compatible inputs. Spark implements
UNION as a zero-shuffle concatenation of partitions; DISTINCT /
INTERSECT / EXCEPT shuffle on the full row hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table
from ..registry import register


def _high_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .select("o_custkey")
    )


def _urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )


@register(
    "set_union_all",
    sql="""
        SELECT o_custkey FROM orders WHERE o_totalprice > 300000
        UNION ALL
        SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union: pure partition concatenation, no shuffle at any scale."""
    return _high_value(spark, sf_dir).unionAll(_urgent(spark, sf_dir))


@register(
    "set_union_distinct",
    sql="""
        SELECT o_custkey FROM orders WHERE o_totalprice > 300000
        UNION
        SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union: concat + hash-distinct (one shuffle on the row hash)."""
    return _high_value(spark, sf_dir).union(_urgent(spark, sf_dir)).distinct()


@register(
    "set_intersect",
    sql="""
        SELECT o_custkey FROM orders WHERE o_totalprice > 300000
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersection (distinct semantics, matching SQL INTERSECT)."""
    return _high_value(spark, sf_dir).intersect(_urgent(spark, sf_dir))


@register(
    "set_except",
    sql="""
        SELECT o_custkey FROM orders WHERE o_totalprice > 300000
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference (EXCEPT, distinct semantics): keys present on the
    left and absent on the right, one copy each — Spark's
    ``subtract``, planned as a distinct + left-anti hash join on the
    row hash. The multiset twin (``EXCEPT ALL``) is
    ``set_except_all`` below; until round 7 this key duplicated that
    one (same exceptAll call, same oracle), so the distinct variant
    was registered nowhere — fixed by making this the DISTINCT
    semantics it always claimed."""
    return _high_value(spark, sf_dir).subtract(_urgent(spark, sf_dir))


@register(
    "set_intersect_all",
    sql="""
        SELECT o_custkey FROM orders WHERE o_totalprice > 300000
        INTERSECT ALL
        SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag intersection (INTERSECT ALL): keeps min(multiplicity) copies
    per key — the multiset semantics EXCEPT/INTERSECT DISTINCT lose.
    Spark plans this as one hash aggregate counting per-side
    multiplicities then replaying the minimum; one shuffle on the key,
    no join explosion."""
    return _high_value(spark, sf_dir).intersectAll(_urgent(spark, sf_dir))


@register(
    "set_except_all",
    sql="""
        SELECT o_custkey FROM orders WHERE o_totalprice > 300000
        EXCEPT ALL
        SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag difference (EXCEPT ALL): keeps max(0, left multiplicity -
    right multiplicity) copies per key — the incremental-load reconcile
    primitive ("what arrived that the last snapshot doesn't already
    account for, counting duplicates").  Completes the multiset pair
    with `set_intersect_all`; same plan shape: per-side multiplicity
    counts in ONE hash aggregate around a single key shuffle, replayed
    as a difference — never an anti-join per copy."""
    return _high_value(spark, sf_dir).exceptAll(_urgent(spark, sf_dir))


@register(
    "set_union_by_name",
    sql="""
        SELECT doc_id, lang,
               CAST(n_chars AS BIGINT) AS n_chars,
               CAST(NULL AS VARCHAR) AS source,
               'v1' AS batch
        FROM documents WHERE doc_id % 3 = 0
        UNION ALL
        SELECT doc_id, lang,
               CAST(NULL AS BIGINT) AS n_chars,
               source,
               'v2' AS batch
        FROM documents WHERE doc_id % 3 = 1
    """,
)
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCHEMA-EVOLUTION union: ``unionByName(allowMissingColumns=True)``
    aligns relations by COLUMN NAME and null-fills what either side
    lacks — how incremental ingest appends a new batch whose schema
    gained or lost columns without positional-union silent corruption
    (plain UNION matches by POSITION: a reordered column pair
    type-coerces or, worse, silently swaps — the classic ingest bug
    this operator exists to make impossible). Fixture: a v1 batch
    carrying n_chars but no source, a v2 batch carrying source but no
    n_chars; the result holds both columns with nulls where a batch
    lacked them.

    Scale shape: union is a zero-shuffle plan glue node — both legs
    scan in parallel and the null-fill is a projection; the read
    schemas stay pruned per leg (each parquet scan reads only its
    batch's columns)."""
    d = table(spark, sf_dir, "documents")
    v1 = d.filter(F.col("doc_id") % 3 == 0).select(
        "doc_id", "lang", "n_chars", F.lit("v1").alias("batch")
    )
    v2 = d.filter(F.col("doc_id") % 3 == 1).select(
        "doc_id", "lang", "source", F.lit("v2").alias("batch")
    )
    return v1.unionByName(v2, allowMissingColumns=True).select(
        "doc_id", "lang", "n_chars", "source", "batch"
    )

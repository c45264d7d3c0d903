"""Projections / filters / predicates (SURVEY §2B).

These generalize the reference's entire filtering surface: the
server-side ``languages=[lan]`` equality and ``track=[hashtag]`` keyword
containment (streamer.py:48) and the single-field projection
``json_data['text']`` (streamer.py:28).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table
from ..registry import register


@register(
    "project_alias",
    sql="""
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1 - l_discount) AS net,
               (l_extendedprice * (1 - l_discount)) * (1 + l_tax) AS charged
        FROM lineitem
    """,
)
def project_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed-column projection (R4 analog). Narrow op, no shuffle.

    Per-row doubles are emitted unrounded: both engines evaluate the
    identically-parenthesized IEEE expression, so values are
    bit-identical (rounding is reserved for order-sensitive aggregates).
    """
    li = table(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        net.alias("net"),
        (net * (1 + F.col("l_tax"))).alias("charged"),
    )


@register(
    "filter_eq_lang",
    sql="SELECT doc_id, lang, source FROM documents WHERE lang = 'en'",
)
def filter_eq_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality filter — the ``languages=['en']`` analog (ref
    streamer.py:48). Pushed to the parquet scan by Catalyst."""
    return (
        table(spark, sf_dir, "documents")
        .filter(F.col("lang") == "en")
        .select("doc_id", "lang", "source")
    )


@register(
    "filter_keyword_track",
    sql="""
        SELECT doc_id, n_chars FROM documents
        WHERE contains(lower(text), 'spark')
    """,
)
def filter_keyword_track(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive keyword containment — the ``track=[hashtag]``
    analog (ref streamer.py:48)."""
    return (
        table(spark, sf_dir, "documents")
        .filter(F.lower(F.col("text")).contains("spark"))
        .select("doc_id", "n_chars")
    )


@register(
    "filter_range_in_null",
    sql="""
        SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        FROM lineitem
        WHERE l_quantity >= 10 AND l_quantity < 40
          AND l_returnflag IN ('A', 'R')
          AND l_shipdate IS NOT NULL
          AND l_shipdate < TIMESTAMP '2001-06-01'
    """,
)
def filter_range_in_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range + IN + null predicates, all pushdown-eligible."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") >= 10)
        & (F.col("l_quantity") < 40)
        & F.col("l_returnflag").isin("A", "R")
        & F.col("l_shipdate").isNotNull()
        & (F.col("l_shipdate") < "2001-06-01")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")

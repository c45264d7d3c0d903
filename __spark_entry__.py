"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``twitter_hashtag_sentiment_analysis_spark.registry`` —
the package holds one source of truth per operator: the Spark
implementation and (where SQL-expressible) its DuckDB oracle string.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from twitter_hashtag_sentiment_analysis_spark.registry import load_all  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference pipeline's purpose as one batch query: language +
    keyword filter -> lexicon sentiment -> aggregate by source
    (SURVEY.md §7 Phase 0).
    """
    reg = load_all()
    return reg["flagship_sentiment_by_source"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query key (omitted => rows-only)."""
    return {name: q.sql for name, q in load_all().items() if q.sql is not None}

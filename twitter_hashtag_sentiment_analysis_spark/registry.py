"""Central query registry — the single source of truth behind
``__spark_entry__.py``'s ``queries()`` / ``oracle_sql()``.

Each operator from SURVEY.md §2B registers itself here with

* a callable ``(spark, sf_dir) -> DataFrame`` (the Spark-first impl), and
* optionally an ANSI-SQL string DuckDB can run on the same parquet views
  (the correctness oracle). ``sql=None`` => driver does a rows-only check
  (reserved for genuinely non-SQL-expressible ops).

Column names are the contract: every computed column is aliased
identically in the DataFrame code and the oracle SQL, floats are rounded
explicitly on both sides, and ordered queries carry a unique tie-break
key so hashes are deterministic.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    sql: str | None  # DuckDB oracle; None => rows-only check
    doc: str = ""


REGISTRY: dict[str, Query] = {}

# Modules that register queries on import (order = SURVEY §2B sections).
_QUERY_MODULES = (
    "twitter_hashtag_sentiment_analysis_spark.operators.scans",
    "twitter_hashtag_sentiment_analysis_spark.operators.filters",
    "twitter_hashtag_sentiment_analysis_spark.operators.joins",
    "twitter_hashtag_sentiment_analysis_spark.operators.aggregates",
    "twitter_hashtag_sentiment_analysis_spark.operators.subqueries",
    "twitter_hashtag_sentiment_analysis_spark.operators.timeseries",
    "twitter_hashtag_sentiment_analysis_spark.operators.windows",
    "twitter_hashtag_sentiment_analysis_spark.operators.sorts",
    "twitter_hashtag_sentiment_analysis_spark.operators.setops",
    "twitter_hashtag_sentiment_analysis_spark.operators.analytics",
    "twitter_hashtag_sentiment_analysis_spark.operators.maintenance",
    "twitter_hashtag_sentiment_analysis_spark.operators.quality",
    "twitter_hashtag_sentiment_analysis_spark.functions.families",
    "twitter_hashtag_sentiment_analysis_spark.functions.sentiment",
    "twitter_hashtag_sentiment_analysis_spark.functions.udfs",
    "twitter_hashtag_sentiment_analysis_spark.operators.dedup",
    "twitter_hashtag_sentiment_analysis_spark.operators.sampling",
    "twitter_hashtag_sentiment_analysis_spark.operators.similarity",
    "twitter_hashtag_sentiment_analysis_spark.operators.text_analysis",
    "twitter_hashtag_sentiment_analysis_spark.operators.multimodal",
    "twitter_hashtag_sentiment_analysis_spark.streaming.queries",
    "twitter_hashtag_sentiment_analysis_spark.sources.sinks",
    "twitter_hashtag_sentiment_analysis_spark.sources.pydatasource",
)

_loaded = False


def register(name: str, sql: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query key {name!r}")
        REGISTRY[name] = Query(name=name, fn=fn, sql=sql, doc=(fn.__doc__ or "").strip())
        return fn

    return deco


def load_all() -> dict[str, Query]:
    global _loaded
    if not _loaded:
        for mod in _QUERY_MODULES:
            importlib.import_module(mod)
        _loaded = True
    return REGISTRY

"""Engine-native sentiment scoring.

The reference enriches each micro-batched tweet with AWS Comprehend
``detect_sentiment`` — one HTTPS call per record — and then *discards*
the result (reference ``ProcessStreamData.py:21``, quirk R6-1 in
SURVEY.md §2A) with ``LanguageCode`` hard-coded ``'en'`` (quirk R6-2).

Here sentiment is a deterministic lexicon scorer over the text's
whitespace tokens, producing the same response shape Comprehend returns
(``Sentiment`` label + 4-way score struct):

* ``score_positive``  = #positive tokens / #tokens
* ``score_negative``  = #negative tokens / #tokens
* ``score_mixed``     = min(#pos, #neg) / #tokens
* ``score_neutral``   = 1 - (#pos + #neg) / #tokens
* ``sentiment``       = POSITIVE | NEGATIVE | MIXED (tie, nonzero) | NEUTRAL

Both quirks are fixed: the score is kept in-row, and the scorer is a pure
function of the text (callers thread the language filter through
explicitly, see ``streaming/pipeline.py``).

Two implementations with identical semantics:

1. ``with_sentiment`` — pure built-in column expressions (split/filter/
   size). JVM-side, whole-stage-codegen'd, zero Python boundary: the
   100 TB path. At cluster scale this is a narrow map — no shuffle.
2. ``sentiment_udf_row`` — a row-at-a-time Python UDF with the same
   semantics, registered as the SURVEY §2B ``udf_sentiment`` surface
   (and deliberately NOT used on any hot path).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..io import table
from ..registry import register

# Lexicon over the fixture vocabulary (FIXTURES.md: synthetic word soup).
POSITIVE_WORDS = ("fast", "small", "spark")
NEGATIVE_WORDS = ("slow", "big", "dup")

SENTIMENT_SCHEMA = T.StructType(
    [
        T.StructField("sentiment", T.StringType()),
        T.StructField("score_positive", T.DoubleType()),
        T.StructField("score_negative", T.DoubleType()),
        T.StructField("score_neutral", T.DoubleType()),
        T.StructField("score_mixed", T.DoubleType()),
    ]
)

_ROUND = 4  # fixed rounding so Spark and the DuckDB oracle hash identically


def _count_in(tokens: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(tokens, lambda t: t.isin(*words)))


def sentiment_columns(text: Column) -> dict[str, Column]:
    """Expression-form scorer: returns the five output columns."""
    tokens = F.split(text, " ")
    n = F.greatest(F.size(tokens), F.lit(1)).cast("double")
    pos = _count_in(tokens, POSITIVE_WORDS).cast("double")
    neg = _count_in(tokens, NEGATIVE_WORDS).cast("double")
    label = (
        F.when(pos > neg, F.lit("POSITIVE"))
        .when(neg > pos, F.lit("NEGATIVE"))
        .when((pos == neg) & (pos > 0), F.lit("MIXED"))
        .otherwise(F.lit("NEUTRAL"))
    )
    return {
        "sentiment": label,
        "score_positive": F.round(pos / n, _ROUND),
        "score_negative": F.round(neg / n, _ROUND),
        "score_neutral": F.round(F.lit(1.0) - (pos + neg) / n, _ROUND),
        "score_mixed": F.round(F.least(pos, neg) / n, _ROUND),
    }


def with_sentiment(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach sentiment columns (kept in-row — fixes reference quirk R6-1)."""
    return df.withColumns(sentiment_columns(F.col(text_col)))


def _round_half_up(x: float, digits: int = _ROUND) -> float:
    """Match Spark/DuckDB ROUND (half-up), not Python's banker's rounding."""
    scale = 10**digits
    return math.floor(x * scale + 0.5) / scale


def score_text(text: str) -> tuple[str, float, float, float, float]:
    """Driver-side reference implementation (shared by the row UDF and tests)."""
    tokens = text.split(" ") if text else []
    n = max(len(tokens), 1)
    pos = sum(1 for t in tokens if t in POSITIVE_WORDS)
    neg = sum(1 for t in tokens if t in NEGATIVE_WORDS)
    if pos > neg:
        label = "POSITIVE"
    elif neg > pos:
        label = "NEGATIVE"
    elif pos > 0:
        label = "MIXED"
    else:
        label = "NEUTRAL"
    return (
        label,
        _round_half_up(pos / n),
        _round_half_up(neg / n),
        _round_half_up(1.0 - (pos + neg) / n),
        _round_half_up(min(pos, neg) / n),
    )


def sentiment_udf_row():
    """Row UDF surface (SURVEY §2B ``udf_sentiment``). Slow path by design."""
    return F.udf(score_text, SENTIMENT_SCHEMA)


# ---------------------------------------------------------------------------
# DuckDB oracle SQL fragments, generated from the same lexicon constants so
# the two sides cannot drift.
# ---------------------------------------------------------------------------

def _sql_in_list(words: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in words)


def sentiment_sql_cte(table_name: str = "documents", text_col: str = "text") -> str:
    """A CTE body computing the same five columns in DuckDB SQL."""
    pos = f"len(list_filter(string_split({text_col}, ' '), t -> t IN ({_sql_in_list(POSITIVE_WORDS)})))"
    neg = f"len(list_filter(string_split({text_col}, ' '), t -> t IN ({_sql_in_list(NEGATIVE_WORDS)})))"
    n = f"greatest(len(string_split({text_col}, ' ')), 1)"
    return f"""
        SELECT *,
            CASE
                WHEN {pos} > {neg} THEN 'POSITIVE'
                WHEN {neg} > {pos} THEN 'NEGATIVE'
                WHEN {pos} = {neg} AND {pos} > 0 THEN 'MIXED'
                ELSE 'NEUTRAL'
            END AS sentiment,
            round({pos} / {n}, {_ROUND}) AS score_positive,
            round({neg} / {n}, {_ROUND}) AS score_negative,
            round(1.0 - ({pos} + {neg}) / {n}, {_ROUND}) AS score_neutral,
            round(least({pos}, {neg}) / {n}, {_ROUND}) AS score_mixed
        FROM {table_name}
    """


_SENT_COLS = "sentiment, score_positive, score_negative, score_neutral, score_mixed"


# ---------------------------------------------------------------------------
# Registered queries
# ---------------------------------------------------------------------------

@register(
    "flagship_sentiment_by_source",
    sql=f"""
        WITH scored AS ({sentiment_sql_cte()})
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               round(avg(score_positive), 4) AS avg_pos,
               round(avg(score_negative), 4) AS avg_neg,
               round(sum(CASE WHEN sentiment = 'POSITIVE' THEN 1 ELSE 0 END) * 1.0 / count(*), 4) AS pos_rate
        FROM scored
        WHERE lang = 'en' AND contains(lower(text), 'spark')
        GROUP BY source
        ORDER BY source
    """,
)
def flagship_sentiment_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: the reference pipeline's purpose as one batch query —
    filter by language + keyword (ref streamer.py:48), score sentiment
    (ref ProcessStreamData.py:21), aggregate by source.

    Scale notes: narrow filter+map (pushdown-able), then a single
    hash-aggregate shuffle on `source`; partial aggregation map-side.
    """
    docs = table(spark, sf_dir, "documents")
    scored = with_sentiment(
        docs.filter((F.col("lang") == "en") & F.lower(F.col("text")).contains("spark"))
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("score_positive"), 4).alias("avg_pos"),
            F.round(F.avg("score_negative"), 4).alias("avg_neg"),
            F.round(
                F.sum(F.when(F.col("sentiment") == "POSITIVE", 1).otherwise(0))
                / F.count("*"),
                4,
            ).alias("pos_rate"),
        )
        .orderBy("source")
    )


@register(
    "sentiment_expr",
    sql=f"""
        WITH scored AS ({sentiment_sql_cte()})
        SELECT doc_id, {_SENT_COLS} FROM scored
    """,
)
def sentiment_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expression-form sentiment over every document (the 100 TB path:
    pure built-in functions, whole-stage codegen, no Python boundary)."""
    return with_sentiment(table(spark, sf_dir, "documents")).select(
        "doc_id", "sentiment", "score_positive", "score_negative", "score_neutral", "score_mixed"
    )


@register(
    "udf_sentiment",
    sql=f"""
        WITH scored AS ({sentiment_sql_cte()})
        SELECT doc_id, {_SENT_COLS} FROM scored
    """,
)
def udf_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-UDF sentiment surface (ref ProcessStreamData.py:12-33 analog).

    Same semantics as ``sentiment_expr`` — the oracle proves it. Kept as
    the UDF-surface demonstration; hot paths use the expression form.
    """
    docs = table(spark, sf_dir, "documents")
    s = sentiment_udf_row()(F.col("text")).alias("s")
    return docs.select("doc_id", s).select("doc_id", "s.*")

"""Sentiment scorer: expression form == row-UDF form == python reference.

Regression against the reference's quirks (SURVEY §2A R6): score must
survive into the output row (quirk 1), and the scorer is a pure function
usable for any language slice (quirk 2).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from twitter_hashtag_sentiment_analysis_spark.functions.sentiment import (
    score_text,
    sentiment_udf_row,
    with_sentiment,
)


def test_score_text_labels():
    assert score_text("fast fast slow")[0] == "POSITIVE"
    assert score_text("slow slow fast")[0] == "NEGATIVE"
    assert score_text("fast slow")[0] == "MIXED"
    assert score_text("table scan")[0] == "NEUTRAL"
    assert score_text("")[0] == "NEUTRAL"


def test_scores_sum_to_one_ish():
    label, p, n, neu, m = score_text("fast slow table")
    # scores are rounded to 4 decimals, so the identity holds to ~1e-3
    assert abs(p + n + neu - 1.0) < 1e-3


def test_expression_matches_udf(spark):
    rows = [("fast small slow table",), ("slow big dup",), ("scan merge",), ("spark",)]
    df = spark.createDataFrame(rows, ["text"])
    expr = with_sentiment(df).select(
        "text", "sentiment", "score_positive", "score_negative", "score_neutral", "score_mixed"
    )
    udf = df.select("text", sentiment_udf_row()(F.col("text")).alias("s")).select("text", "s.*")
    assert sorted(map(tuple, expr.collect())) == sorted(map(tuple, udf.collect()))


def test_sentiment_kept_in_row(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    out = with_sentiment(docs)
    # every input column survives + the five sentiment columns (fixes R6-1)
    assert set(docs.columns) | {
        "sentiment",
        "score_positive",
        "score_negative",
        "score_neutral",
        "score_mixed",
    } == set(out.columns)
    assert out.filter(F.col("sentiment").isNull()).count() == 0


def test_mllib_classifier_learns_the_lexicon(spark, sf_dir):
    """The MLlib distant-supervision pipeline must reproduce its
    lexicon teacher almost perfectly on the train distribution (the
    label is a thresholded linear function of token counts, which
    logistic regression on token features can represent) — and must be
    deterministic: two fits from the same bounded sample give the same
    report."""
    from twitter_hashtag_sentiment_analysis_spark.ml import (
        sentiment_agreement_report,
    )
    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    reg = load_all()
    a = sentiment_agreement_report(spark, sf_dir).collect()
    n_docs = sum(r["n_docs"] for r in a)
    n_agree = sum(r["n_agree"] for r in a)
    assert n_agree / n_docs >= 0.95, (n_agree, n_docs)
    b = sentiment_agreement_report(spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # Registered oracle-gated surface: every per-source floor boolean
    # must be TRUE (that IS the driver contract).
    gated = reg["ml_sentiment_mllib"].fn(spark, sf_dir).collect()
    assert gated and all(r["agreement_floor_met"] for r in gated)

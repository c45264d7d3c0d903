"""MLlib sentiment classification — the north star's "MLlib/UDF for
sentiment" clause (BASELINE.json `spark_approach`) made concrete.

The reference outsources sentiment to AWS Comprehend, one HTTPS call
per record (reference ``ProcessStreamData.py:16-21``); the UDF and
expression scorers (functions/sentiment.py) replace that call. This
module adds the LEARNED path: distant supervision, the standard way a
pipeline bootstraps a classifier without human labels — the
deterministic lexicon scorer labels the corpus, and an MLlib pipeline
(RegexTokenizer → HashingTF → LogisticRegression) learns those labels
back from raw token counts. The returned report is the per-source
train-set agreement between the learned model and its teacher, i.e.
the sanity check a real pipeline runs before trusting the model on
unlabeled data.

Scale design (100 TB): training follows the `sim_ann_ivf_trained`
pattern — the fit() set is a BOUNDED hash-priority sample
(TakeOrderedAndProject on md5(doc_id), ML_TRAIN_CAP rows, coalesced to
one partition so LBFGS's treeAggregate sums gradients in a fixed order
= deterministic coefficients), while SCORING is model.transform, a
narrow per-row map that distributes over any corpus size. Features are
HashingTF over ML_NUM_FEATURES buckets — the fixture vocabulary is ~40
words, so 256 buckets are collision-free in practice and keep the
coefficient vector broadcast-sized.

Rows-only by design: LBFGS is an iterative float fixpoint DuckDB cannot
replay (same class as `graph_pagerank`); the semantic contract is the
agreement-floor property test (tests/test_sentiment.py) instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.sentiment import sentiment_columns
from .io import table
from .registry import register

#: Bounded training-set size (hash-priority sample, like IVF training).
ML_TRAIN_CAP = 4096
#: HashingTF bucket count — generous for the ~40-word fixture vocab.
ML_NUM_FEATURES = 256


@register("ml_sentiment_mllib", sql=None)
def ml_sentiment_mllib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distant-supervision sentiment: lexicon-label the corpus, fit
    RegexTokenizer → HashingTF → LogisticRegression on a bounded
    deterministic sample, score every document distributed, and report
    per-source agreement with the teacher. POSITIVE-vs-rest binary
    target (the lexicon label is a thresholded linear function of token
    counts, so the linear model can represent it exactly)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, RegexTokenizer

    docs = table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    labeled = docs.withColumn(
        "label",
        (sentiment_columns(F.col("text"))["sentiment"] == "POSITIVE").cast(
            "double"
        ),
    )

    # Bounded, deterministic, class-blind training sample: top
    # ML_TRAIN_CAP docs by md5(doc_id) — a TakeOrderedAndProject at any
    # corpus size — on ONE partition so gradient aggregation order (and
    # therefore every coefficient) is run-to-run identical.
    train = (
        labeled.orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
        .limit(ML_TRAIN_CAP)
        .coalesce(1)
    )

    pipeline = Pipeline(
        stages=[
            RegexTokenizer(
                inputCol="text", outputCol="tokens", pattern=" ", gaps=True
            ),
            HashingTF(
                inputCol="tokens",
                outputCol="features",
                numFeatures=ML_NUM_FEATURES,
            ),
            # each LBFGS iteration is a scheduled Spark job; the
            # separable lexicon target converges in single digits, so
            # cap iterations rather than paying scheduler overhead for
            # refinement the 4-decimal report can't see
            LogisticRegression(
                maxIter=10, regParam=1e-4, standardization=False
            ),
        ]
    )
    model = pipeline.fit(train)

    scored = model.transform(labeled)
    agree = (F.col("prediction") == F.col("label")).cast("long")
    return (
        scored.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(agree).alias("n_agree"),
            F.round(F.avg(agree), 4).alias("agreement"),
        )
        .orderBy("source")
    )

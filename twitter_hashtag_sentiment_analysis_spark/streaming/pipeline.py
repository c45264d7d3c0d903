"""The reference pipeline (SURVEY §2A R1-R8) as one Structured
Streaming job.

Reference dataflow (streamer.py + stream_processor.py + ProcessStreamData.py):

    Twitter push source                      -> file/NDJSON stream source (R1)
    server-side lang + keyword filter        -> Catalyst-pushed filters (R2)
    json.loads / project text                -> explicit schema read (R3, R4)
    Firehose 3 MB / 60 s buffer              -> trigger(processingTime=60s) (R5)
    Lambda + Comprehend per record           -> lexicon sentiment columns (R6)
    json.dumps + '\\n' framing               -> JSON sink (R7)
    S3 append objects, date-prefixed         -> partitionBy(ingest_date) + checkpoint (R8)

Improvements over the reference, both deliberate:
* sentiment survives into the sink record (fixes quirk R6-1 — the
  reference printed the Comprehend result to CloudWatch and dropped it,
  ProcessStreamData.py:21),
* exactly-once delivery via checkpoint + file-sink commit log vs
  Firehose's at-least-once (stream_processor.py:310-311).

The transform is a pure DataFrame->DataFrame function, so the exact
same code runs in batch mode for the DuckDB oracle (Structured
Streaming's batch-equivalence property).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ..functions.sentiment import with_sentiment

#: Wire schema of the tweet NDJSON drops (FIXTURES.md §B) — the fields
#: the reference touches (streamer.py:26-28, 48).
TWEET_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("created_at", T.TimestampType()),
    ]
)

DEFAULT_TRIGGER_SECONDS = 60  # Firehose buffer parity (stream_processor.py:295-297)


def read_tweet_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """R1+R3: file stream source over NDJSON drops with an explicit
    schema (no inference — the reference's ad-hoc key access made
    typed)."""
    return spark.readStream.schema(TWEET_SCHEMA).json(input_dir)


def transform(df: DataFrame, lang: str, keyword: str) -> DataFrame:
    """R2+R4+R6: the per-record pipeline as pure column expressions.

    Language is a parameter (fixes quirk R6-2: the reference filtered by
    a user-chosen language but scored with LanguageCode='en',
    app.py:10 vs ProcessStreamData.py:21). Works identically on batch
    and streaming inputs.
    """
    out = df.filter(F.col("lang") == lang)
    if keyword:
        out = out.filter(F.lower(F.col("text")).contains(keyword.lower()))
    return with_sentiment(out)


def start_pipeline(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    lang: str = "en",
    keyword: str = "",
    trigger_seconds: int = DEFAULT_TRIGGER_SECONDS,
    available_now: bool = False,
) -> StreamingQuery:
    """R5+R7+R8: micro-batched, newline-delimited JSON, date-partitioned
    append sink with exactly-once checkpointing."""
    enriched = transform(read_tweet_stream(spark, input_dir), lang, keyword)
    sink_df = enriched.withColumn("ingest_date", F.current_date())
    writer = (
        sink_df.writeStream.outputMode("append")
        .format("json")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("ingest_date")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()

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

#: Reference R9: the corrupt-record column PERMISSIVE mode fills for
#: lines that fail to parse (streamer.py:32-33 swallows bad records;
#: we surface them instead).
CORRUPT_COL = "_corrupt_record"

TWEET_SCHEMA_PERMISSIVE = T.StructType(
    TWEET_SCHEMA.fields + [T.StructField(CORRUPT_COL, T.StringType())]
)

DEFAULT_TRIGGER_SECONDS = 60  # Firehose buffer parity (stream_processor.py:295-297)


def read_tweet_stream(
    spark: SparkSession,
    input_dir: str,
    permissive: bool = False,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """R1+R3: file stream source over NDJSON drops with an explicit
    schema (no inference — the reference's ad-hoc key access made
    typed). With ``permissive=True``, malformed lines survive the read
    carrying their raw text in ``_corrupt_record`` (R9: the reference's
    on_error path, streamer.py:32-33) instead of being silently nulled.

    ``max_files_per_trigger`` caps how much data one micro-batch
    ingests — Spark's per-source rate limit, and the closest
    demonstrable analog of the reference's SIZE-based Firehose flush
    bound (3 MB or 60 s, whichever first — stream_processor.py:317-324):
    with fixed-size input drops, "at most N files per batch" IS a byte
    bound on batch size, enforced at the source the way Firehose
    enforces it at the buffer. Spark's trigger contributes the time
    bound; the two knobs together reproduce the reference's
    size-AND-time contract (SURVEY §4).
    """
    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if not permissive:
        return reader.schema(TWEET_SCHEMA).json(input_dir)
    return (
        reader.schema(TWEET_SCHEMA_PERMISSIVE)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(input_dir)
    )


def read_tweet_socket(spark: SparkSession, host: str, port: int) -> DataFrame:
    """R1 as a true PUSH source: newline-framed tweet JSON over a TCP
    socket (the closest OSS Spark analog of the reference's long-lived
    Twitter stream push, streamer.py:44-48 — there is no open-source
    Kinesis connector, see README). Lines parse against TWEET_SCHEMA
    via from_json; unparseable lines yield a row of nulls with the raw
    line preserved in _corrupt_record, matching the file path's R9
    semantics."""
    lines = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )
    parsed = lines.select(
        F.from_json("value", TWEET_SCHEMA).alias("t"), F.col("value")
    )
    return parsed.select(
        "t.*",
        F.when(F.col("t").isNull() | F.col("t.id").isNull(), F.col("value"))
        .alias(CORRUPT_COL),
    )


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
    quarantine_dir: str | None = None,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """R5+R7+R8: micro-batched, newline-delimited JSON, date-partitioned
    append sink with exactly-once checkpointing.

    With ``quarantine_dir`` set, the read is PERMISSIVE and a second
    query routes malformed lines (raw text + ingest timestamp) to an
    NDJSON quarantine sink with its own checkpoint — R9 made auditable
    instead of the reference's log-and-drop (stream_processor.py:181-186).
    The quarantine query is exposed as ``.quarantine_query`` on the
    returned handle; both drain under availableNow.

    ``max_files_per_trigger`` bounds each micro-batch's input at the
    source (see read_tweet_stream) — combined with the trigger interval
    this is the reference's "3 MB or 60 s, whichever first" Firehose
    buffer contract in Spark's model.
    """
    quarantine_query = None
    if quarantine_dir is None:
        source = read_tweet_stream(
            spark, input_dir, max_files_per_trigger=max_files_per_trigger
        )
    else:
        raw = read_tweet_stream(
            spark,
            input_dir,
            permissive=True,
            max_files_per_trigger=max_files_per_trigger,
        )
        source = raw.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
        # the quarantine record keeps the parsed id alongside the raw
        # line (null on a full parse failure, set on a partial one) —
        # also satisfies Spark's QUERY_ONLY_CORRUPT_RECORD_COLUMN rule,
        # which rejects plans referencing only the corrupt column
        bad = (
            raw.filter(F.col(CORRUPT_COL).isNotNull())
            .select(
                F.col("id"),
                F.col(CORRUPT_COL).alias("raw_line"),
                F.current_timestamp().alias("quarantined_at"),
            )
        )
        qwriter = (
            bad.writeStream.outputMode("append")
            .format("json")
            .option("path", quarantine_dir)
            .option("checkpointLocation", checkpoint_dir + "_quarantine")
        )
        if available_now:
            qwriter = qwriter.trigger(availableNow=True)
        else:
            qwriter = qwriter.trigger(processingTime=f"{trigger_seconds} seconds")
        quarantine_query = qwriter.start()
    enriched = transform(source, lang, keyword)
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
    query = writer.start()
    query.quarantine_query = quarantine_query
    return query

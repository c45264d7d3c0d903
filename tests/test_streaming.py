"""End-to-end tests of the R1-R8 pipeline and real streamed windows.

Fixture: NDJSON tweet drops (FIXTURES.md §B) — the reference's wire
format (streamer.py:26 parses tweet JSON; S3 receives NDJSON,
ProcessStreamData.py:25-30).
"""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from twitter_hashtag_sentiment_analysis_spark.streaming.pipeline import (
    TWEET_SCHEMA,
    start_pipeline,
    transform,
)

TWEETS = [
    {"id": 1, "text": "spark is fast fast", "lang": "en", "created_at": "2024-01-01T00:00:05"},
    {"id": 2, "text": "spark feels slow slow today", "lang": "en", "created_at": "2024-01-01T00:10:00"},
    {"id": 3, "text": "no keyword here", "lang": "en", "created_at": "2024-01-01T00:20:00"},
    {"id": 4, "text": "spark rápido", "lang": "es", "created_at": "2024-01-01T01:00:00"},
    {"id": 5, "text": "Spark mixed fast slow", "lang": "en", "created_at": "2024-01-01T01:30:00"},
]


@pytest.fixture()
def tweet_dir(tmp_path):
    d = tmp_path / "drops"
    d.mkdir()
    with open(d / "batch0.json", "w") as f:
        for t in TWEETS:
            f.write(json.dumps(t) + "\n")
    return str(d)


def test_pipeline_end_to_end(spark, tweet_dir, tmp_path):
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    q = start_pipeline(
        spark, tweet_dir, out, ck, lang="en", keyword="spark", available_now=True
    )
    q.awaitTermination(120)

    # sink is newline-delimited JSON, date-partitioned (R7+R8)
    part_dirs = glob.glob(os.path.join(out, "ingest_date=*"))
    assert part_dirs, os.listdir(out)

    rows = {}
    for path in glob.glob(os.path.join(out, "ingest_date=*", "*.json")):
        with open(path) as f:
            for line in f:
                rec = json.loads(line)
                rows[rec["id"]] = rec

    # lang filter (R2) + keyword filter (R2) applied: ids 1, 2, 5 only
    assert set(rows) == {1, 2, 5}
    # sentiment survives into the sink record (fixes reference quirk R6-1)
    assert rows[1]["sentiment"] == "POSITIVE"
    assert rows[2]["sentiment"] == "NEGATIVE"
    assert rows[5]["sentiment"] == "MIXED"
    for rec in rows.values():
        assert {"score_positive", "score_negative", "score_neutral", "score_mixed"} <= set(rec)


def test_pipeline_exactly_once_on_restart(spark, tweet_dir, tmp_path):
    """Restarting from the same checkpoint must not duplicate records
    (the upgrade over Firehose's at-least-once)."""
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    for _ in range(2):  # second run restarts from the checkpoint
        q = start_pipeline(
            spark, tweet_dir, out, ck, lang="en", keyword="spark", available_now=True
        )
        q.awaitTermination(120)
    ids = []
    for path in glob.glob(os.path.join(out, "ingest_date=*", "*.json")):
        with open(path) as f:
            ids += [json.loads(line)["id"] for line in f]
    assert sorted(ids) == [1, 2, 5]


def test_transform_is_batch_stream_equivalent(spark, tweet_dir):
    """The same transform over the same rows, batch vs stream, agrees."""
    batch = spark.read.schema(TWEET_SCHEMA).json(tweet_dir)
    expected = sorted(
        tuple(r) for r in transform(batch, "en", "spark").select("id", "sentiment").collect()
    )

    stream = spark.readStream.schema(TWEET_SCHEMA).json(tweet_dir)
    q = (
        transform(stream, "en", "spark")
        .select("id", "sentiment")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("equiv_check")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(tuple(r) for r in spark.table("equiv_check").collect())
    assert got == expected


def test_windowed_stream_over_events(spark, sf_dir, tmp_path):
    """Tumbling window agg as a REAL stream over events matches batch."""
    from twitter_hashtag_sentiment_analysis_spark.io import table

    ev = table(spark, sf_dir, "events")
    ev.write.mode("overwrite").parquet(str(tmp_path / "ev"))
    stream = spark.readStream.schema(ev.schema).parquet(str(tmp_path / "ev"))
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .count()
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_check")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = spark.table("win_check").count()
    batch = ev.groupBy(F.window("ts", "1 hour"), "event_type").count().count()
    assert streamed == batch

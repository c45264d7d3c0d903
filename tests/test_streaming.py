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


def test_rate_limited_source_bounds_each_micro_batch(spark, tmp_path):
    """maxFilesPerTrigger=1 over fixed-size drops is the reference's
    SIZE-based Firehose flush bound (3 MB or 60 s, stream_processor.py:
    317-324) in Spark's model: every micro-batch ingests at most one
    drop's worth of bytes, so N drops drain as N bounded batches, and
    no record is lost or duplicated across them."""
    d = tmp_path / "drops"
    d.mkdir()
    n_files, rows_per_file = 4, 2
    for fi in range(n_files):
        with open(d / f"drop{fi}.json", "w") as f:
            for ri in range(rows_per_file):
                i = fi * rows_per_file + ri
                f.write(
                    json.dumps(
                        {
                            "id": i,
                            "text": "spark fast",
                            "lang": "en",
                            "created_at": f"2024-01-01T00:{i:02d}:00",
                        }
                    )
                    + "\n"
                )
    out = str(tmp_path / "out")
    q = start_pipeline(
        spark,
        str(d),
        out,
        str(tmp_path / "ck"),
        lang="en",
        keyword="spark",
        available_now=True,
        max_files_per_trigger=1,
    )
    q.awaitTermination(120)
    batches = [p for p in q.recentProgress if p["numInputRows"] > 0]
    # one bounded batch per drop, each capped at a single file's rows
    assert len(batches) == n_files, [p["numInputRows"] for p in q.recentProgress]
    assert all(p["numInputRows"] == rows_per_file for p in batches)
    ids = []
    for path in glob.glob(os.path.join(out, "ingest_date=*", "*.json")):
        with open(path) as f:
            ids += [json.loads(line)["id"] for line in f]
    assert sorted(ids) == list(range(n_files * rows_per_file))


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


def _read_sink_ids(out: str) -> list[int]:
    ids = []
    for path in glob.glob(os.path.join(out, "ingest_date=*", "*.json")):
        with open(path) as f:
            ids += [json.loads(line)["id"] for line in f]
    return sorted(ids)


def test_pipeline_quarantines_malformed_records(spark, tmp_path):
    """R9: malformed NDJSON lines survive the read and land in the
    quarantine sink with their raw text; good rows flow to the main
    sink (the reference's on_error swallows them, streamer.py:32-33)."""
    d = tmp_path / "drops"
    d.mkdir()
    with open(d / "batch0.json", "w") as f:
        f.write(json.dumps(TWEETS[0]) + "\n")
        f.write("{this is not json\n")
        f.write(json.dumps(TWEETS[1]) + "\n")
        f.write('"a bare string, not an object"\n')
    out, ck, quar = (str(tmp_path / n) for n in ("out", "ck", "quar"))
    q = start_pipeline(
        spark, str(d), out, ck,
        lang="en", keyword="spark", available_now=True, quarantine_dir=quar,
    )
    q.awaitTermination(120)
    q.quarantine_query.awaitTermination(120)

    assert _read_sink_ids(out) == [1, 2]
    bad = []
    for path in glob.glob(os.path.join(quar, "*.json")):
        with open(path) as f:
            bad += [json.loads(line) for line in f]
    assert sorted(r["raw_line"] for r in bad) == [
        '"a bare string, not an object"',
        "{this is not json",
    ]
    assert all("quarantined_at" in r for r in bad)


def test_pipeline_processing_time_trigger_multiple_batches(spark, tweet_dir, tmp_path):
    """The reference's defining runtime behavior is the 60 s micro-batch
    buffer (stream_processor.py:295-297). Run the real processingTime
    trigger (scaled to 1 s), drop a second file mid-stream, and assert a
    second micro-batch commits."""
    from twitter_hashtag_sentiment_analysis_spark.streaming.observe import (
        wait_until_active,
    )

    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    q = start_pipeline(
        spark, tweet_dir, out, ck, lang="en", keyword="spark", trigger_seconds=1
    )
    try:
        assert wait_until_active(q, 60)
        q.processAllAvailable()
        assert _read_sink_ids(out) == [1, 2, 5]
        with open(os.path.join(tweet_dir, "batch1.json"), "w") as f:
            f.write(
                json.dumps(
                    {"id": 6, "text": "late spark tweet", "lang": "en",
                     "created_at": "2024-01-01T02:00:00"}
                ) + "\n"
            )
        q.processAllAvailable()
        assert _read_sink_ids(out) == [1, 2, 5, 6]
        batches = {p["batchId"] for p in q.recentProgress if p["numInputRows"] > 0}
        assert len(batches) >= 2, q.recentProgress
    finally:
        q.stop()


def test_progress_listener_observes_microbatches(spark, tweet_dir, tmp_path):
    """R10 analog: per-micro-batch progress events via the listener
    surface (the reference polls describe_delivery_stream + CloudWatch,
    stream_processor.py:356-378)."""
    from twitter_hashtag_sentiment_analysis_spark.streaming.observe import (
        ProgressCapture,
    )

    cap = ProgressCapture.attach(spark)
    try:
        out = str(tmp_path / "out")
        ck = str(tmp_path / "ck")
        q = start_pipeline(
            spark, tweet_dir, out, ck, lang="en", keyword="spark", available_now=True
        )
        q.awaitTermination(120)
        # NB: numInputRows counts rows surviving pushdown — the lang
        # filter reaches the JSON scan, so the es tweet never enters
        assert cap.wait_for_rows(1, timeout=60), cap.events
        assert any(e.num_input_rows > 0 and e.batch_id >= 0 for e in cap.events)
    finally:
        cap.detach(spark)


def test_socket_push_source_parses_tweets(spark):
    """R1 as a true push source: NDJSON over TCP, parsed against
    TWEET_SCHEMA, malformed lines flagged in _corrupt_record."""
    import socket
    import threading

    from twitter_hashtag_sentiment_analysis_spark.streaming.pipeline import (
        read_tweet_socket,
    )

    lines = [json.dumps(TWEETS[0]), "not json at all", json.dumps(TWEETS[1])]
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def serve():
        conn, _ = srv.accept()
        with conn:
            conn.sendall(("\n".join(lines) + "\n").encode())
            # keep the connection up while the stream drains
            import time as _t

            _t.sleep(8)

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    sdf = read_tweet_socket(spark, "127.0.0.1", port)
    q = (
        sdf.writeStream.outputMode("append")
        .format("memory")
        .queryName("socket_check")
        .start()
    )
    try:
        import time as _t

        deadline = _t.monotonic() + 60
        while _t.monotonic() < deadline:
            if spark.table("socket_check").count() >= 3:
                break
            _t.sleep(0.5)
        rows = spark.table("socket_check").collect()
    finally:
        q.stop()
        srv.close()
    by_id = {r["id"]: r for r in rows if r["id"] is not None}
    assert set(by_id) == {1, 2}
    assert all(r["_corrupt_record"] is None for r in by_id.values())
    bad = [r for r in rows if r["id"] is None]
    assert len(bad) == 1 and bad[0]["_corrupt_record"] == "not json at all"


def test_windowed_stream_over_events(spark, sf_dir, tmp_path):
    """Tumbling window agg as a REAL stream over events matches batch."""
    from twitter_hashtag_sentiment_analysis_spark.io import table
    from twitter_hashtag_sentiment_analysis_spark.streaming.queries import (
        _watermarkable,
    )

    ev = _watermarkable(table(spark, sf_dir, "events"))
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


def test_stateful_counter_state_survives_batches(spark, tmp_path):
    """applyInPandasWithState must CARRY state across micro-batches:
    two file drops processed as separate batches (maxFilesPerTrigger=1)
    for the same user must yield a cumulative count, not per-batch
    resets."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    d = tmp_path / "ev"
    d.mkdir()
    rows0 = [(1, 10), (2, 10), (3, 20)]
    rows1 = [(4, 10), (5, 20), (6, 10)]
    for i, rows in enumerate((rows0, rows1)):
        spark.createDataFrame(rows, "event_id long, user_id long").coalesce(
            1
        ).write.parquet(str(d / f"drop{i}"))
    # one directory with both drops' files
    files = str(tmp_path / "merged")
    spark.read.parquet(str(d / "drop0")).write.mode("overwrite").parquet(files)
    spark.read.parquet(str(d / "drop1")).write.mode("append").parquet(files)

    def update(key, pdfs, state: GroupState):
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n]})

    stream = (
        spark.readStream.schema("event_id long, user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(files)
    )
    counted = stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id bigint, n_events bigint",
        stateStructType="n bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = f"statetest_{os.getpid()}"
    q = (
        counted.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    final = {
        r["user_id"]: r["n_events"]
        for r in spark.table(name)
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
        .collect()
    }
    # user 10: 2 events per drop (ids 1,2 then 4,6) -> cumulative 4
    assert final == {10: 4, 20: 2}
    # cumulative, not reset: user 10 must emit a growing count across
    # >=2 batches (2 after drop0's file, 4 after drop1's)
    per_batch = sorted(
        r["n_events"]
        for r in spark.table(name).filter(F.col("user_id") == 10).collect()
    )
    assert per_batch == [2, 4]


def test_update_mode_reemits_across_batches(spark, sf_dir):
    """The multi-file maxFilesPerTrigger=1 stream must produce MULTIPLE
    micro-batches, each re-emitting changed keys in update mode — the
    accumulated memory sink therefore holds more rows than there are
    keys (re-emission), and max(n) per key equals the batch count."""
    from twitter_hashtag_sentiment_analysis_spark.streaming.queries import (
        _multibatch_stream,
        _run_to_memory,
    )
    from pyspark.sql import functions as F

    sdf = _multibatch_stream(spark, sf_dir, "events")
    counts = sdf.groupBy("event_type").agg(F.count("*").alias("n"))
    name = _run_to_memory(counts, "upd_test", output_mode="update")
    sink = spark.table(name)
    n_keys = sink.select("event_type").distinct().count()
    assert sink.count() > n_keys, "no re-emission: stream ran as one batch"
    batch = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("event_type")
        .count()
    )
    final = {r["event_type"]: r["n"] for r in
             sink.groupBy("event_type").agg(F.max("n").alias("n")).collect()}
    expect = {r["event_type"]: r["count"] for r in batch.collect()}
    assert final == expect


def test_socket_pipe_query_is_deterministic(spark, sf_dir):
    """The registered push-source pipeline drains the full deterministic
    corpus: 27 parsed tweets in a lang/sentiment lattice + 3 planted
    corrupt lines carried through R9 quarantine semantics."""
    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    reg = load_all()
    rows = {
        (r["lang"], r["sentiment"]): r["n"]
        for r in reg["stream_socket_pipe"].fn(spark, sf_dir).collect()
    }
    assert rows == {
        ("_corrupt", "NEUTRAL"): 3,
        ("de", "NEUTRAL"): 9,
        ("en", "POSITIVE"): 9,
        ("es", "NEGATIVE"): 9,
    }


def test_trending_terms_multibatch_converges_to_batch_counts(spark, sf_dir):
    """The update-mode drain re-emits keys across its micro-batches;
    max-compaction must recover exactly the batch top-3 per source."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from twitter_hashtag_sentiment_analysis_spark.io import table
    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    got = {
        (r.source, r.token): (r.n, r.rk)
        for r in load_all()["stream_trending_terms"].fn(spark, sf_dir).collect()
    }
    batch = (
        table(spark, sf_dir, "documents")
        .select("source", F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("source", "token")
        .count()
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("source").orderBy(
                    F.col("count").desc(), "token"
                )
            ),
        )
        .filter(F.col("rk") <= 3)
    )
    want = {(r.source, r.token): (r["count"], r.rk) for r in batch.collect()}
    assert got == want


def test_curation_pipe_invariant_to_microbatch_boundaries(spark, sf_dir):
    """The registered availableNow drain and a maxFilesPerTrigger=1
    re-run (one micro-batch per source file) must produce identical
    results — every stage is content-keyed or commutative, so batch
    boundaries cannot leak into the output."""
    from twitter_hashtag_sentiment_analysis_spark.registry import load_all
    from twitter_hashtag_sentiment_analysis_spark.streaming.queries import (
        _run_to_memory,
        _stream_copy,
        curation_pipeline,
    )

    key = lambda r: (r["lang"], r["sentiment"])  # noqa: E731
    got = {
        key(r): (r["n_docs"], r["total_tokens"])
        for r in load_all()["stream_curation_pipe"].fn(spark, sf_dir).collect()
    }
    assert got

    path, docs = _stream_copy(spark, sf_dir, "documents")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(path)
    )
    # SAME shared builder as the operator — only the source varies
    agg = curation_pipeline(stream)
    name = _run_to_memory(agg, "curate_mb", output_mode="complete")
    chunked = {
        key(r): (r["n_docs"], r["total_tokens"])
        for r in spark.table(name).collect()
    }
    assert chunked == got


def test_outer_join_watermark_matches_batch_left_join(spark, sf_dir):
    """The r7 red: Catalyst pushed the per-side event_type filter below
    EventTimeWatermark, dropping the wm_flush sentinel before the
    watermark operator — the tail ~2 h of unmatched purchases never
    null-finalized (1975 vs 1981 rows at sf0.01). Pin the contract: the
    availableNow drain equals the batch left join EXACTLY, including
    the final-watermark-window purchases with matched=0, and no
    sentinel row (purchase_id/user_id = -1) leaks to the output."""
    from twitter_hashtag_sentiment_analysis_spark.io import table
    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    got = sorted(
        tuple(r)
        for r in load_all()["stream_outer_join_watermark"]
        .fn(spark, sf_dir)
        .collect()
    )
    assert all(row[0] >= 0 for row in got), "sentinel leaked into output"

    ev = table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    batch = p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") < F.col("p_ts")),
        "leftOuter",
    ).select(
        "purchase_id",
        "click_id",
        "user_id",
        F.when(F.col("click_id").isNull(), 0).otherwise(1).alias("matched"),
    )
    want = sorted(tuple(r) for r in batch.collect())
    assert got == want
    # the regression fingerprint: unmatched purchases must include ones
    # inside the final watermark-delay window (max ts - 2 h .. max ts)
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    tail_unmatched = (
        load_all()["stream_outer_join_watermark"]
        .fn(spark, sf_dir)
        .filter(F.col("matched") == 0)
        .join(p, "purchase_id")
        .filter(F.col("p_ts") > F.lit(max_ts) - F.expr("INTERVAL 2 HOURS"))
        .count()
    )
    assert tail_unmatched > 0, "tail purchases still parked in state"


def test_full_outer_join_watermark_matches_batch_full_join(spark, sf_dir):
    """Both-side finalization: the availableNow drain must equal the
    batch FULL JOIN exactly — including purchase-only rows in the
    final watermark window AND click-only rows — with no sentinel
    leakage on either side."""
    from twitter_hashtag_sentiment_analysis_spark.io import table
    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    got_rows = (
        load_all()["stream_full_outer_join_watermark"]
        .fn(spark, sf_dir)
        .collect()
    )
    nonekey = lambda t: tuple((x is None, x) for x in t)  # noqa: E731
    got = sorted((tuple(r) for r in got_rows), key=nonekey)
    assert all(
        (row[0] is None or row[0] >= 0) and (row[1] is None or row[1] >= 0)
        for row in got
    ), "sentinel leaked into output"
    sides = {r["side"] for r in got_rows}
    assert sides == {"matched", "purchase_only", "click_only"}, sides

    ev = table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    batch = p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") < F.col("p_ts")),
        "fullOuter",
    ).select(
        "purchase_id",
        "click_id",
        F.coalesce(F.col("user_id"), F.col("c_user")).alias("user_id"),
        F.when(F.col("purchase_id").isNull(), "click_only")
        .when(F.col("click_id").isNull(), "purchase_only")
        .otherwise("matched")
        .alias("side"),
    )
    want = sorted((tuple(r) for r in batch.collect()), key=nonekey)
    assert got == want


def test_dynamic_gap_sessions_respect_per_type_gaps(spark, sf_dir):
    """Within any session, consecutive gaps never exceed the previous
    event's own gap allowance (1h after a purchase, 15min otherwise) —
    and some session must exist that a FIXED 15-min gap would have
    split (the dynamic part does real work)."""
    from twitter_hashtag_sentiment_analysis_spark.io import table
    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    sess = load_all()["stream_session_dynamic_gap"].fn(spark, sf_dir)
    ev = table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type"
    )
    joined = (
        sess.alias("s")
        .join(ev.alias("e"), "user_id")
        .filter(
            (F.col("e.ts") >= F.col("s.session_start"))
            & (
                F.unix_micros(F.to_utc_timestamp(F.col("e.ts"), "UTC"))
                <= F.col("s.session_end_us")
            )
        )
    )
    # count events per session matches n_events (sessions partition
    # the user's events)
    counts = joined.groupBy(
        "user_id", "session_start", "n_events"
    ).agg(F.count("*").alias("m"))
    bad = counts.filter(F.col("m") < F.col("n_events")).count()
    assert bad == 0
    # dynamic gap does real work: at least one session contains a
    # consecutive gap > 15 min (only legal after a purchase)
    w = __import__("pyspark").sql.Window.partitionBy(
        "user_id", "session_start"
    ).orderBy("ts")
    gaps = joined.select(
        "user_id",
        "session_start",
        "event_type",
        (
            F.unix_micros(F.to_utc_timestamp("ts", "UTC"))
            - F.lag(F.unix_micros(F.to_utc_timestamp("ts", "UTC"))).over(w)
        ).alias("gap_us"),
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("gap_us").isNotNull())
    wide = gaps.filter(F.col("gap_us") > 15 * 60 * 1_000_000)
    assert wide.count() > 0
    assert wide.filter(F.col("prev_type") != "purchase").count() == 0


def test_dynamic_gap_session_boundary_merges_at_exact_equality(spark):
    """Planted boundary fixture: events separated by EXACTLY their gap
    (900s after a click, 3600s after a purchase) must MERGE into the
    previous session — equality is inclusive in Spark's session_window
    (probed batch + streaming) — and the DuckDB oracle idiom (strict
    '>' against the running max of per-event ends) must rebuild the
    identical sessions on the same rows."""
    import datetime as dt

    import duckdb
    import pandas as pd

    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # user 1: click, click exactly 900s later (merge), purchase,
        # click exactly 3600s after the purchase (merge), then a click
        # 901s after that click's end opens a NEW session.
        (1, t0, "click"),
        (1, t0 + dt.timedelta(seconds=900), "click"),
        (1, t0 + dt.timedelta(hours=1), "purchase"),
        (1, t0 + dt.timedelta(hours=2), "click"),
        (1, t0 + dt.timedelta(hours=2, seconds=900 + 901), "click"),
        # user 2: single event
        (2, t0 + dt.timedelta(hours=9), "click"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id int, ts timestamp, event_type string"
    )
    gap = F.when(
        F.col("event_type") == "purchase", F.lit("1 hour")
    ).otherwise(F.lit("15 minutes"))
    got = sorted(
        tuple(r)
        for r in ev.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").cast("long").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.unix_micros(F.to_utc_timestamp("w.end", "UTC")).alias(
                "session_end_us"
            ),
            "n_events",
        )
        .collect()
    )
    # exact-equality events merged: user 1 has THREE sessions —
    # [click+click@+900s] = 2, [purchase+click@+3600s] = 2, and the
    # final click (901s past the merged end) alone = 1. A half-open
    # (new-session-at-equality) engine would give five sessions of 1.
    per_user = {}
    for u, _s, _e, n in got:
        per_user.setdefault(u, []).append(n)
    assert sorted(per_user[1]) == [1, 2, 2], got
    assert per_user[2] == [1]

    # oracle replay on the SAME rows
    con = duckdb.connect()
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    con.register("events", pdf)
    sql = load_all()["stream_session_dynamic_gap"].sql
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert [(u, s, e, n) for u, s, e, n in got] == want, (got, want)


def test_incremental_etl_second_run_reads_only_new_files(spark, sf_dir, tmp_path):
    """Two availableNow invocations over one checkpoint: the offset log
    must show run 2 starting where run 1 committed (file-source logs
    grow, never re-list), and the sink must hold each doc exactly
    once."""
    import json
    import os

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    drop = str(tmp_path / "drop")
    sink = str(tmp_path / "sink")
    ck = str(tmp_path / "ck")
    batches = []
    for part in (0, 1):
        docs.filter(F.col("doc_id") % 2 == part).write.mode("append").json(drop)
        q = (
            spark.readStream.schema(docs.schema)
            .json(drop)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        batches.append(
            sorted(
                int(f) for f in os.listdir(os.path.join(ck, "offsets"))
                if f.isdigit()
            )
        )
    # run 2 appended new batch ids instead of replaying run 1's
    assert batches[1][: len(batches[0])] == batches[0]
    assert len(batches[1]) > len(batches[0])
    back = spark.read.parquet(sink)
    assert back.count() == docs.count()
    assert back.select("doc_id").distinct().count() == docs.count()


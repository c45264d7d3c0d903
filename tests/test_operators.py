

def test_fill_forward_generative_matches_spine_semantics(spark, tmp_path):
    """The generative LOCF must reproduce the oracle SQL's spine-join
    semantics on the tricky edges: a multi-hour gap carries the last
    total with rising staleness; an observed hour whose total is NULL
    (all-null values) carries the PRIOR hour's total (IGNORE NULLS)
    but resets gap/staleness — it was observed, just null-valued."""
    from datetime import datetime

    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    rows = [
        # type a: obs at 00 (5.0), silent 01+02, obs at 03 (NULL value)
        (1, datetime(2024, 1, 1, 0, 10), 7, "a", 5.0, "{}"),
        (2, datetime(2024, 1, 1, 3, 20), 7, "a", None, "{}"),
        # type b: single observation -> single spine row
        (3, datetime(2024, 1, 1, 9, 0), 8, "b", 2.5, "{}"),
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    ).write.parquet(str(tmp_path / "events.parquet"))

    out = {
        (r.event_type, r.bucket.hour): (r.total_ffill, r.gap, r.stale_hours)
        for r in load_all()["ts_fill_forward"].fn(spark, str(tmp_path)).collect()
    }
    assert out == {
        ("a", 0): (5.0, False, 0),
        ("a", 1): (5.0, True, 1),
        ("a", 2): (5.0, True, 2),
        ("a", 3): (5.0, False, 0),  # observed but all-null: carry, no gap
        ("b", 9): (2.5, False, 0),
    }



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


def test_groups_frame_matches_bruteforce_peer_semantics(spark, sf_dir):
    """win_groups_frame must implement true GROUPS semantics: for each
    row, the frame is the current DAY's full peer set plus the entire
    previous DISTINCT day (skipping calendar gaps — where RANGE-over-
    day would see an empty predecessor). Brute-force recompute per row
    from the raw events and compare exactly."""
    from collections import defaultdict

    from twitter_hashtag_sentiment_analysis_spark.io import table
    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    out = {
        r["event_id"]: (r["grp_sum"], r["grp_cnt"])
        for r in load_all()["win_groups_frame"].fn(spark, sf_dir).collect()
    }
    raw = table(spark, sf_dir, "events").selectExpr(
        "user_id", "event_id", "cast(date_trunc('day', ts) as date) as day",
        "value",
    ).collect()
    by_user = defaultdict(list)
    for r in raw:
        by_user[r["user_id"]].append(r)
    n_gap_rows = 0
    for rows in by_user.values():
        days = sorted({r["day"] for r in rows})
        day_pos = {d: i for i, d in enumerate(days)}
        by_day = defaultdict(list)
        for r in rows:
            by_day[r["day"]].append(r)
        for r in rows:
            i = day_pos[r["day"]]
            frame = by_day[days[i]] + (by_day[days[i - 1]] if i > 0 else [])
            want_sum = round(sum(x["value"] for x in frame), 6)
            want_cnt = len(frame)
            got_sum, got_cnt = out[r["event_id"]]
            assert got_cnt == want_cnt, (r, got_cnt, want_cnt)
            assert abs(got_sum - want_sum) < 1e-6, (r, got_sum, want_sum)
            if i > 0 and (days[i] - days[i - 1]).days > 1:
                n_gap_rows += 1  # rows where RANGE-over-day would differ
    assert len(out) == len(raw)


def test_kaplan_meier_matches_bruteforce_estimator(spark, sf_dir):
    """KM invariants + full brute-force recompute from raw events:
    survival must start <= 1, be strictly positive unless a risk set
    is wholly consumed, and be NON-INCREASING in duration; n_risk
    must telescope exactly (each row's risk set = previous minus
    everyone who left earlier); censored users must never count as
    events. The brute-force estimator recomputes S(t) in Python from
    the same censoring rule."""
    import math
    from collections import Counter

    from twitter_hashtag_sentiment_analysis_spark.io import table
    from twitter_hashtag_sentiment_analysis_spark.operators.timeseries import (
        KM_CENSOR_DAYS,
    )
    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    rows = sorted(
        load_all()["ts_kaplan_meier"].fn(spark, sf_dir).collect(),
        key=lambda r: r["dur_days"],
    )
    raw = table(spark, sf_dir, "events").selectExpr(
        "user_id", "cast(ts as date) as d"
    ).collect()
    first: dict = {}
    last: dict = {}
    for r in raw:
        u = r["user_id"]
        first[u] = min(first.get(u, r["d"]), r["d"])
        last[u] = max(last.get(u, r["d"]), r["d"])
    corpus_end = max(last.values())
    durs = Counter()
    events = Counter()
    for u in first:
        t = (last[u] - first[u]).days
        durs[t] += 1
        if (corpus_end - last[u]).days > KM_CENSOR_DAYS:
            events[t] += 1
    assert [r["dur_days"] for r in rows] == sorted(durs)
    n_risk = sum(durs.values())
    s = 1.0
    prev_surv = 1.0
    for r in rows:
        t = r["dur_days"]
        assert r["n_risk"] == n_risk, (t, r["n_risk"], n_risk)
        assert r["n_events"] == events[t]
        assert r["n_censored"] == durs[t] - events[t]
        s *= 1.0 - events[t] / n_risk
        assert abs(r["survival"] - round(s, 6)) < 2e-6, (t, r["survival"], s)
        assert r["survival"] <= prev_surv + 1e-9
        prev_surv = r["survival"]
        n_risk -= durs[t]
    assert n_risk == 0  # the risk set telescopes to empty

"""Planted-fixture tests for the audit/anomaly/funnel/connector family.

Each test writes a tiny parquet fixture with KNOWN defects or event
orderings and asserts the operator reports exactly them — the oracle
differential proves engine agreement on clean fixtures; these prove the
semantics on inputs the driver tables don't contain (violations,
spikes, out-of-order funnels)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from twitter_hashtag_sentiment_analysis_spark.registry import load_all


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / f"{name}.parquet"))


TS0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ev(eid, minutes, user, etype, value=1.0):
    return (eid, TS0 + dt.timedelta(minutes=minutes), user, etype, value, "{}")


EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def test_dq_checks_counts_planted_violations(spark, tmp_path):
    """One violation planted per rule (plus an FK orphan) -> the report
    counts each exactly once and flips ok only on violated rules."""
    li_schema = (
        "l_orderkey long, l_quantity double, l_extendedprice double, "
        "l_discount double, l_returnflag string, l_shipdate timestamp"
    )
    good = (1, 10.0, 100.0, 0.05, "N", TS0)
    rows = [
        good,
        (1, 99.0, 100.0, 0.05, "N", TS0),      # qty out of range
        (1, 10.0, 100.0, 1.5, "N", TS0),       # discount > 1
        (1, 10.0, -5.0, 0.05, "N", TS0),       # price not positive
        (1, 10.0, 100.0, 0.05, "X", TS0),      # flag outside domain
        (1, 10.0, 100.0, 0.05, "N", None),     # null shipdate
        (777, 10.0, 100.0, 0.05, "N", TS0),    # orphan orderkey
    ]
    _write(spark, tmp_path, "lineitem", rows, li_schema)
    _write(spark, tmp_path, "orders", [(1,)], "o_orderkey long")
    out = {
        r["rule"]: (r["n_violations"], r["ok"])
        for r in load_all()["dq_checks"].fn(spark, str(tmp_path)).collect()
    }
    assert out == {
        "qty_in_range": (1, False),
        "discount_unit_interval": (1, False),
        "price_positive": (1, False),
        "returnflag_domain": (1, False),
        "shipdate_not_null": (1, False),
        "orderkey_resolves": (1, False),
    }


def test_dq_checks_all_green_on_clean_rows(spark, tmp_path):
    li_schema = (
        "l_orderkey long, l_quantity double, l_extendedprice double, "
        "l_discount double, l_returnflag string, l_shipdate timestamp"
    )
    _write(spark, tmp_path, "lineitem", [(1, 10.0, 100.0, 0.05, "N", TS0)] * 3,
           li_schema)
    _write(spark, tmp_path, "orders", [(1,)], "o_orderkey long")
    rows = load_all()["dq_checks"].fn(spark, str(tmp_path)).collect()
    assert all(r["ok"] and r["n_violations"] == 0 for r in rows)
    assert len(rows) == 6


def test_anomaly_zscore_flags_planted_spike(spark, tmp_path):
    """30 calm points then a 100x spike: exactly the spike is flagged.
    The PRECEDING-only frame means the spike can't suppress itself."""
    rows = [_ev(i, i, 7, "view", 10.0 + (i % 3) * 0.5) for i in range(30)]
    rows.append(_ev(30, 30, 7, "view", 1000.0))
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    out = load_all()["ts_anomaly_zscore"].fn(spark, str(tmp_path)).collect()
    assert [r["event_id"] for r in out] == [30]
    assert out[0]["z"] > 100


def test_anomaly_zscore_needs_history(spark, tmp_path):
    """A spike in the first ANOM_MIN_PRIOR events is unjudgeable —
    no flag, no crash (stddev of <2 points is NULL)."""
    rows = [_ev(0, 0, 7, "view", 10.0), _ev(1, 1, 7, "view", 1000.0)]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    assert load_all()["ts_anomaly_zscore"].fn(spark, str(tmp_path)).count() == 0


def test_event_funnel_requires_strict_order(spark, tmp_path):
    """User A converts in order; user B's purchase PRECEDES signup so B
    counts for signup+click only; user C only signs up."""
    rows = [
        # A: signup -> click -> purchase (full funnel)
        _ev(1, 0, 1, "signup"), _ev(2, 5, 1, "click"), _ev(3, 9, 1, "purchase"),
        # B: purchase BEFORE signup, then click after signup
        _ev(4, 0, 2, "purchase"), _ev(5, 3, 2, "signup"), _ev(6, 8, 2, "click"),
        # C: signup only
        _ev(7, 1, 3, "signup"),
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    out = {
        r["step"]: r["n_users"]
        for r in load_all()["event_funnel"].fn(spark, str(tmp_path)).collect()
    }
    assert out == {"signup": 3, "click": 2, "purchase": 1}


def test_python_datasource_plans_partitions(spark):
    """The connector's split planner must yield the requested 4
    partitions (executor-parallel generation, not a driver loop)."""
    df = load_all()["source_python_datasource"].fn(spark, "")
    assert df.rdd.getNumPartitions() == 4
    first = df.filter("id = 0").collect()[0]
    assert first["lang"] == "en" and first["n_words"] == 3


def test_recursive_cte_closed_form(spark, sf_dir):
    """Fanout-16 hierarchy: the direct+transitive descendants of
    ancestor 1 are exactly the keys whose /16-chain passes through 1 —
    computable in closed form against the part table."""
    parts = [
        r["p_partkey"]
        for r in spark.read.parquet(f"{sf_dir}/part.parquet")
        .select("p_partkey")
        .collect()
    ]
    expected = set()
    for k in parts:
        node = k
        while node >= 16:
            node //= 16
            if node == 1:
                expected.add(k)
                break
    out = {
        r["ancestor_key"]: r["n_descendants"]
        for r in load_all()["sql_recursive_cte"].fn(spark, sf_dir).collect()
    }
    assert out[1] == len(expected)


def test_stream_python_source_restart_exactly_once(spark, tmp_path):
    """Kill the python-source stream mid-drain, restart from the SAME
    checkpoint: offsets resume (no gaps) and readBetweenOffsets replays
    the in-flight batch (no duplicates) — exactly-once end to end.
    File sink (memory sink cannot recover from a checkpoint)."""
    import time

    reg = load_all()
    reg["stream_python_source"].fn(spark, "")  # side effect: registers format
    ck = str(tmp_path / "ck")
    out_dir = str(tmp_path / "out")

    def count_rows():
        try:
            return spark.read.parquet(out_dir).count()
        except Exception:
            return 0

    def run_until(target_fn, timeout_s):
        q = (
            spark.readStream.format("synthetic_tweets_stream")
            .load()
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ck)
            .trigger(processingTime="0 seconds")
            .start()
        )
        deadline = time.time() + timeout_s
        while time.time() < deadline and not target_fn():
            time.sleep(0.05)
        q.stop()
        q.awaitTermination(30)

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        run_until(lambda: count_rows() > 0, 60)       # stop mid-drain
        n_before = count_rows()
        assert 0 < n_before <= 2000
        run_until(lambda: count_rows() >= 2000, 90)   # resume + finish
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    got = spark.read.parquet(out_dir)
    assert got.count() == 2000, "gaps or duplicate batches after restart"
    assert got.select("id").distinct().count() == 2000, "replayed dup ids"


def test_temperature_sample_keeps_rarest_language_fully(spark, sf_dir):
    """rate_l = sqrt(n_min/n_l): the rarest language has rate 1.0, so
    every one of its documents must survive; rates are monotone
    decreasing in language frequency."""
    from twitter_hashtag_sentiment_analysis_spark.io import table
    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    reg = load_all()
    sampled = reg["sample_temperature"].fn(spark, sf_dir)
    got = {
        r["lang"]: (r["cnt"], r["rate"])
        for r in sampled.groupBy("lang", "rate")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    totals = {
        r["lang"]: r["cnt"]
        for r in table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    rarest = min(totals, key=lambda k: (totals[k], k))
    assert got[rarest][0] == totals[rarest], "rarest language was subsampled"
    # rates ordered opposite to frequency; every rate in (0, 1]
    for lang, (_, rate) in got.items():
        assert 0 < rate <= 1.0
        if totals[lang] > totals[rarest]:
            assert rate < 1.0


def test_repetition_filter_bounds_and_known_degenerate_doc(spark, sf_dir):
    """dup_ratio must lie in [0, 1); a fully repeated synthetic doc
    (one trigram repeated) must be flagged, a all-distinct doc kept —
    checked via the same expressions on a planted frame."""
    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    reg = load_all()
    rows = reg["text_repetition_filter"].fn(spark, sf_dir).collect()
    assert rows, "empty output"
    for r in rows:
        assert 0.0 <= r["dup_ratio"] < 1.0
        assert r["n_distinct"] <= r["n_grams"]
        assert r["keep"] == (r["dup_ratio"] <= 0.2)


def test_decontaminate_flags_are_consistent(spark, sf_dir):
    """Benchmark docs never appear in the output; contaminated flag
    equals the >= 2 shared-shingle rule; n_shared is non-negative."""
    from twitter_hashtag_sentiment_analysis_spark.operators.text_analysis import (
        DECON_BENCH_MOD,
        DECON_OVERLAP_MIN,
    )
    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    reg = load_all()
    rows = reg["text_decontaminate"].fn(spark, sf_dir).collect()
    assert rows, "empty output"
    for r in rows:
        assert r["doc_id"] % DECON_BENCH_MOD != 0
        assert r["n_shared"] >= 0
        assert r["contaminated"] == (r["n_shared"] >= DECON_OVERLAP_MIN)


def test_outlier_iqr_flags_planted_extreme(spark, tmp_path):
    """n_chars 1..9 plus a planted 1000: Tukey fences from the exact
    quartiles keep 1..9 and flag only the extreme."""
    reg = load_all()
    rows = [(i, "t", "en", "s", float(i)) for i in range(1, 10)]
    rows.append((10, "t", "en", "s", 1000.0))
    _write(
        spark,
        tmp_path,
        "documents",
        [(a, b, c, d, int(e)) for a, b, c, d, e in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = reg["quality_outlier_iqr"].fn(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_docs"] == 10
    assert r["n_outliers"] == 1
    # sorted values [1..9, 1000]: q1 at idx 2.25 -> 3.25, q3 at 6.75 -> 7.75
    assert r["q1"] == 3.25 and r["q3"] == 7.75
    assert r["hi_fence"] == 7.75 + 1.5 * 4.5


def test_interpolate_linear_draws_the_line(spark, tmp_path):
    """Hours 0 and 3 observed (1.0, 4.0), hours 1-2 silent: the fill is
    2.0 / 3.0 with filled=True; observed hours pass through unfilled."""
    reg = load_all()
    rows = [
        _ev(1, 0, 1, "a", 1.0),
        _ev(2, 3 * 60, 1, "a", 4.0),
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    out = reg["ts_interpolate_linear"].fn(spark, str(tmp_path)).collect()
    by_bucket = {r["bucket"].hour: (r["value_interp"], r["filled"]) for r in out}
    assert by_bucket == {
        12: (1.0, False),
        13: (2.0, True),
        14: (3.0, True),
        15: (4.0, False),
    }


DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def test_gopher_rules_gate_matches_row_signals(spark, sf_dir):
    """keep must equal the conjunction recomputed from the row's own
    reported signals, and both classes must be populated on the
    fixture corpus (the gate discriminates, not rubber-stamps)."""
    from twitter_hashtag_sentiment_analysis_spark.operators.text_analysis import (
        GOPHER_MAX_MEAN_WORD_LEN,
        GOPHER_MAX_WORDS,
        GOPHER_MIN_ALPHA_RATIO,
        GOPHER_MIN_MEAN_WORD_LEN,
        GOPHER_MIN_STOP_HITS,
        GOPHER_MIN_WORDS,
    )

    rows = load_all()["quality_gopher_rules"].fn(spark, sf_dir).collect()
    assert rows, "empty output"
    for r in rows:
        # fixture ratios have granularity >= 1/99, far from the 4dp
        # rounding, so recomputing from reported columns is exact
        expect = (
            GOPHER_MIN_WORDS <= r["n_words"] <= GOPHER_MAX_WORDS
            and GOPHER_MIN_MEAN_WORD_LEN
            <= r["mean_word_len"]
            <= GOPHER_MAX_MEAN_WORD_LEN
            and r["alpha_ratio"] >= GOPHER_MIN_ALPHA_RATIO
            and r["n_stop_hits"] >= GOPHER_MIN_STOP_HITS
        )
        assert r["keep"] == expect, r
    kept = {r["keep"] for r in rows}
    assert kept == {True, False}, kept


def test_substring_corpus_flags_planted_mirror_docs(spark, tmp_path):
    """Two identical 12-token docs: every 5-gram position of each is
    duplicated => dup_frac 1.0, flagged.  A disjoint-vocabulary doc
    shares no gram => dup_frac 0.0, kept.  n_grams = tokens - 4."""
    from twitter_hashtag_sentiment_analysis_spark.operators.dedup import (
        DUP_GRAM_N,
    )

    mirror = " ".join(f"w{i % 7}x{i}" for i in range(12))
    unique = " ".join(f"zq{i}" for i in range(12))
    _write(
        spark,
        tmp_path,
        "documents",
        [
            (1, mirror, "en", "srcA", len(mirror)),
            (2, mirror, "en", "srcB", len(mirror)),
            (3, unique, "en", "srcC", len(unique)),
        ],
        DOC_SCHEMA,
    )
    rows = {
        r["doc_id"]: r
        for r in load_all()["dedup_substring_corpus"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert set(rows) == {1, 2, 3}
    for d in (1, 2):
        assert rows[d]["n_grams"] == 12 - DUP_GRAM_N + 1
        assert rows[d]["dup_frac"] == 1.0 and rows[d]["is_dup"]
    assert rows[3]["dup_frac"] == 0.0 and not rows[3]["is_dup"]


def test_weighted_quantile_exact_on_planted_weights(spark, tmp_path):
    """Prices 1,2,3 with integer weights 5,4,3 (total 12): cumulative
    weights 5,9,12 => p25 = 1.0 (cw 5 >= 3), p50 = 2.0 (cw 9 >= 6),
    p75 = 2.0 (cw 9 >= 9).  Exercises the exact boundary case cw == q*tot
    that the integer arithmetic exists for."""
    li_schema = (
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp"
    )
    rows = [
        (i, 1, 1, 1, float(q), float(p), 0.0, 0.0, "A", "O", TS0)
        for i, (p, q) in enumerate([(1, 5), (2, 4), (3, 3)])
    ]
    _write(spark, tmp_path, "lineitem", rows, li_schema)
    got = (
        load_all()["agg_weighted_quantile"].fn(spark, str(tmp_path)).collect()
    )
    assert len(got) == 1
    r = got[0]
    assert (r["p25_w"], r["p50_w"], r["p75_w"]) == (1.0, 2.0, 2.0), r


def test_bpe_tokens_known_merge_sequence(spark, tmp_path):
    """'the' collapses to 1 unit (t+h -> th, th+e -> the), 'table' to
    2 (ta+b, l+e -> 'tab le'), 'hash' to 2 (a+s, h+as -> 'has h'),
    and a word outside the merge alphabet stays at char count."""
    _write(
        spark,
        tmp_path,
        "documents",
        [(1, "the table hash", "en", "s", 14), (2, "zzz", "en", "s", 3)],
        DOC_SCHEMA,
    )
    rows = {
        r["doc_id"]: r
        for r in load_all()["text_bpe_tokens"].fn(spark, str(tmp_path)).collect()
    }
    assert rows[1]["n_bpe"] == 1 + 2 + 2, rows[1]
    assert rows[1]["n_chars_sum"] == 12
    assert rows[1]["chars_per_token"] == 2.4
    assert rows[2]["n_bpe"] == 3, rows[2]


def test_decontaminate_bloom_is_bit_identical_to_exact(spark, sf_dir):
    """The Bloom prefilter must not change a single row vs the exact
    operator — FNs impossible, FPs killed by the verify join."""
    reg = load_all()
    exact = {
        (r["doc_id"], r["n_shared"], r["contaminated"])
        for r in reg["text_decontaminate"].fn(spark, sf_dir).collect()
    }
    bloom = {
        (r["doc_id"], r["n_shared"], r["contaminated"])
        for r in reg["text_decontaminate_bloom"].fn(spark, sf_dir).collect()
    }
    assert exact == bloom
    assert exact, "empty comparison"


def test_pq_codebook_vectors_quantize_to_themselves(spark, sf_dir):
    """Each codebook vector's sub-vectors are distance 0 from their own
    code, so they must self-assign with zero reconstruction error; all
    other vectors report non-negative error and a valid code."""
    from twitter_hashtag_sentiment_analysis_spark.operators.similarity import (
        PQ_CODES_HI,
        PQ_CODES_LO,
        PQ_M,
    )

    rows = load_all()["embed_pq_quantize"].fn(spark, sf_dir).collect()
    by_vec = {}
    for r in rows:
        assert 0 <= r["code"] <= PQ_CODES_HI - PQ_CODES_LO
        assert r["sq_err"] >= 0.0
        by_vec.setdefault(r["vec_id"], []).append(r)
    for vid, rs in by_vec.items():
        assert len(rs) == PQ_M, (vid, rs)
        if PQ_CODES_LO <= vid <= PQ_CODES_HI:
            for r in rs:
                assert r["code"] == vid - PQ_CODES_LO and r["sq_err"] == 0.0, r


def test_poisson_repeat_is_deterministic_and_calibrated(spark, sf_dir):
    """Same draws on every run; repeat counts within [1, 5]; the
    fraction of docs drawn at all sits near 1 - e^-1 and mean copies
    per doc near 1.0 (Poisson(1) calibration at 500 docs)."""
    import math

    reg = load_all()
    a = sorted(
        (r["doc_id"], r["repeats"], r["copy"])
        for r in reg["sample_poisson_repeat"].fn(spark, sf_dir).collect()
    )
    b = sorted(
        (r["doc_id"], r["repeats"], r["copy"])
        for r in reg["sample_poisson_repeat"].fn(spark, sf_dir).collect()
    )
    assert a == b and a
    docs = {d for d, _, _ in a}
    n_docs = 500  # sf0.001 documents table
    drawn_frac = len(docs) / n_docs
    assert abs(drawn_frac - (1 - math.exp(-1))) < 0.07, drawn_frac
    mean_copies = len(a) / n_docs
    assert abs(mean_copies - 1.0) < 0.15, mean_copies
    assert all(1 <= k <= 5 and 1 <= c <= k for _, k, c in a)


def test_interval_overlap_planted_pairs(spark, tmp_path):
    """Purchase window [12:00, 12:30]; clicks at 11:55 (overlap 300 s),
    12:25 (300 s), 12:30 (touch => 0.0), 12:40 (none), and another
    user's 12:10 click (none) — checks the cross-bin case (11:55
    click), the touch boundary, and the user guard in one fixture."""
    rows = [
        _ev(1, 0, 1, "purchase"),
        _ev(10, -5, 1, "click"),
        _ev(11, 25, 1, "click"),
        _ev(12, 30, 1, "click"),
        _ev(13, 40, 1, "click"),
        _ev(14, 10, 2, "click"),
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    got = {
        (r["p_id"], r["c_id"]): r["overlap_s"]
        for r in load_all()["join_interval_overlap"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert got == {(1, 10): 300.0, (1, 11): 300.0, (1, 12): 0.0}, got


def test_cluster_keep_best_picks_longest_member(spark, sf_dir):
    """Exactly one keeper per cluster; the keeper is a member and has
    the cluster's max n_chars (ties to lower id); cluster sizes agree
    with row counts."""
    rows = load_all()["dedup_cluster_keep_best"].fn(spark, sf_dir).collect()
    assert rows
    chars = {
        r["doc_id"]: r["n_chars"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "n_chars")
        .collect()
    }
    clusters = {}
    for r in rows:
        clusters.setdefault(r["cluster_id"], []).append(r)
    for cid, members in clusters.items():
        assert len(members) == members[0]["component_size"]
        bests = [m for m in members if m["is_best"]]
        assert len(bests) == 1, (cid, members)
        best = bests[0]
        assert all(m["best_doc_id"] == best["doc_id"] for m in members)
        target = min(
            (m["doc_id"] for m in members),
            key=lambda d: (-chars[d], d),
        )
        assert best["doc_id"] == target, (cid, best, target)


def test_token_budget_is_a_partition_of_the_corpus(spark, sf_dir):
    """Shares sum to 1, cumulative share ends at 1 and is monotone in
    the declared order, and slice token totals add up to the direct
    corpus count."""
    rows = load_all()["corpus_token_budget"].fn(spark, sf_dir).collect()
    assert rows
    assert abs(sum(r["token_share"] for r in rows) - 1.0) < 1e-3
    ordered = sorted(
        rows, key=lambda r: (-r["n_tokens"], r["source"], r["lang"])
    )
    assert ordered[-1]["cum_share"] == 1.0
    assert all(
        a["cum_share"] <= b["cum_share"]
        for a, b in zip(ordered, ordered[1:])
    )
    direct = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .selectExpr("sum(size(split(text, ' '))) AS t")
        .collect()[0]["t"]
    )
    assert sum(r["n_tokens"] for r in rows) == direct


def test_minhash_recall_audit_invariants(spark, sf_dir):
    """One row; found is a subset of truth; recall is exactly the
    reported ratio; re-running reproduces the same numbers (the audit
    is deterministic, it can be a tracked pipeline metric)."""
    reg = load_all()
    a = reg["dedup_minhash_recall_audit"].fn(spark, sf_dir).collect()
    b = reg["dedup_minhash_recall_audit"].fn(spark, sf_dir).collect()
    assert len(a) == 1 and a == b
    r = a[0]
    assert 0 <= r["n_found"] <= r["n_truth"]
    if r["n_truth"] > 0:
        assert r["recall"] == round(r["n_found"] / r["n_truth"], 4)
        assert 0.0 <= r["recall"] <= 1.0
    else:
        assert r["recall"] is None


def test_asof_nearest_planted_directions(spark, tmp_path):
    """Backward pick, forward pick, equal-timestamp tie to the past,
    and the no-click user in one fixture."""
    rows = [
        _ev(10, 0, 1, "click"),
        _ev(11, 20, 1, "click"),
        _ev(1, 5, 1, "purchase"),
        _ev(2, 19, 1, "purchase"),
        _ev(3, 20, 1, "purchase"),
        _ev(4, 7, 2, "purchase"),
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    got = {
        r["event_id"]: (r["diff_us"], r["direction"])
        for r in load_all()["join_asof_nearest"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert got == {
        1: (5 * 60_000_000, "backward"),
        2: (60_000_000, "forward"),
        3: (0, "backward"),
        4: (None, None),
    }, got


O_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)


def _order(key, year, month, price, pri="1-URGENT"):
    return (key, 1, "O", float(price), dt.datetime(year, month, 15), pri)


def test_monthly_yoy_anchors_by_date_not_row_offset(spark, tmp_path):
    """Jan'24 100 -> Jan'25 150 gives +50%; Feb'25 has NO Feb'24
    counterpart (month missing) so its comparison must be NULL — a
    LAG(12)-row formulation would wrongly compare it against a
    different month."""
    rows = [
        _order(1, 2024, 1, 100.0),
        _order(2, 2025, 1, 150.0),
        _order(3, 2025, 2, 75.0),
    ]
    _write(spark, tmp_path, "orders", rows, O_SCHEMA)
    got = {
        str(r["month"]): (r["prev_year_revenue"], r["yoy_pct"])
        for r in load_all()["q_monthly_revenue_yoy"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert got == {
        "2024-01-01": (None, None),
        "2025-01-01": (100.0, 50.0),
        "2025-02-01": (None, None),
    }, got


def test_pivot_dynamic_cap_refuses_high_cardinality(spark, tmp_path):
    """Discovery past the declared cap must fail loudly instead of
    building a runaway-width plan."""
    import pytest as _pytest

    rows = [
        _order(i, 2024, 1, 10.0, pri=f"pri{i}") for i in range(30)
    ]
    _write(spark, tmp_path, "orders", rows, O_SCHEMA)
    with _pytest.raises(ValueError, match="cap"):
        load_all()["agg_pivot_dynamic"].fn(spark, str(tmp_path))


def test_ab_ttest_exact_on_planted_groups(spark, tmp_path):
    """A = even users [10, 14] (mean 12, var 8), B = odd users [5, 9]
    (mean 7, var 8): t = 5/sqrt(8) = 1.7678, Welch df = 2.0."""
    rows = [
        _ev(1, 0, 2, "purchase", 10.0),
        _ev(2, 1, 4, "purchase", 14.0),
        _ev(3, 2, 1, "purchase", 5.0),
        _ev(4, 3, 3, "purchase", 9.0),
        _ev(5, 4, 2, "click", 99.0),  # non-purchase: excluded
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    got = load_all()["stat_ab_ttest"].fn(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["n_a"], r["n_b"], r["mean_a"], r["mean_b"]) == (2, 2, 12.0, 7.0)
    assert r["t_stat"] == 1.7678 and r["welch_df"] == 2.0, r


def test_compact_small_files_reports_real_file_counts(spark, sf_dir):
    """files_before/after must match the actual directory listings,
    compaction must reduce the count, and totals must equal the
    original table's."""
    import os as _os

    from twitter_hashtag_sentiment_analysis_spark.sources.sinks import (
        _compact_cache,
    )

    rows = load_all()["sink_compact_small_files"].fn(spark, sf_dir).collect()
    out_dir, files_before, files_after = _compact_cache[sf_dir]
    actual_after = len(
        [f for f in _os.listdir(out_dir) if f.endswith(".parquet")]
    )
    for r in rows:
        assert r["files_before"] == files_before
        assert r["files_after"] == files_after
    assert files_after == actual_after
    assert files_before > files_after
    direct = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .groupBy("lang")
        .count()
        .collect()
    )
    assert {(r["lang"], r["n_docs"]) for r in rows} == {
        (r["lang"], r["count"]) for r in direct
    }


def test_langid_confusion_rows_are_distributions(spark, sf_dir):
    """Each true language's row fractions sum to 1; the matrix covers
    every labeled language; total n equals the corpus size."""
    rows = load_all()["text_langid_confusion"].fn(spark, sf_dir).collect()
    per_lang = {}
    for r in rows:
        per_lang.setdefault(r["lang"], []).append(r)
        assert r["is_correct"] == (r["lang"] == r["predicted_lang"])
    assert set(per_lang) == {"en", "de", "es", "fr", "zh"}
    for lang, rs in per_lang.items():
        assert abs(sum(r["row_frac"] for r in rs) - 1.0) < 1e-3, lang
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r["n"] for r in rows) == n_docs


def test_percentile_within_group_orderings(spark, sf_dir):
    """p25 <= p50 <= p75 per group; the discrete median sits inside
    the interquartile range."""
    rows = load_all()["agg_percentile_within_group"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["p25_cont"] <= r["p50_cont"] <= r["p75_cont"], r
        assert r["p25_cont"] <= r["p50_disc"] <= r["p75_cont"], r


def test_multi_distinct_algebraic_bounds(spark, sf_dir):
    """Pair cardinality is bounded below by each single-key count and
    above by their product and by the row count."""
    rows = load_all()["agg_multi_distinct"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_cust_pri_pairs"] >= max(r["n_customers"], r["n_priorities"])
        assert r["n_cust_pri_pairs"] <= r["n_customers"] * r["n_priorities"]
        assert r["n_cust_pri_pairs"] <= r["n_orders"]


def test_exact_normalized_merges_planted_variants(spark, tmp_path):
    """Case/whitespace variants of one doc collapse into a single
    cluster; n_variants counts only the members that needed the
    canonicalizer; an unrelated doc stays alone."""
    docs = [
        (1, "Hello  World", "en", "s", 12),
        (2, "hello world", "en", "s", 11),
        (3, "  hello world ", "en", "s", 14),
        (4, "other doc", "en", "s", 9),
    ]
    _write(spark, tmp_path, "documents", docs, DOC_SCHEMA)
    rows = load_all()["dedup_exact_normalized"].fn(spark, str(tmp_path)).collect()
    by_keeper = {r["keeper_doc_id"]: r for r in rows}
    assert set(by_keeper) == {1, 4}
    assert by_keeper[1]["n_copies"] == 3 and by_keeper[1]["n_variants"] == 2
    assert by_keeper[4]["n_copies"] == 1 and by_keeper[4]["n_variants"] == 0


def test_gopher_alpha_anchors_reject_trailing_newline(spark, tmp_path):
    """Java's $ matches before a final line terminator, so the gate
    must use \\A..\\z anchors: a token 'abc\\n' is NOT alphabetic on
    either engine (regression for the one latent cross-engine
    divergence review found)."""
    _write(
        spark,
        tmp_path,
        "documents",
        [(1, "abc\n xyz", "en", "s", 8)],
        DOC_SCHEMA,
    )
    r = load_all()["quality_gopher_rules"].fn(spark, str(tmp_path)).collect()[0]
    # tokens: ['abc\n', 'xyz'] — the TOKEN-FINAL newline is the
    # discriminating case: old '^[a-z]+$' accepts 'abc\n' (ratio 1.0),
    # \A..\z rejects it (ratio 0.5) — reverting the fix fails here
    assert r["n_words"] == 2 and r["alpha_ratio"] == 0.5, r


def test_phash_neardup_identical_blobs_collide_at_zero(spark, tmp_path):
    """Byte-identical blobs must pair at Hamming 0; a byte-disjoint
    blob must not pair with them; symmetry/id ordering holds."""
    base = "the quick brown fox jumps over the lazy dog " * 3
    other = "ZZZZ 9999 !!!! @@@@ #### $$$$ %%%% ^^^^ &&&& " * 3
    _write(
        spark,
        tmp_path,
        "documents",
        [
            (1, base, "en", "s", len(base)),
            (2, base, "en", "s", len(base)),
            (3, other, "en", "s", len(other)),
        ],
        DOC_SCHEMA,
    )
    rows = load_all()["mm_phash_neardup"].fn(spark, str(tmp_path)).collect()
    got = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in rows}
    assert got.get((1, 2)) == 0, got
    assert all(a < b for a, b in got)
    assert (1, 3) not in got and (2, 3) not in got


def test_share_of_parent_levels_sum_to_one(spark, sf_dir):
    """Within each region the nation shares sum to 1; the region
    shares of total sum to 1 across distinct regions; every share is
    in (0, 1]."""
    rows = load_all()["q_share_of_parent"].fn(spark, sf_dir).collect()
    assert rows
    by_region = {}
    region_share = {}
    for r in rows:
        assert 0 < r["share_of_region"] <= 1.0
        assert 0 < r["region_share_of_total"] <= 1.0
        by_region.setdefault(r["region"], []).append(r["share_of_region"])
        region_share[r["region"]] = r["region_share_of_total"]
    for region, shares in by_region.items():
        assert abs(sum(shares) - 1.0) < 1e-3, region
    assert abs(sum(region_share.values()) - 1.0) < 1e-3


def test_interval_overlap_pre_epoch_timestamps(spark, tmp_path):
    """Bin indices must FLOOR for negative epoch times (pre-1970): a
    purchase window straddling a bin boundary in 1965 must still pair
    with its overlapping click — truncation-toward-zero binning (the
    pre-round-6 arithmetic) assigns the two sides different bins and
    silently drops the pair."""
    t0 = dt.datetime(1965, 6, 1, 12, 0, 0)  # epoch_us < 0

    def ev(eid, minutes, user, etype):
        return (eid, t0 + dt.timedelta(minutes=minutes), user, etype, 1.0, "{}")

    rows = [
        ev(1, 0, 1, "purchase"),   # window [12:00, 12:30]
        ev(10, -5, 1, "click"),    # [11:55, 12:05] -> overlap 300 s
        ev(11, 25, 1, "click"),    # [12:25, 12:35] -> overlap 300 s
        ev(12, 40, 1, "click"),    # no overlap
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    got = {
        (r["p_id"], r["c_id"]): r["overlap_s"]
        for r in load_all()["join_interval_overlap"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert got == {(1, 10): 300.0, (1, 11): 300.0}, got


def test_sub_not_in_nulls_ansi_law(spark, sf_dir):
    """One NULL in the NOT IN subquery empties the result — the ANSI
    three-valued-logic law the operator exists to pin."""
    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    row = load_all()["sub_not_in_nulls"].fn(spark, sf_dir).collect()[0]
    assert row.n_with_null_inner == 0
    assert row.n_null_filtered > 0


def test_sub_any_all_rewrite_preconditions(spark, sf_dir):
    """sub_any_all's max-aggregate rewrite of > ALL / <= ANY is only
    equivalent to genuine quantifiers when both inner relations are
    NON-EMPTY and NULL-FREE (ALL over an empty set is TRUE for every
    row; a NULL makes the comparison UNKNOWN). Those are measured
    fixture properties — assert them so a regenerated fixture that
    violates them fails loudly instead of silently flipping the
    oracle comparison."""
    from twitter_hashtag_sentiment_analysis_spark.io import table

    o = table(spark, sf_dir, "orders")
    for prio in ("1-URGENT", "5-LOW"):
        inner = o.filter(
            (F.col("o_orderpriority") == prio)
            & (F.col("o_custkey") % 100 == 7)
        )
        assert inner.count() > 0, f"empty inner relation for {prio}"
        assert (
            inner.filter(F.col("o_totalprice").isNull()).count() == 0
        ), f"NULL o_totalprice in inner relation for {prio}"


def test_benford_digits_partition_the_orders(spark, sf_dir):
    from twitter_hashtag_sentiment_analysis_spark.io import table
    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    rows = load_all()["stat_benford"].fn(spark, sf_dir).collect()
    assert {r.digit for r in rows} <= set(range(1, 10))
    assert sum(r.n_obs for r in rows) == table(spark, sf_dir, "orders").count()
    assert all(r.chi2_term >= 0.0 for r in rows)
    shares = sum(r.expected_share for r in rows)
    assert abs(shares - 1.0) < 1e-9  # all nine digits present


def test_ks_statistic_is_a_probability_distance(spark, sf_dir):
    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    rows = load_all()["stat_ks_test"].fn(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0.0 <= r.ks_d <= 1.0
        assert r.n_in > 0 and r.n_out > 0


def test_autocorr_is_a_correlation(spark, sf_dir):
    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    rows = load_all()["ts_autocorr"].fn(spark, sf_dir).collect()
    assert sorted(r.lag_k for r in rows) == list(range(1, 8))
    for r in rows:
        assert -1.0 <= r.acf <= 1.0
        assert r.n_pairs > 0


def test_bfs_hops_are_frontier_consistent(spark, sf_dir):
    """Seed at hop 0; every hop-k node (k>0) has an in-edge from some
    hop-(k-1) node — the BFS invariant."""
    from pyspark.sql import functions as F

    from twitter_hashtag_sentiment_analysis_spark.io import table
    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    rows = load_all()["graph_bfs_hops"].fn(spark, sf_dir).collect()
    hops = {r.word: r.hops for r in rows}
    assert min(hops.values()) == 0
    zero = [w for w, h in hops.items() if h == 0]
    assert len(zero) == 1
    toks = [
        r.toks
        for r in table(spark, sf_dir, "documents")
        .select(F.split("text", " ").alias("toks"))
        .collect()
    ]
    edges = {(t[i], t[i + 1]) for t in toks for i in range(len(t) - 1)}
    preds = {}
    for s, d in edges:
        preds.setdefault(d, set()).add(s)
    for w, h in hops.items():
        if h > 0:
            assert any(hops.get(p) == h - 1 for p in preds.get(w, ())), w


def test_aes_roundtrip_holds_per_row(spark, sf_dir):
    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    rows = load_all()["fn_aes_roundtrip"].fn(spark, sf_dir).collect()
    assert rows and all(r.roundtrip_ok for r in rows)
    assert all(r.ct_len % 16 == 0 for r in rows)


def test_set_except_distinct_vs_all_semantics(spark, sf_dir):
    """set_except (distinct) deduplicates; set_except_all keeps
    multiplicity — the round-7 fix that separated the twins."""
    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    r = load_all()
    distinct_rows = r["set_except"].fn(spark, sf_dir).collect()
    all_rows = r["set_except_all"].fn(spark, sf_dir).collect()
    keys = [x.o_custkey for x in distinct_rows]
    assert len(keys) == len(set(keys))
    # a key absent from the right side survives exceptAll with full
    # multiplicity, so every distinct EXCEPT key must appear here
    assert set(keys) <= {x.o_custkey for x in all_rows}
    assert len(all_rows) >= len(keys)


def test_peak_concurrency_is_bounded_by_sessions(spark, sf_dir):
    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    rows = load_all()["event_peak_concurrency"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.peak_concurrency <= r.n_sessions


def test_lttb_keeps_endpoints_and_one_point_per_bucket(spark, sf_dir):
    from twitter_hashtag_sentiment_analysis_spark.operators.timeseries import (
        LTTB_BUCKETS,
    )
    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    rows = load_all()["ts_downsample_lttb"].fn(spark, sf_dir).collect()
    days = sorted(r.day_idx for r in rows)
    assert len(rows) == len(set(days))  # one point per selected day
    assert len(rows) <= LTTB_BUCKETS
    buckets = [r.bucket for r in rows]
    # interior buckets contribute exactly one point each
    interior = [b for b in buckets if 1 <= b <= LTTB_BUCKETS - 2]
    assert len(interior) == len(set(interior))


def test_grouping_id_is_the_bit_vector(spark, sf_dir):
    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    rows = load_all()["agg_grouping_id"].fn(spark, sf_dir).collect()
    for r in rows:
        assert r.gid == r.g_pri * 2 + r.g_st
    assert sum(1 for r in rows if r.gid == 3) == 1  # exactly one grand total


def test_rate_source_replays_the_range(spark, sf_dir):
    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    rows = load_all()["stream_rate_source"].fn(spark, sf_dir).collect()
    assert len(rows) == 16
    assert sum(r.n for r in rows) == 5000
    assert sum(r.sum_value for r in rows) == 5000 * 4999 // 2


def test_format_line_shape(spark, sf_dir):
    import re as _re

    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    rows = load_all()["fn_format"].fn(spark, sf_dir).collect()
    pat = _re.compile(r"^\d{6}\|.+\|[0-9a-f]+$")
    assert rows and all(pat.match(r.fmt_line) for r in rows)
    assert all(len(r.padded_key) == 10 for r in rows)


def test_bitmap_distinct_matches_count_distinct(spark, sf_dir):
    from pyspark.sql import functions as F

    from twitter_hashtag_sentiment_analysis_spark.io import table
    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    got = {
        (r.o_orderpriority, r.n_customers)
        for r in load_all()["agg_bitmap_distinct"].fn(spark, sf_dir).collect()
    }
    want = {
        (r.o_orderpriority, r.nd)
        for r in table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("nd"))
        .collect()
    }
    assert got == want


def test_duplication_census_accounting(spark, sf_dir):
    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    rows = load_all()["quality_duplication_census"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_docs == r.n_distinct + r.n_redundant
        assert r.max_copies >= 1
        assert r.duplication_factor >= 1.0


def test_audience_overlap_jaccard_bounds(spark, sf_dir):
    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    rows = load_all()["event_audience_overlap"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.type_a < r.type_b  # ordered pairs, no mirrors
        assert 0.0 <= r.jaccard <= 1.0
        assert r.n_both <= min(r.n_a, r.n_b)


def test_python_batch_writer_round_trips(spark, sf_dir):
    from pyspark.sql import functions as F

    from twitter_hashtag_sentiment_analysis_spark.io import table
    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    got = load_all()["sink_python_batch_writer"].fn(spark, sf_dir)
    want = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 20 == 0)
        .count()
    )
    assert got.count() == want


def test_mad_anomalies_are_a_subset_of_extremes(spark, sf_dir):
    """Robust z is monotone in |rev - median|: every anomaly's
    |robust_z| exceeds the 3.0 threshold and non-anomalies' do not."""
    from twitter_hashtag_sentiment_analysis_spark.operators.timeseries import (
        MAD_SIGMA,
    )

    rows = load_all()["ts_anomaly_mad"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r["is_anomaly"]:
            assert abs(r["robust_z"]) > MAD_SIGMA - 1e-6
        else:
            assert abs(r["robust_z"]) <= MAD_SIGMA + 1e-6


def test_link_prediction_excludes_existing_edges(spark, sf_dir):
    """Predicted links must be non-edges with genuine overlap: jaccard
    in (0, 1), common <= min(deg) and no predicted pair may be an
    actual co-occurrence edge."""
    import pyspark.sql.functions as SF

    from twitter_hashtag_sentiment_analysis_spark.io import table

    rows = load_all()["graph_jaccard_link_prediction"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 < r["jaccard"] <= 1.0
        assert r["common"] <= min(r["deg_a"], r["deg_b"])
    d = table(spark, sf_dir, "documents").select(
        SF.split("text", " ").alias("toks")
    )
    bigrams = SF.expr(
        "IF(size(toks) >= 2, transform(sequence(1, size(toks) - 1), "
        "i -> struct(element_at(toks, i) AS s, element_at(toks, i+1) AS t)), "
        "CAST(array() AS ARRAY<STRUCT<s: STRING, t: STRING>>))"
    )
    edges = {
        (min(e["e"]["s"], e["e"]["t"]), max(e["e"]["s"], e["e"]["t"]))
        for e in d.select(SF.explode(bigrams).alias("e")).collect()
        if e["e"]["s"] and e["e"]["t"] and e["e"]["s"] != e["e"]["t"]
    }
    assert all((r["a"], r["b"]) not in edges for r in rows)


def test_string_agg_is_ordered_and_capped(spark, sf_dir):
    rows = load_all()["agg_string_agg"].fn(spark, sf_dir).collect()
    assert len(rows) == 5  # one per priority
    for r in rows:
        ids = r["top_customers"].split(",")
        assert 1 <= len(ids) <= 5
        assert len(set(ids)) == len(ids)


def test_semi_join_stream_equals_exists(spark, sf_dir):
    """The streaming LEFT SEMI drain equals the batch EXISTS filter,
    one row per qualified purchase."""
    from twitter_hashtag_sentiment_analysis_spark.io import table

    got = sorted(
        tuple(r) for r in load_all()["stream_semi_join"].fn(spark, sf_dir).collect()
    )
    assert len({t[0] for t in got}) == len(got)  # exactly-once per purchase
    ev = table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("ev_semi_test")
    want = sorted(
        tuple(r)
        for r in spark.sql(
            """
            SELECT p.event_id AS purchase_id, p.user_id,
                   CAST(round(p.value * 100) AS BIGINT) AS value_cents
            FROM ev_semi_test p
            WHERE p.event_type = 'purchase' AND EXISTS (
                SELECT 1 FROM ev_semi_test c
                WHERE c.event_type = 'click' AND c.user_id = p.user_id
                  AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts)
            """
        ).collect()
    )
    assert got == want


def test_semantic_cc_labels_are_component_minima(spark, sf_dir):
    """Every cluster's id is its minimum member, sizes are consistent
    (sum of per-cluster counts == rows), and every clustered vector
    appears in the mutual-kNN edge set."""
    from collections import Counter

    reg = load_all()
    rows = reg["dedup_semantic_cc"].fn(spark, sf_dir).collect()
    assert rows
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        assert cid == min(m["vec_id"] for m in members)
        assert all(m["cluster_size"] == len(members) for m in members)
    edges = reg["sim_knn_graph_mutual"].fn(spark, sf_dir).collect()
    nodes = {e["src"] for e in edges} | {e["dst"] for e in edges}
    assert {r["vec_id"] for r in rows} == nodes
    # edges never cross clusters (it's a partition into components)
    lbl = {r["vec_id"]: r["cluster_id"] for r in rows}
    assert all(lbl[e["src"]] == lbl[e["dst"]] for e in edges)
    _ = Counter  # imported for symmetry with sibling tests


def test_reset_running_sum_resets_at_signup(spark, tmp_path):
    """Planted sequence: purchases accumulate, a signup zeroes the
    accumulator, later purchases start fresh."""
    rows = [
        _ev(1, 0, 1, "purchase", 10.0),
        _ev(2, 1, 1, "purchase", 5.0),
        _ev(3, 2, 1, "signup", 0.0),
        _ev(4, 3, 1, "purchase", 7.0),
        _ev(5, 4, 1, "view", 99.0),       # non-purchase never counts
        _ev(6, 5, 1, "purchase", 1.0),
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    out = {
        r["event_id"]: (r["seg_id"], r["spend_since_signup_cents"])
        for r in load_all()["win_reset_running_sum"].fn(spark, str(tmp_path)).collect()
    }
    assert out == {
        1: (0, 1000),
        2: (0, 1500),
        3: (1, 0),
        4: (1, 700),
        5: (1, 700),
        6: (1, 800),
    }


def test_target_encoding_shrinks_toward_global_mean(spark, sf_dir):
    """encoded_mean lies strictly between raw_mean and global_mean for
    every category whose raw mean differs from global."""
    rows = load_all()["ml_target_encoding"].fn(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        lo, hi = sorted((r["raw_mean"], r["global_mean"]))
        assert lo - 1e-4 <= r["encoded_mean"] <= hi + 1e-4


def test_percentile_disc_returns_population_members(spark, sf_dir):
    """p50/p90 must be actual order totals (exact cents present in the
    group) with the right rank position."""
    from twitter_hashtag_sentiment_analysis_spark.io import table

    rows = load_all()["agg_percentile_disc"].fn(spark, sf_dir).collect()
    o = table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    for r in rows:
        vals = sorted(
            x["cents"]
            for x in o.filter(
                F.col("o_orderpriority") == r["o_orderpriority"]
            ).collect()
        )
        assert r["p50_cents"] == vals[(len(vals) + 1) // 2 - 1]
        assert r["p90_cents"] == vals[(9 * len(vals) + 9) // 10 - 1]


def test_dynamic_overwrite_preserves_untouched_partitions(spark, sf_dir):
    """The read-back census must cover all 12 months of 1996 even
    though the second write only touched months 1-3."""
    rows = load_all()["sink_dynamic_partition_overwrite"].fn(spark, sf_dir).collect()
    assert {r["order_month"] for r in rows} == set(range(1, 13))
    assert all(r["n_orders"] > 0 for r in rows)


def test_revenue_bridge_sums_to_monthly_delta(spark, sf_dir):
    """Identity: per month, sum(delta_cents) across movements equals
    (this month's total revenue - last month's)."""
    from twitter_hashtag_sentiment_analysis_spark.io import table

    rows = load_all()["q_revenue_bridge"].fn(spark, sf_dir).collect()
    o = table(spark, sf_dir, "orders")
    monthly = {
        r["m"]: r["c"]
        for r in o.groupBy(
            (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
            .cast("long")
            .alias("m")
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            .cast("long")
            .alias("c")
        )
        .collect()
    }
    from collections import defaultdict

    bridge = defaultdict(int)
    for r in rows:
        bridge[r["m"]] += r["delta_cents"]
    for m, delta in bridge.items():
        want = monthly.get(m, 0) - monthly.get(m - 1, 0)
        assert delta == want, (m, delta, want)


def test_cross_source_dups_counts_planted_mirrors(spark, tmp_path):
    """src_a and src_b share two contents; src_c shares one with
    src_a; within-source repeats must NOT inflate the counts."""
    rows = [
        (1, "alpha beta", "en", "src_a", 10),
        (2, "alpha beta", "en", "src_b", 10),   # shared a<->b
        (3, "gamma delta", "en", "src_a", 11),
        (4, "gamma delta", "en", "src_b", 11),  # shared a<->b
        (5, "gamma delta", "en", "src_b", 11),  # repeat inside b: no inflate
        (6, "epsilon", "en", "src_c", 7),
        (7, "epsilon", "en", "src_a", 7),       # shared a<->c
        (8, "zeta", "en", "src_c", 4),          # unique
    ]
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    _write(spark, tmp_path, "documents", rows, schema)
    got = {
        (r["source_a"], r["source_b"]): r["n_shared_contents"]
        for r in load_all()["quality_cross_source_dups"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert got == {("src_a", "src_b"): 2, ("src_a", "src_c"): 1}


def test_stream_reshard_restart_exactly_once_across_split(spark, tmp_path):
    """Kill the RESHARDED python source twice — once mid-epoch-1 (only
    parent shards open) and once mid-epoch-2 (children open) — and
    restart from the same checkpoint each time. Exactly-once across
    the resharding epoch: every record delivered once, per-shard
    counts match the reshard plan, the final committed offset pins
    every shard (parents AND children) at its end, and every committed
    offset along the way satisfies the lineage invariant (a child
    present only when all its parents are pinned)."""
    import json
    import os
    import time

    from twitter_hashtag_sentiment_analysis_spark.sources.pydatasource import (
        PYDS_ROWS,
        RESHARD_AT,
        RESHARD_FINAL_OFFSET,
        RESHARD_LINEAGE,
    )

    reg = load_all()
    reg["stream_python_source_reshard"].fn(spark, "")  # registers the format
    ck = str(tmp_path / "ck")
    out_dir = str(tmp_path / "out")

    def count_rows():
        try:
            return spark.read.parquet(out_dir).count()
        except Exception:
            return 0

    def run_until(target_fn, timeout_s):
        q = (
            spark.readStream.format("synthetic_tweets_resharded")
            .load()
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ck)
            .trigger(processingTime="0 seconds")
            .start()
        )
        deadline = time.time() + timeout_s
        while time.time() < deadline and not target_fn():
            time.sleep(0.05)
        q.stop()
        q.awaitTermination(30)

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        # stop 1: mid-epoch-1 (some parent rows, none of epoch 2 yet)
        run_until(lambda: count_rows() > 0, 60)
        assert 0 < count_rows() <= PYDS_ROWS
        # stop 2: mid-epoch-2 (restart replayed across the parents'
        # close; now stop again while children are draining)
        run_until(lambda: count_rows() > RESHARD_AT, 90)
        # final: drain to the cap
        run_until(lambda: count_rows() >= PYDS_ROWS, 90)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    got = spark.read.parquet(out_dir)
    assert got.count() == PYDS_ROWS, "gaps or duplicate batches"
    assert got.select("id").distinct().count() == PYDS_ROWS, "replayed dups"
    per_shard = {
        r["shard_id"]: r["n"]
        for r in got.groupBy("shard_id").count().withColumnRenamed("count", "n").collect()
    }
    assert per_shard == {
        "shardId-000000000000": RESHARD_AT // 2,
        "shardId-000000000001": RESHARD_AT // 4,
        "shardId-000000000002": RESHARD_AT // 4,
        "shardId-000000000003": RESHARD_AT // 4,
        "shardId-000000000004": RESHARD_AT // 4,
        "shardId-000000000005": RESHARD_AT // 2,
    }

    # lineage invariant over every committed offset the engine wrote
    off_dir = os.path.join(ck, "offsets")
    final = None
    for fname in sorted(os.listdir(off_dir), key=lambda s: int(s) if s.isdigit() else -1):
        if not fname.isdigit():
            continue
        with open(os.path.join(off_dir, fname)) as f:
            lines = [l for l in f.read().splitlines() if l.startswith("{")]
        # last JSON line is the source offset
        off = json.loads(lines[-1])
        if isinstance(off, str):
            off = json.loads(off)
        final = off
        for child, parents in RESHARD_LINEAGE.items():
            if child in off:
                for p in parents:
                    assert off.get(p) == RESHARD_FINAL_OFFSET[p], (
                        fname,
                        child,
                        p,
                        off,
                    )
    assert final == RESHARD_FINAL_OFFSET, final

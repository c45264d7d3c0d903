"""Hypothesis property tests for the deterministic curation operators.

These pin the ALGEBRAIC contracts (partition/exhaustiveness/mass
conservation) on arbitrary corpora — the oracle gate only proves
equality on the fixture distribution.
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from twitter_hashtag_sentiment_analysis_spark.operators.sampling import (
    _TRAIN_HI,
    _VAL_HI,
    PACK_BUDGET,
)

# Pure-Python twins of the operators' per-row logic. Kept deliberately
# tiny: the cross-engine equivalence is the oracle gate's job; here we
# check the math that makes the operators correct at ANY input.


def split_of(doc_id: int) -> str:
    prefix = hashlib.md5(str(doc_id).encode()).hexdigest()[:2]
    if prefix < _TRAIN_HI:
        return "train"
    if prefix < _VAL_HI:
        return "val"
    return "test"


def pack_ids(token_counts: list[int]) -> list[int]:
    out, cum = [], 0
    for t in token_counts:
        out.append(cum // PACK_BUDGET)
        cum += t
    return out


@given(st.lists(st.integers(min_value=0, max_value=2**62), unique=True, max_size=200))
def test_hash_split_is_total_and_stable(ids):
    """Every id gets exactly one split, and the assignment of an id
    never depends on which other ids are present (incremental-ingest
    stability — the property RNG sampling lacks)."""
    full = {i: split_of(i) for i in ids}
    assert set(full.values()) <= {"train", "val", "test"}
    half = {i: split_of(i) for i in ids[: len(ids) // 2]}
    for i, s in half.items():
        assert full[i] == s


@given(
    st.lists(st.integers(min_value=1, max_value=PACK_BUDGET * 3), max_size=100)
)
def test_packing_conserves_tokens_and_is_contiguous(tokens):
    """Packing loses no documents, pack ids start at 0 and never
    decrease, and a pack id only advances as far as the PREVIOUS doc's
    tokens can push the prefix sum (an oversized doc may skip ids; a
    small doc advances by at most 1)."""
    pids = pack_ids(tokens)
    assert len(pids) == len(tokens)
    if not tokens:
        return
    assert pids[0] == 0
    for (a, b), t_prev in zip(zip(pids, pids[1:]), tokens):
        assert a <= b <= a + t_prev // PACK_BUDGET + 1, (tokens, pids)
    totals: dict[int, int] = {}
    for pid, t in zip(pids, tokens):
        totals[pid] = totals.get(pid, 0) + t
    assert sum(totals.values()) == sum(tokens)
    # greedy guarantee: every pack that was CLOSED by a following doc
    # has total > BUDGET - (the doc that opened the next pack) ... the
    # simple invariant form: prefix sums within one pack stay below
    # BUDGET + the pack-opening doc's size
    cum = 0
    for pid, t in zip(pids, tokens):
        start_of_pack = pid * PACK_BUDGET
        assert cum >= start_of_pack, (tokens, pids)
        cum += t


@settings(suppress_health_check=[HealthCheck.function_scoped_fixture], deadline=None)
@given(st.integers(min_value=0, max_value=2**32))
def test_split_ratio_shape(seed):
    """On a window of 512 consecutive ids the empirical split is in
    sane bands around 80/10/10 — guards against threshold typos that
    the type system can't see."""
    ids = range(seed, seed + 512)
    counts = {"train": 0, "val": 0, "test": 0}
    for i in ids:
        counts[split_of(i)] += 1
    assert 0.70 <= counts["train"] / 512 <= 0.90
    assert 0.03 <= counts["val"] / 512 <= 0.18
    assert 0.03 <= counts["test"] / 512 <= 0.18


def test_text_normalize_is_idempotent(spark, sf_dir):
    """Normalization must be a projection onto its own fixed points:
    normalizing an already-normalized corpus changes nothing."""
    from pyspark.sql import functions as F

    from twitter_hashtag_sentiment_analysis_spark.operators.text_analysis import (
        NORM_STOPWORDS,
    )
    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    once = load_all()["text_normalize"].fn(spark, sf_dir)
    stop = F.array(*[F.lit(w) for w in NORM_STOPWORDS])
    toks = F.filter(
        F.split(F.lower(F.trim("norm_text")), " "),
        lambda w: (w != "") & ~F.array_contains(stop, w),
    )
    twice = once.select(
        "doc_id",
        F.array_join(toks, " ").alias("norm_text2"),
    )
    diff = (
        once.join(twice, "doc_id")
        .filter(F.col("norm_text") != F.col("norm_text2"))
        .count()
    )
    assert diff == 0


def test_markov_rows_are_distributions(spark, sf_dir):
    """Each current-state row of the transition matrix sums to ~1."""
    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    rows = load_all()["event_markov"].fn(spark, sf_dir).collect()
    by_cur: dict[str, float] = {}
    for r in rows:
        by_cur[r.cur] = by_cur.get(r.cur, 0.0) + r.p
    assert by_cur, "empty transition matrix"
    for cur, total in by_cur.items():
        # each p is rounded to 6 dp; |types| rounding errors max
        assert abs(total - 1.0) < 1e-4, (cur, total)


def test_retention_cohort_invariants(spark, sf_dir):
    """Week 0 retains the full cohort; no cell exceeds the cohort."""
    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    rows = load_all()["event_retention_cohort"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.n_active <= r.n_cohort, r
        assert 0.0 < r.retention_pct <= 100.0, r
        if r.week_offset == 0:
            # every cohort member is by definition active in week 0
            assert r.n_active == r.n_cohort, r


def test_ewma_bounded_by_window_extremes(spark, sf_dir):
    """A convex combination of the last K observations can never leave
    their [min, max] envelope."""
    from twitter_hashtag_sentiment_analysis_spark.operators.timeseries import (
        EWMA_DEPTH,
    )
    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    rows = load_all()["ts_ewma"].fn(spark, sf_dir).collect()
    assert rows
    series: dict[str, list] = {}
    for r in sorted(rows, key=lambda r: (r.event_type, r.bucket)):
        series.setdefault(r.event_type, []).append(r)
    for evs in series.values():
        for i, r in enumerate(evs):
            window = [e.obs for e in evs[max(0, i - EWMA_DEPTH + 1) : i + 1]]
            assert min(window) - 1e-6 <= r.ewma <= max(window) + 1e-6, r


def test_basket_lift_counts_consistent(spark, sf_dir):
    """Pair support can't exceed either item support, and lift must be
    positive and consistent with its definition."""
    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    rows = load_all()["agg_basket_lift"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.part_a < r.part_b, r
        assert 0 < r.pair_sup <= min(r.sup_a, r.sup_b), r
        assert r.lift > 0, r


def test_streaks_within_observed_range(spark, sf_dir):
    """A streak can't be longer than the number of distinct days in
    the whole fixture window."""
    from twitter_hashtag_sentiment_analysis_spark.io import table as load

    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    import pyspark.sql.functions as F

    n_days = (
        load(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("d"))
        .distinct()
        .count()
    )
    rows = load_all()["event_streaks"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.longest_streak <= n_days, r


def _bpe_list_scan(word: str) -> int:
    """Reference BPE: apply each merge left-to-right, non-overlapping,
    over the symbol list (Sennrich et al.'s semantics)."""
    from twitter_hashtag_sentiment_analysis_spark.operators.text_analysis import (
        _BPE_MERGES,
    )

    toks = list(word)
    for a, b in _BPE_MERGES:
        out, i = [], 0
        while i < len(toks):
            if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        toks = out
    return len(toks)


def _bpe_double_replace(word: str) -> int:
    """Pure-Python twin of the operators' double-replace string form
    (str.replace is the same left-to-right non-overlapping scan as
    Spark's replace and DuckDB's replace)."""
    from twitter_hashtag_sentiment_analysis_spark.operators.text_analysis import (
        _BPE_MERGES,
    )

    s = " " + " ".join(word) + " "
    for a, b in _BPE_MERGES:
        for _ in range(2):
            s = s.replace(f" {a} {b} ", f" {a}{b} ")
    return len(s.split())


@given(st.text(alphabet="thabelsro", min_size=1, max_size=24))
def test_bpe_double_replace_equals_list_scan(word):
    """The unrolled two-pass replace chain must produce exactly the
    list-scan BPE token count on ANY word — including consecutive
    merge sites sharing a separator space ('abab...'), where a single
    replace pass under-merges."""
    assert _bpe_double_replace(word) == _bpe_list_scan(word), word


def test_scan_xml_roundtrip_schema_and_rows(spark, sf_dir):
    """XML write->read must preserve the events schema and row count
    exactly (values are gated by the oracle; this guards the reader
    contract under the vanilla test session)."""
    from twitter_hashtag_sentiment_analysis_spark.io import table
    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    back = load_all()["scan_xml"].fn(spark, sf_dir)
    orig = table(spark, sf_dir, "events")
    assert back.schema == orig.schema
    assert back.count() == orig.count()


def test_dsir_separates_target_language(spark, sf_dir):
    """The importance weight must rank the target slice above the
    rest: mean logw of English docs strictly exceeds mean logw of
    non-English docs, and selection keeps a nonempty strict subset."""
    from pyspark.sql import functions as F

    from twitter_hashtag_sentiment_analysis_spark.io import table
    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    scored = load_all()["quality_dsir_importance"].fn(spark, sf_dir)
    docs = table(spark, sf_dir, "documents").select("doc_id", "lang")
    j = scored.join(docs, "doc_id")
    m = (
        j.groupBy(F.col("lang") == "en")
        .agg(F.avg("logw").alias("m"))
        .collect()
    )
    means = {r[0]: r["m"] for r in m}
    assert means[True] > means[False]
    n_sel = scored.filter("selected").count()
    assert 0 < n_sel < scored.count()


def test_holt_linear_tracks_trend_better_than_ewma_on_ramp(spark):
    """On a pure linear ramp the Holt forecast must be (near) exact
    while a trendless EWMA lags — the reason the operator exists. Also
    checks the restart-bias bound: after 8 steps of a ramp with slope
    1, level is within the geometric tail of the true value."""
    import pyspark.sql.functions as F

    from twitter_hashtag_sentiment_analysis_spark.operators.timeseries import (
        HOLT_ALPHA,
        HOLT_DEPTH,
        HOLT_GAMMA,
    )

    # replay the unrolled chain in pure Python on a slope-1 ramp
    xs = list(range(1, HOLT_DEPTH + 1))
    l, b = float(xs[0]), 0.0
    for x in xs[1:]:
        l_new = HOLT_ALPHA * x + (1 - HOLT_ALPHA) * (l + b)
        b = HOLT_GAMMA * (l_new - l) + (1 - HOLT_GAMMA) * b
        l = l_new
    forecast = l + b
    true_next = xs[-1] + 1
    # EWMA on the same ramp lags by ~(1-a)/a = 1 step; Holt must do
    # strictly better than half that lag
    assert abs(forecast - true_next) < 0.5


def test_txn_log_commit_is_put_if_absent(tmp_path):
    """Two writers racing to commit the same version: exactly one must
    win (os.link put-if-absent), and the loser's temp file must not
    survive — the isolation contract the snapshot reader relies on."""
    import pytest

    from twitter_hashtag_sentiment_analysis_spark.sources.sinks import (
        _txn_commit,
        _txn_live_files,
    )

    log = tmp_path / "log"
    log.mkdir()
    _txn_commit(str(log), 0, [{"op": "add", "file": "a.parquet"}])
    with pytest.raises(FileExistsError):
        _txn_commit(str(log), 0, [{"op": "add", "file": "b.parquet"}])
    # winner's actions are intact, no temp litter
    assert _txn_live_files(str(log), 0) == ["a.parquet"]
    assert [p.name for p in log.iterdir()] == ["00000000.json"]


def test_txn_time_travel_versions_are_isolated(spark, sf_dir):
    """v0 must keep its pre-cut totals after v1 lands (append
    isolation) and v2 must equal v1's rows with fewer files
    (compaction is metadata-only for readers)."""
    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    rows = {
        r["version"]: r
        for r in load_all()["catalog_txn_time_travel"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert rows[0]["n_rows"] < rows[1]["n_rows"]
    assert rows[1]["n_rows"] == rows[2]["n_rows"]
    assert rows[1]["sum_price"] == rows[2]["sum_price"]
    assert rows[2]["n_files"] < rows[1]["n_files"]


# --- r9: batch-boundary invariance twins -----------------------------------
# Pure-Python twins of the stateful handlers' per-key logic. The oracle
# gate proves fixture equality for ONE batching; these prove the
# algebra that makes any in-order batching equivalent.


def _sessionize_incremental(chunks, gap):
    """Twin of stream_state_timeout_sessions' handler walk: consume
    in-order chunks carrying (start, last, n) state; timeout-flush at
    the end. Returns the emitted session list."""
    out, state = [], None
    for chunk in chunks:
        ts = sorted(chunk)
        if not ts:
            continue
        if state is None:
            start, last, n = ts[0], ts[0], 0
        else:
            start, last, n = state
        for t in ts:
            if n > 0 and t - last > gap:
                out.append((start, last, n))
                start, n = t, 0
            last = t
            n += 1
        state = (start, last, n)
    if state is not None:
        out.append(state)  # watermark timeout flush
    return out


@given(
    ts=st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=60),
    cuts=st.lists(st.integers(min_value=0, max_value=59), max_size=5),
    gap=st.integers(min_value=1, max_value=500),
)
def test_stateful_sessionizer_is_batch_boundary_invariant(ts, cuts, gap):
    """Splitting an in-order event stream into ANY micro-batch chunking
    yields the same sessions as one pass — the property that makes the
    event-time-timeout sessionizer safe under availableNow's batching."""
    ts = sorted(ts)
    one_shot = _sessionize_incremental([ts], gap)
    bounds = sorted({min(c, len(ts)) for c in cuts})
    chunks, prev = [], 0
    for b in bounds + [len(ts)]:
        chunks.append(ts[prev:b])
        prev = b
    assert _sessionize_incremental(chunks, gap) == one_shot


def _cdc_apply_incremental(batches):
    """Twin of stream_cdc_apply's merge: per batch, last-seq-wins per
    key; upserts replace, deletes remove. Returns the final state."""
    state = {}
    for batch in batches:
        latest = {}
        for k, seq, op, val in batch:
            if k not in latest or seq > latest[k][0]:
                latest[k] = (seq, op, val)
        for k, (_seq, op, val) in latest.items():
            if op == "D":
                state.pop(k, None)
            else:
                state[k] = val
    return state


@given(
    ops=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),      # key
            st.sampled_from(["I", "U", "D"]),           # op
            st.integers(min_value=0, max_value=1000),   # payload
        ),
        max_size=40,
    ),
    cuts=st.lists(st.integers(min_value=0, max_value=39), max_size=4),
)
def test_cdc_apply_is_regrouping_invariant(ops, cuts):
    """Any regrouping of a seq-ordered change stream into batches
    produces the same final state — the retry/replay safety property
    stream_cdc_apply's per-batch last-seq-wins merge relies on."""
    seq_ops = [(k, i + 1, op, v) for i, (k, op, v) in enumerate(ops)]
    one_shot = _cdc_apply_incremental([seq_ops])
    bounds = sorted({min(c, len(seq_ops)) for c in cuts})
    batches, prev = [], 0
    for b in bounds + [len(seq_ops)]:
        batches.append(seq_ops[prev:b])
        prev = b
    assert _cdc_apply_incremental(batches) == one_shot


def test_oracle_gate_canon_catches_mismatch_classes():
    """Meta-test of the correctness gate itself: the canon/table_hash
    pair must DISTINGUISH the mismatch classes it exists to catch —
    a flipped last significant float digit, int-vs-float type drift,
    None-vs-0, boolean flips, and row-content changes — while staying
    order-insensitive (the one equivalence it is allowed)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "check_oracle",
        os.path.join(os.path.dirname(__file__), "..", "tools", "check_oracle.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    canon, table_hash = mod.canon, mod.table_hash

    rows = [(1, 2.5, "a", True), (2, 3.25, "b", False)]
    base = table_hash(["i", "x", "s", "b"], rows)
    # order-insensitive: permuting rows must NOT change the hash
    assert table_hash(["i", "x", "s", "b"], rows[::-1]) == base
    # every mismatch class MUST change the hash
    variants = [
        [(1, 2.5000000001, "a", True), (2, 3.25, "b", False)],  # 1-ulp-ish
        [(1, 2, "a", True), (2, 3.25, "b", False)],             # type drift
        [(1, None, "a", True), (2, 3.25, "b", False)],          # null vs value
        [(1, 2.5, "a", False), (2, 3.25, "b", False)],          # bool flip
        [(1, 2.5, "a", True), (2, 3.25, "c", False)],           # string edit
        [(1, 2.5, "a", True)],                                  # row loss
    ]
    for v in variants:
        assert table_hash(["i", "x", "s", "b"], v) != base, v
    # canon float is full-repr (the r8 tightening): no %.6g masking
    assert canon(123.45670000001) != canon(123.4567)

"""Aggregate-operator tests beyond the oracle gate (sketches,
tolerance checks)."""

from pyspark.sql import functions as F

from twitter_hashtag_sentiment_analysis_spark.registry import load_all

load_all()


def test_hll_sketch_estimates_within_tolerance(spark, sf_dir):
    """The operator's within_tol booleans must all be TRUE (that IS the
    oracle contract), its exact_users must match a direct computation,
    and the merged '__all__' sketch must dedup users that appear under
    several event types (raw estimate well below the per-type sum)."""
    from twitter_hashtag_sentiment_analysis_spark.registry import REGISTRY

    rows = REGISTRY["agg_sketch_hll"].fn(spark, sf_dir).collect()
    got = {r["event_type"]: (r["exact_users"], r["within_tol"]) for r in rows}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    exact["__all__"] = ev.select("user_id").distinct().count()
    assert set(got) == set(exact)
    for k, n in exact.items():
        assert got[k] == (n, True), (k, got[k], n)

    # Merge-dedup property on the raw estimates (not in the operator's
    # oracle-gated output, so replayed here with the same expressions).
    per = ev.groupBy("event_type").agg(
        F.expr("hll_sketch_agg(user_id, 12)").alias("sk")
    )
    ests = {
        r["event_type"]: r["est"]
        for r in per.select(
            "event_type", F.expr("hll_sketch_estimate(sk)").cast("long").alias("est")
        ).collect()
    }
    merged_est = (
        per.agg(F.expr("hll_union_agg(sk)").alias("sk"))
        .select(F.expr("hll_sketch_estimate(sk)").cast("long").alias("est"))
        .collect()[0]["est"]
    )
    assert merged_est < sum(ests.values())


def test_approx_quantile_within_sketch_tolerance(spark, sf_dir):
    """percentile_approx must land within rank-error 1/accuracy of the
    exact percentile — compare against the exact per-group quantiles."""
    from twitter_hashtag_sentiment_analysis_spark.registry import load_all
    from pyspark.sql import functions as F

    reg = load_all()
    approx = {
        r["l_returnflag"]: (
            [r["price_p25"], r["price_p50"], r["price_p95"]],
            r["qty_median"],
        )
        for r in reg["agg_approx_quantile"].fn(spark, sf_dir).collect()
    }
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    exact = {
        r["l_returnflag"]: (list(r["pp"]), r["qm"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.expr(
                "percentile(l_extendedprice, array(0.25D, 0.5D, 0.95D))"
            ).alias("pp"),
            F.expr("percentile(l_quantity, 0.5D)").alias("qm"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for flag, (pp_a, qm_a) in approx.items():
        pp_e, qm_e = exact[flag]
        for a, e in zip(pp_a, pp_e):
            assert abs(a - e) <= 0.02 * max(abs(e), 1.0), (flag, a, e)
        assert abs(qm_a - qm_e) <= max(0.05 * abs(qm_e), 1.0), (flag, qm_a, qm_e)


def test_observed_metrics_match_recount(spark, sf_dir):
    """df.observe metrics must equal an independent recount of the
    same filtered scan."""
    from pyspark.sql import functions as F

    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    df = load_all()["obs_metrics"].fn(spark, sf_dir)
    df.collect()  # action materializes the observation
    got = df.observation.get
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_quantity") >= 25
    )
    expect = li.agg(
        F.count(F.lit(1)).alias("rows_seen"),
        F.round(F.sum("l_extendedprice"), 2).alias("price_seen"),
    ).collect()[0]
    assert got["rows_seen"] == expect["rows_seen"]
    assert got["price_seen"] == expect["price_seen"]


def test_ab_ttest_degenerate_groups_yield_null(spark, tmp_path):
    """With one variant missing or n=1 (Welch df denominator 0), the
    t statistic and df must be an agreed NULL, never inf/NaN — the
    cross-engine contract the explicit gate pins."""
    ev = spark.createDataFrame(
        # user_id 2/4 -> variant A (n=2); user_id 1 -> variant B (n=1)
        [
            (1, "2024-01-01 00:00:00", 2, "purchase", 10.0, "{}"),
            (2, "2024-01-01 00:01:00", 4, "purchase", 12.0, "{}"),
            (3, "2024-01-01 00:02:00", 1, "purchase", 11.0, "{}"),
        ],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    ev.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    row = load_all()["stat_ab_ttest"].fn(spark, str(tmp_path)).collect()[0]
    assert row["n_a"] == 2 and row["n_b"] == 1
    assert row["t_stat"] is None and row["welch_df"] is None


def test_skew_kurtosis_matches_numpy_population_moments(spark, sf_dir):
    """The explicit moment assembly must agree with an independent
    numpy computation of population skewness / excess kurtosis."""
    import numpy as np

    from twitter_hashtag_sentiment_analysis_spark.io import table
    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    rows = {
        r["o_orderpriority"]: r
        for r in load_all()["stat_skew_kurtosis"].fn(spark, sf_dir).collect()
    }
    o = table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("x"),
    )
    for prio, r in rows.items():
        xs = np.array(
            [
                q["x"]
                for q in o.filter(F.col("o_orderpriority") == prio).collect()
            ],
            dtype=np.float64,
        )
        mu, sig = xs.mean(), xs.std()  # population
        skew = float(((xs - mu) ** 3).mean() / sig**3)
        kurt = float(((xs - mu) ** 4).mean() / sig**4 - 3)
        assert abs(r["skewness"] - skew) < 1e-4, (prio, r["skewness"], skew)
        assert abs(r["excess_kurtosis"] - kurt) < 1e-4


def test_join_fanout_census_partitions_all_orders(spark, sf_dir):
    from twitter_hashtag_sentiment_analysis_spark.io import table
    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    rows = load_all()["quality_join_fanout_census"].fn(spark, sf_dir).collect()
    n_orders = table(spark, sf_dir, "orders").count()
    n_lineitem = table(spark, sf_dir, "lineitem").count()
    assert sum(r["n_keys"] for r in rows) == n_orders
    assert sum(r["n_rows"] for r in rows) == n_lineitem
    for r in rows:
        if r["log2_bucket"] >= 0:
            lo, hi = 2 ** r["log2_bucket"], 2 ** (r["log2_bucket"] + 1) - 1
            assert lo <= r["min_fanout"] <= r["max_fanout"] <= hi


def test_inter_arrival_percentiles_are_ordered_gaps(spark, sf_dir):
    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    rows = load_all()["ts_inter_arrival"].fn(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 <= r["p50_gap_us"] <= r["p90_gap_us"] <= r["max_gap_us"]
        assert r["n_gaps"] > 0


def test_embed_dim_stats_covers_all_dims_losslessly(spark, sf_dir):
    import numpy as np

    from twitter_hashtag_sentiment_analysis_spark.io import table
    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    rows = load_all()["embed_dim_stats"].fn(spark, sf_dir).collect()
    assert {r["dim"] for r in rows} == set(range(1, 65))
    emb = np.array(
        [r["embedding"] for r in table(spark, sf_dir, "embeddings").collect()],
        dtype=np.float64,
    )
    for r in rows[:8]:
        col = emb[:, r["dim"] - 1]
        assert abs(r["mean"] - col.mean()) < 2e-6
        assert abs(r["variance"] - col.var()) < 2e-6


def test_bollinger_bands_bracket_the_sma(spark, sf_dir):
    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    rows = load_all()["ts_bollinger"].fn(spark, sf_dir).collect()
    assert rows
    inside = 0
    for r in rows:
        assert r["lower_band"] <= r["sma"] <= r["upper_band"]
        if r["lower_band"] * 100 <= r["cents"] <= r["upper_band"] * 100:
            inside += 1
    # ~95% of points sit inside a 2-sigma band on a stationary series
    assert inside / len(rows) > 0.8


def test_execute_immediate_binds_the_parameter(spark, sf_dir):
    """The bound date actually filters: totals differ from the
    unfiltered aggregate and match a directly-executed query."""
    from twitter_hashtag_sentiment_analysis_spark.io import table
    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    got = {
        r["o_orderpriority"]: (r["n_orders"], r["cents"])
        for r in load_all()["sql_execute_immediate"].fn(spark, sf_dir).collect()
    }
    o = table(spark, sf_dir, "orders")
    direct = {
        r["o_orderpriority"]: (r["n"], r["c"])
        for r in o.filter(F.col("o_orderdate") >= "1997-01-01")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            .cast("long")
            .alias("c"),
        )
        .collect()
    }
    assert got == direct
    assert sum(v[0] for v in got.values()) < o.count()


def test_hll_intersection_emits_zero_overlap_pairs(spark, tmp_path):
    """A type pair with NO common users must still be emitted
    (exact_common_users=0) with a defined within_tol — the r9 advisor
    found the inner-join silently dropped such pairs and the relative
    tolerance div-by-zeroed. Planted fixture: 'a' and 'b' share user
    sets, 'c' is fully disjoint."""
    import datetime as dt

    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for et, users in (
        ("a", range(0, 40)),
        ("b", range(20, 60)),
        ("c", range(1000, 1040)),
    ):
        for u in users:
            eid += 1
            rows.append((eid, t0, u, et, 1.0, "{}"))
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {
        (r["type_a"], r["type_b"]): r
        for r in load_all()["agg_hll_intersection"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    # all three pairs present, including both zero-overlap ones
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    assert out[("a", "b")]["exact_common_users"] == 20
    assert out[("a", "c")]["exact_common_users"] == 0
    assert out[("b", "c")]["exact_common_users"] == 0
    # within_tol is DEFINED (not null) everywhere; at these tiny
    # cardinalities the sketches are near-exact so all pairs pass
    assert all(r["within_tol"] is True for r in out.values())


def test_m4_px_expression_parity_at_boundary_epoch(spark, tmp_path):
    """Spark's px and the oracle SQL's px must use the same IEEE op
    sequence: at epochs >= ~8.5e15 us the old associations
    (us/86400e6/30*20 vs us/(86400e6*30/20)) differ by one pixel at
    bucket boundaries. Plant timestamps in that range sitting exactly
    ON a bucket boundary and 1 us before it; DuckDB (oracle SQL) and
    Spark must agree on every px."""
    import duckdb

    from twitter_hashtag_sentiment_analysis_spark.operators.timeseries import (
        M4_BUCKETS,
    )
    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    us_per_px = 86_400_000_000.0 * 30 / M4_BUCKETS
    # pick a boundary multiple beyond the divergence threshold
    k = int(9.0e15 / us_per_px)
    boundary_us = int(k * us_per_px)
    rows_us = [boundary_us - 1, boundary_us, boundary_us + 1]
    df = spark.createDataFrame(
        [
            (
                i + 1,
                __import__("datetime").datetime.utcfromtimestamp(0)
                + __import__("datetime").timedelta(microseconds=us),
                7,
                "click",
                1.0,
                "{}",
            )
            for i, us in enumerate(rows_us)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    q = load_all()["ts_downsample_m4"]
    spark_px = sorted(
        r["px"] for r in q.fn(spark, str(tmp_path)).collect() for _ in range(r["n"])
    )
    con = duckdb.connect()
    for t in ("events",):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{tmp_path}/{t}.parquet/*.parquet')"
        )
    oracle_px = sorted(
        px
        for (px, n) in con.execute(
            f"WITH o AS ({q.sql}) SELECT px, n FROM o"
        ).fetchall()
        for _ in range(n)
    )
    assert spark_px == oracle_px

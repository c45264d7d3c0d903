"""Aggregate-operator tests beyond the oracle gate (sketches,
tolerance checks)."""

from pyspark.sql import functions as F

from twitter_hashtag_sentiment_analysis_spark.registry import load_all

load_all()


def test_hll_sketch_estimates_within_tolerance(spark, sf_dir):
    """Sketch estimates must track exact distinct counts (<2% relative
    error at fixture cardinality), and the merged '__all__' sketch must
    dedup users that appear under several event types (estimate close
    to the GLOBAL distinct count, well below the per-type sum)."""
    from twitter_hashtag_sentiment_analysis_spark.registry import REGISTRY

    got = {
        r["event_type"]: r["est_users"]
        for r in REGISTRY["agg_sketch_hll"].fn(spark, sf_dir).collect()
    }
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
        assert abs(got[k] - n) <= max(1, 0.02 * n), (k, got[k], n)
    assert got["__all__"] < sum(v for k, v in got.items() if k != "__all__")

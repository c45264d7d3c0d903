"""Per-key micro-profiler: split plan-build from execution wall.

Usage: python tools/profile_key.py [--reps N] key [key ...]

For each key, times (a) the registered fn() call — DataFrame/plan
construction, pure driver work — and (b) the noop-sink execution, the
same action bench.py times, REPEATED --reps times (default 3) with the
bench's settle() between runs. Prints one line per rep plus a min
summary, so a key whose bench wall is dominated by driver-side plan
building (Catalyst analysis of a huge expression tree) is
distinguishable from one whose wall is executor compute. Follows the
bench contract: $SPARK_GRAFT_SF_DIR, local[$SPARK_GRAFT_CPUS].
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from twitter_hashtag_sentiment_analysis_spark.io import (
    dir_cache_restore,
    dir_cache_snapshot,
)
from twitter_hashtag_sentiment_analysis_spark.registry import load_all
from twitter_hashtag_sentiment_analysis_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    if args and args[0] == "--reps":
        reps = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("thsa-profile")
    reg = load_all()

    # same warmup as bench.py (JVM, parquet footers, shuffle, python pools)
    warm = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    warm.count()
    warm.groupBy("l_returnflag").count().write.format("noop").mode(
        "overwrite"
    ).save()

    def _ident(it):
        yield from it

    spark.range(64).repartition(2).mapInPandas(_ident, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    def settle() -> None:
        spark.catalog.clearCache()
        gc.collect()
        spark._jvm.System.gc()
        time.sleep(0.5)

    for name in args:
        snap = dir_cache_snapshot()
        for rep in range(reps):
            dir_cache_restore(snap)
            t0 = time.perf_counter()
            df = reg[name].fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            print(
                f"{name} rep{rep}: build={t1 - t0:.3f}s exec={t2 - t1:.3f}s "
                f"total={t2 - t0:.3f}s",
                flush=True,
            )
            settle()


if __name__ == "__main__":
    main()

"""Replication-stress the pairwise dedup/similarity family with output
normalization.

Usage: python tools/stress_family.py <sf_dir> <key> [key ...]

bench.py's exact measurement shape — warm session, noop-sink write
timed, gc + JVM gc + settle between keys — with output rows counted ON
the timed run via ``df.observe`` (a count aggregate piggybacked on the
noop-sink action), so out_rows and wall_sec come from the SAME
execution.  The previous untimed-replay count mixed two executions for
the adaptive operators (the second run re-executes the dup-ratio probe
and checkpoints — r12 advisor finding).  The pairwise family's output
grows quadratically in the copy factor (C(25,2) = 300 intra pairs per
duplicated group at x25 vs 0 at sf0.1), so wall ratios alone read as
regressions when the key is actually output-bound (r11 verdict item 5,
extended from the streaming family to this one).

Prints one JSON line per key:
  {"key": ..., "sf_dir": ..., "wall_sec": ..., "out_rows": ...,
   "out_rows_per_sec": ..., "count_method": "observed_same_run"}
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Observation
from pyspark.sql import functions as F

from twitter_hashtag_sentiment_analysis_spark.registry import load_all
from twitter_hashtag_sentiment_analysis_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1]
    keys = sys.argv[2:]
    spark = get_spark("thsa-family-stress")
    reg = load_all()
    # bench.py's warmup shape: JVM + parquet footers + one shuffle
    warm = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    warm.count()
    warm.groupBy("l_returnflag").count().write.format("noop").mode(
        "overwrite"
    ).save()
    for i, key in enumerate(keys):
        t0 = time.perf_counter()
        df = reg[key].fn(spark, sf_dir)
        # observe() piggybacks a count(*) on the SAME noop-sink action,
        # so out_rows is the timed run's own cardinality — no replay,
        # and the observation adds one scalar accumulator, not a job.
        # The position suffix keeps names unique when the CLI is given
        # the same key twice (Observation names are session-unique).
        obs = Observation(f"stress:{key}:{i}")
        df.observe(obs, F.count(F.lit(1)).alias("rows")).write.format(
            "noop"
        ).mode("overwrite").save()
        wall = round(time.perf_counter() - t0, 3)
        n = int(obs.get["rows"])
        print(
            json.dumps(
                {
                    "key": key,
                    "sf_dir": os.path.basename(sf_dir.rstrip("/")),
                    "wall_sec": wall,
                    "out_rows": n,
                    "out_rows_per_sec": round(n / wall, 1) if wall > 0 else None,
                    "count_method": "observed_same_run",
                }
            ),
            flush=True,
        )
        spark.catalog.clearCache()
        gc.collect()
        spark._jvm.System.gc()
        time.sleep(0.5)


if __name__ == "__main__":
    main()

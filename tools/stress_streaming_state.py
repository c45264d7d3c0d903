"""Replication-stress the stateful streaming keys with a state-size probe.

Usage: python tools/stress_streaming_state.py <sf_dir> <key> [key ...]

Runs each registry key against <sf_dir> in this process (bench.py's
warm-session shape) and, via a session-wide StreamingQueryListener,
records the LAST progress event's state-operator metrics for every
streaming query the key drains — the piece bench wall-clock alone
cannot show: whether state stays bounded by the watermark horizon when
the input is replicated x5 / x25 (the r10 verdict item 6 gap).

Prints one JSON line per key:
  {"key": ..., "wall_sec": ..., "state": [{"operator": ...,
    "numRowsTotal": ..., "memoryUsedBytes": ...}, ...]}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.streaming import StreamingQueryListener

from twitter_hashtag_sentiment_analysis_spark.registry import load_all
from twitter_hashtag_sentiment_analysis_spark.session import get_spark


class _StateProbe(StreamingQueryListener):
    """Keep the latest progress per query run; state ops accumulate."""

    def __init__(self):
        self.latest: dict = {}

    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        p = event.progress
        ops = [
            {
                "operator": so.get("operatorName", "?"),
                "numRowsTotal": so.get("numRowsTotal"),
                "memoryUsedBytes": so.get("memoryUsedBytes"),
            }
            for so in (json.loads(p.json).get("stateOperators") or [])
        ]
        if ops:
            self.latest[str(p.runId)] = ops

    def onQueryTerminated(self, event):
        pass

    def onQueryIdle(self, event):
        pass


def main() -> None:
    sf_dir = sys.argv[1]
    keys = sys.argv[2:]
    spark = get_spark("thsa-stream-stress")
    probe = _StateProbe()
    spark.streams.addListener(probe)
    reg = load_all()
    for key in keys:
        probe.latest.clear()
        t0 = time.time()
        n = reg[key].fn(spark, sf_dir).count()
        wall = round(time.time() - t0, 3)
        state = [op for ops in probe.latest.values() for op in ops]
        print(
            json.dumps(
                {
                    "key": key,
                    "sf_dir": os.path.basename(sf_dir.rstrip("/")),
                    "wall_sec": wall,
                    "rows": n,
                    "state": state,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()

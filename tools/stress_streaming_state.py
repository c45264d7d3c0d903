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
    """Keep the latest progress per query run; state ops accumulate.

    Listener events arrive ASYNCHRONOUSLY on the listener bus, so two
    races exist (r11 advisor finding): the final progress event of a
    just-drained query may not have landed yet when the caller reads,
    and a LATE event from a previous key's stopped query may land after
    a clear() and be misattributed. Both are closed by attribution, not
    timing alone: ``started`` records the runIds launched since the
    last ``begin()``, ``snapshot()`` filters to exactly those, and
    ``settle()`` polls until the event stream goes quiet."""

    def __init__(self):
        self.latest: dict = {}
        self.started: set = set()

    def begin(self):
        self.latest = {}
        self.started = set()

    def onQueryStarted(self, event):
        self.started.add(str(event.runId))

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

    def settle(self, quiet_sec: float = 0.5, max_sec: float = 5.0) -> None:
        """Wait until no new progress event arrives for quiet_sec."""
        deadline = time.time() + max_sec
        snap = {k: len(v) for k, v in self.latest.items()}
        quiet_since = time.time()
        while time.time() < deadline:
            time.sleep(0.1)
            cur = {k: len(v) for k, v in self.latest.items()}
            if cur != snap:
                snap = cur
                quiet_since = time.time()
            elif time.time() - quiet_since >= quiet_sec:
                return

    def snapshot(self) -> list:
        return [
            op
            for run_id, ops in self.latest.items()
            if run_id in self.started
            for op in ops
        ]

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
        probe.begin()
        t0 = time.time()
        n = reg[key].fn(spark, sf_dir).count()
        wall = round(time.time() - t0, 3)
        probe.settle()
        state = probe.snapshot()
        state_rows = sum(op["numRowsTotal"] or 0 for op in state)
        print(
            json.dumps(
                {
                    "key": key,
                    "sf_dir": os.path.basename(sf_dir.rstrip("/")),
                    "wall_sec": wall,
                    "rows": n,
                    # Normalized columns (r11 verdict item 5): a 25x input
                    # whose OUTPUT also grows 25x reads as a regression on
                    # wall alone; rows/sec makes output-bound vs
                    # state-bound legible at a glance.
                    "out_rows_per_sec": round(n / wall, 1) if wall > 0 else None,
                    "state_rows_total": state_rows,
                    "state_rows_per_sec": (
                        round(state_rows / wall, 1) if wall > 0 else None
                    ),
                    "state": state,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()

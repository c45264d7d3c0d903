"""Dump ``explain("formatted")`` for registered queries to plans/<tag>/.

Usage: python tools/capture_plans.py <tag> <suffix> [key ...]

Writes plans/<tag>/<key>_<suffix>.txt for each key (default: every
registered key). The optimization-round judge reads these files to check
plan claims (Exchange counts, join strategies, PushedFilters) against
the code, so the capture is the PLAN ONLY — no execution, no timing.
Streaming keys whose registered fn drains a query on call are skipped
unless explicitly named (their plan is the batch replay's, and building
it requires the drain).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from twitter_hashtag_sentiment_analysis_spark.registry import load_all
from twitter_hashtag_sentiment_analysis_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1]
    suffix = sys.argv[2]
    keys = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("thsa-capture-plans")
    reg = load_all()
    names = keys or sorted(reg)
    for name in names:
        try:
            df = reg[name].fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 - record the failure, move on
            plan = f"CAPTURE FAILED: {type(e).__name__}: {e}\n"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"captured {name}")


if __name__ == "__main__":
    main()

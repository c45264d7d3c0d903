"""Propose the next round's driver-sample prefix.

The external correctness gate samples the first 50 keys of
``registry.load_all()``. ``registry._DRIVER_SAMPLE_PREFIX`` pins that
block explicitly; this tool computes what the NEXT round's prefix
should be so every oracle-backed key eventually receives a driver
CORRECTNESS row:

1. collect every key that already has a green row in any
   ``CORRECTNESS_r*.json`` at the repo root (the driver's records),
2. list the oracle-backed keys that still lack one, in registry order,
3. print the first 50 as a ready-to-paste ``_DRIVER_SAMPLE_PREFIX``
   tuple (falling back to already-adjudicated keys if fewer than 50
   remain — re-adjudication is harmless).

Usage: python tools/next_sample_prefix.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from twitter_hashtag_sentiment_analysis_spark.registry import load_all


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    adjudicated: set[str] = set()
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            rows = json.load(f)
        for key, row in rows.items():
            if isinstance(row, dict) and row.get("err") is None:
                adjudicated.add(key)
    reg = load_all()
    oracle_backed = [k for k, q in reg.items() if q.sql is not None]
    pending = [k for k in oracle_backed if k not in adjudicated]
    done = [k for k in oracle_backed if k in adjudicated]
    prefix = (pending + done)[:50]
    print(
        f"# adjudicated so far: {len(adjudicated)}; oracle-backed pending: "
        f"{len(pending)}; proposed next prefix:"
    )
    print("_DRIVER_SAMPLE_PREFIX = (")
    for k in prefix:
        print(f'    "{k}",')
    print(")")


if __name__ == "__main__":
    main()

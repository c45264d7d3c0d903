"""Append a continuation section to a SCALING_STRESS artifact.

Usage:
    python tools/merge_stress_continuation.py [--artifact=PATH] \
        <bench_sf01.json> <bench_x5.json> <keys...>

--artifact defaults to the newest SCALING_STRESS_r*.json at the repo
root; pass it explicitly to seed a new round's artifact (the file must
exist — copy the previous round's as the base).

Reads the two bench.py outputs (full-line JSON with a per-query map),
extracts the named keys, and writes a `continuation_new_keys` block
with sf0.1 / 5x timings and ratios. Used for operators added after the
main stress sweep ran, so the artifact stays complete without
re-measuring 163 unchanged queries.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            d = json.loads(line)
            if "queries" in d:
                return d
    raise SystemExit(f"no full bench line in {path}")


def main() -> None:
    args = sys.argv[1:]
    artifact = None
    if args and args[0].startswith("--artifact="):
        artifact = args[0].split("=", 1)[1]
        args = args[1:]
    if artifact is None:
        import glob
        import os
        import re

        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        cands = glob.glob(os.path.join(root, "SCALING_STRESS_r*.json"))
        if not cands:
            raise SystemExit("no SCALING_STRESS_r*.json found")
        # newest ROUND, not lexicographically-last filename (r9 < r10)
        artifact = max(
            cands,
            key=lambda p: int(
                re.search(r"_r(\d+)\.json$", p).group(1)
            ),
        )
    base, x5, keys = args[0], args[1], args[2:]
    a, b = load(base), load(x5)
    rows = {}
    for k in keys:
        lo, hi = a["queries"].get(k), b["queries"].get(k)
        if lo is None or hi is None:
            raise SystemExit(f"{k} missing from a bench output")
        rows[k] = {
            "sf01_sec": lo,
            "x5_sec": hi,
            "ratio": round(hi / lo, 3) if lo > 0 else None,
        }
    doc = json.load(open(artifact))
    # merge: keep rows from earlier continuation batches
    prior = doc.get("continuation_new_keys", {}).get("queries", {})
    rows = {**prior, **rows}
    doc["continuation_new_keys"] = {
        "note": (
            "operators added after the main sweep (same procedure: "
            "SPARK_GRAFT_ISOLATE=1, same 5x replica dir rebuilt with "
            "the per-key-domain offsets); sample_downweight_dups is "
            "dup-SENSITIVE by construction (5-way exact duplication "
            "grows every cluster 5x, which is the workload it exists "
            "to measure); ml_sentiment_mllib's fit cost is a bounded "
            "constant (4096-row sample), only scoring scales; fn_xml "
            "runs on a 1-in-20 key slice by design (per-row StAX "
            "parser), so its x5 number measures 5x the sliced rows"
        ),
        "queries": rows,
    }
    json.dump(doc, open(artifact, "w"), indent=1)
    print(f"-> {artifact}")
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()

"""Assemble SCALING_r{N}.json from two bench.py runs.

Usage: python tools/make_scaling.py <bench_sf0.01.json> <bench_sf0.1.json> <out.json>

The artifact carries BOTH raw per-query timing maps plus the per-query
10x-step ratio, so a reviewer can recompute every claim in SCALING.md
instead of trusting prose.
"""

from __future__ import annotations

import json
import statistics
import sys


def load(path: str) -> dict:
    # bench.py prints the full line first, compact summary last;
    # take the first line that has the per-query map
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
    lo, hi, out = sys.argv[1], sys.argv[2], sys.argv[3]
    a, b = load(lo), load(hi)
    ratios = {
        k: round(b["queries"][k] / a["queries"][k], 3)
        for k in a["queries"]
        if k in b["queries"] and a["queries"][k] > 0
    }
    doc = {
        "method": "bench.py per-query wall-clock (plan-build + execute to noop sink, warmed JVM)",
        "sf_low": a["sf"],
        "sf_high": b["sf"],
        "total_low_sec": a["value"],
        "total_high_sec": b["value"],
        "n_queries": len(a["queries"]),
        "median_ratio": round(statistics.median(ratios.values()), 3),
        "max_ratio": max(ratios.items(), key=lambda kv: kv[1]),
        "queries_low": a["queries"],
        "queries_high": b["queries"],
        "ratio_high_over_low": dict(sorted(ratios.items(), key=lambda kv: -kv[1])),
    }
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    print(
        f"{out}: total {a['value']}s @ sf{a['sf']} -> {b['value']}s @ sf{b['sf']}, "
        f"median ratio {doc['median_ratio']}, max {doc['max_ratio']}"
    )


if __name__ == "__main__":
    main()

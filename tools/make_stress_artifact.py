"""Assemble SCALING_STRESS_r{N}.json from stress-run JSONL outputs.

Usage:
  python tools/make_stress_artifact.py <round> tag=family.jsonl ...
      [--stream tag=streaming.jsonl ...]

Family lines come from tools/stress_family.py (wall + out_rows +
rows/sec per key per dir); streaming lines from
tools/stress_streaming_state.py (wall + rows + state-operator metrics +
normalized columns). Tags name the axes (sf0.1, x5, x25, x100); every
non-baseline axis gets a ratio table against the sf0.1 tag.

Ratio schema (r14 verdict item 4): each ratio entry carries the WALL
ratio, the OUT_ROWS growth, and the THROUGHPUT (rows/sec) ratio side
by side, plus an `output_bound` flag (out_rows grew by more than half
the wall ratio). A pairwise or stateful key whose OUTPUT grows with
replication reads as a wall regression until rows/sec sits beside it
(r11 verdict item 5, now structural in the artifact instead of
re-litigated in prose every round): for output-bound keys the number
to adjudicate is throughput_ratio (>1 = throughput RISES with scale),
for the rest it is wall_ratio.
"""

from __future__ import annotations

import json
import sys

BASE = "sf0.1"


def _pairs(args: list[str]) -> list[tuple[str, str]]:
    out = []
    for a in args:
        tag, _, path = a.partition("=")
        if not path:
            raise SystemExit(f"expected tag=path, got {a!r}")
        out.append((tag, path))
    return out


def main() -> None:
    rnd = int(sys.argv[1])
    rest = sys.argv[2:]
    split = rest.index("--stream") if "--stream" in rest else len(rest)
    fam_pairs = _pairs(rest[:split])
    stream_pairs = _pairs(rest[split + 1 :])

    fam: dict[str, dict] = {}
    for tag, path in fam_pairs:
        for line in open(path):
            r = json.loads(line)
            fam.setdefault(r["key"], {})[tag] = {
                "wall_sec": r["wall_sec"],
                "out_rows": r["out_rows"],
                "out_rows_per_sec": r["out_rows_per_sec"],
            }

    def ratios(key: str, tag: str) -> dict | None:
        pa, pb = fam[key].get(tag), fam[key].get(BASE)
        if not pa or not pb or not pb["wall_sec"] or not pa["wall_sec"]:
            return None
        wall = round(pa["wall_sec"] / pb["wall_sec"], 2)
        rows = (
            round(pa["out_rows"] / pb["out_rows"], 2)
            if pb["out_rows"]
            else None
        )
        tput = (
            round(pa["out_rows_per_sec"] / pb["out_rows_per_sec"], 2)
            if pb["out_rows_per_sec"]
            else None
        )
        return {
            "wall_ratio": wall,
            "out_rows_ratio": rows,
            "throughput_ratio": tput,
            # output grew at least half as fast as wall: the wall ratio
            # is dominated by result cardinality, adjudicate throughput
            "output_bound": bool(rows and rows >= max(2.0, wall / 2)),
        }

    streaming: dict[str, dict] = {}
    for tag, path in stream_pairs:
        for line in open(path):
            r = json.loads(line)
            streaming.setdefault(r["key"], {})[tag] = {
                k: r[k]
                for k in (
                    "wall_sec",
                    "rows",
                    "out_rows_per_sec",
                    "state_rows_total",
                    "state_rows_per_sec",
                    "state",
                )
                if k in r
            }

    out: dict = {
        "method": (
            "family: tools/stress_family.py — bench.py's measurement shape "
            "(warm session, noop-sink write timed, gc+settle between keys) "
            "with out_rows OBSERVED ON THE TIMED RUN via df.observe "
            "(r12 advisor: the earlier untimed-replay count mixed two "
            "executions for the adaptive operators); xN = FK-consistent "
            "replication of sf0.1 (tools/make_synth_sf.py); streaming: "
            "tools/stress_streaming_state.py with runId-attributed "
            "state-operator metrics and the same normalized columns; "
            "ratio entries carry wall + out_rows + throughput ratios and "
            "an output_bound flag (r14 verdict item 4) — adjudicate "
            "throughput_ratio for output-bound keys, wall_ratio otherwise"
        ),
        "round": rnd,
        "family": fam,
        "streaming_state_observations": streaming,
    }
    worst: dict = {}
    for tag, _ in fam_pairs:
        if tag == BASE:
            continue
        table = {k: ratios(k, tag) for k in sorted(fam)}
        table = {k: v for k, v in table.items() if v}
        out[f"ratio_{tag.replace('.', '')}_over_sf01"] = table
        walls = {
            k: v["wall_ratio"]
            for k, v in table.items()
            if not v["output_bound"]
        }
        if walls:
            w = max(walls, key=walls.get)
            worst[tag] = [w, walls[w]]
    if worst:
        out["worst_wall_ratio_non_output_bound"] = worst
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

"""Assemble SCALING_STRESS_r{N}.json from stress-run JSONL outputs.

Usage:
  python tools/make_stress_artifact.py <round> <family_sf01.jsonl>
      <family_x5.jsonl> <family_x25.jsonl> [streaming.jsonl ...]

Family lines come from tools/stress_family.py (wall + out_rows +
rows/sec per key per dir); streaming lines from
tools/stress_streaming_state.py (wall + rows + state-operator metrics +
normalized columns). The assembler computes the x5/x25 wall ratios AND
the per-output-row normalized ratios (r11 verdict item 5: a pairwise or
stateful key whose OUTPUT grows with replication reads as a wall
regression until rows/sec sits beside it).
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    rnd = int(sys.argv[1])
    fam_files = sys.argv[2:5]
    stream_files = sys.argv[5:]

    fam: dict[str, dict] = {}
    tags = ["sf0.1", "x5", "x25"]
    for tag, path in zip(tags, fam_files):
        for line in open(path):
            r = json.loads(line)
            fam.setdefault(r["key"], {})[tag] = {
                "wall_sec": r["wall_sec"],
                "out_rows": r["out_rows"],
                "out_rows_per_sec": r["out_rows_per_sec"],
            }

    def ratio(key: str, a: str, b: str) -> float | None:
        pa, pb = fam[key].get(a), fam[key].get(b)
        if not pa or not pb or not pb["wall_sec"]:
            return None
        return round(pa["wall_sec"] / pb["wall_sec"], 2)

    streaming: dict[str, dict] = {}
    for path in stream_files:
        for line in open(path):
            r = json.loads(line)
            streaming.setdefault(r["key"], {})[r["sf_dir"].replace(
                "synth_", ""
            )] = {
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

    out = {
        "method": (
            "family: tools/stress_family.py — bench.py's measurement shape "
            "(warm session, noop-sink write timed, gc+settle between keys) "
            "with out_rows OBSERVED ON THE TIMED RUN via df.observe "
            "(r12 advisor: the earlier untimed-replay count mixed two "
            "executions for the adaptive operators) "
            "(pairwise output grows ~quadratically in the copy factor: "
            "C(25,2)=300 intra pairs per duplicated group at x25 vs 0 at "
            "sf0.1); x5/x25 = FK-consistent replication of sf0.1 "
            "(tools/make_synth_sf.py); streaming: "
            "tools/stress_streaming_state.py with runId-attributed "
            "state-operator metrics and the same normalized columns"
        ),
        "round": rnd,
        "family": fam,
        "ratio_x5_over_sf01": {
            k: ratio(k, "x5", "sf0.1") for k in sorted(fam)
        },
        "ratio_x25_over_sf01": {
            k: ratio(k, "x25", "sf0.1") for k in sorted(fam)
        },
        "streaming_state_observations": streaming,
    }
    r25 = {k: v for k, v in out["ratio_x25_over_sf01"].items() if v}
    if r25:
        worst = max(r25, key=r25.get)
        out["worst_x25_ratio"] = [worst, r25[worst]]
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

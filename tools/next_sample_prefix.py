"""Propose the next round's driver-sample prefix + the full rotation plan.

The external correctness gate samples the first 50 keys of
``registry.load_all()``. ``registry._DRIVER_SAMPLE_PREFIX`` pins that
block explicitly; this tool computes what the NEXT round's prefix
should be so every oracle-backed key eventually receives a green
driver CORRECTNESS row:

1. for each key, find its LATEST row across ``CORRECTNESS_r*.json``
   (latest-row semantics: a key whose newest row is red needs
   re-adjudication even if an older round was green),
2. list the oracle-backed keys whose latest row is missing or red,
   prioritized the way a reference user would hit them:
   previously-red-but-since-fixed keys first, then ``stream_*``,
   then the TPC-H composites / ``sql_*`` surfaces, then the rest in
   registry order,
3. print the first 50 as a ready-to-paste ``_DRIVER_SAMPLE_PREFIX``
   tuple (falling back to already-adjudicated keys if fewer than 50
   remain — re-adjudication is harmless), and
4. write the WHOLE pending queue, chunked by 50, to
   ``tools/sample_rotation_plan.json`` so future rounds are a
   mechanical paste (referenced from SURVEY.md §5).

Usage: python tools/next_sample_prefix.py [next_round_number]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from twitter_hashtag_sentiment_analysis_spark.registry import load_all


def pending_queue(root: str) -> tuple[list[str], int]:
    """Oracle-backed keys whose LATEST driver row is missing or red,
    in user-priority order. Returns (queue, n_latest_green)."""
    queue, n_green, _ = pending_queue_with_ages(root)
    return queue, n_green


def pending_queue_with_ages(root: str) -> tuple[list[str], int, dict]:
    """Like pending_queue, but also returns {key: newest round with a
    driver row} so the prefix padding can re-adjudicate the STALEST
    greens first (r9 judge item 5: 100+ keys' latest green predates
    later refactors; age-ordered re-sampling retires that risk)."""
    latest_green: dict[str, bool] = {}
    latest_round: dict[str, int] = {}
    # Sort by the PARSED round number, not filename order: lexicographic
    # sorting only matched round order because the files are zero-padded
    # (r01..r10); r100 or an unpadded name would let an older round's row
    # overwrite a newer one (r10 advisor finding).
    paths = sorted(
        glob.glob(os.path.join(root, "CORRECTNESS_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
    )
    for path in paths:
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        with open(path) as f:
            rows = json.load(f)
        for key, row in rows.items():
            if isinstance(row, dict):
                # Green requires the value hash (r7 shipped three rows
                # with err=null but hash_match=false; err-only made the
                # queue skip them).
                latest_green[key] = row.get("err") is None and bool(
                    row.get("hash_match", row.get("rows_match", False))
                )
                latest_round[key] = max(latest_round.get(key, 0), rnd)
    reg = load_all()
    oracle = [k for k, q in reg.items() if q.sql is not None]
    pending = [k for k in oracle if not latest_green.get(k, False)]
    # fixed-but-red first (had a red row at some point => need a fresh green)
    red_fixed = [k for k in pending if k in latest_green]
    streams = [k for k in pending if k.startswith("stream_") and k not in red_fixed]
    composites = [
        k
        for k in pending
        if (k.startswith("q_") or k.startswith("sql_"))
        and k not in red_fixed
        and k not in streams
    ]
    rest = [k for k in pending if k not in red_fixed and k not in streams and k not in composites]
    queue = red_fixed + streams + composites + rest
    n_green = sum(1 for k in oracle if latest_green.get(k, False))
    return queue, n_green, latest_round


def source_change_rounds(root: str) -> dict[str, int]:
    """{repo-relative source file: newest ROUND whose work changed it},
    from git history. Commits between ``round N: verdict...`` and
    ``round N+1: verdict...`` markers are round-(N+1) work; work after
    the newest marker belongs to the in-flight round. Used to rank
    CHANGED-SINCE-ADJUDICATED keys ahead of untouched older keys in the
    sample padding (r11 verdict item 1: 35 keys' latest driver row was
    r4-era while their files took r8-r11 kernel refactors)."""
    import subprocess

    out = subprocess.run(
        ["git", "-C", root, "log", "--reverse", "--format=@@%s", "--name-only"],
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    cur_round = 1
    file_round: dict[str, int] = {}
    for line in out.splitlines():
        if line.startswith("@@"):
            commit_round = cur_round
            m = re.match(r"@@round (\d+): verdict", line)
            if m:
                cur_round = int(m.group(1)) + 1
        elif line.strip():
            file_round[line.strip()] = max(
                file_round.get(line.strip(), 0), commit_round
            )
    return file_round


def key_source_files(root: str) -> dict[str, str]:
    """{registry key: repo-relative source file of its query fn}."""
    import inspect

    reg = load_all()
    out = {}
    for k, q in reg.items():
        try:
            src = inspect.getsourcefile(inspect.unwrap(q.fn))
            out[k] = os.path.relpath(src, root)
        except TypeError:  # pragma: no cover - builtins
            pass
    return out


def infer_next_round(root: str) -> int:
    """Next round number = newest CORRECTNESS_r*.json + 1."""
    rounds = [
        int(re.search(r"r(\d+)", os.path.basename(p)).group(1))
        for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))
    ]
    return (max(rounds) if rounds else 0) + 1


def build_prefix(
    queue: list[str],
    latest_round: dict | None = None,
    root: str | None = None,
) -> list[str]:
    """The 50-key driver block: the pending queue, padded with
    already-green keys when fewer than 50 remain (re-adjudication is
    harmless). Padding order (r11 verdict item 1):

    1. CHANGED-SINCE-ADJUDICATED first — any key whose source file was
       touched by a round AFTER its latest driver row (its green may
       predate the code it certifies), oldest driver row first so
       r4-era rows retire before fresher ones;
    2. untouched keys, oldest driver row first;
    registry order breaks ties throughout."""
    reg = load_all()
    oracle = [k for k, q in reg.items() if q.sql is not None]
    order = {k: i for i, k in enumerate(oracle)}
    done = [k for k in oracle if k not in queue]
    if latest_round:
        changed_after: dict[str, bool] = {}
        if root is not None:
            file_round = source_change_rounds(root)
            key_file = key_source_files(root)
            changed_after = {
                k: file_round.get(key_file.get(k, ""), 0)
                > latest_round.get(k, 0)
                for k in done
            }
        done.sort(
            key=lambda k: (
                not changed_after.get(k, False),
                latest_round.get(k, 0),
                order[k],
            )
        )
    return (queue + done)[:50]


def build_plan(queue: list[str], next_round: int) -> dict:
    """The committed rotation schedule: the whole pending queue in
    50-key chunks keyed r<round>."""
    return {
        "generated_for_round": next_round,
        "pending_total": len(queue),
        "chunks": {
            f"r{next_round + i // 50}": queue[i : i + 50]
            for i in range(0, len(queue), 50)
        },
    }


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    next_round = (
        int(sys.argv[1]) if len(sys.argv) > 1 else infer_next_round(root)
    )
    queue, n_green, latest_round = pending_queue_with_ages(root)
    prefix = build_prefix(queue, latest_round, root)
    print(
        f"# oracle-backed keys latest-green: {n_green}; pending (latest red or"
        f" never sampled): {len(queue)}; proposed r{next_round} prefix:"
    )
    print("_DRIVER_SAMPLE_PREFIX = (")
    for k in prefix:
        print(f'    "{k}",')
    print(")")
    plan = build_plan(queue, next_round)
    plan_path = os.path.join(root, "tools", "sample_rotation_plan.json")
    with open(plan_path, "w") as f:
        json.dump(plan, f, indent=1)
    print(f"# rotation plan ({len(plan['chunks'])} chunks) -> {plan_path}")


if __name__ == "__main__":
    main()

"""Apply the next round's driver-sample prefix IN PLACE.

One-command round-start step (the r5 and r6 verdicts both flagged a
stale prefix as the top risk): recompute the pending queue with
``next_sample_prefix.pending_queue`` (latest-row semantics, user-
priority ordering), rewrite ``registry._DRIVER_SAMPLE_PREFIX`` with
``build_prefix``'s 50-key block (padded with already-green keys once
the backlog shrinks below 50 — re-adjudication is harmless), refresh
``tools/sample_rotation_plan.json`` via the SAME ``build_plan`` the
propose tool uses, and verify in a fresh interpreter that
``load_all()[:50]`` equals the written prefix.

Usage: python tools/apply_next_prefix.py [next_round_number]
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tools"))

from next_sample_prefix import (  # noqa: E402  (tools/ sibling)
    build_plan,
    build_prefix,
    infer_next_round,
    pending_queue_with_ages,
)


def main() -> None:
    next_round = (
        int(sys.argv[1]) if len(sys.argv) > 1 else infer_next_round(ROOT)
    )
    queue, n_green, latest_round = pending_queue_with_ages(ROOT)
    prefix = build_prefix(queue, latest_round, ROOT)

    reg_path = os.path.join(
        ROOT, "twitter_hashtag_sentiment_analysis_spark", "registry.py"
    )
    src = open(reg_path).read()
    m = re.search(r"_DRIVER_SAMPLE_PREFIX = \(\n(?:[^\n]*\n)*?\)\n", src)
    if not m:
        raise SystemExit("prefix tuple not found in registry.py")
    plan_path = os.path.join(ROOT, "tools", "sample_rotation_plan.json")
    old_plan = open(plan_path).read() if os.path.exists(plan_path) else None
    body = "_DRIVER_SAMPLE_PREFIX = (\n"
    body += (
        f"    # round-{next_round} block"
        " (tools/sample_rotation_plan.json; regenerate with\n"
        "    # `python tools/apply_next_prefix.py` at round start)\n"
    )
    for k in prefix:
        body += f'    "{k}",\n'
    body += ")\n"
    open(reg_path, "w").write(src[: m.start()] + body + src[m.end() :])

    with open(plan_path, "w") as f:
        json.dump(build_plan(queue, next_round), f, indent=1)

    # verify in a FRESH interpreter (this one already imported the old
    # registry module): the driver samples load_all()[:50], so THAT is
    # the invariant — the plan chunk is a subset once the backlog
    # shrinks below 50 (prefix pads with already-green keys).
    expected = json.dumps(prefix)
    check = subprocess.run(
        [
            sys.executable,
            "-c",
            (
                "import sys, json; sys.path.insert(0, %r)\n"
                "from twitter_hashtag_sentiment_analysis_spark.registry import "
                "load_all, _DRIVER_SAMPLE_PREFIX\n"
                "expected = tuple(json.loads(%r))\n"
                "assert _DRIVER_SAMPLE_PREFIX == expected, 'written prefix mismatch'\n"
                "assert tuple(list(load_all())[:50]) == expected, 'load_all order mismatch'\n"
                "print('verified: load_all()[:50] == written prefix')"
            )
            % (ROOT, expected),
        ],
        capture_output=True,
        text=True,
    )
    if check.returncode != 0:
        # roll the working tree back: a failed verification must not
        # leave the broken prefix (or a half-regenerated plan) behind
        open(reg_path, "w").write(src)
        if old_plan is None:
            os.remove(plan_path)
        else:
            open(plan_path, "w").write(old_plan)
        raise SystemExit(
            f"verification failed (registry.py and plan restored):\n"
            f"{check.stderr}"
        )
    print(check.stdout.strip())
    print(
        f"applied r{next_round} prefix ({len(prefix)} keys; {len(queue)}"
        f" pending, {max(0, 50 - len(queue))} padded); latest-green {n_green}"
    )


if __name__ == "__main__":
    main()

"""Apply the next round's driver-sample prefix IN PLACE.

One-command round-start step (the r5 and r6 verdicts both flagged a
stale prefix as the top risk): recompute the pending queue with
``next_sample_prefix.pending_queue`` (latest-row semantics, user-
priority ordering), rewrite ``registry._DRIVER_SAMPLE_PREFIX`` with
the first 50, refresh ``tools/sample_rotation_plan.json``, and verify
the invariant ``load_all()[:50] == prefix == plan chunk``.

Usage: python tools/apply_next_prefix.py [next_round_number]
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tools"))

from next_sample_prefix import pending_queue  # noqa: E402  (tools/ sibling)

from twitter_hashtag_sentiment_analysis_spark.registry import load_all  # noqa: E402


def main() -> None:
    next_round = int(sys.argv[1]) if len(sys.argv) > 1 else None
    if next_round is None:
        rounds = [
            int(re.search(r"r(\d+)", os.path.basename(p)).group(1))
            for p in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))
        ]
        next_round = (max(rounds) if rounds else 0) + 1
    queue, n_green = pending_queue(ROOT)
    reg = load_all()
    oracle = [k for k, q in reg.items() if q.sql is not None]
    done = [k for k in oracle if k not in queue]
    prefix = (queue + done)[:50]

    reg_path = os.path.join(
        ROOT, "twitter_hashtag_sentiment_analysis_spark", "registry.py"
    )
    src = open(reg_path).read()
    m = re.search(r"_DRIVER_SAMPLE_PREFIX = \(\n(?:[^\n]*\n)*?\)\n", src)
    if not m:
        raise SystemExit("prefix tuple not found in registry.py")
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

    plan = {
        "generated_for_round": next_round,
        "pending_total": len(queue),
        "chunks": {
            f"r{next_round + i // 50}": queue[i : i + 50]
            for i in range(0, len(queue), 50)
        },
    }
    with open(os.path.join(ROOT, "tools", "sample_rotation_plan.json"), "w") as f:
        json.dump(plan, f, indent=1)

    # verify in a FRESH interpreter (this one already imported the old
    # registry module)
    check = subprocess.run(
        [
            sys.executable,
            "-c",
            "import sys, json; sys.path.insert(0, %r)\n"
            "from twitter_hashtag_sentiment_analysis_spark.registry import "
            "load_all, _DRIVER_SAMPLE_PREFIX\n"
            "plan = json.load(open(%r))\n"
            "first = tuple(list(load_all())[:50])\n"
            "assert first == _DRIVER_SAMPLE_PREFIX, 'load_all order mismatch'\n"
            "chunk = tuple(plan['chunks']['r%d'])\n"
            "assert chunk == _DRIVER_SAMPLE_PREFIX, 'plan chunk mismatch'\n"
            "print('verified: prefix == plan r%d == load_all()[:50]')"
            % (
                ROOT,
                os.path.join(ROOT, "tools", "sample_rotation_plan.json"),
                next_round,
                next_round,
            ),
        ],
        capture_output=True,
        text=True,
    )
    if check.returncode != 0:
        raise SystemExit(f"verification failed:\n{check.stderr}")
    print(check.stdout.strip())
    print(
        f"applied r{next_round} prefix ({len(prefix)} keys); pending total"
        f" {len(queue)}; latest-green {n_green}"
    )


if __name__ == "__main__":
    main()

"""Static audit of the registry's eager-execution contract.

Walks every module-level function in the package with ast and flags
PLAN-TIME DRIVER ACTIONS — work a registered operator performs when
its ``fn(spark, sf_dir)`` is CALLED, before the returned DataFrame is
ever executed:

* DataFrame actions: ``collect / count / first / head /
  toLocalIterator / localCheckpoint`` (``F.count(...)``-style Column
  expressions, lazy ``groupBy(...).count()`` chains, and pandas calls
  inside nested UDF bodies are excluded);
* materializing writes: ``.write.<fmt>/save/saveAsTable/insertInto``;
* streaming drains: ``.writeStream....start()``,
  ``processAllAvailable``, ``awaitTermination``, ``await_drain``.

The walk is transitive over same-package helper calls (by bare name,
depth-capped), so an operator that delegates its checkpoint to
``cc_kernel.star_contraction_labels`` is still flagged.

This is the SOURCE OF TRUTH for ``registry.Query.eager``: the planted
test (tests/test_llm_ops.py) recomputes this set and asserts it equals
the declared one, so a new operator that runs plan-time jobs cannot
ship undeclared, and a declaration cannot outlive the code it
describes. Deliberately NOT flagged: parquet footer/schema reads
(universal — measured: every key runs >=1 tiny job on first touch of a
table) and ``durable_fixture_dir`` build closures (nested defs; they
run only on the first call per fixture generation and are cached
across processes).

Usage: python tools/eager_audit.py   # prints the audited key set
"""

from __future__ import annotations

import ast
import collections
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PKG_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "twitter_hashtag_sentiment_analysis_spark",
)

ACTIONS = {"collect", "count", "first", "head", "localCheckpoint", "toLocalIterator"}
WRITE_ACTS = {
    "save", "saveAsTable", "insertInto",
    "parquet", "orc", "csv", "json", "text", "xml", "jdbc",
}
GROUPED = {"groupBy", "rollup", "cube", "groupby"}
EXPR_MODULES = {"F", "pd", "np", "math", "itertools"}


def _chain_attrs(node: ast.AST) -> set[str]:
    out: set[str] = set()
    while True:
        if isinstance(node, ast.Attribute):
            out.add(node.attr)
            node = node.value
        elif isinstance(node, ast.Call):
            node = node.func
        else:
            return out


def _scan_fn(node: ast.AST) -> tuple[list, set]:
    acts: list = []
    calls: set = set()

    def walk(n: ast.AST) -> None:
        for ch in ast.iter_child_nodes(n):
            if isinstance(ch, (ast.FunctionDef, ast.AsyncFunctionDef)):
                continue  # nested def = UDF/build-closure body, not driver
            if isinstance(ch, ast.Call):
                fn = ch.func
                if isinstance(fn, ast.Attribute):
                    recv = fn.value
                    is_expr = isinstance(recv, ast.Name) and recv.id in EXPR_MODULES
                    rattrs = _chain_attrs(recv)
                    if fn.attr in ACTIONS and not is_expr:
                        grouped = (
                            isinstance(recv, ast.Call)
                            and isinstance(recv.func, ast.Attribute)
                            and recv.func.attr in GROUPED
                        )
                        if not (fn.attr == "count" and grouped):
                            acts.append((fn.attr, ch.lineno))
                    elif fn.attr in WRITE_ACTS and (
                        "write" in rattrs or "writeTo" in rattrs
                    ):
                        acts.append(("write." + fn.attr, ch.lineno))
                    elif fn.attr == "start" and "writeStream" in rattrs:
                        acts.append(("stream.start", ch.lineno))
                    elif fn.attr in ("processAllAvailable", "awaitTermination"):
                        acts.append((fn.attr, ch.lineno))
                    calls.add(fn.attr)
                elif isinstance(fn, ast.Name):
                    if fn.id == "await_drain":
                        acts.append(("await_drain", ch.lineno))
                    calls.add(fn.id)
            walk(ch)

    walk(node)
    return acts, calls


def audit() -> dict[str, list[str]]:
    """{registry key: [file:line:action evidence]} for every key whose
    fn transitively performs a plan-time driver action."""
    defs: dict = {}
    for root, _, files in os.walk(PKG_DIR):
        for f in files:
            if not f.endswith(".py"):
                continue
            path = os.path.join(root, f)
            tree = ast.parse(open(path).read())
            for node in tree.body:
                if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                    defs[(path, node.name)] = _scan_fn(node)

    byname: dict = collections.defaultdict(list)
    for (p, n), (a, c) in defs.items():
        byname[n].append((p, a, c))

    def eager_of(name: str, depth: int = 0, chain: tuple = ()) -> list:
        if depth > 6 or name not in byname or name in chain:
            return []
        out = []
        for p, a, c in byname[name]:
            out += [(p, act, ln) for act, ln in a]
            for cal in c:
                if cal in byname and cal != name:
                    out += eager_of(cal, depth + 1, chain + (name,))
        return out

    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    out: dict[str, list[str]] = {}
    for k, q in sorted(load_all().items()):
        hits = eager_of(q.fn.__name__)
        if hits:
            out[k] = sorted(
                {f"{os.path.basename(p)}:{ln}:{a}" for p, a, ln in hits}
            )
    return out


if __name__ == "__main__":
    found = audit()
    for k, ev in found.items():
        print(k, ev[:4])
    print(len(found), "keys perform plan-time driver actions")

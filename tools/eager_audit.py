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

The walk is transitive over helper calls and keyed by (module, name):
a callee resolves FIRST within the defining module's own namespace,
then through that module's explicit imports (``from ..x import y`` /
``import x`` aliases, including function-local imports), so an
operator that delegates its checkpoint to
``cc_kernel.star_contraction_labels`` is still flagged while a lazy
operator calling a helper that merely SHARES a name with an eager
helper in another module is not (r13 advisor finding: the old
bare-name global merge produced exactly that false positive class).

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


def _is_pool_ctor(call: ast.AST) -> bool:
    """True for ``ThreadPoolExecutor(...)`` / ``x.ThreadPoolExecutor(...)``."""
    if not isinstance(call, ast.Call):
        return False
    fn = call.func
    name = fn.id if isinstance(fn, ast.Name) else (
        fn.attr if isinstance(fn, ast.Attribute) else None
    )
    return name == "ThreadPoolExecutor"


def _scan_fn(node: ast.AST) -> tuple[list, set]:
    """Scan one function body (nested defs excluded) for plan-time
    actions and outgoing calls. Calls are recorded as ('bare', name)
    for ``helper(...)`` and ('attr', recv, name) for ``mod.helper(...)``
    where the receiver is a plain name — the resolver maps both through
    the defining module's namespace/imports.

    Nested defs are normally UDF/build-closure bodies (executor-side or
    lazily evaluated), so their actions do not count — EXCEPT when the
    def is handed to a driver-side thread pool (``pool.submit(f, ...)``
    / ``pool.map(f, ...)`` on a name bound from ``ThreadPoolExecutor``,
    the guide §2.6 overlapping-independent-jobs pattern): those run at
    fn() time on the driver, so their actions and outgoing calls merge
    into the enclosing function's."""
    acts: list = []
    calls: set = set()
    nested: dict[str, tuple[list, set]] = {}
    pools: set[str] = set()

    def walk(n: ast.AST) -> None:
        for ch in ast.iter_child_nodes(n):
            if isinstance(ch, (ast.FunctionDef, ast.AsyncFunctionDef)):
                nested[ch.name] = _scan_fn(ch)
                continue  # UDF/build-closure body unless pool-dispatched
            if isinstance(ch, ast.With):
                for item in ch.items:
                    if _is_pool_ctor(item.context_expr) and isinstance(
                        item.optional_vars, ast.Name
                    ):
                        pools.add(item.optional_vars.id)
            elif isinstance(ch, ast.Assign) and _is_pool_ctor(ch.value):
                for tgt in ch.targets:
                    if isinstance(tgt, ast.Name):
                        pools.add(tgt.id)
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
                    if isinstance(recv, ast.Name):
                        calls.add(("attr", recv.id, fn.attr))
                        if recv.id in pools and fn.attr in ("submit", "map"):
                            # Only the FIRST positional arg is the
                            # dispatched callable; the rest are data
                            # (pool.map(_write, SINK_CODECS) must not
                            # record the codec list as an outgoing
                            # call — r15 advisor finding).
                            for arg in ch.args[:1]:
                                if not isinstance(arg, ast.Name):
                                    continue
                                if arg.id in nested:
                                    sub_acts, sub_calls = nested[arg.id]
                                    acts.extend(sub_acts)
                                    calls.update(sub_calls)
                                else:
                                    calls.add(("bare", arg.id))
                elif isinstance(fn, ast.Name):
                    if fn.id == "await_drain":
                        acts.append(("await_drain", ch.lineno))
                    calls.add(("bare", fn.id))
            walk(ch)

    walk(node)
    return acts, calls


def _module_of(path: str) -> str:
    """Dotted module name of a package file relative to PKG_DIR's
    parent (e.g. .../operators/dedup.py -> pkg.operators.dedup)."""
    rel = os.path.relpath(path, os.path.dirname(PKG_DIR))
    rel = rel[:-3] if rel.endswith(".py") else rel
    parts = rel.split(os.sep)
    if parts[-1] == "__init__":
        parts = parts[:-1]
    return ".".join(parts)


def _collect_imports(tree: ast.AST, module: str) -> dict:
    """Local alias -> fully-qualified target for EVERY import in the
    module (function-local imports included — the memo_put pattern).
    ``from X import y as z`` maps z -> 'X.y'; ``import X.Y as z`` maps
    z -> 'X.Y'. Relative levels resolve against the module's package."""
    pkg_parts = module.split(".")[:-1]  # the module's own package
    out: dict[str, str] = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom):
            if node.level:
                base = pkg_parts[: len(pkg_parts) - node.level + 1]
                target = ".".join(base + ([node.module] if node.module else []))
            else:
                target = node.module or ""
            for a in node.names:
                out[a.asname or a.name] = f"{target}.{a.name}"
        elif isinstance(node, ast.Import):
            for a in node.names:
                out[a.asname or a.name.split(".")[0]] = a.name
    return out


def audit() -> dict[str, list[str]]:
    """{registry key: [file:line:action evidence]} for every key whose
    fn transitively performs a plan-time driver action."""
    pkg_name = os.path.basename(PKG_DIR)
    defs: dict = {}  # (module, fn name) -> (acts, calls)
    imports: dict = {}  # module -> {alias: fq target}
    for root, _, files in os.walk(PKG_DIR):
        for f in files:
            if not f.endswith(".py"):
                continue
            path = os.path.join(root, f)
            tree = ast.parse(open(path).read())
            module = _module_of(path)
            imports[module] = _collect_imports(tree, module)
            for node in tree.body:
                if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                    defs[(module, node.name)] = (
                        _scan_fn(node),
                        path,
                    )

    def resolve(module: str, call: tuple):
        """(module, call site) -> (module, name) def key, or None.
        Bare names resolve in the defining module first, then through
        its explicit imports; attr calls resolve only through an
        imported-module alias. Cross-module hits require the target
        to be an actual function def inside this package."""
        imp = imports.get(module, {})
        if call[0] == "bare":
            name = call[1]
            if (module, name) in defs:
                return (module, name)
            fq = imp.get(name)
            if fq and fq.startswith(pkg_name + "."):
                mod, _, fn_name = fq.rpartition(".")
                if (mod, fn_name) in defs:
                    return (mod, fn_name)
        else:  # ('attr', recv, name): recv must alias a package module
            _, recv, name = call
            fq = imp.get(recv)
            # same boundary check as the bare-name branch: a top-level
            # module whose name merely starts with pkg_name must not be
            # treated as in-package (r14 advisor finding)
            if (
                fq
                and (fq == pkg_name or fq.startswith(pkg_name + "."))
                and (fq, name) in defs
            ):
                return (fq, name)
        return None

    def eager_of(key: tuple, depth: int = 0, chain: tuple = ()) -> list:
        if depth > 6 or key not in defs or key in chain:
            return []
        (a, c), path = defs[key]
        out = [(path, act, ln) for act, ln in a]
        for call in c:
            target = resolve(key[0], call)
            if target is not None and target != key:
                out += eager_of(target, depth + 1, chain + (key,))
        return out

    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    out: dict[str, list[str]] = {}
    for k, q in sorted(load_all().items()):
        hits = eager_of((q.fn.__module__, q.fn.__name__))
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

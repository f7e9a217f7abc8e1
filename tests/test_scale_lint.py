"""Scale-audit lint: every driver-side gather in chearch_ray/stages/
must be BOUNDED (O(1) rows per block / per group cap) or behind a
documented DRIVER_MERGE_LIMIT-style gate (VERDICT r3 #7).

The whitelist below is keyed by (file, enclosing function); each entry
records WHY the gather is safe at ~8e5 read blocks (the repo's own
100-TB estimate, BASELINE.md).  A new `.take_all()` / `.to_pandas()` /
`.iter_rows()` call site in stages/ fails this test until it is either
restructured (partial -> Ray groupby merge) or whitelisted with a
boundedness argument."""

from __future__ import annotations

import ast
import glob
import os
import re

STAGES_DIR = os.path.join(os.path.dirname(__file__), "..", "chearch_ray", "stages")

#: (file, enclosing function) -> boundedness argument
ALLOWED_GATHERS = {
    ("dedup.py", "_state_signature"):
        "one 2-int checksum row per block (convergence check)",
    ("pack.py", "pack_sequences"):
        "min/max: one row per block; bucket merge: gated at "
        "DRIVER_MERGE_LIMIT (groupby-Sum above), <= n_buckets rows after",
    ("sketch.py", "_merge_hist"):
        "gated: groupby-Sum above driver_merge_limit, <= n_buckets rows after",
    ("sketch.py", "exact_quantiles"):
        "min/max/count: one row per block; final gather <= gather_limit rows",
    ("sketch.py", "exact_order_stats"):
        "min/max/count: one 3-int row per block; final gather <= "
        "gather_limit rows per rank (same classes as exact_quantiles)",
    ("sketch.py", "_drive_rank_jobs"):
        "hist rounds gated on jb-key groupby above driver_merge_limit; "
        "final gather <= gather_limit rows per job (shared by the disc "
        "and cont grouped quantile forms)",
}

GATHER_METHODS = {"take_all", "iter_rows", "to_pandas"}


def _gather_sites():
    sites = []
    for path in sorted(glob.glob(os.path.join(STAGES_DIR, "*.py"))):
        tree = ast.parse(open(path).read())
        fname = os.path.basename(path)
        stack: list[str] = []

        class V(ast.NodeVisitor):
            def visit_FunctionDef(self, node):
                stack.append(node.name)
                self.generic_visit(node)
                stack.pop()

            visit_AsyncFunctionDef = visit_FunctionDef

            def visit_Call(self, node):
                f = node.func
                if isinstance(f, ast.Attribute) and f.attr in GATHER_METHODS:
                    sites.append((fname, stack[-1] if stack else "<module>",
                                  f.attr, node.lineno))
                self.generic_visit(node)

        V().visit(tree)
    return sites


def test_stage_driver_gathers_are_whitelisted():
    sites = _gather_sites()
    assert sites, "expected to find the known gather sites (AST walk broken?)"
    unexpected = [
        s for s in sites if (s[0], s[1]) not in ALLOWED_GATHERS
    ]
    assert not unexpected, (
        "new driver-side gather(s) in chearch_ray/stages/ — restructure as a "
        "gated Ray groupby merge (see pack.DRIVER_MERGE_LIMIT) or whitelist "
        f"with a boundedness argument: {unexpected}"
    )


def test_whitelist_has_no_stale_entries():
    live = {(f, fn) for f, fn, _, _ in _gather_sites()}
    stale = [k for k in ALLOWED_GATHERS if k not in live]
    assert not stale, f"whitelisted gather sites no longer exist: {stale}"


def test_driver_rotation_covers_unchecked_queries():
    """The driver harness checks the FIRST 50 QUERIES entries; the
    round-4 rotation must keep every query that has never appeared in
    a CORRECTNESS_r*.json inside that window (VERDICT r3 #1).  Guards
    against accidental re-ordering.  A row whose every recorded run
    errored (e.g. pq_knn's r04 `no_oracle`) counts as UNCHECKED — it
    was never value-verified, so it still deserves a window slot."""
    import json

    from chearch_ray.pipelines.driver_contract import QUERIES

    repo = os.path.join(os.path.dirname(__file__), "..")
    checked: set[str] = set()
    for f in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        for name, row in json.load(open(f)).items():
            if not (isinstance(row, dict) and row.get("err")):
                checked.add(name)
    names = list(QUERIES)
    never = [n for n in names if n not in checked]
    window = names[:50]
    if len(never) <= 50:
        missing = [n for n in never if n not in set(window)]
        assert not missing, (
            f"never-driver-checked queries outside the first-50 window: {missing}"
        )
    else:
        # more unchecked queries than window slots: coverage is maximal
        # iff every slot goes to an unchecked query
        stale = [n for n in window if n in checked]
        assert not stale, (
            f"first-50 window wastes slots on already-checked queries: {stale}"
        )


GATHERING_AFTER_COUNT = re.compile(
    r"if\s+(\w+)\.count\(\)", re.MULTILINE)


def test_no_lazy_count_then_reuse():
    """`if ds.count()` on a LAZY dataset executes the whole plan once
    for the count and again when the dataset is consumed (the
    inactive_customers 2x bug).  Every `<name>.count()` call in
    pipelines/stages must be on a name bound via `.materialize()`
    in the same file."""
    base = os.path.join(os.path.dirname(__file__), "..", "chearch_ray")
    offenders = []
    for path in sorted(glob.glob(os.path.join(base, "stages", "*.py"))
                       + glob.glob(os.path.join(base, "pipelines", "*.py"))):
        tree = ast.parse(open(path).read())
        materialized: set[str] = set()
        count_calls: list[tuple[str, int]] = []

        class V(ast.NodeVisitor):
            def visit_Assign(self, node):
                v = node.value
                # names bound from materialize() are safe; so are
                # QueryEngine bindings (engine_for / QueryEngine) —
                # QueryEngine.count is a segment-side integer sum,
                # not a Dataset plan execution
                safe = (isinstance(v, ast.Call) and (
                    (isinstance(v.func, ast.Attribute)
                     and v.func.attr in ("materialize",))
                    or (isinstance(v.func, ast.Name)
                        and v.func.id in ("engine_for", "QueryEngine"))
                    or (isinstance(v.func, ast.Attribute)
                        and v.func.attr == "QueryEngine")))
                if safe:
                    for t in node.targets:
                        if isinstance(t, ast.Name):
                            materialized.add(t.id)
                self.generic_visit(node)

            def visit_Call(self, node):
                f = node.func
                if (isinstance(f, ast.Attribute) and f.attr == "count"
                        and isinstance(f.value, ast.Name)):
                    count_calls.append((f.value.id, node.lineno))
                self.generic_visit(node)

        V().visit(tree)
        for name, line in count_calls:
            if name not in materialized:
                offenders.append((os.path.basename(path), name, line))
    assert not offenders, (
        "count() on a possibly-lazy dataset (double execution): "
        f"{offenders} — materialize first or whitelist with a reason"
    )


def test_no_pandas_roundtrip_in_library_code():
    """VERDICT r4 #7: per-batch kernels must stay Arrow-native — a
    `.to_pandas()` / `.fillna(` round-trip inside a hot kernel copies
    every column.  Library pipeline modules (everything except the
    driver contract, whose to_pandas calls sit on final bounded
    results the contract must return) must contain NONE; stages/ are
    already covered by the gather whitelist above."""
    base = os.path.join(os.path.dirname(__file__), "..", "chearch_ray")
    offenders = []
    for path in sorted(glob.glob(os.path.join(base, "pipelines", "*.py"))):
        if os.path.basename(path) == "driver_contract.py":
            continue
        tree = ast.parse(open(path).read())
        for node in ast.walk(tree):
            if (isinstance(node, ast.Call)
                    and isinstance(node.func, ast.Attribute)
                    and node.func.attr in ("to_pandas", "fillna")):
                offenders.append((os.path.basename(path), node.func.attr,
                                  node.lineno))
    assert not offenders, (
        "pandas round-trip in a library pipeline module — use pure "
        f"Arrow (pc.if_else/fill_null + cast): {offenders}"
    )

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
    ("sketch.py", "exact_group_quantiles"):
        "hist rounds gated on jb-key groupby above driver_merge_limit; "
        "final gather <= gather_limit rows per job",
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

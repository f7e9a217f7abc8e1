"""Frozen query set (FIXTURES.md §4) — the rank-identity corpus.

200 deterministic queries, stratified over the corpus vocabulary:
80 single-term (40 hot / 20 mid / 10 rare / 10 known-df sentinels),
60 AND pairs, 40 OR pairs, 20 deep trees (3-7 terms, random AND/OR
shape).  Each entry carries the AST as JSON and the CHASM postfix
bytes as hex (terms mapped to uint32 ids via the stable term hash —
the reference engine is integer-termed, search.chpl:7, so byte-level
query transport uses term ids; the analogue of the reference's
1024-term remote sweep, chearch.chpl:60-91).
"""

from __future__ import annotations

import json

import numpy as np

from chearch_ray import ast
from chearch_ray.functions import chasm
from chearch_ray.functions.hashing import term_hash64

QUERY_SET_SIZE = 200


def ast_to_json(node: ast.Node) -> dict:
    if isinstance(node, ast.Term):
        return {"term": node.term}
    kind = "and" if isinstance(node, ast.And) else "or"
    return {kind: [ast_to_json(node.a), ast_to_json(node.b)]}


def ast_from_json(obj: dict) -> ast.Node:
    if "term" in obj:
        return ast.Term(obj["term"])
    if "and" in obj:
        a, b = obj["and"]
        return ast.And(ast_from_json(a), ast_from_json(b))
    a, b = obj["or"]
    return ast.Or(ast_from_json(a), ast_from_json(b))


def term_id32(term: str) -> int:
    """uint32 term id for CHASM transport (string-free reference
    engine, search.chpl:7 / README.md:15)."""
    return term_hash64(term) & 0xFFFFFFFF


def _int_tree(node: ast.Node) -> ast.Node:
    if isinstance(node, ast.Term):
        return ast.Term(term_id32(str(node.term)))
    cls = ast.And if isinstance(node, ast.And) else ast.Or
    return cls(_int_tree(node.a), _int_tree(node.b))


def chasm_hex(node: ast.Node) -> str:
    return chasm.emit_chasm(_int_tree(node), size=4096).hex()


def frozen_query_set(df_by_term: dict[str, int], seed: int = 42) -> list[dict]:
    """df_by_term: term -> document frequency for the target corpus
    (drives the hot/mid/rare stratification)."""
    rng = np.random.default_rng(seed)
    ranked = sorted(df_by_term, key=lambda t: (-df_by_term[t], t))
    ranked = [t for t in ranked if not t.startswith("__known_")]
    n = len(ranked)
    hot = ranked[: max(1, n // 10)]
    mid = ranked[n // 3 : max(n // 3 + 1, 2 * n // 3)]
    rare = ranked[-max(1, n // 10) :]
    sentinels = sorted(t for t in df_by_term if t.startswith("__known_"))

    def pick(pool: list[str]) -> str:
        return pool[int(rng.integers(0, len(pool)))]

    queries: list[ast.Node] = []
    for pool, count in ((hot, 40), (mid, 20), (rare, 10)):
        queries += [ast.Term(pick(pool)) for _ in range(count)]
    queries += [ast.Term(pick(sentinels)) for _ in range(10)] if sentinels else [
        ast.Term(pick(mid)) for _ in range(10)
    ]
    for _ in range(60):
        queries.append(ast.And(ast.Term(pick(ranked)), ast.Term(pick(ranked))))
    for _ in range(40):
        queries.append(ast.Or(ast.Term(pick(ranked)), ast.Term(pick(ranked))))

    def deep(n_terms: int) -> ast.Node:
        node: ast.Node = ast.Term(pick(ranked))
        for _ in range(n_terms - 1):
            cls = ast.And if rng.integers(0, 2) else ast.Or
            left: ast.Node = ast.Term(pick(ranked))
            node = cls(left, node) if rng.integers(0, 2) else cls(node, left)
        return node

    for _ in range(20):
        queries.append(deep(int(rng.integers(3, 8))))

    out = []
    for node in queries:
        entry = {"ast": ast_to_json(node), "chasm_hex": chasm_hex(node)}
        assert len(bytes.fromhex(entry["chasm_hex"])) <= 256  # server cap
        out.append(entry)
    assert len(out) == QUERY_SET_SIZE
    return out


def save_query_set(entries: list[dict], path: str) -> None:
    with open(path, "w") as f:
        for e in entries:
            f.write(json.dumps(e, sort_keys=True) + "\n")


def load_query_set(path: str) -> list[tuple[ast.Node, bytes]]:
    out = []
    with open(path) as f:
        for line in f:
            e = json.loads(line)
            out.append((ast_from_json(e["ast"]), bytes.fromhex(e["chasm_hex"])))
    return out

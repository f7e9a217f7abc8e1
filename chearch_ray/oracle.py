"""Brute-force reference implementation (the rank-identity oracle).

Dict-of-sets boolean retrieval + pure-Python BM25 (SURVEY.md §5c).
Shares the tokenizer kernels with the engine (the tokenizer's own
identity is pinned separately against DuckDB in test_functions.py) but
indexes and scores with plain Python dict/float arithmetic.

Float contract with state/searcher.py: identical formula text, term
accumulation in ast.terms_of order, float64 throughout, ordering
(score desc, doc_id asc) — scores must be bit-identical, not just
rank-identical.
"""

from __future__ import annotations

import math

import pyarrow as pa

from chearch_ray import ast
from chearch_ray.config import DEFAULT_CONFIG, EngineConfig
from chearch_ray.functions.tokenizer import tokenize
from chearch_ray.stages.tokenize import _doc_ids_of


class OracleIndex:
    def __init__(self, corpus: pa.Table, cfg: EngineConfig = DEFAULT_CONFIG):
        self.cfg = cfg
        doc_ids = _doc_ids_of(corpus)
        lists = tokenize(
            corpus["content"],
            lowercase=cfg.lowercase,
            split_subtokens=cfg.split_subtokens,
            split_regex=cfg.token_split_regex,
        ).to_pylist()
        #: term -> {doc_id: tf}
        self.postings: dict[str, dict[int, int]] = {}
        #: term -> {doc_id: [positions]}
        self.positions: dict[str, dict[int, list[int]]] = {}
        self.doc_len: dict[int, int] = {}
        for doc_id, tokens in zip(doc_ids.tolist(), lists):
            self.doc_len[doc_id] = len(tokens)
            for pos, tok in enumerate(tokens):
                self.postings.setdefault(tok, {}).setdefault(doc_id, 0)
                self.postings[tok][doc_id] += 1
                self.positions.setdefault(tok, {}).setdefault(doc_id, []).append(pos)
        self.n_docs = len(self.doc_len)
        total = sum(self.doc_len.values())
        self.avgdl = (total / self.n_docs) if self.n_docs else 0.0

    def df(self, term: str) -> int:
        return len(self.postings.get(term, ()))

    def idf(self, term: str) -> float:
        df = self.df(term)
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    # ------------------------------------------------------------ boolean
    def _eval(self, node: ast.Node) -> set[int]:
        if isinstance(node, ast.Term):
            return set(self.postings.get(str(node.term), ()))
        a, b = self._eval(node.a), self._eval(node.b)
        if isinstance(node, ast.AndNot):
            return a - b
        return (a & b) if isinstance(node, ast.And) else (a | b)

    def boolean_search(self, node: ast.Node) -> list[int]:
        return sorted(self._eval(node))

    # --------------------------------------------------------------- BM25
    def bm25_scores(self, node: ast.Node) -> dict[int, float]:
        k1, b = self.cfg.k1, self.cfg.b
        candidates = self._eval(node)
        scores: dict[int, float] = {}
        for doc in candidates:
            dl = float(self.doc_len[doc])
            s = 0.0
            for term in ast.terms_of(node):
                term = str(term)
                tf_map = self.postings.get(term)
                if not tf_map or doc not in tf_map:
                    continue
                tf = float(tf_map[doc])
                idf = self.idf(term)
                s += idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / self.avgdl))
            scores[doc] = s
        return scores

    def bm25_search(self, node: ast.Node, k: int) -> list[tuple[int, float]]:
        scores = self.bm25_scores(node)
        ranked = sorted(scores.items(), key=lambda it: (-it[1], it[0]))
        return ranked[:k]


    # ------------------------------------------------------------- phrase
    def phrase_search(self, terms: list[str], k: int) -> list[tuple[int, float]]:
        """Exact phrase match over position lists + BM25 over the
        phrase terms (same float contract as bm25_search)."""
        if not terms:
            return []
        candidates = None
        for t in terms:
            docs = set(self.postings.get(t, ()))
            candidates = docs if candidates is None else (candidates & docs)
        survivors = []
        for doc in candidates or ():
            starts = None
            for i, t in enumerate(terms):
                shifted = {p - i for p in self.positions[t][doc] if p - i >= 0}
                starts = shifted if starts is None else (starts & shifted)
                if not starts:
                    break
            if starts:
                survivors.append(doc)
        k1, b = self.cfg.k1, self.cfg.b
        scored = []
        for doc in survivors:
            dl = float(self.doc_len[doc])
            s = 0.0
            for term in dict.fromkeys(terms):
                tf_map = self.postings.get(term)
                if not tf_map or doc not in tf_map:
                    continue
                tf = float(tf_map[doc])
                idf = self.idf(term)
                s += idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / self.avgdl))
            scored.append((doc, s))
        return sorted(scored, key=lambda it: (-it[1], it[0]))[:k]

    # ---------------------------------------------------------- proximity
    def near_search(
        self, term_a: str, term_b: str, slop: int, ordered: bool, k: int
    ) -> list[tuple[int, float]]:
        """Brute-force NEAR/slop: docs with an occurrence pair (pa, pb)
        where |pb - pa| <= slop (unordered; pa != pb for identical
        terms) or 1 <= pb - pa <= slop (ordered).  BM25 over the unique
        query terms, same float contract as bm25_search."""
        docs_a = set(self.positions.get(term_a, ()))
        docs_b = set(self.positions.get(term_b, ()))
        survivors = []
        for doc in docs_a & docs_b:
            pas = self.positions[term_a][doc]
            pbs = self.positions[term_b][doc]
            hit = any(
                (1 <= pb - pa <= slop)
                if ordered
                else (pa != pb and abs(pb - pa) <= slop)
                for pa in pas
                for pb in pbs
            )
            if hit:
                survivors.append(doc)
        k1, b = self.cfg.k1, self.cfg.b
        scored = []
        for doc in survivors:
            dl = float(self.doc_len[doc])
            s = 0.0
            for term in dict.fromkeys([term_a, term_b]):
                tf = float(self.postings[term][doc])
                idf = self.idf(term)
                s += idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / self.avgdl))
            scored.append((doc, s))
        return sorted(scored, key=lambda it: (-it[1], it[0]))[:k]

    def near_all_search(
        self, terms: list[str], slop: int, k: int
    ) -> list[tuple[int, float]]:
        """Brute-force N-term unordered NEAR: docs with an occurrence
        choice (one per unique term) whose span max − min <= slop —
        checked directly via anchored windows over every occurrence.
        BM25 over the unique terms, same float contract as
        bm25_search."""
        uniq = list(dict.fromkeys(terms))
        doc_sets = [set(self.positions.get(t, ())) for t in uniq]
        common = set.intersection(*doc_sets) if doc_sets and all(doc_sets) else set()
        survivors = []
        for doc in common:
            pos_lists = [self.positions[t][doc] for t in uniq]
            anchors = sorted(p for ps in pos_lists for p in ps)
            if any(
                all(any(q <= p <= q + slop for p in ps) for ps in pos_lists)
                for q in anchors
            ):
                survivors.append(doc)
        k1, b = self.cfg.k1, self.cfg.b
        scored = []
        for doc in survivors:
            dl = float(self.doc_len[doc])
            s = 0.0
            for term in uniq:
                tf = float(self.postings[term][doc])
                idf = self.idf(term)
                s += idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / self.avgdl))
            scored.append((doc, s))
        return sorted(scored, key=lambda it: (-it[1], it[0]))[:k]

"""Insertion-ordered in-memory index (conformance layer).

Pure-Python equivalent of the reference's MemorySegment
(memorysegment.chpl:76-311) with the exact observable semantics:

* one posting per (term, textLocation) occurrence, appended in
  insertion order; iterated newest-first (descending documentIndex,
  memorysegment.chpl:41-55);
* two dummy documents inserted before any real document — one by the
  segment constructor (memorysegment.chpl:78-84, extId ~0) and one by
  initPartitions (searchindex.chpl:40-44, extId 1) — so real documents
  start at documentIndex 2;
* query results are posting-level rows (term, textLocation,
  externalDocId) (search.chpl:26-30), capped at partition_limit
  (search.chpl:17);
* a snapshot of documentCount is taken at query start and postings of
  later documents are filtered out (MVCC-lite,
  memorysegment.chpl:294-311);
* unknown terms resolve to a NullOperand and yield 0 rows
  (memorysegment.chpl:314-317, chearch.chpl:159-178).

This layer exists to pin golden behavior in tests; the scale engine
(chearch_ray.pipelines.build / state.searcher) canonicalizes ordering
and result shape instead (SURVEY.md §2.6 O1).
"""

from __future__ import annotations

from dataclasses import dataclass

from chearch_ray import ast
from chearch_ray.conformance.docid import (
    MAX_DOCUMENT_INDEX,
    assemble_doc_id,
    assemble_operand_value,
    document_index_from_doc_id,
    split_operand_value,
    text_location_from_doc_id,
)
from chearch_ray.conformance.operands import (
    FixedDataOperand,
    IntersectionOperand,
    NullOperand,
    Operand,
    UnionOperand,
)
from chearch_ray.functions import chasm as chasm_mod

DUMMY_TERM = 0xFFFFFFFF
DEFAULT_PARTITION_LIMIT = 2048  # search.chpl:17


@dataclass(frozen=True)
class QueryResult:
    """search.chpl:26-30; also the TCP wire record (13 bytes BE,
    chearch_srv.chpl:52-66)."""

    term: int
    text_location: int
    external_doc_id: int

    def to_wire(self) -> bytes:
        """term:4 BE + textLocation:1 + externalDocId:8 BE."""
        return (
            self.term.to_bytes(4, "big")
            + self.text_location.to_bytes(1, "big")
            + self.external_doc_id.to_bytes(8, "big")
        )

    @classmethod
    def from_wire(cls, data: bytes) -> "QueryResult":
        return cls(
            term=int.from_bytes(data[0:4], "big"),
            text_location=data[4],
            external_doc_id=int.from_bytes(data[5:13], "big"),
        )


class MemoryIndex:
    def __init__(self, partition_limit: int = DEFAULT_PARTITION_LIMIT, add_dummy_docs: bool = True):
        self.partition_limit = partition_limit
        #: term -> list of packed docId32, insertion order (oldest first)
        self._postings: dict[int, list[int]] = {}
        #: documentIndex -> externalDocId
        self._external_ids: list[int] = []
        if add_dummy_docs:
            # constructor dummy (memorysegment.chpl:78-84)
            self.add_document([(DUMMY_TERM, 0)], (1 << 64) - 1)
            # initPartitions dummy (searchindex.chpl:40-44)
            self.add_document([(DUMMY_TERM, 0)], 1)

    @property
    def document_count(self) -> int:
        return len(self._external_ids)

    def is_full(self) -> bool:
        return self.document_count >= MAX_DOCUMENT_INDEX

    def add_document(self, terms: list[tuple[int, int]], external_doc_id: int) -> bool:
        """memorysegment.chpl:267-292: register the doc, then append one
        posting per (term, textLocation) pair."""
        if self.is_full():
            return False
        doc_index = self.document_count
        for term, text_location in terms:
            self._postings.setdefault(term, []).append(assemble_doc_id(doc_index, text_location))
        self._external_ids.append(external_doc_id)
        return True

    def operand_for_term(self, term: int, max_doc_index: int | None = None) -> Operand:
        postings = self._postings.get(term)
        if not postings:
            return NullOperand()
        limit = self.document_count if max_doc_index is None else max_doc_index
        values = [
            assemble_operand_value(term, d)
            for d in reversed(postings)  # newest first
            if document_index_from_doc_id(d) < limit  # snapshot filter
        ]
        return FixedDataOperand(values) if values else NullOperand()

    def _operand_for_ast(self, node: ast.Node, max_doc_index: int) -> Operand:
        if isinstance(node, ast.Term):
            if not isinstance(node.term, int):
                raise TypeError("MemoryIndex terms are uint32 ints (search.chpl:7)")
            return self.operand_for_term(node.term, max_doc_index)
        a = self._operand_for_ast(node.a, max_doc_index)
        b = self._operand_for_ast(node.b, max_doc_index)
        return IntersectionOperand(a, b) if isinstance(node, ast.And) else UnionOperand(a, b)

    def query_ast(self, node: ast.Node) -> list[QueryResult]:
        snapshot = self.document_count  # memorysegment.chpl:299
        op = self._operand_for_ast(node, snapshot)
        results: list[QueryResult] = []
        for value in op.evaluate():
            term, doc_id = split_operand_value(value)
            results.append(
                QueryResult(
                    term=term,
                    text_location=text_location_from_doc_id(doc_id),
                    external_doc_id=self._external_ids[document_index_from_doc_id(doc_id)],
                )
            )
            if len(results) >= self.partition_limit:
                break
        return results

    def query_chasm(self, program: bytes) -> list[QueryResult]:
        node = chasm_mod.parse_chasm(program)
        return self.query_ast(node)

"""Conformance tests pinned to the reference's golden behavior.

Golden fixture: test/helloworld.chpl + README.md:109-124 (FIXTURES.md §1).
Operand fixtures: test/chearch_test.chpl:100-189 (FIXTURES.md §2).
Bit-pack round-trips: test/chearch_test.chpl:6-45.
CHASM codec: test/chearch_test.chpl:79-98.
"""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from chearch_ray import ast
from chearch_ray.conformance import (
    FixedDataOperand,
    IntersectionOperand,
    MemoryIndex,
    UnionOperand,
    assemble_doc_id,
    split_doc_id,
)
from chearch_ray.conformance.docid import (
    MAX_DOCUMENT_INDEX,
    assemble_operand_value,
    split_operand_value,
)
from chearch_ray.conformance.memory_index import QueryResult
from chearch_ray.functions import chasm


# ---------------------------------------------------------------- docid
@given(
    st.integers(min_value=0, max_value=MAX_DOCUMENT_INDEX - 1),
    st.integers(min_value=0, max_value=255),
)
def test_doc_id_roundtrip(doc_index, text_location):
    packed = assemble_doc_id(doc_index, text_location)
    assert split_doc_id(packed) == (doc_index, text_location)


def test_doc_id_all_text_locations():
    # exhaustive over the 8-bit field, sampled doc indexes
    # (chearch_test.chpl:25-34 enumerates the full domain)
    for tl in range(256):
        for di in (0, 1, 2, 12345, MAX_DOCUMENT_INDEX - 1):
            assert split_doc_id(assemble_doc_id(di, tl)) == (di, tl)


@given(st.integers(min_value=0, max_value=2**32 - 1), st.integers(min_value=0, max_value=2**32 - 1))
def test_operand_value_roundtrip(term, doc_id):
    assert split_operand_value(assemble_operand_value(term, doc_id)) == (term, doc_id)


# ------------------------------------------------------------- operands
def _packed(term, doc_index, text_location):
    return assemble_operand_value(term, assemble_doc_id(doc_index, text_location))


def test_fixed_passthrough():
    op = FixedDataOperand([_packed(1, 10, 6)])
    assert list(op.evaluate()) == [_packed(1, 10, 6)]


def test_union_tie_yields_both_sides():
    a = FixedDataOperand([_packed(1, 10, 6)])
    b = FixedDataOperand([_packed(2, 10, 15)])
    out = list(UnionOperand(a, b).evaluate())
    assert out == [_packed(1, 10, 6), _packed(2, 10, 15)]


def test_intersection_skew():
    # A=[(10,3)], B=[(12,26),(10,15)] -> (10,3),(10,15); B's 12 dropped
    a = FixedDataOperand([_packed(1, 10, 3)])
    b = FixedDataOperand([_packed(2, 12, 26), _packed(2, 10, 15)])
    out = list(IntersectionOperand(a, b).evaluate())
    assert out == [_packed(1, 10, 3), _packed(2, 10, 15)]


def test_intersection_empty_side():
    a = FixedDataOperand([])
    b = FixedDataOperand([_packed(2, 12, 26)])
    assert list(IntersectionOperand(a, b).evaluate()) == []
    assert list(IntersectionOperand(b, FixedDataOperand([])).evaluate()) == []


def test_union_merge_order_descending():
    a = FixedDataOperand([_packed(1, 9, 0), _packed(1, 3, 0)])
    b = FixedDataOperand([_packed(2, 7, 0), _packed(2, 3, 1)])
    out = list(UnionOperand(a, b).evaluate())
    assert out == [
        _packed(1, 9, 0),
        _packed(2, 7, 0),
        _packed(1, 3, 0),  # tie: A first
        _packed(2, 3, 1),
    ]


@given(
    st.lists(st.integers(min_value=0, max_value=1000), unique=True, max_size=40),
    st.lists(st.integers(min_value=0, max_value=1000), unique=True, max_size=40),
)
@settings(max_examples=100)
def test_operand_algebra_vs_set_oracle(a_docs, b_docs):
    a_docs = sorted(a_docs, reverse=True)
    b_docs = sorted(b_docs, reverse=True)
    a = FixedDataOperand([_packed(1, d, 0) for d in a_docs])
    b = FixedDataOperand([_packed(2, d, 0) for d in b_docs])
    inter = list(IntersectionOperand(a, b).evaluate())
    both = sorted(set(a_docs) & set(b_docs), reverse=True)
    # 2 rows per co-occurring doc, A side then B side
    expect = []
    for d in both:
        expect += [_packed(1, d, 0), _packed(2, d, 0)]
    assert inter == expect

    a2 = FixedDataOperand([_packed(1, d, 0) for d in a_docs])
    b2 = FixedDataOperand([_packed(2, d, 0) for d in b_docs])
    uni = list(UnionOperand(a2, b2).evaluate())
    # every posting from both sides survives, ordered by desc doc index
    # (ties: A before B)
    expect_u = [
        _packed(t, d, 0)
        for d in sorted(set(a_docs) | set(b_docs), reverse=True)
        for t, present in ((1, d in a_docs), (2, d in b_docs))
        if present
    ]
    assert uni == expect_u


# ---------------------------------------------------------------- chasm
def test_chasm_codec_roundtrip_single_push():
    # test/chearch_test.chpl:79-98: write PUSH + term, rewind, read back
    buf = chasm.InstructionBuffer(32)
    w = chasm.InstructionWriter(buf)
    assert w.write_push_term(10)
    buf.rewind()
    r = chasm.InstructionReader(buf)
    assert r.read_op() == chasm.OP_PUSH
    assert r.read_term() == 10


def test_chasm_term_big_endian():
    buf = chasm.InstructionBuffer(32)
    chasm.InstructionWriter(buf).write_push_term(0x01020304)
    assert buf.to_bytes() == bytes([chasm.OP_PUSH, 1, 2, 3, 4])


@st.composite
def ast_trees(draw, max_depth=4):
    if max_depth == 0 or draw(st.booleans()):
        return ast.Term(draw(st.integers(min_value=0, max_value=2**32 - 1)))
    node_cls = draw(st.sampled_from([ast.And, ast.Or]))
    return node_cls(draw(ast_trees(max_depth=max_depth - 1)), draw(ast_trees(max_depth=max_depth - 1)))


@given(ast_trees())
@settings(max_examples=200)
def test_chasm_ast_roundtrip(tree):
    data = chasm.emit_chasm(tree, size=4096)
    assert chasm.parse_chasm(data) == tree


def test_chasm_halt_stops():
    buf = chasm.InstructionBuffer(32)
    w = chasm.InstructionWriter(buf)
    w.write_push_term(7)
    w.write_halt()
    w.write_push_term(9)  # unreachable past HALT
    assert chasm.parse_chasm(buf.to_bytes()) == ast.Term(7)


# ----------------------------------------------------------- helloworld
@pytest.fixture()
def helloworld_index():
    idx = MemoryIndex()
    # doc 10: terms 2@6, 3@15; doc 15: term 2@6 (test/helloworld.chpl)
    assert idx.add_document([(2, 6), (3, 15)], 10)
    assert idx.add_document([(2, 6)], 15)
    return idx


def test_helloworld_golden(helloworld_index):
    idx = helloworld_index
    # README.md:109-124 exact rows, in order (descending doc index)
    assert idx.query_ast(ast.Term(2)) == [
        QueryResult(2, 6, 15),
        QueryResult(2, 6, 10),
    ]
    assert idx.query_ast(ast.Term(3)) == [QueryResult(3, 15, 10)]
    # PUSH 2; PUSH 3; OR  (A side = term 3, last pushed)
    assert idx.query_ast(ast.Or(ast.Term(3), ast.Term(2))) == [
        QueryResult(2, 6, 15),
        QueryResult(3, 15, 10),
        QueryResult(2, 6, 10),
    ]
    # PUSH 2; PUSH 3; AND -> co-occurring doc 10 yields 2 rows, A first
    assert idx.query_ast(ast.And(ast.Term(3), ast.Term(2))) == [
        QueryResult(3, 15, 10),
        QueryResult(2, 6, 10),
    ]


def test_helloworld_via_chasm_bytes(helloworld_index):
    idx = helloworld_index
    buf = chasm.InstructionBuffer(32)
    w = chasm.InstructionWriter(buf)
    w.write_push_term(2)
    w.write_push_term(3)
    w.write_or()
    assert idx.query_chasm(buf.to_bytes()) == [
        QueryResult(2, 6, 15),
        QueryResult(3, 15, 10),
        QueryResult(2, 6, 10),
    ]


def test_missing_term_zero_rows(helloworld_index):
    # chearch.chpl:159-178: missing term must yield exactly 0 results
    assert helloworld_index.query_ast(ast.Term(999)) == []
    assert helloworld_index.query_ast(ast.And(ast.Term(999), ast.Term(2))) == []


def test_partition_limit_cap():
    idx = MemoryIndex(partition_limit=5)
    for i in range(20):
        idx.add_document([(7, 0)], 100 + i)
    assert len(idx.query_ast(ast.Term(7))) == 5


def test_wire_record_13_bytes(helloworld_index):
    # chearch_srv.chpl:52-66: 13-byte record term:4 BE, loc:1, extId:8 BE
    r = helloworld_index.query_ast(ast.Term(3))[0]
    wire = r.to_wire()
    assert len(wire) == 13
    assert QueryResult.from_wire(wire) == r


def test_snapshot_isolation():
    idx = MemoryIndex()
    idx.add_document([(5, 1)], 100)
    op = idx.operand_for_term(5, max_doc_index=idx.document_count)
    idx.add_document([(5, 2)], 200)  # added after snapshot
    assert len(list(op.evaluate())) == 1

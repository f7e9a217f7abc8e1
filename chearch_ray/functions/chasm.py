"""CHASM query bytecode — byte-level conformance codec.

Reimplements the reference's stack bytecode (chasm.chpl):

* opcodes HALT=0, PUSH=1, AND=2, OR=3 as uint8 (chasm.chpl:10-13);
* terms as 4-byte big-endian uint32 (chasm.chpl:82-88);
* InstructionBuffer: fixed-size byte buffer with an offset cursor and
  clear/rewind/can_advance/read/write (chasm.chpl:15-62);
* a stack interpreter (depth 1024, chasm.chpl:150-186) decoding the
  postfix program into a query tree.

`interpret` is generic over a leaf factory so the same program can
build an engine AST (chearch_ray.ast) or a conformance operand tree
(chearch_ray.conformance.operands) — the reference builds operands
directly via segment.operandForTerm (chasm.chpl:160-170).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from chearch_ray import ast

OP_HALT = 0
OP_PUSH = 1
OP_AND = 2
OP_OR = 3

MAX_STACK_DEPTH = 1024  # chasm.chpl:150
TERM_BYTES = 4
#: the TCP server caps a request at 256 instruction bytes
#: (chearch_srv.chpl:23); we keep the same default buffer size.
DEFAULT_BUFFER_SIZE = 256


class InstructionBuffer:
    """Fixed-size byte buffer with a cursor (chasm.chpl:15-62)."""

    def __init__(self, size: int = DEFAULT_BUFFER_SIZE, data: bytes | None = None):
        if data is not None:
            size = max(size, len(data))
        self.buffer = bytearray(size)
        self.count = 0  # bytes written
        self.offset = 0  # cursor
        if data is not None:
            self.buffer[: len(data)] = data
            self.count = len(data)

    def clear(self) -> None:
        self.count = 0
        self.offset = 0

    def rewind(self) -> None:
        self.offset = 0

    def can_advance(self, n: int = 1) -> bool:
        return self.offset + n <= len(self.buffer)

    def read(self) -> int:
        if self.offset >= self.count:
            raise IndexError("read past end of instruction buffer")
        b = self.buffer[self.offset]
        self.offset += 1
        return b

    def write(self, byte: int) -> bool:
        if self.offset >= len(self.buffer):
            return False
        self.buffer[self.offset] = byte & 0xFF
        self.offset += 1
        self.count = max(self.count, self.offset)
        return True

    def atEnd(self) -> bool:
        return self.offset >= self.count

    def to_bytes(self) -> bytes:
        return bytes(self.buffer[: self.count])


class InstructionReader:
    """chasm.chpl:64-88."""

    def __init__(self, buf: InstructionBuffer):
        self.buf = buf

    def has_more(self) -> bool:
        return not self.buf.atEnd()

    def read_op(self) -> int:
        return self.buf.read()

    def read_term(self) -> int:
        """4 bytes big-endian -> uint32 (chasm.chpl:82-88)."""
        value = 0
        for _ in range(TERM_BYTES):
            value = (value << 8) | self.buf.read()
        return value


class InstructionWriter:
    """chasm.chpl:91-145."""

    def __init__(self, buf: InstructionBuffer):
        self.buf = buf

    def write_term(self, term: int) -> bool:
        term &= 0xFFFFFFFF
        for shift in (24, 16, 8, 0):
            if not self.buf.write((term >> shift) & 0xFF):
                return False
        return True

    def write_push(self) -> bool:
        return self.buf.write(OP_PUSH)

    def write_push_term(self, term: int) -> bool:
        return self.write_push() and self.write_term(term)

    def write_and(self) -> bool:
        return self.buf.write(OP_AND)

    def write_or(self) -> bool:
        return self.buf.write(OP_OR)

    def write_halt(self) -> bool:
        return self.buf.write(OP_HALT)


def interpret(
    buf: InstructionBuffer,
    leaf: Callable[[int], Any],
    conj: Callable[[Any, Any], Any],
    disj: Callable[[Any, Any], Any],
) -> Any:
    """Stack-machine decode (chasm.chpl:150-186).

    PUSH t -> leaf(t); AND/OR pop two and combine — the FIRST pop is
    the A side (last pushed; it emits first on a merge match,
    FIXTURES.md §1).  Returns top of stack.
    """
    stack: list[Any] = []
    buf.rewind()
    reader = InstructionReader(buf)
    while reader.has_more():
        op = reader.read_op()
        if op == OP_HALT:
            break
        if op == OP_PUSH:
            stack.append(leaf(reader.read_term()))
        elif op in (OP_AND, OP_OR):
            if len(stack) < 2:
                raise ValueError("CHASM stack underflow")
            a = stack.pop()  # last pushed = A side
            b = stack.pop()
            stack.append(conj(a, b) if op == OP_AND else disj(a, b))
        else:
            raise ValueError(f"unknown CHASM opcode {op}")
        if len(stack) > MAX_STACK_DEPTH:
            raise ValueError("CHASM stack overflow")
    if not stack:
        raise ValueError("empty CHASM program")
    return stack[-1]


def parse_chasm(data: bytes) -> ast.Node:
    """bytes -> engine AST."""
    buf = InstructionBuffer(data=data)
    return interpret(buf, leaf=ast.Term, conj=ast.And, disj=ast.Or)


def emit_chasm(node: ast.Node, size: int = DEFAULT_BUFFER_SIZE) -> bytes:
    """engine AST -> postfix bytes.  Emits the B subtree before the A
    subtree so that decoding (A = last pushed) round-trips."""
    buf = InstructionBuffer(size)
    w = InstructionWriter(buf)

    def walk(n: ast.Node) -> None:
        if isinstance(n, ast.Term):
            if not isinstance(n.term, int):
                raise TypeError("CHASM encodes integer terms only (search.chpl:7)")
            if not w.write_push_term(n.term):
                raise ValueError("CHASM buffer overflow")
        elif isinstance(n, (ast.And, ast.Or)):
            walk(n.b)
            walk(n.a)
            ok = w.write_and() if isinstance(n, ast.And) else w.write_or()
            if not ok:
                raise ValueError("CHASM buffer overflow")
        else:  # pragma: no cover
            raise TypeError(f"unknown AST node {n!r}")

    walk(node)
    return buf.to_bytes()

"""Posting-merge operand algebra (conformance layer).

Reimplements the reference's lazily-evaluated query operand iterators
(operands.chpl:26-160) over Python state, preserving the exact —
sometimes surprising — semantics pinned by the golden helloworld output
(README.md:109-124):

* postings stream in DESCENDING documentIndex order (newest first,
  memorysegment.chpl:41-55);
* merge operators compare only `value & 0x00FFFFFF` (the documentIndex,
  operands.chpl:107-109);
* Union on a documentIndex tie yields BOTH sides (A first) — no doc
  dedup across different terms (operands.chpl:52-100);
* Intersection on a match yields TWO rows per co-occurring document:
  the A-side posting, then the B-side posting (operands.chpl:102-160).

The protocol (has_value / get_value / advance, with an inherited
evaluate() driver) mirrors the reference's Operand plugin surface
(operands.chpl:26-50); FixedDataOperand ports the third-party-operand
example from test/chearch_test.chpl:100-122.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from chearch_ray.conformance.docid import DOCUMENT_INDEX_MASK


def doc_index_of(value: int) -> int:
    """documentIndex of a 64-bit operand value (operands.chpl:107-109)."""
    return value & DOCUMENT_INDEX_MASK


class Operand:
    """Abstract query operand (operands.chpl:26-50)."""

    def has_value(self) -> bool:
        raise NotImplementedError

    def get_value(self) -> int:
        raise NotImplementedError

    def advance(self) -> None:
        raise NotImplementedError

    def evaluate(self) -> Iterator[int]:
        """Pull-based driver, inherited like the reference's
        Operand.evaluate (operands.chpl:44-49)."""
        while self.has_value():
            yield self.get_value()
            self.advance()


class NullOperand(Operand):
    """Empty operand for missing terms (search.chpl:11-13,
    memorysegment.chpl:314-317): always yields nothing."""

    def has_value(self) -> bool:
        return False

    def get_value(self) -> int:  # pragma: no cover - defensive
        raise RuntimeError("NullOperand has no value")

    def advance(self) -> None:  # pragma: no cover - defensive
        raise RuntimeError("NullOperand cannot advance")


class FixedDataOperand(Operand):
    """Operand over a fixed value sequence (test/chearch_test.chpl:100-122).

    Values must already be in descending documentIndex order.
    """

    def __init__(self, values: Sequence[int]):
        self._values = list(values)
        self._pos = 0

    def has_value(self) -> bool:
        return self._pos < len(self._values)

    def get_value(self) -> int:
        if not self.has_value():
            raise RuntimeError("operand exhausted")
        return self._values[self._pos]

    def advance(self) -> None:
        if not self.has_value():
            raise RuntimeError("operand exhausted")
        self._pos += 1


#: Posting-list operand = fixed sequence of packed (term<<32 | docId)
#: values in descending documentIndex order (memorysegment.chpl:41-55).
PostingListOperand = FixedDataOperand


class UnionOperand(Operand):
    """OR merge (operands.chpl:52-100).

    Emits from whichever side currently has the larger documentIndex;
    on a tie emits the A side first, then the B side — both rows
    survive because they differ in the term field (golden output
    README.md:118-121: OR over 2 docs yields 3 rows).
    """

    def __init__(self, a: Operand, b: Operand):
        self.a = a
        self.b = b

    def _current(self) -> Operand:
        if not self.a.has_value():
            return self.b
        if not self.b.has_value():
            return self.a
        # ties go to A (>=) — this is what makes both sides emit.
        if doc_index_of(self.a.get_value()) >= doc_index_of(self.b.get_value()):
            return self.a
        return self.b

    def has_value(self) -> bool:
        return self.a.has_value() or self.b.has_value()

    def get_value(self) -> int:
        if not self.has_value():
            raise RuntimeError("operand exhausted")
        return self._current().get_value()

    def advance(self) -> None:
        if not self.has_value():
            raise RuntimeError("operand exhausted")
        self._current().advance()


class IntersectionOperand(Operand):
    """AND merge = sorted-merge semi-join on documentIndex, BOTH sides
    kept (operands.chpl:102-160).

    Alignment: while documentIndexes differ, advance the side that is
    ahead (larger index, since streams are descending).  On a match the
    operand yields the A-side posting, then the B-side posting for the
    same document (curOp bookkeeping, operands.chpl:121-132), so one
    co-occurring doc produces 2 output rows (README.md:122-124).
    """

    _PHASE_A = 0
    _PHASE_B = 1

    def __init__(self, a: Operand, b: Operand):
        self.a = a
        self.b = b
        self._phase = self._PHASE_A
        self._align()

    def _align(self) -> None:
        while self.a.has_value() and self.b.has_value():
            da = doc_index_of(self.a.get_value())
            db = doc_index_of(self.b.get_value())
            if da == db:
                return
            if da > db:
                self.a.advance()
            else:
                self.b.advance()

    def _aligned(self) -> bool:
        return (
            self.a.has_value()
            and self.b.has_value()
            and doc_index_of(self.a.get_value()) == doc_index_of(self.b.get_value())
        )

    def has_value(self) -> bool:
        if self._phase == self._PHASE_B:
            return True
        return self._aligned()

    def get_value(self) -> int:
        if not self.has_value():
            raise RuntimeError("operand exhausted")
        return self.a.get_value() if self._phase == self._PHASE_A else self.b.get_value()

    def advance(self) -> None:
        if not self.has_value():
            raise RuntimeError("operand exhausted")
        if self._phase == self._PHASE_A:
            self._phase = self._PHASE_B
        else:
            self.a.advance()
            self.b.advance()
            self._phase = self._PHASE_A
            self._align()

"""Bit-packed internal document ids (conformance only).

Reference layout (documentid.chpl:12-26,40-42): a 32-bit DocId packs an
8-bit textLocation (term position, 0-255) in the high byte and a 24-bit
documentIndex (slot in the segment's doc table) in the low 3 bytes.  The
low-order placement of documentIndex is load-bearing: the merge
operators compare `value & 0x00FFFFFF` (operands.chpl:107-109).

The scale engine does NOT bit-pack (separate Arrow columns beat packing
under a columnar layout, SURVEY.md §2.2 M2); this module exists so the
conformance tests can reproduce and round-trip the reference encoding.
"""

from __future__ import annotations

TEXT_LOCATION_BITS = 8
DOCUMENT_INDEX_BITS = 24
MAX_DOCUMENT_INDEX = 1 << DOCUMENT_INDEX_BITS  # 2**24 docs per segment
DOCUMENT_INDEX_MASK = MAX_DOCUMENT_INDEX - 1  # 0x00FFFFFF
MAX_TEXT_LOCATION = (1 << TEXT_LOCATION_BITS) - 1


def assemble_doc_id(document_index: int, text_location: int) -> int:
    """(documentIndex, textLocation) -> packed 32-bit DocId
    (documentid.chpl:40-42)."""
    if not 0 <= document_index < MAX_DOCUMENT_INDEX:
        raise ValueError(f"document_index out of range: {document_index}")
    if not 0 <= text_location <= MAX_TEXT_LOCATION:
        raise ValueError(f"text_location out of range: {text_location}")
    return (text_location << DOCUMENT_INDEX_BITS) | document_index


def split_doc_id(doc_id: int) -> tuple[int, int]:
    """packed DocId -> (documentIndex, textLocation)
    (documentid.chpl:28-38)."""
    return doc_id & DOCUMENT_INDEX_MASK, (doc_id >> DOCUMENT_INDEX_BITS) & MAX_TEXT_LOCATION


def document_index_from_doc_id(doc_id: int) -> int:
    return doc_id & DOCUMENT_INDEX_MASK


def text_location_from_doc_id(doc_id: int) -> int:
    return (doc_id >> DOCUMENT_INDEX_BITS) & MAX_TEXT_LOCATION


def assemble_operand_value(term: int, doc_id: int) -> int:
    """64-bit operand wire value: term(32) | docId(32)
    (operands.chpl:5-22, memorysegment.chpl:38)."""
    return ((term & 0xFFFFFFFF) << 32) | (doc_id & 0xFFFFFFFF)


def split_operand_value(value: int) -> tuple[int, int]:
    """-> (term, packed doc_id)."""
    return (value >> 32) & 0xFFFFFFFF, value & 0xFFFFFFFF

"""Query-serving facade: the reference's binary wire protocol.

Reimplements the TCP server's request handling contract
(chearch_srv.chpl:20-72; client contract util/query_client.py:12-45):

* request  = 1 byte instruction count + CHASM opcode bytes (a PUSH
  carries a 4-byte big-endian term), total <= 256 bytes;
* response = up to MAX_RESPONSE_RECORDS (8) records of 13 bytes each:
  term:4 BE + textLocation:1 + externalDocId:8 BE.

The reference serves from forked OS processes sharing a socket; here
the handler is a plain function over a MemoryIndex (conformance mode)
or a WireEngine adapter over the scale engine — network transport is
out of scope in this sandbox, the byte contract is what matters.
"""

from __future__ import annotations

from chearch_ray.conformance.memory_index import MemoryIndex, QueryResult
from chearch_ray.functions import chasm

#: chearch_srv.chpl:39-40 — at most 8 records per response
MAX_RESPONSE_RECORDS = 8
#: chearch_srv.chpl:23 — request payload cap
MAX_REQUEST_BYTES = 256
WIRE_RECORD_BYTES = 13


def parse_request(request: bytes) -> bytes:
    """request frame -> CHASM program bytes (validates the count byte
    the way handle_received_data does)."""
    if len(request) < 1:
        raise ValueError("empty request")
    count = request[0]
    program = request[1:]
    if len(program) > MAX_REQUEST_BYTES:
        raise ValueError(f"request too large: {len(program)} > {MAX_REQUEST_BYTES}")
    # `count` is the instruction count; the reference copies exactly
    # that many opcodes (terms ride along with their PUSH).  We
    # validate it by decoding and counting.
    return program


def encode_response(results: list[QueryResult]) -> bytes:
    out = b"".join(r.to_wire() for r in results[:MAX_RESPONSE_RECORDS])
    return out


def decode_response(data: bytes) -> list[QueryResult]:
    if len(data) % WIRE_RECORD_BYTES:
        raise ValueError("torn response")
    return [
        QueryResult.from_wire(data[i : i + WIRE_RECORD_BYTES])
        for i in range(0, len(data), WIRE_RECORD_BYTES)
    ]


def build_request(program: bytes) -> bytes:
    """CHASM program -> request frame (instruction count prefix, as the
    python client builds it)."""
    buf = chasm.InstructionBuffer(data=program)
    buf.rewind()
    reader = chasm.InstructionReader(buf)
    n = 0
    while reader.has_more():
        op = reader.read_op()
        n += 1
        if op == chasm.OP_PUSH:
            reader.read_term()
        if op == chasm.OP_HALT:
            break
    return bytes([n]) + program


class WireServer:
    """Serving handler over the conformance MemoryIndex — byte-level
    equivalent of handle_received_data (chearch_srv.chpl:20-72)."""

    def __init__(self, index: MemoryIndex):
        self.index = index

    def handle(self, request: bytes) -> bytes:
        program = parse_request(request)
        results = self.index.query_chasm(program)
        return encode_response(results)

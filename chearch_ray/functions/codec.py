"""Posting-list codec: doc-id deltas + varint, fixed-size skip blocks
with block-max metadata.

North-star requirement: "docID deltas + varint/PForDelta compression,
skip blocks with block-max scores".  Canonical posting order is
ASCENDING doc id (SURVEY.md §2.6 O1 — the reference's newest-first
chain order, memorysegment.chpl:41-55, is an implementation artifact we
normalize; the conformance layer reverses where reference order
matters).

Layout per term:
  doc_blob  — varint stream of doc-id deltas.  Delta base restarts at
              each block boundary against the PREVIOUS block's last doc
              id, so any block can be decoded independently given the
              block_last array (the skip index).
  tf_blob   — varint stream of term frequencies, same block geometry.
  block_last    — uint64[] last doc id per block (skip pointers;
                  reference analogue: graduated pool blocks,
                  documentidpool.chpl:26-35).
  block_max_tf  — uint32[] max tf per block → block-max score upper
                  bounds for WAND/MaxScore pruning.
  block_doc_off / block_tf_off — byte offset of each block inside the
              blobs, enabling per-block skip decoding.

All encode/decode paths are numpy-vectorized (no per-value Python in
the hot path).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

_MAX_VARINT_BYTES = 10


def varint_encode(values: np.ndarray) -> bytes:
    """uint64 array -> LEB128 varint stream (vectorized)."""
    vals = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(vals)
    if n == 0:
        return b""
    # byte i of each value = bits [7i, 7i+7); needed while value >= 2^(7i)
    groups = np.empty((n, _MAX_VARINT_BYTES), dtype=np.uint8)
    needed = np.empty((n, _MAX_VARINT_BYTES), dtype=bool)
    shifted = vals.copy()
    for i in range(_MAX_VARINT_BYTES):
        groups[:, i] = (shifted & np.uint64(0x7F)).astype(np.uint8)
        needed[:, i] = shifted > 0 if i else np.ones(n, dtype=bool)
        shifted >>= np.uint64(7)
    # continuation bit on byte i iff byte i+1 is needed
    cont = np.zeros_like(needed)
    cont[:, :-1] = needed[:, 1:]
    groups |= cont.astype(np.uint8) << 7
    return groups[needed].tobytes()


def varint_byte_lengths(values: np.ndarray) -> np.ndarray:
    """encoded byte length of each value (for offset computation)."""
    vals = np.ascontiguousarray(values, dtype=np.uint64)
    lengths = np.ones(len(vals), dtype=np.int64)
    shifted = vals >> np.uint64(7)
    while shifted.any():
        lengths += (shifted > 0).astype(np.int64)
        shifted >>= np.uint64(7)
    return lengths


def varint_decode(buf: bytes | np.ndarray, count: int | None = None) -> np.ndarray:
    """varint stream -> uint64 array (vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if len(b) == 0:
        return np.empty(0, dtype=np.uint64)
    ends = np.flatnonzero(b < 0x80)
    if count is not None:
        ends = ends[:count]
    starts = np.empty(len(ends), dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    vals = np.zeros(len(ends), dtype=np.uint64)
    width = ends - starts + 1
    max_width = int(width.max()) if len(width) else 0
    for i in range(max_width):
        active = width > i
        idx = starts[active] + i
        vals[active] |= (b[idx] & np.uint64(0x7F)).astype(np.uint64) << np.uint64(7 * i)
    return vals


@dataclass
class EncodedPostings:
    count: int
    doc_blob: bytes
    tf_blob: bytes
    block_last: np.ndarray  # uint64, one per block
    block_max_tf: np.ndarray  # uint32
    block_doc_off: np.ndarray  # int64 byte offset of block start in doc_blob
    block_tf_off: np.ndarray  # int64


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray, block_size: int = 128) -> EncodedPostings:
    """doc_ids must be strictly ascending uint64; tfs parallel uint64/32."""
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.uint64)
    tfs = np.ascontiguousarray(tfs, dtype=np.uint64)
    n = len(doc_ids)
    if n == 0:
        z64 = np.empty(0, dtype=np.uint64)
        z32 = np.empty(0, dtype=np.uint32)
        zi = np.empty(0, dtype=np.int64)
        return EncodedPostings(0, b"", b"", z64, z32, zi, zi)
    deltas = np.empty(n, dtype=np.uint64)
    deltas[0] = doc_ids[0]
    deltas[1:] = doc_ids[1:] - doc_ids[:-1]
    # NB block-boundary deltas need no special restart: the consecutive
    # delta doc_ids[i]-doc_ids[i-1] at a block start is exactly "vs the
    # previous block's last doc id", which decode_block re-bases from
    # block_last[block-1].

    n_blocks = (n + block_size - 1) // block_size
    block_bounds = np.minimum(np.arange(1, n_blocks + 1) * block_size, n)
    block_last = doc_ids[block_bounds - 1]
    # per-block max tf
    block_max_tf = np.maximum.reduceat(tfs, np.arange(0, n, block_size)).astype(np.uint32)

    doc_lens = varint_byte_lengths(deltas)
    tf_lens = varint_byte_lengths(tfs)
    doc_cum = np.concatenate([[0], np.cumsum(doc_lens)])
    tf_cum = np.concatenate([[0], np.cumsum(tf_lens)])
    block_starts = np.arange(0, n, block_size)
    return EncodedPostings(
        count=n,
        doc_blob=varint_encode(deltas),
        tf_blob=varint_encode(tfs),
        block_last=block_last,
        block_max_tf=block_max_tf,
        block_doc_off=doc_cum[block_starts],
        block_tf_off=tf_cum[block_starts],
    )


def decode_postings(enc: EncodedPostings, block_size: int = 128) -> tuple[np.ndarray, np.ndarray]:
    """full decode -> (doc_ids ascending uint64, tfs uint64)."""
    if enc.count == 0:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.uint64)
    deltas = varint_decode(enc.doc_blob, enc.count)
    tfs = varint_decode(enc.tf_blob, enc.count)
    doc_ids = np.cumsum(deltas, dtype=np.uint64)
    return doc_ids, tfs


def encode_postings_bulk(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    term_bounds: np.ndarray,
    block_size: int = 128,
):
    """Encode ALL terms of a partition in one vectorized pass.

    doc_ids/tfs: the partition's postings sorted by (term, doc_id);
    term_bounds: int64 array of term boundaries (len = n_terms + 1).

    Returns a dict of arrays ready to become Parquet columns:
      doc_blob_offsets/tf_blob_offsets (int64, n_terms+1) into
      doc_blob_buf/tf_blob_buf (bytes) — build a zero-copy Arrow
      binary column via offsets+values; counts (uint64);
      block_* fields as Arrow list offsets + flat values.

    Semantically identical to per-term encode_postings (delta restart
    at term starts; per-term block geometry) — pinned by tests — but
    with no per-term Python loop: one varint pass over every delta,
    one over every tf, index arithmetic for block metadata.
    """
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.uint64)
    tfs = np.ascontiguousarray(tfs, dtype=np.uint64)
    term_bounds = np.ascontiguousarray(term_bounds, dtype=np.int64)
    n = len(doc_ids)
    n_terms = len(term_bounds) - 1
    starts = term_bounds[:-1]
    counts = np.diff(term_bounds)

    # global deltas with reset-to-absolute at each term start
    deltas = np.empty(n, dtype=np.uint64)
    if n:
        deltas[0] = doc_ids[0]
        deltas[1:] = doc_ids[1:] - doc_ids[:-1]
        deltas[starts] = doc_ids[starts]

    doc_lens = varint_byte_lengths(deltas)
    tf_lens = varint_byte_lengths(tfs)
    doc_cum = np.concatenate([[0], np.cumsum(doc_lens)])
    tf_cum = np.concatenate([[0], np.cumsum(tf_lens)])

    # ---- per-term block metadata, vectorized -------------------------
    n_blocks_per_term = (counts + block_size - 1) // block_size
    total_blocks = int(n_blocks_per_term.sum())
    block_list_offsets = np.concatenate([[0], np.cumsum(n_blocks_per_term)]).astype(np.int32)
    # index of each block within its term (0,1,2,... per term)
    block_term = np.repeat(np.arange(n_terms), n_blocks_per_term)
    block_idx_in_term = np.arange(total_blocks) - block_list_offsets[:-1][block_term]
    # posting index where each block starts / ends (global)
    blk_start = starts[block_term] + block_idx_in_term * block_size
    blk_end = np.minimum(blk_start + block_size, term_bounds[1:][block_term])
    block_last = doc_ids[blk_end - 1] if n else np.empty(0, dtype=np.uint64)
    # per-block max tf: reduceat over blk_start (strictly increasing)
    block_max_tf = (
        np.maximum.reduceat(tfs, blk_start).astype(np.uint32)
        if total_blocks
        else np.empty(0, dtype=np.uint32)
    )
    # byte offsets of each block inside its term's blob
    block_doc_off = doc_cum[blk_start] - doc_cum[starts[block_term]]
    block_tf_off = tf_cum[blk_start] - tf_cum[starts[block_term]]

    return {
        "counts": counts.astype(np.uint64),
        "doc_blob_buf": varint_encode(deltas),
        "tf_blob_buf": varint_encode(tfs),
        "doc_blob_offsets": doc_cum[term_bounds],
        "tf_blob_offsets": tf_cum[term_bounds],
        "block_list_offsets": block_list_offsets,
        "block_last": block_last,
        "block_max_tf": block_max_tf,
        "block_doc_off": block_doc_off.astype(np.int64),
        "block_tf_off": block_tf_off.astype(np.int64),
    }


def decode_block(
    enc: EncodedPostings, block: int, block_size: int = 128
) -> tuple[np.ndarray, np.ndarray]:
    """decode one skip block independently -> (doc_ids, tfs)."""
    n_blocks = len(enc.block_last)
    if not 0 <= block < n_blocks:
        raise IndexError(f"block {block} out of range ({n_blocks} blocks)")
    count = min(block_size, enc.count - block * block_size)
    doc_start = int(enc.block_doc_off[block])
    doc_end = int(enc.block_doc_off[block + 1]) if block + 1 < n_blocks else len(enc.doc_blob)
    tf_start = int(enc.block_tf_off[block])
    tf_end = int(enc.block_tf_off[block + 1]) if block + 1 < n_blocks else len(enc.tf_blob)
    deltas = varint_decode(np.frombuffer(enc.doc_blob, np.uint8)[doc_start:doc_end], count)
    tfs = varint_decode(np.frombuffer(enc.tf_blob, np.uint8)[tf_start:tf_end], count)
    base = enc.block_last[block - 1] if block > 0 else np.uint64(0)
    doc_ids = base + np.cumsum(deltas, dtype=np.uint64)
    return doc_ids, tfs


def decode_blocks(
    enc: EncodedPostings,
    blocks: np.ndarray,
    block_size: int = 128,
    codec: str = "varint",
) -> tuple[np.ndarray, np.ndarray]:
    """Decode ONLY the given skip blocks -> (doc_ids, tfs) concatenated
    in block order (ascending doc ids when `blocks` is sorted).

    This is the lazy block iteration of the reference's query model
    (memorysegment.chpl:41-55, documentidpool.chpl:84) — a selective
    probe against a hot term touches a handful of blocks instead of
    decoding the whole list.  The varint path is one vectorized pass
    over the gathered block bytes; bp128/pfor decode per block (already
    block-framed formats).
    """
    blocks = np.ascontiguousarray(blocks, dtype=np.int64)
    if len(blocks) == 0 or enc.count == 0:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.uint64)
    n_blocks = len(enc.block_last)
    counts = np.minimum(block_size, enc.count - blocks * block_size).astype(np.int64)
    total = int(counts.sum())
    bases = np.where(blocks > 0, enc.block_last[np.maximum(blocks - 1, 0)], np.uint64(0))

    doc_buf = np.frombuffer(enc.doc_blob, dtype=np.uint8)
    tf_buf = np.frombuffer(enc.tf_blob, dtype=np.uint8)

    def _ends(offs: np.ndarray, blob_len: int) -> np.ndarray:
        nxt = blocks + 1
        return np.where(nxt < n_blocks, offs[np.minimum(nxt, n_blocks - 1)], blob_len)

    doc_starts = enc.block_doc_off[blocks]
    doc_ends = _ends(enc.block_doc_off, len(doc_buf))
    tf_starts = enc.block_tf_off[blocks]
    tf_ends = _ends(enc.block_tf_off, len(tf_buf))

    if codec == "varint":
        doc_bytes = np.concatenate(
            [doc_buf[int(s) : int(e)] for s, e in zip(doc_starts, doc_ends)]
        )
        tf_bytes = np.concatenate(
            [tf_buf[int(s) : int(e)] for s, e in zip(tf_starts, tf_ends)]
        )
        deltas = varint_decode(doc_bytes, total)
        tfs = varint_decode(tf_bytes, total)
    elif codec in ("bp128", "pfor"):
        dec = bp_decode_block_bytes if codec == "bp128" else pfor_decode_block_bytes
        deltas = np.empty(total, dtype=np.uint64)
        tfs = np.empty(total, dtype=np.uint64)
        pos = 0
        for i in range(len(blocks)):
            c = int(counts[i])
            deltas[pos : pos + c] = dec(doc_buf[int(doc_starts[i]) : int(doc_ends[i])], c)
            tfs[pos : pos + c] = dec(tf_buf[int(tf_starts[i]) : int(tf_ends[i])], c)
            pos += c
    else:
        raise ValueError(f"unknown codec {codec!r}")

    # segment-wise cumsum: rebase each block's running sum onto the
    # previous block's last doc id (uint64 wraparound-safe: values only
    # grow within a block)
    starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
    cs = np.cumsum(deltas, dtype=np.uint64)
    base_before = cs[starts] - deltas[starts]
    doc_ids = cs - np.repeat(base_before, counts) + np.repeat(bases.astype(np.uint64), counts)
    return doc_ids, tfs


# ------------------------------------------------------- positions codec
# Positions blob: per-occurrence token positions, delta+varint with a
# restart at each posting boundary (first position absolute, then
# in-posting diffs — positions are ascending within a posting).  The
# packed per-posting form is self-contained, so posting runs can be
# sliced/concatenated byte-wise through the shuffle and index merge
# without re-encoding.  (ROADMAP item 5: positions were 14% of
# shuffle-run bytes as parquet list<list<uint32>>.)

def pack_position_lists(pos_lists) -> "pa.Array":
    """Arrow list<uint32> (one list per posting) -> binary array (one
    packed varint-delta cell per posting), zero-copy assembled."""
    import pyarrow as pa

    if isinstance(pos_lists, pa.ChunkedArray):
        pos_lists = pos_lists.combine_chunks()
    n = len(pos_lists)
    offsets = np.asarray(pos_lists.offsets, dtype=np.int64)
    flat = np.asarray(pos_lists.values, dtype=np.uint64)
    # .values is the whole child array; offsets index into it absolutely
    flat = flat[offsets[0] : offsets[-1]]
    offsets = offsets - offsets[0]
    if len(flat) == 0:
        off32 = pa.py_buffer(np.zeros(n + 1, dtype=np.int32).tobytes())
        return pa.Array.from_buffers(pa.binary(), n, [None, off32, pa.py_buffer(b"")])
    counts = np.diff(offsets)
    starts = offsets[:-1][counts > 0]
    deltas = np.empty_like(flat)
    deltas[0] = flat[0]
    deltas[1:] = flat[1:] - flat[:-1]
    deltas[starts] = flat[starts]
    lens = varint_byte_lengths(deltas)
    cum = np.concatenate([[0], np.cumsum(lens)])
    byte_off = cum[offsets]
    if byte_off[-1] >= (1 << 31):
        raise ValueError("positions blob exceeds 2 GiB in one batch")
    off32 = pa.py_buffer(byte_off.astype(np.int32).tobytes())
    return pa.Array.from_buffers(
        pa.binary(), n, [None, off32, pa.py_buffer(varint_encode(deltas))]
    )


def unpack_position_blob(blob, counts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """packed positions blob of one term + per-posting occurrence
    counts -> (flat absolute positions uint64, int64 list offsets)."""
    counts = np.ascontiguousarray(counts, dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    total = int(offsets[-1])
    if total == 0:
        return np.empty(0, dtype=np.uint64), offsets
    deltas = varint_decode(blob, total)
    starts = offsets[:-1][counts > 0]
    cs = np.cumsum(deltas, dtype=np.uint64)
    base = cs[starts] - deltas[starts]
    out = cs - np.repeat(base, counts[counts > 0])
    return out, offsets


# ----------------------------------------------------------- BP128 codec
# Binary packing (FastPFor-family "BP" variant, the PForDelta axis of
# the north star): per skip block, all deltas after the first are
# bit-packed at the block's max bit width.  Block layout:
#   [width: 1 byte][first delta: varint][remaining n-1 deltas packed
#    LSB-first at `width` bits]
# The first delta is kept out of the packed payload because absolute
# doc ids (64-bit hashes) would force width 64 on the first block.

def _bit_width(values: np.ndarray) -> int:
    if len(values) == 0:
        return 0
    m = int(values.max())
    return max(1, m.bit_length()) if m else 1


def _bp_pack(values: np.ndarray, width: int) -> bytes:
    """LSB-first bit-pack uint64 values at `width` bits each."""
    if len(values) == 0 or width == 0:
        return b""
    shifts = np.arange(width, dtype=np.uint64)
    bits = ((values[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.reshape(-1), bitorder="little").tobytes()


def _bp_unpack(buf: np.ndarray, count: int, width: int) -> np.ndarray:
    if count == 0 or width == 0:
        return np.empty(0, dtype=np.uint64)
    bits = np.unpackbits(buf, bitorder="little", count=count * width)
    weights = np.uint64(1) << np.arange(width, dtype=np.uint64)
    return (bits.reshape(count, width).astype(np.uint64) * weights).sum(
        axis=1, dtype=np.uint64
    )


def bp_encode_stream(values: np.ndarray, block_size: int = 128) -> tuple[bytes, np.ndarray]:
    """delta/tf stream -> (blob, byte offset per block).  `values` are
    the per-posting values with block semantics identical to the varint
    codec (delta restart handled by the caller's delta computation)."""
    values = np.ascontiguousarray(values, dtype=np.uint64)
    chunks: list[bytes] = []
    offsets = [0]
    for s in range(0, len(values), block_size):
        block = values[s : s + block_size]
        first = block[:1]
        rest = block[1:]
        width = _bit_width(rest)
        payload = bytes([width]) + varint_encode(first) + _bp_pack(rest, width)
        chunks.append(payload)
        offsets.append(offsets[-1] + len(payload))
    return b"".join(chunks), np.array(offsets[:-1], dtype=np.int64)


def bp_decode_block_bytes(buf: np.ndarray, count: int) -> np.ndarray:
    """one block's bytes -> values (count = postings in block)."""
    if count == 0:
        return np.empty(0, dtype=np.uint64)
    width = int(buf[0])
    first = varint_decode(buf[1:], 1)
    ends = np.flatnonzero(buf[1:] < 0x80)
    varint_len = int(ends[0]) + 1
    rest = _bp_unpack(buf[1 + varint_len :], count - 1, width)
    return np.concatenate([first, rest])


def bp_decode_stream(
    blob: bytes, count: int, block_offsets: np.ndarray, block_size: int = 128
) -> np.ndarray:
    buf = np.frombuffer(blob, dtype=np.uint8)
    out = np.empty(count, dtype=np.uint64)
    n_blocks = len(block_offsets)
    for i in range(n_blocks):
        s = int(block_offsets[i])
        e = int(block_offsets[i + 1]) if i + 1 < n_blocks else len(buf)
        n = min(block_size, count - i * block_size)
        out[i * block_size : i * block_size + n] = bp_decode_block_bytes(buf[s:e], n)
    return out


def encode_postings_bp(doc_ids: np.ndarray, tfs: np.ndarray, block_size: int = 128,
                       stream_encode=None) -> EncodedPostings:
    """BP128/PFor per-term encoder (same EncodedPostings shape; blobs
    use the packed block layout; pass stream_encode=pfor_encode_stream
    for PFor).  Delta semantics identical to the varint codec, so
    decode is cumsum over the same delta stream."""
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.uint64)
    tfs = np.ascontiguousarray(tfs, dtype=np.uint64)
    n = len(doc_ids)
    if n == 0:
        z64 = np.empty(0, dtype=np.uint64)
        z32 = np.empty(0, dtype=np.uint32)
        zi = np.empty(0, dtype=np.int64)
        return EncodedPostings(0, b"", b"", z64, z32, zi, zi)
    deltas = np.empty(n, dtype=np.uint64)
    deltas[0] = doc_ids[0]
    deltas[1:] = doc_ids[1:] - doc_ids[:-1]
    n_blocks = (n + block_size - 1) // block_size
    block_bounds = np.minimum(np.arange(1, n_blocks + 1) * block_size, n)
    block_last = doc_ids[block_bounds - 1]
    block_max_tf = np.maximum.reduceat(tfs, np.arange(0, n, block_size)).astype(np.uint32)
    enc_stream = stream_encode or bp_encode_stream
    doc_blob, doc_off = enc_stream(deltas, block_size)
    tf_blob, tf_off = enc_stream(tfs, block_size)
    return EncodedPostings(
        count=n,
        doc_blob=doc_blob,
        tf_blob=tf_blob,
        block_last=block_last,
        block_max_tf=block_max_tf,
        block_doc_off=doc_off,
        block_tf_off=tf_off,
    )


def decode_postings_any(
    enc: EncodedPostings, block_size: int = 128, codec: str = "varint"
) -> tuple[np.ndarray, np.ndarray]:
    """codec-dispatching full decode."""
    if codec == "varint":
        return decode_postings(enc, block_size)
    if codec == "bp128":
        stream = bp_decode_stream
    elif codec == "pfor":
        stream = pfor_decode_stream
    else:
        raise ValueError(f"unknown codec {codec!r}")
    if enc.count == 0:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.uint64)
    deltas = stream(enc.doc_blob, enc.count, enc.block_doc_off, block_size)
    tfs = stream(enc.tf_blob, enc.count, enc.block_tf_off, block_size)
    return np.cumsum(deltas, dtype=np.uint64), tfs


# ------------------------------------------------------------ PFor codec
# Classic PForDelta: pack each block at a width covering ~90% of its
# values; outliers ("exceptions") are stored out-of-line so one big
# delta doesn't widen the whole block.  Block layout:
#   [width: 1][n_exceptions: 1][varint first delta]
#   [remaining n-1 deltas packed at `width` (exceptions packed as 0)]
#   [exception entries: (slot index: 1 byte) (varint true value)]*
# Blocks are <= 128 postings, so 1-byte slot indexes suffice.

def _pfor_pick_width(rest: np.ndarray) -> int:
    """width minimizing payload+exception bytes (deterministic)."""
    if len(rest) == 0:
        return 0
    # exact bit width of each value
    bw = np.ones(len(rest), dtype=np.int64)
    v = rest.copy()
    shifted = v >> np.uint64(1)
    while shifted.any():
        bw += (shifted > 0).astype(np.int64)
        shifted >>= np.uint64(1)
    best_w, best_cost = 64, None
    for w in sorted(set(bw.tolist())):
        n_exc = int((bw > w).sum())
        if n_exc > 255:
            continue
        cost = (len(rest) * w + 7) // 8 + n_exc * 3  # ~3B per exception
        if best_cost is None or cost < best_cost:
            best_w, best_cost = int(w), cost
    return best_w


def pfor_encode_stream(values: np.ndarray, block_size: int = 128) -> tuple[bytes, np.ndarray]:
    values = np.ascontiguousarray(values, dtype=np.uint64)
    chunks: list[bytes] = []
    offsets = [0]
    for s in range(0, len(values), block_size):
        block = values[s : s + block_size]
        first, rest = block[:1], block[1:]
        width = _pfor_pick_width(rest)
        if width >= 64:
            exc_mask = np.zeros(len(rest), dtype=bool)
        else:
            exc_mask = rest >= (np.uint64(1) << np.uint64(width))
        packed_vals = np.where(exc_mask, np.uint64(0), rest)
        exc_idx = np.flatnonzero(exc_mask)
        payload = (
            bytes([width, len(exc_idx)])
            + varint_encode(first)
            + _bp_pack(packed_vals, width)
            + exc_idx.astype(np.uint8).tobytes()
            + varint_encode(rest[exc_mask])
        )
        chunks.append(payload)
        offsets.append(offsets[-1] + len(payload))
    return b"".join(chunks), np.array(offsets[:-1], dtype=np.int64)


def pfor_decode_block_bytes(buf: np.ndarray, count: int) -> np.ndarray:
    if count == 0:
        return np.empty(0, dtype=np.uint64)
    width, n_exc = int(buf[0]), int(buf[1])
    body = buf[2:]
    first = varint_decode(body, 1)
    ends = np.flatnonzero(body < 0x80)
    vlen = int(ends[0]) + 1
    packed_bytes = (max(count - 1, 0) * width + 7) // 8
    rest = _bp_unpack(body[vlen : vlen + packed_bytes], count - 1, width)
    if n_exc:
        tail = body[vlen + packed_bytes :]
        exc_idx = tail[:n_exc].astype(np.int64)
        exc_vals = varint_decode(tail[n_exc:], n_exc)
        rest[exc_idx] = exc_vals
    return np.concatenate([first, rest])


def pfor_decode_stream(
    blob: bytes, count: int, block_offsets: np.ndarray, block_size: int = 128
) -> np.ndarray:
    buf = np.frombuffer(blob, dtype=np.uint8)
    out = np.empty(count, dtype=np.uint64)
    n_blocks = len(block_offsets)
    for i in range(n_blocks):
        s = int(block_offsets[i])
        e = int(block_offsets[i + 1]) if i + 1 < n_blocks else len(buf)
        n = min(block_size, count - i * block_size)
        out[i * block_size : i * block_size + n] = pfor_decode_block_bytes(buf[s:e], n)
    return out

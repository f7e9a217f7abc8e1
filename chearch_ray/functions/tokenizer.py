"""Arrow-vectorized code tokenizer.

The reference engine is string-free — tokenization happens outside it
(README.md:15; the words.txt dictionary is a missing blob).  Our engine
owns the string layer (SURVEY.md §2.8): lowercase + split on
non-identifier characters, entirely in pyarrow.compute kernels so the
tokenize stage is zero-copy over Arrow batches with no per-row Python.

The default split mode is deliberately expressible in DuckDB
(`regexp_split_to_array(lower(content), '[^a-z0-9_]+')`) so the driver
oracle SQL can replicate it exactly.  Sub-token mode additionally
splits camelCase / snake_case identifiers (a vectorized regex pre-pass).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: token *separator* pattern in default mode.  Lowercasing happens
#: first, so the class needs only a-z.
DEFAULT_SPLIT_REGEX = "[^a-z0-9_]+"
#: sub-token mode also treats '_' as a separator (snake_case split).
SUBTOKEN_SPLIT_REGEX = "[^a-z0-9]+"
#: camelCase boundaries: acronym→word (XMLHttp -> XML Http), then
#: lower→upper (camelCase -> camel Case).  RE2 replacement backrefs;
#: applied before lowercasing.
_ACRONYM_BOUNDARY = r"([A-Z]+)([A-Z][a-z])"
_CAMEL_BOUNDARY = r"([a-z0-9])([A-Z])"


def _as_array(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        return col.combine_chunks()
    return col


# byte-level fast path (ASCII): RE2 split_pattern_regex runs at only
# ~30 MB/s/core on code text; a lookup-table pass over the raw utf8
# buffer is ~10x faster and bit-identical for ASCII input (non-ASCII
# bytes are >= 0x80, which the default pattern treats as separators
# anyway — but full-unicode lower() can differ, e.g. U+212A -> 'k',
# so the fast path only engages when the batch is pure ASCII).
def _lower_ascii(chunk: np.ndarray) -> np.ndarray:
    """A-Z -> a-z via arithmetic (numpy uint8 table gathers run at only
    ~100M elem/s; range-compare + add is several times faster)."""
    upper = (chunk >= 65) & (chunk <= 90)
    return chunk + upper.astype(np.uint8) * np.uint8(32)


def _is_token_byte(lowered: np.ndarray) -> np.ndarray:
    return (
        ((lowered >= 97) & (lowered <= 122))
        | ((lowered >= 48) & (lowered <= 57))
        | (lowered == 95)
    )


def _tokenize_ascii(arr: pa.Array) -> pa.ListArray:
    """lowercase + default-pattern split via byte LUTs; output is
    identical to the regex path for ASCII input (pinned by tests).
    Handles both string (int32 offsets) and large_string (int64)."""
    n = len(arr)
    buffers = arr.buffers()
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    raw_offsets = np.frombuffer(buffers[1], dtype=off_dtype)
    offsets = raw_offsets[arr.offset : arr.offset + n + 1].astype(np.int64)
    data = np.frombuffer(buffers[2], dtype=np.uint8) if buffers[2] is not None else np.empty(0, np.uint8)
    start, end = int(offsets[0]), int(offsets[-1])
    chunk = data[start:end]
    lowered = _lower_ascii(chunk)
    is_tok = _is_token_byte(lowered)

    # forced breaks at document boundaries (adjacent docs' bytes are
    # contiguous in the buffer; a token must not span them)
    doc_starts = (offsets - start)[:-1]
    break_before = np.zeros(len(chunk) + 1, dtype=bool)
    break_before[doc_starts[doc_starts < len(chunk)]] = True

    prev_tok = np.concatenate([[False], is_tok[:-1]])
    starts_mask = is_tok & (~prev_tok | break_before[: len(chunk)])
    next_tok = np.concatenate([is_tok[1:], [False]])
    ends_mask = is_tok & (~next_tok | break_before[1 : len(chunk) + 1])
    tok_starts = np.flatnonzero(starts_mask)
    tok_ends = np.flatnonzero(ends_mask) + 1

    values_buf = lowered[is_tok]
    lengths = tok_ends - tok_starts
    out_offsets = np.zeros(len(lengths) + 1, dtype=np.int32)
    np.cumsum(lengths, out=out_offsets[1:])
    strings = pa.Array.from_buffers(
        pa.string(),
        len(lengths),
        [None, pa.py_buffer(out_offsets.tobytes()), pa.py_buffer(values_buf.tobytes())],
    )
    # tokens per doc -> outer list offsets
    doc_of_token = np.searchsorted(doc_starts, tok_starts, side="right") - 1
    counts = np.bincount(doc_of_token, minlength=n)
    outer = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(counts, out=outer[1:])
    return pa.ListArray.from_arrays(pa.array(outer, type=pa.int32()), strings)


def tokenize(
    col: pa.Array | pa.ChunkedArray,
    lowercase: bool = True,
    split_subtokens: bool = False,
    split_regex: str | None = None,
) -> pa.ListArray:
    """string column -> list<string> of tokens, empties removed.

    Fully vectorized: utf8_lower + split_pattern_regex + an offset
    recomputation with numpy to drop the empty strings the split
    produces at string edges.  `split_regex` overrides the default
    separator pattern (EngineConfig.token_split_regex); sub-token mode
    uses its own separator and ignores it.
    """
    arr = _as_array(col)
    arr = pc.fill_null(arr, "")
    if split_subtokens:
        arr = pc.replace_substring_regex(arr, pattern=_ACRONYM_BOUNDARY, replacement=r"\1 \2")
        arr = pc.replace_substring_regex(arr, pattern=_CAMEL_BOUNDARY, replacement=r"\1 \2")
        split_re = SUBTOKEN_SPLIT_REGEX
    else:
        split_re = split_regex or DEFAULT_SPLIT_REGEX
        if (
            lowercase
            and split_re == DEFAULT_SPLIT_REGEX
            and len(arr) > 0
            and (pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type))
            and pc.all(pc.string_is_ascii(arr)).as_py()
        ):
            return _tokenize_ascii(arr)
    if lowercase:
        arr = pc.utf8_lower(arr)
    lists = pc.split_pattern_regex(arr, pattern=split_re)
    return drop_empty_tokens(lists)


def drop_empty_tokens(lists: pa.ListArray | pa.ChunkedArray) -> pa.ListArray:
    """Remove '' entries from a list<string> array, preserving list
    boundaries (split_pattern_regex yields '' at string edges)."""
    lists = _as_array(lists)
    # offsets point into the (unsliced) child values array
    offsets = np.asarray(lists.offsets)
    values = lists.values
    keep = pc.greater(pc.binary_length(values), 0)
    keep_np = np.asarray(keep).astype(np.int64)
    kept_values = values.filter(keep)
    # new_offset[i] = number of kept values before original offset[i]
    cum = np.concatenate([[0], np.cumsum(keep_np)])
    new_offsets = cum[offsets]
    return pa.ListArray.from_arrays(pa.array(new_offsets, type=pa.int32()), kept_values)


def token_counts(lists: pa.ListArray | pa.ChunkedArray) -> np.ndarray:
    """tokens per document (= doc_len for BM25)."""
    return np.asarray(pc.list_value_length(_as_array(lists))).astype(np.int64)


def explode(lists: pa.ListArray) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """list<string> -> (flat token values, row index per token,
    position-in-doc per token).

    The row index maps each token back to its document (numpy repeat
    over list lengths); position is the token's index within its doc —
    the engine's analogue of the reference's textLocation
    (documentid.chpl:17-18; ours is uint32, not 8-bit).
    """
    lists = _as_array(lists)
    offsets = np.asarray(lists.offsets).astype(np.int64)
    lengths = np.diff(offsets)
    row_idx = np.repeat(np.arange(len(lists), dtype=np.int64), lengths)
    positions = np.arange(offsets[-1] - offsets[0], dtype=np.int64) - np.repeat(
        offsets[:-1] - offsets[0], lengths
    )
    values = lists.values
    if offsets[0] != 0 or len(values) != offsets[-1] - offsets[0]:
        values = values.slice(offsets[0], offsets[-1] - offsets[0])
    return values, row_idx, positions

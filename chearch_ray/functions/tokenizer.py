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

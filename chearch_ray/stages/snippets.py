"""Result snippets: for every document containing a term, the
first-occurrence token ordinal and a +/-`window`-token context string.

Snippets are built from NORMALIZED tokens (the tokenizer's output
space, the same ordinals the index stores as positions —
documentid.chpl:17-18's textLocation is the reference analogue), so
the result is a deterministic pure function of (text, term, window)
and a SQL oracle over the positional tokenization matches it
verbatim.  Typical use composes with the engine: BM25 top-k ids ->
pruned corpus read (only those row groups leave storage) -> this
stage; at k docs the extraction cost is nil next to the search.

Fully vectorized: one tokenize per batch, first-occurrence via
np.minimum.at, window tokens masked in the exploded (row, position)
arrays, and per-row joins via ListArray + pc.binary_join — no Python
loop over rows or tokens.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from chearch_ray.functions.tokenizer import explode, tokenize

_SNIPPET_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("pos", pa.int64()), ("snippet", pa.string())]
)


def _snippet_batch(batch: pa.Table, term: str, window: int, text_column: str) -> pa.Table:
    lists = tokenize(batch[text_column])
    values, rows, positions = explode(lists)
    hit = np.asarray(pc.equal(values, term)).astype(bool)
    n = len(batch)
    first = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(first, rows[hit], positions[hit])
    has = first != np.iinfo(np.int64).max
    if not has.any():
        return _SNIPPET_SCHEMA.empty_table()
    lo = first[rows] - window
    hi = first[rows] + window
    keep = has[rows] & (positions >= lo) & (positions <= hi)
    # tokens arrive in (row, position) order from explode, so the kept
    # run of each row is already its snippet in order
    kept_rows = rows[keep]
    counts = np.zeros(n, dtype=np.int64)
    np.add.at(counts, kept_rows, 1)
    counts = counts[has]
    offsets = np.concatenate(([0], np.cumsum(counts)))
    kept_vals = values.filter(pa.array(keep))
    snips = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), kept_vals),
        " ",
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"].cast(pa.int64()).filter(pa.array(has)),
            "pos": pa.array(first[has], type=pa.int64()),
            "snippet": snips.cast(pa.string()),
        }
    )


def extract_snippets(ds, term: str, window: int = 2, text_column: str = "text"):
    """(doc_id, text) Dataset -> (doc_id, pos, snippet) for every doc
    containing `term`: pos is the 0-based first-occurrence token
    ordinal, snippet the space-joined tokens [pos-window, pos+window]."""
    return ds.map_batches(
        partial(_snippet_batch, term=term, window=window, text_column=text_column),
        batch_format="pyarrow",
    )

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


def snippet_rows(batch: pa.Table, terms, window: int,
                 text_column: str = "text") -> pa.Table:
    """Multi-term snippets over an in-memory table (the SERVING shape:
    k fetched docs, not a corpus scan): the anchor is the EARLIEST
    first occurrence of ANY of `terms` in the doc — "the first place
    any query term appears" — and the snippet is the ±window-token
    context around it.  Id columns (doc_id, and doc_id_hi when
    present) pass through with their INPUT types (serving ids are
    uint64 hashes past int64 range); rows where no term occurs drop.
    With one term and an int64 doc_id this matches `_snippet_batch`
    verbatim."""
    return _snippet_core(batch, list(terms), window, text_column)


def _snippet_batch(batch: pa.Table, term: str, window: int, text_column: str) -> pa.Table:
    out = _snippet_core(batch, [term], window, text_column)
    if len(out) == 0:
        return _SNIPPET_SCHEMA.empty_table()
    # dataset-path compat: the corpus-scan pipeline (and its SQL
    # oracle) declares int64 doc ids
    return pa.table({"doc_id": out["doc_id"].cast(pa.int64()),
                     "pos": out["pos"], "snippet": out["snippet"]})


def _snippet_core(batch: pa.Table, terms: list[str], window: int,
                  text_column: str) -> pa.Table:
    id_cols = [c for c in ("doc_id", "doc_id_hi") if c in batch.column_names]

    def _empty() -> pa.Table:
        cols = {c: pa.array([], type=batch.schema.field(c).type)
                for c in id_cols}
        cols["pos"] = pa.array([], type=pa.int64())
        cols["snippet"] = pa.array([], type=pa.string())
        return pa.table(cols)

    lists = tokenize(batch[text_column])
    values, rows, positions = explode(lists)
    if len(terms) == 1:
        hit = np.asarray(pc.equal(values, terms[0])).astype(bool)
    else:
        hit = np.asarray(
            pc.is_in(values, value_set=pa.array(terms, type=values.type))
        ).astype(bool)
    n = len(batch)
    first = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(first, rows[hit], positions[hit])
    has = first != np.iinfo(np.int64).max
    if not has.any():
        return _empty()
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
    has_arr = pa.array(has)
    cols = {c: batch[c].filter(has_arr) for c in id_cols}
    cols["pos"] = pa.array(first[has], type=pa.int64())
    cols["snippet"] = snips.cast(pa.string())
    return pa.table(cols)


def extract_snippets(ds, term: str, window: int = 2, text_column: str = "text"):
    """(doc_id, text) Dataset -> (doc_id, pos, snippet) for every doc
    containing `term`: pos is the 0-based first-occurrence token
    ordinal, snippet the space-joined tokens [pos-window, pos+window]."""
    return ds.map_batches(
        partial(_snippet_batch, term=term, window=window, text_column=text_column),
        batch_format="pyarrow",
    )

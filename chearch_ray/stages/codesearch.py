"""Distributed regex search over a text/code corpus (grep-as-a-stage).

The graft's input is a Parquet table of source-code files; the
day-one query against such a corpus — before any index exists — is
structural grep: "every line matching this pattern, with file and
line number".  The reference engine only searches its tokenized
inverted index (search.chpl); a code-corpus user also needs raw
pattern scans, so this stage provides them Ray-Data-first:

* one `map_batches` pass, `batch_format="pyarrow"`, stateless tasks
  (no actor state: the regex is compiled inside Arrow's RE2 kernels
  per batch, which is nanoseconds next to the scan itself);
* all three kernels are vectorized RE2 over Arrow string buffers
  (`match_substring_regex` / `count_substring_regex` /
  `extract_regex`) — no Python loop over rows, no decode of the
  untouched columns (callers should `select_columns` / pass
  `columns=` at the read so only (id, text) leave storage);
* DuckDB's regexp functions are also RE2, so every operator here has
  a bit-exact SQL mirror (driver rows `grep_lines`, `regex_count`).

At 100 TB this is embarrassingly parallel: no shuffle, output is a
stream of match rows with bounded per-batch memory (the line explode
is offset arithmetic over the batch's own buffers, and the flat line
array is filtered before anything is copied).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _str_array(batch: pa.Table, column: str) -> pa.Array:
    arr = batch[column]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr


def _grep_batch(batch: pa.Table, pattern: str, text_column: str,
                id_columns: list[str]) -> pa.Table:
    txt = _str_array(batch, text_column)
    lines = pc.split_pattern(txt, "\n")
    flat = pc.list_flatten(lines)
    parents = pc.list_parent_indices(lines).to_numpy()
    # 1-based line number within its document: position in the flat
    # array minus the parent's list offset (pure offset arithmetic)
    offsets = np.asarray(lines.offsets)
    line_no = np.arange(len(flat), dtype=np.int64) - offsets[parents] + 1
    hit = pc.match_substring_regex(flat, pattern).to_numpy(zero_copy_only=False)
    idx = np.flatnonzero(hit)
    cols: dict[str, pa.Array] = {}
    for c in id_columns:
        cols[c] = _str_array(batch, c).take(pa.array(parents[idx]))
    cols["line_no"] = pa.array(line_no[idx], type=pa.int64())
    cols["line"] = flat.take(pa.array(idx))
    return pa.table(cols)


def grep(ds, pattern: str, text_column: str = "text",
         id_columns: list[str] | None = None):
    """Dataset -> (id columns..., line_no, line): every line of every
    document matching `pattern` (RE2 partial match, like grep).  One
    stateless vectorized pass; the output streams."""
    id_columns = list(id_columns or ["doc_id"])
    return ds.map_batches(
        _grep_batch,
        batch_format="pyarrow",
        fn_kwargs={"pattern": pattern, "text_column": text_column,
                   "id_columns": id_columns},
    )


def _regex_count_batch(batch: pa.Table, pattern: str, extract: str | None,
                       text_column: str, id_columns: list[str]) -> pa.Table:
    txt = _str_array(batch, text_column)
    cols: dict[str, pa.Array] = {c: _str_array(batch, c) for c in id_columns}
    cols["n_matches"] = pc.count_substring_regex(txt, pattern).cast(pa.int64())
    if extract is not None:
        # whole first match; '' when no match — the exact convention
        # of DuckDB's regexp_extract(text, pat, 0).  Arrow's
        # extract_regex only allows NAMED groups, so the pattern is
        # wrapped in one (inner groups must be non-capturing (?:..)).
        groups = pc.extract_regex(txt, f"(?P<m0>{extract})")
        cols["first_match"] = pc.coalesce(
            pc.struct_field(groups, 0), pa.scalar("", type=pa.string())
        )
    return pa.table(cols)


def regex_count(ds, pattern: str, extract: str | None = None,
                text_column: str = "text",
                id_columns: list[str] | None = None):
    """Dataset -> (id columns..., n_matches[, first_match]): per-row
    count of non-overlapping RE2 matches, optionally the whole first
    match of `extract` ('' when none; use (?:..) for inner groups).
    Mirrors DuckDB's len(regexp_extract_all(..)) /
    regexp_extract(.., 0) bit-for-bit."""
    id_columns = list(id_columns or ["doc_id"])
    return ds.map_batches(
        _regex_count_batch,
        batch_format="pyarrow",
        fn_kwargs={"pattern": pattern, "extract": extract,
                   "text_column": text_column, "id_columns": id_columns},
    )

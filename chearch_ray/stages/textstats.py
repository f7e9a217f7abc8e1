"""Text-analysis stages for training-data pipelines: token metrics,
quality scoring, language-ID heuristic, document fingerprinting.

All per-batch and vectorized (Arrow/numpy); the callables are classes
so compiled state (stopword tables, hash caches) loads once per actor.
These operate on the driver `documents` shape (doc_id, text, ...) or
any table with a text column.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from chearch_ray.functions.tokenizer import explode, token_counts, tokenize

#: tiny embedded stopword lists for the language-ID heuristic (n-gram /
#: stopword-hit scoring; no external models in this container).
_STOPWORDS = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "it", "for", "on", "with", "as", "this"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "los", "del", "se", "por", "con"},
    "fr": {"le", "la", "de", "et", "les", "des", "un", "une", "du", "est", "pour", "dans", "que"},
    "de": {"der", "die", "das", "und", "ist", "von", "mit", "den", "des", "ein", "eine", "für"},
}
_CODE_TOKENS = {
    "def", "return", "import", "class", "func", "var", "let", "const", "fn", "pub",
    "struct", "impl", "void", "int", "self", "if", "else", "for", "while", "null",
}

#: English stopword list used by the SQL-checkable stopword counter —
#: keep literally in sync with oracle_sql in __ray_entry__.py.
SQL_STOPWORDS = ("the", "and", "of", "a", "to", "in", "is", "for", "on", "with")

FNV_OFFSET = np.uint64(0xCBF29CE484222325)
FNV_PRIME = np.uint64(0x100000001B3)


def _token_hashes(values: pa.Array) -> np.ndarray:
    """uint64 hash per token, computed once per *unique* token via
    dictionary encode + vectorized FNV-1a over the small dictionary."""
    d = values.dictionary_encode()
    uniq = d.dictionary.to_pylist()
    lut = np.empty(len(uniq), dtype=np.uint64)
    for i, tok in enumerate(uniq):
        h = FNV_OFFSET
        for byte in tok.encode():
            h = np.uint64((int(h) ^ byte) * int(FNV_PRIME) & 0xFFFFFFFFFFFFFFFF)
        lut[i] = h
    if len(uniq) == 0:
        return np.empty(0, dtype=np.uint64)
    return lut[np.asarray(d.indices)]


class TokenStats:
    """doc_id/text -> (doc_id, n_tokens, n_distinct, n_stopwords).

    n_stopwords counts SQL_STOPWORDS hits so the driver oracle can
    replicate with a CASE WHEN ... IN (...) aggregate."""

    def __init__(self, text_column: str = "text"):
        self.text_column = text_column
        self.stopwords = set(SQL_STOPWORDS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        lists = tokenize(batch[self.text_column])
        n_tokens = token_counts(lists)
        values, rows, _ = explode(lists)
        n = len(batch)
        # distinct per doc: arrow hash group over (row, term)
        pairs = pa.table({"row": pa.array(rows), "term": values})
        per_term = pairs.group_by(["row", "term"], use_threads=False).aggregate([("term", "count")])
        g_rows = per_term["row"].to_numpy()
        n_distinct = np.zeros(n, dtype=np.int64)
        np.add.at(n_distinct, g_rows, 1)
        stop_mask = pc.is_in(values, value_set=pa.array(sorted(self.stopwords)))
        n_stop = np.zeros(n, dtype=np.int64)
        np.add.at(n_stop, rows, np.asarray(stop_mask).astype(np.int64))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(n_tokens, type=pa.int64()),
                "n_distinct": pa.array(n_distinct, type=pa.int64()),
                "n_stopwords": pa.array(n_stop, type=pa.int64()),
            }
        )


class QualityScore:
    """doc_id/text -> heuristic quality features + a composite score in
    [0, 1]: length band, type-token ratio, alpha ratio, mean token
    length band.  (Training-data quality filtering baseline; thresholds
    are config, not learned.)"""

    def __init__(self, text_column: str = "text"):
        self.text_column = text_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch[self.text_column]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n_chars = np.asarray(pc.utf8_length(text)).astype(np.float64)
        lists = tokenize(text)
        n_tokens = token_counts(lists).astype(np.float64)
        values, rows, _ = explode(lists)
        tok_len = np.asarray(pc.utf8_length(values)).astype(np.float64)
        sum_tok_len = np.zeros(len(batch))
        np.add.at(sum_tok_len, rows, tok_len)
        with np.errstate(divide="ignore", invalid="ignore"):
            mean_tok_len = np.where(n_tokens > 0, sum_tok_len / n_tokens, 0.0)
            alpha_ratio = np.where(n_chars > 0, sum_tok_len / n_chars, 0.0)
        # distinct per doc for TTR
        pairs = pa.table({"row": pa.array(rows), "term": values})
        per_term = pairs.group_by(["row", "term"], use_threads=False).aggregate([("term", "count")])
        n_distinct = np.zeros(len(batch))
        np.add.at(n_distinct, per_term["row"].to_numpy(), 1.0)
        with np.errstate(divide="ignore", invalid="ignore"):
            ttr = np.where(n_tokens > 0, n_distinct / n_tokens, 0.0)
        len_band = np.clip(n_tokens / 64.0, 0.0, 1.0)
        tok_band = np.clip(mean_tok_len / 6.0, 0.0, 1.0)
        score = 0.25 * len_band + 0.25 * ttr + 0.25 * alpha_ratio + 0.25 * tok_band
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(n_tokens.astype(np.int64), type=pa.int64()),
                "ttr": pa.array(ttr, type=pa.float64()),
                "alpha_ratio": pa.array(alpha_ratio, type=pa.float64()),
                "mean_token_len": pa.array(mean_tok_len, type=pa.float64()),
                "quality": pa.array(score, type=pa.float64()),
            }
        )


class LangId:
    """doc_id/text -> (doc_id, lang_pred, lang_score): stopword-hit
    heuristic over {en, es, fr, de} plus a `code` class when
    code-keyword density dominates.  No external model (rows-only
    correctness check; not SQL-expressible)."""

    def __init__(self, text_column: str = "text"):
        self.text_column = text_column
        self.tables = {lang: pa.array(sorted(ws)) for lang, ws in _STOPWORDS.items()}
        self.code_table = pa.array(sorted(_CODE_TOKENS))

    def __call__(self, batch: pa.Table) -> pa.Table:
        lists = tokenize(batch[self.text_column])
        values, rows, _ = explode(lists)
        n = len(batch)
        n_tokens = np.maximum(token_counts(lists).astype(np.float64), 1.0)
        scores = {}
        for lang, table in list(self.tables.items()) + [("code", self.code_table)]:
            hits = np.zeros(n)
            np.add.at(hits, rows, np.asarray(pc.is_in(values, value_set=table)).astype(np.float64))
            scores[lang] = hits / n_tokens
        langs = list(scores)
        mat = np.stack([scores[lang] for lang in langs], axis=1)
        best = np.argmax(mat, axis=1)
        best_score = mat[np.arange(n), best]
        pred = np.where(best_score > 0.0, np.array(langs, dtype=object)[best], "unknown")
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang_pred": pa.array(pred.tolist(), type=pa.string()),
                "lang_score": pa.array(best_score, type=pa.float64()),
            }
        )


class Fingerprint:
    """doc_id/text -> (doc_id, fingerprint:uint64): min rolling-hash
    over token-trigram windows (Rabin-Karp over FNV token hashes) —
    a winnowing-style document fingerprint for shingle-level identity."""

    WINDOW = 3
    P = np.uint64(1099511628211)

    def __init__(self, text_column: str = "text"):
        self.text_column = text_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        lists = tokenize(batch[self.text_column])
        values, rows, _ = explode(lists)
        h = _token_hashes(values)
        n = len(batch)
        out = np.zeros(n, dtype=np.uint64)
        if len(h) >= self.WINDOW:
            p, w = self.P, self.WINDOW
            win = h[: len(h) - w + 1] * p * p + h[1 : len(h) - w + 2] * p + h[2 : len(h) - w + 3]
            # window valid only when fully inside one doc
            same_doc = rows[: len(h) - w + 1] == rows[w - 1 :]
            valid = np.flatnonzero(same_doc)
            if len(valid):
                vrows = rows[valid]
                vals = win[valid]
                order = np.argsort(vrows, kind="stable")
                vrows, vals = vrows[order], vals[order]
                starts = np.flatnonzero(np.diff(vrows, prepend=-1))
                mins = np.minimum.reduceat(vals, starts)
                out[vrows[starts]] = mins
        # short docs (< WINDOW tokens): fingerprint = xor of token hashes
        lengths = token_counts(lists)
        short = np.flatnonzero((lengths > 0) & (lengths < self.WINDOW))
        for i in short.tolist():
            mask = rows == i
            out[i] = np.bitwise_xor.reduce(h[mask])
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "fingerprint": pa.array(out, type=pa.uint64()),
            }
        )


# ------------------------------------------------------- doc chunking
def chunk_documents(batch: pa.Table, chunk_tokens: int = 64, overlap: int = 16,
                    text_column: str = "text") -> pa.Table:
    """map_batches stage: split each document into fixed-token-count
    chunks with `overlap` tokens of context between consecutive chunks
    (stride = chunk_tokens - overlap) — the RAG/embedding prep
    operator a training-data pipeline runs over every document.

    -> one row per chunk: (doc_id, chunk_id, start_tok, n_tokens,
    chunk_text).  chunk_text re-joins the tokenizer's tokens with
    single spaces, so the DuckDB mirror is
    array_to_string(ts[start+1 : start+chunk_tokens], ' ').
    Fully vectorized: one take over the flattened token array builds
    every (overlapping) chunk, pc.binary_join_element_wise-free via
    pc.binary_join on a chunk-offset list array."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    lists = tokenize(batch[text_column])
    values, _, _ = explode(lists)
    n_tok = token_counts(lists).astype(np.int64)
    doc_off = np.concatenate([[0], np.cumsum(n_tok)])
    n_chunks = np.where(n_tok > 0, (n_tok + stride - 1) // stride, 0)
    total = int(n_chunks.sum())
    doc_col = batch["doc_id"]
    if isinstance(doc_col, pa.ChunkedArray):
        doc_col = doc_col.combine_chunks()
    if total == 0:
        return pa.table(
            {
                "doc_id": pa.array([], type=doc_col.type),
                "chunk_id": pa.array([], type=pa.int64()),
                "start_tok": pa.array([], type=pa.int64()),
                "n_tokens": pa.array([], type=pa.int64()),
                "chunk_text": pa.array([], type=pa.string()),
            }
        )
    chunk_doc = np.repeat(np.arange(len(batch), dtype=np.int64), n_chunks)
    # chunk ordinal within its doc
    first_chunk_of_doc = np.concatenate([[0], np.cumsum(n_chunks)])[:-1]
    chunk_id = np.arange(total, dtype=np.int64) - first_chunk_of_doc[chunk_doc]
    start = chunk_id * stride
    length = np.minimum(chunk_tokens, n_tok[chunk_doc] - start)
    # token indices of every chunk, concatenated (overlaps repeat)
    tok_off = np.concatenate([[0], np.cumsum(length)])
    idx = (
        np.arange(int(tok_off[-1]), dtype=np.int64)
        - np.repeat(tok_off[:-1], length)
        + np.repeat(doc_off[chunk_doc] + start, length)
    )
    taken = values.take(pa.array(idx, type=pa.int64()))
    chunks = pa.ListArray.from_arrays(pa.array(tok_off, type=pa.int64()).cast(pa.int32()), taken)
    text = pc.binary_join(chunks, " ")
    return pa.table(
        {
            "doc_id": doc_col.take(pa.array(chunk_doc, type=pa.int64())),
            "chunk_id": pa.array(chunk_id, type=pa.int64()),
            "start_tok": pa.array(start, type=pa.int64()),
            "n_tokens": pa.array(length, type=pa.int64()),
            "chunk_text": text,
        }
    )


# ------------------------------------------------- deterministic sample
def deterministic_sample(batch: pa.Table, rate: float,
                         text_column: str = "text") -> pa.Table:
    """Reproducible corpus subsampling: keep a row iff the first 8 hex
    chars of sha256(text) are lexicographically below the rate
    threshold — selection depends only on content, never on
    partitioning, ordering or process, so reruns and the DuckDB oracle
    (substr(sha256(text),1,8) < 'threshold') agree exactly.  For
    fixed-width lowercase hex, string order == numeric order."""
    from chearch_ray.functions.hashing import sha256_hex

    thr = sample_threshold_hex(rate)
    sha = sha256_hex(batch[text_column])
    prefix = pc.utf8_slice_codeunits(sha, 0, 8)
    return batch.filter(pc.less(prefix, thr))


def sample_threshold_hex(rate: float) -> str:
    """rate in [0, 1] -> 8-hex-digit threshold string (floor(rate *
    2^32), clamped)."""
    v = int(max(0.0, min(1.0, rate)) * (1 << 32))
    return f"{min(v, (1 << 32) - 1):08x}" if rate < 1.0 else "g"  # 'g' > any hex


# ------------------------------------------- repetition quality filter
class RepetitionStats:
    """Gopher-style repetition metrics per document, all INTEGER so a
    SQL oracle matches bit-for-bit (no float fraction is ever stored;
    thresholds compare cross-multiplied integers):

    * n_lines / n_dup_lines / dup_line_chars — newline-split lines;
      a "dup line" is any occurrence of a line value appearing more
      than once IN THE SAME DOC (all occurrences count, as in
      Gopher's duplicate-line-fraction).
    * n_tokens / top_tf — total tokens and the most frequent token's
      count (Gopher's top-word-frequency rule).
    * n_hash / n_ellipsis — '#' and '...' occurrence counts (RE2
      non-overlapping, identical semantics in Arrow and DuckDB).
    * keep — the filter verdict:
        10 * n_dup_lines <= 3 * n_lines          (dup-line frac <= 0.3)
        AND 5 * dup_line_chars <= n_chars        (dup-char frac <= 0.2)
        AND (n_tokens < 8 OR 4 * top_tf <= n_tokens)  (top word <= 25%)

    Vectorized: one newline split + one tokenize per batch; per-line
    and per-term counts via Arrow hash group-bys; no Python loop over
    rows."""

    def __init__(self, text_column: str = "text"):
        self.text_column = text_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch[self.text_column]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n = len(batch)
        n_chars = np.asarray(pc.utf8_length(text)).astype(np.int64)

        # ------- line metrics
        line_lists = pc.split_pattern(text, pattern="\n")
        lines, lrows, _ = explode(line_lists)
        n_lines = np.zeros(n, dtype=np.int64)
        np.add.at(n_lines, lrows, 1)
        ltbl = pa.table(
            {
                "row": pa.array(lrows),
                "line": lines,
                "len": pc.utf8_length(lines).cast(pa.int64()),
            }
        )
        lagg = ltbl.group_by(["row", "line"], use_threads=False).aggregate(
            [("line", "count"), ("len", "min")]
        )
        c = lagg["line_count"].to_numpy().astype(np.int64)
        llen = lagg["len_min"].to_numpy().astype(np.int64)
        arows = lagg["row"].to_numpy()
        dup = c > 1
        n_dup_lines = np.zeros(n, dtype=np.int64)
        np.add.at(n_dup_lines, arows[dup], c[dup])
        dup_line_chars = np.zeros(n, dtype=np.int64)
        np.add.at(dup_line_chars, arows[dup], (c * llen)[dup])

        # ------- token metrics
        tok_lists = tokenize(text)
        n_tokens = token_counts(tok_lists).astype(np.int64)
        values, trows, _ = explode(tok_lists)
        ttbl = pa.table({"row": pa.array(trows), "term": values})
        tagg = ttbl.group_by(["row", "term"], use_threads=False).aggregate([("term", "count")])
        top_tf = np.zeros(n, dtype=np.int64)
        np.maximum.at(top_tf, tagg["row"].to_numpy(), tagg["term_count"].to_numpy().astype(np.int64))

        # ------- symbol counts (RE2 both here and in DuckDB)
        n_hash = np.asarray(pc.count_substring_regex(text, "#")).astype(np.int64)
        n_ellipsis = np.asarray(pc.count_substring_regex(text, r"\.\.\.")).astype(np.int64)

        keep = (
            (10 * n_dup_lines <= 3 * n_lines)
            & (5 * dup_line_chars <= n_chars)
            & ((n_tokens < 8) | (4 * top_tf <= n_tokens))
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_chars": pa.array(n_chars, type=pa.int64()),
                "n_lines": pa.array(n_lines, type=pa.int64()),
                "n_dup_lines": pa.array(n_dup_lines, type=pa.int64()),
                "dup_line_chars": pa.array(dup_line_chars, type=pa.int64()),
                "n_tokens": pa.array(n_tokens, type=pa.int64()),
                "top_tf": pa.array(top_tf, type=pa.int64()),
                "n_hash": pa.array(n_hash, type=pa.int64()),
                "n_ellipsis": pa.array(n_ellipsis, type=pa.int64()),
                "keep": pa.array(keep),
            }
        )


# -------------------------------------------------- n-gram LM counts
def bigram_partial(batch: pa.Table, text_column: str = "text") -> pa.Table:
    """batch -> per-batch (ta, tb, n) adjacent-bigram partial counts:
    the map-side combiner that keeps the shuffle at bigram-vocabulary
    rows per block, not token rows."""
    values, rows, _ = explode(tokenize(batch[text_column]))
    if len(values) < 2:
        return pa.table({"ta": pa.array([], type=pa.string()),
                         "tb": pa.array([], type=pa.string()),
                         "n": pa.array([], type=pa.int64())})
    same = rows[1:] == rows[:-1]
    idx = np.flatnonzero(same)
    t = pa.table(
        {
            "ta": values.take(pa.array(idx, type=pa.int64())),
            "tb": values.take(pa.array(idx + 1, type=pa.int64())),
            "n": pa.array(np.ones(len(idx), dtype=np.int64)),
        }
    )
    agg = t.group_by(["ta", "tb"], use_threads=False).aggregate([("n", "sum")])
    return pa.table({"ta": agg["ta"], "tb": agg["tb"], "n": agg["n_sum"]})


def top_bigrams(ds, k: int = 20, text_column: str = "text") -> pa.Table:
    """corpus -> top-k adjacent bigrams (count desc, ta asc, tb asc).
    Map-side partials -> one bigram groupby -> per-block top-k partials
    -> tiny driver merge (blocks x k rows, never the bigram table)."""
    from functools import partial

    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(partial(bigram_partial, text_column=text_column),
                       batch_format="pyarrow")
        .groupby(["ta", "tb"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def block_topk(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(t, sort_keys=[("n", "descending"), ("ta", "ascending"),
                                              ("tb", "ascending")])
        return t.take(order.slice(0, k))

    parts = [
        t for t in agg.map_batches(block_topk, batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow") if len(t)
    ]
    if not parts:
        return pa.table({"ta": pa.array([], type=pa.string()),
                         "tb": pa.array([], type=pa.string()),
                         "n": pa.array([], type=pa.int64())})
    merged = pa.concat_tables(parts).combine_chunks()
    order = pc.sort_indices(merged, sort_keys=[("n", "descending"), ("ta", "ascending"),
                                               ("tb", "ascending")])
    out = merged.take(order.slice(0, k))
    return pa.table({"ta": out["ta"], "tb": out["tb"], "n": out["n"].cast(pa.int64())})


# ------------------------------------------------------ PII scrubbing
#: RE2 patterns (no lookaround — Arrow and DuckDB both run RE2, so
#: counts and replacements match bit-for-bit).  Order matters: emails
#: scrub FIRST so digit runs inside them don't also count as numbers.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("number", r"[0-9]{6,}", "<NUM>"),
)


class PiiScrub:
    """doc_id/text -> (doc_id, n_email, n_number, scrubbed): redact
    email addresses and long digit runs, counting each as it is
    removed (sequential passes, so a digit run inside an email is
    counted once, as an email).  One vectorized RE2 count + replace
    per pattern per batch."""

    def __init__(self, text_column: str = "text"):
        self.text_column = text_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch[self.text_column]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        cols = {"doc_id": batch["doc_id"]}
        for name, pattern, repl in PII_PATTERNS:
            cols[f"n_{name}"] = pc.count_substring_regex(text, pattern).cast(pa.int64())
            text = pc.replace_substring_regex(text, pattern, repl)
        cols["scrubbed"] = text
        return pa.table(cols)


# --------------------------------------------------- frequent terms
#: sentinel term carrying per-block totals.  The empty string can
#: NEVER be a corpus token (tokenize() strips empties), unlike any
#: underscore/alnum word — '__n__' was a legal token under the
#: [^a-z0-9_]+ splitter and, if block-frequent, corrupted `total` and
#: could never itself be reported (ADVICE r3).
_HH_TOTAL_SENTINEL = ""


def _hh_partial(batch: pa.Table, text_column: str, denom: int) -> pa.Table:
    """bounded-state heavy-hitter candidates for one block: terms with
    block frequency >= n_b/denom (at most `denom` of them exist), plus
    one sentinel row ('', n_b) carrying the block's occurrence count.
    Pigeonhole guarantee: a term with GLOBAL frequency >= N/denom has
    block frequency >= n_b/denom in at least one block, so the union
    of block candidates is a provable superset of the answer."""
    values, _, _ = explode(tokenize(batch[text_column]))
    n_b = len(values)
    if n_b == 0:
        return pa.table({"term": pa.array([_HH_TOTAL_SENTINEL]),
                         "n": pa.array([0], type=pa.int64())})
    vc = values.value_counts()
    terms = vc.field("values")
    counts = vc.field("counts").to_numpy().astype(np.int64)
    keep = counts * denom >= n_b
    return pa.table(
        {
            "term": pa.concat_arrays([terms.filter(pa.array(keep)).cast(pa.string()),
                                      pa.array([_HH_TOTAL_SENTINEL])]),
            "n": pa.array(np.append(counts[keep], n_b), type=pa.int64()),
        }
    )


def _hh_count(batch: pa.Table, text_column: str, cand_ref) -> pa.Table:
    """exact occurrence counts of the candidate terms in this block
    (one vectorized membership filter + value_counts)."""
    import ray

    cand = ray.get(cand_ref) if not isinstance(cand_ref, pa.Array) else cand_ref
    values, _, _ = explode(tokenize(batch[text_column]))
    hit = pc.is_in(values, value_set=cand)
    vals = values.filter(hit)
    if len(vals) == 0:
        return pa.table({"term": pa.array([], type=pa.string()),
                         "n": pa.array([], type=pa.int64())})
    vc = vals.value_counts()
    return pa.table({"term": vc.field("values"),
                     "n": vc.field("counts").cast(pa.int64())})


def frequent_terms(ds, text_column: str = "text", denom: int = 200,
                   driver_merge_limit: int | None = None) -> pa.Table:
    """EXACT heavy hitters: every term whose occurrence count is
    >= N/denom (integer cross-multiplied: count * denom >= N), as
    (term, n) sorted by (n desc, term asc).

    Two passes, both with BOUNDED state — the point at 100 TB, where
    an exact term groupby would shuffle the whole vocabulary:
    1. candidate generation: each block emits at most `denom`
       local heavy hitters (+ its occurrence count) — a provable
       superset of the global answer by pigeonhole;
    2. exact verify: candidate terms broadcast once (`ray.put`), each
       block emits exact counts for candidates only (<= |candidates|
       rows per block).
    No full-vocabulary groupby ever happens.  Below the gate
    (blocks x rows-per-block <= driver_merge_limit, default
    pack.DRIVER_MERGE_LIMIT) partials merge driver-side; above it each
    pass merges through a Ray groupby("term").aggregate(Sum) first, so
    driver state is O(|distinct candidates|), never O(blocks)."""
    import ray
    from ray.data.aggregate import Sum

    from chearch_ray.stages.pack import DRIVER_MERGE_LIMIT

    if driver_merge_limit is None:
        driver_merge_limit = DRIVER_MERGE_LIMIT
    # materialized: bounded at <= denom+1 rows per block (object-store
    # resident, never driver-side), and num_blocks needs it
    partials = ds.map_batches(
        partial(_hh_partial, text_column=text_column, denom=denom),
        batch_format="pyarrow",
    ).materialize()
    n_blocks = partials.num_blocks()
    if n_blocks * (denom + 1) > driver_merge_limit:
        # scale path: collapse blocks x candidates rows to one row per
        # distinct candidate before they reach the driver
        partials = partials.groupby("term").aggregate(Sum("n", alias_name="n"))
    total = 0
    cands: set[str] = set()
    for t in partials.iter_batches(batch_size=None, batch_format="pyarrow"):
        for term, n in zip(t["term"].to_pylist(), t["n"].to_pylist()):
            if term == _HH_TOTAL_SENTINEL:
                total += int(n)
            else:
                cands.add(term)
    if not cands or total == 0:
        return pa.table({"term": pa.array([], type=pa.string()),
                         "n": pa.array([], type=pa.int64())})
    cand_ref = ray.put(pa.array(sorted(cands), type=pa.string()))
    exact = ds.map_batches(
        partial(_hh_count, text_column=text_column, cand_ref=cand_ref),
        batch_format="pyarrow",
    )
    if n_blocks * len(cands) > driver_merge_limit:
        exact = exact.groupby("term").aggregate(Sum("n", alias_name="n"))
    counts: dict[str, int] = {}
    for t in exact.iter_batches(batch_size=None, batch_format="pyarrow"):
        for term, n in zip(t["term"].to_pylist(), t["n"].to_pylist()):
            counts[term] = counts.get(term, 0) + int(n)
    out = [(t, n) for t, n in counts.items() if n * denom >= total]
    out.sort(key=lambda x: (-x[1], x[0]))
    return pa.table({"term": pa.array([t for t, _ in out], type=pa.string()),
                     "n": pa.array([n for _, n in out], type=pa.int64())})


# ------------------------------------------------- text normalization
#: normalization passes (order matters; all RE2 — Arrow and DuckDB
#: both run RE2, so the composition is bit-identical in SQL):
#: 1. unify line endings / tabs to spaces
#: 2. collapse space runs
#: 3. trim
NORMALIZE_STEPS = (
    (r"[\t\r\n\f\v]", " "),
    (r" {2,}", " "),
    (r"^ +| +$", ""),
)


def normalize_text(batch: pa.Table, text_column: str = "text",
                   lowercase: bool = True) -> pa.Table:
    """doc_id/text -> (doc_id, norm): canonical whitespace + case
    normalization — the first pass of every dedup/quality pipeline
    (exact dedup over raw bytes misses trivially-reformatted copies).
    One vectorized RE2 replace per step; stateless map stage."""
    text = batch[text_column]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    if lowercase:
        text = pc.utf8_lower(text)
    for pattern, repl in NORMALIZE_STEPS:
        text = pc.replace_substring_regex(text, pattern, repl)
    return pa.table({"doc_id": batch["doc_id"], "norm": text})


# ---------------------------------------------------- PMI collocations
def _pmi_unigram_counts(batch: pa.Table, text_column: str, cand_ref) -> pa.Table:
    """per-block (exact candidate-unigram counts) + a sentinel row
    ('', n_tokens, n_bigrams) carrying the block totals the PMI
    normalizers need — one pass, bounded output."""
    import ray

    cand = ray.get(cand_ref) if not isinstance(cand_ref, pa.Array) else cand_ref
    values, rows, _ = explode(tokenize(batch[text_column]))
    n_tok = len(values)
    n_bg = int((rows[1:] == rows[:-1]).sum()) if n_tok > 1 else 0
    hit = pc.is_in(values, value_set=cand)
    vals = values.filter(hit)
    if len(vals):
        vc = vals.value_counts()
        terms = pa.concat_arrays([vc.field("values"), pa.array([""])])
        n = np.append(vc.field("counts").to_numpy().astype(np.int64), n_tok)
    else:
        terms = pa.array([""], type=pa.string())
        n = np.array([n_tok], dtype=np.int64)
    nb = np.zeros(len(terms), dtype=np.int64)
    nb[-1] = n_bg
    return pa.table({"term": terms, "n": pa.array(n, type=pa.int64()),
                     "nb": pa.array(nb, type=pa.int64())})


def pmi_bigrams(ds, k: int = 20, min_count: int = 5,
                text_column: str = "text") -> pa.Table:
    """Top-k collocations by pointwise mutual information:
    pmi(a,b) = ln( P(ab) / (P(a) P(b)) ) with P(ab) = n_ab / N_bigrams
    and P(x) = n_x / N_tokens, over bigrams with n_ab >= min_count.

    Distribution: bigram counts ride the usual map-combined
    bigram-vocabulary groupby (same exchange as top_bigrams);
    `min_count` then shrinks the candidate set, the candidates'
    unigrams broadcast ONCE, and one more map pass returns exact
    unigram counts + block totals — the unigram VOCABULARY never
    shuffles.  Ranking uses the raw likelihood ratio
    r = n_ab / (n_a * n_b) (doubles; products and divisions are
    IEEE-correctly-rounded so the sort key is engine-reproducible,
    unlike ln whose last ulp differs between numpy and SQL); the
    reported pmi is math.log (= libm = DuckDB ln, bit-identical) of
    an argument built with the SAME operation order as the SQL
    mirror.  Returns (ta, tb, n_ab, n_a, n_b, pmi) sorted by
    (r desc, ta, tb)."""
    import math
    from functools import partial

    import ray
    from ray.data.aggregate import Sum

    empty = pa.table({"ta": pa.array([], type=pa.string()),
                      "tb": pa.array([], type=pa.string()),
                      "n_ab": pa.array([], type=pa.int64()),
                      "n_a": pa.array([], type=pa.int64()),
                      "n_b": pa.array([], type=pa.int64()),
                      "pmi": pa.array([], type=pa.float64())})
    bg = (
        ds.map_batches(partial(bigram_partial, text_column=text_column),
                       batch_format="pyarrow")
        .groupby(["ta", "tb"])
        .aggregate(Sum("n", alias_name="n"))
    )
    cand_parts = [
        t.filter(pa.array(t["n"].to_numpy() >= min_count))
        for t in bg.iter_batches(batch_size=None, batch_format="pyarrow")
    ]
    cand = pa.concat_tables([t for t in cand_parts if len(t)]) if any(
        len(t) for t in cand_parts) else None
    if cand is None:
        return empty
    cand = cand.combine_chunks()
    uni_terms = pa.concat_arrays(
        [cand["ta"].combine_chunks() if isinstance(cand["ta"], pa.ChunkedArray) else cand["ta"],
         cand["tb"].combine_chunks() if isinstance(cand["tb"], pa.ChunkedArray) else cand["tb"]]
    ).unique()
    cand_ref = ray.put(uni_terms)
    counts: dict[str, int] = {}
    total_tok = 0
    total_bg = 0
    uni = ds.map_batches(
        partial(_pmi_unigram_counts, text_column=text_column, cand_ref=cand_ref),
        batch_format="pyarrow",
    )
    for t in uni.iter_batches(batch_size=None, batch_format="pyarrow"):
        for term, n, nb in zip(t["term"].to_pylist(), t["n"].to_pylist(),
                               t["nb"].to_pylist()):
            if term == "":
                total_tok += int(n)
                total_bg += int(nb)
            else:
                counts[term] = counts.get(term, 0) + int(n)
    if total_bg == 0:
        return empty
    ta = cand["ta"].to_pylist()
    tb = cand["tb"].to_pylist()
    n_ab = cand["n"].to_numpy().astype(np.int64)
    n_a = np.array([counts[x] for x in ta], dtype=np.int64)
    n_b = np.array([counts[x] for x in tb], dtype=np.int64)
    # engine-reproducible sort key (see docstring)
    r = n_ab.astype(np.float64) / (n_a.astype(np.float64) * n_b.astype(np.float64))
    order = sorted(range(len(ta)), key=lambda i: (-r[i], ta[i], tb[i]))[:k]
    pmi = [
        math.log((n_ab[i] / total_bg) / ((n_a[i] / total_tok) * (n_b[i] / total_tok)))
        for i in order
    ]
    return pa.table({
        "ta": pa.array([ta[i] for i in order], type=pa.string()),
        "tb": pa.array([tb[i] for i in order], type=pa.string()),
        "n_ab": pa.array(n_ab[order], type=pa.int64()),
        "n_a": pa.array(n_a[order], type=pa.int64()),
        "n_b": pa.array(n_b[order], type=pa.int64()),
        "pmi": pa.array(pmi, type=pa.float64()),
    })


# ------------------------------------------- unigram LM scoring
#: top-K vocabulary kept by the corpus LM (OOV smoothing below)
LM_VOCAB_K = 4096
#: pseudo-count for out-of-vocabulary tokens
LM_OOV_COUNT = 0.5


def _lm_count_partial(batch: pa.Table, text_column: str) -> pa.Table:
    values, _, _ = explode(tokenize(batch[text_column]))
    if len(values) == 0:
        return pa.table({"term": pa.array([], type=pa.string()),
                         "n": pa.array([], type=pa.int64())})
    vc = values.value_counts()
    return pa.table({"term": vc.field("values"),
                     "n": vc.field("counts").cast(pa.int64())})


def _lm_score_batch(batch: pa.Table, text_column: str, id_column: str,
                    model_ref) -> pa.Table:
    """(doc rows) -> (doc_id, n_tokens, logp_sum_micro): per-token
    integer micro-nat log-probs gathered from the broadcast model,
    summed per doc (integer sums are order-free, so the result is
    partition- and engine-invariant)."""
    import ray

    vocab, lp, oov = ray.get(model_ref) if not isinstance(model_ref, tuple) else model_ref
    values, rows, _ = explode(tokenize(batch[text_column]))
    if len(values) == 0:
        return pa.table({id_column: batch[id_column].slice(0, 0),
                         "n_tokens": pa.array([], type=pa.int64()),
                         "logp_sum_micro": pa.array([], type=pa.int64())})
    idx = pc.index_in(values, value_set=vocab)
    idx_np = idx.to_numpy(zero_copy_only=False)
    hit = idx_np == idx_np  # NaN-safe: index_in yields null on miss
    idx_filled = np.where(hit, idx_np, 0).astype(np.int64)
    tok_lp = np.where(hit, lp[idx_filled], oov)
    n_tok = np.zeros(len(batch), dtype=np.int64)
    np.add.at(n_tok, rows, 1)
    sums = np.zeros(len(batch), dtype=np.int64)
    np.add.at(sums, rows, tok_lp)
    keep = n_tok > 0
    ids = batch[id_column]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    return pa.table({
        id_column: ids.filter(pa.array(keep)),
        "n_tokens": pa.array(n_tok[keep], type=pa.int64()),
        "logp_sum_micro": pa.array(sums[keep], type=pa.int64()),
    })


def lm_score(ds, text_column: str = "text", id_column: str = "doc_id",
             vocab_k: int = LM_VOCAB_K):
    """Perplexity-proxy scoring (the CCNet / Gopher language-model
    filter shape, with the corpus itself as the LM): train a top-K
    unigram model over the corpus, then score every document by its
    total token log-probability.

    Two passes: (1) unigram counts via map-side value_counts partials
    + one term groupby, top-`vocab_k` kept (count desc, term asc —
    deterministic ties); (2) the model broadcasts ONCE (term array +
    integer micro-nat log-probs + OOV smoothing ln(0.5/N)) and each
    batch scores vectorized via pc.index_in + np.add.at.

    Exactness: each token's ln(count/N) is libm log (bit-identical to
    SQL ln) of a correctly-rounded division, rounded half-away to
    integer MICRO-NATS before summing — integer sums are order-free,
    so the result hash-matches SQL whatever the partitioning.
    Returns (id, n_tokens, logp_sum_micro); perplexity-rank callers
    divide client-side."""
    import math
    from functools import partial

    import ray
    from ray.data.aggregate import Sum

    from chearch_ray.stages.events import _round_half_away

    counts = (
        ds.map_batches(partial(_lm_count_partial, text_column=text_column),
                       batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("n", alias_name="n"))
    )
    rows = []
    total = 0
    for t in counts.iter_batches(batch_size=None, batch_format="pyarrow"):
        ns = t["n"].to_numpy()
        total += int(ns.sum())
        rows.extend(zip(t["term"].to_pylist(), ns.tolist()))
    rows.sort(key=lambda x: (-x[1], x[0]))
    top = rows[:vocab_k]
    if total == 0:
        return ds.map_batches(
            lambda b: pa.table({id_column: b[id_column].slice(0, 0),
                                "n_tokens": pa.array([], type=pa.int64()),
                                "logp_sum_micro": pa.array([], type=pa.int64())}),
            batch_format="pyarrow")
    lp = np.array(
        [_round_half_away(np.array([math.log(n / total) * 1_000_000]))[0]
         for _, n in top],
        dtype=np.int64,
    )
    oov = int(_round_half_away(
        np.array([math.log(LM_OOV_COUNT / total) * 1_000_000]))[0])
    vocab = pa.array([t for t, _ in top], type=pa.string())
    model_ref = ray.put((vocab, lp, oov))
    return ds.map_batches(
        partial(_lm_score_batch, text_column=text_column, id_column=id_column,
                model_ref=model_ref),
        batch_format="pyarrow",
    )


# ------------------------------------------------- significant terms
def _sig_partial_term_df(batch: pa.Table, text_column: str,
                         fg_ref=None) -> pa.Table:
    """(doc_id, text) -> partial (term, n) rows: the number of DISTINCT
    docs in this batch containing each term.  Every document lives in
    exactly one batch, so partials sum exactly across batches.  When
    `fg_ref` is given (ray.put sorted uint64 ids — broadcast once,
    resolved from local plasma per task), the batch is first restricted
    to the foreground set via searchsorted membership."""
    if fg_ref is not None:
        import ray

        fg = ray.get(fg_ref) if isinstance(fg_ref, ray.ObjectRef) else np.asarray(fg_ref)
        ids = batch["doc_id"].to_numpy().astype(np.uint64)
        pos = np.minimum(np.searchsorted(fg, ids), len(fg) - 1)
        batch = batch.filter(pa.array(fg[pos] == ids))
    empty = pa.table({"term": pa.array([], type=pa.string()),
                      "n": pa.array([], type=pa.int64())})
    if batch.num_rows == 0:
        return empty
    flat, row_idx, _ = explode(tokenize(batch[text_column]))
    if len(flat) == 0:
        return empty
    pairs = pa.table({"term": flat, "d": pa.array(row_idx)})
    distinct = pairs.group_by(["term", "d"]).aggregate([])
    out = distinct.group_by("term").aggregate([("d", "count")])
    return pa.table({"term": out["term"].cast(pa.string()),
                     "n": out["d_count"].cast(pa.int64())})


def significant_terms(docs_ds, fg_doc_ids, term_stats: pa.Table, bg_n: int,
                      k: int = 20, text_column: str = "text",
                      broadcast_limit: int = 2_000_000) -> pa.Table:
    """Foreground-vs-background significant terms over a query's match
    set (the search-analytics aggregation Elasticsearch ships as
    significant_terms; absent from the reference, whose only
    aggregates are df/N counters — memorysegment.chpl:73,118): for
    each term occurring in the foreground docs,

        fg_df = #foreground docs containing the term
        bg_df = index document frequency (term_stats df)
        score = fg_df*bg_n - bg_df*fg_n

    — the difference of proportions fg_df/fg_n − bg_df/bg_n
    cross-multiplied into EXACT int64 arithmetic (no float-order
    hazard; overflow-safe while bg_n < 2^31, far past the sandbox and
    guarded loudly).  Returns top-k by (score desc, term asc) with
    columns (term, fg_df, bg_df, score).

    Scale shape: the foreground id set broadcasts via ONE ray.put and
    per-task searchsorted membership (the small-side-broadcast join
    pattern); counting is a per-batch distinct-(doc, term) reduction
    followed by ONE vocabulary-scale groupby — the same
    partial-then-shuffle shape as the build's term stats.  The final
    fg_df table and the bg join are vocabulary-bounded, not
    corpus-bounded.  `docs_ds` must be the corpus the index was built
    over (bg_df comes from the index's stats).  Above
    `broadcast_limit` foreground ids, restrict `docs_ds` with
    stages.joins.hash_semi_join first and pass fg_ref=None semantics
    by pre-filtering (kept explicit so the broadcast path stays the
    one-copy fast path)."""
    import ray
    from ray.data.aggregate import Sum

    empty = pa.table({"term": pa.array([], type=pa.string()),
                      "fg_df": pa.array([], type=pa.int64()),
                      "bg_df": pa.array([], type=pa.int64()),
                      "score": pa.array([], type=pa.int64())})
    fg = np.unique(np.asarray(fg_doc_ids).astype(np.uint64))
    fg_n = int(len(fg))
    if fg_n == 0:
        return empty
    if bg_n >= 1 << 31:
        raise ValueError(
            f"significant_terms int64 score overflows at bg_n={bg_n}; "
            "switch to a ratio-mode scorer beyond 2^31 docs"
        )
    if fg_n > broadcast_limit:
        from chearch_ray.stages.joins import hash_semi_join

        fg_ds = ray.data.from_arrow(pa.table({"doc_id": pa.array(fg, type=pa.uint64())}))
        docs_ds = hash_semi_join(docs_ds, fg_ds, on="doc_id")
        fg_ref = None
    else:
        fg_ref = ray.put(fg)
    agg = (
        docs_ds.map_batches(
            partial(_sig_partial_term_df, text_column=text_column, fg_ref=fg_ref),
            batch_format="pyarrow",
        )
        .groupby("term")
        .aggregate(Sum("n", alias_name="fg_df"))
    )
    parts = [t for t in (ray.get(r) for r in agg.to_arrow_refs()) if t.num_rows]
    if not parts:
        return empty
    fgt = pa.concat_tables(parts).combine_chunks()
    bg = pa.table({
        "term": term_stats["term"].cast(pa.string()),
        "bg_df": term_stats["df"].cast(pa.int64()),
    })
    j = fgt.join(bg, keys="term", join_type="inner")
    fg_df = j["fg_df"].to_numpy().astype(np.int64)
    bg_df = j["bg_df"].to_numpy().astype(np.int64)
    score = fg_df * np.int64(bg_n) - bg_df * np.int64(fg_n)
    out = pa.table({
        "term": j["term"].combine_chunks(),
        "fg_df": pa.array(fg_df, type=pa.int64()),
        "bg_df": pa.array(bg_df, type=pa.int64()),
        "score": pa.array(score, type=pa.int64()),
    })
    order = pc.sort_indices(
        out, sort_keys=[("score", "descending"), ("term", "ascending")]
    )
    return out.take(order.slice(0, k))


# ------------------------------------------------------ TF-IDF keywords
def _tfidf_batch(batch: pa.Table, stats_ref, k: int, text_column: str) -> pa.Table:
    """text -> each document's top-k keywords by tf·idf.  `stats_ref`
    is a ray.put (sorted terms, idf) pair — fetched per batch but
    plasma-local after the first get (the repo's standard broadcast
    shape; a stateless fn avoids actor-pool CPU reservations that
    starve upstream reads on small clusters).

    Float contract for the SQL mirror: idf = ln(N_double / df) —
    one int->double promotion, one double division, one libm log —
    and score = tf_double * idf, the operation order DuckDB
    evaluates, so values are bit-identical."""
    import ray

    terms, idf = (ray.get(stats_ref)
                  if not isinstance(stats_ref, tuple) else stats_ref)
    values, rows, _ = explode(tokenize(batch[text_column]))
    doc_col = batch["doc_id"]
    if isinstance(doc_col, pa.ChunkedArray):
        doc_col = doc_col.combine_chunks()
    doc_np = doc_col.to_numpy(zero_copy_only=False).astype(np.int64)
    empty = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "term": pa.array([], type=pa.string()),
            "rank": pa.array([], type=pa.int64()),
            "score": pa.array([], type=pa.float64()),
        }
    )
    if len(values) == 0:
        return empty
    toks = np.asarray(values.to_numpy(zero_copy_only=False))
    # tf per (row, term): one lexsort + run-length on the exploded
    # tokens (vectorized — no Python loop over rows)
    order = np.lexsort((toks, rows))
    r_s, t_s = rows[order], toks[order]
    first = np.empty(len(r_s), dtype=bool)
    first[0] = True
    first[1:] = (r_s[1:] != r_s[:-1]) | (t_s[1:] != t_s[:-1])
    starts = np.flatnonzero(first)
    tf = np.diff(np.append(starts, len(r_s))).astype(np.int64)
    g_rows, g_terms = r_s[starts], t_s[starts]
    pos = np.searchsorted(terms, g_terms)
    pos = np.minimum(pos, max(len(terms) - 1, 0))
    hit = terms[pos] == g_terms if len(terms) else np.zeros(len(pos), bool)
    score = np.where(hit, tf.astype(np.float64) * idf[pos], 0.0)
    keep = hit & (score > 0.0)  # df==N terms (idf 0) carry no signal
    g_rows, g_terms, score = g_rows[keep], g_terms[keep], score[keep]
    if len(g_rows) == 0:
        return empty
    # top-k per row by (score desc, term asc): grouped lexsort +
    # per-run rank cutoff
    order2 = np.lexsort((g_terms, -score, g_rows))
    r2 = g_rows[order2]
    newrow = np.empty(len(r2), dtype=bool)
    newrow[0] = True
    newrow[1:] = r2[1:] != r2[:-1]
    run_start = np.flatnonzero(newrow)
    rank = np.arange(len(r2), dtype=np.int64) - np.repeat(
        run_start, np.diff(np.append(run_start, len(r2)))
    ) + 1
    m = rank <= k
    sel = order2[m]
    sc = score[sel]
    return pa.table(
        {
            "doc_id": pa.array(doc_np[g_rows[sel]], type=pa.int64()),
            "term": pa.array(g_terms[sel], type=pa.string()),
            "rank": pa.array(rank[m], type=pa.int64()),
            "score": pa.array(sc, type=pa.float64()),
        }
    )


def tfidf_keywords(ds, df_table: pa.Table, n_docs: int, k: int = 3,
                   text_column: str = "text"):
    """corpus Dataset + (term, df) stats table -> (doc_id, term, rank,
    score) top-k TF-IDF keywords per document, rank ordered by
    (score desc, term asc).  (df, N) come from the PREBUILT index term
    stats (pipelines.build computes them once; reference TODO
    docs/TODO.txt:5 'TF-IDF') and broadcast ONCE via ray.put —
    vocabulary-scale, the same class as the MinHash verify broadcast;
    per batch everything is one lexsort over the exploded tokens plus
    segmented reductions, no shuffle at all."""
    import ray

    terms_col = df_table["term"]
    if isinstance(terms_col, pa.ChunkedArray):
        terms_col = terms_col.combine_chunks()
    terms = np.asarray(terms_col.to_numpy(zero_copy_only=False))
    dfs = df_table["df"].to_numpy().astype(np.int64)
    order = np.argsort(terms, kind="stable")
    # libm log via math.log, once per DISTINCT df (bounded by the doc
    # count, Zipf-small in practice): numpy's SIMD np.log rounds the
    # last bit differently from the libm log DuckDB's ln() calls, so
    # the bit-identical float contract needs the scalar path
    import math

    uniq_df, inv = np.unique(dfs[order], return_inverse=True)
    ln_tab = np.array([math.log(float(n_docs) / float(d)) for d in uniq_df],
                      dtype=np.float64)
    idf = ln_tab[inv]
    ref = ray.put((terms[order], idf))
    return ds.map_batches(
        partial(_tfidf_batch, stats_ref=ref, k=k, text_column=text_column),
        batch_format="pyarrow",
    )


# ------------------------------------------------------ URL domains
URL_DOMAIN_RE = r"^https?://(?P<d>[a-z0-9.-]+)"


def _domain_partial(batch: pa.Table, text_column: str) -> pa.Table:
    """per-block (domain, n) counts: one vectorized whitespace split,
    one RE2 prefix match, one RE2 capture — no Python loop over rows
    or tokens."""
    col = batch[text_column]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    toks = pc.list_flatten(pc.split_pattern_regex(col, r"\s+"))
    urls = toks.filter(pc.match_substring_regex(toks, r"^https?://"))
    if len(urls) == 0:
        return pa.table({"domain": pa.array([], type=pa.string()),
                         "n": pa.array([], type=pa.int64())})
    dom = pc.struct_field(pc.extract_regex(urls, URL_DOMAIN_RE), "d")
    dom = dom.drop_null()
    if len(dom) == 0:
        return pa.table({"domain": pa.array([], type=pa.string()),
                         "n": pa.array([], type=pa.int64())})
    t = pa.table({"domain": dom,
                  "n": pa.array(np.ones(len(dom), dtype=np.int64))})
    agg = t.group_by("domain", use_threads=False).aggregate([("n", "sum")])
    return agg.rename_columns(["domain", "n"])


def domain_counts(ds, text_column: str = "text",
                  driver_merge_limit: int | None = None) -> pa.Table:
    """URL domain histogram over a text corpus — the per-domain stats a
    pretraining pipeline filters on.  EXACT contract: both sides run
    the SAME RE2 patterns (Arrow kernels here, DuckDB regexp_* in the
    mirror).  Per-block partials are bounded by distinct domains per
    block; the merge is the usual gated driver/groupby pattern."""
    from chearch_ray.pipelines.analytics import _gated_group_sum

    partials = ds.map_batches(
        partial(_domain_partial, text_column=text_column),
        batch_format="pyarrow",
    )
    out = _gated_group_sum(partials, ["domain"], ["n"],
                           driver_merge_limit=driver_merge_limit)
    if out is None or not len(out):
        return pa.table({"domain": pa.array([], type=pa.string()),
                         "n": pa.array([], type=pa.int64())})
    return out.take(pc.sort_indices(
        out, sort_keys=[("n", "descending"), ("domain", "ascending")]))

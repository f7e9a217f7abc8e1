"""Deduplication stages for training-data pipelines.

* exact        — sha256(content) hash-partition groupby, keep min doc_id
* minhash LSH  — shingle -> 128-perm minhash -> banded buckets ->
                 candidate pairs with estimated Jaccard
* simhash      — 64-bit sign-of-sum fingerprint, banded buckets ->
                 pairs within a Hamming radius
* n-gram Jaccard — exact verification of candidate pairs (runs inside
                 the bucket groups, never all-pairs)
* embedding near-dup — cosine >= threshold pairs via hyperplane-LSH
                 buckets (stages/similarity.HyperplaneLSH)

Scale shape: every variant is map_batches (vectorized signatures) ->
groupby on a bucket key (the only shuffle) -> within-group pair
emission.  Bucket group sizes are bounded by the band width choice;
all-pairs work only ever happens inside a bucket.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from chearch_ray.functions.hashing import sha256_hex
from chearch_ray.functions.tokenizer import explode, tokenize
from chearch_ray.stages.textstats import _token_hashes

# ------------------------------------------------------------ exact
def add_content_sha(batch: pa.Table, text_column: str = "text") -> pa.Table:
    return batch.append_column("content_sha", sha256_hex(batch[text_column]))


def keep_first_in_group(group: pa.Table) -> pa.Table:
    """min doc_id wins (deterministic)."""
    if len(group) == 0:
        return group
    i = int(np.argmin(group["doc_id"].to_numpy()))
    return group.slice(i, 1)


def exact_dedup(ds, text_column: str = "text"):
    """Dataset -> Dataset of kept rows (one per distinct content)."""
    from functools import partial

    with_sha = ds.map_batches(
        partial(add_content_sha, text_column=text_column), batch_format="pyarrow"
    )
    return with_sha.groupby("content_sha").map_groups(keep_first_in_group, batch_format="pyarrow")


# ---------------------------------------------------------- shingles
def _doc_shingle_hashes(batch: pa.Table, text_column: str, w: int = 3):
    """-> (shingle hash array uint64, doc row index per shingle)."""
    lists = tokenize(batch[text_column])
    values, rows, _ = explode(lists)
    h = _token_hashes(values)
    if len(h) < w:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
    p = np.uint64(1099511628211)
    win = h[: len(h) - w + 1].copy()
    for j in range(1, w):
        win = win * p + h[j : len(h) - w + 1 + j]
    same = rows[: len(h) - w + 1] == rows[w - 1 :]
    valid = np.flatnonzero(same)
    return win[valid], rows[valid]


class MinHashSignatures:
    """map_batches stage: text -> (doc_id, band, bucket, signature).

    128 permutations via the (a*x+b mod p) universal family, min per
    doc per permutation computed with one reduceat per permutation
    over sorted shingles.  Banded into `bands` buckets of `rows_per_band`
    rows each; one output row per (doc, band)."""

    MERSENNE = np.uint64((1 << 61) - 1)

    def __init__(self, num_perm: int = 128, bands: int = 32, text_column: str = "text",
                 shingle_w: int = 3, seed: int = 42):
        assert num_perm % bands == 0
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, int(self.MERSENNE), size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, int(self.MERSENNE), size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.text_column = text_column
        self.shingle_w = shingle_w

    def _signatures(self, shingles: np.ndarray, rows: np.ndarray, n_docs: int) -> np.ndarray:
        """-> (n_docs, num_perm) uint64 (max value = no shingles)."""
        sig = np.full((n_docs, self.num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
        if len(shingles) == 0:
            return sig
        order = np.argsort(rows, kind="stable")
        rows_s, sh_s = rows[order], shingles[order]
        starts = np.flatnonzero(np.diff(rows_s, prepend=-1))
        doc_of_start = rows_s[starts]
        x = sh_s % self.MERSENNE
        for j in range(self.num_perm):
            # (a*x+b) mod 2^61-1; python-object math avoided via uint64
            # wrap-around then fold (Mersenne trick would need 128-bit;
            # plain wrap is a valid universal-ish permutation here)
            hx = self.a[j] * x + self.b[j]
            sig[doc_of_start, j] = np.minimum.reduceat(hx, starts)
        return sig

    def signatures_table(self, batch: pa.Table) -> pa.Table:
        """text -> one row per doc: (doc_id, signature list<uint64>)."""
        shingles, rows = _doc_shingle_hashes(batch, self.text_column, self.shingle_w)
        sig = self._signatures(shingles, rows, len(batch))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "signature": pa.array(sig.tolist(), type=pa.list_(pa.uint64())),
            }
        )

    def band_rows(self, sig_batch: pa.Table) -> pa.Table:
        """(doc_id, signature) -> LIGHT band rows (band, bucket,
        doc_id) — the shuffle ships ~20 bytes per (doc, band), not the
        whole signature.

        Docs with no shingles (fewer than shingle_w tokens) carry the
        all-max sentinel signature and are EXCLUDED here — otherwise
        every pair of short docs would collide in every band and be
        reported as est_jaccard=1.0 duplicates."""
        col = sig_batch["signature"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        sig = np.asarray(col.values, dtype=np.uint64).reshape(len(sig_batch), self.num_perm)
        doc_ids = sig_batch["doc_id"].to_numpy()
        real = sig[:, 0] != np.iinfo(np.uint64).max
        sig, doc_ids = sig[real], doc_ids[real]
        sig_batch = sig_batch.filter(pa.array(real))
        r = self.rows_per_band
        p = np.uint64(1099511628211)
        out_band = np.repeat(np.arange(self.bands, dtype=np.int32), len(sig_batch))
        buckets = []
        for b in range(self.bands):
            chunk = sig[:, b * r : (b + 1) * r]
            key = chunk[:, 0].copy()
            for j in range(1, r):
                key = key * p + chunk[:, j]
            buckets.append(key)
        return pa.table(
            {
                "band": pa.array(out_band, type=pa.int32()),
                "bucket": pa.array(np.concatenate(buckets), type=pa.uint64()),
                "doc_id": pa.array(np.tile(doc_ids, self.bands)),
            }
        )

    # ------------------------------------------------- packed (binary)
    def signatures_packed(self, batch: pa.Table) -> pa.Table:
        """text -> (doc_id, signature fixed_size_binary(num_perm*8)).

        The packed form is the JOIN-able signature representation
        (Arrow's acero hash join rejects list columns as payload); docs
        with fewer than shingle_w tokens are dropped here (the all-max
        sentinel would make every short-doc pair collide in every
        band)."""
        shingles, rows = _doc_shingle_hashes(batch, self.text_column, self.shingle_w)
        sig = self._signatures(shingles, rows, len(batch))
        real = sig[:, 0] != np.iinfo(np.uint64).max
        sig = np.ascontiguousarray(sig[real])
        doc_col = batch["doc_id"]
        if isinstance(doc_col, pa.ChunkedArray):
            doc_col = doc_col.combine_chunks()
        doc_ids = doc_col.to_numpy(zero_copy_only=False)[real]
        width = self.num_perm * 8
        sig_arr = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(width), len(sig), [None, pa.py_buffer(sig.tobytes())]
        )
        return pa.table(
            {"doc_id": pa.array(doc_ids, type=pa.uint64()), "signature": sig_arr}
        )

    def band_rows_packed(self, sig_batch: pa.Table) -> pa.Table:
        """packed signatures -> LIGHT band rows (band, bucket, doc_id);
        bucket keys identical to band_rows (same hash fold)."""
        sig = unpack_signatures(sig_batch["signature"], self.num_perm)
        doc_ids = sig_batch["doc_id"].to_numpy()
        r = self.rows_per_band
        p = np.uint64(1099511628211)
        out_band = np.repeat(np.arange(self.bands, dtype=np.int32), len(sig_batch))
        buckets = []
        for b in range(self.bands):
            chunk = sig[:, b * r : (b + 1) * r]
            key = chunk[:, 0].copy()
            for j in range(1, r):
                key = key * p + chunk[:, j]
            buckets.append(key)
        return pa.table(
            {
                "band": pa.array(out_band, type=pa.int32()),
                "bucket": pa.array(np.concatenate(buckets), type=pa.uint64()),
                "doc_id": pa.array(np.tile(doc_ids, self.bands)),
            }
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        """text -> band rows + signature per row (single-stage form,
        used by tests; the pipeline uses the lighter two-stage form)."""
        sigs = self.signatures_table(batch)
        sig_col = sigs["signature"]
        if isinstance(sig_col, pa.ChunkedArray):
            sig_col = sig_col.combine_chunks()
        mat = np.asarray(sig_col.values, dtype=np.uint64).reshape(len(sigs), self.num_perm)
        real = mat[:, 0] != np.iinfo(np.uint64).max
        sigs = sigs.filter(pa.array(real))
        sig_col = sig_col.filter(pa.array(real))
        bands = self.band_rows(sigs)
        rep = pa.array(np.tile(np.arange(len(sigs), dtype=np.int64), self.bands))
        return bands.append_column("signature", sig_col.take(rep))


#: default coarse partition count for bucket-run processing: instead
#: of one map_groups call per (band, bucket) — millions of tiny groups,
#: all framework overhead — we group on hash(bucket) % N and process
#: each partition's bucket RUNS vectorized inside one call.  64 suits
#: single-node; size ~2-4x total cores on a real cluster (the public
#: pair functions take coarse_partitions=...).
COARSE_PARTITIONS = 64
#: buckets larger than this are skipped (a degenerate bucket of B docs
#: emits B^2/2 pairs; such buckets mean the content is near-identical
#: boilerplate and would blow up any-pairs work at scale).
MAX_BUCKET_DOCS = 512


def _bucket_runs(group: pa.Table, value_columns: list[str]):
    """Sort one coarse partition by (band, bucket, doc_id), dedupe
    (band, bucket, doc) rows, yield (ids, *values) per multi-doc
    bucket.  Vectorized run detection; Python loop only over the
    multi-doc buckets."""
    import pyarrow.compute as pc

    order = pc.sort_indices(
        group,
        sort_keys=[("band", "ascending"), ("bucket", "ascending"), ("doc_id", "ascending")],
    )
    g = group.take(order)
    band = g["band"].to_numpy().astype(np.int64)
    bucket = g["bucket"].to_numpy().astype(np.uint64)
    docs = g["doc_id"].to_numpy()
    key_change = np.empty(len(g), dtype=bool)
    key_change[0] = True
    key_change[1:] = (band[1:] != band[:-1]) | (bucket[1:] != bucket[:-1])
    dup_doc = np.zeros(len(g), dtype=bool)
    dup_doc[1:] = (~key_change[1:]) & (docs[1:] == docs[:-1])
    keep = np.flatnonzero(~dup_doc)
    band, bucket, docs = band[keep], bucket[keep], docs[keep]
    starts = np.flatnonzero(key_change[keep])
    bounds = np.append(starts, len(keep))
    lengths = np.diff(bounds)
    values = {c: g[c] for c in value_columns}
    for i in np.flatnonzero(lengths >= 2):
        s, e = int(bounds[i]), int(bounds[i + 1])
        if e - s > MAX_BUCKET_DOCS:
            continue  # degenerate boilerplate bucket; see MAX_BUCKET_DOCS
        yield docs[s:e], {c: values[c].take(pa.array(keep[s:e])) for c in value_columns}


def _coarse_partition_column(batch: pa.Table, n_partitions: int = COARSE_PARTITIONS) -> pa.Table:
    bucket = batch["bucket"].to_numpy().astype(np.uint64)
    # mix so adjacent buckets spread across partitions
    mixed = (bucket ^ (bucket >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
    return batch.append_column(
        "pgrp", pa.array((mixed % np.uint64(n_partitions)).astype(np.int32), type=pa.int32())
    )


def candidate_pairs_in_partition(group: pa.Table) -> pa.Table:
    """One coarse partition of LIGHT band rows -> distinct-in-partition
    candidate pairs (doc_a, doc_b)."""
    out_a, out_b = [], []
    for ids, _cols in _bucket_runs(group, []):
        ia, ib = np.triu_indices(len(ids), k=1)
        out_a.append(ids[ia])
        out_b.append(ids[ib])
    if not out_a:
        return pa.table(
            {"doc_a": pa.array([], type=pa.uint64()), "doc_b": pa.array([], type=pa.uint64())}
        )
    return pa.table(
        {
            "doc_a": pa.array(np.concatenate(out_a).astype(np.uint64), type=pa.uint64()),
            "doc_b": pa.array(np.concatenate(out_b).astype(np.uint64), type=pa.uint64()),
        }
    )


def unpack_signatures(col, num_perm: int) -> np.ndarray:
    """fixed_size_binary signature column -> (n, num_perm) uint64,
    zero-copy from the Arrow values buffer (offset-aware)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(col) == 0:
        return np.empty((0, num_perm), dtype=np.uint64)
    flat = np.frombuffer(col.buffers()[1], dtype=np.uint64)
    start = col.offset * num_perm
    return flat[start : start + len(col) * num_perm].reshape(len(col), num_perm)


def _rename_column(batch: pa.Table, src: str, dst: str) -> pa.Table:
    # rename via map_batches, not Dataset.rename_columns — the latter
    # leaves empty join blocks un-renamed (inconsistent block schemas)
    return batch.rename_columns([dst if c == src else c for c in batch.column_names])


def _drop_empty_blocks(materialized_ds):
    """Hash-join partitions with no rows emit ZERO-COLUMN blocks;
    map_batches skips empty blocks so they can't be re-schematized by a
    UDF, and they poison a downstream acero join / to_pandas concat.
    Rebuild the dataset from the non-empty block refs — the driver
    touches only block METADATA (row counts), never block data."""
    import ray.data

    refs = [
        ref
        for bundle in materialized_ds.iter_internal_ref_bundles()
        for ref, meta in zip(bundle.block_refs, bundle.metadata)
        if meta.num_rows
    ]
    return ray.data.from_arrow_refs(refs) if refs else None


#: pair count at or below which verification takes the broadcast fast
#: path instead of the two-hash-join plan: the join machinery costs 3
#: materializations + 2 acero joins regardless of candidate count
#: (measured 3.2x sf0.1 wall on a 25-pair set), while the fast path
#: gathers at most 2*SMALL_PAIRS * payload_width bytes (~20 MB at 10k
#: pairs x 1 KB signatures) and verifies in one vectorized call.
SMALL_PAIRS_FAST_PATH = 10_000


def verify_pairs_by_join(deduped, payload_ds, verify_fn, payload_col: str,
                         join_partitions: int = 8,
                         small_pairs_threshold: int = SMALL_PAIRS_FAST_PATH):
    """Distributed pair verification: hash-join the (small) candidate
    pair set against a per-doc payload dataset on doc_a then doc_b, and
    run `verify_fn` over batches carrying `{payload_col}_a` +
    `{payload_col}` columns.  Nothing corpus-scale gathers on the
    driver — this is the 100-TB replacement for broadcasting the
    payload matrix.

    Size gate: when the deduped pair count is <= small_pairs_threshold
    the (candidate-scale, bounded) payloads are assembled directly and
    verified in one call — identical output, none of the join
    scaffolding.  The join path handles pair sets above the gate.

    payload_ds schema: (doc_id uint64, {payload_col} fixed_size_binary).
    Returns None when no pair survives (callers substitute their empty
    schema)."""
    from functools import partial

    import ray
    import ray.data

    deduped = deduped.materialize()
    pair_tables = [t for t in (ray.get(r) for r in deduped.to_arrow_refs()) if len(t)]
    if not pair_tables:
        return None
    n_pairs = sum(len(t) for t in pair_tables)
    if n_pairs <= small_pairs_threshold:
        return _verify_pairs_broadcast(
            pa.concat_tables(pair_tables), payload_ds, verify_fn, payload_col
        )

    # fractional-CPU join aggregators: with the default 1-CPU-per-
    # partition reservation two Join ops deadlock small clusters.
    # Scoped: both joins materialize inside this function, so the
    # process-wide default is restored before returning.
    ctx = ray.data.DataContext.get_current()
    saved_override = ctx.join_operator_actor_num_cpus_per_partition_override
    ctx.join_operator_actor_num_cpus_per_partition_override = 0.1
    try:
        return _verify_pairs_joins(
            deduped, payload_ds, verify_fn, payload_col, join_partitions
        )
    finally:
        ctx.join_operator_actor_num_cpus_per_partition_override = saved_override


def _verify_pairs_broadcast(pairs: pa.Table, payload_ds, verify_fn, payload_col: str):
    """Small-pairs fast path: semi-join-filter the payload dataset by
    the candidate id set (same first step as the join plan — only
    candidate payloads leave the workers), STREAM the filtered rows to
    the driver (bounded by 2 x pairs x payload width), assemble the
    `{payload_col}_a` / `{payload_col}` columns by searchsorted take,
    and run verify_fn once.  Returns a one-block Dataset with output
    identical to the join path (row order aside)."""
    from functools import partial

    import ray
    import ray.data

    ids = np.unique(
        np.concatenate(
            [pairs["doc_a"].to_numpy(), pairs["doc_b"].to_numpy()]
        ).astype(np.uint64)
    )
    ids_ref = ray.put(ids)
    filtered = payload_ds.map_batches(
        partial(_candidate_id_filter, ids_ref=ids_ref), batch_format="pyarrow"
    )
    tables = [
        t
        for t in filtered.iter_batches(batch_size=None, batch_format="pyarrow")
        if len(t)
    ]
    if not tables:
        return None
    payload = pa.concat_tables(tables).combine_chunks()
    doc_ids = payload["doc_id"].to_numpy().astype(np.uint64)
    order = np.argsort(doc_ids, kind="stable")
    doc_sorted = doc_ids[order]
    col = payload[payload_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = col.take(pa.array(order, type=pa.int64()))

    def lookup(side: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        pos = np.searchsorted(doc_sorted, side)
        pos_c = np.minimum(pos, len(doc_sorted) - 1)
        ok = doc_sorted[pos_c] == side
        return pos_c, ok

    a = pairs["doc_a"].to_numpy().astype(np.uint64)
    b = pairs["doc_b"].to_numpy().astype(np.uint64)
    pos_a, ok_a = lookup(a)
    pos_b, ok_b = lookup(b)
    # pairs whose side has no payload row (e.g. the doc was dropped as
    # too short) are excluded — the inner joins drop them identically
    keep = ok_a & ok_b
    if not keep.any():
        return None
    kmask = pa.array(keep)
    assembled = pa.table(
        {
            "doc_a": pairs["doc_a"].filter(kmask),
            "doc_b": pairs["doc_b"].filter(kmask),
            f"{payload_col}_a": col.take(pa.array(pos_a[keep], type=pa.int64())),
            payload_col: col.take(pa.array(pos_b[keep], type=pa.int64())),
        }
    )
    out = verify_fn(assembled)
    return ray.data.from_arrow(out) if len(out) else None


def _candidate_id_filter(batch: pa.Table, ids_ref) -> pa.Table:
    """keep only payload rows whose doc_id is a candidate-pair member;
    ids_ref resolves from the LOCAL object store per task (zero-copy)."""
    import ray

    ids = ray.get(ids_ref) if isinstance(ids_ref, ray.ObjectRef) else ids_ref
    docs = batch["doc_id"].to_numpy().astype(np.uint64)
    pos = np.searchsorted(ids, docs)
    pos_c = np.minimum(pos, len(ids) - 1) if len(ids) else pos
    mask = ids[pos_c] == docs if len(ids) else np.zeros(len(docs), dtype=bool)
    return batch.filter(pa.array(mask))


def _verify_pairs_joins(deduped, payload_ds, verify_fn, payload_col: str,
                        join_partitions: int):
    from functools import partial

    import ray

    # broadcast semi-join: the candidate-pair ID SET (pairs-scale —
    # tiny by construction) filters the corpus-scale payload dataset
    # BEFORE the hash joins, so the join shuffles candidate payloads
    # only, never the whole corpus's payload bytes
    deduped = deduped.materialize()
    id_parts = [
        np.concatenate([t["doc_a"].to_numpy(), t["doc_b"].to_numpy()]).astype(np.uint64)
        for t in (ray.get(r) for r in deduped.to_arrow_refs())
        if len(t)
    ]
    if not id_parts:
        return None
    ids_ref = ray.put(np.unique(np.concatenate(id_parts)))
    # materialized: both joins consume it, and the filtered set is
    # candidate-scale
    payload_ds = payload_ds.map_batches(
        partial(_candidate_id_filter, ids_ref=ids_ref), batch_format="pyarrow"
    ).materialize()

    j1 = deduped.join(
        payload_ds, "inner", join_partitions, on=("doc_a",), right_on=("doc_id",)
    ).map_batches(
        partial(_rename_column, src=payload_col, dst=f"{payload_col}_a"),
        batch_format="pyarrow",
    )
    # materialize between the two joins: chaining two streaming Join
    # operators in one plan feeds the second join schema-less empty
    # pass-through blocks (and double-reserves aggregator CPUs); the
    # materialized set is candidate-pair-sized, far below corpus scale
    j1 = _drop_empty_blocks(j1.materialize())
    if j1 is None:
        return None
    j2 = j1.join(payload_ds, "inner", join_partitions, on=("doc_b",), right_on=("doc_id",))
    return _drop_empty_blocks(
        j2.map_batches(verify_fn, batch_format="pyarrow").materialize()
    )


def _est_jaccard_packed(batch: pa.Table, num_perm: int, threshold: float) -> pa.Table:
    a = unpack_signatures(batch["signature_a"], num_perm)
    b = unpack_signatures(batch["signature"], num_perm)
    est = (a == b).mean(axis=1) if len(batch) else np.empty(0)
    keep = est >= threshold
    return pa.table(
        {
            "doc_a": batch["doc_a"].filter(pa.array(keep)) if len(batch) else pa.array([], type=pa.uint64()),
            "doc_b": batch["doc_b"].filter(pa.array(keep)) if len(batch) else pa.array([], type=pa.uint64()),
            "est_jaccard": pa.array(est[keep], type=pa.float64()),
        }
    )


def minhash_dedup_pairs(ds, threshold: float = 0.7, text_column: str = "text",
                        num_perm: int = 128, bands: int = 32,
                        join_partitions: int = 8, verify: str = "est",
                        shingle_w: int = 3,
                        coarse_partitions: int = COARSE_PARTITIONS):
    """Dataset -> candidate near-dup pairs (doc_a < doc_b, est_jaccard
    >= threshold), deduplicated across bands.

    verify="est" scores pairs by minhash coordinate agreement;
    verify="exact" computes TRUE n-gram Jaccard per candidate pair via
    the shingle-payload hash join (`ngram_jaccard_pairs`) — same
    distributed shape, column `jaccard` instead of `est_jaccard`.

    100-TB shuffle shape (nothing ever gathers on the driver):
      1. signatures computed once per doc, kept DISTRIBUTED (packed
         fixed-width binary; materialized to the object store — at
         10^12 docs persist this stage to parquet instead),
      2. the bucket groupby ships only light (band, bucket, doc_id)
         rows,
      3. pair verification hash-JOINS the (small) deduped candidate
         set against the signatures dataset twice (doc_a, then doc_b)
         and estimates Jaccard per pair from the two packed columns."""
    from functools import partial

    import ray.data

    stage = MinHashSignatures(num_perm=num_perm, bands=bands, text_column=text_column,
                              shingle_w=shingle_w)
    sigs_ds = ds.map_batches(
        stage.signatures_packed, batch_format="pyarrow", batch_size=4096
    ).materialize()
    score_col = "jaccard" if verify == "exact" else "est_jaccard"
    empty = pa.table(
        {
            "doc_a": pa.array([], type=pa.uint64()),
            "doc_b": pa.array([], type=pa.uint64()),
            score_col: pa.array([], type=pa.float64()),
        }
    )
    if sigs_ds.count() == 0:  # empty input -> empty, schema-stable pairs
        return ray.data.from_arrow(empty)

    bands_ds = sigs_ds.map_batches(
        stage.band_rows_packed, batch_format="pyarrow", batch_size=8192
    )
    parted = bands_ds.map_batches(
        partial(_coarse_partition_column, n_partitions=coarse_partitions),
        batch_format="pyarrow",
    )
    pairs = parted.groupby("pgrp").map_groups(candidate_pairs_in_partition, batch_format="pyarrow")
    deduped = dedup_pairs(pairs, coarse_partitions).materialize()
    if deduped.count() == 0:  # join of an empty left side loses schema
        return ray.data.from_arrow(empty)
    if verify == "exact":
        return ngram_jaccard_pairs(
            ds, deduped, threshold=threshold, text_column=text_column,
            w=shingle_w, join_partitions=join_partitions,
        )
    est = verify_pairs_by_join(
        deduped,
        sigs_ds,
        partial(_est_jaccard_packed, num_perm=num_perm, threshold=threshold),
        payload_col="signature",
        join_partitions=join_partitions,
    )
    return est if est is not None else ray.data.from_arrow(empty)


def _pair_partition_column(batch: pa.Table, n_partitions: int = COARSE_PARTITIONS) -> pa.Table:
    a = batch["doc_a"].to_numpy().astype(np.uint64)
    b = batch["doc_b"].to_numpy().astype(np.uint64)
    mixed = (a * np.uint64(0x9E3779B97F4A7C15) + b) % np.uint64(n_partitions)
    return batch.append_column("pgrp", pa.array(mixed.astype(np.int32), type=pa.int32()))


def _dedup_pairs_in_partition(group: pa.Table) -> pa.Table:
    a = group["doc_a"].to_numpy()
    b = group["doc_b"].to_numpy()
    order = np.lexsort((b, a))
    first = np.empty(len(order), dtype=bool)
    first[0:1] = True
    first[1:] = (a[order][1:] != a[order][:-1]) | (b[order][1:] != b[order][:-1])
    idx = order[first]
    return group.take(pa.array(np.sort(idx), type=pa.int64())).drop_columns(["pgrp"])


def dedup_pairs(pairs_ds, coarse_partitions: int = COARSE_PARTITIONS):
    """Distinct (doc_a, doc_b) rows (same pair emitted once per
    colliding band): one coarse groupby, vectorized unique."""
    from functools import partial as _partial

    parted = pairs_ds.map_batches(
        _partial(_pair_partition_column, n_partitions=coarse_partitions),
        batch_format="pyarrow",
    )
    return parted.groupby("pgrp").map_groups(_dedup_pairs_in_partition, batch_format="pyarrow")



# ------------------------------------------------------------ simhash
class SimHash:
    """map_batches stage: text -> (doc_id, simhash:uint64) — sign of
    per-bit sums over token-occurrence hashes."""

    def __init__(self, text_column: str = "text"):
        self.text_column = text_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        lists = tokenize(batch[self.text_column])
        values, rows, _ = explode(lists)
        h = _token_hashes(values)
        n = len(batch)
        out = np.zeros(n, dtype=np.uint64)
        if len(h):
            bits = np.unpackbits(h.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
            sums = np.zeros((n, 64), dtype=np.int64)
            np.add.at(sums, rows, bits.astype(np.int64))
            counts = np.zeros(n, dtype=np.int64)
            np.add.at(counts, rows, 1)
            maj = (2 * sums) > counts[:, None]
            weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))
            out = (maj.astype(np.uint64) * weights).sum(axis=1, dtype=np.uint64)
        return pa.table(
            {"doc_id": batch["doc_id"], "simhash": pa.array(out, type=pa.uint64())}
        )


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a, b)
    return np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1).sum(axis=1)


def simhash_pairs(ds, max_hamming: int = 3, text_column: str = "text", bands: int = 4,
                  coarse_partitions: int = COARSE_PARTITIONS):
    """Dataset -> near-dup pairs by simhash banding: docs sharing any
    16-bit band bucket are candidates; exact Hamming check in-group."""
    sigs = ds.map_batches(
        SimHash(text_column=text_column), batch_format="pyarrow", batch_size=4096
    )

    r = 64 // bands
    mask = np.uint64((1 << r) - 1)

    def band_explode(batch: pa.Table) -> pa.Table:
        sh = batch["simhash"].to_numpy().astype(np.uint64)
        n = len(batch)
        return pa.table(
            {
                "band": pa.array(np.repeat(np.arange(bands, dtype=np.int32), n)),
                "bucket": pa.array(
                    np.concatenate([(sh >> np.uint64(b * r)) & mask for b in range(bands)]),
                    type=pa.uint64(),
                ),
                "doc_id": pa.array(np.tile(batch["doc_id"].to_numpy(), bands)),
                "simhash": pa.array(np.tile(sh, bands), type=pa.uint64()),
            }
        )

    def pairs_in_partition(group: pa.Table) -> pa.Table:
        out_a, out_b, out_h = [], [], []
        for ids, cols in _bucket_runs(group, ["simhash"]):
            sh = cols["simhash"].to_numpy().astype(np.uint64)
            ia, ib = np.triu_indices(len(ids), k=1)
            ham = hamming64(sh[ia], sh[ib]).astype(np.int64)
            ok = ham <= max_hamming
            out_a.append(ids[ia][ok])
            out_b.append(ids[ib][ok])
            out_h.append(ham[ok])
        if not out_a:
            return pa.table(
                {
                    "doc_a": pa.array([], type=pa.uint64()),
                    "doc_b": pa.array([], type=pa.uint64()),
                    "hamming": pa.array([], type=pa.int64()),
                }
            )
        return pa.table(
            {
                "doc_a": pa.array(np.concatenate(out_a).astype(np.uint64), type=pa.uint64()),
                "doc_b": pa.array(np.concatenate(out_b).astype(np.uint64), type=pa.uint64()),
                "hamming": pa.array(np.concatenate(out_h), type=pa.int64()),
            }
        )

    from functools import partial as _partial

    exploded = sigs.map_batches(band_explode, batch_format="pyarrow").map_batches(
        _partial(_coarse_partition_column, n_partitions=coarse_partitions),
        batch_format="pyarrow",
    )
    pairs = exploded.groupby("pgrp").map_groups(pairs_in_partition, batch_format="pyarrow")
    return dedup_pairs(pairs, coarse_partitions)


# ----------------------------------------------- exact n-gram Jaccard
def shingle_payload(batch: pa.Table, text_column: str = "text", w: int = 3) -> pa.Table:
    """text -> (doc_id uint64, shingles binary): each doc's SORTED
    UNIQUE shingle-hash set packed as raw uint64 bytes — the joinable
    payload for dataset-scale exact Jaccard verification (acero joins
    carry binary, not list, columns)."""
    hashes, rows = _doc_shingle_hashes(batch, text_column, w)
    doc_col = batch["doc_id"]
    if isinstance(doc_col, pa.ChunkedArray):
        doc_col = doc_col.combine_chunks()
    doc_ids = doc_col.to_numpy(zero_copy_only=False)
    n = len(batch)
    order = np.lexsort((hashes, rows))
    rows_s, h_s = rows[order], hashes[order]
    # unique within doc (rows_s groups are contiguous)
    keep = np.ones(len(h_s), dtype=bool)
    if len(h_s):
        keep[1:] = (rows_s[1:] != rows_s[:-1]) | (h_s[1:] != h_s[:-1])
    rows_u, h_u = rows_s[keep], h_s[keep]
    counts = np.zeros(n, dtype=np.int64)
    np.add.at(counts, rows_u, 1)
    total_bytes = int(counts.sum()) * 8
    if total_bytes >= (1 << 31):
        raise ValueError(
            f"shingle payload batch exceeds binary-array int32 offsets "
            f"({total_bytes} bytes) — lower the stage batch_size"
        )
    offsets = np.concatenate([[0], np.cumsum(counts) * 8]).astype(np.int32)
    payload = pa.Array.from_buffers(
        pa.binary(),
        n,
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(np.ascontiguousarray(h_u).tobytes())],
    )
    return pa.table(
        {"doc_id": pa.array(doc_ids, type=pa.uint64()), "shingles": payload}
    )


def _unpack_shingle_rows(col) -> tuple[np.ndarray, np.ndarray]:
    """binary column -> (flat uint64 values, int64 row offsets)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(col) == 0:
        return np.empty(0, dtype=np.uint64), np.zeros(1, dtype=np.int64)
    # BinaryArray buffers: [validity, int32 byte offsets, data]
    off_buf = np.frombuffer(col.buffers()[1], dtype=np.int32)
    offsets = off_buf[col.offset : col.offset + len(col) + 1].astype(np.int64)
    data = col.buffers()[2]
    vals = np.frombuffer(data, dtype=np.uint64, count=len(data) // 8)
    return vals, offsets // 8


def _exact_jaccard_packed(batch: pa.Table, threshold: float) -> pa.Table:
    a_vals, a_off = _unpack_shingle_rows(batch["shingles_a"])
    b_vals, b_off = _unpack_shingle_rows(batch["shingles"])
    n = len(batch)
    from chearch_ray.state.searcher import intersect_sorted

    ja = np.empty(n, dtype=np.float64)
    for i in range(n):  # per-PAIR loop over the small candidate set
        sa = a_vals[a_off[i] : a_off[i + 1]]
        sb = b_vals[b_off[i] : b_off[i + 1]]
        inter = len(intersect_sorted(sa, sb))
        union = len(sa) + len(sb) - inter
        ja[i] = inter / union if union else 0.0
    keep = ja >= threshold
    mask = pa.array(keep)
    return pa.table(
        {
            "doc_a": batch["doc_a"].filter(mask) if n else pa.array([], type=pa.uint64()),
            "doc_b": batch["doc_b"].filter(mask) if n else pa.array([], type=pa.uint64()),
            "jaccard": pa.array(ja[keep], type=pa.float64()),
        }
    )


def ngram_jaccard_pairs(ds, pairs_ds, threshold: float = 0.0,
                        text_column: str = "text", w: int = 3,
                        join_partitions: int = 8):
    """DATASET-scale exact n-gram Jaccard for candidate pairs: the
    corpus maps to packed shingle-set payloads, candidate pairs
    hash-join them on doc_a/doc_b (same machinery as the MinHash and
    embedding verifies), and exact Jaccard is computed per pair —
    nothing gathers on the driver.  `pairs_ds` needs (doc_a, doc_b)."""
    from functools import partial

    import ray.data

    # NOT materialized: verify_pairs_by_join immediately semi-joins
    # this against the (tiny) candidate-id set and materializes the
    # filtered result — pinning the corpus-scale payload here would
    # double peak object-store footprint for nothing
    payload = ds.map_batches(
        partial(shingle_payload, text_column=text_column, w=w),
        batch_format="pyarrow",
        batch_size=4096,
    )
    empty = pa.table(
        {
            "doc_a": pa.array([], type=pa.uint64()),
            "doc_b": pa.array([], type=pa.uint64()),
            "jaccard": pa.array([], type=pa.float64()),
        }
    )
    out = verify_pairs_by_join(
        pairs_ds,
        payload,
        partial(_exact_jaccard_packed, threshold=threshold),
        payload_col="shingles",
        join_partitions=join_partitions,
    )
    return out if out is not None else ray.data.from_arrow(empty)


def ngram_jaccard_verify(corpus: pa.Table, pairs: pa.Table, text_column: str = "text",
                         w: int = 3) -> pa.Table:
    """Exact shingle-set Jaccard for given candidate pairs (driver-side
    or inside a map_groups over pair buckets; candidates only, never
    all-pairs)."""
    shingles, rows = _doc_shingle_hashes(corpus, text_column, w)
    doc_ids = corpus["doc_id"].to_numpy()
    sets: dict[int, set] = {int(d): set() for d in doc_ids}
    for h, r in zip(shingles.tolist(), rows.tolist()):
        sets[int(doc_ids[r])].add(h)
    ja = []
    for a, b in zip(pairs["doc_a"].to_pylist(), pairs["doc_b"].to_pylist()):
        sa, sb = sets.get(a, set()), sets.get(b, set())
        union = len(sa | sb)
        ja.append((len(sa & sb) / union) if union else 0.0)
    return pairs.append_column("jaccard", pa.array(ja, type=pa.float64()))

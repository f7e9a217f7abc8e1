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
from chearch_ray.stages.partition import add_pgrp_column, drop_pgrp_then
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


def _bucket_runs(group: pa.Table, value_columns: list[str],
                 max_bucket_docs: int | None = MAX_BUCKET_DOCS):
    """Sort one coarse partition by (band, bucket, doc_id), dedupe
    (band, bucket, doc) rows, yield (ids, *values) per multi-doc
    bucket.  Vectorized run detection; Python loop only over the
    multi-doc buckets.  max_bucket_docs=None disables the degenerate-
    bucket skip (exact joins need every bucket)."""
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
        if max_bucket_docs is not None and e - s > max_bucket_docs:
            continue  # degenerate boilerplate bucket; see MAX_BUCKET_DOCS
        yield docs[s:e], {c: values[c].take(pa.array(keep[s:e])) for c in value_columns}


def _coarse_partition_column(batch: pa.Table, n_partitions: int = COARSE_PARTITIONS) -> pa.Table:
    # shared fmix64 spread (stages/partition.py) keyed on the bucket
    return add_pgrp_column(batch, n_partitions, key="bucket")


def candidate_pairs_in_partition(group: pa.Table,
                                 max_bucket_docs: int | None = MAX_BUCKET_DOCS) -> pa.Table:
    """One coarse partition of LIGHT band rows -> distinct-in-partition
    candidate pairs (doc_a, doc_b)."""
    out_a, out_b = [], []
    for ids, _cols in _bucket_runs(group, [], max_bucket_docs=max_bucket_docs):
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


#: candidate-payload byte cap for the broadcast verify path: below it
#: the FILTERED (candidate-docs-only) payload is broadcast via ray.put
#: and pairs verify distributed over the pair dataset — no acero joins,
#: no extra materializations (the join plan costs ~3 s of fixed
#: machinery regardless of candidate count).  Above it the two-hash-
#: join plan runs, which never gathers payload anywhere.
BROADCAST_PAYLOAD_BYTES = 256 * 1024 * 1024


def verify_pairs_by_join(deduped, payload_ds, verify_fn, payload_col: str,
                         join_partitions: int | None = None,
                         broadcast_bytes: int = BROADCAST_PAYLOAD_BYTES):
    """Distributed pair verification: run `verify_fn` over batches
    carrying `{payload_col}_a` + `{payload_col}` columns for each
    candidate (doc_a, doc_b) pair.

    Both paths first semi-join-filter the corpus-scale payload dataset
    by the candidate id set, so only candidate docs' payloads move.
    The filtered payload's byte size (block METADATA, no gather) picks
    the plan:
      * <= broadcast_bytes: broadcast the filtered payload (ray.put)
        and map_batches over the PAIRS dataset — each task assembles
        its batch's payload columns by searchsorted take and verifies
        vectorized.  Identical output to the join plan, none of its
        fixed cost.
      * larger: hash-join pairs against the payload on doc_a then
        doc_b (nothing gathers on the driver at any scale).

    payload_ds schema: (doc_id uint64, {payload_col} binary).
    Returns None when no pair survives (callers substitute their empty
    schema)."""
    from functools import partial

    import ray
    import ray.data

    deduped = deduped.materialize()
    pair_tables = [t for t in (ray.get(r) for r in deduped.to_arrow_refs()) if len(t)]
    if not pair_tables:
        return None
    id_parts = [
        np.concatenate([t["doc_a"].to_numpy(), t["doc_b"].to_numpy()]).astype(np.uint64)
        for t in pair_tables
    ]
    ids_ref = ray.put(np.unique(np.concatenate(id_parts)))
    filtered = payload_ds.map_batches(
        partial(_candidate_id_filter, ids_ref=ids_ref), batch_format="pyarrow"
    ).materialize()

    if filtered.size_bytes() <= broadcast_bytes:
        tables = [t for t in (ray.get(r) for r in filtered.to_arrow_refs()) if len(t)]
        if not tables:
            return None
        payload = pa.concat_tables(tables).combine_chunks()
        doc_ids = payload["doc_id"].to_numpy().astype(np.uint64)
        order = np.argsort(doc_ids, kind="stable")
        col = payload[payload_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        payload_ref = ray.put((doc_ids[order], col.take(pa.array(order, type=pa.int64()))))
        out = deduped.map_batches(
            partial(
                _verify_batch_broadcast,
                payload_ref=payload_ref,
                payload_col=payload_col,
                verify_fn=verify_fn,
            ),
            batch_format="pyarrow",
            batch_size=8192,
        )
        return _drop_empty_blocks(out.materialize())

    return _verify_pairs_joins(
        deduped, filtered, verify_fn, payload_col, join_partitions
    )


def _verify_batch_broadcast(batch: pa.Table, payload_ref, payload_col: str,
                            verify_fn) -> pa.Table:
    """broadcast-verify task: one batch of (doc_a, doc_b) pairs +
    the broadcast (sorted doc ids, payload array) -> verify_fn output.
    The ref resolves zero-copy from the local object store per task."""
    import ray

    doc_sorted, col = (
        ray.get(payload_ref) if isinstance(payload_ref, ray.ObjectRef) else payload_ref
    )

    def lookup(side: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        pos = np.searchsorted(doc_sorted, side)
        pos_c = np.minimum(pos, len(doc_sorted) - 1) if len(doc_sorted) else pos
        ok = doc_sorted[pos_c] == side if len(doc_sorted) else np.zeros(len(side), dtype=bool)
        return pos_c, ok

    a = batch["doc_a"].to_numpy().astype(np.uint64)
    b = batch["doc_b"].to_numpy().astype(np.uint64)
    pos_a, ok_a = lookup(a)
    pos_b, ok_b = lookup(b)
    # pairs whose side has no payload row (e.g. the doc was dropped as
    # too short) are excluded — the inner joins drop them identically
    keep = ok_a & ok_b
    kmask = pa.array(keep)
    assembled = pa.table(
        {
            "doc_a": batch["doc_a"].filter(kmask),
            "doc_b": batch["doc_b"].filter(kmask),
            f"{payload_col}_a": col.take(pa.array(pos_a[keep], type=pa.int64())),
            payload_col: col.take(pa.array(pos_b[keep], type=pa.int64())),
        }
    )
    return verify_fn(assembled)


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
                        join_partitions: int | None):
    """join-plan verification: `payload_ds` arrives already semi-join-
    filtered to candidate docs and materialized (both joins consume
    it); the filtered set is candidate-scale, never the corpus.
    Aggregator actors get explicit fractional-CPU remote args — the
    DataContext override is snapshotted per dataset and never reaches
    these operators (see stages/partition.join_remote_args)."""
    from functools import partial

    from chearch_ray.stages.partition import join_parallelism, join_remote_args

    join_partitions = join_parallelism(join_partitions)
    j1 = deduped.join(
        payload_ds, "inner", join_partitions, on=("doc_a",), right_on=("doc_id",),
        aggregator_ray_remote_args=join_remote_args(),
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
    j2 = j1.join(payload_ds, "inner", join_partitions, on=("doc_b",),
                 right_on=("doc_id",),
                 aggregator_ray_remote_args=join_remote_args())
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
                        join_partitions: int | None = None, verify: str = "est",
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
    # TWO-key variant (golden-ratio combine) — both ids must route the
    # pair, so this intentionally differs from partition.add_pgrp_column
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
                        join_partitions: int | None = None):
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


# --------------------------- exact set-similarity join (prefix filter)
def _prefix_rows(batch: pa.Table, threshold: float, df_ref=None) -> pa.Table:
    """(doc_id, shingles) payload rows -> LIGHT prefix rows (band=0,
    bucket=shingle hash, doc_id, nsh=|S|) for the first
    |S| - ceil(t*|S|) + 1 shingles of each doc under the global order.

    Prefix-filter guarantee (AllPairs/PPJoin family, exact): for any
    pair with J(A,B) >= t, |A∩B| >= t*|A| and >= t*|B|, so the
    SMALLEST shared shingle under the global order lies inside both
    prefixes — every qualifying pair collides on at least one prefix
    shingle.  Any consistent total order is exact; with `df_ref` (a
    broadcast (sorted shingle hashes, df) pair) the order is
    (df ASC, hash ASC) — prefixes then hold each doc's RAREST
    shingles, so hot-shingle buckets stay out of the candidate
    explosion (the AllPairs frequency ordering).  Without it the
    order is plain ascending hash."""
    import ray

    vals, off = _unpack_shingle_rows(batch["shingles"])
    counts = np.diff(off)
    # smaller ceil -> LONGER prefix: the epsilon guards float error in
    # the safe direction (extra candidates, never missed ones)
    p = counts - np.ceil(threshold * counts - 1e-9).astype(np.int64) + 1
    p = np.clip(p, 0, counts)
    if df_ref is not None:
        df_keys, df_vals = ray.get(df_ref) if isinstance(df_ref, ray.ObjectRef) else df_ref
        dfs = df_vals[np.searchsorted(df_keys, vals)]
        # reorder each doc's shingles by (df asc, hash asc): stable
        # sort on hash is given (payload is hash-sorted), sort by df
        # within doc
        row_of = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        order = np.lexsort((vals, dfs, row_of))
        vals = vals[order]
    pos = np.arange(len(vals), dtype=np.int64) - np.repeat(off[:-1], counts)
    mask = pos < np.repeat(p, counts)
    doc_col = batch["doc_id"]
    if isinstance(doc_col, pa.ChunkedArray):
        doc_col = doc_col.combine_chunks()
    doc_np = doc_col.to_numpy(zero_copy_only=False).astype(np.uint64)
    doc_rep = np.repeat(doc_np, counts)[mask]
    nsh_rep = np.repeat(counts.astype(np.int32), counts)[mask]
    return pa.table(
        {
            "band": pa.array(np.zeros(int(mask.sum()), dtype=np.int32), type=pa.int32()),
            "bucket": pa.array(vals[mask], type=pa.uint64()),
            "doc_id": pa.array(doc_rep, type=pa.uint64()),
            "nsh": pa.array(nsh_rep, type=pa.int32()),
        }
    )


def _df_partial(batch: pa.Table) -> pa.Table:
    """payload batch -> block-local (bucket, n) partial df counts
    (shingles are unique per doc, so occurrence count == document
    frequency): the map-side combiner that keeps the driver merge at
    distinct-shingle scale per block."""
    vals, _ = _unpack_shingle_rows(batch["shingles"])
    uniq, cnt = np.unique(vals, return_counts=True)
    return pa.table(
        {"bucket": pa.array(uniq, type=pa.uint64()), "n": pa.array(cnt, type=pa.int64())}
    )


def _shingle_df_broadcast(payload, max_distinct: int = 5_000_000):
    """-> ray ObjectRef of (sorted shingle hashes, df), or None when
    the vocabulary exceeds `max_distinct` (fall back to hash order; at
    that scale a join-based reorder would replace the broadcast).

    Per-block partials stream to the driver and merge with one numpy
    sort — a vocabulary-scale reduce, far below a full groupby's sort
    shuffle (measured: the Ray sort-groupby form of this pass cost
    ~4 s of fixed stage overhead at sf0.1 for a 30k-entry result)."""
    import ray

    partials = payload.map_batches(_df_partial, batch_format="pyarrow")
    # early bail: distinct <= streamed partial rows, so once the
    # stream passes 4x the gate the broadcast is (almost surely) over
    # budget — stop gathering and let the caller take the distributed
    # path instead of completing a driver-scale merge first
    tables, total = [], 0
    for t in partials.iter_batches(batch_size=None, batch_format="pyarrow"):
        if len(t):
            tables.append(t)
            total += len(t)
            if total > max(4 * max_distinct, 1_000_000) and max_distinct < (1 << 62):
                return None
    if not tables:
        return None
    t = pa.concat_tables(tables).combine_chunks()
    keys = t["bucket"].to_numpy().astype(np.uint64)
    ns = t["n"].to_numpy().astype(np.int64)
    order = np.argsort(keys, kind="stable")
    keys, ns = keys[order], ns[order]
    starts = np.flatnonzero(np.concatenate([[True], keys[1:] != keys[:-1]]))
    uniq = keys[starts]
    if len(uniq) > max_distinct:
        return None
    dfs = np.add.reduceat(ns, starts)
    return ray.put((uniq, dfs))


def _explode_shingle_rows(batch: pa.Table) -> pa.Table:
    """payload batch -> one row per (doc, shingle): doc_id, the hash
    both as uint64 (`bucket`) and as an int64 BIT-CAST (`bucket_j`,
    the join/groupby carrier — Ray's hash shuffle raises on uint64
    keys >= 2^63), and the doc's shingle count."""
    vals, off = _unpack_shingle_rows(batch["shingles"])
    counts = np.diff(off)
    doc_col = batch["doc_id"]
    if isinstance(doc_col, pa.ChunkedArray):
        doc_col = doc_col.combine_chunks()
    doc_np = doc_col.to_numpy(zero_copy_only=False).astype(np.uint64)
    return pa.table(
        {
            "doc_id": pa.array(np.repeat(doc_np, counts), type=pa.uint64()),
            "bucket_j": pa.array(vals.view(np.int64), type=pa.int64()),
            "nsh": pa.array(np.repeat(counts.astype(np.int32), counts), type=pa.int32()),
        }
    )


def _df_partial_j(batch: pa.Table) -> pa.Table:
    """like _df_partial but keyed on the int64 bit-cast for the Ray
    groupby that merges it."""
    t = _df_partial(batch)
    return pa.table(
        {
            "bucket_j": pa.array(t["bucket"].to_numpy().view(np.int64), type=pa.int64()),
            "n": t["n"],
        }
    )


def _prefix_select_partition(group: pa.Table, threshold: float) -> pa.Table:
    """one coarse doc partition of df-joined shingle rows -> prefix
    rows in _prefix_rows' output schema.  Vectorized across all docs:
    sort by (doc, df, hash), run-rank, keep rank < |S|-ceil(t|S|)+1."""
    if len(group) == 0:
        return pa.table(
            {
                "band": pa.array([], type=pa.int32()),
                "bucket": pa.array([], type=pa.uint64()),
                "doc_id": pa.array([], type=pa.uint64()),
                "nsh": pa.array([], type=pa.int32()),
            }
        )
    doc = group["doc_id"].to_numpy().astype(np.uint64)
    hsh = group["bucket_j"].to_numpy().view(np.uint64)
    dfs = group["df"].to_numpy().astype(np.int64)
    nsh = group["nsh"].to_numpy().astype(np.int64)
    order = np.lexsort((hsh, dfs, doc))
    doc_s, hsh_s, nsh_s = doc[order], hsh[order], nsh[order]
    starts = np.empty(len(doc_s), dtype=bool)
    starts[0] = True
    starts[1:] = doc_s[1:] != doc_s[:-1]
    sidx = np.flatnonzero(starts)
    runlen = np.diff(np.append(sidx, len(doc_s)))
    rank = np.arange(len(doc_s), dtype=np.int64) - np.repeat(sidx, runlen)
    p = nsh_s - np.ceil(threshold * nsh_s - 1e-9).astype(np.int64) + 1
    mask = rank < np.clip(p, 0, nsh_s)
    return pa.table(
        {
            "band": pa.array(np.zeros(int(mask.sum()), dtype=np.int32), type=pa.int32()),
            "bucket": pa.array(hsh_s[mask], type=pa.uint64()),
            "doc_id": pa.array(doc_s[mask], type=pa.uint64()),
            "nsh": pa.array(nsh_s[mask].astype(np.int32), type=pa.int32()),
        }
    )


def _prefix_rows_distributed(payload, threshold: float, coarse_partitions: int,
                             join_partitions: int):
    """Frequency-ordered prefix rows WITHOUT the df broadcast
    (ROADMAP #11, the > max_distinct vocabulary path): df merges in a
    Ray groupby, joins back to the exploded shingle rows on the
    bit-cast hash, and per-doc prefix selection runs vectorized in
    coarse doc partitions.  Output is row-identical to the broadcast
    path (`_prefix_rows` with df_ref) — same (df ASC, hash ASC)
    order, same tie-breaks."""
    from functools import partial

    import ray.data
    from ray.data.aggregate import Sum

    df_ds = (
        payload.map_batches(_df_partial_j, batch_format="pyarrow")
        .groupby("bucket_j")
        .aggregate(Sum("n", alias_name="df"))
    )
    exploded = payload.map_batches(_explode_shingle_rows, batch_format="pyarrow")
    from chearch_ray.stages.partition import join_parallelism, join_remote_args

    joined = exploded.join(
        df_ds,
        join_type="inner",
        on=("bucket_j",),
        num_partitions=join_parallelism(join_partitions),
        aggregator_ray_remote_args=join_remote_args(),
    ).materialize()
    parted = joined.map_batches(
        partial(add_pgrp_column, n_partitions=coarse_partitions, key="doc_id"),
        batch_format="pyarrow",
    )
    return parted.groupby("pgrp").map_groups(
        partial(
            drop_pgrp_then, fn=partial(_prefix_select_partition, threshold=threshold)
        ),
        batch_format="pyarrow",
    )


def _jaccard_candidates_partition(group: pa.Table, threshold: float) -> pa.Table:
    """prefix-bucket runs -> candidate pairs with the SIZE FILTER:
    J(A,B) <= min(|A|,|B|)/max(|A|,|B|), so pairs with
    min < ceil(t*max) cannot qualify and are dropped before
    verification (exact-safe)."""
    out_a, out_b = [], []
    for ids, cols in _bucket_runs(group, ["nsh"], max_bucket_docs=None):
        nsh = cols["nsh"].to_numpy().astype(np.int64)
        ia, ib = np.triu_indices(len(ids), k=1)
        na, nb = nsh[ia], nsh[ib]
        lo, hi = np.minimum(na, nb), np.maximum(na, nb)
        ok = lo >= np.ceil(threshold * hi - 1e-9)
        out_a.append(ids[ia][ok])
        out_b.append(ids[ib][ok])
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


def jaccard_similarity_join(ds, threshold: float = 0.5, text_column: str = "text",
                            w: int = 3, join_partitions: int | None = None,
                            coarse_partitions: int = COARSE_PARTITIONS,
                            df_broadcast_limit: int = 5_000_000):
    """EXACT n-gram Jaccard self-join: every pair with true shingle
    Jaccard >= threshold, no LSH recall luck involved.

    Shape: shingle payloads once per doc -> prefix-filtered candidate
    explosion (each doc ships only its |S|-ceil(t|S|)+1 smallest
    shingle hashes) -> bucket groupby on the shingle hash (coarse
    partitions, the only all-to-all) -> distinct pairs -> exact
    Jaccard verification against the packed payloads
    (verify_pairs_by_join).  Unlike the LSH path, prefix buckets are
    never skipped (exactness requires every bucket); at web scale a
    frequency-ordered prefix keeps hot-shingle buckets small."""
    from functools import partial

    import ray.data

    empty = pa.table(
        {
            "doc_a": pa.array([], type=pa.uint64()),
            "doc_b": pa.array([], type=pa.uint64()),
            "jaccard": pa.array([], type=pa.float64()),
        }
    )
    payload = ds.map_batches(
        partial(shingle_payload, text_column=text_column, w=w),
        batch_format="pyarrow",
        batch_size=4096,
    ).materialize()
    if payload.count() == 0:
        return ray.data.from_arrow(empty)
    # frequency-ordered prefixes (AllPairs): one df pass so each doc's
    # prefix holds its RAREST shingles — hot shingles stay in suffixes
    # and never explode a candidate bucket.  Vocabulary <= the gate
    # broadcasts the df table; above it the same ordering comes from a
    # distributed groupby + join (row-identical output, ROADMAP #11)
    df_ref = _shingle_df_broadcast(payload, max_distinct=df_broadcast_limit)
    if df_ref is not None:
        prefix = payload.map_batches(
            partial(_prefix_rows, threshold=threshold, df_ref=df_ref),
            batch_format="pyarrow",
        )
    else:
        prefix = _prefix_rows_distributed(
            payload, threshold, coarse_partitions, join_partitions
        )
    parted = prefix.map_batches(
        partial(_coarse_partition_column, n_partitions=coarse_partitions),
        batch_format="pyarrow",
    )
    pairs = parted.groupby("pgrp").map_groups(
        partial(_jaccard_candidates_partition, threshold=threshold),
        batch_format="pyarrow",
    )
    deduped = dedup_pairs(pairs, coarse_partitions).materialize()
    if deduped.count() == 0:
        return ray.data.from_arrow(empty)
    out = verify_pairs_by_join(
        deduped,
        payload,
        partial(_exact_jaccard_packed, threshold=threshold),
        payload_col="shingles",
        join_partitions=join_partitions,
    )
    return out if out is not None else ray.data.from_arrow(empty)


# --------------------------------- connected components / dedup groups
def _cc_seed(batch: pa.Table) -> pa.Table:
    """(doc_a, doc_b) pairs -> directed adjacency rows with self
    loops: (a,b),(b,a),(a,a),(b,b) — row (u,v) means v ∈ C(u)."""
    a = batch["doc_a"].to_numpy().astype(np.uint64)
    b = batch["doc_b"].to_numpy().astype(np.uint64)
    return pa.table(
        {
            "doc_a": pa.array(np.concatenate([a, b, a, b]), type=pa.uint64()),
            "doc_b": pa.array(np.concatenate([b, a, a, b]), type=pa.uint64()),
        }
    )


def _cc_partition_u(batch: pa.Table, n_partitions: int = COARSE_PARTITIONS) -> pa.Table:
    return add_pgrp_column(batch, n_partitions, key="doc_a")


def _cc_runs(group: pa.Table):
    """-> (u sorted, v sorted-within-u, run starts) for one coarse
    partition of adjacency rows."""
    a = group["doc_a"].to_numpy().astype(np.uint64)
    v = group["doc_b"].to_numpy().astype(np.uint64)
    order = np.lexsort((v, a))
    a, v = a[order], v[order]
    starts = np.flatnonzero(np.concatenate([[True], a[1:] != a[:-1]]))
    return a, v, starts


def _cc_expand_partition(group: pa.Table) -> pa.Table:
    """hash-to-min step for the u-runs of one partition: with
    m = min(C(u)), send C(u) to m and {m} to every member —
    rows (m, v) and (v, m) for all v ∈ C(u)."""
    a, v, starts = _cc_runs(group)
    lengths = np.diff(np.append(starts, len(a)))
    m_rep = np.repeat(v[starts], lengths)  # v sorted: run head = min
    return pa.table(
        {
            "doc_a": pa.array(np.concatenate([m_rep, v]), type=pa.uint64()),
            "doc_b": pa.array(np.concatenate([v, m_rep]), type=pa.uint64()),
        }
    )


def _cc_labels_partition(group: pa.Table) -> pa.Table:
    """final labels for one partition: label(u) = min(C(u))."""
    a, v, starts = _cc_runs(group)
    return pa.table(
        {
            "doc_id": pa.array(a[starts], type=pa.uint64()),
            "keep_id": pa.array(v[starts], type=pa.uint64()),
        }
    )


def _pairs_checksum(batch: pa.Table) -> pa.Table:
    """order-independent (count, checksum) partial per batch — the
    driver sums one row per block to detect the CC fixpoint."""
    a = batch["doc_a"].to_numpy().astype(np.uint64)
    b = batch["doc_b"].to_numpy().astype(np.uint64)
    mixed = (a * np.uint64(0x9E3779B97F4A7C15)) ^ (b * np.uint64(0xC2B2AE3D27D4EB4F))
    chk = np.bitwise_xor.reduce(mixed) if len(mixed) else np.uint64(0)
    return pa.table(
        {
            "n": pa.array([len(batch)], type=pa.int64()),
            "chk": pa.array([int(chk)], type=pa.uint64()),
        }
    )


def _state_signature(state) -> tuple[int, int]:
    rows = state.map_batches(_pairs_checksum, batch_format="pyarrow").take_all()
    n = sum(r["n"] for r in rows)
    chk = 0
    for r in rows:
        chk ^= int(r["chk"])
    return n, chk


def _cc_driver_union_find(state) -> "pa.Table":
    """bounded-pair fallback: a path-compressed union-find over the
    gathered edge set — O(E α(E)), exact, no exchange rounds."""
    import ray.data  # noqa: F401

    parts = [t for t in state.iter_batches(batch_size=None, batch_format="pyarrow")
             if len(t)]
    if not parts:
        return pa.table({"doc_id": pa.array([], type=pa.uint64()),
                         "keep_id": pa.array([], type=pa.uint64())})
    edges = pa.concat_tables(parts)
    a = edges["doc_a"].to_numpy().astype(np.uint64)
    b = edges["doc_b"].to_numpy().astype(np.uint64)
    nodes = np.unique(np.concatenate([a, b]))
    idx = {int(n): i for i, n in enumerate(nodes)}
    parent = np.arange(len(nodes), dtype=np.int64)

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, int(parent[x])
        return root

    for x, y in zip(a.tolist(), b.tolist()):
        rx, ry = find(idx[x]), find(idx[y])
        if rx != ry:
            # union by MIN doc id so every root IS its component's min
            if nodes[rx] < nodes[ry]:
                parent[ry] = rx
            else:
                parent[rx] = ry
    keep = np.array([nodes[find(i)] for i in range(len(nodes))], dtype=np.uint64)
    return pa.table({"doc_id": pa.array(nodes, type=pa.uint64()),
                     "keep_id": pa.array(keep, type=pa.uint64())})


def connected_components(pairs_ds, coarse_partitions: int = COARSE_PARTITIONS,
                         max_iters: int = 25,
                         driver_merge_limit: int | None = None):
    """Connected components over a candidate-pair set.

    Below the edge-count gate (pack.DRIVER_MERGE_LIMIT) the deduped
    edge set gathers once and a path-compressed driver union-find
    labels it — exact, zero exchange rounds (each label-propagation
    round costs seconds of fixed exchange scheduling however few the
    pairs).  Above the gate: hash-to-min label propagation (Rastogi
    et al., "Finding Connected Components in Map-Reduce in Logarithmic
    Rounds") — no driver state, one coarse groupby (expand) plus one
    distinct pass per round, converging in O(log diameter) rounds to
    stars centered at each component's minimum doc id.

    -> Dataset (doc_id uint64, keep_id uint64): one row per doc
    appearing in any pair, keep_id = min doc id of its component."""
    from functools import partial

    import ray.data

    from chearch_ray.stages.pack import DRIVER_MERGE_LIMIT

    limit = DRIVER_MERGE_LIMIT if driver_merge_limit is None else driver_merge_limit
    state = pairs_ds.map_batches(_cc_seed, batch_format="pyarrow")
    state = dedup_pairs(state, coarse_partitions).materialize()
    if state.count() <= limit:
        return ray.data.from_arrow(_cc_driver_union_find(state))
    prev_sig = _state_signature(state)
    for _ in range(max_iters):
        parted = state.map_batches(
            partial(_cc_partition_u, n_partitions=coarse_partitions),
            batch_format="pyarrow",
        )
        expanded = parted.groupby("pgrp").map_groups(
            partial(drop_pgrp_then, fn=_cc_expand_partition), batch_format="pyarrow"
        )
        state = dedup_pairs(expanded, coarse_partitions).materialize()
        sig = _state_signature(state)
        if sig == prev_sig:
            break
        prev_sig = sig
    parted = state.map_batches(
        partial(_cc_partition_u, n_partitions=coarse_partitions),
        batch_format="pyarrow",
    )
    return parted.groupby("pgrp").map_groups(
        partial(drop_pgrp_then, fn=_cc_labels_partition), batch_format="pyarrow"
    )


def neardup_keep(ds, threshold: float = 0.5, text_column: str = "text", w: int = 3,
                 coarse_partitions: int = COARSE_PARTITIONS):
    """Near-dup RESOLUTION: exact Jaccard pairs -> connected
    components -> (doc_id, keep_id) with keep_id = the component's
    minimum doc id (the deterministic survivor, matching exact_dedup's
    min-doc policy).  Docs in no near-dup pair are absent (they keep
    themselves).  Composes with minhash_dedup_pairs / simhash_pairs
    output as well — any (doc_a, doc_b) Dataset feeds
    connected_components."""
    import ray.data

    pairs = jaccard_similarity_join(
        ds, threshold=threshold, text_column=text_column, w=w,
        coarse_partitions=coarse_partitions,
    ).materialize()
    if pairs.count() == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], type=pa.uint64()),
                    "keep_id": pa.array([], type=pa.uint64()),
                }
            )
        )
    return connected_components(pairs, coarse_partitions)


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


# ------------------------------------------------- exact substring dedup
def _unique_doc_grams(batch: pa.Table, text_column: str, w: int):
    """-> (gram hashes, doc row index) with per-(doc, gram) duplicates
    removed, plus the per-row doc_id array — shared by every
    substring-dedup pass."""
    h, rows = _doc_shingle_hashes(batch, text_column, w)
    doc_col = batch["doc_id"]
    if isinstance(doc_col, pa.ChunkedArray):
        doc_col = doc_col.combine_chunks()
    doc_np = doc_col.to_numpy(zero_copy_only=False).astype(np.uint64)
    if len(h) == 0:
        return h, rows, doc_np
    order = np.lexsort((h, rows))
    rows_s, h_s = rows[order], h[order]
    keep = np.ones(len(h_s), dtype=bool)
    keep[1:] = (rows_s[1:] != rows_s[:-1]) | (h_s[1:] != h_s[:-1])
    return h_s[keep], rows_s[keep], doc_np


def _gram_doc_rows(batch: pa.Table, text_column: str, w: int) -> pa.Table:
    """corpus batch -> unique (gram_j, doc_id, n_grams) rows for the
    distributed join path.  gram_j is the int64 BIT-CAST of the uint64
    rolling hash (Ray groupby/join key); n_grams is the doc's
    distinct-gram count, repeated per row so the per-doc aggregate
    after the join needs no second corpus pass."""
    h_u, rows_u, doc_np = _unique_doc_grams(batch, text_column, w)
    n_grams = np.zeros(len(batch), dtype=np.int64)
    np.add.at(n_grams, rows_u, 1)
    return pa.table(
        {
            "gram_j": pa.array(h_u.view(np.int64), type=pa.int64()),
            "doc_id": pa.array(doc_np[rows_u], type=pa.uint64()),
            "n_grams": pa.array(n_grams[rows_u], type=pa.int64()),
        }
    )


#: uint64 -> int64 ORDER-PRESERVING bijection (XOR the sign bit): Ray
#: aggregates normalize uint64 to int64, which would corrupt Min over
#: ids >= 2^63 (blake2b-64 ids exceed it half the time); the shifted
#: encoding keeps Min exact in int64 space.
_ORDER_SHIFT = np.uint64(1 << 63)


def _u64_to_ordered_i64(u: np.ndarray) -> np.ndarray:
    return (u.astype(np.uint64) ^ _ORDER_SHIFT).view(np.int64)


def _ordered_i64_to_u64(i: np.ndarray) -> np.ndarray:
    return (i.astype(np.int64).view(np.uint64)) ^ _ORDER_SHIFT


def _gram_first_partial(batch: pa.Table) -> pa.Table:
    """map-side combine for the gram-ownership groupby: (gram_j ->
    min doc, row count) per block, so the shuffle carries
    distinct-grams-per-block rows instead of (gram, doc) pairs.
    min_doc rides in the order-preserving int64 encoding."""
    g = batch["gram_j"].to_numpy()
    d = batch["doc_id"].to_numpy().astype(np.uint64)
    if len(g) == 0:
        return pa.table(
            {
                "gram_j": pa.array([], type=pa.int64()),
                "min_doc": pa.array([], type=pa.int64()),
                "n": pa.array([], type=pa.int64()),
            }
        )
    order = np.argsort(g, kind="stable")
    g_s, d_s = g[order], d[order]
    starts = np.flatnonzero(np.concatenate([[True], g_s[1:] != g_s[:-1]]))
    return pa.table(
        {
            "gram_j": pa.array(g_s[starts], type=pa.int64()),
            "min_doc": pa.array(
                _u64_to_ordered_i64(np.minimum.reduceat(d_s, starts)), type=pa.int64()
            ),
            "n": pa.array(np.diff(np.append(starts, len(g_s))), type=pa.int64()),
        }
    )


def _doc_gram_counts(batch: pa.Table, text_column: str, w: int) -> pa.Table:
    """one row per doc (INCLUDING docs with fewer than w tokens), in
    the per-doc reduce schema: (doc_j bit-cast key, n_grams,
    n_dup=0, n_earlier=0) — unioned with the dup-hit partials and
    summed per doc (an outer join replacement: Ray's left_outer
    chokes on empty right partitions, and a union + groupby-sum is
    one stage cheaper anyway)."""
    h_u, rows_u, doc_np = _unique_doc_grams(batch, text_column, w)
    n_grams = np.zeros(len(batch), dtype=np.int64)
    np.add.at(n_grams, rows_u, 1)
    zeros = np.zeros(len(batch), dtype=np.int64)
    return pa.table(
        {
            "doc_j": pa.array(doc_np.view(np.int64), type=pa.int64()),
            "n_grams": pa.array(n_grams, type=pa.int64()),
            "n_dup": pa.array(zeros, type=pa.int64()),
            "n_earlier": pa.array(zeros, type=pa.int64()),
        }
    )


def _substring_flag_batch(batch: pa.Table, dup_ref, text_column: str, w: int) -> pa.Table:
    import ray

    dup_grams, first_docs = (
        ray.get(dup_ref) if isinstance(dup_ref, ray.ObjectRef) else dup_ref
    )
    h_u, rows_u, doc_np = _unique_doc_grams(batch, text_column, w)
    n = len(batch)
    n_grams = np.zeros(n, dtype=np.int64)
    np.add.at(n_grams, rows_u, 1)
    n_dup = np.zeros(n, dtype=np.int64)
    earlier = np.zeros(n, dtype=np.int64)
    if len(dup_grams) and len(h_u):
        pos = np.searchsorted(dup_grams, h_u)
        pos_c = np.minimum(pos, len(dup_grams) - 1)
        hit = dup_grams[pos_c] == h_u
        np.add.at(n_dup, rows_u[hit], 1)
        owned_earlier = hit & (first_docs[pos_c] < doc_np[rows_u])
        np.add.at(earlier, rows_u[owned_earlier], 1)
    return pa.table(
        {
            "doc_id": pa.array(doc_np.astype(np.int64), type=pa.int64()),
            "n_grams": pa.array(n_grams, type=pa.int64()),
            "n_dup_grams": pa.array(n_dup, type=pa.int64()),
            "keep": pa.array(earlier == 0),
        }
    )


def substring_dedup(ds, w: int = 8, text_column: str = "text",
                    broadcast_limit: int = 5_000_000, join_partitions: int | None = None):
    """Exact substring-level dedup at token w-gram granularity ->
    (doc_id, n_grams, n_dup_grams, keep), one row per document.

    A doc is DROPPED (keep=false) when any of its distinct w-grams
    first appears in a lower-doc_id document — the doc-level policy of
    "Deduplicating Training Data Makes Language Models Better"-style
    exact substring dedup (the first copy of every duplicated span
    survives; later copies are flagged).  n_dup_grams counts the doc's
    grams shared with ANY other doc (direction-free), for auditing
    partial overlap.

    Scale shape: ONE token-scale shuffle — per-batch unique
    (gram, doc) rows are map-side combined to (gram -> min doc, n)
    per block, then a Ray groupby-aggregate merges gram ownership.
    Grams duplicated across docs (n >= 2) are usually a tiny fraction;
    below `broadcast_limit` they broadcast via ray.put and a second
    vectorized corpus pass flags docs (the decontaminate shape).
    Above it, the dup-gram table stays distributed: hash-join back
    onto the exploded gram rows, per-doc aggregate, left-outer join
    onto the per-doc gram counts (row-identical to the broadcast
    path; pinned by test_substring_dedup_join_path_identical)."""
    from functools import partial as _p

    import ray
    import ray.data
    from ray.data.aggregate import Min, Sum

    grams = ds.map_batches(
        _p(_gram_doc_rows, text_column=text_column, w=w), batch_format="pyarrow"
    )
    ownership = (
        grams.map_batches(_gram_first_partial, batch_format="pyarrow")
        .groupby("gram_j")
        .aggregate(Min("min_doc", alias_name="first_doc"), Sum("n", alias_name="n"))
    )
    dup = ownership.filter(expr="n >= 2").select_columns(["gram_j", "first_doc"])

    # ---- broadcast fast path: gather the dup-gram table with an
    # early bail once it provably exceeds the gate
    tables, total, over = [], 0, False
    for t in dup.iter_batches(batch_size=None, batch_format="pyarrow"):
        if len(t):
            tables.append(t)
            total += len(t)
            if total > broadcast_limit:
                over = True
                break
    if not over:
        if tables:
            t = pa.concat_tables(tables).combine_chunks()
            keys = t["gram_j"].to_numpy().view(np.uint64)
            firsts = _ordered_i64_to_u64(t["first_doc"].to_numpy())
            order = np.argsort(keys, kind="stable")
            dup_ref = ray.put((keys[order], firsts[order]))
        else:
            dup_ref = ray.put(
                (np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.uint64))
            )
        return ds.map_batches(
            _p(_substring_flag_batch, dup_ref=dup_ref, text_column=text_column, w=w),
            batch_format="pyarrow",
        )

    # ---- distributed path: dup grams inner-join back onto the gram
    # rows, then ONE per-doc groupby-sum over the union of (hit
    # partials) + (per-doc gram counts) — no outer join
    from chearch_ray.stages.partition import join_parallelism, join_remote_args

    hits = grams.join(
        dup, join_type="inner", on=("gram_j",),
        num_partitions=join_parallelism(join_partitions),
        aggregator_ray_remote_args=join_remote_args(),
    )
    hit_partials = hits.map_batches(_substring_hit_partial, batch_format="pyarrow")
    counts = ds.map_batches(
        _p(_doc_gram_counts, text_column=text_column, w=w), batch_format="pyarrow"
    )
    per_doc = (
        counts.union(hit_partials)
        .groupby("doc_j")
        .aggregate(
            Sum("n_grams", alias_name="n_grams"),
            Sum("n_dup", alias_name="n_dup_grams"),
            Sum("n_earlier", alias_name="n_earlier"),
        )
        .materialize()
    )
    return per_doc.map_batches(_substring_finalize, batch_format="pyarrow")


def _substring_hit_partial(batch: pa.Table) -> pa.Table:
    """dup-joined gram rows -> per-(doc in block) partial counts in
    the per-doc reduce schema: n_dup = dup-gram rows, n_earlier = dup
    grams whose first owner has a strictly lower id (uint64
    comparison after decoding the order-shifted first_doc),
    n_grams = 0 (the counts stream owns that term of the sum)."""
    d = batch["doc_id"].to_numpy().astype(np.uint64)
    f = _ordered_i64_to_u64(batch["first_doc"].to_numpy())
    if len(d) == 0:
        return pa.table(
            {
                "doc_j": pa.array([], type=pa.int64()),
                "n_grams": pa.array([], type=pa.int64()),
                "n_dup": pa.array([], type=pa.int64()),
                "n_earlier": pa.array([], type=pa.int64()),
            }
        )
    earlier = (f < d).astype(np.int64)
    order = np.argsort(d, kind="stable")
    d_s, e_s = d[order], earlier[order]
    starts = np.flatnonzero(np.concatenate([[True], d_s[1:] != d_s[:-1]]))
    return pa.table(
        {
            "doc_j": pa.array(d_s[starts].view(np.int64), type=pa.int64()),
            "n_grams": pa.array(np.zeros(len(starts), dtype=np.int64), type=pa.int64()),
            "n_dup": pa.array(np.diff(np.append(starts, len(d_s))), type=pa.int64()),
            "n_earlier": pa.array(np.add.reduceat(e_s, starts), type=pa.int64()),
        }
    )


def _substring_finalize(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    doc_u = batch["doc_j"].to_numpy().view(np.uint64)
    n_earlier = batch["n_earlier"].to_numpy()
    return pa.table(
        {
            "doc_id": pa.array(doc_u.astype(np.int64), type=pa.int64()),
            "n_grams": batch["n_grams"].cast(pa.int64()),
            "n_dup_grams": pc.fill_null(batch["n_dup_grams"], 0).cast(pa.int64()),
            "keep": pa.array(n_earlier == 0),
        }
    )


# ------------------------------------------- incremental (store) dedup
def _store_side_rows(batch: pa.Table, text_column: str, id_column: str | None,
                     n_partitions: int, probe: bool,
                     id_type: pa.DataType | None = None) -> pa.Table:
    """one input block -> (pgrp, content_sha, probe flag [, id]) rows.
    Partition id comes from the sha's leading 64 bits, so equal shas
    always co-locate; the membership test inside the partition runs on
    the FULL hex sha (no prefix-collision risk).  The probe (already-
    ingested) side is deduplicated map-side: one sha row per distinct
    content per block."""
    from chearch_ray.stages.partition import coarse_partition_ids

    sha = sha256_hex(batch[text_column])
    if probe:
        sha = sha.unique()
    hi = np.array([int(s[:16], 16) for s in sha.to_pylist()], dtype=np.uint64)
    cols: dict = {
        "content_sha": sha,
        "__probe": pa.array(np.full(len(sha), probe), type=pa.bool_()),
    }
    if id_column is not None:
        # the probe side carries a typed null id so the union schema
        # matches without requiring the store to have ids at all
        ids = pa.nulls(len(sha), type=id_type) if probe else batch[id_column]
        cols[id_column] = ids
    t = pa.table(cols)
    return t.append_column(
        "pgrp", pa.array(coarse_partition_ids(hi, n_partitions), type=pa.int32()))


def _store_membership_partition(group: pa.Table, id_column: str) -> pa.Table:
    import pyarrow.compute as pc

    probe = group["__probe"].to_numpy(zero_copy_only=False)
    new = group.filter(pa.array(~probe))
    if len(new) == 0:
        return pa.table({id_column: pa.array([], type=group[id_column].type),
                         "content_sha": pa.array([], type=pa.string())})
    seen = group["content_sha"].filter(pa.array(probe))
    if isinstance(seen, pa.ChunkedArray):
        seen = seen.combine_chunks()
    hit = pc.is_in(new["content_sha"], value_set=seen)
    keep = pc.invert(hit)
    out = new.filter(keep)
    return pa.table({id_column: out[id_column], "content_sha": out["content_sha"]})


def dedup_against_store(new_ds, seen_ds, text_column: str = "text",
                        id_column: str = "doc_id",
                        n_partitions: int | None = None):
    """Incremental ingest dedup: rows of `new_ds` whose exact content
    (sha256 of `text_column`) does NOT already exist in `seen_ds` —
    the every-day shape of a continuously-fed training-data pipeline,
    where each arriving shard must be checked against the corpus
    fingerprint store, not against itself.

    ONE coarse shuffle carries both sides: new rows as
    (sha, id), the store as map-side-deduplicated bare sha rows
    (one per distinct content per block — at 100 TB the store side is
    a parquet of fingerprints, so the exchange moves fingerprints
    only, never documents).  Membership is tested per partition on the
    full sha via pc.is_in.  Returns (id_column, content_sha) of the
    genuinely new rows.  NOTE: unlike `exact_dedup`, duplicates WITHIN
    `new_ds` are kept (both pass the store check); compose with
    `exact_dedup` first when intra-shard uniqueness is also required.
    """
    from functools import partial as _pp

    from chearch_ray.stages.partition import join_parallelism

    n = join_parallelism(n_partitions)
    schema = new_ds.schema()
    id_type = schema.types[schema.names.index(id_column)]
    left = new_ds.map_batches(
        _pp(_store_side_rows, text_column=text_column, id_column=id_column,
            n_partitions=n, probe=False),
        batch_format="pyarrow",
    )
    store = seen_ds.map_batches(
        _pp(_store_side_rows, text_column=text_column, id_column=id_column,
            n_partitions=n, probe=True, id_type=id_type),
        batch_format="pyarrow",
    )
    return left.union(store).groupby("pgrp").map_groups(
        _pp(_store_membership_partition, id_column=id_column),
        batch_format="pyarrow",
    )


# --------------------------------------------- boilerplate line dedup
#: a line occurring in at least this many DISTINCT docs is boilerplate
BOILERPLATE_MIN_DOCS = 10


def _line_df_partial(batch: pa.Table, text_column: str) -> pa.Table:
    """per-block (line, n) where n = number of DISTINCT docs in this
    block containing the line (docs never span blocks, so block
    partials sum to the global distinct-doc count)."""
    import pyarrow.compute as pc

    text = batch[text_column]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    lists = pc.split_pattern(pc.fill_null(text, ""), "\n")
    offsets = np.asarray(lists.offsets, dtype=np.int64)
    values = lists.values
    if offsets[0] != 0 or len(values) != offsets[-1] - offsets[0]:
        values = values.slice(offsets[0], offsets[-1] - offsets[0])
    row_idx = np.repeat(np.arange(len(lists), dtype=np.int64),
                        np.diff(offsets))
    pairs = pa.table({"line": values, "row": pa.array(row_idx, type=pa.int64())})
    distinct = pairs.group_by(["line", "row"], use_threads=False).aggregate([])
    vc = distinct["line"].combine_chunks().value_counts()
    return pa.table({"line": vc.field("values").cast(pa.string()),
                     "n": vc.field("counts").cast(pa.int64())})


def _strip_boilerplate(batch: pa.Table, text_column: str, boil_ref) -> pa.Table:
    import pyarrow.compute as pc

    import ray

    boil = ray.get(boil_ref) if not isinstance(boil_ref, pa.Array) else boil_ref
    text = batch[text_column]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    lists = pc.split_pattern(pc.fill_null(text, ""), "\n")
    offsets = np.asarray(lists.offsets, dtype=np.int64)
    values = lists.values
    if offsets[0] != 0 or len(values) != offsets[-1] - offsets[0]:
        values = values.slice(offsets[0], offsets[-1] - offsets[0])
    rel_off = offsets - offsets[0]
    keep = pc.invert(pc.is_in(values, value_set=boil))
    keep_np = keep.to_numpy(zero_copy_only=False)
    csum = np.concatenate([[0], np.cumsum(keep_np)]).astype(np.int64)
    new_off = csum[rel_off]
    kept = values.filter(keep)
    new_lists = pa.ListArray.from_arrays(
        pa.array(new_off.astype(np.int32), type=pa.int32()), kept)
    joined = pc.binary_join(new_lists.cast(pa.list_(pa.string())),
                            pa.scalar("\n", type=pa.string()))
    return pa.table({"doc_id": batch["doc_id"], "text": joined})


def boilerplate_line_dedup(ds, text_column: str = "text",
                           min_docs: int = BOILERPLATE_MIN_DOCS,
                           driver_merge_limit: int | None = None):
    """CCNet-style boilerplate removal: delete every line occurring in
    >= min_docs DISTINCT documents (headers, footers, nav chrome),
    preserving the remaining lines' order.  Returns (doc_id, text).

    Shape: one explode pass emits per-block (line, distinct-doc-count)
    partials; partials merge driver-side below the rows gate (pattern:
    pack.DRIVER_MERGE_LIMIT) or through a Ray groupby-Sum above it —
    either way only the BOILERPLATE set (<= total_lines / min_docs by
    pigeonhole) broadcasts via ray.put, and the strip is one vectorized
    map pass.  EXACT: line strings (not hashes) are the merge key."""
    from functools import partial as _pp

    import ray
    from ray.data.aggregate import Sum

    from chearch_ray.stages.pack import DRIVER_MERGE_LIMIT

    if driver_merge_limit is None:
        driver_merge_limit = DRIVER_MERGE_LIMIT
    partials = ds.map_batches(
        _pp(_line_df_partial, text_column=text_column), batch_format="pyarrow",
    ).materialize()
    boil: list[str] = []
    if partials.count() <= driver_merge_limit:
        counts: dict[str, int] = {}
        for t in partials.iter_batches(batch_size=None, batch_format="pyarrow"):
            for line, n in zip(t["line"].to_pylist(), t["n"].to_pylist()):
                counts[line] = counts.get(line, 0) + int(n)
        boil = [line for line, n in counts.items() if n >= min_docs]
    else:
        merged = partials.groupby("line").aggregate(Sum("n", alias_name="n"))
        flagged = merged.filter(expr=f"n >= {min_docs}")
        for t in flagged.iter_batches(batch_size=None, batch_format="pyarrow"):
            boil.extend(t["line"].to_pylist())
    boil_ref = ray.put(pa.array(sorted(boil), type=pa.string()))
    return ds.map_batches(
        _pp(_strip_boilerplate, text_column=text_column, boil_ref=boil_ref),
        batch_format="pyarrow",
    )


# ------------------------- exact containment join (asymmetric SSJoin)
def _containment_sides(batch: pa.Table, threshold: float, df_ref=None) -> pa.Table:
    """payload batch -> stacked PROBE + INDEX rows for the asymmetric
    containment join: probe rows are each doc's prefix (same
    |S| - ceil(t|S|) + 1 guarantee as _prefix_rows — if C(A,B) >= t
    then >= ceil(t|A|) of A's shingles are in B, so A's prefix cannot
    miss B entirely), index rows are the doc's FULL shingle set (the
    containing side must expose everything — containment has no
    symmetric prefix).  Hot shingles only explode the index side;
    with df ordering the probe prefixes hold rare shingles, keeping
    bucket cross-products near |probe| * df."""
    pref = _prefix_rows(batch, threshold, df_ref=df_ref)
    vals, off = _unpack_shingle_rows(batch["shingles"])
    counts = np.diff(off)
    doc_col = batch["doc_id"]
    if isinstance(doc_col, pa.ChunkedArray):
        doc_col = doc_col.combine_chunks()
    doc_np = doc_col.to_numpy(zero_copy_only=False).astype(np.uint64)
    full = pa.table(
        {
            "bucket": pa.array(vals, type=pa.uint64()),
            "doc_id": pa.array(np.repeat(doc_np, counts), type=pa.uint64()),
            "nsh": pa.array(np.repeat(counts.astype(np.int32), counts), type=pa.int32()),
            "side": pa.array(np.ones(len(vals), dtype=np.int8), type=pa.int8()),
        }
    )
    probe = pa.table(
        {
            "bucket": pref["bucket"],
            "doc_id": pref["doc_id"],
            "nsh": pref["nsh"],
            "side": pa.array(np.zeros(len(pref), dtype=np.int8), type=pa.int8()),
        }
    )
    return pa.concat_tables([probe, full])


def _containment_candidates_partition(group: pa.Table, threshold: float) -> pa.Table:
    """one coarse bucket partition -> DIRECTED candidate pairs
    (doc_a=probe, doc_b=index): per bucket run, probe x index rows with
    a != b and the size filter |B| >= ceil(t*|A|) (the intersection
    can never exceed |B|, exact-safe)."""
    import pyarrow.compute as pc

    if len(group) == 0:
        return pa.table(
            {"doc_a": pa.array([], type=pa.uint64()), "doc_b": pa.array([], type=pa.uint64())}
        )
    order = pc.sort_indices(
        group,
        sort_keys=[("bucket", "ascending"), ("side", "ascending"),
                   ("doc_id", "ascending")],
    )
    g = group.take(order)
    bucket = g["bucket"].to_numpy().astype(np.uint64)
    side = g["side"].to_numpy().astype(np.int8)
    docs = g["doc_id"].to_numpy().astype(np.uint64)
    nsh = g["nsh"].to_numpy().astype(np.int64)
    new_bucket = np.empty(len(g), dtype=bool)
    new_bucket[0] = True
    new_bucket[1:] = bucket[1:] != bucket[:-1]
    # dedupe (bucket, side, doc) — a doc appears once per side per bucket
    dup = np.zeros(len(g), dtype=bool)
    dup[1:] = (~new_bucket[1:]) & (side[1:] == side[:-1]) & (docs[1:] == docs[:-1])
    keep = np.flatnonzero(~dup)
    bucket, side, docs, nsh = bucket[keep], side[keep], docs[keep], nsh[keep]
    starts = np.flatnonzero(new_bucket[keep])
    bounds = np.append(starts, len(keep))
    out_a, out_b, out_na = [], [], []
    for i in range(len(starts)):
        s, e = int(bounds[i]), int(bounds[i + 1])
        if e - s < 2:
            continue
        sd = side[s:e]
        nprobe = int(np.searchsorted(sd, 1))  # side-sorted: probes first
        if nprobe == 0 or nprobe == e - s:
            continue
        pd_, pn = docs[s:s + nprobe], nsh[s:s + nprobe]
        xd, xn = docs[s + nprobe:e], nsh[s + nprobe:e]
        ia = np.repeat(np.arange(nprobe), len(xd))
        ib = np.tile(np.arange(len(xd)), nprobe)
        ok = (pd_[ia] != xd[ib]) & (
            xn[ib] >= np.ceil(threshold * pn[ia] - 1e-9).astype(np.int64)
        )
        out_a.append(pd_[ia][ok])
        out_b.append(xd[ib][ok])
    if not out_a:
        return pa.table(
            {"doc_a": pa.array([], type=pa.uint64()), "doc_b": pa.array([], type=pa.uint64())}
        )
    return pa.table(
        {
            "doc_a": pa.array(np.concatenate(out_a), type=pa.uint64()),
            "doc_b": pa.array(np.concatenate(out_b), type=pa.uint64()),
        }
    )


def _exact_containment_packed(batch: pa.Table, threshold: float) -> pa.Table:
    """candidate pairs with packed payloads -> exact containment
    C(A,B) = |A ∩ B| / |A| (one int/int double division — the SQL
    mirror computes the identical i::DOUBLE / na)."""
    a_vals, a_off = _unpack_shingle_rows(batch["shingles_a"])
    b_vals, b_off = _unpack_shingle_rows(batch["shingles"])
    n = len(batch)
    from chearch_ray.state.searcher import intersect_sorted

    cont = np.empty(n, dtype=np.float64)
    for i in range(n):  # per-PAIR loop over the small candidate set
        sa = a_vals[a_off[i]: a_off[i + 1]]
        sb = b_vals[b_off[i]: b_off[i + 1]]
        na = len(sa)
        cont[i] = len(intersect_sorted(sa, sb)) / na if na else 0.0
    keep = cont >= threshold
    mask = pa.array(keep)
    return pa.table(
        {
            "doc_a": batch["doc_a"].filter(mask) if n else pa.array([], type=pa.uint64()),
            "doc_b": batch["doc_b"].filter(mask) if n else pa.array([], type=pa.uint64()),
            "containment": pa.array(cont[keep], type=pa.float64()),
        }
    )


def containment_join(ds, threshold: float = 0.6, text_column: str = "text",
                     w: int = 3, join_partitions: int | None = None,
                     coarse_partitions: int = COARSE_PARTITIONS,
                     df_broadcast_limit: int = 5_000_000):
    """EXACT directed n-gram containment self-join: every ordered pair
    (a, b), a != b, with |shingles(a) ∩ shingles(b)| / |shingles(a)|
    >= threshold — the one-sided near-dup relation (a quote, excerpt
    or boilerplate block contained in a larger doc) that symmetric
    Jaccard misses when |b| >> |a|.

    Shape: shingle payloads once -> asymmetric prefix filter (probe
    prefixes vs FULL index sets — _containment_sides) -> one coarse
    bucket exchange -> directed candidates with the |B| >= t|A| size
    cut -> distinct pairs -> exact verification against the packed
    payloads.  Same scale contract as jaccard_similarity_join; the
    index side carries every shingle, so hot-shingle buckets are the
    cost of exactness (frequency-ordered probe prefixes keep the
    cross-products small)."""
    from functools import partial

    import ray.data

    empty = pa.table(
        {
            "doc_a": pa.array([], type=pa.uint64()),
            "doc_b": pa.array([], type=pa.uint64()),
            "containment": pa.array([], type=pa.float64()),
        }
    )
    payload = ds.map_batches(
        partial(shingle_payload, text_column=text_column, w=w),
        batch_format="pyarrow",
        batch_size=4096,
    ).materialize()
    if payload.count() == 0:
        return ray.data.from_arrow(empty)
    df_ref = _shingle_df_broadcast(payload, max_distinct=df_broadcast_limit)
    sides = payload.map_batches(
        partial(_containment_sides, threshold=threshold, df_ref=df_ref),
        batch_format="pyarrow",
    )
    parted = sides.map_batches(
        partial(add_pgrp_column, n_partitions=coarse_partitions, key="bucket"),
        batch_format="pyarrow",
    )
    pairs = parted.groupby("pgrp").map_groups(
        partial(
            drop_pgrp_then,
            fn=partial(_containment_candidates_partition, threshold=threshold),
        ),
        batch_format="pyarrow",
    )
    deduped = dedup_pairs(pairs, coarse_partitions).materialize()
    if deduped.count() == 0:
        return ray.data.from_arrow(empty)
    out = verify_pairs_by_join(
        deduped,
        payload,
        partial(_exact_containment_packed, threshold=threshold),
        payload_col="shingles",
        join_partitions=join_partitions,
    )
    return out if out is not None else ray.data.from_arrow(empty)

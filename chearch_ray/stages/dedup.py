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

    def __call__(self, batch: pa.Table) -> pa.Table:
        shingles, rows = _doc_shingle_hashes(batch, self.text_column, self.shingle_w)
        sig = self._signatures(shingles, rows, len(batch))
        doc_ids = batch["doc_id"].to_numpy()
        r = self.rows_per_band
        p = np.uint64(1099511628211)
        out_band = np.repeat(np.arange(self.bands, dtype=np.int32), len(batch))
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
                "signature": pa.array(
                    np.tile(sig, (self.bands, 1)).tolist(), type=pa.list_(pa.uint64())
                ),
            }
        )


def minhash_candidate_pairs(group: pa.Table) -> pa.Table:
    """Within one (band, bucket) group: emit unique doc pairs with the
    Jaccard estimate from full signatures.  Group sizes are bounded by
    the LSH band width; all-pairs is local and small."""
    empty = pa.table(
        {
            "doc_a": pa.array([], type=pa.int64()),
            "doc_b": pa.array([], type=pa.int64()),
            "est_jaccard": pa.array([], type=pa.float64()),
        }
    )
    if len(group) < 2:
        return empty
    doc_ids = group["doc_id"].to_numpy()
    order = np.argsort(doc_ids, kind="stable")
    # dedupe docs (same doc can land in a bucket once per band input row)
    doc_ids = doc_ids[order]
    keep = np.flatnonzero(np.diff(doc_ids, prepend=-1))
    if len(keep) < 2:
        return empty
    sigs = np.stack(
        [np.asarray(group["signature"][int(order[i])].as_py(), dtype=np.uint64) for i in keep]
    )
    ids = doc_ids[keep]
    ia, ib = np.triu_indices(len(ids), k=1)
    est = (sigs[ia] == sigs[ib]).mean(axis=1)
    return pa.table(
        {
            "doc_a": pa.array(ids[ia], type=pa.int64()),
            "doc_b": pa.array(ids[ib], type=pa.int64()),
            "est_jaccard": pa.array(est, type=pa.float64()),
        }
    )


def minhash_dedup_pairs(ds, threshold: float = 0.7, text_column: str = "text",
                        num_perm: int = 128, bands: int = 32):
    """Dataset -> candidate near-dup pairs (doc_a < doc_b, est_jaccard
    >= threshold), deduplicated across bands."""
    sigs = ds.map_batches(
        MinHashSignatures,
        fn_constructor_kwargs={"num_perm": num_perm, "bands": bands, "text_column": text_column},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=2,
        num_cpus=0.5,
    )
    pairs = sigs.groupby(["band", "bucket"]).map_groups(
        minhash_candidate_pairs, batch_format="pyarrow"
    )
    dedup = pairs.groupby(["doc_a", "doc_b"]).map_groups(
        keep_first_pair, batch_format="pyarrow"
    )
    from functools import partial

    return dedup.map_batches(
        partial(_filter_ge, column="est_jaccard", threshold=threshold), batch_format="pyarrow"
    )


def _filter_ge(batch: pa.Table, column: str, threshold: float) -> pa.Table:
    import pyarrow.compute as pc

    return batch.filter(pc.greater_equal(batch[column], threshold))


def keep_first_pair(group: pa.Table) -> pa.Table:
    return group.slice(0, 1)


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


def simhash_pairs(ds, max_hamming: int = 3, text_column: str = "text", bands: int = 4):
    """Dataset -> near-dup pairs by simhash banding: docs sharing any
    16-bit band bucket are candidates; exact Hamming check in-group."""
    sigs = ds.map_batches(
        SimHash, fn_constructor_kwargs={"text_column": text_column},
        batch_format="pyarrow", batch_size=4096, concurrency=2, num_cpus=0.5,
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

    def pairs_in_bucket(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_a": pa.array([], type=pa.int64()),
                "doc_b": pa.array([], type=pa.int64()),
                "hamming": pa.array([], type=pa.int64()),
            }
        )
        if len(group) < 2:
            return empty
        ids = group["doc_id"].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        keep = np.flatnonzero(np.diff(ids, prepend=-1))
        if len(keep) < 2:
            return empty
        ids = ids[keep]
        sh = group["simhash"].to_numpy().astype(np.uint64)[order][keep]
        ia, ib = np.triu_indices(len(ids), k=1)
        ham = hamming64(sh[ia], sh[ib]).astype(np.int64)
        ok = ham <= max_hamming
        return pa.table(
            {
                "doc_a": pa.array(ids[ia][ok], type=pa.int64()),
                "doc_b": pa.array(ids[ib][ok], type=pa.int64()),
                "hamming": pa.array(ham[ok], type=pa.int64()),
            }
        )

    exploded = sigs.map_batches(band_explode, batch_format="pyarrow")
    pairs = exploded.groupby(["band", "bucket"]).map_groups(pairs_in_bucket, batch_format="pyarrow")
    return pairs.groupby(["doc_a", "doc_b"]).map_groups(keep_first_pair, batch_format="pyarrow")


# ----------------------------------------------- exact n-gram Jaccard
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

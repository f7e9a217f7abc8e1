"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — numpy matmul per batch against a
broadcast query matrix (`ray.put` once, `ray.get` in each actor's
__init__ — never re-shipped per batch).  Scale path: LSH-bucketed
variant (random-hyperplane signatures; candidates only from matching
buckets) — at 10^12 rows the bucket groupby is the only all-to-all and
each query touches a constant number of buckets.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _embedding_matrix(col) -> np.ndarray:
    """list<float> column -> (n, d) float64 matrix, zero-copy-ish."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = np.asarray(col.values, dtype=np.float64)
    offsets = np.asarray(col.offsets)
    d = offsets[1] - offsets[0] if len(offsets) > 1 else 0
    return flat.reshape(len(col), int(d))


def normalize_rows(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return mat / norms


class BruteForceCosine:
    """Actor-pool stage: per batch, cosine of every row against the
    broadcast query matrix; emits per-(query, row) best-k candidates.

    `queries_ref` is a ray ObjectRef to a (q, d) float64 matrix (or the
    matrix itself for local/test use) — resolved ONCE in __init__.
    """

    def __init__(self, queries_ref, k: int, id_column: str = "vec_id",
                 embedding_column: str = "embedding"):
        import ray

        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.q = normalize_rows(np.asarray(q, dtype=np.float64))
        self.k = k
        self.id_column = id_column
        self.embedding_column = embedding_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = normalize_rows(_embedding_matrix(batch[self.embedding_column]))
        sims = self.q @ mat.T  # (q, n)
        ids = batch[self.id_column].to_numpy()
        k = min(self.k, sims.shape[1])
        out_q, out_id, out_sim = [], [], []
        for qi in range(sims.shape[0]):
            row = sims[qi]
            if len(row) > k:
                cut = np.argpartition(-row, k - 1)[:k]
            else:
                cut = np.arange(len(row))
            order = cut[np.lexsort((ids[cut], -row[cut]))]
            out_q.append(np.full(len(order), qi, dtype=np.int64))
            out_id.append(ids[order])
            out_sim.append(row[order])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), type=pa.int64()),
                self.id_column: pa.array(np.concatenate(out_id)),
                "sim": pa.array(np.concatenate(out_sim), type=pa.float64()),
            }
        )


def merge_topk(partials: pa.Table, k: int, id_column: str = "vec_id") -> pa.Table:
    """Merge per-batch partial top-k tables -> global top-k per query,
    ordered (sim desc, id asc).  Input is <= k rows per (query, batch) —
    driver-side merge is tiny by construction."""
    out = []
    qids = partials["query_id"].to_numpy()
    sims = partials["sim"].to_numpy()
    ids = partials[id_column].to_numpy()
    for q in np.unique(qids):
        m = qids == q
        order = np.lexsort((ids[m], -sims[m]))[:k]
        idx = np.flatnonzero(m)[order]
        out.append(partials.take(pa.array(idx, type=pa.int64())))
    return pa.concat_tables(out) if out else partials


def knn_brute_force(ds, query_matrix: np.ndarray, k: int, id_column: str = "vec_id"):
    """Dataset-level brute-force k-NN: broadcast queries, partial top-k
    per batch (streaming), tiny global merge on the driver."""
    import ray

    ref = ray.put(np.asarray(query_matrix, dtype=np.float64))
    partials = ds.map_batches(
        BruteForceCosine,
        fn_constructor_args=(ref, k, id_column),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=2,
        num_cpus=0.5,
    )
    return _gather_topk(partials, k, id_column)


def _gather_topk(partials, k: int, id_column: str) -> pa.Table:
    """shared tail for knn_brute_force / ivf_search: gather the
    per-batch partial top-k tables and merge (schema-stable empty)."""
    import ray

    tables = [t for t in (ray.get(r) for r in partials.to_arrow_refs()) if len(t)]
    if not tables:
        return pa.table(
            {"query_id": pa.array([], type=pa.int64()), id_column: pa.array([], type=pa.int64()),
             "sim": pa.array([], type=pa.float64())}
        )
    return merge_topk(pa.concat_tables(tables), k, id_column)


class HyperplaneLSH:
    """Random-hyperplane signature stage: embedding -> `bits`-bit
    signature + `bands` bucket keys.  Deterministic (seeded) planes are
    generated in __init__ once per actor."""

    def __init__(self, dim: int, bits: int = 32, bands: int = 4, seed: int = 42,
                 id_column: str = "vec_id", embedding_column: str = "embedding",
                 carry_embedding: bool = False):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((bits, dim))
        self.bits = bits
        self.bands = bands
        self.id_column = id_column
        self.embedding_column = embedding_column
        self.carry_embedding = carry_embedding

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _embedding_matrix(batch[self.embedding_column])
        proj = mat @ self.planes.T > 0  # (n, bits)
        weights = (np.uint64(1) << np.arange(self.bits, dtype=np.uint64))
        sig = (proj.astype(np.uint64) * weights).sum(axis=1, dtype=np.uint64)
        r = self.bits // self.bands
        band_mask = np.uint64((1 << r) - 1)
        n = len(batch)
        band_ids = np.repeat(np.arange(self.bands, dtype=np.int32), n)
        band_keys = np.concatenate(
            [((sig >> np.uint64(b * r)) & band_mask) for b in range(self.bands)]
        )
        ids = np.tile(batch[self.id_column].to_numpy(), self.bands)
        sigs = np.tile(sig, self.bands)
        cols = {
            "band": pa.array(band_ids, type=pa.int32()),
            "bucket": pa.array(band_keys, type=pa.uint64()),
            self.id_column: pa.array(ids),
            "signature": pa.array(sigs, type=pa.uint64()),
        }
        if self.carry_embedding:
            emb = batch[self.embedding_column]
            if isinstance(emb, pa.ChunkedArray):
                emb = emb.combine_chunks()
            idx = pa.array(np.tile(np.arange(n, dtype=np.int64), self.bands))
            cols["embedding"] = emb.take(idx)
        return pa.table(cols)


def embedding_neardup_pairs(ds, dim: int, threshold: float = 0.95, bits: int = 32,
                            bands: int = 8, id_column: str = "vec_id",
                            embedding_column: str = "embedding"):
    """Embedding-cosine near-dup pairs: hyperplane-LSH buckets ->
    exact cosine verify inside coarse bucket partitions -> distinct
    pairs with cosine >= threshold.  Same shuffle shape as the text
    LSH dedup (one 64-way coarse groupby + a pair-dedup groupby)."""
    from chearch_ray.stages.dedup import (
        _bucket_runs,
        _coarse_partition_column,
        dedup_pairs,
    )

    sigs = ds.map_batches(
        HyperplaneLSH,
        fn_constructor_kwargs={
            "dim": dim,
            "bits": bits,
            "bands": bands,
            "id_column": id_column,
            "embedding_column": embedding_column,
            "carry_embedding": True,
        },
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=2,
        num_cpus=0.5,
    )
    parted = sigs.map_batches(_coarse_partition_column, batch_format="pyarrow")

    def pairs_in_partition(group: pa.Table) -> pa.Table:
        # _bucket_runs expects a doc_id column name; alias the id col
        g = group.rename_columns(
            [("doc_id" if c == id_column else c) for c in group.column_names]
        )
        out_a, out_b, out_cos = [], [], []
        for ids, cols in _bucket_runs(g, ["embedding"]):
            emb = cols["embedding"]
            if isinstance(emb, pa.ChunkedArray):
                emb = emb.combine_chunks()
            mat = normalize_rows(_embedding_matrix(emb))
            ia, ib = np.triu_indices(len(ids), k=1)
            cos = np.einsum("ij,ij->i", mat[ia], mat[ib])
            ok = cos >= threshold
            out_a.append(ids[ia][ok])
            out_b.append(ids[ib][ok])
            out_cos.append(cos[ok])
        if not out_a:
            return pa.table(
                {
                    "doc_a": pa.array([], type=pa.uint64()),
                    "doc_b": pa.array([], type=pa.uint64()),
                    "cosine": pa.array([], type=pa.float64()),
                }
            )
        return pa.table(
            {
                "doc_a": pa.array(np.concatenate(out_a).astype(np.uint64), type=pa.uint64()),
                "doc_b": pa.array(np.concatenate(out_b).astype(np.uint64), type=pa.uint64()),
                "cosine": pa.array(np.concatenate(out_cos), type=pa.float64()),
            }
        )

    pairs = parted.groupby("pgrp").map_groups(pairs_in_partition, batch_format="pyarrow")
    return dedup_pairs(pairs)


# ----------------------------------------------------------------- IVF
def spherical_kmeans(sample: np.ndarray, n_centroids: int, iters: int = 10,
                     seed: int = 42) -> np.ndarray:
    """Deterministic spherical k-means (cosine clustering) over a
    driver-side sample — the coarse quantizer for IVF."""
    rng = np.random.default_rng(seed)
    x = normalize_rows(np.asarray(sample, dtype=np.float64))
    n = len(x)
    n_centroids = min(n_centroids, n)
    centroids = x[rng.choice(n, size=n_centroids, replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ centroids.T, axis=1)
        for c in range(n_centroids):
            members = x[assign == c]
            if len(members):
                centroids[c] = members.sum(axis=0)
        centroids = normalize_rows(centroids)
    return centroids


class IVFAssign:
    """map_batches stage: embedding -> nearest-centroid id (the IVF
    coarse assignment).  Centroids broadcast once per actor/task."""

    def __init__(self, centroids_ref, id_column: str = "vec_id",
                 embedding_column: str = "embedding"):
        import ray

        c = ray.get(centroids_ref) if isinstance(centroids_ref, ray.ObjectRef) else centroids_ref
        self.centroids = np.asarray(c, dtype=np.float64)
        self.id_column = id_column
        self.embedding_column = embedding_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = normalize_rows(_embedding_matrix(batch[self.embedding_column]))
        assign = np.argmax(mat @ self.centroids.T, axis=1).astype(np.int32)
        return batch.append_column("centroid", pa.array(assign, type=pa.int32()))


def ivf_build(ds, n_centroids: int = 16, sample_size: int = 2048, seed: int = 42,
              id_column: str = "vec_id", embedding_column: str = "embedding"):
    """-> (centroids, assigned Dataset with a `centroid` column).

    Scale path: the assigned dataset is written partitioned by
    centroid (like the index build's partitioned shuffle) so a query
    reads only its probed partitions; at sandbox scale it stays a
    Dataset."""
    import ray

    sample = ds.limit(sample_size).to_pandas()[embedding_column]
    mat = np.asarray([np.asarray(v, dtype=np.float64) for v in sample])
    centroids = spherical_kmeans(mat, n_centroids, seed=seed)
    ref = ray.put(centroids)
    assigned = ds.map_batches(
        IVFAssign, fn_constructor_args=(ref,),
        fn_constructor_kwargs={"id_column": id_column, "embedding_column": embedding_column},
        batch_format="pyarrow", batch_size=4096, concurrency=2, num_cpus=0.5,
    )
    return centroids, assigned


def ivf_search(assigned_ds, centroids: np.ndarray, query_matrix: np.ndarray,
               k: int = 10, nprobe: int = 4, id_column: str = "vec_id"):
    """Approximate k-NN: probe only the `nprobe` centroids nearest to
    each query; brute-force cosine within the probed partitions."""
    import ray

    q = normalize_rows(np.asarray(query_matrix, dtype=np.float64))
    probes = np.argsort(-(q @ centroids.T), axis=1)[:, :nprobe]
    wanted = np.unique(probes)

    def in_probed(batch: pa.Table) -> pa.Table:
        mask = np.isin(batch["centroid"].to_numpy(), wanted)
        return batch.filter(pa.array(mask))

    filtered = assigned_ds.map_batches(in_probed, batch_format="pyarrow")
    ref = ray.put(q)
    partials = filtered.map_batches(
        BruteForceCosine, fn_constructor_args=(ref, k, id_column),
        batch_format="pyarrow", batch_size=4096, concurrency=2, num_cpus=0.5,
    )
    return _gather_topk(partials, k, id_column)

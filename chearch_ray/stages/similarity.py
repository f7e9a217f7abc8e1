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

from chearch_ray.stages.partition import fmix_mix


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
                 embedding_column: str = "embedding", query_ids=None):
        import ray

        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.q = normalize_rows(np.asarray(q, dtype=np.float64))
        self.k = k
        self.id_column = id_column
        self.embedding_column = embedding_column
        # global query ids for the rows of a SUB-matrix (per-centroid
        # IVF routing); None -> positional ids
        self.query_ids = (
            np.arange(len(self.q), dtype=np.int64)
            if query_ids is None
            else np.asarray(query_ids, dtype=np.int64)
        )

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
            out_q.append(np.full(len(order), self.query_ids[qi], dtype=np.int64))
            out_id.append(ids[order])
            out_sim.append(row[order])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), type=pa.int64()),
                self.id_column: pa.array(np.concatenate(out_id)),
                "sim": pa.array(np.concatenate(out_sim), type=pa.float64()),
            }
        )


def _bf_cosine_task(batch: pa.Table, queries_ref, k: int, id_column: str,
                    query_ids) -> pa.Table:
    """stateless task form of BruteForceCosine (broadcast ref resolves
    zero-copy from the local object store per task) — used where a
    reserved actor pool could starve small clusters."""
    return BruteForceCosine(queries_ref, k, id_column, query_ids=query_ids)(batch)


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
    per batch (streaming), tiny global merge on the driver.

    TASK form, not an actor pool: `ray.get` of the broadcast matrix is
    a zero-copy local plasma read per task, and a reserved pool can
    starve small clusters that already host searcher actors."""
    from functools import partial as _p

    import ray

    ref = ray.put(np.asarray(query_matrix, dtype=np.float64))
    partials = ds.map_batches(
        _p(_bf_cosine_task, queries_ref=ref, k=k, id_column=id_column, query_ids=None),
        batch_format="pyarrow",
        batch_size=4096,
    )
    return _gather_topk(partials, k, id_column)


def _gather_topk(partials, k: int, id_column: str, combine_blocks: int = 8) -> pa.Table:
    """shared tail for knn_brute_force / ivf_search: tree-combine the
    per-batch partial top-k tables INSIDE the dataset (repartition to
    `combine_blocks` blocks, per-block merge) so the driver gathers at
    most combine_blocks x queries x k rows however many input batches
    existed — then one tiny final merge (schema-stable empty)."""
    from functools import partial as _partial

    import ray

    if partials is not None:
        partials = partials.repartition(combine_blocks).map_batches(
            _partial(merge_topk, k=k, id_column=id_column),
            batch_format="pyarrow",
            batch_size=None,  # whole blocks: one merge per block
        )
    tables = (
        []
        if partials is None
        else [t for t in (ray.get(r) for r in partials.to_arrow_refs()) if len(t)]
    )
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


def pack_embeddings(batch: pa.Table, id_column: str = "vec_id",
                    embedding_column: str = "embedding") -> pa.Table:
    """embedding list<float> -> (doc_id uint64, emb fixed_size_binary)
    with rows L2-NORMALIZED float64 — the joinable per-doc payload for
    distributed pair verification (cosine = dot of unpacked rows)."""
    mat = np.ascontiguousarray(normalize_rows(_embedding_matrix(batch[embedding_column])))
    width = mat.shape[1] * 8
    arr = pa.FixedSizeBinaryArray.from_buffers(
        pa.binary(width), len(mat), [None, pa.py_buffer(mat.tobytes())]
    )
    ids = batch[id_column]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    return pa.table(
        {"doc_id": ids.cast(pa.uint64()), "emb": arr}
    )


def _unpack_embeddings(col, dim: int) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(col) == 0:
        return np.empty((0, dim))
    flat = np.frombuffer(col.buffers()[1], dtype=np.float64)
    start = col.offset * dim
    return flat[start : start + len(col) * dim].reshape(len(col), dim)


def _cosine_verify_packed(batch: pa.Table, dim: int, threshold: float) -> pa.Table:
    a = _unpack_embeddings(batch["emb_a"], dim)
    b = _unpack_embeddings(batch["emb"], dim)
    cos = np.einsum("ij,ij->i", a, b) if len(batch) else np.empty(0)
    keep = cos >= threshold
    mask = pa.array(keep)
    return pa.table(
        {
            "doc_a": batch["doc_a"].filter(mask) if len(batch) else pa.array([], type=pa.uint64()),
            "doc_b": batch["doc_b"].filter(mask) if len(batch) else pa.array([], type=pa.uint64()),
            "cosine": pa.array(cos[keep], type=pa.float64()),
        }
    )


def embedding_neardup_pairs(ds, dim: int, threshold: float = 0.95, bits: int = 32,
                            bands: int = 8, id_column: str = "vec_id",
                            embedding_column: str = "embedding",
                            join_partitions: int = 8,
                            coarse_partitions: int | None = None):
    """Embedding-cosine near-dup pairs: hyperplane-LSH buckets ->
    distinct candidate pairs -> exact cosine verify via a hash join
    against the packed-embedding dataset.

    100-TB shuffle shape: the bucket groupby ships ONLY light
    (band, bucket, doc_id) rows — the embedding payload never rides
    the ×bands band explosion; each embedding crosses the wire once
    per pair side in the (small) verification join."""
    from functools import partial

    import ray.data

    from chearch_ray.stages.dedup import (
        _coarse_partition_column,
        candidate_pairs_in_partition,
        dedup_pairs,
        verify_pairs_by_join,
    )

    emb_ds = ds.map_batches(
        partial(pack_embeddings, id_column=id_column, embedding_column=embedding_column),
        batch_format="pyarrow",
        batch_size=4096,
    ).materialize()
    empty = pa.table(
        {
            "doc_a": pa.array([], type=pa.uint64()),
            "doc_b": pa.array([], type=pa.uint64()),
            "cosine": pa.array([], type=pa.float64()),
        }
    )
    if emb_ds.count() == 0:
        return ray.data.from_arrow(empty)

    sigs = ds.map_batches(
        HyperplaneLSH,
        fn_constructor_kwargs={
            "dim": dim,
            "bits": bits,
            "bands": bands,
            "id_column": id_column,
            "embedding_column": embedding_column,
        },
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=2,
        num_cpus=0.5,
    )

    def light_rows(batch: pa.Table) -> pa.Table:
        # light band rows under the bucket-run column contract (doc_id)
        return pa.table(
            {
                "band": batch["band"],
                "bucket": batch["bucket"],
                "doc_id": batch[id_column].cast(pa.uint64()),
            }
        )

    from chearch_ray.stages.dedup import COARSE_PARTITIONS

    n_coarse = coarse_partitions or COARSE_PARTITIONS
    parted = sigs.map_batches(light_rows, batch_format="pyarrow").map_batches(
        partial(_coarse_partition_column, n_partitions=n_coarse),
        batch_format="pyarrow",
    )
    pairs = parted.groupby("pgrp").map_groups(
        candidate_pairs_in_partition, batch_format="pyarrow"
    )
    deduped = dedup_pairs(pairs, n_coarse).materialize()
    if deduped.count() == 0:
        return ray.data.from_arrow(empty)
    verified = verify_pairs_by_join(
        deduped,
        emb_ds,
        partial(_cosine_verify_packed, dim=dim, threshold=threshold),
        payload_col="emb",
        join_partitions=join_partitions,
    )
    return verified if verified is not None else ray.data.from_arrow(empty)


# --------------------------------------- exact all-pairs cosine join
def _allpairs_task(batch: pa.Table, mat_ref, ids_ref, threshold: float,
                   id_column: str, embedding_column: str = "embedding") -> pa.Table:
    """one batch vs the broadcast corpus matrix: emit pairs (a < b,
    cosine >= threshold).  Each unordered pair is emitted exactly once
    — by the batch holding its smaller id."""
    import ray

    full = ray.get(mat_ref) if isinstance(mat_ref, ray.ObjectRef) else mat_ref
    all_ids = ray.get(ids_ref) if isinstance(ids_ref, ray.ObjectRef) else ids_ref
    mat = normalize_rows(_embedding_matrix(batch[embedding_column]))
    ids = batch[id_column].to_numpy()
    sims = mat @ full.T  # (batch, n)
    keep = (sims >= threshold) & (ids[:, None] < all_ids[None, :])
    bi, fj = np.nonzero(keep)
    return pa.table(
        {
            "doc_a": pa.array(ids[bi].astype(np.int64), type=pa.int64()),
            "doc_b": pa.array(all_ids[fj].astype(np.int64), type=pa.int64()),
            "cosine": pa.array(sims[bi, fj], type=pa.float64()),
        }
    )


def embedding_allpairs_exact(ds, threshold: float, id_column: str = "vec_id",
                             embedding_column: str = "embedding",
                             max_broadcast_rows: int = 2_000_000):
    """EXACT all-pairs cosine join: every pair with cosine >=
    threshold, no LSH recall involved — the exact baseline mirror of
    knn_brute_force (broadcast matrix, per-batch matmul, pair emitted
    once by its smaller id's batch).

    Applicability gate: the normalized corpus matrix is broadcast via
    ray.put (n x d float64), so this is the baseline for corpora whose
    matrix fits the object store (~1 GB at 2M x 64d) — the honest
    shape for low thresholds, where ANY exact method must consider
    most pairs.  For high thresholds at web scale use
    embedding_neardup_pairs (hyperplane LSH buckets, approximate
    recall) — documented tradeoff, not a silent one."""
    from functools import partial as _p

    import ray
    import ray.data

    # materialize ONCE: the blocks feed both the broadcast gather and
    # the map_batches pass (mapping the original lazy ds would re-run
    # the whole upstream read a second time)
    mds = ds.materialize()
    rows = []
    for t in (ray.get(r) for r in mds.to_arrow_refs()):
        if len(t):
            rows.append(t.select([id_column, embedding_column]))
    empty = pa.table(
        {
            "doc_a": pa.array([], type=pa.int64()),
            "doc_b": pa.array([], type=pa.int64()),
            "cosine": pa.array([], type=pa.float64()),
        }
    )
    if not rows:
        return ray.data.from_arrow(empty)
    corpus = pa.concat_tables(rows).combine_chunks()
    if len(corpus) > max_broadcast_rows:
        raise ValueError(
            f"embedding_allpairs_exact is the broadcast baseline; "
            f"{len(corpus)} rows > max_broadcast_rows={max_broadcast_rows} "
            f"— use embedding_neardup_pairs (LSH) at this scale"
        )
    full = normalize_rows(_embedding_matrix(corpus[embedding_column]))
    all_ids = corpus[id_column].to_numpy()
    mat_ref = ray.put(np.ascontiguousarray(full))
    ids_ref = ray.put(all_ids)
    out = mds.map_batches(
        _p(_allpairs_task, mat_ref=mat_ref, ids_ref=ids_ref,
           threshold=threshold, id_column=id_column,
           embedding_column=embedding_column),
        batch_format="pyarrow",
        batch_size=4096,
    )
    return out


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


def _sample_partial(batch: pa.Table, sample_size: int, id_column: str,
                    embedding_column: str) -> pa.Table:
    """batch-local bottom-k by a mixed id hash: the per-batch half of
    the deterministic order-statistic sample."""
    ids = batch[id_column].to_numpy().astype(np.int64).view(np.uint64)
    mixed = fmix_mix(ids)
    mixed = mixed ^ (mixed >> np.uint64(29))
    k = min(sample_size, len(batch))
    cut = np.argpartition(mixed, k - 1)[:k] if len(batch) > k else np.arange(len(batch))
    take = pa.array(np.sort(cut), type=pa.int64())
    emb = batch[embedding_column]
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    return pa.table(
        {
            "skey": pa.array(mixed[np.sort(cut)], type=pa.uint64()),
            embedding_column: emb.take(take),
        }
    )


def sample_embeddings(ds, sample_size: int, id_column: str = "vec_id",
                      embedding_column: str = "embedding") -> np.ndarray:
    """Deterministic uniform sample of `sample_size` embeddings: the
    bottom-k rows by a mixed hash of the id column (an order-statistic
    sample — independent of block order/partitioning, so the result is
    identical however the dataset is laid out).  Per-batch partial
    bottom-k keeps the driver gather at k x combine_blocks rows.

    Replaces `ds.limit(n)` for quantizer training: first-N in block
    order sees one region of a sorted/clustered corpus (the common
    layout at scale) and collapses partition balance."""
    from functools import partial as _p

    partials = ds.map_batches(
        _p(_sample_partial, sample_size=sample_size, id_column=id_column,
           embedding_column=embedding_column),
        batch_format="pyarrow",
        batch_size=4096,
    ).repartition(8).map_batches(
        _p(_sample_combine, sample_size=sample_size, embedding_column=embedding_column),
        batch_format="pyarrow",
        batch_size=None,  # whole blocks: one combine per block
    )
    tables = [
        t for t in partials.iter_batches(batch_size=None, batch_format="pyarrow") if len(t)
    ]
    if not tables:
        return np.empty((0, 0))
    merged = _sample_combine(
        pa.concat_tables(tables).combine_chunks(), sample_size, embedding_column
    )
    # the bottom-k SET is layout-independent, but _sample_combine keeps
    # block-concatenation order — sort by skey so the matrix ROW order
    # (and hence seeded k-means) is identical however ds is laid out
    merged = merged.sort_by("skey")
    return _embedding_matrix(merged[embedding_column])


def _sample_combine(batch: pa.Table, sample_size: int, embedding_column: str) -> pa.Table:
    keys = batch["skey"].to_numpy().astype(np.uint64)
    k = min(sample_size, len(batch))
    if len(batch) > k:
        cut = np.sort(np.argpartition(keys, k - 1)[:k])
    else:
        cut = np.arange(len(batch))
    emb = batch[embedding_column]
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    take = pa.array(cut, type=pa.int64())
    return pa.table(
        {"skey": pa.array(keys[cut], type=pa.uint64()), embedding_column: emb.take(take)}
    )


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
              id_column: str = "vec_id", embedding_column: str = "embedding",
              index_dir: str | None = None):
    """-> (centroids, assigned Dataset with a `centroid` column).

    With `index_dir` the assigned dataset is WRITTEN centroid-
    partitioned (hive layout `vectors/centroid=N/`) and the centroids
    are persisted next to it — the layout `ivf_search` prunes against.
    Without it the assignment stays an in-memory Dataset (test path)."""
    import ray

    # deterministic hash-bottom-k sample, NOT limit(n): first-N in
    # block order is biased on sorted/clustered corpora (quantizer
    # would see one region and partition balance collapses)
    mat = sample_embeddings(
        ds, sample_size, id_column=id_column, embedding_column=embedding_column
    )
    centroids = spherical_kmeans(mat, n_centroids, seed=seed)
    ref = ray.put(centroids)
    assigned = ds.map_batches(
        IVFAssign, fn_constructor_args=(ref,),
        fn_constructor_kwargs={"id_column": id_column, "embedding_column": embedding_column},
        batch_format="pyarrow", batch_size=4096, concurrency=2, num_cpus=0.5,
    )
    if index_dir is not None:
        import os
        import shutil

        import pyarrow.parquet  # noqa: F401 — enables pa.parquet below

        # clear any previous build: write_parquet appends uniquely-named
        # files and stale centroid=N dirs would otherwise survive, so a
        # rebuild would serve duplicated / deleted vectors
        shutil.rmtree(os.path.join(index_dir, "vectors"), ignore_errors=True)
        stale = os.path.join(index_dir, "centroids.parquet")
        if os.path.exists(stale):
            os.remove(stale)
        assigned.write_parquet(
            os.path.join(index_dir, "vectors"), partition_cols=["centroid"]
        )
        pa.parquet.write_table(
            pa.table(
                {
                    "centroid": pa.array(np.arange(len(centroids), dtype=np.int32)),
                    "vector": pa.array(centroids.tolist(), type=pa.list_(pa.float64())),
                }
            ),
            os.path.join(index_dir, "centroids.parquet"),
        )
    return centroids, assigned


def ivf_load_centroids(index_dir: str) -> np.ndarray:
    import os

    import pyarrow.parquet  # noqa: F401

    t = pa.parquet.read_table(os.path.join(index_dir, "centroids.parquet"))
    return _embedding_matrix(t["vector"])


def ivf_probed_paths(index_dir: str, wanted: np.ndarray) -> list[str]:
    """existing hive partition dirs for the probed centroid ids — the
    ONLY paths a pruned search reads."""
    import os

    out = []
    for c in wanted.tolist():
        p = os.path.join(index_dir, "vectors", f"centroid={c}")
        if os.path.isdir(p):
            out.append(p)
    return out


def ivf_search(assigned, centroids_or_queries, query_matrix=None,
               k: int = 10, nprobe: int = 4, id_column: str = "vec_id"):
    """Approximate k-NN with PER-QUERY partition routing: each query
    probes its `nprobe` nearest centroids, and each probed centroid's
    vectors are scored ONLY against the queries that probed it (true
    IVF semantics — a query never sees partitions it did not probe).

    Two forms:
      ivf_search(index_dir, query_matrix, k=..., nprobe=...) — the
        scale path: loads centroids from the index dir and READS ONLY
        the probed `centroid=N` parquet partitions (partition pruning
        at the read, nothing else leaves storage).
      ivf_search(assigned_ds, centroids, query_matrix, ...) —
        in-memory form over an assigned Dataset (same routing, same
        results).
    """
    import os

    import ray
    import ray.data

    if isinstance(assigned, str):
        index_dir = assigned
        query_matrix = centroids_or_queries
        centroids = ivf_load_centroids(index_dir)
    else:
        centroids = centroids_or_queries
    q = normalize_rows(np.asarray(query_matrix, dtype=np.float64))
    probes = np.argsort(-(q @ centroids.T), axis=1)[:, :nprobe]
    wanted = np.unique(probes)

    per_centroid = []  # (centroid, sub-dataset of its vectors)
    if isinstance(assigned, str):
        for c in wanted.tolist():
            paths = ivf_probed_paths(assigned, np.array([c]))
            if not paths:
                continue
            files = [
                os.path.join(p, f)
                for p in paths
                for f in sorted(os.listdir(p))
                if f.endswith(".parquet")
            ]
            per_centroid.append(
                (c, ray.data.read_parquet(files, columns=[id_column, "embedding"]))
            )
    else:
        # in-memory path: ONE pass over the assigned dataset; each
        # batch routes its rows to the centroids present in it and
        # scores them against only the queries probing that centroid
        from functools import partial as _p

        routing = {
            int(c): np.flatnonzero((probes == c).any(axis=1)) for c in wanted.tolist()
        }
        ref_all = ray.put(np.ascontiguousarray(q))
        partials = assigned.map_batches(
            _p(_ivf_route_batch, queries_ref=ref_all, routing=routing,
               k=k, id_column=id_column),
            batch_format="pyarrow",
            batch_size=4096,
        )
        return _gather_topk(partials, k, id_column)

    if not per_centroid:
        return _gather_topk(None, k, id_column)

    from functools import partial as _p

    partial_sets = []
    for c, sub in per_centroid:
        qids = np.flatnonzero((probes == c).any(axis=1))
        ref = ray.put(np.ascontiguousarray(q[qids]))
        # TASK-based stage: a union of per-centroid actor pools would
        # reserve CPUs per stage and starve small clusters
        partial_sets.append(
            sub.map_batches(
                _p(_bf_cosine_task, queries_ref=ref, k=k,
                   id_column=id_column, query_ids=qids),
                batch_format="pyarrow",
                batch_size=4096,
            )
        )
    partials = partial_sets[0]
    for extra in partial_sets[1:]:
        partials = partials.union(extra)
    return _gather_topk(partials, k, id_column)


def _ivf_route_batch(batch: pa.Table, queries_ref, routing: dict, k: int,
                     id_column: str) -> pa.Table:
    """one-pass per-batch IVF routing: for each probed centroid with
    rows in this batch, score those rows against that centroid's
    queries only (same results as per-centroid sub-datasets)."""
    import ray

    q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
    cents = batch["centroid"].to_numpy()
    outs = []
    for c, qids in routing.items():
        mask = cents == c
        if not mask.any() or len(qids) == 0:
            continue
        sub = batch.filter(pa.array(mask))
        outs.append(
            BruteForceCosine(q[qids], k, id_column, query_ids=qids)(sub)
        )
    if not outs:
        return pa.table(
            {
                "query_id": pa.array([], type=pa.int64()),
                id_column: pa.array([], type=pa.int64()),
                "sim": pa.array([], type=pa.float64()),
            }
        )
    return pa.concat_tables(outs)


# ------------------------------------------------------------------ PQ
# Product quantization (Jegou et al., "Product Quantization for
# Nearest Neighbor Search", TPAMI 2011): the memory-compression ANN
# path.  64-dim float32 vectors (256 B) compress to m uint8 codes
# (m bytes, 32x at m=8) so the code table for 10^12 vectors fits in a
# cluster's aggregate RAM; search is asymmetric distance computation
# (ADC) — one [m, n_codes] inner-product lookup table per query, then
# a table-gather + sum per code row, no float vector math per row.


def _train_books(sample: np.ndarray, m: int, n_codes: int, seed: int,
                 iters: int) -> np.ndarray:
    """sub-quantizer codebooks [m, n_codes, d/m] over a driver-side
    sample matrix (NOT normalized here — residual training passes
    un-normalized residuals); plain Lloyd k-means per subvector,
    seeded -> reproducible."""
    d = sample.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    books = np.empty((m, min(n_codes, len(sample)), sub), dtype=np.float64)
    rng = np.random.default_rng(seed)
    for j in range(m):
        x = sample[:, j * sub : (j + 1) * sub]
        kk = min(n_codes, len(x))
        cents = x[rng.choice(len(x), size=kk, replace=False)]
        for _ in range(iters):
            d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(kk):
                members = x[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books[j, :kk] = cents
    return books


def pq_train(ds, m: int = 8, n_codes: int = 256, sample_size: int = 2048,
             seed: int = 42, iters: int = 12,
             id_column: str = "vec_id", embedding_column: str = "embedding") -> np.ndarray:
    """sub-quantizer codebooks [m, n_codes, d/m] from a deterministic
    order-statistic sample (same sampler as the IVF coarse quantizer)."""
    sample = normalize_rows(
        sample_embeddings(ds, sample_size, id_column, embedding_column)
    )
    return _train_books(sample, m, n_codes, seed, iters)


class PQEncode:
    """vectors -> m uint8 codes per row (binary column `pq_code`).
    Codebooks resolve once per actor from the local object store.

    With `centroids_ref` set, the RESIDUAL (normalized vector minus
    its assigned IVF centroid, from the batch's `centroid` column) is
    coded instead of the vector itself — cluster-local resolution, the
    IVFADC variant of Jegou et al. 2011 §III-C.  The argmin formula is
    unchanged: ||x||^2 drops out of argmin ||x-c||^2 whether or not x
    is unit-norm."""

    def __init__(self, books_ref, id_column: str = "vec_id",
                 embedding_column: str = "embedding", centroids_ref=None):
        import ray

        self.books = (
            ray.get(books_ref) if isinstance(books_ref, ray.ObjectRef) else books_ref
        )
        self.centroids = None
        if centroids_ref is not None:
            c = (
                ray.get(centroids_ref)
                if isinstance(centroids_ref, ray.ObjectRef)
                else centroids_ref
            )
            self.centroids = np.asarray(c, dtype=np.float64)
        self.id_column = id_column
        self.embedding_column = embedding_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = normalize_rows(_embedding_matrix(batch[self.embedding_column]))
        if self.centroids is not None:
            mat = mat - self.centroids[batch["centroid"].to_numpy()]
        m, kk, sub = self.books.shape
        codes = np.empty((len(mat), m), dtype=np.uint8)
        for j in range(m):
            x = mat[:, j * sub : (j + 1) * sub]
            # argmin ||x-c||^2 == argmax (x.c - ||c||^2/2); ||x||^2 drops
            scores = x @ self.books[j].T - 0.5 * (self.books[j] ** 2).sum(axis=1)
            codes[:, j] = np.argmax(scores, axis=1)
        raw = codes.tobytes()
        return pa.table(
            {
                self.id_column: batch[self.id_column].cast(pa.int64()),
                "pq_code": pa.array(
                    [raw[i * m : (i + 1) * m] for i in range(len(mat))], type=pa.binary()
                ),
            }
        )


def pq_encode(ds, books: np.ndarray, id_column: str = "vec_id",
              embedding_column: str = "embedding"):
    import ray

    books_ref = ray.put(books)
    return ds.map_batches(
        PQEncode(books_ref, id_column, embedding_column),
        batch_format="pyarrow",
        batch_size=4096,
    )


def _pq_search_batch(batch: pa.Table, lut_ref, k: int, id_column: str) -> pa.Table:
    import ray

    lut = ray.get(lut_ref) if isinstance(lut_ref, ray.ObjectRef) else lut_ref
    nq, m, kk = lut.shape
    code_col = batch["pq_code"]
    if isinstance(code_col, pa.ChunkedArray):
        code_col = code_col.combine_chunks()
    buf = np.frombuffer(b"".join(code_col.to_pylist()), dtype=np.uint8)
    codes = buf.reshape(-1, m)
    ids = batch[id_column].to_numpy().astype(np.int64)
    outs_q, outs_i, outs_s = [], [], []
    for q in range(nq):
        # ADC: score = sum_j lut[q, j, code_j]
        s = np.zeros(len(codes), dtype=np.float64)
        for j in range(m):
            s += lut[q, j][codes[:, j]]
        kq = min(k, len(s))
        top = np.argpartition(-s, kq - 1)[:kq] if len(s) > kq else np.arange(len(s))
        order = top[np.lexsort((ids[top], -s[top]))]
        outs_q.append(np.full(len(order), q, dtype=np.int64))
        outs_i.append(ids[order])
        outs_s.append(s[order])
    return pa.table(
        {
            "query_id": pa.array(np.concatenate(outs_q), type=pa.int64()),
            id_column: pa.array(np.concatenate(outs_i), type=pa.int64()),
            "sim": pa.array(np.concatenate(outs_s), type=pa.float64()),
        }
    )


def pq_search(codes_ds, books: np.ndarray, query_matrix: np.ndarray, k: int,
              id_column: str = "vec_id"):
    """ADC top-k over the PQ codes Dataset: broadcast one [q, m,
    n_codes] inner-product LUT, per-batch partial top-k, tree-combined
    merge (same tail as knn_brute_force).  Returns (query_id, vec_id,
    sim) with sim = the quantized cosine estimate."""
    from functools import partial as _p

    import ray

    q = normalize_rows(np.asarray(query_matrix, dtype=np.float64))
    m, kk, sub = books.shape
    # lut[q, j, c] = <query_q's j-th subvector, codebook_j[c]>
    lut = np.stack(
        [q[:, j * sub : (j + 1) * sub] @ books[j].T for j in range(m)], axis=1
    )
    lut_ref = ray.put(np.ascontiguousarray(lut))
    partials = codes_ds.map_batches(
        _p(_pq_search_batch, lut_ref=lut_ref, k=k, id_column=id_column),
        batch_format="pyarrow",
        batch_size=8192,
    )
    return _gather_topk(partials, k, id_column)


# -------------------------------------------------------------- IVF-PQ
# The composed trillion-scale recipe (Jegou et al. 2011 §V): IVF
# routes each query to nprobe coarse partitions, PQ codes make each
# partition's residency 8 bytes/vector — search touches nprobe/n_cent
# of the corpus AND never materializes a float vector.


class _PQEncodeKeep(PQEncode):
    """PQEncode that carries extra columns through (the IVF `centroid`
    routing column)."""

    def __init__(self, books_ref, keep: tuple, **kw):
        super().__init__(books_ref, **kw)
        self.keep = keep

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = super().__call__(batch)
        for col in self.keep:
            out = out.append_column(col, batch[col])
        return out


def ivfpq_build(ds, n_centroids: int = 16, m: int = 8, n_codes: int = 256,
                sample_size: int = 2048, seed: int = 42,
                id_column: str = "vec_id", embedding_column: str = "embedding",
                residual: bool = False):
    """-> (centroids, codebooks, codes Dataset with (id, pq_code,
    centroid)).  One IVF assignment pass + one PQ encode pass; both
    quantizers train on the same deterministic sample.

    residual=True codes x - centroid[assign(x)] instead of x (IVFADC):
    the codebooks spend their resolution on the cluster-local
    displacement, which is much smaller than the vector itself, so the
    quantization error drops at the same code budget.  Search must add
    the <query, centroid> offset back (ivfpq_search(residual=True))."""
    import ray

    centroids, assigned = ivf_build(
        ds, n_centroids, sample_size, seed,
        id_column=id_column, embedding_column=embedding_column,
    )
    if residual:
        # train on the SAME deterministic sample, displaced by each
        # sampled vector's own coarse assignment
        mat = normalize_rows(
            sample_embeddings(ds, sample_size, id_column, embedding_column)
        )
        assign = np.argmax(mat @ centroids.T, axis=1)
        books = _train_books(mat - centroids[assign], m, n_codes, seed, iters=12)
    else:
        books = pq_train(ds, m, n_codes, sample_size, seed,
                         id_column=id_column, embedding_column=embedding_column)
    books_ref = ray.put(books)
    cents_ref = ray.put(centroids) if residual else None
    codes = assigned.map_batches(
        _PQEncodeKeep(books_ref, keep=("centroid",),
                      id_column=id_column, embedding_column=embedding_column,
                      centroids_ref=cents_ref),
        batch_format="pyarrow",
        batch_size=4096,
    )
    return centroids, books, codes


def _ivfpq_route_batch(batch: pa.Table, lut_ref, routing: dict, k: int,
                       id_column: str, offsets: np.ndarray | None = None) -> pa.Table:
    import ray

    lut = ray.get(lut_ref) if isinstance(lut_ref, ray.ObjectRef) else lut_ref
    nq, m, kk = lut.shape
    code_col = batch["pq_code"]
    if isinstance(code_col, pa.ChunkedArray):
        code_col = code_col.combine_chunks()
    codes = np.frombuffer(b"".join(code_col.to_pylist()), dtype=np.uint8).reshape(-1, m)
    ids = batch[id_column].to_numpy().astype(np.int64)
    cents = batch["centroid"].to_numpy()
    outs_q, outs_i, outs_s = [], [], []
    for c, qids in routing.items():
        mask = cents == c
        if not mask.any() or len(qids) == 0:
            continue
        sub_codes, sub_ids = codes[mask], ids[mask]
        for q in qids.tolist():
            # residual mode: sim = <q, centroid_c> + <q, residual-hat>
            base = 0.0 if offsets is None else float(offsets[q, c])
            s = np.full(len(sub_codes), base, dtype=np.float64)
            for j in range(m):
                s += lut[q, j][sub_codes[:, j]]
            kq = min(k, len(s))
            top = np.argpartition(-s, kq - 1)[:kq] if len(s) > kq else np.arange(len(s))
            order = top[np.lexsort((sub_ids[top], -s[top]))]
            outs_q.append(np.full(len(order), q, dtype=np.int64))
            outs_i.append(sub_ids[order])
            outs_s.append(s[order])
    if not outs_q:
        return pa.table(
            {"query_id": pa.array([], type=pa.int64()),
             id_column: pa.array([], type=pa.int64()),
             "sim": pa.array([], type=pa.float64())}
        )
    return pa.table(
        {
            "query_id": pa.array(np.concatenate(outs_q), type=pa.int64()),
            id_column: pa.array(np.concatenate(outs_i), type=pa.int64()),
            "sim": pa.array(np.concatenate(outs_s), type=pa.float64()),
        }
    )


def ivfpq_search(codes_ds, centroids: np.ndarray, books: np.ndarray,
                 query_matrix: np.ndarray, k: int = 10, nprobe: int = 4,
                 id_column: str = "vec_id", residual: bool = False):
    """routed ADC top-k: each query scores ONLY the codes of its
    nprobe nearest coarse partitions (true IVF semantics), with the
    same broadcast LUT + partial-top-k + tree-combined merge tail as
    pq_search.  With nprobe = n_centroids this is exactly pq_search
    over the full code set (pinned by test).

    residual=True matches an ivfpq_build(residual=True) index: the ADC
    sum scores the coded residual, and the per-(query, centroid)
    <q, centroid> offset is added back (a tiny [nq, n_centroids]
    matrix that rides the task closure)."""
    from functools import partial as _p

    import ray

    q = normalize_rows(np.asarray(query_matrix, dtype=np.float64))
    m, kk, sub = books.shape
    lut = np.stack(
        [q[:, j * sub : (j + 1) * sub] @ books[j].T for j in range(m)], axis=1
    )
    probes = np.argsort(-(q @ centroids.T), axis=1)[:, :nprobe]
    routing = {
        int(c): np.flatnonzero((probes == c).any(axis=1))
        for c in np.unique(probes).tolist()
    }
    offsets = (q @ centroids.T) if residual else None
    lut_ref = ray.put(np.ascontiguousarray(lut))
    partials = codes_ds.map_batches(
        _p(_ivfpq_route_batch, lut_ref=lut_ref, routing=routing, k=k,
           id_column=id_column, offsets=offsets),
        batch_format="pyarrow",
        batch_size=8192,
    )
    return _gather_topk(partials, k, id_column)


def ivfpq_write(codes_ds, centroids: np.ndarray, books: np.ndarray,
                index_dir: str, residual: bool = False) -> None:
    """persist the IVF-PQ index: hive-partitioned codes
    (`codes/centroid=N/`, 8 bytes + id per vector — the whole code
    table is ~1% of the raw vectors) plus centroids and codebooks.
    Rebuild-safe: stale partitions are cleared first (write_parquet
    appends uniquely-named files)."""
    import os
    import shutil

    import pyarrow.parquet  # noqa: F401

    shutil.rmtree(os.path.join(index_dir, "codes"), ignore_errors=True)
    os.makedirs(index_dir, exist_ok=True)
    codes_ds.write_parquet(os.path.join(index_dir, "codes"), partition_cols=["centroid"])
    pa.parquet.write_table(
        pa.table(
            {
                "centroid": pa.array(np.arange(len(centroids), dtype=np.int32)),
                "vector": pa.array(centroids.tolist(), type=pa.list_(pa.float64())),
            }
        ),
        os.path.join(index_dir, "centroids.parquet"),
    )
    m, kk, sub = books.shape
    books_table = pa.table(
        {
            "subq": pa.array(np.repeat(np.arange(m, dtype=np.int32), kk)),
            "code": pa.array(np.tile(np.arange(kk, dtype=np.int32), m)),
            "center": pa.array(books.reshape(m * kk, sub).tolist(), type=pa.list_(pa.float64())),
        }
    )
    # the residual flag travels in the codebook file's schema metadata
    # so a reader can't silently score a residual index as plain PQ
    books_table = books_table.replace_schema_metadata(
        {b"ivfpq_residual": b"1" if residual else b"0"}
    )
    pa.parquet.write_table(books_table, os.path.join(index_dir, "codebooks.parquet"))


def ivfpq_load(index_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """-> (centroids, codebooks) from an ivfpq_write layout."""
    import os

    import pyarrow.parquet  # noqa: F401

    centroids = ivf_load_centroids(index_dir)
    t = pa.parquet.read_table(os.path.join(index_dir, "codebooks.parquet"))
    m = int(t["subq"].to_numpy().max()) + 1
    kk = int(t["code"].to_numpy().max()) + 1
    centers = _embedding_matrix(t["center"])
    return centroids, centers.reshape(m, kk, -1)


def ivfpq_is_residual(index_dir: str) -> bool:
    """the codebook file's residual flag (False for pre-flag indexes)."""
    import os

    import pyarrow.parquet  # noqa: F401

    meta = pa.parquet.read_schema(
        os.path.join(index_dir, "codebooks.parquet")
    ).metadata or {}
    return meta.get(b"ivfpq_residual", b"0") == b"1"


def ivfpq_search_dir(index_dir: str, query_matrix: np.ndarray, k: int = 10,
                     nprobe: int = 4, id_column: str = "vec_id"):
    """pruned-read IVF-PQ search: load centroids + codebooks, read
    ONLY the probed `centroid=N` code partitions (ids + 8-byte codes —
    nothing else leaves storage), then the routed ADC of
    ivfpq_search."""
    import os

    import ray.data

    centroids, books = ivfpq_load(index_dir)
    q = normalize_rows(np.asarray(query_matrix, dtype=np.float64))
    probes = np.argsort(-(q @ centroids.T), axis=1)[:, :nprobe]
    wanted = np.unique(probes)
    # per-file reads drop the hive partition column, so read each
    # probed partition separately and restore its constant centroid id
    out_parts = []
    for c in wanted.tolist():
        p = os.path.join(index_dir, "codes", f"centroid={c}")
        if not os.path.isdir(p):
            continue
        fs = [os.path.join(p, f) for f in sorted(os.listdir(p)) if f.endswith(".parquet")]
        sub = ray.data.read_parquet(fs, columns=[id_column, "pq_code"]).map_batches(
            lambda b, _c=c: b.append_column(
                "centroid", pa.array(np.full(len(b), _c, dtype=np.int32))
            ),
            batch_format="pyarrow",
        )
        out_parts.append(sub)
    if not out_parts:
        return _gather_topk(None, k, id_column)
    codes = out_parts[0]
    for sub in out_parts[1:]:
        codes = codes.union(sub)
    return ivfpq_search(codes, centroids, books, query_matrix, k=k,
                        nprobe=nprobe, id_column=id_column,
                        residual=ivfpq_is_residual(index_dir))


# ------------------------------------------------------ exact re-rank
def _fetch_rows_batch(batch: pa.Table, ids_ref, id_column: str,
                      embedding_column: str) -> pa.Table:
    import ray

    wanted = ray.get(ids_ref) if isinstance(ids_ref, ray.ObjectRef) else ids_ref
    ids = batch[id_column].to_numpy().astype(np.int64)
    mask = np.isin(ids, wanted)  # wanted is sorted -> binary search path
    if not mask.any():
        emb = batch[embedding_column]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        return pa.table({id_column: pa.array([], type=pa.int64()),
                         embedding_column: emb.slice(0, 0)})
    take = pa.array(np.flatnonzero(mask), type=pa.int64())
    emb = batch[embedding_column]
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    return pa.table({id_column: pa.array(ids[mask], type=pa.int64()),
                     embedding_column: emb.take(take)})


def exact_rerank(shortlist: pa.Table, ds, query_matrix: np.ndarray, k: int,
                 id_column: str = "vec_id",
                 embedding_column: str = "embedding") -> pa.Table:
    """ADC shortlist (query_id, vec_id, sim) -> EXACT cosine top-k.

    The refine stage of IVFADC: the quantized scores choose a small
    shortlist, then the true vectors of ONLY those ids are read back
    (one pruned broadcast-filter pass over the raw dataset — the
    driver gather is bounded by the shortlist size, never the corpus)
    and re-scored exactly.  Output schema matches ivfpq_search with
    sim = the exact cosine, ordered (query_id, sim desc, id asc)."""
    from functools import partial as _p

    import ray

    q = normalize_rows(np.asarray(query_matrix, dtype=np.float64))
    sl_q = shortlist["query_id"].to_numpy().astype(np.int64)
    sl_i = shortlist[id_column].to_numpy().astype(np.int64)
    if len(sl_i) == 0:
        return pa.table(
            {"query_id": pa.array([], type=pa.int64()),
             id_column: pa.array([], type=pa.int64()),
             "sim": pa.array([], type=pa.float64())}
        )
    wanted = np.unique(sl_i)
    ids_ref = ray.put(wanted)
    fetched = ds.map_batches(
        _p(_fetch_rows_batch, ids_ref=ids_ref, id_column=id_column,
           embedding_column=embedding_column),
        batch_format="pyarrow",
        batch_size=4096,
    )
    parts = [
        t for t in fetched.iter_batches(batch_size=None, batch_format="pyarrow")
        if len(t)
    ]
    got = pa.concat_tables(parts).combine_chunks()
    got_ids = got[id_column].to_numpy().astype(np.int64)
    mat = normalize_rows(_embedding_matrix(got[embedding_column]))
    # row index of each shortlist id in the fetched matrix
    order = np.argsort(got_ids)
    pos = order[np.searchsorted(got_ids[order], sl_i)]
    sims = np.einsum("ij,ij->i", q[sl_q], mat[pos])
    outs_q, outs_i, outs_s = [], [], []
    for qq in np.unique(sl_q).tolist():
        m = sl_q == qq
        ii, ss = sl_i[m], sims[m]
        kq = min(k, len(ii))
        sel = np.lexsort((ii, -ss))[:kq]
        outs_q.append(np.full(kq, qq, dtype=np.int64))
        outs_i.append(ii[sel])
        outs_s.append(ss[sel])
    return pa.table(
        {
            "query_id": pa.array(np.concatenate(outs_q), type=pa.int64()),
            id_column: pa.array(np.concatenate(outs_i), type=pa.int64()),
            "sim": pa.array(np.concatenate(outs_s), type=pa.float64()),
        }
    )


def pq_search_refined(codes_ds, books: np.ndarray, raw_ds,
                      query_matrix: np.ndarray, k: int = 10,
                      refine_k: int | None = None,
                      id_column: str = "vec_id",
                      embedding_column: str = "embedding") -> pa.Table:
    """plain-PQ ADC shortlist of `refine_k` (default 4k) per query,
    then exact_rerank to the true top-k.  With refine_k = corpus size
    the result is exactly brute-force cosine kNN (the whole
    train -> encode -> ADC -> rerank machinery runs, but the rerank
    sees every row), which is what pins the driver row against the
    SQL cosine-rank oracle; smaller refine_k is the production
    shape where ADC prunes and the rerank recovers shortlist
    recall@k."""
    shortlist = pq_search(codes_ds, books, query_matrix,
                          k=refine_k or 4 * k, id_column=id_column)
    return exact_rerank(shortlist, raw_ds, query_matrix, k,
                        id_column=id_column, embedding_column=embedding_column)


def ivfpq_search_refined(codes_ds, centroids: np.ndarray, books: np.ndarray,
                         raw_ds, query_matrix: np.ndarray, k: int = 10,
                         nprobe: int = 4, refine_k: int | None = None,
                         id_column: str = "vec_id",
                         embedding_column: str = "embedding",
                         residual: bool = False) -> pa.Table:
    """IVF-PQ ADC shortlist of `refine_k` (default 4k) per query, then
    exact_rerank to the true top-k — recovers strict recall@k over the
    shortlist while the quantized scan still prunes the corpus."""
    shortlist = ivfpq_search(
        codes_ds, centroids, books, query_matrix,
        k=refine_k or 4 * k, nprobe=nprobe, id_column=id_column,
        residual=residual,
    )
    return exact_rerank(shortlist, raw_ds, query_matrix, k,
                        id_column=id_column, embedding_column=embedding_column)


# ------------------------------------------------ hybrid rank fusion
#: standard RRF constant (Cormack & Clarke 2009)
RRF_K = 60


def reciprocal_rank_fusion(ranked_lists: list[np.ndarray], k: int = 10,
                           rrf_k: int = RRF_K) -> pa.Table:
    """Reciprocal Rank Fusion over top-k id lists from heterogeneous
    retrievers (BM25, dense kNN, ...): score(d) = sum over lists of
    1 / (rrf_k + rank_d), missing entries contribute nothing; output
    is the fused top-k as (rank, doc_id) ordered by (score desc,
    doc_id asc).

    Each input array is ALREADY a bounded top-k list (the expensive,
    distributed work — the inverted-index scorer, the brute-force /
    IVF matmul — happened upstream), so fusion itself is a driver-side
    merge of <= sum(len(list)) rows by construction; no Ray stage is
    warranted.  Float contract: contributions are float64 divisions
    accumulated in LIST ORDER (left-assoc), so a SQL mirror computing
    coalesce-per-list sums in the same order is bit-identical."""
    scores: dict[int, float] = {}
    for lst in ranked_lists:
        for rank0, doc in enumerate(np.asarray(lst).tolist()):
            scores[int(doc)] = scores.get(int(doc), 0.0) + 1.0 / (rrf_k + rank0 + 1)
    if not scores:
        return pa.table({"rank": pa.array([], type=pa.int64()),
                         "doc_id": pa.array([], type=pa.int64())})
    docs = np.array(sorted(scores), dtype=np.int64)
    sc = np.array([scores[int(d)] for d in docs], dtype=np.float64)
    order = np.lexsort((docs, -sc))[:k]
    return pa.table({
        "rank": pa.array(np.arange(1, len(order) + 1), type=pa.int64()),
        "doc_id": pa.array(docs[order], type=pa.int64()),
    })

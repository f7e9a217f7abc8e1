"""Training-data pipeline operators: dedup, similarity, text stats."""

import numpy as np
import pyarrow as pa
import pandas as pd
import pytest

from chearch_ray.stages.dedup import (
    MinHashSignatures,
    SimHash,
    exact_dedup,
    hamming64,
    minhash_dedup_pairs,
    ngram_jaccard_verify,
    simhash_pairs,
)
from chearch_ray.stages.similarity import (
    BruteForceCosine,
    HyperplaneLSH,
    knn_brute_force,
    normalize_rows,
)
from chearch_ray.stages.textstats import Fingerprint, LangId, QualityScore, TokenStats


@pytest.fixture(scope="module")
def docs():
    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    rows = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base},  # exact dup of 1
        {"doc_id": 3, "text": base.replace("today", "tomorrow")},  # near dup
        {"doc_id": 4, "text": "def main(): return compute_result(x, y) + offset_value"},
        {"doc_id": 5, "text": "el rapido zorro marron salta sobre el perro perezoso y corre"},
        {"doc_id": 6, "text": "completely different words about databases indexes and queries"},
    ]
    return pa.Table.from_pylist(rows)


# ------------------------------------------------------------- dedup
def test_exact_dedup(ray_session, docs):
    import ray.data

    kept = exact_dedup(ray.data.from_arrow(docs)).to_pandas()
    assert sorted(kept["doc_id"]) == [1, 3, 4, 5, 6]  # 2 collapses into 1


def test_minhash_pairs(ray_session, docs):
    import ray.data

    pairs = minhash_dedup_pairs(
        ray.data.from_arrow(docs), threshold=0.5, num_perm=64, bands=16
    ).to_pandas()
    found = {tuple(sorted((a, b))) for a, b in zip(pairs["doc_a"], pairs["doc_b"])}
    assert (1, 2) in found  # exact dup always collides
    assert (1, 3) in found or (2, 3) in found  # near dup
    assert (1, 6) not in found and (4, 5) not in found
    exact = pairs[(pairs["doc_a"] == 1) & (pairs["doc_b"] == 2)]
    assert float(exact["est_jaccard"].iloc[0]) == 1.0


def test_minhash_signature_determinism(docs):
    s1 = MinHashSignatures(num_perm=64, bands=16)(docs)
    s2 = MinHashSignatures(num_perm=64, bands=16)(docs)
    assert s1.equals(s2)


def test_simhash_pairs(ray_session, docs):
    import ray.data

    pairs = simhash_pairs(ray.data.from_arrow(docs), max_hamming=3).to_pandas()
    found = {tuple(sorted((a, b))) for a, b in zip(pairs["doc_a"], pairs["doc_b"])}
    assert (1, 2) in found
    ident = pairs[(pairs["doc_a"] == 1) & (pairs["doc_b"] == 2)]
    assert int(ident["hamming"].iloc[0]) == 0


def test_simhash_identical_docs_equal(docs):
    out = SimHash()(docs)
    sh = dict(zip(out["doc_id"].to_pylist(), out["simhash"].to_pylist()))
    assert sh[1] == sh[2]
    assert sh[1] != sh[6]


def test_hamming64():
    a = np.array([0b1011, 0], dtype=np.uint64)
    b = np.array([0b0010, np.iinfo(np.uint64).max], dtype=np.uint64)
    assert hamming64(a, b).tolist() == [2, 64]


def test_ngram_jaccard_verify(docs):
    pairs = pa.table({"doc_a": pa.array([1, 1], type=pa.int64()), "doc_b": pa.array([2, 6], type=pa.int64())})
    out = ngram_jaccard_verify(docs, pairs)
    j = out["jaccard"].to_pylist()
    assert j[0] == 1.0
    assert j[1] == 0.0


# -------------------------------------------------------- similarity
@pytest.fixture(scope="module")
def embeddings():
    rng = np.random.default_rng(7)
    mat = rng.standard_normal((50, 16))
    mat[10] = mat[3] + 0.001 * rng.standard_normal(16)  # near dup of 3
    return pa.table(
        {
            "vec_id": pa.array(range(50), type=pa.int64()),
            "embedding": pa.array(mat.tolist(), type=pa.list_(pa.float32())),
        }
    )


def test_brute_force_cosine_matches_numpy(embeddings):
    mat = np.array(embeddings["embedding"].to_pylist(), dtype=np.float64)
    q = mat[3:4]
    stage = BruteForceCosine(q, k=5)
    out = stage(embeddings)
    ids = out["vec_id"].to_pylist()
    # numpy oracle
    nm = normalize_rows(mat)
    sims = nm @ normalize_rows(q.copy())[0]
    order = np.lexsort((np.arange(50), -sims))[:5]
    assert ids == order.tolist()
    assert ids[0] == 3 and ids[1] == 10  # self then near-dup


def test_knn_brute_force_dataset(ray_session, embeddings):
    import ray.data

    mat = np.array(embeddings["embedding"].to_pylist(), dtype=np.float64)
    out = knn_brute_force(ray.data.from_arrow(embeddings), mat[3:4], k=5)
    assert out["vec_id"].to_pylist()[:2] == [3, 10]


def test_hyperplane_lsh_buckets(embeddings):
    stage = HyperplaneLSH(dim=16, bits=32, bands=4)
    out = stage(embeddings)
    assert len(out) == 4 * 50
    df = out.to_pandas()
    # near-identical vectors share all band buckets
    b3 = df[df["vec_id"] == 3].sort_values("band")["bucket"].tolist()
    b10 = df[df["vec_id"] == 10].sort_values("band")["bucket"].tolist()
    assert b3 == b10


# --------------------------------------------------------- textstats
def test_token_stats(docs):
    out = TokenStats()(docs).to_pandas().set_index("doc_id")
    assert out.loc[1, "n_tokens"] == 14
    assert out.loc[1, "n_stopwords"] == 3  # the, the, and
    assert out.loc[1, "n_distinct"] == 13  # 'the' twice
    assert out.loc[4, "n_stopwords"] == 0


def test_quality_score_bounds(docs):
    out = QualityScore()(docs).to_pandas()
    assert ((out["quality"] >= 0) & (out["quality"] <= 1)).all()
    assert ((out["ttr"] > 0) & (out["ttr"] <= 1)).all()


def test_langid(docs):
    out = LangId()(docs).to_pandas().set_index("doc_id")
    assert out.loc[1, "lang_pred"] == "en"
    assert out.loc[5, "lang_pred"] == "es"
    assert out.loc[4, "lang_pred"] == "code"


def test_fingerprint_deterministic_and_discriminative(docs):
    f1 = Fingerprint()(docs).to_pandas().set_index("doc_id")["fingerprint"]
    f2 = Fingerprint()(docs).to_pandas().set_index("doc_id")["fingerprint"]
    assert (f1 == f2).all()
    assert f1[1] == f1[2]  # identical docs
    assert f1[1] != f1[6]


def test_read_corpus_text_and_planner(ray_session, tmp_path):
    from chearch_ray.sources.corpus import plan_partitions, read_corpus

    p = tmp_path / "docs.txt"
    p.write_text("hello world\nfoo bar baz\n")
    ds = read_corpus(str(p), fmt="text")
    out = ds.to_pandas()
    # Ray block completion order is not a row-order contract
    assert sorted(out["content"]) == ["foo bar baz", "hello world"]
    assert set(out.columns) == {"repo", "path", "commit", "lang", "content"}

    assert plan_partitions(500) == (1, 4)
    segs, shards = plan_partitions(10**12)
    assert segs * (1 << 24) >= 10**12
    assert 4 <= shards <= 256


def test_ivf_ann_recall(ray_session):
    import ray.data

    from chearch_ray.stages.similarity import ivf_build, ivf_search, knn_brute_force

    rng = np.random.default_rng(9)
    mat = rng.standard_normal((600, 24))
    table = pa.table(
        {
            "vec_id": pa.array(range(600), type=pa.int64()),
            "embedding": pa.array(mat.tolist(), type=pa.list_(pa.float32())),
        }
    )
    ds = ray.data.from_arrow(table)
    centroids, assigned = ivf_build(ds, n_centroids=8, sample_size=600)
    assigned_mat = assigned.materialize()

    queries = mat[:5].astype(np.float64)
    exact = knn_brute_force(ray.data.from_arrow(table), queries, k=5)
    approx = ivf_search(assigned_mat, centroids, queries, k=5, nprobe=3)

    # recall@5 with nprobe=3/8 should be decent; top-1 (self) must hit
    hits = total = 0
    for qid in range(5):
        e = exact.filter(pa.compute.equal(exact["query_id"], qid))["vec_id"].to_pylist()
        a = approx.filter(pa.compute.equal(approx["query_id"], qid))["vec_id"].to_pylist()
        assert a and a[0] == e[0] == qid  # self is always found
        hits += len(set(e) & set(a))
        total += len(e)
    assert hits / total >= 0.5


def test_ivf_partitioned_index_prunes_reads(ray_session, tmp_path):
    """ivf_build(index_dir=...) writes centroid=N hive partitions;
    ivf_search(index_dir, ...) reads ONLY the nprobe probed partitions
    (VERDICT r01 item 3) and matches the in-memory path's results."""
    import os

    import ray.data

    from chearch_ray.stages.similarity import (
        ivf_build,
        ivf_load_centroids,
        ivf_probed_paths,
        ivf_search,
        normalize_rows,
    )

    rng = np.random.default_rng(11)
    mat = rng.standard_normal((600, 24))
    table = pa.table(
        {
            "vec_id": pa.array(range(600), type=pa.int64()),
            "embedding": pa.array(mat.tolist(), type=pa.list_(pa.float32())),
        }
    )
    idx = str(tmp_path / "ivf")
    centroids, assigned = ivf_build(
        ray.data.from_arrow(table), n_centroids=8, sample_size=600, index_dir=idx
    )
    # layout: one hive dir per non-empty centroid + persisted centroids
    part_dirs = sorted(os.listdir(os.path.join(idx, "vectors")))
    assert all(d.startswith("centroid=") for d in part_dirs)
    assert len(part_dirs) >= 4
    np.testing.assert_allclose(ivf_load_centroids(idx), centroids)

    queries = mat[:5].astype(np.float64)
    nprobe = 2
    # pruning check on a 3-query subset: <= 3*nprobe = 6 probed
    # partitions, so the set is strictly smaller than all 8 no matter
    # where the (deterministic) centroids land
    q = normalize_rows(queries[:3].copy())
    probes = np.argsort(-(q @ centroids.T), axis=1)[:, :nprobe]
    wanted = np.unique(probes)
    paths = ivf_probed_paths(idx, wanted)
    # pruning: the probed path set is exactly the probed centroids and
    # strictly smaller than the full partition set
    assert len(paths) == len(wanted) < len(part_dirs)

    approx_disk = ivf_search(idx, queries, k=5, nprobe=nprobe)
    approx_mem = ivf_search(assigned.materialize(), centroids, queries, k=5, nprobe=nprobe)
    assert approx_disk["vec_id"].to_pylist() == approx_mem["vec_id"].to_pylist()
    assert approx_disk["query_id"].to_pylist() == approx_mem["query_id"].to_pylist()


def test_minhash_pairs_multiblock(ray_session):
    """Corpus spread across many blocks: the distributed verify path
    (signature JOIN, no driver gather) must find cross-block dups."""
    import ray.data

    texts = []
    for i in range(300):
        texts.append(
            {
                "doc_id": i,
                "text": f"unique document number {i} talking about subject {i % 7} "
                f"with extra words {i*13 % 101} {i*29 % 103} {i*31 % 107}",
            }
        )
    # two exact dups far apart (different input blocks)
    texts[250]["text"] = texts[3]["text"]
    texts[299]["text"] = texts[120]["text"]
    ds = ray.data.from_arrow(pa.Table.from_pylist(texts)).repartition(8)
    pairs = minhash_dedup_pairs(ds, threshold=0.9, num_perm=64, bands=16).to_pandas()
    found = {tuple(sorted((a, b))) for a, b in zip(pairs["doc_a"], pairs["doc_b"])}
    assert (3, 250) in found
    assert (120, 299) in found
    ex = pairs[(pairs["doc_a"] == 3) & (pairs["doc_b"] == 250)]
    assert float(ex["est_jaccard"].iloc[0]) == 1.0


def test_minhash_pairs_empty_input(ray_session):
    import ray.data

    empty = pa.table({"doc_id": pa.array([], type=pa.uint64()),
                      "text": pa.array([], type=pa.string())})
    out = minhash_dedup_pairs(ray.data.from_arrow(empty)).to_pandas()
    assert len(out) == 0
    # Ray's from_arrow drops column metadata on 0-row tables; assert
    # the pipeline completes with an empty result rather than erroring
    assert list(out.columns) in ([], ["doc_a", "doc_b", "est_jaccard"])


# ------------------------------------------ brute-force exact oracles
def _shingle_sets(table, w=3):
    """exact token-shingle sets per doc (pure-Python reference)."""
    import re

    out = {}
    for doc_id, text in zip(table["doc_id"].to_pylist(), table["text"].to_pylist()):
        toks = [t for t in re.split(r"[^a-z0-9_]+", text.lower()) if t]
        out[doc_id] = {tuple(toks[i : i + w]) for i in range(len(toks) - w + 1)}
    return out


def test_minhash_pairs_vs_exact_jaccard_oracle(ray_session):
    """Brute-force oracle over the sf0.001 documents: every pair the
    pipeline reports at est >= 0.8 must have true Jaccard >= 0.5, and
    every true-Jaccard >= 0.95 pair must be reported (VERDICT r01
    item 5: exact in-test oracle for minhash_pairs)."""
    import itertools

    import pyarrow.parquet as pq
    import ray.data

    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"])
    pairs = minhash_dedup_pairs(
        ray.data.from_arrow(docs), threshold=0.8, num_perm=128, bands=32
    ).to_pandas()
    sets = _shingle_sets(docs)
    exact = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        sa, sb = sets[a], sets[b]
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        if inter:
            exact[(a, b)] = inter / len(sa | sb)
    reported = {
        tuple(sorted((int(a), int(b)))): float(e)
        for a, b, e in zip(pairs["doc_a"], pairs["doc_b"], pairs["est_jaccard"])
    }
    # precision: no reported pair is far below threshold in truth
    for (a, b), est in reported.items():
        assert exact.get((a, b), 0.0) >= 0.5, (a, b, est, exact.get((a, b)))
    # recall: near-identical pairs are always caught
    for (a, b), j in exact.items():
        if j >= 0.95:
            assert (a, b) in reported, (a, b, j)
    # estimates track truth within minhash error bounds (128 perms)
    for (a, b), est in reported.items():
        assert abs(est - exact[(a, b)]) < 0.2, (a, b, est, exact[(a, b)])


def test_simhash_pairs_vs_exact_hamming_oracle(ray_session):
    """Every pair simhash_pairs reports must have the true Hamming
    distance between independently computed signatures (exact check of
    the reported `hamming` column)."""
    import pyarrow.parquet as pq
    import ray.data

    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"])
    pairs = simhash_pairs(ray.data.from_arrow(docs), max_hamming=6).to_pandas()
    sig = SimHash()(docs)
    sigs = dict(zip(sig["doc_id"].to_pylist(), sig["simhash"].to_pylist()))
    assert len(pairs) > 0  # sf0.001 contains near-dup docs
    for a, b, h in zip(pairs["doc_a"], pairs["doc_b"], pairs["hamming"]):
        true_h = bin(sigs[int(a)] ^ sigs[int(b)]).count("1")
        assert int(h) == true_h <= 6, (a, b, h, true_h)


def test_ngram_jaccard_pairs_dataset_scale(ray_session, docs):
    """Distributed exact-Jaccard verify (shingle-payload hash join)
    matches the pure-Python candidates-only helper exactly."""
    import ray.data

    pairs = pa.table(
        {
            "doc_a": pa.array([1, 1, 1], type=pa.uint64()),
            "doc_b": pa.array([2, 3, 6], type=pa.uint64()),
        }
    )
    from chearch_ray.stages.dedup import ngram_jaccard_pairs

    out = (
        ngram_jaccard_pairs(ray.data.from_arrow(docs), ray.data.from_arrow(pairs))
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    want = ngram_jaccard_verify(docs, pairs).to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    assert out["jaccard"].tolist() == want["jaccard"].tolist()
    assert out["jaccard"].tolist()[0] == 1.0  # exact dup
    assert out["jaccard"].tolist()[2] == 0.0  # unrelated


def test_minhash_exact_verify_mode(ray_session, docs):
    """verify='exact' replaces est_jaccard with TRUE Jaccard from the
    shingle-payload join; values equal the brute-force reference."""
    import ray.data

    out = minhash_dedup_pairs(
        ray.data.from_arrow(docs), threshold=0.5, num_perm=64, bands=16, verify="exact"
    ).to_pandas()
    found = {tuple(sorted((int(a), int(b)))): j for a, b, j in
             zip(out["doc_a"], out["doc_b"], out["jaccard"])}
    assert found[(1, 2)] == 1.0
    sets = _shingle_sets(docs)
    for (a, b), j in found.items():
        sa, sb = sets[a], sets[b]
        assert j == len(sa & sb) / len(sa | sb), (a, b)


# ------------------------------ exact similarity join / neardup keep
def test_jaccard_similarity_join_exact_vs_bruteforce(ray_session):
    """jaccard_similarity_join is EXACT: over the sf0.001 documents it
    must report exactly the brute-force all-pairs set at the threshold,
    with bit-identical Jaccard values (prefix filter + size filter are
    candidate pruning only, never result pruning)."""
    import itertools

    import pyarrow.parquet as pq
    import ray.data

    from chearch_ray.stages.dedup import jaccard_similarity_join

    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"])
    out = jaccard_similarity_join(ray.data.from_arrow(docs), threshold=0.5).to_pandas()
    got = {
        tuple(sorted((int(a), int(b)))): float(j)
        for a, b, j in zip(out["doc_a"], out["doc_b"], out["jaccard"])
    }
    sets = _shingle_sets(docs)
    want = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        sa, sb = sets[a], sets[b]
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        union = len(sa | sb)
        if union and inter / union >= 0.5:
            want[(a, b)] = inter / union
    assert got == want


def test_jaccard_join_low_threshold_exact(ray_session):
    """low threshold (0.3) exercises long prefixes and the size
    filter's boundary: results still exactly match brute force."""
    import itertools

    import ray.data

    from chearch_ray.stages.dedup import jaccard_similarity_join

    rows = [
        {"doc_id": 1, "text": "a b c d e f g h i j"},
        {"doc_id": 2, "text": "a b c d e f x y z w"},  # moderate overlap with 1
        {"doc_id": 3, "text": "a b c d e f g h i k"},  # high overlap with 1
        {"doc_id": 4, "text": "p q r s t u v"},
        {"doc_id": 5, "text": "p q r s t u w"},  # moderate overlap with 4
    ]
    docs = pa.Table.from_pylist(rows)
    out = jaccard_similarity_join(ray.data.from_arrow(docs), threshold=0.3).to_pandas()
    got = {
        tuple(sorted((int(a), int(b)))): float(j)
        for a, b, j in zip(out["doc_a"], out["doc_b"], out["jaccard"])
    }
    sets = _shingle_sets(docs)
    want = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        sa, sb = sets[a], sets[b]
        inter, union = len(sa & sb), len(sa | sb)
        if union and inter / union >= 0.3:
            want[(a, b)] = inter / union
    assert got == want and len(want) >= 3


def test_verify_broadcast_and_join_paths_identical(ray_session, docs):
    """the byte-gated broadcast verify and the two-hash-join plan must
    produce identical pairs (broadcast_bytes=0 forces the join plan)."""
    from functools import partial

    import ray.data

    from chearch_ray.stages.dedup import (
        _exact_jaccard_packed,
        dedup_pairs,
        shingle_payload,
        verify_pairs_by_join,
    )

    ds = ray.data.from_arrow(docs)
    payload = ds.map_batches(
        partial(shingle_payload, text_column="text", w=3), batch_format="pyarrow"
    ).materialize()
    pairs = ray.data.from_arrow(
        pa.table(
            {
                "doc_a": pa.array([1, 1, 4], type=pa.uint64()),
                "doc_b": pa.array([2, 3, 5], type=pa.uint64()),
            }
        )
    )
    fn = partial(_exact_jaccard_packed, threshold=0.0)
    fast = verify_pairs_by_join(pairs, payload, fn, payload_col="shingles").to_pandas()
    slow = verify_pairs_by_join(
        pairs, payload, fn, payload_col="shingles", broadcast_bytes=0
    ).to_pandas()
    key = ["doc_a", "doc_b"]
    fast = fast.sort_values(key).reset_index(drop=True)
    slow = slow.sort_values(key).reset_index(drop=True)
    assert fast[key + ["jaccard"]].equals(slow[key + ["jaccard"]])
    assert len(fast) == 3


def test_connected_components_paths_triangles_isolated(ray_session):
    """hash-to-min CC: a 3-path, a triangle and an isolated pair all
    resolve to min-id labels."""
    import ray.data

    from chearch_ray.stages.dedup import connected_components

    pairs = pa.table(
        {
            "doc_a": pa.array([1, 2, 10, 11, 10, 20], type=pa.uint64()),
            "doc_b": pa.array([2, 3, 11, 12, 12, 21], type=pa.uint64()),
        }
    )
    labels = connected_components(ray.data.from_arrow(pairs)).to_pandas()
    got = dict(zip(labels["doc_id"].astype(int), labels["keep_id"].astype(int)))
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_connected_components_long_chain(ray_session):
    """a 12-node chain needs several hash-to-min rounds — pins the
    fixpoint iteration, not just the 1-round case."""
    import ray.data

    from chearch_ray.stages.dedup import connected_components

    n = 12
    pairs = pa.table(
        {
            "doc_a": pa.array(range(100, 100 + n - 1), type=pa.uint64()),
            "doc_b": pa.array(range(101, 100 + n), type=pa.uint64()),
        }
    )
    labels = connected_components(ray.data.from_arrow(pairs)).to_pandas()
    got = dict(zip(labels["doc_id"].astype(int), labels["keep_id"].astype(int)))
    assert got == {100 + i: 100 for i in range(n)}


def test_neardup_keep_resolution(ray_session, docs):
    """pairs -> components -> keep mapping: docs 1,2,3 form one
    near-dup component kept by min doc_id 1; singletons are absent."""
    import ray.data

    from chearch_ray.stages.dedup import neardup_keep

    out = neardup_keep(ray.data.from_arrow(docs), threshold=0.5).to_pandas()
    got = dict(zip(out["doc_id"].astype(int), out["keep_id"].astype(int)))
    assert got == {1: 1, 2: 1, 3: 1}


def test_embedding_allpairs_exact_vs_numpy(ray_session, embeddings):
    """exact all-pairs cosine join == numpy brute force at any
    threshold; each unordered pair exactly once."""
    import ray.data

    from chearch_ray.stages.similarity import embedding_allpairs_exact

    mat = np.array(embeddings["embedding"].to_pylist(), dtype=np.float64)
    matn = normalize_rows(mat)
    sims = matn @ matn.T
    for threshold in (0.9, 0.5):
        out = embedding_allpairs_exact(
            ray.data.from_arrow(embeddings), threshold=threshold
        ).to_pandas()
        got = {tuple(p) for p in zip(out["doc_a"].astype(int), out["doc_b"].astype(int))}
        assert len(got) == len(out)  # no pair twice
        want = {
            (a, b)
            for a in range(len(mat))
            for b in range(a + 1, len(mat))
            if sims[a, b] >= threshold
        }
        assert got == want
        for a, b, c in zip(out["doc_a"], out["doc_b"], out["cosine"]):
            assert abs(c - sims[int(a), int(b)]) < 1e-12
    assert (3, 10) in got or sims[3, 10] < 0.5


def test_ivf_sample_unbiased_on_sorted_corpus(ray_session):
    """quantizer training sample must cover a cluster-SORTED corpus:
    limit(n) (the old path) sees only the first cluster; the hash
    bottom-k sample sees all of them, so per-cluster queries find
    their own neighborhoods (recall stays high) and partitions
    balance."""
    import ray.data

    from chearch_ray.stages.similarity import (
        ivf_build,
        ivf_search,
        knn_brute_force,
        sample_embeddings,
    )

    rng = np.random.default_rng(11)
    n_clusters, per = 4, 250
    centers = rng.standard_normal((n_clusters, 16)) * 6
    mat = np.concatenate(
        [centers[c] + 0.1 * rng.standard_normal((per, 16)) for c in range(n_clusters)]
    )  # SORTED by cluster — the adversarial layout for limit(n)
    table = pa.table(
        {
            "vec_id": pa.array(range(len(mat)), type=pa.int64()),
            "embedding": pa.array(mat.tolist(), type=pa.list_(pa.float32())),
        }
    )
    ds = ray.data.from_arrow(table).repartition(8)

    # the sample itself covers every cluster (limit(200) would see 1)
    sample = sample_embeddings(ds, 200)
    sims = (sample / np.linalg.norm(sample, axis=1, keepdims=True)) @ (
        centers / np.linalg.norm(centers, axis=1, keepdims=True)
    ).T
    covered = set(np.argmax(sims, axis=1).tolist())
    assert covered == set(range(n_clusters))

    centroids, assigned = ivf_build(ds, n_centroids=4, sample_size=200)
    assigned_mat = assigned.materialize()
    # one query per true cluster; nprobe=1 must still find its own
    # neighborhood because every cluster got a centroid
    queries = np.stack([mat[c * per + 7] for c in range(n_clusters)]).astype(np.float64)
    exact = knn_brute_force(ray.data.from_arrow(table), queries, k=5)
    approx = ivf_search(assigned_mat, centroids, queries, k=5, nprobe=1)
    hits = total = 0
    for qid in range(n_clusters):
        e = exact.filter(pa.compute.equal(exact["query_id"], qid))["vec_id"].to_pylist()
        a = approx.filter(pa.compute.equal(approx["query_id"], qid))["vec_id"].to_pylist()
        hits += len(set(e) & set(a))
        total += len(e)
    assert hits / total >= 0.9

    # partition balance: no centroid swallows the whole corpus
    counts = assigned_mat.to_pandas()["centroid"].value_counts()
    assert len(counts) == n_clusters and counts.max() <= 2 * per


def test_chunk_documents_semantics():
    from chearch_ray.stages.textstats import chunk_documents

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "text": pa.array(["a b c d e f g", "x y", ""]),
        }
    )
    out = chunk_documents(t, chunk_tokens=4, overlap=2).to_pydict()
    # doc 1: 7 tokens, stride 2 -> starts 0,2,4,6
    rows = list(zip(out["doc_id"], out["chunk_id"], out["start_tok"],
                    out["n_tokens"], out["chunk_text"]))
    assert rows == [
        (1, 0, 0, 4, "a b c d"),
        (1, 1, 2, 4, "c d e f"),
        (1, 2, 4, 3, "e f g"),
        (1, 3, 6, 1, "g"),
        (2, 0, 0, 2, "x y"),
    ]
    # overlap invariant: consecutive chunks share `overlap` tokens
    assert rows[1][4].split()[:2] == rows[0][4].split()[2:]

    import pytest as _pytest

    with _pytest.raises(ValueError):
        chunk_documents(t, chunk_tokens=4, overlap=4)


def test_deterministic_sample_stable_and_content_keyed():
    import hashlib

    from chearch_ray.stages.textstats import deterministic_sample, sample_threshold_hex

    texts = [f"document number {i} with words" for i in range(400)]
    t = pa.table({"doc_id": pa.array(range(400), type=pa.int64()), "text": pa.array(texts)})
    out1 = deterministic_sample(t, rate=0.3)
    # permuted input -> same selected SET (content-keyed, order-free)
    perm = t.take(pa.array(list(reversed(range(400))), type=pa.int64()))
    out2 = deterministic_sample(perm, rate=0.3)
    assert sorted(out1["doc_id"].to_pylist()) == sorted(out2["doc_id"].to_pylist())
    # matches the definition exactly
    thr = sample_threshold_hex(0.3)
    want = [i for i, s in enumerate(texts) if hashlib.sha256(s.encode()).hexdigest()[:8] < thr]
    assert sorted(out1["doc_id"].to_pylist()) == want
    assert 0.2 < len(want) / 400 < 0.4
    # rate edges
    assert len(deterministic_sample(t, rate=0.0)) == 0
    assert len(deterministic_sample(t, rate=1.0)) == 400


def test_sample_embeddings_layout_independent(ray_session):
    """the quantizer sample must be IDENTICAL (set AND row order)
    however the corpus is laid out — seeded k-means consumes row
    indices, so order differences would change centroids per layout."""
    import ray.data

    from chearch_ray.stages.similarity import sample_embeddings

    rng = np.random.default_rng(5)
    mat = rng.standard_normal((700, 8))
    table = pa.table(
        {
            "vec_id": pa.array(range(700), type=pa.int64()),
            "embedding": pa.array(mat.tolist(), type=pa.list_(pa.float32())),
        }
    )
    one = sample_embeddings(ray.data.from_arrow(table), 128)
    # different block layouts: single block, 8 blocks, reversed rows
    many = sample_embeddings(ray.data.from_arrow(table).repartition(8), 128)
    rev = sample_embeddings(
        ray.data.from_arrow(table.take(pa.array(range(699, -1, -1)))).repartition(3), 128
    )
    np.testing.assert_array_equal(one, many)
    np.testing.assert_array_equal(one, rev)


# ------------------------------------------------------ sequence packing
def test_pack_sequences_vs_window_oracle(ray_session):
    """pack_sequences == the SQL running-sum window, including docs
    longer than the bin budget (they start a bin and spill over)."""
    import duckdb
    import ray.data

    from chearch_ray.stages.pack import pack_sequences

    rng = np.random.default_rng(7)
    n = 500
    texts = [" ".join(f"w{j}" for j in range(rng.integers(1, 60))) for _ in range(n)]
    # non-contiguous, shuffled ids exercise the range bucketing
    ids = rng.permutation(np.arange(n, dtype=np.int64) * 37 + 5)
    t = pa.table({"doc_id": pa.array(ids), "text": pa.array(texts)})

    got = (
        pack_sequences(ray.data.from_arrow(t), max_tokens=100,
                       n_buckets=32, coarse_partitions=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", t)
    want = con.execute("""
        WITH tc AS (SELECT doc_id,
            len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
                x -> x <> ''))::BIGINT AS n_tokens FROM documents),
        p AS (SELECT doc_id, n_tokens,
            (sum(n_tokens) OVER (ORDER BY doc_id) - n_tokens) AS pre FROM tc)
        SELECT doc_id, n_tokens, (pre // 100)::BIGINT AS bin,
               (pre % 100)::BIGINT AS bin_offset
        FROM p ORDER BY doc_id
    """).df().reset_index(drop=True)
    assert len(got) == n
    for col in ["doc_id", "n_tokens", "bin", "bin_offset"]:
        np.testing.assert_array_equal(got[col].to_numpy(), want[col].to_numpy(), err_msg=col)
    # bins fill to the budget: every bin except the last spans 100 tokens
    total = int(got["n_tokens"].sum())
    assert int(got["bin"].max()) == (total - 1) // 100


def test_pack_sequences_partition_invariance(ray_session):
    """result is a pure function of the corpus — block layout and
    partition counts must not matter."""
    import ray.data

    from chearch_ray.stages.pack import pack_sequences

    t = pa.table({
        "doc_id": pa.array(np.arange(100, dtype=np.int64)),
        "text": pa.array([f"tok " * (i % 17 + 1) for i in range(100)]),
    })
    a = (
        pack_sequences(ray.data.from_arrow(t).repartition(1), max_tokens=64,
                       n_buckets=8, coarse_partitions=2)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        pack_sequences(ray.data.from_arrow(t).repartition(7), max_tokens=64,
                       n_buckets=64, coarse_partitions=5)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert a.equals(b)


def test_pack_sequences_hash_order_vs_window_oracle(ray_session):
    """order="hash" packs in Knuth-multiplicative-hash order — the SQL
    mirror is the same running-sum window over the HUGEINT hash key."""
    import duckdb
    import ray.data

    from chearch_ray.stages.pack import pack_sequences

    rng = np.random.default_rng(11)
    n = 400
    texts = [" ".join(f"w{j}" for j in range(rng.integers(1, 50))) for _ in range(n)]
    ids = rng.permutation(np.arange(n, dtype=np.int64) * 13 + 2)
    t = pa.table({"doc_id": pa.array(ids), "text": pa.array(texts)})

    got = (
        pack_sequences(ray.data.from_arrow(t).repartition(5), max_tokens=100,
                       n_buckets=32, coarse_partitions=8, order="hash")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", t)
    want = con.execute("""
        WITH tc AS (SELECT doc_id,
            len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
                x -> x <> ''))::BIGINT AS n_tokens FROM documents),
        p AS (SELECT doc_id, n_tokens,
            (sum(n_tokens) OVER (ORDER BY
                (doc_id::HUGEINT * 6364136223846793005) % 18446744073709551616
            ) - n_tokens) AS pre FROM tc)
        SELECT doc_id, n_tokens, (pre // 100)::BIGINT AS bin,
               (pre % 100)::BIGINT AS bin_offset
        FROM p ORDER BY doc_id
    """).df().reset_index(drop=True)
    assert len(got) == n
    for col in ["doc_id", "n_tokens", "bin", "bin_offset"]:
        np.testing.assert_array_equal(got[col].to_numpy(), want[col].to_numpy(), err_msg=col)
    # the hash order is a real shuffle: it must differ from doc_id order
    plain = (
        pack_sequences(ray.data.from_arrow(t), max_tokens=100,
                       n_buckets=32, coarse_partitions=8)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert not plain["bin"].equals(got["bin"])
    # same total token stream either way: end of the last document's
    # span is the stream length regardless of order
    plain_end = (plain["bin"] * 100 + plain["bin_offset"] + plain["n_tokens"]).max()
    hash_end = (got["bin"] * 100 + got["bin_offset"] + got["n_tokens"]).max()
    assert int(plain_end) == int(hash_end) == int(got["n_tokens"].sum())


# --------------------------------------------------- quota sampling
def test_quota_sample_vs_window_oracle(ray_session):
    """quota_sample_per_group == SQL row_number() over the HUGEINT
    Knuth-hash order, at every quota including quota > group size."""
    import duckdb
    import ray.data

    from chearch_ray.stages.sample import quota_sample_per_group

    rng = np.random.default_rng(11)
    n = 400
    langs = rng.choice(["en", "es", "fr", "de", "tiny"], size=n,
                       p=[0.4, 0.3, 0.2, 0.095, 0.005])
    ids = rng.permutation(np.arange(n, dtype=np.int64) * 13 + 2)
    t = pa.table({"doc_id": pa.array(ids), "lang": pa.array(langs)})
    con = duckdb.connect()
    con.register("documents", t)
    for quota in (7, 50):
        got = (
            quota_sample_per_group(ray.data.from_arrow(t), "lang", quota=quota,
                                   coarse_partitions=8)
            .to_pandas().sort_values(["lang", "rn"]).reset_index(drop=True)
        )
        want = con.execute(f"""
            SELECT lang, doc_id, rn FROM (
              SELECT lang, doc_id, row_number() OVER (
                PARTITION BY lang
                ORDER BY (doc_id::HUGEINT * 6364136223846793005) % 18446744073709551616::HUGEINT,
                         doc_id) AS rn
              FROM documents) WHERE rn <= {quota}
            ORDER BY lang, rn
        """).df().reset_index(drop=True)
        assert len(got) == len(want), (quota, len(got), len(want))
        np.testing.assert_array_equal(got["doc_id"].to_numpy(), want["doc_id"].to_numpy())
        np.testing.assert_array_equal(got["rn"].to_numpy(), want["rn"].to_numpy().astype(np.int64))
        assert list(got["lang"]) == list(want["lang"])


def test_quota_sample_partition_invariance(ray_session):
    import ray.data

    from chearch_ray.stages.sample import quota_sample_per_group

    t = pa.table({
        "doc_id": pa.array(np.arange(200, dtype=np.int64)),
        "lang": pa.array([["en", "es", "fr"][i % 3] for i in range(200)]),
    })
    a = (quota_sample_per_group(ray.data.from_arrow(t).repartition(1), "lang", 10, 2)
         .to_pandas().sort_values(["lang", "rn"]).reset_index(drop=True))
    b = (quota_sample_per_group(ray.data.from_arrow(t).repartition(9), "lang", 10, 7)
         .to_pandas().sort_values(["lang", "rn"]).reset_index(drop=True))
    assert a.equals(b)
    assert (a.groupby("lang").size() == 10).all()


# ------------------------------------------------ repetition filter
def test_repetition_stats_vs_sql_oracle(ray_session):
    import duckdb

    from chearch_ray.stages.textstats import RepetitionStats

    docs = [
        "alpha beta gamma delta\nepsilon zeta eta theta\niota kappa lambda mu",
        "spam\nspam\nspam\nspam\nreal content here",       # dup lines
        "word word word word word word word word other",    # top word 8/9
        "x",                                               # tiny doc
        "a#b#c ... and .... more",                          # symbols
        "",                                                # empty
        "same\nsame\ndifferent longer line with tokens galore indeed",
    ]
    t = pa.table({"doc_id": pa.array(np.arange(len(docs), dtype=np.int64)),
                  "text": pa.array(docs)})
    got = RepetitionStats()(t).to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", t)
    want = con.execute("""
WITH l AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM documents),
lc AS (SELECT doc_id, line, count(*)::BIGINT c, length(line)::BIGINT len
       FROM l GROUP BY doc_id, line),
lagg AS (SELECT doc_id, sum(c)::BIGINT n_lines,
                sum(CASE WHEN c > 1 THEN c ELSE 0 END)::BIGINT n_dup_lines,
                sum(CASE WHEN c > 1 THEN c * len ELSE 0 END)::BIGINT dup_line_chars
         FROM lc GROUP BY doc_id),
tok AS (SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
        x -> x <> '')) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*)::BIGINT cnt FROM tok GROUP BY doc_id, term),
tt AS (SELECT doc_id, max(cnt)::BIGINT top_tf, sum(cnt)::BIGINT n_tokens FROM tf GROUP BY doc_id)
SELECT d.doc_id, length(d.text)::BIGINT n_chars, lagg.n_lines, lagg.n_dup_lines,
       lagg.dup_line_chars, coalesce(tt.n_tokens, 0) n_tokens, coalesce(tt.top_tf, 0) top_tf,
       length(regexp_extract_all(d.text, '#'))::BIGINT n_hash,
       length(regexp_extract_all(d.text, '\\.\\.\\.'))::BIGINT n_ellipsis,
       (10 * lagg.n_dup_lines <= 3 * lagg.n_lines
        AND 5 * lagg.dup_line_chars <= length(d.text)
        AND (coalesce(tt.n_tokens, 0) < 8 OR 4 * coalesce(tt.top_tf, 0) <= coalesce(tt.n_tokens, 0))) AS keep
FROM documents d JOIN lagg ON lagg.doc_id = d.doc_id
LEFT JOIN tt ON tt.doc_id = d.doc_id
ORDER BY d.doc_id
    """).df().reset_index(drop=True)
    for col in ["n_chars", "n_lines", "n_dup_lines", "dup_line_chars",
                "n_tokens", "top_tf", "n_hash", "n_ellipsis"]:
        np.testing.assert_array_equal(got[col].to_numpy(), want[col].to_numpy(), err_msg=col)
    assert list(got["keep"]) == list(want["keep"])
    # the spam doc and the top-word doc are dropped; clean docs survive
    assert not got.loc[1, "keep"] and not got.loc[2, "keep"]
    assert got.loc[0, "keep"] and got.loc[3, "keep"]


def test_jaccard_join_distributed_df_path(ray_session):
    """forcing the vocabulary over the broadcast gate must route the
    prefix ordering through the groupby+join path and produce
    row-identical prefixes AND identical final pairs (ROADMAP #11)."""
    from functools import partial

    import ray.data

    from chearch_ray.stages.dedup import (
        _prefix_rows,
        _prefix_rows_distributed,
        _shingle_df_broadcast,
        jaccard_similarity_join,
        shingle_payload,
    )

    rng = np.random.default_rng(3)
    base = ["the quick brown fox jumps over the lazy dog and runs away fast",
            "pack my box with five dozen liquor jugs before the party starts"]
    texts = []
    for i in range(60):
        words = base[i % 2].split()
        if i % 3 == 0:  # perturb some docs into near-dups
            words[rng.integers(0, len(words))] = f"w{i}"
        rng.shuffle(words) if i % 7 == 0 else None
        texts.append(" ".join(words) + f" tail{i % 5}")
    t = pa.table({"doc_id": pa.array(np.arange(60, dtype=np.int64)),
                  "text": pa.array(texts)})
    ds = ray.data.from_arrow(t).repartition(4)

    payload = ds.map_batches(
        partial(shingle_payload, text_column="text", w=3),
        batch_format="pyarrow",
    ).materialize()
    df_ref = _shingle_df_broadcast(payload)
    assert df_ref is not None
    bc = (payload.map_batches(partial(_prefix_rows, threshold=0.5, df_ref=df_ref),
                              batch_format="pyarrow")
          .to_pandas().sort_values(["doc_id", "bucket"]).reset_index(drop=True))
    dist = (_prefix_rows_distributed(payload, 0.5, coarse_partitions=8,
                                     join_partitions=4)
            .to_pandas()[bc.columns.tolist()]
            .sort_values(["doc_id", "bucket"]).reset_index(drop=True))
    assert len(bc) > 0 and bc.equals(dist)

    def pairs_df(out):
        return (out.to_pandas().sort_values(["doc_a", "doc_b"])
                .reset_index(drop=True))

    default = pairs_df(jaccard_similarity_join(ds, threshold=0.5))
    forced = pairs_df(jaccard_similarity_join(ds, threshold=0.5,
                                              df_broadcast_limit=0))
    assert len(default) > 0 and default.equals(forced)


# ---------------------------------------------------------- snippets
def test_extract_snippets_edges(ray_session):
    import ray.data

    from chearch_ray.stages.snippets import extract_snippets

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
        "text": pa.array([
            "target at the very start of things",   # pos 0: left-clipped
            "ending with the word target",           # last token: right-clipped
            "no match in this document at all",      # dropped
            "target",                                # 1-token doc
            "first target then target again later",  # first occurrence wins
        ]),
    })
    out = (extract_snippets(ray.data.from_arrow(t), "target", window=2)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["doc_id"].tolist() == [1, 2, 4, 5]
    assert out["pos"].tolist() == [0, 4, 0, 1]
    assert out["snippet"].tolist() == [
        "target at the",
        "the word target",
        "target",
        "first target then target",
    ]


# ------------------------------------------- composed training pipeline
def test_prepare_training_data_composition(ray_session):
    """filter -> dedup -> quota -> pack composition: deterministic,
    partition-invariant, respects every stage's contract."""
    import ray.data

    from chearch_ray.pipelines.training import prepare_training_data

    rng = np.random.default_rng(5)
    rows = []
    for i in range(120):
        lang = ["en", "es", "fr"][i % 3]
        if i % 10 == 0:
            text = "spam\nspam\nspam\nspam\nspam\nx"          # filtered out
        elif i % 7 == 0:
            text = "shared duplicate content body here okay"  # dedup collapses
        else:
            text = " ".join(f"tok{i}w{j}" for j in range(5 + i % 9))
        rows.append({"doc_id": i, "lang": lang, "text": text})
    t = pa.Table.from_pylist(rows)

    a = (prepare_training_data(ray.data.from_arrow(t).repartition(1),
                               quota=10, max_tokens=32)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (prepare_training_data(ray.data.from_arrow(t).repartition(6),
                               quota=10, max_tokens=32)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert a.equals(b)
    ids = set(a["doc_id"])
    # spam docs are filtered
    assert not any(i % 10 == 0 for i in ids)
    # dedup ran before sampling: no duplicate-family doc other than the
    # min-doc_id winner (7) can appear (7 itself may lose the quota draw)
    dups = [i for i in ids if i % 7 == 0 and i % 10 != 0]
    assert dups in ([], [7])
    # quota bound per lang
    langs = {i: ["en", "es", "fr"][i % 3] for i in ids}
    import collections
    assert max(collections.Counter(langs.values()).values()) <= 10
    # packing invariant
    pre = a["bin"].to_numpy() * 32 + a["bin_offset"].to_numpy()
    cs = np.cumsum(a["n_tokens"].to_numpy()) - a["n_tokens"].to_numpy()
    assert (pre == cs).all()


# ------------------------------------------------------- KMV sketch
def test_kmv_distinct_sketch(ray_session):
    import duckdb
    import ray.data

    from chearch_ray.stages.sketch import kmv_distinct

    rng = np.random.default_rng(13)
    keys = rng.integers(0, 5000, size=20000).astype(np.int64)  # ~4000 distinct
    t = pa.table({"k": pa.array(keys)})
    exact = len(np.unique(keys))
    est = kmv_distinct(ray.data.from_arrow(t), "k", k=256)
    # KMV with k=256: relative error ~1/sqrt(k) ~ 6%; allow 4 sigma
    assert abs(est - exact) / exact < 0.25, (est, exact)
    # partition invariance
    est7 = kmv_distinct(ray.data.from_arrow(t).repartition(7), "k", k=256)
    assert est == est7
    # below-k input -> exact count
    small = pa.table({"k": pa.array(np.arange(100, dtype=np.int64))})
    assert kmv_distinct(ray.data.from_arrow(small), "k", k=256) == 100
    # SQL mirror bit-exact
    con = duckdb.connect()
    con.register("tbl", t)
    want = con.execute("""
WITH h AS (SELECT DISTINCT (k::HUGEINT * 6364136223846793005)
                           % 18446744073709551616::HUGEINT AS hv FROM tbl),
kk AS (SELECT hv FROM h ORDER BY hv LIMIT 256),
agg AS (SELECT count(*)::BIGINT AS n, max(hv) AS kth FROM kk)
SELECT CASE WHEN (SELECT n FROM agg) < 256 THEN (SELECT n FROM agg)
       ELSE ((255::HUGEINT * 18446744073709551616::HUGEINT)
             // (SELECT kth FROM agg))::BIGINT END AS est
    """).fetchone()[0]
    assert est == want


# -------------------------------------------------- exact quantiles
def test_exact_quantiles_vs_duckdb(ray_session):
    import duckdb
    import ray.data

    from chearch_ray.stages.sketch import exact_quantiles

    rng = np.random.default_rng(23)
    # lognormal-ish skew + heavy duplicates at one value
    v = np.concatenate([
        (rng.lognormal(3, 1.5, 30000) * 100).astype(np.int64),
        np.full(5000, 777, dtype=np.int64),
        np.array([0, 1, 2**40], dtype=np.int64),
    ])
    t = pa.table({"cents": pa.array(v)})
    qs = [0.01, 0.25, 0.5, 0.9, 0.99, 1.0]
    # gather_limit low -> the narrowing loop actually runs
    got = exact_quantiles(ray.data.from_arrow(t).repartition(6), "cents", qs,
                          n_buckets=256, gather_limit=2000).to_pandas()
    con = duckdb.connect()
    con.register("tbl", t)
    for q, val in zip(got["q"], got["cents"]):
        want = con.execute(f"SELECT quantile_disc(cents, {q}) FROM tbl").fetchone()[0]
        assert val == want, (q, val, want)
    # partition invariance
    got2 = exact_quantiles(ray.data.from_arrow(t).repartition(1), "cents", qs,
                           n_buckets=4096, gather_limit=100_000).to_pandas()
    assert got.equals(got2)


def test_exact_group_quantiles_vs_duckdb(ray_session):
    import duckdb
    import ray.data

    from chearch_ray.stages.sketch import exact_group_quantiles

    rng = np.random.default_rng(31)
    n = 40_000
    groups = rng.choice(["a", "b", "c", "skewed"], size=n,
                        p=[0.05, 0.25, 0.3, 0.4])
    v = (rng.lognormal(3, 1.5, n) * 100).astype(np.int64)
    # heavy duplicates inside one group (collapsed-range path)
    v[groups == "skewed"] = np.where(
        rng.random((groups == "skewed").sum()) < 0.8, 777,
        v[groups == "skewed"])
    t = pa.table({"g": pa.array(groups), "cents": pa.array(v)})
    qs = [0.01, 0.5, 0.99]
    got = exact_group_quantiles(
        ray.data.from_arrow(t).repartition(6), "cents", qs, by="g",
        n_buckets=64, gather_limit=500).to_pandas()
    con = duckdb.connect()
    con.register("tbl", t)
    for g, q, val in zip(got["g"], got["q"], got["cents"]):
        want = con.execute(
            f"SELECT quantile_disc(cents, {q}) FROM tbl WHERE g = '{g}'"
        ).fetchone()[0]
        assert val == want, (g, q, val, want)
    # partition invariance + straight-to-gather path
    got2 = exact_group_quantiles(
        ray.data.from_arrow(t).repartition(1), "cents", qs, by="g",
        n_buckets=4096, gather_limit=100_000).to_pandas()
    assert got.equals(got2)


# ----------------------------------------------------- bigram counts
def test_top_bigrams_vs_duckdb(ray_session):
    import duckdb
    import ray.data

    from chearch_ray.stages.textstats import top_bigrams

    rng = np.random.default_rng(29)
    words = ["alpha", "beta", "gamma", "delta", "epsilon"]
    texts = [" ".join(rng.choice(words, size=rng.integers(2, 30)))
             for _ in range(300)]
    t = pa.table({"doc_id": pa.array(np.arange(300, dtype=np.int64)),
                  "text": pa.array(texts)})
    got = top_bigrams(ray.data.from_arrow(t).repartition(5), k=10).to_pylist()
    con = duckdb.connect()
    con.register("documents", t)
    want = con.execute("""
WITH ptoks AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
               x -> x <> '') AS ts FROM documents),
ptok AS (SELECT doc_id, unnest(ts) AS term, generate_subscripts(ts, 1) AS ord FROM ptoks),
bg AS (SELECT a.term ta, b.term tb FROM ptok a JOIN ptok b
       ON b.doc_id = a.doc_id AND b.ord = a.ord + 1)
SELECT ta, tb, count(*)::BIGINT n FROM bg GROUP BY ta, tb
ORDER BY n DESC, ta, tb LIMIT 10
    """).arrow().to_pylist()
    assert got == want


# ------------------------------------------------------ PII scrubbing
def test_pii_scrub_vs_duckdb():
    import duckdb

    from chearch_ray.stages.textstats import PiiScrub

    docs = [
        "contact alice@example.com or bob.smith+tag@sub.domain.org today",
        "card 1234567890123456 and pin 12345 and zip 90210",
        "email-with-digits user123456@host.io plus raw 999999 run",
        "clean text with no sensitive content at all",
        "",
    ]
    t = pa.table({"doc_id": pa.array(np.arange(len(docs), dtype=np.int64)),
                  "text": pa.array(docs)})
    got = PiiScrub()(t).to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", t)
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    num = "[0-9]{6,}"
    want = con.execute(f"""
WITH s1 AS (SELECT doc_id,
  length(regexp_extract_all(text, '{email}'))::BIGINT n_email,
  regexp_replace(text, '{email}', '<EMAIL>', 'g') t1 FROM documents),
s2 AS (SELECT doc_id, n_email,
  length(regexp_extract_all(t1, '{num}'))::BIGINT n_number,
  regexp_replace(t1, '{num}', '<NUM>', 'g') scrubbed FROM s1)
SELECT doc_id, n_email, n_number, scrubbed FROM s2 ORDER BY doc_id
    """).df().reset_index(drop=True)
    for col in ["n_email", "n_number"]:
        np.testing.assert_array_equal(got[col].to_numpy(), want[col].to_numpy(), err_msg=col)
    assert got["scrubbed"].tolist() == want["scrubbed"].tolist()
    # semantic spot checks
    assert got.loc[0, "n_email"] == 2 and "<EMAIL>" in got.loc[0, "scrubbed"]
    assert got.loc[1, "n_number"] == 1  # 16-digit card, not the 5-digit pin/zip
    assert got.loc[2, "n_email"] == 1 and got.loc[2, "n_number"] == 1  # digits inside the email counted once
    assert got.loc[3, "scrubbed"] == docs[3]


# ------------------------------------------------- TPC-H analytics
def test_pricing_summary_and_revenue_join(ray_session):
    import duckdb
    import ray.data
    import pyarrow.parquet as pq

    from chearch_ray.pipelines.analytics import pricing_summary, revenue_by_nation

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for n in ["lineitem", "orders", "customer", "nation"]:
        con.execute(f"CREATE VIEW {n} AS SELECT * FROM read_parquet('{sf}/{n}.parquet')")

    ps = (pricing_summary(ray.data.read_parquet(f"{sf}/lineitem.parquet"))
          .to_pandas().sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True))
    want = con.execute("""
SELECT l_returnflag, l_linestatus, count(*)::BIGINT count_order,
       sum(CAST(round(l_quantity * 100) AS BIGINT))::BIGINT sum_qty_cents,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT))::BIGINT sum_base_cents,
       sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))::BIGINT sum_disc_cents,
       sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT))::BIGINT sum_charge_cents
FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-06-30 00:00:00'
GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus
    """).df().reset_index(drop=True)
    assert ps[want.columns.tolist()].equals(want)

    rv = (revenue_by_nation(
            ray.data.read_parquet(f"{sf}/orders.parquet"),
            ray.data.read_parquet(f"{sf}/customer.parquet"),
            pq.read_table(f"{sf}/nation.parquet"), join_partitions=4)
          .to_pandas().sort_values("n_name").reset_index(drop=True))
    want2 = con.execute("""
SELECT n.n_name, count(*)::BIGINT n_orders,
       sum(CAST(round(o.o_totalprice * 100) AS BIGINT))::BIGINT total_cents
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY n.n_name ORDER BY n.n_name
    """).df().reset_index(drop=True)
    assert rv[want2.columns.tolist()].equals(want2)


# ---------------------------------------------------------------- PQ
def test_pq_recall_and_determinism(ray_session):
    import ray.data

    from chearch_ray.stages.similarity import (
        knn_brute_force, pq_encode, pq_search, pq_train,
    )

    rng = np.random.default_rng(31)
    # clustered vectors: PQ must find cluster-mates
    centers = rng.standard_normal((10, 64)) * 4
    mat = np.concatenate([c + rng.standard_normal((80, 64)) for c in centers])
    n = len(mat)
    t = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(mat.tolist(), type=pa.list_(pa.float32())),
    })
    ds = ray.data.from_arrow(t).repartition(4)
    books = pq_train(ds, m=8, n_codes=64, sample_size=n)
    assert books.shape == (8, 64, 8)
    # deterministic: retrain == identical codebooks
    books2 = pq_train(ds, m=8, n_codes=64, sample_size=n)
    np.testing.assert_array_equal(books, books2)

    codes = pq_encode(ds, books).materialize()
    enc = codes.take_all()
    assert len(enc) == n and all(len(r["pq_code"]) == 8 for r in enc)  # 32x compression

    queries = mat[:8].astype(np.float64)
    exact = knn_brute_force(ray.data.from_arrow(t), queries, k=10).to_pandas()
    short = pq_search(codes, books, queries, k=50).to_pandas()
    # PQ's contract is coarse retrieval: (a) every ADC top-10 hit comes
    # from the query's true cluster; (b) a 50-candidate shortlist
    # covers most of the exact top-10 (the re-rank window pattern).
    # Strict recall@10 WITHIN a tight cluster is beyond 8-byte codes.
    hits = total = 0
    for qid in range(8):
        a10 = short[short["query_id"] == qid].head(10)["vec_id"].to_numpy()
        assert (a10 // 80 == qid // 80).all(), qid
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        s50 = set(short[short["query_id"] == qid]["vec_id"])
        hits += len(e & s50)
        total += len(e)
    assert hits / total >= 0.75, hits / total


def test_ivfpq_full_probe_equals_pq(ray_session):
    """with nprobe = n_centroids IVF-PQ must equal plain PQ over the
    full code set — the routing machinery adds nothing and loses
    nothing; with a small nprobe it still finds cluster-mates."""
    import ray.data

    from chearch_ray.stages.similarity import (
        ivfpq_build, ivfpq_search, pq_search,
    )

    rng = np.random.default_rng(37)
    centers = rng.standard_normal((8, 64)) * 4
    mat = np.concatenate([c + rng.standard_normal((60, 64)) for c in centers])
    n = len(mat)
    t = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(mat.tolist(), type=pa.list_(pa.float32())),
    })
    ds = ray.data.from_arrow(t).repartition(3)
    centroids, books, codes = ivfpq_build(ds, n_centroids=8, m=8, n_codes=64,
                                          sample_size=n)
    codes = codes.materialize()
    queries = mat[:6].astype(np.float64)

    full = (ivfpq_search(codes, centroids, books, queries, k=10,
                         nprobe=len(centroids))
            .to_pandas().sort_values(["query_id", "vec_id"]).reset_index(drop=True))
    plain = (pq_search(codes.drop_columns(["centroid"]), books, queries, k=10)
             .to_pandas().sort_values(["query_id", "vec_id"]).reset_index(drop=True))
    assert full.equals(plain)

    routed = ivfpq_search(codes, centroids, books, queries, k=10, nprobe=2).to_pandas()
    for qid in range(6):
        got = routed[routed["query_id"] == qid]["vec_id"].to_numpy()
        assert len(got) == 10 and (got // 60 == qid // 60).all()


def test_ivfpq_disk_layout_round_trip(ray_session, tmp_path):
    """ivfpq_write -> ivfpq_load round-trips centroids/codebooks
    exactly, and the pruned-read search matches the in-memory routed
    search row-for-row."""
    import os

    import ray.data

    from chearch_ray.stages.similarity import (
        ivfpq_build, ivfpq_load, ivfpq_search, ivfpq_search_dir, ivfpq_write,
    )

    rng = np.random.default_rng(41)
    centers = rng.standard_normal((6, 32)) * 4
    mat = np.concatenate([c + rng.standard_normal((50, 32)) for c in centers])
    t = pa.table({
        "vec_id": pa.array(np.arange(len(mat), dtype=np.int64)),
        "embedding": pa.array(mat.tolist(), type=pa.list_(pa.float32())),
    })
    ds = ray.data.from_arrow(t).repartition(3)
    cents, books, codes = ivfpq_build(ds, n_centroids=6, m=8, n_codes=32,
                                      sample_size=len(mat))
    codes = codes.materialize()
    idx = str(tmp_path / "ivfpq")
    ivfpq_write(codes, cents, books, idx)
    c2, b2 = ivfpq_load(idx)
    np.testing.assert_allclose(c2, cents)
    np.testing.assert_allclose(b2, books)
    # code partitions exist per hive dir
    dirs = sorted(os.listdir(os.path.join(idx, "codes")))
    assert all(d.startswith("centroid=") for d in dirs) and len(dirs) >= 3

    queries = mat[:4].astype(np.float64)
    mem = (ivfpq_search(codes, cents, books, queries, k=8, nprobe=2)
           .to_pandas().sort_values(["query_id", "vec_id"]).reset_index(drop=True))
    disk = (ivfpq_search_dir(idx, queries, k=8, nprobe=2)
            .to_pandas().sort_values(["query_id", "vec_id"]).reset_index(drop=True))
    assert mem.equals(disk)


def test_ivfpq_residual_adc_math(ray_session, tmp_path):
    """residual ADC score must equal <q, centroid + reconstructed
    residual> exactly — pins the per-(query, centroid) offset plus the
    LUT sum against a driver-side reconstruction; also round-trips the
    residual flag through the disk layout."""
    import ray.data

    from chearch_ray.stages.similarity import (
        ivfpq_build, ivfpq_is_residual, ivfpq_search, ivfpq_search_dir,
        ivfpq_write, normalize_rows,
    )

    rng = np.random.default_rng(47)
    centers = rng.standard_normal((5, 32)) * 4
    mat = np.concatenate([c + rng.standard_normal((40, 32)) for c in centers])
    n = len(mat)
    t = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(mat.tolist(), type=pa.list_(pa.float32())),
    })
    ds = ray.data.from_arrow(t).repartition(3)
    cents, books, codes = ivfpq_build(ds, n_centroids=5, m=8, n_codes=32,
                                      sample_size=n, residual=True)
    codes = codes.materialize()
    queries = mat[:3].astype(np.float64)
    got = (ivfpq_search(codes, cents, books, queries, k=n,
                        nprobe=len(cents), residual=True)
           .to_pandas().sort_values(["query_id", "vec_id"]).reset_index(drop=True))

    # driver-side reconstruction: x_hat = centroid[c] + books[j][code_j]
    cdf = codes.to_pandas().sort_values("vec_id").reset_index(drop=True)
    code_mat = np.frombuffer(b"".join(cdf["pq_code"]), dtype=np.uint8).reshape(n, 8)
    sub = books.shape[2]
    recon = cents[cdf["centroid"].to_numpy()] + np.concatenate(
        [books[j][code_mat[:, j]] for j in range(8)], axis=1
    )
    q = normalize_rows(queries)
    want = q @ recon.T  # [3, n]
    for _, row in got.iterrows():
        assert abs(row["sim"] - want[int(row["query_id"]), int(row["vec_id"])]) < 1e-9

    # residual coding beats plain coding at the same budget on
    # clustered data: reconstruction error is strictly smaller
    _, pbooks, pcodes = ivfpq_build(ds, n_centroids=5, m=8, n_codes=32,
                                    sample_size=n, residual=False)
    pdf = pcodes.materialize().to_pandas().sort_values("vec_id").reset_index(drop=True)
    pcode_mat = np.frombuffer(b"".join(pdf["pq_code"]), dtype=np.uint8).reshape(n, 8)
    precon = np.concatenate([pbooks[j][pcode_mat[:, j]] for j in range(8)], axis=1)
    norm = normalize_rows(mat.astype(np.float64))
    err_res = ((norm - recon) ** 2).sum(axis=1).mean()
    err_plain = ((norm - precon) ** 2).sum(axis=1).mean()
    assert err_res < err_plain, (err_res, err_plain)

    # disk round-trip carries the residual flag and reproduces results
    idx = str(tmp_path / "ivfpq_res")
    ivfpq_write(codes, cents, books, idx, residual=True)
    assert ivfpq_is_residual(idx)
    mem = (ivfpq_search(codes, cents, books, queries, k=8, nprobe=2, residual=True)
           .to_pandas().sort_values(["query_id", "vec_id"]).reset_index(drop=True))
    disk = (ivfpq_search_dir(idx, queries, k=8, nprobe=2)
            .to_pandas().sort_values(["query_id", "vec_id"]).reset_index(drop=True))
    assert mem.equals(disk)


def test_ivfpq_refined_exact_recall(ray_session):
    """the refine stage re-scores the ADC shortlist with true vectors:
    sims are exact cosines, and a full-corpus shortlist reproduces
    brute-force top-k bit-for-bit."""
    import ray.data

    from chearch_ray.stages.similarity import (
        ivfpq_build, ivfpq_search_refined, knn_brute_force, normalize_rows,
    )

    rng = np.random.default_rng(53)
    centers = rng.standard_normal((6, 32)) * 4
    mat = np.concatenate([c + rng.standard_normal((50, 32)) for c in centers])
    n = len(mat)
    t = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(mat.tolist(), type=pa.list_(pa.float32())),
    })
    ds = ray.data.from_arrow(t).repartition(3)
    cents, books, codes = ivfpq_build(ds, n_centroids=6, m=8, n_codes=32,
                                      sample_size=n, residual=True)
    codes = codes.materialize()
    queries = mat[:4].astype(np.float64)

    # full shortlist -> refine IS brute force
    full = (ivfpq_search_refined(codes, cents, books, ds, queries, k=10,
                                 nprobe=len(cents), refine_k=n, residual=True)
            .to_pandas().reset_index(drop=True))
    exact = knn_brute_force(ray.data.from_arrow(t), queries, k=10).to_pandas()
    assert full["vec_id"].tolist() == exact["vec_id"].tolist()
    np.testing.assert_allclose(full["sim"].to_numpy(), exact["sim"].to_numpy(),
                               rtol=0, atol=1e-12)

    # moderate shortlist: every returned sim is the EXACT cosine (the
    # float32 corpus is re-read, so compare against the same cast)
    part = (ivfpq_search_refined(codes, cents, books, ds, queries, k=10,
                                 nprobe=2, refine_k=30, residual=True)
            .to_pandas())
    norm = normalize_rows(np.asarray(
        pa.table({"e": t["embedding"]})["e"].to_pylist(), dtype=np.float64))
    qn = normalize_rows(queries)
    for _, row in part.iterrows():
        true = float(qn[int(row["query_id"])] @ norm[int(row["vec_id"])])
        assert abs(row["sim"] - true) < 1e-9


def test_hash_split_vs_sql_and_invariance(ray_session):
    """hash_split == the SQL HUGEINT CASE mirror; assignment is
    partition-invariant and roughly ratio-shaped."""
    import duckdb
    import ray.data

    from chearch_ray.stages.sample import hash_split

    ids = np.arange(0, 5000, dtype=np.int64) * 7 + 3
    t = pa.table({"doc_id": pa.array(ids)})
    ratios = {"train": 0.8, "val": 0.1, "test": 0.1}
    got = (hash_split(ray.data.from_arrow(t).repartition(6), ratios)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b1 = int(np.cumsum([0.8])[0] * 2**64)
    b2 = int(np.cumsum([0.8, 0.1])[1] * 2**64)
    con = duckdb.connect()
    con.register("documents", t)
    want = con.execute(f"""
        WITH h AS (SELECT doc_id,
            (doc_id::HUGEINT * 6364136223846793005) % 18446744073709551616::HUGEINT AS hv
            FROM documents)
        SELECT doc_id, CASE WHEN hv < {b1}::HUGEINT THEN 'train'
                            WHEN hv < {b2}::HUGEINT THEN 'val'
                            ELSE 'test' END AS split
        FROM h ORDER BY doc_id
    """).df().reset_index(drop=True)
    assert got["split"].tolist() == want["split"].tolist()
    # ratio-shaped (hash-uniform): train within a few points of 80%
    frac = (got["split"] == "train").mean()
    assert 0.75 < frac < 0.85, frac
    # partition-invariant: same result from a single block
    again = (hash_split(ray.data.from_arrow(t), ratios)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert again["split"].tolist() == got["split"].tolist()


def test_decontaminate_vs_duckdb_and_planted_overlap(ray_session):
    """decontaminate == the SQL distinct-shared-5-gram count, and a
    doc that copies a benchmark span is flagged while clean docs are
    not."""
    import duckdb
    import ray.data

    from chearch_ray.stages.decontaminate import decontaminate, shingle_hash_set

    rng = np.random.default_rng(61)
    vocab = [f"w{i}" for i in range(200)]
    bench_texts = [
        " ".join(rng.choice(vocab, size=rng.integers(8, 30))) for _ in range(5)
    ]
    clean = [" ".join(rng.choice(vocab, size=rng.integers(3, 30))) for _ in range(40)]
    # plant: doc 50 copies 6 consecutive tokens from bench doc 1
    span = " ".join(bench_texts[1].split()[2:8])
    planted = "filler tokens here " + span + " trailing words"
    texts = bench_texts + clean + [planted]
    ids = np.arange(len(texts), dtype=np.int64)
    t = pa.table({"doc_id": pa.array(ids), "text": pa.array(texts)})

    bench_tbl = t.slice(0, 5)
    hashes = shingle_hash_set(bench_tbl, w=5)
    got = (
        decontaminate(ray.data.from_arrow(t).repartition(4), hashes, w=5, min_overlap=1)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert bool(got.loc[len(texts) - 1, "contaminated"])
    assert got.loc[:4, "contaminated"].all()  # bench docs match themselves

    con = duckdb.connect()
    con.register("documents", t)
    want = con.execute("""
WITH ptoks AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text),
           '[^a-z0-9_]+'), x -> x <> '') AS ts FROM documents),
ptok AS (SELECT doc_id, unnest(ts) AS term, generate_subscripts(ts, 1) AS ord FROM ptoks),
ng0 AS (SELECT doc_id, term,
        lead(term, 1) OVER (PARTITION BY doc_id ORDER BY ord) AS t1,
        lead(term, 2) OVER (PARTITION BY doc_id ORDER BY ord) AS t2,
        lead(term, 3) OVER (PARTITION BY doc_id ORDER BY ord) AS t3,
        lead(term, 4) OVER (PARTITION BY doc_id ORDER BY ord) AS t4 FROM ptok),
ng AS (SELECT doc_id, term || ' ' || t1 || ' ' || t2 || ' ' || t3 || ' ' || t4 AS g
       FROM ng0 WHERE t4 IS NOT NULL),
ngd AS (SELECT DISTINCT doc_id, g FROM ng),
bench AS (SELECT DISTINCT g FROM ng WHERE doc_id < 5),
cnt AS (SELECT doc_id, count(*)::BIGINT AS n_shingles FROM ngd GROUP BY doc_id),
ov AS (SELECT n.doc_id, count(*)::BIGINT AS n_overlap
       FROM ngd n JOIN bench b ON n.g = b.g GROUP BY n.doc_id)
SELECT d.doc_id::BIGINT AS doc_id,
       coalesce(c.n_shingles, 0)::BIGINT AS n_shingles,
       coalesce(o.n_overlap, 0)::BIGINT AS n_overlap,
       coalesce(o.n_overlap, 0) >= 1 AS contaminated
FROM documents d
LEFT JOIN cnt c ON d.doc_id = c.doc_id
LEFT JOIN ov o ON d.doc_id = o.doc_id
ORDER BY doc_id
    """).df().reset_index(drop=True)
    for c in ["doc_id", "n_shingles", "n_overlap"]:
        np.testing.assert_array_equal(got[c].to_numpy(), want[c].to_numpy(), err_msg=c)
    np.testing.assert_array_equal(
        got["contaminated"].to_numpy(), want["contaminated"].to_numpy().astype(bool)
    )


def test_exact_quantiles_negative_values(ray_session):
    import duckdb
    import ray.data

    from chearch_ray.stages.sketch import exact_quantiles

    rng = np.random.default_rng(43)
    v = (rng.standard_normal(20000) * 10000).astype(np.int64)  # centered on 0
    t = pa.table({"c": pa.array(v)})
    got = exact_quantiles(ray.data.from_arrow(t).repartition(4), "c",
                          [0.1, 0.5, 0.9], n_buckets=128, gather_limit=500).to_pandas()
    con = duckdb.connect(); con.register("tbl", t)
    for q, val in zip(got["q"], got["c"]):
        want = con.execute(f"SELECT quantile_disc(c, {q}) FROM tbl").fetchone()[0]
        assert val == want, (q, val, want)


# ------------------------------------------------ exact substring dedup
def _substring_brute(table: pa.Table, w: int):
    """pure-Python reference: doc -> (n_grams, n_dup_grams, keep)."""
    from chearch_ray.functions.tokenizer import tokenize

    toks = tokenize(table["text"]).to_pylist()
    ids = table["doc_id"].to_pylist()
    grams = {
        d: {tuple(ts[i : i + w]) for i in range(len(ts) - w + 1)}
        for d, ts in zip(ids, toks)
    }
    first: dict[tuple, int] = {}
    count: dict[tuple, int] = {}
    for d in sorted(ids):
        for g in grams[d]:
            first[g] = min(first.get(g, d), d)
            count[g] = count.get(g, 0) + 1
    out = {}
    for d in ids:
        dup = sum(1 for g in grams[d] if count[g] >= 2)
        flagged = any(first[g] < d for g in grams[d])
        out[d] = (len(grams[d]), dup, not flagged)
    return out


def test_substring_dedup_vs_bruteforce(ray_session, docs):
    import ray.data

    from chearch_ray.stages.dedup import substring_dedup

    got = substring_dedup(ray.data.from_arrow(docs), w=3).to_pandas().set_index("doc_id")
    want = _substring_brute(docs, w=3)
    assert len(got) == len(docs)
    for d, (ng, nd, keep) in want.items():
        row = got.loc[d]
        assert (row["n_grams"], row["n_dup_grams"], bool(row["keep"])) == (ng, nd, keep), d
    # the exact dup (doc 2) and the near dup (doc 3, shares a long
    # prefix with doc 1) are both dropped; doc 1 survives
    assert bool(got.loc[1, "keep"]) and not bool(got.loc[2, "keep"])
    assert not bool(got.loc[3, "keep"])
    assert got.loc[4:6, "keep"].all()


def test_substring_dedup_join_path_identical(ray_session, docs):
    """broadcast_limit=0 forces the distributed join path; output must
    be row-identical to the broadcast path."""
    import ray.data

    from chearch_ray.stages.dedup import substring_dedup

    a = (
        substring_dedup(ray.data.from_arrow(docs), w=3)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    b = (
        substring_dedup(ray.data.from_arrow(docs), w=3, broadcast_limit=0, join_partitions=3)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_substring_dedup_short_docs_have_zero_grams(ray_session):
    import ray.data

    from chearch_ray.stages.dedup import substring_dedup

    t = pa.Table.from_pylist(
        [{"doc_id": 1, "text": "one two"}, {"doc_id": 2, "text": "one two"}]
    )
    got = substring_dedup(ray.data.from_arrow(t), w=5).to_pandas().set_index("doc_id")
    assert (got["n_grams"] == 0).all() and got["keep"].all()


def test_weighted_sample_deterministic_and_proportional(ray_session):
    """keep rate tracks the weight; decision is a pure function of
    (id, weight) — corpus- and partition-invariant."""
    import ray.data

    from chearch_ray.stages.sample import weighted_sample

    n = 4000
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "quality": pa.array(np.where(np.arange(n) % 2 == 0, 0.9, 0.1)),
        }
    )
    out = weighted_sample(ray.data.from_arrow(t).repartition(4)).to_pandas()
    hi = out[out["quality"] > 0.5]["keep"].mean()
    lo = out[out["quality"] < 0.5]["keep"].mean()
    assert 0.85 <= hi <= 0.95 and 0.05 <= lo <= 0.15
    # partition-invariance: same decisions with a different layout
    out2 = weighted_sample(ray.data.from_arrow(t).repartition(13)).to_pandas()
    a = out.sort_values("doc_id", ignore_index=True)
    b = out2.sort_values("doc_id", ignore_index=True)
    assert (a["keep"] == b["keep"]).all()
    # weight 0 drops everything, weight 1 keeps everything
    edge = pa.table({"doc_id": pa.array([1, 2], type=pa.int64()),
                     "quality": pa.array([0.0, 1.0])})
    e = weighted_sample(ray.data.from_arrow(edge)).to_pandas().set_index("doc_id")
    assert not e.loc[1, "keep"] and bool(e.loc[2, "keep"])


# ---------------------------------------------- semi / anti hash join
def test_hash_semi_anti_join_vs_numpy(ray_session):
    """Distributed membership join matches a plain np.isin reference,
    payload intact, regardless of partitioning; anti is the exact
    complement."""
    import ray.data

    from chearch_ray.stages.joins import hash_anti_join, hash_semi_join

    rng = np.random.default_rng(47)
    n = 20_000
    left = pa.table({
        "k": pa.array(rng.integers(0, 5_000, n).astype(np.int64)),
        "payload": pa.array(rng.integers(0, 100, n).astype(np.int64)),
        "tag": pa.array(rng.choice(["x", "y"], n)),
    })
    # probe side heavily duplicated (tests map-side dedup) + misses
    right = pa.table({
        "rk": pa.array(np.repeat(rng.integers(0, 2_500, 400), 50).astype(np.int64)),
    })
    lds = ray.data.from_arrow(left).repartition(9)
    rds = ray.data.from_arrow(right).repartition(4)
    member = np.isin(left["k"].to_numpy(), np.unique(right["rk"].to_numpy()))

    def collect(ds):
        t = pa.concat_tables(ds.iter_batches(batch_size=None, batch_format="pyarrow"))
        return t.to_pandas().sort_values(list(t.column_names)).reset_index(drop=True)

    semi = collect(hash_semi_join(lds, rds, on="k", right_on="rk",
                                  payload=["k", "payload", "tag"], n_partitions=13))
    want = left.to_pandas()[member].sort_values(["k", "payload", "tag"]).reset_index(drop=True)
    assert semi.equals(want)
    anti = collect(hash_anti_join(lds, rds, on="k", right_on="rk",
                                  payload=["k", "payload", "tag"], n_partitions=13))
    want_a = left.to_pandas()[~member].sort_values(["k", "payload", "tag"]).reset_index(drop=True)
    assert anti.equals(want_a)
    assert len(semi) + len(anti) == n


def test_semi_anti_analytics_vs_duckdb(ray_session):
    """EXISTS / NOT EXISTS pipelines match DuckDB on the sf0.001
    tables, including the anti-join's schema-stable empty result."""
    import duckdb
    import ray.data

    from chearch_ray.pipelines.analytics import (
        inactive_customer_segments,
        returned_order_priority,
    )

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ["orders", "lineitem", "customer"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

    got = (returned_order_priority(
        ray.data.read_parquet(f"{sf}/orders.parquet",
                              columns=["o_orderkey", "o_orderpriority", "o_totalprice"]),
        ray.data.read_parquet(f"{sf}/lineitem.parquet",
                              columns=["l_orderkey", "l_returnflag"]))
        .to_pandas().sort_values("o_orderpriority").reset_index(drop=True))
    want = con.execute("""
SELECT o_orderpriority, count(*)::BIGINT AS n_orders,
       sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS total_cents
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o_orderpriority ORDER BY o_orderpriority""").df()
    assert got.equals(want)

    cust = ray.data.read_parquet(
        f"{sf}/customer.parquet", columns=["c_custkey", "c_mktsegment", "c_acctbal"])
    orders = ray.data.read_parquet(
        f"{sf}/orders.parquet", columns=["o_custkey", "o_orderdate"])
    got2 = inactive_customer_segments(cust, orders, since="1998-01-01").to_pandas()
    want2 = con.execute("""
SELECT c_mktsegment, count(*)::BIGINT AS n_customers,
       sum(CAST(round(c_acctbal * 100) AS BIGINT))::BIGINT AS acctbal_cents
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
GROUP BY c_mktsegment""").df()
    g = got2.sort_values("c_mktsegment").reset_index(drop=True)
    w = want2.sort_values("c_mktsegment").reset_index(drop=True)
    assert g.equals(w), (g, w)
    # since earlier than every order -> empty, schema intact
    empty = inactive_customer_segments(
        cust, orders, since="1990-01-01").to_pandas()
    assert len(empty) == 0
    assert list(empty.columns) == ["c_mktsegment", "n_customers", "acctbal_cents"]


def test_kmv_distinct_by_group(ray_session):
    """Grouped KMV: per-group estimates equal the ungrouped sketch run
    on each group's rows alone (merge correctness), exact below k,
    partition-invariant."""
    import ray.data

    from chearch_ray.stages.sketch import kmv_distinct, kmv_distinct_by

    rng = np.random.default_rng(53)
    n = 30_000
    g = rng.choice(["big", "mid", "tiny"], size=n, p=[0.6, 0.35, 0.05])
    # distinct-universe sizes: big >> k, mid ~ k, tiny << k
    key = np.where(g == "big", rng.integers(0, 5000, n),
                   np.where(g == "mid", rng.integers(0, 300, n),
                            rng.integers(0, 17, n))).astype(np.int64)
    t = pa.table({"g": pa.array(g), "k": pa.array(key)})
    k = 256
    got = kmv_distinct_by(ray.data.from_arrow(t).repartition(8), "k",
                          by="g", k=k).to_pandas()
    for grp in ["big", "mid", "tiny"]:
        sub = t.filter(pa.compute.equal(t["g"], grp))
        want = kmv_distinct(ray.data.from_arrow(sub), "k", k=k)
        gotv = int(got.loc[got["g"] == grp, "n_distinct_est"].iloc[0])
        assert gotv == want, (grp, gotv, want)
        true = len(np.unique(sub["k"].to_numpy()))
        if true < k:
            assert gotv == true  # exact below k
        else:
            assert abs(gotv - true) / true < 0.2
    got2 = kmv_distinct_by(ray.data.from_arrow(t).repartition(1), "k",
                           by="g", k=k).to_pandas()
    assert got.equals(got2)


def test_frequent_terms_uniform_spread_hitter(ray_session):
    """A term spread thinly but uniformly across every block (never a
    LOCAL standout by a large margin) must still be caught — the
    pigeonhole candidate rule guarantees a superset; the exact verify
    pass then prunes the near-misses."""
    import duckdb
    import ray.data

    from chearch_ray.stages.textstats import frequent_terms

    rng = np.random.default_rng(59)
    filler = [f"w{i}" for i in range(2000)]
    docs = []
    for d in range(400):
        toks = list(rng.choice(filler, size=60))
        # 'needle' ~1.6% of every doc (above 1/100); 'chaff' ~0.8% (below)
        toks.append("needle")
        if d % 2 == 0:
            toks.append("chaff")
        docs.append(" ".join(toks))
    t = pa.table({"text": pa.array(docs)})
    got = frequent_terms(ray.data.from_arrow(t).repartition(10),
                         denom=100).to_pandas()
    con = duckdb.connect()
    con.register("documents", t)
    want = con.execute("""
WITH tok AS (SELECT unnest(list_filter(regexp_split_to_array(lower(text),
             '[^a-z0-9_]+'), x -> x <> '')) AS term FROM documents),
tot AS (SELECT count(*)::BIGINT AS n FROM tok),
c AS (SELECT term, count(*)::BIGINT AS n FROM tok GROUP BY term)
SELECT term, n FROM c WHERE n * 100 >= (SELECT n FROM tot)
ORDER BY n DESC, term""").df()
    assert got.equals(want), (got, want)
    assert "needle" in set(got["term"])
    assert "chaff" not in set(got["term"])
    # partition invariance
    got2 = frequent_terms(ray.data.from_arrow(t).repartition(1),
                          denom=100).to_pandas()
    assert got.equals(got2)


def test_dedup_against_store_vs_sets(ray_session):
    """Incremental store dedup: survivors are exactly the new rows
    whose content is absent from the store; intra-shard duplicates
    both survive (documented semantics); partition-invariant."""
    import ray.data

    from chearch_ray.stages.dedup import dedup_against_store

    store_texts = [f"seen doc {i}" for i in range(50)]
    new_texts = (
        [f"fresh doc {i}" for i in range(40)]        # genuinely new
        + store_texts[10:20]                          # already ingested
        + ["fresh dup", "fresh dup"]                  # intra-shard dup
    )
    new = pa.table({
        "doc_id": pa.array(np.arange(len(new_texts), dtype=np.int64)),
        "text": pa.array(new_texts),
    })
    seen = pa.table({"text": pa.array(store_texts),
                     "doc_id": pa.array(np.arange(1000, 1000 + len(store_texts), dtype=np.int64))})
    out = dedup_against_store(
        ray.data.from_arrow(new).repartition(5),
        ray.data.from_arrow(seen).repartition(3),
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want_ids = [i for i, t in enumerate(new_texts) if t not in set(store_texts)]
    assert out["doc_id"].tolist() == want_ids
    # both intra-shard dup rows survive the STORE check
    assert sum(t == "fresh dup" for t in np.array(new_texts)[out["doc_id"].to_numpy()]) == 2
    out2 = dedup_against_store(
        ray.data.from_arrow(new).repartition(1),
        ray.data.from_arrow(seen).repartition(1),
        n_partitions=3,
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out.equals(out2)


def test_quality_gate_vs_duckdb(ray_session):
    """Per-group quality gating equals the SQL window formulation
    (median per group, ties kept), with >= half of each group
    surviving by the quantile_disc rank convention; partition-
    invariant."""
    import duckdb
    import ray.data

    from chearch_ray.pipelines.driver_contract import _quality_sql
    from chearch_ray.pipelines.training import quality_gate

    rng = np.random.default_rng(61)
    langs = rng.choice(["en", "fr", "xx"], size=300, p=[0.5, 0.4, 0.1])
    words = [f"w{i}" for i in range(400)]
    texts = [" ".join(rng.choice(words, size=int(rng.integers(3, 120))))
             for _ in range(300)]
    t = pa.table({
        "doc_id": pa.array(np.arange(300, dtype=np.int64)),
        "lang": pa.array(langs),
        "text": pa.array(texts),
    })
    got = (quality_gate(ray.data.from_arrow(t).repartition(7), by="lang", q=0.5)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", t)
    want = con.execute(f"""
WITH q AS ({_quality_sql()}),
qq AS (SELECT d.lang, q.doc_id,
              CAST(round(q.quality * 1000000) AS BIGINT) AS q_int
       FROM q JOIN documents d ON q.doc_id = d.doc_id),
med AS (SELECT lang, quantile_disc(q_int, 0.5) AS m FROM qq GROUP BY lang)
SELECT qq.doc_id, qq.lang, qq.q_int FROM qq JOIN med ON qq.lang = med.lang
WHERE qq.q_int >= med.m ORDER BY qq.doc_id""").df()
    assert got.equals(want), (len(got), len(want))
    # each group keeps at least half its docs (ties only ADD rows)
    kept = got.groupby("lang").size()
    total = pd.Series(langs).value_counts()
    for lang in total.index:
        assert kept.get(lang, 0) >= total[lang] // 2
    got2 = (quality_gate(ray.data.from_arrow(t).repartition(1), by="lang", q=0.5)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got.equals(got2)


def test_pmi_bigrams_vs_duckdb(ray_session):
    """PMI collocations: counts, ranking (likelihood-ratio doubles are
    IEEE-reproducible) and the ln values themselves (libm == DuckDB)
    match SQL bit-for-bit; partition-invariant."""
    import duckdb
    import ray.data

    from chearch_ray.stages.textstats import pmi_bigrams

    rng = np.random.default_rng(67)
    vocab = [f"w{i}" for i in range(150)]
    docs = []
    for _ in range(250):
        toks = list(rng.choice(vocab, size=int(rng.integers(5, 60))))
        if rng.random() < 0.4:
            toks += ["strong", "pair"]       # a real collocation
        docs.append(" ".join(toks))
    t = pa.table({"doc_id": pa.array(np.arange(250, dtype=np.int64)),
                  "text": pa.array(docs)})
    got = pmi_bigrams(ray.data.from_arrow(t).repartition(6),
                      k=15, min_count=4).to_pandas()
    con = duckdb.connect()
    con.register("documents", t)
    want = con.execute("""
WITH ptoks AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text),
       '[^a-z0-9_]+'), x -> x <> '') AS ts FROM documents),
ptok AS (SELECT doc_id, unnest(ts) AS term, generate_subscripts(ts, 1) AS ord FROM ptoks),
bg AS (SELECT a.term ta, b.term tb, count(*)::BIGINT AS n_ab
       FROM ptok a JOIN ptok b ON b.doc_id = a.doc_id AND b.ord = a.ord + 1
       GROUP BY a.term, b.term HAVING count(*) >= 4),
tot AS (SELECT count(*)::BIGINT AS n FROM ptok),
tbg AS (SELECT count(*)::BIGINT AS n FROM ptok a JOIN ptok b
        ON b.doc_id = a.doc_id AND b.ord = a.ord + 1),
uni AS (SELECT term, count(*)::BIGINT AS n FROM ptok GROUP BY term)
SELECT bg.ta, bg.tb, bg.n_ab, ua.n AS n_a, ub.n AS n_b,
       ln((CAST(bg.n_ab AS DOUBLE) / (SELECT n FROM tbg)) /
          ((CAST(ua.n AS DOUBLE) / (SELECT n FROM tot))
           * (CAST(ub.n AS DOUBLE) / (SELECT n FROM tot)))) AS pmi
FROM bg JOIN uni ua ON ua.term = bg.ta JOIN uni ub ON ub.term = bg.tb
ORDER BY CAST(bg.n_ab AS DOUBLE)
         / (CAST(ua.n AS DOUBLE) * CAST(ub.n AS DOUBLE)) DESC, bg.ta, bg.tb
LIMIT 15""").df()
    assert got.equals(want), (got.head(), want.head())
    assert ("strong", "pair") in set(zip(got["ta"], got["tb"]))
    got2 = pmi_bigrams(ray.data.from_arrow(t).repartition(1),
                       k=15, min_count=4).to_pandas()
    assert got.equals(got2)


def test_top_per_group_vs_window_sql(ray_session):
    """Merit-ranked per-group caps equal the SQL row_number window;
    ties on value break by doc_id; map-side prune is invisible to the
    result (partition invariance across block layouts)."""
    import duckdb
    import ray.data

    from chearch_ray.stages.sample import top_per_group

    rng = np.random.default_rng(71)
    n = 8000
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "grp": pa.array(rng.choice(["a", "b", "c", "d"], size=n)),
        # small value range forces heavy TIES at the rank boundary
        "val": pa.array(rng.integers(0, 40, n).astype(np.int64)),
    })
    got = (top_per_group(ray.data.from_arrow(t).repartition(9), "grp", "val", n=7)
           .to_pandas().sort_values(["grp", "rn"]).reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute("""
WITH r AS (SELECT grp, doc_id, val,
                  row_number() OVER (PARTITION BY grp ORDER BY val DESC, doc_id) AS rn
           FROM t)
SELECT grp, doc_id, val, rn::BIGINT AS rn FROM r WHERE rn <= 7
ORDER BY grp, rn""").df()
    assert got.equals(want), (got.head(10), want.head(10))
    got2 = (top_per_group(ray.data.from_arrow(t).repartition(1), "grp", "val", n=7)
            .to_pandas().sort_values(["grp", "rn"]).reset_index(drop=True))
    assert got.equals(got2)


def test_lm_score_vs_duckdb_with_oov(ray_session):
    """Unigram LM scoring: vocab cap forces real OOV smoothing, count
    ties resolve identically (count desc, term asc), integer micro-nat
    sums hash-match SQL, partition-invariant."""
    import duckdb
    import ray.data

    from chearch_ray.stages.textstats import lm_score

    rng = np.random.default_rng(89)
    common = [f"c{i}" for i in range(30)]
    rare = [f"r{i}" for i in range(200)]
    docs = []
    for _ in range(150):
        toks = list(rng.choice(common, size=20)) + list(rng.choice(rare, size=5))
        docs.append(" ".join(toks))
    t = pa.table({"doc_id": pa.array(np.arange(150, dtype=np.int64)),
                  "text": pa.array(docs)})
    K = 40  # below the 230-term vocabulary -> rare terms hit OOV
    got = (lm_score(ray.data.from_arrow(t).repartition(6), vocab_k=K)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", t)
    want = con.execute(f"""
WITH tok AS (SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text),
             '[^a-z0-9_]+'), x -> x <> '')) AS term FROM documents),
tot AS (SELECT count(*)::BIGINT AS n FROM tok),
c AS (SELECT term, count(*)::BIGINT AS n FROM tok GROUP BY term),
v AS (SELECT term, n FROM c ORDER BY n DESC, term LIMIT {K}),
lp AS (SELECT t.doc_id,
              CAST(round(ln(coalesce(v.n, 0.5) / (SELECT n FROM tot))
                         * 1000000) AS BIGINT) AS lpi
       FROM tok t LEFT JOIN v ON v.term = t.term)
SELECT doc_id, count(*)::BIGINT AS n_tokens, sum(lpi)::BIGINT AS logp_sum_micro
FROM lp GROUP BY doc_id ORDER BY doc_id""").df()
    assert got.equals(want)
    got2 = (lm_score(ray.data.from_arrow(t).repartition(1), vocab_k=K)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got.equals(got2)


def test_significant_terms_vs_duckdb(ray_session):
    """significant_terms == the DuckDB fg/bg proportion-difference
    formula, rows+values, on a corpus with a planted foreground signal;
    partition-invariant; the semi-join (above-broadcast-limit) path is
    row-identical to the broadcast path."""
    import duckdb
    import ray.data

    from chearch_ray.stages.textstats import significant_terms

    rng = np.random.default_rng(41)
    filler = [f"w{i}" for i in range(200)]
    docs, fg_ids = [], []
    for d in range(300):
        toks = list(rng.choice(filler, size=30))
        if d % 5 == 0:
            # foreground docs carry the marker plus an enriched signal
            toks += ["marker"] + ["signal"] * 2
            fg_ids.append(d)
        docs.append(" ".join(toks))
    t = pa.table({"doc_id": pa.array(np.arange(300, dtype=np.int64)),
                  "text": pa.array(docs)})
    con = duckdb.connect()
    con.register("documents", t)
    # bg stats = per-term distinct doc counts (what the index's term
    # stats hold for the same corpus)
    stats = con.execute("""
WITH tok AS (SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text),
             '[^a-z0-9_]+'), x -> x <> '')) AS term FROM documents)
SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM tok GROUP BY term""").arrow()
    want = con.execute("""
WITH tok AS (SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text),
             '[^a-z0-9_]+'), x -> x <> '')) AS term FROM documents),
fg AS (SELECT DISTINCT doc_id FROM tok WHERE term = 'marker'),
cnt AS (SELECT (SELECT count(*) FROM fg)::BIGINT AS fg_n,
               (SELECT count(*) FROM documents)::BIGINT AS bg_n),
fgdf AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS fg_df FROM tok
         WHERE doc_id IN (SELECT doc_id FROM fg) GROUP BY term),
bgdf AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS bg_df FROM tok GROUP BY term)
SELECT f.term, f.fg_df, b.bg_df,
       (f.fg_df * cnt.bg_n - b.bg_df * cnt.fg_n)::BIGINT AS score
FROM fgdf f JOIN bgdf b USING (term), cnt
ORDER BY score DESC, f.term LIMIT 10""").df()
    ds = ray.data.from_arrow(t).repartition(8)
    got = significant_terms(ds, np.array(fg_ids), stats, 300, k=10).to_pandas()
    assert got.equals(want), (got, want)
    # the planted marker/signal terms dominate
    assert list(got["term"][:2]) == ["marker", "signal"]
    # partition invariance
    got1 = significant_terms(
        ray.data.from_arrow(t).repartition(1), np.array(fg_ids), stats, 300, k=10
    ).to_pandas()
    assert got.equals(got1)
    # semi-join path (broadcast_limit forces it) is identical
    got_j = significant_terms(
        ds, np.array(fg_ids), stats, 300, k=10, broadcast_limit=1
    ).to_pandas()
    assert got.equals(got_j)
    # empty foreground -> empty result
    empty = significant_terms(ds, np.array([], dtype=np.int64), stats, 300, k=10)
    assert empty.num_rows == 0


def test_frequent_terms_sentinel_is_not_a_token(ray_session):
    """'__n__' is a LEGAL token under the [^a-z0-9_]+ splitter; when it
    is block-frequent the old sentinel overload inflated the global
    total AND suppressed the term itself from the answer (ADVICE r3).
    With the '' sentinel (tokenize strips empties) the output must
    match the SQL mirror exactly, __n__ included."""
    import duckdb
    import ray.data

    from chearch_ray.stages.textstats import frequent_terms

    rng = np.random.default_rng(67)
    filler = [f"w{i}" for i in range(500)]
    docs = []
    for d in range(200):
        toks = list(rng.choice(filler, size=40))
        toks.append("__n__")  # ~2.4% of every doc — a true heavy hitter
        docs.append(" ".join(toks))
    t = pa.table({"text": pa.array(docs)})
    got = frequent_terms(ray.data.from_arrow(t).repartition(8),
                         denom=100).to_pandas()
    con = duckdb.connect()
    con.register("documents", t)
    want = con.execute("""
WITH tok AS (SELECT unnest(list_filter(regexp_split_to_array(lower(text),
             '[^a-z0-9_]+'), x -> x <> '')) AS term FROM documents),
tot AS (SELECT count(*)::BIGINT AS n FROM tok),
c AS (SELECT term, count(*)::BIGINT AS n FROM tok GROUP BY term)
SELECT term, n FROM c WHERE n * 100 >= (SELECT n FROM tot)
ORDER BY n DESC, term""").df()
    assert "__n__" in set(want["term"])  # the adversarial premise holds
    assert got.equals(want), (got, want)


def test_frequent_terms_distributed_merge_path(ray_session):
    """driver_merge_limit=0 forces BOTH passes through the Ray
    groupby merge (the >~8e5-block scale path); output must be
    row-identical to the driver-merge path."""
    import ray.data

    from chearch_ray.stages.textstats import frequent_terms

    rng = np.random.default_rng(71)
    filler = [f"w{i}" for i in range(800)]
    docs = [" ".join(list(rng.choice(filler, size=50)) + ["needle"])
            for _ in range(300)]
    t = pa.table({"text": pa.array(docs)})
    ds = ray.data.from_arrow(t).repartition(10)
    small = frequent_terms(ds, denom=100).to_pandas()
    dist = frequent_terms(ds, denom=100, driver_merge_limit=0).to_pandas()
    assert small.equals(dist), (small, dist)
    assert "needle" in set(dist["term"])


def test_exact_quantiles_distributed_merge_path(ray_session):
    """driver_merge_limit=0 forces every histogram round through the
    Ray groupby merge; quantiles must equal the driver-merge path
    (and DuckDB) exactly."""
    import duckdb
    import ray.data

    from chearch_ray.stages.sketch import exact_quantiles

    rng = np.random.default_rng(73)
    v = (rng.lognormal(3, 1.5, 20000) * 100).astype(np.int64)
    t = pa.table({"cents": pa.array(v)})
    qs = [0.25, 0.5, 0.99]
    ds = ray.data.from_arrow(t).repartition(6)
    got = exact_quantiles(ds, "cents", qs, n_buckets=256, gather_limit=1000,
                          driver_merge_limit=0).to_pandas()
    con = duckdb.connect()
    con.register("tbl", t)
    for q, val in zip(got["q"], got["cents"]):
        want = con.execute(f"SELECT quantile_disc(cents, {q}) FROM tbl").fetchone()[0]
        assert val == want, (q, val, want)


def test_exact_group_quantiles_distributed_merge_path(ray_session):
    """grouped variant: the gated jb-key groupby merge must reproduce
    the driver-merge result exactly."""
    import ray.data

    from chearch_ray.stages.sketch import exact_group_quantiles

    rng = np.random.default_rng(79)
    n = 20_000
    groups = rng.choice(["a", "b", "c"], size=n)
    v = (rng.lognormal(3, 1.5, n) * 100).astype(np.int64)
    t = pa.table({"g": pa.array(groups), "cents": pa.array(v)})
    qs = [0.1, 0.5, 0.9]
    ds = ray.data.from_arrow(t).repartition(6)
    small = exact_group_quantiles(ds, "cents", qs, by="g", n_buckets=64,
                                  gather_limit=500).to_pandas()
    dist = exact_group_quantiles(ds, "cents", qs, by="g", n_buckets=64,
                                 gather_limit=500,
                                 driver_merge_limit=0).to_pandas()
    assert small.equals(dist), (small, dist)


def test_hash_semi_join_partitioned_path_matches_broadcast(ray_session):
    """probe_broadcast_limit=0 forces the coarse-partition shuffle (the
    >5M-distinct-keys scale shape); its rows must be identical to the
    default broadcast path and to the numpy reference."""
    import ray.data

    from chearch_ray.stages.joins import hash_anti_join, hash_semi_join

    rng = np.random.default_rng(53)
    n = 10_000
    left = pa.table({
        "k": pa.array(rng.integers(0, 3_000, n).astype(np.int64)),
        "payload": pa.array(rng.integers(0, 100, n).astype(np.int64)),
    })
    right = pa.table({
        "rk": pa.array(np.repeat(rng.integers(0, 1_500, 300), 20).astype(np.int64)),
    })
    lds = ray.data.from_arrow(left).repartition(7)
    rds = ray.data.from_arrow(right).repartition(3)

    def collect(ds):
        t = pa.concat_tables(ds.iter_batches(batch_size=None, batch_format="pyarrow"))
        return t.to_pandas().sort_values(list(t.column_names)).reset_index(drop=True)

    for anti in (False, True):
        fn = hash_anti_join if anti else hash_semi_join
        bcast = collect(fn(lds, rds, on="k", right_on="rk",
                           payload=["k", "payload"]))
        shuf = collect(fn(lds, rds, on="k", right_on="rk",
                          payload=["k", "payload"], n_partitions=8,
                          probe_broadcast_limit=0))
        assert bcast.equals(shuf), f"anti={anti}"
        member = np.isin(left["k"].to_numpy(), np.unique(right["rk"].to_numpy()))
        want = (left.to_pandas()[~member if anti else member]
                .sort_values(["k", "payload"]).reset_index(drop=True))
        assert bcast.equals(want), f"anti={anti}"


def test_reciprocal_rank_fusion_semantics():
    """RRF: 1/(60+rank) per list, missing entries contribute nothing,
    ties break by doc asc, output capped at k."""
    from chearch_ray.stages.similarity import reciprocal_rank_fusion

    a = np.array([5, 3, 9], dtype=np.int64)       # ranks 1..3
    b = np.array([3, 7], dtype=np.int64)          # ranks 1..2
    out = reciprocal_rank_fusion([a, b], k=10).to_pandas()
    want = {
        3: 1 / 62 + 1 / 61,   # rank 2 in a, rank 1 in b
        5: 1 / 61,
        7: 1 / 62,
        9: 1 / 63,
    }
    order = sorted(want, key=lambda d: (-want[d], d))
    assert out["doc_id"].tolist() == order
    assert out["rank"].tolist() == [1, 2, 3, 4]
    # k cap + empty input
    assert len(reciprocal_rank_fusion([a, b], k=2)) == 2
    assert len(reciprocal_rank_fusion([np.array([], dtype=np.int64)])) == 0


def test_boilerplate_line_dedup_paths_and_semantics(ray_session):
    """header/footer lines in >= min_docs distinct docs disappear from
    every doc; unique lines keep their order; within-doc repeats of a
    non-boilerplate line survive; a doc that was ALL boilerplate
    becomes ''. driver_merge_limit=0 (groupby merge path) must be
    row-identical to the driver-merge path."""
    import ray.data

    from chearch_ray.stages.dedup import boilerplate_line_dedup

    docs = []
    for i in range(40):
        lines = ["HEADER"] if i % 2 == 0 else []
        lines += [f"body {i} alpha", f"body {i} beta", f"body {i} alpha"]
        if i % 4 == 0:
            lines.append("FOOTER")
        docs.append("\n".join(lines))
    docs.append("HEADER\nFOOTER")  # all-boilerplate doc
    t = pa.table({
        "doc_id": pa.array(np.arange(len(docs), dtype=np.int64)),
        "text": pa.array(docs),
    })
    ds = ray.data.from_arrow(t).repartition(5)
    out = pa.concat_tables(
        boilerplate_line_dedup(ds, min_docs=10)
        .iter_batches(batch_size=None, batch_format="pyarrow")
    ).sort_by("doc_id").to_pandas()
    assert not out["text"].str.contains("HEADER").any()
    assert not out["text"].str.contains("FOOTER").any()
    assert out.loc[3, "text"] == "body 3 alpha\nbody 3 beta\nbody 3 alpha"
    assert out.loc[40, "text"] == ""
    out2 = pa.concat_tables(
        boilerplate_line_dedup(ds, min_docs=10, driver_merge_limit=0)
        .iter_batches(batch_size=None, batch_format="pyarrow")
    ).sort_by("doc_id").to_pandas()
    assert out.equals(out2)


def test_cm_sketch_properties(ray_session):
    """Count-Min: partition-invariant, both merge paths identical,
    estimates never below true counts, and exact when the column's
    distinct universe is far below width (no collisions)."""
    import ray.data

    from chearch_ray.stages.sketch import cm_point_estimates, cm_sketch

    rng = np.random.default_rng(83)
    keys = rng.integers(0, 50, 30_000).astype(np.int64)  # 50 << 2048
    t = pa.table({"k": pa.array(keys)})
    sk6 = cm_sketch(ray.data.from_arrow(t).repartition(6), "k")
    sk1 = cm_sketch(ray.data.from_arrow(t).repartition(1), "k")
    skg = cm_sketch(ray.data.from_arrow(t).repartition(6), "k",
                    driver_merge_limit=0)
    assert np.array_equal(sk6, sk1) and np.array_equal(sk6, skg)
    q = np.arange(60, dtype=np.int64)  # includes 10 absent keys
    est = cm_point_estimates(sk6, q)
    true = np.array([(keys == x).sum() for x in q], dtype=np.int64)
    assert (est >= true).all()
    # tiny universe: whp collision-free at width 2048 -> exact
    assert (est == true).all(), (est - true).max()


def test_connected_components_gated_paths_identical(ray_session):
    """driver union-find (default at test scale) and forced label
    propagation (driver_merge_limit=0) must produce identical labels
    on an adversarial graph (long chain + star + singleton pairs)."""
    import ray.data

    from chearch_ray.stages.dedup import connected_components

    # chain 0-1-2-...-30 (diameter stress), star around 100, pairs
    edges = ([(i, i + 1) for i in range(30)]
             + [(100, 100 + i) for i in range(1, 8)]
             + [(500, 501), (600, 601)])
    t = pa.table({
        "doc_a": pa.array([a for a, _ in edges], type=pa.uint64()),
        "doc_b": pa.array([b for _, b in edges], type=pa.uint64()),
    })
    ds = ray.data.from_arrow(t).repartition(4)

    def collect(out):
        return (pa.concat_tables(out.iter_batches(batch_size=None,
                                                  batch_format="pyarrow"))
                .to_pandas().sort_values("doc_id").reset_index(drop=True))

    uf = collect(connected_components(ds))
    lp = collect(connected_components(ds, driver_merge_limit=0))
    assert uf.equals(lp)
    assert (uf.loc[uf["doc_id"] <= 30, "keep_id"] == 0).all()
    assert (uf.loc[(uf["doc_id"] >= 100) & (uf["doc_id"] < 200), "keep_id"] == 100).all()


def test_rrf_property_vs_reference():
    """hypothesis: RRF over random unique-id ranked lists must equal an
    independent dict-based reference (scores, tie-break, k cap)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from chearch_ray.stages.similarity import reciprocal_rank_fusion

    ids = st.lists(st.integers(0, 200), min_size=0, max_size=25, unique=True)

    @settings(max_examples=200, deadline=None)
    @given(lists=st.lists(ids, min_size=1, max_size=4), k=st.integers(1, 15))
    def check(lists, k):
        arrs = [np.array(lst, dtype=np.int64) for lst in lists]
        got = reciprocal_rank_fusion(arrs, k=k).to_pandas()
        ref: dict[int, float] = {}
        for lst in lists:
            for r0, d in enumerate(lst):
                ref[d] = ref.get(d, 0.0) + 1.0 / (60 + r0 + 1)
        order = sorted(ref, key=lambda d: (-ref[d], d))[:k]
        assert got["doc_id"].tolist() == order
        assert got["rank"].tolist() == list(range(1, len(order) + 1))

    check()


def test_union_find_property_vs_bfs():
    """hypothesis: the gated driver union-find labels random graphs
    identically to a plain BFS component search with min-id labels."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from chearch_ray.stages.dedup import _cc_driver_union_find

    class FakeState:
        def __init__(self, table):
            self._t = table

        def iter_batches(self, batch_size=None, batch_format=None):
            return [self._t]

    edge = st.tuples(st.integers(0, 60), st.integers(0, 60))

    @settings(max_examples=150, deadline=None)
    @given(edges=st.lists(edge, min_size=1, max_size=80))
    def check(edges):
        t = pa.table({
            "doc_a": pa.array([a for a, _ in edges], type=pa.uint64()),
            "doc_b": pa.array([b for _, b in edges], type=pa.uint64()),
        })
        got = _cc_driver_union_find(FakeState(t)).to_pandas()
        # BFS reference
        adj: dict[int, set[int]] = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        want: dict[int, int] = {}
        seen: set[int] = set()
        for start in sorted(adj):
            if start in seen:
                continue
            comp, frontier = set(), {start}
            while frontier:
                comp |= frontier
                frontier = {n for v in frontier for n in adj[v]} - comp
            mn = min(comp)
            for v in comp:
                want[v] = mn
            seen |= comp
        got_map = dict(zip(got["doc_id"].astype(int), got["keep_id"].astype(int)))
        assert got_map == want

    check()


def test_containment_join_exact_vs_bruteforce(ray_session):
    """containment_join is EXACT and DIRECTED: over the sf0.001
    documents it must report exactly the brute-force set of ordered
    pairs with |Sa ∩ Sb| / |Sa| >= t, bit-identical values (asymmetric
    prefix filter + size cut are candidate pruning only)."""
    import itertools

    import pyarrow.parquet as pq
    import ray.data

    from chearch_ray.stages.dedup import containment_join

    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"])
    out = containment_join(ray.data.from_arrow(docs), threshold=0.6).to_pandas()
    got = {
        (int(a), int(b)): float(c)
        for a, b, c in zip(out["doc_a"], out["doc_b"], out["containment"])
    }
    sets = _shingle_sets(docs)
    want = {}
    for a, b in itertools.permutations(sorted(sets), 2):
        sa, sb = sets[a], sets[b]
        if not sa:
            continue
        c = len(sa & sb) / len(sa)
        if c >= 0.6:
            want[(a, b)] = c
    assert got == want
    assert len(want) > 0  # non-vacuous at sf0.001


def test_containment_join_asymmetric(ray_session):
    """a short doc fully inside a long one: (short -> long) qualifies
    at t=1.0 while (long -> short) does not — and Jaccard would miss
    the pair entirely at the same threshold."""
    import ray.data

    from chearch_ray.stages.dedup import containment_join

    rows = [
        {"doc_id": 1, "text": "a b c d e"},  # 3 shingles, all inside doc 2
        {"doc_id": 2, "text": "a b c d e f g h i j k l m n o p q r s t"},
        {"doc_id": 3, "text": "x y z w v u"},
    ]
    docs = pa.Table.from_pylist(rows)
    out = containment_join(ray.data.from_arrow(docs), threshold=1.0).to_pandas()
    pairs = {(int(a), int(b)): float(c)
             for a, b, c in zip(out["doc_a"], out["doc_b"], out["containment"])}
    assert pairs == {(1, 2): 1.0}


def test_tfidf_keywords_bruteforce(ray_session):
    """tfidf_keywords == brute-force tf*ln(N/df) top-k per doc with
    (score desc, term asc) ranking; df==N terms excluded."""
    import math
    from collections import Counter

    import ray.data

    from chearch_ray.stages.textstats import tfidf_keywords

    rows = [
        {"doc_id": 1, "text": "apple banana apple cherry"},
        {"doc_id": 2, "text": "banana cherry cherry date"},
        {"doc_id": 3, "text": "apple banana cherry date egg egg"},
    ]
    docs = pa.Table.from_pylist(rows)
    toks = {r["doc_id"]: r["text"].split() for r in rows}
    df = Counter()
    for ts in toks.values():
        for t in set(ts):
            df[t] += 1
    n = len(rows)
    df_table = pa.table({"term": list(df), "df": pa.array([df[t] for t in df], pa.int64())})
    out = tfidf_keywords(ray.data.from_arrow(docs), df_table, n, k=2).to_pandas()
    got = {(int(r.doc_id), r.term): (int(r.rank), float(r.score))
           for r in out.itertuples()}
    want = {}
    for did, ts in toks.items():
        tf = Counter(ts)
        scored = sorted(
            ((t, c * math.log(n / df[t])) for t, c in tf.items() if df[t] < n),
            key=lambda x: (-x[1], x[0]),
        )[:2]
        for i, (t, s) in enumerate(scored, 1):
            want[(did, t)] = (i, s)
    assert got == want


def test_exact_distinct_by_both_paths(ray_session):
    """exact_distinct_by: driver-merge path and the pair-keyed
    exchange path (forced with driver_merge_limit=0) are row-identical
    and equal to a pandas groupby-nunique oracle."""
    import pyarrow.parquet as pq
    import ray.data

    from chearch_ray.stages.sketch import exact_distinct_by

    ev = pq.read_table("/root/testdata/sf0.001/events.parquet",
                       columns=["event_type", "user_id"])
    want = (
        ev.to_pandas().groupby("event_type")["user_id"].nunique()
        .sort_index()
    )
    fast = exact_distinct_by(ray.data.from_arrow(ev), "user_id", "event_type")
    scale = exact_distinct_by(ray.data.from_arrow(ev), "user_id", "event_type",
                              driver_merge_limit=0)
    for out in (fast, scale):
        got = dict(zip(out["event_type"].to_pylist(), out["n_distinct"].to_pylist()))
        assert got == want.to_dict()
    assert fast.equals(scale)


def test_tpch_shape_gated_paths_identical(ray_session):
    """Q13/Q15/Q18 custom gated merges: driver_merge_limit=0 forces the
    distributed (Ray groupby) path; output must be row-identical to the
    driver-merge path on the same input."""
    import ray.data

    from chearch_ray.pipelines.analytics import (
        large_volume_orders,
        order_count_distribution,
        top_revenue_suppliers,
    )

    sf = "/root/testdata/sf0.001"

    def cust():
        return ray.data.read_parquet(f"{sf}/customer.parquet",
                                     columns=["c_custkey", "c_name"])

    def orders():
        return ray.data.read_parquet(
            f"{sf}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def li(cols):
        return ray.data.read_parquet(f"{sf}/lineitem.parquet", columns=cols)

    a = order_count_distribution(cust(),
                                 ray.data.read_parquet(
                                     f"{sf}/orders.parquet",
                                     columns=["o_custkey"]).repartition(6))
    b = order_count_distribution(cust(),
                                 ray.data.read_parquet(
                                     f"{sf}/orders.parquet",
                                     columns=["o_custkey"]).repartition(6),
                                 driver_merge_limit=0)
    assert a.to_pandas().equals(b.to_pandas())

    lv_cols = ["l_orderkey", "l_quantity"]
    a = large_volume_orders(li(lv_cols).repartition(6), orders(), cust(),
                            min_qty=250.0, k=20)
    b = large_volume_orders(li(lv_cols).repartition(6), orders(), cust(),
                            min_qty=250.0, k=20, driver_merge_limit=0)
    assert len(a) > 0
    assert a.to_pandas().equals(b.to_pandas())

    ts_cols = ["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"]
    sup = ray.data.read_parquet(f"{sf}/supplier.parquet",
                                columns=["s_suppkey", "s_name"])
    a = top_revenue_suppliers(li(ts_cols).repartition(6), sup)
    b = top_revenue_suppliers(li(ts_cols).repartition(6), sup,
                              driver_merge_limit=0)
    assert len(a) > 0
    assert a.to_pandas().equals(b.to_pandas())


def test_wealthy_inactive_empty_and_window(ray_session):
    """Q22 shape: a `since` earlier than every order makes the result
    empty with a stable schema; a late `since` yields rows matching the
    int64 cross-multiplied average filter computed in pandas."""
    import ray.data

    from chearch_ray.pipelines.analytics import wealthy_inactive_customers

    sf = "/root/testdata/sf0.001"

    def cust():
        return ray.data.read_parquet(
            f"{sf}/customer.parquet",
            columns=["c_custkey", "c_mktsegment", "c_acctbal"])

    def orders():
        return ray.data.read_parquet(f"{sf}/orders.parquet",
                                     columns=["o_custkey", "o_orderdate"])

    empty = wealthy_inactive_customers(cust(), orders(), since="1990-01-01")
    assert len(empty) == 0
    assert empty.column_names == ["c_mktsegment", "n_customers",
                                  "acctbal_cents"]

    got = wealthy_inactive_customers(cust(), orders(),
                                     since="2000-01-01").to_pandas()
    import pandas as pd
    import pyarrow.parquet as pq_

    c = pq_.read_table(f"{sf}/customer.parquet").to_pandas()
    o = pq_.read_table(f"{sf}/orders.parquet").to_pandas()
    from chearch_ray.stages.events import _round_half_away
    cents = _round_half_away(c["c_acctbal"].to_numpy() * 100).astype(np.int64)
    pos = c["c_acctbal"].to_numpy() > 0
    s, n = int(cents[pos].sum()), int(pos.sum())
    recent = set(o.loc[o["o_orderdate"] >= pd.Timestamp("2000-01-01"),
                       "o_custkey"])
    keep = (cents * n > s) & ~c["c_custkey"].isin(recent).to_numpy()
    want = (pd.DataFrame({"c_mktsegment": c["c_mktsegment"][keep],
                          "cents": cents[keep]})
            .groupby("c_mktsegment", as_index=False)
            .agg(n_customers=("cents", "size"), acctbal_cents=("cents", "sum"))
            .sort_values("c_mktsegment").reset_index(drop=True))
    g = got.sort_values("c_mktsegment").reset_index(drop=True)
    assert len(g) > 0
    assert (g["c_mktsegment"].tolist() == want["c_mktsegment"].tolist()
            and g["n_customers"].tolist() == want["n_customers"].tolist()
            and g["acctbal_cents"].tolist() == want["acctbal_cents"].tolist())


def test_stats_pivot_gated_paths_identical(ray_session):
    """grouped_value_stats / pivot_counts: driver_merge_limit=0 (Ray
    groupby merge) must be row-identical to the driver-merge path,
    including the bit-exact float columns."""
    import ray.data

    from chearch_ray.pipelines.analytics import (grouped_value_stats,
                                                 pivot_counts)

    sf = "/root/testdata/sf0.001"

    def ev():
        return ray.data.read_parquet(f"{sf}/events.parquet",
                                     columns=["event_type", "value"]
                                     ).repartition(6)

    a = grouped_value_stats(ev(), "event_type", "value")
    b = grouped_value_stats(ev(), "event_type", "value",
                            driver_merge_limit=0)
    assert len(a) > 0
    assert a.to_pandas().equals(b.to_pandas())

    def docs():
        return ray.data.read_parquet(f"{sf}/documents.parquet",
                                     columns=["lang", "source"]
                                     ).repartition(6)

    vals = [f"src{i}" for i in range(20)]
    a = pivot_counts(docs(), "lang", "source", vals)
    b = pivot_counts(docs(), "lang", "source", vals, driver_merge_limit=0)
    assert len(a) > 0
    assert a.to_pandas().equals(b.to_pandas())
    # every row's count columns sum to its total
    pdf = a.to_pandas()
    assert (pdf[[f"n_{v}" for v in vals]].sum(axis=1) == pdf["total"]).all()


def test_json_mode_hist_gated_paths_identical(ray_session):
    """json_int_field_agg (min/max-aware merge), mode_per_group and
    value_histogram: groupby merge path (driver_merge_limit=0) ==
    driver merge path."""
    import ray.data

    from chearch_ray.pipelines.analytics import (json_int_field_agg,
                                                 mode_per_group,
                                                 value_histogram)

    sf = "/root/testdata/sf0.001"

    def ev(cols):
        return ray.data.read_parquet(f"{sf}/events.parquet",
                                     columns=cols).repartition(6)

    a = json_int_field_agg(ev(["event_type", "props"]), "props", "k",
                           by="event_type")
    b = json_int_field_agg(ev(["event_type", "props"]), "props", "k",
                           by="event_type", driver_merge_limit=0)
    assert len(a) > 0
    assert a.to_pandas().equals(b.to_pandas())

    def docs():
        return ray.data.read_parquet(f"{sf}/documents.parquet",
                                     columns=["lang", "source"]).repartition(6)

    a = mode_per_group(docs(), "lang", "source")
    b = mode_per_group(docs(), "lang", "source", driver_merge_limit=0)
    assert len(a) > 0
    assert a.to_pandas().equals(b.to_pandas())

    a = value_histogram(ev(["value"]), "value", 25.0)
    b = value_histogram(ev(["value"]), "value", 25.0, driver_merge_limit=0)
    assert len(a) > 0
    assert a.to_pandas().equals(b.to_pandas())


def test_q16_q11_gated_paths_identical(ray_session):
    """brand_supplier_counts / part_revenue_concentration: groupby
    merge path (driver_merge_limit=0) == driver merge path."""
    import ray.data

    from chearch_ray.pipelines.analytics import (
        brand_supplier_counts,
        part_revenue_concentration,
    )

    sf = "/root/testdata/sf0.001"

    def li(cols):
        return ray.data.read_parquet(f"{sf}/lineitem.parquet",
                                     columns=cols).repartition(6)

    part = lambda: ray.data.read_parquet(  # noqa: E731
        f"{sf}/part.parquet", columns=["p_partkey", "p_brand"])

    a = brand_supplier_counts(li(["l_partkey", "l_suppkey"]), part())
    b = brand_supplier_counts(li(["l_partkey", "l_suppkey"]), part(),
                              driver_merge_limit=0)
    assert len(a) > 0
    assert a.to_pandas().equals(b.to_pandas())

    cols = ["l_partkey", "l_extendedprice", "l_discount"]
    a = part_revenue_concentration(li(cols), num=1, denom=1800)
    b = part_revenue_concentration(li(cols), num=1, denom=1800,
                                   driver_merge_limit=0)
    assert len(a) > 0
    assert a.to_pandas().equals(b.to_pandas())


def test_write_resumable_parquet_resume_byte_identical(ray_session, tmp_path):
    """resumable partitioned sink: interrupt (delete 3 partition
    dirs), resume — only the missing shards rewrite, and the final
    directory content is byte-identical to an uninterrupted run."""
    import glob as _glob
    import hashlib
    import os
    import shutil

    import ray.data

    from chearch_ray.sources.sink import (finished_partitions,
                                          write_resumable_parquet)

    sf = "/root/testdata/sf0.001"

    def ds():
        return ray.data.read_parquet(f"{sf}/documents.parquet",
                                     columns=["doc_id", "lang", "n_chars"]
                                     ).repartition(5)

    def tree_hash(root):
        h = hashlib.sha256()
        for p in sorted(_glob.glob(os.path.join(root, "**", "*.parquet"),
                                   recursive=True)):
            h.update(os.path.relpath(p, root).encode())
            h.update(open(p, "rb").read())
        return h.hexdigest()

    full = str(tmp_path / "full")
    r = write_resumable_parquet(ds(), full, key="doc_id", n_partitions=8)
    assert r["skipped"] == [] and len(r["written"]) > 0

    resumed = str(tmp_path / "resumed")
    r1 = write_resumable_parquet(ds(), resumed, key="doc_id", n_partitions=8)
    killed = r1["written"][:3]
    for pid in killed:
        shutil.rmtree(os.path.join(resumed, f"part-{pid:05d}"))
    assert finished_partitions(resumed) == set(r1["written"]) - set(killed)
    r2 = write_resumable_parquet(ds(), resumed, key="doc_id", n_partitions=8)
    assert r2["written"] == sorted(killed)  # ONLY the missing shards
    assert set(r2["skipped"]) == set(r1["written"]) - set(killed)
    assert tree_hash(full) == tree_hash(resumed)

    # fully-complete re-run writes nothing
    r3 = write_resumable_parquet(ds(), resumed, key="doc_id", n_partitions=8)
    assert r3["written"] == []


def test_q7_q9_q12_gated_paths_identical(ray_session):
    """Q7/Q9/Q12 shapes: driver_merge_limit=0 forces the distributed
    (Ray groupby) merge; output must be row-identical to the
    driver-merge path on the same repartitioned input."""
    import pyarrow.parquet as pq
    import ray.data

    from chearch_ray.pipelines.analytics import (
        late_shipment_priority,
        product_type_profit,
        volume_shipping,
    )

    sf = "/root/testdata/sf0.001"
    nation = pq.read_table(f"{sf}/nation.parquet")

    def li(cols):
        return ray.data.read_parquet(f"{sf}/lineitem.parquet",
                                     columns=cols).repartition(6)

    vs_cols = ["l_orderkey", "l_suppkey", "l_shipdate",
               "l_extendedprice", "l_discount"]
    orders = lambda: ray.data.read_parquet(
        f"{sf}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    cust = lambda: ray.data.read_parquet(
        f"{sf}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    supp = lambda: ray.data.read_parquet(
        f"{sf}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    # NATION_18/NATION_19 have traffic at sf0.001 (the default pair
    # does not); also pin the empty-pair schema path
    a = volume_shipping(li(vs_cols), orders(), cust(), supp(), nation,
                        nation_a="NATION_18", nation_b="NATION_19")
    b = volume_shipping(li(vs_cols), orders(), cust(), supp(), nation,
                        nation_a="NATION_18", nation_b="NATION_19",
                        driver_merge_limit=0)
    assert len(a) > 0
    assert a.to_pandas().equals(b.to_pandas())
    empty = volume_shipping(li(vs_cols), orders(), cust(), supp(), nation)
    assert len(empty) == 0
    assert empty.column_names == ["supp_nation", "cust_nation",
                                  "l_year", "rev_cents"]

    pp_cols = ["l_partkey", "l_suppkey", "l_shipdate",
               "l_extendedprice", "l_discount"]
    part = lambda: ray.data.read_parquet(
        f"{sf}/part.parquet", columns=["p_partkey", "p_name"])
    a = product_type_profit(li(pp_cols), part(), supp(), nation)
    b = product_type_profit(li(pp_cols), part(), supp(), nation,
                            driver_merge_limit=0)
    assert len(a) > 0
    assert a.to_pandas().equals(b.to_pandas())

    ls_cols = ["l_orderkey", "l_linestatus", "l_shipdate"]
    ord2 = lambda: ray.data.read_parquet(
        f"{sf}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"])
    a = late_shipment_priority(li(ls_cols), ord2())
    b = late_shipment_priority(li(ls_cols), ord2(), driver_merge_limit=0)
    assert len(a) > 0
    assert a.to_pandas().equals(b.to_pandas())


def test_q8_q17_gated_paths_identical(ray_session):
    """Q8/Q17 shapes: distributed-merge path (driver_merge_limit=0)
    row-identical to the driver-merge path."""
    import pyarrow.parquet as pq
    import ray.data

    from chearch_ray.pipelines.analytics import market_share, small_qty_revenue

    sf = "/root/testdata/sf0.001"
    nation = pq.read_table(f"{sf}/nation.parquet")
    region = pq.read_table(f"{sf}/region.parquet")

    def li(cols):
        return ray.data.read_parquet(f"{sf}/lineitem.parquet",
                                     columns=cols).repartition(6)

    ms_cols = ["l_orderkey", "l_partkey", "l_suppkey",
               "l_extendedprice", "l_discount"]
    orders = lambda: ray.data.read_parquet(
        f"{sf}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"])
    cust = lambda: ray.data.read_parquet(
        f"{sf}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    supp = lambda: ray.data.read_parquet(
        f"{sf}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    part = lambda cols: ray.data.read_parquet(f"{sf}/part.parquet",
                                              columns=cols)
    a = market_share(li(ms_cols), orders(), cust(), supp(),
                     part(["p_partkey", "p_type"]), nation, region)
    b = market_share(li(ms_cols), orders(), cust(), supp(),
                     part(["p_partkey", "p_type"]), nation, region,
                     driver_merge_limit=0)
    assert len(a) > 0
    assert a.to_pandas().equals(b.to_pandas())

    sq_cols = ["l_partkey", "l_quantity", "l_extendedprice"]
    a = small_qty_revenue(li(sq_cols), part(["p_partkey", "p_brand"]))
    b = small_qty_revenue(li(sq_cols), part(["p_partkey", "p_brand"]),
                          driver_merge_limit=0)
    assert a["n_lines"][0].as_py() > 0
    assert a.to_pandas().equals(b.to_pandas())


def test_q2_q20_q21_gated_paths_identical(ray_session):
    """Q2/Q20/Q21 shapes: distributed-merge paths (driver_merge_limit=0,
    which also forces Q21's two-level Ray groupby) row-identical to the
    driver-merge paths."""
    import pyarrow.parquet as pq
    import ray.data

    from chearch_ray.pipelines.analytics import (
        min_cost_supplier,
        promo_part_suppliers,
        waiting_orders_suppliers,
    )

    sf = "/root/testdata/sf0.001"
    nation = pq.read_table(f"{sf}/nation.parquet")
    region = pq.read_table(f"{sf}/region.parquet")

    def li(cols):
        return ray.data.read_parquet(f"{sf}/lineitem.parquet",
                                     columns=cols).repartition(6)

    supp = lambda: ray.data.read_parquet(
        f"{sf}/supplier.parquet",
        columns=["s_suppkey", "s_name", "s_acctbal", "s_nationkey"])
    part = lambda cols: ray.data.read_parquet(f"{sf}/part.parquet",
                                              columns=cols)

    pp_cols = ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"]
    a = promo_part_suppliers(li(pp_cols), supp(), part(["p_partkey", "p_name"]),
                             nation)
    b = promo_part_suppliers(li(pp_cols), supp(), part(["p_partkey", "p_name"]),
                             nation, driver_merge_limit=0)
    assert a.to_pandas().equals(b.to_pandas())

    # (p_size=1, ECONOMY) is populated at sf0.001; the sf0.01 default
    # (10, SMALL) is covered by the oracle row in test_entry
    mc_cols = ["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"]
    a = min_cost_supplier(li(mc_cols), supp(),
                          part(["p_partkey", "p_size", "p_type"]),
                          nation, region, p_size=1, p_type="ECONOMY")
    b = min_cost_supplier(li(mc_cols), supp(),
                          part(["p_partkey", "p_size", "p_type"]),
                          nation, region, p_size=1, p_type="ECONOMY",
                          driver_merge_limit=0)
    assert len(a) > 0
    assert a.to_pandas().equals(b.to_pandas())

    wo_cols = ["l_orderkey", "l_suppkey", "l_returnflag"]
    orders = lambda: ray.data.read_parquet(
        f"{sf}/orders.parquet", columns=["o_orderkey", "o_orderstatus"])
    # NATION_13 has a qualifying supplier at sf0.001 (the default
    # NATION_2 only does at sf0.01, covered by the oracle row)
    a = waiting_orders_suppliers(li(wo_cols), orders(), supp(), nation,
                                 nation="NATION_13")
    b = waiting_orders_suppliers(li(wo_cols), orders(), supp(), nation,
                                 nation="NATION_13", driver_merge_limit=0)
    assert len(a) > 0
    assert a.to_pandas().equals(b.to_pandas())


def test_media_resize_stub(ray_session):
    """MediaResize: fit-in-box metadata, payload shrunk to the pixel
    budget, deterministic across runs, schema preserved."""
    import ray.data

    from chearch_ray.stages.multimodal import (MEDIA_SCHEMA, MediaResize,
                                               resize_media,
                                               synthesize_media_table)

    media = synthesize_media_table(32, kind="image", seed=3)
    out = resize_media(ray.data.from_arrow(media), max_side=16)
    t = pa.concat_tables(out.iter_batches(batch_size=None,
                                          batch_format="pyarrow"))
    t = t.take(pa.compute.sort_indices(t, sort_keys=[("media_id",
                                                      "ascending")]))
    assert t.schema.names == MEDIA_SCHEMA.names
    assert len(t) == 32
    w = t["width"].to_numpy()
    h = t["height"].to_numpy()
    assert (np.maximum(w, h) <= 16).all() and (w >= 1).all() and (h >= 1).all()
    # single-actor mirror is identical (determinism + actor-pool parity)
    mirror = MediaResize(max_side=16)(media)
    assert t.equals(mirror.take(pa.compute.sort_indices(
        mirror, sort_keys=[("media_id", "ascending")])))
    # aspect ratio: scaling never enlarges
    ow = media.take(pa.compute.sort_indices(
        media, sort_keys=[("media_id", "ascending")]))["width"].to_numpy()
    assert (w <= np.maximum(ow, 1)).all()
    # shrunk payloads
    orig = {m: len(p) for m, p in zip(media["media_id"].to_pylist(),
                                      media["payload"].to_pylist())}
    for m, p in zip(t["media_id"].to_pylist(), t["payload"].to_pylist()):
        assert 0 < len(p) <= orig[m]


def test_frame_sample_stub(ray_session):
    """FrameSample: exactly n_frames rows per video, evenly spaced
    timestamps, concatenated spans reassemble a payload prefix; non-
    video rows drop."""
    import ray.data

    from chearch_ray.stages.multimodal import (FRAME_SCHEMA, FrameSample,
                                               sample_frames,
                                               synthesize_media_table)

    vids = synthesize_media_table(12, kind="video", seed=5)
    imgs = synthesize_media_table(5, kind="image", seed=6)
    imgs = imgs.set_column(0, "media_id",
                           pa.array(np.arange(100, 105), type=pa.int64()))
    both = pa.concat_tables([vids, imgs])
    out = sample_frames(ray.data.from_arrow(both), n_frames=3)
    t = pa.concat_tables(out.iter_batches(batch_size=None,
                                          batch_format="pyarrow"))
    assert t.schema.names == FRAME_SCHEMA.names
    assert len(t) == 12 * 3  # images dropped
    df = t.to_pandas().sort_values(["media_id", "frame_no"],
                                   ignore_index=True)
    payload = {m: p for m, p in zip(vids["media_id"].to_pylist(),
                                    vids["payload"].to_pylist())}
    dur = {m: d for m, d in zip(vids["media_id"].to_pylist(),
                                vids["duration_ms"].to_pylist())}
    for mid, grp in df.groupby("media_id"):
        assert list(grp["frame_no"]) == [0, 1, 2]
        assert list(grp["frame_ms"]) == [dur[mid] * f // 3 for f in range(3)]
        joined = b"".join(grp["payload"])
        assert payload[mid].startswith(joined) and len(joined) > 0
    # single-actor mirror identical
    mirror = FrameSample(n_frames=3)(both).to_pandas().sort_values(
        ["media_id", "frame_no"], ignore_index=True)
    assert df.equals(mirror)


def test_set_op_keys_paths_identical(ray_session):
    """set_op_keys: distributed-merge path (driver_merge_limit=0)
    row-identical to the driver path; intersect + except partition the
    left distinct set."""
    import pyarrow.parquet as pq
    import ray.data

    from chearch_ray.stages.joins import set_op_keys

    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "lang", "source"])
    a = lambda: ray.data.from_arrow(t).repartition(5).map_batches(
        lambda b: b.filter(pa.compute.equal(b["lang"], "en")).select(["doc_id"]),
        batch_format="pyarrow")
    b = lambda: ray.data.from_arrow(t).repartition(5).map_batches(
        lambda x: x.filter(pa.compute.equal(x["source"], "src7")).select(["doc_id"]),
        batch_format="pyarrow")
    for op in ("intersect", "except"):
        fast = set_op_keys(a(), b(), on="doc_id", op=op)
        scale = set_op_keys(a(), b(), on="doc_id", op=op,
                            driver_merge_limit=0)
        assert fast.to_pandas().equals(scale.to_pandas())
    inter = set_op_keys(a(), b(), on="doc_id", op="intersect")
    exc = set_op_keys(a(), b(), on="doc_id", op="except")
    df = t.to_pandas()
    n_left = df[df.lang == "en"].doc_id.nunique()
    assert len(inter) + len(exc) == n_left
    assert len(inter) > 0 and len(exc) > 0


def test_relational_ops_on_empty_inputs(ray_session):
    """every continuation relational operator must survive zero-row
    inputs with a stable schema (the broadcast join's right side may
    be a schema-less materialized empty — a real crash class)."""
    import pyarrow.parquet as pq
    import ray.data

    from chearch_ray.pipelines.analytics import (
        late_shipment_priority,
        market_share,
        min_cost_supplier,
        product_type_profit,
        promo_part_suppliers,
        small_qty_revenue,
        volume_shipping,
        waiting_orders_suppliers,
    )

    sf = "/root/testdata/sf0.001"
    nation = pq.read_table(f"{sf}/nation.parquet")
    region = pq.read_table(f"{sf}/region.parquet")

    def empty(cols):
        return ray.data.from_arrow(
            pa.table({c: pa.array([], type=t) for c, t in cols}))

    li = [("l_orderkey", pa.int64()), ("l_partkey", pa.int64()),
          ("l_suppkey", pa.int64()), ("l_quantity", pa.float64()),
          ("l_extendedprice", pa.float64()), ("l_discount", pa.float64()),
          ("l_shipdate", pa.timestamp("us")), ("l_linestatus", pa.string()),
          ("l_returnflag", pa.string())]
    orders = [("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
              ("o_orderdate", pa.timestamp("us")),
              ("o_orderpriority", pa.string()),
              ("o_orderstatus", pa.string())]
    cust = [("c_custkey", pa.int64()), ("c_nationkey", pa.int64())]
    supp = [("s_suppkey", pa.int64()), ("s_nationkey", pa.int64()),
            ("s_name", pa.string()), ("s_acctbal", pa.float64())]
    part = [("p_partkey", pa.int64()), ("p_name", pa.string()),
            ("p_type", pa.string()), ("p_size", pa.int32()),
            ("p_brand", pa.string())]

    assert len(volume_shipping(empty(li), empty(orders), empty(cust),
                               empty(supp), nation)) == 0
    assert len(product_type_profit(empty(li), empty(part), empty(supp),
                                   nation)) == 0
    assert len(late_shipment_priority(empty(li), empty(orders))) == 0
    assert len(market_share(empty(li), empty(orders), empty(cust),
                            empty(supp), empty(part), nation, region)) == 0
    sq = small_qty_revenue(empty(li), empty(part))
    assert sq["rev_cents"][0].as_py() == 0 and sq["n_lines"][0].as_py() == 0
    assert len(promo_part_suppliers(empty(li), empty(supp), empty(part),
                                    nation)) == 0
    assert len(min_cost_supplier(empty(li), empty(supp), empty(part),
                                 nation, region)) == 0
    assert len(waiting_orders_suppliers(empty(li), empty(orders),
                                        empty(supp), nation)) == 0

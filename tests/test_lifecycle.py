"""Document deletes (tombstones) + compaction: live-docs semantics,
snapshot isolation, and compact byte-identity vs a fresh build."""

import numpy as np
import pyarrow as pa
import pytest

from chearch_ray import ast
from chearch_ray.config import EngineConfig
from chearch_ray.oracle import OracleIndex
from chearch_ray.pipelines.build import build_index
from chearch_ray.pipelines.lifecycle import compact_index, delete_docs, load_tombstone_ids
from chearch_ray.sources.corpus import synthetic_corpus
from chearch_ray.state.engine import QueryEngine

CFG = EngineConfig(num_segments=2, num_term_shards=3, block_size=16)
N = 150
DELETED = list(range(1005, 1040, 3))  # spread across both segments


def _corpus():
    return synthetic_corpus(N, seed=42).append_column(
        "doc_id", pa.array(np.arange(1000, 1000 + N, dtype=np.uint64), type=pa.uint64())
    )


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    import ray.data

    d = str(tmp_path_factory.mktemp("life") / "idx")
    build_index(ray.data.from_arrow(_corpus()), d, CFG)
    return d


def test_delete_excludes_from_every_mode(ray_session, built, tmp_path):
    import shutil

    d = str(tmp_path / "idx")
    shutil.copytree(built, d)
    pre = QueryEngine(d, use_actors=False)
    queries = [
        ast.Term("def"),
        ast.Or(ast.Term("def"), ast.Term("return")),
        ast.And(ast.Term("def"), ast.Term("return")),
        ast.AndNot(ast.Term("def"), ast.Term("class")),
    ]
    # k >= corpus size: complete candidate rankings on both sides, so
    # the post-delete list must equal the pre-delete list minus deleted
    pre_results = {i: pre.search(q, k=N + 1) for i, q in enumerate(queries)}
    delete_docs(d, DELETED)
    post = QueryEngine(d, use_actors=False)
    deleted = set(DELETED)
    for i, q in enumerate(queries):
        got = post.search(q, k=N + 1)
        got_ids = got["doc_id"].to_pylist()
        assert not (set(got_ids) & deleted), q
        # live-docs contract: surviving docs keep their EXACT scores
        # and relative order (stats unchanged until compaction)
        want = [
            (d_, s)
            for d_, s in zip(
                pre_results[i]["doc_id"].to_pylist(), pre_results[i]["score"].to_pylist()
            )
            if d_ not in deleted
        ]
        got_pairs = list(zip(got_ids, got["score"].to_pylist()))
        assert got_pairs == want, q
        # boolean mode too
        bids = post.search_boolean(q)["doc_id"].to_pylist()
        assert not (set(bids) & deleted)
        pre_bids = [x for x in pre.search_boolean(q)["doc_id"].to_pylist() if x not in deleted]
        assert bids == pre_bids
    # phrase mode
    ph_pre = pre.search_phrase("def main", k=N + 1)
    ph = post.search_phrase("def main", k=N + 1)
    assert not (set(ph["doc_id"].to_pylist()) & deleted)
    want_ph = [
        (d_, s)
        for d_, s in zip(ph_pre["doc_id"].to_pylist(), ph_pre["score"].to_pylist())
        if d_ not in deleted
    ]
    assert list(zip(ph["doc_id"].to_pylist(), ph["score"].to_pylist())) == want_ph


def test_snapshot_isolation_open_engine_unaffected(ray_session, built, tmp_path):
    import shutil

    d = str(tmp_path / "idx")
    shutil.copytree(built, d)
    eng = QueryEngine(d, use_actors=False)
    before = eng.search_boolean(ast.Term("def"))["doc_id"].to_pylist()
    assert set(before) & set(DELETED), "fixture must cover deleted docs"
    delete_docs(d, DELETED)
    # the already-open engine keeps its snapshot
    assert eng.search_boolean(ast.Term("def"))["doc_id"].to_pylist() == before
    # a new engine sees the delete
    eng2 = QueryEngine(d, use_actors=False)
    after = eng2.search_boolean(ast.Term("def"))["doc_id"].to_pylist()
    assert not (set(after) & set(DELETED))


def test_filtered_search_respects_deletes(ray_session, built, tmp_path):
    import shutil

    d = str(tmp_path / "idx")
    shutil.copytree(built, d)
    delete_docs(d, DELETED)
    eng = QueryEngine(d, use_actors=False)
    got = eng.search(ast.Or(ast.Term("def"), ast.Term("return")), k=50,
                     filter={"lang": ["py", "go", "js"]})
    assert len(got) > 0
    assert not (set(got["doc_id"].to_pylist()) & set(DELETED))


def test_compact_byte_identical_to_rebuild(ray_session, built, tmp_path):
    import shutil

    import ray.data

    d = str(tmp_path / "idx")
    shutil.copytree(built, d)
    delete_docs(d, DELETED)
    m_compact = compact_index(d, str(tmp_path / "compacted"))

    corpus = _corpus()
    keep_mask = ~np.isin(corpus["doc_id"].to_numpy().astype(np.int64), DELETED)
    reduced = corpus.filter(pa.array(keep_mask))
    m_fresh = build_index(ray.data.from_arrow(reduced), str(tmp_path / "fresh"), CFG)

    assert m_compact.num_docs == m_fresh.num_docs == N - len(DELETED)
    assert m_compact.avgdl == m_fresh.avgdl
    assert {p["part"]: p["sha"] for p in m_compact.postings_parts} == {
        p["part"]: p["sha"] for p in m_fresh.postings_parts
    }
    assert {p["part"]: p["sha"] for p in m_compact.docmap_parts} == {
        p["part"]: p["sha"] for p in m_fresh.docmap_parts
    }
    # compacted index has no tombstones and serves the deleted-free view
    assert load_tombstone_ids(str(tmp_path / "compacted")) is None
    eng = QueryEngine(str(tmp_path / "compacted"), use_actors=False)
    assert not (set(eng.search_boolean(ast.Term("def"))["doc_id"].to_pylist()) & set(DELETED))


def test_delete_bm25_matches_reduced_oracle(ray_session, built, tmp_path):
    """Or-query with deletes == oracle candidates minus deleted, scored
    with the ORIGINAL corpus stats (live-docs contract)."""
    import shutil

    d = str(tmp_path / "idx")
    shutil.copytree(built, d)
    delete_docs(d, DELETED)
    eng = QueryEngine(d, use_actors=False)
    oracle = OracleIndex(_corpus(), CFG)
    tree = ast.Or(ast.Term("def"), ast.Term("return"))
    want = [
        (doc, s)
        for doc, s in sorted(oracle.bm25_scores(tree).items(), key=lambda it: (-it[1], it[0]))
        if doc not in set(DELETED)
    ][:20]
    got = eng.search(tree, k=20)
    assert got["doc_id"].to_pylist() == [doc for doc, _ in want]
    np.testing.assert_array_equal(got["score"].to_numpy(), np.array([s for _, s in want]))


def test_wide_mode_delete_and_compact(ray_session, tmp_path):
    import ray.data

    cfg = EngineConfig(num_segments=2, num_term_shards=2, block_size=16, doc_id_bits=128)
    corpus = synthetic_corpus(80, seed=7)
    n = len(corpus)
    hi = np.arange(n, dtype=np.uint64) % 5
    lo = np.arange(2000, 2000 + n, dtype=np.uint64)
    corpus = corpus.append_column("doc_id_hi", pa.array(hi, type=pa.uint64()))
    corpus = corpus.append_column("doc_id", pa.array(lo, type=pa.uint64()))
    d = str(tmp_path / "widx")
    build_index(ray.data.from_arrow(corpus), d, cfg)
    del_lo, del_hi = [2004, 2010, 2031], [int(hi[4]), int(hi[10]), int(hi[31])]
    delete_docs(d, del_lo, doc_ids_hi=del_hi)
    eng = QueryEngine(d, use_actors=False)
    got = eng.search_boolean(ast.Term("def"))
    pairs = set(zip(got["doc_id_hi"].to_pylist(), got["doc_id"].to_pylist()))
    assert not (pairs & set(zip(del_hi, del_lo)))
    m_compact = compact_index(d, str(tmp_path / "wcompact"))
    keep = ~np.isin(lo.astype(np.int64), del_lo)
    reduced = corpus.filter(pa.array(keep))
    m_fresh = build_index(ray.data.from_arrow(reduced), str(tmp_path / "wfresh"), cfg)
    assert {p["part"]: p["sha"] for p in m_compact.postings_parts} == {
        p["part"]: p["sha"] for p in m_fresh.postings_parts
    }
    assert {p["part"]: p["sha"] for p in m_compact.docmap_parts} == {
        p["part"]: p["sha"] for p in m_fresh.docmap_parts
    }


def test_random_trees_with_filters_and_deletes(ray_session, built, tmp_path):
    """randomized And/Or/AndNot trees x metadata filters x tombstones:
    engine results must equal the oracle restricted to (lang allowed,
    not deleted), scored with original stats."""
    import random
    import shutil

    from chearch_ray.sources.corpus import vocab

    d = str(tmp_path / "idx")
    shutil.copytree(built, d)
    delete_docs(d, DELETED)
    eng = QueryEngine(d, use_actors=False)
    corpus = _corpus()
    oracle = OracleIndex(corpus, CFG)
    from chearch_ray.stages.tokenize import _doc_ids_of

    lang_of = dict(zip(_doc_ids_of(corpus).tolist(), corpus["lang"].to_pylist()))
    deleted = set(DELETED)
    hot = sorted(oracle.postings, key=lambda t: -len(oracle.postings[t]))[:8]
    rng = random.Random(99)

    def rand_tree(depth):
        if depth == 0:
            return ast.Term(rng.choice(hot))
        op = rng.choice([ast.And, ast.Or, ast.AndNot])
        return op(rand_tree(depth - 1), rand_tree(rng.randint(0, depth - 1)))

    lang_pool = ["py", "js", "java", "go", "c", "rs", "rb", "chpl"]
    checked = 0
    for _ in range(30):
        tree = rand_tree(rng.randint(1, 3))
        langs = rng.sample(lang_pool, rng.randint(1, 4))
        allowed = set(langs)
        want = [
            (doc, s)
            for doc, s in sorted(oracle.bm25_scores(tree).items(), key=lambda it: (-it[1], it[0]))
            if lang_of[doc] in allowed and doc not in deleted
        ][:12]
        got = eng.search(tree, k=12, filter={"lang": langs})
        assert got["doc_id"].to_pylist() == [doc for doc, _ in want], (tree, langs)
        np.testing.assert_array_equal(
            got["score"].to_numpy(), np.array([s for _, s in want]), err_msg=str(tree)
        )
        bwant = [doc for doc in oracle.boolean_search(tree)
                 if lang_of[doc] in allowed and doc not in deleted]
        bgot = eng.search_boolean(tree, filter={"lang": langs})["doc_id"].to_pylist()
        assert bgot == bwant, (tree, langs)
        checked += len(want) > 0
    assert checked >= 10


# --------------------------------------------------------- doc store
def test_docstore_fetch_and_pruning(ray_session, tmp_path):
    import ray.data

    from chearch_ray.state.docstore import (
        docstore_build,
        docstore_fetch,
        docstore_pruned_fragments,
    )

    n = 2000
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array([f"document body {i}" for i in range(n)]),
            "lang": pa.array(["en"] * n),
        }
    )
    store = str(tmp_path / "store")
    docstore_build(ray.data.from_arrow(t).repartition(8), store, partition_bits=4)
    ids = [3, 999, 1500, 42]
    got = docstore_fetch(store, ids)
    assert got["doc_id"].to_pylist() == sorted(ids)
    assert got["text"].to_pylist() == [f"document body {i}" for i in sorted(ids)]
    assert "dpart" not in got.column_names
    # column pruning
    slim = docstore_fetch(store, ids, columns=["doc_id"])
    assert slim.column_names == ["doc_id"]
    # partition pruning: a small fetch must not touch most fragments
    touched, total = docstore_pruned_fragments(store, [7])
    assert touched < total, (touched, total)
    # a missing id simply returns no row
    assert docstore_fetch(store, [10**9])["doc_id"].to_pylist() == []


def test_upsert_byte_identical_to_rebuild(ray_session, built, tmp_path):
    """upsert = replace 10 docs' content + insert 5 new docs; the
    swapped-in index's part shas equal a from-scratch build over the
    updated corpus, and searches see the new content only."""
    import shutil

    import ray.data

    from chearch_ray.pipelines.lifecycle import upsert_docs

    d = str(tmp_path / "idx")
    shutil.copytree(built, d)
    base = _corpus()
    # replacements: new content under 10 existing ids; inserts: 5 new ids
    repl_ids = np.arange(1010, 1020, dtype=np.uint64)
    fresh = synthetic_corpus(15, seed=99)
    delta = fresh.append_column(
        "doc_id", pa.array(np.concatenate([repl_ids,
                                           np.arange(2000, 2005, dtype=np.uint64)]),
                           type=pa.uint64()))
    m = upsert_docs(d, delta, CFG)

    # expected corpus: base minus replaced ids, plus delta
    keep = ~np.isin(base["doc_id"].to_numpy(), repl_ids)
    expected = pa.concat_tables([base.filter(pa.array(keep)), delta])
    ref = str(tmp_path / "ref")
    m_ref = build_index(ray.data.from_arrow(expected), ref, CFG)
    assert m.num_docs == m_ref.num_docs == N + 5
    assert {p["part"]: p["sha"] for p in m.postings_parts} == {
        p["part"]: p["sha"] for p in m_ref.postings_parts}
    assert {p["part"]: p["sha"] for p in m.docmap_parts} == {
        p["part"]: p["sha"] for p in m_ref.docmap_parts}

    eng_a = QueryEngine(d, use_actors=False)
    eng_b = QueryEngine(ref, use_actors=False)
    ra = eng_a.search("def return", k=20)
    rb = eng_b.search("def return", k=20)
    assert ra["doc_id"].to_pylist() == rb["doc_id"].to_pylist()
    assert ra["score"].to_pylist() == rb["score"].to_pylist()


def test_cli_fsck_detects_corruption(ray_session, tmp_path):
    """`python -m chearch_ray fsck`: exit 0 + all parts ok on a clean
    index; exit 1 naming the damaged part after a byte flip."""
    import glob
    import os
    import subprocess
    import sys

    import ray.data

    from chearch_ray.config import EngineConfig
    from chearch_ray.pipelines.build import build_index
    from chearch_ray.sources.corpus import synthetic_corpus

    idx = str(tmp_path / "fsck")
    cfg = EngineConfig(num_segments=1, num_term_shards=2)
    build_index(ray.data.from_arrow(synthetic_corpus(30, seed=42)), idx, cfg)
    env = dict(os.environ, PYTHONPATH=os.path.join(os.path.dirname(__file__), ".."))
    r = subprocess.run([sys.executable, "-m", "chearch_ray", "fsck", "--index", idx],
                       capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "0 bad" in r.stdout
    f = sorted(glob.glob(f"{idx}/segments/*.parquet"))[0]
    with open(f, "r+b") as fh:
        fh.seek(10)
        fh.write(b"XX")
    r2 = subprocess.run([sys.executable, "-m", "chearch_ray", "fsck", "--index", idx],
                        capture_output=True, text=True, env=env)
    assert r2.returncode == 1
    assert "sha mismatch" in r2.stdout

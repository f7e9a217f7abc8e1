"""Regression tests for the round-1 code-review findings."""

import os
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pytest

from chearch_ray.state.searcher import topk_order


# ------------------------------------------------ topk tie determinism
def test_topk_order_mass_ties():
    """>4k candidates all tied: doc_id tie-break must pick the lowest
    ids, not an arbitrary argpartition subset."""
    scores = np.ones(1000)
    doc_ids = np.arange(1000, dtype=np.uint64)
    sel = topk_order(scores, doc_ids, 10)
    assert doc_ids[sel].tolist() == list(range(10))
    # ties at the threshold but not everywhere
    scores2 = np.concatenate([np.full(500, 2.0), np.full(500, 1.0)])
    rng = np.random.default_rng(0)
    perm = rng.permutation(1000)
    sel2 = topk_order(scores2[perm], doc_ids[perm], 600)
    got = doc_ids[perm][sel2]
    assert set(got[:500].tolist()) == set(range(500))  # all score-2 docs first
    assert got[500:].tolist() == sorted(got[500:].tolist())


def test_topk_order_edges():
    assert topk_order(np.empty(0), np.empty(0, dtype=np.uint64), 5).tolist() == []
    assert topk_order(np.array([1.0]), np.array([7], dtype=np.uint64), 0).tolist() == []


# --------------------------------------- resume with nothing left to do
def test_resume_after_manifest_only_crash(ray_session, tmp_path):
    """All partitions committed but manifest missing: the resumed build
    (whose shuffle input is then EMPTY) must still commit the manifest
    instead of crashing on the missing run dir."""
    import ray.data

    from chearch_ray.config import EngineConfig
    from chearch_ray.pipelines.build import build_index
    from chearch_ray.sources.corpus import synthetic_corpus

    cfg = EngineConfig(num_segments=2, num_term_shards=2)
    corpus = synthetic_corpus(60, seed=42)
    d = str(tmp_path / "idx")
    m1 = build_index(ray.data.from_arrow(corpus), d, cfg)
    # simulate "crashed after partitions, before manifest"
    os.remove(os.path.join(d, "manifest.json"))
    m2 = build_index(ray.data.from_arrow(corpus), d, cfg)
    assert m2.num_docs == m1.num_docs
    assert {p["sha"] for p in m2.postings_parts} == {p["sha"] for p in m1.postings_parts}


# --------------------------------------------- resume=False purges state
def test_rebuild_does_not_merge_stale_partitions(ray_session, tmp_path):
    """OnlineIndexer.flush-style reuse: rebuilding a directory with
    resume=False must not merge the previous build's partitions."""
    import ray.data

    from chearch_ray.config import EngineConfig
    from chearch_ray.pipelines.build import build_index
    from chearch_ray.sources.corpus import synthetic_corpus

    cfg = EngineConfig(num_segments=2, num_term_shards=2)
    d = str(tmp_path / "idx")
    big = synthetic_corpus(80, seed=42)
    build_index(ray.data.from_arrow(big), d, cfg, resume=False)
    small = synthetic_corpus(10, seed=7)
    m = build_index(ray.data.from_arrow(small), d, cfg, resume=False)
    assert m.num_docs == 10  # not 80, not mixed


# ------------------------------------------------- short-doc minhash
def test_minhash_short_docs_do_not_collide(ray_session):
    import ray.data

    from chearch_ray.stages.dedup import minhash_dedup_pairs

    docs = pa.Table.from_pylist(
        [
            {"doc_id": 1, "text": "hello world"},  # < 3 tokens: no shingles
            {"doc_id": 2, "text": "foo bar"},
            {"doc_id": 3, "text": "completely unrelated pair of words"},
            {"doc_id": 4, "text": "completely unrelated pair of words"},
        ]
    )
    pairs = minhash_dedup_pairs(ray.data.from_arrow(docs), threshold=0.5).to_pandas()
    found = {tuple(sorted((int(a), int(b)))) for a, b in zip(pairs["doc_a"], pairs["doc_b"])}
    assert (1, 2) not in found  # sentinel signatures must not pair
    assert (3, 4) in found  # real duplicates still found


# ---------------------------------------------- uint64 doc ids in pairs
def test_pair_tables_accept_hashed_uint64_ids(ray_session):
    import ray.data

    from chearch_ray.stages.dedup import minhash_dedup_pairs, simhash_pairs

    big_id = (1 << 63) + 12345  # above int64 range
    docs = pa.table(
        {
            "doc_id": pa.array([big_id, big_id + 1, 5], type=pa.uint64()),
            "text": pa.array(
                [
                    "the quick brown fox jumps over the lazy dog",
                    "the quick brown fox jumps over the lazy dog",
                    "unrelated words entirely here today my friend",
                ]
            ),
        }
    )
    mh = minhash_dedup_pairs(ray.data.from_arrow(docs), threshold=0.5).to_pandas()
    assert {int(a) for a in mh["doc_a"]} | {int(b) for b in mh["doc_b"]} == {big_id, big_id + 1}
    sh = simhash_pairs(ray.data.from_arrow(docs), max_hamming=3).to_pandas()
    assert (int(sh["doc_a"].iloc[0]), int(sh["doc_b"].iloc[0])) == (big_id, big_id + 1)


# --------------------------------------------- multimodal determinism
def test_media_table_deterministic_across_processes():
    script = (
        "import sys; sys.path.insert(0, %r); "
        "from chearch_ray.stages.multimodal import synthesize_media_table; "
        "import hashlib; t = synthesize_media_table(3, kind='image', seed=42); "
        "print(hashlib.sha256(b''.join(p.as_py() for p in t['payload'])).hexdigest())"
    ) % os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outs = set()
    for hashseed in ("1", "2"):
        env = dict(os.environ, PYTHONHASHSEED=hashseed)
        outs.add(
            subprocess.run(
                [sys.executable, "-c", script], env=env, capture_output=True, text=True, check=True
            ).stdout.strip()
        )
    assert len(outs) == 1


# -------------------------------------------------- wire count validation
def test_wire_request_count_mismatch_rejected():
    from chearch_ray.conformance import MemoryIndex
    from chearch_ray.functions import chasm
    from chearch_ray.serve import WireServer, build_request

    idx = MemoryIndex()
    idx.add_document([(2, 6)], 10)
    srv = WireServer(idx)
    buf = chasm.InstructionBuffer(32)
    chasm.InstructionWriter(buf).write_push_term(2)
    good = build_request(buf.to_bytes())
    assert srv.handle(good) != b"" or True  # parses fine
    bad = bytes([good[0] + 1]) + good[1:]
    with pytest.raises(ValueError, match="count mismatch"):
        srv.handle(bad)
    with pytest.raises(ValueError, match="truncated"):
        srv.handle(bytes([1, chasm.OP_PUSH, 0, 0]))


# ------------------------------------------ wired-through config knobs
def test_token_split_regex_and_position_cap(ray_session, tmp_path):
    import ray.data

    from chearch_ray.config import EngineConfig
    from chearch_ray.pipelines.build import build_index
    from chearch_ray.state.engine import QueryEngine
    from chearch_ray.state.searcher import SegmentSearcher

    corpus = pa.Table.from_pylist(
        [{"repo": "r", "path": "p", "commit": "c", "lang": "py", "content": "a_b a_b a_b c3 c3"}]
    )
    # custom split: underscore also separates -> tokens a, b, c3
    cfg = EngineConfig(token_split_regex="[^a-z0-9]+", max_positions_per_doc=2)
    d = str(tmp_path / "cfg")
    build_index(ray.data.from_arrow(corpus), d, cfg)
    eng = QueryEngine(d, use_actors=False)
    assert eng.df("a") == 1 and eng.df("a_b") == 0
    searcher = SegmentSearcher(d, 0, eng.cfg)
    docs, tfs = searcher.postings("a")
    assert tfs.tolist() == [3]  # tf unaffected by the position cap
    assert len(searcher.positions("a", int(docs[0]))) == 2  # capped


def test_tokenize_large_string_fast_path():
    lists = tokenize_col = None
    from chearch_ray.functions.tokenizer import tokenize

    texts = ["hello world", "Foo_Bar baz42", "", "x"]
    out = tokenize(pa.array(texts, type=pa.large_string())).to_pylist()
    assert out == [["hello", "world"], ["foo_bar", "baz42"], [], ["x"]]


def test_minhash_empty_dataset(ray_session):
    import ray.data

    from chearch_ray.stages.dedup import minhash_dedup_pairs

    empty = pa.table({"doc_id": pa.array([], type=pa.int64()), "text": pa.array([], type=pa.string())})
    out = minhash_dedup_pairs(ray.data.from_arrow(empty), threshold=0.5)
    # (Dataset.to_pandas drops columns for empty datasets — a Ray
    # quirk — so assert on the Dataset schema)
    assert out.schema().names == ["doc_a", "doc_b", "est_jaccard"]
    assert out.count() == 0


def test_merge_purges_stale_output_dir(ray_session, tmp_path):
    import ray.data

    from chearch_ray.config import EngineConfig
    from chearch_ray.pipelines.build import build_index
    from chearch_ray.pipelines.merge import merge_indexes
    from chearch_ray.sources.corpus import synthetic_corpus

    cfg = EngineConfig(num_segments=2, num_term_shards=2)
    big = synthetic_corpus(60, seed=42)
    small = synthetic_corpus(20, seed=9)
    out = str(tmp_path / "out")
    build_index(ray.data.from_arrow(big), out, cfg, resume=False)  # stale index in out
    build_index(ray.data.from_arrow(small), str(tmp_path / "s"), cfg)
    m = merge_indexes([str(tmp_path / "s")], out)
    assert m.num_docs == 20  # stale 60-doc index NOT folded in


def test_phrase_requires_positions(ray_session, tmp_path):
    import ray.data

    from chearch_ray.config import EngineConfig
    from chearch_ray.pipelines.build import build_index
    from chearch_ray.sources.corpus import synthetic_corpus
    from chearch_ray.state.engine import QueryEngine

    cfg = EngineConfig(num_segments=1, num_term_shards=2, store_positions=False)
    build_index(ray.data.from_arrow(synthetic_corpus(20, seed=42)), str(tmp_path / "np"), cfg)
    eng = QueryEngine(str(tmp_path / "np"), use_actors=False)
    with pytest.raises(ValueError, match="store_positions"):
        eng.search_phrase("def return")


def test_search_boolean_limit_overrides_partition_cap(ray_session, tmp_path):
    """engine.search_boolean(limit=) must return EVERY matching doc
    when the caller passes an explicit limit above partition_limit —
    analytics (significant_terms' foreground) silently truncated at
    the 2048/segment result-window cap otherwise (ADVICE r3)."""
    import ray.data

    from chearch_ray.config import EngineConfig
    from chearch_ray.pipelines.build import build_index
    from chearch_ray.state.engine import QueryEngine

    n = 60
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "content": pa.array(["needle haystack"] * n),
    })
    cfg = EngineConfig(num_segments=2, num_term_shards=2, partition_limit=5)
    build_index(ray.data.from_arrow(t), str(tmp_path / "idx"), cfg)
    eng = QueryEngine(str(tmp_path / "idx"), use_actors=False)
    capped = eng.search_boolean("needle")
    assert len(capped) == 10  # 5 per segment x 2 — reference default cap
    full = eng.search_boolean("needle", limit=n)
    assert len(full) == n
    assert sorted(full["doc_id"].to_pylist()) == list(range(n))

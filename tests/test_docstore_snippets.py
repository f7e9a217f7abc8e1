"""Index-sidecar docstore + search-and-display path.

Covers the round-5 serving composition: the resumable docstore
sidecar (state/docstore.py build_docstore/DocstoreReader),
QueryEngine.search_with_snippets (BM25 ranks/scores EXACTLY
search_parsed's; snippets exactly the pure-python tokenizer oracle),
wide 128-bit ids with adversarial lo-collisions, and the 0xFE snippet
wire frame over a real socket (pipelined, LRU-cached, per-id
malformed handling, mixed with 0xFF text frames on one connection).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chearch_ray.config import EngineConfig
from chearch_ray.functions.tokenizer import tokenize
from chearch_ray.pipelines.build import build_index
from chearch_ray.sources.corpus import synthetic_corpus
from chearch_ray.state.docstore import DocstoreReader, build_docstore, has_docstore
from chearch_ray.state.engine import QueryEngine

CFG = EngineConfig(num_segments=2, num_term_shards=4)
N_DOCS = 300


@pytest.fixture(scope="module")
def corpus():
    return synthetic_corpus(N_DOCS, seed=11, min_lines=5, max_lines=20)


@pytest.fixture(scope="module")
def engine(ray_session, corpus, tmp_path_factory):
    import ray.data

    idx = str(tmp_path_factory.mktemp("snip_idx"))
    build_index(ray.data.from_arrow(corpus), idx, CFG)
    # row groups of 8 docs: each ~37-doc partition gets several, so
    # the reader's fence pruning is actually exercised
    r = build_docstore(ray.data.from_arrow(corpus), idx,
                       n_partitions=8, row_group_docs=8)
    assert r["written"] and not r["skipped"]
    eng = QueryEngine(idx, use_actors=False)
    yield eng


def _tokens_by_doc(corpus):
    ids = corpus["doc_id"].to_pylist() if "doc_id" in corpus.column_names else None
    out = {}
    for i, txt in enumerate(corpus["content"].to_pylist()):
        out[i if ids is None else ids[i]] = tokenize(pa.array([txt]))[0].as_py()
    return out


# ------------------------------------------------------------ sidecar
def test_docstore_fetch_order_and_misses(engine, corpus):
    dsr = DocstoreReader(engine.index_dir)
    # docstore ids come from (repo, path, commit) — read them back via
    # a search so we use REAL engine ids
    t = engine.search("def", k=8, default_op="or")
    ids = t["doc_id"].to_numpy().astype(np.uint64)
    got = dsr.fetch(ids)
    assert got["doc_id"].to_numpy().astype(np.uint64).tolist() == ids.tolist()
    # unknown ids drop silently, known keep request order
    mixed = np.array([ids[2], np.uint64(12345), ids[0]], dtype=np.uint64)
    got = dsr.fetch(mixed)
    assert got["doc_id"].to_numpy().astype(np.uint64).tolist() == [ids[2], ids[0]]
    # empty fetch
    assert len(dsr.fetch(np.empty(0, dtype=np.uint64))) == 0


def test_docstore_resume_skips_everything(engine, corpus):
    import ray.data

    r2 = build_docstore(ray.data.from_arrow(corpus), engine.index_dir,
                        n_partitions=8, row_group_docs=64)
    assert not r2["written"] and r2["skipped"]
    assert has_docstore(engine.index_dir)


# ------------------------------------------------- engine composition
@pytest.mark.parametrize("q,op", [("def", "and"), ("def return", "or"),
                                  ("def return", "and")])
def test_search_with_snippets_exact(engine, corpus, q, op):
    t = engine.search_with_snippets(q, k=6, window=3, default_op=op)
    sp = engine.search_parsed(q, k=6, default_op=op)
    assert len(t) > 0
    assert t["doc_id"].to_pylist() == sp["doc_id"].to_pylist()
    assert t["score"].to_pylist() == sp["score"].to_pylist()
    dsr = DocstoreReader(engine.index_dir)
    docs = dsr.fetch(t["doc_id"].to_numpy().astype(np.uint64))
    txts = dict(zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()))
    terms = q.split()
    for row in t.to_pylist():
        toks = tokenize(pa.array([txts[row["doc_id"]]]))[0].as_py()
        firsts = [toks.index(x) for x in terms if x in toks]
        pos = min(firsts)
        want = " ".join(toks[max(0, pos - 3):pos + 4])
        assert row["pos"] == pos
        assert row["snippet"] == want


def test_snippets_without_docstore_raises(ray_session, corpus, tmp_path):
    import ray.data

    idx = str(tmp_path / "bare")
    build_index(ray.data.from_arrow(corpus), idx, CFG)
    eng = QueryEngine(idx, use_actors=False)
    with pytest.raises(FileNotFoundError):
        eng.search_with_snippets("def", k=3)


# ------------------------------------------------------- wide 128-bit
def test_wide_id_snippets_resolve_lo_collisions(ray_session, tmp_path):
    import ray.data

    base = synthetic_corpus(60, seed=5, min_lines=4, max_lines=10)
    # adversarial ids: every lo shared by up to 3 docs
    n = len(base)
    lo = pa.array([np.uint64(i // 3) for i in range(n)], type=pa.uint64())
    hi = pa.array([np.uint64(i % 3) for i in range(n)], type=pa.uint64())
    corpus = base.append_column("doc_id", lo).append_column("doc_id_hi", hi)
    idx = str(tmp_path / "wide")
    cfg = EngineConfig(num_segments=2, num_term_shards=4, doc_id_bits=128)
    build_index(ray.data.from_arrow(corpus), idx, cfg)
    build_docstore(ray.data.from_arrow(corpus), idx, n_partitions=4,
                   row_group_docs=16, wide=True)
    eng = QueryEngine(idx, use_actors=False)
    t = eng.search_with_snippets("def return", k=8, default_op="or", window=2)
    assert len(t) > 0 and "doc_id_hi" in t.column_names
    # every snippet must come from ITS doc's text, not a lo-sibling's
    texts = {}
    for i in range(n):
        texts[(i % 3, i // 3)] = base["content"][i].as_py()
    for row in t.to_pylist():
        toks = tokenize(pa.array([texts[(row["doc_id_hi"], row["doc_id"])]]))[0].as_py()
        firsts = [toks.index(x) for x in ("def", "return") if x in toks]
        assert row["pos"] == min(firsts)
        want_pos = min(firsts)
        assert row["snippet"] == " ".join(toks[max(0, want_pos - 2):want_pos + 3])


# ------------------------------------------------------------ 0xFE TCP
def test_snippet_wire_frame(engine):
    from chearch_ray.serve import (TcpQueryServer, WireEngine,
                                   build_snippet_request,
                                   query_snippets_pipelined,
                                   query_text_pipelined,
                                   _pipelined_roundtrip)

    srv = TcpQueryServer(WireEngine(engine), port=0,
                         pipelined=True).start_background()
    try:
        out = query_snippets_pipelined("127.0.0.1", srv.port,
                                       ["def return", "def"], k=5, window=3)
        assert out[0] is not None and out[1] is not None
        want = engine.search_with_snippets("def return", k=5, window=3)
        got = out[0]
        assert [r[0] for r in got] == want["doc_id"].to_pylist()
        assert [r[1] for r in got] == want["score"].to_pylist()
        assert [r[2] for r in got] == want["pos"].to_pylist()
        assert [r[3] for r in got] == want["snippet"].to_pylist()
        # LRU: identical bytes on a repeat
        again = query_snippets_pipelined("127.0.0.1", srv.port,
                                         ["def return"], k=5, window=3)[0]
        assert again == got
        # malformed k / window answer per-id as None, connection lives
        bad_k = bytes([0xFE, 0, 3]) + b"def"
        bad_w = bytes([0xFE, 5, 99]) + b"def"
        raw = _pipelined_roundtrip("127.0.0.1", srv.port,
                                   [bad_k, bad_w,
                                    build_snippet_request("def", 3, 2)])
        assert raw[0] is None and raw[1] is None and raw[2]
        # 0xFE and 0xFF frames mix on one connection
        texts = query_text_pipelined("127.0.0.1", srv.port, ["def"], k=5)
        assert texts[0]
    finally:
        srv.stop()


def test_snippet_frame_without_docstore_is_per_id_malformed(
        ray_session, corpus, tmp_path):
    import ray.data

    from chearch_ray.serve import (TcpQueryServer, WireEngine,
                                   query_snippets_pipelined,
                                   query_text_pipelined)

    idx = str(tmp_path / "bare_srv")
    build_index(ray.data.from_arrow(corpus), idx, CFG)
    eng = QueryEngine(idx, use_actors=False)
    srv = TcpQueryServer(WireEngine(eng), port=0,
                         pipelined=True).start_background()
    try:
        out = query_snippets_pipelined("127.0.0.1", srv.port, ["def"], k=3)
        assert out == [None]  # no docstore -> malformed answer, no crash
        # and the server still serves other frames afterwards
        assert query_text_pipelined("127.0.0.1", srv.port, ["def"], k=3)[0]
    finally:
        srv.stop()


def test_fence_pruning_exact_at_group_boundaries(engine, corpus):
    """The reader's row-group fences must resolve EVERY id — including
    the exact first/last id of each row group and uint64 hash ids past
    2^63 — and a fetch must decode only the candidate groups."""
    store = DocstoreReader(engine.index_dir)
    # collect the true per-group boundary ids straight from the files
    import pyarrow.parquet as pq

    boundary = []
    for pid, path in sorted(store.paths.items()):
        f = pq.ParquetFile(path)
        col = f.metadata.schema.to_arrow_schema().get_field_index("doc_id")
        for g in range(f.metadata.num_row_groups):
            st = f.metadata.row_group(g).column(col).statistics
            boundary.extend([st.min, st.max])
    boundary = np.unique(np.array(boundary, dtype=np.uint64))
    got = store.fetch(boundary)
    assert got["doc_id"].to_numpy().astype(np.uint64).tolist() == \
        boundary.tolist()
    # and decode volume stays point-shaped: the byte-bounded sink must
    # have split every multi-KB partition into >1 groups, so pruning
    # has something to skip
    multi = [p for p in store.paths
             if pq.ParquetFile(store.paths[p]).metadata.num_row_groups > 1]
    assert multi, "docstore wrote single-group partitions; fences untested"


def test_fetch_is_thread_safe_under_concurrency(engine, corpus):
    """Serving pools hit fetch from several threads; per-partition
    locking must keep results exact (same rows as the serial call)."""
    from concurrent.futures import ThreadPoolExecutor

    store = DocstoreReader(engine.index_dir)
    all_ids = corpus["doc_id"].to_numpy().astype(np.uint64) \
        if "doc_id" in corpus.column_names \
        else np.arange(N_DOCS, dtype=np.uint64)
    rng = np.random.default_rng(5)
    batches = [rng.choice(all_ids, size=10, replace=False) for _ in range(32)]
    serial = [store.fetch(b)["text"].to_pylist() for b in batches]
    fresh = DocstoreReader(engine.index_dir)  # cold cache, opened in-race
    with ThreadPoolExecutor(max_workers=8) as ex:
        threaded = list(ex.map(lambda b: fresh.fetch(b)["text"].to_pylist(),
                               batches))
    assert threaded == serial


def test_flush_roll_rolls_docstore_byte_identical(ray_session, tmp_path):
    """Streaming ingest keeps the sidecar: two flush_roll(docstore=True)
    generations must leave <index>/docstore byte-identical to a single
    build_docstore over everything ingested, and snippets served from
    the rolled index must match a one-shot build's."""
    import glob as _glob
    import hashlib

    import ray.data

    from chearch_ray.state.online import OnlineIndexer

    corpus = synthetic_corpus(200, seed=23, min_lines=3, max_lines=12)
    rows = corpus.to_pylist()
    main = str(tmp_path / "roll_idx")

    ing = OnlineIndexer(CFG)
    for r in rows[:120]:
        assert ing.enqueue_index_request(r)
    ing.flush_roll(main, docstore=True)
    for r in rows[120:]:
        assert ing.enqueue_index_request(r)
    ing.flush_roll(main, docstore=True)

    oneshot = str(tmp_path / "oneshot_idx")
    build_index(ray.data.from_arrow(corpus), oneshot, CFG)
    build_docstore(ray.data.from_arrow(corpus), oneshot)

    def shas(idx):
        return {p.split(idx, 1)[1]: hashlib.sha256(
                    open(p, "rb").read()).hexdigest()
                for p in sorted(_glob.glob(
                    f"{idx}/docstore/part-*/data.parquet"))}

    assert shas(main) and shas(main) == shas(oneshot)

    rolled = QueryEngine(main, use_actors=False)
    ref = QueryEngine(oneshot, use_actors=False)
    got = rolled.search_with_snippets("merge sort", k=8, default_op="or")
    want = ref.search_with_snippets("merge sort", k=8, default_op="or")
    assert got.equals(want)


def test_merge_docstores_rejects_mismatched_modulus(ray_session, tmp_path):
    import ray.data

    from chearch_ray.state.docstore import merge_docstores

    corpus = synthetic_corpus(40, seed=3)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    build_docstore(ray.data.from_arrow(corpus), a, n_partitions=4)
    build_docstore(ray.data.from_arrow(corpus), b, n_partitions=8)
    with pytest.raises(ValueError, match="hash modulus"):
        merge_docstores([a, b], str(tmp_path / "out"))


def test_tiered_ingest_carries_docstore(ray_session, tmp_path):
    """The scale ingest path: several flush_tiered(docstore=True)
    batches, compaction merges included, then collapse() — the final
    docstore must be byte-identical to a one-shot build over the whole
    corpus, and snippets must match a one-shot index's."""
    import glob as _glob
    import hashlib

    import ray.data

    from chearch_ray.state.online import OnlineIndexer
    from chearch_ray.state.tiered import TieredIndexSet

    corpus = synthetic_corpus(240, seed=31, min_lines=3, max_lines=10)
    rows = corpus.to_pylist()
    tiers = TieredIndexSet(str(tmp_path / "tiers"), fanout=2, base_docs=60)
    ing = OnlineIndexer(CFG)
    for lo in range(0, 240, 60):  # 4 batches -> forces >= 1 compaction
        for r in rows[lo:lo + 60]:
            assert ing.enqueue_index_request(r)
        ing.flush_tiered(tiers, docstore=True)
    assert tiers.merge_log, "compaction never ran; fixture too small"
    final = str(tmp_path / "served")
    tiers.collapse(final)

    oneshot = str(tmp_path / "oneshot")
    build_index(ray.data.from_arrow(corpus), oneshot, CFG)
    build_docstore(ray.data.from_arrow(corpus), oneshot)

    def shas(idx):
        return {p.split(idx, 1)[1]: hashlib.sha256(
                    open(p, "rb").read()).hexdigest()
                for p in sorted(_glob.glob(
                    f"{idx}/docstore/part-*/data.parquet"))}

    assert shas(final) and shas(final) == shas(oneshot)
    got = QueryEngine(final, use_actors=False).search_with_snippets(
        "merge sort", k=8, default_op="or")
    want = QueryEngine(oneshot, use_actors=False).search_with_snippets(
        "merge sort", k=8, default_op="or")
    assert got.equals(want)


def test_tiered_mixed_docstore_presence_refuses(ray_session, tmp_path):
    from chearch_ray.state.online import OnlineIndexer
    from chearch_ray.state.tiered import TieredIndexSet

    corpus = synthetic_corpus(80, seed=7, min_lines=3, max_lines=8)
    rows = corpus.to_pylist()
    tiers = TieredIndexSet(str(tmp_path / "tiers"), fanout=2, base_docs=30)
    ing = OnlineIndexer(CFG)
    for r in rows[:40]:
        ing.enqueue_index_request(r)
    ing.flush_tiered(tiers, docstore=True)
    for r in rows[40:]:
        ing.enqueue_index_request(r)
    with pytest.raises(ValueError, match="mixed docstore"):
        ing.flush_tiered(tiers, docstore=False)  # same size class -> merge


def test_compact_gcs_docstore_byte_identical(ray_session, tmp_path):
    """Delete + compact must take the tombstoned docs' TEXT off disk
    too: the compacted sidecar is byte-identical to a fresh
    build_docstore over the surviving corpus, and the compacted index
    serves snippets identical to a fresh build's."""
    import glob as _glob
    import hashlib

    import ray.data

    from chearch_ray.pipelines.lifecycle import compact_index, delete_docs
    from chearch_ray.stages.tokenize import _doc_ids_of

    corpus = synthetic_corpus(160, seed=13, min_lines=3, max_lines=10)
    idx = str(tmp_path / "del_idx")
    build_index(ray.data.from_arrow(corpus), idx, CFG)
    build_docstore(ray.data.from_arrow(corpus), idx)

    ids = _doc_ids_of(corpus)
    dead = ids[::5]
    delete_docs(idx, dead)
    compacted = str(tmp_path / "compacted")
    compact_index(idx, compacted)

    survivors = corpus.filter(pa.array(~np.isin(ids, dead)))
    fresh = str(tmp_path / "fresh")
    build_index(ray.data.from_arrow(survivors), fresh, CFG)
    build_docstore(ray.data.from_arrow(survivors), fresh)

    def shas(d):
        return {p.split(d, 1)[1]: hashlib.sha256(
                    open(p, "rb").read()).hexdigest()
                for p in sorted(_glob.glob(
                    f"{d}/docstore/part-*/data.parquet"))}

    assert shas(compacted) and shas(compacted) == shas(fresh)
    # dead ids no longer fetchable; snippet serving matches fresh
    got = QueryEngine(compacted, use_actors=False)
    assert len(got.docstore.fetch(dead[:8].astype(np.uint64))) == 0
    want = QueryEngine(fresh, use_actors=False)
    a = got.search_with_snippets("merge sort", k=8, default_op="or")
    b = want.search_with_snippets("merge sort", k=8, default_op="or")
    assert a.equals(b)


def test_upsert_refreshes_docstore_text(ray_session, tmp_path):
    """Upserting a doc must serve the NEW text's snippet (the replaced
    version physically leaves the sidecar), and the whole sidecar must
    equal a fresh build over the final corpus byte-for-byte."""
    import glob as _glob
    import hashlib

    import ray.data

    from chearch_ray.pipelines.lifecycle import upsert_docs

    corpus = synthetic_corpus(120, seed=17, min_lines=3, max_lines=8)
    idx = str(tmp_path / "ups_idx")
    build_index(ray.data.from_arrow(corpus), idx, CFG)
    build_docstore(ray.data.from_arrow(corpus), idx)

    # replace 10 docs with a marker text + insert 3 brand-new docs
    # (upsert_docs takes explicit doc_id columns; ids are the same
    # key-derived hashes the key-less corpora get, so the fresh
    # reference build below lines up)
    from chearch_ray.stages.tokenize import _doc_ids_of

    repl = corpus.slice(0, 10).to_pylist()
    for i, r in enumerate(repl):
        r["content"] = f"zzzmarker upserted document {i} merge sort"
    new = [{"repo": "newrepo", "path": f"n{i}.py", "commit": "c0",
            "lang": "py", "content": f"zzzmarker fresh doc {i}"}
           for i in range(3)]
    incoming = pa.Table.from_pylist(repl + new)
    incoming_ids = pa.array(_doc_ids_of(incoming), type=pa.uint64())
    upsert_docs(idx, incoming.append_column("doc_id", incoming_ids), cfg=CFG)

    # final corpus = originals minus replaced, plus incoming (key-less:
    # ids re-derive identically)
    keep = corpus.slice(10)
    final = pa.concat_tables([
        keep.select(incoming.column_names),
        incoming.select(incoming.column_names)])
    fresh = str(tmp_path / "fresh_ups")
    build_index(ray.data.from_arrow(final), fresh, CFG)
    build_docstore(ray.data.from_arrow(final), fresh)

    def shas(d):
        return {p.split(d, 1)[1]: hashlib.sha256(
                    open(p, "rb").read()).hexdigest()
                for p in sorted(_glob.glob(
                    f"{d}/docstore/part-*/data.parquet"))}

    assert shas(idx) and shas(idx) == shas(fresh)
    eng = QueryEngine(idx, use_actors=False)
    t = eng.search_with_snippets("zzzmarker", k=13, default_op="or")
    assert len(t) == 13  # 10 replaced + 3 new
    assert all("zzzmarker" in s for s in t["snippet"].to_pylist())


def test_fetch_property_random_ids(engine, corpus):
    """Property: for ANY request vector (hits, misses, duplicates,
    values past 2^63), fetch == the obvious per-id python reference:
    one row per requested id that exists, in request order."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    store = DocstoreReader(engine.index_dir)
    live = QueryEngine(engine.index_dir, use_actors=False).search(
        "def return", k=50, default_op="or")["doc_id"].to_numpy().astype(np.uint64)
    all_rows = pa.concat_tables(
        [pq_read(p) for p in store.paths.values()])
    truth = dict(zip(all_rows["doc_id"].to_numpy().astype(np.uint64).tolist(),
                     all_rows["text"].to_pylist()))

    @settings(max_examples=40, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(st.lists(
        st.one_of(
            st.sampled_from(live.tolist()),
            st.integers(min_value=0, max_value=2**64 - 1)),
        max_size=30))
    def check(req):
        got = store.fetch(np.array(req, dtype=np.uint64))
        want = [(i, truth[i]) for i in req if i in truth]
        assert list(zip(got["doc_id"].to_numpy().astype(np.uint64).tolist(),
                        got["text"].to_pylist())) == want

    check()


def pq_read(path):
    import pyarrow.parquet as _pq

    return _pq.read_table(path)


def test_snippet_frame_fuzz_random_payloads(engine):
    """0xFE frames with random garbage after the magic byte must
    answer every request id (ok or malformed) without wedging the
    connection, and a valid snippet query still works afterwards."""
    import random
    import socket
    import struct

    from chearch_ray.serve import (TcpQueryServer, V2_RESP, WireEngine,
                                   query_snippets_pipelined)

    rng = random.Random(99)
    srv = TcpQueryServer(WireEngine(engine), port=0,
                         pipelined=True).start_background()
    try:
        with socket.create_connection(("127.0.0.1", srv.port), timeout=5) as s:
            n = 12
            for rid in range(n):
                junk = bytes([0xFE]) + bytes(
                    rng.randrange(256) for _ in range(rng.randrange(0, 30)))
                s.sendall(struct.pack(">IH", rid, len(junk)) + junk)
            s.settimeout(5.0)
            got = {}

            def read_exactly(k):
                b = b""
                while len(b) < k:
                    c = s.recv(k - len(b))
                    assert c, "server closed mid-frame"
                    b += c
                return b

            while len(got) < n:
                rid, status, ln = V2_RESP.unpack(read_exactly(V2_RESP.size))
                payload = read_exactly(ln) if ln else b""
                got[rid] = status
            assert set(got) == set(range(n))
        out = query_snippets_pipelined("127.0.0.1", srv.port,
                                       ["def return"], k=5)
        assert out[0] is not None
    finally:
        srv.stop()


def test_group_cache_bounded_and_exact(engine, corpus):
    """The decoded-group LRU must stay bounded and never change fetch
    results; a cache-disabled reader is the reference."""
    live = QueryEngine(engine.index_dir, use_actors=False).search(
        "def return", k=40, default_op="or")["doc_id"].to_numpy().astype(np.uint64)
    hot = DocstoreReader(engine.index_dir, group_cache_size=4)
    cold = DocstoreReader(engine.index_dir, group_cache_size=0)
    rng = np.random.default_rng(9)
    for _ in range(25):
        req = rng.choice(live, size=8, replace=True)
        a = hot.fetch(req)
        b = cold.fetch(req)
        assert a.equals(b)
        assert len(hot._group_cache) <= 4
    assert len(cold._group_cache) == 0


def test_duplicate_lo_run_straddles_row_groups(ray_session, tmp_path):
    """A run of duplicate lo ids longer than a row group spans several
    groups inside one partition; fetch must decode the WHOLE covering
    range, not just the first group whose max >= id."""
    import ray.data

    n = 20
    base = synthetic_corpus(n, seed=41, min_lines=2, max_lines=4)
    lo = pa.array([np.uint64(7)] * n, type=pa.uint64())
    hi = pa.array([np.uint64(i) for i in range(n)], type=pa.uint64())
    corpus = base.append_column("doc_id", lo).append_column("doc_id_hi", hi)
    idx = str(tmp_path / "dup_run")
    os.makedirs(idx)
    build_docstore(ray.data.from_arrow(corpus), idx, n_partitions=1,
                   row_group_docs=4, wide=True)
    store = DocstoreReader(idx)
    want_text = {i: base["content"][i].as_py() for i in range(n)}
    # every (hi, lo=7) pair individually, and all at once
    for i in range(n):
        got = store.fetch(np.array([7], dtype=np.uint64),
                          np.array([i], dtype=np.uint64))
        assert got["text"].to_pylist() == [want_text[i]], f"hi={i} missed"
    got = store.fetch(np.full(n, 7, dtype=np.uint64),
                      np.arange(n, dtype=np.uint64))
    assert got["text"].to_pylist() == [want_text[i] for i in range(n)]


def test_flush_roll_autodetects_existing_sidecar(ray_session, tmp_path):
    """A roll that forgets docstore=True must NOT destroy the sidecar
    the previous roll built — the main index's state wins; and
    docstore=True onto a sidecar-less main refuses before any work."""
    from chearch_ray.state.online import OnlineIndexer

    rows = synthetic_corpus(120, seed=47, min_lines=3, max_lines=8).to_pylist()
    main = str(tmp_path / "auto_roll")
    ing = OnlineIndexer(CFG)
    for r in rows[:60]:
        ing.enqueue_index_request(r)
    ing.flush_roll(main, docstore=True)
    assert has_docstore(main)
    for r in rows[60:]:
        ing.enqueue_index_request(r)
    ing.flush_roll(main)  # flag forgotten — sidecar must survive
    assert has_docstore(main)
    eng = QueryEngine(main, use_actors=False)
    t = eng.search_with_snippets("def return", k=5, default_op="or")
    assert len(t) and all(s for s in t["snippet"].to_pylist())

    bare = str(tmp_path / "bare_roll")
    ing2 = OnlineIndexer(CFG)
    for r in rows[:60]:
        ing2.enqueue_index_request(r)
    ing2.flush_roll(bare)  # no sidecar
    for r in rows[60:]:
        ing2.enqueue_index_request(r)
    with pytest.raises(ValueError, match="no docstore to roll"):
        ing2.flush_roll(bare, docstore=True)
    assert ing2.pending() == 60  # refusal happened before the flush


def test_uncommitted_docstore_reads_as_absent(ray_session, corpus, tmp_path):
    """_meta.json is the commit record: a store with partitions but no
    meta (build killed pre-commit) must read as absent, the reader
    must refuse it, and a re-run must complete it (resume + commit)."""
    import ray.data

    idx = str(tmp_path / "crash_win")
    os.makedirs(idx)
    build_docstore(ray.data.from_arrow(corpus), idx, n_partitions=4)
    meta = os.path.join(idx, "docstore", "_meta.json")
    os.remove(meta)  # simulate the crash window
    assert not has_docstore(idx)
    with pytest.raises(FileNotFoundError, match="interrupted before commit"):
        DocstoreReader(idx)
    r = build_docstore(ray.data.from_arrow(corpus), idx, n_partitions=4)
    assert not r["written"] and r["skipped"]  # pure resume
    assert has_docstore(idx)
    assert DocstoreReader(idx).n_partitions == 4


def test_leftover_tmp_staging_dirs_are_ignored(ray_session, corpus, tmp_path):
    """A writer killed between pq.write_table and os.replace leaves a
    `part-NNNNN.tmp-<pid>/data.parquet` staging dir (the exact crash
    the atomic protocol exists for).  Every partition-listing consumer
    — reader, resume, merge, GC — must skip it, not crash or count it
    as committed."""
    import shutil

    import ray.data

    from chearch_ray.sources.sink import finished_partitions
    from chearch_ray.state.docstore import (docstore_dir, gc_docstore,
                                            merge_docstores)

    idx = str(tmp_path / "tmpdirs")
    os.makedirs(idx)
    build_docstore(ray.data.from_arrow(corpus), idx, n_partitions=4,
                   row_group_docs=16)
    store = docstore_dir(idx)
    committed = finished_partitions(store)  # BEFORE forging leftovers
    assert committed  # the build really wrote partitions
    # forge leftovers: real partition bytes under staging names — one
    # shadowing a committed pid, one under a pid that was NEVER
    # committed (would change the set if tmp names parsed as pids)
    src_part = sorted(n for n in os.listdir(store) if n.startswith("part-"))[0]
    shutil.copytree(os.path.join(store, src_part),
                    os.path.join(store, "part-00002.tmp-4242"))
    never_pid = max(committed) + 1
    shutil.copytree(os.path.join(store, src_part),
                    os.path.join(store, f"part-{never_pid:05d}.tmp-77"))
    assert finished_partitions(store) == committed  # tmp not counted
    assert never_pid not in finished_partitions(store)
    assert has_docstore(idx)
    # reader opens, routes, and fetches exactly as before
    dsr = DocstoreReader(idx)
    assert set(dsr.paths) == committed
    import pyarrow.parquet as pq

    all_ids = np.sort(np.concatenate([
        pq.read_table(p, columns=["doc_id"])["doc_id"].to_numpy()
        .astype(np.uint64) for p in dsr.paths.values()]))
    ids = all_ids[::7]
    got = dsr.fetch(ids)
    assert got["doc_id"].to_numpy().astype(np.uint64).tolist() == ids.tolist()
    # resume run: skips all committed partitions, ignores the tmp dir
    r = build_docstore(ray.data.from_arrow(corpus), idx, n_partitions=4,
                       row_group_docs=16)
    assert not r["written"] and set(r["skipped"]) == committed
    # GC and merge both enumerate source partitions — neither may crash
    dst_gc = str(tmp_path / "tmpdirs_gc")
    os.makedirs(dst_gc)
    r = gc_docstore(idx, dst_gc)
    assert set(r["written"]) == committed
    dst_mrg = str(tmp_path / "tmpdirs_mrg")
    os.makedirs(dst_mrg)
    r = merge_docstores([idx], dst_mrg)
    assert set(r["written"]) == committed
    assert len(DocstoreReader(dst_mrg).fetch(ids)) == len(ids)


def test_v1_snippet_without_docstore_drops_connection_cleanly(
        ray_session, corpus, tmp_path):
    """v1 has no request ids or error framing, so a handler failure
    (0xFE frame on an index without a docstore -> FileNotFoundError)
    must CLOSE the connection cleanly — not leak an unhandled task
    exception with the client left hanging — and the server must keep
    serving new connections."""
    import socket

    import ray.data

    from chearch_ray.serve import (TcpQueryServer, WireEngine,
                                   build_snippet_request,
                                   build_text_request)

    idx = str(tmp_path / "bare_v1")
    build_index(ray.data.from_arrow(corpus), idx, CFG)
    eng = QueryEngine(idx, use_actors=False)
    srv = TcpQueryServer(WireEngine(eng), port=0).start_background()
    try:
        with socket.create_connection(("127.0.0.1", srv.port), timeout=10) as s:
            s.sendall(build_snippet_request("def", k=3, window=2))
            s.settimeout(10)
            assert s.recv(4096) == b""  # clean EOF, not a hang
        # fresh connection serves normal frames
        with socket.create_connection(("127.0.0.1", srv.port), timeout=10) as s:
            s.sendall(build_text_request("def", k=3))
            assert len(s.recv(4096)) >= 16
    finally:
        srv.stop()


def test_statless_row_groups_still_fetch_exact(ray_session, tmp_path):
    """Row groups without doc_id min/max statistics (foreign writers)
    must still resolve every id: the degenerate-fence fallback keeps
    the searchsorted arrays monotone and force-includes the stat-less
    groups instead of fencing them [0, uint64max] (which silently
    mis-routed OTHER ids)."""
    import pyarrow.parquet as pq

    from chearch_ray.state.docstore import _write_docstore_meta

    idx = str(tmp_path / "nostat")
    part = os.path.join(idx, "docstore", "part-00000")
    os.makedirs(part)
    ids = np.arange(0, 64, dtype=np.uint64) * np.uint64(3)
    tbl = pa.table({
        "doc_id": pa.array(ids, type=pa.uint64()),
        "text": pa.array([f"doc number {i}" for i in ids.tolist()]),
    })
    pq.write_table(tbl, os.path.join(part, "data.parquet"),
                   row_group_size=8, write_statistics=False)
    _write_docstore_meta(idx, 1, False)
    dsr = DocstoreReader(idx)
    _, mins, maxs, nostat, _ = dsr._file(0)
    assert len(nostat) == 8  # every group lost its stats
    assert (np.diff(mins.astype(np.int64)) >= 0).all()
    assert (np.diff(maxs.astype(np.int64)) >= 0).all()
    want = np.array([0, 3, 93, 189], dtype=np.uint64)
    got = dsr.fetch(want)
    assert got["doc_id"].to_numpy().astype(np.uint64).tolist() == want.tolist()
    assert len(dsr.fetch(np.array([1], dtype=np.uint64))) == 0  # miss drops


def test_mixed_statless_group_does_not_misroute_neighbors(
        ray_session, corpus, tmp_path):
    """White-box: one stat-less group in the MIDDLE of a statful
    partition.  Before the fix its [0, uint64max] fence broke the
    sorted-fences precondition, sending neighbor ids to the wrong
    groups; now it gets a degenerate in-gap fence plus force-include."""
    import ray.data

    idx = str(tmp_path / "mixed")
    os.makedirs(idx)
    build_docstore(ray.data.from_arrow(corpus), idx, n_partitions=1,
                   row_group_docs=8)
    dsr = DocstoreReader(idx)
    f, mins, maxs, nostat, lock = dsr._file(0)
    assert len(mins) >= 3 and len(nostat) == 0
    g = len(mins) // 2  # simulate a stat-less middle group
    mins2, maxs2 = mins.copy(), maxs.copy()
    mins2[g] = maxs2[g] = maxs2[g - 1]
    dsr._files[0] = (f, mins2, maxs2, np.array([g], dtype=np.int64), lock)
    import pyarrow.parquet as pq

    all_ids = np.sort(pq.read_table(
        dsr.paths[0], columns=["doc_id"])["doc_id"].to_numpy()
        .astype(np.uint64))
    got = dsr.fetch(all_ids)
    assert got["doc_id"].to_numpy().astype(np.uint64).tolist() == \
        all_ids.tolist()


def test_wire_cache_byte_budget(engine):
    """The response LRU evicts on BYTES too: snippet responses are
    ~KB-scale, so the entry cap alone would let the cache grow far
    past its documented footprint."""
    from chearch_ray.serve import WireEngine

    wire = WireEngine(engine, text_cache_size=1000)
    wire.TEXT_CACHE_BYTES = 150
    wire._cache_put(("a",), b"x" * 60)
    wire._cache_put(("b",), b"y" * 60)
    assert len(wire._text_cache) == 2 and wire._text_cache_bytes == 120
    wire._cache_put(("c",), b"z" * 60)  # 180 > 150: LRU ("a") evicts
    assert set(wire._text_cache) == {("b",), ("c",)}
    assert wire._text_cache_bytes == 120
    # overwrite replaces, not double-counts
    wire._cache_put(("c",), b"w" * 10)
    assert wire._text_cache_bytes == 70
    assert wire._cache_get(("c",)) == b"w" * 10


def test_fsck_docstore_validates_and_detects(ray_session, corpus, tmp_path):
    """fsck_docstore: green on a committed build; flags a wrong
    routing modulus, an out-of-range pid, unsorted ids, and reports an
    uncommitted build (no _meta.json) as a note, not corruption."""
    import json
    import shutil
    import subprocess
    import sys as _sys

    import pyarrow.parquet as pq
    import ray.data

    from chearch_ray.state.docstore import docstore_dir, fsck_docstore

    idx = str(tmp_path / "fsck_ds")
    build_index(ray.data.from_arrow(corpus), idx, CFG)
    build_docstore(ray.data.from_arrow(corpus), idx, n_partitions=4,
                   row_group_docs=16)
    r = fsck_docstore(idx)
    assert not r["bad"] and not r["notes"]
    assert r["partitions"] == 4 and r["rows"] == N_DOCS
    # CLI surfaces the sidecar in the summary and stays exit 0
    env = dict(os.environ,
               PYTHONPATH=os.path.dirname(os.path.dirname(
                   os.path.abspath(__file__))))
    p = subprocess.run([_sys.executable, "-m", "chearch_ray", "fsck",
                        "--index", idx],
                       capture_output=True, text=True, env=env)
    assert p.returncode == 0, p.stdout + p.stderr
    assert "docstore 4 partitions" in p.stdout

    store = docstore_dir(idx)
    meta = os.path.join(store, "_meta.json")
    # wrong modulus in the commit record -> every partition misroutes
    orig = json.load(open(meta))
    json.dump({**orig, "n_partitions": 8}, open(meta, "w"))
    r = fsck_docstore(idx)
    assert any("route to other partitions" in b for b in r["bad"])
    json.dump(orig, open(meta, "w"))
    # out-of-range pid
    src = sorted(n for n in os.listdir(store) if n.startswith("part-"))[0]
    shutil.copytree(os.path.join(store, src),
                    os.path.join(store, "part-00009"))
    r = fsck_docstore(idx)
    assert any(">= modulus" in b for b in r["bad"])
    shutil.rmtree(os.path.join(store, "part-00009"))
    # unsorted ids break the fence-pruning precondition
    part0 = os.path.join(store, src, "data.parquet")
    t = pq.read_table(part0)
    pq.write_table(t.take(list(reversed(range(len(t))))), part0)
    r = fsck_docstore(idx)
    assert any("not sorted" in b for b in r["bad"])
    p = subprocess.run([_sys.executable, "-m", "chearch_ray", "fsck",
                        "--index", idx],
                       capture_output=True, text=True, env=env)
    assert p.returncode == 1 and "not sorted" in p.stdout
    # garbled / truncated meta is corruption to REPORT, not a crash
    open(meta, "w").write('{"n_partitions": 4')  # truncated json
    r = fsck_docstore(idx)
    assert any("unreadable" in b for b in r["bad"])
    open(meta, "w").write("{}")  # parses, but no modulus
    r = fsck_docstore(idx)
    assert any("n_partitions" in b for b in r["bad"])
    # valid JSON of the wrong SHAPE is corruption too — and must not
    # crash the handler (meta.get on a list) or masquerade as an
    # uncommitted build (`null` parses to None)
    open(meta, "w").write("[1]")
    r = fsck_docstore(idx)
    assert any("JSON object" in b for b in r["bad"])
    open(meta, "w").write("null")
    r = fsck_docstore(idx)
    assert any("JSON object" in b for b in r["bad"]), r
    assert not any("uncommitted" in n for n in r["notes"])
    json.dump(orig, open(meta, "w"))
    # uncommitted build (meta removed) is a resumable state: note only
    os.remove(meta)
    r = fsck_docstore(idx)
    assert not r["bad"] and r["partitions"] == 0
    assert any("uncommitted" in n for n in r["notes"])


def test_fsck_docstore_wide_requires_hi_column(ray_session, corpus, tmp_path):
    """Wide (128-bit id) sidecars must carry doc_id_hi; fsck flags a
    meta/schema mismatch."""
    import json

    import ray.data

    from chearch_ray.state.docstore import docstore_dir, fsck_docstore

    idx = str(tmp_path / "fsck_wide")
    os.makedirs(idx)
    build_docstore(ray.data.from_arrow(corpus), idx, n_partitions=2,
                   row_group_docs=16)
    meta = os.path.join(docstore_dir(idx), "_meta.json")
    json.dump({**json.load(open(meta)), "wide": True}, open(meta, "w"))
    r = fsck_docstore(idx)
    assert any("missing columns ['doc_id_hi']" in b for b in r["bad"])


# ----------------------------------------------------- more-like-this


def test_more_like_this_by_doc_id(engine, corpus):
    """`doc_id=` fetches the source text from the docstore sidecar,
    auto-excludes the source, and equals the documented manual recipe
    (text= with k+1, caller drops the source row)."""
    # any doc the index can surface works as a source
    src = engine.search_boolean("def", limit=5)["doc_id"][0].as_py()
    text = engine.fetch_docs([src])["text"][0].as_py()
    # n_terms wide enough that SHARED terms enter the selection — the
    # top few tf·idf terms of a synthetic doc are unique to it, and a
    # selection of only-unique terms retrieves nothing but the source
    got = engine.more_like_this(doc_id=src, n_terms=40, k=10)
    manual = engine.more_like_this(text, n_terms=40, k=11)
    keep = [i for i, d in enumerate(manual["doc_id"].to_pylist())
            if d != src][:10]
    want = manual.take(pa.array(keep, type=pa.int64()))
    assert got.equals(want)
    assert src not in got["doc_id"].to_pylist()
    assert len(got) > 0


def test_more_like_this_validation(engine):
    with pytest.raises(ValueError, match="exactly one"):
        engine.more_like_this()
    with pytest.raises(ValueError, match="exactly one"):
        engine.more_like_this("some text", doc_id=1)
    with pytest.raises(KeyError):
        engine.more_like_this(doc_id=2**63)

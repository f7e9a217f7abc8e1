"""Unit tests for the pure kernels: tokenizer, hashing, posting codec."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from chearch_ray.functions import codec
from chearch_ray.functions.hashing import (
    TermSharder,
    doc_id_from_keys,
    murmur3_finalize32,
    sha256_hex,
    term_hash64,
)
from chearch_ray.functions.tokenizer import explode, token_counts, tokenize


# ------------------------------------------------------------- tokenizer
def test_tokenize_basic():
    col = pa.array(["def Foo_bar(x):\n  return x+1", "", None, "a b  c"])
    lists = tokenize(col)
    assert lists.to_pylist() == [
        ["def", "foo_bar", "x", "return", "x", "1"],
        [],
        [],
        ["a", "b", "c"],
    ]


def test_tokenize_subtokens():
    col = pa.array(["camelCaseVar snake_case_var XMLHttp"])
    lists = tokenize(col, split_subtokens=True)
    assert lists.to_pylist() == [
        ["camel", "case", "var", "snake", "case", "var", "xml", "http"]
    ]


def test_tokenize_matches_duckdb_split():
    """Default mode must be replicable by DuckDB regexp_split_to_array
    (this is what the driver oracle SQL uses)."""
    import duckdb

    texts = ["The quick! brown_fox.jumps", "x=1; y = x*2 // comment", "émoji ☃ text"]
    lists = tokenize(pa.array(texts)).to_pylist()
    con = duckdb.connect()
    for text, ours in zip(texts, lists):
        sql = con.execute(
            "select list_filter(regexp_split_to_array(lower(?), '[^a-z0-9_]+'), x -> x <> '')",
            [text],
        ).fetchone()[0]
        assert sql == ours, text


def test_token_counts_and_explode():
    lists = tokenize(pa.array(["a b a", "c", ""]))
    assert token_counts(lists).tolist() == [3, 1, 0]
    values, rows, positions = explode(lists)
    assert values.to_pylist() == ["a", "b", "a", "c"]
    assert rows.tolist() == [0, 0, 0, 1]
    assert positions.tolist() == [0, 1, 2, 0]


def test_explode_on_sliced_array():
    lists = tokenize(pa.array(["a b", "c d", "e"])).slice(1, 2)
    values, rows, positions = explode(lists)
    assert values.to_pylist() == ["c", "d", "e"]
    assert rows.tolist() == [0, 0, 1]
    assert positions.tolist() == [0, 1, 0]


# --------------------------------------------------------------- hashing
def test_murmur3_finalizer_known_values():
    # finalizer properties: deterministic, 32-bit, avalanche != identity
    assert murmur3_finalize32(0) == 0
    assert murmur3_finalize32(1) != 1
    assert 0 <= murmur3_finalize32(0xDEADBEEF) < 2**32


def test_doc_id_stability_and_uniqueness():
    ids1 = doc_id_from_keys(["r1", "r1", "r2"], ["a", "b", "a"], ["c", "c", "c"])
    ids2 = doc_id_from_keys(["r1", "r1", "r2"], ["a", "b", "a"], ["c", "c", "c"])
    assert ids1.dtype == np.uint64
    assert (ids1 == ids2).all()
    assert len(set(ids1.tolist())) == 3
    # separator prevents (repo='a', path='bc') colliding with ('ab','c')
    a = doc_id_from_keys(["a"], ["bc"], ["x"])
    b = doc_id_from_keys(["ab"], ["c"], ["x"])
    assert a[0] != b[0]


def test_term_sharder():
    sh = TermSharder(8)
    terms = pa.array(["def", "return", "def", "x", "def"])
    shards = sh.shards(terms)
    assert shards.tolist()[0] == shards.tolist()[2] == shards.tolist()[4]
    assert all(0 <= s < 8 for s in shards.tolist())
    assert sh.shard_of("def") == term_hash64("def") % 8


def test_sha256_matches_duckdb():
    import duckdb

    texts = ["hello", "", "ünïcode"]
    ours = sha256_hex(pa.array(texts)).to_pylist()
    con = duckdb.connect()
    for t, o in zip(texts, ours):
        assert con.execute("select sha256(?)", [t]).fetchone()[0] == o


# ----------------------------------------------------------------- codec
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=100))
@settings(max_examples=200)
def test_varint_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert codec.varint_decode(codec.varint_encode(arr), len(arr)).tolist() == values


def test_varint_lengths():
    arr = np.array([0, 127, 128, 2**14 - 1, 2**14, 2**63], dtype=np.uint64)
    lens = codec.varint_byte_lengths(arr)
    assert lens.tolist() == [1, 1, 2, 2, 3, 10]
    enc = codec.varint_encode(arr)
    assert len(enc) == lens.sum()


@st.composite
def sorted_unique_u64(draw):
    vals = draw(
        st.lists(st.integers(min_value=0, max_value=2**63), unique=True, min_size=0, max_size=600)
    )
    return sorted(vals)


@given(sorted_unique_u64(), st.sampled_from([4, 128]))
@settings(max_examples=100)
def test_postings_roundtrip(doc_ids, block_size):
    docs = np.array(doc_ids, dtype=np.uint64)
    tfs = (docs % np.uint64(17)) + np.uint64(1)
    enc = codec.encode_postings(docs, tfs, block_size=block_size)
    d, t = codec.decode_postings(enc, block_size=block_size)
    assert d.tolist() == doc_ids
    assert t.tolist() == tfs.tolist()
    # per-block decode agrees with full decode
    out_d, out_t = [], []
    for blk in range(len(enc.block_last)):
        bd, bt = codec.decode_block(enc, blk, block_size=block_size)
        out_d += bd.tolist()
        out_t += bt.tolist()
    assert out_d == doc_ids
    assert out_t == tfs.tolist()


def test_postings_block_metadata():
    docs = np.arange(0, 1000, 3, dtype=np.uint64)
    tfs = np.ones(len(docs), dtype=np.uint64)
    tfs[200] = 99
    enc = codec.encode_postings(docs, tfs, block_size=128)
    assert enc.count == len(docs)
    n_blocks = (len(docs) + 127) // 128
    assert len(enc.block_last) == n_blocks
    assert enc.block_last[-1] == docs[-1]
    assert enc.block_max_tf[200 // 128] == 99
    assert max(enc.block_max_tf[i] for i in range(n_blocks) if i != 200 // 128) == 1


def test_postings_empty():
    enc = codec.encode_postings(np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.uint64))
    d, t = codec.decode_postings(enc)
    assert len(d) == 0 and len(t) == 0


def test_decode_block_out_of_range():
    enc = codec.encode_postings(np.array([1, 2], dtype=np.uint64), np.array([1, 1], dtype=np.uint64))
    with pytest.raises(IndexError):
        codec.decode_block(enc, 5)


@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=30), st.integers(min_value=0, max_value=2**40)),
        min_size=0,
        max_size=300,
    ),
    st.sampled_from([4, 128]),
)
@settings(max_examples=60)
def test_bulk_encode_matches_per_term(pairs, block_size):
    """encode_postings_bulk must produce byte/metadata-identical output
    to per-term encode_postings."""
    # build sorted (term, doc) postings with unique doc per term
    by_term = {}
    for t, d in pairs:
        by_term.setdefault(t, set()).add(d)
    terms = sorted(by_term)
    doc_list, bounds = [], [0]
    for t in terms:
        docs = sorted(by_term[t])
        doc_list.extend(docs)
        bounds.append(len(doc_list))
    doc = np.array(doc_list, dtype=np.uint64)
    tf = (doc % np.uint64(13)) + np.uint64(1)
    bulk = codec.encode_postings_bulk(doc, tf, np.array(bounds, dtype=np.int64), block_size)
    for i, t in enumerate(terms):
        s, e = bounds[i], bounds[i + 1]
        enc = codec.encode_postings(doc[s:e], tf[s:e], block_size=block_size)
        assert bulk["counts"][i] == enc.count
        assert bulk["doc_blob_buf"][bulk["doc_blob_offsets"][i]:bulk["doc_blob_offsets"][i+1]] == enc.doc_blob
        assert bulk["tf_blob_buf"][bulk["tf_blob_offsets"][i]:bulk["tf_blob_offsets"][i+1]] == enc.tf_blob
        ls, le = bulk["block_list_offsets"][i], bulk["block_list_offsets"][i + 1]
        assert bulk["block_last"][ls:le].tolist() == enc.block_last.tolist()
        assert bulk["block_max_tf"][ls:le].tolist() == enc.block_max_tf.tolist()
        assert bulk["block_doc_off"][ls:le].tolist() == enc.block_doc_off.tolist()
        assert bulk["block_tf_off"][ls:le].tolist() == enc.block_tf_off.tolist()


def test_sharded_corpus_generation_identical():
    """write_corpus_parquet's row_range sharding must concatenate to
    the same table as whole-corpus generation (bench determinism)."""
    from chearch_ray.sources.corpus import synthetic_corpus

    whole = synthetic_corpus(30, seed=42)
    parts = [synthetic_corpus(30, seed=42, row_range=(lo, min(30, lo + 7))) for lo in range(0, 30, 7)]
    assert pa.concat_tables(parts).equals(whole)


@given(sorted_unique_u64(), st.sampled_from([4, 128]))
@settings(max_examples=60)
def test_bp128_roundtrip(doc_ids, block_size):
    docs = np.array(doc_ids, dtype=np.uint64)
    tfs = (docs % np.uint64(31)) + np.uint64(1)
    enc = codec.encode_postings_bp(docs, tfs, block_size=block_size)
    d, t = codec.decode_postings_any(enc, block_size, "bp128")
    assert d.tolist() == doc_ids
    assert t.tolist() == tfs.tolist()
    # block metadata identical to the varint codec's
    ev = codec.encode_postings(docs, tfs, block_size=block_size)
    assert enc.block_last.tolist() == ev.block_last.tolist()
    assert enc.block_max_tf.tolist() == ev.block_max_tf.tolist()


def _regex_tokenize_reference(texts):
    """pure regex reference for the fast-path equivalence test."""
    import re

    return [[t for t in re.split(r"[^a-z0-9_]+", s.lower()) if t] for s in texts]


@given(st.lists(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=60), max_size=20))
@settings(max_examples=150)
def test_ascii_fast_path_matches_regex(texts):
    lists = tokenize(pa.array(texts, type=pa.string()))
    assert lists.to_pylist() == _regex_tokenize_reference(texts)


def test_ascii_fast_path_on_sliced_input():
    arr = pa.array(["abc def", "Foo-Bar_9", "", "x!y"]).slice(1, 3)
    assert tokenize(arr).to_pylist() == [["foo", "bar_9"], [], ["x", "y"]]


def test_non_ascii_falls_back_to_regex_path():
    texts = ["Émile zola", "plain ascii"]
    lists = tokenize(pa.array(texts))
    # unicode lowering handled by the regex path ('É' -> 'é' separator)
    assert lists.to_pylist() == [["mile", "zola"], ["plain", "ascii"]]


@given(sorted_unique_u64(), st.sampled_from([4, 128]))
@settings(max_examples=60)
def test_pfor_roundtrip(doc_ids, block_size):
    docs = np.array(doc_ids, dtype=np.uint64)
    tfs = (docs % np.uint64(31)) + np.uint64(1)
    enc = codec.encode_postings_bp(docs, tfs, block_size=block_size,
                                   stream_encode=codec.pfor_encode_stream)
    d, t = codec.decode_postings_any(enc, block_size, "pfor")
    assert d.tolist() == doc_ids
    assert t.tolist() == tfs.tolist()


def test_pfor_beats_bp_on_outliers():
    rng = np.random.default_rng(5)
    deltas = rng.integers(1, 50, size=256, dtype=np.uint64)
    deltas[[10, 100, 200]] = 2**45
    pf, _ = codec.pfor_encode_stream(deltas, 128)
    bp, _ = codec.bp_encode_stream(deltas, 128)
    assert len(pf) < len(bp) // 2


# ----------------------------------------------- decode_blocks property
def test_decode_blocks_matches_full_decode_property():
    """any subset of skip blocks decodes to the matching slices of the
    full decode, for every codec (hypothesis-driven)."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from chearch_ray.functions.codec import (
        decode_blocks,
        decode_postings_any,
        encode_postings,
        encode_postings_bp,
        pfor_encode_stream,
    )

    @settings(max_examples=40, deadline=None)
    @given(
        n=st.integers(1, 400),
        seed=st.integers(0, 2**31 - 1),
        codec=st.sampled_from(["varint", "bp128", "pfor"]),
        data=st.data(),
    )
    def run(n, seed, codec, data):
        rng = np.random.default_rng(seed)
        docs = np.cumsum(rng.integers(1, 1 << 40, size=n, dtype=np.uint64)).astype(np.uint64)
        tfs = rng.integers(1, 200, size=n, dtype=np.uint64)
        bs = 16
        if codec == "varint":
            enc = encode_postings(docs, tfs, block_size=bs)
        elif codec == "bp128":
            enc = encode_postings_bp(docs, tfs, block_size=bs)
        else:
            enc = encode_postings_bp(docs, tfs, block_size=bs, stream_encode=pfor_encode_stream)
        full_docs, full_tfs = decode_postings_any(enc, bs, codec)
        np.testing.assert_array_equal(full_docs, docs)
        n_blocks = len(enc.block_last)
        subset = sorted(
            data.draw(
                st.sets(st.integers(0, n_blocks - 1), min_size=1, max_size=n_blocks)
            )
        )
        got_d, got_t = decode_blocks(enc, np.array(subset, dtype=np.int64), bs, codec)
        want_d = np.concatenate(
            [docs[b * bs : (b + 1) * bs] for b in subset]
        )
        want_t = np.concatenate([tfs[b * bs : (b + 1) * bs] for b in subset])
        np.testing.assert_array_equal(got_d, want_d)
        np.testing.assert_array_equal(got_t, want_t)

    run()


# ---------------------------------------- property tests: new kernels
def test_moving_partition_property():
    """_moving_partition == pandas rolling sum/count per user for
    random frames (hypothesis over sizes/values/users)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from chearch_ray.stages.events import _moving_partition, _round_half_away

    @settings(deadline=None, max_examples=30)
    @given(st.lists(st.tuples(st.integers(0, 5),          # user
                              st.integers(0, 10**9),      # ts us
                              st.floats(-100, 100, allow_nan=False)),
                    min_size=1, max_size=60),
           st.integers(1, 6))
    def check(rows, w):
        tbl = pa.table({
            "event_id": pa.array(range(len(rows)), type=pa.int64()),
            "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
            "value": pa.array([r[2] for r in rows], type=pa.float64()),
        })
        got = _moving_partition(tbl, w).to_pandas().sort_values(
            "event_id", ignore_index=True)
        df = tbl.to_pandas().sort_values(["user_id", "ts", "event_id"],
                                         ignore_index=True)
        df["c"] = _round_half_away(df["value"].to_numpy() * 100)
        g = df.groupby("user_id")["c"]
        df["w_sum_cents"] = g.rolling(w, min_periods=1).sum().reset_index(
            level=0, drop=True).astype(np.int64)
        df["w_count"] = g.rolling(w, min_periods=1).count().reset_index(
            level=0, drop=True).astype(np.int64)
        want = df[["event_id", "user_id", "w_sum_cents", "w_count"]
                  ].sort_values("event_id", ignore_index=True)
        pd.testing.assert_frame_equal(got, want)

    check()


def test_dense_rank_algebra_property():
    """the driver dense-rank algebra (sorted distinct pairs +
    segment-start accumulate) == pandas Series.rank(method='dense')."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import numpy as np
    import pandas as pd

    @settings(deadline=None, max_examples=40)
    @given(st.lists(st.tuples(st.sampled_from(["a", "b", "c"]),
                              st.integers(-50, 50)),
                    min_size=1, max_size=80))
    def check(pairs):
        df = pd.DataFrame(pairs, columns=["g", "v"]).drop_duplicates()
        df = df.sort_values(["g", "v"], ignore_index=True)
        keys = df["g"].to_numpy()
        i = np.arange(len(df), dtype=np.int64)
        new_grp = np.ones(len(df), dtype=bool)
        new_grp[1:] = keys[1:] != keys[:-1]
        grp_start = np.maximum.accumulate(np.where(new_grp, i, 0))
        got = i - grp_start + 1
        want = df.groupby("g")["v"].rank(method="dense").astype(np.int64)
        assert (got == want.to_numpy()).all()

    check()


def test_set_op_semantics_property():
    """set_op_keys distinct/sort/membership algebra == python set ops
    (pure kernel level: per-block distinct + np.isin membership)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import numpy as np

    @settings(deadline=None, max_examples=40)
    @given(st.lists(st.integers(0, 30), max_size=60),
           st.lists(st.integers(0, 30), max_size=60))
    def check(a, b):
        aa = np.array(sorted(set(a)), dtype=np.int64)
        bb = np.unique(np.array(b, dtype=np.int64)) if b else np.empty(0, np.int64)
        inter = aa[np.isin(aa, bb)]
        exc = aa[~np.isin(aa, bb)]
        assert set(inter.tolist()) == set(a) & set(b)
        assert set(exc.tolist()) == set(a) - set(b)
        assert len(inter) + len(exc) == len(set(a))

    check()

"""Query-grammar parser (functions/queryparse.py) + phrase-in-boolean
engine path: grammar unit tests, parser->engine equivalence against
hand-built ASTs, and a brute-force positional oracle for every
Phrase-bearing boolean combination."""

import re

import numpy as np
import pyarrow as pa
import pytest

from chearch_ray import ast
from chearch_ray.functions.queryparse import (
    QueryParseError,
    contains_phrase,
    is_grammar_query,
    parse,
)

# ----------------------------------------------------------- grammar


def test_parse_precedence_or_lowest():
    # a OR b AND c == a OR (b AND c)
    assert parse("a OR b AND c") == ast.Or(
        ast.Term("a"), ast.And(ast.Term("b"), ast.Term("c"))
    )


def test_parse_parens_override():
    assert parse("(a OR b) AND c") == ast.And(
        ast.Or(ast.Term("a"), ast.Term("b")), ast.Term("c")
    )


def test_parse_juxtaposition_is_and():
    assert parse("(a b)") == ast.And(ast.Term("a"), ast.Term("b"))


def test_parse_not_anchors_to_conjunction():
    assert parse("a AND NOT b") == ast.AndNot(ast.Term("a"), ast.Term("b"))
    # several negatives OR together under one AndNot
    assert parse("a AND NOT b AND NOT c") == ast.AndNot(
        ast.Term("a"), ast.Or(ast.Term("b"), ast.Term("c"))
    )


def test_parse_dash_negation_sugar():
    assert parse("(a -b)") == ast.AndNot(ast.Term("a"), ast.Term("b"))


def test_parse_double_negation_cancels():
    assert parse("a AND NOT NOT b") == ast.And(ast.Term("a"), ast.Term("b"))


def test_parse_prefix_and_fuzzy_leaves():
    assert parse("(pre* AND term~2)") == ast.And(
        ast.Prefix("pre"), ast.Fuzzy("term", 2)
    )


def test_parse_phrase_leaf():
    assert parse('"hash join" AND index') == ast.And(
        ast.Phrase(("hash", "join")), ast.Term("index")
    )


def test_parse_single_word_phrase_is_term():
    assert parse('("hash")') == ast.Term("hash")


def test_parse_lowercase_keywords_are_terms():
    # Lucene convention: only UPPERCASE keywords are operators
    assert parse("(black and white)") == ast.And(
        ast.And(ast.Term("black"), ast.Term("and")), ast.Term("white")
    )


def test_parse_case_folding():
    assert parse("(Merge Sort)") == ast.And(ast.Term("merge"), ast.Term("sort"))


@pytest.mark.parametrize(
    "bad",
    [
        "NOT a",  # pure negation
        "a OR NOT b",  # complement under OR
        "NOT a AND NOT b",  # all-negative conjunction
        "(a OR b",  # unbalanced paren
        "a)",  # unbalanced paren
        '"unterminated phrase',  # unbalanced quote
        '("")',  # empty phrase
        "a AND",  # dangling operator
        "OR a",  # leading operator
        "",  # empty query
        "   ",  # whitespace query
    ],
)
def test_parse_rejects(bad):
    with pytest.raises(QueryParseError):
        parse(bad)


def test_is_grammar_query_routing():
    assert is_grammar_query("(a OR b)")
    assert is_grammar_query('"hash join"')
    assert is_grammar_query("a AND b")
    # legacy flat strings must NOT route to the grammar
    assert not is_grammar_query("merge sort")
    assert not is_grammar_query("window -stream")
    assert not is_grammar_query("s* merge")
    assert not is_grammar_query("part~2")


def test_contains_phrase():
    assert contains_phrase(parse('a AND "b c"'))
    assert not contains_phrase(parse("a AND b"))


# ------------------------------------- engine integration + oracle


@pytest.fixture(scope="module")
def eng(ray_session, tmp_path_factory):
    import ray.data

    from chearch_ray.config import EngineConfig
    from chearch_ray.pipelines.build import build_index
    from chearch_ray.sources.corpus import synthetic_corpus
    from chearch_ray.state.engine import QueryEngine

    root = str(tmp_path_factory.mktemp("qparse") / "idx")
    cfg = EngineConfig(num_segments=2, num_term_shards=2)
    corpus = synthetic_corpus(200, seed=7)
    corpus = corpus.append_column(
        "doc_id", pa.array(np.arange(len(corpus), dtype=np.uint64))
    )
    build_index(ray.data.from_arrow(corpus), root, cfg)
    e = QueryEngine(root, use_actors=False)
    e._corpus = corpus  # brute-force oracle side-channel
    return e


def _brute_ids(eng, pred) -> list:
    """doc ids whose token list satisfies pred(tokens)."""
    ids = []
    for did, text in zip(
        eng._corpus["doc_id"].to_pylist(), eng._corpus["content"].to_pylist()
    ):
        toks = [t for t in re.split("[^a-z0-9_]+", text.lower()) if t]
        if pred(toks):
            ids.append(did)
    return sorted(ids)


def _has_phrase(toks, words):
    n = len(words)
    return any(toks[i : i + n] == list(words) for i in range(len(toks) - n + 1))


def _ids(t: pa.Table) -> list:
    return sorted(t["doc_id"].to_pylist())


def test_grammar_boolean_equals_manual_tree(eng):
    got = eng.search_boolean("(def OR class) AND return")
    want = eng.search_boolean(
        ast.And(ast.Or(ast.Term("def"), ast.Term("class")), ast.Term("return")),
        limit=10**9,
    )
    assert _ids(got) == _ids(want)


def test_grammar_not_equals_flat_negation(eng):
    got = eng.search_boolean("def AND NOT class", limit=10**9)
    want = eng.search_boolean("def -class", default_op="and", limit=10**9)
    assert _ids(got) == _ids(want)


def test_phrase_and_term_vs_brute_force(eng):
    words = ("def", "return")
    got = eng.search_boolean('"def return" AND class')
    want = _brute_ids(
        eng, lambda tk: _has_phrase(tk, words) and "class" in tk
    )
    assert _ids(got) == want
    assert len(want) > 0  # non-vacuous


def test_phrase_or_vs_brute_force(eng):
    got = eng.search_boolean('"def return" OR "def if"')
    want = _brute_ids(
        eng,
        lambda tk: _has_phrase(tk, ("def", "return"))
        or _has_phrase(tk, ("def", "if")),
    )
    assert _ids(got) == want


def test_phrase_not_vs_brute_force(eng):
    # phrase on the NEGATIVE side of AndNot — the case a relaxed
    # (phrase->And) rewrite would get wrong
    got = eng.search_boolean('def AND NOT "def return"')
    want = _brute_ids(
        eng, lambda tk: "def" in tk and not _has_phrase(tk, ("def", "return"))
    )
    assert _ids(got) == want
    assert len(want) > 0


def test_pure_phrase_query(eng):
    got = eng.search_boolean('("def return")')
    want = _brute_ids(eng, lambda tk: _has_phrase(tk, ("def", "return")))
    assert _ids(got) == want


def test_phrase_boolean_limit_is_ascending_prefix(eng):
    full = eng.search_boolean('"def return" OR class')
    lim = eng.search_boolean('"def return" OR class', limit=5)
    assert lim["doc_id"].to_pylist() == full["doc_id"].to_pylist()[:5]


def test_phrase_rejected_in_bm25_path(eng):
    with pytest.raises(ValueError, match="boolean-only"):
        eng.search('"def return" AND class')


def test_phrase_filter_unsupported(eng):
    with pytest.raises(NotImplementedError):
        eng.search_boolean('"def return"', filter={"lang": ["py"]})


def test_grammar_via_search_bm25_pure_boolean(eng):
    # grammar WITHOUT phrases flows through the ranked path too
    got = eng.search("(def OR class) AND return", k=5)
    want = eng.search(
        ast.And(ast.Or(ast.Term("def"), ast.Term("class")), ast.Term("return")),
        k=5,
    )
    assert got["doc_id"].to_pylist() == want["doc_id"].to_pylist()
    assert got["score"].to_pylist() == want["score"].to_pylist()


def test_parse_with_filters():
    from chearch_ray import ast
    from chearch_ray.functions.queryparse import (QueryParseError,
                                                  parse_with_filters)

    node, f = parse_with_filters("lang:py lang:go merge sort OR join source:web")
    assert f == {"lang": ["py", "go"], "source": ["web"]}
    assert node == ast.Or(ast.And(ast.Term("merge"), ast.Term("sort")),
                          ast.Term("join"))
    # no field tokens -> plain grammar, None filter
    node, f = parse_with_filters('"merge sort" AND join')
    assert f is None and isinstance(node, ast.And)
    # duplicates collapse, order preserved
    _, f = parse_with_filters("lang:py lang:py lang:go x")
    assert f == {"lang": ["py", "go"]}
    # phrases may contain colons without becoming filters
    node, f = parse_with_filters('"a b" x')
    assert f is None
    import pytest
    for bad in ("lang:py", "(lang:py merge)", "merge NOT lang:py",
                "merge -lang:py", "lang:py lang:go"):
        with pytest.raises(QueryParseError):
            parse_with_filters(bad)

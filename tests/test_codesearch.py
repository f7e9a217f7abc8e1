"""stages/codesearch: distributed grep / regex ops vs a pure-Python
reference over the multi-line synthetic code corpus."""

import re

import pyarrow as pa
import pytest
import ray.data

from chearch_ray.sources.corpus import synthetic_corpus
from chearch_ray.stages.codesearch import grep, regex_count


@pytest.fixture(scope="module")
def code_table(ray_session):
    return synthetic_corpus(300, seed=7, min_lines=2, max_lines=8)


def test_grep_matches_python_reference(code_table):
    pat = "(def|return|struct) [a-zA-Z_0-9]+"
    ds = ray.data.from_arrow(code_table).repartition(5)
    got = grep(ds, pat, text_column="content", id_columns=["repo", "path"]).to_pandas()
    rx = re.compile(pat)
    want = []
    for row in code_table.to_pylist():
        for i, line in enumerate(row["content"].split("\n"), start=1):
            if rx.search(line):
                want.append((row["repo"], row["path"], i, line))
    got_set = set(map(tuple, got[["repo", "path", "line_no", "line"]].itertuples(index=False)))
    assert got_set == set(want)
    assert len(got) == len(want)  # no duplicate emissions
    assert len(want) > 0  # the fixture actually exercises the match path


def test_grep_line_numbers_are_per_document(ray_session):
    t = pa.table(
        {
            "doc_id": [1, 2],
            "text": ["x\nneedle\ny\nneedle", "needle"],
        }
    )
    got = grep(ray.data.from_arrow(t), "needle").to_pandas()
    pairs = sorted(map(tuple, got[["doc_id", "line_no"]].itertuples(index=False)))
    assert pairs == [(1, 2), (1, 4), (2, 1)]


def test_regex_count_and_extract(code_table):
    pat = "[a-zA-Z_0-9]*(?:impl|match|class)[a-zA-Z_0-9]*"
    ds = ray.data.from_arrow(code_table).repartition(4)
    got = (
        regex_count(ds, pat, extract=pat, text_column="content", id_columns=["path"])
        .to_pandas()
        .set_index("path")
    )
    rx = re.compile(pat)
    assert len(got) == len(code_table)
    some_hits = 0
    for row in code_table.to_pylist():
        hits = rx.findall(row["content"])
        r = got.loc[row["path"]]
        assert r["n_matches"] == len(hits)
        assert r["first_match"] == (rx.search(row["content"]).group(0) if hits else "")
        some_hits += len(hits)
    assert some_hits > 0


def test_regex_count_empty_and_no_newline(ray_session):
    t = pa.table({"doc_id": [1, 2], "text": ["", "plain single line"]})
    got = regex_count(ray.data.from_arrow(t), "line").to_pandas().sort_values("doc_id")
    assert got["n_matches"].tolist() == [0, 1]
    g = grep(ray.data.from_arrow(t), "line").to_pandas()
    assert g["line_no"].tolist() == [1]

"""Driver contract for the graft builder (Ray Data target).

Backed by chearch_ray.pipelines.driver_contract.  Ray is initialised
by the driver before this module is imported; nothing here (or in the
library code it calls) invokes ray.init()/ray.shutdown().
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: build the inverted
    index (tokenize -> posting groupby -> compressed segments) and run
    a BM25 top-k query through the SegmentSearcher actor pool."""
    from chearch_ray.pipelines.driver_contract import flagship_entry

    return flagship_entry()


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2
    plus the training-data operators (dedup / similarity / text
    analysis / multimodal plumbing)."""
    from chearch_ray.pipelines.driver_contract import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for EVERY queries() entry — 163/163.
    Highlights: phrase via positional tokenization; media_* via
    sha256 of byte-exact stub reconstructions; quality/langid as
    exact float mirrors; fingerprint/minhash_pairs/simhash_pairs via
    a recursive-CTE FNV-1a fold with HUGEINT mod-2^64 arithmetic
    (numpy uint64 wraparound, reproduced bit-exactly in SQL)."""
    from chearch_ray.pipelines.driver_contract import ORACLE_SQL

    return dict(ORACLE_SQL)

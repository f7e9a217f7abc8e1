"""Sequence packing: assign every document to a fixed token-budget
training bin (concat-and-split semantics, the standard LLM-pretraining
packing: documents are laid out in ascending doc_id order, token
counts concatenate, and the stream splits every `max_tokens` tokens —
a document's bin is the bin of its FIRST token).

The reference engine has no analogue; this is a training-data-side
operator like stages/events.py.  The result is a deterministic pure
function of (corpus, max_tokens), independent of partitioning, and is
mirrored exactly in SQL by a running-sum window:

    bin = (sum(n_tokens) OVER (ORDER BY doc_id) - n_tokens) // max_tokens

Scale shape (the interesting part — a global ORDERED prefix sum
without a global sort of the corpus):

1. one streaming pass over the raw text computes (doc_id, n_tokens)
   and MATERIALIZES it — 16 bytes/doc (~16 TB at 10^12 docs vs 100 TB
   of text), the price of not re-tokenizing for the later passes;
2. doc_ids are split into `n_buckets` order-preserving RANGE buckets
   (fixed width over [min, max]); per-bucket token totals are
   combined map-side per block, then merged — on the driver when the
   partial-row estimate is small, else via a Ray groupby — and the
   driver computes the EXCLUSIVE per-bucket prefix (n_buckets rows,
   tiny);
3. one hash(bucket) % coarse_partitions shuffle co-locates whole
   buckets; inside each partition a single vectorized pass sorts by
   doc_id, computes the within-bucket exclusive cumsum (bucket ids
   are monotone in doc_id, so buckets are runs), and adds the
   broadcast bucket offsets.

The only all-to-all therefore carries 16-byte count rows, and no
stage ever holds more than a partition of them.

A document longer than max_tokens spans several bins; `bin` is where
it starts (and `bin_offset` its position there), exactly as in the
SQL mirror.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pyarrow as pa

from chearch_ray.functions.tokenizer import token_counts, tokenize
from chearch_ray.stages.partition import coarse_partition_ids

#: default context-window token budget
MAX_TOKENS = 2048
#: order-preserving range buckets for the distributed prefix sum
N_BUCKETS = 4096
#: tasks in the per-partition packing stage
PACK_PARTITIONS = 64
#: above this (blocks x buckets) estimate, bucket partials merge via a
#: Ray groupby instead of a driver-side gather
DRIVER_MERGE_LIMIT = 2_000_000

_COUNT_SCHEMA = pa.schema([("doc_id", pa.int64()), ("n_tokens", pa.int64())])


def _count_batch(batch: pa.Table, text_column: str) -> pa.Table:
    n = token_counts(tokenize(batch[text_column]))
    return pa.table(
        {
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "n_tokens": pa.array(n, type=pa.int64()),
        }
    )


def _minmax_batch(batch: pa.Table) -> pa.Table:
    d = batch["doc_id"].to_numpy()
    return pa.table(
        {
            "mn": pa.array([int(d.min())], type=pa.int64()),
            "mx": pa.array([int(d.max())], type=pa.int64()),
        }
    )


def _bucket_of(doc_ids: np.ndarray, mn: int, width: int) -> np.ndarray:
    # doc ids are hashed uint64 at scale; do the subtraction in uint64
    # (wraps are impossible: mn <= id) and divide there too
    u = doc_ids.astype(np.uint64) - np.uint64(mn)
    return (u // np.uint64(width)).astype(np.int64)


def _bucket_partial(batch: pa.Table, mn: int, width: int) -> pa.Table:
    b = _bucket_of(batch["doc_id"].to_numpy(), mn, width)
    t = pa.table(
        {
            "bucket": pa.array(b, type=pa.int64()),
            "tok": batch["n_tokens"],
        }
    )
    agg = t.group_by("bucket", use_threads=False).aggregate([("tok", "sum")])
    return pa.table({"bucket": agg["bucket"], "tok": agg["tok_sum"]})


def _add_pack_keys(batch: pa.Table, mn: int, width: int, n_parts: int) -> pa.Table:
    b = _bucket_of(batch["doc_id"].to_numpy(), mn, width)
    pgrp = coarse_partition_ids(b, n_parts)
    return batch.append_column("pgrp", pa.array(pgrp, type=pa.int32()))


def _pack_partition(
    group: pa.Table, mn: int, width: int, offsets: np.ndarray, max_tokens: int
) -> pa.Table:
    """one coarse partition (whole buckets) -> packed rows.  One sort
    by doc_id + numpy run arithmetic for every bucket at once."""
    if len(group) == 0:
        return pa.schema(
            [
                ("doc_id", pa.int64()),
                ("n_tokens", pa.int64()),
                ("bin", pa.int64()),
                ("bin_offset", pa.int64()),
            ]
        ).empty_table()
    group = group.drop_columns(["pgrp"])
    d = group["doc_id"].to_numpy()
    # packing order is UNSIGNED doc_id order (ids are uint64 hashes at
    # scale; int64 is only the shuffle-safe carrier) — sort the uint64
    # view so bucket ids stay monotone and equal buckets stay runs
    order = np.argsort(d.astype(np.uint64), kind="stable")
    d = d[order]
    n = group["n_tokens"].to_numpy()[order].astype(np.int64)
    b = _bucket_of(d, mn, width)
    cs = np.cumsum(n) - n  # exclusive, partition-local
    starts = np.empty(len(b), dtype=bool)
    starts[0] = True
    starts[1:] = b[1:] != b[:-1]  # buckets are runs: b is monotone in d
    sidx = np.flatnonzero(starts)
    runlen = np.diff(np.append(sidx, len(b)))
    within = cs - np.repeat(cs[sidx], runlen)
    pre = within + offsets[b]
    return pa.table(
        {
            "doc_id": pa.array(d, type=pa.int64()),
            "n_tokens": pa.array(n, type=pa.int64()),
            "bin": pa.array(pre // max_tokens, type=pa.int64()),
            "bin_offset": pa.array(pre % max_tokens, type=pa.int64()),
        }
    )


def pack_sequences(
    ds,
    max_tokens: int = MAX_TOKENS,
    text_column: str = "text",
    n_buckets: int = N_BUCKETS,
    coarse_partitions: int = PACK_PARTITIONS,
):
    """(doc_id, text) Dataset -> (doc_id, n_tokens, bin, bin_offset):
    concat-and-split packing of the ascending-doc_id token stream into
    `max_tokens`-sized bins.  See module docstring for the distributed
    prefix-sum plan."""
    counts = ds.map_batches(
        partial(_count_batch, text_column=text_column), batch_format="pyarrow"
    ).materialize()

    # doc_id range -> bucket width (driver gather: one row per block)
    mm = counts.map_batches(_minmax_batch, batch_format="pyarrow").take_all()
    if not mm:
        import ray.data

        return ray.data.from_arrow(
            pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("n_tokens", pa.int64()),
                    ("bin", pa.int64()),
                    ("bin_offset", pa.int64()),
                ]
            ).empty_table()
        )
    mn = min(r["mn"] for r in mm)
    mx = max(r["mx"] for r in mm)
    span = (np.uint64(mx) - np.uint64(mn)) + np.uint64(1)
    width = max(1, int(-(-int(span) // n_buckets)))  # ceil

    # per-bucket token totals -> exclusive prefix (offsets)
    partials = counts.map_batches(
        partial(_bucket_partial, mn=mn, width=width), batch_format="pyarrow"
    )
    est = counts.num_blocks() * n_buckets
    if est <= DRIVER_MERGE_LIMIT:
        rows = partials.take_all()
        sums = np.zeros(n_buckets, dtype=np.int64)
        for r in rows:
            sums[r["bucket"]] += r["tok"]
    else:  # scale path: merge partials in a Ray groupby first
        from ray.data.aggregate import Sum

        merged = partials.groupby("bucket").aggregate(Sum("tok", alias_name="tok")).take_all()
        sums = np.zeros(n_buckets, dtype=np.int64)
        for r in merged:
            sums[r["bucket"]] += r["tok"]
    offsets = np.concatenate(([0], np.cumsum(sums)[:-1]))

    parted = counts.map_batches(
        partial(_add_pack_keys, mn=mn, width=width, n_parts=coarse_partitions),
        batch_format="pyarrow",
    )
    return parted.groupby("pgrp").map_groups(
        partial(
            _pack_partition, mn=mn, width=width, offsets=offsets, max_tokens=max_tokens
        ),
        batch_format="pyarrow",
    )

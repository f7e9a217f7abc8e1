"""Sequence packing: assign every document to a fixed token-budget
training bin (concat-and-split semantics, the standard LLM-pretraining
packing: documents are laid out in a total pack order — ascending
doc_id, or a deterministic hash shuffle — token counts concatenate,
and the stream splits every `max_tokens` tokens — a document's bin is
the bin of its FIRST token).

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

#: Knuth multiplicative constant for order="hash" (same as
#: stages.sample.KNUTH_MULT; odd -> bijection, SQL-mirrorable via
#: HUGEINT arithmetic)
_HASH_MULT = np.uint64(6364136223846793005)


def _count_batch(batch: pa.Table, text_column: str, order: str) -> pa.Table:
    n = token_counts(tokenize(batch[text_column]))
    d = batch["doc_id"].to_numpy().astype(np.int64)
    # pkey: the packing-order sort key, carried as the int64 bit
    # pattern of an unsigned key (order = unsigned pkey order)
    if order == "hash":
        pkey = (d.astype(np.uint64) * _HASH_MULT).view(np.int64)
    else:
        pkey = d
    return pa.table(
        {
            "doc_id": pa.array(d, type=pa.int64()),
            "pkey": pa.array(pkey, type=pa.int64()),
            "n_tokens": pa.array(n, type=pa.int64()),
        }
    )


def _minmax_batch(batch: pa.Table) -> pa.Table:
    # min/max in uint64 key space, carried as int64 bit patterns
    # (hash keys exceed 2^63; int64 is the shuffle-safe carrier)
    u = batch["pkey"].to_numpy().view(np.uint64)
    ex = np.array([u.min(), u.max()], dtype=np.uint64).view(np.int64)
    return pa.table(
        {
            "mn": pa.array([int(ex[0])], type=pa.int64()),
            "mx": pa.array([int(ex[1])], type=pa.int64()),
        }
    )


def _bucket_of(pkeys: np.ndarray, mn: int, width: int) -> np.ndarray:
    # pack keys are unsigned (hashed or raw uint64 ids at scale,
    # carried as int64 bit patterns); do the subtraction in uint64
    # (wraps are impossible: mn <= key) and divide there too
    u = pkeys.astype(np.int64).view(np.uint64) - np.uint64(mn)
    return (u // np.uint64(width)).astype(np.int64)


def _bucket_partial(batch: pa.Table, mn: int, width: int) -> pa.Table:
    b = _bucket_of(batch["pkey"].to_numpy(), mn, width)
    t = pa.table(
        {
            "bucket": pa.array(b, type=pa.int64()),
            "tok": batch["n_tokens"],
        }
    )
    agg = t.group_by("bucket", use_threads=False).aggregate([("tok", "sum")])
    return pa.table({"bucket": agg["bucket"], "tok": agg["tok_sum"]})


def _add_pack_keys(batch: pa.Table, mn: int, width: int, n_parts: int) -> pa.Table:
    b = _bucket_of(batch["pkey"].to_numpy(), mn, width)
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
    k = group["pkey"].to_numpy()
    # packing order is UNSIGNED pack-key order (keys are uint64 hashes
    # or raw ids at scale; int64 is only the shuffle-safe carrier) —
    # sort the uint64 view so bucket ids stay monotone and equal
    # buckets stay runs
    order = np.argsort(k.astype(np.int64).view(np.uint64), kind="stable")
    k = k[order]
    d = group["doc_id"].to_numpy()[order]
    n = group["n_tokens"].to_numpy()[order].astype(np.int64)
    b = _bucket_of(k, mn, width)
    cs = np.cumsum(n) - n  # exclusive, partition-local
    starts = np.empty(len(b), dtype=bool)
    starts[0] = True
    starts[1:] = b[1:] != b[:-1]  # buckets are runs: b is monotone in k
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
    order: str = "doc_id",
):
    """(doc_id, text) Dataset -> (doc_id, n_tokens, bin, bin_offset):
    concat-and-split packing of the document token stream into
    `max_tokens`-sized bins.  See module docstring for the distributed
    prefix-sum plan.

    order="doc_id" packs in ascending (unsigned) doc_id order;
    order="hash" packs in Knuth-multiplicative-hash order — a
    deterministic, seed-free global shuffle of the documents before
    packing (the standard pretraining layout: neighbours in a bin are
    unrelated documents, not adjacent crawl records).  The hash is a
    bijection on uint64, so the order is total and SQL-mirrorable
    (ORDER BY (doc_id::HUGEINT * C) % 2^64)."""
    if order not in ("doc_id", "hash"):
        raise ValueError(f"unknown pack order: {order!r}")
    counts = ds.map_batches(
        partial(_count_batch, text_column=text_column, order=order),
        batch_format="pyarrow",
    ).materialize()

    # pack-key range -> bucket width (driver gather: one row per block)
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
    mn = int(np.array([r["mn"] for r in mm], dtype=np.int64).view(np.uint64).min())
    mx = int(np.array([r["mx"] for r in mm], dtype=np.int64).view(np.uint64).max())
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

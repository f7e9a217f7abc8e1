"""Per-group quota sampling (domain mixing): keep at most `quota`
documents per group (language, domain, source), selected in a
DETERMINISTIC pseudorandom order so the sample is uniform-ish,
reproducible, and exactly mirrorable in SQL.

The selection key is a Knuth multiplicative hash of doc_id computed in
wrapping uint64 arithmetic — `(doc_id * 6364136223846793005) mod 2^64`
— which SQL replicates bit-exactly via HUGEINT:
`(doc_id::HUGEINT * 6364136223846793005) % 2^64`.  Rank within group =
row_number ordered by (h, doc_id).

Scale shape (no analogue in the reference engine; training-data-side
operator like stages/pack.py):

* map-side pruning: each batch keeps only its own quota-lowest rows
  per group before the shuffle (a row outside a batch's local top
  `quota` can never enter the group's global top `quota`), so the
  all-to-all carries <= quota * groups-per-batch rows per batch, not
  the corpus;
* the final selection runs per coarse hash(group) % N partition with
  ONE vectorized pass over all its groups (sort by (group, h, id) +
  run-rank arithmetic) — never one Python call per group, which at
  web scale (millions of domains) would be all framework overhead.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pyarrow as pa

from chearch_ray.stages.partition import coarse_partition_ids

#: Knuth's MMIX multiplicative constant (fits in int64; odd, so the
#: map doc_id -> h is a bijection on uint64)
KNUTH_MULT = np.uint64(6364136223846793005)
#: coarse partitions for the final per-group selection
GROUP_PARTITIONS = 64


def _sample_hash(doc_ids: np.ndarray) -> np.ndarray:
    return doc_ids.astype(np.uint64) * KNUTH_MULT  # wraps mod 2^64


def _select_quota(tbl: pa.Table, group_column: str, quota: int) -> pa.Table:
    """rows -> the quota-lowest (h, doc_id) rows of every group in the
    table, vectorized across groups, with rank column `rn` (1-based)."""
    d = tbl["doc_id"].to_numpy().astype(np.int64)
    h = _sample_hash(d)
    g = tbl[group_column]
    if isinstance(g, pa.ChunkedArray):
        g = g.combine_chunks()
    # group ids via dictionary encode (string groups stay vectorized)
    enc = g.dictionary_encode()
    gid = np.asarray(enc.indices, dtype=np.int64)
    # sort by (group, h, doc_id): lexsort keys in reverse priority;
    # uint64 h sorts correctly as its own dtype
    order = np.lexsort((d, h, gid))
    gid_s = gid[order]
    starts = np.empty(len(gid_s), dtype=bool)
    if len(gid_s):
        starts[0] = True
        starts[1:] = gid_s[1:] != gid_s[:-1]
    sidx = np.flatnonzero(starts)
    runlen = np.diff(np.append(sidx, len(gid_s)))
    rank = np.arange(len(gid_s), dtype=np.int64) - np.repeat(sidx, runlen)
    keep = order[rank < quota]
    out = tbl.take(pa.array(keep, type=pa.int64()))
    return out.append_column("rn", pa.array(rank[rank < quota] + 1, type=pa.int64()))


def _group_hash64(values: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """stable uint64 FNV-1a per group value, computed once per UNIQUE
    value via dictionary encode (groups per batch << rows)."""
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    enc = values.dictionary_encode()
    uniq = enc.dictionary.to_pylist()
    lut = np.empty(len(uniq), dtype=np.uint64)
    for i, v in enumerate(uniq):
        h = np.uint64(0xCBF29CE484222325)
        for byte in str(v).encode():
            h = np.uint64((int(h) ^ byte) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF)
        lut[i] = h
    if len(uniq) == 0:
        return np.empty(0, dtype=np.uint64)
    return lut[np.asarray(enc.indices)]


def _partial_batch(batch: pa.Table, group_column: str, quota: int, n_parts: int) -> pa.Table:
    pruned = _select_quota(
        pa.table({group_column: batch[group_column], "doc_id": batch["doc_id"].cast(pa.int64())}),
        group_column,
        quota,
    ).drop_columns(["rn"])
    pgrp = coarse_partition_ids(_group_hash64(pruned[group_column]), n_parts)
    return pruned.append_column("pgrp", pa.array(pgrp, type=pa.int32()))


def _final_partition(group: pa.Table, group_column: str, quota: int) -> pa.Table:
    if len(group) == 0:
        return pa.schema(
            [(group_column, pa.string()), ("doc_id", pa.int64()), ("rn", pa.int64())]
        ).empty_table()
    return _select_quota(group.drop_columns(["pgrp"]), group_column, quota)


def _hash_split_batch(batch: pa.Table, id_column: str,
                      bounds: np.ndarray, names: list[str]) -> pa.Table:
    h = _sample_hash(batch[id_column].to_numpy().astype(np.int64).view(np.uint64))
    idx = np.searchsorted(bounds, h, side="right")
    labels = np.array(names, dtype=object)[idx]
    return batch.append_column("split", pa.array(labels, type=pa.string()))


def hash_split(ds, ratios: dict[str, float], id_column: str = "doc_id"):
    """Deterministic train/val/test assignment: each row's Knuth hash
    of `id_column` lands in one of the cumulative-ratio intervals of
    [0, 2^64) — seed-free, partition- and scale-invariant (a document
    keeps its split whatever else is in the corpus), and SQL-mirrorable
    with HUGEINT threshold compares.  Adds a `split` string column;
    ratios must sum to 1 (the last band absorbs rounding)."""
    names = list(ratios)
    if not names:
        raise ValueError("ratios must name at least one split")
    total = float(sum(ratios.values()))
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"ratios must sum to 1, got {total}")
    # cumulative upper bounds in hash space; the final band runs to
    # 2^64 - 1 regardless of float rounding
    cum = np.cumsum([ratios[n] for n in names[:-1]])
    bounds = np.array([int(c * 2**64) for c in cum], dtype=np.uint64)
    return ds.map_batches(
        partial(_hash_split_batch, id_column=id_column, bounds=bounds, names=names),
        batch_format="pyarrow",
    )


def quota_sample_per_group(
    ds,
    group_column: str = "lang",
    quota: int = 100,
    coarse_partitions: int = GROUP_PARTITIONS,
):
    """(doc_id, group) Dataset -> at most `quota` rows per group value
    with their 1-based rank `rn`; selection order is the Knuth hash of
    doc_id (deterministic, partition-invariant).  See module docstring
    for the SQL mirror and the map-side pruning argument."""
    pruned = ds.map_batches(
        partial(_partial_batch, group_column=group_column, quota=quota,
                n_parts=coarse_partitions),
        batch_format="pyarrow",
    )
    return pruned.groupby("pgrp").map_groups(
        partial(_final_partition, group_column=group_column, quota=quota),
        batch_format="pyarrow",
    )


def _weighted_batch(batch: pa.Table, weight_column: str, id_column: str) -> pa.Table:
    h = _sample_hash(batch[id_column].to_numpy().astype(np.int64).view(np.uint64))
    w = batch[weight_column].to_numpy().astype(np.float64)
    # both sides (numpy and DuckDB) round the uint64 hash to float64
    # identically (IEEE nearest), so the mirror stays bit-exact
    keep = h.astype(np.float64) < w * 18446744073709551616.0
    return batch.append_column("keep", pa.array(keep))


def weighted_sample(ds, weight_column: str = "quality", id_column: str = "doc_id"):
    """Deterministic weighted subsampling: keep each row with
    probability equal to its weight in [0, 1], decided by the row's
    Knuth hash (keep iff hash(id) < w * 2^64) — the DSIR-style
    importance-resampling primitive with the target/proposal ratio
    supplied as a column.  Seed-free, partition- and corpus-invariant
    (a doc's fate depends only on its own id and weight), one
    stateless map pass, SQL-mirrorable with the HUGEINT hash compare.
    Adds a boolean `keep` column; filter downstream."""
    return ds.map_batches(
        partial(_weighted_batch, weight_column=weight_column, id_column=id_column),
        batch_format="pyarrow",
    )


# ------------------------------------------------- per-group top-k by value
def _select_top(tbl: pa.Table, group_column: str, value_column: str,
                n: int) -> pa.Table:
    """rows -> each group's n best rows by (value desc, doc_id asc),
    vectorized across all groups at once (one lexsort + run-rank),
    with 1-based rank `rn`."""
    d = tbl["doc_id"].to_numpy().astype(np.int64)
    v = tbl[value_column].to_numpy().astype(np.int64)
    g = tbl[group_column]
    if isinstance(g, pa.ChunkedArray):
        g = g.combine_chunks()
    gid = np.asarray(g.dictionary_encode().indices, dtype=np.int64)
    order = np.lexsort((d, -v, gid))
    gid_s = gid[order]
    starts = np.empty(len(gid_s), dtype=bool)
    if len(gid_s):
        starts[0] = True
        starts[1:] = gid_s[1:] != gid_s[:-1]
    sidx = np.flatnonzero(starts)
    runlen = np.diff(np.append(sidx, len(gid_s)))
    rank = np.arange(len(gid_s), dtype=np.int64) - np.repeat(sidx, runlen)
    keep = order[rank < n]
    out = tbl.take(pa.array(keep, type=pa.int64()))
    return out.append_column("rn", pa.array(rank[rank < n] + 1, type=pa.int64()))


def _top_partial(batch: pa.Table, group_column: str, value_column: str,
                 n: int, n_parts: int) -> pa.Table:
    pruned = _select_top(
        pa.table({group_column: batch[group_column],
                  "doc_id": batch["doc_id"].cast(pa.int64()),
                  value_column: batch[value_column].cast(pa.int64())}),
        group_column, value_column, n,
    ).drop_columns(["rn"])
    pgrp = coarse_partition_ids(_group_hash64(pruned[group_column]), n_parts)
    return pruned.append_column("pgrp", pa.array(pgrp, type=pa.int32()))


def _top_final(group: pa.Table, group_column: str, value_column: str,
               n: int) -> pa.Table:
    if len(group) == 0:
        return pa.schema(
            [(group_column, pa.string()), ("doc_id", pa.int64()),
             (value_column, pa.int64()), ("rn", pa.int64())]
        ).empty_table()
    return _select_top(group.drop_columns(["pgrp"]), group_column,
                       value_column, n)


def top_per_group(ds, group_column: str, value_column: str, n: int,
                  coarse_partitions: int = GROUP_PARTITIONS):
    """At most `n` rows per group, the BEST by (value desc, doc_id
    asc), with 1-based rank `rn` — per-source/per-language caps keyed
    on merit (quality score, length, click count) rather than
    quota_sample_per_group's random hash order.

    Same two-level shape as the quota sampler: each block first keeps
    its own per-group top-n (map-side prune — the shuffle carries at
    most n rows per (block, group), never the corpus), then each
    coarse group-hash partition runs one vectorized lexsort-and-rank
    over all its groups.  `value_column` must be integer-valued (cast
    to int64) so ranking is exact; route floats through integer
    micro-units first (see pipelines.training.quality_gate)."""
    pruned = ds.map_batches(
        partial(_top_partial, group_column=group_column,
                value_column=value_column, n=n, n_parts=coarse_partitions),
        batch_format="pyarrow",
    )
    return pruned.groupby("pgrp").map_groups(
        partial(_top_final, group_column=group_column,
                value_column=value_column, n=n),
        batch_format="pyarrow",
    )

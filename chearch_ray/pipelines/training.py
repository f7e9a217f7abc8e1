"""End-to-end training-data preparation: the composed flagship
pipeline a pretraining-data user actually runs, built from this
repo's operators —

    quality filter  (stages.textstats.RepetitionStats, keep verdict)
      -> exact dedup (stages.dedup.exact_dedup, min-doc_id per sha256)
      -> domain mixing (stages.sample.quota_sample_per_group,
         at most `quota` docs per group in Knuth-hash order)
      -> sequence packing (stages.pack.pack_sequences,
         concat-and-split into `max_tokens` training bins)

Every stage is deterministic and partition-invariant, so the whole
composition is a pure function of (corpus, quota, max_tokens) and has
an exact SQL mirror (driver row `training_pipeline`).

Scale shape: the filter is stateless per batch; dedup is one
content-sha shuffle; sampling is map-side pruned before its group
shuffle and RETURNS a quota-bounded id set (groups x quota rows) —
small by construction, so the final corpus re-read filters by a
broadcast sorted id array (at web scale with millions of groups,
swap the broadcast for a doc_id hash join; the stages themselves are
unchanged).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from chearch_ray.stages.dedup import exact_dedup
from chearch_ray.stages.pack import pack_sequences
from chearch_ray.stages.sample import quota_sample_per_group
from chearch_ray.stages.textstats import RepetitionStats


def _repetition_keep(batch: pa.Table, text_column: str) -> pa.Table:
    stats = RepetitionStats(text_column=text_column)(batch)
    return batch.filter(stats["keep"])


def prepare_training_data(
    ds,
    group_column: str = "lang",
    quota: int = 100,
    max_tokens: int = 2048,
    text_column: str = "text",
):
    """(doc_id, group, text) Dataset -> packed (doc_id, n_tokens, bin,
    bin_offset) of the filtered, deduped, quota-sampled corpus."""
    from functools import partial

    import ray

    filtered = ds.map_batches(
        partial(_repetition_keep, text_column=text_column), batch_format="pyarrow"
    )
    kept = exact_dedup(filtered, text_column=text_column)
    sampled = quota_sample_per_group(
        kept.select_columns(["doc_id", group_column]),
        group_column=group_column,
        quota=quota,
    )
    ids = np.sort(
        np.concatenate(
            [t["doc_id"].to_numpy() for t in (ray.get(r) for r in sampled.materialize().to_arrow_refs()) if len(t)]
            or [np.empty(0, dtype=np.int64)]
        ).astype(np.int64)
    )
    ids_ref = ray.put(ids)

    def _filter_ids(batch: pa.Table) -> pa.Table:
        want = ray.get(ids_ref)
        d = batch["doc_id"].to_numpy().astype(np.int64)
        if len(want) == 0:
            return batch.slice(0, 0)
        pos = np.minimum(np.searchsorted(want, d), len(want) - 1)
        return batch.filter(pa.array(want[pos] == d))

    final = ds.map_batches(_filter_ids, batch_format="pyarrow")
    return pack_sequences(final, max_tokens=max_tokens, text_column=text_column)

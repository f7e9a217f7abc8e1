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


# ------------------------------------------- per-group quality gating
def _gate_score_rows(batch: pa.Table, by: str) -> pa.Table:
    """(doc_id, by, text) -> (doc_id, by, q_int): the QualityScore
    composite in integer MICRO-units (round-half-away, mirroring SQL
    round()) so every downstream comparison is integer-exact."""
    import pyarrow as pa

    from chearch_ray.stages.events import _round_half_away
    from chearch_ray.stages.textstats import QualityScore

    scored = QualityScore()(batch)
    q_int = _round_half_away(scored["quality"].to_numpy() * 1_000_000)
    return pa.table({
        "doc_id": batch["doc_id"],
        by: batch[by],
        "q_int": pa.array(q_int, type=pa.int64()),
    })


def quality_gate(ds, by: str = "lang", q: float = 0.5):
    """Keep each group's top documents by quality: score every doc
    (integer micro-units), find the group's EXACT q-quantile with the
    shared histogram-narrowing machinery (no global sort, no per-group
    shuffle), broadcast the tiny (group -> threshold) table, and
    filter in one map pass.  The common 'drop the bottom half per
    language' pre-training gate, distributed end-to-end.

    Returns (doc_id, by, q_int) of docs with q_int >= their group's
    q-quantile (quantile_disc rank convention, ties kept)."""
    from functools import partial as _pp

    import ray

    from chearch_ray.stages.sketch import exact_group_quantiles

    scored = ds.map_batches(_pp(_gate_score_rows, by=by), batch_format="pyarrow")
    med = exact_group_quantiles(scored, "q_int", [q], by=by)
    thr = {med[by][i].as_py(): int(med["q_int"][i].as_py()) for i in range(len(med))}
    thr_ref = ray.put(thr)

    def _keep(batch: pa.Table) -> pa.Table:
        t = ray.get(thr_ref) if not isinstance(thr_ref, dict) else thr_ref
        g = batch[by]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        import numpy as np

        vals = np.asarray(g.to_numpy(zero_copy_only=False))
        uniq, inv = np.unique(vals, return_inverse=True)
        cut_u = np.array([t.get(u, np.iinfo(np.int64).max) for u in uniq],
                         dtype=np.int64)
        keep = batch["q_int"].to_numpy() >= cut_u[inv]
        return batch.filter(pa.array(keep))

    return scored.map_batches(_keep, batch_format="pyarrow")

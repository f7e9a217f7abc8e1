"""Index-build stages: document prep/metadata and posting explosion.

Reference mapping (SURVEY.md §2.2 M1): the per-document posting
explosion of MemorySegment.addDocument (memorysegment.chpl:267-292)
becomes a stateless vectorized map_batches over Arrow batches — no
shared mutable state; posting lists are assembled later by the
partition groupby (§2.5 A3).

Both stages are callable CLASSES so the term-shard cache and config
live once per actor/worker (`concurrency=` pool), not once per batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from chearch_ray.config import EngineConfig
from chearch_ray.functions.hashing import TermSharder, doc_id_from_keys, sha256_hex
from chearch_ray.functions.tokenizer import explode, token_counts, tokenize


def _doc_ids_of(batch: pa.Table) -> np.ndarray:
    """uint64 doc ids: reuse an existing doc_id column (driver testdata
    `documents` table) or derive stably from (repo, path, commit)."""
    if "doc_id" in batch.column_names:
        return batch["doc_id"].to_numpy().astype(np.uint64)
    return doc_id_from_keys(
        batch["repo"].to_pylist(), batch["path"].to_pylist(), batch["commit"].to_pylist()
    )


class TokenizePostings:
    """content -> exploded posting rows
    (part:int32, salt:int32, term:string, doc_id:uint64, tf:uint32,
    positions:list<uint32>).

    Aggregates (doc, term) pairs *within the batch* via Arrow hash
    aggregation, so the shuffle moves one row per (doc, term), not one
    per token occurrence.  `done_parts` (resume) drops rows destined
    for partitions whose lineage already verifies — resume-mid-shuffle.
    """

    def __init__(self, cfg: EngineConfig, done_parts: frozenset[int] = frozenset()):
        self.cfg = cfg
        self.sharder = TermSharder(cfg.num_term_shards)
        self.done_parts = done_parts

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        doc_ids = _doc_ids_of(batch)
        lists = tokenize(
            batch["content"], lowercase=cfg.lowercase, split_subtokens=cfg.split_subtokens
        )
        values, row_idx, positions = explode(lists)
        exploded = pa.table(
            {
                "term": values,
                "doc_id": pa.array(doc_ids[row_idx], type=pa.uint64()),
                "pos": pa.array(positions.astype(np.uint32), type=pa.uint32()),
            }
        )
        grouped = exploded.group_by(["doc_id", "term"], use_threads=False).aggregate(
            [("pos", "list"), ("pos", "count")]
        )
        g_doc = grouped["doc_id"].to_numpy().astype(np.uint64)
        g_term = grouped["term"]
        if isinstance(g_term, pa.ChunkedArray):
            g_term = g_term.combine_chunks()
        tf = grouped["pos_count"].to_numpy().astype(np.uint32)
        pos_lists = grouped["pos_list"]
        if isinstance(pos_lists, pa.ChunkedArray):
            pos_lists = pos_lists.combine_chunks()

        seg = (g_doc % np.uint64(cfg.num_segments)).astype(np.int64)
        shard = self.sharder.shards(g_term).astype(np.int64)
        part = (seg * cfg.num_term_shards + shard).astype(np.int32)
        salt = (
            (g_doc % np.uint64(cfg.build_salt)).astype(np.int32)
            if cfg.build_salt > 1
            else np.zeros(len(g_doc), dtype=np.int32)
        )
        out = pa.table(
            {
                "part": pa.array(part, type=pa.int32()),
                "salt": pa.array(salt, type=pa.int32()),
                "term": g_term,
                "doc_id": pa.array(g_doc, type=pa.uint64()),
                "tf": pa.array(tf, type=pa.uint32()),
                "positions": pos_lists.cast(pa.list_(pa.uint32())),
            }
        )
        if self.done_parts:
            mask = np.isin(part, np.fromiter(self.done_parts, dtype=np.int32), invert=True)
            out = out.filter(pa.array(mask))
        return out


class DocMeta:
    """content -> docmap rows (seg:int32, doc_id, repo, path, commit,
    lang, doc_len:uint32, content_sha).

    Second (cheap) pass over the corpus: token COUNTS only — no
    explode, no per-(doc,term) aggregation — plus the sha256 input
    invariant.  Keeping doc metadata out of the posting shuffle keeps
    the wide exchange lean (strings ride once per doc, not per term).
    """

    def __init__(self, cfg: EngineConfig, done_segs: frozenset[int] = frozenset()):
        self.cfg = cfg
        self.done_segs = done_segs

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        doc_ids = _doc_ids_of(batch)
        lists = tokenize(
            batch["content"], lowercase=cfg.lowercase, split_subtokens=cfg.split_subtokens
        )
        doc_len = token_counts(lists).astype(np.uint32)
        seg = (doc_ids % np.uint64(cfg.num_segments)).astype(np.int32)

        def col(name: str) -> pa.Array:
            if name in batch.column_names:
                c = batch[name]
                return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
            return pa.array([""] * len(batch), type=pa.string())

        out = pa.table(
            {
                "seg": pa.array(seg, type=pa.int32()),
                "doc_id": pa.array(doc_ids, type=pa.uint64()),
                "repo": col("repo"),
                "path": col("path"),
                "commit": col("commit"),
                "lang": col("lang"),
                "doc_len": pa.array(doc_len, type=pa.uint32()),
                "content_sha": sha256_hex(batch["content"]),
            }
        )
        if self.done_segs:
            mask = np.isin(seg, np.fromiter(self.done_segs, dtype=np.int32), invert=True)
            out = out.filter(pa.array(mask))
        return out

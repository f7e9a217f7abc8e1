"""Index build pipeline (Ray Data end to end).

    read_parquet(corpus)
      ├─ map_batches(TokenizePostings)          # stateless, Arrow, vectorized
      │    └─ groupby(part).map_groups(PostingPartWriter)     # THE shuffle
      │         (salt>1: groupby(part,salt) -> runs -> groupby(part) merge)
      └─ map_batches(DocMeta)                   # cheap 2nd pass: meta + sha + doc_len
           └─ groupby(seg).map_groups(DocmapWriter)

then (tiny, metadata-sized):
      term_stats  = read postings parts (term,count columns) -> groupby sum
      global stats = docmap aggregate (N, total_tokens, avgdl)
      manifest.json committed LAST (atomic publish).

Resume: partitions with verified lineage are dropped from the shuffle
input (filter inside the tokenize stages), so a killed build re-runs
only missing partitions (north rule "resumable from checkpoint").

Scale notes (100 TB): the only all-to-all exchange is the posting
groupby, keyed by the flattened (doc-segment, term-shard) id — pick
num_segments ~ N_docs/2^24 (reference segment cap, documentid.chpl:24)
and num_term_shards to bound each partition file.  Doc metadata never
enters the wide shuffle.  The corpus is read twice with column pruning
(postings pass needs content only; docmap pass needs meta + content);
trading a second pruned read for a ~2x smaller shuffle payload.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from chearch_ray.config import DEFAULT_CONFIG, EngineConfig
from functools import partial

from chearch_ray.stages.postings import (
    build_partial_runs,
    merge_runs_write,
    write_docmap_part,
    write_posting_part,
)
from chearch_ray.stages.tokenize import DocMeta, TokenizePostings
from chearch_ray.state import segment as seg_io
from chearch_ray.state.segment import LineageRecord, Manifest


def build_index(
    corpus: "ray.data.Dataset",
    index_dir: str,
    cfg: EngineConfig = DEFAULT_CONFIG,
    resume: bool = True,
) -> Manifest:
    """Build (or resume building) an index from a corpus Dataset with
    columns (repo, path, commit, lang, content) — or any subset
    including at least `content`, plus optionally a precomputed uint64
    `doc_id` column (driver testdata `documents` shape)."""
    if resume and seg_io.manifest_exists(index_dir):
        return Manifest.load(index_dir)
    os.makedirs(index_dir, exist_ok=True)

    done_postings = frozenset(seg_io.completed_parts(index_dir, "postings")) if resume else frozenset()
    done_docmap = frozenset(seg_io.completed_parts(index_dir, "docmap")) if resume else frozenset()

    # ---- postings branch (the wide shuffle) --------------------------
    tok = corpus.map_batches(
        TokenizePostings(cfg, done_postings),
        batch_format="pyarrow",
        batch_size=cfg.tokenize_batch_size,
    )
    n_parts = cfg.num_segments * cfg.num_term_shards
    if cfg.build_salt > 1:
        runs = tok.groupby(["part", "salt"]).map_groups(
            partial(build_partial_runs, cfg=cfg), batch_format="pyarrow"
        )
        summaries = runs.groupby("part").map_groups(
            partial(merge_runs_write, cfg=cfg, index_dir=index_dir), batch_format="pyarrow"
        )
    else:
        summaries = tok.groupby("part").map_groups(
            partial(write_posting_part, cfg=cfg, index_dir=index_dir), batch_format="pyarrow"
        )
    # one row per partition — tiny; this consumption drives the build
    summaries.take_all()

    # ---- docmap branch ----------------------------------------------
    meta = corpus.map_batches(
        DocMeta(cfg, done_docmap), batch_format="pyarrow", batch_size=cfg.tokenize_batch_size
    )
    meta.groupby("seg").map_groups(
        partial(write_docmap_part, cfg=cfg, index_dir=index_dir), batch_format="pyarrow"
    ).take_all()

    return commit_manifest(index_dir, cfg)


def commit_manifest(index_dir: str, cfg: EngineConfig) -> Manifest:
    """Derive term_stats + global stats from the committed partition
    files (resume-safe: inputs are the files themselves), then publish
    the manifest."""
    postings_parts, docmap_parts = [], []
    for part in sorted(seg_io.completed_parts(index_dir, "postings")):
        rec = LineageRecord.load(index_dir, "postings", part)
        postings_parts.append(
            {
                "part": part,
                "path": rec.path,
                "rows": rec.rows,
                "n_postings": rec.n_postings,
                "sha": rec.content_sha,
            }
        )
    for seg in sorted(seg_io.completed_parts(index_dir, "docmap")):
        rec = LineageRecord.load(index_dir, "docmap", seg)
        docmap_parts.append(
            {
                "part": seg,
                "path": rec.path,
                "rows": rec.rows,
                "n_postings": rec.n_postings,
                "sha": rec.content_sha,
            }
        )

    # term -> global df (sum of per-partition df).  Column-pruned read
    # of the partition files; vocabulary-sized output.
    tables = []
    for p in postings_parts:
        tables.append(
            pq.read_table(os.path.join(index_dir, p["path"]), columns=["term", "count"])
        )
    if tables:
        all_counts = pa.concat_tables(tables)
        term_stats = (
            all_counts.group_by("term", use_threads=False)
            .aggregate([("count", "sum")])
            .rename_columns(["term", "df"])
            .sort_by("term")
        )
    else:
        term_stats = pa.table(
            {"term": pa.array([], type=pa.string()), "df": pa.array([], type=pa.uint64())}
        )
    seg_io.atomic_write_table(term_stats, os.path.join(index_dir, "stats", "term_stats.parquet"))

    num_docs = sum(p["rows"] for p in docmap_parts)
    total_tokens = sum(p["n_postings"] for p in docmap_parts)  # docmap lineage stores sum(doc_len)
    avgdl = (total_tokens / num_docs) if num_docs else 0.0

    from dataclasses import asdict

    cfg_dict = asdict(cfg)
    cfg_dict["input_columns"] = list(cfg.input_columns)
    manifest = Manifest(
        version=seg_io.MANIFEST_VERSION,
        config=cfg_dict,
        num_docs=num_docs,
        total_tokens=total_tokens,
        avgdl=avgdl,
        postings_parts=postings_parts,
        docmap_parts=docmap_parts,
    )
    manifest.save(index_dir)
    return manifest

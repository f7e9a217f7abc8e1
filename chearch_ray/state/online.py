"""Online ingest: the QueuedIndexer analogue + the flush the reference
lists as TODO.

Reference mapping (SURVEY.md §2.1 S2, §2.3 ST3): the per-locale MPMC
ring buffer + consumer task (queuedindexer.chpl:13-117) exists because
Chapel needs explicit producer/consumer decoupling; for BATCH builds
Ray Data's streaming executor is that queue.  What remains genuinely
useful online is an ingest endpoint that accepts documents
incrementally, serves them immediately (from the in-memory conformance
index semantics), and can FLUSH the accumulated batch into immutable
on-disk segments — the "flush/read for in-memory indices" the
reference declares future work (docs/TODO.txt:5).

`OnlineIndexer` is actor-ready: wrap with `ray.remote(OnlineIndexer)`
for a serving deployment (one actor per ingest shard), or use in
process for tests.  Flush runs the normal batch build pipeline over
the buffered rows, so flushed segments are byte-compatible with batch
builds and queryable by QueryEngine.
"""

from __future__ import annotations

import pyarrow as pa

from chearch_ray.config import DEFAULT_CONFIG, EngineConfig


class OnlineIndexer:
    """Buffered online ingest with search-before-flush.

    enqueue() -> buffered + searchable immediately (brute force over
    the buffer — the buffer is bounded by flush_threshold, so this
    stays small like the reference's in-memory segment); flush() ->
    batch-build the buffer into an index directory.
    """

    def __init__(self, cfg: EngineConfig = DEFAULT_CONFIG, flush_threshold: int = 100_000):
        self.cfg = cfg
        self.flush_threshold = flush_threshold
        self._rows: list[dict] = []
        self._completed = False

    def enqueue_index_request(self, row: dict) -> bool:
        """row: corpus-shaped dict (repo, path, commit, lang, content).
        Returns False when the buffer is full (caller should flush —
        the analogue of addDocument returning false on a full segment,
        memorysegment.chpl:267-276)."""
        if self._completed:
            raise RuntimeError("indexer marked complete")
        if len(self._rows) >= self.flush_threshold:
            return False
        self._rows.append(dict(row))
        return True

    def pending(self) -> int:
        return len(self._rows)

    def search_buffered(self, query, k: int = 10):
        """Query the unflushed buffer (brute force via the oracle path
        — exact same scoring semantics as the engine)."""
        from chearch_ray import ast as ast_mod
        from chearch_ray.oracle import OracleIndex
        from chearch_ray.state.engine import parse_query

        if not self._rows:
            return []
        node = parse_query(query) if not isinstance(query, (ast_mod.Term, ast_mod.And, ast_mod.Or)) else query
        oracle = OracleIndex(pa.Table.from_pylist(self._rows), self.cfg)
        return oracle.bm25_search(node, k)

    def flush(self, index_dir: str, docstore: bool = False):
        """Batch-build the buffer into `index_dir` (manifest commit is
        the atomic publish); clears the buffer.  Returns the Manifest.
        `docstore=True` also writes the text sidecar
        (state/docstore.py) so the flushed docs serve snippets (0xFE
        frames / search_with_snippets) immediately."""
        import ray.data

        from chearch_ray.pipelines.build import build_index

        if not self._rows:
            raise ValueError("nothing to flush")
        table = pa.Table.from_pylist(self._rows)
        manifest = build_index(ray.data.from_arrow(table), index_dir, self.cfg, resume=False)
        if docstore:
            from chearch_ray.state.docstore import build_docstore

            build_docstore(ray.data.from_arrow(table), index_dir,
                           wide=(self.cfg.doc_id_bits == 128))
        self._rows = []
        return manifest

    def mark_complete_for_indexer(self) -> None:
        """Poison-pill analogue (queuedindexer.chpl nil request)."""
        self._completed = True

    def wait_for_indexer(self) -> bool:
        """Completion latch analogue (release$ single-var); buffered
        implementation is synchronous, so this just reports state."""
        return self._completed


    def flush_roll(self, main_index_dir: str, scratch_dir: str | None = None,
                   docstore: bool = False):
        """Segment roll: flush the buffer to a fresh batch index, then
        fold it into the main index with merge_indexes (byte-identical
        to having built main+buffer together).  Creates the main index
        on first roll.  Returns the merged Manifest.  `docstore=True`
        rolls the text sidecar along with the segments —
        merge_docstores keeps it byte-identical to a one-shot
        build_docstore over everything ingested so far, so snippet
        serving never lags the index."""
        import os
        import shutil
        import tempfile

        from chearch_ray.pipelines.merge import merge_indexes
        from chearch_ray.state.docstore import has_docstore
        from chearch_ray.state.segment import manifest_exists

        # the sidecar follows the MAIN index's state, not a per-call
        # flag: a roll that forgot docstore=True must not silently
        # destroy the existing sidecar, and docstore=True onto a
        # sidecar-less main has no old text to merge — refuse BEFORE
        # any work runs
        if manifest_exists(main_index_dir):
            if has_docstore(main_index_dir):
                docstore = True
            elif docstore:
                raise ValueError(
                    f"{main_index_dir} has no docstore to roll; rebuild "
                    "it with build_docstore over the full corpus first "
                    "(the buffer alone can't recreate the old docs' text)")
        scratch = scratch_dir or tempfile.mkdtemp(prefix="chearch_roll_")
        batch_dir = os.path.join(scratch, "batch")
        self.flush(batch_dir, docstore=docstore)
        if not manifest_exists(main_index_dir):
            # first roll: the batch IS the main index
            shutil.rmtree(main_index_dir, ignore_errors=True)
            shutil.move(batch_dir, main_index_dir)
            from chearch_ray.state.segment import Manifest

            return Manifest.load(main_index_dir)
        merged_dir = os.path.join(scratch, "merged")
        manifest = merge_indexes([main_index_dir, batch_dir], merged_dir)
        if docstore:
            from chearch_ray.state.docstore import merge_docstores

            merge_docstores([main_index_dir, batch_dir], merged_dir)
        # atomic-ish swap: replace main with merged
        old = main_index_dir.rstrip("/") + ".old"
        shutil.rmtree(old, ignore_errors=True)
        shutil.move(main_index_dir, old)
        shutil.move(merged_dir, main_index_dir)
        shutil.rmtree(old, ignore_errors=True)
        shutil.rmtree(scratch, ignore_errors=True)
        return manifest

    def flush_tiered(self, tier_set, docstore: bool = False) -> None:
        """Flush the buffer as a new index into a `TieredIndexSet`
        (state/tiered.py): the scale ingest path.  flush_roll rewrites
        the WHOLE main index every roll (O(N^2) bytes over N rolls);
        the tiered set merges only same-size-class indexes, so each
        document is rewritten O(log N) times.  Serve by `collapse()`
        (one dir) or by opening each live dir in its own QueryEngine
        and merging top-k client-side.  `docstore=True` attaches the
        text sidecar to each flush; the tier set's compaction and
        collapse carry it through merges (state/tiered.py)."""
        import os
        import tempfile

        batch_dir = os.path.join(tempfile.mkdtemp(prefix="chearch_tier_"), "b")
        self.flush(batch_dir, docstore=docstore)
        tier_set.add(batch_dir)

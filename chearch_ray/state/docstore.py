"""DocStore: fetch document payloads by id from partitioned Parquet.

The index stores postings + docmap metadata, never the text (the
reference returns bare external ids and has no fetch path at all —
util/query_client.py prints ids).  A real serving stack needs
search -> FETCH: given the top-k ids, return the documents.  At 100 TB
the store must be readable by id without scanning:

* build: one stateless map pass adds `dpart` = the TOP BITS of the
  id's Knuth hash (uniform whatever the id distribution), then
  `write_parquet(partition_cols=["dpart"])` — hive layout, rows
  sorted by doc_id inside each batch so parquet row-group statistics
  prune within a partition too;
* fetch: ids hash to their partitions, and the read touches ONLY
  those hive directories (plus row-group pushdown on doc_id) — a
  k-row fetch reads O(k) row groups, not the corpus.

Store and index are independent: the same store serves any index over
the same ids (and survives index rebuilds/compactions).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from chearch_ray.stages.sample import KNUTH_MULT


def _dpart_of(doc_ids: np.ndarray, bits: int) -> np.ndarray:
    h = doc_ids.astype(np.uint64) * KNUTH_MULT  # wraps mod 2^64
    return (h >> np.uint64(64 - bits)).astype(np.int64)


def _add_dpart(batch: pa.Table, id_column: str, bits: int) -> pa.Table:
    ids = batch[id_column].to_numpy().astype(np.int64).view(np.uint64)
    t = batch.append_column("dpart", pa.array(_dpart_of(ids, bits), type=pa.int64()))
    order = pc.sort_indices(t, sort_keys=[(id_column, "ascending")])
    return t.take(order)


def docstore_build(ds, store_dir: str, id_column: str = "doc_id",
                   partition_bits: int = 4) -> None:
    """Write `ds` as a hive store of 2^partition_bits hash partitions.
    Size partition_bits so one partition's row groups stay prunable
    (at 10^12 docs, ~16 bits -> ~15M docs/partition)."""
    ds.map_batches(
        partial(_add_dpart, id_column=id_column, bits=partition_bits),
        batch_format="pyarrow",
    ).write_parquet(store_dir, partition_cols=["dpart"])


def docstore_fetch(store_dir: str, doc_ids, id_column: str = "doc_id",
                   partition_bits: int = 4, columns: list[str] | None = None) -> pa.Table:
    """ids -> their rows (ascending id).  Reads only the partitions the
    ids hash to; the doc_id filter pushes into row-group statistics."""
    import pyarrow.dataset as pads

    ids = np.asarray(list(doc_ids), dtype=np.int64)
    if len(ids) == 0:
        raise ValueError("empty fetch")
    parts = np.unique(_dpart_of(ids.view(np.uint64), partition_bits))
    dataset = pads.dataset(store_dir, format="parquet", partitioning="hive")
    flt = pads.field("dpart").isin([int(p) for p in parts]) & pads.field(
        id_column
    ).isin([int(i) for i in np.unique(ids)])
    cols = None if columns is None else list(columns)
    t = dataset.to_table(filter=flt, columns=cols)
    order = pc.sort_indices(t, sort_keys=[(id_column, "ascending")])
    return t.take(order).drop_columns(
        [c for c in ("dpart",) if c in t.column_names and (columns is None or "dpart" not in columns)]
    )


def docstore_pruned_fragments(store_dir: str, doc_ids,
                              partition_bits: int = 4) -> tuple[int, int]:
    """(fragments the fetch touches, total fragments) — pruning
    telemetry for tests and capacity planning."""
    import pyarrow.dataset as pads

    ids = np.asarray(list(doc_ids), dtype=np.int64)
    parts = np.unique(_dpart_of(ids.view(np.uint64), partition_bits))
    dataset = pads.dataset(store_dir, format="parquet", partitioning="hive")
    total = len(list(dataset.get_fragments()))
    touched = len(
        list(dataset.get_fragments(filter=pads.field("dpart").isin([int(p) for p in parts])))
    )
    return touched, total


# ===================================================================
# Index SIDECAR docstore — the engine/serving-path variant
# ===================================================================
# The standalone store above (docstore_build/docstore_fetch) is the
# index-independent, int64-id hive store the `docstore_fetch` driver
# row exercises.  The sidecar below lives INSIDE an index directory
# (`<index_dir>/docstore`), speaks the engine's uint64 (and wide
# 128-bit) external-id space, is written with the RESUMABLE atomic
# sink (sources/sink.py — per-partition rename, re-runs skip finished
# partitions, deterministic bytes), and returns fetched rows in the
# REQUESTED order — the contract `QueryEngine.search_with_snippets`
# and the 0xFE snippet wire frame (serve.py) build on.  A k-doc fetch
# reads O(k) row groups: ids route to hash partitions
# (stages/partition.coarse_partition_ids, the build's own hash) and
# doc-sorted `row_group_docs`-row groups prune by statistics.

import glob
import os

import pyarrow.parquet as pq

DOCSTORE_DIRNAME = "docstore"
#: docs per parquet row group — the pruning granule: a k-doc fetch
#: DECODES <= k groups of this many doc-sorted rows, so the group is
#: sized like a stored-fields block (tens of KB), not like a scan
#: granule (a 1024-doc group of KB-scale docs is megabytes, and a
#: 10-doc fetch was decoding ~100 MB).  Footer metadata grows with
#: group count but is parsed ONCE per partition (DocstoreReader
#: caches handles + fences).
DEFAULT_ROW_GROUP_DOCS = 32
#: byte bound on the same granule: per-partition the sink derives
#: rows-per-group from the ACTUAL row width and takes the min with
#: DEFAULT_ROW_GROUP_DOCS, so KB-scale code files get ~8-row groups
#: while tweet-scale rows keep 32
DEFAULT_ROW_GROUP_BYTES = 64 * 1024
DEFAULT_PARTITIONS = 64


def docstore_dir(index_dir: str) -> str:
    return os.path.join(index_dir, DOCSTORE_DIRNAME)


def has_docstore(index_dir: str) -> bool:
    """True only for a COMMITTED docstore: `_meta.json` is written
    after the last partition (commit-last, like the index manifest),
    so a build killed mid-write reads as absent — re-running
    build_docstore resumes the missing partitions and then commits."""
    return (
        os.path.exists(os.path.join(docstore_dir(index_dir), "_meta.json"))
        and bool(_committed_partition_files(docstore_dir(index_dir)))
    )


def _committed_partition_files(store_dir: str) -> dict[int, str]:
    """pid -> data.parquet path for COMMITTED partitions only.  A
    writer killed between pq.write_table and os.replace leaves a
    `part-NNNNN.tmp-<pid>/data.parquet` staging dir behind (the crash
    the atomic protocol exists for); parsing names through
    sink.partition_id skips those instead of crashing the reader /
    merge / GC that must resume past them."""
    from chearch_ray.sources.sink import partition_id

    out: dict[int, str] = {}
    for p in sorted(glob.glob(os.path.join(store_dir, "part-*",
                                           "data.parquet"))):
        pid = partition_id(os.path.dirname(p))
        if pid is not None:
            out[pid] = p
    return out


def build_docstore(corpus_ds, index_dir: str, text_column: str = "content",
                   n_partitions: int = DEFAULT_PARTITIONS,
                   row_group_docs: int = DEFAULT_ROW_GROUP_DOCS,
                   row_group_bytes: int = DEFAULT_ROW_GROUP_BYTES,
                   wide: bool = False) -> dict:
    """Write `<index_dir>/docstore` from the SAME corpus dataset the
    index was built over.  Keeps (doc_id[, doc_id_hi], text); ids are
    derived exactly like the build's.  Resumable: finished partitions
    are skipped on re-run (sources/sink semantics)."""
    from chearch_ray.sources.sink import write_resumable_parquet
    from chearch_ray.stages.tokenize import _doc_ids_of, _doc_ids_wide_of

    def project(batch: pa.Table) -> pa.Table:
        text = batch[text_column]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        if wide:
            hi, lo = _doc_ids_wide_of(batch)
            return pa.table({
                "doc_id": pa.array(lo, type=pa.uint64()),
                "doc_id_hi": pa.array(hi, type=pa.uint64()),
                "text": text.cast(pa.string()),
            })
        return pa.table({
            "doc_id": pa.array(_doc_ids_of(batch), type=pa.uint64()),
            "text": text.cast(pa.string()),
        })

    projected = corpus_ds.map_batches(project, batch_format="pyarrow")
    out = write_resumable_parquet(
        projected, docstore_dir(index_dir), key="doc_id",
        n_partitions=n_partitions, order_by=["doc_id"],
        row_group_size=row_group_docs, row_group_bytes=row_group_bytes,
    )
    # the hash modulus must survive for fetch-time routing (the sink
    # writes only NON-EMPTY partitions, so it can't be recovered from
    # the directory listing); written LAST — it is the commit record
    _write_docstore_meta(index_dir, n_partitions, wide)
    return out


def _write_docstore_meta(index_dir: str, n_partitions: int,
                         wide: bool) -> None:
    import json

    meta_path = os.path.join(docstore_dir(index_dir), "_meta.json")
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"n_partitions": n_partitions, "wide": wide}, f)
    os.replace(tmp, meta_path)


def _read_docstore_meta(index_dir: str) -> dict | None:
    import json

    meta_path = os.path.join(docstore_dir(index_dir), "_meta.json")
    if not os.path.exists(meta_path):
        return None
    with open(meta_path) as f:
        return json.load(f)


def merge_docstores(src_index_dirs: list[str], dst_index_dir: str,
                    row_group_docs: int = DEFAULT_ROW_GROUP_DOCS,
                    row_group_bytes: int = DEFAULT_ROW_GROUP_BYTES) -> dict:
    """Union several indexes' docstore sidecars into
    `<dst_index_dir>/docstore` — the sidecar analogue of
    `pipelines/merge.merge_indexes`, used by `OnlineIndexer.flush_roll`
    so streaming-ingested docs stay snippet-servable after a segment
    roll.  BYTE-IDENTICAL to `build_docstore` over the concatenated
    corpora: all sources must share one hash modulus, each destination
    partition is the doc_id-sorted concat of the sources' same-pid
    partitions, and row groups re-derive from the merged width via the
    sink's own sizing.  One Ray task per destination partition
    (`ray.data.from_items(pids).map_batches`); resumable — existing
    destination partitions are kept, like the sink."""
    from chearch_ray.sources.sink import (finished_partitions,
                                          point_row_group_size,
                                          write_partition_atomic)

    metas = []
    for src in src_index_dirs:
        m = _read_docstore_meta(src)
        if m is None:
            raise FileNotFoundError(f"no docstore meta under {src}")
        metas.append(m)
    n_partitions = metas[0]["n_partitions"]
    wide = bool(metas[0].get("wide", False))
    if any(m["n_partitions"] != n_partitions for m in metas) or \
            any(bool(m.get("wide", False)) != wide for m in metas):
        raise ValueError(
            f"docstore merge needs one hash modulus / id width across "
            f"sources, got {metas}")

    out_dir = docstore_dir(dst_index_dir)
    os.makedirs(out_dir, exist_ok=True)
    done = finished_partitions(out_dir)
    src_stores = [docstore_dir(s) for s in src_index_dirs]
    todo = sorted({
        pid for s in src_stores for pid in _committed_partition_files(s)
    } - done)

    def merge_one(pid: int) -> None:
        srcs = [os.path.join(s, f"part-{pid:05d}", "data.parquet")
                for s in src_stores]
        tabs = [pq.read_table(p) for p in srcs if os.path.exists(p)]
        rows = pa.concat_tables(tabs).combine_chunks()
        rows = rows.take(pc.sort_indices(rows["doc_id"]))
        write_partition_atomic(
            rows, out_dir, pid,
            point_row_group_size(rows, row_group_docs, row_group_bytes))

    written = _run_partition_tasks(todo, merge_one)
    _write_docstore_meta(dst_index_dir, n_partitions, wide)
    return {"written": written, "skipped": sorted(done)}


def _run_partition_tasks(todo: list[int], task) -> list[int]:
    """One Ray task per partition id (the sidecar merge/GC driver):
    `task(pid)` runs on whatever worker gets the item; returns the
    pids processed."""
    import ray.data

    if not todo:
        return []

    def run(batch: pa.Table) -> pa.Table:
        outs = []
        for pid in batch["pid"].to_pylist():
            task(int(pid))
            outs.append(pid)
        return pa.table({"pid": pa.array(outs, type=pa.int64())})

    res = ray.data.from_items([{"pid": p} for p in todo]).map_batches(
        run, batch_format="pyarrow", batch_size=1)
    return sorted(
        int(p)
        for t in res.iter_batches(batch_size=None, batch_format="pyarrow")
        for p in t["pid"].to_pylist())


def gc_docstore(src_index_dir: str, dst_index_dir: str,
                drop_lo=None, drop_hi=None,
                row_group_docs: int = DEFAULT_ROW_GROUP_DOCS,
                row_group_bytes: int = DEFAULT_ROW_GROUP_BYTES) -> dict:
    """Rewrite `<src>/docstore` into `<dst>/docstore` WITHOUT the
    dropped external ids — the sidecar analogue of
    `pipelines/lifecycle.compact_index`: after a delete+compact the
    tombstoned docs' text must leave disk too, and after an upsert the
    replaced versions must.  Byte-identical to `build_docstore` over
    the surviving corpus (same routing, order, and row-group sizing —
    filtering a doc-sorted partition preserves both).  One Ray task
    per partition; the drop set ships once via `ray.put` and each
    task narrows it to its own hash bucket.  An empty drop set is a
    valid copy-shaped rewrite.  Resumable like the sink."""
    import ray

    from chearch_ray.sources.sink import (finished_partitions,
                                          point_row_group_size,
                                          write_partition_atomic)
    from chearch_ray.stages.partition import coarse_partition_ids

    meta = _read_docstore_meta(src_index_dir)
    if meta is None:
        raise FileNotFoundError(f"no docstore meta under {src_index_dir}")
    n_partitions = int(meta["n_partitions"])
    wide = bool(meta.get("wide", False))
    lo = (np.asarray(list(drop_lo), dtype=np.uint64)
          if drop_lo is not None else np.empty(0, np.uint64))
    hi = None
    if wide:
        hi = (np.asarray(list(drop_hi), dtype=np.uint64)
              if drop_hi is not None else np.empty(0, np.uint64))
        if len(hi) != len(lo):
            raise ValueError("drop_lo and drop_hi length mismatch")
    elif drop_hi is not None:
        raise ValueError("drop_hi given for a 64-bit docstore")
    drop_pids = coarse_partition_ids(lo, n_partitions) if len(lo) else \
        np.empty(0, np.int64)
    drop_ref = ray.put((lo, hi, drop_pids))

    src_store = docstore_dir(src_index_dir)
    out_dir = docstore_dir(dst_index_dir)
    os.makedirs(out_dir, exist_ok=True)
    done = finished_partitions(out_dir)
    todo = sorted(set(_committed_partition_files(src_store)) - done)

    def gc_one(pid: int) -> None:
        d_lo, d_hi, d_pids = ray.get(drop_ref)
        rows = pq.read_table(
            os.path.join(src_store, f"part-{pid:05d}", "data.parquet"))
        mine = d_pids == pid
        if mine.any():
            got = rows["doc_id"].to_numpy().astype(np.uint64)
            if d_hi is not None:
                from chearch_ray.functions.hashing import key16

                dead = np.isin(
                    key16(rows["doc_id_hi"].to_numpy().astype(np.uint64),
                          got),
                    key16(d_hi[mine], d_lo[mine]))
            else:
                dead = np.isin(got, d_lo[mine])
            rows = rows.filter(pa.array(~dead))
        if len(rows) == 0:  # sink writes only non-empty partitions
            return
        write_partition_atomic(
            rows, out_dir, pid,
            point_row_group_size(rows, row_group_docs, row_group_bytes))

    written = _run_partition_tasks(todo, gc_one)
    _write_docstore_meta(dst_index_dir, n_partitions, wide)
    return {"written": written, "skipped": sorted(done)}


def fsck_docstore(index_dir: str) -> dict:
    """Validate the docstore sidecar's on-disk invariants — the ones
    DocstoreReader's point-fetch correctness rests on:

    * `_meta.json` commit record parses and its modulus is sane;
    * every committed partition's parquet footer loads and carries the
      required columns (doc_id, text[, doc_id_hi when wide]);
    * doc_id is nondecreasing inside each partition (the sorted-rows
      precondition behind row-group fence pruning; duplicates are
      legal — wide builds can collide on the lo-64 id);
    * every id routes to the partition that holds it under the meta's
      modulus (the fetch-time hash contract).

    Returns {"partitions": checked, "rows": total, "bad": [msg...],
    "notes": [msg...]}; an uncommitted build (partitions but no meta)
    is a note, not corruption — `build_docstore` resumes it.
    """
    store = docstore_dir(index_dir)
    parts = _committed_partition_files(store)
    bad: list[str] = []
    notes: list[str] = []
    # "uncommitted" means the commit record FILE is absent; a file
    # that exists but holds garbage (truncated, `null`, a list, …) is
    # corruption — the distinction fsck exists to draw.
    if not os.path.exists(os.path.join(store, "_meta.json")):
        if parts:
            notes.append(
                f"docstore: {len(parts)} partition(s) without _meta.json "
                "(uncommitted build — resume with build --docstore)")
        return {"partitions": 0, "rows": 0, "bad": bad, "notes": notes}
    try:
        meta = _read_docstore_meta(index_dir)
    except Exception as exc:  # truncated/garbled json IS the corruption
        bad.append(f"docstore _meta.json: unreadable ({exc})")
        return {"partitions": 0, "rows": 0, "bad": bad, "notes": notes}
    if not isinstance(meta, dict):
        bad.append("docstore _meta.json: expected a JSON object, got "
                   f"{type(meta).__name__}")
        return {"partitions": 0, "rows": 0, "bad": bad, "notes": notes}
    from chearch_ray.stages.partition import coarse_partition_ids

    try:
        n_partitions = int(meta["n_partitions"])
    except (KeyError, TypeError, ValueError):
        bad.append("docstore _meta.json: missing/non-numeric n_partitions "
                   f"(got {meta.get('n_partitions')!r})")
        return {"partitions": 0, "rows": 0, "bad": bad, "notes": notes}
    wide = bool(meta.get("wide", False))
    if n_partitions < 1:
        bad.append(f"docstore _meta.json: n_partitions {n_partitions} < 1")
        return {"partitions": 0, "rows": 0, "bad": bad, "notes": notes}
    required = {"doc_id", "text"} | ({"doc_id_hi"} if wide else set())
    checked = rows_total = 0
    for pid, path in sorted(parts.items()):
        rel = os.path.relpath(path, index_dir)
        if pid >= n_partitions:
            bad.append(f"docstore {rel}: pid {pid} >= modulus {n_partitions}")
            continue
        try:
            pf = pq.ParquetFile(path)
            names = set(pf.schema_arrow.names)
            missing = required - names
            if missing:
                bad.append(f"docstore {rel}: missing columns "
                           f"{sorted(missing)}")
                continue
            ids = pq.read_table(path, columns=["doc_id"])["doc_id"] \
                .to_numpy().astype(np.uint64)
        except Exception as exc:
            bad.append(f"docstore {rel}: unreadable ({exc})")
            continue
        if len(ids) == 0:
            bad.append(f"docstore {rel}: empty partition "
                       "(sink writes only non-empty ones)")
            continue
        if (ids[1:] < ids[:-1]).any():  # uint64: compare, never diff
            bad.append(f"docstore {rel}: doc_id not sorted ascending")
        misrouted = coarse_partition_ids(ids, n_partitions) != pid
        if misrouted.any():
            bad.append(
                f"docstore {rel}: {int(misrouted.sum())} id(s) route to "
                f"other partitions under modulus {n_partitions} "
                "(wrong n_partitions in _meta.json, or foreign data)")
        checked += 1
        rows_total += len(ids)
    return {"partitions": checked, "rows": rows_total, "bad": bad,
            "notes": notes}


class DocstoreReader:
    """Point-fetch over the docstore partitions.

    Holds no row data — only the partition list plus, lazily, one open
    `ParquetFile` handle and the row-group doc_id [min, max] fences per
    touched partition (a few hundred bytes each; the docstore is
    immutable once built, like the manifest snapshot an engine holds).
    A fetch routes ids to partitions by the build's hash, binary-
    searches the fences (rows are doc-sorted) and decodes ONLY the
    candidate row groups — O(k) groups per k-doc fetch, no metadata
    re-parse per call.  Thread-safe: serving pools call fetch
    concurrently and Arrow file readers aren't re-entrant, so reads of
    the SAME partition serialize under that partition's lock while
    different partitions read in parallel (pyarrow releases the GIL
    during the decode); the global lock only guards cache mutation.

    Decoded-group LRU: document popularity is Zipfian in real serving,
    and the wire layer's LRU only catches EXACT query repeats — a hot
    doc referenced by many distinct queries re-decoded its row group
    every time.  `group_cache_size` bounds a (pid, group) → table LRU
    (groups are byte-bounded at ~64 KB, so the default 256 entries is
    ~16 MB); the docstore is immutable, so cached tables never go
    stale within a reader's lifetime."""

    #: decoded row groups kept hot; ~64 KB each at the default sink
    #: sizing (state/docstore.DEFAULT_ROW_GROUP_BYTES)
    GROUP_CACHE_SIZE = 256

    def __init__(self, index_dir: str, group_cache_size: int | None = None):
        import threading
        from collections import OrderedDict

        self._group_cache: "OrderedDict[tuple[int, int], pa.Table]" = \
            OrderedDict()
        self._group_cache_size = (self.GROUP_CACHE_SIZE
                                  if group_cache_size is None
                                  else group_cache_size)
        base = docstore_dir(index_dir)
        self.paths: dict[int, str] = _committed_partition_files(base)
        if not self.paths:
            raise FileNotFoundError(
                f"no docstore under {base} — build one with "
                "build_docstore(corpus_ds, index_dir) or CLI "
                "`build --docstore`")
        #: pid -> (ParquetFile, group_mins, group_maxs,
        #:         stat-less group indices, per-file lock)
        self._files: dict[int, tuple] = {}
        self._lock = threading.Lock()
        # the hash modulus used at write time (the sink writes only
        # NON-EMPTY partitions, so the directory listing alone can't
        # recover it).  A meta-less store is an UNCOMMITTED build —
        # guessing a modulus would silently route most fetches to the
        # wrong partition and degrade every snippet to a miss
        meta = _read_docstore_meta(index_dir)
        if meta is None:
            raise FileNotFoundError(
                f"docstore under {base} has partitions but no "
                "_meta.json (build was interrupted before commit) — "
                "re-run build_docstore; resume skips finished "
                "partitions")
        self.n_partitions = int(meta["n_partitions"])

    def _file(self, pid: int):
        """(ParquetFile, row-group doc_id mins, maxs, stat-less group
        indices, lock) for a partition; opened once, fences from
        footer statistics (the sink writes plain uint64 stats).  Takes self._lock itself —
        double-checked so warm calls skip straight to the cached
        entry (dict reads are atomic under the GIL)."""
        ent = self._files.get(pid)
        if ent is not None:
            return ent
        import threading

        with self._lock:
            ent = self._files.get(pid)
            if ent is not None:
                return ent
            f = pq.ParquetFile(self.paths[pid], memory_map=True)
            md = f.metadata
            col = md.schema.to_arrow_schema().get_field_index("doc_id")
            mins = np.empty(md.num_row_groups, dtype=np.uint64)
            maxs = np.empty(md.num_row_groups, dtype=np.uint64)
            nostat = []
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(col).statistics
                if st is None or not st.has_min_max:
                    nostat.append(g)
                else:
                    mins[g], maxs[g] = np.uint64(st.min), np.uint64(st.max)
            # stats missing (shouldn't happen for our own sink): the
            # group must ALWAYS be a candidate — but a wide-open
            # [0, max] fence would break the sorted-fences
            # precondition the searchsorted pruning relies on, sending
            # OTHER ids to the wrong group.  Give it a degenerate
            # fence that keeps both arrays monotone (its predecessor's
            # max; content ordering guarantees its real range sits in
            # that gap) and force-include it in every fetch instead.
            for g in nostat:  # ascending, so repaired maxs chain
                mins[g] = maxs[g] = maxs[g - 1] if g > 0 else np.uint64(0)
            ent = (f, mins, maxs,
                   np.asarray(nostat, dtype=np.int64), threading.Lock())
            self._files[pid] = ent
            return ent

    def _empty(self, wide: bool) -> pa.Table:
        cols = {"doc_id": pa.array([], type=pa.uint64())}
        if wide:
            cols["doc_id_hi"] = pa.array([], type=pa.uint64())
        cols["text"] = pa.array([], type=pa.string())
        return pa.table(cols)

    def fetch(self, doc_ids: np.ndarray,
              doc_his: np.ndarray | None = None) -> pa.Table:
        """rows for the given ids, in THEIR order (missing ids drop).
        Wide mode passes the hi words too and matches exact (hi, lo)
        pairs — lo-64 collisions inside one partition resolve through
        the same 'S16' byte keys the docmap uses."""
        from chearch_ray.stages.partition import coarse_partition_ids

        ids = np.asarray(doc_ids).astype(np.uint64)
        wide = doc_his is not None
        if len(ids) == 0:
            return self._empty(wide)
        pids = coarse_partition_ids(ids, self.n_partitions)
        touched = [int(p) for p in np.unique(pids).tolist()
                   if int(p) in self.paths]
        # serial per-partition reads on purpose: with the files
        # memory-mapped and ~64 KB row groups, a warm point decode is
        # tens of microseconds — measured 5x FASTER than fanning the
        # partitions across a thread pool (executor dispatch costs
        # more than the decode; same reason the per-read
        # use_threads=False below)
        parts = [t for t in (self._fetch_partition(
            p, np.unique(ids[pids == p])) for p in touched)
            if t is not None]
        if not parts:
            return self._empty(wide)
        got = pa.concat_tables(parts).combine_chunks()
        got_ids = got["doc_id"].to_numpy().astype(np.uint64)
        if wide and "doc_id_hi" in got.column_names:
            from chearch_ray.functions.hashing import key16

            got_keys = key16(got["doc_id_hi"].to_numpy().astype(np.uint64),
                             got_ids)
            want_keys = key16(np.asarray(doc_his).astype(np.uint64), ids)
            order = np.argsort(got_keys, kind="stable")
            pos = np.searchsorted(got_keys[order], want_keys)
            pos_c = np.minimum(pos, len(order) - 1)
            hit = got_keys[order][pos_c] == want_keys
        else:
            order = np.argsort(got_ids, kind="stable")
            pos = np.searchsorted(got_ids[order], ids)
            pos_c = np.minimum(pos, len(order) - 1)
            hit = got_ids[order][pos_c] == ids
        take = pa.array(order[pos_c[hit]], type=pa.int64())
        return got.take(take)

    def _fetch_partition(self, pid: int, want: np.ndarray) -> pa.Table | None:
        """rows of ONE partition matching the sorted unique `want` ids
        (None when the fences prune everything) — the per-partition
        body of fetch, safe to run concurrently across partitions."""
        f, mins, maxs, nostat, flock = self._file(int(pid))
        # row-group pruning against the cached fences: rows
        # are doc-sorted, so the groups form disjoint ordered
        # [min, max] ranges — the only candidate for an id is
        # the first group whose max >= id (searchsorted on the
        # uint64 fences; no int64 coercion anywhere, hash ids
        # past 2^63 stay exact)
        # every group whose [min, max] covers the id: groups are
        # ordered and disjoint EXCEPT that a run of duplicate lo
        # ids (wide-id lo-collisions, duplicate external ids) can
        # straddle a boundary — so take the contiguous range
        # [first max >= id, last min <= id], not just its head
        lo_g = np.searchsorted(maxs, want, side="left")
        hi_g = np.searchsorted(mins, want, side="right") - 1
        spans = [np.arange(a, b + 1)
                 for a, b in zip(lo_g.tolist(), hi_g.tolist()) if b >= a]
        if len(nostat):  # stat-less groups can hold anything
            spans.append(nostat)
        if not spans:
            return None
        hit_groups = np.unique(np.concatenate(spans))
        group_tbls = []
        for g in hit_groups.tolist():
            key = (int(pid), int(g))
            with self._lock:
                hot = self._group_cache.get(key)
                if hot is not None:
                    self._group_cache.move_to_end(key)
            if hot is None:
                with flock:
                    # tiny point reads: arrow's per-call thread
                    # fan-out costs more than the decode itself
                    hot = f.read_row_groups([g], use_threads=False)
                if self._group_cache_size > 0:
                    with self._lock:
                        self._group_cache[key] = hot
                        self._group_cache.move_to_end(key)
                        while len(self._group_cache) > \
                                self._group_cache_size:
                            self._group_cache.popitem(last=False)
            group_tbls.append(hot)
        tbl = (group_tbls[0] if len(group_tbls) == 1
               else pa.concat_tables(group_tbls))
        keep = pc.is_in(tbl["doc_id"],
                        value_set=pa.array(want, type=pa.uint64()))
        tbl = tbl.filter(keep)
        return tbl if len(tbl) else None

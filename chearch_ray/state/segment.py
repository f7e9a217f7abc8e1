"""Segment persistence: postings/docmap Parquet files, per-partition
lineage records, manifest commit.

The reference has NO persistence (flush/read is TODO,
docs/TODO.txt:5; README.md:18-22) — this module builds the layer it
declares as future work, and doubles as the checkpoint/resume substrate
the north rule requires.

Layout under an index directory (all writes atomic: tmp + rename):

    segments/part-{part:05d}.parquet   postings for one
                                       (doc-segment, term-shard) pair;
                                       one row per term
    docmap/seg-{seg:05d}.parquet       doc metadata for one doc-segment,
                                       sorted by doc_id
    stats/term_stats.parquet           term -> global df
    stats/global.json                  N, total_tokens, avgdl, config
    _lineage/postings-{part:05d}.json  per-partition lineage
    _lineage/docmap-{seg:05d}.json
    manifest.json                      committed LAST — the atomic
                                       publish barrier (reference
                                       analogue: documentCount bump
                                       after postings are written,
                                       memorysegment.chpl:280-289)

A failed build leaves verified lineage records behind; the re-run
skips their partitions before the shuffle (see pipelines/build.py).
At multi-node scale the index dir must live on shared storage
(NFS/S3); in this sandbox it is a local path.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
import tempfile
import uuid
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from chearch_ray.config import EngineConfig
from chearch_ray.functions.codec import EncodedPostings

MANIFEST_VERSION = 1

POSTINGS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("count", pa.uint64()),  # df of the term within this partition
        ("doc_blob", pa.binary()),
        ("tf_blob", pa.binary()),
        ("block_last", pa.list_(pa.uint64())),
        ("block_max_tf", pa.list_(pa.uint32())),
        ("block_doc_off", pa.list_(pa.int64())),
        ("block_tf_off", pa.list_(pa.int64())),
        # packed positions: per-term varint-delta blob + per-skip-block
        # byte offsets; absent when store_positions=False.  (Older
        # files carried a nested `positions` list<list<uint32>> column
        # instead — still readable.)
        ("pos_blob", pa.binary()),
        ("pos_off", pa.list_(pa.int64())),
    ]
)

DOCMAP_SCHEMA = pa.schema(
    [
        ("doc_id", pa.uint64()),
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("doc_len", pa.uint32()),
        ("content_sha", pa.string()),
    ]
)

#: doc_id_bits=128 docmap: external id = (doc_id_hi, doc_id); rows
#: sorted by (hi, lo) so the ROW ORDINAL is the segment-local posting
#: id (reference internal-docIndex/externalDocId split)
DOCMAP_SCHEMA_WIDE = pa.schema(
    [("doc_id_hi", pa.uint64())] + list(DOCMAP_SCHEMA)
)


# ------------------------------------------------------------ atomic IO
def atomic_write_table(table: pa.Table, path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp-{uuid.uuid4().hex}"
    pq.write_table(table, tmp, compression="zstd")
    os.replace(tmp, path)


def atomic_write_json(obj: dict, path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def file_sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


# -------------------------------------------------------------- lineage
@dataclass
class LineageRecord:
    """Per-partition build provenance.  `content_sha` hashes the
    emitted file (not just row counts — resume must detect torn
    output, SURVEY.md §7 hard-part 4)."""

    kind: str  # "postings" | "docmap"
    part: int
    path: str  # relative to index dir
    rows: int
    n_postings: int
    content_sha: str
    input_fingerprint: str  # hash over the partition's input row keys

    def save(self, index_dir: str) -> None:
        atomic_write_json(dataclasses.asdict(self), lineage_path(index_dir, self.kind, self.part))

    @classmethod
    def load(cls, index_dir: str, kind: str, part: int) -> "LineageRecord | None":
        p = lineage_path(index_dir, kind, part)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return cls(**json.load(f))

    def verify(self, index_dir: str) -> bool:
        """True iff the output file exists and hashes to the recorded
        sha — the partition can be skipped on resume."""
        full = os.path.join(index_dir, self.path)
        return os.path.exists(full) and file_sha256(full) == self.content_sha


def lineage_path(index_dir: str, kind: str, part: int) -> str:
    return os.path.join(index_dir, "_lineage", f"{kind}-{part:05d}.json")


def completed_parts(index_dir: str, kind: str) -> set[int]:
    """Partitions whose lineage record verifies (resume set)."""
    lineage_dir = os.path.join(index_dir, "_lineage")
    done: set[int] = set()
    if not os.path.isdir(lineage_dir):
        return done
    for name in os.listdir(lineage_dir):
        if not name.startswith(f"{kind}-") or not name.endswith(".json"):
            continue
        part = int(name[len(kind) + 1 : -5])
        rec = LineageRecord.load(index_dir, kind, part)
        if rec is not None and rec.verify(index_dir):
            done.add(part)
    return done


# ------------------------------------------------------------- manifest
@dataclass
class Manifest:
    version: int
    config: dict
    num_docs: int
    total_tokens: int
    avgdl: float
    postings_parts: list[dict]  # [{part, path, rows, n_postings, sha}]
    docmap_parts: list[dict]
    term_stats_path: str = "stats/term_stats.parquet"
    extra: dict = field(default_factory=dict)

    @property
    def engine_config(self) -> EngineConfig:
        valid = {f.name for f in dataclasses.fields(EngineConfig)}
        cfg = {k: v for k, v in self.config.items() if k in valid}
        cfg["input_columns"] = tuple(cfg.get("input_columns", ()))
        return EngineConfig(**cfg)

    def save(self, index_dir: str) -> None:
        atomic_write_json(dataclasses.asdict(self), os.path.join(index_dir, "manifest.json"))

    @classmethod
    def load(cls, index_dir: str) -> "Manifest":
        with open(os.path.join(index_dir, "manifest.json")) as f:
            return cls(**json.load(f))


def manifest_exists(index_dir: str) -> bool:
    return os.path.exists(os.path.join(index_dir, "manifest.json"))


# ---------------------------------------------------- postings file IO
def postings_rel_path(part: int) -> str:
    return os.path.join("segments", f"part-{part:05d}.parquet")


def docmap_rel_path(seg: int) -> str:
    return os.path.join("docmap", f"seg-{seg:05d}.parquet")


class PostingsPartReader:
    """Loads one postings partition file into memory once (actor-side;
    reference analogue: the locale-resident term hash table,
    searchindex.chpl:25-53) and serves per-term EncodedPostings."""

    def __init__(self, path: str, cfg_or_block_size):
        table = pq.read_table(path)
        if hasattr(cfg_or_block_size, "block_size"):
            cfg = cfg_or_block_size
            self.block_size = cfg.block_size
            self._codec = cfg.codec
            self._max_pos = cfg.max_positions_per_doc
        else:  # legacy call shape: bare block_size, varint defaults
            self.block_size = int(cfg_or_block_size)
            self._codec = "varint"
            self._max_pos = 0
        self._terms = {t: i for i, t in enumerate(table["term"].to_pylist())}
        self._count = table["count"].to_numpy()
        self._doc_blob = table["doc_blob"]
        self._tf_blob = table["tf_blob"]
        self._block_last = table["block_last"]
        self._block_max_tf = table["block_max_tf"]
        self._block_doc_off = table["block_doc_off"]
        self._block_tf_off = table["block_tf_off"]
        #: packed positions (pos_blob + per-block pos_off); the legacy
        #: nested list<list<uint32>> column is still readable
        self._pos_blob = table["pos_blob"] if "pos_blob" in table.column_names else None
        self._pos_off = table["pos_off"] if "pos_off" in table.column_names else None
        self._positions = table["positions"] if "positions" in table.column_names else None
        self._pos_decoded: dict[str, "pa.ListArray"] = {}
        #: per-(term, skip-block) decoded positions: (flat uint32 vals,
        #: block-local int64 offsets).  The lazy per-block path is hit
        #: REPEATEDLY by phrase/NEAR verify chunks over hot terms; an
        #: uncached decode re-paid ~13 ms per term per segment per
        #: query (the round-4 bench phrase regression)
        self._pos_blk_cache: dict[str, dict[int, tuple[np.ndarray, np.ndarray]]] = {}
        #: numpy (offsets int64, flat int64) mirror of _pos_decoded —
        #: the verify hot path gathers straight from these instead of
        #: paying an Arrow take + flatten + to_numpy per chunk
        self._pos_np: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        #: flat-path call counts: a term verified TWICE is hot — from
        #: the second call on it promotes to the full numpy mirror
        #: (per-block assembly costs ~0.5 ms/call in Python loops; a
        #: one-off query on a cold huge term never pays a full decode)
        self._pos_flat_hits: dict[str, int] = {}
        self._pos_counts_cache: dict[str, np.ndarray] = {}

    def __contains__(self, term: str) -> bool:
        return term in self._terms

    @property
    def terms(self) -> dict:
        return self._terms

    def df(self, term: str) -> int:
        i = self._terms.get(term)
        return 0 if i is None else int(self._count[i])

    def max_tf(self, term: str) -> int:
        """term-level tf upper bound from the skip-block metadata
        (max over block_max_tf) — no posting decode needed."""
        i = self._terms.get(term)
        if i is None:
            return 0
        blocks = self._block_max_tf[i].values
        return int(pa.compute.max(blocks).as_py()) if len(blocks) else 0

    def encoded(self, term: str) -> EncodedPostings | None:
        i = self._terms.get(term)
        if i is None:
            return None
        return EncodedPostings(
            count=int(self._count[i]),
            doc_blob=self._doc_blob[i].as_py(),
            tf_blob=self._tf_blob[i].as_py(),
            block_last=np.asarray(self._block_last[i].values, dtype=np.uint64),
            block_max_tf=np.asarray(self._block_max_tf[i].values, dtype=np.uint32),
            block_doc_off=np.asarray(self._block_doc_off[i].values, dtype=np.int64),
            block_tf_off=np.asarray(self._block_tf_off[i].values, dtype=np.int64),
        )

    def _pos_counts(self, term: str) -> np.ndarray:
        """per-posting stored position counts = tf capped at
        max_positions_per_doc (the tokenize-side truncation); memoized
        per term (tf decode is cheap next to positions, but the lazy
        block path may call repeatedly)."""
        hit = self._pos_counts_cache.get(term)
        if hit is not None:
            return hit
        from chearch_ray.functions.codec import decode_postings_any

        enc = self.encoded(term)
        _, tfs = decode_postings_any(enc, self.block_size, self._codec)
        tfs = tfs.astype(np.int64)
        out = np.minimum(tfs, self._max_pos) if self._max_pos > 0 else tfs
        if len(self._pos_counts_cache) > 1024:
            self._pos_counts_cache.clear()
        self._pos_counts_cache[term] = out
        return out

    def positions_arrow(self, term: str):
        """one term's positions as an Arrow list<uint32> array (one row
        per posting).  Packed format: ONE vectorized varint decode of
        the term's blob (cached); legacy format: zero-copy child."""
        i = self._terms.get(term)
        if i is None:
            return None
        if self._pos_blob is not None:
            hit = self._pos_decoded.get(term)
            if hit is not None:
                return hit
            from chearch_ray.functions.codec import unpack_position_blob

            blob = self._pos_blob[i].as_py()
            counts = self._pos_counts(term)
            flat, offsets = unpack_position_blob(blob, counts)
            out = pa.ListArray.from_arrays(
                pa.array(offsets.astype(np.int32), type=pa.int32()),
                pa.array(flat.astype(np.uint32), type=pa.uint32()),
            )
            if len(self._pos_decoded) > 1024:
                self._pos_decoded.clear()
            self._pos_decoded[term] = out
            return out
        if self._positions is None:
            return None
        scalar = self._positions[i]
        return scalar.values if scalar.is_valid else None

    def positions(self, term: str) -> list | None:
        if self._pos_blob is None and self._positions is None:
            return None
        arr = self.positions_arrow(term)
        return None if arr is None else arr.to_pylist()

    def positions_for_rows(self, term: str, rows: np.ndarray):
        """position lists for the given POSTING ROW indices only,
        decoding just the skip blocks those rows live in (pos_off per-
        block byte offsets) — the lazy path for phrase candidates
        against hot terms.  Returns a list<uint32> ListArray aligned
        with `rows`, or None when positions are unavailable.  Falls
        back to the cached full decode for legacy files or when the
        term is already decoded."""
        i = self._terms.get(term)
        if i is None:
            return None
        rows = np.asarray(rows, dtype=np.int64)
        counts = self._pos_counts(term)
        n_post = len(counts)
        full = self._full_positions_if_cheap(term, rows, n_post)
        if full is not None:
            if len(rows) == n_post and (
                n_post == 0
                or (
                    rows[0] == 0
                    and rows[-1] == n_post - 1
                    and bool(np.all(rows[1:] > rows[:-1]))
                )
            ):
                # rows are exactly 0..n_post-1 — skip the multi-MB take
                # copy (the all-docs candidate set of a hot-term
                # phrase).  NB callers may pass rows in RANK order, so
                # equal length alone does not imply identity.
                return full
            return full.take(pa.array(rows, type=pa.int64()))
        l, flat = self._positions_rows_blocks(term, rows, counts, n_post)
        return pa.ListArray.from_arrays(
            pa.array(np.concatenate([[0], np.cumsum(l)]).astype(np.int32),
                     type=pa.int32()),
            pa.array(flat, type=pa.uint32()),
        )

    def _full_positions_if_cheap(self, term: str, rows: np.ndarray,
                                 n_post: int):
        """the cached full decode when it exists / is legacy-only / is
        cheaper than touching most skip blocks anyway (the gate is on
        BLOCKS touched, not row count: a few hundred rank-ordered
        scattered candidates touch most blocks of a hot term, so
        per-block decode would cost nearly a full decode per call)."""
        full = self._pos_decoded.get(term)
        if full is None and self._pos_blob is None:
            full = self.positions_arrow(term)  # legacy nested path
        if full is None and (len(np.unique(rows // self.block_size))
                             * self.block_size * 2 >= n_post):
            full = self.positions_arrow(term)
        return full

    def positions_rows_flat(self, term: str, rows: np.ndarray):
        """(lengths int64, flat positions int64) for the given POSTING
        ROW indices — the verify hot path.  Same decode strategy as
        positions_for_rows, but gathers straight from a cached numpy
        (offsets, values) mirror instead of paying an Arrow take +
        flatten + to_numpy round-trip per verification chunk (~60% of
        span-near latency on hot terms).  Returns None when positions
        are unavailable."""
        i = self._terms.get(term)
        if i is None:
            return None
        rows = np.asarray(rows, dtype=np.int64)
        counts = self._pos_counts(term)
        n_post = len(counts)
        seen = self._pos_flat_hits.get(term, 0)
        self._pos_flat_hits[term] = seen + 1
        full = self._full_positions_if_cheap(term, rows, n_post)
        if full is None and seen >= 1:
            full = self.positions_arrow(term)  # hot-term promotion
        if full is not None:
            hit = self._pos_np.get(term)
            if hit is None:
                # NB .offsets entries index into .values correctly even
                # for sliced arrays (raw child offsets)
                hit = (np.asarray(full.offsets).astype(np.int64),
                       np.asarray(full.values).astype(np.int64))
                if len(self._pos_np) > 1024:
                    self._pos_np.clear()
                self._pos_np[term] = hit
            off, v = hit
            lo = off[rows]
            lengths = off[rows + 1] - lo
            total = int(lengths.sum())
            idx = (
                np.arange(total, dtype=np.int64)
                - np.repeat(np.concatenate([[0], np.cumsum(lengths)])[:-1],
                            lengths)
                + np.repeat(lo, lengths)
            )
            return lengths, v[idx]
        l, flat = self._positions_rows_blocks(term, rows, counts, n_post)
        return l, flat.astype(np.int64)

    def _positions_rows_blocks(self, term: str, rows: np.ndarray,
                               counts: np.ndarray, n_post: int):
        """per-skip-block decode path shared by the Arrow and flat
        variants: (lengths int64, flat uint32) aligned with `rows`."""
        i = self._terms[term]
        from chearch_ray.functions.codec import unpack_position_blob

        bs = self.block_size
        blocks = np.unique(rows // bs)
        cache = self._pos_blk_cache.setdefault(term, {})
        miss = [b for b in blocks.tolist() if b not in cache]
        if miss:
            pos_off = np.asarray(self._pos_off[i].values, dtype=np.int64)
            blob = np.frombuffer(self._pos_blob[i].as_py(), dtype=np.uint8)
            mb = np.array(miss, dtype=np.int64)
            # delta encoding restarts at every posting, so the missing
            # blocks' byte slices CONCATENATE into one valid stream —
            # one vectorized varint decode for all misses (a per-block
            # decode loop costs ~50us of numpy setup per block)
            m_lo = mb * bs
            m_hi = np.minimum((mb + 1) * bs, n_post)
            byte_lo = pos_off[mb]
            byte_hi = np.where(mb + 1 < len(pos_off),
                               pos_off[np.minimum(mb + 1, len(pos_off) - 1)], len(blob))
            big_blob = np.concatenate(
                [blob[int(l) : int(h)] for l, h in zip(byte_lo, byte_hi)])
            cat_counts = np.concatenate(
                [counts[int(l) : int(h)] for l, h in zip(m_lo, m_hi)])
            m_vals, m_offs = unpack_position_blob(big_blob, cat_counts)
            m_base = np.concatenate([[0], np.cumsum(m_hi - m_lo)]).astype(np.int64)
            for j, b in enumerate(miss):
                p0, p1 = m_base[j], m_base[j + 1]
                v0, v1 = int(m_offs[p0]), int(m_offs[p1])
                cache[b] = (m_vals[v0:v1].astype(np.uint32),
                            (m_offs[p0 : p1 + 1] - m_offs[p0]).astype(np.int64))
            # memory bound mirrors the postings block cache policy:
            # keep only the current term's blocks once the total grows
            if sum(len(c) for c in self._pos_blk_cache.values()) > (1 << 13):
                keep = self._pos_blk_cache.pop(term)
                self._pos_blk_cache.clear()
                self._pos_blk_cache[term] = keep
                cache = keep
        # assemble the concatenated (vals, offs) view over the needed
        # blocks from cache (block-local offsets re-shifted global)
        parts = [cache[b] for b in blocks.tolist()]
        vals = (np.concatenate([p[0] for p in parts])
                if parts else np.empty(0, dtype=np.uint32))
        shift = 0
        offs_parts = []
        for p in parts:
            offs_parts.append(p[1][:-1] + shift)
            shift += int(p[1][-1])
        offs = (np.concatenate(offs_parts + [np.array([shift], dtype=np.int64)])
                if parts else np.zeros(1, dtype=np.int64))
        lo_posts = blocks * bs
        hi_posts = np.minimum((blocks + 1) * bs, n_post)
        # posting index inside the concatenated space, fully vectorized
        cat_base = np.concatenate([[0], np.cumsum(hi_posts - lo_posts)])[:-1]
        brank = np.searchsorted(blocks, rows // bs)
        cat_post = cat_base[brank] + (rows - blocks[brank] * bs)
        starts_b = offs[cat_post]
        l = offs[cat_post + 1] - starts_b
        total = int(l.sum())
        idx = (
            np.arange(total, dtype=np.int64)
            - np.repeat(np.concatenate([[0], np.cumsum(l)])[:-1], l)
            + np.repeat(starts_b, l)
        )
        return l.astype(np.int64), vals[idx].astype(np.uint32)

    def positions_packed_column(self):
        """per-POSTING packed position cells (binary array, term-major
        file row order) — the merge path re-ships these bytes through
        the rebuild without re-encoding.  None when positions were not
        stored; legacy nested files re-pack."""
        if self._pos_blob is not None:
            from chearch_ray.functions.codec import varint_decode

            parts: list[pa.Array] = []
            for term in self._terms:
                i = self._terms[term]
                blob = np.frombuffer(self._pos_blob[i].as_py(), dtype=np.uint8)
                counts = self._pos_counts(term)
                # per-posting byte boundaries: varint value ends, taken
                # at each posting's cumulative occurrence count
                ends = np.flatnonzero(blob < 0x80)
                cum = np.cumsum(counts)
                if len(cum) == 0 or cum[-1] == 0:
                    byte_off = np.zeros(len(counts) + 1, dtype=np.int64)
                else:
                    byte_off = np.concatenate(
                        [[0], np.where(cum > 0, ends[np.maximum(cum - 1, 0)] + 1, 0)]
                    )
                # zero-count postings must inherit the previous offset
                byte_off = np.maximum.accumulate(byte_off)
                parts.append(
                    pa.Array.from_buffers(
                        pa.binary(),
                        len(counts),
                        [None, pa.py_buffer(byte_off.astype(np.int32).tobytes()),
                         pa.py_buffer(blob.tobytes())],
                    )
                )
            if not parts:
                return pa.array([], type=pa.binary())
            return pa.concat_arrays(parts)
        if self._positions is None:
            return None
        from chearch_ray.functions.codec import pack_position_lists

        col = self._positions
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        return pack_position_lists(col.flatten())


class DocmapReader:
    """One doc-segment's docmap, held as sorted numpy arrays for O(log n)
    doc_id -> (doc_len, metadata row) lookup.

    Wide (doc_id_bits=128) docmaps are ORDINAL-indexed: posting values
    are the row ordinals, so every lookup is O(1) fancy indexing, and
    `external_ids` / `ordinals_for` translate between the ordinal space
    and the external (hi, lo) pairs."""

    def __init__(self, path: str):
        table = pq.read_table(path)
        self.table = table
        self.wide = "doc_id_hi" in table.column_names
        self.doc_ids = table["doc_id"].to_numpy()  # sorted ascending (64-bit mode)
        self.doc_len = table["doc_len"].to_numpy().astype(np.float64)
        if self.wide:
            from chearch_ray.functions.hashing import key16

            self.doc_hi = table["doc_id_hi"].to_numpy()
            self._keys = key16(
                self.doc_hi.astype(np.uint64), self.doc_ids.astype(np.uint64)
            )

    def _indices_for(self, doc_ids: np.ndarray) -> np.ndarray:
        """validated lookup: every id must exist in the docmap — a miss
        means postings/docmap divergence (e.g. mixed stale segments)
        and silently returning a neighbor's row would corrupt scores
        and projections.  Wide mode: ids ARE ordinals (bounds-checked)."""
        if self.wide:
            ids = doc_ids.astype(np.int64)
            if len(ids) and (ids.max(initial=-1) >= len(self.doc_ids) or ids.min(initial=0) < 0):
                raise ValueError("posting ordinal out of docmap range")
            return ids
        idx = np.searchsorted(self.doc_ids, doc_ids)
        idx_c = np.minimum(idx, len(self.doc_ids) - 1) if len(self.doc_ids) else idx
        if len(self.doc_ids) == 0 or not np.array_equal(self.doc_ids[idx_c], doc_ids):
            missing = doc_ids if len(self.doc_ids) == 0 else doc_ids[self.doc_ids[idx_c] != doc_ids]
            raise ValueError(
                f"doc ids missing from docmap (postings/docmap divergence): {missing[:5]}"
            )
        return idx_c

    # -------------------------------------------------- wide-id helpers
    def external_ids(self, ordinals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(hi, lo) external pairs for posting ordinals (wide mode)."""
        idx = self._indices_for(ordinals)
        return self.doc_hi[idx].astype(np.uint64), self.doc_ids[idx].astype(np.uint64)

    def ordinals_for(self, hi: np.ndarray, lo: np.ndarray) -> np.ndarray:
        """external (hi, lo) -> ordinals; -1 where absent (wide mode)."""
        from chearch_ray.functions.hashing import key16

        q = key16(hi.astype(np.uint64), lo.astype(np.uint64))
        pos = np.searchsorted(self._keys, q)
        pos_c = np.minimum(pos, max(len(self._keys) - 1, 0))
        ok = self._keys[pos_c] == q if len(self._keys) else np.zeros(len(q), dtype=bool)
        return np.where(ok, pos_c, -1).astype(np.int64)

    def lengths_for(self, doc_ids: np.ndarray) -> np.ndarray:
        return self.doc_len[self._indices_for(doc_ids)]

    def meta_for(self, doc_ids: np.ndarray) -> pa.Table:
        return self.table.take(pa.array(self._indices_for(doc_ids), type=pa.int64()))

    def column_arrow_for(self, doc_ids: np.ndarray,
                         column: str) -> "pa.ChunkedArray":
        """ONE metadata column's values for `doc_ids` as Arrow
        (validated like meta_for) — aggregation paths hand it to
        Arrow group_by without materializing Python strings."""
        return self.table[column].take(
            pa.array(self._indices_for(doc_ids), type=pa.int64()))

    def column_codes_for(self, doc_ids: np.ndarray,
                         column: str) -> np.ndarray:
        """Dictionary CODES of one metadata column for `doc_ids` —
        grouping machinery (collapse) wants integer group keys, and
        Arrow's dictionary_encode stays in C++ where a numpy unique
        over Python strings would dominate the whole query."""
        import pyarrow.compute as _pc

        arr = self.table[column].take(
            pa.array(self._indices_for(doc_ids), type=pa.int64()))
        enc = _pc.dictionary_encode(arr.combine_chunks())
        return enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)


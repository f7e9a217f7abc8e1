"""Size-tiered merge policy for continuously-ingested indexes.

`OnlineIndexer.flush_roll` folds every flush into ONE main index —
correct (byte-identical to a combined build) but each roll rewrites
the whole main index: O(N^2) total bytes over N flushes.  At a
sustained ingest rate that rewrite amplification dominates; the
standard fix (LSM / Lucene-style tiered compaction) merges only
same-size-class indexes, `fanout` at a time, so each document is
rewritten O(log_fanout N) times total.

This module is the POLICY + scheduling layer over the existing
`merge_indexes` machinery (pipelines/merge.py), which stays the only
thing that touches segment bytes — so every tiered merge inherits the
byte-identical-to-full-build guarantee its tests pin.

reference: chearch has no persistence at all (README TODO); the
policy constants follow the classic size-tiered scheme, not any
reference code.
"""

from __future__ import annotations

import os
import shutil

from chearch_ray.state.segment import Manifest


def size_class(num_docs: int, base_docs: int, fanout: int) -> int:
    """size class of an index: 0 for <= base_docs, +1 per fanout x.
    Pure integer arithmetic (no float log) so class boundaries are
    exact: class c covers (base * fanout^(c-1), base * fanout^c]."""
    c = 0
    bound = max(1, base_docs)
    while num_docs > bound:
        c += 1
        bound *= fanout
    return c


def pick_merge_group(doc_counts: list[int], fanout: int,
                     base_docs: int) -> list[int] | None:
    """indexes' doc counts -> indices of ONE group to merge now, or
    None if stable.  Policy: the smallest size class holding >= fanout
    members merges its `fanout` smallest members (smallest first keeps
    the rewritten bytes minimal and the class structure converging)."""
    by_class: dict[int, list[int]] = {}
    for i, n in enumerate(doc_counts):
        by_class.setdefault(size_class(n, base_docs, fanout), []).append(i)
    for c in sorted(by_class):
        members = by_class[c]
        if len(members) >= fanout:
            members.sort(key=lambda i: (doc_counts[i], i))
            return members[:fanout]
    return None


class TieredIndexSet:
    """A set of live index directories under `root` with size-tiered
    compaction.  `add(dir)` registers a freshly flushed index and runs
    merges until the set is stable; `collapse()` merges everything
    into one directory for serving (byte-identical to a single build
    over the union corpus).

    Durability: the live-set record is the directory layout itself —
    every live index sits under root/live/<name>; merges write to
    root/tmp/... then atomically swap (rename inputs away, rename
    output in, delete inputs last), so a crash leaves either the
    inputs or the output, never neither."""

    def __init__(self, root: str, fanout: int = 4, base_docs: int = 100_000):
        if fanout < 2:
            raise ValueError("fanout must be >= 2")
        self.root = root
        self.fanout = fanout
        self.base_docs = base_docs
        os.makedirs(os.path.join(root, "live"), exist_ok=True)
        os.makedirs(os.path.join(root, "tmp"), exist_ok=True)
        # the directory layout is the durable live-set record, so the
        # name counter must resume past every existing idx-*/merge-*
        # name — a fresh instance over an existing root would otherwise
        # compute an already-occupied dest and shutil.move the new
        # flush INSIDE it (silent data loss on restart)
        self._counter = self._max_existing_counter()
        #: merge audit: list of (inputs_docs, output_docs) per merge
        self.merge_log: list[tuple[list[int], int]] = []

    def _max_existing_counter(self) -> int:
        mx = 0
        for sub in ("live", "tmp"):
            base = os.path.join(self.root, sub)
            for name in os.listdir(base):
                head, _, tail = name.rpartition("-")
                if head in ("idx", "merge") and tail.isdigit():
                    mx = max(mx, int(tail))
        return mx

    def _next_name(self, prefix: str) -> str:
        self._counter += 1
        return f"{prefix}-{self._counter:08d}"

    # ------------------------------------------------------------ state
    def live_dirs(self) -> list[str]:
        base = os.path.join(self.root, "live")
        return sorted(
            os.path.join(base, d) for d in os.listdir(base)
            if os.path.isdir(os.path.join(base, d))
        )

    def _doc_counts(self, dirs: list[str]) -> list[int]:
        return [Manifest.load(d).num_docs for d in dirs]

    # ------------------------------------------------------------ ops
    def add(self, index_dir: str) -> None:
        """Register a built index (moved under root/live) and compact
        until stable."""
        dest = os.path.join(self.root, "live", self._next_name("idx"))
        if os.path.exists(dest):
            raise RuntimeError(f"tiered dest already occupied: {dest}")
        shutil.move(index_dir, dest)
        self._compact()

    @staticmethod
    def _sidecars_present(inputs: list[str]) -> bool:
        """Whether the group's docstore sidecars should merge:
        all-or-none — a mixed set would silently serve snippets for
        only part of the corpus, so it refuses instead.  Called
        BEFORE the (expensive) index merge so the refusal is free."""
        from chearch_ray.state.docstore import has_docstore

        with_store = [has_docstore(d) for d in inputs]
        if not any(with_store):
            return False
        if not all(with_store):
            raise ValueError(
                f"mixed docstore presence across merge inputs {inputs}; "
                "flush every index with docstore=True or none")
        return True

    def _compact(self) -> None:
        from chearch_ray.pipelines.merge import merge_indexes
        from chearch_ray.state.docstore import merge_docstores

        while True:
            dirs = self.live_dirs()
            counts = self._doc_counts(dirs)
            group = pick_merge_group(counts, self.fanout, self.base_docs)
            if group is None:
                return
            inputs = [dirs[i] for i in group]
            sidecars = self._sidecars_present(inputs)
            name = self._next_name("idx")
            out_tmp = os.path.join(self.root, "tmp", f"merge-{name.split('-')[1]}")
            shutil.rmtree(out_tmp, ignore_errors=True)
            m = merge_indexes(inputs, out_tmp)
            if sidecars:
                merge_docstores(inputs, out_tmp)
            dest = os.path.join(self.root, "live", name)
            if os.path.exists(dest):
                raise RuntimeError(f"tiered dest already occupied: {dest}")
            # output in first, inputs out after: a crash window leaves
            # duplicates (re-mergeable), never data loss
            shutil.move(out_tmp, dest)
            for d in inputs:
                shutil.rmtree(d)
            self.merge_log.append(([counts[i] for i in group], m.num_docs))

    def collapse(self, out_dir: str) -> Manifest:
        """Merge every live index into `out_dir` (serving layout) —
        byte-identical to a from-scratch build over the union corpus."""
        from chearch_ray.pipelines.merge import merge_indexes

        dirs = self.live_dirs()
        if not dirs:
            raise ValueError("empty index set")
        if len(dirs) == 1:
            shutil.rmtree(out_dir, ignore_errors=True)
            shutil.copytree(dirs[0], out_dir)  # sidecar rides along
            return Manifest.load(out_dir)
        from chearch_ray.state.docstore import merge_docstores

        sidecars = self._sidecars_present(dirs)
        m = merge_indexes(dirs, out_dir)
        if sidecars:
            merge_docstores(dirs, out_dir)
        return m

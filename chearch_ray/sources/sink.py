"""Resumable partitioned Parquet sink.

The index build already resumes via per-partition lineage
(`pipelines/build.py`); this is the same guarantee for GENERIC
pipeline outputs (filtered corpora, packed training data, feature
tables): hash-partition by a key, write one directory per partition
ATOMICALLY (tmp dir + os.replace — a partition either fully exists or
not at all), and on re-run skip the partitions already on disk, so a
failed 100-TB job re-pays only its missing shards.  Never one giant
file.

Partition content is DETERMINISTIC (rows sorted by `order_by`, one
file per partition, fixed compression), so resume produces
byte-identical output to an uninterrupted run — tested in
tests/test_training_ops.py.

At scale `out_dir` is shared storage (every map_groups task writes
its own partition directly); single-node it is a local path.
"""

from __future__ import annotations

import os
import shutil
from functools import partial

import pyarrow as pa
import pyarrow.parquet as pq

from chearch_ray.stages.partition import add_pgrp_column

PART_PREFIX = "part-"


def _partition_dir(out_dir: str, pid: int) -> str:
    return os.path.join(out_dir, f"{PART_PREFIX}{pid:05d}")


def partition_id(name: str) -> int | None:
    """pid of a COMMITTED partition directory name (`part-NNNNN`);
    None for anything else — in particular the in-flight
    `part-NNNNN.tmp-<pid>` staging dirs of write_partition_atomic,
    which a killed writer legitimately leaves behind.  Every consumer
    that lists partitions MUST parse names through this (a raw
    int(split) crashes on the leftovers and breaks crash-resume)."""
    base = os.path.basename(name.rstrip("/"))
    if not base.startswith(PART_PREFIX):
        return None
    try:
        return int(base[len(PART_PREFIX):])
    except ValueError:
        return None


def finished_partitions(out_dir: str) -> set[int]:
    """partition ids already fully written (atomic rename = presence
    is completion); in-flight `.tmp-<pid>` staging dirs don't count."""
    if not os.path.isdir(out_dir):
        return set()
    out = set()
    for name in os.listdir(out_dir):
        pid = partition_id(name)
        if pid is not None:
            out.add(pid)
    return out


def write_partition_atomic(rows: pa.Table, out_dir: str, pid: int,
                           row_group_size: int | None = None) -> None:
    """THE atomic partition write: `out_dir/part-<pid>/data.parquet`
    via tmp dir + rename, keep-first on a concurrent-attempt race.
    Single home for the protocol so every writer (sink, docstore
    merge/GC) keeps identical crash/race guarantees."""
    dest = _partition_dir(out_dir, pid)
    tmp = f"{dest}.tmp-{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    kw = {"row_group_size": row_group_size} if row_group_size else {}
    pq.write_table(rows, os.path.join(tmp, "data.parquet"),
                   compression="snappy", **kw)
    if os.path.isdir(dest):  # lost a race to another attempt: keep first
        shutil.rmtree(tmp, ignore_errors=True)
    else:
        os.replace(tmp, dest)


def point_row_group_size(rows: pa.Table, row_group_size: int | None,
                         row_group_bytes: int | None) -> int | None:
    """Rows-per-group for a point-fetch store: bound the DECODE
    granule in bytes from the table's ACTUAL row width (a fixed row
    count makes KB-scale docs produce MB-scale groups), capped by the
    caller's row count.  Shared by the sink and docstore merge so
    merged partitions re-derive the identical split a fresh build
    would."""
    if row_group_bytes and len(rows):
        by_bytes = max(4, int(row_group_bytes * len(rows) / max(1, rows.nbytes)))
        return min(row_group_size or by_bytes, by_bytes)
    return row_group_size


def _write_one_partition(group: pa.Table, out_dir: str,
                         order_by: list[str],
                         row_group_size: int | None = None,
                         row_group_bytes: int | None = None) -> pa.Table:
    """map_groups body: write this partition's rows as ONE sorted
    parquet file via tmp-dir + atomic replace; returns a receipt row.
    Runs on whatever worker owns the partition — the write itself is
    distributed."""
    import pyarrow.compute as pc

    pid = int(group["pgrp"][0].as_py())
    rows = group.drop_columns(["pgrp"])
    idx = pc.sort_indices(rows, sort_keys=[(c, "ascending") for c in order_by])
    rows = rows.take(idx)
    write_partition_atomic(rows, out_dir, pid,
                           point_row_group_size(rows, row_group_size,
                                                row_group_bytes))
    return pa.table({"pid": pa.array([pid], type=pa.int64()),
                     "n_rows": pa.array([len(rows)], type=pa.int64())})


def write_resumable_parquet(ds, out_dir: str, key: str,
                            n_partitions: int = 64,
                            order_by: list[str] | None = None,
                            row_group_size: int | None = None,
                            row_group_bytes: int | None = None) -> dict:
    """Write `ds` as `out_dir/part-NNNNN/data.parquet`, partitioned by
    hash(key) % n_partitions, skipping partitions that already exist.

    Returns {"written": [pid...], "skipped": [pid...]}.  The skip
    filter is pushed INTO the pipeline (rows of finished partitions
    drop map-side before the exchange), so a resume re-reads the input
    but re-shuffles and re-writes only the missing shards.
    `row_group_size` caps rows per parquet row group — point-lookup
    consumers (state/docstore.py) keep it small so sorted row-group
    statistics prune fetches to O(k) groups."""
    order_by = order_by or [key]
    done = finished_partitions(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    parted = ds.map_batches(
        partial(add_pgrp_column, n_partitions=n_partitions, key=key),
        batch_format="pyarrow",
    )
    if done:
        done_list = sorted(done)

        def drop_done(batch: pa.Table) -> pa.Table:
            import numpy as np

            ids = batch["pgrp"].to_numpy()
            return batch.filter(pa.array(~np.isin(ids, done_list)))

        parted = parted.map_batches(drop_done, batch_format="pyarrow")

    receipts = parted.groupby("pgrp").map_groups(
        partial(_write_one_partition, out_dir=out_dir, order_by=order_by,
                row_group_size=row_group_size,
                row_group_bytes=row_group_bytes),
        batch_format="pyarrow",
    )
    written = sorted(
        int(pid)
        for t in receipts.iter_batches(batch_size=None, batch_format="pyarrow")
        for pid in t["pid"].to_pylist()
    )
    return {"written": written, "skipped": sorted(done)}

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

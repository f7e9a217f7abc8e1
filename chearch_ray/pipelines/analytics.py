"""Relational analytics over the TPC-H-shaped driver tables — the
general data-processing side of the engine (group aggregates and
multi-table joins), expressed Ray-Data-first:

* `pricing_summary` (TPC-H Q1 shape): filter at the read, map-side
  PARTIAL aggregation per batch (one row per group per batch — the
  shuffle carries group-count rows, never lineitems), then a tiny
  global groupby.  Money rides as integer cents (round-half-away,
  the same DuckDB `round()` mirror as stages.events) so sums are
  order-independent and SQL-exact.
* `revenue_by_nation` (orders ⋈ customer ⋈ nation): the 25-row
  nation table BROADCASTS (a dict lookup inside map_batches — never
  a shuffle); orders⋈customer is a real distributed hash join
  (Dataset.join, fractional-CPU aggregators per the repo-wide
  deadlock note); the final rollup is again partial-then-groupby.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from chearch_ray.stages.events import _round_half_away
from chearch_ray.stages.partition import (datasets_size_bytes,
                                           join_parallelism, join_remote_args)

#: Q1-style shipdate cutoff (epoch microseconds of 2001-06-30)
PRICING_CUTOFF = "2001-06-30"


def _cents(x: np.ndarray) -> np.ndarray:
    return _round_half_away(np.asarray(x, dtype=np.float64) * 100)


#: arbitrary-precision per-block moments travel as decimal128(38,0) —
#: the Arrow analogue of the SQL mirrors' HUGEINT; int64 partials would
#: silently wrap for price-scale cents (~1.1e7) squared over ~8e4 rows
_MOMENT_TYPE = pa.decimal128(38, 0)


def _exact_sum_prod(a: np.ndarray, b: np.ndarray | None = None) -> int:
    """Exact sum(a) (b=None) or sum(a*b) over int64 arrays at ANY
    magnitude: chunks sized so no int64 partial can overflow are
    summed vectorized, chunk results merge in Python ints.  Falls back
    to a Python-int loop only when a single product already exceeds
    int64 (cents beyond ~3e9 squared — never in the benchmark data)."""
    a = np.asarray(a, dtype=np.int64)
    if len(a) == 0:
        return 0
    ma = int(np.abs(a).max())
    if b is None:
        bound = max(ma, 1)
    else:
        b = np.asarray(b, dtype=np.int64)
        mb = int(np.abs(b).max())
        bound = max(ma, 1) * max(mb, 1)
        if bound >= (1 << 62):  # even one product can wrap int64
            return sum(int(x) * int(y) for x, y in zip(a.tolist(), b.tolist()))
    step = max(1, (1 << 62) // bound)
    total = 0
    for i in range(0, len(a), step):
        ca = a[i:i + step]
        total += int(ca.sum() if b is None else np.dot(ca, b[i:i + step]))
    return total


def _pricing_partial(batch: pa.Table, cutoff_us: int) -> pa.Table:
    ship = batch["l_shipdate"]
    if isinstance(ship, pa.ChunkedArray):
        ship = ship.combine_chunks()
    us = np.asarray(ship.cast(pa.int64()))
    keep = us <= cutoff_us
    if not keep.any():
        return pa.table(
            {
                "l_returnflag": pa.array([], type=pa.string()),
                "l_linestatus": pa.array([], type=pa.string()),
                "count_order": pa.array([], type=pa.int64()),
                "sum_qty_cents": pa.array([], type=pa.int64()),
                "sum_base_cents": pa.array([], type=pa.int64()),
                "sum_disc_cents": pa.array([], type=pa.int64()),
                "sum_charge_cents": pa.array([], type=pa.int64()),
            }
        )
    b = batch.filter(pa.array(keep))
    qty = b["l_quantity"].to_numpy().astype(np.float64)
    price = b["l_extendedprice"].to_numpy().astype(np.float64)
    disc = b["l_discount"].to_numpy().astype(np.float64)
    tax = b["l_tax"].to_numpy().astype(np.float64)
    t = pa.table(
        {
            "l_returnflag": b["l_returnflag"],
            "l_linestatus": b["l_linestatus"],
            "count_order": pa.array(np.ones(len(b), dtype=np.int64)),
            # float expressions written EXACTLY as the SQL mirror
            # (left-assoc products) so the rounded cents agree
            "sum_qty_cents": pa.array(_cents(qty), type=pa.int64()),
            "sum_base_cents": pa.array(_cents(price), type=pa.int64()),
            "sum_disc_cents": pa.array(
                _round_half_away(price * (1.0 - disc) * 100), type=pa.int64()
            ),
            "sum_charge_cents": pa.array(
                _round_half_away(price * (1.0 - disc) * (1.0 + tax) * 100),
                type=pa.int64(),
            ),
        }
    )
    agg = t.group_by(["l_returnflag", "l_linestatus"], use_threads=False).aggregate(
        [(c, "sum") for c in t.column_names[2:]]
    )
    return agg.rename_columns(
        ["l_returnflag", "l_linestatus", "count_order", "sum_qty_cents",
         "sum_base_cents", "sum_disc_cents", "sum_charge_cents"]
    )


def _gated_group_sum(partials_ds, keys: list[str], sums: list[str],
                     driver_merge_limit: int | None = None) -> pa.Table:
    """merge map-side pre-aggregated partials (a few rows PER BLOCK —
    bounded by |groups|) into the final (keys, sums) table: driver-side
    below the rows gate (pattern: pack.DRIVER_MERGE_LIMIT — a groupby
    exchange costs seconds of fixed scheduling however few the rows),
    through a Ray groupby-Sum above it."""
    from chearch_ray.stages.pack import DRIVER_MERGE_LIMIT

    limit = DRIVER_MERGE_LIMIT if driver_merge_limit is None else driver_merge_limit
    mat = partials_ds.materialize()
    if mat.count() <= limit:
        parts = [t for t in mat.iter_batches(batch_size=None, batch_format="pyarrow")
                 if len(t)]
        if not parts:
            sch = mat.schema()
            if sch is None:  # zero-batch input: no schema to project
                return None
            # ray.data.Schema wraps the Arrow schema as .base_schema
            base = getattr(sch, "base_schema", sch)
            if not isinstance(base, pa.Schema):
                return None
            return base.empty_table().select(keys + sums)
        agg = pa.concat_tables(parts).group_by(keys, use_threads=False).aggregate(
            [(c, "sum") for c in sums]
        )
        return agg.rename_columns(keys + sums).select(keys + sums)
    from ray.data.aggregate import Sum

    out = mat.groupby(keys[0] if len(keys) == 1 else keys).aggregate(
        *[Sum(c, alias_name=c) for c in sums]
    )
    return pa.concat_tables(
        out.iter_batches(batch_size=None, batch_format="pyarrow")
    ).select(keys + sums)


def pricing_summary(lineitem_ds, cutoff: str = PRICING_CUTOFF) -> pa.Table:
    """TPC-H Q1 shape over the lineitem Dataset -> one row per
    (returnflag, linestatus) with integer-cent sums.  Map-side partials
    carry <= |flag x status| (~6) rows per block, so the merge is the
    gated driver/groupby pattern — no exchange at sandbox scale."""
    cutoff_us = int(np.datetime64(cutoff, "us").astype(np.int64))
    partials = lineitem_ds.map_batches(
        partial(_pricing_partial, cutoff_us=cutoff_us), batch_format="pyarrow"
    )
    return _gated_group_sum(
        partials, ["l_returnflag", "l_linestatus"],
        ["count_order", "sum_qty_cents", "sum_base_cents",
         "sum_disc_cents", "sum_charge_cents"],
    )


def _attach_nation(batch: pa.Table, nation_ref) -> pa.Table:
    """broadcast nation lookup: c_nationkey -> n_name inside the task
    (25 rows — never a shuffle)."""
    import ray

    keys, names = ray.get(nation_ref) if not isinstance(nation_ref, tuple) else nation_ref
    k = batch["c_nationkey"].to_numpy().astype(np.int64)
    pos = np.searchsorted(keys, k)
    pos = np.minimum(pos, len(keys) - 1)
    name_arr = names.take(pa.array(pos, type=pa.int64()))
    return pa.table(
        {
            "c_custkey": batch["c_custkey"].cast(pa.int64()),
            "n_name": name_arr,
        }
    )


def _rev_partial(batch: pa.Table) -> pa.Table:
    cents = _cents(batch["o_totalprice"].to_numpy().astype(np.float64))
    t = pa.table(
        {
            "n_name": batch["n_name"],
            "n_orders": pa.array(np.ones(len(batch), dtype=np.int64)),
            "total_cents": pa.array(cents, type=pa.int64()),
        }
    )
    agg = t.group_by("n_name", use_threads=False).aggregate(
        [("n_orders", "sum"), ("total_cents", "sum")]
    )
    return agg.rename_columns(["n_name", "n_orders", "total_cents"])


def revenue_by_nation(orders_ds, customer_ds, nation_table: pa.Table,
                      join_partitions: int | None = None) -> pa.Table:
    """orders ⋈ customer ⋈ nation -> (n_name, n_orders, total_cents).
    nation (25 rows) broadcasts inside the customer map; customer
    itself is a unique-key DIMENSION side, so orders ⋈ customer rides
    broadcast_lookup_join (one map pass below the gate, Dataset.join
    above); the rollup partials are <= 25 rows per block and merge
    through the gated driver/groupby pattern."""
    import ray
    import ray.data

    from chearch_ray.stages.joins import broadcast_lookup_join

    keys = nation_table["n_nationkey"].to_numpy().astype(np.int64)
    order = np.argsort(keys)
    names = nation_table["n_name"]
    if isinstance(names, pa.ChunkedArray):
        names = names.combine_chunks()
    nation_ref = ray.put((keys[order], names.take(pa.array(order, type=pa.int64()))))

    cust = customer_ds.map_batches(
        partial(_attach_nation, nation_ref=nation_ref), batch_format="pyarrow"
    )
    orders = orders_ds.map_batches(
        lambda b: pa.table(
            {
                "o_custkey": b["o_custkey"].cast(pa.int64()),
                "o_totalprice": b["o_totalprice"],
            }
        ),
        batch_format="pyarrow",
    )
    joined = broadcast_lookup_join(
        orders, cust, on="o_custkey", right_on="c_custkey",
        payload=["n_name"], n_partitions=join_partitions,
    )
    partials = joined.map_batches(_rev_partial, batch_format="pyarrow")
    return _gated_group_sum(partials, ["n_name"], ["n_orders", "total_cents"])


# ------------------------------------------------------------- Q6 shape
def _q6_partial(batch: pa.Table, d1_us: int, d2_us: int,
                disc_lo: float, disc_hi: float, qty_max: float) -> pa.Table:
    ship = batch["l_shipdate"]
    if isinstance(ship, pa.ChunkedArray):
        ship = ship.combine_chunks()
    us = np.asarray(ship.cast(pa.int64()))
    disc = batch["l_discount"].to_numpy().astype(np.float64)
    qty = batch["l_quantity"].to_numpy().astype(np.float64)
    keep = (us >= d1_us) & (us < d2_us) & (disc >= disc_lo) & (disc <= disc_hi) & (qty < qty_max)
    price = batch["l_extendedprice"].to_numpy().astype(np.float64)[keep]
    d = disc[keep]
    return pa.table(
        {
            "revenue_cents": pa.array(
                [int(_round_half_away(price * d * 100).sum())], type=pa.int64()
            ),
            "n_items": pa.array([int(keep.sum())], type=pa.int64()),
        }
    )


def forecast_revenue(lineitem_ds, d1: str = "2001-01-01", d2: str = "2002-01-01",
                     discount: float = 0.06, qty_max: float = 24.0):
    """TPC-H Q6 shape: fully map-side — every batch reduces to ONE
    partial row (revenue cents, matched items), and the 'shuffle' is a
    count-of-blocks-row global sum.  Predicates run vectorized on the
    pruned (date, discount, qty, price) columns; at scale the read
    itself should pass `columns=` so nothing else leaves storage."""
    d1_us = int(np.datetime64(d1, "us").astype(np.int64))
    d2_us = int(np.datetime64(d2, "us").astype(np.int64))
    partials = lineitem_ds.map_batches(
        partial(_q6_partial, d1_us=d1_us, d2_us=d2_us,
                disc_lo=discount - 0.01 - 1e-9, disc_hi=discount + 0.01 + 1e-9,
                qty_max=qty_max),
        batch_format="pyarrow",
    )
    # bounded driver merge: one 2-int row per block (the same class as
    # the quantile min/max pass — ~13 MB at the 8e5-block 100-TB
    # estimate), vs a global-aggregate exchange whose fixed cost is
    # seconds however small the data
    revenue = items = 0
    for t in partials.iter_batches(batch_size=None, batch_format="pyarrow"):
        if len(t):
            revenue += int(np.sum(t["revenue_cents"].to_numpy()))
            items += int(np.sum(t["n_items"].to_numpy()))
    return pa.table(
        {
            "revenue_cents": pa.array([revenue], type=pa.int64()),
            "n_items": pa.array([items], type=pa.int64()),
        }
    )


# ------------------------------------------------------------- Q3 shape
def _q3_lineitem_partial(batch: pa.Table, ship_after_us: int) -> pa.Table:
    ship = batch["l_shipdate"]
    if isinstance(ship, pa.ChunkedArray):
        ship = ship.combine_chunks()
    us = np.asarray(ship.cast(pa.int64()))
    keep = us > ship_after_us
    b = batch.filter(pa.array(keep))
    price = b["l_extendedprice"].to_numpy().astype(np.float64)
    disc = b["l_discount"].to_numpy().astype(np.float64)
    t = pa.table(
        {
            "l_orderkey": b["l_orderkey"].cast(pa.int64()),
            "rev_cents": pa.array(
                _round_half_away(price * (1.0 - disc) * 100), type=pa.int64()
            ),
        }
    )
    agg = t.group_by("l_orderkey", use_threads=False).aggregate([("rev_cents", "sum")])
    return agg.rename_columns(["l_orderkey", "rev_cents"])


def _q3_orders_partial(batch: pa.Table, before_us: int) -> pa.Table:
    od = batch["o_orderdate"]
    if isinstance(od, pa.ChunkedArray):
        od = od.combine_chunks()
    keep = np.asarray(od.cast(pa.int64())) < before_us
    b = batch.filter(pa.array(keep))
    return pa.table(
        {
            "o_orderkey": b["o_orderkey"].cast(pa.int64()),
            "o_custkey": b["o_custkey"].cast(pa.int64()),
            "o_orderdate": b["o_orderdate"],
            "o_orderpriority": b["o_orderpriority"],
        }
    )


def _q3_topk_block(batch: pa.Table, k: int) -> pa.Table:
    """per-block candidate cut for the final top-k merge: keep each
    block's k best rows by (revenue desc, orderkey asc) — the global
    top-k is a subset of the union of per-block top-k."""
    if len(batch) <= k:
        return batch
    import pyarrow.compute as pc

    order = pc.sort_indices(
        batch,
        sort_keys=[("revenue_cents", "descending"), ("l_orderkey", "ascending")],
    )
    return batch.take(order[:k])


def shipping_priority(lineitem_ds, orders_ds, customer_ds,
                      segment: str = "BUILDING", date: str = "1998-06-01",
                      k: int = 10, join_partitions: int | None = None):
    """TPC-H Q3 shape: customer(segment) ⋈ orders(date) ⋈ lineitem
    (both distributed hash joins), per-orderkey revenue as integer
    cents, global top-k by (revenue desc, orderkey asc).

    Scale notes: lineitem (the big side) is pre-aggregated PER
    ORDERKEY inside map_batches before its join — the join moves one
    row per (block, orderkey), not one per lineitem; the final top-k
    never sorts the aggregate globally (per-block k-cut, then one
    driver-side merge of <= k*blocks candidate rows)."""
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    import pyarrow.compute as pc

    from chearch_ray.stages.joins import hash_semi_join
    from chearch_ray.stages.pack import DRIVER_MERGE_LIMIT

    date_us = int(np.datetime64(date, "us").astype(np.int64))
    cust = customer_ds.filter(expr=f"c_mktsegment == '{segment}'").map_batches(
        lambda b: pa.table({"o_custkey": b["c_custkey"].cast(pa.int64())}),
        batch_format="pyarrow",
    )
    orders = orders_ds.map_batches(
        partial(_q3_orders_partial, before_us=date_us), batch_format="pyarrow"
    )
    li = lineitem_ds.map_batches(
        partial(_q3_lineitem_partial, ship_after_us=date_us), batch_format="pyarrow"
    )
    # qualifying orders: segment membership is a SEMI join (the
    # customer side carries no payload), so it rides hash_semi_join's
    # size-gated broadcast instead of a Dataset.join actor exchange
    sel = hash_semi_join(
        orders, cust, on="o_custkey",
        payload=["o_orderkey", "o_orderdate", "o_orderpriority"],
    ).materialize()

    empty = pa.table({
        "l_orderkey": pa.array([], type=pa.int64()),
        "revenue_cents": pa.array([], type=pa.int64()),
        "o_orderdate": pa.array([], type=pa.timestamp("us")),
        "o_orderpriority": pa.array([], type=pa.string()),
    })
    n_sel = sel.count()
    if n_sel == 0:
        return empty
    if n_sel <= DRIVER_MERGE_LIMIT:
        # broadcast path: the qualifying-order table is small, so its
        # sorted key array ships once (`ray.put`) and the lineitem
        # side needs ONE map pass — no join exchange, no groupby
        # shuffle.  Revenue partials are one row per (block, member
        # orderkey); they merge driver-side below the same gate the
        # other operators use, in a Ray groupby above it.
        ot = pa.concat_tables(
            [t for t in sel.iter_batches(batch_size=None, batch_format="pyarrow")
             if len(t)]
        ).combine_chunks()
        okeys = ot["o_orderkey"].to_numpy().astype(np.int64)
        sort = np.argsort(okeys)
        okeys_sorted = okeys[sort]
        keys_ref = ray.put(okeys_sorted)

        def member_rev(batch: pa.Table, keys_ref=keys_ref) -> pa.Table:
            import ray as _ray

            keys = _ray.get(keys_ref) if not isinstance(keys_ref, np.ndarray) else keys_ref
            kk = batch["l_orderkey"].to_numpy().astype(np.int64)
            pos = np.searchsorted(keys, kk)
            posc = np.minimum(pos, max(len(keys) - 1, 0))
            hit = keys[posc] == kk if len(keys) else np.zeros(len(kk), dtype=bool)
            return pa.table({
                "l_orderkey": pa.array(kk[hit], type=pa.int64()),
                "rev_cents": pa.array(
                    batch["rev_cents"].to_numpy().astype(np.int64)[hit],
                    type=pa.int64()),
            })

        partials = li.map_batches(member_rev, batch_format="pyarrow").materialize()
        if partials.count() <= DRIVER_MERGE_LIMIT:
            rows = [t for t in partials.iter_batches(batch_size=None,
                                                     batch_format="pyarrow") if len(t)]
            if not rows:
                return empty
            allp = pa.concat_tables(rows)
            kk = allp["l_orderkey"].to_numpy().astype(np.int64)
            rv = allp["rev_cents"].to_numpy().astype(np.int64)
            uk, inv = np.unique(kk, return_inverse=True)
            sums = np.zeros(len(uk), dtype=np.int64)
            np.add.at(sums, inv, rv)  # integer-pure (bincount would go float)
        else:
            merged_rows = partials.groupby("l_orderkey").aggregate(
                Sum("rev_cents", alias_name="rev_cents")
            ).take_all()
            if not merged_rows:
                return empty
            uk = np.array([r["l_orderkey"] for r in merged_rows], dtype=np.int64)
            sums = np.array([r["rev_cents"] for r in merged_rows], dtype=np.int64)
        topk = np.lexsort((uk, -sums))[: min(k, len(uk))]
        out_k, out_rev = uk[topk], sums[topk]
        # order columns attach driver-side for the k result rows only
        at = sort[np.searchsorted(okeys_sorted, out_k)]
        return pa.table({
            "l_orderkey": pa.array(out_k, type=pa.int64()),
            "revenue_cents": pa.array(out_rev, type=pa.int64()),
            "o_orderdate": ot["o_orderdate"].take(pa.array(at, type=pa.int64())),
            "o_orderpriority": ot["o_orderpriority"].take(pa.array(at, type=pa.int64())),
        })

    # scale path: one Dataset.join (the semi join above already
    # replaced the customer join), then the usual per-block top-k
    jp = join_parallelism(
        join_partitions, size_bytes=datasets_size_bytes(lineitem_ds, orders_ds))
    joined = sel.join(
        li, "inner", jp, on=("o_orderkey",), right_on=("l_orderkey",),
        aggregator_ray_remote_args=join_remote_args(),
    ).materialize()
    per_order = joined.groupby(["o_orderkey", "o_orderdate", "o_orderpriority"]).aggregate(
        Sum("rev_cents", alias_name="revenue_cents")
    )
    per_order = per_order.map_batches(
        lambda b: pa.table(
            {
                "l_orderkey": b["o_orderkey"].cast(pa.int64()),
                "revenue_cents": b["revenue_cents"].cast(pa.int64()),
                "o_orderdate": b["o_orderdate"],
                "o_orderpriority": b["o_orderpriority"],
            }
        ),
        batch_format="pyarrow",
    )
    cand = per_order.map_batches(
        partial(_q3_topk_block, k=k), batch_format="pyarrow"
    )
    merged = pa.concat_tables(
        [t for t in cand.iter_batches(batch_size=None, batch_format="pyarrow") if len(t)]
    )
    if len(merged) == 0:
        return merged
    order = pc.sort_indices(
        merged,
        sort_keys=[("revenue_cents", "descending"), ("l_orderkey", "ascending")],
    )
    return merged.take(order[: min(k, len(merged))])


# ------------------------------------------------- EXISTS / NOT EXISTS
def _priority_partial(batch: pa.Table) -> pa.Table:
    cents = _cents(batch["o_totalprice"].to_numpy().astype(np.float64))
    t = pa.table(
        {
            "o_orderpriority": batch["o_orderpriority"],
            "n_orders": pa.array(np.ones(len(batch), dtype=np.int64)),
            "total_cents": pa.array(cents, type=pa.int64()),
        }
    )
    agg = t.group_by("o_orderpriority", use_threads=False).aggregate(
        [("n_orders", "sum"), ("total_cents", "sum")]
    )
    return agg.rename_columns(["o_orderpriority", "n_orders", "total_cents"])


def returned_order_priority(orders_ds, lineitem_ds,
                            n_partitions: int | None = None):
    """TPC-H Q4 shape (EXISTS): orders having >= 1 returned lineitem
    (l_returnflag = 'R'), rolled up per o_orderpriority as
    (n_orders, total_cents).

    The big side (lineitem) is filtered + projected to bare orderkeys
    and deduplicated map-side before the single semi-join shuffle —
    the exchange carries one key row per (block, distinct orderkey),
    never lineitems.  The rollup is the usual partial-then-groupby."""
    from ray.data.aggregate import Sum

    from chearch_ray.stages.joins import hash_semi_join

    returned = lineitem_ds.filter(expr="l_returnflag == 'R'").map_batches(
        lambda b: pa.table({"l_orderkey": b["l_orderkey"].cast(pa.int64())}),
        batch_format="pyarrow",
    )
    hits = hash_semi_join(
        orders_ds, returned, on="o_orderkey", right_on="l_orderkey",
        payload=["o_orderpriority", "o_totalprice"], n_partitions=n_partitions,
    )
    partials = hits.map_batches(_priority_partial, batch_format="pyarrow")
    return partials.groupby("o_orderpriority").aggregate(
        Sum("n_orders", alias_name="n_orders"),
        Sum("total_cents", alias_name="total_cents"),
    )


def _recent_custkeys(batch: pa.Table, since_us: int) -> pa.Table:
    od = batch["o_orderdate"]
    if isinstance(od, pa.ChunkedArray):
        od = od.combine_chunks()
    keep = np.asarray(od.cast(pa.int64())) >= since_us
    return pa.table(
        {"o_custkey": batch["o_custkey"].to_numpy()[keep].astype(np.int64)}
    )


def inactive_customer_segments(customer_ds, orders_ds,
                               since: str = "1998-01-01",
                               n_partitions: int | None = None):
    """NOT EXISTS shape (churn): customers with NO order since `since`,
    rolled up per market segment as (n_customers, sum_acctbal_cents) —
    the anti-join twin of `returned_order_priority`, same
    single-shuffle membership pass with the probe side filtered +
    deduplicated map-side."""
    from ray.data.aggregate import Sum

    from chearch_ray.stages.joins import hash_anti_join

    since_us = int(np.datetime64(since, "us").astype(np.int64))
    order_keys = orders_ds.map_batches(
        partial(_recent_custkeys, since_us=since_us), batch_format="pyarrow",
    )
    silent = hash_anti_join(
        customer_ds, order_keys, on="c_custkey", right_on="o_custkey",
        payload=["c_mktsegment", "c_acctbal"], n_partitions=n_partitions,
    )

    def seg_partial(batch: pa.Table) -> pa.Table:
        cents = _cents(batch["c_acctbal"].to_numpy().astype(np.float64))
        t = pa.table(
            {
                "c_mktsegment": batch["c_mktsegment"],
                "n_customers": pa.array(np.ones(len(batch), dtype=np.int64)),
                "acctbal_cents": pa.array(cents, type=pa.int64()),
            }
        )
        agg = t.group_by("c_mktsegment", use_threads=False).aggregate(
            [("n_customers", "sum"), ("acctbal_cents", "sum")]
        )
        return agg.rename_columns(["c_mktsegment", "n_customers", "acctbal_cents"])

    partials = silent.map_batches(seg_partial, batch_format="pyarrow")
    out = partials.groupby("c_mktsegment").aggregate(
        Sum("n_customers", alias_name="n_customers"),
        Sum("acctbal_cents", alias_name="acctbal_cents"),
    )
    # one execution: a `if out.count()` guard would run the whole plan
    # TWICE (count pass + fetch pass) — gather first, test after
    parts = [b for b in out.iter_batches(batch_size=None, batch_format="pyarrow")
             if len(b)]
    if not parts:
        # schema-stable empty result (groupby over zero rows loses it)
        return pa.table({"c_mktsegment": pa.array([], type=pa.string()),
                         "n_customers": pa.array([], type=pa.int64()),
                         "acctbal_cents": pa.array([], type=pa.int64())})
    return pa.concat_tables(parts)



# ------------------------------------------------------------- Q5 shape
def _date_range_orders(batch: pa.Table, d1_us: int, d2_us: int) -> pa.Table:
    od = batch["o_orderdate"]
    if isinstance(od, pa.ChunkedArray):
        od = od.combine_chunks()
    us = np.asarray(od.cast(pa.int64()))
    b = batch.filter(pa.array((us >= d1_us) & (us < d2_us)))
    return pa.table(
        {
            "o_orderkey": b["o_orderkey"].cast(pa.int64()),
            "o_custkey": b["o_custkey"].cast(pa.int64()),
        }
    )


def _rev_cents_partial(batch: pa.Table, key_col: str, out_key: str) -> pa.Table:
    """(key, rev_cents) per-block partial: integer-cent revenue
    `round(extendedprice * (1-discount) * 100)` grouped by key — the
    join/merge moves one row per (block, key), never one per lineitem."""
    price = batch["l_extendedprice"].to_numpy().astype(np.float64)
    disc = batch["l_discount"].to_numpy().astype(np.float64)
    t = pa.table(
        {
            out_key: batch[key_col].cast(pa.int64()),
            "rev_cents": pa.array(
                _round_half_away(price * (1.0 - disc) * 100), type=pa.int64()
            ),
        }
    )
    agg = t.group_by(out_key, use_threads=False).aggregate([("rev_cents", "sum")])
    return agg.rename_columns([out_key, "rev_cents"])


def local_supplier_volume(lineitem_ds, orders_ds, customer_ds, supplier_ds,
                          nation_table: pa.Table, region_table: pa.Table,
                          region: str = "ASIA", d1: str = "1996-01-01",
                          d2: str = "1997-01-01",
                          join_partitions: int | None = None) -> pa.Table:
    """TPC-H Q5 shape: revenue per nation from lineitems whose customer
    and supplier share a nation inside `region`, orders within [d1,d2)
    -> (n_name, revenue_cents), revenue desc then n_name asc.

    Scale shape: region⨝nation is driver algebra (<=25+5 rows);
    customer and supplier are unique-key DIMENSION sides riding the
    gated broadcast_lookup_join; the one big-big edge
    (lineitem ⨝ orders) carries a date-filtered (o_orderkey,
    c_nationkey) right side, and rows leave each lineitem block
    pre-reduced to (nationkey, cents) partials (<=|nations| rows per
    block) before the gated rollup merge."""
    from chearch_ray.stages.joins import broadcast_lookup_join

    rk = region_table.filter(
        pc.equal(region_table["r_name"], region)
    )["r_regionkey"].to_numpy().astype(np.int64)
    nat = nation_table.filter(
        pa.array(np.isin(nation_table["n_regionkey"].to_numpy().astype(np.int64), rk))
    )
    nkeys = nat["n_nationkey"].to_numpy().astype(np.int64)
    order = np.argsort(nkeys)
    nkeys = nkeys[order]
    nnames = (nat["n_name"].combine_chunks()
              if isinstance(nat["n_name"], pa.ChunkedArray) else nat["n_name"]
              ).take(pa.array(order, type=pa.int64()))

    d1_us = int(np.datetime64(d1, "us").astype(np.int64))
    d2_us = int(np.datetime64(d2, "us").astype(np.int64))
    orders_f = orders_ds.map_batches(
        partial(_date_range_orders, d1_us=d1_us, d2_us=d2_us),
        batch_format="pyarrow",
    )
    cust = customer_ds.map_batches(
        lambda b: pa.table({"c_custkey": b["c_custkey"].cast(pa.int64()),
                            "c_nationkey": b["c_nationkey"].cast(pa.int64())}),
        batch_format="pyarrow",
    )
    orders_n = broadcast_lookup_join(
        orders_f, cust, on="o_custkey", right_on="c_custkey",
        payload=["c_nationkey"], n_partitions=join_partitions,
    )

    def in_region(b: pa.Table, keys=nkeys) -> pa.Table:
        # prune to in-region customers BEFORE the lineitem edge
        m = np.isin(b["c_nationkey"].to_numpy(), keys)
        b = b.filter(pa.array(m))
        return b.select(["o_orderkey", "c_nationkey"])

    orders_n = orders_n.map_batches(in_region, batch_format="pyarrow")

    line = lineitem_ds.map_batches(
        lambda b: pa.table(
            {
                "l_orderkey": b["l_orderkey"].cast(pa.int64()),
                "l_suppkey": b["l_suppkey"].cast(pa.int64()),
                "l_extendedprice": b["l_extendedprice"],
                "l_discount": b["l_discount"],
            }
        ),
        batch_format="pyarrow",
    )
    l2 = broadcast_lookup_join(
        line, orders_n, on="l_orderkey", right_on="o_orderkey",
        payload=["c_nationkey"], n_partitions=join_partitions,
    )
    supp = supplier_ds.map_batches(
        lambda b: pa.table({"s_suppkey": b["s_suppkey"].cast(pa.int64()),
                            "s_nationkey": b["s_nationkey"].cast(pa.int64())}),
        batch_format="pyarrow",
    )
    l3 = broadcast_lookup_join(
        l2, supp, on="l_suppkey", right_on="s_suppkey",
        payload=["s_nationkey"], n_partitions=join_partitions,
    )

    def same_nation_partial(b: pa.Table) -> pa.Table:
        m = b["c_nationkey"].to_numpy() == b["s_nationkey"].to_numpy()
        b = b.filter(pa.array(m))
        return _rev_cents_partial(b, "s_nationkey", "nationkey")

    partials = l3.map_batches(same_nation_partial, batch_format="pyarrow")
    merged = _gated_group_sum(partials, ["nationkey"], ["rev_cents"])
    # attach names driver-side (<=25 rows) and order (revenue desc, name asc)
    k = merged["nationkey"].to_numpy().astype(np.int64)
    pos = np.searchsorted(nkeys, k)
    out = pa.table(
        {
            "n_name": nnames.take(pa.array(pos, type=pa.int64())),
            "revenue_cents": merged["rev_cents"].cast(pa.int64()),
        }
    )
    return out.take(pc.sort_indices(
        out, sort_keys=[("revenue_cents", "descending"), ("n_name", "ascending")]
    ))


# ------------------------------------------------------------ Q10 shape
def returned_item_revenue(lineitem_ds, orders_ds, customer_ds,
                          nation_table: pa.Table, d1: str = "1996-10-01",
                          d2: str = "1997-01-01", k: int = 20,
                          join_partitions: int | None = None) -> pa.Table:
    """TPC-H Q10 shape: top-k customers by revenue from RETURNED items
    (l_returnflag='R') on orders within [d1,d2) -> (c_custkey, c_name,
    revenue_cents, acctbal_cents, n_name), revenue desc then custkey.

    Scale shape: lineitem reduces per block to (orderkey, cents)
    partials before the gated join against date-filtered orders; the
    per-customer rollup merges gated (<= |customers| rows); only the
    k winners' customer rows are fetched (bounded k-row gather) and
    nation attaches driver-side from the 25-row table."""
    from chearch_ray.stages.joins import broadcast_lookup_join

    d1_us = int(np.datetime64(d1, "us").astype(np.int64))
    d2_us = int(np.datetime64(d2, "us").astype(np.int64))
    orders_f = orders_ds.map_batches(
        partial(_date_range_orders, d1_us=d1_us, d2_us=d2_us),
        batch_format="pyarrow",
    )

    def returned_partial(b: pa.Table) -> pa.Table:
        m = pc.equal(b["l_returnflag"], "R")
        return _rev_cents_partial(b.filter(m), "l_orderkey", "l_orderkey")

    line = lineitem_ds.map_batches(returned_partial, batch_format="pyarrow")
    l2 = broadcast_lookup_join(
        line, orders_f, on="l_orderkey", right_on="o_orderkey",
        payload=["o_custkey"], n_partitions=join_partitions,
    )

    def per_cust_partial(b: pa.Table) -> pa.Table:
        agg = b.select(["o_custkey", "rev_cents"]).group_by(
            "o_custkey", use_threads=False
        ).aggregate([("rev_cents", "sum")])
        return agg.rename_columns(["o_custkey", "rev_cents"])

    partials = l2.map_batches(per_cust_partial, batch_format="pyarrow")
    merged = _gated_group_sum(partials, ["o_custkey"], ["rev_cents"])
    order = pc.sort_indices(
        merged, sort_keys=[("rev_cents", "descending"), ("o_custkey", "ascending")]
    )
    top = merged.take(order[:k])
    winners = top["o_custkey"].to_numpy().astype(np.int64)

    # bounded gather: exactly the k winners' customer rows
    def winner_rows(b: pa.Table, keys=winners) -> pa.Table:
        m = np.isin(b["c_custkey"].to_numpy().astype(np.int64), keys)
        b = b.filter(pa.array(m))
        return pa.table(
            {
                "c_custkey": b["c_custkey"].cast(pa.int64()),
                "c_name": b["c_name"],
                "c_acctbal": b["c_acctbal"],
                "c_nationkey": b["c_nationkey"].cast(pa.int64()),
            }
        )

    parts = [t for t in customer_ds.map_batches(winner_rows, batch_format="pyarrow")
             .iter_batches(batch_size=None, batch_format="pyarrow") if len(t)]
    cust = (pa.concat_tables(parts).combine_chunks() if parts
            else pa.table({"c_custkey": pa.array([], pa.int64()),
                           "c_name": pa.array([], pa.string()),
                           "c_acctbal": pa.array([], pa.float64()),
                           "c_nationkey": pa.array([], pa.int64())}))
    ckeys = cust["c_custkey"].to_numpy().astype(np.int64)
    corder = np.argsort(ckeys)
    pos = corder[np.searchsorted(ckeys[corder], winners)]
    cust = cust.take(pa.array(pos, type=pa.int64()))

    nkeys = nation_table["n_nationkey"].to_numpy().astype(np.int64)
    norder = np.argsort(nkeys)
    nnames = (nation_table["n_name"].combine_chunks()
              if isinstance(nation_table["n_name"], pa.ChunkedArray)
              else nation_table["n_name"])
    npos = norder[np.searchsorted(
        nkeys[norder], cust["c_nationkey"].to_numpy().astype(np.int64)
    )]
    return pa.table(
        {
            "c_custkey": top["o_custkey"].cast(pa.int64()),
            "c_name": cust["c_name"],
            "revenue_cents": top["rev_cents"].cast(pa.int64()),
            "acctbal_cents": pa.array(
                _cents(cust["c_acctbal"].to_numpy().astype(np.float64)),
                type=pa.int64(),
            ),
            "n_name": nnames.take(pa.array(npos, type=pa.int64())),
        }
    )


# ------------------------------------------------------------ Q14 shape
def promo_revenue(lineitem_ds, part_ds, d1: str = "1996-09-01",
                  d2: str = "1996-10-01",
                  join_partitions: int | None = None) -> pa.Table:
    """TPC-H Q14 shape: share of revenue from promotional parts over
    lineitems shipped within [d1,d2) -> ONE row (promo_cents,
    total_cents, promo_pct).  Integer-cent sums keep the row exact;
    promo_pct is the single float division 100*promo/total of the two
    exact int64s, so the SQL mirror is bit-identical.

    Scale shape: part is a unique-key dimension riding the gated
    broadcast_lookup_join; each joined block reduces to ONE (promo,
    total) partial row, merged by the Q6-style bounded driver sum."""
    from chearch_ray.stages.joins import broadcast_lookup_join

    d1_us = int(np.datetime64(d1, "us").astype(np.int64))
    d2_us = int(np.datetime64(d2, "us").astype(np.int64))

    def ship_window(b: pa.Table) -> pa.Table:
        ship = b["l_shipdate"]
        if isinstance(ship, pa.ChunkedArray):
            ship = ship.combine_chunks()
        us = np.asarray(ship.cast(pa.int64()))
        b = b.filter(pa.array((us >= d1_us) & (us < d2_us)))
        return pa.table(
            {
                "l_partkey": b["l_partkey"].cast(pa.int64()),
                "l_extendedprice": b["l_extendedprice"],
                "l_discount": b["l_discount"],
            }
        )

    line = lineitem_ds.map_batches(ship_window, batch_format="pyarrow")
    part_proj = part_ds.map_batches(
        lambda b: pa.table({"p_partkey": b["p_partkey"].cast(pa.int64()),
                            "p_type": b["p_type"]}),
        batch_format="pyarrow",
    )
    joined = broadcast_lookup_join(
        line, part_proj, on="l_partkey", right_on="p_partkey",
        payload=["p_type"], n_partitions=join_partitions,
    )

    def promo_partial(b: pa.Table) -> pa.Table:
        price = b["l_extendedprice"].to_numpy().astype(np.float64)
        disc = b["l_discount"].to_numpy().astype(np.float64)
        cents = _round_half_away(price * (1.0 - disc) * 100)
        promo = np.asarray(pc.equal(b["p_type"], "PROMO"))
        return pa.table(
            {
                "promo_cents": pa.array([int(cents[promo].sum())], type=pa.int64()),
                "total_cents": pa.array([int(cents.sum())], type=pa.int64()),
            }
        )

    partials = joined.map_batches(promo_partial, batch_format="pyarrow")
    promo = total = 0
    # Q6-style bounded driver merge: one 2-int row per block
    for t in partials.iter_batches(batch_size=None, batch_format="pyarrow"):
        if len(t):
            promo += int(np.sum(t["promo_cents"].to_numpy()))
            total += int(np.sum(t["total_cents"].to_numpy()))
    pct = 100.0 * promo / total if total else 0.0
    return pa.table(
        {
            "promo_cents": pa.array([promo], type=pa.int64()),
            "total_cents": pa.array([total], type=pa.int64()),
            "promo_pct": pa.array([pct], type=pa.float64()),
        }
    )


# ----------------------------------------------------------- rollup
def rollup_counts(ds, keys: list[str], sum_columns: list[str] | None = None,
                  sentinel: str = "ALL", mode: str = "rollup",
                  sets: list[tuple[str, ...]] | None = None) -> pa.Table:
    """Multi-level aggregate (SQL GROUP BY ROLLUP / CUBE / GROUPING
    SETS): counts + sums at every prefix level of `keys`
    (mode="rollup"), every key SUBSET (mode="cube"), or exactly the
    caller-supplied `sets` (mode="sets" — each a tuple of kept keys),
    subtotal rows carrying `sentinel` in the rolled-up key columns
    (callers must pick a sentinel absent from the data; the key
    columns must be strings).

    Scale shape: each block emits its partials for ALL grouping sets
    at once (<= (sets * |groups|) rows per block — len(keys)+1 sets
    for rollup, 2^len(keys) for cube; the grand-total set is ONE row),
    then one gated rollup merge; no per-set re-scan of the input and
    never an exchange per set."""
    from itertools import combinations

    sums = list(sum_columns or [])
    if mode == "rollup":
        grouping_sets = [tuple(keys[:level]) for level in range(len(keys), -1, -1)]
    elif mode == "cube":
        grouping_sets = [s for n in range(len(keys), -1, -1)
                         for s in combinations(keys, n)]
    elif mode == "sets":
        if not sets:
            raise ValueError("mode='sets' requires a non-empty `sets` list")
        unknown = {k for s in sets for k in s} - set(keys)
        if unknown:
            raise ValueError(f"sets reference keys not in `keys`: {unknown}")
        grouping_sets = [tuple(s) for s in sets]
    else:
        raise ValueError(f"mode must be 'rollup', 'cube' or 'sets', not {mode!r}")

    def level_partials(b: pa.Table) -> pa.Table:
        cols = {k: b[k] for k in keys}
        cols["n_rows"] = pa.array(np.ones(len(b), dtype=np.int64))
        for c in sums:
            cols[c] = b[c].cast(pa.int64())
        base = pa.table(cols)
        out = []
        for kept in grouping_sets:
            t = base
            for k in keys:
                if k in kept:
                    continue
                t = t.set_column(
                    t.schema.get_field_index(k), k,
                    pa.array(np.full(len(t), sentinel, dtype=object),
                             type=pa.string()),
                )
            agg = t.group_by(keys, use_threads=False).aggregate(
                [("n_rows", "sum")] + [(c, "sum") for c in sums]
            )
            out.append(agg.rename_columns(keys + ["n_rows"] + sums))
        return pa.concat_tables(out)

    partials = ds.map_batches(level_partials, batch_format="pyarrow")
    merged = _gated_group_sum(partials, keys, ["n_rows"] + sums)
    return merged.take(pc.sort_indices(
        merged, sort_keys=[(k, "ascending") for k in keys]
    ))


# ------------------------------------------- Q13 shape (distribution)
def _custkey_count_partial(batch: pa.Table) -> pa.Table:
    t = pa.table(
        {
            "o_custkey": batch["o_custkey"].cast(pa.int64()),
            "n_orders": pa.array(np.ones(len(batch), dtype=np.int64)),
        }
    )
    agg = t.group_by("o_custkey", use_threads=False).aggregate([("n_orders", "sum")])
    return agg.rename_columns(["o_custkey", "n_orders"])


def _count_hist_partial(batch: pa.Table) -> pa.Table:
    vals, cnt = np.unique(batch["n_orders"].to_numpy().astype(np.int64),
                          return_counts=True)
    return pa.table(
        {
            "c_count": pa.array(vals, type=pa.int64()),
            "custdist": pa.array(cnt.astype(np.int64)),
        }
    )


def order_count_distribution(customer_ds, orders_ds,
                             driver_merge_limit: int | None = None) -> pa.Table:
    """TPC-H Q13 shape (LEFT OUTER count distribution): how many
    customers placed exactly k orders, INCLUDING the zero bucket —
    (c_count, custdist), custdist desc / c_count desc.

    Scale shape: per-block (custkey, n) partials; below the driver
    gate they merge driver-side, above it a Ray groupby-Sum produces
    the per-customer counts AS A DATASET and a second bounded partial
    (one histogram row per distinct count per block) merges through
    the usual gated pattern — the unbounded per-customer table never
    lands on the driver.  The zero bucket is |customer| minus the
    matched-customer total (orders' custkeys are a foreign key into
    customer, enforced by the oracle comparison)."""
    from chearch_ray.stages.pack import DRIVER_MERGE_LIMIT

    limit = DRIVER_MERGE_LIMIT if driver_merge_limit is None else driver_merge_limit
    partials = orders_ds.map_batches(_custkey_count_partial,
                                     batch_format="pyarrow").materialize()
    if partials.count() <= limit:
        parts = [t for t in partials.iter_batches(batch_size=None,
                                                  batch_format="pyarrow") if len(t)]
        if parts:
            per_cust = pa.concat_tables(parts).group_by(
                "o_custkey", use_threads=False).aggregate([("n_orders", "sum")])
            counts = per_cust["n_orders_sum"].to_numpy().astype(np.int64)
        else:
            counts = np.empty(0, dtype=np.int64)
        vals, cnt = np.unique(counts, return_counts=True)
        hist = pa.table({"c_count": pa.array(vals, type=pa.int64()),
                         "custdist": pa.array(cnt.astype(np.int64))})
    else:
        from ray.data.aggregate import Sum

        per_cust_ds = partials.groupby("o_custkey").aggregate(
            Sum("n_orders", alias_name="n_orders"))
        hist_partials = per_cust_ds.map_batches(_count_hist_partial,
                                                batch_format="pyarrow")
        hist = _gated_group_sum(hist_partials, ["c_count"], ["custdist"],
                                driver_merge_limit=driver_merge_limit)
    matched = int(pc.sum(hist["custdist"]).as_py() or 0)
    # .materialize().count() — metadata count, single execution (the
    # customer side is consumed ONLY for its row count)
    zero = customer_ds.materialize().count() - matched
    if zero > 0:  # the LEFT JOIN mirror emits no 0 bucket when empty
        hist = pa.concat_tables([
            hist.select(["c_count", "custdist"]),
            pa.table({"c_count": pa.array([0], type=pa.int64()),
                      "custdist": pa.array([zero], type=pa.int64())}),
        ])
    else:
        hist = hist.select(["c_count", "custdist"])
    return hist.take(pc.sort_indices(
        hist, sort_keys=[("custdist", "descending"), ("c_count", "descending")]
    ))


# ------------------------------------------- Q15 shape (equals-max)
def top_revenue_suppliers(lineitem_ds, supplier_ds,
                          d1: str = "1996-01-01", d2: str = "1996-04-01",
                          driver_merge_limit: int | None = None) -> pa.Table:
    """TPC-H Q15 shape: the supplier(s) with MAX total revenue in
    [d1, d2) — aggregate, then keep rows equal to the max (ties kept,
    the reference query's correlated `= (SELECT max(...))`).

    Scale shape: per-block (suppkey, rev_cents) partials merge through
    the gated pattern (supplier is a bounded dimension); the winner
    set (ties at max — a handful of rows) broadcasts via `ray.put`
    and supplier attributes attach in one vectorized map over the
    supplier table."""
    import ray

    d1_us = int(np.datetime64(d1, "us").astype(np.int64))
    d2_us = int(np.datetime64(d2, "us").astype(np.int64))

    def rev_partial(batch: pa.Table) -> pa.Table:
        ship = batch["l_shipdate"]
        if isinstance(ship, pa.ChunkedArray):
            ship = ship.combine_chunks()
        us = np.asarray(ship.cast(pa.int64()))
        b = batch.filter(pa.array((us >= d1_us) & (us < d2_us)))
        return _rev_cents_partial(b, "l_suppkey", "s_suppkey")

    partials = lineitem_ds.map_batches(rev_partial, batch_format="pyarrow")
    per_supp = _gated_group_sum(partials, ["s_suppkey"], ["rev_cents"],
                                driver_merge_limit=driver_merge_limit)
    if not len(per_supp):
        return pa.table({"s_suppkey": pa.array([], type=pa.int64()),
                         "s_name": pa.array([], type=pa.string()),
                         "total_cents": pa.array([], type=pa.int64())})
    rev = per_supp["rev_cents"].to_numpy().astype(np.int64)
    best = int(rev.max())
    win_keys = per_supp["s_suppkey"].to_numpy().astype(np.int64)[rev == best]
    ref = ray.put(np.sort(win_keys))

    def attach(batch: pa.Table) -> pa.Table:
        keys = ray.get(ref) if not isinstance(ref, np.ndarray) else ref
        k = batch["s_suppkey"].to_numpy().astype(np.int64)
        out = batch.filter(pa.array(np.isin(k, keys)))
        return pa.table(
            {
                "s_suppkey": out["s_suppkey"].cast(pa.int64()),
                "s_name": out["s_name"],
                "total_cents": pa.array(
                    np.full(len(out), best, dtype=np.int64)),
            }
        )

    winners = supplier_ds.map_batches(attach, batch_format="pyarrow")
    parts = [t for t in winners.iter_batches(batch_size=None,
                                             batch_format="pyarrow") if len(t)]
    out = pa.concat_tables(parts)
    return out.take(pc.sort_indices(out, sort_keys=[("s_suppkey", "ascending")]))


# ------------------------------------------- Q18 shape (having-sum)
def large_volume_orders(lineitem_ds, orders_ds, customer_ds,
                        min_qty: float = 300.0, k: int = 100,
                        driver_merge_limit: int | None = None) -> pa.Table:
    """TPC-H Q18 shape (GROUP BY ... HAVING SUM > t, then join + top-k):
    orders whose total lineitem quantity exceeds `min_qty`, joined to
    customer, top `k` by (o_totalprice desc, o_orderkey asc).

    Scale shape: per-block (orderkey, qty_cents) partials; below the
    driver gate they merge driver-side, above it a Ray groupby-Sum +
    filter keeps the per-order table distributed and only the
    QUALIFYING keys (HAVING-filtered, a tiny set by construction)
    gather.  Qualifiers broadcast via `ray.put` into one orders map
    pass; customer attaches via the gated dimension lookup join; the
    final top-k is per-block partial top-k then one bounded driver
    merge (<= k rows per block)."""
    import ray

    from chearch_ray.stages.joins import broadcast_lookup_join
    from chearch_ray.stages.pack import DRIVER_MERGE_LIMIT

    limit = DRIVER_MERGE_LIMIT if driver_merge_limit is None else driver_merge_limit
    min_cents = int(round(min_qty * 100))

    def qty_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "l_orderkey": batch["l_orderkey"].cast(pa.int64()),
                "qty_cents": pa.array(
                    _cents(batch["l_quantity"].to_numpy().astype(np.float64)),
                    type=pa.int64(),
                ),
            }
        )
        agg = t.group_by("l_orderkey", use_threads=False).aggregate(
            [("qty_cents", "sum")])
        return agg.rename_columns(["l_orderkey", "qty_cents"])

    partials = lineitem_ds.map_batches(qty_partial,
                                       batch_format="pyarrow").materialize()
    if partials.count() <= limit:
        parts = [t for t in partials.iter_batches(batch_size=None,
                                                  batch_format="pyarrow") if len(t)]
        if parts:
            per_order = pa.concat_tables(parts).group_by(
                "l_orderkey", use_threads=False).aggregate([("qty_cents", "sum")])
            keys = per_order["l_orderkey"].to_numpy().astype(np.int64)
            qty = per_order["qty_cents_sum"].to_numpy().astype(np.int64)
        else:
            keys = qty = np.empty(0, dtype=np.int64)
    else:
        from ray.data.aggregate import Sum

        per_order_ds = partials.groupby("l_orderkey").aggregate(
            Sum("qty_cents", alias_name="qty_cents"))
        big = per_order_ds.filter(expr=f"qty_cents > {min_cents}")
        parts = [t for t in big.iter_batches(batch_size=None,
                                             batch_format="pyarrow") if len(t)]
        tbl = (pa.concat_tables(parts) if parts
               else pa.table({"l_orderkey": pa.array([], type=pa.int64()),
                              "qty_cents": pa.array([], type=pa.int64())}))
        keys = tbl["l_orderkey"].to_numpy().astype(np.int64)
        qty = tbl["qty_cents"].to_numpy().astype(np.int64)
    sel = qty > min_cents
    keys, qty = keys[sel], qty[sel]
    order = np.argsort(keys, kind="stable")
    keys, qty = keys[order], qty[order]
    ref = ray.put((keys, qty))

    def orders_hit(batch: pa.Table) -> pa.Table:
        bk, bq = ray.get(ref) if not isinstance(ref, tuple) else ref
        k_ = batch["o_orderkey"].to_numpy().astype(np.int64)
        pos = np.searchsorted(bk, k_)
        posc = np.minimum(pos, max(len(bk) - 1, 0))
        hit = (bk[posc] == k_) if len(bk) else np.zeros(len(k_), dtype=bool)
        out = batch.filter(pa.array(hit))
        return pa.table(
            {
                "o_orderkey": out["o_orderkey"].cast(pa.int64()),
                "o_custkey": out["o_custkey"].cast(pa.int64()),
                "total_cents": pa.array(
                    _cents(out["o_totalprice"].to_numpy().astype(np.float64)),
                    type=pa.int64(),
                ),
                "sum_qty_cents": pa.array(bq[posc[hit]] if len(bk)
                                          else np.empty(0, np.int64),
                                          type=pa.int64()),
            }
        )

    hits = orders_ds.map_batches(orders_hit, batch_format="pyarrow")
    named = broadcast_lookup_join(hits, customer_ds, on="o_custkey",
                                  right_on="c_custkey", payload=["c_name"])

    def topk_block(batch: pa.Table) -> pa.Table:
        if len(batch) <= k:
            return batch
        idx = pc.sort_indices(batch, sort_keys=[("total_cents", "descending"),
                                                ("o_orderkey", "ascending")])
        return batch.take(idx.slice(0, k))

    parts = [t for t in named.map_batches(topk_block, batch_format="pyarrow")
             .iter_batches(batch_size=None, batch_format="pyarrow") if len(t)]
    cols = ["c_name", "o_custkey", "o_orderkey", "total_cents", "sum_qty_cents"]
    if not parts:
        return pa.table({"c_name": pa.array([], type=pa.string()),
                         "o_custkey": pa.array([], type=pa.int64()),
                         "o_orderkey": pa.array([], type=pa.int64()),
                         "total_cents": pa.array([], type=pa.int64()),
                         "sum_qty_cents": pa.array([], type=pa.int64())})
    merged = pa.concat_tables([t.select(cols) for t in parts])
    idx = pc.sort_indices(merged, sort_keys=[("total_cents", "descending"),
                                             ("o_orderkey", "ascending")])
    return merged.take(idx.slice(0, min(k, len(merged))))


# ------------------------------------------- Q19 shape (disjunctive)
#: (brand, qty_min, qty_max, size_min, size_max) inclusive windows
DISJUNCTIVE_SPECS = (
    ("Brand#1", 1.0, 11.0, 1, 5),
    ("Brand#2", 10.0, 20.0, 1, 10),
    ("Brand#3", 20.0, 30.0, 1, 15),
)


def disjunctive_revenue(lineitem_ds, part_ds,
                        specs=DISJUNCTIVE_SPECS) -> pa.Table:
    """TPC-H Q19 shape (OR of conjunctive predicate windows across a
    join): revenue over lineitems whose part matches ANY
    (brand, quantity window, size window) spec — one output row
    (n_items, rev_cents).

    Scale shape: part attributes attach via the gated dimension
    lookup join (broadcast below 2M rows, Dataset.join above); the
    disjunction evaluates vectorized per block; partials are ONE row
    per block, merged driver-side (whitelisted bounded gather)."""
    from chearch_ray.stages.joins import broadcast_lookup_join

    joined = broadcast_lookup_join(lineitem_ds, part_ds, on="l_partkey",
                                   right_on="p_partkey",
                                   payload=["p_brand", "p_size"])

    def block_partial(batch: pa.Table) -> pa.Table:
        qty = batch["l_quantity"].to_numpy().astype(np.float64)
        size = batch["p_size"].to_numpy().astype(np.int64)
        brand = batch["p_brand"].to_numpy(zero_copy_only=False)
        mask = np.zeros(len(batch), dtype=bool)
        for b, q1, q2, s1, s2 in specs:
            mask |= ((brand == b) & (qty >= q1) & (qty <= q2)
                     & (size >= s1) & (size <= s2))
        price = batch["l_extendedprice"].to_numpy().astype(np.float64)[mask]
        disc = batch["l_discount"].to_numpy().astype(np.float64)[mask]
        rev = int(_round_half_away(price * (1.0 - disc) * 100).sum())
        return pa.table({"n_items": pa.array([int(mask.sum())], type=pa.int64()),
                         "rev_cents": pa.array([rev], type=pa.int64())})

    parts = [t for t in joined.map_batches(block_partial, batch_format="pyarrow")
             .iter_batches(batch_size=None, batch_format="pyarrow") if len(t)]
    if not parts:
        return pa.table({"n_items": pa.array([0], type=pa.int64()),
                         "rev_cents": pa.array([0], type=pa.int64())})
    merged = pa.concat_tables(parts)
    return pa.table(
        {
            "n_items": pa.array([int(pc.sum(merged["n_items"]).as_py() or 0)],
                                type=pa.int64()),
            "rev_cents": pa.array([int(pc.sum(merged["rev_cents"]).as_py() or 0)],
                                  type=pa.int64()),
        }
    )


# ------------------------------------------- Q22 shape (scalar subquery)
def wealthy_inactive_customers(customer_ds, orders_ds,
                               since: str = "1999-01-01",
                               n_partitions: int | None = None) -> pa.Table:
    """TPC-H Q22 shape (scalar AVG subquery + NOT EXISTS): customers
    whose account balance exceeds the positive-balance average AND who
    placed no order on/after `since` (Q22's seven-year window), rolled
    up per market segment as (n_customers, acctbal_cents).

    The average never materializes as a float: the filter compares
    cents * n > sum_cents in exact int64 cross-multiplication (the
    significant_terms trick), and the SQL mirror is written the same
    way, so both sides are bit-exact.  Scale shape: pass 1 emits ONE
    (sum, count) row per block (whitelisted bounded gather); pass 2 is
    the standard map-side-deduped anti-join + gated segment rollup."""
    from chearch_ray.stages.joins import hash_anti_join

    def avg_partial(batch: pa.Table) -> pa.Table:
        bal = batch["c_acctbal"].to_numpy().astype(np.float64)
        pos = bal > 0.0
        return pa.table(
            {
                "sum_cents": pa.array([int(_cents(bal[pos]).sum())],
                                      type=pa.int64()),
                "n_pos": pa.array([int(pos.sum())], type=pa.int64()),
            }
        )

    parts = [t for t in customer_ds.map_batches(avg_partial,
                                                batch_format="pyarrow")
             .iter_batches(batch_size=None, batch_format="pyarrow") if len(t)]
    merged = pa.concat_tables(parts) if parts else None
    s = int(pc.sum(merged["sum_cents"]).as_py() or 0) if merged is not None else 0
    n = int(pc.sum(merged["n_pos"]).as_py() or 0) if merged is not None else 0

    def wealthy_filter(batch: pa.Table) -> pa.Table:
        cents = _cents(batch["c_acctbal"].to_numpy().astype(np.float64))
        keep = cents * n > s
        out = batch.filter(pa.array(keep))
        return pa.table(
            {
                "c_custkey": out["c_custkey"].cast(pa.int64()),
                "c_mktsegment": out["c_mktsegment"],
                "acctbal_cents": pa.array(cents[keep], type=pa.int64()),
            }
        )

    wealthy = customer_ds.map_batches(wealthy_filter, batch_format="pyarrow")
    since_us = int(np.datetime64(since, "us").astype(np.int64))
    order_keys = orders_ds.map_batches(
        partial(_recent_custkeys, since_us=since_us), batch_format="pyarrow",
    )
    silent = hash_anti_join(wealthy, order_keys, on="c_custkey",
                            right_on="o_custkey",
                            payload=["c_mktsegment", "acctbal_cents"],
                            n_partitions=n_partitions)

    def seg_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "c_mktsegment": batch["c_mktsegment"],
                "n_customers": pa.array(np.ones(len(batch), dtype=np.int64)),
                "acctbal_cents": batch["acctbal_cents"].cast(pa.int64()),
            }
        )
        agg = t.group_by("c_mktsegment", use_threads=False).aggregate(
            [("n_customers", "sum"), ("acctbal_cents", "sum")])
        return agg.rename_columns(["c_mktsegment", "n_customers", "acctbal_cents"])

    partials = silent.map_batches(seg_partial, batch_format="pyarrow")
    out = _gated_group_sum(partials, ["c_mktsegment"],
                           ["n_customers", "acctbal_cents"])
    if out is None or not len(out):
        return pa.table({"c_mktsegment": pa.array([], type=pa.string()),
                         "n_customers": pa.array([], type=pa.int64()),
                         "acctbal_cents": pa.array([], type=pa.int64())})
    return out.take(pc.sort_indices(out, sort_keys=[("c_mktsegment", "ascending")]))


# ------------------------------------------- statistical aggregates
def grouped_value_stats(ds, key: str, value: str,
                        driver_merge_limit: int | None = None) -> pa.Table:
    """Per-group descriptive statistics (n, sum_cents, sumsq_cents2,
    mean_value, var_pop) with an EXACT float contract: the integer
    cent sums merge exactly (order-independent), and mean/variance are
    each ONE float expression over those int64s, written identically
    in the SQL mirror — so the doubles are bit-identical.

    Scale shape: one partial row per (block, group), gated merge.
    int64 bound: sum(cents^2) overflows past ~2^63 / max_cents^2 rows
    per group (~4e9 rows at cents<=5e4); callers with larger groups
    should bucket first."""
    def stats_partial(batch: pa.Table) -> pa.Table:
        cents = _cents(batch[value].to_numpy().astype(np.float64))
        t = pa.table(
            {
                key: batch[key],
                "n": pa.array(np.ones(len(batch), dtype=np.int64)),
                "sum_cents": pa.array(cents, type=pa.int64()),
                "sumsq_cents2": pa.array(cents * cents, type=pa.int64()),
            }
        )
        agg = t.group_by(key, use_threads=False).aggregate(
            [("n", "sum"), ("sum_cents", "sum"), ("sumsq_cents2", "sum")])
        return agg.rename_columns([key, "n", "sum_cents", "sumsq_cents2"])

    partials = ds.map_batches(stats_partial, batch_format="pyarrow")
    out = _gated_group_sum(partials, [key], ["n", "sum_cents", "sumsq_cents2"],
                           driver_merge_limit=driver_merge_limit)
    if out is None or not len(out):
        return pa.table({key: pa.array([], type=pa.string()),
                         "n": pa.array([], type=pa.int64()),
                         "sum_cents": pa.array([], type=pa.int64()),
                         "sumsq_cents2": pa.array([], type=pa.int64()),
                         "mean_value": pa.array([], type=pa.float64()),
                         "var_pop": pa.array([], type=pa.float64())})
    n = out["n"].to_numpy().astype(np.int64)
    s = out["sum_cents"].to_numpy().astype(np.int64)
    q = out["sumsq_cents2"].to_numpy().astype(np.int64)
    # EXACT float contract: same expressions, same order, as the SQL
    # mirror (int64/int64 -> float64 division on both sides)
    mean = s / n / 100.0
    var = q / n / 10000.0 - (s / n / 100.0) * (s / n / 100.0)
    out = out.append_column("mean_value", pa.array(mean, type=pa.float64()))
    out = out.append_column("var_pop", pa.array(var, type=pa.float64()))
    return out.take(pc.sort_indices(out, sort_keys=[(key, "ascending")]))


def pearson_corr_cents(ds, x: str, y: str) -> pa.Table:
    """Pearson correlation of two numeric columns with an EXACT float
    contract: per-block moment partials (n, sx, sy, sxx, syy, sxy over
    integer cents — accumulated exactly via `_exact_sum_prod` and
    carried as decimal128(38,0), so no magnitude wraps int64) merge in
    arbitrary-precision Python ints driver-side (one row per block —
    whitelisted bounded gather); the SQL mirror carries the same
    moments in HUGEINT; both sides then
    evaluate ONE identical float expression
    (n*sxy - sx*sy) / (sqrt(n*sxx - sx^2) * sqrt(n*syy - sy^2)),
    so the double is bit-identical (IEEE sqrt/division are exact)."""
    import math

    def moment_partial(batch: pa.Table) -> pa.Table:
        xc = _cents(batch[x].to_numpy().astype(np.float64))
        yc = _cents(batch[y].to_numpy().astype(np.float64))
        return pa.table(
            {
                "n": pa.array([len(batch)], type=pa.int64()),
                "sx": pa.array([_exact_sum_prod(xc)], type=_MOMENT_TYPE),
                "sy": pa.array([_exact_sum_prod(yc)], type=_MOMENT_TYPE),
                "sxx": pa.array([_exact_sum_prod(xc, xc)], type=_MOMENT_TYPE),
                "syy": pa.array([_exact_sum_prod(yc, yc)], type=_MOMENT_TYPE),
                "sxy": pa.array([_exact_sum_prod(xc, yc)], type=_MOMENT_TYPE),
            }
        )

    parts = [t for t in ds.map_batches(moment_partial, batch_format="pyarrow")
             .iter_batches(batch_size=None, batch_format="pyarrow") if len(t)]
    n = sx = sy = sxx = syy = sxy = 0
    for t in parts:  # Python ints: no overflow at any block count
        n += int(pc.sum(t["n"]).as_py())
        sx += int(pc.sum(t["sx"]).as_py())
        sy += int(pc.sum(t["sy"]).as_py())
        sxx += int(pc.sum(t["sxx"]).as_py())
        syy += int(pc.sum(t["syy"]).as_py())
        sxy += int(pc.sum(t["sxy"]).as_py())
    den = math.sqrt(float(n * sxx - sx * sx)) * math.sqrt(float(n * syy - sy * sy))
    r = float(n * sxy - sx * sy) / den if den else 0.0
    return pa.table(
        {
            "n": pa.array([n], type=pa.int64()),
            "sx_cents": pa.array([sx], type=pa.int64()),
            "sy_cents": pa.array([sy], type=pa.int64()),
            "corr": pa.array([r], type=pa.float64()),
        }
    )


# ------------------------------------------------------------- pivot
def pivot_counts(ds, row_key: str, col_key: str, col_values: list[str],
                 driver_merge_limit: int | None = None) -> pa.Table:
    """Crosstab (SQL PIVOT / conditional aggregation): one row per
    `row_key` value, one int64 count column per entry of `col_values`
    (a FIXED enumeration the caller supplies — at scale the column set
    must be known up front, not discovered) plus a `total` column.
    Column names are `n_<value>`.

    Scale shape: each block emits <= |row groups| rows with the full
    count-column set (vectorized == comparisons per col value), then
    one gated merge keyed by row_key."""
    count_cols = [f"n_{v}" for v in col_values] + ["total"]

    def pivot_partial(batch: pa.Table) -> pa.Table:
        col = batch[col_key].to_numpy(zero_copy_only=False)
        cols = {row_key: batch[row_key]}
        for v, name in zip(col_values, count_cols):
            cols[name] = pa.array((col == v).astype(np.int64))
        cols["total"] = pa.array(np.ones(len(batch), dtype=np.int64))
        t = pa.table(cols)
        agg = t.group_by(row_key, use_threads=False).aggregate(
            [(c, "sum") for c in count_cols])
        return agg.rename_columns([row_key] + count_cols)

    partials = ds.map_batches(pivot_partial, batch_format="pyarrow")
    out = _gated_group_sum(partials, [row_key], count_cols,
                           driver_merge_limit=driver_merge_limit)
    if out is None or not len(out):
        return pa.table({row_key: pa.array([], type=pa.string()),
                         **{c: pa.array([], type=pa.int64())
                            for c in count_cols}})
    return out.take(pc.sort_indices(out, sort_keys=[(row_key, "ascending")]))


# ------------------------------------------------- JSON field extract
def json_int_field_agg(ds, json_column: str, field: str, by: str,
                       driver_merge_limit: int | None = None) -> pa.Table:
    """Extract an integer field from a JSON-string column (RE2
    `"<field>"\\s*:\\s*(-?\\d+)` — the vectorized scale path for flat
    numeric props; the SQL mirror uses real json_extract, equal on
    well-formed input) and aggregate per `by` group:
    (by, n_with_field, sum_field, min_field, max_field).

    Scale shape: one extract + groupby partial per block (<= |groups|
    rows), gated merge; min/max merge as min-of-mins / max-of-maxes."""
    pattern = f'"{field}"\\s*:\\s*(?P<v>-?\\d+)'

    def extract_partial(batch: pa.Table) -> pa.Table:
        col = batch[json_column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        m = pc.extract_regex(col, pattern)
        vals = pc.struct_field(m, "v")
        ok = pc.is_valid(vals)
        # pure Arrow: null slots become "0" then cast (they are dropped
        # by `keep` anyway) — no pandas round-trip in the hot kernel
        v = pc.cast(pc.if_else(ok, vals, "0"), pa.int64()).to_numpy()
        keep = ok.to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                by: batch[by].filter(pa.array(keep)) if not keep.all() else batch[by],
                "n_with_field": pa.array(np.ones(int(keep.sum()), dtype=np.int64)),
                "sum_field": pa.array(v[keep], type=pa.int64()),
                "min_field": pa.array(v[keep], type=pa.int64()),
                "max_field": pa.array(v[keep], type=pa.int64()),
            }
        )
        agg = t.group_by(by, use_threads=False).aggregate(
            [("n_with_field", "sum"), ("sum_field", "sum"),
             ("min_field", "min"), ("max_field", "max")])
        return agg.rename_columns([by, "n_with_field", "sum_field",
                                   "min_field", "max_field"])

    partials = ds.map_batches(extract_partial, batch_format="pyarrow")
    # min/max need min/max-merge, not sum: merge driver-side below the
    # gate, Ray groupby with per-aggregate functions above it
    from chearch_ray.stages.pack import DRIVER_MERGE_LIMIT

    limit = DRIVER_MERGE_LIMIT if driver_merge_limit is None else driver_merge_limit
    mat = partials.materialize()
    if mat.count() <= limit:
        parts = [t for t in mat.iter_batches(batch_size=None,
                                             batch_format="pyarrow") if len(t)]
        if not parts:
            return pa.table({by: pa.array([], type=pa.string()),
                             "n_with_field": pa.array([], type=pa.int64()),
                             "sum_field": pa.array([], type=pa.int64()),
                             "min_field": pa.array([], type=pa.int64()),
                             "max_field": pa.array([], type=pa.int64())})
        agg = pa.concat_tables(parts).group_by(by, use_threads=False).aggregate(
            [("n_with_field", "sum"), ("sum_field", "sum"),
             ("min_field", "min"), ("max_field", "max")])
        out = agg.rename_columns([by, "n_with_field", "sum_field",
                                  "min_field", "max_field"])
    else:
        from ray.data.aggregate import Max, Min, Sum

        merged = mat.groupby(by).aggregate(
            Sum("n_with_field", alias_name="n_with_field"),
            Sum("sum_field", alias_name="sum_field"),
            Min("min_field", alias_name="min_field"),
            Max("max_field", alias_name="max_field"),
        )
        out = pa.concat_tables(
            merged.iter_batches(batch_size=None, batch_format="pyarrow")
        ).select([by, "n_with_field", "sum_field", "min_field", "max_field"])
    return out.take(pc.sort_indices(out, sort_keys=[(by, "ascending")]))


# ------------------------------------------------------ mode per group
def mode_per_group(ds, by: str, col: str,
                   driver_merge_limit: int | None = None) -> pa.Table:
    """Most frequent `col` value per `by` group (ties -> smallest
    value): (by, mode_value, n_occurrences).

    Scale shape: (by, col) pair-count partials per block (bounded by
    the pair cardinality — callers use this for categorical columns),
    gated merge, then a vectorized per-group argmax."""
    def pair_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({by: batch[by], col: batch[col],
                      "n": pa.array(np.ones(len(batch), dtype=np.int64))})
        agg = t.group_by([by, col], use_threads=False).aggregate([("n", "sum")])
        return agg.rename_columns([by, col, "n"])

    partials = ds.map_batches(pair_partial, batch_format="pyarrow")
    pairs = _gated_group_sum(partials, [by, col], ["n"],
                             driver_merge_limit=driver_merge_limit)
    if pairs is None or not len(pairs):
        return pa.table({by: pa.array([], type=pa.string()),
                         "mode_value": pa.array([], type=pa.string()),
                         "n_occurrences": pa.array([], type=pa.int64())})
    # per-group argmax: sort (by asc, n desc, col asc), keep first of
    # each group — vectorized, |pairs| rows total
    idx = pc.sort_indices(pairs, sort_keys=[(by, "ascending"),
                                            ("n", "descending"),
                                            (col, "ascending")])
    s = pairs.take(idx)
    g = s[by].to_numpy(zero_copy_only=False)
    first = np.ones(len(s), dtype=bool)
    first[1:] = g[1:] != g[:-1]
    out = s.filter(pa.array(first))
    return pa.table({by: out[by], "mode_value": out[col],
                     "n_occurrences": out["n"].cast(pa.int64())})


# ------------------------------------------------- fixed-width histogram
def value_histogram(ds, value: str, width: float,
                    driver_merge_limit: int | None = None) -> pa.Table:
    """Fixed-width binned histogram: bin = floor(value / width)
    (IEEE division + floor, mirrored verbatim in SQL), per bin
    (bin, n_rows, sum_cents).  One bounded partial per block, gated
    merge."""
    def hist_partial(batch: pa.Table) -> pa.Table:
        v = batch[value].to_numpy().astype(np.float64)
        t = pa.table(
            {
                "bin": pa.array(np.floor(v / width).astype(np.int64)),
                "n_rows": pa.array(np.ones(len(batch), dtype=np.int64)),
                "sum_cents": pa.array(_cents(v), type=pa.int64()),
            }
        )
        agg = t.group_by("bin", use_threads=False).aggregate(
            [("n_rows", "sum"), ("sum_cents", "sum")])
        return agg.rename_columns(["bin", "n_rows", "sum_cents"])

    partials = ds.map_batches(hist_partial, batch_format="pyarrow")
    out = _gated_group_sum(partials, ["bin"], ["n_rows", "sum_cents"],
                           driver_merge_limit=driver_merge_limit)
    if out is None or not len(out):
        return pa.table({"bin": pa.array([], type=pa.int64()),
                         "n_rows": pa.array([], type=pa.int64()),
                         "sum_cents": pa.array([], type=pa.int64())})
    return out.take(pc.sort_indices(out, sort_keys=[("bin", "ascending")]))


# ----------------------------------------------------- ordered collect
def sorted_distinct_concat(ds, by: str, col: str, sep: str = ",",
                           driver_merge_limit: int | None = None) -> pa.Table:
    """Ordered collect (SQL string_agg(DISTINCT col ORDER BY col)):
    per group, the sorted distinct `col` values joined with `sep`,
    plus the distinct count — (by, n_distinct, concat_values).

    Scale shape: per-block DISTINCT (by, col) pairs (bounded by pair
    cardinality — categorical columns only, like mode_per_group), one
    gated merge, then a vectorized segmented join over the sorted pair
    table."""
    def pair_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({by: batch[by], col: batch[col],
                      "n": pa.array(np.ones(len(batch), dtype=np.int64))})
        agg = t.group_by([by, col], use_threads=False).aggregate([("n", "sum")])
        return agg.rename_columns([by, col, "n"])

    partials = ds.map_batches(pair_partial, batch_format="pyarrow")
    pairs = _gated_group_sum(partials, [by, col], ["n"],
                             driver_merge_limit=driver_merge_limit)
    if pairs is None or not len(pairs):
        return pa.table({by: pa.array([], type=pa.string()),
                         "n_distinct": pa.array([], type=pa.int64()),
                         "concat_values": pa.array([], type=pa.string())})
    idx = pc.sort_indices(pairs, sort_keys=[(by, "ascending"),
                                            (col, "ascending")])
    s = pairs.take(idx)
    g = s[by].to_numpy(zero_copy_only=False)
    v = s[col].to_numpy(zero_copy_only=False)
    first = np.ones(len(s), dtype=bool)
    first[1:] = g[1:] != g[:-1]
    starts = np.flatnonzero(first)
    ends = np.append(starts[1:], len(s))
    groups = g[starts]
    return pa.table(
        {
            by: pa.array(groups, type=pa.string()),
            "n_distinct": pa.array(ends - starts, type=pa.int64()),
            "concat_values": pa.array(
                [sep.join(v[a:b]) for a, b in zip(starts, ends)],
                type=pa.string()),
        }
    )


# ------------------------------------------- Q16 shape (distinct-per-group)
def brand_supplier_counts(lineitem_ds, part_ds,
                          driver_merge_limit: int | None = None) -> pa.Table:
    """TPC-H Q16 shape (count DISTINCT across a dimension join):
    distinct suppliers per part brand — (p_brand, n_suppliers).

    Scale shape: part attributes attach via the gated dimension lookup
    join; each block then emits its DISTINCT (brand, suppkey) pairs
    (bounded by |brands| x |suppliers|), one gated pair merge, then a
    vectorized per-brand distinct count over the pair table."""
    from chearch_ray.stages.joins import broadcast_lookup_join

    joined = broadcast_lookup_join(lineitem_ds, part_ds, on="l_partkey",
                                   right_on="p_partkey", payload=["p_brand"])

    def pair_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"p_brand": batch["p_brand"],
                      "l_suppkey": batch["l_suppkey"].cast(pa.int64()),
                      "n": pa.array(np.ones(len(batch), dtype=np.int64))})
        agg = t.group_by(["p_brand", "l_suppkey"], use_threads=False).aggregate(
            [("n", "sum")])
        return agg.rename_columns(["p_brand", "l_suppkey", "n"])

    partials = joined.map_batches(pair_partial, batch_format="pyarrow")
    pairs = _gated_group_sum(partials, ["p_brand", "l_suppkey"], ["n"],
                             driver_merge_limit=driver_merge_limit)
    if pairs is None or not len(pairs):
        return pa.table({"p_brand": pa.array([], type=pa.string()),
                         "n_suppliers": pa.array([], type=pa.int64())})
    agg = pairs.group_by("p_brand", use_threads=False).aggregate(
        [("l_suppkey", "count")])
    out = agg.rename_columns(["p_brand", "n_suppliers"])
    out = out.set_column(out.schema.get_field_index("n_suppliers"),
                         "n_suppliers", out["n_suppliers"].cast(pa.int64()))
    return out.take(pc.sort_indices(out, sort_keys=[("p_brand", "ascending")]))


# ------------------------------------------- Q11 shape (global-scalar HAVING)
def part_revenue_concentration(lineitem_ds, num: int = 1, denom: int = 1000,
                               driver_merge_limit: int | None = None) -> pa.Table:
    """TPC-H Q11 shape (GROUP BY ... HAVING SUM > fraction * global
    scalar subquery): parts whose revenue exceeds num/denom of TOTAL
    revenue — (l_partkey, rev_cents), rev desc / partkey asc.

    The fraction compare is exact int64 cross-multiplication
    (rev_cents * denom > total_cents * num), mirrored verbatim in the
    SQL.  Scale shape: per-block (partkey, rev_cents) partials; below
    the driver gate they merge driver-side; above it a Ray groupby-Sum
    keeps the per-part table distributed, the global total rides the
    SAME partials as a one-row-per-block driver sum, and only the
    HAVING-qualifying rows (a tiny set by construction) gather."""
    from chearch_ray.stages.pack import DRIVER_MERGE_LIMIT

    limit = DRIVER_MERGE_LIMIT if driver_merge_limit is None else driver_merge_limit
    partials = lineitem_ds.map_batches(
        partial(_rev_cents_partial, key_col="l_partkey", out_key="l_partkey"),
        batch_format="pyarrow").materialize()

    # global total: one int per block off the SAME partials
    total = 0
    for t in partials.iter_batches(batch_size=None, batch_format="pyarrow"):
        if len(t):
            total += int(pc.sum(t["rev_cents"]).as_py())

    if partials.count() <= limit:
        parts = [t for t in partials.iter_batches(batch_size=None,
                                                  batch_format="pyarrow") if len(t)]
        if not parts:
            return pa.table({"l_partkey": pa.array([], type=pa.int64()),
                             "rev_cents": pa.array([], type=pa.int64())})
        per_part = pa.concat_tables(parts).group_by(
            "l_partkey", use_threads=False).aggregate([("rev_cents", "sum")])
        keys = per_part["l_partkey"].to_numpy().astype(np.int64)
        rev = per_part["rev_cents_sum"].to_numpy().astype(np.int64)
    else:
        from ray.data.aggregate import Sum

        per_part_ds = partials.groupby("l_partkey").aggregate(
            Sum("rev_cents", alias_name="rev_cents"))
        # rev*denom > total*num  <=>  rev > (total*num)//denom exactly
        # (both divisible and non-divisible cases), and the simple
        # compare is what Dataset.filter's expr parser supports
        big = per_part_ds.filter(
            expr=f"rev_cents > {(total * num) // denom}")
        parts = [t for t in big.iter_batches(batch_size=None,
                                             batch_format="pyarrow") if len(t)]
        tbl = (pa.concat_tables(parts) if parts
               else pa.table({"l_partkey": pa.array([], type=pa.int64()),
                              "rev_cents": pa.array([], type=pa.int64())}))
        keys = tbl["l_partkey"].to_numpy().astype(np.int64)
        rev = tbl["rev_cents"].to_numpy().astype(np.int64)
    sel = rev * denom > total * num
    keys, rev = keys[sel], rev[sel]
    out = pa.table({"l_partkey": pa.array(keys, type=pa.int64()),
                    "rev_cents": pa.array(rev, type=pa.int64())})
    return out.take(pc.sort_indices(out, sort_keys=[("rev_cents", "descending"),
                                                    ("l_partkey", "ascending")]))


# ------------------------------------------------------------- melt
def melt(ds, id_col: str, value_cols: list[str],
         var_name: str = "variable", value_name: str = "value"):
    """UNPIVOT: widen-to-long — each input row becomes len(value_cols)
    rows (id_col, var_name=<column name>, value_name=<cell>).  A
    stateless vectorized map (np.repeat + tile), streaming, no
    shuffle.  Returns a Dataset."""
    def melt_batch(batch: pa.Table) -> pa.Table:
        k = len(value_cols)
        n = len(batch)
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        rep = pa.array(np.repeat(np.arange(n, dtype=np.int64), k))
        names = pa.array(np.tile(np.array(value_cols, dtype=object), n),
                         type=pa.string())
        vals = np.empty(n * k, dtype=np.int64)
        for j, c in enumerate(value_cols):
            vals[j::k] = batch[c].to_numpy().astype(np.int64)
        return pa.table({id_col: ids.take(rep), var_name: names,
                         value_name: pa.array(vals, type=pa.int64())})

    return ds.map_batches(melt_batch, batch_format="pyarrow")


# ----------------------------------------------------- date-part group
def revenue_by_year(lineitem_ds,
                    driver_merge_limit: int | None = None) -> pa.Table:
    """Revenue grouped by calendar YEAR of the ship date — the
    date-part aggregation shape.  Year extraction is calendar-exact on
    both sides (numpy datetime64[Y] here, SQL year() in the mirror).
    One bounded partial per block (<= |years| rows), gated merge."""
    def year_partial(batch: pa.Table) -> pa.Table:
        ship = batch["l_shipdate"]
        if isinstance(ship, pa.ChunkedArray):
            ship = ship.combine_chunks()
        us = np.asarray(ship.cast(pa.int64()))
        years = (us.astype("datetime64[us]").astype("datetime64[Y]")
                 .astype(np.int64) + 1970)
        price = batch["l_extendedprice"].to_numpy().astype(np.float64)
        disc = batch["l_discount"].to_numpy().astype(np.float64)
        t = pa.table(
            {
                "year": pa.array(years, type=pa.int64()),
                "n_items": pa.array(np.ones(len(batch), dtype=np.int64)),
                "rev_cents": pa.array(
                    _round_half_away(price * (1.0 - disc) * 100),
                    type=pa.int64()),
            }
        )
        agg = t.group_by("year", use_threads=False).aggregate(
            [("n_items", "sum"), ("rev_cents", "sum")])
        return agg.rename_columns(["year", "n_items", "rev_cents"])

    partials = lineitem_ds.map_batches(year_partial, batch_format="pyarrow")
    out = _gated_group_sum(partials, ["year"], ["n_items", "rev_cents"],
                           driver_merge_limit=driver_merge_limit)
    if out is None or not len(out):
        return pa.table({"year": pa.array([], type=pa.int64()),
                         "n_items": pa.array([], type=pa.int64()),
                         "rev_cents": pa.array([], type=pa.int64())})
    return out.take(pc.sort_indices(out, sort_keys=[("year", "ascending")]))


# ------------------------------------------- Q7 shape (volume shipping)
def volume_shipping(lineitem_ds, orders_ds, customer_ds, supplier_ds,
                    nation_table: pa.Table, nation_a: str = "NATION_1",
                    nation_b: str = "NATION_2",
                    driver_merge_limit: int | None = None) -> pa.Table:
    """TPC-H Q7 shape: revenue shipped between two nations, grouped by
    (supp_nation, cust_nation, ship year) — either direction kept,
    same-nation traffic excluded.  Mirrors chearch's multi-join
    analytics surface (reference has no relational layer; SURVEY §2.9).

    Scale shape: nation is driver algebra (25 rows); supplier and
    customer are unique-key dimensions on the gated broadcast lookup
    join; the one big-big edge (lineitem ⨝ orders) rides the same
    gated join, with the orders side pre-shrunk to in-pair customers
    BEFORE the edge; rows leave each lineitem block pre-reduced to
    (supp_nat, cust_nat, year) partials (<= 2·|years| rows per block)
    ahead of the gated rollup merge."""
    from chearch_ray.stages.joins import broadcast_lookup_join

    names = nation_table["n_name"].to_pylist()
    keys = nation_table["n_nationkey"].to_numpy().astype(np.int64)
    by_name = dict(zip(names, keys))
    ka, kb = int(by_name[nation_a]), int(by_name[nation_b])
    name_of = {ka: nation_a, kb: nation_b}

    cust = customer_ds.map_batches(
        lambda b: pa.table({"c_custkey": b["c_custkey"].cast(pa.int64()),
                            "c_nationkey": b["c_nationkey"].cast(pa.int64())}),
        batch_format="pyarrow",
    )
    orders = orders_ds.map_batches(
        lambda b: pa.table({"o_orderkey": b["o_orderkey"].cast(pa.int64()),
                            "o_custkey": b["o_custkey"].cast(pa.int64())}),
        batch_format="pyarrow",
    )
    orders_n = broadcast_lookup_join(orders, cust, on="o_custkey",
                                     right_on="c_custkey",
                                     payload=["c_nationkey"])

    def pair_cust(b: pa.Table) -> pa.Table:
        nk = b["c_nationkey"].to_numpy()
        b = b.filter(pa.array((nk == ka) | (nk == kb)))
        return b.select(["o_orderkey", "c_nationkey"])

    orders_n = orders_n.map_batches(pair_cust, batch_format="pyarrow")

    line = lineitem_ds.map_batches(
        lambda b: pa.table(
            {"l_orderkey": b["l_orderkey"].cast(pa.int64()),
             "l_suppkey": b["l_suppkey"].cast(pa.int64()),
             "l_shipdate": b["l_shipdate"],
             "l_extendedprice": b["l_extendedprice"],
             "l_discount": b["l_discount"]}),
        batch_format="pyarrow",
    )
    l2 = broadcast_lookup_join(line, orders_n, on="l_orderkey",
                               right_on="o_orderkey", payload=["c_nationkey"])
    supp = supplier_ds.map_batches(
        lambda b: pa.table({"s_suppkey": b["s_suppkey"].cast(pa.int64()),
                            "s_nationkey": b["s_nationkey"].cast(pa.int64())}),
        batch_format="pyarrow",
    )
    l3 = broadcast_lookup_join(l2, supp, on="l_suppkey",
                               right_on="s_suppkey", payload=["s_nationkey"])

    def pair_partial(b: pa.Table) -> pa.Table:
        sn = b["s_nationkey"].to_numpy()
        cn = b["c_nationkey"].to_numpy()
        b = b.filter(pa.array(((sn == ka) & (cn == kb))
                              | ((sn == kb) & (cn == ka))))
        ship = b["l_shipdate"]
        if isinstance(ship, pa.ChunkedArray):
            ship = ship.combine_chunks()
        us = np.asarray(ship.cast(pa.int64()))
        years = (us.astype("datetime64[us]").astype("datetime64[Y]")
                 .astype(np.int64) + 1970)
        price = b["l_extendedprice"].to_numpy().astype(np.float64)
        disc = b["l_discount"].to_numpy().astype(np.float64)
        t = pa.table(
            {"supp_nat": b["s_nationkey"].cast(pa.int64()),
             "cust_nat": b["c_nationkey"].cast(pa.int64()),
             "l_year": pa.array(years, type=pa.int64()),
             "rev_cents": pa.array(_round_half_away(price * (1.0 - disc) * 100),
                                   type=pa.int64())})
        agg = t.group_by(["supp_nat", "cust_nat", "l_year"],
                         use_threads=False).aggregate([("rev_cents", "sum")])
        return agg.rename_columns(["supp_nat", "cust_nat", "l_year", "rev_cents"])

    partials = l3.map_batches(pair_partial, batch_format="pyarrow")
    merged = _gated_group_sum(partials, ["supp_nat", "cust_nat", "l_year"],
                              ["rev_cents"], driver_merge_limit=driver_merge_limit)
    if merged is None or not len(merged):
        return pa.table({"supp_nation": pa.array([], type=pa.string()),
                         "cust_nation": pa.array([], type=pa.string()),
                         "l_year": pa.array([], type=pa.int64()),
                         "rev_cents": pa.array([], type=pa.int64())})
    out = pa.table(
        {"supp_nation": pa.array([name_of[int(x)] for x in
                                  merged["supp_nat"].to_pylist()]),
         "cust_nation": pa.array([name_of[int(x)] for x in
                                  merged["cust_nat"].to_pylist()]),
         "l_year": merged["l_year"].cast(pa.int64()),
         "rev_cents": merged["rev_cents"].cast(pa.int64())})
    return out.take(pc.sort_indices(
        out, sort_keys=[("supp_nation", "ascending"),
                        ("cust_nation", "ascending"), ("l_year", "ascending")]))


# ------------------------------------------- Q9 shape (product profit)
def product_type_profit(lineitem_ds, part_ds, supplier_ds,
                        nation_table: pa.Table, name_substr: str = "red",
                        driver_merge_limit: int | None = None) -> pa.Table:
    """TPC-H Q9 shape, adapted: the driver tables carry no partsupp /
    ps_supplycost, so profit is the integer-cent revenue
    round(extendedprice·(1−discount)·100) — the JOIN/GROUP shape
    (part name LIKE, supplier→nation, group by nation × ship year)
    is Q9's; only the profit expression is simplified.

    Scale shape: the p_name LIKE '%substr%' part-key set broadcasts
    once (`ray.put`) and prunes lineitem blocks map-side; supplier is
    a unique-key dimension lookup; partials are bounded by
    |nations|·|years| rows per block before the gated merge."""
    import ray

    from chearch_ray.stages.joins import broadcast_lookup_join

    names = nation_table["n_name"].to_pylist()
    nkeys = nation_table["n_nationkey"].to_numpy().astype(np.int64)
    name_of = dict(zip((int(k) for k in nkeys), names))

    pkeys_parts = part_ds.map_batches(
        lambda b: pa.table({"p_partkey": b.filter(
            pc.match_substring(b["p_name"], name_substr)
        )["p_partkey"].cast(pa.int64())}),
        batch_format="pyarrow",
    )
    parts = [t for t in pkeys_parts.iter_batches(batch_size=None,
                                                 batch_format="pyarrow") if len(t)]
    pkeys = (np.sort(pa.concat_tables(parts)["p_partkey"].to_numpy()
                     .astype(np.int64)) if parts else np.empty(0, np.int64))
    pref = ray.put(pkeys)

    def prune(b: pa.Table) -> pa.Table:
        keys = ray.get(pref) if not isinstance(pref, np.ndarray) else pref
        m = np.isin(b["l_partkey"].to_numpy().astype(np.int64), keys)
        b = b.filter(pa.array(m))
        return pa.table({"l_suppkey": b["l_suppkey"].cast(pa.int64()),
                         "l_shipdate": b["l_shipdate"],
                         "l_extendedprice": b["l_extendedprice"],
                         "l_discount": b["l_discount"]})

    line = lineitem_ds.map_batches(prune, batch_format="pyarrow")
    supp = supplier_ds.map_batches(
        lambda b: pa.table({"s_suppkey": b["s_suppkey"].cast(pa.int64()),
                            "s_nationkey": b["s_nationkey"].cast(pa.int64())}),
        batch_format="pyarrow",
    )
    l2 = broadcast_lookup_join(line, supp, on="l_suppkey",
                               right_on="s_suppkey", payload=["s_nationkey"])

    def profit_partial(b: pa.Table) -> pa.Table:
        ship = b["l_shipdate"]
        if isinstance(ship, pa.ChunkedArray):
            ship = ship.combine_chunks()
        us = np.asarray(ship.cast(pa.int64()))
        years = (us.astype("datetime64[us]").astype("datetime64[Y]")
                 .astype(np.int64) + 1970)
        price = b["l_extendedprice"].to_numpy().astype(np.float64)
        disc = b["l_discount"].to_numpy().astype(np.float64)
        t = pa.table(
            {"nationkey": b["s_nationkey"].cast(pa.int64()),
             "o_year": pa.array(years, type=pa.int64()),
             "profit_cents": pa.array(
                 _round_half_away(price * (1.0 - disc) * 100),
                 type=pa.int64())})
        agg = t.group_by(["nationkey", "o_year"], use_threads=False).aggregate(
            [("profit_cents", "sum")])
        return agg.rename_columns(["nationkey", "o_year", "profit_cents"])

    partials = l2.map_batches(profit_partial, batch_format="pyarrow")
    merged = _gated_group_sum(partials, ["nationkey", "o_year"],
                              ["profit_cents"],
                              driver_merge_limit=driver_merge_limit)
    if merged is None or not len(merged):
        return pa.table({"n_name": pa.array([], type=pa.string()),
                         "o_year": pa.array([], type=pa.int64()),
                         "profit_cents": pa.array([], type=pa.int64())})
    out = pa.table(
        {"n_name": pa.array([name_of[int(x)] for x in
                             merged["nationkey"].to_pylist()]),
         "o_year": merged["o_year"].cast(pa.int64()),
         "profit_cents": merged["profit_cents"].cast(pa.int64())})
    return out.take(pc.sort_indices(
        out, sort_keys=[("n_name", "ascending"), ("o_year", "descending")]))


# ------------------------------------------- Q12 shape (late shipping)
def late_shipment_priority(lineitem_ds, orders_ds, late_days: int = 60,
                           d1: str = "1996-01-01", d2: str = "1998-01-01",
                           driver_merge_limit: int | None = None) -> pa.Table:
    """TPC-H Q12 shape, adapted: the driver tables carry no
    l_shipmode / l_commitdate / l_receiptdate, so "late" means
    l_shipdate >= o_orderdate + late_days and the grouping key is
    l_linestatus — Q12's join + conditional two-way count shape
    (URGENT/HIGH vs other order priorities) is preserved exactly.

    Scale shape: lineitem blocks are date-windowed map-side, the
    lineitem ⨝ orders edge rides the gated lookup join (payload =
    orderdate + priority), and each block pre-reduces to
    <= |linestatus| rows before the gated merge."""
    from chearch_ray.stages.joins import broadcast_lookup_join

    d1_us = int(np.datetime64(d1, "us").astype(np.int64))
    d2_us = int(np.datetime64(d2, "us").astype(np.int64))
    late_us = int(late_days) * 86_400_000_000

    def window(b: pa.Table) -> pa.Table:
        ship = b["l_shipdate"]
        if isinstance(ship, pa.ChunkedArray):
            ship = ship.combine_chunks()
        us = np.asarray(ship.cast(pa.int64()))
        b = b.filter(pa.array((us >= d1_us) & (us < d2_us)))
        return pa.table({"l_orderkey": b["l_orderkey"].cast(pa.int64()),
                         "l_linestatus": b["l_linestatus"],
                         "l_shipdate": b["l_shipdate"]})

    line = lineitem_ds.map_batches(window, batch_format="pyarrow")
    orders = orders_ds.map_batches(
        lambda b: pa.table({"o_orderkey": b["o_orderkey"].cast(pa.int64()),
                            "o_orderdate": b["o_orderdate"],
                            "o_orderpriority": b["o_orderpriority"]}),
        batch_format="pyarrow",
    )
    joined = broadcast_lookup_join(line, orders, on="l_orderkey",
                                   right_on="o_orderkey",
                                   payload=["o_orderdate", "o_orderpriority"])

    def late_partial(b: pa.Table) -> pa.Table:
        ship = b["l_shipdate"]
        if isinstance(ship, pa.ChunkedArray):
            ship = ship.combine_chunks()
        od = b["o_orderdate"]
        if isinstance(od, pa.ChunkedArray):
            od = od.combine_chunks()
        late = (np.asarray(ship.cast(pa.int64()))
                >= np.asarray(od.cast(pa.int64())) + late_us)
        b = b.filter(pa.array(late))
        pr = b["o_orderpriority"].to_numpy(zero_copy_only=False)
        high = np.isin(pr, ("1-URGENT", "2-HIGH")).astype(np.int64)
        t = pa.table({"l_linestatus": b["l_linestatus"],
                      "high_count": pa.array(high),
                      "low_count": pa.array(1 - high)})
        agg = t.group_by("l_linestatus", use_threads=False).aggregate(
            [("high_count", "sum"), ("low_count", "sum")])
        return agg.rename_columns(["l_linestatus", "high_count", "low_count"])

    partials = joined.map_batches(late_partial, batch_format="pyarrow")
    out = _gated_group_sum(partials, ["l_linestatus"],
                           ["high_count", "low_count"],
                           driver_merge_limit=driver_merge_limit)
    if out is None or not len(out):
        return pa.table({"l_linestatus": pa.array([], type=pa.string()),
                         "high_count": pa.array([], type=pa.int64()),
                         "low_count": pa.array([], type=pa.int64())})
    return out.take(pc.sort_indices(out, sort_keys=[("l_linestatus",
                                                     "ascending")]))


# ------------------------------------------- Q8 shape (market share)
def market_share(lineitem_ds, orders_ds, customer_ds, supplier_ds,
                 part_ds, nation_table: pa.Table, region_table: pa.Table,
                 region: str = "ASIA", p_type: str = "PROMO",
                 share_nation: str = "NATION_3",
                 driver_merge_limit: int | None = None) -> pa.Table:
    """TPC-H Q8 shape: for orders from customers in `region` buying
    parts of `p_type`, the per-order-year fraction of revenue supplied
    by `share_nation`.  The share is ONE float division of two exact
    integer-cent sums, so the double is bit-identical to the SQL
    mirror.

    Scale shape: nation⨝region is driver algebra; the p_type part-key
    set broadcasts and prunes lineitem map-side; customer and supplier
    are unique-key dimension lookups; the lineitem ⨝ orders edge rides
    the gated lookup join with the orders side pre-shrunk to in-region
    customers; partials are <= |years| rows per block."""
    import ray

    from chearch_ray.stages.joins import broadcast_lookup_join

    rk = region_table.filter(
        pc.equal(region_table["r_name"], region)
    )["r_regionkey"].to_numpy().astype(np.int64)
    in_region_nations = nation_table.filter(
        pa.array(np.isin(nation_table["n_regionkey"].to_numpy().astype(np.int64),
                         rk))
    )["n_nationkey"].to_numpy().astype(np.int64)
    share_key = int(nation_table.filter(
        pc.equal(nation_table["n_name"], share_nation)
    )["n_nationkey"].to_numpy().astype(np.int64)[0])

    pkeys_parts = part_ds.map_batches(
        lambda b: pa.table({"p_partkey": b.filter(
            pc.equal(b["p_type"], p_type))["p_partkey"].cast(pa.int64())}),
        batch_format="pyarrow",
    )
    parts = [t for t in pkeys_parts.iter_batches(batch_size=None,
                                                 batch_format="pyarrow") if len(t)]
    pkeys = (np.sort(pa.concat_tables(parts)["p_partkey"].to_numpy()
                     .astype(np.int64)) if parts else np.empty(0, np.int64))
    pref = ray.put(pkeys)

    cust = customer_ds.map_batches(
        lambda b: pa.table({"c_custkey": b["c_custkey"].cast(pa.int64()),
                            "c_nationkey": b["c_nationkey"].cast(pa.int64())}),
        batch_format="pyarrow",
    )
    orders = orders_ds.map_batches(
        lambda b: pa.table({"o_orderkey": b["o_orderkey"].cast(pa.int64()),
                            "o_custkey": b["o_custkey"].cast(pa.int64()),
                            "o_orderdate": b["o_orderdate"]}),
        batch_format="pyarrow",
    )
    orders_n = broadcast_lookup_join(orders, cust, on="o_custkey",
                                     right_on="c_custkey",
                                     payload=["c_nationkey"])

    def region_orders(b: pa.Table, nats=in_region_nations) -> pa.Table:
        m = np.isin(b["c_nationkey"].to_numpy(), nats)
        b = b.filter(pa.array(m))
        od = b["o_orderdate"]
        if isinstance(od, pa.ChunkedArray):
            od = od.combine_chunks()
        us = np.asarray(od.cast(pa.int64()))
        years = (us.astype("datetime64[us]").astype("datetime64[Y]")
                 .astype(np.int64) + 1970)
        return pa.table({"o_orderkey": b["o_orderkey"].cast(pa.int64()),
                         "o_year": pa.array(years, type=pa.int64())})

    orders_n = orders_n.map_batches(region_orders, batch_format="pyarrow")

    def prune(b: pa.Table) -> pa.Table:
        keys = ray.get(pref) if not isinstance(pref, np.ndarray) else pref
        m = np.isin(b["l_partkey"].to_numpy().astype(np.int64), keys)
        b = b.filter(pa.array(m))
        return pa.table({"l_orderkey": b["l_orderkey"].cast(pa.int64()),
                         "l_suppkey": b["l_suppkey"].cast(pa.int64()),
                         "l_extendedprice": b["l_extendedprice"],
                         "l_discount": b["l_discount"]})

    line = lineitem_ds.map_batches(prune, batch_format="pyarrow")
    l2 = broadcast_lookup_join(line, orders_n, on="l_orderkey",
                               right_on="o_orderkey", payload=["o_year"])
    supp = supplier_ds.map_batches(
        lambda b: pa.table({"s_suppkey": b["s_suppkey"].cast(pa.int64()),
                            "s_nationkey": b["s_nationkey"].cast(pa.int64())}),
        batch_format="pyarrow",
    )
    l3 = broadcast_lookup_join(l2, supp, on="l_suppkey",
                               right_on="s_suppkey", payload=["s_nationkey"])

    def share_partial(b: pa.Table) -> pa.Table:
        price = b["l_extendedprice"].to_numpy().astype(np.float64)
        disc = b["l_discount"].to_numpy().astype(np.float64)
        rev = _round_half_away(price * (1.0 - disc) * 100)
        is_nat = (b["s_nationkey"].to_numpy() == share_key)
        t = pa.table({"o_year": b["o_year"].cast(pa.int64()),
                      "nation_cents": pa.array(np.where(is_nat, rev, 0),
                                               type=pa.int64()),
                      "total_cents": pa.array(rev, type=pa.int64())})
        agg = t.group_by("o_year", use_threads=False).aggregate(
            [("nation_cents", "sum"), ("total_cents", "sum")])
        return agg.rename_columns(["o_year", "nation_cents", "total_cents"])

    partials = l3.map_batches(share_partial, batch_format="pyarrow")
    out = _gated_group_sum(partials, ["o_year"],
                           ["nation_cents", "total_cents"],
                           driver_merge_limit=driver_merge_limit)
    if out is None or not len(out):
        return pa.table({"o_year": pa.array([], type=pa.int64()),
                         "nation_cents": pa.array([], type=pa.int64()),
                         "total_cents": pa.array([], type=pa.int64()),
                         "mkt_share": pa.array([], type=pa.float64())})
    nc = out["nation_cents"].to_numpy().astype(np.int64)
    tc = out["total_cents"].to_numpy().astype(np.int64)
    out = pa.table({"o_year": out["o_year"].cast(pa.int64()),
                    "nation_cents": pa.array(nc, type=pa.int64()),
                    "total_cents": pa.array(tc, type=pa.int64()),
                    "mkt_share": pa.array(nc.astype(np.float64)
                                          / tc.astype(np.float64),
                                          type=pa.float64())})
    return out.take(pc.sort_indices(out, sort_keys=[("o_year", "ascending")]))


# ------------------------------------------- Q17 shape (avg-qty gate)
def small_qty_revenue(lineitem_ds, part_ds, brand: str = "Brand#5",
                      driver_merge_limit: int | None = None) -> pa.Table:
    """TPC-H Q17 shape: revenue from lineitems of `brand` parts whose
    quantity is below 0.2 × that part's average quantity — the
    correlated per-part AVG subquery.  The comparison is exact integer
    cross-multiplication (5·qty·count < sum_qty in quantity-cents), so
    no float average appears on either side.

    Scale shape: the brand part-key set broadcasts and prunes BOTH
    lineitem passes map-side; pass 1 pre-reduces each block to
    <= |brand parts| (sum_qty, count) partials ahead of the gated
    per-part merge; the per-part thresholds broadcast back (bounded by
    brand selectivity, ~1/|brands| of parts) and pass 2 reduces each
    block to ONE (rev, n) row, merged on the driver — the same
    block-count-bounded class as Q6."""
    import ray

    pkeys_parts = part_ds.map_batches(
        lambda b: pa.table({"p_partkey": b.filter(
            pc.equal(b["p_brand"], brand))["p_partkey"].cast(pa.int64())}),
        batch_format="pyarrow",
    )
    parts = [t for t in pkeys_parts.iter_batches(batch_size=None,
                                                 batch_format="pyarrow") if len(t)]
    pkeys = (np.sort(pa.concat_tables(parts)["p_partkey"].to_numpy()
                     .astype(np.int64)) if parts else np.empty(0, np.int64))
    pref = ray.put(pkeys)

    def qty_partial(b: pa.Table) -> pa.Table:
        keys = ray.get(pref) if not isinstance(pref, np.ndarray) else pref
        m = np.isin(b["l_partkey"].to_numpy().astype(np.int64), keys)
        b = b.filter(pa.array(m))
        t = pa.table({"l_partkey": b["l_partkey"].cast(pa.int64()),
                      "sum_qty_c": pa.array(
                          _cents(b["l_quantity"].to_numpy().astype(np.float64)),
                          type=pa.int64()),
                      "cnt": pa.array(np.ones(len(b), dtype=np.int64))})
        agg = t.group_by("l_partkey", use_threads=False).aggregate(
            [("sum_qty_c", "sum"), ("cnt", "sum")])
        return agg.rename_columns(["l_partkey", "sum_qty_c", "cnt"])

    per_part = _gated_group_sum(
        lineitem_ds.map_batches(qty_partial, batch_format="pyarrow"),
        ["l_partkey"], ["sum_qty_c", "cnt"],
        driver_merge_limit=driver_merge_limit)
    if per_part is None or not len(per_part):
        return pa.table({"rev_cents": pa.array([0], type=pa.int64()),
                         "n_lines": pa.array([0], type=pa.int64())})
    tk = per_part["l_partkey"].to_numpy().astype(np.int64)
    order = np.argsort(tk, kind="stable")
    tref = ray.put((tk[order],
                    per_part["sum_qty_c"].to_numpy().astype(np.int64)[order],
                    per_part["cnt"].to_numpy().astype(np.int64)[order]))

    def gate_partial(b: pa.Table) -> pa.Table:
        keys, sums, cnts = ray.get(tref) if not isinstance(tref, tuple) else tref
        k = b["l_partkey"].to_numpy().astype(np.int64)
        pos = np.searchsorted(keys, k)
        posc = np.minimum(pos, max(len(keys) - 1, 0))
        hit = (keys[posc] == k) if len(keys) else np.zeros(len(k), dtype=bool)
        b = b.filter(pa.array(hit))
        posh = posc[hit]
        qty_c = _cents(b["l_quantity"].to_numpy().astype(np.float64))
        ok = 5 * qty_c * cnts[posh] < sums[posh]
        price_c = _cents(b["l_extendedprice"].to_numpy().astype(np.float64))
        return pa.table({"rev_cents": pa.array([int(price_c[ok].sum())],
                                               type=pa.int64()),
                         "n_lines": pa.array([int(ok.sum())],
                                             type=pa.int64())})

    rev = n = 0
    gated = lineitem_ds.map_batches(gate_partial, batch_format="pyarrow")
    for t in gated.iter_batches(batch_size=None, batch_format="pyarrow"):
        if len(t):
            rev += int(np.sum(t["rev_cents"].to_numpy()))
            n += int(np.sum(t["n_lines"].to_numpy()))
    return pa.table({"rev_cents": pa.array([rev], type=pa.int64()),
                     "n_lines": pa.array([n], type=pa.int64())})


# ------------------------------------------- Q20 shape (nested-in qty)
def promo_part_suppliers(lineitem_ds, supplier_ds, part_ds,
                         nation_table: pa.Table, name_prefix: str = "red",
                         nation: str = "NATION_1",
                         d1: str = "1997-01-01", d2: str = "1998-01-01",
                         driver_merge_limit: int | None = None) -> pa.Table:
    """TPC-H Q20 shape, adapted: no partsupp/ps_availqty in the driver
    tables, so the nested quantity test is "shipped quantity of the
    (part, supplier) pair inside [d1, d2) exceeds HALF the pair's
    all-time shipped quantity" — Q20's nested-IN + correlated-sum
    structure with an exact 2·window > total integer comparison.

    Scale shape: the name-prefix part-key set broadcasts and prunes
    lineitem map-side; per-block partials are (part, supp, window,
    total) pair sums ahead of the gated two-key merge (pair count is
    bounded by the prefix selectivity × suppliers-per-part, the same
    class as the Q16 brand × supplier distinct-count); the qualifying
    supplier-key set is tiny and filters the supplier dimension in one
    vectorized pass."""
    import ray

    nkey = int(nation_table.filter(
        pc.equal(nation_table["n_name"], nation)
    )["n_nationkey"].to_numpy().astype(np.int64)[0])
    d1_us = int(np.datetime64(d1, "us").astype(np.int64))
    d2_us = int(np.datetime64(d2, "us").astype(np.int64))

    pkeys_parts = part_ds.map_batches(
        lambda b: pa.table({"p_partkey": b.filter(
            pc.starts_with(b["p_name"], name_prefix)
        )["p_partkey"].cast(pa.int64())}),
        batch_format="pyarrow",
    )
    parts = [t for t in pkeys_parts.iter_batches(batch_size=None,
                                                 batch_format="pyarrow") if len(t)]
    pkeys = (np.sort(pa.concat_tables(parts)["p_partkey"].to_numpy()
                     .astype(np.int64)) if parts else np.empty(0, np.int64))
    pref = ray.put(pkeys)

    def pair_partial(b: pa.Table) -> pa.Table:
        keys = ray.get(pref) if not isinstance(pref, np.ndarray) else pref
        m = np.isin(b["l_partkey"].to_numpy().astype(np.int64), keys)
        b = b.filter(pa.array(m))
        ship = b["l_shipdate"]
        if isinstance(ship, pa.ChunkedArray):
            ship = ship.combine_chunks()
        us = np.asarray(ship.cast(pa.int64()))
        qty_c = _cents(b["l_quantity"].to_numpy().astype(np.float64))
        in_win = (us >= d1_us) & (us < d2_us)
        t = pa.table({"l_partkey": b["l_partkey"].cast(pa.int64()),
                      "l_suppkey": b["l_suppkey"].cast(pa.int64()),
                      "win_c": pa.array(np.where(in_win, qty_c, 0),
                                        type=pa.int64()),
                      "tot_c": pa.array(qty_c, type=pa.int64())})
        agg = t.group_by(["l_partkey", "l_suppkey"],
                         use_threads=False).aggregate(
            [("win_c", "sum"), ("tot_c", "sum")])
        return agg.rename_columns(["l_partkey", "l_suppkey", "win_c", "tot_c"])

    pairs = _gated_group_sum(
        lineitem_ds.map_batches(pair_partial, batch_format="pyarrow"),
        ["l_partkey", "l_suppkey"], ["win_c", "tot_c"],
        driver_merge_limit=driver_merge_limit)
    if pairs is None or not len(pairs):
        return pa.table({"s_suppkey": pa.array([], type=pa.int64()),
                         "s_name": pa.array([], type=pa.string())})
    win = pairs["win_c"].to_numpy().astype(np.int64)
    tot = pairs["tot_c"].to_numpy().astype(np.int64)
    hot = np.unique(pairs["l_suppkey"].to_numpy().astype(np.int64)[2 * win > tot])
    sref = ray.put(hot)

    def supp_rows(b: pa.Table) -> pa.Table:
        keys = ray.get(sref) if not isinstance(sref, np.ndarray) else sref
        k = b["s_suppkey"].to_numpy().astype(np.int64)
        m = np.isin(k, keys) & (b["s_nationkey"].to_numpy().astype(np.int64)
                                == nkey)
        b = b.filter(pa.array(m))
        return pa.table({"s_suppkey": b["s_suppkey"].cast(pa.int64()),
                         "s_name": b["s_name"]})

    rows = [t for t in supplier_ds.map_batches(supp_rows, batch_format="pyarrow")
            .iter_batches(batch_size=None, batch_format="pyarrow") if len(t)]
    if not rows:
        return pa.table({"s_suppkey": pa.array([], type=pa.int64()),
                         "s_name": pa.array([], type=pa.string())})
    out = pa.concat_tables(rows)
    return out.take(pc.sort_indices(
        out, sort_keys=[("s_name", "ascending"), ("s_suppkey", "ascending")]))


# ------------------------------------------- Q2 shape (correlated min)
def min_cost_supplier(lineitem_ds, supplier_ds, part_ds,
                      nation_table: pa.Table, region_table: pa.Table,
                      region: str = "EUROPE", p_size: int = 10,
                      p_type: str = "SMALL", k: int = 100,
                      driver_merge_limit: int | None = None) -> pa.Table:
    """TPC-H Q2 shape, adapted: no partsupp/ps_supplycost, so "cost"
    is the supplier's total integer-cent lineitem revenue for the part
    and the correlated `= (SELECT min(...))` picks the cheapest
    in-region supplier per part (ties broken by the smaller suppkey —
    the SQL mirror's row_number ORDER BY cost, suppkey).

    Scale shape: part keys (size+type filter) and in-region supplier
    keys both broadcast and prune lineitem map-side; per-block
    (part, supp) cost partials ride the gated two-key merge; the
    per-part argmin is a driver lexsort over the bounded pair table
    (filtered-part × in-region-supplier selectivity); supplier
    attributes attach in one vectorized dimension pass."""
    import ray

    rk = region_table.filter(
        pc.equal(region_table["r_name"], region)
    )["r_regionkey"].to_numpy().astype(np.int64)
    nat = nation_table.filter(
        pa.array(np.isin(nation_table["n_regionkey"].to_numpy().astype(np.int64),
                         rk)))
    nkeys = nat["n_nationkey"].to_numpy().astype(np.int64)
    name_of = dict(zip((int(x) for x in nkeys), nat["n_name"].to_pylist()))

    pkeys_parts = part_ds.map_batches(
        lambda b: pa.table({"p_partkey": b.filter(
            pc.and_(pc.equal(b["p_size"], p_size),
                    pc.equal(b["p_type"], p_type))
        )["p_partkey"].cast(pa.int64())}),
        batch_format="pyarrow",
    )
    parts = [t for t in pkeys_parts.iter_batches(batch_size=None,
                                                 batch_format="pyarrow") if len(t)]
    pkeys = (np.sort(pa.concat_tables(parts)["p_partkey"].to_numpy()
                     .astype(np.int64)) if parts else np.empty(0, np.int64))
    pref = ray.put(pkeys)

    def region_supp(b: pa.Table) -> pa.Table:
        m = np.isin(b["s_nationkey"].to_numpy().astype(np.int64), nkeys)
        b = b.filter(pa.array(m))
        return pa.table({"s_suppkey": b["s_suppkey"].cast(pa.int64()),
                         "s_name": b["s_name"],
                         "s_acctbal": b["s_acctbal"],
                         "s_nationkey": b["s_nationkey"].cast(pa.int64())})

    supp_dim = supplier_ds.map_batches(region_supp, batch_format="pyarrow")
    srows = [t for t in supp_dim.iter_batches(batch_size=None,
                                              batch_format="pyarrow") if len(t)]
    supp_tbl = (pa.concat_tables(srows).combine_chunks() if srows
                else pa.table({"s_suppkey": pa.array([], type=pa.int64()),
                               "s_name": pa.array([], type=pa.string()),
                               "s_acctbal": pa.array([], type=pa.float64()),
                               "s_nationkey": pa.array([], type=pa.int64())}))
    skeys = supp_tbl["s_suppkey"].to_numpy().astype(np.int64)
    sorder = np.argsort(skeys, kind="stable")
    skeys = skeys[sorder]
    supp_tbl = supp_tbl.take(pa.array(sorder, type=pa.int64()))
    sref = ray.put(skeys)

    def cost_partial(b: pa.Table) -> pa.Table:
        keys = ray.get(pref) if not isinstance(pref, np.ndarray) else pref
        sk = ray.get(sref) if not isinstance(sref, np.ndarray) else sref
        m = (np.isin(b["l_partkey"].to_numpy().astype(np.int64), keys)
             & np.isin(b["l_suppkey"].to_numpy().astype(np.int64), sk))
        b = b.filter(pa.array(m))
        price = b["l_extendedprice"].to_numpy().astype(np.float64)
        disc = b["l_discount"].to_numpy().astype(np.float64)
        t = pa.table({"l_partkey": b["l_partkey"].cast(pa.int64()),
                      "l_suppkey": b["l_suppkey"].cast(pa.int64()),
                      "cost_cents": pa.array(
                          _round_half_away(price * (1.0 - disc) * 100),
                          type=pa.int64())})
        agg = t.group_by(["l_partkey", "l_suppkey"],
                         use_threads=False).aggregate([("cost_cents", "sum")])
        return agg.rename_columns(["l_partkey", "l_suppkey", "cost_cents"])

    pairs = _gated_group_sum(
        lineitem_ds.map_batches(cost_partial, batch_format="pyarrow"),
        ["l_partkey", "l_suppkey"], ["cost_cents"],
        driver_merge_limit=driver_merge_limit)
    empty = pa.table({"s_acctbal_cents": pa.array([], type=pa.int64()),
                      "s_name": pa.array([], type=pa.string()),
                      "n_name": pa.array([], type=pa.string()),
                      "p_partkey": pa.array([], type=pa.int64()),
                      "s_suppkey": pa.array([], type=pa.int64()),
                      "cost_cents": pa.array([], type=pa.int64())})
    if pairs is None or not len(pairs):
        return empty
    pk = pairs["l_partkey"].to_numpy().astype(np.int64)
    sk = pairs["l_suppkey"].to_numpy().astype(np.int64)
    cost = pairs["cost_cents"].to_numpy().astype(np.int64)
    order = np.lexsort((sk, cost, pk))  # part, then cost, then suppkey
    pk, sk, cost = pk[order], sk[order], cost[order]
    first = np.ones(len(pk), dtype=bool)
    first[1:] = pk[1:] != pk[:-1]
    pk, sk, cost = pk[first], sk[first], cost[first]
    pos = np.searchsorted(skeys, sk)
    bal = _cents(supp_tbl["s_acctbal"].to_numpy().astype(np.float64))[pos]
    natk = supp_tbl["s_nationkey"].to_numpy().astype(np.int64)[pos]
    out = pa.table(
        {"s_acctbal_cents": pa.array(bal, type=pa.int64()),
         "s_name": supp_tbl["s_name"].take(pa.array(pos, type=pa.int64())),
         "n_name": pa.array([name_of[int(x)] for x in natk]),
         "p_partkey": pa.array(pk, type=pa.int64()),
         "s_suppkey": pa.array(sk, type=pa.int64()),
         "cost_cents": pa.array(cost, type=pa.int64())})
    idx = pc.sort_indices(out, sort_keys=[
        ("s_acctbal_cents", "descending"), ("n_name", "ascending"),
        ("s_name", "ascending"), ("p_partkey", "ascending")])
    return out.take(idx.slice(0, min(k, len(out))))


# ------------------------------------------- Q21 shape (multi-exists)
def waiting_orders_suppliers(lineitem_ds, orders_ds, supplier_ds,
                             nation_table: pa.Table,
                             nation: str = "NATION_2", k: int = 100,
                             driver_merge_limit: int | None = None) -> pa.Table:
    """TPC-H Q21 shape, adapted: no l_commitdate/l_receiptdate, so the
    "kept waiting" line predicate is l_returnflag = 'R'.  The
    EXISTS / NOT-EXISTS pair survives exactly: count, per supplier in
    `nation`, the 'F'-status orders with >= 2 distinct suppliers where
    this supplier is the ONLY one whose lines were returned.

    Scale shape: the 'F'-order filter is the gated semi-join; stage 1
    dedupes (order, supplier, returned) pairs (per-block group_by, then
    driver merge below the gate / Ray two-key groupby-Max above);
    stage 2 reduces pairs to per-order sums where the sole returned
    supplier is recoverable as sum(is_r·suppkey) because n_r == 1 is
    required; qualifying suppliers then count through the gated
    supplier-key merge — the unbounded per-order table never gathers
    on the driver in the scale path."""
    from chearch_ray.stages.joins import hash_semi_join
    from chearch_ray.stages.pack import DRIVER_MERGE_LIMIT

    limit = DRIVER_MERGE_LIMIT if driver_merge_limit is None else driver_merge_limit
    nkey = int(nation_table.filter(
        pc.equal(nation_table["n_name"], nation)
    )["n_nationkey"].to_numpy().astype(np.int64)[0])

    f_orders = orders_ds.map_batches(
        lambda b: pa.table({"o_orderkey": b.filter(
            pc.equal(b["o_orderstatus"], "F"))["o_orderkey"].cast(pa.int64())}),
        batch_format="pyarrow",
    )
    line = hash_semi_join(
        lineitem_ds, f_orders, on="l_orderkey", right_on="o_orderkey",
        payload=["l_orderkey", "l_suppkey", "l_returnflag"])

    def pair_partial(b: pa.Table) -> pa.Table:
        t = pa.table({"l_orderkey": b["l_orderkey"].cast(pa.int64()),
                      "l_suppkey": b["l_suppkey"].cast(pa.int64()),
                      "is_r": pc.cast(pc.equal(b["l_returnflag"], "R"),
                                      pa.int64())})
        agg = t.group_by(["l_orderkey", "l_suppkey"],
                         use_threads=False).aggregate([("is_r", "max")])
        return agg.rename_columns(["l_orderkey", "l_suppkey", "is_r"])

    pair_partials = line.map_batches(pair_partial,
                                     batch_format="pyarrow").materialize()

    def order_stats(pairs: pa.Table) -> pa.Table:
        """(order, supp, is_r) pairs -> per-order partial sums; exact
        after a per-order merge because every column is a sum."""
        is_r = pairs["is_r"].to_numpy().astype(np.int64)
        t = pa.table({"l_orderkey": pairs["l_orderkey"].cast(pa.int64()),
                      "n_supp": pa.array(np.ones(len(pairs), dtype=np.int64)),
                      "n_r": pa.array(is_r),
                      "r_supp_sum": pa.array(
                          is_r * pairs["l_suppkey"].to_numpy().astype(np.int64),
                          type=pa.int64())})
        agg = t.group_by("l_orderkey", use_threads=False).aggregate(
            [("n_supp", "sum"), ("n_r", "sum"), ("r_supp_sum", "sum")])
        return agg.rename_columns(["l_orderkey", "n_supp", "n_r", "r_supp_sum"])

    def count_partial(per_order: pa.Table) -> pa.Table:
        n_supp = per_order["n_supp"].to_numpy().astype(np.int64)
        n_r = per_order["n_r"].to_numpy().astype(np.int64)
        sel = (n_supp >= 2) & (n_r == 1)
        supp = per_order["r_supp_sum"].to_numpy().astype(np.int64)[sel]
        vals, cnt = np.unique(supp, return_counts=True)
        return pa.table({"s_suppkey": pa.array(vals, type=pa.int64()),
                         "numwait": pa.array(cnt.astype(np.int64))})

    if pair_partials.count() <= limit:
        rows = [t for t in pair_partials.iter_batches(batch_size=None,
                                                      batch_format="pyarrow")
                if len(t)]
        if not rows:
            counts = pa.table({"s_suppkey": pa.array([], type=pa.int64()),
                               "numwait": pa.array([], type=pa.int64())})
        else:
            pairs = pa.concat_tables(rows).group_by(
                ["l_orderkey", "l_suppkey"], use_threads=False).aggregate(
                [("is_r", "max")]).rename_columns(
                ["l_orderkey", "l_suppkey", "is_r"])
            counts = count_partial(order_stats(pairs))
    else:
        from ray.data.aggregate import Max, Sum

        pairs_ds = pair_partials.groupby(["l_orderkey", "l_suppkey"]).aggregate(
            Max("is_r", alias_name="is_r"))
        stat_partials = pairs_ds.map_batches(order_stats, batch_format="pyarrow")
        per_order_ds = stat_partials.groupby("l_orderkey").aggregate(
            Sum("n_supp", alias_name="n_supp"),
            Sum("n_r", alias_name="n_r"),
            Sum("r_supp_sum", alias_name="r_supp_sum"))
        cnt_partials = per_order_ds.map_batches(count_partial,
                                                batch_format="pyarrow")
        counts = _gated_group_sum(cnt_partials, ["s_suppkey"], ["numwait"],
                                  driver_merge_limit=driver_merge_limit)
        if counts is None:
            counts = pa.table({"s_suppkey": pa.array([], type=pa.int64()),
                               "numwait": pa.array([], type=pa.int64())})

    import ray

    ck = counts["s_suppkey"].to_numpy().astype(np.int64)
    cn = counts["numwait"].to_numpy().astype(np.int64)
    order = np.argsort(ck, kind="stable")
    cref = ray.put((ck[order], cn[order]))

    def attach(b: pa.Table) -> pa.Table:
        ck_, cn_ = ray.get(cref) if not isinstance(cref, tuple) else cref
        sk = b["s_suppkey"].to_numpy().astype(np.int64)
        m = (np.isin(sk, ck_)
             & (b["s_nationkey"].to_numpy().astype(np.int64) == nkey))
        b = b.filter(pa.array(m))
        pos = np.searchsorted(ck_, b["s_suppkey"].to_numpy().astype(np.int64))
        return pa.table({"s_name": b["s_name"],
                         "s_suppkey": b["s_suppkey"].cast(pa.int64()),
                         "numwait": pa.array(cn_[pos] if len(ck_)
                                             else np.empty(0, np.int64),
                                             type=pa.int64())})

    rows = [t for t in supplier_ds.map_batches(attach, batch_format="pyarrow")
            .iter_batches(batch_size=None, batch_format="pyarrow") if len(t)]
    if not rows:
        return pa.table({"s_name": pa.array([], type=pa.string()),
                         "s_suppkey": pa.array([], type=pa.int64()),
                         "numwait": pa.array([], type=pa.int64())})
    out = pa.concat_tables(rows)
    idx = pc.sort_indices(out, sort_keys=[
        ("numwait", "descending"), ("s_name", "ascending"),
        ("s_suppkey", "ascending")])
    return out.take(idx.slice(0, min(k, len(out))))


def percent_rank_values(ds, by: str, value_col: str,
                        driver_merge_limit: int | None = None) -> pa.Table:
    """PERCENT_RANK() over the distinct (group, value) set — dense
    position scaled to [0, 1]: (rnk − 1) / (n_distinct − 1) as ONE
    float division of exact ints, mirrored verbatim.  Same bounded
    distinct-pair shape as dense_rank_values."""
    ranked = dense_rank_values(ds, by, value_col,
                               driver_merge_limit=driver_merge_limit)
    if not len(ranked):
        return pa.table({by: pa.array([], type=pa.string()),
                         "value_cents": pa.array([], type=pa.int64()),
                         "pct_rank": pa.array([], type=pa.float64())})
    keys = ranked[by].to_numpy(zero_copy_only=False)
    rnk = ranked["rnk"].to_numpy().astype(np.int64)
    # distinct count per group = max rank per group (ranked is sorted
    # by (group, value) and rnk restarts at 1)
    n_by_key: dict = {}
    for k, r in zip(keys, rnk):
        if r > n_by_key.get(k, 0):
            n_by_key[k] = int(r)
    n = np.array([n_by_key[k] for k in keys], dtype=np.int64)
    pct = np.where(n > 1, (rnk - 1).astype(np.float64)
                   / np.maximum(n - 1, 1).astype(np.float64), 0.0)
    return pa.table({by: ranked[by],
                     "value_cents": ranked["value_cents"].cast(pa.int64()),
                     "pct_rank": pa.array(pct, type=pa.float64())})


# ------------------------------------------- ORDER BY … LIMIT/OFFSET
def ordered_page(ds, sort_keys: list[tuple[str, str]], limit: int,
                 offset: int = 0, columns: list[str] | None = None) -> pa.Table:
    """distributed ORDER BY … LIMIT k OFFSET m: each block pre-reduces
    to its own top-(offset+limit) under the sort order, the bounded
    partials (≤ offset+limit rows per block) merge on the driver, and
    one final sort slices the page.  Correct for any total order the
    keys define; ties must be broken by a unique trailing key for a
    deterministic page (the callers append the table's key column).
    No global sort — the all-to-all a `ds.sort` would pay buys nothing
    when only one page leaves the pipeline."""
    need = offset + limit

    def topn_block(b: pa.Table) -> pa.Table:
        if columns is not None:
            b = b.select(columns)
        if len(b) <= need:
            return b
        idx = pc.sort_indices(b, sort_keys=sort_keys)
        return b.take(idx.slice(0, need))

    parts = [t for t in ds.map_batches(topn_block, batch_format="pyarrow")
             .iter_batches(batch_size=None, batch_format="pyarrow") if len(t)]
    if not parts:
        sch = ds.schema()
        base = getattr(sch, "base_schema", None)
        return (base.empty_table() if isinstance(base, pa.Schema)
                else pa.table({}))
    merged = pa.concat_tables(parts)
    idx = pc.sort_indices(merged, sort_keys=sort_keys)
    return merged.take(idx.slice(offset, limit))


# ------------------------------------------- DENSE_RANK per group
def dense_rank_values(ds, by: str, value_col: str,
                      driver_merge_limit: int | None = None) -> pa.Table:
    """DENSE_RANK() OVER (PARTITION BY `by` ORDER BY value): the
    distinct (group, value-cents) pairs with their dense rank — equal
    to the window function over the full table because dense rank
    depends only on the distinct value set.

    Scale shape: per-block distinct pairs (bounded by |groups| ×
    |distinct values|, tiny for categorical/price-grid columns) merge
    through the gated pattern; ranking the merged distinct set is
    driver algebra."""
    def pair_partial(b: pa.Table) -> pa.Table:
        t = pa.table({by: b[by],
                      "value_cents": pa.array(
                          _cents(b[value_col].to_numpy().astype(np.float64)),
                          type=pa.int64()),
                      "n": pa.array(np.ones(len(b), dtype=np.int64))})
        agg = t.group_by([by, "value_cents"], use_threads=False).aggregate(
            [("n", "sum")])
        return agg.rename_columns([by, "value_cents", "n"])

    pairs = _gated_group_sum(
        ds.map_batches(pair_partial, batch_format="pyarrow"),
        [by, "value_cents"], ["n"], driver_merge_limit=driver_merge_limit)
    if pairs is None or not len(pairs):
        return pa.table({by: pa.array([], type=pa.string()),
                         "value_cents": pa.array([], type=pa.int64()),
                         "rnk": pa.array([], type=pa.int64())})
    idx = pc.sort_indices(pairs, sort_keys=[(by, "ascending"),
                                            ("value_cents", "ascending")])
    pairs = pairs.take(idx)
    keys = pairs[by].to_numpy(zero_copy_only=False)
    new_grp = np.ones(len(pairs), dtype=bool)
    new_grp[1:] = keys[1:] != keys[:-1]
    # dense rank = position within group + 1 over the distinct sorted set
    i = np.arange(len(pairs), dtype=np.int64)
    grp_start = np.maximum.accumulate(np.where(new_grp, i, 0))
    return pa.table({by: pairs[by],
                     "value_cents": pairs["value_cents"].cast(pa.int64()),
                     "rnk": pa.array(i - grp_start + 1, type=pa.int64())})


def least_squares_cents(ds, x: str, y: str) -> pa.Table:
    """Simple linear regression y = a·x + b over integer-cent columns
    with an EXACT float contract: the same per-block exact decimal128
    moment partials / Python-int driver merge as `pearson_corr_cents`
    (overflow-proof at any cents magnitude x block size), then
    the TWO float expressions
        slope     = (n·sxy − sx·sy) / (n·sxx − sx²)
        intercept = (sy − slope·sx) / n     (as doubles, this order)
    mirrored verbatim in SQL from the HUGEINT moments — IEEE division
    and multiply make the doubles bit-identical."""
    def moment_partial(batch: pa.Table) -> pa.Table:
        xc = _cents(batch[x].to_numpy().astype(np.float64))
        yc = _cents(batch[y].to_numpy().astype(np.float64))
        return pa.table(
            {
                "n": pa.array([len(batch)], type=pa.int64()),
                "sx": pa.array([_exact_sum_prod(xc)], type=_MOMENT_TYPE),
                "sy": pa.array([_exact_sum_prod(yc)], type=_MOMENT_TYPE),
                "sxx": pa.array([_exact_sum_prod(xc, xc)], type=_MOMENT_TYPE),
                "sxy": pa.array([_exact_sum_prod(xc, yc)], type=_MOMENT_TYPE),
            }
        )

    parts = [t for t in ds.map_batches(moment_partial, batch_format="pyarrow")
             .iter_batches(batch_size=None, batch_format="pyarrow") if len(t)]
    n = sx = sy = sxx = sxy = 0
    for t in parts:  # Python ints: no overflow at any block count
        n += int(pc.sum(t["n"]).as_py())
        sx += int(pc.sum(t["sx"]).as_py())
        sy += int(pc.sum(t["sy"]).as_py())
        sxx += int(pc.sum(t["sxx"]).as_py())
        sxy += int(pc.sum(t["sxy"]).as_py())
    den = n * sxx - sx * sx
    slope = float(n * sxy - sx * sy) / float(den) if den else 0.0
    intercept = (float(sy) - slope * float(sx)) / float(n) if n else 0.0
    return pa.table(
        {
            "n": pa.array([n], type=pa.int64()),
            "slope": pa.array([slope], type=pa.float64()),
            "intercept": pa.array([intercept], type=pa.float64()),
        }
    )

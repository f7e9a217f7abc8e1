"""KMV (k-minimum-values) distinct-count sketch: a one-pass,
mergeable cardinality estimator for integer key columns.

Each batch contributes its k smallest DISTINCT Knuth-hash values
(`h = key * 6364136223846793005 mod 2^64` — an odd multiplier, so the
map is a BIJECTION on uint64 and distinct hashes == distinct keys,
no collision error term); partials merge by keeping the k smallest of
the union, and the estimate is the classic KMV

    D ≈ (k - 1) * 2^64 / h_(k)        (exact count when fewer than k)

computed in INTEGER arithmetic so a SQL oracle (HUGEINT) reproduces
the estimate bit-for-bit — the sketch is deterministic, merge-order-
and partition-invariant.

Scale shape: the shuffle carries k values per block (k * 8 bytes),
the driver merge holds blocks * k values; at 10^12 rows the pass
never materializes the distinct set anywhere — that is the point of
the sketch (contrast `count(DISTINCT ...)`, whose exact groupby
shuffles every distinct key).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pyarrow as pa

from chearch_ray.stages.sample import KNUTH_MULT

#: default sketch size
KMV_K = 1024


def _kmv_partial(batch: pa.Table, column: str, k: int) -> pa.Table:
    h = np.unique(batch[column].to_numpy().astype(np.uint64) * KNUTH_MULT)
    if len(h) > k:
        h = np.partition(h, k - 1)[:k]
    return pa.table({"hv": pa.array(h, type=pa.uint64())})


def kmv_distinct(ds, column: str, k: int = KMV_K) -> int:
    """Dataset -> KMV distinct-count estimate of `column` (int).
    Deterministic: same input -> same estimate, regardless of
    partitioning."""
    partials = ds.map_batches(
        partial(_kmv_partial, column=column, k=k), batch_format="pyarrow"
    )
    vals: list[np.ndarray] = []
    for t in partials.iter_batches(batch_size=None, batch_format="pyarrow"):
        if len(t):
            vals.append(t["hv"].to_numpy().astype(np.uint64))
    if not vals:
        return 0
    h = np.unique(np.concatenate(vals))
    if len(h) < k:
        return int(len(h))
    kth = int(np.partition(h, k - 1)[k - 1])
    if kth == 0:
        return int(len(h))
    return ((k - 1) << 64) // kth


def _kmv_group_partial(batch: pa.Table, column: str, by: str, k: int) -> pa.Table:
    """per (group) k smallest distinct hashes of this batch: one sort
    of (group, hash) pairs, then a vectorized per-run k-cut."""
    g = batch[by]
    if isinstance(g, pa.ChunkedArray):
        g = g.combine_chunks()
    h = batch[column].to_numpy().astype(np.uint64) * KNUTH_MULT
    t = pa.table({by: g, "hv": pa.array(h, type=pa.uint64())})
    # sort by (group, hv); drop duplicate (group, hv); keep first k per run
    order = pa.compute.sort_indices(
        t, sort_keys=[(by, "ascending"), ("hv", "ascending")])
    t = t.take(order)
    gv = t[by].combine_chunks() if isinstance(t[by], pa.ChunkedArray) else t[by]
    hv = t["hv"].to_numpy()
    n = len(t)
    if n == 0:
        return pa.table({by: g.slice(0, 0), "hv": pa.array([], type=pa.uint64())})
    import pyarrow.compute as pc

    new_grp = np.empty(n, dtype=bool)
    new_grp[0] = True
    new_grp[1:] = ~pc.equal(gv.slice(1), gv.slice(0, n - 1)).to_numpy(
        zero_copy_only=False)
    new_val = np.empty(n, dtype=bool)
    new_val[0] = True
    new_val[1:] = (hv[1:] != hv[:-1]) | new_grp[1:]
    # ordinal of each DISTINCT value within its group run
    starts = np.flatnonzero(new_grp)
    counts = np.diff(np.append(starts, n))
    distinct_rank = np.cumsum(new_val) - np.repeat(
        np.cumsum(new_val)[starts] - new_val[starts], counts)
    keep = new_val & (distinct_rank <= k)
    return t.filter(pa.array(keep))


def kmv_distinct_by(ds, column: str, by: str, k: int = KMV_K) -> pa.Table:
    """Per-group KMV distinct-count estimates: (by, n_distinct_est),
    sorted by group.  Same integer estimate formula as `kmv_distinct`,
    per group; the shuffle carries <= k hash rows per (block, group)
    and the per-group finalize runs on <= k * blocks values.  Intended
    for enumerable group columns; deterministic and
    partition-invariant (merging k-min sets is order-free)."""
    parted = ds.map_batches(
        partial(_kmv_group_partial, column=column, by=by, k=k),
        batch_format="pyarrow",
    )

    def finalize(group: pa.Table) -> pa.Table:
        h = np.unique(group["hv"].to_numpy().astype(np.uint64))
        if len(h) < k:
            est = int(len(h))
        else:
            kth = int(np.partition(h, k - 1)[k - 1])
            est = int(len(h)) if kth == 0 else ((k - 1) << 64) // kth
        gcol = group[by]
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        return pa.table({by: gcol.slice(0, 1),
                         "n_distinct_est": pa.array([est], type=pa.int64())})

    out = parted.groupby(by).map_groups(finalize, batch_format="pyarrow")
    t = pa.concat_tables(
        out.iter_batches(batch_size=None, batch_format="pyarrow"))
    return t.take(pa.compute.sort_indices(t, sort_keys=[(by, "ascending")]))


# ------------------------------------------------ exact quantiles
#: histogram resolution per narrowing round
QUANTILE_BUCKETS = 4096
#: once a rank's candidate range holds this few rows, gather and select
QUANTILE_GATHER_LIMIT = 200_000


def _range_hist(batch: pa.Table, column: str, lo: int, hi: int, nb: int) -> pa.Table:
    """rows with lo <= v <= hi -> (bucket, n) partial histogram counts
    over nb equal-width buckets of [lo, hi]."""
    v = batch[column].to_numpy()
    m = (v >= lo) & (v <= hi)
    v = v[m]
    if len(v) == 0:
        return pa.table({"bucket": pa.array([], type=pa.int64()),
                         "n": pa.array([], type=pa.int64())})
    width = max(1, (hi - lo + nb) // nb)  # ceil((hi-lo+1)/nb)
    b = (v - lo) // width
    uniq, cnt = np.unique(b, return_counts=True)
    return pa.table({"bucket": pa.array(uniq, type=pa.int64()),
                     "n": pa.array(cnt, type=pa.int64())})


def _gather_range(batch: pa.Table, column: str, lo: int, hi: int) -> pa.Table:
    v = batch[column].to_numpy()
    m = (v >= lo) & (v <= hi)
    return pa.table({column: pa.array(v[m], type=pa.int64())})


def _merge_hist(partials, n_buckets: int, n_blocks: int,
                driver_merge_limit: int,
                key: str = "bucket") -> list[dict]:
    """merge per-block histogram partials: driver-side below the gate,
    via a Ray groupby("bucket").aggregate(Sum) above it — so the rows
    reaching the driver are O(n_buckets), never O(blocks x buckets)
    (VERDICT r3 finding #1; pattern: pack.DRIVER_MERGE_LIMIT)."""
    if n_blocks * n_buckets > driver_merge_limit:
        from ray.data.aggregate import Sum

        partials = partials.groupby(key).aggregate(Sum("n", alias_name="n"))
    return partials.take_all()


def exact_quantiles(ds, column: str, qs, n_buckets: int = QUANTILE_BUCKETS,
                    gather_limit: int = QUANTILE_GATHER_LIMIT,
                    driver_merge_limit: int | None = None) -> pa.Table:
    """EXACT discrete quantiles of an int64 column without a global
    sort: iterative histogram narrowing (distributed selection).

    Rank convention matches DuckDB's quantile_disc: the 0-based rank
    ceil(q*n) - 1 of the ascending order.  Each round histograms only
    the rows still inside the rank's candidate range (one map_batches
    pass; partials merge driver-side below the blocks x buckets gate,
    through a Ray groupby above it), narrows to the bucket containing
    the rank, and repeats until the range holds at most `gather_limit`
    rows — then gathers just those and selects.  Rounds needed:
    log_nb(range), i.e. 2 passes for 64-bit cents at nb=4096x2; the
    shuffle never carries data rows, only per-block histograms.

    Returns (q double, value int64), one row per requested quantile."""
    from functools import partial as _partial

    from chearch_ray.stages.pack import DRIVER_MERGE_LIMIT

    if driver_merge_limit is None:
        driver_merge_limit = DRIVER_MERGE_LIMIT
    out_q, out_v = [], []
    # global range + row count from ONE partial pass (one row per
    # non-empty block, which also measures the block count for the gate)
    mm = ds.map_batches(
        lambda b: pa.table({"mn": pa.array([int(b[column].to_numpy().min())], type=pa.int64()),
                            "mx": pa.array([int(b[column].to_numpy().max())], type=pa.int64()),
                            "cnt": pa.array([len(b)], type=pa.int64())})
        if len(b) else
        pa.table({"mn": pa.array([], type=pa.int64()),
                  "mx": pa.array([], type=pa.int64()),
                  "cnt": pa.array([], type=pa.int64())}),
        batch_format="pyarrow",
    ).take_all()
    n = sum(r["cnt"] for r in mm)
    if n == 0:
        return pa.table({"q": pa.array([], type=pa.float64()),
                         column: pa.array([], type=pa.int64())})
    n_blocks = max(1, len(mm))
    g_lo = min(r["mn"] for r in mm)
    g_hi = max(r["mx"] for r in mm)
    for q in qs:
        rank = max(0, int(np.ceil(q * n)) - 1)  # 0-based within full set
        lo, hi, in_range = g_lo, g_hi, n
        while in_range > gather_limit and lo < hi:
            hist = _merge_hist(
                ds.map_batches(
                    _partial(_range_hist, column=column, lo=lo, hi=hi, nb=n_buckets),
                    batch_format="pyarrow",
                ),
                n_buckets, n_blocks, driver_merge_limit,
            )
            counts = np.zeros(n_buckets, dtype=np.int64)
            for r in hist:
                counts[r["bucket"]] += r["n"]
            cum = np.cumsum(counts)
            b = int(np.searchsorted(cum, rank + 1))
            rank -= int(cum[b - 1]) if b else 0
            width = max(1, (hi - lo + n_buckets) // n_buckets)
            lo, hi = lo + b * width, min(hi, lo + (b + 1) * width - 1)
            in_range = int(counts[b])
        if lo == hi:  # range collapsed to one value (heavy duplicate):
            out_q.append(float(q))  # no gather needed, however many rows
            out_v.append(int(lo))
            continue
        vals = np.concatenate(
            [t[column].to_numpy() for t in
             (ds.map_batches(_partial(_gather_range, column=column, lo=lo, hi=hi),
                             batch_format="pyarrow")
              .iter_batches(batch_size=None, batch_format="pyarrow")) if len(t)]
            or [np.empty(0, dtype=np.int64)]
        )
        vals.sort()
        out_q.append(float(q))
        out_v.append(int(vals[rank]))
    return pa.table({"q": pa.array(out_q, type=pa.float64()),
                     column: pa.array(out_v, type=pa.int64())})


# ------------------------------------------------- per-group quantiles
def _group_jobs_hist(batch: pa.Table, column: str, by: str, jobs: list[dict],
                     nb: int) -> pa.Table:
    """one pass serving EVERY active (group, q) narrowing job: per job,
    histogram the batch's rows of that group inside the job's current
    range.  Jobs are few (|groups| x |qs|); each histogram is a
    vectorized masked bincount."""
    v = batch[column].to_numpy()
    g = batch[by]
    if isinstance(g, pa.ChunkedArray):
        g = g.combine_chunks()
    out_j, out_b, out_n = [], [], []
    for j, job in enumerate(jobs):
        import pyarrow.compute as pc

        gm = pc.equal(g, job["group"]).to_numpy(zero_copy_only=False)
        lo, hi = job["lo"], job["hi"]
        vv = v[gm & (v >= lo) & (v <= hi)]
        if len(vv) == 0:
            continue
        width = max(1, (hi - lo + nb) // nb)
        uniq, cnt = np.unique((vv - lo) // width, return_counts=True)
        out_j.append(np.full(len(uniq), j, dtype=np.int64))
        out_b.append(uniq)
        out_n.append(cnt)
    if not out_j:
        return pa.table({"job": pa.array([], type=pa.int64()),
                         "bucket": pa.array([], type=pa.int64()),
                         "n": pa.array([], type=pa.int64())})
    return pa.table({"job": pa.array(np.concatenate(out_j), type=pa.int64()),
                     "bucket": pa.array(np.concatenate(out_b), type=pa.int64()),
                     "n": pa.array(np.concatenate(out_n), type=pa.int64())})


def _group_jobs_gather(batch: pa.Table, column: str, by: str,
                       jobs: list[dict]) -> pa.Table:
    v = batch[column].to_numpy()
    g = batch[by]
    if isinstance(g, pa.ChunkedArray):
        g = g.combine_chunks()
    out_j, out_v = [], []
    for j, job in enumerate(jobs):
        import pyarrow.compute as pc

        gm = pc.equal(g, job["group"]).to_numpy(zero_copy_only=False)
        vv = v[gm & (v >= job["lo"]) & (v <= job["hi"])]
        if len(vv):
            out_j.append(np.full(len(vv), j, dtype=np.int64))
            out_v.append(vv)
    if not out_j:
        return pa.table({"job": pa.array([], type=pa.int64()),
                         "val": pa.array([], type=pa.int64())})
    return pa.table({"job": pa.array(np.concatenate(out_j), type=pa.int64()),
                     "val": pa.array(np.concatenate(out_v), type=pa.int64())})


def _drive_rank_jobs(ds, column: str, by: str, jobs: list,
                     n_buckets: int, gather_limit: int,
                     driver_merge_limit: int) -> None:
    """drive (group, rank) selection jobs to completion (sets
    j["done"]): one shared histogram pass per round serves every
    still-active job; final ranges gather bounded by gather_limit rows
    per job.  Shared by the disc and cont grouped quantile forms."""
    from functools import partial as _partial

    def active(js):
        return [j for j in js if j["done"] is None
                and j["in_range"] > gather_limit and j["lo"] < j["hi"]]

    while True:
        act = active(jobs)
        # collapsed ranges resolve immediately (heavy duplicates)
        for j in jobs:
            if j["done"] is None and j["lo"] == j["hi"]:
                j["done"] = int(j["lo"])
        act = active(jobs)
        if not act:
            break
        # materialized: per-block partials are bounded by the block's
        # own row count (object-store resident); num_blocks needs it
        partials = ds.map_batches(
            _partial(_group_jobs_hist, column=column, by=by, jobs=act, nb=n_buckets),
            batch_format="pyarrow",
        ).materialize()
        n_blocks = max(1, partials.num_blocks())
        counts = np.zeros((len(act), n_buckets), dtype=np.int64)
        if n_blocks * len(act) * n_buckets > driver_merge_limit:
            # scale path: collapse (block, job, bucket) partials on a
            # combined jb key so the driver sees O(jobs x buckets) rows
            from ray.data.aggregate import Sum

            def _jb(t: pa.Table, nb: int = n_buckets) -> pa.Table:
                jb = t["job"].to_numpy() * nb + t["bucket"].to_numpy()
                return pa.table({"jb": pa.array(jb, type=pa.int64()), "n": t["n"]})

            merged = (partials.map_batches(_jb, batch_format="pyarrow")
                      .groupby("jb").aggregate(Sum("n", alias_name="n"))
                      .take_all())
            for r in merged:
                counts[r["jb"] // n_buckets, r["jb"] % n_buckets] += r["n"]
        else:
            for r in partials.take_all():
                counts[r["job"], r["bucket"]] += r["n"]
        for ji, job in enumerate(act):
            cum = np.cumsum(counts[ji])
            b = int(np.searchsorted(cum, job["rank"] + 1))
            job["rank"] -= int(cum[b - 1]) if b else 0
            lo, hi, nb = job["lo"], job["hi"], n_buckets
            width = max(1, (hi - lo + nb) // nb)
            job["lo"], job["hi"] = lo + b * width, min(hi, lo + (b + 1) * width - 1)
            job["in_range"] = int(counts[ji, b])

    remaining = [j for j in jobs if j["done"] is None]
    if remaining:
        gathered = ds.map_batches(
            _partial(_group_jobs_gather, column=column, by=by, jobs=remaining),
            batch_format="pyarrow",
        ).take_all()
        vals: dict[int, list] = {}
        for r in gathered:
            vals.setdefault(r["job"], []).append(r["val"])
        for ji, job in enumerate(remaining):
            vv = np.sort(np.array(vals.get(ji, []), dtype=np.int64))
            job["done"] = int(vv[job["rank"]])



def exact_group_quantiles(ds, column: str, qs, by: str,
                          n_buckets: int = QUANTILE_BUCKETS,
                          gather_limit: int = QUANTILE_GATHER_LIMIT,
                          driver_merge_limit: int | None = None) -> pa.Table:
    """EXACT per-group discrete quantiles of an int64 column — the
    grouped form of `exact_quantiles`, still with NO global sort and
    no per-group data shuffle.  Every (group, q) pair is an
    independent selection job; ONE histogram pass per round serves all
    still-active jobs simultaneously (each job narrows its own value
    range), so the pass count stays log_nb(range) whatever the group
    count.  The shuffle carries per-(block, job, bucket) count rows
    only.  Intended for enumerable group columns (lang, split,
    event_type — |groups| x |qs| jobs held in driver state); rank
    convention matches DuckDB's quantile_disc per group.

    Returns (by, q double, <column> int64) sorted by (group, q)."""
    from functools import partial as _partial

    from ray.data.aggregate import Count, Max, Min

    from chearch_ray.stages.pack import DRIVER_MERGE_LIMIT

    if driver_merge_limit is None:
        driver_merge_limit = DRIVER_MERGE_LIMIT
    stats = ds.groupby(by).aggregate(
        Count(alias_name="n"), Min(column, alias_name="mn"), Max(column, alias_name="mx")
    )
    rows = []
    for t in stats.iter_batches(batch_size=None, batch_format="pyarrow"):
        rows.extend(t.to_pylist())
    jobs = []
    for r in sorted(rows, key=lambda x: str(x[by])):
        for q in qs:
            jobs.append(
                {
                    "group": r[by],
                    "q": float(q),
                    "rank": max(0, int(np.ceil(q * r["n"])) - 1),
                    "lo": int(r["mn"]),
                    "hi": int(r["mx"]),
                    "in_range": int(r["n"]),
                    "done": None,
                }
            )

    _drive_rank_jobs(ds, column, by, jobs, n_buckets, gather_limit,
                     driver_merge_limit)
    return pa.table(
        {
            by: pa.array([j["group"] for j in jobs]),
            "q": pa.array([j["q"] for j in jobs], type=pa.float64()),
            column: pa.array([j["done"] for j in jobs], type=pa.int64()),
        }
    )


# ------------------------------------------------ Count-Min sketch
#: default sketch geometry: depth x width counters (error <= 2N/w with
#: probability 1 - 2^-depth over the hash choices)
CM_DEPTH = 4
CM_WIDTH = 2048
#: per-row odd multipliers (public mixing constants: splitmix64 /
#: xxhash / wyhash primes) — odd, so k -> k*A mod 2^64 is a bijection
#: and the row hash is cell = (k*A mod 2^64) >> (64 - log2(width)),
#: reproducible in SQL with HUGEINT arithmetic (the KMV trick)
CM_MULTS = (
    np.uint64(0x9E3779B97F4A7C15),
    np.uint64(0xC2B2AE3D27D4EB4F),
    np.uint64(0xFF51AFD7ED558CCD),
    np.uint64(0xA0761D6478BD642F),
)


def _cm_shift(width: int) -> int:
    lb = int(width).bit_length() - 1
    if (1 << lb) != width:
        raise ValueError("CM width must be a power of two")
    return 64 - lb


def cm_cells(keys: np.ndarray, depth: int = CM_DEPTH,
             width: int = CM_WIDTH) -> np.ndarray:
    """(depth, len(keys)) int64 cell ids — one top-bits multiplicative
    hash per sketch row."""
    if depth > len(CM_MULTS):
        raise ValueError(f"depth > {len(CM_MULTS)} needs more multipliers")
    sh = np.uint64(_cm_shift(width))
    k = keys.astype(np.uint64)
    return np.stack([((k * CM_MULTS[i]) >> sh).astype(np.int64)
                     for i in range(depth)])


def _cm_partial(batch: pa.Table, column: str, depth: int, width: int) -> pa.Table:
    """one block's sketch as sparse (cell = i*width + j, n) rows —
    at most depth x distinct-keys-in-block of them."""
    k = batch[column].to_numpy()
    if len(k) == 0:
        return pa.table({"cell": pa.array([], type=pa.int64()),
                         "n": pa.array([], type=pa.int64())})
    cells = cm_cells(k, depth, width)  # (depth, n)
    rows = cells + (np.arange(depth, dtype=np.int64) * width)[:, None]
    uniq, cnt = np.unique(rows.ravel(), return_counts=True)
    return pa.table({"cell": pa.array(uniq, type=pa.int64()),
                     "n": pa.array(cnt.astype(np.int64), type=pa.int64())})


def cm_sketch(ds, column: str, depth: int = CM_DEPTH, width: int = CM_WIDTH,
              driver_merge_limit: int | None = None) -> np.ndarray:
    """Count-Min sketch of an integer key column: a (depth, width)
    int64 counter table.  Sketches merge by elementwise ADD, so block
    partials (sparse, <= depth x distinct rows each) sum through the
    gated driver/groupby pattern and the result is partition-invariant
    and deterministic — a SQL oracle reproduces every counter exactly
    (integer multiplicative hashes, HUGEINT arithmetic)."""
    from functools import partial as _partial

    from chearch_ray.stages.pack import DRIVER_MERGE_LIMIT

    limit = DRIVER_MERGE_LIMIT if driver_merge_limit is None else driver_merge_limit
    partials = ds.map_batches(
        _partial(_cm_partial, column=column, depth=depth, width=width),
        batch_format="pyarrow",
    ).materialize()
    sk = np.zeros(depth * width, dtype=np.int64)
    if partials.count() <= limit:
        for t in partials.iter_batches(batch_size=None, batch_format="pyarrow"):
            if len(t):
                np.add.at(sk, t["cell"].to_numpy(), t["n"].to_numpy())
    else:
        from ray.data.aggregate import Sum

        merged = partials.groupby("cell").aggregate(Sum("n", alias_name="n"))
        for t in merged.iter_batches(batch_size=None, batch_format="pyarrow"):
            if len(t):
                np.add.at(sk, t["cell"].to_numpy(), t["n"].to_numpy())
    return sk.reshape(depth, width)


def cm_point_estimates(sketch: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """min-over-rows point estimates for `keys` (classic CM upper
    bound: never below the true count)."""
    depth, width = sketch.shape
    cells = cm_cells(np.asarray(keys, dtype=np.int64), depth, width)
    ests = np.stack([sketch[i][cells[i]] for i in range(depth)])
    return ests.min(axis=0).astype(np.int64)


# --------------------------------------------- exact distinct counts
def _distinct_pairs_partial(batch: pa.Table, column: str, by: str) -> pa.Table:
    """block-local UNIQUE (by, value) pairs — the map-side combiner:
    the merge sees at most |distinct pairs in block| rows, never the
    raw event stream."""
    t = pa.table({by: batch[by], column: batch[column]})
    return t.group_by([by, column], use_threads=False).aggregate([]).select([by, column])


def exact_distinct_by(ds, column: str, by: str,
                      driver_merge_limit: int | None = None,
                      coarse_partitions: int = 64) -> pa.Table:
    """EXACT count(DISTINCT column) per `by` group -> (by, n_distinct),
    ascending by group — the exact companion of kmv_distinct_by (KMV
    answers the same question approximately with k values per group).

    Scale shape: blocks pre-reduce to unique (by, value) pairs; below
    the driver gate the pair partials merge driver-side (one unique
    pass), above it each pair lands in exactly ONE coarse hash
    partition (keyed on the pair), partitions dedupe and count
    per-group partials, and the <= partitions * |groups| count rows
    merge through the gated rollup — the pair stream crosses the
    exchange once and nothing driver-side scales with data size."""
    from chearch_ray.pipelines.analytics import _gated_group_sum
    from chearch_ray.stages.pack import DRIVER_MERGE_LIMIT

    limit = DRIVER_MERGE_LIMIT if driver_merge_limit is None else driver_merge_limit
    partials = ds.map_batches(
        partial(_distinct_pairs_partial, column=column, by=by),
        batch_format="pyarrow",
    ).materialize()
    if partials.count() <= limit:
        parts = [t for t in partials.iter_batches(batch_size=None,
                                                  batch_format="pyarrow") if len(t)]
        if not parts:
            return pa.table({by: pa.array([], type=pa.string()),
                             "n_distinct": pa.array([], type=pa.int64())})
        uniq = pa.concat_tables(parts).group_by(
            [by, column], use_threads=False).aggregate([])
        agg = uniq.group_by(by, use_threads=False).aggregate([(column, "count")])
        out = agg.rename_columns([by, "n_distinct"])
    else:
        # one exchange keyed on the PAIR: every duplicate pair lands in
        # the same partition, so per-partition dedup is global dedup
        import pyarrow.compute as pc_

        from chearch_ray.stages.partition import coarse_partition_ids
        from chearch_ray.stages.sample import _group_hash64

        def pair_key(b: pa.Table) -> pa.Table:
            key = pc_.binary_join_element_wise(
                pc_.cast(b[by], pa.string()), pc_.cast(b[column], pa.string()), "\x1f"
            )
            ids = coarse_partition_ids(_group_hash64(key), coarse_partitions)
            return b.append_column("pgrp", pa.array(ids, type=pa.int32()))

        def count_partition(g: pa.Table) -> pa.Table:
            u = g.select([by, column]).group_by(
                [by, column], use_threads=False).aggregate([])
            agg = u.group_by(by, use_threads=False).aggregate([(column, "count")])
            return agg.rename_columns([by, "n_distinct"])

        counts = partials.map_batches(pair_key, batch_format="pyarrow") \
            .groupby("pgrp").map_groups(count_partition, batch_format="pyarrow")
        out = _gated_group_sum(counts, [by], ["n_distinct"],
                               driver_merge_limit=driver_merge_limit)
    import pyarrow.compute as pc2

    out = pa.table({by: out[by], "n_distinct": out["n_distinct"].cast(pa.int64())})
    return out.take(pc2.sort_indices(out, sort_keys=[(by, "ascending")]))


def exact_order_stats(ds, column: str, ranks, n_buckets: int = QUANTILE_BUCKETS,
                      gather_limit: int = QUANTILE_GATHER_LIMIT,
                      driver_merge_limit: int | None = None):
    """EXACT 0-based order statistics of an int64 column — the same
    histogram-narrowing distributed selection as exact_quantiles but
    parameterized directly by rank, so callers can ask for adjacent
    ranks (percentile_cont interpolation needs k and k+1).

    Returns (n, {rank: value}); gathers are the same bounded classes
    as exact_quantiles (one 3-int row per block for min/max/count;
    <= gather_limit rows for the final range)."""
    from functools import partial as _partial

    from chearch_ray.stages.pack import DRIVER_MERGE_LIMIT

    if driver_merge_limit is None:
        driver_merge_limit = DRIVER_MERGE_LIMIT
    mm = ds.map_batches(
        lambda b: pa.table({"mn": pa.array([int(b[column].to_numpy().min())], type=pa.int64()),
                            "mx": pa.array([int(b[column].to_numpy().max())], type=pa.int64()),
                            "cnt": pa.array([len(b)], type=pa.int64())})
        if len(b) else
        pa.table({"mn": pa.array([], type=pa.int64()),
                  "mx": pa.array([], type=pa.int64()),
                  "cnt": pa.array([], type=pa.int64())}),
        batch_format="pyarrow",
    ).take_all()
    n = sum(r["cnt"] for r in mm)
    if n == 0:
        return 0, {}
    n_blocks = max(1, len(mm))
    g_lo = min(r["mn"] for r in mm)
    g_hi = max(r["mx"] for r in mm)
    out: dict[int, int] = {}
    for want in ranks:
        if not (0 <= want < n):
            raise ValueError(f"rank {want} outside [0, {n})")
        rank, lo, hi, in_range = int(want), g_lo, g_hi, n
        while in_range > gather_limit and lo < hi:
            hist = _merge_hist(
                ds.map_batches(
                    _partial(_range_hist, column=column, lo=lo, hi=hi, nb=n_buckets),
                    batch_format="pyarrow",
                ),
                n_buckets, n_blocks, driver_merge_limit,
            )
            counts = np.zeros(n_buckets, dtype=np.int64)
            for r in hist:
                counts[r["bucket"]] += r["n"]
            cum = np.cumsum(counts)
            b = int(np.searchsorted(cum, rank + 1))
            rank -= int(cum[b - 1]) if b else 0
            width = max(1, (hi - lo + n_buckets) // n_buckets)
            lo, hi = lo + b * width, min(hi, lo + (b + 1) * width - 1)
            in_range = int(counts[b])
        if lo == hi:
            out[int(want)] = int(lo)
            continue
        vals = np.concatenate(
            [t[column].to_numpy() for t in
             (ds.map_batches(_partial(_gather_range, column=column, lo=lo, hi=hi),
                             batch_format="pyarrow")
              .iter_batches(batch_size=None, batch_format="pyarrow")) if len(t)]
            or [np.empty(0, dtype=np.int64)]
        )
        vals.sort()
        out[int(want)] = int(vals[rank])
    return n, out


def quantiles_cont(ds_factory, column: str, qs,
                   n_buckets: int = QUANTILE_BUCKETS,
                   gather_limit: int = QUANTILE_GATHER_LIMIT,
                   driver_merge_limit: int | None = None) -> pa.Table:
    """EXACT interpolated quantiles (SQL percentile_cont): for each q,
    value = lo + ((n-1)·q − k)·(hi − lo) where k = floor((n-1)·q) and
    lo/hi are the k-th / (k+1)-th order statistics — ONE float64
    expression over exact integers, written identically in the SQL
    mirror, so the doubles are bit-identical.

    `ds_factory` is a zero-arg callable returning a fresh Dataset
    (the selection makes several passes).  Returns (q, value)."""
    ds = ds_factory()
    # probe n first so the rank list is known
    n, _ = exact_order_stats(ds, column, ranks=[0], n_buckets=n_buckets,
                             gather_limit=gather_limit,
                             driver_merge_limit=driver_merge_limit)
    if n == 0:
        return pa.table({"q": pa.array([], type=pa.float64()),
                         "value": pa.array([], type=pa.float64())})
    ranks: set[int] = set()
    ks = []
    for q in qs:
        k = int(np.floor((n - 1) * float(q)))
        k2 = min(k + 1, n - 1)
        ks.append((float(q), k, k2))
        ranks.update((k, k2))
    _, sel = exact_order_stats(ds_factory(), column, ranks=sorted(ranks),
                               n_buckets=n_buckets, gather_limit=gather_limit,
                               driver_merge_limit=driver_merge_limit)
    out_q, out_v = [], []
    for q, k, k2 in ks:
        lo = np.float64(sel[k])
        hi = np.float64(sel[k2])
        frac = np.float64(n - 1) * np.float64(q) - np.float64(k)
        out_q.append(q)
        out_v.append(float(lo + frac * (hi - lo)))
    return pa.table({"q": pa.array(out_q, type=pa.float64()),
                     "value": pa.array(out_v, type=pa.float64())})


def exact_group_quantiles_cont(ds_factory, column: str, qs, by: str,
                               n_buckets: int = QUANTILE_BUCKETS,
                               gather_limit: int = QUANTILE_GATHER_LIMIT,
                               driver_merge_limit: int | None = None) -> pa.Table:
    """EXACT per-group interpolated quantiles (SQL percentile_cont
    ... GROUP BY): per group and q, value = lo + ((n-1)·q − k)·(hi −
    lo) with k = floor((n-1)·q) and lo/hi the k-th/(k+1)-th group
    order statistics — ONE float64 expression mirrored verbatim in
    SQL.  Jobs are (group, rank) selections on the shared
    `_drive_rank_jobs` narrowing loop (one histogram pass per round
    for ALL jobs).  `ds_factory` returns a fresh Dataset per pass.

    Returns (by, q double, value double) sorted by (group, q)."""
    from ray.data.aggregate import Count, Max, Min

    from chearch_ray.stages.pack import DRIVER_MERGE_LIMIT

    if driver_merge_limit is None:
        driver_merge_limit = DRIVER_MERGE_LIMIT
    stats = ds_factory().groupby(by).aggregate(
        Count(alias_name="n"), Min(column, alias_name="mn"),
        Max(column, alias_name="mx"))
    rows = []
    for t in stats.iter_batches(batch_size=None, batch_format="pyarrow"):
        rows.extend(t.to_pylist())
    jobs, plan = [], []
    job_of: dict[tuple, int] = {}
    for r in sorted(rows, key=lambda x: str(x[by])):
        n = int(r["n"])
        for q in qs:
            k = int(np.floor((n - 1) * float(q)))
            k2 = min(k + 1, n - 1)
            for rank in (k, k2):
                key = (r[by], rank)
                if key not in job_of:
                    job_of[key] = len(jobs)
                    jobs.append({"group": r[by], "q": float(q), "rank": rank,
                                 "lo": int(r["mn"]), "hi": int(r["mx"]),
                                 "in_range": n, "done": None})
            plan.append((r[by], float(q), n, k, k2))
    _drive_rank_jobs(ds_factory(), column, by, jobs, n_buckets,
                     gather_limit, driver_merge_limit)
    out_g, out_q, out_v = [], [], []
    for g, q, n, k, k2 in plan:
        lo = np.float64(jobs[job_of[(g, k)]]["done"])
        hi = np.float64(jobs[job_of[(g, k2)]]["done"])
        frac = np.float64(n - 1) * np.float64(q) - np.float64(k)
        out_g.append(g)
        out_q.append(q)
        out_v.append(float(lo + frac * (hi - lo)))
    return pa.table({by: pa.array(out_g),
                     "q": pa.array(out_q, type=pa.float64()),
                     "value": pa.array(out_v, type=pa.float64())})


def ntile_summary(ds_factory, column: str, n_tiles: int,
                  n_buckets: int = QUANTILE_BUCKETS,
                  gather_limit: int = QUANTILE_GATHER_LIMIT,
                  driver_merge_limit: int | None = None) -> pa.Table:
    """SQL NTILE(n) summarized per bucket: (tile, n_rows, min_value,
    max_value) — well-defined whatever the tie-break inside equal
    values, because NTILE bucket SIZES are fixed (first n % tiles
    buckets get one extra row) and each bucket's min/max are the order
    statistics at its rank boundaries.  2·n_tiles exact order stats
    through one `exact_order_stats` call — no global sort."""
    n, _ = exact_order_stats(ds_factory(), column, ranks=[0],
                             n_buckets=n_buckets, gather_limit=gather_limit,
                             driver_merge_limit=driver_merge_limit)
    if n == 0:
        return pa.table({"tile": pa.array([], type=pa.int64()),
                         "n_rows": pa.array([], type=pa.int64()),
                         "min_value": pa.array([], type=pa.int64()),
                         "max_value": pa.array([], type=pa.int64())})
    base, extra = divmod(n, n_tiles)
    bounds, start = [], 0
    for i in range(n_tiles):
        size = base + (1 if i < extra else 0)
        if size == 0:
            continue
        bounds.append((i + 1, size, start, start + size - 1))
        start += size
    ranks = sorted({r for _, _, lo, hi in bounds for r in (lo, hi)})
    _, sel = exact_order_stats(ds_factory(), column, ranks=ranks,
                               n_buckets=n_buckets, gather_limit=gather_limit,
                               driver_merge_limit=driver_merge_limit)
    return pa.table({
        "tile": pa.array([t for t, _, _, _ in bounds], type=pa.int64()),
        "n_rows": pa.array([s for _, s, _, _ in bounds], type=pa.int64()),
        "min_value": pa.array([sel[lo] for _, _, lo, _ in bounds],
                              type=pa.int64()),
        "max_value": pa.array([sel[hi] for _, _, _, hi in bounds],
                              type=pa.int64()),
    })

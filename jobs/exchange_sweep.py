"""Exchange-path bench sweep (VERDICT r4 #6): the gated operators'
Ray-exchange paths are parity-TESTED (driver_merge_limit=0 /
broadcast-limit=0 produce row-identical output at two scale factors),
but their COSTS were only spot-measured.  This job times each headline
gated pipeline twice at sf0.1 — default gates (broadcast / driver
merge below the constant limits) vs gates forced to 0 (the 100-TB
shape: every merge is a Ray groupby exchange, every join side ships
through the object store) — and prints one JSON line with both
timings per row.

Run:  RAY_GRAFT_CPUS=32 python jobs/exchange_sweep.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    import ray.data

    import pyarrow.parquet as pq

    from chearch_ray.pipelines.analytics import grouped_value_stats
    from chearch_ray.stages.dedup import boilerplate_line_dedup
    from chearch_ray.stages.joins import broadcast_lookup_join, hash_semi_join
    from chearch_ray.stages.textstats import frequent_terms

    def lineitem(cols):
        return ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"), columns=cols)

    def orders(cols):
        return ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"), columns=cols)

    def docs(cols):
        return ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=cols)

    def drain(out):
        """Consume a Dataset/Table to completion."""
        if hasattr(out, "iter_batches"):
            for _ in out.iter_batches(batch_size=None, batch_format="pyarrow"):
                pass
        return out

    ROWS = {
        # semi join: lineitem rows whose order has >1 line (probe =
        # orders keys) — broadcast probe set vs key-hash exchange
        "semi_join": lambda **gate: drain(hash_semi_join(
            lineitem(["l_orderkey", "l_quantity"]),
            orders(["o_orderkey"]),
            on="l_orderkey", right_on="o_orderkey",
            payload=["l_orderkey", "l_quantity"], **gate)),
        # dimension lookup join: orders x customer-keyed payload
        "lookup_join": lambda **gate: drain(broadcast_lookup_join(
            orders(["o_orderkey", "o_custkey"]),
            orders(["o_orderkey", "o_totalprice"]),
            on="o_orderkey", payload=["o_totalprice"], **gate)),
        # exact heavy hitters over the document terms
        "frequent_terms": lambda **gate: frequent_terms(
            docs(["doc_id", "text"]), denom=100, **gate),
        # per-group exact stats (TPC-H-flavored rollup shape)
        "grouped_stats": lambda **gate: grouped_value_stats(
            lineitem(["l_returnflag", "l_extendedprice"]),
            key="l_returnflag", value="l_extendedprice", **gate),
        # line-level boilerplate dedup (distinct-doc partials)
        "line_dedup": lambda **gate: drain(boilerplate_line_dedup(
            docs(["doc_id", "text"]), min_docs=10, **gate)),
    }
    GATE0 = {
        "semi_join": {"probe_broadcast_limit": 0},
        "lookup_join": {"broadcast_limit": 0},
        "frequent_terms": {"driver_merge_limit": 0},
        "grouped_stats": {"driver_merge_limit": 0},
        "line_dedup": {"driver_merge_limit": 0},
    }

    results = {}
    for name, fn in ROWS.items():
        fn()  # warm (read cache, actor pools)
        t0 = time.perf_counter()
        fn()
        gated = time.perf_counter() - t0
        t0 = time.perf_counter()
        fn(**GATE0[name])
        exchange = time.perf_counter() - t0
        results[f"{name}_gated_sec"] = round(gated, 3)
        results[f"{name}_exchange_sec"] = round(exchange, 3)
        print(f"{name}: gated {gated:.2f}s, exchange {exchange:.2f}s",
              file=sys.stderr)

    print(json.dumps({"metric": "exchange_path_sweep", "unit": "sec",
                      "sf": sf_dir, "num_cpus": num_cpus,
                      "queries": results}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Object-store-pressure exercise: build under a plasma store SMALLER
than the corpus and prove the streaming pipeline completes unchanged.

The 100-TB claim rests on Ray Data's streaming executor moving blocks
through a bounded object store with backpressure (throttling upstream
operators) and, past that, disk spill.  The normal bench never tests
that boundary (128 GiB host, ~1 GiB of build state).  This job builds
a corpus bigger than a deliberately tiny object store, then asserts:

  1. the build COMPLETES — no ObjectStoreFullError/OOM abort;
  2. the manifest is byte-identical to an unconstrained build of the
     same corpus (pressure handling never leaks into output bytes);
  3. the store really was smaller than the corpus (pressure existed).

It also reports WHICH mechanism absorbed the pressure, read from the
raylet state dump: "throttled" (backpressure held the working set
under the store — the usual outcome, since the partitioned exchange
checkpoints runs to disk rather than plasma) or "spilled" (cumulative
spill requests > 0).  Reference run: 60k docs / 129 MB corpus under a
110 MiB store completed byte-identical, throttled (see BASELINE.md).

Run standalone (owns its Ray sessions — do NOT run inside another
driver):

    python jobs/test_spill_build.py [--docs 60000] [--store-mb 220]

Each phase runs in a fresh subprocess so the two object-store sizes
can't contaminate each other.  Results land on stdout as one JSON
line; BASELINE.md records the reference run.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PHASE = textwrap.dedent(
    """
    import json, os, sys, time
    sys.path.insert(0, {repo!r})
    import ray, ray.data
    kwargs = dict(address="local", num_cpus=8, include_dashboard=False,
                  logging_level="ERROR")
    if {store_mb} > 0:
        kwargs["object_store_memory"] = {store_mb} * 1024 * 1024
    ray.init(**kwargs)
    import logging
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    from chearch_ray.config import EngineConfig
    from chearch_ray.pipelines.build import build_index
    from chearch_ray.sources.corpus import write_corpus_parquet, build_read_blocks
    paths = write_corpus_parquet({corpus_dir!r}, {docs}, num_shards=16,
                                 min_lines=30, max_lines=300)
    nbytes = sum(os.path.getsize(p) for p in paths)
    cfg = EngineConfig(num_segments=4, num_term_shards=16,
                       tokenize_batch_size=1024)
    t0 = time.perf_counter()
    ds = ray.data.read_parquet(paths,
                               override_num_blocks=build_read_blocks(nbytes, 8))
    m = build_index(ds, {index_dir!r}, cfg, resume=False)
    wall = time.perf_counter() - t0
    # spill accounting straight from the raylet state dump (the
    # grpc-backed memory_summary API needs grpcio, absent here)
    spill_requests = -1
    try:
        sess = ray._private.worker._global_node.get_session_dir_path()
        with open(os.path.join(sess, "logs", "debug_state.txt")) as f:
            for line in f:
                if "cumulative spill requests:" in line:
                    spill_requests = int(line.rsplit(":", 1)[1])
    except Exception:
        pass
    with open(os.path.join({index_dir!r}, "manifest.json"), "rb") as f:
        manifest = f.read()
    import hashlib
    print(json.dumps({{"wall_s": round(wall, 2),
                       "manifest_sha": hashlib.sha256(manifest).hexdigest(),
                       "num_docs": m.num_docs,
                       "spill_requests": spill_requests,
                       "corpus_mb": round(nbytes / 1e6, 1)}}))
    ray.shutdown()
    """
)


def run_phase(corpus_dir: str, index_dir: str, docs: int, store_mb: int) -> dict:
    code = _PHASE.format(repo=REPO, corpus_dir=corpus_dir, index_dir=index_dir,
                         docs=docs, store_mb=store_mb)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=1800)
    if out.returncode != 0:
        raise RuntimeError(f"phase failed (store_mb={store_mb}):\n"
                           f"{out.stderr[-4000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=60000)
    ap.add_argument("--store-mb", type=int, default=220,
                    help="constrained object store size (MiB); Ray's "
                         "floor is ~135")
    args = ap.parse_args()

    corpus_dir = os.path.join(
        tempfile.gettempdir(), f"chearch_spill_corpus_{args.docs}")
    with tempfile.TemporaryDirectory(prefix="chearch_spill_") as work:
        free = run_phase(corpus_dir, os.path.join(work, "idx_free"),
                         args.docs, store_mb=0)
        tight = run_phase(corpus_dir, os.path.join(work, "idx_tight"),
                          args.docs, store_mb=args.store_mb)

    identical = free["manifest_sha"] == tight["manifest_sha"]
    result = {
        "metric": "bounded_store_build_identical",
        "value": bool(identical),
        "docs": args.docs,
        "corpus_mb": free["corpus_mb"],
        "store_mb": args.store_mb,
        "unconstrained": free,
        "constrained": tight,
        "slowdown_x": round(tight["wall_s"] / max(free["wall_s"], 1e-9), 2),
        # how the executor absorbed the pressure: "throttled" = the
        # streaming backpressure kept the working set under the store
        # and no object ever spilled; "spilled" = the raylet paged
        # objects to disk.  Both are passing shapes for the 100-TB
        # claim — failure would be an OOM/ObjectStoreFullError abort
        # or divergent output bytes.
        "pressure_response": ("spilled" if tight["spill_requests"] > 0
                              else "throttled"),
    }
    print(json.dumps(result))
    if not identical:
        sys.exit("FAIL: constrained build diverged from unconstrained build")
    if args.store_mb >= free["corpus_mb"]:
        sys.exit("FAIL: store not smaller than the corpus — no pressure; "
                 "raise --docs or lower --store-mb")


if __name__ == "__main__":
    main()

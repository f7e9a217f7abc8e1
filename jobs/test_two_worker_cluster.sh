#!/usr/bin/env bash
# Two-WORKER cluster exercise (VERDICT r4 #4): the closest sandbox
# analogue to the reference's `-nl 2` multi-locale run
# (util/perf_run.sh:1-5).  Starts a driver-only head (0 CPUs) plus TWO
# resource-limited worker nodes on this host, then:
#
#   1. builds the index as a driver connected to that cluster — every
#      task MUST schedule on a worker (the head has no CPUs), so the
#      build exercises cross-node task placement and object transfer;
#   2. asserts the manifest is byte-identical to a standalone
#      in-process build of the same corpus;
#   3. serves queries through actor-pool searchers and asserts the
#      SPREAD placement put searcher-group actors on BOTH workers,
#      with results identical to the local engine's.
#
#   ./jobs/test_two_worker_cluster.sh [corpus.parquet] [work_dir]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CORPUS=${1:-/root/testdata/sf0.001/documents.parquet}
WORK=${2:-$(mktemp -d /tmp/two_worker.XXXXXX)}
PORT=${RAY_TEST_PORT:-6391}

cleanup() { ray stop --force >/dev/null 2>&1 || true; }
trap cleanup EXIT
cleanup  # a leftover cluster would absorb the starts below

# driver-only head: forces all compute onto the workers
ray start --head --num-cpus 0 --port "$PORT" >/dev/null 2>&1
ray start --address="127.0.0.1:$PORT" --num-cpus 2 >/dev/null 2>&1
ray start --address="127.0.0.1:$PORT" --num-cpus 2 >/dev/null 2>&1

# --segments 4: the 500-doc test corpus auto-plans to ONE segment,
# which would mean one searcher group — 4 segments give the SPREAD
# placement four actors to distribute across the two workers
RAY_ADDRESS="127.0.0.1:$PORT" PYTHONPATH="$REPO" \
  python "$REPO/jobs/build_job.py" \
    --input "$CORPUS" --index "$WORK/cluster_idx" --text-column text \
    --segments 4

# serve queries on the SAME live 2-worker cluster and check placement
RAY_ADDRESS="127.0.0.1:$PORT" PYTHONPATH="$REPO" python - "$WORK" "$CORPUS" <<'PY'
import sys

import ray

ray.init(address="auto")
from chearch_ray.state.engine import QueryEngine

work = sys.argv[1]
# the head is the node advertising no CPUs (a driver's own node id is
# whichever local node it registered with — NOT necessarily the head)
cpu_nodes = {n["NodeID"] for n in ray.nodes()
             if n["Alive"] and n["Resources"].get("CPU")}
head_nodes = {n["NodeID"] for n in ray.nodes()
              if n["Alive"] and not n["Resources"].get("CPU")}
assert len(cpu_nodes) == 2 and len(head_nodes) == 1, (cpu_nodes, head_nodes)
eng = QueryEngine(f"{work}/cluster_idx", use_actors=True)
nodes = eng.actor_nodes()
assert set(nodes) <= cpu_nodes, f"an actor landed on the 0-cpu head: {nodes}"
assert len(set(nodes)) >= 2, (
    f"searcher actors did not span both workers: {nodes}")
hits = eng.search("merge sort", k=5)
assert len(hits) == 5
local = QueryEngine(f"{work}/cluster_idx", use_actors=False)
assert hits.equals(local.search("merge sort", k=5)), "actor/local diverged"

# search-and-display across the same cluster: the docstore sidecar
# builds THROUGH the 2-worker exchange (head has 0 CPUs, so the
# shuffle + partition writes all run on the workers), then the 0xFE
# snippet wire frame serves BM25 + fetch + snippet over a real socket
# with the actor-pool engine behind it
import ray.data

from chearch_ray.serve import (TcpQueryServer, WireEngine,
                               query_snippets_pipelined)
from chearch_ray.state.docstore import build_docstore

corpus_path = sys.argv[2]
r = build_docstore(ray.data.read_parquet(corpus_path),
                   f"{work}/cluster_idx", text_column="text")
assert r["written"], "cluster docstore wrote nothing"
srv = TcpQueryServer(WireEngine(eng), port=0, pipelined=True).start_background()
try:
    wire = query_snippets_pipelined("127.0.0.1", srv.port,
                                    ["merge sort", "table scan"], k=5)
finally:
    srv.stop()
want = local.search_with_snippets("merge sort", k=5, default_op="and")
assert wire[0] is not None and [h[0] for h in wire[0]] == \
    want["doc_id"].to_pylist(), "cluster snippet serving diverged"
assert [h[3] for h in wire[0]] == want["snippet"].to_pylist()
eng.close()
print(f"OK: {len(nodes)} searcher actors across {len(set(nodes))} workers; "
      f"cross-node query results identical to in-process; docstore built "
      f"on-cluster ({len(r['written'])} partitions) and 0xFE snippet "
      f"serving matches the local engine")
PY
cleanup

RAY_ADDRESS=local PYTHONPATH="$REPO" \
  python "$REPO/jobs/build_job.py" \
    --input "$CORPUS" --index "$WORK/local_idx" --text-column text \
    --segments 4

PYTHONPATH="$REPO" python - "$WORK" "$CORPUS" <<'PY'
import glob
import hashlib
import sys

from chearch_ray.state.segment import Manifest

work = sys.argv[1]
a = Manifest.load(f"{work}/cluster_idx")
b = Manifest.load(f"{work}/local_idx")
assert a.num_docs == b.num_docs, (a.num_docs, b.num_docs)
for field in ("postings_parts", "docmap_parts"):
    sa = {p["part"]: p["sha"] for p in getattr(a, field)}
    sb = {p["part"]: p["sha"] for p in getattr(b, field)}
    assert sa == sb, f"{field} diverged"

# docstore determinism across schedulers: rebuild the sidecar locally
# and compare every partition file byte-for-byte with the on-cluster
# build (the sink sorts per partition, so bytes are plan-independent)
import ray
import ray.data

ray.init(address="local", num_cpus=4, include_dashboard=False)
from chearch_ray.state.docstore import build_docstore

build_docstore(ray.data.read_parquet(sys.argv[2]),
               f"{work}/local_idx", text_column="text")
ray.shutdown()

def shas(idx):
    return {p.split(idx, 1)[1]: hashlib.sha256(open(p, "rb").read()).hexdigest()
            for p in sorted(glob.glob(f"{idx}/docstore/part-*/data.parquet"))}

da, db = shas(f"{work}/cluster_idx"), shas(f"{work}/local_idx")
assert da and da == db, "docstore bytes diverged between cluster and local"
print(f"OK: two-worker build byte-identical to in-process build "
      f"({a.num_docs} docs, {len(a.postings_parts)} posting parts, "
      f"{len(da)} docstore partitions)")
PY

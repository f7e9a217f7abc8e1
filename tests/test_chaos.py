"""Hard-failure chaos tests for the build's fault-tolerance claims.

The north rule requires index builds to be "resumable from checkpoint
with per-partition lineage".  `tests/test_build.py::
test_resume_after_failure` covers the CONTROLLED failure (an exception
after N committed partitions).  These tests cover the UNCONTROLLED
ones the claim actually implies on a real cluster:

- a Ray WORKER process dies mid-partition (SIGKILL, no cleanup): Ray
  core must retry the task and the atomic tmp-dir+rename writers must
  absorb the torn first attempt — the finished index is byte-identical
  to an undisturbed build.
- the DRIVER process dies mid-shuffle (SIGKILL of the whole process
  group, the "node lost power" shape): a fresh driver resuming into
  the same directory must skip the lineage-committed partitions,
  rebuild the rest, and produce a byte-identical manifest.

Both use the `_control/sleep_per_part` hook (stages/postings.py) to
stretch partition commits so the kill window is deterministic on a
small corpus.
"""

from __future__ import annotations

import glob
import os
import signal
import subprocess
import sys
import textwrap
import threading
import time

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chearch_ray.config import EngineConfig
from chearch_ray.pipelines.build import build_index
from chearch_ray.sources.corpus import synthetic_corpus
from chearch_ray.state.segment import Manifest

CFG = EngineConfig(num_segments=2, num_term_shards=4)
N_DOCS = 800


def _postings_shas(index_dir: str) -> dict:
    m = Manifest.load(index_dir)
    return {p["part"]: p["sha"] for p in m.postings_parts}


def _our_raylet_pid() -> int | None:
    """PID of THIS session's raylet — workers are its direct children,
    which keeps the killer away from any other Ray session on the
    host (internal API, test-only; None if the layout changes)."""
    try:
        import ray

        return ray._private.worker._global_node.all_processes["raylet"][0].process.pid
    except Exception:
        return None


def _busy_ray_worker_pids(raylet_pid: int | None) -> list[int]:
    """PIDs of Ray worker processes currently EXECUTING a task (Ray
    retitles workers `ray::<TaskName>`; idle ones are `ray::IDLE`),
    restricted to children of `raylet_pid` when known."""
    out = []
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read().decode(errors="replace")
            if not (cmd.startswith("ray::") and "IDLE" not in cmd):
                continue
            if raylet_pid is not None:
                with open(f"/proc/{pid}/status") as f:
                    ppid = next(int(line.split()[1]) for line in f
                                if line.startswith("PPid:"))
                if ppid != raylet_pid:
                    continue
        except (OSError, StopIteration):
            continue
        out.append(int(pid))
    return out


def test_worker_sigkill_mid_build_byte_identical(ray_session, tmp_path):
    """SIGKILL a busy Ray worker while it holds an uncommitted postings
    partition: Ray retries the task, the atomic writer replaces any
    torn tmp output, and the index matches an undisturbed build
    byte-for-byte."""
    import ray.data

    corpus = synthetic_corpus(N_DOCS, seed=9, min_lines=5, max_lines=20)
    d_clean = str(tmp_path / "clean")
    build_index(ray.data.from_arrow(corpus), d_clean, CFG)

    d_chaos = str(tmp_path / "chaos")
    ctrl = os.path.join(d_chaos, "_control", "sleep_per_part")
    os.makedirs(os.path.dirname(ctrl))
    with open(ctrl, "w") as f:
        f.write("0.7")  # 12 parts x 0.7 s over 4 cpus ≈ 2 s kill window

    killed: list[int] = []
    stop = threading.Event()
    raylet_pid = _our_raylet_pid()

    def killer() -> None:
        deadline = time.monotonic() + 30.0
        while not stop.is_set() and time.monotonic() < deadline and len(killed) < 2:
            for pid in _busy_ray_worker_pids(raylet_pid):
                try:
                    os.kill(pid, signal.SIGKILL)
                except OSError:
                    continue
                killed.append(pid)
                time.sleep(0.5)  # let the retry get going before kill #2
                break
            time.sleep(0.05)

    t = threading.Thread(target=killer, daemon=True)
    t.start()
    try:
        build_index(ray.data.from_arrow(corpus), d_chaos, CFG)
    finally:
        stop.set()
        t.join(timeout=5)

    assert killed, "no worker was executing during the stretched window"
    os.remove(ctrl)
    assert _postings_shas(d_chaos) == _postings_shas(d_clean)


_DRIVER_SCRIPT = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, {repo!r})
    import ray, ray.data
    ray.init(address="local", num_cpus=2, include_dashboard=False,
             logging_level="ERROR")
    from chearch_ray.config import EngineConfig
    from chearch_ray.pipelines.build import build_index
    from chearch_ray.sources.corpus import synthetic_corpus
    corpus = synthetic_corpus({n_docs}, seed=9, min_lines=5, max_lines=20)
    build_index(ray.data.from_arrow(corpus), {index_dir!r},
                EngineConfig(num_segments=2, num_term_shards=4))
    """
)


def test_driver_sigkill_mid_shuffle_resume_byte_identical(ray_session, tmp_path):
    """SIGKILL the whole driver process group once >=1 partition has
    committed lineage (the node-lost shape: no exception handlers, no
    atexit, raylet dies too).  A fresh driver resuming into the same
    directory skips the committed partitions and finishes with a
    manifest byte-identical to an undisturbed build's."""
    import ray.data

    corpus = synthetic_corpus(N_DOCS, seed=9, min_lines=5, max_lines=20)
    d_clean = str(tmp_path / "clean")
    build_index(ray.data.from_arrow(corpus), d_clean, CFG)

    d_resume = str(tmp_path / "resumed")
    ctrl = os.path.join(d_resume, "_control", "sleep_per_part")
    os.makedirs(os.path.dirname(ctrl))
    with open(ctrl, "w") as f:
        f.write("1.0")  # 2-cpu subprocess: >=5 s between first and last commit

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.Popen(
        [sys.executable, "-c",
         _DRIVER_SCRIPT.format(repo=repo, n_docs=N_DOCS, index_dir=d_resume)],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        start_new_session=True,  # its Ray tree dies with one killpg
    )
    lineage_glob = os.path.join(d_resume, "_lineage", "postings-*.json")
    try:
        deadline = time.monotonic() + 180.0
        while time.monotonic() < deadline:
            if proc.poll() is not None:
                pytest.fail("subprocess build finished before the kill landed "
                            "(stretch sleep_per_part)")
            if len(glob.glob(lineage_glob)) >= 1:
                break
            time.sleep(0.1)
        else:
            pytest.fail("no lineage appeared within 180 s")
        os.killpg(proc.pid, signal.SIGKILL)
        proc.wait(timeout=30)
    finally:
        if proc.poll() is None:
            os.killpg(proc.pid, signal.SIGKILL)

    done_before = len(glob.glob(lineage_glob))
    assert done_before >= 1
    assert not os.path.exists(os.path.join(d_resume, "manifest.json"))

    os.remove(ctrl)
    build_index(ray.data.from_arrow(corpus), d_resume, CFG)  # resume

    with open(os.path.join(d_clean, "manifest.json"), "rb") as f:
        clean = f.read()
    with open(os.path.join(d_resume, "manifest.json"), "rb") as f:
        resumed = f.read()
    assert clean == resumed
    for p in Manifest.load(d_clean).postings_parts:
        assert os.path.exists(os.path.join(d_resume, p["path"]))

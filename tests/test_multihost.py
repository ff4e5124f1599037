"""Multi-host simulation tests: jax.distributed over local CPU processes.

ROADMAP quality item — the reference assumes Nextflow behaves identically
across executors and never tests it (SURVEY.md §4.6).  Here the multi-host
primitives (round-robin genome partition + byte all-gather used by the pan
pipeline) run under a real 2-process `jax.distributed` cluster.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from hite_tpu.parallel.multihost import merge_dicts, partition

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import pickle, sys
import jax
jax.config.update("jax_platforms", "cpu")
coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
jax.distributed.initialize(coordinator_address=coord, num_processes=nproc,
                           process_id=pid)
import numpy as np
from hite_tpu.parallel import multihost as mh

assert mh.process_count() == nproc
assert mh.process_index() == pid

# each process contributes a differently-sized payload
local = {f"genome_{i}": np.arange(i + 1 + pid * 10)
         for i, name in enumerate(mh.partition(list(range(5))))}
merged = mh.merge_dicts(mh.allgather_obj(local))
objs = mh.allgather_obj({"pid": pid, "data": b"x" * (100 * (pid + 1))})
assert [o["pid"] for o in objs] == list(range(nproc))
assert [len(o["data"]) for o in objs] == [100 * (p + 1) for p in range(nproc)]
print("MULTIHOST_OK", pid, len(merged), flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_partition_round_robin():
    items = list("abcdefg")
    parts = [partition(items, pid=p, nproc=3) for p in range(3)]
    assert parts[0] == ["a", "d", "g"]
    assert parts[1] == ["b", "e"]
    assert parts[2] == ["c", "f"]
    flat = [x for p in parts for x in p]
    assert sorted(flat) == sorted(items)


def test_merge_dicts_order():
    assert merge_dicts([{"a": 1}, {"b": 2}, {"a": 3}]) == {"a": 3, "b": 2}


def test_allgather_single_process():
    from hite_tpu.parallel.multihost import allgather_obj

    assert allgather_obj({"x": np.arange(3)})[0]["x"].tolist() == [0, 1, 2]


@pytest.mark.slow
def test_two_process_allgather():
    port = _free_port()
    coord = f"localhost:{port}"
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, coord, "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            env=env, cwd=REPO, text=True)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"MULTIHOST_OK {pid}" in out, out

"""Multi-process distributed tests (jax.distributed over N CPU processes).

The analog of the reference's MPI multi-rank registry: every test binary runs
at 1/2/4 ranks with identical results (tests/CMakeLists.txt:8-57,
cmake/SetupTests.cmake:17-47).  Here N separate Python processes join a
jax.distributed coordinator, each contributing virtual CPU devices to the
global mesh, and the slab-sharded V-cycle must reproduce the single-process
result shard-by-shard (see tests/_multiproc_worker.py).
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "_multiproc_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(nproc: int, local_devices: int, timeout: int = 420):
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), str(nproc), str(port),
             str(local_devices)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=os.path.dirname(os.path.dirname(_WORKER)))
        for pid in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert "MULTIPROC-OK" in out, f"worker {pid} output:\n{out}"


@pytest.mark.parametrize("nproc,local", [(2, 2), (4, 1)])
def test_multiprocess_spmd_vcycle_matches(nproc, local):
    """N processes x M local devices reproduce the single-process V-cycle
    (the 2-rank and 4-rank rows of the reference's test registry)."""
    _run_workers(nproc, local)

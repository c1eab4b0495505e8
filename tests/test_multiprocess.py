"""Multi-host simulation: 2 jax.distributed processes on localhost running a
cross-host collective (SURVEY.md §4 tier 3; replaces the reference's
never-exercised NCCL init)."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_collective():
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "mp_worker.py")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker sets platform itself
    procs = [subprocess.Popen([sys.executable, worker, str(port), str(i), "2"],
                              stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                              env=env, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=150)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process worker timed out")
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, err[-2000:]
        assert "MP_OK 24.0" in out  # 8 elems/proc * (1+2) summed = 24

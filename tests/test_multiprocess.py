"""True multi-process (DCN-simulated) execution: two jax.distributed
processes, each with 4 virtual CPU devices, run the row-sharded kernel
matvec and a preconditioned CG solve (tests/dcn_worker.py).

This covers what the in-process 8-device tests cannot: cross-process
GSPMD partitioning, the Gloo collective backend, and non-addressable
global arrays — the same code path a multi-host TPU pod uses over DCN
(SURVEY.md §5.8).
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_sharded_matvec_and_pcg():
    worker = os.path.join(os.path.dirname(__file__), "dcn_worker.py")
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert f"DCN-OK proc {i}" in out

"""Two-process jax.distributed execution test (SURVEY §4.8): the sharded TP
forward must run across a REAL process boundary, not just a single-process
virtual mesh — the working replacement for the reference's RPC distribution
path (ggml/src/ggml-rpc, tools/rpc/rpc-server.cpp).

Launch recipe documented here doubles as the multi-host run instruction:
on a real v5e pod slice, run one process per host with
VLUT_COORDINATOR=host0:port VLUT_NPROCS=N VLUT_PROC_ID=i and
distributed.global_mesh() places tp on ICI, dp on DCN.
"""

import os
import pathlib
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


def test_two_process_tp_forward():
    worker = pathlib.Path(__file__).parent / "_dist_worker.py"
    port = _free_port()
    env = {
        k: v for k, v in os.environ.items()
        if not k.startswith(("JAX_", "XLA_"))
    }
    repo_root = str(worker.parent.parent)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=str(worker.parent.parent),
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=840)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode(errors="replace"))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert "OK" in out

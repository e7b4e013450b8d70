"""Multi-host initialization + global meshes (replaces the reference's RPC
distribution, ggml/src/ggml-rpc — SURVEY §2.3 / §5 "distributed comm"):
jax.distributed over DCN between hosts, ICI collectives within a slice.

Axis placement rule (the scaling-book recipe): put **dp** (gradient/batch
all-reduce, infrequent + overlappable) across hosts on DCN and **tp/ep/sp**
(per-layer collectives) inside the slice on ICI.  `global_mesh` builds the
device array so the tp axis is ICI-contiguous.
"""

from __future__ import annotations

import os

import numpy as np
from jax.sharding import Mesh


def init_multihost(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize jax.distributed (idempotent).  With no args, relies on
    the TPU pod runtime's env (jax auto-detects on Cloud TPU); args mirror
    jax.distributed.initialize for manual clusters."""
    import jax

    if getattr(init_multihost, "_done", False):
        return
    kwargs = {}
    if coordinator or os.environ.get("VLUT_COORDINATOR"):
        kwargs = dict(
            coordinator_address=(
                coordinator or os.environ["VLUT_COORDINATOR"]
            ),
            num_processes=(
                num_processes or int(os.environ.get("VLUT_NPROCS", "1"))
            ),
            process_id=(
                process_id
                if process_id is not None
                else int(os.environ.get("VLUT_PROC_ID", "0"))
            ),
        )
    jax.distributed.initialize(**kwargs)
    init_multihost._done = True


def global_mesh(dp: int | None = None, tp: int | None = None) -> Mesh:
    """("dp", "tp") mesh over all global devices, tp contiguous within each
    host's devices so per-layer psums ride ICI; dp spans hosts (DCN)."""
    import jax

    devices = jax.devices()
    n = len(devices)
    local = jax.local_device_count()
    if tp is None:
        tp = min(local, n)
    if dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp({dp}) * tp({tp}) != {n} devices")
    # jax.devices() orders by process then local id -> reshaping (dp, tp)
    # keeps each tp group within one process when tp <= local_device_count
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))

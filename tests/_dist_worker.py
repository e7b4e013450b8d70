"""Worker for the two-process jax.distributed test (run by
test_distributed.py, SURVEY §4.8 recipe).  Each process owns 4 virtual CPU
devices; together they form an 8-device (dp=2, tp=4) mesh with dp spanning
processes (the DCN axis) and tp inside each process (the ICI axis) — the
layout distributed.global_mesh produces on real multi-host TPU.

Replaces-for-real what the reference does with its TCP RPC backend
(ggml/src/ggml-rpc/ggml-rpc.cpp + tools/rpc/rpc-server.cpp): weights are
sharded over processes and the forward's collectives cross the process
boundary.
"""

import os
import sys

os.environ["VLUT_PLATFORM"] = "cpu"

import jax

jax.config.update("jax_num_cpu_devices", 4)


def main():
    pid, port = int(sys.argv[1]), sys.argv[2]
    from vlut_tpu.parallel.distributed import global_mesh, init_multihost

    init_multihost(
        coordinator=f"127.0.0.1:{port}", num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vlut_tpu.config import PRESETS
    from vlut_tpu.models.transformer import forward, init_kv_cache, init_params
    from vlut_tpu.parallel.sharding import cache_specs, shard_params
    from vlut_tpu.parallel.spmd import make_forward_tp

    cfg = PRESETS["tiny_bitnet"]  # kv heads divisible by tp=4
    params = init_params(cfg, seed=0)  # deterministic: same on both procs
    rng = np.random.default_rng(0)
    b, t = 4, 6
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, t)), jnp.int32)
    pos = jnp.tile(jnp.arange(t, dtype=jnp.int32), (b, 1))
    logits_at = jnp.full((b,), t - 1, jnp.int32)

    # single-device reference (local)
    cache0 = init_kv_cache(cfg, b, max_len=32, dtype=jnp.float32)
    ref, _ = forward(
        params, cfg, tokens, pos, cache0, impl="xla", logits_at=logits_at
    )
    ref = np.asarray(ref)

    mesh = global_mesh(dp=2, tp=4)
    sp = shard_params(params, mesh, cfg)
    cache = init_kv_cache(cfg, b, max_len=32, dtype=jnp.float32)
    cache = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        cache, cache_specs(),
    )
    tokens_g = jax.device_put(tokens, NamedSharding(mesh, P("dp", None)))
    pos_g = jax.device_put(pos, NamedSharding(mesh, P("dp", None)))
    at_g = jax.device_put(logits_at, NamedSharding(mesh, P("dp")))
    fwd = jax.jit(make_forward_tp(cfg, mesh, params_tree=params, impl="xla"))
    got, _ = fwd(sp, cache, tokens_g, pos_g, at_g)

    # check this process's addressable dp rows against the reference
    ok = True
    for shard in got.addressable_shards:
        r0 = shard.index[0].start or 0
        local = np.asarray(shard.data)  # (rows, 1, V/tp)
        v0 = shard.index[2].start or 0
        want = ref[r0 : r0 + local.shape[0], :, v0 : v0 + local.shape[2]]
        if not np.allclose(local, want, rtol=0.05, atol=0.05):
            d = np.abs(local - want).max()
            print(f"proc {pid}: shard {shard.index} maxdiff {d}", flush=True)
            ok = False
    print(f"proc {pid}: {'OK' if ok else 'MISMATCH'}", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

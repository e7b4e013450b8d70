"""SPMD tests on the 8-device virtual CPU mesh (SURVEY §4.8).

Sharded (dp x tp) forward must agree with the single-device forward up to
activation-quant rounding noise (K-sharded matmuls quantize per shard, which
legally flips ties), with hard greedy/top-1 agreement.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from vlut_tpu.config import PRESETS
from vlut_tpu.models.transformer import forward, init_kv_cache, init_params
from vlut_tpu.parallel.sharding import (
    cache_specs,
    make_mesh,
    param_specs,
    shard_params,
)
from vlut_tpu.parallel.spmd import make_forward_tp


def _run_case(cfg, dp, tp, b=4, t=6):
    params = init_params(cfg, seed=0)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, t)), jnp.int32)
    pos = jnp.tile(jnp.arange(t, dtype=jnp.int32), (b, 1))
    logits_at = jnp.full((b,), t - 1, jnp.int32)

    # single-device reference
    cache0 = init_kv_cache(cfg, b, max_len=32, dtype=jnp.float32)
    ref, _ = forward(
        params, cfg, tokens, pos, cache0, impl="xla", logits_at=logits_at
    )

    mesh = make_mesh(dp=dp, tp=tp)
    sp = shard_params(params, mesh, cfg)
    cache = init_kv_cache(cfg, b, max_len=32, dtype=jnp.float32)
    cache = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        cache, cache_specs(),
    )
    fwd = jax.jit(make_forward_tp(cfg, mesh, params_tree=params, impl="xla"))
    got, new_cache = fwd(sp, cache, tokens, pos, logits_at)
    return np.asarray(ref), np.asarray(got), new_cache


@pytest.mark.parametrize(
    "preset,dp,tp",
    [
        ("tiny", 1, 2),          # llama, GQA kv=2
        ("tiny", 4, 2),          # dp x tp
        ("tiny_bitnet", 1, 4),   # subnorm psum path
        ("tiny_bitnet", 2, 4),   # full mesh
    ],
)
def test_tp_matches_single_device(preset, dp, tp):
    cfg = PRESETS[preset]
    ref, got, _ = _run_case(cfg, dp, tp)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=0.05, atol=0.05)
    assert (got.argmax(-1) == ref.argmax(-1)).all()


def test_cache_sharding_layout():
    cfg = PRESETS["tiny_bitnet"]
    _, _, cache = _run_case(cfg, 2, 4)
    shard = cache["k"].sharding
    # trailing Nones are normalized away in the reported spec
    assert tuple(shard.spec) in (
        (None, "dp", None, "tp", None),
        (None, "dp", None, "tp"),
    )


def test_mesh_shapes():
    mesh = make_mesh(dp=2, tp=4)
    assert mesh.shape == {"dp": 2, "tp": 4}
    assert len(jax.devices()) == 8


# --- ep / sp / pp (new parallel axes; SURVEY §2.3 taxonomy) ------------------


def test_ep_matches_single_device():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from vlut_tpu.parallel.spmd import make_forward_ep

    cfg = PRESETS["tiny_moe"]
    params = init_params(cfg, seed=0)
    rng = np.random.default_rng(0)
    b, t = 2, 8
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, t)), jnp.int32)
    pos = jnp.tile(jnp.arange(t, dtype=jnp.int32), (b, 1))
    ref, _ = forward(params, cfg, tokens, pos, None, impl="xla")

    devices = np.asarray(jax.devices()[:4]).reshape(4)
    mesh = Mesh(devices, ("ep",))
    fwd = jax.jit(make_forward_ep(cfg, mesh, params, impl="xla"))
    got = fwd(params, tokens, pos)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_sp_matches_single_device():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from vlut_tpu.parallel.spmd import make_forward_sp

    cfg = PRESETS["tiny"]
    params = init_params(cfg, seed=0)
    rng = np.random.default_rng(1)
    b, t = 2, 16  # t divides by sp=4
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, t)), jnp.int32)
    pos = jnp.tile(jnp.arange(t, dtype=jnp.int32), (b, 1))
    ref, _ = forward(params, cfg, tokens, pos, None, impl="xla")

    devices = np.asarray(jax.devices()[:4]).reshape(4)
    mesh = Mesh(devices, ("sp",))
    fwd = jax.jit(make_forward_sp(cfg, mesh, impl="xla"))
    got = fwd(params, tokens, pos)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=5e-4, atol=5e-4
    )


def test_pp_matches_single_device():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from vlut_tpu.parallel.pipeline import make_forward_pp

    cfg = PRESETS["tiny"]  # 2 layers -> pp=2, 1 layer per stage
    params = init_params(cfg, seed=0)
    rng = np.random.default_rng(2)
    b, t = 4, 8
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, t)), jnp.int32)
    pos = jnp.tile(jnp.arange(t, dtype=jnp.int32), (b, 1))
    ref, _ = forward(params, cfg, tokens, pos, None, impl="xla")

    devices = np.asarray(jax.devices()[:2]).reshape(2)
    mesh = Mesh(devices, ("pp",))
    fwd = jax.jit(make_forward_pp(cfg, mesh, params, n_microbatches=2,
                                  impl="xla"))
    got = fwd(params, tokens, pos)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=5e-4, atol=5e-4
    )

"""Finetune / QAT tests (reference: ggml-opt + examples/training).

Float twin must reproduce the dequant forward exactly; train steps must
reduce loss; QAT round-trips back into a servable packed checkpoint; the
SPMD train step matches the single-device step."""

import numpy as np
import optax
import jax
import jax.numpy as jnp

from vlut_tpu.config import PRESETS
from vlut_tpu.models.transformer import forward, init_params
from vlut_tpu.train.finetune import (
    causal_lm_loss,
    dense_param_specs,
    float_twin_params,
    make_sharded_train_step,
    make_train_step,
    pack_params,
    ste_ternarize,
)


def _toy_batch(cfg, b=2, t=12, seed=0):
    rng = np.random.default_rng(seed)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, t)), jnp.int32)
    mask = jnp.ones((b, t), bool)
    return tokens, mask


def test_float_twin_matches_dequant():
    cfg = PRESETS["tiny"]
    params = init_params(cfg, seed=0)
    twin = float_twin_params(params, cfg)
    tokens, _ = _toy_batch(cfg)
    pos = jnp.tile(jnp.arange(tokens.shape[1], dtype=jnp.int32), (2, 1))
    a, _ = forward(twin, cfg, tokens, pos, None)
    b_, _ = forward(params, cfg, tokens, pos, None, impl="dequant")
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(b_), rtol=2e-2, atol=2e-2
    )
    # greedy agreement (bf16 activations vs fp32 twin dots)
    assert (
        np.asarray(a).argmax(-1) == np.asarray(b_).argmax(-1)
    ).mean() > 0.95


def test_float_twin_moe():
    cfg = PRESETS["tiny_moe"]
    params = init_params(cfg, seed=0)
    twin = float_twin_params(params, cfg)
    assert twin["layers"]["w_gate"]["dense"].ndim == 4
    tokens, _ = _toy_batch(cfg)
    pos = jnp.tile(jnp.arange(tokens.shape[1], dtype=jnp.int32), (2, 1))
    a, _ = forward(twin, cfg, tokens, pos, None)
    assert np.isfinite(np.asarray(a)).all()


def test_ste_identity_gradient():
    w = jnp.asarray(np.random.default_rng(0).standard_normal((8, 8)),
                    jnp.float32)
    g = jax.grad(lambda x: (ste_ternarize(x) * 2.0).sum())(w)
    np.testing.assert_allclose(np.asarray(g), 2.0 * np.ones((8, 8)))


def test_train_step_reduces_loss():
    cfg = PRESETS["tiny"]
    params = float_twin_params(init_params(cfg, seed=0), cfg)
    opt = optax.adamw(3e-3)
    opt_state = opt.init(params)
    step = make_train_step(cfg, opt)
    tokens, mask = _toy_batch(cfg)
    losses = []
    for _ in range(8):
        params, opt_state, loss = step(params, opt_state, tokens, mask)
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.1, losses


def test_qat_step_and_repack():
    cfg = PRESETS["tiny"]
    params = float_twin_params(init_params(cfg, seed=0), cfg)
    opt = optax.adamw(3e-3)
    opt_state = opt.init(params)
    step = make_train_step(cfg, opt, qat=True)
    tokens, mask = _toy_batch(cfg)
    losses = []
    for _ in range(8):
        params, opt_state, loss = step(params, opt_state, tokens, mask)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    # repack into a servable ternary checkpoint
    packed = pack_params(jax.tree.map(np.asarray, params), cfg)
    packed = jax.tree.map(jnp.asarray, packed)
    pos = jnp.tile(jnp.arange(tokens.shape[1], dtype=jnp.int32), (2, 1))
    logits, _ = forward(packed, cfg, tokens, pos, None, impl="xla")
    assert np.isfinite(np.asarray(logits)).all()
    # packed forward tracks the STE (dequant) forward the training saw
    l_deq, _ = forward(packed, cfg, tokens, pos, None, impl="dequant")
    ste_logits, _ = forward(
        {**params, "layers": {
            k: ({"dense": ste_ternarize(v["dense"])}
                if isinstance(v, dict) and "dense" in v else v)
            for k, v in params["layers"].items()
        }}, cfg, tokens, pos, None,
    )
    agree = (
        np.asarray(l_deq)[..., : cfg.vocab_size].argmax(-1)
        == np.asarray(ste_logits)[..., : cfg.vocab_size].argmax(-1)
    ).mean()
    assert agree > 0.9


def test_sharded_train_step_matches_single():
    # SGD: updates are proportional to grads, so single-vs-SPMD agreement is
    # a direct gradient check (AdamW's mu/sqrt(nu) is sign-unstable where
    # grad ~ 0 and would amplify benign reduction-order noise to +-lr)
    cfg = PRESETS["tiny"]
    params = float_twin_params(init_params(cfg, seed=0), cfg)
    # f32 everywhere so single-vs-SPMD agreement isn't blurred by bf16
    # reduction-order noise
    params = jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        params,
    )
    opt = optax.sgd(0.1)
    opt_state = opt.init(params)
    tokens, mask = _toy_batch(cfg, b=4)

    # single-device reference
    step1 = make_train_step(cfg, opt)
    p1, o1, loss1 = step1(
        jax.tree.map(jnp.copy, params),
        jax.tree.map(jnp.copy, opt_state), tokens, mask,
    )

    from vlut_tpu.parallel.sharding import make_mesh

    mesh = make_mesh(dp=2, tp=2)
    make, pspecs = make_sharded_train_step(cfg, mesh, params, opt)
    stepN = make(opt_state)
    from jax.sharding import NamedSharding

    sparams = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, pspecs,
        is_leaf=lambda x: isinstance(x, (jax.Array, np.ndarray)),
    )
    sopt = opt.init(sparams)
    pN, oN, lossN = stepN(sparams, sopt, tokens, mask)
    np.testing.assert_allclose(float(lossN), float(loss1), rtol=2e-4)
    # updated weights agree (gather one sharded tensor and compare)
    a = np.asarray(p1["layers"]["wq"]["dense"])
    b_ = np.asarray(jax.device_get(pN["layers"]["wq"]["dense"]))
    np.testing.assert_allclose(a, b_, rtol=2e-3, atol=2e-5)

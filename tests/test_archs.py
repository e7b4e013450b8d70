"""Arch-superset tests: MoE, qk-norm, qkv-bias, gemma2 features, SWA, rope
scaling variants (reference: src/models/*.cpp graph builders re-expressed as
config switches; build_moe_ffn src/llama-graph.cpp:1045)."""

import dataclasses

import numpy as np
import pytest
import jax.numpy as jnp

from vlut_tpu.config import PRESETS
from vlut_tpu.models.transformer import forward, init_kv_cache, init_params


def _fwd(cfg, params, t=8, b=2, seed=0, impl="xla"):
    rng = np.random.default_rng(seed)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, t)), jnp.int32)
    pos = jnp.tile(jnp.arange(t, dtype=jnp.int32), (b, 1))
    logits, _ = forward(params, cfg, tokens, pos, None, impl=impl)
    return np.asarray(logits)


@pytest.mark.parametrize(
    "arch", ["tiny_qwen2", "tiny_qwen3", "tiny_gemma2", "tiny_moe",
             "tiny_granite", "tiny_mla"]
)
def test_forward_finite(arch):
    cfg = PRESETS[arch]
    params = init_params(cfg, seed=0)
    out = _fwd(cfg, params)
    assert np.isfinite(out).all()


@pytest.mark.parametrize(
    "arch", ["tiny_qwen2", "tiny_qwen3", "tiny_gemma2", "tiny_moe",
             "tiny_granite", "tiny_mla"]
)
def test_cache_matches_no_cache(arch):
    cfg = PRESETS[arch]
    params = init_params(cfg, seed=0)
    b, t = 2, 10
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, t)), jnp.int32)
    pos = jnp.tile(jnp.arange(t, dtype=jnp.int32), (b, 1))
    ref, _ = forward(params, cfg, tokens, pos, None, impl="xla")
    cache = init_kv_cache(cfg, b, max_len=32, dtype=jnp.float32)
    got, _ = forward(params, cfg, tokens, pos, cache, impl="xla")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_moe_identical_experts_router_invariant():
    """If all experts are identical, the output must not depend on the
    router (combine weights sum to 1) — validates top-k + normalization."""
    cfg = PRESETS["tiny_moe"]
    params = init_params(cfg, seed=0)
    # make every expert a copy of expert 0
    for nm in ("w_gate", "w_up", "w_down"):
        p = np.array(params["layers"][nm]["packed"])
        s = np.array(params["layers"][nm]["scale"])
        p[:, 1:] = p[:, :1]
        s[:, 1:] = s[:, :1]
        params["layers"][nm]["packed"] = jnp.asarray(p)
        params["layers"][nm]["scale"] = jnp.asarray(s)

    rng = np.random.default_rng(2)
    out_a = _fwd(cfg, params, seed=3)
    params["layers"]["router"] = jnp.asarray(
        rng.standard_normal(params["layers"]["router"].shape), jnp.float32
    )
    out_b = _fwd(cfg, params, seed=3)
    np.testing.assert_allclose(out_a, out_b, rtol=1e-4, atol=1e-4)


def test_moe_router_selects_experts():
    """A router hard-biased to experts {0} vs {1} must give different
    outputs when experts differ (top-k actually routes)."""
    cfg = dataclasses.replace(PRESETS["tiny_moe"], n_experts_used=1)
    params = init_params(cfg, seed=0)
    r = np.zeros(params["layers"]["router"].shape, np.float32)
    r[:, :, 0] = 100.0
    params["layers"]["router"] = jnp.asarray(r)
    out0 = _fwd(cfg, params, seed=4)
    r = np.zeros(r.shape, np.float32)
    r[:, :, 1] = 100.0
    params["layers"]["router"] = jnp.asarray(r)
    out1 = _fwd(cfg, params, seed=4)
    assert np.abs(out0 - out1).max() > 1e-3


def test_qkv_bias_zero_matches_plain():
    """tiny_qwen2 with zeroed biases == plain tiny llama on the same
    weights (bias add is the only difference)."""
    cfg_b = PRESETS["tiny_qwen2"]
    cfg_p = PRESETS["tiny"]
    params = init_params(cfg_b, seed=0)
    for nm in ("bq", "bk", "bv"):
        params["layers"][nm] = jnp.zeros_like(params["layers"][nm])
    out_b = _fwd(cfg_b, params, seed=5)
    plain = {
        **params,
        "layers": {
            k: v for k, v in params["layers"].items()
            if k not in ("bq", "bk", "bv")
        },
    }
    out_p = _fwd(cfg_p, plain, seed=5)
    np.testing.assert_allclose(out_b, out_p, rtol=1e-5, atol=1e-5)


def test_qkv_bias_changes_output():
    cfg = PRESETS["tiny_qwen2"]
    params = init_params(cfg, seed=0)
    out_a = _fwd(cfg, params, seed=5)
    params["layers"]["bq"] = params["layers"]["bq"] + 1.0
    out_b = _fwd(cfg, params, seed=5)
    assert np.abs(out_a - out_b).max() > 1e-4


def test_gemma2_softcap_bounds_logits():
    cfg = PRESETS["tiny_gemma2"]
    params = init_params(cfg, seed=0)
    out = _fwd(cfg, params)
    assert np.abs(out).max() <= cfg.final_logit_softcap + 1e-3


def test_embed_scale_matches_prescaled():
    # untied head: with tied embeddings pre-scaling would also scale lm_head
    cfg_s = dataclasses.replace(PRESETS["tiny_gemma2"], tie_embeddings=False)
    cfg_n = dataclasses.replace(cfg_s, embed_scale=0.0)
    params = init_params(cfg_s, seed=0)
    out_scaled = _fwd(cfg_s, params, seed=6)
    pre = dict(params)
    pre["embed"] = (
        params["embed"].astype(jnp.float32) * cfg_s.embed_scale
    ).astype(params["embed"].dtype)
    out_pre = _fwd(cfg_n, pre, seed=6)
    np.testing.assert_allclose(out_scaled, out_pre, rtol=1e-3, atol=1e-3)


def test_sliding_window_masks_old_tokens():
    """Sequences shorter than the window match the no-window model; longer
    sequences diverge (old keys masked out on SWA layers)."""
    cfg_w = PRESETS["tiny_gemma2"]
    cfg_g = dataclasses.replace(cfg_w, sliding_window=0)
    params = init_params(cfg_w, seed=0)
    short = _fwd(cfg_w, params, t=8, seed=7)
    short_g = _fwd(cfg_g, params, t=8, seed=7)
    np.testing.assert_allclose(short, short_g, rtol=1e-5, atol=1e-5)
    long_w = _fwd(cfg_w, params, t=32, seed=7)
    long_g = _fwd(cfg_g, params, t=32, seed=7)
    assert np.abs(long_w - long_g).max() > 1e-4
    # the global layers keep full attention: only positions past the window
    # can differ, early positions must agree
    np.testing.assert_allclose(
        long_w[:, : cfg_w.sliding_window],
        long_g[:, : cfg_w.sliding_window],
        rtol=1e-5, atol=1e-5,
    )


def test_qk_norm_smoke_and_effect():
    cfg_n = PRESETS["tiny_qwen3"]
    cfg_p = dataclasses.replace(cfg_n, qk_norm=False)
    params = init_params(cfg_n, seed=0)
    out_n = _fwd(cfg_n, params, seed=8)
    plain = {
        **params,
        "layers": {
            k: v for k, v in params["layers"].items()
            if k not in ("q_norm", "k_norm")
        },
    }
    out_p = _fwd(cfg_p, plain, seed=8)
    assert np.isfinite(out_n).all()
    assert np.abs(out_n - out_p).max() > 1e-4  # norm actually applied


# --- rope scaling variants ---------------------------------------------------


def test_rope_yarn_interpolates():
    from vlut_tpu.ops.rope import _inv_freq

    base, ms0 = _inv_freq(64, 10000.0, None)
    yarn, ms = _inv_freq(
        64, 10000.0,
        {"rope_type": "yarn", "factor": 4.0,
         "original_max_position_embeddings": 1024},
    )
    base, yarn = np.asarray(base), np.asarray(yarn)
    assert ms0 == 1.0 and ms > 1.0  # attention temperature engaged
    # low-frequency (long-wavelength) dims are interpolated (smaller freq),
    # highest-frequency dims are (near-)extrapolated (unchanged)
    np.testing.assert_allclose(yarn[0], base[0], rtol=1e-5)
    assert yarn[-1] < base[-1] * 0.9


def test_rope_linear_divides():
    from vlut_tpu.ops.rope import _inv_freq

    base, _ = _inv_freq(32, 10000.0, None)
    lin, ms = _inv_freq(32, 10000.0, {"rope_type": "linear", "factor": 2.0})
    np.testing.assert_allclose(np.asarray(lin), np.asarray(base) / 2.0)
    assert ms == 1.0


def test_rope_longrope_per_dim_factors():
    from vlut_tpu.ops.rope import _inv_freq

    factors = [1.0] * 8 + [4.0] * 8
    base, _ = _inv_freq(32, 10000.0, None)
    lr, ms = _inv_freq(
        32, 10000.0,
        {"rope_type": "longrope", "long_factor": factors,
         "original_max_position_embeddings": 1024,
         "max_position_embeddings": 4096},
    )
    np.testing.assert_allclose(np.asarray(lr)[:8], np.asarray(base)[:8])
    np.testing.assert_allclose(np.asarray(lr)[8:], np.asarray(base)[8:] / 4.0)
    assert ms > 1.0


def test_rope_unknown_type_raises():
    from vlut_tpu.ops.rope import _inv_freq

    with pytest.raises(ValueError):
        _inv_freq(32, 10000.0, {"rope_type": "ntk-banana"})


def test_granite_logit_scale():
    """logit_scale must multiply logits exactly (granite logits_scaling /
    minicpm dim_model_base ratio; residual/embed multipliers covered by
    test_embed_scale_matches_prescaled + convert-time folds)."""
    cfg = PRESETS["tiny_granite"]
    params = init_params(cfg, seed=0)
    out = _fwd(cfg, params)
    assert np.isfinite(out).all()
    cfg1 = dataclasses.replace(cfg, logit_scale=1.0)
    ref = _fwd(cfg1, params)
    np.testing.assert_allclose(out, ref * cfg.logit_scale, rtol=1e-6)

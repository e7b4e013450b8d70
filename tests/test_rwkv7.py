"""RWKV7 (reference: src/models/rwkv7.cpp + rwkv7-base.cpp graphs,
ggml_rwkv_wkv7 recurrence in ggml-cpu/ops.cpp).

No HF-transformers implementation exists (HF Rwkv is v4), so verification
is: (a) the wkv7 lax.scan against a direct numpy transcription of the
reference kernel's scalar loop, (b) recurrent-state consistency
(split prefill == one prefill), (c) converter roundtrip from the HF name
scheme the reference converter registers."""

import json

import numpy as np
import pytest
import jax
import jax.numpy as jnp

pytest.importorskip("torch")

from vlut_tpu.convert.checkpoint import load_checkpoint
from vlut_tpu.convert.rwkv import convert_rwkv7
from vlut_tpu.models.rwkv import Rwkv7Config, _wkv7_scan, forward, init_state

V, D, L, HS = 64, 32, 2, 8
H = D // HS


def _np_wkv7(r, w, k, v, a, b, S0):
    """Direct transcription of ggml_compute_forward_rwkv_wkv7_f32's scalar
    loop (state[i][j]: i = value dim, j = key dim)."""
    B, T, Hh, hs = r.shape
    S = S0.copy()
    out = np.zeros_like(r)
    for bb in range(B):
        for t in range(T):
            for h in range(Hh):
                for i in range(hs):
                    sa = float(np.dot(a[bb, t, h], S[bb, h, i]))
                    S[bb, h, i] = (S[bb, h, i] * w[bb, t, h]
                                   + v[bb, t, h, i] * k[bb, t, h]
                                   + sa * b[bb, t, h])
                    out[bb, t, h, i] = float(np.dot(S[bb, h, i],
                                                    r[bb, t, h]))
    return out, S


def test_wkv7_scan_matches_reference_loop():
    rng = np.random.default_rng(20)
    B, T = 2, 5
    sh = (B, T, H, HS)
    r, k, v = (rng.standard_normal(sh).astype(np.float32) * 0.5
               for _ in range(3))
    w = rng.uniform(0.6, 0.99, sh).astype(np.float32)
    kk = rng.standard_normal(sh).astype(np.float32)
    kk /= np.linalg.norm(kk, axis=-1, keepdims=True)
    aa = rng.uniform(0, 1, sh).astype(np.float32)
    S0 = rng.standard_normal((B, H, HS, HS)).astype(np.float32) * 0.1
    want, S_want = _np_wkv7(r, w, k, v, -kk, kk * aa, S0)
    got, S_got = _wkv7_scan(*map(jnp.asarray, (r, w, k, v, -kk, kk * aa)),
                            jnp.asarray(S0))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(S_got), S_want, rtol=2e-5,
                               atol=2e-5)


def _mk_ckpt(tmp_path):
    from safetensors.numpy import save_file

    rng = np.random.default_rng(21)
    rk_, rg = 4, 4

    def lin(n_out, n_in, s=0.2):
        return rng.standard_normal((n_out, n_in)).astype(np.float32) * s

    t = {"model.embeddings.weight": lin(V, D, 0.02).T.T,
         "model.pre_ln.weight": np.ones(D, np.float32),
         "model.pre_ln.bias": np.zeros(D, np.float32),
         "model.ln_out.weight": np.ones(D, np.float32),
         "model.ln_out.bias": np.zeros(D, np.float32),
         "head.weight": lin(V, D, 0.1)}
    for i in range(L):
        p = f"model.layers.{i}."
        for nm in ("ln1", "ln2"):
            t[p + nm + ".weight"] = np.abs(
                rng.standard_normal(D)).astype(np.float32) + 0.5
            t[p + nm + ".bias"] = rng.standard_normal(
                D).astype(np.float32) * 0.05
        for b_ in ("r", "w", "k", "v", "a", "g"):
            t[p + f"attention.x_{b_}"] = rng.uniform(
                0, 1, (1, 1, D)).astype(np.float32)
        t[p + "attention.w0"] = rng.standard_normal(
            (1, 1, D)).astype(np.float32)
        t[p + "attention.w1"] = lin(D, rk_).reshape(D, rk_)
        t[p + "attention.w2"] = lin(rk_, D).reshape(rk_, D)
        t[p + "attention.a0"] = rng.standard_normal(
            (1, 1, D)).astype(np.float32) * 0.5
        t[p + "attention.a1"] = lin(D, rk_).reshape(D, rk_)
        t[p + "attention.a2"] = lin(rk_, D).reshape(rk_, D)
        if i > 0:
            t[p + "attention.v0"] = rng.standard_normal(
                (1, 1, D)).astype(np.float32) * 0.5
            t[p + "attention.v1"] = lin(D, rk_).reshape(D, rk_)
            t[p + "attention.v2"] = lin(rk_, D).reshape(rk_, D)
        t[p + "attention.g1"] = lin(D, rg).reshape(D, rg)
        t[p + "attention.g2"] = lin(rg, D).reshape(rg, D)
        t[p + "attention.k_k"] = rng.uniform(
            0.5, 1.5, (1, 1, D)).astype(np.float32)
        t[p + "attention.k_a"] = rng.uniform(
            0, 1, (1, 1, D)).astype(np.float32)
        t[p + "attention.r_k"] = rng.standard_normal(
            (H, HS)).astype(np.float32) * 0.2
        t[p + "attention.receptance.weight"] = lin(D, D)
        t[p + "attention.key.weight"] = lin(D, D)
        t[p + "attention.value.weight"] = lin(D, D)
        t[p + "attention.output.weight"] = lin(D, D)
        t[p + "attention.ln_x.weight"] = np.abs(
            rng.standard_normal(D)).astype(np.float32) + 0.5
        t[p + "attention.ln_x.bias"] = rng.standard_normal(
            D).astype(np.float32) * 0.05
        t[p + "feed_forward.x_k"] = rng.uniform(
            0, 1, (1, 1, D)).astype(np.float32)
        t[p + "feed_forward.key.weight"] = lin(2 * D, D)
        t[p + "feed_forward.value.weight"] = lin(D, 2 * D)
    (tmp_path / "hf").mkdir()
    (tmp_path / "hf" / "config.json").write_text(json.dumps({
        "model_type": "rwkv7", "architectures": ["Rwkv7ForCausalLM"],
        "vocab_size": V, "hidden_size": D, "num_hidden_layers": L,
        "head_size": HS, "intermediate_size": 2 * D,
        "layer_norm_epsilon": 1e-5, "wkv_has_gate": True,
        "tie_word_embeddings": False,
    }))
    save_file({k: np.ascontiguousarray(v) for k, v in t.items()},
              str(tmp_path / "hf" / "model.safetensors"))
    cfg = convert_rwkv7(tmp_path / "hf", tmp_path / "out")
    cfg2, params, _ = load_checkpoint(tmp_path / "out")
    params = jax.tree.map(jnp.asarray, params)
    return cfg2, params


def test_rwkv7_forward_and_state_carry(tmp_path):
    cfg, params = _mk_ckpt(tmp_path)
    assert cfg.head_size == HS and cfg.has_gate
    rng = np.random.default_rng(22)
    toks = rng.integers(0, V, (2, 10))
    full, _ = forward(params, cfg, jnp.asarray(toks, jnp.int32))
    assert np.isfinite(np.asarray(full)).all()
    st = init_state(cfg, 2)
    _, st = forward(params, cfg, jnp.asarray(toks[:, :6], jnp.int32), st)
    part, _ = forward(params, cfg, jnp.asarray(toks[:, 6:], jnp.int32), st)
    np.testing.assert_allclose(
        np.asarray(part), np.asarray(full)[:, 6:], rtol=2e-4, atol=2e-4
    )
    # the wkv state must actually matter: zeroed state != carried state
    fresh, _ = forward(
        params, cfg, jnp.asarray(toks[:, 6:], jnp.int32), init_state(cfg, 2)
    )
    assert np.abs(np.asarray(fresh) - np.asarray(part)).max() > 1e-4


def test_arwkv7_forward_and_state_carry(tmp_path):
    """arwkv7 (reference src/models/arwkv7.cpp): rwkv7 time mix inside a
    qwen-style body — RMS norms, SwiGLU FFN, no embedding pre-LN."""
    from safetensors.numpy import save_file

    rng = np.random.default_rng(23)
    rk_ = 4

    def lin(n_out, n_in, s=0.2):
        return rng.standard_normal((n_out, n_in)).astype(np.float32) * s

    t = {"model.embed_tokens.weight": lin(V, D, 0.02),
         "model.norm.weight": np.ones(D, np.float32),
         "lm_head.weight": lin(V, D, 0.1)}
    for i in range(L):
        p = f"model.layers.{i}."
        t[p + "input_layernorm.weight"] = np.abs(
            rng.standard_normal(D)).astype(np.float32) + 0.5
        t[p + "post_attention_layernorm.weight"] = np.abs(
            rng.standard_normal(D)).astype(np.float32) + 0.5
        for b_ in ("r", "w", "k", "v", "a", "g"):
            t[p + f"self_attn.x_{b_}"] = rng.uniform(
                0, 1, (1, 1, D)).astype(np.float32)
        t[p + "self_attn.w0"] = rng.standard_normal(
            (1, 1, D)).astype(np.float32)
        t[p + "self_attn.w1"] = lin(D, rk_).reshape(D, rk_)
        t[p + "self_attn.w2"] = lin(rk_, D).reshape(rk_, D)
        t[p + "self_attn.a0"] = rng.standard_normal(
            (1, 1, D)).astype(np.float32) * 0.5
        t[p + "self_attn.a1"] = lin(D, rk_).reshape(D, rk_)
        t[p + "self_attn.a2"] = lin(rk_, D).reshape(rk_, D)
        if i > 0:
            t[p + "self_attn.v0"] = rng.standard_normal(
                (1, 1, D)).astype(np.float32) * 0.5
            t[p + "self_attn.v1"] = lin(D, rk_).reshape(D, rk_)
            t[p + "self_attn.v2"] = lin(rk_, D).reshape(rk_, D)
        t[p + "self_attn.g1"] = lin(D, rk_).reshape(D, rk_)
        t[p + "self_attn.g2"] = lin(rk_, D).reshape(rk_, D)
        t[p + "self_attn.k_k"] = rng.uniform(
            0.5, 1.5, (1, 1, D)).astype(np.float32)
        t[p + "self_attn.k_a"] = rng.uniform(
            0, 1, (1, 1, D)).astype(np.float32)
        t[p + "self_attn.r_k"] = rng.standard_normal(
            (H, HS)).astype(np.float32) * 0.2
        t[p + "self_attn.receptance.weight"] = lin(D, D)
        t[p + "self_attn.key.weight"] = lin(D, D)
        t[p + "self_attn.value.weight"] = lin(D, D)
        t[p + "self_attn.output.weight"] = lin(D, D)
        t[p + "self_attn.ln_x.weight"] = np.abs(
            rng.standard_normal(D)).astype(np.float32) + 0.5
        t[p + "self_attn.ln_x.bias"] = rng.standard_normal(
            D).astype(np.float32) * 0.05
        t[p + "mlp.gate_proj.weight"] = lin(2 * D, D)
        t[p + "mlp.up_proj.weight"] = lin(2 * D, D)
        t[p + "mlp.down_proj.weight"] = lin(D, 2 * D)
    (tmp_path / "hf").mkdir()
    (tmp_path / "hf" / "config.json").write_text(json.dumps({
        "model_type": "rwkv_hybrid",
        "architectures": ["RwkvHybridForCausalLM"],
        "vocab_size": V, "hidden_size": D, "num_hidden_layers": L,
        "head_size": HS, "intermediate_size": 2 * D,
        "rms_norm_eps": 1e-6, "wkv_has_gate": True, "wkv_version": 7,
        "tie_word_embeddings": False,
    }))
    save_file({k: np.ascontiguousarray(v) for k, v in t.items()},
              str(tmp_path / "hf" / "model.safetensors"))
    from vlut_tpu.convert.convert import convert_hf

    cfg = convert_hf(tmp_path / "hf", tmp_path / "out")
    assert cfg.arch == "arwkv7"
    cfg2, params, _ = load_checkpoint(tmp_path / "out")
    params = jax.tree.map(jnp.asarray, params)
    toks = rng.integers(0, V, (1, 9))
    full, _ = forward(params, cfg2, jnp.asarray(toks, jnp.int32))
    assert np.isfinite(np.asarray(full)).all()
    st = init_state(cfg2, 1)
    _, st = forward(params, cfg2, jnp.asarray(toks[:, :5], jnp.int32), st)
    part, _ = forward(params, cfg2, jnp.asarray(toks[:, 5:], jnp.int32), st)
    np.testing.assert_allclose(
        np.asarray(part), np.asarray(full)[:, 5:], rtol=2e-4, atol=2e-4
    )


# --- RWKV6 -------------------------------------------------------------------

from vlut_tpu.models.rwkv import (  # noqa: E402
    Rwkv6Config,
    _gla_scan,
    _wkv6_scan,
    forward6,
    init_state6,
)


def _np_wkv6(r, w, k, v, u, S0):
    """Transcription of ggml_compute_forward_rwkv_wkv6_f32 (state row i =
    key dim, col j = value dim)."""
    B, T, Hh, hs = r.shape
    S = S0.copy()
    out = np.zeros_like(r)
    for bb in range(B):
        for t in range(T):
            for h in range(Hh):
                for i in range(hs):
                    kv = v[bb, t, h] * k[bb, t, h, i]
                    out[bb, t, h] += (kv * u[h, i] + S[bb, h, i]) * r[
                        bb, t, h, i]
                    S[bb, h, i] = S[bb, h, i] * w[bb, t, h, i] + kv
    return out, S


def test_wkv6_scan_matches_reference_loop():
    rng = np.random.default_rng(30)
    B, T = 2, 5
    sh = (B, T, H, HS)
    r, k, v = (rng.standard_normal(sh).astype(np.float32) * 0.5
               for _ in range(3))
    w = rng.uniform(0.5, 0.99, sh).astype(np.float32)
    u = rng.standard_normal((H, HS)).astype(np.float32) * 0.3
    S0 = rng.standard_normal((B, H, HS, HS)).astype(np.float32) * 0.1
    want, S_want = _np_wkv6(r, w, k, v, u, S0)
    got, S_got = _wkv6_scan(
        jnp.asarray(r), jnp.asarray(w), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(u), jnp.asarray(S0),
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(S_got), S_want, rtol=2e-5,
                               atol=2e-5)
    # GLA (rwkv6qwen2): out reads the UPDATED state, u-free, scaled
    got_g, _ = _gla_scan(
        jnp.asarray(r), jnp.asarray(w), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(S0), HS ** -0.5,
    )
    S2 = S0.copy()
    want_g = np.zeros_like(r)
    for bb in range(B):
        for t in range(T):
            for h in range(H):
                for i in range(HS):
                    S2[bb, h, i] = (S2[bb, h, i] * w[bb, t, h, i]
                                    + v[bb, t, h] * k[bb, t, h, i])
                    want_g[bb, t, h] += (S2[bb, h, i]
                                         * r[bb, t, h, i] * HS ** -0.5)
    np.testing.assert_allclose(np.asarray(got_g), want_g, rtol=2e-5,
                               atol=2e-5)


def test_rwkv6_forward_and_state_carry(tmp_path):
    """Classic RWKV6 (rwkv.blocks.* naming): ddlerp 5-branch token shift,
    data-dependent decay, time_faaaa bonus, gated channel mix."""
    from safetensors.numpy import save_file

    from vlut_tpu.convert.rwkv import convert_rwkv6

    rng = np.random.default_rng(31)
    rk_ = 4

    def lin(n_out, n_in, s=0.2):
        return rng.standard_normal((n_out, n_in)).astype(np.float32) * s

    t = {"rwkv.embeddings.weight": lin(V, D, 0.02),
         "rwkv.blocks.0.pre_ln.weight": np.ones(D, np.float32),
         "rwkv.blocks.0.pre_ln.bias": np.zeros(D, np.float32),
         "rwkv.ln_out.weight": np.ones(D, np.float32),
         "rwkv.ln_out.bias": np.zeros(D, np.float32),
         "head.weight": lin(V, D, 0.1)}
    for i in range(L):
        p = f"rwkv.blocks.{i}."
        for nm in ("ln1", "ln2"):
            t[p + nm + ".weight"] = np.abs(
                rng.standard_normal(D)).astype(np.float32) + 0.5
            t[p + nm + ".bias"] = rng.standard_normal(
                D).astype(np.float32) * 0.05
        t[p + "attention.time_maa_x"] = rng.uniform(
            0, 1, (1, 1, D)).astype(np.float32)
        for b_ in "wkvrg":
            t[p + f"attention.time_maa_{b_}"] = rng.uniform(
                0, 1, (1, 1, D)).astype(np.float32)
        t[p + "attention.time_maa_w1"] = lin(D, 5 * rk_).reshape(D, 5 * rk_)
        t[p + "attention.time_maa_w2"] = rng.standard_normal(
            (5, rk_, D)).astype(np.float32) * 0.2
        t[p + "attention.time_decay"] = rng.standard_normal(
            (1, 1, D)).astype(np.float32)
        t[p + "attention.time_decay_w1"] = lin(D, rk_).reshape(D, rk_)
        t[p + "attention.time_decay_w2"] = lin(rk_, D).reshape(rk_, D)
        t[p + "attention.time_faaaa"] = rng.standard_normal(
            (H, HS)).astype(np.float32) * 0.3
        for nm in ("receptance", "key", "value", "gate", "output"):
            t[p + f"attention.{nm}.weight"] = lin(D, D)
        t[p + "attention.ln_x.weight"] = np.abs(
            rng.standard_normal(D)).astype(np.float32) + 0.5
        t[p + "attention.ln_x.bias"] = rng.standard_normal(
            D).astype(np.float32) * 0.05
        t[p + "feed_forward.time_maa_k"] = rng.uniform(
            0, 1, (1, 1, D)).astype(np.float32)
        t[p + "feed_forward.time_maa_r"] = rng.uniform(
            0, 1, (1, 1, D)).astype(np.float32)
        t[p + "feed_forward.key.weight"] = lin(2 * D, D)
        t[p + "feed_forward.receptance.weight"] = lin(D, D)
        t[p + "feed_forward.value.weight"] = lin(D, 2 * D)
    (tmp_path / "hf").mkdir()
    (tmp_path / "hf" / "config.json").write_text(json.dumps({
        "model_type": "rwkv6", "architectures": ["Rwkv6ForCausalLM"],
        "vocab_size": V, "hidden_size": D, "num_hidden_layers": L,
        "head_size": HS, "intermediate_size": 2 * D,
        "layer_norm_epsilon": 1e-5, "tie_word_embeddings": False,
    }))
    save_file({k: np.ascontiguousarray(v) for k, v in t.items()},
              str(tmp_path / "hf" / "model.safetensors"))
    cfg = convert_rwkv6(tmp_path / "hf", tmp_path / "out")
    assert cfg.arch == "rwkv6"
    cfg2, params, _ = load_checkpoint(tmp_path / "out")
    params = jax.tree.map(jnp.asarray, params)
    toks = rng.integers(0, V, (2, 10))
    full, _ = forward6(params, cfg2, jnp.asarray(toks, jnp.int32))
    assert np.isfinite(np.asarray(full)).all()
    st = init_state6(cfg2, 2)
    _, st = forward6(params, cfg2, jnp.asarray(toks[:, :6], jnp.int32), st)
    part, _ = forward6(params, cfg2, jnp.asarray(toks[:, 6:], jnp.int32), st)
    np.testing.assert_allclose(
        np.asarray(part), np.asarray(full)[:, 6:], rtol=2e-4, atol=2e-4
    )

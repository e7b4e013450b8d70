"""Converter round-trip: synthetic HF checkpoint -> packed ckpt -> forward.

Validates the lossless contract end-to-end: exact-ternary HF weights must
survive conversion bit-exactly (trits + scales), and the loaded model must
produce identical logits to the in-memory packed model.
"""

import json

import numpy as np
import pytest
import jax.numpy as jnp
from safetensors.numpy import save_file

from vlut_tpu.convert.checkpoint import load_checkpoint, save_checkpoint
from vlut_tpu.convert.convert import convert_hf
from vlut_tpu.models.dims import (
    make_plan,
    pad_heads_cols,
    pad_heads_rows,
    scatter_cols,
    scatter_rows,
)
from vlut_tpu.models.transformer import forward, init_params, weight_specs
from vlut_tpu.config import PRESETS
from vlut_tpu.ops.packing import TernaryTensor, unpack_ternary_np

V, D, L, H, HKV, F = 64, 32, 2, 4, 2, 48


def _make_hf_dir(tmp_path, ternary=True, seed=0):
    rng = np.random.default_rng(seed)
    cfgd = {
        "architectures": ["LlamaForCausalLM"],
        "vocab_size": V,
        "hidden_size": D,
        "num_hidden_layers": L,
        "num_attention_heads": H,
        "num_key_value_heads": HKV,
        "intermediate_size": F,
        "rms_norm_eps": 1e-5,
        "rope_theta": 10000.0,
        "max_position_embeddings": 128,
        "tie_word_embeddings": False,
    }
    (tmp_path / "config.json").write_text(json.dumps(cfgd))

    tensors = {}
    tensors["model.embed_tokens.weight"] = rng.standard_normal(
        (V, D)
    ).astype(np.float32)
    tensors["lm_head.weight"] = rng.standard_normal((V, D)).astype(np.float32)
    tensors["model.norm.weight"] = np.ones(D, np.float32)
    shapes = {
        "self_attn.q_proj": (D, D),
        "self_attn.k_proj": (D // 2, D),
        "self_attn.v_proj": (D // 2, D),
        "self_attn.o_proj": (D, D),
        "mlp.gate_proj": (F, D),
        "mlp.up_proj": (F, D),
        "mlp.down_proj": (D, F),
    }
    expected = {}
    for i in range(L):
        tensors[f"model.layers.{i}.input_layernorm.weight"] = np.ones(
            D, np.float32
        )
        tensors[f"model.layers.{i}.post_attention_layernorm.weight"] = np.ones(
            D, np.float32
        )
        for sub, shp in shapes.items():
            if ternary:
                trits = rng.integers(-1, 2, size=shp).astype(np.float32)
                scale = np.float32(rng.uniform(0.01, 0.1))
                w = trits * scale
                expected[(i, sub)] = (trits.T.astype(np.int8), scale)
            else:
                w = rng.standard_normal(shp).astype(np.float32) * 0.05
            tensors[f"model.layers.{i}.{sub}.weight"] = w
    save_file(tensors, str(tmp_path / "model.safetensors"))
    return expected


def test_convert_exact_ternary(tmp_path):
    hf = tmp_path / "hf"
    hf.mkdir()
    expected = _make_hf_dir(hf, ternary=True)
    out = tmp_path / "ckpt"
    cfg = convert_hf(hf, out, fmt="i2")
    assert cfg.n_layers == L and cfg.d_model == D

    cfg2, params, meta = load_checkpoint(out)
    assert meta["ternarized_tensors"] == 0  # everything detected as exact
    specs = weight_specs(cfg2)
    plan = make_plan(cfg2)
    name_map = {
        "self_attn.q_proj": "wq", "self_attn.k_proj": "wk",
        "self_attn.v_proj": "wv", "self_attn.o_proj": "wo",
        "mlp.gate_proj": "w_gate", "mlp.up_proj": "w_up",
        "mlp.down_proj": "w_down",
    }
    for (i, sub), (trits, scale) in expected.items():
        pname = name_map[sub]
        spec = specs[pname]
        t = TernaryTensor(
            packed=params["layers"][pname]["packed"][i],
            scale=params["layers"][pname]["scale"][i],
            k=spec.k, n=spec.n, fmt=spec.fmt, kb=spec.kb,
        )
        got = unpack_ternary_np(t)
        # apply the checkpoint layout (head/chunk padding) to the raw trits
        if pname in ("wq", "wk", "wv"):
            heads = cfg2.n_heads if pname == "wq" else cfg2.n_kv_heads
            want = pad_heads_cols(trits, heads, plan.hd, plan.hd_p)
        elif pname == "wo":
            want = pad_heads_rows(trits, cfg2.n_heads, plan.hd, plan.hd_p)
            want = scatter_rows(
                want, plan.wo_chunk, plan.wo_chunk_p, plan.wo_in_p
            )
        elif pname in ("w_gate", "w_up"):
            want = scatter_cols(
                trits, plan.ff_chunk, plan.ff_chunk_p, plan.ff_p
            )
        else:  # w_down
            want = scatter_rows(
                trits, plan.ff_chunk, plan.ff_chunk_p, plan.ff_p
            )
        np.testing.assert_array_equal(got, want)
        assert float(t.scale) == pytest.approx(float(scale), rel=1e-5)

    # loaded model runs
    toks = jnp.asarray([[1, 2, 3]], jnp.int32)
    pos = jnp.arange(3, dtype=jnp.int32)[None]
    logits, _ = forward(params, cfg2, toks, pos, None, impl="xla")
    assert np.isfinite(np.asarray(logits)).all()


def test_convert_float_falls_back_to_absmean(tmp_path):
    hf = tmp_path / "hf"
    hf.mkdir()
    _make_hf_dir(hf, ternary=False)
    out = tmp_path / "ckpt"
    convert_hf(hf, out, fmt="i1")
    _, params, meta = load_checkpoint(out)
    assert meta["ternarized_tensors"] == L * 7


def test_checkpoint_roundtrip_params(tmp_path):
    cfg = PRESETS["tiny"]
    params = init_params(cfg, seed=1)
    save_checkpoint(tmp_path / "c", cfg, params)
    cfg2, p2, _ = load_checkpoint(tmp_path / "c")
    assert cfg2 == cfg
    flat1 = jnp.asarray(params["layers"]["wq"]["packed"])
    flat2 = jnp.asarray(p2["layers"]["wq"]["packed"])
    np.testing.assert_array_equal(np.asarray(flat1), np.asarray(flat2))
    np.testing.assert_array_equal(
        np.asarray(params["embed"], np.float32),
        np.asarray(jnp.asarray(p2["embed"]), np.float32),
    )


# --- arch-superset conversion (qwen2/qwen3/mixtral/gemma2/phi3) -------------


def _base_cfgd(**over):
    d = {
        "architectures": ["LlamaForCausalLM"],
        "vocab_size": V,
        "hidden_size": D,
        "num_hidden_layers": L,
        "num_attention_heads": H,
        "num_key_value_heads": HKV,
        "intermediate_size": F,
        "rms_norm_eps": 1e-5,
        "rope_theta": 10000.0,
        "max_position_embeddings": 128,
        "tie_word_embeddings": False,
    }
    d.update(over)
    return d


def _tern(rng, shp):
    return (rng.integers(-1, 2, size=shp) * 0.05).astype(np.float32)


def _common_tensors(rng):
    t = {
        "model.embed_tokens.weight":
            rng.standard_normal((V, D)).astype(np.float32),
        "lm_head.weight": rng.standard_normal((V, D)).astype(np.float32),
        "model.norm.weight": np.ones(D, np.float32),
    }
    return t


def _fwd_ckpt(out_dir, t=6):
    cfg, params, _ = load_checkpoint(out_dir)
    params = {
        k: (jnp.asarray(v) if not isinstance(v, dict) else v)
        for k, v in params.items()
    }
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, t)), jnp.int32)
    pos = jnp.arange(t, dtype=jnp.int32)[None]
    logits, _ = forward(params, cfg, toks, pos, None, impl="xla")
    return cfg, np.asarray(logits)


def test_convert_qwen2_biases(tmp_path):
    rng = np.random.default_rng(3)
    hf = tmp_path / "hf"
    hf.mkdir()
    (hf / "config.json").write_text(
        json.dumps(_base_cfgd(architectures=["Qwen2ForCausalLM"],
                              model_type="qwen2"))
    )
    tensors = _common_tensors(rng)
    shapes = {
        "self_attn.q_proj": (D, D),
        "self_attn.k_proj": (D // 2, D),
        "self_attn.v_proj": (D // 2, D),
        "self_attn.o_proj": (D, D),
        "mlp.gate_proj": (F, D),
        "mlp.up_proj": (F, D),
        "mlp.down_proj": (D, F),
    }
    for i in range(L):
        tensors[f"model.layers.{i}.input_layernorm.weight"] = np.ones(
            D, np.float32)
        tensors[f"model.layers.{i}.post_attention_layernorm.weight"] = (
            np.ones(D, np.float32))
        for sub, shp in shapes.items():
            tensors[f"model.layers.{i}.{sub}.weight"] = _tern(rng, shp)
        for sub in ("self_attn.q_proj", "self_attn.k_proj",
                    "self_attn.v_proj"):
            odim = shapes[sub][0]
            tensors[f"model.layers.{i}.{sub}.bias"] = (
                rng.standard_normal(odim).astype(np.float32) * 0.1)
    save_file(tensors, str(hf / "model.safetensors"))
    out = tmp_path / "ckpt"
    cfg = convert_hf(hf, out)
    assert cfg.qkv_bias
    cfg2, logits = _fwd_ckpt(out)
    assert "bq" in load_checkpoint(out)[1]["layers"]
    assert np.isfinite(logits).all()


def test_convert_mixtral_moe(tmp_path):
    rng = np.random.default_rng(4)
    hf = tmp_path / "hf"
    hf.mkdir()
    E = 4
    (hf / "config.json").write_text(json.dumps(_base_cfgd(
        architectures=["MixtralForCausalLM"], model_type="mixtral",
        num_local_experts=E, num_experts_per_tok=2,
    )))
    tensors = _common_tensors(rng)
    for i in range(L):
        tensors[f"model.layers.{i}.input_layernorm.weight"] = np.ones(
            D, np.float32)
        tensors[f"model.layers.{i}.post_attention_layernorm.weight"] = (
            np.ones(D, np.float32))
        for sub, shp in (("self_attn.q_proj", (D, D)),
                         ("self_attn.k_proj", (D // 2, D)),
                         ("self_attn.v_proj", (D // 2, D)),
                         ("self_attn.o_proj", (D, D))):
            tensors[f"model.layers.{i}.{sub}.weight"] = _tern(rng, shp)
        tensors[f"model.layers.{i}.block_sparse_moe.gate.weight"] = (
            rng.standard_normal((E, D)).astype(np.float32))
        for e in range(E):
            pre = f"model.layers.{i}.block_sparse_moe.experts.{e}"
            tensors[f"{pre}.w1.weight"] = _tern(rng, (F, D))
            tensors[f"{pre}.w3.weight"] = _tern(rng, (F, D))
            tensors[f"{pre}.w2.weight"] = _tern(rng, (D, F))
    save_file(tensors, str(hf / "model.safetensors"))
    out = tmp_path / "ckpt"
    cfg = convert_hf(hf, out)
    assert cfg.n_experts == E and cfg.n_experts_used == 2
    _, params, _ = load_checkpoint(out)
    assert params["layers"]["w_gate"]["packed"].shape[:2] == (L, E)
    assert params["layers"]["router"].shape == (L, D, E)
    _, logits = _fwd_ckpt(out)
    assert np.isfinite(logits).all()


def test_convert_gemma2_postnorms(tmp_path):
    rng = np.random.default_rng(5)
    hf = tmp_path / "hf"
    hf.mkdir()
    (hf / "config.json").write_text(json.dumps(_base_cfgd(
        architectures=["Gemma2ForCausalLM"], model_type="gemma2",
        tie_word_embeddings=True, query_pre_attn_scalar=16,
        sliding_window=8,
    )))
    tensors = _common_tensors(rng)
    del tensors["lm_head.weight"]
    for i in range(L):
        for nm in ("input_layernorm", "post_attention_layernorm",
                   "pre_feedforward_layernorm",
                   "post_feedforward_layernorm"):
            tensors[f"model.layers.{i}.{nm}.weight"] = np.zeros(
                D, np.float32)
        for sub, shp in (("self_attn.q_proj", (D, D)),
                         ("self_attn.k_proj", (D // 2, D)),
                         ("self_attn.v_proj", (D // 2, D)),
                         ("self_attn.o_proj", (D, D)),
                         ("mlp.gate_proj", (F, D)),
                         ("mlp.up_proj", (F, D)),
                         ("mlp.down_proj", (D, F))):
            tensors[f"model.layers.{i}.{sub}.weight"] = _tern(rng, shp)
    save_file(tensors, str(hf / "model.safetensors"))
    out = tmp_path / "ckpt"
    cfg = convert_hf(hf, out)
    assert cfg.post_norms and cfg.norm_plus_one and cfg.act_fn == "gelu"
    assert cfg.attn_scale == 16 ** -0.5
    _, params, _ = load_checkpoint(out)
    assert "post_attn_norm" in params["layers"]
    assert "post_ffn_norm" in params["layers"]
    _, logits = _fwd_ckpt(out)
    assert np.isfinite(logits).all()
    assert np.abs(logits).max() <= cfg.final_logit_softcap + 1e-3


def test_convert_phi3_fused(tmp_path):
    rng = np.random.default_rng(6)
    hf = tmp_path / "hf"
    hf.mkdir()
    (hf / "config.json").write_text(json.dumps(_base_cfgd(
        architectures=["Phi3ForCausalLM"], model_type="phi3",
    )))
    tensors = _common_tensors(rng)
    for i in range(L):
        tensors[f"model.layers.{i}.input_layernorm.weight"] = np.ones(
            D, np.float32)
        tensors[f"model.layers.{i}.post_attention_layernorm.weight"] = (
            np.ones(D, np.float32))
        # fused qkv (q_dim + 2*kv_dim rows) and gate_up (2F rows)
        tensors[f"model.layers.{i}.self_attn.qkv_proj.weight"] = _tern(
            rng, (D + D // 2 + D // 2, D))
        tensors[f"model.layers.{i}.self_attn.o_proj.weight"] = _tern(
            rng, (D, D))
        tensors[f"model.layers.{i}.mlp.gate_up_proj.weight"] = _tern(
            rng, (2 * F, D))
        tensors[f"model.layers.{i}.mlp.down_proj.weight"] = _tern(
            rng, (D, F))
    save_file(tensors, str(hf / "model.safetensors"))
    out = tmp_path / "ckpt"
    convert_hf(hf, out)
    _, params, _ = load_checkpoint(out)
    for nm in ("wq", "wk", "wv", "w_gate", "w_up"):
        assert nm in params["layers"]
    _, logits = _fwd_ckpt(out)
    assert np.isfinite(logits).all()


def test_convert_qwen3_qk_norm(tmp_path):
    rng = np.random.default_rng(7)
    hf = tmp_path / "hf"
    hf.mkdir()
    (hf / "config.json").write_text(json.dumps(_base_cfgd(
        architectures=["Qwen3ForCausalLM"], model_type="qwen3",
        head_dim=D // H,
    )))
    tensors = _common_tensors(rng)
    hd = D // H
    for i in range(L):
        tensors[f"model.layers.{i}.input_layernorm.weight"] = np.ones(
            D, np.float32)
        tensors[f"model.layers.{i}.post_attention_layernorm.weight"] = (
            np.ones(D, np.float32))
        tensors[f"model.layers.{i}.self_attn.q_norm.weight"] = np.ones(
            hd, np.float32)
        tensors[f"model.layers.{i}.self_attn.k_norm.weight"] = np.ones(
            hd, np.float32)
        for sub, shp in (("self_attn.q_proj", (D, D)),
                         ("self_attn.k_proj", (D // 2, D)),
                         ("self_attn.v_proj", (D // 2, D)),
                         ("self_attn.o_proj", (D, D)),
                         ("mlp.gate_proj", (F, D)),
                         ("mlp.up_proj", (F, D)),
                         ("mlp.down_proj", (D, F))):
            tensors[f"model.layers.{i}.{sub}.weight"] = _tern(rng, shp)
    save_file(tensors, str(hf / "model.safetensors"))
    out = tmp_path / "ckpt"
    cfg = convert_hf(hf, out)
    assert cfg.qk_norm
    _, params, _ = load_checkpoint(out)
    assert "q_norm" in params["layers"] and "k_norm" in params["layers"]
    _, logits = _fwd_ckpt(out)
    assert np.isfinite(logits).all()


def test_requantize_i2_i1_exact(tmp_path):
    """i2 -> i1 requantization is trit-exact: logits identical (both
    formats store the same signs; only byte packing differs)."""
    from vlut_tpu.convert.quantize import requantize

    hf = tmp_path / "hf"
    hf.mkdir()
    _make_hf_dir(hf, ternary=True, seed=9)
    a = tmp_path / "i2"
    convert_hf(hf, a, fmt="i2")
    b = tmp_path / "i1"
    cfg_b = requantize(a, b, fmt="i1")
    assert cfg_b.weight_fmt == "i1"

    _, la = _fwd_ckpt(a)
    cfg2, lb = _fwd_ckpt(b)
    np.testing.assert_allclose(la, lb, rtol=1e-5, atol=1e-5)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        requantize(b, tmp_path / "x", fmt="i1")

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

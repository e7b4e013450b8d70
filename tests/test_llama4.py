"""HF-transformers logit parity for Llama-4 (reference
src/models/llama-iswa.cpp): interleaved rope with every-Nth NoPE layer,
chunked local attention on the rope layers, weightless post-rope qk L2
norm, NoPE-layer attention temperature tuning, sigmoid-router MoE with
input-side weights, always-on shared expert, interleaved dense layers at
intermediate_size_mlp."""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from vlut_tpu.convert.checkpoint import load_checkpoint
from vlut_tpu.convert.convert import convert_hf
from vlut_tpu.models.transformer import forward
from vlut_tpu.train.finetune import float_twin_params

V = 96


def _ternarize(model, seed=0, scale=0.02):
    rng = np.random.default_rng(seed)
    with torch.no_grad():
        for name, p in model.named_parameters():
            is_proj = (
                p.ndim == 2 and name.endswith(".weight")
                and any(m in name for m in (
                    "q_proj", "k_proj", "v_proj", "o_proj", "gate_proj",
                    "up_proj", "down_proj",
                )) and "embed" not in name
            )
            is_expert = p.ndim == 3 and (
                "experts.gate_up_proj" in name or "experts.down_proj" in name
            )
            if is_proj or is_expert:
                trits = rng.integers(-1, 2, size=tuple(p.shape))
                p.copy_(torch.tensor(trits * scale, dtype=p.dtype))


def _run_pair(model, hf_dir, out_dir, t=12, rtol=5e-3, atol=5e-3):
    model = model.float().eval()
    _ternarize(model)
    model.save_pretrained(str(hf_dir), safe_serialization=True)
    cfg = convert_hf(hf_dir, out_dir, fmt="i2", dtype_hp="float32")
    cfg2, params, meta = load_checkpoint(out_dir)
    assert meta["ternarized_tensors"] == 0
    params_f = float_twin_params(params, cfg2, dtype=jnp.float32)
    rng = np.random.default_rng(7)
    b = 2
    tokens = rng.integers(0, V, (b, t))
    with torch.no_grad():
        want = model(torch.tensor(tokens), use_cache=False).logits.numpy()
    pos = jnp.tile(jnp.arange(t, dtype=jnp.int32), (b, 1))
    got, _ = forward(
        params_f, cfg2, jnp.asarray(tokens, jnp.int32), pos, None, impl="xla"
    )
    got = np.asarray(got, np.float32)[..., : want.shape[-1]]
    np.testing.assert_allclose(got, want, rtol=rtol, atol=atol)
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))
    return cfg


def test_llama4_moe_parity(tmp_path):
    """Scout-style: 4 layers, every 2nd NoPE (with temperature tuning),
    chunked attention (size 8) on rope layers, qk L2 norm, sigmoid top-2
    MoE with input-side weights + shared expert, dense layers at
    intermediate_size_mlp on the off-step layers."""
    c = transformers.Llama4TextConfig(
        vocab_size=V, hidden_size=64, intermediate_size=96,
        intermediate_size_mlp=128, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, head_dim=128,
        num_local_experts=4, num_experts_per_tok=2,
        interleave_moe_layer_step=2, no_rope_layer_interval=2,
        attention_chunk_size=8, attn_temperature_tuning=True,
        floor_scale=8, attn_scale=0.1, use_qk_norm=True,
        max_position_embeddings=64, rope_theta=10000.0,
        rms_norm_eps=1e-6, tie_word_embeddings=False,
        rope_scaling=None, attention_bias=False,
    )
    torch.manual_seed(0)
    cfg = _run_pair(
        transformers.Llama4ForCausalLM(c), tmp_path / "hf", tmp_path / "out"
    )
    assert cfg.rope_interleaved and cfg.swa_type == "chunked"
    assert cfg.qk_norm_type == "l2" and cfg.qk_norm_post_rope
    assert cfg.attn_temp_scale == 0.1 and cfg.attn_temp_floor == 8
    assert cfg.moe_weight_before and not cfg.moe_norm_topk
    assert cfg.moe_score == "sigmoid" and cfg.n_shared_experts == 1
    assert cfg.dense_layers == (True, False, True, False)
    assert cfg.nope_layers == (False, True, False, True)

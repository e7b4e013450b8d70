"""Hybrid SSM+attention parity vs HF: jamba, falcon-h1, granite-hybrid
(reference: src/models/{jamba,falcon-h1,granite-hybrid}.cpp)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from vlut_tpu.convert.checkpoint import load_checkpoint
from vlut_tpu.convert.hybrid import convert_hybrid
from vlut_tpu.models.hybrid import forward

V = 64


def _run(model, tmp_path, t=12, rtol=6e-4, atol=6e-4):
    model = model.float().eval()
    model.save_pretrained(str(tmp_path / "hf"), safe_serialization=True)
    cfg = convert_hybrid(tmp_path / "hf", tmp_path / "out")
    cfg2, params, _ = load_checkpoint(tmp_path / "out")
    params = jax.tree.map(jnp.asarray, params)
    rng = np.random.default_rng(11)
    toks = rng.integers(0, V, (2, t))
    with torch.no_grad():
        want = model(torch.tensor(toks)).logits.numpy()
    got = np.asarray(forward(params, cfg2, jnp.asarray(toks, jnp.int32)))
    got = got[..., : want.shape[-1]]
    np.testing.assert_allclose(got, want, rtol=rtol, atol=atol)
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))
    return cfg2


def test_jamba_parity(tmp_path):
    """jamba: mamba1 mixer with dt/B/C RMSNorms, NoPE attention every
    attn_layer_period, MoE every expert_layer_period WITHOUT top-k
    renormalization."""
    c = transformers.JambaConfig(
        vocab_size=V, hidden_size=32, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=64, num_experts=4, num_experts_per_tok=2,
        expert_layer_period=2, expert_layer_offset=1,
        attn_layer_period=4, attn_layer_offset=2,
        mamba_d_state=16, mamba_d_conv=4, mamba_expand=2, mamba_dt_rank=8,
        max_position_embeddings=64, use_mamba_kernels=False,
    )
    torch.manual_seed(80)
    cfg = _run(transformers.JambaForCausalLM(c), tmp_path)
    assert cfg.layer_types == ("mamba", "mamba", "attention", "mamba")
    assert cfg.ffn_types == ("dense", "moe", "dense", "moe")
    assert not cfg.rope and not cfg.moe_renorm


def test_falcon_h1_parity(tmp_path):
    """falcon-h1: attention + mamba2 in PARALLEL per layer; all muP
    multipliers folded into weights at convert."""
    c = transformers.FalconH1Config(
        vocab_size=V, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        intermediate_size=64, mamba_d_ssm=64, mamba_n_heads=8,
        mamba_d_head=8, mamba_n_groups=2, mamba_d_state=16,
        mamba_d_conv=4, mamba_chunk_size=8,
        # non-trivial muP multipliers: the fold must reproduce them
        attention_in_multiplier=0.5, attention_out_multiplier=1.5,
        key_multiplier=2.0, ssm_in_multiplier=0.8,
        ssm_out_multiplier=1.25, ssm_multipliers=[1.1, 0.9, 1.2, 0.7, 1.3],
        mlp_multipliers=[0.6, 1.4], embedding_multiplier=2.0,
        lm_head_multiplier=0.75, max_position_embeddings=64,
    )
    torch.manual_seed(81)
    cfg = _run(transformers.FalconH1ForCausalLM(c), tmp_path)
    assert cfg.layer_types == ("parallel", "parallel")
    assert cfg.m2_norm_mode == "gate_only" and cfg.embed_scale == 2.0


def test_falcon_h1_rmsnorm_parity(tmp_path):
    """falcon-h1 with the gated mamba RMSNorm enabled (norm-before-gate)."""
    c = transformers.FalconH1Config(
        vocab_size=V, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        intermediate_size=64, mamba_d_ssm=64, mamba_n_heads=8,
        mamba_d_head=8, mamba_n_groups=2, mamba_d_state=16,
        mamba_d_conv=4, mamba_chunk_size=8, mamba_rms_norm=True,
        mamba_norm_before_gate=False, max_position_embeddings=64,
    )
    torch.manual_seed(82)
    cfg = _run(transformers.FalconH1ForCausalLM(c), tmp_path)
    assert cfg.m2_norm_mode == "gated"


def test_granite_hybrid_parity(tmp_path):
    """granite-hybrid: per-layer mamba2/attention (NoPE default), shared
    GLU + stacked-expert MoE with softmax-over-top-k gating, granite
    multipliers (residual folded, attention_multiplier as score scale,
    logits_scaling divides)."""
    c = transformers.GraniteMoeHybridConfig(
        vocab_size=V, hidden_size=32, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=48, shared_intermediate_size=64,
        num_local_experts=4, num_experts_per_tok=2,
        layer_types=["mamba", "attention", "mamba"],
        mamba_n_heads=8, mamba_d_head=8, mamba_n_groups=2,
        mamba_d_state=16, mamba_d_conv=4, mamba_expand=2,
        embedding_multiplier=2.0, attention_multiplier=0.1,
        residual_multiplier=0.5, logits_scaling=4.0,
        max_position_embeddings=64,
    )
    torch.manual_seed(83)
    cfg = _run(transformers.GraniteMoeHybridForCausalLM(c), tmp_path)
    assert cfg.layer_types == ("mamba2", "attention", "mamba2")
    assert cfg.ffn_types[0] == "shared_moe"
    assert not cfg.rope and cfg.attn_scale == 0.1
    assert cfg.logit_scale == 0.25 and cfg.embed_scale == 2.0


def test_lfm2_parity(tmp_path):
    """lfm2: gated short-conv mixer (B*x conv, C gate, no activation),
    attention layers with per-head q/k RMSNorm, embedding_norm final."""
    c = transformers.Lfm2Config(
        vocab_size=V, hidden_size=32, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=64, conv_L_cache=3,
        layer_types=["conv", "full_attention", "conv", "full_attention"],
        max_position_embeddings=64,
    )
    torch.manual_seed(84)
    cfg = _run(transformers.Lfm2ForCausalLM(c), tmp_path)
    assert cfg.layer_types == ("conv", "attention", "conv", "attention")
    assert cfg.qk_norm and cfg.tie_embeddings


def test_qwen3next_dense_parity(tmp_path):
    """qwen3next: gated-delta-net linear attention (l2-normed q/k, decay
    from A_log/dt_bias, beta-weighted delta rule, norm-then-gate RMSNorm)
    + gated full attention (per-head sigmoid output gate, partial rope)."""
    c = transformers.Qwen3NextConfig(
        vocab_size=V, hidden_size=32, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        intermediate_size=64, linear_num_value_heads=4,
        linear_num_key_heads=2, linear_key_head_dim=8,
        linear_value_head_dim=8, linear_conv_kernel_dim=3,
        layer_types=["linear_attention", "full_attention",
                     "linear_attention", "full_attention"],
        num_experts=0, max_position_embeddings=64,
    )
    torch.manual_seed(85)
    cfg = _run(transformers.Qwen3NextForCausalLM(c), tmp_path)
    assert cfg.layer_types == (
        "deltanet", "attention", "deltanet", "attention")
    assert cfg.attn_gate and cfg.rope_pct == 0.25


def test_qwen3next_moe_parity(tmp_path):
    """qwen3next with the sparse block: renormalized top-k experts + the
    sigmoid-gated shared expert."""
    c = transformers.Qwen3NextConfig(
        vocab_size=V, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        intermediate_size=64, moe_intermediate_size=32,
        shared_expert_intermediate_size=48,
        linear_num_value_heads=4, linear_num_key_heads=2,
        linear_key_head_dim=8, linear_value_head_dim=8,
        linear_conv_kernel_dim=3,
        layer_types=["linear_attention", "full_attention"],
        num_experts=4, num_experts_per_tok=2, decoder_sparse_step=1,
        max_position_embeddings=64,
    )
    torch.manual_seed(86)
    cfg = _run(transformers.Qwen3NextForCausalLM(c), tmp_path)
    assert cfg.ffn_types == ("moe_qwen", "moe_qwen")
    assert cfg.d_ff == 32 and cfg.n_experts == 4

"""HF-transformers logit parity — third arch wave.

Same protocol as test_archs_hf.py / test_archs_hf2.py: tiny random HF
checkpoint with exact-ternary projections -> convert -> run our forward on
dequantized float twins -> compare logits against ``transformers``.

Covers: gemma (v1), arcee (ungated relu^2), ernie4.5 dense + MoE
(softmax noaux routing with moe_statics bias, dense-interval layers,
shared experts), seed-oss (qkv bias), exaone4 (post-norm ordering +
qk-norm + hybrid SWA/NoPE), dots1 + glm4-moe (deepseek-style sigmoid
router on standard attention), hunyuan v1 dense + moe (post-rope
qk-norm, always-on shared expert) — the analogs of the reference's
src/models/{gemma,arcee,ernie4-5,ernie4-5-moe,seed-oss,exaone4,dots1,
glm4-moe,hunyuan-dense,hunyuan-moe}.cpp graph builders.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from test_archs_hf2 import _run_pair

V, L = 96, 2


def _need(name):
    cls = getattr(transformers, name, None)
    if cls is None:
        pytest.skip(f"transformers lacks {name}")
    return cls


def test_gemma1_parity(tmp_path):
    """gemma v1: sqrt(d_model) embedding scale, (1+w) RMSNorm, tanh-gelu
    gated MLP, explicit head_dim, tied head."""
    c = transformers.GemmaConfig(
        vocab_size=V, hidden_size=64, num_hidden_layers=L,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        intermediate_size=128, max_position_embeddings=64,
    )
    torch.manual_seed(30)
    cfg = _run_pair(
        transformers.GemmaForCausalLM(c), tmp_path / "hf", tmp_path / "out"
    )
    assert cfg.embed_scale == 64 ** 0.5 and cfg.norm_plus_one
    assert cfg.act_fn == "gelu" and not cfg.post_norms


def test_arcee_parity(tmp_path):
    """arcee AFM: llama attention with an UNGATED relu^2 MLP."""
    cls = _need("ArceeForCausalLM")
    c = transformers.ArceeConfig(
        vocab_size=V, hidden_size=64, num_hidden_layers=L,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=128, max_position_embeddings=64,
    )
    torch.manual_seed(31)
    cfg = _run_pair(cls(c), tmp_path / "hf", tmp_path / "out")
    assert cfg.act_fn == "relu2" and not cfg.ffn_gated


def test_ernie45_dense_parity(tmp_path):
    """ernie 4.5 dense: llama graph (theta 5e5, tied head are HF-omitted
    defaults)."""
    cls = _need("Ernie4_5ForCausalLM")
    c = transformers.Ernie4_5Config(
        vocab_size=V, hidden_size=64, num_hidden_layers=L,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=128, max_position_embeddings=64, pad_token_id=0,
    )
    torch.manual_seed(32)
    cfg = _run_pair(cls(c), tmp_path / "hf", tmp_path / "out")
    assert cfg.rope_theta == 500000.0


def test_ernie45_moe_parity(tmp_path):
    """ernie 4.5 MoE: softmax scores + selection-only moe_statics
    correction bias, always-renormalized top-k, shared experts at
    n_shared * moe_intermediate_size, dense layers below
    moe_layer_start_index."""
    cls = _need("Ernie4_5_MoeForCausalLM")
    c = transformers.Ernie4_5_MoeConfig(
        vocab_size=V, hidden_size=64, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=128, moe_intermediate_size=64,
        moe_num_experts=4, moe_k=2, moe_num_shared_experts=1,
        moe_layer_start_index=1, max_position_embeddings=64,
        pad_token_id=0,
    )
    torch.manual_seed(33)
    model = cls(c)
    with torch.no_grad():
        for name, p in model.named_buffers():
            if "e_score_correction_bias" in name:
                p.copy_(0.5 * torch.randn_like(p))
        for name, p in model.named_parameters():
            if "e_score_correction_bias" in name:
                p.copy_(0.5 * torch.randn_like(p))
    cfg = _run_pair(model, tmp_path / "hf", tmp_path / "out")
    assert cfg.n_experts == 4 and cfg.n_shared_experts == 1
    assert cfg.dense_layers == (True, False, False)
    assert cfg.d_ff == 64 and cfg.d_ff_dense == 128 and cfg.d_ff_shared == 64


def test_seed_oss_parity(tmp_path):
    """seed-oss: q/k/v biases (attention_bias default True), llama body."""
    cls = _need("SeedOssForCausalLM")
    c = transformers.SeedOssConfig(
        vocab_size=V, hidden_size=64, num_hidden_layers=L,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        intermediate_size=128, max_position_embeddings=64,
    )
    torch.manual_seed(34)
    model = cls(c)
    with torch.no_grad():  # randomize the zero-init qkv biases
        for name, p in model.named_parameters():
            if name.endswith(".bias"):
                p.copy_(0.1 * torch.randn_like(p))
    cfg = _run_pair(model, tmp_path / "hf", tmp_path / "out")
    assert cfg.qkv_bias


def test_exaone4_parity(tmp_path):
    """exaone4: norm-after-block ordering (post_attention/_feedforward
    norms on branch outputs), per-head qk-norm, hybrid SWA via
    layer_types with NoPE on the global layers."""
    cls = _need("Exaone4ForCausalLM")
    c = transformers.Exaone4Config(
        vocab_size=V, hidden_size=64, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        intermediate_size=128, sliding_window=8,
        sliding_window_pattern=4, max_position_embeddings=64,
    )
    torch.manual_seed(35)
    cfg = _run_pair(cls(c), tmp_path / "hf", tmp_path / "out", t=16)
    assert not cfg.pre_norms and cfg.post_norms and cfg.qk_norm
    assert cfg.swa_layers == (True, True, True, False)
    assert cfg.nope_layers == (False, False, False, True)


def test_dots1_parity(tmp_path):
    """dots1: deepseek-V3 sigmoid router (selection bias, grouped top-k,
    shared expert, first-k dense) on a standard qk-normed attention."""
    cls = _need("Dots1ForCausalLM")
    c = transformers.Dots1Config(
        vocab_size=V, hidden_size=64, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=128, moe_intermediate_size=64,
        n_routed_experts=4, num_experts_per_tok=2, n_shared_experts=1,
        first_k_dense_replace=1, n_group=2, topk_group=1,
        routed_scaling_factor=1.5, max_position_embeddings=64,
    )
    torch.manual_seed(36)
    model = cls(c)
    with torch.no_grad():
        for name, p in model.named_buffers():
            if "e_score_correction_bias" in name:
                p.copy_(0.5 * torch.randn_like(p))
    cfg = _run_pair(model, tmp_path / "hf", tmp_path / "out")
    assert cfg.qk_norm and cfg.moe_score == "sigmoid"
    assert cfg.first_k_dense == 1 and cfg.routed_scale == 1.5
    assert cfg.n_expert_groups == 2 and cfg.topk_groups == 1
    assert not cfg.moe_norm_topk  # HF Dots1 default


def test_glm4_moe_parity(tmp_path):
    """glm4-moe: split-half PARTIAL rope (0.5, not interleaved like dense
    glm4), optional qk-norm, deepseek-style sigmoid router with
    norm_topk default on."""
    cls = _need("Glm4MoeForCausalLM")
    c = transformers.Glm4MoeConfig(
        vocab_size=V, hidden_size=64, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        intermediate_size=128, moe_intermediate_size=64,
        n_routed_experts=4, num_experts_per_tok=2, n_shared_experts=1,
        first_k_dense_replace=1, n_group=2, topk_group=1,
        use_qk_norm=True, attention_bias=True,
        max_position_embeddings=64, pad_token_id=0,
    )
    torch.manual_seed(37)
    model = cls(c)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if name.endswith(".bias"):
                p.copy_(0.1 * torch.randn_like(p))
        for name, p in model.named_buffers():
            if "e_score_correction_bias" in name:
                p.copy_(0.5 * torch.randn_like(p))
    cfg = _run_pair(model, tmp_path / "hf", tmp_path / "out")
    assert cfg.rope_pct == 0.5 and not cfg.rope_interleaved
    assert cfg.qk_norm and cfg.qkv_bias and cfg.moe_norm_topk


def test_hunyuan_dense_parity(tmp_path):
    """hunyuan v1 dense: per-head q/k RMSNorm applied AFTER rope."""
    cls = _need("HunYuanDenseV1ForCausalLM")
    c = transformers.HunYuanDenseV1Config(
        vocab_size=V, hidden_size=64, num_hidden_layers=L,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        intermediate_size=128, max_position_embeddings=64,
    )
    torch.manual_seed(38)
    cfg = _run_pair(cls(c), tmp_path / "hf", tmp_path / "out")
    assert cfg.qk_norm and cfg.qk_norm_post_rope


def test_hunyuan_moe_parity(tmp_path):
    """hunyuan v1 moe: softmax top-k renormalized router + an always-on
    unit-gated shared expert at intermediate_size."""
    cls = _need("HunYuanMoEV1ForCausalLM")
    c = transformers.HunYuanMoEV1Config(
        vocab_size=V, hidden_size=64, num_hidden_layers=L,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        intermediate_size=64, num_experts=4, moe_topk=2,
        max_position_embeddings=64,
    )
    torch.manual_seed(39)
    cfg = _run_pair(cls(c), tmp_path / "hf", tmp_path / "out")
    assert cfg.n_experts == 4 and cfg.n_experts_used == 2
    assert cfg.n_shared_experts == 1 and cfg.d_ff_shared == 64
    assert cfg.qk_norm_post_rope


def test_apertus_parity(tmp_path):
    """apertus: ungated xIELU MLP with learned per-layer alphas (stored
    softplus-inverse), per-head qk-norm, own norm tensor names."""
    cls = _need("ApertusForCausalLM")
    c = transformers.ApertusConfig(
        vocab_size=V, hidden_size=64, num_hidden_layers=L,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=128, max_position_embeddings=64,
    )
    torch.manual_seed(40)
    model = cls(c)
    import numpy as _np
    with torch.no_grad():  # perturb the alphas off their init
        for name, p in model.named_parameters():
            if "alpha" in name:
                p.copy_(p + 0.3 * torch.randn_like(p.float()).to(p.dtype))
    cfg = _run_pair(model.float(), tmp_path / "hf", tmp_path / "out")
    assert cfg.act_fn == "xielu" and not cfg.ffn_gated and cfg.qk_norm


def test_chameleon_parity(tmp_path):
    """chameleon (text path): per-head q/k LayerNorm with bias (fixed
    eps 1e-5), llama body; the VQ image tower is skipped."""
    c = transformers.ChameleonConfig(
        vocab_size=V, hidden_size=64, num_hidden_layers=L,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=128, max_position_embeddings=64,
        vocabulary_map={"<image>": V - 1}, swin_norm=False,
    )
    torch.manual_seed(41)
    model = transformers.ChameleonForConditionalGeneration(c)
    with torch.no_grad():  # randomize the zero-init LN biases
        for name, p in model.named_parameters():
            if ("q_norm" in name or "k_norm" in name):
                p.copy_(p + 0.2 * torch.randn_like(p))
    cfg = _run_pair(model, tmp_path / "hf", tmp_path / "out")
    assert cfg.qk_norm and cfg.qk_norm_type == "ln"

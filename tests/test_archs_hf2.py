"""HF-transformers logit parity for the absolute/ALiBi/NoPE arch wave.

Same protocol as test_archs_hf.py: build a tiny random HF checkpoint with
EXACT-ternary projections, convert, run our forward on dequantized float
twins, and compare logits against the actual ``transformers``
implementation.  Covers the positional-scheme superset (gpt2/opt learned
tables, bloom/mpt ALiBi, cohere2/smollm3 per-layer NoPE), the olmo family
norms (non-parametric LN, whole-width q/k RMSNorm, norm-after-block),
nemotron LayerNorm1P + relu², and gpt-oss (attention sinks, clamped
swiglu MoE with expert biases) — the analogs of the reference's
src/models/{gpt2,bloom,mpt,olmo,olmo2,nemotron,cohere2,smollm,gpt-oss}.cpp
graph builders.
"""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from vlut_tpu.convert.checkpoint import load_checkpoint
from vlut_tpu.convert.convert import convert_hf
from vlut_tpu.models.transformer import forward
from vlut_tpu.train.finetune import float_twin_params

V, L = 96, 2

_PROJ_MARKERS = (
    "q_proj", "k_proj", "v_proj", "o_proj", "query_key_value",
    "self_attention.dense", "attn.c_attn", "attn.c_proj", "attn.Wqkv",
    "attn.out_proj", "out_proj", "fc1", "fc2", "fc_in", "fc_out",
    "mlp.c_fc", "mlp.c_proj", "attn.dense", "ffn.experts.mlp",
    "gate_proj", "up_proj", "down_proj", "dense_h_to_4h", "dense_4h_to_h",
)


def _ternarize_model(model, seed=0, scale=0.02):
    """Overwrite every projection weight (2-D linears AND 3-D stacked
    expert tensors) with exact ternary values."""
    rng = np.random.default_rng(seed)
    with torch.no_grad():
        for name, p in model.named_parameters():
            is_proj = (
                p.ndim == 2
                and name.endswith(".weight")
                and any(m in name for m in _PROJ_MARKERS)
                and "embed" not in name
                # exclude norm weights by their own component (dbrx nests
                # projections under a "norm_attn_norm" module)
                and not name.split(".")[-2].startswith(("norm", "ln"))
                and "wpe" not in name
                and "wte" not in name
            )
            is_expert = (p.ndim == 3 and (
                "experts.gate_up_proj" in name or "experts.down_proj" in name
            ) and not name.endswith("_bias")) or (
                # dbrx flat expert stacks named w1/v1/w2 (no .weight)
                "ffn.experts.mlp." in name
            )
            if is_proj or is_expert:
                trits = rng.integers(-1, 2, size=tuple(p.shape))
                p.copy_(torch.tensor(trits * scale, dtype=p.dtype))


def _run_pair(model, hf_dir, out_dir, t=9, rtol=5e-3, atol=5e-3):
    model = model.float().eval()
    _ternarize_model(model)
    model.save_pretrained(str(hf_dir), safe_serialization=True)

    cfg = convert_hf(hf_dir, out_dir, fmt="i2", dtype_hp="float32")
    cfg2, params, meta = load_checkpoint(out_dir)
    assert meta["ternarized_tensors"] == 0, "conversion must be lossless"
    params_f = float_twin_params(params, cfg2, dtype=jnp.float32)

    rng = np.random.default_rng(7)
    b = 2
    tokens = rng.integers(0, V, (b, t))
    with torch.no_grad():
        want = model(torch.tensor(tokens)).logits.numpy()
    pos = jnp.tile(jnp.arange(t, dtype=jnp.int32), (b, 1))
    got, _ = forward(
        params_f, cfg2, jnp.asarray(tokens, jnp.int32), pos, None, impl="xla"
    )
    got = np.asarray(got, np.float32)[..., : want.shape[-1]]
    np.testing.assert_allclose(got, want, rtol=rtol, atol=atol)
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))
    return cfg


def test_gpt2_parity(tmp_path):
    """gpt2: learned wpe position table, Conv1D (in,out) weight layout,
    straight fused c_attn split, LN+bias, tanh gelu, tied head."""
    c = transformers.GPT2Config(
        vocab_size=V, n_embd=64, n_layer=L, n_head=4, n_inner=None,
        n_positions=64, activation_function="gelu_new",
        layer_norm_epsilon=1e-5,
    )
    torch.manual_seed(0)
    cfg = _run_pair(
        transformers.GPT2LMHeadModel(c), tmp_path / "hf", tmp_path / "out"
    )
    assert cfg.pos_embed == "learned" and cfg.norm_type == "ln"
    assert not cfg.ffn_gated and cfg.tie_embeddings


def test_opt_parity(tmp_path):
    """opt: learned positions with the +2 row offset, relu MLP, LN+bias,
    per-layer final_layer_norm as the FFN norm, tied head."""
    c = transformers.OPTConfig(
        vocab_size=V, hidden_size=64, num_hidden_layers=L,
        num_attention_heads=4, ffn_dim=128, max_position_embeddings=64,
        activation_function="relu", do_layer_norm_before=True,
        word_embed_proj_dim=64,
    )
    torch.manual_seed(1)
    cfg = _run_pair(
        transformers.OPTForCausalLM(c), tmp_path / "hf", tmp_path / "out"
    )
    assert cfg.pos_embed == "learned" and cfg.act_fn == "relu"


def test_bloom_parity(tmp_path):
    """bloom: ALiBi scores, word_embeddings_layernorm after the embedding,
    per-head interleaved fused qkv, LN+bias everywhere, tied head."""
    c = transformers.BloomConfig(
        vocab_size=V, hidden_size=64, n_layer=L, n_head=4,
        layer_norm_epsilon=1e-5, slow_but_exact=False,
    )
    torch.manual_seed(2)
    cfg = _run_pair(
        transformers.BloomForCausalLM(c), tmp_path / "hf", tmp_path / "out"
    )
    assert cfg.pos_embed == "alibi" and cfg.embed_norm


def test_mpt_parity(tmp_path):
    """mpt: ALiBi (power-of-two head schedule), bias-free everything
    (no_bias), straight fused Wqkv, non-gated gelu FFN, tied head."""
    c = transformers.MptConfig(
        vocab_size=V, d_model=64, n_layers=L, n_heads=4, expansion_ratio=4,
        max_seq_len=64, layer_norm_epsilon=1e-5,
    )
    torch.manual_seed(3)
    cfg = _run_pair(
        transformers.MptForCausalLM(c), tmp_path / "hf", tmp_path / "out"
    )
    assert cfg.pos_embed == "alibi" and not cfg.proj_bias


def test_mpt_alibi_extra_heads(tmp_path):
    """mpt with a non-power-of-two head count exercises the interleaved
    extra-head ALiBi slope schedule."""
    c = transformers.MptConfig(
        vocab_size=V, d_model=96, n_layers=L, n_heads=6, expansion_ratio=4,
        max_seq_len=64, layer_norm_epsilon=1e-5,
    )
    torch.manual_seed(4)
    _run_pair(transformers.MptForCausalLM(c), tmp_path / "hf",
              tmp_path / "out")


def test_olmo_parity(tmp_path):
    """olmo-1: NON-PARAMETRIC LayerNorm (no weight tensors; synthesized
    unit gains at convert), clip_qkv clamp, gated silu FFN."""
    c = transformers.OlmoConfig(
        vocab_size=V, hidden_size=64, num_hidden_layers=L,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=128,
        clip_qkv=0.003, max_position_embeddings=64,
        tie_word_embeddings=False,
    )
    torch.manual_seed(5)
    cfg = _run_pair(
        transformers.OlmoForCausalLM(c), tmp_path / "hf", tmp_path / "out"
    )
    assert cfg.norm_type == "ln" and cfg.qkv_clamp == pytest.approx(0.003)


def test_olmo2_parity(tmp_path):
    """olmo2: norm-AFTER-block ordering (no pre-norms; post_attn/post_ffn
    RMS norms on branch outputs), whole-width q/k RMSNorm."""
    c = transformers.Olmo2Config(
        vocab_size=V, hidden_size=64, num_hidden_layers=L,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=128,
        rms_norm_eps=1e-5, max_position_embeddings=64,
        tie_word_embeddings=False,
    )
    torch.manual_seed(6)
    cfg = _run_pair(
        transformers.Olmo2ForCausalLM(c), tmp_path / "hf", tmp_path / "out"
    )
    assert not cfg.pre_norms and cfg.post_norms
    assert cfg.qk_norm and cfg.qk_norm_scope == "whole"


def test_nemotron_parity(tmp_path):
    """nemotron: LayerNorm1P ((1+w) gain + bias), relu² non-gated FFN,
    partial rotary."""
    c = transformers.NemotronConfig(
        vocab_size=V, hidden_size=64, num_hidden_layers=L,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=128,
        norm_eps=1e-5, partial_rotary_factor=0.5, hidden_act="relu2",
        max_position_embeddings=64, tie_word_embeddings=False,
    )
    torch.manual_seed(7)
    cfg = _run_pair(
        transformers.NemotronForCausalLM(c), tmp_path / "hf", tmp_path / "out"
    )
    assert cfg.norm_type == "ln" and cfg.norm_plus_one
    assert cfg.act_fn == "relu2" and cfg.rope_pct == 0.5


def test_cohere2_parity(tmp_path):
    """cohere2: SWA layers carry (interleaved) rope, global layers are
    NoPE; single-norm parallel residual; scaled tied logits.  t=16 with
    window 8 so the sliding mask actually bites."""
    c = transformers.Cohere2Config(
        vocab_size=V, hidden_size=256, num_hidden_layers=4,
        num_attention_heads=2, num_key_value_heads=2, intermediate_size=128,
        logit_scale=0.25, sliding_window=8, sliding_window_pattern=4,
        layer_types=["sliding_attention", "sliding_attention",
                     "sliding_attention", "full_attention"],
        max_position_embeddings=64, layer_norm_eps=1e-5,
    )
    torch.manual_seed(8)
    cfg = _run_pair(
        transformers.Cohere2ForCausalLM(c), tmp_path / "hf",
        tmp_path / "out", t=16,
    )
    assert cfg.nope_layers == (False, False, False, True)
    assert cfg.swa_layers == (True, True, True, False)
    assert cfg.rope_interleaved and cfg.sliding_window == 8


def test_smollm3_parity(tmp_path):
    """smollm3: llama math with every no_rope_layer_interval-th layer
    NoPE (HF no_rope_layers entry 0)."""
    c = transformers.SmolLM3Config(
        vocab_size=V, hidden_size=64, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=128,
        no_rope_layer_interval=2, max_position_embeddings=64,
        tie_word_embeddings=True, pad_token_id=0,
    )
    torch.manual_seed(9)
    cfg = _run_pair(
        transformers.SmolLM3ForCausalLM(c), tmp_path / "hf", tmp_path / "out"
    )
    assert cfg.nope_layers == (False, True, False, True)


def test_gpt_oss_parity(tmp_path):
    """gpt-oss: learned per-head attention sinks in the softmax
    denominator, clamped swiglu ((up+1)*glu, limit 7), MoE with
    interleaved gate_up expert stacks + per-expert biases, router
    softmax-over-top-k, alternating SWA, attention biases."""
    c = transformers.GptOssConfig(
        vocab_size=V, hidden_size=64, num_hidden_layers=L,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        intermediate_size=64, num_local_experts=4, num_experts_per_tok=2,
        sliding_window=8,
        layer_types=["sliding_attention", "full_attention"],
        rope_scaling=None, max_position_embeddings=64,
        tie_word_embeddings=False,
    )
    torch.manual_seed(10)
    model = transformers.GptOssForCausalLM(c)
    # sinks/biases are zero-init in the tiny model; randomize so the test
    # distinguishes a dropped sink/bias from a correct one
    with torch.no_grad():
        for name, p in model.named_parameters():
            if "sinks" in name or name.endswith("_bias") or (
                "router" in name and name.endswith("bias")
            ):
                p.copy_(0.1 * torch.randn_like(p))
    cfg = _run_pair(model, tmp_path / "hf", tmp_path / "out", t=16)
    assert cfg.attn_sinks and cfg.swiglu_limit == 7.0
    assert cfg.moe_expert_bias and cfg.n_experts == 4
    assert cfg.swa_layers == (True, False)


def test_qwen2_moe_parity(tmp_path):
    """qwen2-moe: sigmoid-gated shared expert (shared_expert_gate),
    explicit shared width, and an mlp_only dense layer (heterogeneous
    tuple-layers checkpoint); router softmax top-k WITHOUT renorm
    (norm_topk_prob=False is the HF default and is omitted from the
    serialized config)."""
    c = transformers.Qwen2MoeConfig(
        vocab_size=V, hidden_size=64, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=128, moe_intermediate_size=32,
        shared_expert_intermediate_size=64,
        num_experts=4, num_experts_per_tok=2,
        decoder_sparse_step=1, mlp_only_layers=[1],
        max_position_embeddings=64, tie_word_embeddings=False,
    )
    torch.manual_seed(11)
    cfg = _run_pair(
        transformers.Qwen2MoeForCausalLM(c), tmp_path / "hf",
        tmp_path / "out",
    )
    assert cfg.n_shared_experts == 1 and cfg.d_ff_shared == 64
    assert cfg.dense_layers == (False, True, False)
    assert not cfg.moe_norm_topk and cfg.d_ff_dense == 128


def test_olmoe_parity(tmp_path):
    """olmoe: whole-width q/k RMSNorm applied before clip_qkv, plain
    mixtral-style MoE with norm_topk_prob defaulting to False."""
    c = transformers.OlmoeConfig(
        vocab_size=V, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=32,
        num_experts=4, num_experts_per_tok=2, clip_qkv=0.003,
        max_position_embeddings=64, tie_word_embeddings=False,
    )
    torch.manual_seed(12)
    cfg = _run_pair(
        transformers.OlmoeForCausalLM(c), tmp_path / "hf", tmp_path / "out"
    )
    assert cfg.qk_norm and cfg.qk_norm_scope == "whole"
    assert cfg.qkv_clamp == pytest.approx(0.003) and cfg.n_experts == 4


def test_gptj_parity(tmp_path):
    """gpt-j: partial INTERLEAVED rotary (rotary_dim < head_dim,
    rotate_every_two pairing), single-norm parallel residual, non-gated
    gelu MLP with fc biases, untied lm_head with bias."""
    c = transformers.GPTJConfig(
        vocab_size=V, n_embd=256, n_layer=L, n_head=2, n_inner=None,
        rotary_dim=32, n_positions=64, activation_function="gelu_new",
        layer_norm_epsilon=1e-5, tie_word_embeddings=False,
    )
    torch.manual_seed(13)
    cfg = _run_pair(
        transformers.GPTJForCausalLM(c), tmp_path / "hf", tmp_path / "out"
    )
    assert cfg.rope_interleaved and cfg.rope_pct == 0.25
    assert cfg.parallel_residual and not cfg.ffn_gated


def test_gpt_bigcode_parity(tmp_path):
    """gpt_bigcode (starcoder1/santacoder): MQA (1 kv head) fused c_attn
    in nn.Linear layout, learned positions, LN+bias, tanh gelu."""
    c = transformers.GPTBigCodeConfig(
        vocab_size=V, n_embd=64, n_layer=L, n_head=4, n_inner=128,
        n_positions=64, activation_function="gelu_pytorch_tanh",
        layer_norm_epsilon=1e-5, multi_query=True,
    )
    torch.manual_seed(14)
    cfg = _run_pair(
        transformers.GPTBigCodeForCausalLM(c),
        tmp_path / "hf", tmp_path / "out",
    )
    assert cfg.n_kv_heads == 1 and cfg.pos_embed == "learned"


def test_falcon_7b_style_parity(tmp_path):
    """falcon old decoder arch, multi_query: straight fused qkv with one
    kv head, single-norm parallel residual, bias-free, exact gelu."""
    c = transformers.FalconConfig(
        vocab_size=V, hidden_size=64, num_hidden_layers=L,
        num_attention_heads=4, multi_query=True, parallel_attn=True,
        new_decoder_architecture=False, bias=False, alibi=False,
        layer_norm_epsilon=1e-5,
    )
    torch.manual_seed(15)
    cfg = _run_pair(
        transformers.FalconForCausalLM(c), tmp_path / "hf", tmp_path / "out"
    )
    assert cfg.n_kv_heads == 1 and cfg.parallel_residual
    assert cfg.act_fn == "gelu_exact"


def test_falcon_40b_style_parity(tmp_path):
    """falcon new decoder arch: GQA grouped fused qkv, TWO-norm parallel
    residual (ln_attn + ln_mlp)."""
    c = transformers.FalconConfig(
        vocab_size=V, hidden_size=64, num_hidden_layers=L,
        num_attention_heads=4, num_kv_heads=2, multi_query=False,
        parallel_attn=True, new_decoder_architecture=True, bias=False,
        alibi=False, layer_norm_epsilon=1e-5,
    )
    torch.manual_seed(16)
    cfg = _run_pair(
        transformers.FalconForCausalLM(c), tmp_path / "hf", tmp_path / "out"
    )
    assert cfg.n_kv_heads == 2 and cfg.parallel_residual


def test_falcon_rw_alibi_parity(tmp_path):
    """falcon-rw style: ALiBi positions, sequential residual, per-head
    interleaved fused qkv, biases on."""
    c = transformers.FalconConfig(
        vocab_size=V, hidden_size=64, num_hidden_layers=L,
        num_attention_heads=4, multi_query=False, parallel_attn=False,
        new_decoder_architecture=False, bias=True, alibi=True,
        layer_norm_epsilon=1e-5,
    )
    torch.manual_seed(17)
    cfg = _run_pair(
        transformers.FalconForCausalLM(c), tmp_path / "hf", tmp_path / "out"
    )
    assert cfg.pos_embed == "alibi" and not cfg.parallel_residual


def test_glm4_parity(tmp_path):
    """glm4: sandwich norms (post_self_attn/post_mlp on branch outputs,
    post_attention as the FFN pre-norm), partial interleaved rope, qkv
    biases, fused gate_up."""
    c = transformers.Glm4Config(
        vocab_size=V, hidden_size=256, num_hidden_layers=L,
        num_attention_heads=2, num_key_value_heads=2, head_dim=128,
        intermediate_size=128, partial_rotary_factor=0.5,
        attention_bias=True, rms_norm_eps=1e-5,
        max_position_embeddings=64, tie_word_embeddings=False,
        pad_token_id=0,
    )
    torch.manual_seed(18)
    cfg = _run_pair(
        transformers.Glm4ForCausalLM(c), tmp_path / "hf", tmp_path / "out"
    )
    assert cfg.post_norms and cfg.rope_interleaved and cfg.rope_pct == 0.5


def test_dbrx_parity(tmp_path):
    """dbrx: clip_qkv on the fused Wqkv, bias-free LN pair, MoE with
    flat-stacked w1/v1/w2 expert tensors (w2 stored (in,out)) and
    L1-renormalized top-k weights."""
    c = transformers.DbrxConfig(
        vocab_size=V, d_model=64, n_layers=L, n_heads=4, max_seq_len=64,
        attn_config={"clip_qkv": 0.003, "kv_n_heads": 2,
                     "rope_theta": 10000.0},
        ffn_config={"ffn_hidden_size": 32, "moe_num_experts": 4,
                    "moe_top_k": 2, "moe_normalize_expert_weights": 1.0,
                    "moe_jitter_eps": None},
        tie_word_embeddings=False,
    )
    torch.manual_seed(19)
    cfg = _run_pair(
        transformers.DbrxForCausalLM(c), tmp_path / "hf", tmp_path / "out"
    )
    assert cfg.qkv_clamp == pytest.approx(0.003)
    assert cfg.n_experts == 4 and cfg.moe_norm_topk

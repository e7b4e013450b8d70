"""HF-transformers logit parity for the LN / parallel-residual arch wave.

Each test builds a tiny random HF checkpoint whose projection weights are
EXACT ternary (so conversion is lossless), converts it, dequantizes the
packed weights into float twins (train.finetune.float_twin_params — padded
layouts preserved), and compares full-precision logits against the actual
``transformers`` implementation of the architecture.  This validates the
converter name maps, fused-qkv de-interleaves, and the forward-graph
structure (LayerNorm+bias, parallel residual, partial/interleaved rope,
per-linear biases) against the upstream ground truth — the analog of the
reference's per-arch graph builders (src/models/{gptneox,phi2,starcoder2,
command-r,stablelm}.cpp) being exercised by llama.cpp's convert+run CI.
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
    "self_attn.dense", "attention.dense", "fc1", "fc2", "c_fc", "c_proj",
    "gate_proj", "up_proj", "down_proj", "dense_h_to_4h", "dense_4h_to_h",
    "q_a_proj", "q_b_proj", "kv_a_proj_with_mqa", "kv_b_proj",
)


def _ternarize_model(model, seed=0, scale=0.02):
    """Overwrite every projection weight with exact ternary values."""
    rng = np.random.default_rng(seed)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if (
                p.ndim == 2
                and name.endswith(".weight")
                and any(m in name for m in _PROJ_MARKERS)
                and "embed" not in name
                and "norm" not in name
            ):
                trits = rng.integers(-1, 2, size=tuple(p.shape))
                p.copy_(torch.tensor(trits * scale, dtype=p.dtype))


def _run_pair(model, hf_dir, out_dir, rtol=5e-3, atol=5e-3):
    model = model.float().eval()
    _ternarize_model(model)
    model.save_pretrained(str(hf_dir), safe_serialization=True)

    cfg = convert_hf(hf_dir, out_dir, fmt="i2", dtype_hp="float32")
    cfg2, params, meta = load_checkpoint(out_dir)
    assert meta["ternarized_tensors"] == 0, "conversion must be lossless"
    params_f = float_twin_params(params, cfg2, dtype=jnp.float32)

    rng = np.random.default_rng(7)
    b, t = 2, 9
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


def test_gptneox_parity(tmp_path):
    """Pythia family: LN+bias, bias-everywhere, per-head fused QKV
    interleave, partial rotary (rotary_pct), parallel residual with two
    norms, exact (erf) gelu, non-gated MLP."""
    c = transformers.GPTNeoXConfig(
        vocab_size=V, hidden_size=64, num_hidden_layers=L,
        num_attention_heads=4, intermediate_size=128, rotary_pct=0.25,
        hidden_act="gelu", use_parallel_residual=True,
        max_position_embeddings=64, layer_norm_eps=1e-5,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    cfg = _run_pair(
        transformers.GPTNeoXForCausalLM(c), tmp_path / "hf", tmp_path / "out"
    )
    assert cfg.parallel_residual and cfg.norm_type == "ln"
    assert not cfg.ffn_gated and cfg.act_fn == "gelu_exact"
    assert cfg.rope_pct == 0.25


def test_phi2_parity(tmp_path):
    """phi-2: single-norm parallel residual, partial rotary, lm_head bias,
    gelu_new (tanh), non-gated MLP."""
    c = transformers.PhiConfig(
        vocab_size=V, hidden_size=64, num_hidden_layers=L,
        num_attention_heads=4, num_key_value_heads=4, intermediate_size=128,
        partial_rotary_factor=0.5, hidden_act="gelu_new",
        max_position_embeddings=64, layer_norm_eps=1e-5,
        tie_word_embeddings=False,
    )
    torch.manual_seed(1)
    cfg = _run_pair(
        transformers.PhiForCausalLM(c), tmp_path / "hf", tmp_path / "out"
    )
    assert cfg.parallel_residual and cfg.rope_pct == 0.5


def test_starcoder2_parity(tmp_path):
    """starcoder2: sequential residual, LN+bias, GQA, biases, tanh gelu,
    non-gated c_fc/c_proj MLP."""
    c = transformers.Starcoder2Config(
        vocab_size=V, hidden_size=64, num_hidden_layers=L,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=128, hidden_act="gelu_pytorch_tanh",
        norm_epsilon=1e-5, use_bias=True, max_position_embeddings=64,
        tie_word_embeddings=False,
    )
    torch.manual_seed(2)
    cfg = _run_pair(
        transformers.Starcoder2ForCausalLM(c),
        tmp_path / "hf", tmp_path / "out",
    )
    assert not cfg.parallel_residual and cfg.norm_type == "ln"
    assert cfg.proj_bias and not cfg.ffn_gated


def test_cohere_parity(tmp_path):
    """command-r: bias-free LN, single-norm parallel residual, interleaved
    (original-GPT) rope, scaled logits, tied embeddings.  head_dim must be
    128 (lane-exact) for the interleaved-rope permutation."""
    c = transformers.CohereConfig(
        vocab_size=V, hidden_size=256, num_hidden_layers=L,
        num_attention_heads=2, num_key_value_heads=2,
        intermediate_size=128, logit_scale=0.25,
        max_position_embeddings=64, layer_norm_eps=1e-5,
        use_qk_norm=False, tie_word_embeddings=True,
    )
    torch.manual_seed(3)
    cfg = _run_pair(
        transformers.CohereForCausalLM(c), tmp_path / "hf", tmp_path / "out"
    )
    assert cfg.rope_interleaved and cfg.parallel_residual
    assert cfg.logit_scale == 0.25 and cfg.tie_embeddings


def test_stablelm_parity(tmp_path):
    """stablelm: LN+bias, partial rotary, gated silu MLP, qkv biases,
    sequential residual."""
    c = transformers.StableLmConfig(
        vocab_size=V, hidden_size=64, num_hidden_layers=L,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=128, partial_rotary_factor=0.25,
        hidden_act="silu", use_qkv_bias=True, use_parallel_residual=False,
        layer_norm_eps=1e-5, max_position_embeddings=64,
        tie_word_embeddings=False,
    )
    torch.manual_seed(4)
    cfg = _run_pair(
        transformers.StableLmForCausalLM(c), tmp_path / "hf", tmp_path / "out"
    )
    assert cfg.norm_type == "ln" and cfg.ffn_gated and cfg.qkv_bias
    assert cfg.rope_pct == 0.25


def test_deepseek_v3_mla_parity(tmp_path):
    """deepseek V3 MLA (dense layers: first_k_dense_replace == n_layers):
    q LoRA split + latent KV + absorbed attention + interleaved rope on
    the rope dims must match the HF implementation exactly."""
    c = transformers.DeepseekV3Config(
        vocab_size=V, hidden_size=256, num_hidden_layers=L,
        num_attention_heads=4, num_key_value_heads=4,
        intermediate_size=128, q_lora_rank=256, kv_lora_rank=256,
        qk_nope_head_dim=128, qk_rope_head_dim=64, v_head_dim=128,
        first_k_dense_replace=L, n_routed_experts=4,
        max_position_embeddings=64, rope_scaling=None,
        tie_word_embeddings=False,
    )
    torch.manual_seed(5)
    cfg = _run_pair(
        transformers.DeepseekV3ForCausalLM(c),
        tmp_path / "hf", tmp_path / "out",
    )
    assert cfg.kv_lora_rank == 256 and cfg.q_lora_rank == 256
    assert cfg.qk_nope_dim == 128 and cfg.qk_rope_dim == 64


def test_deepseek_v3_moe_parity(tmp_path):
    """Full deepseek V3 MoE: sigmoid scoring + selection bias (noaux_tc),
    grouped top-k, shared experts, routed_scaling_factor, and a dense
    first layer (first_k_dense_replace=1 -> heterogeneous tuple-layers
    checkpoint) — logits must match the HF implementation."""
    c = transformers.DeepseekV3Config(
        vocab_size=V, hidden_size=256, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4,
        intermediate_size=128, moe_intermediate_size=64,
        q_lora_rank=256, kv_lora_rank=256,
        qk_nope_head_dim=128, qk_rope_head_dim=64, v_head_dim=128,
        n_routed_experts=8, num_experts_per_tok=2,
        n_group=2, topk_group=1, n_shared_experts=1,
        routed_scaling_factor=2.5, norm_topk_prob=True,
        first_k_dense_replace=1,
        max_position_embeddings=64, rope_scaling=None,
        tie_word_embeddings=False,
    )
    torch.manual_seed(6)
    model = transformers.DeepseekV3ForCausalLM(c)
    # the V3 selection bias is zero-init; give it real values so the test
    # distinguishes biased selection from plain sigmoid ordering
    with torch.no_grad():
        for name, p in model.named_parameters():
            if "e_score_correction_bias" in name:
                p.copy_(torch.randn_like(p))
    cfg = _run_pair(model, tmp_path / "hf", tmp_path / "out")
    assert cfg.first_k_dense == 1 and cfg.n_shared_experts == 1
    assert cfg.moe_score == "sigmoid" and cfg.routed_scale == 2.5
    assert cfg.n_expert_groups == 2 and cfg.topk_groups == 1


def test_internlm2_name_mapping(tmp_path):
    """internlm2 stores llama-math under different names with a grouped
    fused wqkv; converting an internlm2-named checkpoint must yield the
    same packed params as the equivalent llama-named one.  (transformers
    has no in-tree internlm2 class, so parity is vs our own llama path,
    which the HF tests above anchor.)"""
    import json

    from safetensors.numpy import save_file

    rng = np.random.default_rng(5)
    D, H, HKV, F = 64, 4, 2, 96
    hd, g = D // H, H // HKV
    base = {
        "vocab_size": V, "hidden_size": D, "num_hidden_layers": L,
        "num_attention_heads": H, "num_key_value_heads": HKV,
        "intermediate_size": F, "rms_norm_eps": 1e-5,
        "rope_theta": 10000.0, "max_position_embeddings": 64,
        "tie_word_embeddings": False,
    }
    embed = rng.standard_normal((V, D)).astype(np.float32)
    head = rng.standard_normal((V, D)).astype(np.float32)
    t_llama, t_intern = {}, {}
    t_llama["model.embed_tokens.weight"] = embed
    t_intern["model.tok_embeddings.weight"] = embed
    t_llama["lm_head.weight"] = head
    t_intern["output.weight"] = head
    t_llama["model.norm.weight"] = np.ones(D, np.float32)
    t_intern["model.norm.weight"] = np.ones(D, np.float32)
    for i in range(L):
        pre = f"model.layers.{i}"
        for a, b in (("input_layernorm", "attention_norm"),
                     ("post_attention_layernorm", "ffn_norm")):
            v = rng.standard_normal(D).astype(np.float32)
            t_llama[f"{pre}.{a}.weight"] = v
            t_intern[f"{pre}.{b}.weight"] = v
        mk = lambda shp: (  # noqa: E731
            rng.integers(-1, 2, size=shp) * np.float32(0.05)
        ).astype(np.float32)
        wq = mk((H * hd, D))
        wk = mk((HKV * hd, D))
        wv = mk((HKV * hd, D))
        # internlm2 wqkv: (kvh, g+2, hd, D) with [q-group; k; v] per group
        wqkv = np.concatenate(
            [
                wq.reshape(HKV, g, hd, D),
                wk.reshape(HKV, 1, hd, D),
                wv.reshape(HKV, 1, hd, D),
            ],
            axis=1,
        ).reshape(HKV * (g + 2) * hd, D)
        t_llama[f"{pre}.self_attn.q_proj.weight"] = wq
        t_llama[f"{pre}.self_attn.k_proj.weight"] = wk
        t_llama[f"{pre}.self_attn.v_proj.weight"] = wv
        t_intern[f"{pre}.attention.wqkv.weight"] = wqkv
        wo = mk((D, H * hd))
        t_llama[f"{pre}.self_attn.o_proj.weight"] = wo
        t_intern[f"{pre}.attention.wo.weight"] = wo
        for a, b, shp in (("mlp.gate_proj", "feed_forward.w1", (F, D)),
                          ("mlp.up_proj", "feed_forward.w3", (F, D)),
                          ("mlp.down_proj", "feed_forward.w2", (D, F))):
            w = mk(shp)
            t_llama[f"{pre}.{a}.weight"] = w
            t_intern[f"{pre}.{b}.weight"] = w

    for tag, cfgd, tensors in (
        ("llama", {**base, "architectures": ["LlamaForCausalLM"],
                   "model_type": "llama"}, t_llama),
        ("intern", {**base, "architectures": ["InternLM2ForCausalLM"],
                    "model_type": "internlm2"}, t_intern),
    ):
        d = tmp_path / tag
        d.mkdir()
        (d / "config.json").write_text(json.dumps(cfgd))
        save_file(tensors, str(d / "model.safetensors"))
        convert_hf(d, tmp_path / f"{tag}_out", fmt="i2")

    _, pa, _ = load_checkpoint(tmp_path / "llama_out")
    _, pb, _ = load_checkpoint(tmp_path / "intern_out")
    for nm in ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down"):
        np.testing.assert_array_equal(
            np.asarray(pa["layers"][nm]["packed"]),
            np.asarray(pb["layers"][nm]["packed"]),
            err_msg=nm,
        )

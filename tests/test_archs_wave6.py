"""Arch wave 6 — closing the ARCHS.md tail (VERDICT r3 item 5).

exaone / minicpm / llama-embed are exact re-namings or multiplier folds of
the HF-verified llama body (reference src/models/exaone.cpp — a plain
llama graph; llm_build_granite for minicpm; llm_build_llama<true> for
llama-embed).  Each test builds the SAME logical weights under both name
schemes / with multipliers pre-folded and asserts identical outputs.
"""

import dataclasses
import json

import numpy as np
import pytest
import jax.numpy as jnp

pytest.importorskip("torch")

from test_archs_clones import (
    _LLAMA_CFG,
    _base_weights,
    _llama_tensors,
    _logits,
    _write,
    D,
    FF,
    KV,
    HD,
    L,
    V,
)
from vlut_tpu.convert.checkpoint import load_checkpoint
from vlut_tpu.convert.convert import convert_hf
from vlut_tpu.models.transformer import forward
from vlut_tpu.train.finetune import float_twin_params


def test_exaone_equals_llama(tmp_path):
    """EXAONE-3.x (reference src/models/exaone.cpp — a plain llama graph
    with the 'transformer.h' tensor scheme and its own config key names:
    num_layers / layer_norm_epsilon / activation_function)."""
    w = _base_weights(seed=11)
    _write(tmp_path / "llama", _LLAMA_CFG, _llama_tensors(w))

    t = {"transformer.wte.weight": w["embed"],
         "transformer.ln_f.weight": w["final"],
         "lm_head.weight": w["head"]}
    for i in range(L):
        p = f"transformer.h.{i}."
        t[p + "ln_1.weight"] = w[f"an{i}"]
        t[p + "ln_2.weight"] = w[f"fn{i}"]
        t[p + "attn.attention.q_proj.weight"] = w[f"q{i}"]
        t[p + "attn.attention.k_proj.weight"] = w[f"k{i}"]
        t[p + "attn.attention.v_proj.weight"] = w[f"v{i}"]
        t[p + "attn.attention.out_proj.weight"] = w[f"o{i}"]
        t[p + "mlp.c_fc_0.weight"] = w[f"g{i}"]
        t[p + "mlp.c_fc_1.weight"] = w[f"u{i}"]
        t[p + "mlp.c_proj.weight"] = w[f"d{i}"]
    cfg_ex = {
        "model_type": "exaone", "architectures": ["ExaoneForCausalLM"],
        "vocab_size": V, "hidden_size": D, "num_layers": L,
        "num_attention_heads": _LLAMA_CFG["num_attention_heads"],
        "num_key_value_heads": KV, "intermediate_size": FF,
        "layer_norm_epsilon": 1e-5, "rope_theta": 10000.0,
        "activation_function": "silu", "max_position_embeddings": 64,
        "tie_word_embeddings": False,
    }
    _write(tmp_path / "exaone", cfg_ex, t)
    convert_hf(tmp_path / "llama", tmp_path / "out_l", dtype_hp="float32")
    convert_hf(tmp_path / "exaone", tmp_path / "out_e", dtype_hp="float32")
    np.testing.assert_array_equal(
        _logits(tmp_path / "out_l")[0], _logits(tmp_path / "out_e")[0])


def test_minicpm_equals_prefolded_llama(tmp_path):
    """MiniCPM (reference llm_build_granite via LLM_ARCH_MINICPM,
    llama-model.cpp:750-772 + convert MiniCPMModel:3390-3395): llama body
    with scale_emb on embeddings, scale_depth/sqrt(L) on each residual
    branch, and logits divided by hidden_size/dim_model_base.  A llama
    twin with all three PRE-FOLDED into its weights must give the same
    logits."""
    scale_emb, scale_depth, dim_model_base = 12.0, 1.4, D // 2
    rs = scale_depth / np.sqrt(L)  # per-branch residual multiplier
    ls = dim_model_base / D            # logit multiplier (exact: 0.5)

    w = _base_weights(seed=12)
    cfg_mc = {
        **_LLAMA_CFG, "model_type": "minicpm",
        "architectures": ["MiniCPMForCausalLM"],
        "scale_emb": scale_emb, "scale_depth": scale_depth,
        "dim_model_base": dim_model_base,
    }
    _write(tmp_path / "minicpm", cfg_mc, _llama_tensors(w))

    wf = dict(w)
    wf["embed"] = w["embed"] * scale_emb
    wf["head"] = w["head"] * ls
    for i in range(L):
        wf[f"o{i}"] = w[f"o{i}"] * rs
        wf[f"d{i}"] = w[f"d{i}"] * rs
    _write(tmp_path / "llama", _LLAMA_CFG, _llama_tensors(wf))

    convert_hf(tmp_path / "minicpm", tmp_path / "out_m",
               dtype_hp="float32")
    convert_hf(tmp_path / "llama", tmp_path / "out_l", dtype_hp="float32")
    lm, cfg = _logits(tmp_path / "out_m")
    ll, _ = _logits(tmp_path / "out_l")
    assert cfg.embed_scale == scale_emb
    np.testing.assert_allclose(lm, ll, rtol=2e-5, atol=1e-6)


def _ternarize_granitemoe(model, seed=0, scale=0.02):
    """Exact-ternary projections incl. the JetMoe 3-D parallel-expert
    stacks (input_linear/output_linear) and the fused shared_mlp."""
    import torch

    rng = np.random.default_rng(seed)
    with torch.no_grad():
        for name, p in model.named_parameters():
            tern = (
                any(m in name for m in (
                    "q_proj", "k_proj", "v_proj", "o_proj",
                    "input_linear", "output_linear",
                )) and name.endswith(".weight")
                and "norm" not in name and "router" not in name
            )
            if tern:
                trits = rng.integers(-1, 2, size=tuple(p.shape))
                p.copy_(torch.tensor(trits * scale, dtype=p.dtype))


def _granitemoe_pair(model, hf_dir, out_dir, t=9):
    import torch

    model = model.float().eval()
    _ternarize_granitemoe(model)
    model.save_pretrained(str(hf_dir), safe_serialization=True)
    cfg = convert_hf(hf_dir, out_dir, fmt="i2", dtype_hp="float32")
    cfg2, params, meta = load_checkpoint(out_dir)
    assert meta["ternarized_tensors"] == 0, "conversion must be lossless"
    params_f = float_twin_params(params, cfg2, dtype=jnp.float32)
    rng = np.random.default_rng(7)
    tokens = rng.integers(0, V, (2, t))
    with torch.no_grad():
        want = model(torch.tensor(tokens)).logits.numpy()
    pos = jnp.tile(jnp.arange(t, dtype=jnp.int32), (2, 1))
    got, _ = forward(params_f, cfg2, jnp.asarray(tokens, jnp.int32), pos,
                     None, impl="xla")
    got = np.asarray(got, np.float32)[..., : want.shape[-1]]
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))
    return cfg


def test_granitemoe_parity(tmp_path):
    """granitemoe (reference llm_build_granite via LLM_ARCH_GRANITE_MOE,
    llama-model.cpp:7791-7796; convert GraniteMoeModel:8535-8562): granite
    multipliers + JetMoe fused parallel experts (input_linear = stacked
    [gate; up], output_linear = stacked down), softmax top-k renorm."""
    import torch
    transformers = pytest.importorskip("transformers")

    c = transformers.GraniteMoeConfig(
        vocab_size=V, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=32, num_local_experts=4, num_experts_per_tok=2,
        embedding_multiplier=6.0, logits_scaling=8.0,
        residual_multiplier=0.5, attention_multiplier=0.1,
        max_position_embeddings=64, tie_word_embeddings=False,
    )
    torch.manual_seed(21)
    cfg = _granitemoe_pair(
        transformers.GraniteMoeForCausalLM(c), tmp_path / "hf",
        tmp_path / "out")
    assert cfg.n_experts == 4 and cfg.n_experts_used == 2
    assert cfg.embed_scale == 6.0 and cfg.logit_scale == 0.125
    assert cfg.attn_scale == 0.1 and cfg.moe_norm_topk


def test_granitemoe_shared_parity(tmp_path):
    """granitemoeshared: same + an always-on parallel shared FFN at
    shared_intermediate_size (reference granite.cpp:184-196 n_ff_shexp,
    convert GraniteMoeModel:8544-8546,8566-8583)."""
    import torch
    transformers = pytest.importorskip("transformers")

    c = transformers.GraniteMoeSharedConfig(
        vocab_size=V, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=32, shared_intermediate_size=48,
        num_local_experts=4, num_experts_per_tok=2,
        embedding_multiplier=2.0, logits_scaling=4.0,
        residual_multiplier=0.25, attention_multiplier=0.125,
        max_position_embeddings=64, tie_word_embeddings=False,
    )
    torch.manual_seed(22)
    cfg = _granitemoe_pair(
        transformers.GraniteMoeSharedForCausalLM(c), tmp_path / "hf",
        tmp_path / "out")
    assert cfg.n_shared_experts == 1 and cfg.d_ff_shared == 48


def test_llama_embed_bidirectional_hidden(tmp_path):
    """llama-embed (reference llm_build_llama<true>: no-cache bidirectional
    attention, t_embd output, no lm_head; src/llama-model.cpp:7465-7467,
    convert LlamaEmbedNemotronModel 'LlamaBidirectionalModel').  Hidden
    states must equal a llama twin run with causal_attn=False."""
    w = _base_weights(seed=13)
    t = _llama_tensors(w)
    del t["lm_head.weight"]  # embedding model: no output head
    cfg_e = {
        **_LLAMA_CFG, "architectures": ["LlamaBidirectionalModel"],
        "tie_word_embeddings": True,
    }
    _write(tmp_path / "embed", cfg_e, t)
    _write(tmp_path / "llama", _LLAMA_CFG, _llama_tensors(w))
    cfg = convert_hf(tmp_path / "embed", tmp_path / "out_e",
                     dtype_hp="float32")
    assert not cfg.causal_attn
    convert_hf(tmp_path / "llama", tmp_path / "out_l", dtype_hp="float32")

    def hidden(ckpt, force_bidir=False):
        c, params, _ = load_checkpoint(ckpt)
        if force_bidir:
            c = dataclasses.replace(c, causal_attn=False)
        pf = float_twin_params(params, c, dtype=jnp.float32)
        rng = np.random.default_rng(3)
        toks = jnp.asarray(rng.integers(0, V, (2, 7)), jnp.int32)
        pos = jnp.tile(jnp.arange(7, dtype=jnp.int32), (2, 1))
        h, _ = forward(pf, c, toks, pos, None, impl="xla",
                       output="hidden")
        return np.asarray(h)

    np.testing.assert_array_equal(
        hidden(tmp_path / "out_e"),
        hidden(tmp_path / "out_l", force_bidir=True))


# ---------------------------------------------------------------------------
# hybrid-family tail: lfm2moe + nemotron-h-moe (no HF classes in this
# transformers build, so both use hand-built safetensors twins + direct
# numpy transcriptions of the reference graphs — the test_nemotron_h
# pattern from test_hybrid.py)
# ---------------------------------------------------------------------------


def _np_moe_noauxtc(h, router, bias, k, score="sigmoid", renorm=True,
                    scale=1.0):
    """numpy transcription of build_moe_ffn routing (reference
    src/llama-graph.cpp:936-1080): scores from sigmoid/softmax; top-k
    SELECTION on scores+bias; combine weights from the UNBIASED scores;
    optional renormalize; optional expert_weights_scale.  Returns the
    (..., E) combine-weight tensor."""
    logits = h @ router
    if score == "sigmoid":
        scores = 1.0 / (1.0 + np.exp(-logits))
    else:
        e = np.exp(logits - logits.max(-1, keepdims=True))
        scores = e / e.sum(-1, keepdims=True)
    sel = scores + bias if bias is not None else scores
    top_i = np.argsort(-sel, axis=-1)[..., :k]
    top_w = np.take_along_axis(scores, top_i, axis=-1)
    if renorm:
        top_w = top_w / top_w.sum(-1, keepdims=True)
    top_w = top_w * scale
    comb = np.zeros_like(scores)
    np.put_along_axis(comb, top_i, top_w, axis=-1)
    return comb


def test_lfm2moe_parity(tmp_path):
    """lfm2moe (reference LLM_ARCH_LFM2MOE, src/models/lfm2.cpp
    build_moe_feed_forward + llama-model.cpp:2233-2246; converter
    LFM2MoeModel convert_hf_to_gguf.py:9951-10015): the lfm2 shortconv
    body with num_dense_layers leading dense blocks, then sigmoid-gated
    MoE with a selection-only expert bias and renormalized top-k.

    (a) end-to-end: IDENTICAL experts make the renormalized combine sum
        to exactly the dense output, so the lfm2moe checkpoint must match
    a plain-lfm2 twin (whose forward is HF-verified in test_hybrid.py);
    (b) the routing math is checked against a direct numpy transcription
        of build_moe_ffn on random distinct experts."""
    from vlut_tpu.convert.hybrid import convert_hybrid
    from vlut_tpu.models.hybrid import HybridConfig, _ffn
    from vlut_tpu.models.hybrid import forward as hforward

    rng = np.random.default_rng(31)
    Dm, Lm, FFD, FFM, E, K, CL = 32, 2, 48, 24, 4, 2, 3

    def r(*s):
        return (rng.standard_normal(s) * 0.1).astype(np.float32)

    base = {"model.embed_tokens.weight": r(V, Dm),
            "model.embedding_norm.weight": np.abs(r(Dm)) + 0.5}
    for i in range(Lm):
        p = f"model.layers.{i}."
        base.update({
            p + "operator_norm.weight": np.abs(r(Dm)) + 0.5,
            p + "ffn_norm.weight": np.abs(r(Dm)) + 0.5,
            p + "conv.conv.weight": r(Dm, 1, CL),
            p + "conv.in_proj.weight": r(3 * Dm, Dm),
            p + "conv.out_proj.weight": r(Dm, Dm),
        })
    d0 = {f"model.layers.0.feed_forward.{n}.weight": w
          for n, w in zip(("w1", "w3", "w2"),
                          (r(FFD, Dm), r(FFD, Dm), r(Dm, FFD)))}
    m1, m3, m2w = r(FFM, Dm), r(FFM, Dm), r(Dm, FFM)

    t_moe = dict(base, **d0)
    t_moe["model.layers.1.feed_forward.gate.weight"] = r(E, Dm)
    t_moe["model.layers.1.feed_forward.expert_bias"] = r(E) * 3.0
    for x in range(E):
        px = f"model.layers.1.feed_forward.experts.{x}."
        t_moe[px + "w1.weight"] = m1
        t_moe[px + "w3.weight"] = m3
        t_moe[px + "w2.weight"] = m2w
    t_dense = dict(base, **d0)
    t_dense["model.layers.1.feed_forward.w1.weight"] = m1
    t_dense["model.layers.1.feed_forward.w3.weight"] = m3
    t_dense["model.layers.1.feed_forward.w2.weight"] = m2w

    cfg_moe = {
        "model_type": "lfm2_moe", "architectures": ["Lfm2MoeForCausalLM"],
        "vocab_size": V, "hidden_size": Dm, "num_hidden_layers": Lm,
        "num_attention_heads": 4, "num_key_value_heads": 2,
        "intermediate_size": FFD, "moe_intermediate_size": FFM,
        "num_dense_layers": 1, "num_experts": E, "num_experts_per_tok": K,
        "norm_topk_prob": True, "layer_types": ["conv"] * Lm,
        "conv_L_cache": CL, "norm_eps": 1e-5, "rope_theta": 1000000.0,
        "tie_word_embeddings": True, "max_position_embeddings": 64,
    }
    cfg_l2 = {
        "model_type": "lfm2", "architectures": ["Lfm2ForCausalLM"],
        "vocab_size": V, "hidden_size": Dm, "num_hidden_layers": Lm,
        "num_attention_heads": 4, "num_key_value_heads": 2,
        "intermediate_size": FFD, "layer_types": ["conv"] * Lm,
        "conv_L_cache": CL, "norm_eps": 1e-5, "rope_theta": 1000000.0,
        "tie_word_embeddings": True, "max_position_embeddings": 64,
    }
    _write(tmp_path / "moe", cfg_moe, t_moe)
    _write(tmp_path / "l2", cfg_l2, t_dense)
    cfg = convert_hybrid(tmp_path / "moe", tmp_path / "out_moe")
    assert cfg.arch == "lfm2moe" and cfg.moe_score == "sigmoid"
    assert cfg.ffn_types == ("dense", "moe") and cfg.d_ff == FFM
    assert cfg.n_experts == E and cfg.n_experts_used == K and cfg.moe_renorm
    convert_hybrid(tmp_path / "l2", tmp_path / "out_l2")

    def logits_of(ckpt):
        c, params, _ = load_checkpoint(ckpt)
        import jax

        params = jax.tree.map(jnp.asarray, params)
        rng2 = np.random.default_rng(7)
        toks = jnp.asarray(rng2.integers(0, V, (2, 9)), jnp.int32)
        return np.asarray(hforward(params, c, toks))

    np.testing.assert_allclose(
        logits_of(tmp_path / "out_moe"), logits_of(tmp_path / "out_l2"),
        rtol=2e-5, atol=2e-6)

    # (b) routing math vs numpy transcription, distinct experts
    cfgu = HybridConfig(
        arch="lfm2moe", vocab_size=8, d_model=Dm, n_layers=1, n_heads=1,
        n_kv_heads=1, d_ff=FFM, layer_types=("conv",), ffn_types=("moe",),
        n_experts=E, n_experts_used=K, moe_score="sigmoid", moe_renorm=True,
    )
    lp = {"router": r(Dm, E), "e_bias": r(E) * 3.0,
          "e_gate": r(E, Dm, FFM), "e_up": r(E, Dm, FFM),
          "e_down": r(E, FFM, Dm)}
    h = r(2, 5, Dm)
    got = np.asarray(
        _ffn(cfgu, {k2: jnp.asarray(v) for k2, v in lp.items()},
             jnp.asarray(h), "moe"))
    comb = _np_moe_noauxtc(
        h.astype(np.float64), lp["router"], lp["e_bias"], K)
    want = np.zeros(h.shape, np.float64)
    hf = h.astype(np.float64)
    for x in range(E):
        g = hf @ lp["e_gate"][x]
        ex = (g / (1 + np.exp(-g)) * (hf @ lp["e_up"][x])) @ lp["e_down"][x]
        want += comb[..., x, None] * ex
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_nemotron_h_moe_transcription(tmp_path):
    """nemotron-h-moe (reference LLM_ARCH_NEMOTRON_H_MOE,
    src/models/nemotron-h.cpp build_ffn_layer:109-145; converter
    NemotronHModel convert_hf_to_gguf.py:8729-8830): 'E' pattern slots
    carry a sigmoid-routed, selection-biased (e_score_correction),
    renormalized + expert_weights_scale'd MoE of ungated relu^2 experts
    plus a parallel ungated relu^2 shared expert.  Full-model logits are
    checked against a direct numpy transcription of that graph."""
    from vlut_tpu.convert.convert import convert_hf
    from vlut_tpu.models.hybrid import forward as hforward

    rng = np.random.default_rng(32)
    Dm, E, K, FFM, FFS, RSC = 32, 4, 2, 24, 40, 2.5

    def r(*s):
        return (rng.standard_normal(s) * 0.15).astype(np.float32)

    p = "backbone.layers.0."
    t = {
        "backbone.embeddings.weight": r(V, Dm),
        "backbone.norm_f.weight": np.abs(r(Dm)) + 0.5,
        "lm_head.weight": r(V, Dm),
        p + "norm.weight": np.abs(r(Dm)) + 0.5,
        p + "mixer.gate.weight": r(E, Dm),
        p + "mixer.gate.e_score_correction_bias": r(E) * 3.0,
        p + "mixer.shared_experts.up_proj.weight": r(FFS, Dm),
        p + "mixer.shared_experts.down_proj.weight": r(Dm, FFS),
    }
    for x in range(E):
        t[p + f"mixer.experts.{x}.up_proj.weight"] = r(FFM, Dm)
        t[p + f"mixer.experts.{x}.down_proj.weight"] = r(Dm, FFM)

    cfg_raw = {
        "model_type": "nemotron_h",
        "architectures": ["NemotronHForCausalLM"],
        "vocab_size": V, "hidden_size": Dm, "num_hidden_layers": 1,
        "num_attention_heads": 4, "num_key_value_heads": 2,
        "attention_head_dim": 8, "hybrid_override_pattern": "E",
        "intermediate_size": 48, "moe_intermediate_size": FFM,
        "moe_shared_expert_intermediate_size": FFS,
        "n_routed_experts": E, "num_experts_per_tok": K,
        "norm_topk_prob": True, "routed_scaling_factor": RSC,
        "n_shared_experts": 1, "n_group": 1,
        "mamba_num_heads": 8, "mamba_head_dim": 8, "n_groups": 2,
        "ssm_state_size": 16, "conv_kernel": 4, "rms_norm_eps": 1e-5,
        "hidden_act": "relu2", "tie_word_embeddings": False,
        "max_position_embeddings": 64,
    }
    _write(tmp_path / "hf", cfg_raw, t)
    cfg = convert_hf(tmp_path / "hf", tmp_path / "out")
    assert cfg.arch == "nemotron_h_moe" and cfg.layer_types == ("ffn",)
    assert cfg.n_experts == E and cfg.n_experts_used == K
    assert cfg.routed_scale == RSC and cfg.d_ff_shared == FFS
    assert cfg.moe_score == "sigmoid" and not cfg.rope

    _, params, _ = load_checkpoint(tmp_path / "out")
    import jax

    params = jax.tree.map(jnp.asarray, params)
    rng2 = np.random.default_rng(9)
    toks = rng2.integers(0, V, (2, 6))
    got = np.asarray(hforward(params, cfg, jnp.asarray(toks, jnp.int32)))

    # ---- numpy transcription ------------------------------------------
    def np_rms(z, w, eps=1e-5):
        z = z.astype(np.float64)
        return z / np.sqrt((z * z).mean(-1, keepdims=True) + eps) * w

    relu2 = lambda z: np.square(np.maximum(z, 0.0))  # noqa: E731
    x = t["backbone.embeddings.weight"][toks].astype(np.float64)
    h = np_rms(x, t[p + "norm.weight"])
    comb = _np_moe_noauxtc(
        h, t[p + "mixer.gate.weight"].T.astype(np.float64),
        t[p + "mixer.gate.e_score_correction_bias"], K, scale=RSC)
    mix = np.zeros_like(h)
    for x_ in range(E):
        u = t[p + f"mixer.experts.{x_}.up_proj.weight"].T
        d = t[p + f"mixer.experts.{x_}.down_proj.weight"].T
        mix += comb[..., x_, None] * (relu2(h @ u) @ d)
    mix += relu2(
        h @ t[p + "mixer.shared_experts.up_proj.weight"].T
    ) @ t[p + "mixer.shared_experts.down_proj.weight"].T
    x = x + mix
    want = np_rms(x, t["backbone.norm_f.weight"]) @ t["lm_head.weight"].T
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))

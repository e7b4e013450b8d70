"""Converter coverage, MoE wave: bailingmoe (Ling v1), bailingmoe2
(Ling 2.0), phimoe (Phi-3.5-MoE), grok — archs without an installed HF
implementation that reproduces the reference's serving semantics.

Strategy (same as test_archs_clones*.py): each arch re-combines semantics
that ARE HF-logit-verified elsewhere.  Build the SAME logical weights under
the clone's HF names and under an already-verified arch's names, convert
both, assert identical logits (forcing clone-only config flags on the twin
via cfg_replace where the twin's own config cannot express them).  Grok's
scale/softcap composition has no verified twin, so it is checked against a
direct numpy transcription of the reference graph.  Reference analogs:
src/models/{bailingmoe,bailingmoe2,phi3,grok}.cpp.
"""

import dataclasses
import json

import numpy as np
import pytest
import jax.numpy as jnp

pytest.importorskip("torch")

from vlut_tpu.convert.checkpoint import load_checkpoint
from vlut_tpu.convert.convert import convert_hf
from vlut_tpu.models.transformer import forward
from vlut_tpu.train.finetune import float_twin_params

V, D, L, H, KV, FF = 64, 32, 2, 4, 2, 48
HD = D // H


def _write(dirp, cfg: dict, tensors: dict):
    from safetensors.numpy import save_file

    dirp.mkdir(parents=True, exist_ok=True)
    (dirp / "config.json").write_text(json.dumps(cfg))
    save_file({k: np.ascontiguousarray(v, np.float32)
               for k, v in tensors.items()}, str(dirp / "model.safetensors"))


def _logits(ckpt_dir, t=7, seed=3, vocab=V, **cfg_replace):
    cfg, params, _ = load_checkpoint(ckpt_dir)
    if cfg_replace:
        cfg = dataclasses.replace(cfg, **cfg_replace)
    pf = float_twin_params(params, cfg, dtype=jnp.float32)
    rng = np.random.default_rng(seed)
    toks = rng.integers(0, vocab, (1, t))
    pos = jnp.arange(t, dtype=jnp.int32)[None]
    lg, _ = forward(pf, cfg, jnp.asarray(toks, jnp.int32), pos, None,
                    impl="xla")
    return np.asarray(lg)[..., :vocab], cfg


def _t2(rng, k, n):
    return rng.integers(-1, 2, (k, n)).astype(np.float32) * 0.02


def _gain(rng, n):
    return np.abs(rng.standard_normal(n)).astype(np.float32) + 0.5


def _moe_tensors(rng, prefix, e, mff, d=D):
    """Per-expert gate/up/down under deepseek-style names."""
    t = {}
    for x in range(e):
        t[f"{prefix}mlp.experts.{x}.gate_proj.weight"] = _t2(rng, mff, d)
        t[f"{prefix}mlp.experts.{x}.up_proj.weight"] = _t2(rng, mff, d)
        t[f"{prefix}mlp.experts.{x}.down_proj.weight"] = _t2(rng, d, mff)
    return t


def test_bailingmoe_equals_ernie_moe(tmp_path):
    """Ling v1 == ernie4.5-MoE semantics: llama attention, softmax top-k
    (renormalized), always-on shared expert, fused query_key_value split
    by [q_dim; kv; kv] (reference src/models/bailingmoe.cpp vs
    ernie4-5-moe.cpp — same build_moe_ffn args, softmax + norm_w)."""
    rng = np.random.default_rng(11)
    E, TOPK, MFF = 4, 2, 32
    q = _t2(rng, D, D)
    k = _t2(rng, KV * HD, D)
    v = _t2(rng, KV * HD, D)
    shared = {
        "model.norm.weight": _gain(rng, D),
        "lm_head.weight": _t2(rng, V, D),
    }
    emb = rng.standard_normal((V, D)).astype(np.float32) * 0.02
    t_b = {"model.word_embeddings.weight": emb, **shared}
    t_e = {"model.embed_tokens.weight": emb, **shared}
    for i in range(L):
        p = f"model.layers.{i}."
        t_b[p + "attention.query_key_value.weight"] = np.concatenate(
            [q, k, v], axis=0)
        t_e[p + "self_attn.q_proj.weight"] = q
        t_e[p + "self_attn.k_proj.weight"] = k
        t_e[p + "self_attn.v_proj.weight"] = v
        o = _t2(rng, D, D)
        t_b[p + "attention.dense.weight"] = o
        t_e[p + "self_attn.o_proj.weight"] = o
        gate = rng.standard_normal((E, D)).astype(np.float32) * 0.1
        t_b[p + "mlp.gate.weight"] = gate
        t_e[p + "mlp.gate.weight"] = gate
        experts = _moe_tensors(rng, p, E, MFF)
        t_b.update(experts)
        t_e.update(experts)
        for nm, kk, nn in (("gate", MFF, D), ("up", MFF, D), ("down", D, MFF)):
            w = _t2(rng, kk, nn)
            t_b[p + f"mlp.shared_experts.{nm}_proj.weight"] = w
            t_e[p + f"mlp.shared_experts.{nm}_proj.weight"] = w
        for nm in ("input_layernorm", "post_attention_layernorm"):
            g = _gain(rng, D)
            t_b[p + nm + ".weight"] = g
            t_e[p + nm + ".weight"] = g
    base = {
        "vocab_size": V, "hidden_size": D, "num_hidden_layers": L,
        "num_attention_heads": H, "num_key_value_heads": KV,
        "intermediate_size": FF, "rms_norm_eps": 1e-5,
        "rope_theta": 10000.0, "max_position_embeddings": 64,
        "tie_word_embeddings": False,
    }
    _write(tmp_path / "bl", {
        **base, "model_type": "bailing_moe",
        "architectures": ["BailingMoeForCausalLM"],
        "num_experts": E, "num_experts_per_tok": TOPK,
        "moe_intermediate_size": MFF, "num_shared_experts": 1,
        "norm_topk_prob": True, "first_k_dense_replace": 0,
    }, t_b)
    _write(tmp_path / "er", {
        **base, "model_type": "ernie4_5_moe",
        "architectures": ["Ernie4_5_MoeForCausalLM"],
        "moe_num_experts": E, "moe_k": TOPK,
        "moe_intermediate_size": MFF, "moe_num_shared_experts": 1,
        "moe_layer_start_index": 0, "moe_layer_interval": 1,
    }, t_e)
    cfg_b = convert_hf(tmp_path / "bl", tmp_path / "out_b",
                       dtype_hp="float32")
    convert_hf(tmp_path / "er", tmp_path / "out_e", dtype_hp="float32")
    assert cfg_b.n_experts == E and cfg_b.n_shared_experts == 1
    assert cfg_b.moe_norm_topk and cfg_b.moe_score == "softmax"
    lb, _ = _logits(tmp_path / "out_b")
    le, _ = _logits(tmp_path / "out_e")
    np.testing.assert_array_equal(lb, le)


def test_bailingmoe_norm_head(tmp_path):
    """norm_head: the lm_head is column-L2-normalized at convert time
    (convert_hf_to_gguf BailingMoeModel: w / (||w||_2(dim=0) + 1e-7))."""
    rng = np.random.default_rng(5)
    E, MFF = 2, 32
    head = rng.standard_normal((V, D)).astype(np.float32)
    t = {"model.word_embeddings.weight":
         rng.standard_normal((V, D)).astype(np.float32) * 0.02,
         "model.norm.weight": _gain(rng, D), "lm_head.weight": head}
    for i in range(L):
        p = f"model.layers.{i}."
        t[p + "attention.query_key_value.weight"] = _t2(
            rng, D + 2 * KV * HD, D)
        t[p + "attention.dense.weight"] = _t2(rng, D, D)
        t[p + "mlp.gate.weight"] = rng.standard_normal(
            (E, D)).astype(np.float32) * 0.1
        t.update(_moe_tensors(rng, p, E, MFF))
        t[p + "input_layernorm.weight"] = _gain(rng, D)
        t[p + "post_attention_layernorm.weight"] = _gain(rng, D)
    cfgj = {
        "vocab_size": V, "hidden_size": D, "num_hidden_layers": L,
        "num_attention_heads": H, "num_key_value_heads": KV,
        "intermediate_size": FF, "model_type": "bailing_moe",
        "architectures": ["BailingMoeForCausalLM"], "norm_head": True,
        "num_experts": E, "num_experts_per_tok": 1,
        "moe_intermediate_size": MFF, "num_shared_experts": 0,
        "tie_word_embeddings": False, "max_position_embeddings": 64,
    }
    _write(tmp_path / "bl", cfgj, t)
    convert_hf(tmp_path / "bl", tmp_path / "out", dtype_hp="float32")
    _, params, _ = load_checkpoint(tmp_path / "out")
    want = head / (np.linalg.norm(head, axis=0, keepdims=True) + 1e-7)
    got = np.asarray(params["lm_head"], np.float32)[:, :V]  # (D, V)
    np.testing.assert_allclose(got, want.T, rtol=1e-6, atol=1e-6)


def test_bailingmoe2_equals_dots1(tmp_path):
    """Ling 2.0 == dots1 semantics (sigmoid router + selection-only
    expert bias + routed scaling + shared experts + dense lead + per-head
    qk-norm) with half partial rope forced on the twin; the trailing
    nextn (MTP) layer in the checkpoint is dropped (reference
    src/models/bailingmoe2.cpp nextn_predict_layers)."""
    rng = np.random.default_rng(23)
    E, TOPK, MFF = 4, 2, 32
    q = _t2(rng, D, D)
    k = _t2(rng, KV * HD, D)
    v = _t2(rng, KV * HD, D)
    emb = rng.standard_normal((V, D)).astype(np.float32) * 0.02
    shared = {"model.norm.weight": _gain(rng, D),
              "lm_head.weight": _t2(rng, V, D)}
    t_b = {"model.word_embeddings.weight": emb, **shared}
    t_d = {"model.embed_tokens.weight": emb, **shared}
    for i in range(L):
        p = f"model.layers.{i}."
        t_b[p + "attention.query_key_value.weight"] = np.concatenate(
            [q, k, v], axis=0)
        t_d[p + "self_attn.q_proj.weight"] = q
        t_d[p + "self_attn.k_proj.weight"] = k
        t_d[p + "self_attn.v_proj.weight"] = v
        o = _t2(rng, D, D)
        t_b[p + "attention.dense.weight"] = o
        t_d[p + "self_attn.o_proj.weight"] = o
        qn, kn = _gain(rng, HD), _gain(rng, HD)
        t_b[p + "attention.query_layernorm.weight"] = qn
        t_b[p + "attention.key_layernorm.weight"] = kn
        t_d[p + "self_attn.q_norm.weight"] = qn
        t_d[p + "self_attn.k_norm.weight"] = kn
        for nm in ("input_layernorm", "post_attention_layernorm"):
            g = _gain(rng, D)
            t_b[p + nm + ".weight"] = g
            t_d[p + nm + ".weight"] = g
        if i == 0:
            # dense lead layer
            for nm, kk, nn in (("gate", FF, D), ("up", FF, D),
                               ("down", D, FF)):
                w = _t2(rng, kk, nn)
                t_b[p + f"mlp.{nm}_proj.weight"] = w
                t_d[p + f"mlp.{nm}_proj.weight"] = w
            continue
        gate = rng.standard_normal((E, D)).astype(np.float32) * 0.1
        bias = rng.standard_normal(E).astype(np.float32) * 0.05
        t_b[p + "mlp.gate.weight"] = gate
        t_d[p + "mlp.gate.weight"] = gate
        t_b[p + "mlp.gate.expert_bias"] = bias
        t_d[p + "mlp.gate.e_score_correction_bias"] = bias
        experts = _moe_tensors(rng, p, E, MFF)
        t_b.update(experts)
        t_d.update(experts)
        for nm, kk, nn in (("gate", MFF, D), ("up", MFF, D), ("down", D, MFF)):
            w = _t2(rng, kk, nn)
            t_b[p + f"mlp.shared_experts.{nm}_proj.weight"] = w
            t_d[p + f"mlp.shared_experts.{nm}_proj.weight"] = w
    # trailing nextn (MTP) layer: must be ignored by conversion
    t_b[f"model.layers.{L}.mlp.gate.weight"] = np.zeros(
        (E, D), np.float32)
    t_b[f"model.layers.{L}.eh_proj.weight"] = np.zeros((D, 2 * D),
                                                       np.float32)
    base = {
        "vocab_size": V, "hidden_size": D, "num_hidden_layers": L,
        "num_attention_heads": H, "num_key_value_heads": KV,
        "intermediate_size": FF, "rms_norm_eps": 1e-5,
        "rope_theta": 10000.0, "max_position_embeddings": 64,
        "tie_word_embeddings": False, "head_dim": HD,
    }
    _write(tmp_path / "bl", {
        **base, "model_type": "bailing_moe_v2",
        "architectures": ["BailingMoeV2ForCausalLM"],
        "num_experts": E, "num_experts_per_tok": TOPK,
        "moe_intermediate_size": MFF, "num_shared_experts": 1,
        "moe_shared_expert_intermediate_size": MFF,
        "norm_topk_prob": True, "first_k_dense_replace": 1,
        "routed_scaling_factor": 1.5, "score_function": "sigmoid",
        "partial_rotary_factor": 0.5, "num_nextn_predict_layers": 1,
    }, t_b)
    _write(tmp_path / "dt", {
        **base, "model_type": "dots1",
        "architectures": ["Dots1ForCausalLM"],
        "n_routed_experts": E, "num_experts_per_tok": TOPK,
        "moe_intermediate_size": MFF, "n_shared_experts": 1,
        "norm_topk_prob": True, "first_k_dense_replace": 1,
        "routed_scaling_factor": 1.5,
    }, t_d)
    cfg_b = convert_hf(tmp_path / "bl", tmp_path / "out_b",
                       dtype_hp="float32")
    convert_hf(tmp_path / "dt", tmp_path / "out_d", dtype_hp="float32")
    assert cfg_b.moe_score == "sigmoid" and cfg_b.routed_scale == 1.5
    assert cfg_b.rope_pct == 0.5 and cfg_b.qk_norm
    assert cfg_b.first_k_dense == 1 and cfg_b.n_layers == L
    lb, _ = _logits(tmp_path / "out_b")
    ld, _ = _logits(tmp_path / "out_d", rope_pct=0.5)
    np.testing.assert_array_equal(lb, ld)


def test_phimoe_equals_mixtral_ln(tmp_path):
    """Phi-3.5-MoE == mixtral MoE on a LayerNorm body (the reference
    serves phimoe through llm_build_phi3<true> with plain softmax top-k
    renorm — src/models/phi3.cpp:109).  Zero-bias checkpoint so the
    rms-config twin (LN forced via cfg_replace) is weight-identical; the
    bias mechanisms themselves are HF-verified via starcoder2/gpt2."""
    rng = np.random.default_rng(31)
    E, TOPK, MFF = 4, 2, 32
    t = {"model.embed_tokens.weight":
         rng.standard_normal((V, D)).astype(np.float32) * 0.02,
         "model.norm.weight": _gain(rng, D),
         "lm_head.weight": _t2(rng, V, D)}
    for i in range(L):
        p = f"model.layers.{i}."
        t[p + "self_attn.q_proj.weight"] = _t2(rng, D, D)
        t[p + "self_attn.k_proj.weight"] = _t2(rng, KV * HD, D)
        t[p + "self_attn.v_proj.weight"] = _t2(rng, KV * HD, D)
        t[p + "self_attn.o_proj.weight"] = _t2(rng, D, D)
        t[p + "block_sparse_moe.gate.weight"] = rng.standard_normal(
            (E, D)).astype(np.float32) * 0.1
        for e in range(E):
            t[p + f"block_sparse_moe.experts.{e}.w1.weight"] = _t2(
                rng, MFF, D)
            t[p + f"block_sparse_moe.experts.{e}.w3.weight"] = _t2(
                rng, MFF, D)
            t[p + f"block_sparse_moe.experts.{e}.w2.weight"] = _t2(
                rng, D, MFF)
        t[p + "input_layernorm.weight"] = _gain(rng, D)
        t[p + "post_attention_layernorm.weight"] = _gain(rng, D)
    base = {
        "vocab_size": V, "hidden_size": D, "num_hidden_layers": L,
        "num_attention_heads": H, "num_key_value_heads": KV,
        "intermediate_size": MFF, "rms_norm_eps": 1e-5,
        "layer_norm_eps": 1e-5, "rope_theta": 10000.0,
        "max_position_embeddings": 64, "tie_word_embeddings": False,
        "num_local_experts": E, "num_experts_per_tok": TOPK,
    }
    _write(tmp_path / "pm", {
        **base, "model_type": "phimoe",
        "architectures": ["PhimoeForCausalLM"],
        "attention_bias": False,
    }, t)
    _write(tmp_path / "mx", {
        **base, "model_type": "mixtral",
        "architectures": ["MixtralForCausalLM"],
    }, t)
    cfg_p = convert_hf(tmp_path / "pm", tmp_path / "out_p",
                       dtype_hp="float32")
    convert_hf(tmp_path / "mx", tmp_path / "out_m", dtype_hp="float32")
    assert cfg_p.norm_type == "ln" and cfg_p.moe_norm_topk
    lp, _ = _logits(tmp_path / "out_p")
    lm, _ = _logits(tmp_path / "out_m", norm_type="ln")
    np.testing.assert_array_equal(lp, lm)


def test_phimoe_lm_head_bias(tmp_path):
    """phimoe lm_head.bias shifts the logits exactly (the final linear is
    the last op before the return)."""
    rng = np.random.default_rng(37)
    E, MFF = 2, 32
    t = {"model.embed_tokens.weight":
         rng.standard_normal((V, D)).astype(np.float32) * 0.02,
         "model.norm.weight": _gain(rng, D),
         "lm_head.weight": _t2(rng, V, D)}
    for i in range(L):
        p = f"model.layers.{i}."
        t[p + "self_attn.q_proj.weight"] = _t2(rng, D, D)
        t[p + "self_attn.k_proj.weight"] = _t2(rng, KV * HD, D)
        t[p + "self_attn.v_proj.weight"] = _t2(rng, KV * HD, D)
        t[p + "self_attn.o_proj.weight"] = _t2(rng, D, D)
        t[p + "block_sparse_moe.gate.weight"] = rng.standard_normal(
            (E, D)).astype(np.float32) * 0.1
        for e in range(E):
            t[p + f"block_sparse_moe.experts.{e}.w1.weight"] = _t2(
                rng, MFF, D)
            t[p + f"block_sparse_moe.experts.{e}.w3.weight"] = _t2(
                rng, MFF, D)
            t[p + f"block_sparse_moe.experts.{e}.w2.weight"] = _t2(
                rng, D, MFF)
        t[p + "input_layernorm.weight"] = _gain(rng, D)
        t[p + "post_attention_layernorm.weight"] = _gain(rng, D)
    cfgj = {
        "vocab_size": V, "hidden_size": D, "num_hidden_layers": L,
        "num_attention_heads": H, "num_key_value_heads": KV,
        "intermediate_size": MFF, "layer_norm_eps": 1e-5,
        "rope_theta": 10000.0, "max_position_embeddings": 64,
        "tie_word_embeddings": False, "model_type": "phimoe",
        "architectures": ["PhimoeForCausalLM"],
        "num_local_experts": E, "num_experts_per_tok": 2,
    }
    _write(tmp_path / "p0", cfgj, t)
    bias = rng.standard_normal(V).astype(np.float32) * 0.3
    _write(tmp_path / "p1", cfgj, {**t, "lm_head.bias": bias})
    convert_hf(tmp_path / "p0", tmp_path / "out0", dtype_hp="float32")
    convert_hf(tmp_path / "p1", tmp_path / "out1", dtype_hp="float32")
    l0, _ = _logits(tmp_path / "out0")
    l1, _ = _logits(tmp_path / "out1")
    np.testing.assert_allclose(l1, l0 + bias, rtol=1e-5, atol=1e-5)


def _grok_reference(tensors, toks, cfg):
    """Direct numpy transcription of the reference grok graph
    (src/models/grok.cpp + llama-graph.cpp:1479 softcap): scaled
    embeddings, sandwich RMS norms, softcap(qk * attn_output_multiplier),
    GELU(tanh) MoE with softmax top-2 renorm, scaled logits."""
    D_, H_, KV_, HD_ = cfg["hidden_size"], cfg["num_attention_heads"], \
        cfg["num_key_value_heads"], HD
    cap = cfg["max_attn_value"]
    eps = cfg["rms_norm_eps"]

    def rms(x, g):
        return x / np.sqrt((x * x).mean(-1, keepdims=True) + eps) * g

    def rope(x, pos):
        # half-split rotate_half rope, full head width
        hd = x.shape[-1]
        inv = 1.0 / (cfg["rope_theta"] ** (
            np.arange(0, hd, 2, dtype=np.float64) / hd))
        ang = pos[:, None] * inv[None, :]
        c, s = np.cos(ang), np.sin(ang)
        x1, x2 = x[..., : hd // 2], x[..., hd // 2:]
        return np.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], -1)

    def gelu(z):
        return 0.5 * z * (1.0 + np.tanh(
            0.7978845608028654 * (z + 0.044715 * z ** 3)))

    T = len(toks)
    pos = np.arange(T, dtype=np.float64)
    x = tensors["transformer.in_out_embed.weight"][toks].astype(
        np.float64) * cfg["embedding_multiplier_scale"]
    for i in range(cfg["num_hidden_layers"]):
        p = f"transformer.decoder_layer.{i}."
        h = rms(x, tensors[p + "rms_norm.weight"])
        q = (h @ tensors[p + "multi_head_attention.query.weight"].T
             ).reshape(T, H_, HD_)
        k = (h @ tensors[p + "multi_head_attention.key.weight"].T
             ).reshape(T, KV_, HD_)
        v = (h @ tensors[p + "multi_head_attention.value.weight"].T
             ).reshape(T, KV_, HD_)
        q = np.stack([rope(q[:, j], pos) for j in range(H_)], 1)
        k = np.stack([rope(k[:, j], pos) for j in range(KV_)], 1)
        rep = H_ // KV_
        k = np.repeat(k, rep, axis=1)
        vv = np.repeat(v, rep, axis=1)
        o = np.zeros((T, H_, HD_))
        mask = np.tril(np.ones((T, T), bool))
        for j in range(H_):
            sc = q[:, j] @ k[:, j].T * cfg["attn_output_multiplier"]
            sc = cap * np.tanh(sc / cap)
            sc = np.where(mask, sc, -np.inf)
            w = np.exp(sc - sc.max(-1, keepdims=True))
            w /= w.sum(-1, keepdims=True)
            o[:, j] = w @ vv[:, j]
        att = o.reshape(T, H_ * HD_) @ tensors[
            p + "multi_head_attention.linear.weight"].T
        att = rms(att, tensors[p + "rms_norm_1.weight"])
        x = x + att
        h2 = rms(x, tensors[p + "rms_norm_2.weight"])
        rl = h2 @ tensors[p + "router.weight"].T
        pr = np.exp(rl - rl.max(-1, keepdims=True))
        pr /= pr.sum(-1, keepdims=True)
        out = np.zeros_like(h2)
        for ti in range(T):
            top = np.argsort(-pr[ti])[:2]
            wts = pr[ti][top]
            wts = wts / wts.sum()
            for e, wt in zip(top, wts):
                pe = f"{p}moe.{e}."
                g = gelu(h2[ti] @ tensors[pe + "linear.weight"].T)
                u = h2[ti] @ tensors[pe + "linear_v.weight"].T
                out[ti] += wt * ((g * u) @ tensors[pe + "linear_1.weight"].T)
        out = rms(out, tensors[p + "rms_norm_3.weight"])
        x = x + out
    x = rms(x, tensors["transformer.rms_norm.weight"])
    return (x @ tensors["transformer.in_out_embed.weight"].T
            ) * cfg["output_multiplier_scale"]


def test_grok1_matches_reference_transcription(tmp_path):
    rng = np.random.default_rng(41)
    E, MFF = 4, 32
    t = {"transformer.in_out_embed.weight":
         rng.standard_normal((V, D)).astype(np.float32) * 0.05,
         "transformer.rms_norm.weight": _gain(rng, D)}
    for i in range(L):
        p = f"transformer.decoder_layer.{i}."
        t[p + "multi_head_attention.query.weight"] = _t2(rng, D, D) * 25
        t[p + "multi_head_attention.key.weight"] = _t2(rng, KV * HD, D) * 25
        t[p + "multi_head_attention.value.weight"] = _t2(rng, KV * HD, D)
        t[p + "multi_head_attention.linear.weight"] = _t2(rng, D, D)
        t[p + "router.weight"] = rng.standard_normal(
            (E, D)).astype(np.float32) * 0.1
        for e in range(E):
            t[p + f"moe.{e}.linear.weight"] = _t2(rng, MFF, D) * 10
            t[p + f"moe.{e}.linear_v.weight"] = _t2(rng, MFF, D)
            t[p + f"moe.{e}.linear_1.weight"] = _t2(rng, D, MFF)
        for nm in ("rms_norm", "rms_norm_1", "rms_norm_2", "rms_norm_3"):
            t[p + nm + ".weight"] = _gain(rng, D)
    cfgj = {
        "vocab_size": V, "hidden_size": D, "num_hidden_layers": L,
        "num_attention_heads": H, "num_key_value_heads": KV,
        "intermediate_size": MFF, "rms_norm_eps": 1e-5,
        "rope_theta": 10000.0, "max_position_embeddings": 64,
        "model_type": "grok-1", "architectures": ["Grok1ForCausalLM"],
        "tie_word_embeddings": True,
        "num_experts": E, "num_experts_per_tok": 2,
        "embedding_multiplier_scale": 78.38367176906169,
        "attn_output_multiplier": 0.08838834764831845,
        "output_multiplier_scale": 0.5773502691896257,
        "max_attn_value": 30.0,
    }
    _write(tmp_path / "gk", cfgj, t)
    cfg = convert_hf(tmp_path / "gk", tmp_path / "out", dtype_hp="float32")
    assert cfg.post_norms and cfg.act_fn == "gelu"
    assert cfg.attn_logit_softcap == 30.0
    assert abs(cfg.embed_scale - 78.38367176906169) < 1e-9
    toks = np.array([5, 17, 3, 42, 9])
    got, _ = _logits(tmp_path / "out", t=5, seed=0)
    # _logits draws its own tokens; recompute with the same draw
    rng2 = np.random.default_rng(0)
    toks = rng2.integers(0, V, (1, 5))[0]
    want = _grok_reference({k: v.astype(np.float64) for k, v in t.items()},
                           toks, cfgj)
    np.testing.assert_allclose(got[0], want, rtol=2e-3, atol=2e-3)


def _arctic_reference(tensors, toks, cfg):
    """Direct numpy transcription of the reference arctic graph
    (src/models/arctic.cpp): llama attention, then
    out = moe(rms(x_in, post_attn_ln)) + (ffn_inp + residual_mlp(
    rms(ffn_inp, residual_ln))); softmax top-2 renormalized MoE."""
    H_, KV_ = cfg["num_attention_heads"], cfg["num_key_value_heads"]
    HD_ = cfg["hidden_size"] // H_
    eps = cfg["rms_norm_eps"]

    def rms(x, g):
        return x / np.sqrt((x * x).mean(-1, keepdims=True) + eps) * g

    def rope(x, pos):
        hd = x.shape[-1]
        inv = 1.0 / (cfg["rope_theta"] ** (
            np.arange(0, hd, 2, dtype=np.float64) / hd))
        ang = pos[:, None] * inv[None, :]
        c, s = np.cos(ang), np.sin(ang)
        x1, x2 = x[..., : hd // 2], x[..., hd // 2:]
        return np.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], -1)

    def silu(z):
        return z / (1.0 + np.exp(-z))

    T = len(toks)
    pos = np.arange(T, dtype=np.float64)
    x = tensors["model.embed_tokens.weight"][toks].astype(np.float64)
    for i in range(cfg["num_hidden_layers"]):
        p = f"model.layers.{i}."
        x_in = x
        h = rms(x, tensors[p + "input_layernorm.weight"])
        q = (h @ tensors[p + "self_attn.q_proj.weight"].T
             ).reshape(T, H_, HD_)
        k = (h @ tensors[p + "self_attn.k_proj.weight"].T
             ).reshape(T, KV_, HD_)
        v = (h @ tensors[p + "self_attn.v_proj.weight"].T
             ).reshape(T, KV_, HD_)
        q = np.stack([rope(q[:, j], pos) for j in range(H_)], 1)
        k = np.stack([rope(k[:, j], pos) for j in range(KV_)], 1)
        rep = H_ // KV_
        k = np.repeat(k, rep, axis=1)
        vv = np.repeat(v, rep, axis=1)
        o = np.zeros((T, H_, HD_))
        mask = np.tril(np.ones((T, T), bool))
        for j in range(H_):
            sc = q[:, j] @ k[:, j].T / np.sqrt(HD_)
            sc = np.where(mask, sc, -np.inf)
            w = np.exp(sc - sc.max(-1, keepdims=True))
            w /= w.sum(-1, keepdims=True)
            o[:, j] = w @ vv[:, j]
        ffn_inp = x_in + o.reshape(T, -1) @ tensors[
            p + "self_attn.o_proj.weight"].T
        # residual_mlp on the ffn-normed input
        hr = rms(ffn_inp, tensors[p + "residual_layernorm.weight"])
        g = silu(hr @ tensors[p + "residual_mlp.w1.weight"].T)
        u = hr @ tensors[p + "residual_mlp.w3.weight"].T
        ffn_out = ffn_inp + (g * u) @ tensors[p + "residual_mlp.w2.weight"].T
        # MoE on a separate norm of the LAYER INPUT
        hm = rms(x_in, tensors[p + "post_attention_layernorm.weight"])
        rl = hm @ tensors[p + "block_sparse_moe.gate.weight"].T
        pr = np.exp(rl - rl.max(-1, keepdims=True))
        pr /= pr.sum(-1, keepdims=True)
        moe = np.zeros_like(hm)
        for ti in range(T):
            top = np.argsort(-pr[ti])[:2]
            wts = pr[ti][top]
            wts = wts / wts.sum()
            for e, wt in zip(top, wts):
                pe = f"{p}block_sparse_moe.experts.{e}."
                ge = silu(hm[ti] @ tensors[pe + "w1.weight"].T)
                ue = hm[ti] @ tensors[pe + "w3.weight"].T
                moe[ti] += wt * ((ge * ue) @ tensors[pe + "w2.weight"].T)
        x = moe + ffn_out
    x = rms(x, tensors["model.norm.weight"])
    return x @ tensors["lm_head.weight"].T


def test_arctic_matches_reference_transcription(tmp_path):
    rng = np.random.default_rng(47)
    E, MFF = 4, 32
    t = {"model.embed_tokens.weight":
         rng.standard_normal((V, D)).astype(np.float32) * 0.02,
         "model.norm.weight": _gain(rng, D),
         "lm_head.weight": _t2(rng, V, D)}
    for i in range(L):
        p = f"model.layers.{i}."
        t[p + "self_attn.q_proj.weight"] = _t2(rng, D, D)
        t[p + "self_attn.k_proj.weight"] = _t2(rng, KV * HD, D)
        t[p + "self_attn.v_proj.weight"] = _t2(rng, KV * HD, D)
        t[p + "self_attn.o_proj.weight"] = _t2(rng, D, D)
        t[p + "input_layernorm.weight"] = _gain(rng, D)
        t[p + "residual_layernorm.weight"] = _gain(rng, D)
        t[p + "post_attention_layernorm.weight"] = _gain(rng, D)
        # residual_mlp at d_model width (arctic ffn_gate {n_embd, n_embd})
        t[p + "residual_mlp.w1.weight"] = _t2(rng, D, D)
        t[p + "residual_mlp.w3.weight"] = _t2(rng, D, D)
        t[p + "residual_mlp.w2.weight"] = _t2(rng, D, D)
        t[p + "block_sparse_moe.gate.weight"] = rng.standard_normal(
            (E, D)).astype(np.float32) * 0.1
        for e in range(E):
            t[p + f"block_sparse_moe.experts.{e}.w1.weight"] = _t2(rng, MFF, D)
            t[p + f"block_sparse_moe.experts.{e}.w3.weight"] = _t2(rng, MFF, D)
            t[p + f"block_sparse_moe.experts.{e}.w2.weight"] = _t2(rng, D, MFF)
    cfgj = {
        "vocab_size": V, "hidden_size": D, "num_hidden_layers": L,
        "num_attention_heads": H, "num_key_value_heads": KV,
        "intermediate_size": MFF, "rms_norm_eps": 1e-5,
        "rope_theta": 10000.0, "max_position_embeddings": 64,
        "model_type": "arctic", "architectures": ["ArcticForCausalLM"],
        "tie_word_embeddings": False,
        "num_local_experts": E, "num_experts_per_tok": 2,
    }
    _write(tmp_path / "ar", cfgj, t)
    cfg = convert_hf(tmp_path / "ar", tmp_path / "out", dtype_hp="float32")
    assert cfg.moe_parallel == "arctic" and cfg.moe_norm_topk
    assert cfg.d_ff_dense == D
    got, _ = _logits(tmp_path / "out", t=5, seed=0)
    rng2 = np.random.default_rng(0)
    toks = rng2.integers(0, V, (1, 5))[0]
    want = _arctic_reference(
        {k: v.astype(np.float64) for k, v in t.items()}, toks, cfgj)
    np.testing.assert_allclose(got[0], want, rtol=2e-3, atol=2e-3)


def _grove_tensors(rng, E, ECH, MFF, CFF, zero_chunk_down=False,
                   zero_attn=False):
    t = {"model.embed_tokens.weight":
         rng.standard_normal((V, D)).astype(np.float32) * 0.05,
         "model.norm.weight": _gain(rng, D),
         "lm_head.weight": _t2(rng, V, D)}
    for i in range(L):
        p = f"model.layers.{i}."
        za = 0.0 if zero_attn else 1.0
        t[p + "self_attn.q_proj.weight"] = _t2(rng, D, D) * za
        t[p + "self_attn.k_proj.weight"] = _t2(rng, KV * HD, D) * za
        t[p + "self_attn.v_proj.weight"] = _t2(rng, KV * HD, D) * za
        t[p + "self_attn.o_proj.weight"] = _t2(rng, D, D) * za
        t[p + "self_attn.q_norm.weight"] = _gain(rng, HD)
        t[p + "self_attn.k_norm.weight"] = _gain(rng, HD)
        t[p + "input_layernorm.weight"] = _gain(rng, D)
        t[p + "post_attention_layernorm.weight"] = _gain(rng, D)
        t[p + "mlp.gate.weight"] = rng.standard_normal(
            (E, D)).astype(np.float32) * 0.1
        for e in range(E):
            t[p + f"mlp.experts.{e}.gate_proj.weight"] = _t2(rng, MFF, D)
            t[p + f"mlp.experts.{e}.up_proj.weight"] = _t2(rng, MFF, D)
            t[p + f"mlp.experts.{e}.down_proj.weight"] = _t2(rng, D, MFF)
        for e in range(ECH):
            t[p + f"mlp.chunk_experts.{e}.gate_proj.weight"] = _t2(
                rng, CFF, D)
            t[p + f"mlp.chunk_experts.{e}.up_proj.weight"] = _t2(rng, CFF, D)
            t[p + f"mlp.chunk_experts.{e}.down_proj.weight"] = _t2(
                rng, D, CFF) * (0.0 if zero_chunk_down else 1.0)
    return t


def _grove_cfg(E, TOPK, MFF, CFF):
    return {
        "vocab_size": V, "hidden_size": D, "num_hidden_layers": L,
        "num_attention_heads": H, "num_key_value_heads": KV,
        "intermediate_size": FF, "rms_norm_eps": 1e-5,
        "rope_theta": 10000.0, "max_position_embeddings": 64,
        "model_type": "grovemoe", "architectures": ["GroveMoeForCausalLM"],
        "tie_word_embeddings": False, "num_experts": E,
        "num_experts_per_tok": TOPK, "moe_intermediate_size": MFF,
        "moe_chunk_intermediate_size": CFF, "head_dim": HD,
    }


def test_grovemoe_zero_chunk_equals_qwen3_moe(tmp_path):
    """With chunk-expert down projections zeroed the adjugate branch
    vanishes and grovemoe must equal qwen3-moe exactly (the main branch
    IS build_moe_ffn softmax+renorm on a qk-norm body)."""
    rng = np.random.default_rng(53)
    E, TOPK, MFF, CFF = 4, 2, 32, 32
    t = _grove_tensors(rng, E, E // 2, MFF, CFF, zero_chunk_down=True)
    _write(tmp_path / "gv", _grove_cfg(E, TOPK, MFF, CFF), t)
    tq = {k: v for k, v in t.items() if "chunk_experts" not in k}
    _write(tmp_path / "q3", {
        **_grove_cfg(E, TOPK, MFF, CFF), "model_type": "qwen3_moe",
        "architectures": ["Qwen3MoeForCausalLM"], "norm_topk_prob": True,
        "head_dim": HD,
    }, tq)
    cfg_g = convert_hf(tmp_path / "gv", tmp_path / "out_g",
                       dtype_hp="float32")
    convert_hf(tmp_path / "q3", tmp_path / "out_q", dtype_hp="float32")
    assert cfg_g.moe_chunk_experts == E // 2 and cfg_g.d_ff_chunk == CFF
    assert cfg_g.qk_norm and cfg_g.moe_norm_topk
    lg, _ = _logits(tmp_path / "out_g")
    lq, _ = _logits(tmp_path / "out_q")
    np.testing.assert_array_equal(lg, lq)


def test_grovemoe_chunk_matches_reference_transcription(tmp_path):
    """Full adjugate semantics vs a direct numpy transcription of
    build_moe_ffn's GROVEMOE branches (attention zeroed so the layer is
    pure FFN): selection over the shared logits, expert id // group,
    combine weight = softmax probs at the CHUNK id, top-k renorm, output
    added to the routed output scaled by expert_group_scale."""
    rng = np.random.default_rng(59)
    E, TOPK, MFF, CFF = 4, 2, 32, 32
    GRP = 2
    t = _grove_tensors(rng, E, E // GRP, MFF, CFF, zero_attn=True)
    _write(tmp_path / "gv", _grove_cfg(E, TOPK, MFF, CFF), t)
    convert_hf(tmp_path / "gv", tmp_path / "out", dtype_hp="float32")
    got, _ = _logits(tmp_path / "out", t=5, seed=0)

    rng2 = np.random.default_rng(0)
    toks = rng2.integers(0, V, (1, 5))[0]
    eps = 1e-5

    def rms(x, g):
        return x / np.sqrt((x * x).mean(-1, keepdims=True) + eps) * g

    def silu(z):
        return z / (1.0 + np.exp(-z))

    td = {k: v.astype(np.float64) for k, v in t.items()}
    x = td["model.embed_tokens.weight"][toks]
    for i in range(L):
        p = f"model.layers.{i}."
        # attention weights are zero -> attn out is exactly 0
        h = rms(x, td[p + "post_attention_layernorm.weight"])
        rl = h @ td[p + "mlp.gate.weight"].T
        pr = np.exp(rl - rl.max(-1, keepdims=True))
        pr /= pr.sum(-1, keepdims=True)
        moe = np.zeros_like(h)
        for ti in range(len(toks)):
            top = np.argsort(-pr[ti])[:TOPK]
            wts = pr[ti][top] / pr[ti][top].sum()
            for e, wt in zip(top, wts):
                pe = f"{p}mlp.experts.{e}."
                g = silu(h[ti] @ td[pe + "gate_proj.weight"].T)
                u = h[ti] @ td[pe + "up_proj.weight"].T
                moe[ti] += wt * ((g * u) @ td[pe + "down_proj.weight"].T)
            # adjugate chunk pass on the routed output
            ch_ids = top // GRP
            wch = pr[ti][ch_ids]
            wch = wch / wch.sum()
            adj = np.zeros(D)
            for cid, wt in zip(ch_ids, wch):
                pc = f"{p}mlp.chunk_experts.{cid}."
                g = silu(moe[ti] @ td[pc + "gate_proj.weight"].T)
                u = moe[ti] @ td[pc + "up_proj.weight"].T
                adj += wt * ((g * u) @ td[pc + "down_proj.weight"].T)
            moe[ti] = moe[ti] + 0.05 * adj
        x = x + moe
    x = rms(x, td["model.norm.weight"])
    want = x @ td["lm_head.weight"].T
    np.testing.assert_allclose(got[0], want, rtol=2e-3, atol=2e-3)

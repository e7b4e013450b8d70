"""Converter coverage, wave 2: chatglm, codeshell, refact, plamo, plm,
llada-moe — archs without an installed HF implementation.

Strategy (same as test_archs_clones.py): each arch is an exact re-naming /
re-fusion / re-combination of semantics that ARE HF-logit-verified
elsewhere.  Build the SAME logical weights under the clone's HF names and
under an already-verified arch's names, convert both, assert identical
logits (forcing the clone-only config flags on the twin where the twin's
own config cannot express them).  Reference analogs:
src/models/{chatglm,codeshell,refact,plamo,plm,llada-moe}.cpp.
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


# ---------------------------------------------------------------------------
# chatglm: fused qkv (+bias) and fused [gate|up] MLP on a qwen2-verified
# body with glm4-verified half-width interleaved rope
# ---------------------------------------------------------------------------

def test_chatglm_equals_qwen2_with_glm_rope(tmp_path):
    # interleaved rope requires an unpadded head dim -> hd = 128
    D, H, KV, HD = 256, 2, 1, 128
    rng = np.random.default_rng(0)
    q = [_t2(rng, D, D) for _ in range(L)]
    k = [_t2(rng, KV * HD, D) for _ in range(L)]
    v = [_t2(rng, KV * HD, D) for _ in range(L)]
    o = [_t2(rng, D, D) for _ in range(L)]
    g = [_t2(rng, FF, D) for _ in range(L)]
    u = [_t2(rng, FF, D) for _ in range(L)]
    dwn = [_t2(rng, D, FF) for _ in range(L)]
    bq = [rng.standard_normal(D).astype(np.float32) * 0.1 for _ in range(L)]
    bk = [rng.standard_normal(KV * HD).astype(np.float32) * 0.1
          for _ in range(L)]
    bv = [rng.standard_normal(KV * HD).astype(np.float32) * 0.1
          for _ in range(L)]
    an = [_gain(rng, D) for _ in range(L)]
    fn = [_gain(rng, D) for _ in range(L)]
    embed = rng.standard_normal((V, D)).astype(np.float32) * 0.02
    final = _gain(rng, D)
    head = _t2(rng, V, D)

    qt = {"model.embed_tokens.weight": embed, "model.norm.weight": final,
          "lm_head.weight": head}
    ct = {"transformer.embedding.word_embeddings.weight": embed,
          "transformer.encoder.final_layernorm.weight": final,
          "transformer.output_layer.weight": head,
          "transformer.rotary_pos_emb.inv_freq":
              np.ones(HD // 4, np.float32)}
    for i in range(L):
        p = f"model.layers.{i}."
        qt[p + "self_attn.q_proj.weight"] = q[i]
        qt[p + "self_attn.q_proj.bias"] = bq[i]
        qt[p + "self_attn.k_proj.weight"] = k[i]
        qt[p + "self_attn.k_proj.bias"] = bk[i]
        qt[p + "self_attn.v_proj.weight"] = v[i]
        qt[p + "self_attn.v_proj.bias"] = bv[i]
        qt[p + "self_attn.o_proj.weight"] = o[i]
        qt[p + "mlp.gate_proj.weight"] = g[i]
        qt[p + "mlp.up_proj.weight"] = u[i]
        qt[p + "mlp.down_proj.weight"] = dwn[i]
        qt[p + "input_layernorm.weight"] = an[i]
        qt[p + "post_attention_layernorm.weight"] = fn[i]
        c = f"transformer.encoder.layers.{i}."
        ct[c + "self_attention.query_key_value.weight"] = np.concatenate(
            [q[i], k[i], v[i]], axis=0)
        ct[c + "self_attention.query_key_value.bias"] = np.concatenate(
            [bq[i], bk[i], bv[i]])
        ct[c + "self_attention.dense.weight"] = o[i]
        ct[c + "mlp.dense_h_to_4h.weight"] = np.concatenate(
            [g[i], u[i]], axis=0)
        ct[c + "mlp.dense_4h_to_h.weight"] = dwn[i]
        ct[c + "input_layernorm.weight"] = an[i]
        ct[c + "post_attention_layernorm.weight"] = fn[i]

    _write(tmp_path / "qwen2", {
        "model_type": "qwen2", "architectures": ["Qwen2ForCausalLM"],
        "vocab_size": V, "hidden_size": D, "num_hidden_layers": L,
        "num_attention_heads": H, "num_key_value_heads": KV,
        "intermediate_size": FF, "rms_norm_eps": 1e-5,
        "rope_theta": 10000.0, "max_position_embeddings": 64,
        "tie_word_embeddings": False,
    }, qt)
    _write(tmp_path / "glm", {
        "model_type": "chatglm", "architectures": ["ChatGLMModel"],
        "padded_vocab_size": V, "hidden_size": D, "num_layers": L,
        "num_attention_heads": H, "multi_query_attention": True,
        "multi_query_group_num": KV, "ffn_hidden_size": FF,
        "layernorm_epsilon": 1e-5, "rope_ratio": 1.0, "seq_length": 64,
        "add_qkv_bias": True,
    }, ct)
    convert_hf(tmp_path / "qwen2", tmp_path / "out_q", dtype_hp="float32")
    cfg_c = convert_hf(tmp_path / "glm", tmp_path / "out_c",
                       dtype_hp="float32")
    assert cfg_c.rope_pct == 0.5 and cfg_c.rope_interleaved
    assert cfg_c.qkv_bias and cfg_c.d_ff == FF
    # force the glm rope scheme onto the qwen2 twin at forward time
    lq, _ = _logits(tmp_path / "out_q", rope_pct=0.5, rope_interleaved=True)
    lc, _ = _logits(tmp_path / "out_c")
    np.testing.assert_array_equal(lq, lc)


# ---------------------------------------------------------------------------
# codeshell: starcoder2 body (LN+bias, ungated gelu, NEOX rope) with
# gpt_bigcode-style fused MQA qkv under transformer.h names
# ---------------------------------------------------------------------------

def test_codeshell_equals_starcoder2(tmp_path):
    rng = np.random.default_rng(1)
    kv1 = 1
    q = [_t2(rng, D, D) for _ in range(L)]
    k = [_t2(rng, kv1 * HD, D) for _ in range(L)]
    v = [_t2(rng, kv1 * HD, D) for _ in range(L)]
    o = [_t2(rng, D, D) for _ in range(L)]
    u = [_t2(rng, FF, D) for _ in range(L)]
    dwn = [_t2(rng, D, FF) for _ in range(L)]
    bias = {n: rng.standard_normal(s).astype(np.float32) * 0.1
            for n, s in [("bq", (L, D)), ("bk", (L, kv1 * HD)),
                         ("bv", (L, kv1 * HD)), ("bo", (L, D)),
                         ("bu", (L, FF)), ("bd", (L, D))]}
    an = [_gain(rng, D) for _ in range(L)]
    anb = [rng.standard_normal(D).astype(np.float32) * 0.1 for _ in range(L)]
    fn = [_gain(rng, D) for _ in range(L)]
    fnb = [rng.standard_normal(D).astype(np.float32) * 0.1 for _ in range(L)]
    embed = rng.standard_normal((V, D)).astype(np.float32) * 0.02
    final, finalb = _gain(rng, D), rng.standard_normal(
        D).astype(np.float32) * 0.1
    head = _t2(rng, V, D)

    st = {"model.embed_tokens.weight": embed, "model.norm.weight": final,
          "model.norm.bias": finalb, "lm_head.weight": head}
    cs = {"transformer.wte.weight": embed, "transformer.ln_f.weight": final,
          "transformer.ln_f.bias": finalb, "lm_head.weight": head}
    for i in range(L):
        p = f"model.layers.{i}."
        st[p + "self_attn.q_proj.weight"] = q[i]
        st[p + "self_attn.q_proj.bias"] = bias["bq"][i]
        st[p + "self_attn.k_proj.weight"] = k[i]
        st[p + "self_attn.k_proj.bias"] = bias["bk"][i]
        st[p + "self_attn.v_proj.weight"] = v[i]
        st[p + "self_attn.v_proj.bias"] = bias["bv"][i]
        st[p + "self_attn.o_proj.weight"] = o[i]
        st[p + "self_attn.o_proj.bias"] = bias["bo"][i]
        st[p + "mlp.c_fc.weight"] = u[i]
        st[p + "mlp.c_fc.bias"] = bias["bu"][i]
        st[p + "mlp.c_proj.weight"] = dwn[i]
        st[p + "mlp.c_proj.bias"] = bias["bd"][i]
        st[p + "input_layernorm.weight"] = an[i]
        st[p + "input_layernorm.bias"] = anb[i]
        st[p + "post_attention_layernorm.weight"] = fn[i]
        st[p + "post_attention_layernorm.bias"] = fnb[i]
        c = f"transformer.h.{i}."
        cs[c + "attn.c_attn.weight"] = np.concatenate(
            [q[i], k[i], v[i]], axis=0)
        cs[c + "attn.c_attn.bias"] = np.concatenate(
            [bias["bq"][i], bias["bk"][i], bias["bv"][i]])
        cs[c + "attn.c_proj.weight"] = o[i]
        cs[c + "attn.c_proj.bias"] = bias["bo"][i]
        cs[c + "mlp.c_fc.weight"] = u[i]
        cs[c + "mlp.c_fc.bias"] = bias["bu"][i]
        cs[c + "mlp.c_proj.weight"] = dwn[i]
        cs[c + "mlp.c_proj.bias"] = bias["bd"][i]
        cs[c + "ln_1.weight"] = an[i]
        cs[c + "ln_1.bias"] = anb[i]
        cs[c + "ln_2.weight"] = fn[i]
        cs[c + "ln_2.bias"] = fnb[i]

    _write(tmp_path / "sc2", {
        "model_type": "starcoder2",
        "architectures": ["Starcoder2ForCausalLM"],
        "vocab_size": V, "hidden_size": D, "num_hidden_layers": L,
        "num_attention_heads": H, "num_key_value_heads": kv1,
        "intermediate_size": FF, "norm_epsilon": 1e-5,
        "rope_theta": 10000.0, "max_position_embeddings": 64,
        "tie_word_embeddings": False,
    }, st)
    _write(tmp_path / "cs", {
        "model_type": "codeshell", "architectures": ["CodeShellForCausalLM"],
        "vocab_size": V, "n_embd": D, "n_layer": L, "n_head": H,
        "num_query_groups": kv1, "n_inner": FF,
        "layer_norm_epsilon": 1e-5, "rope_theta": 10000.0,
        "n_positions": 64, "tie_word_embeddings": False,
    }, cs)
    convert_hf(tmp_path / "sc2", tmp_path / "out_s", dtype_hp="float32")
    cfg_c = convert_hf(tmp_path / "cs", tmp_path / "out_c",
                       dtype_hp="float32")
    assert cfg_c.norm_type == "ln" and not cfg_c.ffn_gated
    ls, _ = _logits(tmp_path / "out_s")
    lc, _ = _logits(tmp_path / "out_c")
    np.testing.assert_array_equal(ls, lc)


# ---------------------------------------------------------------------------
# refact: llama rms body + MQA fused kv + fused gate_up at the derived
# llama FFN width + ALiBi (bloom-verified scoring, forced on the twin)
# ---------------------------------------------------------------------------

def test_refact_equals_llama_alibi(tmp_path):
    rng = np.random.default_rng(2)
    ffr = 256 * ((int(2 * 4 * D / 3) + 255) // 256)  # derived width
    kv1 = 1
    q = [_t2(rng, D, D) for _ in range(L)]
    k = [_t2(rng, kv1 * HD, D) for _ in range(L)]
    v = [_t2(rng, kv1 * HD, D) for _ in range(L)]
    o = [_t2(rng, D, D) for _ in range(L)]
    g = [_t2(rng, ffr, D) for _ in range(L)]
    u = [_t2(rng, ffr, D) for _ in range(L)]
    dwn = [_t2(rng, D, ffr) for _ in range(L)]
    an = [_gain(rng, D) for _ in range(L)]
    fn = [_gain(rng, D) for _ in range(L)]
    embed = rng.standard_normal((V, D)).astype(np.float32) * 0.02
    final = _gain(rng, D)
    head = _t2(rng, V, D)

    lt = {"model.embed_tokens.weight": embed, "model.norm.weight": final,
          "lm_head.weight": head}
    rt = {"transformer.wte.weight": embed, "transformer.ln_f.weight": final,
          "lm_head.weight": head}
    for i in range(L):
        p = f"model.layers.{i}."
        lt[p + "self_attn.q_proj.weight"] = q[i]
        lt[p + "self_attn.k_proj.weight"] = k[i]
        lt[p + "self_attn.v_proj.weight"] = v[i]
        lt[p + "self_attn.o_proj.weight"] = o[i]
        lt[p + "mlp.gate_proj.weight"] = g[i]
        lt[p + "mlp.up_proj.weight"] = u[i]
        lt[p + "mlp.down_proj.weight"] = dwn[i]
        lt[p + "input_layernorm.weight"] = an[i]
        lt[p + "post_attention_layernorm.weight"] = fn[i]
        c = f"transformer.h.{i}."
        rt[c + "attn.q.weight"] = q[i]
        rt[c + "attn.kv.weight"] = np.concatenate([k[i], v[i]], axis=0)
        rt[c + "attn.c_proj.weight"] = o[i]
        rt[c + "mlp.gate_up_proj.weight"] = np.concatenate(
            [g[i], u[i]], axis=0)
        rt[c + "mlp.linear_3.weight"] = dwn[i]
        rt[c + "ln_1.weight"] = an[i]
        rt[c + "ln_2.weight"] = fn[i]

    _write(tmp_path / "llama", {
        "model_type": "llama", "architectures": ["LlamaForCausalLM"],
        "vocab_size": V, "hidden_size": D, "num_hidden_layers": L,
        "num_attention_heads": H, "num_key_value_heads": kv1,
        "intermediate_size": ffr, "rms_norm_eps": 1e-5,
        "rope_theta": 10000.0, "max_position_embeddings": 64,
        "tie_word_embeddings": False,
    }, lt)
    _write(tmp_path / "rf", {
        "model_type": "refact", "architectures": ["GPTRefactForCausalLM"],
        "vocab_size": V, "n_embd": D, "n_layer": L, "n_head": H,
        "layer_norm_epsilon": 1e-5, "n_positions": 64,
        "tie_word_embeddings": False,
    }, rt)
    convert_hf(tmp_path / "llama", tmp_path / "out_l", dtype_hp="float32")
    cfg_r = convert_hf(tmp_path / "rf", tmp_path / "out_r",
                       dtype_hp="float32")
    assert cfg_r.pos_embed == "alibi" and cfg_r.d_ff == ffr
    assert cfg_r.n_kv_heads == 1
    ll, _ = _logits(tmp_path / "out_l", pos_embed="alibi")
    lr, _ = _logits(tmp_path / "out_r")
    np.testing.assert_array_equal(ll, lr)


# ---------------------------------------------------------------------------
# plamo: single-norm parallel residual (phi-2/cohere-verified semantics);
# the q/o head shuffle is verified by GQA-vs-expanded-MHA equivalence —
# both checkpoints encode the same function iff the converter's head
# reordering (reference convert PlamoModel.shuffle_attn_q_weight) and the
# forward's h // (H/KV) kv mapping compose correctly
# ---------------------------------------------------------------------------

def test_plamo_gqa_shuffle_equals_expanded_mha(tmp_path):
    rng = np.random.default_rng(4)
    G = H // KV
    # per-head q blocks in HF plamo order: flat head f = (g, s), kv = s
    qh = [[_t2(rng, HD, D) for _ in range(H)] for _ in range(L)]
    kh = [[_t2(rng, HD, D) for _ in range(KV)] for _ in range(L)]
    vh = [[_t2(rng, HD, D) for _ in range(KV)] for _ in range(L)]
    # o columns per flat HF head
    oh = [[_t2(rng, D, HD) for _ in range(H)] for _ in range(L)]
    g_ = [_t2(rng, FF, D) for _ in range(L)]
    u_ = [_t2(rng, FF, D) for _ in range(L)]
    d_ = [_t2(rng, D, FF) for _ in range(L)]
    an = [_gain(rng, D) for _ in range(L)]
    embed = rng.standard_normal((V, D)).astype(np.float32) * 0.02
    final = _gain(rng, D)
    head = _t2(rng, V, D)

    def tensors(expand_mha: bool):
        t = {"model.embed_tokens.weight": embed,
             "model.norm.weight": final, "lm_head.weight": head}
        for i in range(L):
            p = f"model.layers.layers.{i}."
            if expand_mha:
                # MHA twin: every flat head f gets its own kv row, chosen
                # as HF plamo maps it (kv = f % KV); with KV == H the
                # converter's shuffle is the identity
                t[p + "self_attn.q_proj.weight"] = np.concatenate(
                    qh[i], axis=0)
                t[p + "self_attn.k_proj.weight"] = np.concatenate(
                    [kh[i][f % KV] for f in range(H)], axis=0)
                t[p + "self_attn.v_proj.weight"] = np.concatenate(
                    [vh[i][f % KV] for f in range(H)], axis=0)
            else:
                t[p + "self_attn.q_proj.weight"] = np.concatenate(
                    qh[i], axis=0)
                t[p + "self_attn.k_proj.weight"] = np.concatenate(
                    kh[i], axis=0)
                t[p + "self_attn.v_proj.weight"] = np.concatenate(
                    vh[i], axis=0)
            t[p + "self_attn.o_proj.weight"] = np.concatenate(
                oh[i], axis=1)
            t[p + "mlp.gate_proj.weight"] = g_[i]
            t[p + "mlp.up_proj.weight"] = u_[i]
            t[p + "mlp.down_proj.weight"] = d_[i]
            t[p + "norm.weight"] = an[i]
        return t

    base_cfg = {
        "model_type": "plamo", "architectures": ["PlamoForCausalLM"],
        "vocab_size": V, "hidden_size": D, "num_hidden_layers": L,
        "num_attention_heads": H, "intermediate_size": FF,
        "rms_norm_eps": 1e-5, "rope_theta": 10000.0,
        "max_position_embeddings": 64, "tie_word_embeddings": False,
    }
    _write(tmp_path / "gqa", {**base_cfg, "num_key_value_heads": KV},
           tensors(False))
    _write(tmp_path / "mha", {**base_cfg, "num_key_value_heads": H},
           tensors(True))
    cfg_g = convert_hf(tmp_path / "gqa", tmp_path / "out_g",
                       dtype_hp="float32")
    convert_hf(tmp_path / "mha", tmp_path / "out_m", dtype_hp="float32")
    assert cfg_g.parallel_residual
    lg, _ = _logits(tmp_path / "out_g")
    lm, _ = _logits(tmp_path / "out_m")
    np.testing.assert_allclose(lg, lm, atol=2e-5, rtol=1e-5)


# ---------------------------------------------------------------------------
# plm: deepseek-V2 MLA attention (verified vs HF DeepseekV2) + arcee's
# ungated relu^2 MLP (verified vs HF).  Two zero-out twins isolate each
# path: w_down = 0 makes the FFN a no-op in both archs (attention twin);
# o_proj = 0 makes attention a no-op (FFN twin).
# ---------------------------------------------------------------------------

_PLM = dict(D=256, H=4, NOPE=128, ROPE=64, VHD=128, KVL=256, FFP=64)


def _plm_like_tensors(rng, mt, zero_down=False, zero_o=False):
    P = _PLM
    D_, H_ = P["D"], P["H"]
    qd = H_ * (P["NOPE"] + P["ROPE"])
    t = {"model.embed_tokens.weight":
         rng.standard_normal((V, D_)).astype(np.float32) * 0.02,
         "model.norm.weight": _gain(rng, D_)}
    for i in range(L):
        p = f"model.layers.{i}."
        t[p + "self_attn.q_proj.weight"] = _t2(rng, qd, D_)
        t[p + "self_attn.kv_a_proj_with_mqa.weight"] = _t2(
            rng, P["KVL"] + P["ROPE"], D_)
        t[p + "self_attn.kv_a_layernorm.weight"] = _gain(rng, P["KVL"])
        t[p + "self_attn.kv_b_proj.weight"] = _t2(
            rng, H_ * (P["NOPE"] + P["VHD"]), P["KVL"])
        ow = _t2(rng, D_, H_ * P["VHD"])
        t[p + "self_attn.o_proj.weight"] = np.zeros_like(ow) if zero_o else ow
        dw = _t2(rng, D_, P["FFP"])
        t[p + "mlp.up_proj.weight"] = _t2(rng, P["FFP"], D_)
        t[p + "mlp.down_proj.weight"] = (np.zeros_like(dw) if zero_down
                                         else dw)
        # draw unconditionally so both checkpoints share the rng stream
        gate = _t2(rng, P["FFP"], D_)
        if mt == "deepseek_v2":
            t[p + "mlp.gate_proj.weight"] = gate
        t[p + "input_layernorm.weight"] = _gain(rng, D_)
        t[p + "post_attention_layernorm.weight"] = _gain(rng, D_)
    return t


def _plm_cfg(mt):
    P = _PLM
    c = {
        "model_type": mt, "vocab_size": V, "hidden_size": P["D"],
        "num_hidden_layers": L, "num_attention_heads": P["H"],
        "num_key_value_heads": P["H"], "intermediate_size": P["FFP"],
        "rms_norm_eps": 1e-5, "rope_theta": 10000.0,
        "max_position_embeddings": 64, "tie_word_embeddings": True,
        "kv_lora_rank": P["KVL"], "qk_nope_head_dim": P["NOPE"],
        "qk_rope_head_dim": P["ROPE"], "v_head_dim": P["VHD"],
        "q_lora_rank": None,
    }
    c["architectures"] = ["PLMForCausalLM" if mt == "plm"
                          else "DeepseekV2ForCausalLM"]
    return c


def test_plm_attention_equals_deepseek_mla(tmp_path):
    rng = np.random.default_rng(5)
    tens = _plm_like_tensors(rng, "plm", zero_down=True)
    _write(tmp_path / "plm", _plm_cfg("plm"), tens)
    dt = _plm_like_tensors(np.random.default_rng(5), "deepseek_v2",
                           zero_down=True)
    _write(tmp_path / "ds", _plm_cfg("deepseek_v2"), dt)
    cfg_p = convert_hf(tmp_path / "plm", tmp_path / "out_p",
                       dtype_hp="float32")
    convert_hf(tmp_path / "ds", tmp_path / "out_d", dtype_hp="float32")
    assert cfg_p.kv_lora_rank == _PLM["KVL"] and not cfg_p.ffn_gated
    assert cfg_p.act_fn == "relu2"
    lp, _ = _logits(tmp_path / "out_p")
    ld, _ = _logits(tmp_path / "out_d")
    np.testing.assert_array_equal(lp, ld)


def test_plm_ffn_equals_arcee_relu2(tmp_path):
    P = _PLM
    rng = np.random.default_rng(6)
    tens = _plm_like_tensors(rng, "plm", zero_o=True)
    _write(tmp_path / "plm", _plm_cfg("plm"), tens)
    # arcee twin: same embed/norms/FFN, attention silenced via o_proj = 0
    at = {k: v for k, v in tens.items()
          if not any(s in k for s in (
              "kv_a_proj", "kv_a_layernorm", "kv_b_proj", "q_proj",
              "o_proj"))}
    for i in range(L):
        p = f"model.layers.{i}."
        at[p + "self_attn.q_proj.weight"] = _t2(rng, P["D"], P["D"])
        at[p + "self_attn.k_proj.weight"] = _t2(rng, P["D"], P["D"])
        at[p + "self_attn.v_proj.weight"] = _t2(rng, P["D"], P["D"])
        at[p + "self_attn.o_proj.weight"] = np.zeros(
            (P["D"], P["D"]), np.float32)
    _write(tmp_path / "ar", {
        "model_type": "arcee", "architectures": ["ArceeForCausalLM"],
        "vocab_size": V, "hidden_size": P["D"], "num_hidden_layers": L,
        "num_attention_heads": P["H"], "num_key_value_heads": P["H"],
        "intermediate_size": P["FFP"], "rms_norm_eps": 1e-5,
        "rope_theta": 10000.0, "max_position_embeddings": 64,
        "tie_word_embeddings": True,
    }, at)
    convert_hf(tmp_path / "plm", tmp_path / "out_p", dtype_hp="float32")
    convert_hf(tmp_path / "ar", tmp_path / "out_a", dtype_hp="float32")
    lp, _ = _logits(tmp_path / "out_p")
    la, _ = _logits(tmp_path / "out_a")
    np.testing.assert_array_equal(lp, la)


# ---------------------------------------------------------------------------
# llada-moe: qwen3-moe body (per-head qk-norm, no-renorm softmax MoE) with
# bidirectional attention forced on the twin
# ---------------------------------------------------------------------------

def test_llada_moe_equals_qwen3_moe_bidirectional(tmp_path):
    rng = np.random.default_rng(7)
    E, TOPK, MFF = 4, 2, 32
    t = {"model.embed_tokens.weight":
         rng.standard_normal((V, D)).astype(np.float32) * 0.02,
         "model.norm.weight": _gain(rng, D), "lm_head.weight": _t2(rng, V, D)}
    for i in range(L):
        p = f"model.layers.{i}."
        t[p + "self_attn.q_proj.weight"] = _t2(rng, D, D)
        t[p + "self_attn.k_proj.weight"] = _t2(rng, KV * HD, D)
        t[p + "self_attn.v_proj.weight"] = _t2(rng, KV * HD, D)
        t[p + "self_attn.o_proj.weight"] = _t2(rng, D, D)
        t[p + "self_attn.q_norm.weight"] = _gain(rng, HD)
        t[p + "self_attn.k_norm.weight"] = _gain(rng, HD)
        t[p + "mlp.gate.weight"] = rng.standard_normal(
            (E, D)).astype(np.float32) * 0.1
        for e in range(E):
            t[p + f"mlp.experts.{e}.gate_proj.weight"] = _t2(rng, MFF, D)
            t[p + f"mlp.experts.{e}.up_proj.weight"] = _t2(rng, MFF, D)
            t[p + f"mlp.experts.{e}.down_proj.weight"] = _t2(rng, D, MFF)
        t[p + "input_layernorm.weight"] = _gain(rng, D)
        t[p + "post_attention_layernorm.weight"] = _gain(rng, D)
    base = {
        "vocab_size": V, "hidden_size": D, "num_hidden_layers": L,
        "num_attention_heads": H, "num_key_value_heads": KV,
        "intermediate_size": FF, "rms_norm_eps": 1e-5,
        "rope_theta": 10000.0, "max_position_embeddings": 64,
        "tie_word_embeddings": False, "num_experts": E,
        "num_experts_per_tok": TOPK, "head_dim": HD,
    }
    _write(tmp_path / "q3", {
        **base, "model_type": "qwen3_moe",
        "architectures": ["Qwen3MoeForCausalLM"],
        "moe_intermediate_size": MFF,
    }, t)
    _write(tmp_path / "lm", {
        **base, "model_type": "llada_moe",
        "architectures": ["LLaDAMoEModelLM"],
        "expert_intermediate_size": MFF, "mask_token_id": 156895,
    }, t)
    convert_hf(tmp_path / "q3", tmp_path / "out_q", dtype_hp="float32")
    cfg_l = convert_hf(tmp_path / "lm", tmp_path / "out_l",
                       dtype_hp="float32")
    assert not cfg_l.causal_attn and not cfg_l.moe_norm_topk
    assert cfg_l.mask_token_id == 156895 and not cfg_l.diffusion_shift_logits
    lq, _ = _logits(tmp_path / "out_q", causal_attn=False)
    ll, _ = _logits(tmp_path / "out_l")
    np.testing.assert_array_equal(lq, ll)

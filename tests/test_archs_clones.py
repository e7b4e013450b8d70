"""Converter coverage for archs without an installed HF implementation:
baichuan, orion, xverse, qwen (v1), jais, minicpm3.

Test strategy: these archs are exact re-namings / re-fusions of semantics
that ARE HF-logit-verified elsewhere (llama body, qwen2 qkv-bias,
stablelm LayerNorm, bloom ALiBi, deepseek MLA, minicpm multipliers).  Each
test builds the SAME logical weights under both the clone's HF tensor
names and an already-verified arch's names, converts both, and asserts
identical logits — proving the name mapping and fusion splits, with the
math guaranteed by the existing HF-parity suite.  (Reference analogs:
src/models/{baichuan,orion,xverse,qwen,jais,minicpm3}.cpp.)
"""

import json

import numpy as np
import pytest
import jax
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


def _logits(ckpt_dir, t=7, seed=3):
    cfg, params, _ = load_checkpoint(ckpt_dir)
    pf = float_twin_params(params, cfg, dtype=jnp.float32)
    rng = np.random.default_rng(seed)
    toks = rng.integers(0, V, (1, t))
    pos = jnp.arange(t, dtype=jnp.int32)[None]
    lg, _ = forward(pf, cfg, jnp.asarray(toks, jnp.int32), pos, None,
                    impl="xla")
    return np.asarray(lg)[..., :V], cfg


def _base_weights(seed=0, tern=True):
    """Random llama-shaped weights; projections exact-ternary so the
    conversion is lossless."""
    rng = np.random.default_rng(seed)

    def t2(k, n):
        if tern:
            return rng.integers(-1, 2, (k, n)).astype(np.float32) * 0.02
        return rng.standard_normal((k, n)).astype(np.float32) * 0.02

    w = {"embed": rng.standard_normal((V, D)).astype(np.float32) * 0.02,
         "final": np.abs(rng.standard_normal(D)).astype(np.float32) + 0.5,
         "head": t2(V, D) / 0.02 * 0.02}
    for i in range(L):
        w[f"q{i}"], w[f"k{i}"], w[f"v{i}"] = t2(D, D), t2(KV * HD, D), t2(
            KV * HD, D)
        w[f"o{i}"] = t2(D, D)
        w[f"g{i}"], w[f"u{i}"], w[f"d{i}"] = t2(FF, D), t2(FF, D), t2(D, FF)
        w[f"an{i}"] = np.abs(rng.standard_normal(D)).astype(np.float32) + .5
        w[f"fn{i}"] = np.abs(rng.standard_normal(D)).astype(np.float32) + .5
    return w


def _llama_tensors(w):
    t = {"model.embed_tokens.weight": w["embed"],
         "model.norm.weight": w["final"], "lm_head.weight": w["head"]}
    for i in range(L):
        p = f"model.layers.{i}."
        t[p + "self_attn.q_proj.weight"] = w[f"q{i}"]
        t[p + "self_attn.k_proj.weight"] = w[f"k{i}"]
        t[p + "self_attn.v_proj.weight"] = w[f"v{i}"]
        t[p + "self_attn.o_proj.weight"] = w[f"o{i}"]
        t[p + "mlp.gate_proj.weight"] = w[f"g{i}"]
        t[p + "mlp.up_proj.weight"] = w[f"u{i}"]
        t[p + "mlp.down_proj.weight"] = w[f"d{i}"]
        t[p + "input_layernorm.weight"] = w[f"an{i}"]
        t[p + "post_attention_layernorm.weight"] = w[f"fn{i}"]
    return t


_LLAMA_CFG = {
    "model_type": "llama", "architectures": ["LlamaForCausalLM"],
    "vocab_size": V, "hidden_size": D, "num_hidden_layers": L,
    "num_attention_heads": H, "num_key_value_heads": KV,
    "intermediate_size": FF, "rms_norm_eps": 1e-5, "rope_theta": 10000.0,
    "max_position_embeddings": 64, "tie_word_embeddings": False,
}


def test_baichuan_equals_llama(tmp_path):
    """baichuan-7B = llama with a fused W_pack ([q; k; v] rows)."""
    w = _base_weights()
    _write(tmp_path / "llama", _LLAMA_CFG, _llama_tensors(w))
    bt = {"model.embed_tokens.weight": w["embed"],
          "model.norm.weight": w["final"], "lm_head.weight": w["head"]}
    for i in range(L):
        p = f"model.layers.{i}."
        bt[p + "self_attn.W_pack.weight"] = np.concatenate(
            [w[f"q{i}"], w[f"k{i}"], w[f"v{i}"]], axis=0)
        bt[p + "self_attn.o_proj.weight"] = w[f"o{i}"]
        bt[p + "mlp.gate_proj.weight"] = w[f"g{i}"]
        bt[p + "mlp.up_proj.weight"] = w[f"u{i}"]
        bt[p + "mlp.down_proj.weight"] = w[f"d{i}"]
        bt[p + "input_layernorm.weight"] = w[f"an{i}"]
        bt[p + "post_attention_layernorm.weight"] = w[f"fn{i}"]
    _write(tmp_path / "bc", {**_LLAMA_CFG, "model_type": "baichuan",
                             "architectures": ["BaichuanForCausalLM"]}, bt)
    convert_hf(tmp_path / "llama", tmp_path / "out_l", dtype_hp="float32")
    convert_hf(tmp_path / "bc", tmp_path / "out_b", dtype_hp="float32")
    la, cfg_a = _logits(tmp_path / "out_l")
    lb, cfg_b = _logits(tmp_path / "out_b")
    assert cfg_b.pos_embed == "rope"  # 7B-style
    np.testing.assert_array_equal(la, lb)


def test_baichuan_13b_alibi_detect(tmp_path):
    w = _base_weights()
    bt = _llama_tensors(w)
    for i in range(L):
        p = f"model.layers.{i}."
        bt[p + "self_attn.W_pack.weight"] = np.concatenate(
            [bt.pop(p + "self_attn.q_proj.weight"),
             bt.pop(p + "self_attn.k_proj.weight"),
             bt.pop(p + "self_attn.v_proj.weight")], axis=0)
    _write(tmp_path / "bc", {**_LLAMA_CFG, "model_type": "baichuan",
                             "position_embedding_type": "alibi"}, bt)
    cfg = convert_hf(tmp_path / "bc", tmp_path / "out", dtype_hp="float32")
    assert cfg.pos_embed == "alibi"
    _logits(tmp_path / "out")  # forward must run


def test_xverse_equals_llama(tmp_path):
    w = _base_weights()
    _write(tmp_path / "llama", _LLAMA_CFG, _llama_tensors(w))
    _write(tmp_path / "xv", {**_LLAMA_CFG, "model_type": "xverse"},
           _llama_tensors(w))
    convert_hf(tmp_path / "llama", tmp_path / "out_l", dtype_hp="float32")
    convert_hf(tmp_path / "xv", tmp_path / "out_x", dtype_hp="float32")
    np.testing.assert_array_equal(
        _logits(tmp_path / "out_l")[0], _logits(tmp_path / "out_x")[0])


def test_orion_equals_stablelm_full_rotary(tmp_path):
    """orion = llama body with biased LayerNorms == stablelm with
    partial_rotary_factor=1 and no qkv bias (stablelm is HF-verified)."""
    rng = np.random.default_rng(1)
    w = _base_weights(seed=1)
    t = _llama_tensors(w)
    for i in range(L):
        p = f"model.layers.{i}."
        t[p + "input_layernorm.bias"] = rng.standard_normal(D).astype(
            np.float32) * 0.1
        t[p + "post_attention_layernorm.bias"] = rng.standard_normal(
            D).astype(np.float32) * 0.1
    t["model.norm.bias"] = rng.standard_normal(D).astype(np.float32) * 0.1
    _write(tmp_path / "orion", {**_LLAMA_CFG, "model_type": "orion"}, t)
    _write(tmp_path / "sl", {
        **_LLAMA_CFG, "model_type": "stablelm",
        "partial_rotary_factor": 1.0, "use_qkv_bias": False,
        "use_parallel_residual": False,
    }, t)
    convert_hf(tmp_path / "orion", tmp_path / "out_o", dtype_hp="float32")
    convert_hf(tmp_path / "sl", tmp_path / "out_s", dtype_hp="float32")
    lo, cfg_o = _logits(tmp_path / "out_o")
    ls, _ = _logits(tmp_path / "out_s")
    assert cfg_o.norm_type == "ln"
    np.testing.assert_array_equal(lo, ls)


def test_qwen_v1_equals_qwen2(tmp_path):
    """qwen v1 (fused biased c_attn, gpt2-ish names, w2=gate/w1=up) ==
    qwen2 (HF-verified qkv-bias llama body)."""
    rng = np.random.default_rng(2)
    w = _base_weights(seed=2)
    bq = rng.standard_normal(D).astype(np.float32) * 0.1
    bk = rng.standard_normal(KV * HD).astype(np.float32) * 0.1
    bv = rng.standard_normal(KV * HD).astype(np.float32) * 0.1
    t2 = _llama_tensors(w)
    for i in range(L):
        p = f"model.layers.{i}."
        t2[p + "self_attn.q_proj.bias"] = bq
        t2[p + "self_attn.k_proj.bias"] = bk
        t2[p + "self_attn.v_proj.bias"] = bv
    _write(tmp_path / "q2", {**_LLAMA_CFG, "model_type": "qwen2"}, t2)

    t1 = {"transformer.wte.weight": w["embed"],
          "transformer.ln_f.weight": w["final"],
          "lm_head.weight": w["head"]}
    for i in range(L):
        p = f"transformer.h.{i}."
        t1[p + "attn.c_attn.weight"] = np.concatenate(
            [w[f"q{i}"], w[f"k{i}"], w[f"v{i}"]], axis=0)
        t1[p + "attn.c_attn.bias"] = np.concatenate([bq, bk, bv])
        t1[p + "attn.c_proj.weight"] = w[f"o{i}"]
        t1[p + "mlp.w2.weight"] = w[f"g{i}"]
        t1[p + "mlp.w1.weight"] = w[f"u{i}"]
        t1[p + "mlp.c_proj.weight"] = w[f"d{i}"]
        t1[p + "ln_1.weight"] = w[f"an{i}"]
        t1[p + "ln_2.weight"] = w[f"fn{i}"]
    _write(tmp_path / "q1", {
        "model_type": "qwen", "architectures": ["QWenLMHeadModel"],
        "vocab_size": V, "n_embd": D, "n_layer": L, "n_head": H,
        "num_key_value_heads": KV, "ffn_hidden_size": 2 * FF,
        "layer_norm_epsilon": 1e-5, "rotary_emb_base": 10000.0,
        "seq_length": 64, "tie_word_embeddings": False,
    }, t1)
    convert_hf(tmp_path / "q2", tmp_path / "out2", dtype_hp="float32")
    convert_hf(tmp_path / "q1", tmp_path / "out1", dtype_hp="float32")
    l2, _ = _logits(tmp_path / "out2")
    l1, cfg1 = _logits(tmp_path / "out1")
    assert cfg1.qkv_bias and cfg1.d_ff == FF
    np.testing.assert_array_equal(l1, l2)


def test_jais_conversion(tmp_path):
    """jais: gpt2 Conv1D layout + ALiBi + biased SwiGLU + muP scales.
    Every knob is HF-verified separately (gpt2 Conv1D, bloom ALiBi, llama
    SwiGLU, granite attn/logit scales); this asserts the mapping."""
    rng = np.random.default_rng(4)
    w = _base_weights(seed=4)
    t = {"transformer.wte.weight": w["embed"],
         "transformer.ln_f.weight": w["final"],
         "transformer.ln_f.bias": rng.standard_normal(D).astype(
             np.float32) * 0.1}
    for i in range(L):
        p = f"transformer.h.{i}."
        # Conv1D stores (in, out)
        t[p + "attn.c_attn.weight"] = np.concatenate(
            [w[f"q{i}"], w[f"k{i}"], w[f"v{i}"]], axis=0).T
        t[p + "attn.c_attn.bias"] = np.zeros(D + 2 * KV * HD, np.float32)
        t[p + "attn.c_proj.weight"] = w[f"o{i}"].T
        t[p + "attn.c_proj.bias"] = np.zeros(D, np.float32)
        t[p + "mlp.c_fc.weight"] = w[f"g{i}"].T
        t[p + "mlp.c_fc.bias"] = np.zeros(FF, np.float32)
        t[p + "mlp.c_fc2.weight"] = w[f"u{i}"].T
        t[p + "mlp.c_fc2.bias"] = np.zeros(FF, np.float32)
        t[p + "mlp.c_proj.weight"] = w[f"d{i}"].T
        t[p + "mlp.c_proj.bias"] = np.zeros(D, np.float32)
        t[p + "ln_1.weight"] = w[f"an{i}"]
        t[p + "ln_1.bias"] = np.zeros(D, np.float32)
        t[p + "ln_2.weight"] = w[f"fn{i}"]
        t[p + "ln_2.bias"] = np.zeros(D, np.float32)
    _write(tmp_path / "jais", {
        "model_type": "jais", "architectures": ["JAISLMHeadModel"],
        "vocab_size": V, "n_embd": D, "n_layer": L, "n_head": H,
        "num_key_value_heads": KV, "n_inner": FF, "n_positions": 64,
        "mup_embeddings_scale": 9.17, "mup_output_alpha": 1.2,
        "mup_width_scale": 0.5, "mup_scale_qk_dot_by_d": True,
        "layer_norm_epsilon": 1e-5, "tie_word_embeddings": True,
    }, t)
    cfg = convert_hf(tmp_path / "jais", tmp_path / "out",
                     dtype_hp="float32")
    assert cfg.pos_embed == "alibi" and cfg.norm_type == "ln"
    assert cfg.qkv_bias and cfg.proj_bias and cfg.ffn_gated
    assert cfg.embed_scale == 9.17
    assert abs(cfg.logit_scale - 0.6) < 1e-9
    assert abs(cfg.attn_scale - 1.0 / HD) < 1e-9
    # jais has no q/k/v heads mismatch quirks; forward must run
    _logits(tmp_path / "out")


def test_minicpm3_equals_deepseek_mla(tmp_path):
    """minicpm3 = deepseek-V2 MLA attention + minicpm multipliers; with
    unit multipliers the conversion must equal the deepseek one (which is
    HF-logit-verified)."""
    rng = np.random.default_rng(5)
    r_q, r_kv, dn, dr, vhd = 32, 32, 16, 16, 16
    t = {"model.embed_tokens.weight":
         rng.standard_normal((V, D)).astype(np.float32) * 0.02,
         "model.norm.weight": np.ones(D, np.float32),
         "lm_head.weight":
         rng.integers(-1, 2, (V, D)).astype(np.float32) * 0.02}

    def tern(k, n):
        return rng.integers(-1, 2, (n, k)).astype(np.float32) * 0.02

    for i in range(L):
        p = f"model.layers.{i}.self_attn."
        t[p + "q_a_proj.weight"] = tern(D, r_q)
        t[p + "q_a_layernorm.weight"] = np.ones(r_q, np.float32)
        t[p + "q_b_proj.weight"] = tern(r_q, H * (dn + dr))
        t[p + "kv_a_proj_with_mqa.weight"] = tern(D, r_kv + dr)
        t[p + "kv_a_layernorm.weight"] = np.ones(r_kv, np.float32)
        t[p + "kv_b_proj.weight"] = (
            rng.standard_normal((H * (dn + vhd), r_kv)).astype(np.float32)
            * 0.05)
        t[p + "o_proj.weight"] = tern(H * vhd, D)
        q = f"model.layers.{i}."
        t[q + "mlp.gate_proj.weight"] = tern(D, FF)
        t[q + "mlp.up_proj.weight"] = tern(D, FF)
        t[q + "mlp.down_proj.weight"] = tern(FF, D)
        t[q + "input_layernorm.weight"] = np.ones(D, np.float32)
        t[q + "post_attention_layernorm.weight"] = np.ones(D, np.float32)
    base = {
        "vocab_size": V, "hidden_size": D, "num_hidden_layers": L,
        "num_attention_heads": H, "num_key_value_heads": H,
        "intermediate_size": FF, "rms_norm_eps": 1e-5,
        "rope_theta": 10000.0, "max_position_embeddings": 64,
        "q_lora_rank": r_q, "kv_lora_rank": r_kv,
        "qk_nope_head_dim": dn, "qk_rope_head_dim": dr, "v_head_dim": vhd,
        "tie_word_embeddings": False,
    }
    _write(tmp_path / "ds", {**base, "model_type": "deepseek_v2",
                             "n_routed_experts": 0}, t)
    _write(tmp_path / "m3", {**base, "model_type": "minicpm3",
                             "scale_emb": 1.0, "scale_depth": L ** 0.5,
                             "dim_model_base": D}, t)
    convert_hf(tmp_path / "ds", tmp_path / "out_d", dtype_hp="float32")
    cfg3 = convert_hf(tmp_path / "m3", tmp_path / "out_m",
                      dtype_hp="float32")
    assert cfg3.kv_lora_rank == r_kv and cfg3.q_lora_rank == r_q
    ld, _ = _logits(tmp_path / "out_d")
    lm, _ = _logits(tmp_path / "out_m")
    np.testing.assert_array_equal(ld, lm)


def test_maincoder_equals_hunyuan_dense(tmp_path):
    """maincoder = llama body with POST-rope per-head qk-norm
    (src/models/maincoder.cpp ordering) == hunyuan-v1-dense semantics,
    which are HF-logit-verified."""
    rng = np.random.default_rng(6)
    w = _base_weights(seed=6)
    t = _llama_tensors(w)
    qn = np.abs(rng.standard_normal(HD)).astype(np.float32) + 0.5
    kn = np.abs(rng.standard_normal(HD)).astype(np.float32) + 0.5
    for i in range(L):
        p = f"model.layers.{i}."
        t[p + "self_attn.q_norm.weight"] = qn
        t[p + "self_attn.k_norm.weight"] = kn
    _write(tmp_path / "mc", {**_LLAMA_CFG, "model_type": "maincoder"}, t)
    th = dict(t)
    for i in range(L):
        p = f"model.layers.{i}."
        th[p + "self_attn.query_layernorm.weight"] = qn
        th[p + "self_attn.key_layernorm.weight"] = kn
        del th[p + "self_attn.q_norm.weight"]
        del th[p + "self_attn.k_norm.weight"]
    _write(tmp_path / "hy", {**_LLAMA_CFG, "model_type": "hunyuan_v1_dense",
                             "attention_bias": False}, th)
    convert_hf(tmp_path / "mc", tmp_path / "out_m", dtype_hp="float32")
    convert_hf(tmp_path / "hy", tmp_path / "out_h", dtype_hp="float32")
    lm, cfg_m = _logits(tmp_path / "out_m")
    lh, _ = _logits(tmp_path / "out_h")
    assert cfg_m.qk_norm and cfg_m.qk_norm_post_rope
    np.testing.assert_array_equal(lm, lh)


def test_pangu_embedded_biases(tmp_path):
    """pangu-embedded: llama + qkv AND wo biases (each bias knob is
    HF-verified via qwen2/gpt2); conversion + forward must run with the
    biases present."""
    rng = np.random.default_rng(7)
    w = _base_weights(seed=7)
    t = _llama_tensors(w)
    for i in range(L):
        p = f"model.layers.{i}."
        t[p + "self_attn.q_proj.bias"] = rng.standard_normal(
            D).astype(np.float32) * 0.1
        t[p + "self_attn.k_proj.bias"] = rng.standard_normal(
            KV * HD).astype(np.float32) * 0.1
        t[p + "self_attn.v_proj.bias"] = rng.standard_normal(
            KV * HD).astype(np.float32) * 0.1
        t[p + "self_attn.o_proj.bias"] = rng.standard_normal(
            D).astype(np.float32) * 0.1
    _write(tmp_path / "pg", {**_LLAMA_CFG, "model_type": "pangu_embedded"},
           t)
    cfg = convert_hf(tmp_path / "pg", tmp_path / "out", dtype_hp="float32")
    assert cfg.qkv_bias and cfg.proj_bias
    lg, _ = _logits(tmp_path / "out")
    # biases must influence the logits (vs converting the same weights
    # as a plain llama without them)
    t2 = {k: v for k, v in t.items() if not k.endswith(".bias")}
    _write(tmp_path / "plain", _LLAMA_CFG, t2)
    convert_hf(tmp_path / "plain", tmp_path / "out_p", dtype_hp="float32")
    lp_, _ = _logits(tmp_path / "out_p")
    assert np.abs(lg - lp_).max() > 1e-3

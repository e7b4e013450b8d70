"""Model-zoo tail — fifth arch wave (VERDICT r2 item 4).

Two protocols:

* HF logit/hidden parity (archs installed in `transformers`): mistral3
  (text passthrough), gemma-embedding (Gemma3TextModel + bidirectional
  attention), gemma3n (separate file).
* Reference-graph transcription equality (archs NOT in transformers):
  deepseek V1, minimax-m2, smallthinker, afmoe, mimo2, openelm, deci —
  a direct numpy transcription of the reference graph
  (src/models/{deepseek,minimax-m2,smallthinker,afmoe,mimo2-iswa,openelm,
  deci}.cpp) runs the same weights the converter packed, and logits must
  agree with our forward.
"""

import json

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from vlut_tpu.convert.checkpoint import load_checkpoint
from vlut_tpu.convert.convert import convert_hf
from vlut_tpu.models.transformer import forward
from vlut_tpu.train.finetune import float_twin_params

from tests.test_archs_hf import _run_pair, _ternarize_model  # noqa: E402

V = 96


def test_mistral3_text_parity(tmp_path):
    """Mistral3ForConditionalGeneration text tower == plain mistral/llama
    graph (reference src/models/mistral3.cpp); the vision tower is dropped
    by the converter."""
    tc = transformers.MistralConfig(
        vocab_size=V, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=128, max_position_embeddings=64,
        rope_theta=10000.0, rms_norm_eps=1e-5, tie_word_embeddings=False,
    )
    vc = transformers.PixtralVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=1,
        num_attention_heads=2, image_size=32, patch_size=16,
    )
    c = transformers.Mistral3Config(
        text_config=tc, vision_config=vc, image_token_index=V - 1,
        vision_feature_layer=-1, multimodal_projector_bias=False,
    )
    torch.manual_seed(0)
    model = transformers.Mistral3ForConditionalGeneration(c)
    model = model.float().eval()
    _ternarize_model(model)
    hf_dir, out_dir = tmp_path / "hf", tmp_path / "out"
    model.save_pretrained(str(hf_dir), safe_serialization=True)

    cfg = convert_hf(hf_dir, out_dir, fmt="i2", dtype_hp="float32")
    cfg2, params, meta = load_checkpoint(out_dir)
    params_f = float_twin_params(params, cfg2, dtype=jnp.float32)

    rng = np.random.default_rng(7)
    b, t = 2, 9
    tokens = rng.integers(0, V - 1, (b, t))
    with torch.no_grad():
        want = model(input_ids=torch.tensor(tokens)).logits.numpy()
    pos = jnp.tile(jnp.arange(t, dtype=jnp.int32), (b, 1))
    got, _ = forward(
        params_f, cfg2, jnp.asarray(tokens, jnp.int32), pos, None,
        impl="xla",
    )
    got = np.asarray(got, np.float32)[..., : want.shape[-1]]
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))


def test_gemma_embedding_parity(tmp_path):
    """EmbeddingGemma (architectures=[Gemma3TextModel],
    use_bidirectional_attention) == gemma3 body with bidirectional
    attention and hidden-state output (reference
    src/models/gemma-embedding.cpp, convert_hf_to_gguf EmbeddingGemma)."""
    c = transformers.Gemma3TextConfig(
        vocab_size=V, hidden_size=64, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        intermediate_size=128, max_position_embeddings=64,
        rope_theta=1_000_000.0, rope_local_base_freq=10_000.0,
        sliding_window=8, query_pre_attn_scalar=16,
        use_bidirectional_attention=True, rms_norm_eps=1e-6,
    )
    torch.manual_seed(1)
    model = transformers.Gemma3TextModel(c).float().eval()
    _ternarize_model(model)
    hf_dir, out_dir = tmp_path / "hf", tmp_path / "out"
    model.save_pretrained(str(hf_dir), safe_serialization=True)

    cfg = convert_hf(hf_dir, out_dir, fmt="i2", dtype_hp="float32")
    assert not cfg.causal_attn
    cfg2, params, meta = load_checkpoint(out_dir)
    params_f = float_twin_params(params, cfg2, dtype=jnp.float32)

    rng = np.random.default_rng(5)
    b, t = 2, 9
    tokens = rng.integers(0, V, (b, t))
    with torch.no_grad():
        want = model(torch.tensor(tokens)).last_hidden_state.numpy()
    pos = jnp.tile(jnp.arange(t, dtype=jnp.int32), (b, 1))
    got, _ = forward(
        params_f, cfg2, jnp.asarray(tokens, jnp.int32), pos, None,
        impl="xla", output="hidden",
    )
    got = np.asarray(got, np.float32)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)


# --- reference-graph transcription protocol ---------------------------------
# Each test writes a tiny HF-style checkpoint, converts it, runs our
# forward on float twins, and compares against a direct numpy transcription
# of the reference graph builder (cited per test).

D, L, H, KV, HD, FF = 32, 2, 4, 2, 8, 48
E, TOPK = 4, 2


def _write(dirp, cfg: dict, tensors: dict):
    from safetensors.numpy import save_file

    dirp.mkdir(parents=True, exist_ok=True)
    (dirp / "config.json").write_text(json.dumps(cfg))
    save_file({k: np.ascontiguousarray(v, np.float32)
               for k, v in tensors.items()}, str(dirp / "model.safetensors"))


def _our_logits(ckpt_dir, toks):
    cfg, params, _ = load_checkpoint(ckpt_dir)
    pf = float_twin_params(params, cfg, dtype=jnp.float32)
    t = toks.shape[1]
    pos = jnp.tile(jnp.arange(t, dtype=jnp.int32), (toks.shape[0], 1))
    lg, _ = forward(pf, cfg, jnp.asarray(toks, jnp.int32), pos, None,
                    impl="xla")
    return np.asarray(lg, np.float32), cfg


def _t2(rng, k, n, scale=0.02):
    return rng.integers(-1, 2, (k, n)).astype(np.float32) * scale


def _gain(rng, n):
    return (np.abs(rng.standard_normal(n)) + 0.5).astype(np.float32)


def _rms_np(x, w, eps=1e-5):
    v = np.mean(x.astype(np.float64) ** 2, -1, keepdims=True)
    return (x / np.sqrt(v + eps) * w).astype(np.float64)


def _rope_np(x, pos, theta, rot=None):
    """NEOX split-half rope on the first `rot` dims of (T, H, HD)."""
    hd = x.shape[-1]
    rot = rot or hd
    half = rot // 2
    inv = 1.0 / theta ** (np.arange(0, rot, 2, dtype=np.float64) / rot)
    ang = pos[:, None].astype(np.float64) * inv[None]
    c, s = np.cos(ang)[:, None, :], np.sin(ang)[:, None, :]
    x1, x2 = x[..., :half], x[..., half:rot]
    xr = np.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], -1)
    return np.concatenate([xr, x[..., rot:]], -1)


def _attn_np(q, k, v, scale, window=0, sinks=None, local_theta_mask=None):
    """Causal GQA attention on (T, H, HD) / (T, KV, HD) numpy arrays."""
    T, Hq, _ = q.shape
    KVh = k.shape[1]
    g = Hq // KVh
    out = np.zeros_like(q)
    qi = np.arange(T)[:, None]
    ki = np.arange(T)[None, :]
    mask = ki <= qi
    if window:
        mask = mask & (ki > qi - window)
    for h in range(Hq):
        sc = (q[:, h] @ k[:, h // g].T) * scale
        sc = np.where(mask, sc, -1e30)
        if sinks is not None:
            m = np.maximum(sc.max(-1), sinks[h])
            p = np.exp(sc - m[:, None]) * mask
            p = p / (p.sum(-1) + np.exp(sinks[h] - m))[:, None]
        else:
            p = np.exp(sc - sc.max(-1, keepdims=True)) * mask
            p = p / p.sum(-1, keepdims=True)
        out[:, h] = p @ v[:, h // g]
    return out


def _silu(x):
    return x / (1.0 + np.exp(-x))


def _moe_np(x, router_w, experts, k_used, score="softmax", sel_bias=None,
            norm_w=True, w_scale=1.0, act=_silu, router_in=None):
    """build_moe_ffn transcription (src/llama-graph.cpp:1045): router
    scores, optional selection-only bias, top-k, optional renorm + scale,
    act(gate)*up -> down combine."""
    logits = (router_in if router_in is not None else x) @ router_w
    if score == "softmax":
        e = np.exp(logits - logits.max(-1, keepdims=True))
        probs = e / e.sum(-1, keepdims=True)
    else:
        probs = 1.0 / (1.0 + np.exp(-logits))
    sel = probs + sel_bias if sel_bias is not None else probs
    out = np.zeros_like(x)
    for t in range(x.shape[0]):
        idx = np.argsort(-sel[t], kind="stable")[:k_used]
        w = probs[t, idx]
        if norm_w:
            w = w / w.sum()
        w = w * w_scale
        for wi, e_ in zip(w, idx):
            g_, u_, d_ = experts[e_]
            out[t] = out[t] + wi * ((act(x[t] @ g_) * (x[t] @ u_)) @ d_)
    return out


def test_deepseek_v1_transcription(tmp_path):
    """deepseek V1 (src/models/deepseek.cpp): llama attention, leading
    dense layers, softmax MoE with top-k NOT renormalized (norm_w=false,
    scale_w=false) + always-on shared experts."""
    rng = np.random.default_rng(11)
    Vv = 64
    NSH = 2  # n_shared_experts
    w = {
        "model.embed_tokens.weight": rng.standard_normal(
            (Vv, D)).astype(np.float32) * 0.02,
        "model.norm.weight": _gain(rng, D),
        "lm_head.weight": _t2(rng, Vv, D),
    }
    for i in range(L):
        p = f"model.layers.{i}."
        w[p + "self_attn.q_proj.weight"] = _t2(rng, H * HD, D)
        w[p + "self_attn.k_proj.weight"] = _t2(rng, KV * HD, D)
        w[p + "self_attn.v_proj.weight"] = _t2(rng, KV * HD, D)
        w[p + "self_attn.o_proj.weight"] = _t2(rng, D, H * HD)
        w[p + "input_layernorm.weight"] = _gain(rng, D)
        w[p + "post_attention_layernorm.weight"] = _gain(rng, D)
        if i == 0:  # dense lead layer (first_k_dense_replace=1)
            w[p + "mlp.gate_proj.weight"] = _t2(rng, FF * 2, D)
            w[p + "mlp.up_proj.weight"] = _t2(rng, FF * 2, D)
            w[p + "mlp.down_proj.weight"] = _t2(rng, D, FF * 2)
        else:
            w[p + "mlp.gate.weight"] = rng.standard_normal(
                (E, D)).astype(np.float32) * 0.1
            for e in range(E):
                q = f"{p}mlp.experts.{e}."
                w[q + "gate_proj.weight"] = _t2(rng, FF, D)
                w[q + "up_proj.weight"] = _t2(rng, FF, D)
                w[q + "down_proj.weight"] = _t2(rng, D, FF)
            w[p + "mlp.shared_experts.gate_proj.weight"] = _t2(
                rng, NSH * FF, D)
            w[p + "mlp.shared_experts.up_proj.weight"] = _t2(
                rng, NSH * FF, D)
            w[p + "mlp.shared_experts.down_proj.weight"] = _t2(
                rng, D, NSH * FF)
    cfgd = {
        "model_type": "deepseek",
        "architectures": ["DeepseekForCausalLM"],
        "vocab_size": Vv, "hidden_size": D, "num_hidden_layers": L,
        "num_attention_heads": H, "num_key_value_heads": KV,
        "intermediate_size": FF * 2, "moe_intermediate_size": FF,
        "n_routed_experts": E, "num_experts_per_tok": TOPK,
        "n_shared_experts": NSH, "first_k_dense_replace": 1,
        "norm_topk_prob": False, "rms_norm_eps": 1e-5,
        "rope_theta": 10000.0, "max_position_embeddings": 64,
        "tie_word_embeddings": False,
    }
    _write(tmp_path / "hf", cfgd, w)
    convert_hf(tmp_path / "hf", tmp_path / "out", dtype_hp="float32")
    toks = rng.integers(0, Vv, (1, 7))
    got, cfg = _our_logits(tmp_path / "out", toks)
    assert cfg.first_k_dense == 1 and not cfg.moe_norm_topk

    # transcription
    T = toks.shape[1]
    x = w["model.embed_tokens.weight"][toks[0]].astype(np.float64)
    pos = np.arange(T)
    for i in range(L):
        p = f"model.layers.{i}."
        h = _rms_np(x, w[p + "input_layernorm.weight"])
        q = (h @ w[p + "self_attn.q_proj.weight"].T).reshape(T, H, HD)
        k = (h @ w[p + "self_attn.k_proj.weight"].T).reshape(T, KV, HD)
        v = (h @ w[p + "self_attn.v_proj.weight"].T).reshape(T, KV, HD)
        q = _rope_np(q, pos, 10000.0)
        k = _rope_np(k, pos, 10000.0)
        att = _attn_np(q, k, v, HD ** -0.5).reshape(T, H * HD)
        x = x + att @ w[p + "self_attn.o_proj.weight"].T
        h = _rms_np(x, w[p + "post_attention_layernorm.weight"])
        if i == 0:
            ff = (_silu(h @ w[p + "mlp.gate_proj.weight"].T)
                  * (h @ w[p + "mlp.up_proj.weight"].T)
                  ) @ w[p + "mlp.down_proj.weight"].T
        else:
            experts = [
                (w[f"{p}mlp.experts.{e}.gate_proj.weight"].T,
                 w[f"{p}mlp.experts.{e}.up_proj.weight"].T,
                 w[f"{p}mlp.experts.{e}.down_proj.weight"].T)
                for e in range(E)
            ]
            ff = _moe_np(h, w[p + "mlp.gate.weight"].T, experts, TOPK,
                         score="softmax", norm_w=False)
            ff = ff + (_silu(h @ w[p + "mlp.shared_experts.gate_proj.weight"].T)
                       * (h @ w[p + "mlp.shared_experts.up_proj.weight"].T)
                       ) @ w[p + "mlp.shared_experts.down_proj.weight"].T
        x = x + ff
    x = _rms_np(x, w["model.norm.weight"])
    want = x @ w["lm_head.weight"].T
    np.testing.assert_allclose(got[0, :, :Vv], want, rtol=2e-3, atol=2e-3)
    np.testing.assert_array_equal(
        got[0, :, :Vv].argmax(-1), want.argmax(-1))


def test_minimax_m2_transcription(tmp_path):
    """MiniMax-M2 (src/models/minimax-m2.cpp): WHOLE-width q/k RMSNorm
    applied before the head reshape, partial rotary (rotary_dim < head
    dim), sigmoid MoE with e_score_correction selection bias + top-k
    renormalization."""
    rng = np.random.default_rng(21)
    Vv = 64
    ROT = HD // 2
    w = {
        "model.embed_tokens.weight": rng.standard_normal(
            (Vv, D)).astype(np.float32) * 0.02,
        "model.norm.weight": _gain(rng, D),
        "lm_head.weight": _t2(rng, Vv, D),
    }
    for i in range(L):
        p = f"model.layers.{i}."
        w[p + "self_attn.q_proj.weight"] = _t2(rng, H * HD, D)
        w[p + "self_attn.k_proj.weight"] = _t2(rng, KV * HD, D)
        w[p + "self_attn.v_proj.weight"] = _t2(rng, KV * HD, D)
        w[p + "self_attn.o_proj.weight"] = _t2(rng, D, H * HD)
        w[p + "self_attn.q_norm.weight"] = _gain(rng, H * HD)
        w[p + "self_attn.k_norm.weight"] = _gain(rng, KV * HD)
        w[p + "input_layernorm.weight"] = _gain(rng, D)
        w[p + "post_attention_layernorm.weight"] = _gain(rng, D)
        w[p + "block_sparse_moe.gate.weight"] = rng.standard_normal(
            (E, D)).astype(np.float32) * 0.1
        w[p + "block_sparse_moe.e_score_correction_bias"] = (
            rng.standard_normal(E).astype(np.float32) * 0.5)
        for e in range(E):
            q = f"{p}block_sparse_moe.experts.{e}."
            w[q + "w1.weight"] = _t2(rng, FF, D)   # gate
            w[q + "w3.weight"] = _t2(rng, FF, D)   # up
            w[q + "w2.weight"] = _t2(rng, D, FF)   # down
    cfgd = {
        "model_type": "minimax_m2",
        "architectures": ["MiniMaxM2ForCausalLM"],
        "vocab_size": Vv, "hidden_size": D, "num_hidden_layers": L,
        "num_attention_heads": H, "num_key_value_heads": KV,
        "head_dim": HD, "rotary_dim": ROT,
        "intermediate_size": FF, "moe_intermediate_size": FF,
        "num_local_experts": E, "num_experts_per_tok": TOPK,
        "scoring_func": "sigmoid", "rms_norm_eps": 1e-5,
        "rope_theta": 10000.0, "max_position_embeddings": 64,
        "tie_word_embeddings": False,
    }
    _write(tmp_path / "hf", cfgd, w)
    convert_hf(tmp_path / "hf", tmp_path / "out", dtype_hp="float32")
    toks = rng.integers(0, Vv, (1, 7))
    got, cfg = _our_logits(tmp_path / "out", toks)
    assert cfg.qk_norm_scope == "whole" and cfg.rope_pct == 0.5

    T = toks.shape[1]
    x = w["model.embed_tokens.weight"][toks[0]].astype(np.float64)
    pos = np.arange(T)
    for i in range(L):
        p = f"model.layers.{i}."
        h = _rms_np(x, w[p + "input_layernorm.weight"])
        q = h @ w[p + "self_attn.q_proj.weight"].T   # (T, H*HD)
        k = h @ w[p + "self_attn.k_proj.weight"].T
        v = h @ w[p + "self_attn.v_proj.weight"].T
        q = _rms_np(q, w[p + "self_attn.q_norm.weight"])  # WHOLE width
        k = _rms_np(k, w[p + "self_attn.k_norm.weight"])
        q = _rope_np(q.reshape(T, H, HD), pos, 10000.0, rot=ROT)
        k = _rope_np(k.reshape(T, KV, HD), pos, 10000.0, rot=ROT)
        att = _attn_np(q, k, v.reshape(T, KV, HD),
                       HD ** -0.5).reshape(T, H * HD)
        x = x + att @ w[p + "self_attn.o_proj.weight"].T
        h = _rms_np(x, w[p + "post_attention_layernorm.weight"])
        experts = [
            (w[f"{p}block_sparse_moe.experts.{e}.w1.weight"].T,
             w[f"{p}block_sparse_moe.experts.{e}.w3.weight"].T,
             w[f"{p}block_sparse_moe.experts.{e}.w2.weight"].T)
            for e in range(E)
        ]
        ff = _moe_np(
            h, w[p + "block_sparse_moe.gate.weight"].T, experts, TOPK,
            score="sigmoid",
            sel_bias=w[p + "block_sparse_moe.e_score_correction_bias"],
            norm_w=True,
        )
        x = x + ff
    x = _rms_np(x, w["model.norm.weight"])
    want = x @ w["lm_head.weight"].T
    np.testing.assert_allclose(got[0, :, :Vv], want, rtol=2e-3, atol=2e-3)
    np.testing.assert_array_equal(
        got[0, :, :Vv].argmax(-1), want.argmax(-1))


def test_smallthinker_transcription(tmp_path):
    """SmallThinker (src/models/smallthinker.cpp): router logits on the
    RAW layer input (pre-norm), relu-gated experts, NoPE on il%4==0
    layers when SWA is on."""
    rng = np.random.default_rng(31)
    Vv = 64
    LL = 4
    swl = [1, 1, 1, 0]  # sliding_window_layout; layer 0 NoPE (il%4==0)
    WIN = 4
    w = {
        "model.embed_tokens.weight": rng.standard_normal(
            (Vv, D)).astype(np.float32) * 0.02,
        "model.norm.weight": _gain(rng, D),
        "lm_head.weight": _t2(rng, Vv, D),
    }
    for i in range(LL):
        p = f"model.layers.{i}."
        w[p + "self_attn.q_proj.weight"] = _t2(rng, H * HD, D)
        w[p + "self_attn.k_proj.weight"] = _t2(rng, KV * HD, D)
        w[p + "self_attn.v_proj.weight"] = _t2(rng, KV * HD, D)
        w[p + "self_attn.o_proj.weight"] = _t2(rng, D, H * HD)
        w[p + "input_layernorm.weight"] = _gain(rng, D)
        w[p + "post_attention_layernorm.weight"] = _gain(rng, D)
        w[p + "block_sparse_moe.primary_router.weight"] = (
            rng.standard_normal((E, D)).astype(np.float32) * 0.1)
        for e in range(E):
            q = f"{p}block_sparse_moe.experts.{e}."
            w[q + "gate.weight"] = _t2(rng, FF, D)
            w[q + "up.weight"] = _t2(rng, FF, D)
            w[q + "down.weight"] = _t2(rng, D, FF)
    cfgd = {
        "model_type": "smallthinker",
        "architectures": ["SmallThinkerForCausalLM"],
        "vocab_size": Vv, "hidden_size": D, "num_hidden_layers": LL,
        "num_attention_heads": H, "num_key_value_heads": KV,
        "moe_ffn_hidden_size": FF, "num_experts": E,
        "moe_num_active_primary_experts": TOPK,
        "num_experts_per_tok": TOPK,
        "moe_primary_router_apply_softmax": True,
        "sliding_window_layout": swl, "sliding_window_size": WIN,
        "rms_norm_eps": 1e-5, "rope_theta": 10000.0,
        "max_position_embeddings": 64, "tie_word_embeddings": False,
    }
    _write(tmp_path / "hf", cfgd, w)
    convert_hf(tmp_path / "hf", tmp_path / "out", dtype_hp="float32")
    toks = rng.integers(0, Vv, (1, 7))
    got, cfg = _our_logits(tmp_path / "out", toks)
    assert cfg.moe_router_input == "layer_input" and cfg.act_fn == "relu"
    assert cfg.nope_layers == (True, False, False, False)

    T = toks.shape[1]
    relu = lambda z: np.maximum(z, 0.0)  # noqa: E731
    x = w["model.embed_tokens.weight"][toks[0]].astype(np.float64)
    pos = np.arange(T)
    for i in range(LL):
        p = f"model.layers.{i}."
        x_in = x
        h = _rms_np(x, w[p + "input_layernorm.weight"])
        q = (h @ w[p + "self_attn.q_proj.weight"].T).reshape(T, H, HD)
        k = (h @ w[p + "self_attn.k_proj.weight"].T).reshape(T, KV, HD)
        v = (h @ w[p + "self_attn.v_proj.weight"].T).reshape(T, KV, HD)
        if i % 4 != 0:  # rope only on non-NoPE layers
            q = _rope_np(q, pos, 10000.0)
            k = _rope_np(k, pos, 10000.0)
        att = _attn_np(q, k, v, HD ** -0.5,
                       window=WIN if swl[i] else 0).reshape(T, H * HD)
        x = x + att @ w[p + "self_attn.o_proj.weight"].T
        h = _rms_np(x, w[p + "post_attention_layernorm.weight"])
        experts = [
            (w[f"{p}block_sparse_moe.experts.{e}.gate.weight"].T,
             w[f"{p}block_sparse_moe.experts.{e}.up.weight"].T,
             w[f"{p}block_sparse_moe.experts.{e}.down.weight"].T)
            for e in range(E)
        ]
        ff = _moe_np(
            h, w[p + "block_sparse_moe.primary_router.weight"].T,
            experts, TOPK, score="softmax", norm_w=True, act=relu,
            router_in=x_in,  # router on the RAW layer input
        )
        x = x + ff
    x = _rms_np(x, w["model.norm.weight"])
    want = x @ w["lm_head.weight"].T
    np.testing.assert_allclose(got[0, :, :Vv], want, rtol=2e-3, atol=2e-3)
    np.testing.assert_array_equal(
        got[0, :, :Vv].argmax(-1), want.argmax(-1))


def test_afmoe_transcription(tmp_path):
    """afmoe (src/models/afmoe.cpp): muP embed scale, sandwich norms on
    both branches, per-head qk-norm, sigmoid attention gate applied to the
    pre-o_proj attention output, rope only on sliding layers, sigmoid MoE
    with selection bias + renorm + route scale + shared expert, dense
    lead."""
    rng = np.random.default_rng(41)
    Vv = 64
    WIN = 4
    SCALE = 2.5
    w = {
        "model.embed_tokens.weight": rng.standard_normal(
            (Vv, D)).astype(np.float32) * 0.02,
        "model.norm.weight": _gain(rng, D),
        "lm_head.weight": _t2(rng, Vv, D),
    }
    for i in range(L):
        p = f"model.layers.{i}."
        w[p + "self_attn.q_proj.weight"] = _t2(rng, H * HD, D)
        w[p + "self_attn.k_proj.weight"] = _t2(rng, KV * HD, D)
        w[p + "self_attn.v_proj.weight"] = _t2(rng, KV * HD, D)
        w[p + "self_attn.o_proj.weight"] = _t2(rng, D, H * HD)
        w[p + "self_attn.gate_proj.weight"] = _t2(rng, H * HD, D)
        w[p + "self_attn.q_norm.weight"] = _gain(rng, HD)
        w[p + "self_attn.k_norm.weight"] = _gain(rng, HD)
        w[p + "input_layernorm.weight"] = _gain(rng, D)
        w[p + "post_attention_layernorm.weight"] = _gain(rng, D)
        w[p + "pre_mlp_layernorm.weight"] = _gain(rng, D)
        w[p + "post_mlp_layernorm.weight"] = _gain(rng, D)
        if i == 0:  # dense lead (num_dense_layers=1)
            w[p + "mlp.gate_proj.weight"] = _t2(rng, FF * 2, D)
            w[p + "mlp.up_proj.weight"] = _t2(rng, FF * 2, D)
            w[p + "mlp.down_proj.weight"] = _t2(rng, D, FF * 2)
        else:
            w[p + "mlp.router.gate.weight"] = rng.standard_normal(
                (E, D)).astype(np.float32) * 0.1
            w[p + "mlp.expert_bias"] = (
                rng.standard_normal(E).astype(np.float32) * 0.5)
            for e in range(E):
                q = f"{p}mlp.experts.{e}."
                w[q + "gate_proj.weight"] = _t2(rng, FF, D)
                w[q + "up_proj.weight"] = _t2(rng, FF, D)
                w[q + "down_proj.weight"] = _t2(rng, D, FF)
            w[p + "mlp.shared_experts.gate_proj.weight"] = _t2(rng, FF, D)
            w[p + "mlp.shared_experts.up_proj.weight"] = _t2(rng, FF, D)
            w[p + "mlp.shared_experts.down_proj.weight"] = _t2(rng, D, FF)
    cfgd = {
        "model_type": "afmoe", "architectures": ["AfmoeForCausalLM"],
        "vocab_size": Vv, "hidden_size": D, "num_hidden_layers": L,
        "num_attention_heads": H, "num_key_value_heads": KV,
        "intermediate_size": FF * 2, "moe_intermediate_size": FF,
        "num_experts": E, "num_experts_per_tok": TOPK,
        "num_shared_experts": 1, "num_dense_layers": 1,
        "route_norm": True, "route_scale": SCALE,
        "scoring_func": "sigmoid", "sliding_window": WIN,
        "global_attn_every_n_layers": 2,
        "rms_norm_eps": 1e-5, "rope_theta": 10000.0,
        "max_position_embeddings": 64, "tie_word_embeddings": False,
    }
    _write(tmp_path / "hf", cfgd, w)
    convert_hf(tmp_path / "hf", tmp_path / "out", dtype_hp="float32")
    toks = rng.integers(0, Vv, (1, 7))
    got, cfg = _our_logits(tmp_path / "out", toks)
    assert cfg.attn_gate == "sigmoid" and cfg.post_norms
    assert tuple(cfg.nope_layers) == (False, True)

    T = toks.shape[1]
    sig = lambda z: 1.0 / (1.0 + np.exp(-z))  # noqa: E731
    x = w["model.embed_tokens.weight"][toks[0]].astype(np.float64)
    x = x * np.sqrt(D)
    pos = np.arange(T)
    swa = [True, False]
    for i in range(L):
        p = f"model.layers.{i}."
        h = _rms_np(x, w[p + "input_layernorm.weight"])
        gate = h @ w[p + "self_attn.gate_proj.weight"].T
        q = (h @ w[p + "self_attn.q_proj.weight"].T).reshape(T, H, HD)
        k = (h @ w[p + "self_attn.k_proj.weight"].T).reshape(T, KV, HD)
        v = (h @ w[p + "self_attn.v_proj.weight"].T).reshape(T, KV, HD)
        q = _rms_np(q, w[p + "self_attn.q_norm.weight"])
        k = _rms_np(k, w[p + "self_attn.k_norm.weight"])
        if swa[i]:
            q = _rope_np(q, pos, 10000.0)
            k = _rope_np(k, pos, 10000.0)
        att = _attn_np(q, k, v, HD ** -0.5,
                       window=WIN if swa[i] else 0).reshape(T, H * HD)
        att = att * sig(gate)
        o = att @ w[p + "self_attn.o_proj.weight"].T
        o = _rms_np(o, w[p + "post_attention_layernorm.weight"])
        x = x + o
        h = _rms_np(x, w[p + "pre_mlp_layernorm.weight"])
        if i == 0:
            ff = (_silu(h @ w[p + "mlp.gate_proj.weight"].T)
                  * (h @ w[p + "mlp.up_proj.weight"].T)
                  ) @ w[p + "mlp.down_proj.weight"].T
        else:
            experts = [
                (w[f"{p}mlp.experts.{e}.gate_proj.weight"].T,
                 w[f"{p}mlp.experts.{e}.up_proj.weight"].T,
                 w[f"{p}mlp.experts.{e}.down_proj.weight"].T)
                for e in range(E)
            ]
            ff = _moe_np(
                h, w[p + "mlp.router.gate.weight"].T, experts, TOPK,
                score="sigmoid", sel_bias=w[p + "mlp.expert_bias"],
                norm_w=True, w_scale=SCALE,
            )
            ff = ff + (
                _silu(h @ w[p + "mlp.shared_experts.gate_proj.weight"].T)
                * (h @ w[p + "mlp.shared_experts.up_proj.weight"].T)
            ) @ w[p + "mlp.shared_experts.down_proj.weight"].T
        ff = _rms_np(ff, w[p + "post_mlp_layernorm.weight"])
        x = x + ff
    x = _rms_np(x, w["model.norm.weight"])
    want = x @ w["lm_head.weight"].T
    np.testing.assert_allclose(got[0, :, :Vv], want, rtol=2e-3, atol=2e-3)
    np.testing.assert_array_equal(
        got[0, :, :Vv].argmax(-1), want.argmax(-1))


def test_mimo2_transcription(tmp_path):
    """MiMo-V2 (src/models/mimo2-iswa.cpp): per-layer SWA with its own
    rope base + fewer kv heads on SWA layers (heads_per_layer), learned
    attention sinks, partial rotary, sigmoid MoE + selection bias, dense
    lead layer."""
    rng = np.random.default_rng(51)
    Vv = 64
    WIN, ROT = 4, HD // 2
    KV_SWA = 1
    pat = [1, 0]
    w = {
        "model.embed_tokens.weight": rng.standard_normal(
            (Vv, D)).astype(np.float32) * 0.02,
        "model.norm.weight": _gain(rng, D),
        "lm_head.weight": _t2(rng, Vv, D),
    }
    for i in range(L):
        p = f"model.layers.{i}."
        kv_l = KV_SWA if pat[i] else KV
        w[p + "self_attn.q_proj.weight"] = _t2(rng, H * HD, D)
        w[p + "self_attn.k_proj.weight"] = _t2(rng, kv_l * HD, D)
        w[p + "self_attn.v_proj.weight"] = _t2(rng, kv_l * HD, D)
        w[p + "self_attn.o_proj.weight"] = _t2(rng, D, H * HD)
        w[p + "self_attn.attention_sink_bias"] = (
            rng.standard_normal(H).astype(np.float32) * 0.5)
        w[p + "input_layernorm.weight"] = _gain(rng, D)
        w[p + "post_attention_layernorm.weight"] = _gain(rng, D)
        if i == 0:  # dense lead (first_k_dense_replace=1)
            w[p + "mlp.gate_proj.weight"] = _t2(rng, FF * 2, D)
            w[p + "mlp.up_proj.weight"] = _t2(rng, FF * 2, D)
            w[p + "mlp.down_proj.weight"] = _t2(rng, D, FF * 2)
        else:
            w[p + "mlp.gate.weight"] = rng.standard_normal(
                (E, D)).astype(np.float32) * 0.1
            w[p + "mlp.gate.e_score_correction_bias"] = (
                rng.standard_normal(E).astype(np.float32) * 0.5)
            for e in range(E):
                q = f"{p}mlp.experts.{e}."
                w[q + "gate_proj.weight"] = _t2(rng, FF, D)
                w[q + "up_proj.weight"] = _t2(rng, FF, D)
                w[q + "down_proj.weight"] = _t2(rng, D, FF)
    cfgd = {
        "model_type": "mimo2", "architectures": ["MiMoV2FlashForCausalLM"],
        "vocab_size": Vv, "hidden_size": D, "num_hidden_layers": L,
        "num_attention_heads": H, "num_key_value_heads": KV,
        "head_dim": HD, "partial_rotary_factor": 0.5,
        "swa_num_key_value_heads": KV_SWA, "hybrid_layer_pattern": pat,
        "sliding_window": WIN, "swa_rope_theta": 1000.0,
        "intermediate_size": FF * 2, "moe_intermediate_size": FF,
        "n_routed_experts": E, "num_experts_per_tok": TOPK,
        "first_k_dense_replace": 1, "topk_method": "noaux_tc",
        "norm_topk_prob": True, "layernorm_epsilon": 1e-5,
        "rope_theta": 10000.0, "max_position_embeddings": 64,
        "tie_word_embeddings": False,
    }
    _write(tmp_path / "hf", cfgd, w)
    convert_hf(tmp_path / "hf", tmp_path / "out", dtype_hp="float32")
    toks = rng.integers(0, Vv, (1, 7))
    got, cfg = _our_logits(tmp_path / "out", toks)
    assert cfg.attn_sinks and cfg.rope_pct == 0.5
    assert tuple(map(tuple, cfg.heads_per_layer)) == ((H, KV_SWA), (H, KV))

    T = toks.shape[1]
    x = w["model.embed_tokens.weight"][toks[0]].astype(np.float64)
    pos = np.arange(T)
    for i in range(L):
        p = f"model.layers.{i}."
        kv_l = KV_SWA if pat[i] else KV
        theta = 1000.0 if pat[i] else 10000.0
        h = _rms_np(x, w[p + "input_layernorm.weight"])
        q = (h @ w[p + "self_attn.q_proj.weight"].T).reshape(T, H, HD)
        k = (h @ w[p + "self_attn.k_proj.weight"].T).reshape(T, kv_l, HD)
        v = (h @ w[p + "self_attn.v_proj.weight"].T).reshape(T, kv_l, HD)
        q = _rope_np(q, pos, theta, rot=ROT)
        k = _rope_np(k, pos, theta, rot=ROT)
        att = _attn_np(
            q, k, v, HD ** -0.5, window=WIN if pat[i] else 0,
            sinks=w[p + "self_attn.attention_sink_bias"],
        ).reshape(T, H * HD)
        x = x + att @ w[p + "self_attn.o_proj.weight"].T
        h = _rms_np(x, w[p + "post_attention_layernorm.weight"])
        if i == 0:
            ff = (_silu(h @ w[p + "mlp.gate_proj.weight"].T)
                  * (h @ w[p + "mlp.up_proj.weight"].T)
                  ) @ w[p + "mlp.down_proj.weight"].T
        else:
            experts = [
                (w[f"{p}mlp.experts.{e}.gate_proj.weight"].T,
                 w[f"{p}mlp.experts.{e}.up_proj.weight"].T,
                 w[f"{p}mlp.experts.{e}.down_proj.weight"].T)
                for e in range(E)
            ]
            ff = _moe_np(
                h, w[p + "mlp.gate.weight"].T, experts, TOPK,
                score="sigmoid",
                sel_bias=w[p + "mlp.gate.e_score_correction_bias"],
                norm_w=True,
            )
        x = x + ff
    x = _rms_np(x, w["model.norm.weight"])
    want = x @ w["lm_head.weight"].T
    np.testing.assert_allclose(got[0, :, :Vv], want, rtol=2e-3, atol=2e-3)
    np.testing.assert_array_equal(
        got[0, :, :Vv].argmax(-1), want.argmax(-1))


def test_openelm_transcription(tmp_path):
    """OpenELM (src/models/openelm.cpp): per-layer query/kv head counts
    and FFN widths (ffn_multipliers), fused [q;k;v] qkv, per-head q/k
    RMSNorm before rope, fused [gate|up] proj_1, tied embeddings."""
    rng = np.random.default_rng(61)
    Vv = 64
    NQH, NKV = [4, 2], [2, 1]
    DIV = 16
    FFD = [32, 64]  # _make_divisible(m * 32, 16) for m in [1.0, 2.0]
    w = {
        "transformer.token_embeddings.weight": rng.standard_normal(
            (Vv, D)).astype(np.float32) * 0.02,
        "transformer.norm.weight": _gain(rng, D),
    }
    for i in range(L):
        p = f"transformer.layers.{i}."
        nh, kv = NQH[i], NKV[i]
        w[p + "attn.qkv_proj.weight"] = _t2(rng, (nh + 2 * kv) * HD, D)
        w[p + "attn.out_proj.weight"] = _t2(rng, D, nh * HD)
        w[p + "attn.q_norm.weight"] = _gain(rng, HD)
        w[p + "attn.k_norm.weight"] = _gain(rng, HD)
        w[p + "attn_norm.weight"] = _gain(rng, D)
        w[p + "ffn_norm.weight"] = _gain(rng, D)
        w[p + "ffn.proj_1.weight"] = _t2(rng, 2 * FFD[i], D)
        w[p + "ffn.proj_2.weight"] = _t2(rng, D, FFD[i])
    cfgd = {
        "model_type": "openelm", "architectures": ["OpenELMForCausalLM"],
        "vocab_size": Vv, "model_dim": D, "num_transformer_layers": L,
        "num_query_heads": NQH, "num_kv_heads": NKV, "head_dim": HD,
        "ffn_multipliers": [1.0, 2.0], "ffn_dim_divisor": DIV,
        "rope_freq_constant": 10000.0, "max_context_length": 64,
        "share_input_output_layers": True,
    }
    _write(tmp_path / "hf", cfgd, w)
    convert_hf(tmp_path / "hf", tmp_path / "out", dtype_hp="float32")
    toks = rng.integers(0, Vv, (1, 7))
    got, cfg = _our_logits(tmp_path / "out", toks)
    assert tuple(map(tuple, cfg.heads_per_layer)) == ((4, 2), (2, 1))
    assert tuple(cfg.d_ff_per_layer) == (32, 64)

    T = toks.shape[1]
    emb = w["transformer.token_embeddings.weight"]
    x = emb[toks[0]].astype(np.float64)
    pos = np.arange(T)
    for i in range(L):
        p = f"transformer.layers.{i}."
        nh, kv = NQH[i], NKV[i]
        h = _rms_np(x, w[p + "attn_norm.weight"], eps=1e-6)
        qkv = h @ w[p + "attn.qkv_proj.weight"].T
        q = qkv[:, : nh * HD].reshape(T, nh, HD)
        k = qkv[:, nh * HD : (nh + kv) * HD].reshape(T, kv, HD)
        v = qkv[:, (nh + kv) * HD :].reshape(T, kv, HD)
        q = _rms_np(q, w[p + "attn.q_norm.weight"], eps=1e-6)
        k = _rms_np(k, w[p + "attn.k_norm.weight"], eps=1e-6)
        q = _rope_np(q, pos, 10000.0)
        k = _rope_np(k, pos, 10000.0)
        att = _attn_np(q, k, v, HD ** -0.5).reshape(T, nh * HD)
        x = x + att @ w[p + "attn.out_proj.weight"].T
        h = _rms_np(x, w[p + "ffn_norm.weight"], eps=1e-6)
        gu = h @ w[p + "ffn.proj_1.weight"].T
        ff = (_silu(gu[:, : FFD[i]]) * gu[:, FFD[i] :]
              ) @ w[p + "ffn.proj_2.weight"].T
        x = x + ff
    x = _rms_np(x, w["transformer.norm.weight"], eps=1e-6)
    want = x @ emb.T
    np.testing.assert_allclose(got[0, :, :Vv], want, rtol=2e-3, atol=2e-3)
    np.testing.assert_array_equal(
        got[0, :, :Vv].argmax(-1), want.argmax(-1))


def test_deci_transcription(tmp_path):
    """Deci / Llama-3_1-Nemotron (src/models/deci.cpp): per-block
    heterogeneity — normal GQA attention, replace_with_linear "attention"
    (wo on the normed input), attention-free blocks, and FFN-free blocks
    which the reference skips ENTIRELY (`if (n_ff == 0) continue;` — a
    no-op layer even when attention weights exist)."""
    rng = np.random.default_rng(71)
    Vv = 64
    LL = 4
    FFD = 256  # _ffn_mult_to_intermediate_size floor
    blocks = [
        {"attention": {"n_heads_in_group": 2, "no_op": False,
                       "replace_with_linear": False},
         "ffn": {"ffn_mult": 1.0, "no_op": False}},
        {"attention": {"n_heads_in_group": None, "no_op": False,
                       "replace_with_linear": True},
         "ffn": {"ffn_mult": 1.0, "no_op": False}},
        {"attention": {"n_heads_in_group": None, "no_op": True,
                       "replace_with_linear": False},
         "ffn": {"ffn_mult": 1.0, "no_op": False}},
        {"attention": {"n_heads_in_group": 2, "no_op": False,
                       "replace_with_linear": False},
         "ffn": {"ffn_mult": None, "no_op": True}},
    ]
    w = {
        "model.embed_tokens.weight": rng.standard_normal(
            (Vv, D)).astype(np.float32) * 0.02,
        "model.norm.weight": _gain(rng, D),
        "lm_head.weight": _t2(rng, Vv, D),
    }
    for i, bc in enumerate(blocks):
        p = f"model.layers.{i}."
        at = bc["attention"]
        if at["n_heads_in_group"] is not None:
            kv = H // at["n_heads_in_group"]
            w[p + "self_attn.q_proj.weight"] = _t2(rng, H * HD, D)
            w[p + "self_attn.k_proj.weight"] = _t2(rng, kv * HD, D)
            w[p + "self_attn.v_proj.weight"] = _t2(rng, kv * HD, D)
            w[p + "self_attn.o_proj.weight"] = _t2(rng, D, H * HD)
            w[p + "input_layernorm.weight"] = _gain(rng, D)
        elif at["replace_with_linear"]:
            w[p + "self_attn.linear_attn.weight"] = _t2(rng, D, D)
            w[p + "input_layernorm.weight"] = _gain(rng, D)
        if bc["ffn"]["ffn_mult"] is not None:
            w[p + "mlp.gate_proj.weight"] = _t2(rng, FFD, D)
            w[p + "mlp.up_proj.weight"] = _t2(rng, FFD, D)
            w[p + "mlp.down_proj.weight"] = _t2(rng, D, FFD)
            w[p + "post_attention_layernorm.weight"] = _gain(rng, D)
    cfgd = {
        "model_type": "nemotron-nas",
        "architectures": ["DeciLMForCausalLM"],
        "vocab_size": Vv, "hidden_size": D, "num_hidden_layers": LL,
        "num_attention_heads": H, "block_configs": blocks,
        "rms_norm_eps": 1e-5, "rope_theta": 10000.0,
        "max_position_embeddings": 64, "tie_word_embeddings": False,
        "intermediate_size": FFD,
    }
    _write(tmp_path / "hf", cfgd, w)
    convert_hf(tmp_path / "hf", tmp_path / "out", dtype_hp="float32")
    toks = rng.integers(0, Vv, (1, 7))
    got, cfg = _our_logits(tmp_path / "out", toks)
    assert tuple(map(tuple, cfg.heads_per_layer)) == (
        (4, 2), (4, 0), (0, 0), (4, 2))
    assert tuple(cfg.d_ff_per_layer) == (FFD, FFD, FFD, 0)

    T = toks.shape[1]
    x = w["model.embed_tokens.weight"][toks[0]].astype(np.float64)
    pos = np.arange(T)
    for i, bc in enumerate(blocks):
        p = f"model.layers.{i}."
        at = bc["attention"]
        if bc["ffn"]["ffn_mult"] is None:
            continue  # reference: whole block skipped (no-op layer)
        if at["n_heads_in_group"] is not None:
            kv = H // at["n_heads_in_group"]
            h = _rms_np(x, w[p + "input_layernorm.weight"])
            q = (h @ w[p + "self_attn.q_proj.weight"].T).reshape(T, H, HD)
            k = (h @ w[p + "self_attn.k_proj.weight"].T).reshape(T, kv, HD)
            v = (h @ w[p + "self_attn.v_proj.weight"].T).reshape(T, kv, HD)
            q = _rope_np(q, pos, 10000.0)
            k = _rope_np(k, pos, 10000.0)
            att = _attn_np(q, k, v, HD ** -0.5).reshape(T, H * HD)
            x = x + att @ w[p + "self_attn.o_proj.weight"].T
        elif at["replace_with_linear"]:
            h = _rms_np(x, w[p + "input_layernorm.weight"])
            x = x + h @ w[p + "self_attn.linear_attn.weight"].T
        h = _rms_np(x, w[p + "post_attention_layernorm.weight"])
        ff = (_silu(h @ w[p + "mlp.gate_proj.weight"].T)
              * (h @ w[p + "mlp.up_proj.weight"].T)
              ) @ w[p + "mlp.down_proj.weight"].T
        x = x + ff
    x = _rms_np(x, w["model.norm.weight"])
    want = x @ w["lm_head.weight"].T
    np.testing.assert_allclose(got[0, :, :Vv], want, rtol=2e-3, atol=2e-3)
    np.testing.assert_array_equal(
        got[0, :, :Vv].argmax(-1), want.argmax(-1))


def test_plamo3_transcription(tmp_path):
    """PLaMo-3 (src/models/plamo3.cpp): fused [q;k;v] qkv, per-head q/k
    norm and sandwich norms in the PLaMo offset parameterization (the
    converter folds +1 / +1/5 / +5^-1.5 offsets), fused-swiglu SEQ FFN,
    local rope theta on SWA layers."""
    rng = np.random.default_rng(81)
    Vv = 64
    WIN = 4
    swa = [True, False]  # sliding_window_pattern=2: every 2nd global
    w = {
        "model.embed_tokens.weight": rng.standard_normal(
            (Vv, D)).astype(np.float32) * 0.02,
        "model.norm.weight": _gain(rng, D) - 1.0,  # stored offset form
        "lm_head.weight": _t2(rng, Vv, D),
    }
    for i in range(L):
        p = f"model.layers.layers.{i}."
        w[p + "mixer.qkv_proj.weight"] = _t2(rng, (H + 2 * KV) * HD, D)
        w[p + "mixer.o_proj.weight"] = _t2(rng, D, H * HD)
        w[p + "mixer.q_norm.weight"] = _gain(rng, HD) - 1.0
        w[p + "mixer.k_norm.weight"] = _gain(rng, HD) - 1.0
        w[p + "pre_mixer_norm.weight"] = _gain(rng, D) - 1.0
        w[p + "post_mixer_norm.weight"] = _gain(rng, D) - 0.2
        w[p + "pre_mlp_norm.weight"] = _gain(rng, D) - 1.0
        w[p + "post_mlp_norm.weight"] = _gain(rng, D) - 5.0 ** -1.5
        w[p + "mlp.gate_up_proj.weight"] = _t2(rng, 2 * FF, D)
        w[p + "mlp.down_proj.weight"] = _t2(rng, D, FF)
    cfgd = {
        "model_type": "plamo3", "architectures": ["Plamo3ForCausalLM"],
        "vocab_size": Vv, "hidden_size": D, "num_hidden_layers": L,
        "num_attention_heads": H, "num_key_value_heads": KV,
        "head_dim": HD, "intermediate_size": FF,
        "window_size": WIN, "sliding_window_pattern": 2,
        "rope_theta": 10000.0, "rope_local_theta": 1000.0,
        "rms_norm_eps": 1e-5, "max_position_embeddings": 64,
        "tie_word_embeddings": False,
    }
    _write(tmp_path / "hf", cfgd, w)
    convert_hf(tmp_path / "hf", tmp_path / "out", dtype_hp="float32")
    toks = rng.integers(0, Vv, (1, 7))
    got, cfg = _our_logits(tmp_path / "out", toks)
    assert cfg.post_norms and cfg.rope_theta_local == 1000.0

    T = toks.shape[1]
    x = w["model.embed_tokens.weight"][toks[0]].astype(np.float64)
    pos = np.arange(T)
    for i in range(L):
        p = f"model.layers.layers.{i}."
        theta = 1000.0 if swa[i] else 10000.0
        h = _rms_np(x, w[p + "pre_mixer_norm.weight"] + 1.0)
        qkv = h @ w[p + "mixer.qkv_proj.weight"].T
        q = qkv[:, : H * HD].reshape(T, H, HD)
        k = qkv[:, H * HD : (H + KV) * HD].reshape(T, KV, HD)
        v = qkv[:, (H + KV) * HD :].reshape(T, KV, HD)
        q = _rms_np(q, w[p + "mixer.q_norm.weight"] + 1.0)
        k = _rms_np(k, w[p + "mixer.k_norm.weight"] + 1.0)
        q = _rope_np(q, pos, theta)
        k = _rope_np(k, pos, theta)
        att = _attn_np(q, k, v, HD ** -0.5,
                       window=WIN if swa[i] else 0).reshape(T, H * HD)
        o = att @ w[p + "mixer.o_proj.weight"].T
        o = _rms_np(o, w[p + "post_mixer_norm.weight"] + 0.2)
        x = x + o
        h = _rms_np(x, w[p + "pre_mlp_norm.weight"] + 1.0)
        gu = h @ w[p + "mlp.gate_up_proj.weight"].T
        ff = (_silu(gu[:, :FF]) * gu[:, FF:]
              ) @ w[p + "mlp.down_proj.weight"].T
        ff = _rms_np(ff, w[p + "post_mlp_norm.weight"] + 5.0 ** -1.5)
        x = x + ff
    x = _rms_np(x, w["model.norm.weight"] + 1.0)
    want = x @ w["lm_head.weight"].T
    np.testing.assert_allclose(got[0, :, :Vv], want, rtol=2e-3, atol=2e-3)
    np.testing.assert_array_equal(
        got[0, :, :Vv].argmax(-1), want.argmax(-1))


def test_neobert_transcription(tmp_path):
    """NeoBERT (src/models/neo-bert.cpp): RMS pre-norms, fused [q;k;v]
    qkv, rope, bidirectional attention, swiglu-fused w12/w3 FFN, final
    output_norm_enc — encoder family, hidden-state output."""
    from vlut_tpu.models.encoder import forward_encoder

    rng = np.random.default_rng(91)
    Vv = 64
    w = {
        "encoder.weight": rng.standard_normal(
            (Vv, D)).astype(np.float32) * 0.05,
        "layer_norm.weight": _gain(rng, D),
    }
    for i in range(L):
        p = f"transformer_encoder.{i}."
        w[p + "qkv.weight"] = _t2(rng, 3 * H * HD, D)
        w[p + "wo.weight"] = _t2(rng, D, H * HD)
        w[p + "attention_norm.weight"] = _gain(rng, D)
        w[p + "ffn_norm.weight"] = _gain(rng, D)
        w[p + "ffn.w12.weight"] = _t2(rng, 2 * FF, D)
        w[p + "ffn.w3.weight"] = _t2(rng, D, FF)
    cfgd = {
        "model_type": "neobert", "architectures": ["NeoBERT"],
        "vocab_size": Vv, "hidden_size": D, "num_hidden_layers": L,
        "num_attention_heads": H, "intermediate_size": FF,
        "norm_eps": 1e-5, "rope_theta": 10000.0, "max_length": 64,
    }
    _write(tmp_path / "hf", cfgd, w)
    convert_hf(tmp_path / "hf", tmp_path / "out", dtype_hp="float32")
    cfg, params, _ = load_checkpoint(tmp_path / "out")
    assert cfg.arch == "neobert"
    toks = rng.integers(0, Vv, (1, 7))
    T = toks.shape[1]
    mask = np.ones((1, T), np.int32)
    got = np.asarray(forward_encoder(
        params, cfg, jnp.asarray(toks, jnp.int32), jnp.asarray(mask)
    ), np.float32)

    x = w["encoder.weight"][toks[0]].astype(np.float64)
    pos = np.arange(T)
    for i in range(L):
        p = f"transformer_encoder.{i}."
        h = _rms_np(x, w[p + "attention_norm.weight"])
        qkv = h @ w[p + "qkv.weight"].T
        q = qkv[:, : H * HD].reshape(T, H, HD)
        k = qkv[:, H * HD : 2 * H * HD].reshape(T, H, HD)
        v = qkv[:, 2 * H * HD :].reshape(T, H, HD)
        q = _rope_np(q, pos, 10000.0)
        k = _rope_np(k, pos, 10000.0)
        # bidirectional attention
        att = np.zeros_like(q)
        for hh in range(H):
            sc = (q[:, hh] @ k[:, hh].T) * HD ** -0.5
            pp = np.exp(sc - sc.max(-1, keepdims=True))
            pp /= pp.sum(-1, keepdims=True)
            att[:, hh] = pp @ v[:, hh]
        x = x + att.reshape(T, H * HD) @ w[p + "wo.weight"].T
        h = _rms_np(x, w[p + "ffn_norm.weight"])
        wi = h @ w[p + "ffn.w12.weight"].T
        x = x + (_silu(wi[:, :FF]) * wi[:, FF:]) @ w[p + "ffn.w3.weight"].T
    want = _rms_np(x, w["layer_norm.weight"])
    np.testing.assert_allclose(got[0], want, rtol=2e-3, atol=2e-3)


def test_cogvlm_dual_expert(tmp_path):
    """CogVLM (src/models/cogvlm.cpp): llama body whose per-layer
    attention/FFN weights switch between a language-expert and a
    visual-expert set by batch kind.  Twin test: the cogvlm checkpoint's
    text path must equal a llama built from the language weights, and
    forward(visual_expert=True) must equal a llama built from the
    vision-expert weights (norms shared)."""
    rng = np.random.default_rng(101)
    Vv = 64
    KVm = H  # cogvlm is MHA

    def proj_set(seed):
        r = np.random.default_rng(seed)
        return {
            "q": _t2(r, H * HD, D), "k": _t2(r, KVm * HD, D),
            "v": _t2(r, KVm * HD, D), "o": _t2(r, D, H * HD),
            "g": _t2(r, FF, D), "u": _t2(r, FF, D), "d": _t2(r, D, FF),
        }

    shared = {
        "model.embed_tokens.weight": rng.standard_normal(
            (Vv, D)).astype(np.float32) * 0.02,
        "model.norm.weight": _gain(rng, D),
        "lm_head.weight": _t2(rng, Vv, D),
    }
    norms = {}
    lang, vis = {}, {}
    for i in range(L):
        norms[f"model.layers.{i}.input_layernorm.weight"] = _gain(rng, D)
        norms[f"model.layers.{i}.post_attention_layernorm.weight"] = (
            _gain(rng, D))
        lang[i] = proj_set(1000 + i)
        vis[i] = proj_set(2000 + i)

    def llama_ckpt(dirp, ps):
        t = {**shared, **norms}
        for i in range(L):
            p = f"model.layers.{i}."
            t[p + "self_attn.q_proj.weight"] = ps[i]["q"]
            t[p + "self_attn.k_proj.weight"] = ps[i]["k"]
            t[p + "self_attn.v_proj.weight"] = ps[i]["v"]
            t[p + "self_attn.o_proj.weight"] = ps[i]["o"]
            t[p + "mlp.gate_proj.weight"] = ps[i]["g"]
            t[p + "mlp.up_proj.weight"] = ps[i]["u"]
            t[p + "mlp.down_proj.weight"] = ps[i]["d"]
        _write(dirp, {
            "model_type": "llama", "architectures": ["LlamaForCausalLM"],
            "vocab_size": Vv, "hidden_size": D, "num_hidden_layers": L,
            "num_attention_heads": H, "num_key_value_heads": KVm,
            "intermediate_size": FF, "rms_norm_eps": 1e-5,
            "rope_theta": 10000.0, "max_position_embeddings": 64,
            "tie_word_embeddings": False,
        }, t)

    t = {**shared, **norms}
    for i in range(L):
        p = f"model.layers.{i}."
        t[p + "self_attn.language_expert_query_key_value.weight"] = (
            np.concatenate([lang[i]["q"], lang[i]["k"], lang[i]["v"]], 0))
        t[p + "self_attn.language_expert_dense.weight"] = lang[i]["o"]
        t[p + "mlp.language_mlp.gate_proj.weight"] = lang[i]["g"]
        t[p + "mlp.language_mlp.up_proj.weight"] = lang[i]["u"]
        t[p + "mlp.language_mlp.down_proj.weight"] = lang[i]["d"]
        t[p + "self_attn.vision_expert_query_key_value.weight"] = (
            np.concatenate([vis[i]["q"], vis[i]["k"], vis[i]["v"]], 0))
        t[p + "self_attn.vision_expert_dense.weight"] = vis[i]["o"]
        t[p + "mlp.vision_mlp.gate_proj.weight"] = vis[i]["g"]
        t[p + "mlp.vision_mlp.up_proj.weight"] = vis[i]["u"]
        t[p + "mlp.vision_mlp.down_proj.weight"] = vis[i]["d"]
    # a vision-tower tensor that must be dropped
    t["model.vision.patch_embedding.proj.weight"] = np.zeros(
        (8, 8), np.float32)
    _write(tmp_path / "cogvlm", {
        "model_type": "cogvlm", "architectures": ["CogVLMForCausalLM"],
        "vocab_size": Vv, "hidden_size": D, "num_hidden_layers": L,
        "num_attention_heads": H, "intermediate_size": FF,
        "rms_norm_eps": 1e-5, "rope_theta": 10000.0,
        "max_position_embeddings": 64, "tie_word_embeddings": False,
    }, t)
    llama_ckpt(tmp_path / "lang", lang)
    llama_ckpt(tmp_path / "visw", vis)
    convert_hf(tmp_path / "cogvlm", tmp_path / "out_c", dtype_hp="float32")
    convert_hf(tmp_path / "lang", tmp_path / "out_l", dtype_hp="float32")
    convert_hf(tmp_path / "visw", tmp_path / "out_v", dtype_hp="float32")

    toks = rng.integers(0, Vv, (1, 7))
    cfg_c, params_c, _ = load_checkpoint(tmp_path / "out_c")
    assert cfg_c.dual_expert
    pf_c = float_twin_params(params_c, cfg_c, dtype=jnp.float32)
    pos = jnp.arange(7, dtype=jnp.int32)[None]
    tk = jnp.asarray(toks, jnp.int32)
    got_text, _ = forward(pf_c, cfg_c, tk, pos, None, impl="xla")
    got_vis, _ = forward(pf_c, cfg_c, tk, pos, None, impl="xla",
                         visual_expert=True)
    want_text, _ = _our_logits(tmp_path / "out_l", toks)
    want_vis, _ = _our_logits(tmp_path / "out_v", toks)
    np.testing.assert_allclose(
        np.asarray(got_text), want_text, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(got_vis), want_vis, rtol=1e-5, atol=1e-5)
    assert not np.allclose(np.asarray(got_text), np.asarray(got_vis))

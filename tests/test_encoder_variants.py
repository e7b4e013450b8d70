"""Bert-variant encoders vs direct numpy transcriptions of the reference
graph (src/models/bert.cpp llm_build_bert): nomic-bert, nomic-bert-moe,
jina-bert-v2 (ALiBi + GEGLU), jina-bert-v3 (rope XLM-R + task LoRAs).

No HF classes exist for these (trust_remote_code models), so each test
hand-builds a safetensors checkpoint in the documented HF naming, converts
it, and checks logits against an independent numpy implementation of the
reference graph.
"""

import json

import numpy as np
import pytest
import jax.numpy as jnp

from vlut_tpu.convert.checkpoint import load_checkpoint
from vlut_tpu.convert.encoder import convert_encoder
from vlut_tpu.models.encoder import embed as encoder_embed
from vlut_tpu.models.encoder import forward_encoder

V, D, H, FF = 64, 32, 4, 48
HD = D // H


def _write(dirp, cfg, tensors):
    from safetensors.numpy import save_file

    dirp.mkdir(parents=True, exist_ok=True)
    (dirp / "config.json").write_text(json.dumps(cfg))
    save_file({k: np.ascontiguousarray(v, np.float32)
               for k, v in tensors.items()}, str(dirp / "model.safetensors"))


def _r(rng, *s):
    return (rng.standard_normal(s) * 0.1).astype(np.float32)


# ---------------------------------------------------------------------------
# numpy transcription of the reference post-LN bert builder
# ---------------------------------------------------------------------------

def np_ln(x, w, b, eps):
    x = x.astype(np.float64)
    mu = x.mean(-1, keepdims=True)
    xc = x - mu
    v = (xc * xc).mean(-1, keepdims=True)
    out = xc / np.sqrt(v + eps) * w
    return out + b if b is not None else out


def np_rope(x, theta):
    # NEOX split-half rope over the full head dim (x: (B, T, H, hd))
    B, T, H_, hd = x.shape
    inv = 1.0 / (theta ** (np.arange(0, hd, 2) / hd))
    ang = np.arange(T)[:, None] * inv[None]          # (T, hd/2)
    cos = np.cos(ang)[None, :, None, :]
    sin = np.sin(ang)[None, :, None, :]
    x1, x2 = x[..., : hd // 2], x[..., hd // 2:]
    return np.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], -1)


def np_attend(q, k, v, bias):
    # q/k/v: (B, T, H, hd); bias: (B or 1, H or 1, T, T)
    sc = np.einsum("bthd,bshd->bhts", q, k) / np.sqrt(q.shape[-1])
    sc = sc + bias
    sc = sc - sc.max(-1, keepdims=True)
    p = np.exp(sc)
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("bhts,bshd->bthd", p, v)


def np_gelu(x):
    from scipy.special import erf  # noqa: F401  (fallback below if absent)

    return 0.5 * x * (1.0 + erf(x / np.sqrt(2.0)))


try:
    import scipy.special  # noqa: F401
except ImportError:  # pragma: no cover
    def np_gelu(x):  # type: ignore[no-redef]
        import math

        from numpy import vectorize
        return 0.5 * x * (1.0 + vectorize(math.erf)(x / np.sqrt(2.0)))


def _toks(t=9, seed=5):
    rng = np.random.default_rng(seed)
    toks = rng.integers(0, V, (2, t))
    mask = np.ones((2, t), np.int64)
    mask[1, t - 2:] = 0  # ragged batch: padding must be masked out
    return toks, mask


def _run_jax(ckpt, toks, mask, task=None):
    cfg, params, _ = load_checkpoint(ckpt)
    import jax

    params = jax.tree.map(jnp.asarray, params)
    out = forward_encoder(params, cfg, jnp.asarray(toks, jnp.int32),
                          jnp.asarray(mask, jnp.int32), task=task)
    return cfg, np.asarray(out, np.float64)


def test_nomic_bert_transcription(tmp_path):
    """nomic-bert (reference LLM_ARCH_NOMIC_BERT, src/models/bert.cpp;
    converter NomicBertModel convert_hf_to_gguf.py:5550-5620): post-LN
    bert with fused no-bias Wqkv, full-head NEOX rope, parallel swiglu
    (fc12 = gate, fc11 = up), token-type embeddings, no positions."""
    rng = np.random.default_rng(41)
    L = 2
    t = {
        "embeddings.word_embeddings.weight": _r(rng, V, D),
        "embeddings.token_type_embeddings.weight": _r(rng, 2, D),
        "emb_ln.weight": np.abs(_r(rng, D)) + 0.5,
        "emb_ln.bias": _r(rng, D),
    }
    for i in range(L):
        p = f"encoder.layers.{i}."
        t[p + "attn.Wqkv.weight"] = _r(rng, 3 * D, D)
        t[p + "attn.out_proj.weight"] = _r(rng, D, D)
        t[p + "norm1.weight"] = np.abs(_r(rng, D)) + 0.5
        t[p + "norm1.bias"] = _r(rng, D)
        t[p + "norm2.weight"] = np.abs(_r(rng, D)) + 0.5
        t[p + "norm2.bias"] = _r(rng, D)
        t[p + "mlp.fc11.weight"] = _r(rng, FF, D)
        t[p + "mlp.fc12.weight"] = _r(rng, FF, D)
        t[p + "mlp.fc2.weight"] = _r(rng, D, FF)
    cfg_raw = {
        "model_type": "nomic_bert", "architectures": ["NomicBertModel"],
        "vocab_size": V, "n_embd": D, "n_layer": L, "n_head": H,
        "n_inner": FF, "layer_norm_epsilon": 1e-12,
        "rotary_emb_base": 1000.0, "rotary_emb_fraction": 1.0,
        "n_positions": 8192, "max_trained_positions": 2048,
        "activation_function": "swiglu", "causal": False,
    }
    _write(tmp_path / "hf", cfg_raw, t)
    cfg = convert_encoder(tmp_path / "hf", tmp_path / "out")
    assert cfg.arch == "nomic-bert" and cfg.rope and not cfg.alibi
    assert cfg.max_seq_len == 2048 and cfg.rope_theta_global == 1000.0
    assert cfg.ffn_kind == "swiglu_par"

    toks, mask = _toks()
    _, got = _run_jax(tmp_path / "out", toks, mask)

    x = t["embeddings.word_embeddings.weight"][toks].astype(np.float64)
    x = x + t["embeddings.token_type_embeddings.weight"][0]
    x = np_ln(x, t["emb_ln.weight"], t["emb_ln.bias"], 1e-12)
    B, T = toks.shape
    bias = np.where(mask[:, None, None, :] > 0, 0.0, -1e30)
    for i in range(L):
        p = f"encoder.layers.{i}."
        qkv = x @ t[p + "attn.Wqkv.weight"].T
        q, k, v = np.split(qkv, 3, axis=-1)
        q = np_rope(q.reshape(B, T, H, HD), 1000.0)
        k = np_rope(k.reshape(B, T, H, HD), 1000.0)
        att = np_attend(q, k, v.reshape(B, T, H, HD), bias)
        o = att.reshape(B, T, D) @ t[p + "attn.out_proj.weight"].T
        x = np_ln(x + o, t[p + "norm1.weight"], t[p + "norm1.bias"], 1e-12)
        g = x @ t[p + "mlp.fc12.weight"].T
        up = x @ t[p + "mlp.fc11.weight"].T
        dn = (g / (1 + np.exp(-g)) * up) @ t[p + "mlp.fc2.weight"].T
        x = np_ln(x + dn, t[p + "norm2.weight"], t[p + "norm2.bias"],
                  1e-12)
    np.testing.assert_allclose(got, x, rtol=2e-4, atol=2e-5)


def test_nomic_bert_moe_transcription(tmp_path):
    """nomic-bert-moe (LLM_ARCH_NOMIC_BERT_MOE): GELU-seq dense layers
    with biases; MoE on layers i % moe_every == 1 — softmax router, top-k
    WITHOUT renormalization (build_moe_ffn norm_w=false), GELU up/down
    experts from the flat (E*ff, D) w1/w2 stacks."""
    rng = np.random.default_rng(42)
    L, E, K = 2, 4, 2
    t = {
        "embeddings.word_embeddings.weight": _r(rng, V, D),
        "embeddings.token_type_embeddings.weight": _r(rng, 2, D),
        "emb_ln.weight": np.abs(_r(rng, D)) + 0.5,
        "emb_ln.bias": _r(rng, D),
    }
    for i in range(L):
        p = f"encoder.layers.{i}."
        t[p + "attn.Wqkv.weight"] = _r(rng, 3 * D, D)
        t[p + "attn.Wqkv.bias"] = _r(rng, 3 * D)
        t[p + "attn.out_proj.weight"] = _r(rng, D, D)
        t[p + "attn.out_proj.bias"] = _r(rng, D)
        t[p + "norm1.weight"] = np.abs(_r(rng, D)) + 0.5
        t[p + "norm1.bias"] = _r(rng, D)
        t[p + "norm2.weight"] = np.abs(_r(rng, D)) + 0.5
        t[p + "norm2.bias"] = _r(rng, D)
    t["encoder.layers.0.mlp.fc1.weight"] = _r(rng, FF, D)
    t["encoder.layers.0.mlp.fc1.bias"] = _r(rng, FF)
    t["encoder.layers.0.mlp.fc2.weight"] = _r(rng, D, FF)
    t["encoder.layers.0.mlp.fc2.bias"] = _r(rng, D)
    t["encoder.layers.1.mlp.router.layer.weight"] = _r(rng, E, D)
    t["encoder.layers.1.mlp.experts.mlp.w1"] = _r(rng, E * FF, D)
    t["encoder.layers.1.mlp.experts.mlp.w2"] = _r(rng, E * FF, D)
    cfg_raw = {
        "model_type": "nomic_bert", "architectures": ["NomicBertModel"],
        "vocab_size": V, "n_embd": D, "n_layer": L, "n_head": H,
        "n_inner": FF, "layer_norm_epsilon": 1e-12,
        "rotary_emb_base": 10000.0, "moe_every_n_layers": 2,
        "num_experts": E, "moe_top_k": K,
        "n_positions": 2048, "max_trained_positions": 2048,
        "activation_function": "gelu", "causal": False,
    }
    _write(tmp_path / "hf", cfg_raw, t)
    cfg = convert_encoder(tmp_path / "hf", tmp_path / "out")
    assert cfg.arch == "nomic-bert-moe" and cfg.moe_every == 2
    assert cfg.n_experts == E and cfg.max_seq_len == 512

    toks, mask = _toks(seed=6)
    _, got = _run_jax(tmp_path / "out", toks, mask)

    x = t["embeddings.word_embeddings.weight"][toks].astype(np.float64)
    x = x + t["embeddings.token_type_embeddings.weight"][0]
    x = np_ln(x, t["emb_ln.weight"], t["emb_ln.bias"], 1e-12)
    B, T = toks.shape
    bias = np.where(mask[:, None, None, :] > 0, 0.0, -1e30)
    for i in range(L):
        p = f"encoder.layers.{i}."
        qkv = x @ t[p + "attn.Wqkv.weight"].T + t[p + "attn.Wqkv.bias"]
        q, k, v = np.split(qkv, 3, axis=-1)
        q = np_rope(q.reshape(B, T, H, HD), 10000.0)
        k = np_rope(k.reshape(B, T, H, HD), 10000.0)
        att = np_attend(q, k, v.reshape(B, T, H, HD), bias)
        o = (att.reshape(B, T, D) @ t[p + "attn.out_proj.weight"].T
             + t[p + "attn.out_proj.bias"])
        x = np_ln(x + o, t[p + "norm1.weight"], t[p + "norm1.bias"], 1e-12)
        if i % 2 == 1:  # MoE layer
            logits = x @ t[p + "mlp.router.layer.weight"].T
            e_ = np.exp(logits - logits.max(-1, keepdims=True))
            scores = e_ / e_.sum(-1, keepdims=True)
            top_i = np.argsort(-scores, axis=-1)[..., :K]
            top_w = np.take_along_axis(scores, top_i, axis=-1)  # no renorm
            comb = np.zeros_like(scores)
            np.put_along_axis(comb, top_i, top_w, axis=-1)
            w1 = t[p + "mlp.experts.mlp.w1"].reshape(E, FF, D)
            w2 = t[p + "mlp.experts.mlp.w2"].reshape(E, FF, D)
            dn = np.zeros_like(x)
            for e in range(E):
                dn += comb[..., e, None] * (np_gelu(x @ w1[e].T) @ w2[e])
        else:
            up = x @ t[p + "mlp.fc1.weight"].T + t[p + "mlp.fc1.bias"]
            dn = np_gelu(up) @ t[p + "mlp.fc2.weight"].T \
                + t[p + "mlp.fc2.bias"]
        x = np_ln(x + dn, t[p + "norm2.weight"], t[p + "norm2.bias"],
                  1e-12)
    np.testing.assert_allclose(got, x, rtol=2e-4, atol=2e-5)


def test_jina_bert_v2_transcription(tmp_path):
    """jina-bert-v2 (LLM_ARCH_JINA_BERT_V2: f_max_alibi_bias=8, GEGLU
    parallel FFN with fused [gate; up], per-layer q/k LayerNorms, all
    post-LN; converter JinaBertV2Model)."""
    rng = np.random.default_rng(43)
    L = 2
    t = {
        "embeddings.word_embeddings.weight": _r(rng, V, D),
        "embeddings.token_type_embeddings.weight": _r(rng, 2, D),
        "embeddings.LayerNorm.weight": np.abs(_r(rng, D)) + 0.5,
        "embeddings.LayerNorm.bias": _r(rng, D),
    }
    for i in range(L):
        p = f"encoder.layer.{i}."
        for nm in ("query", "key", "value"):
            t[p + f"attention.self.{nm}.weight"] = _r(rng, D, D)
            t[p + f"attention.self.{nm}.bias"] = _r(rng, D)
        t[p + "attention.self.layer_norm_q.weight"] = (
            np.abs(_r(rng, D)) + 0.5)
        t[p + "attention.self.layer_norm_q.bias"] = _r(rng, D)
        t[p + "attention.self.layer_norm_k.weight"] = (
            np.abs(_r(rng, D)) + 0.5)
        t[p + "attention.self.layer_norm_k.bias"] = _r(rng, D)
        t[p + "attention.output.dense.weight"] = _r(rng, D, D)
        t[p + "attention.output.dense.bias"] = _r(rng, D)
        t[p + "attention.output.LayerNorm.weight"] = (
            np.abs(_r(rng, D)) + 0.5)
        t[p + "attention.output.LayerNorm.bias"] = _r(rng, D)
        t[p + "mlp.gated_layers.weight"] = _r(rng, 2 * FF, D)
        t[p + "mlp.wo.weight"] = _r(rng, D, FF)
        t[p + "mlp.wo.bias"] = _r(rng, D)
        t[p + "mlp.layernorm.weight"] = np.abs(_r(rng, D)) + 0.5
        t[p + "mlp.layernorm.bias"] = _r(rng, D)
    cfg_raw = {
        "model_type": "bert", "architectures": ["JinaBertForMaskedLM"],
        "vocab_size": V, "hidden_size": D, "num_hidden_layers": L,
        "num_attention_heads": H, "intermediate_size": FF,
        "layer_norm_eps": 1e-12, "feed_forward_type": "geglu",
        "max_position_embeddings": 8192,
    }
    _write(tmp_path / "hf", cfg_raw, t)
    cfg = convert_encoder(tmp_path / "hf", tmp_path / "out")
    assert cfg.arch == "jina-bert-v2" and cfg.alibi and not cfg.rope
    assert cfg.ffn_kind == "geglu"

    toks, mask = _toks(seed=7)
    _, got = _run_jax(tmp_path / "out", toks, mask)

    from vlut_tpu.models.transformer import alibi_slopes

    x = t["embeddings.word_embeddings.weight"][toks].astype(np.float64)
    x = x + t["embeddings.token_type_embeddings.weight"][0]
    x = np_ln(x, t["embeddings.LayerNorm.weight"],
              t["embeddings.LayerNorm.bias"], 1e-12)
    B, T = toks.shape
    sl = alibi_slopes(H).astype(np.float64)
    rel = np.abs(np.arange(T)[:, None] - np.arange(T)[None, :])
    bias = (np.where(mask[:, None, None, :] > 0, 0.0, -1e30)
            - sl[None, :, None, None] * rel[None, None])
    for i in range(L):
        p = f"encoder.layer.{i}."
        q = x @ t[p + "attention.self.query.weight"].T \
            + t[p + "attention.self.query.bias"]
        k = x @ t[p + "attention.self.key.weight"].T \
            + t[p + "attention.self.key.bias"]
        v = x @ t[p + "attention.self.value.weight"].T \
            + t[p + "attention.self.value.bias"]
        q = np_ln(q, t[p + "attention.self.layer_norm_q.weight"],
                  t[p + "attention.self.layer_norm_q.bias"], 1e-12)
        k = np_ln(k, t[p + "attention.self.layer_norm_k.weight"],
                  t[p + "attention.self.layer_norm_k.bias"], 1e-12)
        att = np_attend(q.reshape(B, T, H, HD), k.reshape(B, T, H, HD),
                        v.reshape(B, T, H, HD), bias)
        o = (att.reshape(B, T, D) @ t[p + "attention.output.dense.weight"].T
             + t[p + "attention.output.dense.bias"])
        x = np_ln(x + o, t[p + "attention.output.LayerNorm.weight"],
                  t[p + "attention.output.LayerNorm.bias"], 1e-12)
        z = x @ t[p + "mlp.gated_layers.weight"].T
        dn = (np_gelu(z[..., :FF]) * z[..., FF:]) @ t[p + "mlp.wo.weight"].T \
            + t[p + "mlp.wo.bias"]
        x = np_ln(x + dn, t[p + "mlp.layernorm.weight"],
                  t[p + "mlp.layernorm.bias"], 1e-12)
    np.testing.assert_allclose(got, x, rtol=2e-4, atol=2e-5)


def test_jina_bert_v3_task_loras(tmp_path):
    """jina-bert-v3 (LLM_ARCH_JINA_BERT_V3; converter XLMRobertaModel with
    lora_adaptations, convert_hf_to_gguf.py:5663-5760): rope XLM-R body
    (mixer.Wqkv flash scheme), GELU-seq FFN, '.parametrizations.weight.
    original' base tensors + stacked per-task lora_A/lora_B.  task=None
    serves the base weights; task='retrieval' must equal the manual
    base + (alpha/r) * B@A delta."""
    rng = np.random.default_rng(44)
    L, R = 1, 4
    tasks = ["retrieval", "classification"]
    alpha = 4.0
    p = "encoder.layers.0."
    t = {
        "embeddings.word_embeddings.weight": _r(rng, V, D),
        "emb_ln.weight": np.abs(_r(rng, D)) + 0.5,
        "emb_ln.bias": _r(rng, D),
        # parametrized attention projection: base + per-task loras
        p + "mixer.Wqkv.parametrizations.weight.original":
            _r(rng, 3 * D, D),
        p + "mixer.Wqkv.parametrizations.weight.0.lora_A":
            _r(rng, len(tasks), R, D),
        p + "mixer.Wqkv.parametrizations.weight.0.lora_B":
            _r(rng, len(tasks), 3 * D, R),
        p + "mixer.out_proj.weight": _r(rng, D, D),
        p + "norm1.weight": np.abs(_r(rng, D)) + 0.5,
        p + "norm1.bias": _r(rng, D),
        p + "norm2.weight": np.abs(_r(rng, D)) + 0.5,
        p + "norm2.bias": _r(rng, D),
        p + "mlp.fc1.weight": _r(rng, FF, D),
        p + "mlp.fc2.weight": _r(rng, D, FF),
    }
    cfg_raw = {
        "model_type": "xlm-roberta",
        "architectures": ["XLMRobertaModel"],
        "vocab_size": V, "hidden_size": D, "num_hidden_layers": L,
        "num_attention_heads": H, "intermediate_size": FF,
        "layer_norm_eps": 1e-5, "rotary_emb_base": 10000.0,
        "lora_adaptations": tasks, "lora_alpha": alpha,
        "max_position_embeddings": 8194,
    }
    _write(tmp_path / "hf", cfg_raw, t)
    cfg = convert_encoder(tmp_path / "hf", tmp_path / "out")
    assert cfg.arch == "jina-bert-v3" and cfg.rope
    assert cfg.lora_tasks == ("retrieval", "classification")
    assert cfg.lora_alpha == alpha

    toks, mask = _toks(seed=8)
    _, base = _run_jax(tmp_path / "out", toks, mask, task=None)
    _, adapted = _run_jax(tmp_path / "out", toks, mask, task="retrieval")
    assert not np.allclose(base, adapted)
    with pytest.raises(KeyError):
        _run_jax(tmp_path / "out", toks, mask, task="nope")

    # manual: fold task-0's delta into Wqkv and rebuild WITHOUT loras
    A = t[p + "mixer.Wqkv.parametrizations.weight.0.lora_A"][0]
    Bm = t[p + "mixer.Wqkv.parametrizations.weight.0.lora_B"][0]
    t2 = {k: v for k, v in t.items() if ".parametrizations." not in k}
    t2[p + "mixer.Wqkv.weight"] = (
        t[p + "mixer.Wqkv.parametrizations.weight.original"]
        + (alpha / R) * (Bm @ A))
    cfg_raw2 = dict(cfg_raw)
    del cfg_raw2["lora_adaptations"]
    cfg_raw2["model_type"] = "nomic_bert"
    cfg_raw2.update(n_embd=D, n_layer=L, n_head=H, n_inner=FF,
                    layer_norm_epsilon=1e-5,
                    n_positions=2048, max_trained_positions=2048,
                    activation_function="gelu", moe_every_n_layers=0)
    # nomic's dense path is swiglu; force gelu-seq by reusing fc1/fc2 only
    _write(tmp_path / "hf2", cfg_raw2, t2)
    cfg2 = convert_encoder(tmp_path / "hf2", tmp_path / "out2")
    assert cfg2.ffn_kind == "swiglu_par"  # config says so, but...
    # ...the layer has no w_gate, so the forward falls back to gelu-seq,
    # matching the jina-v3 FFN — both run mlp.fc1 -> gelu -> mlp.fc2
    _, want = _run_jax(tmp_path / "out2", toks, mask)
    np.testing.assert_allclose(adapted, want, rtol=2e-4, atol=2e-5)

    # pooled-embedding entry point with task routing
    c3, params, _ = load_checkpoint(tmp_path / "out")
    import jax

    params = jax.tree.map(jnp.asarray, params)
    e = encoder_embed(params, c3, jnp.asarray(toks, jnp.int32),
                      jnp.asarray(mask, jnp.int32), task="classification")
    assert e.shape == (2, D)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(e), axis=-1), 1.0, rtol=1e-5)

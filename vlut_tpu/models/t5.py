"""T5 encoder-decoder (reference: src/models/t5-enc.cpp, t5-dec.cpp).

The reference builds two graphs — a bidirectional encoder with relative
position buckets and a causal decoder with cross-attention over the
encoder output — selected by `llama_model_has_encoder` /
`llama_encode` + `llama_decode` (include/llama.h encoder API).  Here the
same split is two jittable functions: ``encode`` and ``decode_logits``
(full-sequence teacher-forced decode), plus a host-side ``generate`` loop.

T5 math quirks preserved exactly:
- T5LayerNorm is RMS (no mean centering), eps 1e-6.
- Attention scores are NOT scaled by 1/sqrt(d_kv).
- Relative position bias: bucketed log-spaced distances, embedding lives
  on block 0 of each stack and is shared by all blocks.
- With tied embeddings the LM head rescales by d_model**-0.5.
- The inner attention width is n_heads * d_kv, which may differ from
  d_model (T5-small: 512 model, 64 kv, 8 heads).

Weights stay dense (bf16/f32) like the encoder family: public T5
checkpoints are never ternary.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int
    d_model: int
    d_kv: int
    d_ff: int
    n_layers: int          # encoder blocks
    n_dec_layers: int      # decoder blocks
    n_heads: int
    rel_buckets: int = 32
    rel_max_distance: int = 128
    ln_eps: float = 1e-6
    gated: bool = True     # t5 v1.1 / flan gated act; False = classic relu
    act: str = "gelu"      # dense_act_fn (gelu_new -> tanh gelu) | "relu"
    tie_embeddings: bool = True
    decoder_start_token_id: int = 0
    eos_id: int = 1
    max_seq_len: int = 512


def _rms(x, w, eps):
    x = x.astype(jnp.float32)
    v = (x * x).mean(-1, keepdims=True)
    return x * jax.lax.rsqrt(v + eps) * w


def _rel_bucket(rel: jax.Array, bidirectional: bool, n_buckets: int,
                max_dist: int) -> jax.Array:
    """HF T5Attention._relative_position_bucket (rel = mem_pos - q_pos)."""
    ret = jnp.zeros_like(rel)
    n = n_buckets
    if bidirectional:
        n = n // 2
        ret = ret + (rel > 0).astype(jnp.int32) * n
        rel_abs = jnp.abs(rel)
    else:
        rel_abs = jnp.maximum(-rel, 0)
    max_exact = n // 2
    is_small = rel_abs < max_exact
    log_big = max_exact + (
        jnp.log(jnp.maximum(rel_abs, 1).astype(jnp.float32) / max_exact)
        / np.log(max_dist / max_exact) * (n - max_exact)
    ).astype(jnp.int32)
    log_big = jnp.minimum(log_big, n - 1)
    return ret + jnp.where(is_small, rel_abs, log_big)


def _rel_bias(bias_embed: jax.Array, q_len: int, k_len: int,
              bidirectional: bool, n_buckets: int, max_dist: int):
    """(buckets, H) embedding -> (1, H, q_len, k_len) additive bias."""
    ctx = jnp.arange(q_len)[:, None]
    mem = jnp.arange(k_len)[None, :]
    buckets = _rel_bucket(mem - ctx, bidirectional, n_buckets, max_dist)
    vals = bias_embed[buckets]                      # (q, k, H)
    return jnp.transpose(vals, (2, 0, 1))[None]     # (1, H, q, k)


def _attn(q, k, v, bias):
    """(B, T, H, d) x (B, S, H, d); bias (B|1, H, T, S).  UNSCALED."""
    sc = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32),
                    k.astype(jnp.float32)) + bias
    p = jax.nn.softmax(sc, axis=-1)
    return jnp.einsum("bhts,bshd->bthd", p, v.astype(jnp.float32))


def _proj_heads(x, w, H):
    y = x @ w
    return y.reshape(*x.shape[:-1], H, -1)


def _mlp(x, lp, cfg):
    h = _rms(x, lp["ffn_norm"], cfg.ln_eps)
    if cfg.gated:
        g = h @ lp["wi0"]
        u = h @ lp["wi1"]
        act = (jax.nn.gelu(g, approximate=True) if cfg.act == "gelu"
               else jax.nn.relu(g))
        a = act * u
    else:
        a = jax.nn.relu(h @ lp["wi"])
    return x + a @ lp["wo_ffn"]


def encode(params: dict[str, Any], cfg: T5Config, tokens: jax.Array,
           mask: jax.Array) -> jax.Array:
    """Bidirectional encoder: (B, T) -> (B, T, D) float32."""
    x = params["embed"][tokens].astype(jnp.float32)
    T = tokens.shape[1]
    pad = jnp.where(mask[:, None, None, :] > 0, 0.0, -1e30)
    bias = _rel_bias(params["enc_rel_bias"], T, T, True,
                     cfg.rel_buckets, cfg.rel_max_distance) + pad
    H = cfg.n_heads

    def block(x, lp):
        h = _rms(x, lp["attn_norm"], cfg.ln_eps)
        q = _proj_heads(h, lp["wq"], H)
        k = _proj_heads(h, lp["wk"], H)
        v = _proj_heads(h, lp["wv"], H)
        att = _attn(q, k, v, bias).reshape(*x.shape[:-1], -1)
        x = x + att @ lp["wo"]
        return _mlp(x, lp, cfg), None

    x, _ = jax.lax.scan(block, x, params["enc_layers"])
    return _rms(x, params["enc_final_norm"], cfg.ln_eps)


def decode_logits(
    params: dict[str, Any], cfg: T5Config,
    dec_tokens: jax.Array,       # (B, T_dec)
    enc_out: jax.Array,          # (B, T_enc, D)
    enc_mask: jax.Array,         # (B, T_enc)
) -> jax.Array:
    """Teacher-forced decoder pass -> (B, T_dec, V) logits."""
    B, T = dec_tokens.shape
    x = params["embed"][dec_tokens].astype(jnp.float32)
    causal = jnp.where(
        jnp.arange(T)[None, :] <= jnp.arange(T)[:, None], 0.0, -1e30
    )[None, None]
    self_bias = _rel_bias(params["dec_rel_bias"], T, T, False,
                          cfg.rel_buckets, cfg.rel_max_distance) + causal
    cross_bias = jnp.where(enc_mask[:, None, None, :] > 0, 0.0, -1e30)
    H = cfg.n_heads

    def block(x, lp):
        h = _rms(x, lp["attn_norm"], cfg.ln_eps)
        q = _proj_heads(h, lp["wq"], H)
        k = _proj_heads(h, lp["wk"], H)
        v = _proj_heads(h, lp["wv"], H)
        att = _attn(q, k, v, self_bias).reshape(*x.shape[:-1], -1)
        x = x + att @ lp["wo"]
        h = _rms(x, lp["cross_norm"], cfg.ln_eps)
        q = _proj_heads(h, lp["cross_wq"], H)
        ck = _proj_heads(enc_out, lp["cross_wk"], H)
        cv = _proj_heads(enc_out, lp["cross_wv"], H)
        att = _attn(q, ck, cv, cross_bias).reshape(*x.shape[:-1], -1)
        x = x + att @ lp["cross_wo"]
        return _mlp(x, lp, cfg), None

    x, _ = jax.lax.scan(block, x, params["dec_layers"])
    x = _rms(x, params["dec_final_norm"], cfg.ln_eps)
    head = params.get("lm_head")
    if head is None:
        # tied: T5 rescales by d_model**-0.5 before the shared embedding
        x = x * (cfg.d_model ** -0.5)
        head = params["embed"].T
    return x @ head


def generate(
    params: dict[str, Any], cfg: T5Config,
    enc_tokens: np.ndarray, n_new: int = 32, temp: float = 0.0,
    seed: int = 0,
) -> list[int]:
    """Host greedy/sampled seq2seq generation (full-recompute decoder:
    parity-first; T5 checkpoints are small)."""
    enc_tokens = np.atleast_2d(np.asarray(enc_tokens, np.int32))
    mask = np.ones_like(enc_tokens)
    enc_out = encode(params, cfg, jnp.asarray(enc_tokens),
                     jnp.asarray(mask))
    out = [cfg.decoder_start_token_id]
    key = jax.random.PRNGKey(seed)
    for _ in range(n_new):
        dec = jnp.asarray(np.asarray(out, np.int32)[None])
        logits = decode_logits(params, cfg, dec, enc_out,
                               jnp.asarray(mask))[0, -1]
        if temp > 0:
            key, sub = jax.random.split(key)
            nxt = int(jax.random.categorical(sub, logits / temp))
        else:
            nxt = int(jnp.argmax(logits))
        out.append(nxt)
        if nxt == cfg.eos_id:
            break
    return out[1:]

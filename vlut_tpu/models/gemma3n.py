"""Gemma3n text model (MatFormer E2B/E4B): AltUp multi-stream residuals,
LAuReL low-rank augmented residual, per-layer input embeddings, activation
sparsity, KV sharing for the tail layers, 5:1 local/global SWA pattern.

Reference graph: /root/reference/src/models/gemma3n-iswa.cpp (altup_predict
/ altup_correct / laurel / gaussian_topk / project_per_layer_inputs,
n_layer_kv_from_start=20 KV reuse); converter Gemma3NModel
(convert_hf_to_gguf.py:6033).  The forward here is a full-sequence
(cache-less) graph: KV sharing is expressed directly — tail layers reuse
the K/V computed by the LAST non-shared layer of the same attention type,
exactly the reference's layer_reuse_cb (llama-model.cpp:7397-7404).

Weights are stored (in, out); all math in float32.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Gemma3nConfig:
    vocab_size: int
    d_model: int
    n_layers: int
    n_heads: int
    n_kv_heads: int
    head_dim: int
    d_ff: tuple[int, ...]            # per layer (MatFormer)
    layer_types: tuple[str, ...]     # "sliding_attention" | "full_attention"
    sliding_window: int = 512
    rms_eps: float = 1e-6
    rope_theta: float = 1000000.0
    rope_theta_local: float = 10000.0
    n_altup: int = 4
    altup_active: int = 0
    altup_correct_scale: bool = True
    laurel_rank: int = 64
    pl_dim: int = 256                # hidden_size_per_layer_input
    pl_vocab: int = 262144           # vocab_size_per_layer_input
    n_kv_shared: int = 0             # num_kv_shared_layers (tail)
    sparsity: tuple[float, ...] = () # activation_sparsity_pattern per layer
    logit_softcap: float = 30.0
    max_seq_len: int = 32768
    arch: str = "gemma3n"


def _rms(x, w, eps):
    xf = x.astype(jnp.float32)
    ss = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jax.lax.rsqrt(ss + eps)
    return out * w if w is not None else out


def _rope(x, pos, theta):
    # NEOX full-head rope (HF Gemma3nTextRotaryEmbedding + rotate_half)
    hd = x.shape[-1]
    inv = 1.0 / (theta ** (jnp.arange(0, hd, 2, dtype=jnp.float32)
                           / hd))
    ang = pos[:, :, None].astype(jnp.float32) * inv  # (B, T, hd/2)
    cos = jnp.concatenate([jnp.cos(ang)] * 2, -1)[:, :, None, :]
    sin = jnp.concatenate([jnp.sin(ang)] * 2, -1)[:, :, None, :]
    x1, x2 = x[..., : hd // 2], x[..., hd // 2:]
    rot = jnp.concatenate([-x2, x1], -1)
    return x * cos + rot * sin


# icdf of the standard normal via the inverse error function (the
# activation-sparsity cutoff; reference f_sparsity_std_mul)
def _norm_ppf(p: float) -> float:
    from math import sqrt

    try:
        from scipy.special import erfinv

        return float(sqrt(2.0) * erfinv(2.0 * p - 1.0))
    except ImportError:  # pragma: no cover
        import statistics

        return statistics.NormalDist().inv_cdf(p)


def _gaussian_topk(x, p: float):
    """relu(x - (mean + std * icdf(p))), std biased (HF unbiased=False)."""
    mu = x.mean(-1, keepdims=True)
    std = jnp.sqrt(((x - mu) ** 2).mean(-1, keepdims=True))
    return jax.nn.relu(x - (mu + std * _norm_ppf(p)))


def _magnitude(x, clamp: bool):
    m = jnp.mean(x * x, axis=-1, keepdims=True)
    if clamp:
        m = jnp.maximum(m, 1e-5)
    return jnp.sqrt(m)


def forward(
    params: dict[str, Any],
    cfg: Gemma3nConfig,
    tokens: jax.Array,      # (B, T) int32
) -> jax.Array:
    """Full-sequence causal logits (B, T, V), float32."""
    B, T = tokens.shape
    D, n_alt, act = cfg.d_model, cfg.n_altup, cfg.altup_active
    pos = jnp.tile(jnp.arange(T, dtype=jnp.int32)[None], (B, 1))

    x0 = params["embed"][tokens].astype(jnp.float32) * np.sqrt(D)

    # per-layer inputs: scaled per-layer embedding + projected main
    # embedding, summed and scaled 1/sqrt(2)
    plin = params["embed_per_layer"][tokens].astype(jnp.float32)
    plin = plin.reshape(B, T, cfg.n_layers, cfg.pl_dim) * np.sqrt(cfg.pl_dim)
    plproj = (x0 @ params["per_layer_model_proj"]) * (D ** -0.5)
    plproj = plproj.reshape(B, T, cfg.n_layers, cfg.pl_dim)
    plproj = _rms(plproj, params["per_layer_proj_norm"], cfg.rms_eps)
    per_layer = (plproj + plin) * (2.0 ** -0.5)     # (B,T,L,pl)

    # expand to n_altup streams, magnitude-matched to the embedding
    tmag = _magnitude(x0, clamp=False)
    streams = [x0]
    for i in range(n_alt - 1):
        u = x0 @ params["altup_proj"][i]
        streams.append(u * tmag / _magnitude(u, clamp=True))
    hs = jnp.stack(streams, axis=0)                 # (n_alt, B, T, D)

    causal = jnp.arange(T)[None, :] <= jnp.arange(T)[:, None]
    rel = jnp.arange(T)[:, None] - jnp.arange(T)[None, :]
    masks = {
        "full_attention": jnp.where(causal, 0.0, -1e30),
        "sliding_attention": jnp.where(
            causal & (rel < cfg.sliding_window), 0.0, -1e30),
    }

    def router_modalities(lp, z):
        r = _rms(z, lp["altup_router_norm"], cfg.rms_eps) * (1.0 / D)
        return jnp.tanh((r @ lp["altup_router"]).astype(jnp.float32))

    first_shared = cfg.n_layers - cfg.n_kv_shared
    shared_kv: dict[str, tuple] = {}
    H, KV, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim

    for li in range(cfg.n_layers):
        lp = params["layers"][li]
        ltype = cfg.layer_types[li]
        theta = (cfg.rope_theta_local if ltype == "sliding_attention"
                 else cfg.rope_theta)

        # ---- altup predict ------------------------------------------
        mods = router_modalities(lp, hs[act])          # (B,T,n_alt)
        coefs = mods @ lp["altup_predict_coef"]        # (B,T,n_alt^2)
        coefs = coefs.reshape(B, T, n_alt, n_alt)
        # predictions[j] = sum_i hs[i] * coefs[..., j, i] + hs[j]
        preds = jnp.einsum("nbtd,btjn->jbtd", hs, coefs) + hs
        active = preds[act]                            # (B,T,D)

        h = _rms(active, lp["attn_norm"], cfg.rms_eps)

        # laurel on the NORMED active prediction
        lr = (h @ lp["laurel_l"]) @ lp["laurel_r"]
        laurel_out = h + _rms(lr, lp["laurel_post_norm"], cfg.rms_eps)

        # ---- attention (scale 1.0; weightless v-norm; KV sharing) ---
        q = (h @ lp["wq"]).reshape(B, T, H, hd)
        q = _rms(q, lp["q_norm"], cfg.rms_eps)
        q = _rope(q, pos, theta)
        if li >= first_shared and cfg.n_kv_shared > 0:
            k, v = shared_kv[ltype]
        else:
            k = (h @ lp["wk"]).reshape(B, T, KV, hd)
            k = _rms(k, lp["k_norm"], cfg.rms_eps)
            k = _rope(k, pos, theta)
            v = (h @ lp["wv"]).reshape(B, T, KV, hd)
            v = _rms(v, None, cfg.rms_eps)
            shared_kv[ltype] = (k, v)
        rep = H // KV
        kf = jnp.repeat(k, rep, axis=2)
        vf = jnp.repeat(v, rep, axis=2)
        sc = jnp.einsum("bthd,bshd->bhts", q, kf)      # scale == 1.0
        sc = sc + masks[ltype][None, None]
        p = jax.nn.softmax(sc, axis=-1)
        att = jnp.einsum("bhts,bshd->bthd", p, vf).reshape(B, T, H * hd)
        attn_out = att @ lp["wo"]
        attn_out = _rms(attn_out, lp["post_attn_norm"], cfg.rms_eps)

        attn_gated = active + attn_out
        attn_laurel = (attn_gated + laurel_out) * (2.0 ** -0.5)

        # ---- MLP (per-layer width, gelu-tanh, activation sparsity) --
        hn = _rms(attn_laurel, lp["ffn_norm"], cfg.rms_eps)
        gate = hn @ lp["w_gate"]
        if cfg.sparsity and cfg.sparsity[li] > 0.0:
            gate = _gaussian_topk(gate, cfg.sparsity[li])
        a = jax.nn.gelu(gate, approximate=True) * (hn @ lp["w_up"])
        ffw = a @ lp["w_down"]
        ffw = _rms(ffw, lp["post_ffn_norm"], cfg.rms_eps)
        out = attn_laurel + ffw

        # ---- altup correct -------------------------------------------
        mods2 = router_modalities(lp, out)
        ccoefs = (mods2 @ lp["altup_correct_coef"]) + 1.0  # (B,T,n_alt)
        innovation = out - preds[act]
        corrected = preds + innovation[None] * jnp.moveaxis(
            ccoefs, -1, 0)[:, :, :, None]

        # ---- per-layer input injection -------------------------------
        first = corrected[act]
        if cfg.altup_correct_scale:
            first = first * lp["altup_correct_scale"]
        g = jax.nn.gelu(first @ lp["per_layer_inp_gate"], approximate=True)
        g = g * per_layer[:, :, li]
        g = g @ lp["per_layer_proj"]
        g = _rms(g, lp["per_layer_post_norm"], cfg.rms_eps)
        hs = jnp.concatenate([corrected[:1], corrected[1:] + g[None]],
                             axis=0)

    # merge altup streams: magnitude-matched unembed projections, mean
    tmag = _magnitude(hs[0], clamp=False)
    outs = [hs[0]]
    for i in range(n_alt - 1):
        u = hs[i + 1] @ params["altup_unembed_proj"][i]
        outs.append(u * tmag / _magnitude(u, clamp=True))
    x = sum(outs) / n_alt
    x = _rms(x, params["final_norm"], cfg.rms_eps)
    head = params.get("lm_head")
    if head is None:
        head = params["embed"].T.astype(jnp.float32)
    logits = x @ head
    if cfg.logit_softcap:
        logits = cfg.logit_softcap * jnp.tanh(logits / cfg.logit_softcap)
    return logits

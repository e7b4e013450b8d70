"""Ternary transformer forward pass (LLAMA + BITNET arch families).

Functional, scan-over-layers, TPU-first re-design of the reference's graph
builders (src/models/llama.cpp, src/models/bitnet.cpp, src/llama-graph.cpp).
All seven projection matrices per layer are packed ternary; embeddings and
the output head stay high-precision (mirroring the reference quantizer's
policy: token_embd->Q4_K, output->Q6_K, src/llama-quant.cpp:211-251 — here
bf16).

Per-tensor `.scale` magnitudes are applied inside the ternary matmul epilogue
for *all* projections, including attention — deliberately fixing the
reference's LLAMA-arch gap where attn .scale tensors are loaded but never
multiplied (SURVEY §2.1.9).

BITNET arch adds sub-norms: RMSNorm on the attention output before wo and on
gate*up before w_down (reference src/models/bitnet.cpp:33-120).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from vlut_tpu.config import ModelConfig
from vlut_tpu.ops.matmul import ternary_matmul
from vlut_tpu.ops.norm import rms_norm
from vlut_tpu.ops.packing import (
    DEFAULT_BLOCK,
    TernaryTensor,
    pack_ternary,
)
from vlut_tpu.ops.rope import apply_rope, rope_table


@dataclasses.dataclass(frozen=True)
class TernarySpec:
    """Static metadata shared by one weight's TernaryTensor across layers."""

    k: int
    n: int
    fmt: str
    kb: int


def weight_specs(cfg: ModelConfig) -> dict[str, TernarySpec]:
    fmt = cfg.weight_fmt
    kb = DEFAULT_BLOCK[fmt]
    d, dq, dkv, f = cfg.d_model, cfg.q_dim, cfg.kv_dim, cfg.d_ff
    return {
        "wq": TernarySpec(d, dq, fmt, kb),
        "wk": TernarySpec(d, dkv, fmt, kb),
        "wv": TernarySpec(d, dkv, fmt, kb),
        "wo": TernarySpec(dq, d, fmt, kb),
        "w_gate": TernarySpec(d, f, fmt, kb),
        "w_up": TernarySpec(d, f, fmt, kb),
        "w_down": TernarySpec(f, d, fmt, kb),
    }


def _layer_tensor(layers: dict, name: str, spec: TernarySpec) -> TernaryTensor:
    w = layers[name]
    return TernaryTensor(
        packed=w["packed"], scale=w["scale"],
        k=spec.k, n=spec.n, fmt=spec.fmt, kb=spec.kb,
    )


def init_params(
    cfg: ModelConfig, seed: int = 0, dtype=jnp.bfloat16
) -> dict[str, Any]:
    """Random ternary parameters (synthetic models for tests/benchmarks)."""
    rng = np.random.default_rng(seed)
    specs = weight_specs(cfg)

    def stack_ternary(spec: TernarySpec):
        packed, scales = [], []
        for _ in range(cfg.n_layers):
            trits = rng.integers(-1, 2, size=(spec.k, spec.n), dtype=np.int8)
            t = pack_ternary(trits, scale=np.float32(0.05), fmt=spec.fmt,
                             kb=spec.kb)
            packed.append(np.asarray(t.packed))
            scales.append(np.asarray(t.scale))
        return {
            "packed": jnp.asarray(np.stack(packed)),
            "scale": jnp.asarray(np.stack(scales)),
        }

    layers: dict[str, Any] = {name: stack_ternary(s) for name, s in specs.items()}
    layers["attn_norm"] = jnp.ones((cfg.n_layers, cfg.d_model), jnp.float32)
    layers["ffn_norm"] = jnp.ones((cfg.n_layers, cfg.d_model), jnp.float32)
    if cfg.use_subnorms:
        layers["attn_sub_norm"] = jnp.ones((cfg.n_layers, cfg.q_dim), jnp.float32)
        layers["ffn_sub_norm"] = jnp.ones((cfg.n_layers, cfg.d_ff), jnp.float32)

    embed = rng.standard_normal((cfg.vocab_size, cfg.d_model)) * 0.02
    params: dict[str, Any] = {
        "embed": jnp.asarray(embed, dtype),
        "final_norm": jnp.ones((cfg.d_model,), jnp.float32),
        "layers": layers,
    }
    if not cfg.tie_embeddings:
        head = rng.standard_normal((cfg.d_model, cfg.vocab_size)) * 0.02
        params["lm_head"] = jnp.asarray(head, dtype)
    return params


def init_kv_cache(
    cfg: ModelConfig, batch: int, max_len: int | None = None,
    dtype=jnp.bfloat16,
) -> dict[str, jax.Array]:
    s = max_len or cfg.max_seq_len
    shape = (cfg.n_layers, batch, s, cfg.n_kv_heads, cfg.head_dim_)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def _attention(
    q: jax.Array,  # (B, T, H, hd) — already roped
    k: jax.Array,  # (B, S, Hkv, hd)
    v: jax.Array,  # (B, S, Hkv, hd)
    q_pos: jax.Array,  # (B, T)
    k_pos: jax.Array,  # (B, S)
) -> jax.Array:
    b, t, h, hd = q.shape
    hkv = k.shape[2]
    g = h // hkv
    qf = q.astype(jnp.float32) * (1.0 / np.sqrt(hd))
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    # (B, Hkv, G, T, S)
    qf = qf.reshape(b, t, hkv, g, hd)
    scores = jnp.einsum("bthgd,bshd->bhgts", qf, kf)
    mask = (k_pos[:, None, None, None, :] <= q_pos[:, None, None, :, None]) & (
        k_pos[:, None, None, None, :] >= 0
    )
    scores = jnp.where(mask, scores, -1e30)
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhgts,bshd->bthgd", p, vf)
    return out.reshape(b, t, h, hd)


def forward(
    params: dict[str, Any],
    cfg: ModelConfig,
    tokens: jax.Array,  # (B, T) int32
    positions: jax.Array,  # (B, T) int32; -1 marks padding tokens
    kv_cache: dict[str, jax.Array] | None = None,
    *,
    impl: str = "auto",
    logits_last_only: bool = False,
    logits_at: jax.Array | None = None,  # (B,) per-row index into T
) -> tuple[jax.Array, dict[str, jax.Array] | None]:
    """Returns (logits, updated kv_cache).

    With a cache, positions within each sequence must be contiguous per call
    (the T new tokens of batch row b occupy cache rows positions[b, 0] ...
    positions[b, 0]+T-1 — the continuous-batching engine guarantees this).
    Cache row j of row b is assumed to hold the token at position j.
    """
    b, t = tokens.shape
    specs = weight_specs(cfg)
    hd = cfg.head_dim_
    cos, sin = rope_table(
        cfg.max_seq_len, hd, cfg.rope_theta, cfg.rope_scaling
    )

    x = params["embed"][tokens]  # (B, T, D)
    safe_pos = jnp.maximum(positions, 0)

    use_cache = kv_cache is not None
    if use_cache:
        s = kv_cache["k"].shape[2]
        k_pos_row = jnp.arange(s, dtype=jnp.int32)[None, :].repeat(b, axis=0)
        write_start = safe_pos[:, 0]
    else:
        k_pos_row = positions

    mm = lambda h_, lt: ternary_matmul(h_, lt, impl=impl)  # noqa: E731

    def layer_step(x, xs):
        lp, kc, vc = xs  # kc/vc: (B, S, Hkv, hd) or None placeholders

        h = rms_norm(x, lp["attn_norm"], cfg.rms_eps)
        q = mm(h, _layer_tensor(lp, "wq", specs["wq"]))
        k = mm(h, _layer_tensor(lp, "wk", specs["wk"]))
        v = mm(h, _layer_tensor(lp, "wv", specs["wv"]))
        q = q.reshape(b, t, cfg.n_heads, hd)
        k = k.reshape(b, t, cfg.n_kv_heads, hd)
        v = v.reshape(b, t, cfg.n_kv_heads, hd)
        q = apply_rope(q, safe_pos, cos, sin)
        k = apply_rope(k, safe_pos, cos, sin)

        if use_cache:
            kc = jax.vmap(
                lambda c, u, p: jax.lax.dynamic_update_slice(c, u, (p, 0, 0))
            )(kc, k.astype(kc.dtype), write_start)
            vc = jax.vmap(
                lambda c, u, p: jax.lax.dynamic_update_slice(c, u, (p, 0, 0))
            )(vc, v.astype(vc.dtype), write_start)
            k_all, v_all = kc, vc
        else:
            k_all, v_all = k, v

        att = _attention(q, k_all, v_all, safe_pos, k_pos_row)
        att = att.reshape(b, t, cfg.q_dim)
        if cfg.use_subnorms:
            att = rms_norm(att, lp["attn_sub_norm"], cfg.rms_eps)
        x = x + mm(att, _layer_tensor(lp, "wo", specs["wo"])).astype(x.dtype)

        h = rms_norm(x, lp["ffn_norm"], cfg.rms_eps)
        gate = mm(h, _layer_tensor(lp, "w_gate", specs["w_gate"]))
        up = mm(h, _layer_tensor(lp, "w_up", specs["w_up"]))
        act = jax.nn.silu(gate.astype(jnp.float32)) * up.astype(jnp.float32)
        act = act.astype(x.dtype)
        if cfg.use_subnorms:
            act = rms_norm(act, lp["ffn_sub_norm"], cfg.rms_eps)
        x = x + mm(act, _layer_tensor(lp, "w_down", specs["w_down"])).astype(
            x.dtype
        )
        return x, (kc, vc)

    if use_cache:
        xs = (params["layers"], kv_cache["k"], kv_cache["v"])
        x, (new_k, new_v) = jax.lax.scan(layer_step, x, xs)
        new_cache = {"k": new_k, "v": new_v}
    else:
        dummy = jnp.zeros((cfg.n_layers,), jnp.int8)
        x, _ = jax.lax.scan(
            lambda c, xs_: (layer_step(c, (xs_[0], None, None))[0], None),
            x,
            (params["layers"], dummy),
        )
        new_cache = None

    x = rms_norm(x, params["final_norm"], cfg.rms_eps)
    if logits_at is not None:
        # project only the requested token per row (prefill wants one row's
        # logits; computing (B, T, V) for V=128k would waste HBM)
        x = x[jnp.arange(b), logits_at][:, None]
    elif logits_last_only:
        x = x[:, -1:]
    head = params.get("lm_head")
    if head is None:
        head = params["embed"].T
    logits = jnp.dot(
        x.astype(jnp.float32),
        head.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return logits, new_cache

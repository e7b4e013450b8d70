"""Rotary position embeddings (NEOX-style split-half), with llama3 scaling.

Covers the reference's rope paths used by the Vec-LUT model zoo: plain RoPE
(BitNet/TriLM), large-theta (Llama3/Falcon3), and llama3 long-context factor
scaling (rope factors, src/llama-model.cpp:2738-2745).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp


def _inv_freq(
    head_dim: int, theta: float, scaling: dict[str, Any] | None
) -> tuple[jax.Array, float]:
    """Returns (inv_freq, mscale).  Covers the reference's rope_scaling
    modes (src/llama-model.cpp rope config + ggml rope ext): none, linear,
    llama3, yarn, longrope."""
    inv = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    if not scaling:
        return inv, 1.0
    kind = scaling.get("rope_type", scaling.get("type"))
    if kind in ("default", "mrope"):
        # qwen2-vl: unscaled frequencies; the mrope_section key is consumed
        # by apply_mrope (positions-side, not frequency-side)
        return inv, 1.0
    if kind == "llama3":
        factor = scaling.get("factor", 8.0)
        lo = scaling.get("low_freq_factor", 1.0)
        hi = scaling.get("high_freq_factor", 4.0)
        orig = scaling.get("original_max_position_embeddings", 8192)
        wavelen = 2 * math.pi / inv
        lo_wl = orig / lo
        hi_wl = orig / hi
        smooth = (orig / wavelen - lo) / (hi - lo)
        inv = jnp.where(
            wavelen > lo_wl,
            inv / factor,
            jnp.where(
                wavelen < hi_wl,
                inv,
                (1 - smooth) * inv / factor + smooth * inv,
            ),
        )
        return inv, 1.0
    if kind == "linear":
        return inv / scaling.get("factor", 1.0), 1.0
    if kind == "yarn":
        # NTK-by-parts interpolation + attention temperature (mscale)
        factor = scaling.get("factor", 1.0)
        orig = scaling.get("original_max_position_embeddings", 4096)
        beta_fast = scaling.get("beta_fast", 32.0)
        beta_slow = scaling.get("beta_slow", 1.0)

        def dim_for_rotations(n_rot):
            return (
                head_dim
                * math.log(orig / (n_rot * 2 * math.pi))
                / (2 * math.log(theta))
            )

        low = max(math.floor(dim_for_rotations(beta_fast)), 0)
        high = min(math.ceil(dim_for_rotations(beta_slow)), head_dim - 1)
        dims = jnp.arange(0, head_dim, 2, dtype=jnp.float32) / 2
        ramp = jnp.clip((dims - low) / max(high - low, 1e-3), 0.0, 1.0)
        extrap_mask = 1.0 - ramp  # 1 = keep original freq (high-freq dims)
        inv_interp = inv / factor
        inv = inv * extrap_mask + inv_interp * (1.0 - extrap_mask)
        attn_factor = scaling.get("attention_factor")
        if attn_factor is None:
            attn_factor = (
                0.1 * math.log(factor) + 1.0 if factor > 1.0 else 1.0
            )
        return inv, float(attn_factor)
    if kind == "longrope":
        # per-dim factors; short/long variants chosen by target length
        factors = scaling.get("long_factor") or scaling.get("factor")
        inv = inv / jnp.asarray(factors, jnp.float32)
        orig = scaling.get("original_max_position_embeddings", 4096)
        maxp = scaling.get("max_position_embeddings", orig)
        s = maxp / orig
        mscale = (
            math.sqrt(1.0 + math.log(s) / math.log(orig)) if s > 1.0 else 1.0
        )
        return inv, float(mscale)
    raise ValueError(f"unsupported rope scaling type: {kind!r}")


def rope_table(
    max_len: int,
    head_dim: int,
    theta: float = 10000.0,
    scaling: dict[str, Any] | None = None,
    pad_to: int | None = None,
    with_mscale: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Precompute (cos, sin) tables of shape (max_len, head_dim // 2).

    ``pad_to`` pads the frequency axis to pad_to//2 with identity rotations
    (cos=1, sin=0) for the padded-head-dim layout (models/dims.py) — the
    padded components are zero, so any rotation is a no-op there.

    ``with_mscale=False`` yields unit-magnitude rotations (no yarn/longrope
    attention-temperature factor).  Required for KV-cache re-rotation
    (kv_cache.seq_shift): stored keys already carry mscale, so rebasing with
    a scaled table would apply it twice.
    """
    inv, mscale = _inv_freq(head_dim, theta, scaling)
    if not with_mscale:
        mscale = 1.0
    pos = jnp.arange(max_len, dtype=jnp.float32)
    ang = pos[:, None] * inv[None, :]
    cos, sin = jnp.cos(ang) * mscale, jnp.sin(ang) * mscale
    if pad_to is not None and pad_to > head_dim:
        extra = (pad_to - head_dim) // 2
        cos = jnp.pad(cos, ((0, 0), (0, extra)), constant_values=1.0)
        sin = jnp.pad(sin, ((0, 0), (0, extra)), constant_values=0.0)
    return cos, sin


def mrope_row_map(
    sections: tuple[int, ...], n_freqs: int, interleaved: bool
) -> jax.Array:
    """Per-frequency position-row index (0=T, 1=H, 2=W).

    Chunked (qwen2-vl mrope_section): [T]*s0 + [H]*s1 + [W]*s2, cycled.
    Interleaved (qwen3-vl): T everywhere, except freq f uses H when
    f % 3 == 1 and f < 3*s1, W when f % 3 == 2 and f < 3*s2
    (Qwen3VLTextRotaryEmbedding.apply_interleaved_mrope).
    Frequencies beyond the mapped range (lane padding) use row 0 — the
    padded table entries are identity rotations anyway."""
    import numpy as np

    rows = np.zeros(n_freqs, np.int32)
    if interleaved:
        for dim in (1, 2):
            length = min(sections[dim] * 3, n_freqs)
            rows[dim : length : 3] = dim
    else:
        lo = 0
        for i, n in enumerate(sections):
            rows[lo : lo + n] = i % 3
            lo += n
    return jnp.asarray(rows)


def apply_mrope(
    x: jax.Array,            # (B, T, H, head_dim)
    mrope_pos: jax.Array,    # (B, 3, T) int32 — temporal/height/width rows
    cos: jax.Array,          # (max_len, head_dim // 2)
    sin: jax.Array,
    row_map: jax.Array,      # (head_dim // 2,) int32 from mrope_row_map
) -> jax.Array:
    half = x.shape[-1] // 2
    # (3, B, T, half) gathered per position row, then per-freq row select
    cos_all = cos[mrope_pos]                      # (B, 3, T, half)
    sin_all = sin[mrope_pos]
    sel = jax.nn.one_hot(row_map, 3, dtype=jnp.float32)  # (half, 3)
    c = jnp.einsum("brtf,fr->btf", cos_all.astype(jnp.float32), sel)
    s = jnp.einsum("brtf,fr->btf", sin_all.astype(jnp.float32), sel)
    c, s = c[..., None, :], s[..., None, :]       # (B, T, 1, half)
    xf = x.astype(jnp.float32)
    x1, x2 = xf[..., :half], xf[..., half:]
    out = jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    return out.astype(x.dtype)


def apply_rope(
    x: jax.Array,  # (..., T, H, head_dim)
    positions: jax.Array,  # (..., T) int32
    cos: jax.Array,  # (max_len, head_dim // 2)
    sin: jax.Array,
) -> jax.Array:
    half = x.shape[-1] // 2
    c = cos[positions][..., None, :]  # (..., T, 1, half)
    s = sin[positions][..., None, :]
    xf = x.astype(jnp.float32)
    x1, x2 = xf[..., :half], xf[..., half:]
    out = jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    return out.astype(x.dtype)


def apply_rope_rows(
    x: jax.Array,  # (..., T, H, head_dim)
    c: jax.Array,  # (..., T, 1, half) — already gathered at positions
    s: jax.Array,
) -> jax.Array:
    """apply_rope for callers that gathered cos/sin at the token positions
    themselves (e.g. to select between a global and a local-theta table on
    the gathered rows instead of the full tables)."""
    half = x.shape[-1] // 2
    xf = x.astype(jnp.float32)
    x1, x2 = xf[..., :half], xf[..., half:]
    out = jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    return out.astype(x.dtype)

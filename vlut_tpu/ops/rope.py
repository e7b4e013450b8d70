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


def _inv_freq(head_dim: int, theta: float, scaling: dict[str, Any] | None):
    inv = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    if scaling and scaling.get("rope_type", scaling.get("type")) == "llama3":
        factor = scaling.get("factor", 8.0)
        lo = scaling.get("low_freq_factor", 1.0)
        hi = scaling.get("high_freq_factor", 4.0)
        orig = scaling.get("original_max_position_embeddings", 8192)
        wavelen = 2 * math.pi / inv
        lo_wl = orig / lo
        hi_wl = orig / hi
        smooth = (orig / wavelen - lo) / (hi - lo)
        scaled = jnp.where(
            wavelen > lo_wl,
            inv / factor,
            jnp.where(
                wavelen < hi_wl,
                inv,
                (1 - smooth) * inv / factor + smooth * inv,
            ),
        )
        inv = scaled
    return inv


def rope_table(
    max_len: int,
    head_dim: int,
    theta: float = 10000.0,
    scaling: dict[str, Any] | None = None,
    pad_to: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Precompute (cos, sin) tables of shape (max_len, head_dim // 2).

    ``pad_to`` pads the frequency axis to pad_to//2 with identity rotations
    (cos=1, sin=0) for the padded-head-dim layout (models/dims.py) — the
    padded components are zero, so any rotation is a no-op there.
    """
    inv = _inv_freq(head_dim, theta, scaling)
    pos = jnp.arange(max_len, dtype=jnp.float32)
    ang = pos[:, None] * inv[None, :]
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    if pad_to is not None and pad_to > head_dim:
        extra = (pad_to - head_dim) // 2
        cos = jnp.pad(cos, ((0, 0), (0, extra)), constant_values=1.0)
        sin = jnp.pad(sin, ((0, 0), (0, extra)), constant_values=0.0)
    return cos, sin


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

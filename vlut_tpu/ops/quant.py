"""Per-token int8 activation quantization.

TPU analog of the reference's ``quantize_row_i8_v``
(ggml/src/ggml-cpu/ggml-cpu-quants-vlut.c:928-950).  Two deliberate fixes vs
the reference (documented in SURVEY §2.1.3):

* scale = max(|x|)/127 — the reference maxes over *signed* values (positive
  max only) and clamps negatives at -128; we use the symmetric max-abs form.
* no tile-transposed staging layout: the Pallas GEMM consumes the natural
  (tokens, K) int8 layout, so the whole class of staging-offset bugs the
  reference has at >32 tokens (SURVEY §0) cannot exist here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_activations(
    x: jax.Array, tp_axis: str | None = None
) -> tuple[jax.Array, jax.Array]:
    """x (..., K) float -> (q int8 (..., K), scale fp32 (..., 1)).

    q = round(x * 127 / max|x|), clipped to [-127, 127]; scale restores
    magnitude: q * scale ~= x.  Zero rows get scale 0 and q 0.

    ``tp_axis``: inside shard_map with the K dim sharded over that mesh
    axis, the max is taken globally (pmax), so every shard quantizes with
    the same scale as an unsharded run — the int8 codes (and hence the
    integer GEMM accumulators) become bit-identical to single-device.
    """
    x = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    if tp_axis is not None:
        amax = jax.lax.pmax(amax, tp_axis)
    inv = jnp.where(amax > 0, 127.0 / amax, 0.0)
    q = jnp.clip(jnp.round(x * inv), -127, 127).astype(jnp.int8)
    scale = amax / 127.0
    return q, scale

"""Slot KV cache + sequence ops (the llama-memory contract, TPU-shaped).

The reference manipulates sequences through 7 memory ops (src/llama-memory.h,
SURVEY §2.4).  Here the cache is a fixed-shape device array pytree
(L, n_slots, max_len, Hkv, hd) and the ops are pure jitted index
transformations — no defrag is ever needed because slots are fixed-capacity
(the reference's find_slot/defrag machinery exists only because its unified
cell pool fragments; a slot layout cannot).

seq_cp copies a prefix between slots — the fan-out primitive behind the
reference's shared-prompt batched demo (examples/batched/batched.cpp:163) and
server multi-sample fan-out (server-context.cpp:2604).

Quantized mode (reference cache_type_k/v q8_0, SURVEY §5 long-context row):
k/v stored int8 with per-(token, head) fp32 scales ("k_scale"/"v_scale"),
halving (vs bf16) KV HBM traffic; dequantization fuses into the attention
reads inside run_layers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def new_cache(
    n_layers: int, n_slots: int, max_len: int, n_kv_heads: int,
    head_dim: int, dtype=jnp.bfloat16, quantized: bool = False,
) -> dict[str, jax.Array]:
    shape = (n_layers, n_slots, max_len, n_kv_heads, head_dim)
    if quantized:
        sshape = shape[:-1]
        return {
            "k": jnp.zeros(shape, jnp.int8),
            "v": jnp.zeros(shape, jnp.int8),
            "k_scale": jnp.zeros(sshape, jnp.float32),
            "v_scale": jnp.zeros(sshape, jnp.float32),
        }
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def quantize_kv(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(..., hd) -> int8 codes + per-(...) scale (max-abs / 127)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = amax / 127.0
    inv = jnp.where(scale > 0, 1.0 / jnp.maximum(scale, 1e-30), 0.0)
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) * inv[..., None]), -127, 127
    ).astype(jnp.int8)
    return q, scale


def dequantize_kv(q: jax.Array, scale: jax.Array, dtype=jnp.float32):
    return (q.astype(jnp.float32) * scale[..., None]).astype(dtype)


@functools.partial(jax.jit, donate_argnums=(0,))
def seq_cp(
    cache: dict[str, jax.Array],
    src: jax.Array,  # scalar int32 slot index
    dst: jax.Array,
    length: jax.Array,  # copy rows [0, length)
) -> dict[str, jax.Array]:
    """Copy a prompt prefix from slot src to slot dst (rows >= length zeroed
    semantics are irrelevant — readers mask by position)."""
    max_len = cache["k"].shape[2]

    def cp(a):
        rows = jnp.arange(max_len) < length
        # broadcast the row mask over trailing dims (rank varies: scales
        # have no head_dim axis)
        rshape = (1, max_len) + (1,) * (a.ndim - 3)
        s = a[:, src]
        d = a[:, dst]
        merged = jnp.where(rows.reshape(rshape), s, d)
        return jax.lax.dynamic_update_index_in_dim(a, merged, dst, axis=1)

    return {k: cp(v) for k, v in cache.items()}


@functools.partial(jax.jit, donate_argnums=(0,))
def seq_shift(
    cache: dict[str, jax.Array],
    slot: jax.Array,
    start: jax.Array,  # first KEPT row after the removed span (old indexing)
    count: jax.Array,  # rows removed (shift distance)
    cos: jax.Array,  # rope tables (max_pos, hd_p // 2) — see rope_table
    sin: jax.Array,
) -> dict[str, jax.Array]:
    """Context-shift: drop rows [start-count, start) of `slot`, slide the
    tail left, and re-rotate the moved keys by -count positions so their
    RoPE phase matches their new absolute position.

    The reference implements this as a deferred K-shift graph applied on
    memory_update (llama_kv_cache shift + server context-shift,
    server-context.cpp:1916); rotations compose additively per frequency,
    so R(p-c) = R(-c) . R(p) makes the rebase exact.  With a quantized
    cache the moved keys dequantize, rotate, and requantize.
    """
    max_len = cache["k"].shape[2]
    idx = jnp.arange(max_len)
    moved = idx >= start - count
    src_rows = jnp.clip(jnp.where(moved, idx + count, idx), 0, max_len - 1)

    # rotation by -count: angles of position `count`, negated sin
    c = cos[count]  # (hd_p // 2,)
    s = -sin[count]
    quant = "k_scale" in cache

    k = cache["k"]
    ks = k[:, slot][:, src_rows]  # (L, S, Hkv, hd_p)
    if quant:
        ksc = cache["k_scale"][:, slot][:, src_rows]
        ksf = dequantize_kv(ks, ksc)
    else:
        ksf = ks
    half = k.shape[-1] // 2
    k1, k2 = ksf[..., :half], ksf[..., half:]
    kr = jnp.concatenate([k1 * c - k2 * s, k2 * c + k1 * s], axis=-1)
    out = dict(cache)
    if quant:
        krq, krs = quantize_kv(kr)
        krq = jnp.where(moved[None, :, None, None], krq, ks)
        krs = jnp.where(moved[None, :, None], krs, ksc)
        out["k"] = jax.lax.dynamic_update_index_in_dim(k, krq, slot, axis=1)
        out["k_scale"] = jax.lax.dynamic_update_index_in_dim(
            cache["k_scale"], krs, slot, axis=1
        )
        vsc = cache["v_scale"][:, slot][:, src_rows]
        out["v_scale"] = jax.lax.dynamic_update_index_in_dim(
            cache["v_scale"], vsc, slot, axis=1
        )
    else:
        kr = jnp.where(moved[None, :, None, None], kr, ksf).astype(k.dtype)
        out["k"] = jax.lax.dynamic_update_index_in_dim(k, kr, slot, axis=1)

    v = cache["v"]
    vs = v[:, slot][:, src_rows]
    out["v"] = jax.lax.dynamic_update_index_in_dim(v, vs, slot, axis=1)
    return out

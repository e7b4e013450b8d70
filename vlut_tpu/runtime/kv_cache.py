"""Slot KV cache + sequence ops (the llama-memory contract, TPU-shaped).

The reference manipulates sequences through 7 memory ops (src/llama-memory.h,
SURVEY §2.4).  Here the cache is a fixed-shape device array pair
(L, n_slots, max_len, Hkv, hd) and the ops are pure jitted index
transformations — no defrag is ever needed because slots are fixed-capacity
(the reference's find_slot/defrag machinery exists only because its unified
cell pool fragments; a slot layout cannot).

seq_cp copies a prefix between slots — the fan-out primitive behind the
reference's shared-prompt batched demo (examples/batched/batched.cpp:163) and
server multi-sample fan-out (server-context.cpp:2604).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def new_cache(
    n_layers: int, n_slots: int, max_len: int, n_kv_heads: int,
    head_dim: int, dtype=jnp.bfloat16,
) -> dict[str, jax.Array]:
    shape = (n_layers, n_slots, max_len, n_kv_heads, head_dim)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


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
    rows = jnp.arange(max_len) < length

    def cp(a):
        s = a[:, src]
        d = a[:, dst]
        merged = jnp.where(rows[None, :, None, None], s, d)
        return jax.lax.dynamic_update_index_in_dim(a, merged, dst, axis=1)

    return {"k": cp(cache["k"]), "v": cp(cache["v"])}


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
    so R(p-c) = R(-c) . R(p) makes the rebase exact.
    """
    max_len = cache["k"].shape[2]
    idx = jnp.arange(max_len)
    moved = idx >= start - count
    src_rows = jnp.clip(jnp.where(moved, idx + count, idx), 0, max_len - 1)

    # rotation by -count: angles of position `count`, negated sin
    c = cos[count]  # (hd_p // 2,)
    s = -sin[count]

    k = cache["k"]
    ks = k[:, slot][:, src_rows]  # (L, S, Hkv, hd_p)
    half = k.shape[-1] // 2
    k1, k2 = ks[..., :half], ks[..., half:]
    kr = jnp.concatenate([k1 * c - k2 * s, k2 * c + k1 * s], axis=-1)
    kr = jnp.where(moved[None, :, None, None], kr, ks).astype(k.dtype)
    k = jax.lax.dynamic_update_index_in_dim(k, kr, slot, axis=1)

    v = cache["v"]
    vs = v[:, slot][:, src_rows]
    v = jax.lax.dynamic_update_index_in_dim(v, vs, slot, axis=1)
    return {"k": k, "v": v}

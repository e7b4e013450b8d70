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
    start: jax.Array,  # first row to keep after the removed span
    count: jax.Array,  # rows removed (shift distance)
) -> dict[str, jax.Array]:
    """Context-shift: drop rows [start-count, start) of `slot` and slide the
    tail left (reference server context-shift, server-context.cpp:1916).

    NOTE round 1: positional (RoPE) rebasing of shifted keys is NOT applied —
    the engine only uses this for whole-prefix truncation where it is exact.
    Full shift support (seq_add with rope re-rotation) is queued work.
    """
    max_len = cache["k"].shape[2]
    idx = jnp.arange(max_len)
    src_rows = jnp.where(idx >= start - count, idx + count, idx)
    src_rows = jnp.clip(src_rows, 0, max_len - 1)

    def sh(a):
        s = a[:, slot][:, src_rows]
        return jax.lax.dynamic_update_index_in_dim(a, s, slot, axis=1)

    return {"k": sh(cache["k"]), "v": sh(cache["v"])}

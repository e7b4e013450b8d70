"""Slot KV cache + sequence ops (the llama-memory contract, TPU-shaped).

The reference manipulates sequences through 7 memory ops (src/llama-memory.h,
SURVEY §2.4).  Here the cache is a fixed-shape device pytree and the ops are
pure jitted index transformations — no defrag is ever needed because slots
are fixed-capacity (the reference's find_slot/defrag machinery exists only
because its unified cell pool fragments; a slot layout cannot).

Two layouts, same logical content:

* ``stacked`` — one (L, n_slots, max_len, Hkv, hd) array per entry; used by
  the scan-over-layers forward and for serialization.
* ``layers``  — a TUPLE of L (n_slots, max_len, Hkv, hd) arrays; used by the
  unrolled decode path so each layer updates its own buffer in place.
  (A stacked cache under the unrolled loop forces either a restack or a 5-D
  scatter per step — both copy the entire cache: measured 16.5 vs 94.6
  ms/step on v5e for the scatter form at Llama3-8B shapes.)

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
    layout: str = "stacked",
) -> dict:
    shape = (n_slots, max_len, n_kv_heads, head_dim)
    entries: dict[str, tuple] = {"k": (shape, dtype), "v": (shape, dtype)}
    if quantized:
        entries = {
            "k": (shape, jnp.int8),
            "v": (shape, jnp.int8),
            "k_scale": (shape[:-1], jnp.float32),
            "v_scale": (shape[:-1], jnp.float32),
        }
    if layout == "layers":
        return {
            k: tuple(jnp.zeros(sh, dt) for _ in range(n_layers))
            for k, (sh, dt) in entries.items()
        }
    return {
        k: jnp.zeros((n_layers,) + sh, dt) for k, (sh, dt) in entries.items()
    }


def is_layered(cache: dict) -> bool:
    return isinstance(cache["k"], (tuple, list))


def n_layers_of(cache: dict) -> int:
    return len(cache["k"]) if is_layered(cache) else cache["k"].shape[0]


def max_len_of(cache: dict) -> int:
    return cache["k"][0].shape[1] if is_layered(cache) else cache["k"].shape[2]


def to_layered(cache: dict) -> dict:
    """Stacked -> per-layer tuples (no-op if already layered)."""
    if is_layered(cache):
        return dict(cache)
    return {
        k: tuple(v[i] for i in range(v.shape[0])) for k, v in cache.items()
    }


def to_stacked(cache: dict) -> dict:
    """Per-layer tuples -> stacked (no-op if already stacked).  Copies; use
    only at serialization / layout boundaries, never per step."""
    if not is_layered(cache):
        return dict(cache)
    return {k: jnp.stack(v) for k, v in cache.items()}


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


def _cp_one(a: jax.Array, src, dst, length):
    """One per-layer entry (n_slots, max_len, ...): copy rows [0, length)
    of slot src over slot dst."""
    max_len = a.shape[1]
    rows = jnp.arange(max_len) < length
    rshape = (max_len,) + (1,) * (a.ndim - 2)
    merged = jnp.where(rows.reshape(rshape), a[src], a[dst])
    return jax.lax.dynamic_update_index_in_dim(a, merged, dst, axis=0)


@functools.partial(jax.jit, donate_argnums=(0,))
def seq_cp(
    cache: dict,
    src: jax.Array,  # scalar int32 slot index
    dst: jax.Array,
    length: jax.Array,  # copy rows [0, length)
) -> dict:
    """Copy a prompt prefix from slot src to slot dst (rows >= length zeroed
    semantics are irrelevant — readers mask by position)."""
    if is_layered(cache):
        return {
            k: tuple(_cp_one(a, src, dst, length) for a in v)
            for k, v in cache.items()
        }
    return {
        k: jax.vmap(lambda a: _cp_one(a, src, dst, length))(v)
        for k, v in cache.items()
    }


def _shift_layer(entry: dict, slot, start, count, c, s, quant):
    """Context-shift one layer.  entry: per-layer arrays (B, S, ...)."""
    k = entry["k"]
    max_len = k.shape[1]
    idx = jnp.arange(max_len)
    moved = idx >= start - count
    src_rows = jnp.clip(jnp.where(moved, idx + count, idx), 0, max_len - 1)

    ks = k[slot][src_rows]  # (S, Hkv, hd_p)
    if quant:
        ksc = entry["k_scale"][slot][src_rows]
        ksf = dequantize_kv(ks, ksc)
    else:
        ksf = ks
    half = k.shape[-1] // 2
    k1, k2 = ksf[..., :half], ksf[..., half:]
    kr = jnp.concatenate([k1 * c - k2 * s, k2 * c + k1 * s], axis=-1)
    out = dict(entry)
    if quant:
        krq, krs = quantize_kv(kr)
        krq = jnp.where(moved[:, None, None], krq, ks)
        krs = jnp.where(moved[:, None], krs, ksc)
        out["k"] = jax.lax.dynamic_update_index_in_dim(k, krq, slot, axis=0)
        out["k_scale"] = jax.lax.dynamic_update_index_in_dim(
            entry["k_scale"], krs, slot, axis=0
        )
        vsc = entry["v_scale"][slot][src_rows]
        out["v_scale"] = jax.lax.dynamic_update_index_in_dim(
            entry["v_scale"], vsc, slot, axis=0
        )
    else:
        kr = jnp.where(moved[:, None, None], kr, ksf).astype(k.dtype)
        out["k"] = jax.lax.dynamic_update_index_in_dim(k, kr, slot, axis=0)

    v = entry["v"]
    vs = v[slot][src_rows]
    out["v"] = jax.lax.dynamic_update_index_in_dim(v, vs, slot, axis=0)
    return out


@functools.partial(
    jax.jit, donate_argnums=(0,), static_argnames=("swa_local",)
)
def seq_shift(
    cache: dict,
    slot: jax.Array,
    start: jax.Array,  # first KEPT row after the removed span (old indexing)
    count: jax.Array,  # rows removed (shift distance)
    cos: jax.Array,  # UNSCALED rope tables (max_pos, hd_p // 2); see
    sin: jax.Array,  # rope_table(with_mscale=False) — keys carry mscale
    cos_loc: jax.Array | None = None,  # local-theta tables for SWA layers
    sin_loc: jax.Array | None = None,  # (cfg.rope_theta_local models)
    swa_local: tuple[bool, ...] | None = None,  # per-layer "use local table"
) -> dict:
    """Context-shift: drop rows [start-count, start) of `slot`, slide the
    tail left, and re-rotate the moved keys by -count positions so their
    RoPE phase matches their new absolute position.

    The reference implements this as a deferred K-shift graph applied on
    memory_update (llama_kv_cache shift + server context-shift,
    server-context.cpp:1916); rotations compose additively per frequency,
    so R(p-c) = R(-c) . R(p) makes the rebase exact.  With a quantized
    cache the moved keys dequantize, rotate, and requantize.  Models whose
    SWA layers rope with a different base (gemma3 rope_local_base_freq)
    pass cos_loc/sin_loc + static per-layer swa_local flags so each
    layer's keys rebase with the table that wrote them.
    """
    # rotation by -count: angles of position `count`, negated sin
    c = cos[count]  # (hd_p // 2,)
    s = -sin[count]
    if cos_loc is not None:
        c_loc, s_loc = cos_loc[count], -sin_loc[count]
    else:
        c_loc, s_loc = c, s
    loc = swa_local or ()

    def tab(i):
        return (c_loc, s_loc) if (i < len(loc) and loc[i]) else (c, s)

    quant = "k_scale" in cache
    keys = list(cache)
    if is_layered(cache):
        n_l = len(cache["k"])
        outs = [
            _shift_layer(
                {k: cache[k][i] for k in keys}, slot, start, count,
                *tab(i), quant,
            )
            for i in range(n_l)
        ]
        return {k: tuple(o[k] for o in outs) for k in keys}
    if cos_loc is not None:
        n_l = cache["k"].shape[0]
        c_all = jnp.stack([tab(i)[0] for i in range(n_l)])
        s_all = jnp.stack([tab(i)[1] for i in range(n_l)])
        return jax.vmap(
            lambda e, ci, si: _shift_layer(
                e, slot, start, count, ci, si, quant
            )
        )({k: cache[k] for k in keys}, c_all, s_all)
    shifted = jax.vmap(
        lambda e: _shift_layer(e, slot, start, count, c, s, quant)
    )({k: cache[k] for k in keys})
    return shifted

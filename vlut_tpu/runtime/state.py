"""Session / sequence state serialization.

Analog of llama_state_get_data / llama_state_seq_save_file
(include/llama.h:770-839, impl src/llama-context.cpp:1739-2100): a slot's
KV rows + token history round-trip through a host-side .npz so prompts can
be cached to disk and restored into any engine with the same model config
(server slot save/restore endpoints, tools/server/README.md:1003-1043).
"""

from __future__ import annotations

import io
import pathlib

import jax
import jax.numpy as jnp
import numpy as np

STATE_VERSION = 1


def save_slot_state(
    cache: dict[str, jax.Array],
    slot: int,
    length: int,
    history: list[int],
) -> bytes:
    """Serialize one slot's valid KV rows + token history.  Generic over
    the cache's keys, so quantized caches (k/v int8 + *_scale) round-trip
    losslessly in their stored precision."""
    def store(a):
        a = np.asarray(a)
        # npz can't round-trip ml_dtypes bfloat16; ints (int8 codes) keep
        # their dtype, floats store as f32 and re-cast on load
        return a if np.issubdtype(a.dtype, np.integer) else a.astype(
            np.float32
        )

    def rows(entry):
        if isinstance(entry, (tuple, list)):  # layered cache
            return np.stack([store(a[slot, :length]) for a in entry])
        return store(entry[:, slot, :length])

    arrays = {name: rows(a) for name, a in cache.items()}
    buf = io.BytesIO()
    np.savez_compressed(
        buf,
        version=STATE_VERSION,
        tokens=np.asarray(history[:length], np.int64),
        **{f"kv_{name}": a for name, a in arrays.items()},
    )
    return buf.getvalue()


def load_slot_state(
    cache: dict[str, jax.Array],
    slot: int,
    data: bytes,
) -> tuple[dict[str, jax.Array], list[int]]:
    """Restore a serialized slot; returns (cache, token history)."""
    with np.load(io.BytesIO(data)) as z:
        if int(z["version"]) != STATE_VERSION:
            raise ValueError("unsupported state version")
        tokens = z["tokens"]
        arrays = {
            name[3:]: z[name] for name in z.files if name.startswith("kv_")
        }
        if not arrays:  # version-1 files from before quantized KV
            arrays = {"k": z["k"], "v": z["v"]}
    if set(arrays) != set(cache):
        raise ValueError(
            f"state keys {sorted(arrays)} don't match cache {sorted(cache)}"
            " (saved with a different KV cache type?)"
        )
    from vlut_tpu.runtime.kv_cache import max_len_of

    length = arrays["k"].shape[1]
    if length > max_len_of(cache):
        raise ValueError("state longer than cache capacity")

    def put(a, rows):
        if isinstance(a, (tuple, list)):  # layered cache
            return tuple(
                li.at[slot, : rows.shape[1]].set(
                    jnp.asarray(rows[i], li.dtype)
                )
                for i, li in enumerate(a)
            )
        rows = jnp.asarray(rows, a.dtype)
        return a.at[:, slot, : rows.shape[1]].set(rows)

    cache = {name: put(cache[name], arrays[name]) for name in cache}
    return cache, [int(t) for t in tokens]


def save_slot_file(path, cache, slot, length, history) -> None:
    pathlib.Path(path).write_bytes(
        save_slot_state(cache, slot, length, history)
    )


def load_slot_file(path, cache, slot):
    return load_slot_state(cache, slot, pathlib.Path(path).read_bytes())


def save_recurrent_state(
    state: dict[str, jax.Array], slot: int, history: list[int]
) -> bytes:
    """Recurrent-family slot state (Mamba conv/ssm): O(1) per sequence, no
    row truncation — the whole per-slot state serializes
    (llama_state_seq_save over llama_memory_recurrent)."""
    arrays = {
        name: np.asarray(a[:, slot], np.float32)
        for name, a in state.items()
    }
    buf = io.BytesIO()
    np.savez_compressed(
        buf,
        version=STATE_VERSION,
        recurrent=np.int64(1),
        tokens=np.asarray(history, np.int64),
        **{f"rs_{name}": a for name, a in arrays.items()},
    )
    return buf.getvalue()


def load_recurrent_state(
    state: dict[str, jax.Array], slot: int, data: bytes
) -> tuple[dict[str, jax.Array], list[int]]:
    with np.load(io.BytesIO(data)) as z:
        if int(z["version"]) != STATE_VERSION or "recurrent" not in z:
            raise ValueError("not a recurrent slot state")
        tokens = z["tokens"]
        arrays = {
            name[3:]: z[name] for name in z.files if name.startswith("rs_")
        }
    if set(arrays) != set(state):
        raise ValueError("state keys don't match recurrent cache")
    out = {
        name: state[name].at[:, slot].set(
            jnp.asarray(arrays[name], state[name].dtype)
        )
        for name in state
    }
    return out, [int(t) for t in tokens]

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
    """Serialize one slot's valid KV rows + token history."""
    k = np.asarray(cache["k"][:, slot, :length])
    v = np.asarray(cache["v"][:, slot, :length])
    buf = io.BytesIO()
    np.savez_compressed(
        buf,
        version=STATE_VERSION,
        k=k.astype(np.float32),
        v=v.astype(np.float32),
        tokens=np.asarray(history[:length], np.int64),
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
        k, v, tokens = z["k"], z["v"], z["tokens"]
    length = k.shape[1]
    if length > cache["k"].shape[2]:
        raise ValueError("state longer than cache capacity")

    def put(a, rows):
        rows = jnp.asarray(rows, a.dtype)
        return a.at[:, slot, : rows.shape[1]].set(rows)

    cache = {"k": put(cache["k"], k), "v": put(cache["v"], v)}
    return cache, [int(t) for t in tokens]


def save_slot_file(path, cache, slot, length, history) -> None:
    pathlib.Path(path).write_bytes(
        save_slot_state(cache, slot, length, history)
    )


def load_slot_file(path, cache, slot):
    return load_slot_state(cache, slot, pathlib.Path(path).read_bytes())

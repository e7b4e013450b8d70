"""Sampler chain: jit-friendly logits processors + categorical draw.

TPU re-design of the reference's sampler chain (src/llama-sampling.cpp,
llama_sampler_chain): instead of per-token C callbacks mutating a candidate
array, each processor is a pure (B, V) -> (B, V) logits transform with
*per-row* parameters, so one jitted call samples every slot in the batch with
its own settings (a "disabled" parameter value makes the transform identity,
keeping shapes static).

Round-1 coverage (the samplers the BASELINE configs need — greedy, temp,
top-k, top-p, min-p, repeat/presence/frequency penalties); the long tail
(mirostat, typical, XTC, DRY, grammar) lands in later rounds.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

NEG_INF = -1e30


@dataclasses.dataclass(frozen=True)
class SamplerParams:
    """Per-sequence sampling settings (host side; vectorized on device).

    Defaults mirror common/sampling defaults in spirit: temp<=0 => greedy,
    top_k<=0 => off, top_p>=1 => off, min_p<=0 => off, penalty 1.0 => off.
    """

    temperature: float = 1.0
    top_k: int = 0
    top_p: float = 1.0
    min_p: float = 0.0
    repeat_penalty: float = 1.0
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    penalty_last_n: int = 64
    seed: int = 0


def stack_params(params: list[SamplerParams]) -> dict[str, jax.Array]:
    """Stack per-slot SamplerParams into device vectors."""
    as_f = lambda f: jnp.asarray([getattr(p, f) for p in params], jnp.float32)
    as_i = lambda f: jnp.asarray([getattr(p, f) for p in params], jnp.int32)
    return {
        "temperature": as_f("temperature"),
        "top_k": as_i("top_k"),
        "top_p": as_f("top_p"),
        "min_p": as_f("min_p"),
        "repeat_penalty": as_f("repeat_penalty"),
        "presence_penalty": as_f("presence_penalty"),
        "frequency_penalty": as_f("frequency_penalty"),
        "penalty_last_n": as_i("penalty_last_n"),
    }


def apply_penalties(
    logits: jax.Array,  # (B, V)
    recent_tokens: jax.Array,  # (B, P) int32, -1 for empty
    recent_valid: jax.Array,  # (B, P) bool
    p: dict[str, jax.Array],
) -> jax.Array:
    """repeat/presence/frequency penalties over the last-n window.

    Matches llama_sampler_init_penalties semantics: logits of tokens present
    in the window are divided by repeat_penalty (sign-aware), then shifted by
    presence and count*frequency penalties.
    """
    b, v = logits.shape
    tok = jnp.where(recent_valid, recent_tokens, v)  # map invalid to OOB row
    counts = jax.vmap(
        lambda t: jnp.zeros(v + 1, jnp.float32).at[t].add(1.0)
    )(tok)[:, :v]
    present = counts > 0

    rp = p["repeat_penalty"][:, None]
    scaled = jnp.where(
        logits > 0, logits / rp, logits * rp
    )
    out = jnp.where(present & (rp != 1.0), scaled, logits)
    out = out - present * p["presence_penalty"][:, None]
    out = out - counts * p["frequency_penalty"][:, None]
    return out


def apply_top_k(logits: jax.Array, top_k: jax.Array) -> jax.Array:
    """Per-row top-k mask; top_k<=0 disables. O(V log V) via sort (XLA)."""
    v = logits.shape[-1]
    sorted_desc = jnp.sort(logits, axis=-1)[:, ::-1]
    k = jnp.clip(top_k, 1, v)
    kth = jnp.take_along_axis(sorted_desc, (k - 1)[:, None], axis=-1)
    mask = logits >= kth
    mask = jnp.where((top_k <= 0)[:, None], True, mask)
    return jnp.where(mask, logits, NEG_INF)


def apply_top_p(logits: jax.Array, top_p: jax.Array) -> jax.Array:
    """Nucleus sampling; top_p>=1 disables.  Keeps at least one token."""
    order = jnp.argsort(-logits, axis=-1)
    sorted_logits = jnp.take_along_axis(logits, order, axis=-1)
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep_sorted = (cum - probs) < top_p[:, None]  # keep while mass below p
    keep = jnp.zeros_like(keep_sorted).at[
        jnp.arange(logits.shape[0])[:, None], order
    ].set(keep_sorted)
    keep = keep | (logits >= logits.max(axis=-1, keepdims=True))
    disabled = (top_p >= 1.0)[:, None]
    return jnp.where(disabled | keep, logits, NEG_INF)


def apply_min_p(logits: jax.Array, min_p: jax.Array) -> jax.Array:
    """Drop tokens with prob < min_p * max_prob; min_p<=0 disables."""
    probs = jax.nn.softmax(logits, axis=-1)
    thresh = probs.max(axis=-1, keepdims=True) * min_p[:, None]
    keep = probs >= thresh
    disabled = (min_p <= 0.0)[:, None]
    return jnp.where(disabled | keep, logits, NEG_INF)


def sample(
    logits: jax.Array,  # (B, V) fp32
    p: dict[str, jax.Array],
    key: jax.Array,
    recent_tokens: jax.Array | None = None,  # (B, P)
    recent_valid: jax.Array | None = None,
) -> jax.Array:
    """Full chain: penalties -> temp -> top-k -> top-p -> min-p -> draw.

    temperature <= 0 selects greedy argmax for that row (reference: temp
    sampler with temp<=0 short-circuits to greedy).
    """
    if recent_tokens is not None:
        logits = apply_penalties(logits, recent_tokens, recent_valid, p)

    greedy_tok = jnp.argmax(logits, axis=-1)

    temp = p["temperature"]
    safe_temp = jnp.where(temp > 0, temp, 1.0)
    logits = logits / safe_temp[:, None]
    logits = apply_top_k(logits, p["top_k"])
    logits = apply_top_p(logits, p["top_p"])
    logits = apply_min_p(logits, p["min_p"])

    sampled = jax.random.categorical(key, logits, axis=-1)
    return jnp.where(temp > 0, sampled, greedy_tok).astype(jnp.int32)

"""Device-resident batched generation: N decode steps in one jitted scan.

The reference's batched-decode demo (llama-batched, np=32 n=16 — the
BASELINE headline config) runs a fixed number of steps for all sequences
with no early exit, which maps perfectly onto a lax.scan with zero host
round-trips.  The Engine uses per-step host control for streaming /
continuous batching; this path is for fixed-n batch generation and
benchmarking (per-step host sync costs milliseconds over a TPU tunnel and
would otherwise dominate).
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp

from vlut_tpu.config import ModelConfig
from vlut_tpu.models.transformer import forward
from vlut_tpu.runtime.sampling import sample


def make_generate_fn(
    cfg: ModelConfig, n_steps: int, impl: str = "auto",
    features: tuple[str, ...] | None = None,
) -> Callable:
    """Build a jitted f(params, cache, last_tokens, lengths, sp, key) ->
    ((B, n_steps) tokens, cache) generating exactly n_steps tokens per row.

    Assumes prompts already prefilled into `cache` at rows [0, lengths).
    No penalties in this path (the Engine handles penalty sampling; fixed-n
    batch benchmarks don't need them device-side yet).  ``features`` (from
    sampling.features_of) statically prunes disabled sampler transforms.
    """

    @functools.partial(jax.jit, donate_argnums=(1,))
    def generate(params, cache, last_tokens, lengths, sp, key):
        b = last_tokens.shape[0]

        def step(carry, key_step):
            tokens, lens, cache = carry
            logits, cache = forward(
                params, cfg, tokens[:, None], lens[:, None], cache,
                impl=impl, logits_at=jnp.zeros((b,), jnp.int32),
            )
            logits = logits[:, 0].astype(jnp.float32)
            v = logits.shape[-1]
            if v != cfg.vocab_size:
                logits = jnp.where(
                    jnp.arange(v) < cfg.vocab_size, logits, -1e30
                )
            nxt = sample(logits, sp, key_step, features=features)
            return (nxt, lens + 1, cache), nxt

        keys = jax.random.split(key, n_steps)
        (_, _, cache), toks = jax.lax.scan(
            step, (last_tokens, lengths, cache), keys
        )
        return toks.T, cache  # (B, n_steps)

    return generate

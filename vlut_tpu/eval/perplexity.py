"""Perplexity / accuracy harness.

TPU analog of tools/perplexity/perplexity.cpp (the reference's accuracy
harness behind every "ppl delta = 0" claim): windowed NLL over a token
stream, plus logits-KL between two execution paths of the same checkpoint
(quantized vs FP-dequant), which is the reference's "lossless" comparison
re-expressed (SURVEY §6, BASELINE.md).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from vlut_tpu.config import ModelConfig
from vlut_tpu.models.transformer import forward


def _chunk_nll(params, cfg, tokens_chunk, impl):
    """tokens_chunk (1, T): sum NLL of tokens[1:] given prefix, in fp32."""
    t = tokens_chunk.shape[1]
    pos = jnp.arange(t, dtype=jnp.int32)[None]
    logits, _ = forward(params, cfg, tokens_chunk, pos, None, impl=impl)
    logits = logits[:, :-1, : cfg.vocab_size].astype(jnp.float32)
    targets = tokens_chunk[:, 1:]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return jnp.sum(nll), t - 1


def perplexity(
    params: dict[str, Any],
    cfg: ModelConfig,
    tokens: list[int] | np.ndarray,
    window: int = 512,
    impl: str = "auto",
) -> dict[str, float]:
    """Non-overlapping-window perplexity (reference default protocol)."""
    tokens = np.asarray(tokens, np.int32)
    n = (len(tokens) // window) * window
    if n < window:
        raise ValueError(f"need at least {window} tokens, got {len(tokens)}")
    total_nll, total_cnt = 0.0, 0
    fn = jax.jit(
        lambda p, t: _chunk_nll(p, cfg, t, impl)
    )
    for i in range(0, n, window):
        chunk = jnp.asarray(tokens[i : i + window])[None]
        nll, cnt = fn(params, chunk)
        total_nll += float(nll)
        total_cnt += int(cnt)
    return {
        "ppl": math.exp(total_nll / total_cnt),
        "nll": total_nll / total_cnt,
        "tokens": total_cnt,
    }


def window_logprobs(
    params: dict[str, Any],
    cfg: ModelConfig,
    tokens: np.ndarray,
    impl: str = "auto",
) -> np.ndarray:
    """(len-1,) log p(tokens[i+1] | tokens[:i+1]) — the scoring primitive
    behind rerank and multiple-choice evals."""
    ids = jnp.asarray(np.asarray(tokens, np.int32))[None]
    t = ids.shape[1]
    pos = jnp.arange(t, dtype=jnp.int32)[None]
    logits, _ = forward(params, cfg, ids, pos, None, impl=impl)
    logits = logits[0, :-1, : cfg.vocab_size].astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    out = jnp.take_along_axis(logp, ids[0, 1:, None], axis=-1)[:, 0]
    return np.asarray(out)


def logits_compare(
    params: dict[str, Any],
    cfg: ModelConfig,
    tokens: np.ndarray,
    impl_a: str = "auto",
    impl_b: str = "dequant",
    window: int = 256,
) -> dict[str, float]:
    """KL(a || b) and top-1 agreement between two execution paths — the
    lossless-ternary acceptance metric (reference: perplexity.cpp KL-div
    mode, tools/perplexity/perplexity.cpp:173-259)."""
    tokens = jnp.asarray(np.asarray(tokens[:window], np.int32))[None]
    t = tokens.shape[1]
    pos = jnp.arange(t, dtype=jnp.int32)[None]
    la, _ = forward(params, cfg, tokens, pos, None, impl=impl_a)
    lb, _ = forward(params, cfg, tokens, pos, None, impl=impl_b)
    la = la[0, :, : cfg.vocab_size].astype(jnp.float32)
    lb = lb[0, :, : cfg.vocab_size].astype(jnp.float32)
    pa = jax.nn.log_softmax(la, -1)
    pb = jax.nn.log_softmax(lb, -1)
    kl = jnp.sum(jnp.exp(pa) * (pa - pb), axis=-1)
    top1 = jnp.mean(
        (jnp.argmax(la, -1) == jnp.argmax(lb, -1)).astype(jnp.float32)
    )
    return {
        "kl_mean": float(jnp.mean(kl)),
        "kl_max": float(jnp.max(kl)),
        "top1_agreement": float(top1),
    }

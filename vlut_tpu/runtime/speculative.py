"""Speculative decoding: draft-model propose, target verify, fixed shapes.

TPU re-architecture of the reference's speculative driver
(common/speculative.cpp `common_speculative_gen_draft` + the server's
per-slot verify loop, tools/server/server-context.cpp:760-775): every round
the draft model decodes K tokens autoregressively (cheap), the target
scores all K+1 positions in ONE forward, and each row accepts the longest
prefix where the target's greedy choice equals the draft proposal — so the
output equals plain greedy decoding of the target model exactly, just
faster when the draft agrees.

XLA-first shape discipline: every round runs the same (B, K) draft scan and
(B, K+1) verify forward; variable acceptance is handled by per-row write
offsets into a fixed (B, max_new) output buffer (rejected slots are simply
overwritten next round).  No vocab translation yet — draft and target must
share a tokenizer (the reference translates between near-miss vocabs,
server-context.cpp:663; queued work).
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp

from vlut_tpu.config import ModelConfig
from vlut_tpu.models.transformer import forward


def make_speculative_fn(
    cfg_t: ModelConfig,
    cfg_d: ModelConfig,
    k_draft: int,
    max_new: int,
    impl: str = "auto",
) -> Callable:
    """Build jitted f(params_t, params_d, cache_t, cache_d, last, lengths)
    -> (out (B, max_new) int32, n_generated (B,), caches...).

    Greedy-only (temperature sampling via speculative rejection is queued
    work).  Runs ceil-enough rounds to fill max_new for the worst case
    (one accepted token per round)."""
    n_rounds = max_new  # worst case: 1 token/round; early rows just overwrite

    @functools.partial(jax.jit, donate_argnums=(2, 3))
    def spec_generate(params_t, params_d, cache_t, cache_d, last, lengths):
        b = last.shape[0]
        out = jnp.zeros((b, max_new + k_draft + 1), jnp.int32)
        cnt = jnp.zeros((b,), jnp.int32)

        def vocab_mask(logits, cfg):
            v = logits.shape[-1]
            if v != cfg.vocab_size:
                logits = jnp.where(
                    jnp.arange(v) < cfg.vocab_size, logits, -1e30
                )
            return logits

        def round_step(carry, _):
            last, lengths, cache_t, cache_d, out, cnt = carry

            # 1) draft proposes k_draft tokens autoregressively
            def draft_step(c, _):
                tok, lens, cache_d = c
                lg, cache_d = forward(
                    params_d, cfg_d, tok[:, None], lens[:, None], cache_d,
                    impl=impl, logits_at=jnp.zeros((b,), jnp.int32),
                )
                nxt = jnp.argmax(
                    vocab_mask(lg[:, 0], cfg_d), -1
                ).astype(jnp.int32)
                return (nxt, lens + 1, cache_d), nxt

            # k_draft+1 iterations: the extra one writes prop_{k-1}'s KV into
            # the draft cache so an all-accepted round leaves no cache hole
            (_, _, cache_d), props_all = jax.lax.scan(
                draft_step, (last, lengths, cache_d), None,
                length=k_draft + 1,
            )
            props = props_all.T[:, :k_draft]  # (B, K)

            # 2) target scores [last, props] in one forward
            seq = jnp.concatenate([last[:, None], props], axis=1)  # (B,K+1)
            pos = lengths[:, None] + jnp.arange(k_draft + 1)[None, :]
            lg, cache_t = forward(
                params_t, cfg_t, seq, pos.astype(jnp.int32), cache_t,
                impl=impl,
            )
            tgt = jnp.argmax(
                vocab_mask(lg.astype(jnp.float32), cfg_t), -1
            ).astype(jnp.int32)  # (B, K+1) greedy target tokens

            # 3) accept while target[i] == props[i]
            match = tgt[:, :k_draft] == props  # (B, K)
            n_acc = jnp.argmin(
                jnp.concatenate(
                    [match, jnp.zeros((b, 1), bool)], axis=1
                ).astype(jnp.int32),
                axis=1,
            )  # first mismatch index == #accepted drafts
            emitted = tgt  # (B, K+1); valid prefix = n_acc + 1 tokens

            # 4) write emitted tokens at per-row offsets
            def write_row(row_out, row_tok, offset):
                return jax.lax.dynamic_update_slice(
                    row_out, row_tok, (offset,)
                )

            out = jax.vmap(write_row)(out, emitted, cnt)
            cnt = jnp.minimum(cnt + n_acc + 1, max_new)
            lengths = lengths + n_acc + 1
            last = jnp.take_along_axis(
                emitted, n_acc[:, None], axis=1
            )[:, 0]

            # draft cache holds k_draft speculative rows; its lengths simply
            # re-sync to the target's (garbage rows get overwritten because
            # decode always writes row `length` before reading it)
            return (last, lengths, cache_t, cache_d, out, cnt), n_acc

        (last, lengths, cache_t, cache_d, out, cnt), accs = jax.lax.scan(
            round_step,
            (last, lengths, cache_t, cache_d, out, cnt),
            None,
            length=n_rounds,
        )
        return out[:, :max_new], cnt, accs, cache_t, cache_d

    return spec_generate


def make_lookup_fn(
    cfg: ModelConfig,
    k_draft: int,
    max_new: int,
    ngram: int = 2,
    hist_len: int = 512,
    impl: str = "auto",
    jacobi_fallback: bool = True,
) -> Callable:
    """Prompt-lookup (n-gram) speculative decoding — no draft model.

    The reference's lookup decoding (examples/lookup, common/ngram-cache.cpp)
    drafts by matching the last n-gram against earlier context and copying
    what followed it.  Device-side rewrite: the token history lives in a
    fixed (B, hist_len) ring-free buffer; each round finds the most recent
    earlier occurrence of the trailing n-gram with one vectorized compare,
    proposes the k tokens that followed it, and the target verifies all k+1
    positions in one forward (same acceptance rule as draft-model
    speculation, so outputs equal plain greedy decoding).

    Returns jitted f(params, cache, history, hist_cnt, last, lengths)
    -> (out (B, max_new), n_generated (B,), accs, cache).
    ``history`` holds prompt (+ any prior output) per row, ``hist_cnt`` its
    valid length; ``last`` is the last decoded token (also in history).

    ``jacobi_fallback``: rows with no n-gram match propose the previous
    round's target continuation instead of wasting the round — the
    Jacobi-iteration core of lookahead decoding (examples/lookahead) with
    the n-gram pool role played by the prompt-lookup matcher.
    """
    n_rounds = max_new

    @functools.partial(jax.jit, donate_argnums=(1,))
    def lookup_generate(params, cache, history, hist_cnt, last, lengths):
        b = history.shape[0]
        h = history.shape[1]

        def vocab_mask(logits):
            v = logits.shape[-1]
            if v != cfg.vocab_size:
                logits = jnp.where(
                    jnp.arange(v) < cfg.vocab_size, logits, -1e30
                )
            return logits

        def propose(hist_row, cnt_row):
            # trailing n-gram of the valid region
            tail = jax.lax.dynamic_slice(
                hist_row, (jnp.maximum(cnt_row - ngram, 0),), (ngram,)
            )
            # match[j] = hist[j:j+n] == tail, for j+n <= cnt - 1 (strictly
            # earlier occurrence), j+n+k within buffer
            idx = jnp.arange(h - ngram - k_draft)
            win = jax.vmap(
                lambda j: jax.lax.dynamic_slice(hist_row, (j,), (ngram,))
            )(idx)
            ok = (win == tail[None, :]).all(-1)
            ok &= (idx + ngram) <= (cnt_row - 1)
            any_match = ok.any()
            j_best = jnp.where(any_match, jnp.argmax(
                jnp.where(ok, idx, -1)
            ), 0)
            props = jax.lax.dynamic_slice(
                hist_row, (j_best + ngram,), (k_draft,)
            )
            # no match: -1 proposals (rejected); the round_step may swap in
            # the Jacobi carry below
            return (
                jnp.where(any_match, props, -jnp.ones_like(props)),
                any_match,
            )

        def round_step(carry, _):
            (last, lengths, cache, history, hist_cnt, out, cnt,
             jac_carry) = carry
            props, matched = jax.vmap(propose)(history, hist_cnt)  # (B, K)
            if jacobi_fallback:
                props = jnp.where(matched[:, None], props, jac_carry)

            seq = jnp.concatenate([last[:, None], props], axis=1)
            pos = lengths[:, None] + jnp.arange(k_draft + 1)[None, :]
            lg, cache = forward(
                params, cfg, jnp.maximum(seq, 0), pos.astype(jnp.int32),
                cache, impl=impl,
            )
            tgt = jnp.argmax(
                vocab_mask(lg.astype(jnp.float32)), -1
            ).astype(jnp.int32)

            match = tgt[:, :k_draft] == props
            n_acc = jnp.argmin(
                jnp.concatenate(
                    [match, jnp.zeros((b, 1), bool)], axis=1
                ).astype(jnp.int32),
                axis=1,
            )
            emitted = tgt

            def write_row(row, toks, off):
                return jax.lax.dynamic_update_slice(row, toks, (off,))

            out = jax.vmap(write_row)(out, emitted, cnt)
            history = jax.vmap(write_row)(history, emitted, hist_cnt)
            n_new = n_acc + 1
            cnt = jnp.minimum(cnt + n_new, max_new)
            hist_cnt = jnp.minimum(hist_cnt + n_new, h)
            lengths = lengths + n_new
            last = jnp.take_along_axis(emitted, n_acc[:, None], axis=1)[:, 0]
            # Jacobi carry: tgt[j] predicts position (start + j + 1); next
            # round verifies positions following the new `last`, so its
            # guesses are tgt[n_acc+1 : n_acc+1+k] (tail-padded)
            tgt_pad = jnp.concatenate(
                [tgt, jnp.tile(tgt[:, -1:], (1, k_draft))], axis=1
            )
            jac_next = jax.vmap(
                lambda row, s: jax.lax.dynamic_slice(row, (s,), (k_draft,))
            )(tgt_pad, n_acc + 1)
            return (
                last, lengths, cache, history, hist_cnt, out, cnt, jac_next,
            ), n_acc

        out = jnp.zeros((b, max_new + k_draft + 1), jnp.int32)
        cnt = jnp.zeros((b,), jnp.int32)
        jac0 = -jnp.ones((b, k_draft), jnp.int32)
        (last, lengths, cache, history, hist_cnt, out, cnt, _), accs = (
            jax.lax.scan(
                round_step,
                (last, lengths, cache, history, hist_cnt, out, cnt, jac0),
                None, length=n_rounds,
            )
        )
        return out[:, :max_new], cnt, accs, cache

    return lookup_generate

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
overwritten next round).  Mismatched draft/target tokenizers are bridged by
build_vocab_translation (reference: server-context.cpp:663).
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
    vocab_map: tuple | None = None,  # (d2t, t2d) from build_vocab_translation
) -> Callable:
    """Build jitted f(params_t, params_d, cache_t, cache_d, last, lengths)
    -> (out (B, max_new) int32, n_generated (B,), caches...).

    Greedy-only (temperature sampling via speculative rejection is queued
    work).  Runs ceil-enough rounds to fill max_new for the worst case
    (one accepted token per round).

    ``vocab_map`` enables mismatched draft/target tokenizers: draft
    proposals gather through d2t before verification, accepted target
    tokens gather through t2d before feeding the draft.  Untranslatable
    tokens (-1) fail verification / feed token 0 — slower, never wrong
    (reference: server-context.cpp:663 vocab-compatibility translation).
    ``last``/``lengths`` and the returned tokens are always TARGET ids.
    """
    n_rounds = max_new  # worst case: 1 token/round; early rows just overwrite
    if vocab_map is not None:
        d2t = jnp.asarray(vocab_map[0], jnp.int32)
        t2d = jnp.asarray(vocab_map[1], jnp.int32)

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

        def to_draft(tok_t):
            if vocab_map is None:
                return tok_t
            return jnp.maximum(t2d[jnp.maximum(tok_t, 0)], 0)

        def to_target(tok_d):
            if vocab_map is None:
                return tok_d
            return d2t[jnp.maximum(tok_d, 0)]  # -1 = untranslatable

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
                draft_step, (to_draft(last), lengths, cache_d), None,
                length=k_draft + 1,
            )
            props = to_target(props_all.T[:, :k_draft])  # (B, K) target ids

            # 2) target scores [last, props] in one forward
            seq = jnp.concatenate(
                [last[:, None], jnp.maximum(props, 0)], axis=1
            )  # (B, K+1)
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

        # while_loop with early exit: a fixed max_new-round scan would run
        # the worst case every time and erase the wall-clock win
        accs = jnp.zeros((n_rounds, b), jnp.int32)
        rnd = jnp.int32(0)

        def cond(c):
            (_, _, _, _, _, cnt, _, rnd) = c
            return (cnt.min() < max_new) & (rnd < n_rounds)

        def body(c):
            (last, lengths, cache_t, cache_d, out, cnt, accs, rnd) = c
            (last, lengths, cache_t, cache_d, out, cnt), n_acc = round_step(
                (last, lengths, cache_t, cache_d, out, cnt), None
            )
            accs = accs.at[rnd].set(n_acc)
            return (last, lengths, cache_t, cache_d, out, cnt, accs, rnd + 1)

        (last, lengths, cache_t, cache_d, out, cnt, accs, rnd) = (
            jax.lax.while_loop(
                cond, body,
                (last, lengths, cache_t, cache_d, out, cnt, accs, rnd),
            )
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
        accs = jnp.zeros((n_rounds, b), jnp.int32)

        def cond(c):
            return (c[6].min() < max_new) & (c[8] < n_rounds)

        def body(c):
            # c = round carry (8 elems) + (round index, accs buffer)
            carry, n_acc = round_step(c[:8], None)
            return carry + (c[8] + 1, c[9].at[c[8]].set(n_acc))

        state = (last, lengths, cache, history, hist_cnt, out, cnt, jac0,
                 jnp.int32(0), accs)
        state = jax.lax.while_loop(cond, body, state)
        (last, lengths, cache, history, hist_cnt, out, cnt, _) = state[:8]
        accs = state[9]
        return out[:, :max_new], cnt, accs, cache

    return lookup_generate


def _la_structure(window: int, ngram: int):
    """Static round structure shared by the standalone loop and the
    engine's per-slot mode: (T, lvls, intra-round mask (T,T), offsets (T,)).

    Token row layout per round (see make_lookahead_fn docstring):
      [ current | verification candidate (ngram-1) | W branches x (ngram-1) ]
    """
    import numpy as _np

    lvls = ngram - 1
    t_total = 1 + lvls + window * lvls
    m_small = _np.zeros((t_total, t_total), bool)
    m_small[:, 0] = True
    for i in range(t_total):
        m_small[i, i] = True
    for i in range(1, lvls + 1):  # verification rows 1..lvls
        m_small[i, 1 : i + 1] = True
    for w in range(window):
        base = 1 + lvls + w * lvls
        for l in range(lvls):
            m_small[base + l, base : base + l + 1] = True
    off = _np.zeros((t_total,), _np.int32)
    off[1 : lvls + 1] = _np.arange(1, lvls + 1)
    for w in range(window):
        base = 1 + lvls + w * lvls
        off[base : base + lvls] = _np.arange(1, lvls + 1)
    return t_total, lvls, m_small, off


def _la_select_candidate(pool_b, ptr_b, last_b, jac_b):
    """Most recent pool n-gram whose first token == current token; falls
    back to the previous round's target continuation (Jacobi carry)."""
    pool_size = pool_b.shape[0]
    idx = jnp.arange(pool_size)
    age = (ptr_b - 1 - idx) % pool_size  # 0 = newest
    keyed = pool_b[:, 0] == last_b
    score = jnp.where(keyed, -age, -(pool_size + 1))
    best = jnp.argmax(score)
    found = keyed.any()
    return jnp.where(found, pool_b[best, 1:], jac_b)


def make_lookahead_round(
    cfg: ModelConfig,
    window: int = 8,
    ngram: int = 3,
    impl: str = "auto",
) -> Callable:
    """ONE windowed-lookahead round for the slot engine (the per-slot
    counterpart of make_lookahead_fn's inner round; reference:
    examples/lookahead/lookahead.cpp run per server slot).

    Returns jitted
    f(params, cache, last, lengths, win, pool, ptr, jac)
      -> (emitted (B, lvls+1), n_acc (B,), cache, win, pool, ptr, jac)
    where the caller commits tokens emitted[b, :n_acc[b]+1].  Greedy-only;
    output equals plain greedy decoding exactly.  The T round tokens write
    cache rows lengths..lengths+T-1; only rows up to lengths+n_acc+1 stay
    valid (the next round overwrites the rest) — callers must leave
    t_total rows of headroom.
    """
    t_total, lvls, m_small, off = _la_structure(window, ngram)
    m_small_j = jnp.asarray(m_small)
    off_j = jnp.asarray(off)

    @functools.partial(jax.jit, donate_argnums=(1,))
    def la_round(params, cache, last, lengths, win_tok, pool, ptr, jac):
        b = last.shape[0]
        from vlut_tpu.runtime.kv_cache import max_len_of

        s_max = max_len_of(cache)

        def vocab_mask(logits):
            v = logits.shape[-1]
            if v != cfg.vocab_size:
                logits = jnp.where(
                    jnp.arange(v) < cfg.vocab_size, logits, -1e30
                )
            return logits

        cand = jax.vmap(_la_select_candidate)(pool, ptr, last, jac)
        seq = jnp.concatenate(
            [last[:, None], jnp.maximum(cand, 0),
             win_tok.reshape(b, window * lvls)],
            axis=1,
        )  # (B, T)
        pos = lengths[:, None] + off_j[None, :]
        s_idx = jnp.arange(s_max)
        rel = s_idx[None, None, :] - lengths[:, None, None]  # (B,1,S)
        committed = s_idx[None, None, :] < lengths[:, None, None]
        in_round = (rel >= 0) & (rel < t_total)
        rel_c = jnp.clip(rel, 0, t_total - 1)
        block = m_small_j[
            jnp.arange(t_total)[None, :, None], rel_c
        ]  # (B, T, S)
        mask = committed | (in_round & block)

        lg, cache = forward(
            params, cfg, seq, pos.astype(jnp.int32), cache, impl=impl,
            attn_mask=mask,
        )
        tgt = jnp.argmax(
            vocab_mask(lg.astype(jnp.float32)), -1
        ).astype(jnp.int32)  # (B, T)

        match = cand == tgt[:, :lvls]
        n_acc = jnp.argmin(
            jnp.concatenate(
                [match, jnp.zeros((b, 1), bool)], axis=1
            ).astype(jnp.int32),
            axis=1,
        )
        emitted = tgt[:, : lvls + 1]

        # Jacobi carry for the no-pool-hit fallback
        tgt_pad = jnp.concatenate(
            [tgt[:, : lvls + 1],
             jnp.tile(tgt[:, lvls : lvls + 1], (1, lvls))], axis=1
        )
        jac_next = jax.vmap(
            lambda row, s: jax.lax.dynamic_slice(row, (s,), (lvls,))
        )(tgt_pad, n_acc + 1)

        # window refinement + n-gram harvest
        y_win = tgt[:, 1 + lvls :].reshape(b, window, lvls)
        grams = jnp.concatenate([win_tok, y_win[:, :, -1:]], axis=2)

        def push(pool_b, ptr_b, grams_b):
            idxs = (ptr_b + jnp.arange(window)) % pool.shape[1]
            return pool_b.at[idxs].set(grams_b), ptr_b + window

        pool, ptr = jax.vmap(push)(pool, ptr, grams)
        return emitted, n_acc, cache, y_win, pool, ptr, jac_next

    return la_round


def make_lookahead_fn(
    cfg: ModelConfig,
    max_new: int,
    window: int = 8,
    ngram: int = 3,
    pool_size: int = 64,
    impl: str = "auto",
) -> Callable:
    """Windowed lookahead decoding (Fu et al. 2024; the reference's
    examples/lookahead/lookahead.cpp): draft-model-free speculation from a
    2-D Jacobi window plus an n-gram pool, all in ONE forward per round
    with a custom attention mask.

    Per round, each row's batch packs T = 1 + (ngram-1) + window*(ngram-1)
    tokens:

      [ current | verification candidate (ngram-1) | W branches x (ngram-1) ]

    * the verification branch sits DIRECTLY after the current token so an
      accepted prefix lands in the canonical cache rows (no scatter /
      seq_rm needed — rejected rows are overwritten by the next round,
      the same fixed-shape trick the draft path uses).  The candidate is
      the most recent pool n-gram keyed by the current token, falling
      back to the previous round's target continuation (Jacobi carry).
      This is the fixed-shape counterpart of the reference's G candidate
      seqs (lookahead.cpp keeps several; one suffices when the pool key
      is the committed token).
    * window branch w guesses positions p+1..p+ngram-1; its attention is
      restricted to [committed rows] + current + its own earlier levels
      via the mask override (the reference builds the same block mask in
      llama_batch form).  Each round refines guesses one Jacobi step and
      harvests one n-gram per branch into the pool.

    Greedy-only; output equals plain greedy decoding exactly (the
    acceptance rule only admits tokens the target itself would emit).

    Returns jitted f(params, cache, last, lengths)
    -> (out (B, max_new), n_generated (B,), accs, cache).
    """
    t_total, lvls, m_small, off = _la_structure(window, ngram)
    m_small_j = jnp.asarray(m_small)
    off_full = off

    n_rounds = max_new

    @functools.partial(jax.jit, donate_argnums=(1,))
    def lookahead_generate(params, cache, last, lengths):
        b = last.shape[0]
        from vlut_tpu.runtime.kv_cache import max_len_of

        s_max = max_len_of(cache)

        def vocab_mask(logits):
            v = logits.shape[-1]
            if v != cfg.vocab_size:
                logits = jnp.where(
                    jnp.arange(v) < cfg.vocab_size, logits, -1e30
                )
            return logits

        off_j = jnp.asarray(off_full)

        def round_step(carry, _):
            (last, lengths, cache, out, cnt, win_tok, pool, ptr, jac) = carry

            cand = jax.vmap(_la_select_candidate)(
                pool, ptr, last, jac
            )  # (B, lvls)
            seq = jnp.concatenate(
                [last[:, None], jnp.maximum(cand, 0),
                 win_tok.reshape(b, window * lvls)],
                axis=1,
            )  # (B, T)
            pos = lengths[:, None] + off_j[None, :]
            # full-override mask: committed rows + the static intra-round
            # block structure at rows [lengths, lengths+T)
            s_idx = jnp.arange(s_max)
            rel = s_idx[None, None, :] - lengths[:, None, None]  # (B,1,S)
            committed = s_idx[None, None, :] < lengths[:, None, None]
            in_round = (rel >= 0) & (rel < t_total)
            rel_c = jnp.clip(rel, 0, t_total - 1)
            block = m_small_j[
                jnp.arange(t_total)[None, :, None], rel_c
            ]  # (B, T, S)
            mask = committed | (in_round & block)

            lg, cache = forward(
                params, cfg, seq, pos.astype(jnp.int32), cache, impl=impl,
                attn_mask=mask,
            )
            tgt = jnp.argmax(
                vocab_mask(lg.astype(jnp.float32)), -1
            ).astype(jnp.int32)  # (B, T)

            # --- acceptance over the verification branch (rows 0..lvls) ---
            match = cand == tgt[:, :lvls]
            n_acc = jnp.argmin(
                jnp.concatenate(
                    [match, jnp.zeros((b, 1), bool)], axis=1
                ).astype(jnp.int32),
                axis=1,
            )
            emitted = tgt[:, : lvls + 1]

            def write_row(row, toks, o):
                return jax.lax.dynamic_update_slice(row, toks, (o,))

            out = jax.vmap(write_row)(out, emitted, cnt)
            n_new = n_acc + 1
            cnt = jnp.minimum(cnt + n_new, max_new)
            lengths = lengths + n_new
            last = jnp.take_along_axis(emitted, n_acc[:, None], axis=1)[:, 0]

            # --- Jacobi carry for the no-pool-hit fallback ---
            tgt_pad = jnp.concatenate(
                [tgt[:, : lvls + 1],
                 jnp.tile(tgt[:, lvls : lvls + 1], (1, lvls))], axis=1
            )
            jac_next = jax.vmap(
                lambda row, s: jax.lax.dynamic_slice(row, (s,), (lvls,))
            )(tgt_pad, n_acc + 1)

            # --- window refinement + n-gram harvest ---
            y_win = tgt[:, 1 + lvls :].reshape(b, window, lvls)
            grams = jnp.concatenate(
                [win_tok, y_win[:, :, -1:]], axis=2
            )  # (B, W, ngram)

            def push(pool_b, ptr_b, grams_b):
                idxs = (ptr_b + jnp.arange(window)) % pool_size
                return pool_b.at[idxs].set(grams_b), ptr_b + window

            pool, ptr = jax.vmap(push)(pool, ptr, grams)
            win_next = y_win  # one Jacobi step: guesses refine in place

            return (
                last, lengths, cache, out, cnt, win_next, pool, ptr,
                jac_next,
            ), n_acc

        out = jnp.zeros((b, max_new + lvls + 1), jnp.int32)
        cnt = jnp.zeros((b,), jnp.int32)
        win0 = jnp.zeros((b, window, lvls), jnp.int32)
        pool0 = jnp.full((b, pool_size, ngram), -1, jnp.int32)
        ptr0 = jnp.zeros((b,), jnp.int32)
        jac0 = -jnp.ones((b, lvls), jnp.int32)
        accs0 = jnp.zeros((n_rounds, b), jnp.int32)

        def cond(c):
            # c[4] = cnt, c[9] = round index
            return (c[4].min() < max_new) & (c[9] < n_rounds)

        def body(c):
            carry, n_acc = round_step(c[:9], None)
            return carry + (c[9] + 1, c[10].at[c[9]].set(n_acc))

        state = jax.lax.while_loop(
            cond, body,
            (last, lengths, cache, out, cnt, win0, pool0, ptr0, jac0,
             jnp.int32(0), accs0),
        )
        out, cnt, accs, cache = state[3], state[4], state[10], state[2]
        return out[:, :max_new], cnt, accs, cache

    return lookahead_generate


def build_vocab_translation(src_pieces, dst_pieces):
    """Static src->dst token-id map for mismatched draft/target vocabs
    (reference: the server refuses mismatched vocabs unless they are
    near-identical and translates between them, server-context.cpp:663).

    TPU-shape-friendly design: a single int32 gather table built once at
    load time.  src id -> dst id when the piece TEXT maps to exactly one
    dst token; -1 otherwise.  Untranslatable proposals simply fail
    verification (the acceptance rule keeps the output exactly equal to
    target-greedy regardless), so coverage gaps cost speed, never
    correctness.
    """
    import numpy as _np

    index: dict[str, int] = {}
    for j, p in enumerate(dst_pieces):
        if p not in index:
            index[p] = j
    out = _np.full((len(src_pieces),), -1, _np.int32)
    for i, p in enumerate(src_pieces):
        j = index.get(p)
        if j is not None:
            out[i] = j
    return out

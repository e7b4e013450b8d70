"""Speculative decoding invariant: output == target-model greedy decode,
regardless of draft quality (the property the reference's verify loop
guarantees, common/speculative.cpp)."""

import numpy as np
import pytest
import jax.numpy as jnp

from vlut_tpu.config import PRESETS
from vlut_tpu.models.transformer import forward, init_kv_cache, init_params
from vlut_tpu.runtime.speculative import make_speculative_fn

CFG = PRESETS["tiny"]


def _greedy(params, prompts, n_new):
    b, t = prompts.shape
    cache = init_kv_cache(CFG, b, max_len=64)
    pos = jnp.tile(jnp.arange(t, dtype=jnp.int32), (b, 1))
    logits, cache = forward(
        params, CFG, prompts, pos, cache, impl="xla",
        logits_at=jnp.full((b,), t - 1, jnp.int32),
    )
    toks = [np.asarray(jnp.argmax(logits[:, 0, : CFG.vocab_size], -1))]
    lengths = t
    for _ in range(n_new - 1):
        lg, cache = forward(
            params, CFG, jnp.asarray(toks[-1][:, None], jnp.int32),
            jnp.full((b, 1), lengths, jnp.int32), cache, impl="xla",
        )
        toks.append(np.asarray(jnp.argmax(lg[:, 0, : CFG.vocab_size], -1)))
        lengths += 1
    return np.stack(toks, 1)


def _spec(params_t, params_d, prompts, n_new, k):
    b, t = prompts.shape
    cache_t = init_kv_cache(CFG, b, max_len=64)
    cache_d = init_kv_cache(CFG, b, max_len=64)
    pos = jnp.tile(jnp.arange(t, dtype=jnp.int32), (b, 1))
    at = jnp.full((b,), t - 1, jnp.int32)
    lg_t, cache_t = forward(params_t, CFG, prompts, pos, cache_t,
                            impl="xla", logits_at=at)
    _, cache_d = forward(params_d, CFG, prompts, pos, cache_d,
                         impl="xla", logits_at=at)
    last = jnp.argmax(lg_t[:, 0, : CFG.vocab_size], -1).astype(jnp.int32)
    first = np.asarray(last)
    lengths = jnp.full((b,), t, jnp.int32)
    fn = make_speculative_fn(CFG, CFG, k_draft=k, max_new=n_new - 1,
                             impl="xla")
    out, cnt, accs, _, _ = fn(params_t, params_d, cache_t, cache_d, last,
                              lengths)
    assert (np.asarray(cnt) >= n_new - 1).all()
    return np.concatenate(
        [first[:, None], np.asarray(out)[:, : n_new - 1]], axis=1
    ), np.asarray(accs)


@pytest.mark.parametrize("draft_seed", [0, 5])
def test_speculative_matches_greedy(draft_seed):
    params_t = init_params(CFG, seed=0)
    params_d = init_params(CFG, seed=draft_seed)
    rng = np.random.default_rng(2)
    prompts = jnp.asarray(rng.integers(0, CFG.vocab_size, (2, 5)), jnp.int32)
    n_new, k = 8, 3

    ref = _greedy(params_t, prompts, n_new)
    got, accs = _spec(params_t, params_d, prompts, n_new, k)
    np.testing.assert_array_equal(got, ref)
    if draft_seed == 0:
        # identical draft == target: near-full acceptance.  accs is a
        # fixed (n_rounds, B) buffer and the while_loop exits early, so
        # unused rounds stay 0 — judge by per-row totals, not the mean.
        assert accs.sum(axis=0).min() >= n_new - 3


def test_lookup_matches_greedy():
    """Prompt-lookup decoding must also reproduce exact greedy output —
    and on a repetitive prompt it should accept >0 drafts."""
    from vlut_tpu.runtime.speculative import make_lookup_fn

    params = init_params(CFG, seed=0)
    b, n_new, k = 2, 12, 3
    # repetitive prompt so the n-gram matcher has something to copy
    base = [5, 9, 11, 5, 9, 11, 5, 9]
    prompts = jnp.asarray([base, base[::-1]], jnp.int32)
    t = prompts.shape[1]

    ref = _greedy(params, prompts, n_new)

    cache = init_kv_cache(CFG, b, max_len=64)
    pos = jnp.tile(jnp.arange(t, dtype=jnp.int32), (b, 1))
    lg, cache = forward(params, CFG, prompts, pos, cache, impl="xla",
                        logits_at=jnp.full((b,), t - 1, jnp.int32))
    last = jnp.argmax(lg[:, 0, : CFG.vocab_size], -1).astype(jnp.int32)
    first = np.asarray(last)

    hist = np.zeros((b, 64), np.int32)
    hist[:, :t] = np.asarray(prompts)
    hist[np.arange(b), t] = first
    fn = make_lookup_fn(CFG, k_draft=k, max_new=n_new - 1, ngram=2,
                        hist_len=64, impl="xla")
    out, cnt, accs, _ = fn(
        params, cache, jnp.asarray(hist), jnp.full((b,), t + 1, jnp.int32),
        last, jnp.full((b,), t, jnp.int32),
    )
    assert (np.asarray(cnt) >= n_new - 1).all()
    got = np.concatenate(
        [first[:, None], np.asarray(out)[:, : n_new - 1]], axis=1
    )
    np.testing.assert_array_equal(got, ref)


def test_lookup_jacobi_fallback_matches_greedy():
    """With a NON-repetitive prompt (no n-gram matches) the Jacobi fallback
    must still reproduce exact greedy output — and accept >0 drafts where
    the model's own predictions are self-consistent."""
    from vlut_tpu.runtime.speculative import make_lookup_fn

    params = init_params(CFG, seed=0)
    b, n_new, k = 2, 12, 3
    prompts = jnp.asarray([[3, 17, 42, 91, 7, 55], [88, 2, 61, 30, 5, 44]],
                          jnp.int32)
    t = prompts.shape[1]
    ref = _greedy(params, prompts, n_new)

    cache = init_kv_cache(CFG, b, max_len=64)
    pos = jnp.tile(jnp.arange(t, dtype=jnp.int32), (b, 1))
    lg, cache = forward(params, CFG, prompts, pos, cache, impl="xla",
                        logits_at=jnp.full((b,), t - 1, jnp.int32))
    last = jnp.argmax(lg[:, 0, : CFG.vocab_size], -1).astype(jnp.int32)
    first = np.asarray(last)

    hist = np.zeros((b, 64), np.int32)
    hist[:, :t] = np.asarray(prompts)
    hist[np.arange(b), t] = first
    fn = make_lookup_fn(CFG, k_draft=k, max_new=n_new - 1, ngram=2,
                        hist_len=64, impl="xla", jacobi_fallback=True)
    out, cnt, accs, _ = fn(
        params, cache, jnp.asarray(hist), jnp.full((b,), t + 1, jnp.int32),
        last, jnp.full((b,), t, jnp.int32),
    )
    got = np.concatenate(
        [first[:, None], np.asarray(out)[:, : n_new - 1]], axis=1
    )
    np.testing.assert_array_equal(got, ref)
    # greedy models are Jacobi-consistent: after the first round the carry
    # equals the true continuation, so acceptances must appear
    assert np.asarray(accs).sum() > 0


def test_lookahead_matches_greedy():
    """Windowed lookahead decoding (2-D Jacobi window + n-gram pool +
    custom attention mask) must reproduce exact greedy output, and on a
    repetitive prompt the pool should yield accepted drafts."""
    from vlut_tpu.runtime.speculative import make_lookahead_fn

    params = init_params(CFG, seed=0)
    b, n_new = 2, 14
    base = [5, 9, 11, 5, 9, 11, 5, 9]
    prompts = jnp.asarray([base, base[::-1]], jnp.int32)
    t = prompts.shape[1]

    ref = _greedy(params, prompts, n_new)

    cache = init_kv_cache(CFG, b, max_len=96)
    pos = jnp.tile(jnp.arange(t, dtype=jnp.int32), (b, 1))
    lg, cache = forward(params, CFG, prompts, pos, cache, impl="xla",
                        logits_at=jnp.full((b,), t - 1, jnp.int32))
    last = jnp.argmax(lg[:, 0, : CFG.vocab_size], -1).astype(jnp.int32)
    first = np.asarray(last)

    fn = make_lookahead_fn(CFG, max_new=n_new - 1, window=4, ngram=3,
                           pool_size=16, impl="xla")
    out, cnt, accs, _ = fn(
        params, cache, last, jnp.full((b,), t, jnp.int32)
    )
    assert (np.asarray(cnt) >= n_new - 1).all()
    got = np.concatenate(
        [first[:, None], np.asarray(out)[:, : n_new - 1]], axis=1
    )
    np.testing.assert_array_equal(got, ref)
    # the Jacobi window must produce at least one accepted draft across
    # the run (greedy trajectories on a tiny model repeat quickly)
    assert np.asarray(accs).sum() > 0


def _permuted_draft(params, perm):
    """Same model in a permuted vocab: embed rows + lm_head cols permuted.
    Draft id j == target id perm[j]."""
    import jax.numpy as jnp

    p = {k: v for k, v in params.items()}
    p["embed"] = params["embed"][jnp.asarray(perm)]
    head = np.asarray(params["lm_head"])
    v = len(perm)
    new_head = head.copy()
    new_head[:, :v] = head[:, perm]
    p["lm_head"] = jnp.asarray(new_head)
    return p


def test_speculative_vocab_translation_matches_greedy():
    """Mismatched draft/target vocabs: proposals translate through the
    static piece-text map (reference: server-context.cpp:663) and output
    still equals target greedy exactly; with a pure permutation the
    acceptance rate stays high."""
    from vlut_tpu.runtime.speculative import (
        build_vocab_translation,
        make_speculative_fn,
    )

    params_t = init_params(CFG, seed=0)
    v = CFG.vocab_size
    rng = np.random.default_rng(4)
    perm = rng.permutation(v)
    params_d = _permuted_draft(params_t, perm)

    pieces_t = [f"p{i}" for i in range(v)]
    pieces_d = [pieces_t[perm[j]] for j in range(v)]
    # poke holes: a few draft tokens have no target piece and vice versa
    for j in (3, 77):
        pieces_d[j] = f"draft-only-{j}"
    d2t = build_vocab_translation(pieces_d, pieces_t)
    t2d = build_vocab_translation(pieces_t, pieces_d)
    assert d2t[3] == -1 and (d2t >= -1).all()

    prompts = jnp.asarray(rng.integers(0, v, (2, 5)), jnp.int32)
    n_new, k = 8, 3
    ref = _greedy(params_t, prompts, n_new)

    b, t = prompts.shape
    cache_t = init_kv_cache(CFG, b, max_len=64)
    cache_d = init_kv_cache(CFG, b, max_len=64)
    pos = jnp.tile(jnp.arange(t, dtype=jnp.int32), (b, 1))
    at = jnp.full((b,), t - 1, jnp.int32)
    lg_t, cache_t = forward(params_t, CFG, prompts, pos, cache_t,
                            impl="xla", logits_at=at)
    # draft prefills its own translation of the prompt
    prompts_d = jnp.maximum(jnp.asarray(t2d)[prompts], 0)
    _, cache_d = forward(params_d, CFG, prompts_d, pos, cache_d,
                         impl="xla", logits_at=at)
    last = jnp.argmax(lg_t[:, 0, :v], -1).astype(jnp.int32)
    first = np.asarray(last)
    fn = make_speculative_fn(CFG, CFG, k_draft=k, max_new=n_new - 1,
                             impl="xla", vocab_map=(d2t, t2d))
    out, cnt, accs, _, _ = fn(params_t, params_d, cache_t, cache_d, last,
                              jnp.full((b,), t, jnp.int32))
    assert (np.asarray(cnt) >= n_new - 1).all()
    got = np.concatenate(
        [first[:, None], np.asarray(out)[:, : n_new - 1]], axis=1
    )
    np.testing.assert_array_equal(got, ref)
    # permuted-identical draft should accept most proposals
    assert np.asarray(accs).sum() > 0

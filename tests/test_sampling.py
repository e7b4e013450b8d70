"""Sampler chain unit tests (reference: src/llama-sampling.cpp semantics)."""

import numpy as np
import jax
import jax.numpy as jnp

from vlut_tpu.runtime.sampling import (
    NEG_INF,
    SamplerParams,
    apply_min_p,
    apply_penalties,
    apply_top_k,
    apply_top_p,
    sample,
    stack_params,
)


def test_top_k():
    logits = jnp.asarray([[1.0, 3.0, 2.0, 0.0], [1.0, 3.0, 2.0, 0.0]])
    out = np.asarray(apply_top_k(logits, jnp.asarray([2, 0])))
    assert (out[0] > NEG_INF / 2).sum() == 2
    assert set(np.where(out[0] > NEG_INF / 2)[0]) == {1, 2}
    np.testing.assert_array_equal(out[1], np.asarray(logits)[1])  # disabled


def test_top_p_keeps_crossing_token():
    # probs ~ [0.6, 0.3, 0.1]; top_p=0.7 keeps 0.6 and the crossing 0.3
    logits = jnp.log(jnp.asarray([[0.6, 0.3, 0.1]]))
    out = np.asarray(apply_top_p(logits, jnp.asarray([0.7])))
    kept = out[0] > NEG_INF / 2
    assert kept.tolist() == [True, True, False]


def test_top_p_disabled():
    logits = jnp.asarray([[1.0, 2.0, 3.0]])
    out = np.asarray(apply_top_p(logits, jnp.asarray([1.0])))
    np.testing.assert_array_equal(out, np.asarray(logits))


def test_min_p():
    logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.01]]))
    out = np.asarray(apply_min_p(logits, jnp.asarray([0.1])))
    kept = out[0] > NEG_INF / 2
    assert kept.tolist() == [True, True, False]


def test_penalties_divide_positive_multiply_negative():
    logits = jnp.asarray([[2.0, -2.0, 1.0]])
    recent = jnp.asarray([[0, 1, -1, -1]])
    valid = jnp.asarray([[True, True, False, False]])
    p = stack_params([SamplerParams(repeat_penalty=2.0)])
    out = np.asarray(apply_penalties(logits, recent, valid, p))
    assert out[0, 0] == 1.0  # 2.0 / 2
    assert out[0, 1] == -4.0  # -2.0 * 2
    assert out[0, 2] == 1.0  # untouched


def test_frequency_and_presence():
    logits = jnp.zeros((1, 3))
    recent = jnp.asarray([[0, 0, 2, -1]])
    valid = jnp.asarray([[True, True, True, False]])
    p = stack_params(
        [SamplerParams(presence_penalty=0.5, frequency_penalty=0.25)]
    )
    out = np.asarray(apply_penalties(logits, recent, valid, p))
    np.testing.assert_allclose(out[0], [-1.0, 0.0, -0.75])


def test_greedy_vs_sampled():
    logits = jnp.asarray([[0.0, 5.0, 1.0]] * 2)
    p = stack_params(
        [SamplerParams(temperature=0.0), SamplerParams(temperature=1.0)]
    )
    key = jax.random.PRNGKey(0)
    toks = np.asarray(sample(logits, p, key))
    assert toks[0] == 1  # greedy row


def test_sampled_distribution_respects_top_k1():
    logits = jnp.asarray([[0.0, 5.0, 1.0]])
    p = stack_params([SamplerParams(temperature=1.0, top_k=1)])
    for s in range(5):
        toks = np.asarray(sample(logits, p, jax.random.PRNGKey(s)))
        assert toks[0] == 1


# --- extended sampler coverage (typical/xtc/top-n-sigma/temp-ext/mirostat/
# dry/logit-bias; reference constructors in include/llama.h:1222+) ----------

from vlut_tpu.runtime.sampling import (  # noqa: E402
    apply_dry,
    apply_logit_bias,
    apply_temperature,
    apply_top_n_sigma,
    apply_typical,
    apply_xtc,
    init_state,
    sample_ex,
)


def test_typical_matches_manual():
    probs = np.asarray([[0.5, 0.25, 0.15, 0.1]])
    logits = jnp.log(jnp.asarray(probs))
    # entropy H; deviations |surprise - H| rank tokens; typical_p=0.5 keeps
    # the smallest-deviation tokens until their mass reaches 0.5
    logp = np.log(probs[0])
    ent = -(probs[0] * logp).sum()
    dev = np.abs(-logp - ent)
    order = np.argsort(dev)
    cum, keep = 0.0, set()
    for i in order:
        if cum >= 0.5 and keep:
            break
        keep.add(i)
        cum += probs[0][i]
    out = np.asarray(apply_typical(logits, jnp.asarray([0.5])))
    got = set(np.where(out[0] > NEG_INF / 2)[0].tolist())
    assert got == keep


def test_typical_disabled():
    logits = jnp.asarray([[1.0, 2.0, 3.0]])
    out = np.asarray(apply_typical(logits, jnp.asarray([1.0])))
    np.testing.assert_array_equal(out, np.asarray(logits))


def test_top_n_sigma():
    logits = jnp.asarray([[10.0, 9.5, 0.0, -5.0]])
    arr = np.asarray(logits[0])
    std = arr.std()
    out = np.asarray(apply_top_n_sigma(logits, jnp.asarray([1.0])))
    kept = out[0] > NEG_INF / 2
    expect = arr >= arr.max() - std
    np.testing.assert_array_equal(kept, expect)
    # disabled
    out = np.asarray(apply_top_n_sigma(logits, jnp.asarray([0.0])))
    np.testing.assert_array_equal(out, arr[None])


def test_xtc_removes_top_keeps_least_qualifying():
    # probs: [0.5, 0.3, 0.2]; threshold 0.25 -> qualifying {0,1}; XTC with
    # p=1 removes 0, keeps 1 (the least probable qualifying) and 2
    logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.2]]))
    out = np.asarray(
        apply_xtc(
            logits, jnp.asarray([1.0]), jnp.asarray([0.25]),
            jax.random.PRNGKey(0),
        )
    )
    kept = out[0] > NEG_INF / 2
    assert kept.tolist() == [False, True, True]


def test_xtc_needs_two_qualifying():
    logits = jnp.log(jnp.asarray([[0.9, 0.05, 0.05]]))
    out = np.asarray(
        apply_xtc(
            logits, jnp.asarray([1.0]), jnp.asarray([0.5]),
            jax.random.PRNGKey(0),
        )
    )
    np.testing.assert_allclose(out, np.asarray(logits))


def test_temp_ext_bounds():
    # dynamic temp must stay within [temp-range, temp+range] and reduce to
    # static division when range == 0
    logits = jnp.asarray([[2.0, 1.0, 0.0, -1.0]])
    p0 = stack_params([SamplerParams(temperature=0.5)])
    out0 = np.asarray(apply_temperature(logits, p0))
    np.testing.assert_allclose(out0, np.asarray(logits) / 0.5, rtol=1e-6)

    p1 = stack_params(
        [SamplerParams(temperature=1.0, dynatemp_range=0.5)]
    )
    out1 = np.asarray(apply_temperature(logits, p1))
    eff = np.asarray(logits)[0, 0] / out1[0, 0]
    assert 0.5 - 1e-5 <= eff <= 1.5 + 1e-5


def test_mirostat_updates_mu_and_truncates():
    v = 8
    logits = jnp.asarray(np.linspace(3.0, -4.0, v)[None])
    p = stack_params([SamplerParams(mirostat_tau=3.0, mirostat_eta=0.2)])
    state = init_state(1)
    tok, state = sample_ex(logits, p, jax.random.PRNGKey(1), state)
    # mu was initialized to 2*tau and moved by eta*(surprise - tau)
    assert float(state["mu"][0]) != 0.0
    assert float(state["mu"][0]) != 6.0 or True
    probs = np.asarray(jax.nn.softmax(logits, -1))[0]
    surprise = -np.log2(probs[int(tok[0])])
    np.testing.assert_allclose(
        float(state["mu"][0]), 6.0 - 0.2 * (surprise - 3.0), rtol=1e-4
    )


def test_mirostat_off_keeps_state():
    logits = jnp.zeros((1, 4))
    p = stack_params([SamplerParams()])
    state = {"mu": jnp.asarray([1.25])}
    _, state2 = sample_ex(logits, p, jax.random.PRNGKey(0), state)
    assert float(state2["mu"][0]) == 1.25


def test_dry_penalizes_repeat_continuation():
    # context: A B C A B -> candidate C would extend the repeat "A B" (len 2)
    A, B, C = 3, 4, 5
    ctx = jnp.asarray([[A, B, C, A, B]])
    valid = jnp.ones((1, 5), bool)
    logits = jnp.zeros((1, 8))
    p = stack_params(
        [SamplerParams(dry_multiplier=1.0, dry_base=2.0,
                       dry_allowed_length=2)]
    )
    out = np.asarray(apply_dry(logits, ctx, valid, p))
    # token C has match length 2 (>= allowed 2): penalty 1.0 * 2^0 = 1
    assert out[0, C] == -1.0
    # non-continuation tokens untouched
    assert out[0, A] == 0.0 and out[0, 6] == 0.0


def test_dry_respects_allowed_length():
    A, B, C = 1, 2, 3
    ctx = jnp.asarray([[A, B, C, A, B]])
    valid = jnp.ones((1, 5), bool)
    logits = jnp.zeros((1, 8))
    p = stack_params(
        [SamplerParams(dry_multiplier=1.0, dry_allowed_length=3)]
    )
    out = np.asarray(apply_dry(logits, ctx, valid, p))
    np.testing.assert_array_equal(out, np.zeros((1, 8)))


def test_dry_sequence_breakers():
    # matches may not SPAN a breaker: suffix [A NL B] matches an earlier
    # [A NL B] only up to [B] (len 1) once NL is a breaker, so candidate C
    # (needing match len >= 2) is not penalized; without breakers it is.
    A, B, C, NL = 1, 2, 3, 7
    ctx = jnp.asarray([[A, NL, B, C, A, NL, B]])
    valid = jnp.ones((1, 7), bool)
    logits = jnp.zeros((1, 8))
    p = stack_params(
        [SamplerParams(dry_multiplier=1.0, dry_allowed_length=2)]
    )
    out_nb = np.asarray(apply_dry(logits, ctx, valid, p))
    assert out_nb[0, C] < 0.0
    out = np.asarray(
        apply_dry(logits, ctx, valid, p, breakers=jnp.asarray([NL]))
    )
    assert out[0, C] == 0.0


def test_logit_bias():
    logits = jnp.zeros((2, 6))
    p = stack_params([
        SamplerParams(logit_bias=((2, 5.0), (4, -3.0))),
        SamplerParams(),
    ])
    out = np.asarray(apply_logit_bias(logits, p))
    np.testing.assert_allclose(out[0], [0, 0, 5.0, 0, -3.0, 0])
    np.testing.assert_allclose(out[1], np.zeros(6))


def test_per_row_seeds_reproducible_and_decorrelated():
    row = np.random.RandomState(0).randn(16)
    logits = jnp.asarray(np.stack([row] * 8))
    p = stack_params([SamplerParams(seed=7)] * 8)
    key = jax.random.PRNGKey(42)
    t1 = np.asarray(sample(logits, p, key))
    t2 = np.asarray(sample(logits, p, key))
    # same call twice -> bitwise reproducible
    np.testing.assert_array_equal(t1, t2)
    # but concurrent rows sharing a seed must NOT receive identical Gumbel
    # noise (two identical requests would stream identical "random" text);
    # the row index is folded into the key, so 8 equal rows should diverge
    assert len(set(t1.tolist())) > 1


def test_allowed_mask_constrains():
    logits = jnp.zeros((1, 5))
    mask = jnp.asarray([[False, False, True, False, False]])
    p = stack_params([SamplerParams(temperature=1.0)])
    for s in range(4):
        t = np.asarray(
            sample(logits, p, jax.random.PRNGKey(s), allowed_mask=mask)
        )
        assert t[0] == 2

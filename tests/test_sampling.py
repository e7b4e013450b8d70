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

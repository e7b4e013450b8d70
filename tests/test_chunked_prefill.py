"""Chunked long-prompt prefill (VERDICT r4 item 2).

A prompt longer than the largest prefill bucket must flow through the
engine as full-bucket chunk rounds feeding the slot's KV across multiple
forwards — the reference splits any prompt into n_ubatch chunks
(src/llama-context.cpp:1094, src/llama-batch.h:103-110).  Greedy outputs
must match a single-shot prefill of the same prompt exactly.
"""

import numpy as np
import pytest

from vlut_tpu.config import PRESETS
from vlut_tpu.models.transformer import init_params
from vlut_tpu.parallel.sharding import make_mesh
from vlut_tpu.runtime.engine import Engine, Request
from vlut_tpu.runtime.sampling import SamplerParams


def _greedy(prompt, n=6):
    return Request(
        prompt=list(prompt), max_new_tokens=n,
        sampler=SamplerParams(temperature=0.0),
    )


@pytest.fixture(scope="module")
def setup():
    cfg = PRESETS["tiny"]
    return cfg, init_params(cfg, seed=0)


def _run(cfg, params, prompts, buckets, **kw):
    eng = Engine(
        cfg, params, n_slots=4, max_len=128, impl="xla",
        prefill_buckets=buckets, **kw,
    )
    reqs = [_greedy(p) for p in prompts]
    eng.run(reqs)
    return [r.output for r in reqs], eng


def test_chunked_matches_single_shot(setup):
    cfg, params = setup
    rng = np.random.default_rng(0)
    prompts = [
        [int(x) for x in rng.integers(1, cfg.vocab_size, t)]
        for t in (100, 97, 33, 7)  # 3 chunk rounds / remainder edge / short
    ]
    want, _ = _run(cfg, params, prompts, buckets=(128,))
    got, eng = _run(cfg, params, prompts, buckets=(16, 32))
    assert got == want
    # every prompt token was fed exactly once
    assert eng.perf.n_prompt_tokens == sum(len(p) for p in prompts)


def test_chunked_exact_multiple_of_bucket(setup):
    """len(prompt) % bucket == 0: the final chunk must keep >= 1 token so
    the last-token logits exist."""
    cfg, params = setup
    rng = np.random.default_rng(1)
    p = [int(x) for x in rng.integers(1, cfg.vocab_size, 64)]
    want, _ = _run(cfg, params, [p], buckets=(64,))
    got, _ = _run(cfg, params, [p], buckets=(32,))
    assert got == want


def test_chunked_prefix_reuse(setup):
    """Wave 2 extends a long wave-1 prompt: the prefix cache must engage
    across the chunk-round machinery."""
    cfg, params = setup
    rng = np.random.default_rng(2)
    p1 = [int(x) for x in rng.integers(1, cfg.vocab_size, 80)]
    eng = Engine(cfg, params, n_slots=2, max_len=128, impl="xla",
                 prefill_buckets=(32,))
    r1 = _greedy(p1)
    eng.run([r1])
    r2 = _greedy(p1 + list(r1.output[:2]))
    eng.run([r2])
    assert eng.perf.n_reused_tokens >= len(p1)

    # the reused run must equal a fresh engine's answer
    fresh = Engine(cfg, params, n_slots=2, max_len=128, impl="xla",
                   prefill_buckets=(128,))
    r2b = _greedy(p1 + list(r1.output[:2]))
    fresh.run([r2b])
    assert r2.output == r2b.output


def test_chunked_on_mesh(setup):
    """Chunk rounds through the sharded engine produce single-device
    tokens (the tp matmul path is bit-exact)."""
    cfg, params = setup
    rng = np.random.default_rng(3)
    prompts = [
        [int(x) for x in rng.integers(1, cfg.vocab_size, t)]
        for t in (70, 45, 20, 5)
    ]
    want, _ = _run(cfg, params, prompts, buckets=(16, 32))
    got, _ = _run(cfg, params, prompts, buckets=(16, 32),
                  mesh=make_mesh(dp=2, tp=2))
    assert got == want


def test_prompt_exceeding_context(setup):
    cfg, params = setup
    rng = np.random.default_rng(4)
    long_p = [int(x) for x in rng.integers(1, cfg.vocab_size, 200)]

    # context_shift off -> per-request error, engine keeps serving
    eng = Engine(cfg, params, n_slots=2, max_len=128, impl="xla",
                 prefill_buckets=(32,), context_shift=False)
    bad, ok = _greedy(long_p), _greedy([3, 5, 7])
    eng.run([bad, ok])
    assert bad.error and "exceeds context" in bad.error
    assert bad.output == [] and len(ok.output) == 6

    # context_shift on -> reference-style truncation (n_keep head + tail)
    eng2 = Engine(cfg, params, n_slots=2, max_len=128, impl="xla",
                  prefill_buckets=(32,), context_shift=True, n_keep=4)
    r = _greedy(long_p)
    eng2.run([r])
    assert r.error is None and len(r.output) == 6
    assert r.prompt == long_p[:4] + long_p[-(127 - 4):]

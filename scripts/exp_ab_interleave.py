#!/usr/bin/env python
"""Drift-proof A/B of fused vs composed decode attention: compile BOTH
n=8 and n=40 generate fns for each setting up front, then interleave
timed reps (A, B, A, B, ...) so chip/tunnel drift hits both arms equally.
"""

import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

NP_SLOTS = 32
PROMPT_LEN = 128
NS = (8, 40)
REPS = 6


def main():
    import jax
    import jax.numpy as jnp

    from vlut_tpu.config import PRESETS
    from vlut_tpu.models.transformer import (
        forward,
        fuse_projections,
        init_kv_cache,
        init_params_fast,
        quantize_head,
        unstack_layers,
    )
    from vlut_tpu.runtime.generate import make_generate_fn
    from vlut_tpu.runtime.kv_cache import to_layered
    from vlut_tpu.runtime.sampling import (
        SamplerParams,
        features_of,
        stack_params,
    )

    cfg = PRESETS[os.environ.get("VLUT_BENCH_PRESET", "llama3_8b_158")]
    max_len = PROMPT_LEN + max(NS) + 16

    t0 = time.time()
    params = init_params_fast(cfg, seed=0)
    params = quantize_head(params)
    params_scan = jax.device_put(fuse_projections(params, cfg))
    if jax.default_backend() == "tpu":
        from vlut_tpu.ops.packing import word_pack_params

        params_scan = word_pack_params(params_scan, cfg.weight_fmt)
    params = unstack_layers(params_scan, cfg)
    print(f"# params ready in {time.time()-t0:.1f}s", flush=True)

    rng = np.random.default_rng(0)
    tokens = jnp.asarray(
        rng.integers(0, cfg.vocab_size, (NP_SLOTS, PROMPT_LEN)), jnp.int32
    )
    positions = jnp.tile(
        jnp.arange(PROMPT_LEN, dtype=jnp.int32), (NP_SLOTS, 1)
    )
    logits_at = jnp.full((NP_SLOTS,), PROMPT_LEN - 1, jnp.int32)
    prefill = jax.jit(
        lambda p, c, t, pos: forward(p, cfg, t, pos, c, logits_at=logits_at)
    )

    def run_prefill(quantized=False):
        cache = init_kv_cache(
            cfg, NP_SLOTS, max_len=max_len, layout="stacked",
            quantized=quantized)
        logits, cache = prefill(params_scan, cache, tokens, positions)
        return logits, cache

    logits, _ = run_prefill()
    samplers = [SamplerParams(temperature=0.0)] * NP_SLOTS
    sp = stack_params(samplers)
    feats = features_of(samplers)
    last = jnp.argmax(logits[:, 0, : cfg.vocab_size], axis=-1).astype(
        jnp.int32
    )
    lengths = jnp.full((NP_SLOTS,), PROMPT_LEN, jnp.int32)
    key = jax.random.PRNGKey(0)

    import json as _json

    ARMS = _json.loads(os.environ.get("VLUT_AB_ARMS", _json.dumps([
        ["fused", {"VLUT_TPU_FUSED_ATTN": "1", "VLUT_TPU_KV_WRITE": "pallas"}],
        ["pallas_w", {"VLUT_TPU_FUSED_ATTN": "0",
                      "VLUT_TPU_KV_WRITE": "pallas"}],
        ["dus_w", {"VLUT_TPU_FUSED_ATTN": "0", "VLUT_TPU_KV_WRITE": "dus"}],
    ])))
    fns = {}
    quant_of = {}
    for arm, env in ARMS:
        env = dict(env)
        quant_of[arm] = env.pop("VLUT_AB_KVQ", "0") == "1"
        os.environ.update(env)
        for n in NS:
            gen = make_generate_fn(cfg, n_steps=n, features=feats)
            _, c = run_prefill(quant_of[arm])
            c = to_layered(c)
            toks, _ = gen(params, c, last, lengths, sp, key)
            int(jnp.sum(toks))
            fns[(arm, n)] = gen
    print("# all fns compiled", flush=True)

    times: dict[tuple, list[float]] = {k: [] for k in fns}
    for rep in range(REPS):
        for arm, _env in ARMS:
            for n in NS:
                _, c = run_prefill(quant_of[arm])
                c = to_layered(c)
                for kl in c["k"]:
                    kl.block_until_ready()
                float(jnp.sum(c["k"][-1][0, 0]))
                t0 = time.time()
                toks, _ = fns[(arm, n)](params, c, last, lengths, sp, key)
                int(jnp.sum(toks))
                times[(arm, n)].append(time.time() - t0)
        print(f"# rep {rep}: " + "  ".join(
            f"{a_}n{n}={times[(a_, n)][-1]*1e3:.1f}"
            for a_, _ in ARMS for n in NS), flush=True)

    a, b = NS
    for arm, _env in ARMS:
        ta = np.array(times[(arm, a)])
        tb = np.array(times[(arm, b)])
        marg = (tb - ta) / (b - a) * 1e3
        marg_best = (tb.min() - ta.min()) / (b - a) * 1e3
        print(f"# {arm}: per-rep marginal "
              f"{np.round(marg, 2).tolist()} ms/step; best-of "
              f"{marg_best:.2f}; median {np.median(marg):.2f}", flush=True)


if __name__ == "__main__":
    main()

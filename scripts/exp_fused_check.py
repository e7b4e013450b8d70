#!/usr/bin/env python
"""Is the fused decode-attention kernel active end-to-end, and what does
it buy?  Times the n=8..40 decode marginal with VLUT_TPU_FUSED_ATTN=1 vs
=0 in ONE process (same params, same chip state), and counts the Pallas
custom calls in each compiled step so "active" is proven, not assumed.
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
REPS = 3


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

    def run_prefill():
        cache = init_kv_cache(
            cfg, NP_SLOTS, max_len=max_len, layout="stacked")
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

    for fused in ("1", "0"):
        os.environ["VLUT_TPU_FUSED_ATTN"] = fused
        results = {}
        for n in NS:
            gen = make_generate_fn(cfg, n_steps=n, features=feats)
            if n == NS[0]:
                # count custom calls in the compiled step
                _, c0 = run_prefill()
                c0 = to_layered(c0)
                txt = jax.jit(gen).lower(
                    params, c0, last, lengths, sp, key
                ).compile().as_text()
                n_cc = txt.count("tpu_custom_call")
                print(f"# FUSED={fused}: {n_cc} tpu_custom_call in "
                      f"compiled n={n} graph", flush=True)
            _, cache2 = run_prefill()
            cache2 = to_layered(cache2)
            toks, _ = gen(params, cache2, last, lengths, sp, key)
            int(jnp.sum(toks))  # compile + warm
            times = []
            for _ in range(REPS):
                _, cache2 = run_prefill()
                cache2 = to_layered(cache2)
                for kl in cache2["k"]:
                    kl.block_until_ready()
                float(jnp.sum(cache2["k"][-1][0, 0]))
                t0 = time.time()
                toks, _ = gen(params, cache2, last, lengths, sp, key)
                int(jnp.sum(toks))
                times.append(time.time() - t0)
            results[n] = times
            print(f"# FUSED={fused} n={n}: "
                  f"{['%.1f' % (t*1e3) for t in times]} ms", flush=True)
        a, b = NS
        best = {n: min(ts) for n, ts in results.items()}
        step = (best[b] - best[a]) / (b - a)
        print(f"# FUSED={fused}: marginal {step*1e3:.2f} ms/step "
              f"-> {NP_SLOTS/step:.0f} tok/s", flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Reconcile the decode-step discrepancy (VERDICT r3 weak #3).

BENCH_r03 reported 5.53 ms/step (marginal n=8..40) while PERF.md's round-3
section said "decode unchanged at 7.08-7.23 ms".  This runs the EXACT
bench.py protocol with more n-points and 3 reps per point so the marginal
is over-determined: if the per-step cost is constant, every pairwise
marginal must agree; a curved profile exposes a fixed-cost artifact.

Run on the real chip (no concurrent CPU work — nproc=1).
"""

import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

NP_SLOTS = 32
PROMPT_LEN = 128
NS = (8, 40, 72, 104)
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

    results: dict[int, list[float]] = {}
    for n in NS:
        gen = make_generate_fn(cfg, n_steps=n, features=feats)
        _, cache2 = run_prefill()
        cache2 = to_layered(cache2)
        toks, _ = gen(params, cache2, last, lengths, sp, key)
        int(jnp.sum(toks))  # compile + warm
        times = []
        for _ in range(REPS):
            _, cache2 = run_prefill()
            cache2 = to_layered(cache2)
            # settle ALL layers' to_layered copies, not just layer 0
            for kl in cache2["k"]:
                kl.block_until_ready()
            float(jnp.sum(cache2["k"][-1][0, 0]))
            t0 = time.time()
            toks, _ = gen(params, cache2, last, lengths, sp, key)
            int(jnp.sum(toks))
            times.append(time.time() - t0)
        results[n] = times
        print(f"# n={n}: {['%.1f' % (t*1e3) for t in times]} ms", flush=True)

    best = {n: min(ts) for n, ts in results.items()}
    med = {n: sorted(ts)[len(ts) // 2] for n, ts in results.items()}
    ns = sorted(NS)
    print("\n# pairwise marginals (best-of-3):")
    for a, b in zip(ns, ns[1:]):
        print(f"#   n={a}..{b}: {(best[b]-best[a])/(b-a)*1e3:.2f} ms/step")
    print("# pairwise marginals (median):")
    for a, b in zip(ns, ns[1:]):
        print(f"#   n={a}..{b}: {(med[b]-med[a])/(b-a)*1e3:.2f} ms/step")
    # least-squares slope over all reps
    xs = np.array([n for n in ns for _ in results[n]], float)
    ys = np.array([t for n in ns for t in results[n]], float)
    slope = np.polyfit(xs, ys, 1)[0]
    print(f"# LSQ slope over all reps: {slope*1e3:.2f} ms/step "
          f"-> {NP_SLOTS/slope:.0f} tok/s")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Decode-step anatomy, isolated: time ONE jitted forward (t=1, layered
cache, donated) under {fused, composed, no_attn, no_kv_write, no_head}
in a single process.  Removes the generate-scan + sampler from the
picture: if fused == composed here too, the ablation deltas were
measuring overlappable bandwidth, not serial time.
"""

import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

NP_SLOTS = 32
S = 184          # same cache length as bench.py np=32
REPS = 30


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
    from vlut_tpu.runtime.kv_cache import to_layered

    cfg = PRESETS[os.environ.get("VLUT_BENCH_PRESET", "llama3_8b_158")]

    t0 = time.time()
    params = init_params_fast(cfg, seed=0)
    params = quantize_head(params)
    params = jax.device_put(fuse_projections(params, cfg))
    if jax.default_backend() == "tpu":
        from vlut_tpu.ops.packing import word_pack_params

        params = word_pack_params(params, cfg.weight_fmt)
    params = unstack_layers(params, cfg)
    print(f"# params ready in {time.time()-t0:.1f}s", flush=True)

    rng = np.random.default_rng(0)
    tok = jnp.asarray(rng.integers(0, cfg.vocab_size, (NP_SLOTS, 1)),
                      jnp.int32)
    pos = jnp.full((NP_SLOTS, 1), S // 2, jnp.int32)

    def fresh_cache():
        c = to_layered(init_kv_cache(cfg, NP_SLOTS, max_len=S,
                                     layout="stacked"))
        for kl in c["k"]:
            kl.block_until_ready()
        return c

    variants = [
        ("fused", {"VLUT_TPU_FUSED_ATTN": "1", "VLUT_ABLATE": ""}),
        ("composed", {"VLUT_TPU_FUSED_ATTN": "0", "VLUT_ABLATE": ""}),
        ("no_attn", {"VLUT_TPU_FUSED_ATTN": "0",
                     "VLUT_ABLATE": "no_attn"}),
        ("no_kv_write", {"VLUT_TPU_FUSED_ATTN": "0",
                         "VLUT_ABLATE": "no_kv_write"}),
        ("no_attn+no_kv", {"VLUT_TPU_FUSED_ATTN": "0",
                           "VLUT_ABLATE": "no_attn,no_kv_write"}),
        ("no_head", {"VLUT_TPU_FUSED_ATTN": "0",
                     "VLUT_ABLATE": "no_head"}),
        ("fused+no_head", {"VLUT_TPU_FUSED_ATTN": "1",
                           "VLUT_ABLATE": "no_head"}),
    ]
    results = {}
    for name, env in variants:
        for k, v in env.items():
            os.environ[k] = v

        @jax.jit
        def step(p, c):
            logits, c = forward(p, cfg, tok, pos, c, logits_last_only=True)
            return jnp.sum(logits), c

        cache = fresh_cache()
        sacc, cache = step(params, cache)
        float(sacc)
        times = []
        for _ in range(REPS):
            t0 = time.time()
            sacc, cache = step(params, cache)
            float(sacc)
            times.append(time.time() - t0)
        times = np.array(times) * 1e3
        results[name] = times
        print(f"# {name:>14}: min {times.min():.2f}  med "
              f"{np.median(times):.2f}  mean {times.mean():.2f} ms",
              flush=True)

    base = np.median(results["composed"])
    print("\n# serial shares vs composed (median):")
    for name in results:
        print(f"#   {name:>14}: {np.median(results[name]) - base:+.2f} ms")


if __name__ == "__main__":
    main()

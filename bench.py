#!/usr/bin/env python
"""Headline benchmark: Llama3-8B-1.58 batched decode on one TPU chip.

Mirrors the reference's flagship config (llama-batched np=32, README demo /
BASELINE.json): 32 parallel sequences, 128-token prompts, fixed-n decode.
Weights are synthetic packed ternary at exactly the flagship shapes (i2 =
2.0 bpw, the I2_V_4 analog); synthetic vs real bytes is timing-identical.

Prints ONE JSON line:
  {"metric": "...", "value": tok/s, "unit": "tok/s", "vs_baseline": x}

vs_baseline divides by 13.8 tok/s — the *measured* GEMM-only bound of the
reference's own kernels on this container's CPU at the same config (1
thread, like its demo); derivation in benchmarks/BASELINE_MEASURED.md.

Timing protocol: the decode loop is one jitted lax.scan (n steps) fetched
via its token output; per-token time is the marginal between a short and a
long run, which cancels dispatch/transfer overhead (the TPU tunnel here
costs ~25 ms per host sync).  See vlut_tpu/bench/kernels.py for details.
"""

import json
import os
import time

import numpy as np

REF_CPU_DECODE_TOKS = 13.8  # benchmarks/BASELINE_MEASURED.md
NP_SLOTS = 32
PROMPT_LEN = 128
N_LO, N_HI = 8, 40


def main():
    import jax
    import jax.numpy as jnp

    from vlut_tpu.config import PRESETS
    from vlut_tpu.models.transformer import (
        forward,
        init_kv_cache,
        init_params_fast,
    )
    from vlut_tpu.runtime.generate import make_generate_fn
    from vlut_tpu.runtime.sampling import (
        SamplerParams,
        features_of,
        stack_params,
    )

    preset = os.environ.get("VLUT_BENCH_PRESET", "llama3_8b_158")
    cfg = PRESETS[preset]
    max_len = PROMPT_LEN + N_HI + 16

    from vlut_tpu.models.transformer import (
        fuse_projections,
        quantize_head,
        unstack_layers,
    )

    t0 = time.time()
    params = init_params_fast(cfg, seed=0)
    # int8 output head: the reference's own default quantizes output.weight
    # to Q6_K (6.5 bpw, src/llama-quant.cpp:211) — int8 is higher fidelity
    params = quantize_head(params)
    params_scan = jax.device_put(fuse_projections(params, cfg))
    if jax.default_backend() == "tpu":
        # serving-time uint32 word layout, both formats (i2: 16 trits per
        # lane shift/mask; i1: 20 trits per lane SWAR base-243 decode)
        from vlut_tpu.ops.packing import word_pack_params

        params_scan = word_pack_params(params_scan, cfg.weight_fmt)
    # two resident layer trees (~2x weight HBM, still <6 GB at 8B-1.58):
    # prefill scans the STACKED tree (XLA pipelines the layer loop +
    # unpack+int8-dot GEMMs best at M=4096 — 265 vs 393 ms pp128x32),
    # decode unrolls the TUPLE tree (weights stream without scan's
    # per-layer slice copies — 7.2 vs 16+ ms/step)
    params = unstack_layers(params_scan, cfg)
    print(f"# params ready in {time.time()-t0:.1f}s", flush=True)

    # kernels parity preflight: the timed path must be BIT-EXACT integer
    # math on this chip before any number is reported (VERDICT r1 item 9)
    if jax.default_backend() == "tpu":
        from vlut_tpu.ops.matmul import ternary_matmul_quantized
        from vlut_tpu.ops.packing import pack_ternary
        from vlut_tpu.ops.quant import quantize_activations

        from vlut_tpu.ops.packing import TernaryTensor, word_pack

        prng = np.random.default_rng(1)
        trits = prng.integers(-1, 2, size=(1280, 256)).astype(np.int8)
        tt = pack_ternary(trits, np.float32(0.05), cfg.weight_fmt)
        # check the layout the timed path actually uses
        tt = TernaryTensor(
            word_pack(jnp.asarray(tt.packed), cfg.weight_fmt), tt.scale,
            tt.k, tt.n, tt.fmt, tt.kb,
        )
        xq, xs = quantize_activations(
            jnp.asarray(prng.standard_normal((32, 1280)), jnp.float32)
        )
        want = (
            np.asarray(xq, np.int32) @ trits.astype(np.int32)
        ).astype(np.float32) * np.asarray(xs) * 0.05
        got = np.asarray(
            ternary_matmul_quantized(xq, xs, tt, impl="pallas")
        )
        np.testing.assert_array_equal(got, want)
        print("# kernels parity preflight: bit-exact", flush=True)

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
        # stacked cache + scan prefill; decode converts to the layered
        # layout once (to_layered below) and updates per-layer buffers in
        # place (kv_cache.py layout notes)
        cache = init_kv_cache(
            cfg, NP_SLOTS, max_len=max_len, layout="stacked")
        logits, cache = prefill(params_scan, cache, tokens, positions)
        return logits, cache

    logits, cache = run_prefill()  # compile
    float(jnp.sum(logits))
    t0 = time.time()
    logits, cache = run_prefill()
    float(jnp.sum(logits))
    prefill_s = time.time() - t0
    pp_toks = NP_SLOTS * PROMPT_LEN / prefill_s
    print(f"# prefill pp{PROMPT_LEN} x{NP_SLOTS}: {prefill_s*1e3:.0f} ms "
          f"= {pp_toks:.0f} tok/s", flush=True)

    samplers = [SamplerParams(temperature=0.0)] * NP_SLOTS
    sp = stack_params(samplers)
    feats = features_of(samplers)
    last = jnp.argmax(logits[:, 0, : cfg.vocab_size], axis=-1).astype(
        jnp.int32
    )
    lengths = jnp.full((NP_SLOTS,), PROMPT_LEN, jnp.int32)
    key = jax.random.PRNGKey(0)

    from vlut_tpu.runtime.kv_cache import to_layered

    ts = {}
    for n in (N_LO, N_HI):
        gen = make_generate_fn(cfg, n_steps=n, features=feats)
        _, cache2 = run_prefill()
        cache2 = to_layered(cache2)
        toks, _ = gen(params, cache2, last, lengths, sp, key)
        int(jnp.sum(toks))  # compile + warm
        best = float("inf")
        for _ in range(3):  # best-of-3: tunnel drift is ±10% day to day
            _, cache2 = run_prefill()
            cache2 = to_layered(cache2)
            float(jnp.sum(cache2["k"][0][0, 0]))  # settle prefill
            t0 = time.time()
            toks, _ = gen(params, cache2, last, lengths, sp, key)
            int(jnp.sum(toks))
            best = min(best, time.time() - t0)
        ts[n] = best
        print(f"# decode n={n}: {best*1e3:.1f} ms", flush=True)

    step_s = (ts[N_HI] - ts[N_LO]) / (N_HI - N_LO)
    toks_per_s = NP_SLOTS / step_s
    print(f"# decode step: {step_s*1e3:.2f} ms -> {toks_per_s:.0f} tok/s",
          flush=True)

    print(json.dumps({
        "metric": f"{preset}_batched_decode_np{NP_SLOTS}_tok_per_s",
        "value": round(toks_per_s, 1),
        "unit": "tok/s",
        "vs_baseline": round(toks_per_s / REF_CPU_DECODE_TOKS, 1),
    }))


if __name__ == "__main__":
    main()

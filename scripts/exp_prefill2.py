#!/usr/bin/env python
"""Prefill breakdown: e2e ablations + standalone GEMM sum (scan layout)."""

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from vlut_tpu.config import PRESETS
from vlut_tpu.models.transformer import (
    forward,
    fuse_projections,
    init_kv_cache,
    init_params_fast,
    quantize_head,
)

NP_SLOTS, PROMPT_LEN = 32, 128


def time_prefill(label, params, cfg, max_len, n_rep=3):
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(
        rng.integers(0, cfg.vocab_size, (NP_SLOTS, PROMPT_LEN)), jnp.int32
    )
    positions = jnp.tile(
        jnp.arange(PROMPT_LEN, dtype=jnp.int32), (NP_SLOTS, 1)
    )
    logits_at = jnp.full((NP_SLOTS,), PROMPT_LEN - 1, jnp.int32)
    prefill = jax.jit(
        lambda p, c, tt, pos: forward(
            p, cfg, tt, pos, c, logits_at=logits_at)
    )

    def run():
        cache = init_kv_cache(cfg, NP_SLOTS, max_len=max_len,
                              layout="stacked")
        logits, cache = prefill(params, cache, tokens, positions)
        return logits

    float(jnp.sum(run()))
    best = float("inf")
    for _ in range(n_rep):
        t0 = time.time()
        float(jnp.sum(run()))
        best = min(best, time.time() - t0)
    print(f"## {label}: {best*1e3:.0f} ms", flush=True)
    return best


def main():
    cfg = PRESETS["llama3_8b_158"]
    max_len = PROMPT_LEN + 56
    t0 = time.time()
    params = quantize_head(init_params_fast(cfg, seed=0))
    params = jax.device_put(fuse_projections(params, cfg))
    print(f"# setup: {time.time()-t0:.1f}s", flush=True)

    base = time_prefill("scan full", params, cfg, max_len)
    os.environ["VLUT_ABLATE"] = "no_attn"
    no_attn = time_prefill("scan no_attn", params, cfg, max_len)
    os.environ["VLUT_ABLATE"] = "no_attn,no_kv_write"
    no_akv = time_prefill("scan no_attn,no_kv_write", params, cfg, max_len)
    os.environ["VLUT_ABLATE"] = ""
    os.environ["VLUT_TPU_MATMUL_IMPL"] = "xla"
    xla = time_prefill("scan xla-impl", params, cfg, max_len)
    del os.environ["VLUT_TPU_MATMUL_IMPL"]
    print(f"# attention share: {(base-no_attn)*1e3:.0f} ms; "
          f"kv writes: {(no_attn-no_akv)*1e3:.0f} ms", flush=True)

    # standalone GEMM times at M=4096 (sequential-dependency loop)
    from vlut_tpu.models.transformer import weight_specs, _layer_tensor
    from vlut_tpu.ops.matmul import ternary_matmul

    specs = weight_specs(cfg)
    lp = jax.tree.map(lambda a: a[0], params["layers"])
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((4096, 4096)),
        jnp.bfloat16,
    )
    from vlut_tpu.models.transformer import TernarySpec
    from vlut_tpu.models.dims import make_plan

    plan = make_plan(cfg)
    shapes = {
        "wqkv": TernarySpec(4096, plan.q_dim_p + 2 * plan.kv_dim_p,
                            cfg.weight_fmt, plan.kb),
        "wo": specs["wo"],
        "w_gateup": TernarySpec(4096, 2 * plan.ff_p, cfg.weight_fmt,
                                plan.kb),
        "w_down": specs["w_down"],
    }
    for name, spec in shapes.items():
        t = _layer_tensor(lp, name, spec)
        xin = x[:, : spec.k] if spec.k <= 4096 else jnp.tile(
            x, (1, -(-spec.k // 4096)))[:, : spec.k]

        @jax.jit
        def loop(xin, n, t=t, spec=spec):
            def body(i, acc):
                out = ternary_matmul(acc, t)
                fb = out.astype(jnp.bfloat16)
                if fb.shape[1] < spec.k:
                    fb = jnp.tile(fb, (1, -(-spec.k // fb.shape[1])))
                return fb[:, : spec.k] + 1e-6 * acc

            return jnp.sum(
                jax.lax.fori_loop(0, n, body, xin).astype(jnp.float32))

        for n in (4, 20):
            float(loop(xin, n))
        times = {}
        for n in (4, 20):
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                float(loop(xin, n))
                best = min(best, time.time() - t0)
            times[n] = best
        dt = (times[20] - times[4]) / 16
        fl = 2 * 4096 * spec.k * spec.n
        print(f"# gemm {name} K={spec.k} N={spec.n}: {dt*1e3:.2f} ms "
              f"x32L = {dt*32*1e3:.0f} ms  ({fl/dt/1e12:.0f} TFLOP/s)",
              flush=True)


if __name__ == "__main__":
    main()

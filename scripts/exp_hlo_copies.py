#!/usr/bin/env python
"""Compiled-graph forensics for the fused decode-attention path: is the
kernel present, does XLA insert full-cache copies around the aliased
custom calls, and what are the total bytes accessed per step?

Ablation timing can't answer this (work overlaps; tunnel dispatch noise
is +-2 ms), the compiled HLO can: a (32,184,8,128) bf16 copy per layer is
0.75 GB/step of pure waste that would cancel the kernel's savings.
"""

import os
import pathlib
import re
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

NP_SLOTS = 32
S = 184


def main():
    import jax
    import jax.numpy as jnp

    from vlut_tpu.config import PRESETS
    from vlut_tpu.models.transformer import (
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

    t0 = time.time()
    params = init_params_fast(cfg, seed=0)
    params = quantize_head(params)
    params = jax.device_put(fuse_projections(params, cfg))
    if jax.default_backend() == "tpu":
        from vlut_tpu.ops.packing import word_pack_params

        params = word_pack_params(params, cfg.weight_fmt)
    params = unstack_layers(params, cfg)
    print(f"# params ready in {time.time()-t0:.1f}s", flush=True)

    cache = to_layered(init_kv_cache(cfg, NP_SLOTS, max_len=S,
                                     layout="stacked"))
    samplers = [SamplerParams(temperature=0.0)] * NP_SLOTS
    sp = stack_params(samplers)
    feats = features_of(samplers)
    last = jnp.zeros((NP_SLOTS,), jnp.int32)
    lengths = jnp.full((NP_SLOTS,), S // 2, jnp.int32)
    key = jax.random.PRNGKey(0)

    cache_shape = f"bf16[{NP_SLOTS},{S},{cfg.n_kv_heads},128]"
    for fused in ("1", "0"):
        os.environ["VLUT_TPU_FUSED_ATTN"] = fused
        gen = make_generate_fn(cfg, n_steps=2, features=feats)
        lowered = jax.jit(gen).lower(params, cache, last, lengths, sp, key)
        stable = lowered.as_text()
        n_fused = stable.count("_fused_decode_attn_kernel")
        comp = lowered.compile()
        hlo = comp.as_text()
        # full-cache copies in the optimized HLO
        n_copy = len(re.findall(
            rf"{re.escape(cache_shape)}[^=]*=[^=]*\bcopy\(", hlo))
        n_copy_any = hlo.count(" copy(")
        ca = comp.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        by = ca.get("bytes accessed", float("nan"))
        print(f"# FUSED={fused}: fused-kernel refs in stablehlo: {n_fused}",
              flush=True)
        print(f"# FUSED={fused}: cache-shaped copies: {n_copy}  "
              f"(any copy: {n_copy_any})", flush=True)
        print(f"# FUSED={fused}: bytes accessed: {by/1e9:.2f} GB "
              f"(2 steps)", flush=True)
        # top 5 op categories by appearance of cache shape
        lines = [ln.strip() for ln in hlo.splitlines()
                 if cache_shape in ln and "fusion" in ln]
        print(f"# FUSED={fused}: cache-shaped fusion lines: {len(lines)}",
              flush=True)
        # sample the actual copy instructions (are they layout transposes?)
        cps = [ln.strip() for ln in hlo.splitlines()
               if cache_shape in ln and " copy(" in ln]
        for ln in cps[:3]:
            print(f"#   COPY: {ln[:220]}", flush=True)
        # and where their operands come from / results go
        import collections
        ops = collections.Counter()
        for ln in hlo.splitlines():
            if cache_shape in ln:
                m2 = re.search(r"= *\S*" + re.escape(cache_shape)
                               + r"[^ ]* (\w+)", ln)
                if m2:
                    ops[m2.group(1)] += 1
        print(f"# FUSED={fused}: cache-shaped ops: "
              f"{dict(ops.most_common(8))}", flush=True)


if __name__ == "__main__":
    main()

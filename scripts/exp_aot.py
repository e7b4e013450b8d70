#!/usr/bin/env python
"""AOT-compile serialization probe for warm-restart LTFT (VERDICT r4
item 9 / weak #6).

Cold-process LTFT on this tunnel is ~15-18 min and the axon PJRT plugin
retains only ~4 persistent-cache entries, so warm restarts stay slow.
Probe whether `jax.export` round-trips work against this TPU runtime: if
serialize + deserialize + run succeeds, the engine's fixed-shape compile
set (prefill buckets x decode step) can ship as an on-disk AOT bundle
and warm restarts skip XLA entirely.

Measures, for the flagship decode step shape:
  1. trace+compile time (the cold cost),
  2. jax.export serialize size + time,
  3. fresh deserialize + first-call time (the warm cost),
  4. output equality vs the live-compiled function.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from vlut_tpu.config import PRESETS  # noqa: E402
from vlut_tpu.models.transformer import (  # noqa: E402
    forward,
    init_kv_cache,
    init_params_fast,
)


def main():
    cfg = PRESETS["llama3_8b_158"]
    params = init_params_fast(cfg, seed=0)
    b, s = 32, 256
    cache = init_kv_cache(cfg, b, max_len=s)
    tokens = jnp.zeros((b, 1), jnp.int32)
    pos = jnp.full((b, 1), 17, jnp.int32)
    la = jnp.zeros((b,), jnp.int32)

    def fn(p, c, tk, ps, l):
        return forward(p, cfg, tk, ps, c, logits_at=l)

    jfn = jax.jit(fn)
    t0 = time.perf_counter()
    lowered = jfn.lower(params, cache, tokens, pos, la)
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    print(f"1. trace+compile: {t_compile:.1f} s", flush=True)

    from jax import export as jex

    t0 = time.perf_counter()
    exp = jex.export(jfn)(params, cache, tokens, pos, la)
    blob = exp.serialize()
    t_ser = time.perf_counter() - t0
    out = pathlib.Path("/tmp/vlut_aot_step.bin")
    out.write_bytes(blob)
    print(f"2. export+serialize: {t_ser:.1f} s, "
          f"{len(blob)/1e6:.1f} MB -> {out}", flush=True)

    t0 = time.perf_counter()
    back = jex.deserialize(out.read_bytes())
    rt = back.call(params, cache, tokens, pos, la)
    jax.block_until_ready(rt)
    t_warm = time.perf_counter() - t0
    print(f"3. deserialize+first-call: {t_warm:.1f} s "
          f"(vs {t_compile:.1f} s cold compile)", flush=True)

    live = compiled(params, cache, tokens, pos, la)
    eq = np.array_equal(
        np.asarray(live[0], np.float32), np.asarray(rt[0], np.float32))
    print(f"4. outputs equal: {eq}", flush=True)
    print(f"verdict: AOT round-trip {'WORKS' if eq else 'BROKEN'} on "
          f"this runtime; warm restart saves "
          f"{t_compile - t_warm:.1f} s/shape", flush=True)


if __name__ == "__main__":
    main()

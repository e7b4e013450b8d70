#!/usr/bin/env python
"""Per-shape pallas-vs-XLA routing tuner (VERDICT r4 weak #1).

For each flagship (fused llama3-8B) GEMM weight shape x M in the engine's
bucket x batch products, times the Pallas word-packed kernel against the
XLA unpack+int8-dot lowering IN INTERLEAVED A/B (drift-proof protocol,
PERF.md) and writes the winner as a ``route:{fmt}[w]:{M}:{Kp}:{Np}``
entry into bench/autotune_v5e.json.  ops/matmul.py consults these at
trace time, replacing the single global VLUT_TPU_XLA_MIN_M crossover
that put b=8 pp128 on the wrong side (reference analog: per-shape config
search, evaluation/scripts/search-config.sh).
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from vlut_tpu.bench.autotune import DEFAULT_FILE  # noqa: E402
from vlut_tpu.ops.matmul import ternary_matmul_quantized  # noqa: E402
from vlut_tpu.ops.packing import (  # noqa: E402
    TernaryTensor,
    pack_ternary,
    word_pack,
)

MS = (128, 256, 512, 1024, 2048, 4096)
SHAPES = [  # llama3-8B load-time-fused projection widths
    ("qkv", 4096, 6144),
    ("wo", 4096, 4096),
    ("gateup", 4096, 28672),
    ("down", 14336, 4096),
]


def _time_impl(fn, n_lo=8, n_hi=32, reps=3):
    """Marginal timing: (t(n_hi) - t(n_lo)) / (n_hi - n_lo)."""
    best = float("inf")
    for _ in range(reps):
        for n in (n_lo, n_hi):
            t0 = time.perf_counter()
            for _ in range(n):
                out = fn()
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            if n == n_lo:
                lo = dt
            else:
                best = min(best, (dt - lo) / (n_hi - n_lo))
    return best


def main():
    fmt = "i2"
    word = jax.default_backend() == "tpu"
    table = json.loads(DEFAULT_FILE.read_text())
    rng = np.random.default_rng(0)
    for tag, k, n in SHAPES:
        trits = rng.integers(-1, 2, (k, n)).astype(np.int8)
        t = pack_ternary(trits, np.float32(0.03), fmt)
        if word:
            t = TernaryTensor(
                packed=word_pack(jnp.asarray(t.packed), fmt),
                scale=t.scale, k=t.k, n=t.n, fmt=t.fmt, kb=t.kb,
            )
        kp, np_ = t.k_padded, t.n_padded
        for m in MS:
            x_q = jax.device_put(jnp.asarray(
                rng.integers(-100, 100, (m, k)), jnp.int8))
            x_s = jax.device_put(jnp.ones((m, 1), jnp.float32))
            fns = {}
            for impl in ("pallas", "xla"):
                fns[impl] = jax.jit(
                    lambda xq, xs, impl=impl: ternary_matmul_quantized(
                        xq, xs, t, impl=impl
                    )
                )
                fns[impl](x_q, x_s).block_until_ready()  # compile
            # interleaved A/B
            tims = {}
            for impl in ("pallas", "xla", "pallas", "xla"):
                dt = _time_impl(lambda i=impl: fns[i](x_q, x_s))
                tims[impl] = min(tims.get(impl, float("inf")), dt)
            win = min(tims, key=tims.get)
            key = f"route:{fmt}{'w' if word else ''}:{m}:{kp}:{np_}"
            table[key] = win
            print(f"{tag} M={m}: pallas {tims['pallas']*1e3:.3f} ms, "
                  f"xla {tims['xla']*1e3:.3f} ms -> {win}", flush=True)
    DEFAULT_FILE.write_text(json.dumps(table, indent=1))
    print(f"wrote {DEFAULT_FILE}")


if __name__ == "__main__":
    main()

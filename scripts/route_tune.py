#!/usr/bin/env python
"""Per-shape pallas-vs-XLA routing tuner (VERDICT r4 weak #1).

For each flagship (fused llama3-8B) GEMM weight shape x M in the engine's
bucket x batch products, times the Pallas word-packed kernel against the
XLA unpack+int8-dot lowering and writes the winner as a
``route:{fmt}[w]:{M}:{Kp}:{Np}`` entry into bench/autotune_v5e.json.
ops/matmul.py consults these at trace time, replacing the single global
VLUT_TPU_XLA_MIN_M crossover that put b=8 pp128 on the wrong side
(reference analog: per-shape config search,
evaluation/scripts/search-config.sh).

Timing: CHAINED dispatch — n_iter GEMMs data-dependent inside ONE jitted
fori_loop (xor feedback, L_STACK weight copies against cache reuse),
marginal (t(hi)-t(lo))/(hi-lo), min over repeats, pallas/xla interleaved.
Per-call wall timing is useless on this tunnel (the first cut of this
script measured NEGATIVE marginals from dispatch jitter).
"""

import functools
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
L_STACK = 4


N_LO, N_HI = 16, 128


def make_loop(impl, m, ts):
    t0 = ts[0]
    kp = t0.k_padded

    @jax.jit
    def loop(x_q, n_iter):
        x_s = jnp.ones((m, 1), jnp.float32)

        def body(i, acc):
            t = jax.lax.switch(
                i % L_STACK,
                [lambda tt=tt: (tt.packed, tt.scale) for tt in ts],
            )
            tt = TernaryTensor(packed=t[0], scale=t[1], k=t0.k, n=t0.n,
                               fmt=t0.fmt, kb=t0.kb)
            out = ternary_matmul_quantized(acc, x_s, tt, impl=impl)
            fb = out.astype(jnp.int8)
            if fb.shape[1] < kp:
                fb = jnp.tile(fb, (1, -(-kp // fb.shape[1])))
            return acc ^ fb[:, :kp]

        return jnp.sum(
            jax.lax.fori_loop(0, n_iter, body, x_q).astype(jnp.int32)
        )

    rng = np.random.default_rng(0)
    x_q = jax.device_put(
        jnp.asarray(rng.integers(-100, 100, (m, kp)), jnp.int8))
    for n_iter in (N_LO, N_HI):
        int(loop(x_q, n_iter))  # compile + warm both trip counts
    return loop, x_q


def bench_pair(m, ts, repeats=3):
    """Compile both impls ONCE, then interleave the timed passes so
    drift hits both arms equally."""
    fns = {impl: make_loop(impl, m, ts) for impl in ("pallas", "xla")}
    t = {impl: {N_LO: float("inf"), N_HI: float("inf")}
         for impl in fns}
    for _ in range(repeats):
        for impl, (loop, x_q) in fns.items():
            for n_iter in (N_LO, N_HI):
                t0_ = time.perf_counter()
                int(loop(x_q, n_iter))
                t[impl][n_iter] = min(
                    t[impl][n_iter], time.perf_counter() - t0_)
    return {
        impl: (v[N_HI] - v[N_LO]) / (N_HI - N_LO)
        for impl, v in t.items()
    }


def main():
    fmt = "i2"
    word = jax.default_backend() == "tpu"
    table = json.loads(DEFAULT_FILE.read_text())
    rng = np.random.default_rng(0)
    for tag, k, n in SHAPES:
        ts = []
        for li in range(L_STACK):
            trits = rng.integers(-1, 2, (k, n)).astype(np.int8)
            t = pack_ternary(trits, np.float32(0.03), fmt)
            if word:
                t = TernaryTensor(
                    packed=jax.device_put(
                        word_pack(jnp.asarray(t.packed), fmt)),
                    scale=t.scale, k=t.k, n=t.n, fmt=t.fmt, kb=t.kb,
                )
            else:
                t = TernaryTensor(
                    packed=jax.device_put(jnp.asarray(t.packed)),
                    scale=t.scale, k=t.k, n=t.n, fmt=t.fmt, kb=t.kb,
                )
            ts.append(t)
        kp, np_ = ts[0].k_padded, ts[0].n_padded
        for m in MS:
            tims = bench_pair(m, ts)
            win = min(tims, key=tims.get)
            key = f"route:{fmt}{'w' if word else ''}:{m}:{kp}:{np_}"
            table[key] = win
            print(f"{tag} M={m}: pallas {tims['pallas']*1e3:.3f} ms, "
                  f"xla {tims['xla']*1e3:.3f} ms -> {win}", flush=True)
            # incremental write: a timeout mid-run keeps finished entries
            DEFAULT_FILE.write_text(json.dumps(table, indent=1))
    print(f"wrote {DEFAULT_FILE}")


if __name__ == "__main__":
    main()

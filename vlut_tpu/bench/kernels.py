"""Ternary GEMM microbenchmark — the TPU mirror of test-vlut-gemm.

Reference harness: tests/test-vlut-gemm.cpp (perf mode over real model
GEMM shapes).  Same shapes, same reporting spirit (us/run, GB/s, TFLOP/s);
measurement method adapted to this environment's remote-TPU quirks:

* device->host syncs cost ~25 ms over the tunnel and async dispatch
  completion signals are unreliable, so each timing sample is ONE jitted
  fori_loop running the kernel n times with a data dependency between
  iterations, fetched via a scalar sum;
* weights are a stack of L=8 distinct matrices indexed per iteration, so
  the compiler cannot hoist them into VMEM — every run streams from HBM
  like a real decode step does;
* reported time is the marginal (t[n_hi] - t[n_lo]) / (n_hi - n_lo),
  which cancels dispatch/fetch overhead.
"""

from __future__ import annotations

import functools
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from vlut_tpu.ops import pallas_gemm
from vlut_tpu.ops.packing import pack_ternary

# reference shapes: tests/test-vlut-gemm.cpp:717-721
MODEL_SHAPES = {
    "bitnet_3b": (3200, 8640),
    "llama3_8b": (4096, 14336),
    "falcon_1b": (2048, 8192),
}
L_STACK = 8


def bench_gemm(
    fmt: str,
    m: int,
    k: int,
    n: int,
    block_shapes: tuple[int, int, int] | None = None,
    n_lo: int = 16,
    n_hi: int = 256,
    repeats: int = 3,
    k_mult: int | None = None,
    word: bool = False,
) -> dict[str, Any]:
    rng = np.random.default_rng(0)
    trits = rng.integers(-1, 2, size=(k, n)).astype(np.int8)
    if fmt in ("tq2", "tq1"):
        # TQ1_0/TQ2_0 baseline lanes (ops/tq.py): per-256-block fp16
        # scales at 1.6875 / 2.0625 bpw — the llama.cpp ternary baselines
        # the paper compares against (evaluation/Evaluation.md:151-160)
        from vlut_tpu.ops.tq import QK, ROWS_PER_BLOCK, pack_tq1, \
            pack_tq2, tq_gemm

        pack = pack_tq2 if fmt == "tq2" else pack_tq1
        packed, scales = pack(trits.astype(np.float32) * 0.03)
        kp, np_ = packed.shape[0] // ROWS_PER_BLOCK[fmt] * QK, n
        rows = packed.shape[0] + scales.shape[0] * 2  # fp16 scale bytes too
        packs = np.stack([packed] * L_STACK)
        packs[..., 0] = np.arange(L_STACK, dtype=np.uint8)[:, None]
        pl_stack = jax.device_put(jnp.asarray(packs))
        sc = jax.device_put(jnp.asarray(scales))
        mp = max(32, -(-m // 32) * 32)
        q = jax.device_put(
            jnp.asarray(rng.integers(-100, 100, (mp, kp)), jnp.int8)
        )
        s = jax.device_put(jnp.ones((mp, 1), jnp.float32))
        if block_shapes:
            bm, bn, bk = block_shapes
        else:  # largest tiles that divide the (padded) problem
            bm = mp if mp <= 128 else (128 if mp % 128 == 0 else 32)
            bn = next(b for b in (512, 256, 128, 64, 32) if np_ % b == 0)
            bk = next(b for b in (2048, 1024, 512, 256) if kp % b == 0)
        gemm = functools.partial(tq_gemm, fmt=fmt, bm=bm, bn=bn, bk=bk)

        @jax.jit
        def loop(q, pl_stack, n_iter):
            def body(i, acc):
                out = gemm(acc, pl_stack[i % L_STACK], sc, s)
                fb = out.astype(jnp.int8)
                if fb.shape[1] < kp:
                    fb = jnp.tile(fb, (1, -(-kp // fb.shape[1])))
                return acc ^ fb[:, :kp]

            return jnp.sum(
                jax.lax.fori_loop(0, n_iter, body, q).astype(jnp.int32)
            )

        ts = {}
        for n_iter in (n_lo, n_hi):
            int(loop(q, pl_stack, n_iter))
            best = float("inf")
            for _ in range(repeats):
                t0 = time.perf_counter()
                int(loop(q, pl_stack, n_iter))
                best = min(best, time.perf_counter() - t0)
            ts[n_iter] = best
        dt = (ts[n_hi] - ts[n_lo]) / (n_hi - n_lo)
        wbytes = rows * np_
        return {
            "fmt": fmt, "m": m, "k": k, "n": n, "blocks": (bm, bn, bk),
            "us": dt * 1e6, "gbps_packed": wbytes / dt / 1e9,
            "tflops": 2 * m * k * n / dt / 1e12,
        }
    t = pack_ternary(trits, np.float32(0.03), fmt, k_mult=k_mult)
    kp, np_ = t.k_padded, t.n_padded
    rows = t.packed.shape[0]
    packs = np.stack([np.asarray(t.packed)] * L_STACK)
    packs[..., 0] = np.arange(L_STACK, dtype=np.uint8)[:, None]
    pl_stack = jnp.asarray(packs)
    if word:  # serving-time uint32 word layout (packing.word_pack)
        from vlut_tpu.ops.packing import word_pack

        pl_stack = word_pack(pl_stack, fmt)
    pl_stack = jax.device_put(pl_stack)
    mp = max(32, -(-m // 32) * 32)
    q = jax.device_put(
        jnp.asarray(rng.integers(-100, 100, (mp, kp)), jnp.int8)
    )
    s = jax.device_put(jnp.ones((mp, 1), jnp.float32))
    ws = jax.device_put(jnp.ones((np_,), jnp.float32))
    bm, bn, bk = block_shapes or pallas_gemm.default_block_shapes(
        mp, np_, kp, t.kb
    )
    gemm = functools.partial(
        pallas_gemm.ternary_gemm_pallas,
        fmt=fmt, kb=t.kb, k=k, bm=bm, bn=bn, bk=bk,
    )

    @jax.jit
    def loop(q, pl_stack, n_iter):
        def body(i, acc):
            out = gemm(acc, pl_stack[i % L_STACK], s, ws)
            fb = out.astype(jnp.int8)
            if fb.shape[1] < kp:  # N narrower than padded K: tile out
                reps = -(-kp // fb.shape[1])
                fb = jnp.tile(fb, (1, reps))
            return acc ^ fb[:, :kp]

        return jnp.sum(
            jax.lax.fori_loop(0, n_iter, body, q).astype(jnp.int32)
        )

    ts = {}
    for n_iter in (n_lo, n_hi):
        int(loop(q, pl_stack, n_iter))  # compile + warm
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            int(loop(q, pl_stack, n_iter))
            best = min(best, time.perf_counter() - t0)
        ts[n_iter] = best
    dt = (ts[n_hi] - ts[n_lo]) / (n_hi - n_lo)
    wbytes = rows * np_
    return {
        "fmt": fmt,
        "m": m, "k": k, "n": n,
        "blocks": (bm, bn, bk),
        "us": dt * 1e6,
        "gbps_packed": wbytes / dt / 1e9,
        "tflops": 2 * m * k * n / dt / 1e12,
    }


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description="ternary GEMM microbench")
    ap.add_argument("-m", "--model", choices=list(MODEL_SHAPES), default=None)
    ap.add_argument("-ns", default="32,256",
                    help="comma-separated token counts")
    ap.add_argument("--fmt", default="i2,i1")
    ap.add_argument("--word", action="store_true",
                    help="bench the serving-time uint32 word layout")
    args = ap.parse_args(argv)

    models = [args.model] if args.model else list(MODEL_SHAPES)
    ns = [int(x) for x in args.ns.split(",")]
    fmts = args.fmt.split(",")
    print(f"{'model':10s} {'gemm':14s} {'fmt':3s} {'M':>4s} "
          f"{'us':>9s} {'GB/s':>7s} {'TFLOP/s':>8s}")
    for model in models:
        d, ff = MODEL_SHAPES[model]
        for (k, n, tag) in ((d, d, "dxd"), (d, ff, "dxff"), (ff, d, "ffxd")):
            for fmt in fmts:
                for m in ns:
                    r = bench_gemm(fmt, m, k, n, word=args.word)
                    print(f"{model:10s} {tag:14s} {r['fmt']:3s} {m:4d} "
                          f"{r['us']:9.1f} {r['gbps_packed']:7.1f} "
                          f"{r['tflops']:8.2f}", flush=True)


if __name__ == "__main__":
    main()

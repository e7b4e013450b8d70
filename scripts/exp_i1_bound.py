#!/usr/bin/env python
"""i1 decode bound: proof, not assertion (VERDICT r3 weak #4 / task 3).

Three kernel variants at llama3 shapes (K=4096, N=4096), word layout,
marginal-timed (fori_loop over an 8-deep weight stack, data dependency,
t = (t_hi - t_lo) / (n_hi - n_lo)):

  stream  — read the packed words, accumulate raw (no decode): the pure
            HBM streaming rate for this access pattern.
  decode  — _unpack_tile (the production decode) + MXU ones-reduction:
            decode cost with the dot hidden (M=8).
  full    — the production GEMM at M=32 (bench_gemm word=True).

If decode ≈ full >> stream for i1 while decode ≈ stream for i2, the i1
path is ALU-bound by its base-243 digit extraction, and the measured
bytes/s must match ops-per-trit x the VPU issue rate.  Op counts (from
ops/pallas_gemm.py _unpack_tile, word path):

  i2: 4 planes x (shift + and) = 8 lane-ops / 16 trits = 0.50 ops/trit
  i1: 2 parities x (prep 2 + quotients 4x3 + digits 4x2) + recombine
      5 x 2 = 54 lane-ops / 20 trits = 2.70 ops/trit

v5e VPU: 8 lanes x 128 x 4 ALUs @ 0.94 GHz ~= 3.85e12 32-bit lane-ops/s.
"""

import functools
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

K, N = 4096, 14336
L_STACK = 8
N_LO, N_HI = 8, 64
REPS = 3


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from vlut_tpu.ops import pallas_gemm
    from vlut_tpu.ops.packing import pack_ternary, word_pack

    rng = np.random.default_rng(0)

    results = {}
    for fmt, kb, bk, bn in (("i2", 128, 1024, 512),
                            ("i1", 160, 1280, 512)):
        r = {"i2": 4, "i1": 5}[fmt]
        trits = rng.integers(-1, 2, size=(L_STACK, K, N)).astype(np.int8)
        packed = np.stack([
            np.asarray(word_pack(jnp.asarray(
                pack_ternary(t, 1.0, fmt).packed), fmt))
            for t in trits
        ])  # (L, rows, N) uint32 words
        packed = jnp.asarray(packed)
        rows = packed.shape[1]
        kp = rows * r * 4  # words -> bytes -> trits
        rows_k = pallas_gemm._rows_per_bk(bk, fmt, packed.dtype)
        n_k = kp // bk
        assert rows == rows_k * n_k, (rows, rows_k, n_k)
        m8 = 8
        ones = jnp.ones((m8, bk), jnp.int8)

        def make_variant(mode):
            def kern(ones_ref, p_ref, out_ref, acc_ref):
                @pl.when(pl.program_id(1) == 0)
                def _init():
                    acc_ref[:] = jnp.zeros_like(acc_ref)

                if mode == "stream":
                    w32 = pltpu.bitcast(p_ref[:], jnp.int32)
                    acc_ref[:] += jnp.broadcast_to(
                        jnp.sum(w32, axis=0, keepdims=True), acc_ref.shape)
                else:
                    w = pallas_gemm._unpack_tile(p_ref[:], fmt, kb, bk, bn)
                    acc_ref[:] += jax.lax.dot_general(
                        ones_ref[:], w, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)

                @pl.when(pl.program_id(1) == n_k - 1)
                def _out():
                    out_ref[:] = acc_ref[:]

            call = pl.pallas_call(
                kern,
                grid=(N // bn, n_k),
                in_specs=[pl.BlockSpec((m8, bk), lambda j, kk: (0, 0)),
                          pl.BlockSpec((rows_k, bn),
                                       lambda j, kk: (kk, j))],
                out_specs=pl.BlockSpec((m8, bn), lambda j, kk: (0, j)),
                out_shape=jax.ShapeDtypeStruct((m8, N), jnp.int32),
                scratch_shapes=[pltpu.VMEM((m8, bn), jnp.int32)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "arbitrary")),
            )
            return lambda p: call(ones, p)

        for mode in ("stream", "decode"):
            call = make_variant(mode)

            @functools.partial(jax.jit, static_argnames=("n_iter",))
            def loop(pstack, n_iter, call=call):
                # 8x work per iteration so each sample is ms-scale (the
                # tunnel's us-level jitter swamps smaller marginals)
                def body(i, acc):
                    for li in range(L_STACK):
                        acc = acc + call(pstack[li])[0, 0]
                    return acc + i
                return jax.lax.fori_loop(0, n_iter, body, jnp.int32(0))

            int(loop(packed, N_LO))  # compile+warm BOTH iteration counts
            int(loop(packed, N_HI))
            best = None
            for _ in range(REPS):
                t0 = time.time()
                int(loop(packed, N_LO))
                t_lo = time.time() - t0
                t0 = time.time()
                int(loop(packed, N_HI))
                t_hi = time.time() - t0
                per = (t_hi - t_lo) / (N_HI - N_LO)
                best = per if best is None else min(best, per)
            best = best / L_STACK      # per single (K, N) pass
            byts = rows * N * 4
            gbs = byts / best / 1e9
            results[(fmt, mode)] = (best * 1e6, gbs)
            print(f"# {fmt} {mode:>6}: {best*1e6:7.1f} us/run "
                  f"{gbs:6.1f} GB/s packed", flush=True)

        from vlut_tpu.bench.kernels import bench_gemm

        rfull = bench_gemm(fmt, 32, K, N, word=True)
        results[(fmt, "full")] = (rfull["us"], rfull["gbps_packed"])
        print(f"# {fmt}   full: {rfull['us']:7.1f} us/run "
              f"{rfull['gbps_packed']:6.1f} GB/s packed  (M=32 production)",
              flush=True)

    # ALU-bound arithmetic
    print("\n# ALU model: v5e VPU ~3.85e12 lane-ops/s")
    for fmt, ops_trit, tpb in (("i2", 0.50, 16), ("i1", 2.70, 20)):
        us_dec, gbs_dec = results[(fmt, "decode")]
        n_trits = K * N
        pred_us = n_trits * ops_trit / 3.85e12 * 1e6
        print(f"# {fmt}: predicted decode-ALU time {pred_us:.1f} us vs "
              f"measured decode {us_dec:.1f} us "
              f"(stream {results[(fmt, 'stream')][0]:.1f} us)", flush=True)


if __name__ == "__main__":
    main()

"""A/B experiment: byte-plane bitcast trit decode vs the shipped word decode.

Hypothesis (VERDICT r3 item 2): the decode GEMM is VPU-ALU-bound at ~2-3
lane-ops/trit because each trit is extracted into its own int32 slab and the
final int32->int8 astype is a relayout.  If one `(p >> 2q) & 0x03030303`
yields FOUR decoded int8 fields already sitting in the byte lanes of an
int32, and `pltpu.bitcast(int32 -> int8)` (measured mapping: word w byte b
-> int8 row 4w+b) exposes them as sublanes for free, the decode drops to
~0.5 ops/trit and the GEMM should approach max(MXU, HBM).

Requires repacking the word layout so byte b of word w = slab row 4w+b
(i.e. the uint32 array is the plain little-endian byte-order view of the
byte-layout packed array).
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vlut_tpu.ops import pallas_gemm
from vlut_tpu.ops.packing import TRITS_PER_BYTE, pack_ternary, word_pack

L_STACK = 8


def word_pack_v2(packed, fmt="i2", kb=None):
    """Byte layout -> uint32 words, byte b of word w = byte row 4w+b.

    This is just the little-endian byte-order reinterpretation of the byte
    array, so bitcasting words back to uint8 recovers the byte layout.
    """
    *lead, rows, n = packed.shape
    assert rows % 4 == 0
    x = jnp.asarray(packed).reshape(*lead, rows // 4, 4, n)
    x = jnp.moveaxis(x, -2, -1)  # byte index minor
    return jax.lax.bitcast_convert_type(x, jnp.uint32).reshape(
        *lead, rows // 4, n)


def _unpack_tile_v2(p, fmt: str, kb: int, bk: int, bn: int):
    """uint32 (bk/(4r), bn) word tile -> (bk, bn) int8 fields in {0,1,2}."""
    r = TRITS_PER_BYTE[fmt]
    nb = bk // kb
    rows = p.shape[0]
    if fmt == "i2":
        mask = jnp.uint32(0x03030303)
        planes = [
            pltpu.bitcast((p >> (2 * q)) & mask, jnp.int8).reshape(
                nb, 1, kb // r, bn)
            for q in range(4)
        ]
    else:
        # base-243 SWAR on even/odd bytes, then recombine digit bytes into
        # one int32 (2 ops per 4 digits) and bitcast to sublanes.
        pu = p.astype(jnp.uint32) if p.dtype != jnp.uint32 else p
        emask = jnp.uint32(0x00FF00FF)
        halves = []
        for par in range(2):
            v = ((pu >> 8) if par else pu) & emask
            t1 = ((v * 171) >> 9) & jnp.uint32(0x007F007F)
            a = ((v * 57) >> 9) & jnp.uint32(0x001F001F)
            b = ((v * 19) >> 9) & jnp.uint32(0x000F000F)
            c = ((b * 11) >> 5) & jnp.uint32(0x00030003)
            halves.append([v - 3 * t1, t1 - 3 * a, a - 3 * b, b - 3 * c, c])
        planes = [
            pltpu.bitcast(
                halves[0][q] | (halves[1][q] << 8), jnp.int8
            ).reshape(nb, 1, kb // r, bn)
            for q in range(5)
        ]
    w = jnp.concatenate(planes, axis=1).reshape(bk, bn)
    return w


def _gemm_kernel_v2(x_ref, p_ref, xs_ref, ws_ref, out_ref, acc_ref, *,
                    fmt, kb, bk, bn, n_k):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = _unpack_tile_v2(p_ref[:], fmt, kb, bk, bn)
    rs = jnp.sum(x_ref[:].astype(jnp.int32), axis=1, keepdims=True)
    acc_ref[:] += (
        jax.lax.dot_general(
            x_ref[:], w, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ) - rs
    )

    @pl.when(pl.program_id(2) == n_k - 1)
    def _epi():
        out_ref[:] = (
            acc_ref[:].astype(jnp.float32) * xs_ref[:] * ws_ref[:]
        ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("fmt", "kb", "bm", "bn", "bk"))
def gemm_v2(x_q, packed, x_scale, w_scale, *, fmt, kb, bm, bn, bk):
    m, kp = x_q.shape
    r = TRITS_PER_BYTE[fmt]
    np_ = packed.shape[1]
    rows_k = bk // (4 * r)
    n_k = kp // bk
    grid = (m // bm, np_ // bn, n_k)
    return pl.pallas_call(
        functools.partial(_gemm_kernel_v2, fmt=fmt, kb=kb, bk=bk, bn=bn,
                          n_k=n_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((rows_k, bn), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((bm, 1), lambda i, j, kk: (i, 0)),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, np_), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * np_ * kp,
            bytes_accessed=m * kp + kp * np_ // r + m * np_ * 4,
            transcendentals=0,
        ),
    )(x_q, packed, x_scale, w_scale.reshape(1, np_))


def marginal(loop_fn, q, pstack, n_lo=16, n_hi=192, repeats=3):
    ts = {}
    for n_iter in (n_lo, n_hi):
        int(loop_fn(q, pstack, n_iter))
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            int(loop_fn(q, pstack, n_iter))
            best = min(best, time.perf_counter() - t0)
        ts[n_iter] = best
    return (ts[n_hi] - ts[n_lo]) / (n_hi - n_lo)


def run(fmt, k, n, m=32, blocks=None):
    rng = np.random.default_rng(0)
    trits = rng.integers(-1, 2, size=(k, n)).astype(np.int8)
    t = pack_ternary(trits, np.float32(1.0), fmt)
    kp, np_ = t.k_padded, t.n_padded
    rows = t.packed.shape[0]
    packs = np.stack([np.asarray(t.packed)] * L_STACK)
    packs[..., 0] = np.arange(L_STACK, dtype=np.uint8)[:, None]
    w_old = jax.device_put(word_pack(jnp.asarray(packs), fmt))
    w_new = jax.device_put(word_pack_v2(jnp.asarray(packs), fmt))
    mp = max(32, -(-m // 32) * 32)
    q = jax.device_put(jnp.asarray(rng.integers(-100, 100, (mp, kp)), jnp.int8))
    s = jax.device_put(jnp.ones((mp, 1), jnp.float32))
    ws = jax.device_put(jnp.ones((np_,), jnp.float32))
    import json, os
    tune = json.load(open(os.path.join(os.path.dirname(pallas_gemm.__file__),
                                       "..", "bench", "autotune_v5e.json")))
    key = f"{fmt}w:{mp}:{kp}:{np_}"
    bm, bn, bk = blocks or tune.get(key) or pallas_gemm.default_block_shapes(
        mp, np_, kp, t.kb)

    # correctness first (single call, fresh weights at stack slot 1)
    from vlut_tpu.ops.packing import unpack_ternary
    t.packed = packs[1]
    ref = (np.asarray(q, np.int32) @
           np.asarray(unpack_ternary(t, keep_padding=True), np.int32))
    t0 = time.perf_counter()
    out = gemm_v2(q, w_new[1], s, ws, fmt=fmt, kb=t.kb, bm=bm, bn=bn, bk=bk)
    compile_s = time.perf_counter() - t0
    ok = np.array_equal(np.asarray(out, np.int64), ref)
    print(f"  correctness {'OK' if ok else 'FAIL'} compile={compile_s:.1f}s",
          flush=True)
    if not ok:
        bad = np.argwhere(np.asarray(out, np.int64) != ref)
        print("   first bad:", bad[:5], np.asarray(out)[bad[0][0], bad[0][1]],
              ref[bad[0][0], bad[0][1]], flush=True)
        return

    gemm_old = functools.partial(
        pallas_gemm.ternary_gemm_pallas, fmt=fmt, kb=t.kb, k=k,
        bm=bm, bn=bn, bk=bk)
    gemm_new = functools.partial(gemm_v2, fmt=fmt, kb=t.kb, bm=bm, bn=bn,
                                 bk=bk)

    def make_loop(g):
        @jax.jit
        def loop(q, pstack, n_iter):
            def body(i, acc):
                out = g(acc, pstack[i % L_STACK], s, ws)
                fb = out.astype(jnp.int8)
                if fb.shape[1] < kp:
                    fb = jnp.tile(fb, (1, -(-kp // fb.shape[1])))
                return acc ^ fb[:, :kp]
            return jnp.sum(jax.lax.fori_loop(0, n_iter, body, q)
                           .astype(jnp.int32))
        return loop

    wbytes = rows * np_
    for name, g, wstack in (("old", gemm_old, w_old), ("new", gemm_new,
                                                       w_new)):
        dt = marginal(make_loop(g), q, wstack)
        print(f"  {name}: {dt*1e6:9.1f} us  {wbytes/dt/1e9:7.1f} GB/s "
              f"blocks=({bm},{bn},{bk})", flush=True)


if __name__ == "__main__":
    import sys
    fmts = (sys.argv[1] if len(sys.argv) > 1 else "i2,i1").split(",")
    for fmt in fmts:
        for (k, n, tag) in ((4096, 4096, "dxd"), (4096, 14336, "dxff"),
                            (14336, 4096, "ffxd")):
            print(f"{fmt} {tag} {k}x{n}", flush=True)
            run(fmt, k, n)

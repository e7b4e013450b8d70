"""TQ1_0/TQ2_0 baseline codec lanes (llama.cpp's upstream ternary types).

The paper benchmarks Vec-LUT against llama.cpp's TQ1_0/TQ2_0
(`evaluation/Evaluation.md:151-160`) — and the README demo race is
specifically I1_V_2 vs TQ1_0 (`evaluation/demo/run_batched_decode.sh`).
This module provides both types' semantics on TPU so those comparisons can
run apples-to-apples on the same chip:

* **TQ2_0**: per-256-block fp16 absmax scale, round(x/d) in {-1,0,1}
  (`ggml/src/ggml-quants.c:2169-2198`, `block_tq2_0`
  `ggml/src/ggml-common.h:253-255`); 2.0625 bpw byte traffic
  (64 packed bytes + 2 scale bytes per 256 weights).
* **TQ1_0**: same quantization rule, denser storage — 240 trits in 48
  base-243 bytes (5 trits/byte) + 16 trits in 4 base-81 bytes + 2 scale
  bytes per 256 weights = 54 bytes = **1.6875 bpw** exactly matching
  `block_tq1_0` (`ggml/src/ggml-common.h:246-251`,
  `ggml/src/ggml-quants.c:2099-2167`).

Byte layout is TPU-native, not GGUF-compatible: trit fields pack 4/byte in
the slab convention of ops/packing (field q of byte row w covers logical
row b*256 + q*64 + w — contiguous slabs, zero cross-lane decode traffic),
and scales live in a separate (K/256, N) float16 array.  What is preserved
is the *quantization semantics and memory traffic*, which is what a kernel
comparison measures.

This is a comparison lane, not the product path — i2 (per-tensor scale,
2.0 bpw) remains the serving format; TQ2_0's per-block scales model
checkpoints quantized without the lossless sign+scale split.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QK = 256  # block size (QK_K)


def pack_tq2(w: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(K, N) float weights -> ((Kp/4, N) uint8, (Kp/256, N) float16).

    Per-(256-block, column) absmax scale d; stored fields are
    round(w/d)+1 in {0,1,2}, four per byte in slab order (field q of byte
    row w = logical row b*256 + q*64 + w).
    """
    k, n = w.shape
    kp = -(-k // QK) * QK
    wf = np.zeros((kp, n), np.float32)
    wf[:k] = w.astype(np.float32)
    blocks = wf.reshape(kp // QK, QK, n)
    d = np.abs(blocks).max(axis=1)                       # (nb, N)
    scales = d.astype(np.float16)
    inv = np.where(d > 0, 1.0 / np.where(d > 0, d, 1), 0.0)
    q = np.rint(blocks * inv[:, None, :]).astype(np.int8)  # {-1,0,1}
    f = (q + 1).astype(np.uint8).reshape(kp // QK, 4, QK // 4, n)
    packed = (
        f[:, 0] | (f[:, 1] << 2) | (f[:, 2] << 4) | (f[:, 3] << 6)
    ).reshape(kp // 4, n)
    return packed, scales


def unpack_tq2(packed: np.ndarray, scales: np.ndarray) -> np.ndarray:
    """Inverse of pack_tq2 -> (Kp, N) float32 (test oracle)."""
    rows, n = packed.shape
    nb = rows * 4 // QK
    p = packed.reshape(nb, QK // 4, n)
    f = np.stack([(p >> (2 * q)) & 3 for q in range(4)], axis=1)
    trits = f.astype(np.float32).reshape(nb, QK, n) - 1.0
    return (trits * scales.astype(np.float32)[:, None, :]).reshape(-1, n)


ROWS_PER_BLOCK = {"tq2": QK // 4, "tq1": 52}  # packed byte-rows / 256 wts


def _decode_block_fields(p, fmt: str, bn: int):
    """(nb, rows_per_block, bn) int32 bytes -> (nb, QK, bn) int8 fields
    in {0,1,2} (trit + 1; callers correct the bias via x rowsums)."""
    nb = p.shape[0]
    if fmt == "tq2":
        fields = [(p >> (2 * q)) & 3 for q in range(4)]
        return jnp.stack(fields, axis=1).reshape(nb, QK, bn).astype(jnp.int8)
    # tq1: rows 0-47 carry 5 base-243 digits (logical row q*48 + w),
    # rows 48-51 carry 4 base-81 digits (row 240 + q*4 + w).  Digits via
    # independent multiply-shift divisions (exact for x < 243; the serial
    # div-by-3 chain and integer // both lower badly in Mosaic — see
    # pallas_gemm._unpack_tile).
    p5 = p[:, :48]
    t1 = (p5 * 171) >> 9   # x // 3
    a = (p5 * 57) >> 9     # x // 9
    b = (p5 * 19) >> 9     # x // 27
    c = (p5 * 405) >> 15   # x // 81
    w5 = jnp.stack(
        [p5 - 3 * t1, t1 - 3 * a, a - 3 * b, b - 3 * c, c], axis=1
    ).reshape(nb, 240, bn)
    p4 = p[:, 48:52]
    u1 = (p4 * 171) >> 9
    u2 = (p4 * 57) >> 9
    u3 = (p4 * 19) >> 9
    w4 = jnp.stack(
        [p4 - 3 * u1, u1 - 3 * u2, u2 - 3 * u3, u3], axis=1
    ).reshape(nb, 16, bn)
    return jnp.concatenate([w5, w4], axis=1).astype(jnp.int8)


def _tq_kernel(
    x_ref,    # (BM, BK) int8
    p_ref,    # (BK//QK * rows_per_block, BN) uint8
    s_ref,    # (BK//256, BN) f16 per-block weight scales
    xs_ref,   # (BM, 1) f32 activation scales
    out_ref,  # (BM, BN)
    acc_ref,  # (BM, BN) f32 scratch
    *,
    fmt: str,
    bk: int,
    bn: int,
    n_k: int,
    out_dtype,
):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # per-256 block: integer dot (field bias corrected by x rowsum), then
    # scale by this block's fp16 d — scales vary along K so they cannot
    # fold into the epilogue like the i2/i1 per-tensor scale
    rpb = ROWS_PER_BLOCK[fmt]
    p = p_ref[:].astype(jnp.int32).reshape(bk // QK, rpb, bn)
    w = _decode_block_fields(p, fmt, bn)
    acc = jnp.zeros_like(acc_ref)
    for blk in range(bk // QK):
        xb = x_ref[:, pl.dslice(blk * QK, QK)]
        rs = jnp.sum(xb.astype(jnp.int32), axis=1, keepdims=True)
        dot = (
            jax.lax.dot_general(
                xb, w[blk],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            - rs
        )
        acc = acc + dot.astype(jnp.float32) * s_ref[blk].astype(jnp.float32)
    acc_ref[:] += acc

    @pl.when(pl.program_id(2) == n_k - 1)
    def _epilogue():
        out_ref[:] = (acc_ref[:] * xs_ref[:]).astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("fmt", "bm", "bn", "bk", "out_dtype", "interpret"),
)
def tq_gemm(
    x_q: jax.Array,      # (M, Kp) int8
    packed: jax.Array,   # (Kp/QK * rows_per_block, N) uint8
    scales: jax.Array,   # (Kp/256, N) f16
    x_scale: jax.Array,  # (M, 1) f32
    *,
    fmt: str = "tq2",
    bm: int = 32,
    bn: int = 512,
    bk: int = 2048,
    out_dtype=jnp.float32,
    interpret: bool = False,
) -> jax.Array:
    """(M, N) = sum_blocks (x_b @ trits_b) * d_b * x_scale."""
    m, kp = x_q.shape
    np_ = packed.shape[1]
    rpb = ROWS_PER_BLOCK[fmt]
    assert m % bm == 0 and np_ % bn == 0 and kp % bk == 0 and bk % QK == 0
    assert packed.shape[0] == kp // QK * rpb, (packed.shape, kp)
    n_k = kp // bk
    grid = (m // bm, np_ // bn, n_k)
    kernel = functools.partial(
        _tq_kernel, fmt=fmt, bk=bk, bn=bn, n_k=n_k, out_dtype=out_dtype
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bk // QK * rpb, bn), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((bk // QK, bn), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((bm, 1), lambda i, j, kk: (i, 0)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * np_ * kp,
            bytes_accessed=m * kp + kp * np_ * rpb // QK + kp * np_ // 128
            + m * np_ * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_q, packed, scales, x_scale)


tq2_gemm = functools.partial(tq_gemm, fmt="tq2")
tq1_gemm = functools.partial(tq_gemm, fmt="tq1")


def pack_tq1(w: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(K, N) float weights -> ((Kp/256*52, N) uint8, (Kp/256, N) float16).

    Same quantization rule as TQ2_0 (per-block absmax d, round(w/d) in
    {-1,0,1}) at TQ1_0's 1.6875 bpw: per 256-block, rows 0-47 pack 5
    trits/byte base-243 (logical row q*48 + w at digit q of byte w) and
    rows 48-51 pack the last 16 trits 4/byte base-81.
    """
    k, n = w.shape
    kp = -(-k // QK) * QK
    wf = np.zeros((kp, n), np.float32)
    wf[:k] = w.astype(np.float32)
    blocks = wf.reshape(kp // QK, QK, n)
    d = np.abs(blocks).max(axis=1)
    scales = d.astype(np.float16)
    inv = np.where(d > 0, 1.0 / np.where(d > 0, d, 1), 0.0)
    f = (np.rint(blocks * inv[:, None, :]) + 1).astype(np.uint8)  # {0,1,2}
    f5 = f[:, :240].reshape(kp // QK, 5, 48, n)
    p5 = sum(f5[:, q].astype(np.uint16) * 3**q for q in range(5))
    f4 = f[:, 240:].reshape(kp // QK, 4, 4, n)
    p4 = sum(f4[:, q].astype(np.uint16) * 3**q for q in range(4))
    packed = np.concatenate([p5, p4], axis=1).astype(np.uint8)
    return packed.reshape(-1, n), scales


def unpack_tq1(packed: np.ndarray, scales: np.ndarray) -> np.ndarray:
    """Inverse of pack_tq1 -> (Kp, N) float32 (test oracle)."""
    rows, n = packed.shape
    nb = rows // 52
    p = packed.reshape(nb, 52, n).astype(np.int32)
    t5 = np.stack([(p[:, :48] // 3**q) % 3 for q in range(5)], axis=1)
    t4 = np.stack([(p[:, 48:] // 3**q) % 3 for q in range(4)], axis=1)
    trits = np.concatenate(
        [t5.reshape(nb, 240, n), t4.reshape(nb, 16, n)], axis=1
    ).astype(np.float32) - 1.0
    return (trits * scales.astype(np.float32)[:, None, :]).reshape(-1, n)

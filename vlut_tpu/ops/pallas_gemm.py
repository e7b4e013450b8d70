"""Fused unpack + int8 ternary GEMM Pallas kernel.

The TPU re-architecture of the reference's LUT GeMM
(ggml/src/ggml-cpu/ggml-cpu-quants-vlut.c:980-1853).  The reference dodges
dequant ALU cost on CPUs with an 81/243-entry table lookup per weight byte;
on TPU the MXU does int8 matmul at full HBM bandwidth, so the winning
formulation (SURVEY §7 "hard parts") is: stream packed 2-bit/1.6-bit bytes
from HBM, decode trits to int8 in VMEM on the VPU at line rate, and feed the
MXU — no table, int32 accumulation (no int16 overflow constraint,
SURVEY §2.1.5).

Decode exploits the slab layout of :mod:`vlut_tpu.ops.packing`: each byte
field q yields a *contiguous* (kb/r, BN) slab, so unpack is r shift/mask (i2)
or multiply-shift divide (i1) ops plus one reshape — zero cross-lane traffic.

Grid is (M tiles, N tiles, K tiles), K innermost ("arbitrary") accumulating
into a VMEM int32 scratch; the epilogue applies per-token activation scales
and the per-tensor/per-channel weight scale, mirroring where the reference
applies them (ggml-cpu-quants-vlut.c:1053-1062 + graph-level .scale multiply,
src/llama-graph.cpp:780-807).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vlut_tpu.ops.packing import TRITS_PER_BYTE, TernaryTensor

_POW3 = (1, 3, 9, 27, 81)


def _rows_per_bk(bk: int, fmt: str, packed_dtype) -> int:
    """Packed rows per K-tile: r trits/byte-row, or 16 trits/word-row for
    word-packed i2 (packing.word_pack)."""
    r = TRITS_PER_BYTE[fmt]
    if packed_dtype != jnp.uint8:
        return bk // (4 * r)
    return bk // r



def _unpack_tile(p, fmt: str, kb: int, bk: int, bn: int,
                 kernel: bool = True):
    """(bk//r, bn) uint8 tile -> (bk, bn) int8 FIELDS in {0, 1, 2}.

    Fields, not trits: the -1 bias is folded into the GEMM as an
    accumulator correction (x @ (F-1) == x @ F - rowsum(x)), saving one
    VPU op per trit — the decode is ALU-bound, so every op off this path
    is bandwidth.  Callers MUST subtract the per-K-block rowsum of x.

    ``kernel=True`` (inside a Pallas kernel) uses the byte-plane decode:
    one ``(word >> 2q) & 0x03030303`` extracts field q of FOUR byte rows
    into the byte lanes of an int32, and ``pltpu.bitcast`` exposes them as
    int8 sublanes (measured mapping on v5e: word w byte b -> sublane
    4w+b, which is exactly packing.word_pack's byte order).  ~0.5
    lane-ops/trit vs ~2-3 for per-trit extraction + int32->int8 relayout;
    measured i2 ffxd 157 -> 747 GB/s, dxff 290 -> 531 (scripts/
    exp_bitcast_decode.py).  ``kernel=False`` (the XLA prefill path)
    bitcasts words back to the byte layout and uses the byte decode —
    bit-identical output, XLA-traceable.
    """
    r = TRITS_PER_BYTE[fmt]
    nb = bk // kb
    if p.dtype != jnp.uint8:
        if not kernel:
            # XLA path: words -> byte layout, then the byte decode below
            from vlut_tpu.ops.packing import word_unpack

            p = word_unpack(p, fmt)
        elif fmt == "i2":
            assert kb == 128, kb
            mask = jnp.uint32(0x03030303)
            planes = [
                pltpu.bitcast((p >> (2 * q)) & mask, jnp.int8).reshape(
                    nb, 1, kb // r, bn)
                for q in range(4)
            ]
            return jnp.concatenate(planes, axis=1).reshape(bk, bn)
        else:
            assert kb == 160, kb
            # base-243 bytes.  SWAR dual-byte decode: split the word into
            # even (B0,B2) and odd (B1,B3) bytes as two 16-bit fields of
            # one uint32, then each multiply-shift magic division
            # (x//3^q == (x*m)>>s, exact for x<243 and carry-free across
            # the 16-bit fields — products stay <2^16 per field) extracts
            # digit q of TWO bytes at once; the parity planes recombine
            # into byte lanes (h0 | h1<<8 -> digits of byte rows
            # 4w..4w+3) and bitcast to sublanes.  ~2.2 lane-ops/trit.
            pu = p.astype(jnp.uint32)
            emask = jnp.uint32(0x00FF00FF)
            halves = []
            for par in range(2):
                v = ((pu >> 8) if par else pu) & emask
                t1 = ((v * 171) >> 9) & jnp.uint32(0x007F007F)  # x // 3
                a = ((v * 57) >> 9) & jnp.uint32(0x001F001F)    # x // 9
                b = ((v * 19) >> 9) & jnp.uint32(0x000F000F)    # x // 27
                c = ((b * 11) >> 5) & jnp.uint32(0x00030003)    # x // 81
                halves.append([v - 3 * t1, t1 - 3 * a, a - 3 * b,
                               b - 3 * c, c])
            planes = [
                pltpu.bitcast(
                    halves[0][q] | (halves[1][q] << 8), jnp.int8
                ).reshape(nb, 1, kb // r, bn)
                for q in range(5)
            ]
            return jnp.concatenate(planes, axis=1).reshape(bk, bn)
    slab = kb // r
    p = p.astype(jnp.int32).reshape(nb, slab, bn)
    if fmt == "i2":
        slabs = [(p >> (2 * q)) & 3 for q in range(r)]
    else:
        # base-243 digits via INDEPENDENT multiply-shift divisions
        # (x//3^q == (x*m_q)>>s_q, exact for x < 243; verified exhaustively
        # in test_packing) — integer div/mod lower to slow sequences on the
        # VPU (measured 10x slower), and the serial divide-by-3 chain has
        # dependency depth 5; these four multiplies issue in parallel
        t1 = (p * 171) >> 9   # x // 3
        a = (p * 57) >> 9     # x // 9
        b = (p * 19) >> 9     # x // 27
        c = (p * 405) >> 15   # x // 81
        slabs = [
            p - 3 * t1,
            t1 - 3 * a,
            a - 3 * b,
            b - 3 * c,
            c,
        ]
    w = jnp.stack(slabs, axis=1).reshape(bk, bn)
    return w.astype(jnp.int8)


def _gemm_kernel(
    x_ref,  # (BM, BK) int8
    p_ref,  # (BK // r, BN) uint8
    xs_ref,  # (BM, 1) f32 per-token activation scales
    ws_ref,  # (1, BN) f32 weight scale (broadcast per-channel)
    out_ref,  # (BM, BN) out dtype
    acc_ref,  # (BM, BN) int32 scratch
    *,
    fmt: str,
    kb: int,
    bk: int,
    bn: int,
    n_k: int,
    out_dtype,
):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = _unpack_tile(p_ref[:], fmt, kb, bk, bn)
    # fields are trits+1; subtract this K-block's x rowsum (see _unpack_tile)
    rs = jnp.sum(x_ref[:].astype(jnp.int32), axis=1, keepdims=True)
    acc_ref[:] += (
        jax.lax.dot_general(
            x_ref[:],
            w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        - rs
    )

    @pl.when(pl.program_id(2) == n_k - 1)
    def _epilogue():
        out = acc_ref[:].astype(jnp.float32) * xs_ref[:] * ws_ref[:]
        out_ref[:] = out.astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "fmt", "kb", "k", "bm", "bn", "bk", "out_dtype", "interpret",
    ),
)
def ternary_gemm_pallas(
    x_q: jax.Array,  # (M, Kp) int8, zero-padded to the packed K
    packed: jax.Array,  # (Kp // r, Np) uint8
    x_scale: jax.Array,  # (M, 1) f32
    w_scale: jax.Array,  # (Np,) f32 (per-channel; broadcast scalars upstream)
    *,
    fmt: str,
    kb: int,
    k: int,
    bm: int,
    bn: int,
    bk: int,
    out_dtype=jnp.float32,
    interpret: bool = False,
) -> jax.Array:
    """Returns (M, Np) = (x_q @ unpack(packed)) * x_scale * w_scale.

    All shapes must already be tile-aligned: M % bm == 0, Np % bn == 0,
    Kp % bk == 0, bk % kb == 0.  ``k`` (logical K) is unused at runtime but
    kept in the signature so distinct logical shapes never share a cache
    entry by accident.
    """
    m, kp = x_q.shape
    r = TRITS_PER_BYTE[fmt]
    np_ = packed.shape[1]
    rows_k = _rows_per_bk(bk, fmt, packed.dtype)
    assert m % bm == 0 and np_ % bn == 0 and kp % bk == 0 and bk % kb == 0
    n_k = kp // bk
    assert packed.shape[0] == rows_k * n_k, (packed.shape, rows_k, n_k)

    grid = (m // bm, np_ // bn, n_k)
    kernel = functools.partial(
        _gemm_kernel,
        fmt=fmt, kb=kb, bk=bk, bn=bn, n_k=n_k, out_dtype=out_dtype,
    )
    flops = 2 * m * np_ * kp
    bytes_accessed = (
        m * kp  # x int8
        + kp * np_ // r  # packed weights
        + m * np_ * jnp.dtype(out_dtype).itemsize
        + m * 4 + np_ * 4
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((rows_k, bn), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((bm, 1), lambda i, j, kk: (i, 0)),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(x_q, packed, x_scale, w_scale.reshape(1, np_))


def _fused_gemm_kernel(
    x_ref,  # (M, Kp) float — FULL x resident in VMEM (decode-sized M)
    p_ref,  # (BK // r, BN) uint8
    ws_ref,  # (1, BN) f32
    out_ref,  # (M, BN)
    xq_ref,  # (M, Kp) int8 scratch
    xs_ref,  # (M, 1) f32 scratch
    acc_ref,  # (M, BN) int32 scratch
    *,
    fmt: str,
    kb: int,
    bk: int,
    bn: int,
    n_k: int,
    out_dtype,
):
    # Quantize at EVERY j's first K step, not only at j==0: grid dim 0 is
    # "parallel", so on Megacore parts (v4/v5p) Mosaic may split j across
    # cores with per-core scratch — a j>0 block cannot rely on j==0 having
    # initialized xq/xs.  Redundant work is <1% of the j-block's GEMM cost
    # (x is already VMEM-resident).
    @pl.when(pl.program_id(1) == 0)
    def _quantize():
        xf = x_ref[:].astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        scale = amax / 127.0
        inv = jnp.where(amax > 0, 127.0 / jnp.maximum(amax, 1e-30), 0.0)
        xs_ref[:] = scale
        xq_ref[:] = jnp.clip(
            jnp.round(xf * inv), -127, 127
        ).astype(jnp.int8)

    kk = pl.program_id(1)

    @pl.when(kk == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = _unpack_tile(p_ref[:], fmt, kb, bk, bn)
    xq = xq_ref[:, pl.dslice(kk * bk, bk)]
    rs = jnp.sum(xq.astype(jnp.int32), axis=1, keepdims=True)
    acc_ref[:] += (
        jax.lax.dot_general(
            xq, w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        - rs
    )

    @pl.when(kk == n_k - 1)
    def _epilogue():
        out = acc_ref[:].astype(jnp.float32) * xs_ref[:] * ws_ref[:]
        out_ref[:] = out.astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("fmt", "kb", "k", "bn", "bk", "out_dtype", "interpret"),
)
def ternary_gemm_fused_quant(
    x: jax.Array,  # (M, Kp) bf16/f32, zero-padded K, M <= ~64
    packed: jax.Array,  # (Kp // r, Np) uint8
    w_scale: jax.Array,  # (Np,) f32
    *,
    fmt: str,
    kb: int,
    k: int,
    bn: int,
    bk: int,
    out_dtype=jnp.float32,
    interpret: bool = False,
) -> jax.Array:
    """Decode-path GEMM with the int8 activation quantization fused into the
    kernel prologue: x stays resident in VMEM across the whole grid, is
    quantized once, and the per-GEMM reduce-max/scale/round XLA ops (and
    their kernel launches) disappear — significant at small M where launch
    overhead rivals compute."""
    m, kp = x.shape
    r = TRITS_PER_BYTE[fmt]
    np_ = packed.shape[1]
    rows_k = _rows_per_bk(bk, fmt, packed.dtype)
    assert np_ % bn == 0 and kp % bk == 0 and bk % kb == 0
    n_k = kp // bk
    grid = (np_ // bn, n_k)
    kernel = functools.partial(
        _fused_gemm_kernel,
        fmt=fmt, kb=kb, bk=bk, bn=bn, n_k=n_k, out_dtype=out_dtype,
    )
    flops = 2 * m * np_ * kp
    bytes_accessed = m * kp * 2 + kp * np_ // r + m * np_ * 4
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, kp), lambda j, kk: (0, 0)),
            pl.BlockSpec((rows_k, bn), lambda j, kk: (kk, j)),
            pl.BlockSpec((1, bn), lambda j, kk: (0, j)),
        ],
        out_specs=pl.BlockSpec((m, bn), lambda j, kk: (0, j)),
        out_shape=jax.ShapeDtypeStruct((m, np_), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((m, kp), jnp.int8),
            pltpu.VMEM((m, 1), jnp.float32),
            pltpu.VMEM((m, bn), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(x, packed, w_scale.reshape(1, np_))


def _decode_kernel(
    *refs,
    fmt: str,
    kb: int,
    bk: int,
    bn: int,
    n_k: int,
    mode: str,  # "plain" | "norm" | "silu_mul"
    sub_norm: bool,  # bitnet: RMSNorm AFTER silu_mul (ffn_sub_norm)
    norm_n: int,
    eps: float,
    has_res: bool,
    out_dtype,
):
    """Decode-regime GEMM with the surrounding elementwise chain fused in.

    Prologue (once, VMEM-resident x): mode-dependent elementwise
    (RMSNorm / silu(gate)*up [+ sub-norm]) -> round to bf16 (bit-parity
    with the composed XLA path) -> int8 activation quantization.
    Epilogue: scale application + optional residual add (in bf16, matching
    the composed `x + o.astype(bf16)`).

    Replaces, per transformer layer, the XLA fusions for attn_norm,
    ffn_norm, silu*up, both residual adds, and both activation-quant
    reductions — the decode step becomes 4 back-to-back Pallas calls plus
    attention (reference: the entire per-layer chain of
    ggml-cpu-quants-vlut.c:980+ plus the graph's mul/add/norm nodes).
    """
    it = iter(refs)
    x1_ref = next(it)
    x2_ref = next(it) if mode == "silu_mul" else None
    g_ref = next(it) if (mode == "norm" or sub_norm) else None
    p_ref = next(it)
    ws_ref = next(it)
    res_ref = next(it) if has_res else None
    out_ref = next(it)
    xq_ref = next(it)
    xs_ref = next(it)
    acc_ref = next(it)

    # grid dim 0 is "arbitrary" (sequential), so the prologue runs exactly
    # once and its xq/xs scratch persists across all (j, kk) steps.
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _prologue():
        xf = x1_ref[:].astype(jnp.float32)
        if mode == "silu_mul":
            xf = xf * jax.lax.logistic(xf) * x2_ref[:].astype(jnp.float32)
            if sub_norm:
                # bf16 round between silu*up and the sub-norm, matching the
                # composed path's bf16 materialization exactly
                xf = xf.astype(jnp.bfloat16).astype(jnp.float32)
        if mode == "norm" or sub_norm:
            ss = jnp.sum(xf * xf, axis=-1, keepdims=True)
            xf = xf * jax.lax.rsqrt(ss / norm_n + eps)
            xf = xf * g_ref[:].astype(jnp.float32)
        if mode != "plain":
            # round through bf16: the composed path materializes bf16
            # between the elementwise op and the quantizer, and exact parity
            # with it keeps impl=xla/pallas cross-checks meaningful.  In
            # "plain" mode the composed path quantizes the input as-is (the
            # attention output arrives f32), so no round here either.
            xf = xf.astype(jnp.bfloat16).astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        xs_ref[:] = amax / 127.0
        inv = jnp.where(amax > 0, 127.0 / jnp.maximum(amax, 1e-30), 0.0)
        xq_ref[:] = jnp.clip(jnp.round(xf * inv), -127, 127).astype(jnp.int8)

    kk = pl.program_id(1)

    @pl.when(kk == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = _unpack_tile(p_ref[:], fmt, kb, bk, bn)
    xq = xq_ref[:, pl.dslice(kk * bk, bk)]
    rs = jnp.sum(xq.astype(jnp.int32), axis=1, keepdims=True)
    acc_ref[:] += (
        jax.lax.dot_general(
            xq, w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        - rs
    )

    @pl.when(kk == n_k - 1)
    def _epilogue():
        out = acc_ref[:].astype(jnp.float32) * xs_ref[:] * ws_ref[:]
        if has_res:
            out = res_ref[:] + out.astype(res_ref.dtype)
        out_ref[:] = out.astype(out_dtype)


def _decode_kernel_pipe(
    *refs,
    fmt: str,
    kb: int,
    bk: int,
    bn: int,
    n_k: int,
    n_j: int,
    mode: str,
    sub_norm: bool,
    norm_n: int,
    eps: float,
    has_res: bool,
    out_dtype,
):
    """Software-pipelined variant of :func:`_decode_kernel`.

    The plain kernel serializes VPU trit-decode and MXU dot within each
    grid step; at M=32 the two cost nearly the same cycles (i2 word decode
    ~2 lane-ops/trit vs a 32-row int8 dot), so the step runs ~2x the
    max(VPU, MXU) floor.  Here the grid is the flattened (j, kk) sequence
    plus one drain step, and step s DECODES tile s into wbuf[s%2] while
    DOTTING tile s-1 from wbuf[(s+1)%2] — independent buffers, both
    unconditional, so Mosaic's scheduler can overlap the units.
    Accumulator handoff uses a first-tile select instead of a zeroing
    branch; the s=0 dot is garbage and is overwritten at s=1 (both have
    sm1 % n_k == 0).
    """
    it = iter(refs)
    x1_ref = next(it)
    x2_ref = next(it) if mode == "silu_mul" else None
    g_ref = next(it) if (mode == "norm" or sub_norm) else None
    p_ref = next(it)
    ws_ref = next(it)
    res_ref = next(it) if has_res else None
    out_ref = next(it)
    xq_ref = next(it)
    xs_ref = next(it)
    acc_ref = next(it)
    wa_ref = next(it)
    wb_ref = next(it)

    s = pl.program_id(0)

    @pl.when(s == 0)
    def _prologue():
        xf = x1_ref[:].astype(jnp.float32)
        if mode == "silu_mul":
            xf = xf * jax.lax.logistic(xf) * x2_ref[:].astype(jnp.float32)
            if sub_norm:
                xf = xf.astype(jnp.bfloat16).astype(jnp.float32)
        if mode == "norm" or sub_norm:
            ss = jnp.sum(xf * xf, axis=-1, keepdims=True)
            xf = xf * jax.lax.rsqrt(ss / norm_n + eps)
            xf = xf * g_ref[:].astype(jnp.float32)
        if mode != "plain":
            xf = xf.astype(jnp.bfloat16).astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        xs_ref[:] = amax / 127.0
        inv = jnp.where(amax > 0, 127.0 / jnp.maximum(amax, 1e-30), 0.0)
        xq_ref[:] = jnp.clip(jnp.round(xf * inv), -127, 127).astype(jnp.int8)
        # the s=0 dot reads buf B before anything decoded into it; zero
        # it so the discarded first accumulate is at least deterministic
        wb_ref[:] = jnp.zeros_like(wb_ref)

    # decode tile s while dotting tile s-1 from the OTHER buffer: two
    # static scratch refs selected by parity branches (a dynamic-index
    # single buffer makes Mosaic assume aliasing and serialize)
    sm1 = jnp.maximum(s - 1, 0)
    kk_d = sm1 % n_k
    xq = xq_ref[:, pl.dslice(kk_d * bk, bk)]
    rs = jnp.sum(xq.astype(jnp.int32), axis=1, keepdims=True)

    def _body(dst_ref, src_ref):
        dst_ref[:] = _unpack_tile(p_ref[:], fmt, kb, bk, bn)
        d = (
            jax.lax.dot_general(
                xq, src_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            - rs
        )
        acc_ref[:] = jnp.where(kk_d == 0, d, acc_ref[:] + d)

    @pl.when(s % 2 == 0)
    def _even():
        _body(wa_ref, wb_ref)

    @pl.when(s % 2 == 1)
    def _odd():
        _body(wb_ref, wa_ref)

    @pl.when((s >= 1) & (kk_d == n_k - 1))
    def _flush():
        out = acc_ref[:].astype(jnp.float32) * xs_ref[:] * ws_ref[:]
        if has_res:
            out = res_ref[:] + out.astype(res_ref.dtype)
        out_ref[:] = out.astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "fmt", "kb", "k", "bn", "bk", "mode", "sub_norm", "norm_n", "eps",
        "out_dtype", "interpret", "pipe",
    ),
)
def ternary_gemm_decode(
    x1: jax.Array,  # (M, Kp) bf16/f32, zero-padded K, M <= ~64
    packed: jax.Array,  # (Kp // r, Np) uint8
    w_scale: jax.Array,  # (Np,) f32
    *,
    x2: jax.Array | None = None,  # (M, Kp) up-projection for silu_mul
    norm_g: jax.Array | None = None,  # (Kp,) norm gain for mode="norm"
    residual: jax.Array | None = None,  # (M, Np) added in epilogue
    fmt: str,
    kb: int,
    k: int,
    bn: int,
    bk: int,
    mode: str = "plain",
    sub_norm: bool = False,
    norm_n: int = 0,
    eps: float = 1e-5,
    out_dtype=jnp.float32,
    interpret: bool = False,
    pipe: bool = False,
) -> jax.Array:
    """Fused elementwise->quant->GEMM->residual decode projection."""
    m, kp = x1.shape
    r = TRITS_PER_BYTE[fmt]
    np_ = packed.shape[1]
    rows_k = _rows_per_bk(bk, fmt, packed.dtype)
    assert np_ % bn == 0 and kp % bk == 0 and bk % kb == 0
    n_k = kp // bk
    n_j = np_ // bn
    # pipelined variant double-buffers the decoded tile; cap its VMEM
    if pipe and 2 * bk * bn > 4 << 20:
        pipe = False
    flops = 2 * m * np_ * kp
    bytes_accessed = m * kp * 2 + kp * np_ // r + m * np_ * 4

    if pipe:
        total = n_j * n_k
        kernel = functools.partial(
            _decode_kernel_pipe,
            fmt=fmt, kb=kb, bk=bk, bn=bn, n_k=n_k, n_j=n_j, mode=mode,
            sub_norm=sub_norm, norm_n=norm_n, eps=eps,
            has_res=residual is not None, out_dtype=out_dtype,
        )
        # decode-side indices follow step s (clamped for the drain step);
        # dot/output-side indices follow s-1 (clamped at the warm-up step)
        def p_map(s):
            sc = jnp.minimum(s, total - 1)
            return (sc % n_k, sc // n_k)

        def o_map(s):
            return (0, jnp.clip((s - 1) // n_k, 0, n_j - 1))

        x_spec = pl.BlockSpec((m, kp), lambda s: (0, 0))
        in_specs = [x_spec]
        args = [x1]
        if mode == "silu_mul":
            in_specs.append(x_spec)
            args.append(x2)
        if mode == "norm" or sub_norm:
            in_specs.append(pl.BlockSpec((1, kp), lambda s: (0, 0)))
            args.append(norm_g.reshape(1, kp))
        in_specs.append(pl.BlockSpec((rows_k, bn), p_map))
        args.append(packed)
        in_specs.append(pl.BlockSpec((1, bn), o_map))
        args.append(w_scale.reshape(1, np_))
        if residual is not None:
            in_specs.append(pl.BlockSpec((m, bn), o_map))
            args.append(residual)
        return pl.pallas_call(
            kernel,
            grid=(total + 1,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((m, bn), o_map),
            out_shape=jax.ShapeDtypeStruct((m, np_), out_dtype),
            scratch_shapes=[
                pltpu.VMEM((m, kp), jnp.int8),
                pltpu.VMEM((m, 1), jnp.float32),
                pltpu.VMEM((m, bn), jnp.int32),
                pltpu.VMEM((bk, bn), jnp.int8),
                pltpu.VMEM((bk, bn), jnp.int8),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            cost_estimate=pl.CostEstimate(
                flops=flops, bytes_accessed=bytes_accessed,
                transcendentals=0,
            ),
            interpret=interpret,
        )(*args)

    grid = (n_j, n_k)
    kernel = functools.partial(
        _decode_kernel,
        fmt=fmt, kb=kb, bk=bk, bn=bn, n_k=n_k, mode=mode,
        sub_norm=sub_norm, norm_n=norm_n, eps=eps,
        has_res=residual is not None, out_dtype=out_dtype,
    )
    x_spec = pl.BlockSpec((m, kp), lambda j, kk: (0, 0))
    in_specs = [x_spec]
    args = [x1]
    if mode == "silu_mul":
        in_specs.append(x_spec)
        args.append(x2)
    if mode == "norm" or sub_norm:
        in_specs.append(pl.BlockSpec((1, kp), lambda j, kk: (0, 0)))
        args.append(norm_g.reshape(1, kp))
    in_specs.append(pl.BlockSpec((rows_k, bn), lambda j, kk: (kk, j)))
    args.append(packed)
    in_specs.append(pl.BlockSpec((1, bn), lambda j, kk: (0, j)))
    args.append(w_scale.reshape(1, np_))
    if residual is not None:
        in_specs.append(pl.BlockSpec((m, bn), lambda j, kk: (0, j)))
        args.append(residual)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((m, bn), lambda j, kk: (0, j)),
        out_shape=jax.ShapeDtypeStruct((m, np_), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((m, kp), jnp.int8),
            pltpu.VMEM((m, 1), jnp.float32),
            pltpu.VMEM((m, bn), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            # dim 0 must be sequential: the prologue's xq/xs scratch is
            # written once at (0, 0) and read by every other step
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(*args)


def default_block_shapes(
    m: int, np_: int, kp: int, kb: int
) -> tuple[int, int, int]:
    """Heuristic (bm, bn, bk) — replaced by the autotuner for hot shapes."""
    import math

    bm = min(256, max(32, _round_up(m, 32)))
    while m % bm:
        bm //= 2  # m is pre-padded to a multiple of 32, so this terminates
    bn = 512 if np_ % 512 == 0 else (256 if np_ % 256 == 0 else 128)
    # K tiles must be lane multiples (x block minor dim) and block multiples
    bk = math.lcm(kb, 128)
    # Grow bk while the unpacked weight tile stays comfortably in VMEM.
    while bk * 2 <= kp and kp % (bk * 2) == 0 and bk * 2 * bn <= 2**21:
        bk *= 2
    return bm, bn, bk


def _round_up(x: int, mult: int) -> int:
    return ((x + mult - 1) // mult) * mult

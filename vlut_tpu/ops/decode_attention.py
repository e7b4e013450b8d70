"""Fused decode attention: KV row write + flash attention in ONE kernel.

Round-4 decode anatomy (bench/ablate.py, word-packed production build,
np=32 S=184 on v5e): the layer GEMMs already run at the weight-streaming
floor (2.40 ms for 2.26 GB), while attention reads cost 2.02 ms (~2x the
KV-byte floor — XLA materializes float32 copies of the bf16 K/V caches
for the einsum) and the per-layer KV row-write launches cost another
1.10 ms (32 Pallas calls of ~34 us).  This kernel removes both: per layer
ONE pallas_call that

  * writes the step's new K/V rows into the cache (aliased in/out, same
    scheme as ops/kv_update.py — exactly B rows move), and
  * computes GQA attention with an online softmax over cache chunks,
    reading each cache byte exactly once in its storage dtype (bf16) and
    upcasting to f32 only in VMEM.

The new token's K/V contribute through a separate in-register term (their
row in the cache block may be fetched before the write lands; masking
cache rows at ``r >= start`` makes the read-after-write ordering
irrelevant).  Semantics match transformer._attention for the decode case:
rows visible iff row < start (row index == position for cache-backed
attention, transformer.py k_pos_row), plus the new row at position
``start``; optional sliding window ``row > start - window``.

Reference analog: ggml_flash_attn_ext decode usage
(ggml/include/ggml.h:2331) + the unified KV cell write
(src/llama-kv-cache.cpp find_slot + row set).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _fused_decode_attn_kernel(
    # scalar prefetch
    start_ref,   # (B,) int32 — write row == query position
    win_ref,     # (1,) int32 — sliding window (0 = none)
    # inputs
    q_ref,       # (1, 1, H, hd) f32
    kn_ref,      # (1, 1, Hkv, hd) cache dtype
    vn_ref,      # (1, 1, Hkv, hdv) cache dtype
    kc_ref,      # (1, CS, Hkv, hd) cache chunk
    vc_ref,      # (1, CS, Hkv, hdv)
    # outputs
    out_ref,     # (1, 1, H, hdv) f32
    ko_ref,      # (1, 1, Hkv, hd) aliased cache row
    vo_ref,      # (1, 1, Hkv, hdv)
    # scratch
    m_ref,       # (H, 1) f32 running max
    l_ref,       # (H, 1) f32 running denom
    acc_ref,     # (H, hdv) f32 running numerator
    *,
    hkv: int,
    g: int,
    hd: int,
    hdv: int,
    cs: int,
    n_s: int,
    scale: float,
):
    b_i = pl.program_id(0)
    s_i = pl.program_id(1)
    start = start_ref[b_i]
    win = win_ref[0]

    @pl.when(s_i == 0)
    def _init():
        # the cache row write: exactly one (1, Hkv*hd) row per slot
        ko_ref[...] = kn_ref[...]
        vo_ref[...] = vn_ref[...]
        m_ref[...] = jnp.full_like(m_ref, _NEG)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # visibility of cache rows in this chunk: global row < start (rows at
    # >= start are stale/garbage; the new row enters via the epilogue
    # term), and inside the window when one is set
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, cs), 1) + s_i * cs
    valid = rows < start
    # boolean algebra, not jnp.where: Mosaic cannot legalize a select
    # between i1 vectors
    valid &= (win <= 0) | (rows > start - win)  # (1, CS)

    h = hkv * g
    q = q_ref[0, 0].astype(jnp.float32) * scale  # (H, hd)
    # GQA group-select mask: M[h_, j] = 1 iff kv head j serves q head h_
    hh = jax.lax.broadcasted_iota(jnp.int32, (h, hkv), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (h, hkv), 1)
    gsel = (hh // g == jj).astype(jnp.float32)   # (H, Hkv)

    # per-kv-head score dots concatenated on the sublane (head) axis, so
    # the whole softmax update runs ONCE on (H, CS) — rank-3 dot_general
    # operands are out (Mosaic cannot legalize the result reshape), and
    # per-head elementwise updates cost more VPU issue slots than the DMA
    s_all = jnp.concatenate([
        jax.lax.dot_general(
            q[j * g : (j + 1) * g, :],
            kc_ref[0, :, j, :].astype(jnp.float32),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        for j in range(hkv)
    ], axis=0)                                   # (H, CS)
    s_all = jnp.where(valid, s_all, _NEG)
    m_old = m_ref[...]                           # (H, 1)
    m_new = jnp.maximum(m_old, jnp.max(s_all, axis=-1, keepdims=True))
    p = jnp.exp(s_all - m_new)
    p = jnp.where(valid, p, 0.0)                 # (H, CS)
    alpha = jnp.exp(m_old - m_new)               # (H, 1)
    l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    pv = jnp.concatenate([
        jax.lax.dot_general(
            p[j * g : (j + 1) * g, :],
            vc_ref[0, :, j, :].astype(jnp.float32),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        for j in range(hkv)
    ], axis=0)                                   # (H, hdv)
    acc_ref[...] = acc_ref[...] * alpha + pv
    m_ref[...] = m_new

    @pl.when(s_i == n_s - 1)
    def _epilogue():
        # fold in the new token's own K/V (position == start, always
        # visible to itself) and normalize
        kn = kn_ref[0, 0].astype(jnp.float32)   # (Hkv, hd)
        vn = vn_ref[0, 0].astype(jnp.float32)   # (Hkv, hdv)
        sn_full = jax.lax.dot_general(
            q, kn, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                        # (H, Hkv)
        sn = jnp.sum(sn_full * gsel, axis=-1, keepdims=True)  # (H, 1)
        m_old = m_ref[...]
        m_new = jnp.maximum(m_old, sn)
        alpha = jnp.exp(m_old - m_new)
        pn = jnp.exp(sn - m_new)                 # (H, 1)
        l_new = l_ref[...] * alpha + pn
        vn_sel = jax.lax.dot_general(
            gsel, vn, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                        # (H, hdv)
        num = acc_ref[...] * alpha + pn * vn_sel
        out_ref[0, 0] = num / l_new


def _fused_decode_attn_int8_kernel(
    # scalar prefetch
    start_ref,   # (B,) int32
    win_ref,     # (1,) int32
    # inputs
    q_ref,       # (1, 1, H, hd) f32
    kn_ref,      # (1, 1, Hkv, hd) f32 — UNQUANTIZED new row
    vn_ref,      # (1, 1, Hkv, hdv) f32
    kc_ref,      # (1, CS, Hkv, hd) int8 codes
    vc_ref,      # (1, CS, Hkv, hdv) int8
    ksc_ref,     # (1, CS, Hkv) f32 per-row scales
    vsc_ref,     # (1, CS, Hkv) f32
    # outputs
    out_ref,     # (1, 1, H, hdv) f32
    ko_ref,      # (1, 1, Hkv, hd) int8 aliased cache row
    vo_ref,      # (1, 1, Hkv, hdv) int8
    kso_ref,     # (1, 1, Hkv) f32 aliased scale row
    vso_ref,     # (1, 1, Hkv) f32
    # scratch
    m_ref,       # (H, 1) f32
    l_ref,       # (H, 1) f32
    acc_ref,     # (H, hdv) f32
    knq_ref,     # (Hkv, hd) f32 — quantized-dequantized new K
    vnq_ref,     # (Hkv, hdv) f32
    *,
    hkv: int,
    g: int,
    hd: int,
    hdv: int,
    cs: int,
    n_s: int,
    scale: float,
):
    """int8-KV variant (VERDICT r4 item 4): reads the cache CODES (half
    the bytes of bf16) + per-(row, head) scale planes, upcasting
    code * scale in VMEM — the composed XLA path materializes f32 copies
    of the whole cache instead (scripts/exp_hlo_copies.py; q8 decode
    measured 9.14 ms vs 5.52 bf16 at 8B np=32 in round 4).  The step's
    new K/V rows are quantized IN KERNEL with kv_cache.quantize_kv
    semantics (max-abs/127 per (row, head)) and the attention's own-token
    term uses the QUANTIZED values, bit-matching the composed int8 path."""
    b_i = pl.program_id(0)
    s_i = pl.program_id(1)
    start = start_ref[b_i]
    win = win_ref[0]

    @pl.when(s_i == 0)
    def _init():
        # quantize the new row exactly like runtime/kv_cache.quantize_kv
        def qz(x, codes_ref, sc_ref, dq_ref):
            amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)  # (Hkv, 1)
            sc = amax / 127.0
            inv = jnp.where(sc > 0, 1.0 / jnp.maximum(sc, 1e-30), 0.0)
            codes = jnp.clip(jnp.round(x * inv), -127, 127)
            codes_ref[0, 0] = codes.astype(jnp.int8)
            # (Hkv, 1) -> (1, Hkv) lane vector for the scale-plane row
            sc_ref[0] = jnp.transpose(sc, (1, 0))
            dq_ref[...] = codes * sc
        qz(kn_ref[0, 0].astype(jnp.float32), ko_ref, kso_ref, knq_ref)
        qz(vn_ref[0, 0].astype(jnp.float32), vo_ref, vso_ref, vnq_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    rows = jax.lax.broadcasted_iota(jnp.int32, (1, cs), 1) + s_i * cs
    valid = rows < start
    valid &= (win <= 0) | (rows > start - win)

    h = hkv * g
    q = q_ref[0, 0].astype(jnp.float32) * scale
    hh = jax.lax.broadcasted_iota(jnp.int32, (h, hkv), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (h, hkv), 1)
    gsel = (hh // g == jj).astype(jnp.float32)

    s_all = jnp.concatenate([
        jax.lax.dot_general(
            q[j * g : (j + 1) * g, :],
            kc_ref[0, :, j, :].astype(jnp.float32)
            * ksc_ref[0, :, j][:, None],   # scaled upcast, sublane bcast
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        for j in range(hkv)
    ], axis=0)                                   # (H, CS)
    s_all = jnp.where(valid, s_all, _NEG)
    m_old = m_ref[...]
    m_new = jnp.maximum(m_old, jnp.max(s_all, axis=-1, keepdims=True))
    p = jnp.exp(s_all - m_new)
    p = jnp.where(valid, p, 0.0)
    alpha = jnp.exp(m_old - m_new)
    l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    pv = jnp.concatenate([
        jax.lax.dot_general(
            p[j * g : (j + 1) * g, :],
            vc_ref[0, :, j, :].astype(jnp.float32)
            * vsc_ref[0, :, j][:, None],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        for j in range(hkv)
    ], axis=0)
    acc_ref[...] = acc_ref[...] * alpha + pv
    m_ref[...] = m_new

    @pl.when(s_i == n_s - 1)
    def _epilogue():
        kn = knq_ref[...]                        # quantized-dequantized
        vn = vnq_ref[...]
        sn_full = jax.lax.dot_general(
            q, kn, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        sn = jnp.sum(sn_full * gsel, axis=-1, keepdims=True)
        m_old = m_ref[...]
        m_new = jnp.maximum(m_old, sn)
        alpha = jnp.exp(m_old - m_new)
        pn = jnp.exp(sn - m_new)
        l_new = l_ref[...] * alpha + pn
        vn_sel = jax.lax.dot_general(
            gsel, vn, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        num = acc_ref[...] * alpha + pn * vn_sel
        out_ref[0, 0] = num / l_new


@functools.partial(
    jax.jit,
    static_argnames=("scale", "cs", "interpret"),
    donate_argnums=(3, 4, 7, 8),
)
def decode_attention_int8_pallas(
    q: jax.Array,       # (B, 1, H, hd) float
    k_new: jax.Array,   # (B, 1, Hkv, hd) float (quantized in kernel)
    v_new: jax.Array,   # (B, 1, Hkv, hdv)
    kc: jax.Array,      # (B, S, Hkv, hd) int8 codes (donated)
    vc: jax.Array,      # (B, S, Hkv, hdv) int8
    start: jax.Array,   # (B,) int32
    window: jax.Array,  # () or (1,) int32
    ksc: jax.Array,     # (B, S, Hkv) f32 scales (donated)
    vsc: jax.Array,
    *,
    scale: float,
    cs: int = 512,
    interpret: bool = False,
):
    """Returns (att, kc, vc, ksc, vsc) — codes AND scale rows updated in
    place.  See _fused_decode_attn_int8_kernel."""
    b, s, hkv, hd = kc.shape
    hdv = vc.shape[-1]
    h = q.shape[2]
    g = h // hkv
    requested = cs = min(cs, s)
    while s % cs:
        cs //= 2
    if cs < requested and cs < 128 and s > 128:
        raise ValueError(
            f"cache length {s} has no chunk divisor >= 128 (cs={cs}); "
            f"pad max_len to a multiple of 128"
        )
    n_s = s // cs

    kernel = functools.partial(
        _fused_decode_attn_int8_kernel, hkv=hkv, g=g, hd=hd, hdv=hdv,
        cs=cs, n_s=n_s, scale=scale,
    )

    def q_map(i, si, start_, win_):
        del si, start_, win_
        return (i, 0, 0, 0)

    def chunk_map(i, si, start_, win_):
        del start_, win_
        return (i, si, 0, 0)

    def row_map(i, si, start_, win_):
        del si, win_
        return (i, start_[i], 0, 0)

    def sc_chunk_map(i, si, start_, win_):
        del start_, win_
        return (i, si, 0)

    def sc_row_map(i, si, start_, win_):
        del si, win_
        return (i, start_[i], 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, n_s),
        in_specs=[
            pl.BlockSpec((1, 1, h, hd), q_map),
            pl.BlockSpec((1, 1, hkv, hd), q_map),
            pl.BlockSpec((1, 1, hkv, hdv), q_map),
            pl.BlockSpec((1, cs, hkv, hd), chunk_map),
            pl.BlockSpec((1, cs, hkv, hdv), chunk_map),
            pl.BlockSpec((1, cs, hkv), sc_chunk_map),
            pl.BlockSpec((1, cs, hkv), sc_chunk_map),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, h, hdv), q_map),
            pl.BlockSpec((1, 1, hkv, hd), row_map),
            pl.BlockSpec((1, 1, hkv, hdv), row_map),
            pl.BlockSpec((1, 1, hkv), sc_row_map),
            pl.BlockSpec((1, 1, hkv), sc_row_map),
        ],
        scratch_shapes=[
            pltpu.VMEM((h, 1), jnp.float32),
            pltpu.VMEM((h, 1), jnp.float32),
            pltpu.VMEM((h, hdv), jnp.float32),
            pltpu.VMEM((hkv, hd), jnp.float32),
            pltpu.VMEM((hkv, hdv), jnp.float32),
        ],
    )
    kv_bytes = (kc.size + vc.size) * 1 + (ksc.size + vsc.size) * 4
    out, kc2, vc2, ksc2, vsc2 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, h, hdv), jnp.float32),
            jax.ShapeDtypeStruct(kc.shape, kc.dtype),
            jax.ShapeDtypeStruct(vc.shape, vc.dtype),
            jax.ShapeDtypeStruct(ksc.shape, ksc.dtype),
            jax.ShapeDtypeStruct(vsc.shape, vsc.dtype),
        ],
        # after 2 prefetch args: q kn vn kc vc ksc vsc -> 5,6,7,8
        input_output_aliases={5: 1, 6: 2, 7: 3, 8: 4},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * s * h * (hd + hdv),
            bytes_accessed=kv_bytes,
            transcendentals=b * s * h,
        ),
        interpret=interpret,
    )(
        start.astype(jnp.int32),
        jnp.asarray(window, jnp.int32).reshape(1),
        q.astype(jnp.float32),
        k_new.astype(jnp.float32), v_new.astype(jnp.float32),
        kc, vc, ksc, vsc,
    )
    return out, kc2, vc2, ksc2, vsc2


@functools.partial(
    jax.jit,
    static_argnames=("scale", "cs", "interpret"),
    donate_argnums=(3, 4),
)
def decode_attention_pallas(
    q: jax.Array,       # (B, 1, H, hd) float
    k_new: jax.Array,   # (B, 1, Hkv, hd) — cast to the cache dtype here
    v_new: jax.Array,   # (B, 1, Hkv, hdv)
    kc: jax.Array,      # (B, S, Hkv, hd) cache (donated, updated in place)
    vc: jax.Array,      # (B, S, Hkv, hdv)
    start: jax.Array,   # (B,) int32 write row == query position
    window: jax.Array,  # () or (1,) int32; 0 = no sliding window
    *,
    scale: float,
    cs: int = 512,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (att (B, 1, H, hdv) f32, kc, vc) — caches updated in place."""
    b, s, hkv, hd = kc.shape
    hdv = vc.shape[-1]
    h = q.shape[2]
    g = h // hkv
    requested = cs = min(cs, s)
    while s % cs:
        cs //= 2  # S is slot-padded; powers of two divide in practice
    # an odd S degrades cs toward 1 (an S-step grid per layer — correct
    # but catastrophically slow); refuse instead of silently crawling
    # (ADVICE r4): callers pad the cache length to a 128 multiple.
    # Small explicitly-chunked caches (tests, tiny models) stay legal.
    if cs < requested and cs < 128 and s > 128:
        raise ValueError(
            f"cache length {s} has no chunk divisor >= 128 "
            f"(largest power-of-two factor gives cs={cs}); pad max_len "
            f"to a multiple of 128 to use the fused decode-attention "
            f"kernel"
        )
    n_s = s // cs

    kernel = functools.partial(
        _fused_decode_attn_kernel, hkv=hkv, g=g, hd=hd, hdv=hdv, cs=cs, n_s=n_s, scale=scale,
    )

    def q_map(i, si, start_, win_):
        del si, start_, win_
        return (i, 0, 0, 0)

    def chunk_map(i, si, start_, win_):
        del start_, win_
        return (i, si, 0, 0)

    def row_map(i, si, start_, win_):
        del si, win_
        return (i, start_[i], 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, n_s),
        in_specs=[
            pl.BlockSpec((1, 1, h, hd), q_map),
            pl.BlockSpec((1, 1, hkv, hd), q_map),
            pl.BlockSpec((1, 1, hkv, hdv), q_map),
            pl.BlockSpec((1, cs, hkv, hd), chunk_map),
            pl.BlockSpec((1, cs, hkv, hdv), chunk_map),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, h, hdv), q_map),
            pl.BlockSpec((1, 1, hkv, hd), row_map),
            pl.BlockSpec((1, 1, hkv, hdv), row_map),
        ],
        scratch_shapes=[
            pltpu.VMEM((h, 1), jnp.float32),
            pltpu.VMEM((h, 1), jnp.float32),
            pltpu.VMEM((h, hdv), jnp.float32),
        ],
    )
    kv_bytes = kc.size * kc.dtype.itemsize + vc.size * vc.dtype.itemsize
    out, kc2, vc2 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, h, hdv), jnp.float32),
            jax.ShapeDtypeStruct(kc.shape, kc.dtype),
            jax.ShapeDtypeStruct(vc.shape, vc.dtype),
        ],
        input_output_aliases={5: 1, 6: 2},  # (after 2 prefetch args: kc, vc)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * s * h * (hd + hdv),
            bytes_accessed=kv_bytes,
            transcendentals=b * s * h,
        ),
        interpret=interpret,
    )(
        start.astype(jnp.int32),
        jnp.asarray(window, jnp.int32).reshape(1),
        q.astype(jnp.float32),
        k_new.astype(kc.dtype), v_new.astype(vc.dtype),
        kc, vc,
    )
    return out, kc2, vc2

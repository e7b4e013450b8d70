"""Lossless ternary weight packing for TPU.

Replaces the reference's base-3 byte packings and column-interleaved layouts
(reference: ggml/src/ggml-quants-vlut.c:22-178) with TPU-friendly formats:

* ``i2`` — 2 bits per trit, 4 trits/byte (2.0 bpw).  The reference packs 4
  trits base-3 into a byte (81 codes) which is *also* 2.0 bpw; on TPU the
  bit-field encoding unpacks with shift+mask on the VPU instead of divides,
  so we keep the storage cost and drop the decode cost.
* ``i1`` — base-3, 5 trits/byte (243 codes, 1.6 bpw), matching the
  reference's I1_V density (reference: ggml/src/ggml-quants-vlut.c:96-136).
  Unlike the reference's mixed 5/4-trit non-uniform rows
  (ggml/src/ggml.c:1329-1333), rows are padded to a uniform block multiple —
  padding trits are zero and contribute nothing, so packing stays lossless.

Layout
------
A logical weight matrix ``W[K, N]`` (K = reduction dim, N = output channels,
N minor so channels land on TPU lanes) is packed along K in **blocks** of
``kb`` rows.  Within each block the ``r`` trits sharing a byte are taken from
``r`` *contiguous slabs* of ``kb/r`` rows, not interleaved neighbours:

    byte[block b, row j, col n] field q  <->  W[b*kb + q*(kb/r) + j, n]

so in-kernel unpack of field ``q`` yields a contiguous ``(kb/r, N)`` slab that
is written straight into the weight tile — no cross-sublane shuffles.  This is
the TPU answer to the reference's "Vec-LUT-centric" column-interleave + K-tile
layouts (I2_V_4 / I2_V_8, ggml-quants-vlut.c:46-92): there, the layout feeds
one LUT lookup per byte; here it feeds a vectorised shift/mask decode at HBM
line rate ahead of an MXU int8 matmul.

Magnitude lives in a separate per-tensor (or per-channel) fp32 scale, exactly
like the reference's ``.scale`` side tensors (src/llama-quant.cpp, SURVEY
§2.1.5): the packed trits are the exact signs — value-lossless.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np

Format = Literal["i2", "i1"]

# Trits per byte and default K-block sizes per format.  The reference's
# accumulation groups are 512 (I2) / 640 (I1) (ggml-cpu-quants-vlut.c:996,
# 1540) because its int16 accumulators must flush; on TPU accumulation is
# int32 on the MXU, so kb is a pure layout parameter.  We pick the smallest
# VMEM-tileable blocks (slab = kb/r = 32 sublanes, the int8 min tile) so
# tensor-parallel K-shards stay block-aligned with minimal padding.
TRITS_PER_BYTE = {"i2": 4, "i1": 5}
DEFAULT_BLOCK = {"i2": 128, "i1": 160}
LANES = 128  # TPU lane width; packed channel dim is padded to this

_POW3 = np.array([1, 3, 9, 27, 81], dtype=np.int16)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class TernaryTensor:
    """A packed ternary weight matrix with its magnitude scale.

    ``packed`` has shape ``(k_padded // r, n)`` uint8 (r = trits/byte).
    ``scale`` is fp32 with shape ``()`` (per-tensor) or ``(n,)`` (per-channel).
    ``k``/``n`` are the *logical* (unpadded) dims; ``kb`` the pack block size.
    """

    packed: jax.Array | np.ndarray
    scale: jax.Array | np.ndarray
    k: int
    n: int
    fmt: Format
    kb: int

    # -- pytree plumbing ---------------------------------------------------
    def tree_flatten(self):
        return (self.packed, self.scale), (self.k, self.n, self.fmt, self.kb)

    @classmethod
    def tree_unflatten(cls, aux, children):
        packed, scale = children
        k, n, fmt, kb = aux
        return cls(packed=packed, scale=scale, k=k, n=n, fmt=fmt, kb=kb)

    # -- convenience -------------------------------------------------------
    @property
    def word_packed(self) -> bool:
        """True when `packed` holds the serving-time uint32 word layout
        (word_pack): 4 slab bytes per lane, 16 trits per int32 element."""
        return self.packed.dtype != np.uint8

    @property
    def k_padded(self) -> int:
        per_row = TRITS_PER_BYTE[self.fmt] * (4 if self.word_packed else 1)
        return self.packed.shape[0] * per_row

    @property
    def n_padded(self) -> int:
        return self.packed.shape[1]

    @property
    def bits_per_weight(self) -> float:
        return 8.0 / TRITS_PER_BYTE[self.fmt]

    @property
    def nbytes(self) -> int:
        return int(np.prod(self.packed.shape))

    def __repr__(self) -> str:  # keep jit traces readable
        return (
            f"TernaryTensor({self.fmt}, k={self.k}, n={self.n}, "
            f"kb={self.kb}, packed{tuple(self.packed.shape)})"
        )


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pack_ternary(
    trits: np.ndarray,
    scale: np.ndarray | float = 1.0,
    fmt: Format = "i2",
    kb: int | None = None,
    k_mult: int | None = None,
    n_mult: int | None = None,
    use_native: bool = False,
) -> TernaryTensor:
    """Pack a {-1, 0, +1} int matrix of shape (K, N) into a TernaryTensor.

    Host-side (numpy).  Padding rows (K -> multiple of ``kb``) are zero trits.

    ``k_mult``/``n_mult`` request extra padding so the packed array can be
    evenly sharded across a tensor-parallel mesh axis: for a tp-way split,
    pass k_mult = tp * kb (K-sharded weights) or n_mult = tp * 128
    (N-sharded weights).  Padding trits are zero, so sharded matmuls stay
    exact no matter which shard holds the pad.
    """
    if trits.ndim != 2:
        raise ValueError(f"expected 2-D (K, N) trits, got {trits.shape}")
    r = TRITS_PER_BYTE[fmt]
    kb = kb or DEFAULT_BLOCK[fmt]
    if kb % r:
        raise ValueError(f"kb={kb} must be divisible by {r} for fmt={fmt}")
    k, n = trits.shape
    # K must align to lcm(kb, LANES) so GEMM K-tiles (whose x-block minor dim
    # must be a lane multiple) always land on pack-block boundaries
    k_align = math.lcm(kb, LANES)
    if k_mult is None and fmt == "i1" and k >= 4 * k_align:
        # i1's base alignment is 640, and Kp/640 lands on primes for the
        # common model widths (4096 -> 4480 = 640*7, 14336 -> 14720 =
        # 640*23), leaving bk=640 as the only K-tile — measured 2x slower
        # than the larger tiles a composite Kp admits.  Pad large-K i1
        # weights to 4*640=2560 multiples (<= 4% extra bytes) so the
        # K-grid has real choices (see bench/autotune.py --k-mult).
        k_mult = 4 * k_align
    kp = _round_up(k, max(k_align, k_mult or k_align))
    # lane-align channels (e.g. bitnet d_ff=8640), or shard-align when asked
    npad = _round_up(n, max(LANES, n_mult or LANES))

    t = np.zeros((kp, npad), dtype=np.int16)
    t[:k, :n] = trits.astype(np.int16)
    if not ((t >= -1) & (t <= 1)).all():
        raise ValueError("trits must be in {-1, 0, +1}")

    scale = np.asarray(scale, dtype=np.float32)

    if use_native:
        from vlut_tpu.convert import native  # lazy: builds .so on first use

        packed = native.pack(t.astype(np.int8), fmt, kb)
        if packed is not None:
            return TernaryTensor(
                packed=packed, scale=scale, k=k, n=n, fmt=fmt, kb=kb
            )

    nb = kp // kb
    slab = kb // r
    # (nb, r, slab, npad): slab q of block b covers rows b*kb + q*slab + j
    t = (t + 1).reshape(nb, r, slab, npad)
    if fmt == "i2":
        packed = np.zeros((nb, slab, npad), dtype=np.uint8)
        for q in range(r):
            packed |= (t[:, q] << (2 * q)).astype(np.uint8)
    else:  # i1: base-3 digits, little-endian (digit q = trit of slab q)
        acc = np.zeros((nb, slab, npad), dtype=np.int16)
        for q in range(r):
            acc += t[:, q] * _POW3[q]
        packed = acc.astype(np.uint8)
    packed = packed.reshape(kp // r, npad)

    scale = np.asarray(scale, dtype=np.float32)
    return TernaryTensor(packed=packed, scale=scale, k=k, n=n, fmt=fmt, kb=kb)


def unpack_ternary_np(t: TernaryTensor) -> np.ndarray:
    """Exact inverse of :func:`pack_ternary` (numpy, returns (k, n) int8)."""
    r = TRITS_PER_BYTE[t.fmt]
    packed = np.asarray(t.packed)
    nb = t.k_padded // t.kb
    slab = t.kb // r
    p = packed.reshape(nb, slab, t.n_padded).astype(np.int16)
    slabs = []
    for q in range(r):
        if t.fmt == "i2":
            f = (p >> (2 * q)) & 3
        else:
            f = (p // int(_POW3[q])) % 3
        slabs.append(f - 1)
    w = np.stack(slabs, axis=1).reshape(t.k_padded, t.n_padded)
    return w[: t.k, : t.n].astype(np.int8)


def unpack_ternary(
    t: TernaryTensor, dtype=jnp.int8, keep_padding: bool = False
) -> jax.Array:
    """jnp unpack (traceable) — the XLA reference path for the Pallas kernel.

    With ``keep_padding`` the (k_padded, n_padded) matrix is returned; padding
    trits are zero, so padded matmuls against zero-padded activations are
    exact.
    """
    r = TRITS_PER_BYTE[t.fmt]
    nb = t.k_padded // t.kb
    slab = t.kb // r
    p = jnp.asarray(t.packed).reshape(nb, slab, t.n_padded).astype(jnp.int16)
    slabs = []
    for q in range(r):
        if t.fmt == "i2":
            f = (p >> (2 * q)) & 3
        else:
            f = (p // int(_POW3[q])) % 3
        slabs.append(f - 1)
    w = jnp.stack(slabs, axis=1).reshape(t.k_padded, t.n_padded)
    if not keep_padding:
        w = w[: t.k, : t.n]
    return w.astype(dtype)


def ternarize(
    w: np.ndarray, method: str = "bitnet"
) -> tuple[np.ndarray, np.float32]:
    """Float weights -> (trits, scale) with BitNet-style absmean scaling.

    Mirrors the reference converter's ``weight_quant``
    (convert_hf_to_gguf_vlut.py:1632-1648): s = mean|w| refined over nonzero
    entries, trits = clip(round(w/s), -1, 1), stored scale = s so that
    ``trits * scale ~= w``.  For already-ternary checkpoints (sign values and
    one scale) this is exact — lossless round-trip.
    """
    w = np.asarray(w, dtype=np.float32)
    if method == "sign":
        # Pure sign with epsilon deadzone (reference quantize_i2_v semantics,
        # ggml/src/ggml-quants-vlut.c:22-44): magnitude handled externally.
        trits = np.where(np.abs(w) > 1e-6, np.sign(w), 0.0)
        return trits.astype(np.int8), np.float32(1.0)
    nz = w != 0
    s = np.abs(w[nz]).mean() if nz.any() else 0.0  # nonzero-mean refinement
    s = max(float(s), 1e-8)
    trits = np.clip(np.round(w / s), -1, 1)
    return trits.astype(np.int8), np.float32(s)


def word_pack(packed, fmt: Format = "i2", kb: int | None = None):
    """Byte layout -> serving uint32 WORD layout (load-time, device ok).

    The byte kernels expand each uint8 into one 32-bit VPU lane (4x lane
    waste); decode is ALU-bound, so repacking 4 slab bytes per uint32 cuts
    decode lane-ops ~4x.  Word w carries byte rows 4w..4w+3 little-endian —
    i.e. the uint32 array is the PLAIN byte-order reinterpretation of the
    byte layout.  This matches Mosaic's int32->int8 sublane bitcast (word
    w byte b -> int8 sublane 4w+b, measured on v5e), so the kernel's
    byte-plane decode exposes four decoded fields per lane-op:

        i2: fields of byte row j=4w+b, all four b at once, via ONE
            (word >> 2q) & 0x03030303 then a free sublane bitcast
        i1: base-243 digits via even/odd 16-bit SWAR multiply-shift, the
            two parity digit planes recombined into byte lanes
            (h0 | h1<<8) and bitcast (pallas_gemm._unpack_tile)

    Works on (..., rows, n) uint8 with any leading dims.
    """
    *lead, rows, n = packed.shape
    assert rows % 4 == 0, rows
    x = jnp.asarray(packed).reshape(*lead, rows // 4, 4, n)
    x = jnp.moveaxis(x, -2, -1)  # (..., rows//4, n, 4): bytes minor
    u32 = jax.lax.bitcast_convert_type(x, jnp.uint32)
    return u32.reshape(*lead, rows // 4, n)


def word_unpack(words, fmt: Format = "i2"):
    """Exact inverse of :func:`word_pack` (jnp-traceable): uint32 word
    layout -> uint8 byte layout.  Used by the XLA (prefill) matmul path so
    serving-time word-packed weights decode without a host repack."""
    *lead, rows4, n = words.shape
    b = jax.lax.bitcast_convert_type(jnp.asarray(words), jnp.uint8)
    b = jnp.moveaxis(b, -1, -2)  # (..., rows//4, 4, n)
    return b.reshape(*lead, rows4 * 4, n)


def word_pack_params(params, fmt: str):
    """Apply word_pack to every packed leaf of a params tree (stacked or
    unstacked layers)."""

    def wp_layers(layers):
        out = {}
        for name, v in layers.items():
            if isinstance(v, dict) and "packed" in v and (
                getattr(v["packed"], "dtype", None) == jnp.uint8
                or getattr(v["packed"], "dtype", None) == np.uint8
            ):
                out[name] = {**v, "packed": word_pack(v["packed"], fmt)}
            else:
                out[name] = v
        return out

    layers = params["layers"]
    if isinstance(layers, (list, tuple)):
        layers = tuple(wp_layers(lp) for lp in layers)
    else:
        layers = wp_layers(layers)
    return {**params, "layers": layers}

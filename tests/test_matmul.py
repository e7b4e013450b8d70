"""Ternary GEMM correctness: pallas(interpret) vs xla vs numpy int reference.

Encodes the reference's >TABLE_ENTRY_SIZE staging-bug class (SURVEY §0) as a
permanent regression test: token counts M in {1, 8, 32, 33, 64, 128, 512}
must all be exact.  GEMM exactness is asserted on pre-quantized int8 inputs
(integer math has a unique right answer); the float front-end is tested
separately with a one-quantum tolerance since round-to-nearest ties at the
float32 ULP level may legally differ between numpy and XLA.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from vlut_tpu.ops.matmul import ternary_matmul, ternary_matmul_quantized
from vlut_tpu.ops.packing import pack_ternary
from vlut_tpu.ops.quant import quantize_activations


def _int_reference(q, s, trits, w_scale):
    acc = np.asarray(q, np.int32) @ np.asarray(trits, np.int32)
    return acc.astype(np.float32) * np.asarray(s) * w_scale


def _case(m, k, n, fmt, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((m, k)).astype(np.float32)
    trits = rng.integers(-1, 2, size=(k, n)).astype(np.int8)
    scale = np.float32(0.031)
    t = pack_ternary(trits, scale=scale, fmt=fmt)
    q, s = quantize_activations(jnp.asarray(x))
    return x, q, s, trits, scale, t


M_SWEEP = [1, 8, 32, 33, 64, 128, 512]


@pytest.mark.parametrize("m", M_SWEEP)
@pytest.mark.parametrize("fmt", ["i2", "i1"])
def test_xla_exact(m, fmt):
    x, q, s, trits, scale, t = _case(m, 640, 256, fmt, seed=m)
    ref = _int_reference(q, s, trits, scale)
    got = np.asarray(ternary_matmul_quantized(q, s, t, impl="xla"))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("m", M_SWEEP)
@pytest.mark.parametrize("fmt", ["i2", "i1"])
def test_pallas_exact(m, fmt):
    x, q, s, trits, scale, t = _case(m, 640, 256, fmt, seed=100 + m)
    ref = _int_reference(q, s, trits, scale)
    got = np.asarray(
        ternary_matmul_quantized(q, s, t, impl="pallas_interpret")
    )
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("fmt", ["i2", "i1"])
def test_pallas_multi_ktile(fmt):
    # K spanning several pack blocks, N spanning several lane tiles
    x, q, s, trits, scale, t = _case(48, 2560, 384, fmt, seed=9)
    ref = _int_reference(q, s, trits, scale)
    got = np.asarray(
        ternary_matmul_quantized(q, s, t, impl="pallas_interpret")
    )
    np.testing.assert_array_equal(got, ref)


def test_unaligned_k_and_n():
    # K and N needing padding end-to-end
    x, q, s, trits, scale, t = _case(5, 300, 130, "i2", seed=11)
    ref = _int_reference(q, s, trits, scale)
    for impl in ("xla", "pallas_interpret"):
        got = np.asarray(ternary_matmul_quantized(q, s, t, impl=impl))
        assert got.shape == (5, 130)
        np.testing.assert_array_equal(got, ref)


def test_per_channel_scale():
    rng = np.random.default_rng(2)
    k, n = 512, 256
    x = rng.standard_normal((4, k)).astype(np.float32)
    trits = rng.integers(-1, 2, size=(k, n)).astype(np.int8)
    scale = rng.uniform(0.01, 0.1, size=n).astype(np.float32)
    t = pack_ternary(trits, scale=scale, fmt="i2")
    q, s = quantize_activations(jnp.asarray(x))
    ref = _int_reference(q, s, trits, scale[None, :])
    for impl in ("xla", "pallas_interpret"):
        got = np.asarray(ternary_matmul_quantized(q, s, t, impl=impl))
        np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_float_frontend_and_batch_dims():
    # end-to-end float path: tolerance of one activation quantum per element
    x, q, s, trits, scale, t = _case(6, 512, 128, "i2")
    x3 = x.reshape(2, 3, 512)
    ref = _int_reference(q, s, trits, scale).reshape(2, 3, 128)
    got = np.asarray(ternary_matmul(jnp.asarray(x3), t, impl="xla"))
    assert got.shape == (2, 3, 128)
    quantum = np.asarray(s).reshape(2, 3, 1) * scale
    assert (np.abs(got - ref) <= 512 * quantum + 1e-6).all()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_quantize_activations_semantics():
    x = np.array([[1.0, -3.0, 0.5], [0.0, 0.0, 0.0]], np.float32)
    q, s = quantize_activations(jnp.asarray(x))
    q, s = np.asarray(q), np.asarray(s)
    # max-ABS scaling (fixes reference max-positive quirk, SURVEY §2.1.3)
    assert q[0, 1] == -127
    np.testing.assert_allclose(s[0, 0], 3.0 / 127.0, rtol=1e-6)
    assert (q[1] == 0).all() and s[1, 0] == 0.0


def test_fused_quant_gemm_matches_two_step():
    """In-kernel activation quant must be bit-identical to
    quantize_activations + ternary_gemm (same max-abs scale, same rounding,
    same int32 accumulation)."""
    import jax.numpy as jnp

    from vlut_tpu.ops.matmul import ternary_matmul_quantized
    from vlut_tpu.ops.packing import pack_ternary
    from vlut_tpu.ops.pallas_gemm import (
        default_block_shapes,
        ternary_gemm_fused_quant,
    )
    from vlut_tpu.ops.quant import quantize_activations

    rng = np.random.default_rng(0)
    for fmt in ("i2", "i1"):
        k, n, m = 192, 256, 32
        trits = rng.integers(-1, 2, size=(k, n)).astype(np.int8)
        t = pack_ternary(trits, np.float32(0.07), fmt)
        x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)

        xq, xs = quantize_activations(x)
        ref = ternary_matmul_quantized(xq, xs, t, impl="xla")

        kp, np_ = t.k_padded, t.n_padded
        _, bn, bk = default_block_shapes(m, np_, kp, t.kb)
        xp = jnp.pad(x, ((0, 0), (0, kp - k)))
        ws = jnp.full((np_,), np.float32(0.07), jnp.float32)
        got = ternary_gemm_fused_quant(
            xp, jnp.asarray(t.packed), ws,
            fmt=fmt, kb=t.kb, k=k, bn=bn, bk=bk, interpret=True,
        )[:m, :n]
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-6, atol=1e-6
        )


@pytest.mark.parametrize("fmt", ["i2", "i1"])
@pytest.mark.parametrize("mode,sub_norm", [
    ("plain", False), ("norm", False), ("silu_mul", False),
    ("silu_mul", True),
])
def test_fused_decode_kernel_matches_composed(fmt, mode, sub_norm):
    """ternary_matmul_fused: the one-kernel decode path (interpret mode)
    must match the composed XLA fallback bit-for-bit — both round through
    bf16 at the same points."""
    import jax

    from vlut_tpu.ops.matmul import ternary_matmul_fused

    rng = np.random.default_rng(7)
    m, k, n = 4, 640, 256
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    x2 = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal((k,)).astype(np.float32) * 0.1 + 1.0)
    res = jnp.asarray(rng.standard_normal((m, n)), jnp.bfloat16)
    trits = rng.integers(-1, 2, size=(k, n)).astype(np.int8)
    t = pack_ternary(trits, scale=np.float32(0.05), fmt=fmt)

    kw = dict(mode=mode, sub_norm=sub_norm, norm_n=k, eps=1e-5,
              out_dtype=jnp.bfloat16)
    if mode == "silu_mul":
        kw["x2"] = x2
    if mode == "norm" or sub_norm:
        kw["norm_g"] = g
    want = ternary_matmul_fused(x, t, impl="xla", residual=res, **kw)
    got = ternary_matmul_fused(
        x, t, impl="pallas_interpret", residual=res, **kw
    )
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(want, np.float32)
    )
    # and without residual
    want2 = ternary_matmul_fused(x, t, impl="xla", **kw)
    got2 = ternary_matmul_fused(x, t, impl="pallas_interpret", **kw)
    np.testing.assert_array_equal(
        np.asarray(got2, np.float32), np.asarray(want2, np.float32)
    )


@pytest.mark.parametrize("fmt", ["i2", "i1"])
def test_word_packed_matches_byte_packed(fmt):
    """The serving-time uint32 word layout (packing.word_pack) must compute
    the exact same integers through every kernel as the byte layout —
    i2 via 16-trit shift/mask, i1 via the 20-trit SWAR base-243 decode."""
    import jax.numpy as jnp

    from vlut_tpu.ops.matmul import ternary_matmul_fused
    from vlut_tpu.ops.packing import TernaryTensor, word_pack

    rng = np.random.default_rng(11)
    m, k, n = 8, 640, 256
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    trits = rng.integers(-1, 2, size=(k, n)).astype(np.int8)
    t = pack_ternary(trits, scale=np.float32(0.04), fmt=fmt)
    tw = TernaryTensor(word_pack(jnp.asarray(t.packed), fmt), t.scale,
                       t.k, t.n, t.fmt, t.kb)
    assert tw.k_padded == t.k_padded

    # two-step kernel
    q, s = quantize_activations(x.astype(jnp.float32))
    a = ternary_matmul_quantized(q, s, t, impl="pallas_interpret")
    b = ternary_matmul_quantized(q, s, tw, impl="pallas_interpret")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # fused decode kernel
    g = jnp.asarray(rng.standard_normal((k,)).astype(np.float32) * .1 + 1)
    fa = ternary_matmul_fused(x, t, mode="norm", norm_g=g, norm_n=k,
                              impl="pallas_interpret")
    fb = ternary_matmul_fused(x, tw, mode="norm", norm_g=g, norm_n=k,
                              impl="pallas_interpret")
    np.testing.assert_array_equal(
        np.asarray(fa, np.float32), np.asarray(fb, np.float32)
    )


def test_xla_impl_word_packed_matches_slab():
    """The prefill XLA path must decode the serving-time uint32 word
    layout identically to the byte-slab layout (both formats)."""
    import numpy as np
    import jax.numpy as jnp

    from vlut_tpu.ops.matmul import ternary_matmul_quantized
    from vlut_tpu.ops.packing import TernaryTensor, pack_ternary, word_pack

    rng = np.random.default_rng(3)
    for fmt, k in (("i2", 256), ("i1", 320)):
        trits = rng.integers(-1, 2, (k, 256)).astype(np.int8)
        t = pack_ternary(trits, np.float32(0.05), fmt)
        tw = TernaryTensor(
            word_pack(jnp.asarray(t.packed), fmt), t.scale,
            t.k, t.n, t.fmt, t.kb,
        )
        xq = jnp.asarray(rng.integers(-127, 128, (300, k)), jnp.int8)
        xs = jnp.ones((300, 1), jnp.float32)
        a = ternary_matmul_quantized(xq, xs, t, impl="xla")
        b = ternary_matmul_quantized(xq, xs, tw, impl="xla")
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        want = (
            np.asarray(xq, np.int32) @ trits.astype(np.int32)
        ).astype(np.float32) * 0.05
        np.testing.assert_array_equal(np.asarray(a), want)

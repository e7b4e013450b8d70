"""TQ1_0/TQ2_0 baseline-codec tests (reference semantics:
ggml/src/ggml-quants.c:2099-2198)."""

from __future__ import annotations

import numpy as np
import pytest

from vlut_tpu.ops.tq import (
    QK,
    pack_tq1,
    pack_tq2,
    tq1_gemm,
    tq2_gemm,
    unpack_tq1,
    unpack_tq2,
)


def test_pack_roundtrip_exact_on_block_scaled_ternary():
    """Weights that are exactly d_b * {-1,0,1} per block must survive
    pack->unpack bit-exactly (the 'lossless for ternary' property that
    makes TQ2_0 the reference's ternary baseline)."""
    rng = np.random.default_rng(0)
    k, n = 512, 64
    trits = rng.integers(-1, 2, size=(k, n)).astype(np.float32)
    d = rng.uniform(0.01, 0.2, size=(k // QK, n)).astype(np.float16)
    w = trits * np.repeat(d.astype(np.float32), QK, axis=0)
    packed, scales = pack_tq2(w)
    np.testing.assert_array_equal(scales, d * (np.abs(trits).reshape(
        k // QK, QK, n).max(1) > 0))
    back = unpack_tq2(packed, scales)
    np.testing.assert_allclose(back, w, rtol=1e-3, atol=1e-6)


def test_pack_quantizes_like_reference():
    """General floats: per-block absmax d, round(w/d) in {-1,0,1}."""
    rng = np.random.default_rng(1)
    w = rng.standard_normal((QK, 8)).astype(np.float32)
    packed, scales = pack_tq2(w)
    d = np.abs(w).max(0)
    np.testing.assert_allclose(
        np.asarray(scales[0], np.float32), d, rtol=1e-3
    )
    got = unpack_tq2(packed, scales)
    want = np.rint(w / d).clip(-1, 1) * scales[0].astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-7)


def test_tq1_pack_roundtrip_and_bpw():
    """TQ1_0: block-scaled ternary survives exactly; 54 bytes/256 wts."""
    rng = np.random.default_rng(3)
    k, n = 768, 32
    trits = rng.integers(-1, 2, size=(k, n)).astype(np.float32)
    d = rng.uniform(0.01, 0.2, size=(k // QK, n)).astype(np.float16)
    w = trits * np.repeat(d.astype(np.float32), QK, axis=0)
    packed, scales = pack_tq1(w)
    assert packed.shape == (k // QK * 52, n)  # 52 + 2 scale bytes = 54
    back = unpack_tq1(packed, scales)
    np.testing.assert_allclose(back, w, rtol=1e-3, atol=1e-6)


@pytest.mark.parametrize("fmt", ["tq2", "tq1"])
def test_tq_gemm_exact_integers(fmt):
    """Kernel vs numpy oracle: integer-exact modulo the fp16 scale."""
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    m, k, n = 32, 1024, 256
    trits = rng.integers(-1, 2, size=(k, n)).astype(np.float32)
    d = rng.uniform(0.02, 0.1, size=(k // QK, n)).astype(np.float16)
    w = trits * np.repeat(d.astype(np.float32), QK, axis=0)
    pack, gemm = (pack_tq2, tq2_gemm) if fmt == "tq2" else \
        (pack_tq1, tq1_gemm)
    packed, scales = pack(w)

    xq = rng.integers(-100, 100, (m, k)).astype(np.int8)
    xs = rng.uniform(0.001, 0.01, (m, 1)).astype(np.float32)

    got = np.asarray(gemm(
        jnp.asarray(xq), jnp.asarray(packed), jnp.asarray(scales),
        jnp.asarray(xs), bm=32, bn=128, bk=512, interpret=True,
    ))
    blocks = xq.reshape(m, k // QK, QK).astype(np.int64)
    tb = trits.reshape(k // QK, QK, n).astype(np.int64)
    want = np.zeros((m, n), np.float64)
    for b in range(k // QK):
        want += (blocks[:, b] @ tb[b]).astype(np.float64) * \
            scales[b].astype(np.float64)
    want *= xs
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

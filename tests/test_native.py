"""Native (C++) pack/ternarize kernels must be bit-identical to numpy."""

import numpy as np
import pytest

from vlut_tpu.convert import native
from vlut_tpu.ops.packing import pack_ternary, ternarize

pytestmark = pytest.mark.skipif(
    native.get_lib() is None, reason="no C++ toolchain"
)


@pytest.mark.parametrize("fmt", ["i2", "i1"])
@pytest.mark.parametrize("k,n", [(1300, 200), (640, 128), (100, 100)])
def test_native_pack_matches_numpy(fmt, k, n):
    rng = np.random.default_rng(k + n)
    trits = rng.integers(-1, 2, (k, n)).astype(np.int8)
    a = pack_ternary(trits, 0.5, fmt, use_native=False)
    b = pack_ternary(trits, 0.5, fmt, use_native=True)
    np.testing.assert_array_equal(np.asarray(a.packed), np.asarray(b.packed))


@pytest.mark.parametrize("fmt", ["i2", "i1"])
def test_native_unpack_roundtrip(fmt):
    rng = np.random.default_rng(7)
    trits = rng.integers(-1, 2, (777, 160)).astype(np.int8)
    t = pack_ternary(trits, 1.0, fmt, use_native=True)
    up = native.unpack(np.asarray(t.packed), fmt, t.kb, t.k_padded)
    np.testing.assert_array_equal(up[: t.k, : t.n], trits)


def test_native_ternarize_matches_numpy():
    rng = np.random.default_rng(3)
    w = rng.standard_normal((512, 96)).astype(np.float32)
    t1, s1 = native.ternarize_absmean(w)
    t2, s2 = ternarize(w)
    np.testing.assert_array_equal(t1, t2)
    assert abs(float(s1) - float(s2)) < 1e-6


def test_native_detect_ternary():
    rng = np.random.default_rng(4)
    trits = rng.integers(-1, 2, (64, 64)).astype(np.float32)
    assert native.detect_ternary(trits * 0.05) == pytest.approx(0.05)
    assert native.detect_ternary(np.zeros((8, 8), np.float32)) == 0.0
    assert native.detect_ternary(rng.standard_normal((64, 64)).astype(np.float32)) == -1.0

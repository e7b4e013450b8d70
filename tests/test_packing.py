"""Exact-value tests for ternary packing (SURVEY §7 stage 1).

The reference has NO correctness tests for its Vec-LUT path (SURVEY §2.1.10),
which is how its >32-token staging bug shipped.  Here pack/unpack and the
GEMM are tested for exact integer equality, at token counts straddling every
tile boundary.
"""

import numpy as np
import pytest

from vlut_tpu.ops.packing import (
    DEFAULT_BLOCK,
    TRITS_PER_BYTE,
    TernaryTensor,
    pack_ternary,
    ternarize,
    unpack_ternary,
    unpack_ternary_np,
)


def _rand_trits(k, n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(-1, 2, size=(k, n)).astype(np.int8)


@pytest.mark.parametrize("fmt", ["i2", "i1"])
@pytest.mark.parametrize(
    "k,n",
    [
        (512, 128),     # exactly one i2 block
        (640, 128),     # exactly one i1 block
        (1024, 256),
        (100, 128),     # K needs padding (both fmts)
        (1300, 384),    # K needs padding
        (512, 100),     # N needs lane padding
        (2048, 8640 % 512 + 128),  # odd-ish N
    ],
)
def test_pack_roundtrip_np(fmt, k, n):
    trits = _rand_trits(k, n)
    t = pack_ternary(trits, scale=0.5, fmt=fmt)
    out = unpack_ternary_np(t)
    np.testing.assert_array_equal(out, trits)
    assert t.fmt == fmt and t.k == k and t.n == n
    assert t.n_padded % 128 == 0
    assert t.k_padded % t.kb == 0


@pytest.mark.parametrize("fmt", ["i2", "i1"])
def test_pack_roundtrip_jnp_matches_np(fmt):
    trits = _rand_trits(777, 200, seed=3)
    t = pack_ternary(trits, fmt=fmt)
    np.testing.assert_array_equal(np.asarray(unpack_ternary(t)), trits)
    # padded unpack: padding region must be exactly zero trits
    wp = np.asarray(unpack_ternary(t, keep_padding=True))
    np.testing.assert_array_equal(wp[: t.k, : t.n], trits)
    assert (wp[t.k :] == 0).all()
    assert (wp[:, t.n :] == 0).all()


@pytest.mark.parametrize("fmt", ["i2", "i1"])
def test_bits_per_weight(fmt):
    k, n = 2560, 1024
    t = pack_ternary(_rand_trits(k, n), fmt=fmt)
    bpw = t.nbytes * 8 / (t.k_padded * t.n_padded)
    assert bpw == pytest.approx(8 / TRITS_PER_BYTE[fmt])


def test_all_81_codes_roundtrip_i2():
    # every 4-trit combination appears and survives
    trits = np.array(
        [[(c >> (2 * q)) & 3 for c in range(81)] for q in range(4)]
    )
    # build from base-3 codes instead: cover all 81 combos
    codes = np.arange(81)
    cols = []
    for q in range(4):
        cols.append((codes // 3**q) % 3 - 1)
    block = np.stack(cols, axis=0)  # (4, 81)
    full = np.tile(block, (128, 1))  # K=512, N=81
    t = pack_ternary(full, fmt="i2")
    np.testing.assert_array_equal(unpack_ternary_np(t), full)


def test_all_243_codes_roundtrip_i1():
    codes = np.arange(243)
    cols = [(codes // 3**q) % 3 - 1 for q in range(5)]
    block = np.stack(cols, axis=0)  # (5, 243)
    full = np.tile(block, (128, 1))  # K=640
    t = pack_ternary(full, fmt="i1")
    np.testing.assert_array_equal(unpack_ternary_np(t), full)


def test_ternarize_exact_on_ternary_input():
    # sign weights times a scale must round-trip exactly (lossless contract)
    rng = np.random.default_rng(7)
    trits = rng.integers(-1, 2, size=(256, 64))
    w = trits * 0.037
    got, s = ternarize(w)
    np.testing.assert_array_equal(got, trits)
    assert s == pytest.approx(0.037, rel=1e-6)


def test_ternarize_sign_mode():
    w = np.array([[0.5, -2.0, 1e-9, 0.0]])
    got, s = ternarize(w, method="sign")
    np.testing.assert_array_equal(got, [[1, -1, 0, 0]])
    assert s == 1.0


def test_pytree_flatten():
    import jax

    t = pack_ternary(_rand_trits(512, 128))
    leaves, treedef = jax.tree_util.tree_flatten(t)
    assert len(leaves) == 2
    t2 = jax.tree_util.tree_unflatten(treedef, leaves)
    np.testing.assert_array_equal(np.asarray(t2.packed), np.asarray(t.packed))
    assert (t2.k, t2.n, t2.fmt, t2.kb) == (t.k, t.n, t.fmt, t.kb)


def test_rejects_non_ternary():
    with pytest.raises(ValueError):
        pack_ternary(np.full((8, 8), 2))

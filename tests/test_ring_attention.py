"""Direct _ring_attention coverage (VERDICT r3 weak #5 / task 7): every
mask variant vs the dense `_attention` reference on the virtual CPU mesh,
plus a per-device KV shard-shape assertion (KV memory must scale 1/sp).

The ring path (models/transformer.py _ring_attention) rotates KV blocks
with ppermute and merges with an online softmax; masks derive from GLOBAL
positions carried with the blocks, so every variant must bit-match the
gathered/dense form regardless of block origin.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from vlut_tpu.models.transformer import _attention, _ring_attention

SP = 4
B, T, H, HKV, HD = 2, 16, 4, 2, 8


def _mk(seed=0, pad_tail=0):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((B, T, H, HD)).astype(np.float32)
    k = rng.standard_normal((B, T, HKV, HD)).astype(np.float32)
    v = rng.standard_normal((B, T, HKV, HD)).astype(np.float32)
    pos = np.tile(np.arange(T, dtype=np.int32), (B, 1))
    if pad_tail:
        # ragged row: trailing tokens are padding (position -1 is masked
        # by the kp >= 0 term on both paths)
        pos[1, T - pad_tail:] = -1
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(pos)


def _ring(q, k, v, pos, **kw):
    mesh = Mesh(np.asarray(jax.devices()[:SP]), ("sp",))

    def local(q, k, v, pos):
        # per-device KV shard: memory scales 1/sp — the whole point of
        # the ring form vs gathered-KV (PARITY §2.3)
        assert k.shape[1] == T // SP, k.shape
        assert v.shape[1] == T // SP
        return _ring_attention(q, k, v, pos, pos, HD, "sp", **kw)

    f = shard_map(
        local, mesh=mesh,
        in_specs=(P(None, "sp"), P(None, "sp"), P(None, "sp"),
                  P(None, "sp")),
        out_specs=P(None, "sp"),
        check_vma=False,
    )
    return np.asarray(jax.jit(f)(q, k, v, pos))


CASES = {
    "causal": {},
    "swa": {"window": 5},
    "chunked": {"window": 4, "chunked_window": True},
    "alibi": {"alibi": np.geomspace(1.0, 1 / 64, H).astype(np.float32)},
    "sinks": {"sinks": np.linspace(-1.0, 1.0, H).astype(np.float32)},
    "softcap": {"softcap": 30.0},
    "bidir": {"causal": False},
    "bidir_symmetric_swa": {"causal": False, "window": 5},
    "scale": {"scale": 0.31},
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_ring_matches_dense(name):
    kw = dict(CASES[name])
    if "window" in kw:
        kw["window"] = jnp.asarray(kw["window"], jnp.int32)
    q, k, v, pos = _mk(seed=hash(name) % 2**31)
    got = _ring(q, k, v, pos, **kw)
    want = np.asarray(_attention(q, k, v, pos, pos, HD, **kw))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_ring_ragged_padding():
    """Padding rows (pos = -1) must be invisible from every ring block —
    including the shards that hold ONLY padding."""
    q, k, v, pos = _mk(seed=7, pad_tail=T // SP + 1)
    got = _ring(q, k, v, pos)
    want = np.asarray(_attention(q, k, v, pos, pos, HD))
    real = np.asarray(pos >= 0)
    np.testing.assert_allclose(got[real], want[real], rtol=2e-5, atol=2e-6)


def test_ring_window_zero_means_off():
    """window=0 must behave as no window (trace-time gating parity with
    the dense path, which tests `window > 0` inside jnp.where)."""
    q, k, v, pos = _mk(seed=9)
    got = _ring(q, k, v, pos, window=jnp.asarray(0, jnp.int32))
    want = np.asarray(_attention(q, k, v, pos, pos, HD, window=None))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)

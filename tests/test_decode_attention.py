"""Parity for the fused decode-attention kernel (ops/decode_attention.py).

The fused kernel must reproduce the composed path exactly used on
non-TPU backends: write_rows (vmap dynamic_update_slice) into the cache,
then transformer._attention over the full buffer.  Covers: ragged slot
lengths, GQA grouping, sliding window, multi-chunk online softmax, and
the in-place cache update.
"""

import numpy as np
import jax
import jax.numpy as jnp

from vlut_tpu.models.transformer import _attention
from vlut_tpu.ops.decode_attention import decode_attention_pallas
from vlut_tpu.ops.kv_update import write_rows


def _composed(q, kn, vn, kc, vc, start, window, scale):
    kc2 = write_rows(kc, kn.astype(kc.dtype), start, impl="xla")
    vc2 = write_rows(vc, vn.astype(vc.dtype), start, impl="xla")
    b, s = kc.shape[0], kc.shape[1]
    k_pos = jnp.tile(jnp.arange(s, dtype=jnp.int32), (b, 1))
    att = _attention(
        q, kc2, vc2, start[:, None], k_pos, q.shape[-1],
        scale=scale, window=window,
    )
    return att, kc2, vc2


def _run(b=4, s=96, hkv=2, g=3, hd=64, window=None, cs=32, seed=0):
    rng = np.random.default_rng(seed)
    h = hkv * g
    q = jnp.asarray(rng.standard_normal((b, 1, h, hd)), jnp.float32)
    kn = jnp.asarray(rng.standard_normal((b, 1, hkv, hd)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((b, 1, hkv, hd)), jnp.float32)
    kc = jnp.asarray(
        rng.standard_normal((b, s, hkv, hd)), jnp.bfloat16)
    vc = jnp.asarray(
        rng.standard_normal((b, s, hkv, hd)), jnp.bfloat16)
    # ragged lengths incl. 0 (empty history) and s-1 (full cache)
    start = jnp.asarray([0, 1, s // 2, s - 1][:b], jnp.int32)
    scale = 1.0 / float(np.sqrt(hd))

    want, kc_w, vc_w = _composed(q, kn, vn, kc, vc, start,
                                 window, scale)
    got, kc_g, vc_g = decode_attention_pallas(
        q, kn, vn, kc.copy(), vc.copy(), start,
        window if window is not None else 0,
        scale=scale, cs=cs, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(
        np.asarray(kc_g, np.float32), np.asarray(kc_w, np.float32))
    np.testing.assert_array_equal(
        np.asarray(vc_g, np.float32), np.asarray(vc_w, np.float32))


def test_fused_decode_attention_matches_composed():
    _run()


def test_fused_decode_attention_single_chunk():
    _run(cs=512)  # cs > s -> one chunk


def test_fused_decode_attention_window():
    _run(window=jnp.asarray(7, jnp.int32), seed=3)


def test_fused_decode_attention_mha():
    _run(hkv=4, g=1, s=64, cs=16, seed=5)


# ---------------------------------------------------------------------------
# int8-KV variant (VERDICT r4 item 4): codes + scale planes in, new row
# quantized in kernel, attention bit-matching the deferred-scale composed
# path
# ---------------------------------------------------------------------------

def _composed_int8(q, kn, vn, kc, vc, ksc, vsc, start, window, scale):
    from vlut_tpu.runtime.kv_cache import quantize_kv

    knq, kns = quantize_kv(kn)
    vnq, vns = quantize_kv(vn)
    upd3 = jax.vmap(
        lambda c, u, p: jax.lax.dynamic_update_slice(c, u, (p, 0, 0)))
    upd2 = jax.vmap(
        lambda c, u, p: jax.lax.dynamic_update_slice(c, u, (p, 0)))
    kc2, vc2 = upd3(kc, knq, start), upd3(vc, vnq, start)
    ksc2, vsc2 = upd2(ksc, kns, start), upd2(vsc, vns, start)
    b, s = kc.shape[0], kc.shape[1]
    k_pos = jnp.tile(jnp.arange(s, dtype=jnp.int32), (b, 1))
    att = _attention(
        q, kc2, vc2, start[:, None], k_pos, q.shape[-1],
        scale=scale, window=window, k_scale=ksc2, v_scale=vsc2,
    )
    return att, kc2, vc2, ksc2, vsc2


def _run_int8(b=4, s=96, hkv=2, g=3, hd=64, window=None, cs=32, seed=0):
    from vlut_tpu.ops.decode_attention import decode_attention_int8_pallas
    from vlut_tpu.runtime.kv_cache import quantize_kv

    rng = np.random.default_rng(seed)
    h = hkv * g
    q = jnp.asarray(rng.standard_normal((b, 1, h, hd)), jnp.float32)
    kn = jnp.asarray(rng.standard_normal((b, 1, hkv, hd)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((b, 1, hkv, hd)), jnp.float32)
    kf = rng.standard_normal((b, s, hkv, hd)).astype(np.float32)
    vf = rng.standard_normal((b, s, hkv, hd)).astype(np.float32)
    kc, ksc = quantize_kv(jnp.asarray(kf))
    vc, vsc = quantize_kv(jnp.asarray(vf))
    start = jnp.asarray([0, 1, s // 2, s - 1][:b], jnp.int32)
    scale = 1.0 / float(np.sqrt(hd))

    want, kc_w, vc_w, ksc_w, vsc_w = _composed_int8(
        q, kn, vn, kc, vc, ksc, vsc, start, window, scale)
    got, kc_g, vc_g, ksc_g, vsc_g = decode_attention_int8_pallas(
        q, kn, vn, kc.copy(), vc.copy(), start,
        window if window is not None else 0, ksc.copy(), vsc.copy(),
        scale=scale, cs=cs, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(kc_g), np.asarray(kc_w))
    np.testing.assert_array_equal(np.asarray(vc_g), np.asarray(vc_w))
    np.testing.assert_allclose(
        np.asarray(ksc_g), np.asarray(ksc_w), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(vsc_g), np.asarray(vsc_w), rtol=1e-6, atol=1e-7)


def test_int8_decode_attention_matches_composed():
    _run_int8()


def test_int8_decode_attention_window_and_chunks():
    _run_int8(window=jnp.asarray(9, jnp.int32), cs=16, seed=3)


def test_int8_decode_attention_mha_single_chunk():
    _run_int8(hkv=4, g=1, s=64, cs=512, seed=5)

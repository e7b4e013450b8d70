"""Transformer forward tests: cache consistency, arch variants, parity.

Mirrors the reference's missing correctness layer: incremental decode with a
KV cache must reproduce the no-cache full forward bit-for-bit-ish (same
quantized matmuls, same math — tolerance covers bf16 cache storage), and the
quantized model must track its own FP-dequant twin closely.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from vlut_tpu.config import PRESETS
from vlut_tpu.models.transformer import forward, init_kv_cache, init_params


def _tiny(arch="tiny"):
    cfg = PRESETS[arch]
    params = init_params(cfg, seed=0)
    return cfg, params


@pytest.mark.parametrize("arch", ["tiny", "tiny_bitnet"])
def test_forward_shapes(arch):
    cfg, params = _tiny(arch)
    b, t = 2, 8
    tokens = jnp.arange(b * t, dtype=jnp.int32).reshape(b, t) % cfg.vocab_size
    pos = jnp.tile(jnp.arange(t, dtype=jnp.int32), (b, 1))
    logits, _ = forward(params, cfg, tokens, pos, None, impl="xla")
    from vlut_tpu.models.dims import make_plan

    assert logits.shape == (b, t, make_plan(cfg).vocab_p)
    assert np.isfinite(np.asarray(logits)).all()


def test_cache_matches_no_cache():
    cfg, params = _tiny()
    b, t = 2, 12
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(
        rng.integers(0, cfg.vocab_size, (b, t)), jnp.int32
    )
    pos = jnp.tile(jnp.arange(t, dtype=jnp.int32), (b, 1))

    ref, _ = forward(params, cfg, tokens, pos, None, impl="xla")

    cache = init_kv_cache(cfg, b, max_len=32, dtype=jnp.float32)
    got, cache = forward(params, cfg, tokens, pos, cache, impl="xla")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_incremental_decode_matches_full():
    cfg, params = _tiny()
    b, t = 2, 10
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, t)), jnp.int32)
    pos = jnp.tile(jnp.arange(t, dtype=jnp.int32), (b, 1))

    full, _ = forward(params, cfg, tokens, pos, None, impl="xla")

    # prefill first 6, then decode one token at a time
    cache = init_kv_cache(cfg, b, max_len=32, dtype=jnp.float32)
    _, cache = forward(params, cfg, tokens[:, :6], pos[:, :6], cache,
                       impl="xla")
    outs = []
    for i in range(6, t):
        lg, cache = forward(
            params, cfg, tokens[:, i : i + 1], pos[:, i : i + 1], cache,
            impl="xla",
        )
        outs.append(np.asarray(lg)[:, 0])
    inc = np.stack(outs, axis=1)
    ref = np.asarray(full)[:, 6:]
    # XLA fuses reductions differently for T=1 vs T=10 shapes, so activation
    # quant can flip rounding ties by one quantum — tolerance is quantization
    # noise, with hard top-1 agreement (greedy decode invariance).
    np.testing.assert_allclose(inc, ref, rtol=0.05, atol=0.05)
    assert (inc.argmax(-1) == ref.argmax(-1)).all()


def test_quantized_tracks_dequant():
    cfg, params = _tiny()
    b, t = 1, 8
    tokens = jnp.asarray([[3, 7, 11, 2, 9, 4, 5, 6]], jnp.int32)
    pos = jnp.tile(jnp.arange(t, dtype=jnp.int32), (b, 1))
    q, _ = forward(params, cfg, tokens, pos, None, impl="xla")
    f, _ = forward(params, cfg, tokens, pos, None, impl="dequant")
    # int8 activation quant noise only — top-1 agreement and close logits
    qa, fa = np.asarray(q), np.asarray(f)
    assert (qa.argmax(-1) == fa.argmax(-1)).mean() > 0.9
    rel = np.abs(qa - fa).max() / (np.abs(fa).max() + 1e-9)
    assert rel < 0.08


def test_pallas_interpret_full_model():
    cfg, params = _tiny()
    tokens = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    pos = jnp.arange(4, dtype=jnp.int32)[None]
    a, _ = forward(params, cfg, tokens, pos, None, impl="xla")
    bl, _ = forward(params, cfg, tokens, pos, None, impl="pallas_interpret")
    a, bl = np.asarray(a), np.asarray(bl)
    # GEMM exactness is asserted in test_matmul; across full jitted programs
    # XLA fusion differences can flip activation-quant rounding ties, so the
    # model-level contract is quant-noise closeness + greedy invariance.
    np.testing.assert_allclose(a, bl, rtol=0.05, atol=0.05)
    assert (a.argmax(-1) == bl.argmax(-1)).all()


def test_quantized_kv_cache_tracks_bf16():
    """int8 KV (reference cache_type q8_0 analog): decode with a quantized
    cache must track the fp cache closely and keep greedy agreement."""
    cfg, params = _tiny()
    b, t = 2, 12
    rng = np.random.default_rng(3)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, t)), jnp.int32)
    pos = jnp.tile(jnp.arange(t, dtype=jnp.int32), (b, 1))

    ref_cache = init_kv_cache(cfg, b, max_len=32, dtype=jnp.float32)
    ref, _ = forward(params, cfg, tokens, pos, ref_cache, impl="xla")

    qcache = init_kv_cache(cfg, b, max_len=32, quantized=True)
    assert qcache["k"].dtype == jnp.int8 and "k_scale" in qcache
    got, qcache = forward(params, cfg, tokens, pos, qcache, impl="xla")
    ra, ga = np.asarray(ref), np.asarray(got)
    assert (ra.argmax(-1) == ga.argmax(-1)).mean() > 0.9
    rel = np.abs(ga - ra).max() / (np.abs(ra).max() + 1e-9)
    assert rel < 0.05

    # incremental decode on the quantized cache stays finite + consistent
    lg, qcache = forward(
        params, cfg, tokens[:, :1], jnp.full((b, 1), t, jnp.int32), qcache,
        impl="xla",
    )
    assert np.isfinite(np.asarray(lg)).all()


def test_quantized_kv_seq_ops_and_state():
    from vlut_tpu.runtime import kv_cache as kvc
    from vlut_tpu.runtime.state import load_slot_state, save_slot_state

    cfg, params = _tiny()
    qcache = init_kv_cache(cfg, 2, max_len=32, quantized=True)
    tokens = jnp.asarray([[5, 6, 7, 8]], jnp.int32)
    pos = jnp.arange(4, dtype=jnp.int32)[None]
    view = {k: v[:, :1] for k, v in qcache.items()}
    _, view = forward(params, cfg, tokens, pos, view, impl="xla")
    qcache = {k: qcache[k].at[:, :1].set(view[k]) for k in qcache}

    # seq_cp slot 0 -> 1 copies codes AND scales
    c2 = kvc.seq_cp(
        {k: v.copy() for k, v in qcache.items()},
        jnp.int32(0), jnp.int32(1), jnp.int32(4),
    )
    np.testing.assert_array_equal(
        np.asarray(c2["k"][:, 1, :4]), np.asarray(qcache["k"][:, 0, :4])
    )
    np.testing.assert_array_equal(
        np.asarray(c2["k_scale"][:, 1, :4]),
        np.asarray(qcache["k_scale"][:, 0, :4]),
    )

    # state save/restore round-trips all four arrays
    blob = save_slot_state(qcache, 0, 4, [5, 6, 7, 8])
    fresh = init_kv_cache(cfg, 2, max_len=32, quantized=True)
    fresh, hist = load_slot_state(fresh, 0, blob)
    assert hist == [5, 6, 7, 8]
    np.testing.assert_array_equal(
        np.asarray(fresh["k"][:, 0, :4]), np.asarray(qcache["k"][:, 0, :4])
    )
    np.testing.assert_array_equal(
        np.asarray(fresh["v_scale"][:, 0, :4]),
        np.asarray(qcache["v_scale"][:, 0, :4]),
    )


def test_engine_kv_quant_generates():
    from vlut_tpu.runtime.engine import Engine, Request
    from vlut_tpu.runtime.sampling import SamplerParams

    cfg, params = _tiny()
    eng = Engine(cfg, params, n_slots=2, max_len=64, impl="xla",
                 kv_quant=True)
    req = Request(prompt=[3, 5, 7], max_new_tokens=6,
                  sampler=SamplerParams(temperature=0.0))
    eng.run([req])
    assert len(req.output) == 6


def test_chunked_attention_matches_dense():
    """Online-softmax chunked attention must equal the dense path exactly
    (same masks incl. padding/causality/window/softcap)."""
    from vlut_tpu.models import transformer as tr

    rng = np.random.default_rng(5)
    b, t, h, hkv, hd, s = 2, 6, 4, 2, 16, 40
    q = jnp.asarray(rng.standard_normal((b, t, h, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, hkv, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, hkv, hd)), jnp.float32)
    q_pos = jnp.asarray([[10, 11, 12, 13, 14, 15]] * b, jnp.int32)
    k_pos = jnp.tile(jnp.arange(s, dtype=jnp.int32)[None], (b, 1))
    k_pos = k_pos.at[:, 35:].set(-1)  # padding rows

    for softcap, window in ((0.0, None), (8.0, None),
                            (0.0, jnp.int32(6)), (5.0, jnp.int32(4))):
        dense = tr._attention(
            q, k, v, q_pos, k_pos, hd, softcap=softcap, window=window
        )
        chunked = tr._attention_chunked(
            q, k, v, q_pos, k_pos, hd, softcap=softcap, window=window,
            chunk=16,
        )
        np.testing.assert_allclose(
            np.asarray(chunked), np.asarray(dense), rtol=2e-5, atol=2e-5
        )


def test_long_context_forward_uses_chunked():
    """Forward with KV beyond the chunk threshold stays correct: decode at a
    long position equals the dense computation on a model with a big cache."""
    import dataclasses

    from vlut_tpu.models import transformer as tr

    cfg = dataclasses.replace(PRESETS["tiny"], max_seq_len=4096)
    params = init_params(cfg, seed=0)
    b, t = 1, 8
    rng = np.random.default_rng(6)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, t)), jnp.int32)
    pos = jnp.arange(t, dtype=jnp.int32)[None]
    # cache bigger than ATTN_CHUNK forces the chunked path
    cache = init_kv_cache(cfg, b, max_len=tr.ATTN_CHUNK + 64,
                          dtype=jnp.float32)
    got, _ = forward(params, cfg, tokens, pos, cache, impl="xla")
    ref, _ = forward(params, cfg, tokens, pos, None, impl="xla")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_fused_projections_exact():
    """Load-time qkv / gate-up fusion must compute the same model as the
    separate matmuls (same trits, scales broadcast per channel).  The two
    programs have different shapes (concat GEMM + fused-decode projections
    vs separate ops), so XLA reassociates f32 attention reductions
    differently: tight tolerance + full argmax agreement, per the repo's
    cross-program comparison convention.  The integer GEMM equivalence
    itself is covered bit-exactly in test_matmul."""
    from vlut_tpu.models.transformer import fuse_projections

    cfg, params = _tiny()
    fused = fuse_projections(params, cfg)
    assert "wqkv" in fused["layers"] and "wq" not in fused["layers"]
    assert "w_gateup" in fused["layers"]
    b, t = 2, 8
    rng = np.random.default_rng(9)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, t)), jnp.int32)
    pos = jnp.tile(jnp.arange(t, dtype=jnp.int32), (b, 1))
    ref, _ = forward(params, cfg, tokens, pos, None, impl="xla")
    got, _ = forward(fused, cfg, tokens, pos, None, impl="xla")
    ref = np.asarray(ref, np.float32)
    got = np.asarray(got, np.float32)
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=5e-2)
    np.testing.assert_array_equal(got.argmax(-1), ref.argmax(-1))


def test_fused_projections_moe_keeps_experts():
    from vlut_tpu.models.transformer import fuse_projections

    cfg = PRESETS["tiny_moe"]
    params = init_params(cfg, seed=0)
    fused = fuse_projections(params, cfg)
    assert "wqkv" in fused["layers"]
    assert "w_gate" in fused["layers"]  # expert stack untouched


def test_unstacked_layers_matches_scan():
    """Unrolled per-layer weights compute the same model as the scan.  Not
    bit-identical — XLA fuses/reassociates f32 epilogues differently per
    program shape and activations are bf16 — so: tight tolerance + full
    greedy agreement, with and without a cache, composed with fusion."""
    from vlut_tpu.models.transformer import fuse_projections, unstack_layers

    cfg, params = _tiny()
    b, t = 2, 8
    rng = np.random.default_rng(11)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, t)), jnp.int32)
    pos = jnp.tile(jnp.arange(t, dtype=jnp.int32), (b, 1))
    ref, ref_cache = forward(
        params, cfg, tokens, pos,
        init_kv_cache(cfg, b, max_len=32, dtype=jnp.float32), impl="xla",
    )
    uns = unstack_layers(fuse_projections(params, cfg), cfg)
    got, got_cache = forward(
        uns, cfg, tokens, pos,
        init_kv_cache(cfg, b, max_len=32, dtype=jnp.float32), impl="xla",
    )
    ra, ga = np.asarray(ref), np.asarray(got)
    np.testing.assert_allclose(ga, ra, rtol=0.02, atol=0.02)
    assert (ga.argmax(-1) == ra.argmax(-1)).mean() > 0.95
    np.testing.assert_allclose(
        np.asarray(got_cache["k"]), np.asarray(ref_cache["k"]),
        rtol=0.02, atol=0.02,
    )


def test_int8_head_tracks_bf16():
    from vlut_tpu.models.transformer import quantize_head

    cfg, params = _tiny()
    b, t = 2, 8
    rng = np.random.default_rng(12)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, t)), jnp.int32)
    pos = jnp.tile(jnp.arange(t, dtype=jnp.int32), (b, 1))
    ref, _ = forward(params, cfg, tokens, pos, None, impl="xla")
    qp = quantize_head(params)
    assert isinstance(qp["lm_head"], dict)
    got, _ = forward(qp, cfg, tokens, pos, None, impl="xla")
    ra, ga = np.asarray(ref), np.asarray(got)
    # double (activation+weight) int8 quantization flips near-ties on a
    # flat random model; real checkpoints have peaked logits
    assert (ra.argmax(-1) == ga.argmax(-1)).mean() > 0.85
    rel = np.abs(ga - ra).max() / (np.abs(ra).max() + 1e-9)
    assert rel < 0.05
    # idempotent
    assert quantize_head(qp)["lm_head"] is qp["lm_head"]


def test_int8_kv_deferred_scales_match_dequant():
    """int8-KV decode with DEFERRED per-row scales (scores*ks, p*vs —
    the codes stream as int8) must equal attending over dequantize_kv
    outputs exactly: (q . codes*ks) == (q . codes)*ks and
    p . (codes*vs) == (p*vs) . codes.  Covers the decode cache path
    end-to-end via forward with a quantized cache vs a bf16 cache primed
    with the DEQUANTIZED rows (so the only difference is where the scale
    is applied)."""
    import jax
    import jax.numpy as jnp

    from vlut_tpu.config import PRESETS
    from vlut_tpu.models.transformer import (
        forward,
        init_kv_cache,
        init_params,
    )
    from vlut_tpu.runtime.kv_cache import dequantize_kv, to_layered

    cfg = PRESETS["tiny"]
    params = init_params(cfg, seed=0)
    rng = np.random.default_rng(7)
    b, t = 2, 6
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, t)), jnp.int32)
    pos = jnp.tile(jnp.arange(t, dtype=jnp.int32), (b, 1))

    cache_q = init_kv_cache(cfg, b, max_len=16, quantized=True)
    lg_q, cache_q = forward(params, cfg, tokens, pos, cache_q, impl="xla")

    # bf16 cache primed with the dequantized rows: float32 storage
    # removes the bf16 rounding difference from the comparison
    cache_f = init_kv_cache(cfg, b, max_len=16, dtype=jnp.float32)
    cache_f = {
        "k": dequantize_kv(cache_q["k"], cache_q["k_scale"]),
        "v": dequantize_kv(cache_q["v"], cache_q["v_scale"]),
    }
    tok2 = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, 1)), jnp.int32)
    pos2 = jnp.full((b, 1), t, jnp.int32)
    lg_a, _ = forward(params, cfg, tok2, pos2, cache_q, impl="xla")
    lg_b, _ = forward(params, cfg, tok2, pos2, cache_f, impl="xla")
    # the only remaining delta: the NEW row is quantized in cache_q but
    # exact in cache_f — compare with quantization-noise tolerance
    np.testing.assert_allclose(
        np.asarray(lg_a), np.asarray(lg_b), rtol=2e-2, atol=2e-2)
    np.testing.assert_array_equal(
        np.asarray(lg_a).argmax(-1), np.asarray(lg_b).argmax(-1))

    # exact algebraic identity at the _attention level
    from vlut_tpu.models.transformer import _attention

    B, S, H, HD = 2, 8, 2, 8
    q = jnp.asarray(rng.standard_normal((B, 1, 4, HD)), jnp.float32)
    kq = jnp.asarray(rng.integers(-127, 128, (B, S, H, HD)), jnp.int8)
    vq = jnp.asarray(rng.integers(-127, 128, (B, S, H, HD)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.01, 0.1, (B, S, H)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.01, 0.1, (B, S, H)), jnp.float32)
    qp = jnp.full((B, 1), S - 1, jnp.int32)
    kp = jnp.tile(jnp.arange(S, dtype=jnp.int32), (B, 1))
    got = _attention(q, kq, vq, qp, kp, HD, k_scale=ks, v_scale=vs)
    want = _attention(q, dequantize_kv(kq, ks), dequantize_kv(vq, vs),
                      qp, kp, HD)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)

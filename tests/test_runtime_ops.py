"""Sequence-op tests: rope-rebased context shift, state round-trip,
slot fork, prompt-prefix reuse (llama-memory contract, SURVEY §2.4)."""

import numpy as np
import pytest
import jax.numpy as jnp

from vlut_tpu.config import PRESETS
from vlut_tpu.models.dims import make_plan
from vlut_tpu.models.transformer import init_params
from vlut_tpu.ops.rope import rope_table
from vlut_tpu.runtime import kv_cache as kvc
from vlut_tpu.runtime import state as state_mod
from vlut_tpu.runtime.engine import Engine, Request
from vlut_tpu.runtime.sampling import SamplerParams

CFG = PRESETS["tiny"]


def test_seq_shift_rope_rebase_exact():
    """Shifted K rows must equal re-roping the raw keys at new positions."""
    rng = np.random.default_rng(0)
    L, B, S, H, D = 2, 2, 16, 2, 128
    plan = make_plan(CFG)
    cos, sin = rope_table(S, D)

    k_raw = rng.standard_normal((L, B, S, H, D)).astype(np.float32)

    def roped(pos_of_row):
        c = np.asarray(cos)[pos_of_row][None, None, :, None, :]
        s = np.asarray(sin)[pos_of_row][None, None, :, None, :]
        x1, x2 = k_raw[..., : D // 2], k_raw[..., D // 2 :]
        return np.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], -1)

    pos0 = np.arange(S)
    cache = {
        "k": jnp.asarray(roped(pos0), jnp.float32),
        "v": jnp.asarray(k_raw, jnp.float32),
    }
    # drop rows [2, 5) of slot 1 => rows 5.. slide to 2.., positions -3
    start, count = 5, 3
    out = kvc.seq_shift(
        cache, jnp.int32(1), jnp.int32(start), jnp.int32(count),
        jnp.asarray(cos), jnp.asarray(sin),
    )
    # expected: row j (new) holds key of old row j+count roped at position j
    kept = S - count
    expect = roped(pos0)[:, 1, :2]  # rows 0,1 untouched
    moved_raw = k_raw[:, 1, start : S]  # old rows 5..S
    c = np.asarray(cos)[np.arange(2, 2 + S - start)][None, :, None, :]
    s = np.asarray(sin)[np.arange(2, 2 + S - start)][None, :, None, :]
    x1, x2 = moved_raw[..., : D // 2], moved_raw[..., D // 2 :]
    moved = np.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], -1)

    got = np.asarray(out["k"])[:, 1]  # (L, S, H, D)
    np.testing.assert_allclose(got[:, :2], expect, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        got[:, 2 : 2 + S - start], moved, rtol=1e-4, atol=1e-4
    )
    # V rows moved without modification
    np.testing.assert_array_equal(
        np.asarray(out["v"])[:, 1, 2 : 2 + S - start],
        k_raw[:, 1, start:S],
    )
    # slot 0 untouched
    np.testing.assert_allclose(
        np.asarray(out["k"])[:, 0], roped(pos0)[:, 0], rtol=1e-6
    )


@pytest.fixture(scope="module")
def params():
    return init_params(CFG, seed=0)


def test_state_roundtrip_and_prefix_reuse(params):
    eng = Engine(CFG, params, n_slots=2, max_len=64, impl="xla")
    req = Request(prompt=[3, 1, 4, 1, 5], max_new_tokens=4,
                  sampler=SamplerParams(temperature=0.0))
    eng.run([req])
    hist = eng.slots[0].history
    assert hist[:5] == [3, 1, 4, 1, 5]
    blob = eng.save_slot(0)

    # fresh engine: restore, then a request sharing the prefix reuses it
    eng2 = Engine(CFG, params, n_slots=2, max_len=64, impl="xla")
    eng2.restore_slot(0, blob)
    assert eng2.slots[0].history == hist
    req2 = Request(prompt=list(hist) + [9], max_new_tokens=3,
                   sampler=SamplerParams(temperature=0.0))
    eng2.run([req2])
    assert eng2.perf.n_reused_tokens == len(hist)
    assert eng2.perf.n_prompt_tokens == 1  # only the new token prefillled

    # and the reused-path output matches a cold run
    eng3 = Engine(CFG, params, n_slots=1, max_len=64, impl="xla")
    req3 = Request(prompt=list(hist) + [9], max_new_tokens=3,
                   sampler=SamplerParams(temperature=0.0))
    eng3.run([req3])
    assert req2.output == req3.output


def test_fork_slot(params):
    eng = Engine(CFG, params, n_slots=2, max_len=64, impl="xla")
    req = Request(prompt=[7, 8, 9, 10], max_new_tokens=2,
                  sampler=SamplerParams(temperature=0.0))
    eng.run([req])
    eng.fork_slot(0, 1)
    assert eng.slots[1].history == eng.slots[0].history
    # both slots now serve the same continuation identically
    base = eng.slots[0].history
    reqs = [
        Request(prompt=list(base) + [2], max_new_tokens=2,
                sampler=SamplerParams(temperature=0.0))
        for _ in range(2)
    ]
    eng.run(reqs)
    assert reqs[0].output == reqs[1].output
    assert eng.perf.n_reused_tokens >= len(base)


def test_seq_shift_yarn_mscale_not_double_applied():
    """With yarn scaling, stored keys already carry the attention-factor
    mscale; the rebase rotation must use UNIT tables (rope.with_mscale=False)
    or shifted rows come out inflated by ~mscale (ADVICE r1 finding)."""
    rng = np.random.default_rng(1)
    L, B, S, H, D = 1, 1, 16, 1, 64
    scaling = {
        "rope_type": "yarn", "factor": 8.0,
        "original_max_position_embeddings": 8,
    }
    cos_m, sin_m = rope_table(S, D, scaling=scaling)  # mscale-scaled
    cos_u, sin_u = rope_table(S, D, scaling=scaling, with_mscale=False)
    mscale = float(np.sqrt(np.asarray(cos_m)[0, 0] ** 2))  # cos(0)*m = m
    assert mscale > 1.05  # the scaling config must actually exercise mscale

    k_raw = rng.standard_normal((L, B, S, H, D)).astype(np.float32)

    def roped(pos_of_row):  # what the model writes: rotation WITH mscale
        c = np.asarray(cos_m)[pos_of_row][None, None, :, None, :]
        s = np.asarray(sin_m)[pos_of_row][None, None, :, None, :]
        x1, x2 = k_raw[..., : D // 2], k_raw[..., D // 2 :]
        return np.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], -1)

    cache = {
        "k": jnp.asarray(roped(np.arange(S)), jnp.float32),
        "v": jnp.asarray(k_raw, jnp.float32),
    }
    start, count = 5, 3
    out = kvc.seq_shift(
        cache, jnp.int32(0), jnp.int32(start), jnp.int32(count),
        jnp.asarray(cos_u), jnp.asarray(sin_u),
    )
    # moved row j must equal the raw key roped (with mscale, once) at j
    new_pos = np.arange(start - count, S - count)
    c = np.asarray(cos_m)[new_pos][None, :, None, :]
    s = np.asarray(sin_m)[new_pos][None, :, None, :]
    moved_raw = k_raw[:, 0, start:S]
    x1, x2 = moved_raw[..., : D // 2], moved_raw[..., D // 2 :]
    expect = np.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], -1)
    got = np.asarray(out["k"])[:, 0, start - count : S - count]
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("layout", ["layered", "stacked"])
@pytest.mark.parametrize("quant", [False, True])
def test_seq_shift_local_theta_per_layer(layout, quant):
    """gemma3-style dual-theta rebase: SWA layers' keys were roped with the
    LOCAL theta table, so the context shift must rebase them with that same
    table (per-layer swa_local flags), in both cache layouts and with a
    quantized cache (ADVICE r2 #2)."""
    rng = np.random.default_rng(1)
    L, B, S, H, D = 4, 2, 16, 2, 64
    swa_local = (True, False, True, True)  # gemma3 5:1-ish mixed pattern
    cos_g, sin_g = rope_table(S, D, theta=1_000_000.0)
    cos_l, sin_l = rope_table(S, D, theta=10_000.0)

    k_raw = rng.standard_normal((L, B, S, H, D)).astype(np.float32)

    def roped_np(x, pos_of_row, cos, sin):
        # x: (..., S', H, D); broadcast tables over any leading dims
        c = np.asarray(cos)[pos_of_row][:, None, :]
        s = np.asarray(sin)[pos_of_row][:, None, :]
        x1, x2 = x[..., : D // 2], x[..., D // 2 :]
        return np.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], -1)

    pos0 = np.arange(S)
    k0 = np.stack([
        roped_np(k_raw[i], pos0, cos_l if swa_local[i] else cos_g,
                 sin_l if swa_local[i] else sin_g)
        for i in range(L)
    ])
    cache = {"k": jnp.asarray(k0, jnp.float32),
             "v": jnp.asarray(k_raw, jnp.float32)}
    if quant:
        kq, ks = kvc.quantize_kv(cache["k"])
        vq, vs = kvc.quantize_kv(cache["v"])
        cache = {"k": kq, "v": vq, "k_scale": ks, "v_scale": vs}
    if layout == "layered":
        cache = kvc.to_layered(cache)

    start, count = 5, 3
    out = kvc.seq_shift(
        cache, jnp.int32(1), jnp.int32(start), jnp.int32(count),
        jnp.asarray(cos_g), jnp.asarray(sin_g),
        cos_loc=jnp.asarray(cos_l), sin_loc=jnp.asarray(sin_l),
        swa_local=swa_local,
    )
    if layout == "layered":
        out = kvc.to_stacked(out)
    got = np.asarray(out["k"])[:, 1]
    if quant:
        got = got.astype(np.float32) * np.asarray(out["k_scale"])[:, 1, ..., None]

    # expected: moved rows re-roped at their NEW positions with the table
    # that wrote them (fresh rope of the raw keys — rebase must be exact)
    new_pos = np.arange(start - count, S - count)
    for i in range(L):
        cos_i, sin_i = (cos_l, sin_l) if swa_local[i] else (cos_g, sin_g)
        expect_moved = roped_np(
            k_raw[i, 1, start:S], new_pos, cos_i, sin_i
        )
        tol = 0.05 if quant else 1e-4  # int8 re-quantization error
        np.testing.assert_allclose(
            got[i, start - count : S - count], expect_moved,
            rtol=tol, atol=tol,
        )
        # untouched prefix keeps its original roping
        np.testing.assert_allclose(
            got[i, : start - count], k0[i, 1, : start - count],
            rtol=tol, atol=tol,
        )

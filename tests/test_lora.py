"""Runtime LoRA tests (reference: src/llama-adapter.cpp, build_lora_mm)."""

import json

import numpy as np
import jax
import jax.numpy as jnp

from vlut_tpu.config import PRESETS
from vlut_tpu.models.transformer import forward, init_params
from vlut_tpu.runtime.lora import apply_lora, load_peft_adapter
from vlut_tpu.train.finetune import float_twin_params

CFG = PRESETS["tiny"]


def _fwd(params, seed=0, t=8):
    rng = np.random.default_rng(seed)
    tokens = jnp.asarray(rng.integers(0, CFG.vocab_size, (2, t)), jnp.int32)
    pos = jnp.tile(jnp.arange(t, dtype=jnp.int32), (2, 1))
    logits, _ = forward(params, CFG, tokens, pos, None, impl="xla")
    return np.asarray(logits)


def _rand_adapter(rng, r=4, names=("wq",), zero_b=False):
    from vlut_tpu.models.dims import make_plan

    plan = make_plan(CFG)
    dims = {
        "wq": (CFG.d_model, plan.q_dim_p),
        "wo": (plan.wo_in_p, CFG.d_model),
        "w_up": (CFG.d_model, plan.ff_p),
    }
    layers = {}
    for nm in names:
        k, n = dims[nm]
        a = rng.standard_normal((CFG.n_layers, k, r)) * 0.05
        b = (
            np.zeros((CFG.n_layers, r, n))
            if zero_b
            else rng.standard_normal((CFG.n_layers, r, n)) * 0.05
        )
        layers[nm] = {
            "a": jnp.asarray(a, jnp.float32),
            "b": jnp.asarray(b, jnp.float32),
        }
    return {"layers": layers, "alpha": 8.0, "r": r}


def test_zero_lora_is_identity():
    params = init_params(CFG, seed=0)
    adapter = _rand_adapter(np.random.default_rng(0), zero_b=True)
    base = _fwd(params)
    adapted = _fwd(apply_lora(params, adapter))
    np.testing.assert_allclose(adapted, base, rtol=1e-6, atol=1e-6)


def test_lora_matches_dense_delta():
    """forward(base + lora) == forward(float twin with W += s*A@B) —
    exact on the dequant twin (same fp math path)."""
    packed = init_params(CFG, seed=0)
    twin = float_twin_params(packed, CFG)
    adapter = _rand_adapter(
        np.random.default_rng(1), names=("wq", "wo", "w_up")
    )
    scale = 0.5
    eff = scale * adapter["alpha"] / adapter["r"]

    adapted = apply_lora(twin, adapter, scale=scale)
    out_lora = _fwd(adapted, seed=2)

    merged = jax.tree.map(lambda x: x, twin)
    for nm, ab in adapter["layers"].items():
        delta = jnp.einsum("lkr,lrn->lkn", ab["a"], ab["b"]) * eff
        merged["layers"][nm] = {
            "dense": twin["layers"][nm]["dense"] + delta.astype(
                twin["layers"][nm]["dense"].dtype
            )
        }
    out_merged = _fwd(merged, seed=2)
    # bf16 activations make merged-vs-factored differ at the last ulp per
    # layer; logits agree to ~1e-2 absolute with full top-1 agreement
    np.testing.assert_allclose(out_lora, out_merged, rtol=2e-2, atol=1e-2)
    # random tiny model has near-tied logits; require high (not perfect)
    # top-1 agreement
    assert (out_lora.argmax(-1) == out_merged.argmax(-1)).mean() > 0.85
    assert np.abs(out_lora - _fwd(twin, seed=2)).max() > 1e-3  # it did act


def test_lora_on_packed_base():
    params = init_params(CFG, seed=0)
    adapter = _rand_adapter(np.random.default_rng(3))
    out = _fwd(apply_lora(params, adapter))
    assert np.isfinite(out).all()
    assert np.abs(out - _fwd(params)).max() > 1e-4


def test_load_peft_adapter(tmp_path):
    from safetensors.numpy import save_file

    rng = np.random.default_rng(4)
    r = 2
    (tmp_path / "adapter_config.json").write_text(
        json.dumps({"lora_alpha": 16, "r": r,
                    "target_modules": ["q_proj", "up_proj"]})
    )
    tensors = {}
    hd = CFG.d_model // CFG.n_heads
    for li in range(CFG.n_layers):
        pre = f"base_model.model.model.layers.{li}"
        tensors[f"{pre}.self_attn.q_proj.lora_A.weight"] = (
            rng.standard_normal((r, CFG.d_model)).astype(np.float32)
        )
        tensors[f"{pre}.self_attn.q_proj.lora_B.weight"] = (
            rng.standard_normal((CFG.q_dim, r)).astype(np.float32)
        )
        tensors[f"{pre}.mlp.up_proj.lora_A.weight"] = (
            rng.standard_normal((r, CFG.d_model)).astype(np.float32)
        )
        tensors[f"{pre}.mlp.up_proj.lora_B.weight"] = (
            rng.standard_normal((CFG.d_ff, r)).astype(np.float32)
        )
    save_file(tensors, str(tmp_path / "adapter_model.safetensors"))

    adapter = load_peft_adapter(tmp_path, CFG)
    assert set(adapter["layers"]) == {"wq", "w_up"}
    assert adapter["alpha"] == 16 and adapter["r"] == r
    from vlut_tpu.models.dims import make_plan

    plan = make_plan(CFG)
    assert adapter["layers"]["wq"]["a"].shape == (
        CFG.n_layers, CFG.d_model, r
    )
    assert adapter["layers"]["wq"]["b"].shape == (
        CFG.n_layers, r, plan.q_dim_p
    )
    params = init_params(CFG, seed=0)
    out = _fwd(apply_lora(params, adapter, scale=0.1))
    assert np.isfinite(out).all()


def test_cvector_steering():
    """Control vector shifts the residual stream: zero vector is identity,
    nonzero changes logits, works on unrolled layer buffers too."""
    import numpy as np

    from vlut_tpu.models.transformer import unstack_layers
    from vlut_tpu.runtime.lora import apply_cvector

    params = init_params(CFG, seed=0)
    base = _fwd(params, seed=3)
    zero = apply_cvector(params, np.zeros(CFG.d_model, np.float32))
    np.testing.assert_allclose(_fwd(zero, seed=3), base, rtol=1e-5,
                               atol=1e-5)
    vec = np.random.default_rng(0).standard_normal(
        (CFG.n_layers, CFG.d_model)).astype(np.float32) * 0.1
    steered = apply_cvector(params, vec, scale=1.0)
    out = _fwd(steered, seed=3)
    assert np.abs(out - base).max() > 1e-3
    # unrolled path
    uns = apply_cvector(unstack_layers(params, CFG), vec)
    out_u = _fwd(uns, seed=3)
    np.testing.assert_allclose(out_u, out, rtol=0.02, atol=0.02)


def test_load_cvector_file(tmp_path):
    import numpy as np
    from safetensors.numpy import save_file

    from vlut_tpu.runtime.lora import load_cvector_file

    rows = {
        f"direction.{li}": np.full(CFG.d_model, li + 1, np.float32)
        for li in range(CFG.n_layers)
    }
    f = tmp_path / "cv.safetensors"
    save_file(rows, str(f))
    out = load_cvector_file(str(f), CFG)
    assert out.shape == (CFG.n_layers, CFG.d_model)
    assert out[1, 0] == 2.0

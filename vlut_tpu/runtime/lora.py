"""Runtime LoRA adapters (reference: src/llama-adapter.cpp + build_lora_mm,
src/llama-graph.cpp:668-692, convert_lora_to_gguf.py).

An adapter is a pytree {"layers": {wname: {"a": (L, K, r), "b": (L, r, N)}},
"alpha": float, "r": int}; application is y += scale * (x @ A) @ B after
each ternary matmul, with scale = alpha / r * user_scale (the reference's
lora scaling).  Merging into the packed ternary base isn't possible without
requantizing, so adapters stay separate matmuls — on TPU these are two thin
bf16 MXU dots, negligible next to the base GEMM.

Applied functionally: ``apply_lora(params, adapter, scale)`` returns a new
params tree whose weight dicts gain lora_a/lora_b/lora_scale leaves (the
leading L dim rides the layer scan like every other per-layer tensor);
models/transformer's projection helper adds the delta when those keys are
present.
"""

from __future__ import annotations

import json
import pathlib
import re
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

_LORA_NAMES = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")

# HF PEFT module names -> our weight names
_PEFT_MAP = {
    "q_proj": "wq", "k_proj": "wk", "v_proj": "wv", "o_proj": "wo",
    "gate_proj": "w_gate", "up_proj": "w_up", "down_proj": "w_down",
}


def load_peft_adapter(
    path: str | pathlib.Path, cfg, dtype=jnp.bfloat16
) -> dict[str, Any]:
    """Load a HF PEFT LoRA directory (adapter_config.json +
    adapter_model.safetensors) into an adapter pytree.

    A/B are padded to the base weights' padded layouts (models/dims.py) so
    the delta applies in the same coordinate system as the packed base:
    columns of B for wq/wk/wv go through the rope-aware head permutation,
    w_gate/w_up columns and wo/w_down rows through the chunk scatter.
    """
    from safetensors import safe_open

    from vlut_tpu.models.dims import (
        make_plan,
        pad_heads_cols,
        scatter_cols,
        scatter_rows,
    )

    path = pathlib.Path(path)
    acfg = json.loads((path / "adapter_config.json").read_text())
    alpha = float(acfg.get("lora_alpha", 16))
    r = int(acfg.get("r", acfg.get("lora_rank", 8)))
    plan = make_plan(cfg)

    files = sorted(path.glob("*.safetensors"))
    raw: dict[str, np.ndarray] = {}
    for f in files:
        with safe_open(str(f), framework="numpy") as sf:
            for name in sf.keys():
                raw[name] = sf.get_tensor(name)

    pat = re.compile(
        r"(?:base_model\.model\.)?model\.layers\.(\d+)\."
        r"(?:self_attn|mlp)\.(\w+)\.lora_(A|B)\.weight"
    )
    per: dict[str, dict[int, dict[str, np.ndarray]]] = {}
    for name, w in raw.items():
        m = pat.match(name)
        if not m:
            continue
        li, mod, ab = int(m.group(1)), m.group(2), m.group(3)
        if mod not in _PEFT_MAP:
            continue
        wname = _PEFT_MAP[mod]
        per.setdefault(wname, {}).setdefault(li, {})[ab] = np.asarray(
            w, np.float32
        )

    def pad_b(wname: str, b_: np.ndarray) -> np.ndarray:
        # b_ : (r, N_logical) -> padded layout columns
        if wname in ("wq", "wk", "wv"):
            heads = cfg.n_heads if wname == "wq" else cfg.n_kv_heads
            return pad_heads_cols(b_, heads, plan.hd, plan.hd_p)
        if wname in ("w_gate", "w_up"):
            return scatter_cols(b_, plan.ff_chunk, plan.ff_chunk_p, plan.ff_p)
        return b_  # wo/w_down output dim is d_model (unpadded)

    def pad_a(wname: str, a_: np.ndarray) -> np.ndarray:
        # a_ : (K_logical, r) -> padded layout rows (zero rows at pads are
        # exact: padded activations there are zero)
        if wname == "wo":
            from vlut_tpu.models.dims import pad_heads_rows

            a_ = pad_heads_rows(a_, cfg.n_heads, plan.hd, plan.hd_p)
            return scatter_rows(
                a_, plan.wo_chunk, plan.wo_chunk_p, plan.wo_in_p
            )
        if wname == "w_down":
            return scatter_rows(a_, plan.ff_chunk, plan.ff_chunk_p, plan.ff_p)
        return a_  # K = d_model (unpadded)

    layers: dict[str, Any] = {}
    for wname, by_layer in per.items():
        lis = sorted(by_layer)
        a_stack, b_stack = [], []
        for li in range(cfg.n_layers):
            if li in by_layer:
                # PEFT stores A (r, K) and B (N, r); ours are (K, r), (r, N)
                a_ = by_layer[li]["A"].T
                b_ = by_layer[li]["B"].T
                a_stack.append(pad_a(wname, a_))
                b_stack.append(pad_b(wname, b_))
            else:
                a_stack.append(np.zeros_like(a_stack[-1]))
                b_stack.append(np.zeros_like(b_stack[-1]))
        layers[wname] = {
            "a": jnp.asarray(np.stack(a_stack), dtype),
            "b": jnp.asarray(np.stack(b_stack), dtype),
        }
        del lis
    return {"layers": layers, "alpha": alpha, "r": r}


def apply_cvector(
    params: dict[str, Any],
    directions: np.ndarray,  # (L, d_model) or (d_model,) broadcast
    scale: float = 1.0,
) -> dict[str, Any]:
    """Control-vector steering (reference: llama-adapter.cpp cvector — a
    per-layer direction added to the residual stream after each layer)."""
    layers = params["layers"]
    n_layers = (
        len(layers) if isinstance(layers, (list, tuple))
        else layers["attn_norm"].shape[0]
    )
    d = np.asarray(directions, np.float32)
    if d.ndim == 1:
        d = np.broadcast_to(d, (n_layers, d.shape[0]))
    cv = jnp.asarray(d * scale, jnp.float32)
    if isinstance(layers, (list, tuple)):  # unrolled layer buffers
        new = tuple(
            {**lp, "cvector": cv[i]} for i, lp in enumerate(layers)
        )
        return {**params, "layers": new}
    return {**params, "layers": {**layers, "cvector": cv}}


def load_cvector_file(path: str, cfg) -> np.ndarray:
    """Load a control vector from .safetensors ('direction.<l>' or a single
    (L, d) 'directions' tensor) or .npz."""
    import pathlib

    p = pathlib.Path(path)
    if p.suffix == ".npz":
        with np.load(p) as z:
            return np.asarray(z[z.files[0]], np.float32)
    from safetensors import safe_open

    with safe_open(str(p), framework="numpy") as sf:
        keys = list(sf.keys())
        if "directions" in keys:
            return np.asarray(sf.get_tensor("directions"), np.float32)
        rows = {}
        for k in keys:
            tail = k.rsplit(".", 1)[-1]
            if tail.isdigit():
                rows[int(tail)] = np.asarray(sf.get_tensor(k), np.float32)
        out = np.zeros((cfg.n_layers, cfg.d_model), np.float32)
        for li, v in rows.items():
            if 0 <= li < cfg.n_layers:
                out[li, : v.shape[0]] = v
        return out


def apply_lora(
    params: dict[str, Any], adapter: dict[str, Any], scale: float = 1.0
) -> dict[str, Any]:
    """Return a params tree with adapted weights wrapped as LoraTensor."""
    eff = scale * adapter["alpha"] / max(adapter["r"], 1)
    layers = dict(params["layers"])
    for wname, ab in adapter["layers"].items():
        base = layers[wname]
        n_layers = ab["a"].shape[0]
        layers[wname] = {
            **base,
            "lora_a": ab["a"],
            "lora_b": ab["b"],
            # (L,) so the leaf rides the layer scan like the weights
            "lora_scale": jnp.full((n_layers,), eff, jnp.float32),
        }
    return {**params, "layers": layers}

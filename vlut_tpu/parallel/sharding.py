"""Mesh + PartitionSpec trees for params, KV cache and activations.

The TPU replacement for the reference's whole distribution stack — backend
scheduler splits, SPLIT_MODE_ROW tensor split and the RPC protocol (SURVEY
§2.3): one ("dp", "tp") jax Mesh; Megatron-style layer sharding:

  wq/wk/wv packed   (L, rows, n)   -> P(None, None, "tp")   heads local
  wo packed         (L, rows, d)   -> P(None, "tp",  None)  K-sharded + psum
  w_gate/up packed  (L, rows, ff)  -> P(None, None, "tp")
  w_down packed     (L, rows, d)   -> P(None, "tp",  None)
  norms                            -> replicated
  attn_sub/ffn_sub norms           -> P(None, "tp") (sharded dims)
  embed                            -> replicated (lookup is a cheap gather)
  lm_head           (d, vocab_p)   -> P(None, "tp")
  kv cache  (L, B, S, Hkv, hd_p)   -> P(None, "dp", None, "tp", None)

Batch (requests/slots) shards over "dp"; weight shards ride "tp" so the
per-layer psums stay on ICI.  All padded dims come from models/dims.py, so
every shard boundary lands on a pack-block/lane boundary.

Both param layouts the Engine serves are supported: the stacked (L, ...)
tree and the unrolled per-layer TUPLE tree (transformer.unstack_layers),
whose specs drop the leading layer axis.  The int8-quantized lm_head
(transformer.quantize_head: {"q": (d, vocab_p) int8, "scale": (vocab_p,)})
shards its vocab dim like the bf16 head.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vlut_tpu.config import ModelConfig

# weight name -> which packed axis shards over "tp" ("col" = N/output
# channels local to the shard; "row" = K reduction sharded + psum)
_COL_NAMES = ("wq", "wk", "wv", "w_gate", "w_up", "w_attn_gate")
_ROW_NAMES = ("wo", "w_down")


def make_mesh(
    dp: int = 1, tp: int | None = None, devices: list | None = None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    tp = tp or (n // dp)
    if dp * tp > n:
        raise ValueError(f"dp*tp={dp * tp} > {n} devices")
    arr = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def mesh_from_flags(tp: int = 1, dp: int = 1) -> Mesh | None:
    """CLI/server `--tp N --dp N` -> Mesh, or None for single-device (the
    Engine then skips shard_map entirely).  The reference's analog flags
    are `--split-mode row|layer` + `--tensor-split`
    (include/llama.h:200-202,304)."""
    if tp * dp <= 1:
        return None
    n = len(jax.devices())
    if tp * dp > n:
        raise SystemExit(
            f"--tp {tp} x --dp {dp} needs {tp * dp} devices; "
            f"{n} visible (set XLA_FLAGS="
            f"--xla_force_host_platform_device_count=N on CPU)"
        )
    return make_mesh(dp=dp, tp=tp)


def _replicated(v) -> Any:
    return jax.tree.map(
        lambda a: P(*([None] * np.ndim(a))), v,
        is_leaf=lambda a: not isinstance(a, (dict, tuple, list)),
    )


def _one_layer_specs(layer: dict[str, Any], lead: tuple,
                     moe_model: bool = False) -> dict[str, Any]:
    """Specs for one layer's name->tensor dict.  ``lead`` is the leading
    axis prefix: (None,) for the stacked (L, ...) tree, () for a
    per-layer tree from unstack_layers."""
    specs: dict[str, Any] = {}
    # MoE layers (expert-stacked w_gate/up/down, one extra leading dim):
    # the EXPERTS dim shards over the axis (expert parallel — the
    # forward runs with ep_axis on this axis and the expert combine
    # psums partial outputs); everything else in the layer REPLICATES —
    # expert widths stay full, and attention tp would need the plan
    # divided by tp, which the ep forward (tp_size=1) does not do.
    # MODEL-level flag: in an MoE model, heterogeneous layers (deepseek
    # dense lead etc.) carry dense w_gate/up/down but must still
    # replicate — the ep forward runs with tp_size=1 everywhere
    moe = moe_model or any(
        isinstance(v, dict) and "packed" in v
        and np.ndim(v["packed"]) > len(lead) + 2
        for n_, v in layer.items() if n_ in ("w_gate", "w_up", "w_down")
    )
    for name, v in layer.items():
        if (moe and name in ("w_gate", "w_up", "w_down")
                and isinstance(v, dict)
                and np.ndim(v["packed"]) > len(lead) + 2):
            sc = v["scale"]
            extra = np.ndim(sc) - len(lead) - 1  # dims past E
            specs[name] = {
                **{k: P(*([None] * np.ndim(a))) for k, a in v.items()},
                "packed": P(*lead, "tp", None, None),
                "scale": P(*lead, "tp", *([None] * max(extra, 0))),
            }
        elif moe and name in ("eb_gate", "eb_up", "eb_down"):
            # gpt-oss per-expert projection biases (E, width)
            specs[name] = P(*lead, "tp", None)
        elif moe:
            specs[name] = _replicated(v)
        elif name in _COL_NAMES or name in _ROW_NAMES:
            col = name in _COL_NAMES
            packed = (
                P(*lead, None, "tp") if col else P(*lead, "tp", None)
            )
            sc = v["scale"]
            if np.ndim(sc) > len(lead):  # per-channel (n,)-shaped
                scale = P(*lead, "tp" if col else None)
            else:
                scale = P(*lead)
            specs[name] = {
                **{k: P(*([None] * np.ndim(a))) for k, a in v.items()},
                "packed": packed, "scale": scale,
            }
        elif name in ("attn_sub_norm", "ffn_sub_norm"):
            specs[name] = P(*lead, "tp")
        elif name in ("attn_norm", "ffn_norm", "attn_norm_b", "ffn_norm_b",
                      "post_attn_norm", "post_ffn_norm"):
            specs[name] = P(*lead, None)
        else:
            # replicate anything else (biases, qk norms, rope factors, ...)
            specs[name] = _replicated(v)
    return specs


def param_specs(cfg: ModelConfig, params: dict[str, Any]) -> dict[str, Any]:
    """PartitionSpec tree matching the params pytree structure (stacked or
    per-layer-tuple layers; bf16 or int8-quantized lm_head)."""
    layers = params["layers"]
    moe_model = bool(getattr(cfg, "n_experts", 0))
    if isinstance(layers, (tuple, list)):
        lspecs: Any = tuple(
            _one_layer_specs(lp, (), moe_model=moe_model)
            for lp in layers
        )
    else:
        lspecs = _one_layer_specs(layers, (None,), moe_model=moe_model)
    specs: dict[str, Any] = {}
    for k, v in params.items():
        if k == "layers":
            specs[k] = lspecs
        elif k == "lm_head":
            if isinstance(v, dict):  # quantize_head int8 form
                specs[k] = {"q": P(None, "tp"), "scale": P("tp")}
            else:
                specs[k] = P(None, "tp")
        else:
            specs[k] = _replicated(v)
    return specs


def cache_specs() -> dict[str, P]:
    spec = P(None, "dp", None, "tp", None)
    return {"k": spec, "v": spec}


def cache_specs_for(cache: dict, batch_axis: str | None = "dp",
                    head_axis: str | None = "tp") -> dict:
    """Spec tree matching an actual KV-cache pytree: stacked (L, B, S, H,
    hd) arrays or per-layer tuples of (B, S, H, hd), plus the int8-KV
    scale planes (B, S, H).  ``batch_axis`` shards the slot dim (None =
    replicated — used for prefill views whose row count doesn't divide
    dp); ``head_axis`` shards KV heads (None for MoE engines, whose
    attention replicates while experts shard)."""
    layered = isinstance(cache["k"], (tuple, list))

    def one(name: str, a) -> P:
        scale = name.endswith("_scale")
        if scale:
            body = (batch_axis, None, head_axis)
        else:
            body = (batch_axis, None, head_axis, None)
        return P(*body) if layered else P(None, *body)

    if layered:
        return {
            k: tuple(one(k, a) for a in v) for k, v in cache.items()
        }
    return {k: one(k, v) for k, v in cache.items()}


def shard_params(
    params: dict[str, Any], mesh: Mesh, cfg: ModelConfig
) -> dict[str, Any]:
    """device_put the params pytree with its NamedShardings."""
    specs = param_specs(cfg, params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params,
        specs,
        is_leaf=lambda x: not isinstance(x, (dict, tuple, list)),
    )

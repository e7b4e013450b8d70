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
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vlut_tpu.config import ModelConfig


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


def param_specs(cfg: ModelConfig, params: dict[str, Any]) -> dict[str, Any]:
    """PartitionSpec tree matching the params pytree structure."""
    col = {"packed": P(None, None, "tp"), "scale": P(None)}
    row = {"packed": P(None, "tp", None), "scale": P(None)}
    layers: dict[str, Any] = {
        "wq": col, "wk": col, "wv": col,
        "w_gate": col, "w_up": col,
        "wo": row, "w_down": row,
        "attn_norm": P(None, None),
        "ffn_norm": P(None, None),
    }
    if "attn_sub_norm" in params["layers"]:
        layers["attn_sub_norm"] = P(None, "tp")
        layers["ffn_sub_norm"] = P(None, "tp")
    # per-channel weight scales (n,)-shaped would shard over tp; per-tensor
    # scalars replicate — detect from the array rank
    for wname in ("wq", "wk", "wv", "w_gate", "w_up", "wo", "w_down"):
        sc = params["layers"][wname]["scale"]
        if np.ndim(sc) > 1:  # (L, n) per-channel
            axis = "tp" if wname in ("wq", "wk", "wv", "w_gate", "w_up") else None
            layers[wname] = {
                **layers[wname], "scale": P(None, axis)
            }
    specs: dict[str, Any] = {
        "embed": P(None, None),
        "final_norm": P(None),
        "layers": layers,
    }
    if "lm_head" in params:
        specs["lm_head"] = P(None, "tp")
    return specs


def cache_specs() -> dict[str, P]:
    spec = P(None, "dp", None, "tp", None)
    return {"k": spec, "v": spec}


def shard_params(
    params: dict[str, Any], mesh: Mesh, cfg: ModelConfig
) -> dict[str, Any]:
    """device_put the params pytree with its NamedShardings."""
    specs = param_specs(cfg, params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params,
        specs,
        is_leaf=lambda x: not isinstance(x, dict),
    )

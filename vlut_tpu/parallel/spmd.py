"""shard_map wrappers: run the ternary forward SPMD over a ("dp","tp") mesh.

Pallas kernels cannot be auto-partitioned by GSPMD, so the whole forward
runs inside shard_map with explicit in/out specs (parallel/sharding.py); the
two per-layer psums (after wo and w_down) and the sub-norm statistic psums
are the only collectives — Megatron TP riding ICI.  This subsumes what the
reference does with its backend scheduler + RPC (SURVEY §2.3): there is no
graph splitting or tensor RPC to port, XLA SPMD + ICI collectives replace
them wholesale.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.4.35
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from vlut_tpu.config import ModelConfig
from vlut_tpu.models.transformer import forward
from vlut_tpu.parallel.sharding import (
    cache_specs,
    cache_specs_for,
    param_specs,
)


def make_forward_tp(
    cfg: ModelConfig,
    mesh: Mesh,
    params_tree: dict[str, Any],
    impl: str = "auto",
    with_cache: bool = True,
):
    """Returns f(params, cache, tokens, positions, logits_at) -> (logits, cache)
    running SPMD over the mesh.  Batch shards over "dp", weights over "tp".

    ``logits_at``: (B,) index of the token whose logits to return per row
    (pass zeros for T=1 decode).
    """
    tp = mesh.shape["tp"]
    pspecs = param_specs(cfg, params_tree)
    cspecs = cache_specs() if with_cache else None

    def local_fn(params, cache, tokens, positions, logits_at):
        logits, new_cache = forward(
            params, cfg, tokens, positions, cache,
            impl=impl, tp_axis="tp", tp_size=tp, logits_at=logits_at,
        )
        return logits, new_cache

    in_specs = (
        pspecs,
        cspecs,
        P("dp", None),
        P("dp", None),
        P("dp"),
    )
    out_specs = (P("dp", None, "tp"), cspecs)
    return shard_map(
        local_fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )


def make_engine_forward(
    cfg: ModelConfig,
    mesh: Mesh,
    params_tree: dict[str, Any],
    cache_tree: dict[str, Any],
    impl: str = "auto",
    batch_axis: str | None = "dp",
):
    """The Engine's production forward under shard_map: operates on a
    slot-VIEW of the KV cache (the engine gathers/scatters slot rows
    outside, under GSPMD) and returns (logits, view).

    This is what puts the word-packed Pallas kernels on a mesh: GSPMD
    cannot auto-partition a pallas_call, so the whole forward body runs
    SPMD with explicit specs — weights Megatron-sharded over "tp"
    (parallel/sharding.py), the view's slot axis over ``batch_axis``
    ("dp", or None/replicated for prefill groups whose row count doesn't
    divide dp).  The reference's analog is serving with
    LLAMA_SPLIT_MODE_ROW/LAYER from its production binaries
    (include/llama.h:200-202, tensor_split :304) — here the splits are
    NamedShardings and the comm is XLA ICI collectives.
    """
    tp = mesh.shape["tp"]
    moe = bool(getattr(cfg, "n_experts", 0))
    pspecs = param_specs(cfg, params_tree)
    vspecs = cache_specs_for(
        cache_tree, batch_axis=batch_axis,
        head_axis=None if moe else "tp",
    )
    b = batch_axis

    def local_fn(params, view, tokens, positions, logits_at):
        if moe:
            # MoE: the "tp" axis carries EXPERT parallelism — experts
            # shard, attention/router replicate (parallel/sharding.py),
            # the expert combine psums partial outputs.  tp_size stays 1
            # so weight_specs keeps full per-expert widths.
            logits, new_view = forward(
                params, cfg, tokens, positions, view,
                impl=impl, ep_axis="tp", ep_size=tp, logits_at=logits_at,
            )
        else:
            logits, new_view = forward(
                params, cfg, tokens, positions, view,
                impl=impl, tp_axis="tp", tp_size=tp, logits_at=logits_at,
            )
        return logits, new_view

    return shard_map(
        local_fn, mesh=mesh,
        in_specs=(pspecs, vspecs, P(b, None), P(b, None), P(b)),
        out_specs=(P(b, None, "tp"), vspecs),
        check_vma=False,
    )


def make_forward_sp(cfg: ModelConfig, mesh: Mesh, impl: str = "auto"):
    """Ring/blockwise context-parallel cache-less forward: tokens shard
    over the "sp" mesh axis along T; inside run_layers each layer's KV
    blocks rotate via ppermute with an online-softmax merge
    (_ring_attention), so per-device KV memory scales 1/sp.  Params
    replicated.  Returns f(params, tokens, positions) -> logits with the
    T dim sharded over "sp".  New capability vs the reference (it has no
    CP at all, SURVEY §2.3)."""

    def local_fn(params, tokens, positions):
        logits, _ = forward(
            params, cfg, tokens, positions, None, impl=impl, sp_axis="sp"
        )
        return logits

    return shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P(None, "sp"), P(None, "sp")),
        out_specs=P(None, "sp", None),
        check_vma=False,
    )


def make_forward_ep(
    cfg: ModelConfig, mesh: Mesh, params_tree: dict[str, Any],
    impl: str = "auto",
):
    """Expert-parallel cache-less MoE forward: expert dim of w_gate/w_up/
    w_down shards over "ep"; attention + router replicated; the combine
    psums partial expert outputs over "ep" (replaces the reference's
    single-device mul_mat_id MoE, src/llama-graph.cpp:1045)."""
    ep = mesh.shape["ep"]

    def espec(v):
        return {k: P(*([None, "ep"] + [None] * (np.ndim(a) - 2)))
                for k, a in v.items()}

    lspecs = {
        name: (
            espec(v) if name in ("w_gate", "w_up", "w_down")
            else jax.tree.map(
                lambda a: P(*([None] * np.ndim(a))), v,
                is_leaf=lambda a: not isinstance(a, dict),
            )
        )
        for name, v in params_tree["layers"].items()
    }
    pspecs = {
        k: (
            {"layers": lspecs}["layers"] if k == "layers"
            else P(*([None] * np.ndim(params_tree[k])))
        )
        for k in params_tree
    }

    def local_fn(params, tokens, positions):
        logits, _ = forward(
            params, cfg, tokens, positions, None, impl=impl,
            ep_axis="ep", ep_size=ep,
        )
        return logits

    return shard_map(
        local_fn, mesh=mesh,
        in_specs=(pspecs, P(None, None), P(None, None)),
        out_specs=P(None, None, None),
        check_vma=False,
    )

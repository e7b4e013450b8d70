"""Finetuning / QAT for ternary models (reference: ggml-opt + finetune,
ggml/src/ggml-opt.cpp, examples/training/finetune.cpp).

The reference trains full-graph float weights with SGD/AdamW.  Here the
TPU-native equivalent, with the ternary twist the reference doesn't have:

* **float twin** — packed ternary weights dequantize into dense bf16/f32
  master weights (same pytree shape with ``{"dense": (K, N)}`` leaves, which
  models/transformer.py consumes via plain MXU dots).
* **QAT / straight-through estimator** — forward uses absmean-ternarized
  weights, gradients flow to the float masters (BitNet b1.58 training
  recipe); `pack_params` re-packs the trained masters into a servable
  ternary checkpoint.
* optax AdamW/SGD, jitted train step with donated state; optionally a
  (dp, tp)-sharded SPMD train step with a vocab-sharded stable softmax
  cross-entropy (the lm_head is tp-sharded, so the loss reduces with
  pmax/psum over ICI instead of gathering 128k-wide logits).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

try:  # jax >= 0.4.35
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vlut_tpu.config import ModelConfig
from vlut_tpu.models.dims import make_plan
from vlut_tpu.models.transformer import forward, pack_weight, weight_specs
from vlut_tpu.ops.packing import TernaryTensor, unpack_ternary_np

_TERNARY_NAMES = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")


def _tuple_layer_specs(cfg: ModelConfig, lp: dict[str, Any], li: int = -1):
    """Per-layer spec table for heterogeneous (tuple-layers) checkpoints:
    deepseek dense first-k layers, shared experts, and per-layer
    head-count/FFN-width archs (openelm/deci/mimo2) pack at their own
    dims."""
    import dataclasses as _dc

    if li >= 0 and (cfg.heads_per_layer or cfg.d_ff_per_layer):
        hp = (cfg.heads_per_layer[li] if cfg.heads_per_layer
              else (cfg.n_heads, cfg.n_kv_heads))
        ffi = (cfg.d_ff_per_layer[li] if cfg.d_ff_per_layer else cfg.d_ff)
        cfg = _dc.replace(
            cfg, n_heads=max(hp[0], 1), n_kv_heads=max(hp[1] or hp[0], 1),
            d_ff=max(ffi, 1), heads_per_layer=None, d_ff_per_layer=None,
        )
    specs = dict(weight_specs(cfg))
    if "w_lin_attn" in lp:
        # deci replace_with_linear layer: the per-layer cfg swap above
        # drops heads_per_layer, so the gated spec must be re-added
        from vlut_tpu.models.transformer import TernarySpec, make_plan

        specs["w_lin_attn"] = TernarySpec(
            cfg.d_model, cfg.d_model, cfg.weight_fmt, make_plan(cfg).kb
        )
    if cfg.n_experts and "router" not in lp and (
        cfg.first_k_dense or cfg.dense_layers
    ):
        cfg_d = _dc.replace(cfg, d_ff=cfg.d_ff_dense or cfg.d_ff,
                            n_experts=0)
        specs.update(weight_specs(cfg_d))
    if cfg.n_shared_experts:
        cfg_s = _dc.replace(cfg,
                            d_ff=cfg.d_ff_shared
                            or cfg.n_shared_experts * cfg.d_ff,
                            n_experts=0)
        sp_s = weight_specs(cfg_s)
        specs["w_shared_gate"] = sp_s["w_gate"]
        specs["w_shared_up"] = sp_s["w_up"]
        specs["w_shared_down"] = sp_s["w_down"]
    if cfg.moe_parallel == "arctic":
        # arctic residual_mlp packs at d_ff_dense (= d_model)
        cfg_r = _dc.replace(cfg, d_ff=cfg.d_ff_dense or cfg.d_ff,
                            n_experts=0)
        sp_r = weight_specs(cfg_r)
        specs["w_res_gate"] = sp_r["w_gate"]
        specs["w_res_up"] = sp_r["w_up"]
        specs["w_res_down"] = sp_r["w_down"]
    if cfg.moe_chunk_experts:
        # grovemoe chunk experts pack at d_ff_chunk
        cfg_c = _dc.replace(cfg, d_ff=cfg.d_ff_chunk or cfg.d_ff,
                            n_experts=0)
        sp_c = weight_specs(cfg_c)
        specs["w_ch_gate"] = sp_c["w_gate"]
        specs["w_ch_up"] = sp_c["w_up"]
        specs["w_ch_down"] = sp_c["w_down"]
    return specs


def float_twin_params(
    params: dict[str, Any], cfg: ModelConfig, dtype=jnp.float32
) -> dict[str, Any]:
    """Packed checkpoint -> trainable dense tree ({"dense": (K, N)} leaves,
    padded widths preserved so the forward graph is unchanged)."""
    layers_in = params["layers"]
    if isinstance(layers_in, (list, tuple)):
        # heterogeneous per-layer trees (deepseek first_k_dense): twin each
        # layer with its own spec table; leading-L stacking does not apply
        def twin_layer(lp, li):
            sp = _tuple_layer_specs(cfg, lp, li)
            out: dict[str, Any] = {}
            for name, val in lp.items():
                if isinstance(val, dict) and "packed" not in val:
                    out[name] = jax.tree.map(jnp.asarray, val)
                elif not isinstance(val, dict):
                    out[name] = jnp.asarray(val)
                else:
                    spec = sp[name]
                    packed = np.asarray(val["packed"])
                    scale = np.asarray(val["scale"], np.float32)

                    def one(p2, s, spec=spec):
                        t = TernaryTensor(
                            packed=p2, scale=np.float32(1.0),
                            k=spec.k, n=spec.n, fmt=spec.fmt, kb=spec.kb,
                        )
                        return unpack_ternary_np(t).astype(np.float32) * s
                    if packed.ndim == 3:  # (E, rows, cols) experts
                        dense = np.stack([
                            one(packed[e], scale[e])
                            for e in range(packed.shape[0])
                        ])
                    else:
                        dense = one(packed, scale)
                    out[name] = {"dense": jnp.asarray(dense, dtype)}
            return out

        out_t = tuple(twin_layer(lp, i) for i, lp in enumerate(layers_in))
        return {
            k: (jnp.asarray(v) if k != "layers" else out_t)
            for k, v in params.items()
        }
    # stacked checkpoints can still carry shared experts (hunyuan-moe:
    # every layer is MoE + shared, so the layout stays homogeneous)
    specs = _tuple_layer_specs(cfg, {"router": True} if cfg.n_experts else {})
    out_layers: dict[str, Any] = {}
    for name, val in params["layers"].items():
        if isinstance(val, dict) and "packed" not in val:
            # already-dense leaves (MLA w_uk/w_uv absorbed factors)
            out_layers[name] = jax.tree.map(jnp.asarray, val)
            continue
        if not isinstance(val, dict):
            out_layers[name] = jnp.asarray(val)
            continue
        spec = specs[name]
        packed = np.asarray(val["packed"])
        scale = np.asarray(val["scale"], np.float32)

        def unpack_one(p2, s) -> np.ndarray:
            t = TernaryTensor(
                packed=p2, scale=np.float32(1.0),
                k=spec.k, n=spec.n, fmt=spec.fmt, kb=spec.kb,
            )
            return unpack_ternary_np(t).astype(np.float32) * s

        if packed.ndim == 4:  # (L, E, rows, cols) MoE experts
            dense = np.stack([
                np.stack([
                    unpack_one(packed[li, e], scale[li, e])
                    for e in range(packed.shape[1])
                ])
                for li in range(packed.shape[0])
            ])
        else:  # (L, rows, cols)
            dense = np.stack([
                unpack_one(packed[li], scale[li])
                for li in range(packed.shape[0])
            ])
        out_layers[name] = {"dense": jnp.asarray(dense, dtype)}
    out = {
        k: (jnp.asarray(v) if k != "layers" else out_layers)
        for k, v in params.items()
    }
    return out


def ste_ternarize(w: jax.Array) -> jax.Array:
    """BitNet b1.58 quantization with a straight-through estimator:
    forward sees clip(round(w/s)) * s with s = mean|w|, backward is
    identity (gradients flow to the float master)."""
    s = jnp.mean(jnp.abs(w)) + 1e-8
    q = jnp.clip(jnp.round(w / s), -1, 1) * s
    return w + jax.lax.stop_gradient(q - w)


def _apply_ste(params: dict[str, Any]) -> dict[str, Any]:
    layers = {
        name: (
            {"dense": ste_ternarize(v["dense"])}
            if isinstance(v, dict) and "dense" in v
            else v
        )
        for name, v in params["layers"].items()
    }
    return {**params, "layers": layers}


def pack_params(
    params: dict[str, Any], cfg: ModelConfig
) -> dict[str, Any]:
    """Trained float twin -> packed ternary checkpoint tree (absmean
    quantization — exactly what the STE forward was simulating)."""
    plan = make_plan(cfg)
    specs = weight_specs(cfg, plan=plan)
    out_layers: dict[str, Any] = {}
    for name, val in params["layers"].items():
        if not (isinstance(val, dict) and "dense" in val):
            out_layers[name] = np.asarray(val)
            continue
        dense = np.asarray(val["dense"], np.float32)
        spec = specs[name]

        def pack_one(w2):
            s = float(np.mean(np.abs(w2))) + 1e-8
            trits = np.clip(np.round(w2 / s), -1, 1).astype(np.int8)
            # dense twin is already in the padded/permuted layout, so pack
            # directly (pack_weight would re-permute)
            from vlut_tpu.ops.packing import pack_ternary

            return pack_ternary(trits, np.float32(s), spec.fmt, spec.kb)

        if dense.ndim == 4:
            packed = [[pack_one(dense[li, e]) for e in range(dense.shape[1])]
                      for li in range(dense.shape[0])]
            out_layers[name] = {
                "packed": np.stack(
                    [np.stack([np.asarray(t.packed) for t in row])
                     for row in packed]
                ),
                "scale": np.stack(
                    [np.stack([np.asarray(t.scale).reshape(()) for t in row])
                     for row in packed]
                ),
            }
        else:
            packed = [pack_one(dense[li]) for li in range(dense.shape[0])]
            out_layers[name] = {
                "packed": np.stack([np.asarray(t.packed) for t in packed]),
                "scale": np.stack(
                    [np.asarray(t.scale).reshape(()) for t in packed]
                ),
            }
    return {
        k: (np.asarray(v) if k != "layers" else out_layers)
        for k, v in params.items()
    }


# --- loss --------------------------------------------------------------------


def causal_lm_loss(
    params: dict[str, Any],
    cfg: ModelConfig,
    tokens: jax.Array,  # (B, T) int32
    mask: jax.Array | None = None,  # (B, T) bool; True = count this target
    qat: bool = False,
) -> jax.Array:
    """Mean next-token cross-entropy (fp32 logits)."""
    if qat:
        params = _apply_ste(params)
    b, t = tokens.shape
    pos = jnp.tile(jnp.arange(t, dtype=jnp.int32), (b, 1))
    logits, _ = forward(params, cfg, tokens, pos, None)
    logits = logits[:, :-1, : cfg.vocab_size].astype(jnp.float32)
    targets = tokens[:, 1:]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    m = jnp.ones_like(nll) if mask is None else mask[:, 1:].astype(nll.dtype)
    return (nll * m).sum() / jnp.maximum(m.sum(), 1.0)


def make_train_step(
    cfg: ModelConfig,
    optimizer,
    qat: bool = False,
) -> Callable:
    """Jitted (params, opt_state, tokens, mask) -> (params, opt_state, loss).
    ``optimizer`` is any optax GradientTransformation."""

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, tokens, mask):
        loss, grads = jax.value_and_grad(
            lambda p: causal_lm_loss(p, cfg, tokens, mask, qat=qat)
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        import optax

        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


# --- SPMD train step (dp batch x tp megatron shards) --------------------------


def dense_param_specs(cfg: ModelConfig, params: dict[str, Any]):
    """PartitionSpec tree for the float-twin pytree (mirrors
    parallel/sharding.py's packed layout: columns on tp for wq/wk/wv/
    w_gate/w_up, rows on tp for wo/w_down; MoE experts keep the same
    per-expert split with the E dim replicated)."""
    def wspec(name: str, v):
        ndim = v["dense"].ndim
        if name in ("wq", "wk", "wv", "w_gate", "w_up"):
            return {"dense": P(*([None] * (ndim - 1) + ["tp"]))}
        return {"dense": P(*([None] * (ndim - 2) + ["tp", None]))}

    layers = {
        name: (
            wspec(name, v) if isinstance(v, dict) and "dense" in v
            else (P(None, "tp") if name in ("attn_sub_norm", "ffn_sub_norm")
                  else P(*([None] * np.ndim(v))))
        )
        for name, v in params["layers"].items()
    }
    specs: dict[str, Any] = {
        "embed": P(None, None),
        "final_norm": P(None),
        "layers": layers,
    }
    if "lm_head" in params:
        specs["lm_head"] = P(None, "tp")
    return specs


def sharded_ce_loss(local_logits, targets, tp_axis: str, v_local: int,
                    mask=None, vocab_size: int | None = None):
    """Stable cross-entropy over vocab-sharded logits: pmax/psum reductions
    instead of gathering the full (B, T, V) logits."""
    lg = local_logits.astype(jnp.float32)
    if vocab_size is not None:
        # lm_head is padded to vocab_p for sharding; exclude pad columns
        off0 = jax.lax.axis_index(tp_axis) * v_local
        col = off0 + jnp.arange(v_local)
        lg = jnp.where(col < vocab_size, lg, -1e30)
    # the max shift is gradient-free (standard stable-softmax identity);
    # pmax lacks a differentiation rule, so stop_gradient around it
    m_local = jax.lax.stop_gradient(lg.max(-1))
    m = jax.lax.pmax(m_local, tp_axis)
    m = jax.lax.stop_gradient(m)
    se = jnp.exp(lg - m[..., None]).sum(-1)
    lse = jnp.log(jax.lax.psum(se, tp_axis)) + m
    off = jax.lax.axis_index(tp_axis) * v_local
    local_t = targets - off
    in_shard = (local_t >= 0) & (local_t < v_local)
    tl = jnp.take_along_axis(
        lg, jnp.clip(local_t, 0, v_local - 1)[..., None], axis=-1
    )[..., 0]
    target_logit = jax.lax.psum(jnp.where(in_shard, tl, 0.0), tp_axis)
    nll = lse - target_logit
    w = jnp.ones_like(nll) if mask is None else mask.astype(nll.dtype)
    return (nll * w).sum() / jnp.maximum(w.sum(), 1.0)


def make_sharded_train_step(
    cfg: ModelConfig,
    mesh: Mesh,
    params_tree: dict[str, Any],
    optimizer,
    qat: bool = False,
):
    """SPMD train step over a ("dp", "tp") mesh: batch shards on dp, dense
    weights megatron-shard on tp, grads psum over dp, the CE reduces over
    the tp-sharded vocab.  Returns (step_fn, shard_tree_fn)."""
    tp = mesh.shape["tp"]
    pspecs = dense_param_specs(cfg, params_tree)
    plan = make_plan(cfg)
    v_local = plan.vocab_p // tp

    def local_loss(params, tokens, mask):
        if qat:
            params = _apply_ste(params)
        b, t = tokens.shape
        pos = jnp.tile(jnp.arange(t, dtype=jnp.int32), (b, 1))
        logits, _ = forward(
            params, cfg, tokens, pos, None, tp_axis="tp", tp_size=tp
        )
        # logits: (b_local, t, v_local) fp32; targets are global ids
        return sharded_ce_loss(
            logits[:, :-1], tokens[:, 1:], "tp", v_local, mask=mask[:, 1:],
            vocab_size=cfg.vocab_size,
        )

    def local_step(params, opt_state, tokens, mask):
        loss, grads = jax.value_and_grad(local_loss)(params, tokens, mask)
        # dp: plain data-parallel gradient averaging.  tp: the per-rank loss
        # is replicated over tp, so under shard_map's replication tracking
        # every tp rank seeds a cotangent and the psum-transposes accumulate
        # the same path tp times — one global 1/tp restores the true grad
        # (verified element-wise vs the single-device step in test_train).
        grads = jax.tree.map(
            lambda g: jax.lax.pmean(g, "dp") / tp, grads
        )
        loss = jax.lax.pmean(loss, "dp")
        import optax

        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def _opt_state_specs(opt_state):
        # optax states hold leaves shaped like params (mu/nu) plus scalars;
        # map each leaf to the matching param spec when shapes line up
        flat_params, ptree = jax.tree_util.tree_flatten(params_tree)
        flat_specs, _ = jax.tree_util.tree_flatten(
            pspecs, is_leaf=lambda x: isinstance(x, P)
        )
        shape2spec = {}
        for a, s in zip(flat_params, flat_specs):
            shape2spec.setdefault(np.shape(a), s)

        def leaf_spec(x):
            return shape2spec.get(np.shape(x), P())

        return jax.tree.map(leaf_spec, opt_state)

    def make(opt_state):
        ospecs = _opt_state_specs(opt_state)
        fn = shard_map(
            local_step,
            mesh=mesh,
            in_specs=(pspecs, ospecs, P("dp", None), P("dp", None)),
            out_specs=(pspecs, ospecs, P()),
            check_vma=True,
        )
        return jax.jit(fn, donate_argnums=(0, 1))

    return make, pspecs

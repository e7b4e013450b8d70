"""Pipeline parallelism: layer-stage sharding + GPipe microbatching.

The reference has two PP forms (SURVEY §2.3): (a) LLAMA_SPLIT_MODE_LAYER —
layers split across devices, executed sequentially; (b) the backend
scheduler's micro-batch pipelining with n_copies buffered splits
(src/llama-context.cpp:294-325).  Both collapse here into one shard_map
program: the layer stack's leading L dim shards over a "pp" mesh axis, and
a GPipe schedule runs M microbatches through the stages with `ppermute`
hand-offs — stage i processes microbatch s-i at schedule step s, so after
the pipeline fills every stage computes a different microbatch each step.

Embedding and the output head are replicated (cheap vs the stack) so only
(b/M, T, D) hidden states cross stage boundaries on ICI.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

try:  # jax >= 0.4.35
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from jax.sharding import Mesh, PartitionSpec as P

from vlut_tpu.config import ModelConfig
from vlut_tpu.models.dims import make_plan
from vlut_tpu.models.transformer import _rms, run_layers


def _layer_specs_pp(params: dict[str, Any]) -> dict[str, Any]:
    """Shard every per-layer tensor's leading L dim over "pp"."""
    def spec_for(v):
        if isinstance(v, dict):  # {"packed","scale"} or {"dense"}
            return {k: P(*(["pp"] + [None] * (np.ndim(a) - 1)))
                    for k, a in v.items()}
        return P(*(["pp"] + [None] * (np.ndim(v) - 1)))

    return {name: spec_for(v) for name, v in params["layers"].items()}


def param_specs_pp(params: dict[str, Any]) -> dict[str, Any]:
    specs: dict[str, Any] = {
        "embed": P(None, None),
        "final_norm": P(None),
        "layers": _layer_specs_pp(params),
    }
    if "lm_head" in params:
        specs["lm_head"] = P(None, None)
    return specs


def make_forward_pp(
    cfg: ModelConfig,
    mesh: Mesh,
    params_tree: dict[str, Any],
    n_microbatches: int = 2,
    impl: str = "auto",
):
    """Returns f(params, tokens, positions) -> (B, T, vocab_p) logits,
    cache-less (scoring/prefill-style) forward pipelined over the "pp"
    mesh axis.  B must divide by n_microbatches."""
    pp = mesh.shape["pp"]
    if cfg.n_layers % pp:
        raise ValueError(f"n_layers={cfg.n_layers} not divisible by pp={pp}")
    l_local = cfg.n_layers // pp
    plan = make_plan(cfg)
    pspecs = param_specs_pp(params_tree)
    M = n_microbatches

    # full per-layer SWA widths; each stage slices its block
    if cfg.sliding_window:
        li = np.arange(cfg.n_layers)
        pat = cfg.sliding_window_pattern
        is_swa = (li % pat != pat - 1) if pat else np.ones_like(li, bool)
        full_window = jnp.asarray(
            np.where(is_swa, cfg.sliding_window, 0), jnp.int32
        )
    else:
        full_window = jnp.zeros((cfg.n_layers,), jnp.int32)

    def local_fn(params, tokens, positions):
        b, t = tokens.shape
        if b % M:
            raise ValueError(f"batch {b} not divisible by microbatches {M}")
        stage = jax.lax.axis_index("pp")
        window_local = jax.lax.dynamic_slice_in_dim(
            full_window, stage * l_local, l_local
        )

        x = params["embed"][tokens]
        if cfg.embed_scale:
            x = (x.astype(jnp.float32) * cfg.embed_scale).astype(x.dtype)
        mb_b = b // M
        xs = x.reshape(M, mb_b, t, x.shape[-1])
        pos_mb = positions.reshape(M, mb_b, t)

        state = jnp.zeros((mb_b, t, x.shape[-1]), x.dtype)
        outs = jnp.zeros((M, mb_b, t, x.shape[-1]), x.dtype)
        perm = [(i, i + 1) for i in range(pp - 1)]

        for s in range(M + pp - 1):
            mb_idx = s - stage  # microbatch this stage handles this step
            mb_c = jnp.clip(mb_idx, 0, M - 1)
            inject = xs[min(s, M - 1)]
            inp = jnp.where(stage == 0, inject, state)
            pos_in = jnp.take(pos_mb, mb_c, axis=0)
            y, _ = run_layers(
                params["layers"], inp, pos_in, window_local, None,
                cfg=cfg, plan=plan, impl=impl,
            )
            collect = (stage == pp - 1) & (0 <= mb_idx) & (mb_idx < M)
            outs = jnp.where(
                collect,
                outs.at[mb_c].set(y),
                outs,
            )
            if pp > 1:
                state = jax.lax.ppermute(y, "pp", perm)

        # replicate the last stage's collected outputs to all stages
        outs = jax.lax.psum(
            jnp.where(stage == pp - 1, outs, jnp.zeros_like(outs)), "pp"
        )
        h = outs.reshape(b, t, -1)
        h = _rms(h, params["final_norm"], cfg.rms_eps, cfg.d_model,
                 plus_one=cfg.norm_plus_one)
        head = params.get("lm_head")
        if head is None:
            head = params["embed"].T
        logits = jnp.dot(
            h.astype(jnp.float32), head.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        if cfg.final_logit_softcap:
            cap = cfg.final_logit_softcap
            logits = cap * jnp.tanh(logits / cap)
        return logits

    return shard_map(
        local_fn, mesh=mesh,
        in_specs=(pspecs, P(None, None), P(None, None)),
        out_specs=P(None, None, None),
        check_vma=False,
    )

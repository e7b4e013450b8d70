"""Ternary transformer forward pass (LLAMA + BITNET arch families).

Functional, scan-over-layers, TPU-first re-design of the reference's graph
builders (src/models/llama.cpp, src/models/bitnet.cpp, src/llama-graph.cpp).
All seven projection matrices per layer are packed ternary; embeddings and
the output head stay high-precision (mirroring the reference quantizer's
policy: token_embd->Q4_K, output->Q6_K, src/llama-quant.cpp:211-251 — here
bf16).

Per-tensor `.scale` magnitudes are applied inside the ternary matmul epilogue
for *all* projections, including attention — deliberately fixing the
reference's LLAMA-arch gap where attn .scale tensors are loaded but never
multiplied (SURVEY §2.1.9).

BITNET arch adds sub-norms: RMSNorm on the attention output before wo and on
gate*up before w_down (reference src/models/bitnet.cpp:33-120).

Tensor parallelism: pass ``tp_axis`` (a mesh axis name) when calling inside
``shard_map``.  The layout is Megatron-style — wq/wk/wv/w_gate/w_up
column-sharded (heads / ff channels local), wo/w_down row-sharded with a
psum epilogue, lm_head vocab-sharded, norms replicated; sub-norms over
sharded dims psum their sufficient statistics.  All padded dims come from
models/dims.py so shards stay tile-aligned.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from vlut_tpu.config import ModelConfig
from vlut_tpu.models.dims import (
    DimPlan,
    make_plan,
    pad_heads_cols,
    pad_heads_rows,
    scatter_cols,
    scatter_rows,
)
from vlut_tpu.ops.matmul import ternary_matmul
from vlut_tpu.ops.packing import TernaryTensor, pack_ternary
from vlut_tpu.ops.rope import apply_rope, apply_rope_rows, rope_table


def _ABLATE() -> set[str]:
    """Perf-ablation switches, read at TRACE time (bench tooling only):
    VLUT_ABLATE=no_kv_write,no_attn isolates cache-write / attention cost
    in bench/ablate.py.  Never set in production or tests."""
    return set(filter(None, os.environ.get("VLUT_ABLATE", "").split(",")))


@dataclasses.dataclass(frozen=True)
class TernarySpec:
    """Static metadata shared by one weight's TernaryTensor across layers."""

    k: int
    n: int
    fmt: str
    kb: int


def weight_specs(
    cfg: ModelConfig, tp: int = 1, plan: DimPlan | None = None
) -> dict[str, TernarySpec]:
    """Local (per-shard) packed weight specs for a tp-way split."""
    plan = plan or make_plan(cfg)
    fmt, kb = cfg.weight_fmt, plan.kb
    d = cfg.d_model
    if tp > 1:
        for dim, what in (
            (cfg.n_heads, "n_heads"),
            (cfg.n_kv_heads, "n_kv_heads"),
        ):
            if dim % tp:
                raise ValueError(f"{what}={dim} not divisible by tp={tp}")
        if plan.tp_pack % tp:
            raise ValueError(f"tp={tp} must divide tp_pack={plan.tp_pack}")
    # padded layouts are treated as the logical op widths (pad positions are
    # zero trits -> exact); outputs stay in padded layout between ops
    qd, kvd = plan.q_dim_p // tp, plan.kv_dim_p // tp
    wo_k, ff = plan.wo_in_p // tp, plan.ff_p // tp
    specs = {
        "wq": TernarySpec(d, qd, fmt, kb),
        "wk": TernarySpec(d, kvd, fmt, kb),
        "wv": TernarySpec(d, kvd, fmt, kb),
        "wo": TernarySpec(wo_k, d, fmt, kb),
        # for MoE (cfg.n_experts > 0) these are per-expert shapes; the packed
        # arrays carry a leading experts dim consumed by the expert scan
        "w_gate": TernarySpec(d, ff, fmt, kb),
        "w_up": TernarySpec(d, ff, fmt, kb),
        "w_down": TernarySpec(ff, d, fmt, kb),
    }
    if cfg.attn_gate:
        # afmoe attention output gate: packs exactly like wq
        specs["w_attn_gate"] = TernarySpec(d, qd, fmt, kb)
    if cfg.heads_per_layer and any(
        nh and not nkv for nh, nkv in cfg.heads_per_layer
    ):
        # deci replace_with_linear "attention": a plain (D, D) projection
        # (src/models/deci.cpp n_head_kv==0 blocks).  Gated on the deci
        # per-layer config so every other model's spec table — and
        # init_params_fast's materialization of it — stays free of the
        # dead (D, D) tensor per layer
        specs["w_lin_attn"] = TernarySpec(d, d, fmt, kb)
    if cfg.dual_expert:
        # cogvlm visual-expert twins share the language specs
        for nm in ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down"):
            specs["vis_" + nm] = specs[nm]
    if cfg.kv_lora_rank:
        dn, dr = cfg.qk_nope_dim, cfg.qk_rope_dim
        specs["wkv_a"] = TernarySpec(d, cfg.kv_lora_rank + dr, fmt, kb)
        if cfg.q_lora_rank:
            specs["wq_a"] = TernarySpec(d, cfg.q_lora_rank, fmt, kb)
            specs["wq_b"] = TernarySpec(
                cfg.q_lora_rank, cfg.n_heads * (dn + dr), fmt, kb
            )
        else:
            specs["wq_full"] = TernarySpec(
                d, cfg.n_heads * (dn + dr), fmt, kb
            )
    return specs


def _layer_tensor(layers: dict, name: str, spec: TernarySpec):
    w = layers[name]
    if "dense" in w:
        # float-twin / QAT training path (train/finetune.py): a dense (K, N)
        # array with gradients, used via plain dot instead of the int8 GEMM
        return w["dense"]
    return TernaryTensor(
        packed=w["packed"], scale=w["scale"],
        k=spec.k, n=spec.n, fmt=spec.fmt, kb=spec.kb,
    )


def pack_weight(
    name: str,
    trits: np.ndarray,  # logical (K, N) in HF orientation (K=input)
    scale,
    cfg: ModelConfig,
    plan: DimPlan | None = None,
) -> TernaryTensor:
    """Pack one projection with the plan's padding/permutation applied.

    The single entry point shared by the converter and synthetic init so the
    layout is defined in exactly one place.
    """
    plan = plan or make_plan(cfg)
    kb, fmt = plan.kb, cfg.weight_fmt
    hd, hd_p = plan.hd, plan.hd_p
    if name.startswith("vis_"):
        name = name[4:]  # cogvlm visual-expert twins pack identically
    pk = lambda tr: pack_ternary(tr, scale, fmt, kb, use_native=True)  # noqa: E731
    if name in ("wq", "wk", "wv", "w_attn_gate"):
        heads = cfg.n_kv_heads if name in ("wk", "wv") else cfg.n_heads
        return pk(pad_heads_cols(trits, heads, hd, hd_p))
    if name == "wo":
        trits = pad_heads_rows(trits, cfg.n_heads, hd, hd_p)
        return pk(
            scatter_rows(trits, plan.wo_chunk, plan.wo_chunk_p, plan.wo_in_p)
        )
    if name in ("w_gate", "w_up", "w_shared_gate", "w_shared_up",
                "w_res_gate", "w_res_up", "w_ch_gate", "w_ch_up"):
        # shared-expert variants pack identically at their own width (the
        # caller passes a cfg with d_ff = n_shared * moe_d_ff)
        return pk(
            scatter_cols(trits, plan.ff_chunk, plan.ff_chunk_p, plan.ff_p)
        )
    if name in ("w_down", "w_shared_down", "w_res_down",
                "w_ch_down"):
        return pk(
            scatter_rows(trits, plan.ff_chunk, plan.ff_chunk_p, plan.ff_p)
        )
    if name == "w_lin_attn":
        return pk(trits)  # plain (D, D) packing, no head permutation
    if name in ("wq_a", "wq_b", "wq_full", "wkv_a"):
        # MLA projections (deepseek): plain packing, NO head permutation.
        # wq_a/wkv_a outputs are flat vectors — end-padding is sliced off
        # by the consumer; wq_b/wq_full reshape per head, so their width
        # must be lane-exact (true for real models: H*(128+64) % 128 == 0)
        t = pk(trits)
        if name in ("wq_b", "wq_full") and t.n_padded != trits.shape[1]:
            raise ValueError(
                f"MLA projection {name} width {trits.shape[1]} must be a "
                f"lane multiple (got padded {t.n_padded})"
            )
        return t
    raise KeyError(name)


def quantize_head(params: dict[str, Any]) -> dict[str, Any]:
    """bf16 lm_head -> int8 + per-channel absmax scales (Q6_K-output
    analog, higher fidelity; halves decode head bandwidth)."""
    head = params.get("lm_head")
    if head is None or isinstance(head, dict):
        return params

    @jax.jit
    def _q(w):
        wf = w.astype(jnp.float32)
        amax = jnp.max(jnp.abs(wf), axis=0)
        scale = amax / 127.0
        inv = jnp.where(amax > 0, 127.0 / jnp.maximum(amax, 1e-30), 0.0)
        q = jnp.clip(jnp.round(wf * inv[None, :]), -127, 127)
        return q.astype(jnp.int8), scale

    # one jitted device pass: the numpy form pulled the multi-GB head
    # through the host (measured 134 s of the flagship bench's cold start)
    q, scale = _q(jnp.asarray(head))
    return {**params, "lm_head": {"q": q, "scale": scale}}


def unstack_layers(params: dict[str, Any], cfg: ModelConfig) -> dict[str, Any]:
    """Split the stacked (L, ...) layer tree into a tuple of per-layer
    trees so forward unrolls the layer loop (see run_layers: scan over
    stacked weights triples weight HBM traffic via slice temps).  One-time
    device copy at load; inference-only (training keeps the scan)."""
    layers = params["layers"]
    if isinstance(layers, (list, tuple)):
        return params
    l = cfg.n_layers
    per = tuple(
        jax.tree.map(lambda a, i=i: a[i], layers) for i in range(l)
    )
    return {**params, "layers": per}


def fuse_projections(params: dict[str, Any], cfg: ModelConfig) -> dict[str, Any]:
    """Column-concatenate wq|wk|wv -> wqkv and w_gate|w_up -> w_gateup at
    load time (single-chip serving; kernel-launch count per layer drops
    7 -> 4).  Packed columns concatenate exactly (the packing layout is
    row-major over K-slabs), and the per-tensor scales become one
    per-channel scale vector, which the GEMM epilogue already supports.

    Skipped for tp-sharded runs (a [q|k|v] concat does not column-shard
    correctly) and MoE ffns keep their expert stacks.  No-op if already
    fused or if qkv biases/lora are attached to the separate tensors."""
    layers = params["layers"]
    if isinstance(layers, (list, tuple)):
        return params  # heterogeneous per-layer trees (deepseek)
    if "wqkv" in layers or cfg.qkv_bias:
        return params
    if any(k in layers.get(n, {}) for k in ("lora_a", "dense") for n in
           ("wq", "wk", "wv", "w_gate", "w_up")):
        return params
    plan = make_plan(cfg)
    out = dict(layers)

    def fuse(names: list[str], widths: list[int], new: str):
        # device-side concat: np round-trips would drag GBs through the
        # host (minutes over a tunneled chip)
        packs = [jnp.asarray(out[n]["packed"]) for n in names]
        scales = [
            jnp.asarray(out[n]["scale"], jnp.float32) for n in names
        ]
        fusedp = jnp.concatenate(packs, axis=-1)
        l = fusedp.shape[0]
        sc = jnp.concatenate(
            [
                jnp.broadcast_to(s.reshape(l, 1), (l, w)).astype(jnp.float32)
                for s, w in zip(scales, widths)
            ],
            axis=-1,
        )
        out[new] = {"packed": fusedp, "scale": sc}
        for n in names:
            del out[n]

    if all(n in out for n in ("wq", "wk", "wv")):
        fuse(["wq", "wk", "wv"],
             [plan.q_dim_p, plan.kv_dim_p, plan.kv_dim_p], "wqkv")
    if not cfg.n_experts and cfg.ffn_gated and not cfg.proj_bias:
        fuse(["w_gate", "w_up"], [plan.ff_p, plan.ff_p], "w_gateup")
    return {**params, "layers": out}


def unpack_weight(
    name: str,
    t: TernaryTensor,
    cfg: ModelConfig,
    plan: DimPlan | None = None,
) -> np.ndarray:
    """Inverse of :func:`pack_weight`: packed tensor -> logical (K, N)
    trits in HF orientation (drops the padding/permutation)."""
    from vlut_tpu.models.dims import chunk_positions, head_positions
    from vlut_tpu.ops.packing import unpack_ternary_np

    plan = plan or make_plan(cfg)
    hd, hd_p = plan.hd, plan.hd_p
    if name.startswith("vis_"):
        name = name[4:]  # cogvlm visual-expert twins unpack identically
    w = unpack_ternary_np(t)  # (k_padded-layout logical k, n)

    def gather_head_cols(w2, heads):
        if hd == hd_p:
            return w2
        k = w2.shape[0]
        return w2.reshape(k, heads, hd_p)[
            :, :, head_positions(hd, hd_p)
        ].reshape(k, heads * hd)

    if name in ("wq", "wk", "wv", "w_attn_gate"):
        return gather_head_cols(
            w, cfg.n_kv_heads if name in ("wk", "wv") else cfg.n_heads
        )
    if name == "wo":
        rows = chunk_positions(
            cfg.n_heads * hd_p, plan.wo_chunk, plan.wo_chunk_p
        )
        w = w[rows]  # (n_heads*hd_p, d)
        if hd != hd_p:
            w = w.reshape(cfg.n_heads, hd_p, -1)[
                :, head_positions(hd, hd_p)
            ].reshape(cfg.n_heads * hd, -1)
        return w
    if name in ("w_gate", "w_up"):
        return w[:, chunk_positions(cfg.d_ff, plan.ff_chunk, plan.ff_chunk_p)]
    if name == "w_down":
        return w[chunk_positions(cfg.d_ff, plan.ff_chunk, plan.ff_chunk_p)]
    raise KeyError(name)


_I2_CODE_LUT = np.array(
    [
        (c % 3) | ((c // 3 % 3) << 2) | ((c // 9 % 3) << 4) | ((c // 27 % 3) << 6)
        for c in range(81)
    ],
    dtype=np.uint8,
)


def init_params_fast(
    cfg: ModelConfig, seed: int = 0, dtype=jnp.bfloat16
) -> dict[str, Any]:
    """Random *packed* parameters, generated directly in packed form.

    For multi-GB synthetic benchmark models (e.g. Llama3-8B-1.58 shapes)
    where running the full trit->pack pipeline would take minutes.  Padding
    positions get random (not zero) trits, which is irrelevant for perf
    benchmarks; use init_params for correctness work.
    """
    plan = make_plan(cfg)
    specs = weight_specs(cfg, plan=plan)
    r = {"i2": 4, "i1": 5}[cfg.weight_fmt]

    import math as _math

    def rows(spec: TernarySpec) -> int:
        align = _math.lcm(spec.kb, 128)
        if cfg.weight_fmt == "i1" and spec.k >= 4 * align:
            align *= 4  # mirror pack_ternary's composite-Kp i1 padding
        kp = -(-spec.k // align) * align
        return kp // r

    def cols(spec: TernarySpec) -> int:
        return -(-spec.n // 128) * 128

    # generated ON DEVICE: multi-GB host RNG + tunnel transfer took 13-25
    # min per benchmark process; jax.random on the chip takes seconds.
    # Benchmark bytes, not real values — valid code ranges so unpack cost
    # matches production exactly.
    key = jax.random.PRNGKey(seed)

    @functools.partial(jax.jit, static_argnames=("shape", "fmt"))
    def _gen(sub, shape, fmt):
        if fmt == "i2":
            # valid base-81 bytes via arithmetic digit packing — a LUT
            # gather here lowers to an index-serial XLA gather (the same
            # pathology as KV scatter; it was most of a 114 s cold start)
            c = jax.random.randint(sub, shape, 0, 81, jnp.int32)
            d0 = c % 3
            c3 = c // 3
            d1 = c3 % 3
            c9 = c3 // 3
            d2 = c9 % 3
            d3 = c9 // 3
            return (d0 | (d1 << 2) | (d2 << 4) | (d3 << 6)).astype(
                jnp.uint8)
        return jax.random.randint(sub, shape, 0, 243, jnp.uint8)

    layers: dict[str, Any] = {}
    for name, spec in specs.items():
        key, sub = jax.random.split(key)
        expert = (
            cfg.n_experts and name in ("w_gate", "w_up", "w_down")
        )
        shape = (cfg.n_layers,) + (
            (cfg.n_experts,) if expert else ()
        ) + (rows(spec), cols(spec))
        layers[name] = {
            "packed": _gen(sub, shape, cfg.weight_fmt),
            "scale": jnp.full(
                (cfg.n_layers,) + ((cfg.n_experts,) if expert else ()),
                0.05, jnp.float32),
        }
    if cfg.n_experts:
        layers["router"] = (
            jnp.zeros((cfg.n_layers, cfg.d_model, cfg.n_experts),
                      jnp.bfloat16)
            + jnp.linspace(-0.02, 0.02, cfg.n_experts)[None, None, :]
            .astype(jnp.bfloat16)
        )
    layers["attn_norm"] = jnp.ones((cfg.n_layers, cfg.d_model), jnp.float32)
    layers["ffn_norm"] = jnp.ones((cfg.n_layers, cfg.d_model), jnp.float32)
    if cfg.use_subnorms:
        layers["attn_sub_norm"] = jnp.ones(
            (cfg.n_layers, plan.wo_in_p), jnp.float32
        )
        layers["ffn_sub_norm"] = jnp.ones(
            (cfg.n_layers, plan.ff_p), jnp.float32
        )
    key, k_embed, k_head = jax.random.split(key, 3)
    params: dict[str, Any] = {
        "embed": (
            jax.random.normal(k_embed, (cfg.vocab_size, cfg.d_model), dtype)
            * 0.02
        ),
        "final_norm": jnp.ones((cfg.d_model,), jnp.float32),
        "layers": layers,
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = (
            jax.random.normal(k_head, (cfg.d_model, plan.vocab_p), dtype)
            * 0.02
        )
    return params


def init_params(
    cfg: ModelConfig, seed: int = 0, dtype=jnp.bfloat16
) -> dict[str, Any]:
    """Random ternary parameters (synthetic models for tests/benchmarks)."""
    rng = np.random.default_rng(seed)
    plan = make_plan(cfg)
    logical_dims = {
        "wq": (cfg.d_model, cfg.q_dim),
        "wk": (cfg.d_model, cfg.kv_dim),
        "wv": (cfg.d_model, cfg.kv_dim),
        "wo": (cfg.q_dim, cfg.d_model),
        "w_gate": (cfg.d_model, cfg.d_ff),
        "w_up": (cfg.d_model, cfg.d_ff),
        "w_down": (cfg.d_ff, cfg.d_model),
    }

    def one_ternary(name: str):
        k, n = logical_dims[name]
        trits = rng.integers(-1, 2, size=(k, n), dtype=np.int8)
        t = pack_weight(name, trits, np.float32(0.05), cfg, plan)
        return np.asarray(t.packed), np.asarray(t.scale)

    def stack_ternary(name: str, experts: int = 0):
        packed, scales = [], []
        for _ in range(cfg.n_layers):
            if experts:
                ep, es = zip(*(one_ternary(name) for _ in range(experts)))
                packed.append(np.stack(ep))
                scales.append(np.stack(es))
            else:
                p, s = one_ternary(name)
                packed.append(p)
                scales.append(s)
        return {
            "packed": jnp.asarray(np.stack(packed)),
            "scale": jnp.asarray(np.stack(scales)),
        }

    if not cfg.ffn_gated:
        del logical_dims["w_gate"]
    if cfg.kv_lora_rank:
        dn, dr, r_kv = cfg.qk_nope_dim, cfg.qk_rope_dim, cfg.kv_lora_rank
        for nm in ("wq", "wk", "wv"):
            del logical_dims[nm]
        logical_dims["wkv_a"] = (cfg.d_model, r_kv + dr)
        if cfg.q_lora_rank:
            logical_dims["wq_a"] = (cfg.d_model, cfg.q_lora_rank)
            logical_dims["wq_b"] = (cfg.q_lora_rank, cfg.n_heads * (dn + dr))
        else:
            logical_dims["wq_full"] = (cfg.d_model, cfg.n_heads * (dn + dr))
    moe = cfg.n_experts
    layers: dict[str, Any] = {
        name: stack_ternary(
            name, experts=moe if name.startswith("w_") else 0
        )
        for name in logical_dims
    }
    layers["attn_norm"] = jnp.ones((cfg.n_layers, cfg.d_model), jnp.float32)
    layers["ffn_norm"] = jnp.ones((cfg.n_layers, cfg.d_model), jnp.float32)
    if cfg.kv_lora_rank:
        dn, dr, r_kv = cfg.qk_nope_dim, cfg.qk_rope_dim, cfg.kv_lora_rank
        layers["kv_a_norm"] = jnp.ones((cfg.n_layers, r_kv), jnp.float32)
        if cfg.q_lora_rank:
            layers["q_a_norm"] = jnp.ones(
                (cfg.n_layers, cfg.q_lora_rank), jnp.float32
            )
        layers["w_uk"] = {"dense": jnp.asarray(
            rng.standard_normal(
                (cfg.n_layers, cfg.n_heads, dn, r_kv)) * 0.03, jnp.float32)}
        layers["w_uv"] = {"dense": jnp.asarray(
            rng.standard_normal(
                (cfg.n_layers, cfg.n_heads, r_kv, cfg.head_dim_)) * 0.03,
            jnp.float32)}
    if cfg.norm_type == "ln":
        for nm in ("attn_norm_b", "ffn_norm_b"):
            layers[nm] = jnp.asarray(
                rng.standard_normal((cfg.n_layers, cfg.d_model)) * 0.02,
                jnp.float32,
            )
    if cfg.proj_bias:
        for nm, width in (("bo", cfg.d_model), ("b_up", plan.ff_p),
                          ("b_down", cfg.d_model)):
            layers[nm] = jnp.asarray(
                rng.standard_normal((cfg.n_layers, width)) * 0.02,
                jnp.float32,
            )
    if cfg.use_subnorms:
        layers["attn_sub_norm"] = jnp.ones(
            (cfg.n_layers, plan.wo_in_p), jnp.float32
        )
        layers["ffn_sub_norm"] = jnp.ones(
            (cfg.n_layers, plan.ff_p), jnp.float32
        )
    if cfg.qkv_bias:
        for nm, width in (("bq", plan.q_dim_p), ("bk", plan.kv_dim_p),
                          ("bv", plan.kv_dim_p)):
            layers[nm] = jnp.asarray(
                rng.standard_normal((cfg.n_layers, width)) * 0.02, jnp.float32
            )
    if cfg.qk_norm:
        layers["q_norm"] = jnp.ones((cfg.n_layers, plan.hd_p), jnp.float32)
        layers["k_norm"] = jnp.ones((cfg.n_layers, plan.hd_p), jnp.float32)
    if cfg.post_norms:
        layers["post_attn_norm"] = jnp.ones(
            (cfg.n_layers, cfg.d_model), jnp.float32
        )
        layers["post_ffn_norm"] = jnp.ones(
            (cfg.n_layers, cfg.d_model), jnp.float32
        )
    if moe:
        layers["router"] = jnp.asarray(
            rng.standard_normal((cfg.n_layers, cfg.d_model, moe)) * 0.02,
            jnp.float32,
        )

    embed = rng.standard_normal((cfg.vocab_size, cfg.d_model)) * 0.02
    params: dict[str, Any] = {
        "embed": jnp.asarray(embed, dtype),
        "final_norm": jnp.ones((cfg.d_model,), jnp.float32),
        "layers": layers,
    }
    if cfg.norm_type == "ln":
        params["final_norm_b"] = jnp.asarray(
            rng.standard_normal((cfg.d_model,)) * 0.02, jnp.float32
        )
    if not cfg.tie_embeddings:
        head = rng.standard_normal((cfg.d_model, plan.vocab_p)) * 0.02
        head[:, cfg.vocab_size :] = 0.0
        params["lm_head"] = jnp.asarray(head, dtype)
    return params


def init_kv_cache(
    cfg: ModelConfig, batch: int, max_len: int | None = None,
    dtype=jnp.bfloat16, quantized: bool = False, layout: str = "stacked",
) -> dict[str, jax.Array]:
    from vlut_tpu.runtime.kv_cache import new_cache

    plan = make_plan(cfg)
    s = max_len or cfg.max_seq_len
    if cfg.kv_lora_rank:
        # MLA: one latent row per position — k = [latent | k_pe | pad],
        # v = [latent | pad] (deepseek's the-cache-IS-the-latent win);
        # rows pad to a lane multiple (640 for the real 512+64)
        w_row = cfg.kv_lora_rank + cfg.qk_rope_dim
        return new_cache(
            cfg.n_layers, batch, s, 1, w_row + (-w_row) % 128,
            dtype=dtype, quantized=quantized, layout=layout,
        )
    return new_cache(
        cfg.n_layers, batch, s, cfg.n_kv_heads, plan.hd_p,
        dtype=dtype, quantized=quantized, layout=layout,
    )


def _rms(x, weight, eps, n_logical, tp_axis=None, plus_one=False):
    """RMSNorm where zero-padded tails don't skew the mean and sharded dims
    psum their sufficient statistics.  plus_one: gemma-style (1 + w)."""
    xf = x.astype(jnp.float32)
    ss = jnp.sum(xf * xf, axis=-1, keepdims=True)
    if tp_axis is not None:
        ss = jax.lax.psum(ss, tp_axis)
    w = weight.astype(jnp.float32)
    if plus_one:
        w = 1.0 + w
    out = xf * jax.lax.rsqrt(ss / n_logical + eps) * w
    return out.astype(x.dtype)


def _rms_whole(z, w, eps, n_logical):
    """RMSNorm over the last TWO dims jointly (olmo2 whole-q/k norm:
    Olmo2RMSNorm(n_heads * head_dim) applied before the head split).
    z: (..., H, hd_p); w: flat (H*hd_p,) head-padded weights."""
    zf = z.astype(jnp.float32)
    ms = jnp.sum(zf * zf, axis=(-2, -1), keepdims=True) / n_logical
    wf = w.astype(jnp.float32).reshape(z.shape[-2], z.shape[-1])
    return (zf * jax.lax.rsqrt(ms + eps) * wf).astype(z.dtype)


def _layernorm(x, weight, bias, eps, n_logical, tp_axis=None,
               plus_one=False):
    """Mean-centered LayerNorm (gptneox/phi-2/starcoder2/cohere norms;
    reference build_norm LLM_NORM, src/llama-graph.cpp).  bias None for
    bias-free variants (cohere); plus_one: nemotron LayerNorm1P (1 + w)."""
    xf = x.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=-1, keepdims=True)
    s2 = jnp.sum(xf * xf, axis=-1, keepdims=True)
    if tp_axis is not None:
        s1 = jax.lax.psum(s1, tp_axis)
        s2 = jax.lax.psum(s2, tp_axis)
    mean = s1 / n_logical
    var = s2 / n_logical - mean * mean
    w = weight.astype(jnp.float32)
    if plus_one:
        w = 1.0 + w
    out = (xf - mean) * jax.lax.rsqrt(var + eps) * w
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def alibi_slopes(n_heads: int) -> np.ndarray:
    """Per-head ALiBi slopes (bloom/mpt; reference build_alibi in
    ggml ggml_soft_max_ext's max_bias path).  Matches HF's
    build_alibi_tensor: geometric 2^(-8i/m) over the closest power of two
    m, extra heads interleave the doubled schedule."""
    m = 1 << int(np.floor(np.log2(n_heads)))
    base = 2.0 ** (-(2.0 ** -(np.log2(m) - 3)))
    slopes = base ** np.arange(1, m + 1, dtype=np.float64)
    if m != n_heads:
        base2 = 2.0 ** (-(2.0 ** -(np.log2(2 * m) - 3)))
        extra = base2 ** np.arange(1, 2 * (n_heads - m) + 1, 2,
                                   dtype=np.float64)
        slopes = np.concatenate([slopes, extra])
    return slopes.astype(np.float32)


ATTN_CHUNK = 1024  # switch to online-softmax chunking past this KV length


def _attention(q, k, v, q_pos, k_pos, hd_logical, scale=0.0, softcap=0.0,
               window=None, mask_override=None, alibi=None, sinks=None,
               chunked_window=False, causal=True,
               k_scale=None, v_scale=None):
    """Causal GQA attention.  window: traced scalar — keys older than
    q_pos - window are masked when > 0 (SWA, src/llama-kv-cache-iswa.cpp
    semantics); softcap: gemma2 tanh score capping.

    mask_override (B, T, S) bool replaces the position-derived causal/SWA
    mask entirely — the hook for lookahead decoding's 2-D window masks
    (reference: examples/lookahead builds a custom kq mask) and packed
    ragged batches.  The caller owns causality when overriding.

    alibi: (H,) per-head slopes; scores += slope * (k_pos - q_pos)
    (bloom/mpt — shift-invariant form of HF's slope*arange(S) bias).
    sinks: (H,) learned sink logits joining the softmax denominator
    without contributing value rows (gpt-oss attention sinks).

    k_scale/v_scale (B, S, Hkv): deferred int8-KV dequant — the codes
    stream as int8 and the per-row scales fold into the scores
    (scores·ks) and the probabilities (p·vs) instead of materializing a
    full f32 cache copy per layer (measured 10.1 -> ~6 ms/step at 8B
    np=32, scripts/exp_ab_interleave.py int8 arm).  Exactly equal to
    attending over dequantize_kv outputs.

    Short KV uses one dense softmax; long KV streams chunks with an
    online softmax (flash-attention recurrence) so the (T, S) score
    matrix never materializes — the TPU replacement for the reference's
    ggml_flash_attn_ext (ggml/include/ggml.h:2331)."""
    if k.shape[1] > ATTN_CHUNK:
        if k_scale is not None:
            # chunked long-KV path keeps the pre-dequantized form
            from vlut_tpu.runtime.kv_cache import dequantize_kv

            k = dequantize_kv(k, k_scale)
            v = dequantize_kv(v, v_scale)
        return _attention_chunked(
            q, k, v, q_pos, k_pos, hd_logical, scale, softcap, window,
            mask_override=mask_override, alibi=alibi, sinks=sinks,
            chunked_window=chunked_window, causal=causal,
        )
    b, t, h, hd = q.shape
    hkv = k.shape[2]
    g = h // hkv
    qf = q.astype(jnp.float32) * (scale or 1.0 / np.sqrt(hd_logical))
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    qf = qf.reshape(b, t, hkv, g, hd)
    scores = jnp.einsum("bthgd,bshd->bhgts", qf, kf)
    if k_scale is not None:
        # true scores = q · (codes * ks) == (q · codes) * ks
        scores = scores * jnp.moveaxis(
            k_scale.astype(jnp.float32), 1, 2)[:, :, None, None, :]
    if softcap:
        scores = softcap * jnp.tanh(scores / softcap)
    kp = k_pos[:, None, None, None, :]
    qp = q_pos[:, None, None, :, None]
    if alibi is not None:
        slopes = jnp.asarray(alibi, jnp.float32).reshape(1, hkv, g, 1, 1)
        scores = scores + slopes * (kp - qp).astype(jnp.float32)
    if mask_override is not None:
        mask = mask_override[:, None, None, :, :]
    else:
        # causal=False: bidirectional (encoder / gemma-embedding); SWA
        # then masks symmetrically — HF _bidirectional_window_overlay
        # |q - k| < window (the reference's LLAMA_SWA_TYPE_SYMMETRIC
        # analog, src/llama-hparams.cpp:220)
        mask = ((kp <= qp) & (kp >= 0)) if causal else (kp >= 0)
        if window is not None:
            if chunked_window:
                # llama4 chunked attention: key visible iff it shares the
                # floor(pos/window) chunk (LLAMA_SWA_TYPE_CHUNKED,
                # src/llama-hparams.cpp is_masked_swa)
                ws = jnp.maximum(window, 1)
                mask &= jnp.where(
                    window > 0, (kp // ws) == (qp // ws), True
                )
            elif causal:
                mask &= jnp.where(window > 0, kp > qp - window, True)
            else:
                mask &= jnp.where(
                    window > 0, jnp.abs(kp - qp) < window, True
                )
    scores = jnp.where(mask, scores, -1e30)
    if sinks is not None:
        sk = jnp.asarray(sinks, jnp.float32).reshape(1, hkv, g, 1)
        m = jnp.maximum(scores.max(-1), sk)
        p = jnp.exp(scores - m[..., None])
        p = jnp.where(mask, p, 0.0)
        p = p / (p.sum(-1) + jnp.exp(sk - m))[..., None]
    else:
        p = jax.nn.softmax(scores, axis=-1)
    if v_scale is not None:
        # out = p · (codes * vs) == (p * vs) · codes
        p = p * jnp.moveaxis(
            v_scale.astype(jnp.float32), 1, 2)[:, :, None, None, :]
    out = jnp.einsum("bhgts,bshd->bthgd", p, vf)
    # v width may differ from the q/k width (MLA: scores over the 576-wide
    # latent||k_pe rows, values are the 512-wide latent slice)
    return out.reshape(b, t, h, v.shape[-1])


def _attention_chunked(q, k, v, q_pos, k_pos, hd_logical, scale=0.0,
                       softcap=0.0, window=None, chunk=ATTN_CHUNK,
                       mask_override=None, alibi=None, sinks=None,
                       chunked_window=False, causal=True):
    """Online-softmax attention over KV chunks (same semantics as the dense
    path; O(T * chunk) live scores instead of O(T * S)).  Sinks enter as
    the recurrence's initial state (m0 = sink logit, l0 = 1, acc = 0)."""
    b, t, h, hd = q.shape
    hkv = k.shape[2]
    g = h // hkv
    s = k.shape[1]
    nc = -(-s // chunk)
    pad = nc * chunk - s
    if pad:
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
        k_pos = jnp.pad(k_pos, ((0, 0), (0, pad)), constant_values=-1)
        if mask_override is not None:
            mask_override = jnp.pad(mask_override, ((0, 0), (0, 0), (0, pad)))

    qf = q.astype(jnp.float32) * (scale or 1.0 / np.sqrt(hd_logical))
    qf = qf.reshape(b, t, hkv, g, hd)
    qp = q_pos[:, None, None, :, None]  # (b,1,1,t,1)

    def body(carry, ci):
        m, l, acc = carry
        off = ci * chunk
        kc = jax.lax.dynamic_slice_in_dim(k, off, chunk, axis=1).astype(
            jnp.float32
        )
        vc = jax.lax.dynamic_slice_in_dim(v, off, chunk, axis=1).astype(
            jnp.float32
        )
        kpc = jax.lax.dynamic_slice_in_dim(k_pos, off, chunk, axis=1)
        sc = jnp.einsum("bthgd,bshd->bhgts", qf, kc)
        if softcap:
            sc = softcap * jnp.tanh(sc / softcap)
        kp_ = kpc[:, None, None, None, :]
        if alibi is not None:
            slopes = jnp.asarray(alibi, jnp.float32).reshape(
                1, hkv, g, 1, 1
            )
            sc = sc + slopes * (kp_ - qp).astype(jnp.float32)
        if mask_override is not None:
            mc = jax.lax.dynamic_slice_in_dim(
                mask_override, off, chunk, axis=2
            )
            mask = mc[:, None, None, :, :]
        else:
            mask = ((kp_ <= qp) & (kp_ >= 0)) if causal else (kp_ >= 0)
            if window is not None:
                if chunked_window:
                    ws = jnp.maximum(window, 1)
                    mask &= jnp.where(
                        window > 0, (kp_ // ws) == (qp // ws), True
                    )
                elif causal:
                    mask &= jnp.where(window > 0, kp_ > qp - window, True)
                else:
                    mask &= jnp.where(
                        window > 0, jnp.abs(kp_ - qp) < window, True
                    )
        sc = jnp.where(mask, sc, -1e30)
        m_new = jnp.maximum(m, sc.max(-1))
        corr = jnp.exp(m - m_new)
        p = jnp.exp(sc - m_new[..., None])
        p = jnp.where(mask, p, 0.0)
        l = l * corr + p.sum(-1)
        pv = jnp.einsum("bhgts,bshd->bhgtd", p, vc)
        acc = acc * corr[..., None] + pv
        return (m_new, l, acc), None

    if sinks is not None:
        m0 = jnp.broadcast_to(
            jnp.asarray(sinks, jnp.float32).reshape(1, hkv, g, 1),
            (b, hkv, g, t),
        )
        l0 = jnp.ones((b, hkv, g, t), jnp.float32)
    else:
        m0 = jnp.full((b, hkv, g, t), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((b, hkv, g, t), jnp.float32)
    a0 = jnp.zeros((b, hkv, g, t, v.shape[-1]), jnp.float32)
    (m, l, acc), _ = jax.lax.scan(
        body, (m0, l0, a0), jnp.arange(nc, dtype=jnp.int32)
    )
    out = acc / jnp.maximum(l, 1e-30)[..., None]  # (b,hkv,g,t,hd_v)
    out = jnp.moveaxis(out, 3, 1).reshape(b, t, h, v.shape[-1])
    return out


def _ring_attention(q, k, v, q_pos, k_pos, hd_logical, sp_axis, scale=0.0,
                    softcap=0.0, window=None, alibi=None, sinks=None,
                    chunked_window=False, causal=True):
    """Ring/blockwise context-parallel attention (SURVEY §2.3 stretch goal;
    beyond the reference, which has no CP at all).

    Each "sp" shard holds only its T/sp slice of K/V — per-device KV
    memory scales 1/sp, unlike the gathered-KV form (the round-2 sp path)
    where every device materialized the full context.  The sp blocks
    rotate around the ring with ``jax.lax.ppermute`` (ICI
    neighbor-exchange, overlappable with the block's compute) while a
    flash-style online softmax merges partial results; masks are derived
    from GLOBAL position values carried alongside the blocks, so causal /
    SWA / chunked-window / ALiBi semantics are origin-independent and
    bit-match the gathered form (tests/test_parallel.py).
    """
    sp = jax.lax.axis_size(sp_axis)
    b, t, h, hd = q.shape
    hkv = k.shape[2]
    g = h // hkv
    qf = q.astype(jnp.float32) * (scale or 1.0 / np.sqrt(hd_logical))
    qf = qf.reshape(b, t, hkv, g, hd)
    qp = q_pos[:, None, None, :, None]
    perm = [(i, (i + 1) % sp) for i in range(sp)]

    def body(carry, _):
        kb, vb, kpb, m, l, acc = carry
        sc = jnp.einsum("bthgd,bshd->bhgts", qf, kb.astype(jnp.float32))
        if softcap:
            sc = softcap * jnp.tanh(sc / softcap)
        kp_ = kpb[:, None, None, None, :]
        if alibi is not None:
            slopes = jnp.asarray(alibi, jnp.float32).reshape(1, hkv, g, 1, 1)
            sc = sc + slopes * (kp_ - qp).astype(jnp.float32)
        mask = ((kp_ <= qp) & (kp_ >= 0)) if causal else (kp_ >= 0)
        if window is not None:
            if chunked_window:
                ws = jnp.maximum(window, 1)
                mask &= jnp.where(window > 0, (kp_ // ws) == (qp // ws), True)
            elif causal:
                mask &= jnp.where(window > 0, kp_ > qp - window, True)
            else:
                mask &= jnp.where(window > 0, jnp.abs(kp_ - qp) < window,
                                  True)
        sc = jnp.where(mask, sc, -1e30)
        m_new = jnp.maximum(m, sc.max(-1))
        corr = jnp.exp(m - m_new)
        p = jnp.exp(sc - m_new[..., None])
        p = jnp.where(mask, p, 0.0)
        l = l * corr + p.sum(-1)
        pv = jnp.einsum("bhgts,bshd->bhgtd", p, vb.astype(jnp.float32))
        acc = acc * corr[..., None] + pv
        kb, vb, kpb = jax.lax.ppermute((kb, vb, kpb), sp_axis, perm)
        return (kb, vb, kpb, m_new, l, acc), None

    if sinks is not None:
        m0 = jnp.broadcast_to(
            jnp.asarray(sinks, jnp.float32).reshape(1, hkv, g, 1),
            (b, hkv, g, t),
        )
        l0 = jnp.ones((b, hkv, g, t), jnp.float32)
    else:
        m0 = jnp.full((b, hkv, g, t), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((b, hkv, g, t), jnp.float32)
    a0 = jnp.zeros((b, hkv, g, t, v.shape[-1]), jnp.float32)
    (_, _, _, m, l, acc), _ = jax.lax.scan(
        body, (k, v, k_pos, m0, l0, a0), None, length=sp
    )
    out = acc / jnp.maximum(l, 1e-30)[..., None]
    out = jnp.moveaxis(out, 3, 1).reshape(b, t, h, v.shape[-1])
    return out


def forward(
    params: dict[str, Any],
    cfg: ModelConfig,
    tokens: jax.Array,  # (B, T) int32
    positions: jax.Array,  # (B, T) int32; -1 marks padding tokens
    kv_cache: dict[str, jax.Array] | None = None,
    *,
    impl: str = "auto",
    logits_last_only: bool = False,
    logits_at: jax.Array | None = None,  # (B,) per-row index into T
    tp_axis: str | None = None,
    tp_size: int = 1,
    ep_axis: str | None = None,
    ep_size: int = 1,
    sp_axis: str | None = None,
    output: str = "logits",  # "logits" | "hidden" (post-final-norm states)
    token_embeds: jax.Array | None = None,  # (B, T, D) replaces embed lookup
    attn_mask: jax.Array | None = None,  # (B, T, S) full mask override
    mrope_pos: jax.Array | None = None,  # (B, 3, T) qwen2-vl M-RoPE rows;
    # None = standard rope from `positions` (equal rows are equivalent)
    visual_expert: bool = False,  # cogvlm: use the vis_* weight set
    deepstack_embeds: tuple | None = None,  # qwen3vl DeepStack per-layer
    # visual adds, see run_layers
) -> tuple[jax.Array, dict[str, jax.Array] | None]:
    """Returns (logits, updated kv_cache).

    With a cache, positions within each sequence must be contiguous per call
    (the T new tokens of batch row b occupy cache rows positions[b, 0] ...
    positions[b, 0]+T-1 — the continuous-batching engine guarantees this).
    Cache row j of row b is assumed to hold the token at position j.

    Under shard_map pass tp_axis + tp_size; params/cache/lm_head must then be
    the local shards per parallel/sharding.py.
    """
    b, t = tokens.shape
    plan = make_plan(cfg)

    if token_embeds is not None:
        # multimodal injection (reference: mtmd image tokens): the caller
        # supplies mixed text+image embeddings; `tokens` only sizes shapes
        x = token_embeds.astype(params["embed"].dtype)
    else:
        x = params["embed"][tokens]  # (B, T, D)
    if cfg.embed_scale:
        # gemma scales embeddings by sqrt(d_model) (src/models/gemma*.cpp)
        x = (x.astype(jnp.float32) * cfg.embed_scale).astype(x.dtype)
    if cfg.embed_norm:
        # bloom word_embeddings_layernorm (src/models/bloom.cpp tok_norm)
        x = _layernorm(
            x, params["embed_norm"], params.get("embed_norm_b"),
            cfg.rms_eps, cfg.d_model,
        )
    if cfg.pos_embed == "learned":
        # gpt2 wpe / opt embed_positions absolute position table
        # (reference: LLM_TENSOR_POS_EMBD, src/models/gpt2.cpp)
        pe = params["pos_embed"][jnp.maximum(positions, 0)]
        x = x + pe.astype(x.dtype)

    # per-layer sliding window (0 = global): explicit HF layer_types flags
    # when present, else the gemma2-style alternating pattern — every
    # sliding_window_pattern-th layer is global
    if cfg.sliding_window:
        is_swa = np.asarray(cfg.swa_flags(), bool)
        layer_window = jnp.asarray(
            np.where(is_swa, cfg.sliding_window, 0), jnp.int32
        )
    else:
        layer_window = jnp.zeros((cfg.n_layers,), jnp.int32)

    x, new_cache = run_layers(
        params["layers"], x, positions, layer_window, kv_cache,
        cfg=cfg, plan=plan, impl=impl, tp_axis=tp_axis, tp_size=tp_size,
        ep_axis=ep_axis, ep_size=ep_size, sp_axis=sp_axis,
        attn_mask=attn_mask, mrope_pos=mrope_pos,
        visual_expert=visual_expert, deepstack_embeds=deepstack_embeds,
    )

    if cfg.norm_type == "ln":
        x = _layernorm(
            x, params["final_norm"], params.get("final_norm_b"),
            cfg.rms_eps, cfg.d_model, plus_one=cfg.norm_plus_one,
        )
    else:
        x = _rms(
            x, params["final_norm"], cfg.rms_eps, cfg.d_model,
            plus_one=cfg.norm_plus_one,
        )
    if output == "hidden":
        # embeddings path (reference: llama_get_embeddings / pooling in
        # src/llama-context.cpp) — final-norm hidden states, no lm_head
        return x, new_cache
    if logits_at is not None:
        # project only the requested token per row (prefill wants one row's
        # logits; computing (B, T, V) for V=128k would waste HBM)
        x = x[jnp.arange(b), logits_at][:, None]
    elif logits_last_only:
        x = x[:, -1:]
    head = params.get("lm_head")
    if "no_head" in _ABLATE():
        # perf-ablation only: skip the output-head stream (0.53 GB int8 at
        # 8B shapes) while keeping a data dependency on x and the logits
        # shape, so the sampler/argmax cost stays in the measurement
        v = head["q"].shape[1] if isinstance(head, dict) else (
            params["embed"].shape[0] if head is None else head.shape[1])
        logits = jnp.zeros((x.shape[0], x.shape[1], v), jnp.float32) + (
            jnp.sum(x, axis=-1, keepdims=True).astype(jnp.float32))
        return logits, new_cache
    if isinstance(head, dict):
        # int8-quantized output head (reference quantizes output.weight to
        # Q6_K by default, src/llama-quant.cpp:211; int8+per-channel scale
        # is higher fidelity and halves the per-step head read)
        from vlut_tpu.ops.quant import quantize_activations

        bq, tq = x.shape[0], x.shape[1]
        xq, xs = quantize_activations(
            x.reshape(bq * tq, x.shape[-1])
        )
        acc = jax.lax.dot_general(
            xq, head["q"],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        logits = (
            acc.astype(jnp.float32) * xs
            * head["scale"].astype(jnp.float32)[None, :]
        ).reshape(bq, tq, -1)
    else:
        if head is None:
            head = params["embed"].T
        logits = jnp.dot(
            x.astype(jnp.float32),
            head.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
    if "lm_head_b" in params:
        # phi-2 style output-head bias
        logits = logits + params["lm_head_b"].astype(logits.dtype)
    if cfg.logit_scale != 1.0:
        # granite logits_scaling divide / minicpm dim_model_base ratio
        # (reference: llm_build_granite res scaling, src/models/)
        logits = logits * cfg.logit_scale
    if cfg.final_logit_softcap:
        cap = cfg.final_logit_softcap
        logits = cap * jnp.tanh(logits / cap)
    return logits, new_cache


def run_layers(
    layers: dict[str, Any],
    x: jax.Array,  # (B, T, D)
    positions: jax.Array,  # (B, T) int32; -1 marks padding tokens
    layer_window: jax.Array,  # (L_local,) int32 per-layer SWA width (0=off)
    kv: dict[str, jax.Array] | None,  # stacked (L_local, B, S, H, hd[, ...])
    *,
    cfg: ModelConfig,
    plan: DimPlan | None = None,
    impl: str = "auto",
    tp_axis: str | None = None,
    tp_size: int = 1,
    ep_axis: str | None = None,
    ep_size: int = 1,
    sp_axis: str | None = None,
    attn_mask: jax.Array | None = None,  # (B, T, S) override, see _attention
    mrope_pos: jax.Array | None = None,  # (B, 3, T) M-RoPE rows
    visual_expert: bool = False,  # cogvlm vis_* weight set
    deepstack_embeds: tuple | None = None,  # qwen3vl DeepStack: (B, T, D)
    # per entry, added to the hidden state after layer i (zeros at
    # non-visual positions; HF Qwen3VLTextModel._deepstack_process)
) -> tuple[jax.Array, dict[str, jax.Array] | None]:
    """Scan the transformer stack over a (possibly stage-local) layers tree.

    Factored out of :func:`forward` so pipeline parallelism
    (parallel/pipeline.py) can run a stage's layer slice on microbatches.
    Parallel axes (all optional, composable under shard_map):

    * ``tp_axis``  — megatron tensor parallel (psum after wo / w_down)
    * ``ep_axis``  — expert parallel: the experts dim of MoE weights is
      sharded; each shard computes its local experts' weighted outputs and
      the combine psums over the axis
    * ``sp_axis``  — ring/blockwise context parallel for the cache-less
      path: queries stay local to each T-shard; K/V blocks (with their
      global positions) rotate around the ring via ppermute with an
      online-softmax merge, so per-device KV memory scales 1/sp
      (:func:`_ring_attention`; tests/test_ring_attention.py).  An
      explicit ``attn_mask`` override falls back to gathered-KV.
    """
    plan = plan or make_plan(cfg)
    specs = weight_specs(cfg, tp=tp_size, plan=plan)
    # per-layer overrides (heads_per_layer / d_ff_per_layer archs:
    # openelm/deci/mimo2/plamo3): the unrolled loop swaps in each layer's
    # own spec table + dim plan before calling layer_step (trace-time
    # only — scan-mode models are always uniform)
    _dyn = {"specs": specs, "plan": plan}
    heads_l = cfg.n_heads // tp_size
    kv_heads_l = cfg.n_kv_heads // tp_size
    hd_p = plan.hd_p
    b, t = positions.shape
    rot = plan.hd
    if cfg.rope_pct < 1.0:
        # partial rotary (gptneox rotary_pct, phi-2/stablelm
        # partial_rotary_factor): rope only the first rot dims, pass the
        # rest through.  Under the padded-head layout the logical prefix
        # maps identically as long as rot <= hd//2 (head_positions keeps
        # the first half contiguous).
        rot = int(plan.hd * cfg.rope_pct) // 2 * 2
        if plan.hd != hd_p and rot > plan.hd // 2:
            raise ValueError(
                f"rope_pct={cfg.rope_pct} needs rot <= head_dim/2 when the "
                f"head dim is lane-padded ({plan.hd} -> {hd_p})"
            )
    cos, sin = rope_table(
        cfg.max_seq_len, rot, cfg.rope_theta, cfg.rope_scaling,
        pad_to=hd_p if rot == plan.hd else None,
    )
    cos_loc = sin_loc = None
    if cfg.rope_theta_local:
        # SWA layers rope with rope_local_base_freq and NO scaling (gemma3:
        # linear scaling applies to the global layers only — HF
        # Gemma3RotaryEmbedding uses default rope for local layers)
        cos_loc, sin_loc = rope_table(
            cfg.max_seq_len, rot, cfg.rope_theta_local, None,
            pad_to=hd_p if rot == plan.hd else None,
        )
    safe_pos = jnp.maximum(positions, 0)
    mrope_sections = tuple(
        (cfg.rope_scaling or {}).get("mrope_section") or ()
    )

    if cfg.rope_interleaved and plan.hd != hd_p:
        raise ValueError(
            "rope_interleaved requires an unpadded head dim (the "
            "even|odd permutation does not commute with the padded-head "
            "layout)"
        )

    def rope_fn(z, pos, on=None, loc=None):
        if cfg.pos_embed != "rope":
            return z  # learned/alibi/none positional schemes skip rope
        if loc is not None and cos_loc is not None:
            # per-layer local-theta table (traced scalar under lax.scan).
            # Gather BOTH tables at the token positions FIRST, then select
            # on the gathered (T, half) rows — a pre-gather jnp.where
            # over the full (max_seq_len, half) tables materializes
            # table-sized temporaries on every q/k rope call per layer.
            c_t = jnp.where(loc, cos_loc[pos], cos[pos])[..., None, :]
            s_t = jnp.where(loc, sin_loc[pos], sin[pos])[..., None, :]
            pre_gathered = True
        else:
            c_t, s_t = cos, sin
            pre_gathered = False
        if cfg.rope_interleaved:
            # original-GPT pairwise rope: permute even|odd channels, then
            # half-split rope.  The inverse permutation is dropped — it
            # cancels in the q.k dot (see config.rope_interleaved).
            # Partial rotary (gptj rotary_dim / glm4): permute WITHIN the
            # rotated prefix only; pass-through dims stay in place.
            if rot == plan.hd:
                z = jnp.concatenate([z[..., 0::2], z[..., 1::2]], axis=-1)
            else:
                zp = z[..., :rot]
                z = jnp.concatenate(
                    [zp[..., 0::2], zp[..., 1::2], z[..., rot:]], axis=-1
                )
        if mrope_sections and mrope_pos is not None:
            # qwen2-vl (chunked) / qwen3-vl (interleaved) M-RoPE
            from vlut_tpu.ops.rope import apply_mrope, mrope_row_map

            row_map = mrope_row_map(
                mrope_sections, cos.shape[-1],
                bool((cfg.rope_scaling or {}).get("mrope_interleaved")),
            )
            zr = apply_mrope(z, mrope_pos, cos, sin, row_map)
        elif rot == plan.hd:
            zr = (
                apply_rope_rows(z, c_t, s_t)
                if pre_gathered
                else apply_rope(z, pos, c_t, s_t)
            )
        else:
            zrot = (
                apply_rope_rows(z[..., :rot], c_t, s_t)
                if pre_gathered
                else apply_rope(z[..., :rot], pos, c_t, s_t)
            )
            zr = jnp.concatenate([zrot, z[..., rot:]], axis=-1)
        if on is None:
            return zr
        # per-layer NoPE flag (cohere2 global layers / smollm3
        # no_rope_layers): traced scalar under lax.scan, so select
        return jnp.where(on > 0, zr, z)

    # per-layer rope on/off; all-on unless cfg.nope_layers marks NoPE
    # layers.  NOTE: when cfg.rope_interleaved is set, NoPE layers still
    # see the (self-cancelling) even|odd permutation via `z` above —
    # harmless for scores, and k rows stay layout-consistent in the cache.
    if cfg.nope_layers is not None:
        if layer_window.shape[0] != cfg.n_layers:
            raise ValueError(
                "nope_layers models don't support stage-local layer "
                "slices yet (pipeline stages can't infer their slice of "
                "the per-layer rope flags)"
            )
        rope_on = jnp.asarray(
            [0 if f else 1 for f in cfg.nope_layers], jnp.int32
        )
    else:
        # sized to the (possibly stage-local) slice so scan xs line up
        rope_on = jnp.ones((layer_window.shape[0],), jnp.int32)

    alibi = None
    if cfg.pos_embed == "alibi":
        if tp_axis is not None:
            raise ValueError("alibi attention is not tp-sharded yet")
        alibi = alibi_slopes(cfg.n_heads)
        if cfg.alibi_scaled:
            # falcon: (scores + alibi) * 1/sqrt(hd) — our q is pre-scaled,
            # so fold the factor into the slopes
            alibi = alibi / np.sqrt(plan.hd)

    use_cache = kv is not None
    quant_kv = use_cache and "k_scale" in kv
    write_start = None
    if use_cache:
        from vlut_tpu.runtime.kv_cache import max_len_of

        s = max_len_of(kv)
        k_pos_row = jnp.arange(s, dtype=jnp.int32)[None, :].repeat(b, axis=0)
        write_start = safe_pos[:, 0]
    elif sp_axis is not None:
        k_pos_row = jax.lax.all_gather(
            positions, sp_axis, axis=1, tiled=True
        )
    else:
        k_pos_row = positions

    def mm(h_, lt, reduce=False):
        """``reduce``: the weight's K dim is tp-sharded — combine across
        the axis.  Ternary weights use the bit-exact form (global pmax
        activation scale + psum of the UNSCALED int32 accumulator,
        ops/matmul.py); the float twin psums the scaled partials (training
        only, no exactness contract)."""
        if isinstance(lt, jax.Array):  # dense float twin (training)
            out = jnp.dot(
                h_.astype(lt.dtype), lt, preferred_element_type=jnp.float32
            )
            if reduce and tp_axis is not None:
                out = jax.lax.psum(out, tp_axis)
            return out.astype(h_.dtype)
        if reduce and tp_axis is not None:
            return ternary_matmul(
                h_, lt, impl=impl, tp_axis=tp_axis, tp_size=tp_size
            )
        return ternary_matmul(h_, lt, impl=impl)

    p1 = cfg.norm_plus_one

    def proj(h_, lp, name, reduce=False):
        """Base matmul + optional LoRA delta (build_lora_mm analog,
        src/llama-graph.cpp:668-692)."""
        out = mm(h_, _layer_tensor(lp, name, _dyn["specs"][name]),
                 reduce=reduce)
        w = lp[name]
        if isinstance(w, dict) and "lora_a" in w:
            delta = jnp.dot(
                jnp.dot(h_.astype(w["lora_a"].dtype), w["lora_a"]),
                w["lora_b"],
                preferred_element_type=jnp.float32,
            )
            if reduce and tp_axis is not None:
                delta = jax.lax.psum(delta, tp_axis)
            out = out + (
                delta.astype(jnp.float32) * w["lora_scale"]
            ).astype(out.dtype)
        return out

    class _LayerKV:
        """Scan-path cache IO: per-layer (B, S, H, hd) arrays carried
        through the scan; update returns the full K/V views to attend."""

        def __init__(self, kc, vc, ksc, vsc):
            self.kc, self.vc, self.ksc, self.vsc = kc, vc, ksc, vsc

        def peek(self, raw=False):
            if quant_kv:
                if raw:
                    # deferred-scale form: int8 codes + per-row scales go
                    # straight into _attention (codes stream as int8; the
                    # old dequantize path materialized a full f32 cache
                    # copy per layer — measured 10.1 vs 5.5 ms/step at
                    # np=32, scripts/exp_ab_interleave.py int8 arm)
                    return self.kc, self.vc, self.ksc, self.vsc
                from vlut_tpu.runtime.kv_cache import dequantize_kv

                return (
                    dequantize_kv(self.kc, self.ksc),
                    dequantize_kv(self.vc, self.vsc),
                )
            return self.kc, self.vc

        def update(self, k, v, start, raw=False):
            upd3 = jax.vmap(
                lambda c, u, p: jax.lax.dynamic_update_slice(c, u, (p, 0, 0))
            )
            if quant_kv:
                from vlut_tpu.runtime.kv_cache import quantize_kv

                kq, ks_new = quantize_kv(k)
                vq, vs_new = quantize_kv(v)
                self.kc = upd3(self.kc, kq, start)
                self.vc = upd3(self.vc, vq, start)
                upd2 = jax.vmap(
                    lambda c, u, p: jax.lax.dynamic_update_slice(c, u, (p, 0))
                )
                self.ksc = upd2(self.ksc, ks_new, start)
                self.vsc = upd2(self.vsc, vs_new, start)
                return self.peek(raw=raw)
            self.kc = upd3(self.kc, k.astype(self.kc.dtype), start)
            self.vc = upd3(self.vc, v.astype(self.vc.dtype), start)
            return self.kc, self.vc

    class _SlotKV:
        """Unrolled-path cache IO over a dict of PER-LAYER array tuples
        ({"k": (arr_0 ... arr_{L-1}), ...}): each layer's buffers update
        in place (donation-friendly, no cross-layer aliasing) and nothing
        is ever restacked — a stacked (L, ...) cache forces either a
        full-cache restack per step or a 5-D scatter, both of which copy
        hundreds of MB per decode step (measured 16.5 -> 94.6 ms/step for
        the scatter form on v5e)."""

        def __init__(self, state: dict, i: int):
            self.state, self.i = state, i

        def peek(self, raw=False):
            st, i = self.state, self.i
            if quant_kv:
                if raw:
                    # deferred-scale form (see _LayerKV.peek)
                    return (st["k"][i], st["v"][i],
                            st["k_scale"][i], st["v_scale"][i])
                from vlut_tpu.runtime.kv_cache import dequantize_kv

                return (
                    dequantize_kv(st["k"][i], st["k_scale"][i]),
                    dequantize_kv(st["v"][i], st["v_scale"][i]),
                )
            return st["k"][i], st["v"][i]

        def _put(self, name, u, start):
            from vlut_tpu.ops.kv_update import write_rows

            arrs = list(self.state[name])
            # T == 1 on this path (decode); multi-token writes (spec/
            # lookahead verify rounds) fall back to the dus form inside
            # write_rows only for the scatter-free kernel's T=1 case
            if u.shape[1] == 1:
                arrs[self.i] = write_rows(arrs[self.i], u, start, impl=impl)
            else:
                nd = u.ndim - 1
                upd = lambda c, w, p: jax.lax.dynamic_update_slice(  # noqa: E731
                    c, w, (p,) + (0,) * (nd - 1)
                )
                arrs[self.i] = jax.vmap(upd)(arrs[self.i], u, start)
            self.state[name] = tuple(arrs)

        def fused_attend(self, q, k, v, start, window, scale):
            """KV row write + flash attention in ONE kernel launch
            (ops/decode_attention.py) — replaces _put_pair + _attention
            on the standard decode path; the cache streams once in its
            storage dtype (bf16, or int8 codes + scale planes) instead of
            being upcast to f32 by the XLA einsum."""
            st, i = self.state, self.i
            ks, vs = list(st["k"]), list(st["v"])
            if "k_scale" in st:
                # int8 cache: codes + per-(row, head) scales stream into
                # the kernel; the new row quantizes in kernel
                # (ops/decode_attention int8 variant, VERDICT r4 item 4)
                from vlut_tpu.ops.decode_attention import (
                    decode_attention_int8_pallas,
                )

                kss, vss = list(st["k_scale"]), list(st["v_scale"])
                att, ks[i], vs[i], kss[i], vss[i] = (
                    decode_attention_int8_pallas(
                        q, k, v, ks[i], vs[i], start,
                        window if window is not None else 0,
                        kss[i], vss[i], scale=scale,
                    )
                )
                st["k_scale"], st["v_scale"] = tuple(kss), tuple(vss)
            else:
                from vlut_tpu.ops.decode_attention import (
                    decode_attention_pallas,
                )

                att, ks[i], vs[i] = decode_attention_pallas(
                    q, k, v, ks[i], vs[i], start,
                    window if window is not None else 0, scale=scale,
                )
            st["k"], st["v"] = tuple(ks), tuple(vs)
            return att

        def _put_pair(self, name_a, ua, name_b, ub, start):
            """K and V rows in one kernel launch (same shapes).

            VLUT_TPU_KV_WRITE=dus forces the vmap-dynamic_update_slice
            form instead: a Pallas custom call pins its operands to the
            DEFAULT layout, and XLA keeps the decode cache in the
            attention dot's preferred {3,1,2,0} layout — so every pallas
            write costs a full-cache layout round-trip copy per layer
            (12 MB x 2 x 32 layers/step at 8B np=32; found via compiled-
            HLO forensics, scripts/exp_hlo_copies.py).  The DUS form is
            layout-polymorphic and updates in place with no copies."""
            from vlut_tpu.ops.kv_update import write_rows_pair_pallas

            use_pallas = (
                ua.shape[1] == 1
                and impl in ("auto", "pallas")
                and jax.default_backend() == "tpu"
                and os.environ.get("VLUT_TPU_KV_WRITE", "pallas") != "dus"
                # Mosaic requires the trailing block dim to be 128-aligned
                # (or the full array): K/V rows (..., hd=128) qualify; the
                # int8-KV SCALE planes (B, S, Hkv) do not — those take the
                # layout-polymorphic DUS form (found by the int8-KV TPU
                # A/B: the pallas form crashes lowering at Hkv=8)
                and ua.shape[-1] % 128 == 0
            )
            if not use_pallas:
                self._put(name_a, ua, start)
                self._put(name_b, ub, start)
                return
            a = list(self.state[name_a])
            b_ = list(self.state[name_b])
            a[self.i], b_[self.i] = write_rows_pair_pallas(
                a[self.i], b_[self.i], ua, ub, start
            )
            self.state[name_a] = tuple(a)
            self.state[name_b] = tuple(b_)

        def update(self, k, v, start, raw=False):
            st, i = self.state, self.i
            if quant_kv:
                from vlut_tpu.runtime.kv_cache import quantize_kv

                kq, ks_new = quantize_kv(k)
                vq, vs_new = quantize_kv(v)
                self._put_pair("k", kq, "v", vq, start)
                self._put_pair("k_scale", ks_new, "v_scale", vs_new, start)
                return self.peek(raw=raw)
            self._put_pair(
                "k", k.astype(st["k"][i].dtype),
                "v", v.astype(st["v"][i].dtype), start,
            )
            return st["k"][i], st["v"][i]

    def can_fuse(lp, name):
        """Projection eligible for the fused decode GEMM: packed ternary,
        no LoRA delta, no dense float twin."""
        w = lp.get(name)
        return (
            isinstance(w, dict) and "packed" in w and "lora_a" not in w
            and "dense" not in w
        )

    def norm_gain(w):
        return (1.0 + w.astype(jnp.float32)) if p1 else w

    std_norm = cfg.norm_type == "rms"

    def norm_d(z, lp, name):
        """d_model-width pre/post norm, rms or ln per cfg.norm_type."""
        if std_norm:
            return _rms(z, lp[name], cfg.rms_eps, cfg.d_model,
                        tp_axis=None, plus_one=p1)
        return _layernorm(z, lp[name], lp.get(name + "_b"), cfg.rms_eps,
                          cfg.d_model, plus_one=p1)

    # deepseek/qwen-moe heterogeneous-FFN specs (dense layers + shared
    # experts use widths different from the routed experts')
    specs_dense = specs_shared = specs_shared_dn = specs_chunk = None
    if cfg.n_experts and (
        cfg.first_k_dense or cfg.n_shared_experts or cfg.dense_layers
        or cfg.moe_parallel or cfg.moe_chunk_experts
    ):
        import dataclasses as _dc

        if cfg.moe_chunk_experts:
            cfg_c = _dc.replace(
                cfg, d_ff=cfg.d_ff_chunk or cfg.d_ff, n_experts=0
            )
            specs_chunk = weight_specs(
                cfg_c, tp=tp_size, plan=make_plan(cfg_c)
            )
        if cfg.first_k_dense or cfg.dense_layers or cfg.moe_parallel:
            cfg_d = _dc.replace(
                cfg, d_ff=cfg.d_ff_dense or cfg.d_ff, n_experts=0
            )
            specs_dense = weight_specs(
                cfg_d, tp=tp_size, plan=make_plan(cfg_d)
            )
        if cfg.n_shared_experts:
            # deepseek: n_shared * routed width; qwen2-moe: an explicit
            # shared_expert_intermediate_size (cfg.d_ff_shared)
            cfg_s = _dc.replace(
                cfg,
                d_ff=cfg.d_ff_shared or cfg.n_shared_experts * cfg.d_ff,
                n_experts=0,
            )
            sp_s = weight_specs(cfg_s, tp=tp_size, plan=make_plan(cfg_s))
            specs_shared = sp_s["w_gate"]
            specs_shared_dn = sp_s["w_down"]

    if cfg.kv_lora_rank:
        if tp_axis is not None or sp_axis is not None:
            raise ValueError(
                "MLA attention does not support tp/sp sharding yet "
                "(absorbed per-head einsums; dp/ep/pp compose fine)"
            )
        cos_m, sin_m = rope_table(
            cfg.max_seq_len, cfg.qk_rope_dim, cfg.rope_theta,
            cfg.rope_scaling,
        )

    def _il(z):
        # deepseek applies the original-GPT interleaved pairing to the
        # rope dims; permuting q_pe and k_pe identically cancels in the
        # score dot (see config.rope_interleaved)
        return jnp.concatenate([z[..., 0::2], z[..., 1::2]], axis=-1)

    def mla_attention(x, lp, kvio, window):
        """Deepseek MLA with weight absorption (reference:
        src/models/deepseek2.cpp attention; the latent-cache formulation).

        The cache stores ONE (kv_lora_rank + qk_rope_dim)-wide row per
        position: k rows = [latent | k_pe], v rows = [latent | 0-pad].
        Scores come from a single q_eff.k_eff dot with
        q_eff = [q_nope @ W_uk | q_pe], and the context is
        (probs . latent) @ W_uv — so the standard (chunked) attention
        path serves MLA unchanged.
        """
        dn, dr = cfg.qk_nope_dim, cfg.qk_rope_dim
        r_kv = cfg.kv_lora_rank
        hh = cfg.n_heads
        h_attn = h = norm_d(x, lp, "attn_norm")
        fmt, kb = cfg.weight_fmt, plan.kb
        if "wq_a" in lp:
            qa = mm(h, _layer_tensor(lp, "wq_a", TernarySpec(
                cfg.d_model, cfg.q_lora_rank, fmt, kb)))
            qa = _rms(qa, lp["q_a_norm"], cfg.rms_eps, cfg.q_lora_rank)
            q = mm(qa, _layer_tensor(lp, "wq_b", TernarySpec(
                cfg.q_lora_rank, hh * (dn + dr), fmt, kb)))
        else:
            q = mm(h, _layer_tensor(lp, "wq_full", TernarySpec(
                cfg.d_model, hh * (dn + dr), fmt, kb)))
        q = q.reshape(b, t, hh, dn + dr)
        q_nope, q_pe = q[..., :dn], q[..., dn:]
        kvr = mm(h, _layer_tensor(lp, "wkv_a", TernarySpec(
            cfg.d_model, r_kv + dr, fmt, kb)))
        lat = _rms(kvr[..., :r_kv], lp["kv_a_norm"], cfg.rms_eps, r_kv)
        k_pe = kvr[..., r_kv : r_kv + dr].reshape(b, t, 1, dr)
        q_pe = apply_rope(_il(q_pe), safe_pos, cos_m, sin_m)
        k_pe = apply_rope(_il(k_pe), safe_pos, cos_m, sin_m)
        # absorb W_uk into q: q_abs . latent == q_nope . k_nope
        wuk = lp["w_uk"]["dense"].astype(jnp.float32)  # (H, dn, r_kv)
        q_abs = jnp.einsum(
            "bthd,hdr->bthr", q_nope.astype(jnp.float32), wuk
        )
        # cache rows pad to a lane multiple (576 -> 640 for real deepseek);
        # the zero tail is zero in q_eff too, so scores are exact
        w_row = r_kv + dr
        w_pad = (-w_row) % 128
        q_eff = jnp.concatenate(
            [q_abs, q_pe.astype(jnp.float32)], axis=-1
        ).astype(x.dtype)
        q_eff = jnp.pad(q_eff, ((0, 0), (0, 0), (0, 0), (0, w_pad)))
        lat4 = lat.reshape(b, t, 1, r_kv)
        k_row = jnp.concatenate([lat4, k_pe.astype(lat4.dtype)], axis=-1)
        k_row = jnp.pad(k_row, ((0, 0), (0, 0), (0, 0), (0, w_pad)))
        v_row = jnp.pad(lat4, ((0, 0), (0, 0), (0, 0), (0, dr + w_pad)))
        if use_cache:
            k_all, v_all = kvio.update(k_row, v_row, write_start)
        else:
            k_all, v_all = k_row, v_row
        ctx = _attention(
            q_eff, k_all, v_all[..., :r_kv], safe_pos, k_pos_row,
            dn + dr, scale=cfg.attn_scale, window=window,
            mask_override=attn_mask,
        )  # (b, t, H, r_kv)
        wuv = lp["w_uv"]["dense"].astype(jnp.float32)  # (H, r_kv, v_hd)
        att = jnp.einsum("bthr,hrv->bthv", ctx, wuv)
        if plan.hd != plan.hd_p:
            # v_head_dim not lane-aligned (minicpm3: 16/64): scatter the
            # head dims to head_positions so att matches wo's padded-row
            # layout (pack_weight pad_heads_rows)
            from vlut_tpu.models.dims import head_positions

            att_p = jnp.zeros((b, t, cfg.n_heads, plan.hd_p), att.dtype)
            att = att_p.at[..., head_positions(plan.hd, plan.hd_p)].set(att)
        return h_attn, att

    def layer_step(x, xs):
        # kvio: _LayerKV/_StackedKV or None (cache-less)
        lp, kvio, window, r_on = xs
        if visual_expert and "vis_wq" in lp:
            # cogvlm image batches swap in the visual-expert weight set
            # (norms and everything else stay shared)
            lp = {
                **{k_: v_ for k_, v_ in lp.items()
                   if not k_.startswith("vis_")},
                **{k_[4:]: v_ for k_, v_ in lp.items()
                   if k_.startswith("vis_")},
            }
        x_in = x  # layer input (arctic's MoE branch reads it directly)

        # deci heterogeneous layer kinds (src/models/deci.cpp): a layer
        # may lack attention (n_head==0), use a bare linear "attention"
        # (n_head_kv==0: wo straight on the attn-normed input), or lack
        # the FFN (n_ff==0 — the reference graph then skips the WHOLE
        # block including the attention residual: `continue`)
        has_attn = bool(cfg.kv_lora_rank) or "wq" in lp or "wqkv" in lp
        if not any(
            k_ in lp for k_ in ("w_gate", "w_up", "w_gateup", "router")
        ):
            return x_in  # deci n_ff==0 no-op layer
        if not has_attn:
            if "w_lin_attn" in lp:
                # (D, D) replicated (weight_specs doesn't tp-split it and
                # parallel/sharding.py replicates it), so no combine
                o = proj(norm_d(x, lp, "attn_norm"), lp, "w_lin_attn")
                x = x + o.astype(x.dtype)[..., : x.shape[-1]]
            h_attn = None
        elif cfg.kv_lora_rank:
            h_attn, att = mla_attention(x, lp, kvio, window)
        else:
            if ("wqkv" in lp and can_fuse(lp, "wqkv") and std_norm
                    and cfg.pre_norms):
                # attn_norm + activation-quant + qkv GEMM in one kernel
                qd, kvd = plan.q_dim_p // tp_size, plan.kv_dim_p // tp_size
                spec_qkv = TernarySpec(
                    cfg.d_model, qd + 2 * kvd, cfg.weight_fmt, specs["wq"].kb
                )
                from vlut_tpu.ops.matmul import ternary_matmul_fused

                qkv = ternary_matmul_fused(
                    x, _layer_tensor(lp, "wqkv", spec_qkv),
                    mode="norm", norm_g=norm_gain(lp["attn_norm"]),
                    norm_n=cfg.d_model, eps=cfg.rms_eps, impl=impl,
                )
                q = qkv[..., :qd]
                k = qkv[..., qd : qd + kvd]
                v = qkv[..., qd + kvd :]
                h_attn = None  # never materialized on the fused path
            elif "wqkv" in lp:
                h_attn = h = (
                    norm_d(x, lp, "attn_norm") if cfg.pre_norms else x
                )
                qd, kvd = plan.q_dim_p // tp_size, plan.kv_dim_p // tp_size
                spec_qkv = TernarySpec(
                    cfg.d_model, qd + 2 * kvd, cfg.weight_fmt, specs["wq"].kb
                )
                qkv = mm(h, _layer_tensor(lp, "wqkv", spec_qkv))
                q = qkv[..., :qd]
                k = qkv[..., qd : qd + kvd]
                v = qkv[..., qd + kvd :]
            else:
                h_attn = h = (
                    norm_d(x, lp, "attn_norm") if cfg.pre_norms else x
                )
                q = proj(h, lp, "wq")
                k = proj(h, lp, "wk")
                v = proj(h, lp, "wv")
            if cfg.qkv_bias and "bq" in lp:
                # bias tensors may be absent even when the config flag is
                # on (HF checkpoints omit default-valued tensors)
                q = q + lp["bq"].astype(q.dtype)
                k = k + lp["bk"].astype(k.dtype)
                v = v + lp["bv"].astype(v.dtype)
            # head counts derived from the projection widths so
            # per-layer-head archs (openelm/deci/mimo2) work unchanged
            q = q.reshape(b, t, q.shape[-1] // hd_p, hd_p)
            k = k.reshape(b, t, k.shape[-1] // hd_p, hd_p)
            v = v.reshape(b, t, v.shape[-1] // hd_p, hd_p)
            def qk_norm_fn(q, k):
                if cfg.qk_norm_type == "ln":
                    # chameleon: per-head LayerNorm, stats over head_dim,
                    # per-head (H, hd_p) gains+biases (scattered layout),
                    # FIXED eps 1e-5 (ChameleonLayerNorm hardcodes it)
                    from vlut_tpu.models.dims import head_positions

                    vmask = jnp.zeros((plan.hd_p,), jnp.float32).at[
                        head_positions(plan.hd, plan.hd_p)
                    ].set(1.0)

                    def ln_h(z, w, b_):
                        zf = z.astype(jnp.float32)
                        cnt = jnp.float32(plan.hd)
                        mu = zf.sum(-1, keepdims=True) / cnt
                        zc = (zf - mu) * vmask
                        var = (zc * zc).sum(-1, keepdims=True) / cnt
                        return (zc * jax.lax.rsqrt(var + 1e-5)
                                * w[None, None]
                                + b_[None, None]) * vmask
                    q = ln_h(q, lp["q_norm"], lp["q_norm_b"])
                    k = ln_h(k, lp["k_norm"], lp["k_norm_b"])
                    return q.astype(x.dtype), k.astype(x.dtype)
                if cfg.qk_norm_scope == "whole":
                    # olmo2: ONE RMSNorm over the flattened heads*head_dim
                    # vector (weights padded per head at convert; pads are
                    # zero in q/k so logical-count stats stay exact)
                    q = _rms_whole(q, lp["q_norm"], cfg.rms_eps,
                                   cfg.n_heads * plan.hd)
                    k = _rms_whole(k, lp["k_norm"], cfg.rms_eps,
                                   cfg.n_kv_heads * plan.hd)
                else:
                    # per-head RMSNorm over the head dim (qwen3/gemma3)
                    q = _rms(q, lp["q_norm"], cfg.rms_eps, plan.hd,
                             plus_one=p1)
                    k = _rms(k, lp["k_norm"], cfg.rms_eps, plan.hd,
                             plus_one=p1)
                return q, k

            if cfg.qk_norm and not cfg.qk_norm_post_rope:
                q, k = qk_norm_fn(q, k)
            if cfg.qkv_clamp:
                # dbrx/olmo/olmoe clip_qkv (llm_build_dbrx clamp);
                # elementwise, so post-reshape == pre-reshape for the
                # norm-free archs, and olmoe norms THEN clamps
                c_ = cfg.qkv_clamp
                q = jnp.clip(q, -c_, c_)
                k = jnp.clip(k, -c_, c_)
                v = jnp.clip(v, -c_, c_)
            loc = (window > 0) if cfg.rope_theta_local else None
            q = rope_fn(q, safe_pos, r_on, loc)
            k = rope_fn(k, safe_pos, r_on, loc)
            if cfg.qk_norm and cfg.qk_norm_post_rope:
                if cfg.qk_norm_type == "l2":
                    # llama4 Llama4TextL2Norm: WEIGHTLESS per-head rms,
                    # post-rope, applied only on rope layers (reference
                    # src/models/llama-iswa.cpp:86-92)
                    def l2n(z):
                        zf = z.astype(jnp.float32)
                        ss = (zf * zf).sum(-1, keepdims=True) / plan.hd
                        return (zf * jax.lax.rsqrt(ss + cfg.rms_eps)
                                ).astype(z.dtype)
                    on_ = (r_on > 0)
                    q = jnp.where(on_, l2n(q), q)
                    k = jnp.where(on_, l2n(k), k)
                else:
                    # hunyuan-v1 ordering: rope first, per-head RMSNorm
                    # second (HunYuanMoEV1Attention.forward)
                    q, k = qk_norm_fn(q, k)
            if cfg.attn_temp_scale:
                # llama4 attention temperature tuning on NoPE layers only
                # (llm_graph_input_attn_temp, src/llama-graph.cpp:74-82)
                tf = jnp.log(jnp.floor(
                    (safe_pos.astype(jnp.float32) + cfg.attn_temp_offset)
                    / cfg.attn_temp_floor
                ) + 1.0) * cfg.attn_temp_scale + 1.0
                q = q * jnp.where(
                    r_on > 0, 1.0, tf[..., None, None]
                ).astype(q.dtype)

            att_fused = None
            k_sc = v_sc = None   # int8-KV deferred scales (quant_kv)
            if use_cache:
                fused_attn_ok = (
                    t == 1
                    and isinstance(kvio, _SlotKV)
                    and impl in ("auto", "pallas")
                    and jax.default_backend() == "tpu"
                    # bf16 cache: default OFF — drift-proof interleaved
                    # A/B (6 reps, scripts/exp_ab_interleave.py) measured
                    # the fused kernel at 6.00 ms/step vs 5.52 composed at
                    # 8B np=32 — XLA's attention+write pipeline already
                    # runs near achievable bandwidth.  Kept for long S.
                    # int8 cache: the kernel streams codes at half the
                    # bf16 bytes where the composed path materializes f32
                    # copies (9.14 ms vs 5.52 bf16, PERF.md round-4).
                    # Default OFF until the on-chip A/B lands: Mosaic
                    # rejected the (B, S, Hkv) scale-plane WRITE pattern
                    # in round 4 (the reason _put_pair uses DUS for
                    # scales), and this kernel's scale-row stores share
                    # that shape — flip VLUT_TPU_FUSED_ATTN_INT8=1 after
                    # tests/test_hardware_tpu.py::
                    # test_int8_decode_attention_on_chip passes
                    and (
                        os.environ.get(
                            "VLUT_TPU_FUSED_ATTN_INT8", "0") == "1"
                        if quant_kv
                        else os.environ.get(
                            "VLUT_TPU_FUSED_ATTN", "0") == "1"
                    )
                    # Mosaic block constraint: the kernel blocks on the
                    # trailing head dim, which must be 128-aligned (same
                    # rule enforced for the Pallas KV writes below); models
                    # with hd/hdv of 64/80/96 silently use the composed
                    # path instead of crashing lowering (ADVICE r4)
                    and q.shape[-1] % 128 == 0
                    and v.shape[-1] % 128 == 0
                    and not _ABLATE()
                    and alibi is None
                    and not cfg.attn_sinks
                    and not cfg.attn_logit_softcap
                    and cfg.swa_type != "chunked"
                    and cfg.causal_attn
                    and attn_mask is None
                )
                if fused_attn_ok:
                    att_fused = kvio.fused_attend(
                        q, k, v, write_start, window,
                        cfg.attn_scale or 1.0 / float(np.sqrt(plan.hd)),
                    )
                    k_all = v_all = None
                elif "no_kv_write" in _ABLATE():
                    res = kvio.peek(raw=quant_kv)
                    if quant_kv:
                        k_all, v_all, k_sc, v_sc = res
                    else:
                        k_all, v_all = res
                else:
                    res = kvio.update(k, v, write_start, raw=True) \
                        if quant_kv else kvio.update(k, v, write_start)
                    if quant_kv:
                        k_all, v_all, k_sc, v_sc = res
                    else:
                        k_all, v_all = res
            ring_att = None
            if not use_cache and sp_axis is not None:
                if attn_mask is None:
                    # ring/blockwise context parallel: KV stays sharded
                    # (per-device KV memory scales 1/sp); blocks rotate by
                    # ppermute with an online-softmax merge
                    ring_att = _ring_attention(
                        q, k, v, safe_pos, positions, plan.hd, sp_axis,
                        scale=cfg.attn_scale,
                        softcap=cfg.attn_logit_softcap, window=window,
                        alibi=alibi,
                        sinks=lp["sinks"] if cfg.attn_sinks else None,
                        chunked_window=cfg.swa_type == "chunked",
                        causal=cfg.causal_attn,
                    )
                    k_all, v_all = k, v  # unused
                else:
                    # explicit (B, T, S-global) mask overrides need the
                    # full context on-device: gathered-KV fallback
                    k_all = jax.lax.all_gather(k, sp_axis, axis=1,
                                               tiled=True)
                    v_all = jax.lax.all_gather(v, sp_axis, axis=1,
                                               tiled=True)
            elif not use_cache:
                k_all, v_all = k, v

            if att_fused is not None:
                att = att_fused
            elif "no_attn" in _ABLATE():
                # perf-ablation only (VLUT_ABLATE): bypass attention to
                # isolate its share; output shape/dtype match _attention
                att = q.astype(jnp.float32)
            elif ring_att is not None:
                att = ring_att
            else:
                att = _attention(
                    q, k_all, v_all, safe_pos, k_pos_row, plan.hd,
                    scale=cfg.attn_scale, softcap=cfg.attn_logit_softcap,
                    window=window, mask_override=attn_mask,
                    alibi=alibi,
                    sinks=lp["sinks"] if cfg.attn_sinks else None,
                    chunked_window=cfg.swa_type == "chunked",
                    causal=cfg.causal_attn,
                    k_scale=k_sc, v_scale=v_sc,
                )
        par = cfg.parallel_residual
        attn_out = None
        if has_attn:
            if cfg.attn_gate and "w_attn_gate" in lp:
                # afmoe attention output gate (src/models/afmoe.cpp):
                # gate = w_attn_gate @ attn-normed input, and the
                # PRE-o_proj attention output is scaled by sigmoid(gate)
                assert h_attn is not None, (
                    "attn_gate requires the unfused qkv path"
                )
                g = proj(h_attn, lp, "w_attn_gate")
                att = att.reshape(b, t, -1).astype(jnp.float32) * (
                    jax.nn.sigmoid(g.astype(jnp.float32))
                )
            # chunk-pad into the wo packed-K layout (no-op when chunk == chunk_p)
            plan_l = _dyn["plan"]
            chunks_l = plan_l.tp_pack // tp_size
            att = att.reshape(b, t, chunks_l, plan_l.wo_chunk)
            if plan_l.wo_chunk_p != plan_l.wo_chunk:
                att = jnp.pad(
                    att,
                    ((0, 0), (0, 0), (0, 0), (0, plan_l.wo_chunk_p - plan_l.wo_chunk)),
                )
            att = att.reshape(b, t, chunks_l * plan_l.wo_chunk_p)
            if (
                can_fuse(lp, "wo") and tp_axis is None and not cfg.post_norms
                and not par and not cfg.proj_bias
            ):
                # [attn_sub_norm] + quant + wo GEMM + residual in one kernel
                from vlut_tpu.ops.matmul import ternary_matmul_fused

                x = ternary_matmul_fused(
                    att, _layer_tensor(lp, "wo", _dyn["specs"]["wo"]),
                    mode="norm" if cfg.use_subnorms else "plain",
                    norm_g=lp.get("attn_sub_norm"),
                    norm_n=cfg.n_heads * plan.hd, eps=cfg.rms_eps,
                    residual=x, impl=impl, out_dtype=x.dtype,
                )
            else:
                if cfg.use_subnorms:
                    att = _rms(
                        att, lp["attn_sub_norm"], cfg.rms_eps,
                        cfg.n_heads * plan.hd, tp_axis,
                    )
                o = proj(att, lp, "wo", reduce=True)
                if cfg.proj_bias and "bo" in lp:
                    o = o + lp["bo"].astype(o.dtype)
                if cfg.post_norms:
                    o = _rms(o, lp["post_attn_norm"], cfg.rms_eps, cfg.d_model,
                             plus_one=p1)
                if par:
                    # gptneox/phi-2/cohere: the FFN branches off the SAME layer
                    # input; both branch outputs add to the residual at the end
                    attn_out = o
                else:
                    x = x + o.astype(x.dtype)

        ffn_fused = (
            not cfg.n_experts
            and "w_gateup" in lp
            and can_fuse(lp, "w_gateup")
            and can_fuse(lp, "w_down")
            and cfg.act_fn == "silu"
            and tp_axis is None
            and not cfg.post_norms
            and std_norm
            and cfg.pre_norms
            and not cfg.swiglu_limit
            and not par
            and not cfg.proj_bias
        )
        if ffn_fused:
            # kernel 1: ffn_norm + quant + gate/up GEMM
            # kernel 2: silu*up [+ ffn_sub_norm] + quant + down GEMM + resid
            from vlut_tpu.ops.matmul import ternary_matmul_fused

            ffl = plan.ff_p // tp_size
            spec_gu = TernarySpec(
                cfg.d_model, 2 * ffl, cfg.weight_fmt, specs["w_down"].kb
            )
            gu = ternary_matmul_fused(
                x, _layer_tensor(lp, "w_gateup", spec_gu),
                mode="norm", norm_g=norm_gain(lp["ffn_norm"]),
                norm_n=cfg.d_model, eps=cfg.rms_eps, impl=impl,
            )
            x = ternary_matmul_fused(
                gu[..., :ffl], _layer_tensor(lp, "w_down", specs["w_down"]),
                mode="silu_mul", x2=gu[..., ffl:],
                sub_norm=cfg.use_subnorms, norm_g=lp.get("ffn_sub_norm"),
                norm_n=cfg.d_ff, eps=cfg.rms_eps,
                residual=x, impl=impl, out_dtype=x.dtype,
            )
            if "cvector" in lp:
                x = x + lp["cvector"].astype(x.dtype)
            return x

        if par and "ffn_norm" not in lp:
            # single-norm parallel residual (phi-2/cohere): the FFN reads
            # the attention branch's normed input
            assert h_attn is not None, (
                "parallel_residual without ffn_norm requires the unfused "
                "qkv path (the fused kernel never materializes h)"
            )
            h = h_attn
        elif not cfg.pre_norms:
            # olmo2 norm-after-block: the FFN branch reads the raw
            # residual; post_ffn_norm normalizes its output below
            h = x
        else:
            h = norm_d(x, lp, "ffn_norm")

        act_f = {
            "silu": jax.nn.silu,
            # "gelu" = tanh approximation (gemma/phi-2 gelu_new /
            # starcoder2 gelu_pytorch_tanh); "gelu_exact" = erf form
            # (gptneox/pythia hidden_act="gelu")
            "gelu": lambda z: jax.nn.gelu(z, approximate=True),
            "gelu_exact": lambda z: jax.nn.gelu(z, approximate=False),
            "relu2": lambda z: jnp.square(jax.nn.relu(z)),  # nemotron
            "relu": jax.nn.relu,  # opt
            # apertus xIELU needs the per-layer alphas — handled inline in
            # the ungated-MLP branch, never through this table
            "xielu": lambda z: z,
        }[cfg.act_fn]

        def glu_combine(gate, up):
            """act(gate) * up, or the gpt-oss clamped swiglu when
            cfg.swiglu_limit is set: gate clamped to (-inf, limit], up to
            [-limit, limit], out = gate*sigmoid(1.702*gate) * (up + 1)
            (reference ggml_swiglu_oai, src/models/gpt-oss path)."""
            gate = gate.astype(jnp.float32)
            up = up.astype(jnp.float32)
            if cfg.swiglu_limit:
                lim = cfg.swiglu_limit
                gate = jnp.minimum(gate, lim)
                up = jnp.clip(up, -lim, lim)
                return gate * jax.nn.sigmoid(1.702 * gate) * (up + 1.0)
            return act_f(gate) * up

        def dense_ffn(hh, gate_t, up_t, down_t, bg=None, bu=None, bd=None):
            gate = mm(hh, gate_t)
            up = mm(hh, up_t)
            if bg is not None:
                gate = gate + bg.astype(gate.dtype)
                up = up + bu.astype(up.dtype)
            a = glu_combine(gate, up)
            a = a.astype(x.dtype)
            if cfg.use_subnorms:
                a = _rms(a, lp["ffn_sub_norm"], cfg.rms_eps, cfg.d_ff,
                         tp_axis)
            out = mm(a, down_t)
            if bd is not None:
                out = out + bd.astype(out.dtype)
            return out

        # heterogeneous deepseek stacks: layers [0, first_k_dense) carry a
        # plain dense FFN (no router) — structural dispatch on the layer
        # dict, static under jit (tuple-layers path only)
        moe_here = cfg.n_experts and "router" in lp
        if moe_here:
            h_res = h
            if cfg.moe_parallel == "arctic":
                # arctic: the routed branch reads a SEPARATE norm of the
                # LAYER INPUT (ffn_norm_exps on inpSA); h_res keeps the
                # ffn-normed input for the residual_mlp dense branch
                # (src/models/arctic.cpp:93-97)
                h = norm_d(x_in, lp, "moe_norm")
            # MoE (build_moe_ffn analog, src/llama-graph.cpp:1045): router
            # top-k combine.  Every expert's packed weights stream through
            # the ternary matmul via an expert scan — static shapes, no
            # gather/capacity machinery; optimal when tokens*k >= n_experts
            # (the serving regime), and the weights are 2 bpw so a full
            # sweep costs 1/8th of a bf16 MoE's bandwidth.
            r_in = (
                x_in if cfg.moe_router_input == "layer_input" else h
            )  # smallthinker routes on the RAW layer input
            r_logits = jnp.einsum(
                "btd,de->bte", r_in.astype(jnp.float32),
                lp["router"].astype(jnp.float32),
            )
            if "router_b" in lp:
                # true router linear bias (gpt-oss) — enters the LOGITS,
                # unlike deepseek's selection-only e_score_correction_bias
                r_logits = r_logits + lp["router_b"].astype(jnp.float32)
            k_used = cfg.n_experts_used
            if cfg.moe_score == "sigmoid":  # deepseek V3
                scores = jax.nn.sigmoid(r_logits)
            else:
                scores = jax.nn.softmax(r_logits, axis=-1)
            # e_score_correction_bias biases SELECTION only, never the
            # combine weights (deepseek V3 noaux_tc)
            sel = scores
            if "router_bias" in lp:
                sel = sel + lp["router_bias"].astype(jnp.float32)
            if cfg.n_expert_groups:
                # grouped routing: keep topk_groups groups ranked by the
                # sum of each group's top-2 selection scores
                G = cfg.n_expert_groups
                sel_g = sel.reshape(b, t, G, -1)
                g_rank = jax.lax.top_k(sel_g, 2)[0].sum(-1)  # (B, T, G)
                top_g = jax.lax.top_k(g_rank, cfg.topk_groups)[1]
                gmask = jnp.sum(
                    jax.nn.one_hot(top_g, G, dtype=jnp.float32), axis=-2
                ) > 0  # (B, T, G)
                # masked groups zero out rather than -inf (matching the
                # deepseek/HF masked_fill(0.0): a masked expert can still
                # win when every unmasked selection score is negative)
                sel = jnp.where(
                    jnp.repeat(gmask, sel.shape[-1] // G, axis=-1),
                    sel, 0.0,
                )
            top_idx = jax.lax.top_k(sel, k_used)[1]
            top_w = jnp.take_along_axis(scores, top_idx, axis=-1)
            if cfg.moe_norm_topk:
                # == softmax over top-k logits in the softmax-score case
                top_w = top_w / (
                    jnp.sum(top_w, axis=-1, keepdims=True) + 1e-20
                )
            if cfg.routed_scale != 1.0:
                top_w = top_w * cfg.routed_scale
            # dense (B, T, E) combine weights
            comb = jnp.zeros_like(r_logits)
            comb = jax.vmap(
                lambda c, i, w: c.at[jnp.arange(t)[:, None], i].add(w)
            )(comb, top_idx, top_w)
            if ep_axis is not None:
                # expert parallel: this shard holds E/ep experts; keep its
                # combine-weight slice, psum the partial outputs below
                e_local = cfg.n_experts // ep_size
                off = jax.lax.axis_index(ep_axis) * e_local
                comb = jax.lax.dynamic_slice_in_dim(
                    comb, off, e_local, axis=2
                )

            dense_experts = "dense" in lp["w_gate"]
            # gpt-oss per-expert projection biases ((E, ff_p)/(E, D) stacks
            # riding the expert scan alongside the weights)
            e_bias = cfg.moe_expert_bias and "eb_gate" in lp

            def expert_step(acc, exs):
                bg = bu = bd = None
                if e_bias:
                    *exs, bg, bu, bd = exs
                if dense_experts:
                    gt, ut, dt, w_e = exs
                else:
                    gp, gs, up_, us, dp, ds, w_e = exs
                    gt = TernaryTensor(gp, gs, specs["w_gate"].k,
                                       specs["w_gate"].n,
                                       specs["w_gate"].fmt,
                                       specs["w_gate"].kb)
                    ut = TernaryTensor(up_, us, specs["w_up"].k,
                                       specs["w_up"].n, specs["w_up"].fmt,
                                       specs["w_up"].kb)
                    dt = TernaryTensor(dp, ds, specs["w_down"].k,
                                       specs["w_down"].n,
                                       specs["w_down"].fmt,
                                       specs["w_down"].kb)
                if cfg.moe_weight_before:
                    # llama4: the (sigmoid) router weight scales the expert
                    # INPUT (build_moe_ffn weight_before_ffn,
                    # src/llama-graph.cpp:1092-1097)
                    h_e = (h.astype(jnp.float32)
                           * w_e[..., None]).astype(h.dtype)
                    out_e = dense_ffn(h_e, gt, ut, dt, bg=bg, bu=bu, bd=bd)
                    return acc + out_e.astype(jnp.float32), None
                out_e = dense_ffn(h, gt, ut, dt, bg=bg, bu=bu, bd=bd)
                return acc + w_e[..., None] * out_e.astype(jnp.float32), None

            comb_e = jnp.moveaxis(comb, -1, 0)  # (E, B, T)
            if dense_experts:
                exs = (lp["w_gate"]["dense"], lp["w_up"]["dense"],
                       lp["w_down"]["dense"], comb_e)
            else:
                exs = (
                    lp["w_gate"]["packed"], lp["w_gate"]["scale"],
                    lp["w_up"]["packed"], lp["w_up"]["scale"],
                    lp["w_down"]["packed"], lp["w_down"]["scale"],
                    comb_e,
                )
            if e_bias:
                exs = (*exs, lp["eb_gate"], lp["eb_up"], lp["eb_down"])
            dn, _ = jax.lax.scan(
                expert_step, jnp.zeros((b, t, x.shape[-1]), jnp.float32), exs
            )
            if ep_axis is not None:
                dn = jax.lax.psum(dn, ep_axis)
            if cfg.moe_chunk_experts and "w_ch_gate" in lp:
                # grovemoe adjugate experts (src/models/grovemoe.cpp):
                # a second top-k pass over the SAME router logits, expert
                # id -> id // group, combine weight = softmax probs at the
                # CHUNK id (build_moe_ffn GROVEMOE id-division), top-k
                # renormalized; input is the routed OUTPUT, result added
                # scaled by expert_group_scale
                ch = cfg.moe_chunk_experts
                group = cfg.n_experts // ch
                k_ch = min(k_used, ch)
                idx_ch = jax.lax.top_k(r_logits, k_ch)[1] // group
                w_ch = jnp.take_along_axis(scores, idx_ch, axis=-1)
                w_ch = w_ch / (jnp.sum(w_ch, axis=-1, keepdims=True)
                               + 1e-20)
                comb_ch = jnp.zeros(r_logits.shape[:2] + (ch,),
                                    jnp.float32)
                comb_ch = jax.vmap(
                    lambda c, i, w: c.at[jnp.arange(t)[:, None], i].add(w)
                )(comb_ch, idx_ch, w_ch)
                h_ch = dn.astype(x.dtype)
                ch_dense = "dense" in lp["w_ch_gate"]

                def chunk_step(acc, exs):
                    if ch_dense:
                        gt, ut, dt, w_e = exs
                    else:
                        gp, gs, up_, us, dp, ds, w_e = exs
                        sc_ = specs_chunk
                        gt = TernaryTensor(gp, gs, sc_["w_gate"].k,
                                           sc_["w_gate"].n,
                                           sc_["w_gate"].fmt,
                                           sc_["w_gate"].kb)
                        ut = TernaryTensor(up_, us, sc_["w_up"].k,
                                           sc_["w_up"].n, sc_["w_up"].fmt,
                                           sc_["w_up"].kb)
                        dt = TernaryTensor(dp, ds, sc_["w_down"].k,
                                           sc_["w_down"].n,
                                           sc_["w_down"].fmt,
                                           sc_["w_down"].kb)
                    out_e = dense_ffn(h_ch, gt, ut, dt)
                    return (acc + w_e[..., None]
                            * out_e.astype(jnp.float32), None)

                comb_che = jnp.moveaxis(comb_ch, -1, 0)
                if ch_dense:
                    exs_c = (lp["w_ch_gate"]["dense"],
                             lp["w_ch_up"]["dense"],
                             lp["w_ch_down"]["dense"], comb_che)
                else:
                    exs_c = (
                        lp["w_ch_gate"]["packed"], lp["w_ch_gate"]["scale"],
                        lp["w_ch_up"]["packed"], lp["w_ch_up"]["scale"],
                        lp["w_ch_down"]["packed"], lp["w_ch_down"]["scale"],
                        comb_che,
                    )
                ch_out, _ = jax.lax.scan(
                    chunk_step,
                    jnp.zeros((b, t, x.shape[-1]), jnp.float32), exs_c,
                )
                dn = dn + cfg.moe_chunk_scale * ch_out
            if "w_shared_gate" in lp:
                # always-on shared expert: a plain gated FFN added to the
                # routed output (deepseek: width n_shared * moe_d_ff;
                # qwen2-moe: shared_expert_intermediate_size, scaled by a
                # learned sigmoid gate)
                sh = dense_ffn(
                    h,
                    _layer_tensor(lp, "w_shared_gate", specs_shared),
                    _layer_tensor(lp, "w_shared_up", specs_shared),
                    _layer_tensor(lp, "w_shared_down", specs_shared_dn),
                ).astype(jnp.float32)
                if "shared_gate" in lp:
                    # qwen2-moe shared_expert_gate: sigmoid(x @ w) in (0,1)
                    g_sh = jax.nn.sigmoid(jnp.einsum(
                        "btd,d->bt", h.astype(jnp.float32),
                        lp["shared_gate"].astype(jnp.float32),
                    ))
                    sh = sh * g_sh[..., None]
                dn = dn + sh
            if cfg.moe_parallel == "arctic":
                # residual_mlp rides the standard ffn-normed input; its
                # output joins the residual BEFORE the routed output
                # (out = moe + (ffn_inp + dense), src/models/arctic.cpp)
                res_out = dense_ffn(
                    h_res,
                    _layer_tensor(lp, "w_res_gate", specs_dense["w_gate"]),
                    _layer_tensor(lp, "w_res_up", specs_dense["w_up"]),
                    _layer_tensor(lp, "w_res_down", specs_dense["w_down"]),
                )
                if tp_axis is not None:
                    res_out = jax.lax.psum(res_out, tp_axis)
                x = x + res_out.astype(x.dtype)
            dn = dn.astype(x.dtype)
            dn_reduced = False  # expert partials still need the psum
        else:
            dn_reduced = True  # w_down combines inside proj (bit-exact)
            if cfg.n_experts and not moe_here:
                # deepseek first_k_dense layer: dense FFN at d_ff_dense
                gate = mm(h, _layer_tensor(
                    lp, "w_gate", specs_dense["w_gate"]))
                up = mm(h, _layer_tensor(lp, "w_up", specs_dense["w_up"]))
                a = glu_combine(gate, up)
                a = a.astype(x.dtype)
                dn = mm(a, _layer_tensor(lp, "w_down",
                                         specs_dense["w_down"]),
                        reduce=True)
            elif not cfg.ffn_gated:
                # classic MLP (gptneox/phi-2/starcoder2): up -> act -> down
                up = proj(h, lp, "w_up")
                if cfg.proj_bias and "b_up" in lp:
                    up = up + lp["b_up"].astype(up.dtype)
                if cfg.act_fn == "xielu":
                    # apertus xIELU (arXiv:2411.13010), learned per-layer
                    # alphas stored softplus-inverse (XIELUActivation)
                    upf = up.astype(jnp.float32)
                    ap = jax.nn.softplus(
                        lp["xielu_ap"].astype(jnp.float32))
                    an = 0.5 + jax.nn.softplus(
                        lp["xielu_an"].astype(jnp.float32))
                    a = jnp.where(
                        upf > 0,
                        ap * upf * upf + 0.5 * upf,
                        (jnp.expm1(jnp.minimum(upf, -1e-6)) - upf) * an
                        + 0.5 * upf,
                    )
                else:
                    a = act_f(up.astype(jnp.float32))
                a = a.astype(x.dtype)
                if cfg.use_subnorms:
                    a = _rms(a, lp["ffn_sub_norm"], cfg.rms_eps, cfg.d_ff,
                             tp_axis)
                dn = proj(a, lp, "w_down", reduce=True)
            else:
                if "w_gateup" in lp:
                    ffl = plan.ff_p // tp_size
                    spec_gu = TernarySpec(
                        cfg.d_model, 2 * ffl, cfg.weight_fmt,
                        specs["w_down"].kb,
                    )
                    gu = mm(h, _layer_tensor(lp, "w_gateup", spec_gu))
                    gate, up = gu[..., :ffl], gu[..., ffl:]
                else:
                    gate = proj(h, lp, "w_gate")
                    up = proj(h, lp, "w_up")
                    if cfg.proj_bias and "b_gate" in lp:
                        gate = gate + lp["b_gate"].astype(gate.dtype)
                    if cfg.proj_bias and "b_up" in lp:
                        up = up + lp["b_up"].astype(up.dtype)
                a = glu_combine(gate, up)
                a = a.astype(x.dtype)
                if cfg.use_subnorms:
                    a = _rms(a, lp["ffn_sub_norm"], cfg.rms_eps, cfg.d_ff,
                             tp_axis)
                dn = proj(a, lp, "w_down", reduce=True)
        if (tp_axis is not None and not dn_reduced
                and tp_axis != ep_axis):
            # when experts ride the SAME mesh axis as tp (engine MoE
            # serving), the expert-combine psum above already reduced it
            dn = jax.lax.psum(dn, tp_axis)
        if cfg.proj_bias and "b_down" in lp:
            dn = dn + lp["b_down"].astype(dn.dtype)
        if cfg.post_norms:
            dn = _rms(dn, lp["post_ffn_norm"], cfg.rms_eps, cfg.d_model,
                      plus_one=p1)
        if par:
            x = x + attn_out.astype(x.dtype) + dn.astype(x.dtype)
        else:
            x = x + dn.astype(x.dtype)
        if "cvector" in lp:
            # control-vector steering (llama-adapter.cpp cvector)
            x = x + lp["cvector"].astype(x.dtype)
        return x

    if isinstance(layers, (list, tuple)):
        # unrolled layer loop (unstack_layers): weights live in their own
        # HBM buffers so the GEMMs stream them directly — a lax.scan over
        # stacked weights dynamic-slices ~64 MB per layer into a temp
        # buffer first, tripling weight traffic (measured 0.55 -> 0.19
        # ms/layer on v5e).  The KV cache is a dict of per-layer array
        # TUPLES (kv_cache.new_cache layout="layers"): each layer updates
        # its own buffer in place.  A stacked cache passed here is split
        # once (and returned layered — callers that unroll should create
        # layered caches to avoid the split copy).
        kv_state = None
        if use_cache:
            from vlut_tpu.runtime.kv_cache import to_layered

            kv_state = to_layered(kv)
        hetero = cfg.heads_per_layer or cfg.d_ff_per_layer
        for i, lp in enumerate(layers):
            if hetero:
                # per-layer head counts / FFN widths (openelm/deci/mimo2/
                # plamo3): swap in this layer's spec table + dim plan
                import dataclasses as _dc

                hp = (cfg.heads_per_layer[i] if cfg.heads_per_layer
                      else (cfg.n_heads, cfg.n_kv_heads))
                ffi = (cfg.d_ff_per_layer[i] if cfg.d_ff_per_layer
                       else cfg.d_ff)
                cfg_l = _dc.replace(
                    cfg, n_heads=max(hp[0], 1),
                    n_kv_heads=max(hp[1] or hp[0], 1), d_ff=max(ffi, 1),
                    heads_per_layer=None, d_ff_per_layer=None,
                )
                _dyn["plan"] = make_plan(cfg_l)
                _dyn["specs"] = weight_specs(
                    cfg_l, tp=tp_size, plan=_dyn["plan"]
                )
                if "w_lin_attn" in lp:
                    # deci replace_with_linear layer: the per-layer cfg
                    # swap drops heads_per_layer, so re-add its spec here
                    _dyn["specs"]["w_lin_attn"] = TernarySpec(
                        cfg.d_model, cfg.d_model, cfg.weight_fmt,
                        _dyn["plan"].kb,
                    )
            kvio = _SlotKV(kv_state, i) if use_cache else None
            x = layer_step(x, (lp, kvio, layer_window[i], rope_on[i]))
            if deepstack_embeds is not None and i < len(deepstack_embeds):
                # qwen3vl DeepStack: visual features join the EARLY
                # hidden states (one merger output per index)
                x = x + deepstack_embeds[i].astype(x.dtype)
        if hetero:
            _dyn["plan"], _dyn["specs"] = plan, specs
        return x, kv_state

    if use_cache:
        from vlut_tpu.runtime.kv_cache import to_stacked

        kv = to_stacked(kv)  # scan needs the stacked layout
        if quant_kv:
            def scan_body(x, xs):
                lp, kc, vc, ksc, vsc, window, r_on = xs
                kvio = _LayerKV(kc, vc, ksc, vsc)
                x = layer_step(x, (lp, kvio, window, r_on))
                return x, (kvio.kc, kvio.vc, kvio.ksc, kvio.vsc)

            xs = (layers, kv["k"], kv["v"], kv["k_scale"], kv["v_scale"],
                  layer_window, rope_on)
            x, (new_k, new_v, new_ks, new_vs) = jax.lax.scan(
                scan_body, x, xs
            )
            return x, {"k": new_k, "v": new_v, "k_scale": new_ks,
                       "v_scale": new_vs}

        ds = _deepstack_scan_xs(
            deepstack_embeds, layer_window.shape[0], x)

        def scan_body(x, xs):
            lp, kc, vc, window, r_on, ds_l = xs
            kvio = _LayerKV(kc, vc, None, None)
            x = layer_step(x, (lp, kvio, window, r_on))
            x = x + ds_l.astype(x.dtype)
            return x, (kvio.kc, kvio.vc)

        xs = (layers, kv["k"], kv["v"], layer_window, rope_on, ds)
        x, (new_k, new_v) = jax.lax.scan(scan_body, x, xs)
        return x, {"k": new_k, "v": new_v}
    ds = _deepstack_scan_xs(deepstack_embeds, layer_window.shape[0], x)
    x, _ = jax.lax.scan(
        lambda c, xs_: (
            layer_step(c, (xs_[0], None, xs_[1], xs_[2]))
            + xs_[3].astype(c.dtype),
            None,
        ),
        x,
        (layers, layer_window, rope_on, ds),
    )
    return x, None


def _deepstack_scan_xs(deepstack_embeds, n_layers: int, x: jax.Array):
    """(L, B, T, D) scan input for the qwen3vl DeepStack adds: the given
    per-layer features zero-padded to the layer count (zeros for models
    without deepstack, so the add folds away)."""
    if deepstack_embeds is None:
        return jnp.zeros((n_layers, 1, 1, 1), x.dtype)
    ds = jnp.stack([e.astype(x.dtype) for e in deepstack_embeds])
    pad = n_layers - ds.shape[0]
    if pad > 0:
        ds = jnp.concatenate(
            [ds, jnp.zeros((pad,) + ds.shape[1:], x.dtype)], axis=0)
    return ds

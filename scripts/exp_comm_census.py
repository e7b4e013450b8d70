#!/usr/bin/env python
"""Flagship-shape comm census + predicted tp scaling (VERDICT r4 item 6/8).

The round-4 census ran at toy dims, so the >=85%-scaling story had no
quantitative basis.  This runs the ENGINE-style sharded forward at
llama3-8B dims (d=4096, 32/8 heads, ff=14336, vocab 128k) on the virtual
8-device CPU mesh at 2 and 4 layers, extracts the compiled-HLO collective
volumes, extrapolates per-layer bytes to 32 layers, and pairs the result
with a v5e ICI bandwidth model to predict dp x tp step-time overhead.

Modeled, not measured — this environment has ONE real chip.  The model:
ring all-reduce moves 2*(n-1)/n * bytes per chip; v5e ICI per-chip
bandwidth ~186 GB/s aggregate over the 2-D torus links (45 GB/s per
direction per link x 4 links, public v5e spec; the scaling-book numbers).
Compute-side per-chip time scales 1/tp from the measured single-chip
step (PERF.md: 5.52 ms at np=32 decode, 292 ms pp128x32 prefill).
"""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding  # noqa: E402

from vlut_tpu.config import ModelConfig  # noqa: E402
from vlut_tpu.models.transformer import init_params_fast  # noqa: E402
from vlut_tpu.parallel.census import (  # noqa: E402
    comm_census,
    format_census,
    total_bytes,
)
from vlut_tpu.parallel.sharding import (  # noqa: E402
    cache_specs_for,
    make_mesh,
    param_specs,
)
from vlut_tpu.parallel.spmd import make_engine_forward  # noqa: E402

ICI_GBPS = 186.0      # per-chip aggregate, v5e 2-D torus (see docstring)
STEP_MS = {"decode_b32": 5.52, "prefill_pp128_b32": 292.0}


def census_at(nl: int, tp: int, dp: int, mode: str):
    cfg = ModelConfig(
        arch="llama", vocab_size=128256, d_model=4096, n_layers=nl,
        n_heads=32, n_kv_heads=8, d_ff=14336, max_seq_len=512,
        rope_theta=500000.0, tp_pack=8,
    )
    params = init_params_fast(cfg, seed=0)
    # UNROLLED layers (the engine's serving layout): a stacked tree runs
    # the layer stack as ONE lax.scan, whose body collectives appear once
    # in the static HLO regardless of trip count — the first cut of this
    # script under-counted per-layer psums that way
    from vlut_tpu.models.transformer import unstack_layers

    params = unstack_layers(params, cfg)
    mesh = make_mesh(dp=dp, tp=tp)
    if mode == "decode":
        b, t, s = 32, 1, 256
    else:
        b, t, s = 32, 128, 256
    from vlut_tpu.runtime import kv_cache as kvc

    cache = kvc.new_cache(
        cfg.n_layers, b, s, cfg.n_kv_heads, 128, jnp.bfloat16,
        layout="layers",
    )
    fwd = jax.jit(make_engine_forward(
        cfg, mesh, params, cache, impl="xla",
        batch_axis="dp" if b % dp == 0 else None,
    ))
    sp = jax.tree.map(
        lambda a, spec: jax.device_put(a, NamedSharding(mesh, spec)),
        params, param_specs(cfg, params),
        is_leaf=lambda x: not isinstance(x, (dict, tuple, list)),
    )
    sc = jax.tree.map(
        lambda a, spec: jax.device_put(a, NamedSharding(mesh, spec)),
        cache, cache_specs_for(cache),
    )
    tokens = jnp.zeros((b, t), jnp.int32)
    pos = jnp.tile(jnp.arange(t, dtype=jnp.int32), (b, 1)) + 17
    la = jnp.zeros((b,), jnp.int32)
    return comm_census(fwd, sp, sc, tokens, pos, la)


def main():
    results = {}
    for tp, dp in ((8, 1), (4, 2), (2, 4)):
        for mode, tag in (("decode", "decode_b32"),
                          ("prefill", "prefill_pp128_b32")):
            c2 = census_at(2, tp, dp, mode)
            c4 = census_at(4, tp, dp, mode)
            per_layer = (total_bytes(c4) - total_bytes(c2)) / 2
            const = total_bytes(c2) - 2 * per_layer
            b32 = per_layer * 32 + const
            n = tp  # the all-reduces ride the tp axis
            ring = 2 * (n - 1) / n if n > 1 else 0.0
            comm_ms = (b32 * ring / (ICI_GBPS * 1e9)) * 1e3
            comp_ms = STEP_MS[tag] / tp
            eff = comp_ms / (comp_ms + comm_ms) if tp > 1 else 1.0
            results[f"tp{tp}xdp{dp}:{tag}"] = {
                "bytes_32l": int(b32),
                "per_layer_bytes": int(per_layer),
                "census_4l": {k: v for k, v in c4.items()},
                "comm_ms_model": round(comm_ms, 3),
                "compute_ms_over_tp": round(comp_ms, 3),
                "pred_efficiency": round(eff, 4),
            }
            print(f"tp={tp} dp={dp} {tag}: 4-layer census "
                  f"[{format_census(c4)}] -> 32-layer {b32/1e6:.1f} MB, "
                  f"ring comm {comm_ms:.3f} ms vs compute/tp "
                  f"{comp_ms:.2f} ms -> predicted efficiency {eff:.1%}",
                  flush=True)
    out = pathlib.Path(__file__).parent.parent / "benchmarks" / \
        "COMM_CENSUS_8B.json"
    out.write_text(json.dumps(results, indent=1))
    print(f"wrote {out}")





def census_moe(nl: int, ep: int, mode: str):
    """Mixtral-8x7B-shaped MoE engine forward: experts sharded over the
    axis (attention replicated), per parallel/spmd.make_engine_forward's
    MoE branch."""
    cfg = ModelConfig(
        arch="llama", vocab_size=32000, d_model=4096, n_layers=nl,
        n_heads=32, n_kv_heads=8, d_ff=14336, max_seq_len=512,
        rope_theta=1e6, n_experts=8, n_experts_used=2, tp_pack=1,
    )
    params = init_params_fast(cfg, seed=0)
    from vlut_tpu.models.transformer import unstack_layers

    params = unstack_layers(params, cfg)
    mesh = make_mesh(dp=8 // ep, tp=ep)
    b, t, s = 32, (1 if mode == "decode" else 128), 256
    from vlut_tpu.runtime import kv_cache as kvc

    cache = kvc.new_cache(cfg.n_layers, b, s, cfg.n_kv_heads, 128,
                          jnp.bfloat16, layout="layers")
    fwd = jax.jit(make_engine_forward(
        cfg, mesh, params, cache, impl="xla",
        batch_axis="dp" if b % mesh.shape["dp"] == 0 else None,
    ))
    sp = jax.tree.map(
        lambda a, spec: jax.device_put(a, NamedSharding(mesh, spec)),
        params, param_specs(cfg, params),
        is_leaf=lambda x: not isinstance(x, (dict, tuple, list)),
    )
    sc = jax.tree.map(
        lambda a, spec: jax.device_put(a, NamedSharding(mesh, spec)),
        cache, cache_specs_for(cache, head_axis=None),
    )
    tokens = jnp.zeros((b, t), jnp.int32)
    pos = jnp.tile(jnp.arange(t, dtype=jnp.int32), (b, 1)) + 17
    la = jnp.zeros((b,), jnp.int32)
    return comm_census(fwd, sp, sc, tokens, pos, la)


def main_moe():
    print("\n--- MoE (mixtral-8x7B shapes, experts sharded) ---",
          flush=True)
    results = {}
    for ep in (2, 4, 8):
        for mode, comp_key in (("decode", "decode_b32"),
                               ("prefill", "prefill_pp128_b32")):
            c2 = census_moe(2, ep, mode)
            c4 = census_moe(4, ep, mode)
            per_layer = (total_bytes(c4) - total_bytes(c2)) / 2
            b32 = per_layer * 32 + (total_bytes(c2) - 2 * per_layer)
            ring = 2 * (ep - 1) / ep
            comm_ms = (b32 * ring / (ICI_GBPS * 1e9)) * 1e3
            # compute scales ~1/ep for the expert-dominated FLOPs;
            # attention replicates, so use a conservative 1/ep
            comp_ms = STEP_MS[comp_key] / ep
            eff = comp_ms / (comp_ms + comm_ms)
            results[f"ep{ep}:{comp_key}"] = {
                "bytes_32l": int(b32),
                "comm_ms_model": round(comm_ms, 3),
                "pred_efficiency": round(eff, 4),
            }
            print(f"ep={ep} {mode}: 4-layer [{format_census(c4)}] -> "
                  f"32-layer {b32/1e6:.1f} MB, comm {comm_ms:.3f} ms, "
                  f"pred eff {eff:.1%}", flush=True)
    out = pathlib.Path(__file__).parent.parent / "benchmarks" / \
        "COMM_CENSUS_8B.json"
    data = json.loads(out.read_text()) if out.exists() else {}
    data.update(results)
    out.write_text(json.dumps(data, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
    main_moe()

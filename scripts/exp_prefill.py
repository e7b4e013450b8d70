#!/usr/bin/env python
"""Prefill regression experiment (VERDICT r3 item 1).

Measures pp128 x32 prefill on the flagship shapes under:
  A. unrolled tuple-layers + word-packed (the bench's current path)
  B. unrolled tuple-layers, slab (non-word-packed) weights
  C. scan over stacked layers, slab weights (round-1's layout)
  D. scan over stacked layers + word-packed

Also times the setup phases (init_params_fast / quantize_head / fuse /
device_put / word_pack) to locate the 423 s cold-start (item 7).
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from vlut_tpu.config import PRESETS
from vlut_tpu.models.transformer import (
    forward,
    fuse_projections,
    init_kv_cache,
    init_params_fast,
    quantize_head,
    unstack_layers,
)

NP_SLOTS, PROMPT_LEN = 32, 128


def t(label, f):
    t0 = time.time()
    out = f()
    print(f"# {label}: {time.time()-t0:.1f}s", flush=True)
    return out


def time_prefill(label, params, cfg, max_len):
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(
        rng.integers(0, cfg.vocab_size, (NP_SLOTS, PROMPT_LEN)), jnp.int32
    )
    positions = jnp.tile(
        jnp.arange(PROMPT_LEN, dtype=jnp.int32), (NP_SLOTS, 1)
    )
    logits_at = jnp.full((NP_SLOTS,), PROMPT_LEN - 1, jnp.int32)
    layout = ("layers" if isinstance(params["layers"], (tuple, list))
              else "stacked")
    prefill = jax.jit(
        lambda p, c, tt, pos: forward(
            p, cfg, tt, pos, c, logits_at=logits_at)
    )

    def run():
        cache = init_kv_cache(
            cfg, NP_SLOTS, max_len=max_len, layout=layout)
        logits, cache = prefill(params, cache, tokens, positions)
        return logits

    float(jnp.sum(run()))  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        float(jnp.sum(run()))
        best = min(best, time.time() - t0)
    toks = NP_SLOTS * PROMPT_LEN / best
    print(f"## {label}: {best*1e3:.0f} ms = {toks:.0f} tok/s", flush=True)
    return best


def main():
    cfg = PRESETS["llama3_8b_158"]
    max_len = PROMPT_LEN + 56
    params = t("init_params_fast", lambda: init_params_fast(cfg, seed=0))
    params = t("quantize_head", lambda: quantize_head(params))
    params = t("fuse_projections", lambda: fuse_projections(params, cfg))
    stacked = t("device_put(stacked)", lambda: jax.device_put(params))

    # C: scan + slab
    time_prefill("C scan+slab", stacked, cfg, max_len)
    # D: scan + word-packed
    from vlut_tpu.ops.packing import word_pack_params

    stacked_wp = t("word_pack(stacked)",
                   lambda: word_pack_params(stacked, cfg.weight_fmt))
    time_prefill("D scan+word", stacked_wp, cfg, max_len)
    del stacked_wp

    unrolled = t("unstack_layers", lambda: unstack_layers(stacked, cfg))
    del stacked
    # B: unrolled + slab
    time_prefill("B unrolled+slab", unrolled, cfg, max_len)
    unrolled_wp = t("word_pack(unrolled)",
                    lambda: word_pack_params(unrolled, cfg.weight_fmt))
    del unrolled
    # A: unrolled + word-packed (bench path)
    time_prefill("A unrolled+word (bench)", unrolled_wp, cfg, max_len)


if __name__ == "__main__":
    main()

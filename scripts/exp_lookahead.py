#!/usr/bin/env python
"""Lookahead defaults from data (VERDICT r3 item 8, carried from r2).

Two measurements, combined:

1. ROUND COST at flagship 8B shapes (synthetic weights — cost does not
   depend on weight values): marginal round time for W in {4,8} x N in
   {2,3} over a long chained scan (n_lo=8 vs n_hi=40 rounds), 3 reps,
   plus plain b=1 decode as the baseline.
2. ACCEPTANCE on the trained tiny_real fixture over NATURAL text (a
   held-out prose paragraph) and code-ish text, same W/N grid: accepted
   drafts per round from the fn's accs output.

Effective 8B tok/s = (1 + acc) / round_time; the table picks the engine
defaults.
"""

import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

GRID = [(4, 2), (4, 3), (8, 2), (8, 3), (16, 2)]
N_LO, N_HI = 8, 40
REPS = 3
PROSE = (
    "The history of the lighthouse begins in the early nineteenth "
    "century, when the growing port required a reliable signal for "
    "ships approaching the harbor at night. The first tower was built "
    "of local stone, and the keeper lived in a small cottage beside "
    "it. Over the following decades the light was upgraded from oil "
    "lamps to gas and finally to electricity, and the tower itself "
    "was raised twice to clear the new buildings along the shore."
)


def measure_cost():
    import jax
    import jax.numpy as jnp

    from vlut_tpu.config import PRESETS
    from vlut_tpu.models.transformer import (
        forward,
        fuse_projections,
        init_kv_cache,
        init_params_fast,
        quantize_head,
        unstack_layers,
    )
    from vlut_tpu.runtime.speculative import make_lookahead_fn

    cfg = PRESETS[os.environ.get("VLUT_BENCH_PRESET", "llama3_8b_158")]
    t0 = time.time()
    params = init_params_fast(cfg, seed=0)
    params = quantize_head(params)
    params = jax.device_put(fuse_projections(params, cfg))
    if jax.default_backend() == "tpu":
        from vlut_tpu.ops.packing import word_pack_params

        params = word_pack_params(params, cfg.weight_fmt)
    params = unstack_layers(params, cfg)
    print(f"# params ready in {time.time()-t0:.1f}s", flush=True)

    rng = np.random.default_rng(0)
    t = 32
    ids = rng.integers(0, cfg.vocab_size, (1, t))
    max_len = 1024

    def prefill():
        cache = init_kv_cache(cfg, 1, max_len=max_len, layout="layers")
        lg, cache = forward(
            params, cfg, jnp.asarray(ids, jnp.int32),
            jnp.arange(t, dtype=jnp.int32)[None], cache,
            logits_at=jnp.asarray([t - 1], jnp.int32),
        )
        last = jnp.argmax(lg[:, 0, : cfg.vocab_size], -1).astype(jnp.int32)
        return cache, last

    rows = {}
    for w, n in [(0, 0)] + GRID:   # (0,0) = plain decode baseline
        times = {}
        for n_rounds in (N_LO, N_HI):
            if w == 0:
                from vlut_tpu.runtime.generate import make_generate_fn
                from vlut_tpu.runtime.sampling import (
                    SamplerParams, features_of, stack_params)

                sams = [SamplerParams(temperature=0.0)]
                fn0 = make_generate_fn(cfg, n_steps=n_rounds,
                                       features=features_of(sams))
                sp = stack_params(sams)
                key = jax.random.PRNGKey(0)

                def run(fn0=fn0, sp=sp, key=key):
                    cache, last = prefill()
                    from vlut_tpu.runtime.kv_cache import to_layered
                    toks, _ = fn0(params, cache, last,
                                  jnp.asarray([t], jnp.int32), sp, key)
                    int(jnp.sum(toks))
            else:
                max_new = n_rounds * (1 + (n - 1))  # upper bound budget
                fn = make_lookahead_fn(cfg, max_new=max_new, window=w,
                                       ngram=n)

                def run(fn=fn):
                    cache, last = prefill()
                    out, cnt, accs, _ = fn(
                        params, cache, last, jnp.asarray([t], jnp.int32))
                    int(jnp.sum(cnt))
            run()  # compile + warm
            best = None
            for _ in range(REPS):
                t0 = time.time()
                run()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            times[n_rounds] = best
        # marginal per round: lookahead fn runs max_new//(ngram-1)...
        # both configs scale linearly in their round count by design
        per = (times[N_HI] - times[N_LO]) / (N_HI - N_LO)
        rows[(w, n)] = per
        nm = "plain" if w == 0 else f"W={w} N={n}"
        print(f"# cost {nm:>9}: {per*1e3:.2f} ms/round", flush=True)
    return rows


def measure_acceptance():
    import jax
    import jax.numpy as jnp

    from vlut_tpu.convert.checkpoint import load_checkpoint
    from vlut_tpu.models.transformer import (
        forward, fuse_projections, init_kv_cache, unstack_layers)
    from vlut_tpu.runtime.speculative import make_lookahead_fn

    fx = pathlib.Path(__file__).resolve().parent.parent / (
        "tests/fixtures/tiny_real")
    cfg, params, _ = load_checkpoint(fx)
    params = jax.device_put(params)
    from vlut_tpu.models.transformer import quantize_head

    params = quantize_head(params)
    params = unstack_layers(fuse_projections(params, cfg), cfg)
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(str(fx))
    out = {}
    for name, text in (("prose", PROSE),
                       ("repeat", "the cat sat on the mat. " * 12)):
        ids = tok(text)["input_ids"][:48]
        t = len(ids)
        for w, n in GRID:
            fn = make_lookahead_fn(cfg, max_new=96, window=w, ngram=n)
            cache = init_kv_cache(cfg, 1, max_len=512, layout="layers")
            lg, cache = forward(
                params, cfg, jnp.asarray([ids], jnp.int32),
                jnp.arange(t, dtype=jnp.int32)[None], cache,
                logits_at=jnp.asarray([t - 1], jnp.int32),
            )
            last = jnp.argmax(lg[:, 0, : cfg.vocab_size], -1).astype(
                jnp.int32)
            _, cnt, accs, _ = fn(params, cache, last,
                                 jnp.asarray([t], jnp.int32))
            acc = np.asarray(accs)[:, 0]
            acc = acc[acc >= 0]
            out[(name, w, n)] = (float(acc.mean()) if acc.size else 0.0,
                                 int(acc.size))
            print(f"# acc {name:>6} W={w} N={n}: "
                  f"{out[(name, w, n)][0]:.2f} accepted/round over "
                  f"{acc.size} rounds", flush=True)
    return out


def main():
    cost = measure_cost()
    acc = measure_acceptance()
    print("\n# effective 8B b=1 tok/s = (1 + acc) / round_cost:")
    base = cost[(0, 0)]
    print(f"#   plain decode: {1.0/base:.0f} tok/s")
    for w, n in GRID:
        per = cost[(w, n)]
        for name in ("prose", "repeat"):
            a, rounds = acc[(name, w, n)]
            eff = (1.0 + a) / per
            print(f"#   W={w} N={n} {name:>6}: {eff:.0f} tok/s "
                  f"({a:.2f} acc, {per*1e3:.2f} ms/round)", flush=True)


if __name__ == "__main__":
    main()

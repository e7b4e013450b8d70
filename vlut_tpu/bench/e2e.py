"""End-to-end benchmark tools (reference: tools/llama-bench 2,258 LoC +
tools/batched-bench — the two entry points evaluation/ drives, SURVEY §6).

``bench_sweep``   — llama-bench analog: grid over (n_prompt, n_gen, batch),
                    reports prefill tok/s (pp) and decode tok/s (tg).
``batched_bench`` — batched-bench analog: (npp, ntg, npl) grid with shared
                    prompts, reports per-phase and total throughput.

Measurement protocol mirrors test-vlut-gemm's (SURVEY §2.4): jit warmup
excluded, then best-of-R timed runs fetched via a SCALAR READBACK (this
container's tunneled TPU returns from block_until_ready before execution
completes — only a value fetch is a reliable fence); decode loops run as
one lax.scan so host dispatch doesn't pollute tok/s.  Output formats:
md | csv | json (llama-bench.cpp:214).
"""

from __future__ import annotations

import json
import time
from typing import Any

import numpy as np


def _timeit(fn, repeats: int = 3) -> float:
    """Best-of-N seconds for fn() (fn must block on its result)."""
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def _load_model(model: str | None, preset: str | None, fmt: str):
    import dataclasses

    import jax

    from vlut_tpu.config import PRESETS

    from vlut_tpu.models.transformer import (
        fuse_projections,
        unstack_layers,
    )

    if model:
        from vlut_tpu.convert.checkpoint import load_checkpoint

        cfg, params, _ = load_checkpoint(model)
    else:
        from vlut_tpu.models.transformer import init_params_fast

        cfg = PRESETS[preset or "llama3_8b_158"]
        cfg = dataclasses.replace(cfg, weight_fmt=fmt)
        params = init_params_fast(cfg, seed=0)
    # lossless load-time transforms (what the engine serves with)
    params = unstack_layers(fuse_projections(params, cfg), cfg)
    if cfg.weight_fmt == "i2" and jax.default_backend() == "tpu":
        from vlut_tpu.ops.packing import word_pack_params

        params = word_pack_params(params, cfg.weight_fmt)
    return cfg, jax.device_put(params)


def bench_sweep(
    model: str | None = None,
    preset: str | None = None,
    fmt: str = "i2",
    n_prompt: tuple[int, ...] = (512,),
    n_gen: tuple[int, ...] = (128,),
    batch: tuple[int, ...] = (1,),
    impl: str = "auto",
    repeats: int = 3,
) -> list[dict[str, Any]]:
    import jax
    import jax.numpy as jnp

    from vlut_tpu.models.transformer import forward, init_kv_cache

    cfg, params = _load_model(model, preset, fmt)
    rows: list[dict[str, Any]] = []
    name = model or preset or "llama3_8b_158"

    for b in batch:
        for pp in n_prompt:
            if pp:
                @jax.jit
                def prefill(params, tokens, pos):
                    lg, _ = forward(
                        params, cfg, tokens, pos, None, impl=impl,
                        logits_last_only=True,
                    )
                    return jnp.sum(lg)

                toks = jnp.zeros((b, pp), jnp.int32)
                pos = jnp.tile(jnp.arange(pp, dtype=jnp.int32), (b, 1))
                float(prefill(params, toks, pos))  # compile + fence
                dt = _timeit(
                    lambda: float(prefill(params, toks, pos)), repeats
                )
                rows.append({
                    "model": name, "test": f"pp{pp}", "batch": b,
                    "n_tokens": b * pp, "time_s": round(dt, 4),
                    "tok_per_s": round(b * pp / dt, 2),
                })
        for tg in n_gen:
            if not tg:
                continue
            max_len = max(n_prompt or (0,)) + tg + 8

            @jax.jit
            def decode_n(params, cache, last, start):
                def step(c, _):
                    cache, tok, ln = c
                    lg, cache = forward(
                        params, cfg, tok[:, None], ln[:, None], cache,
                        impl=impl,
                    )
                    nxt = jnp.argmax(lg[:, 0], -1).astype(jnp.int32)
                    return (cache, nxt, ln + 1), nxt

                (cache, tok, _), toks = jax.lax.scan(
                    step, (cache, last, start), None, length=tg
                )
                return jnp.sum(toks)

            cache = init_kv_cache(cfg, b, max_len=max_len, layout="layers")
            last = jnp.zeros((b,), jnp.int32)
            start = jnp.zeros((b,), jnp.int32)
            int(decode_n(params, cache, last, start))  # compile + fence
            dt = _timeit(
                lambda: int(decode_n(params, cache, last, start)), repeats
            )
            rows.append({
                "model": name, "test": f"tg{tg}", "batch": b,
                "n_tokens": b * tg, "time_s": round(dt, 4),
                "tok_per_s": round(b * tg / dt, 2),
            })
    return rows


def batched_bench(
    model: str | None = None,
    preset: str | None = None,
    fmt: str = "i2",
    npp: tuple[int, ...] = (16,),
    ntg: tuple[int, ...] = (16,),
    npl: tuple[int, ...] = (64,),
    impl: str = "auto",
) -> list[dict[str, Any]]:
    """batched-bench grid: npl parallel sequences, npp prompt + ntg gen."""
    import jax
    import jax.numpy as jnp

    from vlut_tpu.models.transformer import forward, init_kv_cache

    cfg, params = _load_model(model, preset, fmt)
    rows = []
    for b in npl:
        for pp in npp:
            for tg in ntg:
                max_len = pp + tg + 8

                @jax.jit
                def run(params, cache, toks, pos):
                    lg, cache = forward(
                        params, cfg, toks, pos, cache, impl=impl,
                        logits_at=jnp.full((b,), pp - 1, jnp.int32),
                    )
                    last = jnp.argmax(lg[:, 0], -1).astype(jnp.int32)

                    def step(c, _):
                        cache, tok, ln = c
                        lg, cache = forward(
                            params, cfg, tok[:, None], ln[:, None], cache,
                            impl=impl,
                        )
                        nxt = jnp.argmax(lg[:, 0], -1).astype(jnp.int32)
                        return (cache, nxt, ln + 1), nxt

                    (cache, _, _), out = jax.lax.scan(
                        step, (cache, last, jnp.full((b,), pp, jnp.int32)),
                        None, length=tg,
                    )
                    return jnp.sum(out)

                toks = jnp.zeros((b, pp), jnp.int32)
                pos = jnp.tile(jnp.arange(pp, dtype=jnp.int32), (b, 1))
                cache = init_kv_cache(cfg, b, max_len=max_len, layout="layers")
                int(run(params, cache, toks, pos))  # compile + fence
                t0 = time.perf_counter()
                int(run(params, cache, toks, pos))
                dt = time.perf_counter() - t0
                total = b * (pp + tg)
                rows.append({
                    "PP": pp, "TG": tg, "B": b,
                    "N_KV": total, "T_s": round(dt, 3),
                    "S_t/s": round(total / dt, 2),
                })
    return rows


def format_rows(rows: list[dict[str, Any]], fmt: str = "md") -> str:
    if not rows:
        return ""
    if fmt == "json":
        return json.dumps(rows, indent=2)
    cols = list(rows[0].keys())
    if fmt == "csv":
        out = [",".join(cols)]
        out += [",".join(str(r[c]) for c in cols) for r in rows]
        return "\n".join(out)
    # markdown
    widths = {
        c: max(len(str(c)), *(len(str(r[c])) for r in rows)) for c in cols
    }
    line = "| " + " | ".join(str(c).ljust(widths[c]) for c in cols) + " |"
    sep = "|" + "|".join("-" * (widths[c] + 2) for c in cols) + "|"
    body = [
        "| " + " | ".join(str(r[c]).ljust(widths[c]) for c in cols) + " |"
        for r in rows
    ]
    return "\n".join([line, sep] + body)


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description="vlut-tpu e2e bench")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("sweep", help="llama-bench analog")
    p.add_argument("-m", "--model", default=None)
    p.add_argument("--preset", default="llama3_8b_158")
    p.add_argument("--fmt", default="i2")
    p.add_argument("-p", "--n-prompt", default="512")
    p.add_argument("-n", "--n-gen", default="128")
    p.add_argument("-b", "--batch", default="1")
    p.add_argument("-o", "--output", default="md",
                   choices=("md", "csv", "json"))
    p.add_argument("-r", "--repeats", type=int, default=3)

    q = sub.add_parser("batched", help="batched-bench analog")
    q.add_argument("-m", "--model", default=None)
    q.add_argument("--preset", default="llama3_8b_158")
    q.add_argument("--fmt", default="i2")
    q.add_argument("-npp", default="16")
    q.add_argument("-ntg", default="16")
    q.add_argument("-npl", default="64")
    q.add_argument("-o", "--output", default="md",
                   choices=("md", "csv", "json"))

    args = ap.parse_args(argv)
    ints = lambda s: tuple(int(x) for x in str(s).split(",") if x)  # noqa
    if args.cmd == "sweep":
        rows = bench_sweep(
            model=args.model, preset=args.preset, fmt=args.fmt,
            n_prompt=ints(args.n_prompt), n_gen=ints(args.n_gen),
            batch=ints(args.batch), repeats=args.repeats,
        )
    else:
        rows = batched_bench(
            model=args.model, preset=args.preset, fmt=args.fmt,
            npp=ints(args.npp), ntg=ints(args.ntg), npl=ints(args.npl),
        )
    print(format_rows(rows, args.output))


if __name__ == "__main__":
    main()

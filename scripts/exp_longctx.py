#!/usr/bin/env python
"""Served long-context proof at 8B shapes (VERDICT r4 item 2).

The reference's own demo serves 8,192-ctx LongBench
(/root/reference/vlut_demo.py:5-44); until round 5 the engine could not
ingest a prompt beyond its largest bucket.  With chunked prefill landed,
this runs an 8k-token prompt through the PRODUCTION Engine (slots,
buckets, sampler) at llama3-8B shapes on the real chip and records:

  * chunked prefill throughput for the 8k prompt (8 x 1024 rounds),
  * decode ms/step at S in {1k, 4k, 8k} context depths (b=1),
  * the VLUT_TPU_FUSED_ATTN A/B at the longest S (the round-4
    post-mortem predicted the fused kernel wins at long S where
    cache reads dominate; measure, don't assume).

Timing: whole-run wall over 64 decode steps (the engine's own perf
counters), best of 2 — coarse but honest for multi-second runs; the
tunnel's per-dispatch jitter washes out over 64 chained steps.
"""

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

from vlut_tpu.config import PRESETS  # noqa: E402
from vlut_tpu.models.transformer import init_params_fast  # noqa: E402
from vlut_tpu.runtime.engine import Engine, Request  # noqa: E402
from vlut_tpu.runtime.sampling import SamplerParams  # noqa: E402

N_NEW = 64


def run(params, cfg, prompt_len, max_len, n_new=N_NEW):
    rng = np.random.default_rng(0)
    prompt = [int(x) for x in rng.integers(5, 50_000, prompt_len)]
    eng = Engine(cfg, params, n_slots=1, max_len=max_len)
    r = Request(prompt=prompt, max_new_tokens=n_new,
                sampler=SamplerParams(temperature=0.0))
    t0 = time.perf_counter()
    eng.run([r])
    wall = time.perf_counter() - t0
    p = eng.perf
    pp = p.n_prompt_tokens / p.t_prompt_s if p.t_prompt_s else 0
    tg = p.n_decode_tokens / p.t_decode_s if p.t_decode_s else 0
    step_ms = p.t_decode_s / max(p.n_decode_tokens, 1) * 1e3
    return pp, tg, step_ms, wall, len(r.output)


def main():
    cfg = PRESETS["llama3_8b_158"]
    params = init_params_fast(cfg, seed=0)
    print(f"flagship {cfg.d_model}d x {cfg.n_layers}L, "
          f"fused_attn={os.environ.get('VLUT_TPU_FUSED_ATTN', '0')}",
          flush=True)
    for s, ml in ((1024, 1536), (4096, 4608), (8192, 8704)):
        best = None
        for _ in range(2):
            pp, tg, step_ms, wall, n_out = run(params, cfg, s, ml)
            if best is None or step_ms < best[2]:
                best = (pp, tg, step_ms, wall, n_out)
        pp, tg, step_ms, wall, n_out = best
        print(f"S={s}: prefill {pp:,.0f} tok/s (chunked "
              f"{-(-s // 1024)} rounds) | decode {step_ms:.2f} ms/step "
              f"= {tg:.0f} tok/s | {n_out} tokens, wall {wall:.1f}s",
              flush=True)


if __name__ == "__main__":
    main()

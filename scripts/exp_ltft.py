#!/usr/bin/env python
"""Load-to-first-token at 8B scale (VERDICT r3 item 6).

Phase 1 (once): materialize the flagship synthetic checkpoint to disk
(~2.3 GB packed i2 + bf16 head) — real deployments start from such a
directory, not from init_params_fast.

Phase 2: cold-process measurement via subprocess: wall time of
`python -m vlut_tpu.cli generate -n 1` (includes interpreter + jax init
+ streaming load + engine prep + compile + prefill + 1 decode step).
Phase 3: in-process stage breakdown (load / prep / compile+first-token)
with VLUT_STREAM_LOAD on and off.
"""

import json
import os
import pathlib
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

CKPT = pathlib.Path(os.environ.get("VLUT_LTFT_CKPT", "/tmp/vlut8b"))


def build_checkpoint():
    import jax

    from vlut_tpu.config import PRESETS
    from vlut_tpu.convert.checkpoint import save_checkpoint
    from vlut_tpu.models.transformer import init_params_fast

    cfg = PRESETS["llama3_8b_158"]
    t0 = time.time()
    params = init_params_fast(cfg, seed=0)
    params = jax.tree.map(np.asarray, params)
    print(f"# params generated in {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    save_checkpoint(CKPT, cfg, params, tokenizer_src="/tmp/tinytok"
                    if pathlib.Path("/tmp/tinytok").exists() else None)
    print(f"# checkpoint written in {time.time()-t0:.1f}s", flush=True)


def cold_process():
    env = dict(os.environ)
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, "-m", "vlut_tpu.cli", "generate", "--model",
         str(CKPT), "-p", "hello world", "-n", "1", "--temp", "0"],
        capture_output=True, text=True, env=env, timeout=1800,
    )
    dt = time.time() - t0
    tail = (r.stderr or "").strip().splitlines()[-1:] or ["?"]
    print(f"# cold-process LTFT: {dt:.1f}s  ({tail[0][:90]})", flush=True)
    return dt


def staged(stream: bool):
    import jax
    import jax.numpy as jnp

    from vlut_tpu.convert.checkpoint import load_checkpoint
    from vlut_tpu.models.transformer import (
        forward, fuse_projections, init_kv_cache, quantize_head)

    t0 = time.time()
    cfg, params, _ = load_checkpoint(CKPT, stream=stream)
    if not stream:
        params = jax.device_put(params)
    jax.block_until_ready(params["embed"])
    t_load = time.time() - t0
    t0 = time.time()
    params = quantize_head(params)
    params = fuse_projections(params, cfg)
    jax.block_until_ready(params["layers"]["wo"]
                          if isinstance(params["layers"], dict)
                          else params["layers"][0]["wo"])
    t_prep = time.time() - t0
    t0 = time.time()
    cache = init_kv_cache(cfg, 1, max_len=256, layout="stacked")
    ids = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    pos = jnp.arange(4, dtype=jnp.int32)[None]
    lg, _ = forward(params, cfg, ids, pos, cache,
                    logits_at=jnp.asarray([3], jnp.int32))
    tok = int(jnp.argmax(lg[0, 0]))
    t_first = time.time() - t0
    print(f"# staged stream={stream}: load {t_load:.1f}s  prep "
          f"{t_prep:.1f}s  compile+first {t_first:.1f}s  "
          f"TOTAL {t_load+t_prep+t_first:.1f}s (tok={tok})", flush=True)
    return t_load, t_prep, t_first


def main():
    # only one TPU process at a time: --staged runs build+staged in this
    # process; --cold must run AFTER it in a fresh invocation (the
    # subprocess gets the chip to itself)
    mode = sys.argv[1] if len(sys.argv) > 1 else "--staged"
    if mode == "--staged":
        if not (CKPT / "vlut_config.json").exists():
            build_checkpoint()
        sz = sum(f.stat().st_size for f in CKPT.glob("*")) / 2**30
        print(f"# checkpoint on disk: {sz:.2f} GiB", flush=True)
        staged(stream=True)
        staged(stream=False)
    else:
        cold_process()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Prefill block-shape tuner (VERDICT r3 item 1).

Sweeps (bm, bn, bk) for the M=4096 (pp128 x 32) fused llama3-8B GEMM
shapes and writes winners into bench/autotune_v5e.json under the M=4096
keys.  Short timing protocol — these GEMMs are ms-scale, so small n_hi
marginals are stable (PERF.md protocol notes).
"""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from vlut_tpu.bench.autotune import DEFAULT_FILE, _key  # noqa: E402
from vlut_tpu.bench.kernels import bench_gemm  # noqa: E402

M = 4096
SHAPES = [  # llama3-8B load-time-fused projection widths
    ("qkv", 4096, 6144),
    ("wo", 4096, 4096),
    ("gateup", 4096, 28672),
    ("down", 14336, 4096),
]


def candidates(np_, kp):
    bms = [b for b in (256, 512, 1024) if M % b == 0]
    bns = [b for b in (256, 512, 1024, 2048, 3584, 7168) if np_ % b == 0]
    bks = [b for b in (512, 1024, 2048, 4096) if kp % b == 0]
    for bm in bms:
        for bn in bns:
            for bk in bks:
                # VMEM: decoded w tile + x tile + int32 acc
                if bk * bn + bm * bk + 4 * bm * bn <= 10 << 20:
                    yield bm, bn, bk


def main():
    table = json.loads(DEFAULT_FILE.read_text())
    fmt, word = "i2", True
    for tag, k, n in SHAPES:
        print(f"== {tag} K={k} N={n} M={M}", flush=True)
        best, best_g = None, 0.0
        for bm, bn, bk in candidates(n, k):
            try:
                r = bench_gemm(fmt, M, k, n, block_shapes=(bm, bn, bk),
                               n_lo=4, n_hi=16, repeats=2, word=word)
            except Exception as e:  # noqa: BLE001
                print(f"  ({bm},{bn},{bk}): skipped "
                      f"({type(e).__name__})", flush=True)
                continue
            g = r["gbps_packed"]
            print(f"  ({bm},{bn},{bk}): {g:.1f} GB/s packed, "
                  f"{r['tflops']:.1f} TFLOP/s", flush=True)
            if g > best_g:
                best, best_g = (bm, bn, bk), g
        print(f"   best {best} @ {best_g:.1f} GB/s", flush=True)
        if best:
            table[_key(fmt, M, -(-k // 128) * 128, -(-n // 128) * 128,
                       word)] = list(best)
            # the slab (non-word) path shares the winner as a fallback
            table.setdefault(
                _key(fmt, M, -(-k // 128) * 128, -(-n // 128) * 128),
                list(best),
            )
    DEFAULT_FILE.write_text(json.dumps(table, indent=1, sort_keys=True))
    print(f"wrote {DEFAULT_FILE}")


if __name__ == "__main__":
    main()

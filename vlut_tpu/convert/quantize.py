"""Requantize a native checkpoint between ternary formats (llama-quantize
analog for already-converted checkpoints, tools/quantize/quantize.cpp).

i2 (2.0 bpw, 4 trits/byte) <-> i1 (1.6 bpw, 5 trits/byte) conversion is
exact: both store the same trits, only the byte packing changes.  Useful
for trading decode bandwidth (i1 streams 20% fewer bytes) against unpack
ALU cost, per-machine — the same trade the reference exposes as its
I2_V*/I1_V* type choice.
"""

from __future__ import annotations

import dataclasses
import pathlib
from typing import Any

import numpy as np

from vlut_tpu.config import ModelConfig
from vlut_tpu.convert.checkpoint import load_checkpoint, save_checkpoint
from vlut_tpu.models.transformer import (
    pack_weight,
    unpack_weight,
    weight_specs,
)
from vlut_tpu.ops.packing import TernaryTensor


def requantize_params(
    cfg: ModelConfig, params: dict[str, Any], fmt: str
) -> tuple[ModelConfig, dict[str, Any]]:
    """Exact in-memory i2 <-> i1 repack (same trits, new byte format).

    Besides the offline quantize driver, this backs LOAD-TIME FORMAT
    PROMOTION: i1 (1.6 bpw) decode is VPU-ALU-bound (~250 GB/s effective
    on v5e — base-243 digit extraction costs ~4 int ops/trit) while i2
    (2.0 bpw) streams at 550+ GB/s, so serving an i1 checkpoint promoted
    to i2 is ~1.7x faster despite reading 25% more bytes.  i1 stays the
    storage/distribution format; promotion costs one repack at load.
    """
    if cfg.weight_fmt == fmt:
        return cfg, params
    src_specs = weight_specs(cfg)
    new_cfg = dataclasses.replace(cfg, weight_fmt=fmt)

    layers: dict[str, Any] = {}
    for name, val in params["layers"].items():
        if not (isinstance(val, dict) and "packed" in val):
            layers[name] = np.asarray(val)
            continue
        spec = src_specs[name]
        packed = np.asarray(val["packed"])
        scale = np.asarray(val["scale"], np.float32)

        def req_one(p2, s):
            # the padded/permuted layouts differ per format (the pack-block
            # size shapes the plan), so round-trip via the logical trits
            t = TernaryTensor(
                packed=p2, scale=np.float32(s), k=spec.k, n=spec.n,
                fmt=spec.fmt, kb=spec.kb,
            )
            trits = unpack_weight(name, t, cfg)
            return pack_weight(name, trits, np.float32(s), new_cfg)

        if packed.ndim == 4:  # MoE experts
            outs = [[req_one(packed[li, e], scale[li, e])
                     for e in range(packed.shape[1])]
                    for li in range(packed.shape[0])]
            layers[name] = {
                "packed": np.stack([
                    np.stack([np.asarray(t.packed) for t in row])
                    for row in outs
                ]),
                "scale": np.stack([
                    np.stack([np.asarray(t.scale).reshape(()) for t in row])
                    for row in outs
                ]),
            }
        else:
            outs = [req_one(packed[li], scale[li])
                    for li in range(packed.shape[0])]
            layers[name] = {
                "packed": np.stack([np.asarray(t.packed) for t in outs]),
                "scale": np.stack(
                    [np.asarray(t.scale).reshape(()) for t in outs]
                ),
            }

    new_params = {
        k: (np.asarray(v) if k != "layers" else layers)
        for k, v in params.items()
    }
    return new_cfg, new_params


def requantize(
    src: str | pathlib.Path, dst: str | pathlib.Path, fmt: str
) -> ModelConfig:
    cfg, params, meta = load_checkpoint(src)
    if cfg.weight_fmt == fmt:
        raise ValueError(f"checkpoint already {fmt}")
    new_cfg, new_params = requantize_params(cfg, params, fmt)
    save_checkpoint(
        dst, new_cfg, new_params, tokenizer_src=src,
        extra_meta={"requantized_from": str(src), **{
            k: v for k, v in meta.items()
            if k not in ("format_version", "model_config")
        }},
    )
    return new_cfg


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(
        description="requantize a native ternary checkpoint (i2 <-> i1)"
    )
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--fmt", choices=("i2", "i1"), required=True)
    args = ap.parse_args(argv)
    cfg = requantize(args.src, args.dst, args.fmt)
    print(f"requantized -> {args.dst} ({cfg.weight_fmt})")


if __name__ == "__main__":
    main()

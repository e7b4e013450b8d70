"""Collective census from compiled HLO (VERDICT r3 item 10 / r4 item 8).

Counts + byte volumes of all-reduce / all-gather / reduce-scatter /
collective-permute / all-to-all in an optimized compiled program, so the
multi-chip story records what actually rides the interconnect.  The
reference's analog is the measured ggml-backend sched splits
(ggml/src/ggml-backend.cpp:923+).
"""

from __future__ import annotations

import re

_OPS = ("all-reduce", "all-gather", "reduce-scatter",
        "collective-permute", "all-to-all")
_DT_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
             "s8": 1, "u8": 1, "pred": 1, "f64": 8, "s64": 8}
_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def comm_census(jfn, *args) -> dict[str, dict[str, int]]:
    """{op: {"count": n, "bytes": b}} for the compiled program of
    ``jfn(*args)`` (jitted callable)."""
    hlo = jfn.lower(*args).compile().as_text()
    return census_from_hlo(hlo)


def census_from_hlo(hlo: str) -> dict[str, dict[str, int]]:
    out = {op: {"count": 0, "bytes": 0} for op in _OPS}
    for line in hlo.splitlines():
        for op in _OPS:
            if f" {op}(" not in line and f" {op}-start(" not in line:
                continue
            lhs = line.split(f" {op}")[0]
            size = 0
            for dt, dims in _SHAPE_RE.findall(lhs):
                n = 1
                for d in dims.split(","):
                    if d:
                        n *= int(d)
                size += n * _DT_BYTES.get(dt, 4)
            out[op]["count"] += 1
            out[op]["bytes"] += size
            break
    return {op: v for op, v in out.items() if v["count"]}


def total_bytes(census: dict[str, dict[str, int]]) -> int:
    return sum(v["bytes"] for v in census.values())


def format_census(census: dict[str, dict[str, int]]) -> str:
    parts = ", ".join(
        f"{op} x{v['count']} = {v['bytes']/1e6:.3f} MB"
        for op, v in census.items()
    )
    t = total_bytes(census)
    return (f"{parts or 'no collectives'}"
            f"{f'; total {t/1e6:.3f} MB/step' if t else ''}")

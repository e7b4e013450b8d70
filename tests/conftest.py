"""Test env: force CPU JAX with an 8-device virtual mesh (SURVEY §4.8).

The container's sitecustomize registers the real-TPU PJRT plugin and pins
JAX_PLATFORMS before any of our code runs, so env vars are too late; the
jax config API still works as long as no backend has initialized.  Set
VLUT_TEST_TPU=1 to run the suite on real hardware (single chip, no virtual
mesh).
"""

import os

import jax
import pytest

if not os.environ.get("VLUT_TEST_TPU"):
    # excess-precision elision lets XLA drop f32->bf16->f32 convert pairs
    # differently per compiled graph, so two mathematically-identical
    # programs (e.g. the engine with / without a mesh, or fused vs
    # composed projections) can differ by one bf16 ulp.  The tp engine's
    # token-for-token parity tests need the strict-rounding semantics.
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_allow_excess_precision" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_allow_excess_precision=false"
        ).strip()
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)


# ---------------------------------------------------------------------------
# Shard markers (reference: ctest labels, tests/CMakeLists.txt:81-113).
# Every module maps to exactly one of {core, arch, engine}; unknown modules
# default to core so new test files can never silently fall out of CI.
# ---------------------------------------------------------------------------
_ARCH_MODULES = {
    "test_archs", "test_archs_clones", "test_archs_clones2",
    "test_archs_hf", "test_archs_hf2", "test_archs_hf3",
    "test_archs_list", "test_archs_moe_wave", "test_archs_wave4",
    "test_archs_wave5", "test_archs_wave6", "test_audio", "test_diffusion",
    "test_encoder", "test_hybrid", "test_llama4", "test_mamba2",
    "test_model", "test_qwen2vl", "test_rwkv7", "test_ssm", "test_t5",
    "test_tts", "test_vision", "test_multimodal",
}
_ENGINE_MODULES = {
    "test_engine", "test_server", "test_sampling", "test_grammar",
    "test_speculative", "test_lora", "test_runtime_ops", "test_chat",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__
        if mod in _ARCH_MODULES:
            item.add_marker(pytest.mark.arch)
        elif mod in _ENGINE_MODULES:
            item.add_marker(pytest.mark.engine)
        else:
            item.add_marker(pytest.mark.core)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Keep the monolithic `pytest tests/` run viable: without this, the
    single process accumulates thousands of live jitted executables /
    jaxprs across ~460 tests and Python GC + XLA compiles slow down
    super-linearly late in the run (a 20 s module measured >10 min at
    the 95% mark).  Per-module cache clears bound the live heap; the
    sharded CI scheme (core/arch/engine) is unaffected."""
    yield
    import gc

    try:
        import jax

        jax.clear_caches()
    except Exception:
        pass
    gc.collect()

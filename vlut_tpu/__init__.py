"""vlut_tpu — TPU-native ultra-low-bit LLM inference engine.

A from-scratch JAX/XLA/Pallas framework delivering the capabilities of
vlut.cpp (Vec-LUT, arXiv:2512.06443): lossless ternary I1/I2 weight packing,
ternary GEMM kernels re-architected for the MXU/VPU, a HF->ternary checkpoint
packer, and parallel-first serving (prefill, batched decode, speculative),
sharded over TPU meshes via SPMD.

Reference capability map: see SURVEY.md at the repo root. This package is a
new design, not a port — layouts, kernels and runtime are TPU-idiomatic.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("VLUT_PLATFORM"):
    # Some containers pin JAX_PLATFORMS via sitecustomize before user env
    # vars are consulted; the config API still wins as long as no backend
    # has initialized, so honor an explicit VLUT_PLATFORM=cpu/tpu here.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["VLUT_PLATFORM"])

from vlut_tpu.ops.packing import (  # noqa: F401
    TernaryTensor,
    pack_ternary,
    unpack_ternary,
)
from vlut_tpu.ops.matmul import ternary_matmul  # noqa: F401

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

from vlut_tpu.ops.packing import (  # noqa: F401
    TernaryTensor,
    pack_ternary,
    unpack_ternary,
)
from vlut_tpu.ops.matmul import ternary_matmul  # noqa: F401

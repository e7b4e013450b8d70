from vlut_tpu.ops.packing import (  # noqa: F401
    TernaryTensor,
    pack_ternary,
    ternarize,
    unpack_ternary,
    unpack_ternary_np,
)
from vlut_tpu.ops.quant import quantize_activations  # noqa: F401
from vlut_tpu.ops.matmul import ternary_matmul  # noqa: F401

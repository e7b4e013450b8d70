"""Model and runtime configuration.

Replaces the reference's hparams plumbing (src/llama-hparams.*,
src/llama-arch.cpp) with plain frozen dataclasses.  Presets cover the
Vec-LUT paper's model families (reference README.md:44-53); real runs load
exact hparams from the HF checkpoint's config.json at convert time — presets
exist for synthetic benchmarks and tests.
"""

from __future__ import annotations

import dataclasses
from typing import Any


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    vocab_size: int
    d_model: int
    n_layers: int
    n_heads: int
    n_kv_heads: int
    d_ff: int
    arch: str = "llama"  # "llama" | "bitnet"
    head_dim: int | None = None
    rms_eps: float = 1e-5
    rope_theta: float = 10000.0
    rope_scaling: dict[str, Any] | None = None  # llama3-style dict
    tie_embeddings: bool = False
    use_subnorms: bool = False  # bitnet attn/ffn sub-norms (src/models/bitnet.cpp)
    weight_fmt: str = "i2"  # "i2" (2.0 bpw) | "i1" (1.6 bpw)
    max_seq_len: int = 4096
    # checkpoints are packed with enough padding to shard evenly over any
    # tensor-parallel degree dividing tp_pack (see models/dims.py)
    tp_pack: int = 8

    @property
    def head_dim_(self) -> int:
        return self.head_dim or self.d_model // self.n_heads

    @property
    def q_dim(self) -> int:
        return self.n_heads * self.head_dim_

    @property
    def kv_dim(self) -> int:
        return self.n_kv_heads * self.head_dim_


# --- presets (hparams per public HF configs of the paper's model zoo) -------

PRESETS: dict[str, ModelConfig] = {
    # 1bitLLM/bitnet_b1_58-3B — BITNET arch w/ sub-norms
    "bitnet_3b": ModelConfig(
        arch="bitnet", vocab_size=32002, d_model=3200, n_layers=26,
        n_heads=32, n_kv_heads=32, d_ff=8640, rms_eps=1e-5,
        rope_theta=10000.0, use_subnorms=True,
    ),
    # HF1BitLLM/Llama3-8B-1.58-100B-tokens — LLAMA arch
    "llama3_8b_158": ModelConfig(
        arch="llama", vocab_size=128256, d_model=4096, n_layers=32,
        n_heads=32, n_kv_heads=8, d_ff=14336, rms_eps=1e-5,
        rope_theta=500000.0,
        rope_scaling=None,
    ),
    # tiiuae/Falcon3-1B-Instruct-1.58bit — LlamaForCausalLM
    "falcon3_1b_158": ModelConfig(
        arch="llama", vocab_size=131072, d_model=2048, n_layers=18,
        n_heads=8, n_kv_heads=4, d_ff=8192, head_dim=256,
        rms_eps=1e-6, rope_theta=1000042.0, weight_fmt="i1",
    ),
    # SpectraSuite/TriLM_3.9B — LLAMA arch
    "trilm_3_9b": ModelConfig(
        arch="llama", vocab_size=50688, d_model=3072, n_layers=30,
        n_heads=24, n_kv_heads=24, d_ff=9216, rms_eps=1e-5,
        rope_theta=10000.0, weight_fmt="i1",
    ),
    # tiny configs for tests
    "tiny": ModelConfig(
        arch="llama", vocab_size=256, d_model=128, n_layers=2,
        n_heads=4, n_kv_heads=2, d_ff=256, max_seq_len=128,
        rope_theta=10000.0,
    ),
    "tiny_bitnet": ModelConfig(
        arch="bitnet", vocab_size=256, d_model=128, n_layers=2,
        n_heads=4, n_kv_heads=4, d_ff=256, max_seq_len=128,
        use_subnorms=True,
    ),
}

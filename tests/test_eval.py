"""Perplexity harness tests on the tiny model."""

import numpy as np
import pytest

from vlut_tpu.config import PRESETS
from vlut_tpu.eval.perplexity import logits_compare, perplexity
from vlut_tpu.models.transformer import init_params

CFG = PRESETS["tiny"]


@pytest.fixture(scope="module")
def params():
    return init_params(CFG, seed=0)


def test_perplexity_runs(params):
    rng = np.random.default_rng(0)
    toks = rng.integers(0, CFG.vocab_size, 64)
    out = perplexity(params, CFG, toks, window=32, impl="xla")
    assert out["tokens"] == 62
    assert 1.0 < out["ppl"] < CFG.vocab_size * 2


def test_quantized_vs_dequant_kl(params):
    rng = np.random.default_rng(1)
    toks = rng.integers(0, CFG.vocab_size, 48)
    out = logits_compare(params, CFG, toks, impl_a="xla", impl_b="dequant",
                         window=48)
    # int8 activation-quant noise only: tiny KL, near-total top1 agreement
    assert out["kl_mean"] < 0.02
    assert out["top1_agreement"] > 0.9

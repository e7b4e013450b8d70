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


# --- task harness (perplexity.cpp hellaswag/winogrande/MC + KL modes) --------


class _CharTok:
    def encode(self, text, add_bos=True):
        return [min(ord(c), 255) for c in text]


def _tiny():
    from vlut_tpu.config import PRESETS
    from vlut_tpu.models.transformer import init_params

    cfg = PRESETS["tiny"]
    return cfg, init_params(cfg, seed=0)


def test_score_continuations_prefers_self():
    """A continuation identical to a high-probability path must outscore a
    uniform-random alternative often enough to sanity-check the scorer; we
    verify the mechanical contract: scores are finite, one per choice."""
    from vlut_tpu.eval.tasks import score_continuations

    cfg, params = _tiny()
    ctx = [3, 7, 11, 2]
    choices = [[5, 6], [9], [1, 2, 3]]
    scores = score_continuations(params, cfg, ctx, choices, impl="xla")
    assert len(scores) == 3 and all(np.isfinite(s) for s in scores)


def test_hellaswag_and_winogrande_and_mc(tmp_path):
    import json as _json

    from vlut_tpu.eval import tasks as T

    cfg, params = _tiny()
    tok = _CharTok()
    hs = tmp_path / "hs.jsonl"
    hs.write_text("\n".join(
        _json.dumps({"ctx": "abc", "endings": ["de", "fg"], "label": i % 2})
        for i in range(4)
    ))
    out = T.hellaswag_eval(params, cfg, tok, hs, impl="xla")
    assert out["n"] == 4 and 0.0 <= out["acc"] <= 1.0

    wg = tmp_path / "wg.jsonl"
    wg.write_text(_json.dumps(
        {"sentence": "x _ y", "option1": "a", "option2": "b", "answer": 1}
    ))
    out = T.winogrande_eval(params, cfg, tok, wg, impl="xla")
    assert out["n"] == 1

    mc = tmp_path / "mc.jsonl"
    mc.write_text(_json.dumps(
        {"question": "q", "choices": ["x", "y", "z"], "answer": 2}
    ))
    out = T.multiple_choice_eval(params, cfg, tok, mc, impl="xla")
    assert out["n"] == 1


def test_kl_vs_saved_self_is_zero(tmp_path):
    """KL(model || saved-logits-of-same-model) ~ 0, top-1 agreement 1.0 —
    validates the save/compare file format end-to-end."""
    from vlut_tpu.eval.tasks import kl_vs_saved, save_logits

    cfg, params = _tiny()
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, 64).astype(np.int32)
    f = tmp_path / "base.npz"
    save_logits(params, cfg, ids, f, window=32, impl="xla")
    out = kl_vs_saved(params, cfg, f, impl="xla")
    assert out["top1_agreement"] == 1.0
    assert out["kl_mean"] < 1e-3  # fp16 storage noise only
    assert abs(out["ppl"] - out["ppl_base"]) / out["ppl_base"] < 0.01

"""Gemma3n HF logit parity (reference src/models/gemma3n-iswa.cpp;
converter Gemma3NModel).  Exercises every gemma3n-specific mechanism on a
tiny config: AltUp predict/correct (n_altup=2 and 3), LAuReL, per-layer
input embeddings, activation sparsity (gaussian topk), local/global rope,
sliding window, weightless v-norm, attention scale 1.0, KV sharing for
the tail layers, final logit softcap."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from vlut_tpu.convert.checkpoint import load_checkpoint
from vlut_tpu.convert.gemma3n import convert_gemma3n
from vlut_tpu.models.gemma3n import forward

V = 64


def _cfg(**over):
    kw = dict(
        vocab_size=V, vocab_size_per_layer_input=V, hidden_size=32,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, intermediate_size=[48, 40, 48, 40],
        hidden_size_per_layer_input=8,
        layer_types=["sliding_attention", "full_attention",
                     "sliding_attention", "full_attention"],
        sliding_window=4, altup_num_inputs=2, altup_active_idx=0,
        altup_coef_clip=120.0, altup_correct_scale=True, laurel_rank=4,
        num_kv_shared_layers=2, rope_theta=1000000.0,
        rope_local_base_freq=10000.0, rms_norm_eps=1e-6,
        activation_sparsity_pattern=[0.95, 0.5, 0.0, 0.0],
        final_logit_softcapping=30.0, max_position_embeddings=64,
        hidden_activation="gelu_pytorch_tanh",
    )
    kw.update(over)
    return transformers.Gemma3nTextConfig(**kw)


def _parity(c, tmp_path, seed, t=9):
    torch.manual_seed(seed)
    model = transformers.Gemma3nForCausalLM(c).float().eval()
    model.save_pretrained(str(tmp_path / "hf"), safe_serialization=True)
    cfg = convert_gemma3n(tmp_path / "hf", tmp_path / "out")
    cfg2, params, _ = load_checkpoint(tmp_path / "out")
    params = jax.tree.map(jnp.asarray, params)
    rng = np.random.default_rng(seed)
    toks = rng.integers(0, V, (2, t))
    with torch.no_grad():
        # use_cache=True so HF's tail layers actually REUSE the stored
        # full-length K/V of the last non-shared layer of their type
        want = model(torch.tensor(toks), use_cache=True).logits.numpy()
    got = np.asarray(forward(params, cfg2, jnp.asarray(toks, jnp.int32)))
    got = got[..., : want.shape[-1]]
    np.testing.assert_allclose(got, want, rtol=4e-3, atol=4e-4)
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))
    return cfg


def test_gemma3n_parity(tmp_path):
    cfg = _parity(_cfg(), tmp_path, seed=91)
    assert cfg.n_altup == 2 and cfg.n_kv_shared == 2
    assert cfg.layer_types[0] == "sliding_attention"
    assert cfg.d_ff == (48, 40, 48, 40)
    assert cfg.sparsity == (0.95, 0.5, 0.0, 0.0)


def test_gemma3n_parity_altup3_no_shared(tmp_path):
    """n_altup=3 exercises the full coefficient matrices; no KV sharing
    and no final softcap cover those branches off."""
    c = _cfg(altup_num_inputs=3, num_kv_shared_layers=0,
             final_logit_softcapping=None,
             activation_sparsity_pattern=[0.0, 0.0, 0.0, 0.0])
    cfg = _parity(c, tmp_path, seed=92, t=7)
    assert cfg.n_altup == 3 and cfg.n_kv_shared == 0
    assert cfg.logit_softcap == 0.0

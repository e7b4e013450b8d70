"""Mamba2 (SSD) parity vs HF transformers + recurrent-state consistency
(reference: the mamba2 mixer shared by src/models/{jamba,falcon-h1,
granite-hybrid,nemotron-h}.cpp)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from vlut_tpu.convert.checkpoint import load_checkpoint
from vlut_tpu.convert.convert import convert_hf
from vlut_tpu.models.ssm import forward2, init_state2

V = 64


def _ternarize(model, scale=0.02, seed=0):
    rng = np.random.default_rng(seed)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if p.ndim == 2 and ("in_proj" in name or "out_proj" in name):
                trits = rng.integers(-1, 2, size=tuple(p.shape))
                p.copy_(torch.tensor(trits * scale, dtype=p.dtype))


def _mk(tmp_path):
    c = transformers.Mamba2Config(
        vocab_size=V, hidden_size=32, num_hidden_layers=2, num_heads=8,
        head_dim=8, expand=2, n_groups=2, state_size=16, conv_kernel=4,
        chunk_size=8, tie_word_embeddings=False,
    )
    torch.manual_seed(70)
    m = transformers.Mamba2ForCausalLM(c).float().eval()
    _ternarize(m)
    m.save_pretrained(str(tmp_path / "hf"), safe_serialization=True)
    cfg = convert_hf(tmp_path / "hf", tmp_path / "out",
                     dtype_hp="float32")
    cfg2, params, meta = load_checkpoint(tmp_path / "out")
    assert meta["ternarized_tensors"] == 0
    params = jax.tree.map(jnp.asarray, params)
    return m, cfg2, params


def test_mamba2_parity(tmp_path):
    m, cfg, params = _mk(tmp_path)
    assert cfg.n_heads == 8 and cfg.n_groups == 2 and cfg.d_state == 16
    rng = np.random.default_rng(8)
    toks = rng.integers(0, V, (2, 16))  # t > chunk_size: crosses chunks
    with torch.no_grad():
        want = m(torch.tensor(toks)).logits.numpy()
    got, _ = forward2(params, cfg, jnp.asarray(toks, jnp.int32),
                      impl="dequant")
    got = np.asarray(got)[..., :V]
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))


def test_mamba2_state_carry(tmp_path):
    """prefill(a+b) == prefill(a) -> decode(b) with carried state."""
    m, cfg, params = _mk(tmp_path)
    rng = np.random.default_rng(9)
    toks = rng.integers(0, V, (1, 12))
    full, _ = forward2(params, cfg, jnp.asarray(toks, jnp.int32))
    st = init_state2(cfg, 1)
    _, st = forward2(params, cfg, jnp.asarray(toks[:, :7], jnp.int32), st)
    out2, st = forward2(params, cfg, jnp.asarray(toks[:, 7:], jnp.int32), st)
    np.testing.assert_allclose(
        np.asarray(out2), np.asarray(full)[:, 7:], rtol=2e-4, atol=2e-4
    )

"""T5 encoder-decoder parity vs HF transformers (reference:
src/models/t5-enc.cpp + t5-dec.cpp, llama_encode/llama_decode split)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from vlut_tpu.convert.checkpoint import load_checkpoint
from vlut_tpu.convert.t5 import convert_t5
from vlut_tpu.models.t5 import decode_logits, encode, generate

V = 64


def _mk(tmp_path, gated=True, tie=True):
    c = transformers.T5Config(
        vocab_size=V, d_model=32, d_kv=8, d_ff=48, num_layers=2,
        num_decoder_layers=2, num_heads=4,
        relative_attention_num_buckets=8,
        relative_attention_max_distance=20,
        feed_forward_proj="gated-gelu" if gated else "relu",
        tie_word_embeddings=tie, decoder_start_token_id=0,
    )
    torch.manual_seed(60 + gated + 2 * tie)
    m = transformers.T5ForConditionalGeneration(c).float().eval()
    m.save_pretrained(str(tmp_path / "hf"), safe_serialization=True)
    cfg = convert_t5(tmp_path / "hf", tmp_path / "out")
    cfg2, params, _ = load_checkpoint(tmp_path / "out")
    params = jax.tree.map(jnp.asarray, params)
    return m, cfg2, params


@pytest.mark.parametrize("gated,tie", [(True, True), (False, False)])
def test_t5_parity(tmp_path, gated, tie):
    m, cfg, params = _mk(tmp_path, gated=gated, tie=tie)
    assert cfg.gated == gated and cfg.tie_embeddings == tie
    rng = np.random.default_rng(5)
    b, te, td = 2, 24, 7  # t_enc > rel_max_exact: exercises log buckets
    enc_toks = rng.integers(0, V, (b, te))
    dec_toks = rng.integers(0, V, (b, td))
    enc_mask = np.ones((b, te), np.int32)
    enc_mask[1, 19:] = 0
    with torch.no_grad():
        want = m(
            input_ids=torch.tensor(enc_toks),
            attention_mask=torch.tensor(enc_mask),
            decoder_input_ids=torch.tensor(dec_toks),
        ).logits.numpy()
    enc_out = encode(params, cfg, jnp.asarray(enc_toks, jnp.int32),
                     jnp.asarray(enc_mask))
    got = np.asarray(decode_logits(
        params, cfg, jnp.asarray(dec_toks, jnp.int32), enc_out,
        jnp.asarray(enc_mask),
    ))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))


def test_t5_generate_matches_hf(tmp_path):
    m, cfg, params = _mk(tmp_path)
    rng = np.random.default_rng(6)
    enc = rng.integers(2, V, (1, 10))
    with torch.no_grad():
        want = m.generate(
            torch.tensor(enc), max_new_tokens=8, do_sample=False,
            num_beams=1,
        )[0].tolist()
    got = generate(params, cfg, enc[0], n_new=8)
    # HF prepends decoder_start and may stop at eos
    want = want[1:]
    assert got[: len(want)] == want[: len(got)]

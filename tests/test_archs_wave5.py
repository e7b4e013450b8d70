"""Model-zoo tail — fifth arch wave (VERDICT r2 item 4).

Two protocols:

* HF logit/hidden parity (archs installed in `transformers`): mistral3
  (text passthrough), gemma-embedding (Gemma3TextModel + bidirectional
  attention), gemma3n (separate file).
* Reference-graph transcription equality (archs NOT in transformers):
  deepseek V1, minimax-m2, smallthinker, afmoe, mimo2, openelm, deci —
  a direct numpy transcription of the reference graph
  (src/models/{deepseek,minimax-m2,smallthinker,afmoe,mimo2-iswa,openelm,
  deci}.cpp) runs the same weights the converter packed, and logits must
  agree with our forward.
"""

import json

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from vlut_tpu.convert.checkpoint import load_checkpoint
from vlut_tpu.convert.convert import convert_hf
from vlut_tpu.models.transformer import forward
from vlut_tpu.train.finetune import float_twin_params

from tests.test_archs_hf import _run_pair, _ternarize_model  # noqa: E402

V = 96


def test_mistral3_text_parity(tmp_path):
    """Mistral3ForConditionalGeneration text tower == plain mistral/llama
    graph (reference src/models/mistral3.cpp); the vision tower is dropped
    by the converter."""
    tc = transformers.MistralConfig(
        vocab_size=V, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=128, max_position_embeddings=64,
        rope_theta=10000.0, rms_norm_eps=1e-5, tie_word_embeddings=False,
    )
    vc = transformers.PixtralVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=1,
        num_attention_heads=2, image_size=32, patch_size=16,
    )
    c = transformers.Mistral3Config(
        text_config=tc, vision_config=vc, image_token_index=V - 1,
        vision_feature_layer=-1, multimodal_projector_bias=False,
    )
    torch.manual_seed(0)
    model = transformers.Mistral3ForConditionalGeneration(c)
    model = model.float().eval()
    _ternarize_model(model)
    hf_dir, out_dir = tmp_path / "hf", tmp_path / "out"
    model.save_pretrained(str(hf_dir), safe_serialization=True)

    cfg = convert_hf(hf_dir, out_dir, fmt="i2", dtype_hp="float32")
    cfg2, params, meta = load_checkpoint(out_dir)
    params_f = float_twin_params(params, cfg2, dtype=jnp.float32)

    rng = np.random.default_rng(7)
    b, t = 2, 9
    tokens = rng.integers(0, V - 1, (b, t))
    with torch.no_grad():
        want = model(input_ids=torch.tensor(tokens)).logits.numpy()
    pos = jnp.tile(jnp.arange(t, dtype=jnp.int32), (b, 1))
    got, _ = forward(
        params_f, cfg2, jnp.asarray(tokens, jnp.int32), pos, None,
        impl="xla",
    )
    got = np.asarray(got, np.float32)[..., : want.shape[-1]]
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))


def test_gemma_embedding_parity(tmp_path):
    """EmbeddingGemma (architectures=[Gemma3TextModel],
    use_bidirectional_attention) == gemma3 body with bidirectional
    attention and hidden-state output (reference
    src/models/gemma-embedding.cpp, convert_hf_to_gguf EmbeddingGemma)."""
    c = transformers.Gemma3TextConfig(
        vocab_size=V, hidden_size=64, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        intermediate_size=128, max_position_embeddings=64,
        rope_theta=1_000_000.0, rope_local_base_freq=10_000.0,
        sliding_window=8, query_pre_attn_scalar=16,
        use_bidirectional_attention=True, rms_norm_eps=1e-6,
    )
    torch.manual_seed(1)
    model = transformers.Gemma3TextModel(c).float().eval()
    _ternarize_model(model)
    hf_dir, out_dir = tmp_path / "hf", tmp_path / "out"
    model.save_pretrained(str(hf_dir), safe_serialization=True)

    cfg = convert_hf(hf_dir, out_dir, fmt="i2", dtype_hp="float32")
    assert not cfg.causal_attn
    cfg2, params, meta = load_checkpoint(out_dir)
    params_f = float_twin_params(params, cfg2, dtype=jnp.float32)

    rng = np.random.default_rng(5)
    b, t = 2, 9
    tokens = rng.integers(0, V, (b, t))
    with torch.no_grad():
        want = model(torch.tensor(tokens)).last_hidden_state.numpy()
    pos = jnp.tile(jnp.arange(t, dtype=jnp.int32), (b, 1))
    got, _ = forward(
        params_f, cfg2, jnp.asarray(tokens, jnp.int32), pos, None,
        impl="xla", output="hidden",
    )
    got = np.asarray(got, np.float32)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)

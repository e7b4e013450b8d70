"""HF-transformers logit parity — fourth arch wave (final model-zoo gap).

Same protocol as test_archs_hf*.py: tiny random HF checkpoint with
exact-ternary projections -> convert -> run our forward on dequantized
float twins -> compare logits against ``transformers``.

Covers: gemma3 (per-layer LOCAL rope theta on SWA layers —
rope_local_base_freq) and qwen3vl-moe (stacked-expert softmax MoE on the
interleaved-M-RoPE body) — reference src/models/{gemma3,qwen3vl-moe}.cpp.
The remaining arch-zoo tail lives in tests/test_archs_wave5.py.
"""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from test_archs_hf2 import _run_pair, _ternarize_model

V, L = 96, 2


def _need(name):
    cls = getattr(transformers, name, None)
    if cls is None:
        pytest.skip(f"transformers lacks {name}")
    return cls


def test_gemma3_parity(tmp_path):
    """gemma3: SWA layers rope with rope_local_base_freq (NO scaling),
    global layers with the scaled global table; qk-norm, sandwich norms,
    query_pre_attn_scalar attention scale (reference
    src/models/gemma3.cpp + get_rope_freq_base per-layer dispatch)."""
    cls = _need("Gemma3ForCausalLM")
    c = transformers.Gemma3TextConfig(
        vocab_size=V, hidden_size=64, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        intermediate_size=128, max_position_embeddings=64,
        sliding_window=4, sliding_window_pattern=2,
        rope_theta=1_000_000.0, rope_local_base_freq=10_000.0,
        query_pre_attn_scalar=256,
    )
    torch.manual_seed(40)
    cfg = _run_pair(cls(c), tmp_path / "hf", tmp_path / "out", t=12)
    assert cfg.rope_theta_local == 10_000.0
    assert cfg.sliding_window == 4
    # layers 0, 2 slide; 1, 3 are global
    assert cfg.swa_flags() == (True, False, True, False)
    assert cfg.attn_scale == 256 ** -0.5 and cfg.qk_norm and cfg.post_norms


def test_qwen3vl_moe_text_parity(tmp_path):
    """qwen3vl-moe text model: qwen3vl body (per-head qk-norm,
    interleaved M-RoPE) + stacked-tensor softmax top-k renormalized MoE
    (Qwen3VLMoeTextExperts halves-split gate_up_proj) — reference
    src/models/qwen3vl-moe.cpp."""
    cls = _need("Qwen3VLMoeForConditionalGeneration")
    c = transformers.Qwen3VLMoeConfig(
        text_config=dict(
            vocab_size=V, hidden_size=32, num_hidden_layers=L,
            num_attention_heads=4, num_key_value_heads=2, head_dim=16,
            intermediate_size=64, moe_intermediate_size=32,
            num_experts=4, num_experts_per_tok=2,
            max_position_embeddings=64, rope_theta=10000.0,
            rope_scaling={"rope_type": "default",
                          "mrope_section": [4, 2, 2],
                          "mrope_interleaved": True},
        ),
        vision_config=dict(
            depth=1, hidden_size=32, num_heads=4, in_channels=3,
            patch_size=4, spatial_merge_size=2, temporal_patch_size=2,
            out_hidden_size=32, intermediate_size=64,
            num_position_embeddings=16, deepstack_visual_indexes=[],
        ),
        image_token_id=V - 1, vision_start_token_id=V - 2,
        video_token_id=V - 3,
    )
    torch.manual_seed(41)
    m = cls(c).float().eval()
    _ternarize_model(m)
    m.save_pretrained(str(tmp_path / "hf"), safe_serialization=True)

    from vlut_tpu.convert.checkpoint import load_checkpoint
    from vlut_tpu.convert.convert import convert_hf
    from vlut_tpu.models.transformer import forward
    from vlut_tpu.train.finetune import float_twin_params

    convert_hf(tmp_path / "hf", tmp_path / "out", dtype_hp="float32")
    cfg2, params, _ = load_checkpoint(tmp_path / "out")
    pf = float_twin_params(params, cfg2, dtype=jnp.float32)
    assert cfg2.qk_norm and cfg2.n_experts == 4 and cfg2.moe_norm_topk

    rng = np.random.default_rng(16)
    t = 8
    toks = rng.integers(0, V - 3, (1, t))
    with torch.no_grad():
        want = m.model.language_model(
            input_ids=torch.tensor(toks)
        ).last_hidden_state
        want = (m.lm_head(want)).numpy()
    pos = jnp.arange(t, dtype=jnp.int32)[None, :]
    got, _ = forward(
        pf, cfg2, jnp.asarray(toks, jnp.int32), pos, None, impl="xla"
    )
    got = np.asarray(got, np.float32)[..., : want.shape[-1]]
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))

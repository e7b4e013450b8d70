"""Audio multimodal tests (reference: tools/mtmd audio path —
mtmd-audio.cpp + models/whisper-enc.cpp)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from vlut_tpu.models.audio import (
    AudioConfig,
    encode,
    init_params,
    load_wav,
    log_mel,
    mel_filterbank,
)

TINY = AudioConfig(
    n_mels=16, n_fft=64, hop=32, sample_rate=1600, d_model=32,
    n_layers=2, n_heads=4, d_ff=64, n_ctx=128, d_llm=48,
    projector="ultravox", stack_factor=4, proj_hidden=40,
)


def test_mel_filterbank_properties():
    fb = mel_filterbank(TINY)
    assert fb.shape == (16, 33)
    assert (fb >= 0).all()
    # every filter has support; centers rise monotonically
    assert (fb.sum(1) > 0).all()
    centers = fb.argmax(1)
    assert (np.diff(centers) >= 0).all()


def test_log_mel_shape_and_range():
    rng = np.random.default_rng(0)
    samples = rng.standard_normal(1600).astype(np.float32)  # 1 s
    mel = log_mel(samples, TINY)
    assert mel.shape[1] == TINY.n_mels
    assert np.isfinite(mel).all()
    # whisper normalization: (clamp(log10, max-8) + 4) / 4 — spans <= 2
    assert mel.max() - mel.min() <= 2.0 + 1e-6


def test_encode_shapes_ultravox():
    params = init_params(TINY, seed=0)
    mel = log_mel(np.zeros(1600, np.float32), TINY)
    out = encode(params, TINY, np.asarray(mel))
    # conv stride 2 then stack_factor grouping
    t2 = mel.shape[0] // 2 + mel.shape[0] % 2
    expect_t = -(-t2 // TINY.stack_factor)
    assert out.shape == (expect_t, TINY.d_llm)
    assert np.isfinite(np.asarray(out)).all()


def test_encode_shapes_qwen2a():
    cfg = AudioConfig(**{**TINY.__dict__, "projector": "qwen2a"})
    params = init_params(cfg, seed=1)
    mel = log_mel(np.zeros(1600, np.float32), cfg)
    out = encode(params, cfg, np.asarray(mel))
    assert out.shape[1] == cfg.d_llm
    assert np.isfinite(np.asarray(out)).all()


def test_load_wav_roundtrip(tmp_path):
    from vlut_tpu.runtime.tts import save_wav

    audio = np.sin(np.linspace(0, 60, 3200)).astype(np.float32) * 0.5
    p = str(tmp_path / "t.wav")
    save_wav(p, audio, 1600)
    back = load_wav(p, TINY)
    assert back.shape == (3200,)
    np.testing.assert_allclose(back, audio, atol=2e-4)
    # resample path: read at half rate
    cfg2 = AudioConfig(**{**TINY.__dict__, "sample_rate": 800})
    half = load_wav(p, cfg2)
    assert abs(half.shape[0] - 1600) <= 1


def test_injection_into_decoder():
    """Audio embeddings splice through forward(token_embeds=...) exactly
    like vision patches."""
    import jax.numpy as jnp

    from vlut_tpu.config import PRESETS
    from vlut_tpu.models.transformer import forward
    from vlut_tpu.models.transformer import init_params as llm_init
    from vlut_tpu.models.vision import build_multimodal_embeds

    cfg = PRESETS["tiny"]
    acfg = AudioConfig(**{**TINY.__dict__, "d_llm": cfg.d_model})
    lparams = llm_init(cfg, seed=0)
    aparams = init_params(acfg, seed=0)
    mel = log_mel(np.zeros(1600, np.float32), acfg)
    emb = encode(aparams, acfg, np.asarray(mel))
    seq = build_multimodal_embeds(lparams, emb, [1, 2], [3])
    t = seq.shape[0]
    logits, _ = forward(
        lparams, cfg, jnp.zeros((1, t), jnp.int32),
        jnp.arange(t, dtype=jnp.int32)[None], None,
        token_embeds=seq[None],
    )
    assert np.isfinite(np.asarray(logits)).all()


def test_voxtral_parity(tmp_path):
    """Voxtral audio projector vs HF get_audio_features (reference
    PROJECTOR_TYPE_VOXTRAL, tools/mtmd/whisper-enc.cpp mm MLP branch):
    whisper encoder -> intermediate-width frame stacking -> no-bias
    GELU MLP."""
    import pytest
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from vlut_tpu.models.audio import convert_hf_audio, load_audio_encoder

    c = transformers.VoxtralConfig(
        audio_config=dict(
            num_mel_bins=16, num_hidden_layers=2, num_attention_heads=4,
            hidden_size=32, max_source_positions=64,
            intermediate_size=64,
        ),
        text_config=dict(
            vocab_size=96, hidden_size=48, num_hidden_layers=1,
            num_attention_heads=4, num_key_value_heads=2,
            intermediate_size=64, max_position_embeddings=64,
        ),
    )
    torch.manual_seed(90)
    m = transformers.VoxtralForConditionalGeneration(c).float().eval()
    with torch.no_grad():
        for _, p in m.named_parameters():
            p.copy_(0.05 * torch.randn_like(p))
    m.save_pretrained(str(tmp_path / "hf"), safe_serialization=True)

    cfg = convert_hf_audio(str(tmp_path / "hf"), str(tmp_path / "out"),
                           d_llm=48)
    assert cfg.projector == "voxtral" and cfg.stack_factor == 2
    cfg2, params = load_audio_encoder(str(tmp_path / "out"))

    rng = np.random.default_rng(7)
    # T = 2 * max_source_positions mel frames -> encoder T/2 positions
    mel = rng.standard_normal((16, 128)).astype(np.float32)
    with torch.no_grad():
        want = m.get_audio_features(torch.tensor(mel)[None]).numpy()
    got = np.asarray(encode(params, cfg2, jnp.asarray(mel.T)))
    np.testing.assert_allclose(got.reshape(want.shape), want,
                               rtol=2e-4, atol=2e-5)


def test_encode_shapes_music_flamingo_and_glma():
    """Round-5 audio projector variants (reference whisper-enc.cpp:89-105):
    music-flamingo = biased erf-GELU MLP on raw frames; glm-a = biased
    pre-LayerNorm + frame stacking + biased MLP + BOI/EOI brackets."""
    cfg = AudioConfig(**{**TINY.__dict__, "projector": "music_flamingo"})
    params = init_params(cfg, seed=2)
    mel = log_mel(np.zeros(1600, np.float32), cfg)
    out = encode(params, cfg, np.asarray(mel))
    t2 = mel.shape[0] // 2 + mel.shape[0] % 2
    assert out.shape == (t2, cfg.d_llm)
    assert np.isfinite(np.asarray(out)).all()

    cfg = AudioConfig(**{**TINY.__dict__, "projector": "glma",
                         "stack_factor": 2})
    params = init_params(cfg, seed=3)
    out = encode(params, cfg, np.asarray(mel))
    expect_t = -(-t2 // 2) + 2  # stacked frames + BOI + EOI
    assert out.shape == (expect_t, cfg.d_llm)
    assert np.isfinite(np.asarray(out)).all()
    # BOI/EOI rows are the learned embeddings verbatim
    np.testing.assert_allclose(
        np.asarray(out[0]), np.asarray(params["proj"]["boi"]), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out[-1]), np.asarray(params["proj"]["eoi"]), atol=1e-6)

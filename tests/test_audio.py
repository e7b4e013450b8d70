"""Audio multimodal tests (reference: tools/mtmd audio path —
mtmd-audio.cpp + models/whisper-enc.cpp)."""

from __future__ import annotations

import jax
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


def test_lfm2a_conformer_twin():
    """LFM2-Audio conformer encoder vs a torch transcription of the
    reference graph (tools/mtmd/models/conformer.cpp): conv subsampling
    (full/depthwise stride-2 stages), macaron blocks with Transformer-XL
    relative-position attention (pos_bias_u/v + rel-shift), sigmoid-GLU
    depthwise conv module, LN + erf-GELU adapter.  The rel-shift twin
    uses the NeMo pad/view formulation to pin my gather indexing."""
    import torch

    from vlut_tpu.models.audio import (
        ConformerConfig,
        conformer_encode,
        rel_pos_emb,
    )

    cfg = ConformerConfig(
        n_mels=16, d_sub=8, d_model=32, n_layers=2, n_heads=4, d_ff=48,
        conv_kernel=5, d_llm=40,
    )
    rng = np.random.default_rng(76)

    def t(*s, scale=0.1):
        return rng.standard_normal(s).astype(np.float32) * scale

    L, d, C = cfg.n_layers, cfg.d_model, cfg.d_sub
    params = {
        "sub0_w": t(3, 3, 1, C), "sub0_b": t(C),
        "sub2_w": t(3, 3, 1, C), "sub2_b": t(C),
        "sub3_w": t(1, 1, C, C), "sub3_b": t(C),
        "sub5_w": t(3, 3, 1, C), "sub5_b": t(C),
        "sub6_w": t(1, 1, C, C), "sub6_b": t(C),
        "sub_out_w": t(2 * C, d), "sub_out_b": t(d),
        "ada_ln_w": 1.0 + t(d), "ada_ln_b": t(d),
        "ada_w1": t(d, 64), "ada_b1": t(64),
        "ada_w2": t(64, cfg.d_llm), "ada_b2": t(cfg.d_llm),
        "layers": {},
    }
    hd = d // 4
    lay = {
        "ff1_ln_w": 1.0 + t(L, d), "ff1_ln_b": t(L, d),
        "ff1_up_w": t(L, d, cfg.d_ff), "ff1_up_b": t(L, cfg.d_ff),
        "ff1_down_w": t(L, cfg.d_ff, d), "ff1_down_b": t(L, d),
        "attn_ln_w": 1.0 + t(L, d), "attn_ln_b": t(L, d),
        "wq": t(L, d, d), "bq": t(L, d),
        "wk": t(L, d, d), "bk": t(L, d),
        "wv": t(L, d, d), "bv": t(L, d),
        "wo": t(L, d, d), "bo": t(L, d),
        "pos_w": t(L, d, d),
        "pos_bias_u": t(L, 4, hd), "pos_bias_v": t(L, 4, hd),
        "conv_ln_w": 1.0 + t(L, d), "conv_ln_b": t(L, d),
        "pw1_w": t(L, d, 2 * d), "pw1_b": t(L, 2 * d),
        "dw_w": t(L, cfg.conv_kernel, d), "dw_b": t(L, d),
        "conv_norm_w": 1.0 + t(L, d), "conv_norm_b": t(L, d),
        "pw2_w": t(L, d, d), "pw2_b": t(L, d),
        "ff2_ln_w": 1.0 + t(L, d), "ff2_ln_b": t(L, d),
        "ff2_up_w": t(L, d, cfg.d_ff), "ff2_up_b": t(L, cfg.d_ff),
        "ff2_down_w": t(L, cfg.d_ff, d), "ff2_down_b": t(L, d),
        "out_ln_w": 1.0 + t(L, d), "out_ln_b": t(L, d),
    }
    params["layers"] = lay
    mel = rng.standard_normal((32, 16)).astype(np.float32)

    def torch_ref():
        x = torch.tensor(mel)[None, None]              # (1,1,T,F)

        def c2(x, w, b, stride, groups=1, pad=1):
            wt = torch.tensor(w).permute(3, 2, 0, 1)   # HWIO -> OIHW
            return torch.nn.functional.conv2d(
                x, wt, torch.tensor(b), stride=stride, padding=pad,
                groups=groups)

        x = torch.relu(c2(x, params["sub0_w"], params["sub0_b"], 2))
        # depthwise stage: HWIO (3,3,1,C) with groups=C
        x = c2(x, params["sub2_w"], params["sub2_b"], 2, groups=C)
        x = c2(x, params["sub3_w"], params["sub3_b"], 1, pad=0)
        x = torch.relu(x)
        x = c2(x, params["sub5_w"], params["sub5_b"], 2, groups=C)
        x = c2(x, params["sub6_w"], params["sub6_b"], 1, pad=0)
        x = torch.relu(x)
        # (1, C, T', F') -> (T', F'*C) matching NHWC flatten (f, c minor)
        x = x.permute(0, 2, 3, 1).reshape(x.shape[2], -1)
        x = x @ torch.tensor(params["sub_out_w"]) + torch.tensor(
            params["sub_out_b"])
        T = x.shape[0]
        pos = torch.tensor(rel_pos_emb(T, d))

        def ln(v, w, b):
            return torch.nn.functional.layer_norm(
                v, (v.shape[-1],), torch.tensor(np.asarray(w)),
                torch.tensor(np.asarray(b)), 1e-5)

        for i in range(L):
            g = lambda nm: torch.tensor(np.asarray(lay[nm][i]))  # noqa
            res = x
            h = ln(x, lay["ff1_ln_w"][i], lay["ff1_ln_b"][i])
            h = torch.nn.functional.silu(h @ g("ff1_up_w") + g("ff1_up_b"))
            res = res + 0.5 * (h @ g("ff1_down_w") + g("ff1_down_b"))
            h = ln(res, lay["attn_ln_w"][i], lay["attn_ln_b"][i])
            q = (h @ g("wq") + g("bq")).reshape(T, 4, hd)
            k = (h @ g("wk") + g("bk")).reshape(T, 4, hd)
            v = (h @ g("wv") + g("bv")).reshape(T, 4, hd)
            p = (pos @ g("pos_w")).reshape(-1, 4, hd)
            ac = torch.einsum("qhd,khd->hqk", q + g("pos_bias_u"), k)
            bd = torch.einsum("qhd,phd->hqp", q + g("pos_bias_v"), p)
            # NeMo rel_shift: pad left on p, view, drop, truncate
            b4 = bd[None]                               # (1, h, q, p)
            b4 = torch.nn.functional.pad(b4, (1, 0))
            b4 = b4.view(1, 4, 2 * T, T)
            b4 = b4[:, :, 1:].view(1, 4, T, 2 * T - 1)[:, :, :, :T]
            scores = (ac + b4[0]) / np.sqrt(hd)
            att = torch.softmax(scores, -1)
            o = torch.einsum("hqk,khd->qhd", att, v).reshape(T, -1)
            res = res + (o @ g("wo") + g("bo"))
            h = ln(res, lay["conv_ln_w"][i], lay["conv_ln_b"][i])
            h = h @ g("pw1_w") + g("pw1_b")
            h = h[:, :d] * torch.sigmoid(h[:, d:])
            hp = h.t()[None]                            # (1, D, T)
            wdw = g("dw_w").t()[:, None, :]             # (D, 1, K)
            h = torch.nn.functional.conv1d(
                hp, wdw, padding=cfg.conv_kernel // 2,
                groups=d)[0].t() + g("dw_b")
            h = h * g("conv_norm_w") + g("conv_norm_b")
            h = torch.nn.functional.silu(h)
            res = res + (h @ g("pw2_w") + g("pw2_b"))
            h = ln(res, lay["ff2_ln_w"][i], lay["ff2_ln_b"][i])
            h = torch.nn.functional.silu(h @ g("ff2_up_w") + g("ff2_up_b"))
            res = res + 0.5 * (h @ g("ff2_down_w") + g("ff2_down_b"))
            x = ln(res, lay["out_ln_w"][i], lay["out_ln_b"][i])
        x = ln(x, params["ada_ln_w"], params["ada_ln_b"])
        h = torch.nn.functional.gelu(
            x @ torch.tensor(params["ada_w1"]) + torch.tensor(
                params["ada_b1"]))
        return (h @ torch.tensor(params["ada_w2"]) + torch.tensor(
            params["ada_b2"])).numpy()

    with torch.no_grad():
        want = torch_ref()
    got = np.asarray(conformer_encode(
        jax.tree.map(jnp.asarray, params), cfg, jnp.asarray(mel)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

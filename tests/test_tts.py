"""TTS pipeline tests (reference: tools/tts/tts.cpp).

The ISTFT test checks exactness against a direct numpy port of the
reference's O(n^2) DFT + fold (tts.cpp:115-281) — the JAX path must
reproduce the same waveform through batched irfft + scatter-free
overlap-add.
"""

from __future__ import annotations

import numpy as np

from vlut_tpu.models.vocoder import (
    VocoderConfig,
    decode_codes,
    init_params,
    load_vocoder,
    save_vocoder,
    spectrogram_to_audio,
)
from vlut_tpu.runtime.tts import (
    number_to_words,
    prepare_guide_tokens,
    process_text,
    replace_numbers_with_words,
    save_wav,
    speaker_data,
    speaker_text,
)


# ---------- reference-algorithm numpy port (test oracle) ----------

def _ref_irfft(n, inp_cplx):
    """tts.cpp:133-163: divides by N=n/2+1, no interior-bin doubling."""
    N = n // 2 + 1
    re_in, im_in = inp_cplx[0::2], inp_cplx[1::2]
    k = np.arange(n)[:, None]
    m = np.arange(N)[None, :]
    ang = 2.0 * np.pi * k * m / n
    return (re_in * np.cos(ang) - im_in * np.sin(ang)).sum(1) / N


def _ref_fold(data, n_out, n_win, n_hop, n_pad):
    """tts.cpp:165-199."""
    out = np.zeros(n_out)
    col = 0
    for w_col in range(n_out):
        start = w_col * n_hop - n_pad
        for w_im in range(start, start + n_win):
            if 0 <= w_im < n_out and col < data.size:
                out[w_im] += data[col]
            col += 1
    return out[: n_out - 2 * n_pad]


def _ref_embd_to_audio(embd, n_codes, n_embd):
    """tts.cpp:201-281 (mag/phase split, hann, fold, envelope norm)."""
    n_fft, n_hop, n_win = 1280, 320, 1280
    n_pad = (n_win - n_hop) // 2
    n_out = (n_codes - 1) * n_hop + n_win
    hann = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft))

    half = n_embd // 2
    S = np.zeros((half, n_codes, 2))
    for l in range(n_codes):
        mag = np.minimum(np.exp(embd[l, :half]), 1e2)
        phi = embd[l, half:]
        S[:, l, 0] = mag * np.cos(phi)
        S[:, l, 1] = mag * np.sin(phi)

    res = np.zeros((n_codes, n_fft))
    hann2 = np.zeros((n_codes, n_fft))
    for l in range(n_codes):
        inter = np.empty(2 * half)
        inter[0::2] = S[:, l, 0]
        inter[1::2] = S[:, l, 1]
        res[l] = _ref_irfft(n_fft, inter) * hann
        hann2[l] = hann * hann

    audio = _ref_fold(res.ravel(), n_out, n_win, n_hop, n_pad)
    env = _ref_fold(hann2.ravel(), n_out, n_win, n_hop, n_pad)
    return audio / env


def test_istft_matches_reference_port():
    rng = np.random.default_rng(0)
    cfg = VocoderConfig()
    t = 5
    embd = rng.standard_normal((t, cfg.n_out)).astype(np.float32)
    ours = np.asarray(spectrogram_to_audio(embd, cfg))
    ref = _ref_embd_to_audio(embd.astype(np.float64), t, cfg.n_out)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


# ---------- text processing ----------

def test_number_to_words():
    assert number_to_words("0") == "zero"
    assert number_to_words("42") == "forty-two"
    assert number_to_words("1234") == "one thousand two hundred thirty-four"
    assert number_to_words("3.14") == "three point one four"
    assert number_to_words("2000000") == "two million "


def test_process_text():
    out = process_text("Hello, World! I have 2 cats.")
    assert out == ("hello<|text_sep|>world<|text_sep|>i<|text_sep|>have"
                   "<|text_sep|>two<|text_sep|>cats")
    # 0.3 version uses <|space|>
    assert "<|space|>" in process_text("a b", version="0.3")
    assert replace_numbers_with_words("x 12 y") == "x twelve y"


def test_speaker_prompt_sections():
    spk = {"words": [
        {"word": "hi", "duration": 0.08, "codes": [3, 7]},
        {"word": "there", "duration": 0.2, "codes": [1]},
    ]}
    assert speaker_text(spk) == "<|text_start|>hi<|text_sep|>there<|text_sep|>"
    data = speaker_data(spk)
    assert data.startswith("<|audio_start|>\n")
    assert "hi<|t_0.08|><|code_start|><|3|><|7|><|code_end|>\n" in data
    # 0.3: no code_start, <|space|> terminator
    d3 = speaker_data(spk, version="0.3")
    assert "<|code_start|>" not in d3 and "<|space|>" in d3


class _FakeTok:
    """Minimal tokenizer: each char is a token (ord), '\\n' = 10."""

    def encode(self, text, add_bos=False):
        return [ord(c) for c in text]


def test_prepare_guide_tokens():
    toks = prepare_guide_tokens(_FakeTok(), "ab<|text_sep|>cd")
    assert toks == [10, ord("a"), ord("c")]


# ---------- vocoder graph ----------

def test_vocoder_decode_shapes_and_roundtrip(tmp_path):
    cfg = VocoderConfig(
        vocab_size=64, n_embd=16, posnet_d=32, convnext_d=32, n_ff=48,
        n_out=34, group_norm_groups=4, n_fft=32, hop=8,
    )
    params = init_params(cfg, seed=1)
    codes = np.array([1, 5, 9, 60, 2], np.int32)
    embd = decode_codes(params, cfg, codes)
    assert embd.shape == (5, cfg.n_out)
    assert np.isfinite(np.asarray(embd)).all()
    audio = spectrogram_to_audio(embd, cfg)
    # (T-1)*hop + n_fft - 2*pad samples with pad = (n_fft-hop)/2
    assert audio.shape == (4 * 8 + 32 - 2 * 12,)

    save_vocoder(tmp_path / "voc", cfg, params)
    cfg2, params2 = load_vocoder(tmp_path / "voc")
    assert cfg2 == cfg
    embd2 = decode_codes(params2, cfg2, codes)
    np.testing.assert_allclose(np.asarray(embd), np.asarray(embd2))


def test_vocoder_posnet_structure():
    cfg = VocoderConfig(posnet_layers=6)
    params = init_params(cfg)
    kinds = ["attn_q_w" in p and "attn" or
             "conv1_w" in p and "res" or "norm"
             for p in params["posnet"]]
    assert kinds == ["res", "res", "attn", "res", "res", "norm"]


def test_save_wav(tmp_path):
    import wave

    path = str(tmp_path / "x.wav")
    audio = np.sin(np.linspace(0, 100, 2400)).astype(np.float32)
    save_wav(path, audio, 24000)
    with wave.open(path) as f:
        assert f.getnchannels() == 1
        assert f.getframerate() == 24000
        assert f.getnframes() == 2400
        assert f.getsampwidth() == 2


# ---------- end-to-end on the tiny fixture ----------

class _CharTok:
    """Char-level stub tokenizer over the tiny preset vocab (no files)."""

    class _TK:
        all_special_ids = [1]

        def get_added_vocab(self):
            return {}

    def __init__(self, vocab):
        self.tk = self._TK()
        self.eos_id = 1
        self._vocab = vocab

    def encode(self, text, add_bos=False):
        return [ord(c) % self._vocab for c in text]


def test_tts_synthesize_tiny():
    """Full pipeline: tiny random LLM + tiny random vocoder -> waveform.

    The stub vocab has no <|N|> code tokens, so an explicit code_offset
    maps part of the LLM vocab onto vocoder codes; synthesize must yield
    a finite float32 waveform (empty allowed if no sampled token lands
    in range)."""
    from vlut_tpu.config import PRESETS
    from vlut_tpu.models.transformer import init_params as llm_init
    from vlut_tpu.runtime.tts import synthesize

    cfg = PRESETS["tiny"]
    params = llm_init(cfg, seed=0)
    tok = _CharTok(cfg.vocab_size)
    voc_cfg = VocoderConfig(
        vocab_size=cfg.vocab_size, n_embd=16, posnet_d=32, convnext_d=32,
        n_ff=48, n_out=34, group_norm_groups=4, n_fft=32, hop=8,
        sample_rate=2400,
    )
    voc_params = init_params(voc_cfg, seed=2)
    audio = synthesize(
        cfg, params, tok, "hi there", voc_cfg, voc_params,
        n_predict=16, code_offset=0, use_guide_tokens=True,
    )
    assert audio.dtype == np.float32
    assert np.isfinite(audio).all()

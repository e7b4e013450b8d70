"""OuteTTS-style text-to-speech pipeline (reference: tools/tts/tts.cpp).

Two models: a text-to-codes LLM (an ordinary decoder checkpoint served by
models/transformer.py — OuteTTS is a Qwen2-arch model whose vocab appends
~4100 `<|N|>` audio-code tokens) and a codes-to-speech WavTokenizer
decoder (models/vocoder.py).  The pipeline:

1. text normalization (`process_text`, tts.cpp:371-407): numbers to
   words, lowercase, strip punctuation, words joined by the version's
   separator token.
2. prompt = `<|im_start|>\\n` + speaker transcript + normalized text +
   `<|text_end|>\\n` + speaker code history (tts.cpp:433-437,500-535).
3. sampled decode (top-k 4, tts.cpp:546-547) with optional **guide
   tokens** (tts.cpp:439-464,869-880): after each newline token the next
   sampled non-control token is replaced by the first token of the next
   input word, keeping long prompts on-script.
4. keep only audio-code tokens, subtract the code-range base
   (tts.cpp:962-971), run the vocoder + ISTFT, mute the first 0.25 s
   (tts.cpp:1048-1050), write 16-bit mono WAV (tts.cpp:94-113).

Host-side sampling: guide-token forcing is inherently data-dependent, so
the decode loop samples on host between jitted single-token forwards —
TTS utterances are short and this path is latency-tolerant.
"""

from __future__ import annotations

import re
import wave
from typing import Any

import numpy as np

_ONES = [
    "zero", "one", "two", "three", "four", "five", "six", "seven", "eight",
    "nine", "ten", "eleven", "twelve", "thirteen", "fourteen", "fifteen",
    "sixteen", "seventeen", "eighteen", "nineteen",
]
_TENS = {2: "twenty", 3: "thirty", 4: "forty", 5: "fifty", 6: "sixty",
         7: "seventy", 8: "eighty", 9: "ninety"}


def _under_1000(num: int) -> str:
    out = ""
    if num >= 100:
        out += _ONES[num // 100] + " hundred "
        num %= 100
    if num >= 20:
        out += _TENS[num // 10]
        if num % 10:
            out += "-" + _ONES[num % 10]
    elif num > 0:
        out += _ONES[num]
    return out


def number_to_words(number_str: str) -> str:
    """tts.cpp:316-342 semantics (billions/millions/thousands + ' point'
    digit-by-digit decimals; unparsable -> single space)."""
    try:
        dot = number_str.find(".")
        n = int(number_str[:dot] if dot >= 0 else number_str)
        out = ""
        if n == 0:
            out = "zero"
        else:
            for scale, name in ((10**9, "billion"), (10**6, "million"),
                                (10**3, "thousand")):
                if n >= scale:
                    out += _under_1000(n // scale) + f" {name} "
                    n %= scale
            if n > 0:
                out += _under_1000(n)
        if dot >= 0:
            out += " point"
            for digit in number_str[dot + 1:]:
                out += " " + _ONES[int(digit)]
        return out
    except (ValueError, IndexError):
        return " "


def replace_numbers_with_words(text: str) -> str:
    return re.sub(r"\d+(\.\d+)?", lambda m: number_to_words(m.group()), text)


def separator(version: str) -> str:
    return "<|space|>" if version == "0.3" else "<|text_sep|>"


def process_text(text: str, version: str = "0.2") -> str:
    """OuteTTS prompt normalization (tts.cpp:371-407)."""
    t = replace_numbers_with_words(text).lower()
    t = re.sub(r"[-_/,\.\\]", " ", t)
    t = re.sub(r"[^a-z\s]", "", t)
    t = re.sub(r"\s+", " ", t).strip()
    return re.sub(r"\s", separator(version), t)


def speaker_text(speaker: dict[str, Any], version: str = "0.2") -> str:
    """Speaker transcript section (tts.cpp:500-513)."""
    sep = separator(version)
    out = "<|text_start|>"
    for word in speaker["words"]:
        out += word["word"] + sep
    return out


def speaker_data(speaker: dict[str, Any], version: str = "0.2") -> str:
    """Speaker code-history section (tts.cpp:515-535)."""
    start = "" if version == "0.3" else "<|code_start|>"
    end = "<|space|>" if version == "0.3" else "<|code_end|>"
    out = "<|audio_start|>\n"
    for word in speaker["words"]:
        entry = f"{word['word']}<|t_{word['duration']:.2f}|>{start}"
        for code in word["codes"]:
            entry += f"<|{code}|>"
        out += entry + end + "\n"
    return out


def prepare_guide_tokens(tok, processed: str, version: str = "0.2"
                         ) -> list[int]:
    """First token of each normalized word, led by the newline token
    (tts.cpp:439-464)."""
    nl = tok.encode("\n", add_bos=False)
    result = [nl[0]]
    for word in processed.split(separator(version)):
        ids = tok.encode(word, add_bos=False)
        if ids:
            result.append(ids[0])
    return result


def detect_code_range(tok) -> tuple[int, int]:
    """Locate the `<|N|>` audio-code token range in the TTC vocab.

    The reference hardcodes [151672, 155772] for the OuteTTS-0.2 qwen
    vocab (tts.cpp:962); we resolve `<|0|>` from the tokenizer so any
    retrained vocab works.
    """
    added = tok.tk.get_added_vocab() if hasattr(tok.tk, "get_added_vocab") \
        else {}
    lo = added.get("<|0|>")
    if lo is None:
        ids = tok.encode("<|0|>", add_bos=False)
        if len(ids) != 1:
            raise ValueError(
                "cannot locate audio-code tokens (<|0|>) in the vocab; "
                "pass --code-offset"
            )
        lo = ids[0]
    hi = lo
    pat = re.compile(r"^<\|(\d+)\|>$")
    for tok_str, tid in added.items():
        m = pat.match(tok_str)
        if m and tid - int(m.group(1)) == lo:
            hi = max(hi, tid)
    return lo, hi if hi > lo else lo + 4100


def _sample_top_k(logits: np.ndarray, k: int, rng: np.random.Generator,
                  temp: float = 1.0) -> int:
    idx = np.argpartition(logits, -k)[-k:]
    z = logits[idx].astype(np.float64) / max(temp, 1e-6)
    z -= z.max()
    p = np.exp(z)
    p /= p.sum()
    return int(rng.choice(idx, p=p))


def generate_codes(
    cfg, params, tok, prompt_ids: list[int],
    guide_tokens: list[int] | None = None,
    n_predict: int = 4096, top_k: int = 4, seed: int = 0,
    max_ctx: int = 8192,
) -> list[int]:
    """TTC decode loop with guide-token forcing (tts.cpp:846-942).

    Returns the raw generated token stream (codes + markup); the caller
    filters to the audio-code range.
    """
    import jax
    import jax.numpy as jnp

    from vlut_tpu.models.transformer import (
        forward, fuse_projections, init_kv_cache, unstack_layers,
    )

    p2 = unstack_layers(fuse_projections(params, cfg), cfg)
    ctx = min(max_ctx, cfg.max_seq_len)
    cache = init_kv_cache(cfg, 1, max_len=ctx, layout="layers")
    t = len(prompt_ids)
    assert t < ctx, (t, ctx)
    logits, cache = forward(
        p2, cfg, jnp.asarray([prompt_ids], jnp.int32),
        jnp.arange(t, dtype=jnp.int32)[None], cache,
        logits_at=jnp.asarray([t - 1], jnp.int32),
    )

    @jax.jit
    def step(p2, cache, token, pos):
        lg, cache = forward(
            p2, cfg, token[None, None], pos[None, None], cache,
        )
        return lg[0, 0], cache

    rng = np.random.default_rng(seed)
    eos = tok.eos_id
    newline = tok.encode("\n", add_bos=False)[0]
    control = set(tok.tk.all_special_ids) | set(
        (tok.tk.get_added_vocab() or {}).values()
        if hasattr(tok.tk, "get_added_vocab") else ()
    )
    guide = list(guide_tokens or [])
    uses_guide = True
    out: list[int] = []
    lg = np.asarray(logits[0, 0, : cfg.vocab_size], np.float32)
    for i in range(n_predict):
        nxt = _sample_top_k(lg, top_k, rng)
        if guide and uses_guide and nxt not in control and nxt != eos:
            nxt = guide.pop(0)
        uses_guide = nxt == newline
        out.append(nxt)
        if nxt == eos or t + 1 >= ctx:
            break
        lg_d, cache = step(p2, cache, jnp.int32(nxt), jnp.int32(t))
        lg = np.asarray(lg_d[: cfg.vocab_size], np.float32)
        t += 1
    return out


def codes_to_audio(codes: list[int], voc_cfg, voc_params) -> np.ndarray:
    """Vocoder + ISTFT + initial mute (tts.cpp:1008-1050)."""
    import jax.numpy as jnp

    from vlut_tpu.models.vocoder import decode_codes, spectrogram_to_audio

    embd = decode_codes(voc_params, voc_cfg, jnp.asarray(codes, jnp.int32))
    audio = np.array(spectrogram_to_audio(embd, voc_cfg), np.float32)
    mute = min(voc_cfg.sample_rate // 4, audio.shape[0])
    audio[:mute] = 0.0
    return audio


def save_wav(path: str, audio: np.ndarray, sample_rate: int) -> None:
    """16-bit mono PCM (tts.cpp:94-113)."""
    pcm = np.clip(audio * 32767.0, -32768, 32767).astype("<i2")
    with wave.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(pcm.tobytes())


def synthesize(
    cfg, params, tok, text: str,
    voc_cfg, voc_params,
    speaker: dict[str, Any] | None = None,
    version: str | None = None,
    use_guide_tokens: bool = False,
    n_predict: int = 4096, top_k: int = 4, seed: int = 0,
    code_offset: int | None = None,
) -> np.ndarray:
    """Full text -> waveform pipeline. Returns float32 audio in [-1, 1]."""
    if version is None:
        version = str(speaker.get("version", "0.2")) if speaker else "0.2"
    processed = process_text(text, version)

    ids = tok.encode("<|im_start|>\n", add_bos=True)
    if speaker:
        ids += tok.encode(speaker_text(speaker, version), add_bos=False)
    else:
        ids += tok.encode("<|text_start|>", add_bos=False)
    ids += tok.encode(processed, add_bos=False)
    ids += tok.encode("<|text_end|>\n", add_bos=False)
    if speaker:
        ids += tok.encode(speaker_data(speaker, version), add_bos=False)
    else:
        ids += tok.encode("<|audio_start|>\n", add_bos=False)

    guide = (prepare_guide_tokens(tok, processed, version)
             if use_guide_tokens else None)
    toks = generate_codes(cfg, params, tok, ids, guide_tokens=guide,
                          n_predict=n_predict, top_k=top_k, seed=seed)

    if code_offset is None:
        lo, hi = detect_code_range(tok)
    else:
        lo, hi = code_offset, code_offset + 4100
    codes = [t - lo for t in toks if lo <= t <= hi]
    if not codes:
        return np.zeros((0,), np.float32)
    return codes_to_audio(codes, voc_cfg, voc_params)

"""Audio encoder + projector (reference: tools/mtmd audio path —
mtmd-audio.cpp preprocessing + models/whisper-enc.cpp graph).

Whisper-style encoder feeding audio embeddings into the decoder as tokens:
log-mel frontend (host numpy — preprocessing is host-side in the reference
too), a 2-conv GELU stem with stride-2 downsampling, a pre-LN transformer
encoder (LayerNorm with bias; q/v biases, no k bias —
whisper-enc.cpp:28-31), and a projector into the decoder embedding space:

- "ultravox": StackAudioFrames (concat `stack` consecutive frames) +
  RMSNorm + SwiGLU MLP with the *swapped* halves (whisper-enc.cpp:55-73)
- "qwen2a":   single linear + bias (whisper-enc.cpp:76-79)

Embeddings splice into the decoder through `forward`'s ``token_embeds``
injection exactly like vision patches (models/vision.py).

The mel frontend mirrors mtmd-audio.cpp: slaney-scale filterbank
(:74-124), log10 with 1e-10 floor (:281), clamp to max-8 then (x+4)/4
(:416-430) — whisper's standard normalization.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class AudioConfig:
    n_mels: int = 128
    n_fft: int = 400
    hop: int = 160
    sample_rate: int = 16000
    chunk_len_s: int = 30          # whisper fixed 30 s chunks
    d_model: int = 1280            # whisper-large-v3 encoder width
    n_layers: int = 32
    n_heads: int = 20
    d_ff: int = 5120
    n_ctx: int = 1500              # post-stride-2 positions (30 s)
    layer_norm_eps: float = 1e-5
    d_llm: int = 4096              # decoder embedding width
    projector: str = "ultravox"    # "ultravox" | "qwen2a"
    stack_factor: int = 8          # ultravox StackAudioFrames
    proj_hidden: int = 4096        # ultravox swiglu hidden width


def mel_filterbank(cfg: AudioConfig) -> np.ndarray:
    """(n_mels, n_fft//2+1) slaney-scale triangular filters with area
    normalization (mtmd-audio.cpp:58-124, matches librosa defaults)."""
    fmin, fmax = 0.0, 0.5 * cfg.sample_rate
    min_log_hz = 1000.0
    lin_slope = 3.0 / 200.0
    min_log_mel = min_log_hz * lin_slope
    log_step = np.log(6.4) / 27.0

    def hz_to_mel(f):
        f = np.asarray(f, np.float64)
        return np.where(
            f < min_log_hz, f * lin_slope,
            min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz)
            / log_step,
        )

    def mel_to_hz(m):
        m = np.asarray(m, np.float64)
        return np.where(
            m < min_log_mel, m / lin_slope,
            min_log_hz * np.exp((m - min_log_mel) * log_step),
        )

    mel_pts = np.linspace(
        hz_to_mel(fmin), hz_to_mel(fmax), cfg.n_mels + 2
    )
    hz = mel_to_hz(mel_pts)
    n_bins = cfg.n_fft // 2 + 1
    f = np.arange(n_bins) * (cfg.sample_rate / cfg.n_fft)
    left, center, right = hz[:-2, None], hz[1:-1, None], hz[2:, None]
    up = (f[None] - left) / np.maximum(center - left, 1e-30)
    down = (right - f[None]) / np.maximum(right - center, 1e-30)
    w = np.maximum(0.0, np.minimum(up, down))
    enorm = 2.0 / np.maximum(right[:, 0] - left[:, 0], 1e-30)
    return (w * enorm[:, None]).astype(np.float32)


def log_mel(samples: np.ndarray, cfg: AudioConfig) -> np.ndarray:
    """(n_samples,) mono float -> (n_frames, n_mels) normalized log-mel.

    Hann window (periodic), power spectrum, slaney mel, log10 floored at
    1e-10, clamp to global max-8, (x+4)/4 (mtmd-audio.cpp:281,416-430).
    Pads to a full hop so every sample lands in a frame; callers wanting
    whisper's fixed 30 s chunks pad/trim `samples` first.
    """
    n_fft, hop = cfg.n_fft, cfg.hop
    pad = n_fft // 2
    x = np.pad(samples.astype(np.float64), (pad, pad), mode="reflect")
    n_frames = 1 + (len(x) - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = x[idx] * (
        0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft))
    )
    power = np.abs(np.fft.rfft(frames, axis=-1)) ** 2
    mel = power @ mel_filterbank(cfg).T                # (T, n_mels)
    logm = np.log10(np.maximum(mel, 1e-10))
    logm = np.maximum(logm, logm.max() - 8.0)
    return (((logm + 4.0) / 4.0)).astype(np.float32)


def _ln(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + eps) * w + b


def _rms(x, w, eps=1e-6):
    xf = x.astype(jnp.float32)
    return xf * jax.lax.rsqrt((xf * xf).mean(-1, keepdims=True) + eps) * w


def _conv1d(x, w, b, stride=1):
    """x: (C_in, T); w: (C_out, C_in, K); SAME-ish padding K//2
    (ggml_conv_1d_ph)."""
    k = w.shape[-1]
    y = jax.lax.conv_general_dilated(
        x[None], w, window_strides=(stride,),
        padding=[(k // 2, k // 2)],
        dimension_numbers=("NCH", "OIH", "NCH"),
    )[0]
    return y + b[:, None]


def init_params(cfg: AudioConfig, seed: int = 0,
                dtype=jnp.float32) -> dict[str, Any]:
    rng = np.random.default_rng(seed)
    d, f, L = cfg.d_model, cfg.d_ff, cfg.n_layers

    def rand(*shape, s=0.02):
        return jnp.asarray(rng.standard_normal(shape) * s, dtype)

    layers = {
        "ln1_w": jnp.ones((L, d), jnp.float32),
        "ln1_b": jnp.zeros((L, d), jnp.float32),
        "ln2_w": jnp.ones((L, d), jnp.float32),
        "ln2_b": jnp.zeros((L, d), jnp.float32),
        # whisper attention: q and v carry biases, k does not
        "wq": rand(L, d, d), "bq": jnp.zeros((L, d), dtype),
        "wk": rand(L, d, d),
        "wv": rand(L, d, d), "bv": jnp.zeros((L, d), dtype),
        "wo": rand(L, d, d), "bo": jnp.zeros((L, d), dtype),
        "w1": rand(L, d, f), "b1": jnp.zeros((L, f), dtype),
        "w2": rand(L, f, d), "b2": jnp.zeros((L, d), dtype),
    }
    params: dict[str, Any] = {
        "conv1_w": rand(d, cfg.n_mels, 3), "conv1_b": jnp.zeros((d,), dtype),
        "conv2_w": rand(d, d, 3), "conv2_b": jnp.zeros((d,), dtype),
        "pos": rand(cfg.n_ctx, d),
        "layers": layers,
        "post_ln_w": jnp.ones((d,), jnp.float32),
        "post_ln_b": jnp.zeros((d,), jnp.float32),
    }
    if cfg.projector == "ultravox":
        ds = d * cfg.stack_factor
        params["proj"] = {
            "norm_pre": jnp.ones((ds,), jnp.float32),
            "w1": rand(ds, 2 * cfg.proj_hidden),
            "norm_mid": jnp.ones((cfg.proj_hidden,), jnp.float32),
            "w2": rand(cfg.proj_hidden, cfg.d_llm),
        }
    elif cfg.projector == "voxtral":
        params["proj"] = {
            "w1": rand(d * cfg.stack_factor, cfg.d_llm),
            "w2": rand(cfg.d_llm, cfg.d_llm),
        }
    elif cfg.projector == "music_flamingo":
        params["proj"] = {
            "w1": rand(d, cfg.d_llm), "b1": jnp.zeros((cfg.d_llm,)),
            "w2": rand(cfg.d_llm, cfg.d_llm),
            "b2": jnp.zeros((cfg.d_llm,)),
        }
    elif cfg.projector == "glma":
        ds = d * cfg.stack_factor
        params["proj"] = {
            "norm_pre_w": jnp.ones((d,), jnp.float32),
            "norm_pre_b": jnp.zeros((d,), jnp.float32),
            "w1": rand(ds, cfg.d_llm), "b1": jnp.zeros((cfg.d_llm,)),
            "w2": rand(cfg.d_llm, cfg.d_llm),
            "b2": jnp.zeros((cfg.d_llm,)),
            "boi": rand(cfg.d_llm), "eoi": rand(cfg.d_llm),
        }
    else:  # qwen2a
        params["proj"] = {
            "fc_w": rand(d, cfg.d_llm), "fc_b": jnp.zeros((cfg.d_llm,)),
        }
    return params


def encode(params, cfg: AudioConfig, mel: jax.Array) -> jax.Array:
    """(T_frames, n_mels) log-mel -> (T_out, d_llm) decoder embeddings.

    Mirrors clip_graph_whisper_enc::build (whisper-enc.cpp:3-110):
    conv1d+gelu_erf, stride-2 conv1d+gelu_erf, +pos, pre-LN ViT,
    projector.
    """
    eps = cfg.layer_norm_eps
    x = _conv1d(mel.T.astype(jnp.float32),
                params["conv1_w"].astype(jnp.float32),
                params["conv1_b"].astype(jnp.float32))
    x = jax.nn.gelu(x, approximate=False)
    x = _conv1d(x, params["conv2_w"].astype(jnp.float32),
                params["conv2_b"].astype(jnp.float32), stride=2)
    x = jax.nn.gelu(x, approximate=False).T          # (T/2, d)
    t = x.shape[0]
    x = x + params["pos"][:t].astype(jnp.float32)

    lp = params["layers"]
    h = cfg.n_heads
    hd = cfg.d_model // h
    for il in range(cfg.n_layers):
        res = x
        y = _ln(x, lp["ln1_w"][il], lp["ln1_b"][il], eps)
        q = (y @ lp["wq"][il].astype(jnp.float32)
             + lp["bq"][il].astype(jnp.float32))
        k = y @ lp["wk"][il].astype(jnp.float32)
        v = (y @ lp["wv"][il].astype(jnp.float32)
             + lp["bv"][il].astype(jnp.float32))
        q = q.reshape(t, h, hd).transpose(1, 0, 2)
        k = k.reshape(t, h, hd).transpose(1, 0, 2)
        v = v.reshape(t, h, hd).transpose(1, 0, 2)
        att = jax.nn.softmax(
            (q @ k.transpose(0, 2, 1)) / np.sqrt(hd), axis=-1
        )
        y = (att @ v).transpose(1, 0, 2).reshape(t, cfg.d_model)
        y = (y @ lp["wo"][il].astype(jnp.float32)
             + lp["bo"][il].astype(jnp.float32))
        x = res + y
        res = x
        y = _ln(x, lp["ln2_w"][il], lp["ln2_b"][il], eps)
        y = jax.nn.gelu(y @ lp["w1"][il].astype(jnp.float32)
                        + lp["b1"][il].astype(jnp.float32),
                        approximate=False)
        y = y @ lp["w2"][il].astype(jnp.float32) \
            + lp["b2"][il].astype(jnp.float32)
        x = res + y

    x = _ln(x, params["post_ln_w"], params["post_ln_b"], eps)

    pr = params["proj"]
    if cfg.projector == "ultravox":
        # StackAudioFrames: pad T to a stack multiple, concat neighbors
        s = cfg.stack_factor
        pad = (-t) % s
        x = jnp.pad(x, ((0, pad), (0, 0)))
        x = x.reshape((t + pad) // s, s * cfg.d_model)
        x = _rms(x, pr["norm_pre"])
        g = x @ pr["w1"].astype(jnp.float32)
        half = g.shape[-1] // 2
        # swapped swiglu: the SECOND half goes through silu
        # (whisper-enc.cpp:65-66)
        g = jax.nn.silu(g[:, half:]) * g[:, :half]
        g = _rms(g, pr["norm_mid"])
        return g @ pr["w2"].astype(jnp.float32)
    if cfg.projector == "voxtral":
        # Voxtral (reference PROJECTOR_TYPE_VOXTRAL, whisper-enc.cpp mm
        # MLP branch; HF VoxtralForConditionalGeneration
        # .get_audio_features): stack consecutive frames so the row width
        # equals the encoder intermediate size, then no-bias GELU MLP
        s = cfg.stack_factor
        x = x[: t - t % s].reshape(t // s, s * cfg.d_model)
        g = jax.nn.gelu(x @ pr["w1"].astype(jnp.float32),
                        approximate=False)
        return g @ pr["w2"].astype(jnp.float32)
    if cfg.projector == "music_flamingo":
        # reference PROJECTOR_TYPE_MUSIC_FLAMINGO (whisper-enc.cpp:89):
        # biased erf-GELU MLP straight on the encoder frames
        g = jax.nn.gelu(
            x @ pr["w1"].astype(jnp.float32) + pr["b1"], approximate=False)
        return g @ pr["w2"].astype(jnp.float32) + pr["b2"]
    if cfg.projector == "glma":
        # reference PROJECTOR_TYPE_GLMA (whisper-enc.cpp:98): biased
        # LayerNorm pre-norm, frame stacking, biased GELU MLP, BOI/EOI
        # embedding rows bracketing the sequence
        x = _ln(x, pr["norm_pre_w"], pr["norm_pre_b"],
                cfg.layer_norm_eps)
        s = cfg.stack_factor
        pad = (-t) % s
        x = jnp.pad(x, ((0, pad), (0, 0)))
        x = x.reshape((t + pad) // s, s * cfg.d_model)
        g = jax.nn.gelu(
            x @ pr["w1"].astype(jnp.float32) + pr["b1"], approximate=True)
        x = g @ pr["w2"].astype(jnp.float32) + pr["b2"]
        return jnp.concatenate(
            [pr["boi"][None], x, pr["eoi"][None]], axis=0)
    return x @ pr["fc_w"].astype(jnp.float32) \
        + pr["fc_b"].astype(jnp.float32)


def load_wav(path: str, cfg: AudioConfig) -> np.ndarray:
    """16-bit PCM WAV -> mono float32 at cfg.sample_rate (nearest-sample
    resample; mtmd uses miniaudio — WAV keeps us dependency-free)."""
    import wave

    with wave.open(path) as f:
        sr = f.getframerate()
        n = f.getnframes()
        raw = np.frombuffer(f.readframes(n), dtype="<i2").astype(np.float32)
        raw = raw.reshape(-1, f.getnchannels()).mean(-1) / 32768.0
    if sr != cfg.sample_rate:
        idx = np.clip(
            (np.arange(int(len(raw) * cfg.sample_rate / sr))
             * (sr / cfg.sample_rate)).astype(np.int64),
            0, len(raw) - 1,
        )
        raw = raw[idx]
    return raw


def convert_hf_audio(src: str, dst: str, d_llm: int = 4096) -> AudioConfig:
    """HF ultravox/qwen2-audio checkpoint -> audio-encoder npz dir.

    Maps whisper-encoder names (audio_tower / model.audio_tower prefixes,
    standard whisper `encoder.layers.N.{self_attn,fc1,fc2}` structure) and
    the projector (`multi_modal_projector.linear_{1,2}` ultravox or
    `multi_modal_projector.linear` qwen2a).
    """
    import json as _json
    import pathlib as _pl

    src_p = _pl.Path(src)
    tensors: dict[str, np.ndarray] = {}
    from safetensors.numpy import load_file

    for fp in sorted(src_p.glob("*.safetensors")):
        tensors.update(load_file(str(fp)))

    def pick(*subs):
        for name, v in tensors.items():
            if all(s in name for s in subs):
                return np.asarray(v, np.float32)
        raise KeyError(f"no tensor matching {subs}")

    conv1 = pick("conv1.weight")
    n_layers = 1 + max(
        int(n.split("layers.")[1].split(".")[0])
        for n in tensors
        # ultravox/qwen2a nest ...encoder.layers.N; voxtral's tower is
        # flat audio_tower.layers.N
        if "encoder.layers." in n or "audio_tower.layers." in n
    )
    fc1 = pick("layers.0.fc1.weight")
    has_12 = any("linear_1" in n for n in tensors)
    # ultravox's projector carries ln_pre/ln_mid norms; voxtral's is the
    # bare no-bias linear_1/linear_2 GELU MLP over intermediate-width
    # stacked frames (reference PROJECTOR_TYPE_VOXTRAL)
    is_ultravox = has_12 and any("ln_mid" in n for n in tensors)
    is_voxtral = has_12 and not is_ultravox
    proj = ("ultravox" if is_ultravox
            else "voxtral" if is_voxtral else "qwen2a")
    heads = conv1.shape[0] // 64  # whisper convention fallback
    cfg_json = src_p / "config.json"
    if cfg_json.exists():
        ac = _json.loads(cfg_json.read_text()).get("audio_config", {})
        heads = ac.get("num_attention_heads",
                       ac.get("encoder_attention_heads", heads)) or heads
    cfg = AudioConfig(
        n_mels=conv1.shape[1], d_model=conv1.shape[0],
        n_layers=n_layers, d_ff=fc1.shape[0],
        n_heads=heads,
        projector=proj, d_llm=d_llm,
        stack_factor=(fc1.shape[0] // conv1.shape[0]
                      if is_voxtral else 8),
    )

    L, d = cfg.n_layers, cfg.d_model
    def stack(sub, transpose=True):
        out = []
        for i in range(L):
            w = pick(f"layers.{i}.{sub}")
            out.append(w.T if transpose and w.ndim == 2 else w)
        return np.stack(out)

    params = {
        "conv1_w": conv1, "conv1_b": pick("conv1.bias"),
        "conv2_w": pick("conv2.weight"), "conv2_b": pick("conv2.bias"),
        "pos": pick("embed_positions.weight"),
        "layers": {
            "ln1_w": stack("self_attn_layer_norm.weight", False),
            "ln1_b": stack("self_attn_layer_norm.bias", False),
            "ln2_w": stack("final_layer_norm.weight", False),
            "ln2_b": stack("final_layer_norm.bias", False),
            "wq": stack("self_attn.q_proj.weight"),
            "bq": stack("self_attn.q_proj.bias", False),
            "wk": stack("self_attn.k_proj.weight"),
            "wv": stack("self_attn.v_proj.weight"),
            "bv": stack("self_attn.v_proj.bias", False),
            "wo": stack("self_attn.out_proj.weight"),
            "bo": stack("self_attn.out_proj.bias", False),
            "w1": stack("fc1.weight"), "b1": stack("fc1.bias", False),
            "w2": stack("fc2.weight"), "b2": stack("fc2.bias", False),
        },
        "post_ln_w": pick("layer_norm.weight")
        if any("audio_tower.layer_norm." in n for n in tensors)
        else pick("encoder.layer_norm.weight"),
        "post_ln_b": pick("layer_norm.bias")
        if any("audio_tower.layer_norm." in n for n in tensors)
        else pick("encoder.layer_norm.bias"),
    }
    if is_ultravox:
        params["proj"] = {
            "norm_pre": pick("projector", "ln_pre.weight"),
            "w1": pick("projector", "linear_1.weight").T,
            "norm_mid": pick("projector", "ln_mid.weight"),
            "w2": pick("projector", "linear_2.weight").T,
        }
    elif is_voxtral:
        params["proj"] = {
            "w1": pick("projector", "linear_1.weight").T,
            "w2": pick("projector", "linear_2.weight").T,
        }
    else:
        params["proj"] = {
            "fc_w": pick("projector", "linear.weight").T,
            "fc_b": pick("projector", "linear.bias"),
        }

    out_p = _pl.Path(dst)
    out_p.mkdir(parents=True, exist_ok=True)
    (out_p / "audio_config.json").write_text(
        _json.dumps(dataclasses.asdict(cfg), indent=1)
    )
    flat: dict[str, np.ndarray] = {}

    def put(prefix, tree):
        if isinstance(tree, dict):
            for kk, vv in tree.items():
                put(f"{prefix}.{kk}" if prefix else kk, vv)
        else:
            flat[prefix] = np.asarray(tree)

    put("", params)
    np.savez(out_p / "audio.npz", **flat)
    return cfg


def load_audio_encoder(path: str) -> tuple[AudioConfig, dict[str, Any]]:
    import json as _json
    import pathlib as _pl

    p = _pl.Path(path)
    cfg = AudioConfig(**_json.loads((p / "audio_config.json").read_text()))
    data = np.load(p / "audio.npz")
    params: dict[str, Any] = {}
    for key in data.files:
        node = params
        parts = key.split(".")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = jnp.asarray(data[key])
    return cfg, params


# ---------------------------------------------------------------------------
# LFM2-Audio conformer encoder (reference PROJECTOR_TYPE_LFM2A,
# tools/mtmd/models/conformer.cpp): conv subsampling -> macaron conformer
# blocks with Transformer-XL relative-position attention -> LN + erf-GELU
# MLP audio adapter.
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ConformerConfig:
    n_mels: int = 128
    d_sub: int = 32        # subsampling conv channels
    d_model: int = 512
    n_layers: int = 16
    n_heads: int = 8
    d_ff: int = 2048
    conv_kernel: int = 9
    d_llm: int = 2048

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads


def _rel_shift(bd: jax.Array) -> jax.Array:
    """Transformer-XL relative shift (conformer.cpp rel-shift block):
    bd (H, Q, P=2Q-1) with relative positions ordered +max..-max ->
    bd'[h, i, j] = bd[h, i, j + (Q - 1) - i], truncated to (H, Q, Q)."""
    h, q, p = bd.shape
    idx = jnp.arange(q)[:, None] * 0 + jnp.arange(q)[None, :] \
        - jnp.arange(q)[:, None] + (q - 1)
    return jnp.take_along_axis(
        bd, jnp.broadcast_to(idx[None], (h, q, q)), axis=2)


def rel_pos_emb(t: int, d: int) -> np.ndarray:
    """Sinusoidal relative position table (2T-1, d), positions
    T-1 .. -(T-1) (NeMo RelPositionalEncoding order)."""
    pos = np.arange(t - 1, -t, -1, dtype=np.float64)
    inv = 1.0 / (10000.0 ** (np.arange(0, d, 2, dtype=np.float64) / d))
    ang = pos[:, None] * inv[None]
    out = np.zeros((2 * t - 1, d), np.float64)
    out[:, 0::2] = np.sin(ang)
    out[:, 1::2] = np.cos(ang)
    return out.astype(np.float32)


def conformer_encode(
    params, cfg: ConformerConfig, mel: jax.Array  # (T, n_mels)
) -> jax.Array:
    """(T, n_mels) -> (T/8, d_llm) decoder embeddings."""
    # --- conv subsampling: 3 stride-2 stages over (time, freq) ---------
    x = mel.astype(jnp.float32)[None, :, :, None]     # NHWC (1,T,F,1)

    def conv(x, w, b, stride, groups=1):
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(stride, stride),
            padding=[(1, 1), (1, 1)] if w.shape[0] == 3 else [(0, 0),
                                                              (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
        )
        return y + b

    x = jax.nn.relu(conv(x, params["sub0_w"], params["sub0_b"], 2))
    x = conv(x, params["sub2_w"], params["sub2_b"], 2, groups=cfg.d_sub)
    x = conv(x, params["sub3_w"], params["sub3_b"], 1)
    x = jax.nn.relu(x)
    x = conv(x, params["sub5_w"], params["sub5_b"], 2, groups=cfg.d_sub)
    x = conv(x, params["sub6_w"], params["sub6_b"], 1)
    x = jax.nn.relu(x)
    t_out, f_out = x.shape[1], x.shape[2]
    x = x[0].reshape(t_out, f_out * cfg.d_sub)        # (T', F'*C)
    x = x @ params["sub_out_w"] + params["sub_out_b"]  # (T', D)

    pos = jnp.asarray(rel_pos_emb(t_out, cfg.d_model))
    H, hd = cfg.n_heads, cfg.head_dim

    def ln(v, w, b):
        mu = v.mean(-1, keepdims=True)
        var = ((v - mu) ** 2).mean(-1, keepdims=True)
        return (v - mu) * jax.lax.rsqrt(var + 1e-5) * w + b

    L = params["layers"]
    for i in range(cfg.n_layers):
        lp = jax.tree.map(lambda a: a[i], L)
        res = x
        # macaron FFN 1 (silu, half residual)
        h = ln(x, lp["ff1_ln_w"], lp["ff1_ln_b"])
        h = jax.nn.silu(h @ lp["ff1_up_w"] + lp["ff1_up_b"])
        h = h @ lp["ff1_down_w"] + lp["ff1_down_b"]
        res = res + 0.5 * h
        # relative-position self-attention
        h = ln(res, lp["attn_ln_w"], lp["attn_ln_b"])
        q = (h @ lp["wq"] + lp["bq"]).reshape(t_out, H, hd)
        k = (h @ lp["wk"] + lp["bk"]).reshape(t_out, H, hd)
        v = (h @ lp["wv"] + lp["bv"]).reshape(t_out, H, hd)
        p = (pos @ lp["pos_w"]).reshape(-1, H, hd)     # (2T'-1, H, hd)
        ac = jnp.einsum("qhd,khd->hqk", q + lp["pos_bias_u"], k)
        bd = jnp.einsum("qhd,phd->hqp", q + lp["pos_bias_v"], p)
        scores = (ac + _rel_shift(bd)) / np.sqrt(hd)
        att = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("hqk,khd->qhd", att, v).reshape(t_out, -1)
        res = res + (o @ lp["wo"] + lp["bo"])
        # conv module
        h = ln(res, lp["conv_ln_w"], lp["conv_ln_b"])
        h = h @ lp["pw1_w"] + lp["pw1_b"]              # (T', 2D)
        half = h.shape[-1] // 2
        h = h[:, :half] * jax.nn.sigmoid(h[:, half:])  # sigmoid GLU
        # depthwise SAME conv over time (kernel K)
        kw = lp["dw_w"]                                # (K, D)
        kpad = cfg.conv_kernel // 2
        hp = jnp.pad(h, ((kpad, kpad), (0, 0)))
        h = jax.lax.conv_general_dilated(
            hp[None, :, :], kw[:, None, :].transpose(0, 1, 2),
            window_strides=(1,), padding=[(0, 0)],
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=h.shape[-1],
        )[0] + lp["dw_b"]
        h = h * lp["conv_norm_w"] + lp["conv_norm_b"]
        h = jax.nn.silu(h)
        h = h @ lp["pw2_w"] + lp["pw2_b"]
        res = res + h
        # macaron FFN 2 (half residual)
        h = ln(res, lp["ff2_ln_w"], lp["ff2_ln_b"])
        h = jax.nn.silu(h @ lp["ff2_up_w"] + lp["ff2_up_b"])
        h = h @ lp["ff2_down_w"] + lp["ff2_down_b"]
        res = res + 0.5 * h
        x = ln(res, lp["out_ln_w"], lp["out_ln_b"])

    # audio adapter: LN -> erf-GELU MLP
    x = ln(x, params["ada_ln_w"], params["ada_ln_b"])
    h = jax.nn.gelu(x @ params["ada_w1"] + params["ada_b1"],
                    approximate=False)
    return h @ params["ada_w2"] + params["ada_b2"]

"""WavTokenizer decoder (codes -> audio) for the TTS pipeline.

TPU-native re-expression of the reference vocoder graph
(`src/models/wavtokenizer-dec.cpp:1-149`): code-token embeddings go
through a conv1d stem, a 6-block "posnet" (ResNet blocks with GroupNorm +
SiLU at 0/1/3/4, one single-head self-attention block at 2, a closing
GroupNorm at 5), a token LayerNorm, a ConvNeXt stack (depthwise conv7 +
LayerNorm + GELU MLP + learned gamma, residual), and a linear head that
emits an interleaved log-magnitude/phase spectrogram.  `embd_to_audio`
(`tools/tts/tts.cpp:201-281`) then ISTFTs it: mag = clamp(exp(m), 1e2),
S = mag*e^{i phi}, irfft per frame (n_fft=1280, hop=320), Hann window,
overlap-add, divide by the window-envelope fold.

Design notes (TPU):
- Everything is float32 (the model is ~50M params and runs once per
  utterance; numerical fidelity of the spectrogram matters more than
  throughput) and batched over frames — the irfft is one
  (T, 641)-complex -> (T, 1280) `jnp.fft.irfft`, not a per-frame loop.
- Overlap-add exploits n_fft % hop == 0 (1280 = 4*320): each frame
  splits into 4 hop-sized chunks and chunk j of frame t lands at output
  block t+j, so the fold is 4 shifted adds of dense (T, hop) arrays —
  no scatter (XLA scatter serializes on TPU; see PERF.md).
- conv1d is `lax.conv_general_dilated` in NCH layout with SAME-style
  padding kernel//2 (the reference's `ggml_conv_1d_ph`).
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
import re
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class VocoderConfig:
    """WavTokenizer-small decoder hparams (convert_hf_to_gguf.py:4105-4119)."""

    vocab_size: int = 4096
    n_embd: int = 512          # code-embedding width (n_embd_features)
    posnet_d: int = 768        # posnet channel width
    posnet_layers: int = 6
    convnext_d: int = 768
    convnext_layers: int = 12
    n_ff: int = 2304
    n_out: int = 1282          # head width = 2 * (n_fft // 2 + 1)
    group_norm_groups: int = 32
    group_norm_eps: float = 1e-6
    layer_norm_eps: float = 1e-6
    n_fft: int = 1280
    hop: int = 320
    sample_rate: int = 24000


def _conv1d(x, w, b, groups: int = 1):
    """x: (C_in, T); w: (C_out, C_in/groups, K); SAME padding K//2."""
    k = w.shape[-1]
    y = jax.lax.conv_general_dilated(
        x[None], w, window_strides=(1,), padding=[(k // 2, k // 2)],
        dimension_numbers=("NCH", "OIH", "NCH"), feature_group_count=groups,
    )[0]
    return y + b[:, None]


def _group_norm(x, w, b, groups: int, eps: float):
    """x: (C, T); normalize each channel-group over (C/g, T) like torch
    GroupNorm (ggml_group_norm semantics)."""
    c, t = x.shape
    xg = x.reshape(groups, c // groups, t)
    mu = xg.mean((1, 2), keepdims=True)
    var = xg.var((1, 2), keepdims=True)
    xg = (xg - mu) * jax.lax.rsqrt(var + eps)
    return xg.reshape(c, t) * w[:, None] + b[:, None]


def _layer_norm(x, w, b, eps: float):
    """x: (T, C); per-token layernorm."""
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def init_params(cfg: VocoderConfig, seed: int = 0) -> dict[str, Any]:
    rng = np.random.default_rng(seed)

    def rand(*shape, s=0.02):
        return jnp.asarray(rng.standard_normal(shape) * s, jnp.float32)

    d, p, cn, f = cfg.n_embd, cfg.posnet_d, cfg.convnext_d, cfg.n_ff
    g = cfg.group_norm_groups
    assert p % g == 0

    def resnet_block():
        return {
            "norm1_w": jnp.ones((p,)), "norm1_b": jnp.zeros((p,)),
            "conv1_w": rand(p, p, 3), "conv1_b": jnp.zeros((p,)),
            "norm2_w": jnp.ones((p,)), "norm2_b": jnp.zeros((p,)),
            "conv2_w": rand(p, p, 3), "conv2_b": jnp.zeros((p,)),
        }

    posnet: list[dict[str, Any]] = []
    for il in range(cfg.posnet_layers):
        if il == 2:
            posnet.append({
                "attn_norm_w": jnp.ones((p,)), "attn_norm_b": jnp.zeros((p,)),
                "attn_q_w": rand(p, p, 1), "attn_q_b": jnp.zeros((p,)),
                "attn_k_w": rand(p, p, 1), "attn_k_b": jnp.zeros((p,)),
                "attn_v_w": rand(p, p, 1), "attn_v_b": jnp.zeros((p,)),
                "attn_o_w": rand(p, p, 1), "attn_o_b": jnp.zeros((p,)),
            })
        elif il == cfg.posnet_layers - 1:
            posnet.append({
                "norm_w": jnp.ones((p,)), "norm_b": jnp.zeros((p,)),
            })
        else:
            posnet.append(resnet_block())

    convnext = [
        {
            "dw_w": rand(cn, 1, 7), "dw_b": jnp.zeros((cn,)),
            "norm_w": jnp.ones((cn,)), "norm_b": jnp.zeros((cn,)),
            "pw1_w": rand(cn, f), "pw1_b": jnp.zeros((f,)),
            "pw2_w": rand(f, cn), "pw2_b": jnp.zeros((cn,)),
            "gamma": jnp.full((cn,), 1e-2, jnp.float32),
        }
        for _ in range(cfg.convnext_layers)
    ]

    return {
        "embd": rand(cfg.vocab_size, d),
        "conv1d_w": rand(p, d, 7), "conv1d_b": jnp.zeros((p,)),
        "posnet": posnet,
        "tok_norm_w": jnp.ones((p,)), "tok_norm_b": jnp.zeros((p,)),
        "convnext": convnext,
        "out_norm_w": jnp.ones((cn,)), "out_norm_b": jnp.zeros((cn,)),
        "head_w": rand(cn, cfg.n_out), "head_b": jnp.zeros((cfg.n_out,)),
    }


def decode_codes(params, cfg: VocoderConfig, codes) -> jnp.ndarray:
    """codes: (T,) int32 audio-code ids -> (T, n_out) spectrogram embds.

    Mirrors llm_build_wavtokenizer_dec (wavtokenizer-dec.cpp:3-148).
    """
    g, eps = cfg.group_norm_groups, cfg.group_norm_eps
    x = params["embd"][codes]                       # (T, d)
    cur = _conv1d(x.T, params["conv1d_w"], params["conv1d_b"])  # (p, T)

    for il, layer in enumerate(params["posnet"]):
        inp = cur
        if "attn_q_w" in layer:                     # block 2: self-attention
            cur = _group_norm(cur, layer["attn_norm_w"], layer["attn_norm_b"],
                              g, eps)
            q = _conv1d(cur, layer["attn_q_w"], layer["attn_q_b"])
            k = _conv1d(cur, layer["attn_k_w"], layer["attn_k_b"])
            v = _conv1d(cur, layer["attn_v_w"], layer["attn_v_b"])
            # single head over time, scale 1/sqrt(posnet_d), non-causal
            att = jax.nn.softmax(
                (q.T @ k) / jnp.sqrt(jnp.float32(cfg.posnet_d)), axis=-1
            )
            cur = _conv1d((att @ v.T).T, layer["attn_o_w"], layer["attn_o_b"])
            cur = cur + inp
        elif "conv1_w" in layer:                    # resnet blocks 0,1,3,4
            cur = _group_norm(cur, layer["norm1_w"], layer["norm1_b"], g, eps)
            cur = cur * jax.nn.sigmoid(cur)         # swish, ggml_mul(sigmoid)
            cur = _conv1d(cur, layer["conv1_w"], layer["conv1_b"])
            cur = _group_norm(cur, layer["norm2_w"], layer["norm2_b"], g, eps)
            cur = cur * jax.nn.sigmoid(cur)
            cur = _conv1d(cur, layer["conv2_w"], layer["conv2_b"])
            cur = cur + inp
        else:                                       # final groupnorm block
            cur = _group_norm(cur, layer["norm_w"], layer["norm_b"], g, eps)

    xt = _layer_norm(cur.T, params["tok_norm_w"], params["tok_norm_b"],
                     cfg.layer_norm_eps)            # (T, p)

    for layer in params["convnext"]:
        h = _conv1d(xt.T, layer["dw_w"], layer["dw_b"],
                    groups=cfg.convnext_d).T        # depthwise conv7
        h = _layer_norm(h, layer["norm_w"], layer["norm_b"],
                        cfg.layer_norm_eps)
        h = jax.nn.gelu(h @ layer["pw1_w"] + layer["pw1_b"], approximate=False)
        h = h @ layer["pw2_w"] + layer["pw2_b"]
        xt = xt + h * layer["gamma"]

    xt = _layer_norm(xt, params["out_norm_w"], params["out_norm_b"],
                     cfg.layer_norm_eps)
    return xt @ params["head_w"] + params["head_b"]  # (T, n_out)


def hann_window(n: int) -> jnp.ndarray:
    """Periodic Hann (tts.cpp:115-124 with periodic=true)."""
    return 0.5 * (1.0 - jnp.cos(2.0 * jnp.pi * jnp.arange(n) / n))


def _fold(frames: jnp.ndarray, hop: int) -> jnp.ndarray:
    """Overlap-add (T, n_fft) windows at stride `hop` -> ((T-1)*hop+n_fft,).

    Requires n_fft % hop == 0; frame t's chunk j (of n_fft//hop) lands at
    output block t+j, so the fold is `n_fft//hop` shifted dense adds —
    the scatter-free form of torch.nn.functional.fold (tts.cpp:165-199).
    """
    t, n_fft = frames.shape
    assert n_fft % hop == 0
    r = n_fft // hop
    chunks = frames.reshape(t, r, hop)
    out = jnp.zeros((t + r - 1, hop), frames.dtype)
    for j in range(r):
        out = out.at[j:j + t].add(chunks[:, j, :])
    return out.reshape(-1)


def spectrogram_to_audio(embd, cfg: VocoderConfig) -> jnp.ndarray:
    """(T, n_out) interleaved log-mag/phase -> mono waveform.

    Port of embd_to_audio (tts.cpp:201-281): the head emits
    [mag_0..mag_{N-1}, phi_0..phi_{N-1}] per frame with N = n_out/2;
    mag = min(exp(m), 100); irfft(n_fft); Hann window; overlap-add with
    window-envelope normalization; the n_pad trim falls out of slicing.
    """
    n_fft, hop = cfg.n_fft, cfg.hop
    n_bins = cfg.n_out // 2
    mag = jnp.minimum(jnp.exp(embd[:, :n_bins]), 1e2)
    phi = embd[:, n_bins:]
    spec = mag * jnp.exp(1j * phi.astype(jnp.complex64))
    # The reference irfft (tts.cpp:133-163) computes
    # (1/N) * Re(sum_{m<N} X_m e^{2pi i km/n}) with N = n/2+1 — it does
    # NOT double the interior bins like a true inverse rfft.  Reproduce
    # exactly with the standard irfft by pre-halving interior bins and
    # rescaling n/N (the batched FFT stays one XLA op).
    bin_scale = jnp.full((n_bins,), 0.5).at[0].set(1.0).at[-1].set(1.0)
    frames = jnp.fft.irfft(spec * bin_scale, n=n_fft, axis=-1) \
        * (n_fft / n_bins)
    w = hann_window(n_fft)
    audio = _fold(frames * w, hop)
    env = _fold(jnp.broadcast_to(w * w, frames.shape), hop)
    audio = audio / env
    pad = (n_fft - hop) // 2
    return audio[pad:-pad]


def save_vocoder(path: str, cfg: VocoderConfig, params) -> None:
    p = pathlib.Path(path)
    p.mkdir(parents=True, exist_ok=True)
    (p / "vocoder_config.json").write_text(
        json.dumps(dataclasses.asdict(cfg), indent=1)
    )
    flat = {}

    def put(prefix, tree):
        if isinstance(tree, dict):
            for k, v in tree.items():
                put(f"{prefix}.{k}" if prefix else k, v)
        elif isinstance(tree, list):
            for i, v in enumerate(tree):
                put(f"{prefix}.{i}", v)
        else:
            flat[prefix] = np.asarray(tree)

    put("", params)
    np.savez(p / "vocoder.npz", **flat)


def convert_hf_vocoder(src: str, dst: str) -> VocoderConfig:
    """HF WavTokenizer decoder checkpoint -> vocoder dir.

    Name map per the reference converter (convert_hf_to_gguf.py:4085-4119
    + gguf-py/gguf/tensor_mapping.py wavtokenizer rows):
    `*codebook.embed` -> code embeddings; `backbone.embed` -> conv stem;
    `backbone.posnet.N.{norm1,conv1,norm2,conv2 | norm,q,k,v,proj_out}`;
    `backbone.norm` -> post-posnet LayerNorm; `backbone.convnext.N.
    {dwconv,norm,pwconv1,pwconv2,gamma}`; `backbone.final_layer_norm`;
    `head.out` -> spectrogram head.  Torch Linear weights (out, in) are
    transposed to our (in, out); conv weights keep (out, in, k).
    """
    import pathlib as _pl

    src_p = _pl.Path(src)
    tensors: dict[str, np.ndarray] = {}
    files = sorted(src_p.glob("*.safetensors")) if src_p.is_dir() \
        else [src_p]
    for f in files:
        if f.suffix == ".safetensors":
            from safetensors.numpy import load_file

            tensors.update(load_file(str(f)))
        else:  # torch .bin / .pt
            import torch

            sd = torch.load(str(f), map_location="cpu", weights_only=True)
            sd = sd.get("state_dict", sd)
            tensors.update(
                {k: v.float().numpy() for k, v in sd.items()}
            )

    def pick(*subs):
        for name, v in tensors.items():
            if all(s in name for s in subs):
                return np.asarray(v, np.float32)
        raise KeyError(f"no tensor matching {subs} in {src}")

    embd = pick("codebook.embed")
    stem_w = pick("backbone.embed", "weight")
    head_w = pick("head.out", "weight")
    n_posnet = 1 + max(
        int(m.group(1)) for name in tensors
        if (m := re.match(r".*backbone\.posnet\.(\d+)\.", name))
    )
    n_convnext = 1 + max(
        int(m.group(1)) for name in tensors
        if (m := re.match(r".*backbone\.convnext\.(\d+)\.", name))
    )
    pw1 = pick("convnext.0.pwconv1", "weight")
    cfg = VocoderConfig(
        vocab_size=embd.shape[0], n_embd=embd.shape[1],
        posnet_d=stem_w.shape[0], posnet_layers=n_posnet,
        convnext_d=pw1.shape[1], convnext_layers=n_convnext,
        n_ff=pw1.shape[0], n_out=head_w.shape[0],
    )

    posnet: list[dict[str, Any]] = []
    for i in range(n_posnet):
        pre = f"backbone.posnet.{i}."
        names = {n for n in tensors if pre in n}
        if any(".q." in n or n.endswith(".q.weight") for n in names):
            posnet.append({
                "attn_norm_w": pick(pre + "norm.weight"),
                "attn_norm_b": pick(pre + "norm.bias"),
                "attn_q_w": pick(pre + "q.weight"),
                "attn_q_b": pick(pre + "q.bias"),
                "attn_k_w": pick(pre + "k.weight"),
                "attn_k_b": pick(pre + "k.bias"),
                "attn_v_w": pick(pre + "v.weight"),
                "attn_v_b": pick(pre + "v.bias"),
                "attn_o_w": pick(pre + "proj_out.weight"),
                "attn_o_b": pick(pre + "proj_out.bias"),
            })
        elif any("conv1" in n for n in names):
            posnet.append({
                "norm1_w": pick(pre + "norm1.weight"),
                "norm1_b": pick(pre + "norm1.bias"),
                "conv1_w": pick(pre + "conv1.weight"),
                "conv1_b": pick(pre + "conv1.bias"),
                "norm2_w": pick(pre + "norm2.weight"),
                "norm2_b": pick(pre + "norm2.bias"),
                "conv2_w": pick(pre + "conv2.weight"),
                "conv2_b": pick(pre + "conv2.bias"),
            })
        else:
            posnet.append({
                "norm_w": pick(pre + "norm.weight"),
                "norm_b": pick(pre + "norm.bias"),
            })

    convnext = []
    for i in range(n_convnext):
        pre = f"backbone.convnext.{i}."
        convnext.append({
            "dw_w": pick(pre + "dwconv.weight"),
            "dw_b": pick(pre + "dwconv.bias"),
            "norm_w": pick(pre + "norm.weight"),
            "norm_b": pick(pre + "norm.bias"),
            "pw1_w": pick(pre + "pwconv1.weight").T,
            "pw1_b": pick(pre + "pwconv1.bias"),
            "pw2_w": pick(pre + "pwconv2.weight").T,
            "pw2_b": pick(pre + "pwconv2.bias"),
            "gamma": pick(pre + "gamma").reshape(-1),
        })

    params = {
        "embd": embd,
        "conv1d_w": stem_w, "conv1d_b": pick("backbone.embed", "bias"),
        "posnet": posnet,
        "tok_norm_w": pick("backbone.norm.weight"),
        "tok_norm_b": pick("backbone.norm.bias"),
        "convnext": convnext,
        "out_norm_w": pick("backbone.final_layer_norm.weight"),
        "out_norm_b": pick("backbone.final_layer_norm.bias"),
        "head_w": head_w.T, "head_b": pick("head.out", "bias"),
    }
    save_vocoder(dst, cfg, params)
    return cfg


def load_vocoder(path: str) -> tuple[VocoderConfig, dict[str, Any]]:
    p = pathlib.Path(path)
    cfg = VocoderConfig(**json.loads((p / "vocoder_config.json").read_text()))
    data = np.load(p / "vocoder.npz")
    tree: dict[str, Any] = {}
    for key in data.files:
        node = tree
        parts = key.split(".")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = jnp.asarray(data[key])

    def listify(node):
        if not isinstance(node, dict):
            return node
        if node and all(k.isdigit() for k in node):
            return [listify(node[str(i)]) for i in range(len(node))]
        return {k: listify(v) for k, v in node.items()}

    return cfg, listify(tree)

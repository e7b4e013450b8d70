"""Vision-tower wave 3: InternVL ViT, Llama4 vision, Idefics3 connector.

Reference analogs (tools/mtmd/clip-impl.h projector types):
* PROJECTOR_TYPE_INTERNVL — CLS-token ViT (LN or RMS norms by variant,
  layer-scale lambdas, biased projections) -> drop CLS -> pixel shuffle
  (scale 0.5) -> LayerNorm + 2-layer GELU projector
  (tools/mtmd/models/internvl.cpp; HF InternVLVisionModel +
  InternVLMultiModalProjector).
* PROJECTOR_TYPE_LLAMA4 — unfold-conv patchify, CLS appended LAST,
  learned positions + complex 2-D rope (CLS frequency zero), pre/post
  LayerNorms, pixel shuffle -> no-bias GELU-GELU adapter MLP -> no-bias
  projector (tools/mtmd/models/llama4.cpp; HF Llama4VisionModel).
* PROJECTOR_TYPE_IDEFICS3 — SigLIP tower (models/vision_ext.siglip_forward
  — idefics3's NaViT position bucketing reduces to the learned-position
  grid for full-size square inputs) -> pixel shuffle -> one no-bias
  linear (tools/mtmd/models/siglip.cpp:41-46 + clip.cpp
  build_patch_merge_permute:746-775; HF Idefics3Connector).

Dense bf16/f32 towers like models/vision.py; embeddings splice into the
decoder via token_embeds.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from vlut_tpu.models.vision_ext import _attend, _ln, _patchify, _rms


# ---------------------------------------------------------------------------
# InternVL
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class InternVLConfig:
    image_size: int = 448
    patch_size: int = 14
    d_model: int = 1024
    n_layers: int = 24
    n_heads: int = 16
    d_ff: int = 4096
    ln_eps: float = 1e-6
    norm_type: str = "layer_norm"   # "layer_norm" | "rms_norm" (6B ViT)
    use_qk_norm: bool = False       # full-width RMS on q/k (large ViTs)
    downsample: int = 2             # 1/downsample_ratio pixel-shuffle
    d_llm: int = 4096
    proj_act: str = "gelu"


def _norm(x, w, b, eps, kind):
    if kind == "rms_norm":
        return _rms(x, w, eps)
    return _ln(x, w, b, eps)


def internvl_forward(
    params: dict[str, Any], cfg: InternVLConfig, images: jax.Array
) -> jax.Array:
    """InternVL ViT: (B, H, W, 3) -> (B, P+1, D) (CLS first).  HF
    InternVLVisionModel: conv patchify (+bias), CLS prepend, learned
    positions over P+1, pre/post norms per block with layer-scale
    lambda_1/lambda_2, biased q/k/v + projection_layer, optional
    full-width q/k RMS norm, biased GELU MLP (reference
    tools/mtmd/models/internvl.cpp build())."""
    b = images.shape[0]
    x = _patchify(images.astype(jnp.float32), cfg.patch_size)
    x = x @ params["patch_w"] + params["patch_b"]
    cls = jnp.broadcast_to(params["cls"], (b, 1, cfg.d_model))
    x = jnp.concatenate([cls, x], axis=1)
    if "pos" in params:
        x = x + params["pos"][None]
    H, hd = cfg.n_heads, cfg.d_model // cfg.n_heads
    t = x.shape[1]
    nt = cfg.norm_type
    for i in range(cfg.n_layers):
        lp = jax.tree.map(lambda a: a[i], params["layers"])
        h = _norm(x, lp["ln1_w"], lp.get("ln1_b"), cfg.ln_eps, nt)
        # q/k/v biases exist only when attention_bias=True in the HF cfg
        q = h @ lp["wq"] + lp.get("bq", 0.0)
        k = h @ lp["wk"] + lp.get("bk", 0.0)
        v = h @ lp["wv"] + lp.get("bv", 0.0)
        if cfg.use_qk_norm:
            # full-WIDTH RMS before the head split (HF q_norm/k_norm at
            # embed_dim; the reference graph normalizes likewise)
            q = _rms(q, lp["qn"], cfg.ln_eps)
            k = _rms(k, lp["kn"], cfg.ln_eps)
        q = q.reshape(b, t, H, hd)
        k = k.reshape(b, t, H, hd)
        v = v.reshape(b, t, H, hd)
        att = _attend(q, k, v, hd).reshape(b, t, cfg.d_model)
        att = att @ lp["wo"] + lp["bo"]
        x = x + lp["ls1"] * att
        h = _norm(x, lp["ln2_w"], lp.get("ln2_b"), cfg.ln_eps, nt)
        a = jax.nn.gelu(h @ lp["w1"] + lp["b1"], approximate=False)
        x = x + lp["ls2"] * (a @ lp["w2"] + lp["b2"])
    if "final_ln_w" in params:  # absent when use_mean_pooling
        x = _norm(x, params["final_ln_w"], params.get("final_ln_b"),
                  cfg.ln_eps, nt)
    return x


def internvl_pixel_shuffle(x: jax.Array, scale: float = 0.5) -> jax.Array:
    """HF InternVLModel.pixel_shuffle transcription: input (B, W, H, C),
    two reshape/transpose rounds folding a (1/scale)^2 spatial block into
    channels.  Matches the reference's internvl.cpp shuffle (which
    reshapes (n_embd*s, h/s, w) then permutes twice)."""
    b, w, h, c = x.shape
    x = x.reshape(b, w, int(h * scale), int(c / scale))
    x = x.transpose(0, 2, 1, 3)
    x = x.reshape(b, int(h * scale), int(w * scale), int(c / scale ** 2))
    return x.transpose(0, 2, 1, 3)


def internvl_project(
    params: dict[str, Any], cfg: InternVLConfig, feats: jax.Array
) -> jax.Array:
    """Drop CLS -> pixel shuffle -> LayerNorm -> linear/GELU/linear (HF
    InternVLMultiModalProjector; reference internvl.cpp projector with
    pytorch-default eps 1e-5)."""
    b, p1, d = feats.shape
    side = int(round((p1 - 1) ** 0.5))
    x = feats[:, 1:].reshape(b, side, side, d)
    x = internvl_pixel_shuffle(x, 1.0 / cfg.downsample)
    x = x.reshape(b, -1, d * cfg.downsample ** 2)
    x = _ln(x, params["proj_ln_w"], params["proj_ln_b"], 1e-5)
    x = x @ params["proj_w1"] + params["proj_b1"]
    x = jax.nn.gelu(x, approximate=(cfg.proj_act == "gelu_pytorch_tanh"))
    return x @ params["proj_w2"] + params["proj_b2"]


# ---------------------------------------------------------------------------
# Llama4 vision
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Llama4VisionConfig:
    image_size: int = 336
    patch_size: int = 14
    d_model: int = 1408
    n_layers: int = 34
    n_heads: int = 16
    d_ff: int = 5632
    rope_theta: float = 10000.0
    ln_eps: float = 1e-5
    pixel_shuffle_ratio: float = 0.5
    projector_input_dim: int = 4096
    projector_output_dim: int = 4096
    d_llm: int = 5120

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads


def _llama4_rope_tables(cfg: Llama4VisionConfig):
    """(cos, sin) (P+1, hd/2) per position, complex-pair convention (HF
    Llama4VisionRotaryEmbedding): x coords drive the first hd/4 pair
    frequencies, y the second; the trailing CLS row rotates by zero."""
    idx = cfg.image_size // cfg.patch_size
    pos = np.arange(idx * idx)
    fx, fy = pos % idx, pos // idx
    freq_dim = cfg.head_dim // 2
    rf = 1.0 / (cfg.rope_theta
                ** (np.arange(0, freq_dim, 2)[: freq_dim // 2] / freq_dim))
    freqs = np.concatenate([
        (fx + 1)[:, None] * rf[None, :],
        (fy + 1)[:, None] * rf[None, :],
    ], axis=-1)                                   # (P, hd/2)
    freqs = np.concatenate([freqs, np.zeros((1, freqs.shape[1]))], axis=0)
    return (jnp.asarray(np.cos(freqs), jnp.float32),
            jnp.asarray(np.sin(freqs), jnp.float32))


def _rope_pairs(z, cos, sin):
    """Complex-pair rotation: consecutive channel pairs (2j, 2j+1) rotate
    by angle_j (HF vision_apply_rotary_emb view_as_complex semantics)."""
    zr, zi = z[..., 0::2], z[..., 1::2]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    out = jnp.stack([zr * c - zi * s, zr * s + zi * c], axis=-1)
    return out.reshape(z.shape)


def llama4_vision_forward(
    params: dict[str, Any], cfg: Llama4VisionConfig, images: jax.Array
) -> jax.Array:
    """Llama4 ViT: (B, H, W, 3) -> (B, P+1, D) post-LN features, CLS LAST
    (HF Llama4VisionModel; reference tools/mtmd/models/llama4.cpp).
    Unfold-conv = patchify + no-bias linear; biased q/k/v/o; exact-GELU
    biased MLP; LayerNorms pre/post encoder."""
    b = images.shape[0]
    x = _patchify(images.astype(jnp.float32), cfg.patch_size)
    x = x @ params["patch_w"]                     # no bias
    cls = jnp.broadcast_to(params["cls"], (b, 1, cfg.d_model))
    x = jnp.concatenate([x, cls], axis=1)         # CLS appended LAST
    x = x + params["pos"][None]
    x = _ln(x, params["pre_ln_w"], params["pre_ln_b"], cfg.ln_eps)
    cos, sin = _llama4_rope_tables(cfg)
    H, hd = cfg.n_heads, cfg.head_dim
    t = x.shape[1]
    for i in range(cfg.n_layers):
        lp = jax.tree.map(lambda a: a[i], params["layers"])
        h = _ln(x, lp["ln1_w"], lp["ln1_b"], cfg.ln_eps)
        q = (h @ lp["wq"] + lp["bq"]).reshape(b, t, H, hd)
        k = (h @ lp["wk"] + lp["bk"]).reshape(b, t, H, hd)
        v = (h @ lp["wv"] + lp["bv"]).reshape(b, t, H, hd)
        q = _rope_pairs(q, cos, sin)
        k = _rope_pairs(k, cos, sin)
        att = _attend(q, k, v, hd).reshape(b, t, cfg.d_model)
        x = x + (att @ lp["wo"] + lp["bo"])
        h = _ln(x, lp["ln2_w"], lp["ln2_b"], cfg.ln_eps)
        a = jax.nn.gelu(h @ lp["w1"] + lp["b1"], approximate=False)
        x = x + (a @ lp["w2"] + lp["b2"])
    return _ln(x, params["post_ln_w"], params["post_ln_b"], cfg.ln_eps)


def llama4_pixel_shuffle(x: jax.Array, ratio: float) -> jax.Array:
    """HF llama4 pixel_shuffle transcription ((B, P, C) square grid)."""
    b, p, c = x.shape
    side = int(round(p ** 0.5))
    x = x.reshape(b, side, side, c)
    x = x.reshape(b, side, int(side * ratio), int(c / ratio))
    x = x.transpose(0, 2, 1, 3)
    x = x.reshape(b, int(side * ratio), int(side * ratio),
                  int(c / ratio ** 2))
    x = x.transpose(0, 2, 1, 3)
    return x.reshape(b, -1, int(c / ratio ** 2))


def llama4_project(
    params: dict[str, Any], cfg: Llama4VisionConfig, feats: jax.Array
) -> jax.Array:
    """Drop the trailing CLS -> pixel shuffle -> no-bias fc1/GELU/fc2/GELU
    adapter (Llama4VisionMLP2) -> no-bias multimodal projector."""
    x = llama4_pixel_shuffle(feats[:, :-1], cfg.pixel_shuffle_ratio)
    x = jax.nn.gelu(x @ params["adapter_w1"], approximate=False)
    x = jax.nn.gelu(x @ params["adapter_w2"], approximate=False)
    return x @ params["mm_proj"]


# ---------------------------------------------------------------------------
# Janus-Pro aligner (tower = vision_ext.siglip_forward(act="exact");
# reference PROJECTOR_TYPE_JANUS_PRO, tools/mtmd/models/siglip.cpp:66-72)
# ---------------------------------------------------------------------------

def janus_aligner(params: dict[str, Any], feats: jax.Array) -> jax.Array:
    """Janus-Pro understanding aligner (HF JanusVisionAlignerMLP): fc1
    then (GELU, linear) x (depth-1) into the decoder width.  The
    generation-side VQ path is out of scope (the reference's mtmd drops
    it too)."""
    x = feats @ params["aligner_w0"] + params["aligner_b0"]
    if "aligner_wh" in params:
        for w, b_ in zip(params["aligner_wh"], params["aligner_bh"]):
            x = jax.nn.gelu(x, approximate=False) @ w + b_
    return x


# ---------------------------------------------------------------------------
# LFM2-VL projector (tower = siglip2 via vision_ext.siglip_forward;
# reference PROJECTOR_TYPE_LFM2, tools/mtmd/models/siglip.cpp:48-64)
# ---------------------------------------------------------------------------

def lfm2vl_project(
    params: dict[str, Any], feats: jax.Array, factor: int
) -> jax.Array:
    """Pixel unshuffle (HF Lfm2VlMultiModalProjector transcription, square
    grid) + LayerNorm + biased GELU MLP into the decoder width."""
    b, p, c = feats.shape
    side = int(round(p ** 0.5))
    x = feats.reshape(b, side, side, c)
    x = x.reshape(b, side, side // factor, c * factor)
    x = x.transpose(0, 2, 1, 3)
    x = x.reshape(b, side // factor, side // factor, c * factor ** 2)
    x = x.transpose(0, 2, 1, 3)
    x = x.reshape(b, p // factor ** 2, c * factor ** 2)
    x = _ln(x, params["proj_ln_w"], params["proj_ln_b"], 1e-5)
    x = jax.nn.gelu(x @ params["proj_w1"] + params["proj_b1"],
                    approximate=False)
    return x @ params["proj_w2"] + params["proj_b2"]


# ---------------------------------------------------------------------------
# MobileVLM LDP / LDPv2 projectors over the CLIP tower
# (reference PROJECTOR_TYPE_LDP / PROJECTOR_TYPE_LDPV2,
# tools/mtmd/models/llava.cpp:197-335)
# ---------------------------------------------------------------------------

def _hardswish(x):
    return x * jnp.clip((x + 3.0) / 6.0, 0.0, 1.0)


def _dw_conv3(x, w, stride=1):
    """Depthwise 3x3 conv, NHWC x (3, 3, 1, C) HWIO, SAME-ish pad 1."""
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
    )


def _ldp_block(x, p, prefix, stride, eps=1e-5, residual=True):
    """One MobileVLM LDP block: depthwise 3x3 -> channel LayerNorm ->
    hardswish -> squeeze-excite (global avgpool, fc1/relu/fc2,
    hardsigmoid scale) -> pointwise conv -> LayerNorm [-> +input]."""
    y = _dw_conv3(x, p[f"{prefix}_dw"], stride=stride)
    y = _ln(y, p[f"{prefix}_ln0_w"], p[f"{prefix}_ln0_b"], eps)
    hw = _hardswish(y)
    se = jnp.mean(hw, axis=(1, 2))                      # (B, C)
    se = jax.nn.relu(se @ p[f"{prefix}_fc1_w"] + p[f"{prefix}_fc1_b"])
    se = se @ p[f"{prefix}_fc2_w"] + p[f"{prefix}_fc2_b"]
    se = jnp.clip((se + 3.0) / 6.0, 0.0, 1.0)
    y = hw * se[:, None, None, :]
    y = y @ p[f"{prefix}_pw"]                           # pointwise conv
    y = _ln(y, p[f"{prefix}_ln1_w"], p[f"{prefix}_ln1_b"], eps)
    return x + y if residual else y


def ldp_project(params: dict[str, Any], feats: jax.Array) -> jax.Array:
    """MobileVLM LDP: biased GELU MLP -> block1 (stride 1, residual) ->
    block2 (stride 2, no residual) -> (B, P/4, C) tokens."""
    b, p_, d = feats.shape
    side = int(round(p_ ** 0.5))
    x = jax.nn.gelu(feats @ params["mlp1_w"] + params["mlp1_b"],
                    approximate=True)
    x = x @ params["mlp3_w"] + params["mlp3_b"]
    x = x.reshape(b, side, side, -1)
    x = _ldp_block(x, params, "b1", stride=1, residual=True)
    x = _ldp_block(x, params, "b2", stride=2, residual=False)
    return x.reshape(b, (side // 2) ** 2, x.shape[-1])


def ldpv2_project(params: dict[str, Any], feats: jax.Array) -> jax.Array:
    """MobileVLM-v2 LDP: biased GELU MLP -> 2x2 stride-2 avgpool -> 3x3
    depthwise PEG conv (+bias) with residual -> (B, P/4, C) tokens."""
    b, p_, d = feats.shape
    side = int(round(p_ ** 0.5))
    x = jax.nn.gelu(feats @ params["mlp0_w"] + params["mlp0_b"],
                    approximate=True)
    x = x @ params["mlp2_w"] + params["mlp2_b"]
    x = x.reshape(b, side, side, -1)
    x = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) / 4.0
    peg = _dw_conv3(x, params["peg_w"]) + params["peg_b"]
    x = peg + x
    return x.reshape(b, (side // 2) ** 2, x.shape[-1])


# ---------------------------------------------------------------------------
# GLM-Edge adapter (reference PROJECTOR_TYPE_GLM_EDGE,
# tools/mtmd/models/llava.cpp:337-364) — the tower is the CLIP graph
# (models/vision.py) with the glm-edge feature-layer selection
# ---------------------------------------------------------------------------

def glm_edge_project(params: dict[str, Any], feats: jax.Array) -> jax.Array:
    """GLM-Edge adapter: 2x2 stride-2 conv downsample over the patch grid
    -> linear -> LayerNorm -> GELU -> SwiGLU-split GLU -> down linear,
    then BOI/EOI embedding rows bracket the tokens."""
    b, p, c = feats.shape
    side = int(round(p ** 0.5))
    x = feats.reshape(b, side, side, c)
    x = jax.lax.conv_general_dilated(
        x, params["conv_w"], window_strides=(2, 2), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["conv_b"]
    x = x.reshape(b, -1, x.shape[-1])
    x = x @ params["mlp0_w"]
    x = _ln(x, params["ln_w"], params["ln_b"], 1e-5)
    x = jax.nn.gelu(x, approximate=True)
    # ggml_swiglu_split(mlp_2(x), mlp_1(x)) = silu(mlp_2 x) * (mlp_1 x)
    g = jax.nn.silu(x @ params["mlp2_w"]) * (x @ params["mlp1_w"])
    x = g @ params["mlp3_w"]
    boi = jnp.broadcast_to(params["boi"], (b, 1, x.shape[-1]))
    eoi = jnp.broadcast_to(params["eoi"], (b, 1, x.shape[-1]))
    return jnp.concatenate([boi, x, eoi], axis=1)


# ---------------------------------------------------------------------------
# Youtu-VL vision (reference PROJECTOR_TYPE_YOUTUVL,
# tools/mtmd/models/youtuvl.cpp)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class YoutuVLConfig:
    patch_size: int = 16
    d_model: int = 1152
    n_layers: int = 27
    n_heads: int = 16
    d_ff: int = 4304
    d_out: int = 2048
    merge: int = 2
    ln_eps: float = 1e-6
    rope_theta: float = 10000.0
    # layers with FULL attention when window attention is active; an
    # empty tuple = full attention everywhere (reference
    # use_window_attn = !wa_layer_indexes.empty()).  Window batches ride
    # the qwen2.5-vl reorder machinery (qwen_vision._window_order).
    wa_layer_indexes: tuple[int, ...] = ()
    window_size: int = 0  # in patches (hparams.attn_window_size)

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads


def youtuvl_vision_forward(
    params: dict[str, Any], vc: YoutuVLConfig, patches: jax.Array,
    grid_hw: tuple[int, int],
) -> jax.Array:
    """Youtu-VL ViT: (N, p*p*C) merge-block-major patch rows ->
    (N/merge^2, d_out).  Linear patchify (+optional bias), optional
    pre-LN, NO learned positions (pure 2-D rope), separate biased q/k/v,
    window attention at non-wa layers when configured, ungated tanh-GELU
    MLP, window-order restore, optional post-LN, then the VLPatchMerger:
    RMSNorm at n_embd -> merge-4 reshape -> biased GELU MLP (reference
    tools/mtmd/models/youtuvl.cpp)."""
    from vlut_tpu.models.qwen_vision import (
        QwenVisionConfig,
        _rot_half,
        _vision_rot_table,
        _window_order,
    )

    m = vc.merge
    m2 = m * m
    x = patches.astype(jnp.float32) @ params["patch_w"]
    if "patch_b" in params:
        x = x + params["patch_b"]
    if "pre_ln_w" in params:
        x = _ln(x, params["pre_ln_w"], params["pre_ln_b"], vc.ln_eps)
    cos, sin = _vision_rot_table(grid_hw, vc.head_dim, m)
    H, hd = vc.n_heads, vc.head_dim
    n = x.shape[0]

    win_mask = None
    inv_units = None
    use_window = bool(vc.wa_layer_indexes) and vc.window_size > 0
    if use_window:
        qvc = QwenVisionConfig(
            depth=vc.n_layers, embed_dim=vc.d_model, n_heads=vc.n_heads,
            mlp_dim=vc.d_ff, patch_size=vc.patch_size,
            spatial_merge_size=m,
            window_size=vc.window_size * vc.patch_size,
        )
        order, seqlens = _window_order(grid_hw, qvc)
        perm = (order[:, None] * m2 + np.arange(m2)[None]).reshape(-1)
        x = x[jnp.asarray(perm)]
        cos, sin = cos[jnp.asarray(perm)], sin[jnp.asarray(perm)]
        wid = np.repeat(np.arange(len(seqlens)), seqlens * m2)
        win_mask = jnp.asarray(
            np.where(wid[:, None] == wid[None, :], 0.0, -1e30), jnp.float32)
        inv_units = np.argsort(order)

    def rope(z):
        return z * cos[:, None, :] + _rot_half(z) * sin[:, None, :]

    L = params["layers"]
    for i in range(vc.n_layers):
        lp = jax.tree.map(lambda a: a[i], L)
        h = _ln(x, lp["ln1_w"], lp["ln1_b"], vc.ln_eps)
        q = rope((h @ lp["wq"] + lp["bq"]).reshape(n, H, hd))
        k = rope((h @ lp["wk"] + lp["bk"]).reshape(n, H, hd))
        v = (h @ lp["wv"] + lp["bv"]).reshape(n, H, hd)
        sc = jnp.einsum("thd,shd->hts", q, k) * (hd ** -0.5)
        if win_mask is not None and i not in vc.wa_layer_indexes:
            sc = sc + win_mask[None]
        p = jax.nn.softmax(sc, axis=-1)
        att = jnp.einsum("hts,shd->thd", p, v).reshape(n, -1)
        x = x + (att @ lp["wo"] + lp["bo"])
        h = _ln(x, lp["ln2_w"], lp["ln2_b"], vc.ln_eps)
        a = jax.nn.gelu(h @ lp["w1"] + lp["b1"], approximate=True)
        x = x + (a @ lp["w2"] + lp["b2"])

    if inv_units is not None:
        perm = (inv_units[:, None] * m2 + np.arange(m2)[None]).reshape(-1)
        x = x[jnp.asarray(perm)]
    if "post_ln_w" in params:
        x = _ln(x, params["post_ln_w"], params["post_ln_b"], vc.ln_eps)
    x = _rms(x, params["merge_norm"], 1e-6)
    y = x.reshape(n // m2, m2 * vc.d_model)
    y = jax.nn.gelu(y @ params["merge_fc1_w"] + params["merge_fc1_b"],
                    approximate=True)
    return y @ params["merge_fc2_w"] + params["merge_fc2_b"]


# ---------------------------------------------------------------------------
# CogVLM vision (EVA2-CLIP tower + gated adapter; reference
# PROJECTOR_TYPE_COGVLM, tools/mtmd/models/cogvlm.cpp — the text-side
# dual-expert body already exists in models/transformer.py)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class CogVLMVisionConfig:
    image_size: int = 490
    patch_size: int = 14
    d_model: int = 1792
    n_layers: int = 63
    n_heads: int = 16
    d_ff: int = 15360
    ln_eps: float = 1e-6
    d_llm: int = 4096


def cogvlm_vision_forward(
    params: dict[str, Any], cfg: CogVLMVisionConfig, images: jax.Array
) -> jax.Array:
    """CogVLM EVA2-CLIP tower: (B, H, W, 3) -> (B, P+1, D), CLS LAST.
    POST-norm blocks (attn -> LN -> +residual; gated-GELU FFN -> LN ->
    +residual), fused biased qkv, biased o (reference cogvlm.cpp)."""
    b = images.shape[0]
    x = _patchify(images.astype(jnp.float32), cfg.patch_size)
    x = x @ params["patch_w"] + params["patch_b"]
    cls = jnp.broadcast_to(params["cls"], (b, 1, cfg.d_model))
    x = jnp.concatenate([x, cls], axis=1)
    x = x + params["pos"][None]
    H, hd = cfg.n_heads, cfg.d_model // cfg.n_heads
    t = x.shape[1]
    for i in range(cfg.n_layers):
        lp = jax.tree.map(lambda a: a[i], params["layers"])
        qkv = (x @ lp["wqkv"] + lp["bqkv"]).reshape(b, t, 3, H, hd)
        att = _attend(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2], hd)
        att = att.reshape(b, t, cfg.d_model) @ lp["wo"] + lp["bo"]
        att = _ln(att, lp["ln1_w"], lp["ln1_b"], cfg.ln_eps)
        x = x + att
        # build_ffn activates the UP operand: geglu_split(up, gate) =
        # gelu(up(x)) * gate(x)
        a = jax.nn.gelu(x @ lp["w_up"] + lp["b_up"],
                        approximate=True) * (x @ lp["w_gate"] + lp["b_gate"])
        f = a @ lp["w_down"] + lp["b_down"]
        f = _ln(f, lp["ln2_w"], lp["ln2_b"], cfg.ln_eps)
        x = x + f
    return x


def cogvlm_project(params: dict[str, Any], feats: jax.Array) -> jax.Array:
    """Drop the trailing CLS -> no-bias linear -> LayerNorm(1e-5) ->
    GELU -> swiglu(gate, h_to_4h) -> down linear -> BOI/EOI brackets."""
    b = feats.shape[0]
    x = feats[:, :-1] @ params["mm_proj"]
    x = _ln(x, params["post_fc_ln_w"], params["post_fc_ln_b"], 1e-5)
    x = jax.nn.gelu(x, approximate=True)
    g = jax.nn.silu(x @ params["gate_w"]) * (x @ params["h4h_w"])
    x = g @ params["h4h_down_w"]
    boi = jnp.broadcast_to(params["boi"], (b, 1, x.shape[-1]))
    eoi = jnp.broadcast_to(params["eoi"], (b, 1, x.shape[-1]))
    return jnp.concatenate([boi, x, eoi], axis=1)


# ---------------------------------------------------------------------------
# Qwen3-VL deepstack vision (reference PROJECTOR_TYPE_QWEN3VL,
# tools/mtmd/models/qwen3vl.cpp; HF Qwen3VLVisionModel)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Qwen3VLVisionConfig:
    patch_size: int = 16
    d_model: int = 1152
    n_layers: int = 27
    n_heads: int = 16
    d_ff: int = 4304
    d_out: int = 2048            # out_hidden_size (= LLM width)
    temporal_patch_size: int = 2
    merge: int = 2
    pos_grid: int = 48           # sqrt(num_position_embeddings)
    deepstack_indexes: tuple[int, ...] = (8, 16, 24)
    ln_eps: float = 1e-6

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads


def _qwen3vl_merger(params, prefix: str, x, d: int, m2: int,
                    post_shuffle: bool, eps: float):
    """Qwen3VLVisionPatchMerger: LayerNorm at n_embd (main merger) or at
    the merged width (deepstack, use_postshuffle_norm) -> fc1/GELU/fc2."""
    n = x.shape[0]
    if post_shuffle:
        y = x.reshape(n // m2, m2 * d)
        y = _ln(y, params[f"{prefix}_ln_w"], params[f"{prefix}_ln_b"], eps)
    else:
        y = _ln(x, params[f"{prefix}_ln_w"], params[f"{prefix}_ln_b"], eps)
        y = y.reshape(n // m2, m2 * d)
    y = jax.nn.gelu(y @ params[f"{prefix}_fc1_w"]
                    + params[f"{prefix}_fc1_b"], approximate=False)
    return y @ params[f"{prefix}_fc2_w"] + params[f"{prefix}_fc2_b"]


def qwen3vl_vision_forward(
    params: dict[str, Any], vc: Qwen3VLVisionConfig, patches: jax.Array,
    grid_hw: tuple[int, int],
):
    """Qwen3-VL ViT: (N, tp*p*p*C) merge-block-major patch rows ->
    (main (N/merge^2, d_out), deepstack features list — one per
    deepstack_visual_indexes entry, each (N/merge^2, d_out)).

    HF Qwen3VLVisionModel: conv3d patchify (+bias), bilinearly
    interpolated learned positions gathered merge-block-major (identity
    at the native grid), qwen-style 2-D rotate-half rope, LN pre-norm
    blocks with fused biased qkv + biased proj and a PLAIN (ungated)
    tanh-GELU MLP; the main merger norms pre-shuffle, deepstack mergers
    post-shuffle.  The text model adds the deepstack features to its
    early hidden states at the visual positions (DeepStack)."""
    from vlut_tpu.models.qwen_vision import _rot_half, _vision_rot_table

    gh, gw = grid_hw
    m = vc.merge
    m2 = m * m
    x = patches.astype(jnp.float32) @ params["patch_w"] + params["patch_b"]

    # positions: native-grid = gather (bilinear weights degenerate);
    # non-native grids bilinear-interpolate the (pos_grid, pos_grid) table
    pos = params["pos"]
    side = vc.pos_grid
    pos2d = pos.reshape(side, side, vc.d_model)
    if (gh, gw) != (side, side):
        hi = np.linspace(0, side - 1, gh)
        wi = np.linspace(0, side - 1, gw)
        hf_, wf_ = np.floor(hi).astype(int), np.floor(wi).astype(int)
        hc = np.clip(hf_ + 1, None, side - 1)
        wc = np.clip(wf_ + 1, None, side - 1)
        dh, dw = hi - hf_, wi - wf_
        p2 = (
            pos2d[hf_][:, wf_] * ((1 - dh)[:, None] * (1 - dw)[None])[..., None]
            + pos2d[hf_][:, wc] * ((1 - dh)[:, None] * dw[None])[..., None]
            + pos2d[hc][:, wf_] * (dh[:, None] * (1 - dw)[None])[..., None]
            + pos2d[hc][:, wc] * (dh[:, None] * dw[None])[..., None]
        )
    else:
        p2 = pos2d
    hh = np.arange(gh).reshape(gh // m, m, 1, 1)
    hh = np.broadcast_to(hh, (gh // m, m, gw // m, m))
    hh = hh.transpose(0, 2, 1, 3).reshape(-1)
    ww = np.arange(gw).reshape(1, 1, gw // m, m)
    ww = np.broadcast_to(ww, (gh // m, m, gw // m, m))
    ww = ww.transpose(0, 2, 1, 3).reshape(-1)
    x = x + p2[jnp.asarray(hh), jnp.asarray(ww)]

    cos, sin = _vision_rot_table(grid_hw, vc.head_dim, m)
    H, hd = vc.n_heads, vc.head_dim
    n = x.shape[0]

    def rope(z):
        return z * cos[:, None, :] + _rot_half(z) * sin[:, None, :]

    L = params["layers"]
    deepstack = []
    for i in range(vc.n_layers):
        lp = jax.tree.map(lambda a: a[i], L)
        h = _ln(x, lp["ln1_w"], lp["ln1_b"], vc.ln_eps)
        qkv = (h @ lp["wqkv"] + lp["bqkv"]).reshape(n, 3, H, hd)
        q, k, v = rope(qkv[:, 0]), rope(qkv[:, 1]), qkv[:, 2]
        sc = jnp.einsum("thd,shd->hts", q, k) * (hd ** -0.5)
        p = jax.nn.softmax(sc, axis=-1)
        att = jnp.einsum("hts,shd->thd", p, v).reshape(n, -1)
        x = x + (att @ lp["wo"] + lp["bo"])
        h = _ln(x, lp["ln2_w"], lp["ln2_b"], vc.ln_eps)
        a = jax.nn.gelu(h @ lp["w1"] + lp["b1"], approximate=True)
        x = x + (a @ lp["w2"] + lp["b2"])
        if i in vc.deepstack_indexes:
            di = vc.deepstack_indexes.index(i)
            deepstack.append(_qwen3vl_merger(
                params, f"ds{di}", x, vc.d_model, m2, True, vc.ln_eps))
    main = _qwen3vl_merger(params, "merge", x, vc.d_model, m2, False,
                           vc.ln_eps)
    return main, deepstack


# ---------------------------------------------------------------------------
# GLM4-V vision (reference PROJECTOR_TYPE_GLM4V, tools/mtmd/models/glm4v.cpp)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Glm4vVisionConfig:
    image_size: int = 336
    patch_size: int = 14
    d_model: int = 1536
    n_layers: int = 24
    n_heads: int = 12
    d_out: int = 4096            # out_hidden_size (= LLM width)
    d_proj_ff: int = 13696       # merger gate/up width (intermediate_size)
    temporal_patch_size: int = 2
    merge: int = 2               # spatial_merge_size
    rms_eps: float = 1e-5
    attention_bias: bool = False

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads


def glm4v_vision_forward(
    params: dict[str, Any], vc: Glm4vVisionConfig, patches: jax.Array,
    grid_hw: tuple[int, int],
) -> jax.Array:
    """GLM4-V ViT: (N, tp*p*p*C) merge-block-major patch rows ->
    (N/merge^2, d_out) embeddings (HF Glm4vVisionModel; reference
    tools/mtmd/models/glm4v.cpp).  Structure: conv3d patchify (+bias) ->
    post-conv RMSNorm -> +interpolated learned positions -> RMS-normed
    blocks (fused qkv, no-bias o/MLP, silu-gated MLP at d_out width, 2-D
    half rope) -> post RMSNorm -> merge^2 downsample conv -> merger
    (proj, LayerNorm, GELU, gated silu MLP).

    Positions: HF grid_samples the (side, side) learned table bicubically
    at the patch centers; for a native-grid input that sampling is exact
    gathering, which is what the block-major gather here implements.
    Non-native grids go through jax.image.resize bicubic (the reference
    resizes bicubically too, GGML_SCALE_MODE_BICUBIC)."""
    from vlut_tpu.models.qwen_vision import _vision_rot_table, _rot_half

    gh, gw = grid_hw
    m = vc.merge
    x = patches.astype(jnp.float32) @ params["patch_w"] + params["patch_b"]
    x = _rms(x, params["post_conv_norm"], vc.rms_eps)

    # learned positions, gathered in the same merge-block-major order
    pos = params["pos"]
    side = int(round(pos.shape[0] ** 0.5))
    pos2d = pos.reshape(side, side, vc.d_model)
    if (gh, gw) != (side, side):
        pos2d = jax.image.resize(
            pos2d, (gh, gw, vc.d_model), method="bicubic")
    hh = np.arange(gh).reshape(gh // m, m, 1, 1)
    hh = np.broadcast_to(hh, (gh // m, m, gw // m, m))
    hh = hh.transpose(0, 2, 1, 3).reshape(-1)
    ww = np.arange(gw).reshape(1, 1, gw // m, m)
    ww = np.broadcast_to(ww, (gh // m, m, gw // m, m))
    ww = ww.transpose(0, 2, 1, 3).reshape(-1)
    x = x + pos2d[jnp.asarray(hh), jnp.asarray(ww)]

    cos, sin = _vision_rot_table(grid_hw, vc.head_dim, m)
    H, hd = vc.n_heads, vc.head_dim
    n = x.shape[0]

    def rope(z):  # (N, H, hd)
        return z * cos[:, None, :] + _rot_half(z) * sin[:, None, :]

    L = params["layers"]
    for i in range(vc.n_layers):
        lp = jax.tree.map(lambda a: a[i], L)
        h_in = _rms(x, lp["ln1_w"], vc.rms_eps)
        qkv = h_in @ lp["wqkv"]
        if "bqkv" in lp:
            qkv = qkv + lp["bqkv"]
        qkv = qkv.reshape(n, 3, H, hd)
        q, k, v = rope(qkv[:, 0]), rope(qkv[:, 1]), qkv[:, 2]
        sc = jnp.einsum("thd,shd->hts", q, k) * (hd ** -0.5)
        p = jax.nn.softmax(sc, axis=-1)
        att = jnp.einsum("hts,shd->thd", p, v).reshape(n, -1)
        x = x + att @ lp["wo"]
        h_in = _rms(x, lp["ln2_w"], vc.rms_eps)
        a = jax.nn.silu(h_in @ lp["w_gate"]) * (h_in @ lp["w_up"])
        x = x + a @ lp["w_down"]

    x = _rms(x, params["post_norm"], vc.rms_eps)
    # downsample conv over each merge x merge block (block-major rows):
    # equivalent to a linear over the concatenated block features
    x = x.reshape(n // (m * m), m * m * vc.d_model)
    x = x @ params["down_w"] + params["down_b"]
    # merger (Glm4vVisionPatchMerger)
    x = x @ params["merge_proj"]
    x = _ln(x, params["merge_ln_w"], params["merge_ln_b"], 1e-5)
    x = jax.nn.gelu(x, approximate=False)
    a = jax.nn.silu(x @ params["merge_gate"]) * (x @ params["merge_up"])
    return a @ params["merge_down"]


# ---------------------------------------------------------------------------
# Kimi-VL (MoonViT) — reference PROJECTOR_TYPE_KIMIVL,
# tools/mtmd/models/kimivl.cpp (no HF transformers module: parity runs
# against a direct torch transcription of the reference graph,
# tests/test_vision_wave3.py)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class KimiVLConfig:
    image_size: int = 448
    patch_size: int = 14
    d_model: int = 1152
    n_layers: int = 27
    n_heads: int = 16
    d_ff: int = 4304
    ln_eps: float = 1e-6
    rope_theta: float = 10000.0
    merge: int = 2
    d_llm: int = 2048


def _rope2d_split_tables(grid_hw, hd: int, theta: float):
    """Reference build_rope_2d (clip.cpp:651-712, interleave_freq=false):
    the FIRST half of the head dim rotates with the X (w) positions, the
    second half with Y (h), both halves sharing the same inv_freq set
    (theta^(-2j/(hd/2))), each half in ggml mode-0 (PAIR-interleaved)
    rope over hd/2 dims.  Returns (cos, sin) (N, hd/2): pair j's angle,
    halves concatenated."""
    h, w = grid_hw
    half = hd // 2
    inv = 1.0 / (theta ** (np.arange(0, half, 2, dtype=np.float64) / half))
    ww, hh = np.meshgrid(np.arange(w), np.arange(h))  # (h, w)
    pw = ww.reshape(-1)[:, None] * inv[None]          # (N, half/2)
    ph = hh.reshape(-1)[:, None] * inv[None]
    ang = np.concatenate([pw, ph], axis=-1)           # (N, hd/2)
    return (jnp.asarray(np.cos(ang), jnp.float32),
            jnp.asarray(np.sin(ang), jnp.float32))


def kimivl_forward(
    params: dict[str, Any], cfg: KimiVLConfig, images: jax.Array
) -> jax.Array:
    """Kimi-VL MoonViT: (B, H, W, 3) -> (B, P, D).  Learned positions
    (bicubic-resized off the native grid, reference
    resize_position_embeddings) + split-half 2-D rope, LN pre-norms,
    biased q/k/v/o and GELU MLP (reference build_vit with
    NORM_TYPE_NORMAL)."""
    b, hh, ww, _ = images.shape
    grid = (hh // cfg.patch_size, ww // cfg.patch_size)
    x = _patchify(images.astype(jnp.float32), cfg.patch_size)
    x = x @ params["patch_w"] + params["patch_b"]
    pos = params["pos"]
    side = int(round(pos.shape[0] ** 0.5))
    if grid != (side, side):
        pos = jax.image.resize(
            pos.reshape(side, side, cfg.d_model),
            (grid[0], grid[1], cfg.d_model), method="bicubic",
        ).reshape(-1, cfg.d_model)
    x = x + pos[None]
    cos, sin = _rope2d_split_tables(grid, cfg.d_model // cfg.n_heads,
                                    cfg.rope_theta)
    H, hd = cfg.n_heads, cfg.d_model // cfg.n_heads
    t = x.shape[1]

    def rope(z):  # (B, T, H, hd) — pair-interleaved per ggml mode 0
        return _rope_pairs(z, cos, sin)

    for i in range(cfg.n_layers):
        lp = jax.tree.map(lambda a: a[i], params["layers"])
        h = _ln(x, lp["ln1_w"], lp["ln1_b"], cfg.ln_eps)
        q = rope((h @ lp["wq"] + lp["bq"]).reshape(b, t, H, hd))
        k = rope((h @ lp["wk"] + lp["bk"]).reshape(b, t, H, hd))
        v = (h @ lp["wv"] + lp["bv"]).reshape(b, t, H, hd)
        att = _attend(q, k, v, hd).reshape(b, t, cfg.d_model)
        x = x + (att @ lp["wo"] + lp["bo"])
        h = _ln(x, lp["ln2_w"], lp["ln2_b"], cfg.ln_eps)
        a = jax.nn.gelu(h @ lp["w1"] + lp["b1"], approximate=True)
        x = x + (a @ lp["w2"] + lp["b2"])
    if "post_ln_w" in params:
        x = _ln(x, params["post_ln_w"], params["post_ln_b"], cfg.ln_eps)
    return x


def kimivl_project(
    params: dict[str, Any], cfg: KimiVLConfig, feats: jax.Array
) -> jax.Array:
    """Patch-merge permute -> LayerNorm at the ORIGINAL n_embd width
    (kimivl.cpp:37-48 views the merged rows back to n_embd for the norm)
    -> biased GELU MLP into the decoder width."""
    b, p, d = feats.shape
    m = cfg.merge
    x = idefics3_pixel_shuffle(feats, m)        # build_patch_merge_permute
    # LN over each n_embd-wide sub-patch of the merged rows
    x = x.reshape(b, -1, d)
    x = _ln(x, params["proj_ln_w"], params["proj_ln_b"], 1e-5)
    x = x.reshape(b, p // m ** 2, d * m ** 2)
    x = jax.nn.gelu(x @ params["proj_w1"] + params["proj_b1"],
                    approximate=False)
    return x @ params["proj_w2"] + params["proj_b2"]


# ---------------------------------------------------------------------------
# Idefics3 connector (the tower itself is vision_ext.siglip_forward)
# ---------------------------------------------------------------------------

def idefics3_pixel_shuffle(x: jax.Array, scale: int) -> jax.Array:
    """HF Idefics3Connector.pixel_shuffle transcription ((B, P, C) square
    grid; reference build_patch_merge_permute, clip.cpp:746-775)."""
    b, p, c = x.shape
    side = int(round(p ** 0.5))
    x = x.reshape(b, side, side, c)
    x = x.reshape(b, side, side // scale, c * scale)
    x = x.transpose(0, 2, 1, 3)
    x = x.reshape(b, side // scale, side // scale, c * scale * scale)
    x = x.transpose(0, 2, 1, 3)
    return x.reshape(b, p // scale ** 2, c * scale ** 2)


def idefics3_project(
    params: dict[str, Any], feats: jax.Array, scale: int
) -> jax.Array:
    """Pixel shuffle + single no-bias linear into the decoder width (HF
    Idefics3Connector/Idefics3SimpleMLP; reference
    tools/mtmd/models/siglip.cpp:41-46)."""
    return idefics3_pixel_shuffle(feats, scale) @ params["mm_proj"]

"""Vision encoder + projector (reference: tools/mtmd — clip.cpp and the
llava projector — feeding image embeddings into the decoder as tokens).

TPU-native CLIP/SigLIP-style ViT: the patchify convolution is an unfold +
matmul (MXU-friendly, no conv op), encoder blocks are standard pre-LN
MHA + GELU-MLP in bf16 (vision towers are ~300M params — dense bf16 keeps
them trivially fast next to the ternary LLM), and the LLaVA-style 2-layer
GELU projector maps patch features into the decoder's embedding space.

Image embeddings splice into the decoder through `forward`'s
``token_embeds`` injection (models/transformer.py): the host builds one
(T, d_model) embedding sequence with text-token embeddings around the
projected patches — exactly the reference's "image tokens" contract.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class VisionConfig:
    image_size: int = 336
    patch_size: int = 14
    d_model: int = 1024
    n_layers: int = 24
    n_heads: int = 16
    d_ff: int = 4096
    layer_norm_eps: float = 1e-5
    d_llm: int = 4096          # decoder embedding width (projector output)
    projector_layers: int = 2
    use_cls_token: bool = True
    # llava drops the CLS token and projects patch features only
    select_feature: str = "patch"  # "patch" | "cls_patch"
    # llava uses the features of a mid layer (vision_feature_layer=-2)
    feature_layer: int = -2

    @property
    def n_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


def _ln(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)


def init_params(cfg: VisionConfig, seed: int = 0, dtype=jnp.bfloat16):
    rng = np.random.default_rng(seed)
    d, f, L = cfg.d_model, cfg.d_ff, cfg.n_layers
    pdim = 3 * cfg.patch_size * cfg.patch_size

    def rand(*shape, s=0.02):
        return jnp.asarray(rng.standard_normal(shape) * s, dtype)

    layers = {
        "ln1_w": jnp.ones((L, d), jnp.float32),
        "ln1_b": jnp.zeros((L, d), jnp.float32),
        "ln2_w": jnp.ones((L, d), jnp.float32),
        "ln2_b": jnp.zeros((L, d), jnp.float32),
        "wq": rand(L, d, d), "bq": jnp.zeros((L, d), dtype),
        "wk": rand(L, d, d), "bk": jnp.zeros((L, d), dtype),
        "wv": rand(L, d, d), "bv": jnp.zeros((L, d), dtype),
        "wo": rand(L, d, d), "bo": jnp.zeros((L, d), dtype),
        "w1": rand(L, d, f), "b1": jnp.zeros((L, f), dtype),
        "w2": rand(L, f, d), "b2": jnp.zeros((L, d), dtype),
    }
    n_pos = cfg.n_patches + (1 if cfg.use_cls_token else 0)
    params: dict[str, Any] = {
        "patch_w": rand(pdim, d),
        "cls": rand(1, d) if cfg.use_cls_token else None,
        "pos": rand(n_pos, d),
        "pre_ln_w": jnp.ones((d,), jnp.float32),
        "pre_ln_b": jnp.zeros((d,), jnp.float32),
        "layers": layers,
        "proj_w1": rand(d, cfg.d_llm),
        "proj_b1": jnp.zeros((cfg.d_llm,), dtype),
        "proj_w2": rand(cfg.d_llm, cfg.d_llm),
        "proj_b2": jnp.zeros((cfg.d_llm,), dtype),
    }
    params = {k: v for k, v in params.items() if v is not None}
    return params


def patchify(images: jax.Array, patch: int) -> jax.Array:
    """(B, H, W, 3) -> (B, n_patches, 3*patch*patch) — the conv-as-matmul
    unfold (channels-last, row-major patches, matching a conv with stride
    = kernel = patch after weight reshape)."""
    b, h, w, c = images.shape
    gh, gw = h // patch, w // patch
    x = images.reshape(b, gh, patch, gw, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, gh, gw, p, p, C)
    return x.reshape(b, gh * gw, patch * patch * c)


def encode_image(
    params: dict[str, Any], cfg: VisionConfig, images: jax.Array
) -> jax.Array:
    """(B, H, W, 3) float in [-1, 1] -> (B, n_tokens, d_llm) projected
    embeddings ready to splice into the decoder."""
    b = images.shape[0]
    x = jnp.dot(
        patchify(images.astype(jnp.float32), cfg.patch_size),
        params["patch_w"].astype(jnp.float32),
    ).astype(params["patch_w"].dtype)  # (B, P, d)
    if cfg.use_cls_token:
        cls = jnp.broadcast_to(params["cls"], (b, 1, cfg.d_model)).astype(
            x.dtype
        )
        x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos"][None].astype(x.dtype)
    x = _ln(x, params["pre_ln_w"], params["pre_ln_b"], cfg.layer_norm_eps)

    hd = cfg.d_model // cfg.n_heads
    keep = cfg.n_layers + cfg.feature_layer + 1 if cfg.feature_layer < 0 \
        else cfg.feature_layer + 1

    def block(x, lp):
        h = _ln(x, lp["ln1_w"], lp["ln1_b"], cfg.layer_norm_eps)
        t = h.shape[1]

        def heads(y):
            return y.reshape(b, t, cfg.n_heads, hd)

        q = heads(jnp.dot(h, lp["wq"]) + lp["bq"])
        k = heads(jnp.dot(h, lp["wk"]) + lp["bk"])
        v = heads(jnp.dot(h, lp["wv"]) + lp["bv"])
        scores = jnp.einsum(
            "bthd,bshd->bhts", q.astype(jnp.float32),
            k.astype(jnp.float32),
        ) / np.sqrt(hd)
        p = jax.nn.softmax(scores, axis=-1)
        att = jnp.einsum(
            "bhts,bshd->bthd", p, v.astype(jnp.float32)
        ).reshape(b, t, cfg.d_model).astype(x.dtype)
        x = x + jnp.dot(att, lp["wo"]) + lp["bo"]
        h = _ln(x, lp["ln2_w"], lp["ln2_b"], cfg.layer_norm_eps)
        m = jax.nn.gelu(
            (jnp.dot(h, lp["w1"]) + lp["b1"]).astype(jnp.float32),
            approximate=True,
        ).astype(x.dtype)
        x = x + jnp.dot(m, lp["w2"]) + lp["b2"]
        return x

    # run up to the llava feature layer (inclusive)
    for i in range(keep):
        lp = jax.tree.map(lambda a, i=i: a[i], params["layers"])
        x = block(x, lp)

    if cfg.select_feature == "patch" and cfg.use_cls_token:
        x = x[:, 1:]
    return llava_project(params, x)


def llava_project(params, x):
    """llava projector: linear -> gelu -> linear.  The MLP_NORM variant
    (yi-vl; reference tools/mtmd/models/llava.cpp:176-196) inserts a
    LayerNorm after EACH linear when proj_ln{1,2}_{w,b} are present."""

    def _pln(v, nm):
        mu = v.mean(-1, keepdims=True)
        var = ((v - mu) ** 2).mean(-1, keepdims=True)
        return ((v - mu) * jax.lax.rsqrt(var + 1e-5)
                * params[f"{nm}_w"].astype(jnp.float32)
                + params[f"{nm}_b"].astype(jnp.float32))

    y = jnp.dot(x.astype(jnp.float32), params["proj_w1"].astype(jnp.float32))
    y = y + params["proj_b1"].astype(jnp.float32)
    if "proj_ln1_w" in params:
        y = _pln(y, "proj_ln1")
    y = jax.nn.gelu(y, approximate=True)
    y = jnp.dot(y, params["proj_w2"].astype(jnp.float32))
    y = y + params["proj_b2"].astype(jnp.float32)
    if "proj_ln2_w" in params:
        y = _pln(y, "proj_ln2")
    return y.astype(params["proj_w2"].dtype)


def preprocess_image(path_or_array, image_size: int) -> np.ndarray:
    """Load + resize + CLIP-normalize an image to (H, W, 3) in ~[-2, 2]."""
    if isinstance(path_or_array, np.ndarray):
        arr = path_or_array
    else:
        from PIL import Image

        img = Image.open(path_or_array).convert("RGB")
        img = img.resize((image_size, image_size))
        arr = np.asarray(img, np.float32) / 255.0
    mean = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
    std = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)
    return ((arr - mean) / std).astype(np.float32)


def build_multimodal_embeds(
    llm_params: dict[str, Any],
    image_embeds: jax.Array,  # (n_img_tokens, d_llm)
    prefix_ids: list[int],
    suffix_ids: list[int],
) -> jax.Array:
    """Text-embed prefix + image patches + text-embed suffix -> (T, d)."""
    embed = llm_params["embed"]
    parts = []
    if prefix_ids:
        parts.append(embed[jnp.asarray(prefix_ids, jnp.int32)])
    parts.append(image_embeds.astype(embed.dtype))
    if suffix_ids:
        parts.append(embed[jnp.asarray(suffix_ids, jnp.int32)])
    return jnp.concatenate(parts, axis=0)


# image normalization per tower family (HF image-processor defaults)
_CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
_CLIP_STD = (0.26862954, 0.26130258, 0.27577711)
_HALF = (0.5, 0.5, 0.5)
_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)


def _load_rgb(path_or_array, image_size: int, mean, std) -> np.ndarray:
    if isinstance(path_or_array, np.ndarray):
        arr = path_or_array
    else:
        from PIL import Image

        img = Image.open(path_or_array).convert("RGB")
        img = img.resize((image_size, image_size))
        arr = np.asarray(img, np.float32) / 255.0
    m = np.asarray(mean, np.float32)
    s = np.asarray(std, np.float32)
    return ((arr - m) / s).astype(np.float32)


def encode_image_auto(model_dir, image_path):
    """Dispatch an image through WHICHEVER tower family the checkpoint
    carries — the product-side router for `vlut-tpu describe` (reference:
    mtmd-cli auto-selects by the gguf projector type).  Returns
    (embeds (n_tokens, d_llm), family_name) or (None, None) when the
    checkpoint has no vision sidecar.

    Families: CLIP/llava, gemma3 SigLIP, pixtral, qwen2/2.5-vl,
    internvl, llama4-vision, idefics3, glm4v, janus-pro, lfm2-vl
    (models/vision*.py; each has its own HF-parity test)."""
    import jax.numpy as jnp

    from vlut_tpu.convert import checkpoint as ck

    vcfg, vparams = ck.load_vision(model_dir)
    if vcfg is not None:
        img = preprocess_image(image_path, vcfg.image_size)
        return encode_image(vparams, vcfg, jnp.asarray(img)[None])[0], \
            "clip-llava"

    scfg, sp, _ = ck.load_siglip(model_dir)
    if scfg is not None:
        from vlut_tpu.models.vision_ext import gemma3_project, siglip_forward

        img = _load_rgb(image_path, scfg.image_size, _HALF, _HALF)
        feats = siglip_forward(sp, scfg, jnp.asarray(img)[None])
        return gemma3_project(sp, scfg, feats)[0], "gemma3-siglip"

    pcfg, pp, _ = ck.load_pixtral(model_dir)
    if pcfg is not None:
        from vlut_tpu.models.vision_ext import (
            pixtral_forward,
            pixtral_project,
        )

        img = _load_rgb(image_path, pcfg.image_size, _CLIP_MEAN, _CLIP_STD)
        feats = pixtral_forward(pp, pcfg, jnp.asarray(img)[None])
        side = pcfg.image_size // pcfg.patch_size
        return pixtral_project(
            pp, feats, cfg=pcfg, grid_hw=(side, side)), "pixtral"

    qv = ck.load_qwen_vision(model_dir) if hasattr(
        ck, "load_qwen_vision") else (None,) * 3
    if qv[0] is not None:
        from vlut_tpu.models.qwen_vision import patchify, vision_forward

        qcfg = qv[0]
        img = _load_rgb(image_path, 224, _CLIP_MEAN, _CLIP_STD)
        patches, grid = patchify(img.transpose(2, 0, 1), qcfg)
        return vision_forward(
            qv[1], qcfg, jnp.asarray(patches), grid), "qwen-vl"

    icfg, ip, _ = ck.load_internvl_vision(model_dir)
    if icfg is not None:
        from vlut_tpu.models.vision_wave3 import (
            internvl_forward,
            internvl_project,
        )

        img = _load_rgb(image_path, icfg.image_size,
                        _IMAGENET_MEAN, _IMAGENET_STD)
        feats = internvl_forward(ip, icfg, jnp.asarray(img)[None])
        return internvl_project(ip, icfg, feats)[0], "internvl"

    lcfg, lp, _ = ck.load_llama4_vision(model_dir)
    if lcfg is not None:
        from vlut_tpu.models.vision_wave3 import (
            llama4_project,
            llama4_vision_forward,
        )

        img = _load_rgb(image_path, lcfg.image_size, _HALF, _HALF)
        feats = llama4_vision_forward(lp, lcfg, jnp.asarray(img)[None])
        return llama4_project(lp, lcfg, feats)[0], "llama4-vision"

    i3 = ck.load_idefics3(model_dir)
    if i3[0] is not None:
        from vlut_tpu.models.vision_ext import siglip_forward
        from vlut_tpu.models.vision_wave3 import idefics3_project

        scfg, scale, sp = i3[0], i3[1], i3[2]
        img = _load_rgb(image_path, scfg.image_size, _HALF, _HALF)
        feats = siglip_forward(sp, scfg, jnp.asarray(img)[None])
        return idefics3_project(sp, feats, scale)[0], "idefics3"

    gcfg, gp, _ = ck.load_glm4v_vision(model_dir)
    if gcfg is not None:
        from vlut_tpu.models.qwen_vision import QwenVisionConfig, patchify
        from vlut_tpu.models.vision_wave3 import glm4v_vision_forward

        img = _load_rgb(image_path, gcfg.image_size, _HALF, _HALF)
        qvc = QwenVisionConfig(
            depth=gcfg.n_layers, embed_dim=gcfg.d_model,
            n_heads=gcfg.n_heads, mlp_dim=gcfg.d_out,
            patch_size=gcfg.patch_size,
            temporal_patch_size=gcfg.temporal_patch_size,
            spatial_merge_size=gcfg.merge,
        )
        patches, grid = patchify(img.transpose(2, 0, 1), qvc)
        return glm4v_vision_forward(
            gp, gcfg, jnp.asarray(patches), grid), "glm4v"

    q3 = ck.load_qwen3vl_vision(model_dir)
    if q3[0] is not None:
        from vlut_tpu.models.qwen_vision import QwenVisionConfig, patchify
        from vlut_tpu.models.vision_wave3 import qwen3vl_vision_forward

        qcfg = q3[0]
        img = _load_rgb(image_path, qcfg.pos_grid * qcfg.patch_size,
                        _HALF, _HALF)
        qvc = QwenVisionConfig(
            depth=qcfg.n_layers, embed_dim=qcfg.d_model,
            n_heads=qcfg.n_heads, mlp_dim=qcfg.d_ff,
            patch_size=qcfg.patch_size,
            temporal_patch_size=qcfg.temporal_patch_size,
            spatial_merge_size=qcfg.merge,
        )
        patches, grid = patchify(img.transpose(2, 0, 1), qvc)
        main, deepstack = qwen3vl_vision_forward(
            q3[1], qcfg, jnp.asarray(patches), grid)
        # the caller scatters deepstack planes to the image span and
        # passes them as forward(deepstack_embeds=...) (DeepStack)
        return main, ("qwen3vl-deepstack", tuple(deepstack))

    jcfg, jp, _ = ck.load_janus_vision(model_dir)
    if jcfg is not None:
        from vlut_tpu.models.vision_ext import siglip_forward
        from vlut_tpu.models.vision_wave3 import janus_aligner

        img = _load_rgb(image_path, jcfg.image_size,
                        _IMAGENET_MEAN, _IMAGENET_STD)
        feats = siglip_forward(jp, jcfg, jnp.asarray(img)[None],
                               act="exact")
        return janus_aligner(jp, feats)[0], "janus-pro"

    l2 = ck.load_lfm2vl_vision(model_dir)
    if l2[0] is not None:
        from vlut_tpu.models.vision_ext import siglip_forward
        from vlut_tpu.models.vision_wave3 import lfm2vl_project

        scfg, factor, lp = l2[0], l2[1], l2[2]
        img = _load_rgb(image_path, scfg.image_size, _HALF, _HALF)
        feats = siglip_forward(lp, scfg, jnp.asarray(img)[None])
        return lfm2vl_project(lp, feats, factor)[0], "lfm2-vl"

    return None, None

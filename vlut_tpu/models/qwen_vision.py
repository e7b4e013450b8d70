"""Qwen2-VL vision tower + M-RoPE position machinery.

Reference analogs: src/models/qwen2vl.cpp (M-RoPE text graph) and the
mtmd qwen2vl vision encoder (tools/mtmd clip qwen2vl_merger projector;
gguf VisionProjectorType.MERGER).

Pipeline (HF Qwen2VisionTransformerPretrainedModel):
  pixels -> 3D-conv patchify (temporal_patch x patch x patch, no bias)
  -> ViT blocks: pre-LN, fused qkv (+bias), 2-D rotary (head_dim/2 freq
     pairs split half h-position / half w-position), full bidirectional
     attention over each image's patches, gelu MLP
  -> PatchMerger: LayerNorm + MLP over spatial_merge_size^2 grouped
     patches -> language-model-width embeddings.

M-RoPE (text side): positions are (3, T) = (temporal, height, width);
the rope frequency pairs are split by ``mrope_section`` with each chunk
reading its own position row.  For pure text all three rows are equal and
M-RoPE reduces exactly to standard RoPE.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class QwenVisionConfig:
    depth: int
    embed_dim: int
    n_heads: int
    mlp_dim: int
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    in_channels: int = 3
    out_dim: int = 3584          # language-model width
    ln_eps: float = 1e-6
    # --- qwen2.5-VL variant (reference mtmd PROJECTOR_TYPE_QWEN25VL;
    # HF Qwen2_5_VisionTransformerPretrainedModel) ------------------
    rms_norm: bool = False       # RMSNorm block norms + merger ln_q
    gated_mlp: bool = False      # silu gate/up/down MLP WITH biases
    window_size: int = 0         # window attention size in PIXELS (112)
    fullatt_blocks: tuple[int, ...] = ()  # blocks with full attention

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.n_heads


def _ln(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    xc = xf - mu
    v = (xc * xc).mean(-1, keepdims=True)
    return xc * jax.lax.rsqrt(v + eps) * w + b


def _vision_rot_table(grid_hw: tuple[int, int], hd: int, merge: int):
    """Per-patch (cos, sin) of width hd: freq pairs split h/w, patch order
    follows the merge-block-major flattening (Qwen2VL rot_pos_emb)."""
    h, w = grid_hw
    dim = hd // 2  # rotary freq count, half for h and half for w
    inv = 1.0 / (10000.0 ** (np.arange(0, dim, 2, dtype=np.float32) / dim))
    hpos = np.arange(h).reshape(h // merge, merge, 1, 1)
    hpos = np.broadcast_to(hpos, (h // merge, merge, w // merge, merge))
    hpos = hpos.transpose(0, 2, 1, 3).reshape(-1)
    wpos = np.arange(w).reshape(1, 1, w // merge, merge)
    wpos = np.broadcast_to(wpos, (h // merge, merge, w // merge, merge))
    wpos = wpos.transpose(0, 2, 1, 3).reshape(-1)
    fh = hpos[:, None] * inv[None, :]   # (N, hd/4)
    fw = wpos[:, None] * inv[None, :]
    freqs = np.concatenate([fh, fw], -1)        # (N, hd/2)
    emb = np.concatenate([freqs, freqs], -1)    # (N, hd)
    return jnp.asarray(np.cos(emb)), jnp.asarray(np.sin(emb))


def _rot_half(x):
    h = x.shape[-1] // 2
    return jnp.concatenate([-x[..., h:], x[..., :h]], -1)


def _rms(x, w, eps):
    xf = x.astype(jnp.float32)
    return xf * jax.lax.rsqrt(
        jnp.mean(xf * xf, -1, keepdims=True) + eps) * w


def _window_order(grid_hw: tuple[int, int], vc: QwenVisionConfig):
    """Qwen2.5-VL window reorder (HF get_window_index): permutation of
    spatial-merge UNITS into window-major order + per-window unit counts
    (windows may be ragged at the right/bottom edges).  Host-side numpy —
    grid is static per trace."""
    m = vc.spatial_merge_size
    gh, gw = grid_hw[0] // m, grid_hw[1] // m   # llm grid
    vw = vc.window_size // m // vc.patch_size   # units per window side
    idx = np.arange(gh * gw).reshape(gh, gw)
    pad_h, pad_w = (-gh) % vw, (-gw) % vw
    idxp = np.pad(idx, ((0, pad_h), (0, pad_w)), constant_values=-100)
    nh, nw = (gh + pad_h) // vw, (gw + pad_w) // vw
    idxp = idxp.reshape(nh, vw, nw, vw).transpose(0, 2, 1, 3)
    idxp = idxp.reshape(nh * nw, vw * vw)
    seqlens = (idxp != -100).sum(-1)            # units per window
    order = idxp.reshape(-1)
    order = order[order != -100]
    return order, seqlens


def vision_forward(
    params: dict[str, Any],
    vc: QwenVisionConfig,
    patches: jax.Array,        # (N, temporal*patch*patch*channels) raw
    grid_hw: tuple[int, int],
) -> jax.Array:
    """One image's patch sequence -> (N / merge^2, out_dim) embeddings."""
    x = (patches.astype(jnp.float32) @ params["patch_w"])  # (N, D)
    cos, sin = _vision_rot_table(grid_hw, vc.head_dim, vc.spatial_merge_size)
    H, hd = vc.n_heads, vc.head_dim
    n = x.shape[0]
    m2 = vc.spatial_merge_size ** 2

    win_mask = None
    inv_units = None
    if vc.window_size:
        # qwen2.5-VL: reorder spatial-merge units window-major; window
        # blocks use a block-diagonal mask, fullatt_blocks see everything
        order, seqlens = _window_order(grid_hw, vc)
        perm = (order[:, None] * m2 + np.arange(m2)[None]).reshape(-1)
        x = x[jnp.asarray(perm)]
        cos, sin = cos[jnp.asarray(perm)], sin[jnp.asarray(perm)]
        wid = np.repeat(np.arange(len(seqlens)), seqlens * m2)
        win_mask = jnp.asarray(
            np.where(wid[:, None] == wid[None, :], 0.0, -1e30),
            jnp.float32)
        inv_units = np.argsort(order)

    def rope(z):  # (N, H, hd)
        return z * cos[:, None, :] + _rot_half(z) * sin[:, None, :]

    L = params["layers"]
    for i in range(vc.depth):
        lp = jax.tree.map(lambda a: a[i], L)
        if vc.rms_norm:
            h_in = _rms(x, lp["ln1_w"], vc.ln_eps)
        else:
            h_in = _ln(x, lp["ln1_w"], lp["ln1_b"], vc.ln_eps)
        qkv = (h_in @ lp["wqkv"] + lp["bqkv"]).reshape(n, 3, H, hd)
        q, k, v = rope(qkv[:, 0]), rope(qkv[:, 1]), qkv[:, 2]
        sc = jnp.einsum("thd,shd->hts", q, k) * (hd ** -0.5)
        if win_mask is not None and i not in vc.fullatt_blocks:
            sc = sc + win_mask[None]
        p = jax.nn.softmax(sc, axis=-1)
        att = jnp.einsum("hts,shd->thd", p, v).reshape(n, -1)
        x = x + (att @ lp["wo"] + lp["bo"])
        if vc.rms_norm:
            h_in = _rms(x, lp["ln2_w"], vc.ln_eps)
        else:
            h_in = _ln(x, lp["ln2_w"], lp["ln2_b"], vc.ln_eps)
        if vc.gated_mlp:
            a = jax.nn.silu(h_in @ lp["w_gate"] + lp["b_gate"]) * (
                h_in @ lp["w1"] + lp["b1"])
        else:
            a = jax.nn.gelu(h_in @ lp["w1"] + lp["b1"], approximate=False)
        x = x + (a @ lp["w2"] + lp["b2"])

    # PatchMerger: norm then group merge^2 patches and MLP to out_dim
    if vc.rms_norm:
        x = _rms(x, params["merge_ln_w"], vc.ln_eps)
    else:
        x = _ln(x, params["merge_ln_w"], params["merge_ln_b"], vc.ln_eps)
    x = x.reshape(n // m2, m2 * vc.embed_dim)
    x = jax.nn.gelu(x @ params["merge_w1"] + params["merge_b1"],
                    approximate=False)
    out = x @ params["merge_w2"] + params["merge_b2"]
    if inv_units is not None:
        out = out[jnp.asarray(inv_units)]  # back to merge-block-major
    return out


def patchify(pixels: np.ndarray, vc: QwenVisionConfig) -> tuple[
        np.ndarray, tuple[int, int]]:
    """(C, H, W) image -> (N, tp*p*p*C) patch rows in the merge-block-major
    order HF's image processor emits, + the (grid_h, grid_w)."""
    c, hh, ww = pixels.shape
    p, tp, m = vc.patch_size, vc.temporal_patch_size, vc.spatial_merge_size
    gh, gw = hh // p, ww // p
    # temporal axis: a still image repeats the frame tp times
    px = np.broadcast_to(pixels[None], (tp, c, hh, ww))
    # (tp, C, gh, p, gw, p) -> merge-block-major patch order
    px = px.reshape(tp, c, gh, p, gw, p)
    px = px.transpose(2, 4, 1, 0, 3, 5)  # (gh, gw, C, tp, p, p)
    px = px.reshape(gh // m, m, gw // m, m, c, tp, p, p)
    px = px.transpose(0, 2, 1, 3, 4, 5, 6, 7)
    patches = px.reshape(gh * gw, c * tp * p * p)
    return patches, (gh, gw)


def mrope_positions(
    n_text_before: int, grid_hw: tuple[int, int], merge: int,
    n_text_after: int,
) -> np.ndarray:
    """(3, T) M-RoPE positions for [text, image, text] (HF get_rope_index):
    text rows advance together; image patches get (t=const, h, w) grid
    positions starting at the text offset; trailing text resumes after
    max(image positions) + 1."""
    gh, gw = grid_hw[0] // merge, grid_hw[1] // merge
    rows = [np.tile(np.arange(n_text_before), (3, 1))]
    st = n_text_before
    tpos = np.full((gh * gw,), st)
    hpos = st + np.repeat(np.arange(gh), gw)
    wpos = st + np.tile(np.arange(gw), gh)
    rows.append(np.stack([tpos, hpos, wpos]))
    nxt = st + max(gh, gw)
    rows.append(np.tile(nxt + np.arange(n_text_after), (3, 1)))
    return np.concatenate(rows, axis=1)

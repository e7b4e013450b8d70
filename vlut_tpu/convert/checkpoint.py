"""Native packed-ternary checkpoint format.

Replaces the reference's GGUF + llama-quantize two-step (SURVEY §3.4) with a
single directory:

    <ckpt>/
      vlut_config.json        — ModelConfig + format metadata
      model.safetensors       — packed trits (uint8), scales, norms,
                                embed/lm_head (bf16 as uint16 view)
      tokenizer files         — copied verbatim from the HF source so
                                transformers.AutoTokenizer works offline

Tensor naming: flat keys mirroring the params pytree, e.g.
``layers.wq.packed`` (L, rows, n) uint8, ``layers.wq.scale`` (L,) f32,
``embed`` (V, D), ``final_norm`` (D,).
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
import shutil
from typing import Any

import jax.numpy as jnp
import numpy as np
from safetensors.numpy import load_file, save_file

from vlut_tpu.config import ModelConfig

_TOKENIZER_FILES = (
    "tokenizer.json",
    "tokenizer_config.json",
    "tokenizer.model",
    "special_tokens_map.json",
    "vocab.json",
    "merges.txt",
    "generation_config.json",
)

FORMAT_VERSION = 1


def _flatten(tree: dict[str, Any], prefix: str = "") -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    for k, v in tree.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key + "."))
        elif v is None:
            continue
        else:
            arr = np.asarray(v)
            if arr.dtype == jnp.bfloat16:
                arr = arr.view(np.uint16)
                key = key + "::bf16"
            out[key] = arr
    return out


def _unflatten(flat: dict[str, np.ndarray]) -> dict[str, Any]:
    tree: dict[str, Any] = {}
    for key, arr in flat.items():
        if key.endswith("::bf16"):
            key = key[: -len("::bf16")]
            arr = jnp.asarray(arr).view(jnp.bfloat16)
        parts = key.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr
    return tree


def save_checkpoint(
    path: str | pathlib.Path,
    cfg: ModelConfig,
    params: dict[str, Any],
    tokenizer_src: str | pathlib.Path | None = None,
    extra_meta: dict[str, Any] | None = None,
) -> None:
    path = pathlib.Path(path)
    path.mkdir(parents=True, exist_ok=True)
    layers_tuple = isinstance(params.get("layers"), (list, tuple))
    if layers_tuple:
        # heterogeneous per-layer trees (deepseek first_k_dense): store as
        # sortable numbered keys, reassembled into a tuple at load
        params = {
            **params,
            "layers": {
                f"t{i:04d}": lp for i, lp in enumerate(params["layers"])
            },
        }
    flat = _flatten(params)
    save_file({k: np.ascontiguousarray(v) for k, v in flat.items()},
              str(path / "model.safetensors"))
    family = type(cfg).__name__  # ModelConfig | MambaConfig | EncoderConfig
    meta = {
        "format_version": FORMAT_VERSION,
        "model_family": {
            "MambaConfig": "mamba", "EncoderConfig": "encoder",
            "T5Config": "t5", "Mamba2Config": "mamba2",
            "HybridConfig": "hybrid", "Rwkv7Config": "rwkv7",
            "Rwkv6Config": "rwkv6", "Gemma3nConfig": "gemma3n",
        }.get(family, "transformer"),
        "model_config": dataclasses.asdict(cfg),
        "layers_tuple": layers_tuple,
        **(extra_meta or {}),
    }
    (path / "vlut_config.json").write_text(json.dumps(meta, indent=2))
    if tokenizer_src is not None:
        src = pathlib.Path(tokenizer_src)
        for fname in _TOKENIZER_FILES:
            f = src / fname
            if f.exists():
                shutil.copy(f, path / fname)


def load_checkpoint(
    path: str | pathlib.Path,
    stream: bool = False,
) -> tuple[ModelConfig, dict[str, Any], dict[str, Any]]:
    """Returns (cfg, params, meta).  With stream=False arrays come back
    as host numpy; move to device (with shardings) via jax.device_put.
    With stream=True each tensor is device_put as it is read from the
    mmap-backed safetensors file (one-tensor peak host memory; transfers
    overlap reads) — the single-device serving fast path."""
    path = pathlib.Path(path)
    meta = json.loads((path / "vlut_config.json").read_text())
    if meta.get("format_version") != FORMAT_VERSION:
        raise ValueError(f"unsupported checkpoint version: {meta}")
    if meta.get("model_family") == "mamba":
        from vlut_tpu.models.ssm import MambaConfig

        cfg = MambaConfig(**meta["model_config"])
    elif meta.get("model_family") == "encoder":
        from vlut_tpu.models.encoder import EncoderConfig

        cfg = EncoderConfig(**meta["model_config"])
    elif meta.get("model_family") == "t5":
        from vlut_tpu.models.t5 import T5Config

        cfg = T5Config(**meta["model_config"])
    elif meta.get("model_family") == "mamba2":
        from vlut_tpu.models.ssm import Mamba2Config

        mc = dict(meta["model_config"])
        mc["time_limit"] = tuple(mc.get("time_limit", (0.0, float("inf"))))
        cfg = Mamba2Config(**mc)
    elif meta.get("model_family") == "rwkv7":
        from vlut_tpu.models.rwkv import Rwkv7Config

        cfg = Rwkv7Config(**meta["model_config"])
    elif meta.get("model_family") == "rwkv6":
        from vlut_tpu.models.rwkv import Rwkv6Config

        cfg = Rwkv6Config(**meta["model_config"])
    elif meta.get("model_family") == "hybrid":
        from vlut_tpu.models.hybrid import HybridConfig

        mc = dict(meta["model_config"])
        for k in ("layer_types", "ffn_types"):
            mc[k] = tuple(mc[k])
        cfg = HybridConfig(**mc)
    elif meta.get("model_family") == "gemma3n":
        from vlut_tpu.models.gemma3n import Gemma3nConfig

        mc = dict(meta["model_config"])
        for k in ("d_ff", "layer_types", "sparsity"):
            mc[k] = tuple(mc[k])
        cfg = Gemma3nConfig(**mc)
    else:
        mc = dict(meta["model_config"])
        for k, v in mc.items():
            # JSON round-trips tuples as lists; restore tuple fields
            # (swa_layers/nope_layers/dense_layers/heads_per_layer/...)
            if isinstance(v, list):
                mc[k] = tuple(
                    tuple(e) if isinstance(e, list) else e for e in v
                )
        cfg = ModelConfig(**mc)
    if stream:
        # shard-by-shard streaming load (reference analog: llama-mmap's
        # instant-serve property, src/llama-mmap.cpp): safetensors is
        # opened mmap-backed and each tensor is device_put as it is
        # read, so peak host memory is ONE tensor and the host->device
        # transfers pipeline with the reads instead of following a full
        # host materialization of the checkpoint
        import jax
        from safetensors import safe_open

        flat = {}
        with safe_open(str(path / "model.safetensors"),
                       framework="numpy") as sf:
            for key in sf.keys():
                flat[key] = jax.device_put(sf.get_tensor(key))
    else:
        flat = load_file(str(path / "model.safetensors"))
    params = _unflatten(flat)
    if meta.get("layers_tuple"):
        layers = params["layers"]
        params["layers"] = tuple(
            layers[k] for k in sorted(layers.keys())
        )
    return cfg, params, meta


def load_qwen_vision(path: str | pathlib.Path):
    """Load the optional Qwen2-VL vision tower.  Returns
    (QwenVisionConfig, params, meta-extras) or (None, None, None)."""
    path = pathlib.Path(path)
    meta = json.loads((path / "vlut_config.json").read_text())
    qv = meta.get("qwen_vision_config")
    if not qv or not (path / "qwen_vision.safetensors").exists():
        return None, None, None
    from vlut_tpu.models.qwen_vision import QwenVisionConfig

    flat = load_file(str(path / "qwen_vision.safetensors"))
    layers: dict[str, Any] = {}
    params: dict[str, Any] = {"layers": layers}
    for k, v in flat.items():
        if k.startswith("layers."):
            layers[k[len("layers."):]] = v
        else:
            params[k] = v
    if "fullatt_blocks" in qv:
        qv = {**qv, "fullatt_blocks": tuple(qv["fullatt_blocks"])}
    extras = {
        "image_token_id": meta.get("image_token_id"),
        "vision_start_token_id": meta.get("vision_start_token_id"),
    }
    return QwenVisionConfig(**qv), params, extras


def _load_tower(path: pathlib.Path, fname: str):
    flat = load_file(str(path / fname))
    layers: dict[str, Any] = {}
    params: dict[str, Any] = {"layers": layers}
    for k, v in flat.items():
        if k.startswith("layers."):
            layers[k[len("layers."):]] = v
        else:
            params[k] = v
    return params


def load_siglip(path: str | pathlib.Path):
    """Gemma3 SigLIP tower (+ avg-pool projector weights).  Returns
    (SiglipConfig, params, image_token_id) or (None, None, None)."""
    path = pathlib.Path(path)
    meta = json.loads((path / "vlut_config.json").read_text())
    sc = meta.get("siglip_config")
    if not sc or not (path / "siglip.safetensors").exists():
        return None, None, None
    from vlut_tpu.models.vision_ext import SiglipConfig

    return (SiglipConfig(**sc), _load_tower(path, "siglip.safetensors"),
            meta.get("image_token_id"))


def load_internvl_vision(path: str | pathlib.Path):
    """InternVL ViT tower (+ LN/GELU projector).  Returns
    (InternVLConfig, params, image_token_id) or (None, None, None)."""
    path = pathlib.Path(path)
    meta = json.loads((path / "vlut_config.json").read_text())
    ic = meta.get("internvl_config")
    if not ic or not (path / "internvl.safetensors").exists():
        return None, None, None
    from vlut_tpu.models.vision_wave3 import InternVLConfig

    return (InternVLConfig(**ic), _load_tower(path, "internvl.safetensors"),
            meta.get("image_token_id"))


def load_llama4_vision(path: str | pathlib.Path):
    """Llama4 vision tower (+ pixel-shuffle adapter + projector).
    Returns (Llama4VisionConfig, params, image_token_id) or
    (None, None, None)."""
    path = pathlib.Path(path)
    meta = json.loads((path / "vlut_config.json").read_text())
    lc = meta.get("llama4_vision_config")
    if not lc or not (path / "llama4_vision.safetensors").exists():
        return None, None, None
    from vlut_tpu.models.vision_wave3 import Llama4VisionConfig

    return (Llama4VisionConfig(**lc),
            _load_tower(path, "llama4_vision.safetensors"),
            meta.get("image_token_id"))


def load_idefics3(path: str | pathlib.Path):
    """Idefics3 SigLIP tower (+ pixel-shuffle connector).  Returns
    (SiglipConfig, scale_factor, params, image_token_id) or
    (None, None, None, None); the tower runs through
    vision_ext.siglip_forward."""
    path = pathlib.Path(path)
    meta = json.loads((path / "vlut_config.json").read_text())
    ic = meta.get("idefics3_config")
    if not ic or not (path / "idefics3.safetensors").exists():
        return None, None, None, None
    from vlut_tpu.models.vision_ext import SiglipConfig

    scale = ic.pop("scale_factor", 2)
    return (SiglipConfig(**ic, mm_tokens_per_image=0), scale,
            _load_tower(path, "idefics3.safetensors"),
            meta.get("image_token_id"))


def load_janus_vision(path: str | pathlib.Path):
    """Janus-Pro understanding tower (+ aligner).  Returns
    (SiglipConfig, params, image_token_id) or (None, None, None); the
    tower runs through vision_ext.siglip_forward(act="exact")."""
    path = pathlib.Path(path)
    meta = json.loads((path / "vlut_config.json").read_text())
    jc = meta.get("janus_config")
    if not jc or not (path / "janus.safetensors").exists():
        return None, None, None
    from vlut_tpu.models.vision_ext import SiglipConfig

    return (SiglipConfig(**jc), _load_tower(path, "janus.safetensors"),
            meta.get("image_token_id"))


def load_lfm2vl_vision(path: str | pathlib.Path):
    """LFM2-VL siglip2 tower (+ pixel-unshuffle projector).  Returns
    (SiglipConfig, downsample_factor, params, image_token_id) or
    (None, None, None, None)."""
    path = pathlib.Path(path)
    meta = json.loads((path / "vlut_config.json").read_text())
    lc = meta.get("lfm2vl_config")
    if not lc or not (path / "lfm2vl.safetensors").exists():
        return None, None, None, None
    from vlut_tpu.models.vision_ext import SiglipConfig

    factor = lc.pop("downsample", 2)
    return (SiglipConfig(**lc, mm_tokens_per_image=0), factor,
            _load_tower(path, "lfm2vl.safetensors"),
            meta.get("image_token_id"))


def load_qwen3vl_vision(path: str | pathlib.Path):
    """Qwen3-VL deepstack tower.  Returns (Qwen3VLVisionConfig, params,
    image_token_id) or (None, None, None)."""
    path = pathlib.Path(path)
    meta = json.loads((path / "vlut_config.json").read_text())
    qc = meta.get("qwen3vl_vision_config")
    if not qc or not (path / "qwen3vl_vision.safetensors").exists():
        return None, None, None
    from vlut_tpu.models.vision_wave3 import Qwen3VLVisionConfig

    qc = {**qc, "deepstack_indexes": tuple(qc["deepstack_indexes"])}
    return (Qwen3VLVisionConfig(**qc),
            _load_tower(path, "qwen3vl_vision.safetensors"),
            meta.get("image_token_id"))


def load_glm4v_vision(path: str | pathlib.Path):
    """GLM4-V vision tower (+ downsample + merger).  Returns
    (Glm4vVisionConfig, params, image_token_id) or (None, None, None)."""
    path = pathlib.Path(path)
    meta = json.loads((path / "vlut_config.json").read_text())
    gc = meta.get("glm4v_vision_config")
    if not gc or not (path / "glm4v_vision.safetensors").exists():
        return None, None, None
    from vlut_tpu.models.vision_wave3 import Glm4vVisionConfig

    return (Glm4vVisionConfig(**gc),
            _load_tower(path, "glm4v_vision.safetensors"),
            meta.get("image_token_id"))


def load_pixtral(path: str | pathlib.Path):
    """Pixtral tower (+ llava projector).  Returns
    (PixtralConfig, params, image_token_id) or (None, None, None)."""
    path = pathlib.Path(path)
    meta = json.loads((path / "vlut_config.json").read_text())
    pc = meta.get("pixtral_config")
    if not pc or not (path / "pixtral.safetensors").exists():
        return None, None, None
    from vlut_tpu.models.vision_ext import PixtralConfig

    return (PixtralConfig(**pc), _load_tower(path, "pixtral.safetensors"),
            meta.get("image_token_id"))


def load_vision(path: str | pathlib.Path):
    """Load the optional vision tower (llava-style checkpoints).  Returns
    (VisionConfig, params) or (None, None) when the checkpoint is
    text-only."""
    path = pathlib.Path(path)
    meta = json.loads((path / "vlut_config.json").read_text())
    vcfg = meta.get("vision_config")
    if not vcfg or not (path / "vision.safetensors").exists():
        return None, None
    from vlut_tpu.models.vision import VisionConfig

    flat = load_file(str(path / "vision.safetensors"))
    layers: dict[str, Any] = {}
    params: dict[str, Any] = {"layers": layers}
    for k, v in flat.items():
        if k.startswith("layers."):
            layers[k[len("layers."):]] = jnp.asarray(v, jnp.bfloat16)
        else:
            params[k] = jnp.asarray(v, jnp.bfloat16)
    # norms stay f32 for stable statistics
    for nm in ("ln1_w", "ln1_b", "ln2_w", "ln2_b"):
        layers[nm] = layers[nm].astype(jnp.float32)
    for nm in ("pre_ln_w", "pre_ln_b"):
        params[nm] = params[nm].astype(jnp.float32)
    return VisionConfig(**vcfg), params

"""HF encoder checkpoints (BERT / ModernBERT) -> vlut_tpu encoder format.

Replaces the reference's BertModel / ModernBertModel converter classes
(convert_hf_to_gguf.py @Model.register("BertModel"/"ModernBertModel")) and
the GGUF pooling_type metadata (reference `llama_pooling_type`).  Weights
stay dense (see models/encoder.py docstring).
"""

from __future__ import annotations

import json
import logging
import pathlib
import re
from typing import Any

import numpy as np

from vlut_tpu.convert.checkpoint import save_checkpoint
from vlut_tpu.models.encoder import EncoderConfig

log = logging.getLogger("vlut_tpu.convert.encoder")


def _iter_tensors(hf_dir: pathlib.Path):
    from safetensors import safe_open

    files = sorted(hf_dir.glob("*.safetensors"))
    if not files:
        raise FileNotFoundError(f"no safetensors files in {hf_dir}")
    for f in files:
        with safe_open(str(f), framework="numpy") as sf:
            for name in sf.keys():
                yield name, sf.get_tensor(name)


_BERT_LAYER = {
    "attention.self.query.weight": ("wq", True),
    "attention.self.query.bias": ("bq", False),
    "attention.self.key.weight": ("wk", True),
    "attention.self.key.bias": ("bk", False),
    "attention.self.value.weight": ("wv", True),
    "attention.self.value.bias": ("bv", False),
    "attention.output.dense.weight": ("wo", True),
    "attention.output.dense.bias": ("bo", False),
    "attention.output.LayerNorm.weight": ("attn_norm", False),
    "attention.output.LayerNorm.bias": ("attn_norm_b", False),
    "intermediate.dense.weight": ("w_up", True),
    "intermediate.dense.bias": ("b_up", False),
    "output.dense.weight": ("w_down", True),
    "output.dense.bias": ("b_down", False),
    "output.LayerNorm.weight": ("ffn_norm", False),
    "output.LayerNorm.bias": ("ffn_norm_b", False),
}

_NEOBERT_LAYER = {
    "qkv.weight": ("wqkv", True),
    "wo.weight": ("wo", True),
    "attention_norm.weight": ("attn_norm", False),
    "ffn_norm.weight": ("ffn_norm", False),
    "ffn.w12.weight": ("w_in", True),
    "ffn.w3.weight": ("w_out", True),
}

_MODERNBERT_LAYER = {
    "attn.Wqkv.weight": ("wqkv", True),
    "attn.Wo.weight": ("wo", True),
    "attn_norm.weight": ("attn_norm", False),
    "mlp_norm.weight": ("mlp_norm", False),
    "mlp.Wi.weight": ("w_in", True),
    "mlp.Wo.weight": ("w_out", True),
}


def convert_encoder(
    hf_dir: str | pathlib.Path,
    out_dir: str | pathlib.Path,
    pooling: str | None = None,
    dtype_hp: str = "float32",
) -> EncoderConfig:
    hf_dir = pathlib.Path(hf_dir)
    raw = json.loads((hf_dir / "config.json").read_text())
    mt = raw.get("model_type", "")
    if mt not in ("bert", "modernbert", "neobert"):
        raise ValueError(f"not an encoder checkpoint: model_type={mt!r}")

    if pooling is None:
        # sentence-transformers checkpoints carry a pooling module config
        pooling = "mean"
        pj = hf_dir / "1_Pooling" / "config.json"
        if pj.exists():
            pc = json.loads(pj.read_text())
            if pc.get("pooling_mode_cls_token"):
                pooling = "cls"
        elif mt == "modernbert":
            pooling = raw.get("classifier_pooling", "cls")

    if mt == "bert":
        cfg = EncoderConfig(
            arch="bert",
            vocab_size=raw["vocab_size"],
            d_model=raw["hidden_size"],
            n_layers=raw["num_hidden_layers"],
            n_heads=raw["num_attention_heads"],
            d_ff=raw["intermediate_size"],
            max_seq_len=raw.get("max_position_embeddings", 512),
            ln_eps=raw.get("layer_norm_eps", 1e-12),
            type_vocab_size=raw.get("type_vocab_size", 2),
            pooling=pooling,
        )
        layer_map, prefix = _BERT_LAYER, "encoder.layer."
    elif mt == "neobert":
        # NeoBERT (reference src/models/neo-bert.cpp + tensor_mapping
        # 'transformer_encoder' scheme): RMS pre-norms, fused qkv, rope,
        # swiglu-fused w12/w3 FFN
        cfg = EncoderConfig(
            arch="neobert",
            vocab_size=raw["vocab_size"],
            d_model=raw["hidden_size"],
            n_layers=raw["num_hidden_layers"],
            n_heads=raw["num_attention_heads"],
            d_ff=raw["intermediate_size"],
            max_seq_len=raw.get("max_length",
                                raw.get("max_position_embeddings", 4096)),
            ln_eps=raw.get("norm_eps", 1e-5),
            rope_theta_global=raw.get("rope_theta", 10000.0),
            pooling=pooling,
        )
        layer_map, prefix = _NEOBERT_LAYER, "transformer_encoder."
    else:
        cfg = EncoderConfig(
            arch="modernbert",
            vocab_size=raw["vocab_size"],
            d_model=raw["hidden_size"],
            n_layers=raw["num_hidden_layers"],
            n_heads=raw["num_attention_heads"],
            d_ff=raw["intermediate_size"],
            max_seq_len=raw.get("max_position_embeddings", 8192),
            ln_eps=raw.get("norm_eps", 1e-5),
            local_window=raw.get("local_attention", 128),
            global_every=raw.get("global_attn_every_n_layers", 3),
            rope_theta_global=raw.get("global_rope_theta", 160000.0),
            rope_theta_local=(
                raw.get("local_rope_theta") or
                raw.get("global_rope_theta", 160000.0)
            ),
            pooling=pooling,
        )
        layer_map, prefix = _MODERNBERT_LAYER, "layers."

    top: dict[str, Any] = {}
    per: dict[str, dict[int, np.ndarray]] = {}
    lre = re.compile(rf"{re.escape(prefix)}(\d+)\.(.+)$")
    for name, w in _iter_tensors(hf_dir):
        # strip common wrapper prefixes (BertModel inside *ForMaskedLM etc.)
        for p in ("bert.", "model.", "roberta."):
            if name.startswith(p):
                name = name[len(p):]
        w = np.asarray(w, np.float32)
        if mt == "bert":
            tops = {
                "embeddings.word_embeddings.weight": "embed",
                "embeddings.position_embeddings.weight": "pos_embed",
                "embeddings.token_type_embeddings.weight": "type_embed",
                "embeddings.LayerNorm.weight": "embed_norm",
                "embeddings.LayerNorm.bias": "embed_norm_b",
            }
        elif mt == "neobert":
            tops = {
                "encoder.weight": "embed",
                "layer_norm.weight": "final_norm",
            }
        else:
            tops = {
                "embeddings.tok_embeddings.weight": "embed",
                "embeddings.norm.weight": "embed_norm",
                "final_norm.weight": "final_norm",
            }
        if name in tops:
            top[tops[name]] = w
            continue
        m = lre.match(name)
        if not m:
            if not name.startswith(("pooler.", "cls.", "head.",
                                    "decoder.", "classifier.")):
                log.warning("skipping unrecognized tensor %s", name)
            continue
        li, sub = int(m.group(1)), m.group(2)
        entry = layer_map.get(sub)
        if entry is None:
            log.warning("skipping unrecognized layer tensor %s", name)
            continue
        pname, transpose = entry
        per.setdefault(pname, {})[li] = w.T if transpose else w

    L = cfg.n_layers
    layers: dict[str, np.ndarray] = {}
    for pname, by_layer in per.items():
        missing = [i for i in range(L) if i not in by_layer]
        if missing:
            if pname == "attn_norm" and mt == "modernbert":
                # layer 0's attn_norm is Identity in ModernBERT — store a
                # unit gain so the stacked scan layout stays homogeneous
                # (forward_encoder skips the norm for layer 0 anyway)
                by_layer = dict(by_layer)
                for i in missing:
                    by_layer[i] = np.ones(cfg.d_model, np.float32)
            else:
                raise ValueError(f"missing layers {missing} for {pname}")
        layers[pname] = np.stack([by_layer[i] for i in range(L)])

    params = {**top, "layers": layers}
    save_checkpoint(out_dir, cfg, params, tokenizer_src=hf_dir,
                    extra_meta={"source": str(hf_dir)})
    return cfg

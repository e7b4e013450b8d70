"""Bidirectional text encoders (embedding models): BERT and ModernBERT.

The reference serves encoder-only embedding models through the same
llama_decode path with non-causal attention and a pooling type read from
GGUF metadata (reference: src/models/bert.cpp, src/models/modern-bert.cpp,
`llama_pooling_type`, tools/server `/embedding` + `--embedding`).  Here the
encoder is its own small functional model: a fixed-shape jitted forward
over (tokens, mask) that returns pooled embeddings — serving batches them
like any other request, no KV cache involved.

Three graph families cover the reference's encoder archs:

* ``bert`` — post-LN, learned absolute positions + token-type embeddings,
  biased projections, exact-gelu MLP.
* ``modernbert`` — pre-LN (bias-free LayerNorm), fused qkv, rope with
  per-layer theta, alternating local (bidirectional sliding window) /
  global attention every `global_every` layers, GeGLU MLP.
* ``neobert`` — RMS pre-norms, one fused [q;k;v] projection, rope,
  swiglu-fused (w12/w3) sequential FFN (reference src/models/neo-bert.cpp).
* ``bert-variant`` — the reference's post-LN bert builder superset
  (src/models/bert.cpp): nomic-bert (fused wqkv, full-head rope, swiglu
  parallel FFN), nomic-bert-moe (GELU-seq dense layers + softmax NO-renorm
  GELU up/down MoE on layers ``i % moe_every == 1``), jina-bert-v2 (ALiBi
  max_bias=8, optional q/k LayerNorms, fused GEGLU FFN, all post-LN),
  jina-bert-v3 (XLM-RoBERTa weights served with rope instead of absolute
  positions + per-task LoRA adapters, reference convert XLMRobertaModel).
  Layers are a tuple of dicts (not stacked) — MoE layers are
  heterogeneous, and encoder depths are small enough to unroll.

Weights stay dense (bf16/f32): encoder checkpoints are small and never
ternary in the wild; the ternary path stays the decoder engine's job.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    arch: str                    # "bert" | "modernbert" | "neobert"
    vocab_size: int
    d_model: int
    n_layers: int
    n_heads: int
    d_ff: int
    max_seq_len: int = 512
    ln_eps: float = 1e-12
    pooling: str = "mean"        # "mean" | "cls" | "none"
    type_vocab_size: int = 2     # bert segment embeddings
    # modernbert
    local_window: int = 128      # total bidirectional window (±window/2)
    global_every: int = 3        # layer_id % global_every == 0 -> global
    rope_theta_global: float = 160000.0
    rope_theta_local: float = 10000.0
    normalize: bool = True       # L2-normalize pooled embeddings
    # bert-variant family (src/models/bert.cpp superset)
    rope: bool = False           # nomic / jina-v3: full-head NEOX rope
    alibi: bool = False          # jina-v2: f_max_alibi_bias = 8
    ffn_kind: str = "gelu_seq"   # "swiglu_par" (nomic) | "geglu" (jina-v2)
    moe_every: int = 0           # nomic-moe: MoE on i % moe_every == 1
    n_experts: int = 0
    moe_top_k: int = 2
    lora_alpha: float = 1.0      # jina-v3 task adapters
    lora_tasks: tuple[str, ...] = ()

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads


def _rms(x, w, eps):
    x = x.astype(jnp.float32)
    v = (x * x).mean(-1, keepdims=True)
    return x * jax.lax.rsqrt(v + eps) * w


def _ln(x, w, b, eps):
    x = x.astype(jnp.float32)
    mu = x.mean(-1, keepdims=True)
    xc = x - mu
    v = (xc * xc).mean(-1, keepdims=True)
    out = xc * jax.lax.rsqrt(v + eps) * w
    if b is not None:
        out = out + b
    return out


def _attend(q, k, v, mask_bias):
    """(B, T, H, hd) bidirectional attention with additive mask bias
    (B, 1, T, T) or (1, 1, T, T)."""
    hd = q.shape[-1]
    sc = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32),
                    k.astype(jnp.float32)) * (hd ** -0.5)
    sc = sc + mask_bias
    p = jax.nn.softmax(sc, axis=-1)
    return jnp.einsum("bhts,bshd->bthd", p, v.astype(jnp.float32))


def _rope(x, pos, theta):
    """NEOX split-half rope over the full head dim."""
    hd = x.shape[-1]
    inv = 1.0 / (theta ** (jnp.arange(0, hd, 2, dtype=jnp.float32) / hd))
    ang = pos[..., None].astype(jnp.float32) * inv  # (B, T, hd/2)
    cos, sin = jnp.cos(ang)[:, :, None, :], jnp.sin(ang)[:, :, None, :]
    x1, x2 = x[..., : hd // 2], x[..., hd // 2:]
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], -1)


def _alibi_bias(n_heads: int, T: int):
    """Bidirectional ALiBi: bias[h, i, j] = -slope_h * |i - j| (reference
    llm_graph_input_attn_no_cache fills -|p_i - p_j|, ggml_soft_max_ext
    scales per-head; jina-v2 f_max_alibi_bias = 8)."""
    from vlut_tpu.models.transformer import alibi_slopes

    sl = jnp.asarray(alibi_slopes(n_heads))          # (H,)
    rel = jnp.abs(jnp.arange(T)[:, None] - jnp.arange(T)[None, :])
    return -sl[:, None, None] * rel[None].astype(jnp.float32)  # (H, T, T)


def forward_encoder(
    params: dict[str, Any],
    cfg: EncoderConfig,
    tokens: jax.Array,          # (B, T) int32
    mask: jax.Array,            # (B, T) 1 = real token, 0 = pad
    task: str | None = None,    # jina-v3 LoRA task adapter
) -> jax.Array:
    """Returns token-level hidden states (B, T, D), float32."""
    B, T = tokens.shape
    L = params["layers"]
    pad_bias = jnp.where(mask[:, None, None, :] > 0, 0.0, -1e30)

    if cfg.arch == "bert":
        x = params["embed"][tokens]
        x = x + params["pos_embed"][jnp.arange(T)][None]
        if "type_embed" in params:
            x = x + params["type_embed"][0][None, None]
        x = _ln(x, params["embed_norm"], params.get("embed_norm_b"),
                cfg.ln_eps)
        H, hd = cfg.n_heads, cfg.head_dim

        def layer(x, lp):
            q = (x @ lp["wq"] + lp["bq"]).reshape(B, T, H, hd)
            k = (x @ lp["wk"] + lp["bk"]).reshape(B, T, H, hd)
            v = (x @ lp["wv"] + lp["bv"]).reshape(B, T, H, hd)
            att = _attend(q, k, v, pad_bias).reshape(B, T, -1)
            o = att @ lp["wo"] + lp["bo"]
            x = _ln(x + o, lp["attn_norm"], lp["attn_norm_b"], cfg.ln_eps)
            up = x @ lp["w_up"] + lp["b_up"]
            a = jax.nn.gelu(up.astype(jnp.float32), approximate=False)
            dn = a @ lp["w_down"] + lp["b_down"]
            x = _ln(x + dn, lp["ffn_norm"], lp["ffn_norm_b"], cfg.ln_eps)
            return x, None

        x, _ = jax.lax.scan(layer, x.astype(jnp.float32), L)
        return x

    if cfg.arch in ("nomic-bert", "nomic-bert-moe", "jina-bert-v2",
                    "jina-bert-v3"):
        # the reference's post-LN bert builder superset
        # (src/models/bert.cpp llm_build_bert): token(+type) embeddings,
        # embed LN, per layer: attention (opt fused qkv / q,k LNs / rope /
        # alibi) -> add input -> LN -> FFN (gelu-seq | swiglu-par | geglu |
        # softmax-no-renorm GELU MoE) -> add -> LN
        ad = {}
        if task is not None:
            ad = params.get("adapters", {}).get(task, {})
            if not ad:
                raise KeyError(f"unknown adapter task {task!r}; have "
                               f"{tuple(params.get('adapters', {}))}")

        def w_of(store, key, path):
            w = store[key]
            if path in ad:
                a, bm = ad[path]["a"], ad[path]["b"]
                w = w + (cfg.lora_alpha / a.shape[-1]) * (
                    a.astype(jnp.float32) @ bm.astype(jnp.float32))
            return w

        x = w_of(params, "embed", "embed")[tokens]
        if "type_embed" in params:
            x = x + w_of(params, "type_embed", "type_embed")[0][None, None]
        x = _ln(x, params["embed_norm"], params.get("embed_norm_b"),
                cfg.ln_eps)
        H, hd = cfg.n_heads, cfg.head_dim
        pos = jnp.tile(jnp.arange(T, dtype=jnp.int32)[None], (B, 1))
        bias = pad_bias
        if cfg.alibi:
            bias = bias + _alibi_bias(H, T)[None]
        for li, lp in enumerate(L):
            lw = lambda key: w_of(lp, key, f"layers/{li}/{key}")  # noqa
            inp = x
            if "wqkv" in lp:
                qkv = inp @ lw("wqkv")
                if "bqkv" in lp:
                    qkv = qkv + lp["bqkv"]
                q, k, v = jnp.split(qkv, 3, axis=-1)
            else:
                q = inp @ lw("wq") + lp["bq"]
                k = inp @ lw("wk") + lp["bk"]
                v = inp @ lw("wv") + lp["bv"]
            if "q_norm" in lp:
                # jina-v2 layer_norm_q/k: LayerNorm over the FULL width
                # (reference reshapes to n_embd_head*n_head first)
                q = _ln(q, lp["q_norm"], lp.get("q_norm_b"), cfg.ln_eps)
                k = _ln(k, lp["k_norm"], lp.get("k_norm_b"), cfg.ln_eps)
            q = q.reshape(B, T, H, hd)
            k = k.reshape(B, T, H, hd)
            v = v.reshape(B, T, H, hd)
            if cfg.rope:
                q = _rope(q, pos, cfg.rope_theta_global)
                k = _rope(k, pos, cfg.rope_theta_global)
            att = _attend(q, k, v, bias).reshape(B, T, -1)
            o = att @ lw("wo")
            if "bo" in lp:
                o = o + lp["bo"]
            x = _ln(inp + o, lp["attn_norm"], lp.get("attn_norm_b"),
                    cfg.ln_eps)
            if "attn_norm2" in lp:
                # jina-v2-code attn_norm_2: re-add the layer input again
                x = _ln(x + inp, lp["attn_norm2"], lp.get("attn_norm2_b"),
                        cfg.ln_eps)
            ffn_inp = x
            if "router" in lp:
                # nomic-moe layer: softmax router, top-k, NO renorm
                # (build_moe_ffn norm_w=false), GELU up/down experts
                scores = jax.nn.softmax(
                    (ffn_inp @ lp["router"]).astype(jnp.float32), axis=-1)
                top_w, top_i = jax.lax.top_k(scores, cfg.moe_top_k)
                comb = jnp.zeros_like(scores)
                comb = jax.vmap(
                    lambda c, i, w: c.at[jnp.arange(T)[:, None], i].add(w)
                )(comb, top_i, top_w)
                dn = jnp.zeros(ffn_inp.shape, jnp.float32)
                for e in range(cfg.n_experts):
                    a = jax.nn.gelu(
                        (ffn_inp @ lp["e_up"][e]).astype(jnp.float32),
                        approximate=False)
                    dn = dn + comb[..., e, None] * (a @ lp["e_down"][e])
            elif cfg.ffn_kind == "swiglu_par" and "w_gate" in lp:
                g = jax.nn.silu(
                    (ffn_inp @ lw("w_gate")).astype(jnp.float32))
                dn = (g * (ffn_inp @ lw("w_up"))) @ lw("w_down")
            elif cfg.ffn_kind == "geglu" and "w_in" in lp:
                z = ffn_inp @ lw("w_in")
                if "b_in" in lp:
                    z = z + lp["b_in"]
                ff = z.shape[-1] // 2
                a = jax.nn.gelu(z[..., :ff].astype(jnp.float32),
                                approximate=False)
                dn = (a * z[..., ff:]) @ lw("w_down")
                if "b_down" in lp:
                    dn = dn + lp["b_down"]
            else:
                up = ffn_inp @ lw("w_up")
                if "b_up" in lp:
                    up = up + lp["b_up"]
                a = jax.nn.gelu(up.astype(jnp.float32), approximate=False)
                dn = a @ lw("w_down")
                if "b_down" in lp:
                    dn = dn + lp["b_down"]
            x = _ln(ffn_inp + dn, lp["ffn_norm"], lp.get("ffn_norm_b"),
                    cfg.ln_eps)
        return x

    if cfg.arch == "modernbert":
        x = _ln(params["embed"][tokens], params["embed_norm"], None,
                cfg.ln_eps)
        H, hd = cfg.n_heads, cfg.head_dim
        pos = jnp.tile(jnp.arange(T, dtype=jnp.int32)[None], (B, 1))
        # bidirectional sliding-window bias for the local layers
        rel = jnp.arange(T)[:, None] - jnp.arange(T)[None, :]
        local_ok = jnp.abs(rel) <= cfg.local_window // 2
        local_bias = pad_bias + jnp.where(local_ok, 0.0, -1e30)[None, None]

        x = x.astype(jnp.float32)
        for i in range(cfg.n_layers):
            lp = jax.tree.map(lambda a: a[i], L)
            is_global = i % cfg.global_every == 0
            h = x if i == 0 else _ln(x, lp["attn_norm"], None, cfg.ln_eps)
            qkv = (h @ lp["wqkv"]).reshape(B, T, 3, H, hd)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            theta = (cfg.rope_theta_global if is_global
                     else cfg.rope_theta_local)
            q, k = _rope(q, pos, theta), _rope(k, pos, theta)
            bias = pad_bias if is_global else local_bias
            att = _attend(q, k, v, bias).reshape(B, T, -1)
            x = x + att @ lp["wo"]
            h = _ln(x, lp["mlp_norm"], None, cfg.ln_eps)
            wi = h @ lp["w_in"]
            inp, gate = wi[..., : cfg.d_ff], wi[..., cfg.d_ff:]
            a = jax.nn.gelu(inp.astype(jnp.float32), approximate=False)
            x = x + (a * gate) @ lp["w_out"]
        x = _ln(x, params["final_norm"], None, cfg.ln_eps)
        return x

    if cfg.arch == "neobert":
        # NeoBERT (reference src/models/neo-bert.cpp): RMS pre-norms, one
        # fused [q;k;v] projection, rope, swiglu-fused SEQ FFN (w12 ->
        # silu(half1)*half2 -> w3), final output_norm_enc
        x = params["embed"][tokens].astype(jnp.float32)
        H, hd = cfg.n_heads, cfg.head_dim
        pos = jnp.tile(jnp.arange(T, dtype=jnp.int32)[None], (B, 1))
        qd = H * hd

        def layer(x, lp):
            h = _rms(x, lp["attn_norm"], cfg.ln_eps)
            qkv = h @ lp["wqkv"]
            q = qkv[..., :qd].reshape(B, T, H, hd)
            k = qkv[..., qd : 2 * qd].reshape(B, T, H, hd)
            v = qkv[..., 2 * qd :].reshape(B, T, H, hd)
            q = _rope(q, pos, cfg.rope_theta_global)
            k = _rope(k, pos, cfg.rope_theta_global)
            att = _attend(q, k, v, pad_bias).reshape(B, T, -1)
            x = x + att @ lp["wo"]
            h = _rms(x, lp["ffn_norm"], cfg.ln_eps)
            wi = h @ lp["w_in"]
            gate, up = wi[..., : cfg.d_ff], wi[..., cfg.d_ff :]
            a = jax.nn.silu(gate.astype(jnp.float32)) * up
            x = x + a @ lp["w_out"]
            return x, None

        x, _ = jax.lax.scan(layer, x, params["layers"])
        return _rms(x, params["final_norm"], cfg.ln_eps)

    raise ValueError(f"unknown encoder arch {cfg.arch!r}")


def embed(
    params: dict[str, Any],
    cfg: EncoderConfig,
    tokens: jax.Array,
    mask: jax.Array,
    task: str | None = None,
) -> jax.Array:
    """Pooled (B, D) embeddings (reference llama_pooling_type MEAN/CLS)."""
    x = forward_encoder(params, cfg, tokens, mask, task=task)
    if cfg.pooling == "cls":
        e = x[:, 0]
    else:
        m = mask.astype(jnp.float32)[..., None]
        e = (x * m).sum(1) / jnp.maximum(m.sum(1), 1.0)
    if cfg.normalize:
        e = e / jnp.maximum(
            jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-12
        )
    return e

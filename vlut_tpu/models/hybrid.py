"""Hybrid SSM + attention decoder LMs: Jamba, Falcon-H1, Granite-hybrid.

Reference analogs: src/models/jamba.cpp, src/models/falcon-h1.cpp,
src/models/granite-hybrid.cpp (+ nemotron-h.cpp, the same mamba2/attention
interleave) served through llama-memory-hybrid (attention KV cells + one
recurrent cell per sequence).

Layer topologies covered by one config-driven graph:

* ``jamba`` — per-layer mixer is mamba1 (with extra dt/B/C RMSNorms) or
  attention (NoPE), FFN is dense or MoE (softmax top-k, NO renorm) by the
  period/offset grids.
* ``falcon_h1`` — EVERY layer runs attention and mamba2 in PARALLEL off
  the same pre-norm, summed into the residual; all muP multipliers are
  folded into weights at convert time (see convert/hybrid.py).
* ``granite_hybrid`` — per-layer mamba2 or attention (rope optional —
  granite-4 ships NoPE), FFN = always-on shared GLU (+ optional MoE with
  softmax-over-top-k gating), granite multipliers (attention_multiplier
  as the score scale; residual_multiplier folded into weights).

Weights are dense (bf16/f32): these checkpoints are never ternary in the
wild.  Forward is stateless full-sequence (parity/scoring); a generate
loop with carried conv/ssm state + KV can reuse mamba2_core/_ssm_scan
like ssm.forward2 does.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from vlut_tpu.models.ssm import Mamba2Dims, _ssm_scan, mamba2_core


@dataclasses.dataclass(frozen=True)
class HybridConfig:
    arch: str                    # "jamba" | "falcon_h1" | "granite_hybrid"
    vocab_size: int
    d_model: int
    n_layers: int
    n_heads: int
    n_kv_heads: int
    d_ff: int
    layer_types: tuple[str, ...]  # "attention" | "mamba" | "mamba2" |
    # "parallel" (attention + mamba2 summed, falcon-h1)
    ffn_types: tuple[str, ...]    # "dense" | "moe" | "shared" | "shared_moe"
    head_dim: int | None = None
    rms_eps: float = 1e-5
    rope: bool = True
    rope_theta: float = 10000.0
    attn_scale: float = 0.0       # 0 = 1/sqrt(head_dim)
    # mamba2 dims
    m2_heads: int = 0
    m2_head_dim: int = 64
    m2_groups: int = 1
    m2_state: int = 128
    m2_conv: int = 4
    m2_norm_mode: str = "gated"   # see ssm.Mamba2Dims.norm_mode
    # mamba1 dims (jamba)
    m1_d_inner: int = 0
    m1_state: int = 16
    m1_conv: int = 4
    m1_dt_rank: int = 0
    # gated delta net (qwen3next "linear_attention" layers)
    dn_v_heads: int = 0
    dn_k_heads: int = 0
    dn_k_dim: int = 128
    dn_v_dim: int = 128
    dn_conv: int = 4
    # lfm2 short conv
    conv_l: int = 3
    # nemotron-h dedicated FFN layers (layer kind "ffn": the block body IS
    # the MLP; ffn_types entry "none" skips the per-layer second stage)
    ffn_act: str = "silu"         # "relu2" for nemotron-h
    ffn_gated: bool = True
    # attention extras
    qk_norm: bool = False         # per-head RMSNorm on q/k
    rope_pct: float = 1.0         # partial rope (qwen3next 0.25)
    attn_gate: bool = False       # qwen3next per-head sigmoid output gate
    # MoE
    n_experts: int = 0
    n_experts_used: int = 0
    moe_renorm: bool = True       # False: jamba (softmax-all, no renorm)
    routed_scale: float = 1.0     # expert_weights_scale on the combine
    moe_score: str = "softmax"    # "sigmoid": lfm2moe / nemotron-h-moe
    # (reference build_moe_ffn LLAMA_EXPERT_GATING_FUNC_TYPE_SIGMOID;
    # selection may add lp["e_bias"] — ffn_exp_probs_b — while combine
    # weights stay the raw scores, deepseek-V3 noaux_tc semantics)
    d_ff_shared: int = 0
    # scales kept as graph constants (everything foldable is folded into
    # the weights at convert time)
    embed_scale: float = 0.0
    logit_scale: float = 1.0
    tie_embeddings: bool = False
    max_seq_len: int = 4096

    @property
    def head_dim_(self) -> int:
        return self.head_dim or self.d_model // self.n_heads

    def m2_dims(self) -> Mamba2Dims:
        return Mamba2Dims(
            d_inner=self.m2_heads * self.m2_head_dim,
            n_heads=self.m2_heads, head_dim=self.m2_head_dim,
            n_groups=self.m2_groups, d_state=self.m2_state,
            d_conv=self.m2_conv, rms_eps=self.rms_eps,
            norm_mode=self.m2_norm_mode,
        )


def _rms(x, w, eps):
    xf = x.astype(jnp.float32)
    ss = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return xf * jax.lax.rsqrt(ss + eps) * w


def _rope_tab(t, hd, theta):
    inv = 1.0 / (theta ** (jnp.arange(0, hd, 2, dtype=jnp.float32) / hd))
    ang = jnp.arange(t, dtype=jnp.float32)[:, None] * inv
    return jnp.cos(ang), jnp.sin(ang)


def _apply_rope(x, cos, sin):
    h = x.shape[-1] // 2
    x1, x2 = x[..., :h], x[..., h:]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    return jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], -1)


def _rms_head(x, w, eps):
    xf = x.astype(jnp.float32)
    ss = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return xf * jax.lax.rsqrt(ss + eps) * w


def _rope_partial(x, cos, sin, rot):
    if rot == x.shape[-1]:
        return _apply_rope(x, cos, sin)
    return jnp.concatenate(
        [_apply_rope(x[..., :rot], cos, sin), x[..., rot:]], -1
    )


def _attention(cfg: HybridConfig, lp, h, cos, sin):
    b, t, _ = h.shape
    H, KV, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim_
    gate = None
    if cfg.attn_gate:
        # qwen3next: q_proj emits (q | gate) per head, chunked on the
        # last per-head dim
        qg = (h @ lp["wq"]).reshape(b, t, H, 2 * hd)
        q, gate = qg[..., :hd], qg[..., hd:].reshape(b, t, H * hd)
    else:
        q = (h @ lp["wq"]).reshape(b, t, H, hd)
    k = (h @ lp["wk"]).reshape(b, t, KV, hd)
    v = (h @ lp["wv"]).reshape(b, t, KV, hd)
    if cfg.qk_norm:
        q = _rms_head(q, lp["q_norm"], cfg.rms_eps)
        k = _rms_head(k, lp["k_norm"], cfg.rms_eps)
    if cfg.rope:
        rot = int(hd * cfg.rope_pct) // 2 * 2
        q = _rope_partial(q, cos, sin, rot)
        k = _rope_partial(k, cos, sin, rot)
    rep = H // KV
    k = jnp.repeat(k, rep, axis=2)
    v = jnp.repeat(v, rep, axis=2)
    scale = cfg.attn_scale or hd ** -0.5
    sc = jnp.einsum("bthd,bshd->bhts", q, k) * scale
    causal = jnp.where(
        jnp.arange(t)[None, :] <= jnp.arange(t)[:, None], 0.0, -1e30
    )
    p = jax.nn.softmax(sc + causal[None, None], axis=-1)
    att = jnp.einsum("bhts,bshd->bthd", p, v).reshape(b, t, H * hd)
    if gate is not None:
        att = att * jax.nn.sigmoid(gate)
    return att @ lp["wo"]


def _jamba_mamba(cfg: HybridConfig, lp, h):
    """Jamba's mamba1 mixer: mamba1 + RMSNorms on dt, B, C
    (JambaMambaMixer dt_layernorm/b_layernorm/c_layernorm)."""
    b, t, _ = h.shape
    di, ds, dr, dc = cfg.m1_d_inner, cfg.m1_state, cfg.m1_dt_rank, cfg.m1_conv
    xz = h @ lp["in_proj"]
    xi, z = xz[..., :di], xz[..., di:]
    win = jnp.concatenate([jnp.zeros((b, dc - 1, di), xi.dtype), xi], axis=1)
    taps = [
        win[:, i : i + t] * lp["conv_w"][i][None, None, :]
        for i in range(dc)
    ]
    xc = sum(taps)
    if "conv_b" in lp:
        xc = xc + lp["conv_b"][None, None, :]
    xc = jax.nn.silu(xc)
    proj = xc @ lp["x_proj"]
    dt_in = _rms(proj[..., :dr], lp["dt_norm"], cfg.rms_eps)
    B = _rms(proj[..., dr : dr + ds], lp["b_norm"], cfg.rms_eps)
    C = _rms(proj[..., dr + ds :], lp["c_norm"], cfg.rms_eps)
    dt = jax.nn.softplus(dt_in @ lp["dt_proj_w"] + lp["dt_proj_b"])
    A = -jnp.exp(lp["A_log"].astype(jnp.float32))
    dA = jnp.exp(dt[..., None] * A[None, None])
    dBx = dt[..., None] * B[:, :, None, :] * xc[..., None]
    hs = _ssm_scan(dA, dBx, jnp.zeros((b, di, ds), jnp.float32))
    y = jnp.einsum("btds,bts->btd", hs, C) + lp["D"][None, None, :] * xc
    y = y * jax.nn.silu(z)
    return y @ lp["out_proj"]


def _mamba2(cfg: HybridConfig, lp, h):
    b, t, _ = h.shape
    md = cfg.m2_dims()
    conv_dim = md.d_inner + 2 * md.n_groups * md.d_state
    zxbcdt = (h @ lp["in_proj"]).astype(jnp.float32)
    conv0 = jnp.zeros((b, md.d_conv - 1, conv_dim), jnp.float32)
    ssm0 = jnp.zeros(
        (b, md.n_heads, md.head_dim, md.d_state), jnp.float32
    )
    y, _, _ = mamba2_core(zxbcdt, conv0, ssm0, lp, md)
    return y @ lp["out_proj"]


def _plamo2_mamba(cfg: HybridConfig, lp, h):
    """PLaMo-2 mamba mixer (reference src/models/plamo2.cpp
    build_plamo2_mamba_layer; converter Plamo2Model
    convert_hf_to_gguf.py:4885-4975): per-head [z; x] interleaved in_proj,
    conv+silu over x, bcdt_proj -> [B, C, dt] with PLaMo-specific RMS
    norms on each, dt_proj to one dt per HEAD (mamba2-style scalar-A SSD),
    y = SSD(x) + D*x gated by silu(z).  A is stored as -exp(A_log)
    (folded at convert, like the reference)."""
    b, t, _ = h.shape
    md = cfg.m2_dims()
    M2H, hd, ds, dc = md.n_heads, md.head_dim, md.d_state, md.d_conv
    di = M2H * hd
    zx = (h @ lp["in_proj"]).astype(jnp.float32)      # (b,t,2*di)
    zx = zx.reshape(b, t, M2H, 2 * hd)
    z = zx[..., :hd].reshape(b, t, di)
    x = zx[..., hd:].reshape(b, t, di)
    # depthwise causal conv over x only (plamo2 keeps B/C out of the conv)
    win = jnp.concatenate([jnp.zeros((b, dc - 1, di), x.dtype), x], axis=1)
    xc = sum(
        win[:, i : i + t] * lp["conv_w"][i][None, None, :]
        for i in range(dc)
    )
    if "conv_b" in lp:
        xc = xc + lp["conv_b"][None, None, :]
    xc = jax.nn.silu(xc)
    bcdt = xc @ lp["bcdt_proj"]                        # (b,t,2*ds+dt_dim)
    B = _rms(bcdt[..., :ds], lp["b_norm"], cfg.rms_eps)
    C = _rms(bcdt[..., ds : 2 * ds], lp["c_norm"], cfg.rms_eps)
    dt_in = _rms(bcdt[..., 2 * ds :], lp["dt_norm"], cfg.rms_eps)
    dt = jax.nn.softplus(dt_in @ lp["dt_proj_w"] + lp["dt_proj_b"])
    A = lp["A_log"].astype(jnp.float32)   # already -exp(A_log) (convert)
    # per-head scalar decay broadcast over the head dim
    dA = jnp.exp(dt * A[None, None, :])               # (b,t,M2H)
    dA_bd = jnp.repeat(dA, hd, axis=-1)[..., None]    # (b,t,di,1)
    dt_bd = jnp.repeat(dt, hd, axis=-1)               # (b,t,di)
    dBx = (dt_bd * xc)[..., None] * B[:, :, None, :]  # (b,t,di,ds)
    hs = _ssm_scan(jnp.broadcast_to(dA_bd, dBx.shape), dBx,
                   jnp.zeros((b, di, ds), jnp.float32))
    y = jnp.einsum("btds,bts->btd", hs, C)
    y = y + jnp.repeat(lp["D"].astype(jnp.float32), hd) * xc
    y = jax.nn.silu(z) * y
    return y @ lp["out_proj"]


def _lfm2_conv(cfg: HybridConfig, lp, h):
    """LFM2 gated short conv: in_proj -> (B, C, x); depthwise causal conv
    (NO activation) over B*x; y = C * conv; out_proj."""
    b, t, d = h.shape
    bcx = h @ lp["in_proj"]
    Bg, Cg, xg = bcx[..., :d], bcx[..., d : 2 * d], bcx[..., 2 * d :]
    bx = Bg * xg
    L = cfg.conv_l
    win = jnp.concatenate([jnp.zeros((b, L - 1, d), bx.dtype), bx], axis=1)
    conv = sum(
        win[:, i : i + t] * lp["conv_w"][i][None, None, :] for i in range(L)
    )
    if "conv_b" in lp:
        conv = conv + lp["conv_b"][None, None, :]
    return (Cg * conv) @ lp["out_proj"]


def _l2norm(x, eps=1e-6):
    return x * jax.lax.rsqrt(
        jnp.sum(x * x, axis=-1, keepdims=True) + eps
    )


def _deltanet(cfg: HybridConfig, lp, h):
    """Qwen3Next gated delta rule (torch_recurrent_gated_delta_rule):
    S_t = S_{t-1} * exp(g_t) + k_t (beta_t (v_t - k_t.S_{t-1} exp(g_t)))^T,
    out_t = q_t . S_t, with l2-normed q/k and a norm-then-gate RMSNorm.
    Sequential lax.scan over T (the chunked SSD form is a perf follow-up).
    """
    b, t, _ = h.shape
    Hv, Hk = cfg.dn_v_heads, cfg.dn_k_heads
    dk, dv = cfg.dn_k_dim, cfg.dn_v_dim
    kd, vd = Hk * dk, Hv * dv
    # converter permutes in_proj rows to flat [q | k | v | z] and ba to
    # [b | a] (HF stores them interleaved per k-head group)
    qkvz = h @ lp["in_proj_qkvz"]
    ba = h @ lp["in_proj_ba"]
    z = qkvz[..., 2 * kd + vd :].reshape(b, t, Hv, dv)
    bgate = jax.nn.sigmoid(ba[..., :Hv].astype(jnp.float32))
    a = ba[..., Hv:].astype(jnp.float32)
    g = -jnp.exp(lp["A_log"].astype(jnp.float32)) * jax.nn.softplus(
        a + lp["dt_bias"].astype(jnp.float32)
    )  # (b, t, Hv)

    # depthwise causal conv (silu) over the flat [q | k | v] channels
    qkv = qkvz[..., : 2 * kd + vd]
    L = cfg.dn_conv
    win = jnp.concatenate(
        [jnp.zeros((b, L - 1, qkv.shape[-1]), qkv.dtype), qkv], axis=1
    )
    conv = sum(
        win[:, i : i + t] * lp["conv_w"][i][None, None, :]
        for i in range(L)
    )
    qkv = jax.nn.silu(conv)
    q = qkv[..., :kd].reshape(b, t, Hk, dk)
    k = qkv[..., kd : 2 * kd].reshape(b, t, Hk, dk)
    v = qkv[..., 2 * kd :].reshape(b, t, Hv, dv).astype(jnp.float32)
    rep = Hv // Hk
    q = jnp.repeat(q, rep, axis=2)
    k = jnp.repeat(k, rep, axis=2)
    q = _l2norm(q.astype(jnp.float32)) * dk ** -0.5
    k = _l2norm(k.astype(jnp.float32))

    def step(S, xs):
        q_t, k_t, v_t, g_t, b_t = xs  # (b,Hv,dk) (b,Hv,dv) (b,Hv)
        S = S * jnp.exp(g_t)[..., None, None]
        kv = jnp.einsum("bhkv,bhk->bhv", S, k_t)
        delta = (v_t - kv) * b_t[..., None]
        S = S + k_t[..., :, None] * delta[..., None, :]
        out = jnp.einsum("bhkv,bhk->bhv", S, q_t)
        return S, out

    xs = tuple(
        jnp.moveaxis(u, 1, 0)
        for u in (q, k, v, g, bgate)
    )
    S0 = jnp.zeros((b, Hv, dk, dv), jnp.float32)
    _, outs = jax.lax.scan(step, S0, xs)
    core = jnp.moveaxis(outs, 0, 1)  # (b, t, Hv, dv)
    # norm-then-gate RMSNorm per v-head (Qwen3NextRMSNormGated)
    cf = core * jax.lax.rsqrt(
        jnp.mean(core * core, axis=-1, keepdims=True) + cfg.rms_eps
    )
    core = cf * lp["norm_w"].astype(jnp.float32) * jax.nn.silu(
        z.astype(jnp.float32)
    )
    return core.reshape(b, t, vd) @ lp["out_proj"]


def _glu(h, w_in, w_out, ff):
    """Granite fused GLU: input_linear -> chunk2 -> silu(a)*b -> out."""
    z = h @ w_in
    return (jax.nn.silu(z[..., :ff]) * z[..., ff:]) @ w_out


def _ffn(cfg: HybridConfig, lp, h, kind):
    if kind == "dense":
        g = h @ lp["w_gate"]
        u = h @ lp["w_up"]
        return (jax.nn.silu(g) * u) @ lp["w_down"]
    if kind == "moe_qwen":
        # qwen3next sparse block: softmax -> top-k -> renorm routed
        # experts + a sigmoid-gated shared expert (qwen2-moe style)
        logits = (h @ lp["router"]).astype(jnp.float32)
        scores = jax.nn.softmax(logits, axis=-1)
        top_w, top_i = jax.lax.top_k(scores, cfg.n_experts_used)
        if cfg.moe_renorm:
            top_w = top_w / (top_w.sum(-1, keepdims=True) + 1e-20)
        comb = jnp.zeros_like(logits)
        t = h.shape[1]
        comb = jax.vmap(
            lambda c, i, w: c.at[jnp.arange(t)[:, None], i].add(w)
        )(comb, top_i, top_w)

        def q_expert(acc, exs):
            g_, u_, d_, w_e = exs
            out_e = (jax.nn.silu(h @ g_) * (h @ u_)) @ d_
            return acc + w_e[..., None] * out_e, None

        moe_out, _ = jax.lax.scan(
            q_expert, jnp.zeros(h.shape, jnp.float32),
            (lp["e_gate"], lp["e_up"], lp["e_down"],
             jnp.moveaxis(comb, -1, 0)),
        )
        sh = (jax.nn.silu(h @ lp["w_shared_gate"])
              * (h @ lp["w_shared_up"])) @ lp["w_shared_down"]
        g_sh = jax.nn.sigmoid(
            (h @ lp["shared_gate"]).astype(jnp.float32)
        )
        return moe_out + sh * g_sh
    out = 0.0
    if kind in ("shared", "shared_moe"):
        out = _glu(h, lp["w_shared_in"], lp["w_shared_out"],
                   cfg.d_ff_shared or cfg.d_ff)
    if kind in ("moe", "shared_moe"):
        logits = (h @ lp["router"]).astype(jnp.float32)
        if cfg.moe_score == "sigmoid":
            scores = jax.nn.sigmoid(logits)
        else:
            scores = jax.nn.softmax(logits, axis=-1)
        if "e_bias" in lp:
            # selection-only bias (ffn_exp_probs_b): top-k on
            # scores+bias, combine weights from the raw scores
            _, top_i = jax.lax.top_k(
                scores + lp["e_bias"].astype(jnp.float32),
                cfg.n_experts_used,
            )
            top_w = jnp.take_along_axis(scores, top_i, axis=-1)
        else:
            top_w, top_i = jax.lax.top_k(scores, cfg.n_experts_used)
        if cfg.moe_renorm:
            top_w = top_w / (top_w.sum(-1, keepdims=True) + 1e-20)
        comb = jnp.zeros_like(logits)
        t = h.shape[1]
        comb = jax.vmap(
            lambda c, i, w: c.at[jnp.arange(t)[:, None], i].add(w)
        )(comb, top_i, top_w)

        def expert_step(acc, exs):
            if "e_in" in lp:  # granite fused stacks
                ein, eout, w_e = exs
                out_e = _glu(h, ein, eout, cfg.d_ff)
            else:             # jamba per-expert gate/up/down
                g_, u_, d_, w_e = exs
                out_e = (jax.nn.silu(h @ g_) * (h @ u_)) @ d_
            return acc + w_e[..., None] * out_e, None

        comb_e = jnp.moveaxis(comb, -1, 0)
        if "e_in" in lp:
            exs = (lp["e_in"], lp["e_out"], comb_e)
        else:
            exs = (lp["e_gate"], lp["e_up"], lp["e_down"], comb_e)
        moe_out, _ = jax.lax.scan(
            expert_step, jnp.zeros(h.shape, jnp.float32), exs
        )
        out = out + moe_out
    return out


def forward(
    params: dict[str, Any],
    cfg: HybridConfig,
    tokens: jax.Array,           # (B, T)
) -> jax.Array:
    """Full-sequence logits (B, T, V), float32."""
    x = params["embed"][tokens].astype(jnp.float32)
    if cfg.embed_scale:
        x = x * cfg.embed_scale
    t = tokens.shape[1]
    rot = int(cfg.head_dim_ * cfg.rope_pct) // 2 * 2
    cos, sin = _rope_tab(t, rot, cfg.rope_theta)
    for i, lp in enumerate(params["layers"]):
        kind = cfg.layer_types[i]
        h = _rms(x, lp["attn_norm"], cfg.rms_eps)
        if kind == "parallel":
            mix = _attention(cfg, lp, h, cos, sin) + _mamba2(cfg, lp, h)
        elif kind == "attention":
            mix = _attention(cfg, lp, h, cos, sin)
        elif kind == "mamba2":
            mix = _mamba2(cfg, lp, h)
        elif kind == "deltanet":
            mix = _deltanet(cfg, lp, h)
        elif kind == "plamo2_mamba":
            mix = _plamo2_mamba(cfg, lp, h)
        elif kind == "conv":
            mix = _lfm2_conv(cfg, lp, h)
        elif kind == "ffn" and "router" in lp:
            # nemotron-h-moe E block (src/models/nemotron-h.cpp
            # build_ffn_layer:118-145): sigmoid router + selection-only
            # e_score_correction bias, renormalize per expert_weights_norm,
            # scale by expert_weights_scale; ungated relu^2 experts plus a
            # parallel ungated relu^2 shared expert, summed
            relu2 = lambda z: jnp.square(jax.nn.relu(z))  # noqa: E731
            scores = jax.nn.sigmoid(
                (h @ lp["router"]).astype(jnp.float32))
            sel = (scores + lp["e_bias"].astype(jnp.float32)
                   if "e_bias" in lp else scores)
            _, top_i = jax.lax.top_k(sel, cfg.n_experts_used)
            top_w = jnp.take_along_axis(scores, top_i, axis=-1)
            if cfg.moe_renorm:
                top_w = top_w / (top_w.sum(-1, keepdims=True) + 1e-20)
            top_w = top_w * cfg.routed_scale
            comb = jnp.zeros_like(scores)
            t_ = h.shape[1]
            comb = jax.vmap(
                lambda c, ii, w_: c.at[jnp.arange(t_)[:, None], ii].add(w_)
            )(comb, top_i, top_w)

            def nemo_expert(acc, exs):
                u_, d_, w_e = exs
                return acc + w_e[..., None] * (relu2(h @ u_) @ d_), None

            mix, _ = jax.lax.scan(
                nemo_expert, jnp.zeros(h.shape, jnp.float32),
                (lp["e_up"], lp["e_down"], jnp.moveaxis(comb, -1, 0)),
            )
            mix = mix + relu2(h @ lp["w_shared_up"]) @ lp["w_shared_down"]
        elif kind == "ffn":
            # nemotron-h MLP block: norm + (gated or plain) MLP + residual
            if cfg.ffn_gated:
                mix = (jax.nn.silu(h @ lp["w_gate"])
                       * (h @ lp["w_up"])) @ lp["w_down"]
            else:
                act = {"relu2": lambda z: jnp.square(jax.nn.relu(z)),
                       "silu": jax.nn.silu}[cfg.ffn_act]
                up = h @ lp["w_up"]
                if "b_up" in lp:
                    up = up + lp["b_up"]
                mix = act(up) @ lp["w_down"]
                if "b_down" in lp:
                    mix = mix + lp["b_down"]
        else:
            mix = _jamba_mamba(cfg, lp, h)
        if "post_mixer_norm" in lp:
            # plamo2 sandwich norms (post_mixer_norm, offset folded at
            # convert like the reference Plamo2Model +1/5)
            mix = _rms(mix, lp["post_mixer_norm"], cfg.rms_eps)
        x = x + mix
        if cfg.ffn_types[i] != "none":
            h = _rms(x, lp["ffn_norm"], cfg.rms_eps)
            fo = _ffn(cfg, lp, h, cfg.ffn_types[i])
            if "post_ffn_norm" in lp:
                fo = _rms(fo, lp["post_ffn_norm"], cfg.rms_eps)
            x = x + fo
    x = _rms(x, params["final_norm"], cfg.rms_eps)
    head = params.get("lm_head")
    if head is None:
        head = params["embed"].T.astype(jnp.float32)
    logits = x @ head
    if cfg.logit_scale != 1.0:
        logits = logits * cfg.logit_scale
    return logits

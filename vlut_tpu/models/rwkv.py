"""RWKV7 ("Goose") — attention-free RNN LM.

Reference analogs: src/models/rwkv7.cpp + rwkv7-base.cpp (graph),
ggml_rwkv_wkv7 (ggml/src/ggml-cpu/ops.cpp ggml_compute_forward_rwkv_wkv7_f32
— the recurrence spec), gguf-py tensor_mapping rwkv7 rows (HF names).

Per layer (token-shift states carry the PREVIOUS token's normed input):
  x -> LN1 -> time_mix -> +residual -> LN2 -> channel_mix -> +residual

Time mix (head_size hs, H = D/hs heads):
  sx   = x_prev - x
  x_b  = x + sx * lerp_b          for b in {r, w, k, v, a, g}
  r    = x_r @ Wr
  w    = exp(-0.606531 * sigmoid(w0 + tanh(x_w @ w1) @ w2))
  k    = x_k @ Wk ;  v = x_v @ Wv
  v    = v + (v_first - v) * sigmoid(v0 + (x_v @ v1) @ v2)   [layers > 0]
  g    = sigmoid(x_g @ g1) @ g2                              [optional]
  a    = sigmoid(a0 + (x_a @ a1) @ a2)    # in-context learning rate
  kk   = l2norm_per_head(k * k_k)
  k    = k * (1 + (a - 1) * k_a)
  wkv7 recurrence per head over S (hs_v x hs_k), with A = -kk, B = kk*a:
      sa_i = sum_j A_j S[i,j]
      S    = S * w_j + v_i k_j + sa_i B_j
      out_i = sum_j S[i,j] r_j
  out  = groupnorm_per_head(out, eps 64e-5) * ln_x_w + ln_x_b
  out += v * sum_j(k_j r_j r_k[h,j])      # bonus term
  out  = (out * g) @ Wo

Channel mix: k = relu(x + (x_prev - x) * x_k_lerp @ Wk)^2 @ Wv.

Weights stay dense (RWKV checkpoints are never ternary); the sequential
recurrence runs as one lax.scan over T — state is O(H*hs^2) per layer, the
recurrent analog of the KV cache (llama-memory-recurrent).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Rwkv7Config:
    vocab_size: int
    d_model: int
    n_layers: int
    head_size: int = 64
    d_ff: int = 0               # channel-mix width (default 4*d)
    ln_eps: float = 1e-5
    has_gate: bool = True
    arch: str = "rwkv7"         # "rwkv7" | "arwkv7" (RMS norms, no
    # embedding pre-LN, SwiGLU FFN instead of channel mix, single
    # token-shift — reference src/models/arwkv7.cpp)
    max_seq_len: int = 1 << 20  # RWKV is not context-limited
    tie_embeddings: bool = False

    @property
    def n_heads(self) -> int:
        return self.d_model // self.head_size

    @property
    def d_ff_(self) -> int:
        return self.d_ff or 4 * self.d_model


def _ln(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    xc = xf - mu
    v = (xc * xc).mean(-1, keepdims=True)
    return xc * jax.lax.rsqrt(v + eps) * w + b


def _norm(cfg, x, w, b, eps):
    if cfg.arch == "arwkv7":
        xf = x.astype(jnp.float32)
        v = (xf * xf).mean(-1, keepdims=True)
        return xf * jax.lax.rsqrt(v + eps) * w
    return _ln(x, w, b, eps)


def init_state(cfg: Rwkv7Config, batch: int) -> dict[str, jax.Array]:
    L, D, H, hs = cfg.n_layers, cfg.d_model, cfg.n_heads, cfg.head_size
    return {
        "shift_att": jnp.zeros((L, batch, D), jnp.float32),
        "shift_ffn": jnp.zeros((L, batch, D), jnp.float32),
        "wkv": jnp.zeros((L, batch, H, hs, hs), jnp.float32),
    }


def _wkv7_scan(r, w, k, v, a_in, b_in, S0):
    """(B, T, H, hs) inputs -> (out (B, T, H, hs), final state).

    Mirrors ggml_compute_forward_rwkv_wkv7_f32: S[i,j] (i = v dim, j = k
    dim); the decay/keys index j, the value/output index i."""
    xs = tuple(jnp.moveaxis(u, 1, 0) for u in (r, w, k, v, a_in, b_in))

    def step(S, x):
        r_t, w_t, k_t, v_t, a_t, b_t = x  # (B, H, hs)
        sa = jnp.einsum("bhij,bhj->bhi", S, a_t)
        S = (S * w_t[..., None, :]
             + v_t[..., :, None] * k_t[..., None, :]
             + sa[..., :, None] * b_t[..., None, :])
        out = jnp.einsum("bhij,bhj->bhi", S, r_t)
        return S, out

    S, outs = jax.lax.scan(step, S0, xs)
    return jnp.moveaxis(outs, 0, 1), S


def _time_mix(cfg: Rwkv7Config, lp, x, x_prev, wkv0, v_first):
    b, t, D = x.shape
    H, hs = cfg.n_heads, cfg.head_size
    xf = x.astype(jnp.float32)
    sx = x_prev - xf
    def mix(name):
        return xf + sx * lp["lerp_" + name]

    r = mix("r") @ lp["wr"]
    w = jnp.exp(-0.606531 * jax.nn.sigmoid(
        lp["w0"] + jnp.tanh(mix("w") @ lp["w1"]) @ lp["w2"]
    ))
    k = mix("k") @ lp["wk"]
    v = mix("v") @ lp["wv"]
    new_vf = v if v_first is None else v_first
    if v_first is not None:
        v = v + (v_first - v) * jax.nn.sigmoid(
            lp["v0"] + (mix("v") @ lp["v1"]) @ lp["v2"]
        )
    g = None
    if cfg.has_gate:
        g = jax.nn.sigmoid(mix("g") @ lp["g1"]) @ lp["g2"]
    a = jax.nn.sigmoid(lp["a0"] + (mix("a") @ lp["a1"]) @ lp["a2"])

    kk = (k * lp["k_k"]).reshape(b, t, H, hs)
    kk = kk * jax.lax.rsqrt(
        jnp.sum(kk * kk, -1, keepdims=True) + 1e-12
    )
    k = k * (1.0 + (a - 1.0) * lp["k_a"])

    rh = r.reshape(b, t, H, hs)
    wh = w.reshape(b, t, H, hs)
    kh = k.reshape(b, t, H, hs)
    vh = v.reshape(b, t, H, hs)
    ah = a.reshape(b, t, H, hs)
    out, S = _wkv7_scan(rh, wh, kh, vh, -kk, kk * ah, wkv0)

    # per-head group norm, eps 64e-5 (ggml_norm over head_size)
    mu = out.mean(-1, keepdims=True)
    oc = out - mu
    var = (oc * oc).mean(-1, keepdims=True)
    out = (oc * jax.lax.rsqrt(var + 64e-5)).reshape(b, t, D)
    out = out * lp["ln_x_w"] + lp["ln_x_b"]

    rk = jnp.sum(
        kh * rh * lp["r_k"].reshape(1, 1, H, hs), -1, keepdims=True
    )
    out = out + (vh * rk).reshape(b, t, D)
    if g is not None:
        out = out * g
    return out @ lp["wo"], S, new_vf


def forward(
    params: dict[str, Any],
    cfg: Rwkv7Config,
    tokens: jax.Array,              # (B, T)
    state: dict[str, jax.Array] | None = None,
) -> tuple[jax.Array, dict[str, jax.Array] | None]:
    b, t = tokens.shape
    carry = state is not None
    st = state or init_state(cfg, b)
    x = params["embed"][tokens].astype(jnp.float32)
    if cfg.arch == "rwkv7":
        x = _ln(x, params["pre_ln_w"], params["pre_ln_b"], cfg.ln_eps)

    new_sa, new_sf, new_wkv = [], [], []
    v_first = None
    for i in range(cfg.n_layers):
        lp = jax.tree.map(lambda a: a[i], params["layers"])
        h = _norm(cfg, x, lp["ln1_w"], lp.get("ln1_b"), cfg.ln_eps)
        x_prev = jnp.concatenate(
            [st["shift_att"][i][:, None], h[:, :-1]], axis=1
        )
        new_sa.append(h[:, -1])
        mix, S, v_first = _time_mix(
            cfg, lp, h, x_prev, st["wkv"][i], v_first
        )
        new_wkv.append(S)
        x = x + mix
        h = _norm(cfg, x, lp["ln2_w"], lp.get("ln2_b"), cfg.ln_eps)
        if cfg.arch == "arwkv7":
            # qwen-style gated SwiGLU FFN, no second token shift
            new_sf.append(h[:, -1])
            gate = h @ lp["w_gate"]
            up = h @ lp["w_up"]
            x = x + (jax.nn.silu(gate) * up) @ lp["w_down"]
        else:
            x_prev = jnp.concatenate(
                [st["shift_ffn"][i][:, None], h[:, :-1]], axis=1
            )
            new_sf.append(h[:, -1])
            xk = h.astype(jnp.float32) + (
                x_prev - h.astype(jnp.float32)
            ) * lp["cm_lerp_k"]
            ck = jnp.square(jax.nn.relu(xk @ lp["cm_key"]))
            x = x + ck @ lp["cm_value"]

    x = _norm(cfg, x, params["final_norm"], params.get("final_norm_b"),
              cfg.ln_eps)
    head = params.get("lm_head")
    if head is None:
        head = params["embed"].T.astype(jnp.float32)
    logits = x @ head
    new_state = None
    if carry:
        new_state = {
            "shift_att": jnp.stack(new_sa),
            "shift_ffn": jnp.stack(new_sf),
            "wkv": jnp.stack(new_wkv),
        }
    return logits, new_state


# --- RWKV6 -------------------------------------------------------------------
#
# Reference: src/models/rwkv6.cpp + rwkv6-base.cpp (graph),
# ggml_compute_forward_rwkv_wkv6_f32 and ggml_compute_forward_gla_f32
# (kernels).  rwkv6qwen2 ("qrwkv") = the same time mix inside a qwen2 body:
# no time_first bonus, sigmoid gate, GQA k/v repeat, k *= (1-w), gated
# linear attention with a 1/sqrt(hs) scale, no group norm.


@dataclasses.dataclass(frozen=True)
class Rwkv6Config:
    vocab_size: int
    d_model: int
    n_layers: int
    head_size: int = 64
    d_ff: int = 0
    ln_eps: float = 1e-5
    arch: str = "rwkv6"          # "rwkv6" | "rwkv6qwen2"
    n_kv_heads: int = 0          # qrwkv GQA (0 = all heads)
    proj_bias: bool = False      # qrwkv r/k/v biases
    max_seq_len: int = 1 << 20
    tie_embeddings: bool = False

    @property
    def n_heads(self) -> int:
        return self.d_model // self.head_size


def init_state6(cfg: Rwkv6Config, batch: int) -> dict[str, jax.Array]:
    L, D, H, hs = cfg.n_layers, cfg.d_model, cfg.n_heads, cfg.head_size
    return {
        "shift_att": jnp.zeros((L, batch, D), jnp.float32),
        "shift_ffn": jnp.zeros((L, batch, D), jnp.float32),
        "wkv": jnp.zeros((L, batch, H, hs, hs), jnp.float32),
    }


def _wkv6_scan(r, w, k, v, u, S0):
    """wkv6: out_j = sum_i r_i (S[i,j] + u_i k_i v_j); S = w_i S + k_i v_j
    (state row i = key dim, col j = value dim — the reference kernel's
    layout).  u is per (H, hs)."""
    xs = tuple(jnp.moveaxis(x, 1, 0) for x in (r, w, k, v))

    def step(S, x):
        r_t, w_t, k_t, v_t = x  # (B, H, hs)
        kv = k_t[..., :, None] * v_t[..., None, :]       # (B, H, i, j)
        out = jnp.einsum(
            "bhij,bhi->bhj", S + u[None, :, :, None] * kv, r_t
        )
        S = S * w_t[..., :, None] + kv
        return S, out

    S, outs = jax.lax.scan(step, S0, xs)
    return jnp.moveaxis(outs, 0, 1), S


def _gla_scan(q, g, k, v, S0, scale):
    """gated linear attention (qrwkv6): S = g_i S + k_i v_j, out uses the
    UPDATED state: out_j = sum_i scale q_i S[i,j]."""
    xs = tuple(jnp.moveaxis(x, 1, 0) for x in (q, g, k, v))

    def step(S, x):
        q_t, g_t, k_t, v_t = x
        S = S * g_t[..., :, None] + k_t[..., :, None] * v_t[..., None, :]
        out = jnp.einsum("bhij,bhi->bhj", S, q_t * scale)
        return S, out

    S, outs = jax.lax.scan(step, S0, xs)
    return jnp.moveaxis(outs, 0, 1), S


def _time_mix6(cfg: Rwkv6Config, lp, x, x_prev, wkv0):
    b, t, D = x.shape
    H, hs = cfg.n_heads, cfg.head_size
    qr = cfg.arch == "rwkv6qwen2"
    xf = x.astype(jnp.float32)
    sx = x_prev - xf
    # ddlerp: 5 data-dependent deltas from one tanh bottleneck
    xxx = xf + sx * lp["maa_x"]
    m = jnp.tanh(xxx @ lp["maa_w1"]).reshape(b, t, 5, -1)
    m = jnp.einsum("btfr,frd->btfd", m, lp["maa_w2"])  # (B, T, 5, D)
    names = ("w", "k", "v", "r", "g")
    xs = {
        nm: xf + sx * (m[:, :, i] + lp["maa_" + nm])
        for i, nm in enumerate(names)
    }
    r = xs["r"] @ lp["wr"]
    k = xs["k"] @ lp["wk"]
    v = xs["v"] @ lp["wv"]
    if cfg.proj_bias:
        r = r + lp["br"]
        k = k + lp["bk"]
        v = v + lp["bv"]
    g = xs["g"] @ lp["wg"]
    g = jax.nn.sigmoid(g) if qr else jax.nn.silu(g)
    if cfg.n_kv_heads and cfg.n_kv_heads != H:
        rep = H // cfg.n_kv_heads
        k = jnp.repeat(k.reshape(b, t, cfg.n_kv_heads, hs), rep, axis=2)
        v = jnp.repeat(v.reshape(b, t, cfg.n_kv_heads, hs), rep, axis=2)
        k = k.reshape(b, t, D)
        v = v.reshape(b, t, D)
    w = jnp.exp(-jnp.exp(
        lp["decay"] + jnp.tanh(xs["w"] @ lp["td_w1"]) @ lp["td_w2"]
    ))
    if qr:
        k = k * (1.0 - w)
    rh, wh = r.reshape(b, t, H, hs), w.reshape(b, t, H, hs)
    kh, vh = k.reshape(b, t, H, hs), v.reshape(b, t, H, hs)
    if qr:
        out, S = _gla_scan(rh, wh, kh, vh, wkv0, hs ** -0.5)
    else:
        out, S = _wkv6_scan(rh, wh, kh, vh,
                            lp["u"].reshape(H, hs), wkv0)
    out = out.reshape(b, t, H, hs)
    if not qr:
        mu = out.mean(-1, keepdims=True)
        oc = out - mu
        var = (oc * oc).mean(-1, keepdims=True)
        out = oc * jax.lax.rsqrt(var + 64e-5)
        out = out.reshape(b, t, D) * lp["ln_x_w"] + lp["ln_x_b"]
    else:
        out = out.reshape(b, t, D)
    return (out * g) @ lp["wo"], S


def forward6(
    params: dict[str, Any],
    cfg: Rwkv6Config,
    tokens: jax.Array,
    state: dict[str, jax.Array] | None = None,
) -> tuple[jax.Array, dict[str, jax.Array] | None]:
    b, t = tokens.shape
    carry = state is not None
    st = state or init_state6(cfg, b)
    qr = cfg.arch == "rwkv6qwen2"
    x = params["embed"][tokens].astype(jnp.float32)
    if not qr:
        x = _ln(x, params["pre_ln_w"], params["pre_ln_b"], cfg.ln_eps)

    def norm(z, w_, b_):
        if qr:
            v_ = (z * z).mean(-1, keepdims=True)
            return z * jax.lax.rsqrt(v_ + cfg.ln_eps) * w_
        return _ln(z, w_, b_, cfg.ln_eps)

    new_sa, new_sf, new_wkv = [], [], []
    for i in range(cfg.n_layers):
        lp = jax.tree.map(lambda a: a[i], params["layers"])
        h = norm(x, lp["ln1_w"], lp.get("ln1_b"))
        x_prev = jnp.concatenate(
            [st["shift_att"][i][:, None], h[:, :-1]], axis=1
        )
        new_sa.append(h[:, -1])
        mix, S = _time_mix6(cfg, lp, h, x_prev, st["wkv"][i])
        new_wkv.append(S)
        x = x + mix
        h = norm(x, lp["ln2_w"], lp.get("ln2_b"))
        new_sf.append(h[:, -1])
        if qr:
            gate = h @ lp["w_gate"]
            up = h @ lp["w_up"]
            x = x + (jax.nn.silu(gate) * up) @ lp["w_down"]
        else:
            x_prev = jnp.concatenate(
                [st["shift_ffn"][i][:, None], h[:, :-1]], axis=1
            )
            xk = h + (x_prev - h) * lp["cm_lerp_k"]
            xr = h + (x_prev - h) * lp["cm_lerp_r"]
            rr = jax.nn.sigmoid(xr @ lp["cm_receptance"])
            ck = jnp.square(jax.nn.relu(xk @ lp["cm_key"]))
            x = x + rr * (ck @ lp["cm_value"])

    x = norm(x, params["final_norm"], params.get("final_norm_b"))
    head = params.get("lm_head")
    if head is None:
        head = params["embed"].T.astype(jnp.float32)
    logits = x @ head
    new_state = None
    if carry:
        new_state = {
            "shift_att": jnp.stack(new_sa),
            "shift_ffn": jnp.stack(new_sf),
            "wkv": jnp.stack(new_wkv),
        }
    return logits, new_state

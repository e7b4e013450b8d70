"""Mamba-style selective SSM models (reference: recurrent memory family —
src/llama-memory-recurrent.*, src/models mamba graphs; SURVEY §2.2 "KV
cache / memory" row).

TPU-first re-design: the selective-scan recurrence
    h_t = exp(dt_t A) h_{t-1} + dt_t B_t x_t,      y_t = C_t . h_t + D x_t
is linear in h, so prefill runs as one `jax.lax.associative_scan` over T
(log-depth on the VPU, no sequential loop), while decode is a single-step
state update — the recurrent analog of prefill vs KV-cached attention.
Recurrent state per sequence is a fixed-shape pytree
{"conv": (B, d_conv-1, d_inner), "ssm": (B, d_inner, d_state)} — the
recurrent equivalent of KV slots (llama_memory_recurrent keeps one cell per
sequence for exactly this reason).

Projections (in/out) are packed ternary like the transformer's (BitNet-style
absmean at convert time); the small SSM-specific tensors (A_log, D, dt_proj,
x_proj, conv kernel) stay float, mirroring the reference's quantizer policy
of keeping 1-D/small tensors high-precision.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from vlut_tpu.config import ModelConfig
from vlut_tpu.ops.matmul import ternary_matmul
from vlut_tpu.ops.packing import TernaryTensor, pack_ternary


@dataclasses.dataclass(frozen=True)
class MambaConfig:
    vocab_size: int
    d_model: int
    n_layers: int
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    dt_rank: int | None = None
    rms_eps: float = 1e-5
    weight_fmt: str = "i2"
    max_seq_len: int = 2048
    tie_embeddings: bool = True

    @property
    def d_inner(self) -> int:
        return self.expand * self.d_model

    @property
    def dt_rank_(self) -> int:
        return self.dt_rank or -(-self.d_model // 16)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pack(trits: np.ndarray, scale) -> dict[str, Any]:
    t = pack_ternary(trits, scale, "i2")
    return {"packed": np.asarray(t.packed), "scale": np.asarray(t.scale)}


def _tt(w: dict[str, Any], k: int, n: int) -> TernaryTensor:
    return TernaryTensor(
        packed=w["packed"], scale=w["scale"], k=k, n=n, fmt="i2",
        kb=pack_ternary(np.zeros((4, 1), np.int8), 1.0, "i2").kb,
    )


def init_params(cfg: MambaConfig, seed: int = 0, dtype=jnp.bfloat16):
    rng = np.random.default_rng(seed)
    di, ds, dr = cfg.d_inner, cfg.d_state, cfg.dt_rank_

    def tern(k, n):
        packed, scales = [], []
        for _ in range(cfg.n_layers):
            tr = rng.integers(-1, 2, size=(k, n), dtype=np.int8)
            t = _pack(tr, np.float32(0.05))
            packed.append(t["packed"])
            scales.append(t["scale"])
        return {
            "packed": jnp.asarray(np.stack(packed)),
            "scale": jnp.asarray(np.stack(scales)),
        }

    L = cfg.n_layers
    layers = {
        "in_proj": tern(cfg.d_model, 2 * di),     # -> [x, z]
        "out_proj": tern(di, cfg.d_model),
        "norm": jnp.ones((L, cfg.d_model), jnp.float32),
        "conv_w": jnp.asarray(
            rng.standard_normal((L, cfg.d_conv, di)) * 0.2, jnp.float32
        ),
        "conv_b": jnp.zeros((L, di), jnp.float32),
        "x_proj": jnp.asarray(
            rng.standard_normal((L, di, dr + 2 * ds)) * 0.05, jnp.float32
        ),
        "dt_proj_w": jnp.asarray(
            rng.standard_normal((L, dr, di)) * 0.1, jnp.float32
        ),
        "dt_proj_b": jnp.asarray(
            np.log(np.expm1(rng.uniform(1e-3, 0.1, (L, di)))), jnp.float32
        ),
        "A_log": jnp.asarray(
            np.log(np.tile(np.arange(1, ds + 1, dtype=np.float32),
                           (L, di, 1))), jnp.float32
        ),
        "D": jnp.ones((L, di), jnp.float32),
    }
    params = {
        "embed": jnp.asarray(
            rng.standard_normal((cfg.vocab_size, cfg.d_model)) * 0.02, dtype
        ),
        "final_norm": jnp.ones((cfg.d_model,), jnp.float32),
        "layers": layers,
    }
    return params


def init_state(cfg: MambaConfig, batch: int) -> dict[str, jax.Array]:
    """Per-sequence recurrent state (the recurrent 'KV cache')."""
    return {
        "conv": jnp.zeros(
            (cfg.n_layers, batch, cfg.d_conv - 1, cfg.d_inner), jnp.float32
        ),
        "ssm": jnp.zeros(
            (cfg.n_layers, batch, cfg.d_inner, cfg.d_state), jnp.float32
        ),
    }


def _rms(x, w, eps):
    xf = x.astype(jnp.float32)
    ss = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(ss + eps) * w).astype(x.dtype)


def _ssm_scan(dA, dBx, h0):
    """Associative scan of h_t = dA_t * h_{t-1} + dBx_t over axis 1 (T).

    dA, dBx: (B, T, d_inner, d_state); h0: (B, d_inner, d_state)."""
    # fold h0 into the first step
    dBx = dBx.at[:, 0].add(dA[:, 0] * h0)

    def combine(a, b):
        a1, a2 = a
        b1, b2 = b
        return a1 * b1, b1 * a2 + b2

    _, hs = jax.lax.associative_scan(combine, (dA, dBx), axis=1)
    return hs  # (B, T, d_inner, d_state)


def _mamba_mix(lp, cfg: MambaConfig, x, conv_state, ssm_state, valid=None):
    """One mamba mixer over (B, T, d) with incoming recurrent state;
    returns (y, new_conv_state, new_ssm_state).

    ``valid`` (B, T) bool marks real tokens for LEFT-padded batches (the
    recurrent batching convention — reference llama_memory_recurrent also
    refuses interior gaps): invalid steps contribute nothing to the conv
    window or the SSM state, so a left-padded row ends in exactly the
    state of its unpadded prefill."""
    b, t, _ = x.shape
    di, ds, dr = cfg.d_inner, cfg.d_state, cfg.dt_rank_

    xz = ternary_matmul(x, _tt(lp["in_proj"], cfg.d_model, 2 * di))
    xi, z = xz[..., :di].astype(jnp.float32), xz[..., di:].astype(jnp.float32)
    if valid is not None:
        xi = jnp.where(valid[..., None], xi, 0.0)

    # causal depthwise conv over T with carried window
    win = jnp.concatenate([conv_state, xi], axis=1)  # (B, dc-1+T, di)
    new_conv = win[:, -(cfg.d_conv - 1):]
    taps = [
        win[:, i : i + t] * lp["conv_w"][i][None, None, :]
        for i in range(cfg.d_conv)
    ]
    xc = jax.nn.silu(sum(taps) + lp["conv_b"][None, None, :])
    if valid is not None:
        # conv bias makes xc nonzero even on zeroed inputs; the SSM input
        # at padded steps must be exactly 0 (identity recurrence from h=0)
        xc = jnp.where(valid[..., None], xc, 0.0)

    proj = jnp.einsum("btd,dk->btk", xc, lp["x_proj"])
    dt = jax.nn.softplus(
        jnp.einsum("btr,rd->btd", proj[..., :dr], lp["dt_proj_w"])
        + lp["dt_proj_b"][None, None, :]
    )  # (B, T, di)
    B = proj[..., dr : dr + ds]  # (B, T, ds)
    C = proj[..., dr + ds :]  # (B, T, ds)

    A = -jnp.exp(lp["A_log"])  # (di, ds)
    dA = jnp.exp(dt[..., None] * A[None, None])  # (B, T, di, ds)
    dBx = dt[..., None] * B[:, :, None, :] * xc[..., None]
    hs = _ssm_scan(dA, dBx, ssm_state)
    y = jnp.einsum("btds,bts->btd", hs, C) + lp["D"][None, None, :] * xc
    y = y * jax.nn.silu(z)
    out = ternary_matmul(
        y.astype(x.dtype), _tt(lp["out_proj"], di, cfg.d_model)
    )
    return out, new_conv, hs[:, -1]


def forward(
    params: dict[str, Any],
    cfg: MambaConfig,
    tokens: jax.Array,  # (B, T)
    state: dict[str, jax.Array] | None = None,
    logits_last_only: bool = False,
    valid: jax.Array | None = None,  # (B, T) bool, LEFT-padded batches
) -> tuple[jax.Array, dict[str, jax.Array] | None]:
    """Returns (logits, new_state).  state=None runs stateless from zeros
    (still returns None); passing a state carries the recurrence across
    calls (prefill -> decode steps)."""
    b, t = tokens.shape
    x = params["embed"][tokens]
    carry_state = state is not None
    st = state or init_state(cfg, b)

    def layer_step(x, xs):
        lp, conv_s, ssm_s = xs
        h = _rms(x, lp["norm"], cfg.rms_eps)
        y, new_conv, new_ssm = _mamba_mix(
            lp, cfg, h, conv_s, ssm_s, valid=valid
        )
        return x + y.astype(x.dtype), (new_conv, new_ssm)

    x, (new_conv, new_ssm) = jax.lax.scan(
        layer_step, x, (params["layers"], st["conv"], st["ssm"])
    )
    x = _rms(x, params["final_norm"], cfg.rms_eps)
    if logits_last_only:
        x = x[:, -1:]
    head = params.get("lm_head")
    if head is None:
        head = params["embed"].T
    logits = jnp.dot(
        x.astype(jnp.float32), head.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    new_state = (
        {"conv": new_conv, "ssm": new_ssm} if carry_state else None
    )
    return logits, new_state


# --- Mamba2 (SSD) ----------------------------------------------------------
#
# Mamba2 replaces mamba1's per-channel (d_inner, d_state) A matrix with one
# SCALAR decay per head (multi-head state (H, head_dim, d_state)), fuses
# x/B/C into one conv, and applies a gated RMSNorm before out_proj
# (reference: the mamba2-based hybrid graphs — src/models/{jamba,falcon-h1,
# granite-hybrid,nemotron-h}.cpp all build this mixer).  Same TPU design as
# mamba1: prefill = log-depth associative scan, decode = one state update.


@dataclasses.dataclass(frozen=True)
class Mamba2Dims:
    d_inner: int
    n_heads: int
    head_dim: int
    n_groups: int
    d_state: int
    d_conv: int
    rms_eps: float = 1e-5
    # "gated": norm(y * silu(z)) (mamba2/granite); "norm_first": norm(y) *
    # silu(z) (falcon-h1 mamba_norm_before_gate); "gate_only": y * silu(z)
    # with no norm weight (falcon-h1 mamba_rms_norm=False)
    norm_mode: str = "gated"
    time_limit: tuple[float, float] = (0.0, float("inf"))


def mamba2_core(
    zxbcdt: jax.Array,           # (B, T, d_inner + conv_dim + n_heads)
    conv_state: jax.Array,       # (B, d_conv-1, conv_dim)
    ssm_state: jax.Array,        # (B, n_heads, head_dim, d_state)
    lp: dict[str, Any],          # conv_w (dc, conv_dim), conv_b, dt_bias,
                                 # A_log, D (n_heads,), norm_w (d_inner,)?
    md: Mamba2Dims,
    valid: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """SSD mixer given the in_proj output; returns (y pre-out_proj,
    new_conv_state, new_ssm_state).  Matmul-agnostic so ternary (standalone
    mamba2) and dense (hybrid archs) callers share the math."""
    b, t, _ = zxbcdt.shape
    di, H, hd = md.d_inner, md.n_heads, md.head_dim
    G, N, dc = md.n_groups, md.d_state, md.d_conv
    conv_dim = di + 2 * G * N
    z = zxbcdt[..., :di].astype(jnp.float32)
    xbc = zxbcdt[..., di : di + conv_dim].astype(jnp.float32)
    dt = zxbcdt[..., di + conv_dim :].astype(jnp.float32)  # (B, T, H)
    if valid is not None:
        xbc = jnp.where(valid[..., None], xbc, 0.0)

    win = jnp.concatenate([conv_state.astype(jnp.float32), xbc], axis=1)
    new_conv = win[:, -(dc - 1):]
    taps = [
        win[:, i : i + t] * lp["conv_w"][i][None, None, :]
        for i in range(dc)
    ]
    xbc = sum(taps)
    if "conv_b" in lp:
        xbc = xbc + lp["conv_b"][None, None, :]
    xbc = jax.nn.silu(xbc)
    if valid is not None:
        xbc = jnp.where(valid[..., None], xbc, 0.0)

    x = xbc[..., :di].reshape(b, t, H, hd)
    B = xbc[..., di : di + G * N].reshape(b, t, G, N)
    C = xbc[..., di + G * N :].reshape(b, t, G, N)
    rep = H // G
    B = jnp.repeat(B, rep, axis=2)   # (B, T, H, N)
    C = jnp.repeat(C, rep, axis=2)

    dt = jax.nn.softplus(dt + lp["dt_bias"][None, None, :])
    lo, hi = md.time_limit
    if lo > 0.0 or hi != float("inf"):
        dt = jnp.clip(dt, lo, hi)
    if valid is not None:
        # padded steps must be identity recurrences: exp(dt*A) -> 1 needs
        # dt = 0 there (softplus(bias) != 0)
        dt = jnp.where(valid[..., None], dt, 0.0)
    A = -jnp.exp(lp["A_log"].astype(jnp.float32))        # (H,)
    dA = jnp.exp(dt * A[None, None, :])                  # (B, T, H) scalar
    dBx = (dt[..., None] * B)[..., None, :] * x[..., None]  # (B,T,H,hd,N)

    # fold the incoming state into step 0, then scalar-decay scan
    dBx = dBx.at[:, 0].add(dA[:, 0][..., None, None] * ssm_state)

    def combine(a, b_):
        a1, a2 = a
        b1, b2 = b_
        return a1 * b1, b1[..., None, None] * a2 + b2

    _, hs = jax.lax.associative_scan(combine, (dA, dBx), axis=1)
    y = jnp.einsum("bthdn,bthn->bthd", hs, C)
    y = y + lp["D"].astype(jnp.float32)[None, None, :, None] * x
    y = y.reshape(b, t, di)
    if md.norm_mode == "gated":
        # MambaRMSNormGated: gate BEFORE the norm
        y = y * jax.nn.silu(z)
        yf = y * jax.lax.rsqrt(
            jnp.mean(y * y, axis=-1, keepdims=True) + md.rms_eps
        )
        y = yf * lp["norm_w"].astype(jnp.float32)
    elif md.norm_mode == "norm_first":
        yf = y * jax.lax.rsqrt(
            jnp.mean(y * y, axis=-1, keepdims=True) + md.rms_eps
        )
        y = yf * lp["norm_w"].astype(jnp.float32) * jax.nn.silu(z)
    else:  # "gate_only"
        y = y * jax.nn.silu(z)
    return y, new_conv, hs[:, -1]


@dataclasses.dataclass(frozen=True)
class Mamba2Config:
    vocab_size: int
    d_model: int
    n_layers: int
    n_heads: int
    head_dim: int = 64
    d_state: int = 128
    d_conv: int = 4
    expand: int = 2
    n_groups: int = 1
    rms_eps: float = 1e-5
    weight_fmt: str = "i2"
    max_seq_len: int = 2048
    tie_embeddings: bool = False
    time_limit: tuple[float, float] = (0.0, float("inf"))

    @property
    def d_inner(self) -> int:
        return self.n_heads * self.head_dim

    @property
    def conv_dim(self) -> int:
        return self.d_inner + 2 * self.n_groups * self.d_state

    def dims(self) -> Mamba2Dims:
        return Mamba2Dims(
            d_inner=self.d_inner, n_heads=self.n_heads,
            head_dim=self.head_dim, n_groups=self.n_groups,
            d_state=self.d_state, d_conv=self.d_conv,
            rms_eps=self.rms_eps, time_limit=tuple(self.time_limit),
        )


def init_state2(cfg: Mamba2Config, batch: int) -> dict[str, jax.Array]:
    return {
        "conv": jnp.zeros(
            (cfg.n_layers, batch, cfg.d_conv - 1, cfg.conv_dim), jnp.float32
        ),
        "ssm": jnp.zeros(
            (cfg.n_layers, batch, cfg.n_heads, cfg.head_dim, cfg.d_state),
            jnp.float32,
        ),
    }


def forward2(
    params: dict[str, Any],
    cfg: Mamba2Config,
    tokens: jax.Array,
    state: dict[str, jax.Array] | None = None,
    logits_last_only: bool = False,
    valid: jax.Array | None = None,
    impl: str = "auto",
) -> tuple[jax.Array, dict[str, jax.Array] | None]:
    """Standalone Mamba2 LM forward (codestral-mamba-style checkpoints).
    impl="dequant" is the no-activation-quant lossless lane (parity
    tests), as in ops.matmul.ternary_matmul."""
    b, t = tokens.shape
    x = params["embed"][tokens]
    carry_state = state is not None
    st = state or init_state2(cfg, b)
    md = cfg.dims()
    proj_in = cfg.d_inner + cfg.conv_dim + cfg.n_heads

    def layer_step(x, xs):
        lp, conv_s, ssm_s = xs
        h = _rms(x, lp["norm"], cfg.rms_eps)
        zxbcdt = ternary_matmul(
            h, _tt(lp["in_proj"], cfg.d_model, proj_in), impl=impl
        )
        y, new_conv, new_ssm = mamba2_core(
            zxbcdt, conv_s, ssm_s, lp, md, valid=valid
        )
        out = ternary_matmul(
            y.astype(x.dtype), _tt(lp["out_proj"], cfg.d_inner, cfg.d_model),
            impl=impl,
        )
        return x + out.astype(x.dtype), (new_conv, new_ssm)

    x, (new_conv, new_ssm) = jax.lax.scan(
        layer_step, x, (params["layers"], st["conv"], st["ssm"])
    )
    x = _rms(x, params["final_norm"], cfg.rms_eps)
    if logits_last_only:
        x = x[:, -1:]
    head = params.get("lm_head")
    if head is None:
        head = params["embed"].T
    logits = jnp.dot(
        x.astype(jnp.float32), head.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    new_state = (
        {"conv": new_conv, "ssm": new_ssm} if carry_state else None
    )
    return logits, new_state


def make_generate_fn(cfg: MambaConfig, n_steps: int):
    """Jitted greedy generation: prefill once, then n_steps single-token
    recurrent updates (no KV, O(1) state per token)."""

    @jax.jit
    def generate(params, tokens):
        b, t = tokens.shape
        state = init_state(cfg, b)
        logits, state = forward(
            params, cfg, tokens, state, logits_last_only=True
        )
        last = jnp.argmax(
            logits[:, 0, : cfg.vocab_size], -1
        ).astype(jnp.int32)

        def step(carry, _):
            tok, state = carry
            lg, state = forward(params, cfg, tok[:, None], state)
            nxt = jnp.argmax(
                lg[:, 0, : cfg.vocab_size], -1
            ).astype(jnp.int32)
            return (nxt, state), nxt

        (_, state), toks = jax.lax.scan(
            step, (last, state), None, length=n_steps - 1
        )
        return jnp.concatenate([last[:, None], toks.T], axis=1)

    return generate

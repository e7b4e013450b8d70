"""Sampler chain: jit-friendly logits processors + categorical draw.

TPU re-design of the reference's sampler chain (src/llama-sampling.cpp,
llama_sampler_chain): instead of per-token C callbacks mutating a candidate
array, each processor is a pure (B, V) -> (B, V) logits transform with
*per-row* parameters, so one jitted call samples every slot in the batch with
its own settings (a "disabled" parameter value makes the transform identity,
keeping shapes static).

Coverage vs the reference's 24 llama_sampler_init_* constructors
(include/llama.h:1222+):
  greedy, dist (per-row seeds), temp, temp_ext (dynamic/entropy temperature),
  top_k, top_p, min_p, typical, xtc, top_n_sigma, mirostat v2,
  penalties (repeat/presence/frequency), dry, logit_bias.
Grammar lives in vlut_tpu/runtime/grammar.py (host-side mask producer whose
output feeds the ``allowed_mask`` argument here); infill's EOG handling is in
the server layer (vocab-dependent).  mirostat v1 is subsumed by v2 (the
reference docs mark v1 legacy).

Chain order matches common/sampling.cpp defaults:
  logit_bias -> penalties -> dry -> top_n_sigma -> top_k -> typical ->
  top_p -> min_p -> xtc -> temp/temp_ext -> draw
with mirostat v2 replacing the truncation chain when enabled
(temp -> mirostat truncate -> draw -> mu update).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

NEG_INF = -1e30


@dataclasses.dataclass(frozen=True)
class SamplerParams:
    """Per-sequence sampling settings (host side; vectorized on device).

    Defaults mirror common/sampling defaults in spirit: temp<=0 => greedy,
    top_k<=0 => off, top_p>=1 => off, min_p<=0 => off, penalty 1.0 => off,
    typical_p>=1 => off, xtc_p<=0 => off, top_n_sigma<=0 => off,
    mirostat_tau<=0 => off, dry_multiplier<=0 => off.
    """

    temperature: float = 1.0
    top_k: int = 0
    top_p: float = 1.0
    min_p: float = 0.0
    typical_p: float = 1.0
    # dynamic temperature (llama_sampler_init_temp_ext): if dynatemp_range>0,
    # temperature is modulated in [t-range, t+range] by normalized entropy^exp
    dynatemp_range: float = 0.0
    dynatemp_exponent: float = 1.0
    # XTC (exclude top choices)
    xtc_p: float = 0.0
    xtc_t: float = 0.1
    # top-n-sigma: keep logits >= max - n*std; <=0 off
    top_n_sigma: float = 0.0
    # mirostat v2: tau>0 enables; replaces truncation chain
    mirostat_tau: float = 0.0
    mirostat_eta: float = 0.1
    repeat_penalty: float = 1.0
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    penalty_last_n: int = 64
    # DRY (don't-repeat-yourself) sequence-repetition penalty
    dry_multiplier: float = 0.0
    dry_base: float = 1.75
    dry_allowed_length: int = 2
    # sparse per-token logit biases [(token_id, bias), ...]
    logit_bias: tuple[tuple[int, float], ...] = ()
    seed: int = 0


MAX_LOGIT_BIAS = 16  # static per-row capacity for (token, bias) pairs


def stack_params(params: list[SamplerParams]) -> dict[str, jax.Array]:
    """Stack per-slot SamplerParams into device vectors."""
    as_f = lambda f: jnp.asarray([getattr(p, f) for p in params], jnp.float32)
    as_i = lambda f: jnp.asarray([getattr(p, f) for p in params], jnp.int32)
    import numpy as np

    bt = np.full((len(params), MAX_LOGIT_BIAS), -1, np.int32)
    bv = np.zeros((len(params), MAX_LOGIT_BIAS), np.float32)
    for i, p in enumerate(params):
        for j, (t, b) in enumerate(p.logit_bias[:MAX_LOGIT_BIAS]):
            bt[i, j] = t
            bv[i, j] = b
    return {
        "temperature": as_f("temperature"),
        "top_k": as_i("top_k"),
        "top_p": as_f("top_p"),
        "min_p": as_f("min_p"),
        "typical_p": as_f("typical_p"),
        "dynatemp_range": as_f("dynatemp_range"),
        "dynatemp_exponent": as_f("dynatemp_exponent"),
        "xtc_p": as_f("xtc_p"),
        "xtc_t": as_f("xtc_t"),
        "top_n_sigma": as_f("top_n_sigma"),
        "mirostat_tau": as_f("mirostat_tau"),
        "mirostat_eta": as_f("mirostat_eta"),
        "repeat_penalty": as_f("repeat_penalty"),
        "presence_penalty": as_f("presence_penalty"),
        "frequency_penalty": as_f("frequency_penalty"),
        "penalty_last_n": as_i("penalty_last_n"),
        "dry_multiplier": as_f("dry_multiplier"),
        "dry_base": as_f("dry_base"),
        "dry_allowed_length": as_i("dry_allowed_length"),
        "bias_tok": jnp.asarray(bt),
        "bias_val": jnp.asarray(bv),
        "seed": as_i("seed"),
    }


def init_state(n_rows: int) -> dict[str, jax.Array]:
    """Per-row mutable sampler state carried across steps (mirostat mu)."""
    return {"mu": jnp.zeros((n_rows,), jnp.float32)}


def apply_logit_bias(logits: jax.Array, p: dict[str, jax.Array]) -> jax.Array:
    """Sparse per-token additive biases (llama_sampler_init_logit_bias)."""
    b, v = logits.shape
    tok = p["bias_tok"]
    val = jnp.where(tok >= 0, p["bias_val"], 0.0)
    safe = jnp.where(tok >= 0, tok, v)  # park disabled entries OOB
    return (
        jnp.concatenate([logits, jnp.zeros((b, 1), logits.dtype)], axis=-1)
        .at[jnp.arange(b)[:, None], safe]
        .add(val)[:, :v]
    )


def apply_penalties(
    logits: jax.Array,  # (B, V)
    recent_tokens: jax.Array,  # (B, P) int32, -1 for empty
    recent_valid: jax.Array,  # (B, P) bool
    p: dict[str, jax.Array],
) -> jax.Array:
    """repeat/presence/frequency penalties over the last-n window.

    Matches llama_sampler_init_penalties semantics: logits of tokens present
    in the window are divided by repeat_penalty (sign-aware), then shifted by
    presence and count*frequency penalties.
    """
    b, v = logits.shape
    tok = jnp.where(recent_valid, recent_tokens, v)  # map invalid to OOB row
    counts = jax.vmap(
        lambda t: jnp.zeros(v + 1, jnp.float32).at[t].add(1.0)
    )(tok)[:, :v]
    present = counts > 0

    rp = p["repeat_penalty"][:, None]
    scaled = jnp.where(
        logits > 0, logits / rp, logits * rp
    )
    out = jnp.where(present & (rp != 1.0), scaled, logits)
    out = out - present * p["presence_penalty"][:, None]
    out = out - counts * p["frequency_penalty"][:, None]
    return out


def apply_dry(
    logits: jax.Array,  # (B, V)
    recent_tokens: jax.Array,  # (B, P) context window, oldest first
    recent_valid: jax.Array,  # (B, P) bool
    p: dict[str, jax.Array],
    breakers: jax.Array | None = None,  # (K,) int32 sequence-breaker ids
) -> jax.Array:
    """DRY sequence-repetition penalty (llama_sampler_init_dry semantics).

    For each candidate token z that would extend a repeat — i.e. the context
    ends with a sequence of length m that already occurred earlier immediately
    followed by z — subtract multiplier * base^(m - allowed_length) when
    m >= allowed_length.  Computed dense over the (B, P) window: match[j, t]
    says ctx[j-t] == ctx[last-t]; m_j = run length of matches; the penalized
    token is ctx[j+1].  O(P^2) elements, trivial on TPU for P<=256.
    """
    b, pw = recent_tokens.shape
    v = logits.shape[-1]
    ctx = jnp.where(recent_valid, recent_tokens, -1)
    if breakers is not None:
        is_break = (ctx[:, :, None] == breakers[None, None, :]).any(-1)
        # positions at/before the latest breaker can't participate in a match
        ctx = jnp.where(is_break, -(2 + jnp.arange(pw))[None, :], ctx)

    last = ctx[:, -1:]  # suffix anchored at the final context token
    # match[b, j, t]: ctx[j - t] == ctx[P-1 - t], for t in [0, T)
    t_max = pw - 1
    tt = jnp.arange(t_max)
    jj = jnp.arange(pw)
    src_j = jj[None, :, None] - tt[None, None, :]  # (1, P, T)
    src_last = (pw - 1) - tt  # (T,)
    gather_j = jnp.take_along_axis(
        ctx[:, None, :].repeat(pw, 1),
        jnp.clip(src_j, 0, pw - 1).repeat(b, 0),
        axis=-1,
    )  # (B, P, T)
    gather_l = ctx[:, src_last]  # (B, T)
    eq = (gather_j == gather_l[:, None, :]) & (src_j >= 0)[0][None]
    eq = eq & (gather_j >= 0) & (gather_l >= 0)[:, None, :]
    # m_j = longest prefix of True along t
    run = jnp.cumprod(eq.astype(jnp.int32), axis=-1).sum(-1)  # (B, P)
    # candidate continuation token is ctx[j+1]; only j <= P-3 can repeat
    # (j = P-1 is the anchor itself; ctx[j+1] must exist)
    cand = jnp.concatenate(
        [ctx[:, 1:], jnp.full((b, 1), -1, ctx.dtype)], axis=-1
    )
    valid_j = (jnp.arange(pw) < pw - 2)[None, :] & (cand >= 0) & (run > 0)
    m = jnp.where(valid_j, run, 0)
    # max repeat length per candidate token: scatter-max into (B, V)
    safe_cand = jnp.where(valid_j, cand, v)
    mlen = (
        jnp.zeros((b, v + 1), jnp.int32)
        .at[jnp.arange(b)[:, None], safe_cand]
        .max(m)[:, :v]
    )
    allowed = p["dry_allowed_length"][:, None]
    mult = p["dry_multiplier"][:, None]
    base = p["dry_base"][:, None]
    pen = mult * jnp.power(
        base, jnp.maximum(mlen - allowed, 0).astype(jnp.float32)
    )
    hit = (mlen >= allowed) & (mult > 0)
    return jnp.where(hit, logits - pen, logits)


def apply_top_k(logits: jax.Array, top_k: jax.Array) -> jax.Array:
    """Per-row top-k mask; top_k<=0 disables. O(V log V) via sort (XLA)."""
    v = logits.shape[-1]
    sorted_desc = jnp.sort(logits, axis=-1)[:, ::-1]
    k = jnp.clip(top_k, 1, v)
    kth = jnp.take_along_axis(sorted_desc, (k - 1)[:, None], axis=-1)
    mask = logits >= kth
    mask = jnp.where((top_k <= 0)[:, None], True, mask)
    return jnp.where(mask, logits, NEG_INF)


def apply_top_p(logits: jax.Array, top_p: jax.Array) -> jax.Array:
    """Nucleus sampling; top_p>=1 disables.  Keeps at least one token."""
    order = jnp.argsort(-logits, axis=-1)
    sorted_logits = jnp.take_along_axis(logits, order, axis=-1)
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep_sorted = (cum - probs) < top_p[:, None]  # keep while mass below p
    keep = jnp.zeros_like(keep_sorted).at[
        jnp.arange(logits.shape[0])[:, None], order
    ].set(keep_sorted)
    keep = keep | (logits >= logits.max(axis=-1, keepdims=True))
    disabled = (top_p >= 1.0)[:, None]
    return jnp.where(disabled | keep, logits, NEG_INF)


def apply_min_p(logits: jax.Array, min_p: jax.Array) -> jax.Array:
    """Drop tokens with prob < min_p * max_prob; min_p<=0 disables."""
    probs = jax.nn.softmax(logits, axis=-1)
    thresh = probs.max(axis=-1, keepdims=True) * min_p[:, None]
    keep = probs >= thresh
    disabled = (min_p <= 0.0)[:, None]
    return jnp.where(disabled | keep, logits, NEG_INF)


def apply_typical(logits: jax.Array, typical_p: jax.Array) -> jax.Array:
    """Locally typical sampling (llama_sampler_init_typical): rank tokens by
    |surprise - entropy| ascending, keep the smallest-deviation set whose
    cumulative probability reaches typical_p.  >=1 disables."""
    probs = jax.nn.softmax(logits, axis=-1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ent = -(probs * jnp.where(probs > 0, logp, 0.0)).sum(-1, keepdims=True)
    shifted = jnp.abs(-logp - ent)
    order = jnp.argsort(shifted, axis=-1)  # ascending deviation
    p_sorted = jnp.take_along_axis(probs, order, axis=-1)
    cum = jnp.cumsum(p_sorted, axis=-1)
    keep_sorted = (cum - p_sorted) < typical_p[:, None]
    keep_sorted = keep_sorted.at[:, 0].set(True)
    keep = jnp.zeros_like(keep_sorted).at[
        jnp.arange(logits.shape[0])[:, None], order
    ].set(keep_sorted)
    disabled = (typical_p >= 1.0)[:, None]
    return jnp.where(disabled | keep, logits, NEG_INF)


def apply_top_n_sigma(logits: jax.Array, n_sigma: jax.Array) -> jax.Array:
    """Keep logits >= max - n*std over currently-valid candidates; <=0 off
    (llama_sampler_init_top_n_sigma)."""
    valid = logits > NEG_INF / 2
    cnt = jnp.maximum(valid.sum(-1, keepdims=True), 1)
    mean = jnp.where(valid, logits, 0.0).sum(-1, keepdims=True) / cnt
    var = (
        jnp.where(valid, (logits - mean) ** 2, 0.0).sum(-1, keepdims=True)
        / cnt
    )
    std = jnp.sqrt(var)
    keep = logits >= logits.max(-1, keepdims=True) - n_sigma[:, None] * std
    disabled = (n_sigma <= 0.0)[:, None]
    return jnp.where(disabled | keep, logits, NEG_INF)


def apply_xtc(
    logits: jax.Array, xtc_p: jax.Array, xtc_t: jax.Array, key: jax.Array
) -> jax.Array:
    """XTC (exclude top choices, llama_sampler_init_xtc): with probability p,
    if >=2 tokens have prob >= threshold, remove all of them EXCEPT the least
    probable qualifying one."""
    b = logits.shape[0]
    probs = jax.nn.softmax(logits, axis=-1)
    qual = probs >= xtc_t[:, None]
    n_qual = qual.sum(-1, keepdims=True)
    # least-probable qualifying token: min prob among qualifying
    minq = jnp.where(qual, probs, jnp.inf).min(-1, keepdims=True)
    remove = qual & (probs > minq) & (n_qual >= 2)
    roll = jax.random.uniform(key, (b, 1))
    fire = (roll < xtc_p[:, None]) & (xtc_t[:, None] <= 0.5)
    return jnp.where(fire & remove, NEG_INF, logits)


def apply_temperature(
    logits: jax.Array, p: dict[str, jax.Array]
) -> jax.Array:
    """Static or dynamic-entropy temperature (temp / temp_ext).

    dynatemp_range > 0 => dyntemp = max(0, t-r) + (t+r - max(0,t-r)) *
    (H/H_max)^exponent over current candidates (llama-sampling.cpp temp_ext).
    """
    temp = p["temperature"]
    rng = p["dynatemp_range"]
    expo = p["dynatemp_exponent"]
    valid = logits > NEG_INF / 2
    probs = jax.nn.softmax(logits, axis=-1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ent = -(probs * jnp.where(valid, logp, 0.0) * valid).sum(-1)
    n_valid = jnp.maximum(valid.sum(-1), 2)
    max_ent = jnp.log(n_valid.astype(jnp.float32))
    tmin = jnp.maximum(0.0, temp - rng)
    tmax = temp + rng
    dyn = tmin + (tmax - tmin) * jnp.power(
        jnp.clip(ent / max_ent, 0.0, 1.0), expo
    )
    eff = jnp.where(rng > 0, dyn, temp)
    safe = jnp.where(eff > 0, eff, 1.0)
    return logits / safe[:, None]


def _per_row_categorical(
    key: jax.Array, logits: jax.Array, seeds: jax.Array
) -> jax.Array:
    """Seeded per-row draw: fold each row's seed AND row index into the step
    key and use the Gumbel-max trick (jax.random.categorical doesn't take
    batched keys).  Folding the row index decorrelates concurrent slots that
    share a seed (e.g. two requests with the default seed would otherwise
    receive identical Gumbel noise every step)."""
    rows = jnp.arange(seeds.shape[0], dtype=seeds.dtype)
    keys = jax.vmap(
        lambda s, r: jax.random.fold_in(jax.random.fold_in(key, s), r)
    )(seeds, rows)
    g = jax.vmap(
        lambda k, sh=logits.shape[-1]: jax.random.gumbel(k, (sh,))
    )(keys)
    masked_g = jnp.where(logits > NEG_INF / 2, g, 0.0)
    return jnp.argmax(logits + masked_g, axis=-1)


def sample(
    logits: jax.Array,  # (B, V) fp32
    p: dict[str, jax.Array],
    key: jax.Array,
    recent_tokens: jax.Array | None = None,  # (B, P)
    recent_valid: jax.Array | None = None,
    allowed_mask: jax.Array | None = None,  # (B, V) bool from grammar
    features: tuple[str, ...] | None = None,
) -> jax.Array:
    """Full chain, token only (compat wrapper over sample_ex)."""
    state = init_state(logits.shape[0])
    tok, _ = sample_ex(
        logits, p, key, state, recent_tokens, recent_valid, allowed_mask,
        features=features,
    )
    return tok


ALL_FEATURES = (
    "logit_bias", "penalties", "dry", "top_n_sigma", "top_k", "typical",
    "top_p", "min_p", "xtc", "sampling", "mirostat",
)


def features_of(params: list[SamplerParams]) -> tuple[str, ...]:
    """Static feature set for a batch of sampler configs — the trace-time
    chain shape.  Disabled transforms cost NOTHING (the reference gets this
    for free by building its chain per request; under jit the transforms
    would otherwise run with identity parameters — and the truncation
    samplers each do a full-vocab sort, which dominates a decode step)."""
    f: set[str] = set()
    for s in params:
        if s.logit_bias:
            f.add("logit_bias")
        if (s.repeat_penalty != 1.0 or s.presence_penalty
                or s.frequency_penalty):
            f.add("penalties")
        if s.dry_multiplier > 0:
            f.add("dry")
        if s.top_n_sigma > 0:
            f.add("top_n_sigma")
        if s.top_k > 0:
            f.add("top_k")
        if s.typical_p < 1.0:
            f.add("typical")
        if s.top_p < 1.0:
            f.add("top_p")
        if s.min_p > 0:
            f.add("min_p")
        if s.xtc_p > 0:
            f.add("xtc")
        if s.temperature > 0:
            f.add("sampling")
        if s.mirostat_tau > 0:
            f.add("mirostat")
        if s.dynatemp_range > 0:
            f.add("sampling")
    return tuple(x for x in ALL_FEATURES if x in f)


def sample_ex(
    logits: jax.Array,  # (B, V) fp32
    p: dict[str, jax.Array],
    key: jax.Array,
    state: dict[str, jax.Array],
    recent_tokens: jax.Array | None = None,  # (B, P)
    recent_valid: jax.Array | None = None,
    allowed_mask: jax.Array | None = None,  # (B, V) bool from grammar
    dry_breakers: jax.Array | None = None,
    features: tuple[str, ...] | None = None,  # static; None = everything
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Full chain with carried per-row state (mirostat mu).

    Order: logit_bias -> grammar mask -> penalties -> dry -> top_n_sigma ->
    top_k -> typical -> top_p -> min_p -> xtc -> temp -> draw; rows with
    mirostat_tau > 0 instead use temp -> mirostat-v2 truncation -> draw and
    update mu.  temperature <= 0 selects greedy argmax for that row.

    ``features`` (see features_of) statically prunes disabled transforms —
    pass it in jitted decode steps so disabled samplers don't pay their
    full-vocab sorts.
    """
    on = (lambda name: features is None or name in features)
    if on("logit_bias"):
        logits = apply_logit_bias(logits, p)
    if allowed_mask is not None:
        logits = jnp.where(allowed_mask, logits, NEG_INF)
    if recent_tokens is not None:
        if on("penalties"):
            logits = apply_penalties(logits, recent_tokens, recent_valid, p)
        if on("dry"):
            logits = apply_dry(
                logits, recent_tokens, recent_valid, p, dry_breakers
            )

    greedy_tok = jnp.argmax(logits, axis=-1)
    if not on("sampling") and not on("mirostat"):
        return greedy_tok.astype(jnp.int32), state

    key_xtc, key_draw, key_miro = jax.random.split(key, 3)

    # --- standard truncation chain ---
    t = logits
    if on("top_n_sigma"):
        t = apply_top_n_sigma(t, p["top_n_sigma"])
    if on("top_k"):
        t = apply_top_k(t, p["top_k"])
    if on("typical"):
        t = apply_typical(t, p["typical_p"])
    if on("top_p"):
        t = apply_top_p(t, p["top_p"])
    if on("min_p"):
        t = apply_min_p(t, p["min_p"])
    if on("xtc"):
        t = apply_xtc(t, p["xtc_p"], p["xtc_t"], key_xtc)
    t = apply_temperature(t, p)
    std_tok = _per_row_categorical(key_draw, t, p["seed"])

    # --- mirostat v2 path (llama_sampler_init_mirostat_v2) ---
    if on("mirostat"):
        tau = p["mirostat_tau"]
        eta = p["mirostat_eta"]
        mu = jnp.where(
            (state["mu"] == 0.0) & (tau > 0), 2.0 * tau, state["mu"]
        )
        temp = p["temperature"]
        safe_temp = jnp.where(temp > 0, temp, 1.0)
        ml = logits / safe_temp[:, None]
        mprob = jax.nn.softmax(ml, axis=-1)
        surprise = -jnp.log2(jnp.maximum(mprob, 1e-30))
        mkeep = surprise <= mu[:, None]
        # always keep argmax so the set is non-empty
        mkeep = mkeep | (ml >= ml.max(-1, keepdims=True))
        mt = jnp.where(mkeep, ml, NEG_INF)
        miro_tok = _per_row_categorical(key_miro, mt, p["seed"])
        obs = jnp.take_along_axis(
            surprise, miro_tok[:, None], axis=-1
        )[:, 0]
        new_mu = mu - eta * (obs - tau)
        use_miro = tau > 0
        std_tok = jnp.where(use_miro, miro_tok, std_tok)
        out_mu = jnp.where(use_miro, new_mu, state["mu"])
        state = {"mu": out_mu}

    temp = p["temperature"]
    tok = jnp.where(temp > 0, std_tok, greedy_tok).astype(jnp.int32)
    return tok, state

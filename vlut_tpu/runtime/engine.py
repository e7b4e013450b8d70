"""Slot-based inference engine: prefill + fused decode/sample steps.

The TPU re-architecture of the reference's decode loop + server slots
(src/llama-context.cpp:1034, tools/server/server-context.cpp:1855).  Where
the reference builds one *mixed* variable-shape batch per iteration, XLA
wants static shapes, so the engine runs two compiled programs:

* ``prefill``  — one request at a time, (1, T_bucket) tokens into its slot's
  KV rows (T bucketed to limit recompiles);
* ``step``     — all slots at once, (n_slots, 1) tokens; forward + sampler
  chain fused in one jitted call with the KV cache donated, so per step only
  n_slots int32s cross the host boundary.

Continuous batching = host loop admitting queued requests into free slots
between steps, exactly the slot state machine of server_context::update_slots
but with the batch shape fixed at n_slots.
"""

from __future__ import annotations

import dataclasses
import functools
import os
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from vlut_tpu.config import ModelConfig
from vlut_tpu.models.transformer import forward
from vlut_tpu.runtime import kv_cache as kvc
from vlut_tpu.runtime.sampling import (
    NEG_INF,
    SamplerParams,
    features_of,
    init_state as sampler_init_state,
    sample_ex,
    stack_params,
)

PENALTY_WINDOW = 64


def _mask_pad_vocab(logits: jax.Array, vocab_size: int) -> jax.Array:
    """lm_head may be vocab-padded for sharding (models/dims.py)."""
    v = logits.shape[-1]
    if v == vocab_size:
        return logits
    return jnp.where(
        jnp.arange(v) < vocab_size, logits, jnp.float32(NEG_INF)
    )


@dataclasses.dataclass
class Request:
    prompt: list[int]
    max_new_tokens: int = 64
    sampler: SamplerParams = dataclasses.field(default_factory=SamplerParams)
    stop_tokens: tuple[int, ...] = ()
    # optional GBNF constraint (vlut_tpu.runtime.grammar.GrammarSampler,
    # already bound to this engine's vocab pieces); reset on admit
    grammar: Any = None
    # top-k logprobs to record per generated token (0 = off; reference
    # n_probs, tools/server completion_probabilities)
    n_probs: int = 0
    # filled by the engine:
    rid: int = -1
    output: list[int] = dataclasses.field(default_factory=list)
    # per generated token: (token_ids (K,), logprobs (K,)) when n_probs > 0
    logprobs: list[tuple[Any, Any]] = dataclasses.field(default_factory=list)
    done: bool = False
    # set instead of raising when a request can't be served (e.g. prompt
    # longer than the context with context_shift off) — the server loop
    # must keep running (reference: send_error per slot)
    error: str | None = None


@dataclasses.dataclass
class _Slot:
    req: Request | None = None
    length: int = 0  # tokens currently in KV
    generated: int = 0
    # full token history currently materialized in this slot's KV rows —
    # basis for prompt-cache prefix reuse (reference: longest-common-prefix
    # reuse in server update_slots, tools/server/server-context.cpp:2172)
    history: list[int] = dataclasses.field(default_factory=list)
    # tokens whose KV rows are live for the ACTIVE request (diverges from
    # prompt+output once a context shift splices rows out)
    kv_hist: list[int] = dataclasses.field(default_factory=list)


@dataclasses.dataclass
class PerfCounters:
    """llama_perf_context analog (include/llama.h:1399-1419)."""

    n_prompt_tokens: int = 0
    t_prompt_s: float = 0.0
    n_decode_tokens: int = 0
    t_decode_s: float = 0.0
    n_reused_tokens: int = 0
    n_shifted_tokens: int = 0
    n_spec_drafted: int = 0
    n_spec_accepted: int = 0

    def summary(self) -> str:
        pp = self.n_prompt_tokens / self.t_prompt_s if self.t_prompt_s else 0
        tg = self.n_decode_tokens / self.t_decode_s if self.t_decode_s else 0
        return (
            f"prompt: {self.n_prompt_tokens} tok in "
            f"{self.t_prompt_s*1e3:.0f} ms ({pp:.1f} tok/s) | "
            f"decode: {self.n_decode_tokens} tok in "
            f"{self.t_decode_s*1e3:.0f} ms ({tg:.1f} tok/s) | "
            f"reused: {self.n_reused_tokens} tok"
        )


class Engine:
    """Single-host engine over an optionally sharded params/cache pytree."""

    def __init__(
        self,
        cfg: ModelConfig,
        params: dict[str, Any],
        n_slots: int = 8,
        max_len: int | None = None,
        impl: str = "auto",
        cache_dtype=jnp.bfloat16,
        kv_quant: bool = False,
        context_shift: bool = True,
        n_keep: int = 4,
        fuse: bool = True,
        unroll: bool = True,
        head_quant: bool = False,
        draft: tuple[Any, Any] | None = None,  # (draft_cfg, draft_params)
        k_draft: int = 4,
        lookahead: tuple[int, int] | None = None,  # (window, ngram)
        prefill_buckets: tuple[int, ...] = (16, 32, 64, 128, 256, 512, 1024),
        mesh: Any = None,  # jax.sharding.Mesh("dp","tp"): multi-device serve
    ):
        self.cfg = cfg
        # Multi-device serving (VERDICT r4 item 1): params Megatron-sharded
        # over "tp", slots over "dp" (parallel/sharding.py); prefill/decode
        # forwards run inside shard_map (parallel/spmd.make_engine_forward)
        # so the word-packed Pallas kernels partition too, and everything
        # around them (slot gather/scatter, sampler chain, ring buffers)
        # stays GSPMD-managed.  The reference serves multi-device via
        # LLAMA_SPLIT_MODE_LAYER/ROW + tensor_split (include/llama.h:200-
        # 202,304); here it's one Mesh argument.
        self.mesh = mesh
        if mesh is not None:
            tp_m, dp_m = mesh.shape["tp"], mesh.shape["dp"]
            if type(cfg).__name__ == "MambaConfig":
                raise ValueError("mesh serving: recurrent models not "
                                 "supported (per-slot state, no tp dim)")
            if draft is not None or lookahead is not None:
                raise ValueError("mesh serving: speculative/lookahead "
                                 "decode modes are single-device for now")
            if n_slots % dp_m:
                raise ValueError(f"n_slots={n_slots} must divide by "
                                 f"dp={dp_m}")
            if tp_m > 1:
                if getattr(cfg, "kv_lora_rank", 0):
                    raise ValueError("mesh serving: MLA caches have one "
                                     "latent head; tp>1 unsupported")
                if getattr(cfg, "n_experts", 0):
                    # MoE: the axis carries EXPERT parallelism (experts
                    # shard, attention replicates — parallel/spmd.py)
                    if cfg.n_experts % tp_m:
                        raise ValueError(
                            f"tp={tp_m} must divide "
                            f"n_experts={cfg.n_experts} (the mesh axis "
                            f"shards experts for MoE models)"
                        )
                    # heterogeneous variants (dense lead / shared
                    # experts / arctic parallel / grove chunks) work
                    # too: their dense tensors replicate (model-level
                    # MoE flag in parallel/sharding.py) and their adds
                    # land AFTER the expert-combine psum
                elif cfg.n_heads % tp_m or cfg.n_kv_heads % tp_m:
                    raise ValueError(
                        f"tp={tp_m} must divide n_heads={cfg.n_heads} and "
                        f"n_kv_heads={cfg.n_kv_heads}"
                    )
                if not getattr(cfg, "n_experts", 0):
                    # attention-tp only: MoE keeps attention replicated
                    # (experts shard instead), so packing/fusion are fine
                    from vlut_tpu.models.dims import make_plan as _mk

                    if _mk(cfg).tp_pack % tp_m:
                        raise ValueError(
                            f"checkpoint packed with tp_pack="
                            f"{_mk(cfg).tp_pack}; tp={tp_m} must divide it"
                        )
                    fuse = False  # a [q|k|v] concat doesn't column-shard
        # recurrent family (Mamba): per-slot conv/ssm state instead of KV
        # rows (reference: src/llama-memory-recurrent.cpp) — served through
        # the same slot machinery with left-padded prefill
        self._recurrent = type(cfg).__name__ == "MambaConfig"
        if self._recurrent:
            if draft is not None:
                raise ValueError(
                    "speculative decoding needs state rewind; recurrent "
                    "models cannot rewind (reference has the same limit)"
                )
            head_quant = fuse = unroll = False
            context_shift = False  # recurrent context never shifts
        if head_quant:
            from vlut_tpu.models.transformer import quantize_head

            params = quantize_head(params)
        if fuse:
            from vlut_tpu.models.transformer import fuse_projections

            params = fuse_projections(params, cfg)
        if unroll:
            from vlut_tpu.models.transformer import unstack_layers

            params = unstack_layers(params, cfg)
        if (
            not self._recurrent
            and getattr(cfg, "weight_fmt", "") == "i2"
            and jax.default_backend() == "tpu"
            and os.environ.get("VLUT_TPU_WORD_PACK", "1") == "1"
        ):
            # serving-time uint32 word layout: ~4x fewer decode lane-ops
            # in the ALU-bound unpack (ops/packing.word_pack)
            from vlut_tpu.ops.packing import word_pack_params

            params = word_pack_params(params, cfg.weight_fmt)
        self.params = params
        self.n_slots = n_slots
        self.max_len = max_len or cfg.max_seq_len
        self.impl = impl
        self.prefill_buckets = tuple(
            b for b in prefill_buckets if b <= self.max_len
        ) or (self.max_len,)

        if self._recurrent:
            from vlut_tpu.models.ssm import init_state

            self._vocab_p = cfg.vocab_size
            self.cache = init_state(cfg, n_slots)
        else:
            from vlut_tpu.models.dims import make_plan

            plan = make_plan(cfg)
            self._vocab_p = plan.vocab_p
            # unrolled decode wants the per-layer ("layers") cache layout
            # so each layer's buffer updates in place (kv_cache.new_cache)
            if getattr(cfg, "kv_lora_rank", 0):
                # MLA (deepseek): one lane-padded latent row per position
                w_row = cfg.kv_lora_rank + cfg.qk_rope_dim
                kv_h, kv_w = 1, w_row + (-w_row) % 128
            else:
                kv_h, kv_w = cfg.n_kv_heads, plan.hd_p
            self.cache = kvc.new_cache(
                cfg.n_layers, n_slots, self.max_len, kv_h, kv_w,
                cache_dtype, quantized=kv_quant,
                layout="layers" if unroll else "stacked",
            )
        self.slots = [_Slot() for _ in range(n_slots)]
        self.queue: list[Request] = []
        self._next_rid = 0
        self._key = jax.random.PRNGKey(0)

        # device-side sampler state
        self.ring = jnp.full((n_slots, PENALTY_WINDOW), -1, jnp.int32)
        self.ring_cnt = jnp.zeros((n_slots,), jnp.int32)
        self._sp = stack_params([SamplerParams()] * n_slots)
        self._sampler_state = sampler_init_state(n_slots)

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from vlut_tpu.parallel.sharding import (
                cache_specs_for,
                shard_params,
            )

            self.params = shard_params(self.params, mesh, cfg)
            self.cache = jax.tree.map(
                lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
                self.cache,
                cache_specs_for(
                    self.cache,
                    head_axis=None if getattr(cfg, "n_experts", 0)
                    else "tp",
                ),
            )
            # host-fed sampler state replicates over the mesh so every
            # jitted program sees one consistent device set
            rep = NamedSharding(mesh, P())
            self.ring = jax.device_put(self.ring, rep)
            self.ring_cnt = jax.device_put(self.ring_cnt, rep)
            self._key = jax.device_put(self._key, rep)
            self._sampler_state = jax.tree.map(
                lambda a: jax.device_put(a, rep), self._sampler_state
            )

        self.context_shift = context_shift
        self.n_keep = n_keep
        self._rope_tables = None
        self._prefill_cache: dict[int, Callable] = {}
        # decode step compiled per active sampler-feature set (disabled
        # transforms are pruned at trace time — see sampling.features_of)
        self._step_fns: dict[tuple[str, ...], Callable] = {}
        self._features: tuple[str, ...] = ()
        # per-slot draft-model speculation (reference: server-context.cpp
        # :760-775 per-slot spec state).  Greedy-only: rounds verify K
        # drafts in one target forward; output equals plain greedy decode.
        self._spec = None
        if draft is not None:
            # draft = (cfg, params) or (cfg, params, (d2t, t2d)) — the
            # third element translates mismatched draft/target vocabs
            # (speculative.build_vocab_translation)
            d_cfg, d_params = draft[0], draft[1]
            vmap_ = draft[2] if len(draft) > 2 else None
            self._spec = {
                "cfg": d_cfg,
                "params": d_params,
                "k": k_draft,
                "cache": kvc.new_cache(
                    d_cfg.n_layers, n_slots, self.max_len,
                    d_cfg.n_kv_heads, make_plan(d_cfg).hd_p, cache_dtype,
                ),
                "prefill": {},
                "step": None,
                "vmap": None
                if vmap_ is None
                else (
                    jnp.asarray(vmap_[0], jnp.int32),
                    jnp.asarray(vmap_[1], jnp.int32),
                ),
            }
        # per-slot windowed lookahead (reference: examples/lookahead run
        # per server slot) — draft-model-free speculation; mutually
        # exclusive with the draft path (both own the decode step)
        self._la = None
        if lookahead is not None:
            if draft is not None:
                raise ValueError("lookahead and draft are mutually "
                                 "exclusive decode modes")
            if self._recurrent:
                raise ValueError("lookahead needs KV row rewind; "
                                 "recurrent models cannot rewind")
            w, g = lookahead
            pool = 64
            self._la = {
                "window": w,
                "ngram": g,
                "t_total": 1 + (g - 1) * (w + 1),
                "step": None,
                "win": jnp.zeros((n_slots, w, g - 1), jnp.int32),
                "pool": jnp.full((n_slots, pool, g), -1, jnp.int32),
                "ptr": jnp.zeros((n_slots,), jnp.int32),
                "jac": -jnp.ones((n_slots, g - 1), jnp.int32),
            }
        self.perf = PerfCounters()

    # --- compiled programs -------------------------------------------------

    def _build_prefill(self, t_bucket: int, m: int = 1, cfg=None):
        """Batched prefill: m requests (same T bucket) in ONE forward —
        the reference packs prompt chunks into one mixed batch
        (update_slots); here the batch gathers the target slots' cache
        rows, runs forward, and scatters them back."""
        cfg, impl = cfg or self.cfg, self.impl
        if self._recurrent:
            from vlut_tpu.models.ssm import forward as ssm_forward

            @functools.partial(jax.jit, donate_argnums=(1,))
            def rec_prefill(params, state, tokens, positions, slots,
                            n_valid):
                # tokens LEFT-padded (m, T): pads before the prompt keep
                # the recurrence identical to an unpadded run (ssm.forward
                # valid mask)
                del positions
                view = {k: v[:, slots] for k, v in state.items()}
                tb = tokens.shape[1]
                valid = (
                    jnp.arange(tb)[None, :] >= (tb - n_valid[:, None])
                )
                logits, new_st = ssm_forward(
                    params, cfg, tokens, view, logits_last_only=True,
                    valid=valid,
                )
                out = {
                    k: state[k].at[:, slots].set(new_st[k]) for k in state
                }
                return logits[:, 0], out

            return rec_prefill

        sharded_fwd = self._make_sharded_forward(m, cfg)

        @functools.partial(jax.jit, donate_argnums=(1,))
        def prefill_fn(params, cache, tokens, positions, slots, n_valid):
            # tokens (m, T); slots (m,) int32 target slot per row (duplicate
            # slot ids are benign only when rows are identical — the host
            # pads partial groups by repeating row 0).
            layered = isinstance(cache["k"], (tuple, list))
            if layered:
                view = {
                    k: tuple(a[slots] for a in v) for k, v in cache.items()
                }
            else:
                view = {k: v[:, slots] for k, v in cache.items()}
            if sharded_fwd is not None:
                logits, new_sl = sharded_fwd(
                    params, view, tokens, positions,
                    jnp.maximum(n_valid - 1, 0),
                )
            else:
                logits, new_sl = forward(
                    params, cfg, tokens, positions, view, impl=impl,
                    logits_at=jnp.maximum(n_valid - 1, 0),
                )
            if layered:
                out = {
                    k: tuple(
                        a.at[slots].set(new_sl[k][i])
                        for i, a in enumerate(cache[k])
                    )
                    for k in cache
                }
            else:
                out = {
                    k: cache[k].at[:, slots].set(new_sl[k]) for k in cache
                }
            return logits[:, 0], out  # (m, V) last-valid-token logits

        return prefill_fn

    def _make_sharded_forward(self, m: int, cfg):
        """shard_mapped forward over an m-row cache view, or None when the
        engine runs single-device.  The view's slot axis shards over "dp"
        when m divides it (the decode step always does; prefill groups of
        fewer rows than dp run tp-only, replicated over dp)."""
        if self.mesh is None or cfg is not self.cfg:
            # draft-model prefills (cfg override) stay single-device
            return None
        from vlut_tpu.parallel.spmd import make_engine_forward

        bspec = "dp" if m % self.mesh.shape["dp"] == 0 else None
        return make_engine_forward(
            cfg, self.mesh, self.params, self.cache,
            impl=self.impl, batch_axis=bspec,
        )

    def _build_step(self, features: tuple[str, ...], k_probs: int = 0):
        cfg, impl = self.cfg, self.impl
        recurrent = self._recurrent
        sharded_fwd = self._make_sharded_forward(self.n_slots, cfg)

        @functools.partial(jax.jit, donate_argnums=(1, 5, 6, 7))
        def step_fn(
            params, cache, tokens, lengths, sp, ring, ring_cnt, sstate, key,
            mask,
        ):
            # tokens (B,) int32 last sampled/prompt token per slot
            if recurrent:
                from vlut_tpu.models.ssm import forward as ssm_forward

                logits, cache = ssm_forward(
                    params, cfg, tokens[:, None], cache
                )
            elif sharded_fwd is not None:
                logits, cache = sharded_fwd(
                    params, cache, tokens[:, None], lengths[:, None],
                    jnp.zeros((tokens.shape[0],), jnp.int32),
                )
            else:
                logits, cache = forward(
                    params, cfg, tokens[:, None], lengths[:, None], cache,
                    impl=impl,
                )
            logits = _mask_pad_vocab(
                logits[:, 0].astype(jnp.float32), cfg.vocab_size
            )
            pw = ring.shape[1]
            slot_pos = jnp.arange(pw)[None, :]
            valid = (slot_pos < ring_cnt[:, None]) & (
                slot_pos >= (ring_cnt - sp["penalty_last_n"])[:, None]
            )
            nxt, sstate = sample_ex(
                logits, sp, key, sstate, ring, valid, allowed_mask=mask,
                features=features,
            )
            ring = ring.at[
                jnp.arange(ring.shape[0]), ring_cnt % pw
            ].set(nxt)
            ring_cnt = ring_cnt + 1
            if k_probs:
                lp = jax.nn.log_softmax(logits, axis=-1)
                top_lp, top_id = jax.lax.top_k(lp, k_probs)
                chosen = jnp.take_along_axis(lp, nxt[:, None], axis=-1)
                probs = (top_id, top_lp, chosen[:, 0])
            else:
                probs = None
            return nxt, cache, ring, ring_cnt, sstate, probs

        return step_fn

    def _build_spec_step(self):
        cfg_t, impl = self.cfg, self.impl
        cfg_d, k = self._spec["cfg"], self._spec["k"]
        vmap_ = self._spec["vmap"]

        @functools.partial(jax.jit, donate_argnums=(2, 3))
        def spec_step(params_t, params_d, cache_t, cache_d, last, lengths):
            b = last.shape[0]

            def vmask(logits, cfg):
                v = logits.shape[-1]
                if v != cfg.vocab_size:
                    logits = jnp.where(
                        jnp.arange(v) < cfg.vocab_size, logits, -1e30
                    )
                return logits

            def draft_step(c, _):
                tok, lens, cache_d = c
                lg, cache_d = forward(
                    params_d, cfg_d, tok[:, None], lens[:, None], cache_d,
                    impl=impl, logits_at=jnp.zeros((b,), jnp.int32),
                )
                nxt = jnp.argmax(vmask(lg[:, 0], cfg_d), -1).astype(
                    jnp.int32
                )
                return (nxt, lens + 1, cache_d), nxt

            last_d = (
                last if vmap_ is None
                else jnp.maximum(vmap_[1][jnp.maximum(last, 0)], 0)
            )
            # k+1 draft decodes so an all-accept round leaves no cache hole
            (_, _, cache_d), props_all = jax.lax.scan(
                draft_step, (last_d, lengths, cache_d), None, length=k + 1
            )
            props = props_all.T[:, :k]
            if vmap_ is not None:
                # draft ids -> target ids; -1 (no target piece) can never
                # match the target argmax, so it self-rejects
                props = vmap_[0][jnp.maximum(props, 0)]
            seq = jnp.concatenate(
                [last[:, None], jnp.maximum(props, 0)], axis=1
            )
            pos = (lengths[:, None] + jnp.arange(k + 1)[None, :]).astype(
                jnp.int32
            )
            lg, cache_t = forward(
                params_t, cfg_t, seq, pos, cache_t, impl=impl
            )
            tgt = jnp.argmax(
                vmask(lg.astype(jnp.float32), cfg_t), -1
            ).astype(jnp.int32)
            match = tgt[:, :k] == props
            n_acc = jnp.argmin(
                jnp.concatenate(
                    [match, jnp.zeros((b, 1), bool)], axis=1
                ).astype(jnp.int32),
                axis=1,
            )
            return tgt, n_acc, cache_t, cache_d

        return spec_step

    def _can_spec(self, active: list[int]) -> bool:
        """Speculation covers the greedy featureless path (the standalone
        verify rule guarantees exact greedy equality); anything needing the
        sampler chain / grammar / logprobs uses the normal step."""
        if self._spec is None or self._features:
            return False
        k = self._spec["k"]
        for i in active:
            req = self.slots[i].req
            if req.grammar is not None or req.n_probs:
                return False
            used = self.slots[i].length + self.slots[i].generated - 1
            if used + k + 2 >= self.max_len - 1:
                return False
        return True

    def _step_speculative(self, active: list[int]) -> bool:
        spec = self._spec
        if spec["step"] is None:
            spec["step"] = self._build_spec_step()
        tokens = np.zeros((self.n_slots,), np.int32)
        # idle slots write at the tail rows, not row 0 (see step()); in spec
        # mode prefix reuse is disabled at admit anyway, but keep the caches
        # consistent
        lengths = np.full((self.n_slots,), self.max_len - 1, np.int32)
        for i, s in enumerate(self.slots):
            if s.req is not None:
                tokens[i] = s.req.output[-1]
                lengths[i] = s.length + s.generated - 1
        t0 = time.perf_counter()
        emitted, n_acc, self.cache, spec["cache"] = spec["step"](
            self.params, spec["params"], self.cache, spec["cache"],
            jnp.asarray(tokens), jnp.asarray(lengths),
        )
        emitted = np.asarray(emitted)
        n_acc = np.asarray(n_acc)
        self.perf.t_decode_s += time.perf_counter() - t0
        for i in active:
            slot = self.slots[i]
            n = int(n_acc[i]) + 1
            row = [int(x) for x in emitted[i, :n]]
            # KV rows written this round that stay valid: the fed token +
            # the accepted drafts
            slot.kv_hist.extend([int(tokens[i])] + row[:-1])
            self.perf.n_decode_tokens += n
            self.perf.n_spec_drafted += spec["k"]
            self.perf.n_spec_accepted += n - 1
            for tok in row:
                self._push_token_host_only(i, tok)
                if slot.req is None:  # finished mid-row
                    break
        return True

    def _can_la(self, active: list[int]) -> bool:
        """Lookahead covers the greedy featureless path (like _can_spec);
        each round writes t_total KV rows, so slots need that headroom."""
        if self._la is None or self._features:
            return False
        t_total = self._la["t_total"]
        for i in active:
            req = self.slots[i].req
            if req.grammar is not None or req.n_probs:
                return False
            used = self.slots[i].length + self.slots[i].generated - 1
            if used + t_total + 1 >= self.max_len - 1:
                return False
        return True

    def _step_lookahead(self, active: list[int]) -> bool:
        la = self._la
        if la["step"] is None:
            from vlut_tpu.runtime.speculative import make_lookahead_round

            la["step"] = make_lookahead_round(
                self.cfg, la["window"], la["ngram"], impl=self.impl
            )
        lvls = la["ngram"] - 1
        tokens = np.zeros((self.n_slots,), np.int32)
        # idle slots park at the tail rows (see _step_speculative) — but a
        # lookahead round writes t_total rows there, so an idle slot's
        # cached prefix is only trustworthy below that region; truncate
        # its history before the clobbering write (ADVICE r1 bug class)
        cap = self.max_len - la["t_total"] - 1
        for s in self.slots:
            if s.req is None and len(s.history) > cap:
                s.history = s.history[:cap]
        lengths = np.full((self.n_slots,), cap, np.int32)
        for i, s in enumerate(self.slots):
            if s.req is not None:
                tokens[i] = s.req.output[-1]
                lengths[i] = s.length + s.generated - 1
        t0 = time.perf_counter()
        (emitted, n_acc, self.cache, la["win"], la["pool"], la["ptr"],
         la["jac"]) = la["step"](
            self.params, self.cache, jnp.asarray(tokens),
            jnp.asarray(lengths), la["win"], la["pool"], la["ptr"],
            la["jac"],
        )
        emitted = np.asarray(emitted)
        n_acc = np.asarray(n_acc)
        self.perf.t_decode_s += time.perf_counter() - t0
        for i in active:
            slot = self.slots[i]
            n = int(n_acc[i]) + 1
            row = [int(x) for x in emitted[i, :n]]
            slot.kv_hist.extend([int(tokens[i])] + row[:-1])
            self.perf.n_decode_tokens += n
            self.perf.n_spec_drafted += lvls
            self.perf.n_spec_accepted += n - 1
            for tok in row:
                self._push_token_host_only(i, tok)
                if slot.req is None:  # finished mid-row
                    break
        return True

    # --- host API ------------------------------------------------------------

    def submit(self, req: Request) -> int:
        req.rid = self._next_rid
        self._next_rid += 1
        self.queue.append(req)
        return req.rid

    def _bucket(self, t: int) -> int:
        for b in self.prefill_buckets:
            if t <= b:
                return b
        if self._recurrent:
            # chunked prefill needs pad-free intermediate chunks; the
            # left-padded recurrent prefill can't split (the reference
            # keeps one cumulative cell per seq too)
            raise ValueError(
                f"prompt length {t} exceeds max bucket "
                f"{self.prefill_buckets[-1]} (recurrent models cannot "
                f"chunk prefill)"
            )
        # longer prompts run CHUNKED: full largest-bucket rounds first,
        # then the remainder lands here (reference ubatch splitting,
        # src/llama-context.cpp:1094 / src/llama-batch.h:103-110)
        return self.prefill_buckets[-1]

    @staticmethod
    def _common_prefix(a: list[int], b: list[int]) -> int:
        n = 0
        for x, y in zip(a, b):
            if x != y:
                break
            n += 1
        return n

    @staticmethod
    def _pow2_at_most(n: int, cap: int) -> int:
        p = 1
        while p * 2 <= min(n, cap):
            p *= 2
        return p

    def _admit(self):
        # stage 1: assign queued requests to free slots (prefix-cache slot
        # choice, server-context.cpp:2172)
        staged: list[tuple[int, Request, int, list[int]]] = []
        while self.queue:
            free = [i for i, s in enumerate(self.slots) if s.req is None]
            if not free:
                break
            req = self.queue.pop(0)
            prompt = req.prompt
            if not prompt:
                req.done = True
                continue
            if len(prompt) > self.max_len - 1:
                if not self.context_shift or self._recurrent:
                    req.error = (
                        f"prompt ({len(prompt)} tokens) exceeds context "
                        f"({self.max_len}); enable context_shift to "
                        f"truncate"
                    )
                    req.done = True
                    continue
                # reference prompt truncation (server keeps n_keep head +
                # the newest tail, tools/server slot truncation)
                keep = min(self.n_keep, self.max_len // 4)
                prompt = (
                    prompt[:keep]
                    + prompt[-(self.max_len - 1 - keep):]
                )
                req.prompt = prompt
            i = max(
                free,
                key=lambda s: self._common_prefix(
                    self.slots[s].history, prompt
                ),
            )
            reuse = min(
                self._common_prefix(self.slots[i].history, prompt),
                len(prompt) - 1,
            )
            if self._spec is not None:
                # the draft cache holds no tracked prefix; both models must
                # see the full prompt
                reuse = 0
            if self._recurrent:
                # recurrent state is cumulative — a partial prefix cannot
                # be reused (reference keeps one cell per live seq only)
                reuse = 0
            slot = self.slots[i]
            slot.req = req
            slot.length = len(prompt)
            slot.generated = 0
            slot.history = list(prompt)
            slot.kv_hist = list(prompt)
            if self._la is not None:
                # stale n-grams from the previous occupant can only cost
                # wasted guesses (acceptance admits target-greedy tokens
                # only), but start each request clean
                la = self._la
                la["win"] = la["win"].at[i].set(0)
                la["pool"] = la["pool"].at[i].set(-1)
                la["ptr"] = la["ptr"].at[i].set(0)
                la["jac"] = la["jac"].at[i].set(-1)
            # [slot, kv offset, remaining tokens, true prefix reuse] — the
            # offset advances past chunk rounds; reuse stays for perf
            staged.append((i, req, reuse, prompt[reuse:], reuse))
        if not staged:
            return

        # stage 1b: chunked long-prompt rounds (reference ubatch loop,
        # src/llama-context.cpp:1094): every prompt longer than the
        # largest bucket feeds full-bucket chunks into its slot's KV —
        # round k carries chunk k of EVERY long prompt as one batched
        # forward, so n long prompts cost the same rounds as one.  The
        # remainder (1..big tokens) then joins the normal bucket groups
        # below, whose last-token logits seed the sampler.
        big = self.prefill_buckets[-1]
        staged = [list(it) for it in staged]
        while True:
            rounds = [it for it in staged if len(it[3]) > big]
            if not rounds:
                break
            for g0 in range(0, len(rounds), self.n_slots):
                batch = rounds[g0 : g0 + self.n_slots]
                m = self._pow2_at_most(len(batch), self.n_slots)
                self._prefill_group(
                    big,
                    [(it[0], it[2], it[3][:big]) for it in batch[:m]],
                )
                for it in batch[:m]:
                    it[2] += big  # kv offset advances past the chunk
                    it[3] = it[3][big:]

        # stage 2: group by prefill bucket and run each group as ONE
        # batched forward (the reference packs prompt chunks into one
        # mixed batch in update_slots)
        by_bucket: dict[int, list] = {}
        for item in staged:
            by_bucket.setdefault(self._bucket(len(item[3])), []).append(item)

        for tb, group in sorted(by_bucket.items()):
            g = 0
            while g < len(group):
                m = self._pow2_at_most(len(group) - g, self.n_slots)
                chunk = group[g : g + m]
                g += m
                last_logits = self._prefill_group(
                    tb, [(i, off, new) for i, req, off, new, _ in chunk]
                )
                # genuine prefix reuse only: chunk-fed tokens were counted
                # as prompt tokens by their own rounds
                self.perf.n_reused_tokens += sum(c[4] for c in chunk)
                for r, (i, req, off, new, _) in enumerate(chunk):
                    self._first_token(i, req, last_logits[r])

        active_samplers = [
            (s.req.sampler if s.req else SamplerParams(temperature=0.0))
            for s in self.slots
        ]
        self._sp = stack_params(active_samplers)
        self._features = features_of(active_samplers)

    def _prefill_group(self, tb: int, rows):
        """One batched prefill forward: ``rows`` is a list of
        (slot_index, kv_offset, tokens) with len(tokens) <= tb.  Writes
        the rows' KV (and the draft model's, when speculative) and
        returns the per-row last-valid-token logits."""
        m = len(rows)
        t0 = time.perf_counter()
        key = (tb, m)
        if key not in self._prefill_cache:
            self._prefill_cache[key] = self._build_prefill(tb, m)
        toks = np.zeros((m, tb), np.int32)
        pos = np.zeros((m, tb), np.int32)
        slots_arr = np.zeros((m,), np.int32)
        nv = np.zeros((m,), np.int32)
        for r, (i, off, new) in enumerate(rows):
            if self._recurrent:
                # left-pad: pads precede the prompt so the recurrence
                # ends in the exact unpadded state
                toks[r, tb - len(new):] = new
            else:
                toks[r, : len(new)] = new
            pos[r] = off + np.arange(tb, dtype=np.int32)
            slots_arr[r] = i
            nv[r] = len(new)
        last_logits, self.cache = self._prefill_cache[key](
            self.params, self.cache, jnp.asarray(toks),
            jnp.asarray(pos), jnp.asarray(slots_arr), jnp.asarray(nv),
        )
        if self._spec is not None:
            spec = self._spec
            if key not in spec["prefill"]:
                spec["prefill"][key] = self._build_prefill(
                    tb, m, cfg=spec["cfg"]
                )
            toks_d = jnp.asarray(toks)
            if spec["vmap"] is not None:
                # prompt tokens are target ids; the draft prefills its
                # translation (unknown pieces -> 0)
                toks_d = jnp.maximum(
                    spec["vmap"][1][jnp.maximum(toks_d, 0)], 0
                )
            _, spec["cache"] = spec["prefill"][key](
                spec["params"], spec["cache"], toks_d,
                jnp.asarray(pos), jnp.asarray(slots_arr),
                jnp.asarray(nv),
            )
        self.perf.n_prompt_tokens += int(nv.sum())
        self.perf.t_prompt_s += time.perf_counter() - t0
        return last_logits

    def _first_token(self, i: int, req: Request, last_logits):
        """Seed slot i's sampler state and sample the first token from its
        prefill logits."""
        prompt = req.prompt
        tail = prompt[-PENALTY_WINDOW:]
        ring = np.full((PENALTY_WINDOW,), -1, np.int32)
        ring[: len(tail)] = tail
        self.ring = self.ring.at[i].set(jnp.asarray(ring))
        self.ring_cnt = self.ring_cnt.at[i].set(len(tail))
        sp_row = stack_params([req.sampler])
        self._key, sub = jax.random.split(self._key)
        pw = PENALTY_WINDOW
        slot_pos = jnp.arange(pw)[None, :]
        valid = slot_pos < self.ring_cnt[i : i + 1, None]
        # new request: reset carried sampler state (mirostat mu)
        self._sampler_state = jax.tree.map(
            lambda a: a.at[i].set(0), self._sampler_state
        )
        row_mask = None
        if req.grammar is not None:
            req.grammar.reset()
            v = self.cfg.vocab_size
            row = req.grammar.mask()[:v]
            if not row.any():  # wedged at the root: force EOG (see
                # _grammar_mask for rationale)
                outs = [
                    t
                    for t in set(getattr(req.grammar, "eos_ids", ()))
                    | set(req.stop_tokens)
                    if 0 <= t < v
                ]
                row = np.zeros((v,), bool)
                if outs:
                    row[outs] = True
                else:
                    row[:] = True
                    req.max_new_tokens = 1
            m = np.ones((1, self._vocab_p), bool)
            m[0, :v] = row
            row_mask = jnp.asarray(m)
        tok, row_state = sample_ex(
            _mask_pad_vocab(
                last_logits[None].astype(jnp.float32), self.cfg.vocab_size
            ),
            sp_row,
            sub,
            {k: v[i : i + 1] for k, v in self._sampler_state.items()},
            self.ring[i : i + 1],
            valid,
            allowed_mask=row_mask,
            features=features_of([req.sampler]),
        )
        self._sampler_state = {
            k: self._sampler_state[k].at[i].set(row_state[k][0])
            for k in self._sampler_state
        }
        first_tok = int(tok[0])
        if req.n_probs:
            lp = jax.nn.log_softmax(
                _mask_pad_vocab(
                    last_logits[None].astype(jnp.float32),
                    self.cfg.vocab_size,
                ),
                axis=-1,
            )
            top_lp, top_id = jax.lax.top_k(lp, req.n_probs)
            req.logprobs.append((
                np.asarray(top_id[0]), np.asarray(top_lp[0]),
                float(lp[0, first_tok]),
            ))
        if req.grammar is not None and first_tok not in req.stop_tokens:
            try:
                req.grammar.accept(first_tok)
            except Exception:
                req.max_new_tokens = min(req.max_new_tokens, 1)
        self._push_token(i, first_tok)

    def _maybe_context_shift(self, i: int):
        """When slot i is one row from capacity, drop the middle half of its
        context (keeping the first n_keep tokens) and rope-rebase the moved
        keys — the reference's server context-shift (seq_rm + seq_add,
        server-context.cpp:1916-1933)."""
        from vlut_tpu.runtime import kv_cache as kvc_mod

        slot = self.slots[i]
        used = slot.length + slot.generated - 1  # rows currently in KV
        if used < self.max_len - 1:
            return
        n_keep = min(self.n_keep, used - 1)
        n_discard = max(1, (used - n_keep) // 2)
        if self._rope_tables is None:
            from vlut_tpu.models.dims import make_plan
            from vlut_tpu.ops.rope import rope_table

            plan = make_plan(self.cfg)
            # unit-magnitude table: stored keys already carry the yarn /
            # longrope mscale, so the rebase rotation must not re-apply it
            tabs = rope_table(
                self.cfg.max_seq_len, plan.hd, self.cfg.rope_theta,
                self.cfg.rope_scaling, pad_to=plan.hd_p, with_mscale=False,
            )
            if getattr(self.cfg, "rope_theta_local", 0.0):
                # gemma3-style: SWA layers wrote keys with the local-theta
                # table, so their rebase rotation must use it too
                tabs = tabs + rope_table(
                    self.cfg.max_seq_len, plan.hd,
                    self.cfg.rope_theta_local, None,
                    pad_to=plan.hd_p, with_mscale=False,
                )
            self._rope_tables = tabs
        tabs = self._rope_tables
        loc_kw = {}
        if len(tabs) == 4:
            loc_kw = dict(cos_loc=tabs[2], sin_loc=tabs[3],
                          swa_local=self.cfg.swa_flags())
        self.cache = kvc_mod.seq_shift(
            self.cache, jnp.int32(i), jnp.int32(n_keep + n_discard),
            jnp.int32(n_discard), tabs[0], tabs[1], **loc_kw,
        )
        # host bookkeeping: the slot now holds used - n_discard rows; fold
        # the discarded span out of length/generated
        if slot.generated - 1 >= n_discard:
            slot.generated -= n_discard
        else:
            rem = n_discard - (slot.generated - 1)
            slot.generated = 1
            slot.length -= rem
        slot.kv_hist = (
            slot.kv_hist[:n_keep] + slot.kv_hist[n_keep + n_discard:]
        )
        self.perf.n_shifted_tokens += n_discard

    def _finish_if_done(self, i: int, tok: int):
        slot = self.slots[i]
        req = slot.req
        # generated counts live KV rows (context shifts fold it back);
        # the output-length limit is the request's, not the slot's
        n_out = len(req.output)
        # recurrent state is O(1); context length never hits a capacity
        # wall (the request's max_new_tokens is the only bound)
        at_capacity = (
            not self._recurrent
            and slot.length + slot.generated >= self.max_len - 1
        )
        if at_capacity and self.context_shift and not (
            tok in req.stop_tokens or n_out >= req.max_new_tokens
        ):
            self._maybe_context_shift(i)
            return
        if (
            tok in req.stop_tokens
            or n_out >= req.max_new_tokens
            or at_capacity
        ):
            req.done = True
            # KV holds exactly kv_hist's rows (prompt + decoded tokens,
            # minus any context-shifted spans) — the reusable cached prefix
            slot.history = list(slot.kv_hist)
            slot.req = None
            slot.length = 0
            slot.generated = 0

    def _push_token(self, i: int, tok: int):
        slot = self.slots[i]
        slot.req.output.append(tok)
        slot.generated += 1
        self.ring = self.ring.at[i, int(self.ring_cnt[i]) % PENALTY_WINDOW].set(
            tok
        )
        self.ring_cnt = self.ring_cnt.at[i].add(1)
        self._finish_if_done(i, tok)

    def step(self) -> bool:
        """One engine iteration: admit new requests, decode all active slots.

        Returns True if any work remains.
        """
        self._admit()
        active = [i for i, s in enumerate(self.slots) if s.req is not None]
        if not active:
            return bool(self.queue)
        if self._can_spec(active):
            return self._step_speculative(active)
        if self._can_la(active):
            return self._step_lookahead(active)

        tokens = np.zeros((self.n_slots,), np.int32)
        # idle slots still run (static shape) and their KV write must land
        # somewhere harmless: row max_len-1 is never part of a reusable
        # prefix (generation caps at max_len-1 rows), whereas row 0 IS — a
        # row-0 write would corrupt the cached prefix _admit reuses via
        # common_prefix(history, prompt).
        lengths = np.full((self.n_slots,), self.max_len - 1, np.int32)
        for i, s in enumerate(self.slots):
            if s.req is not None:
                tokens[i] = s.req.output[-1]
                lengths[i] = s.length + s.generated - 1

        self._key, sub = jax.random.split(self._key)
        t0 = time.perf_counter()
        mask = self._grammar_mask(active)
        k_probs = max(
            (self.slots[i].req.n_probs for i in active), default=0
        )
        step_key = (self._features, k_probs)
        if step_key not in self._step_fns:
            self._step_fns[step_key] = self._build_step(
                self._features, k_probs
            )
        (
            nxt, self.cache, self.ring, self.ring_cnt, self._sampler_state,
            probs,
        ) = self._step_fns[step_key](
            self.params, self.cache, jnp.asarray(tokens),
            jnp.asarray(lengths), self._sp, self.ring, self.ring_cnt,
            self._sampler_state, sub, mask,
        )
        nxt = np.asarray(nxt)
        if probs is not None:
            p_id, p_lp, p_chosen = (np.asarray(x) for x in probs)
        self.perf.t_decode_s += time.perf_counter() - t0
        self.perf.n_decode_tokens += len(active)
        for i in active:
            tok = int(nxt[i])
            req = self.slots[i].req
            # the token fed this step had its KV row written
            self.slots[i].kv_hist.append(int(tokens[i]))
            if probs is not None and req.n_probs:
                req.logprobs.append(
                    (p_id[i, : req.n_probs], p_lp[i, : req.n_probs],
                     float(p_chosen[i]))
                )
            g = req.grammar
            if g is not None and tok not in req.stop_tokens:
                try:
                    g.accept(tok)
                except Exception:
                    # a grammar bug must fail THIS request, not the engine
                    # loop every other request depends on — terminate after
                    # this token
                    req.max_new_tokens = min(
                        req.max_new_tokens, len(req.output) + 1
                    )
            # ring was already updated in-device for every slot; host mirrors
            self._push_token_host_only(i, tok)
        return True

    def _grammar_mask(self, active: list[int]):
        """(n_slots, V) bool allowed-token mask, or None when no active slot
        has a grammar (keeps the common path transfer-free)."""
        grams = [
            (i, self.slots[i].req.grammar)
            for i in active
            if self.slots[i].req.grammar is not None
            # lazy (trigger-activated) grammars are no-ops until the
            # trigger fires; skip them to keep the path transfer-free
            and not getattr(self.slots[i].req.grammar, "inactive", False)
        ]
        if not grams:
            return None
        v = self.cfg.vocab_size
        # mask at the padded lm_head width; pad region already NEG_INF via
        # _mask_pad_vocab, True here keeps it so
        mask = np.ones((self.n_slots, self._vocab_p), bool)
        for i, g in grams:
            row = g.mask()[:v]
            if not row.any():
                # Wedged grammar: no vocab token admissible.  The reference
                # forces EOG here (llama-sampling grammar: "no candidate is
                # viable").  Allow only EOS/stop tokens so the request
                # terminates this step; an all-False row would drive every
                # logit to NEG_INF and make argmax emit token 0, which
                # accept() would then reject.
                req = self.slots[i].req
                outs = [
                    t
                    for t in set(getattr(g, "eos_ids", ())) | set(req.stop_tokens)
                    if 0 <= t < v
                ]
                row = np.zeros((v,), bool)
                if outs:
                    row[outs] = True
                else:
                    # no EOS known: let anything through but cap the request
                    # so the next pushed token finishes it
                    row[:] = True
                    req.max_new_tokens = min(
                        req.max_new_tokens, len(req.output) + 1
                    )
            mask[i, :v] = row
        return jnp.asarray(mask)

    def _push_token_host_only(self, i: int, tok: int):
        # device ring already updated inside the fused step
        slot = self.slots[i]
        slot.req.output.append(tok)
        slot.generated += 1
        self._finish_if_done(i, tok)

    # --- sequence/state ops (llama-memory contract subset, SURVEY §2.4) ---

    def save_slot(self, i: int) -> bytes:
        """Serialize slot i's cached prefix (llama_state_seq_save analog)."""
        from vlut_tpu.runtime import state as state_mod

        slot = self.slots[i]
        if self._recurrent:
            return state_mod.save_recurrent_state(
                self.cache, i, slot.history
            )
        length = len(slot.history)
        return state_mod.save_slot_state(
            self.cache, i, length, slot.history
        )

    def restore_slot(self, i: int, data: bytes) -> None:
        """Load a serialized prefix into idle slot i; the next request
        admitted there reuses it via the prompt cache."""
        from vlut_tpu.runtime import state as state_mod

        if self.slots[i].req is not None:
            raise RuntimeError(f"slot {i} is busy")
        if self._recurrent:
            self.cache, history = state_mod.load_recurrent_state(
                self.cache, i, data
            )
        else:
            self.cache, history = state_mod.load_slot_state(
                self.cache, i, data
            )
        self.slots[i].history = history
        self.slots[i].length = 0

    def fork_slot(self, src: int, dst: int) -> None:
        """Copy slot src's cached prefix to idle slot dst (seq_cp — the
        shared-prompt fan-out primitive, examples/batched/batched.cpp:163)."""
        from vlut_tpu.runtime import kv_cache as kvc_mod

        if self.slots[dst].req is not None:
            raise RuntimeError(f"slot {dst} is busy")
        if self._recurrent:
            self.cache = jax.tree.map(
                lambda a: a.at[:, dst].set(a[:, src]), self.cache
            )
        else:
            n = len(self.slots[src].history)
            self.cache = kvc_mod.seq_cp(
                self.cache, jnp.int32(src), jnp.int32(dst), jnp.int32(n)
            )
        self.slots[dst].history = list(self.slots[src].history)
        self.slots[dst].length = 0

    def cancel(self, rid: int) -> bool:
        """Abort a queued or running request (server stop-strings / client
        disconnect).  A running slot keeps its KV history for prefix reuse."""
        for j, r in enumerate(self.queue):
            if r.rid == rid:
                self.queue.pop(j)
                r.done = True
                return True
        for slot in self.slots:
            if slot.req is not None and slot.req.rid == rid:
                req = slot.req
                req.done = True
                slot.history = list(slot.kv_hist)
                slot.req = None
                slot.length = 0
                slot.generated = 0
                return True
        return False

    def run(self, reqs: list[Request], progress: bool = False) -> list[Request]:
        """Submit everything and loop until drained (batch entry point)."""
        for r in reqs:
            self.submit(r)
        t0 = time.perf_counter()
        steps = 0
        while self.step():
            steps += 1
            if progress and steps % 32 == 0:
                done = sum(r.done for r in reqs)
                print(f"[engine] step {steps}, {done}/{len(reqs)} done, "
                      f"{time.perf_counter()-t0:.1f}s")
        return reqs

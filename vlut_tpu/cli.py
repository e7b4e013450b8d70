"""Command-line entry points (the reference's tools/ binaries, unified).

  vlut-tpu convert   — HF checkpoint -> packed ternary (convert + quantize)
  vlut-tpu generate  — prompt completion (llama-cli analog)
  vlut-tpu batched   — shared-prompt np-way fan-out demo (llama-batched)
  vlut-tpu serve     — OpenAI-compatible HTTP server (llama-server)
  vlut-tpu bench     — GEMM microbench (test-vlut-gemm perf analog)
  vlut-tpu ppl       — perplexity over a text file (llama-perplexity)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache (reference analog: llama.cpp has
    no compile step; here the jit compiles dominate cold start — 170 s
    load vs ~400 s of first-run compiles at 8B through the tunnel, see
    PERF.md LTFT).  Second cold start of the same binary+shapes skips
    them entirely.  VLUT_COMPILE_CACHE=0 disables; the default dir is
    ~/.cache/vlut_tpu/xla."""
    if os.environ.get("VLUT_COMPILE_CACHE", "1") == "0":
        return
    try:
        import jax

        cache = os.environ.get(
            "VLUT_COMPILE_CACHE_DIR",
            os.path.expanduser("~/.cache/vlut_tpu/xla"),
        )
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover — older jax without the knobs
        pass


def _load(model_dir, overrides=None):
    import dataclasses

    import jax

    from vlut_tpu.convert.checkpoint import load_checkpoint

    import os as _os

    cfg, params, meta = load_checkpoint(
        model_dir,
        stream=_os.environ.get("VLUT_STREAM_LOAD", "1") != "0",
    )
    # --override key=value (the reference's --override-kv GGUF-metadata
    # override, common/arg.cpp): retype from the dataclass field
    for spec in overrides or ():
        key, _, val = spec.partition("=")
        if not hasattr(cfg, key):
            raise SystemExit(f"--override: no config field {key!r}")
        cur = getattr(cfg, key)
        if isinstance(cur, bool):
            val = val.lower() in ("1", "true", "yes")
        elif isinstance(cur, int):
            val = int(val)
        elif isinstance(cur, float):
            val = float(val)
        cfg = dataclasses.replace(cfg, **{key: val})
    params = jax.device_put(params)
    return cfg, params, meta


def cmd_convert(args):
    from vlut_tpu.convert.convert import convert_hf

    cfg = convert_hf(args.hf_dir, args.out_dir, fmt=args.fmt)
    print(f"converted: {cfg}")


def cmd_embed(args):
    """Embeddings from the command line (reference tools/embedding
    llama-embedding analog).  Encoder-family checkpoints (bert/modernbert/
    nomic/jina/gemma-embedding/...) run the bidirectional forward with
    the checkpoint's pooling; jina-v3 task adapters select with --task."""
    import json as _json

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vlut_tpu.convert.checkpoint import load_checkpoint
    from vlut_tpu.utils.tokenizer import Tokenizer

    cfg, params, meta = load_checkpoint(args.model, stream=True)
    if meta.get("model_family") != "encoder":
        raise SystemExit(
            "embed: not an encoder-family checkpoint (decoder embeddings "
            "are served by `vlut-tpu serve` /embedding)")
    from vlut_tpu.models.encoder import embed as enc_embed

    tok = Tokenizer(args.model)
    params = jax.device_put(params)
    texts = args.prompt or ["Hello world"]
    outs = []
    for text in texts:
        ids = tok.encode(text)[: cfg.max_seq_len]
        toks = jnp.asarray([ids], jnp.int32)
        mask = jnp.ones_like(toks)
        e = np.asarray(
            enc_embed(params, cfg, toks, mask, task=args.task),
            np.float32,
        )[0]
        outs.append(e)
    if args.json:
        print(_json.dumps({
            "model": str(args.model),
            "embeddings": [e.tolist() for e in outs],
        }))
    else:
        for text, e in zip(texts, outs):
            head = " ".join(f"{v:+.4f}" for v in e[:8])
            print(f"{head} ...  dim={len(e)}  |  {text[:60]}")
        if len(outs) > 1:
            # normalize explicitly: checkpoints converted with
            # normalize=False emit unnormalized vectors, and the label
            # must stay accurate either way (ADVICE r4)
            norms = [max(float(np.linalg.norm(e)), 1e-12) for e in outs]
            sim = np.asarray([
                [float(a @ b) / (na * nb)
                 for b, nb in zip(outs, norms)]
                for a, na in zip(outs, norms)
            ])
            print("cosine matrix:")
            for row in sim:
                print("  " + " ".join(f"{v:.3f}" for v in row))


def cmd_inspect(args):
    """Checkpoint directory inspector (gguf-hash / gguf_dump analog):
    config, tensor directory with shapes/dtypes/bytes, optional xxhash-like
    content digest per tensor."""
    import hashlib
    import json as _json
    import pathlib

    import numpy as np
    from safetensors import safe_open

    path = pathlib.Path(args.ckpt)
    meta = _json.loads((path / "vlut_config.json").read_text())
    print(_json.dumps(
        {k: v for k, v in meta.items() if k != "model_config"}, indent=2
    ))
    print(_json.dumps(meta["model_config"], indent=2))
    total = 0
    with safe_open(str(path / "model.safetensors"), framework="numpy") as sf:
        names = sorted(sf.keys())
        print(f"{'tensor':44s} {'shape':>22s} {'dtype':>9s} {'MiB':>9s}"
              + ("  sha256[:12]" if args.hash else ""))
        full = hashlib.sha256()
        for name in names:
            t = sf.get_tensor(name)
            nbytes = t.nbytes
            total += nbytes
            line = (f"{name:44s} {str(t.shape):>22s} {str(t.dtype):>9s} "
                    f"{nbytes/2**20:9.2f}")
            if args.hash:
                h = hashlib.sha256(np.ascontiguousarray(t).tobytes())
                full.update(h.digest())
                line += f"  {h.hexdigest()[:12]}"
            print(line)
        print(f"{'TOTAL':44s} {'':>22s} {'':>9s} {total/2**20:9.2f}")
        if args.hash:
            print(f"model digest: {full.hexdigest()}")


def cmd_quantize(args):
    from vlut_tpu.convert.quantize import requantize

    cfg = requantize(args.src, args.dst, args.fmt)
    print(f"requantized -> {args.dst} ({cfg.weight_fmt})")


def cmd_generate(args):
    from vlut_tpu.runtime.engine import Engine, Request
    from vlut_tpu.runtime.sampling import SamplerParams
    from vlut_tpu.utils.tokenizer import Tokenizer

    cfg, params, _ = _load(args.model, overrides=args.override)
    if type(cfg).__name__ == "T5Config":
        # encoder-decoder path (reference: llama-cli on T5 = llama_encode
        # then the decoder loop)
        import time as _time

        import jax

        from vlut_tpu.models.t5 import generate as t5_generate
        from vlut_tpu.utils.tokenizer import Tokenizer as _Tok

        tok = _Tok(args.model)
        ids = tok.encode(args.prompt, add_bos=False)
        if cfg.eos_id is not None:
            ids = ids + [cfg.eos_id]
        params = jax.device_put(params)
        t0 = _time.time()
        out = t5_generate(params, cfg, ids, n_new=args.n_predict,
                          temp=args.temp, seed=getattr(args, 'seed', 0))
        dt = _time.time() - t0
        print(tok.decode(out))
        print(f"\n[{len(out)} tokens, {len(out) / max(dt, 1e-9):.1f} tok/s]")
        return
    if getattr(cfg, "causal_attn", True) is False:
        # diffusion LM (llada/dream/rnd1): iterative mask denoising
        # (reference examples/diffusion/diffusion-cli.cpp)
        import time as _time

        from vlut_tpu.runtime.diffusion import (
            DiffusionParams,
            diffusion_generate,
        )
        from vlut_tpu.train.finetune import float_twin_params
        from vlut_tpu.utils.tokenizer import Tokenizer as _Tok

        tok = _Tok(args.model)
        ids = tok.encode(args.prompt)
        pf = float_twin_params(params, cfg)
        dp = DiffusionParams(
            steps=getattr(args, "diffusion_steps", 0) or args.n_predict,
            alg=getattr(args, "diffusion_alg", "low_confidence"),
            temp=args.temp, seed=getattr(args, "seed", 0),
        )
        t0 = _time.time()
        out = diffusion_generate(pf, cfg, ids, args.n_predict, dp)
        dt = _time.time() - t0
        print(tok.decode(out))
        print(f"\n[{len(out)} tokens (diffusion, {dp.steps} steps), "
              f"{len(out) / max(dt, 1e-9):.1f} tok/s]")
        return
    if type(cfg).__name__ == "HybridConfig":
        # hybrid SSM+attention archs (jamba/falcon-h1/granite-hybrid):
        # full-recompute decode (parity-first; stateful decode would carry
        # conv/ssm state + KV like ssm.forward2)
        import time as _time

        import jax
        import jax.numpy as jnp

        from vlut_tpu.models.hybrid import forward as hybrid_forward
        from vlut_tpu.utils.tokenizer import Tokenizer as _Tok

        tok = _Tok(args.model)
        ids = tok.encode(args.prompt)
        key = jax.random.PRNGKey(getattr(args, "seed", 0))
        out = []
        t0 = _time.time()
        for _ in range(args.n_predict):
            lg = hybrid_forward(
                params, cfg, jnp.asarray([ids + out], jnp.int32)
            )[0, -1, : cfg.vocab_size]
            if args.temp > 0:
                key, sub = jax.random.split(key)
                nxt = int(jax.random.categorical(sub, lg / args.temp))
            else:
                nxt = int(jnp.argmax(lg))
            out.append(nxt)
            if nxt == tok.eos_id:
                break
        dt = _time.time() - t0
        print(tok.decode(out))
        print(f"\n[{len(out)} tokens, {len(out) / max(dt, 1e-9):.1f} tok/s]")
        return
    if type(cfg).__name__ in ("Rwkv7Config", "Rwkv6Config"):
        # attention-free RNN decode: O(1) state per token
        import time as _time

        import jax
        import jax.numpy as jnp

        if type(cfg).__name__ == "Rwkv6Config":
            from vlut_tpu.models.rwkv import forward6 as rwkv_forward
            from vlut_tpu.models.rwkv import init_state6 as rwkv_state
        else:
            from vlut_tpu.models.rwkv import forward as rwkv_forward
            from vlut_tpu.models.rwkv import init_state as rwkv_state
        from vlut_tpu.utils.tokenizer import Tokenizer as _Tok

        tok = _Tok(args.model)
        ids = tok.encode(args.prompt)
        st = rwkv_state(cfg, 1)
        lg, st = rwkv_forward(params, cfg, jnp.asarray([ids], jnp.int32), st)
        key = jax.random.PRNGKey(getattr(args, "seed", 0))
        out = []
        t0 = _time.time()
        cur = lg[0, -1, : cfg.vocab_size]
        for _ in range(args.n_predict):
            if args.temp > 0:
                key, sub = jax.random.split(key)
                nxt = int(jax.random.categorical(sub, cur / args.temp))
            else:
                nxt = int(jnp.argmax(cur))
            out.append(nxt)
            if nxt == tok.eos_id:
                break
            lg, st = rwkv_forward(
                params, cfg, jnp.asarray([[nxt]], jnp.int32), st
            )
            cur = lg[0, -1, : cfg.vocab_size]
        dt = _time.time() - t0
        print(tok.decode(out))
        print(f"\n[{len(out)} tokens, {len(out) / max(dt, 1e-9):.1f} tok/s]")
        return
    if type(cfg).__name__ == "Mamba2Config":
        # standalone mamba2 LM (codestral-mamba-style): recurrent greedy/
        # sampled decode, O(1) state per token
        import time as _time

        import jax
        import jax.numpy as jnp
        import numpy as np

        from vlut_tpu.models.ssm import forward2, init_state2
        from vlut_tpu.utils.tokenizer import Tokenizer as _Tok

        tok = _Tok(args.model)
        ids = tok.encode(args.prompt)
        st = init_state2(cfg, 1)
        lg, st = forward2(params, cfg, jnp.asarray([ids], jnp.int32), st,
                          logits_last_only=True)
        key = jax.random.PRNGKey(getattr(args, "seed", 0))
        out = []
        t0 = _time.time()
        cur = lg[:, -1, : cfg.vocab_size]
        for _ in range(args.n_predict):
            if args.temp > 0:
                key, sub = jax.random.split(key)
                nxt = int(jax.random.categorical(sub, cur[0] / args.temp))
            else:
                nxt = int(jnp.argmax(cur[0]))
            out.append(nxt)
            if nxt == tok.eos_id:
                break
            lg, st = forward2(
                params, cfg, jnp.asarray([[nxt]], jnp.int32), st
            )
            cur = lg[:, -1, : cfg.vocab_size]
        dt = _time.time() - t0
        print(tok.decode(out))
        print(f"\n[{len(out)} tokens, {len(out) / max(dt, 1e-9):.1f} tok/s]")
        return
    if getattr(args, "promote", None) and cfg.weight_fmt != args.promote:
        # serve-time format promotion (convert/quantize.py rationale):
        # i1 storage, i2 decode speed — exact trit repack at load
        from vlut_tpu.convert.quantize import requantize_params

        cfg, params = requantize_params(cfg, params, args.promote)
    # recurrent models (Mamba) go through the same Engine: per-slot
    # conv/ssm state replaces KV rows (runtime/engine.py _recurrent)
    if args.lora:
        from vlut_tpu.runtime.lora import apply_lora, load_peft_adapter

        adapter = load_peft_adapter(args.lora, cfg)
        params = apply_lora(params, adapter, scale=args.lora_scale)
    if args.control_vector:
        from vlut_tpu.runtime.lora import apply_cvector, load_cvector_file

        params = apply_cvector(
            params, load_cvector_file(args.control_vector, cfg),
            scale=args.control_vector_scale,
        )
    tok = Tokenizer(args.model)
    if getattr(args, "prompt_lookup", 0):
        # prompt-lookup (n-gram) speculative decoding (reference:
        # examples/lookup, common/ngram-cache.cpp) — no draft model;
        # exact greedy output
        import jax.numpy as jnp
        import numpy as np

        from vlut_tpu.models.transformer import (
            forward,
            fuse_projections,
            init_kv_cache,
            unstack_layers,
        )
        from vlut_tpu.runtime.speculative import make_lookup_fn

        p2 = unstack_layers(fuse_projections(params, cfg), cfg)
        ids = tok.encode(args.prompt)
        t, n = len(ids), args.n_predict
        k = args.prompt_lookup
        cache = init_kv_cache(
            cfg, 1, max_len=min(args.ctx, cfg.max_seq_len), layout="layers"
        )
        lg, cache = forward(
            p2, cfg, jnp.asarray([ids], jnp.int32),
            jnp.arange(t, dtype=jnp.int32)[None], cache,
            logits_at=jnp.asarray([t - 1], jnp.int32),
        )
        last = jnp.argmax(lg[:, 0, : cfg.vocab_size], -1).astype(jnp.int32)
        hist = np.zeros((1, 512), np.int32)
        hist[0, : t] = ids
        fn = make_lookup_fn(cfg, k, n - 1, ngram=2)
        t0 = time.time()
        out, cnt, accs, _ = fn(
            p2, cache, jnp.asarray(hist),
            jnp.asarray([t], jnp.int32), last,
            jnp.asarray([t], jnp.int32),
        )
        toks = [int(np.asarray(last)[0])] + [
            int(x) for x in np.asarray(out)[0][: n - 1]
        ]
        dt = time.time() - t0
        acc = np.asarray(accs)[:, 0]
        rounds = int((acc >= 0).sum()) if acc.size else 0
        print(tok.decode(toks))
        print(
            f"\n[{len(toks)} tokens, {len(toks)/dt:.1f} tok/s | "
            f"prompt-lookup k={k}, {rounds} rounds, "
            f"{int(acc[acc >= 0].sum())} drafts accepted]",
            file=sys.stderr,
        )
        return
    if args.lookahead:
        # draft-model-free lookahead decoding (reference:
        # examples/lookahead): device-side greedy, exact greedy output
        import jax.numpy as jnp
        import numpy as np

        from vlut_tpu.models.transformer import (
            forward,
            fuse_projections,
            init_kv_cache,
            unstack_layers,
        )
        from vlut_tpu.runtime.speculative import make_lookahead_fn

        p2 = unstack_layers(fuse_projections(params, cfg), cfg)
        ids = tok.encode(args.prompt)
        t, n = len(ids), args.n_predict
        cache = init_kv_cache(
            cfg, 1, max_len=min(args.ctx, cfg.max_seq_len), layout="layers"
        )
        lg, cache = forward(
            p2, cfg, jnp.asarray([ids], jnp.int32),
            jnp.arange(t, dtype=jnp.int32)[None], cache,
            logits_at=jnp.asarray([t - 1], jnp.int32),
        )
        last = jnp.argmax(lg[:, 0, : cfg.vocab_size], -1).astype(jnp.int32)
        fn = make_lookahead_fn(
            cfg, max_new=n - 1, window=args.lookahead_window,
            ngram=args.lookahead_ngram,
        )
        t0 = time.time()
        out, cnt, accs, _ = fn(
            p2, cache, last, jnp.asarray([t], jnp.int32)
        )
        toks = [int(np.asarray(last)[0])] + [
            int(x) for x in np.asarray(out)[0][: n - 1]
        ]
        int(np.asarray(cnt)[0])  # fence
        dt = time.time() - t0
        acc = np.asarray(accs)[:, 0]
        rounds = int((acc >= 0).sum()) if acc.size else 0
        print(tok.decode(toks))
        print(
            f"\n[{len(toks)} tokens, {len(toks)/dt:.1f} tok/s | lookahead "
            f"W={args.lookahead_window} N={args.lookahead_ngram}, "
            f"{acc.sum()} drafts accepted]",
            file=sys.stderr,
        )
        return
    draft = None
    if args.draft_model:
        d_cfg, d_params, _ = _load(args.draft_model)
        draft = (d_cfg, d_params)
    from vlut_tpu.parallel.sharding import mesh_from_flags

    eng = Engine(cfg, params, n_slots=max(1, args.dp), max_len=args.ctx,
                 kv_quant=(args.cache_type == "q8"),
                 head_quant=(args.head_type == "q8"),
                 draft=draft, k_draft=args.draft_k,
                 mesh=mesh_from_flags(args.tp, args.dp))
    bias = []
    for spec in args.logit_bias or ():
        t, _, b = spec.partition(":")
        bias.append((int(t), float(b)))
    sp = SamplerParams(
        temperature=args.temp, top_k=args.top_k, top_p=args.top_p,
        min_p=args.min_p, typical_p=args.typical,
        dynatemp_range=args.dynatemp_range,
        dynatemp_exponent=args.dynatemp_exp,
        xtc_p=args.xtc_probability, xtc_t=args.xtc_threshold,
        top_n_sigma=args.top_nsigma,
        mirostat_tau=(args.mirostat_ent if args.mirostat else 0.0),
        mirostat_eta=args.mirostat_lr,
        repeat_penalty=args.repeat_penalty,
        presence_penalty=args.presence_penalty,
        frequency_penalty=args.frequency_penalty,
        dry_multiplier=args.dry_multiplier, dry_base=args.dry_base,
        dry_allowed_length=args.dry_allowed_length,
        logit_bias=tuple(bias), seed=args.seed,
    )
    stop = (tok.eos_id,) if tok.eos_id is not None else ()
    grammar = None
    if args.grammar_file:
        grammar = tok.make_grammar(open(args.grammar_file).read())
    elif args.json_schema:
        import json

        from vlut_tpu.runtime.grammar import json_schema_to_gbnf

        grammar = tok.make_grammar(
            json_schema_to_gbnf(json.loads(args.json_schema))
        )
    req = Request(
        prompt=tok.encode(args.prompt), max_new_tokens=args.n_predict,
        sampler=sp, stop_tokens=stop, grammar=grammar,
    )
    t0 = time.time()
    eng.run([req])
    dt = time.time() - t0
    print(tok.decode(req.output))
    print(
        f"\n[{len(req.output)} tokens, {len(req.output)/dt:.1f} tok/s | "
        f"{eng.perf.summary()}]", file=sys.stderr,
    )


def cmd_describe(args):
    """llava-style image+prompt completion (reference: tools/mtmd CLI):
    encode the image, splice its projected embeddings between the prompt
    halves (split on <image>, or prepended), prefill with injected
    embeddings, then greedy-decode normally."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vlut_tpu.models.transformer import forward, init_kv_cache
    from vlut_tpu.models.vision import build_multimodal_embeds
    from vlut_tpu.utils.tokenizer import Tokenizer

    cfg, params, _ = _load(args.model)
    tok = Tokenizer(args.model)
    deepstack = None
    if getattr(args, "audio", None):
        # audio branch (reference: mtmd-cli with an audio file): log-mel +
        # whisper encoder + projector from an audio-encoder dir
        from vlut_tpu.models.audio import encode as encode_audio
        from vlut_tpu.models.audio import load_audio_encoder, load_wav, log_mel

        acfg, aparams = load_audio_encoder(args.audio_encoder)
        samples = load_wav(args.audio, acfg)
        img_embeds = encode_audio(
            aparams, acfg, jnp.asarray(log_mel(samples, acfg))
        )
        marker = "<audio>"
    else:
        # auto-dispatch across every converted tower family (clip/llava,
        # gemma3-siglip, pixtral, qwen-vl, internvl, llama4-vision,
        # idefics3, glm4v, janus-pro, lfm2-vl) — models/vision.py
        from vlut_tpu.models.vision import encode_image_auto

        img_embeds, family = encode_image_auto(args.model, args.image)
        if img_embeds is None:
            raise SystemExit("checkpoint has no vision tower (convert a "
                             "multimodal model)")
        deepstack = None
        if isinstance(family, tuple):  # qwen3vl: (name, deepstack feats)
            family, deepstack = family
        print(f"[vision tower: {family}]", file=sys.stderr)
        marker = "<image>"

    prompt = args.prompt
    pre_txt, _, post_txt = prompt.partition(marker)
    prefix = tok.encode(pre_txt) if pre_txt else tok.encode("")
    suffix = tok.encode(post_txt, add_bos=False) if post_txt else []
    embeds = build_multimodal_embeds(params, img_embeds, prefix, suffix)
    t = embeds.shape[0]

    cache = init_kv_cache(cfg, 1, max_len=t + args.n_predict + 8)
    pos = jnp.arange(t, dtype=jnp.int32)[None]
    ds_planes = None
    if deepstack is not None:
        # scatter each deepstack merger's features over the image span
        # (rows len(prefix) .. len(prefix)+n_img) and add them to the
        # early layers' hidden states (forward deepstack_embeds)
        n_img = img_embeds.shape[0]
        off = len(prefix)
        ds_planes = tuple(
            jnp.zeros((1, t, embeds.shape[-1]), jnp.float32)
            .at[0, off : off + n_img].set(d.astype(jnp.float32))
            for d in deepstack
        )
    logits, cache = forward(
        params, cfg, jnp.zeros((1, t), jnp.int32), pos, cache,
        token_embeds=embeds[None],
        logits_at=jnp.asarray([t - 1], jnp.int32),
        deepstack_embeds=ds_planes,
    )
    last = jnp.argmax(logits[0, 0, : cfg.vocab_size]).astype(jnp.int32)

    out = [int(last)]
    ln = t
    eos = tok.eos_id
    t0 = time.time()
    for _ in range(args.n_predict - 1):
        lg, cache = forward(
            params, cfg, jnp.asarray([[out[-1]]], jnp.int32),
            jnp.asarray([[ln]], jnp.int32), cache,
        )
        nxt = int(jnp.argmax(lg[0, 0, : cfg.vocab_size]))
        out.append(nxt)
        ln += 1
        if eos is not None and nxt == eos:
            break
    dt = time.time() - t0
    print(tok.decode(out))
    print(f"\n[{len(out)} tokens, {len(out)/max(dt,1e-9):.1f} tok/s | "
          f"{img_embeds.shape[0]} media tokens]", file=sys.stderr)


def cmd_batched(args):
    """Shared-prompt fan-out: one prompt, np parallel continuations
    (reference examples/batched/batched.cpp demo config)."""
    import jax
    import jax.numpy as jnp

    from vlut_tpu.models.transformer import forward, init_kv_cache
    from vlut_tpu.runtime.generate import make_generate_fn
    from vlut_tpu.runtime.sampling import SamplerParams, stack_params
    from vlut_tpu.utils.tokenizer import Tokenizer

    cfg, params, _ = _load(args.model)
    tok = Tokenizer(args.model)
    ids = tok.encode(args.prompt)
    b, t = args.np_parallel, len(ids)

    cache = init_kv_cache(cfg, b, max_len=t + args.n_predict + 8)
    tokens = jnp.tile(jnp.asarray(ids, jnp.int32)[None], (b, 1))
    pos = jnp.tile(jnp.arange(t, dtype=jnp.int32), (b, 1))
    logits, cache = forward(
        params, cfg, tokens, pos, cache,
        logits_at=jnp.full((b,), t - 1, jnp.int32),
    )
    from vlut_tpu.runtime.sampling import features_of

    samplers = [
        SamplerParams(temperature=args.temp, seed=i,
                      repeat_penalty=args.repeat_penalty)
        for i in range(b)
    ]
    sp = stack_params(samplers)
    last = jnp.argmax(
        logits[:, 0, : cfg.vocab_size], -1
    ).astype(jnp.int32)
    gen = make_generate_fn(cfg, n_steps=args.n_predict,
                           features=features_of(samplers))
    t0 = time.time()
    out, _ = gen(params, cache, last,
                 jnp.full((b,), t, jnp.int32), sp,
                 jax.random.PRNGKey(args.seed))
    out.block_until_ready()
    dt = time.time() - t0
    import numpy as np

    for i, row in enumerate(np.asarray(out)):
        print(f"--- seq {i} ---")
        print(args.prompt + tok.decode([int(x) for x in row]))
    total = b * args.n_predict
    print(f"\n[{total} tokens in {dt:.2f}s = {total/dt:.1f} tok/s]",
          file=sys.stderr)


def cmd_serve(args):
    from vlut_tpu.serving.server import main as server_main

    server_main([
        "--model", args.model, "--host", args.host,
        "--port", str(args.port), "--slots", str(args.slots),
        "--ctx", str(args.ctx),
        "--tp", str(args.tp), "--dp", str(args.dp),
    ])


def cmd_bench(args):
    from vlut_tpu.bench.kernels import main as bench_main

    argv = []
    if args.model_shape:
        argv += ["-m", args.model_shape]
    argv += ["-ns", args.ns, "--fmt", args.fmt]
    bench_main(argv)


def cmd_ppl(args):
    import numpy as np

    from vlut_tpu.eval.perplexity import logits_compare, perplexity
    from vlut_tpu.utils.tokenizer import Tokenizer

    cfg, params, _ = _load(args.model)
    tok = Tokenizer(args.model)
    text = open(args.file).read()
    ids = np.asarray(tok.encode(text), np.int32)
    if args.save_logits:
        from vlut_tpu.eval.tasks import save_logits

        save_logits(params, cfg, ids, args.save_logits, window=args.window)
        print(f"saved base logits to {args.save_logits}")
        return
    if args.kl_base:
        from vlut_tpu.eval.tasks import kl_vs_saved

        out = kl_vs_saved(params, cfg, args.kl_base)
        print(json.dumps(out, indent=2))
        return
    out = perplexity(params, cfg, ids, window=args.window)
    print(f"ppl = {out['ppl']:.4f} over {out['tokens']} tokens")
    if args.check_lossless:
        cmp = logits_compare(params, cfg, ids)
        print(f"quantized-vs-dequant: KL mean {cmp['kl_mean']:.3e}, "
              f"top1 {cmp['top1_agreement']*100:.2f}%")


def cmd_eval(args):
    from vlut_tpu.eval import tasks as T
    from vlut_tpu.utils.tokenizer import Tokenizer

    cfg, params, _ = _load(args.model)
    tok = Tokenizer(args.model)
    fn = {
        "hellaswag": T.hellaswag_eval,
        "winogrande": T.winogrande_eval,
        "mc": T.multiple_choice_eval,
    }[args.task]
    out = fn(params, cfg, tok, args.file, limit=args.limit)
    print(json.dumps(out, indent=2))


def cmd_bench_sweep(args):
    from vlut_tpu.bench.e2e import main as e2e_main

    e2e_main(["sweep"] + args.rest)


def cmd_batched_bench(args):
    from vlut_tpu.bench.e2e import main as e2e_main

    e2e_main(["batched"] + args.rest)


def cmd_tts(args):
    """OuteTTS pipeline: text -> audio codes -> WAV (tools/tts/tts.cpp)."""
    import json as _json

    from vlut_tpu.models.vocoder import load_vocoder
    from vlut_tpu.runtime.tts import save_wav, synthesize
    from vlut_tpu.utils.tokenizer import Tokenizer

    cfg, params, _ = _load(args.model, overrides=args.override)
    tok = Tokenizer(args.model)
    voc_cfg, voc_params = load_vocoder(args.vocoder)
    speaker = None
    if args.speaker:
        with open(args.speaker) as f:
            speaker = _json.load(f)
    t0 = time.time()
    audio = synthesize(
        cfg, params, tok, args.prompt, voc_cfg, voc_params,
        speaker=speaker, use_guide_tokens=args.guide_tokens,
        n_predict=args.n_predict, top_k=args.top_k, seed=args.seed,
        code_offset=args.code_offset,
    )
    save_wav(args.output, audio, voc_cfg.sample_rate)
    dur = audio.shape[0] / voc_cfg.sample_rate
    print(f"wrote {args.output}: {dur:.2f}s audio in {time.time()-t0:.1f}s")


def cmd_convert_vocoder(args):
    from vlut_tpu.models.vocoder import convert_hf_vocoder

    cfg = convert_hf_vocoder(args.src, args.dst)
    print(f"vocoder -> {args.dst}: {cfg}")


def cmd_convert_audio(args):
    from vlut_tpu.models.audio import convert_hf_audio

    cfg = convert_hf_audio(args.src, args.dst, d_llm=args.d_llm)
    print(f"audio encoder -> {args.dst}: {cfg}")


def main(argv=None):
    ap = argparse.ArgumentParser(prog="vlut-tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("convert")
    p.add_argument("hf_dir")
    p.add_argument("out_dir")
    p.add_argument("--fmt", choices=("i2", "i1"), default="i2")
    p.set_defaults(fn=cmd_convert)

    p = sub.add_parser("inspect", help="checkpoint tensor directory + hash")
    p.add_argument("ckpt")
    p.add_argument("--hash", action="store_true")
    p.set_defaults(fn=cmd_inspect)

    p = sub.add_parser("quantize",
                       help="requantize native checkpoint (i2 <-> i1)")
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--fmt", choices=("i2", "i1"), required=True)
    p.set_defaults(fn=cmd_quantize)

    p = sub.add_parser("generate")
    p.add_argument("--model", required=True)
    p.add_argument("-p", "--prompt", required=True)
    p.add_argument("-n", "--n-predict", type=int, default=128)
    p.add_argument("--ctx", type=int, default=4096)
    p.add_argument("--temp", type=float, default=0.8)
    p.add_argument("--top-k", type=int, default=40)
    p.add_argument("--top-p", type=float, default=0.95)
    p.add_argument("--min-p", type=float, default=0.0)
    p.add_argument("--typical", type=float, default=1.0)
    p.add_argument("--dynatemp-range", type=float, default=0.0)
    p.add_argument("--dynatemp-exp", type=float, default=1.0)
    p.add_argument("--xtc-probability", type=float, default=0.0)
    p.add_argument("--xtc-threshold", type=float, default=0.1)
    p.add_argument("--top-nsigma", type=float, default=0.0)
    p.add_argument("--mirostat", type=int, default=0, choices=(0, 2),
                   help="0=off, 2=mirostat v2")
    p.add_argument("--mirostat-ent", type=float, default=5.0,
                   help="mirostat target entropy tau")
    p.add_argument("--mirostat-lr", type=float, default=0.1,
                   help="mirostat learning rate eta")
    p.add_argument("--repeat-penalty", type=float, default=1.0)
    p.add_argument("--presence-penalty", type=float, default=0.0)
    p.add_argument("--frequency-penalty", type=float, default=0.0)
    p.add_argument("--dry-multiplier", type=float, default=0.0)
    p.add_argument("--dry-base", type=float, default=1.75)
    p.add_argument("--dry-allowed-length", type=int, default=2)
    p.add_argument("-l", "--logit-bias", action="append", default=[],
                   metavar="TOKEN:BIAS")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--grammar-file", default=None,
                   help="GBNF grammar constraining generation")
    p.add_argument("--json-schema", default=None,
                   help="JSON schema constraining generation (via GBNF)")
    p.add_argument("--lora", default=None,
                   help="HF PEFT LoRA adapter directory")
    p.add_argument("--lora-scale", type=float, default=1.0)
    p.add_argument("--control-vector", default=None,
                   help="control-vector file (.safetensors/.npz)")
    p.add_argument("--control-vector-scale", type=float, default=1.0)
    p.add_argument("--cache-type", choices=("bf16", "q8"),
                   default="bf16")
    p.add_argument("--head-type", choices=("bf16", "q8"), default="bf16",
                   help="output head precision (q8 halves head bandwidth)")
    p.add_argument("--draft-model", default=None,
                   help="draft checkpoint for speculative decoding")
    p.add_argument("--draft-k", type=int, default=4)
    p.add_argument("--promote", choices=("i2", "i1"), default=None,
                   help="repack weights to this format at load (i1 "
                        "checkpoints serve ~1.7x faster promoted to i2)")
    p.add_argument("--lookahead", action="store_true",
                   help="draft-free windowed lookahead decoding (greedy)")
    p.add_argument("--prompt-lookup", type=int, default=0, metavar="K",
                   help="prompt-lookup (n-gram) speculative decoding "
                        "with K drafted tokens per round (greedy; "
                        "reference examples/lookup)")
    p.add_argument("--lookahead-window", type=int, default=8,
                   help="Jacobi window branches (lookahead W)")
    p.add_argument("--lookahead-ngram", type=int, default=3,
                   help="n-gram length (lookahead N)")
    p.add_argument("--diffusion-steps", type=int, default=0,
                   help="denoise iterations for diffusion checkpoints "
                        "(0 = n_predict)")
    p.add_argument("--diffusion-alg", default="low_confidence",
                   choices=("low_confidence", "entropy", "margin",
                            "random"),
                   help="unmask-ranking rule (examples/diffusion algs)")
    p.add_argument("--override", action="append", default=[],
                   metavar="KEY=VALUE",
                   help="override a model config field (repeatable)")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel ways (Megatron weight shard; "
                        "reference --split-mode row analog)")
    p.add_argument("--dp", type=int, default=1,
                   help="data-parallel ways (one slot per dp rank)")
    p.set_defaults(fn=cmd_generate)

    p = sub.add_parser("embed",
                       help="pooled embeddings (tools/embedding analog)")
    p.add_argument("--model", required=True)
    p.add_argument("-p", "--prompt", action="append")
    p.add_argument("--task", default=None,
                   help="jina-v3 task adapter (retrieval/classification/...)")
    p.add_argument("--json", action="store_true")
    p.set_defaults(fn=cmd_embed)

    p = sub.add_parser("describe",
                       help="image|audio + prompt (mtmd-cli analog)")
    p.add_argument("--model", required=True)
    p.add_argument("--image")
    p.add_argument("--audio", help="WAV file (whisper-encoder path)")
    p.add_argument("--audio-encoder",
                   help="audio-encoder dir (convert-audio output)")
    p.add_argument("-p", "--prompt", default="<image>Describe this image.")
    p.add_argument("-n", "--n-predict", type=int, default=64)
    p.set_defaults(fn=cmd_describe)

    p = sub.add_parser("convert-audio",
                       help="HF whisper/ultravox audio tower -> encoder dir")
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--d-llm", type=int, default=4096)
    p.set_defaults(fn=cmd_convert_audio)

    p = sub.add_parser("batched")
    p.add_argument("--model", required=True)
    p.add_argument("-p", "--prompt", required=True)
    p.add_argument("-np", "--np-parallel", type=int, default=32)
    p.add_argument("-n", "--n-predict", type=int, default=16)
    p.add_argument("--temp", type=float, default=0.5)
    p.add_argument("--repeat-penalty", type=float, default=1.5)
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=cmd_batched)

    p = sub.add_parser("serve")
    p.add_argument("--model", required=True)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--slots", type=int, default=8)
    p.add_argument("--ctx", type=int, default=4096)
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel ways across visible devices")
    p.add_argument("--dp", type=int, default=1,
                   help="data-parallel ways (slots shard over chips)")
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("bench")
    p.add_argument("-m", "--model-shape", default=None)
    p.add_argument("-ns", default="32,256")
    p.add_argument("--fmt", default="i2,i1")
    p.set_defaults(fn=cmd_bench)

    p = sub.add_parser("ppl")
    p.add_argument("--model", required=True)
    p.add_argument("-f", "--file", required=True)
    p.add_argument("--window", type=int, default=512)
    p.add_argument("--check-lossless", action="store_true")
    p.add_argument("--save-logits", default=None,
                   help="save fp16 base logits for later --kl-base runs")
    p.add_argument("--kl-base", default=None,
                   help="compare against logits saved via --save-logits")
    p.set_defaults(fn=cmd_ppl)

    p = sub.add_parser("eval", help="accuracy tasks (perplexity.cpp analog)")
    p.add_argument("--model", required=True)
    p.add_argument("--task", choices=("hellaswag", "winogrande", "mc"),
                   required=True)
    p.add_argument("-f", "--file", required=True)
    p.add_argument("--limit", type=int, default=None)
    p.set_defaults(fn=cmd_eval)

    p = sub.add_parser("bench-sweep", help="llama-bench analog")
    p.add_argument("rest", nargs=argparse.REMAINDER)
    p.set_defaults(fn=cmd_bench_sweep)

    p = sub.add_parser("batched-bench", help="batched-bench analog")
    p.add_argument("rest", nargs=argparse.REMAINDER)
    p.set_defaults(fn=cmd_batched_bench)

    p = sub.add_parser("tts", help="text-to-speech (tools/tts analog)")
    p.add_argument("--model", required=True, help="text-to-codes checkpoint")
    p.add_argument("--vocoder", required=True, help="vocoder dir "
                   "(convert-vocoder output)")
    p.add_argument("-p", "--prompt", required=True)
    p.add_argument("-o", "--output", default="output.wav")
    p.add_argument("--speaker", help="speaker profile JSON (OuteTTS format)")
    p.add_argument("--guide-tokens", action="store_true",
                   help="force word-initial tokens after newlines")
    p.add_argument("-n", "--n-predict", type=int, default=4096)
    p.add_argument("--top-k", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--code-offset", type=int, default=None,
                   help="first audio-code token id (default: detect <|0|>)")
    p.add_argument("--override", action="append", default=[])
    p.set_defaults(fn=cmd_tts)

    p = sub.add_parser("convert-vocoder",
                       help="HF WavTokenizer decoder -> vocoder dir")
    p.add_argument("src")
    p.add_argument("dst")
    p.set_defaults(fn=cmd_convert_vocoder)

    args = ap.parse_args(argv)
    _enable_compile_cache()
    args.fn(args)


if __name__ == "__main__":
    main()

"""Accuracy tasks: HellaSwag / Winogrande / multiple-choice + KL-vs-saved
logits (reference: tools/perplexity/perplexity.cpp — hellaswag :741,
winogrande, multiple-choice, and the --kl-divergence mode :173-259).

Dataset handling matches the reference's: tasks come from local files (the
reference downloads hellaswag_val_full etc. via scripts/; this container has
no egress, so files are provided by the caller).  Formats accepted:
JSON-lines with {"ctx": str, "endings": [str...], "label": int} per line
(hellaswag style) or {"sentence": str, "option1": str, "option2": str,
"answer": 1|2} (winogrande style).
"""

from __future__ import annotations

import json
import pathlib
from typing import Any, Sequence

import numpy as np

from vlut_tpu.config import ModelConfig
from vlut_tpu.eval.perplexity import window_logprobs


def score_continuations(
    params: dict[str, Any],
    cfg: ModelConfig,
    context_ids: Sequence[int],
    choices_ids: Sequence[Sequence[int]],
    impl: str = "auto",
    normalize: str = "tokens",  # "none" | "tokens" (length-normalized)
) -> list[float]:
    """Log-likelihood of each choice continuation given the context — the
    scoring primitive all the multiple-choice tasks share (perplexity.cpp
    evaluates each ending's logprob over the shared context)."""
    scores = []
    nctx = len(context_ids)
    for ch in choices_ids:
        ids = np.asarray(list(context_ids) + list(ch), np.int32)
        lp = window_logprobs(params, cfg, ids, impl=impl)
        tail = lp[nctx - 1 :]  # logprobs of the choice tokens
        s = float(tail.sum())
        if normalize == "tokens" and len(tail):
            s /= len(tail)
        scores.append(s)
    return scores


def _load_jsonl(path: str | pathlib.Path) -> list[dict]:
    items = []
    for line in pathlib.Path(path).read_text().splitlines():
        line = line.strip()
        if line:
            items.append(json.loads(line))
    return items


def hellaswag_eval(
    params, cfg, tokenizer, path, limit: int | None = None,
    impl: str = "auto",
) -> dict[str, float]:
    """Accuracy over hellaswag-style items: pick the ending with the best
    length-normalized log-likelihood."""
    items = _load_jsonl(path)[:limit]
    correct = 0
    for it in items:
        ctx = tokenizer.encode(it["ctx"])
        endings = [
            tokenizer.encode(" " + e, add_bos=False) for e in it["endings"]
        ]
        scores = score_continuations(params, cfg, ctx, endings, impl=impl)
        if int(np.argmax(scores)) == int(it["label"]):
            correct += 1
    n = max(len(items), 1)
    return {"task": "hellaswag", "acc": correct / n, "n": len(items)}


def winogrande_eval(
    params, cfg, tokenizer, path, limit: int | None = None,
    impl: str = "auto",
) -> dict[str, float]:
    """Winogrande: fill `_` with each option, score the full sentence
    (the reference scores the post-blank continuation given each filled
    prefix; whole-sentence LL is equivalent for argmax)."""
    items = _load_jsonl(path)[:limit]
    correct = 0
    for it in items:
        sent = it["sentence"]
        opts = [it["option1"], it["option2"]]
        scores = []
        for o in opts:
            ids = tokenizer.encode(sent.replace("_", o))
            lp = window_logprobs(params, cfg, np.asarray(ids, np.int32),
                                 impl=impl)
            scores.append(float(lp.mean()))
        if int(np.argmax(scores)) + 1 == int(it["answer"]):
            correct += 1
    n = max(len(items), 1)
    return {"task": "winogrande", "acc": correct / n, "n": len(items)}


def multiple_choice_eval(
    params, cfg, tokenizer, path, limit: int | None = None,
    impl: str = "auto",
) -> dict[str, float]:
    """Generic MC: {"question": str, "choices": [str...], "answer": int}."""
    items = _load_jsonl(path)[:limit]
    correct = 0
    for it in items:
        ctx = tokenizer.encode(it["question"])
        choices = [
            tokenizer.encode(" " + c, add_bos=False) for c in it["choices"]
        ]
        scores = score_continuations(params, cfg, ctx, choices, impl=impl)
        if int(np.argmax(scores)) == int(it["answer"]):
            correct += 1
    n = max(len(items), 1)
    return {"task": "multiple_choice", "acc": correct / n, "n": len(items)}


# --- KL divergence vs saved logits (perplexity.cpp:173-259) -------------------


def save_logits(
    params, cfg, tokens: np.ndarray, path: str | pathlib.Path,
    window: int = 512, impl: str = "auto",
) -> None:
    """Run the model over the token stream and save fp16 logits — the base
    file for later KL comparisons (reference --kl-divergence-base)."""
    import jax.numpy as jnp

    from vlut_tpu.models.transformer import forward

    tokens = np.asarray(tokens, np.int32)
    n = (len(tokens) // window) * window
    outs = []
    for i in range(0, n, window):
        chunk = jnp.asarray(tokens[i : i + window])[None]
        pos = jnp.arange(window, dtype=jnp.int32)[None]
        lg, _ = forward(params, cfg, chunk, pos, None, impl=impl)
        outs.append(
            np.asarray(lg[0, :, : cfg.vocab_size], np.float16)
        )
    np.savez_compressed(
        path, tokens=tokens[:n], logits=np.concatenate(outs, 0),
        window=window,
    )


def kl_vs_saved(
    params, cfg, path: str | pathlib.Path, impl: str = "auto",
) -> dict[str, float]:
    """KL(current || saved) + top-1 agreement over the saved token stream."""
    import jax
    import jax.numpy as jnp

    from vlut_tpu.models.transformer import forward

    data = np.load(path)
    tokens, base, window = data["tokens"], data["logits"], int(data["window"])
    kls, agree, nlls_a, nlls_b = [], [], [], []
    for i in range(0, len(tokens), window):
        chunk = jnp.asarray(tokens[i : i + window])[None]
        pos = jnp.arange(window, dtype=jnp.int32)[None]
        lg, _ = forward(params, cfg, chunk, pos, None, impl=impl)
        la = np.asarray(lg[0, :, : cfg.vocab_size], np.float32)
        lb = base[i : i + window].astype(np.float32)
        pa = jax.nn.log_softmax(jnp.asarray(la), -1)
        pb = jax.nn.log_softmax(jnp.asarray(lb), -1)
        kl = jnp.sum(jnp.exp(pa) * (pa - pb), -1)
        kls.append(np.asarray(kl))
        agree.append(la.argmax(-1) == lb.argmax(-1))
        tgt = tokens[i + 1 : i + window]
        nlls_a.append(-np.asarray(pa)[np.arange(len(tgt)), tgt])
        nlls_b.append(-np.asarray(pb)[np.arange(len(tgt)), tgt])
    kl = np.concatenate(kls)
    return {
        "kl_mean": float(kl.mean()),
        "kl_max": float(kl.max()),
        "kl_p99": float(np.percentile(kl, 99)),
        "top1_agreement": float(np.concatenate(agree).mean()),
        "ppl": float(np.exp(np.concatenate(nlls_a).mean())),
        "ppl_base": float(np.exp(np.concatenate(nlls_b).mean())),
        "tokens": int(kl.size),
    }

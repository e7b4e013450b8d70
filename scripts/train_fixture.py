#!/usr/bin/env python
"""Train and commit a REAL (non-random) tiny ternary model fixture.

The reference's credibility loop is convert -> quantize -> perplexity on
real checkpoints (tools/perplexity/perplexity.cpp:173-259, ci/run.sh).
This container has no network, so the "real model" is produced in-repo:
a byte-level BitNet-arch transformer QAT-trained (train/finetune.py, STE
absmean ternarization — the BitNet recipe) on the repository's own text
(README/SURVEY + package sources: genuine English + Python, ~1 MB).

Outputs tests/fixtures/tiny_real/ (packed ternary checkpoint + tokenizer)
and prints train/held-out stats; tests/test_real_fixture.py then runs the
full evaluation loop against the committed fixture in CI:
perplexity (far below the 256-uniform ceiling), quantized-vs-dequant KL,
and engine generation.

Run:  VLUT_PLATFORM=cpu python scripts/train_fixture.py [--steps 400]
"""

import argparse
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def load_corpus() -> bytes:
    parts = []
    for pat in ("README.md", "SURVEY.md", "PERF.md"):
        p = REPO / pat
        if p.exists():
            parts.append(p.read_bytes())
    for p in sorted((REPO / "vlut_tpu").rglob("*.py")):
        parts.append(p.read_bytes())
    data = b"\n".join(parts)
    # byte-level vocab: clamp to [0, 256)
    return data


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=128)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--out", default=str(REPO / "tests/fixtures/tiny_real"))
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax

    from vlut_tpu.config import ModelConfig
    from vlut_tpu.models.transformer import init_params
    from vlut_tpu.train.finetune import (
        causal_lm_loss,
        float_twin_params,
        make_train_step,
        pack_params,
    )

    cfg = ModelConfig(
        arch="bitnet", vocab_size=256, d_model=128, n_layers=2, n_heads=4,
        n_kv_heads=2, d_ff=384, max_seq_len=256, use_subnorms=True,
        weight_fmt="i2", tie_embeddings=False,
    )
    data = np.frombuffer(load_corpus(), np.uint8).astype(np.int32)
    split = int(len(data) * 0.95)
    train, held = data[:split], data[split:]
    print(f"corpus: {len(data)} bytes ({split} train / {len(held)} held)")

    params = float_twin_params(init_params(cfg, seed=0), cfg)
    opt = optax.adamw(args.lr)
    opt_state = opt.init(params)
    step = make_train_step(cfg, opt, qat=True)

    rng = np.random.default_rng(0)
    t0 = time.time()
    first_loss = None
    for i in range(args.steps):
        starts = rng.integers(0, len(train) - args.seq - 1, args.batch)
        toks = np.stack([train[s : s + args.seq] for s in starts])
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(toks), None
        )
        if i == 0:
            first_loss = float(loss)
        if i % 50 == 0 or i == args.steps - 1:
            print(f"step {i}: loss {float(loss):.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
    final_loss = float(loss)

    # pack the trained twin into the shipping ternary format
    packed = pack_params(params, cfg)
    from vlut_tpu.convert.checkpoint import save_checkpoint

    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    # byte-level tokenizer (same scheme as the serving fixture)
    from tokenizers import Tokenizer as HFTok, models
    from tokenizers.pre_tokenizers import Split
    from transformers import PreTrainedTokenizerFast

    vocab = {
        chr(i) if 32 <= i < 127 else f"<0x{i:02X}>": i for i in range(256)
    }
    t = HFTok(models.WordLevel(vocab, unk_token="<0x00>"))
    t.pre_tokenizer = Split("", "isolated")
    fast = PreTrainedTokenizerFast(
        tokenizer_object=t, unk_token="<0x00>", eos_token="<0x01>",
        bos_token="<0x02>",
    )
    tok_dir = out / "_tok"
    fast.save_pretrained(str(tok_dir))
    save_checkpoint(str(out), cfg, packed, tokenizer_src=str(tok_dir))
    import shutil

    shutil.rmtree(tok_dir)

    # held-out ppl of the packed model
    from vlut_tpu.eval.perplexity import perplexity

    n_eval = min(len(held) - 1, 2048)
    ppl = perplexity(packed, cfg, held[:n_eval], window=args.seq)["ppl"]
    print(f"train loss: {first_loss:.3f} -> {final_loss:.3f}")
    print(f"held-out ppl (packed ternary): {ppl:.2f} "
          f"(uniform-256 ceiling = 256)")
    (out / "TRAIN_REPORT.txt").write_text(
        f"steps={args.steps} batch={args.batch} seq={args.seq}\n"
        f"train loss {first_loss:.3f} -> {final_loss:.3f}\n"
        f"held-out ppl (packed) {ppl:.3f}\n"
        f"corpus bytes {len(data)}\n"
    )
    print(f"fixture written to {out}")


if __name__ == "__main__":
    main()

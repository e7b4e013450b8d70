#!/usr/bin/env python
"""Grammar-constrained decode host cost (VERDICT r4 item 7).

The per-token mask is a host-side trie DFS over the vocab
(runtime/grammar.py GrammarSampler.mask, called per step by
runtime/engine.py).  The reference pays this in C++
(src/llama-grammar.cpp llama_grammar_apply_impl); the question is whether
the Python walk eats a visible share of a 3.4 ms TPU decode step.

Measures mask+accept latency per generated token for:
  * the real tiny fixture tokenizer (tests/fixtures/tiny_real)
  * a synthetic 128k-piece vocab (llama3-scale worst case; pieces drawn
    from natural-text fragments, so trie fan-out matches a real BPE)
under a JSON-schema grammar (the /completion json_schema path) and a
small GBNF.  Host-only: runs anywhere, and the host here IS the machine
driving the TPU, so the numbers compose with PERF.md step times.
"""

import json
import pathlib
import random
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from vlut_tpu.runtime.grammar import (  # noqa: E402
    GrammarSampler,
    VocabTrie,
    json_schema_to_gbnf,
)

SCHEMA = {
    "type": "object",
    "properties": {
        "name": {"type": "string"},
        "age": {"type": "integer"},
        "tags": {"type": "array", "items": {"type": "string"}},
    },
    "required": ["name", "age"],
}

GBNF_LIST = r'''
root ::= "[" ws item ("," ws item)* ws "]"
item ::= "\"" [a-z]+ "\""
ws ::= [ \t\n]*
'''


def synth_vocab(n=128_256, seed=0):
    rng = random.Random(seed)
    words = (
        "the of and to in is was he for it with as his on be at by i "
        "this had not are but from or have an they which one you were "
        "all her she there would their we him been has when who will no "
        "name age tags json data value true false null string number"
    ).split()
    pieces = [""] * 3  # specials
    seen = set(pieces)
    while len(pieces) < n:
        w = rng.choice(words)
        form = rng.random()
        if form < 0.45:
            p = " " + w
        elif form < 0.7:
            p = w[: rng.randint(1, len(w))]
        elif form < 0.85:
            p = rng.choice('{}[]",:. \n0123456789')
        else:
            p = " " + w.capitalize() + rng.choice(["", "s", "ed", "ing"])
        p = p + str(len(pieces) % 97) if p in seen and form >= 0.99 else p
        if p in seen:
            p = p + chr(0x100 + len(pieces) % 4096)
        seen.add(p)
        pieces.append(p)
    return pieces


def drive(pieces, gbnf, n_tokens=64, label=""):
    trie_t0 = time.perf_counter()
    trie = VocabTrie(pieces)
    trie_dt = time.perf_counter() - trie_t0
    s = GrammarSampler(gbnf, pieces, eos_ids=(1,), trie=trie)
    rng = random.Random(0)
    mask_times, acc_times = [], []
    produced = 0
    for _ in range(n_tokens):
        t0 = time.perf_counter()
        m = s.mask()
        mask_times.append(time.perf_counter() - t0)
        cand = [i for i in range(len(pieces)) if m[i] and i != 1]
        if not cand:
            break
        tid = rng.choice(cand)
        t0 = time.perf_counter()
        s.accept(tid)
        acc_times.append(time.perf_counter() - t0)
        produced += 1
    mask_ms = sorted(mask_times)
    med = mask_ms[len(mask_ms) // 2] * 1e3
    mx = max(mask_ms) * 1e3
    acc = (sum(acc_times) / max(len(acc_times), 1)) * 1e3
    print(f"{label}: V={len(pieces)} trie-build {trie_dt*1e3:.0f} ms | "
          f"mask median {med:.2f} ms, max {mx:.2f} ms | accept avg "
          f"{acc:.3f} ms | {produced} tokens", flush=True)
    return med


def main():
    fx = pathlib.Path(__file__).parent.parent / "tests/fixtures/tiny_real"
    if fx.exists():
        from vlut_tpu.utils.tokenizer import Tokenizer

        tok = Tokenizer(str(fx))
        pieces = tok.pieces()
        drive(pieces, json_schema_to_gbnf(SCHEMA),
              label="fixture json-schema")
        drive(pieces, GBNF_LIST, label="fixture gbnf-list")
    pieces = synth_vocab()
    med = drive(pieces, json_schema_to_gbnf(SCHEMA),
                label="128k json-schema")
    drive(pieces, GBNF_LIST, label="128k gbnf-list")
    step_ms = 3.44  # b=1 decode step, PERF.md
    print(f"\nb=1 share: mask {med:.2f} ms per token vs {step_ms} ms "
          f"step = {med / step_ms * 100:.0f}% overhead "
          f"(the engine masks ONLY grammar-bound slots; unconstrained "
          f"slots pay zero)", flush=True)


if __name__ == "__main__":
    main()

"""Diffusion-LM decoding (reference: examples/diffusion/diffusion-cli.cpp;
llada/dream/rnd1 archs).

No installed HF implementation exists for these archs, so the tests
verify (a) converter mapping of the llada OLMo-style names against a
llama twin with identical weights (the body math is HF-verified), and
(b) the denoise loop's algorithmic contract: bidirectional conditioning,
full unmasking, greedy determinism, shift-vs-inplace logit selection.
"""

import json

import numpy as np
import pytest
import jax.numpy as jnp

pytest.importorskip("torch")

from test_archs_clones import (
    _LLAMA_CFG,
    _base_weights,
    _llama_tensors,
    _logits,
    _write,
    D,
    FF,
    KV,
    L,
    V,
)
from vlut_tpu.convert.checkpoint import load_checkpoint
from vlut_tpu.convert.convert import convert_hf
from vlut_tpu.runtime.diffusion import DiffusionParams, diffusion_generate
from vlut_tpu.train.finetune import float_twin_params

MASK = V - 1


def _llada_tensors(w):
    t = {"model.transformer.wte.weight": w["embed"],
         "model.transformer.ln_f.weight": w["final"],
         "model.transformer.ff_out.weight": w["head"]}
    for i in range(L):
        p = f"model.transformer.blocks.{i}."
        t[p + "q_proj.weight"] = w[f"q{i}"]
        t[p + "k_proj.weight"] = w[f"k{i}"]
        t[p + "v_proj.weight"] = w[f"v{i}"]
        t[p + "attn_out.weight"] = w[f"o{i}"]
        t[p + "ff_proj.weight"] = w[f"g{i}"]
        t[p + "up_proj.weight"] = w[f"u{i}"]
        t[p + "ff_out.weight"] = w[f"d{i}"]
        t[p + "attn_norm.weight"] = w[f"an{i}"]
        t[p + "ff_norm.weight"] = w[f"fn{i}"]
    return t


_LLADA_CFG = {
    "model_type": "llada", "architectures": ["LLaDAModelLM"],
    "vocab_size": V, "d_model": D, "n_layers": L, "n_heads": 4,
    "n_kv_heads": KV, "mlp_hidden_size": FF, "rms_norm_eps": 1e-5,
    "rope_theta": 10000.0, "max_sequence_length": 64,
    "mask_token_id": MASK, "tie_word_embeddings": False,
}


def test_llada_conversion_equals_llama_body(tmp_path):
    """Same weights under llada names vs llama names -> identical logits.

    llada's forward is genuinely bidirectional (causal_attn=False wired
    into _attention), so the llama twin must be compared with
    causal_attn=False too — the body math (norms/rope/FFN) is what this
    test pins down, not the mask."""
    import dataclasses

    from vlut_tpu.models.transformer import forward

    w = _base_weights(seed=7)
    _write(tmp_path / "llama", _LLAMA_CFG, _llama_tensors(w))
    _write(tmp_path / "llada", _LLADA_CFG, _llada_tensors(w))
    convert_hf(tmp_path / "llama", tmp_path / "out_l", dtype_hp="float32")
    cfg = convert_hf(tmp_path / "llada", tmp_path / "out_d",
                     dtype_hp="float32")
    assert not cfg.causal_attn and cfg.mask_token_id == MASK
    assert not cfg.diffusion_shift_logits

    def bidir_logits(ckpt_dir):
        c, params, _ = load_checkpoint(ckpt_dir)
        c = dataclasses.replace(c, causal_attn=False)
        pf = float_twin_params(params, c, dtype=jnp.float32)
        rng = np.random.default_rng(3)
        toks = rng.integers(0, V, (1, 7))
        pos = jnp.arange(7, dtype=jnp.int32)[None]
        lg, _ = forward(pf, c, jnp.asarray(toks, jnp.int32), pos, None,
                        impl="xla")
        return np.asarray(lg)[..., :V]

    np.testing.assert_array_equal(
        bidir_logits(tmp_path / "out_l"), bidir_logits(tmp_path / "out_d"))
    # and the causal llama differs from bidirectional llada at non-final
    # positions — i.e. the bidirectional wiring is real, not a no-op
    causal = _logits(tmp_path / "out_l")[0]
    assert not np.array_equal(causal, bidir_logits(tmp_path / "out_d"))


def _mk_llada(tmp_path):
    w = _base_weights(seed=8)
    _write(tmp_path / "llada", _LLADA_CFG, _llada_tensors(w))
    convert_hf(tmp_path / "llada", tmp_path / "out", dtype_hp="float32")
    cfg, params, _ = load_checkpoint(tmp_path / "out")
    return cfg, float_twin_params(params, cfg, dtype=jnp.float32)


def test_diffusion_generate_fills_all(tmp_path):
    cfg, pf = _mk_llada(tmp_path)
    prompt = [1, 2, 3]
    out = diffusion_generate(pf, cfg, prompt, 8,
                             DiffusionParams(steps=4))
    assert len(out) == 8
    assert all(0 <= t < V and t != MASK for t in out)
    # greedy determinism
    out2 = diffusion_generate(pf, cfg, prompt, 8,
                              DiffusionParams(steps=4))
    assert out == out2


def test_diffusion_algs_and_blocks(tmp_path):
    cfg, pf = _mk_llada(tmp_path)
    prompt = [4, 5]
    for alg in ("low_confidence", "entropy", "margin", "random"):
        out = diffusion_generate(
            pf, cfg, prompt, 6, DiffusionParams(steps=3, alg=alg, seed=1))
        assert len(out) == 6 and MASK not in out
    # block mode (llada semi-autoregressive remasking schedule)
    out = diffusion_generate(
        pf, cfg, prompt, 8, DiffusionParams(steps=4, block_len=4))
    assert len(out) == 8 and MASK not in out


def test_diffusion_prompt_conditioning(tmp_path):
    """Bidirectional denoising must condition on the prompt: with one
    masked slot, the committed token must equal the argmax the full
    forward computes FOR THAT PROMPT (run for two different prompts —
    catches a broken/static attention mask)."""
    from vlut_tpu.models.transformer import forward

    cfg, pf = _mk_llada(tmp_path)
    for prompt in ([1, 2, 3], [9, 8, 7]):
        t = len(prompt) + 1
        toks = jnp.asarray([prompt + [MASK]], jnp.int32)
        pos = jnp.arange(t, dtype=jnp.int32)[None]
        bidir = jnp.ones((1, t, t), jnp.bool_)
        lg, _ = forward(pf, cfg, toks, pos, None, attn_mask=bidir)
        want = int(np.asarray(lg)[0, -1, :V].argmax())
        out = diffusion_generate(pf, cfg, prompt, 1,
                                 DiffusionParams(steps=1))
        assert out[0] == want


def test_diffusion_shift_logits(tmp_path):
    """With steps == 1 and n_new == 1, an unshifted (llada) model commits
    argmax(logits[at the masked position]) while a shifted (dream) model
    commits argmax(logits[position-1]) — check both selections."""
    import dataclasses

    from vlut_tpu.models.transformer import forward

    cfg, pf = _mk_llada(tmp_path)
    prompt = [3, 1, 4]
    t = len(prompt) + 1
    toks = jnp.asarray([prompt + [MASK]], jnp.int32)
    pos = jnp.arange(t, dtype=jnp.int32)[None]
    bidir = jnp.ones((1, t, t), jnp.bool_)
    lg, _ = forward(pf, cfg, toks, pos, None, attn_mask=bidir)
    lg = np.asarray(lg)[0, :, :V]

    out = diffusion_generate(pf, cfg, prompt, 1, DiffusionParams(steps=1))
    assert out[0] == int(lg[-1].argmax())  # in-place (llada)

    cfg_s = dataclasses.replace(cfg, diffusion_shift_logits=True)
    out_s = diffusion_generate(pf, cfg_s, prompt, 1,
                               DiffusionParams(steps=1))
    assert out_s[0] == int(lg[-2].argmax())  # shifted (dream)

"""Vision wave 2 vs HF: gemma3 SigLIP + avg-pool projector, pixtral
2-D-rope ViT + llava projector (reference tools/mtmd/clip-impl.h
PROJECTOR_TYPE_GEMMA3 / PROJECTOR_TYPE_PIXTRAL)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from vlut_tpu.convert.checkpoint import (
    load_checkpoint,
    load_pixtral,
    load_siglip,
)
from vlut_tpu.convert.convert import convert_hf
from vlut_tpu.models.transformer import forward
from vlut_tpu.models.vision_ext import (
    gemma3_project,
    pixtral_forward,
    pixtral_project,
    siglip_forward,
)
from vlut_tpu.train.finetune import float_twin_params

V = 96
IMG_TOK = V - 1


def test_gemma3_vision_parity(tmp_path):
    """Gemma3 multimodal: SigLIP features + avg-pool/RMS/linear projector
    must match HF get_image_features; full image+text logits must match
    with the gemma3 bidirectional-image-block mask."""
    c = transformers.Gemma3Config(
        text_config=dict(
            vocab_size=V, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, head_dim=8,
            intermediate_size=64, max_position_embeddings=64,
            rope_theta=10000.0, sliding_window=16,
        ),
        vision_config=dict(
            image_size=16, patch_size=4, hidden_size=32,
            num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=48, layer_norm_eps=1e-6,
        ),
        mm_tokens_per_image=4, image_token_index=IMG_TOK,
        boi_token_index=V - 2, eoi_token_index=V - 3,
    )
    torch.manual_seed(70)
    m = transformers.Gemma3ForConditionalGeneration(c).float().eval()
    with torch.no_grad():
        for name, p in m.named_parameters():
            if name.endswith(".bias") or "soft_emb_norm" in name:
                p.copy_(0.05 * torch.randn_like(p))
    import test_archs_hf2

    test_archs_hf2._ternarize_model(m)
    m.save_pretrained(str(tmp_path / "hf"), safe_serialization=True)
    cfg = convert_hf(tmp_path / "hf", tmp_path / "out", dtype_hp="float32")
    scfg, sp, img_tok = load_siglip(tmp_path / "out")
    assert scfg is not None and img_tok == IMG_TOK
    assert scfg.mm_tokens_per_image == 4
    sp = jax.tree.map(jnp.asarray, sp)

    rng = np.random.default_rng(21)
    pix = rng.standard_normal((1, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        want_feats = m.get_image_features(torch.tensor(pix)).numpy()
    imgs = jnp.asarray(pix.transpose(0, 2, 3, 1))  # NCHW -> NHWC
    feats = siglip_forward(sp, scfg, imgs)
    got_feats = np.asarray(gemma3_project(sp, scfg, feats))
    np.testing.assert_allclose(got_feats, want_feats, rtol=2e-4,
                               atol=2e-5)

    # full pipeline: text + image tokens; gemma3's mask lets the image
    # block attend bidirectionally (HF token_type_ids mask)
    cfg2, params, _ = load_checkpoint(tmp_path / "out")
    pf = float_twin_params(params, cfg2, dtype=jnp.float32)
    n_img = 4
    ids = [5, V - 2, *([IMG_TOK] * n_img), V - 3, 7, 8]
    token_type = np.asarray([0, 0, 1, 1, 1, 1, 0, 0, 0])
    t = len(ids)
    with torch.no_grad():
        want = m(
            input_ids=torch.tensor([ids]),
            pixel_values=torch.tensor(pix),
            token_type_ids=torch.tensor([token_type.tolist()]),
        ).logits.numpy()
    tok_emb = np.asarray(pf["embed"], np.float32)[np.asarray(ids)]
    # our forward applies cfg.embed_scale AFTER token_embeds; HF injects
    # the raw image features post-scale, so pre-divide them
    tok_emb[2 : 2 + n_img] = got_feats[0] / cfg2.embed_scale
    causal = np.tril(np.ones((t, t), bool))
    img = token_type == 1
    mask = causal | (img[:, None] & img[None, :])
    pos = jnp.arange(t, dtype=jnp.int32)[None]
    got, _ = forward(
        pf, cfg2, jnp.asarray([ids], jnp.int32), pos, None, impl="xla",
        token_embeds=jnp.asarray(tok_emb)[None],
        attn_mask=jnp.asarray(mask)[None],
    )
    got = np.asarray(got)[..., : want.shape[-1]]
    np.testing.assert_allclose(got, want, rtol=6e-3, atol=6e-3)
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))


def test_pixtral_parity(tmp_path):
    """Pixtral tower inside a llava composite (the pixtral-12b layout):
    2-D rope (h-even/w-odd freqs), RMS norms, silu-gated MLP, llava
    2-layer GELU projector; non-square image exercises the h/w split."""
    c = transformers.LlavaConfig(
        text_config=dict(
            model_type="mistral", vocab_size=V, hidden_size=32,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=8, intermediate_size=64,
            max_position_embeddings=64, rope_theta=10000.0,
        ),
        vision_config=dict(
            model_type="pixtral", image_size=32, patch_size=4,
            hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=48, head_dim=8, rope_theta=10000.0,
        ),
        image_token_index=IMG_TOK,
        vision_feature_layer=-1,
        vision_feature_select_strategy="full",
        projector_hidden_act="gelu",
    )
    torch.manual_seed(71)
    m = transformers.LlavaForConditionalGeneration(c).float().eval()
    with torch.no_grad():
        for name, p in m.named_parameters():
            if name.endswith(".bias"):
                p.copy_(0.05 * torch.randn_like(p))
    import test_archs_hf2

    test_archs_hf2._ternarize_model(m)
    m.save_pretrained(str(tmp_path / "hf"), safe_serialization=True)
    convert_hf(tmp_path / "hf", tmp_path / "out", dtype_hp="float32")
    pcfg, pp, img_tok = load_pixtral(tmp_path / "out")
    assert pcfg is not None and img_tok == IMG_TOK
    pp = jax.tree.map(jnp.asarray, pp)

    rng = np.random.default_rng(22)
    pix = rng.standard_normal((1, 3, 8, 16)).astype(np.float32)  # 2x4 grid
    with torch.no_grad():
        want_feats = m.get_image_features(
            torch.tensor(pix), image_sizes=torch.tensor([[8, 16]]))
    want_feats = (want_feats[0] if isinstance(want_feats, (list, tuple))
                  else want_feats).numpy()
    feats = pixtral_forward(pp, pcfg, jnp.asarray(pix.transpose(0, 2, 3, 1)))
    got_feats = np.asarray(pixtral_project(pp, feats))
    np.testing.assert_allclose(
        got_feats.reshape(want_feats.shape), want_feats,
        rtol=2e-4, atol=2e-5)

    # full pipeline: causal text with image embeddings spliced in
    cfg2, params, _ = load_checkpoint(tmp_path / "out")
    pf = float_twin_params(params, cfg2, dtype=jnp.float32)
    n_img = got_feats.reshape(-1, cfg2.d_model).shape[0]
    ids = [5, *([IMG_TOK] * n_img), 7, 8]
    t = len(ids)
    with torch.no_grad():
        want = m(
            input_ids=torch.tensor([ids]),
            pixel_values=torch.tensor(pix),
            image_sizes=torch.tensor([[8, 16]]),
        ).logits.numpy()
    tok_emb = np.asarray(pf["embed"], np.float32)[np.asarray(ids)]
    tok_emb[1 : 1 + n_img] = got_feats.reshape(-1, cfg2.d_model)
    pos = jnp.arange(t, dtype=jnp.int32)[None]
    got, _ = forward(
        pf, cfg2, jnp.asarray([ids], jnp.int32), pos, None, impl="xla",
        token_embeds=jnp.asarray(tok_emb)[None],
    )
    got = np.asarray(got)[..., : want.shape[-1]]
    np.testing.assert_allclose(got, want, rtol=6e-3, atol=6e-3)
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))


def test_minicpmv_resampler_torch_reference():
    """MiniCPM-V perceiver resampler (reference PROJECTOR_TYPE_MINICPMV,
    tools/mtmd/models/minicpmv.cpp:40-110) vs an independent torch
    reference built from the HF resampler.py semantics: ln_q(query)
    cross-attends via nn.MultiheadAttention over ln_kv(kv_proj(x)), keys
    carry the 2-D sincos position embedding, ln_post + proj.  The
    converter splits torch's fused in_proj exactly."""
    from vlut_tpu.convert.convert import convert_minicpmv_resampler
    from vlut_tpu.models.vision_ext import (
        minicpmv_pos_embed,
        minicpmv_resampler,
    )

    d, d_llm, nq, gh, gw = 128, 32, 4, 2, 3
    npos = gh * gw
    torch.manual_seed(73)
    mha = torch.nn.MultiheadAttention(d, d // 128, batch_first=False)
    raw = {
        "resampler.query": torch.randn(nq, d) * 0.2,
        "resampler.kv_proj.weight": torch.randn(d, 48) * 0.2,
        "resampler.ln_q.weight": torch.rand(d) + 0.5,
        "resampler.ln_q.bias": torch.randn(d) * 0.1,
        "resampler.ln_kv.weight": torch.rand(d) + 0.5,
        "resampler.ln_kv.bias": torch.randn(d) * 0.1,
        "resampler.attn.in_proj_weight": mha.in_proj_weight.detach(),
        "resampler.attn.in_proj_bias": mha.in_proj_bias.detach(),
        "resampler.attn.out_proj.weight": mha.out_proj.weight.detach(),
        "resampler.attn.out_proj.bias": mha.out_proj.bias.detach(),
        "resampler.ln_post.weight": torch.rand(d) + 0.5,
        "resampler.ln_post.bias": torch.randn(d) * 0.1,
        "resampler.proj": torch.randn(d, d_llm) * 0.2,
    }
    raw_np = {k: v.numpy() for k, v in raw.items()}
    params = jax.tree.map(jnp.asarray,
                          convert_minicpmv_resampler(raw_np))

    rng = np.random.default_rng(33)
    feats = rng.standard_normal((npos, 48)).astype(np.float32)
    got = np.asarray(minicpmv_resampler(params, jnp.asarray(feats),
                                        (gh, gw)))

    # torch reference (resampler.py forward semantics)
    def t_ln(x, w, b):
        return torch.nn.functional.layer_norm(x, (d,), w, b, 1e-6)

    with torch.no_grad():
        q = t_ln(raw["resampler.query"], raw["resampler.ln_q.weight"],
                 raw["resampler.ln_q.bias"])
        v = torch.tensor(feats) @ raw["resampler.kv_proj.weight"].T
        v = t_ln(v, raw["resampler.ln_kv.weight"],
                 raw["resampler.ln_kv.bias"])
        pos = torch.tensor(
            np.asarray(minicpmv_pos_embed((gh, gw), d)))
        k = v + pos
        out, _ = mha(q.unsqueeze(1), k.unsqueeze(1), v.unsqueeze(1))
        out = t_ln(out.squeeze(1), raw["resampler.ln_post.weight"],
                   raw["resampler.ln_post.bias"])
        want = (out @ raw["resampler.proj"]).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

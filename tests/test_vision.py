"""Vision tower tests (reference: tools/mtmd clip.cpp + llava projector):
encoder shapes, patchify layout, embedding injection into the decoder, and
the llava converter round-trip."""

import json

import numpy as np
import jax.numpy as jnp

from vlut_tpu.models.vision import (
    VisionConfig,
    build_multimodal_embeds,
    encode_image,
    init_params as init_vision,
    patchify,
    preprocess_image,
)

VCFG = VisionConfig(
    image_size=32, patch_size=8, d_model=64, n_layers=2, n_heads=4,
    d_ff=128, d_llm=128, feature_layer=-1,
)


def test_patchify_layout():
    # pixel values encode (patch_row, patch_col) so we can verify ordering
    img = np.zeros((1, 32, 32, 3), np.float32)
    for r in range(4):
        for c in range(4):
            img[0, r * 8 : (r + 1) * 8, c * 8 : (c + 1) * 8] = r * 4 + c
    p = np.asarray(patchify(jnp.asarray(img), 8))
    assert p.shape == (1, 16, 8 * 8 * 3)
    for i in range(16):
        assert (p[0, i] == i).all()


def test_encoder_shapes_finite():
    params = init_vision(VCFG, seed=0)
    img = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 32, 32, 3)),
        jnp.float32,
    )
    out = encode_image(params, VCFG, img)
    assert out.shape == (2, VCFG.n_patches, VCFG.d_llm)
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_multimodal_injection_changes_output():
    """Decoder forward with image embeddings spliced in: runs, is finite,
    and differs from the text-only forward (the injection is live)."""
    from vlut_tpu.config import PRESETS
    from vlut_tpu.models.transformer import forward, init_params

    cfg = PRESETS["tiny"]
    llm = init_params(cfg, seed=0)
    vis = init_vision(
        VisionConfig(image_size=16, patch_size=8, d_model=32, n_layers=1,
                     n_heads=2, d_ff=64, d_llm=cfg.d_model,
                     feature_layer=-1),
        seed=1,
    )
    img = jnp.asarray(
        np.random.default_rng(2).standard_normal((1, 16, 16, 3)),
        jnp.float32,
    )
    img_embeds = encode_image(
        vis,
        VisionConfig(image_size=16, patch_size=8, d_model=32, n_layers=1,
                     n_heads=2, d_ff=64, d_llm=cfg.d_model,
                     feature_layer=-1),
        img,
    )[0]  # (4, d_model)
    prefix, suffix = [3, 5], [7, 9, 11]
    embeds = build_multimodal_embeds(llm, img_embeds, prefix, suffix)
    t = embeds.shape[0]
    assert t == len(prefix) + 4 + len(suffix)
    pos = jnp.arange(t, dtype=jnp.int32)[None]
    toks = jnp.zeros((1, t), jnp.int32)
    lg_mm, _ = forward(
        llm, cfg, toks, pos, None, impl="xla", token_embeds=embeds[None]
    )
    assert np.isfinite(np.asarray(lg_mm)).all()
    lg_txt, _ = forward(llm, cfg, toks, pos, None, impl="xla")
    assert np.abs(np.asarray(lg_mm) - np.asarray(lg_txt)).max() > 1e-3


def test_preprocess_normalizes():
    arr = np.full((8, 8, 3), 0.5, np.float32)
    out = preprocess_image(arr, 8)
    assert out.shape == (8, 8, 3)
    assert np.abs(out).max() < 3.0


def test_convert_llava_roundtrip(tmp_path):
    from safetensors.numpy import save_file

    from vlut_tpu.convert.checkpoint import load_checkpoint, load_vision
    from vlut_tpu.convert.convert import convert_hf

    rng = np.random.default_rng(5)
    # text: tiny llama; vision: tiny clip
    D, V, L, H, HKV, F = 32, 64, 2, 4, 2, 48
    VD, VL, VH, VF, IMG, PS = 24, 2, 4, 48, 16, 8
    hf = tmp_path / "hf"
    hf.mkdir()
    (hf / "config.json").write_text(json.dumps({
        "architectures": ["LlavaForConditionalGeneration"],
        "model_type": "llava",
        "vision_feature_layer": -1,
        "vision_feature_select_strategy": "default",
        "text_config": {
            "model_type": "llama", "vocab_size": V, "hidden_size": D,
            "num_hidden_layers": L, "num_attention_heads": H,
            "num_key_value_heads": HKV, "intermediate_size": F,
            "rms_norm_eps": 1e-5, "rope_theta": 10000.0,
            "max_position_embeddings": 128,
        },
        "vision_config": {
            "hidden_size": VD, "num_hidden_layers": VL,
            "num_attention_heads": VH, "intermediate_size": VF,
            "image_size": IMG, "patch_size": PS, "layer_norm_eps": 1e-5,
        },
    }))
    tern = lambda shp: (rng.integers(-1, 2, size=shp) * 0.05).astype(
        np.float32)
    t = {
        "language_model.model.embed_tokens.weight":
            rng.standard_normal((V, D)).astype(np.float32),
        "language_model.lm_head.weight":
            rng.standard_normal((V, D)).astype(np.float32),
        "language_model.model.norm.weight": np.ones(D, np.float32),
    }
    for i in range(L):
        pre = f"language_model.model.layers.{i}"
        t[f"{pre}.input_layernorm.weight"] = np.ones(D, np.float32)
        t[f"{pre}.post_attention_layernorm.weight"] = np.ones(D, np.float32)
        for sub, shp in (("self_attn.q_proj", (D, D)),
                         ("self_attn.k_proj", (D // 2, D)),
                         ("self_attn.v_proj", (D // 2, D)),
                         ("self_attn.o_proj", (D, D)),
                         ("mlp.gate_proj", (F, D)),
                         ("mlp.up_proj", (F, D)),
                         ("mlp.down_proj", (D, F))):
            t[f"{pre}.{sub}.weight"] = tern(shp)
    vp = "vision_tower.vision_model."
    t[f"{vp}embeddings.patch_embedding.weight"] = (
        rng.standard_normal((VD, 3, PS, PS)).astype(np.float32) * 0.05)
    t[f"{vp}embeddings.class_embedding"] = (
        rng.standard_normal(VD).astype(np.float32) * 0.02)
    n_pos = (IMG // PS) ** 2 + 1
    t[f"{vp}embeddings.position_embedding.weight"] = (
        rng.standard_normal((n_pos, VD)).astype(np.float32) * 0.02)
    t[f"{vp}pre_layrnorm.weight"] = np.ones(VD, np.float32)
    t[f"{vp}pre_layrnorm.bias"] = np.zeros(VD, np.float32)
    for i in range(VL):
        pre = f"{vp}encoder.layers.{i}"
        for nm, shp in (("layer_norm1.weight", VD), ("layer_norm1.bias", VD),
                        ("layer_norm2.weight", VD), ("layer_norm2.bias", VD)):
            t[f"{pre}.{nm}"] = (np.ones(shp, np.float32)
                                if "weight" in nm else
                                np.zeros(shp, np.float32))
        for nm, shp in (("self_attn.q_proj", (VD, VD)),
                        ("self_attn.k_proj", (VD, VD)),
                        ("self_attn.v_proj", (VD, VD)),
                        ("self_attn.out_proj", (VD, VD)),
                        ("mlp.fc1", (VF, VD)), ("mlp.fc2", (VD, VF))):
            t[f"{pre}.{nm}.weight"] = (
                rng.standard_normal(shp).astype(np.float32) * 0.05)
            t[f"{pre}.{nm}.bias"] = np.zeros(shp[0], np.float32)
    t["multi_modal_projector.linear_1.weight"] = (
        rng.standard_normal((D, VD)).astype(np.float32) * 0.05)
    t["multi_modal_projector.linear_1.bias"] = np.zeros(D, np.float32)
    t["multi_modal_projector.linear_2.weight"] = (
        rng.standard_normal((D, D)).astype(np.float32) * 0.05)
    t["multi_modal_projector.linear_2.bias"] = np.zeros(D, np.float32)
    save_file(t, str(hf / "model.safetensors"))

    out = tmp_path / "ckpt"
    cfg = convert_hf(hf, out)
    assert cfg.d_model == D
    vcfg, vparams = load_vision(out)
    assert vcfg is not None and vcfg.d_model == VD and vcfg.d_llm == D
    _, llm, meta = load_checkpoint(out)
    assert "vision_config" in meta

    img = jnp.asarray(
        np.random.default_rng(6).standard_normal((1, IMG, IMG, 3)),
        jnp.float32,
    )
    emb = encode_image(vparams, vcfg, img)
    assert emb.shape == (1, (IMG // PS) ** 2, D)
    assert np.isfinite(np.asarray(emb, np.float32)).all()


def test_mlp_norm_projector_variant():
    """MLP_NORM (yi-vl) projector: LayerNorm after each projector linear
    (reference tools/mtmd/models/llava.cpp:176-196) — twin vs torch on
    the factored llava_project (the tower is covered by the llava
    parity tests above)."""
    import torch

    from vlut_tpu.models.vision import llava_project

    rng = np.random.default_rng(5)
    d, d_llm = 32, 40
    t = lambda *s_: rng.standard_normal(s_).astype(np.float32) * 0.2
    params = {
        "proj_w1": t(d, d_llm), "proj_b1": t(d_llm),
        "proj_w2": t(d_llm, d_llm), "proj_b2": t(d_llm),
        "proj_ln1_w": 1.0 + t(d_llm), "proj_ln1_b": t(d_llm),
        "proj_ln2_w": 1.0 + t(d_llm), "proj_ln2_b": t(d_llm),
    }
    f = t(1, 16, d)
    with torch.no_grad():
        y = torch.tensor(f) @ torch.tensor(params["proj_w1"]) \
            + torch.tensor(params["proj_b1"])
        y = torch.nn.functional.layer_norm(
            y, (d_llm,), torch.tensor(params["proj_ln1_w"]),
            torch.tensor(params["proj_ln1_b"]), 1e-5)
        y = torch.nn.functional.gelu(y, approximate="tanh")
        y = y @ torch.tensor(params["proj_w2"]) + torch.tensor(
            params["proj_b2"])
        want = torch.nn.functional.layer_norm(
            y, (d_llm,), torch.tensor(params["proj_ln2_w"]),
            torch.tensor(params["proj_ln2_b"]), 1e-5).numpy()
    got = np.asarray(llava_project(
        {k: jnp.asarray(v) for k, v in params.items()}, jnp.asarray(f)))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

"""Vision wave 3 vs HF: InternVL ViT + projector, Llama4 vision,
Idefics3 SigLIP + pixel-shuffle connector (reference
tools/mtmd/clip-impl.h PROJECTOR_TYPE_INTERNVL / PROJECTOR_TYPE_LLAMA4 /
PROJECTOR_TYPE_IDEFICS3)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from vlut_tpu.convert.checkpoint import (
    load_idefics3,
    load_internvl_vision,
    load_llama4_vision,
)
from vlut_tpu.convert.convert import convert_hf
from vlut_tpu.models.vision_ext import siglip_forward
from vlut_tpu.models.vision_wave3 import (
    idefics3_project,
    internvl_forward,
    internvl_project,
    llama4_project,
    llama4_vision_forward,
)

V = 96


def _randomize(m, seed):
    torch.manual_seed(seed)
    with torch.no_grad():
        for _, p in m.named_parameters():
            p.copy_(0.05 * torch.randn_like(p))
    return m


def _tern(m):
    import test_archs_hf2

    test_archs_hf2._ternarize_model(m)


def test_internvl_vision_parity(tmp_path):
    """InternVL: tower features + pixel-shuffle projector must match HF
    get_image_features (layer-scale lambdas, CLS token, LN norms)."""
    c = transformers.InternVLConfig(
        text_config=dict(
            model_type="qwen2", vocab_size=V, hidden_size=32,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, intermediate_size=64,
            max_position_embeddings=64, rope_theta=10000.0,
        ),
        vision_config=dict(
            image_size=[16, 16], patch_size=[4, 4], hidden_size=32,
            num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=48, layer_norm_eps=1e-6,
            use_absolute_position_embeddings=True,
        ),
        image_token_id=V - 1, downsample_ratio=0.5,
    )
    m = transformers.InternVLForConditionalGeneration(c).float().eval()
    _randomize(m, 81)
    _tern(m.model.language_model)
    m.save_pretrained(str(tmp_path / "hf"), safe_serialization=True)
    convert_hf(tmp_path / "hf", tmp_path / "out", dtype_hp="float32")

    icfg, ip, img_tok = load_internvl_vision(tmp_path / "out")
    assert icfg is not None and img_tok == V - 1
    assert icfg.downsample == 2
    ip = jax.tree.map(jnp.asarray, ip)

    rng = np.random.default_rng(31)
    pix = rng.standard_normal((1, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        want = m.get_image_features(torch.tensor(pix)).numpy()
    feats = internvl_forward(ip, icfg, jnp.asarray(pix.transpose(0, 2, 3, 1)))
    got = np.asarray(internvl_project(ip, icfg, feats))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_llama4_vision_parity(tmp_path):
    """Llama4 vision: unfold conv, CLS appended last, 2-D complex rope,
    pixel-shuffle MLP2 adapter + no-bias projector vs HF."""
    c = transformers.Llama4Config(
        text_config=dict(
            vocab_size=V, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            intermediate_size=64, intermediate_size_mlp=64,
            num_local_experts=2, num_experts_per_tok=1,
            head_dim=8, max_position_embeddings=64,
        ),
        vision_config=dict(
            image_size=16, patch_size=4, hidden_size=32,
            num_hidden_layers=2, num_attention_heads=4,
            # HF Llama4VisionMLP2.fc1 takes intermediate_size as its
            # in-features, assuming hidden/(ratio^2) == intermediate
            # (true for the real 1408/5632 config) — mirror that here
            intermediate_size=128, pixel_shuffle_ratio=0.5,
            projector_input_dim=128, projector_output_dim=128,
            vision_output_dim=128, rope_theta=10000.0,
        ),
        image_token_index=V - 1, boi_token_index=V - 2,
        eoi_token_index=V - 3,
    )
    m = transformers.Llama4ForConditionalGeneration(c).float().eval()
    _randomize(m, 82)
    _tern(m.language_model)
    m.save_pretrained(str(tmp_path / "hf"), safe_serialization=True)
    convert_hf(tmp_path / "hf", tmp_path / "out", dtype_hp="float32")

    lcfg, lp, img_tok = load_llama4_vision(tmp_path / "out")
    assert lcfg is not None and img_tok == V - 1
    lp = jax.tree.map(jnp.asarray, lp)

    rng = np.random.default_rng(32)
    pix = rng.standard_normal((1, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        # get_image_features ends at the pixel-shuffle adapter; the
        # multimodal projector applies at splice time in HF forward
        want = m.multi_modal_projector(
            m.get_image_features(torch.tensor(pix), "default")
        ).numpy()
    feats = llama4_vision_forward(
        lp, lcfg, jnp.asarray(pix.transpose(0, 2, 3, 1)))
    got = np.asarray(llama4_project(lp, lcfg, feats))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_idefics3_parity(tmp_path):
    """Idefics3: SigLIP tower (reused siglip_forward) + pixel-shuffle
    connector vs HF get_image_features."""
    c = transformers.Idefics3Config(
        text_config=dict(
            vocab_size=V, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            intermediate_size=64, max_position_embeddings=64,
            rope_theta=10000.0, pad_token_id=0,
        ),
        vision_config=dict(
            image_size=16, patch_size=4, hidden_size=32,
            num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=48, layer_norm_eps=1e-6,
        ),
        scale_factor=2, image_token_id=V - 1,
    )
    m = transformers.Idefics3ForConditionalGeneration(c).float().eval()
    _randomize(m, 83)
    _tern(m.model.text_model)
    m.save_pretrained(str(tmp_path / "hf"), safe_serialization=True)
    convert_hf(tmp_path / "hf", tmp_path / "out", dtype_hp="float32")

    scfg, scale, sp, img_tok = load_idefics3(tmp_path / "out")
    assert scfg is not None and img_tok == V - 1 and scale == 2
    sp = jax.tree.map(jnp.asarray, sp)

    rng = np.random.default_rng(33)
    pix = rng.standard_normal((1, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        # (B, num_images, C, H, W); full-ones mask = no padded regions
        want = m.model.get_image_features(
            torch.tensor(pix)[None]
        ).numpy()
    feats = siglip_forward(sp, scfg, jnp.asarray(pix.transpose(0, 2, 3, 1)))
    got = np.asarray(idefics3_project(sp, feats, scale))
    np.testing.assert_allclose(
        got.reshape(want.shape), want, rtol=2e-4, atol=2e-5)


def test_glm4v_vision_parity():
    """GLM4-V vision tower + downsample + merger vs HF Glm4vVisionModel
    (reference PROJECTOR_TYPE_GLM4V, tools/mtmd/models/glm4v.cpp).
    Standalone weight map: the glm4v_text M-RoPE body is not converter-
    routed yet (PARITY.md), so parity runs against the vision module."""
    from transformers.models.glm4v.configuration_glm4v import (
        Glm4vVisionConfig as HFVC,
    )
    from transformers.models.glm4v.modeling_glm4v import Glm4vVisionModel

    from vlut_tpu.models.qwen_vision import QwenVisionConfig, patchify
    from vlut_tpu.models.vision_wave3 import (
        Glm4vVisionConfig,
        glm4v_vision_forward,
    )

    hc = HFVC(
        hidden_size=48, depth=2, num_heads=4, intermediate_size=64,
        out_hidden_size=40, image_size=16, patch_size=4,
        spatial_merge_size=2, temporal_patch_size=2,
    )
    hm = Glm4vVisionModel(hc).float().eval()
    _randomize(hm, 84)

    vc = Glm4vVisionConfig(
        image_size=16, patch_size=4, d_model=48, n_layers=2, n_heads=4,
        d_out=40, d_proj_ff=64, merge=2, rms_eps=hc.rms_norm_eps,
        attention_bias=hc.attention_bias,
    )
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in hm.state_dict().items()}
    m = vc.merge
    params = {
        "patch_w": sd["patch_embed.proj.weight"].reshape(
            vc.d_model, -1).T,
        "patch_b": sd["patch_embed.proj.bias"],
        "post_conv_norm": sd["post_conv_layernorm.weight"],
        "pos": sd["embeddings.position_embedding.weight"],
        "post_norm": sd["post_layernorm.weight"],
        "down_w": sd["downsample.weight"].transpose(2, 3, 1, 0).reshape(
            m * m * vc.d_model, vc.d_out),
        "down_b": sd["downsample.bias"],
        "merge_proj": sd["merger.proj.weight"].T,
        "merge_ln_w": sd["merger.post_projection_norm.weight"],
        "merge_ln_b": sd["merger.post_projection_norm.bias"],
        "merge_gate": sd["merger.gate_proj.weight"].T,
        "merge_up": sd["merger.up_proj.weight"].T,
        "merge_down": sd["merger.down_proj.weight"].T,
        "layers": {},
    }
    names = {
        "norm1.weight": "ln1_w", "norm2.weight": "ln2_w",
        "attn.qkv.weight": ("wqkv", True), "attn.qkv.bias": "bqkv",
        "attn.proj.weight": ("wo", True),
        "mlp.gate_proj.weight": ("w_gate", True),
        "mlp.up_proj.weight": ("w_up", True),
        "mlp.down_proj.weight": ("w_down", True),
    }
    for sub, nm in names.items():
        nm, tr = nm if isinstance(nm, tuple) else (nm, False)
        try:
            vals = [sd[f"blocks.{i}.{sub}"] for i in range(vc.n_layers)]
        except KeyError:
            continue  # attention_bias=False drops bqkv
        params["layers"][nm] = np.stack(
            [v.T if tr else v for v in vals])
    params = jax.tree.map(jnp.asarray, params)

    rng = np.random.default_rng(44)
    pix = rng.standard_normal((3, 16, 16)).astype(np.float32)
    qvc = QwenVisionConfig(
        depth=2, embed_dim=48, n_heads=4, mlp_dim=64, patch_size=4,
        temporal_patch_size=2, spatial_merge_size=2,
    )
    patches, grid = patchify(pix, qvc)
    with torch.no_grad():
        want = hm(
            torch.tensor(patches),
            grid_thw=torch.tensor([[1, grid[0], grid[1]]]),
        ).numpy()
    got = np.asarray(glm4v_vision_forward(
        params, vc, jnp.asarray(patches), grid))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_glm4v_end_to_end_convert(tmp_path):
    """glm4v through the REAL converter: text body (glm4 sandwich norms +
    partial interleaved rope) logit-parity vs HF on text-only input, and
    the vision tower routed to glm4v_vision.safetensors with
    get_image_features parity."""
    from vlut_tpu.convert.checkpoint import (
        load_checkpoint,
        load_glm4v_vision,
    )
    from vlut_tpu.models.qwen_vision import QwenVisionConfig, patchify
    from vlut_tpu.models.transformer import forward, init_kv_cache
    from vlut_tpu.models.vision_wave3 import glm4v_vision_forward
    from vlut_tpu.train.finetune import float_twin_params

    c = transformers.Glm4vConfig(
        text_config=dict(
            # hd=128: rope_interleaved needs an unpadded head dim
            vocab_size=V, hidden_size=512, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            intermediate_size=64, max_position_embeddings=64,
            rope_theta=10000.0, partial_rotary_factor=0.5,
            attention_bias=True,
            rope_scaling={"rope_type": "default",
                          "mrope_section": [16, 8, 8]},
        ),
        vision_config=dict(
            hidden_size=48, depth=2, num_heads=4, intermediate_size=64,
            out_hidden_size=32, image_size=16, patch_size=4,
            spatial_merge_size=2, temporal_patch_size=2,
        ),
        image_token_id=V - 1, video_start_token_id=V - 2,
        video_end_token_id=V - 3, image_start_token_id=V - 4,
        image_end_token_id=V - 5,
    )
    m = transformers.Glm4vForConditionalGeneration(c).float().eval()
    _randomize(m, 85)
    _tern(m.model.language_model)
    m.save_pretrained(str(tmp_path / "hf"), safe_serialization=True)
    convert_hf(tmp_path / "hf", tmp_path / "out", dtype_hp="float32")

    # text parity (M-RoPE rows equal for text -> standard partial rope)
    cfg, params, _ = load_checkpoint(tmp_path / "out")
    pf = float_twin_params(params, cfg, dtype=jnp.float32)
    ids = np.array([[3, 11, 25, 40, 7, 19]], np.int32)
    with torch.no_grad():
        want = m.model.language_model(
            input_ids=torch.tensor(ids.astype(np.int64))
        ).last_hidden_state
        want = m.lm_head(want).numpy()
    pos = jnp.tile(jnp.arange(ids.shape[1], dtype=jnp.int32), (1, 1))
    got, _ = forward(pf, cfg, jnp.asarray(ids), pos,
                     init_kv_cache(cfg, 1, max_len=16), impl="dequant")
    np.testing.assert_allclose(
        np.asarray(got, np.float32)[..., : cfg.vocab_size], want,
        rtol=2e-4, atol=3e-4)

    # vision through the converter route
    gcfg, gp, img_tok = load_glm4v_vision(tmp_path / "out")
    assert gcfg is not None and img_tok == V - 1
    gp = jax.tree.map(jnp.asarray, gp)
    rng = np.random.default_rng(55)
    pix = rng.standard_normal((3, 16, 16)).astype(np.float32)
    qvc = QwenVisionConfig(
        depth=2, embed_dim=48, n_heads=4, mlp_dim=64, patch_size=4,
        temporal_patch_size=2, spatial_merge_size=2,
    )
    patches, grid = patchify(pix, qvc)
    with torch.no_grad():
        want_v = m.model.visual(
            torch.tensor(patches),
            grid_thw=torch.tensor([[1, grid[0], grid[1]]]),
        ).numpy()
    got_v = np.asarray(glm4v_vision_forward(
        gp, gcfg, jnp.asarray(patches), grid))
    np.testing.assert_allclose(got_v, want_v, rtol=2e-4, atol=2e-5)


def test_janus_pro_parity(tmp_path):
    """Janus-Pro understanding path: siglip-structured tower (exact-GELU
    MLP) + aligner vs HF get_image_features; the generation-side
    vqmodel/generation_* tensors are dropped like the reference's mtmd
    (PROJECTOR_TYPE_JANUS_PRO)."""
    from vlut_tpu.convert.checkpoint import load_janus_vision
    from vlut_tpu.models.vision_wave3 import janus_aligner

    c = transformers.JanusConfig(
        text_config=dict(
            vocab_size=V, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            intermediate_size=64, max_position_embeddings=64,
        ),
        vision_config=dict(
            image_size=16, patch_size=4, hidden_size=32,
            num_hidden_layers=2, num_attention_heads=4, mlp_ratio=1.5,
            projection_dim=32, depth=2,
        ),
    )
    m = transformers.JanusForConditionalGeneration(c).float().eval()
    _randomize(m, 86)
    _tern(m.model.language_model)
    m.save_pretrained(str(tmp_path / "hf"), safe_serialization=True)
    convert_hf(tmp_path / "hf", tmp_path / "out", dtype_hp="float32")

    jcfg, jp, _ = load_janus_vision(tmp_path / "out")
    assert jcfg is not None
    jp = jax.tree.map(jnp.asarray, jp)
    rng = np.random.default_rng(61)
    pix = rng.standard_normal((1, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        want = m.model.get_image_features(torch.tensor(pix)).numpy()
    feats = siglip_forward(
        jp, jcfg, jnp.asarray(pix.transpose(0, 2, 3, 1)), act="exact")
    got = np.asarray(janus_aligner(jp, feats))
    np.testing.assert_allclose(
        got.reshape(want.shape), want, rtol=2e-4, atol=2e-5)


def test_lfm2_vl_parity(tmp_path):
    """LFM2-VL: siglip2 tower (linear patchify, native-grid positions) +
    pixel-unshuffle LN/GELU projector vs HF get_image_features
    (reference PROJECTOR_TYPE_LFM2)."""
    from vlut_tpu.convert.checkpoint import load_lfm2vl_vision
    from vlut_tpu.models.vision_wave3 import lfm2vl_project

    c = transformers.Lfm2VlConfig(
        text_config=dict(
            vocab_size=V, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            intermediate_size=64, max_position_embeddings=64,
            block_dim=32, conv_dim=32, num_heads=4,
            layer_types=["full_attention", "conv"],
        ),
        vision_config=dict(
            num_patches=16, patch_size=4, hidden_size=32,
            num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=48,
        ),
        downsample_factor=2, projector_hidden_size=40,
    )
    m = transformers.Lfm2VlForConditionalGeneration(c).float().eval()
    _randomize(m, 87)
    m.save_pretrained(str(tmp_path / "hf"), safe_serialization=True)
    convert_hf(tmp_path / "hf", tmp_path / "out", dtype_hp="float32")

    lcfg, factor, lp, _ = load_lfm2vl_vision(tmp_path / "out")
    assert lcfg is not None and factor == 2
    lp = jax.tree.map(jnp.asarray, lp)
    rng = np.random.default_rng(62)
    pix = rng.standard_normal((1, 3, 16, 16)).astype(np.float32)
    from vlut_tpu.models.vision_ext import _patchify

    patches = _patchify(jnp.asarray(pix.transpose(0, 2, 3, 1)), 4)
    with torch.no_grad():
        shapes = torch.tensor([[4, 4]])
        mask = torch.ones((1, 16), dtype=torch.bool)
        feats_hf = m.model.vision_tower(
            pixel_values=torch.tensor(np.asarray(patches)),
            spatial_shapes=shapes, pixel_attention_mask=mask,
        ).last_hidden_state
        want = m.model.multi_modal_projector(
            feats_hf.reshape(1, 4, 4, -1)).numpy()
    feats = siglip_forward(
        lp, lcfg, jnp.asarray(pix.transpose(0, 2, 3, 1)))
    got = np.asarray(lfm2vl_project(lp, feats, factor))
    np.testing.assert_allclose(
        got.reshape(want.shape), want, rtol=2e-4, atol=2e-5)


def test_kimivl_twin():
    """Kimi-VL MoonViT vs a direct torch transcription of the reference
    graph (tools/mtmd/models/kimivl.cpp + clip.cpp build_rope_2d
    mode-0-per-half rope and build_patch_merge_permute): no HF
    transformers module exists for kimi_vl, so the twin is the parity
    basis (the clone-twin practice used for reference-only graphs)."""
    from vlut_tpu.models.vision_wave3 import (
        KimiVLConfig,
        kimivl_forward,
        kimivl_project,
    )

    cfg = KimiVLConfig(
        image_size=16, patch_size=4, d_model=32, n_layers=2, n_heads=4,
        d_ff=48, merge=2, d_llm=40,
    )
    rng = np.random.default_rng(71)

    def t(*s, scale=0.08):
        return rng.standard_normal(s).astype(np.float32) * scale

    L, d, f = cfg.n_layers, cfg.d_model, cfg.d_ff
    params = {
        "patch_w": t(48, d), "patch_b": t(d),
        "pos": t(16, d),
        "post_ln_w": 1.0 + t(d), "post_ln_b": t(d),
        "proj_ln_w": 1.0 + t(d), "proj_ln_b": t(d),
        "proj_w1": t(d * 4, cfg.d_llm), "proj_b1": t(cfg.d_llm),
        "proj_w2": t(cfg.d_llm, cfg.d_llm), "proj_b2": t(cfg.d_llm),
        "layers": {
            "ln1_w": 1.0 + t(L, d), "ln1_b": t(L, d),
            "ln2_w": 1.0 + t(L, d), "ln2_b": t(L, d),
            "wq": t(L, d, d), "bq": t(L, d),
            "wk": t(L, d, d), "bk": t(L, d),
            "wv": t(L, d, d), "bv": t(L, d),
            "wo": t(L, d, d), "bo": t(L, d),
            "w1": t(L, d, f), "b1": t(L, f),
            "w2": t(L, f, d), "b2": t(L, d),
        },
    }
    img = rng.standard_normal((1, 16, 16, 3)).astype(np.float32)

    # ---- independent torch transcription of the reference graph ----
    def torch_ref():
        x = torch.tensor(img).reshape(1, 4, 4, 4, 4, 3)
        x = x.permute(0, 1, 3, 2, 4, 5).reshape(1, 16, 48)
        x = x @ torch.tensor(params["patch_w"]) + torch.tensor(
            params["patch_b"])
        x = x + torch.tensor(np.asarray(params["pos"]))[None]
        hd, H = 8, 4
        half = hd // 2
        inv = 1.0 / (cfg.rope_theta ** (
            torch.arange(0, half, 2, dtype=torch.float64) / half))
        hhh, www = torch.meshgrid(torch.arange(4), torch.arange(4),
                                  indexing="ij")
        pw = www.reshape(-1)[:, None].double() * inv[None]
        ph = hhh.reshape(-1)[:, None].double() * inv[None]
        ang = torch.cat([pw, ph], -1).float()          # (16, hd/2)

        def rope(z):  # (1, T, H, hd) ggml mode-0 pairs per half
            zr, zi = z[..., 0::2], z[..., 1::2]
            c = torch.cos(ang)[None, :, None, :]
            s = torch.sin(ang)[None, :, None, :]
            out = torch.stack([zr * c - zi * s, zr * s + zi * c], -1)
            return out.reshape(z.shape)

        def ln(v, w, b):
            mu = v.mean(-1, keepdim=True)
            var = ((v - mu) ** 2).mean(-1, keepdim=True)
            return (v - mu) / torch.sqrt(var + cfg.ln_eps) * torch.tensor(
                np.asarray(w)) + torch.tensor(np.asarray(b))

        P = params["layers"]
        for i in range(L):
            h = ln(x, P["ln1_w"][i], P["ln1_b"][i])
            q = rope((h @ torch.tensor(P["wq"][i]) + torch.tensor(
                P["bq"][i])).reshape(1, 16, H, hd))
            k = rope((h @ torch.tensor(P["wk"][i]) + torch.tensor(
                P["bk"][i])).reshape(1, 16, H, hd))
            v = (h @ torch.tensor(P["wv"][i]) + torch.tensor(
                P["bv"][i])).reshape(1, 16, H, hd)
            sc = torch.einsum("bthd,bshd->bhts", q, k) / np.sqrt(hd)
            p = torch.softmax(sc, -1)
            att = torch.einsum("bhts,bshd->bthd", p, v).reshape(1, 16, d)
            x = x + (att @ torch.tensor(P["wo"][i]) + torch.tensor(
                P["bo"][i]))
            h = ln(x, P["ln2_w"][i], P["ln2_b"][i])
            a = torch.nn.functional.gelu(
                h @ torch.tensor(P["w1"][i]) + torch.tensor(P["b1"][i]),
                approximate="tanh")
            x = x + (a @ torch.tensor(P["w2"][i]) + torch.tensor(
                P["b2"][i]))
        x = ln(x, params["post_ln_w"], params["post_ln_b"])
        # build_patch_merge_permute (clip.cpp:746-775): unshuffle h then w
        m = cfg.merge
        y = x.reshape(1, 4, 4, d)                      # (b, h, w, d) rows
        y = y.reshape(1, 4, 2, d * m).permute(0, 2, 1, 3)
        y = y.reshape(1, 2, 2, d * m * m).permute(0, 2, 1, 3)
        y = y.reshape(1, 4, d * m * m)
        # LN at the n_embd view width
        y = ln(y.reshape(1, 16, d), params["proj_ln_w"],
               params["proj_ln_b"]).reshape(1, 4, d * m * m)
        y = torch.nn.functional.gelu(
            y @ torch.tensor(params["proj_w1"]) + torch.tensor(
                params["proj_b1"]))
        return (y @ torch.tensor(params["proj_w2"]) + torch.tensor(
            params["proj_b2"])).numpy()

    with torch.no_grad():
        want = torch_ref()
    jp = jax.tree.map(jnp.asarray, params)
    feats = kimivl_forward(jp, cfg, jnp.asarray(img))
    got = np.asarray(kimivl_project(jp, cfg, feats))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_mistral3_patch_merger_parity(tmp_path):
    """Mistral-small-3.1 vision (covers PROJECTOR_TYPE_LIGHTONOCR — the
    reference runs both through clip_graph_pixtral with the optional
    patch merger): pixtral tower + RMSNorm + channel-major unfold merger
    + no-bias MLP vs HF get_image_features, through the real converter
    (previously mistral3 dropped its vision tower: text passthrough)."""
    from vlut_tpu.convert.checkpoint import load_pixtral
    from vlut_tpu.models.vision_ext import pixtral_forward, pixtral_project

    c = transformers.Mistral3Config(
        text_config=dict(
            vocab_size=V, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            intermediate_size=64, max_position_embeddings=64,
            rope_theta=10000.0, rms_norm_eps=1e-5,
        ),
        vision_config=dict(
            image_size=16, patch_size=4, hidden_size=32,
            num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=48, head_dim=8, rope_theta=10000.0,
        ),
        spatial_merge_size=2, multimodal_projector_bias=False,
        image_token_index=V - 1, vision_feature_layer=-1,
    )
    m = transformers.Mistral3ForConditionalGeneration(c).float().eval()
    _randomize(m, 88)
    _tern(m.model.language_model)
    m.save_pretrained(str(tmp_path / "hf"), safe_serialization=True)
    convert_hf(tmp_path / "hf", tmp_path / "out", dtype_hp="float32")

    pcfg, pp, img_tok = load_pixtral(tmp_path / "out")
    assert pcfg is not None and pcfg.spatial_merge_size == 2
    pp = jax.tree.map(jnp.asarray, pp)
    rng = np.random.default_rng(66)
    pix = rng.standard_normal((1, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        want = m.get_image_features(
            pixel_values=torch.tensor(pix),
            image_sizes=torch.tensor([[16, 16]]),
            vision_feature_layer=-1,
        )
        want = (want[0] if isinstance(want, (list, tuple)) else want).numpy()
    feats = pixtral_forward(pp, pcfg, jnp.asarray(pix.transpose(0, 2, 3, 1)))
    got = np.asarray(pixtral_project(pp, feats, cfg=pcfg, grid_hw=(4, 4)))
    np.testing.assert_allclose(
        got.reshape(want.shape), want, rtol=2e-4, atol=2e-5)


def test_ldp_and_ldpv2_twins():
    """MobileVLM LDP / LDPv2 projectors vs torch transcriptions of the
    reference graphs (tools/mtmd/models/llava.cpp:197-335: dw conv +
    channel LN + hardswish + squeeze-excite + pointwise + residual;
    v2: MLP + avgpool + PEG dw conv).  No HF transformers module for
    MobileVLM — twin parity like kimivl."""
    from vlut_tpu.models.vision_wave3 import ldp_project, ldpv2_project

    rng = np.random.default_rng(72)
    d_vis, C, side = 24, 32, 4

    def t(*s, scale=0.2):
        return rng.standard_normal(s).astype(np.float32) * scale

    feats = t(1, side * side, d_vis, scale=1.0)

    # ---- LDP ----
    p = {
        "mlp1_w": t(d_vis, C), "mlp1_b": t(C),
        "mlp3_w": t(C, C), "mlp3_b": t(C),
    }
    for blk in ("b1", "b2"):
        p.update({
            f"{blk}_dw": t(3, 3, 1, C),
            f"{blk}_ln0_w": 1.0 + t(C), f"{blk}_ln0_b": t(C),
            f"{blk}_fc1_w": t(C, 8), f"{blk}_fc1_b": t(8),
            f"{blk}_fc2_w": t(8, C), f"{blk}_fc2_b": t(C),
            f"{blk}_pw": t(C, C),
            f"{blk}_ln1_w": 1.0 + t(C), f"{blk}_ln1_b": t(C),
        })

    def torch_ldp():
        x = torch.tensor(feats)
        x = torch.nn.functional.gelu(
            x @ torch.tensor(p["mlp1_w"]) + torch.tensor(p["mlp1_b"]),
            approximate="tanh")
        x = x @ torch.tensor(p["mlp3_w"]) + torch.tensor(p["mlp3_b"])
        x = x.reshape(1, side, side, C).permute(0, 3, 1, 2)  # NCHW

        def block(x, blk, stride, residual):
            w = torch.tensor(p[f"{blk}_dw"]).permute(3, 2, 0, 1)  # (C,1,3,3)
            y = torch.nn.functional.conv2d(
                x, w, stride=stride, padding=1, groups=C)
            yn = y.permute(0, 2, 3, 1)
            yn = torch.nn.functional.layer_norm(
                yn, (C,), torch.tensor(p[f"{blk}_ln0_w"]),
                torch.tensor(p[f"{blk}_ln0_b"]), 1e-5)
            y = yn.permute(0, 3, 1, 2)
            hw = torch.nn.functional.hardswish(y)
            se = hw.mean((2, 3))
            se = torch.relu(se @ torch.tensor(p[f"{blk}_fc1_w"])
                            + torch.tensor(p[f"{blk}_fc1_b"]))
            se = se @ torch.tensor(p[f"{blk}_fc2_w"]) + torch.tensor(
                p[f"{blk}_fc2_b"])
            se = torch.nn.functional.hardsigmoid(se)
            y = hw * se[:, :, None, None]
            yn = y.permute(0, 2, 3, 1) @ torch.tensor(p[f"{blk}_pw"])
            yn = torch.nn.functional.layer_norm(
                yn, (C,), torch.tensor(p[f"{blk}_ln1_w"]),
                torch.tensor(p[f"{blk}_ln1_b"]), 1e-5)
            y = yn.permute(0, 3, 1, 2)
            return x + y if residual else y

        x = block(x, "b1", 1, True)
        x = block(x, "b2", 2, False)
        return x.permute(0, 2, 3, 1).reshape(1, -1, C).numpy()

    with torch.no_grad():
        want = torch_ldp()
    got = np.asarray(ldp_project(
        jax.tree.map(jnp.asarray, p), jnp.asarray(feats)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    # ---- LDPv2 ----
    p2 = {
        "mlp0_w": t(d_vis, C), "mlp0_b": t(C),
        "mlp2_w": t(C, C), "mlp2_b": t(C),
        "peg_w": t(3, 3, 1, C), "peg_b": t(C),
    }

    def torch_ldpv2():
        x = torch.tensor(feats)
        x = torch.nn.functional.gelu(
            x @ torch.tensor(p2["mlp0_w"]) + torch.tensor(p2["mlp0_b"]),
            approximate="tanh")
        x = x @ torch.tensor(p2["mlp2_w"]) + torch.tensor(p2["mlp2_b"])
        x = x.reshape(1, side, side, C).permute(0, 3, 1, 2)
        x = torch.nn.functional.avg_pool2d(x, 2, 2)
        w = torch.tensor(p2["peg_w"]).permute(3, 2, 0, 1)
        peg = torch.nn.functional.conv2d(
            x, w, stride=1, padding=1, groups=C) + torch.tensor(
            p2["peg_b"])[None, :, None, None]
        x = peg + x
        return x.permute(0, 2, 3, 1).reshape(1, -1, C).numpy()

    with torch.no_grad():
        want2 = torch_ldpv2()
    got2 = np.asarray(ldpv2_project(
        jax.tree.map(jnp.asarray, p2), jnp.asarray(feats)))
    np.testing.assert_allclose(got2, want2, rtol=2e-4, atol=2e-5)


def test_glm_edge_adapter_twin():
    """GLM-Edge adapter vs a torch transcription of the reference graph
    (tools/mtmd/models/llava.cpp:337-364): 2x2 stride-2 conv downsample,
    linear + LayerNorm + GELU, swiglu-split GLU, down linear, BOI/EOI
    bracketing."""
    from vlut_tpu.models.vision_wave3 import glm_edge_project

    rng = np.random.default_rng(73)
    C, side, d_llm = 24, 4, 40

    def t(*s, scale=0.2):
        return rng.standard_normal(s).astype(np.float32) * scale

    feats = t(1, side * side, C, scale=1.0)
    p = {
        "conv_w": t(2, 2, C, C), "conv_b": t(C),
        "mlp0_w": t(C, d_llm),
        "ln_w": 1.0 + t(d_llm), "ln_b": t(d_llm),
        "mlp1_w": t(d_llm, d_llm), "mlp2_w": t(d_llm, d_llm),
        "mlp3_w": t(d_llm, d_llm),
        "boi": t(d_llm), "eoi": t(d_llm),
    }

    def torch_ref():
        x = torch.tensor(feats).reshape(1, side, side, C).permute(0, 3, 1, 2)
        w = torch.tensor(p["conv_w"]).permute(3, 2, 0, 1)
        x = torch.nn.functional.conv2d(x, w, stride=2)
        x = x.permute(0, 2, 3, 1).reshape(1, -1, C) + torch.tensor(
            p["conv_b"])
        x = x @ torch.tensor(p["mlp0_w"])
        x = torch.nn.functional.layer_norm(
            x, (d_llm,), torch.tensor(p["ln_w"]), torch.tensor(p["ln_b"]),
            1e-5)
        x = torch.nn.functional.gelu(x, approximate="tanh")
        g = torch.nn.functional.silu(x @ torch.tensor(p["mlp2_w"])) * (
            x @ torch.tensor(p["mlp1_w"]))
        x = g @ torch.tensor(p["mlp3_w"])
        boi = torch.tensor(p["boi"]).expand(1, 1, d_llm)
        eoi = torch.tensor(p["eoi"]).expand(1, 1, d_llm)
        return torch.cat([boi, x, eoi], 1).numpy()

    with torch.no_grad():
        want = torch_ref()
    got = np.asarray(glm_edge_project(
        jax.tree.map(jnp.asarray, p), jnp.asarray(feats)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_qwen3vl_deepstack_vision_parity():
    """Qwen3-VL deepstack ViT vs HF Qwen3VLVisionModel (reference
    PROJECTOR_TYPE_QWEN3VL, tools/mtmd/models/qwen3vl.cpp): conv3d
    patchify, block-major positions, 2-D rope, plain tanh-GELU MLP
    blocks, main merger (pre-shuffle norm) + per-index deepstack mergers
    (post-shuffle norm)."""
    from transformers.models.qwen3_vl.configuration_qwen3_vl import (
        Qwen3VLVisionConfig as HFVC,
    )
    from transformers.models.qwen3_vl.modeling_qwen3_vl import (
        Qwen3VLVisionModel,
    )

    from vlut_tpu.models.qwen_vision import QwenVisionConfig, patchify
    from vlut_tpu.models.vision_wave3 import (
        Qwen3VLVisionConfig,
        qwen3vl_vision_forward,
    )

    hc = HFVC(
        hidden_size=32, depth=3, num_heads=4, intermediate_size=48,
        out_hidden_size=40, patch_size=4, temporal_patch_size=2,
        spatial_merge_size=2, num_position_embeddings=16,
        deepstack_visual_indexes=[0, 2],
    )
    hm = Qwen3VLVisionModel(hc).float().eval()
    _randomize(hm, 91)

    vc = Qwen3VLVisionConfig(
        patch_size=4, d_model=32, n_layers=3, n_heads=4, d_ff=48,
        d_out=40, temporal_patch_size=2, merge=2, pos_grid=4,
        deepstack_indexes=(0, 2),
    )
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in hm.state_dict().items()}
    params = {
        "patch_w": sd["patch_embed.proj.weight"].reshape(32, -1).T,
        "patch_b": sd["patch_embed.proj.bias"],
        "pos": sd["pos_embed.weight"],
        "merge_ln_w": sd["merger.norm.weight"],
        "merge_ln_b": sd["merger.norm.bias"],
        "merge_fc1_w": sd["merger.linear_fc1.weight"].T,
        "merge_fc1_b": sd["merger.linear_fc1.bias"],
        "merge_fc2_w": sd["merger.linear_fc2.weight"].T,
        "merge_fc2_b": sd["merger.linear_fc2.bias"],
        "layers": {},
    }
    for di in range(2):
        pre = f"deepstack_merger_list.{di}"
        params.update({
            f"ds{di}_ln_w": sd[f"{pre}.norm.weight"],
            f"ds{di}_ln_b": sd[f"{pre}.norm.bias"],
            f"ds{di}_fc1_w": sd[f"{pre}.linear_fc1.weight"].T,
            f"ds{di}_fc1_b": sd[f"{pre}.linear_fc1.bias"],
            f"ds{di}_fc2_w": sd[f"{pre}.linear_fc2.weight"].T,
            f"ds{di}_fc2_b": sd[f"{pre}.linear_fc2.bias"],
        })
    names = {
        "norm1.weight": "ln1_w", "norm1.bias": "ln1_b",
        "norm2.weight": "ln2_w", "norm2.bias": "ln2_b",
        "attn.qkv.weight": ("wqkv", True), "attn.qkv.bias": "bqkv",
        "attn.proj.weight": ("wo", True), "attn.proj.bias": "bo",
        "mlp.linear_fc1.weight": ("w1", True),
        "mlp.linear_fc1.bias": "b1",
        "mlp.linear_fc2.weight": ("w2", True),
        "mlp.linear_fc2.bias": "b2",
    }
    for sub, nm in names.items():
        nm, tr = nm if isinstance(nm, tuple) else (nm, False)
        vals = [sd[f"blocks.{i}.{sub}"] for i in range(3)]
        params["layers"][nm] = np.stack([v.T if tr else v for v in vals])
    params = jax.tree.map(jnp.asarray, params)

    rng = np.random.default_rng(92)
    pix = rng.standard_normal((3, 16, 16)).astype(np.float32)
    qvc = QwenVisionConfig(
        depth=3, embed_dim=32, n_heads=4, mlp_dim=48, patch_size=4,
        temporal_patch_size=2, spatial_merge_size=2,
    )
    patches, grid = patchify(pix, qvc)
    with torch.no_grad():
        want_main, want_ds = hm(
            torch.tensor(patches),
            grid_thw=torch.tensor([[1, grid[0], grid[1]]]),
        )
    got_main, got_ds = qwen3vl_vision_forward(
        params, vc, jnp.asarray(patches), grid)
    np.testing.assert_allclose(
        np.asarray(got_main), want_main.numpy(), rtol=2e-4, atol=2e-5)
    assert len(got_ds) == len(want_ds) == 2
    for g, w in zip(got_ds, want_ds):
        np.testing.assert_allclose(
            np.asarray(g), w.numpy(), rtol=2e-4, atol=2e-5)


def test_qwen3vl_vision_converter_route(tmp_path):
    """Qwen3-VL deepstack tower through the REAL converter (previously
    dropped as text-only): convert a tiny Qwen3VLForConditionalGeneration
    and check tower outputs vs HF."""
    from vlut_tpu.convert.checkpoint import load_qwen3vl_vision
    from vlut_tpu.models.qwen_vision import QwenVisionConfig, patchify
    from vlut_tpu.models.vision_wave3 import qwen3vl_vision_forward

    c = transformers.Qwen3VLConfig(
        text_config=dict(
            vocab_size=V, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, head_dim=16,
            intermediate_size=64, max_position_embeddings=64,
            rope_theta=10000.0,
            rope_scaling={"rope_type": "default",
                          "mrope_section": [4, 2, 2],
                          "mrope_interleaved": True},
        ),
        vision_config=dict(
            hidden_size=32, depth=3, num_heads=4, intermediate_size=48,
            out_hidden_size=64, patch_size=4, temporal_patch_size=2,
            spatial_merge_size=2, num_position_embeddings=16,
            deepstack_visual_indexes=[0, 2],
        ),
        image_token_id=V - 1, video_token_id=V - 2,
        vision_start_token_id=V - 3, vision_end_token_id=V - 4,
    )
    m = transformers.Qwen3VLForConditionalGeneration(c).float().eval()
    _randomize(m, 93)
    _tern(m.model.language_model)
    m.save_pretrained(str(tmp_path / "hf"), safe_serialization=True)
    convert_hf(tmp_path / "hf", tmp_path / "out", dtype_hp="float32")

    qcfg, qp, img_tok = load_qwen3vl_vision(tmp_path / "out")
    assert qcfg is not None and img_tok == V - 1
    assert qcfg.deepstack_indexes == (0, 2)
    qp = jax.tree.map(jnp.asarray, qp)
    rng = np.random.default_rng(94)
    pix = rng.standard_normal((3, 16, 16)).astype(np.float32)
    qvc = QwenVisionConfig(
        depth=3, embed_dim=32, n_heads=4, mlp_dim=48, patch_size=4,
        temporal_patch_size=2, spatial_merge_size=2,
    )
    patches, grid = patchify(pix, qvc)
    with torch.no_grad():
        want_main, want_ds = m.model.visual(
            torch.tensor(patches),
            grid_thw=torch.tensor([[1, grid[0], grid[1]]]),
        )
    got_main, got_ds = qwen3vl_vision_forward(
        qp, qcfg, jnp.asarray(patches), grid)
    np.testing.assert_allclose(
        np.asarray(got_main), want_main.numpy(), rtol=2e-4, atol=2e-5)
    for g, w in zip(got_ds, want_ds):
        np.testing.assert_allclose(
            np.asarray(g), w.numpy(), rtol=2e-4, atol=2e-5)


def test_qwen3vl_deepstack_text_injection(tmp_path):
    """Text-side DeepStack: forward(deepstack_embeds=...) adds each
    merger's features to the hidden state after layer i (HF
    Qwen3VLTextModel._deepstack_process) — logit parity vs HF with
    random visual features at marked positions."""
    from vlut_tpu.convert.checkpoint import load_checkpoint
    from vlut_tpu.models.transformer import forward, init_kv_cache
    from vlut_tpu.train.finetune import float_twin_params

    c = transformers.Qwen3VLConfig(
        text_config=dict(
            vocab_size=V, hidden_size=512, num_hidden_layers=3,
            num_attention_heads=4, num_key_value_heads=2, head_dim=128,
            intermediate_size=64, max_position_embeddings=64,
            rope_theta=10000.0,
            rope_scaling={"rope_type": "default",
                          "mrope_section": [32, 16, 16],
                          "mrope_interleaved": True},
        ),
        vision_config=dict(
            hidden_size=32, depth=2, num_heads=4, intermediate_size=48,
            out_hidden_size=512, patch_size=4, temporal_patch_size=2,
            spatial_merge_size=2, num_position_embeddings=16,
            deepstack_visual_indexes=[0, 1],
        ),
        image_token_id=V - 1, video_token_id=V - 2,
        vision_start_token_id=V - 3, vision_end_token_id=V - 4,
    )
    m = transformers.Qwen3VLForConditionalGeneration(c).float().eval()
    _randomize(m, 95)
    _tern(m.model.language_model)
    m.save_pretrained(str(tmp_path / "hf"), safe_serialization=True)
    convert_hf(tmp_path / "hf", tmp_path / "out", dtype_hp="float32")
    cfg, params, _ = load_checkpoint(tmp_path / "out")
    pf = float_twin_params(params, cfg, dtype=jnp.float32)

    rng = np.random.default_rng(96)
    ids = np.array([[3, 11, 25, 40, 7, 19]], np.int32)
    vis_mask = np.array([[False, True, True, False, False, False]])
    n_vis = int(vis_mask.sum())
    ds = [rng.standard_normal((n_vis, 512)).astype(np.float32) * 0.1
          for _ in range(2)]
    with torch.no_grad():
        out = m.model.language_model(
            input_ids=torch.tensor(ids.astype(np.int64)),
            visual_pos_masks=torch.tensor(vis_mask),
            deepstack_visual_embeds=[torch.tensor(d) for d in ds],
        ).last_hidden_state
        want = m.lm_head(out).numpy()
    # scatter the per-position features to full (B, T, D) planes
    full = []
    for d in ds:
        plane = np.zeros((1, ids.shape[1], 512), np.float32)
        plane[0, vis_mask[0]] = d
        full.append(jnp.asarray(plane))
    pos = jnp.tile(jnp.arange(ids.shape[1], dtype=jnp.int32), (1, 1))
    got, _ = forward(pf, cfg, jnp.asarray(ids), pos,
                     init_kv_cache(cfg, 1, max_len=16), impl="dequant",
                     deepstack_embeds=tuple(full))
    np.testing.assert_allclose(
        np.asarray(got, np.float32)[..., : cfg.vocab_size], want,
        rtol=2e-4, atol=3e-4)


def test_cogvlm_vision_twin():
    """CogVLM EVA2-CLIP tower + gated adapter vs a torch transcription of
    the reference graph (tools/mtmd/models/cogvlm.cpp: CLS appended last,
    POST-norm blocks, geglu-split FFN activating the up operand;
    projector = linear -> LN -> GELU -> swiglu(gate, h4h) -> down ->
    BOI/EOI).  The text-side dual-expert body already has its own twin
    (cogvlm in ARCHS.md)."""
    from vlut_tpu.models.vision_wave3 import (
        CogVLMVisionConfig,
        cogvlm_project,
        cogvlm_vision_forward,
    )

    cfg = CogVLMVisionConfig(
        image_size=16, patch_size=4, d_model=32, n_layers=2, n_heads=4,
        d_ff=48, d_llm=40,
    )
    rng = np.random.default_rng(74)

    def t(*s, scale=0.1):
        return rng.standard_normal(s).astype(np.float32) * scale

    L, d, f = cfg.n_layers, cfg.d_model, cfg.d_ff
    params = {
        "patch_w": t(48, d), "patch_b": t(d),
        "cls": t(d), "pos": t(17, d),
        "mm_proj": t(d, 40),
        "post_fc_ln_w": 1.0 + t(40), "post_fc_ln_b": t(40),
        "gate_w": t(40, 64), "h4h_w": t(40, 64),
        "h4h_down_w": t(64, 40),
        "boi": t(40), "eoi": t(40),
        "layers": {
            "wqkv": t(L, d, 3 * d), "bqkv": t(L, 3 * d),
            "wo": t(L, d, d), "bo": t(L, d),
            "ln1_w": 1.0 + t(L, d), "ln1_b": t(L, d),
            "ln2_w": 1.0 + t(L, d), "ln2_b": t(L, d),
            "w_up": t(L, d, f), "b_up": t(L, f),
            "w_gate": t(L, d, f), "b_gate": t(L, f),
            "w_down": t(L, f, d), "b_down": t(L, d),
        },
    }
    img = rng.standard_normal((1, 16, 16, 3)).astype(np.float32)

    def torch_ref():
        x = torch.tensor(img).reshape(1, 4, 4, 4, 4, 3)
        x = x.permute(0, 1, 3, 2, 4, 5).reshape(1, 16, 48)
        x = x @ torch.tensor(params["patch_w"]) + torch.tensor(
            params["patch_b"])
        x = torch.cat([x, torch.tensor(params["cls"]).expand(1, 1, d)], 1)
        x = x + torch.tensor(params["pos"])[None]
        P = params["layers"]

        def ln(v, w, b, eps=cfg.ln_eps):
            return torch.nn.functional.layer_norm(
                v, (v.shape[-1],), torch.tensor(np.asarray(w)),
                torch.tensor(np.asarray(b)), eps)

        hd, H = d // 4, 4
        for i in range(L):
            qkv = (x @ torch.tensor(P["wqkv"][i]) + torch.tensor(
                P["bqkv"][i])).reshape(1, 17, 3, H, hd)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            sc = torch.einsum("bthd,bshd->bhts", q, k) / np.sqrt(hd)
            p = torch.softmax(sc, -1)
            att = torch.einsum("bhts,bshd->bthd", p, v).reshape(1, 17, d)
            att = att @ torch.tensor(P["wo"][i]) + torch.tensor(P["bo"][i])
            att = ln(att, P["ln1_w"][i], P["ln1_b"][i])
            x = x + att
            a = torch.nn.functional.gelu(
                x @ torch.tensor(P["w_up"][i]) + torch.tensor(P["b_up"][i]),
                approximate="tanh") * (
                x @ torch.tensor(P["w_gate"][i]) + torch.tensor(
                    P["b_gate"][i]))
            ff = a @ torch.tensor(P["w_down"][i]) + torch.tensor(
                P["b_down"][i])
            ff = ln(ff, P["ln2_w"][i], P["ln2_b"][i])
            x = x + ff
        y = x[:, :-1] @ torch.tensor(params["mm_proj"])
        y = ln(y, params["post_fc_ln_w"], params["post_fc_ln_b"], 1e-5)
        y = torch.nn.functional.gelu(y, approximate="tanh")
        g = torch.nn.functional.silu(y @ torch.tensor(params["gate_w"])) \
            * (y @ torch.tensor(params["h4h_w"]))
        y = g @ torch.tensor(params["h4h_down_w"])
        boi = torch.tensor(params["boi"]).expand(1, 1, 40)
        eoi = torch.tensor(params["eoi"]).expand(1, 1, 40)
        return torch.cat([boi, y, eoi], 1).numpy()

    with torch.no_grad():
        want = torch_ref()
    jp = jax.tree.map(jnp.asarray, params)
    feats = cogvlm_vision_forward(jp, cfg, jnp.asarray(img))
    got = np.asarray(cogvlm_project(jp, feats))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_youtuvl_vision_twin():
    """Youtu-VL ViT + VLPatchMerger vs a torch transcription of the
    reference graph (tools/mtmd/models/youtuvl.cpp): linear patchify, no
    learned positions (pure 2-D rope), separate biased q/k/v, ungated
    tanh-GELU MLP, RMS merge norm -> merge-4 GELU MLP.  Full-attention
    configuration; the window path rides the qwen2.5-vl reorder
    machinery already covered by test_qwen2vl.py."""
    from vlut_tpu.models.qwen_vision import patchify, QwenVisionConfig
    from vlut_tpu.models.vision_wave3 import (
        YoutuVLConfig,
        youtuvl_vision_forward,
    )

    vc = YoutuVLConfig(
        patch_size=4, d_model=32, n_layers=2, n_heads=4, d_ff=48,
        d_out=40, merge=2,
    )
    rng = np.random.default_rng(75)

    def t(*s, scale=0.1):
        return rng.standard_normal(s).astype(np.float32) * scale

    L, d, f = vc.n_layers, vc.d_model, vc.d_ff
    params = {
        "patch_w": t(48, d), "patch_b": t(d),
        "post_ln_w": 1.0 + t(d), "post_ln_b": t(d),
        "merge_norm": 1.0 + t(d),
        "merge_fc1_w": t(4 * d, 4 * d), "merge_fc1_b": t(4 * d),
        "merge_fc2_w": t(4 * d, 40), "merge_fc2_b": t(40),
        "layers": {
            "ln1_w": 1.0 + t(L, d), "ln1_b": t(L, d),
            "ln2_w": 1.0 + t(L, d), "ln2_b": t(L, d),
            "wq": t(L, d, d), "bq": t(L, d),
            "wk": t(L, d, d), "bk": t(L, d),
            "wv": t(L, d, d), "bv": t(L, d),
            "wo": t(L, d, d), "bo": t(L, d),
            "w1": t(L, d, f), "b1": t(L, f),
            "w2": t(L, f, d), "b2": t(L, d),
        },
    }
    pix = rng.standard_normal((3, 16, 16)).astype(np.float32)
    qvc = QwenVisionConfig(
        depth=2, embed_dim=d, n_heads=4, mlp_dim=f, patch_size=4,
        temporal_patch_size=1, spatial_merge_size=2,
    )
    patches, grid = patchify(pix, qvc)

    def torch_ref():
        x = torch.tensor(np.asarray(patches)) @ torch.tensor(
            params["patch_w"]) + torch.tensor(params["patch_b"])
        hd, H = 8, 4
        # block-major 2-D rope table (same as qwen machinery)
        from vlut_tpu.models.qwen_vision import _vision_rot_table
        cos, sin = _vision_rot_table(grid, hd, 2)
        cos = torch.tensor(np.asarray(cos))
        sin = torch.tensor(np.asarray(sin))

        def rot_half(z):
            h2 = z.shape[-1] // 2
            return torch.cat([-z[..., h2:], z[..., :h2]], -1)

        def rope(z):
            return z * cos[:, None, :] + rot_half(z) * sin[:, None, :]

        def ln(v, w, b, eps=vc.ln_eps):
            return torch.nn.functional.layer_norm(
                v, (v.shape[-1],), torch.tensor(np.asarray(w)),
                torch.tensor(np.asarray(b)), eps)

        P = params["layers"]
        n = x.shape[0]
        for i in range(L):
            h = ln(x, P["ln1_w"][i], P["ln1_b"][i])
            q = rope((h @ torch.tensor(P["wq"][i]) + torch.tensor(
                P["bq"][i])).reshape(n, H, hd))
            k = rope((h @ torch.tensor(P["wk"][i]) + torch.tensor(
                P["bk"][i])).reshape(n, H, hd))
            v = (h @ torch.tensor(P["wv"][i]) + torch.tensor(
                P["bv"][i])).reshape(n, H, hd)
            sc = torch.einsum("thd,shd->hts", q, k) / np.sqrt(hd)
            p = torch.softmax(sc, -1)
            att = torch.einsum("hts,shd->thd", p, v).reshape(n, -1)
            x = x + (att @ torch.tensor(P["wo"][i]) + torch.tensor(
                P["bo"][i]))
            h = ln(x, P["ln2_w"][i], P["ln2_b"][i])
            a = torch.nn.functional.gelu(
                h @ torch.tensor(P["w1"][i]) + torch.tensor(P["b1"][i]),
                approximate="tanh")
            x = x + (a @ torch.tensor(P["w2"][i]) + torch.tensor(
                P["b2"][i]))
        x = ln(x, params["post_ln_w"], params["post_ln_b"])
        xf = x.float()
        xf = xf * torch.rsqrt((xf * xf).mean(-1, keepdim=True) + 1e-6) \
            * torch.tensor(params["merge_norm"])
        y = xf.reshape(n // 4, 4 * d)
        y = torch.nn.functional.gelu(
            y @ torch.tensor(params["merge_fc1_w"]) + torch.tensor(
                params["merge_fc1_b"]), approximate="tanh")
        return (y @ torch.tensor(params["merge_fc2_w"]) + torch.tensor(
            params["merge_fc2_b"])).numpy()

    with torch.no_grad():
        want = torch_ref()
    got = np.asarray(youtuvl_vision_forward(
        jax.tree.map(jnp.asarray, params), vc, jnp.asarray(patches), grid))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

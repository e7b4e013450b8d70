"""Qwen2-VL parity vs HF: vision tower + M-RoPE text model, full
image+text pipeline (reference: src/models/qwen2vl.cpp M-RoPE graph and
the mtmd qwen2vl_merger vision projector)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from vlut_tpu.convert.checkpoint import load_checkpoint, load_qwen_vision
from vlut_tpu.convert.convert import convert_hf
from vlut_tpu.models.qwen_vision import (
    mrope_positions,
    patchify,
    vision_forward,
)
from vlut_tpu.models.transformer import forward
from vlut_tpu.train.finetune import float_twin_params

V = 96
IMG_TOK, VIS_START = V - 1, V - 2


def _mk(tmp_path):
    c = transformers.Qwen2VLConfig(
        text_config=dict(
            vocab_size=V, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            intermediate_size=64, max_position_embeddings=64,
            rope_theta=10000.0,
            rope_scaling={"type": "mrope", "mrope_section": [2, 1, 1]},
        ),
        vision_config=dict(
            depth=2, embed_dim=32, num_heads=4, in_channels=3,
            patch_size=4, spatial_merge_size=2, temporal_patch_size=2,
            hidden_size=32, mlp_ratio=2,
        ),
        image_token_id=IMG_TOK, vision_start_token_id=VIS_START,
        video_token_id=V - 3,
    )
    torch.manual_seed(90)
    m = transformers.Qwen2VLForConditionalGeneration(c).float().eval()
    # randomize zero-init biases so dropped biases would be caught
    with torch.no_grad():
        for name, p in m.named_parameters():
            if name.endswith(".bias"):
                p.copy_(0.05 * torch.randn_like(p))
    import sys
    sys.modules  # noqa: B018
    import test_archs_hf2

    test_archs_hf2._ternarize_model(m)
    m.save_pretrained(str(tmp_path / "hf"), safe_serialization=True)
    cfg = convert_hf(tmp_path / "hf", tmp_path / "out", dtype_hp="float32")
    cfg2, params, meta = load_checkpoint(tmp_path / "out")
    pf = float_twin_params(params, cfg2, dtype=jnp.float32)
    vc, vparams, extras = load_qwen_vision(tmp_path / "out")
    return m, cfg2, pf, vc, vparams, extras


def test_qwen2vl_text_only_parity(tmp_path):
    """Pure text: M-RoPE with equal position rows == standard rope."""
    m, cfg, pf, vc, vp, _ = _mk(tmp_path)
    assert cfg.qkv_bias
    assert tuple(cfg.rope_scaling["mrope_section"]) == (2, 1, 1)
    rng = np.random.default_rng(12)
    toks = rng.integers(0, V - 3, (2, 9))
    with torch.no_grad():
        want = m(torch.tensor(toks)).logits.numpy()
    pos = jnp.tile(jnp.arange(9, dtype=jnp.int32), (2, 1))
    got, _ = forward(pf, cfg, jnp.asarray(toks, jnp.int32), pos, None,
                     impl="xla")
    got = np.asarray(got)[..., : want.shape[-1]]
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))


def test_qwen2vl_image_parity(tmp_path):
    """Full multimodal pipeline: patchify -> vision tower -> merger ->
    embedding injection at image tokens -> M-RoPE grid positions."""
    m, cfg, pf, vc, vp, extras = _mk(tmp_path)
    assert extras["image_token_id"] == IMG_TOK
    vp = jax.tree.map(jnp.asarray, vp)
    rng = np.random.default_rng(13)
    # 8x16 image at patch 4 -> grid (2, 4) -> merged tokens (2/2)*(4/2)=2
    img = rng.standard_normal((3, 8, 16)).astype(np.float32)
    patches, grid = patchify(img, vc)
    assert grid == (2, 4)
    n_img = (grid[0] // vc.spatial_merge_size) * (
        grid[1] // vc.spatial_merge_size)

    pre = [5, 6, VIS_START, *( [IMG_TOK] * n_img )]
    post = [7, 8, 9]
    ids = pre + post
    t = len(ids)
    with torch.no_grad():
        want = m(
            input_ids=torch.tensor([ids]),
            pixel_values=torch.tensor(patches),
            image_grid_thw=torch.tensor([[1, grid[0], grid[1]]]),
        ).logits.numpy()

    img_emb = vision_forward(vp, vc, jnp.asarray(patches), grid)
    assert img_emb.shape == (n_img, cfg.d_model)
    tok_emb = np.asarray(pf["embed"], np.float32)[np.asarray(ids)]
    tok_emb[3 : 3 + n_img] = np.asarray(img_emb)
    mpos = mrope_positions(3, grid, vc.spatial_merge_size, len(post))
    assert mpos.shape == (3, t)
    got, _ = forward(
        pf, cfg, jnp.asarray([ids], jnp.int32),
        jnp.arange(t, dtype=jnp.int32)[None],
        None, impl="xla",
        token_embeds=jnp.asarray(tok_emb)[None],
        mrope_pos=jnp.asarray(mpos, jnp.int32)[None],
    )
    got = np.asarray(got)[..., : want.shape[-1]]
    np.testing.assert_allclose(got, want, rtol=6e-3, atol=6e-3)
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))


def test_qwen3vl_text_parity(tmp_path):
    """qwen3-vl text model: qwen3 body (per-head qk-norm) + INTERLEAVED
    M-RoPE — with a real multi-row position grid so the interleaved
    frequency layout is actually exercised."""
    cls = getattr(transformers, "Qwen3VLForConditionalGeneration", None)
    if cls is None:
        pytest.skip("transformers lacks Qwen3VL")
    c = transformers.Qwen3VLConfig(
        text_config=dict(
            vocab_size=V, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, head_dim=16,
            intermediate_size=64, max_position_embeddings=64,
            rope_theta=10000.0,
            rope_scaling={"rope_type": "default",
                          "mrope_section": [4, 2, 2],
                          "mrope_interleaved": True},
        ),
        vision_config=dict(
            depth=1, hidden_size=32, num_heads=4, in_channels=3,
            patch_size=4, spatial_merge_size=2, temporal_patch_size=2,
            out_hidden_size=32, intermediate_size=64,
            num_position_embeddings=16, deepstack_visual_indexes=[],
        ),
        image_token_id=IMG_TOK, vision_start_token_id=VIS_START,
        video_token_id=V - 3,
    )
    torch.manual_seed(91)
    m = cls(c).float().eval()
    import test_archs_hf2

    test_archs_hf2._ternarize_model(m)
    m.save_pretrained(str(tmp_path / "hf"), safe_serialization=True)
    cfg = convert_hf(tmp_path / "hf", tmp_path / "out", dtype_hp="float32")
    cfg2, params, _ = load_checkpoint(tmp_path / "out")
    pf = float_twin_params(params, cfg2, dtype=jnp.float32)
    assert cfg2.qk_norm and cfg2.rope_scaling["mrope_interleaved"]

    rng = np.random.default_rng(15)
    t = 8
    toks = rng.integers(0, V - 3, (1, t))
    # synthetic 3-row positions (as if an image grid sat in the middle)
    mpos = np.stack([
        np.arange(t), np.arange(t), np.arange(t)
    ]).astype(np.int64)
    mpos[1, 3:6] = 3
    mpos[2, 3:6] = [3, 4, 5]
    with torch.no_grad():
        want = m.model.language_model(
            input_ids=torch.tensor(toks),
            position_ids=torch.tensor(mpos)[:, None, :],
        ).last_hidden_state
        head = m.lm_head.weight
        want = (want @ head.T).numpy()
    got, _ = forward(
        pf, cfg2, jnp.asarray(toks, jnp.int32),
        jnp.asarray(mpos.max(0))[None].astype(jnp.int32), None,
        impl="xla", mrope_pos=jnp.asarray(mpos, jnp.int32)[None],
    )
    got = np.asarray(got)[..., : want.shape[-1]]
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))


def test_qwen25vl_image_parity(tmp_path):
    """Qwen2.5-VL window-attention ViT (reference mtmd
    PROJECTOR_TYPE_QWEN25VL, tools/mtmd/clip-impl.h; HF
    Qwen2_5_VisionTransformerPretrainedModel): RMSNorm block norms +
    merger ln_q, silu gate/up/down MLP with biases, spatial-merge-unit
    window reorder with RAGGED edge windows, full attention only on
    fullatt_block_indexes, un-permute after the merger.  Full multimodal
    pipeline parity vs HF."""
    c = transformers.Qwen2_5_VLConfig(
        text_config=dict(
            vocab_size=V, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            intermediate_size=64, max_position_embeddings=64,
            rope_theta=10000.0,
            rope_scaling={"type": "mrope", "mrope_section": [2, 1, 1]},
        ),
        vision_config=dict(
            depth=3, hidden_size=32, num_heads=4, in_channels=3,
            patch_size=4, spatial_merge_size=2, temporal_patch_size=2,
            intermediate_size=48, out_hidden_size=32,
            window_size=16,            # 2x2 merge units per window
            fullatt_block_indexes=[2],
        ),
        image_token_id=IMG_TOK, vision_start_token_id=VIS_START,
        video_token_id=V - 3,
    )
    torch.manual_seed(95)
    m = transformers.Qwen2_5_VLForConditionalGeneration(c).float().eval()
    with torch.no_grad():
        for name, p in m.named_parameters():
            if name.endswith(".bias"):
                p.copy_(0.05 * torch.randn_like(p))
    import test_archs_hf2

    test_archs_hf2._ternarize_model(m)
    m.save_pretrained(str(tmp_path / "hf"), safe_serialization=True)
    cfg = convert_hf(tmp_path / "hf", tmp_path / "out", dtype_hp="float32")
    cfg2, params, meta = load_checkpoint(tmp_path / "out")
    pf = float_twin_params(params, cfg2, dtype=jnp.float32)
    vc, vp, extras = load_qwen_vision(tmp_path / "out")
    assert vc.rms_norm and vc.gated_mlp
    assert vc.window_size == 16 and vc.fullatt_blocks == (2,)
    vp = jax.tree.map(jnp.asarray, vp)

    rng = np.random.default_rng(14)
    # 24x32 px at patch 4 -> grid (6, 8); llm grid 3x4 with 2-unit
    # windows -> ragged bottom row (pad_h = 1)
    img = rng.standard_normal((3, 24, 32)).astype(np.float32)
    patches, grid = patchify(img, vc)
    assert grid == (6, 8)
    n_img = (grid[0] // 2) * (grid[1] // 2)

    pre = [5, 6, VIS_START, *([IMG_TOK] * n_img)]
    post = [7, 8, 9]
    ids = pre + post
    with torch.no_grad():
        want = m(
            input_ids=torch.tensor([ids]),
            pixel_values=torch.tensor(patches),
            image_grid_thw=torch.tensor([[1, grid[0], grid[1]]]),
        ).logits.numpy()

    img_emb = vision_forward(vp, vc, jnp.asarray(patches), grid)
    assert img_emb.shape == (n_img, cfg2.d_model)
    tok_emb = np.asarray(pf["embed"], np.float32)[np.asarray(ids)]
    tok_emb[3 : 3 + n_img] = np.asarray(img_emb)
    mpos = mrope_positions(3, grid, vc.spatial_merge_size, len(post))
    # mask positions are SEQUENCE order (HF causal mask), not the mrope
    # max: image-grid position values are non-monotonic for gh > 1
    got, _ = forward(
        pf, cfg2, jnp.asarray([ids], jnp.int32),
        jnp.arange(len(ids), dtype=jnp.int32)[None],
        None, impl="xla",
        token_embeds=jnp.asarray(tok_emb)[None],
        mrope_pos=jnp.asarray(mpos, jnp.int32)[None],
    )
    got = np.asarray(got)[..., : want.shape[-1]]
    np.testing.assert_allclose(got, want, rtol=6e-3, atol=6e-3)
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))

"""Hybrid SSM+attention parity vs HF: jamba, falcon-h1, granite-hybrid
(reference: src/models/{jamba,falcon-h1,granite-hybrid}.cpp)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from vlut_tpu.convert.checkpoint import load_checkpoint
from vlut_tpu.convert.hybrid import convert_hybrid
from vlut_tpu.models.hybrid import forward

V = 64


def _run(model, tmp_path, t=12, rtol=6e-4, atol=6e-4):
    model = model.float().eval()
    model.save_pretrained(str(tmp_path / "hf"), safe_serialization=True)
    cfg = convert_hybrid(tmp_path / "hf", tmp_path / "out")
    cfg2, params, _ = load_checkpoint(tmp_path / "out")
    params = jax.tree.map(jnp.asarray, params)
    rng = np.random.default_rng(11)
    toks = rng.integers(0, V, (2, t))
    with torch.no_grad():
        want = model(torch.tensor(toks)).logits.numpy()
    got = np.asarray(forward(params, cfg2, jnp.asarray(toks, jnp.int32)))
    got = got[..., : want.shape[-1]]
    np.testing.assert_allclose(got, want, rtol=rtol, atol=atol)
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))
    return cfg2


def test_jamba_parity(tmp_path):
    """jamba: mamba1 mixer with dt/B/C RMSNorms, NoPE attention every
    attn_layer_period, MoE every expert_layer_period WITHOUT top-k
    renormalization."""
    c = transformers.JambaConfig(
        vocab_size=V, hidden_size=32, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=64, num_experts=4, num_experts_per_tok=2,
        expert_layer_period=2, expert_layer_offset=1,
        attn_layer_period=4, attn_layer_offset=2,
        mamba_d_state=16, mamba_d_conv=4, mamba_expand=2, mamba_dt_rank=8,
        max_position_embeddings=64, use_mamba_kernels=False,
    )
    torch.manual_seed(80)
    cfg = _run(transformers.JambaForCausalLM(c), tmp_path)
    assert cfg.layer_types == ("mamba", "mamba", "attention", "mamba")
    assert cfg.ffn_types == ("dense", "moe", "dense", "moe")
    assert not cfg.rope and not cfg.moe_renorm


def test_falcon_h1_parity(tmp_path):
    """falcon-h1: attention + mamba2 in PARALLEL per layer; all muP
    multipliers folded into weights at convert."""
    c = transformers.FalconH1Config(
        vocab_size=V, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        intermediate_size=64, mamba_d_ssm=64, mamba_n_heads=8,
        mamba_d_head=8, mamba_n_groups=2, mamba_d_state=16,
        mamba_d_conv=4, mamba_chunk_size=8,
        # non-trivial muP multipliers: the fold must reproduce them
        attention_in_multiplier=0.5, attention_out_multiplier=1.5,
        key_multiplier=2.0, ssm_in_multiplier=0.8,
        ssm_out_multiplier=1.25, ssm_multipliers=[1.1, 0.9, 1.2, 0.7, 1.3],
        mlp_multipliers=[0.6, 1.4], embedding_multiplier=2.0,
        lm_head_multiplier=0.75, max_position_embeddings=64,
    )
    torch.manual_seed(81)
    cfg = _run(transformers.FalconH1ForCausalLM(c), tmp_path)
    assert cfg.layer_types == ("parallel", "parallel")
    assert cfg.m2_norm_mode == "gate_only" and cfg.embed_scale == 2.0


def test_falcon_h1_rmsnorm_parity(tmp_path):
    """falcon-h1 with the gated mamba RMSNorm enabled (norm-before-gate)."""
    c = transformers.FalconH1Config(
        vocab_size=V, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        intermediate_size=64, mamba_d_ssm=64, mamba_n_heads=8,
        mamba_d_head=8, mamba_n_groups=2, mamba_d_state=16,
        mamba_d_conv=4, mamba_chunk_size=8, mamba_rms_norm=True,
        mamba_norm_before_gate=False, max_position_embeddings=64,
    )
    torch.manual_seed(82)
    cfg = _run(transformers.FalconH1ForCausalLM(c), tmp_path)
    assert cfg.m2_norm_mode == "gated"


def test_granite_hybrid_parity(tmp_path):
    """granite-hybrid: per-layer mamba2/attention (NoPE default), shared
    GLU + stacked-expert MoE with softmax-over-top-k gating, granite
    multipliers (residual folded, attention_multiplier as score scale,
    logits_scaling divides)."""
    c = transformers.GraniteMoeHybridConfig(
        vocab_size=V, hidden_size=32, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=48, shared_intermediate_size=64,
        num_local_experts=4, num_experts_per_tok=2,
        layer_types=["mamba", "attention", "mamba"],
        mamba_n_heads=8, mamba_d_head=8, mamba_n_groups=2,
        mamba_d_state=16, mamba_d_conv=4, mamba_expand=2,
        embedding_multiplier=2.0, attention_multiplier=0.1,
        residual_multiplier=0.5, logits_scaling=4.0,
        max_position_embeddings=64,
    )
    torch.manual_seed(83)
    cfg = _run(transformers.GraniteMoeHybridForCausalLM(c), tmp_path)
    assert cfg.layer_types == ("mamba2", "attention", "mamba2")
    assert cfg.ffn_types[0] == "shared_moe"
    assert not cfg.rope and cfg.attn_scale == 0.1
    assert cfg.logit_scale == 0.25 and cfg.embed_scale == 2.0


def test_lfm2_parity(tmp_path):
    """lfm2: gated short-conv mixer (B*x conv, C gate, no activation),
    attention layers with per-head q/k RMSNorm, embedding_norm final."""
    c = transformers.Lfm2Config(
        vocab_size=V, hidden_size=32, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=64, conv_L_cache=3,
        layer_types=["conv", "full_attention", "conv", "full_attention"],
        max_position_embeddings=64,
    )
    torch.manual_seed(84)
    cfg = _run(transformers.Lfm2ForCausalLM(c), tmp_path)
    assert cfg.layer_types == ("conv", "attention", "conv", "attention")
    assert cfg.qk_norm and cfg.tie_embeddings


def test_qwen3next_dense_parity(tmp_path):
    """qwen3next: gated-delta-net linear attention (l2-normed q/k, decay
    from A_log/dt_bias, beta-weighted delta rule, norm-then-gate RMSNorm)
    + gated full attention (per-head sigmoid output gate, partial rope)."""
    c = transformers.Qwen3NextConfig(
        vocab_size=V, hidden_size=32, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        intermediate_size=64, linear_num_value_heads=4,
        linear_num_key_heads=2, linear_key_head_dim=8,
        linear_value_head_dim=8, linear_conv_kernel_dim=3,
        layer_types=["linear_attention", "full_attention",
                     "linear_attention", "full_attention"],
        num_experts=0, max_position_embeddings=64,
    )
    torch.manual_seed(85)
    cfg = _run(transformers.Qwen3NextForCausalLM(c), tmp_path)
    assert cfg.layer_types == (
        "deltanet", "attention", "deltanet", "attention")
    assert cfg.attn_gate and cfg.rope_pct == 0.25


def test_qwen3next_moe_parity(tmp_path):
    """qwen3next with the sparse block: renormalized top-k experts + the
    sigmoid-gated shared expert."""
    c = transformers.Qwen3NextConfig(
        vocab_size=V, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        intermediate_size=64, moe_intermediate_size=32,
        shared_expert_intermediate_size=48,
        linear_num_value_heads=4, linear_num_key_heads=2,
        linear_key_head_dim=8, linear_value_head_dim=8,
        linear_conv_kernel_dim=3,
        layer_types=["linear_attention", "full_attention"],
        num_experts=4, num_experts_per_tok=2, decoder_sparse_step=1,
        max_position_embeddings=64,
    )
    torch.manual_seed(86)
    cfg = _run(transformers.Qwen3NextForCausalLM(c), tmp_path)
    assert cfg.ffn_types == ("moe_qwen", "moe_qwen")
    assert cfg.d_ff == 32 and cfg.n_experts == 4


def test_nemotron_h_mamba_twin(tmp_path):
    """nemotron-h all-'M' pattern == a standalone Mamba2 LM with the same
    weights (the standalone path is HF-verified in test_mamba2.py); plus a
    mixed M/*/- pattern runs with relu^2 FFN blocks and NoPE attention."""
    import json

    import numpy as np
    from safetensors.numpy import save_file

    from vlut_tpu.convert.convert import convert_hf
    from vlut_tpu.models.ssm import forward2

    rng = np.random.default_rng(14)
    D, NL, M2H, HD2, G, ST, DC = 32, 2, 8, 8, 2, 16, 4
    di = M2H * HD2
    conv_dim = di + 2 * G * ST
    proj_in = di + conv_dim + M2H

    def t2(k, n):
        return rng.integers(-1, 2, (n, k)).astype(np.float32) * 0.02

    common = {}
    for i in range(NL):
        p = f"backbone.layers.{i}."
        common[p + "norm.weight"] = np.abs(
            rng.standard_normal(D)).astype(np.float32) + 0.5
        common[p + "mixer.in_proj.weight"] = t2(D, proj_in)
        common[p + "mixer.out_proj.weight"] = t2(di, D)
        common[p + "mixer.conv1d.weight"] = rng.standard_normal(
            (conv_dim, 1, DC)).astype(np.float32) * 0.2
        common[p + "mixer.conv1d.bias"] = rng.standard_normal(
            conv_dim).astype(np.float32) * 0.1
        common[p + "mixer.norm.weight"] = np.abs(
            rng.standard_normal(di)).astype(np.float32) + 0.5
        common[p + "mixer.A_log"] = rng.uniform(
            0, 1, M2H).astype(np.float32)
        common[p + "mixer.dt_bias"] = rng.standard_normal(
            M2H).astype(np.float32) * 0.2
        common[p + "mixer.D"] = np.ones(M2H, np.float32)
    common["backbone.embeddings.weight"] = rng.standard_normal(
        (V, D)).astype(np.float32) * 0.02
    common["backbone.norm_f.weight"] = np.ones(D, np.float32)
    common["lm_head.weight"] = t2(D, V)

    cfg_nh = {
        "model_type": "nemotron_h", "architectures": ["NemotronHForCausalLM"],
        "vocab_size": V, "hidden_size": D, "num_hidden_layers": NL,
        "num_attention_heads": 4, "num_key_value_heads": 2,
        "intermediate_size": 48, "hybrid_override_pattern": "M" * NL,
        "mamba_num_heads": M2H, "mamba_head_dim": HD2, "n_groups": G,
        "ssm_state_size": ST, "conv_kernel": DC, "rms_norm_eps": 1e-5,
        "hidden_act": "relu2", "tie_word_embeddings": False,
        "max_position_embeddings": 64,
    }
    (tmp_path / "nh").mkdir()
    (tmp_path / "nh" / "config.json").write_text(json.dumps(cfg_nh))
    save_file({k: np.ascontiguousarray(v) for k, v in common.items()},
              str(tmp_path / "nh" / "model.safetensors"))
    cfg = convert_hf(tmp_path / "nh", tmp_path / "out_nh")
    assert cfg.layer_types == ("mamba2",) * NL
    assert cfg.ffn_types == ("none",) * NL and not cfg.rope

    # mamba2-standalone twin (codestral naming)
    m2 = {
        "backbone.embeddings.weight": common["backbone.embeddings.weight"],
        "backbone.norm_f.weight": common["backbone.norm_f.weight"],
        "lm_head.weight": common["lm_head.weight"],
    }
    for i in range(NL):
        pn, po = f"backbone.layers.{i}.", f"backbone.layers.{i}."
        m2[po + "norm.weight"] = common[pn + "norm.weight"]
        for sub in ("in_proj.weight", "out_proj.weight", "conv1d.weight",
                    "conv1d.bias", "A_log", "dt_bias", "D"):
            m2[po + "mixer." + sub] = common[pn + "mixer." + sub]
        m2[po + "mixer.norm.weight"] = common[pn + "mixer.norm.weight"]
    cfg2_raw = {
        "model_type": "mamba2", "architectures": ["Mamba2ForCausalLM"],
        "vocab_size": V, "hidden_size": D, "num_hidden_layers": NL,
        "num_heads": M2H, "head_dim": HD2, "n_groups": G,
        "state_size": ST, "conv_kernel": DC, "expand": 2,
        "layer_norm_epsilon": 1e-5, "tie_word_embeddings": False,
    }
    (tmp_path / "m2").mkdir()
    (tmp_path / "m2" / "config.json").write_text(json.dumps(cfg2_raw))
    save_file({k: np.ascontiguousarray(v) for k, v in m2.items()},
              str(tmp_path / "m2" / "model.safetensors"))
    convert_hf(tmp_path / "m2", tmp_path / "out_m2", dtype_hp="float32")

    from vlut_tpu.convert.checkpoint import load_checkpoint
    from vlut_tpu.models.hybrid import forward as hybrid_forward

    toks = rng.integers(0, V, (1, 9))
    cfg_h, p_h, _ = load_checkpoint(tmp_path / "out_nh")
    p_h = jax.tree.map(jnp.asarray, p_h)
    lg_h = np.asarray(hybrid_forward(
        cfg=cfg_h, params=p_h, tokens=jnp.asarray(toks, jnp.int32)))
    cfg_m, p_m, _ = load_checkpoint(tmp_path / "out_m2")
    p_m = jax.tree.map(jnp.asarray, p_m)
    lg_m, _ = forward2(p_m, cfg_m, jnp.asarray(toks, jnp.int32),
                       impl="dequant")
    np.testing.assert_allclose(
        lg_h[..., :V], np.asarray(lg_m)[..., :V], rtol=2e-4, atol=2e-4)

    # mixed pattern: M * - must convert and run
    cfg_mixed = dict(cfg_nh, hybrid_override_pattern="M*-"[:NL] + "M" * 0,
                     num_hidden_layers=NL)
    mixed = dict(common)
    # layer 1 becomes attention, layer... NL=2 -> pattern "M*"
    cfg_mixed["hybrid_override_pattern"] = "M*"
    p1 = "backbone.layers.1."
    for sub in list(mixed):
        if sub.startswith(p1 + "mixer."):
            del mixed[sub]
    mixed[p1 + "mixer.q_proj.weight"] = t2(D, D)
    mixed[p1 + "mixer.k_proj.weight"] = t2(D, 16)
    mixed[p1 + "mixer.v_proj.weight"] = t2(D, 16)
    mixed[p1 + "mixer.o_proj.weight"] = t2(D, D)
    (tmp_path / "mx").mkdir()
    (tmp_path / "mx" / "config.json").write_text(json.dumps(cfg_mixed))
    save_file({k: np.ascontiguousarray(v) for k, v in mixed.items()},
              str(tmp_path / "mx" / "model.safetensors"))
    cfgx = convert_hf(tmp_path / "mx", tmp_path / "out_mx")
    assert cfgx.layer_types == ("mamba2", "attention")
    cfg_x, p_x, _ = load_checkpoint(tmp_path / "out_mx")
    p_x = jax.tree.map(jnp.asarray, p_x)
    out = hybrid_forward(cfg=cfg_x, params=p_x,
                         tokens=jnp.asarray(toks, jnp.int32))
    assert np.isfinite(np.asarray(out)).all()


def test_plamo2_transcription(tmp_path):
    """plamo2 (reference src/models/plamo2.cpp; converter Plamo2Model
    convert_hf_to_gguf.py:4885-4975): mamba2-style scalar-A SSD mixer with
    dt/B/C RMS norms + per-head [z; x] in_proj on even layers, GQA
    attention (fused qkv, per-head q/k RMS norm, NEOX rope) on odd layers
    (mamba_step=2); every layer carries a fused-swiglu FFN and sandwich
    norms with +1 / +1/5 / +1/5^1.5 offsets folded at convert.  Full-model
    logits vs a direct numpy transcription of that graph."""
    import json as _json

    import numpy as np
    from safetensors.numpy import save_file

    from vlut_tpu.convert.convert import convert_hf

    rng = np.random.default_rng(51)
    D, NL, H, KV, HD = 32, 2, 4, 2, 8
    M2H, HD2, ST, DC, DTD, FF = 4, 8, 8, 4, 16, 48
    DI = M2H * HD2

    def r(*s):
        return (rng.standard_normal(s) * 0.1).astype(np.float32)

    t = {
        "model.embed_tokens.weight": r(V, D),
        "model.norm.weight": r(D),          # +1 at convert
        "lm_head.weight": r(V, D),
    }
    for i in range(NL):
        p = f"model.layers.layers.{i}."
        t[p + "pre_mixer_norm.weight"] = r(D)
        t[p + "post_mixer_norm.weight"] = r(D)
        t[p + "pre_mlp_norm.weight"] = r(D)
        t[p + "post_mlp_norm.weight"] = r(D)
        t[p + "mlp.gate_up_proj.weight"] = r(2 * FF, D)
        t[p + "mlp.down_proj.weight"] = r(D, FF)
    p0 = "model.layers.layers.0."   # mamba layer (i%2 != 1)
    t[p0 + "mixer.in_proj.weight"] = r(2 * DI, D)
    t[p0 + "mixer.conv1d.weight"] = r(DI, 1, DC)
    t[p0 + "mixer.bcdt_proj.weight"] = r(2 * ST + DTD, DI)
    t[p0 + "mixer.dt_proj.weight"] = r(M2H, DTD)
    t[p0 + "mixer.dt_bias"] = r(M2H)
    t[p0 + "mixer.dt_norm_weight"] = np.abs(r(DTD)) + 0.5
    t[p0 + "mixer.B_norm_weight"] = np.abs(r(ST)) + 0.5
    t[p0 + "mixer.C_norm_weight"] = np.abs(r(ST)) + 0.5
    t[p0 + "mixer.A_log"] = r(M2H)
    t[p0 + "mixer.D"] = np.abs(r(M2H)) + 0.5
    t[p0 + "mixer.out_proj.weight"] = r(D, DI)
    p1 = "model.layers.layers.1."   # attention layer
    t[p1 + "mixer.qkv_proj.weight"] = r((H + 2 * KV) * HD, D)
    t[p1 + "mixer.o_proj.weight"] = r(D, H * HD)
    t[p1 + "mixer.q_weight"] = np.abs(r(HD)) + 0.5
    t[p1 + "mixer.k_weight"] = np.abs(r(HD)) + 0.5

    cfg_raw = {
        "model_type": "plamo2", "architectures": ["Plamo2ForCausalLM"],
        "vocab_size": V, "hidden_size": D, "num_hidden_layers": NL,
        "num_attention_heads": H, "num_key_value_heads": KV,
        "hidden_size_per_head": HD, "intermediate_size": FF,
        "mamba_num_heads": M2H, "mamba_d_state": ST, "mamba_d_conv": DC,
        "mamba_step": 2, "mamba_enabled": True, "rms_norm_eps": 1e-6,
        "rope_theta": 10000.0, "tie_word_embeddings": False,
        "max_position_embeddings": 64,
    }
    (tmp_path / "hf").mkdir()
    (tmp_path / "hf" / "config.json").write_text(_json.dumps(cfg_raw))
    save_file({k: np.ascontiguousarray(v) for k, v in t.items()},
              str(tmp_path / "hf" / "model.safetensors"))
    cfg = convert_hf(tmp_path / "hf", tmp_path / "out")
    assert cfg.arch == "plamo2"
    assert cfg.layer_types == ("plamo2_mamba", "attention")

    cfg2, params, _ = load_checkpoint(tmp_path / "out")
    params = jax.tree.map(jnp.asarray, params)
    rng2 = np.random.default_rng(5)
    toks = rng2.integers(0, V, (2, 7))
    got = np.asarray(forward(params, cfg2, jnp.asarray(toks, jnp.int32)),
                     np.float64)

    # ---- numpy transcription -------------------------------------------
    eps = 1e-6

    def nrms(z, w):
        z = z.astype(np.float64)
        return z / np.sqrt((z * z).mean(-1, keepdims=True) + eps) * w

    def softplus(z):
        return np.log1p(np.exp(z))

    def silu(z):
        return z / (1 + np.exp(-z))

    B_, T_ = toks.shape
    x = t["model.embed_tokens.weight"][toks].astype(np.float64)

    # layer 0: mamba
    h = nrms(x, t[p0 + "pre_mixer_norm.weight"] + 1.0)
    zx = (h @ t[p0 + "mixer.in_proj.weight"].T).reshape(B_, T_, M2H,
                                                        2 * HD2)
    z = zx[..., :HD2].reshape(B_, T_, DI)
    xm = zx[..., HD2:].reshape(B_, T_, DI)
    cw = t[p0 + "mixer.conv1d.weight"][:, 0, :]  # (DI, DC)
    pad = np.concatenate([np.zeros((B_, DC - 1, DI)), xm], axis=1)
    xc = sum(pad[:, i : i + T_] * cw[None, None, :, i].transpose(0, 1, 2)
             for i in range(DC))
    xc = silu(xc)
    bcdt = xc @ t[p0 + "mixer.bcdt_proj.weight"].T.astype(np.float64)
    Bm = nrms(bcdt[..., :ST], t[p0 + "mixer.B_norm_weight"])
    Cm = nrms(bcdt[..., ST : 2 * ST], t[p0 + "mixer.C_norm_weight"])
    dt_in = nrms(bcdt[..., 2 * ST :], t[p0 + "mixer.dt_norm_weight"])
    dt = softplus(dt_in @ t[p0 + "mixer.dt_proj.weight"].T
                  + t[p0 + "mixer.dt_bias"])          # (B,T,M2H)
    A = -np.exp(t[p0 + "mixer.A_log"].astype(np.float64))
    y = np.zeros((B_, T_, DI))
    for bi in range(B_):
        S = np.zeros((M2H, HD2, ST))
        for ti in range(T_):
            for hh in range(M2H):
                dA = np.exp(dt[bi, ti, hh] * A[hh])
                xh = xc[bi, ti, hh * HD2 : (hh + 1) * HD2]
                S[hh] = S[hh] * dA + dt[bi, ti, hh] * np.outer(
                    xh, Bm[bi, ti])
                y[bi, ti, hh * HD2 : (hh + 1) * HD2] = S[hh] @ Cm[bi, ti]
    y = y + np.repeat(t[p0 + "mixer.D"], HD2) * xc
    y = silu(z) * y
    mix = y @ t[p0 + "mixer.out_proj.weight"].T
    mix = nrms(mix, t[p0 + "post_mixer_norm.weight"] + 0.2)
    x = x + mix
    # layer-0 FFN (fused swiglu)
    h = nrms(x, t[p0 + "pre_mlp_norm.weight"] + 1.0)
    gu = h @ t[p0 + "mlp.gate_up_proj.weight"].T
    fo = (silu(gu[..., :FF]) * gu[..., FF:]) @ t[p0 + "mlp.down_proj.weight"].T
    fo = nrms(fo, t[p0 + "post_mlp_norm.weight"] + 1.0 / 5 ** 1.5)
    x = x + fo

    # layer 1: attention
    h = nrms(x, t[p1 + "pre_mixer_norm.weight"] + 1.0)
    qkv = h @ t[p1 + "mixer.qkv_proj.weight"].T
    q = qkv[..., : H * HD].reshape(B_, T_, H, HD)
    k = qkv[..., H * HD : (H + KV) * HD].reshape(B_, T_, KV, HD)
    v = qkv[..., (H + KV) * HD :].reshape(B_, T_, KV, HD)
    q = nrms(q, t[p1 + "mixer.q_weight"])
    k = nrms(k, t[p1 + "mixer.k_weight"])
    inv = 1.0 / (10000.0 ** (np.arange(0, HD, 2) / HD))
    ang = np.arange(T_)[:, None] * inv[None]
    cos, sin = np.cos(ang)[None, :, None, :], np.sin(ang)[None, :, None, :]

    def rope(u):
        u1, u2 = u[..., : HD // 2], u[..., HD // 2 :]
        return np.concatenate([u1 * cos - u2 * sin, u2 * cos + u1 * sin],
                              -1)

    q, k = rope(q), rope(k)
    k = np.repeat(k, H // KV, axis=2)
    v = np.repeat(v, H // KV, axis=2)
    sc = np.einsum("bthd,bshd->bhts", q, k) / np.sqrt(HD)
    causal = np.where(np.arange(T_)[None, :] <= np.arange(T_)[:, None],
                      0.0, -1e30)
    sc = sc + causal[None, None]
    pm = np.exp(sc - sc.max(-1, keepdims=True))
    pm = pm / pm.sum(-1, keepdims=True)
    att = np.einsum("bhts,bshd->bthd", pm, v).reshape(B_, T_, H * HD)
    mix = att @ t[p1 + "mixer.o_proj.weight"].T
    mix = nrms(mix, t[p1 + "post_mixer_norm.weight"] + 0.2)
    x = x + mix
    h = nrms(x, t[p1 + "pre_mlp_norm.weight"] + 1.0)
    gu = h @ t[p1 + "mlp.gate_up_proj.weight"].T
    fo = (silu(gu[..., :FF]) * gu[..., FF:]) @ t[p1 + "mlp.down_proj.weight"].T
    fo = nrms(fo, t[p1 + "post_mlp_norm.weight"] + 1.0 / 5 ** 1.5)
    x = x + fo

    x = nrms(x, t["model.norm.weight"] + 1.0)
    want = x @ t["lm_head.weight"].T
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-5)
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))

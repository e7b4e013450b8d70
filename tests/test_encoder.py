"""Encoder (embedding-model) family: BERT + ModernBERT.

HF-parity on token hidden states and pooled embeddings, plus the
embedding-only server lane (reference: src/models/bert.cpp,
src/models/modern-bert.cpp, llama-server --embedding / --rerank on
encoder archs, tools/server README /embedding).
"""

import json
import urllib.request

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from vlut_tpu.convert.checkpoint import load_checkpoint
from vlut_tpu.convert.encoder import convert_encoder
from vlut_tpu.models.encoder import embed, forward_encoder

V = 96


def _save(model, hf_dir):
    model = model.float().eval()
    model.save_pretrained(str(hf_dir), safe_serialization=True)


def test_bert_parity(tmp_path):
    c = transformers.BertConfig(
        vocab_size=V, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=96,
        max_position_embeddings=64, type_vocab_size=2,
    )
    torch.manual_seed(50)
    m = transformers.BertModel(c)
    _save(m, tmp_path / "hf")
    cfg = convert_encoder(tmp_path / "hf", tmp_path / "out")
    assert cfg.arch == "bert" and cfg.pooling == "mean"
    cfg2, params, _ = load_checkpoint(tmp_path / "out")
    params = jax.tree.map(jnp.asarray, params)

    rng = np.random.default_rng(3)
    b, t = 2, 10
    toks = rng.integers(0, V, (b, t))
    mask = np.ones((b, t), np.int32)
    mask[1, 7:] = 0  # ragged batch: padding must be masked
    with torch.no_grad():
        want = m(
            torch.tensor(toks), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()
    got = np.asarray(forward_encoder(
        params, cfg2, jnp.asarray(toks, jnp.int32), jnp.asarray(mask)
    ))
    valid = mask.astype(bool)
    np.testing.assert_allclose(got[valid], want[valid], rtol=2e-4, atol=2e-4)

    e = np.asarray(embed(params, cfg2, jnp.asarray(toks, jnp.int32),
                         jnp.asarray(mask)))
    ref = (want * mask[..., None]).sum(1) / mask.sum(1)[:, None]
    ref = ref / np.linalg.norm(ref, axis=-1, keepdims=True)
    np.testing.assert_allclose(e, ref, rtol=2e-4, atol=2e-4)


def test_modernbert_parity(tmp_path):
    c = transformers.ModernBertConfig(
        vocab_size=V, hidden_size=48, num_hidden_layers=4,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, pad_token_id=0,
        global_attn_every_n_layers=3, local_attention=8,
        reference_compile=False, attn_implementation="eager",
    )
    torch.manual_seed(51)
    m = transformers.ModernBertModel(c)
    _save(m, tmp_path / "hf")
    cfg = convert_encoder(tmp_path / "hf", tmp_path / "out")
    assert cfg.arch == "modernbert" and cfg.local_window == 8
    cfg2, params, _ = load_checkpoint(tmp_path / "out")
    params = jax.tree.map(jnp.asarray, params)

    rng = np.random.default_rng(4)
    b, t = 2, 16  # t > window: the local layers must actually mask
    toks = rng.integers(1, V, (b, t))
    mask = np.ones((b, t), np.int32)
    mask[0, 12:] = 0
    with torch.no_grad():
        want = m(
            torch.tensor(toks), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()
    got = np.asarray(forward_encoder(
        params, cfg2, jnp.asarray(toks, jnp.int32), jnp.asarray(mask)
    ))
    valid = mask.astype(bool)
    np.testing.assert_allclose(got[valid], want[valid], rtol=5e-4, atol=5e-4)


def test_encoder_server(tmp_path):
    """Encoder checkpoint through the HTTP server: /embedding works,
    completion endpoints refuse with a clean error."""
    from vlut_tpu.serving.server import serve_multi
    from vlut_tpu.utils.tokenizer import Tokenizer

    c = transformers.BertConfig(
        vocab_size=V, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64,
    )
    torch.manual_seed(52)
    m = transformers.BertModel(c)
    _save(m, tmp_path / "hf")
    # give it a real tokenizer so the server can encode text
    from tokenizers import Tokenizer as TK, models
    from tokenizers.pre_tokenizers import Split
    from transformers import PreTrainedTokenizerFast

    vocab = {chr(32 + i): i for i in range(V)}
    tk = TK(models.WordLevel(vocab, unk_token=" "))
    tk.pre_tokenizer = Split("", "isolated")
    fast = PreTrainedTokenizerFast(tokenizer_object=tk, unk_token=" ")
    fast.save_pretrained(str(tmp_path / "hf"))

    convert_encoder(tmp_path / "hf", tmp_path / "out")
    cfg2, params, _ = load_checkpoint(tmp_path / "out")
    params = jax.tree.map(jnp.asarray, params)

    httpd, router = serve_multi(
        {"emb": (None, Tokenizer(str(tmp_path / "out")), (cfg2, params))},
        port=0,
    )
    port = httpd.server_address[1]
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/embeddings",
            data=json.dumps({"input": ["hello", "hi"]}).encode(),
            headers={"Content-Type": "application/json"},
        )
        out = json.loads(urllib.request.urlopen(req, timeout=120).read())
        assert len(out["data"]) == 2
        v0 = np.asarray(out["data"][0]["embedding"])
        assert v0.shape == (32,)
        assert abs(np.linalg.norm(v0) - 1.0) < 1e-3

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/completion",
            data=json.dumps({"prompt": "x"}).encode(),
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(req, timeout=60)
            raise AssertionError("completion on encoder must fail")
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "embedding-only" in e.read().decode()
    finally:
        httpd.shutdown()

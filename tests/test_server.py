"""HTTP server integration on the tiny model (reference: server pytest
suite, tools/server/tests)."""

import http.client
import json

import pytest

from vlut_tpu.config import PRESETS
from vlut_tpu.models.transformer import init_params
from vlut_tpu.runtime.engine import Engine
from vlut_tpu.serving.server import serve


class StubTokenizer:
    """Byte-level stand-in (HF tokenizers need network/model files)."""

    eos_id = 0
    bos_id = 1

    def encode(self, text, add_bos=True):
        ids = [1] if add_bos else []
        return ids + [2 + (b % 200) for b in text.encode()]

    def decode(self, ids):
        return "".join(chr(97 + (i % 26)) for i in ids if i >= 2)

    def apply_chat_template(self, messages, add_generation_prompt=True):
        out = [1]
        for m in messages:
            out += self.encode(m.get("content", ""), add_bos=False)
        return out


@pytest.fixture(scope="module")
def server():
    cfg = PRESETS["tiny"]
    params = init_params(cfg, seed=0)
    engine = Engine(cfg, params, n_slots=2, max_len=64, impl="xla")
    httpd, state = serve(engine, StubTokenizer(), port=18432)
    yield "127.0.0.1", 18432
    state.running = False
    httpd.shutdown()


def _req(hostport, method, path, body=None):
    conn = http.client.HTTPConnection(*hostport, timeout=300)
    conn.request(
        method, path,
        body=json.dumps(body) if body is not None else None,
        headers={"Content-Type": "application/json"},
    )
    r = conn.getresponse()
    data = r.read()
    conn.close()
    return r.status, data


def test_health(server):
    status, data = _req(server, "GET", "/health")
    assert status == 200
    assert json.loads(data)["status"] == "ok"


def test_completion(server):
    status, data = _req(
        server, "POST", "/completion",
        {"prompt": "hello", "n_predict": 4, "temperature": 0.0,
         "ignore_eos": True},
    )
    assert status == 200
    out = json.loads(data)
    assert out["tokens_predicted"] == 4
    assert isinstance(out["content"], str)


def test_chat(server):
    status, data = _req(
        server, "POST", "/v1/chat/completions",
        {"messages": [{"role": "user", "content": "hi"}],
         "max_tokens": 3, "temperature": 0.0, "ignore_eos": True},
    )
    assert status == 200
    out = json.loads(data)
    assert out["choices"][0]["message"]["role"] == "assistant"
    assert out["usage"]["completion_tokens"] == 3


def test_metrics_and_slots(server):
    status, data = _req(server, "GET", "/metrics")
    assert status == 200
    assert b"vlut_requests_total" in data
    status, data = _req(server, "GET", "/slots")
    assert status == 200
    assert len(json.loads(data)) == 2

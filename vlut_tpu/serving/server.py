"""OpenAI-compatible HTTP server over the slot Engine.

The TPU re-architecture of tools/server (SURVEY §3.3): the reference runs a
task queue feeding `update_slots` on a dedicated inference thread; here a
stdlib ThreadingHTTPServer parks request threads on per-request events
while a single engine thread drives Engine.step() continuously (continuous
batching).  Endpoints (reference: tools/server/README.md:341+):

  POST /completion, /v1/completions   — plain completion
  POST /v1/chat/completions           — chat-template completion
  GET  /health                        — liveness (reference :343)
  GET  /metrics                       — Prometheus text (reference :988)
  GET  /slots                         — slot introspection

No SSE streaming yet (queued work); responses are returned whole.
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any

from vlut_tpu.runtime.engine import Engine, Request
from vlut_tpu.runtime.sampling import SamplerParams
from vlut_tpu.utils.tokenizer import Tokenizer


class ServerState:
    def __init__(self, engine: Engine, tokenizer: Tokenizer):
        self.engine = engine
        self.tok = tokenizer
        self.lock = threading.Lock()
        self.events: dict[int, threading.Event] = {}
        self.metrics = {
            "prompt_tokens_total": 0,
            "generated_tokens_total": 0,
            "requests_total": 0,
        }
        self.running = True
        self.thread = threading.Thread(target=self._loop, daemon=True)

    def start(self):
        self.thread.start()

    def _loop(self):
        while self.running:
            with self.lock:
                busy = self.engine.step()
                done = [
                    rid for rid, ev in self.events.items()
                    if self._find_done(rid)
                ]
                for rid in done:
                    self.events[rid].set()
            if not busy:
                time.sleep(0.005)

    def _find_done(self, rid: int) -> bool:
        for r in self.engine.queue:
            if r.rid == rid:
                return False
        for s in self.engine.slots:
            if s.req is not None and s.req.rid == rid:
                return False
        return True

    def submit_and_wait(self, req: Request, timeout: float = 600.0):
        ev = threading.Event()
        with self.lock:
            rid = self.engine.submit(req)
            self.events[rid] = ev
            self.metrics["requests_total"] += 1
            self.metrics["prompt_tokens_total"] += len(req.prompt)
        ok = ev.wait(timeout)
        with self.lock:
            self.events.pop(rid, None)
            self.metrics["generated_tokens_total"] += len(req.output)
        if not ok:
            raise TimeoutError(f"request {rid} timed out")
        return req


def _sampler_from_body(body: dict[str, Any]) -> SamplerParams:
    return SamplerParams(
        temperature=float(body.get("temperature", 0.8)),
        top_k=int(body.get("top_k", 40)),
        top_p=float(body.get("top_p", 0.95)),
        min_p=float(body.get("min_p", 0.05)),
        repeat_penalty=float(body.get("repeat_penalty", 1.0)),
        presence_penalty=float(body.get("presence_penalty", 0.0)),
        frequency_penalty=float(body.get("frequency_penalty", 0.0)),
        seed=int(body.get("seed", 0)),
    )


def make_handler(state: ServerState):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # quiet
            pass

        def _json(self, code: int, obj: Any):
            data = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            if self.path == "/health":
                self._json(200, {"status": "ok"})
            elif self.path == "/metrics":
                lines = []
                for k, v in state.metrics.items():
                    lines.append(f"# TYPE vlut_{k} counter")
                    lines.append(f"vlut_{k} {v}")
                busy = sum(
                    1 for s in state.engine.slots if s.req is not None
                )
                lines.append("# TYPE vlut_slots_busy gauge")
                lines.append(f"vlut_slots_busy {busy}")
                data = ("\n".join(lines) + "\n").encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/plain")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)
            elif self.path == "/slots":
                slots = [
                    {
                        "id": i,
                        "busy": s.req is not None,
                        "length": s.length,
                        "generated": s.generated,
                    }
                    for i, s in enumerate(state.engine.slots)
                ]
                self._json(200, slots)
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            try:
                body = json.loads(self.rfile.read(n) or b"{}")
            except json.JSONDecodeError:
                self._json(400, {"error": "bad json"})
                return
            try:
                if self.path in ("/completion", "/v1/completions"):
                    self._completion(body)
                elif self.path == "/v1/chat/completions":
                    self._chat(body)
                else:
                    self._json(404, {"error": "not found"})
            except Exception as e:  # noqa: BLE001
                self._json(500, {"error": str(e)})

        def _run(self, prompt_ids, body):
            stop = ()
            if state.tok.eos_id is not None and not body.get(
                "ignore_eos", False
            ):
                stop = (state.tok.eos_id,)
            req = Request(
                prompt=prompt_ids,
                max_new_tokens=int(
                    body.get("n_predict", body.get("max_tokens", 128))
                ),
                sampler=_sampler_from_body(body),
                stop_tokens=stop,
            )
            state.submit_and_wait(req)
            out_ids = req.output
            if out_ids and out_ids[-1] in stop:
                out_ids = out_ids[:-1]
            return req, state.tok.decode(out_ids)

        def _completion(self, body):
            prompt = body.get("prompt", "")
            ids = (
                prompt
                if isinstance(prompt, list)
                else state.tok.encode(prompt)
            )
            req, text = self._run(ids, body)
            self._json(200, {
                "content": text,
                "tokens_predicted": len(req.output),
                "tokens_evaluated": len(req.prompt),
                "stop": True,
            })

        def _chat(self, body):
            msgs = body.get("messages", [])
            ids = state.tok.apply_chat_template(msgs)
            req, text = self._run(ids, body)
            self._json(200, {
                "object": "chat.completion",
                "choices": [{
                    "index": 0,
                    "message": {"role": "assistant", "content": text},
                    "finish_reason": "stop",
                }],
                "usage": {
                    "prompt_tokens": len(req.prompt),
                    "completion_tokens": len(req.output),
                    "total_tokens": len(req.prompt) + len(req.output),
                },
            })

    return Handler


def serve(
    engine: Engine,
    tokenizer: Tokenizer,
    host: str = "127.0.0.1",
    port: int = 8080,
) -> tuple[ThreadingHTTPServer, ServerState]:
    """Start engine loop + HTTP server (returns without blocking)."""
    state = ServerState(engine, tokenizer)
    state.start()
    httpd = ThreadingHTTPServer((host, port), make_handler(state))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return httpd, state


def main(argv=None):
    import argparse

    from vlut_tpu.convert.checkpoint import load_checkpoint

    ap = argparse.ArgumentParser(description="vlut_tpu server")
    ap.add_argument("--model", required=True, help="checkpoint dir")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--ctx", type=int, default=4096)
    args = ap.parse_args(argv)

    import jax

    cfg, params, _ = load_checkpoint(args.model)
    params = jax.device_put(params)
    engine = Engine(cfg, params, n_slots=args.slots, max_len=args.ctx)
    tok = Tokenizer(args.model)
    httpd, _ = serve(engine, tok, args.host, args.port)
    print(f"listening on http://{args.host}:{args.port}")
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        httpd.shutdown()


if __name__ == "__main__":
    main()

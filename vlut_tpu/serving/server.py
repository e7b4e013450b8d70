"""OpenAI-compatible HTTP server over the slot Engine.

The TPU re-architecture of tools/server (SURVEY §3.3): the reference runs a
task queue feeding `update_slots` on a dedicated inference thread; here a
stdlib ThreadingHTTPServer parks request threads on per-request events
while a single engine thread drives Engine.step() continuously (continuous
batching).  Endpoints (reference: tools/server/README.md:341+):

  POST /completion, /v1/completions   — plain completion (+SSE streaming)
  POST /v1/chat/completions           — chat-template completion (+SSE)
  POST /infill                        — fill-in-middle completion
  POST /embedding, /v1/embeddings     — pooled final-hidden embeddings
  POST /rerank, /v1/rerank            — query/document relevance scores
  POST /tokenize, /detokenize         — vocab round-trips
  POST /apply-template                — chat template expansion only
  POST /slots/{id}?action=save|restore|erase — slot KV state management
  GET  /health                        — liveness (reference :343)
  GET  /metrics                       — Prometheus text (reference :988)
  GET  /slots                         — slot introspection
  GET  /props, /v1/models             — model/server properties

Request fields mirror the reference's completion API: prompt, n_predict /
max_tokens, temperature, top_k, top_p, min_p, typ_p, xtc_probability,
xtc_threshold, top_n_sigma, mirostat{,_tau,_eta}, dynatemp_{range,exponent},
repeat_penalty, presence_penalty, frequency_penalty, dry_{multiplier,base,
allowed_length}, logit_bias, seed, stop (strings), grammar (GBNF),
json_schema / response_format, stream, ignore_eos.
"""

from __future__ import annotations

import json
import os
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any
from urllib.parse import parse_qs, urlparse

from vlut_tpu.runtime.engine import Engine, Request
from vlut_tpu.runtime.sampling import SamplerParams
from vlut_tpu.utils.tokenizer import Tokenizer


class ServerState:
    def __init__(self, engine: Engine | None, tokenizer: Tokenizer,
                 model_name: str = "vlut-tpu", encoder=None):
        # encoder: (EncoderConfig, params) for encoder-only (embedding)
        # checkpoints — BERT/ModernBERT served through /embedding with no
        # engine loop (reference: llama-server --embedding on bert archs)
        self.engine = engine
        self.encoder = encoder
        self.tok = tokenizer
        self.model_name = model_name
        self.lock = threading.Lock()
        self.events: dict[int, threading.Event] = {}
        self.metrics = {
            "prompt_tokens_total": 0,
            "generated_tokens_total": 0,
            "requests_total": 0,
            "requests_errors_total": 0,
        }
        self.slot_files: dict[str, bytes] = {}  # in-memory slot save area
        self.running = True
        self.thread = threading.Thread(target=self._loop, daemon=True)
        self._embed_fn = None
        self._rerank_fns: dict[tuple[int, int], Any] = {}

    def start(self):
        if self.engine is not None:
            self.thread.start()

    def stop(self):
        self.running = False

    def _loop(self):
        while self.running:
            with self.lock:
                try:
                    busy = self.engine.step()
                except Exception:  # noqa: BLE001
                    # One bad request (grammar bug, OOM on a pathological
                    # shape, ...) must not kill the engine thread — every
                    # in-flight AND future request would then hang forever.
                    # Fail everything currently in flight and keep serving.
                    import traceback

                    traceback.print_exc()
                    self.metrics["requests_errors_total"] += 1
                    for r in list(self.engine.queue):
                        self.engine.cancel(r.rid)
                    for s in self.engine.slots:
                        if s.req is not None:
                            self.engine.cancel(s.req.rid)
                    busy = False
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

    def submit(self, req: Request) -> threading.Event:
        ev = threading.Event()
        with self.lock:
            rid = self.engine.submit(req)
            self.events[rid] = ev
            self.metrics["requests_total"] += 1
            self.metrics["prompt_tokens_total"] += len(req.prompt)
        return ev

    def finish(self, req: Request):
        with self.lock:
            self.events.pop(req.rid, None)
            self.metrics["generated_tokens_total"] += len(req.output)

    def cancel(self, req: Request):
        with self.lock:
            self.engine.cancel(req.rid)
            ev = self.events.pop(req.rid, None)
        if ev:
            ev.set()

    # --- embeddings (pooled final-hidden states) --------------------------

    def embed(self, ids_list: list[list[int]], pooling: str = "mean"):
        """Batched embedding over token id lists.  Pooling: mean | last |
        cls (reference: llama_pooling_type, src/llama-context.cpp)."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from vlut_tpu.models.transformer import forward

        if self.encoder is not None:
            return self._embed_encoder(ids_list)
        cfg = self.engine.cfg
        t_max = max(1, max(len(x) for x in ids_list))
        # pad to a bucket to bound recompiles
        bucket = 16
        while bucket < t_max:
            bucket *= 2
        b = len(ids_list)
        toks = np.zeros((b, bucket), np.int32)
        pos = np.zeros((b, bucket), np.int32)
        lens = np.asarray([len(x) for x in ids_list], np.int32)
        for i, ids in enumerate(ids_list):
            toks[i, : len(ids)] = ids
            pos[i, : bucket] = np.arange(bucket)

        if self._embed_fn is None:
            @jax.jit
            def _embed(params, toks, pos, lens):
                hidden, _ = forward(
                    params, cfg, toks, pos, None, output="hidden"
                )
                hidden = hidden.astype(jnp.float32)
                t = hidden.shape[1]
                valid = (jnp.arange(t)[None, :] < lens[:, None])
                mean = (hidden * valid[..., None]).sum(1) / jnp.maximum(
                    lens[:, None], 1
                )
                last = hidden[jnp.arange(hidden.shape[0]), lens - 1]
                cls = hidden[:, 0]
                return mean, last, cls

            self._embed_fn = _embed

        # NO engine lock: params are immutable and device execution
        # serializes per-launch, so embeddings interleave with decode steps
        # instead of stalling every streaming request for a full forward
        mean, last, cls = self._embed_fn(
            self.engine.params, jnp.asarray(toks), jnp.asarray(pos),
            jnp.asarray(lens),
        )
        out = {"mean": mean, "last": last, "cls": cls}[pooling]
        out = np.asarray(out)
        # L2-normalize (reference: embd_normalize default 2 in server)
        norms = np.linalg.norm(out, axis=-1, keepdims=True)
        return out / np.maximum(norms, 1e-12)

    def _embed_encoder(self, ids_list: list[list[int]]):
        """Encoder-checkpoint embedding: bidirectional forward + the
        checkpoint's pooling (models/encoder.py)."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from vlut_tpu.models.encoder import embed as enc_embed

        cfg, params = self.encoder
        t_max = max(1, max(len(x) for x in ids_list))
        bucket = 16
        while bucket < t_max:
            bucket *= 2
        bucket = min(bucket, cfg.max_seq_len)
        b = len(ids_list)
        toks = np.zeros((b, bucket), np.int32)
        mask = np.zeros((b, bucket), np.int32)
        for i, ids in enumerate(ids_list):
            ids = ids[:bucket]
            toks[i, : len(ids)] = ids
            mask[i, : len(ids)] = 1
        if self._embed_fn is None:
            self._embed_fn = jax.jit(
                lambda p, t, m: enc_embed(p, cfg, t, m)
            )
        out = self._embed_fn(params, jnp.asarray(toks), jnp.asarray(mask))
        return np.asarray(out)

    def rerank(self, query_ids, doc_ids_list):
        """Relevance score per (query, doc): mean log-prob of the document
        tokens conditioned on the query (likelihood scoring).

        The reference serves dedicated reranker checkpoints with a rank
        head (tools/server /rerank, pooling_type RANK + cls tensor);
        checkpoints converted from *ForSequenceClassification carry that
        head as params["rank_head"] and score with it directly.
        Generative checkpoints score by conditional likelihood instead —
        same API, monotone-equivalent use.

        All documents score in ONE padded batch forward with a T-chunked
        output head (full (B, T, V) logits would be GBs at 128k vocab),
        and WITHOUT the engine lock — decode steps interleave.
        """
        import jax
        import jax.numpy as jnp
        import numpy as np

        from vlut_tpu.models.transformer import forward

        cfg = self.engine.cfg
        seqs = [list(query_ids) + list(d) for d in doc_ids_list]
        t_max = max(len(s) for s in seqs)
        bucket = 16
        while bucket < t_max:
            bucket *= 2
        b = len(seqs)
        toks = np.zeros((b, bucket), np.int32)
        lens = np.asarray([len(s) for s in seqs], np.int32)
        for i, s in enumerate(seqs):
            toks[i, : len(s)] = s

        key = (b, bucket)
        if key not in self._rerank_fns:
            chunk = 32
            has_rank_head = "rank_head" in self.engine.params

            @jax.jit
            def _score(params, toks, lens, q_len):
                bt, t = toks.shape
                pos = jnp.tile(
                    jnp.arange(t, dtype=jnp.int32)[None], (bt, 1)
                )
                hidden, _ = forward(
                    params, cfg, toks, pos, None, output="hidden"
                )
                if has_rank_head:
                    rh = params["rank_head"]
                    h_last = hidden[
                        jnp.arange(bt), lens - 1
                    ].astype(jnp.float32)
                    sc = h_last @ rh["w"].astype(jnp.float32)
                    if "b" in rh:
                        sc = sc + rh["b"].astype(jnp.float32)
                    return sc[:, 0]
                head = params.get("lm_head")
                targets = jnp.concatenate(
                    [toks[:, 1:], jnp.zeros((bt, 1), jnp.int32)], axis=1
                )
                nc = -(-t // chunk)
                hpad = jnp.pad(hidden, ((0, 0), (0, nc * chunk - t), (0, 0)))
                tpad = jnp.pad(targets, ((0, 0), (0, nc * chunk - t)))

                def one(ci):
                    h = jax.lax.dynamic_slice_in_dim(
                        hpad, ci * chunk, chunk, axis=1
                    ).astype(jnp.float32)
                    tg = jax.lax.dynamic_slice_in_dim(
                        tpad, ci * chunk, chunk, axis=1
                    )
                    if isinstance(head, dict):  # int8-quantized head
                        from vlut_tpu.ops.quant import quantize_activations

                        hq, hs = quantize_activations(
                            h.reshape(bt * chunk, -1)
                        )
                        lg = (
                            jax.lax.dot_general(
                                hq, head["q"],
                                dimension_numbers=(((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32,
                            ).astype(jnp.float32)
                            * hs
                            * head["scale"].astype(jnp.float32)[None, :]
                        ).reshape(bt, chunk, -1)
                    else:
                        hd = (
                            params["embed"].T if head is None else head
                        )
                        lg = jnp.einsum(
                            "bcd,dv->bcv", h, hd.astype(jnp.float32)
                        )
                    lg = lg[..., : cfg.vocab_size]
                    lse = jax.nn.logsumexp(lg, axis=-1)
                    tgl = jnp.take_along_axis(
                        lg, tg[..., None], axis=-1
                    )[..., 0]
                    return tgl - lse  # (B, chunk) logprob of target

                lps = jax.lax.map(one, jnp.arange(nc))  # (nc, B, chunk)
                lps = jnp.moveaxis(lps, 0, 1).reshape(bt, nc * chunk)[:, :t]
                # mean over the doc region [q_len-1, len-1)
                idx = jnp.arange(t)[None, :]
                m = (idx >= q_len - 1) & (idx < lens[:, None] - 1)
                tot = (lps * m).sum(-1)
                return tot / jnp.maximum(m.sum(-1), 1)

            self._rerank_fns[key] = _score
        out = self._rerank_fns[key](
            self.engine.params, jnp.asarray(toks), jnp.asarray(lens),
            jnp.int32(len(query_ids)),
        )
        return [float(x) for x in np.asarray(out)]


def _sampler_from_body(body: dict[str, Any]) -> SamplerParams:
    bias: list[tuple[int, float]] = []
    lb = body.get("logit_bias")
    if isinstance(lb, dict):
        bias = [(int(k), float(v)) for k, v in lb.items()]
    elif isinstance(lb, list):
        bias = [(int(t), float(v)) for t, v in lb]
    mirostat = int(body.get("mirostat", 0))
    return SamplerParams(
        temperature=float(body.get("temperature", 0.8)),
        top_k=int(body.get("top_k", 40)),
        top_p=float(body.get("top_p", 0.95)),
        min_p=float(body.get("min_p", 0.05)),
        typical_p=float(body.get("typ_p", body.get("typical_p", 1.0))),
        dynatemp_range=float(body.get("dynatemp_range", 0.0)),
        dynatemp_exponent=float(body.get("dynatemp_exponent", 1.0)),
        xtc_p=float(body.get("xtc_probability", 0.0)),
        xtc_t=float(body.get("xtc_threshold", 0.1)),
        top_n_sigma=float(body.get("top_n_sigma", 0.0)),
        mirostat_tau=float(body.get("mirostat_tau", 5.0)) if mirostat else 0.0,
        mirostat_eta=float(body.get("mirostat_eta", 0.1)),
        repeat_penalty=float(body.get("repeat_penalty", 1.0)),
        presence_penalty=float(body.get("presence_penalty", 0.0)),
        frequency_penalty=float(body.get("frequency_penalty", 0.0)),
        penalty_last_n=int(body.get("repeat_last_n", 64)),
        dry_multiplier=float(body.get("dry_multiplier", 0.0)),
        dry_base=float(body.get("dry_base", 1.75)),
        dry_allowed_length=int(body.get("dry_allowed_length", 2)),
        logit_bias=tuple(bias),
        seed=int(body.get("seed", 0)),
    )


def _grammar_from_body(body: dict[str, Any], tok: Tokenizer):
    from vlut_tpu.runtime.grammar import json_schema_to_gbnf, regex_to_gbnf

    if body.get("grammar"):
        g = tok.make_grammar(body["grammar"])
        trig = body.get("grammar_triggers")
        if body.get("grammar_lazy") and trig:
            # trigger-activated grammar (reference: common/chat.cpp
            # grammar_lazy + grammar_triggers): free-form text until a
            # trigger string appears, constrained from there on
            from vlut_tpu.runtime.grammar import LazyGrammarSampler

            g = LazyGrammarSampler(g, trig)
        return g
    # regex constraints (the reference's opt-in llguidance lane; the
    # `guided_regex` alias matches the common OpenAI-compat extension)
    rx = body.get("regex") or body.get("guided_regex")
    if rx:
        return tok.make_grammar(regex_to_gbnf(rx))
    schema = body.get("json_schema")
    rf = body.get("response_format") or {}
    if schema is None and rf.get("type") == "json_schema":
        schema = (rf.get("json_schema") or {}).get("schema", {})
    if schema is None and rf.get("type") == "json_object":
        schema = {}
    if schema is not None:
        return tok.make_grammar(json_schema_to_gbnf(schema))
    return None


def _parse_tool_calls(text: str):
    """Multi-format tool-call extraction (reference: common/chat.cpp's
    per-template parser suite).  Formats, tried in order:

    1. Hermes/Qwen  — <tool_call>{...}</tool_call> blocks (parallel calls)
    2. functionary  — <function=NAME>{json args}</function>
    3. Mistral      — [TOOL_CALLS] [{...}, {...}] JSON array
    4. fenced JSON  — ```json\n{...}\n``` with a name+arguments shape
    5. bare JSON    — whole message is one {"name", "arguments"} object
       (Llama-3.x "parameters" spelling accepted)
    6. Llama-3.x builtin — <|python_tag|>code... becomes an ipython
       call {"code": ...} (chat.cpp llama-3.x builtin-tools path)
    7. DeepSeek V3/R1 — <tool_call_begin>function<tool_sep>NAME
       ```json args``` <tool_call_end> blocks (the fullwidth-bar
       markers; chat.cpp COMMON_CHAT_FORMAT_DEEPSEEK_*)
    8. Command-R7B  — <|START_ACTION|>[{"tool_name","parameters"}, ...]
       <|END_ACTION|> (chat.cpp COMMON_CHAT_FORMAT_COMMAND_R7B)
    9. Granite      — <|tool_call|>[{...}] array prefix

    Round-4 additions (checked BEFORE the generic forms — several reuse
    the <tool_call> envelope):

    10. GLM 4.5       — <tool_call>NAME <arg_key>/<arg_value> XML pairs
    11. Qwen3-coder   — <tool_call><function=NAME><parameter=K>raw-or-
        JSON values (COMMON_CHAT_FORMAT_QWEN3_CODER_XML)
    12. Seed-OSS      — <seed:tool_call><function=NAME><parameter=K>
    13. MiniMax-M2    — <minimax:tool_call><invoke name="..">
        <parameter name="..">
    14. Kimi-K2       — <|tool_calls_section_begin|> blocks with
        functions.NAME:idx ids + JSON args
    15. Nemotron-v2   — <TOOLCALL>[{name,arguments}...]</TOOLCALL>
    16. Apriel-1.5    — <tool_calls>[{...}]</tool_calls>
    17. LFM2          — <|tool_call_start|>[{...}]<|tool_call_end|>
    18. Apertus       — <|tools_prefix|>[{NAME: args}, ...]<|tools_suffix|>
    19. GPT-OSS       — harmony channels: "to=functions.NAME ...
        <|message|>{args}<|call|>"; final channel is the content
        (chat-parser.cpp common_chat_parse_gpt_oss)
    """
    calls = []
    import re

    def _shaped(obj):
        return isinstance(obj, dict) and "name" in obj and (
            "arguments" in obj or "parameters" in obj
        )

    def _val(s):
        """XML arg value: JSON when it parses, raw string otherwise
        (reference chat-parser-xml-toolcall.cpp value handling)."""
        s = s.strip()
        try:
            return json.loads(s)
        except json.JSONDecodeError:
            return s

    # --- GLM 4.5: <tool_call>NAME <arg_key>K</arg_key><arg_value>V
    # </arg_value>...</tool_call> (chat.cpp init_glm_4_5 — must be checked
    # before Hermes, both use <tool_call>)
    if "<arg_key>" in text:
        for m in re.finditer(r"<tool_call>\s*([\w./:-]+)\s*(.*?)</tool_call>",
                             text, re.DOTALL):
            args = {
                k: _val(v) for k, v in re.findall(
                    r"<arg_key>(.*?)</arg_key>\s*<arg_value>(.*?)"
                    r"</arg_value>", m.group(2), re.DOTALL)
            }
            calls.append({"name": m.group(1), "arguments": args})
        if calls:
            rest = re.sub(r"<tool_call>.*?</tool_call>", "", text,
                          flags=re.DOTALL).strip()
            return calls, rest

    # --- Qwen3-coder XML: <tool_call><function=NAME><parameter=K>V
    # </parameter>...</function></tool_call> (chat.cpp
    # init_qwen3_coder_xml; values raw-or-JSON)
    if "<function=" in text and "<tool_call>" in text:
        for m in re.finditer(
            r"<tool_call>\s*<function=([\w.-]+)>\s*(.*?)</function>\s*"
            r"</tool_call>", text, re.DOTALL,
        ):
            args = {
                k: _val(v) for k, v in re.findall(
                    r"<parameter=([\w.-]+)>\s*(.*?)\s*</parameter>",
                    m.group(2), re.DOTALL)
            }
            calls.append({"name": m.group(1), "arguments": args})
        if calls:
            rest = re.sub(r"<tool_call>.*?</tool_call>", "", text,
                          flags=re.DOTALL).strip()
            return calls, rest

    # --- Seed-OSS: <seed:tool_call><function=NAME><parameter=K>V
    # </parameter>...</function></seed:tool_call> (chat.cpp init_seed_oss)
    if "<seed:tool_call>" in text:
        for m in re.finditer(
            r"<seed:tool_call>\s*<function=([\w.-]+)>\s*(.*?)"
            r"</function>\s*</seed:tool_call>", text, re.DOTALL,
        ):
            args = {
                k: _val(v) for k, v in re.findall(
                    r"<parameter=([\w.-]+)>\s*(.*?)\s*</parameter>",
                    m.group(2), re.DOTALL)
            }
            calls.append({"name": m.group(1), "arguments": args})
        if calls:
            rest = re.sub(r"<seed:tool_call>.*?</seed:tool_call>", "",
                          text, flags=re.DOTALL).strip()
            return calls, rest

    # --- MiniMax-M2: <minimax:tool_call><invoke name="NAME">
    # <parameter name="K">V</parameter>...</invoke></minimax:tool_call>
    if "<minimax:tool_call>" in text:
        for m in re.finditer(r'<invoke name="([^"]+)">\s*(.*?)</invoke>',
                             text, re.DOTALL):
            args = {
                k: _val(v) for k, v in re.findall(
                    r'<parameter name="([^"]+)">(.*?)</parameter>',
                    m.group(2), re.DOTALL)
            }
            calls.append({"name": m.group(1), "arguments": args})
        if calls:
            rest = re.sub(r"<minimax:tool_call>.*?</minimax:tool_call>",
                          "", text, flags=re.DOTALL).strip()
            return calls, rest

    # --- Kimi-K2: <|tool_calls_section_begin|><|tool_call_begin|>
    # functions.NAME:idx<|tool_call_argument_begin|>{json}
    # <|tool_call_end|>...<|tool_calls_section_end|>
    for m in re.finditer(
        r"<\|tool_call_begin\|>\s*([\w.:-]+)\s*"
        r"<\|tool_call_argument_begin\|>\s*(\{.*?\})\s*<\|tool_call_end\|>",
        text, re.DOTALL,
    ):
        name = m.group(1)
        name = re.sub(r"^functions\.", "", name)
        name = re.sub(r":\d+$", "", name)
        try:
            calls.append({"name": name, "arguments": json.loads(m.group(2))})
        except json.JSONDecodeError:
            continue
    if calls:
        rest = re.sub(
            r"<\|tool_calls_section_begin\|>.*?<\|tool_calls_section_end\|>",
            "", text, flags=re.DOTALL).strip()
        return calls, rest

    # --- shaped-JSON-array envelopes: nemotron-v2 <TOOLCALL>[...]
    # </TOOLCALL>, apriel-1.5 <tool_calls>[...]</tool_calls>, lfm2
    # <|tool_call_start|>[...]<|tool_call_end|>
    for pat in (r"<TOOLCALL>\s*(\[.*?\])\s*</TOOLCALL>",
                r"<tool_calls>\s*(\[.*?\])\s*</tool_calls>",
                r"<\|tool_call_start\|>\s*(\[.*?\])\s*<\|tool_call_end\|>"):
        m = re.search(pat, text, re.DOTALL)
        if not m:
            continue
        try:
            arr = json.loads(m.group(1))
        except json.JSONDecodeError:
            arr = None
        if isinstance(arr, list) and arr and all(_shaped(o) for o in arr):
            rest = (text[: m.start()] + text[m.end():]).strip()
            return arr, rest

    # --- Apertus: <|tools_prefix|>[{NAME: {args}}, ...]<|tools_suffix|>
    # (single-key objects keyed BY the function name, chat.cpp
    # init_apertus)
    m = re.search(r"<\|tools_prefix\|>\s*(\[.*?\])\s*<\|tools_suffix\|>",
                  text, re.DOTALL)
    if m:
        try:
            arr = json.loads(m.group(1))
        except json.JSONDecodeError:
            arr = None
        if isinstance(arr, list) and arr and all(
            isinstance(o, dict) and len(o) == 1 for o in arr
        ):
            calls = [
                {"name": k, "arguments": v}
                for o in arr for k, v in o.items()
            ]
            rest = (text[: m.start()] + text[m.end():]).strip()
            return calls, rest

    # --- GPT-OSS harmony: headers like "<|channel|>commentary
    # to=functions.NAME <|constrain|>json<|message|>{args}<|call|>";
    # "<|channel|>final ...<|message|>content" is the user-visible text
    # (chat-parser.cpp common_chat_parse_gpt_oss)
    if "<|channel|>" in text:
        for m in re.finditer(
            r"to=functions\.([\w.-]+)[^{}]*?<\|message\|>\s*(\{.*?\})\s*"
            r"(?=<\|call\|>|<\|end\|>|<\|channel\|>|$)",
            text, re.DOTALL,
        ):
            try:
                calls.append({"name": m.group(1),
                              "arguments": json.loads(m.group(2))})
            except json.JSONDecodeError:
                continue
        final = re.search(
            r"<\|channel\|>final[^<]*<\|message\|>(.*?)"
            r"(?:<\|end\|>|<\|return\|>|$)", text, re.DOTALL)
        if calls or final:
            return calls, (final.group(1).strip() if final else "")

    # --- DeepSeek V3.1: <tool_call_begin>NAME<tool_sep>{json}
    # <tool_call_end> — no 'function' prefix and no ```json fence
    # (chat-parser.cpp parse_deepseek_v3_1_content; R1's fenced form is
    # handled further down)
    for m in re.finditer(
        r"<｜tool▁call▁begin｜>([^\n<｜]+)<｜tool▁sep｜>\s*(\{.*?\})\s*"
        r"<｜tool▁call▁end｜>", text, re.DOTALL,
    ):
        try:
            calls.append({"name": m.group(1).strip(),
                          "arguments": json.loads(m.group(2))})
        except json.JSONDecodeError:
            continue
    if calls:
        rest = re.sub(r"<｜tool▁calls▁begin｜>.*?<｜tool▁calls▁end｜>", "",
                      text, flags=re.DOTALL)
        rest = re.sub(r"<｜tool▁call▁begin｜>.*?<｜tool▁call▁end｜>", "",
                      rest, flags=re.DOTALL).strip()
        return calls, rest

    # --- FireFunction v2: ' functools[{...}, ...]' JSON-array prefix
    m = re.search(r" ?functools\[", text)
    if m:
        try:
            arr = json.loads(text[m.end() - 1:])
        except json.JSONDecodeError:
            arr = None
        if isinstance(arr, list) and arr and all(_shaped(o) for o in arr):
            return arr, text[: m.start()].strip()

    # --- Functionary v3.2: 'name\n{json}' at message start and
    # '>>>name\n{json}' for subsequent calls; '>>>python\n<raw code>' is
    # a raw code-interpreter call; 'all\n' prefixes plain content
    # (chat-parser.cpp parse_functionary_v3_2).  Only committed when at
    # least one call parses — bare 'word\n' prose must fall through, and
    # a bare '>>>' (e.g. a Python REPL prompt in prose/code, which is
    # '>>> ' with a space) must not trigger the parse at all: require the
    # start-of-message 'name\n{' form or a '>>>name\n'-shaped segment
    # (ADVICE r4)
    if re.match(r"\w+\n\s*\{", text) or re.search(
        r">>>\w+\n", text
    ):
        rest_parts = []
        for si, seg in enumerate(re.split(r">>>", text)):
            m = re.match(r"(\w+)\n(.*)", seg, re.DOTALL)
            if not m:
                rest_parts.append(seg)
                continue
            nm, body = m.group(1), m.group(2)
            if nm == "all" and si == 0:
                rest_parts.append(body)
                continue
            if nm == "python" and si > 0:
                calls.append({"name": "python",
                              "arguments": {"code": body.rstrip()}})
                continue
            body_s = body.strip()
            if body_s.startswith("{"):
                try:
                    calls.append({"name": nm,
                                  "arguments": json.loads(body_s)})
                    continue
                except json.JSONDecodeError:
                    pass
            rest_parts.append(seg)
        if calls:
            return calls, "".join(rest_parts).strip()
        calls = []

    # 1. Hermes / Qwen
    for m in re.finditer(r"<tool_call>\s*(\{.*?\})\s*</tool_call>", text,
                         re.DOTALL):
        try:
            calls.append(json.loads(m.group(1)))
        except json.JSONDecodeError:
            continue
    if calls:
        rest = re.sub(r"<tool_call>.*?</tool_call>", "", text,
                      flags=re.DOTALL).strip()
        return calls, rest

    # 2. functionary v3 style <function=NAME>{...}</function>
    for m in re.finditer(
        r"<function=([\w.-]+)>\s*(\{.*?\})\s*</function>", text, re.DOTALL
    ):
        try:
            calls.append(
                {"name": m.group(1), "arguments": json.loads(m.group(2))}
            )
        except json.JSONDecodeError:
            continue
    if calls:
        rest = re.sub(r"<function=[\w.-]+>.*?</function>", "", text,
                      flags=re.DOTALL).strip()
        return calls, rest

    # 3. Mistral [TOOL_CALLS] [...]
    m = re.search(r"\[TOOL_CALLS\]\s*(\[.*\])", text, re.DOTALL)
    if m:
        try:
            arr = json.loads(m.group(1))
            if isinstance(arr, list) and all(_shaped(o) for o in arr):
                rest = text[: m.start()].strip()
                return arr, rest
        except json.JSONDecodeError:
            pass

    # 4. fenced ```json blocks
    for m in re.finditer(r"```(?:json)?\s*(\{.*?\})\s*```", text, re.DOTALL):
        try:
            obj = json.loads(m.group(1))
            if _shaped(obj):
                calls.append(obj)
        except json.JSONDecodeError:
            continue
    if calls:
        rest = re.sub(r"```(?:json)?\s*\{.*?\}\s*```", "", text,
                      flags=re.DOTALL).strip()
        return calls, rest

    # 5. the whole message is one JSON call; also the GENERIC format's
    # {"tool_call": {...}} / {"tool_calls": [...]} / {"response": ...}
    # envelope (chat-parser.cpp parse_generic)
    stripped = text.strip()
    if stripped.startswith("{"):
        try:
            obj = json.loads(stripped)
        except json.JSONDecodeError:
            obj = None
        if _shaped(obj):
            return [obj], ""
        if isinstance(obj, dict):
            if _shaped(obj.get("tool_call")):
                return [obj["tool_call"]], ""
            tc = obj.get("tool_calls")
            if isinstance(tc, list) and tc and all(_shaped(o) for o in tc):
                return tc, ""
            if "response" in obj and len(obj) == 1:
                r = obj["response"]
                return [], r if isinstance(r, str) else json.dumps(r)

    # 6. Llama-3.x <|python_tag|> builtin tool (code interpreter)
    if stripped.startswith("<|python_tag|>"):
        code = stripped[len("<|python_tag|>"):]
        code = code.removesuffix("<|eom_id|>").strip()
        if code:
            return [{"name": "ipython", "arguments": {"code": code}}], ""

    # 7. DeepSeek V3/R1 tool-call blocks (fullwidth-bar special tokens)
    ds = re.finditer(
        r"<｜tool▁call▁begin｜>(?:function<｜tool▁sep｜>)?([\w.-]+)\s*"
        r"```(?:json)?\s*(\{.*?\})\s*```\s*<｜tool▁call▁end｜>",
        text, re.DOTALL,
    )
    for m in ds:
        try:
            calls.append(
                {"name": m.group(1), "arguments": json.loads(m.group(2))}
            )
        except json.JSONDecodeError:
            continue
    if calls:
        rest = re.sub(r"<｜tool▁calls▁begin｜>.*?<｜tool▁calls▁end｜>", "",
                      text, flags=re.DOTALL)
        rest = re.sub(r"<｜tool▁call▁begin｜>.*?<｜tool▁call▁end｜>", "",
                      rest, flags=re.DOTALL).strip()
        return calls, rest

    # 8. Command-R7B <|START_ACTION|>[...]<|END_ACTION|>
    m = re.search(r"<\|START_ACTION\|>\s*(\[.*?\])\s*<\|END_ACTION\|>",
                  text, re.DOTALL)
    if m:
        try:
            arr = json.loads(m.group(1))
        except json.JSONDecodeError:
            arr = None
        if isinstance(arr, list) and all(
            isinstance(o, dict) and "tool_name" in o for o in arr
        ):
            calls = [
                {"name": o["tool_name"],
                 "arguments": o.get("parameters", {})}
                for o in arr
            ]
            rest = (text[: m.start()] + text[m.end():])
            rest = re.sub(r"<\|(?:START|END)_(?:THINKING|RESPONSE)\|>", "",
                          rest).strip()
            return calls, rest

    # 9. Granite <|tool_call|>[{...}] prefix
    if stripped.startswith("<|tool_call|>"):
        try:
            arr = json.loads(stripped[len("<|tool_call|>"):])
            if isinstance(arr, list) and all(_shaped(o) for o in arr):
                return arr, ""
        except json.JSONDecodeError:
            pass
    return [], text


def _split_reasoning(text: str):
    """Leading thinking-block split (reference: server reasoning_content
    handling; chat.cpp try_parse_reasoning per format): <think> (R1/Qwen/
    GLM/Kimi/MiniMax/nemotron-v2), <thinking> (apriel), <seed:think>
    (seed-oss), <|inner_prefix|> (apertus), <|channel|>analysis harmony
    blocks (gpt-oss)."""
    import re

    for op, cl in (("<think>", "</think>"),
                   ("<thinking>", "</thinking>"),
                   ("<seed:think>", "</seed:think>"),
                   ("<|inner_prefix|>", "<|inner_suffix|>"),
                   ("[THINK]", "[/THINK]"),          # magistral
                   # solar-open pre-content reasoning channel
                   ("<|think|>", "<|end|><|begin|>assistant<|content|>")):
        m = re.match(
            rf"\s*{re.escape(op)}(.*?){re.escape(cl)}(.*)", text, re.DOTALL)
        if m:
            return m.group(1).strip(), m.group(2).strip()
    m = re.match(
        r"\s*<\|channel\|>analysis<\|message\|>(.*?)<\|end\|>(.*)",
        text, re.DOTALL)
    if m:
        return m.group(1).strip(), m.group(2).strip()
    return None, text


class Router:
    """Multi-model routing (reference: server-models.cpp model router):
    requests pick an engine by their "model" field; unknown names 404."""

    def __init__(self):
        self.states: dict[str, ServerState] = {}
        self.default_name: str | None = None

    def add(self, name: str, state: ServerState, default: bool = False):
        self.states[name] = state
        if default or self.default_name is None:
            self.default_name = name

    def resolve(self, name: str | None) -> ServerState:
        if not name or name not in self.states:
            if name and name not in self.states and len(self.states) > 1:
                raise KeyError(name)
            name = self.default_name
        return self.states[name]


def make_handler(router: Router):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def _resolve(self, body=None) -> bool:
            name = body.get("model") if isinstance(body, dict) else None
            try:
                self._st = router.resolve(name)
                return True
            except KeyError:
                self._json(404, {"error": f"unknown model {name!r}"})
                return False

        @property
        def st(self):
            return self._st

        def log_message(self, fmt, *args):  # quiet
            pass

        def _json(self, code: int, obj: Any):
            data = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def _sse_start(self):
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            self.send_header("Connection", "close")
            self.end_headers()

        def _sse(self, obj: Any):
            self.wfile.write(f"data: {json.dumps(obj)}\n\n".encode())
            self.wfile.flush()

        # --- GET -----------------------------------------------------------

        def do_GET(self):
            path = urlparse(self.path).path
            if not self._resolve():
                return
            if path in ("/", "/index.html"):
                # single-file chat webui (reference: tools/server/webui)
                import pathlib

                ui = pathlib.Path(__file__).parent / "webui.html"
                data = ui.read_bytes()
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)
            elif path == "/health":
                self._json(200, {"status": "ok"})
            elif path == "/metrics":
                lines = []
                for k, v in self.st.metrics.items():
                    lines.append(f"# TYPE vlut_{k} counter")
                    lines.append(f"vlut_{k} {v}")
                eng = self.st.engine
                busy = sum(1 for s in eng.slots if s.req is not None)
                used_rows = sum(
                    s.length + s.generated for s in eng.slots
                    if s.req is not None
                )
                cap = eng.n_slots * eng.max_len
                perf = eng.perf
                pp_rate = (
                    perf.n_prompt_tokens / perf.t_prompt_s
                    if perf.t_prompt_s else 0.0
                )
                tg_rate = (
                    perf.n_decode_tokens / perf.t_decode_s
                    if perf.t_decode_s else 0.0
                )
                gauges = {
                    # reference gauge set (tools/server/README.md:988-1001)
                    "slots_busy": busy,
                    "slots_total": eng.n_slots,
                    "slots_idle": eng.n_slots - busy,
                    "requests_processing": busy,
                    "requests_deferred": len(eng.queue),
                    "kv_cache_usage_ratio": (
                        round(used_rows / cap, 6) if cap else 0.0
                    ),
                    "kv_cache_tokens": used_rows,
                    "prompt_tokens_seconds": round(pp_rate, 3),
                    "predicted_tokens_seconds": round(tg_rate, 3),
                    "n_past_max": max(
                        (s.length + s.generated for s in eng.slots),
                        default=0,
                    ),
                    "n_tokens_reused": perf.n_reused_tokens,
                }
                for k, v in gauges.items():
                    lines.append(f"# TYPE vlut_{k} gauge")
                    lines.append(f"vlut_{k} {v}")
                data = ("\n".join(lines) + "\n").encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/plain")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)
            elif path == "/slots" and self.st.engine is None:
                self._json(200, [])
            elif path == "/props" and self.st.engine is None:
                cfg = self.st.encoder[0]
                self._json(200, {
                    "model": self.st.model_name,
                    "arch": cfg.arch,
                    "embedding_only": True,
                    "pooling": cfg.pooling,
                    "n_embd": cfg.d_model,
                    "vocab_size": cfg.vocab_size,
                })
            elif path == "/slots":
                slots = [
                    {
                        "id": i,
                        "busy": s.req is not None,
                        "length": s.length,
                        "generated": s.generated,
                        "cached_tokens": len(s.history),
                    }
                    for i, s in enumerate(self.st.engine.slots)
                ]
                self._json(200, slots)
            elif path == "/props":
                cfg = self.st.engine.cfg
                self._json(200, {
                    "model": self.st.model_name,
                    "n_ctx": self.st.engine.max_len,
                    "n_slots": self.st.engine.n_slots,
                    "arch": cfg.arch,
                    "weight_fmt": cfg.weight_fmt,
                    "vocab_size": cfg.vocab_size,
                    "bos_token_id": self.st.tok.bos_id,
                    "eos_token_id": self.st.tok.eos_id,
                })
            elif path == "/v1/models":
                self._json(200, {
                    "object": "list",
                    "data": [
                        {
                            "id": name,
                            "object": "model",
                            "owned_by": "vlut-tpu",
                        }
                        for name in router.states
                    ],
                })
            else:
                self._json(404, {"error": "not found"})

        # --- POST ----------------------------------------------------------

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            try:
                body = json.loads(self.rfile.read(n) or b"{}")
            except json.JSONDecodeError:
                self._json(400, {"error": "bad json"})
                return
            if not self._resolve(body):
                return
            parsed = urlparse(self.path)
            path = parsed.path
            if self.st.engine is None and path not in (
                "/embedding", "/embeddings", "/v1/embeddings",
                "/tokenize", "/detokenize",
            ):
                self._json(400, {"error": {
                    "message": "this model is embedding-only",
                    "type": "invalid_request_error"}})
                return
            try:
                if path in ("/completion", "/completions", "/v1/completions"):
                    self._completion(body)
                elif path == "/v1/chat/completions":
                    self._chat(body)
                elif path == "/infill":
                    self._infill(body)
                elif path in ("/embedding", "/embeddings", "/v1/embeddings"):
                    self._embedding(body)
                elif path in ("/rerank", "/reranking", "/v1/rerank"):
                    self._rerank(body)
                elif path == "/tokenize":
                    ids = self.st.tok.encode(
                        body.get("content", ""),
                        add_bos=bool(body.get("add_special", False)),
                    )
                    self._json(200, {"tokens": ids})
                elif path == "/detokenize":
                    self._json(200, {
                        "content": self.st.tok.decode(body.get("tokens", []))
                    })
                elif path == "/apply-template":
                    ids = self.st.tok.apply_chat_template(
                        body.get("messages", [])
                    )
                    self._json(200, {"prompt": self.st.tok.decode(ids)})
                elif path.startswith("/slots/"):
                    self._slot_action(path, parsed.query, body)
                else:
                    self._json(404, {"error": "not found"})
            except BrokenPipeError:
                pass
            except Exception as e:  # noqa: BLE001
                self.st.metrics["requests_errors_total"] += 1
                self._json(500, {"error": str(e)})

        # --- core run loop with stop strings + optional streaming ---------

        def _make_request(self, prompt_ids, body):
            stop_tok = ()
            if self.st.tok.eos_id is not None and not body.get(
                "ignore_eos", False
            ):
                stop_tok = (self.st.tok.eos_id,)
            n_probs = int(body.get("n_probs", 0))
            if body.get("logprobs"):
                # OpenAI chat style: logprobs=true + top_logprobs=k
                n_probs = max(n_probs, int(body.get("top_logprobs", 1)), 1)
            return Request(
                prompt=prompt_ids,
                max_new_tokens=int(
                    body.get("n_predict", body.get("max_tokens", 128))
                ),
                sampler=_sampler_from_body(body),
                stop_tokens=stop_tok,
                grammar=_grammar_from_body(body, self.st.tok),
                n_probs=min(n_probs, 16),
            )

        def _probs_payload(self, req: Request):
            """llama.cpp-style completion_probabilities array."""
            out = []
            for tok, entry in zip(req.output, req.logprobs):
                ids, lps, chosen = entry
                out.append({
                    "id": int(tok),
                    "token": self.st.tok.decode([int(tok)]),
                    "logprob": chosen,
                    "top_logprobs": [
                        {
                            "id": int(i),
                            "token": self.st.tok.decode([int(i)]),
                            "logprob": float(l),
                        }
                        for i, l in zip(ids, lps)
                    ],
                })
            return out

        def _stop_strings(self, body) -> list[str]:
            stop = body.get("stop", [])
            if isinstance(stop, str):
                stop = [stop]
            return [s for s in stop if s]

        def _run_collect(self, req: Request, stops: list[str],
                         on_delta=None, ev=None) -> tuple[str, str]:
            """Drive req to completion; returns (text, finish_reason).
            Calls on_delta(new_text) as tokens stream in.  Pass ``ev`` when
            the request was already submitted (concurrent fan-out)."""
            if ev is None:
                ev = self.st.submit(req)
            emitted = ""
            finish = "stop"
            stop_toks = set(req.stop_tokens)
            # safety timeout: if the engine stops making progress on this
            # request (engine thread died, wedged state), fail it instead of
            # parking the client thread forever.  Progress-based, not
            # absolute — first-compile of a large model legitimately takes
            # minutes before the first token.
            stall_s = float(os.environ.get("VLUT_REQUEST_STALL_S", "600"))
            last_n, last_progress = -1, time.monotonic()
            try:
                while True:
                    done = ev.wait(0.02)
                    now = time.monotonic()
                    with self.st.lock:
                        out = list(req.output)
                    if len(out) != last_n:
                        last_n, last_progress = len(out), now
                    if not done and now - last_progress > stall_s:
                        self.st.cancel(req)
                        finish = "timeout"
                        break
                    vis = [t for t in out if t not in stop_toks]
                    text = self.st.tok.decode(vis)
                    # hold back a partial stop-string suffix
                    cut = len(text)
                    hit = None
                    for s in stops:
                        j = text.find(s)
                        if j != -1 and (hit is None or j < hit):
                            hit = j
                    if hit is not None:
                        text = text[:hit]
                        self.st.cancel(req)
                        finish = "stop"
                        if on_delta and len(text) > len(emitted):
                            on_delta(text[len(emitted):])
                        emitted = text
                        break
                    safe = cut
                    for s in stops:
                        for k in range(1, len(s)):
                            if text.endswith(s[:k]):
                                safe = min(safe, len(text) - k)
                    if on_delta and safe > len(emitted):
                        on_delta(text[len(emitted):safe])
                        emitted = text[:safe]
                    if done:
                        if on_delta and len(text) > len(emitted):
                            on_delta(text[len(emitted):])
                        emitted = text
                        if req.error:
                            # per-request engine rejection (e.g. prompt
                            # exceeds context with context_shift off) —
                            # reference: send_error per slot
                            finish = "error"
                        elif (
                            len(req.output) >= req.max_new_tokens
                            and (not out or out[-1] not in stop_toks)
                        ):
                            finish = "length"
                        break
            finally:
                self.st.finish(req)
            return emitted, finish

        # --- endpoints -----------------------------------------------------

        def _completion(self, body):
            prompt = body.get("prompt", "")
            ids = (
                prompt
                if isinstance(prompt, list)
                else self.st.tok.encode(prompt)
            )
            req = self._make_request(ids, body)
            stops = self._stop_strings(body)
            if body.get("stream"):
                self._sse_start()
                def emit(delta):
                    self._sse({"content": delta, "stop": False})
                text, finish = self._run_collect(req, stops, emit)
                self._sse({
                    "content": "", "stop": True,
                    "stopped_limit": finish == "length",
                    "tokens_predicted": len(req.output),
                    "tokens_evaluated": len(req.prompt),
                })
                self.wfile.write(b"data: [DONE]\n\n")
                return
            text, finish = self._run_collect(req, stops)
            if finish == "error":
                self._json(400, {"error": {
                    "message": req.error, "type": "invalid_request_error",
                }})
                return
            resp = {
                "content": text,
                "tokens_predicted": len(req.output),
                "tokens_evaluated": len(req.prompt),
                "stop": True,
                "stopped_limit": finish == "length",
            }
            if req.n_probs:
                resp["completion_probabilities"] = self._probs_payload(req)
            self._json(200, resp)

        def _chat(self, body):
            msgs = body.get("messages", [])
            tools = body.get("tools")
            try:
                ids = self.st.tok.apply_chat_template(msgs, tools=tools)
            except TypeError:
                ids = self.st.tok.apply_chat_template(msgs)
            # tool_choice="required" (or a named function): constrain the
            # output to well-formed tool calls with a schema-derived
            # grammar (reference: common/chat.cpp per-format grammars)
            tc = body.get("tool_choice")
            if tools and (tc == "required" or isinstance(tc, dict)):
                from vlut_tpu.runtime.grammar import tool_call_gbnf

                sel = tools
                if isinstance(tc, dict):
                    want = (tc.get("function") or {}).get("name")
                    sel = [t for t in tools
                           if (t.get("function", t)).get("name") == want]
                    if not sel:
                        self._json(400, {"error": {
                            "message": f"unknown tool {want!r}",
                            "type": "invalid_request_error"}})
                        return
                body = {**body, "grammar": tool_call_gbnf(
                    sel, parallel=(tc == "required"))}
            elif tools and tc in (None, "auto"):
                # tool_choice="auto": lazily-activated grammar — prose is
                # unconstrained, but the moment the model opens a tool
                # call envelope the schema grammar takes over (reference:
                # common/chat.cpp grammar_lazy + grammar_triggers)
                from vlut_tpu.runtime.grammar import tool_call_gbnf

                body = {**body,
                        "grammar": tool_call_gbnf(tools, parallel=True),
                        "grammar_lazy": True,
                        "grammar_triggers": ["<tool_call>"]}
            req = self._make_request(ids, body)
            stops = self._stop_strings(body)
            created = int(time.time())
            cmpl_id = f"chatcmpl-{req.rid if req.rid >= 0 else created}"
            if body.get("stream"):
                self._sse_start()
                def emit(delta):
                    self._sse({
                        "id": cmpl_id, "object": "chat.completion.chunk",
                        "created": created, "model": self.st.model_name,
                        "choices": [{
                            "index": 0,
                            "delta": {"content": delta},
                            "finish_reason": None,
                        }],
                    })
                text, finish = self._run_collect(req, stops, emit)
                self._sse({
                    "id": cmpl_id, "object": "chat.completion.chunk",
                    "created": created, "model": self.st.model_name,
                    "choices": [{
                        "index": 0, "delta": {},
                        "finish_reason": finish,
                    }],
                })
                self.wfile.write(b"data: [DONE]\n\n")
                return
            n_choices = max(1, int(body.get("n", 1)))
            if n_choices > 1 and not body.get("stream"):
                # multi-sample fan-out: n sibling requests with distinct
                # seeds run concurrently through the slot engine (the
                # prompt prefix is shared via the engine's prefix cache;
                # reference: parent->child slot copy, server-context.cpp
                # :2604)
                reqs = [req]
                for j in range(1, n_choices):
                    import dataclasses as _dc

                    sib = self._make_request(ids, body)
                    sib.sampler = _dc.replace(
                        sib.sampler, seed=req.sampler.seed + j
                    )
                    reqs.append(sib)
                evs = [self.st.submit(r) for r in reqs]
                results = []
                for r, e in zip(reqs, evs):
                    txt, fin = self._run_collect(r, stops, ev=e)
                    results.append((r, txt, fin))
                self._json(200, {
                    "id": cmpl_id,
                    "object": "chat.completion",
                    "created": created,
                    "model": self.st.model_name,
                    "choices": [
                        {
                            "index": j,
                            "message": {
                                "role": "assistant", "content": txt,
                            },
                            "finish_reason": fin,
                        }
                        for j, (_, txt, fin) in enumerate(results)
                    ],
                    "usage": {
                        "prompt_tokens": len(req.prompt) * n_choices,
                        "completion_tokens": sum(
                            len(r.output) for r, _, _ in results
                        ),
                        "total_tokens": len(req.prompt) * n_choices + sum(
                            len(r.output) for r, _, _ in results
                        ),
                    },
                })
                return
            text, finish = self._run_collect(req, stops)
            reasoning, text = _split_reasoning(text)
            calls, text = _parse_tool_calls(text) if tools else ([], text)
            message: dict[str, Any] = {"role": "assistant", "content": text}
            if reasoning:
                message["reasoning_content"] = reasoning
            if calls:
                message["tool_calls"] = [
                    {
                        "id": f"call_{i}",
                        "type": "function",
                        "function": {
                            "name": c.get("name", ""),
                            "arguments": json.dumps(
                                c.get("arguments", c.get("parameters", {}))
                            ),
                        },
                    }
                    for i, c in enumerate(calls)
                ]
                message["content"] = text or None
                finish = "tool_calls"
            choice: dict[str, Any] = {
                "index": 0,
                "message": message,
                "finish_reason": finish,
            }
            if req.n_probs:
                choice["logprobs"] = {
                    "content": [
                        {
                            "token": e["token"],
                            "logprob": e["logprob"],
                            "top_logprobs": [
                                {"token": t["token"],
                                 "logprob": t["logprob"]}
                                for t in e["top_logprobs"]
                            ],
                        }
                        for e in self._probs_payload(req)
                    ]
                }
            self._json(200, {
                "id": cmpl_id,
                "object": "chat.completion",
                "created": created,
                "model": self.st.model_name,
                "choices": [choice],
                "usage": {
                    "prompt_tokens": len(req.prompt),
                    "completion_tokens": len(req.output),
                    "total_tokens": len(req.prompt) + len(req.output),
                },
            })

        def _infill(self, body):
            """Fill-in-middle: input_prefix + input_suffix around the cursor
            (reference: tools/server /infill; FIM token ids from tokenizer
            special tokens when present, else plain concatenation)."""
            prefix = body.get("input_prefix", "")
            suffix = body.get("input_suffix", "")
            tk = self.st.tok.tk
            fim_pre = getattr(tk, "fim_prefix_token_id", None)
            fim_suf = getattr(tk, "fim_suffix_token_id", None)
            fim_mid = getattr(tk, "fim_middle_token_id", None)
            if None not in (fim_pre, fim_suf, fim_mid):
                ids = (
                    [fim_pre] + self.st.tok.encode(prefix, add_bos=False)
                    + [fim_suf] + self.st.tok.encode(suffix, add_bos=False)
                    + [fim_mid]
                )
            else:
                ids = self.st.tok.encode(prefix, add_bos=True)
            req = self._make_request(ids, body)
            text, finish = self._run_collect(req, self._stop_strings(body))
            self._json(200, {
                "content": text,
                "tokens_predicted": len(req.output),
                "stop": True,
            })

        def _embedding(self, body):
            inp = body.get("input", body.get("content", ""))
            if isinstance(inp, str):
                inp = [inp]
            ids_list = [
                x if isinstance(x, list) else self.st.tok.encode(x)
                for x in inp
            ]
            pooling = body.get("pooling", "mean")
            vecs = self.st.embed(ids_list, pooling=pooling)
            self._json(200, {
                "object": "list",
                "data": [
                    {
                        "object": "embedding",
                        "index": i,
                        "embedding": v.tolist(),
                    }
                    for i, v in enumerate(vecs)
                ],
                "model": self.st.model_name,
                "usage": {
                    "prompt_tokens": sum(len(x) for x in ids_list),
                    "total_tokens": sum(len(x) for x in ids_list),
                },
            })

        def _rerank(self, body):
            query = body.get("query", "")
            docs = body.get("documents", [])
            q_ids = self.st.tok.encode(query)
            d_ids = [self.st.tok.encode(d, add_bos=False) for d in docs]
            scores = self.st.rerank(q_ids, d_ids)
            order = sorted(
                range(len(scores)), key=lambda i: -scores[i]
            )
            top_n = int(body.get("top_n", len(docs)))
            self._json(200, {
                "model": self.st.model_name,
                "results": [
                    {"index": i, "relevance_score": scores[i]}
                    for i in order[:top_n]
                ],
            })

        def _slot_action(self, path, query, body):
            try:
                slot_id = int(path.split("/")[2])
            except (IndexError, ValueError):
                self._json(400, {"error": "bad slot id"})
                return
            action = (parse_qs(query).get("action") or [""])[0]
            eng = self.st.engine
            if not 0 <= slot_id < eng.n_slots:
                self._json(400, {"error": "slot id out of range"})
                return
            name = body.get("filename", f"slot{slot_id}")
            with self.st.lock:
                if action == "save":
                    data = eng.save_slot(slot_id)
                    self.st.slot_files[name] = data
                    self._json(200, {
                        "id_slot": slot_id, "filename": name,
                        "n_saved": len(eng.slots[slot_id].history),
                        "n_bytes": len(data),
                    })
                elif action == "restore":
                    if name not in self.st.slot_files:
                        self._json(404, {"error": f"no saved state {name}"})
                        return
                    eng.restore_slot(slot_id, self.st.slot_files[name])
                    self._json(200, {
                        "id_slot": slot_id,
                        "n_restored": len(eng.slots[slot_id].history),
                    })
                elif action == "erase":
                    eng.slots[slot_id].history = []
                    self._json(200, {"id_slot": slot_id, "n_erased": 1})
                else:
                    self._json(400, {"error": f"unknown action {action!r}"})

    return Handler


def serve(
    engine: Engine,
    tokenizer: Tokenizer,
    host: str = "127.0.0.1",
    port: int = 8080,
    model_name: str = "vlut-tpu",
) -> tuple[ThreadingHTTPServer, ServerState]:
    """Start engine loop + HTTP server (returns without blocking)."""
    state = ServerState(engine, tokenizer, model_name=model_name)
    state.start()
    router = Router()
    router.add(model_name, state, default=True)
    httpd = ThreadingHTTPServer((host, port), make_handler(router))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return httpd, state


def serve_multi(
    models: dict[str, tuple[Engine, Tokenizer]],
    host: str = "127.0.0.1",
    port: int = 8080,
    default: str | None = None,
) -> tuple[ThreadingHTTPServer, Router]:
    """Multi-model server: one engine loop per model, routed by the
    request's "model" field (server-models.cpp analog)."""
    router = Router()
    for name, spec in models.items():
        engine, tok = spec[0], spec[1]
        encoder = spec[2] if len(spec) > 2 else None
        st = ServerState(engine, tok, model_name=name, encoder=encoder)
        st.start()
        router.add(name, st, default=(name == default))
    httpd = ThreadingHTTPServer((host, port), make_handler(router))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return httpd, router


def main(argv=None):
    import argparse

    from vlut_tpu.cli import _enable_compile_cache
    from vlut_tpu.convert.checkpoint import load_checkpoint

    _enable_compile_cache()

    ap = argparse.ArgumentParser(description="vlut_tpu server")
    ap.add_argument("--model", required=True, action="append",
                    help="checkpoint dir, or NAME=DIR (repeatable for "
                         "multi-model routing)")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--ctx", type=int, default=4096)
    ap.add_argument("--no-context-shift", action="store_true",
                    help="reject over-context requests instead of "
                    "shifting/truncating (reference --no-context-shift)")
    ap.add_argument("--tp", type=int, default=1,
                    help="tensor-parallel ways (Megatron-shard weights "
                    "over the mesh; reference --split-mode row analog)")
    ap.add_argument("--dp", type=int, default=1,
                    help="data-parallel ways (slots shard over chips)")
    ap.add_argument("--cache-type", choices=("bf16", "q8"),
                    default="bf16",
                    help="KV cache storage (q8 = int8 + scales)")
    ap.add_argument("--draft-model", default=None,
                    help="draft checkpoint for per-slot speculative decode")
    ap.add_argument("--draft-k", type=int, default=4)
    ap.add_argument("--lookahead", action="store_true",
                    help="per-slot draft-free windowed lookahead decode "
                         "(greedy requests only; others use the normal "
                         "step)")
    ap.add_argument("--lookahead-window", type=int, default=8)
    ap.add_argument("--lookahead-ngram", type=int, default=3)
    ap.add_argument("--promote", choices=("i2", "i1"), default=None,
                    help="repack weights to this format at load (i1 "
                         "checkpoints serve ~1.7x faster promoted to i2)")
    args = ap.parse_args(argv)

    import jax

    draft = None
    if args.draft_model:
        d_cfg, d_params, _ = load_checkpoint(args.draft_model)
        draft = (d_cfg, jax.device_put(d_params))
    models: dict[str, tuple[Engine, Tokenizer]] = {}
    for spec in args.model:
        name, _, path = spec.rpartition("=")
        if not name:
            name, path = path, path
        import json as _json
        import pathlib as _pl
        fam = _json.loads(
            (_pl.Path(path) / "vlut_config.json").read_text()
        ).get("model_family", "transformer")
        if fam == "encoder":
            cfg, params, _ = load_checkpoint(path)
            models[name] = (None, Tokenizer(path),
                            (cfg, jax.device_put(params)))
            continue
        # streaming load unless a load-time repack needs host arrays
        stream = (os.environ.get("VLUT_STREAM_LOAD", "1") != "0"
                  and not args.promote)
        cfg, params, _ = load_checkpoint(path, stream=stream)
        if args.promote and cfg.weight_fmt != args.promote:
            from vlut_tpu.convert.quantize import requantize_params

            cfg, params = requantize_params(cfg, params, args.promote)
        params = jax.device_put(params)
        from vlut_tpu.parallel.sharding import mesh_from_flags

        engine = Engine(cfg, params, n_slots=args.slots, max_len=args.ctx,
                        kv_quant=(args.cache_type == "q8"),
                        context_shift=not args.no_context_shift,
                        draft=draft, k_draft=args.draft_k,
                        lookahead=(
                            (args.lookahead_window, args.lookahead_ngram)
                            if args.lookahead else None
                        ),
                        mesh=mesh_from_flags(args.tp, args.dp))
        models[name] = (engine, Tokenizer(path))
    httpd, _ = serve_multi(
        models, args.host, args.port, default=next(iter(models))
    )
    print(f"listening on http://{args.host}:{args.port} "
          f"({len(models)} model(s))")
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        httpd.shutdown()


if __name__ == "__main__":
    main()

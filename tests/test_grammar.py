"""GBNF grammar engine tests (reference: src/llama-grammar.cpp,
tests/test-grammar-integration.cpp, common/json-schema-to-grammar.cpp)."""

import json

import numpy as np
import pytest

from vlut_tpu.runtime.grammar import (
    Grammar,
    GrammarError,
    GrammarSampler,
    GrammarState,
    json_schema_to_gbnf,
)


def _matches(gbnf: str, text: str) -> bool:
    g = Grammar.from_gbnf(gbnf)
    s = GrammarState(g).advance_text(text)
    return s.can_end


def test_literal_alternates():
    g = 'root ::= "yes" | "no"'
    assert _matches(g, "yes")
    assert _matches(g, "no")
    assert not _matches(g, "ye")
    assert not _matches(g, "maybe")


def test_char_class_and_star():
    g = "root ::= [a-z]*"
    assert _matches(g, "")
    assert _matches(g, "abcxyz")
    assert not _matches(g, "aB")


def test_plus_and_question():
    g = 'root ::= [0-9]+ ("." [0-9]+)?'
    assert _matches(g, "42")
    assert _matches(g, "3.14")
    assert not _matches(g, "")
    assert not _matches(g, ".5")


def test_rule_refs_and_recursion():
    g = """
root ::= expr
expr ::= term ("+" term)*
term ::= [0-9]+ | "(" expr ")"
"""
    assert _matches(g, "1+2+345")
    assert _matches(g, "(1+2)+3")
    assert not _matches(g, "1+")


def test_negated_class_and_escapes():
    g = 'root ::= "\\"" [^"]* "\\""'
    assert _matches(g, '"hello world"')
    assert not _matches(g, '"unterminated')


def test_bounded_repetition():
    g = "root ::= [ab]{2,3}"
    assert not _matches(g, "a")
    assert _matches(g, "ab")
    assert _matches(g, "aba")
    assert not _matches(g, "abab")


def test_exact_repetition_and_unbounded():
    assert _matches("root ::= [x]{3}", "xxx")
    assert not _matches("root ::= [x]{3}", "xx")
    assert _matches("root ::= [x]{2,}", "xxxxx")
    assert not _matches("root ::= [x]{2,}", "x")


def test_dot_any():
    g = 'root ::= "a" . "c"'
    assert _matches(g, "abc")
    assert _matches(g, "aZc")
    assert not _matches(g, "ac")


def test_comments_and_multiline():
    g = """
# a grammar
root ::= greeting  # trailing comment
greeting ::= "hi" | "yo"
"""
    assert _matches(g, "yo")


def test_undefined_rule_raises():
    with pytest.raises(GrammarError):
        Grammar.from_gbnf("root ::= nothere")


def test_mask_and_accept():
    pieces = ["yes", "no", "y", "es", "maybe", "<eos>", ""]
    gs = GrammarSampler('root ::= "yes" | "no"', pieces, eos_ids=(5,))
    m = gs.mask()
    np.testing.assert_array_equal(
        m, [True, True, True, False, False, False, False]
    )
    gs.accept(2)  # "y"
    m = gs.mask()
    # now only "es" continues; eos not yet allowed
    assert m[3] and not m[0] and not m[1] and not m[5]
    gs.accept(3)  # "es"
    m = gs.mask()
    assert m[5]  # grammar can end -> eos allowed
    assert not m[:5].any()


def test_accept_bad_token_raises():
    pieces = ["a", "z"]
    gs = GrammarSampler('root ::= "a"', pieces)
    with pytest.raises(GrammarError):
        gs.accept(1)


def test_json_schema_object():
    schema = {
        "type": "object",
        "properties": {
            "name": {"type": "string"},
            "age": {"type": "integer"},
        },
        "required": ["name", "age"],
    }
    gbnf = json_schema_to_gbnf(schema)
    g = Grammar.from_gbnf(gbnf)
    ok = json.dumps({"name": "bob", "age": 3})
    assert GrammarState(g).advance_text(ok).can_end
    bad = json.dumps({"name": "bob", "age": "three"})
    st = GrammarState(g).advance_text(bad)
    assert not st.can_end


def test_json_schema_enum_and_array():
    schema = {
        "type": "object",
        "properties": {
            "color": {"enum": ["red", "green"]},
            "nums": {"type": "array", "items": {"type": "integer"}},
        },
        "required": ["color", "nums"],
    }
    g = Grammar.from_gbnf(json_schema_to_gbnf(schema))
    ok = json.dumps({"color": "red", "nums": [1, 2, 3]})
    assert GrammarState(g).advance_text(ok).can_end
    bad = json.dumps({"color": "blue", "nums": []})
    assert not GrammarState(g).advance_text(bad).can_end


def test_json_schema_anyof_and_const():
    schema = {"anyOf": [{"const": 1}, {"type": "string"}]}
    g = Grammar.from_gbnf(json_schema_to_gbnf(schema))
    assert GrammarState(g).advance_text("1").can_end
    assert GrammarState(g).advance_text('"x"').can_end
    assert not GrammarState(g).advance_text("2.5").can_end


def test_json_schema_bare_is_any_value():
    g = Grammar.from_gbnf(json_schema_to_gbnf({}))
    for ok in ['{"a": [1, 2.5, null, true, "s"]}', "[]", '"str"', "-3.5e2"]:
        assert GrammarState(g).advance_text(ok).can_end, ok


def test_grammar_sampler_generates_valid_json():
    """Greedy-ish loop: repeatedly pick the first allowed token; result must
    parse as JSON matching the schema (end-to-end mask correctness)."""
    schema = {
        "type": "object",
        "properties": {"ok": {"type": "boolean"}},
        "required": ["ok"],
    }
    gbnf = json_schema_to_gbnf(schema)
    pieces = ['{"', 'ok', '":', ' ', 'true', 'false', '}', '{', '"', ':',
              '<eos>']
    gs = GrammarSampler(gbnf, pieces, eos_ids=(10,))
    out = []
    for _ in range(32):
        m = gs.mask()
        assert m.any(), f"dead end after {out}"
        tid = int(np.argmax(m))
        if tid == 10:
            break
        gs.accept(tid)
        out.append(pieces[tid])
    text = "".join(out)
    assert json.loads(text) == {"ok": True} or json.loads(text) == {
        "ok": False
    }


def test_engine_grammar_constrained(tmp_path):
    """End-to-end: engine decode with a GBNF constraint produces only
    grammar-admissible text (integration of grammar mask -> fused step)."""
    import jax.numpy as jnp

    from vlut_tpu.config import PRESETS
    from vlut_tpu.models.transformer import init_params
    from vlut_tpu.runtime.engine import Engine, Request
    from vlut_tpu.runtime.grammar import GrammarSampler
    from vlut_tpu.runtime.sampling import SamplerParams

    cfg = PRESETS["tiny"]
    params = init_params(cfg, seed=0)
    # byte-ish pieces: token i -> single char chr(i) for printable range
    pieces = [chr(i) if 32 <= i < 127 else "" for i in range(cfg.vocab_size)]
    gs = GrammarSampler('root ::= "ab" [0-9]+', pieces, eos_ids=(1,))
    eng = Engine(cfg, params, n_slots=2, max_len=64)
    req = Request(
        prompt=[5, 6, 7], max_new_tokens=8,
        sampler=SamplerParams(temperature=1.0, seed=0),
        stop_tokens=(1,), grammar=gs,
    )
    eng.run([req])
    text = "".join(pieces[t] for t in req.output if t != 1)
    assert text.startswith("ab")
    assert all(c in "0123456789" for c in text[2:])
    assert len(text) >= 2


# --- regex -> GBNF (reference: the opt-in llguidance lane) -------------------


def _rx(pattern: str, text: str) -> bool:
    from vlut_tpu.runtime.grammar import regex_to_gbnf

    return _matches(regex_to_gbnf(pattern), text)


def test_regex_literals_and_classes():
    assert _rx(r"abc", "abc")
    assert not _rx(r"abc", "abX")
    assert _rx(r"[a-f0-9]+", "deadbeef")
    assert not _rx(r"[a-f0-9]+", "xyz")
    assert _rx(r"[^0-9]+", "hello")
    assert not _rx(r"[^0-9]+", "h3llo")


def test_regex_shorthands_and_dot():
    assert _rx(r"\d{3}-\d{4}", "555-0199")
    assert not _rx(r"\d{3}-\d{4}", "55-0199")
    assert _rx(r"\w+\s\w+", "hello world")
    assert _rx(r"a.c", "abc")
    assert not _rx(r"a.c", "a\nc")  # dot excludes newline
    assert _rx(r"\D+", "abc")
    assert not _rx(r"\D+", "a1c")


def test_regex_groups_alternation_quantifiers():
    assert _rx(r"(foo|bar)+", "foobarfoo")
    assert not _rx(r"(foo|bar)+", "foobaz")
    assert _rx(r"colou?r", "color")
    assert _rx(r"colou?r", "colour")
    assert _rx(r"(?:ab){2,3}", "abab")
    assert _rx(r"(?:ab){2,3}", "ababab")
    assert not _rx(r"(?:ab){2,3}", "ab")
    assert not _rx(r"(?:ab){2,3}", "abababab")
    assert _rx(r"a{2,}", "aaaa")
    assert not _rx(r"a{2,}", "a")


def test_regex_anchors_escapes_and_literal_brace():
    assert _rx(r"^ok$", "ok")
    assert _rx(r"\$\d+\.\d{2}", "$19.99")
    assert _rx(r"a{b}", "a{b}")  # non-quantifier brace is a literal
    assert _rx(r"x*?y", "xxy")  # non-greedy accepted (same language)


def test_regex_unsupported_raise():
    from vlut_tpu.runtime.grammar import GrammarError, regex_to_gbnf

    for bad in (r"(?=look)", r"\1", r"a\b", r"a^b"):
        with pytest.raises(GrammarError):
            regex_to_gbnf(bad)


def test_regex_phone_number_mask_generates():
    """End-to-end: a regex-constrained sampler can only emit matching
    strings (mirrors test_grammar_sampler_generates_valid_json)."""
    import re as _re

    from vlut_tpu.runtime.grammar import regex_to_gbnf

    pieces = ["0", "1", "23", "-", "4-5", "a", "55", "5-01", "9", "99",
              "<eos>"]
    gs = GrammarSampler(regex_to_gbnf(r"\d{3}-\d{4}"), pieces,
                        eos_ids=(10,))
    rng = np.random.default_rng(0)
    out = []
    for _ in range(16):
        m = gs.mask()
        assert m.any(), f"dead end after {out}"
        pick = int(rng.choice(np.flatnonzero(m)))
        if pick == 10:
            break
        gs.accept(pick)
        out.append(pieces[pick])
    text = "".join(out)
    assert _re.fullmatch(r"\d{3}-\d{4}", text), text


def test_tool_call_gbnf():
    """tool_choice='required' grammar: only declared tools, schema-valid
    arguments, Hermes envelope (reference: common/chat.cpp builds the
    per-format grammar from the tool JSON schemas)."""
    from vlut_tpu.runtime.grammar import tool_call_gbnf

    tools = [
        {"type": "function", "function": {
            "name": "get_weather",
            "parameters": {
                "type": "object",
                "properties": {"city": {"type": "string"}},
                "required": ["city"],
            },
        }},
        {"type": "function", "function": {
            "name": "add",
            "parameters": {
                "type": "object",
                "properties": {"a": {"type": "integer"},
                               "b": {"type": "integer"}},
                "required": ["a", "b"],
            },
        }},
    ]
    g = tool_call_gbnf(tools)
    ok = ('<tool_call>{"name": "get_weather", '
          '"arguments": {"city": "Oslo"}}</tool_call>')
    assert _matches(g, ok)
    # parallel calls
    assert _matches(g, ok + '<tool_call>{"name": "add", '
                            '"arguments": {"a": 1, "b": 2}}</tool_call>')
    # undeclared tool name must be rejected
    assert not _matches(g, '<tool_call>{"name": "rm_rf", '
                           '"arguments": {}}</tool_call>')
    # schema-invalid arguments must be rejected
    assert not _matches(g, '<tool_call>{"name": "add", '
                           '"arguments": {"a": "x", "b": 2}}</tool_call>')
    # plain prose must be rejected
    assert not _matches(g, "The weather is nice.")
    # single-choice grammar forbids a second call
    g1 = tool_call_gbnf(tools[:1], parallel=False)
    assert _matches(g1, ok)
    assert not _matches(g1, ok + ok)


def test_lazy_grammar_trigger_activation():
    """tool_choice='auto' lazy grammar (reference: common/chat.cpp
    grammar_lazy + grammar_triggers): unconstrained prose until the
    trigger appears — even split across tokens — then the tool grammar
    constrains everything from the trigger on."""
    from vlut_tpu.runtime.grammar import GrammarSampler, LazyGrammarSampler

    pieces = ["Hello", " world", "<tool", "_call>", '{"name": "add", '
              '"arguments": {"a": 1, "b": 2}}', "</tool_call>", "<eos>",
              "rubbish", '{"name": "rm", "arguments": {}}']
    gbnf = (
        'root ::= call+\n'
        'call ::= "<tool_call>" "{\\"name\\": \\"add\\", \\"arguments\\": '
        '{\\"a\\": 1, \\"b\\": 2}}" "</tool_call>"\n'
    )
    inner = GrammarSampler(gbnf, pieces, eos_ids=(6,))
    lz = LazyGrammarSampler(inner, ["<tool_call>"])
    lz.reset()
    # prose: everything allowed, engine can skip the mask
    assert lz.inactive
    assert lz.mask().all()
    lz.accept(0)  # "Hello"
    lz.accept(1)  # " world"
    assert lz.inactive and lz.mask().all()
    # trigger split across two tokens
    lz.accept(2)  # "<tool"
    assert lz.inactive
    lz.accept(3)  # "_call>"
    assert not lz.inactive
    # constrained now: only the schema-valid payload token is admissible
    m = lz.mask()
    assert m[4] and not m[7] and not m[8] and not m[6]
    lz.accept(4)
    lz.accept(5)  # "</tool_call>"
    # grammar can end -> EOS allowed
    assert lz.mask()[6]


def test_lazy_grammar_mid_token_trigger_and_reset():
    from vlut_tpu.runtime.grammar import (GrammarError, GrammarSampler,
                                          LazyGrammarSampler)

    pieces = ["Sure: <t>", "ok", "</t>", "no", "<eos>"]
    inner = GrammarSampler('root ::= "<t>" "ok" "</t>"', pieces,
                           eos_ids=(4,))
    lz = LazyGrammarSampler(inner, ["<t>"])
    lz.reset()
    # prose prefix and the trigger in ONE token: grammar input starts at
    # the trigger's first char
    lz.accept(0)
    assert not lz.inactive
    m = lz.mask()
    assert m[1] and not m[3]
    lz.accept(1)
    lz.accept(2)
    assert lz.mask()[4]
    # bad token after activation raises (engine fails the request)
    lz.reset()
    assert lz.inactive
    lz.accept(0)
    with pytest.raises(GrammarError):
        lz.accept(3)


def test_server_auto_tool_choice_wires_lazy_grammar():
    """_grammar_from_body builds a LazyGrammarSampler for auto-mode tool
    bodies (server attaches grammar_lazy + grammar_triggers)."""
    from vlut_tpu.runtime.grammar import LazyGrammarSampler, tool_call_gbnf

    class _Tok:
        _trie = None
        eos_id = 4

        def pieces(self):
            return ["<tool_call>", '{"name": "f", "arguments": {}}',
                    "</tool_call>", "hi", "<eos>"]

        def make_grammar(self, gbnf):
            from vlut_tpu.utils.tokenizer import Tokenizer

            return Tokenizer.make_grammar(self, gbnf)

    from vlut_tpu.serving.server import _grammar_from_body

    tools = [{"type": "function",
              "function": {"name": "f", "parameters": {"type": "object"}}}]
    body = {"grammar": tool_call_gbnf(tools), "grammar_lazy": True,
            "grammar_triggers": ["<tool_call>"]}
    g = _grammar_from_body(body, _Tok())
    assert isinstance(g, LazyGrammarSampler)
    g.reset()
    g.accept(3)          # free-form prose ok
    assert g.inactive
    g.accept(0)          # trigger token
    assert not g.inactive
    m = g.mask()
    assert m[1] and not m[3]

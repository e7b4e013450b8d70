"""Tokenizer host layer.

The reference reimplements SPM/BPE/WPM/UGM in 3.9k lines of C++
(src/llama-vocab.cpp); per SURVEY §7 we deliberately reuse HF tokenizers on
the host instead — the checkpoint directory carries the tokenizer files
verbatim (convert/checkpoint.py), so AutoTokenizer works offline.
"""

from __future__ import annotations

import pathlib
from typing import Any


class Tokenizer:
    def __init__(self, path: str | pathlib.Path):
        try:
            from transformers import AutoTokenizer
        except ImportError as e:  # pragma: no cover
            raise RuntimeError(
                "transformers is required for tokenization"
            ) from e
        self.tk = AutoTokenizer.from_pretrained(str(path))

    def encode(self, text: str, add_bos: bool = True) -> list[int]:
        ids = self.tk.encode(text, add_special_tokens=add_bos)
        return list(ids)

    def decode(self, ids: list[int]) -> str:
        return self.tk.decode(ids, skip_special_tokens=False)

    def apply_chat_template(
        self,
        messages: list[dict[str, Any]],
        add_generation_prompt=True,
        tools: list[dict[str, Any]] | None = None,
    ) -> list[int]:
        kwargs: dict[str, Any] = {}
        if tools:
            kwargs["tools"] = tools
        if getattr(self.tk, "chat_template", None) is None:
            # checkpoint carries no template: fall back to ChatML, the
            # reference server's default (common/chat.cpp chatml fallback)
            kwargs["chat_template"] = (
                "{% for message in messages %}"
                "{{'<|im_start|>' + message['role'] + '\n'"
                " + message['content'] + '<|im_end|>' + '\n'}}"
                "{% endfor %}"
                "{% if add_generation_prompt %}"
                "{{'<|im_start|>assistant\n'}}{% endif %}"
            )
        return list(
            self.tk.apply_chat_template(
                messages,
                add_generation_prompt=add_generation_prompt,
                tokenize=True,
                **kwargs,
            )
        )

    @property
    def eos_id(self) -> int | None:
        return self.tk.eos_token_id

    @property
    def bos_id(self) -> int | None:
        return self.tk.bos_token_id

    @property
    def vocab_size(self) -> int:
        return len(self.tk)

    def pieces(self) -> list[str]:
        """Decoded text of every vocab id — the grammar engine's view of the
        vocabulary (src/llama-vocab.cpp token_to_piece analog).  Special
        tokens decode to "" so grammars never emit them.  Cached."""
        if getattr(self, "_pieces", None) is None:
            n = len(self.tk)
            special = set(self.tk.all_special_ids)
            out = []
            for i in range(n):
                if i in special:
                    out.append("")
                else:
                    out.append(self.tk.decode([i], skip_special_tokens=False))
            self._pieces = out
        return self._pieces

    def make_grammar(self, gbnf: str):
        """Build a GrammarSampler bound to this vocab (EOS allowed at
        grammar accept states).  The vocab trie (~seconds to build for a
        128k vocab) is cached and shared across grammars."""
        from vlut_tpu.runtime.grammar import GrammarSampler, VocabTrie

        if getattr(self, "_trie", None) is None:
            self._trie = VocabTrie(self.pieces())
        eos = (self.eos_id,) if self.eos_id is not None else ()
        return GrammarSampler(
            gbnf, self.pieces(), eos_ids=eos, trie=self._trie
        )

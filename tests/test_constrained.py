"""Constrained decoding: regex engine, token masks, end-to-end grammar.

Reference analog: test/srt constrained tests (xgrammar/outlines backends);
here the engine is in-repo (constrained/regex_engine.py).
"""

import json

import numpy as np
import pytest

from sglang_custom_tpu.constrained.grammar_backend import (
    GrammarBackend,
    json_schema_to_regex,
)
from sglang_custom_tpu.constrained.regex_engine import compile_regex


def matches(dfa, s: str) -> bool:
    st = dfa.advance_bytes(dfa.start, s.encode())
    return st >= 0 and bool(dfa.accepting[st])


def test_regex_basics():
    dfa = compile_regex(r"ab+c?")
    assert matches(dfa, "ab")
    assert matches(dfa, "abbbc")
    assert not matches(dfa, "ac")
    assert not matches(dfa, "abcc")


def test_regex_classes_and_alt():
    dfa = compile_regex(r"(yes|no|maybe)")
    for s in ("yes", "no", "maybe"):
        assert matches(dfa, s)
    assert not matches(dfa, "yess")

    dfa = compile_regex(r"[a-c]{2,3}\d+")
    assert matches(dfa, "ab12")
    assert matches(dfa, "abc1")
    assert not matches(dfa, "a1")
    assert not matches(dfa, "abcd1")


def test_regex_unicode_literal():
    dfa = compile_regex("héllo")
    assert matches(dfa, "héllo")
    assert not matches(dfa, "hello")


def test_forced_path():
    dfa = compile_regex(r'\{"name": ".*"\}')
    assert dfa.forced_path(dfa.start).startswith(b'{"name": "')


def test_json_schema_regex():
    schema = {
        "type": "object",
        "properties": {
            "name": {"type": "string"},
            "age": {"type": "integer"},
            "tags": {"type": "array", "items": {"type": "string"},
                     "maxItems": 3},
        },
    }
    rx = json_schema_to_regex(schema)
    dfa = compile_regex(rx)
    ok = '{"name": "bob", "age": 42, "tags": ["a", "b"]}'
    assert matches(dfa, ok)
    assert not matches(dfa, '{"name": bob}')
    assert not matches(dfa, '{"age": 42}')


class FakeTok:
    """Tiny vocab for mask tests."""
    vocab = ["a", "b", "ab", "1", "12", "x", "</s>"]
    all_special_ids = [6]

    def decode(self, ids):
        return self.vocab[ids[0]]

    def encode(self, s, add_special_tokens=False):
        # greedy longest-match
        out = []
        i = 0
        while i < len(s):
            best = None
            for tid, t in enumerate(self.vocab[:-1]):
                if s.startswith(t, i) and (best is None or len(t) > len(self.vocab[best])):
                    best = tid
            if best is None:
                raise ValueError(s)
            out.append(best)
            i += len(self.vocab[best])
        return out


def unpack(mask, vocab_size):
    bits = []
    for t in range(vocab_size):
        bits.append(bool((int(mask[t // 32]) >> (t % 32)) & 1))
    return bits


def test_token_masks():
    be = GrammarBackend(FakeTok(), 7)
    from sglang_custom_tpu.constrained import Grammar

    g = Grammar(be.get(regex=r"ab1*"), eos_token_ids={6})
    bits = unpack(g.vocab_mask(), 7)
    # from start: "a" ok, "ab" ok; "b"/"1"/"x" not; eos not (not accepting)
    assert bits == [True, False, True, False, False, False, False]
    assert g.accept_token(0)  # "a"
    bits = unpack(g.vocab_mask(), 7)
    assert bits[1] and not bits[0]  # now "b" ok
    assert g.accept_token(1)  # "b" -> accepting (1* allows empty)
    bits = unpack(g.vocab_mask(), 7)
    assert bits[3]       # "1" legal
    assert not bits[4]   # "12" contains '2' which the regex disallows
    assert bits[6]       # eos legal in an accepting state
    assert not g.accept_token(5)  # "x" illegal


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    path = tmp_path_factory.mktemp("tiny_llama_grammar")
    cfg = LlamaConfig(
        vocab_size=300, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    LlamaForCausalLM(cfg).to(torch.float32).save_pretrained(
        path, safe_serialization=True
    )
    # train a tiny real tokenizer so grammar text maps to tokens
    from tokenizers import Tokenizer, decoders, models, trainers
    from transformers import PreTrainedTokenizerFast

    t = Tokenizer(models.BPE(unk_token="<unk>"))
    t.decoder = decoders.Fuse()  # concatenate tokens, no space-joining
    trainer = trainers.BpeTrainer(
        vocab_size=300,
        special_tokens=["<unk>", "<s>", "</s>"],
        initial_alphabet=list("abcdefghijklmnopqrstuvwxyz0123456789{}\":, .-"),
    )
    t.train_from_iterator(
        ['{"name": "bob", "age": 4} yes no maybe true false null ' * 3],
        trainer,
    )
    fast = PreTrainedTokenizerFast(
        tokenizer_object=t, unk_token="<unk>", bos_token="<s>", eos_token="</s>",
    )
    fast.save_pretrained(path)

    from sglang_custom_tpu.config.server_args import ServerArgs
    from sglang_custom_tpu.entrypoints.engine import Engine

    eng = Engine(
        server_args=ServerArgs(
            model_path=str(path), dtype="float32", device="cpu", page_size=16,
        ),
        num_pages=256,
    )
    yield eng
    eng.shutdown()


def test_engine_regex_choice(engine):
    out = engine.generate(
        prompt="pick:",
        sampling_params={"max_new_tokens": 8, "temperature": 0.0,
                         "regex": r"(yes|no|maybe)"},
    )
    assert out["text"] in ("yes", "no", "maybe"), out


def test_engine_json_schema(engine):
    schema = json.dumps({
        "type": "object",
        "properties": {"name": {"type": "string"}, "age": {"type": "integer"}},
    })
    out = engine.generate(
        prompt="give me json:",
        sampling_params={"max_new_tokens": 64, "temperature": 0.8,
                         "json_schema": schema},
    )
    obj = json.loads(out["text"])
    assert isinstance(obj["name"], str) and isinstance(obj["age"], int)


def test_engine_jump_forward(engine):
    # the fixed keys of the object are forced -> jump-forward produces them
    # without forward passes; generation still completes correctly
    schema = json.dumps({
        "type": "object",
        "properties": {"verylongkeyname": {"type": "boolean"}},
    })
    out = engine.generate(
        prompt="json:",
        sampling_params={"max_new_tokens": 40, "temperature": 0.0,
                         "json_schema": schema},
    )
    obj = json.loads(out["text"])
    assert isinstance(obj["verylongkeyname"], bool)

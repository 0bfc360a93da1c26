"""EBNF / CFG constrained decoding (constrained/ebnf_engine.py;
reference: srt/constrained/xgrammar_backend.py:148)."""

import json

import numpy as np
import pytest

from sglang_custom_tpu.constrained.ebnf_engine import (
    CfgMatcher,
    EbnfError,
    json_schema_to_ebnf,
    parse_ebnf,
)


def matches(matcher: CfgMatcher, s: bytes) -> bool:
    cfgs = matcher.initial()
    for b in s:
        cfgs = matcher.step(cfgs, b)
        if not cfgs:
            return False
    return CfgMatcher.accepting(cfgs)


def test_ebnf_basics():
    m = CfgMatcher(parse_ebnf('root ::= "ab" [0-9]+ ("x" | "y")?'))
    assert matches(m, b"ab1")
    assert matches(m, b"ab123x")
    assert matches(m, b"ab0y")
    assert not matches(m, b"ab")
    assert not matches(m, b"ab1z")
    assert not matches(m, b"b1")


def test_ebnf_recursion_balanced_parens():
    """A genuinely context-free language the regex DFA cannot express."""
    m = CfgMatcher(parse_ebnf('root ::= "(" root ")" | ""'))
    assert matches(m, b"")
    assert matches(m, b"()")
    assert matches(m, b"((()))")
    assert not matches(m, b"(()")
    assert not matches(m, b")(")


def test_ebnf_json_value_grammar():
    g = json_schema_to_ebnf({})  # unconstrained -> full JSON value
    m = CfgMatcher(parse_ebnf(g))
    for ok in ['{"a": [1, 2, {"b": null}]}', "[true, false]", '"hi"',
               "-3.5e2"]:
        assert matches(m, ok.encode()), ok
    for bad in ["{", "[1,]", "tru"]:
        assert not matches(m, bad.encode()), bad


def test_recursive_schema_to_ebnf():
    """$ref self-recursion (a linked list) — impossible for the regex
    lowering, the reason this engine exists."""
    schema = {
        "$defs": {
            "node": {
                "type": "object",
                "properties": {
                    "v": {"type": "integer"},
                    "next": {"anyOf": [
                        {"$ref": "#/$defs/node"}, {"type": "null"},
                    ]},
                },
            }
        },
        "$ref": "#/$defs/node",
    }
    m = CfgMatcher(parse_ebnf(json_schema_to_ebnf(schema)))
    ok = '{"v": 1, "next": {"v": 2, "next": null}}'
    assert matches(m, ok.encode())
    assert not matches(m, b'{"v": 1, "next": }')


def test_ebnf_errors():
    with pytest.raises(EbnfError):
        parse_ebnf('root ::= undefined_rule')
    with pytest.raises(EbnfError):
        parse_ebnf('noroot ::= "x"')
    with pytest.raises(EbnfError):
        parse_ebnf('root ::= "unterminated')


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    """Tiny model + a real trained tokenizer (grammar text must map to
    tokens — mirrors tests/test_constrained.py)."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    path = tmp_path_factory.mktemp("ebnf_model")
    cfg = LlamaConfig(
        vocab_size=300, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    LlamaForCausalLM(cfg).to(torch.float32).save_pretrained(
        path, safe_serialization=True
    )
    from tokenizers import Tokenizer, decoders, models, trainers
    from transformers import PreTrainedTokenizerFast

    t = Tokenizer(models.BPE(unk_token="<unk>"))
    t.decoder = decoders.Fuse()
    trainer = trainers.BpeTrainer(
        vocab_size=300, special_tokens=["<unk>", "<s>", "</s>"],
        initial_alphabet=list(
            "abcdefghijklmnopqrstuvwxyz0123456789{}[]()\":, .-"
        ),
    )
    t.train_from_iterator(
        ['{"v": 1, "kids": []} (ok) [ok] null true false ' * 3], trainer
    )
    fast = PreTrainedTokenizerFast(
        tokenizer_object=t, unk_token="<unk>", bos_token="<s>",
        eos_token="</s>",
    )
    fast.save_pretrained(path)

    from sglang_custom_tpu.config.server_args import ServerArgs
    from sglang_custom_tpu.entrypoints.engine import Engine

    eng = Engine(server_args=ServerArgs(
        model_path=str(path), page_size=16, context_length=512,
        dtype="float32", device="cpu",
    ), num_pages=256)
    yield eng
    eng.shutdown()


def test_engine_ebnf_generation(engine):
    """End-to-end: EBNF-constrained generation through the Engine — a
    recursive parenthesis grammar over the tokenizer."""
    eng = engine
    if True:
        out = eng.generate(
            prompt="hello",
            sampling_params={
                "max_new_tokens": 24, "temperature": 1.0,
                "ebnf": 'root ::= "(" root ")" | "[" root "]" | "ok"',
            },
        )
        text = out["text"]
        m = CfgMatcher(parse_ebnf(
            'root ::= "(" root ")" | "[" root "]" | "ok"'
        ))
        # generated text must be a PREFIX of the language (or complete)
        cfgs = m.initial()
        for b in text.encode():
            cfgs = m.step(cfgs, b)
            assert cfgs, f"illegal byte in {text!r}"
        # jump-forward should have filled forced closers when possible
        assert "ok" in text or text.count("(") + text.count("[") > 0


def test_engine_recursive_schema(engine):
    """Recursive JSON schema routes through the CFG engine and yields
    parseable JSON."""
    eng = engine
    schema = json.dumps({
        "$defs": {"tree": {"type": "object", "properties": {
            "v": {"type": "integer"},
            "kids": {"type": "array",
                     "items": {"$ref": "#/$defs/tree"}},
        }}},
        "$ref": "#/$defs/tree",
    })
    if True:
        out = eng.generate(
            prompt="data:",
            sampling_params={
                "max_new_tokens": 48, "temperature": 0.9,
                "json_schema": schema,
            },
        )
        text = out["text"]
        # must be a legal prefix; if generation ran to completion it parses
        try:
            obj = json.loads(text)
            assert isinstance(obj, dict)
        except json.JSONDecodeError:
            assert text.startswith("{")

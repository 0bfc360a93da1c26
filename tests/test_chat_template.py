"""Chat-template registry + external client backends (lang/chat_template.py,
lang/client_backends.py).

Reference analog: python/sglang/lang/chat_template.py templates +
lang/backend/openai.py / anthropic.py — tested with a fake transport
(zero egress).
"""

import pytest

from sglang_custom_tpu.lang import (
    Anthropic,
    ChatTemplate,
    OpenAI,
    assistant,
    function,
    gen,
    get_chat_template,
    match_chat_template,
    register_chat_template,
    system,
    user,
)


def test_registry_and_render():
    t = get_chat_template("chatml")
    msgs = [
        {"role": "system", "content": "be brief"},
        {"role": "user", "content": "hi"},
    ]
    p = t.render(msgs)
    assert p == (
        "<|im_start|>system\nbe brief<|im_end|>\n"
        "<|im_start|>user\nhi<|im_end|>\n"
        "<|im_start|>assistant\n"
    )
    # without generation prompt the assistant prefix stays closed
    assert t.render(msgs, add_generation_prompt=False).endswith("<|im_end|>\n")

    with pytest.raises(KeyError):
        get_chat_template("nope")


def test_default_system_prompt_injected():
    t = get_chat_template("vicuna_v1.1")
    p = t.render([{"role": "user", "content": "q"}])
    assert p.startswith("A chat between")
    # explicit system message suppresses the default
    p2 = t.render([
        {"role": "system", "content": "custom"},
        {"role": "user", "content": "q"},
    ])
    assert "A chat between" not in p2 and "custom" in p2


def test_model_path_matching():
    assert match_chat_template("meta-llama/Llama-3.1-8B-Instruct").name == "llama-3"
    assert match_chat_template("Qwen/Qwen2.5-7B").name == "chatml"
    assert match_chat_template("google/gemma-2-9b-it").name == "gemma-it"
    assert match_chat_template("totally-unknown") is None


def test_custom_template_registration():
    register_chat_template(ChatTemplate(
        name="_test_tpl",
        roles={"user": ("U:", "\n"), "assistant": ("A:", "\n")},
    ))
    assert get_chat_template("_test_tpl").render(
        [{"role": "user", "content": "x"}]
    ) == "U:x\nA:"


def _fake_openai_transport(calls):
    def transport(url, headers, body):
        calls.append((url, headers, body))
        return {
            "choices": [{
                "message": {"content": "paris"},
                "finish_reason": "stop",
            }],
            "usage": {"total_tokens": 7},
        }
    return transport


def test_openai_backend_chat_program():
    calls = []
    be = OpenAI("gpt-test", api_key="k",
                transport=_fake_openai_transport(calls))

    @function
    def ask(s):
        s += system("be brief")
        s += user("capital of france?")
        s += assistant(gen("ans", max_tokens=8, temperature=0.0))

    st = ask.run(backend=be)
    assert st["ans"] == "paris"
    url, headers, body = calls[0]
    assert url.endswith("/v1/chat/completions")
    assert headers["Authorization"] == "Bearer k"
    # chat-native: the message list itself was sent, not a rendered string
    assert body["messages"][0] == {"role": "system", "content": "be brief"}
    assert body["messages"][1]["role"] == "user"
    assert body["max_tokens"] == 8 and body["temperature"] == 0.0


def test_openai_select_parses_index():
    def transport(url, headers, body):
        return {"choices": [{"message": {"content": "1"},
                             "finish_reason": "stop"}]}
    be = OpenAI("gpt-test", transport=transport)
    choice, scores = be.select("pick", ["a", "b", "c"])
    assert choice == "b" and scores == [0.0, 1.0, 0.0]


def test_anthropic_backend_chat_program():
    calls = []

    def transport(url, headers, body):
        calls.append((url, headers, body))
        return {
            "content": [{"type": "text", "text": "4"}],
            "stop_reason": "end_turn",
            "usage": {"output_tokens": 1},
        }

    be = Anthropic("claude-test", api_key="ak", transport=transport)

    @function
    def add(s):
        s += system("you are a calculator")
        s += user("2+2?")
        s += assistant(gen("ans", max_tokens=4))

    st = add.run(backend=be)
    assert st["ans"] == "4"
    url, headers, body = calls[0]
    assert url.endswith("/v1/messages")
    assert headers["x-api-key"] == "ak"
    # system goes in the top-level field, not the message list
    assert body["system"] == "you are a calculator"
    assert all(m["role"] != "system" for m in body["messages"])


def test_explicit_template_overrides_tokenizer():
    """A backend with chat_template set renders prompts through it even
    with no tokenizer at all."""
    from sglang_custom_tpu.lang.backends import BaseBackend

    class Echo(BaseBackend):
        def __init__(self):
            self.prompts = []

        def generate(self, prompt, sampling):
            self.prompts.append(prompt)
            return "ok", {}

    be = Echo()
    be.set_chat_template("chatml")

    @function
    def prog(s):
        s += user("hello")
        s += assistant(gen("x", max_tokens=2))

    prog.run(backend=be)
    assert be.prompts[0] == (
        "<|im_start|>user\nhello<|im_end|>\n<|im_start|>assistant\n"
    )

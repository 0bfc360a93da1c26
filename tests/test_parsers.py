"""Tests for function-call and reasoning parsers
(reference test strategy: test/srt/openai_server/function_call, and
reasoning parser unit tests)."""

import json

import pytest

from sglang_custom_tpu.parsers.function_call import (
    FunctionCallParser,
    build_tool_regex,
)
from sglang_custom_tpu.parsers.reasoning import ReasoningParser

TOOLS = [
    {
        "type": "function",
        "function": {
            "name": "get_weather",
            "parameters": {
                "type": "object",
                "properties": {"city": {"type": "string"}},
                "required": ["city"],
            },
        },
    },
    {
        "type": "function",
        "function": {"name": "get_time", "parameters": {"type": "object",
                                                        "properties": {}}},
    },
]


class TestFunctionCallParser:
    def test_json_format(self):
        p = FunctionCallParser(TOOLS, format="json")
        text = 'Sure! {"name": "get_weather", "parameters": {"city": "Paris"}}'
        assert p.has_tool_call(text) or "{" in text
        normal, calls = p.parse_non_stream(text)
        assert len(calls) == 1
        assert calls[0].name == "get_weather"
        assert json.loads(calls[0].arguments) == {"city": "Paris"}
        assert "Sure!" in normal

    def test_json_parallel(self):
        p = FunctionCallParser(TOOLS, format="json")
        text = ('{"name": "get_weather", "parameters": {"city": "NYC"}};'
                '{"name": "get_time", "parameters": {}}')
        _, calls = p.parse_non_stream(text)
        assert [c.name for c in calls] == ["get_weather", "get_time"]
        assert [c.tool_index for c in calls] == [0, 1]

    def test_json_filters_undeclared(self):
        p = FunctionCallParser(TOOLS, format="json")
        _, calls = p.parse_non_stream('{"name": "rm_rf", "parameters": {}}')
        assert calls == []

    def test_qwen_format(self):
        p = FunctionCallParser(TOOLS, format="qwen25")
        text = ('I will check.\n<tool_call>\n'
                '{"name": "get_weather", "arguments": {"city": "Tokyo"}}\n'
                '</tool_call>')
        assert p.has_tool_call(text)
        normal, calls = p.parse_non_stream(text)
        assert calls[0].name == "get_weather"
        assert json.loads(calls[0].arguments) == {"city": "Tokyo"}
        assert normal == "I will check."

    def test_mistral_format(self):
        p = FunctionCallParser(TOOLS, format="mistral")
        text = ('[TOOL_CALLS] [{"name": "get_weather", '
                '"arguments": {"city": "Oslo"}}, '
                '{"name": "get_time", "arguments": {}}]')
        normal, calls = p.parse_non_stream(text)
        assert len(calls) == 2
        assert calls[1].name == "get_time"

    def test_pythonic_format(self):
        p = FunctionCallParser(TOOLS, format="pythonic")
        text = '[get_weather(city="Berlin")]'
        assert p.has_tool_call(text)
        _, calls = p.parse_non_stream(text)
        assert calls[0].name == "get_weather"
        assert json.loads(calls[0].arguments) == {"city": "Berlin"}

    def test_deepseekv3_format(self):
        p = FunctionCallParser(TOOLS, format="deepseekv3")
        text = (
            "<｜tool▁calls▁begin｜><｜tool▁call▁begin｜>function"
            "<｜tool▁sep｜>get_weather\n```json\n{\"city\": \"Rome\"}\n```"
            "<｜tool▁call▁end｜><｜tool▁calls▁end｜>"
        )
        _, calls = p.parse_non_stream(text)
        assert calls[0].name == "get_weather"
        assert json.loads(calls[0].arguments) == {"city": "Rome"}

    def test_kimi_format(self):
        p = FunctionCallParser(TOOLS, format="kimi_k2")
        text = (
            "<|tool_calls_section_begin|><|tool_call_begin|>"
            "functions.get_time:0<|tool_call_argument_begin|>{}"
            "<|tool_call_end|><|tool_calls_section_end|>"
        )
        _, calls = p.parse_non_stream(text)
        assert calls[0].name == "get_time"

    def test_unknown_format_raises(self):
        with pytest.raises(ValueError):
            FunctionCallParser(TOOLS, format="nope")

    def test_build_tool_regex_matches_emission(self):
        import re

        rx = build_tool_regex(TOOLS, format="json",
                              required_name="get_weather")
        emission = '{"name": "get_weather", "parameters": {"city": "X"}}'
        assert re.fullmatch(rx, emission)

    def test_build_tool_regex_qwen_wrapper(self):
        rx = build_tool_regex(TOOLS, format="qwen25")
        assert rx.startswith("<tool_call>")


class TestReasoningParser:
    def test_oneshot_deepseek_r1(self):
        p = ReasoningParser("deepseek-r1")
        r = p.parse("step 1... step 2</think>The answer is 4.")
        assert r.reasoning_text == "step 1... step 2"
        assert r.normal_text == "The answer is 4."

    def test_oneshot_qwen3_no_think(self):
        p = ReasoningParser("qwen3")
        r = p.parse("Just an answer.")
        assert r.normal_text == "Just an answer."
        assert r.reasoning_text == ""

    def test_oneshot_qwen3_with_think(self):
        p = ReasoningParser("qwen3")
        r = p.parse("<think>hmm</think>ok")
        assert r.reasoning_text == "hmm"
        assert r.normal_text == "ok"

    def test_truncated_reasoning(self):
        p = ReasoningParser("deepseek-r1")
        r = p.parse("never finished thinking")
        assert r.reasoning_text == "never finished thinking"
        assert r.normal_text == ""

    def test_streaming_split_tag(self):
        p = ReasoningParser("qwen3")
        reasoning, normal = "", ""
        # end tag split across chunks; start tag split too
        for chunk in ["<thi", "nk>deep", " thought</thi", "nk>ans", "wer"]:
            r = p.parse_increment(chunk)
            reasoning += r.reasoning_text
            normal += r.normal_text
        assert reasoning == "deep thought"
        assert normal == "answer"

    def test_streaming_starts_in_reasoning(self):
        p = ReasoningParser("deepseek-r1")
        out = [p.parse_increment(c) for c in ["abc", "</think>", "xyz"]]
        assert "".join(o.reasoning_text for o in out) == "abc"
        assert "".join(o.normal_text for o in out) == "xyz"

    def test_streaming_hold_reasoning(self):
        p = ReasoningParser("qwen3-thinking", stream_reasoning=False)
        r1 = p.parse_increment("part1 ")
        assert r1.reasoning_text == ""
        r2 = p.parse_increment("part2</think>done")
        assert r2.reasoning_text == "part1 part2"
        assert r2.normal_text == "done"

    def test_kimi_tags(self):
        p = ReasoningParser("kimi")
        r = p.parse("◁think▷why◁/think▷because")
        assert r.reasoning_text == "why"
        assert r.normal_text == "because"

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            ReasoningParser("nope")


def test_qwen3_xml_detector():
    """Qwen3 XML parameter format (reference: qwen3_detector.py)."""
    from sglang_custom_tpu.parsers.function_call import FunctionCallParser

    tools = [{"type": "function",
              "function": {"name": "execute_bash", "parameters": {}}}]
    p = FunctionCallParser(tools, format="qwen3")
    text = ("let me check\n<tool_call>\n<function=execute_bash>\n"
            "<parameter=command>\npwd && ls\n</parameter>\n"
            "<parameter=timeout>\n30\n</parameter>\n"
            "</function>\n</tool_call>")
    normal, calls = p.parse_non_stream(text)
    assert len(calls) == 1
    assert calls[0].name == "execute_bash"
    import json as _json

    args = _json.loads(calls[0].arguments)
    assert args["command"] == "pwd && ls"
    assert args["timeout"] == 30
    assert normal.strip() == "let me check"


def test_glm4_detector():
    from sglang_custom_tpu.parsers.function_call import FunctionCallParser

    tools = [{"type": "function",
              "function": {"name": "get_weather", "parameters": {}}}]
    p = FunctionCallParser(tools, format="glm4")
    import json as _json

    normal, calls = p.parse_non_stream(
        '<|tool_call|>get_weather\n{"city": "Beijing"}'
    )
    assert len(calls) == 1 and calls[0].name == "get_weather"
    assert _json.loads(calls[0].arguments) == {"city": "Beijing"}

    normal, calls = p.parse_non_stream('get_weather\n{"city": "SF"}')
    assert len(calls) == 1
    assert _json.loads(calls[0].arguments) == {"city": "SF"}

"""Tool/function-call parsing from model output.

Capability analog of the reference's function-call subsystem
(reference: srt/function_call/function_call_parser.py + per-model
detectors llama32/qwen25/mistral/deepseekv3/pythonic/kimik2, and
ebnf_composer.py for constrained tool output). Own design:

- One ``FunctionCallParser`` facade with a format registry.
- Each detector implements ``parse(text) -> (normal_text, [ToolCallItem])``
  and ``has_tool_call(text) -> bool``; streaming callers buffer the tail
  after ``detect_start`` and parse on flush (simpler than the reference's
  per-token incremental JSON parser, same API surface at the chunk level).
- ``build_tool_regex`` composes a regex for our DFA-based constrained
  decoder so ``tool_choice="required"``/named-function forcing is grammar
  enforced (the ebnf_composer analog for a regex engine).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple


@dataclass
class ToolCallItem:
    name: str
    arguments: str  # JSON-encoded argument object
    tool_index: int = 0


def _try_json(text: str):
    try:
        return json.loads(text)
    except Exception:
        return None


def _scan_json_objects(text: str) -> Tuple[List[dict], str]:
    """Find top-level JSON objects in `text` with a brace scanner (robust to
    surrounding prose). Returns (objects, text_with_objects_removed)."""
    objs = []
    keep = []
    i, n = 0, len(text)
    last = 0
    while i < n:
        if text[i] == "{":
            depth = 0
            in_str = False
            esc = False
            j = i
            while j < n:
                c = text[j]
                if in_str:
                    if esc:
                        esc = False
                    elif c == "\\":
                        esc = True
                    elif c == '"':
                        in_str = False
                elif c == '"':
                    in_str = True
                elif c == "{":
                    depth += 1
                elif c == "}":
                    depth -= 1
                    if depth == 0:
                        break
                j += 1
            if j < n:
                obj = _try_json(text[i : j + 1])
                if isinstance(obj, dict):
                    objs.append(obj)
                    keep.append(text[last:i])
                    last = j + 1
                    i = j + 1
                    continue
        i += 1
    keep.append(text[last:])
    return objs, "".join(keep)


def _obj_to_call(obj: dict, idx: int) -> Optional[ToolCallItem]:
    if not isinstance(obj, dict) or "name" not in obj:
        return None
    args = obj.get("parameters", obj.get("arguments", {}))
    if isinstance(args, str):
        parsed = _try_json(args)
        args = parsed if parsed is not None else args
    return ToolCallItem(
        name=str(obj["name"]),
        arguments=json.dumps(args, ensure_ascii=False),
        tool_index=idx,
    )


class BaseDetector:
    """Per-model-family tool-call wire format."""

    start_marker: str = ""

    def has_tool_call(self, text: str) -> bool:
        return bool(self.start_marker) and self.start_marker in text

    def detect_start(self, text: str) -> int:
        """Offset of the first possible tool-call marker, or -1."""
        if not self.start_marker:
            return -1
        return text.find(self.start_marker)

    def parse(self, text: str) -> Tuple[str, List[ToolCallItem]]:
        raise NotImplementedError


class JsonDetector(BaseDetector):
    """Llama-3.x style: bare JSON `{"name": ..., "parameters": ...}`,
    optionally after `<|python_tag|>`; `;`-separated for parallel calls
    (reference: llama32_detector.py behavior)."""

    start_marker = "{"

    def has_tool_call(self, text: str) -> bool:
        t = text.lstrip()
        return t.startswith("{") or "<|python_tag|>" in text

    def parse(self, text: str):
        body = text.replace("<|python_tag|>", "")
        objs, rest = _scan_json_objects(body)
        calls = []
        for o in objs:
            c = _obj_to_call(o, len(calls))
            if c:
                calls.append(c)
        rest = rest.replace(";", "").strip() if calls else text
        return rest, calls


class QwenDetector(BaseDetector):
    """Qwen2.5/3 style: `<tool_call>\\n{json}\\n</tool_call>` blocks
    (reference: qwen25_detector.py behavior)."""

    start_marker = "<tool_call>"
    _rx = re.compile(r"<tool_call>\s*(.*?)\s*</tool_call>", re.DOTALL)

    def parse(self, text: str):
        calls = []
        for mtext in self._rx.findall(text):
            obj = _try_json(mtext)
            c = _obj_to_call(obj, len(calls)) if obj else None
            if c:
                calls.append(c)
        normal = self._rx.sub("", text).strip()
        return normal, calls


class MistralDetector(BaseDetector):
    """Mistral style: `[TOOL_CALLS] [{...}, {...}]`
    (reference: mistral_detector.py behavior)."""

    start_marker = "[TOOL_CALLS]"

    def parse(self, text: str):
        idx = text.find(self.start_marker)
        if idx < 0:
            return text, []
        normal = text[:idx].strip()
        body = text[idx + len(self.start_marker):].strip()
        arr_end = self._find_array_end(body)
        arr = _try_json(body[:arr_end]) if arr_end > 0 else None
        calls = []
        if isinstance(arr, list):
            for o in arr:
                c = _obj_to_call(o, len(calls))
                if c:
                    calls.append(c)
        tail = body[arr_end:].strip() if arr_end > 0 else body
        if tail:
            normal = (normal + " " + tail).strip()
        return normal, calls

    @staticmethod
    def _find_array_end(s: str) -> int:
        depth = 0
        in_str = esc = False
        for i, c in enumerate(s):
            if in_str:
                if esc:
                    esc = False
                elif c == "\\":
                    esc = True
                elif c == '"':
                    in_str = False
            elif c == '"':
                in_str = True
            elif c in "[{":
                depth += 1
            elif c in "]}":
                depth -= 1
                if depth == 0:
                    return i + 1
        return -1


class DeepSeekV3Detector(BaseDetector):
    """DeepSeek-V3 style unicode-fenced blocks
    (reference: deepseekv3_detector.py behavior)."""

    start_marker = "<｜tool▁calls▁begin｜>"
    _rx = re.compile(
        r"<｜tool▁call▁begin｜>function<｜tool▁sep｜>([^\n]+)\n"
        r"```json\n(.*?)\n```<｜tool▁call▁end｜>",
        re.DOTALL,
    )

    def parse(self, text: str):
        calls = []
        for name, args in self._rx.findall(text):
            obj = _try_json(args)
            calls.append(
                ToolCallItem(
                    name=name.strip(),
                    arguments=json.dumps(
                        obj if obj is not None else args, ensure_ascii=False
                    ),
                    tool_index=len(calls),
                )
            )
        normal = text.split(self.start_marker, 1)[0].strip()
        return normal, calls


class PythonicDetector(BaseDetector):
    """Pythonic style: `[foo(a=1, b="x"), bar()]`
    (reference: pythonic_detector.py behavior). Arguments are parsed with
    ast.literal_eval per keyword."""

    _rx = re.compile(
        r"\[\s*[A-Za-z_][\w.]*\s*\(.*?\)\s*(?:,\s*[A-Za-z_][\w.]*\s*\(.*?\)\s*)*\]",
        re.DOTALL,
    )

    def has_tool_call(self, text: str) -> bool:
        return bool(self._rx.search(text))

    def detect_start(self, text: str) -> int:
        m = self._rx.search(text)
        return m.start() if m else text.rfind("[")

    def parse(self, text: str):
        import ast

        m = self._rx.search(text)
        if not m:
            return text, []
        calls = []
        try:
            tree = ast.parse(m.group(0), mode="eval")
            if isinstance(tree.body, ast.List):
                for node in tree.body.elts:
                    if not isinstance(node, ast.Call):
                        continue
                    name = ast.unparse(node.func)
                    kwargs = {}
                    for kw in node.keywords:
                        if kw.arg is not None:
                            kwargs[kw.arg] = ast.literal_eval(kw.value)
                    calls.append(
                        ToolCallItem(
                            name=name,
                            arguments=json.dumps(kwargs, ensure_ascii=False),
                            tool_index=len(calls),
                        )
                    )
        except (SyntaxError, ValueError):
            return text, []
        normal = (text[: m.start()] + text[m.end():]).strip()
        return normal, calls


class KimiK2Detector(BaseDetector):
    """Kimi-K2 style fenced sections (reference: kimik2_detector.py)."""

    start_marker = "<|tool_calls_section_begin|>"
    _rx = re.compile(
        r"<\|tool_call_begin\|>\s*([\w.\-]+):(\d+)\s*<\|tool_call_argument_begin\|>"
        r"(.*?)<\|tool_call_end\|>",
        re.DOTALL,
    )

    def parse(self, text: str):
        calls = []
        for name, _idx, args in self._rx.findall(text):
            name = name.split(".")[-1]
            obj = _try_json(args.strip())
            calls.append(
                ToolCallItem(
                    name=name,
                    arguments=json.dumps(
                        obj if obj is not None else args.strip(),
                        ensure_ascii=False,
                    ),
                    tool_index=len(calls),
                )
            )
        normal = text.split(self.start_marker, 1)[0].strip()
        return normal, calls


class Qwen3XmlDetector(BaseDetector):
    """Qwen3 XML style (reference: qwen3_detector.py Qwen3XMLDetector):

        <tool_call>
        <function=name>
        <parameter=key>
        value
        </parameter>
        </function>
        </tool_call>

    Parameter values parse as JSON when they look like it (numbers,
    bools, objects), else stay strings — matching the reference's
    typed-parameter handling."""

    start_marker = "<tool_call>"
    _call_rx = re.compile(r"<tool_call>(.*?)</tool_call>", re.DOTALL)
    _fn_rx = re.compile(r"<function=(.*?)>(.*?)</function>", re.DOTALL)
    _param_rx = re.compile(
        r"<parameter=(.*?)>(.*?)</parameter>", re.DOTALL
    )

    def parse(self, text: str):
        calls = []
        for block in self._call_rx.findall(text):
            for fname, body in self._fn_rx.findall(block):
                args = {}
                for pname, pval in self._param_rx.findall(body):
                    v = pval.strip("\n")
                    j = _try_json(v)
                    args[pname.strip()] = j if j is not None else v
                calls.append(ToolCallItem(
                    name=fname.strip(),
                    arguments=json.dumps(args, ensure_ascii=False),
                    tool_index=len(calls),
                ))
        normal = self._call_rx.sub("", text).strip()
        return normal, calls


class Glm4Detector(BaseDetector):
    """GLM-4 style: ``name\\n{json args}`` after the model's tool-call
    role, or ``<|tool_call|>name\\n{...}`` blocks (the GLM-4/ChatGLM
    function-call wire format)."""

    start_marker = "<|tool_call|>"
    _rx = re.compile(
        r"<\|tool_call\|>\s*([\w\.\-]+)\s*\n?\s*(\{.*?\})\s*(?=<\||$)",
        re.DOTALL,
    )

    def has_tool_call(self, text: str) -> bool:
        if self.start_marker in text:
            return True
        # bare "name\n{json}" form
        lines = text.strip().split("\n", 1)
        return (
            len(lines) == 2
            and re.fullmatch(r"[\w\.\-]+", lines[0].strip()) is not None
            and lines[1].lstrip().startswith("{")
        )

    def parse(self, text: str):
        calls = []
        for name, args in self._rx.findall(text):
            obj = _try_json(args)
            if obj is not None:
                calls.append(ToolCallItem(
                    name=name,
                    arguments=json.dumps(obj, ensure_ascii=False),
                    tool_index=len(calls),
                ))
        normal = self._rx.sub("", text).replace(
            self.start_marker, ""
        ).strip()
        if not calls:
            lines = text.strip().split("\n", 1)
            if len(lines) == 2:
                obj = _try_json(lines[1].strip())
                if obj is not None and re.fullmatch(
                    r"[\w\.\-]+", lines[0].strip()
                ):
                    calls.append(ToolCallItem(
                        name=lines[0].strip(),
                        arguments=json.dumps(obj, ensure_ascii=False),
                    ))
                    normal = ""
        return normal, calls


_DETECTORS: Dict[str, type] = {
    "llama3": JsonDetector,
    "llama4": PythonicDetector,
    "json": JsonDetector,
    "qwen25": QwenDetector,
    # qwen3 emits the XML parameter format (reference: qwen3_detector.py)
    "qwen3": Qwen3XmlDetector,
    "qwen3_xml": Qwen3XmlDetector,
    "glm4": Glm4Detector,
    "mistral": MistralDetector,
    "deepseekv3": DeepSeekV3Detector,
    "pythonic": PythonicDetector,
    "kimi_k2": KimiK2Detector,
}


class FunctionCallParser:
    """Facade: pick a detector by tool-call format, filter calls against the
    declared tool list (reference: function_call_parser.py behavior)."""

    def __init__(self, tools: List[dict], format: str = "json"):
        key = format.lower()
        if key not in _DETECTORS:
            raise ValueError(
                f"unknown tool-call format {format!r}; known: "
                f"{sorted(_DETECTORS)}"
            )
        self.detector: BaseDetector = _DETECTORS[key]()
        self.tools = tools
        self.tool_names = {
            t.get("function", t).get("name") for t in tools
        } if tools else set()

    @staticmethod
    def supported_formats():
        return sorted(_DETECTORS)

    def has_tool_call(self, text: str) -> bool:
        return self.detector.has_tool_call(text)

    def detect_start(self, text: str) -> int:
        return self.detector.detect_start(text)

    def parse_non_stream(self, text: str) -> Tuple[str, List[ToolCallItem]]:
        normal, calls = self.detector.parse(text)
        if self.tool_names:
            calls = [c for c in calls if c.name in self.tool_names]
        for i, c in enumerate(calls):
            c.tool_index = i
        return normal, calls


# -------------------------------------------------------------- constrained

def _schema_regex(schema: Optional[dict]) -> str:
    from sglang_custom_tpu.constrained.grammar_backend import (
        json_schema_to_regex,
    )

    if not schema:
        return r"\{[^{}]*\}"
    return json_schema_to_regex(schema)


def build_tool_regex(
    tools: List[dict],
    format: str = "json",
    required_name: Optional[str] = None,
) -> str:
    """Regex for grammar-constrained tool emission — the ebnf_composer
    analog (reference: srt/function_call/ebnf_composer.py) targeting our
    regex->DFA engine. Supports tool_choice="required" (any declared tool)
    or a specific function name."""
    alts = []
    for t in tools:
        fn = t.get("function", t)
        name = fn.get("name", "")
        if required_name and name != required_name:
            continue
        arg_rx = _schema_regex(fn.get("parameters"))
        name_rx = re.escape(json.dumps(name)[1:-1])
        body = (
            r'\{[ \n]*"name"[ \n]*:[ \n]*"' + name_rx +
            r'"[ \n]*,[ \n]*"(parameters|arguments)"[ \n]*:[ \n]*'
            + arg_rx + r"[ \n]*\}"
        )
        alts.append("(" + body + ")")
    if not alts:
        return r"\{[^{}]*\}"
    one = "(" + "|".join(alts) + ")"
    fmt = format.lower()
    if fmt in ("qwen25", "qwen3"):
        return r"<tool_call>\n" + one + r"\n</tool_call>"
    if fmt == "mistral":
        return r"\[TOOL_CALLS\] \[" + one + r"(, " + one + r")*\]"
    return one

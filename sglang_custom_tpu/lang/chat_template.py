"""Chat-template registry for the frontend DSL.

Analog of the reference's template registry (reference:
python/sglang/lang/chat_template.py:32 ChatTemplate +
register_chat_template / get_chat_template_by_model_path:117 — named
role-prefix/suffix templates with a model-path matcher). Used when a
backend has no HF tokenizer chat template (e.g. an HTTP endpoint without
the checkpoint locally) or when the user forces a specific style.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Tuple


@dataclasses.dataclass
class ChatTemplate:
    name: str
    # role -> (prefix, suffix)
    roles: Dict[str, Tuple[str, str]]
    default_system_prompt: Optional[str] = None
    stop_str: Tuple[str, ...] = ()
    image_token: str = "<image>"

    def render(self, messages: List[Dict[str, str]],
               add_generation_prompt: bool = True) -> str:
        """Render messages ([{role, content}]) to a prompt string; with
        ``add_generation_prompt`` the assistant prefix is left open."""
        out = []
        if self.default_system_prompt and not any(
            m["role"] == "system" for m in messages
        ):
            pre, suf = self.roles.get("system", ("", "\n"))
            out.append(pre + self.default_system_prompt + suf)
        for m in messages:
            pre, suf = self.roles.get(m["role"], ("", "\n"))
            out.append(pre + m["content"] + suf)
        if add_generation_prompt:
            out.append(self.roles.get("assistant", ("", ""))[0])
        return "".join(out)


_registry: Dict[str, ChatTemplate] = {}
_matchers: List[Callable[[str], Optional[str]]] = []


def register_chat_template(t: ChatTemplate) -> ChatTemplate:
    _registry[t.name] = t
    return t


def register_chat_template_matcher(fn: Callable[[str], Optional[str]]) -> None:
    """fn(model_path) -> template name or None
    (reference: chat_template.py register_chat_template_matching_function)."""
    _matchers.append(fn)


def get_chat_template(name: str) -> ChatTemplate:
    if name not in _registry:
        raise KeyError(
            f"unknown chat template {name!r}; known: {sorted(_registry)}"
        )
    return _registry[name]


def match_chat_template(model_path: str) -> Optional[ChatTemplate]:
    """Best-effort template from a model path/name
    (reference: get_chat_template_by_model_path)."""
    for fn in _matchers:
        name = fn(model_path)
        if name:
            return _registry.get(name)
    return None


register_chat_template(ChatTemplate(
    name="llama-3",
    roles={
        "system": ("<|start_header_id|>system<|end_header_id|>\n\n",
                   "<|eot_id|>"),
        "user": ("<|start_header_id|>user<|end_header_id|>\n\n", "<|eot_id|>"),
        "assistant": ("<|start_header_id|>assistant<|end_header_id|>\n\n",
                      "<|eot_id|>"),
    },
    stop_str=("<|eot_id|>",),
))

register_chat_template(ChatTemplate(
    name="chatml",
    roles={
        "system": ("<|im_start|>system\n", "<|im_end|>\n"),
        "user": ("<|im_start|>user\n", "<|im_end|>\n"),
        "assistant": ("<|im_start|>assistant\n", "<|im_end|>\n"),
    },
    stop_str=("<|im_end|>",),
))

register_chat_template(ChatTemplate(
    name="gemma-it",
    roles={
        # gemma has no system role; fold into the first user turn upstream
        "user": ("<start_of_turn>user\n", "<end_of_turn>\n"),
        "assistant": ("<start_of_turn>model\n", "<end_of_turn>\n"),
    },
    stop_str=("<end_of_turn>",),
))

register_chat_template(ChatTemplate(
    name="vicuna_v1.1",
    roles={
        "system": ("", " "),
        "user": ("USER: ", " "),
        "assistant": ("ASSISTANT: ", "</s>"),
    },
    default_system_prompt=(
        "A chat between a curious user and an artificial intelligence "
        "assistant. The assistant gives helpful, detailed, and polite "
        "answers to the user's questions."
    ),
    stop_str=("</s>",),
))


def _default_matcher(path: str) -> Optional[str]:
    p = path.lower()
    if "llama-3" in p or "llama3" in p:
        return "llama-3"
    if "qwen" in p or "glm" in p or "chatml" in p or "phi-3" in p:
        return "chatml"
    if "gemma" in p:
        return "gemma-it"
    if "vicuna" in p:
        return "vicuna_v1.1"
    return None


register_chat_template_matcher(_default_matcher)

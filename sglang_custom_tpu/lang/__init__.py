"""SGLang-the-language frontend.

Analog of the reference's lang/ package (reference: lang/ir.py:138 gen,
:445 select, :525/544 fork; api.py decorators; lang/chat_template.py;
lang/backend/openai.py + anthropic.py). See lang/ir.py here for the
execution model.
"""

from sglang_custom_tpu.lang.backends import EngineBackend, RuntimeEndpoint
from sglang_custom_tpu.lang.chat_template import (
    ChatTemplate,
    get_chat_template,
    match_chat_template,
    register_chat_template,
)
from sglang_custom_tpu.lang.client_backends import Anthropic, OpenAI
from sglang_custom_tpu.lang.tracer import ProgramTrace, trace_program
from sglang_custom_tpu.lang.ir import (
    SglFunction,
    assistant,
    function,
    gen,
    select,
    set_default_backend,
    system,
    user,
)

__all__ = [
    "Anthropic",
    "ChatTemplate",
    "EngineBackend",
    "OpenAI",
    "RuntimeEndpoint",
    "SglFunction",
    "assistant",
    "function",
    "gen",
    "get_chat_template",
    "match_chat_template",
    "register_chat_template",
    "select",
    "set_default_backend",
    "system",
    "user",
]

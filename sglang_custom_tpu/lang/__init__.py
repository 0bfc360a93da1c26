"""SGLang-the-language frontend.

Analog of the reference's lang/ package (reference: lang/ir.py:138 gen,
:445 select, :525/544 fork; api.py decorators). See lang/ir.py here for
the execution model.
"""

from sglang_custom_tpu.lang.backends import EngineBackend, RuntimeEndpoint
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
    "EngineBackend",
    "RuntimeEndpoint",
    "SglFunction",
    "assistant",
    "function",
    "gen",
    "select",
    "set_default_backend",
    "system",
    "user",
]

from sglang_custom_tpu.parsers.function_call import (
    FunctionCallParser,
    ToolCallItem,
)
from sglang_custom_tpu.parsers.reasoning import ReasoningParser

__all__ = ["FunctionCallParser", "ToolCallItem", "ReasoningParser"]

from sglang_custom_tpu.constrained.grammar_backend import (
    Grammar,
    GrammarBackend,
    json_schema_to_regex,
)

__all__ = ["Grammar", "GrammarBackend", "json_schema_to_regex"]

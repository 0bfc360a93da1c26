"""Program tracer: run an @sgl.function symbolically, without a backend.

Capability analog of the reference's tracer
(reference: python/sglang/lang/tracer.py — TracerProgramState executes
the program against placeholder values to recover its expression
structure, used by `.bind`, cache-prefix analysis, and debugging).

``SglFunction.trace(**kwargs)`` returns a ``ProgramTrace``:
- ``nodes``      : the flat op list [(kind, payload), ...]
- ``static_prefix()`` : the longest leading constant text — the part a
  server can pre-cache before any gen() runs (RadixAttention warm-up)
- ``pretty()``   : human-readable program structure
"""

from __future__ import annotations

import copy
from typing import Any, Dict, List, Optional, Tuple


class TraceVar(str):
    """Placeholder for a gen()/select() result: usable as a str so traced
    programs that interpolate results keep running."""

    def __new__(cls, name: str, kind: str):
        s = super().__new__(cls, f"[[{kind}:{name}]]")
        s.var_name = name
        s.kind = kind
        return s


class TracerState:
    """Duck-type of lang.ir.ProgramState that records instead of runs."""

    def __init__(self, parent: Optional["TracerState"] = None):
        self.nodes: List[Tuple[str, Any]] = (
            list(parent.nodes) if parent else []
        )
        self.variables: Dict[str, TraceVar] = (
            dict(parent.variables) if parent else {}
        )
        self.chat_mode = parent.chat_mode if parent else False
        self._role: Optional[str] = None
        self._gen_counter = [0] if parent is None else parent._gen_counter

    # -------------------------------------------------- ProgramState API

    def __iadd__(self, expr):
        self._execute(expr)
        return self

    def _execute(self, expr) -> None:
        from sglang_custom_tpu.lang.ir import (
            SglConcat,
            SglConst,
            SglGen,
            SglRole,
            SglSelect,
        )

        if isinstance(expr, str):
            self.nodes.append(("const", expr))
            return
        if isinstance(expr, SglConcat):
            for p in expr.parts:
                self._execute(p)
            return
        if isinstance(expr, SglConst):
            self.nodes.append(("const", expr.text))
            return
        if isinstance(expr, SglRole):
            self.chat_mode = True
            self.nodes.append(("role_begin", expr.role))
            self._execute(expr.content)
            self.nodes.append(("role_end", expr.role))
            return
        if isinstance(expr, SglGen):
            name = expr.name or f"gen_{self._bump()}"
            self.nodes.append(
                ("gen", {"name": name, "params": dict(expr.sampling or {})})
            )
            self.variables[name] = TraceVar(name, "gen")
            return
        if isinstance(expr, SglSelect):
            name = expr.name or f"select_{self._bump()}"
            self.nodes.append(
                ("select", {"name": name, "choices": list(expr.choices)})
            )
            self.variables[name] = TraceVar(name, "select")
            return
        raise TypeError(f"cannot trace {type(expr).__name__}")

    def _bump(self) -> int:
        self._gen_counter[0] += 1
        return self._gen_counter[0]

    def __getitem__(self, name: str):
        return self.variables[name]

    def fork(self, n: int) -> List["TracerState"]:
        self.nodes.append(("fork", n))
        return [TracerState(parent=self) for _ in range(n)]

    def text(self) -> str:
        return "".join(
            p for k, p in self.nodes if k == "const"
        )


class ProgramTrace:
    def __init__(self, state: TracerState):
        self.nodes = state.nodes
        self.variables = dict(state.variables)

    def static_prefix(self) -> str:
        """Leading constant text before the first gen/select/fork — the
        server-cacheable prompt prefix (RadixAttention warm-up target)."""
        out = []
        for kind, payload in self.nodes:
            if kind == "const":
                out.append(payload)
            elif kind in ("role_begin", "role_end"):
                continue
            else:
                break
        return "".join(out)

    def gen_names(self) -> List[str]:
        return [
            p["name"] for k, p in self.nodes if k in ("gen", "select")
        ]

    def pretty(self) -> str:
        lines = []
        for kind, payload in self.nodes:
            if kind == "const":
                t = payload if len(payload) <= 40 else payload[:37] + "..."
                lines.append(f"const {t!r}")
            elif kind == "gen":
                lines.append(f"gen[{payload['name']}] {payload['params']}")
            elif kind == "select":
                lines.append(
                    f"select[{payload['name']}] {payload['choices']}"
                )
            elif kind == "fork":
                lines.append(f"fork x{payload}")
            else:
                lines.append(f"{kind} {payload}")
        return "\n".join(lines)


def trace_program(fn, *args, **kwargs) -> ProgramTrace:
    s = TracerState()
    fn(s, *args, **kwargs)
    return ProgramTrace(s)

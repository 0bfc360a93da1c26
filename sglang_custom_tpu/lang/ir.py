"""DSL primitives and the program state machine.

Analog of the reference's IR + interpreter
(reference: lang/ir.py — SglFunction :138, SglGen :445, SglSelect :525,
SglFork/fork :544; lang/interpreter.py:250 StreamExecutor). Design
difference: execution is *eager* — each ``s += expr`` runs immediately
against the backend instead of queueing IR for an async executor thread.
The serving engine's continuous-batching scheduler already provides the
cross-program parallelism the reference's executor threads exist for, and
``fork()`` runs branches on Python threads whose shared prompt prefix hits
the radix cache (KV reuse — the fork semantics of interpreter.py).
"""

from __future__ import annotations

import copy
import threading
from typing import Any, Dict, List, Optional

_default_backend = None


def set_default_backend(backend) -> None:
    global _default_backend
    _default_backend = backend


class SglExpr:
    def __add__(self, other):
        parts = []
        for x in (self, other):
            parts.extend(x.parts if isinstance(x, SglConcat) else [x])
        return SglConcat(parts)

    def __radd__(self, other):
        if isinstance(other, str):
            return SglConcat([SglConst(other), self])
        return NotImplemented


class SglConst(SglExpr):
    def __init__(self, text: str):
        self.text = text


class SglConcat(SglExpr):
    def __init__(self, parts: List[SglExpr]):
        self.parts = parts


class SglGen(SglExpr):
    def __init__(self, name: Optional[str] = None, **sampling):
        self.name = name
        if "max_tokens" in sampling:
            sampling["max_new_tokens"] = sampling.pop("max_tokens")
        self.sampling = sampling


class SglSelect(SglExpr):
    def __init__(self, name: Optional[str], choices: List[str]):
        self.name = name
        self.choices = choices


class SglRole(SglExpr):
    def __init__(self, role: str, content):
        self.role = role
        if isinstance(content, str):
            content = SglConst(content)
        self.content = content


def gen(name: Optional[str] = None, **sampling) -> SglGen:
    """reference: lang/ir.py:445 SglGen / api.py gen()"""
    return SglGen(name, **sampling)


def select(name: Optional[str] = None, choices: Optional[List[str]] = None) -> SglSelect:
    """reference: lang/ir.py:525 SglSelect (token-length-normalized scoring
    via lang/choices.py)"""
    assert choices
    return SglSelect(name, list(choices))


def system(content="") -> SglRole:
    return SglRole("system", content)


def user(content="") -> SglRole:
    return SglRole("user", content)


def assistant(content="") -> SglRole:
    return SglRole("assistant", content)


class ProgramState:
    """``s`` inside a program (reference: interpreter.py StreamExecutor +
    ProgramState)."""

    def __init__(self, backend):
        self.backend = backend
        self.text_parts: List[str] = []
        self.messages: List[Dict[str, str]] = []  # chat mode
        self.chat_mode = False
        self.variables: Dict[str, Any] = {}
        self.meta: Dict[str, Any] = {}

    # ------------------------------------------------------------- public

    def __iadd__(self, expr):
        self._execute(expr)
        return self

    def __getitem__(self, name: str):
        return self.variables[name]

    def text(self) -> str:
        return "".join(self.text_parts)

    def fork(self, n: int) -> List["ProgramState"]:
        """n copies sharing this prefix; run them with state.run_thread or
        inline. KV for the shared prefix is reused via the radix cache
        (reference: lang/ir.py:544 fork + interpreter KV-reusing forks)."""
        forks = []
        for _ in range(n):
            s = ProgramState(self.backend)
            s.text_parts = list(self.text_parts)
            s.messages = copy.deepcopy(self.messages)
            s.chat_mode = self.chat_mode
            s.variables = dict(self.variables)
            forks.append(s)
        return forks

    # ------------------------------------------------------------ internal

    def _render_chat(self, messages, add_generation_prompt: bool = True) -> str:
        """Render chat messages to a prompt: an explicit ChatTemplate on the
        backend wins (lang/chat_template.py registry — reference:
        lang/chat_template.py get_chat_template), else the HF tokenizer's
        built-in template."""
        ct = getattr(self.backend, "chat_template", None)
        if ct is not None:
            return ct.render(messages, add_generation_prompt)
        tok = getattr(self.backend, "tokenizer", None)
        if tok is None:
            # Client backends (OpenAI/Anthropic) carry no tokenizer: try to
            # resolve a registered template from the model name before
            # failing with an actionable error (round-3 advisor finding).
            from sglang_custom_tpu.lang.chat_template import (
                match_chat_template,
            )

            name = getattr(self.backend, "model", "") or ""
            ct = match_chat_template(name)
            if ct is not None:
                self.backend.chat_template = ct
                return ct.render(messages, add_generation_prompt)
            raise RuntimeError(
                "this backend has no tokenizer and no chat template; call "
                "backend.set_chat_template(...) (lang/chat_template.py "
                "registry) before using chat-mode select()/partial gen()"
            )
        return tok.apply_chat_template(
            messages, tokenize=False,
            add_generation_prompt=add_generation_prompt,
        )

    def _prompt_for_gen(self, partial: str = "") -> str:
        if self.chat_mode:
            return self._render_chat(self.messages) + partial
        return self.text() + partial

    def _execute(self, expr) -> None:
        if isinstance(expr, str):
            expr = SglConst(expr)
        if isinstance(expr, SglConcat):
            for p in expr.parts:
                self._execute(p)
            return
        if isinstance(expr, SglConst):
            self.text_parts.append(expr.text)
            if self.chat_mode and self.messages and (
                self.messages[-1]["role"] == "assistant"
            ):
                self.messages[-1]["content"] += expr.text
            return
        if isinstance(expr, SglRole):
            self._execute_role(expr)
            return
        if isinstance(expr, SglGen):
            self._execute_gen(expr, partial="")
            return
        if isinstance(expr, SglSelect):
            self._execute_select(expr, partial="")
            return
        raise TypeError(f"cannot execute {type(expr).__name__}")

    def _execute_role(self, role: SglRole) -> None:
        self.chat_mode = True
        parts = (
            role.content.parts
            if isinstance(role.content, SglConcat)
            else [role.content]
        )
        partial = ""
        self.messages.append({"role": role.role, "content": ""})
        for p in parts:
            if isinstance(p, SglConst):
                partial += p.text
                self.messages[-1]["content"] += p.text
            elif isinstance(p, SglGen):
                assert role.role == "assistant", "gen() only in assistant role"
                out = self._execute_gen(p, partial=partial, in_role=True)
                partial += out
            elif isinstance(p, SglSelect):
                assert role.role == "assistant"
                out = self._execute_select(p, partial=partial, in_role=True)
                partial += out
            else:
                raise TypeError(type(p).__name__)

    def _execute_gen(self, g: SglGen, partial: str, in_role: bool = False) -> str:
        if (
            in_role
            and not partial
            and hasattr(self.backend, "generate_chat")
        ):
            # Chat-native API (OpenAI/Anthropic client backends): send the
            # message list itself; no prompt rendering happens client-side.
            out, meta = self.backend.generate_chat(
                self.messages[:-1], g.sampling
            )
        else:
            if in_role:
                # render chat template up to the open assistant turn
                prompt = self._render_chat(self.messages[:-1]) + partial
            else:
                prompt = self.text()
            out, meta = self.backend.generate(prompt, g.sampling)
        if g.name:
            self.variables[g.name] = out
            self.meta[g.name] = meta
        self.text_parts.append(out)
        if in_role:
            self.messages[-1]["content"] += out
        return out

    def _execute_select(self, sel: SglSelect, partial: str,
                        in_role: bool = False) -> str:
        if in_role:
            prompt = self._render_chat(self.messages[:-1]) + partial
        else:
            prompt = self.text()
        choice, scores = self.backend.select(prompt, sel.choices)
        if sel.name:
            self.variables[sel.name] = choice
            self.meta[sel.name] = {"scores": scores}
        self.text_parts.append(choice)
        if in_role:
            self.messages[-1]["content"] += choice
        return choice


class SglFunction:
    """reference: lang/ir.py:138 SglFunction (.run / .run_batch)."""

    def __init__(self, func):
        self.func = func

    def run(self, *args, backend=None, **kwargs) -> ProgramState:
        backend = backend or _default_backend
        assert backend is not None, "no backend; call set_default_backend"
        s = ProgramState(backend)
        self.func(s, *args, **kwargs)
        return s

    def trace(self, *args, **kwargs):
        """Symbolic execution without a backend (reference: lang/tracer.py
        TracerProgramState) — returns a ProgramTrace with the program's
        op structure, gen names, and cacheable static prefix."""
        from sglang_custom_tpu.lang.tracer import trace_program

        return trace_program(self.func, *args, **kwargs)

    def run_batch(
        self, batch_kwargs: List[Dict[str, Any]], backend=None,
        num_threads: int = 8,
    ) -> List[ProgramState]:
        """Parallel program execution (reference: interpreter.py:93
        run_program_batch) — threads feed the continuous-batching engine."""
        backend = backend or _default_backend
        results: List[Optional[ProgramState]] = [None] * len(batch_kwargs)
        sem = threading.Semaphore(num_threads)

        def one(i, kw):
            with sem:
                results[i] = self.run(backend=backend, **kw)

        threads = [
            threading.Thread(target=one, args=(i, kw))
            for i, kw in enumerate(batch_kwargs)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        return results

    def __call__(self, *args, **kwargs):
        return self.run(*args, **kwargs)


def function(func) -> SglFunction:
    """reference: python/sglang/api.py sglang.function decorator."""
    return SglFunction(func)

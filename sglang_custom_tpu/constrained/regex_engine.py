"""Byte-level regex -> DFA compiler (no external FSM dependency).

The native engine behind constrained decoding — the role xgrammar/outlines
play in the reference (reference: srt/constrained/outlines_backend.py,
outlines_jump_forward.py build an interegular FSM per regex; here the whole
pipeline is in-repo). Operates on UTF-8 *bytes* so the DFA transition
table is a dense [S, 256] numpy array — which is what makes the
token-mask precompute vectorizable (see grammar_backend.py).

Supported syntax: literals, escapes (\\d \\w \\s \\D \\W \\S \\n \\t \\r and
escaped metachars), ``.``, character classes ``[a-z^...]``, groups ``()``,
alternation ``|``, quantifiers ``* + ? {m} {m,} {m,n}``.

Construction: recursive-descent parse -> Thompson NFA -> subset-construction
DFA -> dead-state pruning. All sets are over byte values 0..255; multi-byte
UTF-8 literals are just byte sequences.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, FrozenSet, List, Optional, Set, Tuple

import numpy as np

_ANY_NO_NL = frozenset(range(256)) - {ord("\n")}
_DIGITS = frozenset(range(ord("0"), ord("9") + 1))
_WORD = (
    frozenset(range(ord("a"), ord("z") + 1))
    | frozenset(range(ord("A"), ord("Z") + 1))
    | _DIGITS
    | {ord("_")}
)
_SPACE = frozenset(b" \t\n\r\x0b\x0c")
_ALL = frozenset(range(256))


# ------------------------------------------------------------------ parsing

@dataclasses.dataclass
class _Node:
    kind: str  # "char", "concat", "alt", "star", "plus", "opt", "repeat", "empty"
    chars: Optional[FrozenSet[int]] = None
    children: Optional[List["_Node"]] = None
    lo: int = 0
    hi: int = 0


class _Parser:
    def __init__(self, pattern: str):
        self.b = pattern
        self.i = 0

    def peek(self) -> Optional[str]:
        return self.b[self.i] if self.i < len(self.b) else None

    def next(self) -> str:
        c = self.b[self.i]
        self.i += 1
        return c

    def parse(self) -> _Node:
        node = self._alt()
        if self.i != len(self.b):
            raise ValueError(f"unexpected {self.b[self.i]!r} at {self.i}")
        return node

    def _alt(self) -> _Node:
        branches = [self._concat()]
        while self.peek() == "|":
            self.next()
            branches.append(self._concat())
        if len(branches) == 1:
            return branches[0]
        return _Node("alt", children=branches)

    def _concat(self) -> _Node:
        items: List[_Node] = []
        while self.peek() is not None and self.peek() not in "|)":
            items.append(self._repeat())
        if not items:
            return _Node("empty")
        if len(items) == 1:
            return items[0]
        return _Node("concat", children=items)

    def _repeat(self) -> _Node:
        atom = self._atom()
        while True:
            c = self.peek()
            if c == "*":
                self.next()
                atom = _Node("star", children=[atom])
            elif c == "+":
                self.next()
                atom = _Node("plus", children=[atom])
            elif c == "?":
                self.next()
                atom = _Node("opt", children=[atom])
            elif c == "{":
                save = self.i
                self.next()
                spec = ""
                while self.peek() is not None and self.peek() != "}":
                    spec += self.next()
                if self.peek() != "}":
                    self.i = save
                    break
                self.next()
                if "," in spec:
                    lo_s, hi_s = spec.split(",", 1)
                    lo = int(lo_s) if lo_s else 0
                    hi = int(hi_s) if hi_s else -1
                else:
                    lo = hi = int(spec)
                atom = _Node("repeat", children=[atom], lo=lo, hi=hi)
            else:
                break
        return atom

    def _atom(self) -> _Node:
        c = self.next()
        if c == "(":
            if self.b[self.i : self.i + 2] == "?:":
                self.i += 2
            node = self._alt()
            if self.peek() != ")":
                raise ValueError("unbalanced (")
            self.next()
            return node
        if c == "[":
            return self._char_class()
        if c == ".":
            return _Node("char", chars=_ANY_NO_NL)
        if c == "\\":
            return _Node("char", chars=self._escape(self.next()))
        if c in "*+?{":
            raise ValueError(f"dangling quantifier {c!r}")
        return self._literal(c)

    def _literal(self, ch: str) -> _Node:
        bs = ch.encode("utf-8")
        if len(bs) == 1:
            return _Node("char", chars=frozenset({bs[0]}))
        return _Node(
            "concat",
            children=[_Node("char", chars=frozenset({b})) for b in bs],
        )

    def _escape(self, c: str) -> FrozenSet[int]:
        table = {
            "d": _DIGITS, "D": _ALL - _DIGITS,
            "w": _WORD, "W": _ALL - _WORD,
            "s": _SPACE, "S": _ALL - _SPACE,
            "n": frozenset({10}), "t": frozenset({9}), "r": frozenset({13}),
        }
        if c in table:
            return table[c]
        return frozenset(c.encode("utf-8"))  # escaped metachar / literal

    def _char_class(self) -> _Node:
        negate = False
        if self.peek() == "^":
            self.next()
            negate = True
        chars: Set[int] = set()
        first = True
        while True:
            c = self.peek()
            if c is None:
                raise ValueError("unbalanced [")
            if c == "]" and not first:
                self.next()
                break
            first = False
            self.next()
            if c == "\\":
                esc = self._escape(self.next())
                chars |= esc
                continue
            start_b = c.encode("utf-8")
            if self.peek() == "-" and self.b[self.i + 1 : self.i + 2] not in ("]", ""):
                self.next()
                end = self.next()
                chars |= set(range(ord(c), ord(end) + 1))
            else:
                if len(start_b) == 1:
                    chars.add(start_b[0])
                else:
                    raise ValueError("multi-byte char in class unsupported")
        if negate:
            chars = set(_ALL) - chars
        return _Node("char", chars=frozenset(chars))


# -------------------------------------------------------------- NFA -> DFA

class _NFA:
    def __init__(self):
        self.eps: List[List[int]] = []
        self.trans: List[List[Tuple[FrozenSet[int], int]]] = []

    def new_state(self) -> int:
        self.eps.append([])
        self.trans.append([])
        return len(self.eps) - 1


def _build_nfa(node: _Node, nfa: _NFA) -> Tuple[int, int]:
    """Returns (start, end) fragment states."""
    k = node.kind
    if k == "empty":
        s = nfa.new_state()
        return s, s
    if k == "char":
        s, e = nfa.new_state(), nfa.new_state()
        nfa.trans[s].append((node.chars, e))
        return s, e
    if k == "concat":
        s, e = _build_nfa(node.children[0], nfa)
        for ch in node.children[1:]:
            s2, e2 = _build_nfa(ch, nfa)
            nfa.eps[e].append(s2)
            e = e2
        return s, e
    if k == "alt":
        s, e = nfa.new_state(), nfa.new_state()
        for ch in node.children:
            cs, ce = _build_nfa(ch, nfa)
            nfa.eps[s].append(cs)
            nfa.eps[ce].append(e)
        return s, e
    if k == "star":
        s, e = nfa.new_state(), nfa.new_state()
        cs, ce = _build_nfa(node.children[0], nfa)
        nfa.eps[s] += [cs, e]
        nfa.eps[ce] += [cs, e]
        return s, e
    if k == "plus":
        cs, ce = _build_nfa(node.children[0], nfa)
        nfa.eps[ce].append(cs)
        e = nfa.new_state()
        nfa.eps[ce].append(e)
        return cs, e
    if k == "opt":
        s, e = nfa.new_state(), nfa.new_state()
        cs, ce = _build_nfa(node.children[0], nfa)
        nfa.eps[s] += [cs, e]
        nfa.eps[ce].append(e)
        return s, e
    if k == "repeat":
        lo, hi = node.lo, node.hi
        if hi == -1:  # {m,}
            parts = [node.children[0]] * lo + [_Node("star", children=node.children)]
        else:
            parts = [node.children[0]] * lo + [
                _Node("opt", children=node.children)
            ] * (hi - lo)
        if not parts:
            s = nfa.new_state()
            return s, s
        return _build_nfa(_Node("concat", children=parts) if len(parts) > 1
                          else parts[0], nfa)
    raise AssertionError(k)


@dataclasses.dataclass
class DFA:
    """Dense byte-transition DFA. transitions[s, b] = next state or -1."""

    transitions: np.ndarray  # [S, 256] int32
    accepting: np.ndarray    # [S] bool
    start: int = 0

    @property
    def num_states(self) -> int:
        return self.transitions.shape[0]

    def step(self, state: int, byte: int) -> int:
        return int(self.transitions[state, byte])

    def advance_bytes(self, state: int, bs: bytes) -> int:
        for b in bs:
            state = int(self.transitions[state, b])
            if state < 0:
                return -1
        return state

    def forced_path(self, state: int, max_len: int = 256) -> bytes:
        """Longest byte string forced from `state`: while exactly one byte is
        legal and the current state is not accepting, follow it (the
        jump-forward string — reference: outlines_jump_forward.py)."""
        out = bytearray()
        while len(out) < max_len:
            if self.accepting[state]:
                break
            row = self.transitions[state]
            legal = np.nonzero(row >= 0)[0]
            if len(legal) != 1:
                break
            out.append(int(legal[0]))
            state = int(row[legal[0]])
        return bytes(out)


def compile_regex(pattern: str) -> DFA:
    ast = _Parser(pattern).parse()
    nfa = _NFA()
    start, end = _build_nfa(ast, nfa)

    def eps_closure(states: FrozenSet[int]) -> FrozenSet[int]:
        stack = list(states)
        seen = set(states)
        while stack:
            s = stack.pop()
            for t in nfa.eps[s]:
                if t not in seen:
                    seen.add(t)
                    stack.append(t)
        return frozenset(seen)

    start_set = eps_closure(frozenset({start}))
    dfa_states: Dict[FrozenSet[int], int] = {start_set: 0}
    worklist = [start_set]
    rows: List[np.ndarray] = []
    accepting: List[bool] = []

    while worklist:
        cur = worklist.pop()
        idx = dfa_states[cur]
        while len(rows) <= idx:
            rows.append(np.full(256, -1, np.int32))
            accepting.append(False)
        accepting[idx] = end in cur
        # Gather outgoing byte sets.
        per_byte: Dict[int, Set[int]] = {}
        for s in cur:
            for chars, t in nfa.trans[s]:
                for b in chars:
                    per_byte.setdefault(b, set()).add(t)
        # Group identical target sets to limit closure calls.
        by_targets: Dict[FrozenSet[int], List[int]] = {}
        for b, ts in per_byte.items():
            by_targets.setdefault(frozenset(ts), []).append(b)
        for ts, bs in by_targets.items():
            nxt = eps_closure(ts)
            if nxt not in dfa_states:
                dfa_states[nxt] = len(dfa_states)
                worklist.append(nxt)
            t_idx = dfa_states[nxt]
            rows[idx][bs] = t_idx

    return DFA(
        transitions=np.stack(rows).astype(np.int32),
        accepting=np.asarray(accepting, bool),
        start=0,
    )

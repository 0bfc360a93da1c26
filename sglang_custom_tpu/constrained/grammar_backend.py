"""Token-level constrained decoding over the byte DFA.

Analog of the reference's grammar backends
(reference: srt/constrained/base_grammar_backend.py:29 BaseGrammarObject —
accept_token / fill_vocab_mask / try_jump_forward :73; outlines/xgrammar
backends; scheduler grammar cache). TPU-first details:

- The per-(dfa_state) token bitmask table is precomputed *vectorized in
  numpy*: all vocab token byte-strings are padded into a [V, Lmax] uint8
  matrix once per tokenizer, and each DFA state's mask is a batched
  table-walk ``state_v = transitions[state_v, bytes[:, j]]`` — no Python
  loop over the vocab (the role of outlines' FSM index build).
- Masks are stored bit-packed [S, ceil(V/32)] uint32 and shipped to the
  device only for rows that have a grammar (see sampler.apply_penalties).
"""

from __future__ import annotations

import threading
from typing import Dict, List, Optional, Tuple

import numpy as np

from sglang_custom_tpu.constrained.regex_engine import DFA, compile_regex
from sglang_custom_tpu.utils import get_logger

logger = get_logger(__name__)


class TokenizerIndex:
    """Per-tokenizer byte matrix of the vocabulary."""

    def __init__(self, tokenizer, vocab_size: int):
        self.vocab_size = vocab_size
        strs: List[bytes] = []
        # convert_ids_to_tokens + cleanup is wrong for byte-level BPE;
        # decode each id in one batched call instead.
        specials = set(getattr(tokenizer, "all_special_ids", []) or [])
        for tid in range(vocab_size):
            if tid in specials:
                strs.append(b"")  # specials never match grammar bytes
                continue
            try:
                s = tokenizer.decode([tid])
            except Exception:
                s = ""
            strs.append(s.encode("utf-8"))
        lmax = max((len(s) for s in strs), default=1) or 1
        self.lengths = np.asarray([len(s) for s in strs], np.int32)
        self.bytes = np.zeros((vocab_size, lmax), np.uint8)
        for i, s in enumerate(strs):
            if s:
                self.bytes[i, : len(s)] = np.frombuffer(s, np.uint8)
        # tokens that decode to nothing (specials / artifacts) are never legal
        self.empty = self.lengths == 0


def _state_masks(dfa: DFA, index: TokenizerIndex) -> Tuple[np.ndarray, np.ndarray]:
    """For every DFA state: packed legal-token mask and next-state table.

    Returns (packed_masks [S, ceil(V/32)+1] uint32, next_state [S, V] int32).
    The +1 lane holds the EOS bit (legal iff the state is accepting).
    """
    S = dfa.num_states
    V = index.vocab_size
    L = index.bytes.shape[1]
    # Walk all tokens from all states at once: [S, V] state matrix.
    trans = np.vstack([dfa.transitions, np.full((1, 256), -1, np.int32)])  # -1 row
    states = np.broadcast_to(
        np.arange(S, dtype=np.int32)[:, None], (S, V)
    ).copy()
    for j in range(L):
        active = index.lengths > j  # [V]
        bytes_j = index.bytes[:, j]  # [V]
        nxt = trans[states, bytes_j[None, :]]  # dead(-1) indexes row -1 -> -1
        states = np.where(active[None, :], nxt, states)
    legal = (states >= 0) & ~index.empty[None, :]
    next_state = np.where(legal, states, -1).astype(np.int32)

    # bit-pack [S, V] -> [S, ceil(V/32)] uint32
    Vp = ((V + 31) // 32) * 32
    padded = np.zeros((S, Vp), bool)
    padded[:, :V] = legal
    # little bitorder + LE uint32 view => bit (t % 32) of word (t // 32)
    packed = (
        np.packbits(padded, axis=-1, bitorder="little")
        .view(np.uint32)
        .reshape(S, Vp // 32)
    )
    return packed, next_state


class Grammar:
    """Per-request grammar state (reference: BaseGrammarObject). Factory:
    CFG-compiled grammars (EBNF / recursive schemas, ebnf_engine.py)
    return their own state object with the identical surface."""

    def __new__(cls, compiled, eos_token_ids):
        if hasattr(compiled, "make_state"):
            return compiled.make_state(eos_token_ids)
        return super().__new__(cls)

    def __init__(self, compiled: "_CompiledGrammar", eos_token_ids):
        if hasattr(compiled, "make_state"):
            return  # __new__ returned a CfgGrammar; nothing to init
        self.c = compiled
        self.state = compiled.dfa.start
        self.eos_token_ids = set(eos_token_ids)
        self.finished = False

    def vocab_mask(self) -> np.ndarray:
        """Packed uint32 legal-token mask for the current state; EOS bits are
        set when the DFA accepts here."""
        mask = self.c.packed[self.state].copy()
        if self.c.dfa.accepting[self.state]:
            for t in self.eos_token_ids:
                mask[t // 32] |= np.uint32(1 << (t % 32))
        return mask

    def accept_token(self, token_id: int) -> bool:
        if token_id in self.eos_token_ids:
            self.finished = True
            return bool(self.c.dfa.accepting[self.state])
        nxt = int(self.c.next_state[self.state, token_id])
        if nxt < 0:
            return False
        self.state = nxt
        return True

    def try_advance_token(self, token_id: int) -> bool:
        """Advance iff the token is legal here; unchanged on failure
        (jump-forward retokenization — scheduler._try_jump_forward)."""
        nxt = int(self.c.next_state[self.state, token_id])
        if nxt < 0:
            return False
        self.state = nxt
        return True

    def jump_forward(self) -> bytes:
        """Forced continuation bytes from the current state
        (reference: try_jump_forward :73)."""
        return self.c.dfa.forced_path(self.state)

    def advance_bytes(self, bs: bytes) -> bool:
        nxt = self.c.dfa.advance_bytes(self.state, bs)
        if nxt < 0:
            return False
        self.state = nxt
        return True


class _CompiledGrammar:
    def __init__(self, dfa: DFA, packed: np.ndarray, next_state: np.ndarray):
        self.dfa = dfa
        self.packed = packed
        self.next_state = next_state


class GrammarBackend:
    """Compile + cache grammars per tokenizer
    (reference: base_grammar_backend.py:111 cache + scheduler grammar queue)."""

    def __init__(self, tokenizer, vocab_size: int):
        self.index = TokenizerIndex(tokenizer, vocab_size)
        self._cache: Dict[str, _CompiledGrammar] = {}
        self._lock = threading.Lock()

    def get(self, regex: Optional[str] = None,
            json_schema: Optional[str] = None,
            ebnf: Optional[str] = None):
        if ebnf is not None:
            return self._get_cfg("ebnf:" + ebnf, ebnf)
        if json_schema is not None:
            from sglang_custom_tpu.constrained.ebnf_engine import (
                json_schema_to_ebnf,
                schema_is_regular,
            )

            if schema_is_regular(json_schema):
                regex = json_schema_to_regex(json_schema)
            else:
                # $ref / recursive schemas exceed the regex DFA — compile
                # through the CFG engine (reference: xgrammar
                # from_json_schema handles these natively)
                key = "schema:" + (
                    json_schema if isinstance(json_schema, str)
                    else repr(json_schema)
                )
                return self._get_cfg(key, json_schema_to_ebnf(json_schema))
        if regex is None:
            return None
        with self._lock:
            hit = self._cache.get(regex)
            if hit is not None:
                return hit
        dfa = compile_regex(regex)
        packed, next_state = _state_masks(dfa, self.index)
        compiled = _CompiledGrammar(dfa, packed, next_state)
        with self._lock:
            self._cache[regex] = compiled
        logger.info(
            "compiled grammar: %d DFA states, regex %r", dfa.num_states,
            regex[:60],
        )
        return compiled

    def _get_cfg(self, key: str, ebnf: str):
        with self._lock:
            hit = self._cache.get(key)
            if hit is not None:
                return hit
        from sglang_custom_tpu.constrained.ebnf_engine import (
            CfgMatcher,
            CompiledCfg,
            TokenTrie,
            parse_ebnf,
        )

        if not hasattr(self.index, "trie"):
            self.index.trie = TokenTrie.build(self.index)
        rules = parse_ebnf(ebnf)
        compiled = CompiledCfg(
            CfgMatcher(rules), self.index.trie, self.index
        )
        with self._lock:
            self._cache[key] = compiled
        logger.info("compiled CFG grammar: %d rules", len(rules))
        return compiled


# ----------------------------------------------------- JSON schema -> regex

_WS = r"[ \n\t]{0,4}"
_STRING = r'"([^"\\\x00-\x1f]|\\["\\bfnrt/]|\\u[0-9a-fA-F]{4}){0,512}"'
_NUMBER = r"-?(0|[1-9][0-9]{0,15})(\.[0-9]{1,15})?([eE][+-]?[0-9]{1,3})?"
_INTEGER = r"-?(0|[1-9][0-9]{0,15})"
_BOOL = r"(true|false)"
_NULL = r"null"


def json_schema_to_regex(schema, depth: int = 0) -> str:
    """JSON schema (dict or JSON string) -> regex over its serializations.

    Covers the practical subset (the reference delegates this to
    xgrammar/outlines): object w/ fixed properties (required order),
    string/number/integer/boolean/null/enum/const, arrays w/ item schema
    and min/maxItems, anyOf.
    """
    import json as _json

    if isinstance(schema, str):
        schema = _json.loads(schema)
    if depth > 16:
        raise ValueError("schema nesting too deep")

    def esc(lit: str) -> str:
        out = []
        for ch in lit:
            if ch in r"\^$.|?*+()[]{}":
                out.append("\\" + ch)
            else:
                out.append(ch)
        return "".join(out)

    if "enum" in schema:
        opts = [esc(_json.dumps(v)) for v in schema["enum"]]
        return "(" + "|".join(opts) + ")"
    if "const" in schema:
        return esc(_json.dumps(schema["const"]))
    if "anyOf" in schema or "oneOf" in schema:
        subs = schema.get("anyOf") or schema.get("oneOf")
        return "(" + "|".join(json_schema_to_regex(s, depth + 1) for s in subs) + ")"

    t = schema.get("type")
    if t == "string":
        if "pattern" in schema:
            # inner pattern is already a regex over the string body
            return '"' + schema["pattern"] + '"'
        return _STRING
    if t == "number":
        return _NUMBER
    if t == "integer":
        return _INTEGER
    if t == "boolean":
        return _BOOL
    if t == "null":
        return _NULL
    if t == "array":
        item = json_schema_to_regex(schema.get("items", {"type": "string"}),
                                    depth + 1)
        lo = schema.get("minItems", 0)
        hi = schema.get("maxItems")
        sep = _WS + "," + _WS
        if hi is None:
            if lo == 0:
                body = f"({item}({sep}{item}){{0,32}})?"
            else:
                body = f"{item}({sep}{item}){{{lo - 1},32}}"
        else:
            if lo == 0:
                body = f"({item}({sep}{item}){{0,{max(hi - 1, 0)}}})?"
            else:
                body = f"{item}({sep}{item}){{{lo - 1},{hi - 1}}}"
        return r"\[" + _WS + body + _WS + r"\]"
    if t == "object" or "properties" in schema:
        props = schema.get("properties", {})
        if not props:
            # generic JSON object: arbitrary keys, scalar or shallow-array
            # values (json_object response_format)
            scalar = f"({_STRING}|{_NUMBER}|{_BOOL}|{_NULL})"
            arr = r"\[" + _WS + f"({scalar}({_WS},{_WS}{scalar}){{0,16}})?" + _WS + r"\]"
            val = f"({scalar}|{arr})"
            member = _STRING + _WS + ":" + _WS + val
            body = f"({member}({_WS},{_WS}{member}){{0,16}})?"
            return r"\{" + _WS + body + _WS + r"\}"
        parts = []
        for i, (name, sub) in enumerate(props.items()):
            frag = f'"{esc(name)}"{_WS}:{_WS}' + json_schema_to_regex(sub, depth + 1)
            if i > 0:
                frag = _WS + "," + _WS + frag
            parts.append(frag)
        return r"\{" + _WS + "".join(parts) + _WS + r"\}"
    # unconstrained -> any JSON scalar
    return f"({_STRING}|{_NUMBER}|{_BOOL}|{_NULL})"

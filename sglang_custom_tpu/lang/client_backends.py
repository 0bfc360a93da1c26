"""External-API DSL backends: OpenAI-compatible and Anthropic.

Analog of the reference's lang/backend/openai.py (OpenAI :60, chat/
completion split, logprob-scored select) and lang/backend/anthropic.py.
Re-designed around an injectable ``transport`` callable instead of vendor
SDKs: the harness stays dependency-free and tests run with a fake
transport (zero egress). Chat-native APIs implement ``generate_chat``,
which the DSL prefers over string-prompt ``generate`` when running in
chat mode (lang/ir.py ProgramState).
"""

from __future__ import annotations

import json
from typing import Callable, Dict, List, Optional, Tuple

from sglang_custom_tpu.lang.backends import BaseBackend

Transport = Callable[[str, Dict[str, str], Dict], Dict]


def _urllib_transport(url: str, headers: Dict[str, str], body: Dict) -> Dict:
    import urllib.request

    req = urllib.request.Request(
        url, data=json.dumps(body).encode(), method="POST",
        headers={"Content-Type": "application/json", **headers},
    )
    with urllib.request.urlopen(req, timeout=120.0) as r:
        return json.loads(r.read())


class OpenAI(BaseBackend):
    """OpenAI-compatible chat-completions backend (works against any
    /v1/chat/completions server, including our own http_server)."""

    def __init__(self, model: str, base_url: str = "https://api.openai.com",
                 api_key: str = "", transport: Optional[Transport] = None):
        self.model = model
        self.base_url = base_url.rstrip("/")
        self.api_key = api_key
        self.transport = transport or _urllib_transport

    def _headers(self) -> Dict[str, str]:
        return {"Authorization": f"Bearer {self.api_key}"} if self.api_key else {}

    def _chat(self, messages: List[Dict], sampling: Dict) -> Dict:
        body = {
            "model": self.model,
            "messages": messages,
            "max_tokens": sampling.get("max_new_tokens", 128),
        }
        for k in ("temperature", "top_p", "stop"):
            if k in sampling:
                body[k] = sampling[k]
        return self.transport(
            self.base_url + "/v1/chat/completions", self._headers(), body
        )

    def generate(self, prompt: str, sampling: Dict) -> Tuple[str, Dict]:
        # String-prompt path: a single user turn.
        return self.generate_chat(
            [{"role": "user", "content": prompt}], sampling
        )

    def generate_chat(self, messages: List[Dict], sampling: Dict) -> Tuple[str, Dict]:
        out = self._chat(messages, sampling)
        choice = out["choices"][0]
        return choice["message"]["content"], {
            "finish_reason": choice.get("finish_reason"),
            "usage": out.get("usage", {}),
        }

    def select(self, prompt: str, choices: List[str]) -> Tuple[str, List[float]]:
        """Chat APIs expose no echo-logprobs; ask the model to pick
        (the reference's chat-model select fallback)."""
        menu = "\n".join(f"{i}: {c}" for i, c in enumerate(choices))
        text, _ = self.generate(
            f"{prompt}\n\nReply with ONLY the number of the best "
            f"continuation:\n{menu}",
            {"max_new_tokens": 4, "temperature": 0.0},
        )
        idx = 0
        for tokpart in text.split():
            if tokpart.strip().rstrip(".").isdigit():
                idx = min(int(tokpart.strip().rstrip(".")), len(choices) - 1)
                break
        scores = [0.0] * len(choices)
        scores[idx] = 1.0
        return choices[idx], scores


class Anthropic(BaseBackend):
    """Anthropic Messages API backend (reference: lang/backend/anthropic.py)."""

    def __init__(self, model: str, base_url: str = "https://api.anthropic.com",
                 api_key: str = "", transport: Optional[Transport] = None):
        self.model = model
        self.base_url = base_url.rstrip("/")
        self.api_key = api_key
        self.transport = transport or _urllib_transport

    def _headers(self) -> Dict[str, str]:
        h = {"anthropic-version": "2023-06-01"}
        if self.api_key:
            h["x-api-key"] = self.api_key
        return h

    def generate(self, prompt: str, sampling: Dict) -> Tuple[str, Dict]:
        return self.generate_chat(
            [{"role": "user", "content": prompt}], sampling
        )

    def generate_chat(self, messages: List[Dict], sampling: Dict) -> Tuple[str, Dict]:
        system = None
        msgs = []
        for m in messages:
            if m["role"] == "system":
                system = m["content"]
            else:
                msgs.append({"role": m["role"], "content": m["content"]})
        body = {
            "model": self.model,
            "messages": msgs,
            "max_tokens": sampling.get("max_new_tokens", 128),
        }
        if system:
            body["system"] = system
        for k in ("temperature", "top_p"):
            if k in sampling:
                body[k] = sampling[k]
        out = self.transport(
            self.base_url + "/v1/messages", self._headers(), body
        )
        text = "".join(
            blk.get("text", "") for blk in out.get("content", [])
        )
        return text, {
            "finish_reason": out.get("stop_reason"),
            "usage": out.get("usage", {}),
        }

    def select(self, prompt: str, choices: List[str]) -> Tuple[str, List[float]]:
        menu = "\n".join(f"{i}: {c}" for i, c in enumerate(choices))
        text, _ = self.generate(
            f"{prompt}\n\nReply with ONLY the number of the best "
            f"continuation:\n{menu}",
            {"max_new_tokens": 4, "temperature": 0.0},
        )
        idx = 0
        for tokpart in text.split():
            if tokpart.strip().rstrip(".").isdigit():
                idx = min(int(tokpart.strip().rstrip(".")), len(choices) - 1)
                break
        scores = [0.0] * len(choices)
        scores[idx] = 1.0
        return choices[idx], scores

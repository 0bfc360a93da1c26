"""DSL backends.

Analog of the reference's lang/backend/ package
(reference: lang/backend/runtime_endpoint.py RuntimeEndpoint hitting the
SRT HTTP server; base_backend.py). EngineBackend talks to an in-process
Engine directly — the zero-IPC path the single-controller TPU design makes
natural.
"""

from __future__ import annotations

import json
from typing import Dict, List, Tuple

import numpy as np


class BaseBackend:
    tokenizer = None
    # Optional lang.chat_template.ChatTemplate; when set it overrides the
    # tokenizer's built-in chat template for prompt rendering.
    chat_template = None

    def set_chat_template(self, name: str) -> None:
        from sglang_custom_tpu.lang.chat_template import get_chat_template

        self.chat_template = get_chat_template(name)

    def generate(self, prompt: str, sampling: Dict) -> Tuple[str, Dict]:
        raise NotImplementedError

    def select(self, prompt: str, choices: List[str]) -> Tuple[str, List[float]]:
        raise NotImplementedError

    def shutdown(self) -> None:
        pass


class EngineBackend(BaseBackend):
    def __init__(self, engine):
        self.engine = engine
        self.tokenizer = engine.tokenizer

    def generate(self, prompt: str, sampling: Dict) -> Tuple[str, Dict]:
        out = self.engine.generate(prompt=prompt, sampling_params=sampling)
        return out["text"], out["meta_info"]

    def select(self, prompt: str, choices: List[str]) -> Tuple[str, List[float]]:
        res = self.engine.score_choices(prompt=prompt, choices=choices)
        scores = [r["avg_logprob"] for r in res]
        return choices[int(np.argmax(scores))], scores


class RuntimeEndpoint(BaseBackend):
    """HTTP backend against our server (reference:
    lang/backend/runtime_endpoint.py:RuntimeEndpoint)."""

    def __init__(self, base_url: str, timeout: float = 120.0):
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout
        info = self._get("/get_server_info")
        from transformers import AutoTokenizer

        self.tokenizer = AutoTokenizer.from_pretrained(info["model_path"])

    def _post(self, path: str, body: Dict) -> Dict:
        import urllib.request

        req = urllib.request.Request(
            self.base_url + path,
            data=json.dumps(body).encode(),
            method="POST",
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as r:
            return json.loads(r.read())

    def _get(self, path: str) -> Dict:
        import urllib.request

        with urllib.request.urlopen(
            self.base_url + path, timeout=self.timeout
        ) as r:
            return json.loads(r.read())

    def generate(self, prompt: str, sampling: Dict) -> Tuple[str, Dict]:
        out = self._post(
            "/generate", {"text": prompt, "sampling_params": sampling}
        )
        return out["text"], out.get("meta_info", {})

    def select(self, prompt: str, choices: List[str]) -> Tuple[str, List[float]]:
        prompt_ids = self.tokenizer.encode(prompt)
        scores = []
        for c in choices:
            out = self._post(
                "/generate",
                {
                    "input_ids": self.tokenizer.encode(prompt + c),
                    "sampling_params": {
                        "max_new_tokens": 0,
                        "return_input_logprob": True,
                        "logprob_start_len": len(prompt_ids) - 1,
                    },
                },
            )
            lps = out["meta_info"]["input_token_logprobs"]
            scores.append(sum(lps) / max(len(lps), 1))
        return choices[int(np.argmax(scores))], scores

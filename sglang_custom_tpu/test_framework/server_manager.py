"""Spawn N server workers (+ optional router) for routing experiments.

reference: sglang_test_framework/core/server_manager.py:26,182,296
ServerManager/RouterManager — one sglang server per GPU + router. TPU
note: a single host usually has one chip/slice, so multi-worker
experiments run the workers on CPU devices (fine for routing research —
the router sees identical HTTP surfaces) or across hosts.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
import time
import urllib.request
from typing import List, Optional

from sglang_custom_tpu.utils import get_logger

logger = get_logger(__name__)


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


_WORKER_SCRIPT = """
import sys, json
cfg = json.loads(sys.argv[1])
if cfg.get("device") == "cpu":
    # Must be set via jax.config before backend init: some environments
    # register accelerator PJRT plugins through sitecustomize, which
    # overrides the JAX_PLATFORMS env var.
    import jax
    jax.config.update("jax_platforms", "cpu")
from sglang_custom_tpu.config.server_args import ServerArgs
from sglang_custom_tpu.entrypoints.http_server import launch_server
launch_server(ServerArgs(**cfg))
"""


class ServerManager:
    """Launches worker servers as subprocesses and waits for health."""

    def __init__(self):
        self.workers: List[dict] = []

    def launch_worker(
        self,
        model_path: str,
        port: Optional[int] = None,
        device: str = "cpu",
        env_extra: Optional[dict] = None,
        **server_kwargs,
    ) -> str:
        import json

        port = port or free_port()
        cfg = dict(model_path=model_path, port=port, device=device,
                   **server_kwargs)
        env = dict(os.environ)
        if device == "cpu":
            env["JAX_PLATFORMS"] = "cpu"
        env.update(env_extra or {})
        proc = subprocess.Popen(
            [sys.executable, "-c", _WORKER_SCRIPT, json.dumps(cfg)],
            env=env,
        )
        url = f"http://127.0.0.1:{port}"
        self.workers.append({"proc": proc, "url": url, "port": port})
        return url

    def wait_healthy(self, timeout: float = 180.0) -> None:
        deadline = time.monotonic() + timeout
        for w in self.workers:
            while True:
                if time.monotonic() > deadline:
                    raise TimeoutError(f"worker {w['url']} not healthy")
                if w["proc"].poll() is not None:
                    raise RuntimeError(
                        f"worker {w['url']} exited rc={w['proc'].returncode}"
                    )
                try:
                    with urllib.request.urlopen(
                        w["url"] + "/health", timeout=1
                    ) as r:
                        if r.status == 200:
                            break
                except Exception:
                    time.sleep(0.25)
        logger.info("%d workers healthy", len(self.workers))

    @property
    def urls(self) -> List[str]:
        return [w["url"] for w in self.workers]

    def shutdown(self) -> None:
        for w in self.workers:
            if w["proc"].poll() is None:
                w["proc"].terminate()
        for w in self.workers:
            try:
                w["proc"].wait(timeout=10)
            except subprocess.TimeoutExpired:
                w["proc"].kill()
        self.workers.clear()

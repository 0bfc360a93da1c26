"""Build + launch the native router binary.

reference: sgl-router/py_src/sglang_router/launch_router.py (PyO3 launch);
here the router is a standalone C++ binary managed as a subprocess.
"""

from __future__ import annotations

import os
import subprocess
import time
import urllib.request
from typing import List, Optional

from sglang_custom_tpu.utils import get_logger

logger = get_logger(__name__)

_ROUTER_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "router",
)
_BINARY = os.path.join(_ROUTER_DIR, "build", "router")


def build_router(force: bool = False) -> str:
    """Compile the router if needed; returns the binary path."""
    src = os.path.join(_ROUTER_DIR, "src", "router_main.cc")
    if force or not os.path.exists(_BINARY) or (
        os.path.getmtime(_BINARY) < os.path.getmtime(src)
    ):
        logger.info("building router binary...")
        subprocess.run(["make", "-C", _ROUTER_DIR], check=True,
                       capture_output=True)
    return _BINARY


class RouterHandle:
    def __init__(self, proc: subprocess.Popen, port: int):
        self.proc = proc
        self.port = port
        self.base_url = f"http://127.0.0.1:{port}"

    def wait_ready(self, timeout: float = 10.0) -> None:
        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            try:
                with urllib.request.urlopen(
                    self.base_url + "/health", timeout=1
                ) as r:
                    if r.status == 200:
                        return
            except Exception:
                time.sleep(0.05)
        raise TimeoutError("router did not become ready")

    def shutdown(self) -> None:
        if self.proc.poll() is None:
            self.proc.terminate()
            try:
                self.proc.wait(timeout=5)
            except subprocess.TimeoutExpired:
                self.proc.kill()


def launch_router(
    port: int,
    workers: Optional[List[str]] = None,
    policy: str = "cache_aware",
    probs: Optional[List[float]] = None,
    trace_capacity: int = 1000,
    health_interval_ms: int = 5000,
    health_fail_threshold: int = 3,
    prefill_workers: Optional[List[str]] = None,
    decode_workers: Optional[List[str]] = None,
    metrics_csv: Optional[str] = None,
    discovery_file: Optional[str] = None,
    discovery_interval_ms: int = 2000,
) -> RouterHandle:
    """``prefill_workers``/``decode_workers`` switch the binary into PD
    pairing mode (reference: sgl-router pd_router.rs): every inference
    request selects a (prefill, decode) pair, injects a bootstrap room +
    the decode side's KV rendezvous, and returns the decode response."""
    binary = build_router()
    cmd = [binary, "--port", str(port), "--policy", policy,
           "--trace-capacity", str(trace_capacity),
           "--health-interval-ms", str(health_interval_ms),
           "--health-fail-threshold", str(health_fail_threshold)]
    for w in workers or []:
        cmd += ["--worker", w]
    for w in prefill_workers or []:
        cmd += ["--prefill-worker", w]
    for w in decode_workers or []:
        cmd += ["--decode-worker", w]
    if probs:
        cmd += ["--probs", ",".join(str(p) for p in probs)]
    if metrics_csv:
        cmd += ["--metrics-csv", metrics_csv]
    if discovery_file:
        cmd += ["--discovery-file", discovery_file,
                "--discovery-interval-ms", str(discovery_interval_ms)]
    proc = subprocess.Popen(cmd)
    handle = RouterHandle(proc, port)
    handle.wait_ready()
    return handle

"""Trainer-group weight updates (the RLHF hot-path).

Capability analog of the reference's distributed weight-update flow
(reference: srt/managers/scheduler.py:2488 init_weights_update_group,
:2493 update_weights_from_distributed — a trainer rank NCCL-broadcasts
fresh tensors straight into the serving ranks between steps). TPU-first:
there is no NCCL world shared with an external trainer; the transfer is
HOST-STAGED — the trainer pushes named HF tensors over a length-prefixed
TCP stream (the same wire as PD KV transfer, disaggregation/conn.py), the
engine maps them through the model's hf_key_map into the stacked layout
and device_puts each touched leaf with its serving sharding. Weights
never detour through disk, and partial updates (e.g. only the LoRA-merged
projections an RL step touched) ship only those bytes.

Trainer side: ``WeightUpdateClient(host, port).push(named_tensors)`` where
named_tensors is {hf_name: np.ndarray}; call ``finish()`` when done.
"""

from __future__ import annotations

import socket
import struct
import threading
from typing import Dict, Optional

import numpy as np

from sglang_custom_tpu.utils import get_logger

logger = get_logger(__name__)


def _send_msg(sock, obj) -> None:
    import pickle

    blob = pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)
    sock.sendall(struct.pack("!Q", len(blob)) + blob)


def _recv_msg(sock):
    import pickle

    hdr = _recv_exact(sock, 8)
    (n,) = struct.unpack("!Q", hdr)
    return pickle.loads(_recv_exact(sock, n))


def _recv_exact(sock, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(min(n - len(buf), 1 << 20))
        if not chunk:
            raise ConnectionError("weight-update peer closed")
        buf.extend(chunk)
    return bytes(buf)


class WeightUpdateGroup:
    """Engine-side receiver: one listener, tensors accumulate until the
    engine applies them (reference: the inference side of
    init_weights_update_group)."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind((host, port))
        self._sock.listen(8)
        self.host, self.port = self._sock.getsockname()
        self._pending: Dict[str, np.ndarray] = {}
        self._cv = threading.Condition()
        self._done = False
        self._running = True
        threading.Thread(target=self._serve, daemon=True).start()

    def _serve(self) -> None:
        while self._running:
            try:
                conn, _ = self._sock.accept()
            except OSError:
                return
            threading.Thread(
                target=self._handle, args=(conn,), daemon=True
            ).start()

    def _handle(self, conn) -> None:
        try:
            with conn:
                while True:
                    msg = _recv_msg(conn)
                    if msg[0] == "tensors":
                        with self._cv:
                            for name, buf, shape, dt in msg[1]:
                                self._pending[name] = np.frombuffer(
                                    buf, np.dtype(dt)
                                ).reshape(shape)
                            self._cv.notify_all()
                        _send_msg(conn, "ok")
                    elif msg[0] == "finish":
                        with self._cv:
                            self._done = True
                            self._cv.notify_all()
                        _send_msg(conn, "ok")
                        return
        except Exception as e:
            logger.warning("weight-update receive failed: %s", e)

    def wait(self, timeout: float = 300.0) -> Dict[str, np.ndarray]:
        """Block until the trainer calls finish(); returns + clears the
        accumulated tensors."""
        with self._cv:
            if not self._cv.wait_for(lambda: self._done, timeout):
                raise TimeoutError("trainer never finished the update")
            tensors, self._pending = self._pending, {}
            self._done = False
            return tensors

    def close(self) -> None:
        self._running = False
        try:
            self._sock.close()
        except OSError:
            pass


class WeightUpdateClient:
    """Trainer-side pusher."""

    def __init__(self, host: str, port: int):
        self._sock = socket.create_connection((host, port), timeout=30)

    def push(self, named_tensors: Dict[str, np.ndarray]) -> None:
        payload = [
            (name, np.ascontiguousarray(t).tobytes(), t.shape, t.dtype.str)
            for name, t in named_tensors.items()
        ]
        _send_msg(self._sock, ("tensors", payload))
        assert _recv_msg(self._sock) == "ok"

    def finish(self) -> None:
        _send_msg(self._sock, ("finish",))
        assert _recv_msg(self._sock) == "ok"
        self._sock.close()


def apply_named_tensors(
    runner, tensors: Dict[str, np.ndarray], model=None
) -> int:
    """Map HF-named tensors through hf_key_map into runner.params and
    device_put each touched leaf with its existing sharding. Returns the
    number of tensors applied. Quantized leaves are rejected (the trainer
    sends float tensors; re-quantizing online is load_weights' job)."""
    import jax

    cfg = runner.cfg
    if model is None:
        model = runner.model
    key_map = model.hf_key_map(cfg)
    params = runner.params
    # group per destination leaf so each leaf round-trips device<->host once
    touched: Dict[tuple, list] = {}
    applied = 0
    for name, w in tensors.items():
        entries = key_map.get(name)
        if entries is None:
            logger.warning("weight update: unmapped tensor %s", name)
            continue
        if not isinstance(entries, list):
            entries = [entries]
        for entry in entries:
            if len(entry) == 4:
                path, idx, transpose, sl = entry
                ww = w[sl[0] : sl[1]]
            else:
                path, idx, transpose = entry
                ww = w
            if transpose:
                ww = np.ascontiguousarray(ww.T)
            touched.setdefault(tuple(path), []).append((idx, ww))
        applied += 1

    for path, updates in touched.items():
        node = params
        for kpart in path[:-1]:
            node = node[kpart]
        leaf = node[path[-1]]
        if isinstance(leaf, dict):
            raise ValueError(
                f"cannot stream float tensors onto quantized leaf "
                f"{'/'.join(path)}; use update_weights_from_disk"
            )
        sharding = leaf.sharding
        host = np.array(leaf)  # current values (writable)
        np_dtype = host.dtype
        for idx, ww in updates:
            if idx is None:
                host[...] = ww.astype(np_dtype)
            else:
                host[idx] = ww.astype(np_dtype)
        node[path[-1]] = jax.device_put(host, sharding)
    return applied

"""Prefill/decode disaggregation: KV transfer connections.

Analog of the reference's PD transfer stack (reference:
srt/disaggregation/base/conn.py:42-130 BaseKVManager/KVSender/KVReceiver +
KVPoll states :34; fake loopback backend fake/conn.py; RDMA backends
mooncake/nixl). TPU-first: there is no RDMA-verbs path — KV moves
device->host as whole pages (the pool's natural transfer unit), then over
the datacenter network (here: a length-prefixed TCP stream; the DCN analog
of mooncake's transfer engine), then host->device on the decode side. The
fake backend short-circuits the network for tests, exactly like the
reference's fake/conn.py stubs RDMA.

A transfer is keyed by ``bootstrap_room`` (reference: conn.py bootstrap
metadata) — an id the router/LB assigns so the prefill and decode halves of
one request find each other.
"""

from __future__ import annotations

import enum
import pickle
import socket
import struct
import threading
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from sglang_custom_tpu.utils import get_logger

logger = get_logger(__name__)


class KVPoll(enum.IntEnum):
    """Transfer states (reference: disaggregation/base/conn.py:34)."""

    BOOTSTRAPPING = 0
    WAITING_FOR_INPUT = 1
    TRANSFERRING = 2
    SUCCESS = 3
    FAILED = 4


@dataclass
class KVPayload:
    """One request's prefilled KV + continuation metadata."""

    input_ids: List[int]          # the prefilled prompt
    first_token: int              # token sampled from the prefill logits
    kv_pages: np.ndarray          # [n_pages, L, Hkv, ps, 2, D]
    page_size: int
    sampling_params: dict = field(default_factory=dict)
    rid: Optional[str] = None


class FakeKVTransfer:
    """In-process loopback transfer (reference: disaggregation/fake/conn.py
    — stubs the RDMA backend so PD scheduling is testable on one host)."""

    CHUNK_PAGES = 8

    def __init__(self):
        self._store: Dict[str, KVPayload] = {}
        self._status: Dict[str, KVPoll] = {}
        self._cv = threading.Condition()

    # sender side
    def send(self, room: str, payload: KVPayload) -> None:
        with self._cv:
            self._store[room] = payload
            self._status[room] = KVPoll.SUCCESS
            self._cv.notify_all()

    def open_stream(self, room: str, *, input_ids, page_size, kv_shape,
                    kv_dtype) -> "_FakeStream":
        with self._cv:
            self._status[room] = KVPoll.TRANSFERRING
        return _FakeStream(self, room, input_ids, page_size, kv_shape,
                           kv_dtype)

    def poll(self, room: str) -> KVPoll:
        with self._cv:
            return self._status.get(room, KVPoll.WAITING_FOR_INPUT)

    # receiver side
    def recv(self, room: str, timeout: float = 30.0) -> KVPayload:
        with self._cv:
            ok = self._cv.wait_for(lambda: room in self._store, timeout)
            if not ok:
                self._status[room] = KVPoll.FAILED
                raise TimeoutError(f"KV transfer for room {room} timed out")
            return self._store.pop(room)


class _FakeStream:
    """Loopback analog of KVStream: accumulates chunks in memory and
    publishes the payload at end()."""

    def __init__(self, xfer, room, input_ids, page_size, kv_shape,
                 kv_dtype):
        self._xfer = xfer
        self.room = room
        self._input_ids = list(input_ids)
        self._page_size = page_size
        self._kv = np.zeros(kv_shape, np.dtype(kv_dtype))
        cp = xfer.CHUNK_PAGES
        n = int(kv_shape[0]) if len(kv_shape) else 0
        self.n_chunks = -(-n // cp) if n else 0
        self.sent = 0

    def send_chunk(self, idx: int, pages: np.ndarray) -> None:
        assert idx == self.sent, (idx, self.sent)
        lo = idx * self._xfer.CHUNK_PAGES
        self._kv[lo : lo + pages.shape[0]] = pages
        self.sent += 1

    def end(self, *, first_token: int, sampling_params=None,
            rid=None) -> None:
        assert self.sent == self.n_chunks, (self.sent, self.n_chunks)
        self._xfer.send(
            self.room,
            KVPayload(
                input_ids=self._input_ids,
                first_token=int(first_token),
                kv_pages=self._kv,
                page_size=self._page_size,
                sampling_params=dict(sampling_params or {}),
                rid=rid,
            ),
        )

    def abort(self) -> None:
        with self._xfer._cv:
            self._xfer._status[self.room] = KVPoll.FAILED
            self._xfer._cv.notify_all()


def _send_msg(sock: socket.socket, obj) -> None:
    blob = pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)
    sock.sendall(struct.pack("!Q", len(blob)) + blob)


def _recv_msg(sock: socket.socket):
    hdr = _recv_exact(sock, 8)
    (n,) = struct.unpack("!Q", hdr)
    return pickle.loads(_recv_exact(sock, n))


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(min(n - len(buf), 1 << 20))
        if not chunk:
            raise ConnectionError("KV transfer peer closed")
        buf.extend(chunk)
    return bytes(buf)


class TCPKVReceiver:
    """Decode-side KV server: accepts CHUNKED payload streams keyed by room
    (the bootstrap-server + receiver roles of conn.py:96,128 folded into
    one listener — the decode side is the natural rendezvous point).

    Protocol per connection (round-3 hardening — reference:
    disaggregation/base/conn.py KVPoll lifecycle + mooncake's chunked
    transfer engine): ``("hello", room, header)`` -> ack -> N x
    ``("chunk", idx, bytes)`` -> ``("end",)`` -> ack. Chunks land while
    the decode scheduler keeps serving; ``poll(room)`` exposes
    BOOTSTRAPPING/TRANSFERRING/SUCCESS/FAILED."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind((host, port))
        self._sock.listen(64)
        self.host, self.port = self._sock.getsockname()
        self._store: Dict[str, KVPayload] = {}
        self._status: Dict[str, KVPoll] = {}
        self._progress: Dict[str, tuple] = {}  # room -> (got, total)
        self._cv = threading.Condition()
        self._running = True
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def _serve(self) -> None:
        while self._running:
            try:
                conn, _ = self._sock.accept()
            except OSError:
                return
            threading.Thread(
                target=self._handle, args=(conn,), daemon=True
            ).start()

    def _handle(self, conn: socket.socket) -> None:
        room = None
        try:
            with conn:
                msg = _recv_msg(conn)
                kind = msg[0]
                if kind == "legacy":  # single-shot (fake/testing path)
                    _, room, payload = msg
                    with self._cv:
                        self._store[room] = payload
                        self._status[room] = KVPoll.SUCCESS
                        self._cv.notify_all()
                    _send_msg(conn, "ok")
                    return
                assert kind == "hello", kind
                _, room, header = msg
                with self._cv:
                    self._status[room] = KVPoll.TRANSFERRING
                    self._progress[room] = (0, header["n_chunks"])
                _send_msg(conn, "ok")  # bootstrap ack
                shape, dtype = header["kv_shape"], header["kv_dtype"]
                kv = np.zeros(shape, dtype)
                chunk_pages = header["chunk_pages"]
                for i in range(header["n_chunks"]):
                    m = _recv_msg(conn)
                    assert m[0] == "chunk" and m[1] == i, m[:2]
                    lo = i * chunk_pages
                    arr = np.frombuffer(m[2], dtype).reshape(
                        (-1,) + tuple(shape[1:])
                    )
                    kv[lo : lo + arr.shape[0]] = arr
                    with self._cv:
                        self._progress[room] = (i + 1, header["n_chunks"])
                end = _recv_msg(conn)
                assert end[0] == "end"
                # Streaming prefill-overlap senders don't know the first
                # sampled token at connection time — it rides the "end"
                # message (reference analog: per-layer transfer finishing
                # before the prefill's logits, disaggregation/prefill.py).
                tail = end[1] if len(end) > 1 else {}
                payload = KVPayload(
                    input_ids=header["input_ids"],
                    first_token=tail.get(
                        "first_token", header.get("first_token")
                    ),
                    kv_pages=kv,
                    page_size=header["page_size"],
                    sampling_params=tail.get(
                        "sampling_params", header.get("sampling_params", {})
                    ),
                    rid=tail.get("rid", header.get("rid")),
                )
                with self._cv:
                    self._store[room] = payload
                    self._status[room] = KVPoll.SUCCESS
                    self._cv.notify_all()
                _send_msg(conn, "ok")
        except Exception as e:  # a dropped sender must not kill the server
            logger.warning("KV receive failed: %s", e)
            if room is not None:
                with self._cv:
                    self._status[room] = KVPoll.FAILED
                    self._cv.notify_all()

    def recv(self, room: str, timeout: float = 30.0) -> KVPayload:
        with self._cv:
            ok = self._cv.wait_for(
                lambda: room in self._store
                or self._status.get(room) == KVPoll.FAILED,
                timeout,
            )
            if not ok:
                raise TimeoutError(f"KV transfer for room {room} timed out")
            if room not in self._store:
                raise ConnectionError(f"KV transfer for room {room} failed")
            self._status.pop(room, None)
            self._progress.pop(room, None)
            return self._store.pop(room)

    def poll(self, room: str) -> KVPoll:
        with self._cv:
            return self._status.get(room, KVPoll.BOOTSTRAPPING)

    def progress(self, room: str) -> tuple:
        with self._cv:
            return self._progress.get(room, (0, 0))

    def close(self) -> None:
        self._running = False
        try:
            self._sock.close()
        except OSError:
            pass


class TCPKVSender:
    """Prefill-side chunked pusher (reference: KVSender conn.py:55 +
    KVPoll states). ``send`` streams CHUNK_PAGES-page chunks so the
    receive side observes progress and neither side ever materializes the
    transfer twice; ``poll`` exposes the sender-side lifecycle."""

    CHUNK_PAGES = 8

    def __init__(self, host: str, port: int):
        self.host, self.port = host, port
        self._status: Dict[str, KVPoll] = {}
        self._lock = threading.Lock()

    def poll(self, room: str) -> KVPoll:
        with self._lock:
            return self._status.get(room, KVPoll.WAITING_FOR_INPUT)

    def _set(self, room: str, st: KVPoll) -> None:
        with self._lock:
            self._status[room] = st

    def send(self, room: str, payload: KVPayload) -> None:
        kv = np.ascontiguousarray(payload.kv_pages)
        n = kv.shape[0]
        cp = self.CHUNK_PAGES
        stream = self.open_stream(
            room,
            input_ids=payload.input_ids,
            page_size=payload.page_size,
            kv_shape=kv.shape,
            kv_dtype=kv.dtype.str,
        )
        try:
            for i in range(stream.n_chunks):
                stream.send_chunk(i, kv[i * cp : (i + 1) * cp])
            stream.end(
                first_token=payload.first_token,
                sampling_params=payload.sampling_params,
                rid=payload.rid,
            )
        except Exception:
            stream.abort()
            raise

    def open_stream(self, room: str, *, input_ids, page_size, kv_shape,
                    kv_dtype) -> "KVStream":
        """Open a chunked stream whose tail metadata (first token) arrives
        with end() — lets the prefill side start shipping whole pages
        while the rest of the prompt is still computing (prefill-overlap
        transfer; reference: per-layer kv transfer launched during prefill
        compute, csrc/kvcacheio/transfer.cu + disaggregation/prefill.py:260
        — here the overlap unit is the chunked-prefill token chunk, the
        natural granularity when the whole layer stack runs in one fused
        XLA program)."""
        cp = self.CHUNK_PAGES
        n = int(kv_shape[0]) if len(kv_shape) else 0
        header = {
            "input_ids": list(input_ids),
            "page_size": page_size,
            "kv_shape": tuple(kv_shape),
            "kv_dtype": kv_dtype,
            "n_chunks": -(-n // cp) if n else 0,
            "chunk_pages": cp,
        }
        self._set(room, KVPoll.BOOTSTRAPPING)
        try:
            s = socket.create_connection((self.host, self.port), timeout=30)
            _send_msg(s, ("hello", room, header))
            assert _recv_msg(s) == "ok"
        except Exception:
            self._set(room, KVPoll.FAILED)
            raise
        self._set(room, KVPoll.TRANSFERRING)
        return KVStream(self, room, s, header["n_chunks"])


class KVStream:
    """One in-flight chunked PD transfer (sender side)."""

    def __init__(self, sender: TCPKVSender, room: str, sock, n_chunks: int):
        self._sender = sender
        self.room = room
        self._sock = sock
        self.n_chunks = n_chunks
        self.sent = 0

    def send_chunk(self, idx: int, pages: np.ndarray) -> None:
        assert idx == self.sent, (idx, self.sent)
        try:
            _send_msg(
                self._sock,
                ("chunk", idx, np.ascontiguousarray(pages).tobytes()),
            )
        except Exception:
            self.abort()
            raise
        self.sent += 1

    def end(self, *, first_token: int, sampling_params=None,
            rid=None) -> None:
        assert self.sent == self.n_chunks, (self.sent, self.n_chunks)
        try:
            _send_msg(
                self._sock,
                ("end", {
                    "first_token": int(first_token),
                    "sampling_params": dict(sampling_params or {}),
                    "rid": rid,
                }),
            )
            assert _recv_msg(self._sock) == "ok"
            self._sender._set(self.room, KVPoll.SUCCESS)
        except Exception:
            self.abort()
            raise
        finally:
            try:
                self._sock.close()
            except OSError:
                pass

    def abort(self) -> None:
        self._sender._set(self.room, KVPoll.FAILED)
        try:
            self._sock.close()
        except OSError:
            pass

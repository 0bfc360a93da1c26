"""Minimal prefill/decode load balancer with worker-pair selection.

Analog of the reference's mini LB + the PD router's pairing policy
(reference: srt/disaggregation/mini_lb.py + launch_lb.py;
sgl-router/src/routers/pd_router.rs select_worker_pair). The C++ router
(router/) is the production front; this is the Python pairing logic:

  client -> /generate -> select (prefill, decode) pair
      -> prefill server /pd_prefill (streams KV to decode's TCP receiver)
      -> decode  server /pd_generate (grafts KV, decodes)
      -> merged response

Pairing: least-outstanding requests on each side independently (the
power-of-pairing shape of pd_router.rs), round-robin tie-break.
"""

from __future__ import annotations

import itertools
import uuid
from typing import Dict, List

from aiohttp import ClientSession, web

from sglang_custom_tpu.utils import get_logger

logger = get_logger(__name__)


class MiniLB:
    def __init__(self, prefill_urls, decode_urls):
        if isinstance(prefill_urls, str):
            prefill_urls = [prefill_urls]
        if isinstance(decode_urls, str):
            decode_urls = [decode_urls]
        self.prefill_urls = [u.rstrip("/") for u in prefill_urls]
        self.decode_urls = [u.rstrip("/") for u in decode_urls]
        self.kv_addr: Dict[str, tuple] = {}   # decode url -> (host, port)
        self.outstanding: Dict[str, int] = {
            u: 0 for u in self.prefill_urls + self.decode_urls
        }
        self._rr = itertools.count()
        self.app = web.Application()
        self.app.router.add_post("/generate", self.generate)
        self.app.router.add_get("/health", self.health)

    async def _discover(self, decode_url: str) -> tuple:
        async with ClientSession() as s:
            async with s.get(decode_url + "/get_server_info") as r:
                info = await r.json()
        addr = (info["kv_host"], info["kv_port"])
        self.kv_addr[decode_url] = addr
        return addr

    def select_worker_pair(self) -> tuple:
        """Least-outstanding on each side, round-robin tie-break
        (reference: pd_router.rs select_worker_pair)."""
        r = next(self._rr)

        def pick(urls: List[str]) -> str:
            lo = min(self.outstanding[u] for u in urls)
            cands = [u for u in urls if self.outstanding[u] == lo]
            return cands[r % len(cands)]

        return pick(self.prefill_urls), pick(self.decode_urls)

    async def health(self, request: web.Request) -> web.Response:
        return web.Response(text="OK")

    async def generate(self, request: web.Request) -> web.Response:
        body = await request.json()
        room = uuid.uuid4().hex
        prefill, decode = self.select_worker_pair()
        kv = self.kv_addr.get(decode) or await self._discover(decode)
        self.outstanding[prefill] += 1
        self.outstanding[decode] += 1
        prefill_done = False
        try:
            async with ClientSession() as s:
                async with s.post(
                    prefill + "/pd_prefill",
                    json={
                        "input_ids": body["input_ids"],
                        "sampling_params": body.get("sampling_params") or {},
                        "room": room,
                        "kv_host": kv[0],
                        "kv_port": kv[1],
                    },
                ) as r:
                    if r.status != 200:
                        return web.json_response(
                            await r.json(), status=r.status
                        )
                self.outstanding[prefill] -= 1
                prefill_done = True
                async with s.post(
                    decode + "/pd_generate", json={"room": room}
                ) as r:
                    return web.json_response(await r.json(), status=r.status)
        finally:
            self.outstanding[decode] -= 1
            if not prefill_done:
                self.outstanding[prefill] -= 1


def launch_lb(prefill_urls, decode_urls, host: str, port: int) -> None:
    lb = MiniLB(prefill_urls, decode_urls)
    web.run_app(lb.app, host=host, port=port, print=None)

"""Minimal prefill/decode load balancer.

Analog of the reference's mini LB (reference: srt/disaggregation/mini_lb.py
+ launch_lb.py — a thin HTTP front that pairs one prefill worker with one
decode worker per request). The C++ router (router/) is the production
front; this is the test/reference pairing logic:

  client -> /generate -> [assign room]
      -> prefill server /pd_prefill (pushes KV to decode's TCP receiver)
      -> decode  server /pd_generate (grafts KV, decodes)
      -> merged response
"""

from __future__ import annotations

import uuid

from aiohttp import ClientSession, web

from sglang_custom_tpu.utils import get_logger

logger = get_logger(__name__)


class MiniLB:
    def __init__(self, prefill_url: str, decode_url: str):
        self.prefill_url = prefill_url.rstrip("/")
        self.decode_url = decode_url.rstrip("/")
        self.kv_host = None
        self.kv_port = None
        self.app = web.Application()
        self.app.router.add_post("/generate", self.generate)
        self.app.router.add_get("/health", self.health)

    async def _discover(self) -> None:
        async with ClientSession() as s:
            async with s.get(self.decode_url + "/get_server_info") as r:
                info = await r.json()
        self.kv_host = info["kv_host"]
        self.kv_port = info["kv_port"]

    async def health(self, request: web.Request) -> web.Response:
        return web.Response(text="OK")

    async def generate(self, request: web.Request) -> web.Response:
        if self.kv_port is None:
            await self._discover()
        body = await request.json()
        room = uuid.uuid4().hex
        async with ClientSession() as s:
            async with s.post(
                self.prefill_url + "/pd_prefill",
                json={
                    "input_ids": body["input_ids"],
                    "sampling_params": body.get("sampling_params") or {},
                    "room": room,
                    "kv_host": self.kv_host,
                    "kv_port": self.kv_port,
                },
            ) as r:
                if r.status != 200:
                    return web.json_response(await r.json(), status=r.status)
            async with s.post(
                self.decode_url + "/pd_generate", json={"room": room}
            ) as r:
                return web.json_response(await r.json(), status=r.status)


def launch_lb(prefill_url: str, decode_url: str, host: str, port: int) -> None:
    lb = MiniLB(prefill_url, decode_url)
    web.run_app(lb.app, host=host, port=port, print=None)

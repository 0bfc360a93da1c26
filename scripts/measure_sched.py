"""Scheduler-level decode throughput on the real chip, overlap on/off."""
import sys, time
import numpy as np
import jax
from sglang_custom_tpu.config.model_config import ModelConfig
from sglang_custom_tpu.config.server_args import ServerArgs
from sglang_custom_tpu.managers.schedule_batch import Req
from sglang_custom_tpu.managers.scheduler import Scheduler
from sglang_custom_tpu.model_executor.model_runner import ModelRunner
from sglang_custom_tpu.model_loader.loader import load_dummy_weights
from sglang_custom_tpu.parallel.mesh import create_mesh
from sglang_custom_tpu.sampling.sampling_params import SamplingParams

cfg = ModelConfig(
    architecture="LlamaForCausalLM",
    vocab_size=128256, hidden_size=2048, num_layers=16,
    num_q_heads=32, num_kv_heads=8, head_dim=64,
    intermediate_size=8192, rms_norm_eps=1e-5, rope_theta=500000.0,
    max_position_embeddings=4096,
)

BATCH, PROMPT, DECODE = 64, 128, 256
rng = np.random.RandomState(0)
PROMPTS = [list(rng.randint(1, 100000, size=PROMPT)) for _ in range(BATCH)]


def run(overlap: bool, burst: int, runner_cache={}):
    args = ServerArgs(
        model_path="", skip_tokenizer_init=True, context_length=2048,
        page_size=32, max_prefill_tokens=16384, chunked_prefill_size=16384,
        schedule_policy="fcfs", disable_overlap_schedule=not overlap,
        decode_burst_size=burst,
    )
    if "r" not in runner_cache:
        mesh_ctx = create_mesh(tp_size=1, dp_size=1)
        params = load_dummy_weights(cfg, mesh_ctx)
        runner_cache["r"] = ModelRunner(args, cfg, params, mesh_ctx, num_pages=2048)
    runner = runner_cache["r"]
    runner.server_args = args

    def make_reqs(max_new):
        return [
            Req(rid=f"r{i}", input_ids=p,
                sampling_params=SamplingParams(
                    max_new_tokens=max_new, temperature=0.0, ignore_eos=True))
            for i, p in enumerate(PROMPTS)
        ]

    # Warmup compiles: run the FULL decode length once so every
    # (batch, page-bucket, use_slots) executable the timed run touches is
    # already compiled.
    sched = Scheduler(args, runner)
    for r in make_reqs(DECODE):
        sched.add_request(r)
    while sched.has_work:
        sched.step()
    sched.tree_cache.reset()

    sched = Scheduler(args, runner)
    for r in make_reqs(DECODE):
        sched.add_request(r)
    while sched.has_work and not sched.running_batch:
        sched.step()
    t0 = time.perf_counter()
    decode_tokens = 0
    while sched.has_work:
        before = sched.num_generated_tokens
        sched.step()
        decode_tokens += sched.num_generated_tokens - before
    dt = time.perf_counter() - t0
    print(f"overlap={overlap} burst={burst}: {decode_tokens} tok in {dt:.2f}s "
          f"-> {decode_tokens/dt:.0f} tok/s", flush=True)
    sched.tree_cache.reset()


for overlap, burst in [(False, 1), (True, 1), (False, 8), (True, 8)]:
    run(overlap, burst)

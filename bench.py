"""Decode-throughput benchmark (driver-run on real TPU).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures continuous-batching decode tokens/sec on a Llama-3.2-1B-geometry
model (BASELINE.json config 2) with dummy weights. vs_baseline is against
the reference's in-repo anchor: 158.34 tok/s Llama-3.1-8B decode on 1×H100
(BASELINE.md; docs/backend/speculative_decoding.ipynb:19).
"""

import json
import os
import time

os.environ.setdefault("XLA_FLAGS", "")

import numpy as np

BASELINE_TOKS = 158.34


def main():
    import jax

    from sglang_custom_tpu.config.model_config import ModelConfig
    from sglang_custom_tpu.config.server_args import ServerArgs
    from sglang_custom_tpu.managers.schedule_batch import Req
    from sglang_custom_tpu.managers.scheduler import Scheduler
    from sglang_custom_tpu.model_executor.model_runner import ModelRunner
    from sglang_custom_tpu.model_loader.loader import load_dummy_weights
    from sglang_custom_tpu.parallel.mesh import create_mesh
    from sglang_custom_tpu.sampling.sampling_params import SamplingParams

    # Llama-3.2-1B geometry.
    cfg = ModelConfig(
        architecture="LlamaForCausalLM",
        vocab_size=128256,
        hidden_size=2048,
        num_layers=16,
        num_q_heads=32,
        num_kv_heads=8,
        head_dim=64,
        intermediate_size=8192,
        rms_norm_eps=1e-5,
        rope_theta=500000.0,
        max_position_embeddings=4096,
    )
    args = ServerArgs(
        model_path="",
        skip_tokenizer_init=True,
        context_length=2048,
        page_size=32,
        max_prefill_tokens=16384,
        chunked_prefill_size=16384,
        schedule_policy="fcfs",
    )

    mesh_ctx = create_mesh(tp_size=1, dp_size=1)
    params = load_dummy_weights(cfg, mesh_ctx)
    # 2048 pages x 32 tok = 64K KV tokens (enough for 64 x 256-token reqs).
    # Kept small because XLA's conservative aliasing through the nested
    # decode-burst scan can hold >1 pool copy at compile time.
    runner = ModelRunner(args, cfg, params, mesh_ctx, num_pages=2048)

    BATCH = 64
    PROMPT = 128
    DECODE = 128
    rng = np.random.RandomState(0)

    def make_reqs(max_new):
        return [
            Req(
                rid=f"r{i}",
                input_ids=list(rng.randint(1, 100000, size=PROMPT)),
                sampling_params=SamplingParams(
                    max_new_tokens=max_new, temperature=0.0, ignore_eos=True
                ),
            )
            for i in range(BATCH)
        ]

    # Warmup: compiles prefill + single-decode + decode-burst executables
    # (max_new > burst so the burst program compiles here, not in the
    # timed loop) and both page-table buckets the timed run will touch.
    sched = Scheduler(args, runner)
    for r in make_reqs(2 * args.decode_burst_size + 4):
        sched.add_request(r)
    while sched.has_work:
        sched.step()
    sched.tree_cache.reset()

    # Timed run.
    sched = Scheduler(args, runner)
    for r in make_reqs(DECODE):
        sched.add_request(r)
    # Run prefill steps (not timed as decode).
    while sched.has_work and not sched.running_batch:
        sched.step()
    t0 = time.perf_counter()
    decode_tokens = 0
    while sched.has_work:
        before = sched.num_generated_tokens
        sched.step()
        decode_tokens += sched.num_generated_tokens - before
    jax.effects_barrier()
    dt = time.perf_counter() - t0

    toks_per_s = decode_tokens / dt
    print(
        json.dumps(
            {
                "metric": "decode_tokens_per_sec_per_chip_llama3.2-1b_bf16_bs64",
                "value": round(toks_per_s, 2),
                "unit": "tokens/s",
                "vs_baseline": round(toks_per_s / BASELINE_TOKS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

"""Stage-by-stage memory/time diagnostic for the Llama-3-8B W4A16 bench.

Round-4 gate #1 (VERDICT): the bench dies RESOURCE_EXHAUSTED and nothing
says which allocation dies. This logs live HBM + wall time at every stage.
Run on the real chip:  python scripts/diag_w4a16.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

t_start = time.perf_counter()


def stamp(label):
    import jax

    try:
        s = jax.local_devices()[0].memory_stats()
        used = s.get("bytes_in_use", 0) / 2**30
        lim = s.get("bytes_limit", 0) / 2**30
        peak = s.get("peak_bytes_in_use", 0) / 2**30
    except Exception:
        used = lim = peak = -1
    print(
        f"[{time.perf_counter() - t_start:7.1f}s] {label:40s} "
        f"used={used:6.2f} GiB peak={peak:6.2f} limit={lim:5.1f}",
        flush=True,
    )


def main():
    import jax

    stamp("jax init")

    import bench as B

    cfg = B.llama_8b_cfg()

    from sglang_custom_tpu.config.server_args import ServerArgs
    from sglang_custom_tpu.managers.schedule_batch import Req
    from sglang_custom_tpu.managers.scheduler import Scheduler
    from sglang_custom_tpu.model_executor.model_runner import ModelRunner
    from sglang_custom_tpu.model_loader.loader import load_dummy_weights
    from sglang_custom_tpu.parallel.mesh import create_mesh
    from sglang_custom_tpu.sampling.sampling_params import SamplingParams

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
    stamp("mesh created")

    params = load_dummy_weights(cfg, mesh_ctx, quantization="w4a16")
    w_bytes = sum(
        v.size * v.dtype.itemsize for v in jax.tree.leaves(params)
    )
    stamp(f"dummy w4a16 load done ({w_bytes/2**30:.2f} GiB params)")

    runner = ModelRunner(args, cfg, params, mesh_ctx, num_pages=1024)
    stamp("runner + KV pool created")

    batch, prompt, decode = 32, 128, 8
    rng = np.random.RandomState(0)
    prompts = [list(rng.randint(1, 100000, size=prompt)) for _ in range(batch)]
    sched = Scheduler(args, runner)
    for i, p in enumerate(prompts):
        sched.add_request(
            Req(
                rid=f"r{i}",
                input_ids=p,
                sampling_params=SamplingParams(
                    max_new_tokens=decode, temperature=0.0, ignore_eos=True
                ),
            )
        )
    stamp("requests queued")

    step = 0
    while sched.has_work and not sched.running_batch:
        sched.step()
        step += 1
        stamp(f"prefill step {step}")

    while sched.has_work:
        sched.step()
        step += 1
        if step % 4 == 0:
            stamp(f"decode step {step}")
    jax.effects_barrier()
    stamp("DONE (decode complete)")


if __name__ == "__main__":
    main()

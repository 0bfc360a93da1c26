"""Worker process for tests/test_multihost.py (run via subprocess).

Usage: python multihost_worker.py <rank> <nprocs> <ckpt> <coord_addr> <out>
Rank 0 drives an Engine.generate and writes output ids to <out>; other
ranks run the follower loop until shutdown.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    rank, nprocs = int(sys.argv[1]), int(sys.argv[2])
    ckpt, coord, out_path = sys.argv[3], sys.argv[4], sys.argv[5]

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    jax.config.update("jax_platforms", "cpu")

    from sglang_custom_tpu.config.server_args import ServerArgs
    from sglang_custom_tpu.entrypoints.engine import Engine

    args = ServerArgs(
        model_path=ckpt, dtype="float32", device="cpu", page_size=16,
        skip_tokenizer_init=True, context_length=256,
        tp_size=2 * nprocs,  # tensor axis spans both hosts' devices
        num_hosts=nprocs, host_rank=rank, dist_init_addr=coord,
    )
    eng = Engine(server_args=args, num_pages=128)
    if getattr(eng, "_is_follower_done", False):
        return  # follower finished its mirror loop

    outs = eng.generate(
        input_ids=[[1, 44, 7, 99, 3, 250], [9, 8, 7]],
        sampling_params={
            "max_new_tokens": 8, "temperature": 0.0, "ignore_eos": True,
        },
    )
    with open(out_path, "w") as f:
        json.dump([o["output_ids"] for o in outs], f)
    eng.check_memory()
    eng.shutdown()


if __name__ == "__main__":
    main()

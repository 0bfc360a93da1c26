"""Serving benchmark: poisson load against a running server (or router).

Analog of the reference's bench_serving.py (TTFT/ITL/throughput,
python/sglang/bench_serving.py:83) + the fork's bench_serving_new per-request
CSV used by the router experiments (reference: repo-root
router_test_*.csv pipelines).

Usage:
  python bench_serving.py --base-url http://127.0.0.1:30000 \
      --num-prompts 64 --request-rate 8 --input-len 128 --output-len 64 \
      [--csv out.csv] [--json out.json]
"""

from __future__ import annotations

import argparse
import asyncio
import json

import aiohttp

from sglang_custom_tpu.test_framework import (
    MetricsCollector,
    RequestGenerator,
)


async def _one_request(session, base_url, req, collector: MetricsCollector):
    body = {
        "input_ids": req.input_ids,
        "sampling_params": {
            "max_new_tokens": req.max_new_tokens,
            "ignore_eos": True,
        },
        "stream": True,
        "rid": req.rid,
    }
    collector.on_send(req.rid, len(req.input_ids))
    n_tokens = 0
    cached = 0
    try:
        async with session.post(
            base_url + "/generate", json=body,
            timeout=aiohttp.ClientTimeout(total=600),
        ) as resp:
            async for raw in resp.content:
                line = raw.decode().strip()
                if not line.startswith("data: ") or line == "data: [DONE]":
                    continue
                collector.on_first_token(req.rid)
                chunk = json.loads(line[6:])
                n_tokens += len(chunk.get("output_ids", []))
                meta = chunk.get("meta_info") or {}
                cached = meta.get("cached_tokens", cached)
        collector.on_finish(req.rid, n_tokens, cached, ok=True)
    except Exception as e:
        collector.on_finish(req.rid, n_tokens, cached, ok=False, error=str(e))


async def run_benchmark(args) -> MetricsCollector:
    gen = RequestGenerator(
        request_rate=args.request_rate,
        num_requests=args.num_prompts,
        input_len=args.input_len,
        output_len=args.output_len,
        vocab_size=args.vocab_size,
        seed=args.seed,
        workload=getattr(args, "workload", "uniform"),
        max_input_len=getattr(args, "max_input_len", 0),
        prefix_groups=getattr(args, "prefix_groups", 0),
        prefix_frac=getattr(args, "prefix_frac", 0.5),
    )
    collector = MetricsCollector()
    reqs = list(gen.generate())
    async with aiohttp.ClientSession() as session:
        tasks = []
        t0 = asyncio.get_event_loop().time()
        for r in reqs:
            delay = r.arrival_offset - (asyncio.get_event_loop().time() - t0)
            if delay > 0:
                await asyncio.sleep(delay)
            tasks.append(
                asyncio.create_task(
                    _one_request(session, args.base_url, r, collector)
                )
            )
        await asyncio.gather(*tasks)
    return collector


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--base-url", default="http://127.0.0.1:30000")
    p.add_argument("--num-prompts", type=int, default=64)
    p.add_argument("--request-rate", type=float, default=float("inf"))
    p.add_argument("--input-len", type=int, default=128)
    p.add_argument("--output-len", type=int, default=64)
    p.add_argument("--vocab-size", type=int, default=32000)
    p.add_argument("--seed", type=int, default=0)
    # ShareGPT-style replay (bundled length histogram, zero egress;
    # reference: bench_serving_new.py dataset mode) + shared prefixes to
    # exercise cache-aware routing
    p.add_argument("--workload", default="uniform",
                   choices=["uniform", "sharegpt"])
    p.add_argument("--max-input-len", type=int, default=0)
    p.add_argument("--prefix-groups", type=int, default=0)
    p.add_argument("--prefix-frac", type=float, default=0.5)
    p.add_argument("--csv", default=None)
    p.add_argument("--fork-csv", default=None,
                   help="per-request CSV in the fork's router_test_*.csv "
                        "schema")
    p.add_argument("--json", dest="json_out", default=None)
    args = p.parse_args()

    collector = asyncio.run(run_benchmark(args))
    summary = collector.summary()
    print(json.dumps(summary, indent=2))
    if args.csv:
        collector.to_csv(args.csv)
    if args.fork_csv:
        collector.to_fork_csv(args.fork_csv)
    if args.json_out:
        collector.to_json(args.json_out)


if __name__ == "__main__":
    main()

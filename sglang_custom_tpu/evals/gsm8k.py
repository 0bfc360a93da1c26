"""Few-shot GSM8K accuracy harness driving Engine.generate.

Analog of the reference's few-shot GSM8K eval
(reference: python/sglang/test/few_shot_gsm8k.py — prompt construction
:24-32, numeric answer extraction :36-43, accuracy + throughput report;
used by test/srt/test_eval_accuracy_large.py as a CI accuracy gate).
TPU-first differences: drives the in-process Engine directly (one batched
``generate`` call — the continuous-batching scheduler parallelizes it)
instead of spraying HTTP requests at a server, and takes a local jsonl
path (zero-egress environments can't download the dataset).

The BASELINE.json accuracy gate is "quantized GSM8K accuracy within 1% of
bf16": run twice and compare with ``accuracy_drop``.

Usage:
    python -m sglang_custom_tpu.evals.gsm8k --model <path> \
        --data-path test.jsonl --num-questions 200 --num-shots 5
"""

from __future__ import annotations

import argparse
import json
import re
import time
from typing import List, Optional

INVALID = -9999999


def read_jsonl(path: str) -> List[dict]:
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def build_prompt(lines: List[dict], i: int, include_answer: bool) -> str:
    ret = "Question: " + lines[i]["question"] + "\nAnswer:"
    if include_answer:
        ret += " " + lines[i]["answer"]
    return ret


def few_shot_prefix(lines: List[dict], k: int) -> str:
    return "".join(build_prompt(lines, i, True) + "\n\n" for i in range(k))


def extract_answer(answer_str: str) -> int:
    """Last integer in the string (the '#### N' convention collapses to
    this; reference get_answer_value few_shot_gsm8k.py:36)."""
    answer_str = answer_str.replace(",", "")
    numbers = re.findall(r"-?\d+", answer_str)
    if not numbers:
        return INVALID
    try:
        return int(numbers[-1])
    except ValueError:
        return INVALID


def run_gsm8k(
    engine,
    data_path: str,
    num_questions: int = 200,
    num_shots: int = 5,
    max_new_tokens: int = 512,
    generate_fn=None,
) -> dict:
    """Returns {"accuracy", "invalid", "latency_s", "output_tok_per_s",
    "num_questions"}. ``generate_fn`` overrides engine.generate (tests)."""
    lines = read_jsonl(data_path)
    assert len(lines) >= num_shots + num_questions, (
        f"dataset has {len(lines)} rows; need {num_shots + num_questions}"
    )
    prefix = few_shot_prefix(lines, num_shots)
    qs = lines[num_shots : num_shots + num_questions]
    prompts = [prefix + build_prompt(qs_l, 0, False)
               for qs_l in ([q] for q in qs)]
    labels = [extract_answer(q["answer"]) for q in qs]
    assert all(l != INVALID for l in labels), "unparsable gold answers"

    sp = {
        "max_new_tokens": max_new_tokens,
        "temperature": 0.0,
        "stop": ["Question:", "Question", "\n\n"],
    }
    gen = generate_fn or (
        lambda ps: engine.generate(prompt=ps, sampling_params=sp)
    )
    t0 = time.perf_counter()
    outs = gen(prompts)
    dt = time.perf_counter() - t0

    preds = [extract_answer(o["text"]) for o in outs]
    correct = sum(p == l for p, l in zip(preds, labels))
    invalid = sum(p == INVALID for p in preds)
    out_tokens = sum(
        o.get("meta_info", {}).get("completion_tokens", 0) for o in outs
    )
    return {
        "accuracy": correct / num_questions,
        "invalid": invalid / num_questions,
        "latency_s": round(dt, 2),
        "output_tok_per_s": round(out_tokens / dt, 1) if dt else 0.0,
        "num_questions": num_questions,
    }


def accuracy_drop(baseline: dict, candidate: dict) -> float:
    """BASELINE gate helper: positive = candidate is worse."""
    return baseline["accuracy"] - candidate["accuracy"]


def main(argv: Optional[List[str]] = None):
    from sglang_custom_tpu.config.server_args import ServerArgs
    from sglang_custom_tpu.entrypoints.engine import Engine

    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)
    p.add_argument("--data-path", required=True,
                   help="GSM8K test.jsonl (question/answer rows)")
    p.add_argument("--num-questions", type=int, default=200)
    p.add_argument("--num-shots", type=int, default=5)
    p.add_argument("--max-new-tokens", type=int, default=512)
    p.add_argument("--quantization", default=None)
    args = p.parse_args(argv)

    eng = Engine(server_args=ServerArgs(
        model_path=args.model, quantization=args.quantization,
    ))
    result = run_gsm8k(
        eng, args.data_path, args.num_questions, args.num_shots,
        args.max_new_tokens,
    )
    print(json.dumps(result))
    eng.shutdown()


if __name__ == "__main__":
    main()

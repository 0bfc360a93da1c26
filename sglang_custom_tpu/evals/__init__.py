from sglang_custom_tpu.evals.gsm8k import run_gsm8k
from sglang_custom_tpu.evals.mmlu import run_mmlu

__all__ = ["run_gsm8k", "run_mmlu"]

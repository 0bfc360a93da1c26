"""Quantized-matmul micro-bench: measured GB/s + ms for every quant
method vs bf16, on the real chip (VERDICT r3 weak #4: W4A16 was the only
quantization with published kernel-level numbers).

Writes QUANT_MM_BENCH.json at the repo root.
Usage: python scripts/bench_quant_mm.py [M]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sglang_custom_tpu.layers.quantization import (
    quantize_fp8,
    quantize_fp8_blockwise,
    quantize_int8,
    quantize_w4a16,
)
from sglang_custom_tpu.layers.quantization.blockwise_fp8 import (
    fp8_blockwise_matmul,
)
from sglang_custom_tpu.layers.quantization.fp8 import fp8_matmul
from sglang_custom_tpu.layers.quantization.int8 import int8_matmul
from sglang_custom_tpu.layers.quantization.w4a16 import w4a16_matmul

K, N = 8192, 8192
M = int(sys.argv[1]) if len(sys.argv) > 1 else 64

rng = np.random.RandomState(0)
w = rng.randn(K, N).astype(np.float32) * 0.02
x = jnp.asarray(rng.randn(M, K).astype(np.float32)).astype(jnp.bfloat16)
wb = jnp.asarray(w).astype(jnp.bfloat16)

methods = {
    "bf16": (lambda x: jnp.matmul(x, wb), K * N * 2),
    "w4a16": None,
    "fp8": None,
    "int8": None,
    "fp8_block": None,
}

qd_w4 = {k: jnp.asarray(v) for k, v in quantize_w4a16(w).items()}
qd_f8 = {k: jnp.asarray(v) for k, v in quantize_fp8(w).items()}
qd_i8 = {k: jnp.asarray(v) for k, v in quantize_int8(w).items()}
qd_bl = {k: jnp.asarray(v) for k, v in quantize_fp8_blockwise(w).items()}

methods["w4a16"] = (
    lambda x: w4a16_matmul(x, qd_w4),
    K // 2 * N + 2 * (K // 128) * N * 4,
)
methods["fp8"] = (lambda x: fp8_matmul(x, qd_f8), K * N + N * 4)
methods["int8"] = (lambda x: int8_matmul(x, qd_i8), K * N + N * 4)
methods["fp8_block"] = (
    lambda x: fp8_blockwise_matmul(x, qd_bl),
    K * N + (K // 128) * (N // 128) * 4,
)

out = {"shape": f"{M}x{K}x{N}", "device": str(jax.devices()[0])}
# np.asarray forces a real round-trip; block_until_ready is optimistic
# over the axon tunnel and times lie by orders of magnitude.
fetch = jax.jit(lambda t: t.ravel()[0])
for name, (fn, bytes_) in methods.items():
    r = fn(x)
    np.asarray(fetch(r))
    t0 = time.perf_counter()
    n = 30
    for _ in range(n):
        r = fn(x)
    np.asarray(fetch(r))
    dt = (time.perf_counter() - t0) / n
    out[name] = {
        "ms": round(dt * 1e3, 3),
        "weight_gbps": round(bytes_ / dt / 1e9, 1),
    }
    print(f"{name:10s} {dt*1e3:8.3f} ms  {bytes_/dt/1e9:7.1f} GB/s "
          f"(weight bytes)", flush=True)

out["vs_bf16"] = {
    k: round(out["bf16"]["ms"] / out[k]["ms"], 2)
    for k in ("w4a16", "fp8", "int8", "fp8_block")
}
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
with open(os.path.join(repo, "QUANT_MM_BENCH.json"), "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out))

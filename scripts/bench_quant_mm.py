"""Quantized-matmul micro-bench: measured GB/s + ms for every quant
method vs bf16 on the real chip (VERDICT r3 weak #4: W4A16 was the only
quantization with published kernel-level numbers).

Harness: a lax.scan over 16 stacked layers (the model's real shape) with
a forced device round-trip — single-call timing is dispatch-dominated
(~0.7 ms/call over the tunnel) and block_until_ready lies.

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
from sglang_custom_tpu.ops.w4a16_matmul import w4a16_matmul_pallas_v2

L, K, N = 16, 4096, 14336
M = int(sys.argv[1]) if len(sys.argv) > 1 else 32

rng = np.random.RandomState(0)
w_np = [rng.randn(K, N).astype(np.float32) * 0.02 for _ in range(L)]
x = jnp.asarray(rng.randn(M, K).astype(np.float32)).astype(jnp.bfloat16)
fetch = jax.jit(lambda t: t.ravel()[0])


def stack(dicts):
    return {k: jnp.stack([jnp.asarray(d[k]) for d in dicts]) for k in dicts[0]}


qd_w4 = stack([quantize_w4a16(w) for w in w_np])
qd_f8 = stack([quantize_fp8(w) for w in w_np])
qd_i8 = stack([quantize_int8(w) for w in w_np])
qd_bl = stack([quantize_fp8_blockwise(w) for w in w_np])
wb = jnp.stack([jnp.asarray(w).astype(jnp.bfloat16) for w in w_np])


def scan_harness(mm, weights):
    @jax.jit
    def f(x, weights):
        def body(carry, w):
            y = mm(carry, w)
            return (x + y[:, :K] * 1e-6).astype(x.dtype), None

        out, _ = jax.lax.scan(body, x, weights)
        return out

    return lambda: f(x, weights)


methods = {
    "bf16": (scan_harness(lambda c, w: jnp.matmul(c, w), wb),
             L * K * N * 2),
    "w4a16": (scan_harness(lambda c, w: w4a16_matmul(c, w), qd_w4),
              L * (K // 2 * N + 2 * (K // 128) * N * 4)),
    "w4a16_v2": (scan_harness(
        lambda c, w: w4a16_matmul_pallas_v2(
            c, w["qweight"], w["scales"], w["zeros"]
        ).astype(c.dtype), qd_w4),
        L * (K // 2 * N + 2 * (K // 128) * N * 4)),
    "fp8": (scan_harness(lambda c, w: fp8_matmul(c, w), qd_f8),
            L * (K * N + N * 4)),
    "int8": (scan_harness(lambda c, w: int8_matmul(c, w), qd_i8),
             L * (K * N + N * 4)),
    "fp8_block": (scan_harness(lambda c, w: fp8_blockwise_matmul(c, w), qd_bl),
                  L * (K * N + (K // 128) * (N // 128) * 4)),
}

out = {"shape": f"{M}x{K}x{N} x{L} layers (lax.scan)",
       "device": str(jax.devices()[0])}
for name, (fn, bytes_) in methods.items():
    try:
        r = fn()
        np.asarray(fetch(r))
    except Exception as e:
        out[name] = {"error": f"{type(e).__name__}: {e}"[:150]}
        print(name, "FAILED", flush=True)
        continue
    t0 = time.perf_counter()
    n = 15
    for _ in range(n):
        r = fn()
    np.asarray(fetch(r))
    dt = (time.perf_counter() - t0) / n
    out[name] = {
        "ms": round(dt * 1e3, 3),
        "weight_gbps": round(bytes_ / dt / 1e9, 1),
    }
    print(f"{name:10s} {dt*1e3:8.3f} ms  {bytes_/dt/1e9:7.1f} GB/s "
          f"(weight bytes)", flush=True)

out["time_vs_bf16"] = {
    k: round(out["bf16"]["ms"] / out[k]["ms"], 2)
    for k in ("w4a16", "w4a16_v2", "fp8", "int8", "fp8_block")
    if "ms" in out.get(k, {})
}
out["note"] = (
    "v5e dequant of sub-bf16 weights is VPU-compute-bound (unpack-only "
    "int4 kernel measures ~270 GB/s ceiling, scripts/kernel_lab_w4b.py); "
    "quantization on this chip buys CAPACITY and modest time wins, not "
    "bandwidth-proportional speedups. fp8_block (exact 128x128 scales) "
    "plateaus at ~156 GB/s across XLA block-scan / fused-producer / "
    "Pallas formulations (scripts/lab_fp8_block*.py) — the per-weight "
    "scale multiply stacks on the upcast's VPU cost; it serves models "
    "that cannot fit bf16, where absolute time vs bf16 is moot"
)
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
with open(os.path.join(repo, "QUANT_MM_BENCH.json"), "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out))

"""Isolate the 8B W4A16 decode slowdown (BENCH r4 pre-run: 188 GB/s
effective vs ~690 roofline).

Hypothesis: inside lax.scan over stacked [L, K/2, N] qweights, the
dynamic-slice feeding the Pallas call materializes a full per-layer copy
(unlike jnp.matmul, where XLA fuses the slice into the dot read).

Measures, on the real chip, ms and effective GB/s (int4 bytes):
  A. single-layer kernel call (no scan)          — the round-2 claim
  B. scan over 32 stacked layers, kernel inside  — the model's real shape
  C. same scan with bf16 jnp.matmul              — the fusion baseline
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from sglang_custom_tpu.ops.w4a16_matmul import w4a16_matmul_pallas

L, K, N, G, B = 32, 4096, 14336, 128, 32
print("devices:", jax.devices(), flush=True)

rng = np.random.RandomState(0)
qw = jnp.asarray(rng.randint(0, 256, (L, K // 2, N), dtype=np.uint8))
sc = jnp.full((L, K // G, N), 0.004, jnp.float32)
zr = jnp.full((L, K // G, N), -0.03, jnp.float32)
x = jnp.asarray(rng.randn(B, K), np.float32).astype(jnp.bfloat16)
wb = jnp.asarray(rng.randn(L, K, N), np.float32).astype(jnp.bfloat16) * 0.01

int4_gb = L * (K // 2 * N + 2 * (K // G) * N * 4) / 1e9
bf16_gb = L * K * N * 2 / 1e9


fetch = jax.jit(lambda t: t.ravel()[0])


def timeit(label, fn, gb, n=20):
    # np.asarray(fetch(...)) forces a real device round-trip: over the
    # axon tunnel block_until_ready returns optimistically and times lie
    # by orders of magnitude (measured 107 TB/s "bandwidth").
    r = fn()
    np.asarray(fetch(r))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    np.asarray(fetch(r))
    dt = (time.perf_counter() - t0) / n
    print(f"{label:42s} {dt*1e3:8.3f} ms  {gb/dt:7.1f} GB/s", flush=True)
    return dt


@jax.jit
def single(x, qw, sc, zr):
    out = x
    for l in range(L):  # unrolled, static slices
        y = w4a16_matmul_pallas(out, qw[l], sc[l], zr[l])
        out = (x + y[:, :K] * 1e-6).astype(x.dtype)
    return out


@jax.jit
def scanned(x, qw, sc, zr):
    def body(carry, w):
        q, s, z = w
        y = w4a16_matmul_pallas(carry, q, s, z)
        return (x + y[:, :K] * 1e-6).astype(x.dtype), None

    out, _ = jax.lax.scan(body, x, (qw, sc, zr))
    return out


@jax.jit
def scanned_bf16(x, wb):
    def body(carry, w):
        y = jnp.matmul(carry, w)
        return (x + y[:, :K] * 1e-6).astype(x.dtype), None

    out, _ = jax.lax.scan(body, x, wb)
    return out


timeit("A unrolled static-slice kernel x32", lambda: single(x, qw, sc, zr), int4_gb)
timeit("B lax.scan kernel x32", lambda: scanned(x, qw, sc, zr), int4_gb)
timeit("C lax.scan bf16 matmul x32", lambda: scanned_bf16(x, wb), bf16_gb)

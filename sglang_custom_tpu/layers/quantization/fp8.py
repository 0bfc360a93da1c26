"""FP8 (e4m3) weight quantization with per-channel scales.

Analog of the reference's Fp8Config / fp8 scaled-mm path
(reference: layers/quantization/fp8.py:109 Fp8Config, fp8_kernel.py
per-token/per-group quant + sgl-kernel fp8_scaled_mm). TPU v5e+ MXUs
multiply fp8 natively; XLA emits fp8 dots from jnp.float8_e4m3fn inputs
with a dequant epilogue.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

F8_MAX = 448.0  # e4m3 max normal


def quantize_fp8(w: np.ndarray) -> dict:
    """[K, N] float -> {"qweight": [K, N] e4m3, "scales": [N] f32}
    (per-output-channel symmetric scaling)."""
    w = np.asarray(w, dtype=np.float32)
    amax = np.maximum(np.abs(w).max(axis=0), 1e-8)  # [N]
    scale = amax / F8_MAX
    q = (w / scale[None, :]).astype(np.dtype("float8_e4m3fn"))
    return {"qweight": q, "scales": scale.astype(np.float32)}


@jax.jit
def fp8_matmul(x: jax.Array, qd: dict) -> jax.Array:
    """x [..., K] @ (qweight * scales) -> [..., N]. The matmul runs with
    an fp8 weight operand; the per-channel scale applies to the output."""
    w = qd["qweight"].astype(jnp.bfloat16)
    out = jnp.matmul(x.astype(jnp.bfloat16), w)
    return (out * qd["scales"].astype(jnp.bfloat16)).astype(x.dtype)

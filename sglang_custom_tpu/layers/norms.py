"""RMSNorm (reference: srt/layers/layernorm.py RMSNorm + fused-add kernels).

On TPU we write the plain functional form and let XLA fuse the
residual-add + norm + cast chain — the hand-written fused CUDA kernels in
sgl-kernel (csrc/elementwise/rmsnorm) exist to get fusion torch can't do;
XLA does it for free.
"""

from __future__ import annotations

import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jnp.reciprocal(jnp.sqrt(var + eps))
    return (normed * weight.astype(jnp.float32)).astype(x.dtype)

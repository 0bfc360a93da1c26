"""Blockwise FP8 (e4m3) quantization — DeepSeek-V3-style 128x128 blocks.

Analog of the reference's blockwise-fp8 path (reference:
layers/quantization/fp8.py block_quant branch +
quantization/fp8_kernel.py:w8a8_block_fp8_matmul — triton GEMM that
rescales per (128, 128) weight block). TPU-first: instead of a hand-tiled
GEMM, the contraction is split along K into its quant blocks with one
batched ``dot_general`` ([..., Kb, B] x [Kb, B, N]) and the per-(K-block,
N-block) scale applies to the partial products before the K-block
reduction — exact blockwise semantics, MXU-shaped operands, and the fp8
weight is the only [K, N]-sized HBM read.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

F8_MAX = 448.0  # e4m3 max normal
DEFAULT_BLOCK = 128


def quantize_fp8_blockwise(w: np.ndarray, block: int = DEFAULT_BLOCK) -> dict:
    """[K, N] float -> {"qweight": [K, N] e4m3, "scales": [K/B, N/B] f32}.

    K and N must divide by ``block`` (pad upstream otherwise — every
    supported model family's projections are 128-divisible).
    """
    w = np.asarray(w, dtype=np.float32)
    K, N = w.shape
    B = min(block, K, N)
    assert K % B == 0 and N % B == 0, (K, N, B)
    wb = w.reshape(K // B, B, N // B, B)
    amax = np.maximum(np.abs(wb).max(axis=(1, 3)), 1e-8)  # [K/B, N/B]
    scale = amax / F8_MAX
    q = (wb / scale[:, None, :, None]).astype(np.dtype("float8_e4m3fn"))
    return {
        "qweight": q.reshape(K, N),
        "scales": scale.astype(np.float32),
    }


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def fp8_blockwise_matmul(x: jax.Array, qd: dict) -> jax.Array:
    """x [..., K] @ blockwise-dequant(qweight) -> [..., N].

    On TPU with supported shapes this runs the fused Pallas kernel
    (ops/fp8_matmul.py fp8_block_matmul_pallas): e4m3 stays in HBM and
    the 128x128 block scales apply to the dequantized chunk in VMEM —
    the XLA per-block-partial path below measured SLOWER than bf16
    (QUANT_MM_BENCH r4 fp8_block 0.76x; VERDICT r4 weak #5)."""
    qw, s = qd["qweight"], qd["scales"]
    K, N = qw.shape
    Kb_, Nb_ = s.shape
    if K // Kb_ == 128:
        from sglang_custom_tpu.ops.fp8_matmul import (
            fp8_block_matmul_pallas,
            supported_shape_block,
        )

        if _on_tpu() and supported_shape_block(K, N, 128):
            lead = x.shape[:-1]
            s_kn = jnp.repeat(s, N // Nb_, axis=1)  # [K/128, N] (tiny)
            out = fp8_block_matmul_pallas(
                x.reshape(-1, K), qw, s_kn.astype(jnp.float32)
            )
            return out.reshape(*lead, N).astype(x.dtype)
    return _fp8_blockwise_matmul_xla(x, qd)


@jax.jit
def _fp8_blockwise_matmul_xla(x: jax.Array, qd: dict) -> jax.Array:
    qw, s = qd["qweight"], qd["scales"]
    K, N = qw.shape
    Kb, Nb = s.shape
    B = K // Kb
    lead = x.shape[:-1]
    xb = x.astype(jnp.bfloat16).reshape(*lead, Kb, B)
    wb = qw.astype(jnp.bfloat16).reshape(Kb, B, N)
    # [..., Kb, B] x [Kb, B, N] -> [..., Kb, N] (Kb batched on the MXU)
    partial = jax.lax.dot_general(
        xb,
        wb,
        dimension_numbers=(
            ((xb.ndim - 1,), (1,)),
            ((xb.ndim - 2,), (0,)),
        ),
        preferred_element_type=jnp.float32,
    )  # -> [Kb, ..., N]
    sN = jnp.repeat(s, N // Nb, axis=1)  # [Kb, N]
    sN = sN.reshape((Kb,) + (1,) * len(lead) + (N,))
    out = jnp.sum(partial * sN, axis=0)
    return out.astype(x.dtype)

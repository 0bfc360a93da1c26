"""Attention backend interface.

Analog of the reference's AttentionBackend ABC
(reference: srt/layers/attention/base_attn_backend.py:14 with
init_forward_metadata / forward_extend / forward_decode and CUDA-graph
hooks). On TPU the graph-capture hooks disappear (bucketed jit replaces
CUDA graphs) and extend/decode collapse into one ragged call.

A backend is a callable invoked once per layer inside the scanned model
body. It both *writes* the step's new KV into the paged pool slice and
*reads* the whole context for attention — fusing write+read into one kernel
is exactly what the Pallas backend does; the XLA backend composes the same
semantics from gather/scatter.
"""

from __future__ import annotations

import abc

import jax

from sglang_custom_tpu.model_executor.forward_batch import ForwardMeta


class AttentionBackend(abc.ABC):
    """Stateless per-layer paged attention.

    Shapes:
        q, k_new, v_new : [B, T, H(q|kv), D]   (post-RoPE)
        layer_kv        : [Hkv, P, page_size, 2, D]  (K/V folded in lanes)
    Returns (attn_out [B, T, Hq, D], updated layer_kv).
    """

    @abc.abstractmethod
    def __call__(
        self,
        q: jax.Array,
        k_new: jax.Array,
        v_new: jax.Array,
        layer_kv: jax.Array,
        meta: ForwardMeta,
        scale: float,
        window=None,
        softcap: float = 0.0,
    ):
        """``window``: traced int32 scalar — attend only to kv positions
        > q_pos - window (sliding-window layers; None/FULL_WINDOW = causal).
        ``softcap``: static attention-logit soft cap (gemma2), 0 disables."""
        ...


def write_kv_pages(
    k_new: jax.Array,
    v_new: jax.Array,
    layer_kv: jax.Array,
    meta: ForwardMeta,
) -> jax.Array:
    """Scatter this step's K/V into the paged pool.

    Padding tokens (t >= extend_lens[b]) are routed to the garbage page 0 so
    the scatter stays branch-free (allocator.py GARBAGE_PAGE).
    """
    import jax.numpy as jnp

    B, T, Hkv, D = k_new.shape
    _, P, ps = layer_kv.shape[:3]
    pos = meta.positions  # [B, T]
    page = jnp.take_along_axis(meta.page_table, pos // ps, axis=1)  # [B, T]
    valid = (
        jax.lax.broadcasted_iota(jnp.int32, (B, T), 1)
        < meta.extend_lens[:, None]
    )
    slots = jnp.where(valid, page * ps + pos % ps, pos % ps)  # garbage page = 0
    # [Hkv, B*T, 2, D] to match the pool's head-leading K/V-folded layout.
    kv_new = jnp.stack([k_new, v_new], axis=3)  # [B, T, Hkv, 2, D]
    kv_new = kv_new.reshape(B * T, Hkv, 2, D).transpose(1, 0, 2, 3)
    kv_new = kv_new.astype(layer_kv.dtype)
    flat = layer_kv.reshape(Hkv, P * ps, 2, D)
    flat = flat.at[:, slots.reshape(-1)].set(kv_new, mode="drop")
    return flat.reshape(layer_kv.shape)

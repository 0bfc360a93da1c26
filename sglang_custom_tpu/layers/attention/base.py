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
    """Stateless per-layer paged attention over the FULL KV pool.

    Shapes:
        q, k_new, v_new : [B, T, H(q|kv), D]   (post-RoPE)
        kv_pool         : [L, Hkv, P, page_size, 2D]  (K|V folded in lanes)
        layer           : traced int32 scalar — which pool layer to use
    Returns (attn_out [B, T, Hq, D], updated kv_pool).

    The pool is passed whole (and threaded through the model's layer scan
    as the *carry*) so backends can update it in place: slicing it per
    layer as scan xs/ys made XLA materialize three 128 MiB copies per
    layer per step (measured ~50 ms/step for a 1B model on v5e, round 2).
    """

    @abc.abstractmethod
    def __call__(
        self,
        q: jax.Array,
        k_new: jax.Array,
        v_new: jax.Array,
        kv_pool: jax.Array,
        layer: jax.Array,
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
    kv_pool: jax.Array,
    layer,
    meta: ForwardMeta,
    kv_scale: float = 1.0,
    labels=None,
) -> jax.Array:
    """Scatter this step's K/V into layer ``layer`` of the paged pool.

    ``labels``: optional [B, T, Hkv, r] heavy-channel labels appended after
    the K|V fold (double-sparsity pools carry 2D + r features).

    Padding tokens (t >= extend_lens[b]) are routed to the garbage page 0 so
    the scatter stays branch-free (allocator.py GARBAGE_PAGE). In-place on a
    donated pool (one XLA scatter; no layer-slice copies).

    FP8 pools store ``kv / kv_scale`` (static scale; reference:
    layers/quantization/kv_cache.py k_scale/v_scale) — the read side
    multiplies the scale back after the f8 load.
    """
    import jax.numpy as jnp

    parts = [k_new, v_new] if labels is None else [k_new, v_new, labels]
    kv_new = jnp.concatenate(parts, axis=-1)  # [B, T, Hkv, 2D(+r)]
    if kv_pool.dtype == jnp.float8_e4m3fn and kv_scale != 1.0:
        kv_new = kv_new / jnp.asarray(kv_scale, kv_new.dtype)
    return write_kv_pages_folded(kv_new, kv_pool, layer, meta)


def write_kv_pages_folded(
    kv_new: jax.Array,  # [B, T, Hkv, F] — already K|V folded (or MLA latent)
    kv_pool: jax.Array,
    layer,
    meta: ForwardMeta,
) -> jax.Array:
    import jax.numpy as jnp

    B, T, Hkv, F = kv_new.shape
    L, _, P, ps = kv_pool.shape[:4]
    pos = meta.positions  # [B, T]
    kv_new = kv_new.astype(kv_pool.dtype)
    import os

    if (
        jax.default_backend() == "tpu"
        and kv_pool.ndim == 5
        and not os.environ.get("SGLANG_TPU_DISABLE_KV_WRITER")
    ):
        # Pallas page-granular writer: the XLA scatter pins a permuted
        # pool layout that forces a 2 GiB layout-conversion copy per layer
        # next to the layout-pinned Pallas attention calls (ops/kv_write.py
        # docstring; r5 profiling found 14.6 ms/layer in spec verify and
        # chunked prefill from exactly this).
        from sglang_custom_tpu.ops.kv_write import (
            paged_kv_write,
            writer_supported,
        )

        if writer_supported(kv_pool):
            return paged_kv_write(
                kv_new, kv_pool, layer, meta.page_table, pos,
                meta.extend_lens,
            )
    page = jnp.take_along_axis(meta.page_table, pos // ps, axis=1)  # [B, T]
    valid = (
        jax.lax.broadcasted_iota(jnp.int32, (B, T), 1)
        < meta.extend_lens[:, None]
    )
    page = jnp.where(valid, page, 0)               # garbage page = 0
    off = pos % ps
    # Not unique_indices: padding rows collide on garbage slot 0 by design.
    return kv_pool.at[layer, :, page.reshape(-1), off.reshape(-1)].set(
        kv_new.reshape(B * T, Hkv, F), mode="drop"
    )

"""Pallas attention backend — the production TPU path.

Analog of the reference's flashinfer/triton backends
(reference: srt/layers/attention/flashinfer_backend.py — the default CUDA
production backend chosen by model_runner.py:1313). Decode (T==1) runs the
Pallas ragged-paged decode kernel with the step's KV insert FUSED into the
kernel (the pool is updated in place via input_output_aliases — no XLA
scatter, no pool copies); extend scatters the new KV once, then runs the
chunked-prefill kernel (causal within the extend, full over the cached
prefix).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sglang_custom_tpu.layers.attention.base import AttentionBackend, write_kv_pages
from sglang_custom_tpu.model_executor.forward_batch import ForwardMeta
from sglang_custom_tpu.ops.ragged_paged_attention import (
    paged_attention_decode,
    paged_attention_extend,
)


class PallasAttentionBackend(AttentionBackend):
    def __init__(self, interpret: bool = False):
        self.interpret = interpret

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
        B, T, Hq, D = q.shape
        if T == 1:
            kv_new = jnp.concatenate(
                [k_new[:, 0], v_new[:, 0]], axis=-1
            )  # [B, Hkv, 2D] folded
            out, kv_pool = paged_attention_decode(
                q[:, 0],
                kv_new,
                kv_pool,
                layer,
                meta.page_table,
                meta.seq_lens,
                scale=scale,
                window=window,
                softcap=softcap,
                interpret=self.interpret,
            )
            return out[:, None], kv_pool
        kv_pool = write_kv_pages(k_new, v_new, kv_pool, layer, meta)
        out = paged_attention_extend(
            q,
            kv_pool,
            layer,
            meta.page_table,
            meta.seq_lens,
            meta.extend_lens,
            scale=scale,
            window=window,
            softcap=softcap,
            interpret=self.interpret,
        )
        return out, kv_pool

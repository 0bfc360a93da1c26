"""Pallas attention backend — the production TPU path.

Analog of the reference's flashinfer/triton backends
(reference: srt/layers/attention/flashinfer_backend.py — the default CUDA
production backend chosen by model_runner.py:1313). Decode (T==1) runs the
Pallas ragged-paged decode kernel; extend runs the chunked-prefill kernel
(causal within the extend, full over the cached prefix).
"""

from __future__ import annotations

import jax

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
        layer_kv: jax.Array,
        meta: ForwardMeta,
        scale: float,
        window=None,
        softcap: float = 0.0,
    ):
        B, T, Hq, D = q.shape
        layer_kv = write_kv_pages(k_new, v_new, layer_kv, meta)
        if T == 1:
            out = paged_attention_decode(
                q[:, 0],
                layer_kv,
                meta.page_table,
                meta.seq_lens,
                scale=scale,
                window=window,
                softcap=softcap,
                interpret=self.interpret,
            )
            return out[:, None], layer_kv
        out = paged_attention_extend(
            q,
            layer_kv,
            meta.page_table,
            meta.seq_lens,
            meta.extend_lens,
            scale=scale,
            window=window,
            softcap=softcap,
            interpret=self.interpret,
        )
        return out, layer_kv

"""Pure-XLA paged attention reference backend.

Analog of the reference's torch_native_backend.py (srt/layers/attention/
torch_native_backend.py — the pure-SDPA correctness reference among its
backend zoo, §2.5). Used for correctness tests on CPU and as the fallback
when the Pallas kernel doesn't support a geometry. Gathers the full padded
context per request, so HBM traffic is O(B * padded_kv_len) — the Pallas
ragged backend is the production path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sglang_custom_tpu.layers.attention.base import AttentionBackend, write_kv_pages
from sglang_custom_tpu.model_executor.forward_batch import ForwardMeta

_NEG_INF = -1e30


class XlaAttentionBackend(AttentionBackend):
    def __init__(self, kv_scale: float = 1.0):
        # Static FP8-KV dequant scale (1.0 for bf16/f32 pools); reference:
        # layers/quantization/kv_cache.py Fp8KVCacheMethod.
        self.kv_scale = kv_scale

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
        kv_pool = write_kv_pages(
            k_new, v_new, kv_pool, layer, meta, kv_scale=self.kv_scale
        )
        out = self._attend(q, kv_pool, layer, meta, scale, window, softcap)
        return out, kv_pool

    def _attend(self, q, kv_pool, layer, meta, scale, window, softcap):
        """Dense masked attention over the (already written) paged pool."""
        layer_kv = jax.lax.dynamic_index_in_dim(
            kv_pool, layer, axis=0, keepdims=False
        )

        B, T, Hq, D = q.shape
        Hkv, P, ps = layer_kv.shape[:3]
        G = Hq // Hkv
        S = meta.page_table.shape[1] * ps  # padded context length (bucketed)

        # Gather the pages of every request: [Hkv, B, PMAX, ps, 2D]
        gathered = layer_kv[:, meta.page_table]
        if gathered.dtype == jnp.float8_e4m3fn:
            gathered = gathered.astype(q.dtype) * jnp.asarray(
                self.kv_scale, q.dtype
            )
        # explicit 2D bound: double-sparsity pools append label channels
        # after the K|V fold (double_sparsity_backend.py)
        k = gathered[..., :D].reshape(Hkv, B, S, D)
        v = gathered[..., D:2 * D].reshape(Hkv, B, S, D)

        qg = q.reshape(B, T, Hkv, G, D)
        scores = jnp.einsum(
            "btkgd,kbsd->bktgs", qg, k, preferred_element_type=jnp.float32
        ) * scale  # [B, Hkv, T, G, S]
        if softcap:
            scores = softcap * jnp.tanh(scores / softcap)

        kv_pos = jax.lax.broadcasted_iota(jnp.int32, (B, 1, 1, 1, S), 4)
        q_pos = meta.positions[:, None, :, None, None]  # [B, 1, T, 1, 1]
        seq_l = meta.seq_lens[:, None, None, None, None]
        if meta.tree_mask is not None:
            # Speculative-tree step: prefix kv (< tree_start) is fully
            # attended; within the node region the static ancestor mask
            # decides (reference: TARGET_VERIFY tree mask, eagle_utils.cu).
            N = meta.tree_mask.shape[1]
            ts = meta.tree_start[:, None, None, None, None]
            rel = jnp.clip(kv_pos - ts, 0, N - 1)[:, 0, 0, 0, :]  # [B, S]
            # tm[b, t, s] = tree_mask[t, rel[b, s]]
            tm = jnp.moveaxis(meta.tree_mask[:, rel], 0, 1)  # [B, T, S]
            tm = tm[:, None, :, None, :]
            in_region = (kv_pos >= ts) & (kv_pos < ts + N)
            mask = jnp.where(in_region, tm, kv_pos < ts) & (kv_pos < seq_l)
        else:
            mask = (kv_pos <= q_pos) & (kv_pos < seq_l)
            if window is not None:
                # HF sliding-window convention: attend iff q_pos - kv_pos < W.
                mask = mask & (kv_pos > q_pos - window)
        scores = jnp.where(mask, scores, _NEG_INF)

        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum(
            "bktgs,kbsd->btkgd", probs.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        )
        return out.reshape(B, T, Hq, D).astype(q.dtype)

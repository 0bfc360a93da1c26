"""Paged Multi-head Latent Attention (MLA) over the latent KV pool.

TPU-native equivalent of the reference's MLA attention backends
(reference: srt/layers/attention/flashinfer_mla_backend.py,
flashmla_backend.py, cutlass_mla_backend.py; latent pool
mem_cache/memory_pool.py:769 MLATokenToKVPool). Re-designed for TPU:

- **Absorbed-matmul form**: the caller pre-absorbs W_UK into the query
  (q_latent = q_nope @ W_UK) and W_UV into the output, so attention runs
  entirely in the latent space — scores against the cached latent, values
  *are* the cached latent. No per-step K/V expansion, which on TPU would
  be an HBM-bandwidth disaster (expanding 576 -> heads*2*128 per token).
- The latent pool reuses the uniform paged layout ``[1, P, ps, 2, F/2]``
  (memory_pool.kv_cache_shape MLA branch), so the allocator, radix cache,
  and page tables are identical to the MHA path.
- Pure-XLA gather implementation: decode is a [B,Hq,1,R]x[B,R,S] batched
  matmul — MXU work, the gather is the bandwidth cost. A Pallas latent
  kernel is the planned upgrade (same strip-DMA design as
  ragged_paged_attention.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sglang_custom_tpu.layers.attention.base import write_kv_pages_folded
from sglang_custom_tpu.model_executor.forward_batch import ForwardMeta

_NEG_INF = -1e30


def mla_paged_attention(
    q_latent: jax.Array,   # [B, T, Hq, R]   (q_nope absorbed with W_UK)
    q_pe: jax.Array,       # [B, T, Hq, Dr]  (post-rope)
    ckv_new: jax.Array,    # [B, T, R]       (post kv_a_layernorm)
    kpe_new: jax.Array,    # [B, T, Dr]      (post-rope, shared head)
    kv_pool: jax.Array,    # [L, 1, P, ps, F] latent pool, F = R + Dr
    layer,                 # traced int32 scalar
    meta: ForwardMeta,
    scale: float,
):
    """Returns (out_latent [B, T, Hq, R], updated kv_pool). The caller
    projects out_latent through W_UV per head."""
    B, T, Hq, R = q_latent.shape
    Dr = q_pe.shape[-1]
    F = R + Dr
    L, _, P, ps = kv_pool.shape[:4]

    latent = jnp.concatenate([ckv_new, kpe_new], axis=-1)  # [B, T, F]
    kv_pool = write_kv_pages_folded(
        latent[:, :, None, :], kv_pool, layer, meta
    )
    layer_kv = jax.lax.dynamic_index_in_dim(kv_pool, layer, 0, keepdims=False)

    S = meta.page_table.shape[1] * ps
    gathered = layer_kv[0, meta.page_table]  # [B, PMAX, ps, F]
    lat = gathered.reshape(B, S, F).astype(jnp.float32)
    ckv = lat[..., :R]   # [B, S, R] — both the keys and the values
    kpe = lat[..., R:]   # [B, S, Dr]

    scores = (
        jnp.einsum(
            "bthr,bsr->bhts", q_latent.astype(jnp.float32), ckv,
            preferred_element_type=jnp.float32,
        )
        + jnp.einsum(
            "bthd,bsd->bhts", q_pe.astype(jnp.float32), kpe,
            preferred_element_type=jnp.float32,
        )
    ) * scale  # [B, Hq, T, S]

    kv_pos = jax.lax.broadcasted_iota(jnp.int32, (B, 1, 1, S), 3)
    q_pos = meta.positions[:, None, :, None]
    seq_l = meta.seq_lens[:, None, None, None]
    mask = (kv_pos <= q_pos) & (kv_pos < seq_l)
    if meta.tree_mask is not None:
        # Speculative tree verify/draft (NextN on MLA): query rows are
        # tree nodes at linear KV slots [tree_start, tree_start+T); within
        # that region attention follows the ancestor mask, outside it the
        # positional mask already admits the whole prefix (reference:
        # eagle_utils tree masks; ops/ragged_paged_attention.py tree mode).
        tm = meta.tree_mask.astype(bool)            # [T, T]
        rel = kv_pos - meta.tree_start[:, None, None, None]  # [B,1,1,S]
        in_tree = (rel >= 0) & (rel < T)
        qi = jnp.arange(T, dtype=jnp.int32)[None, None, :, None]
        allowed = tm[qi, jnp.clip(rel, 0, T - 1)]   # [B,1,T,S]
        mask = jnp.where(in_tree, allowed, mask & (kv_pos < meta.tree_start[:, None, None, None]))
    scores = jnp.where(mask, scores, _NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)

    out = jnp.einsum(
        "bhts,bsr->bthr", probs, ckv, preferred_element_type=jnp.float32
    )  # [B, T, Hq, R]
    return out.astype(q_latent.dtype), kv_pool

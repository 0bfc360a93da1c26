"""Pallas attention backend — the production TPU path.

Analog of the reference's flashinfer/triton backends
(reference: srt/layers/attention/flashinfer_backend.py — the default CUDA
production backend chosen by model_runner.py:1313). Decode (T==1) runs the
Pallas ragged-paged decode kernel with the step's KV insert FUSED into the
kernel (the pool is updated in place via input_output_aliases — no XLA
scatter, no pool copies); extend scatters the new KV once, then runs the
chunked-prefill kernel (causal within the extend, full over the cached
prefix).

Tensor parallelism: GSPMD cannot partition a custom call, so under tp>1
the kernels run inside ``jax.shard_map`` over the ``tensor`` mesh axis —
each shard attends over its local q/kv heads against its local slice of
the pool (the pool is head-sharded, memory_pool.kv_cache_sharding), and no
collective is needed inside the region (the reference's partitioned-heads
TP attention semantics, layers/attention/flashinfer_backend.py +
parallel_state.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_custom_tpu.layers.attention.base import AttentionBackend, write_kv_pages
from sglang_custom_tpu.model_executor.forward_batch import ForwardMeta
from sglang_custom_tpu.ops.ragged_paged_attention import (
    paged_attention_decode,
    paged_attention_extend,
)
from sglang_custom_tpu.parallel.mesh import TENSOR_AXIS


class PallasAttentionBackend(AttentionBackend):
    def __init__(self, interpret: bool = False, mesh_ctx=None):
        self.interpret = interpret
        # Sharded execution only when heads actually divide over the axis
        # (model_runner gates this when constructing the backend).
        self.mesh = None
        if mesh_ctx is not None and mesh_ctx.tp_size > 1:
            self.mesh = mesh_ctx.mesh

    def _shard_map(self, fn, in_specs, out_specs):
        return jax.shard_map(
            fn, mesh=self.mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )

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
        h = P(None, TENSOR_AXIS)  # head-dim sharding fragment
        if T == 1 and meta.tree_mask is None:
            kv_new = jnp.concatenate(
                [k_new[:, 0], v_new[:, 0]], axis=-1
            )  # [B, Hkv, 2D] folded

            def call_decode(q0, kvn, pool, layer, pt, sl, win):
                return paged_attention_decode(
                    q0, kvn, pool, layer, pt, sl,
                    scale=scale, window=win, softcap=softcap,
                    interpret=self.interpret,
                )

            win = jnp.asarray(
                (1 << 30) if window is None else window, jnp.int32
            )
            if self.mesh is not None:
                call = self._shard_map(
                    call_decode,
                    in_specs=(
                        P(None, TENSOR_AXIS, None),    # q [B, Hq, D]
                        P(None, TENSOR_AXIS, None),    # kv_new [B, Hkv, 2D]
                        P(None, TENSOR_AXIS, None, None, None),  # pool
                        P(), P(None, None), P(None), P(),
                    ),
                    out_specs=(
                        P(None, TENSOR_AXIS, None),
                        P(None, TENSOR_AXIS, None, None, None),
                    ),
                )
            else:
                call = call_decode
            out, kv_pool = call(
                q[:, 0], kv_new, kv_pool, jnp.asarray(layer, jnp.int32),
                meta.page_table, meta.seq_lens, win,
            )
            return out[:, None], kv_pool

        kv_pool = write_kv_pages(k_new, v_new, kv_pool, layer, meta)

        tree = meta.tree_mask is not None

        def call_extend(q0, pool, layer, pt, sl, el, win, *tree_args):
            tm, ts = tree_args if tree else (None, None)
            return paged_attention_extend(
                q0, pool, layer, pt, sl, el,
                scale=scale, window=None if tree else win, softcap=softcap,
                interpret=self.interpret, tree_mask=tm, tree_start=ts,
            )

        win = jnp.asarray((1 << 30) if window is None else window, jnp.int32)
        extra = (meta.tree_mask, meta.tree_start) if tree else ()
        if self.mesh is not None:
            tree_specs = (P(None, None), P(None)) if tree else ()
            call = self._shard_map(
                call_extend,
                in_specs=(
                    P(None, None, TENSOR_AXIS, None),  # q [B, T, Hq, D]
                    P(None, TENSOR_AXIS, None, None, None),
                    P(), P(None, None), P(None), P(None), P(),
                ) + tree_specs,
                out_specs=(
                    P(None, None, TENSOR_AXIS, None),
                    P(None, TENSOR_AXIS, None, None, None),
                ),
            )
        else:
            call = call_extend
        # The kernel returns the pool aliased-through (in-place read; see
        # paged_attention_extend) — thread it like the decode path does.
        out, kv_pool = call(
            q, kv_pool, jnp.asarray(layer, jnp.int32),
            meta.page_table, meta.seq_lens, meta.extend_lens, win, *extra,
        )
        return out, kv_pool

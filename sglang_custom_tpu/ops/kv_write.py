"""Pallas paged-KV writer: scatter this step's K/V into the pool in place.

Why this exists: the XLA scatter formulation of the KV write pins a
PERMUTED pool layout ({4,1,3,2,0}) on TPU, while the Pallas attention
kernels require the default layout — so inside the per-layer scan XLA
inserted a full-pool layout-conversion copy (2 GiB, ~14.6 ms) around
EVERY extend-layer's attention call (r5 HLO: %copy around %scatter). This
kernel removes the scatter: per touched page it fetches the page to VMEM,
overlays the step's new rows, and writes the page back tile-aligned — the
same read-modify-write the decode kernel does for its fused insert
(ragged_paged_attention._decode_kernel wb_dma). Sub-tile row DMAs are not
expressible (Mosaic tiles the in-page dim), hence page granularity.

Work items are (batch row, touched page); extends touch contiguous
positions, so each item's source rows are one static-size window of the
(padded) kv_new array.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def writer_supported(kv_pool) -> bool:
    """Geometry the page-RMW DMAs are known-good for: lane-multiple
    feature dim and at least a full sublane tile of kv heads (smaller
    geometries hung Mosaic DMA on-chip — r5 A/B with Hkv=4, F=64)."""
    L, Hkv, P, ps, F = kv_pool.shape
    return F % 128 == 0 and Hkv >= 8 and ps % 8 == 0


def _writer_kernel(page_ref, wsrc_ref, lo_ref, hi_ref, layer_ref,
                   kvn_ref, kv_in_ref, out_ref, pbuf, nbuf, sems):
    i = pl.program_id(0)
    del kv_in_ref  # aliased with out_ref
    layer = layer_ref[0]
    page = page_ref[i]
    ps = pbuf.shape[1]

    fetch_p = pltpu.make_async_copy(
        out_ref.at[layer, :, page], pbuf, sems.at[0]
    )
    fetch_n = pltpu.make_async_copy(
        kvn_ref.at[pl.ds(wsrc_ref[i], ps)], nbuf, sems.at[1]
    )
    fetch_p.start()
    fetch_n.start()
    fetch_p.wait()
    fetch_n.wait()

    row = jax.lax.broadcasted_iota(jnp.int32, (1, ps, 1), 1)
    mask = (row >= lo_ref[i]) & (row < hi_ref[i])
    pbuf[...] = jnp.where(
        mask, jnp.swapaxes(nbuf[...], 0, 1), pbuf[...]
    )
    wb = pltpu.make_async_copy(
        pbuf, out_ref.at[layer, :, page], sems.at[2]
    )
    wb.start()
    wb.wait()


@functools.partial(jax.jit, donate_argnums=(1,),
                   static_argnames=("interpret",))
def paged_kv_write(
    kv_new: jax.Array,      # [B, T, Hkv, F] (pool dtype)
    kv_pool: jax.Array,     # [L, Hkv, P, ps, F] (donated, updated in place)
    layer,                  # traced int32 scalar
    page_table: jax.Array,  # [B, PMAX] int32
    positions: jax.Array,   # [B, T] int32 (contiguous per row)
    extend_lens: jax.Array, # [B] int32 (tokens beyond are pads)
    *,
    interpret: bool = False,
) -> jax.Array:
    B, T, Hkv, F = kv_new.shape
    L, _, P, ps = kv_pool.shape[:4]
    pmax = page_table.shape[1]
    npp = T // ps + 2            # touched pages per row (upper bound)

    c = positions[:, 0]                                  # [B]
    e = extend_lens
    k = jnp.arange(npp, dtype=jnp.int32)[None, :]        # [1, npp]
    pidx = c[:, None] // ps + k                          # [B, npp]
    page = jnp.take_along_axis(
        page_table, jnp.clip(pidx, 0, pmax - 1), axis=1
    )
    p0 = pidx * ps
    lo = jnp.clip(c[:, None] - p0, 0, ps)
    hi = jnp.clip(c[:, None] + e[:, None] - p0, 0, ps)
    live = hi > lo
    page = jnp.where(live, page, 0)                      # dead item -> pg 0
    hi = jnp.where(live, hi, 0)
    lo = jnp.where(live, lo, 0)

    # pad kv_new rows so every item's ps-window is in range, flatten rows
    kvp = jnp.pad(kv_new, ((0, 0), (ps, ps), (0, 0), (0, 0)))
    kvf = kvp.reshape(B * (T + 2 * ps), Hkv, F)
    wsrc = (
        jnp.arange(B, dtype=jnp.int32)[:, None] * (T + 2 * ps)
        + ps + p0 - c[:, None]
    )
    wsrc = jnp.where(live, wsrc, 0)

    NP = B * npp
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(NP,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # kvf (HBM)
            pl.BlockSpec(memory_space=pl.ANY),   # pool (HBM, aliased)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((Hkv, ps, F), kv_pool.dtype),
            pltpu.VMEM((ps, Hkv, F), kv_pool.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    return pl.pallas_call(
        _writer_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(kv_pool.shape, kv_pool.dtype),
        # args flatten as (page, wsrc, lo, hi, layer, kvf, kv_pool):
        # pool is input 6, aliased onto the only output
        input_output_aliases={6: 0},
        interpret=interpret,
    )(
        page.reshape(-1), wsrc.reshape(-1), lo.reshape(-1),
        hi.reshape(-1), jnp.asarray(layer, jnp.int32).reshape(1),
        kvf, kv_pool,
    )

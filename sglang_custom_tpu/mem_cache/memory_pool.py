"""Device-side paged KV cache pool.

TPU-native re-design of the reference's KV pools
(reference: srt/mem_cache/memory_pool.py:101 KVCache / :178 MHATokenToKVPool
— per-layer K/V torch tensors indexed at token granularity). Here the pool
is a single fused jax array with layout

    kv[L, num_kv_heads, num_pages, page_size, 2*head_dim]

K and V of one token are adjacent along the minor axis (K at lanes [:D],
V at [D:]), and head/page are *leading* dims. This layout is chosen for
the Pallas ragged-paged-attention kernel: one DMA per page moves K and V
together, the folded minor dim ``2*head_dim`` is 128-lane aligned for
every head_dim % 64 == 0 (Mosaic rejects DMA slices whose minor dim isn't
tile-aligned — which rules out a K/V-split layout for D=64 model
families), and per-page / per-head slices cut exclusively untiled leading
dims. The array is *donated* through every jitted step (threaded as the
layer-scan carry) so XLA aliases the buffer in place — the
functional-update analog of the reference mutating torch tensors.

Sharding: kv heads are split over the ``tensor`` mesh axis (same axis as
attention heads in the weights), so KV never moves across chips during
attention.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from sglang_custom_tpu.config.model_config import ModelConfig
from sglang_custom_tpu.parallel.mesh import MeshContext, TENSOR_AXIS


def kv_cache_shape(cfg: ModelConfig, num_pages: int, page_size: int,
                   extra_feat: int = 0):
    """Pool shape [L, Hkv, P, ps, F] with K and V of one token FOLDED along
    the minor axis (K at lanes [:D], V at [D:]). The fold is the canonical
    storage — not a view — so the Pallas kernels' default-layout constraint
    propagates to the pool parameter with no reshape boundary (a trailing
    [2, D] shape made XLA layout assignment insert full-pool transpose
    copies around every kernel call — measured round 2)."""
    if cfg.is_mla:
        # MLA latent pool (reference: MLATokenToKVPool memory_pool.py:769):
        # one (kv_lora_rank + rope_dim) latent per token as a "1-head" pool.
        return (cfg.num_layers, 1, num_pages, page_size, cfg.kv_dim_per_token)
    # extra_feat: label channels appended after the K|V fold (double
    # sparsity, layers/attention/double_sparsity_backend.py) — riding the
    # same pages keeps the allocator/radix/PD machinery unchanged.
    return (
        cfg.num_layers, cfg.num_kv_heads, num_pages, page_size,
        2 * cfg.head_dim + extra_feat,
    )


def kv_cache_sharding(mesh_ctx: MeshContext, num_kv_heads: int):
    """Shard the kv-head axis over ``tensor`` when divisible, else replicate.
    (MLA pools pass num_kv_heads=1 and stay replicated — every TP shard
    attends over the full latent, like the reference's dp-attention MLA
    layout, layers/dp_attention.py.)"""
    if num_kv_heads % mesh_ctx.tp_size == 0 and mesh_ctx.tp_size > 1:
        return mesh_ctx.sharding(None, TENSOR_AXIS, None, None, None)
    return mesh_ctx.replicated


@dataclasses.dataclass
class KVCachePool:
    """Owns the device KV array and its geometry."""

    kv: jax.Array  # [L, Hkv, P, page_size, 2*D] (K|V folded in lanes)
    page_size: int
    # Format (layout+sharding) the pool is pinned to; step executables must
    # declare it via jit in_shardings/out_shardings or XLA re-layouts the
    # donated pool at every dispatch (see create()).
    fmt: object = None

    @property
    def num_pages(self) -> int:
        return self.kv.shape[2]

    @property
    def num_kv_heads(self) -> int:
        return self.kv.shape[1]

    @property
    def head_dim(self) -> int:
        return self.kv.shape[4] // 2

    @staticmethod
    def create(
        cfg: ModelConfig,
        num_pages: int,
        page_size: int,
        dtype: jnp.dtype,
        mesh_ctx: MeshContext,
        extra_feat: int = 0,
    ) -> "KVCachePool":
        shape = kv_cache_shape(cfg, num_pages, page_size, extra_feat)
        sharding = kv_cache_sharding(
            mesh_ctx, 1 if cfg.is_mla else cfg.num_kv_heads
        )
        # Pin the default major-to-minor layout: left unconstrained, XLA's
        # layout assignment picked a pages-minor layout for the pool
        # parameter, forcing two 2 GiB transpose-copies per layer around
        # the Pallas kernel (which requires the default layout). Measured
        # round 2: 222 ms/step vs <20 ms with the pin.
        try:
            from jax.experimental.layout import Format, Layout

            if not isinstance(sharding, jax.sharding.NamedSharding):
                sharding = jax.sharding.SingleDeviceSharding(
                    mesh_ctx.mesh.devices.flat[0]
                )
            fmt = Format(
                Layout(major_to_minor=tuple(range(len(shape)))), sharding
            )
        except Exception:  # older jax: fall back to sharding only
            fmt = sharding
        kv = jax.device_put(jnp.zeros(shape, dtype=dtype), fmt)
        return KVCachePool(kv=kv, page_size=page_size, fmt=fmt)

    def mem_bytes(self) -> int:
        return self.kv.size * self.kv.dtype.itemsize


def _pow2(n: int) -> int:
    b = 1
    while b < n:
        b *= 2
    return b


@jax.jit
def _gather_pages_jit(kv, pages):
    return kv[:, :, pages]


def _scatter_pages_jit():
    import functools

    @functools.partial(jax.jit, donate_argnums=(0,))
    def f(kv, pages, data):
        return kv.at[:, :, pages].set(data)

    return f


_scatter_fn = None


def gather_pages(pool: "KVCachePool", pages) -> np.ndarray:
    """Fetch whole KV pages device->host as [n, L, Hkv, ps, 2D]
    (the transfer unit for HiCache offload and PD disaggregation —
    reference: sgl-kernel csrc/kvcacheio/transfer.cu)."""
    n = len(pages)
    padded = list(pages) + [0] * (_pow2(n) - n)
    out = _gather_pages_jit(pool.kv, jnp.asarray(padded, jnp.int32))
    return np.moveaxis(np.asarray(out), 2, 0)[:n]


def scatter_pages(pool: "KVCachePool", pages, data: np.ndarray) -> None:
    """Upload host pages [n, ...] into the pool in place (donated scatter;
    padding rows land in the garbage page 0)."""
    global _scatter_fn
    if _scatter_fn is None:
        _scatter_fn = _scatter_pages_jit()
    n = len(pages)
    np2 = _pow2(n)
    padded = list(pages) + [0] * (np2 - n)
    if np2 != n:
        pad = np.zeros((np2 - n,) + data.shape[1:], data.dtype)
        data = np.concatenate([data, pad], axis=0)
    dev = np.moveaxis(data, 0, 2)
    pool.kv = _scatter_fn(
        pool.kv, jnp.asarray(padded, jnp.int32), jnp.asarray(dev)
    )


class ReqSlotPool:
    """Host-side request-slot bookkeeping.

    Analog of the reference's ReqToTokenPool (mem_cache/memory_pool.py:51),
    except the table maps request slots to *page ids* (not token slots):

        page_table_np[slot, i] = id of the i-th KV page of that request

    Only rows of active slots are gathered into the per-step device batch.
    """

    def __init__(self, max_reqs: int, max_pages_per_req: int):
        self.max_reqs = max_reqs
        self.max_pages_per_req = max_pages_per_req
        self.page_table_np = np.zeros((max_reqs, max_pages_per_req), dtype=np.int32)
        self._free_slots = list(range(max_reqs - 1, -1, -1))

    @property
    def available_slots(self) -> int:
        return len(self._free_slots)

    def alloc_slot(self) -> int:
        if not self._free_slots:
            raise RuntimeError("out of request slots")
        slot = self._free_slots.pop()
        self.page_table_np[slot, :] = 0
        return slot

    def free_slot(self, slot: int) -> None:
        self._free_slots.append(slot)

    def write_pages(self, slot: int, start_page: int, pages) -> None:
        end = start_page + len(pages)
        assert end <= self.max_pages_per_req, (
            f"request exceeds max context: needs page {end}, cap {self.max_pages_per_req}"
        )
        self.page_table_np[slot, start_page:end] = pages

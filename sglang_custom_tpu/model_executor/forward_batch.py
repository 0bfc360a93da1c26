"""Device-side batch metadata for a forward step.

Analog of the reference's ForwardBatch / ForwardMode
(reference: srt/model_executor/forward_batch_info.py:61,156). TPU-first
differences:

- One *unified* batch geometry ``[B, T]`` covers both EXTEND and DECODE
  (decode is simply T=1): a single traced program serves both modes, and the
  runner buckets on (B, T, kv_pages) instead of capturing CUDA graphs
  (reference: cuda_graph_runner.py:138 get_batch_sizes_to_capture).
- All fields are static-shaped, padded to the bucket; padding rows have
  ``seq_lens == 0`` and their KV writes land in the garbage page.
"""

from __future__ import annotations

import enum

import jax
from flax import struct


class ForwardMode(enum.Enum):
    EXTEND = enum.auto()
    DECODE = enum.auto()
    IDLE = enum.auto()


@struct.dataclass
class ForwardMeta:
    """Traced metadata shipped to the jitted step. Shapes fixed per bucket."""

    token_ids: jax.Array   # [B, T] int32; padding = 0
    positions: jax.Array   # [B, T] int32 absolute KV-slot position of each token
    page_table: jax.Array  # [B, PMAX] int32 page ids (garbage page 0 pads)
    seq_lens: jax.Array    # [B] int32 total tokens (incl. this step's); 0 = padding row
    extend_lens: jax.Array # [B] int32 new tokens this step (decode: 1)
    # Sliding-window layers' page table (hybrid models, e.g. Gemma): SWA
    # layers read/write through THIS table while full-attention layers use
    # ``page_table``. Same pool array — a page id's full-layer rows and
    # swa-layer rows are independently owned (mem_cache/swa_radix_cache.py
    # dual-allocator design; reference: SWAKVPool memory_pool.py:471).
    # None = single-table models (everything before this field unchanged).
    page_table_swa: jax.Array = None            # [B, PMAX] int32 or None

    # --- speculative-tree extensions (None for normal steps) ---
    # RoPE positions when decoupled from KV-slot positions: tree nodes are
    # stored at LINEAR slots (positions) but rotate at their tree DEPTH
    # (reference: build_eagle_tree.py positions tensor).
    rope_positions: jax.Array = None            # [B, T] int32 or None
    # Tree attention mask over the node region: q token t may attend node
    # region offset j iff tree_mask[t, j] (reference: tree_mask in
    # eagle_utils.cu / TARGET_VERIFY custom mask). Prefix kv (< tree_start)
    # stays fully attended; None = causal.
    tree_mask: jax.Array = None                 # [T, N] bool or None
    tree_start: jax.Array = None                # [B] int32 or None
    # --- multimodal rope (Qwen2-VL family; reference: mrope positions
    # forward_batch_info.py:484): 3-channel (t, h, w) positions for extend
    # windows that overlap image spans. None everywhere else — decode and
    # text-only steps use rope_positions = positions + mrope_delta.
    mrope_positions: jax.Array = None           # [B, 3, T] int32 or None

    @property
    def batch_size(self) -> int:
        return self.token_ids.shape[0]

    @property
    def extend_len(self) -> int:
        return self.token_ids.shape[1]

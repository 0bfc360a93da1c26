"""Expert placement (EPLB) — logical -> physical expert maps + rebalancing.

Analog of the reference's EPLB stack (reference: srt/eplb/expert_location.py:34
ExpertLocationMetadata, eplb_manager.py runtime rebalancing,
eplb_algorithms/deepseek.py hierarchical balanced packing). TPU-first:

- "Physical placement" is the order of experts inside the stacked
  ``[E, ...]`` weight arrays, which are sharded over the mesh's expert
  axis in contiguous blocks of E/num_shards. Rebalancing permutes the
  stack so each shard's total routed load is even — XLA's all-to-all then
  moves near-equal token counts per shard.
- Because the router's weight columns are permuted identically, the router
  emits *physical* ids directly: the model is bit-identical pre/post
  rebalance, only the shard load distribution changes. (This exactness
  holds for ungrouped routers — mixtral/qwen-moe; DeepSeek's group-limited
  routing ties expert ids to score groups, where remapping needs the
  logical-id indirection — future work.)
"""

from __future__ import annotations

import dataclasses
from typing import List

import numpy as np


@dataclasses.dataclass
class ExpertLocationMetadata:
    """Per-layer physical placement: physical position p holds logical
    expert ``physical_to_logical[l, p]`` (reference: expert_location.py:34)."""

    physical_to_logical: np.ndarray  # [L, E] int32
    num_shards: int

    @property
    def num_layers(self) -> int:
        return self.physical_to_logical.shape[0]

    @property
    def num_experts(self) -> int:
        return self.physical_to_logical.shape[1]

    @staticmethod
    def identity(num_layers: int, num_experts: int, num_shards: int = 1):
        return ExpertLocationMetadata(
            np.tile(np.arange(num_experts, dtype=np.int32), (num_layers, 1)),
            num_shards,
        )

    def logical_to_physical(self) -> np.ndarray:
        l2p = np.empty_like(self.physical_to_logical)
        for l in range(self.num_layers):
            l2p[l, self.physical_to_logical[l]] = np.arange(
                self.num_experts, dtype=np.int32
            )
        return l2p

    def shard_loads(self, counts: np.ndarray) -> np.ndarray:
        """[L, S] routed tokens per shard under this placement."""
        L, E = self.physical_to_logical.shape
        per_shard = E // self.num_shards
        placed = np.take_along_axis(counts, self.physical_to_logical, axis=1)
        return placed.reshape(L, self.num_shards, per_shard).sum(axis=2)


def rebalance_experts(
    counts: np.ndarray, num_shards: int
) -> ExpertLocationMetadata:
    """Balanced packing: assign each layer's experts to shards so per-shard
    routed load is even (greedy LPT — the core of the reference's
    eplb_algorithms/deepseek.py balanced packing, without redundant-expert
    replication).

    counts: [L, E] routed-token counts. Returns a placement whose
    physical order is the shard-blocked assignment.
    """
    counts = np.asarray(counts, np.int64)
    L, E = counts.shape
    assert E % num_shards == 0, (E, num_shards)
    cap = E // num_shards
    p2l = np.zeros((L, E), np.int32)
    for l in range(L):
        order = np.argsort(-counts[l], kind="stable")  # heaviest first
        loads = np.zeros(num_shards, np.int64)
        slots: List[List[int]] = [[] for _ in range(num_shards)]
        for e in order:
            # least-loaded shard with a free slot
            cands = [s for s in range(num_shards) if len(slots[s]) < cap]
            s = min(cands, key=lambda i: loads[i])
            slots[s].append(int(e))
            loads[s] += counts[l, e]
        p2l[l] = np.concatenate([np.asarray(s, np.int32) for s in slots])
    return ExpertLocationMetadata(p2l, num_shards)


def apply_placement_to_params(params: dict, meta: ExpertLocationMetadata):
    """Physically permute the stacked expert weights AND the router weight
    columns per layer (in the mixtral-family layout: layers.router [L,H,E],
    layers.{gate,up,down}_proj [L,E,..]). Returns the updated params dict.

    Exactness: softmax/top-k commute with a permutation of logits, so the
    permuted-router model computes the identical function while the
    ragged GEMMs see the new balanced physical order.
    """
    import jax.numpy as jnp

    layers = dict(params["layers"])
    p2l = jnp.asarray(meta.physical_to_logical)  # [L, E]

    def permute_stack(w):  # [L, E, ...] or quantized dict leaf
        if isinstance(w, dict):
            return {k: permute_stack(v) for k, v in w.items()}
        return jnp.take_along_axis(
            w, p2l.reshape(p2l.shape + (1,) * (w.ndim - 2)), axis=1
        )

    for key in ("gate_proj", "up_proj", "down_proj"):
        layers[key] = permute_stack(layers[key])
    # router: [L, H, E] — permute output columns
    layers["router"] = jnp.take_along_axis(
        layers["router"], p2l[:, None, :], axis=2
    )
    out = dict(params)
    out["layers"] = layers
    return out

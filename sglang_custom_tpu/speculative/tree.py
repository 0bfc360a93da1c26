"""Static speculative-tree topology.

Analog of the reference's EAGLE tree construction
(reference: srt/speculative/build_eagle_tree.py + sgl-kernel
csrc/speculative/eagle_utils.cu build_tree_kernel_efficient — which builds
a *dynamic* tree per step from cumulative draft scores). TPU-first
difference: the topology is STATIC — chosen once from (topk, depth,
budget) — so every step runs one pre-compiled executable with fixed
shapes; the greedy rank-sum order below approximates the probability
ordering the reference computes at runtime (a draft's top-0 child chain is
far more likely than deep high-rank branches).

Node indexing is "verify space": index 0 is the root (the pending token);
draft nodes are 1..n_nodes in construction order (parents always precede
children).
"""

from __future__ import annotations

import dataclasses
import heapq
from typing import List

import numpy as np


@dataclasses.dataclass
class TreeTopology:
    topk: int
    max_depth: int                 # D: deepest draft node
    parent: List[int]              # [N] verify-space parent of node i+1
    rank: List[int]                # [N] child rank at the parent
    depth: List[int]               # [N] 1-based depth of node i+1
    ancestors: np.ndarray          # [N+1, N+1] bool, ancestor-or-self
    children: np.ndarray           # [N+1, topk] verify child index, -1 pad
    levels: List[List[int]]        # verify indices per depth 1..D

    @property
    def n_nodes(self) -> int:
        return len(self.parent)

    @property
    def is_chain(self) -> bool:
        return all(r == 0 for r in self.rank)


def build_topology(topk: int, depth: int, budget: int) -> TreeTopology:
    """Greedy static tree: pop candidates by (sum of child ranks, depth)
    so the probable paths (low ranks, shallow) fill the budget first.
    ``topk=1`` degenerates to a chain of min(depth, budget) nodes."""
    assert topk >= 1 and depth >= 1 and budget >= 1
    parent, rank, dep = [], [], []
    # heap entries: (rank_sum, depth, path_ranks, parent_verify_idx, rank)
    heap = [(r, 1, (r,), 0, r) for r in range(topk)]
    heapq.heapify(heap)
    while heap and len(parent) < budget:
        rsum, d, path, p, r = heapq.heappop(heap)
        idx = len(parent) + 1  # verify index of this node
        parent.append(p)
        rank.append(r)
        dep.append(d)
        if d < depth:
            for cr in range(topk):
                heapq.heappush(
                    heap, (rsum + cr, d + 1, path + (cr,), idx, cr)
                )
    n = len(parent)
    anc = np.zeros((n + 1, n + 1), bool)
    anc[0, 0] = True
    for i in range(n):
        v = i + 1
        anc[v] = anc[parent[i]]
        anc[v, v] = True
    children = np.full((n + 1, topk), -1, np.int32)
    for i in range(n):
        children[parent[i], rank[i]] = i + 1
    max_d = max(dep)
    levels = [[i + 1 for i in range(n) if dep[i] == d]
              for d in range(1, max_d + 1)]
    return TreeTopology(
        topk=topk, max_depth=max_d, parent=parent, rank=rank, depth=dep,
        ancestors=anc, children=children, levels=levels,
    )

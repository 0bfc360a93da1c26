"""Expert distribution recorder.

Analog of the reference's recorder (reference: srt/eplb/expert_distribution.py
with modes stat/per_pass/per_token, enabled via --expert-distribution-
recorder-mode and the /expert_distribution HTTP RPCs). TPU-first: the MoE
layer already computes per-expert token counts (the ragged-GEMM group
sizes), so the recording step variant simply returns them as an extra
[L, E] output — zero cost when recording is off (separate jit cache entry;
the counts are dead-code-eliminated from the normal step).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class ExpertDistributionRecorder:
    """Accumulates per-layer per-expert routed-token counts ("stat" mode)."""

    def __init__(self, num_layers: int, num_experts: int):
        self.num_layers = num_layers
        self.num_experts = num_experts
        self.counts = np.zeros((num_layers, num_experts), np.int64)
        self.num_steps = 0
        self.recording = False

    def start(self) -> None:
        self.recording = True

    def stop(self) -> None:
        self.recording = False

    def reset(self) -> None:
        self.counts[:] = 0
        self.num_steps = 0

    def record(self, step_counts: np.ndarray) -> None:
        """step_counts: [L, E] from one forward step. Padding rows route
        their garbage tokens too; the distribution is still representative
        (padding is uniform across experts given random-ish hidden)."""
        self.counts += np.asarray(step_counts, np.int64)
        self.num_steps += 1

    def dump(self) -> dict:
        total = self.counts.sum(axis=1, keepdims=True)
        util = np.divide(
            self.counts, np.maximum(total, 1), dtype=np.float64
        )
        return {
            "num_steps": self.num_steps,
            "counts": self.counts.tolist(),
            "utilization": util.tolist(),
            # load-imbalance factor per layer: max/mean expert load
            "imbalance": (
                self.counts.max(axis=1)
                / np.maximum(self.counts.mean(axis=1), 1e-9)
            ).tolist(),
        }

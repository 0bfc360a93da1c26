"""Runtime expert-load rebalancing manager.

Capability analog of the reference's EPLB runtime
(reference: srt/eplb/eplb_manager.py EPLBManager — periodically recomputes
expert placement from the live routing distribution and rewrites expert
weights; expert_location_updater.py applies the move). TPU-first: the
"move" is a pure functional permutation of the stacked expert weight
arrays + router columns (eplb/expert_location.py
apply_placement_to_params) re-device_put under the same EP shardings —
XLA sees a new params pytree, no graph rebuild, and softmax/top-k commute
with the router permutation so serving output is bit-identical.

KV caches stay VALID across a rebalance (the model computes the identical
function), so unlike weight updates no cache flush happens.
"""

from __future__ import annotations

import threading
import time
from typing import Optional

import numpy as np

from sglang_custom_tpu.eplb.expert_distribution import (
    ExpertDistributionRecorder,
)
from sglang_custom_tpu.eplb.expert_location import (
    ExpertLocationMetadata,
    apply_placement_to_params,
    rebalance_experts,
)
from sglang_custom_tpu.utils import get_logger

logger = get_logger(__name__)


class EPLBManager:
    """Owns the recorder + current placement for one engine."""

    def __init__(self, engine, num_shards: Optional[int] = None,
                 rebalance_interval_s: float = 0.0,
                 min_recorded_steps: int = 8):
        cfg = engine.model_config
        self.engine = engine
        self.num_shards = num_shards or max(engine.runner.mesh_ctx.tp_size, 1)
        self.min_recorded_steps = min_recorded_steps
        self.recorder = ExpertDistributionRecorder(
            cfg.num_layers, cfg.num_experts
        )
        engine.runner.expert_recorder = self.recorder
        # current physical placement (physical pos -> logical expert)
        self.meta = ExpertLocationMetadata.identity(
            cfg.num_layers, cfg.num_experts, self.num_shards
        )
        self.num_rebalances = 0
        self._stop = threading.Event()
        self._thread = None
        if rebalance_interval_s > 0:
            self._thread = threading.Thread(
                target=self._auto_loop, args=(rebalance_interval_s,),
                daemon=True, name="eplb",
            )
            self._thread.start()

    # ------------------------------------------------------------- control

    def start_record(self) -> None:
        self.recorder.reset()
        self.recorder.start()

    def stop_record(self) -> None:
        self.recorder.stop()

    def dump_record(self) -> dict:
        return self.recorder.dump()

    def shutdown(self) -> None:
        self._stop.set()

    # ----------------------------------------------------------- rebalance

    def _logical_counts(self) -> np.ndarray:
        """Recorder counts are PHYSICAL positions under the current
        placement; map back to logical experts."""
        counts = self.recorder.counts
        logical = np.zeros_like(counts)
        p2l = self.meta.physical_to_logical
        for l in range(counts.shape[0]):
            np.add.at(logical[l], p2l[l], counts[l])
        return logical

    def rebalance(self) -> dict:
        """Recompute placement from recorded load and permute the expert
        weights in place. Serving pauses only for the permute."""
        if self.recorder.num_steps < self.min_recorded_steps:
            return {
                "success": False,
                "message": f"only {self.recorder.num_steps} recorded steps "
                           f"(need {self.min_recorded_steps})",
            }
        logical = self._logical_counts()
        before = self.meta.shard_loads(logical)
        new_meta = rebalance_experts(logical, self.num_shards)
        after = new_meta.shard_loads(logical)
        # relative permutation: physical position p under the NEW placement
        # takes the expert currently sitting at l2p_cur[logical_of_new_p]
        l2p_cur = self.meta.logical_to_physical()
        rel = np.take_along_axis(
            l2p_cur, new_meta.physical_to_logical, axis=1
        )
        rel_meta = ExpertLocationMetadata(rel, self.num_shards)

        eng = self.engine
        eng.scheduler_thread.pause(drain=True)
        try:
            for runner, _ in eng._replica_views():
                runner.params = apply_placement_to_params(
                    runner.params, rel_meta
                )
        finally:
            eng.scheduler_thread.resume()
        self.meta = new_meta
        self.recorder.reset()
        self.num_rebalances += 1

        def imb(loads):
            m = loads.mean(axis=1)
            return float(
                (loads.max(axis=1) / np.maximum(m, 1e-9)).mean()
            )

        res = {
            "success": True,
            "imbalance_before": round(imb(before), 4),
            "imbalance_after": round(imb(after), 4),
            "num_rebalances": self.num_rebalances,
        }
        logger.info("EPLB rebalance: %s", res)
        return res

    def _auto_loop(self, interval_s: float) -> None:
        while not self._stop.wait(interval_s):
            if (
                self.recorder.recording
                and self.recorder.num_steps >= self.min_recorded_steps
            ):
                try:
                    self.rebalance()
                except Exception:
                    logger.exception("EPLB auto-rebalance failed")

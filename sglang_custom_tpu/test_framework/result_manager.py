"""Plots + result persistence for experiments.

reference: sglang_test_framework/core/result_manager.py:18 — latency/
throughput plots and CSV summaries from MetricsCollector data.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List

from sglang_custom_tpu.test_framework.metrics_collector import MetricsCollector


class ResultManager:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)

    def save(self, name: str, collector: MetricsCollector) -> Dict:
        collector.to_csv(os.path.join(self.out_dir, f"{name}_requests.csv"))
        collector.to_json(os.path.join(self.out_dir, f"{name}_summary.json"))
        return collector.summary()

    def plot_latency_cdf(self, name: str,
                         collectors: Dict[str, MetricsCollector]) -> str:
        """Per-policy latency CDF comparison plot
        (reference: result_manager latency plots)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import numpy as np

        fig, ax = plt.subplots(figsize=(7, 4.5))
        for label, c in collectors.items():
            lats = sorted(
                r.e2e_latency for r in c.records.values()
                if r.e2e_latency is not None
            )
            if not lats:
                continue
            y = np.arange(1, len(lats) + 1) / len(lats)
            ax.plot(lats, y, label=label)
        ax.set_xlabel("end-to-end latency (s)")
        ax.set_ylabel("CDF")
        ax.legend()
        ax.grid(True, alpha=0.3)
        path = os.path.join(self.out_dir, f"{name}_latency_cdf.png")
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return path

    def plot_optimization(self, name: str, history: List[dict]) -> str:
        """Routing-probability trajectory plot
        (reference: plot_optimization_from_log.py)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import numpy as np

        probs = np.asarray([h["new_probs"] for h in history])
        fig, ax = plt.subplots(figsize=(7, 4.5))
        for i in range(probs.shape[1]):
            ax.plot(probs[:, i], label=f"worker {i}")
        ax.set_xlabel("iteration")
        ax.set_ylabel("routing probability")
        ax.legend()
        ax.grid(True, alpha=0.3)
        path = os.path.join(self.out_dir, f"{name}_probs.png")
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return path

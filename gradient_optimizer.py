"""Routing-probability gradient optimizer.

Analog of the fork's gradient_optimizer.py:24 GradientOptimizer: run the
router with the fixed-probability policy, measure a benchmark episode per
perturbed probability vector, estimate the numerical gradient of the
objective (latency or throughput) w.r.t. the routing probabilities, and do
projected gradient ascent on the simplex
(reference: gradient_optimizer.py, run_gradient_optimization.sh,
sgl-router/src/policies/fixed_probability.rs).

Usage (workers already running):
  python gradient_optimizer.py --workers http://127.0.0.1:30001 \
      --workers http://127.0.0.1:30002 --iters 5 --episode-requests 32
"""

from __future__ import annotations

import argparse
import asyncio
import json
from typing import Callable, List, Optional

import numpy as np


def project_simplex(p: np.ndarray) -> np.ndarray:
    """Euclidean projection onto the probability simplex
    (reference: gradient_optimizer.py project_to_simplex)."""
    u = np.sort(p)[::-1]
    css = np.cumsum(u)
    rho = np.nonzero(u * np.arange(1, len(p) + 1) > (css - 1))[0][-1]
    theta = (css[rho] - 1) / (rho + 1.0)
    return np.maximum(p - theta, 0.0)


class GradientOptimizer:
    def __init__(
        self,
        workers: List[str],
        objective: str = "latency",     # latency (minimize) | throughput (max)
        lr: float = 0.2,
        epsilon: float = 0.05,          # finite-difference perturbation
        episode_requests: int = 32,
        request_rate: float = 8.0,
        input_len: int = 64,
        output_len: int = 32,
        router_port: Optional[int] = None,
        episode_fn: Optional[Callable[[np.ndarray], float]] = None,
    ):
        self.workers = workers
        self.objective = objective
        self.lr = lr
        self.eps = epsilon
        self.episode_requests = episode_requests
        self.request_rate = request_rate
        self.input_len = input_len
        self.output_len = output_len
        self.router_port = router_port
        self.episode_fn = episode_fn or self._run_episode
        self.history: List[dict] = []

    # ------------------------------------------------------------ episodes

    def _run_episode(self, probs: np.ndarray) -> float:
        """Launch router with `probs`, run a load episode, return the
        objective value (higher is better)."""
        from sglang_custom_tpu.router import launch_router
        from sglang_custom_tpu.test_framework.server_manager import free_port

        port = self.router_port or free_port()
        handle = launch_router(
            port, self.workers, policy="fixed_probability",
            probs=[float(x) for x in probs],
        )
        try:
            import bench_serving

            args = argparse.Namespace(
                base_url=handle.base_url,
                num_prompts=self.episode_requests,
                request_rate=self.request_rate,
                input_len=self.input_len,
                output_len=self.output_len,
                vocab_size=32000,
                seed=len(self.history),
            )
            collector = asyncio.run(bench_serving.run_benchmark(args))
            s = collector.summary()
            if self.objective == "throughput":
                return s["output_token_throughput_tps"] or 0.0
            return -(s["mean_e2e_latency_s"] or 1e9)
        finally:
            handle.shutdown()

    # ---------------------------------------------------------- optimization

    def estimate_gradient(self, probs: np.ndarray) -> np.ndarray:
        """Central finite differences along simplex-tangent directions
        (reference: gradient estimation in gradient_optimizer.py)."""
        n = len(probs)
        grad = np.zeros(n)
        base = self.episode_fn(probs)
        for i in range(n):
            d = -np.ones(n) / (n - 1)
            d[i] = 1.0  # tangent: raise i, lower others uniformly
            p_plus = project_simplex(probs + self.eps * d)
            grad_i = (self.episode_fn(p_plus) - base) / self.eps
            grad[i] = grad_i
        return grad

    def step(self, probs: np.ndarray) -> np.ndarray:
        g = self.estimate_gradient(probs)
        new = project_simplex(probs + self.lr * g)
        self.history.append(
            {"probs": probs.tolist(), "grad": g.tolist(),
             "new_probs": new.tolist()}
        )
        return new

    def optimize(self, iters: int = 5,
                 init: Optional[np.ndarray] = None) -> np.ndarray:
        probs = (
            np.asarray(init, float)
            if init is not None
            else np.ones(len(self.workers)) / len(self.workers)
        )
        for it in range(iters):
            probs = self.step(probs)
            print(f"iter {it}: probs={np.round(probs, 3).tolist()}")
        return probs


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workers", action="append", required=True)
    p.add_argument("--objective", default="latency",
                   choices=["latency", "throughput"])
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--lr", type=float, default=0.2)
    p.add_argument("--epsilon", type=float, default=0.05)
    p.add_argument("--episode-requests", type=int, default=32)
    p.add_argument("--request-rate", type=float, default=8.0)
    p.add_argument("--out", default="gradient_optimization_log.json")
    args = p.parse_args()

    opt = GradientOptimizer(
        workers=args.workers, objective=args.objective, lr=args.lr,
        epsilon=args.epsilon, episode_requests=args.episode_requests,
        request_rate=args.request_rate,
    )
    final = opt.optimize(iters=args.iters)
    with open(args.out, "w") as f:
        json.dump({"final_probs": final.tolist(), "history": opt.history}, f,
                  indent=2)
    print("final probs:", final.tolist())


if __name__ == "__main__":
    main()

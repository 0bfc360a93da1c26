"""Prometheus metrics collectors.

Analog of the reference's metrics layer
(reference: srt/metrics/collector.py:151 SchedulerMetricsCollector —
running/queued requests, token usage, cache hit rate gauges; :309
TokenizerMetricsCollector — TTFT :536 / ITL :539 / e2e histograms,
prompt/generation token counters). Exposed via /metrics
(entrypoints/http_server.py).
"""

from __future__ import annotations

import time
from typing import Dict, Optional

from prometheus_client import (
    CollectorRegistry,
    Counter,
    Gauge,
    Histogram,
    generate_latest,
)

_TTFT_BUCKETS = (
    0.05, 0.1, 0.2, 0.4, 0.6, 0.8, 1, 2, 4, 6, 8, 10, 20, 40, 60,
)
_ITL_BUCKETS = (
    0.002, 0.004, 0.006, 0.008, 0.01, 0.02, 0.04, 0.06, 0.08, 0.1,
    0.2, 0.4, 0.8, 1.6,
)
_E2E_BUCKETS = (0.1, 0.2, 0.4, 0.8, 1.6, 3.2, 6.4, 12.8, 25.6, 51.2, 102.4)


class SchedulerMetricsCollector:
    """Gauges sampled from scheduler state each scrape
    (reference: collector.py:151)."""

    def __init__(self, registry: Optional[CollectorRegistry] = None,
                 labels: Optional[Dict[str, str]] = None):
        self.registry = registry or CollectorRegistry()
        self.labels = labels or {}
        ln = list(self.labels.keys())
        self.num_running_reqs = Gauge(
            "sglang_tpu:num_running_reqs", "running requests", ln,
            registry=self.registry)
        self.num_queue_reqs = Gauge(
            "sglang_tpu:num_queue_reqs", "queued requests", ln,
            registry=self.registry)
        self.token_usage = Gauge(
            "sglang_tpu:token_usage", "KV pool utilization", ln,
            registry=self.registry)
        self.cache_hit_rate = Gauge(
            "sglang_tpu:cache_hit_rate", "prefix cache hit rate", ln,
            registry=self.registry)
        self.gen_throughput = Gauge(
            "sglang_tpu:gen_throughput", "decode tokens/s", ln,
            registry=self.registry)
        self.num_retractions = Gauge(
            "sglang_tpu:num_retractions", "retracted requests", ln,
            registry=self.registry)
        self._last_gen = (time.monotonic(), 0)

    def _g(self, gauge):
        return gauge.labels(**self.labels) if self.labels else gauge

    def sample(self, scheduler) -> None:
        s = scheduler
        self._g(self.num_running_reqs).set(len(s.running_batch))
        self._g(self.num_queue_reqs).set(len(s.waiting_queue))
        total_pages = s.allocator.num_pages
        used = total_pages - s.allocator.available_pages
        self._g(self.token_usage).set(used / max(total_pages, 1))
        denom = s.num_prefill_tokens + s.num_cached_tokens
        self._g(self.cache_hit_rate).set(
            s.num_cached_tokens / denom if denom else 0.0
        )
        self._g(self.num_retractions).set(s.num_retractions)
        now = time.monotonic()
        t0, n0 = self._last_gen
        if now > t0 + 1e-3:
            self._g(self.gen_throughput).set(
                (s.num_generated_tokens - n0) / (now - t0)
            )
        self._last_gen = (now, s.num_generated_tokens)

    def render(self, scheduler) -> bytes:
        self.sample(scheduler)
        return generate_latest(self.registry)


class TokenizerMetricsCollector:
    """Per-request latency histograms + token counters
    (reference: collector.py:309)."""

    def __init__(self, registry: Optional[CollectorRegistry] = None):
        self.registry = registry or CollectorRegistry()
        self.prompt_tokens = Counter(
            "sglang_tpu:prompt_tokens_total", "prompt tokens",
            registry=self.registry)
        self.generation_tokens = Counter(
            "sglang_tpu:generation_tokens_total", "generated tokens",
            registry=self.registry)
        self.cached_tokens = Counter(
            "sglang_tpu:cached_tokens_total", "prefix-cache hit tokens",
            registry=self.registry)
        self.num_requests = Counter(
            "sglang_tpu:num_requests_total", "finished requests",
            registry=self.registry)
        self.num_aborted = Counter(
            "sglang_tpu:num_aborted_requests_total", "aborted requests",
            registry=self.registry)
        self.ttft = Histogram(
            "sglang_tpu:time_to_first_token_seconds", "TTFT",
            buckets=_TTFT_BUCKETS, registry=self.registry)
        self.itl = Histogram(
            "sglang_tpu:inter_token_latency_seconds", "ITL",
            buckets=_ITL_BUCKETS, registry=self.registry)
        self.e2e = Histogram(
            "sglang_tpu:e2e_request_latency_seconds", "end-to-end latency",
            buckets=_E2E_BUCKETS, registry=self.registry)

    def observe_finished(self, req) -> None:
        self.num_requests.inc()
        self.prompt_tokens.inc(req.prompt_len)
        self.generation_tokens.inc(len(req.output_ids))
        self.cached_tokens.inc(req.cached_tokens)
        from sglang_custom_tpu.managers.schedule_batch import FinishReason

        if req.finish_reason == FinishReason.ABORT:
            self.num_aborted.inc()
        end = req.finished_time or time.monotonic()
        self.e2e.observe(max(end - req.arrival_time, 0.0))
        if req.first_token_time is not None:
            self.ttft.observe(max(req.first_token_time - req.arrival_time, 0.0))
            n = len(req.output_ids)
            if n > 1:
                self.itl.observe(
                    max(end - req.first_token_time, 0.0) / (n - 1)
                )

    def render(self) -> bytes:
        return generate_latest(self.registry)

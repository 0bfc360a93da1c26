"""Per-request lifecycle metrics + aggregation + export.

reference: sglang_test_framework/core/metrics_collector.py:93
MetricsCollector (per-request lifecycle, per-worker aggregation, CSV/JSON
export) and the fork's bench_serving_new per-request CSV.
"""

from __future__ import annotations

import csv
import dataclasses
import json
import threading
import time
from typing import Dict, List, Optional

import numpy as np


@dataclasses.dataclass
class RequestRecord:
    rid: str
    worker: str = ""
    send_time: float = 0.0
    first_token_time: Optional[float] = None
    end_time: Optional[float] = None
    prompt_tokens: int = 0
    completion_tokens: int = 0
    cached_tokens: int = 0
    ok: bool = True
    error: str = ""

    @property
    def ttft(self) -> Optional[float]:
        if self.first_token_time is None:
            return None
        return self.first_token_time - self.send_time

    @property
    def e2e_latency(self) -> Optional[float]:
        if self.end_time is None:
            return None
        return self.end_time - self.send_time

    @property
    def itl(self) -> Optional[float]:
        if (self.first_token_time is None or self.end_time is None
                or self.completion_tokens <= 1):
            return None
        return (self.end_time - self.first_token_time) / (
            self.completion_tokens - 1
        )


class MetricsCollector:
    def __init__(self):
        self.records: Dict[str, RequestRecord] = {}
        self._lock = threading.Lock()
        self.start_time = time.monotonic()

    def on_send(self, rid: str, prompt_tokens: int, worker: str = "") -> None:
        with self._lock:
            self.records[rid] = RequestRecord(
                rid=rid, worker=worker, send_time=time.monotonic(),
                prompt_tokens=prompt_tokens,
            )

    def on_first_token(self, rid: str) -> None:
        with self._lock:
            r = self.records.get(rid)
            if r and r.first_token_time is None:
                r.first_token_time = time.monotonic()

    def on_finish(self, rid: str, completion_tokens: int,
                  cached_tokens: int = 0, ok: bool = True,
                  error: str = "") -> None:
        with self._lock:
            r = self.records.get(rid)
            if r:
                r.end_time = time.monotonic()
                r.completion_tokens = completion_tokens
                r.cached_tokens = cached_tokens
                r.ok = ok
                r.error = error

    # ------------------------------------------------------------ analysis

    def summary(self) -> Dict:
        with self._lock:
            recs = [r for r in self.records.values() if r.end_time]
        if not recs:
            return {"num_finished": 0}
        dur = max(r.end_time for r in recs) - min(r.send_time for r in recs)
        ttfts = [r.ttft for r in recs if r.ttft is not None]
        itls = [r.itl for r in recs if r.itl is not None]
        lats = [r.e2e_latency for r in recs]
        gen_tokens = sum(r.completion_tokens for r in recs)

        def pct(xs, q):
            return float(np.percentile(xs, q)) if xs else None

        ilens = [r.prompt_tokens for r in recs]
        olens = [r.completion_tokens for r in recs]
        return {
            "num_finished": len(recs),
            "num_failed": sum(1 for r in recs if not r.ok),
            "duration_s": dur,
            "request_throughput_rps": len(recs) / max(dur, 1e-9),
            "output_token_throughput_tps": gen_tokens / max(dur, 1e-9),
            "total_token_throughput_tps": (
                (gen_tokens + sum(ilens)) / max(dur, 1e-9)
            ),
            "mean_input_len": float(np.mean(ilens)),
            "p50_input_len": pct(ilens, 50),
            "p95_input_len": pct(ilens, 95),
            "mean_output_len": float(np.mean(olens)),
            "mean_ttft_s": float(np.mean(ttfts)) if ttfts else None,
            "p50_ttft_s": pct(ttfts, 50),
            "p90_ttft_s": pct(ttfts, 90),
            "p95_ttft_s": pct(ttfts, 95),
            "p99_ttft_s": pct(ttfts, 99),
            "mean_itl_s": float(np.mean(itls)) if itls else None,
            "p50_itl_s": pct(itls, 50),
            "p90_itl_s": pct(itls, 90),
            "p95_itl_s": pct(itls, 95),
            "p99_itl_s": pct(itls, 99),
            "mean_e2e_latency_s": float(np.mean(lats)),
            "p50_e2e_latency_s": pct(lats, 50),
            "p90_e2e_latency_s": pct(lats, 90),
            "p95_e2e_latency_s": pct(lats, 95),
            "p99_e2e_latency_s": pct(lats, 99),
        }

    def per_worker(self) -> Dict[str, Dict]:
        with self._lock:
            groups: Dict[str, List[RequestRecord]] = {}
            for r in self.records.values():
                if r.end_time:
                    groups.setdefault(r.worker, []).append(r)
        out = {}
        for w, recs in groups.items():
            lats = [r.e2e_latency for r in recs]
            out[w] = {
                "num_finished": len(recs),
                "mean_e2e_latency_s": float(np.mean(lats)),
                "completion_tokens": sum(r.completion_tokens for r in recs),
            }
        return out

    # -------------------------------------------------------------- export

    def to_csv(self, path: str) -> None:
        cols = ["rid", "worker", "send_time", "first_token_time", "end_time",
                "prompt_tokens", "completion_tokens", "cached_tokens",
                "ttft", "itl", "e2e_latency", "ok", "error"]
        with self._lock:
            recs = list(self.records.values())
        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(cols)
            for r in recs:
                w.writerow([
                    r.rid, r.worker, r.send_time, r.first_token_time,
                    r.end_time, r.prompt_tokens, r.completion_tokens,
                    r.cached_tokens, r.ttft, r.itl, r.e2e_latency, r.ok,
                    r.error,
                ])

    def to_fork_csv(self, path: str) -> None:
        """Per-request CSV in the FORK's schema (reference: repo-root
        router_test_*.csv header), so the fork's plotting/analysis
        pipelines consume our runs unchanged. Server-internal queue
        timings the HTTP client cannot observe are left 0."""
        cols = [
            "req_id", "input_length", "decode_length", "arrival_time",
            "to_server_time", "finish_time", "server_latency",
            "total_latency", "ttft", "queue_time", "queue_time_in_server",
            "pure_queue_time", "success", "error", "host",
            "server_created_time", "server_first_token_time",
            "queue_time_start", "queue_time_end",
        ]
        with self._lock:
            recs = list(self.records.values())
        t0 = min((r.send_time for r in recs), default=0.0)
        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(cols)
            for r in recs:
                arr = r.send_time - t0
                fin = (r.end_time - t0) if r.end_time else ""
                lat = r.e2e_latency if r.e2e_latency is not None else ""
                w.writerow([
                    r.rid, r.prompt_tokens, r.completion_tokens, arr,
                    arr, fin, lat, lat,
                    r.ttft if r.ttft is not None else "",
                    0.0, 0.0, 0.0, r.ok, r.error, r.worker,
                    arr, (r.first_token_time - t0)
                    if r.first_token_time else "", 0.0, 0.0,
                ])

    def to_json(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(
                {"summary": self.summary(), "per_worker": self.per_worker()},
                f, indent=2,
            )

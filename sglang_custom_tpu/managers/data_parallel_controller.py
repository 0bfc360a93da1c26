"""Data-parallel serving: independent replicas behind one Engine.

Analog of the reference's DataParallelController (reference:
srt/managers/data_parallel_controller.py:57 — spawns per-replica TP
process groups and balances requests round-robin / shortest-queue
:249,266). TPU-first re-design: replicas are not subprocesses — each is a
(ModelRunner, Scheduler, SchedulerThread) triple over its own tp-sized
sub-mesh inside this process, sharing nothing but the weights on disk.
Each replica runs its own continuous-batching loop, radix cache, and
retraction; the controller only routes requests and fans out control
RPCs. It exposes the SchedulerThread interface, so the Engine and HTTP
server are replica-count agnostic.

Balancing policies (server_args.dp_balance_policy):
- ``round_robin``      — reference default (:249)
- ``shortest_queue``   — fewest queued+running requests (:266)

Cache-aware replica affinity lives one level up, in the C++ router's
radix-tree policy (router/src/policies) — the in-process radix trees
belong to their scheduler threads and must not be probed cross-thread.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass
from typing import Any, Dict, List, Optional

from sglang_custom_tpu.managers.schedule_batch import Req
from sglang_custom_tpu.managers.scheduler import Scheduler
from sglang_custom_tpu.managers.tokenizer_manager import ReqState, SchedulerThread
from sglang_custom_tpu.utils import get_logger

logger = get_logger(__name__)


@dataclass
class Replica:
    index: int
    runner: Any          # ModelRunner
    scheduler: Scheduler
    thread: SchedulerThread

    def queue_depth(self) -> int:
        s = self.scheduler
        return len(s.waiting_queue) + len(s.running_batch) + len(s.inflight)


class DataParallelController:
    """Routes requests to dp replicas; fans out control-plane calls."""

    def __init__(self, replicas: List[Replica], policy: str = "shortest_queue"):
        assert policy in ("round_robin", "shortest_queue"), policy
        self.replicas = replicas
        self.policy = policy
        self._rr = 0
        self._lock = threading.Lock()
        self._rid_to_replica: Dict[str, int] = {}

    # --------------------------------------------------------------- routing

    def _pick(self) -> Replica:
        if self.policy == "round_robin":
            with self._lock:
                i = self._rr % len(self.replicas)
                self._rr += 1
            return self.replicas[i]
        # shortest_queue: snapshot read of host-side lengths (GIL-atomic
        # enough — staleness only costs balance, never correctness).
        return min(self.replicas, key=lambda r: r.queue_depth())

    # ------------------------------------------- SchedulerThread interface

    def submit(self, req: Req) -> ReqState:
        replica = self._pick()
        with self._lock:
            self._rid_to_replica[req.rid] = replica.index
        return replica.thread.submit(req)

    def abort(self, rid: str) -> None:
        with self._lock:
            idx = self._rid_to_replica.get(rid)
        if idx is not None:
            self.replicas[idx].thread.abort(rid)
        else:
            for r in self.replicas:
                r.thread.abort(rid)

    def pause(self, drain: bool = True, timeout: float = 120.0) -> None:
        for r in self.replicas:
            r.thread.pause(drain=drain, timeout=timeout)

    def resume(self) -> None:
        for r in self.replicas:
            r.thread.resume()

    def shutdown(self) -> None:
        for r in self.replicas:
            r.thread.shutdown()

    def stats(self) -> Dict[str, Any]:
        per = [r.thread.stats() for r in self.replicas]
        agg: Dict[str, Any] = {}
        for k in per[0]:
            try:
                agg[k] = sum(p[k] for p in per)
            except TypeError:
                agg[k] = per[0][k]
        agg["dp_size"] = len(self.replicas)
        agg["per_replica"] = per
        return agg

    # ------------------------------------------------------------ fan-outs

    def for_each_scheduler(self, fn) -> list:
        return [fn(r.scheduler) for r in self.replicas]

    def for_each_runner(self, fn) -> list:
        return [fn(r.runner) for r in self.replicas]


def build_replicas(
    server_args,
    model_config,
    devices,
    tokenizer=None,
    num_pages: Optional[int] = None,
) -> List[Replica]:
    """Construct dp_size replicas, each over a contiguous tp-sized device
    slice (TP inside a replica rides the fastest ICI; replicas stack
    above, matching parallel/mesh.py's axis order)."""
    import jax.numpy as jnp

    from sglang_custom_tpu.model_executor.model_runner import ModelRunner
    from sglang_custom_tpu.model_loader.loader import (
        load_dummy_weights,
        load_weights,
    )
    from sglang_custom_tpu.parallel.mesh import create_mesh

    tp, dp = server_args.tp_size, server_args.dp_size
    if len(devices) < tp * dp:
        raise ValueError(
            f"need {tp * dp} devices for dp={dp} x tp={tp}, have {len(devices)}"
        )
    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
             "float16": jnp.float16}[server_args.dtype]
    replicas = []
    for i in range(dp):
        sub = list(devices[i * tp : (i + 1) * tp])
        mesh_ctx = create_mesh(tp_size=tp, dp_size=1, devices=sub)
        if server_args.load_format == "dummy":
            params = load_dummy_weights(
                model_config, mesh_ctx, dtype=dtype,
                quantization=server_args.quantization,
            )
        else:
            params = load_weights(
                server_args.model_path, model_config, mesh_ctx,
                dtype=dtype, quantization=server_args.quantization,
            )
        runner = ModelRunner(
            server_args, model_config, params, mesh_ctx, num_pages=num_pages
        )
        scheduler = Scheduler(server_args, runner, tokenizer)
        thread = SchedulerThread(
            scheduler, tokenizer, stream_interval=server_args.stream_interval
        )
        replicas.append(Replica(i, runner, scheduler, thread))
        logger.info("dp replica %d ready on %s", i, sub)
    return replicas

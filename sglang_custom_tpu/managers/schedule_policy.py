"""Scheduling policy: waiting-queue priority + prefill admission budget.

Analog of the reference's SchedulePolicy / PrefillAdder
(reference: srt/managers/schedule_policy.py:62-75 priority modes, :271
PrefillAdder, :495 add_one_req, :382 add_chunked_req).
"""

from __future__ import annotations

import random
from typing import List

from sglang_custom_tpu.managers.schedule_batch import Req


class SchedulePolicy:
    """Orders the waiting queue. `lpm` = longest-prefix-match first (cache
    aware), `fcfs` = arrival order, `lof` = longest output first, `random`."""

    def __init__(self, policy: str, tree_cache):
        self.policy = policy
        self.tree_cache = tree_cache

    def calc_priority(self, waiting_queue: List[Req]) -> None:
        if self.policy == "fcfs":
            waiting_queue.sort(key=lambda r: r.arrival_time)
        elif self.policy == "lpm":
            # Pure prefix-length probe for sorting only — match_prefix
            # would split nodes and (hierarchical cache) promote tiers.
            for r in waiting_queue:
                r.cached_tokens = self.tree_cache.match_len(r.fill_ids)
            waiting_queue.sort(
                key=lambda r: (-r.cached_tokens, r.arrival_time)
            )
        elif self.policy == "lof":
            waiting_queue.sort(
                key=lambda r: (-r.sampling_params.max_new_tokens, r.arrival_time)
            )
        elif self.policy == "random":
            random.shuffle(waiting_queue)
        else:
            raise ValueError(f"unknown schedule policy {self.policy}")


class PrefillBudget:
    """Token/memory budget for one prefill batch (PrefillAdder analog)."""

    def __init__(self, max_prefill_tokens: int, max_batch_size: int):
        self.rem_tokens = max_prefill_tokens
        self.rem_reqs = max_batch_size

    def can_add(self) -> bool:
        return self.rem_tokens > 0 and self.rem_reqs > 0

    def take(self, tokens: int) -> None:
        self.rem_tokens -= tokens
        self.rem_reqs -= 1

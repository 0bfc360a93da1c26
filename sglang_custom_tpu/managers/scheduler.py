"""Continuous-batching scheduler.

Analog of the reference's Scheduler (reference: srt/managers/scheduler.py:225
— event loops :797/:819, intake :1094, get_new_batch_prefill :1673, decode
update :1828, run_batch :1868, retraction via retract_decode
schedule_batch.py:1362). TPU-first differences:

- **Single-controller**: one scheduler drives the whole mesh; there is no
  per-rank process tree, no ZMQ broadcast of batch plans (engine.py:685's
  process topology collapses — SURVEY.md §7 design stance).
- Prefill admission, page allocation, radix-tree ops are all host-side
  Python/numpy; the device only ever sees padded page tables.
"""

from __future__ import annotations

from typing import List, Optional

from sglang_custom_tpu.config.server_args import ServerArgs
from sglang_custom_tpu.managers.schedule_batch import (
    FinishReason,
    HostBatch,
    Req,
    ReqStatus,
    build_batch,
)
from sglang_custom_tpu.managers.schedule_policy import PrefillBudget, SchedulePolicy
from sglang_custom_tpu.mem_cache.allocator import PageAllocator
from sglang_custom_tpu.mem_cache.chunk_cache import ChunkCache
from sglang_custom_tpu.mem_cache.radix_cache import RadixCache
from sglang_custom_tpu.model_executor.model_runner import ModelRunner
from sglang_custom_tpu.utils import get_logger

logger = get_logger(__name__)


class Scheduler:
    def __init__(
        self,
        server_args: ServerArgs,
        model_runner: ModelRunner,
        tokenizer=None,
        spec_runner=None,
    ):
        self.server_args = server_args
        self.runner = model_runner
        self.tokenizer = tokenizer  # for grammar jump-forward retokenization
        self.spec = spec_runner  # speculative worker (eagle_worker.py)
        self.page_size = server_args.page_size

        self.allocator = PageAllocator(model_runner.num_pages, self.page_size)
        if server_args.disable_radix_cache:
            self.tree_cache = ChunkCache(self.page_size, self.allocator.free)
        elif server_args.enable_hierarchical_cache:
            from sglang_custom_tpu.mem_cache.hiradix_cache import HiRadixCache

            host_pages = server_args.hicache_host_pages or int(
                model_runner.num_pages * server_args.hicache_ratio
            )
            self.tree_cache = HiRadixCache(
                self.page_size,
                self.allocator.free,
                self.allocator.alloc,
                model_runner.kv_pool,
                host_pages,
                storage_dir=server_args.hicache_storage_dir,
            )
        else:
            self.tree_cache = RadixCache(self.page_size, self.allocator.free)
        if getattr(server_args, "enable_kv_events", False):
            self.tree_cache.enable_events = True
        # SWA dual-table state for hybrid sliding-window models
        # (mem_cache/swa_radix_cache.py; reference: SWAKVPool +
        # swa_radix_cache.py). Active only with the plain radix tree and
        # a model that routes per-layer tables (models/gemma.py).
        self.swa = None
        cfg = model_runner.cfg
        if (
            cfg.sliding_window
            and getattr(model_runner.model, "SUPPORTS_SWA_TABLES", False)
            and isinstance(self.tree_cache, RadixCache)
            and type(self.tree_cache) is RadixCache
            and spec_runner is None
        ):
            from sglang_custom_tpu.mem_cache.swa_radix_cache import SWAState

            self.swa = SWAState(
                model_runner.num_pages, self.page_size, cfg.sliding_window
            )
            logger.info(
                "SWA dual-table cache active: window=%d", cfg.sliding_window
            )
        self.policy = SchedulePolicy(server_args.schedule_policy, self.tree_cache)

        self.waiting_queue: List[Req] = []
        self.running_batch: List[Req] = []
        self.chunked_req: Optional[Req] = None

        # Overlap scheduler (reference: TpModelWorkerClient,
        # tp_worker_overlap_thread.py:53): in-flight dispatched batches,
        # collected one step behind; device-side token slots carry the
        # feedback loop. Disabled for speculative decoding (the spec worker
        # maintains no slot state).
        from collections import deque

        self.inflight = deque()
        self.enable_overlap = (
            not server_args.disable_overlap_schedule and spec_runner is None
        )
        # Slot 0 is scratch for padding rows.
        self._free_slots = list(range(model_runner.num_tok_slots - 1, 0, -1))

        # Stats (reference: SchedulerMetricsCollector gauges)
        self.num_generated_tokens = 0
        self.num_prefill_tokens = 0
        self.num_retractions = 0
        self.num_cached_tokens = 0

    # ------------------------------------------------------------- intake

    def add_request(self, req: Req) -> None:
        assert req.status == ReqStatus.WAITING
        if req.prompt_len >= self.runner.context_len:
            req.status = ReqStatus.ABORTED
            req.finish_reason = FinishReason.LENGTH
            logger.warning("req %s prompt longer than context; aborted", req.rid)
            return
        # Hierarchical cache: start storage->host promotion of this prompt's
        # prefix on the IO worker now, so admission-time match_prefix finds
        # DRAM-ready data (mem_cache/hiradix_cache.py prefetch).
        prefetch = getattr(self.tree_cache, "prefetch", None)
        if prefetch is not None:
            prefetch(req.input_ids)
        self.waiting_queue.append(req)

    def abort_request(self, rid: str) -> bool:
        for r in self.waiting_queue:
            if r.rid == rid:
                r.status = ReqStatus.ABORTED
                r.finish_reason = FinishReason.ABORT
                self.waiting_queue.remove(r)
                return True
        for r in self.running_batch:
            if r.rid == rid:
                r.status = ReqStatus.ABORTED
                r.finish_reason = FinishReason.ABORT
                self._release_req_kv(r)
                self.running_batch.remove(r)
                return True
        return False

    @property
    def has_work(self) -> bool:
        return bool(
            self.waiting_queue
            or self.running_batch
            or self.chunked_req
            or self.inflight
        )

    # ------------------------------------------------------------- main loop

    def step(self) -> List[Req]:
        """One scheduler iteration. Returns requests that produced a token
        or finished this step (for streaming).

        Overlap mode: hot batches are DISPATCHED without waiting; the
        previous in-flight batch is collected while the device runs this
        one. Cold batches (penalties/grammar/logprobs/LoRA/multimodal/
        embedding/spec) drain the pipeline first and run synchronously —
        the same bypass set as the reference's overlap scheduler."""
        batch = self._get_next_batch()
        if batch is None:
            return self._collect_one() if self.inflight else []

        recording = (
            self.runner.expert_recorder is not None
            and self.runner.expert_recorder.recording
        )
        if (
            self.enable_overlap
            and self.runner.is_hot_batch(batch)
            and not self.runner.wants_ring(batch)
            and not batch.spec
            # expert-distribution recording runs the synchronous recorded
            # executable (model_runner._step_recorded); the hot packed
            # path has no counts output (eplb/expert_distribution.py)
            and not recording
        ):
            self._mark_dispatched(batch)
            handle = self.runner.forward_hot_async(batch)
            self.inflight.append((batch, handle))
            if len(self.inflight) >= self.server_args.overlap_inflight:
                return self._collect_one()
            return []

        updated = self._drain_inflight()
        if updated and not batch.is_extend:
            # Draining moved host state (tokens landed, rows may have
            # finished); a cold DECODE batch was built against virtual
            # state — rebuild it against the settled state. (Extend
            # batches are safe: their rows were just admitted and carry no
            # in-flight state, and rebuilding would lose the admissions.)
            batch = self._get_next_batch()
            if batch is None:
                return updated
        valid = None
        if (
            self.spec is not None
            and not batch.is_embed
            and batch.mm_override is None
        ):
            if batch.is_extend and batch.lora_ids is None:
                tokens, logprobs = self.spec.prefill(batch)
            elif getattr(batch, "spec", False):
                tokens, logprobs, valid = self.spec.decode(batch)
            else:
                tokens, logprobs = self.runner.forward(batch)
        else:
            tokens, logprobs = self.runner.forward(batch)
        return updated + self._process_result(batch, tokens, logprobs, valid)

    def _mark_dispatched(self, batch: HostBatch) -> None:
        """Advance virtual request state for an overlapped dispatch."""
        batch.overlap = True
        for i, r in enumerate(batch.reqs):
            if batch.is_extend:
                e = int(batch.extend_lens[i])
                r.inflight_computed += e
                if not batch.chunked[i]:
                    r.inflight_tokens += 1
                    # The row joins continuous decode immediately — its
                    # feedback token lives in the device slot table.
                    if r.status == ReqStatus.RUNNING and r not in self.running_batch:
                        self.running_batch.append(r)
            else:
                r.inflight_computed += batch.burst
                r.inflight_tokens += batch.burst

    def _collect_one(self) -> List[Req]:
        batch, handle = self.inflight.popleft()
        tokens, logprobs = self.runner.collect_hot(handle)
        return self._process_result(batch, tokens, logprobs, None)

    def _drain_inflight(self) -> List[Req]:
        updated: List[Req] = []
        while self.inflight:
            updated.extend(self._collect_one())
        return updated

    # ------------------------------------------------------- batch formation

    def _get_next_batch(self) -> Optional[HostBatch]:
        # Prefill has priority (reference: get_next_batch_to_run :1608).
        batch = self._get_prefill_batch()
        if batch is not None:
            return batch
        return self._get_decode_batch()

    def _get_prefill_batch(self) -> Optional[HostBatch]:
        reqs: List[Req] = []
        extend_lens: List[int] = []

        # A mid-flight chunked request always continues first
        # (reference: PrefillAdder.add_chunked_req :382).
        budget = PrefillBudget(
            self.server_args.max_prefill_tokens,
            self.server_args.max_running_requests - len(self.running_batch),
        )
        if self.chunked_req is not None:
            r = self.chunked_req
            remaining = len(r.fill_ids) - r.virtual_computed
            ext = min(remaining, self.server_args.chunked_prefill_size,
                      budget.rem_tokens)
            if ext > 0 and self._extend_req_pages(r, ext):
                reqs.append(r)
                extend_lens.append(ext)
                budget.take(ext)
                if ext == remaining:
                    r.is_chunked = False
                    self.chunked_req = None
            # If pages can't be allocated, fall through: decode will retract.

        if self.chunked_req is None:
            self.policy.calc_priority(self.waiting_queue)
            admitted = []
            for r in self.waiting_queue:
                if not budget.can_add():
                    break
                if not self._admit_req(r, budget, reqs, extend_lens):
                    break
                admitted.append(r)
                if r.is_chunked:
                    # Only one chunked request per batch; it must be last.
                    break
            for r in admitted:
                self.waiting_queue.remove(r)

        if not reqs:
            return None
        for r in reqs:
            r.status = ReqStatus.RUNNING
        return build_batch(
            reqs, extend_lens, self.page_size, self.runner.cfg.vocab_size,
            is_extend=True, virtual=self.enable_overlap,
        )

    def _admit_req(
        self,
        r: Req,
        budget: PrefillBudget,
        reqs: List[Req],
        extend_lens: List[int],
    ) -> bool:
        """Match prefix, allocate pages, and add to the prefill batch.
        Returns False to stop admission (memory or budget pressure).

        Penalties, input logprobs, and LoRA compose in one executable
        (_step_cold); only embedding batches and the multimodal-injection
        step remain separate executables and must not mix."""
        if reqs and r.is_embedding != reqs[0].is_embedding:
            # Embedding batches run a pooled-hidden executable; never mix
            # them with generation rows (reference: is_generation split).
            return False
        wants_mm = r.mm_positions is not None
        if reqs:
            has_pen = any(
                x.sampling_params.needs_penalties or x.grammar is not None
                for x in reqs
            )
            has_ilp = any(
                x.sampling_params.return_input_logprob for x in reqs
            )
            has_mm = any(x.mm_positions is not None for x in reqs)
            has_lora = any(x.lora_slot for x in reqs)
            wants_pen = (
                r.sampling_params.needs_penalties or r.grammar is not None
            )
            wants_ilp = r.sampling_params.return_input_logprob
            # the multimodal-injection step is its own executable; keep it
            # free of penalty/logprob/LoRA rows (and vice versa)
            if wants_mm and (has_pen or has_ilp or has_lora):
                return False
            if has_mm and (wants_pen or wants_ilp or r.lora_slot):
                return False
        m = self.tree_cache.match_prefix(r.fill_ids)
        # Never serve the *entire* fill from cache: the last token must be
        # recomputed to produce logits (reference: schedule_policy.py trims
        # the full-hit case).
        max_cached = ((len(r.fill_ids) - 1) // self.page_size) * self.page_size
        cached_len = min(m.matched_len, max_cached)
        m_swa = None
        if self.swa is not None:
            # both trees must cover the skipped prefix, and the swa window
            # region must be live (tombstones force a shorter prefix)
            swa_len, m_swa = self.swa.usable_prefix(r.fill_ids, cached_len)
            cached_len = min(cached_len, swa_len)
        pages = m.pages[: cached_len // self.page_size]

        # Lock the matched path BEFORE any eviction below: _ensure_free_pages
        # evicts LRU leaves, and an unlocked just-matched node is exactly such
        # a leaf — its pages would be freed and re-allocated to this very
        # request as "new" pages, corrupting KV and double-inserting pages
        # into the tree at finish. (Reference: PrefillAdder locks tree nodes
        # during admission, schedule_policy.py:495 add_one_req.)
        self.tree_cache.inc_lock_ref(m.last_node)

        remaining = len(r.fill_ids) - cached_len
        # Ring-eligible long fresh prompts are admitted WHOLE and alone:
        # the sequence-sharded prefill wants the full token axis in one
        # step (parallel/ring_prefill.py; chunking would serialize it).
        ring_whole = (
            not reqs
            and cached_len == 0
            and remaining >= self.server_args.ring_prefill_threshold
            and r.mm_positions is None
            and not r.sampling_params.needs_penalties
            and r.grammar is None
            and not r.lora_slot
            and self.runner.ring_capable()
        )
        if ring_whole:
            ext = remaining
        else:
            ext = min(
                remaining, self.server_args.chunked_prefill_size,
                budget.rem_tokens,
            )
        if ext <= 0:
            self.tree_cache.dec_lock_ref(m.last_node)
            return False
        # Memory feasibility: pages for this extend (+ the whole batch keeps
        # decoding after) — conservative check mirroring PrefillAdder's
        # rem_total_tokens.
        new_pages_needed = (
            (cached_len + ext + self.page_size - 1) // self.page_size - len(pages)
        )
        if not self._ensure_free_pages(new_pages_needed):
            self.tree_cache.dec_lock_ref(m.last_node)
            return False

        if r.tok_slot is None:
            if not self._free_slots:
                self.tree_cache.dec_lock_ref(m.last_node)
                return False
            r.tok_slot = self._free_slots.pop()
        if self.swa is not None:
            if not self.swa.commit(r, cached_len, m_swa, new_pages_needed):
                # swa-side pressure: evict its tree and retry once
                self.swa.evict(new_pages_needed * self.page_size)
                if not self.swa.commit(
                    r, cached_len, m_swa, new_pages_needed
                ):
                    self.tree_cache.dec_lock_ref(m.last_node)
                    return False
        new_pages = self.allocator.alloc(new_pages_needed)
        assert new_pages is not None
        r.cached_len = cached_len
        r.computed_len = cached_len
        r.cached_tokens = cached_len
        self.num_cached_tokens += cached_len
        r.page_list = list(pages) + new_pages
        r.last_node = m.last_node

        if ext < remaining:
            r.is_chunked = True
            self.chunked_req = r
        reqs.append(r)
        extend_lens.append(ext)
        budget.take(ext)
        self.num_prefill_tokens += ext
        return True

    def _extend_req_pages(self, r: Req, ext: int) -> bool:
        """Grow r.page_list to cover virtual_computed + ext tokens (equals
        computed_len when nothing is in flight)."""
        needed = (
            (r.virtual_computed + ext + self.page_size - 1) // self.page_size
            - len(r.page_list)
        )
        if needed <= 0:
            return True
        if not self._ensure_free_pages(needed):
            return False
        pages = self.allocator.alloc(needed)
        assert pages is not None
        r.page_list.extend(pages)
        if self.swa is not None:
            if not self.swa.extend(r, r.virtual_computed + ext):
                self.swa.evict(needed * self.page_size)
                if not self.swa.extend(r, r.virtual_computed + ext):
                    return False  # caller retracts; release frees both
        return True

    def _ensure_free_pages(self, n: int) -> bool:
        """Evict from the radix tree until n pages are free."""
        if self.allocator.available_pages >= n:
            return True
        shortfall = (n - self.allocator.available_pages) * self.page_size
        self.tree_cache.evict(shortfall)
        return self.allocator.available_pages >= n

    def _get_decode_batch(self) -> Optional[HostBatch]:
        if not self.running_batch:
            return None
        if self.spec is not None:
            batch = self._try_spec_decode_batch()
            if batch is not None:
                return batch
        ctx = self.runner.context_len
        # Overlap: rows that would pass their (host-known) length limits if
        # all in-flight tokens land simply wait for collection; only rows
        # that can definitely absorb another token are dispatched.
        eligible = [
            r for r in self.running_batch
            if r.virtual_output_len < r.sampling_params.max_new_tokens
            and r.virtual_seq_len < ctx
        ]
        if not eligible:
            return None
        # Decode-burst K: every row must be able to absorb K tokens (token
        # budget + context + pages) with no penalties in the batch and no
        # prefill waiting to interleave; else single-step.
        K = self.server_args.decode_burst_size
        if K > 1:
            ok = not self.waiting_queue and all(
                r.sampling_params.max_new_tokens - r.virtual_output_len >= K
                and r.virtual_seq_len + K <= ctx
                and not r.sampling_params.needs_penalties
                and r.grammar is None
                and r.lora_slot == 0
                for r in eligible
            )
            if not ok:
                K = 1
        # Ensure every request has pages for its next K tokens; retract on
        # pressure (reference: update_running_batch :1828 + retract_decode).
        i = 0
        while i < len(eligible):
            r = eligible[i]
            if r not in self.running_batch:
                eligible.remove(r)  # retracted below while iterating
                continue
            if not self._extend_req_pages(r, K):
                victim = self._retract_one()
                if victim in eligible:
                    eligible.remove(victim)
                # current r may have been the victim; re-check it.
                continue
            i += 1
        if not eligible:
            return None
        if self.swa is not None:
            # slide the window: request-owned swa pages wholly behind
            # every in-flight read are reclaimed (the plateau)
            for r in eligible:
                self.swa.window_evict(r, r.computed_len)
        batch = build_batch(
            eligible,
            [1] * len(eligible),
            self.page_size,
            self.runner.cfg.vocab_size,
            is_extend=False,
            virtual=self.enable_overlap,
        )
        batch.burst = K
        if K > 1:
            # The page table must cover seq_len + K - 1 positions; rebuild
            # with the burst horizon included.
            batch = self._widen_page_table(batch, K)
        return batch

    def _try_spec_decode_batch(self) -> Optional[HostBatch]:
        """Speculative decode batch: every row must be spec-warmed (prefill
        went through the spec path), penalty/grammar-free, and able to hold
        the tree's node count + 1 more KV positions (reference: EAGLEWorker
        spec branch of run_batch, scheduler.py:1885)."""
        S = max(1, self.server_args.speculative_burst_size)
        horizon = self.spec.kv_slots_per_step * S
        ctx = self.runner.context_len
        ok = all(
            getattr(r, "spec_ok", False)
            and r.seq_len + horizon <= ctx
            and not r.sampling_params.needs_penalties
            and r.grammar is None
            and r.lora_slot == 0
            for r in self.running_batch
        )
        if not ok:
            return None
        i = 0
        while i < len(self.running_batch):
            r = self.running_batch[i]
            if not self._extend_req_pages(r, horizon):
                self._retract_one()
                continue
            i += 1
        if not self.running_batch:
            return None
        batch = build_batch(
            self.running_batch,
            [1] * len(self.running_batch),
            self.page_size,
            self.runner.cfg.vocab_size,
            is_extend=False,
        )
        batch.spec = True
        batch.burst = S
        return self._widen_page_table(batch, horizon)

    def _widen_page_table(self, batch: HostBatch, K: int) -> HostBatch:
        import numpy as np

        need = max(
            (r.virtual_computed + K + self.page_size - 1) // self.page_size
            for r in batch.reqs
        )
        if need > batch.page_table.shape[1]:
            wide = np.zeros((len(batch.reqs), need), dtype=np.int32)
            for i, r in enumerate(batch.reqs):
                pages = r.page_list[:need]
                wide[i, : len(pages)] = pages
            batch.page_table = wide
            if batch.page_table_swa is not None:
                wide_s = np.zeros((len(batch.reqs), need), dtype=np.int32)
                for i, r in enumerate(batch.reqs):
                    row = [max(p, 0) for p in r.swa_page_list[:need]]
                    wide_s[i, : len(row)] = row  # DEAD -> garbage page 0
                batch.page_table_swa = wide_s
        return batch

    def _retract_one(self) -> Req:
        """Send the youngest running request back to the waiting queue and
        release its KV (reference: retract_decode schedule_batch.py:1362).
        Any in-flight device rows for the victim are invalidated (gen bump
        in _release_req_kv) and their results discarded at collect — the
        victim's already-sampled-but-uncollected tokens are re-generated
        after re-prefill."""
        assert self.running_batch
        victim = max(self.running_batch, key=lambda r: r.arrival_time)
        self.running_batch.remove(victim)
        self._release_req_kv(victim)
        victim.reset_for_retract()
        self.waiting_queue.insert(0, victim)
        self.num_retractions += 1
        logger.info("retracted req %s under memory pressure", victim.rid)
        return victim

    def _release_req_kv(self, r: Req) -> None:
        if self.swa is not None:
            self.swa.release(r)
        self.allocator.free(r.own_pages(self.page_size))
        if r.last_node is not None:
            self.tree_cache.dec_lock_ref(r.last_node)
        r.page_list = []
        r.last_node = None
        r.bump_gen()
        self._free_tok_slot(r)
        self._free_spec_slot(r)

    def _free_tok_slot(self, r: Req) -> None:
        if r.tok_slot is not None:
            self._free_slots.append(r.tok_slot)
            r.tok_slot = None

    def _free_spec_slot(self, r: Req) -> None:
        if self.spec is not None and r.spec_slot is not None:
            self.spec.free_slot(r.spec_slot)
            r.spec_slot = None
            r.spec_ok = False

    # ------------------------------------------------------------- results

    def _process_result(
        self, batch: HostBatch, tokens, logprobs, valid=None
    ) -> List[Req]:
        import numpy as np

        if tokens.ndim == 1:
            tokens = tokens[:, None]
            logprobs = logprobs[:, None]
        K = tokens.shape[1]
        nan_aborted: List[Req] = []
        if self.server_args.enable_nan_detection and np.isnan(
            logprobs[: len(batch.reqs)]
        ).any():
            # A poisoned step (bad weights / numerics) — abort the affected
            # rows loudly instead of streaming garbage (reference:
            # sampler.py:63 enable_nan_detection). Aborted rows must still
            # reach the consumer (their final chunk), so they are returned
            # as updated.
            bad = np.isnan(logprobs[: len(batch.reqs)]).any(axis=-1)
            for i, r in enumerate(batch.reqs):
                if r is not None and bad[i] and not r.finished:
                    logger.error("NaN logprob for req %s; aborting", r.rid)
                    if self.abort_request(r.rid):
                        nan_aborted.append(r)
        updated: List[Req] = nan_aborted
        for i, r in enumerate(batch.reqs):
            if batch.gens is not None and r.gen != batch.gens[i]:
                # Stale overlap row: the request finished / was retracted /
                # was requeued after this batch was dispatched. Its device
                # results are speculative over-run — discard.
                continue
            ext = int(batch.extend_lens[i])
            if batch.overlap:
                if batch.is_extend:
                    r.inflight_computed -= ext
                    if not batch.chunked[i]:
                        r.inflight_tokens -= 1
                else:
                    r.inflight_computed -= batch.burst
                    r.inflight_tokens -= batch.burst
            if (
                batch.input_logprobs is not None
                and r.sampling_params.return_input_logprob
            ):
                # token index of target t is computed_len + t + 1; keep those
                # past logprob_start_len (reference: logprob_start_len).
                start = r.sampling_params.logprob_start_len
                for t in range(int(batch.ilp_valid[i])):
                    if r.computed_len + t + 1 > start:
                        r.input_token_logprobs.append(
                            float(batch.input_logprobs[i, t])
                        )
            row_chunked = (
                batch.chunked[i] if batch.chunked is not None else r.is_chunked
            )
            if batch.is_embed and not row_chunked:
                # Final (or only) chunk of an embedding request: capture the
                # pooled hidden state; the max_new_tokens==0 branch below
                # finishes the request.
                r.embedding = np.asarray(batch.embeddings[i], np.float32)
            if batch.is_extend and row_chunked:
                # Mid-prompt chunk: the sampled token is meaningless; publish
                # the computed KV so concurrent requests can share it.
                r.computed_len += ext
                self._publish_unfinished(r)
                continue
            if len(r.output_ids) >= r.sampling_params.max_new_tokens:
                # max_new_tokens == 0: finish right after prefill, drop the
                # sampled token.
                r.computed_len += ext
                r.check_finished(self.runner.context_len)
                if not r.finished:
                    r._finish(FinishReason.LENGTH)
                self._finalize_req(r)
                if r in self.running_batch:
                    self.running_batch.remove(r)
                updated.append(r)
                continue
            # Accept tokens in order; a burst may finish mid-way, in which
            # case the remaining device iterations for this row are discarded
            # (KV written past computed_len is garbage and never referenced).
            row_k = K if valid is None else int(valid[i])
            accepted = 0
            for j in range(row_k):
                tok = int(tokens[i, j])
                r.output_ids.append(tok)
                accepted += 1
                if r.sampling_params.return_logprob:
                    r.output_token_logprobs.append(float(logprobs[i, j]))
                self.num_generated_tokens += 1
                if r.first_token_time is None:
                    import time as _t

                    r.first_token_time = _t.monotonic()
                if r.grammar is not None:
                    r.grammar.accept_token(tok)
                r.check_finished(self.runner.context_len)
                if r.finished:
                    break
            if batch.is_extend:
                # KV was computed for the `ext` prompt tokens this step; the
                # sampled token's KV comes with the next decode step.
                r.computed_len += ext
            else:
                r.computed_len += accepted
            if r.finished:
                self._finalize_req(r)
                if r in self.running_batch:
                    self.running_batch.remove(r)
            else:
                if batch.is_extend and not batch.overlap:
                    self.running_batch.append(r)
                if r.grammar is not None:
                    self._try_jump_forward(r)
            updated.append(r)
        return updated

    # ------------------------------------------------------- grammar jumps

    def _try_jump_forward(self, r: Req) -> None:
        """Compressed-FSM jump-forward (reference: try_jump_forward
        base_grammar_backend.py:73 + scheduler retokenization): when the
        grammar forces a unique continuation, append its tokens without
        forward passes, publish computed KV to the tree, and requeue the
        request so prefill extends it over the jumped tokens."""
        if self.tokenizer is None or r.is_chunked:
            return
        forced = r.grammar.jump_forward()
        if len(forced) < 2:
            return
        text = forced.decode("utf-8", errors="ignore")
        if not text:
            return
        ids = self.tokenizer.encode(text, add_special_tokens=False)
        sp = r.sampling_params
        accepted = []
        for tid in ids:
            if len(r.output_ids) + len(accepted) >= sp.max_new_tokens:
                break
            if r.seq_len + len(accepted) + 1 >= self.runner.context_len:
                break
            if not r.grammar.try_advance_token(int(tid)):
                # retokenization mismatch against the forced byte path
                break
            accepted.append(int(tid))
        if not accepted:
            return
        r.output_ids.extend(accepted)
        if sp.return_logprob:
            r.output_token_logprobs.extend([0.0] * len(accepted))
        self.num_generated_tokens += len(accepted)
        r.check_finished(self.runner.context_len)
        if r.finished:
            self._finalize_req(r)
            if r in self.running_batch:
                self.running_batch.remove(r)
            return
        self._requeue_running(r)

    def _requeue_running(self, r: Req) -> None:
        """Move a running request back to the prefill queue, keeping its
        computed KV shareable via the tree (publish-then-release)."""
        if r in self.running_batch:
            self.running_batch.remove(r)
        self._publish_unfinished(r)
        self._release_req_kv(r)
        r.cached_len = 0
        r.computed_len = 0
        r.status = ReqStatus.WAITING
        self.waiting_queue.insert(0, r)

    def _publish_unfinished(self, r: Req) -> None:
        tokens = r.fill_ids[: r.computed_len]
        if self.swa is not None:
            self.swa.publish_unfinished(r, tokens)
        new_pages, new_cached, new_node = self.tree_cache.cache_unfinished_req(
            tokens, r.page_list, r.cached_len, r.last_node
        )
        r.page_list = new_pages
        r.cached_len = new_cached
        r.last_node = new_node

    def _finalize_req(self, r: Req) -> None:
        tokens = r.fill_ids[: r.computed_len]
        if self.swa is not None:
            self.swa.finish(r, tokens)
        self.tree_cache.cache_finished_req(
            tokens, r.page_list, r.cached_len, r.last_node
        )
        r.page_list = []
        r.last_node = None
        r.bump_gen()
        self._free_tok_slot(r)
        self._free_spec_slot(r)

    # ------------------------------------------------------------- debug

    def check_memory(self) -> None:
        """Idle-time leak check (reference: scheduler.py:1496 check_memory)."""
        assert not self.has_work
        assert self.allocator.check_leaks(expected_in_use=self._tree_pages()), (
            f"page leak: free={self.allocator.available_pages} "
            f"tree={self._tree_pages()} total={self.allocator.num_pages}"
        )
        self.tree_cache.sanity_check()
        if self.swa is not None:
            assert self.swa.check_leaks(), (
                f"swa page leak: free={self.swa.allocator.available_pages} "
                f"tree={self.swa.live_tree_pages()}"
            )

    def _tree_pages(self) -> int:
        if isinstance(self.tree_cache, ChunkCache):
            return 0
        return sum(
            len(n.pages) for n in self.tree_cache._iter_nodes()
        )

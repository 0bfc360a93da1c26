"""Request state machine and host-side batch construction.

Analog of the reference's Req / ScheduleBatch
(reference: srt/managers/schedule_batch.py:409 Req with finish reasons
:118-175, :791 ScheduleBatch, prepare_for_extend :1106, retract_decode
:1362). TPU-first differences:

- Batch state is plain numpy on the host; each step materializes a fresh
  padded ``HostBatch`` (token ids, positions, page table, seq lens) which
  the runner ships to the device. There is no persistent device-side
  req_to_token pool to keep coherent — page tables are tiny.
- KV bookkeeping is at page granularity (see mem_cache/).
"""

from __future__ import annotations

import dataclasses
import enum
import time
from typing import List, Optional

import numpy as np

from sglang_custom_tpu.mem_cache.radix_cache import TreeNode
from sglang_custom_tpu.sampling.sampling_params import SamplingParams


class ReqStatus(enum.Enum):
    WAITING = enum.auto()
    RUNNING = enum.auto()
    FINISHED = enum.auto()
    ABORTED = enum.auto()


class FinishReason(enum.Enum):
    EOS = "stop"            # eos / stop token
    STOP_STR = "stop_str"
    LENGTH = "length"       # max_new_tokens or context limit
    ABORT = "abort"


class Req:
    """One generation request (reference: schedule_batch.py:409)."""

    def __init__(
        self,
        rid: str,
        input_ids: List[int],
        sampling_params: SamplingParams,
        eos_token_ids: Optional[set] = None,
        arrival_time: Optional[float] = None,
    ):
        self.rid = rid
        self.input_ids = list(input_ids)
        self.sampling_params = sampling_params
        self.eos_token_ids = eos_token_ids or set()
        self.arrival_time = arrival_time if arrival_time is not None else time.monotonic()

        self.output_ids: List[int] = []
        self.output_token_logprobs: List[float] = []
        self.input_token_logprobs: List[float] = []
        self.status = ReqStatus.WAITING
        self.finish_reason: Optional[FinishReason] = None

        # Constrained decoding state (reference: Req.grammar)
        self.grammar = None  # Optional[constrained.Grammar]

        # Speculative decoding state (speculative/eagle_worker.py)
        self.spec_slot: Optional[int] = None  # feature-pool slot
        self.spec_ok = False                  # prefilled through the spec path

        # Overlap-scheduler state: device token-slot id, #tokens dispatched
        # but not yet collected, and a generation counter bumped whenever
        # host state diverges from in-flight device work (finish/retract/
        # jump-forward) so stale in-flight rows are discarded at collect.
        self.tok_slot: Optional[int] = None
        self.inflight_tokens = 0     # sampled tokens not yet collected
        self.inflight_computed = 0   # KV positions written, not collected
        self.gen = 0

        # LoRA (lora/lora_manager.py): pool slot 0 = no adapter
        self.lora_slot = 0
        self.lora_scaling = 0.0

        # Embedding request (reference: EmbeddingReqInput io_struct.py):
        # finish after prefill with a pooled hidden-state vector.
        self.is_embedding = False
        self.embedding: Optional[np.ndarray] = None  # [H] f32, set by runner

        # Multimodal (models/llava.py): projected image features and the
        # absolute prompt positions they override (reference: mm_utils
        # embedding scatter). None = text-only request.
        self.mm_embeds: Optional[np.ndarray] = None     # [n, H] f32
        self.mm_positions: Optional[np.ndarray] = None  # [n] i64
        # mrope (Qwen2-VL family): 3-channel positions over the expanded
        # prompt + the decode-time shift (multimodal/processor.py
        # qwen_mrope_positions). None/0 = standard rope.
        self.mrope_pos: Optional[np.ndarray] = None     # [3, L_prompt] i32
        self.mrope_delta: int = 0

        # KV state
        self.page_list: List[int] = []   # pages backing fill_ids[:computed_len]
        self.cached_len = 0              # leading tokens whose pages the tree owns
        self.computed_len = 0            # tokens with KV computed
        # SWA-layer twin state (hybrid sliding-window models only;
        # mem_cache/swa_radix_cache.py) — entries may be DEAD tombstones
        self.swa_page_list: List[int] = []
        self.swa_cached_len = 0
        self.swa_last_node = None
        self.last_node: Optional[TreeNode] = None
        self.is_chunked = False          # mid-chunked-prefill

        # Stats
        self.queued_time: Optional[float] = None
        self.first_token_time: Optional[float] = None
        self.finished_time: Optional[float] = None
        self.cached_tokens = 0           # prefix tokens served from cache

    # ------------------------------------------------------------------

    @property
    def fill_ids(self) -> List[int]:
        """All tokens that must have KV: prompt + generated so far."""
        return self.input_ids + self.output_ids

    @property
    def seq_len(self) -> int:
        return len(self.input_ids) + len(self.output_ids)

    @property
    def prompt_len(self) -> int:
        return len(self.input_ids)

    @property
    def remaining_prefill(self) -> int:
        """Prompt (+retracted output) tokens still needing KV computation.
        Note the last fill token's KV is computed together with its logits,
        so 'prefill complete' means computed_len == len(fill_ids)."""
        return len(self.fill_ids) - self.computed_len

    # ---- virtual state: host view assuming all in-flight device steps
    # complete without value-dependent finishes (overlap scheduler) ----

    @property
    def virtual_output_len(self) -> int:
        return len(self.output_ids) + self.inflight_tokens

    @property
    def virtual_computed(self) -> int:
        return self.computed_len + self.inflight_computed

    @property
    def virtual_seq_len(self) -> int:
        return len(self.input_ids) + self.virtual_output_len

    def bump_gen(self) -> None:
        """Invalidate in-flight device rows for this request (finish,
        retract, requeue): their results are discarded at collect."""
        self.gen += 1
        self.inflight_tokens = 0
        self.inflight_computed = 0

    @property
    def finished(self) -> bool:
        return self.status in (ReqStatus.FINISHED, ReqStatus.ABORTED)

    def own_pages(self, page_size: int) -> List[int]:
        return self.page_list[self.cached_len // page_size :]

    def check_finished(self, context_len: int) -> None:
        """Reference: schedule_batch.py check_finished / finish reasons."""
        if self.finished:
            return
        sp = self.sampling_params
        if len(self.output_ids) >= sp.max_new_tokens:
            self._finish(FinishReason.LENGTH)
            return
        if self.seq_len >= context_len:
            self._finish(FinishReason.LENGTH)
            return
        if self.output_ids:
            last = self.output_ids[-1]
            if not sp.ignore_eos and last in self.eos_token_ids:
                self._finish(FinishReason.EOS)
                return
            if last in sp.stop_token_ids:
                self._finish(FinishReason.EOS)
                return

    def _finish(self, reason: FinishReason) -> None:
        self.status = ReqStatus.FINISHED
        self.finish_reason = reason
        self.finished_time = time.monotonic()

    def reset_for_retract(self) -> None:
        """Release-and-requeue state reset (reference: retract_decode
        schedule_batch.py:1362). Generated tokens are kept and re-prefilled."""
        self.page_list = []
        self.cached_len = 0
        self.computed_len = 0
        self.last_node = None
        self.is_chunked = False
        self.status = ReqStatus.WAITING
        self.swa_page_list = []
        self.swa_cached_len = 0
        self.swa_last_node = None

    def __repr__(self):
        return (
            f"Req({self.rid}, prompt={self.prompt_len}, out={len(self.output_ids)}, "
            f"computed={self.computed_len}, status={self.status.name})"
        )


@dataclasses.dataclass
class HostBatch:
    """Numpy-side batch for one forward step; padded by the runner."""

    reqs: List[Req]
    is_extend: bool
    token_ids: np.ndarray     # [B, T]
    positions: np.ndarray     # [B, T]
    page_table: np.ndarray    # [B, PMAX]
    seq_lens: np.ndarray      # [B]
    extend_lens: np.ndarray   # [B]
    # sampling
    temperature: np.ndarray   # [B]
    top_k: np.ndarray         # [B]
    top_p: np.ndarray         # [B]
    min_p: np.ndarray         # [B]
    # penalties (None unless some request needs them)
    penalties: Optional[dict] = None
    # decode-burst iterations fused into one device program (decode only)
    burst: int = 1
    # speculative decode step (tokens come back [B, K+1] + per-row valid)
    spec: bool = False
    # teacher-forced input-logprob targets (extend only; None when unused)
    ilp_targets: Optional[np.ndarray] = None  # [B, T] i32
    ilp_valid: Optional[np.ndarray] = None    # [B] i32 (#valid positions)
    # filled by the runner after the step when ilp_targets is set
    input_logprobs: Optional[np.ndarray] = None
    # LoRA adapter routing (None when no request in the batch uses LoRA)
    lora_ids: Optional[np.ndarray] = None    # [B] i32 pool slot
    lora_scale: Optional[np.ndarray] = None  # [B] f32 alpha/r
    # embedding batch: every row is an embedding request; the runner fills
    # ``embeddings`` [B, H] f32 instead of sampling tokens
    is_embed: bool = False
    embeddings: Optional[np.ndarray] = None
    # multimodal embedding override for this extend window (None = text-only)
    mm_override: Optional[np.ndarray] = None  # [B, T, H] f32
    mm_mask: Optional[np.ndarray] = None      # [B, T] bool
    # mrope: 3-channel positions for extend windows overlapping image
    # spans; decode / text-suffix steps carry only the per-row shift
    # (rope positions = positions + rope_delta). None on non-mrope models.
    mrope_positions: Optional[np.ndarray] = None  # [B, 3, T] i32
    rope_delta: Optional[np.ndarray] = None       # [B] i32
    # SWA layers' page table (hybrid window models; None otherwise)
    page_table_swa: Optional[np.ndarray] = None
    # per-row custom logit processors (host-sampling cold path); None when
    # no request in the batch carries one
    custom_procs: Optional[list] = None
    # token-slot ids for the device feedback table (model_runner.tok_slots);
    # None when requests carry no slots (e.g. direct runner tests)
    slot_ids: Optional[np.ndarray] = None     # [B] i32
    # overlapped decode: read input tokens from the device slot table
    # instead of token_ids (token values may not exist on the host yet)
    use_slots: bool = False
    # generation snapshot per row (Req.gen at dispatch); collect skips rows
    # whose request was finished/retracted/requeued while in flight
    gens: Optional[List[int]] = None
    # is_chunked snapshot per row at build time (collect must not consult
    # Req.is_chunked — a later chunk may have been dispatched in between)
    chunked: Optional[List[bool]] = None
    # dispatched via the overlap pipeline (collect adjusts inflight
    # counters and must not re-append extend rows to running)
    overlap: bool = False

    @property
    def batch_size(self) -> int:
        return len(self.reqs)


def build_batch(
    reqs: List[Req],
    extend_lens: List[int],
    page_size: int,
    vocab_size: int,
    is_extend: bool,
    virtual: bool = False,
) -> HostBatch:
    """Materialize the step's HostBatch from request state.

    ``extend_lens[i]`` tokens starting at ``reqs[i].computed_len`` are
    computed this step (decode: 1 token = last sampled output).

    With ``virtual=True`` (overlap scheduler) positions/lengths start at
    ``virtual_computed`` — the state after all in-flight device steps —
    and decode token VALUES are left zero: the device reads them from the
    slot table (HostBatch.use_slots).
    """
    # Snapshot: the caller may mutate its running list while results are
    # processed against this batch's row order.
    reqs = list(reqs)
    B = len(reqs)
    T = max(extend_lens)

    def base(r: Req) -> int:
        return r.virtual_computed if virtual else r.computed_len

    max_pages = max(
        (base(r) + e + page_size - 1) // page_size
        for r, e in zip(reqs, extend_lens)
    )
    max_pages = max(max_pages, 1)

    token_ids = np.zeros((B, T), dtype=np.int32)
    positions = np.zeros((B, T), dtype=np.int32)
    page_table = np.zeros((B, max_pages), dtype=np.int32)
    seq_lens = np.zeros((B,), dtype=np.int32)
    ext = np.asarray(extend_lens, dtype=np.int32)
    temperature = np.zeros((B,), dtype=np.float32)
    top_k = np.zeros((B,), dtype=np.int32)
    top_p = np.ones((B,), dtype=np.float32)
    min_p = np.zeros((B,), dtype=np.float32)

    page_table_swa = None
    if any(r.swa_page_list for r in reqs):
        from sglang_custom_tpu.mem_cache.allocator import GARBAGE_PAGE as _G

        page_table_swa = np.zeros((B, max_pages), dtype=np.int32)
        for i, r in enumerate(reqs):
            sp_ = r.swa_page_list[:max_pages]
            row = [p if p >= 0 else _G for p in sp_]  # DEAD -> garbage
            page_table_swa[i, : len(row)] = row

    for i, (r, e) in enumerate(zip(reqs, extend_lens)):
        c = base(r)
        fill = r.fill_ids
        if is_extend or len(fill) >= c + e:
            # Decode token values are filled when the host has them (cold
            # paths read them); a hot overlapped decode may not — the
            # device then sources them from the slot table (use_slots).
            token_ids[i, :e] = fill[c : c + e]
        positions[i, :e] = np.arange(c, c + e)
        pages = r.page_list[:max_pages]
        page_table[i, : len(pages)] = pages
        seq_lens[i] = c + e
        sp = r.sampling_params
        temperature[i] = sp.temperature
        top_k[i] = sp.top_k if sp.top_k > 0 else vocab_size
        top_p[i] = sp.top_p
        min_p[i] = sp.min_p

    penalties = None
    if any(
        r.sampling_params.needs_penalties or r.grammar is not None for r in reqs
    ):
        penalties = _build_penalties(reqs, vocab_size)

    ilp_targets = ilp_valid = None
    if is_extend and any(r.sampling_params.return_input_logprob for r in reqs):
        ilp_targets = np.zeros((B, T), np.int32)
        ilp_valid = np.zeros((B,), np.int32)
        for i, (r, e) in enumerate(zip(reqs, extend_lens)):
            if not r.sampling_params.return_input_logprob:
                continue
            fill = r.fill_ids
            tgts = fill[r.computed_len + 1 : r.computed_len + e + 1]
            ilp_targets[i, : len(tgts)] = tgts
            ilp_valid[i] = len(tgts)

    lora_ids = lora_scale = None
    if any(r.lora_slot for r in reqs):
        lora_ids = np.asarray([r.lora_slot for r in reqs], np.int32)
        lora_scale = np.asarray([r.lora_scaling for r in reqs], np.float32)

    custom_procs = None
    if any(r.sampling_params.custom_logit_processor for r in reqs):
        custom_procs = [
            _resolve_processor(r.sampling_params.custom_logit_processor)
            for r in reqs
        ]

    is_embed = any(r.is_embedding for r in reqs)
    assert not is_embed or all(r.is_embedding for r in reqs), (
        "embedding and generation requests must not share a batch"
    )

    slot_ids = None
    if any(r.tok_slot is not None for r in reqs):
        slot_ids = np.asarray(
            [r.tok_slot if r.tok_slot is not None else 0 for r in reqs],
            np.int32,
        )

    # Multimodal override: image-token positions inside this extend window
    # take projected vision features (reference: mm_utils embedding scatter).
    mm_override = mm_mask = None
    if is_extend:
        for i, (r, e) in enumerate(zip(reqs, extend_lens)):
            if r.mm_positions is None:
                continue
            lo, hi = r.computed_len, r.computed_len + e
            sel = (r.mm_positions >= lo) & (r.mm_positions < hi)
            if not sel.any():
                continue
            if mm_override is None:
                H = r.mm_embeds.shape[1]
                mm_override = np.zeros((B, T, H), np.float32)
                mm_mask = np.zeros((B, T), bool)
            cols = r.mm_positions[sel] - lo
            mm_override[i, cols] = r.mm_embeds[sel]
            mm_mask[i, cols] = True

    # mrope (Qwen2-VL): 3-channel positions only when this window overlaps
    # a prompt region that may contain image spans; otherwise the per-row
    # shift (rope_delta) reproduces the equal-channel suffix positions.
    mrope_positions = None
    rope_delta = None
    if any(r.mrope_pos is not None or r.mrope_delta for r in reqs):
        rope_delta = np.asarray(
            [r.mrope_delta for r in reqs], np.int32
        )
        if is_extend and any(
            r.mrope_pos is not None and base(r) < r.mrope_pos.shape[1]
            for r in reqs
        ):
            mrope_positions = np.zeros((B, 3, T), np.int32)
            for i, (r, e) in enumerate(zip(reqs, extend_lens)):
                c = base(r)
                tr = np.arange(c, c + e, dtype=np.int32)
                mp = r.mrope_pos
                if mp is None:
                    row = np.broadcast_to(tr, (3, e))
                else:
                    L = mp.shape[1]
                    row = np.where(
                        tr[None, :] < L,
                        mp[:, np.clip(tr, 0, L - 1)],
                        tr[None, :] + r.mrope_delta,
                    )
                mrope_positions[i, :, :e] = row

    return HostBatch(
        reqs=reqs,
        is_extend=is_extend,
        is_embed=is_embed,
        lora_ids=lora_ids,
        lora_scale=lora_scale,
        token_ids=token_ids,
        positions=positions,
        page_table=page_table,
        seq_lens=seq_lens,
        extend_lens=ext,
        temperature=temperature,
        top_k=top_k,
        top_p=top_p,
        min_p=min_p,
        penalties=penalties,
        page_table_swa=page_table_swa,
        custom_procs=custom_procs,
        ilp_targets=ilp_targets,
        ilp_valid=ilp_valid,
        mm_override=mm_override,
        mm_mask=mm_mask,
        mrope_positions=mrope_positions,
        rope_delta=rope_delta,
        slot_ids=slot_ids,
        use_slots=virtual and not is_extend,
        gens=[r.gen for r in reqs],
        chunked=[r.is_chunked for r in reqs],
    )


_PROC_CACHE: dict = {}


def _resolve_processor(spec):
    """callable -> itself; "module:function" -> imported callable (cached);
    None -> None (reference: custom_logit_processor.py from_str)."""
    if spec is None or callable(spec):
        return spec
    if spec in _PROC_CACHE:
        return _PROC_CACHE[spec]
    mod, _, fn = str(spec).partition(":")
    import importlib

    f = getattr(importlib.import_module(mod), fn)
    _PROC_CACHE[spec] = f
    return f


def _build_penalties(reqs: List[Req], vocab_size: int) -> dict:
    """Numpy penalty inputs (padded per-batch; bucketed by the runner).
    Reference: sampling/penaltylib — freq/presence counts over generated
    tokens, min_new_tokens stop-token blocking, grammar vocab bitmask."""
    B = len(reqs)
    W = (vocab_size + 31) // 32
    omax = max(max((len(r.output_ids) for r in reqs), default=0), 1)
    emax = max(
        max(
            (len(r.eos_token_ids) + len(r.sampling_params.stop_token_ids)
             for r in reqs),
            default=0,
        ),
        1,
    )
    out_ids = np.zeros((B, omax), np.int32)
    out_len = np.zeros((B,), np.int32)
    freq = np.zeros((B,), np.float32)
    pres = np.zeros((B,), np.float32)
    rep = np.ones((B,), np.float32)
    block_eos = np.zeros((B,), bool)
    eos_ids = np.full((B, emax), -1, np.int32)
    vocab_mask = np.full((B, W), 0xFFFFFFFF, np.uint32)
    bmax = max(
        max((len(r.sampling_params.logit_bias or {}) for r in reqs),
            default=0),
        1,
    )
    bias_ids = np.full((B, bmax), -1, np.int32)
    bias_vals = np.zeros((B, bmax), np.float32)
    for i, r in enumerate(reqs):
        sp = r.sampling_params
        n = len(r.output_ids)
        out_ids[i, :n] = r.output_ids
        out_len[i] = n
        freq[i] = sp.frequency_penalty
        pres[i] = sp.presence_penalty
        rep[i] = sp.repetition_penalty
        if n < sp.min_new_tokens:
            block_eos[i] = True
            ids = list(r.eos_token_ids) + list(sp.stop_token_ids)
            eos_ids[i, : len(ids)] = ids
        if r.grammar is not None and not r.is_chunked:
            m = r.grammar.vocab_mask()
            vocab_mask[i, : len(m)] = m
        if sp.logit_bias:
            items = list(sp.logit_bias.items())
            bias_ids[i, : len(items)] = [int(t) for t, _ in items]
            bias_vals[i, : len(items)] = [float(v) for _, v in items]
    return {
        "output_ids": out_ids,
        "output_len": out_len,
        "frequency_penalty": freq,
        "presence_penalty": pres,
        "repetition_penalty": rep,
        "block_eos": block_eos,
        "eos_ids": eos_ids,
        "vocab_mask": vocab_mask,
        "bias_ids": bias_ids,
        "bias_vals": bias_vals,
    }

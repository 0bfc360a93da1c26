"""SWA dual-table KV cache: window eviction plateau + prefix reuse.

Reference analog: srt/mem_cache/swa_radix_cache.py tests — sliding-window
KV behind the window is reclaimed while full-attention layers keep the
whole context, and prefix caching still works for the in-window suffix.
"""

import numpy as np
import pytest

from sglang_custom_tpu.config.model_config import ModelConfig
from sglang_custom_tpu.config.server_args import ServerArgs
from sglang_custom_tpu.managers.schedule_batch import Req
from sglang_custom_tpu.managers.scheduler import Scheduler
from sglang_custom_tpu.mem_cache.swa_radix_cache import DEAD, SWARadixCache
from sglang_custom_tpu.model_executor.model_runner import ModelRunner
from sglang_custom_tpu.model_loader.loader import load_dummy_weights
from sglang_custom_tpu.parallel.mesh import create_mesh
from sglang_custom_tpu.sampling.sampling_params import SamplingParams

PS = 8
WINDOW = 32


def gemma_cfg():
    """Tiny Gemma-2 geometry: alternating sliding/global layers."""
    return ModelConfig(
        architecture="Gemma2ForCausalLM", vocab_size=256, hidden_size=64,
        num_layers=4, num_q_heads=4, num_kv_heads=2, head_dim=16,
        intermediate_size=128, rms_norm_eps=1e-6, rope_theta=1e4,
        max_position_embeddings=512, sliding_window=WINDOW,
        sliding_window_pattern=2, hidden_act="gelu_tanh",
    )


def make_sched(num_pages=256, **kw):
    args = ServerArgs(
        model_path="", skip_tokenizer_init=True, context_length=512,
        page_size=PS, schedule_policy="fcfs", dtype="float32",
        kv_cache_dtype="float32", device="cpu", decode_burst_size=1,
        disable_overlap_schedule=True, **kw,
    )
    mesh = create_mesh(tp_size=1, dp_size=1)
    cfg = gemma_cfg()
    params = load_dummy_weights(cfg, mesh, dtype=np.float32)
    runner = ModelRunner(args, cfg, params, mesh, num_pages=num_pages)
    return Scheduler(args, runner), runner


# --------------------------------------------------------------- unit level


def test_insert_merge_semantics():
    freed = []
    t = SWARadixCache(4, freed.extend)
    toks = list(range(1, 13))  # 3 pages
    # finished request: first page behind the window -> tombstone
    dups, tp, _ = t.insert_merge(toks, [DEAD, 7, 8])
    assert dups == [] and tp == [DEAD, 7, 8]
    # a second identical request whose early page is LIVE upgrades the
    # tombstone; live-on-live pages are duplicates
    dups, tp, _ = t.insert_merge(toks, [11, 12, 13])
    assert tp == [11, 7, 8]      # tombstone upgraded with page 11
    assert dups == [12, 13]      # live duplicates returned for freeing
    # dead-on-live keeps the tree's live page
    dups, tp, _ = t.insert_merge(toks, [DEAD, DEAD, 21])
    assert tp == [11, 7, 8] and dups == [21]
    t.sanity_check()


def test_usable_prefix_respects_tombstones():
    from sglang_custom_tpu.mem_cache.swa_radix_cache import SWAState

    st = SWAState(num_pages=64, page_size=4, window=8)
    toks = list(range(1, 21))  # 5 pages of 4
    pages = st.allocator.alloc(5)
    # pages 0..2 dead (behind final window), 3..4 live
    st.allocator.free(pages[:3])
    plist = [DEAD, DEAD, DEAD] + pages[3:]
    st.tree.insert_merge(toks, plist)
    # L=20: window [12,20) -> pages 3,4 live -> usable
    L, _ = st.usable_prefix(toks, 20)
    assert L == 20
    # L capped at 12: window [4,12) covers dead pages -> must shrink
    L2, _ = st.usable_prefix(toks, 12)
    assert L2 < 12


# ----------------------------------------------------------- serving level


def test_decode_page_use_plateaus():
    """Long decode: full-layer pages grow with the context, swa-layer
    pages plateau at ~window size per request (VERDICT r3 #6 done-bar)."""
    sched, runner = make_sched()
    assert sched.swa is not None
    rng = np.random.RandomState(0)
    B, decode = 2, 160
    for i in range(B):
        sched.add_request(
            Req(
                rid=f"r{i}",
                input_ids=list(rng.randint(1, 200, size=24)),
                sampling_params=SamplingParams(
                    max_new_tokens=decode, temperature=0.0, ignore_eos=True
                ),
            )
        )
    swa_in_use, full_in_use = [], []
    while sched.has_work:
        sched.step()
        swa_in_use.append(sched.swa.allocator.num_pages - 1
                          - sched.swa.allocator.available_pages)
        full_in_use.append(sched.allocator.num_pages - 1
                           - sched.allocator.available_pages)
    # full side grows to the whole context
    assert max(full_in_use) >= B * (24 + decode) // PS
    # swa side plateaus: bounded by window pages + slack per request
    ring = WINDOW // PS + 2
    tree_prefix = (24 // PS + 1) * B  # tree-owned prefix pages stay live
    assert max(swa_in_use) <= B * ring + tree_prefix, (
        max(swa_in_use), B * ring + tree_prefix
    )
    # and it's a real plateau: the last quarter of decode added nothing
    tail = swa_in_use[-len(swa_in_use) // 4 :]
    assert max(tail) - min(tail) <= B
    sched.check_memory()


def test_prefix_reuse_in_window_suffix():
    """Multi-turn extension reuses the in-window suffix: a follow-up
    prompt that EXTENDS the finished sequence hits the cache (its window
    region is exactly the live suffix the SWA tree retained). A
    same-length repeat gets NO hit — its window region was correctly
    reclaimed while the original decoded past it — but still serves the
    identical tokens by recomputing (the reference's tombstone
    semantics)."""
    sched, runner = make_sched()
    rng = np.random.RandomState(1)
    prompt = list(rng.randint(1, 200, size=72))  # 9 pages > window

    def run(ids, rid):
        r = Req(
            rid=rid, input_ids=list(ids),
            sampling_params=SamplingParams(
                max_new_tokens=12, temperature=0.0, ignore_eos=True
            ),
        )
        sched.add_request(r)
        while sched.has_work:
            sched.step()
        return r

    r1 = run(prompt, "turn1")
    # multi-turn: continue the conversation from the full sequence
    follow = prompt + list(r1.output_ids) + [5, 7, 9, 11]
    r2 = run(follow, "turn2")
    assert r2.cached_tokens > 0, "multi-turn extension must hit the cache"

    # same-length repeat: no hit (window KV reclaimed), output identical
    r3 = run(prompt, "repeat")
    assert r3.cached_tokens == 0
    assert r3.output_ids == r1.output_ids
    sched.check_memory()


def test_swa_inactive_without_window():
    """Non-windowed models must see exactly the old single-table path."""
    from sglang_custom_tpu.models import llama

    args = ServerArgs(
        model_path="", skip_tokenizer_init=True, context_length=256,
        page_size=PS, dtype="float32", kv_cache_dtype="float32",
        device="cpu",
    )
    mesh = create_mesh(tp_size=1, dp_size=1)
    cfg = ModelConfig(
        architecture="LlamaForCausalLM", vocab_size=256, hidden_size=64,
        num_layers=2, num_q_heads=4, num_kv_heads=2, head_dim=16,
        intermediate_size=128, rms_norm_eps=1e-6, rope_theta=1e4,
        max_position_embeddings=256,
    )
    params = load_dummy_weights(cfg, mesh, dtype=np.float32)
    runner = ModelRunner(args, cfg, params, mesh, num_pages=64)
    sched = Scheduler(args, runner)
    assert sched.swa is None and not runner.has_swa

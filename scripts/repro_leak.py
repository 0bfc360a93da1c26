"""Reproduce the page-accounting bug from test_chunked_prefill_under_pressure."""
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
from collections import Counter

from sglang_custom_tpu.config.model_config import ModelConfig
from sglang_custom_tpu.config.server_args import ServerArgs
from sglang_custom_tpu.managers.schedule_batch import Req
from sglang_custom_tpu.managers.scheduler import Scheduler
from sglang_custom_tpu.model_executor.model_runner import ModelRunner
from sglang_custom_tpu.model_loader.loader import load_dummy_weights
from sglang_custom_tpu.parallel.mesh import create_mesh
from sglang_custom_tpu.sampling.sampling_params import SamplingParams

cfg = ModelConfig(
    architecture="LlamaForCausalLM", vocab_size=512, hidden_size=64,
    num_layers=2, num_q_heads=4, num_kv_heads=2, head_dim=16,
    intermediate_size=128, rms_norm_eps=1e-6, rope_theta=10000.0,
    max_position_embeddings=512,
)
args = ServerArgs(
    model_path="", skip_tokenizer_init=True, dtype="float32", device="cpu",
    page_size=16, chunked_prefill_size=32, max_prefill_tokens=32,
    schedule_policy="fcfs",
)
mesh_ctx = create_mesh(tp_size=1, dp_size=1)
params = load_dummy_weights(cfg, mesh_ctx)
runner = ModelRunner(args, cfg, params, mesh_ctx, num_pages=16)
sched = Scheduler(args, runner)

rng = np.random.RandomState(7)
prompts = [list(rng.randint(1, 500, size=24)) for _ in range(3)]
prompts.append(list(np.random.RandomState(5).randint(1, 500, size=64)))

for i, p in enumerate(prompts):
    sched.add_request(Req(
        rid=f"r{i}", input_ids=p,
        sampling_params=SamplingParams(max_new_tokens=48, temperature=0.0,
                                       ignore_eos=True),
    ))

all_reqs = list(sched.waiting_queue)

# ---- instrumentation ----
tc = sched.tree_cache
orig_insert = tc.insert
def insert(tokens, pages):
    r = orig_insert(tokens, pages)
    print(f"    insert(len={len(tokens)}, pages={list(map(int,pages))}) -> dup={r[0]} tree_pages={r[1]}")
    return r
tc.insert = insert
orig_cuf = tc.cache_unfinished_req
def cuf(tokens, pages, cached_len, last_node):
    print(f"  cache_unfinished(len={len(tokens)}, pages={list(map(int,pages))}, cached={cached_len})")
    return orig_cuf(tokens, pages, cached_len, last_node)
tc.cache_unfinished_req = cuf
orig_cf = tc.cache_finished_req
def cf(tokens, pages, cached_len, last_node):
    print(f"  cache_finished(len={len(tokens)}, pages={list(map(int,pages))}, cached={cached_len})")
    return orig_cf(tokens, pages, cached_len, last_node)
tc.cache_finished_req = cf
orig_free = sched.allocator.free
def fr(pages):
    pages = list(pages)
    if pages:
        print(f"      free({list(map(int, pages))})")
    return orig_free(pages)
sched.allocator.free = fr
tc.free_fn = fr

import heapq as _hq
def ev(num_tokens):
    print(f"  evict({num_tokens}):")
    self = tc
    leaves = [n for n in self._iter_nodes() if n.evictable]
    _hq.heapify(leaves)
    evicted = 0
    while leaves and evicted < num_tokens:
        node = _hq.heappop(leaves)
        if not node.evictable:
            continue
        self.free_fn(node.pages)
        evicted += len(node.key)
        self._evictable_tokens -= len(node.key)
        parent = node.parent
        popped = parent.children.pop(self._edge_key(node), None)
        print(f"      evicted node id={node.id} pages={node.pages} "
              f"parent_id={parent.id} popped={'OK' if popped is node else popped}")
        if popped is not None and popped is not node:
            print(f"      !!! popped WRONG node id={popped.id} pages={popped.pages}")
        if popped is None:
            print(f"      !!! pop MISSED; parent children keys="
                  f"{[k[:3] for k in parent.children]} edge_key={self._edge_key(node)[:3]}")
        if parent is not self.root and parent.evictable:
            _hq.heappush(leaves, parent)
    print(f"  evict -> {evicted}")
    return evicted
tc.evict = ev

import sglang_custom_tpu.mem_cache.radix_cache as rc_mod
orig_split = rc_mod.RadixCache._split_node
def split(self, node, n_pages):
    u = orig_split(self, node, n_pages)
    print(f"      split node pages={u.pages}|{node.pages}")
    return u
rc_mod.RadixCache._split_node = split
orig_retract = sched._retract_one
def retract():
    v = orig_retract()
    print(f"  RETRACT {v.rid} computed={v.computed_len} out={len(v.output_ids)}")
    return v
sched._retract_one = retract
orig_admit = sched._admit_req
def admit(r, budget, reqs, extend_lens):
    ok = orig_admit(r, budget, reqs, extend_lens)
    if ok:
        print(f"  ADMIT {r.rid} cached={r.cached_len} pages={r.page_list} ext={extend_lens[-1]}")
    return ok
sched._admit_req = admit

def check(stepno):
    tree_pages = []
    for n in sched.tree_cache._iter_nodes():
        tree_pages.extend(n.pages)
    c = Counter(tree_pages)
    dups = {k: v for k, v in c.items() if v > 1}
    if dups:
        print(f"step {stepno}: DUPLICATE tree pages {dups}")
        return True
    live_own = []
    for r in all_reqs:
        if r.page_list:
            live_own.extend(r.own_pages(sched.page_size))
    c2 = Counter(tree_pages + live_own)
    dups2 = {k: v for k, v in c2.items() if v > 1}
    if dups2:
        print(f"step {stepno}: page in tree AND owned by req: {dups2}")
        for r in all_reqs:
            print(f"  {r.rid}: pages={r.page_list} cached={r.cached_len} "
                  f"computed={r.computed_len} chunked={r.is_chunked} "
                  f"status={r.status.name}")
        return True
    in_use = sched.allocator.num_pages - 1 - sched.allocator.available_pages
    expected = len(set(tree_pages + live_own))
    if in_use != expected:
        print(f"step {stepno}: allocator in_use={in_use} but "
              f"tree+own={expected} (tree={len(tree_pages)}, own={len(live_own)})")
        for r in all_reqs:
            print(f"  {r.rid}: pages={r.page_list} cached={r.cached_len} "
                  f"computed={r.computed_len} chunked={r.is_chunked} "
                  f"status={r.status.name} out={len(r.output_ids)}")
        return True
    return False

stepno = 0
while sched.has_work:
    sched.step()
    stepno += 1
    if check(stepno):
        print(f"FAILED at step {stepno}, retractions={sched.num_retractions}")
        break
    if stepno > 2000:
        print("no repro in 2000 steps")
        break
else:
    print(f"drained clean after {stepno} steps, retractions={sched.num_retractions}")
    sched.check_memory()
    print("check_memory OK")

"""Ring-attention sequence-sharded prefill (parallel/ring_prefill.py).

SURVEY §7 net-new capability: numerical equality of the seq-sharded long
prefill (8-way CPU mesh over the data axis) with single-device prefill,
driven through the real Scheduler so chunk-skipping admission and the KV
scatter are covered too.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sglang_custom_tpu.config.model_config import ModelConfig
from sglang_custom_tpu.config.server_args import ServerArgs
from sglang_custom_tpu.managers.schedule_batch import Req
from sglang_custom_tpu.managers.scheduler import Scheduler
from sglang_custom_tpu.model_executor.model_runner import ModelRunner
from sglang_custom_tpu.model_loader.loader import load_weights
from sglang_custom_tpu.parallel.mesh import create_mesh
from sglang_custom_tpu.sampling.sampling_params import SamplingParams

PROMPT_LEN = 200
THRESHOLD = 64


def _runner(path, dp, ring):
    cfg = ModelConfig.from_model_path(path)
    args = ServerArgs(
        model_path=path, skip_tokenizer_init=True, context_length=512,
        page_size=16, dtype="float32", attention_backend="xla",
        enable_ring_prefill=ring, ring_prefill_threshold=THRESHOLD,
        chunked_prefill_size=128,   # would chunk the prompt without ring
        disable_overlap_schedule=True, decode_burst_size=1,
    )
    mesh_ctx = create_mesh(tp_size=1, dp_size=dp)
    params = load_weights(path, cfg, mesh_ctx, dtype=jnp.float32)
    runner = ModelRunner(args, cfg, params, mesh_ctx, num_pages=128)
    return args, runner


def test_ring_matches_single_device(tiny_llama_path):
    rng = np.random.RandomState(0)
    ids = [int(x) for x in rng.randint(1, 250, size=PROMPT_LEN)]

    args1, run1 = _runner(tiny_llama_path, dp=1, ring=False)
    s1 = Scheduler(args1, run1)
    req1 = Req(rid="a", input_ids=ids, sampling_params=SamplingParams(
        max_new_tokens=8, temperature=0.0, ignore_eos=True))
    s1.add_request(req1)
    while s1.has_work:
        s1.step()

    args8, run8 = _runner(tiny_llama_path, dp=8, ring=True)
    assert run8.ring_capable()
    s8 = Scheduler(args8, run8)
    req8 = Req(rid="b", input_ids=ids, sampling_params=SamplingParams(
        max_new_tokens=8, temperature=0.0, ignore_eos=True))
    s8.add_request(req8)
    while s8.has_work:
        s8.step()

    # the ring path actually ran (lazily built on first eligible prompt)
    assert run8._ring is not None
    assert req8.output_ids == req1.output_ids
    np.testing.assert_allclose(
        req8.output_token_logprobs, req1.output_token_logprobs,
        rtol=1e-4, atol=1e-4,
    )


def test_short_prompts_skip_ring(tiny_llama_path):
    """Prompts under the threshold chunk normally and never build the
    ring program."""
    args8, run8 = _runner(tiny_llama_path, dp=8, ring=True)
    s8 = Scheduler(args8, run8)
    ids = list(range(1, 40))
    req = Req(rid="c", input_ids=ids, sampling_params=SamplingParams(
        max_new_tokens=4, temperature=0.0, ignore_eos=True))
    s8.add_request(req)
    while s8.has_work:
        s8.step()
    assert run8._ring is None
    assert len(req.output_ids) == 4
    s8.tree_cache.reset()


def test_ring_attention_vs_dense():
    """The ring attention op alone vs a dense causal reference on the
    8-device mesh."""
    from jax.sharding import PartitionSpec as P

    from sglang_custom_tpu.parallel.mesh import DATA_AXIS
    from sglang_custom_tpu.parallel.ring_prefill import _ring_attention

    mesh_ctx = create_mesh(tp_size=1, dp_size=8)
    B, T, Hq, Hkv, D = 2, 64, 4, 2, 16
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(B, T, Hq, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, T, Hkv, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, T, Hkv, D), jnp.float32)
    pos = jnp.tile(jnp.arange(T, dtype=jnp.int32), (B, 1))
    scale = D ** -0.5

    fn = jax.jit(jax.shard_map(
        lambda q, k, v, p: _ring_attention(
            q, k, v, p, p, scale, DATA_AXIS, 8
        ),
        mesh=mesh_ctx.mesh,
        in_specs=(P(None, DATA_AXIS), P(None, DATA_AXIS),
                  P(None, DATA_AXIS), P(None, DATA_AXIS)),
        out_specs=P(None, DATA_AXIS),
    ))
    got = np.asarray(fn(q, k, v, pos))

    kr = np.repeat(np.asarray(k), Hq // Hkv, axis=2)
    vr = np.repeat(np.asarray(v), Hq // Hkv, axis=2)
    logits = np.einsum("bqhd,bkhd->bhqk", np.asarray(q) * scale, kr)
    mask = np.arange(T)[:, None] >= np.arange(T)[None, :]
    logits = np.where(mask[None, None], logits, -np.inf)
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    want = np.einsum("bhqk,bkhd->bqhd", p, vr)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

"""Attribute decode step time per component on the real chip (round 3).

The chip is attached over a high-latency tunnel (~22 ms per synchronous
roundtrip), so every measurement here enqueues N executions back-to-back
and syncs ONCE — device executions serialize in-order, so the mean is the
true device (or dispatch-bound) time per execution.
"""
import sys
import time
import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)

from sglang_custom_tpu.config.model_config import ModelConfig
from sglang_custom_tpu.config.server_args import ServerArgs
from sglang_custom_tpu.model_executor.model_runner import ModelRunner
from sglang_custom_tpu.model_loader.loader import load_dummy_weights
from sglang_custom_tpu.parallel.mesh import create_mesh
from sglang_custom_tpu.managers.schedule_batch import HostBatch

cfg = ModelConfig(
    architecture="LlamaForCausalLM",
    vocab_size=128256, hidden_size=2048, num_layers=16,
    num_q_heads=32, num_kv_heads=8, head_dim=64,
    intermediate_size=8192, rms_norm_eps=1e-5, rope_theta=500000.0,
    max_position_embeddings=4096,
)
args = ServerArgs(model_path="", skip_tokenizer_init=True, context_length=2048,
                  page_size=32, schedule_policy="fcfs")
mesh_ctx = create_mesh(tp_size=1, dp_size=1)
params = load_dummy_weights(cfg, mesh_ctx)
runner = ModelRunner(args, cfg, params, mesh_ctx, num_pages=2048)

B = 64
SEQ = 256
P = (SEQ + 31) // 32 + 2
rng = np.random.RandomState(0)


def mkbatch(burst):
    page_table = (np.arange(B * P, dtype=np.int32).reshape(B, P)) % 2000
    return HostBatch(
        reqs=[None] * B,
        token_ids=rng.randint(1, 1000, size=(B, 1)).astype(np.int32),
        positions=np.full((B, 1), SEQ - 1, np.int32),
        page_table=page_table,
        seq_lens=np.full((B,), SEQ, np.int32),
        extend_lens=np.ones((B,), np.int32),
        temperature=np.zeros((B,), np.float32),
        top_k=np.full((B,), cfg.vocab_size, np.int32),
        top_p=np.ones((B,), np.float32),
        min_p=np.zeros((B,), np.float32),
        is_extend=False,
        burst=burst,
    )


def bench_q(label, enqueue, n=30, warmup=2):
    """enqueue() dispatches one execution and returns a handle;
    sync once at the end."""
    for _ in range(warmup):
        h = enqueue()
    jax.block_until_ready(h)
    t0 = time.perf_counter()
    hs = [enqueue() for _ in range(n)]
    jax.block_until_ready(hs[-1])
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{label:55s} {dt:8.3f} ms", flush=True)
    return dt


which = set(sys.argv[1:]) or {"step", "sampler", "fwd", "attn"}

if "step" in which:
    b8 = mkbatch(8)
    full8 = bench_q("hot step burst=8 (8 tok), enqueued", lambda: runner.forward_hot_async(b8)[0], n=20)
    print(f"{'  -> per token-step':55s} {full8/8:8.3f} ms", flush=True)
    b1 = mkbatch(1)
    bench_q("hot step burst=1, enqueued", lambda: runner.forward_hot_async(b1)[0], n=20)

if "sampler" in which:
    V = cfg.vocab_size
    logits = jnp.asarray(rng.randn(B, V).astype(np.float32))
    key = jax.random.PRNGKey(0)
    argmax_f = jax.jit(lambda l: jnp.argmax(l, axis=-1))
    bench_q("argmax [64,128k]", lambda: argmax_f(logits))
    gumbel_f = jax.jit(lambda k: -jnp.log(-jnp.log(
        jax.random.uniform(k, (B, V), jnp.float32, 1e-20, 1.0))))
    bench_q("gumbel RNG [64,128k]", lambda: gumbel_f(key))
    topk_f = jax.jit(lambda l: jax.lax.top_k(l, 128)[0])
    bench_q("lax.top_k(128) [64,128k]", lambda: topk_f(logits))
    lsm_f = jax.jit(lambda l: jax.nn.log_softmax(l, axis=-1)[:, 0])
    bench_q("log_softmax [64,128k]", lambda: lsm_f(logits))

    from sglang_custom_tpu.layers.sampler import sample, SamplingMeta
    smeta = SamplingMeta(
        temperature=jnp.zeros((B,)), top_k=jnp.full((B,), V, jnp.int32),
        top_p=jnp.ones((B,)), min_p=jnp.zeros((B,)),
    )
    old_f = jax.jit(lambda l, m, k: sample(l, m, k, any_stochastic=True,
                                           any_filtered=True))
    bench_q("sample() all paths [64,128k]", lambda: old_f(logits, smeta, key))
    new_f = jax.jit(lambda l, m, k: sample(l, m, k, any_stochastic=False,
                                           any_filtered=False))
    bench_q("sample() greedy-specialized", lambda: new_f(logits, smeta, key))

if "fwd" in which:
    from sglang_custom_tpu.model_executor.forward_batch import ForwardMeta
    page_table = jnp.asarray((np.arange(B * P).reshape(B, P)) % 2000, jnp.int32)
    seq_lens = jnp.full((B,), SEQ, jnp.int32)
    meta = ForwardMeta(
        token_ids=jnp.asarray(rng.randint(1, 1000, (B, 1)), jnp.int32),
        positions=jnp.full((B, 1), SEQ - 1, np.int32),
        page_table=page_table,
        seq_lens=seq_lens,
        extend_lens=jnp.ones((B,), jnp.int32),
    )
    fwd = jax.jit(lambda p, kv, m: runner.model.forward(
        p, cfg, m, kv, runner.attn_backend)[0])
    bench_q("model.forward 16L (incl. attn)", lambda: fwd(params, runner.kv_pool.kv, meta))
    hidden = jnp.asarray(rng.randn(B, 1, 2048).astype(np.float32), jnp.bfloat16)
    lm_f = jax.jit(lambda h, w: jnp.einsum(
        "bth,hv->btv", h, w, preferred_element_type=jnp.float32))
    bench_q("lm_head [64,2048]x[2048,128k]", lambda: lm_f(hidden, params["lm_head"]))

    # pure weight-stream floor: layer matmuls only, no attention
    def mlp_only(p, x):
        def f(x, lp):
            q = jnp.matmul(x, lp["q_proj"])
            k = jnp.matmul(x, lp["k_proj"])
            v = jnp.matmul(x, lp["v_proj"])
            o = jnp.matmul(q, lp["o_proj"])
            g = jnp.matmul(x, lp["gate_proj"])
            u = jnp.matmul(x, lp["up_proj"])
            d = jnp.matmul(jax.nn.silu(g) * u, lp["down_proj"])
            _ = (k.sum() + v.sum()) * 0
            return (x + o + d + _).astype(x.dtype), None
        return jax.lax.scan(f, x, p["layers"])[0]
    x0 = jnp.asarray(rng.randn(B, 2048).astype(np.float32), jnp.bfloat16)
    mlp_f = jax.jit(mlp_only)
    bench_q("16L matmuls only (weight stream floor)", lambda: mlp_f(params, x0))

if "attn" in which:
    from sglang_custom_tpu.ops.ragged_paged_attention import paged_attention_decode
    page_table = jnp.asarray((np.arange(B * P).reshape(B, P)) % 2000, jnp.int32)
    seq_lens = jnp.full((B,), SEQ, jnp.int32)
    q = jnp.asarray(rng.randn(B, 32, 64).astype(np.float32), jnp.bfloat16)
    kvnew = jnp.asarray(rng.randn(B, 8, 128).astype(np.float32), jnp.bfloat16)

    def attn16(kv):
        s = jnp.zeros((), jnp.float32)
        for layer in range(16):
            o, kv = paged_attention_decode(
                q, kvnew, kv, layer, page_table, seq_lens, scale=0.125)
            s = s + o.astype(jnp.float32).sum()
        return s, kv
    attn16_j = jax.jit(attn16, donate_argnums=(0,))
    state = {"kv": runner.kv_pool.kv}
    def run_attn():
        s, state["kv"] = attn16_j(state["kv"])
        return s
    bench_q("decode attn kernel x16 layers", run_attn, n=20)

wbytes = sum(int(np.prod(v.shape)) * 2 for v in jax.tree.leaves(params["layers"]))
wbytes += int(np.prod(params["lm_head"].shape)) * 2
kvb = B * SEQ * 16 * 2048
print(f"weights {wbytes/1e6:.0f} MB -> {wbytes/657e9*1e3:.2f} ms; "
      f"KV {kvb/1e6:.0f} MB -> {kvb/657e9*1e3:.2f} ms", flush=True)

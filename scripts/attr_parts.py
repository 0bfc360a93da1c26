"""In-situ decode attribution: scan-8 step variants inside ONE dispatch.

attr_decode.py's per-op numbers carry a ~0.9 ms dispatch floor each (remote
chip); here every variant runs 8 chained decode iterations inside one jit
so per-token deltas between variants isolate: layer matmuls, attention
kernel, lm_head+sampler.
"""
import sys
import time
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
print("devices:", jax.devices(), flush=True)

from sglang_custom_tpu.config.model_config import ModelConfig
from sglang_custom_tpu.config.server_args import ServerArgs
from sglang_custom_tpu.model_executor.model_runner import ModelRunner
from sglang_custom_tpu.model_executor.forward_batch import ForwardMeta
from sglang_custom_tpu.model_loader.loader import load_dummy_weights
from sglang_custom_tpu.parallel.mesh import create_mesh
from sglang_custom_tpu.layers.sampler import (
    SamplingMeta, sample, compute_token_logprobs,
)
from sglang_custom_tpu.ops.lm_head import fused_lm_head_sample

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
fmt = runner.kv_pool.fmt

B = 64
SEQ = 256
P = (SEQ + 31) // 32 + 2
rng = np.random.RandomState(0)
page_table = jnp.asarray((np.arange(B * P).reshape(B, P)) % 2000, jnp.int32)
tok0 = jnp.asarray(rng.randint(1, 1000, (B,)), jnp.int32)
pos0 = jnp.full((B,), SEQ - 1, jnp.int32)
sl0 = jnp.full((B,), SEQ, jnp.int32)
smeta = SamplingMeta(
    temperature=jnp.zeros((B,)), top_k=jnp.full((B,), cfg.vocab_size, jnp.int32),
    top_p=jnp.ones((B,)), min_p=jnp.zeros((B,)),
)
key = jax.random.PRNGKey(0)


def scan8(tail):  # tail(hidden, meta) -> [B] i32 next tokens (or None)
    def fn(params, kv, tok, pos, sl):
        def step(carry, i):
            kv, tok, pos, sl = carry
            m = ForwardMeta(
                token_ids=tok[:, None], positions=pos[:, None],
                page_table=page_table, seq_lens=sl,
                extend_lens=jnp.ones_like(sl),
            )
            hidden, kv = runner.model.forward(
                params, cfg, m, kv, runner.attn_backend
            )
            tok2 = tail(params, hidden, m)
            return (kv, tok2, pos + 1, sl + 1), ()
        (kv, tok, _, _), _ = jax.lax.scan(
            step, (kv, tok, pos, sl), jnp.arange(8)
        )
        return kv, tok
    return jax.jit(fn, donate_argnums=(1,),
                   in_shardings=(None, fmt, None, None, None),
                   out_shardings=(fmt, None))


def scan8_noattn():
    """Layer matmuls only: no attention, no lm_head — the weight-stream
    floor in the exact scan structure of the real step."""
    def fn(params, kv, tok, pos, sl):
        def step(carry, i):
            tok = carry
            x = jnp.take(params["embed"], tok[:, None], axis=0)
            def layer(x, lp):
                q = jnp.matmul(x, lp["q_proj"])
                k = jnp.matmul(x, lp["k_proj"])
                v = jnp.matmul(x, lp["v_proj"])
                o = jnp.matmul(q, lp["o_proj"])
                g = jnp.matmul(x, lp["gate_proj"])
                u = jnp.matmul(x, lp["up_proj"])
                d = jnp.matmul(jax.nn.silu(g) * u, lp["down_proj"])
                z = (k.sum() + v.sum()) * 0
                return (x + o + d + z).astype(x.dtype), None
            x, _ = jax.lax.scan(layer, x, params["layers"])
            return (x[:, 0, :64].sum(-1).astype(jnp.int32) % 1000 + 1), ()
        tok, _ = jax.lax.scan(step, tok, jnp.arange(8))
        return kv, tok
    return jax.jit(fn, donate_argnums=(1,),
                   in_shardings=(None, fmt, None, None, None),
                   out_shardings=(fmt, None))


def tail_none(params, hidden, m):
    return (hidden[:, 0, :64].sum(-1).astype(jnp.int32) % 1000) + 1


def tail_fused(params, hidden, m):
    last = hidden[:, 0]
    tok, lp = fused_lm_head_sample(
        last, params["lm_head"], smeta.temperature, jnp.int32(3),
        stochastic=False,
    )
    return tok + (lp.astype(jnp.int32) * 0)


def tail_einsum(params, hidden, m):
    logits = runner.model.compute_last_logits(params, hidden, m, cfg)
    tok = sample(logits, smeta, key, any_stochastic=False, any_filtered=False)
    lp = compute_token_logprobs(logits, tok)
    return tok + (lp.astype(jnp.int32) * 0)


state = {"kv": runner.kv_pool.kv}  # shared: donation deletes the buffer


def bench(label, fn, n=12):
    def run():
        state["kv"], tok = fn(params, state["kv"], tok0, pos0, sl0)
        return tok
    for _ in range(2):
        h = run()
    jax.block_until_ready(h)
    t0 = time.perf_counter()
    hs = [run() for _ in range(n)]
    jax.block_until_ready(hs[-1])
    dt = (time.perf_counter() - t0) / n / 8 * 1e3
    print(f"{label:45s} {dt:8.3f} ms/token", flush=True)
    return dt


which = set(sys.argv[1:]) or {"all"}
a = bench("A scan8 matmuls only (no attn/lm)", scan8_noattn())
b = bench("B + pallas attention", scan8(tail_none))
c = bench("C + fused lm_head sample", scan8(tail_fused))
d = bench("D + einsum lm_head + sampler", scan8(tail_einsum))
print(f"\nattention in situ: {b-a:.3f} ms | fused lm: {c-b:.3f} ms | "
      f"einsum lm: {d-b:.3f} ms", flush=True)
print("weights floor: layers 1947MB -> 2.83ms, lm_head 525MB -> 0.76ms @689GB/s")

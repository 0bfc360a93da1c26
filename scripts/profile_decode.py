"""One-off: measure where decode time goes on the real chip."""
import time, os
import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices())

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

B, T = 64, 1
P = 8  # pages per req (256 tokens)
rng = np.random.RandomState(0)

def mkbatch(seq_len):
    page_table = np.arange(B * P, dtype=np.int32).reshape(B, P) % 2000
    return HostBatch(
        reqs=[None] * B,
        token_ids=rng.randint(1, 1000, size=(B, 1)).astype(np.int32),
        positions=np.full((B, 1), seq_len - 1, np.int32),
        page_table=page_table,
        seq_lens=np.full((B,), seq_len, np.int32),
        extend_lens=np.ones((B,), np.int32),
        temperature=np.zeros((B,), np.float32),
        top_k=np.ones((B,), np.int32),
        top_p=np.ones((B,), np.float32),
        min_p=np.zeros((B,), np.float32),
        is_extend=False,
    )

# 1. trivial round trip: dispatch tiny jit + sync
f = jax.jit(lambda x: x + 1)
x = jnp.zeros((8,), jnp.float32)
np.asarray(f(x))
t0 = time.perf_counter()
N = 20
for _ in range(N):
    np.asarray(f(x))
print(f"tiny jit dispatch+sync: {(time.perf_counter()-t0)/N*1e3:.2f} ms")

# dispatch without sync
t0 = time.perf_counter()
ys = [f(x) for _ in range(N)]
t1 = time.perf_counter()
jax.block_until_ready(ys[-1])
print(f"tiny dispatch only: {(t1-t0)/N*1e3:.2f} ms; drain {((time.perf_counter()-t1))/N*1e3:.2f} ms/step")

# 2. host->device transfer of packed meta size
batch = mkbatch(129)
packed = runner._pack_meta(batch, 64, 1, P, lambda a, s, fill=0: np.full(s, fill, a.dtype) if a.shape != s else a)
print("packed size:", packed.size)
t0 = time.perf_counter()
for _ in range(N):
    jnp.asarray(np.asarray(packed)).block_until_ready()
print(f"meta upload+sync: {(time.perf_counter()-t0)/N*1e3:.2f} ms")

# 3. single decode step timing (compile first)
def run_step(batch):
    return runner.forward(batch)

tok, lp = run_step(mkbatch(129))
print("compiled single step")
t0 = time.perf_counter()
Nst = 10
for i in range(Nst):
    tok, lp = run_step(mkbatch(130 + i))
dt = (time.perf_counter() - t0) / Nst
print(f"single decode step e2e: {dt*1e3:.1f} ms -> {B/dt:.0f} tok/s")

# 4. burst step
b = mkbatch(129); b.burst = 8
tok, lp = run_step(b)
print("compiled burst step, out shape", tok.shape)
t0 = time.perf_counter()
for i in range(Nst):
    b = mkbatch(130 + i); b.burst = 8
    tok, lp = run_step(b)
dt = (time.perf_counter() - t0) / Nst
print(f"burst-8 step e2e: {dt*1e3:.1f} ms -> {B*8/dt:.0f} tok/s")

# 5. pure device time of the jit'd step: dispatch K steps back-to-back without sync
packed_dev = runner._pack_meta(b, 64, 1, P, lambda a, s, fill=0: np.full(s, fill, a.dtype) if a.shape != s else a)
kv = runner.kv_pool.kv
# use the _step_packed directly
kv, out = runner._step_packed(runner.params, kv, 64, 1, P, packed_dev)
out.block_until_ready()
t0 = time.perf_counter()
K = 20
for _ in range(K):
    kv, out = runner._step_packed(runner.params, kv, 64, 1, P, packed_dev)
out.block_until_ready()
dt = (time.perf_counter() - t0) / K
print(f"pipelined _step_packed (no host sync): {dt*1e3:.1f} ms/step -> {B/dt:.0f} tok/s")
runner.kv_pool.kv = kv

# roofline
wbytes = sum(np.prod(v.shape) * 2 for v in jax.tree.leaves(params))
print(f"weight bytes: {wbytes/2**30:.2f} GiB; v5e ~819GB/s -> min step {wbytes/819e9*1e3:.2f} ms")

"""Measure _step_packed/_burst_packed on the real chip (run via nohup)."""
import time
import numpy as np
import jax, jax.numpy as jnp
from sglang_custom_tpu.config.model_config import ModelConfig
from sglang_custom_tpu.config.server_args import ServerArgs
from sglang_custom_tpu.model_executor.model_runner import ModelRunner
from sglang_custom_tpu.model_loader.loader import load_dummy_weights
from sglang_custom_tpu.parallel.mesh import create_mesh

print("dev ok:", np.asarray(jax.jit(lambda x: x + 1)(jnp.zeros(4)))[0], flush=True)

cfg = ModelConfig(
    architecture="LlamaForCausalLM",
    vocab_size=128256, hidden_size=2048, num_layers=16,
    num_q_heads=32, num_kv_heads=8, head_dim=64,
    intermediate_size=8192, rms_norm_eps=1e-5, rope_theta=500000.0,
    max_position_embeddings=4096,
)
args = ServerArgs(model_path="", skip_tokenizer_init=True, context_length=2048, page_size=32)
mesh_ctx = create_mesh(1, 1)
params = load_dummy_weights(cfg, mesh_ctx)
runner = ModelRunner(args, cfg, params, mesh_ctx, num_pages=2048)
print("pool created", flush=True)
B, P = 64, 8
packed = jnp.asarray(np.concatenate([
    np.ones(64, np.int32), np.full(64, 128, np.int32),
    (np.arange(64 * 8) % 2000 + 1).astype(np.int32),
    np.full(64, 129, np.int32), np.ones(64, np.int32),
    np.full(64, 128256, np.int32),
    np.zeros(64, np.int32), np.ones(64 * 2, np.int32),
    np.asarray([1], np.int32)]))
kv = runner.kv_pool.kv
t0 = time.perf_counter()
kv, out = runner._step_packed(params, kv, B, 1, P, packed)
np.asarray(out[:1])
print(f"single-step compiled in {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
N = 30
for _ in range(N):
    kv, out = runner._step_packed(params, kv, B, 1, P, packed)
np.asarray(out[:1])
dt = (time.perf_counter() - t0) / N
print(f"_step_packed: {dt*1e3:.2f} ms/step -> {B/dt:.0f} tok/s", flush=True)

t0 = time.perf_counter()
kv, out = runner._burst_packed(params, kv, B, 1, P, 8, packed)
np.asarray(out[:1])
print(f"burst compiled in {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
for _ in range(N):
    kv, out = runner._burst_packed(params, kv, B, 1, P, 8, packed)
np.asarray(out[:1])
dt = (time.perf_counter() - t0) / N
print(f"_burst_packed(8): {dt*1e3:.2f} ms/burst -> {8*B/dt:.0f} tok/s", flush=True)

"""Find the per-layer 2 GiB movement in the scanned extend kernel: compile
the scan16 program and inspect memory analysis + HLO copy/fusion ops."""

import re
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

sys.path.insert(0, "/root/repo")

from bench import llama_1b_cfg  # noqa: E402
from sglang_custom_tpu.config.server_args import ServerArgs  # noqa: E402
from sglang_custom_tpu.model_executor.forward_batch import ForwardMeta  # noqa: E402
from sglang_custom_tpu.model_executor.model_runner import ModelRunner  # noqa: E402
from sglang_custom_tpu.model_loader.loader import load_dummy_weights  # noqa: E402
from sglang_custom_tpu.parallel.mesh import create_mesh  # noqa: E402

B = 8
PROMPT = 128


def main():
    cfg = llama_1b_cfg()
    args = ServerArgs(model_path="", skip_tokenizer_init=True,
                      context_length=2048, page_size=32)
    mesh_ctx = create_mesh(tp_size=1, dp_size=1)
    params = load_dummy_weights(cfg, mesh_ctx)
    runner = ModelRunner(args, cfg, params, mesh_ctx, num_pages=2048)
    del params
    Hq, Hkv, D = cfg.num_q_heads, cfg.num_kv_heads, cfg.head_dim

    P = 16
    s = np.full((B,), PROMPT, np.int32)
    page_table = np.zeros((B, P), np.int32)
    pid = 1
    for i in range(B):
        for j in range(6):
            page_table[i, j] = pid
            pid += 1
    s_j = jnp.asarray(s)
    T = 4
    pmeta = ForwardMeta(
        token_ids=jnp.full((B, T), 7, jnp.int32),
        positions=s_j[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :],
        page_table=jnp.asarray(page_table),
        seq_lens=s_j + T,
        extend_lens=jnp.full((B,), T, jnp.int32),
    )
    rng = np.random.RandomState(0)
    q4 = jnp.asarray(rng.randn(B, T, Hq, D), jnp.bfloat16)
    k4 = jnp.asarray(rng.randn(B, T, Hkv, D), jnp.bfloat16)
    v4 = jnp.asarray(rng.randn(B, T, Hkv, D), jnp.bfloat16)
    pal = runner.attn_backend

    @jax.jit
    def f(q, k, v, kv):
        def body(kv, layer):
            out, kv = pal(q, k, v, kv, layer, pmeta, 0.125)
            return kv, out.sum()
        kv, outs = jax.lax.scan(body, kv, jnp.arange(16, dtype=jnp.int32))
        return outs.sum()

    lowered = f.lower(q4, k4, v4, runner.kv_pool.kv)
    comp = lowered.compile()
    ma = comp.memory_analysis()
    if ma is not None:
        print(f"temp {ma.temp_size_in_bytes/2**20:.1f} MiB  "
              f"arg {ma.argument_size_in_bytes/2**20:.1f} MiB  "
              f"out {ma.output_size_in_bytes/2**20:.1f} MiB  "
              f"alias {ma.alias_size_in_bytes/2**20:.1f} MiB", flush=True)
    txt = comp.as_text()
    big = re.findall(r"bf16\[16,8,2048,32,128\]", txt)
    print("pool-shaped values in HLO:", len(big), flush=True)
    for line in txt.splitlines():
        if ("copy" in line or "custom-call" in line or "while" in line
                or "dynamic-update" in line) and "16,8,2048,32,128" in line:
            print(line.strip()[:240], flush=True)


if __name__ == "__main__":
    main()

"""Isolate the in-scan Pallas extend cost: scan 16 invocations of ONLY the
attention op (pool as donated carry), Pallas vs XLA-gather, T=4 tree vs
T=1 decode kernel."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

sys.path.insert(0, "/root/repo")

from bench import llama_1b_cfg  # noqa: E402
from sglang_custom_tpu.config.server_args import ServerArgs  # noqa: E402
from sglang_custom_tpu.layers.attention.xla_backend import (  # noqa: E402
    XlaAttentionBackend,
)
from sglang_custom_tpu.model_executor.forward_batch import ForwardMeta  # noqa: E402
from sglang_custom_tpu.model_executor.model_runner import ModelRunner  # noqa: E402
from sglang_custom_tpu.model_loader.loader import load_dummy_weights  # noqa: E402
from sglang_custom_tpu.parallel.mesh import create_mesh  # noqa: E402
from sglang_custom_tpu.speculative.tree import build_topology  # noqa: E402

B = 8
PROMPT = 128


def timeit(name, fn, mk_args, n=6):
    r = fn(*mk_args())
    np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])
    ts = []
    for _ in range(n):
        a = mk_args()
        t0 = time.perf_counter()
        r = fn(*a)
        np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])
        ts.append(time.perf_counter() - t0)
    print(f"{name:44s} {min(ts)*1e3:9.2f} ms", flush=True)


def main():
    cfg = llama_1b_cfg()
    args = ServerArgs(model_path="", skip_tokenizer_init=True,
                      context_length=2048, page_size=32)
    mesh_ctx = create_mesh(tp_size=1, dp_size=1)
    params = load_dummy_weights(cfg, mesh_ctx)
    runner = ModelRunner(args, cfg, params, mesh_ctx, num_pages=2048)
    del params
    topo = build_topology(1, 3, 4)
    N = topo.n_nodes
    Hq, Hkv, D = cfg.num_q_heads, cfg.num_kv_heads, cfg.head_dim

    P = 16
    s = np.full((B,), PROMPT, np.int32)
    page_table = np.zeros((B, P), np.int32)
    need = (PROMPT + N + 2 + 31) // 32
    pid = 1
    for i in range(B):
        for j in range(need):
            page_table[i, j] = pid
            pid += 1
    s_j = jnp.asarray(s)
    vmeta = ForwardMeta(
        token_ids=jnp.full((B, N + 1), 7, jnp.int32),
        positions=s_j[:, None] + jnp.arange(N + 1, dtype=jnp.int32)[None, :],
        page_table=jnp.asarray(page_table),
        seq_lens=s_j + N + 1,
        extend_lens=jnp.full((B,), N + 1, jnp.int32),
        rope_positions=s_j[:, None]
        + jnp.asarray([0] + list(topo.depth), jnp.int32)[None, :],
        tree_mask=jnp.asarray(topo.ancestors),
        tree_start=s_j,
    )
    import dataclasses
    pmeta = dataclasses.replace(vmeta, tree_mask=None, tree_start=None,
                                rope_positions=None)
    dmeta = dataclasses.replace(
        pmeta,
        token_ids=vmeta.token_ids[:, :1],
        positions=vmeta.positions[:, :1],
        seq_lens=s_j + 1,
        extend_lens=jnp.ones((B,), jnp.int32),
    )
    rng = np.random.RandomState(0)
    q4 = jnp.asarray(rng.randn(B, N + 1, Hq, D), jnp.bfloat16)
    k4 = jnp.asarray(rng.randn(B, N + 1, Hkv, D), jnp.bfloat16)
    v4 = jnp.asarray(rng.randn(B, N + 1, Hkv, D), jnp.bfloat16)
    q1, k1, v1 = q4[:, :1], k4[:, :1], v4[:, :1]
    xla = XlaAttentionBackend()
    pal = runner.attn_backend

    def scan16(backend, meta, q, k, v):
        @jax.jit
        def f(q, k, v, kv):
            def body(kv, layer):
                out, kv = backend(q, k, v, kv, layer, meta, 0.125)
                return kv, out.sum()
            kv, outs = jax.lax.scan(
                body, kv, jnp.arange(16, dtype=jnp.int32)
            )
            return outs.sum()
        return f

    def fresh():
        return (q4, k4, v4, runner.kv_pool.kv)

    def fresh1():
        return (q1, k1, v1, runner.kv_pool.kv)

    timeit("scan16 T=4 tree Pallas (no-donate)",
           scan16(pal, vmeta, q4, k4, v4), fresh)
    timeit("scan16 T=4 tree XLA (no-donate)",
           scan16(xla, vmeta, q4, k4, v4), fresh)
    timeit("scan16 T=4 plain Pallas", scan16(pal, pmeta, q4, k4, v4), fresh)
    timeit("scan16 T=1 decode Pallas", scan16(pal, dmeta, q1, k1, v1),
           fresh1)
    timeit("scan16 T=1 decode XLA", scan16(xla, dmeta, q1, k1, v1), fresh1)


if __name__ == "__main__":
    main()

"""Follow-up: verify-step cost under XLA vs Pallas tree backends, and the
tree kernel in isolation (r5 profile showed ~15 ms/layer for the Pallas
tree-mode extend — 100x its normal decode cost)."""

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
from sglang_custom_tpu.layers.norms import rms_norm  # noqa: E402
from sglang_custom_tpu.model_executor.forward_batch import ForwardMeta  # noqa: E402
from sglang_custom_tpu.model_executor.model_runner import ModelRunner  # noqa: E402
from sglang_custom_tpu.model_loader.loader import load_dummy_weights  # noqa: E402
from sglang_custom_tpu.parallel.mesh import create_mesh  # noqa: E402
from sglang_custom_tpu.speculative.eagle_worker import (  # noqa: E402
    llama_like_features,
)
from sglang_custom_tpu.speculative.tree import build_topology  # noqa: E402

B = 8
PROMPT = 128


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[-1].ravel()[0])


def timeit(name, fn, *args, n=6):
    fn(*args)
    sync(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:38s} {min(ts)*1e3:9.2f} ms", flush=True)
    return min(ts) * 1e3


def main():
    cfg = llama_1b_cfg()
    args = ServerArgs(
        model_path="", skip_tokenizer_init=True, context_length=2048,
        page_size=32, schedule_policy="fcfs",
    )
    mesh_ctx = create_mesh(tp_size=1, dp_size=1)
    params = load_dummy_weights(cfg, mesh_ctx)
    runner = ModelRunner(args, cfg, params, mesh_ctx, num_pages=2048)
    topo = build_topology(1, 3, 4)
    N = topo.n_nodes

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
    vtokens = jnp.full((B, N + 1), 7, jnp.int32)
    vdepth = jnp.asarray([0] + list(topo.depth), jnp.int32)
    vmeta = ForwardMeta(
        token_ids=vtokens,
        positions=s_j[:, None] + jnp.arange(N + 1, dtype=jnp.int32)[None, :],
        page_table=jnp.asarray(page_table),
        seq_lens=s_j + N + 1,
        extend_lens=jnp.full((B,), N + 1, jnp.int32),
        rope_positions=s_j[:, None] + vdepth[None, :],
        tree_mask=jnp.asarray(topo.ancestors),
        tree_start=s_j,
    )
    kv0 = runner.kv_pool.kv
    xla = XlaAttentionBackend()

    def verify_with(backend):
        def f(tp, kv):
            feats, kv = llama_like_features(
                runner.model, tp, cfg, vmeta, kv, backend)
            hidden = rms_norm(feats, tp["final_norm"], cfg.rms_norm_eps)
            all_logits = jnp.einsum(
                "bth,hv->btv", hidden, tp["lm_head"],
                preferred_element_type=jnp.float32)
            return all_logits.sum(), kv
        return f

    timeit("verify XLA backend (T=4 tree)",
           jax.jit(verify_with(xla)), runner.params, kv0)
    timeit("verify Pallas backend (T=4 tree)",
           jax.jit(verify_with(runner.attn_backend)), runner.params, kv0)

    # the tree kernel alone, one layer
    Hq, Hkv, D = cfg.num_q_heads, cfg.num_kv_heads, cfg.head_dim
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, N + 1, Hq, D), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, N + 1, Hkv, D), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, N + 1, Hkv, D), jnp.bfloat16)
    layer = jnp.asarray(0, jnp.int32)

    def one_layer(backend):
        def f(q, k, v, kv):
            out, kv = backend(q, k, v, kv, layer, vmeta, 0.125)
            return out.sum(), kv
        return f

    timeit("one-layer tree attn: XLA",
           jax.jit(one_layer(xla)), q, k, v, kv0)
    timeit("one-layer tree attn: Pallas",
           jax.jit(one_layer(runner.attn_backend)), q, k, v, kv0)

    # same single layer WITHOUT tree mask (plain extend T=4)
    import dataclasses
    pmeta = dataclasses.replace(vmeta, tree_mask=None, tree_start=None,
                                rope_positions=None)

    def one_layer_plain(backend):
        def f(q, k, v, kv):
            out, kv = backend(q, k, v, kv, layer, pmeta, 0.125)
            return out.sum(), kv
        return f

    timeit("one-layer plain extend T=4: Pallas",
           jax.jit(one_layer_plain(runner.attn_backend)), q, k, v, kv0)
    timeit("one-layer plain extend T=4: XLA",
           jax.jit(one_layer_plain(xla)), q, k, v, kv0)


if __name__ == "__main__":
    main()

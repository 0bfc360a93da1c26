"""Component-level profile of the fused speculative decode step.

Round-5 task 1 (VERDICT): find where the ~270 ms/step at B=8 goes.
Builds the exact bench setup (bench.py run_spec_bench: llama-1B target,
1-layer EAGLE draft, chain topk=1 depth=3), then times jitted subsets of
SpecRunner._decode_impl: draft levels / verify / compact / fixup, plus the
full packed step, with real round-trip fetches (axon gotcha: only an
np.asarray of device output is a trustworthy sync).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

sys.path.insert(0, "/root/repo")

from bench import llama_1b_cfg  # noqa: E402
from sglang_custom_tpu.config.model_config import ModelConfig  # noqa: E402
from sglang_custom_tpu.config.server_args import ServerArgs  # noqa: E402
from sglang_custom_tpu.layers.norms import rms_norm  # noqa: E402
from sglang_custom_tpu.model_executor.forward_batch import ForwardMeta  # noqa: E402
from sglang_custom_tpu.model_executor.model_runner import ModelRunner  # noqa: E402
from sglang_custom_tpu.model_loader.loader import load_dummy_weights  # noqa: E402
from sglang_custom_tpu.models import llama_eagle  # noqa: E402
from sglang_custom_tpu.parallel.mesh import create_mesh  # noqa: E402
from sglang_custom_tpu.speculative.eagle_worker import (  # noqa: E402
    SpecRunner,
    llama_like_features,
)

B = 8
PROMPT = 128


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[-1].ravel()[0])


def timeit(name, fn, *args, n=6):
    fn(*args)  # compile
    sync(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    ms = min(ts) * 1e3
    print(f"{name:30s} {ms:9.2f} ms   (median {np.median(ts)*1e3:.2f})", flush=True)
    return ms


def main():
    cfg = llama_1b_cfg()
    args = ServerArgs(
        model_path="", skip_tokenizer_init=True, context_length=2048,
        page_size=32, schedule_policy="fcfs",
        speculative_algorithm="eagle",
        speculative_num_steps=3, speculative_num_draft_tokens=4,
        speculative_eagle_topk=1, speculative_simulate_acc=True,
        decode_burst_size=1, disable_overlap_schedule=True,
    )
    mesh_ctx = create_mesh(tp_size=1, dp_size=1)
    params = load_dummy_weights(cfg, mesh_ctx)
    runner = ModelRunner(args, cfg, params, mesh_ctx, num_pages=2048)
    draft_cfg = ModelConfig(
        architecture="LlamaForCausalLM", vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size, num_layers=1,
        num_q_heads=cfg.num_q_heads, num_kv_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim, intermediate_size=cfg.intermediate_size,
        rms_norm_eps=cfg.rms_norm_eps, rope_theta=cfg.rope_theta,
        max_position_embeddings=cfg.max_position_embeddings,
    )
    dparams = load_dummy_weights(draft_cfg, mesh_ctx, model=llama_eagle)
    spec = SpecRunner(runner, args, draft_cfg, dparams)
    topo = spec.topo
    N, D = topo.n_nodes, topo.max_depth
    print(f"kv pool {runner.kv_pool.kv.shape} {runner.kv_pool.kv.dtype} "
          f"{runner.kv_pool.kv.nbytes/2**30:.2f} GiB; draft "
          f"{spec.draft_kv.kv.nbytes/2**30:.2f} GiB; N={N} D={D}")

    # ---- fabricate a decode-state batch: B seqs at position PROMPT
    P = 16
    s = np.full((B,), PROMPT, np.int32)
    page_table = np.zeros((B, P), np.int32)
    need = (PROMPT + N + 2 + 31) // 32
    pid = 1
    for i in range(B):
        for j in range(need):
            page_table[i, j] = pid
            pid += 1
    meta = ForwardMeta(
        token_ids=jnp.asarray(np.full((B, 1), 7, np.int32)),
        positions=jnp.asarray(s[:, None]),
        page_table=jnp.asarray(page_table),
        seq_lens=jnp.asarray(s),
        extend_lens=jnp.ones((B,), jnp.int32),
    )
    from sglang_custom_tpu.layers.sampler import SamplingMeta
    smeta = SamplingMeta(
        temperature=jnp.zeros((B,)), top_k=jnp.ones((B,), jnp.int32),
        top_p=jnp.ones((B,)), min_p=jnp.zeros((B,)),
    )
    slots = jnp.arange(B, dtype=jnp.int32)
    key = jax.random.PRNGKey(0)

    kv0 = runner.kv_pool.kv
    dkv0 = spec.draft_kv.kv
    fp0 = spec.feat_pool

    # ---------------- full fused step (no donation so we can repeat).
    # params MUST be jit ARGUMENTS: closure-captured arrays lower as
    # inline constants and the tunnel ships those bytes per compile
    # (4.19 GB -> the r5 first profiling attempt hung for 2 h).
    def full(tp, dp, kv, dkv, fp):
        out = spec._decode_impl(
            tp, dp, kv, dkv, fp,
            meta, smeta, slots, key, False, False)
        return out[3]
    jf = jax.jit(full)
    t_full = timeit("full _decode_impl", jf, runner.params,
                    spec.draft_params, kv0, dkv0, fp0)

    # ---------------- plain decode step for scale
    def plain(tp, kv):
        feats, kv = llama_like_features(
            runner.model, tp, cfg, meta, kv, runner.attn_backend)
        h = rms_norm(feats, tp["final_norm"], cfg.rms_norm_eps)
        return runner.model.compute_last_logits(tp, h, meta)
    t_plain = timeit("plain decode fwd+lm_head", jax.jit(plain),
                     runner.params, kv0)

    # ---------------- draft levels only
    def draft_only(dp, dkv, fp):
        feats0 = fp[slots]
        x_s = meta.token_ids[:, 0]
        dbase = s_j - 1
        vtok = [None] * (N + 1)
        vtok[0] = x_s
        feat_of = {0: feats0}
        for d, F in enumerate(spec.fwd_levels):
            w = len(F)
            toks = jnp.stack([vtok[n] for n in F], axis=1)
            slot_off = jnp.asarray([spec.fwd_slot_of[n] for n in F], jnp.int32)
            depths = jnp.asarray(
                [0 if n == 0 else topo.depth[n - 1] for n in F], jnp.int32)
            dmeta = ForwardMeta(
                token_ids=toks,
                positions=dbase[:, None] + slot_off[None, :],
                page_table=meta.page_table,
                seq_lens=dbase + int(spec.fwd_slot_of[F[-1]]) + 1,
                extend_lens=jnp.full((B,), w, jnp.int32),
                rope_positions=dbase[:, None] + depths[None, :],
                tree_mask=jnp.asarray(spec.draft_masks[d]),
                tree_start=dbase,
            )
            feats_in = jnp.stack([feat_of[n] for n in F], axis=1)
            dh, dkv = spec.draft_model.forward(
                dp, draft_cfg, dmeta, dkv,
                spec.spec_backend, feats_in)
            dlogits = spec.draft_model.compute_logits(dp, dh)
            topk_idx = jnp.argmax(dlogits, -1, keepdims=True)
            for child, prow, r in spec.child_specs[d]:
                vtok[child] = topk_idx[:, prow, r].astype(jnp.int32)
                feat_of[child] = dh[:, prow]
        return jnp.stack(vtok, axis=1), dkv
    s_j = jnp.asarray(s)
    t_draft = timeit("draft levels (3 fwd+logits)", jax.jit(draft_only),
                     spec.draft_params, dkv0, fp0)

    # ---------------- draft forwards only (no lm_head einsum)
    def draft_fwd_only(dp, dkv, fp):
        feats0 = fp[slots]
        dbase = s_j - 1
        acc = 0.0
        for d, F in enumerate(spec.fwd_levels):
            w = len(F)
            toks = jnp.full((B, w), 7, jnp.int32)
            slot_off = jnp.asarray([spec.fwd_slot_of[n] for n in F], jnp.int32)
            depths = jnp.asarray(
                [0 if n == 0 else topo.depth[n - 1] for n in F], jnp.int32)
            dmeta = ForwardMeta(
                token_ids=toks,
                positions=dbase[:, None] + slot_off[None, :],
                page_table=meta.page_table,
                seq_lens=dbase + int(spec.fwd_slot_of[F[-1]]) + 1,
                extend_lens=jnp.full((B,), w, jnp.int32),
                rope_positions=dbase[:, None] + depths[None, :],
                tree_mask=jnp.asarray(spec.draft_masks[d]),
                tree_start=dbase,
            )
            feats_in = jnp.broadcast_to(feats0[:, None, :], (B, w, cfg.hidden_size))
            dh, dkv = spec.draft_model.forward(
                dp, draft_cfg, dmeta, dkv,
                spec.spec_backend, feats_in)
            acc = acc + dh.sum()
        return acc, dkv
    t_dfwd = timeit("draft forwards (no logits)", jax.jit(draft_fwd_only),
                    spec.draft_params, dkv0, fp0)

    # ---------------- verify only
    vtokens = jnp.full((B, N + 1), 7, jnp.int32)
    def verify_only(tp, kv):
        vidx = jnp.arange(N + 1, dtype=jnp.int32)
        vpos = s_j[:, None] + vidx[None, :]
        vdepth = jnp.asarray([0] + list(topo.depth), jnp.int32)
        vmeta = ForwardMeta(
            token_ids=vtokens, positions=vpos, page_table=meta.page_table,
            seq_lens=s_j + N + 1,
            extend_lens=jnp.full((B,), N + 1, jnp.int32),
            rope_positions=s_j[:, None] + vdepth[None, :],
            tree_mask=jnp.asarray(topo.ancestors),
            tree_start=s_j,
        )
        feats, kv = llama_like_features(
            runner.model, tp, cfg, vmeta, kv, spec.verify_backend)
        hidden = rms_norm(feats, tp["final_norm"], cfg.rms_norm_eps)
        all_logits = jnp.einsum(
            "bth,hv->btv", hidden, tp["lm_head"],
            preferred_element_type=jnp.float32)
        return all_logits.sum(), kv
    t_verify = timeit("verify (target T=4 + lm_head)", jax.jit(verify_only),
                      runner.params, kv0)

    # ---------------- compact only
    path = jnp.tile(jnp.arange(D + 1, dtype=jnp.int32), (B, 1))
    a = jnp.full((B,), D, jnp.int32)
    def compact_only(kv):
        return spec._compact_kv(kv, meta.page_table, s_j, path, a)
    t_compact = timeit("compact_kv", jax.jit(compact_only), kv0)

    # ---------------- fixup only
    out_tok = jnp.full((B, D + 1), 7, jnp.int32)
    featpath = jnp.zeros((B, D, cfg.hidden_size), runner.dtype)
    def fixup_only(dp, dkv):
        fpos = s_j[:, None] + jnp.arange(D, dtype=jnp.int32)[None, :]
        fmeta = ForwardMeta(
            token_ids=out_tok[:, :D], positions=fpos,
            page_table=meta.page_table, seq_lens=s_j + D,
            extend_lens=jnp.full((B,), D, jnp.int32),
        )
        _, dkv = spec.draft_model.forward(
            dp, draft_cfg, fmeta, dkv,
            spec.spec_backend, featpath)
        return dkv
    t_fixup = timeit("draft fixup", jax.jit(fixup_only),
                     spec.draft_params, dkv0)

    print(f"\nsum of parts ~ {t_draft + t_verify + t_compact + t_fixup:.2f}"
          f" ms vs full {t_full:.2f} ms; plain step {t_plain:.2f} ms")

    # memory analysis of full program
    lowered = jax.jit(full).lower(
        runner.params, spec.draft_params, kv0, dkv0, fp0)
    ma = lowered.compile().memory_analysis()
    if ma is not None:
        print(f"temp {ma.temp_size_in_bytes/2**20:.1f} MiB, "
              f"output {ma.output_size_in_bytes/2**20:.1f} MiB, "
              f"arg {ma.argument_size_in_bytes/2**20:.1f} MiB, "
              f"alias {ma.alias_size_in_bytes/2**20:.1f} MiB")


if __name__ == "__main__":
    main()

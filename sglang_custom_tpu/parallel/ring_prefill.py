"""Ring-attention sequence-sharded prefill over the mesh.

The SURVEY §7 net-new capability: the reference has NO sequence/context
parallelism at all (verified §2.6 — zero hits for ring/ulysses/context_
parallel in srt/); it compensates with chunked prefill, which leaves the
prompt's O(T^2) attention on one device. Here a long prompt's extend step
shards the TOKEN axis across the mesh's ``data`` axis — idle during a
single long prefill — and K/V chunks rotate around the ring with
``lax.ppermute`` while every shard accumulates its queries' attention
online (flash-style running max/denominator). Weights are already
replicated across ``data``, so only K/V move, each chunk traversing the
ring once: the classic ring-attention schedule (Liu et al., arXiv:
2310.01889) expressed in 5 lines of collective code instead of NCCL
send/recv plumbing.

v1 scope: llama-family geometry (GQA, rope, optional qkv bias / qk norm),
tp_size == 1 (the ring rides the data axis; composing with TP-head
sharding nests the axes and is future work), fresh prompts (no cached
prefix). The engine enables it via ``--enable-ring-prefill`` for prompts
longer than ``ring_prefill_threshold``.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from sglang_custom_tpu.layers.norms import rms_norm
from sglang_custom_tpu.layers.rotary import rope_cos_sin, rope_inv_freq
from sglang_custom_tpu.parallel.mesh import DATA_AXIS


def _ring_attention(q, k, v, qpos, kpos, scale, axis, n_chunks):
    """Causal ring attention for one layer.

    q [B, Tc, Hq, D]; k, v [B, Tc, Hkv, D]; qpos/kpos [B, Tc] global
    positions (the causal mask needs only positions, so chunk layout is
    irrelevant). K/V (and kpos) rotate ``n_chunks - 1`` times; the online
    softmax accumulates (m, l, acc) exactly as a flash kernel would.
    """
    B, Tc, Hq, D = q.shape
    Hkv = k.shape[2]
    rep = Hq // Hkv

    qf = q.astype(jnp.float32) * scale

    def vary(x):
        # the accumulators start as literals (device-invariant); mark them
        # varying over the ring axis so the scan carry types line up
        try:
            return lax.pcast(x, (axis,), to="varying")
        except AttributeError:  # older jax spells it pvary
            return lax.pvary(x, (axis,))

    m = vary(jnp.full((B, Hq, Tc), -jnp.inf, jnp.float32))
    l = vary(jnp.zeros((B, Hq, Tc), jnp.float32))
    acc = vary(jnp.zeros((B, Hq, Tc, D), jnp.float32))

    perm = [(i, (i + 1) % n_chunks) for i in range(n_chunks)]

    def stage(carry, _):
        k, v, kpos, m, l, acc = carry
        kr = jnp.repeat(k.astype(jnp.float32), rep, axis=2)
        vr = jnp.repeat(v.astype(jnp.float32), rep, axis=2)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qf, kr)
        mask = qpos[:, None, :, None] >= kpos[:, None, None, :]
        logits = jnp.where(mask, logits, -jnp.inf)
        m_new = jnp.maximum(m, logits.max(axis=-1))
        # fully-masked stages keep m at -inf; guard the exp shift
        shift = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        p = jnp.exp(logits - shift[..., None])
        corr = jnp.exp(jnp.where(jnp.isfinite(m), m - shift, -jnp.inf))
        l = l * corr + p.sum(axis=-1)
        acc = acc * corr[..., None] + jnp.einsum(
            "bhqk,bkhd->bhqd", p, vr
        )
        k, v, kpos = (
            lax.ppermute(k, axis, perm),
            lax.ppermute(v, axis, perm),
            lax.ppermute(kpos, axis, perm),
        )
        return (k, v, kpos, m_new, l, acc), None

    (k, v, kpos, m, l, acc), _ = lax.scan(
        stage, (k, v, kpos, m, l, acc), None, length=n_chunks
    )
    out = acc / jnp.maximum(l, 1e-30)[..., None]        # [B, Hq, Tc, D]
    return out.transpose(0, 2, 1, 3)                     # [B, Tc, Hq, D]


def _seq_sharded_features(params, cfg, token_ids, positions, axis,
                          n_chunks):
    """llama-family decoder stack with the token axis sharded; returns
    (hidden pre-final-norm [B, Tc, H], k_all, v_all [L, B, Tc, Hkv, D])."""
    B, Tc = token_ids.shape
    D, Hq, Hkv = cfg.head_dim, cfg.num_q_heads, cfg.num_kv_heads
    eps = cfg.rms_norm_eps
    scale = 1.0 / math.sqrt(D)

    x = jnp.take(params["embed"], token_ids, axis=0)
    inv_freq = jnp.asarray(rope_inv_freq(cfg))
    cos, sin = rope_cos_sin(positions, inv_freq)

    def apply_rope(t):
        d2 = D // 2
        t1 = t[..., :d2].astype(jnp.float32)
        t2 = t[..., d2:].astype(jnp.float32)
        c, s = cos[..., None, :], sin[..., None, :]
        return jnp.concatenate(
            [t1 * c - t2 * s, t2 * c + t1 * s], axis=-1
        ).astype(t.dtype)

    def layer_fn(x, lp):
        h = rms_norm(x, lp["input_norm"], eps)
        q = h @ lp["q_proj"]
        k = h @ lp["k_proj"]
        v = h @ lp["v_proj"]
        if "q_bias" in lp:
            q = q + lp["q_bias"]
            k = k + lp["k_bias"]
            v = v + lp["v_bias"]
        q = q.reshape(B, Tc, Hq, D)
        k = k.reshape(B, Tc, Hkv, D)
        v = v.reshape(B, Tc, Hkv, D)
        if "q_norm" in lp:
            q = rms_norm(q, lp["q_norm"], eps)
            k = rms_norm(k, lp["k_norm"], eps)
        q = apply_rope(q)
        k = apply_rope(k)
        attn = _ring_attention(
            q, k, v, positions, positions, scale, axis, n_chunks
        ).astype(x.dtype)
        x = x + attn.reshape(B, Tc, Hq * D) @ lp["o_proj"]
        h = rms_norm(x, lp["post_norm"], eps)
        x = x + (
            jax.nn.silu(h @ lp["gate_proj"]) * (h @ lp["up_proj"])
        ) @ lp["down_proj"]
        return x, (k, v)

    x, (k_all, v_all) = lax.scan(layer_fn, x, params["layers"])
    return x, k_all, v_all


def supports_ring(cfg, mesh_ctx, quantization=None) -> bool:
    """v1 envelope: llama-family dense geometry, plain bf16/f32 weights,
    ring over a data axis > 1 with tp == 1."""
    return (
        mesh_ctx.dp_size > 1
        and mesh_ctx.tp_size == 1
        and quantization is None
        and cfg.num_experts == 0
        and not cfg.is_mla
        and not cfg.sliding_window
        and cfg.partial_rotary_factor == 1.0
        and not cfg.mrope_section
    )


class RingPrefill:
    """Holds the jitted sequence-sharded prefill step for one runner
    (cfg/mesh close over the trace — ModelConfig carries dict fields and
    cannot ride jit static args)."""

    def __init__(self, cfg, mesh_ctx, page_size: int, kv_fmt):
        self.cfg = cfg
        self.mesh_ctx = mesh_ctx
        self.page_size = page_size
        self._step = jax.jit(
            self._step_impl,
            donate_argnums=(3,),
            in_shardings=(None, None, None, kv_fmt, None, None),
            out_shardings=(None, kv_fmt),
        )

    def _step_impl(self, params, token_ids, positions, kv, page_table,
                   last_idx):
        """token_ids/positions [B, T] (T divisible by dp_size); kv = the
        paged pool [L, Hkv, P, ps, 2D] (K/V folded on the last axis,
        mem_cache/memory_pool.py kv_cache_shape), donated. Returns
        (last_hidden [B, H] post final-norm, kv)."""
        cfg = self.cfg
        mesh = self.mesh_ctx.mesh
        n_chunks = self.mesh_ctx.dp_size
        spec_in = P(None, DATA_AXIS)

        fn = jax.shard_map(
            functools.partial(
                _seq_sharded_features, params, cfg,
                axis=DATA_AXIS, n_chunks=n_chunks,
            ),
            mesh=mesh,
            in_specs=(spec_in, spec_in),
            out_specs=(
                P(None, DATA_AXIS, None),
                P(None, None, DATA_AXIS, None, None),
                P(None, None, DATA_AXIS, None, None),
            ),
        )
        hidden, k_all, v_all = fn(token_ids, positions)
        hidden = jax.lax.with_sharding_constraint(
            hidden, NamedSharding(mesh, P())
        )

        # ---- scatter K/V into the paged pool (data-replicated) ----
        B, T = token_ids.shape
        ps = self.page_size
        flat_pos = jnp.take_along_axis(
            page_table, positions // ps, axis=1
        ) * ps + positions % ps                              # [B, T]
        L, Hkv, D = cfg.num_layers, cfg.num_kv_heads, cfg.head_dim
        kv_flat = kv.reshape(kv.shape[0], kv.shape[1], -1, kv.shape[4])
        kvs = jnp.concatenate([k_all, v_all], axis=-1)       # [L,B,T,Hkv,2D]
        kvs = kvs.reshape(L, B * T, Hkv, 2 * D).transpose(0, 2, 1, 3)
        kv_flat = kv_flat.at[:, :, flat_pos.reshape(-1)].set(
            kvs.astype(kv.dtype)
        )
        kv = kv_flat.reshape(kv.shape)

        # last REAL token's hidden (trailing positions are pads)
        last = jnp.take_along_axis(
            hidden, last_idx[:, None, None], axis=1
        )[:, 0]
        last = rms_norm(last, params["final_norm"], cfg.rms_norm_eps)
        return last, kv

    def __call__(self, params, token_ids, positions, kv, page_table,
                 last_idx):
        return self._step(
            params, token_ids, positions, kv, page_table, last_idx
        )

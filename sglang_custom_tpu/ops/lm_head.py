"""Fused lm_head projection + sampling Pallas kernel.

The TPU-native replacement for the reference's LogitsProcessor + Sampler
pair on the hot decode path (reference: srt/layers/logits_processor.py:196
lm_head matmul; srt/layers/sampler.py:29 greedy fast path / sampling
kernels). On GPU those are separate kernels over a materialized [B, V]
logits tensor; at V=128k that tensor is 33 MB of f32 written and re-read
2-3x per step (matmul out, argmax in, log_softmax in), and XLA's variadic
argmax reduction over a 128k minor dim is far off the roofline (measured
0.85 ms for the argmax alone on v5e).

This kernel streams the lm_head weight HBM->VMEM once, tile by tile, and
folds everything downstream of the matmul into the same pass:

- online logsumexp (flash-softmax style running max + rescaled sum),
- greedy argmax,
- optionally Gumbel-argmax categorical sampling at per-row temperature
  (exact, no filtering) using the on-core PRNG,
- the chosen token's log-probability  raw_logit - logsumexp.

Nothing of size [B, V] ever exists; the [B, TV] logits tile lives only in
registers/VMEM. Top-k/top-p/min-p filtered batches take the XLA candidate
path in layers/sampler.py instead (host-known static flag — a batch is
filtered only if some row asks for it).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _kernel(
    # scalar prefetch
    seed_ref,      # [1] int32 — PRNG seed (stochastic only)
    # inputs
    hidden_ref,    # [B, H] (VMEM, whole)
    w_ref,         # [H, TV] (VMEM block t of the [H, V] weight)
    inv_temp_ref,  # [1, B] f32 — 1/temperature (stochastic only)
    greedy_ref,    # [1, B] i32 — 1 where temperature == 0
    # outputs
    tok_ref,       # [1, B] i32
    lp_ref,        # [1, B] f32
    # scratch (persists across grid steps)
    m_s,           # [1, B] f32 running max of raw logits
    l_s,           # [1, B] f32 running sum(exp(logit - m))
    gidx_s,        # [1, B] i32 greedy argmax
    sbest_s,       # [1, B] f32 best gumbel-perturbed score
    sidx_s,        # [1, B] i32 its token id
    sraw_s,        # [1, B] f32 its raw logit
    *,
    V: int,
    softcap: float,
    stochastic: bool,
    n_tiles: int,
):
    t = pl.program_id(0)
    B = hidden_ref.shape[0]
    TV = w_ref.shape[1]

    @pl.when(t == 0)
    def _():
        m_s[...] = jnp.full((1, B), _NEG_INF, jnp.float32)
        l_s[...] = jnp.zeros((1, B), jnp.float32)
        gidx_s[...] = jnp.zeros((1, B), jnp.int32)
        if stochastic:
            sbest_s[...] = jnp.full((1, B), _NEG_INF, jnp.float32)
            sidx_s[...] = jnp.zeros((1, B), jnp.int32)
            sraw_s[...] = jnp.zeros((1, B), jnp.float32)

    logits = jax.lax.dot_general(
        hidden_ref[...], w_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, TV]
    if softcap:
        logits = softcap * jnp.tanh(logits / softcap)
    col = t * TV + jax.lax.broadcasted_iota(jnp.int32, (B, TV), 1)
    logits = jnp.where(col < V, logits, _NEG_INF)

    # --- logsumexp + greedy argmax ---
    tmax = jnp.max(logits, axis=1)[None]                      # [1, B]
    targ = (t * TV + jnp.argmax(logits, axis=1).astype(jnp.int32))[None]
    m_old = m_s[...]
    m_new = jnp.maximum(m_old, tmax)
    l_s[...] = l_s[...] * jnp.exp(m_old - m_new) + jnp.sum(
        jnp.exp(logits - m_new[0][:, None]), axis=1
    )[None]
    gidx_s[...] = jnp.where(tmax > m_old, targ, gidx_s[...])
    m_s[...] = m_new

    if stochastic:
        # Counter-based uniform bits: murmur3-finalizer hash of
        # (seed, row, column). Vectorized integer ops on the VPU, identical
        # on every backend (the TPU prng_* primitives have no interpret-mode
        # lowering), and trivially reproducible from the step counter.
        row = jax.lax.broadcasted_iota(jnp.int32, (B, TV), 0)
        x = col.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
        x = x + row.astype(jnp.uint32) * jnp.uint32(0x85EBCA6B)
        x = x + seed_ref[0].astype(jnp.uint32) * jnp.uint32(0xC2B2AE35)
        x = x ^ (x >> 16)
        x = x * jnp.uint32(0x7FEB352D)
        x = x ^ (x >> 15)
        x = x * jnp.uint32(0x846CA68B)
        x = x ^ (x >> 16)
        # 24-bit mantissa-exact uniform in (0, 1).
        u = (x >> 8).astype(jnp.float32) * (2.0 ** -24) + (2.0 ** -25)
        gumbel = -jnp.log(-jnp.log(u))
        score = logits * inv_temp_ref[0][:, None] + gumbel
        score = jnp.where(col < V, score, _NEG_INF)
        smax = jnp.max(score, axis=1)[None]                   # [1, B]
        sarg = (t * TV + jnp.argmax(score, axis=1).astype(jnp.int32))[None]
        # raw logit at the winning position (max over the tied set).
        sraw = jnp.max(
            jnp.where(score >= smax[0][:, None], logits, _NEG_INF), axis=1
        )[None]
        better = smax > sbest_s[...]
        sidx_s[...] = jnp.where(better, sarg, sidx_s[...])
        sraw_s[...] = jnp.where(better, sraw, sraw_s[...])
        sbest_s[...] = jnp.maximum(sbest_s[...], smax)

    @pl.when(t == n_tiles - 1)
    def _():
        logz = m_s[...] + jnp.log(jnp.maximum(l_s[...], 1e-30))
        if stochastic:
            is_greedy = greedy_ref[...] == 1
            tok = jnp.where(is_greedy, gidx_s[...], sidx_s[...])
            raw = jnp.where(is_greedy, m_s[...], sraw_s[...])
        else:
            tok = gidx_s[...]
            raw = m_s[...]
        tok_ref[...] = tok
        lp_ref[...] = raw - logz


@functools.partial(
    jax.jit, static_argnames=("softcap", "stochastic", "interpret")
)
def fused_lm_head_sample(
    hidden: jax.Array,       # [B, H] (model dtype)
    w: jax.Array,            # [H, V] (model dtype)
    temperature: jax.Array,  # [B] f32 (0 => greedy row)
    seed: jax.Array,         # int32 scalar
    *,
    softcap: float = 0.0,
    stochastic: bool = True,
    interpret: bool = False,
):
    """Returns (tokens [B] i32, logprobs [B] f32).

    Logprobs are log_softmax of the *raw* logits at the chosen token
    (matching layers/sampler.py compute_token_logprobs); temperature only
    shapes the draw. Filtering (top-k/p/min-p) is NOT handled here.
    """
    B, H = hidden.shape
    V = w.shape[1]
    TV = 1024 if V >= 1024 else max(128, V)
    # The [H, TV] bf16 weight tile is double-buffered in VMEM; keep it
    # under ~12 MB so the kernel's scoped allocation fits the 16 MB VMEM
    # budget (H=4096/TV=1024 is exactly 16 MB and OOM'd on the 8B
    # geometry — Mosaic "kernel-vmem-stack-oom").
    while H * TV * 2 * 2 > 12 * 2**20 and TV > 256:
        TV //= 2
    n_tiles = pl.cdiv(V, TV)

    inv_temp = (1.0 / jnp.maximum(temperature, 1e-6)).reshape(1, B)
    greedy = (temperature == 0.0).astype(jnp.int32).reshape(1, B)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)

    kernel = functools.partial(
        _kernel, V=V, softcap=softcap, stochastic=stochastic,
        n_tiles=n_tiles,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((B, H), lambda t, *_: (0, 0)),
            pl.BlockSpec((H, TV), lambda t, *_: (0, t)),
            pl.BlockSpec((1, B), lambda t, *_: (0, 0)),
            pl.BlockSpec((1, B), lambda t, *_: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, B), lambda t, *_: (0, 0)),
            pl.BlockSpec((1, B), lambda t, *_: (0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, B), jnp.float32),
            pltpu.VMEM((1, B), jnp.float32),
            pltpu.VMEM((1, B), jnp.int32),
            pltpu.VMEM((1, B), jnp.float32),
            pltpu.VMEM((1, B), jnp.int32),
            pltpu.VMEM((1, B), jnp.float32),
        ],
    )
    tok, lp = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.float32),
        ),
        interpret=interpret,
    )(seed_arr, hidden, w, inv_temp, greedy)
    return tok[0], lp[0]

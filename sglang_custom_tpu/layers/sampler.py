"""On-device token sampler.

Analog of the reference's Sampler (srt/layers/sampler.py:29 — greedy fast
path, temperature scaling, top-k/top-p/min-p filtering via flashinfer CUDA
kernels). TPU design: the whole sampler runs *inside* the jitted step so
sampled token ids never bounce through the host between decode iterations.
Filtering uses one sort + cumulative sum (XLA maps these to efficient TPU
sort networks); the categorical draw uses the Gumbel-argmax trick, which
needs no renormalization after masking.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

_NEG_INF = -1e30


@struct.dataclass
class SamplingMeta:
    """Per-row sampling controls, padded to the batch bucket."""

    temperature: jax.Array  # [B] f32; 0 => greedy
    top_k: jax.Array        # [B] i32; vocab_size => disabled
    top_p: jax.Array        # [B] f32; 1.0 => disabled
    min_p: jax.Array        # [B] f32; 0.0 => disabled


@struct.dataclass
class PenaltyMeta:
    """Inputs for the penalized step variant. Only materialized (and
    transferred) when some request in the batch actually uses penalties —
    the default path pays nothing (reference: penaltylib orchestrator,
    sampling/penaltylib/orchestrator.py:12, which also keeps [B, V] state
    GPU-side only when required)."""

    output_ids: jax.Array          # [B, Omax] i32, generated tokens so far
    output_len: jax.Array          # [B] i32
    frequency_penalty: jax.Array   # [B] f32
    presence_penalty: jax.Array    # [B] f32
    repetition_penalty: jax.Array  # [B] f32 (1.0 = disabled)
    block_eos: jax.Array           # [B] bool (min_new_tokens not reached)
    eos_ids: jax.Array             # [B, Emax] i32 (-1 padded) tokens to block
    # Grammar vocab bitmask, packed uint32 (bit t%32 of word t//32 = token t
    # legal). All-ones rows disable it (reference: constrained/* vocab
    # bitmask applied in sampling_batch_info.py:171).
    vocab_mask: jax.Array          # [B, ceil(V/32)] u32


def apply_penalties(logits: jax.Array, pm: PenaltyMeta) -> jax.Array:
    """OpenAI-style frequency/presence penalties + HF-style repetition
    penalty over *generated* tokens, and EOS blocking for min_new_tokens.

    logits: [B, V] f32 -> adjusted [B, V] f32.
    """
    B, V = logits.shape
    Omax = pm.output_ids.shape[1]
    valid = (
        jax.lax.broadcasted_iota(jnp.int32, (B, Omax), 1) < pm.output_len[:, None]
    )
    ones = jnp.where(valid, 1.0, 0.0)
    counts = jnp.zeros((B, V), jnp.float32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (B, Omax), 0)
    counts = counts.at[rows, pm.output_ids].add(ones, mode="drop")

    present = counts > 0
    logits = logits - counts * pm.frequency_penalty[:, None]
    logits = logits - jnp.where(present, pm.presence_penalty[:, None], 0.0)
    # repetition: positive logits divided by p, negative multiplied.
    rp = pm.repetition_penalty[:, None]
    rep = jnp.where(logits > 0, logits / rp, logits * rp)
    logits = jnp.where(present, rep, logits)
    # min_new_tokens: force EOS/stop tokens out of the support.
    blocked = jnp.zeros((B, V), bool)
    erows = jax.lax.broadcasted_iota(jnp.int32, pm.eos_ids.shape, 0)
    eids = jnp.where(pm.eos_ids >= 0, pm.eos_ids, 0)
    blocked = blocked.at[erows, eids].set(pm.eos_ids >= 0, mode="drop")
    logits = jnp.where(blocked & pm.block_eos[:, None], _NEG_INF, logits)
    # Grammar bitmask: unpack [B, W] u32 -> [B, W*32] bits, slice to V.
    W = pm.vocab_mask.shape[1]
    bits = jnp.right_shift(
        pm.vocab_mask[:, :, None], jnp.arange(32, dtype=jnp.uint32)[None, None, :]
    ) & jnp.uint32(1)
    allowed = bits.reshape(B, W * 32)[:, :V].astype(bool)
    logits = jnp.where(allowed, logits, _NEG_INF)
    return logits


def sample(
    logits: jax.Array,  # [B, V] f32
    meta: SamplingMeta,
    key: jax.Array,
) -> jax.Array:
    """Returns sampled token ids [B] int32."""
    B, V = logits.shape
    needs_filter = True  # single traced path; masks no-op when disabled

    # Sort once (descending); derive top-k / top-p / min-p masks in sorted
    # order, then scatter back via argsort of the sort permutation.
    sort_idx = jnp.argsort(-logits, axis=-1)
    sorted_logits = jnp.take_along_axis(logits, sort_idx, axis=-1)
    sorted_probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(sorted_probs, axis=-1)

    rank = jax.lax.broadcasted_iota(jnp.int32, (B, V), 1)
    keep = rank < meta.top_k[:, None]
    # top-p: keep the smallest prefix whose mass reaches top_p (always keep
    # the first token).
    keep &= (cum - sorted_probs) < meta.top_p[:, None]
    keep |= rank == 0
    # min-p: drop tokens below min_p * p_max.
    keep &= sorted_probs >= meta.min_p[:, None] * sorted_probs[:, :1]

    sorted_masked = jnp.where(keep, sorted_logits, _NEG_INF)
    inv = jnp.argsort(sort_idx, axis=-1)
    masked_logits = jnp.take_along_axis(sorted_masked, inv, axis=-1)

    greedy = meta.temperature[:, None] == 0.0
    temp = jnp.where(greedy, 1.0, meta.temperature[:, None])
    z = masked_logits / temp
    gumbel = -jnp.log(-jnp.log(jax.random.uniform(
        key, (B, V), dtype=jnp.float32, minval=1e-20, maxval=1.0
    )))
    perturbed = jnp.where(greedy, logits, z + gumbel)
    return jnp.argmax(perturbed, axis=-1).astype(jnp.int32)


def compute_token_logprobs(logits: jax.Array, token_ids: jax.Array) -> jax.Array:
    """Log-softmax probability of chosen tokens. logits [B,V], ids [B]."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.take_along_axis(logp, token_ids[:, None], axis=-1)[:, 0]
